#!/bin/bash
# One-command green suite (VERDICT r3 item 3).
#
# Default: a single pytest invocation — tests/conftest.py clears JAX's
# live caches every 40 tests, which works around the XLA:CPU
# backend_compile segfault that killed long single-process runs.
# `--sharded` falls back to process-isolated groups (one pytest per
# shard of test files) in case a future regression re-introduces
# compiler-state decay; both modes assert the expected pass count.
#
# Usage:  tools/run_suite.sh [--sharded] [min_passed]
set -u
cd "$(dirname "$0")/.."
MIN_PASSED=${2:-${1:-350}}
case "$MIN_PASSED" in ''|*[!0-9]*) MIN_PASSED=350;; esac

run_single() {
    python -m pytest tests/ -q --tb=short 2>&1 | tee /tmp/suite_out.txt
    local rc=${PIPESTATUS[0]}
    local passed
    passed=$(grep -Eo '[0-9]+ passed' /tmp/suite_out.txt | tail -1 | grep -Eo '[0-9]+')
    echo "suite: rc=$rc passed=${passed:-0} (required >= $MIN_PASSED)"
    [ "$rc" -eq 0 ] && [ "${passed:-0}" -ge "$MIN_PASSED" ]
}

run_sharded() {
    local total=0 failed=0
    local files
    files=$(ls tests/test_*.py)
    local nshard=6
    for i in $(seq 0 $((nshard - 1))); do
        local group
        group=$(echo "$files" | awk -v i="$i" -v n="$nshard" 'NR % n == i')
        [ -z "$group" ] && continue
        echo "=== shard $i: $(echo "$group" | tr '\n' ' ')"
        python -m pytest $group -q --tb=short 2>&1 | tee /tmp/suite_shard_$i.txt
        local rc=${PIPESTATUS[0]}
        local p
        p=$(grep -Eo '[0-9]+ passed' /tmp/suite_shard_$i.txt | tail -1 | grep -Eo '[0-9]+')
        total=$((total + ${p:-0}))
        [ "$rc" -ne 0 ] && failed=1
    done
    echo "suite (sharded): passed=$total failed_shards=$failed (required >= $MIN_PASSED)"
    [ "$failed" -eq 0 ] && [ "$total" -ge "$MIN_PASSED" ]
}

if [ "${1:-}" = "--sharded" ]; then
    run_sharded
else
    run_single
fi

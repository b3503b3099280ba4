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
# Usage:  tools/run_suite.sh [--single|--sharded] [min_passed]
#
# Default: pytest-xdist with one worker per core (~4x wall-clock on this
# box; each worker is its own process, so the per-40-tests cache clear in
# conftest.py applies per worker). `--single` keeps the serial one-process
# run; `--sharded` runs the 6 file-shards as CONCURRENT processes
# (VERDICT r4 weak #5). All modes assert the expected pass count.
set -u
cd "$(dirname "$0")/.."
MIN_PASSED=${2:-${1:-400}}
case "$MIN_PASSED" in ''|*[!0-9]*) MIN_PASSED=400;; esac

run_single() {
    python -m pytest tests/ -q --tb=short 2>&1 | tee /tmp/suite_out.txt
    local rc=${PIPESTATUS[0]}
    local passed
    passed=$(grep -Eo '[0-9]+ passed' /tmp/suite_out.txt | tail -1 | grep -Eo '[0-9]+')
    echo "suite: rc=$rc passed=${passed:-0} (required >= $MIN_PASSED)"
    [ "$rc" -eq 0 ] && [ "${passed:-0}" -ge "$MIN_PASSED" ]
}

run_parallel() {
    local n
    n=$(nproc)
    python -m pytest tests/ -q --tb=short -n "$n" 2>&1 | tee /tmp/suite_out.txt
    local rc=${PIPESTATUS[0]}
    local passed
    passed=$(grep -Eo '[0-9]+ passed' /tmp/suite_out.txt | tail -1 | grep -Eo '[0-9]+')
    echo "suite (xdist -n $n): rc=$rc passed=${passed:-0} (required >= $MIN_PASSED)"
    [ "$rc" -eq 0 ] && [ "${passed:-0}" -ge "$MIN_PASSED" ]
}

run_sharded() {
    local total=0 failed=0
    local files pids=()
    files=$(ls tests/test_*.py)
    local nshard=6
    for i in $(seq 0 $((nshard - 1))); do
        local group
        group=$(echo "$files" | awk -v i="$i" -v n="$nshard" 'NR % n == i')
        [ -z "$group" ] && continue
        echo "=== shard $i: $(echo "$group" | tr '\n' ' ')"
        python -m pytest $group -q --tb=short > /tmp/suite_shard_$i.txt 2>&1 &
        pids[$i]=$!
    done
    for i in "${!pids[@]}"; do
        wait "${pids[$i]}"; local rc=$?
        local p
        p=$(grep -Eo '[0-9]+ passed' /tmp/suite_shard_$i.txt | tail -1 | grep -Eo '[0-9]+')
        total=$((total + ${p:-0}))
        [ "$rc" -ne 0 ] && { failed=1; tail -30 /tmp/suite_shard_$i.txt; }
    done
    echo "suite (sharded, concurrent): passed=$total failed_shards=$failed (required >= $MIN_PASSED)"
    [ "$failed" -eq 0 ] && [ "$total" -ge "$MIN_PASSED" ]
}

case "${1:-}" in
    --sharded) run_sharded ;;
    --single) run_single ;;
    *) run_parallel ;;
esac

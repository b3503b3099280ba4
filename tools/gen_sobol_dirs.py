#!/usr/bin/env python
"""Generate projection-optimized Sobol' direction numbers
(mitsuba_tpu/samplers/data/sobol_dirs.npz).

The reference ships Joe-Kuo's "new-joe-kuo-6" initialization tables
verbatim (src/libcore/sobolseq.cpp, ~108k lines); that data cannot be
retrieved or copied here, so this generator runs OUR OWN search with the
same quality-criterion class: for each dimension d, candidate initial
values are scored by the pairwise (m1, m2)-equidistribution defects of
the 2D projection (d, d') against ALL previous dimensions d' — a
binary-rank condition on the pair's generator matrices (Joe-Kuo 2008's
D(6) criterion bounds exactly these t-values) — and the best of T
candidates is kept. The classic Bratley-Fox values pin the first
dimensions (published constants, also used by Joe-Kuo).

Defect = the pair fails (m1, m2)-equidistribution for 2^(m1+m2) strata
with n = 2^kbits points: the (m1+m2) x kbits GF(2) matrix formed from
the first m1 rows of C_d and m2 rows of C_d' has rank < m1+m2. Coarse
failures are weighted 4x per level (a (1,1) failure = half the quadrants
empty; far worse than a (4,4) one).

Measured on the UNSEARCHED construction (2000 random pairs, 1024 dims,
kbits=12): (1,1) fail 0.05%, (2,2) 0.5%, (3,3) 1.4%, (4,4) 4.4%.
The search drives the coarse levels to zero and minimizes the rest;
run with --report to print the same table for the generated npz.

Usage:
    python tools/gen_sobol_dirs.py [--dims 1024] [--tries 24] [--report]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mitsuba_tpu.samplers import sobol as S  # noqa: E402

KBITS = 12           # optimize for <= 4096 samples/pixel (render regime)
LEVELS = [(m1, m2) for k in range(2, 9)
          for m1 in range(1, k) for m2 in [k - m1]]
# Strictly LEXICOGRAPHIC level priority: a single coarse defect must
# outweigh ANY number of finer ones. Max defects per level ~= #combos x
# #prev-dims < 4096, so a 4096x weight ratio per level guarantees it
# (4^k ratios measured insufficient: at ~1000 dims a (2,2)-defective
# candidate with a clean fine tail beat a (2,2)-clean one).
WEIGHTS = {lv: 4096.0 ** (8 - sum(lv)) for lv in LEVELS}


def rows_of(vrow):
    """32 direction numbers (uint64, shifted) -> per-output-bit row
    bitmasks over the index bits, masked to KBITS columns."""
    out = np.zeros(8, np.uint32)      # only the first 8 rows are scored
    mask = (1 << KBITS) - 1
    for r in range(8):
        m = 0
        for k in range(KBITS):        # index bits beyond KBITS are masked
            m |= ((int(vrow[k]) >> (31 - r)) & 1) << k
        out[r] = m & mask
    return out


def batch_fullrank(cand_rows, prev_rows, m1, m2):
    """For every previous dim: is [cand_rows[:m1]; prev[:m2]] full rank
    over GF(2) restricted to KBITS columns? Vectorized elimination.
    cand_rows: (8,) uint32; prev_rows: (N, 8) uint32 -> (N,) bool."""
    n = prev_rows.shape[0]
    R = m1 + m2
    M = np.empty((n, R), np.uint32)
    M[:, :m1] = cand_rows[:m1][None, :]
    M[:, m1:] = prev_rows[:, :m2]
    rank = np.zeros(n, np.int32)
    used = np.zeros((n, R), bool)
    rows_i = np.arange(n)
    for col in range(KBITS):
        bit = np.uint32(1 << col)
        has = (M & bit) != 0
        avail = has & ~used
        piv = np.argmax(avail, axis=1)
        haspiv = avail[rows_i, piv]
        pivrow = np.where(haspiv, M[rows_i, piv], 0)
        elim = has & haspiv[:, None]
        elim[rows_i, piv] = False
        M ^= np.where(elim, pivrow[:, None], 0).astype(np.uint32)
        used[rows_i, piv] |= haspiv
        rank += haspiv
        if (rank == R).all():
            break
    return rank == R


def score(cand_rows, prev_rows, bail=None):
    """Weighted defect count; levels are scored coarse-first so a
    candidate already worse than `bail` (the best so far) exits early."""
    s = 0.0
    for lv in sorted(LEVELS, key=lambda lv: sum(lv)):
        ok = batch_fullrank(cand_rows, prev_rows, *lv)
        s += WEIGHTS[lv] * float((~ok).sum())
        if bail is not None and s >= bail:
            return s
    return s


def generate(dims, tries, seed=20260821):
    v = np.zeros((dims, S._BITS), np.uint64)
    for k in range(S._BITS):
        v[0, k] = np.uint64(1) << np.uint64(S._BITS - 1 - k)
    prev = np.zeros((dims, 8), np.uint32)
    prev[0] = rows_of(v[0])

    polys = S._primitive_polys(dims - 1)
    rng = np.random.RandomState(seed)
    for d in range(1, dims):
        s_deg, interior = polys[d - 1]
        if d - 1 < len(S._CLASSIC):
            s_deg, interior, m = S._CLASSIC[d - 1]
            v[d] = S.dim_row(s_deg, interior, m)
        else:
            best, best_score = None, None
            for _ in range(tries):
                m = [int(rng.randint(0, 1 << k) * 2 + 1) % (1 << (k + 1))
                     for k in range(s_deg)]
                row = S.dim_row(s_deg, interior, m)
                sc = score(rows_of(row), prev[:d], bail=best_score)
                if best_score is None or sc < best_score:
                    best, best_score = row, sc
                if sc == 0.0:
                    break
            v[d] = best
        prev[d] = rows_of(v[d])
        if d % 128 == 0:
            print(f"  dim {d}/{dims}", file=sys.stderr)
    return v.astype(np.uint32)


def report(v):
    dims = v.shape[0]
    rows = np.stack([rows_of(v[d].astype(np.uint64)) for d in range(dims)])
    rng = np.random.RandomState(1)
    n = 2000
    fails = {lv: 0 for lv in [(1, 1), (2, 2), (3, 3), (4, 4)]}
    for _ in range(n):
        d1, d2 = rng.choice(dims, 2, replace=False)
        for lv in fails:
            if not batch_fullrank(rows[d1], rows[d2:d2 + 1], *lv)[0]:
                fails[lv] += 1
    for lv, c in fails.items():
        print(f"  {lv} defect rate: {c / n:.4f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=int, default=S.SOBOL_DIMS)
    ap.add_argument("--tries", type=int, default=24)
    ap.add_argument("--report", action="store_true",
                    help="only report defect rates of the existing npz")
    args = ap.parse_args()
    out = os.path.join(os.path.dirname(S.__file__), "data", "sobol_dirs.npz")
    if args.report:
        v = np.load(out)["v"]
        print(f"table {v.shape} from {out}:")
        report(v)
        return
    v = generate(args.dims, args.tries)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, v=v)
    print(f"wrote {out} {v.shape}")
    report(v)


if __name__ == "__main__":
    main()

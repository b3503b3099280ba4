"""Offline probe: live-tile counts under candidate ray sorts.

The dense binned dispatch runs one tile per (sub-row, group) pair where
ANY of the 128 rays enters the group's bbox; a sub-row's tile count is
the UNION of its rays' group sets, so the ray permutation directly sets
the live-tile total (the dominant cost). This probe counts tiles for
candidate signatures in pure numpy (deterministic — no TPU, no timer
noise) against the lower bound sum(cnt)/128.

Usage: python tools/probe_sort.py [n_log2=17]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from probe_bigmesh import make_mesh, rays  # noqa: E402


def enters_matrix(scene, o, d, tmax):
    from mitsuba_tpu.ops import binned_intersect as bi
    cl = scene.clusters
    G = cl.n_groups
    gmin = np.asarray(cl.cmin).reshape(G, bi.GROUP, 3).min(1)
    gmax = np.asarray(cl.cmax).reshape(G, bi.GROUP, 3).max(1)
    inv = 1.0 / np.where(np.abs(d) < 1e-12,
                         np.where(d >= 0, 1e-12, -1e-12), d)
    t0 = (gmin[:, None] - o[None]) * inv[None]
    t1 = (gmax[:, None] - o[None]) * inv[None]
    tn = np.minimum(t0, t1).max(-1)
    tf = np.maximum(t0, t1).min(-1)
    return (tn <= tf) & (tf > 1e-4) & (tn < tmax[None, :])


def tiles_for(perm, enters):
    e = enters[:, perm]                          # (G, N)
    G, n = e.shape
    return int(e.reshape(G, n // 128, 128).any(-1).sum())


def smallest_k(enters, G, k):
    """k smallest entered group ids per ray, (k, N), G = none."""
    gid = np.where(enters, np.arange(G, dtype=np.int64)[:, None], G)
    gs = np.sort(gid, axis=0)[:k]
    return gs


def main():
    nl = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    n = 1 << nl
    scene = make_mesh()
    G = scene.clusters.n_groups
    for label, coh in (("inc", False), ("coh", True)):
        o, d = (np.asarray(x, np.float64) for x in rays(n, coherent=coh))
        tmax = np.full(n, 1e30)
        e = enters_matrix(scene, o, d, tmax)
        cnt = e.sum(0)
        lower = int(-(-cnt.sum() // 128))
        first = np.where(cnt > 0, np.argmax(e, axis=0), G)
        last = G - 1 - np.argmax(e[::-1], axis=0)
        last = np.where(cnt > 0, last, -1)

        # A: current (first,last | cnt,dcell,ocell) — replicate keys
        qd = ((d * 0.5 + 0.5) * 7.999).astype(np.int64)
        lo = o.min(0)
        hi = o.max(0)
        q = np.clip((o - lo) / np.maximum(hi - lo, 1e-9), 0, 1)
        qi = (q * 31.999).astype(np.int64)
        dcell = (qd[:, 0] << 6) | (qd[:, 1] << 3) | qd[:, 2]
        ocell = (qi[:, 0] << 10) | (qi[:, 1] << 5) | qi[:, 2]
        primary = first * 16384 + np.maximum(last, 0)
        secondary = (np.minimum(cnt, 63) << 24) | (dcell << 15) | ocell
        pA = np.lexsort((secondary, primary))

        # B: first-4 smallest entered gids, then cnt/dcell
        g4 = smallest_k(e, G, 4)
        pB = np.lexsort((dcell, np.minimum(cnt, 63),
                         g4[3], g4[2], g4[1], g4[0]))

        # C: full bitmask lexicographic (pack G bits into int64 words)
        nw = -(-G // 63)
        words = np.zeros((nw, n), np.int64)
        for g in range(G):
            words[g // 63] |= (e[g].astype(np.int64) << (62 - g % 63))
        pC = np.lexsort(tuple(words[::-1]))

        # D: greedy seriation — order rays by (first, then within runs
        #    by last, then cnt) but tie-break with the bitmask words
        pD = np.lexsort(tuple(words[::-1]) + (np.maximum(last, 0), first))

        # E: (first,last) + fixed-width hashed sketch (3 x 31-bit words,
        #    scales to any G unlike the exact bitmask)
        nsw = 3
        sk = np.zeros((nsw, n), np.int64)
        slot = (np.arange(G, dtype=np.uint64) * np.uint64(2654435761)
                % np.uint64(nsw * 31)).astype(np.int64)
        for g in range(G):
            sk[slot[g] // 31] |= (e[g].astype(np.int64)
                                  << (30 - slot[g] % 31))
        pE = np.lexsort(tuple(sk[::-1]) + (np.maximum(last, 0), first))

        # F: same but sketch ordered by group id (no hash: slot = g
        #    scaled into the 93 bits, keeps spatial adjacency)
        sk2 = np.zeros((nsw, n), np.int64)
        slot2 = (np.arange(G, dtype=np.int64) * (nsw * 31)) // max(G, 1)
        for g in range(G):
            sk2[slot2[g] // 31] |= (e[g].astype(np.int64)
                                    << (30 - slot2[g] % 31))
        pF = np.lexsort(tuple(sk2[::-1]) + (np.maximum(last, 0), first))

        # G: first, 2nd-smallest, last, bitmask
        g2 = smallest_k(e, G, 2)[1]
        pG = np.lexsort(tuple(words[::-1]) + (np.maximum(last, 0), g2,
                                              first))
        # H: Morton-interleaved (first,last), bitmask tiebreak
        def _interleave(a, b):
            out = np.zeros_like(a)
            for i in range(15):
                out |= ((a >> i) & 1) << (2 * i + 1)
                out |= ((b >> i) & 1) << (2 * i)
            return out
        mo = _interleave(first.astype(np.int64), np.maximum(last, 0))
        pH = np.lexsort(tuple(words[::-1]) + (mo,))
        # I: cnt primary (short rays together), then first/last/bitmask
        pI = np.lexsort(tuple(words[::-1])
                        + (np.maximum(last, 0), first, np.minimum(cnt, 63)))

        rows = [("ideal", lower), ("current", tiles_for(pA, e)),
                ("first4", tiles_for(pB, e)),
                ("bitmask", tiles_for(pC, e)),
                ("first/last+bitmask", tiles_for(pD, e)),
                ("fl+hash-sketch", tiles_for(pE, e)),
                ("fl+scaled-sketch", tiles_for(pF, e)),
                ("f,g2,l+bitmask", tiles_for(pG, e)),
                ("morton(f,l)+bitmask", tiles_for(pH, e)),
                ("cnt,f,l+bitmask", tiles_for(pI, e)),
                ("unsorted", tiles_for(np.arange(n), e))]
        print(f"[{label}] n=2^{nl} G={G} mean cnt/ray={cnt.mean():.2f}")
        for name, t in rows:
            print(f"    {name:>20}: {t:7d} tiles  ({t / lower:.2f}x ideal)")


if __name__ == "__main__":
    main()

"""Probe: v7 pair-explicit dispatch — correctness vs brute + rays/s
vs the dense path, on the 70k bench mesh (value-fetch synced).

Note: an occasional single-ray "mismatch" on coherent sets
is an epsilon-corner tie — the ray passes through a shared
triangle corner and the two backends accept adjacent
triangles (both valid hits, t differing by the corner
obliquity); verified benign in r4 (ray 9063 of the 2^14
coherent set: prims 430/431, b1=b2=0).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from probe_bigmesh import make_mesh, rays


def sync(x):
    # slice ON DEVICE first: np.asarray(x)[:4] would transfer the
    # whole array over the tunnel and dominate the timing
    np.asarray(x[:4])


def bench(f, *a, reps=3):
    r = f(*a)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(f(*a))
    return (time.perf_counter() - t0) / reps


def main():
    from mitsuba_tpu.ops import binned_intersect as B
    from mitsuba_tpu.ops import intersect as I

    scene = make_mesh()
    cl = scene.clusters
    print(f"tris={scene.num_triangles} groups={cl.n_groups}", flush=True)
    float(jnp.zeros(()).sum())

    pair_t = jax.jit(lambda s, c, o, d: B.closest_hit_pairs(s, c, o, d).t)
    dense_t = jax.jit(
        lambda s, c, o, d: B.closest_hit(s, c, o, d, sweep=False).t)
    brute_t = jax.jit(lambda s, o, d: I.intersect_brute(s, o, d).t)

    n = 1 << 14
    for coh in (False, True):
        o, d = rays(n, coh)
        tp = np.asarray(pair_t(scene, cl, o, d))
        tb = np.asarray(brute_t(scene, o, d))
        bad = ((tb < 1e30) != (tp < 1e30)) \
            | ((tb < 1e30) & (np.abs(tp - tb) > 1e-3))
        print(f"correctness {'coh' if coh else 'inc'}: "
              f"hit {np.mean(tb < 1e30):.3f} mismatches {int(bad.sum())}",
              flush=True)

    sizes = [int(a) for a in sys.argv[1:]] or [16, 18, 20]
    for coh in (False, True):
        tag = "coh" if coh else "inc"
        for lg in sizes:
            n = 1 << lg
            o, d = rays(n, coh)
            t_p = bench(pair_t, scene, cl, o, d)
            line = f"{tag} n=2^{lg}: pairs {n/t_p/1e6:6.2f} M rays/s ({t_p*1e3:7.1f} ms)"
            if lg <= 18:
                t_d = bench(dense_t, scene, cl, o, d)
                line += f" | dense {n/t_d/1e6:6.2f} M ({t_d*1e3:7.1f} ms)"
            print(line, flush=True)


if __name__ == "__main__":
    main()

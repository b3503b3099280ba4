"""Probe: v6 t-ordered sweep vs dense binned dispatch vs brute.

Correctness (vs the fused f32 brute) and value-fetch-synced rays/s on
the 70k bench mesh, incoherent chords + coherent camera cone.

Usage: python tools/probe_sweep.py [sizes_log2 ...]


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
        r = f(*a)
        sync(r)
    return (time.perf_counter() - t0) / reps


def main():
    from mitsuba_tpu.ops import binned_intersect as B
    from mitsuba_tpu.ops import intersect as I

    scene = make_mesh()
    cl = scene.clusters
    print(f"tris={scene.num_triangles} groups={cl.n_groups}", flush=True)
    float(jnp.zeros(()).sum())

    sizes = [int(a) for a in sys.argv[1:]] or [16, 18, 20]

    sweep_t = jax.jit(lambda s, c, o, d: B.closest_hit(s, c, o, d, sweep=True).t)
    dense_t = jax.jit(
        lambda s, c, o, d: B.closest_hit(s, c, o, d, sweep=False).t)
    brute_t = jax.jit(lambda s, o, d: I.intersect_brute(s, o, d).t)

    # correctness first, small n
    n = 1 << 14
    for coh in (False, True):
        o, d = rays(n, coh)
        ts = sweep_t(scene, cl, o, d)
        tb = brute_t(scene, o, d)
        ts, tb = np.asarray(ts), np.asarray(tb)
        hitb = tb < 1e30
        hits = ts < 1e30
        bad = (hitb != hits) | (hitb & (np.abs(ts - tb) > 1e-3))
        print(f"correctness {'coh' if coh else 'inc'}: hit frac "
              f"{hitb.mean():.3f} mismatches {int(bad.sum())}", flush=True)

    for coh in (False, True):
        tag = "coh" if coh else "inc"
        for lg in sizes:
            n = 1 << lg
            o, d = rays(n, coh)
            dt_s = bench(sweep_t, scene, cl, o, d)
            line = f"{tag} n=2^{lg}: sweep {n/dt_s/1e6:6.2f} M rays/s ({dt_s*1e3:7.1f} ms)"
            if lg <= 18:
                dt_d = bench(dense_t, scene, cl, o, d)
                line += f" | dense {n/dt_d/1e6:6.2f} M ({dt_d*1e3:7.1f} ms)"
            print(line, flush=True)


if __name__ == "__main__":
    main()

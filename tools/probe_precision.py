"""Probe: GEMM precision effect on binned intersector speed + agreement."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from probe_bigmesh import make_mesh, rays


def main():
    from mitsuba_tpu.ops import binned_intersect as B
    scene = make_mesh()
    cl = scene.clusters
    float(jnp.zeros(()).sum())
    n = 1 << 17
    o, d = rays(n, coherent=False)
    tmax = jnp.full((n,), jnp.float32(3e37))

    # active tile stats
    no, dd = o, d
    sub = np.asarray(B._subrow_mask(cl, no[: (n // B.BLOCK) * B.BLOCK],
                                    dd[: (n // B.BLOCK) * B.BLOCK],
                                    tmax[: (n // B.BLOCK) * B.BLOCK]))
    print(f"unsorted active subrow-tiles: {int(sub.sum())} / {sub.size}")

    results = {}
    for prec in ("SPLIT", "HIGHEST"):
        B.SPLIT_BF16 = prec == "SPLIT"
        f = jax.jit(lambda o, d, t, _p=prec: B.closest_key(cl, o, d, t)[:2])
        k, g = f(o, d, tmax)
        jax.block_until_ready(k)
        t0 = time.perf_counter()
        for _ in range(3):
            k, g = f(o, d, tmax)
        jax.block_until_ready(k)
        dt = (time.perf_counter() - t0) / 3
        results[prec] = (np.asarray(k), np.asarray(g))
        print(f"{prec:8s}: {n/dt/1e6:5.2f} M rays/s ({dt*1e3:.1f} ms)")

    kh = results["HIGHEST"][0]
    for prec in ("SPLIT",):
        kp = results[prec][0]
        mism = (kh != kp).mean()
        vh, vp = kh < B.MISS_KEY, kp < B.MISS_KEY
        print(f"{prec}: key mismatch {mism:.5f}, valid mismatch "
              f"{(vh != vp).mean():.5f}")


if __name__ == "__main__":
    main()

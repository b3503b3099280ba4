"""Microbenchmark for the intersection kernels on the current backend.

Usage: python tools/microbench_intersect.py [n_rays_log2]
Prints rays/s for closest-hit and any-hit on a Cornell-sized scene.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from mitsuba_tpu.ops import intersect
    from mitsuba_tpu.scene import builtin

    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 19)
    scene, cam = builtin.cornell_box()
    float(jnp.zeros(()).sum())  # d2h warmup

    key = jax.random.PRNGKey(0)
    o = jax.random.uniform(key, (n, 3), minval=0.1, maxval=0.9)
    d = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tmax = jnp.full((n,), 10.0)

    closest = jax.jit(lambda s, o, d: intersect.intersect_brute(s, o, d))
    anyh = jax.jit(lambda s, o, d, t: intersect.occluded_brute(s, o, d, t))

    t0 = time.perf_counter()
    its = closest(scene, o, d)
    jax.block_until_ready(its)
    print(f"closest compile+run: {time.perf_counter()-t0:.1f}s")
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        its = closest(scene, o, d)
    jax.block_until_ready(its)
    dt = (time.perf_counter() - t0) / reps
    print(f"closest_hit: {n/dt/1e6:.1f} M rays/s  ({dt*1e3:.2f} ms, hit frac "
          f"{float(its.valid.mean()):.3f})")

    t0 = time.perf_counter()
    b = anyh(scene, o, d, tmax)
    jax.block_until_ready(b)
    print(f"anyhit compile+run: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(reps):
        b = anyh(scene, o, d, tmax)
    jax.block_until_ready(b)
    dt = (time.perf_counter() - t0) / reps
    print(f"any_hit:     {n/dt/1e6:.1f} M rays/s  ({dt*1e3:.2f} ms)")


if __name__ == "__main__":
    main()

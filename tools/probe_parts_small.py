"""Time the dense binned intersector's phases at SMALL batch (2^14) on
the bench 70k mesh — hunting the ~8-10 ms per-dispatch fixed cost that
caps the end-to-end render at its 16k-lane wavefront width
(tools/probe_render_decompose.py measured primary rays at 0.9M rays/s
@16k vs 2.0M @131k).

Value-fetch synced, queued reps (MEMORY/tpu-bench-methodology).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_mitsuba_tpu")

import jax
import jax.numpy as jnp
import numpy as np


def bench(f, *a, reps=8):
    r = f(*a)
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf.reshape(-1)[:2])
    t0 = time.perf_counter()
    rs = [f(*a) for _ in range(reps)]
    np.asarray(jax.tree_util.tree_leaves(rs[-1])[0].reshape(-1)[:2])
    np.asarray(jax.tree_util.tree_leaves(rs[0])[0].reshape(-1)[:2])
    return (time.perf_counter() - t0) / reps


def main():
    from bench import _bigmesh_scene
    from tools.probe_render_decompose import make_rays
    from mitsuba_tpu.ops import binned_intersect as B
    from mitsuba_tpu.ops import trace

    scene, cam = _bigmesh_scene(128, 128)
    cl = scene.clusters
    float(jnp.zeros(()).sum())
    n = 1 << 14
    o, d, _ = make_rays(scene, cam, n, "primary")
    o = jax.device_put(o); d = jax.device_put(d)
    tmax = jnp.full((n,), jnp.float32(3e37))

    t = bench(jax.jit(lambda o, d, t: B.ray_sort_perm(cl, o, d, t)),
              o, d, tmax)
    print(f"ray_sort_perm:   {t*1e3:7.2f} ms")

    t = bench(jax.jit(lambda o, d, t: B._subrow_mask(cl, o, d, t)),
              o, d, tmax)
    print(f"_subrow_mask:    {t*1e3:7.2f} ms")

    G = cl.n_groups
    nsub = n // 128
    maxt = nsub * G

    @jax.jit
    def enum_tiles(o, d, tm):
        submask = B._subrow_mask(cl, o, d, tm)
        (tidx,) = jnp.nonzero(submask.reshape(-1), size=maxt, fill_value=maxt)
        live = tidx < maxt
        tsub = jnp.where(live, tidx // G, nsub).astype(jnp.int32)
        tg = jnp.where(live, tidx % G, G).astype(jnp.int32)
        return (tsub << 16) | tg
    t = bench(enum_tiles, o, d, tmax)
    print(f"mask+enumerate:  {t*1e3:7.2f} ms")

    packed = enum_tiles(o, d, tmax)

    @jax.jit
    def disp_full(o, d, packed):
        return B._dispatch_tiles(cl, o, d, packed)
    t = bench(disp_full, o, d, packed)
    print(f"dispatch full ({maxt}): {t*1e3:7.2f} ms")

    @jax.jit
    def disp_quarter(o, d, packed):
        return B._dispatch_tiles(cl, o, d, packed[:maxt // 4])
    t = bench(disp_quarter, o, d, packed)
    print(f"dispatch 1/4 ({maxt//4}):  {t*1e3:7.2f} ms")

    nlive = int(np.asarray(jnp.sum(packed < (nsub << 16) | G)))
    # count live properly
    sub = packed >> 16
    nlive = int(np.asarray(jnp.sum(sub < nsub)))
    print(f"live tiles: {nlive}")

    k8 = max(512, 1 << int(np.ceil(np.log2(max(nlive, 1)))))

    @jax.jit
    def disp_fit(o, d, packed):
        return B._dispatch_tiles(cl, o, d, packed[:k8])
    t = bench(disp_fit, o, d, packed)
    print(f"dispatch fit ({k8}):   {t*1e3:7.2f} ms")

    t = bench(jax.jit(lambda o, d, t: B.closest_key2(cl, o, d, t)),
              o, d, tmax)
    print(f"closest_key2:    {t*1e3:7.2f} ms")

    @jax.jit
    def full(o, d):
        return trace.closest_hit(scene, o, d).t
    t = bench(full, o, d)
    print(f"closest_hit:     {t*1e3:7.2f} ms")

    @jax.jit
    def finalize(o, d, tm):
        ks = B.closest_key2(cl, o, d, tm)
        return B._finalize_closest(scene, cl, *ks, o, d, tm).t
    t = bench(finalize, o, d, tmax)
    print(f"key2+finalize:   {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()

"""Time the binned intersector's v4 phases separately at n=2^17:
sub-row mask cull, coherence sort, tile enumeration, full dispatch."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from probe_bigmesh import make_mesh, rays


def bench(f, *a, reps=5):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def main():
    from mitsuba_tpu.ops import binned_intersect as B
    scene = make_mesh()
    cl = scene.clusters
    float(jnp.zeros(()).sum())
    n = 1 << 17
    o, d = rays(n, coherent=False)
    tmax = jnp.full((n,), jnp.float32(3e37))

    t_mask = bench(jax.jit(lambda o, d, t: B._subrow_mask(cl, o, d, t)),
                   o, d, tmax)
    print(f"_subrow_mask: {t_mask*1e3:7.1f} ms")

    def sortkey(o, d):
        oct_ = ((d[:, 0] < 0).astype(jnp.uint32)
                | ((d[:, 1] < 0).astype(jnp.uint32) << 1)
                | ((d[:, 2] < 0).astype(jnp.uint32) << 2))
        lo = jnp.min(cl.cmin, 0)
        hi = jnp.max(cl.cmax, 0)
        q = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-9), 0.0, 1.0)
        qi = (q * 31).astype(jnp.uint32)
        cell = (qi[:, 0] << 10) | (qi[:, 1] << 5) | qi[:, 2]
        return jnp.argsort((oct_ << 15) | cell)
    t_sort = bench(jax.jit(sortkey), o, d)
    print(f"sort:         {t_sort*1e3:7.1f} ms")

    def enumerate_tiles(o, d, t):
        sm = B._subrow_mask(cl, o, d, t)
        G = cl.n_groups
        maxt = (n // 128) * G
        (tidx,) = jnp.nonzero(sm.reshape(-1), size=maxt, fill_value=maxt)
        return tidx
    t_enum = bench(jax.jit(enumerate_tiles), o, d, tmax)
    print(f"mask+nonzero: {t_enum*1e3:7.1f} ms")

    t_nosort = bench(jax.jit(
        lambda o, d, t: B.closest_key(cl, o, d, t, sort=False)[0]), o, d, tmax)
    print(f"full nosort:  {t_nosort*1e3:7.1f} ms -> {n/t_nosort/1e6:.2f} M rays/s")
    t_full = bench(jax.jit(
        lambda o, d, t: B.closest_key(cl, o, d, t, sort=True)[0]), o, d, tmax)
    print(f"full sorted:  {t_full*1e3:7.1f} ms -> {n/t_full/1e6:.2f} M rays/s")

    # tile stats in the v4 (nsub, G) layout: active (sub-row x group) pairs
    import numpy as np
    G = cl.n_groups
    nsub = n // 128
    sm = np.asarray(B._subrow_mask(cl, o, d, tmax))            # (nsub, G)
    print(f"G={G} nsub={nsub} tiles={G*nsub} active={int(sm.sum())} "
          f"({sm.mean()*100:.1f}%)")
    perm = np.asarray(sortkey(o, d))
    sm_s = np.asarray(B._subrow_mask(cl, o[perm], d[perm], tmax[perm]))
    print(f"active sorted = {int(sm_s.sum())} ({sm_s.mean()*100:.1f}%)")


if __name__ == "__main__":
    main()

"""Time the binned intersector's phases separately at n=2^17."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from probe_bigmesh import make_mesh, rays


def bench(f, *a, reps=5, warm=True):
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

    t_hb = bench(jax.jit(lambda o, d, t: B._hitbits(cl, o, d, t)), o, d, tmax)
    print(f"_hitbits:    {t_hb*1e3:7.1f} ms")

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
    print(f"sort:        {t_sort*1e3:7.1f} ms")

    t_nosort = bench(jax.jit(
        lambda o, d, t: B.closest_key(cl, o, d, t, sort=False)[0]), o, d, tmax)
    print(f"full nosort: {t_nosort*1e3:7.1f} ms -> {n/t_nosort/1e6:.2f} M rays/s")
    t_full = bench(jax.jit(
        lambda o, d, t: B.closest_key(cl, o, d, t, sort=True)[0]), o, d, tmax)
    print(f"full sorted: {t_full*1e3:7.1f} ms -> {n/t_full/1e6:.2f} M rays/s")

    # tile stats: how many (block, group) tiles active, passes per tile
    import numpy as np
    bits = np.asarray(B._hitbits(cl, o, d, tmax))
    G = cl.n_groups
    nb = n // B.BLOCK
    banytile = bits.reshape(G, nb, B.BLOCK).astype(bool).any(-1)
    print(f"G={G} nb={nb} tiles={G*nb} active={int(banytile.sum())}")
    pops = np.vectorize(lambda x: bin(x & 0xff).count('1'))(bits)
    print(f"mean clusters hit/ray = {pops.sum(0).mean():.1f}")
    # with sort
    perm = np.asarray(sortkey(o, d))
    bits_s = np.asarray(B._hitbits(cl, o[perm], d[perm], tmax))
    banytile_s = bits_s.reshape(G, nb, B.BLOCK).astype(bool).any(-1)
    print(f"active tiles sorted = {int(banytile_s.sum())}")


if __name__ == "__main__":
    main()

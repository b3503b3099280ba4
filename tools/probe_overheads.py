"""Probe: calibrate the binned-intersector cost model on the real chip.

Separates (by varying one knob at a time and fitting slopes):
  * per-jit-call RPC/launch overhead of the tunneled backend;
  * per-DUMMY-grid-step cost of a pallas dispatch (tile lists are mostly
    padding at low activity — if this is significant, the dense path
    needs a grid ladder);
  * per-LIVE-tile cost (the kernel's real unit of work);
  * _next_group variants: fused 3D reduce vs component-wise 2D.

All timings value-fetch synced.
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
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf[:1])
        break


def bench(f, *a, reps=5):
    r = f(*a)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(f(*a))
    return (time.perf_counter() - t0) / reps


def main():
    from mitsuba_tpu.ops import binned_intersect as B

    scene = make_mesh()
    cl = scene.clusters
    G = cl.n_groups
    print(f"tris={scene.num_triangles} groups={G}", flush=True)
    float(jnp.zeros(()).sum())

    n = 1 << 18
    nsub = n // 128
    o, d = rays(n, False)
    tmax = jnp.full((n,), 3e37)

    # 0) pure call overhead: trivial jit
    triv = jax.jit(lambda x: x + 1.0)
    t0 = bench(triv, jnp.zeros((8, 128)))
    print(f"call overhead (trivial jit): {t0*1e3:7.2f} ms", flush=True)

    # 1) dummy-step cost: all-dummy tile lists of growing length
    disp = jax.jit(lambda o, d, p: B._dispatch_tiles(cl, o, d, p))
    prev = None
    for nt in (2048, 16384, 65536, 141312):
        packed = ((jnp.arange(nt, dtype=jnp.int32) % nsub) << 16) \
            | jnp.int32(G)
        t = bench(disp, o, d, packed)
        line = f"all-dummy tiles={nt:6d}: {t*1e3:7.1f} ms"
        if prev is not None:
            line += f"  (+{(t-prev[1])/(nt-prev[0])*1e6:6.2f} us/step)"
        prev = (nt, t)
        print(line, flush=True)

    # 2) live-tile cost: sorted coherent rays, real submask tiles first
    perm = B.ray_sort_perm(cl, o, d, tmax)
    o_s, d_s, tm_s = o[perm], d[perm], tmax[perm]
    sm = B._subrow_mask(cl, o_s, d_s, tm_s)
    live_idx = np.nonzero(np.asarray(sm).reshape(-1))[0]
    nlive = len(live_idx)
    print(f"live tiles (sorted inc): {nlive}", flush=True)
    for frac in (0.25, 0.5, 1.0):
        k = int(nlive * frac)
        tsub = (live_idx[:k] // G).astype(np.int32)
        tg = (live_idx[:k] % G).astype(np.int32)
        order = np.argsort(tsub, kind="stable")
        packed = jnp.asarray((tsub[order] << 16) | tg[order])
        t = bench(disp, o_s, d_s, packed)
        print(f"live tiles={k:6d}: {t*1e3:7.1f} ms "
              f"({t/max(k,1)*1e6:5.1f} us/tile incl. overhead)", flush=True)

    # 3) _next_group variants
    cur = jnp.full((n,), -1, jnp.int32)
    ng3d = jax.jit(lambda o, d, c, b: B._next_group(cl, o, d, c, b))
    t3d = bench(ng3d, o_s, d_s, cur, tm_s)

    gmin = cl.cmin.reshape(G, B.GROUP, 3).min(1)
    gmax = cl.cmax.reshape(G, B.GROUP, 3).max(1)

    @jax.jit
    def ng2d(o, d, cur, bound):
        inv = B._safe_inv(d)
        best = jnp.full((n,), B.CUR_END, jnp.int32)
        ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
        ix, iy, iz = inv[:, 0], inv[:, 1], inv[:, 2]
        for g in range(0, G, 8):
            hi = min(g + 8, G)
            for k in range(g, hi):
                t0x = (gmin[k, 0] - ox) * ix
                t1x = (gmax[k, 0] - ox) * ix
                t0y = (gmin[k, 1] - oy) * iy
                t1y = (gmax[k, 1] - oy) * iy
                t0z = (gmin[k, 2] - oz) * iz
                t1z = (gmax[k, 2] - oz) * iz
                tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                             jnp.minimum(t0y, t1y)),
                                 jnp.minimum(t0z, t1z))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                             jnp.maximum(t0y, t1y)),
                                 jnp.maximum(t0z, t1z))
                ent = (tn <= tf) & (tf > 1e-3) & (tn < bound)
                tq = jax.lax.bitcast_convert_type(
                    jnp.maximum(tn, 0.0), jnp.int32)
                key = (tq & jnp.int32(~jnp.int32(B.GKEY_MASK))) \
                    | jnp.int32(k)
                key = jnp.where(ent & (key > cur), key, B.CUR_END)
                best = jnp.minimum(best, key)
        return best

    t2d = bench(ng2d, o_s, d_s, cur, tm_s)
    same = bool(jnp.all(ng3d(o_s, d_s, cur, tm_s)
                        == ng2d(o_s, d_s, cur, tm_s)))
    print(f"_next_group 3D: {t3d*1e3:6.1f} ms | 2D unrolled: "
          f"{t2d*1e3:6.1f} ms | agree: {same}", flush=True)


if __name__ == "__main__":
    main()

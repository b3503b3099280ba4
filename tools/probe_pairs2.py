"""Probe: v7 pair path stage costs (each stage its own jit; subtract the
~25 ms tunnel call overhead when reading). Also reports true pair
counts under the cluster-tight mask."""
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


def bench(f, *a, reps=3):
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
    float(jnp.zeros(()).sum())

    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << lg
    p_cap = B.PAIRS_PER_RAY * n
    p_pad = -(-(p_cap + 128 * G) // B.BLOCK) * B.BLOCK
    ntiles = p_pad // 128

    for coh in (False, True):
        tag = "coh" if coh else "inc"
        o, d = rays(n, coh)
        tmax = jnp.full((n,), 3e37)

        mk = jax.jit(lambda o, d, t: B._pair_mask_counts(cl, o, d, t))
        mask, counts = mk(o, d, tmax)
        total = int(jnp.sum(counts))
        print(f"{tag}: pairs={total} ({total/n:.2f}/ray, cap {B.PAIRS_PER_RAY})",
              flush=True)
        t_mask = bench(mk, o, d, tmax)

        @jax.jit
        def build(mask, counts):
            (nz,) = jnp.nonzero(mask.reshape(-1), size=p_cap,
                                fill_value=G * n)
            live = nz < G * n
            g_of = (nz // n).astype(jnp.int32)
            ray_of = (nz % n).astype(jnp.int32)
            up_off = jnp.concatenate(
                [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)[:-1]])
            pad_counts = -(-counts // 128) * 128
            pd_end = jnp.cumsum(pad_counts)
            pd_off = pd_end - pad_counts
            rank = jnp.arange(p_cap, dtype=jnp.int32) \
                - up_off[jnp.minimum(g_of, G - 1)].astype(jnp.int32)
            slot = jnp.where(live,
                             pd_off[jnp.minimum(g_of, G - 1)]
                             .astype(jnp.int32) + rank, p_pad)
            pair_ray = jnp.full((p_pad,), n, jnp.int32) \
                .at[slot].set(ray_of, mode="drop")
            tile_start = jnp.arange(ntiles, dtype=counts.dtype) * 128
            tile_g = jnp.searchsorted(pd_end, tile_start, side="right") \
                .astype(jnp.int32)
            tile_g = jnp.where(tile_start < pd_end[-1], tile_g, G)
            packed = (jnp.arange(ntiles, dtype=jnp.int32) << 16) | tile_g
            return pair_ray, packed

        pair_ray, packed = build(mask, counts)
        t_build = bench(build, mask, counts)
        live_tiles = int(jnp.sum((packed & 0xFFFF) < G))

        @jax.jit
        def gath(pair_ray, o, d, tmax):
            pr = jnp.minimum(pair_ray, n - 1)
            dead = pair_ray >= n
            o_p = jnp.where(dead[:, None], 1.0e7, o[pr])
            d_p = jnp.where(dead[:, None],
                            jnp.asarray([1.0, 0.0, 0.0], d.dtype), d[pr])
            tm_p = jnp.where(dead, 0.0, tmax[pr])
            return o_p, d_p, tm_p

        o_p, d_p, tm_p = gath(pair_ray, o, d, tmax)
        t_gath = bench(gath, pair_ray, o, d, tmax)

        disp = jax.jit(lambda o_p, d_p, packed:
                       B._dispatch_tiles(cl, o_p, d_p, packed))
        keys = disp(o_p, d_p, packed)
        t_disp = bench(disp, o_p, d_p, packed)

        @jax.jit
        def fin(keys, o_p, d_p, tm_p):
            k1 = keys[0][:p_pad // 128].reshape(-1)
            g1 = jnp.maximum(keys[1][:p_pad // 128].reshape(-1), 0)
            k2 = keys[2][:p_pad // 128].reshape(-1)
            g2 = jnp.maximum(keys[3][:p_pad // 128].reshape(-1), 0)
            return B._finalize_closest(scene, cl, k1, g1, k2, g2,
                                       o_p, d_p, tm_p)

        its_p = fin(keys, o_p, d_p, tm_p)
        t_fin = bench(fin, keys, o_p, d_p, tm_p)

        @jax.jit
        def red(its_t, its_valid, its_prim, pair_ray):
            tp = jnp.where(its_valid & (pair_ray < n), its_t, B.MISS_F)
            t_best = jnp.full((n,), B.MISS_F).at[pair_ray] \
                .min(tp, mode="drop")
            pr = jnp.minimum(pair_ray, n - 1)
            is_best = (tp == t_best[pr]) & (tp < B.MISS_F)
            prim = jnp.zeros((n,), jnp.int32).at[pair_ray] \
                .max(jnp.where(is_best, its_prim, -1), mode="drop")
            return t_best, prim

        t_red = bench(red, its_p.t, its_p.valid, its_p.prim, pair_ray)

        print(f"{tag} 2^{lg}: mask {t_mask*1e3:6.1f} | build {t_build*1e3:6.1f}"
              f" | gather {t_gath*1e3:6.1f} | dispatch {t_disp*1e3:6.1f}"
              f" (live tiles {live_tiles}/{ntiles}) | finalize "
              f"{t_fin*1e3:6.1f} | reduce {t_red*1e3:6.1f} ms", flush=True)


if __name__ == "__main__":
    main()

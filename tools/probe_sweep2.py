"""Probe: sweep-v6 phase breakdown on the 70k bench mesh.

Measures, value-fetch synced:
  * resolved fraction + live-subrow fraction after each sweep pass;
  * residual trigger rate;
  * per-phase costs: sort, _next_group, dispatch(nsub tiles), verify,
    dense submask+nonzero, dense dispatch.
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
    print(f"tris={scene.num_triangles} groups={G}", flush=True)
    float(jnp.zeros(()).sum())

    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << lg
    nsub = n // 128

    for coh in (False, True):
        tag = "coh" if coh else "inc"
        o, d = rays(n, coh)
        tmax = jnp.full((n,), 3e37)

        # stats: resolved fraction per pass (run the sweep loop in numpy
        # steps, jitting each phase)
        @jax.jit
        def sortfn(o, d, tmax):
            first = B._next_group(cl, o, d, jnp.full((n,), -1, jnp.int32),
                                  tmax)
            return first

        @jax.jit
        def next_group(o, d, cur, bound):
            return B._next_group(cl, o, d, cur, bound)

        @jax.jit
        def dispatch(o, d, packed):
            return B._dispatch_tiles(cl, o, d, packed)

        @jax.jit
        def verify(k1, g1, k2, g2, o, d, tmax):
            return B._verified_t(scene, cl, k1, g1, k2, g2, o, d, tmax)

        @jax.jit
        def dense(o, d, tmax):
            return B.closest_key2(cl, o, d, tmax, sort=False)

        t_sort = bench(sortfn, o, d, tmax)
        print(f"{tag} first/next_group: {t_sort*1e3:7.1f} ms", flush=True)

        # simulate the sweep with stats
        perm = np.argsort(np.asarray(sortfn(o, d, tmax)) & B.GKEY_MASK,
                          kind="stable")
        o_s = o[perm]
        d_s = d[perm]
        tm_s = tmax[perm]
        cur = jnp.full((n,), -1, jnp.int32)
        bound = tm_s
        k1 = jnp.full((n,), B.MISS_KEY, jnp.int32)
        g1 = jnp.zeros((n,), jnp.int32)
        k2 = jnp.full((n,), B.MISS_KEY, jnp.int32)
        g2 = jnp.zeros((n,), jnp.int32)
        tsub32 = (jnp.arange(nsub, dtype=jnp.int32) << 16)
        t_ng = t_disp = t_ver = 0.0
        for p in range(8):
            cand = next_group(o_s, d_s, cur, bound)
            live = np.asarray(cand != B.CUR_END)
            skey = cand.reshape(nsub, 128).min(1)
            gs = jnp.where(skey == B.CUR_END, G,
                           skey & jnp.int32(B.GKEY_MASK)).astype(jnp.int32)
            live_sub = float(np.asarray(gs != G).mean())
            packed = tsub32 | gs
            keys, grps, keys2, grps2 = dispatch(o_s, d_s, packed)
            k1, g1, k2, g2 = B._merge_top2(
                k1, g1, k2, g2,
                keys[:nsub].reshape(-1), grps[:nsub].reshape(-1),
                keys2[:nsub].reshape(-1), grps2[:nsub].reshape(-1))
            vt = verify(k1, g1, k2, g2, o_s, d_s, tm_s)
            bound = jnp.minimum(tm_s, vt * (1.0 + 2.0 ** -11) + 1e-6)
            adv = (cand != B.CUR_END) & (
                (cand & jnp.int32(B.GKEY_MASK)) == jnp.repeat(gs, 128))
            cur = jnp.where(adv, cand, cur)
            resolved = float(np.asarray(vt < B.MISS_F).mean())
            print(f"{tag} pass {p}: live rays {live.mean():.3f} "
                  f"live subrows {live_sub:.3f} resolved {resolved:.3f}",
                  flush=True)
        cand = next_group(o_s, d_s, cur, bound)
        print(f"{tag} residual rays: {float(np.asarray(cand != B.CUR_END).mean()):.4f}",
              flush=True)

        # phase timings
        t_ng = bench(next_group, o_s, d_s, cur, bound)
        packed0 = tsub32 | jnp.asarray(
            np.asarray(jnp.where(skey == B.CUR_END, G,
                                 skey & jnp.int32(B.GKEY_MASK))),
            jnp.int32)
        t_disp = bench(dispatch, o_s, d_s, packed0)
        t_ver = bench(verify, k1, g1, k2, g2, o_s, d_s, tm_s)
        t_dense = bench(dense, o_s, d_s, tm_s)
        t_dense_b = bench(dense, o_s, d_s, bound)
        print(f"{tag} next_group {t_ng*1e3:.1f} ms | dispatch(late) "
              f"{t_disp*1e3:.1f} ms | verify {t_ver*1e3:.1f} ms | "
              f"dense(full tmax) {t_dense*1e3:.1f} ms | dense(bound) "
              f"{t_dense_b*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

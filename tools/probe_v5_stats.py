"""Round-3 probe: binned-intersector activity statistics + phase costs
to size the v5 redesign. Measures, on the 70k bench mesh:

  * active (sub-row x group) tiles vs active (sub-row x cluster) pairs
    vs per-ray entered clusters (the subrow-granularity waste factor);
  * how many of those pairs survive best-t occlusion (cluster entry
    t_enter < the ray's true hit t) — the t-ordered gating headroom;
  * dummy-grid-step cost: dispatch with zero live tiles but the same
    worst-case grid;
  * full dispatch time split (cull+enum vs kernel).

All timings are value-fetch synced (block_until_ready lies on the
tunneled backend — see BASELINE.md round 3)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from probe_bigmesh import make_mesh, rays


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])[:4]


def bench(f, *a, reps=3):
    r = f(*a)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
        sync(r)
    return (time.perf_counter() - t0) / reps


def sortperm(cl, o, d, tmax):
    # ADVICE r3: the probe must measure the LIBRARY's sort, not a copy
    from mitsuba_tpu.ops import binned_intersect as B
    return B.ray_sort_perm(cl, o, d, tmax)


def cluster_entry(cl, o, d, tmax):
    """(C, N) cluster slab results: (enters, t_enter) — the library's
    guarded reciprocal (B._safe_inv) so the gate condition cannot drift
    from binned_intersect's (ADVICE r3)."""
    from mitsuba_tpu.ops import binned_intersect as B
    from mitsuba_tpu.ops import intersect as I
    inv = B._safe_inv(d)
    t0 = (cl.cmin[:, None] - o[None]) * inv[None]
    t1 = (cl.cmax[:, None] - o[None]) * inv[None]
    tn = jnp.minimum(t0, t1).max(-1)
    tf = jnp.maximum(t0, t1).min(-1)
    hit = (tn <= tf) & (tf > I.SHADOW_EPS) & (tn < tmax[None, :])
    return hit, jnp.maximum(tn, 0.0)


def stats(tag, scene, cl, o, d):
    from mitsuba_tpu.ops import binned_intersect as B
    n = o.shape[0]
    tmax = jnp.full((n,), jnp.float32(3e37))
    perm = sortperm(cl, o, d, tmax)
    o, d = o[perm], d[perm]

    # chunk the dense (C, N) map (ADVICE r3: ~3 GB at 2^20 rays if
    # materialized in one piece)
    ce = jax.jit(lambda o, d, t: cluster_entry(cl, o, d, t))
    CH = 1 << 17
    parts = [ce(o[i:i + CH], d[i:i + CH], tmax[i:i + CH])
             for i in range(0, n, CH)]
    hit = np.concatenate([np.asarray(p[0]) for p in parts], axis=1)
    tn = np.concatenate([np.asarray(p[1]) for p in parts], axis=1)
    C, G = cl.n_clusters, cl.n_groups
    nsub = n // 128

    pair_ray = hit.sum()                                   # per-ray pairs
    sc = hit.reshape(C, nsub, 128).any(-1)                  # (C, nsub)
    pair_sub = sc.sum() * 128                               # subrow pairs
    sg = sc.reshape(G, B.GROUP, nsub).any(1)                      # (G, nsub)
    tiles = sg.sum()

    # occlusion headroom: true hit t per ray, then count clusters whose
    # entry is beyond it
    t_true = np.asarray(jax.jit(
        lambda o, d, t: B.closest_hit(scene, cl, o, d, t).t)(o, d, tmax))
    occl = hit & (tn < t_true[None, :] + 1e-4)
    pair_ray_occ = occl.sum()
    sc_o = occl.reshape(C, nsub, 128).any(-1)
    pair_sub_occ = sc_o.sum() * 128
    sg_o = sc_o.reshape(G, B.GROUP, nsub).any(1)
    tiles_occ = sg_o.sum()

    print(f"[{tag}] n=2^{int(np.log2(n))} C={C} G={G} nsub={nsub}")
    print(f"  per-ray pairs        {pair_ray/1e6:9.2f}M "
          f"({pair_ray/n:7.1f}/ray -> {pair_ray*128/1e9:.2f}G tri-tests)")
    print(f"  subrow pairs         {pair_sub/1e6:9.2f}M "
          f"(waste {pair_sub/max(pair_ray,1):.2f}x)")
    print(f"  subrow pairs w/ occl {pair_sub_occ/1e6:9.2f}M "
          f"(cut {pair_sub/max(pair_sub_occ,1):.2f}x)")
    print(f"  per-ray  w/ occl     {pair_ray_occ/1e6:9.2f}M")
    print(f"  tiles (sub x group)  {tiles} of {nsub*G} "
          f"({tiles/(nsub*G)*100:.1f}%), w/ occl {tiles_occ}"
          f"  [clusters active/tile {pair_sub/128/max(tiles,1):.2f}]")


def timings(scene, cl, o, d):
    from mitsuba_tpu.ops import binned_intersect as B
    n = o.shape[0]
    tmax = jnp.full((n,), jnp.float32(3e37))
    t_full = bench(jax.jit(
        lambda o, d, t: B.closest_hit(scene, cl, o, d, t).t), o, d, tmax)
    print(f"  full closest_hit     {t_full*1e3:8.1f} ms "
          f"-> {n/t_full/1e6:6.2f} M rays/s")
    # zero live tiles, same worst-case grid: tmax=-3e37 is provably
    # below every slab entry regardless of origin placement (ADVICE r3:
    # tmax=0 left tiles live for origins inside a cluster box)
    t_dummy = bench(jax.jit(
        lambda o, d, t: B.closest_hit(scene, cl, o, d, t).t),
        o, d, jnp.full((n,), -3e37, jnp.float32))
    print(f"  all-dummy dispatch   {t_dummy*1e3:8.1f} ms   (grid overhead)")
    # cull + enumeration only
    G = cl.n_groups

    def enum(o, d, t):
        sm = B._subrow_mask(cl, o, d, t)
        maxt = (n // 128) * G
        (tidx,) = jnp.nonzero(sm.reshape(-1), size=maxt, fill_value=maxt)
        return tidx
    t_enum = bench(jax.jit(enum), o, d, tmax)
    print(f"  cull+nonzero         {t_enum*1e3:8.1f} ms")


def main():
    scene = make_mesh()
    cl = scene.clusters
    float(jnp.zeros(()).sum())
    for coh in (True, False):
        tag = "coh" if coh else "inc"
        for lg in (18, 20):
            o, d = rays(1 << lg, coh)
            stats(tag, scene, cl, o, d)
            timings(scene, cl, o, d)


if __name__ == "__main__":
    main()

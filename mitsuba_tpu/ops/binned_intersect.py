"""Two-phase binned ray intersection: dense cluster cull + grouped MXU.

THE TPU-native acceleration structure (replacing the reference's SAH
kd-tree, gkdtree.h:958, for large meshes): pointer-chasing tree walks are
gather-bound and lockstep-divergent on this hardware, while dense MXU
work runs at Tflop/s. v4 is shaped by three measured facts:

  * per-element (scalar) gathers/scatters run at ~100M elem/s on this
    chip — materialising explicit (ray, cluster) pairs spends 20x the
    kernel time in bookkeeping, so the work list stays dense;
  * a K-packed bit-iteration kernel (v3: each lane's 16 phi features in
    the K-chunk of the one cluster it tests, 8 clusters stacked to
    K=128) runs the MXU at full depth, but on incoherent rays ~85% of
    the 128 lanes in a tile never touch the tile's group at all, and
    lanes with several set bits serialise extra full-cost passes: the
    measured win evaporated (0.34M rays/s at 70k tris);
  * one dense (128,16)@(16,4096) pass testing ALL 8 clusters of a group
    for ALL 128 lanes costs exactly the same FLOPs as ONE packed pass —
    so enumerating work at (128-ray sub-row x group) granularity and
    spending one un-packed pass per active pair beats packing whenever
    occupancy is the bottleneck (it always is for bounce rays).

Pipeline:

  1. build time: triangles are Morton-sorted into CSIZE-triangle
     clusters; each cluster's Moller-Trumbore GEMM coefficients occupy a
     (16, 4*CSIZE) column block [det|t|u|v], 8 consecutive clusters form
     a GROUP of (16, 4096);
  2. cull: every ray x every cluster slab test, reduced on the fly to a
     (sub-row, group) any-hit mask — the (N, C) map never exists in HBM;
  3. tiles are (128-ray sub-row x group) pairs from jnp.nonzero over
     that mask, sub-row-major so consecutive tiles of the same ray
     block revisit its output accumulator; the tile list is ONE packed
     int32 scalar-prefetch array (sub_row << 16 | group), bounded per
     dispatch by TILE_BUDGET (rays are chunked above that — SMEM holds
     ~256K scalars and the v3 four-array layout OOMed at 2^20 rays);
  4. the Pallas kernel runs one dense K=16 MXU pass per tile and
     min-accumulates packed [t|slot] keys into the block's per-ray
     accumulator (no per-lane cull bits on the hot path: testing a
     cluster whose box a ray missed cannot produce a hit, so the mask
     only gates enumeration);
  5. decode reads the per-ray keys straight off — no segment reduction —
     and re-derives exact t/barycentrics against the single winning
     triangle.

Rays are optionally pre-sorted by (direction octant, origin Morton) so
sub-rows hit few groups; camera rays are already coherent. Results are
always exact — every hit cluster is tested."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import intersect as I

CSIZE = 128          # triangles per cluster
GROUP = 8            # clusters per group (one GEMM block)
BLOCK = 1024         # rays per output accumulator block (8 sub-rows)
SUBROWS = 8
LANE_BITS = GROUP * CSIZE - 1   # low-bit field of the packed key (10 bits)

MISS_F = 2.0 ** 127
MISS_BITS = 0x7F000000
MISS_KEY = MISS_BITS | LANE_BITS

# max (sub-row x group) tiles per pallas dispatch: one packed int32
# scalar-prefetch array of this length must fit SMEM (1 MiB) with room
# to spare. Ray batches whose nsub * G exceeds this are chunked.
TILE_BUDGET = 131072
# packed tile word: (tsub << 16) | tg  — tsub < 2^15, tg <= 0xFFFF
MAX_NSUB = 1 << 15
MAX_GROUPS = 0xFFFF

# MXU precision: the GEMM runs as a manual bf16x3 split (hi@hi + hi@lo
# + lo@hi, f32 accumulate) — three single-pass bf16 matmuls instead of
# HIGHEST's six-pass f32 emulation (Mosaic has no Precision.HIGH). The
# ~1e-5 relative error is far below the packed key's own t quantisation
# (the low 10 mantissa bits hold the slot id: 2^-13 relative), and the
# winner's t/barycentrics are recomputed in exact f32 afterwards.
# Set False to fall back to Precision.HIGHEST (debugging).
SPLIT_BF16 = True


@struct.dataclass
class Clusters:
    """Morton-clustered GEMM tables + bounds. w holds one (16, 4*CSIZE)
    [det|t|u|v] column block per cluster (8 consecutive clusters = one
    group's (16, 4096) GEMM block), plus a trailing all-zero dummy
    group (id G) for skipped tiles."""

    w: jax.Array           # (16, (G+1) * GROUP * 4*CSIZE)
    cmin: jax.Array        # (C, 3)  C = G*8 (padded with empty boxes)
    cmax: jax.Array        # (C, 3)
    tri_id: jax.Array      # (C*CSIZE,) original triangle id (-1 = pad)
    n_clusters: int = struct.field(pytree_node=False, default=1)
    n_groups: int = struct.field(pytree_node=False, default=1)


def build_clusters(scene) -> Clusters:
    """Host-side: Morton-sort triangles, cut into CSIZE clusters, lay
    each cluster's GEMM coefficients into its (16, 4*CSIZE) block."""
    from ..scene import bvh as bvhlib

    verts = np.asarray(scene.vertices, np.float32)
    tris = np.asarray(scene.indices, np.int32)
    p0 = verts[tris[:, 0]]
    p1 = verts[tris[:, 1]]
    p2 = verts[tris[:, 2]]
    tmin = np.minimum(np.minimum(p0, p1), p2)
    tmax = np.maximum(np.maximum(p0, p1), p2)
    cent = (tmin + tmax) * 0.5
    lo = cent.min(0)
    ext = np.maximum(cent.max(0) - lo, 1e-9)
    order = np.argsort(bvhlib._morton3((cent - lo) / ext),
                       kind="stable").astype(np.int32)

    t = len(tris)
    g = -(-t // (CSIZE * GROUP))
    if g > MAX_GROUPS:
        raise ValueError(f"mesh too large for the binned intersector: "
                         f"{t} tris -> {g} groups > {MAX_GROUPS}")
    c = g * GROUP
    pad = c * CSIZE - t
    tri_id = np.concatenate([order, np.full(pad, -1, np.int32)])
    big = np.float32(1e30)
    cmin = np.concatenate([tmin[order], np.full((pad, 3), big)]) \
        .reshape(c, CSIZE, 3).min(1)
    cmax = np.concatenate([tmax[order], np.full((pad, 3), -big)]) \
        .reshape(c, CSIZE, 3).max(1)

    # GEMM coefficients in sorted order; pad slots zero -> det=0 -> miss
    po = np.concatenate([p0[order], np.zeros((pad, 3), np.float32)])
    e1 = np.concatenate([(p1 - p0)[order], np.zeros((pad, 3), np.float32)])
    e2 = np.concatenate([(p2 - p0)[order], np.zeros((pad, 3), np.float32)])
    w_det, w_t, w_u, w_v = (np.asarray(a) for a in I._gemm_coeffs(
        jnp.asarray(po), jnp.asarray(e1), jnp.asarray(e2)))
    # (16, c*CSIZE) each -> (16, c, 4, CSIZE) -> (16, c*4*CSIZE)
    w = np.stack([a.reshape(16, c, CSIZE) for a in (w_det, w_t, w_u, w_v)],
                 axis=2).reshape(16, c * 4 * CSIZE)
    w = np.concatenate(
        [w, np.zeros((16, GROUP * 4 * CSIZE), np.float32)], axis=1)
    return Clusters(
        w=jnp.asarray(w), cmin=jnp.asarray(cmin), cmax=jnp.asarray(cmax),
        tri_id=jnp.asarray(tri_id), n_clusters=int(c), n_groups=int(g))


def _subrow_mask(cl: Clusters, o, d, tmax):
    """Dense ray x cluster slab test, reduced to a (nsub, G) bool mask:
    does ANY ray of 128-ray sub-row s enter ANY cluster box of group g?
    The (C, N) boolean map is fused away by XLA."""
    G = cl.n_groups
    n = o.shape[0]
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                          jnp.where(d >= 0, 1e-12, -1e-12), d)
    t0 = (cl.cmin[:, None] - o[None]) * inv[None]
    t1 = (cl.cmax[:, None] - o[None]) * inv[None]
    tn = jnp.minimum(t0, t1).max(-1)
    tf = jnp.maximum(t0, t1).min(-1)
    hit = (tn <= tf) & (tf > I.SHADOW_EPS) & (tn < tmax[None, :])
    # (C, N) -> (G, GROUP, nsub, 128) -> any over (GROUP, lanes) -> (nsub, G)
    return hit.reshape(G, GROUP, n // 128, 128).any((1, 3)).T


def _make_kernel(n_groups: int):
    from jax.experimental import pallas as pl

    def _kernel(s_ref, phi_ref, w_ref, key_ref, grp_ref):
        """One (128-ray sub-row x group) tile: a single dense K=16 MXU
        pass testing all 8 clusters of the group for all 128 rays,
        min-merged into the ray block's packed-key accumulator."""
        i = pl.program_id(0)
        cur = s_ref[i]
        tg = cur & 0xFFFF
        tsub = cur >> 16
        tb = cur >> 19          # = tsub // SUBROWS
        prev_tb = jnp.where(i == 0, -1,
                            s_ref[jnp.maximum(i - 1, 0)] >> 19)

        @pl.when(tb != prev_tb)
        def _():
            key_ref[...] = jnp.full((SUBROWS, 128), MISS_KEY, jnp.int32)
            grp_ref[...] = jnp.zeros((SUBROWS, 128), jnp.int32)

        @pl.when(tg < n_groups)
        def _():
            srow = tsub - tb * SUBROWS
            phi = phi_ref[...]                                 # (16, 128)
            w = w_ref[...]                                     # (16, 4096)
            if SPLIT_BF16:
                phi_hi = phi.astype(jnp.bfloat16)
                phi_lo = (phi - phi_hi.astype(jnp.float32)) \
                    .astype(jnp.bfloat16)
                w_hi = w.astype(jnp.bfloat16)
                w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)

                def dot(a, b):
                    return jax.lax.dot_general(
                        a, b, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                out = dot(phi_hi, w_hi) + dot(phi_hi, w_lo) \
                    + dot(phi_lo, w_hi)                        # (128, 4096)
            else:
                out = jax.lax.dot_general(
                    phi, w, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)       # (128, 4096)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (128, CSIZE), 1)
            best = jnp.full((128,), MISS_KEY, jnp.int32)
            for j in range(GROUP):
                b = j * 4 * CSIZE
                det = out[:, b + 0 * CSIZE:b + 1 * CSIZE]
                t_num = out[:, b + 1 * CSIZE:b + 2 * CSIZE]
                u_num = out[:, b + 2 * CSIZE:b + 3 * CSIZE]
                v_num = out[:, b + 3 * CSIZE:b + 4 * CSIZE]
                bad = jnp.abs(det) < 1e-12
                inv_det = jnp.where(bad, 0.0,
                                    1.0 / jnp.where(bad, 1.0, det))
                u = u_num * inv_det
                v = v_num * inv_det
                t = t_num * inv_det
                hit = ((u >= -I.BARY_EPS) & (v >= -I.BARY_EPS)
                       & (u + v <= 1.0 + I.BARY_EPS)
                       & (t > I.SHADOW_EPS) & ~bad)
                t = jnp.where(hit, t, MISS_F)
                slot = j * CSIZE + lanes
                key = (jax.lax.bitcast_convert_type(t, jnp.int32)
                       & jnp.int32(~jnp.int32(LANE_BITS))) | slot
                best = jnp.minimum(best, jnp.min(key, axis=1))
            # masked full-block merge (vectorized; no dynamic sublane io)
            rows = jax.lax.broadcasted_iota(jnp.int32, (SUBROWS, 128), 0)
            bb = jnp.broadcast_to(best[None, :], (SUBROWS, 128))
            cur_k = key_ref[...]
            better = (rows == srow) & (bb < cur_k)
            key_ref[...] = jnp.where(better, bb, cur_k)
            grp_ref[...] = jnp.where(better, tg, grp_ref[...])

    return _kernel


def _closest_key_chunk(cl: Clusters, o, d, tmax):
    """One pallas dispatch over a BLOCK-multiple ray batch whose
    nsub * G fits TILE_BUDGET. Returns (key, grp) in batch order."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = o.shape[0]
    G = cl.n_groups
    nb = n // BLOCK
    nsub = n // 128

    submask = jax.lax.optimization_barrier(
        _subrow_mask(cl, o, d, tmax))                          # (nsub, G)
    phi_t = I._phi(o, d).T                                     # (16, N)

    maxt = nsub * G
    (tidx,) = jnp.nonzero(submask.reshape(-1), size=maxt, fill_value=maxt)
    live = tidx < maxt
    tsub = jnp.where(live, tidx // G, nsub).astype(jnp.int32)
    tg = jnp.where(live, tidx % G, G).astype(jnp.int32)
    packed = (tsub << 16) | tg

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(maxt,),
        in_specs=[
            pl.BlockSpec((16, 128), lambda i, s: (0, s[i] >> 16)),
            pl.BlockSpec((16, GROUP * 4 * CSIZE),
                         lambda i, s: (0, s[i] & 0xFFFF)),
        ],
        out_specs=[
            pl.BlockSpec((SUBROWS, 128), lambda i, s: (s[i] >> 19, 0)),
            pl.BlockSpec((SUBROWS, 128), lambda i, s: (s[i] >> 19, 0)),
        ],
    )
    # phi gets a dummy sub-row column block (index nsub) for padded tiles
    phi_x = jnp.concatenate([phi_t, jnp.zeros((16, 128))], 1)
    keys, grps = pl.pallas_call(
        _make_kernel(G),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(((nb + 1) * SUBROWS, 128), jnp.int32),
            jax.ShapeDtypeStruct(((nb + 1) * SUBROWS, 128), jnp.int32),
        ],
    )(packed, phi_x, cl.w)

    key = keys[:nsub].reshape(-1)
    grp = grps[:nsub].reshape(-1)
    # ray blocks that never got a tile are never written by the kernel
    block_dead = ~submask.reshape(nb, SUBROWS, G).any((1, 2))  # (nb,)
    key = jnp.where(jnp.repeat(block_dead, BLOCK), MISS_KEY, key)
    return key, grp


def closest_key(cl: Clusters, o, d, tmax, sort: bool = True):
    """Returns (key (N,) int32 packed [t|slot], group (N,) int32 winning
    group id, exact (N,) bool — always True). Decode prim via
    cl.tri_id[group*GROUP*CSIZE + (key & LANE_BITS)]."""
    n0 = o.shape[0]
    G = cl.n_groups
    if sort and n0 >= 4 * BLOCK:
        # coherence sort: direction octant then origin Morton cell, so
        # each 128-ray sub-row touches few groups (camera rays already
        # are coherent; bounce/bench rays benefit)
        oct_ = ((d[:, 0] < 0).astype(jnp.uint32)
                | ((d[:, 1] < 0).astype(jnp.uint32) << 1)
                | ((d[:, 2] < 0).astype(jnp.uint32) << 2))
        lo = jnp.min(cl.cmin, 0)
        hi = jnp.max(cl.cmax, 0)
        q = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-9), 0.0, 1.0)
        qi = (q * 31).astype(jnp.uint32)
        cell = (qi[:, 0] << 10) | (qi[:, 1] << 5) | qi[:, 2]
        perm = jnp.argsort((oct_ << 15) | cell)
        inv = jnp.zeros((n0,), jnp.int32).at[perm].set(
            jnp.arange(n0, dtype=jnp.int32), unique_indices=True)
        o = o[perm]
        d = d[perm]
        tmax = tmax[perm]
    else:
        inv = None

    # chunk so each dispatch's tile list fits the scalar-prefetch SMEM
    chunk = min(TILE_BUDGET // G, MAX_NSUB - SUBROWS) // SUBROWS * BLOCK
    chunk = max(chunk, BLOCK)
    n = -(-n0 // BLOCK) * BLOCK
    if n != n0:
        o = jnp.concatenate([o, jnp.ones((n - n0, 3), o.dtype)])
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], d.dtype),
                                 (n - n0, 3))])
        tmax = jnp.concatenate([tmax, jnp.zeros((n - n0,), tmax.dtype)])

    if n <= chunk:
        key, grp = _closest_key_chunk(cl, o, d, tmax)
    else:
        # pad to a chunk multiple so every dispatch shares one compile
        nc = -(-n // chunk) * chunk
        if nc != n:
            o = jnp.concatenate([o, jnp.ones((nc - n, 3), o.dtype)])
            d = jnp.concatenate(
                [d, jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], d.dtype),
                                     (nc - n, 3))])
            tmax = jnp.concatenate([tmax, jnp.zeros((nc - n,), tmax.dtype)])
        parts = [
            _closest_key_chunk(cl, o[i:i + chunk], d[i:i + chunk],
                               tmax[i:i + chunk])
            for i in range(0, nc, chunk)
        ]
        key = jnp.concatenate([p[0] for p in parts])
        grp = jnp.concatenate([p[1] for p in parts])

    # range bound (the kernel tests t > eps only)
    tmax_key = (jax.lax.bitcast_convert_type(tmax[:n0], jnp.int32)
                & jnp.int32(~jnp.int32(LANE_BITS)))
    key = jnp.where(key[:n0] <= (tmax_key | jnp.int32(LANE_BITS)),
                    key[:n0], MISS_KEY)
    grp = jnp.maximum(grp[:n0], 0)
    if inv is not None:
        key = key[inv]
        grp = grp[inv]
    return key, grp, jnp.ones((n0,), bool)


def closest_hit(scene, cl: Clusters, o, d, tmax=None) -> I.Intersection:
    n = o.shape[0]
    if tmax is None:
        tmax = jnp.full((n,), jnp.float32(3e37))
    key, group, _ = closest_key(cl, o, d, tmax)
    t = jax.lax.bitcast_convert_type(
        key & jnp.int32(~jnp.int32(LANE_BITS)), jnp.float32)
    valid = t < MISS_F
    slot = jnp.clip(group, 0, cl.n_groups - 1) * (GROUP * CSIZE) \
        + (key & jnp.int32(LANE_BITS))
    prim = jnp.maximum(cl.tri_id[slot], 0)
    # the packed key spends its low 10 mantissa bits on the slot id;
    # recompute the exact t (and barycentrics) against the single winning
    # triangle (Moller-Trumbore, one triangle per ray)
    vi = scene.indices[prim]
    v0 = scene.vertices[vi[:, 0]]
    e1 = scene.vertices[vi[:, 1]] - v0
    e2 = scene.vertices[vi[:, 2]] - v0
    pv = jnp.cross(d, e2)
    det = jnp.sum(e1 * pv, -1)
    inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0,
                        1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det))
    tv = o - v0
    b1 = jnp.sum(tv * pv, -1) * inv_det
    qv = jnp.cross(tv, e1)
    b2 = jnp.sum(d * qv, -1) * inv_det
    t_exact = jnp.sum(e2 * qv, -1) * inv_det
    t = jnp.where(valid & (t_exact > 0), t_exact, t)
    return I.Intersection(valid=valid, t=jnp.where(valid, t, I.MISS),
                          prim=jnp.where(valid, prim, 0),
                          b1=jnp.where(valid, b1, 0.0),
                          b2=jnp.where(valid, b2, 0.0))


def any_hit(scene, cl: Clusters, o, d, tmax) -> jax.Array:
    limit = tmax * (1.0 - I.SHADOW_EPS)
    key, _, _ = closest_key(cl, o, d, limit)
    t = jax.lax.bitcast_convert_type(
        key & jnp.int32(~jnp.int32(LANE_BITS)), jnp.float32)
    return t < MISS_F

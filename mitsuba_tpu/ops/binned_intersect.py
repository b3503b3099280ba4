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
  4. the Pallas kernel advances each ray to the group bbox, builds the
     feature vector in the group's local frame (precision — see
     DELTA_SPLIT), runs one dense K=16 MXU pass per tile, and
     min-accumulates TOP-2 packed [t|slot] keys into the block's
     per-ray accumulators; the per-pair VPU post (the measured
     bottleneck) is gated per cluster by an in-kernel slab test;
  5. decode reads the per-ray keys straight off — no segment reduction —
     and re-tests both candidates exactly against their triangles.

Rays are optionally pre-sorted by (direction cell, origin cell) so
sub-rows hit few clusters; camera rays are already coherent. Results
are exact: every cluster a ray's sub-row enters is tested, and the
winning candidates are re-validated in f32."""
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
# G must leave room for at least one SUBROWS-subrow ray chunk within
# TILE_BUDGET (maxt = nsub * G <= TILE_BUDGET even at the minimum chunk
# of one BLOCK), or the scalar-prefetch array overflows SMEM at dispatch.
# 16384 groups = 16.8M triangles per binned table.
MAX_GROUPS = TILE_BUDGET // SUBROWS

# MXU precision: the GEMM runs as a manual bf16x3 split (hi@hi + hi@lo
# + lo@hi, f32 accumulate) — three single-pass bf16 matmuls instead of
# HIGHEST's six-pass f32 emulation (Mosaic has no Precision.HIGH). The
# ~1e-5 relative error is far below the packed key's own t quantisation
# (the low 10 mantissa bits hold the slot id: 2^-13 relative), and the
# winner's t/barycentrics are recomputed in exact f32 afterwards.
# Set False to fall back to Precision.HIGHEST (debugging).
SPLIT_BF16 = True
# Hit classification in the split-precision kernel (ADVICE r2): the
# Moller-Trumbore numerators suffer cancellation near triangle edges —
# the absolute GEMM error is ~3*2^-18 of the sum of un-cancelled TERM
# magnitudes, NOT of the cancelled result, so the implied barycentric
# noise err_u ~ DELTA * sum|phi_i w_i| / |det| is SCENE- and RAY-SCALE
# DEPENDENT (measured up to 0.11 on the 0.28-unit reference bunny with
# camera-distance rays; no fixed epsilon can be right). Three mechanisms
# make the result exact anyway:
#   1. magnitude reduction at the source: each group's coefficients are
#      built in the group's LOCAL frame (p0 - group_center), and the
#      kernel advances every ray to its group-bbox entry point before
#      building the feature vector — so every product in the GEMM
#      scales with the group radius (|o''| <= r_group), not with the
#      camera distance or the mesh's world offset. This is the TPU
#      analog of the classic watertight-traversal origin-rebasing
#      trick, and shrinks the noise by 2-4 orders of magnitude;
#   2. the kernel accepts with a per-(ray, triangle) noise band
#      eps_num = DELTA_SPLIT * (|phi_hi| @ |w_hi|) — one extra bf16
#      matmul computing the exact term-magnitude sum. Per-product bf16x3
#      error is <= 3*2^-18 * |a||b| (two split residuals + the dropped
#      lo@lo), so DELTA_SPLIT = 2.5e-5 has ~2x margin. The band is
#      capped at BARY_CAP barycentric units so near-parallel (tiny-det)
#      pairs cannot accept a whole cluster, and rays that miss the
#      group bbox entirely are masked (a wide band could otherwise
#      accept phantoms with garbage t). True hits are never
#      noise-rejected (no light leaks);
#   3. the band admits phantom near-misses whose quantised t can win the
#      min-reduce and shadow the true hit — so the kernel tracks the
#      best TWO candidate triangles per ray, and the decode re-tests
#      both in exact f32, keeping the nearest exactly-valid one. A wrong
#      result now needs two independent phantoms in front of the true
#      hit, each requiring an exact plane crossing inside its own (now
#      tight) noise band.
DELTA_SPLIT = 2.5e-5
BARY_CAP = 0.25


@struct.dataclass
class Clusters:
    """Morton-clustered GEMM tables + bounds. w holds one (16, 4*CSIZE)
    [det|t|u|v] column block per cluster (8 consecutive clusters = one
    group's (16, 4096) GEMM block), plus a trailing all-zero dummy
    group (id G) for skipped tiles."""

    w: jax.Array           # (16, (G+1) * GROUP * 4*CSIZE) — group g's
    #                        coefficients live in g's LOCAL frame
    #                        (p0 - group_center; see DELTA_SPLIT)
    cmin: jax.Array        # (C, 3)  C = G*8 (padded with empty boxes)
    cmax: jax.Array        # (C, 3)
    tri_id: jax.Array      # (C*CSIZE,) original triangle id (-1 = pad)
    gbox: jax.Array        # (8, (G+1)*128) per-group bbox, rows
    #                        [cx cy cz hx hy hz 0 0] broadcast across
    #                        the 128 lanes (center + half-extent; the
    #                        kernel's origin-advance + in-box mask)
    cbox: jax.Array        # (8, (G+1)*GROUP*128) per-CLUSTER bbox in
    #                        the same row layout, one 128-lane column
    #                        block per cluster — the kernel's per-
    #                        cluster slab gate (dead clusters skip the
    #                        whole VPU post-pass, the measured
    #                        bottleneck)
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

    # per-group local frames: bbox over the group's clusters, and the
    # GEMM coefficients built from group-recentred positions (the edge
    # vectors are translation-invariant; only p0 shifts)
    gmin = cmin.reshape(g, GROUP, 3).min(1)
    gmax_ = cmax.reshape(g, GROUP, 3).max(1)
    gmin = np.minimum(gmin, gmax_)          # all-pad groups: empty box
    gcen = ((gmin + gmax_) * 0.5).astype(np.float32)
    ghalf = np.maximum((gmax_ - gmin) * 0.5, 0.0).astype(np.float32)
    gbox = np.zeros((8, (g + 1) * 128), np.float32)
    rows = np.concatenate([gcen, ghalf], 1)            # (g, 6)
    gbox[:6, : g * 128] = np.repeat(rows.T, 128, axis=1).reshape(6, -1)
    # per-cluster boxes (pad clusters: cen 0 / half 0 -> a point box;
    # their triangles are all det=0 so a spurious gate-open is harmless)
    ccen = np.where(cmin <= cmax, (cmin + cmax) * 0.5, 0.0) \
        .astype(np.float32)
    chalf = np.maximum((cmax - cmin) * 0.5, 0.0).astype(np.float32)
    cbox = np.zeros((8, (g + 1) * GROUP * 128), np.float32)
    crows = np.concatenate([ccen, chalf], 1)           # (c, 6)
    cbox[:6, : c * 128] = np.repeat(crows.T, 128, axis=1).reshape(6, -1)

    # GEMM coefficients in sorted order; pad slots zero -> det=0 -> miss
    po = np.concatenate([p0[order], np.zeros((pad, 3), np.float32)])
    e1 = np.concatenate([(p1 - p0)[order], np.zeros((pad, 3), np.float32)])
    e2 = np.concatenate([(p2 - p0)[order], np.zeros((pad, 3), np.float32)])
    po = po - np.repeat(gcen, GROUP * CSIZE, axis=0)
    w_det, w_t, w_u, w_v = (np.asarray(a) for a in I._gemm_coeffs(
        jnp.asarray(po), jnp.asarray(e1), jnp.asarray(e2)))
    # (16, c*CSIZE) each -> (16, c, 4, CSIZE) -> (16, c*4*CSIZE)
    w = np.stack([a.reshape(16, c, CSIZE) for a in (w_det, w_t, w_u, w_v)],
                 axis=2).reshape(16, c * 4 * CSIZE)
    w = np.concatenate(
        [w, np.zeros((16, GROUP * 4 * CSIZE), np.float32)], axis=1)
    return Clusters(
        w=jnp.asarray(w), cmin=jnp.asarray(cmin), cmax=jnp.asarray(cmax),
        tri_id=jnp.asarray(tri_id), gbox=jnp.asarray(gbox),
        cbox=jnp.asarray(cbox), n_clusters=int(c), n_groups=int(g))


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

    def _kernel(s_ref, od_ref, w_ref, bbox_ref, cbox_ref,
                key_ref, grp_ref, key2_ref, grp2_ref, scr_ref):
        """One (128-ray sub-row x group) tile: advance each ray to the
        group's bbox entry, build the 16-dim feature vector in the
        group's local frame, run a single dense K=16 MXU pass testing
        all 8 clusters of the group for all 128 rays, min-merge into
        the ray block's TOP-2 packed-key accumulators (two distinct
        candidate triangles per ray — decode re-tests both exactly,
        see DELTA_SPLIT). The per-pair VPU post-pass is the measured
        bottleneck (~40 ops/pair), so each cluster's post is gated by
        an in-kernel 128-ray slab test: clusters no ray of the sub-row
        enters skip it entirely (~2x fewer pairs on sorted bounce
        rays, ~4x on camera rays)."""
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
            key2_ref[...] = jnp.full((SUBROWS, 128), MISS_KEY, jnp.int32)
            grp2_ref[...] = jnp.zeros((SUBROWS, 128), jnp.int32)

        @pl.when(tg < n_groups)
        def _():
            srow = tsub - tb * SUBROWS
            od = od_ref[...]                                   # (8, 128)
            w = w_ref[...]                                     # (16, 4096)
            bb = bbox_ref[...]                                 # (8, 128)
            o3 = od[0:3]
            d3 = od[3:6]
            cen = bb[0:3]
            half = bb[3:6]
            # advance the origin to the group-bbox entry point and move
            # into the group's local frame: |o2| <= r_group, so every
            # GEMM product is group-scaled (see DELTA_SPLIT)
            inv = 1.0 / jnp.where(jnp.abs(d3) < 1e-12,
                                  jnp.where(d3 >= 0, 1e-12, -1e-12), d3)
            t0 = (cen - half - o3) * inv
            t1 = (cen + half - o3) * inv
            tn = jnp.max(jnp.minimum(t0, t1), axis=0)          # (128,)
            tf = jnp.min(jnp.maximum(t0, t1), axis=0)
            inbox = (tn <= tf) & (tf > I.SHADOW_EPS)
            # as f32: Mosaic cannot minor-dim-broadcast 1-D i1 vectors
            inboxf = jnp.where(inbox, 1.0, 0.0)
            adv = jnp.where(inbox, jnp.maximum(tn, 0.0), 0.0)
            o2 = o3 + adv[None, :] * d3 - cen                  # (3, 128)
            # feature rows [1, o2, d, o2 (x) d] — phi of the rebased ray
            phi = jnp.concatenate(
                [jnp.ones((1, 128), jnp.float32), o2, d3]
                + [o2[i:i + 1] * d3 for i in range(3)], axis=0)  # (16,128)
            if SPLIT_BF16:
                phi_hi = phi.astype(jnp.bfloat16)
                phi_lo = (phi - phi_hi.astype(jnp.float32)) \
                    .astype(jnp.bfloat16)
                w_hi = w.astype(jnp.bfloat16)
                w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)

                def dot(a, b):
                    # precision pinned: the manual bf16x3 split IS the
                    # precision strategy — a global
                    # jax_default_matmul_precision=float32 would make
                    # Mosaic reject the bf16 matmul ("Bad lhs type")
                    return jax.lax.dot_general(
                        a, b, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
                out = dot(phi_hi, w_hi) + dot(phi_hi, w_lo) \
                    + dot(phi_lo, w_hi)                        # (128, 4096)
                # per-(ray, triangle) noise band: the exact sum of term
                # magnitudes (one more bf16 matmul — see DELTA_SPLIT)
                mag = DELTA_SPLIT * dot(jnp.abs(phi_hi), jnp.abs(w_hi))
            else:
                out = jax.lax.dot_general(
                    phi, w, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)       # (128, 4096)
                mag = jnp.zeros_like(out)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (128, CSIZE), 1)
            cb = cbox_ref[...]                                 # (8, 1024)
            scr_ref[...] = jnp.full((8, 128), MISS_KEY, jnp.int32)
            for j in range(GROUP):
                # per-cluster slab gate: skip the whole post-pass when
                # no ray of the sub-row enters cluster j's box
                cs = cb[:, j * 128:(j + 1) * 128]
                clo = cs[0:3] - cs[3:6]
                chi = cs[0:3] + cs[3:6]
                tc0 = (clo - o3) * inv
                tc1 = (chi - o3) * inv
                tnc = jnp.max(jnp.minimum(tc0, tc1), axis=0)
                tfc = jnp.min(jnp.maximum(tc0, tc1), axis=0)
                okj = (tnc <= tfc) & (tfc > I.SHADOW_EPS) & inbox

                @pl.when(jnp.any(okj))
                def _(j=j):
                    b = j * 4 * CSIZE
                    det = out[:, b + 0 * CSIZE:b + 1 * CSIZE]
                    t_num = out[:, b + 1 * CSIZE:b + 2 * CSIZE]
                    u_num = out[:, b + 2 * CSIZE:b + 3 * CSIZE]
                    v_num = out[:, b + 3 * CSIZE:b + 4 * CSIZE]
                    # sign-free classification: a hit has det, u_num,
                    # v_num, w_num, t_num ALL the same sign; the noise
                    # band widens each barycentric numerator by its
                    # capped magnitude bound (see DELTA_SPLIT)
                    a = jnp.abs(det)
                    cap = BARY_CAP * a
                    eps_a = I.BARY_EPS * a
                    mu = jnp.minimum(mag[:, b + 2 * CSIZE:b + 3 * CSIZE]
                                     + eps_a, cap)
                    mv = jnp.minimum(mag[:, b + 3 * CSIZE:b + 4 * CSIZE]
                                     + eps_a, cap)
                    w_num = det - u_num - v_num
                    mw = mu + mv
                    pos = jnp.minimum(
                        jnp.minimum(u_num + mu, v_num + mv),
                        jnp.minimum(w_num + mw, det))
                    pos = jnp.minimum(pos, t_num)
                    neg = jnp.maximum(
                        jnp.maximum(u_num - mu, v_num - mv),
                        jnp.maximum(w_num - mw, det))
                    neg = jnp.maximum(neg, t_num)
                    # world-frame t (quantised anyway: approx
                    # reciprocal is fine — decode re-derives exact t)
                    tw = t_num * pl.reciprocal(det, approx=True) \
                        + adv[:, None]
                    hit = (((pos > 0) | (neg < 0))
                           & (tw > I.SHADOW_EPS)
                           & (inboxf[:, None] > 0.5))
                    t = jnp.where(hit, tw, MISS_F)
                    slot = j * CSIZE + lanes
                    key = (jax.lax.bitcast_convert_type(t, jnp.int32)
                           & jnp.int32(~jnp.int32(LANE_BITS))) | slot
                    c1 = jnp.min(key, axis=1)
                    c2 = jnp.min(jnp.where(key == c1[:, None],
                                           jnp.int32(MISS_KEY), key),
                                 axis=1)
                    b1 = scr_ref[0, :]
                    b2 = scr_ref[1, :]
                    scr_ref[0, :] = jnp.minimum(b1, c1)
                    scr_ref[1, :] = jnp.minimum(
                        jnp.minimum(b2, c2), jnp.maximum(b1, c1))
            best1 = scr_ref[0, :]
            best2 = scr_ref[1, :]
            # masked full-block top-2 merge across tiles (vectorized; no
            # dynamic sublane io). Accumulator (a1,a2) x pass (b1,b2):
            # new1 = min(a1,b1); new2 = min(max(a1,b1), a2, b2). Keys are
            # unique per triangle (slot bits), and a triangle belongs to
            # exactly one tile, so candidates stay distinct.
            rows = jax.lax.broadcasted_iota(jnp.int32, (SUBROWS, 128), 0)
            mask = rows == srow
            b1 = jnp.broadcast_to(best1[None, :], (SUBROWS, 128))
            b2 = jnp.broadcast_to(best2[None, :], (SUBROWS, 128))
            a1 = key_ref[...]
            a2 = key2_ref[...]
            g1 = grp_ref[...]
            g2 = grp2_ref[...]
            take_b = b1 < a1
            n1 = jnp.where(take_b, b1, a1)
            ng1 = jnp.where(take_b, tg, g1)
            x = jnp.where(take_b, a1, b1)      # loser of the top contest
            gx = jnp.where(take_b, g1, tg)
            n2 = jnp.minimum(jnp.minimum(x, a2), b2)
            ng2 = jnp.where(n2 == x, gx, jnp.where(n2 == a2, g2, tg))
            key_ref[...] = jnp.where(mask, n1, a1)
            grp_ref[...] = jnp.where(mask, ng1, g1)
            key2_ref[...] = jnp.where(mask, n2, a2)
            grp2_ref[...] = jnp.where(mask, ng2, g2)

    return _kernel


def _closest_key_chunk(cl: Clusters, o, d, tmax):
    """One pallas dispatch over a BLOCK-multiple ray batch whose
    nsub * G fits TILE_BUDGET. Returns (key1, grp1, key2, grp2) in
    batch order — the two best candidate triangles per ray."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = o.shape[0]
    G = cl.n_groups
    nb = n // BLOCK
    nsub = n // 128

    submask = jax.lax.optimization_barrier(
        _subrow_mask(cl, o, d, tmax))                          # (nsub, G)

    maxt = nsub * G
    (tidx,) = jnp.nonzero(submask.reshape(-1), size=maxt, fill_value=maxt)
    live = tidx < maxt
    tsub = jnp.where(live, tidx // G, nsub).astype(jnp.int32)
    tg = jnp.where(live, tidx % G, G).astype(jnp.int32)
    packed = (tsub << 16) | tg

    out_spec = pl.BlockSpec((SUBROWS, 128), lambda i, s: (s[i] >> 19, 0))
    out_shape = jax.ShapeDtypeStruct(((nb + 1) * SUBROWS, 128), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(maxt,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i, s: (0, s[i] >> 16)),
            pl.BlockSpec((16, GROUP * 4 * CSIZE),
                         lambda i, s: (0, s[i] & 0xFFFF)),
            pl.BlockSpec((8, 128), lambda i, s: (0, s[i] & 0xFFFF)),
            pl.BlockSpec((8, GROUP * 128), lambda i, s: (0, s[i] & 0xFFFF)),
        ],
        out_specs=[out_spec] * 4,
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
    )
    # ray rows [o|d|0|0]; a dummy sub-row column block for padded tiles
    odm = jnp.concatenate(
        [o.T, d.T, jnp.zeros((2, n), o.dtype)], 0)             # (8, N)
    od_x = jnp.concatenate([odm, jnp.zeros((8, 128), o.dtype)], 1)
    keys, grps, keys2, grps2 = pl.pallas_call(
        _make_kernel(G),
        grid_spec=grid_spec,
        out_shape=[out_shape] * 4,
    )(packed, od_x, cl.w, cl.gbox, cl.cbox)

    # ray blocks that never got a tile are never written by the kernel
    block_dead = jnp.repeat(
        ~submask.reshape(nb, SUBROWS, G).any((1, 2)), BLOCK)   # (n,)
    key = jnp.where(block_dead, MISS_KEY, keys[:nsub].reshape(-1))
    key2 = jnp.where(block_dead, MISS_KEY, keys2[:nsub].reshape(-1))
    return key, grps[:nsub].reshape(-1), key2, grps2[:nsub].reshape(-1)


def closest_key(cl: Clusters, o, d, tmax, sort: bool = True):
    """Returns (key (N,) int32 packed [t|slot], group (N,) int32 winning
    group id, exact (N,) bool — always True). Decode prim via
    cl.tri_id[group*GROUP*CSIZE + (key & LANE_BITS)]."""
    k1, g1, _, _ = closest_key2(cl, o, d, tmax, sort=sort)
    return k1, g1, jnp.ones((o.shape[0],), bool)


def closest_key2(cl: Clusters, o, d, tmax, sort: bool = True):
    """Top-2 candidate keys per ray: (key1, grp1, key2, grp2). The
    kernel classifies with the noise-scaled band (DELTA_SPLIT), so
    candidate 1 can be a phantom near-miss — callers must re-test both
    candidates in exact f32 (closest_hit / any_hit do)."""
    n0 = o.shape[0]
    G = cl.n_groups
    if sort and n0 >= 4 * BLOCK:
        # coherence sort: 3-bit-per-axis direction cell then origin
        # cell, so each 128-ray sub-row touches few clusters (measured
        # on the 70k bench mesh at 2^20 rays: cluster-level activity
        # 0.49 -> 0.27 vs the old octant+morton15 key)
        qd = ((d * 0.5 + 0.5) * 7.999).astype(jnp.uint32)
        lo = jnp.min(cl.cmin, 0)
        hi = jnp.max(cl.cmax, 0)
        q = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-9), 0.0, 1.0)
        qi = (q * 31.999).astype(jnp.uint32)
        kd = (qd[:, 0] << 6) | (qd[:, 1] << 3) | qd[:, 2]
        ko = (qi[:, 0] << 10) | (qi[:, 1] << 5) | qi[:, 2]
        perm = jnp.argsort((kd << 15) | ko)
        inv = jnp.zeros((n0,), jnp.int32).at[perm].set(
            jnp.arange(n0, dtype=jnp.int32), unique_indices=True)
        o = o[perm]
        d = d[perm]
        tmax = tmax[perm]
    else:
        inv = None

    # chunk so each dispatch's tile list fits the scalar-prefetch SMEM
    # (G <= MAX_GROUPS guarantees chunk >= BLOCK here)
    chunk = min(TILE_BUDGET // G, MAX_NSUB - SUBROWS) // SUBROWS * BLOCK
    n = -(-n0 // BLOCK) * BLOCK
    if n != n0:
        o = jnp.concatenate([o, jnp.ones((n - n0, 3), o.dtype)])
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], d.dtype),
                                 (n - n0, 3))])
        tmax = jnp.concatenate([tmax, jnp.zeros((n - n0,), tmax.dtype)])

    if n <= chunk:
        parts = [_closest_key_chunk(cl, o, d, tmax)]
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
            for i in range(0, -(-n // chunk) * chunk, chunk)
        ]
    key, grp, key2, grp2 = (
        jnp.concatenate([p[k] for p in parts]) if len(parts) > 1
        else parts[0][k] for k in range(4))

    # range bound (the kernel tests t > eps only)
    tmax_key = (jax.lax.bitcast_convert_type(tmax[:n0], jnp.int32)
                & jnp.int32(~jnp.int32(LANE_BITS))) | jnp.int32(LANE_BITS)
    key = jnp.where(key[:n0] <= tmax_key, key[:n0], MISS_KEY)
    key2 = jnp.where(key2[:n0] <= tmax_key, key2[:n0], MISS_KEY)
    grp = jnp.maximum(grp[:n0], 0)
    grp2 = jnp.maximum(grp2[:n0], 0)
    if inv is not None:
        key = key[inv]
        grp = grp[inv]
        key2 = key2[inv]
        grp2 = grp2[inv]
    return key, grp, key2, grp2


def _decode_prim(cl: Clusters, key, grp):
    """(key, grp) -> (kernel-valid, quantised t, triangle id)."""
    t = jax.lax.bitcast_convert_type(
        key & jnp.int32(~jnp.int32(LANE_BITS)), jnp.float32)
    slot = jnp.clip(grp, 0, cl.n_groups - 1) * (GROUP * CSIZE) \
        + (key & jnp.int32(LANE_BITS))
    return t < MISS_F, t, jnp.maximum(cl.tri_id[slot], 0)


def _exact_test(scene, prim, o, d):
    """Exact f32 Moller-Trumbore of each ray against one triangle.
    Returns (t, b1, b2, strictly-inside with the f32 BARY_EPS)."""
    vi = scene.indices[prim]
    v0 = scene.vertices[vi[:, 0]]
    e1 = scene.vertices[vi[:, 1]] - v0
    e2 = scene.vertices[vi[:, 2]] - v0
    pv = jnp.cross(d, e2)
    det = jnp.sum(e1 * pv, -1)
    bad = jnp.abs(det) < 1e-12
    inv_det = jnp.where(bad, 0.0, 1.0 / jnp.where(bad, 1.0, det))
    tv = o - v0
    b1 = jnp.sum(tv * pv, -1) * inv_det
    qv = jnp.cross(tv, e1)
    b2 = jnp.sum(d * qv, -1) * inv_det
    t = jnp.sum(e2 * qv, -1) * inv_det
    ok = ((b1 >= -I.BARY_EPS) & (b2 >= -I.BARY_EPS)
          & (b1 + b2 <= 1.0 + I.BARY_EPS) & (t > I.SHADOW_EPS) & ~bad)
    return t, b1, b2, ok


def closest_hit(scene, cl: Clusters, o, d, tmax=None) -> I.Intersection:
    n = o.shape[0]
    if tmax is None:
        tmax = jnp.full((n,), jnp.float32(3e37))
    k1, g1, k2, g2 = closest_key2(cl, o, d, tmax)
    valid1, tq1, prim1 = _decode_prim(cl, k1, g1)
    valid2, _, prim2 = _decode_prim(cl, k2, g2)
    # the packed key spends its low 10 mantissa bits on the slot id and
    # the kernel classified inside the noise band — re-test BOTH
    # candidates in exact f32 and keep the nearest exactly-valid one
    # (rescues true hits shadowed by a phantom near-miss winner)
    te1, b11, b21, ok1 = _exact_test(scene, prim1, o, d)
    te2, b12, b22, ok2 = _exact_test(scene, prim2, o, d)
    ok1 &= valid1 & (te1 <= tmax)
    ok2 &= valid2 & (te2 <= tmax)
    use2 = ok2 & (~ok1 | (te2 < te1))
    prim = jnp.where(use2, prim2, prim1)
    t = jnp.where(use2, te2, te1)
    b1 = jnp.where(use2, b12, b11)
    b2 = jnp.where(use2, b22, b21)
    # both candidates exactly-marginal but the kernel saw a hit: keep
    # candidate 1 clamped onto its triangle rather than leak (for shared
    # edges the winner is the same geometric point as the neighbour)
    valid = valid1 | ok2
    t = jnp.where(ok1 | use2, t, jnp.where(te1 > 0, te1, tq1))
    b1 = jnp.clip(b1, 0.0, 1.0)
    b2 = jnp.clip(b2, 0.0, 1.0 - b1)
    return I.Intersection(valid=valid, t=jnp.where(valid, t, I.MISS),
                          prim=jnp.where(valid, prim, 0),
                          b1=jnp.where(valid, b1, 0.0),
                          b2=jnp.where(valid, b2, 0.0))


def any_hit(scene, cl: Clusters, o, d, tmax) -> jax.Array:
    limit = tmax * (1.0 - I.SHADOW_EPS)
    k1, g1, k2, g2 = closest_key2(cl, o, d, limit)
    valid1, _, prim1 = _decode_prim(cl, k1, g1)
    valid2, _, prim2 = _decode_prim(cl, k2, g2)
    # exact re-test so a phantom near-miss cannot cast a shadow
    te1, _, _, ok1 = _exact_test(scene, prim1, o, d)
    te2, _, _, ok2 = _exact_test(scene, prim2, o, d)
    return (valid1 & ok1 & (te1 <= limit)) | (valid2 & ok2 & (te2 <= limit))

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

Rays are optionally pre-sorted by their GROUP-ENTRY SIGNATURE
(ray_sort_perm: first/last group entered + count + direction cell) so
sub-rows hit few clusters; camera rays are already coherent. Results
are exact: every cluster a ray's sub-row enters is tested, and the
winning candidates are re-validated in f32.

Beyond this dense default, two measured r4 variants live below and are
pinned against it in tests: the t-ordered sweep (v6.2 —
closest_key2_sweep; first incoherent win, +20%) and the pair-explicit
dispatch (v7 — closest_hit_pairs; 100% lane efficiency but
bookkeeping-bound). See BASELINE.md round 4 for the cost model and
honest numbers."""
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
    w_abs_uv: jax.Array    # (16, (G+1)*GROUP*2*CSIZE) bf16 = |bf16(w)|
    #                        restricted to the u|v column pairs. The
    #                        noise-band GEMM only ever reads the u,v
    #                        slices of mag, so the kernel computes mag
    #                        at HALF width from this table — same band
    #                        values, half the mag materialization
    #                        (measured +20% on coherent tiles, whose
    #                        post-pass is mostly gated off; incoherent
    #                        tiles are post-compute-bound: no change)
    w_hi: jax.Array        # (16, (G+1)*GROUP*4*CSIZE) bf16 = bf16(w)
    w_lo: jax.Array        # bf16(w - f32(w_hi)) — the split-precision
    #                        operands prebuilt so the kernel skips the
    #                        per-tile f32 read + split conversion
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
    # run the coefficient math on the HOST cpu device: on the tunneled
    # TPU backend the eager op-by-op dispatch + multi-hundred-MB
    # fetches made a 1.1M-tri build take ~2.5 min; host-side it is
    # seconds, and only the finished tables ship to the device once
    try:
        _host = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        _host = None
    if _host is not None:
        with jax.default_device(_host):
            coeffs = I._gemm_coeffs(jax.device_put(po, _host),
                                    jax.device_put(e1, _host),
                                    jax.device_put(e2, _host))
            w_det, w_t, w_u, w_v = (np.asarray(a) for a in coeffs)
    else:
        w_det, w_t, w_u, w_v = (np.asarray(a) for a in I._gemm_coeffs(
            jnp.asarray(po), jnp.asarray(e1), jnp.asarray(e2)))
    # (16, c*CSIZE) each -> (16, c, 4, CSIZE) -> (16, c*4*CSIZE)
    w = np.stack([a.reshape(16, c, CSIZE) for a in (w_det, w_t, w_u, w_v)],
                 axis=2).reshape(16, c * 4 * CSIZE)
    w = np.concatenate(
        [w, np.zeros((16, GROUP * 4 * CSIZE), np.float32)], axis=1)
    # prebuilt split-precision operands (exactly the values the kernel
    # used to derive per tile: hi = bf16(w), lo = bf16(w - f32(hi))).
    # numpy/ml_dtypes casts are round-to-nearest-even like XLA's, and
    # the noise band only needs self-consistency with the w the kernel
    # multiplies, so building them host-side is exact.
    import ml_dtypes
    w_hi = w.astype(ml_dtypes.bfloat16)
    w_lo = (w - w_hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    # |bf16(w)| of the u,v columns only ([det|t|u|v] -> slots 2,3): the
    # exact operand the kernel's noise-band dot used when it computed
    # the full-width mag, so band values are bit-identical
    wa = np.abs(w_hi).reshape(16, -1, 4, CSIZE)[:, :, 2:4, :] \
        .reshape(16, -1)
    return Clusters(
        w=jnp.asarray(w), cmin=jnp.asarray(cmin), cmax=jnp.asarray(cmax),
        tri_id=jnp.asarray(tri_id), gbox=jnp.asarray(gbox),
        cbox=jnp.asarray(cbox), w_abs_uv=jnp.asarray(wa),
        w_hi=jnp.asarray(w_hi), w_lo=jnp.asarray(w_lo),
        n_clusters=int(c), n_groups=int(g))


def _safe_inv(d):
    """Reciprocal direction with the +-1e-12 zero guard (shared by every
    slab test in this module and by the probe tools — ADVICE r3)."""
    return 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                           jnp.where(d >= 0, 1e-12, -1e-12), d)


def ray_sort_perm(cl: Clusters, o, d, tmax):
    """Group-signature coherence sort (v6).

    v5 sorted rays by a (direction-cell, origin-cell) heuristic; the
    measured sub-row tile activity on the 70k bench mesh was 0.27 vs an
    ideal (per-ray) activity of ~0.035 — i.e. ~8x wasted MXU+post work
    because the 128 rays of a sub-row enter the UNION of their group
    sets. v6 sorts by the *exact entry signature* instead: the (first,
    last) group-id entered along the ray, then a 31-bit occupancy
    SKETCH of the full entered-group set (group ids scaled onto the 31
    bit slots — tools/probe_sort.py measured the sketch tiebreak at
    -17% live tiles incoherent / -6% coherent vs a (count, cell)
    tiebreak, within 2.1x of the per-ray ideal), then a direction cell
    (helps the kernel's per-cluster slab gate). Rays with identical
    signatures form runs whose sub-rows test exactly their own groups;
    the per-ray group test is a fused reduce over G (the (N, G) map
    never materializes). Rays entering nothing sort to the end, so
    their blocks are skipped entirely.
    """
    G = cl.n_groups
    gmin = cl.cmin.reshape(G, GROUP, 3).min(1)       # (G, 3); pads are
    gmax = cl.cmax.reshape(G, GROUP, 3).max(1)       # empty boxes
    inv = _safe_inv(d)
    t0 = (gmin[:, None] - o[None]) * inv[None]       # (G, N, 3) — fused
    t1 = (gmax[:, None] - o[None]) * inv[None]
    tn = jnp.minimum(t0, t1).max(-1)
    tf = jnp.maximum(t0, t1).min(-1)
    enters = (tn <= tf) & (tf > I.SHADOW_EPS) & (tn < tmax[None, :])
    gid = jax.lax.broadcasted_iota(jnp.int32, enters.shape, 0)
    first = jnp.min(jnp.where(enters, gid, G), axis=0)           # (N,)
    last = jnp.max(jnp.where(enters, gid, -1), axis=0)
    cnt = jnp.minimum(jnp.sum(enters, axis=0), 63)
    # 31-bit occupancy sketch of the entered-group set (scaled slots
    # keep Morton-adjacent groups on adjacent bits)
    shift = 30 - (gid * 31) // max(G, 1)
    sketch = jax.lax.reduce(
        jnp.where(enters, jnp.int32(1) << shift, 0),
        jnp.int32(0), jax.lax.bitwise_or, (0,))                  # (N,)
    # primary: the signature; secondary: direction cell + origin morton
    # so equal-signature runs stay spatially coherent for the gates
    primary = first * jnp.int32(MAX_GROUPS) + jnp.maximum(last, 0)
    qd = ((d * 0.5 + 0.5) * 7.999).astype(jnp.int32)
    lo = jnp.min(gmin, 0)
    hi = jnp.max(gmax, 0)
    q = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-9), 0.0, 1.0)
    qi = (q * 31.999).astype(jnp.int32)
    dcell = (qd[:, 0] << 6) | (qd[:, 1] << 3) | qd[:, 2]
    ocell = (qi[:, 0] << 10) | (qi[:, 1] << 5) | qi[:, 2]
    secondary = (cnt << 24) | (dcell << 15) | ocell
    return jnp.lexsort((secondary, sketch, primary))


def _subrow_mask(cl: Clusters, o, d, tmax):
    """Group-bbox slab test, reduced to a (nsub, G) bool mask: does ANY
    ray of 128-ray sub-row s enter group g's bounding box?

    r5: this used the 8x more expensive per-CLUSTER boxes (C, N); on the
    bench meshes the Morton-packed clusters tile their group bbox so
    densely that the tile sets are IDENTICAL (verified offline over all
    three render ray classes), and a looser mask is always safe — the
    kernel still gates each cluster exactly, extra tiles just cost their
    dispatch. The (G, N) map is fused away by XLA."""
    G = cl.n_groups
    n = o.shape[0]
    gmin = cl.cmin.reshape(G, GROUP, 3).min(1)
    gmax = cl.cmax.reshape(G, GROUP, 3).max(1)
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                          jnp.where(d >= 0, 1e-12, -1e-12), d)
    t0 = (gmin[:, None] - o[None]) * inv[None]
    t1 = (gmax[:, None] - o[None]) * inv[None]
    tn = jnp.minimum(t0, t1).max(-1)
    tf = jnp.maximum(t0, t1).min(-1)
    hit = (tn <= tf) & (tf > I.SHADOW_EPS) & (tn < tmax[None, :])
    # (G, N) -> (G, nsub, 128) -> any over lanes -> (nsub, G)
    return hit.reshape(G, n // 128, 128).any(-1).T


def _make_kernel(n_groups: int):
    from jax.experimental import pallas as pl

    def _kernel(s_ref, od_ref, *refs):
        if SPLIT_BF16:
            (wh_ref, wl_ref, wa_ref, bbox_ref, cbox_ref,
             key_ref, grp_ref, key2_ref, grp2_ref, scr_ref) = refs
        else:
            (w_ref, bbox_ref, cbox_ref,
             key_ref, grp_ref, key2_ref, grp2_ref, scr_ref) = refs
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
                w_hi = wh_ref[...]                             # (16, 4096)
                w_lo = wl_ref[...]

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
                # magnitudes (one more bf16 matmul — see DELTA_SPLIT).
                # Only the u,v columns are ever read, so the dot runs at
                # HALF width against the prebuilt |bf16(w)| u|v table:
                # identical band values, half the mag VMEM traffic.
                mag = DELTA_SPLIT * dot(jnp.abs(phi_hi),
                                        wa_ref[...])           # (128, 2048)
            else:
                out = jax.lax.dot_general(
                    phi, w_ref[...], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)       # (128, 4096)
                mag = jnp.zeros((128, GROUP * 2 * CSIZE), out.dtype)
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
                    b2 = j * 2 * CSIZE
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
                    mu = jnp.minimum(mag[:, b2 + 0 * CSIZE:b2 + 1 * CSIZE]
                                     + eps_a, cap)
                    mv = jnp.minimum(mag[:, b2 + 1 * CSIZE:b2 + 2 * CSIZE]
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
                    # NOTE (r4): a per-column running top-2 with one
                    # final cross-lane reduction was tried and is SLOWER
                    # (+25%): the (128,128) scratch read+write per
                    # cluster costs more than the two per-cluster row
                    # reductions it saves. Keep the row-accumulator form.
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


def _dispatch_tiles(cl: Clusters, o, d, packed):
    """Run the Pallas kernel over an explicit packed tile list
    ((tsub << 16) | tg, dummy tiles carry tg == n_groups). Returns the
    raw per-block accumulator arrays (4 x ((nb+1)*SUBROWS, 128) int32);
    blocks none of whose tiles were live are NOT written by the kernel
    — callers must mask them out."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # The search is non-differentiable BY DESIGN (its winning key is
    # re-tested exactly in XLA by _finalize_closest, and the hit
    # geometry is re-derived differentiably in surface_interaction —
    # the same zero-primal reattachment the brute/BVH paths use), so
    # detach the ray operands: without this, differentiating a render
    # w.r.t. quantities that flow into ray origins (vertex positions,
    # camera pose) would route tangents into pallas_call, which has no
    # JVP rule (and would crash interpret-mode gradient tests).
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)

    n = o.shape[0]
    G = cl.n_groups
    nb = n // BLOCK

    out_spec = pl.BlockSpec((SUBROWS, 128), lambda i, s: (s[i] >> 19, 0))
    out_shape = jax.ShapeDtypeStruct(((nb + 1) * SUBROWS, 128), jnp.int32)
    if SPLIT_BF16:
        # prebuilt bf16 hi/lo + half-width |w| band table — the f32 w
        # block is neither copied nor converted per tile
        w_specs = [
            pl.BlockSpec((16, GROUP * 4 * CSIZE),
                         lambda i, s: (0, s[i] & 0xFFFF)),
            pl.BlockSpec((16, GROUP * 4 * CSIZE),
                         lambda i, s: (0, s[i] & 0xFFFF)),
            pl.BlockSpec((16, GROUP * 2 * CSIZE),
                         lambda i, s: (0, s[i] & 0xFFFF)),
        ]
        w_args = (cl.w_hi, cl.w_lo, cl.w_abs_uv)
    else:
        w_specs = [pl.BlockSpec((16, GROUP * 4 * CSIZE),
                                lambda i, s: (0, s[i] & 0xFFFF))]
        w_args = (cl.w,)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(packed.shape[0],),
        in_specs=[pl.BlockSpec((8, 128), lambda i, s: (0, s[i] >> 16))]
        + w_specs
        + [
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
    return pl.pallas_call(
        _make_kernel(G),
        grid_spec=grid_spec,
        out_shape=[out_shape] * 4,
    )(packed, od_x, *w_args, cl.gbox, cl.cbox)


def _closest_key_chunk(cl: Clusters, o, d, tmax):
    """One pallas dispatch over a BLOCK-multiple ray batch whose
    nsub * G fits TILE_BUDGET. Returns (key1, grp1, key2, grp2) in
    batch order — the two best candidate triangles per ray.

    Two-tier tile list: the grid is static, so dummy steps beyond the
    live tiles still cost ~0.15 us each; coherent batches light only a
    few % of the nsub*G slots (~10 ms of dummies per 2^17 at G=69).
    When the live count fits a quarter-size list, a lax.cond dispatches
    the compact variant instead (same kernel, smaller grid)."""
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

    # Tile-list tier ladder (r5): live tiles come first (nonzero
    # preserves order), so the dispatch only needs a list >= the live
    # count. The r4 two-tier (quarter/full) lax.cond still burnt up to
    # maxt/4 dummy grid steps (~5 ms per fused 262k-ray render step,
    # measured in the r5 trace); a x2 geometric ladder keeps dummy
    # steps within 2x of live. Every branch shares the kernel; only the
    # grid length differs.
    sizes = [s for s in (maxt // 32, maxt // 16, maxt // 8,
                         maxt // 4, maxt // 2)
             if s >= SUBROWS * 8]
    if sizes:
        nlive = jnp.sum(submask)
        branches = ([(lambda _, s=s: _dispatch_tiles(cl, o, d, packed[:s]))
                     for s in sizes]
                    + [lambda _: _dispatch_tiles(cl, o, d, packed)])
        idx = sum((nlive > s).astype(jnp.int32) for s in sizes)
        keys, grps, keys2, grps2 = jax.lax.switch(idx, branches, 0)
    else:
        keys, grps, keys2, grps2 = _dispatch_tiles(cl, o, d, packed)

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
        # group-signature coherence sort (see ray_sort_perm): sub-rows
        # test (nearly) exactly the groups their own rays enter
        perm = ray_sort_perm(cl, o, d, tmax)
        inv = jnp.zeros((n0,), jnp.int32).at[perm].set(
            jnp.arange(n0, dtype=jnp.int32), unique_indices=True)
        # ONE row gather for the whole ray record (r5): seven separate
        # scalar-stream gathers measured ~1 ms each per 131k at render
        # scale; a packed (N, 7) row gather is a single fused op
        X = jnp.concatenate([o, d, tmax[:, None]], -1)[perm]
        o = X[:, 0:3]
        d = X[:, 3:6]
        tmax = X[:, 6]
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
        # balance the chunks (r5): padding to a multiple of the MAXIMUM
        # chunk made a 262144-ray call run 242688 + a 92%-padding tail
        # chunk; equal BLOCK-aligned chunks waste nothing
        nchunks = -(-n // chunk)
        per = -(-n // nchunks)                 # balanced rays per chunk
        chunk = -(-per // BLOCK) * BLOCK       # BLOCK-aligned (>= per)
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
        # same single-row-gather trick for the inverse permutation
        K = jnp.stack([key, grp, key2, grp2], -1)[inv]
        key, grp, key2, grp2 = K[:, 0], K[:, 1], K[:, 2], K[:, 3]
    return key, grp, key2, grp2


# --------------------------------------------------------------------------
# t-ordered group sweep (v6)
#
# The dense enumeration above tests EVERY group a ray's sub-row enters;
# on chord-type workloads a ray enters ~10-20% of all group bboxes while
# its true hit lies inside the first one or two along the ray (the same
# asymmetry the reference's kd-tree exploits with front-to-back Havran
# traversal + early exit, skdtree.cpp:135). The sweep recovers that
# early exit in dense TPU form:
#
#   * rays are sorted once by (first entered group, direction/origin
#     cell) so the 128 lanes of a sub-row march through nearly the same
#     group sequence;
#   * each PASS dispatches exactly one tile per sub-row: the smallest
#     (t_enter, group) cursor key among the sub-row's lanes. The tile
#     list is a dense (nsub,) map — no nonzero, no SMEM budget, no
#     overflow case, grid = nsub;
#   * after each pass the merged top-2 candidates are re-tested in
#     exact f32; every verified hit tightens the ray's cull bound, so
#     groups whose entry t lies behind a VERIFIED hit are never
#     dispatched (phantom band winners never cull — only exact hits do,
#     which keeps the sweep unconditionally watertight);
#   * lanes advance a strictly-increasing per-ray cursor over the
#     quantised (t_enter | group) total order; after SWEEP_PASSES
#     passes, any ray with untested in-range groups left is finished by
#     one dense residual dispatch (lax.cond — rarely taken) bounded by
#     the verified-hit t.
#
# Exactness: a group containing a hit closer than the current verified
# best has bbox entry t <= that hit's t < bound, so it is never culled;
# the cursor (or the residual pass) therefore reaches it, and the final
# candidates are re-tested in exact f32 like the dense path's.
#
# STATUS (r4, measured on v5e, 70k bench mesh): correct (2^14-ray
# cross-check vs brute: 0-1 mismatches) but NOT yet faster than the
# dense path — inc 0.51M vs 0.52M, coh 0.88M vs 1.37M rays/s at 2^20.
# probe_sweep2 breakdown: sub-row consensus decays after pass 1 (only
# ~10%/pass of rays retire), the residual dense pass almost always
# triggers, and _next_group's (G,N,3) slab reduce is memory-bound.
# closest_hit/any_hit therefore default to sweep=False until the pass
# mechanics (per-pass re-sort, multi-tile sub-rows, cursor-aware cheap
# residual) make it win; the machinery is kept under test.

SWEEP_PASSES = 6
GKEY_BITS = 14                      # low cursor-key bits hold the group id
GKEY_MASK = (1 << GKEY_BITS) - 1
CUR_END = 2147483647                # int32 max: "no further group"


def _next_group(cl: Clusters, o, d, cur, bound):
    """Per-ray smallest untested in-range group, as a packed cursor key
    (t_enter bits & ~GKEY_MASK) | gid, or CUR_END. Fused reduce over G —
    the (G, N) map never materializes."""
    G = cl.n_groups
    gmin = cl.cmin.reshape(G, GROUP, 3).min(1)
    gmax = cl.cmax.reshape(G, GROUP, 3).max(1)
    inv = _safe_inv(d)
    t0 = (gmin[:, None] - o[None]) * inv[None]
    t1 = (gmax[:, None] - o[None]) * inv[None]
    tn = jnp.minimum(t0, t1).max(-1)
    tf = jnp.maximum(t0, t1).min(-1)
    enters = (tn <= tf) & (tf > I.SHADOW_EPS) & (tn < bound[None, :])
    tq = jax.lax.bitcast_convert_type(jnp.maximum(tn, 0.0), jnp.int32)
    gid = jax.lax.broadcasted_iota(jnp.int32, enters.shape, 0)
    key = (tq & jnp.int32(~jnp.int32(GKEY_MASK))) | gid
    key = jnp.where(enters & (key > cur[None, :]), key, CUR_END)
    return jnp.min(key, axis=0)


def _merge_top2(a1, ga1, a2, ga2, b1, gb1, b2, gb2):
    """Associative top-2 merge of packed-key candidate pairs (the XLA
    mirror of the kernel's accumulator merge)."""
    take_b = b1 < a1
    n1 = jnp.where(take_b, b1, a1)
    ng1 = jnp.where(take_b, gb1, ga1)
    x = jnp.where(take_b, a1, b1)
    gx = jnp.where(take_b, ga1, gb1)
    n2 = jnp.minimum(jnp.minimum(x, a2), b2)
    ng2 = jnp.where(n2 == x, gx, jnp.where(n2 == a2, ga2, gb2))
    return n1, ng1, n2, ng2


def _verified_t(scene, cl: Clusters, k1, g1, k2, g2, o, d, tmax):
    """Exact-f32 re-test of both candidates; smallest verified t per
    ray (MISS_F when neither verifies). Only exactly-verified hits may
    cull groups in the sweep."""
    valid1, _, prim1 = _decode_prim(cl, k1, g1)
    valid2, _, prim2 = _decode_prim(cl, k2, g2)
    te1, _, _, ok1 = _exact_test(scene, prim1, o, d)
    te2, _, _, ok2 = _exact_test(scene, prim2, o, d)
    ok1 &= valid1 & (te1 <= tmax)
    ok2 &= valid2 & (te2 <= tmax)
    t = jnp.where(ok1, te1, MISS_F)
    return jnp.minimum(t, jnp.where(ok2, te2, MISS_F))


def _subrow_mask_cursor(cl: Clusters, o, d, cur, bound):
    """(nsub, G) residual sub-row mask: only (group, ray) pairs BEYOND
    the ray's cursor and WITHIN its verified bound count (fused)."""
    G = cl.n_groups
    n = o.shape[0]
    gmin = cl.cmin.reshape(G, GROUP, 3).min(1)
    gmax = cl.cmax.reshape(G, GROUP, 3).max(1)
    inv = _safe_inv(d)
    t0 = (gmin[:, None] - o[None]) * inv[None]
    t1 = (gmax[:, None] - o[None]) * inv[None]
    tn = jnp.minimum(t0, t1).max(-1)
    tf = jnp.maximum(t0, t1).min(-1)
    tq = jax.lax.bitcast_convert_type(jnp.maximum(tn, 0.0), jnp.int32)
    gid = jax.lax.broadcasted_iota(jnp.int32, tn.shape, 0)
    key = (tq & jnp.int32(~jnp.int32(GKEY_MASK))) | gid
    live = ((tn <= tf) & (tf > I.SHADOW_EPS) & (tn < bound[None, :])
            & (key > cur[None, :]))
    return live.reshape(G, n // 128, 128).any(-1).T


def closest_key2_sweep(scene, cl: Clusters, o, d, tmax,
                       passes: int = SWEEP_PASSES, any_mode: bool = False):
    """Top-2 candidates via the t-ordered sweep (v6.2). Requires a
    BLOCK-multiple ray count (callers pad). In any_mode, a single
    verified hit ends a ray's sweep (shadow-ray semantics).

    v6.2 re-sorts every pass: rays are ordered by their CURRENT next
    group, so each pass's one-tile-per-sub-row dispatch serves (almost)
    every live lane, retiring a constant fraction of rays per pass —
    v6.1's fixed order lost sub-row consensus after pass 1 and retired
    only ~10%/pass. Retired rays pack to the tail, so their sub-rows
    dispatch as dummy tiles (~0.15 us each, calibrated). The residual
    for rays still unresolved after `passes` uses a CURSOR-AWARE dense
    enumeration on the re-sorted (compacted) layout, so its live tiles
    scale with stragglers rather than with all rays. State lives in the
    original ray order; only the per-pass tile views are gathered."""
    n = o.shape[0]
    nsub = n // 128
    G = cl.n_groups
    arange_n = jnp.arange(n, dtype=jnp.int32)

    cur = jnp.full((n,), -1, jnp.int32)
    bound = tmax
    k1 = jnp.full((n,), MISS_KEY, jnp.int32)
    g1 = jnp.zeros((n,), jnp.int32)
    k2 = jnp.full((n,), MISS_KEY, jnp.int32)
    g2 = jnp.zeros((n,), jnp.int32)
    tsub32 = (jnp.arange(nsub, dtype=jnp.int32) << 16)

    for _ in range(passes):
        cand = _next_group(cl, o, d, cur, bound)               # (N,)
        # Retired-ray sentinel must fit the 15 bits above the <<17 shift
        # (uint32 key); 0x7FFF stays maximal so retired rays pack to the
        # tail as documented.  Requires n_groups < 0x7FFF (~32k groups =
        # ~2M tris at the default fanout).
        gid = jnp.where(cand == CUR_END, jnp.int32(0x7FFF),
                        cand & jnp.int32(GKEY_MASK))
        # single-key sort: group id in the high bits, the top 17 t bits
        # as tiebreak (a second lexsort pass costs a full extra sort)
        skey = (gid.astype(jnp.uint32) << 17)             | ((cand.astype(jnp.uint32) >> 14) & jnp.uint32(0x1FFFF))
        order = jnp.argsort(skey)
        o_s = o[order]
        d_s = d[order]
        gid_s = gid[order]
        gs = jnp.where(gid_s.reshape(nsub, 128)[:, 0] >= G, G,
                       gid_s.reshape(nsub, 128)[:, 0]).astype(jnp.int32)
        packed = tsub32 | gs
        keys, grps, keys2, grps2 = _dispatch_tiles(cl, o_s, d_s, packed)
        inv_o = jnp.zeros((n,), jnp.int32).at[order].set(
            arange_n, unique_indices=True)
        k1, g1, k2, g2 = _merge_top2(
            k1, g1, k2, g2,
            keys[:nsub].reshape(-1)[inv_o], grps[:nsub].reshape(-1)[inv_o],
            keys2[:nsub].reshape(-1)[inv_o],
            grps2[:nsub].reshape(-1)[inv_o])
        vt = _verified_t(scene, cl, k1, g1, k2, g2, o, d, tmax)
        if any_mode:
            bound = jnp.where(vt < MISS_F, 0.0, tmax)
        else:
            bound = jnp.minimum(tmax, vt * (1.0 + 2.0 ** -11) + 1e-6)
        # a lane advanced iff its next group was its sub-row's tile group
        gs_of_ray = jnp.repeat(gs, 128)[inv_o]
        adv = (cand != CUR_END) & (gid == gs_of_ray)
        cur = jnp.where(adv, cand, cur)

    # residual: compact the stragglers to the front, then one
    # cursor-aware dense dispatch whose live tiles scale with them
    cand = _next_group(cl, o, d, cur, bound)
    gid = jnp.where(cand == CUR_END, jnp.int32(0x7FFF),
                    cand & jnp.int32(GKEY_MASK))
    skey = (gid.astype(jnp.uint32) << 17)         | ((cand.astype(jnp.uint32) >> 14) & jnp.uint32(0x1FFFF))
    order = jnp.argsort(skey)
    inv_o = jnp.zeros((n,), jnp.int32).at[order].set(
        arange_n, unique_indices=True)

    def _residual(args):
        k1, g1, k2, g2 = args
        o_s = o[order]
        d_s = d[order]
        cur_s = cur[order]
        bound_s = bound[order]
        parts = []
        chunk = max(TILE_BUDGET // G // SUBROWS * BLOCK, BLOCK)
        for i in range(0, n, chunk):
            sl = slice(i, min(i + chunk, n))
            sm = jax.lax.optimization_barrier(_subrow_mask_cursor(
                cl, o_s[sl], d_s[sl], cur_s[sl], bound_s[sl]))
            nc = sm.shape[0] * 128
            maxt = sm.shape[0] * G
            (tidx,) = jnp.nonzero(sm.reshape(-1), size=maxt,
                                  fill_value=maxt)
            livet = tidx < maxt
            tsub = jnp.where(livet, tidx // G, sm.shape[0]) \
                .astype(jnp.int32)
            tg = jnp.where(livet, tidx % G, G).astype(jnp.int32)
            keys, grps, keys2, grps2 = _dispatch_tiles(
                cl, o_s[sl], d_s[sl], (tsub << 16) | tg)
            nsub_c = nc // 128
            dead = jnp.repeat(~sm.any(-1), 128)
            parts.append((
                jnp.where(dead, MISS_KEY, keys[:nsub_c].reshape(-1)),
                grps[:nsub_c].reshape(-1),
                jnp.where(dead, MISS_KEY, keys2[:nsub_c].reshape(-1)),
                grps2[:nsub_c].reshape(-1)))
        r = [jnp.concatenate([p[j] for p in parts]) if len(parts) > 1
             else parts[0][j] for j in range(4)]
        return _merge_top2(k1, g1, k2, g2,
                           r[0][inv_o], r[1][inv_o],
                           r[2][inv_o], r[3][inv_o])

    k1, g1, k2, g2 = jax.lax.cond(
        jnp.any(cand != CUR_END), _residual, lambda a: a, (k1, g1, k2, g2))

    return k1, g1, k2, g2


# --------------------------------------------------------------------------
# pair-explicit dispatch (v7)
#
# The dense enumeration's unit of work is a (128-ray sub-row x group)
# tile: all 128 lanes test the tile's group whether or not they enter
# it, so lane efficiency equals the sub-rows' group-set coherence
# (measured 2-8x waste even after signature sorting). v7 materializes
# the exact (ray, group) PAIR list instead: nonzero over the fused
# (G, N) group-slab mask (group-major, so consecutive pairs share a
# group), pads each group's run to 128-pair tiles, gathers the pair
# rays into a dense (8, P) od matrix — and then reuses THE SAME Pallas
# kernel byte for byte (a pair tile is just a "sub-row" whose 128 rays
# all genuinely enter the tile's group; the packed (tile<<16|group)
# prefetch word, BlockSpecs, and accumulator layout are unchanged).
# Per-pair top-2 candidates come back in tile order; the decode
# exact-tests them (as the dense path does) and reduces per ray with
# f32 scatter-mins. Expected from the r4 on-chip calibration
# (tools/probe_overheads.py: ~6.5us per live tile, pairs/ray measured
# 2.1-2.4 on the 70k bench mesh): ~3-4x over the dense path on both
# coherent and incoherent rays.
#
# The pair list is capped at PAIRS_PER_RAY * N per dispatch; a batch
# whose true pair count exceeds the cap falls back to the dense path
# via lax.cond (exactness is never data-dependent).

PAIRS_PER_RAY = 12            # measured: 9.6/ray incoherent chords @70k
PAIR_CHUNK = 1 << 17          # rays per pair dispatch (tile-id headroom)


def _pair_mask_counts(cl: Clusters, o, d, tmax):
    """(G, N) pair mask at CLUSTER granularity (a ray pairs with group g
    iff it enters one of g's cluster boxes — the group bbox alone is
    ~5x looser on the bench mesh: 11.7 vs 2.4 pairs/ray) + counts."""
    G = cl.n_groups
    n = o.shape[0]
    inv = _safe_inv(d)
    t0 = (cl.cmin[:, None] - o[None]) * inv[None]      # (C,N,3) fused
    t1 = (cl.cmax[:, None] - o[None]) * inv[None]
    tn = jnp.minimum(t0, t1).max(-1)
    tf = jnp.maximum(t0, t1).min(-1)
    hit = (tn <= tf) & (tf > I.SHADOW_EPS) & (tn < tmax[None, :])
    mask = hit.reshape(G, GROUP, n).any(1)
    return mask, jnp.sum(mask, axis=1)


def _pair_chunk(scene, cl: Clusters, o, d, tmax):
    """One pair-explicit dispatch over <= PAIR_CHUNK rays. Returns the
    per-ray Intersection fields (valid, t, prim, b1, b2)."""
    n = o.shape[0]
    G = cl.n_groups
    p_cap = PAIRS_PER_RAY * n
    p_pad = -(-(p_cap + 128 * G) // BLOCK) * BLOCK
    ntiles = p_pad // 128

    mask, counts = _pair_mask_counts(cl, o, d, tmax)          # (G,N),(G,)
    total = jnp.sum(counts)

    def pair_path(_):
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
                         pd_off[jnp.minimum(g_of, G - 1)].astype(jnp.int32)
                         + rank, p_pad)
        pair_ray = jnp.full((p_pad,), n, jnp.int32) \
            .at[slot].set(ray_of, mode="drop")
        # tile -> group (tiles beyond the last padded run are dummies)
        tile_start = jnp.arange(ntiles, dtype=counts.dtype) * 128
        tile_g = jnp.searchsorted(pd_end, tile_start, side="right") \
            .astype(jnp.int32)
        tile_g = jnp.where(tile_start < pd_end[-1], tile_g, G)
        packed = (jnp.arange(ntiles, dtype=jnp.int32) << 16) | tile_g

        # gather pair rays (dummy lanes: origin far away, tmax 0)
        pr = jnp.minimum(pair_ray, n - 1)
        dead = pair_ray >= n
        o_p = jnp.where(dead[:, None], 1.0e7, o[pr])
        d_p = jnp.where(dead[:, None],
                        jnp.asarray([1.0, 0.0, 0.0], d.dtype), d[pr])
        tm_p = jnp.where(dead, 0.0, tmax[pr])

        keys, grps, keys2, grps2 = _dispatch_tiles(cl, o_p, d_p, packed)
        nsub_p = p_pad // 128
        k1 = keys[:nsub_p].reshape(-1)
        g1 = grps[:nsub_p].reshape(-1)
        k2 = keys2[:nsub_p].reshape(-1)
        g2 = grps2[:nsub_p].reshape(-1)
        # range bound + exact per-pair resolution (shared with dense)
        tmax_key = (jax.lax.bitcast_convert_type(tm_p, jnp.int32)
                    & jnp.int32(~jnp.int32(LANE_BITS))) \
            | jnp.int32(LANE_BITS)
        k1 = jnp.where(k1 <= tmax_key, k1, MISS_KEY)
        k2 = jnp.where(k2 <= tmax_key, k2, MISS_KEY)
        its_p = _finalize_closest(scene, cl, k1, jnp.maximum(g1, 0),
                                  k2, jnp.maximum(g2, 0), o_p, d_p, tm_p)
        pv = its_p.valid & ~dead
        tp = jnp.where(pv, its_p.t, MISS_F)
        # per-ray reduction: f32 scatter-min, then recover the winner
        t_best = jnp.full((n,), MISS_F).at[pair_ray] \
            .min(tp, mode="drop")
        is_best = pv & (tp == t_best[pr])
        prim = jnp.zeros((n,), jnp.int32).at[pair_ray] \
            .max(jnp.where(is_best, its_p.prim, -1), mode="drop")
        b1 = jnp.zeros((n,)).at[pair_ray] \
            .max(jnp.where(is_best, its_p.b1, -1.0), mode="drop")
        b2 = jnp.zeros((n,)).at[pair_ray] \
            .max(jnp.where(is_best, its_p.b2, -1.0), mode="drop")
        valid = t_best < MISS_F
        return (valid, jnp.where(valid, t_best, I.MISS),
                jnp.maximum(prim, 0), jnp.maximum(b1, 0.0),
                jnp.maximum(b2, 0.0))

    def dense_path(_):
        its = _finalize_closest(
            scene, cl, *closest_key2(cl, o, d, tmax), o, d, tmax)
        return (its.valid, its.t, its.prim, its.b1, its.b2)

    return jax.lax.cond(total <= p_cap, pair_path, dense_path, 0)


def closest_hit_pairs(scene, cl: Clusters, o, d, tmax=None) -> I.Intersection:
    """Pair-explicit closest hit (v7) — kept under test; ops/trace.py
    dispatches the dense `closest_hit` path by default (v7's XLA
    nonzero/scatter bookkeeping measured ~300 ms per 2^17 rays)."""
    n0 = o.shape[0]
    if tmax is None:
        tmax = jnp.full((n0,), jnp.float32(3e37))
    parts = []
    for i in range(0, n0, PAIR_CHUNK):
        sl = slice(i, min(i + PAIR_CHUNK, n0))
        parts.append(_pair_chunk(scene, cl, o[sl], d[sl], tmax[sl]))
    if len(parts) == 1:
        valid, t, prim, b1, b2 = parts[0]
    else:
        valid, t, prim, b1, b2 = (
            jnp.concatenate([p[k] for p in parts]) for k in range(5))
    return I.Intersection(valid=valid, t=t, prim=prim, b1=b1, b2=b2)


def any_hit_pairs(scene, cl: Clusters, o, d, tmax) -> jax.Array:
    its = closest_hit_pairs(scene, cl, o, d,
                            tmax * (1.0 - I.SHADOW_EPS))
    return its.valid


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


def closest_hit(scene, cl: Clusters, o, d, tmax=None,
                sweep: bool = False) -> I.Intersection:
    n0 = o.shape[0]
    if tmax is None:
        tmax = jnp.full((n0,), jnp.float32(3e37))
    if sweep and n0 >= 4 * BLOCK:
        n = -(-n0 // BLOCK) * BLOCK
        o_p, d_p, tmax_p = _pad_rays(o, d, tmax, n)
        k1, g1, k2, g2 = closest_key2_sweep(scene, cl, o_p, d_p, tmax_p)
        k1, g1, k2, g2 = k1[:n0], g1[:n0], k2[:n0], g2[:n0]
    else:
        k1, g1, k2, g2 = closest_key2(cl, o, d, tmax)
    return _finalize_closest(scene, cl, k1, g1, k2, g2, o, d, tmax)


def _pad_rays(o, d, tmax, n):
    n0 = o.shape[0]
    if n == n0:
        return o, d, tmax
    return (jnp.concatenate([o, jnp.ones((n - n0, 3), o.dtype)]),
            jnp.concatenate(
                [d, jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], d.dtype),
                                     (n - n0, 3))]),
            jnp.concatenate([tmax, jnp.zeros((n - n0,), tmax.dtype)]))


def _finalize_closest(scene, cl: Clusters, k1, g1, k2, g2,
                      o, d, tmax) -> I.Intersection:
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


def closest_and_any(scene, cl: Clusters, o_c, d_c, tmax_c,
                    o_s, d_s, tmax_s):
    """Fused closest-hit + shadow any-hit in ONE kernel dispatch.

    The regenerative wavefront issues a closest batch (next bounce) and
    an any-hit batch (previous vertex's NEE shadow rays) every step;
    dispatching them separately pays the per-dispatch machinery (sort,
    sub-row mask, tile enumeration, launch chain — measured ~8-11 ms at
    16k rays, tools/probe_parts_small.py) twice. Concatenating the two
    batches halves that AND lets the signature sort pack both classes
    into shared sub-rows. Exactness is inherited: both halves use the
    standard top-2 + exact-f32 re-test path. Retired rays (tmax 0)
    sort to dummy tiles and cost ~nothing."""
    n_c = o_c.shape[0]
    limit = tmax_s * (1.0 - I.SHADOW_EPS)
    o = jnp.concatenate([o_c, o_s])
    d = jnp.concatenate([d_c, d_s])
    tm = jnp.concatenate([tmax_c, limit])
    k1, g1, k2, g2 = closest_key2(cl, o, d, tm)
    its = _finalize_closest(scene, cl, k1[:n_c], g1[:n_c],
                            k2[:n_c], g2[:n_c], o_c, d_c, tmax_c)
    v1, _, p1 = _decode_prim(cl, k1[n_c:], g1[n_c:])
    v2, _, p2 = _decode_prim(cl, k2[n_c:], g2[n_c:])
    te1, _, _, ok1 = _exact_test(scene, p1, o_s, d_s)
    te2, _, _, ok2 = _exact_test(scene, p2, o_s, d_s)
    blocked = (v1 & ok1 & (te1 <= limit)) | (v2 & ok2 & (te2 <= limit))
    return its, blocked


def any_hit(scene, cl: Clusters, o, d, tmax,
            sweep: bool = False) -> jax.Array:
    n0 = o.shape[0]
    limit = tmax * (1.0 - I.SHADOW_EPS)
    if sweep and n0 >= 4 * BLOCK:
        n = -(-n0 // BLOCK) * BLOCK
        o_p, d_p, lim_p = _pad_rays(o, d, limit, n)
        k1, g1, k2, g2 = closest_key2_sweep(scene, cl, o_p, d_p, lim_p,
                                            any_mode=True)
        k1, g1, k2, g2 = k1[:n0], g1[:n0], k2[:n0], g2[:n0]
    else:
        k1, g1, k2, g2 = closest_key2(cl, o, d, limit)
    valid1, _, prim1 = _decode_prim(cl, k1, g1)
    valid2, _, prim2 = _decode_prim(cl, k2, g2)
    # exact re-test so a phantom near-miss cannot cast a shadow
    te1, _, _, ok1 = _exact_test(scene, prim1, o, d)
    te2, _, _, ok2 = _exact_test(scene, prim2, o, d)
    return (valid1 & ok1 & (te1 <= limit)) | (valid2 & ok2 & (te2 <= limit))

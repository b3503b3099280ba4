"""Path-space Metropolis light transport (Veach MLT).

TPU-native analog of src/integrators/mlt/mlt.cpp (337 LoC) over the
libbidir mutator tier (mut_bidir.h:38 bidirectional mutation,
mut_lens.h:36 lens perturbation). Where the reference runs a few long
chains over pooled PathVertex objects, this runs tens of thousands of
SHORT chains in lockstep; the path state is an explicit dense SoA array
(positions + primitive ids + length), every mutation is one batched
proposal, and film updates are scatter-adds — the same chain-parallel
layout as pssmlt.py, but in PATH space, which is what distinguishes MLT
from PSSMLT (mutations act on vertices, not on primary-sample numbers).

Mutation kernels (cycled per scan step — a systematic-scan composition of
detailed-balance kernels preserves the target):

  A `tail regen / connect` — the bidirectional mutation restricted to
    eye-side deletion (mut_bidir.h:38 with l..m on the eye side): delete
    the suffix after a uniformly chosen cut vertex, re-trace intermediate
    vertices by BSDF sampling, finish by connecting to a fresh area-light
    point. Cut at 0 = independence sampler (ergodicity / large step).
  B `tail regen / hit` — same deletion, but the regenerated suffix ends
    by *hitting* an emitter (pure BSDF transport); this is the move that
    carries near-specular caustic chains A cannot make.
  C `lens perturbation` — mut_lens.h:36: exponentially distributed raster
    offset, re-trace the primary ray, reconnect to the remainder.
  D `caustic perturbation` — mut_caustic.h:36 / mut_caustic.cpp:103-110:
    perturb the direction out of v2 TOWARD the camera-visible vertex with
    an exponentially distributed polar angle (Veach p.354 heuristic
    theta range from the per-pixel solid angle), re-trace one edge to a
    new v1, keep the deterministic eye connection. This moves the
    camera-visible vertex by wiggling the INCOMING light direction —
    the complementary move to C, and the one that keeps chains mixing on
    near-specular caustic paths where C's acceptance collapses.
  E `multi-chain perturbation` — mut_mchain.h:36: a lens perturbation
    chained with a same-size angular perturbation of the following edge:
    raster-offset v1, re-trace, then rotate the old v1->v2 direction by
    an exponential polar angle, re-trace v2, reconnect v2->v3. Moves two
    vertices at once (the E S D S D... regime of Veach fig. 11.8).

Acceptance uses the exact per-kernel transition densities (products of
area-measure BSDF/camera/light pdfs); f(path) is re-evaluated from the
vertex arrays each proposal, visibility included (verification.cpp's
recompute-vs-cache idea collapses to always-recompute, which a batched
evaluator gets for free).

Scope notes (documented limitations vs the reference MLT):
* paths terminate on AREA emitters (env/delta-lit scenes: use pssmlt);
* perfectly-specular (delta) interior vertices are excluded — their
  Dirac factors need the manifold walk (manifold.cpp); near-specular
  rough lobes work and cover the caustic regime. Because delta-vertex
  paths have zero target density here, D/E never need the deterministic
  specular-chain retrace of the reference (all interior vertices are
  rough), so their proposal kernels are symmetric angular offsets and
  only geometry Jacobians enter the acceptance ratio;
* the manifold perturbation (mut_manifold.h) is not implemented.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import math as m
from ..models import bsdf as bsdflib
from ..models import emitter as emitterlib
from ..models import sensor as sensorlib
from ..ops import trace
from ..ops.intersect import Intersection
from .common import RenderConfig

LUM = jnp.asarray([0.2126, 0.7152, 0.0722])
INV_PI = 1.0 / jnp.pi


# ---------------------------------------------------------------------------
# Path-state helpers. State: pos (N,K+1,3), prim (N,K+1) i32, k (N,) i32.
# Vertex 0 is the camera (pos fixed = eye, prim unused); vertex k lies on an
# area emitter. k = number of edges, 1 <= k <= K.
# ---------------------------------------------------------------------------


def _take_v(arr, idx):
    """Gather per-chain vertex idx from (N, K+1, ...)."""
    if arr.ndim == 3:
        return jnp.take_along_axis(arr, idx[:, None, None], axis=1)[:, 0]
    return jnp.take_along_axis(arr, idx[:, None], axis=1)[:, 0]


def _set_v(arr, idx, val, mask):
    """Masked scatter of per-chain vertex idx into (N, K+1, ...)."""
    K1 = arr.shape[1]
    onehot = jnp.arange(K1)[None, :] == idx[:, None]
    sel = onehot & mask[:, None]
    if arr.ndim == 3:
        return jnp.where(sel[:, :, None], val[:, None, :], arr)
    return jnp.where(sel, val[:, None], arr)


def _si_at(scene, v_prev, v, prim):
    """Surface data at vertex v approached from v_prev."""
    dvec = v - v_prev
    dist = jnp.maximum(m.length(dvec), 1e-9)
    d = dvec / dist[:, None]
    its = Intersection(valid=prim >= 0, t=dist,
                       prim=jnp.maximum(prim, 0),
                       b1=jnp.zeros_like(dist), b2=jnp.zeros_like(dist))
    si = trace.surface_interaction(scene, v_prev, d, its)
    return si, d, dist


def _light_area_pdf(scene, prim):
    em = scene.emitters
    _, e1a, e2a = scene.tri_vertices()
    area_all = 0.5 * m.length(jnp.cross(e1a, e2a))
    pg_area, _, _ = emitterlib._group_probs(scene)
    pr = jnp.maximum(prim, 0)
    return m.safe_div(em.select_pdf_full[pr] * pg_area, area_all[pr])


def _cam_we(cam, d):
    """(w*h)/(A_film cos^3): the per-PIXEL-uniform importance in solid
    angle — makes eval_path's f integrate to per-pixel radiance."""
    fwd = cam.to_world[:3, 2]
    cos_c = jnp.maximum(m.dot(d, fwd[None, :]), 1e-6)
    tan_half = jnp.tan(0.5 * jnp.deg2rad(cam.fov_x))
    aspect = jnp.float32(cam.height) / jnp.float32(cam.width)
    film_area = 4.0 * tan_half * tan_half * aspect
    npix = jnp.float32(cam.width * cam.height)
    return npix / (film_area * cos_c ** 3), cos_c


def eval_path(scene, cam, pos, prim, k, K):
    """f(path) with visibility, + (color, lum, pixel index, ok)."""
    n = pos.shape[0]
    eye = cam.to_world[:3, 3]
    families = scene.bsdf_families

    v1 = pos[:, 1]
    d1 = m.normalize(v1 - eye[None, :])
    we, _ = _cam_we(cam, d1)
    px, py, rvalid, _ = sensorlib.world_to_raster(cam, v1)
    xi = jnp.clip(px.astype(jnp.int32), 0, cam.width - 1)
    yi = jnp.clip(py.astype(jnp.int32), 0, cam.height - 1)
    pixel = yi * cam.width + xi

    f = jnp.ones((n, 3)) * we[:, None]
    ok = rvalid & (k >= 1)
    prev = jnp.broadcast_to(eye, (n, 3))
    for i in range(1, K + 1):
        on_path = i <= k
        si, d_in, dist = _si_at(scene, prev, pos[:, i], prim[:, i])
        cos_in = jnp.abs(m.dot(d_in, si["ng"]))
        f = jnp.where(on_path[:, None],
                      f * (cos_in / jnp.maximum(dist * dist, 1e-12))[:, None],
                      f)
        blocked = trace.shadow_blocked(scene, prev, d_in, dist, False)
        ok = ok & (~blocked | ~on_path)

        is_end = i == k
        # interior vertex: BSDF toward the next vertex
        if i < K:
            nxt = pos[:, i + 1] if i + 1 <= K else pos[:, i]
            sp = bsdflib.gather_shade_point(scene, si["mat"], si["uv"])
            wi_l = m.to_local(si["ns"], -d_in)
            wo_w = m.normalize(nxt - pos[:, i])
            wo_l = m.to_local(si["ns"], wo_w)
            fs, _ = bsdflib.eval_pdf(sp, wi_l, wo_l, families)
            f = jnp.where((on_path & ~is_end)[:, None], f * fs, f)
        # terminal vertex: area-emitter radiance toward v_{k-1}
        em_id = si["emitter"]
        cos_e = m.dot(-d_in, si["ng"])
        le = scene.emitters.radiance[jnp.maximum(em_id, 0)]
        hit_ok = (em_id >= 0) & (cos_e > 0.0)
        f = jnp.where((on_path & is_end)[:, None],
                      jnp.where(hit_ok[:, None], f * le, 0.0), f)
        prev = jnp.where(on_path[:, None], pos[:, i], prev)

    f = jnp.where(ok[:, None], f, 0.0)
    f = jnp.nan_to_num(f, nan=0.0, posinf=0.0, neginf=0.0)
    return f, f @ LUM, pixel


def _bsdf_area_pdf(scene, v_prev, v, prim, v_next, prim_next):
    """Area-measure pdf of generating v_next by BSDF-sampling at v."""
    si, d_in, _ = _si_at(scene, v_prev, v, prim)
    sp = bsdflib.gather_shade_point(scene, si["mat"], si["uv"])
    wi_l = m.to_local(si["ns"], -d_in)
    dvec = v_next - v
    d2 = jnp.maximum(m.dot(dvec, dvec), 1e-12)
    wdir = dvec * jax.lax.rsqrt(d2)[:, None]
    wo_l = m.to_local(si["ns"], wdir)
    _, pdf_sa = bsdflib.eval_pdf(sp, wi_l, wo_l, scene.bsdf_families)
    si_n, d_n, _ = _si_at(scene, v, v_next, prim_next)
    cos_n = jnp.abs(m.dot(d_n, si_n["ng"]))
    return pdf_sa * cos_n / d2


def _geom_jac(scene, v_from, v_to, prim_to):
    """Solid-angle -> area Jacobian |cos| / d^2 at v_to seen from v_from
    (the only asymmetric factor of the D/E angular proposal kernels)."""
    si, d_in, dist = _si_at(scene, v_from, v_to, prim_to)
    return jnp.abs(m.dot(d_in, si["ng"])) / jnp.maximum(dist * dist, 1e-12)


def _cam_area_pdf(scene, cam, v1, prim1):
    """Area pdf of v1 under uniform-raster camera sampling (per pixel)."""
    eye = cam.to_world[:3, 3]
    dvec = v1 - eye[None, :]
    d2 = jnp.maximum(m.dot(dvec, dvec), 1e-12)
    d = dvec * jax.lax.rsqrt(d2)[:, None]
    we, cos_c = _cam_we(cam, d)
    # pdf_sa for uniform-over-one-pixel = we/(w*h)*... : uniform raster
    # over the FULL film has pdf_sa = 1/(A_film cos^3) = we/npix
    npix = jnp.float32(cam.width * cam.height)
    pdf_sa = we / npix
    si, d_in, _ = _si_at(scene, jnp.broadcast_to(eye, v1.shape), v1, prim1)
    cos_1 = jnp.abs(m.dot(d_in, si["ng"]))
    return pdf_sa * cos_1 / d2


def regen_pdf(scene, cam, pos, prim, k, c, K, mode_hit):
    """Transition density of regenerating THIS path's suffix after cut c
    (used for both forward and reverse acceptance factors).

    connect mode: Pi_{i=c..k-2} p_bsdf_area(v_{i+1}) * p_light_area(v_k)
    hit mode:     Pi_{i=c..k-1} p_bsdf_area(v_{i+1})
    (at c=0 the first factor is the camera area pdf of v1).
    """
    n = pos.shape[0]
    eye = jnp.broadcast_to(cam.to_world[:3, 3], (n, 3))
    p = jnp.ones((n,))
    # camera factor: v1 is camera-sampled iff c=0 AND v1 is a traced vertex
    # (connect mode with k=1 sets v1 from the LIGHT sampler instead)
    p_cam = _cam_area_pdf(scene, cam, pos[:, 1], prim[:, 1])
    use_cam = (c == 0) & (mode_hit | (k >= 2))
    p = jnp.where(use_cam, p * p_cam, p)
    for i in range(1, K):
        # bsdf factor generating v_{i+1} by scattering at vertex i; traced
        # targets are v_{c+1}..v_{k-1} (connect) or ..v_k (hit)
        lim = jnp.where(mode_hit, k - 1, k - 2)
        gen = (i >= jnp.maximum(c, 1)) & (i <= lim)
        v_prev = pos[:, i - 1] if i >= 1 else eye
        pb = _bsdf_area_pdf(scene, v_prev, pos[:, i], prim[:, i],
                            pos[:, min(i + 1, K)], prim[:, min(i + 1, K)])
        p = jnp.where(gen, p * pb, p)
        # hit mode stops at the FIRST emitter: a path with an emissive
        # intermediate vertex is unreachable (its reverse density is 0)
        inter_emissive = (scene.tri_emitter[jnp.maximum(prim[:, i], 0)]
                          >= 0) & (i >= c + 1) & (i <= k - 1)
        p = jnp.where(mode_hit & inter_emissive, 0.0, p)
    end_prim = _take_v(prim, jnp.clip(k, 0, K))
    p_l = _light_area_pdf(scene, end_prim)
    p = jnp.where(mode_hit, p, p * p_l)
    return jnp.maximum(p, 0.0)


def _sample_light_point(scene, u3):
    """Fresh area-light vertex (pos, prim) ~ the emitter area CDF."""
    from ..core import warp

    em = scene.emitters
    idx = jnp.clip(jnp.searchsorted(em.tri_cdf, u3[:, 0], side="left"),
                   0, em.tri_cdf.shape[0] - 1).astype(jnp.int32)
    tri = em.tri_index[idx]
    p0, e1, e2 = scene.tri_vertices()
    b = warp.square_to_uniform_triangle(u3[:, 1:3])
    pos = p0[tri] + e1[tri] * b[:, 0:1] + e2[tri] * b[:, 1:2]
    return pos, tri


def _regen(scene, cam, key, pos, prim, k, c, k_new, K, mode_hit):
    """Regenerate the suffix after cut c in-place -> proposal state.

    connect mode: trace (k_new-c-1) vertices, then a fresh light vertex.
    hit mode: trace until an emitter is hit (k determined by the trace).
    Returns (pos', prim', k', gen_ok).
    """
    n = pos.shape[0]
    eye = jnp.broadcast_to(cam.to_world[:3, 3], (n, 3))
    families = scene.bsdf_families
    keys = jax.random.split(key, K + 2)

    # current vertex of the walk = the cut vertex
    v_cur = jnp.where((c == 0)[:, None], eye, _take_v(pos, c))
    cm1 = jnp.maximum(c - 1, 0)
    v_prev = jnp.where((c <= 1)[:, None], eye, _take_v(pos, cm1))
    prim_cur = _take_v(prim, c)

    pos_n, prim_n = pos, prim
    alive = jnp.ones((n,), bool)
    done_hit = jnp.zeros((n,), bool)
    k_hit = jnp.full((n,), K + 1, jnp.int32)

    for j in range(K):
        tgt = c + 1 + j                     # vertex index being generated
        u = jax.random.uniform(keys[j], (n, 4))
        # direction: camera sampling when generating v1 from the eye,
        # BSDF sampling otherwise
        px = u[:, 0] * cam.width
        py = u[:, 1] * cam.height
        o_c, d_c, _ = sensorlib.sample_rays(cam, px, py, u[:, 2:4])
        si, d_in, _ = _si_at(scene, v_prev, v_cur, prim_cur)
        sp = bsdflib.gather_shade_point(scene, si["mat"], si["uv"])
        wi_l = m.to_local(si["ns"], -d_in)
        wo_l, _, pdf_s, _ = bsdflib.sample(sp, wi_l, u[:, 0],
                                           u[:, 1:3], families)
        d_b = m.to_world(si["ns"], wo_l)
        from_eye = (tgt == 1)
        d_new = jnp.where(from_eye[:, None], d_c, d_b)
        o_new = jnp.where(from_eye[:, None], o_c, v_cur)
        pdf_ok = jnp.where(from_eye, True, pdf_s > 0)

        # stop tracing once this lane generated its last traced vertex
        n_trace = jnp.where(mode_hit, K - c, k_new - c - 1)
        gen = alive & (j < n_trace) & ~done_hit
        its = trace.closest_hit(scene, o_new, d_new)
        v_next = o_new + its.t[:, None] * d_new
        lane_ok = gen & its.valid & pdf_ok
        pos_n = _set_v(pos_n, tgt, v_next, lane_ok)
        prim_n = _set_v(prim_n, tgt, its.prim, lane_ok)
        alive = jnp.where(gen, lane_ok, alive)

        # hit-mode termination: emitter reached
        em_hit = scene.tri_emitter[jnp.maximum(its.prim, 0)] >= 0
        newly = lane_ok & mode_hit & em_hit
        k_hit = jnp.where(newly & ~done_hit, tgt, k_hit)
        done_hit = done_hit | newly

        v_prev = jnp.where(lane_ok[:, None], v_cur, v_prev)
        v_cur = jnp.where(lane_ok[:, None], v_next, v_cur)
        prim_cur = jnp.where(lane_ok, its.prim, prim_cur)

    # connect mode: fresh light vertex at index k_new
    u_l = jax.random.uniform(keys[K], (n, 3))
    lpos, lprim = _sample_light_point(scene, u_l)
    pos_n = _set_v(pos_n, k_new, lpos, ~mode_hit & alive)
    prim_n = _set_v(prim_n, k_new, lprim, ~mode_hit & alive)

    k_out = jnp.where(mode_hit, k_hit, k_new).astype(jnp.int32)
    ok = alive & jnp.where(mode_hit, done_hit, True) & (k_out <= K)
    return pos_n, prim_n, k_out, ok


# ---------------------------------------------------------------------------
# Render driver
# ---------------------------------------------------------------------------


def render(scene, cam, cfg: RenderConfig, n_chains: int = 1 << 14,
           n_mutations: int = 384, n_bootstrap: int = 1 << 16,
           return_stats: bool = False):
    """MLT render -> (H, W, 3) [, stats dict with acceptance rates]."""
    w, h = cam.width, cam.height
    K = cfg.max_depth
    key = jax.random.PRNGKey(cfg.seed)
    kb, kr, km = jax.random.split(key, 3)

    # ---- bootstrap: independence proposals (mode A, c=0) ----------------
    zero = jnp.zeros((n_bootstrap,), jnp.int32)
    kb1, kb2, kb3 = jax.random.split(kb, 3)
    k_new0 = jax.random.randint(kb1, (n_bootstrap,), 1, K + 1)
    # vertex slot 0 is the camera position (regen_pdf reads pos[:, 0] as
    # the predecessor of v1)
    pos0 = jnp.zeros((n_bootstrap, K + 1, 3)
                     ).at[:, 0].set(cam.to_world[:3, 3])
    prim0 = jnp.full((n_bootstrap, K + 1), -1, jnp.int32)
    posb, primb, kb_, okb = _regen(
        scene, cam, kb2, pos0, prim0, jnp.ones((n_bootstrap,), jnp.int32),
        zero, k_new0, K, jnp.zeros((n_bootstrap,), bool))
    fb, lb, _ = eval_path(scene, cam, posb, primb, kb_, K)
    lb = jnp.where(okb, lb, 0.0)
    t0 = regen_pdf(scene, cam, posb, primb, kb_, zero, K,
                   jnp.zeros((n_bootstrap,), bool))
    t0 = t0 / jnp.float32(K)            # the uniform k_new choice
    wgt = jnp.where((t0 > 0) & (lb > 0), lb / jnp.maximum(t0, 1e-30), 0.0)
    b = jnp.mean(wgt)

    cdf = jnp.cumsum(wgt)
    total = jnp.maximum(cdf[-1], 1e-30)
    picks = jax.random.uniform(kr, (n_chains,)) * total
    sidx = jnp.clip(jnp.searchsorted(cdf, picks), 0, n_bootstrap - 1)
    pos_c, prim_c, k_c = posb[sidx], primb[sidx], kb_[sidx]
    f_c, l_c, px_c = eval_path(scene, cam, pos_c, prim_c, k_c, K)

    # ---- chains ---------------------------------------------------------
    def step(carry, inp):
        pos_x, prim_x, k_x, f_x, l_x, px_x, img, acc = carry
        kk, mode_i = inp
        k1, k2, k3, k4 = jax.random.split(kk, 4)
        n = n_chains
        is_B = mode_i == 1
        is_C = mode_i == 2
        is_D = mode_i == 3
        is_E = mode_i == 4
        mode_hit = jnp.broadcast_to(is_B, (n,))

        # ---- propose ----
        u = jax.random.uniform(k1, (n, 4))
        c = (u[:, 0] * k_x.astype(jnp.float32)).astype(jnp.int32)
        c = jnp.clip(c, 0, jnp.maximum(k_x - 1, 0))
        # A: k' uniform in [c+1, K]; B: determined by the trace
        span = (K - c).astype(jnp.float32)
        k_new = c + 1 + (u[:, 1] * span).astype(jnp.int32)
        k_new = jnp.clip(k_new, c + 1, K)

        pos_ab, prim_ab, k_ab, ok_ab = _regen(
            scene, cam, k2, pos_x, prim_x, k_x, c, k_new, K, mode_hit)

        # C: lens perturbation — exponential raster offset, retrace v1
        eye = cam.to_world[:3, 3]
        px0, py0, _, _ = sensorlib.world_to_raster(cam, pos_x[:, 1])
        r1, r2 = 0.25, 0.05 * jnp.float32(max(w, h))
        r = r2 * jnp.exp(-jnp.log(r2 / r1) * u[:, 1])
        phi = 2.0 * jnp.pi * u[:, 2]
        pxn = px0 + r * jnp.cos(phi)
        pyn = py0 + r * jnp.sin(phi)
        o_c, d_c, _ = sensorlib.sample_rays(
            cam, pxn, pyn, jnp.zeros((n, 2)))
        its1 = trace.closest_hit(scene, o_c, d_c)
        v1n = o_c + its1.t[:, None] * d_c
        pos_cc = pos_x.at[:, 1].set(jnp.where(its1.valid[:, None],
                                              v1n, pos_x[:, 1]))
        prim_cc = prim_x.at[:, 1].set(jnp.where(its1.valid, its1.prim,
                                                prim_x[:, 1]))
        ok_cc = its1.valid & (pxn >= 0) & (pxn < w) & (pyn >= 0) & (pyn < h)

        # D: caustic perturbation — exponential polar offset of the
        # v2->v1 direction (Veach p.354: theta range scaled from the
        # per-pixel angle), one-edge retrace, deterministic eye link
        u2 = jax.random.uniform(k3, (n, 4))
        rpp = jnp.deg2rad(cam.fov_x) / jnp.float32(w)   # rad per pixel
        th1 = 0.25 * rpp
        th2 = rpp * jnp.sqrt(0.05 * w * h / jnp.pi)
        theta = th2 * jnp.exp(-jnp.log(th2 / th1) * u2[:, 2])
        sphi = 2.0 * jnp.pi * u2[:, 3]
        offs = jnp.stack([jnp.sin(theta) * jnp.cos(sphi),
                          jnp.sin(theta) * jnp.sin(sphi),
                          jnp.cos(theta)], axis=-1)
        wo_old = m.normalize(pos_x[:, 1] - pos_x[:, 2])
        wo_new = m.to_world(wo_old, offs)
        its_d = trace.closest_hit(scene, pos_x[:, 2], wo_new)
        v1d = pos_x[:, 2] + its_d.t[:, None] * wo_new
        pos_dd = pos_x.at[:, 1].set(
            jnp.where(its_d.valid[:, None], v1d, pos_x[:, 1]))
        prim_dd = prim_x.at[:, 1].set(
            jnp.where(its_d.valid, its_d.prim, prim_x[:, 1]))
        ok_dd = its_d.valid & (k_x >= 2)

        # E: multi-chain — lens offset of v1 chained with a same-kernel
        # angular offset of the old v1->v2 direction, retrace both,
        # reconnect v2->v3 (mut_mchain.h:36)
        r_e = r2 * jnp.exp(-jnp.log(r2 / r1) * u2[:, 0])
        phi_e = 2.0 * jnp.pi * u2[:, 1]
        pxe = px0 + r_e * jnp.cos(phi_e)
        pye = py0 + r_e * jnp.sin(phi_e)
        o_e, d_e, _ = sensorlib.sample_rays(cam, pxe, pye,
                                            jnp.zeros((n, 2)))
        its_e1 = trace.closest_hit(scene, o_e, d_e)
        v1e = o_e + its_e1.t[:, None] * d_e
        wo12_old = m.normalize(pos_x[:, 2] - pos_x[:, 1])
        wo12_new = m.to_world(wo12_old, offs)
        its_e2 = trace.closest_hit(scene, v1e, wo12_new)
        v2e = v1e + its_e2.t[:, None] * wo12_new
        ok_ee = (its_e1.valid & its_e2.valid & (k_x >= 3)
                 & (pxe >= 0) & (pxe < w) & (pye >= 0) & (pye < h))
        okm = ok_ee[:, None]
        pos_ee = pos_x.at[:, 1].set(jnp.where(okm, v1e, pos_x[:, 1])
                                    ).at[:, 2].set(
                                        jnp.where(okm, v2e, pos_x[:, 2]))
        prim_ee = prim_x.at[:, 1].set(
            jnp.where(ok_ee, its_e1.prim, prim_x[:, 1])).at[:, 2].set(
                jnp.where(ok_ee, its_e2.prim, prim_x[:, 2]))

        pos_y = jnp.where(is_C, pos_cc,
                          jnp.where(is_D, pos_dd,
                                    jnp.where(is_E, pos_ee, pos_ab)))
        prim_y = jnp.where(is_C, prim_cc,
                           jnp.where(is_D, prim_dd,
                                     jnp.where(is_E, prim_ee, prim_ab)))
        k_y = jnp.where(is_C | is_D | is_E, k_x, k_ab)
        ok_y = jnp.where(is_C, ok_cc,
                         jnp.where(is_D, ok_dd,
                                   jnp.where(is_E, ok_ee, ok_ab)))

        # ---- evaluate + accept ----
        f_y, l_y, px_y = eval_path(scene, cam, pos_y, prim_y, k_y, K)
        l_y = jnp.where(ok_y, l_y, 0.0)

        # transition densities (A/B); C's extra factors: the raster offset
        # pdf is symmetric, only the raster->area Jacobians remain
        t_xy_ab = regen_pdf(scene, cam, pos_y, prim_y, k_y, c, K, mode_hit)
        t_yx_ab = regen_pdf(scene, cam, pos_x, prim_x, k_x, c, K, mode_hit)
        n_len = jnp.maximum(span, 1.0)
        t_xy_ab = jnp.where(mode_hit, t_xy_ab,
                            t_xy_ab / n_len) / jnp.maximum(
                                k_x.astype(jnp.float32), 1.0)
        t_yx_ab = jnp.where(mode_hit, t_yx_ab,
                            t_yx_ab / n_len) / jnp.maximum(
                                k_y.astype(jnp.float32), 1.0)
        jac_y = _cam_area_pdf(scene, cam, pos_y[:, 1], prim_y[:, 1])
        jac_x = _cam_area_pdf(scene, cam, pos_x[:, 1], prim_x[:, 1])
        # D: the exponential angular kernel is symmetric (same polar
        # angle either way), only the angle->area Jacobian at v1 remains
        g1_y = _geom_jac(scene, pos_y[:, 2], pos_y[:, 1], prim_y[:, 1])
        g1_x = _geom_jac(scene, pos_x[:, 2], pos_x[:, 1], prim_x[:, 1])
        # E: raster Jacobian at v1 times angle->area Jacobian at v2
        g2_y = _geom_jac(scene, pos_y[:, 1], pos_y[:, 2], prim_y[:, 2])
        g2_x = _geom_jac(scene, pos_x[:, 1], pos_x[:, 2], prim_x[:, 2])
        t_xy = jnp.where(is_C, jac_y,
                         jnp.where(is_D, g1_y,
                                   jnp.where(is_E, jac_y * g2_y, t_xy_ab)))
        t_yx = jnp.where(is_C, jac_x,
                         jnp.where(is_D, g1_x,
                                   jnp.where(is_E, jac_x * g2_x, t_yx_ab)))

        num = l_y * t_yx
        den = l_x * t_xy
        a = jnp.clip(m.safe_div(num, jnp.maximum(den, 1e-30)), 0.0, 1.0)
        a = jnp.where((l_x <= 0) | (den <= 0),
                      jnp.where(l_y > 0, 1.0, 0.0), a)
        a = jnp.where(ok_y, a, 0.0)

        # ---- expected-value splats (both states) ----
        w_x = jnp.where(l_x > 0, (1.0 - a) * b / jnp.maximum(l_x, 1e-12),
                        0.0)
        w_y = jnp.where(l_y > 0, a * b / jnp.maximum(l_y, 1e-12), 0.0)
        img = img.at[px_x].add(f_x * w_x[:, None])
        img = img.at[px_y].add(f_y * w_y[:, None])

        take = jax.random.uniform(k4, (n,)) < a
        pos_x = jnp.where(take[:, None, None], pos_y, pos_x)
        prim_x = jnp.where(take[:, None], prim_y, prim_x)
        k_x = jnp.where(take, k_y, k_x)
        f_x = jnp.where(take[:, None], f_y, f_x)
        l_x = jnp.where(take, l_y, l_x)
        px_x = jnp.where(take, px_y, px_x)
        acc = acc.at[mode_i].add(jnp.mean(a))
        return (pos_x, prim_x, k_x, f_x, l_x, px_x, img, acc), None

    img0 = jnp.zeros((w * h, 3))
    acc0 = jnp.zeros((5,))
    keys = jax.random.split(km, n_mutations)
    modes = jnp.arange(n_mutations, dtype=jnp.int32) % 5
    (_, _, _, _, _, _, img, acc), _ = jax.lax.scan(
        step, (pos_c, prim_c, k_c, f_c, l_c, px_c, img0, acc0),
        (keys, modes))

    # f carries the per-pixel-uniform camera importance (npix/A_film...),
    # so the b-normalized splat sum/(chains*mutations) IS the per-pixel
    # radiance estimate — no extra w*h factor.
    img = img / jnp.float32(n_chains * n_mutations)
    img = img.reshape(h, w, 3)
    if return_stats:
        per_mode = acc / jnp.maximum(
            jnp.float32(n_mutations) / 5.0, 1.0)
        return img, {"acceptance": per_mode, "b": b}
    return img


def render_jit(scene, cam, cfg: RenderConfig, **kw):
    return jax.jit(partial(render, cfg=cfg, **kw))(scene, cam)

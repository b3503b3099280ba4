"""Discontinuity-aware vertex-position gradients: warped-area
reparameterization of ray directions.

The interior term of d(image)/d(vertices) already flows through the
renderer (the intersection search is stop-gradient'd and the hit
point/barycentrics are recomputed differentiably — ops/intersect.py
surface_interaction). What is missing from plain AD is the BOUNDARY
term: visibility indicators V(omega, theta) jump across silhouette
curves that move with the vertices, and d/dtheta of a 0/1 function is
zero almost everywhere, so occlusion gradients (shadows, silhouettes)
are silently dropped.

This module implements the warped-area approach (Loubet et al. 2019,
"Reparameterizing discontinuous integrands"; divergence handling after
Bangaru et al. 2020 "Unbiased Warped-Area Sampling"): for each ray
direction omega we construct a velocity field from K auxiliary rays in
a vMF cone around omega,

    Vbar(omega, theta) = sum_k w_k u_k(theta) / sum_k w_k,
    u_k = normalize(x_k(theta) - o)   (x_k: aux hit point, attached),

whose value near a silhouette follows the silhouette's own motion
(weights emphasise the nearest surface, so the field is dominated by
the occluder that owns the edge). The ray is then evaluated at the
warped direction

    T(omega) = normalize(omega + Vbar - stop_grad(Vbar)),

which equals omega in the primal but moves WITH the discontinuity under
d/dtheta — making the integrand continuous in theta at fixed sample, so
ordinary AD of the warped estimator recovers the boundary term. The
change-of-variables factor |det J_T| = 1 + div Vbar contributes its own
theta-derivative ("divergence term"); it is computed exactly with two
forward-mode JVPs of Vbar over the tangent plane of omega.

ACCURACY STATUS (r4, measured): this warped-area estimator is
consistent in shape but quantitatively biased with practical sample
counts — on a quad-blocker/area-light FD validation it captures
~55-70%% of the true occlusion gradient (K=16..128 aux rays; the
harmonic-weight ratio estimator's effective sample count near a
silhouette is small, and sharper weights trade boundary-velocity
tracking against in-band transitions — see the 1D study in the r4
notes). For EXACT visibility boundary gradients use
integrators/boundary.py (edge sampling: FD-validated to ~1%% on the
same scenes); this module is kept as the reparameterization-family
alternative and for its attached-hit-point machinery.

Scope notes (documented limits): gradients w.r.t. emitter-surface
vertices flow through the radiance/geometry terms but the sampling
CDF/area tables are treated as constants; camera parameters are not
differentiated here.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core.rng import SampleStream
from ..models import bsdf as bsdflib
from ..models import emitter as emitterlib
from ..ops import trace
from ..scene import ir as _ir
from .common import RenderConfig, mis_weight
from .path import DIMS_PER_BOUNCE, RAY_EPS, SENSOR_DIMS


class ReparamConfig(NamedTuple):
    n_aux: int = 8          # auxiliary rays per reparameterized ray
    kappa: float = 3.0e3    # vMF concentration of the aux cone
    edge_eps: float = 0.03  # harmonic-weight softening, in cone-width units
    edge_cap: float = 1.0   # boundary-distance cap (radians)
    edge_pow: float = 1.0   # harmonic-weight exponent 1/B^p
    stratified: bool = True  # Fibonacci-stratified aux cone
    warp_primary: bool = True
    warp_nee: bool = True
    warp_bsdf: bool = True
    aux_dim_base: int = 1024  # sampler dims reserved for aux directions


def _diff_hit_point(scene, o, d, its):
    """Surface-attached world hit position of a (stop-gradient) search
    result: the hit is frozen in the winning triangle's barycentric
    frame, x(theta) = sum_i b_i * v_i(theta) with stop-gradient b_i, so
    vertex motion carries the point WITH the surface (lateral silhouette
    motion included — a point recomputed along the ray would have zero
    angular velocity by construction). Misses return a far point rigidly
    attached to the ray (zero vertex-derivative)."""
    vi = scene.indices[its.prim]
    v0 = scene.vertices[vi[:, 0]]
    v1 = scene.vertices[vi[:, 1]]
    v2 = scene.vertices[vi[:, 2]]
    # barycentrics/t from THETA-FROZEN geometry but live ray inputs:
    # stop-gradient the vertices (not the barycentrics!), so b_i keeps
    # its omega-dependence — the divergence term is the mixed partial
    # d/dtheta d/domega of the field and dies if b_i(omega) is severed
    v0s = jax.lax.stop_gradient(v0)
    e1s = jax.lax.stop_gradient(v1) - v0s
    e2s = jax.lax.stop_gradient(v2) - v0s
    pv = jnp.cross(d, e2s)
    det = jnp.sum(e1s * pv, -1)
    bad = jnp.abs(det) < 1e-12
    inv_det = jnp.where(bad, 0.0, 1.0 / jnp.where(bad, 1.0, det))
    tv = o - v0s
    qv = jnp.cross(tv, e1s)
    b1 = jnp.sum(tv * pv, -1) * inv_det
    b2 = jnp.sum(d * qv, -1) * inv_det
    t_mt = jnp.sum(e2s * qv, -1) * inv_det
    b1 = jnp.clip(b1, 0.0, 1.0)
    b2 = jnp.clip(b2, 0.0, 1.0 - b1)
    x_surf = (1.0 - b1 - b2)[:, None] * v0 \
        + b1[:, None] * v1 + b2[:, None] * v2
    ok = (its.valid & ~bad)[:, None]
    t = jnp.where(its.valid & ~bad, t_mt, 1.0e4)
    x_ray = o + t[:, None] * d
    return jnp.where(ok, x_surf, x_ray), jnp.where(its.valid, t, 1.0e4)


def _boundary_test(scene, of, wf, its, x, t_hit, cap):
    """Angular distance of each aux hit to the nearest SILHOUETTE edge of
    its own surface (Bangaru-style boundary test): an edge of the hit
    triangle is a silhouette w.r.t. the ray if it is open (face_adj -1)
    or its neighbor face's facing sign flips. Misses and edge-free hits
    return `cap`. Fully detached — it only shapes the interpolation
    weights."""
    sg = jax.lax.stop_gradient
    prim = its.prim
    vi = scene.indices[prim]                                   # (M,3)
    v = [sg(scene.vertices[vi[:, j]]) for j in range(3)]
    ng = jnp.cross(v[1] - v[0], v[2] - v[0])
    front = jnp.sum(ng * wf, -1) < 0.0
    adj = scene.face_adj[prim]                                 # (M,3)
    t_safe = jnp.maximum(sg(t_hit), 1e-6)
    best = jnp.full(prim.shape, cap)
    for j in range(3):
        nb = adj[:, j]
        has_nb = nb >= 0
        vin = scene.indices[jnp.maximum(nb, 0)]
        w0 = sg(scene.vertices[vin[:, 0]])
        ngn = jnp.cross(sg(scene.vertices[vin[:, 1]]) - w0,
                        sg(scene.vertices[vin[:, 2]]) - w0)
        front_n = jnp.sum(ngn * wf, -1) < 0.0
        sil = ~has_nb | (front_n != front)
        a = v[j]
        e = v[(j + 1) % 3] - a
        tt = jnp.clip(jnp.sum((x - a) * e, -1)
                      / jnp.maximum(jnp.sum(e * e, -1), 1e-20), 0.0, 1.0)
        dist = jnp.linalg.norm(x - (a + tt[:, None] * e), axis=-1)
        dj = jnp.where(sil, dist / t_safe, cap)
        best = jnp.minimum(best, dj)
    return sg(jnp.where(its.valid, jnp.minimum(best, cap), cap))


def _vmf_offsets(u2, kappa):
    """Local-frame vMF directions around +z: (..., K, 3) from (..., K, 2)
    uniforms (Jakob's vMF sampling; core/warp.py has the chi2-tested
    version — re-derived here to keep the cone math local)."""
    u1, u2_ = u2[..., 0], u2[..., 1]
    cos_t = 1.0 + jnp.log1p((jnp.exp(-2.0 * kappa) - 1.0) * u1) / kappa
    sin_t = m.safe_sqrt(1.0 - cos_t * cos_t)
    phi = 2.0 * jnp.pi * u2_
    return jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)


def _vmf_offsets_stratified(u2, kappa, k):
    """Stratified vMF cone: Fibonacci-spiral strata in (radius, angle)
    with one shared random rotation + radial jitter per ray (u2[..., 0:2]
    of the FIRST sample supply the jitter). The warp field's variance is
    dominated by the aux-sample pattern near a silhouette; stratifying
    the cloud cuts the nonlinear (ratio-estimator) bias far faster than
    raising K with independent samples."""
    golden = 0.6180339887498949
    idx = jnp.arange(k, dtype=jnp.float32)
    u1 = (idx + u2[..., 0:1, 0]) / k                 # stratified radius
    phi = 2.0 * jnp.pi * ((idx * golden + u2[..., 0:1, 1]) % 1.0)
    cos_t = 1.0 + jnp.log1p((jnp.exp(-2.0 * kappa) - 1.0) * u1) / kappa
    sin_t = m.safe_sqrt(1.0 - cos_t * cos_t)
    return jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)


def reparam_ray(scene, o, d, u_aux, rp: ReparamConfig, active=None):
    """Warped direction + divergence weight for a batch of rays.

    Returns (d_warp (N,3), w_div (N,)): primal values equal (d, 1); the
    theta-derivatives carry the boundary (silhouette) motion. u_aux:
    (N, K, 2) uniforms. `active` lanes False skip the warp (identity).

    Construction (Loubet et al. 2019 convolution form): the K auxiliary
    directions are sampled ONCE around the primal direction and held
    fixed; the velocity field is evaluated at a direction omega by
    REWEIGHTING the fixed samples with the vMF kernel,

        Vbar(omega) = sum_k K(<omega, w_k>) g_k u_k / sum_k K(...) g_k.

    This is essential, not a convenience: if the aux fan instead rotated
    rigidly with omega, the kernel values would be constants and the
    field's transition across a silhouette would be carried entirely by
    discrete hit-set changes — invisible to the JVPs that compute the
    divergence (measured: a ~100x underestimated boundary term). With
    fixed samples the transition lives in the smooth kernel weights, the
    JVP divergence is O(velocity/kernel width) in the transition band,
    and the trace happens outside the JVPs (one aux wavefront, not
    three)."""
    n = o.shape[0]
    k = rp.n_aux
    d0 = jax.lax.stop_gradient(d)
    s0, t0 = m.coordinate_system(d0)
    if rp.stratified:
        offs = _vmf_offsets_stratified(u_aux, rp.kappa, k)     # (N,K,3)
    else:
        offs = _vmf_offsets(u_aux, rp.kappa)
    w_dirs = (offs[..., 0:1] * s0[:, None]
              + offs[..., 1:2] * t0[:, None]
              + offs[..., 2:3] * d0[:, None])                  # (N,K,3)

    # one aux wavefront trace; u_k surface-attached (theta-live)
    of = jnp.broadcast_to(o[:, None], (n, k, 3)).reshape(n * k, 3)
    wf = w_dirs.reshape(n * k, 3)
    its = trace.closest_hit(scene, of, wf)
    x, t_hit = _diff_hit_point(scene, of, wf, its)
    u = m.normalize(x - of).reshape(n, k, 3)
    # harmonic silhouette weights: samples near their own surface's
    # silhouette edge dominate the interpolation, so near a boundary the
    # field follows the edge's velocity exactly (boundary condition) and
    # transitions over the kernel width on BOTH sides (jvp-visible)
    B = _boundary_test(scene, of, wf, its,
                       jax.lax.stop_gradient(x), t_hit, rp.edge_cap)
    sigma = 1.0 / jnp.sqrt(rp.kappa)
    g = ((1.0 / (B + rp.edge_eps * sigma)) ** rp.edge_pow) \
        .reshape(n, k)                                         # (N,K)

    # the samples were drawn from vMF(d0, kappa); dividing the kernel by
    # that sampling pdf (same exponential — it cancels to a difference in
    # the exponent) makes the estimated field independent of the cloud
    # CENTER in expectation. Without this importance correction the field
    # each ray sees is centered on itself, and the divergence JVP
    # systematically underestimates the transition slope (measured ~2.5x
    # low on the quad-blocker profile)
    base_lk = jnp.sum(d0[:, None] * w_dirs, -1)                # (N,K)

    def field(dd):
        lw = rp.kappa * (jnp.sum(dd[:, None] * w_dirs, -1) - base_lk)
        wgt = jnp.exp(lw) * g
        return jnp.sum(wgt[..., None] * u, axis=1) \
            / jnp.maximum(jnp.sum(wgt, axis=1), 1e-20)[..., None]

    # divergence of the tangential field via two JVPs over the tangent
    # plane (the radial component is killed by the final normalize)
    vbar, jv_s = jax.jvp(field, (d,), (s0,))
    _, jv_t = jax.jvp(field, (d,), (t0,))
    div = jnp.sum(jv_s * s0, -1) + jnp.sum(jv_t * t0, -1)

    delta = vbar - jax.lax.stop_gradient(vbar)
    d_warp = m.normalize(d + delta)
    w_div = 1.0 + div - jax.lax.stop_gradient(div)
    if active is not None:
        d_warp = jnp.where(active[:, None], d_warp, d)
        w_div = jnp.where(active, w_div, 1.0)
    return d_warp, w_div


def li_reparam(scene, cam, o, d, stream: SampleStream, cfg: RenderConfig,
               rp: ReparamConfig = ReparamConfig()) -> jax.Array:
    """MIS path tracer with reparameterized rays: identical primal
    estimator to path.li (same sample stream layout), but camera / NEE /
    BSDF-sampled directions are warped so jax.grad w.r.t. scene vertex
    positions includes the visibility boundary terms. Use for gradient
    rendering; the primal hot path stays path.li / wavefront."""
    n = o.shape[0]
    families = scene.bsdf_families

    def bounce_u(bounce, k):
        return stream.at_dim(SENSOR_DIMS + bounce * DIMS_PER_BOUNCE + k)

    def aux_u(tag, bounce, k):
        # dedicated high dims so aux rays never alias path samples
        base = rp.aux_dim_base + (bounce * 3 + tag) * (2 * rp.n_aux)
        us = [stream.at_dim(base + i) for i in range(2 * rp.n_aux)]
        return jnp.stack(us, -1).reshape(n, rp.n_aux, 2)

    L = jnp.zeros((n, 3))
    beta_thr = jnp.ones((n, 3))
    active = jnp.ones((n,), bool)
    prev_pdf = jnp.ones((n,))
    prev_delta = jnp.ones((n,), bool)
    eta_scale = jnp.ones((n,))

    if rp.warp_primary:
        d, w_div = reparam_ray(scene, o, d, aux_u(0, 0, 0), rp)
        beta_thr = beta_thr * w_div[:, None]

    for t in range(cfg.max_depth):
        its = trace.closest_hit(scene, o, d)
        si = trace.surface_interaction(scene, o, d, its)
        ns, ng, p = si["ns"], si["ng"], si["p"]
        wi_local = m.to_local(ns, si["wi_world"])

        env_le = emitterlib.env_radiance(scene, d)
        if scene.has_env:
            w_env = jnp.where(prev_delta, 1.0,
                              mis_weight(cfg.mis_mode, prev_pdf,
                                         emitterlib.pdf_direct_env(scene, d)))
            if cfg.hide_emitters:
                w_env = jnp.where(t == 0, 0.0, w_env)
            L = L + jnp.where((active & ~its.valid)[:, None],
                              beta_thr * env_le * w_env[:, None], 0.0)
        active = active & its.valid

        em_id = si["emitter"]
        hit_emitter = em_id >= 0
        le = scene.emitters.radiance[jnp.maximum(em_id, 0)]
        cos_l = m.dot(si["wi_world"], ng)
        le = jnp.where((hit_emitter & (cos_l > 0.0))[:, None], le, 0.0)
        pdf_em = emitterlib.pdf_direct_area(scene, o, d, its.t, its.prim,
                                            cos_l)
        w_bsdf = jnp.where(prev_delta, 1.0,
                           mis_weight(cfg.mis_mode, prev_pdf, pdf_em))
        if cfg.hide_emitters:
            w_bsdf = jnp.where(t == 0, 0.0, w_bsdf)
        L = L + jnp.where(active[:, None], beta_thr * le * w_bsdf[:, None],
                          0.0)

        can_continue = t < (cfg.max_depth - 1)
        sp = bsdflib.gather_shade_point(scene, si["mat"], si["uv"],
                                        u_blend=bounce_u(t, 7), aux=si)

        # --- NEE with a warped shadow direction ------------------------
        u_nee = jnp.stack([bounce_u(t, 0), bounce_u(t, 1), bounce_u(t, 2)],
                          -1)
        ds = emitterlib.sample_direct(scene, p, u_nee)
        nee_cand = active & can_continue & (ds.pdf > 0.0)
        if rp.warp_nee:
            d_nee, w_div_nee = reparam_ray(scene, p, ds.d, aux_u(1, t, 0),
                                           rp, active=nee_cand)
        else:
            d_nee, w_div_nee = ds.d, jnp.ones((n,))
        wo_local = m.to_local(ns, d_nee)
        f_nee, pdf_bsdf_nee = bsdflib.eval_pdf(sp, wi_local, wo_local,
                                               families)
        nee_possible = nee_cand & (
            jax.lax.stop_gradient(jnp.max(f_nee, axis=-1)) > 0.0)
        if cfg.strict_normals:
            same_side = (m.dot(ds.d, ng) * m.cos_theta(wo_local)) > 0.0
            nee_possible = nee_possible & same_side
        blocked = trace.shadow_blocked(scene, p, ds.d, ds.dist,
                                       cfg.occupancy_shadows)
        w_nee = jnp.where(ds.is_delta, 1.0,
                          mis_weight(cfg.mis_mode, ds.pdf, pdf_bsdf_nee))
        contrib = beta_thr * f_nee * ds.radiance \
            * (m.safe_div(w_nee, ds.pdf) * w_div_nee)[:, None]
        L = L + jnp.where((nee_possible & ~blocked)[:, None], contrib, 0.0)

        # --- BSDF sampling with a warped continuation ------------------
        u_lobe = bounce_u(t, 3)
        u2 = jnp.stack([bounce_u(t, 4), bounce_u(t, 5)], -1)
        wo, weight, pdf, is_delta = bsdflib.sample(sp, wi_local, u_lobe, u2,
                                                   families)
        d_new = m.to_world(ns, wo)
        cont = active & can_continue & (pdf > 0.0)
        if rp.warp_bsdf and t + 1 < cfg.max_depth:
            # warp from the offset origin the continuation actually uses
            off_sign0 = jnp.where(m.dot(d_new, ng) > 0, RAY_EPS, -RAY_EPS)
            d_new, w_div_b = reparam_ray(
                scene, p + ng * off_sign0[:, None], d_new, aux_u(2, t, 0),
                rp, active=cont & ~is_delta)
        else:
            w_div_b = jnp.ones((n,))
        eta_r = jnp.where(
            (sp.type == _ir.BSDF_DIELECTRIC)
            & (m.cos_theta(wi_local) * m.cos_theta(wo) < 0),
            jnp.where(m.cos_theta(wi_local) > 0, sp.eta[..., 0],
                      1.0 / sp.eta[..., 0]),
            1.0)
        eta_scale = eta_scale * eta_r
        beta_new = beta_thr * weight * w_div_b[:, None]
        alive = cont & (
            jax.lax.stop_gradient(jnp.max(beta_new, axis=-1)) > 0.0)
        off_sign = jnp.where(m.dot(d_new, ng) > 0, RAY_EPS, -RAY_EPS)
        o_new = p + ng * off_sign[:, None]

        q = jnp.minimum(jnp.max(beta_new, axis=-1) * eta_scale * eta_scale,
                        0.95)
        q = jax.lax.stop_gradient(jnp.maximum(q, 0.05))
        do_rr = t >= (cfg.rr_depth - 1)
        survive = jnp.where(do_rr, bounce_u(t, 6) < q, True)
        beta_new = beta_new / jnp.where(do_rr, q, 1.0)[:, None]
        alive = alive & survive

        beta_thr = jnp.where(alive[:, None], beta_new, 0.0)
        o = jnp.where(alive[:, None], o_new, o)
        d = jnp.where(alive[:, None], d_new, d)
        active = alive
        prev_pdf = jnp.where(alive, pdf, prev_pdf)
        prev_delta = jnp.where(alive, is_delta, prev_delta)

    return L

"""Hero-wavelength spectral path tracer.

The runtime analog of the reference's compile-time SPECTRUM_SAMPLES=N
spectral build (include/mitsuba/core/spectrum.h; the shipped config is
RGB, so this EXCEEDS the reference binary's capability): each camera
sample draws N_LAMBDA hero-rotated wavelengths (core/spectrum.py), the
path carries a spectral throughput row, every RGB quantity is lifted by
the calibrated upsampler at use, and contributions resolve to RGB
through the camera response. Dielectrics with cfg.cauchy_b > 0 refract
with the hero wavelength's Cauchy IOR; the first dispersive refraction
collapses the path to the hero wavelength (throughput x N_LAMBDA on the
surviving lane — the standard hero-wavelength pdf adjustment), which
renders real rainbows out of white light.

Mirrors path.py's wavefront loop (path.cpp:119-280); shares its sampler
dim layout plus one trailing dim for the hero wavelength."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core import spectrum as spec
from ..core.rng import SampleStream
from ..models import bsdf as bsdflib
from ..models import emitter as emitterlib
from ..ops import trace
from ..scene import ir as _ir
from .common import RenderConfig, mis_weight
from .path import DIMS_PER_BOUNCE, RAY_EPS, SENSOR_DIMS


def li(scene, cam, o, d, stream: SampleStream, cfg: RenderConfig) -> jax.Array:
    n = o.shape[0]
    K = spec.N_LAMBDA
    families = scene.bsdf_families

    def bounce_u(bounce, k):
        return stream.at_dim(SENSOR_DIMS + bounce * DIMS_PER_BOUNCE + k)

    u_lam = stream.at_dim(SENSOR_DIMS + cfg.max_depth * DIMS_PER_BOUNCE)
    lam = spec.sample_lambdas(u_lam)                       # (n, K)
    # fixed per-path response row: converts spectral contributions to rgb
    resp = (spec.rgb_response(lam)
            / (spec.LAMBDA_PDF * K))                       # (n, K, 3)

    def add(L, contrib_spec, mask):
        c = jnp.sum(resp * contrib_spec[..., None], axis=-2)
        return L + jnp.where(mask[:, None], c, 0.0)

    def body(t, state):
        o, d, L, beta, active, prev_pdf, prev_delta, eta_scale, collapsed \
            = state

        its = trace.closest_hit(scene, o, d)
        si = trace.surface_interaction(scene, o, d, its)
        ns, ng, p = si["ns"], si["ng"], si["p"]
        wi_local = m.to_local(ns, si["wi_world"])

        # --- escaped rays: environment emission --------------------------
        if scene.has_env:
            if scene.envmap is not None \
                    and scene.envmap.spectral is not None:
                # TRUE spectral sky (Hosek band stack baked at load —
                # the reference's SPECTRUM_SAMPLES>3 build analog)
                from ..scene import envmap as envlib
                env_le = envlib.eval_radiance_spectral(scene.envmap, d,
                                                       lam)
            else:
                env_le = spec.upsample(
                    emitterlib.env_radiance(scene, d), lam)
            w_env = jnp.where(prev_delta, 1.0,
                              mis_weight(cfg.mis_mode, prev_pdf,
                                         emitterlib.pdf_direct_env(scene, d)))
            if cfg.hide_emitters:
                w_env = jnp.where(t == 0, 0.0, w_env)
            L = add(L, beta * env_le * w_env[:, None], active & ~its.valid)
        active = active & its.valid

        # --- emitted radiance at the hit ---------------------------------
        em_id = si["emitter"]
        le_rgb = scene.emitters.radiance[jnp.maximum(em_id, 0)]
        cos_l = m.dot(si["wi_world"], ng)
        le = spec.upsample(le_rgb, lam)
        le = jnp.where(((em_id >= 0) & (cos_l > 0.0))[:, None], le, 0.0)
        pdf_em = emitterlib.pdf_direct_area(scene, o, d, its.t, its.prim,
                                            cos_l)
        w_bsdf = jnp.where(prev_delta, 1.0,
                           mis_weight(cfg.mis_mode, prev_pdf, pdf_em))
        if cfg.hide_emitters:
            w_bsdf = jnp.where(t == 0, 0.0, w_bsdf)
        L = add(L, beta * le * w_bsdf[:, None], active)

        can_continue = t < (cfg.max_depth - 1)
        sp = bsdflib.gather_shade_point(scene, si["mat"], si["uv"],
                                        u_blend=bounce_u(t, 7), aux=si)

        # --- next event estimation ---------------------------------------
        u_nee = jnp.stack([bounce_u(t, 0), bounce_u(t, 1),
                           bounce_u(t, 2)], -1)
        ds = emitterlib.sample_direct(scene, p, u_nee)
        wo_local = m.to_local(ns, ds.d)
        f_rgb, pdf_bsdf_nee = bsdflib.eval_pdf(sp, wi_local, wo_local,
                                               families)
        f_nee = spec.upsample_reflectance(f_rgb, lam)
        nee_possible = active & can_continue & (ds.pdf > 0.0) & (
            jnp.max(f_rgb, axis=-1) > 0.0)
        blocked = trace.shadow_blocked(scene, p, ds.d, ds.dist,
                                       cfg.occupancy_shadows)
        w_nee = jnp.where(ds.is_delta, 1.0,
                          mis_weight(cfg.mis_mode, ds.pdf, pdf_bsdf_nee))
        rad = spec.upsample(ds.radiance, lam)
        if scene.envmap is not None and scene.envmap.spectral is not None:
            # env NEE samples carry the true sky spectrum too
            from ..scene import envmap as envlib
            rad = jnp.where(ds.is_env[:, None],
                            envlib.eval_radiance_spectral(scene.envmap,
                                                          ds.d, lam),
                            rad)
        contrib = beta * f_nee * rad * m.safe_div(w_nee, ds.pdf)[:, None]
        L = add(L, contrib, nee_possible & ~blocked)

        # --- BSDF sampling (dispersive dielectrics use the hero IOR) -----
        if cfg.cauchy_b > 0.0:
            eta_hero = spec.cauchy_eta(sp.eta[..., 0],
                                       jnp.float32(cfg.cauchy_b),
                                       lam[:, 0])
            is_diel = sp.type == _ir.BSDF_DIELECTRIC
            sp = sp._replace(eta=sp.eta.at[..., 0].set(
                jnp.where(is_diel, eta_hero, sp.eta[..., 0])))
        u_lobe = bounce_u(t, 3)
        u2 = jnp.stack([bounce_u(t, 4), bounce_u(t, 5)], -1)
        wo, weight_rgb, pdf, is_delta = bsdflib.sample(sp, wi_local, u_lobe,
                                                       u2, families)
        d_new = m.to_world(ns, wo)
        transmitted = m.cos_theta(wi_local) * m.cos_theta(wo) < 0
        eta_r = jnp.where(
            (sp.type == _ir.BSDF_DIELECTRIC) & transmitted,
            jnp.where(m.cos_theta(wi_local) > 0, sp.eta[..., 0],
                      1.0 / sp.eta[..., 0]),
            1.0)
        eta_scale = eta_scale * eta_r
        beta_new = beta * spec.upsample_reflectance(weight_rgb, lam)
        if cfg.cauchy_b > 0.0:
            # hero-wavelength collapse on the first dispersive refraction
            disperse = ((sp.type == _ir.BSDF_DIELECTRIC) & transmitted
                        & ~collapsed)
            hero_only = jnp.concatenate(
                [jnp.full((n, 1), float(K)), jnp.zeros((n, K - 1))], -1)
            beta_new = jnp.where(disperse[:, None],
                                 beta_new * hero_only, beta_new)
            collapsed = collapsed | disperse
        alive = (active & can_continue & (pdf > 0.0)
                 & (jnp.max(beta_new, axis=-1) > 0.0))
        off_sign = jnp.where(m.dot(d_new, ng) > 0, RAY_EPS, -RAY_EPS)
        o_new = p + ng * off_sign[:, None]

        # --- Russian roulette --------------------------------------------
        q = jnp.minimum(jnp.max(beta_new, axis=-1) * eta_scale * eta_scale,
                        0.95)
        q = jax.lax.stop_gradient(jnp.maximum(q, 0.05))
        do_rr = t >= (cfg.rr_depth - 1)
        survive = jnp.where(do_rr, bounce_u(t, 6) < q, True)
        beta_new = beta_new / jnp.where(do_rr, q, 1.0)[:, None]
        alive = alive & survive

        beta_out = jnp.where(alive[:, None], beta_new, 0.0)
        return (jnp.where(alive[:, None], o_new, o),
                jnp.where(alive[:, None], d_new, d),
                L, beta_out, alive,
                jnp.where(alive, pdf, prev_pdf),
                jnp.where(alive, is_delta, prev_delta),
                eta_scale, collapsed)

    state = (o, d, jnp.zeros((n, 3)), jnp.ones((n, K)),
             jnp.ones((n,), bool), jnp.ones((n,)),
             jnp.ones((n,), bool), jnp.ones((n,)),
             jnp.zeros((n,), bool))
    if cfg.unroll:
        for t in range(cfg.max_depth):
            state = body(t, state)
    else:
        state = jax.lax.fori_loop(0, cfg.max_depth, body, state)
    return state[2]

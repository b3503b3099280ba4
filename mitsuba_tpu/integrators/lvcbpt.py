"""Light-vertex-cache bidirectional path tracing (LVC-BPT).

TPU-native analog of the fork's flagship integrator
(src/integrators/myBDPT/LVCBPT.cpp:30-55): a light pass traces L light
subpaths and stores EVERY vertex (including the emitter vertex itself) in a
flat cache; the eye pass connects each eye vertex to M uniformly chosen
cache vertices. Unlike classic BDPT there is no per-pixel light subpath —
the cache amortizes light-path work across all pixels, which on TPU means
the whole cache is a dense SoA array and connections are pure batched
gathers (no divergence).

Strategy weighting implements the fork's **Uniform MIS mode**
(LVCBPT.cpp:50-55 m_misMode): a path with k edges is producible by its
eye-hit strategy plus (k-1) connection splits, so every strategy gets
weight 1/k — unbiased without pdf bookkeeping (the Balance/Power modes are
variance optimizations over the same estimator).

Connection contribution (s = light vertex depth, t = eye vertex depth):
  (V_cache / (M * L)) * beta_e * [f_e cos_e] * 1/d^2 * [f_l cos_l] * beta_l
with the emitter vertex (s=0) using beta_pos = Le / pdf_area and
[f_l cos_l] = cos_l (its "BSDF" is the emission cosine).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core import warp
from ..core.rng import uniform
from ..models import bsdf as bsdflib
from ..ops import trace
from .common import RenderConfig
from .ptracer import sample_emitter_ray

RAY_EPS = 1e-3


class LightCache(NamedTuple):
    pos: jax.Array       # (V,3)
    ns: jax.Array        # (V,3) shading normal (emitter vertex: geo normal)
    wi: jax.Array        # (V,3) toward previous vertex (unused for s=0)
    beta: jax.Array      # (V,3) throughput from the emitter (s=0: Le/pdf_A)
    mat: jax.Array       # (V,) int32 material (-1 = emitter vertex)
    uv: jax.Array        # (V,2)
    depth: jax.Array     # (V,) int32 s (edges from the emitter)
    valid: jax.Array     # (V,) bool


def build_light_cache(scene, cfg: RenderConfig, n_paths: int,
                      max_depth: int) -> LightCache:
    """Wavefront light pass storing all vertices (CaptureParticle analog,
    but kept instead of splatted)."""
    seed = jnp.uint32(cfg.seed ^ 0x51CBA7)
    pid = jnp.arange(n_paths, dtype=jnp.uint32)

    def u(k):
        return uniform(seed, pid, jnp.uint32(0), k)

    o, d, beta_dir, ng0 = sample_emitter_ray(
        scene, u(0), jnp.stack([u(1), u(2)], -1), jnp.stack([u(3), u(4)], -1)
    )
    # vertex 0: on the emitter; beta_pos = Le * A / sel = beta_dir / pi
    pos_l = [o]
    ns_l = [ng0]
    wi_l = [ng0]
    beta_l = [beta_dir / jnp.pi]
    mat_l = [jnp.full((n_paths,), -1, jnp.int32)]
    uv_l = [jnp.zeros((n_paths, 2))]
    depth_l = [jnp.zeros((n_paths,), jnp.int32)]
    valid_l = [jnp.ones((n_paths,), bool)]

    beta = beta_dir
    active = jnp.ones((n_paths,), bool)
    families = scene.bsdf_families
    for t in range(1, max_depth):
        its = trace.closest_hit(scene, o, d)
        si = trace.surface_interaction(scene, o, d, its)
        active = active & its.valid
        ns, ngs, p = si["ns"], si["ng"], si["p"]
        pos_l.append(p)
        ns_l.append(ns)
        wi_l.append(si["wi_world"])
        beta_l.append(beta)
        mat_l.append(si["mat"])
        uv_l.append(si["uv"])
        depth_l.append(jnp.full((n_paths,), t, jnp.int32))
        valid_l.append(active)

        sp = bsdflib.gather_shade_point(scene, si["mat"], si["uv"])
        wi_local = m.to_local(ns, si["wi_world"])
        wo, wgt, pdf, _ = bsdflib.sample(
            sp, wi_local, u(5 + 4 * t), jnp.stack([u(6 + 4 * t), u(7 + 4 * t)], -1),
            families,
        )
        d_new = m.to_world(ns, wo)
        beta_new = beta * wgt
        alive = active & (pdf > 0) & (jnp.max(beta_new, -1) > 0)
        q = jax.lax.stop_gradient(jnp.clip(jnp.max(wgt, -1), 0.05, 0.95))
        do_rr = t >= cfg.rr_depth
        survive = jnp.where(do_rr, u(8 + 4 * t) < q, True)
        beta = beta_new / jnp.where(do_rr, q, 1.0)[:, None]
        active = alive & survive
        o = p + ngs * jnp.where(m.dot(d_new, ngs) > 0, RAY_EPS, -RAY_EPS)[:, None]
        d = d_new

    return LightCache(
        pos=jnp.concatenate(pos_l),
        ns=jnp.concatenate(ns_l),
        wi=jnp.concatenate(wi_l),
        beta=jnp.concatenate(beta_l),
        mat=jnp.concatenate(mat_l),
        uv=jnp.concatenate(uv_l),
        depth=jnp.concatenate(depth_l),
        valid=jnp.concatenate(valid_l),
    )


def li(scene, cam, o, d, stream, cfg: RenderConfig) -> jax.Array:
    """Eye pass Li over a ray batch; the light cache is built per call from
    cfg.seed (the cache is shared by every ray in the batch — LVC's point).

    M connections per eye vertex come from cfg.aux knobs baked into the
    RenderConfig via lvcbpt_* fields when present (defaults below).
    """
    n = o.shape[0]
    families = scene.bsdf_families
    n_paths = getattr(cfg, "lvc_paths", None) or max(n // 4, 1024)
    M = 4
    cache = build_light_cache(scene, cfg, n_paths, cfg.max_depth)
    V = cache.pos.shape[0]
    n_valid = jnp.maximum(jnp.sum(cache.valid.astype(jnp.float32)), 1.0)

    def bounce_u(bounce, k):
        return stream.at_dim(4 + bounce * (8 + 2 * M) + k)

    L = jnp.zeros((n, 3))
    beta = jnp.ones((n, 3))
    active = jnp.ones((n,), bool)
    prev_delta = jnp.ones((n,), bool)

    for t in range(cfg.max_depth):
        its = trace.closest_hit(scene, o, d)
        si = trace.surface_interaction(scene, o, d, its)
        ns, ng, p = si["ns"], si["ng"], si["p"]
        wi_local = m.to_local(ns, si["wi_world"])

        # --- eye-hit strategy: weight 1/k, k = t+1 edges -----------------
        em_id = si["emitter"]
        cos_l = m.dot(si["wi_world"], ng)
        le = scene.emitters.radiance[jnp.maximum(em_id, 0)]
        le = jnp.where(((em_id >= 0) & (cos_l > 0))[:, None], le, 0.0)
        k_hit = t + 1
        # uniform strategy weight 1/k; specular-prefix paths can only be
        # produced by the hit strategy -> weight 1 (delta override)
        w_hit = jnp.where(prev_delta, 1.0, 1.0 / k_hit)
        L = L + jnp.where((active & its.valid)[:, None],
                          beta * le * w_hit[:, None], 0.0)
        active = active & its.valid

        sp = bsdflib.gather_shade_point(scene, si["mat"], si["uv"])

        # --- M cache connections ----------------------------------------
        for j in range(M):
            uj = bounce_u(t, 8 + 2 * j)
            vidx = jnp.minimum((uj * V).astype(jnp.int32), V - 1)
            lp = cache.pos[vidx]
            lns = cache.ns[vidx]
            lbeta = cache.beta[vidx]
            lmat = cache.mat[vidx]
            ldepth = cache.depth[vidx]
            lvalid = cache.valid[vidx]
            to_l = lp - p
            d2 = jnp.maximum(m.dot(to_l, to_l), 1e-12)
            dist = jnp.sqrt(d2)
            cdir = to_l / dist[:, None]

            # eye side: f*cos toward the light vertex
            wo_local = m.to_local(ns, cdir)
            f_e, _ = bsdflib.eval_pdf(sp, wi_local, wo_local, families)

            # light side: emitter vertex -> cosine only; surface vertex ->
            # f*cos between stored wi and -cdir
            is_emit = lmat < 0
            cos_light_emit = jnp.maximum(m.dot(lns, -cdir), 0.0)
            l_wi_local = m.to_local(lns, cache.wi[vidx])
            l_wo_local = m.to_local(lns, -cdir)
            sp_l = bsdflib.gather_shade_point(
                scene, jnp.maximum(lmat, 0), cache.uv[vidx]
            )
            f_l, _ = bsdflib.eval_pdf(sp_l, l_wi_local, l_wo_local, families)
            light_term = jnp.where(
                is_emit[:, None], cos_light_emit[:, None] * jnp.ones(3), f_l
            )

            k = t + 1 + ldepth + 1  # eye edges + connection + light edges
            contrib = (
                beta * f_e * light_term * lbeta
                * (jnp.float32(V) / (M * n_paths) / d2 / k.astype(jnp.float32))[:, None]
            )
            ok = (active & lvalid & (jnp.max(contrib, -1) > 0.0))
            blocked = trace.shadow_blocked(scene, p, cdir, dist,
                                           cfg.occupancy_shadows)
            L = L + jnp.where((ok & ~blocked)[:, None], contrib, 0.0)

        # --- continue the eye walk ---------------------------------------
        if t == cfg.max_depth - 1:
            break
        wo, wgt, pdf, is_delta = bsdflib.sample(
            sp, wi_local, bounce_u(t, 3),
            jnp.stack([bounce_u(t, 4), bounce_u(t, 5)], -1), families,
        )
        d_new = m.to_world(ns, wo)
        beta_new = beta * wgt
        alive = active & (pdf > 0) & (jnp.max(beta_new, -1) > 0)
        q = jax.lax.stop_gradient(jnp.clip(jnp.max(beta_new, -1), 0.05, 0.95))
        do_rr = t >= (cfg.rr_depth - 1)
        survive = jnp.where(do_rr, bounce_u(t, 6) < q, True)
        beta = jnp.where(
            (alive & survive)[:, None],
            beta_new / jnp.where(do_rr, q, 1.0)[:, None], 0.0,
        )
        active = alive & survive
        o = p + ng * jnp.where(m.dot(d_new, ng) > 0, RAY_EPS, -RAY_EPS)[:, None]
        d = jnp.where(active[:, None], d_new, d)
        prev_delta = is_delta

    return L

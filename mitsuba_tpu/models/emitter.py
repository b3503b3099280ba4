"""Emitter sampling: area lights (emissive triangles) + constant environment.

TPU-native analog of Scene::sampleEmitterDirect / pdfEmitterDirect
(include/mitsuba/render/scene.h:482-886) and the area emitter plugin
(src/emitters/area.cpp): NEE draws an emissive triangle from a luminance-
weighted CDF, a uniform point on it, and converts the area pdf to solid
angle. Everything is batched; the "which emitter" choice is a searchsorted
over the CDF (one gather, no divergence).

Sampled quantities stay consistent with in-trace vertex positions so values
remain correct if vertices are perturbed (pdfs recomputed from live
geometry, only the *selection probabilities* are host-precomputed).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core import warp


class DirectSample(NamedTuple):
    """Result of sampling a direction toward an emitter from `ref_p`
    (analog of DirectSamplingRecord, emitter.h:190-278)."""

    d: jax.Array          # (N,3) unit direction ref -> light
    dist: jax.Array       # (N,)
    radiance: jax.Array   # (N,3) emitted radiance toward ref (delta lights
    #                       fold I/d^2 etc. in here)
    pdf: jax.Array        # (N,) solid-angle pdf x selection prob (0=invalid)
    is_env: jax.Array     # (N,) bool
    is_delta: jax.Array   # (N,) bool — MIS weight must be 1 (point/spot/
    #                       directional can't be BSDF-sampled, emitter.h)


# Probability of choosing the environment vs area lights when both exist.
# The reference importance-samples emitters by power (scene.cpp:131); a
# fixed split keeps the pdf simple and is harmless with MIS.
ENV_SELECT_P = 0.5


def _group_probs(scene):
    """Static selection probabilities of the (area, env, delta) groups —
    present groups split uniformly (the pdf is exact, just not
    power-weighted; MIS makes the split harmless)."""
    has_delta = scene.delta_emitters is not None
    groups = int(scene.has_area) + int(scene.has_env) + int(has_delta)
    p = 1.0 / max(groups, 1)
    return (p if scene.has_area else 0.0,
            p if scene.has_env else 0.0,
            p if has_delta else 0.0)


def sample_direct(scene, ref_p: jax.Array, u3: jax.Array) -> DirectSample:
    """u3: (N,3) uniforms -> (emitter choice, point-on-emitter)."""
    n = ref_p.shape[0]
    em = scene.emitters
    pg_area, env_p, p_delta = _group_probs(scene)
    # slot layout over u3[...,0]: [0, env_p) env | [env_p, env_p+p_delta)
    # delta | rest area
    pick_env = (u3[..., 0] < env_p) if scene.has_env else jnp.zeros((n,), bool)
    pick_delta = (
        (u3[..., 0] >= env_p) & (u3[..., 0] < env_p + p_delta)
        if scene.delta_emitters is not None else jnp.zeros((n,), bool)
    )
    u_sel = jnp.clip(
        (u3[..., 0] - env_p - p_delta) / max(pg_area, 1e-9), 0.0, 1.0
    )

    # --- area emitter branch -------------------------------------------
    from ..ops.gather import fetch_packed

    idx = jnp.clip(
        jnp.searchsorted(em.tri_cdf, u_sel, side="left"),
        0,
        em.tri_cdf.shape[0] - 1,
    ).astype(jnp.int32)
    p0_all, e1_all, e2_all = scene.tri_vertices()
    # per-emissive-triangle table (tiny), fetched with one matmul
    (p0t, e1t, e2t, radt, selt) = fetch_packed(
        [
            p0_all[em.tri_index],
            e1_all[em.tri_index],
            e2_all[em.tri_index],
            em.radiance[em.tri_emitter],
            em.tri_pdf[:, None],
        ],
        idx,
    )
    sel_pdf = selt[:, 0]
    b = warp.square_to_uniform_triangle(u3[..., 1:3])
    pos = p0t + e1t * b[..., 0:1] + e2t * b[..., 1:2]
    ngv = jnp.cross(e1t, e2t)
    two_a = m.length(ngv)
    ng = ngv / two_a[:, None]
    area = 0.5 * two_a
    to_light = pos - ref_p
    dist = m.length(to_light)
    d = to_light / dist[:, None]
    cos_l = m.dot(ng, -d)
    # area pdf -> solid angle (emitter.h pdfDirect conversion)
    p_area = m.safe_div(sel_pdf, area)
    pdf_area_sa = m.safe_div(p_area * dist * dist, jnp.abs(cos_l))
    rad = radt
    # one-sided area emitters: only the front face emits (area.cpp:113)
    front = cos_l > 1e-6
    pdf_area_sa = jnp.where(front, pdf_area_sa, 0.0)
    rad = jnp.where(front[:, None], rad, 0.0)

    pdf = pdf_area_sa * pg_area
    is_delta = jnp.zeros((n,), bool)

    # --- delta emitter branch (point/spot/directional) ------------------
    if scene.delta_emitters is not None:
        de = scene.delta_emitters
        from ..scene import ir as _ir

        k = de.kind.shape[0]
        which = jnp.minimum((u3[..., 1] * k).astype(jnp.int32), k - 1)
        kind = de.kind[which]
        lp = de.position[which]
        ldir = de.direction[which]
        inten = de.intensity[which]
        cut = de.cutoff[which]

        to_l = lp - ref_p
        dist_d = m.length(to_l)
        d_pos = to_l / jnp.maximum(dist_d, 1e-12)[:, None]
        inv_d2 = m.safe_div(1.0, dist_d * dist_d)
        # spot falloff (spot.cpp falloffCurve): 1 inside beamWidth, smooth
        # to 0 at cutoffAngle
        cos_spot = m.dot(-d_pos, ldir)
        fall = jnp.clip(
            m.safe_div(cos_spot - cut[..., 0], jnp.maximum(cut[..., 1] - cut[..., 0], 1e-6)),
            0.0, 1.0,
        )
        rad_point = inten * inv_d2[:, None]
        rad_spot = rad_point * fall[:, None]
        is_dirl = kind == _ir.DELTA_DIRECTIONAL
        d_delta = jnp.where(is_dirl[:, None], -ldir, d_pos)
        dist_delta = jnp.where(is_dirl, m.INF * 0.1, dist_d)
        rad_delta = jnp.where(
            (kind == _ir.DELTA_SPOT)[:, None], rad_spot,
            jnp.where(is_dirl[:, None], inten, rad_point),
        )
        sel = p_delta / k
        d = jnp.where(pick_delta[:, None], d_delta, d)
        dist = jnp.where(pick_delta, dist_delta, dist)
        rad = jnp.where(pick_delta[:, None], rad_delta, rad)
        pdf = jnp.where(pick_delta, sel, pdf)
        is_delta = pick_delta

    # --- environment branch --------------------------------------------
    if scene.has_env:
        if scene.envmap is not None:
            from ..scene import envmap as envlib

            d_env, pdf_env, rad_env = envlib.sample_direction(
                scene.envmap, u3[..., 1:3]
            )
        else:
            d_env = warp.square_to_uniform_sphere(u3[..., 1:3])
            pdf_env = jnp.full((n,), warp.square_to_uniform_sphere_pdf())
            rad_env = jnp.broadcast_to(scene.env_radiance, (n, 3))
        d = jnp.where(pick_env[:, None], d_env, d)
        dist = jnp.where(pick_env, m.INF * 0.1, dist)
        rad = jnp.where(pick_env[:, None], rad_env, rad)
        pdf = jnp.where(pick_env, pdf_env * env_p, pdf)
    return DirectSample(d=d, dist=dist, radiance=rad, pdf=pdf,
                        is_env=pick_env, is_delta=is_delta)


def pdf_direct_area(scene, ref_p, d, dist, prim, cos_l) -> jax.Array:
    """Solid-angle pdf that sample_direct would have produced direction `d`
    hitting triangle `prim` at distance `dist` (for MIS on BSDF samples).
    Mirrors Scene::pdfEmitterDirect (scene.h:577)."""
    from ..ops.gather import fetch_packed

    em = scene.emitters
    _, e1, e2 = scene.tri_vertices()
    area_all = 0.5 * m.length(jnp.cross(e1, e2))   # (T,) — O(T), cheap
    (selt, areat) = fetch_packed(
        [em.select_pdf_full[:, None], area_all[:, None]], prim
    )
    p_area = m.safe_div(selt[:, 0], areat[:, 0])
    pdf = m.safe_div(p_area * dist * dist, jnp.abs(cos_l))
    pg_area, _, _ = _group_probs(scene)
    return pdf * pg_area


def pdf_direct_env(scene, d: jax.Array) -> jax.Array:
    """Solid-angle pdf of sample_direct's env branch for direction d
    (MIS weight for BSDF samples that escape)."""
    if not scene.has_env:
        return jnp.zeros(d.shape[:-1], jnp.float32)
    _, env_p, _ = _group_probs(scene)
    if scene.envmap is not None:
        from ..scene import envmap as envlib

        return envlib.pdf_direction(scene.envmap, d) * env_p
    return jnp.full(
        d.shape[:-1], warp.square_to_uniform_sphere_pdf() * env_p
    )


def env_radiance(scene, d: jax.Array) -> jax.Array:
    """Environment emission for escaped rays (constant.cpp / envmap.cpp)."""
    if not scene.has_env:
        return jnp.zeros(d.shape[:-1] + (3,), d.dtype)
    if scene.envmap is not None:
        from ..scene import envmap as envlib

        return envlib.eval_radiance(scene.envmap, d)
    return jnp.broadcast_to(scene.env_radiance, d.shape[:-1] + (3,))

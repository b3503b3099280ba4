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
    radiance: jax.Array   # (N,3) emitted radiance toward ref
    pdf: jax.Array        # (N,) solid-angle pdf (0 = invalid)
    is_env: jax.Array     # (N,) bool


# Probability of choosing the environment vs area lights when both exist.
# The reference importance-samples emitters by power (scene.cpp:131); a
# fixed split keeps the pdf simple and is harmless with MIS.
ENV_SELECT_P = 0.5


def sample_direct(scene, ref_p: jax.Array, u3: jax.Array) -> DirectSample:
    """u3: (N,3) uniforms -> (emitter choice, point-on-triangle)."""
    n = ref_p.shape[0]
    em = scene.emitters
    env_p = ENV_SELECT_P if scene.has_env else 0.0
    # If the scene has no area emitters at all the CDF table is a dummy;
    # detect via select_pdf_full being all zeros (static shape, traced value
    # only matters through pdf=0 lanes).
    pick_env = u3[..., 0] < env_p if scene.has_env else jnp.zeros((n,), bool)
    u_sel = jnp.where(pick_env, 0.0, (u3[..., 0] - env_p) / max(1.0 - env_p, 1e-9))

    # --- area emitter branch -------------------------------------------
    idx = jnp.clip(
        jnp.searchsorted(em.tri_cdf, u_sel, side="left"),
        0,
        em.tri_cdf.shape[0] - 1,
    ).astype(jnp.int32)
    tri = em.tri_index[idx]
    sel_pdf = em.tri_pdf[idx]
    p0, e1, e2 = scene.tri_vertices()
    b = warp.square_to_uniform_triangle(u3[..., 1:3])
    pos = p0[tri] + e1[tri] * b[..., 0:1] + e2[tri] * b[..., 1:2]
    ngv = jnp.cross(e1[tri], e2[tri])
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
    rad = em.radiance[em.tri_emitter[idx]]
    # one-sided area emitters: only the front face emits (area.cpp:113)
    front = cos_l > 1e-6
    pdf_area_sa = jnp.where(front, pdf_area_sa, 0.0)
    rad = jnp.where(front[:, None], rad, 0.0)

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
        pdf = jnp.where(
            pick_env, pdf_env * env_p, pdf_area_sa * (1.0 - env_p)
        )
    else:
        pdf = pdf_area_sa
    return DirectSample(d=d, dist=dist, radiance=rad, pdf=pdf, is_env=pick_env)


def pdf_direct_area(scene, ref_p, d, dist, prim, cos_l) -> jax.Array:
    """Solid-angle pdf that sample_direct would have produced direction `d`
    hitting triangle `prim` at distance `dist` (for MIS on BSDF samples).
    Mirrors Scene::pdfEmitterDirect (scene.h:577)."""
    em = scene.emitters
    sel_pdf = em.select_pdf_full[prim]
    _, e1, e2 = scene.tri_vertices()
    area = 0.5 * m.length(jnp.cross(e1[prim], e2[prim]))
    p_area = m.safe_div(sel_pdf, area)
    pdf = m.safe_div(p_area * dist * dist, jnp.abs(cos_l))
    env_p = ENV_SELECT_P if scene.has_env else 0.0
    return pdf * (1.0 - env_p)


def pdf_direct_env(scene, d: jax.Array) -> jax.Array:
    """Solid-angle pdf of sample_direct's env branch for direction d
    (MIS weight for BSDF samples that escape)."""
    if not scene.has_env:
        return jnp.zeros(d.shape[:-1], jnp.float32)
    if scene.envmap is not None:
        from ..scene import envmap as envlib

        return envlib.pdf_direction(scene.envmap, d) * ENV_SELECT_P
    return jnp.full(
        d.shape[:-1], warp.square_to_uniform_sphere_pdf() * ENV_SELECT_P
    )


def env_radiance(scene, d: jax.Array) -> jax.Array:
    """Environment emission for escaped rays (constant.cpp / envmap.cpp)."""
    if not scene.has_env:
        return jnp.zeros(d.shape[:-1] + (3,), d.dtype)
    if scene.envmap is not None:
        from ..scene import envmap as envlib

        return envlib.eval_radiance(scene.envmap, d)
    return jnp.broadcast_to(scene.env_radiance, d.shape[:-1] + (3,))

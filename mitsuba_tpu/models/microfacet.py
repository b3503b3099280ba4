"""Microfacet distributions (Beckmann + GGX) with Smith shadowing.

TPU-native analog of the reference's MicrofacetDistribution
(src/bsdfs/microfacet.h: EBeckmann/EGGX, eval/sample/pdf/smithG1). All
functions are batched over local-frame directions; the distribution code is
a per-ray integer selected with masks (no divergence).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core import warp

INV_PI = 1.0 / jnp.pi


def d_eval(dist: jax.Array, alpha: jax.Array, h: jax.Array) -> jax.Array:
    """Normal distribution function D(h). dist: 0=Beckmann, 1=GGX."""
    ct = m.cos_theta(h)
    ct2 = ct * ct
    a2 = alpha * alpha
    t2 = m.safe_div(jnp.maximum(1.0 - ct2, 0.0), ct2)
    beck = m.safe_div(jnp.exp(-t2 / a2), jnp.pi * a2 * ct2 * ct2)
    root = ct2 * (a2 - 1.0) + 1.0
    ggx = m.safe_div(a2, jnp.pi * root * root)
    d = jnp.where(dist == 1, ggx, beck)
    return jnp.where(ct > 0.0, d, 0.0)


def smith_g1(dist: jax.Array, alpha: jax.Array, v: jax.Array, h: jax.Array) -> jax.Array:
    """Smith masking term G1(v, h) (microfacet.h:smithG1)."""
    cv = m.cos_theta(v)
    # sidedness check: v must be on the same side as h
    chi = (m.dot(v, h) * cv) > 0.0
    tan_t = jnp.abs(m.tan_theta(v))
    a = m.safe_div(1.0, alpha * tan_t)
    # Beckmann rational approximation (Walter et al.)
    beck = jnp.where(
        a < 1.6,
        (3.535 * a + 2.181 * a * a) / (1.0 + 2.276 * a + 2.577 * a * a),
        1.0,
    )
    at2 = (alpha * tan_t) ** 2
    ggx = 2.0 / (1.0 + jnp.sqrt(1.0 + at2))
    g = jnp.where(dist == 1, ggx, beck)
    g = jnp.where(tan_t < 1e-9, 1.0, g)
    return jnp.where(chi, g, 0.0)


def g_eval(dist, alpha, wi, wo, h):
    """Separable Smith G(wi, wo, h) = G1(wi) G1(wo) (microfacet.h:G)."""
    return smith_g1(dist, alpha, wi, h) * smith_g1(dist, alpha, wo, h)


def sample(dist: jax.Array, alpha: jax.Array, u: jax.Array):
    """Sample a microfacet normal ~ D(h) cos(h); returns (h, pdf).

    Non-visible-normal sampling (the reference's sampleVisible=false path,
    microfacet.h:sampleAll); VNDF is a later optimization.
    """
    hb = warp.square_to_beckmann(u, alpha)
    hg = warp.square_to_ggx(u, alpha)
    h = jnp.where((dist == 1)[..., None], hg, hb)
    return h, pdf(dist, alpha, h)


def pdf(dist: jax.Array, alpha: jax.Array, h: jax.Array) -> jax.Array:
    """pdf of `sample` in solid angle of h: D(h) * cos_theta(h)."""
    return d_eval(dist, alpha, h) * jnp.maximum(m.cos_theta(h), 0.0)

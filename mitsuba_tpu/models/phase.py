"""Phase functions: isotropic + Henyey-Greenstein (+ Rayleigh).

TPU-native analog of src/phase/{isotropic.cpp,hg.cpp,rayleigh.cpp} and the
PhaseFunction interface (include/mitsuba/render/phase.h:117,146-177).
Directions follow the flow convention: `wi` points toward the incoming
direction's origin (like BSDF wi), `wo` is the outgoing scatter direction;
HG's cos(theta) is taken between -wi and wo (forward scattering g > 0).
All functions are batched; g is per-lane so mixed media evaluate in one
pass with masks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as m

INV_FOURPI = 1.0 / (4.0 * jnp.pi)

PHASE_ISOTROPIC = 0
PHASE_HG = 1
PHASE_RAYLEIGH = 2


def hg_eval(g: jax.Array, cos_theta: jax.Array) -> jax.Array:
    """HG density (hg.cpp eval): p(cos) = (1-g^2) / (4pi (1+g^2-2g cos)^1.5)."""
    g2 = g * g
    denom = 1.0 + g2 - 2.0 * g * cos_theta
    return INV_FOURPI * (1.0 - g2) / jnp.maximum(denom * jnp.sqrt(denom), 1e-12)


def rayleigh_eval(cos_theta: jax.Array) -> jax.Array:
    return (3.0 / (16.0 * jnp.pi)) * (1.0 + cos_theta * cos_theta)


def eval_pdf(kind: int, g: jax.Array, wi: jax.Array, wo: jax.Array):
    """Returns (value, pdf) — equal for isotropic/HG (perfect importance
    sampling); Rayleigh is sampled exactly too (inversion of the cubic)."""
    ct = m.dot(-wi, wo)
    if kind == PHASE_ISOTROPIC:
        v = jnp.full(ct.shape, INV_FOURPI)
        return v, v
    if kind == PHASE_HG:
        v = hg_eval(g, ct)
        return v, v
    if kind == PHASE_RAYLEIGH:
        v = rayleigh_eval(ct)
        return v, v
    raise ValueError(f"unknown phase kind {kind}")


def sample(kind: int, g: jax.Array, wi: jax.Array, u2: jax.Array):
    """Sample wo ~ phase(-wi, .). Returns (wo, pdf). Weight is always 1
    (phase functions normalize to 1 and we sample them exactly)."""
    if kind == PHASE_ISOTROPIC:
        z = 1.0 - 2.0 * u2[..., 0]
        r = m.safe_sqrt(1.0 - z * z)
        phi = 2.0 * jnp.pi * u2[..., 1]
        wo = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)
        return wo, jnp.full(u2.shape[:-1], INV_FOURPI)
    if kind == PHASE_HG:
        # hg.cpp:sample — exact inversion; isotropic limit for |g| -> 0
        g_safe = jnp.where(jnp.abs(g) < 1e-4, 1e-4, g)
        sqr = (1.0 - g_safe * g_safe) / (1.0 - g_safe + 2.0 * g_safe * u2[..., 0])
        ct_hg = (1.0 + g_safe * g_safe - sqr * sqr) / (2.0 * g_safe)
        ct = jnp.where(jnp.abs(g) < 1e-4, 1.0 - 2.0 * u2[..., 0], ct_hg)
        ct = jnp.clip(ct, -1.0, 1.0)
        st = m.safe_sqrt(1.0 - ct * ct)
        phi = 2.0 * jnp.pi * u2[..., 1]
        local = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], -1)
        wo = m.to_world(-wi, local)
        return wo, hg_eval(g, ct)
    if kind == PHASE_RAYLEIGH:
        # rayleigh.cpp: solve cubic z^3 + 3z = 4(1-2u) via Cardano
        z = 2.0 * (2.0 * u2[..., 0] - 1.0)
        w_ = z + jnp.sqrt(z * z + 1.0)
        cbrt = jnp.sign(w_) * jnp.abs(w_) ** (1.0 / 3.0)
        ct = jnp.clip(cbrt - 1.0 / cbrt, -1.0, 1.0)
        st = m.safe_sqrt(1.0 - ct * ct)
        phi = 2.0 * jnp.pi * u2[..., 1]
        local = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], -1)
        wo = m.to_world(-wi, local)
        return wo, rayleigh_eval(ct)
    raise ValueError(f"unknown phase kind {kind}")

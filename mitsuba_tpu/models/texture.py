"""Texture lookup over the scene's padded texture stack.

TPU-native replacement for the texture plugins (src/textures/{bitmap.cpp,
checkerboard.cpp,gridtexture.cpp,...} + the EWA mipmap, mipmap.h:91): all
bitmaps live in one (K, TH, TW, 3) array so a per-ray lookup is a single
gather; procedural checkerboard/grid textures are expressed as tiny
nearest-filtered bitmaps (exactly equivalent under uv tiling). Lookups are
differentiable w.r.t. texels — the path for texture gradients.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def resolve(scene, tex_id: jax.Array, uv: jax.Array, fallback: jax.Array) -> jax.Array:
    """Per-ray reflectance: texture sample where tex_id >= 0, else fallback.

    tex_id: (N,) int32; uv: (N,2); fallback: (N,3).
    """
    if scene.textures.shape[0] == 1 and scene.textures.shape[1] == 1:
        # No real textures in this scene: compile nothing.
        return fallback
    tid = jnp.maximum(tex_id, 0)
    value = sample_bilinear(scene, tid, uv)
    return jnp.where((tex_id >= 0)[..., None], value, fallback)


def sample_bilinear(scene, tid: jax.Array, uv: jax.Array) -> jax.Array:
    """Repeat-wrapped bilinear (or nearest) lookup. tid: (N,), uv: (N,2)."""
    xf = scene.tex_transform[tid]                       # (N,4)
    u = uv[..., 0] * xf[..., 0] + xf[..., 2]
    v = uv[..., 1] * xf[..., 1] + xf[..., 3]
    h = scene.tex_size[tid, 0].astype(jnp.float32)
    w = scene.tex_size[tid, 1].astype(jnp.float32)
    # uv -> continuous pixel coords, v flipped (image row 0 = top, v=1)
    x = u * w - 0.5
    y = (1.0 - v) * h - 0.5
    nearest = scene.tex_nearest[tid] == 1

    def wrap(i, n):
        return jnp.mod(i, jnp.maximum(n, 1)).astype(jnp.int32)

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f
    hn = scene.tex_size[tid, 0]
    wn = scene.tex_size[tid, 1]
    x0 = wrap(x0f.astype(jnp.int32), wn)
    x1 = wrap(x0f.astype(jnp.int32) + 1, wn)
    y0 = wrap(y0f.astype(jnp.int32), hn)
    y1 = wrap(y0f.astype(jnp.int32) + 1, hn)
    t = scene.textures
    c00 = t[tid, y0, x0]
    c01 = t[tid, y0, x1]
    c10 = t[tid, y1, x0]
    c11 = t[tid, y1, x1]
    bil = (
        c00 * ((1 - fx) * (1 - fy))[..., None]
        + c01 * (fx * (1 - fy))[..., None]
        + c10 * ((1 - fx) * fy)[..., None]
        + c11 * (fx * fy)[..., None]
    )
    # nearest: round instead of blend
    xn = wrap(jnp.round(x).astype(jnp.int32), wn)
    yn = wrap(jnp.round(y).astype(jnp.int32), hn)
    near = t[tid, yn, xn]
    return jnp.where(nearest[..., None], near, bil)


def checkerboard(color0, color1) -> dict:
    """Procedural checkerboard as a 2x2 nearest bitmap
    (src/textures/checkerboard.cpp semantics under repeat tiling)."""
    c0 = np.asarray(color0, np.float32)
    c1 = np.asarray(color1, np.float32)
    data = np.stack([np.stack([c0, c1]), np.stack([c1, c0])])
    return {"data": data, "nearest": True, "transform": (2.0, 2.0, 0.0, 0.0)}

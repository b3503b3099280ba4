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


def resolve(scene, tex_id: jax.Array, uv: jax.Array, fallback: jax.Array,
            footprint=None) -> jax.Array:
    """Per-ray reflectance: texture sample where tex_id >= 0, else fallback.

    tex_id: (N,) int32; uv: (N,2); fallback: (N,3). `footprint` (N,) is
    the world-space pixel footprint times the triangle's uv density
    (texels-per-pixel before the resolution factor); with mips built it
    selects the trilinear level (mipmap.h trilinear mode; EWA anisotropy
    is not implemented)."""
    if scene.textures.shape[0] == 1 and scene.textures.shape[1] == 1:
        # No real textures in this scene: compile nothing.
        return fallback
    tid = jnp.maximum(tex_id, 0)
    value = sample_bilinear(scene, tid, uv)
    if scene.tex_mips is not None and footprint is not None:
        value = _trilinear_blend(scene, tid, uv, value, footprint)
    return jnp.where((tex_id >= 0)[..., None], value, fallback)


def _trilinear_blend(scene, tid, uv, level0, footprint):
    """Blend the base-level bilinear sample with the mip strip according
    to lod = log2(texels per pixel). Level l >= 1 of texture k lives at
    x offset W*(1 - 2^(1-l)) in scene.tex_mips with size (h>>l, w>>l)."""
    w_tex = scene.tex_size[tid, 1].astype(jnp.float32)
    xf = scene.tex_transform[tid]
    # uv tiling multiplies the texel density
    tile = jnp.maximum(jnp.abs(xf[..., 0]), jnp.abs(xf[..., 1]))
    texels = jnp.maximum(footprint * w_tex * tile, 1e-8)
    lod = jnp.log2(texels)
    max_l = jnp.floor(jnp.log2(jnp.maximum(
        jnp.minimum(scene.tex_size[tid, 0],
                    scene.tex_size[tid, 1]).astype(jnp.float32), 1.0)))
    lod = jnp.clip(lod, 0.0, max_l - 1.0)
    l0 = jnp.floor(lod)
    frac = lod - l0

    def mip_sample(level):
        """Bilinear from the strip at integer level >= 1 (per-lane)."""
        lvl = jnp.maximum(level, 1.0)
        h = jnp.maximum(
            (scene.tex_size[tid, 0].astype(jnp.float32)
             / jnp.exp2(lvl)).astype(jnp.int32), 1)
        w = jnp.maximum(
            (scene.tex_size[tid, 1].astype(jnp.float32)
             / jnp.exp2(lvl)).astype(jnp.int32), 1)
        x_off = (scene.tex_size[tid, 1].astype(jnp.float32)
                 * (1.0 - jnp.exp2(1.0 - lvl))).astype(jnp.int32)
        u = uv[..., 0] * xf[..., 0] + xf[..., 2]
        v = uv[..., 1] * xf[..., 1] + xf[..., 3]
        x = u * w.astype(jnp.float32) - 0.5
        y = (1.0 - v) * h.astype(jnp.float32) - 0.5
        x0f = jnp.floor(x)
        y0f = jnp.floor(y)
        fx = x - x0f
        fy = y - y0f
        x0 = jnp.mod(x0f.astype(jnp.int32), w)
        x1 = jnp.mod(x0f.astype(jnp.int32) + 1, w)
        y0 = jnp.mod(y0f.astype(jnp.int32), h)
        y1 = jnp.mod(y0f.astype(jnp.int32) + 1, h)
        t = scene.tex_mips
        c00 = t[tid, y0, x_off + x0]
        c01 = t[tid, y0, x_off + x1]
        c10 = t[tid, y1, x_off + x0]
        c11 = t[tid, y1, x_off + x1]
        return (c00 * ((1 - fx) * (1 - fy))[..., None]
                + c01 * (fx * (1 - fy))[..., None]
                + c10 * ((1 - fx) * fy)[..., None]
                + c11 * (fx * fy)[..., None])

    lo = jnp.where((l0 < 1.0)[..., None], level0, mip_sample(l0))
    hi = mip_sample(l0 + 1.0)
    return lo * (1.0 - frac)[..., None] + hi * frac[..., None]


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

"""Fused Pallas TPU kernel for brute-force ray-triangle intersection.

The XLA GEMM formulation (intersect._chunk_hits_mxu) loses to HBM traffic:
the four (N, T) matmul outputs round-trip HBM before the elementwise
epilogue. This kernel keeps everything in VMEM per ray tile: four
(TILE, 16) @ (16, C) MXU matmuls, then the Moller-Trumbore epsilon tests,
key packing and the per-ray min-reduce run on the VPU over the same tile —
the only HBM traffic is the ray features in and one packed int32 key out.

This is the TPU analog of the reference's innermost SSE loop
(triaccel_sse.h): the per-triangle affine precompute (Wald TriAccel) lives
in the GEMM coefficient tables built by intersect._mxu_tables.

The search is not differentiated (callers recover t/barycentric gradients
via surface_interaction's differentiable recompute).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import intersect as I

TILE = 512

# Python-scalar twins of intersect.py's constants (Pallas kernels cannot
# close over traced jnp constants)
MISS_F = 2.0 ** 127
MISS_BITS = 0x7F000000  # float32 bit pattern of 2^127


# triangle 128-chunks processed per grid step (VMEM block: 16 x 4*SUB*chunk
# floats = 128 KB at chunk=128, SUB=4)
SUB = 4


def _kernel(chunk, phi_ref, tmax_ref, w_ref, key_ref, base_ref,
            acc_key, acc_base):
    """One (ray-tile, triangle-block) grid cell. The triangle axis is the
    innermost sequential grid dimension; the running best lives in VMEM
    scratch accumulators (persist across sequential grid steps — the
    canonical Mosaic reduction pattern; revisited *output* blocks proved
    unreliable on the real chip) and is flushed to the outputs on the
    last triangle step. Constant compile size and VMEM footprint for any
    triangle count, unlike the former fully-unrolled python loop (which
    at 69k tris emitted a 543-block kernel that effectively never
    finished compiling)."""
    k = pl.program_id(1)
    nk = pl.num_programs(1)
    phi = phi_ref[:]                      # (TILE, 16)
    tmax = tmax_ref[:]                    # (TILE, 1)
    lane_mask = jnp.int32(I.LANE_MASK)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (TILE, chunk), 1)
    miss_key = MISS_BITS | I.LANE_MASK

    @pl.when(k == 0)
    def _init():
        acc_key[:] = jnp.full((TILE, 1), miss_key, jnp.int32)
        acc_base[:] = jnp.zeros((TILE, 1), jnp.int32)

    best_key = acc_key[:]
    best_base = acc_base[:]
    for s in range(SUB):
        # one (TILE,16)@(16,4C) MXU pass: [det | t | u | v] blocks.
        # HIGHEST: f32 via multi-pass MXU — the default single bf16 pass
        # loses ~8 mantissa bits, which breaks Moller-Trumbore on meshes
        # with small triangles (bunny: 16% of closest hits wrong)
        out = jnp.dot(phi, w_ref[:, s * 4 * chunk:(s + 1) * 4 * chunk],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        det = out[:, 0 * chunk:1 * chunk]
        t_num = out[:, 1 * chunk:2 * chunk]
        u_num = out[:, 2 * chunk:3 * chunk]
        v_num = out[:, 3 * chunk:4 * chunk]
        bad = jnp.abs(det) < 1e-12
        inv_det = jnp.where(bad, 0.0, 1.0 / jnp.where(bad, 1.0, det))
        u = u_num * inv_det
        v = v_num * inv_det
        t = t_num * inv_det
        hit = (
            (u >= -I.BARY_EPS) & (v >= -I.BARY_EPS)
            & (u + v <= 1.0 + I.BARY_EPS)
            & (t > I.SHADOW_EPS) & (t < tmax) & ~bad
        )
        t = jnp.where(hit, t, MISS_F)
        key = (jax.lax.bitcast_convert_type(t, jnp.int32)
               & jnp.int32(~lane_mask)) | lanes
        ckey = jnp.min(key, axis=1, keepdims=True)
        better = ckey < best_key
        best_key = jnp.where(better, ckey, best_key)
        best_base = jnp.where(better, (k * SUB + s) * chunk, best_base)
    acc_key[:] = best_key
    acc_base[:] = best_base

    @pl.when(k == nk - 1)
    def _flush():
        key_ref[:] = acc_key[:]
        base_ref[:] = acc_base[:]


def _run(scene, o, d, tmax, chunk):
    (w_det, w_t, w_u, w_v), nchunks = I._mxu_tables(scene, chunk)
    # pad the chunk count to a SUB multiple (zero columns -> det=0 -> miss)
    nsteps = -(-nchunks // SUB)
    cpad = nsteps * SUB * chunk - nchunks * chunk
    if cpad:
        z = jnp.zeros((16, cpad), w_det.dtype)
        w_det, w_t, w_u, w_v = (jnp.concatenate([a, z], 1)
                                for a in (w_det, w_t, w_u, w_v))
    # interleave per chunk: [det_c | t_c | u_c | v_c] for each chunk c
    blocks = []
    for ci in range(nsteps * SUB):
        sl = slice(ci * chunk, (ci + 1) * chunk)
        blocks += [w_det[:, sl], w_t[:, sl], w_u[:, sl], w_v[:, sl]]
    w = jax.lax.stop_gradient(jnp.concatenate(blocks, axis=1))  # (16, 4T')
    phi = jax.lax.stop_gradient(I._phi(o, d))
    n = o.shape[0]
    pad = (-n) % TILE
    if pad:
        phi = jnp.concatenate([phi, jnp.zeros((pad, 16), phi.dtype)], 0)
        tmax = jnp.concatenate([tmax, jnp.zeros((pad,), tmax.dtype)], 0)
    npad = phi.shape[0]

    grid = (npad // TILE, nsteps)
    wcols = 4 * SUB * chunk
    key, base = pl.pallas_call(
        partial(_kernel, chunk),
        out_shape=(
            jax.ShapeDtypeStruct((npad, 1), jnp.int32),
            jax.ShapeDtypeStruct((npad, 1), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, 16), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, wcols), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE, 1), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE, 1), jnp.int32),
            pltpu.VMEM((TILE, 1), jnp.int32),
        ],
        # the triangle axis carries a scratch accumulator: sequential;
        # ray tiles are independent
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.PARALLEL, pltpu.ARBITRARY)),
    )(phi, tmax[:, None], w)
    return key[:n, 0], base[:n, 0]


def closest_key(scene, o, d, tmax, chunk):
    """Returns packed (key, chunk_base) int32 arrays (see intersect.py)."""
    return _run(scene, o, d, tmax, chunk)


def any_hit(scene, o, d, tmax, chunk=I.CHUNK):
    """Occlusion via the same kernel: blocked iff the best key is a hit
    within tmax*(1-eps)."""
    limit = tmax * (1.0 - I.SHADOW_EPS)
    key, _ = _run(scene, o, d, limit, chunk)
    best_t = jax.lax.bitcast_convert_type(
        key & jnp.int32(~I.LANE_MASK), jnp.float32
    )
    return best_t < I.MISS

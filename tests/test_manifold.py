"""Specular manifold walk (SpecularManifold, manifold.cpp) validation.

Analytic fixtures: flat mirror (closed-form reflection point), flat glass
slab (Snell at both interfaces + parallel exit direction), tessellated
sphere mirror (convergence + reflection law), and the generalized
geometric term against the classical cos cos / d^2 and the mirror-
unfolding closed form.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_tpu.core import math as m
from mitsuba_tpu.ops import manifold
from mitsuba_tpu.scene import ir, shapes

MIRROR = {"type": ir.BSDF_CONDUCTOR, "eta": [0.2, 0.92, 1.1],
          "k": [3.9, 2.45, 2.14], "specular": [1.0, 1.0, 1.0]}
GLASS = {"type": ir.BSDF_DIELECTRIC, "eta": [1.5, 1.5, 1.5],
         "specular": [1.0, 1.0, 1.0], "reflectance": [1.0, 1.0, 1.0]}
WHITE = {"type": ir.BSDF_DIFFUSE, "reflectance": [0.7, 0.7, 0.7]}


def _quad(z, scale=10.0, flip=False):
    v, f, n, uv = shapes.rectangle()
    v = v * scale
    v[:, 2] = z
    if flip:
        f = f[:, ::-1]
        n = -n
    return v, f, n, uv


def _assemble(parts, mats):
    """parts: list of (verts, faces, normals, mat_id)."""
    verts, faces, normals, tri_mat = [], [], [], []
    base = 0
    for v, f, n, mid in parts:
        verts.append(v)
        faces.append(f + base)
        normals.append(n)
        tri_mat += [mid] * len(f)
        base += len(v)
    return ir.build_scene(
        np.concatenate(verts), np.concatenate(faces),
        np.asarray(tri_mat, np.int32), mats,
        normals=np.concatenate(normals))


def mirror_floor_scene():
    """Mirror plane z=0, diffuse receiver plane z=2 (faces down)."""
    v0, f0, n0, _ = _quad(0.0)
    v1, f1, n1, _ = _quad(2.0, flip=True)
    return _assemble([(v0, f0, n0, 0), (v1, f1, n1, 1)], [MIRROR, WHITE])


def test_flat_mirror_walk_matches_closed_form():
    scene = mirror_floor_scene()
    n = 8
    rng = np.random.default_rng(3)
    x0 = np.column_stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                          rng.uniform(0.5, 1.5, n)]).astype(np.float32)
    tgt = np.column_stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                           np.full(n, 2.0)]).astype(np.float32)
    # start the chain somewhere wrong on the mirror
    x1 = np.column_stack([rng.uniform(-0.5, 0.5, n),
                          rng.uniform(-0.5, 0.5, n),
                          np.zeros(n)]).astype(np.float32)
    modes = jnp.zeros((n, 1), jnp.int32)
    m_len = jnp.ones((n,), jnp.int32)
    res = manifold.walk(scene, jnp.asarray(x0), jnp.asarray(x1), modes,
                        m_len, jnp.asarray(tgt))
    assert bool(res.ok.all()), np.asarray(res.ok)
    assert np.allclose(np.asarray(res.end_pos), tgt, atol=2e-3)
    # closed form: reflect x0 below the plane, intersect the line with z=0
    x0m = x0 * np.asarray([1, 1, -1])
    s = (0.0 - x0m[:, 2]) / (tgt[:, 2] - x0m[:, 2])
    p_ref = x0m + s[:, None] * (tgt - x0m)
    assert np.allclose(np.asarray(res.chain_pos[:, 0]), p_ref, atol=2e-3)


def glass_slab_scene(thick=0.3):
    """Glass slab [-thick, 0], diffuse floor z=-2."""
    v0, f0, n0, _ = _quad(0.0)                       # top face, +z outward
    v1, f1, n1, _ = _quad(-thick, flip=True)         # bottom face, -z out
    v2, f2, n2, _ = _quad(-2.0)                      # floor, +z
    return _assemble([(v0, f0, n0, 0), (v1, f1, n1, 0), (v2, f2, n2, 1)],
                     [GLASS, WHITE])


def test_glass_slab_refraction_chain():
    scene = glass_slab_scene()
    n = 6
    rng = np.random.default_rng(5)
    x0 = np.column_stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                          np.full(n, 1.0)]).astype(np.float32)
    tgt = np.column_stack([rng.uniform(-1.5, 1.5, n),
                           rng.uniform(-1.5, 1.5, n),
                           np.full(n, -2.0)]).astype(np.float32)
    x1 = np.zeros((n, 3), np.float32)            # slab top at the origin
    modes = jnp.ones((n, 2), jnp.int32)          # refract, refract
    m_len = jnp.full((n,), 2, jnp.int32)
    res = manifold.walk(scene, jnp.asarray(x0), jnp.asarray(x1), modes,
                        m_len, jnp.asarray(tgt))
    assert bool(res.ok.all())
    end = np.asarray(res.end_pos)
    assert np.allclose(end, tgt, atol=3e-3)
    # flat-slab property: direction below the slab is PARALLEL to the
    # direction above it (lateral shift only)
    p1 = np.asarray(res.chain_pos[:, 0])
    p2 = np.asarray(res.chain_pos[:, 1])
    d_in = p1 - x0
    d_out = end - p2
    d_in /= np.linalg.norm(d_in, axis=1, keepdims=True)
    d_out /= np.linalg.norm(d_out, axis=1, keepdims=True)
    assert np.allclose(d_in, d_out, atol=2e-3)
    # Snell at the top interface: n_air sin_i = n_glass sin_t
    d_mid = p2 - p1
    d_mid /= np.linalg.norm(d_mid, axis=1, keepdims=True)
    sin_i = np.linalg.norm(d_in[:, :2], axis=1)
    sin_t = np.linalg.norm(d_mid[:, :2], axis=1)
    assert np.allclose(sin_i, 1.5 * sin_t, atol=2e-3)


def sphere_mirror_scene():
    """Mirror sphere r=0.5 at origin, diffuse receiver plane z=2."""
    vs, fs, ns, _ = shapes.sphere(center=(0, 0, 0), radius=0.5,
                                  rings=48, segments=96)
    v1, f1, n1, _ = _quad(2.0, flip=True)
    return _assemble([(vs, fs, ns, 0), (v1, f1, n1, 1)], [MIRROR, WHITE])


def test_sphere_mirror_walk_converges():
    scene = sphere_mirror_scene()
    n = 8
    rng = np.random.default_rng(11)
    x0 = np.column_stack([rng.uniform(-0.3, 0.3, n),
                          rng.uniform(-0.3, 0.3, n),
                          np.full(n, 1.5)]).astype(np.float32)
    tgt = np.column_stack([rng.uniform(-0.6, 0.6, n),
                           rng.uniform(-0.6, 0.6, n),
                           np.full(n, 2.0)]).astype(np.float32)
    # initial chain vertex: top of the sphere
    x1 = np.tile(np.asarray([[0.02, 0.01, 0.5]], np.float32), (n, 1))
    modes = jnp.zeros((n, 1), jnp.int32)
    m_len = jnp.ones((n,), jnp.int32)
    res = manifold.walk(scene, jnp.asarray(x0), jnp.asarray(x1), modes,
                        m_len, jnp.asarray(tgt))
    ok = np.asarray(res.ok)
    assert ok.mean() >= 0.75, ok            # a couple may leave the cap
    end = np.asarray(res.end_pos)[ok]
    assert np.allclose(end, tgt[ok], atol=5e-3)
    # reflection law at the converged chain vertex (against the exact
    # sphere normal, radius direction)
    p = np.asarray(res.chain_pos[:, 0])[ok]
    nrm = p / np.linalg.norm(p, axis=1, keepdims=True)
    wi = x0[ok] - p
    wo = tgt[ok] - p
    wi /= np.linalg.norm(wi, axis=1, keepdims=True)
    wo /= np.linalg.norm(wo, axis=1, keepdims=True)
    ci = (wi * nrm).sum(1)
    co = (wo * nrm).sum(1)
    assert np.allclose(ci, co, atol=5e-3)
    # half vector aligned with the normal
    h = wi + wo
    h /= np.linalg.norm(h, axis=1, keepdims=True)
    assert np.allclose(np.abs((h * nrm).sum(1)), 1.0, atol=1e-4)


def test_generalized_G_empty_chain_is_classical():
    scene = mirror_floor_scene()
    n = 5
    rng = np.random.default_rng(7)
    x0 = np.column_stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                          rng.uniform(0.5, 2.0, n)]).astype(np.float32)
    pb = np.column_stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                          np.zeros(n)]).astype(np.float32)
    d = pb - x0
    dist = np.linalg.norm(d, axis=1)
    d = (d / dist[:, None]).astype(np.float32)
    ns0 = np.tile(np.asarray([[0, 0, -1.0]], np.float32), (n, 1))
    chain_prim = jnp.zeros((n, 1), jnp.int32)        # unused (m_len=0)
    modes = jnp.zeros((n, 1), jnp.int32)
    m_len = jnp.zeros((n,), jnp.int32)
    end_prim = jnp.zeros((n,), jnp.int32)            # a floor triangle
    g = manifold.generalized_G(scene, jnp.asarray(x0), jnp.asarray(d),
                               chain_prim, modes, m_len, end_prim,
                               ns0=jnp.asarray(ns0))
    cos_a = np.abs(d[:, 2])
    cos_b = np.abs(d[:, 2])
    g_ref = cos_a * cos_b / dist ** 2
    assert np.allclose(np.asarray(g), g_ref, rtol=2e-3)


def test_generalized_G_flat_mirror_unfolding():
    """One flat mirror bounce: dA/dw = (d1+d2)^2 / cos_end, so the
    generalized G (no ns0) must equal cos_end / (d1+d2)^2."""
    scene = mirror_floor_scene()
    x0 = np.asarray([[0.2, -0.3, 1.0]], np.float32)
    p1 = np.asarray([[0.0, 0.0, 0.0]], np.float32)
    d = p1 - x0
    d1 = float(np.linalg.norm(d))
    d = (d / d1).astype(np.float32)
    # after the mirror the ray flies to the z=2 receiver
    d_ref = d * np.asarray([1, 1, -1], np.float32)
    d2 = float((2.0 - 0.0) / d_ref[0, 2])
    cos_end = abs(d_ref[0, 2])

    from mitsuba_tpu.ops import trace
    its = trace.closest_hit(scene, jnp.asarray(x0), jnp.asarray(d))
    assert bool(its.valid.all())
    chain_prim = its.prim.astype(jnp.int32)[:, None]
    its2 = trace.closest_hit(scene, jnp.asarray(p1 + 1e-3 * d_ref),
                             jnp.asarray(d_ref))
    assert bool(its2.valid.all())
    g = manifold.generalized_G(
        scene, jnp.asarray(x0), jnp.asarray(d), chain_prim,
        jnp.zeros((1, 1), jnp.int32), jnp.ones((1,), jnp.int32),
        its2.prim.astype(jnp.int32))
    g_ref = cos_end / (d1 + d2) ** 2
    assert np.isclose(float(g[0]), g_ref, rtol=3e-3)

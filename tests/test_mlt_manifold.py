"""Manifold MLT tier (mut_manifold.cpp / manifold.cpp): path-space MLT
on scenes with PURE-DELTA materials, validated against the path tracer.

These are the paths round 1's MLT excluded ("delta chains need the
manifold walk"): the extended target lives on the quotient manifold
(mlt._spec_eval / _chain_G_product), mutated by the manifold
perturbation kernel F plus chain-aware bidirectional regeneration.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_tpu.integrators import common, mlt, path
from mitsuba_tpu.scene import builtin, ir, shapes


def test_mlt_delta_mirror_caustic():
    """caustic_box with a PERFECT mirror: most energy arrives through a
    delta chain; must stay unbiased vs path."""
    scene, cam = builtin.caustic_box(width=12, height=12, rough=False)
    ref = np.asarray(common.render_jit(
        scene, cam, path.li, common.RenderConfig(spp=512, max_depth=4, seed=0)))
    img, stats = mlt.render_jit(
        scene, cam, common.RenderConfig(spp=1, max_depth=4, seed=5),
        n_chains=1 << 12, n_mutations=216, n_bootstrap=1 << 15,
        return_stats=True)
    img = np.asarray(img)
    assert np.isfinite(img).all() and img.min() >= 0
    rel = abs(img.mean() - ref.mean()) / max(ref.mean(), 1e-6)
    assert rel < 0.12, (img.mean(), ref.mean(), rel)
    acc = np.asarray(stats["acceptance"])
    assert acc.shape[0] == 6
    # the manifold kernel must actually move (mut_manifold acceptance)
    assert acc[5] > 0.05, acc


def glass_box(width=10, height=10):
    """Cornell-like box with a glass (smooth dielectric) sphere: SDS-style
    transport through refraction chains."""
    verts, tris, mats, tri_mat, tri_rad = [], [], [], [], {}

    def add_quad(p0, p1, p2, p3, mat_id, radiance=None):
        base = len(verts)
        verts.extend([p0, p1, p2, p3])
        for t in ([base, base + 1, base + 2], [base, base + 2, base + 3]):
            if radiance is not None:
                tri_rad[len(tris)] = radiance
            tris.append(t)
            tri_mat.append(mat_id)

    white = {"type": ir.BSDF_DIFFUSE, "reflectance": [0.7, 0.7, 0.7]}
    glass = {"type": ir.BSDF_DIELECTRIC, "eta": [1.5, 1.5, 1.5],
             "specular": [1.0, 1.0, 1.0], "reflectance": [1.0, 1.0, 1.0]}
    dark = {"type": ir.BSDF_DIFFUSE, "reflectance": [0.0, 0.0, 0.0]}
    mats.extend([white, glass, dark])

    add_quad([0, 0, 0], [0, 0, 1], [1, 0, 1], [1, 0, 0], 0)      # floor
    add_quad([0, 1, 0], [1, 1, 0], [1, 1, 1], [0, 1, 1], 0)      # ceiling
    add_quad([0, 0, 1], [0, 1, 1], [1, 1, 1], [1, 0, 1], 0)      # back
    add_quad([0, 0, 0], [0, 1, 0], [0, 1, 1], [0, 0, 1], 0)      # left
    add_quad([1, 0, 0], [1, 0, 1], [1, 1, 1], [1, 1, 0], 0)      # right
    add_quad([0.35, 0.999, 0.35], [0.65, 0.999, 0.35],
             [0.65, 0.999, 0.65], [0.35, 0.999, 0.65], 2,
             radiance=[40.0, 40.0, 40.0])                        # light

    v = np.asarray(verts, np.float32)
    f = np.asarray(tris, np.int32)
    sv, sf, sn, _ = shapes.sphere(center=(0.5, 0.45, 0.5), radius=0.22,
                                  rings=16, segments=24)
    normals = np.zeros_like(v)
    # quad normals: rebuilt by build_scene when None... supply area-weighted
    scene = ir.build_scene(
        np.concatenate([v, sv]),
        np.concatenate([f, sf + len(v)]),
        np.asarray(tri_mat + [1] * len(sf), np.int32),
        mats, tri_radiance=tri_rad)
    del normals
    from mitsuba_tpu.models import sensor as sensorlib
    cam = sensorlib.make_camera(
        origin=[0.5, 0.5, -1.4], target=[0.5, 0.5, 0.5],
        fov_x=39.3077, width=width, height=height)
    return scene, cam


def test_mlt_glass_sphere():
    """Smooth-dielectric refraction chains (enter+exit = 2-vertex chains):
    MLT with the manifold tier must match path tracing."""
    scene, cam = glass_box(width=10, height=10)
    ref = np.asarray(common.render_jit(
        scene, cam, path.li, common.RenderConfig(spp=768, max_depth=5, seed=0)))
    img = np.asarray(mlt.render_jit(
        scene, cam, common.RenderConfig(spp=1, max_depth=5, seed=7),
        n_chains=1 << 12, n_mutations=240, n_bootstrap=1 << 15))
    assert np.isfinite(img).all() and img.min() >= 0
    rel = abs(img.mean() - ref.mean()) / max(ref.mean(), 1e-6)
    assert rel < 0.15, (img.mean(), ref.mean(), rel)


def mirror_emitter_scene():
    """Mirror floor z=0, emissive ceiling z=2 (radiance downward)."""
    MIRROR = {"type": ir.BSDF_CONDUCTOR, "eta": [0.2, 0.92, 1.1],
              "k": [3.9, 2.45, 2.14], "specular": [1.0, 1.0, 1.0]}
    DARK = {"type": ir.BSDF_DIFFUSE, "reflectance": [0.0, 0.0, 0.0]}
    v0, f0, n0, _ = shapes.rectangle()
    v0 = v0 * 10.0
    v1 = v0.copy()
    v1[:, 2] = 2.0
    f1 = f0[:, ::-1]                    # ceiling faces down
    n1 = -n0
    verts = np.concatenate([v0, v1])
    faces = np.concatenate([f0, f1 + 4])
    normals = np.concatenate([n0, n1])
    le = np.asarray([3.0, 2.0, 1.0], np.float32)
    scene = ir.build_scene(
        verts, faces, np.asarray([0, 0, 1, 1], np.int32), [MIRROR, DARK],
        tri_radiance={2: le, 3: le}, normals=normals)
    from mitsuba_tpu.models import sensor as sensorlib
    cam = sensorlib.make_camera(
        origin=[0.0, 0.0, 1.0], target=[0.1, 0.0, 0.0],
        fov_x=60.0, width=16, height=16)
    return scene, cam, le


def test_eval_path_mirror_chain_analytic():
    """f* of an E -> mirror -> emitter path must equal the closed form
    We * F_conductor * G_gen * Le with G_gen = cos_end/(d1+d2)^2 (flat
    mirror unfolding) — validates the quotient-measure assembly
    (spec weights + chain generalized-G + dropped per-edge factors)."""
    from mitsuba_tpu.core import math as mm
    from mitsuba_tpu.ops import trace
    scene, cam, le = mirror_emitter_scene()
    K = 3
    eye = np.asarray(cam.to_world[:3, 3], np.float32)
    v1 = np.asarray([[0.08, 0.02, 0.0]], np.float32)   # on the mirror
    d1v = v1[0] - eye
    d1 = float(np.linalg.norm(d1v))
    dir1 = d1v / d1
    dref = dir1 * np.asarray([1, 1, -1], np.float32)   # reflected
    t2 = (2.0 - 0.0) / dref[2]
    v2 = v1[0] + t2 * dref
    d2 = float(np.linalg.norm(v2 - v1[0]))
    its1 = trace.closest_hit(scene, jnp.asarray(eye[None, :]),
                             jnp.asarray(dir1[None, :]))
    its2 = trace.closest_hit(scene, jnp.asarray(v1 + 1e-3 * dref),
                             jnp.asarray(dref[None, :]))
    assert bool(its1.valid.all()) and bool(its2.valid.all())

    pos = np.zeros((1, K + 1, 3), np.float32)
    pos[:, 0] = eye
    pos[:, 1] = v1
    pos[:, 2] = v2
    prim = np.full((1, K + 1), -1, np.int32)
    prim[:, 1] = np.asarray(its1.prim)
    prim[:, 2] = np.asarray(its2.prim)
    k = np.asarray([2], np.int32)
    f, lum, _ = mlt.eval_path(scene, cam, jnp.asarray(pos),
                              jnp.asarray(prim), jnp.asarray(k), K)
    f = np.asarray(f)[0]

    # closed form
    we, _ = mlt._cam_we(cam, jnp.asarray(dir1[None, :]))
    ci = abs(dir1[2])
    fcond = np.asarray(mm.fresnel_conductor(
        jnp.asarray([ci]), jnp.asarray([[0.2, 0.92, 1.1]]),
        jnp.asarray([[3.9, 2.45, 2.14]])))[0]
    cos_end = abs(dref[2])
    g_gen = cos_end / (d1 + d2) ** 2
    expect = float(we[0]) * fcond * g_gen * np.asarray(le)
    assert f.min() > 0
    assert np.allclose(f, expect, rtol=5e-3), (f, expect)

    # breaking the reflection law zeroes the target
    pos_bad = pos.copy()
    pos_bad[:, 2, 0] += 0.4
    f_bad, _, _ = mlt.eval_path(scene, cam, jnp.asarray(pos_bad),
                                jnp.asarray(prim), jnp.asarray(k), K)
    assert float(np.asarray(f_bad).max()) == 0.0

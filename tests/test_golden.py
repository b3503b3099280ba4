"""Golden-value forward validation: analytic scenes with closed-form
radiance asserted in absolute terms, plus checked-in golden images of the
BASELINE configurations at a fixed seed (regenerate intentionally with
tools/regen_golden.py after estimator changes).

Replaces the loose `0.03 < mean < 1.0` bounds criticized in round 1: a 2x
brightness bug now fails these within 1e-2 absolute.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.integrators import common, direct, path
from mitsuba_tpu.models import sensor as sensorlib
from mitsuba_tpu.scene import ir, shapes as shapelib

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def test_furnace_convex_diffuse():
    """Furnace test: a convex diffuse body under a constant environment
    L_e returns exactly rho * L_e (every bounce escapes to the env), and
    background pixels see L_e directly. Closed form — no reference binary
    needed (the analytic-validation strategy of test_irradiancemeter-like
    checks in newer Mitsubas)."""
    rho = 0.6
    L_e = 0.8
    v, f, n, uv = shapelib.sphere((0, 0, 0), 1.0)
    scene = ir.build_scene(
        v, f, np.zeros(len(f), np.int32),
        [{"type": ir.BSDF_DIFFUSE, "reflectance": [rho] * 3}],
        normals=n, uvs=uv, env_radiance=[L_e] * 3,
    )
    cam = sensorlib.make_camera([0, 0, -4], [0, 0, 0], fov_x=30,
                                width=24, height=24)
    cfg = common.RenderConfig(spp=256, max_depth=6, seed=1)
    img = np.asarray(common.render_jit(scene, cam, path.li, cfg))
    # center pixels view the sphere head-on; corner pixels see background
    center = img[10:14, 10:14].mean(-1)
    corner = np.stack([img[0, 0], img[0, -1], img[-1, 0], img[-1, -1]])
    assert np.allclose(corner, L_e, atol=1e-5), corner
    assert abs(center.mean() - rho * L_e) < 2e-3, (center.mean(), rho * L_e)
    assert np.allclose(center, rho * L_e, atol=2e-2), center


def test_disk_light_direct_closed_form():
    """Direct illumination of a diffuse floor point centered under a disk
    light: L = rho * L_e * r^2 / (r^2 + h^2) (exact disk form factor).
    Validates emitter sampling, NEE weights, and the cosine term to 1%
    absolute."""
    rho, L_e, r, h = 0.7, 5.0, 0.6, 1.5
    # floor quad at y=0 (normal +y), disk light at y=h facing down
    fv, ff, fn, fuv = shapelib.rectangle()
    # rectangle() is a z=0 quad; rotate to horizontal via transform
    rot = np.asarray([[1, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 0],
                      [0, 0, 0, 1]], np.float32)  # normal +z -> +y
    fv2, fn2 = shapelib.apply_transform(rot, fv, fn)
    dv, df, dn, duv = shapelib.disk()
    rot_down = np.asarray([[1, 0, 0, 0], [0, 0, -1, h], [0, 1, 0, 0],
                           [0, 0, 0, 1]], np.float32)  # normal -> -y
    dv2, dn2 = shapelib.apply_transform(rot_down, dv * r, dn)
    verts = np.concatenate([fv2, dv2]).astype(np.float32)
    tris = np.concatenate([ff, df + len(fv2)]).astype(np.int32)
    tri_mat = np.zeros(len(tris), np.int32)
    tri_rad = {int(len(ff) + i): np.asarray([L_e] * 3, np.float32)
               for i in range(len(df))}
    scene = ir.build_scene(
        verts, tris, tri_mat,
        [{"type": ir.BSDF_DIFFUSE, "reflectance": [rho] * 3}],
        tri_radiance=tri_rad,
    )
    # orthographic-like narrow view straight down at the floor center
    cam = sensorlib.make_camera([0, 0.7, 0], [0, 0, 0], up=(0, 0, 1),
                                fov_x=2.0, width=8, height=8)
    cfg = common.RenderConfig(spp=1024, max_depth=2, seed=2,
                              hide_emitters=True)
    img = np.asarray(common.render_jit(scene, cam, direct.li, cfg))
    expect = rho * L_e * r * r / (r * r + h * h)
    got = img[2:6, 2:6].mean()
    assert np.isfinite(img).all()
    assert abs(got - expect) < 0.01 * max(expect, 1.0), (got, expect)


# --------------------------------------------------------------------------
# Golden images of the BASELINE configs (fixed seed, CPU backend).
# --------------------------------------------------------------------------

def _golden_cases():
    from tools.golden_scenes import CASES
    return list(CASES)


@pytest.mark.parametrize("name", ["cornell_direct", "cornell_path",
                                  "veach_mis", "volpath_homogeneous",
                                  "envmap_textured"])
def test_golden_image(name):
    from tools.golden_scenes import render_case
    ref_path = os.path.join(GOLDEN_DIR, f"{name}.npy")
    if not os.path.exists(ref_path):
        pytest.skip(f"golden {name} not generated "
                    "(run tools/regen_golden.py)")
    img = render_case(name)
    ref = np.load(ref_path)
    assert img.shape == ref.shape
    # same seed + same estimator => near-bit-identical; tolerance covers
    # cross-platform float association differences only
    assert np.allclose(img, ref, rtol=1e-4, atol=1e-4), (
        name, np.abs(img - ref).max())

"""Renders of the BASELINE.json validation configurations (the driver's
acceptance scenes): Cornell direct/path, Veach MIS sweep, textured OBJ +
envmap with texture gradients, homogeneous-medium volpath."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.integrators import common, direct, path, volpath
from mitsuba_tpu.models import medium as medlib
from mitsuba_tpu.scene import builtin, envmap as envlib, ir


def test_cornell_direct_64spp():
    scene, cam = builtin.cornell_box(width=32, height=32)
    img = np.asarray(common.render_jit(
        scene, cam, direct.li, common.RenderConfig(spp=64, max_depth=2, seed=0)))
    assert np.isfinite(img).all() and 0.03 < img.mean() < 1.0


def test_cornell_path_d8_mis():
    scene, cam = builtin.cornell_box(width=32, height=32)
    img = np.asarray(common.render_jit(
        scene, cam, path.li,
        common.RenderConfig(spp=64, max_depth=8, rr_depth=5, seed=0)))
    assert np.isfinite(img).all() and 0.05 < img.mean() < 1.5


def test_veach_mis_sweep():
    """Four roughness plates x four light sizes: the classic MIS stress
    scene. All plates must show reflections; no fireflies blow up."""
    scene, cam = builtin.veach_mis(width=48, height=36)
    img = np.asarray(common.render_jit(
        scene, cam, path.li, common.RenderConfig(spp=64, max_depth=3, seed=0)))
    assert np.isfinite(img).all()
    assert img.mean() > 0.01
    # the plate band (middle rows) must be brighter than the floor band
    plates = img[14:26].mean()
    assert plates > 0.01


def test_textured_obj_envmap_texture_grads(tmp_path):
    """Textured quad under an envmap; d(image)/d(texels) flows and matches
    finite differences on the mean."""
    from mitsuba_tpu.io import mesh as meshlib
    from mitsuba_tpu.models import sensor as sensorlib

    # quad OBJ with uvs
    p = tmp_path / "quad.obj"
    p.write_text(
        "v -1 0 -1\nv 1 0 -1\nv 1 0 1\nv -1 0 1\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "f 1/1 3/3 2/2\nf 1/1 4/4 3/3\n"
    )
    md = meshlib.load_obj(p)
    tex = np.full((8, 8, 3), 0.5, np.float32)
    scene = ir.build_scene(
        md.vertices, md.indices, np.zeros(len(md.indices), np.int32),
        [{"type": ir.BSDF_DIFFUSE, "tex_reflectance": 0}],
        uvs=md.uvs,
        textures=[{"data": tex}],
    )
    scene = envlib.attach_envmap(scene, np.ones((8, 16, 3), np.float32))
    cam = sensorlib.make_camera([0, 2, -3], [0, 0, 0], fov_x=40, width=12, height=12)
    cfg = common.RenderConfig(spp=16, max_depth=2, seed=0)

    def loss(texels):
        s = scene.replace(textures=texels)
        return jnp.mean(common.render(s, cam, path.li, cfg))

    tex0 = scene.textures
    g = np.asarray(jax.grad(loss)(tex0))
    assert np.isfinite(g).all() and np.abs(g).max() > 1e-5
    eps = 1e-2
    e = jnp.zeros_like(tex0).at[0, 3, 3, 1].set(eps)
    fd = (float(loss(tex0 + e)) - float(loss(tex0 - e))) / (2 * eps)
    assert np.isclose(g[0, 3, 3, 1], fd, rtol=0.05, atol=1e-5), (g[0, 3, 3, 1], fd)


def test_homogeneous_medium_volpath():
    scene, cam = builtin.cornell_box(width=24, height=24)
    scene = scene.replace(
        medium=medlib.make_homogeneous([0.2] * 3, [0.05] * 3, g=0.3))
    img = np.asarray(common.render_jit(
        scene, cam, volpath.li,
        common.RenderConfig(spp=32, max_depth=6, seed=0)))
    assert np.isfinite(img).all() and img.mean() > 0.01

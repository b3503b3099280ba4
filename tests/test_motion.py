"""Camera motion blur + motion-vector integrator (track.h two-keyframe
animation; src/integrators/misc/motion.cpp)."""
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.integrators import aov, common, path
from mitsuba_tpu.models import sensor as sensorlib
from mitsuba_tpu.scene import builtin


def _animated_cam(scene_cam, dx=0.3):
    end = np.asarray(scene_cam.to_world).copy()
    end[0, 3] += dx  # translate right during the shutter
    return scene_cam.replace(to_world_end=jnp.asarray(end))


def test_motion_blur_smears():
    scene, cam = builtin.cornell_box(width=24, height=24)
    cfg = common.RenderConfig(spp=64, max_depth=2, seed=0)
    static = np.asarray(common.render_jit(scene, cam, path.li, cfg))
    blurred = np.asarray(common.render_jit(
        scene, _animated_cam(cam), path.li, cfg))
    assert np.isfinite(blurred).all()
    # energy roughly preserved, horizontal gradients reduced (smear)
    assert abs(blurred.mean() - static.mean()) / static.mean() < 0.15
    gx_s = np.abs(np.diff(static.mean(-1), axis=1)).mean()
    gx_b = np.abs(np.diff(blurred.mean(-1), axis=1)).mean()
    assert gx_b < 0.9 * gx_s, (gx_b, gx_s)


def test_motion_vectors():
    scene, cam = builtin.cornell_box(width=16, height=16)
    cfg = common.RenderConfig(spp=4, max_depth=2, seed=0)
    acam = _animated_cam(cam, dx=0.2)
    img = np.asarray(common.render_jit(scene, acam, aov.li_motion, cfg))
    assert np.isfinite(img).all()
    # camera moves +x -> scene points move -x in raster space: dx < 0
    center = img[6:10, 6:10, 0]
    assert (center < -0.1).mean() > 0.8, center.mean()
    # static camera -> zero vectors
    img0 = np.asarray(common.render_jit(scene, cam, aov.li_motion, cfg))
    assert np.abs(img0).max() < 1e-4


# ---------------------------------------------------------------------------
# Object animation (shape toWorldEnd + deformable keyframe meshes)
# ---------------------------------------------------------------------------


def test_lerp_transform_rotation_midpoint():
    """Polar-projected lerp of I and Rz(90deg) at t=0.5 is Rz(45deg)."""
    from mitsuba_tpu.scene.xml import _lerp_transform

    m0 = np.eye(4, dtype=np.float32)
    c, s = np.cos(np.pi / 2), np.sin(np.pi / 2)
    m1 = np.eye(4, dtype=np.float32)
    m1[:2, :2] = [[c, -s], [s, c]]
    m1[:3, 3] = [2.0, 0.0, 0.0]
    mid = _lerp_transform(m0, m1, 0.5)
    c45, s45 = np.cos(np.pi / 4), np.sin(np.pi / 4)
    assert np.allclose(mid[:2, :2], [[c45, -s45], [s45, c45]], atol=1e-5)
    assert np.allclose(mid[:3, 3], [1.0, 0.0, 0.0], atol=1e-6)
    assert np.allclose(_lerp_transform(m0, m1, 0.0), m0)
    assert np.allclose(_lerp_transform(m0, m1, 1.0), m1)


_DEFORM_OBJ0 = "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3\nf 1 3 4\n"
_DEFORM_OBJ1 = "v 0 0 2\nv 1 0 2\nv 1 1 2\nv 0 1 2\nf 1 2 3\nf 1 3 4\n"


def test_deformable_shape_lerps_vertices(tmp_path):
    from mitsuba_tpu.scene import xml as xmllib

    (tmp_path / "k0.obj").write_text(_DEFORM_OBJ0)
    (tmp_path / "k1.obj").write_text(_DEFORM_OBJ1)
    p = tmp_path / "s.xml"
    p.write_text("""<scene version="0.6.0">
    <integrator type="path"/>
    <sensor type="perspective">
        <film type="hdrfilm">
            <integer name="width" value="8"/><integer name="height" value="8"/>
        </film>
    </sensor>
    <shape type="deformable">
        <string name="filename0" value="k0.obj"/>
        <string name="filename1" value="k1.obj"/>
    </shape>
</scene>
""")
    s0, _, _, _ = xmllib.load_xml(p, time=0.0)
    sh, _, _, _ = xmllib.load_xml(p, time=0.5)
    s1, _, _, _ = xmllib.load_xml(p, time=1.0)
    assert float(np.asarray(s0.vertices)[:, 2].mean()) == 0.0
    assert abs(float(np.asarray(sh.vertices)[:, 2].mean()) - 1.0) < 1e-6
    assert abs(float(np.asarray(s1.vertices)[:, 2].mean()) - 2.0) < 1e-6


def test_animated_shape_transform(tmp_path):
    """<transform name="toWorldEnd"> on a shape moves it over the shutter."""
    from mitsuba_tpu.scene import xml as xmllib

    p = tmp_path / "anim.xml"
    p.write_text("""<scene version="0.6.0">
    <integrator type="path"/>
    <sensor type="perspective">
        <film type="hdrfilm">
            <integer name="width" value="8"/><integer name="height" value="8"/>
        </film>
    </sensor>
    <shape type="cube">
        <transform name="toWorld"><translate x="0"/></transform>
        <transform name="toWorldEnd"><translate x="4"/></transform>
    </shape>
</scene>
""")
    s0, _, _, _ = xmllib.load_xml(p, time=0.0)
    sh, _, _, _ = xmllib.load_xml(p, time=0.5)
    s1, _, _, _ = xmllib.load_xml(p, time=1.0)
    x0 = float(np.asarray(s0.vertices)[:, 0].mean())
    xh = float(np.asarray(sh.vertices)[:, 0].mean())
    x1 = float(np.asarray(s1.vertices)[:, 0].mean())
    assert abs(xh - x0 - 2.0) < 1e-5 and abs(x1 - x0 - 4.0) < 1e-5

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

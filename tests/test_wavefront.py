"""Regenerative wavefront renderer must reproduce the fixed-depth
wavefront exactly (same sample streams, same estimator)."""
import numpy as np

from mitsuba_tpu.integrators import common, path, wavefront
from mitsuba_tpu.scene import builtin


def test_matches_fixed_depth_exactly():
    scene, cam = builtin.cornell_box(width=16, height=16)
    cfg = common.RenderConfig(spp=16, max_depth=4, seed=0)
    ref = np.asarray(common.render_jit(scene, cam, path.li, cfg))
    img = np.asarray(wavefront.render_jit(scene, cam, cfg))
    assert np.allclose(ref, img, atol=1e-5)


def test_lane_split_invariant():
    """Splitting spp across lanes per pixel changes nothing (same global
    sample indices)."""
    scene, cam = builtin.cornell_box(width=8, height=8)
    cfg = common.RenderConfig(spp=8, max_depth=3, seed=2)
    a = np.asarray(wavefront.render_jit(scene, cam, cfg, lanes_per_pixel=1))
    b = np.asarray(wavefront.render_jit(scene, cam, cfg, lanes_per_pixel=4))
    assert np.allclose(a, b, atol=1e-5)


def test_with_env_and_depth1():
    import jax.numpy as jnp

    scene, cam = builtin.cornell_box(width=8, height=8)
    scene = scene.replace(env_radiance=jnp.asarray([0.2, 0.3, 0.4]),
                          has_env=True)
    cfg = common.RenderConfig(spp=8, max_depth=1, seed=1)
    ref = np.asarray(common.render_jit(scene, cam, path.li, cfg))
    img = np.asarray(wavefront.render_jit(scene, cam, cfg))
    assert np.allclose(ref, img, atol=1e-5)

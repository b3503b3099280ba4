"""Occupancy-map approximate visibility tests (fork myOM.h analog)."""
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.ops import occupancy as occlib
from mitsuba_tpu.scene import builtin


def test_occupancy_agrees_with_exact_mostly():
    scene, _ = builtin.cornell_box()
    scene = occlib.attach(scene, res=128)
    rs = np.random.RandomState(0)
    n = 2048
    # random segment queries inside the box
    a = rs.uniform(0.05, 0.95, (n, 3)).astype(np.float32)
    b = rs.uniform(0.05, 0.95, (n, 3)).astype(np.float32)
    d = b - a
    dist = np.linalg.norm(d, axis=1)
    d = d / dist[:, None]
    from mitsuba_tpu.ops import trace

    exact = np.asarray(trace.any_hit(scene, jnp.asarray(a), jnp.asarray(d),
                                     jnp.asarray(dist)))
    approx = np.asarray(occlib.occluded(scene.occupancy, jnp.asarray(a),
                                        jnp.asarray(d), jnp.asarray(dist)))
    agree = (exact == approx).mean()
    assert agree > 0.9, agree


def test_occupancy_render_close_to_exact():
    from mitsuba_tpu.integrators import common, path

    scene, cam = builtin.cornell_box(width=16, height=16)
    cfg = common.RenderConfig(spp=32, max_depth=3, seed=0)
    ref = np.asarray(common.render_jit(scene, cam, path.li, cfg))
    scene_om = occlib.attach(scene, res=128)
    cfg_om = common.RenderConfig(spp=32, max_depth=3, seed=0,
                                 occupancy_shadows=True)
    img = np.asarray(common.render_jit(scene_om, cam, path.li, cfg_om))
    # biased but close (grid voxels fatten occluders slightly)
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.15, rel


def test_mis_modes_agree_in_expectation():
    """Uniform/balance/power MIS modes are all unbiased: images agree."""
    from mitsuba_tpu.integrators import common, path

    scene, cam = builtin.cornell_box(width=12, height=12)
    imgs = []
    for mode in (0, 1, 2):
        cfg = common.RenderConfig(spp=256, max_depth=3, seed=3, mis_mode=mode)
        imgs.append(np.asarray(common.render_jit(scene, cam, path.li, cfg)))
    for a in imgs[1:]:
        assert abs(a.mean() - imgs[0].mean()) / imgs[0].mean() < 0.05

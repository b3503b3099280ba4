"""Classic two-map photon mapper (photonmapper.cpp analog): Cornell
agreement with path tracing and caustic-map activity on a specular
scene."""
import numpy as np
import jax.numpy as jnp

from mitsuba_tpu.integrators import common, path, photonmapper
from mitsuba_tpu.scene import builtin


def test_photonmapper_matches_path_cornell():
    scene, cam = builtin.cornell_box(width=16, height=16)
    cfg = common.RenderConfig(spp=32, max_depth=4, seed=0)
    ref = np.asarray(common.render_jit(scene, cam, path.li, cfg))
    img = np.asarray(photonmapper.render(scene, cam, cfg,
                                         n_photons=1 << 16, n_passes=4))
    assert img.shape == ref.shape and np.isfinite(img).all()
    assert img.min() >= 0
    # biased density estimation: generous but meaningful agreement
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.2, (img.mean(), ref.mean())


def test_photonmapper_caustic_map_active():
    """caustic_box routes most light through a mirror: the caustic map
    must carry energy (prev-delta deposits exist and contribute)."""
    from mitsuba_tpu.integrators.sppm import _photon_pass

    scene, cam = builtin.caustic_box(width=8, height=8)
    cfg = common.RenderConfig(spp=8, max_depth=5, seed=0)
    pos, pdir, ppow, pvalid, pdepth, pprev = _photon_pass(
        scene, cfg, jnp.asarray(0), 1 << 14, 5, with_tags=True)
    caustic = np.asarray(pvalid & pprev & (pdepth >= 1))
    indirect = np.asarray(pvalid & ~pprev & (pdepth >= 1))
    assert caustic.sum() > 50, caustic.sum()
    assert indirect.sum() > 50, indirect.sum()

    img = np.asarray(photonmapper.render(scene, cam, cfg,
                                         n_photons=1 << 15, n_passes=2))
    assert np.isfinite(img).all() and img.mean() > 1e-4

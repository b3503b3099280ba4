"""Beam radiance estimate (bre.cpp analog): volumetric photon gathering
validated against volpath on homogeneous fog."""
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.integrators import bre, common, volpath
from mitsuba_tpu.models import medium as medlib
from mitsuba_tpu.scene import builtin


def test_bre_matches_volpath_fog():
    scene, cam = builtin.cornell_box(width=16, height=16)
    scene = scene.replace(medium=medlib.make_homogeneous(
        [0.6] * 3, [0.05] * 3, g=0.0))
    cfg = common.RenderConfig(spp=64, max_depth=4, seed=0)
    ref = np.asarray(common.render_jit(scene, cam, volpath.li, cfg))
    img = np.asarray(bre.render_jit(scene, cam, cfg, n_paths=1 << 15,
                                    steps=24))
    assert np.isfinite(img).all()
    # bre renders media in-scatter + attenuated emitters (no surface
    # reflection): it must recover a substantial, correlated fraction
    assert img.mean() > 0.1 * ref.mean()
    assert img.mean() < 1.5 * ref.mean()
    # the medium glow is smooth + nonzero away from the emitter
    assert np.median(img) > 0.0


def test_volume_photons_deposited():
    scene, cam = builtin.cornell_box(width=8, height=8)
    scene = scene.replace(medium=medlib.make_homogeneous(
        [0.8] * 3, [0.1] * 3))
    cfg = common.RenderConfig(spp=8, max_depth=4, seed=1)
    pos, pdir, ppow, pval = bre.trace_volume_photons(scene, cfg, 4096, 7)
    frac = float(np.asarray(pval).mean())
    assert frac > 0.1  # plenty of volume events in thick fog
    p = np.asarray(pos)[np.asarray(pval)]
    assert np.isfinite(p).all()
    assert float(np.asarray(ppow)[np.asarray(pval)].max()) > 0

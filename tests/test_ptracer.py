"""Particle tracer vs path tracer cross-validation (the reference's
bidirectional consistency strategy, data/tests/test_bidir_*.xml: adjoint
and forward transport must produce the same image)."""
import numpy as np
import pytest

from mitsuba_tpu.integrators import common, path, ptracer
from mitsuba_tpu.scene import builtin


def test_ptracer_matches_path_on_cornell():
    scene, cam = builtin.cornell_box(width=24, height=24)
    cfg = common.RenderConfig(spp=64, max_depth=4, seed=0)
    fwd = np.asarray(common.render_jit(scene, cam, path.li, cfg))
    adj = np.asarray(ptracer.render_jit(scene, cam,
                                        common.RenderConfig(spp=256, max_depth=4, seed=1)))
    assert np.isfinite(adj).all() and adj.min() >= 0
    # mean brightness agreement (light tracing is noisy per pixel; means and
    # smoothed images must agree)
    assert abs(adj.mean() - fwd.mean()) / fwd.mean() < 0.1, (adj.mean(), fwd.mean())

    def blur(img, k=3):
        from numpy.lib.stride_tricks import sliding_window_view
        pad = np.pad(img, ((k//2, k//2), (k//2, k//2), (0, 0)), mode="edge")
        return sliding_window_view(pad, (k, k), axis=(0, 1)).mean((-1, -2))

    fb, ab = blur(fwd), blur(adj)
    mask = fb > 0.05
    rel = np.abs(fb - ab)[mask] / fb[mask]
    assert np.median(rel) < 0.25, np.median(rel)

"""PSSMLT cross-validation against the path tracer (the reference's own
QA approach for its Metropolis integrators)."""
import numpy as np

from mitsuba_tpu.integrators import common, path, pssmlt
from mitsuba_tpu.scene import builtin


def test_pssmlt_matches_path_mean():
    scene, cam = builtin.cornell_box(width=16, height=16)
    cfg = common.RenderConfig(spp=128, max_depth=4, seed=0)
    ref = np.asarray(common.render_jit(scene, cam, path.li, cfg))
    img = np.asarray(pssmlt.render_jit(
        scene, cam, common.RenderConfig(spp=1, max_depth=4, seed=1),
        n_chains=1 << 12, n_mutations=128, n_bootstrap=1 << 14,
    ))
    assert np.isfinite(img).all() and img.min() >= 0
    # global brightness must agree (b-normalization correctness)
    assert abs(img.mean() - ref.mean()) / ref.mean() < 0.08, (img.mean(), ref.mean())
    # structure: smoothed images correlate strongly
    def blur(a, k=3):
        from numpy.lib.stride_tricks import sliding_window_view
        pad = np.pad(a.mean(-1), k // 2, mode="edge")
        return sliding_window_view(pad, (k, k)).mean((-1, -2))
    fb, mb = blur(ref), blur(img)
    corr = np.corrcoef(fb.ravel(), mb.ravel())[0, 1]
    assert corr > 0.95, corr

"""LVC-BPT cross-validation against the unidirectional path tracer — the
reference validates its bidirectional integrators the same way
(data/tests/test_bidir_*.xml)."""
import numpy as np

from mitsuba_tpu.integrators import common, lvcbpt, path
from mitsuba_tpu.scene import builtin


def test_lvcbpt_matches_path_on_cornell():
    scene, cam = builtin.cornell_box(width=24, height=24)
    ref = np.asarray(common.render_jit(
        scene, cam, path.li, common.RenderConfig(spp=128, max_depth=4, seed=0)))
    img = np.asarray(common.render_jit(
        scene, cam, lvcbpt.li, common.RenderConfig(spp=64, max_depth=4, seed=1)))
    assert np.isfinite(img).all() and img.min() >= 0
    assert abs(img.mean() - ref.mean()) / ref.mean() < 0.08, (img.mean(), ref.mean())

    def blur(a, k=3):
        from numpy.lib.stride_tricks import sliding_window_view
        pad = np.pad(a, ((k//2,)*2, (k//2,)*2, (0, 0)), mode="edge")
        return sliding_window_view(pad, (k, k), axis=(0, 1)).mean((-1, -2))

    fb, lb = blur(ref), blur(img)
    mask = fb > 0.05
    rel = np.abs(fb - lb)[mask] / fb[mask]
    assert np.median(rel) < 0.2, np.median(rel)

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


def test_lvcbpt_mis_modes_all_unbiased():
    """The fork's whole point: Uniform/Balance/Power MIS modes
    (LVCBPT.cpp:50-55) must all be unbiased vs path."""
    scene, cam = builtin.cornell_box(width=12, height=12)
    ref = np.asarray(common.render_jit(
        scene, cam, path.li, common.RenderConfig(spp=196, max_depth=4, seed=0)))
    for mode in (0, 1, 2):
        img = np.asarray(common.render_jit(
            scene, cam, lvcbpt.li,
            common.RenderConfig(spp=96, max_depth=4, seed=2 + mode,
                                mis_mode=mode)))
        assert np.isfinite(img).all() and img.min() >= 0
        rel = abs(img.mean() - ref.mean()) / ref.mean()
        assert rel < 0.08, (mode, img.mean(), ref.mean(), rel)


def test_lvcbpt_point_lit():
    scene, cam = builtin.cornell_box_lit("point", width=12, height=12)
    ref = np.asarray(common.render_jit(
        scene, cam, path.li, common.RenderConfig(spp=128, max_depth=3, seed=0)))
    img = np.asarray(common.render_jit(
        scene, cam, lvcbpt.li, common.RenderConfig(spp=96, max_depth=3, seed=1)))
    rel = abs(img.mean() - ref.mean()) / max(ref.mean(), 1e-6)
    assert rel < 0.08, (img.mean(), ref.mean(), rel)

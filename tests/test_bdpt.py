"""BDPT cross-validation: the MIS-weighted strategy sum must reproduce the
unidirectional path tracer's image (the reference's bidir consistency
check, data/tests/test_bidir_*.xml)."""
import numpy as np
import pytest

from mitsuba_tpu.integrators import bdpt, common, path
from mitsuba_tpu.scene import builtin


@pytest.mark.parametrize("depth", [2, 4])
def test_bdpt_matches_path(depth):
    scene, cam = builtin.cornell_box(width=16, height=16)
    ref = np.asarray(common.render_jit(
        scene, cam, path.li, common.RenderConfig(spp=256, max_depth=depth, seed=0)))
    img = np.asarray(common.render_jit(
        scene, cam, bdpt.li, common.RenderConfig(spp=128, max_depth=depth, seed=1)))
    assert np.isfinite(img).all() and img.min() >= 0
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.05, (img.mean(), ref.mean(), rel)
    # pixelwise (blurred) agreement
    def blur(a, k=3):
        from numpy.lib.stride_tricks import sliding_window_view
        pad = np.pad(a.mean(-1), k // 2, mode="edge")
        return sliding_window_view(pad, (k, k)).mean((-1, -2))
    fb, bb = blur(ref), blur(img)
    mask = fb > 0.05
    rr = np.abs(fb - bb)[mask] / fb[mask]
    assert np.median(rr) < 0.1, np.median(rr)


@pytest.mark.parametrize("light", ["point", "env", "spot"])
def test_bdpt_matches_path_nonarea_lights(light):
    """VERDICT item 1 done-criterion (a): bdpt == path (MC tolerance) on
    scenes lit by non-area emitters — the light-subpath start must cover
    every emitter kind (Scene::sampleEmitterRay, scene.h:886)."""
    scene, cam = builtin.cornell_box_lit(light, width=12, height=12)
    ref = np.asarray(common.render_jit(
        scene, cam, path.li, common.RenderConfig(spp=196, max_depth=3, seed=0)))
    img = np.asarray(common.render_jit(
        scene, cam, bdpt.li, common.RenderConfig(spp=128, max_depth=3, seed=1)))
    assert np.isfinite(img).all() and img.min() >= 0
    rel = abs(img.mean() - ref.mean()) / max(ref.mean(), 1e-6)
    assert rel < 0.06, (img.mean(), ref.mean(), rel)


def test_bdpt_light_image_matches_path_cornell():
    """bdpt.render (t=1 light-tracing splats + light image composite,
    bdpt_proc.cpp:347-352) must stay consistent with path."""
    scene, cam = builtin.cornell_box(width=12, height=12)
    ref = np.asarray(common.render_jit(
        scene, cam, path.li, common.RenderConfig(spp=256, max_depth=4, seed=0)))
    img = np.asarray(bdpt.render_jit(
        scene, cam, common.RenderConfig(spp=128, max_depth=4, seed=1)))
    assert np.isfinite(img).all() and img.min() >= 0
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.06, (img.mean(), ref.mean(), rel)


def test_bdpt_light_image_caustic_scene():
    """Mirror-caustic fixture: light tracing carries most of the energy;
    bdpt-with-light-image must agree with a (deep, high-spp) path render
    — VERDICT item 1 done-criterion (b)."""
    scene, cam = builtin.caustic_box(width=12, height=12)
    ref = np.asarray(common.render_jit(
        scene, cam, path.li, common.RenderConfig(spp=512, max_depth=4, seed=0)))
    img = np.asarray(bdpt.render_jit(
        scene, cam, common.RenderConfig(spp=128, max_depth=4, seed=1)))
    assert np.isfinite(img).all() and img.min() >= 0
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.12, (img.mean(), ref.mean(), rel)

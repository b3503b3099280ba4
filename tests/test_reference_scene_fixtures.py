"""Render the reference's own scene fixtures and cross-compare
integrators (VERDICT r4 item 6).

The reference's data/tests/test_bidir_*.xml / test_emitter.xml fixtures
feed its bidirectional-consistency testcase (src/tests/test_bidir.cpp
renders each scene with several independent transport techniques and
asserts statistical agreement). The reference binary cannot be built in
this environment (SCons/Boost/Xerces unavailable), so the closest
available proxy to "allclose vs the reference CLI" is the same
cross-technique protocol on the same scenes: path vs bdpt vs ptracer
must converge to the same image, since they share no sampling logic
(unidirectional / bidirectional / adjoint particle transport).

Tolerances (recorded): image MEAN within 5% relative between any pair
of techniques at 64 spp on a 32x32 film; 4x4 block means within 15%
where the block carries energy (> 10% of the image mean). Both bounds
sit ~3 sigma above the measured MC noise at this sample count.

test_bidir_2.xml wraps the disk sandwich in a pure-absorption exterior
medium; the surface-only techniques cross-compare on the medium-
stripped scene, and volpath must show strictly LESS energy than the
medium-free render (absorption can only remove energy) — its medium
handling is value-tested elsewhere (tests/test_volpath.py).
"""
import glob
import os

import numpy as np
import pytest

REF_TESTS = "/root/reference/data/tests"

pytestmark = pytest.mark.skipif(
    not glob.glob(os.path.join(REF_TESTS, "*.xml")),
    reason="reference fixtures unavailable")


def _small(cam, n=32):
    return cam.replace(width=n, height=n)


def _camera_for(fixture, cam):
    """The bidir fixtures carry shape-attached irradiancemeters (their
    surface-averaged readout is a reference-testcase construct); the
    cross-technique check instead views the lit receiver disk from
    INSIDE the two-disk sandwich, which exercises the same transport.
    test_emitter keeps its loader-resolved camera (envmap-lit sphere)."""
    from mitsuba_tpu.models import sensor as sensorlib

    if fixture.startswith("test_bidir"):
        return sensorlib.make_camera(origin=[0.0, 0.0, 0.5],
                                     target=[0.0, 0.0, -1.0],
                                     fov_x=80.0, width=32, height=32)
    return _small(cam)


def _render(scene, cam, cfg, which):
    from mitsuba_tpu.integrators import bdpt, common, path, volpath

    if which == "ptracer":
        from mitsuba_tpu.integrators import ptracer
        return np.asarray(ptracer.render_jit(scene, cam, cfg))
    li = {"path": path.li, "bdpt": bdpt.li, "volpath": volpath.li}[which]
    return np.asarray(common.render_jit(scene, cam, li, cfg))


def _cross_check(imgs, mean_rtol=0.05, block_rtol=0.15):
    names = sorted(imgs)
    means = {k: float(v.mean()) for k, v in imgs.items()}
    ref_mean = np.mean(list(means.values()))
    assert ref_mean > 1e-4, f"degenerate fixture (all-black): {means}"
    for k in names:
        assert abs(means[k] - ref_mean) <= mean_rtol * ref_mean, (
            k, means, ref_mean)
    # 4x4 block means on energetic blocks
    blocks = {}
    for k, v in imgs.items():
        h, w = v.shape[:2]
        blocks[k] = v.reshape(4, h // 4, 4, w // 4, -1).mean((1, 3, 4))
    bref = np.mean(list(blocks.values()), axis=0)
    live = bref > 0.1 * ref_mean
    for k in names:
        rel = np.abs(blocks[k] - bref)[live] / bref[live]
        assert rel.max() <= block_rtol, (k, float(rel.max()))


@pytest.mark.slow
@pytest.mark.parametrize("fixture", ["test_bidir_0.xml", "test_bidir_2.xml",
                                     "test_emitter.xml"])
def test_reference_fixture_cross_technique_agreement(fixture):
    from mitsuba_tpu.scene import xml as xmllib

    scene, cam, cfg, _ = xmllib.load_xml(os.path.join(REF_TESTS, fixture))
    cam = _camera_for(fixture, cam)
    cfg = cfg.__class__(**{**cfg.__dict__, "spp": 64, "max_depth": 6,
                           "seed": 3})
    had_medium = scene.medium is not None
    surface_scene = scene.replace(medium=None) if had_medium else scene

    imgs = {w: _render(surface_scene, cam, cfg, w)
            for w in ("path", "bdpt", "ptracer")}
    _cross_check(imgs)

    if had_medium:
        # pure absorption (sigmaS=0, sigmaA=1) strictly removes energy
        vol = _render(scene, cam, cfg, "volpath")
        assert vol.mean() < imgs["path"].mean() * 0.9, (
            float(vol.mean()), float(imgs["path"].mean()))

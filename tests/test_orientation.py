"""Orientation volumes: per-voxel fiber axes driving the kkay/microflake
phase functions (heterogeneous.cpp m_orientation, gridvolume.cpp
lookupVector, kkay.cpp mRec.orientation)."""
import numpy as np
import jax.numpy as jnp

from mitsuba_tpu.models import medium as medlib, phase as phaselib


def _grid_medium(orientation):
    dens = np.ones((4, 4, 4), np.float32)
    return medlib.make_grid(
        dens, 4.0, 0.9, box_min=(0, 0, 0), box_max=(1, 1, 1),
        phase=phaselib.PHASE_MICROFLAKE,
        phase_params=phaselib.make_microflake_params(0.3, axis=(0, 0, 1)),
        orientation=orientation)


def test_orientation_lookup_interpolates_and_normalizes():
    o = np.zeros((2, 2, 2, 3), np.float32)
    o[..., 0] = 1.0          # +x at z=0 plane
    o[1, :, :, :] = [0.0, 1.0, 0.0]   # +y at z=1 plane
    med = _grid_medium(o)
    p = jnp.asarray([[0.5, 0.5, 0.0], [0.5, 0.5, 1.0], [0.5, 0.5, 0.5]])
    ax = np.asarray(medlib.orientation_at(med, p))
    assert np.allclose(ax[0], [1, 0, 0], atol=1e-6)
    assert np.allclose(ax[1], [0, 1, 0], atol=1e-6)
    # midpoint: normalized mix of +x and +y
    assert np.allclose(ax[2], [1 / np.sqrt(2), 1 / np.sqrt(2), 0], atol=1e-5)
    assert np.allclose(np.linalg.norm(ax, axis=-1), 1.0, atol=1e-5)


def test_degenerate_interpolant_falls_back():
    o = np.zeros((2, 2, 2, 3), np.float32)
    o[0] = [0.0, 0.0, 1.0]
    o[1] = [0.0, 0.0, -1.0]   # cancels at the midpoint
    med = _grid_medium(o)
    ax = np.asarray(medlib.orientation_at(
        med, jnp.asarray([[0.5, 0.5, 0.5]])))
    assert np.allclose(np.linalg.norm(ax, axis=-1), 1.0, atol=1e-5)


def test_constant_orientation_matches_static_axis():
    """An all-(0,0,1) orientation volume must reproduce the static-axis
    phase exactly (same sample stream, same estimator)."""
    from mitsuba_tpu.integrators import common, volpath
    from mitsuba_tpu.scene import builtin

    o = np.broadcast_to(np.asarray([0, 0, 1], np.float32),
                        (2, 2, 2, 3)).copy()
    scene, cam = builtin.cornell_box(width=8, height=8)
    cfg = common.RenderConfig(spp=16, max_depth=3, seed=0)
    img_static = np.asarray(common.render_jit(
        scene.replace(medium=_grid_medium(None)), cam, volpath.li, cfg))
    img_vol = np.asarray(common.render_jit(
        scene.replace(medium=_grid_medium(o)), cam, volpath.li, cfg))
    assert np.allclose(img_static, img_vol, atol=1e-5), \
        np.abs(img_static - img_vol).max()


def test_varying_orientation_changes_image():
    rng = np.random.default_rng(0)
    o = rng.normal(size=(4, 4, 4, 3)).astype(np.float32)
    from mitsuba_tpu.integrators import common, volpath
    from mitsuba_tpu.scene import builtin

    scene, cam = builtin.cornell_box(width=8, height=8)
    cfg = common.RenderConfig(spp=16, max_depth=3, seed=0)
    a = np.asarray(common.render_jit(
        scene.replace(medium=_grid_medium(None)), cam, volpath.li, cfg))
    b = np.asarray(common.render_jit(
        scene.replace(medium=_grid_medium(o)), cam, volpath.li, cfg))
    assert np.isfinite(b).all() and b.mean() > 0
    assert not np.allclose(a, b, atol=1e-4)


def test_orientation_xml(tmp_path):
    from mitsuba_tpu.io import vol as vollib
    from mitsuba_tpu.scene import xml as xmllib

    dens = np.ones((3, 3, 3), np.float32)
    ori = np.zeros((3, 3, 3, 3), np.float32)
    ori[..., 1] = 1.0
    vollib.write_vol(str(tmp_path / "d.vol"), dens)
    vollib.write_vol(str(tmp_path / "o.vol"), ori)
    xml = """
<scene version="0.6.0">
    <integrator type="volpath"/>
    <sensor type="perspective">
        <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
        <film type="hdrfilm">
            <integer name="width" value="4"/><integer name="height" value="4"/>
        </film>
    </sensor>
    <medium type="heterogeneous">
        <volume name="density" type="gridvolume">
            <string name="filename" value="d.vol"/>
        </volume>
        <volume name="orientation" type="gridvolume">
            <string name="filename" value="o.vol"/>
        </volume>
        <phase type="microflake"><float name="stddev" value="0.2"/></phase>
    </medium>
    <shape type="rectangle">
        <transform name="toWorld"><rotate x="1" angle="90"/><translate y="3"/></transform>
        <emitter type="area"><rgb name="radiance" value="5,5,5"/></emitter>
    </shape>
</scene>
"""
    p = tmp_path / "s.xml"
    p.write_text(xml)
    scene, cam, cfg, integ = xmllib.load_xml(p)
    assert scene.medium is not None
    assert scene.medium.orientation is not None
    assert scene.medium.orientation.shape == (3, 3, 3, 3)
    assert np.allclose(np.asarray(scene.medium.orientation)[..., 1], 1.0)

"""Tiled HDR film (films/tiledhdrfilm.cpp analog): row bands streamed to
an EXR must be bit-identical to the full-frame render."""
import numpy as np

from mitsuba_tpu.film import tiled as tiledlib
from mitsuba_tpu.integrators import common, path
from mitsuba_tpu.io import image as imagelib
from mitsuba_tpu.scene import builtin


def test_tiled_matches_fullframe(tmp_path):
    scene, cam = builtin.cornell_box(width=16, height=16)
    cfg = common.RenderConfig(spp=8, max_depth=3, seed=3)
    full = np.asarray(common.render_jit(scene, cam, path.li, cfg))
    p = tmp_path / "t.exr"
    tiledlib.render_tiled(scene, cam, path.li, cfg, str(p), tile_rows=4)
    img = imagelib.read_exr(p)
    assert img.shape == full.shape
    assert np.allclose(img, full, atol=1e-6), np.abs(img - full).max()


def test_tiled_writer_out_of_order(tmp_path):
    w = tiledlib.TiledEXRWriter(tmp_path / "o.exr", 8, 6,
                                metadata={"spp": 4.0})
    rows = np.arange(8 * 3, dtype=np.float32).reshape(1, 8, 3)
    w.write_rows(4, rows * 2)
    w.write_rows(0, rows)
    w.close()   # fills the gaps with zeros
    img = imagelib.read_exr(tmp_path / "o.exr")
    assert np.allclose(img[0], rows[0])
    assert np.allclose(img[4], rows[0] * 2)
    assert np.allclose(img[1], 0.0)
    attrs = imagelib.read_exr_attrs(tmp_path / "o.exr")
    assert attrs["spp"] == 4.0


def test_tiled_xml_cli(tmp_path):
    from mitsuba_tpu import cli

    xml = """
<scene version="0.6.0">
    <integrator type="path"><integer name="maxDepth" value="2"/></integrator>
    <sensor type="perspective">
        <float name="fov" value="40"/>
        <transform name="toWorld">
            <lookat origin="0.5,0.5,-1.3" target="0.5,0.5,0.5" up="0,1,0"/>
        </transform>
        <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
        <film type="tiledhdrfilm">
            <integer name="width" value="8"/><integer name="height" value="8"/>
        </film>
    </sensor>
    <shape type="rectangle">
        <transform name="toWorld"><rotate x="1" angle="90"/><translate x="0.5" y="1.5" z="0.5"/></transform>
        <emitter type="area"><rgb name="radiance" value="6,6,6"/></emitter>
    </shape>
</scene>
"""
    sp = tmp_path / "s.xml"
    sp.write_text(xml)
    out = tmp_path / "o.exr"
    cli.main([str(sp), "-o", str(out), "-q"])
    img = imagelib.read_exr(out)
    assert np.isfinite(img).all() and img.shape == (8, 8, 3)

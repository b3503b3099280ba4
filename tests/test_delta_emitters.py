"""Delta emitter tests: point/spot/directional lights (src/emitters/
{point,spot,directional}.cpp parity) — inverse-square law, spot falloff,
MIS weight 1, and XML loading."""
import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.integrators import common, path
from mitsuba_tpu.models import emitter as emitterlib
from mitsuba_tpu.scene import ir
from mitsuba_tpu.models import sensor as sensorlib


def plane_scene(delta_records):
    verts = np.asarray([[-10, 0, -10], [10, 0, -10], [10, 0, 10], [-10, 0, 10]], np.float32)
    tris = np.asarray([[0, 2, 1], [0, 3, 2]], np.int32)
    scene = ir.build_scene(verts, tris, np.zeros(2, np.int32),
                           [{"type": ir.BSDF_DIFFUSE, "reflectance": [1.0, 1.0, 1.0]}])
    return scene.replace(delta_emitters=ir.build_delta_emitters(delta_records))


def test_point_light_inverse_square():
    """Lambertian floor under a point light: L = albedo/pi * I cos/d^2."""
    scene = plane_scene([{"kind": ir.DELTA_POINT, "position": [0, 2, 0],
                          "intensity": [10.0, 10.0, 10.0]}])
    n = 4096
    p = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (n, 1))
    u = jax.random.uniform(jax.random.PRNGKey(0), (n, 3))
    ds = emitterlib.sample_direct(scene, p, u)
    assert bool(jnp.all(ds.is_delta))
    # E[rad/pdf] * cos = I*cos/d^2 (pdf folds the selection prob)
    cosq = jnp.maximum(ds.d[:, 1], 0.0)
    est = np.asarray(jnp.mean(ds.radiance * (cosq / ds.pdf)[:, None], 0))
    d2 = 1.0 + 4.0
    cos_true = 2.0 / np.sqrt(d2)
    expect = 10.0 * cos_true / d2
    assert np.allclose(est, expect, rtol=1e-4), (est, expect)


def test_spot_falloff():
    scene = plane_scene([{"kind": ir.DELTA_SPOT, "position": [0, 2, 0],
                          "direction": [0, -1, 0], "intensity": [10.0] * 3,
                          "cutoff_deg": 30.0, "beam_deg": 20.0}])
    u = jax.random.uniform(jax.random.PRNGKey(1), (1024, 3))
    # inside the beam: full intensity
    p_in = jnp.tile(jnp.asarray([[0.0, 0.0, 0.0]]), (1024, 1))
    ds = emitterlib.sample_direct(scene, p_in, u)
    assert float(jnp.max(ds.radiance)) > 0
    # outside the cutoff cone (> 30 deg): zero
    p_out = jnp.tile(jnp.asarray([[3.0, 0.0, 0.0]]), (1024, 1))
    ds2 = emitterlib.sample_direct(scene, p_out, u)
    assert float(jnp.max(ds2.radiance)) == 0.0


def test_directional_render():
    """Floor under straight-down directional light: L = albedo/pi * E."""
    scene = plane_scene([{"kind": ir.DELTA_DIRECTIONAL, "direction": [0, -1, 0],
                          "intensity": [2.0, 2.0, 2.0]}])
    cam = sensorlib.make_camera([0, 3, -6], [0, 0, 0], fov_x=30, width=8, height=8)
    cfg = common.RenderConfig(spp=16, max_depth=2, seed=0)
    img = np.asarray(common.render_jit(scene, cam, path.li, cfg))
    expect = 1.0 / np.pi * 2.0
    center = img[5:8, 2:6]
    assert np.allclose(center, expect, rtol=0.05), (center.mean(), expect)


def test_xml_point_light(tmp_path):
    from mitsuba_tpu.scene import xml as xmllib

    p = tmp_path / "s.xml"
    p.write_text("""\
<scene version="0.6.0">
    <integrator type="path"><integer name="maxDepth" value="2"/></integrator>
    <sensor type="perspective">
        <film type="hdrfilm">
            <integer name="width" value="8"/><integer name="height" value="8"/>
        </film>
    </sensor>
    <shape type="rectangle">
        <transform name="toWorld">
            <rotate y="1" angle="180"/>
            <translate z="3"/>
        </transform>
    </shape>
    <emitter type="point">
        <point name="position" x="0" y="0" z="1"/>
        <spectrum name="intensity" value="5"/>
    </emitter>
</scene>
""")
    scene, cam, cfg, _ = xmllib.load_xml(p)
    assert scene.delta_emitters is not None
    assert int(scene.delta_emitters.kind.shape[0]) == 1
    img = np.asarray(common.render_jit(scene, cam, path.li, cfg))
    assert np.isfinite(img).all() and img.max() > 0


def test_collimated_beam_via_ptracer(tmp_path):
    """collimated.cpp: a zero-divergence beam is invisible to NEE (delta
    position x delta direction) but carries its power down light paths —
    a ptracer render shows a bright spot where the beam hits the floor."""
    import numpy as np
    from mitsuba_tpu.integrators import common, direct, ptracer
    from mitsuba_tpu.scene import xml as xmllib

    p = tmp_path / "s.xml"
    p.write_text("""\
<scene version="0.6.0">
    <integrator type="ptracer"/>
    <sensor type="perspective">
        <float name="fov" value="60"/>
        <transform name="toWorld">
            <lookat origin="0, 2.5, 0.01" target="0, 0, 0" up="0, 0, 1"/>
        </transform>
        <sampler type="independent"><integer name="sampleCount" value="64"/></sampler>
        <film type="hdrfilm">
            <integer name="width" value="16"/><integer name="height" value="16"/>
        </film>
    </sensor>
    <shape type="rectangle">
        <transform name="toWorld"><rotate x="1" angle="-90"/><scale value="2"/></transform>
    </shape>
    <emitter type="collimated">
        <transform name="toWorld">
            <lookat origin="0.5, 2, 0.5" target="0.5, 0, 0.5" up="1, 0, 0"/>
        </transform>
        <rgb name="power" value="5, 5, 5"/>
    </emitter>
</scene>
""")
    scene, cam, cfg, integ = xmllib.load_xml(p)
    assert integ == "ptracer"
    img = np.asarray(ptracer.render_jit(scene, cam, cfg))
    assert np.isfinite(img).all()
    assert img.max() > 10 * max(np.median(img), 1e-9)  # a concentrated spot
    # NEE-based integrators see nothing from the beam (no false energy)
    img_d = np.asarray(common.render_jit(scene, cam, direct.li, cfg))
    assert img_d.max() < 1e-6, img_d.max()

"""Emitter sampling tests: NEE pdf consistency between sample_direct and
pdf_direct_area (Scene::sampleEmitterDirect / pdfEmitterDirect parity,
scene.h:482,577)."""
import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.models import emitter as emitterlib
from mitsuba_tpu.ops import trace
from mitsuba_tpu.scene import builtin


def test_sample_pdf_roundtrip():
    scene, _ = builtin.cornell_box()
    n = 8192
    ref_p = jnp.tile(jnp.asarray([[0.5, 0.2, 0.5]]), (n, 1))
    u = jax.random.uniform(jax.random.PRNGKey(0), (n, 3))
    ds = emitterlib.sample_direct(scene, ref_p, u)
    pdf = np.asarray(ds.pdf)
    assert (pdf > 0).mean() > 0.95  # light visible from scene center

    # recompute pdf by tracing the sampled ray and calling pdf_direct_area
    its = trace.closest_hit(scene, ref_p, ds.d)
    si = trace.surface_interaction(scene, ref_p, ds.d, its)
    cos_l = np.asarray(jnp.sum(-ds.d * si["ng"], -1))
    pdf2 = np.asarray(
        emitterlib.pdf_direct_area(scene, ref_p, ds.d, its.t, its.prim, jnp.asarray(cos_l))
    )
    hit_light = np.asarray(si["emitter"]) >= 0
    ok = hit_light & (pdf > 0)
    assert ok.mean() > 0.9
    assert np.allclose(pdf[ok], pdf2[ok], rtol=1e-3), np.abs(pdf[ok] - pdf2[ok]).max()


def test_sampled_points_on_light():
    scene, _ = builtin.cornell_box()
    n = 4096
    ref_p = jnp.tile(jnp.asarray([[0.5, 0.5, 0.5]]), (n, 1))
    u = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))
    ds = emitterlib.sample_direct(scene, ref_p, u)
    p = np.asarray(ref_p + ds.d * ds.dist[:, None])
    # Cornell light: y=0.9988, x in [.37,.63], z in [.33,.67]
    assert np.allclose(p[:, 1], 0.9988, atol=1e-4)
    assert p[:, 0].min() > 0.36 and p[:, 0].max() < 0.64
    assert p[:, 2].min() > 0.32 and p[:, 2].max() < 0.68


def test_direct_mc_matches_analytic_sphere_patch():
    """MC estimate of irradiance from the area light at a point equals the
    solid-angle integral computed by dense quadrature."""
    scene, _ = builtin.cornell_box()
    q = jnp.asarray([[0.5, 0.0, 0.5]])  # on the floor, normal +y
    n = 1 << 16
    u = jax.random.uniform(jax.random.PRNGKey(2), (n, 3))
    ds = emitterlib.sample_direct(scene, jnp.tile(q, (n, 1)), u)
    cos_q = jnp.maximum(ds.d[:, 1], 0.0)  # floor normal +y
    est = np.asarray(
        jnp.mean(
            jnp.where((ds.pdf > 0)[:, None],
                      ds.radiance * (cos_q / jnp.maximum(ds.pdf, 1e-9))[:, None], 0.0),
            axis=0,
        )
    )
    # quadrature over the light rectangle
    xs = np.linspace(0.37, 0.63, 200)
    zs = np.linspace(0.33, 0.67, 200)
    X, Z = np.meshgrid(xs, zs)
    dA = (xs[1] - xs[0]) * (zs[1] - zs[0])
    qp = np.asarray(q[0])
    dx, dy, dz = X - qp[0], 0.9988 - qp[1], Z - qp[2]
    r2 = dx**2 + dy**2 + dz**2
    cos_q_ = dy / np.sqrt(r2)
    cos_l_ = dy / np.sqrt(r2)  # light normal -y toward floor
    geo = cos_q_ * cos_l_ / r2
    ref = np.asarray([17.0, 12.0, 4.0]) * (geo.sum() * dA)
    assert np.allclose(est, ref, rtol=2e-2), (est, ref)


def test_xml_scene_gets_power_weighted_group_probs(tmp_path):
    """scene.cpp:131 m_emitterPDF analog: loader-built scenes select
    emitter groups by power, not uniformly (round-1 weak item 8)."""
    from mitsuba_tpu.scene import xml as xmllib
    p = tmp_path / "s.xml"
    p.write_text("""\
<scene version="0.6.0">
    <integrator type="direct"/>
    <sensor type="perspective">
        <film type="hdrfilm">
            <integer name="width" value="8"/><integer name="height" value="8"/>
        </film>
    </sensor>
    <shape type="rectangle">
        <emitter type="area"><rgb name="radiance" value="100, 100, 100"/></emitter>
    </shape>
    <shape type="cube"/>
    <emitter type="point">
        <point name="position" x="0" y="2" z="0"/>
        <rgb name="intensity" value="0.01, 0.01, 0.01"/>
    </emitter>
</scene>
""")
    scene, _, _, _ = xmllib.load_xml(p)
    gp = scene.group_probs
    assert len(gp) == 3
    # the bright area light dominates the dim point light
    assert gp[0] > 0.8 and gp[2] < 0.2 and abs(sum(gp) - 1) < 1e-6

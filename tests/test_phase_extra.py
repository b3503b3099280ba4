"""Kajiya-Kay + mixture phase functions (kkay.cpp, mixturephase.cpp):
normalization, mixture algebra, XML parsing, volpath end-to-end."""
import numpy as np
import jax.numpy as jnp

from mitsuba_tpu.models import phase


def _sphere_quad(n_t=128, n_p=256):
    xg, wg = np.polynomial.legendre.leggauss(n_t)
    phi = np.arange(n_p) * (2 * np.pi / n_p)
    ct, ph = np.meshgrid(xg, phi, indexing="ij")
    st = np.sqrt(np.maximum(1 - ct * ct, 0))
    d = np.stack([st * np.cos(ph), st * np.sin(ph), ct], -1).reshape(-1, 3)
    w = (wg[:, None] * np.ones((1, n_p)) * (2 * np.pi / n_p)).reshape(-1)
    return jnp.asarray(d, jnp.float32), w


def test_kkay_normalization():
    """ks=1, kd=0, perpendicular illumination -> unit energy (the
    normalization kkay.cpp computes by Simpson quadrature); the kd lobe
    integrates to kd independently."""
    wo, w = _sphere_quad()
    wi = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), wo.shape)
    params = (0.0, 0.0, 1.0, 1.0, 0.0, 4.0)     # axis z, ks=1, kd=0
    v, pdf = phase.eval_pdf(phase.PHASE_KKAY, jnp.float32(0), wi, wo, params)
    assert abs(float(jnp.sum(jnp.asarray(w) * v)) - 1.0) < 2e-3
    assert np.allclose(np.asarray(pdf), 1 / (4 * np.pi))
    params_d = (0.0, 0.0, 1.0, 0.0, 0.7, 4.0)   # pure diffuse kd=0.7
    v, _ = phase.eval_pdf(phase.PHASE_KKAY, jnp.float32(0), wi, wo, params_d)
    assert abs(float(jnp.sum(jnp.asarray(w) * v)) - 0.7) < 1e-3


def test_kkay_specular_cone_peak():
    """The specular lobe peaks on the mirrored cone about the fiber axis."""
    params = (0.0, 0.0, 1.0, 1.0, 0.0, 32.0)
    wi = jnp.asarray([[np.sin(0.4), 0.0, np.cos(0.4)]], jnp.float32)
    # mirrored direction: same transverse plane, axis component = -wi.z
    on_cone = jnp.asarray([[-np.sin(0.4), 0.0, -np.cos(0.4)]], jnp.float32)
    off_cone = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    v_on, _ = phase.eval_pdf(phase.PHASE_KKAY, jnp.float32(0), wi, on_cone,
                             params)
    v_off, _ = phase.eval_pdf(phase.PHASE_KKAY, jnp.float32(0), wi, off_cone,
                              params)
    assert float(v_on[0]) > 10 * float(v_off[0])


def test_mixture_eval_is_weighted_sum():
    wo, w = _sphere_quad(64, 128)
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), wo.shape)
    params = (phase.PHASE_ISOTROPIC, 0.3, 0.0, phase.PHASE_HG, 0.7, 0.5)
    v, pdf = phase.eval_pdf(phase.PHASE_MIXTURE, jnp.float32(0), wi, wo,
                            params)
    v_iso, _ = phase.eval_pdf(phase.PHASE_ISOTROPIC, jnp.float32(0), wi, wo)
    v_hg, _ = phase.eval_pdf(phase.PHASE_HG, jnp.float32(0.5), wi, wo)
    assert np.allclose(np.asarray(v), 0.3 * np.asarray(v_iso)
                       + 0.7 * np.asarray(v_hg), atol=1e-6)
    # energy = sum of weights; pdf integrates to 1
    assert abs(float(jnp.sum(jnp.asarray(w) * v)) - 1.0) < 2e-3
    assert abs(float(jnp.sum(jnp.asarray(w) * pdf)) - 1.0) < 2e-3


def test_mixture_sample_pdf_consistent():
    """Monte-Carlo: E[f(wo)/pdf(wo)] over sampled wo = integral of f."""
    import jax
    n = 1 << 14
    params = (phase.PHASE_ISOTROPIC, 0.5, 0.0, phase.PHASE_HG, 0.5, 0.7)
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    u2 = jax.random.uniform(jax.random.PRNGKey(0), (n, 2))
    wo, pdf = phase.sample(phase.PHASE_MIXTURE, jnp.float32(0), wi, u2,
                           params)
    assert np.allclose(np.linalg.norm(np.asarray(wo), axis=-1), 1, atol=1e-5)
    # estimate the integral of cos^2(theta to z) under the mixture pdf
    f = np.asarray(wo)[:, 2] ** 2
    est = np.mean(f / np.asarray(pdf))
    exact = 4 * np.pi / 3
    assert abs(est - exact) / exact < 0.05, est
    w_s = phase.sample_weight(phase.PHASE_MIXTURE, jnp.float32(0), wi, wo,
                              pdf, params)
    v, _ = phase.eval_pdf(phase.PHASE_MIXTURE, jnp.float32(0), wi, wo, params)
    assert np.allclose(np.asarray(w_s), np.asarray(v) / np.asarray(pdf),
                       atol=1e-5)


def test_phase_xml_parsing(tmp_path):
    """kkay + mixturephase parse from XML with their static params."""
    from mitsuba_tpu.scene import xml as xmllib

    template = """<scene version="0.6.0">
    <integrator type="volpath"/>
    <sensor type="perspective">
        <film type="hdrfilm">
            <integer name="width" value="8"/><integer name="height" value="8"/>
        </film>
    </sensor>
    <medium type="homogeneous">
        <rgb name="sigmaS" value="0.4, 0.4, 0.4"/>
        <rgb name="sigmaA" value="0.05, 0.05, 0.05"/>
        PHASE
    </medium>
    <shape type="cube"/>
</scene>
"""
    kkay_xml = template.replace("PHASE",
        '<phase type="kkay"><float name="ks" value="0.4"/>'
        '<float name="kd" value="0.2"/><float name="exponent" value="8"/>'
        '<vector name="orientation" x="0" y="1" z="0"/></phase>')
    mix_xml = template.replace("PHASE",
        '<phase type="mixturephase">'
        '<string name="weights" value="0.6, 0.4"/>'
        '<phase type="isotropic"/>'
        '<phase type="hg"><float name="g" value="0.6"/></phase></phase>')

    p = tmp_path / "kkay.xml"
    p.write_text(kkay_xml)
    scene, cam, cfg, integ = xmllib.load_xml(p)
    assert scene.medium.phase == phase.PHASE_KKAY
    assert scene.medium.phase_params == (0.0, 1.0, 0.0, 0.4, 0.2, 8.0)

    p = tmp_path / "mix.xml"
    p.write_text(mix_xml)
    scene, cam, cfg, integ = xmllib.load_xml(p)
    assert scene.medium.phase == phase.PHASE_MIXTURE
    assert scene.medium.phase_params == (
        phase.PHASE_ISOTROPIC, 0.6, 0.0, phase.PHASE_HG, 0.4, 0.6)


def test_volpath_with_kkay_and_mixture():
    """End-to-end volpath render with the new phase kinds: finite,
    non-negative, and energy comparable to the isotropic baseline."""
    from mitsuba_tpu.integrators import common, volpath
    from mitsuba_tpu.models import medium as medlib
    from mitsuba_tpu.scene import builtin

    scene, cam = builtin.cornell_box(width=8, height=8)
    cfg = common.RenderConfig(spp=16, max_depth=4, seed=0)

    base = scene.replace(medium=medlib.make_homogeneous(
        [0.1] * 3, [0.02] * 3, phase=phase.PHASE_ISOTROPIC))
    ref = np.asarray(common.render_jit(base, cam, volpath.li, cfg))

    kkay = scene.replace(medium=medlib.make_homogeneous(
        [0.1] * 3, [0.02] * 3, phase=phase.PHASE_KKAY,
        phase_params=(0.0, 0.0, 1.0, 0.4, 0.2, 4.0)))
    img_k = np.asarray(common.render_jit(kkay, cam, volpath.li, cfg))

    mix = scene.replace(medium=medlib.make_homogeneous(
        [0.1] * 3, [0.02] * 3, phase=phase.PHASE_MIXTURE,
        phase_params=(phase.PHASE_ISOTROPIC, 0.5, 0.0,
                      phase.PHASE_HG, 0.5, 0.5)))
    img_m = np.asarray(common.render_jit(mix, cam, volpath.li, cfg))

    for img in (img_k, img_m):
        assert np.isfinite(img).all() and img.min() >= 0
        assert img.mean() > 0.01
    # the unit-weight mixture scatters all energy like isotropic does
    assert abs(img_m.mean() - ref.mean()) / ref.mean() < 0.25
    # kkay with ks+kd=0.6 absorbs at scatter events -> dimmer volume term
    assert img_k.mean() <= ref.mean() * 1.05


# ---------------------------------------------------------------------------
# Microflake (Gaussian fiber distribution)
# ---------------------------------------------------------------------------


def test_microflake_normalized():
    """The flake phase function integrates to 1 over wo for any wi
    (the 0.5 D(H)/sigma_t(wi) form is the exact density of the
    flake-normal sampling scheme)."""
    params = phase.make_microflake_params(0.3)
    wo, w = _sphere_quad()
    for wi_dir in ([0.0, 0.0, 1.0], [1.0, 0.0, 0.0],
                   [0.6, 0.0, 0.8]):
        wi = jnp.broadcast_to(jnp.asarray(wi_dir), wo.shape)
        v, pdf = phase.eval_pdf(phase.PHASE_MICROFLAKE, jnp.float32(0),
                                wi, wo, params)
        total = float(jnp.sum(jnp.asarray(w) * v))
        assert abs(total - 1.0) < 2e-2, (wi_dir, total)
        assert np.allclose(np.asarray(v), np.asarray(pdf))


def test_microflake_anisotropy():
    """Tighter stddev concentrates scattering: for wi perpendicular to
    the fiber, specular-cone directions dominate the axis direction."""
    tight = phase.make_microflake_params(0.05)
    wi = jnp.asarray([[0.6, 0.0, 0.8]])
    # mirror through an equatorial flake normal flips the inclination
    # sign: that's on the fiber specular cone (H lands at cos theta = 0)
    wo_cone = jnp.asarray([[0.6, 0.0, -0.8]])
    wo_axis = jnp.asarray([[0.0, 0.0, 1.0]])    # H far from the equator
    v_cone, _ = phase.eval_pdf(phase.PHASE_MICROFLAKE, jnp.float32(0),
                               wi, wo_cone, tight)
    v_axis, _ = phase.eval_pdf(phase.PHASE_MICROFLAKE, jnp.float32(0),
                               wi, wo_axis, tight)
    assert float(v_cone[0]) > 50 * float(v_axis[0])


def test_microflake_sample_matches_eval():
    """Sampled wo histogram moment matches quadrature under the eval
    density; acceptance is near-total for the 16-candidate scheme."""
    import jax
    params = phase.make_microflake_params(0.2)
    n = 1 << 14
    wi = jnp.broadcast_to(jnp.asarray([0.8, 0.0, 0.6]), (n, 3))
    u2 = jax.random.uniform(jax.random.PRNGKey(4), (n, 2))
    wo, pdf = phase.sample(phase.PHASE_MICROFLAKE, jnp.float32(0), wi, u2,
                           params)
    acc = float(jnp.mean(pdf > 0))
    assert acc > 0.995, acc
    ok = np.asarray(pdf) > 0
    stat = float(np.mean(np.asarray(wo)[ok, 2] ** 2))
    # quadrature reference for E[wo_z^2]
    wo_q, w_q = _sphere_quad()
    v, _ = phase.eval_pdf(phase.PHASE_MICROFLAKE, jnp.float32(0),
                          jnp.broadcast_to(wi[0], wo_q.shape), wo_q, params)
    ref = float(jnp.sum(jnp.asarray(w_q) * v * wo_q[:, 2] ** 2))
    assert abs(stat - ref) < 0.03, (stat, ref)


def test_volpath_with_microflake():
    from mitsuba_tpu.integrators import common, volpath
    from mitsuba_tpu.models import medium as medlib
    from mitsuba_tpu.scene import builtin

    scene, cam = builtin.cornell_box(width=8, height=8)
    params = phase.make_microflake_params(0.3, (0.0, 1.0, 0.0))
    mf = scene.replace(medium=medlib.make_homogeneous(
        [0.1] * 3, [0.02] * 3, phase=phase.PHASE_MICROFLAKE,
        phase_params=params))
    img = np.asarray(common.render_jit(
        mf, cam, volpath.li, common.RenderConfig(spp=16, max_depth=4,
                                                 seed=0)))
    assert np.isfinite(img).all() and img.min() >= 0
    assert img.mean() > 0.01

"""Irawan-Marschner woven cloth BSDF (irawan.{h,cpp} analog):
weave-format parsing, specular normalization energy, sample/pdf
consistency, and an end-to-end textured render."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mitsuba_tpu.models import cloth


def test_parse_weave_format():
    pat = cloth.parse_weave(cloth.PRESET_COTTON)
    assert pat.tile_width == 2 and pat.tile_height == 2
    assert len(pat.yarns) == 2
    assert list(pat.pattern) == [1, 2, 2, 1]
    y = pat.yarns[0]
    assert y.type == 0 and y.psi == pytest.approx(np.deg2rad(30))
    assert y.umax == pytest.approx(np.deg2rad(25))
    assert np.allclose(y.kd, [0.35, 0.33, 0.30])
    assert pat.yarns[1].type == 1


def test_parse_weave_var_substitution():
    text = cloth.PRESET_SILK.replace("beta = 10.0", "beta = $myBeta")
    pat = cloth.parse_weave(text, {"myBeta": 7.5})
    assert pat.beta == pytest.approx(7.5)


def _packed_sp(pat, n, seed=0):
    cloth.compute_normalization(pat)
    tables = cloth.build_tables([(pat, 1.0, 1.0)], 1, {0: 0})
    uv = jax.random.uniform(jax.random.PRNGKey(seed), (n, 2))
    over = cloth.gather_yarn(tables, jnp.zeros((n,), jnp.int32), uv)
    return cloth._SpLike(over["specular"], over["reflectance"],
                         over["eta"], over["k"], over["alpha"],
                         over["extra"])


@pytest.mark.parametrize("preset", ["cotton", "silk"])
def test_irawan_energy_bounded(preset):
    """Furnace-style bound: the normalization scheme (configure(),
    irawan.cpp:139-171) pins the cosine-averaged specular response near
    ks, so total reflectance stays near kd+ks and below 1.25 (the
    normalization is an average, not a sup, so mild overshoot at grazing
    configurations is expected and matches the reference)."""
    pat = cloth.parse_weave(cloth.PRESETS[preset])
    n = 1 << 14
    sp = _packed_sp(pat, n)
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    from mitsuba_tpu.core import warp
    wi = warp.square_to_cosine_hemisphere(jax.random.uniform(k1, (n, 2)))
    wo = warp.square_to_cosine_hemisphere(jax.random.uniform(k2, (n, 2)))
    f, pdf = cloth.eval_packed(sp, wi, wo)
    albedo = np.asarray(jnp.mean(jnp.max(f, -1)
                                 / jnp.maximum(pdf, 1e-9)))
    assert 0.15 < float(albedo) < 1.25, albedo
    assert np.isfinite(np.asarray(f)).all()
    assert np.asarray(f).min() >= 0


def test_irawan_bsdf_dispatch_and_sampling():
    """Through the generic bsdf.sample path: wo upper hemisphere,
    weight * pdf == eval (value/pdf weighting like irawan.cpp:354)."""
    from mitsuba_tpu.models import bsdf as bsdflib

    pat = cloth.parse_weave(cloth.PRESET_COTTON)
    n = 4096
    sp_like = _packed_sp(pat, n, seed=3)
    from mitsuba_tpu.models.bsdf import ShadePoint
    from mitsuba_tpu.scene import ir
    sp = ShadePoint(
        type=jnp.full((n,), ir.BSDF_IRAWAN, jnp.int32),
        reflectance=sp_like.reflectance, specular=sp_like.specular,
        eta=sp_like.eta, k=sp_like.k, alpha=sp_like.alpha,
        extra=sp_like.extra)
    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    wi = jnp.tile(jnp.asarray([[0.3, 0.2, 0.93]]), (n, 1))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    u2 = jax.random.uniform(k2, (n, 2))
    u1 = jax.random.uniform(k3, (n,))
    fams = (ir.BSDF_IRAWAN,)
    wo, weight, pdf, is_delta = bsdflib.sample(sp, wi, u1, u2, fams)
    assert float(jnp.min(wo[:, 2])) >= 0
    assert not bool(jnp.any(is_delta))
    f, pdf2 = bsdflib.eval_pdf(sp, wi, wo, fams)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(weight * pdf[:, None]), np.asarray(f), atol=1e-3)


def test_irawan_render_xml(tmp_path):
    """End-to-end: irawan preset over a quad under a constant light —
    finite, non-black, and spatially varying (the weave texture)."""
    from mitsuba_tpu.scene import xml as xmllib
    from mitsuba_tpu.integrators import common, path

    p = tmp_path / "cloth.xml"
    p.write_text("""<scene version="0.6.0">
    <integrator type="path"><integer name="maxDepth" value="3"/></integrator>
    <sensor type="perspective">
        <float name="fov" value="40"/>
        <transform name="toWorld">
            <lookat origin="0, 0.4, 2.2" target="0, 0, 0" up="0, 1, 0"/>
        </transform>
        <film type="hdrfilm">
            <integer name="width" value="24"/><integer name="height" value="24"/>
        </film>
    </sensor>
    <emitter type="constant"><rgb name="radiance" value="1, 1, 1"/></emitter>
    <shape type="rectangle">
        <transform name="toWorld">
            <rotate x="1" angle="-90"/>
        </transform>
        <bsdf type="irawan">
            <string name="preset" value="cotton"/>
            <float name="repeatU" value="6"/>
            <float name="repeatV" value="6"/>
        </bsdf>
    </shape>
</scene>
""")
    scene, cam, cfg, integ = xmllib.load_xml(p)
    assert scene.cloth is not None
    img = np.asarray(common.render_jit(
        scene, cam, path.li, common.RenderConfig(spp=32, max_depth=3,
                                                 seed=0)))
    assert np.isfinite(img).all() and img.min() >= 0
    assert img.mean() > 0.03, img.mean()
    # weave structure: the lit quad shows spatial variation
    assert img.std() > 0.005, img.std()

"""ERPT, VPL, adaptive sampling, new BSDFs, Hammersley — cross-validation
against the path tracer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.integrators import common, erpt, path, vpl
from mitsuba_tpu.scene import builtin, ir
from mitsuba_tpu.utils import adaptive


@pytest.fixture(scope="module")
def cornell16():
    return builtin.cornell_box(width=16, height=16)


@pytest.fixture(scope="module")
def ref_img(cornell16):
    scene, cam = cornell16
    cfg = common.RenderConfig(spp=128, max_depth=4, seed=0)
    return np.asarray(common.render_jit(scene, cam, path.li, cfg))


def test_erpt_brightness(cornell16, ref_img):
    scene, cam = cornell16
    img = np.asarray(erpt.render_jit(
        scene, cam, common.RenderConfig(spp=1, max_depth=4, seed=2),
        n_chains=1 << 12, chain_length=64, n_bootstrap=1 << 14))
    assert np.isfinite(img).all() and img.min() >= 0
    assert abs(img.mean() - ref_img.mean()) / ref_img.mean() < 0.1


def test_vpl_preview(cornell16, ref_img):
    scene, cam = cornell16
    cfg = common.RenderConfig(spp=32, max_depth=4, seed=1)
    img = np.asarray(common.render_jit(scene, cam, vpl.li, cfg))
    assert np.isfinite(img).all() and img.min() >= 0
    # VPL clamping loses some energy; preview-grade agreement
    assert abs(img.mean() - ref_img.mean()) / ref_img.mean() < 0.35


def test_adaptive_focuses_samples(cornell16, ref_img):
    scene, cam = cornell16
    cfg = common.RenderConfig(spp=64, max_depth=3, seed=3)
    img, spp_map = adaptive.render_adaptive(
        scene, cam, path.li, cfg, base_spp=8, batch_spp=8, max_spp=64,
        max_error=0.02,
    )
    assert np.isfinite(img).all()
    assert spp_map.min() >= 8 and spp_map.max() <= 64
    assert spp_map.max() > spp_map.min()  # actually adapted somewhere
    assert abs(img.mean() - ref_img.mean()) / ref_img.mean() < 0.08


def test_ward_energy_and_chi2():
    from mitsuba_tpu.models import bsdf as bsdflib
    from mitsuba_tpu.utils.chi2 import spherical_chi2
    from tests.test_bsdf import WI, make_sp

    rec = {"type": ir.BSDF_WARD, "reflectance": [0.3, 0.3, 0.3],
           "specular": [0.3, 0.3, 0.3], "alpha": [0.15, 0.3]}
    fam = (ir.BSDF_WARD,)
    n = 1 << 17

    def sf(u2):
        sp = make_sp(u2.shape[0], **rec)
        wi = jnp.broadcast_to(WI, (u2.shape[0], 3))
        ul = jax.random.uniform(jax.random.PRNGKey(99), (u2.shape[0],))
        wo, w, p, isd = bsdflib.sample(sp, wi, ul, u2, fam)
        sf.ok = np.asarray((p > 0) & ~isd, np.float64)
        return wo

    def pf(v):
        sp = make_sp(v.shape[0], **rec)
        wi = jnp.broadcast_to(WI, (v.shape[0], 3))
        _, p = bsdflib.eval_pdf(sp, wi, v, fam)
        return p

    sf(jax.random.uniform(jax.random.PRNGKey(3), (n, 2)))
    passed, p, stats = spherical_chi2(sf, pf, n_samples=n,
                                      sample_weights=sf.ok, seed=3,
                                      significance=0.001)
    assert passed, (p, stats)


def test_blend_bsdf_render(tmp_path):
    from mitsuba_tpu.scene import xml as xmllib

    p = tmp_path / "s.xml"
    p.write_text("""\
<scene version="0.6.0">
    <integrator type="path"><integer name="maxDepth" value="3"/></integrator>
    <sensor type="perspective">
        <transform name="toWorld"><lookat origin="0,1,3" target="0,0,0"/></transform>
        <film type="hdrfilm">
            <integer name="width" value="12"/><integer name="height" value="12"/>
        </film>
    </sensor>
    <shape type="rectangle">
        <transform name="toWorld"><rotate x="1" angle="-90"/><scale value="2"/></transform>
        <bsdf type="blendbsdf">
            <float name="weight" value="0.5"/>
            <bsdf type="diffuse"><rgb name="reflectance" value="0.8, 0.1, 0.1"/></bsdf>
            <bsdf type="roughconductor"><float name="alpha" value="0.2"/></bsdf>
        </bsdf>
    </shape>
    <shape type="rectangle">
        <transform name="toWorld"><rotate x="1" angle="90"/><translate y="3"/></transform>
        <emitter type="area"><rgb name="radiance" value="10, 10, 10"/></emitter>
    </shape>
</scene>
""")
    scene, cam, cfg, _ = xmllib.load_xml(p)
    assert ir.BSDF_BLEND in scene.bsdf_families
    img = np.asarray(common.render_jit(scene, cam, path.li, cfg))
    assert np.isfinite(img).all() and img.max() > 0


def test_hammersley_sampler():
    from mitsuba_tpu.samplers import qmc

    n = 64
    sample = jnp.arange(n, dtype=jnp.uint32)
    px = jnp.zeros((n,), jnp.uint32)
    x = np.asarray(qmc.sample_dim(qmc.SAMPLER_HAMMERSLEY, jnp.uint32(0),
                                  px, sample, 0, n))
    # dim 0 is i/N + rotation: equispaced modulo 1
    xs = np.sort(x)
    gaps = np.diff(xs)
    assert np.allclose(gaps, 1.0 / n, atol=1e-5)

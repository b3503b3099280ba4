"""BSDF statistical verification: sample() matches pdf() (chi-square, the
reference's test_chisquare.cpp idea), sample weights match eval/pdf, and
energy conservation (white furnace bound)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.core import math as m
from mitsuba_tpu.models import bsdf as bsdflib
from mitsuba_tpu.scene import ir
from mitsuba_tpu.utils.chi2 import spherical_chi2


def make_sp(n, **rec):
    mats = ir.Materials.stack([rec])

    def g(field):
        return jnp.broadcast_to(getattr(mats, field)[0], (n,) + getattr(mats, field)[0].shape)

    return bsdflib.ShadePoint(
        type=g("type"), reflectance=g("reflectance"), specular=g("specular"),
        eta=g("eta"), k=g("k"), alpha=g("alpha"), extra=g("extra"),
    )


WI = m.normalize(jnp.asarray([0.3, -0.2, 0.8]))

CASES = {
    "diffuse": {"type": ir.BSDF_DIFFUSE, "reflectance": [0.8, 0.8, 0.8]},
    "rough_conductor_ggx": {
        "type": ir.BSDF_ROUGH_CONDUCTOR, "alpha": [0.3, 0.3],
        "eta": [0.2, 0.92, 1.1], "k": [3.9, 2.45, 2.14],
        "extra": [0, 0, 0, ir.MICROFACET_GGX],
    },
    "rough_conductor_beckmann": {
        "type": ir.BSDF_ROUGH_CONDUCTOR, "alpha": [0.25, 0.25],
        "eta": [0.2, 0.92, 1.1], "k": [3.9, 2.45, 2.14],
        "extra": [0, 0, 0, ir.MICROFACET_BECKMANN],
    },
    "plastic": {"type": ir.BSDF_PLASTIC, "reflectance": [0.5, 0.2, 0.1]},
    "phong": {"type": ir.BSDF_PHONG, "reflectance": [0.4, 0.4, 0.4],
              "specular": [0.3, 0.3, 0.3], "extra": [30.0, 0, 0, 0]},
    "rough_diffuse": {"type": ir.BSDF_ROUGH_DIFFUSE, "reflectance": [0.7, 0.7, 0.7],
                      "alpha": [0.3, 0.3]},
    "rough_plastic": {"type": ir.BSDF_ROUGH_PLASTIC, "reflectance": [0.5, 0.3, 0.2],
                      "alpha": [0.3, 0.3], "extra": [0, 0, 0, ir.MICROFACET_GGX]},
    "rough_dielectric": {"type": ir.BSDF_ROUGH_DIELECTRIC, "eta": [1.5, 1.5, 1.5],
                         "alpha": [0.3, 0.3], "reflectance": [1, 1, 1],
                         "specular": [1, 1, 1],
                         "extra": [0, 0, 0, ir.MICROFACET_GGX]},
}

FAMS_ALL = tuple(sorted({r["type"] for r in CASES.values()}))


@pytest.mark.parametrize("name", list(CASES))
def test_sample_matches_pdf(name):
    rec = CASES[name]
    fam = (rec["type"],)
    n = 1 << 18

    def sample_fn(u2):
        sp = make_sp(u2.shape[0], **rec)
        wi = jnp.broadcast_to(WI, (u2.shape[0], 3))
        u_lobe = jax.random.uniform(jax.random.PRNGKey(99), (u2.shape[0],))
        wo, w, pdf, is_delta = bsdflib.sample(sp, wi, u_lobe, u2, fam)
        # reject delta lanes + failed samples (weight convention: pdf=0)
        ok = (pdf > 0) & ~is_delta
        sample_fn.weights = np.asarray(ok, np.float64)
        return wo

    def pdf_fn(v):
        sp = make_sp(v.shape[0], **rec)
        wi = jnp.broadcast_to(WI, (v.shape[0], 3))
        _, pdf = bsdflib.eval_pdf(sp, wi, v, fam)
        return pdf

    def sf(u2):
        return sample_fn(u2)

    passed, p, stats = spherical_chi2(
        sf, pdf_fn, n_samples=n, sample_weights=None, seed=3,
        significance=0.001,
    )
    # plastic/phong include delta or rejected lanes: redo with weights
    if not passed:
        wo = sf(jax.random.uniform(jax.random.PRNGKey(3), (n, 2)))
        passed, p, stats = spherical_chi2(
            sf, pdf_fn, n_samples=n, sample_weights=sample_fn.weights,
            seed=3, significance=0.001,
        )
    assert passed, f"{name}: p={p} {stats}"


@pytest.mark.parametrize("name", [k for k in CASES])
def test_sample_weight_consistency(name):
    """weight == eval/pdf on non-delta lanes (libbidir/verification.cpp:31
    style self-check, tolerance 1e-3 relative)."""
    rec = CASES[name]
    fam = (rec["type"],)
    n = 4096
    key = jax.random.PRNGKey(5)
    u2 = jax.random.uniform(key, (n, 2))
    u_lobe = jax.random.uniform(jax.random.PRNGKey(6), (n,))
    sp = make_sp(n, **rec)
    wi = jnp.broadcast_to(WI, (n, 3))
    wo, w, pdf, is_delta = bsdflib.sample(sp, wi, u_lobe, u2, fam)
    f, pdf2 = bsdflib.eval_pdf(sp, wi, wo, fam)
    ok = np.asarray((pdf > 1e-4) & ~is_delta)
    w_np = np.asarray(w)[ok]
    ref = np.asarray(f)[ok] / np.asarray(pdf2)[ok][:, None]
    assert np.asarray(pdf)[ok] == pytest.approx(np.asarray(pdf2)[ok], rel=2e-3)
    assert np.allclose(w_np, ref, rtol=5e-3, atol=1e-4), name


@pytest.mark.parametrize(
    "name", ["diffuse", "rough_conductor_ggx", "plastic", "phong", "rough_diffuse"]
)
def test_energy_conservation(name):
    """Integral of weight over samples <= 1 per channel (no BSDF gains)."""
    rec = CASES[name]
    fam = (rec["type"],)
    n = 1 << 16
    u2 = jax.random.uniform(jax.random.PRNGKey(7), (n, 2))
    u_lobe = jax.random.uniform(jax.random.PRNGKey(8), (n,))
    sp = make_sp(n, **rec)
    wi = jnp.broadcast_to(WI, (n, 3))
    wo, w, pdf, is_delta = bsdflib.sample(sp, wi, u_lobe, u2, fam)
    albedo = np.asarray(jnp.mean(jnp.where((pdf > 0)[:, None], w, 0.0), axis=0))
    assert np.all(albedo <= 1.02), (name, albedo)


def test_delta_bsdfs():
    """Smooth conductor/dielectric: delta flags set, energy correct."""
    n = 1024
    wi = jnp.broadcast_to(WI, (n, 3))
    u2 = jax.random.uniform(jax.random.PRNGKey(9), (n, 2))
    # conductor: mirror reflection
    sp = make_sp(n, type=ir.BSDF_CONDUCTOR, eta=[0.2, 0.92, 1.1], k=[3.9, 2.45, 2.14])
    wo, w, pdf, is_delta = bsdflib.sample(
        sp, wi, jnp.zeros(n), u2, (ir.BSDF_CONDUCTOR,)
    )
    assert bool(jnp.all(is_delta))
    assert np.allclose(np.asarray(wo), np.asarray(m.reflect_local(wi)), atol=1e-6)
    # dielectric: reflection + refraction branches both appear
    sp = make_sp(n, type=ir.BSDF_DIELECTRIC, eta=[1.5, 1.5, 1.5],
                 reflectance=[1, 1, 1], specular=[1, 1, 1])
    u_lobe = jax.random.uniform(jax.random.PRNGKey(10), (n,))
    wo, w, pdf, is_delta = bsdflib.sample(sp, wi, u_lobe, u2, (ir.BSDF_DIELECTRIC,))
    sides = np.asarray(m.cos_theta(wo))
    assert (sides > 0).any() and (sides < 0).any()
    # unpolarized reciprocity sanity: all weights finite, <= ~1.1
    assert np.all(np.isfinite(np.asarray(w)))


def test_rough_dielectric_furnace():
    """Lossless rough glass: reflected + transmitted energy ~= 1."""
    n = 1 << 16
    wi = jnp.broadcast_to(WI, (n, 3))
    sp = make_sp(n, **CASES["rough_dielectric"])
    u_lobe = jax.random.uniform(jax.random.PRNGKey(20), (n,))
    u2 = jax.random.uniform(jax.random.PRNGKey(21), (n, 2))
    wo, w, pdf, _ = bsdflib.sample(sp, wi, u_lobe, u2,
                                   (ir.BSDF_ROUGH_DIELECTRIC,))
    total = np.asarray(jnp.mean(jnp.where((pdf > 0)[:, None], w, 0.0), 0))
    # radiance transport: transmission into the denser medium carries the
    # 1/eta^2 compression (dielectric.cpp:241 convention), so the expected
    # mean weight is F + (1-F)/eta^2 ~= 0.47 for eta=1.5 — NOT 1.0
    fr_avg = 0.08  # rough average Fresnel at this incidence
    expect = fr_avg + (1 - fr_avg) / 1.5**2
    assert np.all(np.abs(total - expect) < 0.12), (total, expect)
    # both sides reached
    sides = np.asarray(wo[:, 2])[np.asarray(pdf) > 0]
    assert (sides > 0).any() and (sides < 0).any()


def test_dielectric_energy_split():
    """Reflection probability equals Fresnel: E[weight] == 1 (both lobes
    tinted white), matching dielectric.cpp radiance transport."""
    n = 1 << 16
    wi = jnp.broadcast_to(WI, (n, 3))
    sp = make_sp(n, type=ir.BSDF_DIELECTRIC, eta=[1.5, 1.5, 1.5],
                 reflectance=[1, 1, 1], specular=[1, 1, 1])
    u_lobe = jax.random.uniform(jax.random.PRNGKey(11), (n,))
    u2 = jax.random.uniform(jax.random.PRNGKey(12), (n, 2))
    wo, w, pdf, _ = bsdflib.sample(sp, wi, u_lobe, u2, (ir.BSDF_DIELECTRIC,))
    # each lane's weight: reflect -> 1; transmit -> eta_ti^2 ("radiance
    # compression"); reciprocal transport sums to < 1 on average
    wm = np.asarray(w).mean(0)
    assert np.all(wm > 0.4) and np.all(wm <= 1.01), wm


# ---------------------------------------------------------------------------
# Coating (src/bsdfs/coating.cpp) + HK slab (src/bsdfs/hk.cpp)
# ---------------------------------------------------------------------------

def make_coated_sp(n, coat_rec, nested_rec):
    mats = ir.Materials.stack([coat_rec, nested_rec])

    def g(field, i):
        return jnp.broadcast_to(getattr(mats, field)[i],
                                (n,) + getattr(mats, field)[i].shape)

    nested = bsdflib.ShadePoint(
        type=g("type", 1), reflectance=g("reflectance", 1),
        specular=g("specular", 1), eta=g("eta", 1), k=g("k", 1),
        alpha=g("alpha", 1), extra=g("extra", 1))
    return bsdflib.ShadePoint(
        type=g("type", 0), reflectance=g("reflectance", 0),
        specular=g("specular", 0), eta=g("eta", 0), k=g("k", 0),
        alpha=g("alpha", 0), extra=g("extra", 0), nested=nested)


COAT_SMOOTH = {"type": ir.BSDF_COATING, "reflectance": [0.1, 0.2, 0.3],
               "eta": [1.5, 1.5, 1.5], "alpha": [0.0, 0.0],
               "extra": [0.4, 0, 0, ir.MICROFACET_GGX]}
COAT_ROUGH = {"type": ir.BSDF_COATING, "reflectance": [0.0, 0.0, 0.0],
              "eta": [1.5, 1.5, 1.5], "alpha": [0.2, 0.2],
              "extra": [0.4, 0, 0, ir.MICROFACET_GGX]}
NESTED_RC = {"type": ir.BSDF_ROUGH_CONDUCTOR, "alpha": [0.3, 0.3],
             "eta": [0.2, 0.92, 1.1], "k": [3.9, 2.45, 2.14],
             "extra": [0, 0, 0, ir.MICROFACET_GGX]}
COAT_FAMS = (ir.BSDF_COATING, ir.BSDF_ROUGH_CONDUCTOR)


@pytest.mark.parametrize("coat", [COAT_SMOOTH, COAT_ROUGH],
                         ids=["smooth", "rough"])
def test_coating_sample_matches_pdf(coat):
    n = 1 << 18

    def sample_fn(u2):
        sp = make_coated_sp(u2.shape[0], coat, NESTED_RC)
        wi = jnp.broadcast_to(WI, (u2.shape[0], 3))
        u_lobe = jax.random.uniform(jax.random.PRNGKey(99), (u2.shape[0],))
        wo, w, pdf, is_delta = bsdflib.sample(sp, wi, u_lobe, u2, COAT_FAMS)
        sample_fn.weights = np.asarray((pdf > 0) & ~is_delta, np.float64)
        return wo

    def pdf_fn(v):
        sp = make_coated_sp(v.shape[0], coat, NESTED_RC)
        wi = jnp.broadcast_to(WI, (v.shape[0], 3))
        _, pdf = bsdflib.eval_pdf(sp, wi, v, COAT_FAMS)
        return pdf

    sample_fn(jax.random.uniform(jax.random.PRNGKey(3), (n, 2)))
    passed, p, stats = spherical_chi2(
        sample_fn, pdf_fn, n_samples=n, sample_weights=sample_fn.weights,
        seed=3, significance=0.001)
    assert passed, f"p={p} {stats}"


def test_coating_weight_consistency():
    n = 4096
    sp = make_coated_sp(n, COAT_ROUGH, NESTED_RC)
    wi = jnp.broadcast_to(WI, (n, 3))
    u2 = jax.random.uniform(jax.random.PRNGKey(5), (n, 2))
    u_lobe = jax.random.uniform(jax.random.PRNGKey(6), (n,))
    wo, w, pdf, is_delta = bsdflib.sample(sp, wi, u_lobe, u2, COAT_FAMS)
    f, pdf2 = bsdflib.eval_pdf(sp, wi, wo, COAT_FAMS)
    ok = np.asarray((pdf > 1e-3) & ~is_delta)
    assert ok.sum() > n // 4
    assert np.asarray(pdf)[ok] == pytest.approx(np.asarray(pdf2)[ok], rel=3e-3)
    ref = np.asarray(f)[ok] / np.asarray(pdf2)[ok][:, None]
    w_np = np.asarray(w)[ok]
    # sampled weights are clipped at 16; compare unclipped lanes
    unclipped = (w_np < 15.9).all(-1)
    assert np.allclose(w_np[unclipped], ref[unclipped], rtol=1e-2, atol=1e-3)


def test_coating_energy_and_absorption():
    """Coated conductor reflects less than bare; tinted coat absorbs more;
    total energy <= 1."""
    n = 1 << 16
    wi = jnp.broadcast_to(WI, (n, 3))
    u2 = jax.random.uniform(jax.random.PRNGKey(7), (n, 2))
    u_lobe = jax.random.uniform(jax.random.PRNGKey(8), (n,))

    def total(coat_rec):
        sp = make_coated_sp(n, coat_rec, NESTED_RC)
        wo, w, pdf, _ = bsdflib.sample(sp, wi, u_lobe, u2, COAT_FAMS)
        return np.asarray(jnp.mean(jnp.where((pdf > 0)[:, None], w, 0.0), 0))

    clear = dict(COAT_SMOOTH, reflectance=[0.0, 0.0, 0.0])
    tinted = dict(COAT_SMOOTH, reflectance=[0.5, 0.5, 0.5])
    t_clear, t_tinted = total(clear), total(tinted)
    assert np.all(t_clear <= 1.02) and np.all(t_tinted <= 1.02)
    assert np.all(t_tinted < t_clear)  # absorption removes energy
    # bare rough copper reflects more than the coated version overall
    sp_bare = make_sp(n, **NESTED_RC)
    _, w_b, pdf_b, _ = bsdflib.sample(sp_bare, wi, u_lobe, u2,
                                      (ir.BSDF_ROUGH_CONDUCTOR,))
    t_bare = np.asarray(jnp.mean(jnp.where((pdf_b > 0)[:, None], w_b, 0.0), 0))
    assert t_tinted.mean() < t_bare.mean()


HK_REC = {"type": ir.BSDF_HK, "reflectance": [0.4, 0.8, 1.2],
          "specular": [0.1, 0.1, 0.1], "extra": [0.3, 0, 0, 0]}


def test_hk_sample_matches_pdf():
    n = 1 << 18

    def sample_fn(u2):
        sp = make_sp(u2.shape[0], **HK_REC)
        wi = jnp.broadcast_to(WI, (u2.shape[0], 3))
        u_lobe = jax.random.uniform(jax.random.PRNGKey(99), (u2.shape[0],))
        wo, w, pdf, is_delta = bsdflib.sample(sp, wi, u_lobe, u2,
                                              (ir.BSDF_HK,))
        sample_fn.weights = np.asarray((pdf > 0) & ~is_delta, np.float64)
        return wo

    def pdf_fn(v):
        sp = make_sp(v.shape[0], **HK_REC)
        wi = jnp.broadcast_to(WI, (v.shape[0], 3))
        _, pdf = bsdflib.eval_pdf(sp, wi, v, (ir.BSDF_HK,))
        return pdf

    sample_fn(jax.random.uniform(jax.random.PRNGKey(3), (n, 2)))
    passed, p, stats = spherical_chi2(
        sample_fn, pdf_fn, n_samples=n, sample_weights=sample_fn.weights,
        seed=3, significance=0.001)
    assert passed, f"p={p} {stats}"


def test_hk_limits():
    """tauD -> 0: pure attenuated (here lossless) delta transmission;
    energy conservation for the scattering slab (hk.cpp:106 note)."""
    n = 1 << 14
    wi = jnp.broadcast_to(WI, (n, 3))
    u2 = jax.random.uniform(jax.random.PRNGKey(9), (n, 2))
    u_lobe = jax.random.uniform(jax.random.PRNGKey(10), (n,))
    thin = make_sp(n, type=ir.BSDF_HK, reflectance=[0, 0, 0],
                   specular=[0, 0, 0])
    wo, w, pdf, is_delta = bsdflib.sample(thin, wi, u_lobe, u2, (ir.BSDF_HK,))
    assert bool(jnp.all(is_delta))
    assert np.allclose(np.asarray(wo), np.asarray(-wi), atol=1e-6)
    assert np.allclose(np.asarray(w), 1.0, atol=1e-5)
    # purely scattering slab: total outgoing energy <= 1 (single-scatter
    # model discards multiple scattering, so strictly < 1)
    scat = make_sp(n, type=ir.BSDF_HK, reflectance=[1.5, 1.5, 1.5],
                   specular=[0, 0, 0], extra=[0.0, 0, 0, 0])
    wo, w, pdf, is_delta = bsdflib.sample(scat, wi, u_lobe, u2, (ir.BSDF_HK,))
    total = np.asarray(jnp.mean(jnp.where((pdf > 0)[:, None], w, 0.0), 0))
    assert np.all(total <= 1.0 + 1e-3), total
    assert np.all(total > 0.3)

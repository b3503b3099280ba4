"""Participating media tests: phase chi2, transmittance closed forms, and
volumetric rendering sanity (volpath_simple.cpp analog behavior)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.models import medium as medlib, phase as phaselib
from mitsuba_tpu.utils.chi2 import spherical_chi2

WI = jnp.asarray([0.0, 0.0, 1.0])


@pytest.mark.parametrize("kind,g", [
    (phaselib.PHASE_ISOTROPIC, 0.0),
    (phaselib.PHASE_HG, 0.3),
    (phaselib.PHASE_HG, -0.7),
    (phaselib.PHASE_RAYLEIGH, 0.0),
])
def test_phase_sample_matches_pdf(kind, g):
    gv = jnp.float32(g)

    def sample_fn(u2):
        wi = jnp.broadcast_to(WI, (u2.shape[0], 3))
        wo, _ = phaselib.sample(kind, gv, wi, u2)
        return wo

    def pdf_fn(v):
        wi = jnp.broadcast_to(WI, (v.shape[0], 3))
        _, pdf = phaselib.eval_pdf(kind, gv, wi, v)
        return pdf

    passed, p, stats = spherical_chi2(sample_fn, pdf_fn, n_samples=1 << 18,
                                      significance=0.001, seed=4)
    assert passed, (kind, g, p, stats)
    assert abs(stats["pdf_mass"] - 1.0) < 0.02, stats


def test_hg_mean_cosine():
    """E[cos theta] of HG samples equals g (textbook identity)."""
    g = 0.6
    u2 = jax.random.uniform(jax.random.PRNGKey(0), (1 << 18, 2))
    wi = jnp.broadcast_to(WI, (u2.shape[0], 3))
    wo, _ = phaselib.sample(phaselib.PHASE_HG, jnp.float32(g), wi, u2)
    # forward direction is -wi
    mc = float(jnp.mean(jnp.sum(wo * (-wi), -1)))
    assert abs(mc - g) < 5e-3, mc


def test_transmittance_and_distance_sampling():
    med = medlib.make_homogeneous([0.5, 1.0, 2.0], [0.1, 0.1, 0.1])
    dist = jnp.asarray([0.0, 1.0, 3.0])
    tr = np.asarray(medlib.transmittance(med, dist))
    sig = np.asarray(med.sigma_t)
    assert np.allclose(tr, np.exp(-sig[None, :] * np.asarray(dist)[:, None]), rtol=1e-5)

    # unbiasedness: E[w_med * 1_med + w_surf * 1_surf] == Tr(t_surf) + int sigma_s Tr
    n = 1 << 18
    key = jax.random.PRNGKey(1)
    u1 = jax.random.uniform(key, (n,))
    u2 = jax.random.uniform(jax.random.PRNGKey(2), (n,))
    t_surf = jnp.full((n,), 1.5)
    t, is_med, w_med, w_surf = medlib.sample_distance(med, u1, u2, t_surf)
    est_surf = np.asarray(jnp.mean(jnp.where(is_med[:, None], 0.0, w_surf), 0))
    expect_surf = np.exp(-sig * 1.5)
    assert np.allclose(est_surf, expect_surf, rtol=2e-2)
    # medium event estimator integrates sigma_s * Tr over [0, t_surf]
    est_med = np.asarray(jnp.mean(jnp.where(is_med[:, None], w_med, 0.0), 0))
    sigma_s = np.asarray(med.sigma_t * med.albedo)
    expect_med = sigma_s / sig * (1 - np.exp(-sig * 1.5))
    assert np.allclose(est_med, expect_med, rtol=2e-2)


def test_grid_density_lookup():
    dens = np.zeros((2, 2, 2), np.float32)
    dens[1, 1, 1] = 8.0
    med = medlib.make_grid(dens, 1.0, 0.5)
    # center of box: trilinear average = 1.0
    v = float(medlib.density_at(med, jnp.asarray([[0.5, 0.5, 0.5]]))[0])
    assert abs(v - 1.0) < 1e-5
    # outside: 0
    v2 = float(medlib.density_at(med, jnp.asarray([[2.0, 0.5, 0.5]]))[0])
    assert v2 == 0.0


def test_volpath_vs_path_in_vacuum_limit():
    """volpath surface lanes consume the same sample dims as path, so a
    zero-density medium must reproduce path.li BIT-EXACTLY, and a
    near-vacuum one within float noise."""
    from mitsuba_tpu.integrators import common, path, volpath
    from mitsuba_tpu.scene import builtin

    scene, cam = builtin.cornell_box(width=16, height=16)
    cfg = common.RenderConfig(spp=16, max_depth=4, seed=0)
    ref = np.asarray(common.render_jit(scene, cam, path.li, cfg))
    scene_0 = scene.replace(medium=medlib.make_homogeneous([0.0] * 3, [0.0] * 3))
    img0 = np.asarray(common.render_jit(scene_0, cam, volpath.li, cfg))
    assert np.array_equal(img0, ref)

    scene_v = scene.replace(
        medium=medlib.make_homogeneous([1e-5] * 3, [1e-6] * 3, 0.0)
    )
    img = np.asarray(common.render_jit(scene_v, cam, volpath.li, cfg))
    assert np.allclose(img, ref, rtol=1e-3, atol=1e-4), np.abs(img - ref).max()


def test_volpath_fog_darkens_and_scatters():
    from mitsuba_tpu.integrators import common, volpath
    from mitsuba_tpu.scene import builtin

    scene, cam = builtin.cornell_box(width=16, height=16)
    cfg = common.RenderConfig(spp=64, max_depth=6, seed=1)
    clear = np.asarray(common.render_jit(
        scene.replace(medium=medlib.make_homogeneous([1e-5] * 3, [1e-6] * 3)),
        cam, volpath.li, cfg))
    foggy = np.asarray(common.render_jit(
        scene.replace(medium=medlib.make_homogeneous([0.5] * 3, [0.5] * 3)),
        cam, volpath.li, cfg))
    assert np.isfinite(foggy).all()
    # absorbing fog removes energy overall
    assert foggy.mean() < clear.mean()

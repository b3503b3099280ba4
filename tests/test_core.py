"""Core math + RNG tests (analog of src/tests/{test_random.cpp,
test_linalg.cpp} and the frame/fresnel helpers)."""
import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.core import math as m
from mitsuba_tpu.core import rng


def test_rng_uniform_range_and_determinism():
    px = jnp.arange(10000, dtype=jnp.uint32)
    u1 = rng.uniform(jnp.uint32(7), px, jnp.uint32(3), 5)
    u2 = rng.uniform(jnp.uint32(7), px, jnp.uint32(3), 5)
    u = np.asarray(u1)
    assert np.all(u >= 0.0) and np.all(u < 1.0)
    assert np.array_equal(u, np.asarray(u2))  # pure function of indices
    # different dims decorrelate
    v = np.asarray(rng.uniform(jnp.uint32(7), px, jnp.uint32(3), 6))
    assert abs(np.corrcoef(u, v)[0, 1]) < 0.05


def test_rng_uniformity():
    px = jnp.arange(1 << 18, dtype=jnp.uint32)
    u = np.asarray(rng.uniform(jnp.uint32(0), px, jnp.uint32(0), 0))
    hist, _ = np.histogram(u, bins=64, range=(0, 1))
    expected = len(u) / 64
    chi2 = np.sum((hist - expected) ** 2 / expected)
    assert chi2 < 64 * 2.0, chi2  # very loose; catches gross bias


def test_coordinate_system_orthonormal():
    key = jax.random.PRNGKey(0)
    n = m.normalize(jax.random.normal(key, (1000, 3)))
    s, t = m.coordinate_system(n)
    assert np.allclose(np.asarray(m.dot(s, t)), 0, atol=1e-5)
    assert np.allclose(np.asarray(m.dot(s, n)), 0, atol=1e-5)
    assert np.allclose(np.asarray(m.length(s)), 1, atol=1e-5)
    assert np.allclose(np.asarray(m.length(t)), 1, atol=1e-5)


def test_to_local_world_roundtrip():
    key = jax.random.PRNGKey(1)
    n = m.normalize(jax.random.normal(key, (500, 3)))
    v = m.normalize(jax.random.normal(jax.random.PRNGKey(2), (500, 3)))
    v2 = m.to_world(n, m.to_local(n, v))
    assert np.allclose(np.asarray(v), np.asarray(v2), atol=1e-5)


def test_fresnel_dielectric_limits():
    # normal incidence: F = ((eta-1)/(eta+1))^2
    f, cos_t, _, _ = m.fresnel_dielectric(jnp.asarray([1.0]), jnp.asarray([1.5]))
    assert abs(float(f[0]) - ((0.5 / 2.5) ** 2)) < 1e-6
    # grazing: F -> 1
    f, _, _, _ = m.fresnel_dielectric(jnp.asarray([1e-4]), jnp.asarray([1.5]))
    assert float(f[0]) > 0.98
    # TIR from inside beyond critical angle
    f, _, _, _ = m.fresnel_dielectric(jnp.asarray([-0.3]), jnp.asarray([1.5]))
    assert float(f[0]) == 1.0


def test_refract_snell():
    # 45 degrees into eta=1.5
    ci = np.cos(np.deg2rad(45.0))
    wi = jnp.asarray([[np.sin(np.deg2rad(45.0)), 0.0, ci]], jnp.float32)
    f, cos_t, _, _ = m.fresnel_dielectric(wi[..., 2], jnp.asarray(1.5))
    wt = m.refract_local(wi, jnp.asarray(1.5), cos_t)
    sin_t = float(m.sin_theta(wt)[0])
    assert abs(sin_t - np.sin(np.deg2rad(45.0)) / 1.5) < 1e-5
    assert float(wt[0, 2]) < 0  # transmitted to other side
    assert abs(float(m.length(wt)[0]) - 1.0) < 1e-5


def test_fresnel_conductor_reasonable():
    eta = jnp.asarray([[0.2, 0.92, 1.1]])
    k = jnp.asarray([[3.9, 2.45, 2.14]])
    f = m.fresnel_conductor(jnp.asarray([1.0]), eta, k)
    assert np.all(np.asarray(f) > 0.5) and np.all(np.asarray(f) <= 1.0)

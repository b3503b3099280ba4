"""Perlin noise (core/noise.py) + the irawan period/umax perturbation."""
import numpy as np
import jax.numpy as jnp

from mitsuba_tpu.core import noise


def test_perlin_range_and_lattice_zeros():
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(-20, 20, (4096, 3)).astype(np.float32))
    v = np.asarray(noise.perlin_noise(p))
    assert np.isfinite(v).all()
    assert np.abs(v).max() <= 1.2          # classic Perlin bound ~sqrt(3)/2
    assert v.std() > 0.05                  # actually varies
    # zero at integer lattice points
    lat = jnp.asarray(rng.integers(-10, 10, (256, 3)).astype(np.float32))
    assert np.allclose(np.asarray(noise.perlin_noise(lat)), 0.0, atol=1e-5)


def test_perlin_continuity():
    x = jnp.linspace(0.0, 8.0, 4097)
    v = np.asarray(noise.perlin_noise_1d(x))
    # C1 smoothness: adjacent samples differ by O(step)
    assert np.abs(np.diff(v)).max() < 0.02


def test_fbm_turbulence():
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.uniform(-5, 5, (512, 3)).astype(np.float32))
    f = np.asarray(noise.fbm(p))
    t = np.asarray(noise.turbulence(p))
    assert np.isfinite(f).all() and np.isfinite(t).all()
    assert (t >= 0).all() and t.std() > 0.05 and f.std() > 0.05


def test_irawan_period_perturbation():
    """period > 0 perturbs umax per yarn segment: the shade-point umax
    varies across segments and stays within the dU slopes."""
    from mitsuba_tpu.models import cloth

    src = cloth.PRESET_COTTON.replace(
        "period = 0.0",
        "period = 2.0, dWarpUmaxOverDWarp = 10.0, "
        "dWarpUmaxOverDWeft = 10.0, dWeftUmaxOverDWarp = 10.0, "
        "dWeftUmaxOverDWeft = 10.0")
    pat = cloth.parse_weave(src, {})
    cloth.compute_normalization(pat, n=2000)
    tab = cloth.build_tables([(pat, 8.0, 8.0)], 1, {0: 0})
    rng = np.random.default_rng(2)
    uv = jnp.asarray(rng.uniform(0, 1, (2048, 2)).astype(np.float32))
    mat = jnp.zeros((2048,), jnp.int32)
    sp = cloth.gather_yarn(tab, mat, uv)
    umax_eff = np.asarray(sp["k"][..., 0])
    base = np.deg2rad(25.0)
    slope = np.deg2rad(10.0)
    assert np.isfinite(umax_eff).all()
    assert umax_eff.std() > 1e-3           # perturbation active
    assert np.abs(umax_eff - base).max() <= 2 * slope * 1.2 + 1e-6

    # period = 0 pattern: umax stays exactly at the yarn value
    src0 = src.replace("period = 2.0", "period = 0.0")
    pat0 = cloth.parse_weave(src0, {})
    cloth.compute_normalization(pat0, n=2000)
    tab0 = cloth.build_tables([(pat0, 8.0, 8.0)], 1, {0: 0})
    sp0 = cloth.gather_yarn(tab0, mat, uv)
    assert np.allclose(np.asarray(sp0["k"][..., 0]), base, atol=1e-6)

"""Spectral rendering support: hero-wavelength sampling, CIE conversion,
RGB->spectrum upsampling, blackbody SPDs, Cauchy dispersion.

The reference's spectral mode is a compile-time SPECTRUM_SAMPLES=N build
(include/mitsuba/core/spectrum.h; its shipped config uses N=3 RGB,
config-linux-gcc.py:7). The TPU redesign makes spectra a RUNTIME path
instead: each camera sample draws one hero wavelength plus K-1 rotated
companions (Wilkie et al. 2014's hero-wavelength scheme — the natural
fit for SIMD lanes), every RGB quantity is lifted to those wavelengths
on the fly, and contributions resolve to RGB through the camera response
at accumulation time. Dispersion (wavelength-dependent IOR) falls out,
which the reference's RGB build cannot do at all.

Component choices, all analytic (no data tables to ship):
  * CIE 1931 color matching functions: the multi-lobe Gaussian fits of
    Wyman, Sloan & Shirley 2013 ("Simple Analytic Approximations to the
    CIE XYZ Color Matching Functions", JCGT) — max error ~1% of peak.
  * RGB->spectrum: three fixed smooth bases (sigmoid red/blue, Gaussian
    green) whose mixing matrix against the camera response is inverted
    ONCE at import, so upsample(rgb) integrates back to exactly rgb for
    in-gamut colors (Smits 1999's idea with an auto-calibrated basis).
  * Blackbody: Planck's law, peak-normalized (blackbody.cpp analog).
  * Dispersion: Cauchy n(lambda) = A + B/lambda^2, anchored so that
    n(589.3nm) equals the material's nominal eta.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

LAMBDA_MIN = 400.0
LAMBDA_MAX = 700.0
LAMBDA_RANGE = LAMBDA_MAX - LAMBDA_MIN
N_LAMBDA = 4            # hero + 3 rotated companions

# linear sRGB (D65) <-> CIE XYZ
XYZ_TO_SRGB = np.asarray([
    [3.2404542, -1.5371385, -0.4985314],
    [-0.9692660, 1.8760108, 0.0415560],
    [0.0556434, -0.2040259, 1.0572252]], np.float64)


def _gauss(x, alpha, mu, s1, s2):
    s = jnp.where(x < mu, s1, s2)
    t = (x - mu) / s
    return alpha * jnp.exp(-0.5 * t * t)


def xyz_cmf(lam):
    """CIE 1931 2-deg observer xbar/ybar/zbar at lam (nm) -> (..., 3)
    (Wyman et al. 2013, multi-lobe fits)."""
    lam = jnp.asarray(lam)
    x = (_gauss(lam, 1.056, 599.8, 37.9, 31.0)
         + _gauss(lam, 0.362, 442.0, 16.0, 26.7)
         + _gauss(lam, -0.065, 501.1, 20.4, 26.2))
    y = (_gauss(lam, 0.821, 568.8, 46.9, 40.5)
         + _gauss(lam, 0.286, 530.9, 16.3, 31.1))
    z = (_gauss(lam, 1.217, 437.0, 11.8, 36.0)
         + _gauss(lam, 0.681, 459.0, 26.0, 13.8))
    return jnp.stack([x, y, z], -1)


def _np_cmf(lam):
    def g(x, alpha, mu, s1, s2):
        s = np.where(x < mu, s1, s2)
        return alpha * np.exp(-0.5 * ((x - mu) / s) ** 2)
    x = (g(lam, 1.056, 599.8, 37.9, 31.0) + g(lam, 0.362, 442.0, 16.0, 26.7)
         + g(lam, -0.065, 501.1, 20.4, 26.2))
    y = g(lam, 0.821, 568.8, 46.9, 40.5) + g(lam, 0.286, 530.9, 16.3, 31.1)
    z = g(lam, 1.217, 437.0, 11.8, 36.0) + g(lam, 0.681, 459.0, 26.0, 13.8)
    return np.stack([x, y, z], -1)


def _np_basis(lam):
    sig = lambda x: 1.0 / (1.0 + np.exp(-x))  # noqa: E731
    br = sig((lam - 575.0) / 22.0)
    bg = np.exp(-0.5 * ((lam - 535.0) / 65.0) ** 2)
    bb = sig((465.0 - lam) / 22.0)
    return np.stack([br, bg, bb], -1)


def _calibrate():
    """Response normalization + basis mixing matrices, by quadrature.

    response(lam) is scaled so the WHITE illuminant spectrum integrates
    to rgb (1,1,1); K[i,j] = integral response_i * basis_j, inverted so
    the illuminant upsampler round-trips. A second matrix K_w calibrates
    the REFLECTANCE upsampler: reflectances are decomposed as
    gray-part (a FLAT spectrum — physically what gray means, and the
    reason multi-bounce products of grays stay gray) + a chromatic
    residual whose basis mix is calibrated against the response
    weighted by the white illuminant spectrum, so viewing R under white
    light returns exactly rgb."""
    lam = np.linspace(LAMBDA_MIN, LAMBDA_MAX, 1024)
    cmf = _np_cmf(lam)                                  # (Q, 3)
    resp = cmf @ XYZ_TO_SRGB.T                          # (Q, 3) rgb response
    scale = np.trapz(cmf[:, 1], lam)
    resp = resp / scale
    basis = _np_basis(lam)                              # (Q, 3)
    K = np.empty((3, 3))
    for i in range(3):
        for j in range(3):
            K[i, j] = np.trapz(resp[:, i] * basis[:, j], lam)
    k_inv = np.linalg.inv(K)
    # white illuminant spectrum = the basis mix mapping to (1,1,1)
    cw = k_inv @ np.ones(3)
    s_white = basis @ cw                                # (Q,)
    Kw = np.empty((3, 3))
    for i in range(3):
        for j in range(3):
            Kw[i, j] = np.trapz(resp[:, i] * s_white * basis[:, j], lam)
    return (np.float32(scale), k_inv.astype(np.float32),
            np.linalg.inv(Kw).astype(np.float32))


_Y_SCALE, _K_INV, _KW_INV = _calibrate()


def rgb_response(lam):
    """Per-wavelength camera response: rgb weight density (..., 3) such
    that integrating response * spectrum over lam yields linear sRGB."""
    return (xyz_cmf(lam) @ jnp.asarray(XYZ_TO_SRGB.T, jnp.float32)
            / _Y_SCALE)


def sample_lambdas(u: jax.Array) -> jax.Array:
    """Hero-wavelength set: u (...,) in [0,1) -> (..., N_LAMBDA) nm.
    The hero is uniform; companions are equally rotated (Wilkie 2014)."""
    k = jnp.arange(N_LAMBDA, dtype=jnp.float32) / N_LAMBDA
    frac = jnp.mod(u[..., None] + k, 1.0)
    return LAMBDA_MIN + frac * LAMBDA_RANGE


LAMBDA_PDF = 1.0 / LAMBDA_RANGE


def _basis_jnp(lam):
    sig = lambda x: 1.0 / (1.0 + jnp.exp(-x))  # noqa: E731
    br = sig((lam - 575.0) / 22.0)
    bg = jnp.exp(-0.5 * ((lam - 535.0) / 65.0) ** 2)
    bb = sig((465.0 - lam) / 22.0)
    return br, bg, bb


def upsample(rgb: jax.Array, lam: jax.Array) -> jax.Array:
    """Lift linear-sRGB EMISSION rgb (..., 3) to spectral values at lam
    (..., K) -> (..., K); round-trips through rgb_response for in-gamut
    colors, clamped at 0 outside."""
    coeff = rgb @ jnp.asarray(_K_INV.T)                 # (..., 3)
    br, bg, bb = _basis_jnp(lam)
    s = (coeff[..., 0:1] * br + coeff[..., 1:2] * bg + coeff[..., 2:3] * bb)
    return jnp.maximum(s, 0.0)


def upsample_reflectance(rgb: jax.Array, lam: jax.Array) -> jax.Array:
    """Lift linear-sRGB REFLECTANCE rgb (..., 3) to spectral values:
    the gray part becomes a FLAT spectrum (so products of grays stay
    gray through any number of bounces) and the chromatic residual uses
    the white-illuminant-calibrated basis mix, so viewing under white
    light returns exactly rgb."""
    w = jnp.min(rgb, axis=-1, keepdims=True)            # (..., 1)
    coeff = (rgb - w) @ jnp.asarray(_KW_INV.T)          # (..., 3)
    br, bg, bb = _basis_jnp(lam)
    s = (w + coeff[..., 0:1] * br + coeff[..., 1:2] * bg
         + coeff[..., 2:3] * bb)
    return jnp.maximum(s, 0.0)


def to_rgb(spec: jax.Array, lam: jax.Array) -> jax.Array:
    """MC estimator: spectral contributions spec (..., K) at lam
    (..., K) -> linear sRGB (..., 3). Divides by the wavelength pdf and
    averages the K companions."""
    resp = rgb_response(lam)                            # (..., K, 3)
    return jnp.sum(resp * spec[..., None], axis=-2) / (LAMBDA_PDF * N_LAMBDA)


def planck(lam: jax.Array, temperature: float) -> jax.Array:
    """Peak-normalized Planck SPD at lam nm (blackbody emitters)."""
    h, c, kb = 6.62607015e-34, 2.99792458e8, 1.380649e-23
    lm = lam * 1e-9
    val = 1.0 / (lm ** 5 * (jnp.exp(h * c / (lm * kb * temperature)) - 1.0))
    # Wien's law peak
    lpeak = 2.897771955e-3 / temperature
    peak = 1.0 / (lpeak ** 5
                  * (jnp.exp(h * c / (lpeak * kb * temperature)) - 1.0))
    return val / peak


def cauchy_eta(eta_nominal: jax.Array, cauchy_b_um2: jax.Array,
               lam: jax.Array) -> jax.Array:
    """Dispersive IOR n(lambda) = A + B / lambda_um^2 with A chosen so
    n(589.3nm) = eta_nominal (the sodium-D anchor convention)."""
    lam_um2 = (lam * 1e-3) ** 2
    a = eta_nominal - cauchy_b_um2 / (0.5893 ** 2)
    return a + cauchy_b_um2 / lam_um2

"""Film splatting + reconstruction filter tests (ImageBlock semantics,
include/mitsuba/render/imageblock.h:103)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.film import film


def test_box_splat_center():
    px = jnp.asarray([2.5])
    py = jnp.asarray([3.5])
    val = jnp.asarray([[1.0, 2.0, 3.0]])
    img, wgt = film.splat(8, 8, px, py, val, film.FILTER_BOX)
    out = np.asarray(film.develop(img, wgt))
    assert np.allclose(out[3, 2], [1, 2, 3], atol=1e-6)
    assert np.asarray(wgt).sum() == pytest.approx(1.0)


@pytest.mark.parametrize(
    "kind", [film.FILTER_BOX, film.FILTER_TENT, film.FILTER_GAUSSIAN,
             film.FILTER_MITCHELL, film.FILTER_CATMULLROM, film.FILTER_LANCZOS]
)
def test_constant_field_preserved(kind):
    """Splatting a constant radiance field must develop to that constant
    (partition-of-unity after weight normalization)."""
    n = 4096
    rs = np.random.RandomState(0)
    px = jnp.asarray(rs.uniform(2, 14, n).astype(np.float32))
    py = jnp.asarray(rs.uniform(2, 14, n).astype(np.float32))
    val = jnp.ones((n, 3)) * 0.7
    img, wgt = film.splat(16, 16, px, py, val, kind)
    out = np.asarray(film.develop(img, wgt))
    inner = out[4:12, 4:12]
    assert np.allclose(inner, 0.7, atol=1e-4), kind


def test_filter_kernels_shapes():
    x = jnp.linspace(-3, 3, 121)
    for kind, radius in film._FILTER_RADIUS.items():
        y = np.asarray(film.filter_eval(kind, x))
        assert y.max() > 0
        assert np.all(y[np.abs(np.asarray(x)) > radius + 1e-6] == 0.0), kind
        # peak at center
        assert y[60] == y.max(), kind


def test_accumulate_ordered_fast_path():
    spp = 4
    vals = jnp.arange(2 * 2 * spp * 3, dtype=jnp.float32).reshape(2 * 2 * spp, 3)
    out = film.accumulate_box_ordered(2, 2, spp, vals)
    ref = np.asarray(vals).reshape(2, 2, spp, 3).mean(axis=2)
    assert np.allclose(np.asarray(out), ref)

"""SPPM / hash-grid tests: grid query correctness vs brute force, and the
progressive estimator converging to the path-traced image (the reference
validates photon mappers against unidirectional integrators the same way)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.ops import hashgrid


def test_hashgrid_query_matches_bruteforce():
    rs = np.random.RandomState(0)
    p = 2000
    q = 128
    pos = jnp.asarray(rs.uniform(-1, 1, (p, 3)).astype(np.float32))
    valid = jnp.asarray(rs.rand(p) > 0.1)
    queries = jnp.asarray(rs.uniform(-1, 1, (q, 3)).astype(np.float32))
    radius = jnp.full((q,), 0.15)
    weights = jnp.asarray(rs.uniform(0, 1, (p,)).astype(np.float32))

    grid = hashgrid.build(pos, valid, 0.15)

    def reduce_fn(carry, pidx, mask):
        s, c = carry
        wv = jnp.where(mask, weights[pidx], 0.0)
        return s + wv.sum(1), c + mask.sum(1)

    (s, c), truncated = hashgrid.query_sum(
        grid, pos, queries, radius, reduce_fn,
        (jnp.zeros(q), jnp.zeros(q, jnp.int32)), window=256,
    )
    assert int(truncated) == 0

    # brute force reference
    d = np.asarray(queries)[:, None, :] - np.asarray(pos)[None, :, :]
    r2 = (d**2).sum(-1)
    inside = (r2 <= 0.15**2) & np.asarray(valid)[None, :]
    ref_c = inside.sum(1)
    ref_s = (inside * np.asarray(weights)[None, :]).sum(1)
    assert np.array_equal(np.asarray(c), ref_c)
    assert np.allclose(np.asarray(s), ref_s, rtol=1e-5)


@pytest.mark.slow
def test_sppm_converges_to_path():
    from mitsuba_tpu.integrators import common, path, sppm
    from mitsuba_tpu.scene import builtin

    scene, cam = builtin.cornell_box(width=24, height=24)
    cfg = common.RenderConfig(spp=128, max_depth=5, seed=0)
    ref = np.asarray(common.render_jit(scene, cam, path.li, cfg))
    img, stats = sppm.render(
        scene, cam, common.RenderConfig(spp=1, max_depth=5, seed=0),
        n_passes=6, photons_per_pass=1 << 16,
    )
    img = np.asarray(img)
    assert np.isfinite(img).all() and img.min() >= 0
    # global brightness parity within ~15% (SPPM bias + MC noise at this
    # budget); structural agreement on bright regions
    assert abs(img.mean() - ref.mean()) / ref.mean() < 0.15, (img.mean(), ref.mean())
    mask = ref.mean(-1) > 0.1
    rel = np.abs(img.mean(-1) - ref.mean(-1))[mask] / ref.mean(-1)[mask]
    assert np.median(rel) < 0.3, np.median(rel)

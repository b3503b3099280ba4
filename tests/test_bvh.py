"""BVH build + traversal: must agree exactly with the brute-force
intersector on random scenes (test_kd.cpp analog)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.ops import bvh_traverse, intersect
from mitsuba_tpu.scene import builtin, bvh as bvhlib, ir


def random_tri_scene(n_tris=200, seed=0):
    rs = np.random.RandomState(seed)
    base = rs.uniform(-1, 1, (n_tris, 3)).astype(np.float32)
    e1 = rs.uniform(-0.3, 0.3, (n_tris, 3)).astype(np.float32)
    e2 = rs.uniform(-0.3, 0.3, (n_tris, 3)).astype(np.float32)
    verts = np.concatenate([base, base + e1, base + e2], 0)
    tris = np.stack(
        [np.arange(n_tris), np.arange(n_tris) + n_tris, np.arange(n_tris) + 2 * n_tris],
        -1,
    ).astype(np.int32)
    return ir.build_scene(verts, tris, np.zeros(n_tris, np.int32),
                          [{"type": ir.BSDF_DIFFUSE}])


@pytest.mark.parametrize("n_tris", [3, 64, 500])
def test_bvh_matches_brute_closest(n_tris):
    scene = random_tri_scene(n_tris, seed=n_tris)
    b = bvhlib.build_bvh(np.asarray(scene.vertices), np.asarray(scene.indices))
    rs = np.random.RandomState(1)
    n = 512
    o = jnp.asarray(rs.uniform(-2, 2, (n, 3)).astype(np.float32))
    d = jnp.asarray(rs.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ref = intersect.intersect_brute(scene, o, d)
    out = bvh_traverse.closest_hit(scene, b, o, d)
    assert np.array_equal(np.asarray(ref.valid), np.asarray(out.valid))
    hit = np.asarray(ref.valid)
    # the brute path's packed-key reduce truncates t by <= 127 ulps
    # (~1.5e-5 relative), so quasi-tied overlapping triangles may pick a
    # different (equally correct) winner
    assert np.allclose(np.asarray(ref.t)[hit], np.asarray(out.t)[hit], rtol=3e-5)
    prim_match = np.asarray(ref.prim)[hit] == np.asarray(out.prim)[hit]
    t_tied = np.isclose(np.asarray(ref.t)[hit], np.asarray(out.t)[hit], rtol=3e-5)
    assert np.all(prim_match | t_tied)
    assert prim_match.mean() > 0.95


def test_bvh_matches_brute_anyhit():
    scene = random_tri_scene(300, seed=7)
    b = bvhlib.build_bvh(np.asarray(scene.vertices), np.asarray(scene.indices))
    rs = np.random.RandomState(2)
    n = 512
    o = jnp.asarray(rs.uniform(-2, 2, (n, 3)).astype(np.float32))
    d = jnp.asarray(rs.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tmax = jnp.asarray(rs.uniform(0.5, 4.0, (n,)).astype(np.float32))
    ref = intersect.occluded_brute(scene, o, d, tmax)
    out = bvh_traverse.any_hit(scene, b, o, d, tmax)
    # brute applies the same (1-eps) guard band
    assert np.array_equal(np.asarray(ref), np.asarray(out))


def test_cornell_render_with_bvh_matches_brute():
    from mitsuba_tpu.integrators import common, path

    scene, cam = builtin.cornell_box(width=16, height=16)
    cfg = common.RenderConfig(spp=8, max_depth=3, seed=0)
    ref = np.asarray(common.render_jit(scene, cam, path.li, cfg))
    scene_b = bvhlib.attach(scene)
    img = np.asarray(common.render_jit(scene_b, cam, path.li, cfg))
    # brute packs (t, prim) into one key (~1e-5 t truncation) so a few
    # seam samples may land on the neighboring coplanar triangle
    assert np.allclose(ref, img, rtol=1e-3, atol=1e-3), np.abs(ref - img).max()


def test_bvh_jit_and_grad_compatible():
    """BVH lives in the pytree: jit caching + grads through hits work."""
    scene = random_tri_scene(64, seed=3)
    scene = bvhlib.attach(scene)

    @jax.jit
    def f(s, o, d):
        its = bvh_traverse.closest_hit(s, s.bvh, o, d)
        return jnp.sum(jnp.where(its.valid, its.t, 0.0))

    o = jnp.zeros((8, 3)) + jnp.asarray([0.0, 0.0, -3.0])
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (8, 1))
    v = f(scene, o, d)
    assert np.isfinite(float(v))

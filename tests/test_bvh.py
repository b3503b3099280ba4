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


# ---------------------------------------------------------------------------
# Binned (cluster + grouped-MXU) intersector — the TPU large-mesh path
# (ops/binned_intersect.py), validated against brute force in pallas
# interpret mode on CPU.
# ---------------------------------------------------------------------------

def _interp(fn):
    from unittest import mock
    import jax.experimental.pallas as plmod
    orig = plmod.pallas_call

    def call(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    def wrapper(*a, **k):
        with mock.patch.object(plmod, "pallas_call", call):
            return fn(*a, **k)
    return wrapper


def _bunny_or_synthetic():
    import os
    from mitsuba_tpu.io import mesh as meshlib
    path = "/root/reference/data/tests/bunny.ply"
    if os.path.exists(path):
        md = meshlib.load_ply(path)
        return md.vertices, md.indices
    # synthetic: jittered grid of quads (~8k tris)
    g = 64
    xx, zz = np.meshgrid(np.linspace(-1, 1, g), np.linspace(-1, 1, g))
    rng = np.random.RandomState(0)
    yy = rng.uniform(-0.05, 0.05, xx.shape)
    v = np.stack([xx, yy, zz], -1).reshape(-1, 3).astype(np.float32)
    f = []
    for i in range(g - 1):
        for j in range(g - 1):
            a = i * g + j
            f += [[a, a + 1, a + g], [a + 1, a + g + 1, a + g]]
    return v, np.asarray(f, np.int32)


def test_binned_matches_brute():
    from mitsuba_tpu.ops import binned_intersect as bi
    from mitsuba_tpu.ops import intersect as isect
    from mitsuba_tpu.scene import ir as irlib

    v, f = _bunny_or_synthetic()
    scene = irlib.build_scene(v, f, np.zeros(len(f), np.int32),
                              [{"type": irlib.BSDF_DIFFUSE}])
    cl = bi.build_clusters(scene)
    lo, hi = v.min(0), v.max(0)
    center = jnp.asarray((lo + hi) / 2)
    radius = float(np.linalg.norm(hi - lo) / 2)
    n = 512
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    a = jax.random.normal(k1, (n, 3))
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b2 = jax.random.normal(k2, (n, 3))
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    o = center + a * radius
    d = center + b2 * radius * 0.5 - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    its = _interp(bi.closest_hit)(scene, cl, o, d)
    blocked = _interp(bi.any_hit)(scene, cl, o, d,
                                  jnp.full((n,), radius * 0.8))
    ref = isect.intersect_brute(scene, o, d)
    refb = isect.occluded_brute(scene, o, d, jnp.full((n,), radius * 0.8))
    va, vb = np.asarray(ref.valid), np.asarray(its.valid)
    assert (va == vb).mean() > 0.998
    both = va & vb
    assert np.allclose(np.asarray(ref.t)[both], np.asarray(its.t)[both],
                       rtol=1e-4, atol=1e-5)
    assert (np.asarray(ref.prim)[both]
            == np.asarray(its.prim)[both]).mean() > 0.998
    assert (np.asarray(refb) == np.asarray(blocked)).mean() > 0.998


def test_binned_exactness_flag():
    from mitsuba_tpu.ops import binned_intersect as bi
    from mitsuba_tpu.scene import ir as irlib

    v, f = _bunny_or_synthetic()
    scene = irlib.build_scene(v, f, np.zeros(len(f), np.int32),
                              [{"type": irlib.BSDF_DIFFUSE}])
    cl = bi.build_clusters(scene)
    lo, hi = v.min(0), v.max(0)
    center = jnp.asarray((lo + hi) / 2)
    n = 256
    o = jnp.broadcast_to(center + jnp.asarray([0, 0, 3.0]), (n, 3))
    dd = jax.random.normal(jax.random.PRNGKey(5), (n, 3))
    dd = dd / jnp.linalg.norm(dd, axis=-1, keepdims=True)
    _, _, exact = _interp(bi.closest_key)(
        cl, o, dd, jnp.full((n,), 3e37))
    assert float(np.asarray(exact).mean()) == 1.0


def test_binned_sorted_path_matches_brute():
    """n >= 4*BLOCK engages the coherence sort + inverse permutation;
    results must still come back in caller order."""
    from mitsuba_tpu.ops import binned_intersect as bi
    from mitsuba_tpu.ops import intersect as isect
    from mitsuba_tpu.scene import ir as irlib

    v, f = _bunny_or_synthetic()
    scene = irlib.build_scene(v, f, np.zeros(len(f), np.int32),
                              [{"type": irlib.BSDF_DIFFUSE}])
    cl = bi.build_clusters(scene)
    lo, hi = v.min(0), v.max(0)
    center = jnp.asarray((lo + hi) / 2)
    radius = float(np.linalg.norm(hi - lo) / 2)
    n = 4 * bi.BLOCK
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    a = jax.random.normal(k1, (n, 3))
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b2 = jax.random.normal(k2, (n, 3))
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    o = center + a * radius
    d = center + b2 * radius * 0.5 - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    its = _interp(bi.closest_hit)(scene, cl, o, d)
    # spot-check a deterministic subset against brute force
    idx = jnp.arange(0, n, 17)
    ref = isect.intersect_brute(scene, o[idx], d[idx])
    va = np.asarray(ref.valid)
    vb = np.asarray(its.valid)[np.asarray(idx)]
    assert (va == vb).mean() > 0.995
    both = va & vb
    assert np.allclose(np.asarray(ref.t)[both],
                       np.asarray(its.t)[np.asarray(idx)][both],
                       rtol=1e-4, atol=1e-5)


def test_binned_edge_adversarial_no_leaks():
    """Rays aimed exactly through shared triangle edges must hit: the
    split-precision kernel's bf16x3 barycentric noise scales with scene
    magnitudes (up to ~0.1 on this 0.28-unit bunny!), so hit
    classification uses a noise-scaled band + top-2 exact re-test
    (DELTA_SPLIT / BARY_CAP in ops/binned_intersect.py, ADVICE r2).
    Contract: wherever exact-f32 brute force hits, the binned path must
    hit the same t — ZERO leaks — with in-gamut barycentrics."""
    from mitsuba_tpu.ops import binned_intersect as bi
    from mitsuba_tpu.ops import intersect as isect
    from mitsuba_tpu.scene import ir as irlib

    v, f = _bunny_or_synthetic()
    scene = irlib.build_scene(v, f, np.zeros(len(f), np.int32),
                              [{"type": irlib.BSDF_DIFFUSE}])
    cl = bi.build_clusters(scene)
    vv = np.asarray(v)
    ff = np.asarray(f)
    # aim straight down through triangle edge midpoints AND vertices —
    # the maximal-cancellation points for the Moller-Trumbore numerators
    n = 256
    rng = np.random.RandomState(7)
    pick = rng.choice(len(ff), n)
    mid = 0.5 * (vv[ff[pick[: n // 2], 1]] + vv[ff[pick[: n // 2], 2]])
    corner = vv[ff[pick[n // 2:], 0]]
    aim = np.concatenate([mid, corner]).astype(np.float32)
    o = jnp.asarray(aim + np.array([0.0, 2.0, 0.0], np.float32))
    d = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (n, 3))

    its = _interp(bi.closest_hit)(scene, cl, o, d)
    ref = isect.intersect_brute(scene, o, d)
    valid = np.asarray(its.valid)
    rv = np.asarray(ref.valid)
    leaks = rv & ~valid
    assert not leaks.any(), f"edge leaks vs brute: {leaks.sum()}/{n}"
    both = rv & valid
    tb = np.asarray(ref.t)[both]
    to = np.asarray(its.t)[both]
    close = np.isclose(tb, to, rtol=1e-4, atol=1e-5)
    # exactly-on-edge rays can slip through BRUTE's strict 1e-6 test
    # (u+v = 1+1e-4 on both edge triangles) and hit the surface behind;
    # the binned path's clamped fallback keeps the edge point instead —
    # watertight, so the only allowed disagreement is ours NEARER
    assert (close | (to <= tb + 1e-5)).all(), \
        f"farther-than-brute hits: {(~close & (to > tb)).sum()}"
    assert close.mean() > 0.98, f"t agreement {close.mean():.3f}"
    b1 = np.asarray(its.b1)[valid]
    b2 = np.asarray(its.b2)[valid]
    assert (b1 >= 0).all() and (b2 >= 0).all() and (b1 + b2 <= 1 + 1e-6).all()


def test_sweep_and_pairs_match_dense():
    """The t-ordered sweep (v6.2) and the pair-explicit dispatch (v7)
    must agree with the dense enumeration exactly (same top-2 +
    exact-retest contract); both are exercised in interpret mode."""
    from mitsuba_tpu.ops import binned_intersect as bi
    from mitsuba_tpu.scene import ir as irlib

    v, f = _bunny_or_synthetic()
    scene = irlib.build_scene(v, f, np.zeros(len(f), np.int32),
                              [{"type": irlib.BSDF_DIFFUSE}])
    cl = bi.build_clusters(scene)
    lo, hi = v.min(0), v.max(0)
    center = jnp.asarray((lo + hi) / 2)
    radius = float(np.linalg.norm(hi - lo) / 2)
    n = 4 * bi.BLOCK
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    a = jax.random.normal(k1, (n, 3))
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b2 = jax.random.normal(k2, (n, 3))
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    o = center + a * radius
    d = center + b2 * radius * 0.5 - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    dense = _interp(bi.closest_hit)(scene, cl, o, d, sweep=False)
    swp = _interp(bi.closest_hit)(scene, cl, o, d, sweep=True)
    prs = _interp(bi.closest_hit_pairs)(scene, cl, o, d)
    for name, its in (("sweep", swp), ("pairs", prs)):
        agree = (np.asarray(its.valid) == np.asarray(dense.valid))
        assert agree.mean() > 0.999, (name, agree.mean())
        both = np.asarray(its.valid) & np.asarray(dense.valid)
        assert np.allclose(np.asarray(its.t)[both],
                           np.asarray(dense.t)[both],
                           rtol=1e-4, atol=1e-5), name


def test_binned_sharded_matches_unsharded():
    """The Pallas binned intersector under shard_map on an 8-device mesh
    equals the single-device result — pins the multi-chip big-mesh path
    (rays sharded over dp, scene/clusters replicated; the reference's
    cluster rendering ships work units over TCP instead,
    sched_remote.h:50-237)."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from jax.sharding import Mesh, PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from mitsuba_tpu.ops import binned_intersect as bi

    v, f = _bunny_or_synthetic()
    scene = ir.build_scene(v, f, np.zeros(len(f), np.int32),
                           [{"type": ir.BSDF_DIFFUSE}])
    cl = bi.build_clusters(scene)
    lo, hi = v.min(0), v.max(0)
    center = jnp.asarray((lo + hi) / 2)
    radius = float(np.linalg.norm(hi - lo) / 2)
    n = 8 * bi.BLOCK
    k1, k2 = jax.random.split(jax.random.PRNGKey(9))
    a = jax.random.normal(k1, (n, 3))
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b2 = jax.random.normal(k2, (n, 3))
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    o = center + a * radius
    d = center + b2 * radius * 0.5 - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    single = _interp(bi.closest_hit)(scene, cl, o, d)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("dp",))

    def shard_fn(scene, cl, o, d):
        its = bi.closest_hit(scene, cl, o, d)
        return its.t, its.valid, its.prim

    # check_vma=False: pallas_call's out ShapeDtypeStructs carry no vma
    # annotation, which the collective-free replication checker rejects
    sharded = shard_map(shard_fn, mesh=mesh,
                        in_specs=(P(), P(), P("dp"), P("dp")),
                        out_specs=(P("dp"), P("dp"), P("dp")),
                        check_vma=False)
    t_s, valid_s, prim_s = _interp(sharded)(scene, cl, o, d)

    assert np.array_equal(np.asarray(valid_s), np.asarray(single.valid))
    both = np.asarray(valid_s)
    assert np.allclose(np.asarray(t_s)[both], np.asarray(single.t)[both],
                       rtol=1e-5, atol=1e-6)
    assert np.array_equal(np.asarray(prim_s)[both],
                          np.asarray(single.prim)[both])


def test_binned_two_tier_both_branches():
    """The two-tier tile dispatch (lax.cond on the live-tile count,
    _closest_key_chunk) must agree with brute on BOTH branches: a
    narrow beam (compact quarter-size list) and wide chords (full
    list). The test checks which branch each workload takes via the
    same live-tile count the cond uses. Interpret mode on CPU."""
    from mitsuba_tpu.ops import binned_intersect as bi
    from mitsuba_tpu.ops import intersect as isect
    from mitsuba_tpu.scene import ir as irlib

    v, f = _bunny_or_synthetic()
    scene = irlib.build_scene(v, f, np.zeros(len(f), np.int32),
                              [{"type": irlib.BSDF_DIFFUSE}])
    cl = bi.build_clusters(scene)
    lo, hi = v.min(0), v.max(0)
    center = jnp.asarray((lo + hi) / 2)
    radius = float(np.linalg.norm(hi - lo) / 2)
    n = 4 * bi.BLOCK          # nsub*G large enough that the cond exists
    nsub = n // 128
    small = nsub * cl.n_groups // 4
    assert small >= bi.SUBROWS * 8, "fixture too small to reach the cond"

    # compact branch: a tight beam down onto one corner patch
    key = jax.random.PRNGKey(11)
    xz = jax.random.uniform(key, (n, 2), minval=-0.9, maxval=-0.82)
    o_c = jnp.stack([xz[:, 0], jnp.full((n,), 2.0), xz[:, 1]], -1)
    d_c = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (n, 3))

    # full branch: chords from all over the bounding sphere
    k1, k2 = jax.random.split(key)
    a = jax.random.normal(k1, (n, 3))
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = jax.random.normal(k2, (n, 3))
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    o_f = center + a * 2.0 * radius
    d_f = center + b * radius * 0.5 - o_f
    d_f = d_f / jnp.linalg.norm(d_f, axis=-1, keepdims=True)

    tmax = jnp.full((n,), 3e37)
    seen = []
    for o, d in ((o_c, d_c), (o_f, d_f)):
        perm = bi.ray_sort_perm(cl, o, d, tmax)
        live = int(jnp.sum(bi._subrow_mask(cl, o[perm], d[perm],
                                           tmax[perm])))
        seen.append(live <= small)
        ref = isect.intersect_brute(scene, o, d)
        its = _interp(bi.closest_hit)(scene, cl, o, d)
        assert np.array_equal(np.asarray(its.valid), np.asarray(ref.valid))
        both = np.asarray(its.valid)
        assert np.allclose(np.asarray(its.t)[both], np.asarray(ref.t)[both],
                           rtol=1e-4, atol=1e-5)
    assert seen == [True, False], seen  # each branch exercised once


def test_cluster_split_tables_consistent():
    """The prebuilt split-precision operands must satisfy the exact
    relationships the kernel's noise band assumes: w_hi = bf16(w),
    w_lo = bf16(w - f32(w_hi)) (so hi+lo reconstructs w to within the
    lo rounding), and w_abs_uv = |w_hi| restricted to the u|v column
    pairs in layout order."""
    import ml_dtypes
    from mitsuba_tpu.ops import binned_intersect as bi
    from mitsuba_tpu.scene import ir as irlib

    v, f = _bunny_or_synthetic()
    scene = irlib.build_scene(v, f, np.zeros(len(f), np.int32),
                              [{"type": irlib.BSDF_DIFFUSE}])
    cl = bi.build_clusters(scene)
    w = np.asarray(cl.w)
    hi = np.asarray(cl.w_hi).astype(np.float32)
    lo = np.asarray(cl.w_lo).astype(np.float32)
    assert np.array_equal(hi, w.astype(ml_dtypes.bfloat16)
                          .astype(np.float32))
    assert np.array_equal(lo, (w - hi).astype(ml_dtypes.bfloat16)
                          .astype(np.float32))
    # hi + lo reconstructs w to within lo's own rounding (~2^-8 of lo)
    err = np.abs(w - (hi + lo))
    bound = np.maximum(np.abs(lo) * 2.0 ** -7, np.abs(w) * 2.0 ** -16)
    assert np.all(err <= bound + 1e-30)
    wa = np.asarray(cl.w_abs_uv).astype(np.float32)
    expect = np.abs(hi).reshape(16, -1, 4, bi.CSIZE)[:, :, 2:4, :] \
        .reshape(16, -1)
    assert np.array_equal(wa, expect)


def test_binned_closest_and_any_fused_equals_separate():
    """closest_and_any (the wavefront's fused dispatch, r5) must equal
    the separate closest_hit + any_hit calls exactly — including retired
    rays (tmax 0), which must neither hit nor block."""
    from mitsuba_tpu.ops import binned_intersect as bi
    from mitsuba_tpu.scene import ir as irlib

    v, f = _bunny_or_synthetic()
    scene = irlib.build_scene(v, f, np.zeros(len(f), np.int32),
                              [{"type": irlib.BSDF_DIFFUSE}])
    cl = bi.build_clusters(scene)
    lo, hi = v.min(0), v.max(0)
    center = jnp.asarray((lo + hi) / 2)
    radius = float(np.linalg.norm(hi - lo) / 2)
    n = 512
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    a = jax.random.normal(k1, (n, 3))
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = jax.random.normal(k2, (n, 3))
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    o_c = center + a * radius
    d_c = center + b * radius * 0.5 - o_c
    d_c = d_c / jnp.linalg.norm(d_c, axis=-1, keepdims=True)
    o_s = center + b * radius
    d_s = -b
    tm_s = jnp.full((n,), radius * 0.9)
    # retire a quarter of each class (the wavefront's dead lanes)
    tm_c = jnp.where(jnp.arange(n) % 4 == 0, 0.0, jnp.float32(3e37))
    tm_s = jnp.where(jnp.arange(n) % 4 == 1, 0.0, tm_s)

    its_f, blk_f = _interp(bi.closest_and_any)(
        scene, cl, o_c, d_c, tm_c, o_s, d_s, tm_s)
    its_s = _interp(bi.closest_hit)(scene, cl, o_c, d_c, tm_c)
    blk_s = _interp(bi.any_hit)(scene, cl, o_s, d_s, tm_s)

    np.testing.assert_array_equal(np.asarray(its_f.valid),
                                  np.asarray(its_s.valid))
    np.testing.assert_array_equal(np.asarray(its_f.prim),
                                  np.asarray(its_s.prim))
    np.testing.assert_allclose(np.asarray(its_f.t), np.asarray(its_s.t),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(blk_f), np.asarray(blk_s))
    assert not np.asarray(blk_f)[1::4].any()      # retired shadow rays
    assert not np.asarray(its_f.valid)[0::4].any()  # retired closest rays

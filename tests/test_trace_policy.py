"""Dispatch-policy pinning (VERDICT r3 weak #8): which intersection
backend each (platform, scene size) class routes to — so a policy
regression (e.g. a size class silently falling into a backend that
cannot compile at that size) is a test failure, not a render surprise."""
from unittest import mock

import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.ops import trace
from mitsuba_tpu.scene import bvh as bvhlib, ir


def _mesh(n_side):
    xx, zz = np.meshgrid(np.linspace(-1, 1, n_side),
                         np.linspace(-1, 1, n_side))
    v = np.stack([xx, np.zeros_like(xx), zz], -1).reshape(-1, 3) \
        .astype(np.float32)
    f = []
    for i in range(n_side - 1):
        for j in range(n_side - 1):
            a = i * n_side + j
            f += [[a, a + 1, a + n_side], [a + 1, a + n_side + 1,
                                           a + n_side]]
    f = np.asarray(f, np.int32)
    s = ir.build_scene(v, f, np.zeros(len(f), np.int32),
                       [{"type": ir.BSDF_DIFFUSE}])
    return bvhlib.attach(s)


def _route(scene, backend):
    """Return which backend closest_hit picks, without running it."""
    calls = []
    with mock.patch.object(trace.jax, "default_backend",
                           lambda: backend):
        with mock.patch.object(trace._isect, "intersect_brute",
                               lambda *a, **k: calls.append("brute")):
            import mitsuba_tpu.ops.binned_intersect as bi
            import mitsuba_tpu.ops.bvh_traverse as bt
            with mock.patch.object(bi, "closest_hit",
                                   lambda *a, **k: calls.append("binned")):
                with mock.patch.object(bt, "closest_hit",
                                       lambda *a, **k: calls.append("bvh")):
                    o = jnp.zeros((4, 3))
                    d = jnp.ones((4, 3))
                    trace.closest_hit(scene, o, d)
    return calls[-1]


@pytest.mark.parametrize("n_side,expect_tpu", [
    (10, "brute"),      # 162 tris: tiny — fused brute
    (40, "brute"),      # 3042 tris: still under PALLAS_BRUTE_MAX_TRIS
    (60, "binned"),     # 6962 tris: above the brute cap -> binned
    (150, "binned"),    # 44k tris: mid-size class -> binned (the r3
                        # "fallback hole": brute cannot compile here)
])
def test_policy_by_size(n_side, expect_tpu):
    scene = _mesh(n_side)
    assert scene.clusters is not None
    assert _route(scene, "tpu") == expect_tpu
    # CPU always takes the BVH walk when attached (pointer chasing is
    # fine on scalar cores; pallas is interpret-only on CPU)
    assert _route(scene, "cpu") == "bvh"


def test_brute_cap_consistent_with_clusters():
    """Every scene above the TPU brute cap must carry cluster tables —
    otherwise closest_hit would fall through to the brute path that
    cannot compile at large T (the r3 hole)."""
    scene = _mesh(90)   # ~15.8k tris
    assert scene.num_triangles > trace.PALLAS_BRUTE_MAX_TRIS
    assert scene.clusters is not None

"""Native C++ component tests: must agree exactly with the Python
implementations (which remain the portable reference)."""
import numpy as np
import pytest

from mitsuba_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_obj_parser_matches_python(tmp_path):
    from mitsuba_tpu.io import mesh as meshlib

    p = tmp_path / "m.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "vt 0 0\nvt 1 0\nvt 0 1\n"
        "vn 0 0 1\n"
        "f 1/1/1 2/2/1 3/3/1\n"
        "f 2/2/1 4/1/1 3/3/1\n"
        "f -4/-3/-1 -3/-2/-1 -2/-1/-1\n"
    )
    nat = native.parse_obj(str(p))
    # python fallback parse for comparison (bypass the native fast path)
    import mitsuba_tpu.io.mesh as mm
    orig = native.parse_obj
    try:
        native.parse_obj = lambda _: None
        py = mm.load_obj(p)
    finally:
        native.parse_obj = orig
    assert np.array_equal(nat["indices"], py.indices)
    assert np.allclose(nat["vertices"], py.vertices)
    assert np.allclose(nat["uvs"], py.uvs)


def test_lbvh_matches_python():
    from mitsuba_tpu.scene import bvh as bvhlib

    rs = np.random.RandomState(3)
    base = rs.uniform(-1, 1, (777, 3)).astype(np.float32)
    verts = np.concatenate([base, base + 0.1, base + 0.2]).astype(np.float32)
    tris = np.stack([np.arange(777), np.arange(777) + 777,
                     np.arange(777) + 1554], -1).astype(np.int32)
    nat = native.build_lbvh(verts, tris, bvhlib.LEAF_SIZE)
    assert nat is not None
    # python reference build (bypass native fast path)
    orig = native.build_lbvh
    try:
        native.build_lbvh = lambda *a: None
        ref = bvhlib.build_bvh(verts, tris)
    finally:
        native.build_lbvh = orig
    amin, amax, miss, order = nat
    assert np.allclose(amin, np.asarray(ref.aabb_min))
    assert np.allclose(amax, np.asarray(ref.aabb_max))
    assert np.array_equal(miss, np.asarray(ref.miss_link))
    assert np.array_equal(order, np.asarray(ref.tri_order))

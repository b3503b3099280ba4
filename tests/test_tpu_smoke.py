"""TPU-resident smoke subset (VERDICT r1 item 7): runs ON the real chip
(`MITSUBA_TPU_TESTS=1 python -m pytest -m tpu tests/`) to catch
TPU-runtime-only faults (e.g. the argmin-in-while_loop device faults
fixed in round 1) that the CPU suite cannot see. Kept tiny: each new
program costs minutes of tunnel compile on first run.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def cornell():
    from mitsuba_tpu.scene import builtin
    return builtin.cornell_box(width=16, height=16)


def _on_tpu():
    return jax.devices()[0].platform != "cpu"


def test_device_is_tpu():
    assert _on_tpu(), jax.devices()


def test_path_render_tpu(cornell):
    from mitsuba_tpu.integrators import common, path
    scene, cam = cornell
    cfg = common.RenderConfig(spp=16, max_depth=4, seed=0)
    img = np.asarray(common.render_jit(scene, cam, path.li, cfg))
    assert np.isfinite(img).all() and 0.05 < img.mean() < 1.0


def test_pallas_vs_vpu_intersector(cornell):
    """Closest-hit agreement between the fused Pallas kernel and the VPU
    path on the same rays (t and prim id)."""
    from mitsuba_tpu.ops import intersect as isect
    scene, cam = cornell
    n = 4096
    key = jax.random.PRNGKey(1)
    o = jnp.asarray([[0.0, 1.0, 3.0]]) + 0.1 * jax.random.normal(
        key, (n, 3))
    d = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    old = isect.BRUTE_BACKEND
    try:
        isect.BRUTE_BACKEND = "vpu"
        a = isect.intersect_brute(scene, o, d)
        isect.BRUTE_BACKEND = "pallas"
        b = isect.intersect_brute(scene, o, d)
    finally:
        isect.BRUTE_BACKEND = old
    va, vb = np.asarray(a.valid), np.asarray(b.valid)
    assert (va == vb).mean() > 0.999
    both = va & vb
    assert np.allclose(np.asarray(a.t)[both], np.asarray(b.t)[both],
                       rtol=1e-4, atol=1e-4)
    assert (np.asarray(a.prim)[both] == np.asarray(b.prim)[both]).mean() > 0.999


def test_bvh_traversal_tpu(cornell):
    """Stackless BVH traversal on-chip agrees with brute force (the round-1
    device-fault regression)."""
    from mitsuba_tpu.ops import trace
    from mitsuba_tpu.scene import bvh as bvhlib
    scene, cam = cornell
    scene_bvh = bvhlib.attach(scene)
    n = 16384
    o = jnp.asarray([[0.0, 1.0, 3.0]]) + 0.1 * jax.random.normal(
        jax.random.PRNGKey(3), (n, 3))
    d = jax.random.normal(jax.random.PRNGKey(4), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    a = trace.closest_hit(scene, o, d)
    b = trace.closest_hit(scene_bvh, o, d)
    both = np.asarray(a.valid) & np.asarray(b.valid)
    assert (np.asarray(a.valid) == np.asarray(b.valid)).mean() > 0.999
    assert np.allclose(np.asarray(a.t)[both], np.asarray(b.t)[both],
                       rtol=1e-4, atol=1e-4)


def test_wavefront_render_tpu(cornell):
    from mitsuba_tpu.integrators import common, wavefront
    scene, cam = cornell
    cfg = common.RenderConfig(spp=16, max_depth=4, seed=0)
    img = np.asarray(wavefront.render_jit(scene, cam, cfg))
    assert np.isfinite(img).all() and 0.05 < img.mean() < 1.0


def test_grid_medium_tracking_tpu():
    """Delta/ratio tracking scans execute on-chip (per-lane grid gathers
    inside scan bodies — the pattern that faulted in while_loops)."""
    from mitsuba_tpu.core.rng import uniform
    from mitsuba_tpu.models import medium as medlib
    n = 8192
    med = medlib.make_grid(np.ones((4, 4, 4), np.float32), 1.0, 0.5,
                           box_min=(-5, -5, -5), box_max=(5, 5, 5))
    lanes = jnp.arange(n, dtype=jnp.uint32)

    def u(j):
        return uniform(jnp.uint32(11), lanes, jnp.uint32(0), j)

    o = jnp.zeros((n, 3))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    W = medlib.transmittance_track(med, u, o, d, jnp.full((n,), 1.0))
    est = np.asarray(jnp.mean(W, 0))
    assert np.allclose(est, np.exp(-1.0), rtol=5e-2), est


def test_binned_intersector_tpu():
    """The block-coherent binned kernel (ops/binned_intersect.py) runs
    on-chip and agrees with brute force — covers the Mosaic K-packed
    dot, bit-iteration pl.when control flow, and output-block revisit
    accumulation, none of which the CPU interpret-mode test exercises."""
    from mitsuba_tpu.ops import binned_intersect as bi
    from mitsuba_tpu.ops import intersect as isect
    from mitsuba_tpu.scene import ir as irlib

    g = 48  # ~4.4k tris: small compile, > one cluster group
    xx, zz = np.meshgrid(np.linspace(-1, 1, g), np.linspace(-1, 1, g))
    rng = np.random.RandomState(0)
    yy = rng.uniform(-0.15, 0.15, xx.shape)
    v = np.stack([xx, yy, zz], -1).reshape(-1, 3).astype(np.float32)
    f = []
    for i in range(g - 1):
        for j in range(g - 1):
            a = i * g + j
            f += [[a, a + 1, a + g], [a + 1, a + g + 1, a + g]]
    scene = irlib.build_scene(v, np.asarray(f, np.int32),
                              np.zeros(len(f), np.int32),
                              [{"type": irlib.BSDF_DIFFUSE}])
    cl = bi.build_clusters(scene)
    n = 8192
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    o = jnp.asarray([[0.0, 2.0, 0.0]]) + jax.random.normal(k1, (n, 3)) * 0.5
    tgt = jax.random.uniform(k2, (n, 3), minval=-1, maxval=1) * 0.9
    d = tgt.at[:, 1].set(0.0) - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    its = bi.closest_hit(scene, cl, o, d)
    ref = isect.intersect_brute(scene, o, d)
    va, vb = np.asarray(ref.valid), np.asarray(its.valid)
    assert (va == vb).mean() > 0.999
    leaks = va & ~vb
    assert not leaks.any(), f"leaks vs brute: {leaks.sum()}"
    both = va & vb
    tb = np.asarray(ref.t)[both]
    to = np.asarray(its.t)[both]
    close = np.isclose(tb, to, rtol=1e-4, atol=1e-5)
    # rare (~1e-4) exact-edge rays resolve to the kernel's clamped edge
    # point, never farther than brute (watertight bias — see the
    # adversarial contract in test_bvh.py)
    assert (close | (to <= tb + 1e-5)).all()
    assert close.mean() > 0.999, close.mean()
    assert (np.asarray(ref.prim)[both]
            == np.asarray(its.prim)[both]).mean() > 0.999


def test_tpu_render_matches_cpu_golden():
    """VERDICT r3 weak #7: an on-chip render must match the checked-in
    CPU golden in VALUE, not just in loose statistics — bf16-default
    matmuls or different reduction orders would otherwise drift
    silently. conftest pins jax_default_matmul_precision=float32; the
    remaining tolerance covers fp association differences between the
    CPU and TPU backends at 64 spp."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.golden_scenes import render_case
    golden = os.path.join(os.path.dirname(__file__), "golden",
                          "cornell_path.npy")
    if not os.path.exists(golden):
        pytest.skip("golden not generated")
    img = render_case("cornell_path")
    ref = np.load(golden)
    assert img.shape == ref.shape
    err = np.abs(img - ref) / np.maximum(ref, 5e-2)
    # mean relative agreement tight; allow a small tail of pixels where
    # RR/termination order flips a sample between backends
    assert float(err.mean()) < 0.015, float(err.mean())
    assert float((err > 0.1).mean()) < 0.01, float((err > 0.1).mean())


def test_tpu_vertex_boundary_gradient():
    """On-chip differentiability smoke: jax.grad of the edge-sampled
    boundary estimator (integrators/boundary.py) w.r.t. blocker
    vertices, with the real (non-interpret) compute path. The CPU suite
    FD-validates the values; here we pin that the scatter/gather-heavy
    boundary passes compile and produce a finite, clearly-nonzero
    occlusion gradient on the TPU backend."""
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_vertex_grad import BLOCKER_ROWS, shadow_scene
    from mitsuba_tpu.integrators import boundary, common

    scene, cam = shadow_scene()
    bc = boundary.BoundaryConfig(n_edge=4, primary=False)

    def loss(theta):
        s = scene.replace(vertices=scene.vertices
                          .at[BLOCKER_ROWS[0]:BLOCKER_ROWS[1], 0]
                          .add(theta))
        cfg = common.RenderConfig(spp=16, max_depth=2, seed=3)
        img = common.render(
            s, cam, lambda s_, c_, o, d, st, cf:
            boundary.li_grad(s_, c_, o, d, st, cf, bc), cfg)
        return jnp.mean(img)

    g = float(jax.grad(loss)(0.0))
    # the shadow moves right out of the frame: strongly negative
    assert np.isfinite(g) and g < -0.1, g

"""Gradient coverage for the README's parameter-class claims (VERDICT r4
item 6): medium sigma_t/albedo through volpath, microfacet roughness,
gradients with the binned intersector in the loop, and a shard_map
gradient equal to the unsharded one."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.integrators import common, path, volpath
from mitsuba_tpu.models import medium as medlib
from mitsuba_tpu.scene import builtin


def _fd_check(loss, theta0, eps, rtol, fd_loss=None):
    """jax.grad vs central FD; fd_loss may be a higher-spp variant of
    the same estimator (CRN FD needs more samples than AD)."""
    g = float(jax.grad(loss)(theta0))
    f = fd_loss or loss
    fd = (float(f(theta0 + eps)) - float(f(theta0 - eps))) / (2 * eps)
    assert np.isfinite(g) and abs(fd) > 1e-6, (g, fd)
    assert abs(g - fd) <= rtol * abs(fd) + 1e-5, (g, fd)
    return g, fd


def test_gradient_wrt_medium_sigma_t():
    """d(image)/d(sigma_t) of a homogeneous medium via volpath vs FD.
    The medium uses detached distance sampling (models/medium.py
    sample_distance), so pathwise AD is unbiased; the FD side needs
    more spp (CRN FD of a sampled estimator is noisy)."""
    scene, cam = builtin.cornell_box(width=16, height=16)

    def loss_at(spp):
        def loss(s_t):
            cfg = common.RenderConfig(spp=spp, max_depth=3, seed=3)
            med = medlib.make_homogeneous(jnp.ones(3) * s_t * 0.5,
                                          jnp.ones(3) * s_t * 0.5)
            return jnp.mean(common.render(scene.replace(medium=med), cam,
                                          volpath.li, cfg))
        return loss

    _fd_check(loss_at(64), 0.3, 0.1, 0.12, fd_loss=loss_at(256))


def test_gradient_wrt_medium_albedo():
    """d(image)/d(albedo): more in-scattering -> brighter medium."""
    scene, cam = builtin.cornell_box(width=16, height=16)

    def loss_at(spp):
        def loss(a):
            cfg = common.RenderConfig(spp=spp, max_depth=3, seed=5)
            med = medlib.make_homogeneous(a * 0.4, (1.0 - a) * 0.4)
            return jnp.mean(common.render(scene.replace(medium=med), cam,
                                          volpath.li, cfg))
        return loss

    _fd_check(loss_at(64), 0.5, 0.1, 0.12, fd_loss=loss_at(256))


def test_gradient_wrt_roughness():
    """d(image)/d(alpha) of a rough-conductor floor vs FD. The material
    must be rough-conductor at BUILD time: the bsdf family set is static
    (masked SIMD dispatch), so flipping `type` at runtime would dispatch
    to nothing."""
    import numpy as _np
    from mitsuba_tpu.scene import ir
    verts = _np.asarray([[-2, 0, -2], [-2, 0, 2], [2, 0, 2], [2, 0, -2],
                         [-0.4, 1.5, -0.4], [0.4, 1.5, -0.4],
                         [0.4, 1.5, 0.4], [-0.4, 1.5, 0.4]], _np.float32)
    tris = _np.asarray([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]],
                       _np.int32)
    scene = ir.build_scene(
        verts, tris, _np.zeros(4, _np.int32),
        [{"type": ir.BSDF_ROUGH_CONDUCTOR, "alpha": [0.25, 0.25],
          "eta": [0.2, 0.92, 1.1], "k": [3.9, 2.45, 2.14]}],
        tri_radiance={2: [8.0] * 3, 3: [8.0] * 3})
    from mitsuba_tpu.models import sensor as sensorlib
    cam = sensorlib.make_camera(origin=[0, 1.0, 2.5], target=[0, 0, 0],
                                fov_x=50.0, width=16, height=16)

    def loss_at(spp):
        def loss(alpha):
            m2 = scene.materials.replace(
                alpha=scene.materials.alpha.at[0].set(alpha))
            cfg = common.RenderConfig(spp=spp, max_depth=2, seed=7)
            return jnp.mean(common.render(scene.replace(materials=m2),
                                          cam, path.li, cfg))
        return loss

    _fd_check(loss_at(48), 0.25, 0.05, 0.15, fd_loss=loss_at(192))


def test_gradient_through_binned_intersector():
    """Reflectance gradient with the binned (cluster/Pallas) intersector
    in the trace loop — big-mesh differentiability. Uses the interpret-
    mode kernel on CPU with a small clustered mesh."""
    from unittest import mock
    import jax.experimental.pallas as plmod

    from mitsuba_tpu.ops import trace
    from mitsuba_tpu.scene import bvh as bvhlib, ir

    # a small clustered mesh: jittered grid sheet (~1k tris) + light
    g = 24
    xx, zz = np.meshgrid(np.linspace(-1, 1, g), np.linspace(-1, 1, g))
    rng = np.random.RandomState(0)
    yy = rng.uniform(-0.03, 0.03, xx.shape)
    verts = np.stack([xx, yy, zz], -1).reshape(-1, 3).astype(np.float32)
    tris = []
    for i in range(g - 1):
        for j in range(g - 1):
            a = i * g + j
            tris += [[a, a + 1, a + g], [a + 1, a + g + 1, a + g]]
    base = len(verts)
    verts = np.concatenate([verts, np.asarray(
        [[-0.3, 1.2, -0.3], [0.3, 1.2, -0.3], [0.3, 1.2, 0.3],
         [-0.3, 1.2, 0.3]], np.float32)])
    tris = np.asarray(tris + [[base, base + 1, base + 2],
                              [base, base + 2, base + 3]], np.int32)
    tri_mat = np.zeros((len(tris),), np.int32)
    scene = ir.build_scene(
        verts, tris, tri_mat,
        [{"type": ir.BSDF_DIFFUSE, "reflectance": [0.6, 0.6, 0.6]}],
        tri_radiance={len(tris) - 2: [8.0, 8.0, 8.0],
                      len(tris) - 1: [8.0, 8.0, 8.0]})
    scene = bvhlib.attach(scene)
    assert scene.clusters is not None

    n = 256
    o = jnp.tile(jnp.asarray([[0.0, 1.5, 0.0]]), (n, 1))
    key = jax.random.PRNGKey(0)
    dd = jax.random.normal(key, (n, 3))
    dd = dd.at[:, 1].set(-jnp.abs(dd[:, 1]) - 0.8)
    dd = dd / jnp.linalg.norm(dd, axis=-1, keepdims=True)

    orig = plmod.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    from mitsuba_tpu.ops import binned_intersect as bi

    def loss(refl):
        s = scene.replace(
            materials=scene.materials.replace(reflectance=refl))
        its = bi.closest_hit(s, s.clusters, o, dd)
        si = trace.surface_interaction(s, o, dd, its)
        refl_g = s.materials.reflectance[jnp.maximum(si["mat"], 0)]
        cos = jnp.maximum(-dd[:, 1], 0.0)
        return jnp.mean(jnp.where(its.valid[:, None],
                                  refl_g * cos[:, None], 0.0))

    with mock.patch.object(plmod, "pallas_call", interp_call):
        refl0 = scene.materials.reflectance
        g_val = jax.grad(loss)(refl0)
        l0 = float(loss(refl0))
    g_val = np.asarray(g_val)
    assert np.isfinite(g_val).all() and abs(g_val[0]).max() > 1e-4
    # loss is linear in the reflectance: sum_c dL/drefl_c * refl_c = L
    assert np.isclose(g_val.sum() * 0.6, l0, rtol=1e-4), (g_val.sum(), l0)


def test_sharded_gradient_matches_unsharded(request):
    """jax.grad through the shard_map-sharded renderer equals the
    single-device gradient (multi-chip differentiability)."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from mitsuba_tpu.parallel import render_sharded as rs
    scene, cam = builtin.cornell_box(width=16, height=16)
    cfg = common.RenderConfig(spp=4, max_depth=3, seed=2)

    def loss_single(refl):
        s = scene.replace(materials=scene.materials.replace(
            reflectance=refl))
        return jnp.mean(common.render(s, cam, path.li, cfg))

    mesh = rs.make_mesh(8, sp=1)

    def loss_sharded(refl):
        s = scene.replace(materials=scene.materials.replace(
            reflectance=refl))
        return jnp.mean(rs.render_sharded(s, cam, path.li, cfg, mesh))

    refl0 = scene.materials.reflectance
    g1 = np.asarray(jax.grad(loss_single)(refl0))
    g2 = np.asarray(jax.grad(loss_sharded)(refl0))
    assert np.allclose(g1, g2, rtol=1e-3, atol=1e-6), (g1, g2)

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
    """d(image)/d(alpha) of a rough conductor floor vs FD."""
    from mitsuba_tpu.scene import ir
    scene, cam = builtin.cornell_box(width=16, height=16)
    mats = scene.materials
    # make material 0 (the white walls/floor) a rough conductor
    new_type = mats.type.at[0].set(ir.BSDF_ROUGH_CONDUCTOR)
    cfg = common.RenderConfig(spp=32, max_depth=3, seed=7)

    def loss(alpha):
        m2 = mats.replace(type=new_type,
                          alpha=mats.alpha.at[0].set(alpha))
        return jnp.mean(common.render(scene.replace(materials=m2), cam,
                                      path.li, cfg))

    _fd_check(loss, 0.25, 0.02, 0.15)


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
    # linear in reflectance: grad sums to loss value
    assert np.isclose(g_val.sum(), l0, rtol=1e-4)


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

"""End-to-end render tests: energy sanity, integrator cross-consistency
(the reference's scene-fixture strategy, data/tests/*.xml — integrators
validated against each other), and differentiability."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.integrators import aov, common, direct, path
from mitsuba_tpu.scene import builtin


@pytest.fixture(scope="module")
def cornell32():
    return builtin.cornell_box(width=32, height=32)


def test_path_render_basic(cornell32):
    scene, cam = cornell32
    cfg = common.RenderConfig(spp=32, max_depth=4, seed=1)
    img = np.asarray(common.render_jit(scene, cam, path.li, cfg))
    assert img.shape == (32, 32, 3)
    assert np.all(np.isfinite(img)) and np.all(img >= 0)
    assert 0.05 < img.mean() < 2.0
    # left wall red-ish, right wall green-ish in the rendered view
    left = img[10:22, :6].mean(axis=(0, 1))
    right = img[10:22, -6:].mean(axis=(0, 1))
    assert left[0] > left[1] * 1.5
    assert right[1] > right[0] * 1.5


def test_direct_vs_path_depth2(cornell32):
    """path with max_depth=2 computes exactly direct lighting: the two
    integrators must agree (bidir-vs-unidir consistency idea)."""
    scene, cam = cornell32
    cfg_p = common.RenderConfig(spp=256, max_depth=2, seed=2)
    cfg_d = common.RenderConfig(spp=256, max_depth=2, seed=3)
    img_p = np.asarray(common.render_jit(scene, cam, path.li, cfg_p))
    img_d = np.asarray(common.render_jit(scene, cam, direct.li, cfg_d))
    # agree in mean and pixelwise within MC noise
    assert abs(img_p.mean() - img_d.mean()) / img_d.mean() < 0.03
    diff = np.abs(img_p - img_d).mean()
    assert diff < 0.05 * (img_d.mean() + 0.1), diff


def test_seed_determinism(cornell32):
    scene, cam = cornell32
    cfg = common.RenderConfig(spp=8, max_depth=3, seed=7)
    a = np.asarray(common.render_jit(scene, cam, path.li, cfg))
    b = np.asarray(common.render_jit(scene, cam, path.li, cfg))
    assert np.array_equal(a, b)
    c = np.asarray(
        common.render_jit(scene, cam, path.li, common.RenderConfig(spp=8, max_depth=3, seed=8))
    )
    assert not np.array_equal(a, c)


def test_spp_convergence(cornell32):
    """Higher spp converges toward the high-spp reference (MC 1/sqrt(n))."""
    scene, cam = cornell32
    ref = np.asarray(
        common.render_jit(scene, cam, path.li, common.RenderConfig(spp=512, max_depth=3, seed=11))
    )
    err = []
    for spp in (8, 64):
        img = np.asarray(
            common.render_jit(scene, cam, path.li, common.RenderConfig(spp=spp, max_depth=3, seed=5))
        )
        err.append(np.abs(img - ref).mean())
    assert err[1] < err[0] * 0.6, err


def test_aov_integrators(cornell32):
    scene, cam = cornell32
    cfg = common.RenderConfig(spp=4, max_depth=2)
    depth = np.asarray(common.render_jit(scene, cam, aov.li_depth, cfg))
    assert depth.min() >= 0 and 0.5 < depth[depth > 0].min() < 2.0
    normal = np.asarray(common.render_jit(scene, cam, aov.li_normal, cfg))
    assert np.all(np.abs(normal) <= 1.0 + 1e-5)


def test_gradient_wrt_reflectance(cornell32):
    """Differentiable rendering: d(mean image)/d(albedo) is finite, nonzero,
    and matches finite differences (the BASELINE gradient check, small)."""
    scene, cam = cornell32
    cfg = common.RenderConfig(spp=16, max_depth=3, seed=4)

    def loss(refl):
        s = scene.replace(materials=scene.materials.replace(reflectance=refl))
        img = common.render(s, cam, path.li, cfg)
        return jnp.mean(img)

    refl0 = scene.materials.reflectance
    g = np.asarray(jax.grad(loss)(refl0))
    assert np.all(np.isfinite(g))
    assert abs(g[0]).max() > 1e-3  # white walls affect the image

    # finite-difference check on the white material's red channel
    eps = 1e-2
    e = jnp.zeros_like(refl0).at[0, 0].set(eps)
    fd = (float(loss(refl0 + e)) - float(loss(refl0 - e))) / (2 * eps)
    assert np.isclose(g[0, 0], fd, rtol=5e-2, atol=1e-4), (g[0, 0], fd)


def test_gradient_wrt_emission(cornell32):
    """Image is linear in emitter radiance -> grad == (image with unit
    emission contribution), and FD matches tightly."""
    scene, cam = cornell32
    cfg = common.RenderConfig(spp=8, max_depth=3, seed=9)

    def loss(rad):
        s = scene.replace(emitters=scene.emitters.replace(radiance=rad))
        return jnp.mean(common.render(s, cam, path.li, cfg))

    rad0 = scene.emitters.radiance
    g = np.asarray(jax.grad(loss)(rad0))
    assert np.all(np.isfinite(g)) and g.max() > 0
    scale = 1.1
    # linearity: loss(s*rad) = s * loss(rad)
    l1, l2 = float(loss(rad0)), float(loss(rad0 * scale))
    assert np.isclose(l2, scale * l1, rtol=1e-5)


def test_filtered_render_close_to_box(cornell32):
    scene, cam = cornell32
    a = np.asarray(
        common.render_jit(scene, cam, path.li,
                          common.RenderConfig(spp=64, max_depth=3, seed=6))
    )
    b = np.asarray(
        common.render_jit(
            scene, cam, path.li,
            common.RenderConfig(spp=64, max_depth=3, seed=6,
                                filter=__import__("mitsuba_tpu.film.film", fromlist=["f"]).FILTER_GAUSSIAN),
        )
    )
    # gaussian blurs slightly but the mean brightness is preserved
    assert abs(a.mean() - b.mean()) / a.mean() < 0.02

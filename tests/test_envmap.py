"""Environment map emitter tests: uv mapping roundtrip, importance
sampling matches pdf, MC integral of radiance (envmap.cpp parity)."""
import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.scene import envmap as envlib
from mitsuba_tpu.utils.chi2 import spherical_chi2


def make_env(seed=0, h=16, w=32):
    rs = np.random.RandomState(seed)
    img = rs.uniform(0.05, 1.0, (h, w, 3)).astype(np.float32)
    img[h // 3, w // 4] *= 40.0  # hot spot
    return envlib.build_envmap(img)


def test_uv_dir_roundtrip():
    rs = np.random.RandomState(1)
    d = rs.normal(size=(1000, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    u, v = envlib.dir_to_uv(jnp.asarray(d))
    d2 = np.asarray(envlib.uv_to_dir(u, v))
    assert np.allclose(d, d2, atol=1e-4)


def test_sample_matches_pdf_chi2():
    em = make_env()
    passed, p, stats = spherical_chi2(
        lambda u2: envlib.sample_direction(em, u2)[0],
        lambda v: envlib.pdf_direction(em, v),
        n_samples=1 << 18,
        theta_bins=16,
        phi_bins=32,
        significance=0.001,
        seed=11,
        polar_axis="y",  # lat-long pole axis
    )
    assert passed, (p, stats)


def test_sample_pdf_selfconsistent():
    em = make_env()
    u2 = jax.random.uniform(jax.random.PRNGKey(2), (4096, 2))
    d, pdf, rad = envlib.sample_direction(em, u2)
    pdf2 = np.asarray(envlib.pdf_direction(em, d))
    # texel-seam lanes can round to the neighboring texel after the
    # dir->uv roundtrip; require consistency away from seams
    match = np.isclose(np.asarray(pdf), pdf2, rtol=1e-3)
    assert match.mean() > 0.999, match.mean()
    assert np.all(np.asarray(pdf) > 0)


def test_mc_total_radiance():
    """E[L/pdf] over importance samples == integral of L over the sphere
    (computed by direct quadrature of the lat-long map)."""
    em = make_env(seed=3)
    u2 = jax.random.uniform(jax.random.PRNGKey(3), (1 << 18, 2))
    d, pdf, rad = envlib.sample_direction(em, u2)
    est = np.asarray(jnp.mean(rad / pdf[:, None], axis=0))

    img = np.asarray(em.image)
    h, w = img.shape[:2]
    theta = (np.arange(h) + 0.5) / h * np.pi
    dw = np.sin(theta)[:, None, None] * (np.pi / h) * (2 * np.pi / w)
    ref = (img * dw).sum((0, 1))
    assert np.allclose(est, ref, rtol=2e-2), (est, ref)


def test_render_under_envmap():
    """Diffuse plane lit by a constant envmap: radiance equals albedo *
    env (white furnace for the upper hemisphere)."""
    import numpy as np
    from mitsuba_tpu.integrators import common, path
    from mitsuba_tpu.models import sensor as sensorlib
    from mitsuba_tpu.scene import ir

    # big ground plane
    verts = np.asarray([[-50, 0, -50], [50, 0, -50], [50, 0, 50], [-50, 0, 50]], np.float32)
    tris = np.asarray([[0, 2, 1], [0, 3, 2]], np.int32)
    scene = ir.build_scene(verts, tris, np.zeros(2, np.int32),
                           [{"type": ir.BSDF_DIFFUSE, "reflectance": [0.6, 0.6, 0.6]}])
    scene = envlib.attach_envmap(scene, np.ones((8, 16, 3), np.float32))
    cam = sensorlib.make_camera([0, 2, -5], [0, 0, 0], fov_x=30, width=8, height=8)
    cfg = common.RenderConfig(spp=128, max_depth=6, seed=0)
    img = np.asarray(common.render_jit(scene, cam, path.li, cfg))
    # Lambertian under uniform sky: L_out = albedo * 1.0 (plus interrefl.)
    center = img[5:8, 2:6].mean()
    assert 0.55 < center < 0.75, center

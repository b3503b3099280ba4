"""Hero-wavelength spectral rendering (integrators/spectral.py +
core/spectrum.py): upsampling round-trip, RGB-vs-spectral agreement,
spectral furnace, and dispersion."""
import numpy as np
import jax.numpy as jnp

from mitsuba_tpu.core import spectrum as S
from mitsuba_tpu.integrators import common, path, spectral
from mitsuba_tpu.scene import builtin


def test_upsample_roundtrip():
    lam = jnp.linspace(S.LAMBDA_MIN, S.LAMBDA_MAX, 2048)
    resp = np.asarray(S.rgb_response(lam))
    for rgb in [(1, 1, 1), (0.5, 0.3, 0.8), (0.2, 0.2, 0.2),
                (0.9, 0.6, 0.1)]:
        s = np.asarray(S.upsample(jnp.asarray(rgb, jnp.float32), lam))
        back = np.trapezoid(resp * s[:, None], np.asarray(lam), axis=0)
        assert np.allclose(back, rgb, atol=5e-3), (rgb, back)
    assert (np.asarray(S.upsample(jnp.asarray([0.0, 0.0, 1.0]), lam))
            >= 0).all()


def test_hero_lambdas_cover_range():
    u = jnp.linspace(0, 0.999, 64)
    lam = np.asarray(S.sample_lambdas(u))
    assert lam.shape == (64, S.N_LAMBDA)
    assert lam.min() >= S.LAMBDA_MIN and lam.max() <= S.LAMBDA_MAX
    # companions are rotations: sorted gaps are ~range/K
    gaps = np.diff(np.sort(lam[0]))
    assert np.allclose(gaps, S.LAMBDA_RANGE / S.N_LAMBDA, atol=1.0)


def test_planck_and_cauchy():
    lam = jnp.asarray([450.0, 550.0, 650.0])
    p = np.asarray(S.planck(lam, 6500.0))
    assert (p > 0).all() and p.max() <= 1.0 + 1e-5
    # hotter -> relatively more blue
    p3k = np.asarray(S.planck(lam, 3000.0))
    assert p[0] / p[2] > p3k[0] / p3k[2]
    n = np.asarray(S.cauchy_eta(jnp.float32(1.5), jnp.float32(0.01), lam))
    assert n[0] > n[1] > n[2]          # blue bends more
    n_d = float(S.cauchy_eta(jnp.float32(1.5), jnp.float32(0.01),
                             jnp.float32(589.3)))
    assert abs(n_d - 1.5) < 1e-5       # sodium-D anchor


def test_spectral_matches_rgb_gray_cornell():
    """On a grayscale scene the spectral and RGB estimators share the
    same expectation (flat spectra multiply exactly)."""
    scene, cam = builtin.cornell_box(width=12, height=12)
    gray = jnp.full_like(scene.materials.reflectance, 0.6)
    scene = scene.replace(materials=scene.materials.replace(
        reflectance=gray))
    cfg = common.RenderConfig(spp=96, max_depth=4, seed=0)
    a = np.asarray(common.render_jit(scene, cam, path.li, cfg))
    b = np.asarray(common.render_jit(scene, cam, spectral.li, cfg))
    assert np.isfinite(b).all()
    # per-channel agreement (the light is the warm Cornell (17,12,4), so
    # the image is not gray — but the two estimators must agree on it)
    ca, cb = a.mean(axis=(0, 1)), b.mean(axis=(0, 1))
    assert np.abs(ca - cb).max() / ca.mean() < 0.05, (ca, cb)


def test_dispersion_produces_color():
    """A white light viewed through a tilted glass interface: without
    dispersion the image stays achromatic; with cauchy_b > 0 the
    refraction angle varies per wavelength and chromatic fringes
    appear."""
    from mitsuba_tpu.models import sensor as sensorlib
    from mitsuba_tpu.scene import ir as irlib

    verts, tris, tri_mat, tri_rad = [], [], [], {}

    def add_quad(p0, p1, p2, p3, mat_id, radiance=None):
        base = len(verts)
        verts.extend([p0, p1, p2, p3])
        for t in ([base, base + 1, base + 2], [base, base + 2, base + 3]):
            if radiance is not None:
                tri_rad[len(tris)] = radiance
            tris.append(t)
            tri_mat.append(mat_id)

    glass = {"type": irlib.BSDF_DIELECTRIC, "eta": [1.8, 1.8, 1.8]}
    dark = {"type": irlib.BSDF_DIFFUSE, "reflectance": [0.0, 0.0, 0.0]}
    # big tilted glass pane between camera and light
    c, st = np.cos(0.6), np.sin(0.6)
    add_quad([-2, -2 * c, 1 - 2 * st], [-2, 2 * c, 1 + 2 * st],
             [2, 2 * c, 1 + 2 * st], [2, -2 * c, 1 - 2 * st], 0)
    # small bright white light behind it
    add_quad([-0.15, -0.15, 2.5], [-0.15, 0.15, 2.5],
             [0.15, 0.15, 2.5], [0.15, -0.15, 2.5], 1,
             radiance=[60.0, 60.0, 60.0])
    scene = irlib.build_scene(
        np.asarray(verts, np.float32), np.asarray(tris, np.int32),
        np.asarray(tri_mat, np.int32), [glass, dark], tri_radiance=tri_rad)
    cam = sensorlib.make_camera(origin=[0, 0, -1.5], target=[0, 0, 1.0],
                                fov_x=25.0, width=24, height=24)

    cfg0 = common.RenderConfig(spp=128, max_depth=4, seed=1, cauchy_b=0.0)
    cfgd = common.RenderConfig(spp=128, max_depth=4, seed=1, cauchy_b=0.08)
    img0 = np.asarray(common.render_jit(scene, cam, spectral.li, cfg0))
    imgd = np.asarray(common.render_jit(scene, cam, spectral.li, cfgd))
    assert np.isfinite(imgd).all()
    assert imgd.mean() > 1e-4          # light is visible through the pane

    def chroma(img):
        m_ = img.mean(-1)
        dev = np.abs(img - img.mean(-1, keepdims=True)).sum(-1)
        return dev.sum() / max(m_.sum(), 1e-6)

    # dispersion separates wavelengths -> clearly larger total chroma
    assert chroma(imgd) > 2.0 * chroma(img0) + 1e-3, \
        (chroma(img0), chroma(imgd))


def test_blackbody_xml(tmp_path):
    from mitsuba_tpu.scene import xml as xmllib

    xml = """
<scene version="0.6.0">
    <integrator type="path"/>
    <sensor type="perspective">
        <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
        <film type="hdrfilm">
            <integer name="width" value="4"/><integer name="height" value="4"/>
        </film>
    </sensor>
    <shape type="rectangle">
        <emitter type="area">
            <blackbody name="radiance" temperature="3000"/>
        </emitter>
    </shape>
    <shape type="rectangle">
        <transform name="toWorld"><translate z="2"/></transform>
        <emitter type="area">
            <blackbody name="radiance" temperature="9000"/>
        </emitter>
    </shape>
</scene>
"""
    p = tmp_path / "bb.xml"
    p.write_text(xml)
    scene, cam, cfg, _ = xmllib.load_xml(p)
    rad = np.asarray(scene.emitters.radiance)
    warm, cool = rad[0], rad[1]
    # 3000K is red-heavy; 9000K is blue-heavy
    assert warm[0] > warm[2] and cool[2] > cool[0], (warm, cool)

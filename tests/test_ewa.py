"""EWA anisotropic texture filtering (mipmap.h:161 evalEWA analog).

Property tests of the fixed-tap anisotropic filter: anisotropy along the
stripe direction must NOT blur across stripes (the artifact trilinear
filtering has at grazing angles), isotropic gradients must reduce to the
trilinear result, and the ray-differential plumbing must produce
uv gradients at the primary hit.
"""
import numpy as np
import jax.numpy as jnp

from mitsuba_tpu.models import texture as tex
from mitsuba_tpu.scene import ir


def stripe_scene(res=64):
    """Single textured quad; texture = horizontal stripes (varies along v
    only, constant along u)."""
    data = np.zeros((res, res, 3), np.float32)
    data[::2, :, :] = 1.0                      # stripe rows
    verts = np.asarray([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                       np.float32)
    faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    mat = {"type": ir.BSDF_DIFFUSE, "reflectance": [1, 1, 1],
           "tex_reflectance": 0}
    return ir.build_scene(verts, faces, np.zeros(2, np.int32), [mat],
                          uvs=uvs, textures=[{"data": data}],
                          lod_scale=1.0)


def test_ewa_preserves_cross_stripe_sharpness():
    """Anisotropy ALONG u (constant-v taps) must keep the stripe value;
    the equivalent isotropic trilinear lookup blurs toward the mean."""
    scene = stripe_scene()
    n = 8
    # sample at stripe centers: v such that row = stripe row center
    v = ((np.arange(n) % 2) + 0.5) / 64.0            # rows 0 / 1 alternate
    v = 1.0 - v                                       # texture y flip
    uv = np.stack([np.full(n, 0.5), v], -1).astype(np.float32)
    tid = np.zeros(n, np.int32)
    big = 4.0 / 64.0        # 4-texel-long footprint along u (8:1 aniso,
    duvdx = np.tile([big, 0.0], (n, 1)).astype(np.float32)  # inside clamp)
    duvdy = np.tile([0.0, 0.5 / 64.0], (n, 1)).astype(np.float32)
    ewa, has = tex._ewa(scene, jnp.asarray(tid), jnp.asarray(uv),
                        jnp.asarray(duvdx), jnp.asarray(duvdy))
    ewa = np.asarray(ewa)
    assert bool(np.asarray(has).all())
    # stripes alternate 1/0 per row; taps along u stay in the same row
    expect = (np.floor((1.0 - uv[:, 1]) * 64 - 0.0) % 2 == 0).astype(float)
    assert np.allclose(ewa[:, 0], expect, atol=0.25), (ewa[:, 0], expect)
    # isotropic trilinear at the MAJOR-axis footprint blurs to ~0.5
    lod_iso = np.log2(4.0)
    tri = np.asarray(tex._trilinear_at(
        scene, jnp.asarray(tid), jnp.asarray(uv),
        jnp.full((n,), lod_iso, np.float32)))
    assert np.allclose(tri[:, 0], 0.5, atol=0.15)
    # EWA keeps >2x more stripe contrast than the isotropic filter
    c_ewa = abs(ewa[::2, 0] - ewa[1::2, 0]).mean()
    c_tri = abs(tri[::2, 0] - tri[1::2, 0]).mean()
    assert c_ewa > 2.0 * max(c_tri, 0.05), (c_ewa, c_tri)


def test_ewa_isotropic_matches_trilinear():
    scene = stripe_scene()
    n = 16
    rng = np.random.default_rng(0)
    uv = rng.uniform(0.1, 0.9, (n, 2)).astype(np.float32)
    tid = np.zeros(n, np.int32)
    s = 4.0 / 64.0                       # 4-texel isotropic footprint
    duvdx = np.tile([s, 0.0], (n, 1)).astype(np.float32)
    duvdy = np.tile([0.0, s], (n, 1)).astype(np.float32)
    ewa, _ = tex._ewa(scene, jnp.asarray(tid), jnp.asarray(uv),
                      jnp.asarray(duvdx), jnp.asarray(duvdy))
    tri = tex._trilinear_at(scene, jnp.asarray(tid), jnp.asarray(uv),
                            jnp.full((n,), np.log2(4.0), np.float32))
    assert np.allclose(np.asarray(ewa), np.asarray(tri), atol=0.1)


def test_primary_hit_duv_gradients():
    """surface_interaction + sensor.ray_differentials produce uv gradients
    matching the raster-step finite difference on a tilted quad."""
    from mitsuba_tpu.models import sensor as sensorlib
    from mitsuba_tpu.ops import trace
    scene = stripe_scene()
    cam = sensorlib.make_camera(origin=[0.3, -1.5, 1.2],
                                target=[0.0, 0.0, 0.0],
                                fov_x=45.0, width=32, height=32)
    px = jnp.asarray([12.0, 16.0, 20.0])
    py = jnp.asarray([14.0, 16.0, 18.0])
    u0 = jnp.zeros((3, 2))
    o, d, _ = sensorlib.sample_rays(cam, px, py, u0)
    its = trace.closest_hit(scene, o, d)
    assert bool(np.asarray(its.valid).all())
    ddx, ddy = sensorlib.ray_differentials(cam, d)
    si = trace.surface_interaction(scene, o, d, its, dd_dx=ddx, dd_dy=ddy)
    assert "duvdx" in si and "duvdy" in si

    # finite difference: uv at (px+1, py)
    o2, d2, _ = sensorlib.sample_rays(cam, px + 1.0, py, u0)
    its2 = trace.closest_hit(scene, o2, d2)
    si2 = trace.surface_interaction(scene, o2, d2, its2)
    duv_fd = np.asarray(si2["uv"]) - np.asarray(si["uv"])
    assert np.allclose(np.asarray(si["duvdx"]), duv_fd, atol=2e-3), (
        np.asarray(si["duvdx"]), duv_fd)


def test_path_with_mips_still_renders():
    """End-to-end wiring: path tracing a mip-mapped scene with the EWA
    branch compiled in stays finite."""
    from mitsuba_tpu.integrators import common, path
    from mitsuba_tpu.models import sensor as sensorlib
    scene = stripe_scene()
    cam = sensorlib.make_camera(origin=[0.0, -2.5, 0.35],
                                target=[0.0, 0.0, 0.0],
                                fov_x=50.0, width=24, height=24)
    img = np.asarray(common.render_jit(
        scene, cam, path.li, common.RenderConfig(spp=4, max_depth=2,
                                                 seed=0)))
    assert np.isfinite(img).all()

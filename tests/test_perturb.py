"""Normal/bump mapping (src/bsdfs/{normalmap,bumpmap}.cpp analogs)."""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_tpu.scene import ir
from mitsuba_tpu.ops import trace


def quad_scene(perturb_kind=0, tex_data=None):
    verts = np.asarray([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                       np.float32)
    faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    normals = np.tile(np.asarray([0, 0, 1], np.float32), (4, 1))
    mat = {"type": ir.BSDF_DIFFUSE, "reflectance": [0.5, 0.5, 0.5]}
    textures = None
    if perturb_kind:
        mat["tex_perturb"] = 0
        mat["perturb_kind"] = perturb_kind
        textures = [{"data": tex_data}]
    return ir.build_scene(verts, faces, np.zeros(2, np.int32), [mat],
                          normals=normals, uvs=uvs, textures=textures)


def shade_normals(scene, n=5):
    o = np.zeros((n, 3), np.float32)
    o[:, 0] = np.linspace(-0.5, 0.5, n)
    o[:, 2] = 2.0
    d = np.tile(np.asarray([0, 0, -1], np.float32), (n, 1))
    its = trace.closest_hit(scene, jnp.asarray(o), jnp.asarray(d))
    si = trace.surface_interaction(scene, jnp.asarray(o), jnp.asarray(d), its)
    assert bool(its.valid.all())
    return np.asarray(si["ns"])


def test_identity_normalmap_is_noop():
    flat = np.full((4, 4, 3), [0.5, 0.5, 1.0], np.float32)
    ns = shade_normals(quad_scene(1, flat))
    assert np.allclose(ns, [0, 0, 1], atol=2e-3)


def test_normalmap_tilts_shading_normal():
    # constant tangent-space normal tilted toward +u
    c = np.zeros((4, 4, 3), np.float32)
    c[..., 0] = 0.5 + 0.25      # nx = +0.5
    c[..., 1] = 0.5
    c[..., 2] = 0.5 + 0.5 * np.sqrt(0.75)
    ns = shade_normals(quad_scene(1, c))
    assert np.allclose(np.linalg.norm(ns, axis=1), 1.0, atol=1e-5)
    # tilt direction = dpdu = +x for this uv layout
    assert (ns[:, 0] > 0.3).all()
    assert (ns[:, 2] > 0.5).all()


def test_constant_bumpmap_is_noop():
    ns = shade_normals(quad_scene(2, np.full((8, 8, 3), 0.7, np.float32)))
    assert np.allclose(ns, [0, 0, 1], atol=1e-4)


def test_bumpmap_ramp_tilts_against_gradient():
    # height increasing with u -> normal leans toward -u
    h = np.linspace(0, 1, 16, dtype=np.float32)
    data = np.repeat(np.tile(h[None, :, None], (16, 1, 1)), 3, axis=2)
    ns = shade_normals(quad_scene(2, data))
    assert (ns[:, 0] < -0.05).all()
    assert np.allclose(np.linalg.norm(ns, axis=1), 1.0, atol=1e-5)


def test_plain_scene_not_gated():
    scene = quad_scene()
    assert scene.has_perturb is False
    ns = shade_normals(scene)
    assert np.allclose(ns, [0, 0, 1], atol=1e-6)


def test_xml_normalmap_adapter(tmp_path):
    from mitsuba_tpu.scene import xml as xmllib
    from mitsuba_tpu.io import image

    nm = np.full((4, 4, 3), [0.5, 0.5, 1.0], np.float32)
    image.write_image(str(tmp_path / "nm.png"), nm)
    s = """<scene version=\"0.6.0\">
      <integrator type=\"direct\"/>
      <sensor type=\"perspective\">
        <sampler type=\"independent\"><integer name=\"sampleCount\" value=\"1\"/></sampler>
        <film type=\"hdrfilm\">
          <integer name=\"width\" value=\"8\"/><integer name=\"height\" value=\"8\"/>
        </film>
      </sensor>
      <bsdf type=\"normalmap\" id=\"m\">
        <texture type=\"bitmap\"><string name=\"filename\" value=\"nm.png\"/></texture>
        <bsdf type=\"diffuse\"/>
      </bsdf>
      <shape type=\"rectangle\"><ref id=\"m\"/></shape>
      <emitter type=\"constant\"><spectrum name=\"radiance\" value=\"1\"/></emitter>
    </scene>"""
    f = tmp_path / "s.xml"
    f.write_text(s)
    scene, cam, cfg, integ = xmllib.load_xml(str(f))
    assert scene.has_perturb is True
    assert int(scene.materials.perturb_kind[0]) == 1
    assert int(scene.materials.tex_perturb[0]) >= 0

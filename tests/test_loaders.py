"""Scene/mesh/image loader tests (SceneHandler + shape-plugin parity,
validated against the reference's own data/tests fixtures where possible)."""
import os
import textwrap

import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.io import image as imagelib, mesh as meshlib
from mitsuba_tpu.scene import xml as xmllib

REF_TESTS = "/root/reference/data/tests"


def test_obj_roundtrip(tmp_path):
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    tris = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    p = tmp_path / "quad.obj"
    meshlib.save_obj(p, verts, tris)
    md = meshlib.load_obj(p)
    assert md.vertices.shape == (4, 3)
    assert md.indices.shape == (2, 3)
    assert np.allclose(md.vertices, verts)


def test_obj_with_uv_normals(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text(textwrap.dedent("""\
        v 0 0 0
        v 1 0 0
        v 0 1 0
        vt 0 0
        vt 1 0
        vt 0 1
        vn 0 0 1
        f 1/1/1 2/2/1 3/3/1
        f -3/-3/-1 -2/-2/-1 -1/-1/-1
    """))
    md = meshlib.load_obj(p)
    assert md.indices.shape == (2, 3)
    assert md.uvs is not None and np.allclose(md.uvs[:3], [[0, 0], [1, 0], [0, 1]])
    assert md.normals is not None and np.allclose(md.normals[0], [0, 0, 1])


@pytest.mark.skipif(not os.path.exists(f"{REF_TESTS}/bunny.ply"),
                    reason="reference fixture unavailable")
def test_ply_bunny():
    md = meshlib.load_ply(f"{REF_TESTS}/bunny.ply")
    assert md.indices.shape[0] > 1000
    assert md.vertices.shape[0] > 500
    assert np.isfinite(md.vertices).all()


@pytest.mark.skipif(not os.path.exists(f"{REF_TESTS}/envmap.exr"),
                    reason="reference fixture unavailable")
def test_read_reference_exr_piz():
    """The reference's envmap.exr is PIZ-compressed — exercises the
    wavelet+Huffman decoder (io/exr_piz.py)."""
    img = imagelib.read_auto(f"{REF_TESTS}/envmap.exr")
    assert img.shape == (256, 512, 3)
    assert np.isfinite(img).all() and 0 <= img.min() and img.max() > 5
    # no 32-scanline block artifacts: boundary row-diffs comparable to
    # interior row-diffs
    d = np.abs(np.diff(img.mean(-1), axis=0)).mean(1)
    boundary = d[31::32].mean()
    interior = np.delete(d, np.s_[31::32], 0).mean()
    assert boundary < interior * 2.0, (boundary, interior)


def test_exr_roundtrip(tmp_path):
    img = np.random.RandomState(0).uniform(0, 4, (17, 23, 3)).astype(np.float32)
    p = tmp_path / "t.exr"
    imagelib.write_exr(p, img)
    back = imagelib.read_exr(p)
    assert np.allclose(back, img)


def test_pfm_png_npy_roundtrip(tmp_path):
    img = np.random.RandomState(1).uniform(0, 1, (9, 11, 3)).astype(np.float32)
    imagelib.write_pfm(tmp_path / "t.pfm", img)
    assert np.allclose(imagelib.read_pfm(tmp_path / "t.pfm"), img)
    imagelib.write_npy(tmp_path / "t.npy", img)
    assert np.allclose(np.load(tmp_path / "t.npy"), img)
    imagelib.write_png(tmp_path / "t.png", img, tonemap=False)
    back = imagelib.read_png(tmp_path / "t.png")
    # png is 8-bit sRGB; compare after the linear roundtrip loosely
    srgb = imagelib.tonemap_srgb(back)  # not inverse; just check range
    assert back.shape == img.shape


def test_rgbe_roundtrip(tmp_path):
    img = np.random.RandomState(2).uniform(0, 10, (8, 8, 3)).astype(np.float32)
    imagelib.write_rgbe(tmp_path / "t.hdr", img)
    back = imagelib.read_rgbe(tmp_path / "t.hdr")
    # shared-exponent 8-bit mantissa: error bound = max_channel / 256
    bound = img.max(-1, keepdims=True) / 256 + 1e-6
    assert np.all(np.abs(back - img) <= bound)


CORNELL_XML = """\
<scene version="0.6.0">
    <integrator type="path">
        <integer name="maxDepth" value="4"/>
    </integrator>
    <sensor type="perspective">
        <float name="fov" value="40"/>
        <transform name="toWorld">
            <lookat origin="0, 1, 4" target="0, 1, 0" up="0, 1, 0"/>
        </transform>
        <sampler type="ldsampler">
            <integer name="sampleCount" value="16"/>
        </sampler>
        <film type="hdrfilm">
            <integer name="width" value="24"/>
            <integer name="height" value="24"/>
        </film>
    </sensor>
    <bsdf type="diffuse" id="white">
        <rgb name="reflectance" value="0.7, 0.7, 0.7"/>
    </bsdf>
    <shape type="rectangle">
        <transform name="toWorld">
            <rotate x="1" angle="-90"/>
            <scale value="2"/>
        </transform>
        <ref id="white"/>
    </shape>
    <shape type="sphere">
        <point name="center" x="0" y="0.5" z="0"/>
        <float name="radius" value="0.5"/>
        <bsdf type="roughconductor">
            <float name="alpha" value="0.2"/>
            <string name="distribution" value="ggx"/>
        </bsdf>
    </shape>
    <shape type="rectangle">
        <transform name="toWorld">
            <rotate x="1" angle="90"/>
            <translate y="3"/>
        </transform>
        <emitter type="area">
            <rgb name="radiance" value="10, 10, 10"/>
        </emitter>
    </shape>
</scene>
"""


def test_xml_load_and_render(tmp_path):
    p = tmp_path / "scene.xml"
    p.write_text(CORNELL_XML)
    scene, cam, cfg, integ = xmllib.load_xml(p)
    assert integ == "path"
    assert cfg.max_depth == 4 and cfg.spp == 16 and cfg.sampler == 3
    assert cam.width == 24 and cam.height == 24
    assert scene.num_triangles > 100  # sphere tessellation
    assert int(np.asarray(scene.emitters.tri_index).shape[0]) == 2

    from mitsuba_tpu.integrators import common, path

    img = np.asarray(common.render_jit(scene, cam, path.li, cfg))
    assert np.isfinite(img).all() and img.mean() > 0.01


def test_xml_defaults_substitution(tmp_path):
    p = tmp_path / "s.xml"
    p.write_text("""\
<scene version="0.6.0">
    <default name="res" value="12"/>
    <integrator type="direct"/>
    <sensor type="perspective">
        <film type="hdrfilm">
            <integer name="width" value="$res"/>
            <integer name="height" value="$res"/>
        </film>
    </sensor>
    <shape type="cube"/>
</scene>
""")
    scene, cam, cfg, integ = xmllib.load_xml(p)
    assert cam.width == 12
    scene2, cam2, _, _ = xmllib.load_xml(p, defaults={"res": 8})
    assert cam2.width == 8


def test_envmap_scene(tmp_path):
    env = np.zeros((8, 16, 3), np.float32)
    env[2, 5] = [50.0, 25.0, 10.0]  # one bright texel
    imagelib.write_exr(tmp_path / "env.exr", env)
    p = tmp_path / "s.xml"
    p.write_text("""\
<scene version="0.6.0">
    <integrator type="path"><integer name="maxDepth" value="3"/></integrator>
    <sensor type="perspective">
        <film type="hdrfilm">
            <integer name="width" value="8"/><integer name="height" value="8"/>
        </film>
    </sensor>
    <shape type="rectangle"/>
    <emitter type="envmap">
        <string name="filename" value="env.exr"/>
    </emitter>
</scene>
""")
    scene, cam, cfg, _ = xmllib.load_xml(p)
    assert scene.envmap is not None and scene.has_env


def test_vol_roundtrip(tmp_path):
    from mitsuba_tpu.io import vol as vollib
    data = np.random.RandomState(3).uniform(0, 2, (4, 5, 6)).astype(np.float32)
    vollib.write_vol(tmp_path / "d.vol", data, (-1, -2, -3), (1, 2, 3))
    back, bmin, bmax = vollib.read_vol(tmp_path / "d.vol")
    assert np.allclose(back, data)
    assert np.allclose(bmin, [-1, -2, -3]) and np.allclose(bmax, [1, 2, 3])


def test_xml_homogeneous_medium(tmp_path):
    from mitsuba_tpu.models import medium as medlib, phase as phaselib
    p = tmp_path / "s.xml"
    p.write_text("""\
<scene version="0.6.0">
    <integrator type="volpath"/>
    <sensor type="perspective">
        <film type="hdrfilm">
            <integer name="width" value="8"/><integer name="height" value="8"/>
        </film>
    </sensor>
    <medium type="homogeneous">
        <rgb name="sigmaS" value="0.5, 0.6, 0.7"/>
        <rgb name="sigmaA" value="0.1, 0.1, 0.1"/>
        <phase type="hg"><float name="g" value="0.3"/></phase>
    </medium>
    <shape type="cube"/>
</scene>
""")
    scene, cam, cfg, integ = xmllib.load_xml(p)
    assert integ == "volpath"
    assert scene.medium is not None
    assert scene.medium.kind == medlib.MEDIUM_HOMOGENEOUS
    assert np.allclose(np.asarray(scene.medium.sigma_t), [0.6, 0.7, 0.8])
    assert float(scene.medium.g) == pytest.approx(0.3)


def test_xml_heterogeneous_medium_interior_ref(tmp_path):
    from mitsuba_tpu.io import vol as vollib
    from mitsuba_tpu.models import medium as medlib
    dens = np.random.RandomState(5).uniform(0, 1, (8, 8, 8)).astype(np.float32)
    vollib.write_vol(tmp_path / "smoke.vol", dens, (0, 0, 0), (1, 1, 1))
    p = tmp_path / "s.xml"
    p.write_text("""\
<scene version="0.6.0">
    <integrator type="volpath"/>
    <sensor type="perspective">
        <film type="hdrfilm">
            <integer name="width" value="8"/><integer name="height" value="8"/>
        </film>
    </sensor>
    <medium type="heterogeneous" id="smoke">
        <volume name="density" type="gridvolume">
            <string name="filename" value="smoke.vol"/>
        </volume>
        <float name="scale" value="4.0"/>
        <rgb name="albedo" value="0.9, 0.9, 0.9"/>
    </medium>
    <shape type="cube">
        <ref name="interior" id="smoke"/>
    </shape>
</scene>
""")
    scene, cam, cfg, integ = xmllib.load_xml(p)
    assert scene.medium is not None
    assert scene.medium.kind == medlib.MEDIUM_GRID
    assert np.allclose(np.asarray(scene.medium.density), dens)
    assert np.allclose(np.asarray(scene.medium.sigma_t), 4.0)


def test_xml_include(tmp_path):
    (tmp_path / "frag.xml").write_text("""\
<scene version="0.6.0">
    <default name="refl" value="0.25, 0.5, 0.75"/>
    <bsdf type="diffuse" id="incmat">
        <rgb name="reflectance" value="$refl"/>
    </bsdf>
    <shape type="rectangle"><ref id="incmat"/></shape>
</scene>
""")
    p = tmp_path / "s.xml"
    p.write_text("""\
<scene version="0.6.0">
    <integrator type="path"/>
    <sensor type="perspective">
        <film type="hdrfilm">
            <integer name="width" value="8"/><integer name="height" value="8"/>
        </film>
    </sensor>
    <include filename="frag.xml"/>
    <shape type="cube"/>
</scene>
""")
    scene, cam, cfg, _ = xmllib.load_xml(p)
    assert scene.num_triangles == 2 + 12  # rectangle from include + cube


def test_xml_mask_opacity(tmp_path):
    from mitsuba_tpu.scene import ir
    p = tmp_path / "s.xml"
    p.write_text("""\
<scene version="0.6.0">
    <integrator type="path"/>
    <sensor type="perspective">
        <film type="hdrfilm">
            <integer name="width" value="8"/><integer name="height" value="8"/>
        </film>
    </sensor>
    <shape type="rectangle">
        <bsdf type="mask">
            <float name="opacity" value="0.3"/>
            <bsdf type="diffuse"/>
        </bsdf>
    </shape>
</scene>
""")
    scene, cam, cfg, _ = xmllib.load_xml(p)
    types = np.asarray(scene.materials.type)
    assert ir.BSDF_BLEND in types and ir.BSDF_NULL in types


def test_xml_rfilter(tmp_path):
    from mitsuba_tpu.film import film as filmlib
    p = tmp_path / "s.xml"
    p.write_text("""\
<scene version="0.6.0">
    <integrator type="path"/>
    <sensor type="perspective">
        <film type="hdrfilm">
            <integer name="width" value="8"/><integer name="height" value="8"/>
            <rfilter type="gaussian"/>
        </film>
    </sensor>
    <shape type="cube"/>
</scene>
""")
    _, _, cfg, _ = xmllib.load_xml(p)
    assert cfg.filter == filmlib.FILTER_GAUSSIAN


def test_xml_unsupported_raises(tmp_path):
    p = tmp_path / "s.xml"
    p.write_text("""\
<scene version="0.6.0">
    <integrator type="path"/>
    <sensor type="perspective"/>
    <shape type="cube"/>
    <subsurfacezzz type="nope"/>
</scene>
""")
    with pytest.raises(ValueError, match="unsupported scene element"):
        xmllib.load_xml(p)


def test_xml_interior_homogeneous_voxelized(tmp_path):
    """A homogeneous interior medium compiles to a density grid over the
    shape volume (scene/voxelize.py) and the boundary defaults to a null
    interface (shape.h interior-medium semantics)."""
    from mitsuba_tpu.models import medium as medlib
    from mitsuba_tpu.scene import ir
    p = tmp_path / "s.xml"
    p.write_text("""\
<scene version="0.6.0">
    <integrator type="volpath"/>
    <sensor type="perspective">
        <film type="hdrfilm">
            <integer name="width" value="8"/><integer name="height" value="8"/>
        </film>
    </sensor>
    <shape type="sphere">
        <float name="radius" value="0.8"/>
        <medium name="interior" type="homogeneous">
            <rgb name="sigmaS" value="2, 2, 2"/>
            <rgb name="sigmaA" value="0.5, 0.5, 0.5"/>
        </medium>
    </shape>
    <shape type="rectangle"/>
</scene>
""")
    scene, cam, cfg, _ = xmllib.load_xml(p)
    med = scene.medium
    assert med is not None and med.kind == medlib.MEDIUM_GRID
    assert np.allclose(np.asarray(med.sigma_t), 2.5)
    # density ~1 inside the sphere, 0 outside the corner
    from mitsuba_tpu.models.medium import density_at
    d_in = float(density_at(med, jnp.asarray([[0.0, 0.0, 0.0]]))[0])
    d_out = float(density_at(med, jnp.asarray([[0.75, 0.75, 0.75]]))[0])
    assert d_in > 0.9 and d_out < 0.1
    # boundary got a null material; shadow transparency flag set
    assert scene.has_null
    assert not bool(np.asarray(scene.tri_opaque)[:-2].all())
    assert bool(np.asarray(scene.tri_opaque)[-2:].all())  # the rectangle


def test_null_boundary_does_not_block_shadows():
    """Null-interface triangles must not occlude NEE shadow rays
    (attenuated shadow-ray semantics, scene.cpp)."""
    from mitsuba_tpu.scene import builtin, ir
    from mitsuba_tpu.ops import trace
    from mitsuba_tpu.scene import shapes as shapelib

    scene, cam = builtin.cornell_box(width=8, height=8)
    # wrap a null cube around the scene center
    v, f, n, uv = shapelib.cube()
    v = v * 0.4 + np.asarray([0, 1.0, 0], np.float32)
    nv = np.asarray(scene.vertices)
    ni = np.asarray(scene.indices)
    verts = np.concatenate([nv, v])
    tris = np.concatenate([ni, f + len(nv)])
    mats = [  # rebuild material records: keep originals via aux? simplest:
        {"type": int(t)} for t in np.asarray(scene.materials.type)
    ]
    null_id = len(mats)
    mats.append({"type": ir.BSDF_NULL})
    tri_mat = np.concatenate([
        np.asarray(scene.tri_material), np.full((len(f),), null_id, np.int32)])
    tri_rad = {}
    te = np.asarray(scene.tri_emitter)
    rad = np.asarray(scene.emitters.radiance)
    for t in np.nonzero(te >= 0)[0]:
        tri_rad[int(t)] = rad[te[t]]
    s2 = ir.build_scene(verts, tris, tri_mat, mats, tri_radiance=tri_rad)
    assert s2.has_null
    # ray from inside the null box toward the ceiling light: not blocked
    o = jnp.asarray([[0.0, 1.0, 0.0]])
    d = jnp.asarray([[0.0, 1.0, 0.0]])
    blocked = trace.any_hit(s2, o, d, jnp.asarray([1.8]))
    assert not bool(blocked[0])
    # but an opaque wall still blocks
    d2 = jnp.asarray([[1.0, 0.0, 0.0]])
    blocked2 = trace.any_hit(s2, o, d2, jnp.asarray([5.0]))
    assert bool(blocked2[0])


def _write_color_ply(path):
    """ascii PLY with red/green/blue uchar vertex colors."""
    path.write_text("""\
ply
format ascii 1.0
element vertex 4
property float x
property float y
property float z
property uchar red
property uchar green
property uchar blue
element face 2
property list uchar int vertex_indices
end_header
-1 0 -1 255 0 0
1 0 -1 0 255 0
1 0 1 0 0 255
-1 0 1 255 255 0
3 0 2 1
3 0 3 2
""")


def test_ply_vertex_colors(tmp_path):
    from mitsuba_tpu.io import mesh as meshlib
    _write_color_ply(tmp_path / "c.ply")
    md = meshlib.load_ply(tmp_path / "c.ply")
    assert md.colors is not None
    assert np.allclose(md.colors[0], [1, 0, 0]) and \
        np.allclose(md.colors[2], [0, 0, 1])


def test_xml_vertexcolors_texture(tmp_path):
    """vertexcolors texture: rendered reflectance follows the PLY colors
    (red corner vs blue corner)."""
    _write_color_ply(tmp_path / "c.ply")
    p = tmp_path / "s.xml"
    p.write_text("""\
<scene version="0.6.0">
    <integrator type="direct"/>
    <sensor type="perspective">
        <transform name="toWorld">
            <lookat origin="0, 3, 0" target="0, 0, 0" up="0, 0, 1"/>
        </transform>
        <sampler type="independent"><integer name="sampleCount" value="32"/></sampler>
        <film type="hdrfilm">
            <integer name="width" value="16"/><integer name="height" value="16"/>
        </film>
    </sensor>
    <shape type="ply">
        <string name="filename" value="c.ply"/>
        <bsdf type="diffuse">
            <texture name="reflectance" type="vertexcolors"/>
        </bsdf>
    </shape>
    <emitter type="constant"><rgb name="radiance" value="2,2,2"/></emitter>
</scene>
""")
    from mitsuba_tpu.integrators import common, direct
    from mitsuba_tpu.scene import ir as irlib
    scene, cam, cfg, _ = xmllib.load_xml(p)
    assert scene.has_vtx_colors
    assert int(np.asarray(scene.materials.tex_reflectance)[0]) == \
        irlib.TEX_VERTEXCOLOR
    img = np.asarray(common.render_jit(scene, cam, direct.li, cfg))
    # the quad fills the view; opposite corners pick up opposite colors
    tl = img[2, 2]; br = img[13, 13]
    assert not np.allclose(tl, br, atol=0.05)
    # corners are dominated by different channels
    assert np.argmax(tl) != np.argmax(br)


def test_xml_wireframe_and_scale_and_grid(tmp_path):
    from mitsuba_tpu.io import image as imagelib
    tex = np.full((4, 4, 3), 0.5, np.float32)
    imagelib.write_exr(tmp_path / "t.exr", tex)
    p = tmp_path / "s.xml"
    p.write_text("""\
<scene version="0.6.0">
    <integrator type="direct"/>
    <sensor type="perspective">
        <film type="hdrfilm">
            <integer name="width" value="8"/><integer name="height" value="8"/>
        </film>
    </sensor>
    <shape type="rectangle">
        <bsdf type="diffuse">
            <texture name="reflectance" type="wireframe">
                <rgb name="interiorColor" value="0.6, 0.6, 0.6"/>
                <rgb name="edgeColor" value="0.0, 0.0, 0.0"/>
            </texture>
        </bsdf>
    </shape>
    <shape type="cube">
        <bsdf type="diffuse">
            <texture name="reflectance" type="scale">
                <float name="scale" value="0.5"/>
                <texture name="nested" type="bitmap">
                    <string name="filename" value="t.exr"/>
                </texture>
            </texture>
        </bsdf>
    </shape>
    <shape type="disk">
        <bsdf type="diffuse">
            <texture name="reflectance" type="gridtexture">
                <rgb name="color0" value="0.8, 0.8, 0.8"/>
                <rgb name="color1" value="0.1, 0.1, 0.1"/>
            </texture>
        </bsdf>
    </shape>
</scene>
""")
    from mitsuba_tpu.scene import ir as irlib
    scene, cam, cfg, _ = xmllib.load_xml(p)
    assert scene.has_wireframe
    texids = np.asarray(scene.materials.tex_reflectance)
    assert irlib.TEX_WIREFRAME in texids
    # scale premultiplied the bitmap to 0.25
    assert np.allclose(np.asarray(scene.textures)[0, :4, :4], 0.25)


def test_xml_curvature_texture(tmp_path):
    p = tmp_path / "s.xml"
    p.write_text("""\
<scene version="0.6.0">
    <integrator type="direct"/>
    <sensor type="perspective">
        <film type="hdrfilm">
            <integer name="width" value="8"/><integer name="height" value="8"/>
        </film>
    </sensor>
    <shape type="sphere">
        <bsdf type="diffuse">
            <texture name="reflectance" type="curvature">
                <string name="curvature" value="gaussian"/>
                <float name="scale" value="1.0"/>
            </texture>
        </bsdf>
    </shape>
</scene>
""")
    scene, cam, cfg, _ = xmllib.load_xml(p)
    assert scene.has_vtx_colors
    vc = np.asarray(scene.vertex_colors)
    assert np.isfinite(vc).all() and vc.shape[1] == 3
    # a sphere has positive curvature everywhere: red channel dominant
    interior = vc[np.abs(vc[:, 0] - 0.5) > 1e-3]
    assert (interior[:, 0] >= interior[:, 2]).mean() > 0.9


def test_mipmap_trilinear_antialiasing(tmp_path):
    """Mip-strip trilinear filtering (mipmap.h analog): a distant view of
    a high-frequency checker texture converges toward the mean with mips
    instead of aliasing; near views still see full detail."""
    from mitsuba_tpu.io import image as imagelib
    from mitsuba_tpu.integrators import common, direct
    # 64x64 checker of 0/1 texels
    t = np.indices((64, 64)).sum(0) % 2
    tex = np.repeat(t[..., None], 3, -1).astype(np.float32)
    imagelib.write_exr(tmp_path / "c.exr", tex)
    p = tmp_path / "s.xml"
    p.write_text("""\
<scene version="0.6.0">
    <integrator type="direct"/>
    <sensor type="perspective">
        <float name="fov" value="2.5"/>
        <transform name="toWorld">
            <lookat origin="0, 0.01, 40" target="0, 0, 0" up="0, 1, 0"/>
        </transform>
        <sampler type="independent"><integer name="sampleCount" value="1"/></sampler>
        <film type="hdrfilm">
            <integer name="width" value="8"/><integer name="height" value="8"/>
        </film>
    </sensor>
    <shape type="rectangle">
        <bsdf type="diffuse">
            <texture name="reflectance" type="bitmap">
                <string name="filename" value="c.exr"/>
                <float name="uscale" value="32"/>
                <float name="vscale" value="32"/>
            </texture>
        </bsdf>
    </shape>
    <emitter type="constant"><rgb name="radiance" value="1,1,1"/></emitter>
</scene>
""")
    scene, cam, cfg, _ = xmllib.load_xml(p)
    assert scene.tex_mips is not None and scene.tri_uv_density is not None
    img = np.asarray(common.render_jit(scene, cam, direct.li, cfg))
    # from 40 units away each pixel covers ~hundreds of checker texels:
    # the trilinear result must be near the 0.5 mean with tiny variance
    vals = img.mean(-1)
    rel_spread = vals.std() / max(vals.mean(), 1e-6)
    assert rel_spread < 0.35, (vals.mean(), vals.std())
    assert 0.3 < vals.mean() < 0.7
    # without mips (strip removed) the same 1-spp render aliases hard:
    # each pixel lands on a random 0-or-1 texel
    scene_nomip = scene.replace(tex_mips=None)
    img2 = np.asarray(common.render_jit(scene_nomip, cam, direct.li, cfg))
    vals2 = img2.mean(-1)
    # variances are additive over the shared lighting-noise floor: the
    # checker contribution must show up only in the no-mip render
    assert vals2.var() > vals.var() + 0.015, (vals2.var(), vals.var())


def test_hair_shape(tmp_path):
    """hair.cpp parity: ASCII + binary fiber files tessellate to tubes
    that render."""
    import struct
    from mitsuba_tpu.io import hair as hairlib
    # ascii: two fibers
    (tmp_path / "h.hair").write_text(
        "0 0 0\n0 1 0\n0 2 0\n#\n1 0 0\n1 1 0.2\n")
    strands = hairlib.read_hair(tmp_path / "h.hair")
    assert len(strands) == 2 and len(strands[0]) == 3
    # binary roundtrip
    buf = b"BINARY_HAIR" + struct.pack("<I", 5)
    buf += struct.pack("<4f", float("inf"), 0, 0, 0)
    buf += struct.pack("<3f", 0, 1, 0)
    buf += struct.pack("<4f", float("inf"), 1, 0, 0)
    buf += struct.pack("<3f", 1, 1, 0)
    buf += struct.pack("<3f", 1, 2, 0)
    (tmp_path / "b.hair").write_bytes(buf)
    sb = hairlib.read_hair(tmp_path / "b.hair")
    assert len(sb) == 2 and len(sb[1]) == 3

    p = tmp_path / "s.xml"
    p.write_text("""\
<scene version="0.6.0">
    <integrator type="direct"/>
    <sensor type="perspective">
        <transform name="toWorld">
            <lookat origin="0, 1, 4" target="0, 1, 0" up="0, 1, 0"/>
        </transform>
        <film type="hdrfilm">
            <integer name="width" value="8"/><integer name="height" value="8"/>
        </film>
    </sensor>
    <shape type="hair">
        <string name="filename" value="h.hair"/>
        <float name="radius" value="0.1"/>
    </shape>
    <emitter type="constant"><rgb name="radiance" value="1,1,1"/></emitter>
</scene>
""")
    scene, cam, cfg, _ = xmllib.load_xml(p)
    # 2 fibers: (3 + 2) rings * 4 sides verts; (2 + 1) segs * 8 tris
    assert scene.num_triangles == (2 + 1) * 8
    from mitsuba_tpu.integrators import common, direct
    img = np.asarray(common.render_jit(scene, cam, direct.li, cfg))
    assert np.isfinite(img).all() and img.mean() > 0.01


def test_ldr_formats_roundtrip(tmp_path):
    """JPEG/PPM/TGA/BMP via Pillow (bitmap.cpp's libjpeg & friends)."""
    from mitsuba_tpu.io import image as imagelib
    # smooth gradient (JPEG is lossy; random noise would not survive)
    yy, xx = np.meshgrid(np.linspace(0, 1, 16), np.linspace(0, 1, 16),
                         indexing="ij")
    img = np.stack([xx, yy, 0.5 * (xx + yy)], -1).astype(np.float32)
    for ext, tol in (("bmp", 0.02), ("ppm", 0.02), ("tga", 0.02),
                     ("jpg", 0.06)):
        p = tmp_path / f"t.{ext}"
        imagelib.write_ldr_pil(p, img)
        back = imagelib.read_auto(str(p))
        assert back.shape == img.shape
        assert np.abs(back - img).mean() < tol, ext


def test_xml_validation_rejects_typos(tmp_path):
    """Schema validation (scene.xsd analog): properties no plugin
    consumed raise with their plugin context."""
    import pytest

    xml = """
<scene version="0.6.0">
    <integrator type="path"/>
    <sensor type="perspective">
        <float name="fov" value="40"/>
        <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
        <film type="hdrfilm">
            <integer name="width" value="4"/><integer name="height" value="4"/>
        </film>
    </sensor>
    <shape type="rectangle">
        <bsdf type="diffuse">
            <rgb name="reflectanse" value="0.5,0.5,0.5"/>
        </bsdf>
    </shape>
</scene>
"""
    p = tmp_path / "bad.xml"
    p.write_text(xml)
    from mitsuba_tpu.scene import xml as xmllib
    with pytest.raises(ValueError, match="reflectanse"):
        xmllib.load_xml(p)


def test_reference_fixtures_load():
    """The reference's own scene fixtures (data/tests/*.xml: legacy
    0.5.0 properties, flipNormals, named IORs, shapeless scenes,
    top-level phase declarations, rotated envmaps) all load."""
    import glob
    import os
    import pytest

    fixtures = sorted(glob.glob("/root/reference/data/tests/*.xml"))
    if not fixtures:
        pytest.skip("reference fixtures unavailable")
    for f in fixtures:
        scene, cam, cfg, integ = xmllib.load_xml(f)
        assert scene.num_triangles >= 1, f


def test_named_ior_and_flip(tmp_path):
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
        <boolean name="flipNormals" value="true"/>
        <bsdf type="dielectric">
            <string name="intIOR" value="diamond"/>
            <string name="extIOR" value="water"/>
        </bsdf>
    </shape>
    <shape type="rectangle">
        <bsdf type="diffuse"/>
    </shape>
</scene>
"""
    p = tmp_path / "s.xml"
    p.write_text(xml)
    scene, cam, cfg, _ = xmllib.load_xml(p)
    import numpy as np
    eta = float(np.asarray(scene.materials.eta)[0, 0])
    assert abs(eta - 2.419 / 1.3330) < 1e-4
    # flipped winding: first shape's triangles reversed vs the second's
    tris = np.asarray(scene.indices)
    assert tris[0, 1] > tris[0, 2]       # reversed
    assert tris[2, 1] < tris[2, 2]       # normal order


def test_xml_mask_textured_opacity(tmp_path):
    """mask.cpp accepts a texture for the opacity (VERDICT r4 item 8):
    the loader wires it into the blend row's texture slot, and the
    renderer applies it per lane. A leaf-card in front of a constant
    environment: where the checker opacity is 0 the card passes light
    through, where it is 1 the (black) diffuse absorbs — the image mean
    must sit near (1 - mean opacity) * env, far from either extreme."""
    from mitsuba_tpu.integrators import common, path
    from mitsuba_tpu.scene import ir
    p = tmp_path / "s.xml"
    p.write_text("""\
<scene version="0.6.0">
    <integrator type="path">
        <integer name="maxDepth" value="3"/>
    </integrator>
    <sensor type="perspective">
        <float name="fov" value="30"/>
        <transform name="toWorld">
            <lookat origin="0, 0, 3" target="0, 0, 0" up="0, 1, 0"/>
        </transform>
        <sampler type="independent">
            <integer name="sampleCount" value="64"/>
        </sampler>
        <film type="hdrfilm">
            <integer name="width" value="16"/>
            <integer name="height" value="16"/>
        </film>
    </sensor>
    <emitter type="constant">
        <rgb name="radiance" value="1.0, 1.0, 1.0"/>
    </emitter>
    <shape type="rectangle">
        <bsdf type="mask">
            <texture name="opacity" type="checkerboard">
                <rgb name="color0" value="0, 0, 0"/>
                <rgb name="color1" value="1, 1, 1"/>
                <float name="uscale" value="4"/>
                <float name="vscale" value="4"/>
            </texture>
            <bsdf type="diffuse">
                <rgb name="reflectance" value="0, 0, 0"/>
            </bsdf>
        </bsdf>
    </shape>
</scene>
""")
    scene, cam, cfg, _ = xmllib.load_xml(p)
    types = np.asarray(scene.materials.type)
    assert ir.BSDF_BLEND in types and ir.BSDF_NULL in types
    blend_row = int(np.nonzero(types == ir.BSDF_BLEND)[0][0])
    assert int(scene.materials.tex_reflectance[blend_row]) >= 0
    img = np.asarray(common.render(scene, cam, path.li, cfg))
    mean = float(img.mean())
    # ~half the card is transparent: mean must be near 0.5 * env and
    # clearly away from the all-opaque (0) and no-mask (1) extremes
    assert 0.3 < mean < 0.7, mean


def test_xml_file_resolver_search_paths(tmp_path):
    """FileResolver search paths (fresolver.h / mitsuba -a parity): a
    texture referenced by bare name resolves through a user-prepended
    search directory."""
    import numpy as np
    from mitsuba_tpu.io import image
    d_tex = tmp_path / "textures"
    d_tex.mkdir()
    image.write_png(str(d_tex / "tex.png"),
                    np.full((4, 4, 3), 0.5, np.float32))
    p = tmp_path / "s.xml"
    p.write_text("""\
<scene version="0.6.0">
    <integrator type="path"/>
    <sensor type="perspective">
        <film type="hdrfilm">
            <integer name="width" value="8"/><integer name="height" value="8"/>
        </film>
    </sensor>
    <shape type="rectangle">
        <bsdf type="diffuse">
            <texture name="reflectance" type="bitmap">
                <string name="filename" value="tex.png"/>
            </texture>
        </bsdf>
    </shape>
</scene>
""")
    with pytest.raises(Exception):
        xmllib.load_xml(p)
    scene, _, _, _ = xmllib.load_xml(p, search_paths=[str(d_tex)])
    assert scene.textures.shape[0] >= 1


def test_xml_legacy_scene_upgrade(tmp_path):
    """Scene-version auto-upgrade (data/schema/upgrade_*.xsl parity,
    VERDICT r3 missing #8): a 0.3.0 scene with <camera>, <luminaire
    intensity>, and a lambertian BSDF loads after the in-place upgrade
    chain; a pre-0.3 old-style lookAt also resolves."""
    from mitsuba_tpu.scene import ir
    p = tmp_path / "old.xml"
    p.write_text("""\
<scene version="0.3.0">
    <integrator type="direct">
        <integer name="luminaireSamples" value="2"/>
    </integrator>
    <camera type="perspective">
        <float name="fov" value="40"/>
        <boolean name="mapSmallerSide" value="false"/>
        <transform name="toWorld">
            <lookat origin="0, 1, 4" target="0, 1, 0" up="0, 1, 0"/>
        </transform>
        <film type="exrfilm">
            <integer name="width" value="8"/>
            <integer name="height" value="8"/>
            <boolean name="alpha" value="false"/>
        </film>
    </camera>
    <shape type="rectangle">
        <bsdf type="diffuse">
            <rgb name="reflectance" value="0.5, 0.5, 0.5"/>
        </bsdf>
    </shape>
    <shape type="rectangle">
        <transform name="toWorld"><translate y="3"/></transform>
        <luminaire type="area">
            <rgb name="intensity" value="5, 5, 5"/>
        </luminaire>
    </shape>
</scene>
""")
    scene, cam, cfg, integ = xmllib.load_xml(p)
    assert ir.BSDF_DIFFUSE in np.asarray(scene.materials.type)
    assert (np.asarray(scene.tri_emitter) >= 0).any()
    assert cam.width == 8


def test_xml_pre03_scene_upgrade(tmp_path):
    from mitsuba_tpu.scene import ir
    p = tmp_path / "ancient.xml"
    p.write_text("""\
<scene version="0.2.1">
    <integrator type="path"/>
    <camera type="perspective">
        <transform name="toWorld">
            <lookAt ox="0" oy="1" oz="4" tx="0" ty="1" tz="0"
                    ux="0" uy="1" uz="0"/>
        </transform>
        <film type="exrfilm">
            <integer name="width" value="8"/>
            <integer name="height" value="8"/>
        </film>
    </camera>
    <shape type="rectangle">
        <bsdf type="mirror"/>
    </shape>
    <shape type="sphere"/>
</scene>
""")
    scene, cam, cfg, _ = xmllib.load_xml(p)
    types = np.asarray(scene.materials.type)
    assert ir.BSDF_CONDUCTOR in types     # mirror -> conductor(Cr)
    assert ir.BSDF_DIFFUSE in types       # bare sphere got a diffuse


def test_upgrade_point_luminaire_keeps_intensity():
    """upgrade_0.4.0.xsl:49 renames 'intensity' only for area/constant/
    directional; point and spot luminaires keep it (ADVICE r4 medium)."""
    import xml.etree.ElementTree as ET
    from mitsuba_tpu.scene.upgrade import upgrade_to_current
    root = ET.fromstring("""\
<scene version="0.3.0">
    <luminaire type="point">
        <rgb name="intensity" value="7, 7, 7"/>
    </luminaire>
    <luminaire type="area">
        <rgb name="intensity" value="5, 5, 5"/>
    </luminaire>
    <luminaire type="directional">
        <rgb name="intensity" value="3, 3, 3"/>
    </luminaire>
</scene>""")
    assert upgrade_to_current(root)
    names = [(e.attrib["type"], c.attrib["name"])
             for e in root.iter("emitter") for c in e]
    assert ("point", "intensity") in names
    assert ("area", "radiance") in names
    assert ("directional", "irradiance") in names


def test_upgrade_two_lookats_insert_offsets():
    """Two old-style lookAts in one transform each get their scale flip
    inserted immediately BEFORE them (ADVICE r4 low: live-children shift)."""
    import xml.etree.ElementTree as ET
    from mitsuba_tpu.scene.upgrade import upgrade_to_current
    root = ET.fromstring("""\
<scene version="0.2.1">
    <transform name="toWorld">
        <lookAt ox="0" oy="0" oz="1" tx="0" ty="0" tz="0"/>
        <translate x="2"/>
        <lookAt ox="0" oy="0" oz="2" tx="0" ty="0" tz="0"/>
    </transform>
</scene>""")
    assert upgrade_to_current(root)
    tags = [c.tag for c in root.find("transform")]
    assert tags == ["scale", "lookAt", "translate", "scale", "lookAt"]

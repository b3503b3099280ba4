"""COLLADA importer (converter/collada.cpp + mtsimport.cpp analog):
geometry parsing, up-axis conditioning, node transforms, de-indexing,
and the mtsimport .dae -> XML + .serialized round trip."""
import numpy as np
import pytest

from mitsuba_tpu.io import collada

DAE = """<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
  <asset><up_axis>{UP}</up_axis></asset>
  <library_geometries>
    <geometry id="quad" name="Quad">
      <mesh>
        <source id="quad-pos">
          <float_array id="quad-pos-arr" count="12">
            0 0 0  1 0 0  1 1 0  0 1 0</float_array>
          <technique_common>
            <accessor source="#quad-pos-arr" count="4" stride="3"/>
          </technique_common>
        </source>
        <source id="quad-nrm">
          <float_array id="quad-nrm-arr" count="3">0 0 1</float_array>
          <technique_common>
            <accessor source="#quad-nrm-arr" count="1" stride="3"/>
          </technique_common>
        </source>
        <source id="quad-uv">
          <float_array id="quad-uv-arr" count="8">
            0 0  1 0  1 1  0 1</float_array>
          <technique_common>
            <accessor source="#quad-uv-arr" count="4" stride="2"/>
          </technique_common>
        </source>
        <vertices id="quad-verts">
          <input semantic="POSITION" source="#quad-pos"/>
        </vertices>
        <polylist count="1">
          <input semantic="VERTEX" source="#quad-verts" offset="0"/>
          <input semantic="NORMAL" source="#quad-nrm" offset="1"/>
          <input semantic="TEXCOORD" source="#quad-uv" offset="2"/>
          <vcount>4</vcount>
          <p>0 0 0  1 0 1  2 0 2  3 0 3</p>
        </polylist>
      </mesh>
    </geometry>
  </library_geometries>
  <library_visual_scenes>
    <visual_scene id="scene">
      <node id="n1">
        <translate>2 0 0</translate>
        <scale>2 2 2</scale>
        <instance_geometry url="#quad"/>
      </node>
    </visual_scene>
  </library_visual_scenes>
</COLLADA>
"""


def test_dae_geometry_and_transform(tmp_path):
    p = tmp_path / "quad.dae"
    p.write_text(DAE.replace("{UP}", "Y_UP"))
    meshes = collada.load_dae(p)
    assert len(meshes) == 1
    md = meshes[0]
    # quad fan-triangulated into 2 triangles over 4 unique corners
    assert md.indices.shape == (2, 3)
    assert md.vertices.shape == (4, 3)
    # node transform: scale 2 then translate +2x (document order)
    lo = md.vertices.min(0)
    hi = md.vertices.max(0)
    assert np.allclose(lo, [2, 0, 0], atol=1e-6)
    assert np.allclose(hi, [4, 2, 0], atol=1e-6)
    assert np.allclose(md.normals, [[0, 0, 1]] * 4, atol=1e-6)
    assert md.uvs.shape == (4, 2)
    # triangle area preserved under the transform: 2 * (0.5 * 2 * 2)
    e1 = md.vertices[md.indices[:, 1]] - md.vertices[md.indices[:, 0]]
    e2 = md.vertices[md.indices[:, 2]] - md.vertices[md.indices[:, 0]]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1).sum()
    assert area == pytest.approx(4.0, abs=1e-5)


def test_dae_z_up_conditioning(tmp_path):
    """Z_UP content rotates into the renderer's Y_UP frame
    (collada.cpp's conditioning): the quad's +z normal becomes +y."""
    p = tmp_path / "quad_z.dae"
    p.write_text(DAE.replace("{UP}", "Z_UP"))
    md = collada.load_dae(p)[0]
    assert np.allclose(md.normals, [[0, 1, 0]] * 4, atol=1e-6)
    assert np.allclose(md.vertices[:, 1], 0.0, atol=1e-6)  # plane now y=0


def test_mtsimport_roundtrip(tmp_path):
    """mtsimport writes XML + .serialized that load back and render."""
    from mitsuba_tpu import mtsutil
    from mitsuba_tpu.scene import xml as xmllib

    p = tmp_path / "quad.dae"
    p.write_text(DAE.replace("{UP}", "Y_UP"))
    out = tmp_path / "scene.xml"
    mtsutil.main(["mtsimport", str(p), str(out)])
    assert out.exists() and (tmp_path / "scene.serialized").exists()
    scene, cam, cfg, integ = xmllib.load_xml(out)
    assert scene.num_triangles == 2
    assert integ == "path"

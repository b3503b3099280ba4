"""Mitsuba .serialized mesh format (src/shapes/serialized.cpp parity)."""
import struct
import zlib

import numpy as np
import pytest

from mitsuba_tpu.io import serialized as ser
from mitsuba_tpu.io.mesh import MeshData

V = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
F = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
N = np.tile(np.asarray([0, 0, 1], np.float32), (4, 1))
UV = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)


def test_roundtrip_full(tmp_path):
    p = tmp_path / "m.serialized"
    md = MeshData(V, F, normals=N, uvs=UV)
    md.name = "quad"
    ser.write_serialized(p, md)
    r = ser.read_serialized(p, 0)
    assert np.allclose(r.vertices, V) and np.array_equal(r.indices, F)
    assert np.allclose(r.normals, N) and np.allclose(r.uvs, UV)
    assert r.name == "quad"


def test_roundtrip_positions_only(tmp_path):
    p = tmp_path / "m.serialized"
    ser.write_serialized(p, MeshData(V, F))
    r = ser.read_serialized(p, 0)
    assert r.normals is None and r.uvs is None
    assert np.allclose(r.vertices, V)


def test_multimesh_and_index(tmp_path):
    p = tmp_path / "m.serialized"
    m2 = MeshData(V + 5.0, F)
    ser.write_serialized(p, [MeshData(V, F, normals=N), m2])
    all_meshes = ser.read_serialized(p)
    assert len(all_meshes) == 2
    assert np.allclose(ser.read_serialized(p, 1).vertices, V + 5.0)
    with pytest.raises(ValueError):
        ser.read_serialized(p, 2)


def test_reads_v3_double_precision(tmp_path):
    # hand-built version-3 stream: no name field, float64, uint32 table
    body = struct.pack("<I", ser.FLAG_DOUBLE | ser.FLAG_NORMALS)
    body += struct.pack("<QQ", 4, 2)
    body += V.astype(np.float64).tobytes() + N.astype(np.float64).tobytes()
    body += F.astype(np.uint32).tobytes()
    stream = struct.pack("<HH", ser.MAGIC, 3) + zlib.compress(body)
    data = stream + struct.pack("<I", 0) + struct.pack("<I", 1)
    p = tmp_path / "v3.serialized"
    p.write_bytes(data)
    r = ser.read_serialized(p, 0)
    assert np.allclose(r.vertices, V) and np.allclose(r.normals, N)


def test_missing_dictionary_assumes_single_mesh(tmp_path):
    # stream with no trailing dictionary at all (serialized.cpp fallback)
    body = struct.pack("<I", ser.FLAG_SINGLE) + b"x\x00"
    body += struct.pack("<QQ", 4, 2) + V.tobytes() + F.astype(np.uint32).tobytes()
    p = tmp_path / "nodict.serialized"
    p.write_bytes(struct.pack("<HH", ser.MAGIC, 4) + zlib.compress(body))
    r = ser.read_serialized(p)
    assert len(r) == 1 and np.allclose(r[0].vertices, V)


def test_xml_serialized_shape(tmp_path):
    from mitsuba_tpu.scene import xml as xmllib

    md = MeshData(V, F, normals=N, uvs=UV)
    ser.write_serialized(tmp_path / "quad.serialized", [MeshData(V - 9, F), md])
    s = """<scene version="0.6.0">
      <integrator type="direct"/>
      <sensor type="perspective">
        <sampler type="independent"><integer name="sampleCount" value="1"/></sampler>
        <film type="hdrfilm">
          <integer name="width" value="4"/><integer name="height" value="4"/>
        </film>
      </sensor>
      <shape type="serialized">
        <string name="filename" value="quad.serialized"/>
        <integer name="shapeIndex" value="1"/>
        <bsdf type="diffuse"/>
      </shape>
      <emitter type="constant"><spectrum name="radiance" value="1"/></emitter>
    </scene>"""
    (tmp_path / "s.xml").write_text(s)
    scene, cam, cfg, _ = xmllib.load_xml(str(tmp_path / "s.xml"))
    assert scene.num_triangles == 2
    # shapeIndex=1 picked the un-shifted quad
    assert float(np.asarray(scene.vertices).min()) >= 0.0

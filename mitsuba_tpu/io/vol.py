"""Mitsuba .vol gridvolume binary format (read/write).

Format per src/volume/gridvolume.cpp (fileToVolume header parse):
  bytes 0-2  'VOL'
  byte  3    version (3)
  int32      encoding: 1 = float32 (the only one supported here; the
             reference also has float16=2, uint8=3, quantized dirs=4)
  int32 x 3  resolution (xres, yres, zres)
  int32      channels (1 or 3)
  float32x6  bounding box (xmin ymin zmin xmax ymax zmax)
  data       xres*yres*zres*channels float32, x fastest ("zyx" C-order
             with shape (zres, yres, xres, channels))
"""
from __future__ import annotations

import struct

import numpy as np


def read_vol(path):
    """Returns (data (Z,Y,X) or (Z,Y,X,3) float32, box_min (3,), box_max (3,))."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:3] != b"VOL":
        raise ValueError(f"{path}: not a Mitsuba VOL file")
    version = raw[3]
    if version != 3:
        raise ValueError(f"{path}: unsupported VOL version {version}")
    enc, xres, yres, zres, ch = struct.unpack_from("<5i", raw, 4)
    if enc != 1:
        raise ValueError(f"{path}: only float32 encoding supported, got {enc}")
    if ch not in (1, 3):
        raise ValueError(f"{path}: unsupported channel count {ch}")
    box = struct.unpack_from("<6f", raw, 24)
    n = xres * yres * zres * ch
    data = np.frombuffer(raw, np.float32, count=n, offset=48)
    data = data.reshape(zres, yres, xres, ch)
    if ch == 1:
        data = data[..., 0]
    return (np.ascontiguousarray(data),
            np.asarray(box[:3], np.float32), np.asarray(box[3:], np.float32))


def write_vol(path, data, box_min=(0, 0, 0), box_max=(1, 1, 1)):
    """data: (Z,Y,X) or (Z,Y,X,3) float32."""
    data = np.asarray(data, np.float32)
    if data.ndim == 3:
        ch = 1
        zres, yres, xres = data.shape
    elif data.ndim == 4 and data.shape[-1] == 3:
        ch = 3
        zres, yres, xres = data.shape[:3]
    else:
        raise ValueError(f"bad gridvolume shape {data.shape}")
    with open(path, "wb") as f:
        f.write(b"VOL" + bytes([3]))
        f.write(struct.pack("<5i", 1, xres, yres, zres, ch))
        f.write(struct.pack("<6f", *np.asarray(box_min, np.float32),
                            *np.asarray(box_max, np.float32)))
        f.write(data.tobytes())

"""Image I/O: EXR / PFM / PNG / NPY read+write.

TPU-native framework's analog of the reference Bitmap I/O layer
(include/mitsuba/core/bitmap.h:170-261 — PNG/EXR/RGBE/PFM/PPM/...; the
fork's numpy .npy output in src/films/mfilm.cpp:25,347 via embedded cnpy).
No OpenEXR bindings in this environment, so EXR is implemented directly:
uncompressed scanline float32/half — enough for lossless interchange with
the reference's hdrfilm output.
"""
from __future__ import annotations

import struct
import zlib
from pathlib import Path

import numpy as np

# ---------------------------------------------------------------------------
# EXR (minimal: single-part scanline, ZIP or NONE compression, RGB float)
# ---------------------------------------------------------------------------

_EXR_MAGIC = 20000630
_PIXELTYPE_HALF = 1
_PIXELTYPE_FLOAT = 2


def _exr_attr(name: bytes, typ: bytes, data: bytes) -> bytes:
    return name + b"\x00" + typ + b"\x00" + struct.pack("<i", len(data)) + data


def write_exr(path, img: np.ndarray, half: bool = False) -> None:
    """Write (H,W,3) float array as scanline EXR (no compression)."""
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, -1)
    ptype = _PIXELTYPE_HALF if half else _PIXELTYPE_FLOAT
    psize = 2 if half else 4

    chans = b""
    for c in (b"B", b"G", b"R"):  # alphabetical order required
        chans += c + b"\x00" + struct.pack("<iiii", ptype, 0, 1, 1)
    chans += b"\x00"

    header = b""
    header += _exr_attr(b"channels", b"chlist", chans)
    header += _exr_attr(b"compression", b"compression", b"\x00")  # NONE
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header += _exr_attr(b"dataWindow", b"box2i", box)
    header += _exr_attr(b"displayWindow", b"box2i", box)
    header += _exr_attr(b"lineOrder", b"lineOrder", b"\x00")
    header += _exr_attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
    header += _exr_attr(b"screenWindowCenter", b"v2f", struct.pack("<ff", 0, 0))
    header += _exr_attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
    header += b"\x00"

    preamble = struct.pack("<ii", _EXR_MAGIC, 2) + header
    table_off = len(preamble) + 8 * h
    line_bytes = 8 + w * psize * 3
    offsets = struct.pack("<" + "Q" * h, *[table_off + i * line_bytes for i in range(h)])

    dt = np.float16 if half else np.float32
    body = bytearray()
    for y in range(h):
        row = img[y]
        data = np.concatenate(
            [row[:, 2].astype(dt), row[:, 1].astype(dt), row[:, 0].astype(dt)]
        ).tobytes()
        body += struct.pack("<ii", y, len(data)) + data

    Path(path).write_bytes(preamble + offsets + bytes(body))


def read_exr(path) -> np.ndarray:
    """Read single-part scanline EXR (NONE or ZIP compression, R/G/B[/A])."""
    buf = Path(path).read_bytes()
    magic, version = struct.unpack_from("<ii", buf, 0)
    assert magic == _EXR_MAGIC, "not an EXR file"
    pos = 8
    attrs = {}
    while buf[pos] != 0:
        e = buf.index(b"\x00", pos)
        name = buf[pos:e].decode()
        pos = e + 1
        e = buf.index(b"\x00", pos)
        typ = buf[pos:e].decode()
        pos = e + 1
        (size,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        attrs[name] = (typ, buf[pos : pos + size])
        pos += size
    pos += 1
    x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"][1])
    w, h = x1 - x0 + 1, y1 - y0 + 1
    comp = attrs["compression"][1][0]
    # parse channel list
    chan_raw = attrs["channels"][1]
    cpos = 0
    channels = []
    while chan_raw[cpos] != 0:
        e = chan_raw.index(b"\x00", cpos)
        cname = chan_raw[cpos:e].decode()
        cpos = e + 1
        ptype = struct.unpack_from("<i", chan_raw, cpos)[0]
        cpos += 16
        channels.append((cname, ptype))
    channels.sort()  # file stores alphabetically
    nch = len(channels)
    dts = [np.float16 if p == _PIXELTYPE_HALF else np.float32 for _, p in channels]

    lines_per_block = {0: 1, 2: 1, 3: 16, 4: 32}.get(comp, 1)
    nblocks = (h + lines_per_block - 1) // lines_per_block
    offsets = struct.unpack_from("<" + "Q" * nblocks, buf, pos)
    out = {c: np.zeros((h, w), np.float32) for c, _ in channels}
    for off in offsets:
        y, size = struct.unpack_from("<ii", buf, off)
        data = buf[off + 8 : off + 8 + size]
        rows = min(lines_per_block, h - (y - y0))
        raw_size = sum(w * rows * (2 if p == _PIXELTYPE_HALF else 4) for _, p in channels)
        if comp in (2, 3):  # ZIPS/ZIP
            data = zlib.decompress(data)
            # EXR zip predictor: delta-decode then de-interleave
            arr = np.frombuffer(data, np.uint8).astype(np.int16)
            arr = np.cumsum(np.concatenate([arr[:1], (arr[1:] - 128)]) , dtype=np.int64).astype(np.uint8) if False else _exr_unpredict(np.frombuffer(data, np.uint8))
            data = arr.tobytes()
        assert len(data) == raw_size, "unsupported EXR layout"
        dpos = 0
        for ri in range(rows):
            for (cname, ptype), dt in zip(channels, dts):
                nbytes = w * (2 if ptype == _PIXELTYPE_HALF else 4)
                row = np.frombuffer(data[dpos : dpos + nbytes], dt)
                out[cname][y - y0 + ri] = row.astype(np.float32)
                dpos += nbytes
    if all(c in out for c in "RGB"):
        return np.stack([out["R"], out["G"], out["B"]], -1)
    first = next(iter(out))
    return out[first]


def _exr_unpredict(data: np.ndarray) -> np.ndarray:
    """Invert OpenEXR's zip predictor + interleave split."""
    # delta decode: out[i] = out[i-1] + in[i] - 128 (mod 256), vectorized via
    # cumulative sum of the (in - 128) deltas.
    deltas = data.astype(np.int64)
    deltas = np.concatenate([deltas[:1], deltas[1:] - 128])
    out = (np.cumsum(deltas) & 0xFF).astype(np.uint8)
    # de-interleave: first half = even bytes, second half = odd bytes
    n = len(out)
    half = (n + 1) // 2
    result = np.zeros(n, np.uint8)
    result[0::2] = out[:half]
    result[1::2] = out[half:half + n // 2]
    return result


# ---------------------------------------------------------------------------
# PFM (bitmap.h EPFM)
# ---------------------------------------------------------------------------

def write_pfm(path, img: np.ndarray) -> None:
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    color = img.ndim == 3 and img.shape[2] == 3
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")  # little-endian
        f.write(np.flipud(img).tobytes())


def read_pfm(path) -> np.ndarray:
    with open(path, "rb") as f:
        kind = f.readline().strip()
        w, h = map(int, f.readline().split())
        scale = float(f.readline())
        data = np.frombuffer(f.read(), "<f4" if scale < 0 else ">f4")
    ch = 3 if kind == b"PF" else 1
    img = data.reshape(h, w, ch) if ch == 3 else data.reshape(h, w)
    return np.flipud(img).copy()


# ---------------------------------------------------------------------------
# PNG (tonemapped LDR, like ldrfilm.cpp) and NPY (mfilm.cpp)
# ---------------------------------------------------------------------------

def tonemap_srgb(img: np.ndarray) -> np.ndarray:
    """Linear -> sRGB (the reference ldrfilm gamma path)."""
    img = np.clip(np.asarray(img, np.float32), 0.0, 1.0)
    return np.where(
        img <= 0.0031308, img * 12.92, 1.055 * np.power(img, 1 / 2.4) - 0.055
    )


def write_png(path, img: np.ndarray, tonemap: bool = True) -> None:
    arr = tonemap_srgb(img) if tonemap else np.clip(img, 0, 1)
    data = (arr * 255.0 + 0.5).astype(np.uint8)
    if data.ndim == 2:
        data = np.repeat(data[..., None], 3, -1)
    h, w = data.shape[:2]
    raw = b"".join(b"\x00" + data[y].tobytes() for y in range(h))

    def chunk(tag: bytes, payload: bytes) -> bytes:
        c = tag + payload
        return struct.pack(">I", len(payload)) + c + struct.pack(">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    Path(path).write_bytes(png)


def write_npy(path, img: np.ndarray) -> None:
    np.save(path, np.asarray(img, np.float32))


def write_image(path, img) -> None:
    """Dispatch on extension (Bitmap::write analog)."""
    img = np.asarray(img)
    p = str(path)
    if p.endswith(".exr"):
        write_exr(p, img)
    elif p.endswith(".pfm"):
        write_pfm(p, img)
    elif p.endswith(".png"):
        write_png(p, img)
    elif p.endswith(".npy"):
        write_npy(p, img)
    else:
        raise ValueError(f"unsupported image format: {p}")

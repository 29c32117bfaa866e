"""Minimal OpenEXR scanline codec (pure Python + zlib).

The reference loads/saves .exr through tinyexr (yocto_sceneio.cpp:411-560
dispatches on extension; "exr" goes to tinyexr's LoadEXR/SaveEXR). This is
a from-scratch reader/writer for the subset those calls produce/consume:

  - single-part scanline images, INCREASING_Y line order
  - compression: NONE (0), ZIPS (2, 1 line/block), ZIP (3, 16 lines/block)
  - channel types HALF and FLOAT; channels R,G,B and optional A
    (extra channels are decoded but only RGBA is returned)

Returns/accepts float32 RGBA arrays in linear radiance, matching the
framework-wide image convention (image_io.load_image).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = 0x01312F76

PXTYPE_UINT = 0
PXTYPE_HALF = 1
PXTYPE_FLOAT = 2

_PXSIZE = {PXTYPE_UINT: 4, PXTYPE_HALF: 2, PXTYPE_FLOAT: 4}
_PXDTYPE = {PXTYPE_UINT: np.uint32, PXTYPE_HALF: np.float16,
            PXTYPE_FLOAT: np.float32}

COMP_NONE = 0
COMP_RLE = 1
COMP_ZIPS = 2
COMP_ZIP = 3

_BLOCK_LINES = {COMP_NONE: 1, COMP_ZIPS: 1, COMP_ZIP: 16}


def _read_cstr(buf: bytes, off: int):
    end = buf.index(b"\x00", off)
    return buf[off:end].decode("latin-1"), end + 1


# ---------------------------------------------------------------------------
# EXR's zip pre/post-processing: byte delta predictor + two-half interleave
# ---------------------------------------------------------------------------

def _zip_postprocess(data: bytes) -> np.ndarray:
    """Undo predictor+reorder after inflate (decode side)."""
    t = np.frombuffer(data, np.uint8).astype(np.int32)
    # undo delta predictor: t[i] = t[i-1] + t[i] - 128
    t = (np.cumsum(t - 128) + 128 * 1) % 256
    # first element offset: cumsum adds an extra -128+... handle directly:
    # d[0]=s[0]; d[i]=s[i]-s[i-1]+128  =>  s = cumsum(d - 128) + 128? No:
    # s[i] = s[i-1] + d[i] - 128 with s[0] = d[0]. cumsum(d-128) gives
    # s[i] - 128*(1) for i=0 off by -128; fix by adding 128 then correcting
    # the first term (d[0]-128+128 = d[0]). That is exactly what we did.
    t = t.astype(np.uint8)
    # undo interleave split: out[0::2] = first half, out[1::2] = second half
    n = t.size
    half = (n + 1) // 2
    out = np.empty(n, np.uint8)
    out[0::2] = t[:half]
    out[1::2] = t[half:]
    return out


def _zip_preprocess(data: np.ndarray) -> bytes:
    """Apply reorder+predictor before deflate (encode side)."""
    src = np.asarray(data, np.uint8).ravel()
    n = src.size
    half = (n + 1) // 2
    t = np.empty(n, np.uint8)
    t[:half] = src[0::2]
    t[half:] = src[1::2]
    d = t.astype(np.int32)
    d[1:] = d[1:] - d[:-1] + 128
    return (d % 256).astype(np.uint8).tobytes()


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------

def decode_exr(buf: bytes):
    """Decode an EXR byte buffer -> (float32 HxWx4 RGBA, channel_names)."""
    magic, version = struct.unpack_from("<iI", buf, 0)
    if magic != MAGIC:
        raise ValueError("not an EXR file")
    if version & 0x200:  # multi-part / deep bit set
        raise ValueError("multi-part/deep EXR not supported")
    off = 8

    channels = []  # (name, pxtype)
    compression = COMP_NONE
    data_window = None
    line_order = 0
    while True:
        if buf[off] == 0:
            off += 1
            break
        name, off = _read_cstr(buf, off)
        typ, off = _read_cstr(buf, off)
        size = struct.unpack_from("<i", buf, off)[0]
        off += 4
        val = buf[off:off + size]
        off += size
        if name == "channels":
            coff = 0
            while val[coff] != 0:
                cname, coff = _read_cstr(val, coff)
                ptype = struct.unpack_from("<i", val, coff)[0]
                coff += 16  # type + pLinear + 3 reserved + xSampling + ySampling
                channels.append((cname, ptype))
        elif name == "compression":
            compression = val[0]
        elif name == "dataWindow":
            data_window = struct.unpack("<4i", val)
        elif name == "lineOrder":
            line_order = val[0]

    if data_window is None:
        raise ValueError("EXR missing dataWindow")
    if compression not in _BLOCK_LINES:
        raise ValueError(f"unsupported EXR compression {compression}")
    xmin, ymin, xmax, ymax = data_window
    width = xmax - xmin + 1
    height = ymax - ymin + 1
    block = _BLOCK_LINES[compression]
    nchunks = (height + block - 1) // block

    offsets = struct.unpack_from(f"<{nchunks}Q", buf, off)
    # channels appear in the file sorted by name; decode in that order
    chans = sorted(channels, key=lambda c: c[0])
    line_bytes = sum(width * _PXSIZE[t] for _, t in chans)

    planes = {name: np.zeros((height, width), np.float32)
              for name, _ in chans}
    for ci in range(nchunks):
        co = offsets[ci]
        y, dsize = struct.unpack_from("<ii", buf, co)
        raw = buf[co + 8:co + 8 + dsize]
        nlines = min(block, ymax + 1 - y)
        if compression in (COMP_ZIPS, COMP_ZIP):
            if dsize < nlines * line_bytes:  # compressed only if smaller
                raw = _zip_postprocess(zlib.decompress(raw)).tobytes()
        arr = np.frombuffer(raw, np.uint8)
        row0 = y - ymin
        for li in range(nlines):
            base = li * line_bytes
            for cname, ptype in chans:
                nb = width * _PXSIZE[ptype]
                seg = arr[base:base + nb]
                vals = np.frombuffer(seg.tobytes(), _PXDTYPE[ptype])
                if ptype == PXTYPE_UINT:
                    vals = vals.astype(np.float32)
                row = row0 + li
                if line_order == 1:  # DECREASING_Y
                    row = height - 1 - row
                planes[cname][row] = vals.astype(np.float32)
                base += nb

    out = np.zeros((height, width, 4), np.float32)
    out[..., 3] = 1.0
    names = [c for c, _ in chans]
    for i, key in enumerate("RGBA"):
        if key in planes:
            out[..., i] = planes[key]
    if "Y" in planes and "R" not in planes:  # luminance-only image
        out[..., 0] = out[..., 1] = out[..., 2] = planes["Y"]
    return out, names


def load_exr(path: str):
    with open(path, "rb") as f:
        img, _ = decode_exr(f.read())
    return img


# ---------------------------------------------------------------------------
# Writer (scanline, ZIP 16-line blocks, HALF channels by default)
# ---------------------------------------------------------------------------

def _attr(name: str, typ: str, payload: bytes) -> bytes:
    return (name.encode() + b"\x00" + typ.encode() + b"\x00"
            + struct.pack("<i", len(payload)) + payload)


def encode_exr(img: np.ndarray, *, half: bool = True,
               compression: int = COMP_ZIP) -> bytes:
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    names = ["R", "G", "B", "A"][:c] if c <= 4 else None
    if names is None:
        raise ValueError("encode_exr supports up to 4 channels")
    ptype = PXTYPE_HALF if half else PXTYPE_FLOAT
    dtype = np.float16 if half else np.float32
    psize = _PXSIZE[ptype]

    chans = sorted(range(c), key=lambda i: names[i])
    chlist = b""
    for i in chans:
        chlist += (names[i].encode() + b"\x00"
                   + struct.pack("<iBBBBii", ptype, 0, 0, 0, 0, 1, 1))
    chlist += b"\x00"

    box = struct.pack("<4i", 0, 0, w - 1, h - 1)
    header = (
        _attr("channels", "chlist", chlist)
        + _attr("compression", "compression", bytes([compression]))
        + _attr("dataWindow", "box2i", box)
        + _attr("displayWindow", "box2i", box)
        + _attr("lineOrder", "lineOrder", b"\x00")
        + _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
        + _attr("screenWindowCenter", "v2f", struct.pack("<2f", 0.0, 0.0))
        + _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
        + b"\x00")

    block = _BLOCK_LINES[compression]
    nchunks = (h + block - 1) // block
    pix = img.astype(dtype)

    chunks = []
    for ci in range(nchunks):
        y0 = ci * block
        nlines = min(block, h - y0)
        lines = []
        for li in range(nlines):
            for i in chans:
                lines.append(pix[y0 + li, :, i].tobytes())
        raw = b"".join(lines)
        if compression in (COMP_ZIPS, COMP_ZIP):
            comp = zlib.compress(
                _zip_preprocess(np.frombuffer(raw, np.uint8)), 6)
            data = comp if len(comp) < len(raw) else raw
        else:
            data = raw
        chunks.append(struct.pack("<ii", y0, len(data)) + data)

    head = struct.pack("<iI", MAGIC, 2) + header
    table_size = 8 * nchunks
    off = len(head) + table_size
    table = []
    for ch in chunks:
        table.append(struct.pack("<Q", off))
        off += len(ch)
    return head + b"".join(table) + b"".join(chunks)


def save_exr(path: str, img: np.ndarray, *, half: bool = True):
    with open(path, "wb") as f:
        f.write(encode_exr(img, half=half))

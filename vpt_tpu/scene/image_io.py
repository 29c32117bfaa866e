"""Image codecs with zero external dependencies.

The environment ships no PIL/imageio, so we implement the formats the test
scenes actually use (reference loads these through stb/tinyexr,
/root/reference/libs/yocto/yocto_sceneio.cpp:411-560):
  - PNG decode/encode (zlib from the stdlib; all filter types, 8/16-bit,
    gray/rgb/rgba/palette)
  - Radiance .hdr decode/encode (RLE and flat scanlines)
  - PPM/PFM as debugging fallbacks

Returns float32 arrays in [0,1] for LDR (plus `srgb` flag) and linear float
for HDR, matching how the reference tags textures (ldr => srgb, hdr => linear).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def _paeth(a, b, c):
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes):
    """Decode a PNG byte string -> (H, W, C) uint8 or uint16 array."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos = 8
    idat = []
    palette = None
    trns = None
    width = height = bitdepth = colortype = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, bitdepth, colortype, _, _, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(chunk, np.uint8)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[colortype]
    if bitdepth == 8:
        bpp = channels
    elif bitdepth == 16:
        bpp = channels * 2
    elif bitdepth in (1, 2, 4):
        bpp = 1
    else:
        raise ValueError(f"bitdepth {bitdepth}")
    if bitdepth < 8:
        row_bytes = (width * bitdepth * channels + 7) // 8
    else:
        row_bytes = width * bpp
    raw = np.frombuffer(raw, np.uint8).reshape(height, row_bytes + 1)
    filters = raw[:, 0]
    scan = raw[:, 1:].copy()
    from .. import native

    if native.png_unfilter(scan, filters, bpp):
        return _png_assemble(scan, width, height, bitdepth, channels,
                             colortype, palette, trns)
    prev = np.zeros(row_bytes, np.uint8)
    for y in range(height):
        f = filters[y]
        row = scan[y]
        if f == 0:
            pass
        elif f == 1:  # sub
            for x in range(bpp, row_bytes):
                row[x] = (int(row[x]) + int(row[x - bpp])) & 0xFF
        elif f == 2:  # up
            scan[y] = (row.astype(np.int32) + prev).astype(np.uint8)
            row = scan[y]
        elif f == 3:  # average
            for x in range(row_bytes):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # paeth
            for x in range(row_bytes):
                left = int(row[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + int(
                    _paeth(np.uint8(left), prev[x], np.uint8(ul))
                )) & 0xFF
        prev = scan[y]
    return _png_assemble(scan, width, height, bitdepth, channels, colortype,
                         palette, trns)


def _png_assemble(scan, width, height, bitdepth, channels, colortype,
                  palette, trns):
    if bitdepth == 16:
        img = scan.view(">u2").astype(np.uint16).reshape(height, width, channels)
    elif bitdepth == 8:
        img = scan.reshape(height, width, channels)
    else:
        # unpack sub-byte gray/palette
        bits = np.unpackbits(scan, axis=1)[:, : width * bitdepth * channels]
        bits = bits.reshape(height, width, bitdepth)
        weights = (1 << np.arange(bitdepth - 1, -1, -1)).astype(np.uint16)
        img = (bits * weights).sum(-1).astype(np.uint8)[..., None]
        if colortype == 0:
            img = (img * (255 // ((1 << bitdepth) - 1))).astype(np.uint8)
    if colortype == 3:
        idx = img[..., 0]
        rgb = palette[idx]
        if trns is not None:
            a = np.full(idx.shape, 255, np.uint8)
            a[idx < len(trns)] = trns[idx[idx < len(trns)]]
            img = np.concatenate([rgb, a[..., None]], axis=-1)
        else:
            img = rgb
    return img


def load_png(path: str):
    with open(path, "rb") as f:
        img = decode_png(f.read())
    if img.dtype == np.uint16:
        return img.astype(np.float32) / 65535.0
    return img.astype(np.float32) / 255.0


def encode_png(img_u8: np.ndarray) -> bytes:
    """Encode (H, W, C) uint8 (C in 1..4) as PNG with filter 0."""
    img_u8 = np.ascontiguousarray(img_u8)
    if img_u8.ndim == 2:
        img_u8 = img_u8[..., None]
    h, w, c = img_u8.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), img_u8.reshape(h, w * c)], axis=1
    ).tobytes()
    comp = zlib.compress(raw, 6)

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp)
        + chunk(b"IEND", b"")
    )


def save_png(path: str, img: np.ndarray):
    """img: float in [0,1] or uint8."""
    if img.dtype != np.uint8:
        img = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(encode_png(img))


# ---------------------------------------------------------------------------
# Radiance HDR (.hdr / .pic)
# ---------------------------------------------------------------------------

def load_hdr(path: str):
    """Decode Radiance RGBE -> (H, W, 3) float32 linear."""
    with open(path, "rb") as f:
        data = f.read()
    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError("not a Radiance HDR file")
    pos = data.find(b"\n\n")
    if pos < 0:
        raise ValueError("bad HDR header")
    dims_end = data.find(b"\n", pos + 2)
    dims = data[pos + 2:dims_end].decode("ascii").split()
    # standard orientation: -Y H +X W
    if dims[0] != "-Y" or dims[2] != "+X":
        raise ValueError(f"unsupported HDR orientation {dims}")
    height, width = int(dims[1]), int(dims[3])
    body = np.frombuffer(data, np.uint8, offset=dims_end + 1)
    rgbe = np.zeros((height, width, 4), np.uint8)
    pos = 0
    for y in range(height):
        if (
            width >= 8 and width < 32768
            and body[pos] == 2 and body[pos + 1] == 2
            and (int(body[pos + 2]) << 8 | int(body[pos + 3])) == width
        ):
            pos += 4
            for ch in range(4):
                x = 0
                while x < width:
                    cnt = int(body[pos]); pos += 1
                    if cnt > 128:  # run
                        rgbe[y, x:x + cnt - 128, ch] = body[pos]
                        pos += 1
                        x += cnt - 128
                    else:  # literal
                        rgbe[y, x:x + cnt, ch] = body[pos:pos + cnt]
                        pos += cnt
                        x += cnt
        else:  # flat scanline
            row = body[pos:pos + width * 4].reshape(width, 4)
            rgbe[y] = row
            pos += width * 4
    mantissa = rgbe[..., :3].astype(np.float32)
    exp = rgbe[..., 3].astype(np.int32) - 128
    scale = np.ldexp(1.0, exp - 8).astype(np.float32)
    out = mantissa * scale[..., None]
    out[rgbe[..., 3] == 0] = 0.0
    return out


def save_hdr(path: str, img: np.ndarray):
    """Encode (H, W, 3) float32 linear as flat (non-RLE) Radiance HDR."""
    img = np.asarray(img, np.float32)
    h, w, _ = img.shape
    maxc = img.max(axis=-1)
    exp = np.zeros((h, w), np.int32)
    mant = np.zeros((h, w, 3), np.uint8)
    nz = maxc > 1e-38
    e = np.zeros_like(maxc, np.int32)
    m, e_f = np.frexp(maxc[nz])
    scale = m * 256.0 / maxc[nz]
    mant_nz = np.clip(img[nz] * scale[..., None], 0, 255).astype(np.uint8)
    mant[nz] = mant_nz
    exp_arr = np.zeros((h, w), np.int32)
    exp_arr[nz] = e_f + 128
    rgbe = np.concatenate([mant, exp_arr[..., None].astype(np.uint8)], axis=-1)
    header = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n" + f"-Y {h} +X {w}\n".encode()
    with open(path, "wb") as f:
        f.write(header + rgbe.tobytes())


# ---------------------------------------------------------------------------
# dispatch helpers
# ---------------------------------------------------------------------------

def load_tga(path: str):
    """TARGA loader: types 1 (indexed), 2 (truecolor), 3 (gray), and their
    RLE variants 9/10/11; 8/16/24/32-bit pixels; origin bits honored.
    Returns (H, W, C) float32 in [0, 1]. (Reference loads tga via
    stb_image, yocto_sceneio.cpp:411-470.)"""
    with open(path, "rb") as f:
        data = f.read()
    (idlen, cmap_type, img_type, cmap_first, cmap_len, cmap_bits,
     x0, y0, w, h, bpp, desc) = struct.unpack("<BBBHHBHHHHBB", data[:18])
    off = 18 + idlen
    cmap = None
    if cmap_type == 1:
        cbytes = (cmap_bits + 7) // 8
        raw = np.frombuffer(data, np.uint8, cmap_len * cbytes, off)
        cmap = raw.reshape(cmap_len, cbytes)
        off += cmap_len * cbytes
    nb = (bpp + 7) // 8
    count = w * h
    base = img_type & 7
    if img_type & 8:  # RLE
        out = np.empty((count, nb), np.uint8)
        i = off
        n = 0
        while n < count:
            hdr = data[i]
            i += 1
            ln = (hdr & 0x7F) + 1
            if hdr & 0x80:
                px = np.frombuffer(data, np.uint8, nb, i)
                i += nb
                out[n:n + ln] = px
            else:
                px = np.frombuffer(data, np.uint8, nb * ln, i)
                i += nb * ln
                out[n:n + ln] = px.reshape(ln, nb)
            n += ln
        pix = out
    else:
        pix = np.frombuffer(data, np.uint8, count * nb, off).reshape(count, nb)
    if base == 1:  # color-mapped
        pix = cmap[pix[:, 0].astype(np.int64) - cmap_first]
        nb = pix.shape[1]
    if nb == 1:
        img = np.repeat(pix, 3, axis=1).astype(np.float32) / 255.0
    elif nb == 2:  # 5551 little-endian
        v = pix[:, 0].astype(np.uint16) | (pix[:, 1].astype(np.uint16) << 8)
        r = ((v >> 10) & 31) / 31.0
        g = ((v >> 5) & 31) / 31.0
        b = (v & 31) / 31.0
        img = np.stack([r, g, b], axis=1).astype(np.float32)
    else:  # BGR(A)
        img = pix[:, [2, 1, 0] + ([3] if nb == 4 else [])].astype(
            np.float32) / 255.0
    img = img.reshape(h, w, -1)
    if not (desc & 0x20):  # bottom-up origin
        img = img[::-1]
    if desc & 0x10:  # right-to-left
        img = img[:, ::-1]
    return np.ascontiguousarray(img)


def save_tga(path: str, img):
    """Uncompressed truecolor (type 2) bottom-up TGA; img float [0,1] or u8,
    3 or 4 channels."""
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255 + 0.5).astype(np.uint8)
    h, w = arr.shape[:2]
    c = arr.shape[2] if arr.ndim == 3 else 1
    if c == 1:
        arr = np.repeat(arr.reshape(h, w, 1), 3, axis=2)
        c = 3
    bgr = arr[..., [2, 1, 0] + ([3] if c == 4 else [])]
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, w, h,
                      8 * c, 8 if c == 4 else 0)
    with open(path, "wb") as f:
        f.write(hdr + np.ascontiguousarray(bgr[::-1]).tobytes())


def load_bmp(path: str):
    """Windows BMP (BITMAPINFOHEADER+, uncompressed 8/24/32-bit, and
    BI_BITFIELDS 32-bit) -> (H, W, C) float32 in [0, 1]."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] != b"BM":
        raise ValueError(f"{path}: not a BMP")
    pix_off = struct.unpack("<I", data[10:14])[0]
    hdr_size = struct.unpack("<I", data[14:18])[0]
    w, h = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    comp = struct.unpack("<I", data[30:34])[0] if hdr_size >= 20 else 0
    if comp not in (0, 3):
        raise ValueError(f"{path}: unsupported BMP compression {comp}")
    flip = h > 0
    h = abs(h)
    if bpp == 8:
        ncol = struct.unpack("<I", data[46:50])[0] or 256
        pal = np.frombuffer(data, np.uint8, ncol * 4, 14 + hdr_size)
        pal = pal.reshape(ncol, 4)[:, [2, 1, 0]]
        stride = (w + 3) & ~3
        rows = np.frombuffer(data, np.uint8, stride * h, pix_off)
        idx = rows.reshape(h, stride)[:, :w]
        img = pal[idx].astype(np.float32) / 255.0
    elif bpp in (24, 32):
        nb = bpp // 8
        stride = (w * nb + 3) & ~3
        rows = np.frombuffer(data, np.uint8, stride * h, pix_off)
        px = rows.reshape(h, stride)[:, : w * nb].reshape(h, w, nb)
        img = px[..., [2, 1, 0] + ([3] if nb == 4 else [])].astype(
            np.float32) / 255.0
    else:
        raise ValueError(f"{path}: unsupported BMP bpp {bpp}")
    if flip:
        img = img[::-1]
    return np.ascontiguousarray(img)


def save_bmp(path: str, img):
    """24-bit uncompressed bottom-up BMP (alpha dropped)."""
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255 + 0.5).astype(np.uint8)
    h, w = arr.shape[:2]
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, axis=-1)
    bgr = arr[..., [2, 1, 0]]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = bgr[::-1].reshape(h, w * 3)
    body = rows.tobytes()
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    hdr += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    with open(path, "wb") as f:
        f.write(hdr + body)


def load_image(path: str):
    """Returns (pixels (H,W,4) float32, linear flag)."""
    lower = path.lower()

    def rgba(img):
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        if img.shape[-1] == 2:
            img = np.concatenate([np.repeat(img[..., :1], 3, -1), img[..., 1:]], -1)
        if img.shape[-1] == 3:
            img = np.concatenate([img, np.ones_like(img[..., :1])], axis=-1)
        return img.astype(np.float32)

    if lower.endswith(".png"):
        return rgba(load_png(path)), False
    if lower.endswith((".jpg", ".jpeg")):
        from .jpeg import load_jpeg

        return rgba(load_jpeg(path)), False
    if lower.endswith(".tga"):
        return rgba(load_tga(path)), False
    if lower.endswith(".bmp"):
        return rgba(load_bmp(path)), False
    if lower.endswith(".hdr") or lower.endswith(".pic"):
        img = load_hdr(path)
        img = np.concatenate([img, np.ones_like(img[..., :1])], axis=-1)
        return img.astype(np.float32), True
    if lower.endswith(".exr"):
        from . import exr

        return exr.load_exr(path).astype(np.float32), True
    raise ValueError(f"unsupported image format: {path}")


def srgb_to_linear(x):
    x = np.asarray(x, dtype=np.float32)
    return np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(x):
    x = np.asarray(x, dtype=np.float32)
    x = np.clip(x, 0.0, 1.0)
    return np.where(x <= 0.0031308, 12.92 * x, 1.055 * x ** (1 / 2.4) - 0.055)

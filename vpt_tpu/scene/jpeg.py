"""Minimal baseline JPEG (JFIF) decoder, numpy + pure Python.

Exists to decode the reference golden images (check/*.jpg, written by
stb_image_write which emits baseline sequential JPEGs) for statistical
image-comparison tests — no external imaging libraries are available in this
environment. Supports: SOF0 baseline, 8-bit, 1 or 3 components, 4:4:4 /
4:2:0 / 4:2:2 sampling, restart markers. Not supported: progressive (SOF2),
arithmetic coding, 12-bit.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# 8x8 IDCT basis matrix
_C = np.array([
    [np.cos((2 * x + 1) * u * np.pi / 16) * (np.sqrt(0.5) if u == 0 else 1.0)
     for u in range(8)] for x in range(8)
]) * 0.5


class _BitReader:
    __slots__ = ("data", "pos", "bitbuf", "bitcnt")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.bitcnt = 0

    def fill(self):
        while self.bitcnt <= 24:
            if self.pos >= len(self.data):
                self.bitbuf |= 0  # pad with zeros
                self.bitcnt += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1
                else:
                    # marker: behave as end of stream (caller handles RST)
                    self.pos -= 1
                    self.bitcnt += 8
                    self.bitbuf = (self.bitbuf << 8)
                    continue
            self.bitbuf = ((self.bitbuf << 8) | b) & 0xFFFFFFFFFF
            self.bitcnt += 8

    def receive(self, n):
        if n == 0:
            return 0
        if self.bitcnt < n:
            self.fill()
        self.bitcnt -= n
        val = (self.bitbuf >> self.bitcnt) & ((1 << n) - 1)
        return val

    def align_restart(self):
        # drop partial byte, skip RSTn marker
        self.bitbuf = 0
        self.bitcnt = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _build_huff(bits, vals):
    """Return (lookup dict code->(len, val)) plus fast (maxlen) table."""
    code = 0
    table = {}
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _decode_huff(br: _BitReader, table):
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.receive(1)
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("bad huffman code")


def _extend(v, n):
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt = {}
    huff_dc = {}
    huff_ac = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq = seg[p] >> 4
                tq = seg[p] & 15
                p += 1
                if pq:
                    tbl = np.frombuffer(seg[p:p + 128], ">u2").astype(np.int32)
                    p += 128
                else:
                    tbl = np.frombuffer(seg[p:p + 64], np.uint8).astype(np.int32)
                    p += 64
                qt[tq] = tbl
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], \
                struct.unpack(">H", seg[3:5])[0], seg[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + i * 3], seg[7 + i * 3], seg[8 + i * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"w": h, "h": w, "comps": comps}  # note: seg[1:3]=height
            frame = {"h": struct.unpack(">H", seg[1:3])[0],
                     "w": struct.unpack(">H", seg[3:5])[0], "comps": comps}
        elif marker == 0xC2:
            raise ValueError("progressive JPEG unsupported")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc = seg[p] >> 4
                th = seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                tbl = _build_huff(bits, vals)
                if tc == 0:
                    huff_dc[th] = tbl
                else:
                    huff_ac[th] = tbl
                p += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scomp = []
            for i in range(ns):
                cs, td_ta = seg[1 + i * 2], seg[2 + i * 2]
                scomp.append({"id": cs, "dc": td_ta >> 4, "ac": td_ta & 15})
            scan_start = pos + seglen
            return _decode_scan(
                data[scan_start:], frame, scomp, qt, huff_dc, huff_ac,
                restart_interval)
        pos += seglen
    raise ValueError("no scan found")


def _decode_scan(stream, frame, scomp, qt, huff_dc, huff_ac, restart_interval):
    comps = frame["comps"]
    W, H = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (W + 8 * hmax - 1) // (8 * hmax)
    mcuy = (H + 8 * vmax - 1) // (8 * vmax)

    # per-component coefficient block grids
    planes = []
    for c in comps:
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        planes.append(np.zeros((bh, bw, 64), np.int32))

    br = _BitReader(stream)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                sc = next(s for s in scomp if s["id"] == c["id"])
                dct = huff_dc[sc["dc"]]
                act = huff_ac[sc["ac"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = planes[ci][my * c["v"] + by, mx * c["h"] + bx]
                        t = _decode_huff(br, dct)
                        diff = _extend(br.receive(t), t)
                        pred[ci] += diff
                        blk[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, act)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break
                            k += r
                            if k > 63:
                                break
                            blk[k] = _extend(br.receive(s), s)
                            k += 1
            mcu_count += 1

    # dequantize + dezigzag + IDCT, vectorized per component
    out_planes = []
    for ci, c in enumerate(comps):
        coeff = planes[ci] * qt[c["tq"]][None, None, :]
        dez = np.zeros_like(coeff)
        dez[:, :, ZIGZAG] = coeff
        bh, bw, _ = dez.shape
        blocks = dez.reshape(bh, bw, 8, 8).astype(np.float64)
        # idct: C @ B @ C.T
        spat = np.einsum("xu,ijuv,yv->ijxy", _C, blocks, _C) + 128.0
        plane = spat.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        # upsample to full res
        ry = vmax // c["v"]
        rx = hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:H, :W])

    if len(comps) == 1:
        y = np.clip(out_planes[0], 0, 255)
        return np.repeat(y[..., None], 3, axis=-1).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(rgb + 0.5, 0, 255).astype(np.uint8)


def load_jpeg(path: str) -> np.ndarray:
    """Returns (H, W, 3) float32 in [0,1] (srgb-encoded values)."""
    with open(path, "rb") as f:
        img = decode_jpeg(f.read())
    return img.astype(np.float32) / 255.0


# ---------------------------------------------------------------------------
# Baseline JPEG encoder (the save side of this codec; reference writes jpg
# via stb_image_write, yocto_sceneio.cpp:509-560). Sequential 4:4:4, standard
# Annex-K quantization (quality-scaled, libjpeg rule) and Huffman tables.
# ---------------------------------------------------------------------------

_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], np.float64)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], np.float64)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
_HUFF_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              list(range(12)))
_HUFF_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_HUFF_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])
_HUFF_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])


def _huff_codes(bits, vals):
    """value -> (code, length) map from a (bits, values) table."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code, length):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        # truncate drained bits: without this the accumulator grows into an
        # ever-larger bigint and every shift becomes O(stream size)
        # (quadratic encode for megapixel images)
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def _magnitude(v: int):
    """JPEG magnitude category + offset bits for a signed coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    n = a.bit_length()
    bits = v if v > 0 else v + (1 << n) - 1
    return n, bits


def encode_jpeg(rgb_u8: np.ndarray, quality: int = 90) -> bytes:
    """Encode (H, W, 3) uint8 sRGB as a baseline 4:4:4 JFIF JPEG."""
    img = np.asarray(rgb_u8)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    H, W = img.shape[:2]
    # libjpeg quality scaling
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - q * 2
    qluma = np.clip((_Q_LUMA * scale + 50) // 100, 1, 255)
    qchroma = np.clip((_Q_CHROMA * scale + 50) // 100, 1, 255)

    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b

    Hp, Wp = -(-H // 8) * 8, -(-W // 8) * 8
    planes = []
    for p in (y, cb, cr):
        pp = np.pad(p, ((0, Hp - H), (0, Wp - W)), mode="edge")
        planes.append(pp)

    # blocked forward DCT: (nby, nbx, 8, 8) = C^T X C with the IDCT basis _C
    def fdct_blocks(p):
        blocks = p.reshape(Hp // 8, 8, Wp // 8, 8).transpose(0, 2, 1, 3)
        return np.einsum("xi,abxy,yj->abij", _C, blocks, _C)

    coeffs = [fdct_blocks(p) for p in planes]
    qtabs = [qluma, qchroma, qchroma]
    dc_codes = [_huff_codes(*_HUFF_DC_L), _huff_codes(*_HUFF_DC_C),
                _huff_codes(*_HUFF_DC_C)]
    ac_codes = [_huff_codes(*_HUFF_AC_L), _huff_codes(*_HUFF_AC_C),
                _huff_codes(*_HUFF_AC_C)]

    # quantize + zigzag all blocks up front (vectorized)
    zz = [None] * 3
    for ci in range(3):
        qc = np.round(coeffs[ci] / qtabs[ci].reshape(8, 8)).astype(np.int32)
        zz[ci] = qc.reshape(-1, 64)[:, ZIGZAG]

    bw = _BitWriter()
    nby, nbx = Hp // 8, Wp // 8
    prev_dc = [0, 0, 0]
    for bi in range(nby * nbx):
        for ci in range(3):
            blk = zz[ci][bi]
            dc = int(blk[0])
            diff = dc - prev_dc[ci]
            prev_dc[ci] = dc
            n, bits = _magnitude(diff)
            code, ln = dc_codes[ci][n]
            bw.put(code, ln)
            if n:
                bw.put(bits, n)
            run = 0
            last_nz = int(np.max(np.nonzero(blk)[0])) if blk.any() else 0
            for k in range(1, 64):
                v = int(blk[k])
                if v == 0:
                    if k > last_nz:
                        code, ln = ac_codes[ci][0x00]  # EOB
                        bw.put(code, ln)
                        break
                    run += 1
                    if run == 16:
                        code, ln = ac_codes[ci][0xF0]  # ZRL
                        bw.put(code, ln)
                        run = 0
                    continue
                n, bits = _magnitude(v)
                code, ln = ac_codes[ci][(run << 4) | n]
                bw.put(code, ln)
                bw.put(bits, n)
                run = 0
    bw.flush()

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0]) + bytes(qluma.astype(np.uint8)[ZIGZAG]))
    out += seg(0xFFDB, bytes([1]) + bytes(qchroma.astype(np.uint8)[ZIGZAG]))
    sof = struct.pack(">BHHB", 8, H, W, 3)
    for cid, (hs, vs), tq in ((1, (1, 1), 0), (2, (1, 1), 1), (3, (1, 1), 1)):
        sof += struct.pack(">BBB", cid, (hs << 4) | vs, tq)
    out += seg(0xFFC0, sof)
    for tc_th, (bits, vals) in ((0x00, _HUFF_DC_L), (0x01, _HUFF_DC_C),
                                (0x10, _HUFF_AC_L), (0x11, _HUFF_AC_C)):
        out += seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def save_jpeg(path: str, rgb_u8: np.ndarray, quality: int = 90) -> None:
    with open(path, "wb") as f:
        f.write(encode_jpeg(rgb_u8, quality))

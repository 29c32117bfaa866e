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

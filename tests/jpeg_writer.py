"""Minimal baseline JPEG ENCODER — test-fixture machinery (like
biff_writer.py for .xls): produces real ITU-T T.81 baseline JFIF
files so tests can round-trip operators/jpegcodec.py without any
image library. Supports grayscale, 4:4:4 and 4:2:0 YCbCr color,
quality scaling of the Annex K tables, and optional restart
intervals."""

from __future__ import annotations

import struct

import numpy as np

from schema_validata_spark.operators.jpegcodec import ZIGZAG

# Annex K.1 / K.2 quantization tables (natural row-major order)
QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.float64)
QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.float64)

# Annex K.3 typical Huffman tables: (bits[16], values)
DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
        list(range(12)))
DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
        list(range(12)))
AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

def _codes(bits, vals):
    out = {}
    code = 0
    k = 0
    for size in range(1, 17):
        for _ in range(bits[size - 1]):
            out[vals[k]] = (code, size)
            code += 1
            k += 1
        code <<= 1
    return out


def _fdct_matrix():
    c = np.empty((8, 8))
    for u in range(8):
        s = (1 / 8) ** 0.5 if u == 0 else (2 / 8) ** 0.5
        for x in range(8):
            c[u, x] = s * np.cos((2 * x + 1) * u * np.pi / 16)
    return c


_C = _fdct_matrix()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code, size):
        self.acc = (self.acc << size) | code
        self.nbits += size
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)        # byte stuffing
            self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-bit padding


def _scale_q(table, quality):
    q = max(1, min(100, quality))
    s = 5000 // q if q < 50 else 200 - 2 * q
    t = np.floor((table * s + 50) / 100)
    return np.clip(t, 1, 255).reshape(8, 8)


def _category(v):
    a, t = abs(v), 0
    while a:
        a >>= 1
        t += 1
    return t


def _encode_block(bw, coef_zz, pred, dc_codes, ac_codes):
    diff = coef_zz[0] - pred
    t = _category(diff)
    code, size = dc_codes[t]
    bw.write(code, size)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last = 63
    while last > 0 and coef_zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = coef_zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, size = ac_codes[0xF0]      # ZRL
            bw.write(code, size)
            run -= 16
        s = _category(v)
        code, size = ac_codes[(run << 4) | s]
        bw.write(code, size)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, size = ac_codes[0x00]          # EOB
        bw.write(code, size)
    return coef_zz[0]


def _component_blocks(plane, qtab, mcux, mcuy, hi, vi, hmax, vmax):
    """Pad plane to the MCU grid and emit quantized zigzag blocks in
    MCU raster order (hi*vi per MCU), plus per-block layout."""
    ch = mcuy * vi * 8
    cw = mcux * hi * 8
    p = np.zeros((ch, cw), dtype=np.float64)
    p[:plane.shape[0], :plane.shape[1]] = plane
    # edge replication padding keeps DC sane
    if plane.shape[0] < ch:
        p[plane.shape[0]:, :plane.shape[1]] = plane[-1:, :]
    if plane.shape[1] < cw:
        p[:, plane.shape[1]:] = p[:, plane.shape[1] - 1:plane.shape[1]]
    blocks = []
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(vi):
                for bx in range(hi):
                    y0 = (my * vi + by) * 8
                    x0 = (mx * hi + bx) * 8
                    blk = p[y0:y0 + 8, x0:x0 + 8] - 128.0
                    f = _C @ blk @ _C.T
                    q = np.rint(f / qtab).astype(np.int64)
                    blocks.append([int(q.reshape(64)[ZIGZAG[z]])
                                   for z in range(64)])
    return blocks


def encode_jpeg(arr: np.ndarray, quality: int = 85,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 → baseline JFIF
    bytes. ``subsampling``: '444' or '420' (color only)."""
    arr = np.asarray(arr)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    ql = _scale_q(QL, quality)
    qc = _scale_q(QC, quality)

    if gray:
        comps = [(1, 1, 1, 0)]
        planes = {1: arr.astype(np.float64)}
    else:
        r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            he, we = h + (h & 1), w + (w & 1)
            cbp = np.zeros((he, we)) + 128.0
            crp = np.zeros((he, we)) + 128.0
            cbp[:h, :w], crp[:h, :w] = cb, cr
            cb = cbp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        else:
            comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        planes = {1: y, 2: cb, 3: cr}

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    blocks = {}
    for cid, hi, vi, tq in comps:
        blocks[cid] = _component_blocks(
            planes[cid], ql if tq == 0 else qc, mcux, mcuy, hi, vi,
            hmax, vmax)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, tab in ((0, ql),) + (() if gray else ((1, qc),)):
        zz = bytes(int(tab.reshape(64)[ZIGZAG[z]]) for z in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * len(comps), 8,
                                     h, w, len(comps))
    for cid, hi, vi, tq in comps:
        out += bytes([cid, (hi << 4) | vi, tq])
    hts = [(0x00, DC_L), (0x10, AC_L)]
    if not gray:
        hts += [(0x01, DC_C), (0x11, AC_C)]
    for tid, (bits, vals) in hts:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) \
            + bytes([tid]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps),
                                     len(comps))
    for cid, _, _, tq in comps:
        out += bytes([cid, 0x00 if tq == 0 else 0x11])
    out += b"\x00\x3f\x00"

    dc_l, ac_l = _codes(*DC_L), _codes(*AC_L)
    dc_c, ac_c = _codes(*DC_C), _codes(*AC_C)
    bw = _BitWriter()
    pred = {c[0]: 0 for c in comps}
    n_mcus = mcux * mcuy
    rst = 0
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            out += bw.out
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            pred = {c[0]: 0 for c in comps}
        for cid, hi, vi, tq in comps:
            dcc = dc_l if tq == 0 else dc_c
            acc = ac_l if tq == 0 else ac_c
            base = m * hi * vi
            for j in range(hi * vi):
                pred[cid] = _encode_block(bw, blocks[cid][base + j],
                                          pred[cid], dcc, acc)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)

"""Baseline JPEG codec — pure stdlib + numpy (ITU-T T.81 / JFIF).

The dominant real-web image format (Common Crawl media is overwhelmingly
JPEG), so the image-decode tier of ``stages.multimodal`` gets a REAL
baseline decoder rather than an honest stub: marker parse → Huffman
entropy decode (byte unstuffing, restart markers, DC prediction) →
dequantize → batched 8×8 IDCT (one numpy einsum over all blocks of a
component, no per-block Python IDCT) → chroma upsample → JFIF YCbCr→RGB.

Supported: baseline (SOF0) and extended-sequential (SOF1) Huffman frames,
grayscale and 3-component YCbCr, any integer chroma sampling (4:4:4,
4:2:2, 4:2:0, …), restart intervals, multi-segment DQT/DHT. Progressive
(SOF2), arithmetic coding, hierarchical, 12-bit precision and CMYK raise
``NotImplementedError`` — the same honest-stub contract as the other
codecs in ``stages/multimodal.py``.

``encode_jpeg`` writes a valid baseline JFIF stream (Annex K quant tables
scaled by the libjpeg quality formula, Annex K Huffman tables, optional
4:2:0 subsampling, optional restart interval) so tests and planted
corpora can synthesize real compressed inputs without any external
library. The decoder is exercised against HAND-BUILT byte streams with
analytically computed pixels (tests/test_jpeg.py), not just its own
encoder, so a shared codec bug cannot self-certify.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------- #
# spec constants (ITU-T T.81)
# --------------------------------------------------------------------------- #
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 quantization tables (luminance, chrominance), natural order
# flattened row-major after dezigzag of the spec's zigzag listing
QTBL_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QTBL_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
HUFF_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
               list(range(12)))
HUFF_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
               list(range(12)))
HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
HUFF_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# orthonormal DCT-II basis: M[u, x] = a(u)/2 · cos((2x+1)uπ/16);
# forward C = M F Mᵀ, inverse F = Mᵀ C M (T.81 A.3.3)
_X, _U = np.meshgrid(np.arange(8), np.arange(8))
DCT_M = 0.5 * np.cos((2 * _X + 1) * _U * np.pi / 16)
DCT_M[0] *= 1 / np.sqrt(2)


# --------------------------------------------------------------------------- #
# Huffman table (decode side): T.81 F.2.2.3 min/max-code procedure
# --------------------------------------------------------------------------- #
class _HuffTable:
    __slots__ = ("mincode", "maxcode", "valptr", "values")

    def __init__(self, bits: list[int], values: list[int]):
        if len(values) != sum(bits):
            raise ValueError("JPEG: DHT count mismatch")
        self.values = values
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first reader over an UNSTUFFED entropy segment."""

    __slots__ = ("bits", "pos", "n")

    def __init__(self, seg: bytes):
        self.bits = np.unpackbits(np.frombuffer(seg, dtype=np.uint8))
        self.pos = 0
        self.n = len(self.bits)

    def receive(self, k: int) -> int:
        if k == 0:
            return 0
        p = self.pos
        if p + k > self.n:
            raise ValueError("JPEG: entropy data exhausted")
        v = 0
        for b in self.bits[p:p + k]:
            v = (v << 1) | int(b)
        self.pos = p + k
        return v

    def decode(self, t: _HuffTable) -> int:
        code, p = 0, self.pos
        bits, n = self.bits, self.n
        for ln in range(1, 17):
            if p >= n:
                raise ValueError("JPEG: entropy data exhausted")
            code = (code << 1) | int(bits[p])
            p += 1
            if t.maxcode[ln] >= code >= t.mincode[ln]:
                self.pos = p
                return t.values[t.valptr[ln] + code - t.mincode[ln]]
        raise ValueError("JPEG: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    # T.81 F.2.2.1: map a t-bit magnitude to its signed value
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# --------------------------------------------------------------------------- #
# decoder
# --------------------------------------------------------------------------- #
def decode_jpeg(b: bytes) -> np.ndarray:
    """Decode a baseline JPEG to (h, w, c) uint8 — c = 1 (gray) or 3 (RGB).

    See module docstring for the supported/stubbed matrix.
    """
    if b[:2] != b"\xff\xd8":
        raise ValueError("JPEG: missing SOI")
    qt: dict[int, np.ndarray] = {}
    hdc: dict[int, _HuffTable] = {}
    hac: dict[int, _HuffTable] = {}
    frame = None
    restart = 0
    i = 2
    n = len(b)
    while i < n:
        if b[i] != 0xFF:
            raise ValueError("JPEG: expected marker")
        while i < n and b[i] == 0xFF:
            i += 1  # fill bytes
        if i >= n:
            raise ValueError("JPEG: truncated stream")
        m = b[i]
        i += 1
        if m == 0xD9:  # EOI
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            continue  # TEM / stray RST: no payload
        if i + 2 > n:
            raise ValueError("JPEG: truncated segment header")
        ln = struct.unpack_from(">H", b, i)[0]
        if ln < 2 or i + ln > n:
            raise ValueError("JPEG: bad segment length")
        seg = b[i + 2:i + ln]
        if m == 0xDB:  # DQT — possibly several tables in one segment
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, j).astype(np.int64)
                    j += 64
                elif pq == 1:
                    tbl = np.frombuffer(
                        seg[j:j + 128], ">u2").astype(np.int64)
                    j += 128
                else:
                    raise ValueError("JPEG: bad DQT precision")
                qt[tq] = tbl  # zigzag order, as stored
        elif m == 0xC4:  # DHT — possibly several tables
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1:j + 17])
                cnt = sum(bits)
                vals = list(seg[j + 17:j + 17 + cnt])
                j += 17 + cnt
                (hdc if tc == 0 else hac)[th] = _HuffTable(bits, vals)
        elif m in (0xC0, 0xC1):  # SOF0 baseline / SOF1 extended sequential
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("JPEG: only 8-bit precision")
            if nc not in (1, 3):
                raise NotImplementedError("JPEG: only gray/YCbCr")
            comps = []
            for k in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * k)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "JPEG: progressive/arithmetic/hierarchical not in sandbox "
                "(baseline SOF0/SOF1 decode is real)")
        elif m == 0xDD:  # DRI
            restart = struct.unpack_from(">H", seg, 0)[0]
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            if ns != len(frame["comps"]):
                raise NotImplementedError(
                    "JPEG: only single interleaved scan")
            scan = {}
            for k in range(ns):
                cs, tables = seg[1 + 2 * k], seg[2 + 2 * k]
                scan[cs] = (tables >> 4, tables & 15)
            data_start = i + ln
            return _decode_scan(b, data_start, frame, scan, qt, hdc, hac,
                                restart)
        i += ln
    raise ValueError("JPEG: no SOS scan found")


def _scan_end(b: bytes, start: int) -> int:
    """Index just past the entropy data: the next marker that is neither a
    stuffed 0x00 nor a restart."""
    i = start
    n = len(b)
    while i + 1 < n:
        if b[i] == 0xFF and b[i + 1] != 0x00 and not (
                0xD0 <= b[i + 1] <= 0xD7):
            return i
        i += 1 + (1 if b[i] == 0xFF else 0)
    return n


def _decode_scan(b, start, frame, scan, qt, hdc, hac, restart):
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1:
        raise ValueError("JPEG: bad sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy

    end = _scan_end(b, start)
    # split on restart markers, then unstuff each piece: any 0xFF00 inside
    # an entropy segment is a stuffed data 0xFF (T.81 B.1.1.5)
    segs = []
    i, seg_start = start, start
    while i + 1 < end:
        if b[i] == 0xFF and 0xD0 <= b[i + 1] <= 0xD7:
            segs.append(b[seg_start:i])
            i += 2
            seg_start = i
        else:
            i += 1
    segs.append(b[seg_start:end])
    readers = [_BitReader(bytes(s).replace(b"\xff\x00", b"\xff"))
               for s in segs]
    if restart:
        expect = -(-n_mcu // restart)
        if len(readers) != expect:
            raise ValueError("JPEG: restart segment count mismatch")
    elif len(readers) != 1:
        raise ValueError("JPEG: unexpected restart markers (no DRI)")

    for c in comps:
        if c["tq"] not in qt:
            raise ValueError("JPEG: missing quant table")
        dc_id, ac_id = scan[c["id"]]
        if dc_id not in hdc or ac_id not in hac:
            raise ValueError("JPEG: missing Huffman table")
        c["q"] = qt[c["tq"]]
        c["dc"] = hdc[dc_id]
        c["ac"] = hac[ac_id]
        c["bw"] = mcux * c["h"]  # blocks per row in this component's plane
        c["coef"] = np.zeros((mcuy * c["v"] * c["bw"], 64), dtype=np.int64)

    zz = ZIGZAG
    pred = {c["id"]: 0 for c in comps}
    for mcu in range(n_mcu):
        if restart:
            r_ix, r_off = divmod(mcu, restart)
            if r_off == 0:
                reader = readers[r_ix]
                pred = {c["id"]: 0 for c in comps}
        else:
            reader = readers[0]
        my, mx = divmod(mcu, mcux)
        for c in comps:
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk = np.zeros(64, dtype=np.int64)
                    t = reader.decode(c["dc"])
                    diff = _extend(reader.receive(t), t)
                    pred[c["id"]] += diff
                    blk[0] = pred[c["id"]] * c["q"][0]
                    k = 1
                    while k < 64:
                        rs = reader.decode(c["ac"])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r != 15:
                                break  # EOB
                            k += 16
                            continue
                        k += r
                        if k > 63:
                            raise ValueError("JPEG: AC index overflow")
                        blk[k] = _extend(reader.receive(s), s) * c["q"][k]
                        k += 1
                    row = (my * c["v"] + by) * c["bw"] + mx * c["h"] + bx
                    c["coef"][row] = blk

    # batched dezigzag + IDCT per component, then upsample to full size
    planes = []
    for c in comps:
        coef = np.zeros((c["coef"].shape[0], 64), dtype=np.float64)
        coef[:, zz] = c["coef"]
        blocks = coef.reshape(-1, 8, 8)
        spatial = np.einsum("ux,nuv,vy->nxy", DCT_M, blocks, DCT_M,
                            optimize=True) + 128.0
        bh, bw_ = mcuy * c["v"], c["bw"]
        plane = (spatial.reshape(bh, bw_, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8))
        if hmax % c["h"] or vmax % c["v"]:
            raise NotImplementedError(
                "JPEG: non-integer chroma upsampling ratio")
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        out = planes[0][:, :, None]
    else:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        bl = y + 1.772 * (cb - 128.0)
        out = np.stack([r, g, bl], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------- #
# encoder
# --------------------------------------------------------------------------- #
class _BitWriter:
    __slots__ = ("buf", "acc", "nb")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nb = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nb += length
        while self.nb >= 8:
            byte = (self.acc >> (self.nb - 8)) & 0xFF
            self.nb -= 8
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nb:
            self.put(0x7F, 8 - self.nb)  # pad with 1-bits per B.1.1.5


def _enc_table(bits: list[int], values: list[int]) -> dict[int, tuple]:
    """symbol → (code, length) canonical assignment (T.81 C.2)."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """(category, raw bits) for a signed coefficient (T.81 F.1.2.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, (v if v > 0 else v + (1 << t) - 1)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (QTBL_LUM, QTBL_CHR):
        q = (base * scale + 50) // 100
        out.append(np.clip(q, 1, 255))
    return out[0], out[1]


def encode_jpeg(px: np.ndarray, quality: int = 85, *,
                subsample: bool = False, restart_interval: int = 0) -> bytes:
    """Encode (h, w, c) uint8 (c = 1 or 3) as a baseline JFIF JPEG.

    ``subsample=True`` writes 4:2:0 chroma; ``restart_interval`` > 0 emits
    DRI + RSTn markers every that many MCUs.
    """
    px = np.asarray(px)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nc = px.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg: need 1 or 3 channels")
    qlum, qchr = _quality_tables(quality)
    zz = ZIGZAG

    if nc == 3:
        f = px.astype(np.float64)
        r, g, bl = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bl
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bl + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bl + 128.0
        planes = [y, cb, cr]
        samps = [(2, 2), (1, 1), (1, 1)] if subsample else \
            [(1, 1), (1, 1), (1, 1)]
        qsel = [0, 1, 1]
        tsel = [0, 1, 1]
    else:
        planes = [px[:, :, 0].astype(np.float64)]
        samps = [(1, 1)]
        qsel = [0]
        tsel = [0]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component: downsample (box mean), pad to MCU multiple, block DCT,
    # quantize — all batched in numpy
    comp_blocks = []
    for plane, (sh, sv), qs in zip(planes, samps, qsel):
        if (sh, sv) != (hmax, vmax):
            fy, fx = vmax // sv, hmax // sh
            py, pxw = -(-h // fy) * fy, -(-w // fx) * fx
            tmp = np.empty((py, pxw))
            tmp[:h, :w] = plane
            tmp[h:, :w] = plane[-1:]
            tmp[:, w:] = tmp[:, w - 1:w]
            plane = tmp.reshape(py // fy, fy, pxw // fx, fx).mean((1, 3))
        ph, pw = mcuy * sv * 8, mcux * sh * 8
        padded = np.empty((ph, pw))
        ch, cw = plane.shape
        padded[:ch, :cw] = plane
        padded[ch:, :cw] = plane[-1:]
        padded[:, cw:] = padded[:, cw - 1:cw]
        blocks = (padded.reshape(ph // 8, 8, pw // 8, 8)
                  .transpose(0, 2, 1, 3).reshape(-1, 8, 8)) - 128.0
        coef = np.einsum("ux,nxy,vy->nuv", DCT_M, blocks, DCT_M,
                         optimize=True).reshape(-1, 64)
        # zigzag-order both the coefficients and the divisor (DQT stores
        # tables in zigzag order per B.2.4.1)
        q = (qlum if qs == 0 else qchr).astype(np.float64)[zz]
        qz = np.round(coef[:, zz] / q[None, :]).astype(np.int64)
        comp_blocks.append(qz)  # zigzag order, rows = blocks in raster

    dc_tabs = [_enc_table(*HUFF_DC_LUM), _enc_table(*HUFF_DC_CHR)]
    ac_tabs = [_enc_table(*HUFF_AC_LUM), _enc_table(*HUFF_AC_CHR)]

    out = bytearray(b"\xff\xd8")
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x01\x01"
            + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    for tq, tbl in ((0, qlum), (1, qchr))[:1 if nc == 1 else 2]:
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) \
            + bytes(int(v) for v in tbl[ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for k in range(nc):
        out += struct.pack(">BBB", k + 1,
                           (samps[k][0] << 4) | samps[k][1], qsel[k])
    huffs = [(0x00, HUFF_DC_LUM), (0x10, HUFF_AC_LUM)]
    if nc == 3:
        huffs += [(0x01, HUFF_DC_CHR), (0x11, HUFF_AC_CHR)]
    for tid, (bits, vals) in huffs:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tid) \
            + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for k in range(nc):
        out += struct.pack(">BB", k + 1, (tsel[k] << 4) | tsel[k])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    bw_per_comp = [mcux * s[0] for s in samps]
    writer = _BitWriter()
    pred = [0] * nc
    n_mcu = mcux * mcuy
    rst = 0
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            writer.flush()
            out += writer.buf
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            writer = _BitWriter()
            pred = [0] * nc
        my, mx = divmod(mcu, mcux)
        for k in range(nc):
            sh, sv = samps[k]
            dct, act = dc_tabs[tsel[k]], ac_tabs[tsel[k]]
            for by in range(sv):
                for bx in range(sh):
                    row = (my * sv + by) * bw_per_comp[k] + mx * sh + bx
                    blk = comp_blocks[k][row]
                    diff = int(blk[0]) - pred[k]
                    pred[k] = int(blk[0])
                    t, bits_v = _magnitude(diff)
                    code, ln = dct[t]
                    writer.put(code, ln)
                    writer.put(bits_v, t)
                    run = 0
                    last_nz = np.nonzero(blk[1:])[0]
                    last = int(last_nz[-1]) + 1 if len(last_nz) else 0
                    for j in range(1, last + 1):
                        v = int(blk[j])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = act[0xF0]
                            writer.put(code, ln)
                            run -= 16
                        t, bits_v = _magnitude(v)
                        code, ln = act[(run << 4) | t]
                        writer.put(code, ln)
                        writer.put(bits_v, t)
                        run = 0
                    if last < 63:
                        code, ln = act[0x00]
                        writer.put(code, ln)
    writer.flush()
    out += writer.buf
    out += b"\xff\xd9"
    return bytes(out)

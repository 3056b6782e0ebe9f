"""JPEG codec — pure stdlib + numpy (ITU-T T.81 / JFIF).

The dominant real-web image format (Common Crawl media is overwhelmingly
JPEG), so the image-decode tier of ``stages.multimodal`` gets a REAL
decoder rather than an honest stub: marker parse → Huffman entropy
decode (byte unstuffing, restart markers, DC prediction) → dequantize →
batched 8×8 IDCT (one numpy einsum over all blocks of a component, no
per-block Python IDCT) → chroma upsample → JFIF YCbCr→RGB.

Supported: baseline (SOF0), extended-sequential (SOF1) and
**progressive (SOF2)** Huffman frames — the progressive path implements
all four T.81 Annex G scan types (DC/AC × first/refinement) with
spectral selection bands, successive-approximation bit planes, EOB runs
and non-interleaved single-component scan geometry; multi-scan
sequential (non-interleaved SOF0/1 scans) falls out of the same scan
loop. Grayscale and 3-component YCbCr, any integer chroma sampling
(4:4:4, 4:2:2, 4:2:0, …), restart intervals, multi-segment DQT/DHT.
Arithmetic coding, hierarchical, lossless, 12-bit precision and CMYK
raise ``NotImplementedError`` — the same honest-stub contract as the
other codecs in ``stages/multimodal.py``.

``encode_jpeg`` writes a valid JFIF stream — baseline or, with
``progressive=True``, an SOF2 scan script (interleaved DC first +
refinement, per-component AC spectral bands at two successive-
approximation levels) built from the same Annex K tables — so tests and
planted corpora can synthesize real compressed inputs without any
external library. The decoder is exercised against HAND-BUILT byte
streams with analytically computed pixels (tests/test_jpeg.py), not just
its own encoder, so a shared codec bug cannot self-certify; the
progressive decode path is additionally pinned to produce BIT-IDENTICAL
pixels to the baseline path from the same quantized coefficients.
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
    """Decode a sequential or progressive JPEG to (h, w, c) uint8 —
    c = 1 (gray) or 3 (RGB).

    See module docstring for the supported/stubbed matrix. Malformed
    streams raise ValueError ONLY (parser-level exception families are
    converted) — callers in actor-pool stages rely on that contract.
    """
    try:
        return _decode_jpeg(b)
    except (ValueError, NotImplementedError):
        raise
    except (struct.error, IndexError, KeyError, OverflowError) as e:
        raise ValueError(f"JPEG: malformed stream: {e}") from e


def _decode_jpeg(b: bytes) -> np.ndarray:
    if b[:2] != b"\xff\xd8":
        raise ValueError("JPEG: missing SOI")
    qt: dict[int, np.ndarray] = {}
    hdc: dict[int, _HuffTable] = {}
    hac: dict[int, _HuffTable] = {}
    frame = None
    restart = 0
    scanned = False
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
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            if frame is not None:
                raise ValueError("JPEG: multiple SOF markers")
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
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if hmax < 1 or vmax < 1:
                raise ValueError("JPEG: bad sampling factors")
            if w <= 0 or h <= 0 or w * h > (1 << 26):
                raise ValueError(
                    f"JPEG: implausible dimensions {w}x{h}")
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                # persistent raw (unquantized) coefficient store, zigzag
                # order, rows = blocks of the MCU-padded component grid
                c["bw"] = mcux * c["h"]
                c["coef"] = np.zeros((mcuy * c["v"] * c["bw"], 64),
                                     dtype=np.int64)
                # non-interleaved scan geometry: the component's OWN block
                # grid (T.81 A.2.2), which may be smaller than the padded one
                cw = -(-w * c["h"] // hmax)
                ch = -(-h * c["v"] // vmax)
                c["cbw"] = -(-cw // 8)
                c["cbh"] = -(-ch // 8)
            frame = {"w": w, "h": h, "comps": comps, "hmax": hmax,
                     "vmax": vmax, "mcux": mcux, "mcuy": mcuy,
                     "progressive": m == 0xC2}
        elif m in (0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "JPEG: arithmetic/hierarchical/lossless not in sandbox "
                "(sequential + progressive Huffman decode is real)")
        elif m == 0xDD:  # DRI
            restart = struct.unpack_from(">H", seg, 0)[0]
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            if not 1 <= ns <= len(frame["comps"]):
                raise ValueError("JPEG: bad scan component count")
            scan = []  # (comp, dc_table_id, ac_table_id) in SOS order
            by_id = {c["id"]: c for c in frame["comps"]}
            for k in range(ns):
                cs, tables = seg[1 + 2 * k], seg[2 + 2 * k]
                if cs not in by_id:
                    raise ValueError("JPEG: scan references unknown comp")
                scan.append((by_id[cs], tables >> 4, tables & 15))
            ss, se, ahl = seg[1 + 2 * ns:4 + 2 * ns]
            ah, al = ahl >> 4, ahl & 15
            if not frame["progressive"]:
                ss, se, ah, al = 0, 63, 0, 0  # fields are vestigial here
            i = _decode_sos(b, i + ln, frame, scan, ss, se, ah, al,
                            hdc, hac, restart)
            scanned = True
            continue
        i += ln
    if not scanned:
        raise ValueError("JPEG: no SOS scan found")
    return _finish_frame(frame, qt)


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


def _ac_refine_block(reader, blk, ss, se, al, ac, eobrun):
    """AC successive-approximation refinement for one block (T.81 G.2.2;
    the libjpeg-documented control flow). Returns the updated EOB run."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode(ac)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break  # rest of block handled by the EOB tail below
                newval = 0  # ZRL: pass over 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("JPEG: bad AC refinement symbol")
                newval = p1 if reader.receive(1) else -p1
            # advance over r zero-history coefficients, appending a
            # correction bit to every nonzero-history one passed
            while k <= se:
                c0 = int(blk[k])
                if c0 != 0:
                    if reader.receive(1) and (c0 & p1) == 0:
                        blk[k] = c0 + (p1 if c0 >= 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun:
        # inside an EOB run: only correction bits for already-nonzero
        # coefficients of the remaining band positions
        while k <= se:
            c0 = int(blk[k])
            if c0 != 0 and reader.receive(1) and (c0 & p1) == 0:
                blk[k] = c0 + (p1 if c0 >= 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_sos(b, start, frame, scan, ss, se, ah, al, hdc, hac, restart):
    """Decode one scan's entropy data into the frame's persistent raw
    coefficient stores. Returns the index just past the entropy data.

    Handles interleaved (multi-component, MCU order) and non-interleaved
    (single component, own block grid) geometry, sequential full-band
    decoding, and the four progressive scan types.
    """
    progressive = frame["progressive"]
    mcux = frame["mcux"]
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("JPEG: progressive DC scan must have Se=0")
        if ss > 0 and len(scan) != 1:
            raise ValueError("JPEG: progressive AC scan must be 1-component")
        if se > 63 or ss > se:
            raise ValueError("JPEG: bad spectral band")
    dc_first = ss == 0 and ah == 0
    ac_scan = ss > 0

    # resolve the tables each scan component needs (DC refinement needs none)
    comps = []
    for c, dc_id, ac_id in scan:
        c = dict(c, coef=c["coef"])  # local view; share the store
        if not progressive or dc_first:
            if dc_id not in hdc:
                raise ValueError("JPEG: missing Huffman table")
            c["dct"] = hdc[dc_id]
        if not progressive or ac_scan:
            if ac_id not in hac:
                raise ValueError("JPEG: missing Huffman table")
            c["act"] = hac[ac_id]
        comps.append(c)

    if len(comps) > 1:
        n_units = mcux * frame["mcuy"]
    else:
        n_units = comps[0]["cbw"] * comps[0]["cbh"]

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
        expect = -(-n_units // restart)
        if len(readers) != expect:
            raise ValueError("JPEG: restart segment count mismatch")
    elif len(readers) != 1:
        raise ValueError("JPEG: unexpected restart markers (no DRI)")

    pred = {c["id"]: 0 for c in comps}
    eobrun = 0
    reader = readers[0]
    for unit in range(n_units):
        if restart:
            r_ix, r_off = divmod(unit, restart)
            if r_off == 0:
                reader = readers[r_ix]
                pred = {c["id"]: 0 for c in comps}
                eobrun = 0
        if len(comps) > 1:
            my, mx = divmod(unit, mcux)
            blocks = [(c, (my * c["v"] + by) * c["bw"] + mx * c["h"] + bx)
                      for c in comps
                      for by in range(c["v"]) for bx in range(c["h"])]
        else:
            c = comps[0]
            by, bx = divmod(unit, c["cbw"])
            blocks = [(c, by * c["bw"] + bx)]
        for c, row in blocks:
            blk = c["coef"][row]
            if not progressive:
                t = reader.decode(c["dct"])
                diff = _extend(reader.receive(t), t)
                pred[c["id"]] += diff
                blk[0] = pred[c["id"]]
                k = 1
                while k < 64:
                    rs = reader.decode(c["act"])
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r != 15:
                            break  # EOB
                        k += 16
                        continue
                    k += r
                    if k > 63:
                        raise ValueError("JPEG: AC index overflow")
                    blk[k] = _extend(reader.receive(s), s)
                    k += 1
            elif dc_first:  # DC first scan (G.2.1), point transform Al
                t = reader.decode(c["dct"])
                diff = _extend(reader.receive(t), t)
                pred[c["id"]] += diff
                blk[0] = pred[c["id"]] << al
            elif ss == 0:  # DC refinement: one appended bit per block
                if reader.receive(1):
                    blk[0] = int(blk[0]) | (1 << al)
            elif ah == 0:  # AC first scan with EOB runs (G.2.2)
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = reader.decode(c["act"])
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r < 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.receive(r)
                            break
                        k += 16
                        continue
                    k += r
                    if k > se:
                        raise ValueError("JPEG: AC index overflow")
                    blk[k] = _extend(reader.receive(s), s) << al
                    k += 1
            else:  # AC refinement
                eobrun = _ac_refine_block(reader, blk, ss, se, al,
                                          c["act"], eobrun)
    return end


def _finish_frame(frame, qt):
    """Dequantize the accumulated raw coefficients, run the batched IDCT
    per component, upsample chroma and convert to the output array."""
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    mcuy = frame["mcuy"]
    zz = ZIGZAG
    planes = []
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError("JPEG: missing quant table")
        q = qt[c["tq"]]  # zigzag order, matching the coefficient store
        coef = np.zeros((c["coef"].shape[0], 64), dtype=np.float64)
        coef[:, zz] = c["coef"] * q[None, :]
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


def _emit_ac_first(writer, blk, ss, se, al, act):
    """Emit one block's band for an AC first scan (G.1.2.3): values are
    sign(v)·(|v| >> Al); runs >15 become ZRLs; trailing zeros become EOB0
    (the only EOBn symbol present in the Annex K tables)."""
    r = 0
    for k in range(ss, se + 1):
        v = int(blk[k])
        a = abs(v) >> al
        if a == 0:
            r += 1
            continue
        while r > 15:
            code, ln = act[0xF0]
            writer.put(code, ln)
            r -= 16
        t, bits_v = _magnitude(a if v > 0 else -a)
        code, ln = act[(r << 4) | t]
        writer.put(code, ln)
        writer.put(bits_v, t)
        r = 0
    if r > 0:
        code, ln = act[0x00]
        writer.put(code, ln)


def _emit_ac_refine(writer, blk, ss, se, al, act):
    """Emit one block's band for an AC refinement scan (G.1.2.3 /
    the libjpeg-documented control flow): newly-nonzero coefficients at
    this bit level get an (r,1) symbol + sign bit; already-nonzero ones
    get buffered correction bits emitted after the next symbol."""
    r = 0
    pending: list[int] = []
    for k in range(ss, se + 1):
        v = int(blk[k])
        a = abs(v) >> al
        if a == 0:
            r += 1
            continue
        while r > 15:
            # flush ZRLs for the zero-history run BEFORE buffering this
            # position's bit: the decoder consumes buffered correction bits
            # while advancing through the ZRL span, which ends before here
            code, ln = act[0xF0]
            writer.put(code, ln)
            for bit in pending:
                writer.put(bit, 1)
            pending = []
            r -= 16
        if a > 1:  # nonzero history: correction bit, buffered
            pending.append((abs(v) >> al) & 1)
            continue
        code, ln = act[(r << 4) | 1]
        writer.put(code, ln)
        writer.put(1 if v > 0 else 0, 1)
        for bit in pending:
            writer.put(bit, 1)
        pending = []
        r = 0
    if r > 0 or pending:
        code, ln = act[0x00]  # trailing run folds into EOB0
        writer.put(code, ln)
        for bit in pending:
            writer.put(bit, 1)


def _sos_header(comp_sel: list[tuple[int, int]], ss, se, ah, al) -> bytes:
    ns = len(comp_sel)
    out = b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
    for cid, tt in comp_sel:
        out += struct.pack(">BB", cid, tt)
    return out + bytes([ss, se, (ah << 4) | al])


def encode_jpeg(px: np.ndarray, quality: int = 85, *,
                subsample: bool = False, restart_interval: int = 0,
                progressive: bool = False) -> bytes:
    """Encode (h, w, c) uint8 (c = 1 or 3) as a JFIF JPEG.

    ``subsample=True`` writes 4:2:0 chroma; ``restart_interval`` > 0 emits
    DRI + RSTn markers every that many MCUs (baseline only).
    ``progressive=True`` writes an SOF2 frame with a scan script covering
    all four progressive scan types: interleaved DC first (Al=1) +
    refinement, and per-component AC spectral bands 1–5 / 6–63 first at
    Al=2 followed by two successive-approximation refinement passes.
    """
    if progressive and restart_interval:
        raise ValueError("encode_jpeg: restart markers are baseline-only")
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
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") \
        + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for k in range(nc):
        out += struct.pack(">BBB", k + 1,
                           (samps[k][0] << 4) | samps[k][1], qsel[k])
    huffs = [(0x00, HUFF_DC_LUM), (0x10, HUFF_AC_LUM)]
    if nc == 3:
        huffs += [(0x01, HUFF_DC_CHR), (0x11, HUFF_AC_CHR)]
    for tid, (bits, vals) in huffs:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tid) \
            + bytes(bits) + bytes(vals)
    bw_per_comp = [mcux * s[0] for s in samps]
    if progressive:
        out += _encode_progressive_scans(
            comp_blocks, samps, tsel, w, h, hmax, vmax, mcux, mcuy,
            bw_per_comp, dc_tabs, ac_tabs)
        out += b"\xff\xd9"
        return bytes(out)

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for k in range(nc):
        out += struct.pack(">BB", k + 1, (tsel[k] << 4) | tsel[k])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

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


def _encode_progressive_scans(comp_blocks, samps, tsel, w, h, hmax, vmax,
                              mcux, mcuy, bpl, dc_tabs, ac_tabs) -> bytes:
    """Emit the SOF2 scan script: DC first (interleaved, Al=1) → per-comp
    AC firsts for bands 1–5 / 6–63 at Al=2 → DC refinement → two AC
    refinement passes (Ah=2→Al=1, Ah=1→Al=0) per comp per band."""
    nc = len(comp_blocks)
    out = bytearray()

    def mcu_blocks():
        # interleaved order over the MCU-padded grids of every component
        for mcu in range(mcux * mcuy):
            my, mx = divmod(mcu, mcux)
            for k in range(nc):
                sh, sv = samps[k]
                for by in range(sv):
                    for bx in range(sh):
                        yield k, (my * sv + by) * bpl[k] + mx * sh + bx

    def grid_rows(k):
        # non-interleaved order over the component's OWN block grid
        sh, sv = samps[k]
        cw = -(-w * sh // hmax)
        ch = -(-h * sv // vmax)
        cbw, cbh = -(-cw // 8), -(-ch // 8)
        for by in range(cbh):
            for bx in range(cbw):
                yield by * bpl[k] + bx

    bands = ((1, 5), (6, 63))

    writer = _BitWriter()  # DC first, Al=1
    pred = [0] * nc
    for k, row in mcu_blocks():
        val = int(comp_blocks[k][row][0]) >> 1
        diff = val - pred[k]
        pred[k] = val
        t, bits_v = _magnitude(diff)
        code, ln = dc_tabs[tsel[k]][t]
        writer.put(code, ln)
        writer.put(bits_v, t)
    writer.flush()
    out += _sos_header([(k + 1, tsel[k] << 4) for k in range(nc)], 0, 0, 0, 1)
    out += writer.buf

    for k in range(nc):  # AC firsts, Al=2
        for ss, se in bands:
            writer = _BitWriter()
            for row in grid_rows(k):
                _emit_ac_first(writer, comp_blocks[k][row], ss, se, 2,
                               ac_tabs[tsel[k]])
            writer.flush()
            out += _sos_header([(k + 1, tsel[k])], ss, se, 0, 2)
            out += writer.buf

    writer = _BitWriter()  # DC refinement, Ah=1 → Al=0: raw bits only
    for k, row in mcu_blocks():
        writer.put(int(comp_blocks[k][row][0]) & 1, 1)
    writer.flush()
    out += _sos_header([(k + 1, 0) for k in range(nc)], 0, 0, 1, 0)
    out += writer.buf

    for ah, al in ((2, 1), (1, 0)):  # AC refinements
        for k in range(nc):
            for ss, se in bands:
                writer = _BitWriter()
                for row in grid_rows(k):
                    _emit_ac_refine(writer, comp_blocks[k][row], ss, se, al,
                                    ac_tabs[tsel[k]])
                writer.flush()
                out += _sos_header([(k + 1, tsel[k])], ss, se, ah, al)
                out += writer.buf
    return bytes(out)

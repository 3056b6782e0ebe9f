"""Baseline JPEG codec (stages/jpeg.py): the decoder is verified against
HAND-BUILT byte streams with analytically computed pixels (spec formula
reimplemented with plain loops here — no shared code with the codec), so
an encoder/decoder bug pair cannot self-certify; then encoder↔decoder
roundtrips cover sampling modes, restart markers and edge dimensions."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from nightcrawlercmd_ray.stages.jpeg import decode_jpeg, encode_jpeg


def _huff_segment(table_id: int, counts16: list[int], values: list[int]):
    body = bytes([table_id]) + bytes(counts16) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _hand_built_gray(entropy: bytes, ac_values: list[int]):
    """Minimal 8×8 grayscale baseline stream: q=1 everywhere, DC table =
    one 2-bit code for category 6, AC table = 2-bit codes for
    ``ac_values`` in canonical order."""
    b = bytearray(b"\xff\xd8")
    b += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([1] * 64)
    b += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + b"\x01\x11\x00"
    dc_counts = [0] * 16
    dc_counts[1] = 1  # one code of length 2
    b += _huff_segment(0x00, dc_counts, [6])
    ac_counts = [0] * 16
    ac_counts[1] = len(ac_values)
    b += _huff_segment(0x10, ac_counts, ac_values)
    b += b"\xff\xda" + struct.pack(">HB", 8, 1) + b"\x01\x00\x00\x3f\x00"
    b += entropy
    b += b"\xff\xd9"
    return bytes(b)


def _spec_idct(coef88):
    """T.81 A.3.3 inverse DCT, plain loops — the independent reference."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    au = 1 / math.sqrt(2) if u == 0 else 1.0
                    av = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (au * av * coef88[u][v]
                          * math.cos((2 * x + 1) * u * math.pi / 16)
                          * math.cos((2 * y + 1) * v * math.pi / 16))
            out[x, y] = s / 4 + 128.0
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def test_hand_built_dc_only_flat_block():
    """DC diff 48 (category 6, bits '110000'), AC = immediate EOB:
    every pixel is round(48/8 + 128) = 134."""
    # bits: DC code '00', value '110000', EOB '00' → 0011000000 + 6 pad 1s
    stream = _hand_built_gray(bytes([0b00110000, 0b00111111]), [0x00])
    px = decode_jpeg(stream)
    assert px.shape == (8, 8, 1)
    assert (px == 134).all()


def test_hand_built_single_ac_cosine_pattern():
    """DC 48 plus AC +24 at zigzag index 1 (natural u=0, v=1): the decoded
    block must equal the spec IDCT computed independently with loops. The
    17-bit stream pads to a 0xFF byte, so this also pins byte UNstuffing
    (the hand-built entropy data carries a stuffed 0xFF 0x00)."""
    # AC table: 2-bit codes, canonical order: '00'→0x05 (run 0, size 5),
    # '01'→0x00 (EOB). bits: 00 110000 | 00 11000 | 01 → 17 bits + 7 pad
    # 1s → bytes 0x30 0x30 0xFF, the 0xFF stuffed with 0x00
    stream = _hand_built_gray(bytes([0x30, 0x30, 0xFF, 0x00]), [0x05, 0x00])
    px = decode_jpeg(stream)[:, :, 0]
    coef = [[0.0] * 8 for _ in range(8)]
    coef[0][0] = 48.0
    coef[0][1] = 24.0
    expected = _spec_idct(coef)
    assert (px == expected).all()
    # the v=1 basis varies across COLUMNS, constant down rows
    assert (px[0] == px[3]).all() and not (px[:, 0] == px[:, 3]).all()


@pytest.mark.parametrize("quality,subsample,rst", [
    (95, False, 0), (85, True, 0), (75, True, 3), (95, False, 2),
])
def test_roundtrip_color(quality, subsample, rst):
    h, w = 40, 56
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(yy * 3) % 256, (xx * 2) % 256,
                    ((xx + yy) * 2) % 256], -1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=quality, subsample=subsample,
                                  restart_interval=rst))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 3.0 and err.max() <= 24


def test_roundtrip_gray_and_odd_dimensions():
    h, w = 19, 27  # forces partial edge MCUs
    yy, xx = np.mgrid[0:h, 0:w]
    g = ((yy * 5 + xx * 2) % 256).astype(np.uint8)[:, :, None]
    out = decode_jpeg(encode_jpeg(g, quality=92))
    assert out.shape == (h, w, 1)
    assert np.abs(out.astype(int) - g.astype(int)).mean() < 2.0


def test_restart_markers_do_not_change_pixels():
    """Same input/quality with and without DRI: identical quantized
    coefficients → bit-identical decoded pixels."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    a = decode_jpeg(encode_jpeg(img, quality=80, subsample=True))
    b = decode_jpeg(encode_jpeg(img, quality=80, subsample=True,
                                restart_interval=1))
    assert (a == b).all()


def test_420_subsampling_is_declared_and_smaller():
    yy, xx = np.mgrid[0:64, 0:64]
    img = np.stack([yy, xx, (yy + xx) // 2], -1).astype(np.uint8)
    full = encode_jpeg(img, quality=85, subsample=False)
    sub = encode_jpeg(img, quality=85, subsample=True)
    assert len(sub) < len(full)
    # SOF0 sampling byte of component 1 is 0x22 in the 4:2:0 stream
    sof = sub.index(b"\xff\xc0")
    assert sub[sof + 11] == 0x22
    assert full[full.index(b"\xff\xc0") + 11] == 0x11


def test_arithmetic_and_garbage_rejected():
    arith = (b"\xff\xd8\xff\xc9" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
             + b"\x01\x11\x00")
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(arith)
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xda\x00\x04\x00\x00")
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    # truncated entropy data
    img = np.zeros((8, 8, 1), np.uint8)
    full = encode_jpeg(img, quality=90)
    with pytest.raises(ValueError):
        decode_jpeg(full[:len(full) - 6] + b"\xff\xd9")


def test_decode_image_dispatches_jpeg():
    from nightcrawlercmd_ray.stages.multimodal import decode_image

    yy, xx = np.mgrid[0:16, 0:16]
    img = np.stack([yy * 8, xx * 8, np.full_like(yy, 7)], -1).astype(np.uint8)
    px = decode_image(encode_jpeg(img, quality=95))
    assert px.shape == (16, 16, 3)
    assert np.abs(px.astype(int) - img.astype(int)).mean() < 2.0


# ---------------------------------------------------------------------------
# progressive (SOF2)
# ---------------------------------------------------------------------------
class _TestBits:
    """Independent MSB-first bit packer (byte stuffing included)."""

    def __init__(self):
        self.bits = []

    def put(self, value, length):
        for i in range(length - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def bytes(self):
        bits = self.bits + [1] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for b in bits[i:i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        return bytes(out)


def _sos(comp_sel, ss, se, ah, al):
    body = bytes([len(comp_sel)])
    for cid, tt in comp_sel:
        body += bytes([cid, tt])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


def test_hand_built_progressive_four_scan_types():
    """8×8 gray, q=1, DC=49 and AC(zigzag 1)=25 delivered over four scans
    (DC first Al=1 → AC first Al=1 → DC refinement → AC refinement with an
    EOB-run correction bit): decoded pixels must equal the independent
    spec IDCT of those exact coefficients. The DC-refinement scan's
    entropy byte is 0xFF, pinning byte stuffing on the progressive path."""
    b = bytearray(b"\xff\xd8")
    b += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([1] * 64)
    b += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + b"\x01\x11\x00"
    dc_counts = [0] * 16
    dc_counts[1] = 1  # one 2-bit code → category 5
    b += _huff_segment(0x00, dc_counts, [5])
    ac_counts = [0] * 16
    ac_counts[1] = 2  # two 2-bit codes: '00'→0x04 (run 0 size 4), '01'→EOB0
    b += _huff_segment(0x10, ac_counts, [0x04, 0x00])

    w = _TestBits()          # scan 1: DC first, Al=1 → value 49>>1 = 24
    w.put(0b00, 2)           # DC category-5 code
    w.put(24, 5)
    b += _sos([(1, 0x00)], 0, 0, 0, 1) + w.bytes()

    w = _TestBits()          # scan 2: AC first, Al=1 → value 25>>1 = 12
    w.put(0b00, 2)           # symbol 0x04
    w.put(12, 4)
    w.put(0b01, 2)           # EOB0
    b += _sos([(1, 0x00)], 1, 63, 0, 1) + w.bytes()

    w = _TestBits()          # scan 3: DC refinement → appended bit 49&1 = 1
    w.put(1, 1)
    b += _sos([(1, 0x00)], 0, 0, 1, 0)
    scan3 = w.bytes()
    assert scan3 == b"\xff\x00"  # 1-bit + pad-1s = 0xFF → must be stuffed
    b += scan3

    w = _TestBits()          # scan 4: AC refinement → EOB0 + correction 25&1
    w.put(0b01, 2)
    w.put(1, 1)
    b += _sos([(1, 0x00)], 1, 63, 1, 0) + w.bytes()
    b += b"\xff\xd9"

    px = decode_jpeg(bytes(b))[:, :, 0]
    coef = [[0.0] * 8 for _ in range(8)]
    coef[0][0] = 49.0
    coef[0][1] = 25.0
    assert (px == _spec_idct(coef)).all()


def test_hand_built_progressive_eob_run_spans_blocks():
    """16×8 gray, two blocks, both DC=48: the AC-first scan is a single
    EOB1 symbol with one appended bit (run = 2 blocks) — pins the EOBn
    decode path the Annex K tables can't express. No refinement scans, so
    the Al=1 approximation must still reconstruct 24<<1 = 48 exactly:
    every pixel round(48/8 + 128) = 134."""
    b = bytearray(b"\xff\xd8")
    b += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([1] * 64)
    b += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 16, 1) + b"\x01\x11\x00"
    dc_counts = [0] * 16
    dc_counts[1] = 2  # canonical 2-bit codes: '00'→cat 0, '01'→cat 5
    b += _huff_segment(0x00, dc_counts, [0, 5])
    ac_counts = [0] * 16
    ac_counts[0] = 1  # one 1-bit code: '0'→EOB1 (symbol 0x10)
    b += _huff_segment(0x10, ac_counts, [0x10])

    w = _TestBits()          # DC first, Al=1: diffs 24, 0
    w.put(0b01, 2)
    w.put(24, 5)
    w.put(0b00, 2)
    b += _sos([(1, 0x00)], 0, 0, 0, 1) + w.bytes()

    w = _TestBits()          # AC first: EOB1, appended bit 0 → run of 2
    w.put(0, 1)
    w.put(0, 1)
    b += _sos([(1, 0x00)], 1, 63, 0, 1) + w.bytes()
    b += b"\xff\xd9"

    px = decode_jpeg(bytes(b))
    assert px.shape == (8, 16, 1)
    assert (px == 134).all()


@pytest.mark.parametrize("quality,subsample", [
    (95, False), (80, True), (70, False), (85, True),
])
def test_progressive_matches_baseline_bit_identical(quality, subsample):
    """Same quantized coefficients, two completely different scan
    encodings and decode paths → bit-identical pixels. Random noise
    exercises ZRL runs, all magnitude categories, newly-nonzero vs
    correction-bit refinement and both spectral bands."""
    rng = np.random.default_rng(11)
    for shape in ((8, 8, 1), (19, 27, 1), (40, 56, 3), (33, 17, 3)):
        img = rng.integers(0, 256, shape).astype(np.uint8)
        base = decode_jpeg(
            encode_jpeg(img, quality=quality, subsample=subsample))
        prog = decode_jpeg(
            encode_jpeg(img, quality=quality, subsample=subsample,
                        progressive=True))
        assert (base == prog).all(), shape


def test_progressive_smooth_image_close_to_source():
    yy, xx = np.mgrid[0:48, 0:32]
    img = np.stack([(yy * 4) % 256, (xx * 5) % 256,
                    ((xx + yy) * 3) % 256], -1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=92, progressive=True))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 3.0


def test_progressive_rejects_restart_interval():
    with pytest.raises(ValueError, match="baseline-only"):
        encode_jpeg(np.zeros((8, 8, 1), np.uint8), progressive=True,
                    restart_interval=2)

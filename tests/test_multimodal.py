"""Multimodal plumbing: frame-sample expansion math, resize stage shape,
feature determinism — plus the REAL uncompressed-format decode tier
(PPM/PGM/BMP images, PCM WAV audio, Y4M video). Compressed codecs remain
stubbed (no codec libraries in sandbox) and must raise clearly when decode
is required."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray


def _media(ids, durs):
    from nightcrawlercmd_ray.stages.multimodal import MEDIA_SCHEMA

    n = len(ids)
    return ray.data.from_arrow(pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "kind": pa.array(["video"] * n, pa.string()),
        "mime": pa.array(["video/mp4"] * n, pa.string()),
        "payload": pa.array([b"x" * i for i in range(n)], pa.binary()),
        "width": pa.array([None] * n, pa.int32()),
        "height": pa.array([None] * n, pa.int32()),
        "duration_ms": pa.array(durs, pa.int32()),
    }, schema=MEDIA_SCHEMA))


def test_sample_frames_expansion():
    from nightcrawlercmd_ray.stages.multimodal import sample_frames

    # 10s @ 1fps → 10 frames; 500ms → floor 0 → min 1 frame; 200s → capped 64
    out = sample_frames(_media([1, 2, 3], [10_000, 500, 200_000]), fps=1.0)
    df = out.to_pandas().sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    counts = df.groupby("media_id").size().to_dict()
    assert counts == {1: 10, 2: 1, 3: 64}
    f1 = df[df.media_id == 1]
    assert f1["frame_idx"].tolist() == list(range(10))
    # frames spread evenly: frame k at k/want * duration
    assert f1["ts_ms"].tolist() == [k * 10_000 // 10 for k in range(10)]
    assert df[df.media_id == 2]["ts_ms"].tolist() == [0]
    f3 = df[df.media_id == 3]
    assert f3["ts_ms"].max() < 200_000 and f3["ts_ms"].is_monotonic_increasing


def test_sample_frames_null_duration():
    from nightcrawlercmd_ray.stages.multimodal import sample_frames

    out = sample_frames(_media([7], [None]), fps=2.0).to_pandas()
    assert out["frame_idx"].tolist() == [0] and out["ts_ms"].tolist() == [0]


def test_resize_stage_shape_and_determinism():
    from nightcrawlercmd_ray.stages.multimodal import resize_images

    ds = _media([1, 2, 3, 4], [0, 0, 0, 0])
    a = resize_images(ds, width=64, height=48).to_pandas().sort_values("media_id")
    b = resize_images(ds, width=64, height=48).to_pandas().sort_values("media_id")
    assert (a["width"] == 64).all() and (a["height"] == 48).all()
    assert a["resized_digest"].tolist() == b["resized_digest"].tolist()
    assert a["resized_digest"].nunique() == 4  # distinct payloads → distinct digests


def test_real_decode_raises():
    """fake=False = decode REQUIRED: an undecodable (compressed/garbage)
    payload raises at call time; compressed video stays stubbed."""
    from nightcrawlercmd_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        ImageResizeStage,
        MediaFeatureStage,
        decode_image,
        decode_video_frame,
    )

    with pytest.raises(NotImplementedError):
        decode_image(b"")
    with pytest.raises(NotImplementedError):
        decode_video_frame(b"", 0)
    bad = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "kind": pa.array(["image"]),
        "mime": pa.array(["image/png"]),
        "payload": pa.array([b"\x89PNG garbage"], pa.binary()),
        "width": pa.array([None], pa.int32()),
        "height": pa.array([None], pa.int32()),
        "duration_ms": pa.array([None], pa.int32()),
    }, schema=MEDIA_SCHEMA)
    with pytest.raises(NotImplementedError):
        MediaFeatureStage(fake=False)(bad)
    with pytest.raises(NotImplementedError):
        ImageResizeStage(fake=False)(bad)


# --------------------------------------------------------------------------- #
# real decode path (uncompressed formats; compressed stays stubbed)
# --------------------------------------------------------------------------- #
import struct

import numpy as np
import pytest

from nightcrawlercmd_ray.stages.multimodal import (
    decode_image,
    encode_ppm,
    extract_media_features,
    pixel_features,
    resize_images,
    resize_nearest,
)


def _bmp24(px: np.ndarray) -> bytes:
    """Minimal BI_RGB 24-bpp bottom-up BMP encoder (test-side oracle)."""
    h, w = px.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = b"".join(
        px[y, :, [2, 1, 0]].T.astype(np.uint8).tobytes().ljust(stride, b"\0")
        for y in range(h - 1, -1, -1)
    )
    header = b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows),
                      2835, 2835, 0, 0)
    return header + dib + rows


def _px(seed=0, h=6, w=8):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (h, w, 3), dtype=np.uint8)


def test_decode_ppm_roundtrip_and_comments():
    px = _px(1)
    assert (decode_image(encode_ppm(px)) == px).all()
    # header comments + odd whitespace are part of the PNM spec
    b = b"P6 # c\n# full line comment\n 8\t6\n255\n" + px.tobytes()
    assert (decode_image(b) == px).all()


def test_decode_pgm():
    g = np.arange(24, dtype=np.uint8).reshape(4, 6, 1)
    b = b"P5\n6 4\n255\n" + g.tobytes()
    assert (decode_image(b) == g).all()


def test_decode_bmp24_matches_ppm_pixels():
    px = _px(2)
    assert (decode_image(_bmp24(px)) == px).all()


def test_decode_compressed_still_stubbed():
    # sequential AND progressive JPEG are REAL now (stages/jpeg.py);
    # arithmetic coding stays a stub, a truncated JPEG is CORRUPT, and an
    # all-zero-chunk PNG is CORRUPT, not a stub
    import struct as st

    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xc9"
                     + st.pack(">HBHHB", 11, 8, 8, 8, 1) + b"\x01\x11\x00")
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\0" * 64)  # truncated JPEG
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\0" * 64)
    with pytest.raises(NotImplementedError):
        decode_image(b"")


# ---- PNG: real decode (stdlib zlib + spec defiltering) --------------------
def _png_encode(px: np.ndarray, filters: list[int]) -> bytes:
    """From-spec PNG encoder (test-side reference): 8-bit, non-interlaced,
    one explicit filter type per scanline."""
    import struct as st
    import zlib

    h, w, c = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (st.pack(">I", len(data)) + typ + data
                + st.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int64)
    for y in range(h):
        row = px[y].reshape(-1).astype(np.int64)
        f = filters[y % len(filters)]
        raw.append(f)
        filt = np.empty(w * c, dtype=np.int64)
        for x in range(w * c):
            a = row[x - c] if x >= c else 0
            b_ = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b_
            elif f == 3:
                pred = (a + b_) // 2
            else:  # Paeth
                p = a + b_ - cc
                pa_, pb, pc_ = abs(p - a), abs(p - b_), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc_) else \
                    (b_ if pb <= pc_ else cc)
            filt[x] = (row[x] - pred) % 256
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = row
    ihdr = st.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_decode_png_all_filters_roundtrip(c):
    rng = np.random.RandomState(7 + c)
    px = rng.randint(0, 256, size=(10, 7, c), dtype=np.uint8)
    # every filter type exercised, including runs of the sequential ones
    out = decode_image(_png_encode(px, [0, 1, 2, 3, 4, 4, 3, 1, 2, 0]))
    assert out.shape == px.shape and (out == px).all()


def test_decode_png_known_vector():
    # hand-checkable 2×2 RGB: filter 1 (Sub) on row 0, filter 2 (Up) on row 1
    px = np.array([[[10, 20, 30], [15, 25, 35]],
                   [[110, 120, 130], [115, 125, 135]]], dtype=np.uint8)
    b = _png_encode(px, [1, 2])
    assert (decode_image(b) == px).all()
    # multiple IDAT chunks are concatenated per spec
    import struct as st
    import zlib
    one = _png_encode(px, [0, 0])
    sig, rest = one[:8], one[8:]
    ln, = st.unpack(">I", rest[:4])
    ihdr, idat_onwards = rest[:12 + ln], rest[12 + ln:]
    ln2, = st.unpack(">I", idat_onwards[:4])
    idat_data = idat_onwards[8:8 + ln2]
    mid = len(idat_data) // 2

    def chunk(typ, data):
        return (st.pack(">I", len(data)) + typ + data
                + st.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    two = (sig + ihdr + chunk(b"IDAT", idat_data[:mid])
           + chunk(b"IDAT", idat_data[mid:]) + chunk(b"IEND", b""))
    assert (decode_image(two) == px).all()


def test_decode_png_formerly_stubbed_variants_now_real():
    """16-bit and Adam7 streams DECODE now; a palette image without its
    PLTE is corrupt (ValueError), not a stub; an illegal depth/color-type
    combo is rejected."""
    import struct as st
    import zlib

    def chunk(typ, data):
        return (st.pack(">I", len(data)) + typ + data
                + st.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    def png(depth, ctype, ilace, raw):
        ihdr = st.pack(">IIBBBBB", 2, 2, depth, ctype, 0, 0, ilace)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b""))

    assert decode_image(png(16, 0, 0, b"\0" * 16)).shape == (2, 2, 1)
    assert decode_image(png(8, 2, 1, b"\0" * 32)).shape == (2, 2, 3)
    with pytest.raises(ValueError, match="PLTE"):
        decode_image(png(8, 3, 0, b"\0" * 8))
    with pytest.raises(ValueError, match="illegal"):
        decode_image(png(4, 2, 0, b"\0" * 8))


def test_pixel_features_solid_color():
    px = np.zeros((4, 10, 3), np.uint8)
    px[:, :, 0] = 255  # solid red
    f = pixel_features(px, 8)
    assert f[0] == 10 / 4096.0 and f[1] == 4 / 4096.0
    assert f[2:5] == [1.0, 0.0, 0.0]
    assert f[7] == 1.0  # max


def test_resize_nearest_checkerboard():
    px = np.array([[[0], [255]], [[255], [0]]], np.uint8)
    out = resize_nearest(px, 4, 4)
    assert out[0, 0, 0] == 0 and out[0, 3, 0] == 255
    assert (out[:2, :2, 0] == 0).all() and (out[2:, 2:, 0] == 0).all()


def test_auto_mode_end_to_end_encoding_invariant(media_ds_factory=None):
    """Same pixels as PPM and as BMP must produce the SAME resized digest
    (digest depends on decoded pixels, not on the container format); a
    garbage payload falls back to fake with decoded=False."""
    import ray

    from nightcrawlercmd_ray.stages.multimodal import MEDIA_SCHEMA

    px = _px(3)
    payloads = [encode_ppm(px), _bmp24(px), b"not an image"]
    t = pa.table({
        "media_id": pa.array([1, 2, 3], pa.int64()),
        "kind": pa.array(["image"] * 3),
        "mime": pa.array(["image/x-portable-pixmap", "image/bmp",
                          "application/octet-stream"]),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array([None] * 3, pa.int32()),
        "height": pa.array([None] * 3, pa.int32()),
        "duration_ms": pa.array([None] * 3, pa.int32()),
    }, schema=MEDIA_SCHEMA)
    ds = ray.data.from_arrow(t)
    rs = resize_images(ds, width=4, height=4, fake="auto").to_pandas()
    rs = rs.set_index("media_id")
    assert rs.loc[1, "decoded"] and rs.loc[2, "decoded"]
    assert not rs.loc[3, "decoded"]
    assert rs.loc[1, "resized_digest"] == rs.loc[2, "resized_digest"]
    assert rs.loc[3, "resized_digest"] != rs.loc[1, "resized_digest"]

    ft = extract_media_features(ds, fake="auto").to_pandas().set_index("media_id")
    f1, f2 = list(ft.loc[1, "features"]), list(ft.loc[2, "features"])
    assert f1 == f2  # same pixels → same real features
    assert ft.loc[1, "decoded"] and not ft.loc[3, "decoded"]


def test_decode_wav_roundtrip_and_features():
    from nightcrawlercmd_ray.stages.multimodal import (
        audio_features,
        decode_audio,
        encode_wav,
    )

    t = np.arange(8000) / 8000.0
    sig = np.stack([np.sin(2 * np.pi * 440 * t),
                    0.5 * np.sin(2 * np.pi * 220 * t)], axis=1)
    samples, rate = decode_audio(encode_wav(sig, 8000))
    assert rate == 8000 and samples.shape == (8000, 2)
    assert np.abs(samples - sig).max() < 1e-3  # 16-bit quantization only

    f = audio_features(samples, rate, 8)
    assert abs(f[0] - 1.0 / 3600.0) < 1e-9   # 1 second
    assert f[1] == 2 / 8.0                   # stereo
    # mono mix = (sin440 + 0.5·sin220)/2 → rms = sqrt(0.15625) ≈ 0.3953
    assert abs(f[2] - 0.3953) < 0.002
    # 8-bit unsigned path
    s8 = b"RIFF" + __import__("struct").pack("<I", 4 + 24 + 8 + 4) + b"WAVE" \
        + b"fmt " + __import__("struct").pack("<IHHIIHH", 16, 1, 1, 100, 100, 1, 8) \
        + b"data" + __import__("struct").pack("<I", 4) + bytes([128, 255, 0, 128])
    mono, r = decode_audio(s8)
    assert r == 100 and mono.shape == (4, 1)
    assert abs(mono[1, 0] - 127 / 128) < 1e-6 and mono[0, 0] == 0.0

    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x03mp3 data...")


def test_g711_luts_match_stdlib_audioop_all_codes():
    """The spec-built μ-law/A-law expansion tables must agree with stdlib
    audioop (an independent G.711 implementation) on every code byte."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    from nightcrawlercmd_ray.stages.multimodal import _ALAW_LUT, _ULAW_LUT

    all_codes = bytes(range(256))
    exp_u = np.frombuffer(audioop.ulaw2lin(all_codes, 2), "<i2")
    exp_a = np.frombuffer(audioop.alaw2lin(all_codes, 2), "<i2")
    assert (np.asarray(_ULAW_LUT) == exp_u).all()
    assert (np.asarray(_ALAW_LUT) == exp_a).all()


def test_decode_g711_wav():
    import struct as st

    from nightcrawlercmd_ray.stages.multimodal import _ULAW_LUT, decode_audio

    def wav(fmt_code: int, payload: bytes, ch: int = 1) -> bytes:
        return (b"RIFF" + st.pack("<I", 4 + 24 + 8 + len(payload)) + b"WAVE"
                + b"fmt " + st.pack("<IHHIIHH", 16, fmt_code, ch, 8000,
                                    8000 * ch, ch, 8)
                + b"data" + st.pack("<I", len(payload)) + payload)

    codes = bytes([0x00, 0x7F, 0x80, 0xFF, 0x55, 0xAA])
    for fmt_code in (6, 7):
        x, r = decode_audio(wav(fmt_code, codes))
        assert r == 8000 and x.shape == (6, 1)
        assert np.abs(x).max() <= 1.0
    # μ-law 0xFF is positive zero, 0x7F negative zero, 0x00 neg full-scale
    xu, _ = decode_audio(wav(7, codes))
    assert xu[3, 0] == _ULAW_LUT[0xFF] / 32768.0 == 0.0
    assert xu[1, 0] == 0.0
    assert xu[0, 0] < -0.9
    # stereo interleave preserved
    xs, _ = decode_audio(wav(7, codes, ch=2))
    assert xs.shape == (3, 2)
    # ADPCM (format 17) stays a stub
    with pytest.raises(NotImplementedError):
        decode_audio(wav(17, codes))


def test_audio_auto_mode_in_feature_stage():
    import ray

    from nightcrawlercmd_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        encode_wav,
        extract_media_features,
    )

    wav = encode_wav(np.sin(np.arange(400) / 10.0), 4000)
    t = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "kind": pa.array(["audio", "audio"]),
        "mime": pa.array(["audio/wav", "audio/mpeg"]),
        "payload": pa.array([wav, b"not audio"], pa.binary()),
        "width": pa.array([None] * 2, pa.int32()),
        "height": pa.array([None] * 2, pa.int32()),
        "duration_ms": pa.array([None] * 2, pa.int32()),
    }, schema=MEDIA_SCHEMA)
    ft = extract_media_features(ray.data.from_arrow(t), fake="auto") \
        .to_pandas().set_index("media_id")
    assert ft.loc[1, "decoded"] and not ft.loc[2, "decoded"]
    assert abs(ft.loc[1, "features"][1] - 1 / 8.0) < 1e-6  # mono


def test_decode_y4m_video_frame():
    from nightcrawlercmd_ray.stages.multimodal import decode_video_frame

    w, h = 4, 2
    frames = []
    for k in range(3):
        y = np.full((h, w), 10 * k, np.uint8)
        uv = np.zeros((h // 2) * (w // 2) * 2, np.uint8)
        frames.append(b"FRAME\n" + y.tobytes() + uv.tobytes())
    b = b"YUV4MPEG2 W4 H2 F2:1 Ip A1:1 C420\n" + b"".join(frames)
    # 2 fps → frame k covers [500k, 500k+500) ms
    assert decode_video_frame(b, 0)[0, 0, 0] == 0
    assert decode_video_frame(b, 600)[0, 0, 0] == 10
    assert decode_video_frame(b, 1400)[0, 0, 0] == 20
    assert decode_video_frame(b, 999)[0, 0, 0] == 10
    with pytest.raises(ValueError):
        decode_video_frame(b, 5000)  # past end
    with pytest.raises(NotImplementedError):
        decode_video_frame(b"\x00\x00\x00\x18ftypmp42...", 0)


def test_decode_sampled_frames_stage():
    from nightcrawlercmd_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        decode_sampled_frames,
    )

    def y4m(n_frames, w=4, h=2, base=0):
        parts = [b"YUV4MPEG2 W%d H%d F4:1 C420\n" % (w, h)]
        for k in range(n_frames):
            y = np.full((h, w), base + k, np.uint8)
            uv = np.zeros((h // 2) * (w // 2) * 2, np.uint8)
            parts.append(b"FRAME\n" + y.tobytes() + uv.tobytes())
        return b"".join(parts)

    t = pa.table({
        "media_id": pa.array([1, 2, 3], pa.int64()),
        "kind": pa.array(["video"] * 3),
        "mime": pa.array(["video/x-y4m", "video/x-y4m", "video/mp4"]),
        "payload": pa.array([y4m(8), y4m(2, base=100), b"mp4 junk"],
                            pa.binary()),
        "width": pa.array([None] * 3, pa.int32()),
        "height": pa.array([None] * 3, pa.int32()),
        "duration_ms": pa.array([None] * 3, pa.int32()),
    }, schema=MEDIA_SCHEMA)
    df = (decode_sampled_frames(ray.data.from_arrow(t), max_frames=4)
          .to_pandas().sort_values(["media_id", "frame_idx"]))
    counts = df.groupby("media_id").size().to_dict()
    assert counts == {1: 4, 2: 2}  # capped at 4; short video full; mp4 none
    m1 = df[df.media_id == 1]
    assert m1["frame_idx"].tolist() == [0, 2, 4, 6]  # evenly spread over 8
    assert m1["luma_mean"].tolist() == [0.0, 2.0, 4.0, 6.0]
    assert m1["ts_ms"].tolist() == [0, 500, 1000, 1500]  # 4 fps
    assert df[df.media_id == 2]["luma_mean"].tolist() == [100.0, 101.0]


def test_decode_bmp_stride_padding_and_shapes():
    """Widths whose 3-byte rows aren't 4-aligned exercise the stride math;
    property-checked over random shapes, plus 32-bpp and top-down forms."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.integers(1, 13), st.integers(1, 9), st.integers(0, 10**6))
    def prop(w, h, seed):
        px = np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)
        assert (decode_image(_bmp24(px)) == px).all()

    prop()

    # 32-bpp top-down (negative height)
    px = _px(7, h=3, w=5)
    rgba = np.dstack([px, np.full(px.shape[:2], 9, np.uint8)])
    rows = rgba[:, :, [2, 1, 0, 3]].tobytes()  # top-down: no flip
    header = b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 5, -3, 1, 32, 0, len(rows),
                      2835, 2835, 0, 0)
    out = decode_image(header + dib + rows)
    assert out.shape == (3, 5, 4)
    assert (out[:, :, :3] == px).all() and (out[:, :, 3] == 9).all()


def test_feature_stage_routes_video_to_y4m_decoder():
    """ADVICE r2: kind=='video' payloads must go through the Y4M path, not
    decode_image — fake=False on decodable Y4M must decode, and fake='auto'
    must yield REAL luma features (decoded=True), not the hash fallback."""
    from nightcrawlercmd_ray.stages.multimodal import MediaFeatureStage

    def y4m(w=4, h=2, val=200):
        y = np.full((h, w), val, np.uint8)
        uv = np.zeros((h // 2) * (w // 2) * 2, np.uint8)
        return (b"YUV4MPEG2 W%d H%d F4:1 C420\n" % (w, h)
                + b"FRAME\n" + y.tobytes() + uv.tobytes())

    t = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "kind": pa.array(["video"], pa.string()),
        "payload": pa.array([y4m()], pa.binary()),
    })
    out = MediaFeatureStage(fake=False)(t)  # must NOT raise
    assert out.column("decoded").to_pylist() == [True]
    f = out.column("features").to_pylist()[0]
    assert abs(f[2] - 200 / 255.0) < 1e-6  # real luma mean, grayscale-replicated

    auto = MediaFeatureStage(fake="auto")(t)
    assert auto.column("decoded").to_pylist() == [True]
    assert auto.column("features").to_pylist()[0] == f


# ---- PNG: palette / sub-byte / 16-bit / Adam7 tiers -----------------------
def _png_chunks(ihdr_body: bytes, extra: list[tuple[bytes, bytes]],
                raw: bytes) -> bytes:
    import struct as st
    import zlib as zl

    def chunk(typ, data):
        body = typ + data
        return st.pack(">I", len(data)) + body + st.pack(
            ">I", zl.crc32(body))

    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr_body)
    for typ, data in extra:
        out += chunk(typ, data)
    out += chunk(b"IDAT", zl.compress(raw)) + chunk(b"IEND", b"")
    return out


def _ihdr(w, h, depth, ctype, ilace=0):
    import struct as st

    return st.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, ilace)


def test_png_palette_with_and_without_trns():
    rng = np.random.default_rng(5)
    plte = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, (6, 9)).astype(np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(6))
    png = _png_chunks(_ihdr(9, 6, 8, 3), [(b"PLTE", plte.tobytes())], raw)
    got = decode_image(png)
    assert got.shape == (6, 9, 3)
    assert (got == plte[idx]).all()
    trns = np.array([10, 255, 128], np.uint8)
    png_a = _png_chunks(_ihdr(9, 6, 8, 3),
                        [(b"PLTE", plte.tobytes()), (b"tRNS", trns.tobytes())],
                        raw)
    got_a = decode_image(png_a)
    assert got_a.shape == (6, 9, 4)
    alpha = np.full(256, 255, np.uint8)
    alpha[:3] = trns
    assert (got_a[:, :, 3] == alpha[idx]).all()
    assert (got_a[:, :, :3] == plte[idx]).all()


def test_png_4bit_palette_packing():
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    # 5 px/row at 4 bits → 3 bytes: indices 0,1,2,1,0 → 0x01 0x21 0x00
    row = bytes([0x01, 0x21, 0x00])
    raw = (b"\x00" + row) * 2
    png = _png_chunks(_ihdr(5, 2, 4, 3), [(b"PLTE", plte.tobytes())], raw)
    got = decode_image(png)
    expected = plte[np.array([0, 1, 2, 1, 0])]
    assert (got == expected[None, :, :]).all()


def test_png_1bit_and_2bit_gray_scaling():
    # 1-bit: 10110000 → 255,0,255,255 then zeros; exact ×255 scaling
    raw = b"\x00" + bytes([0b10110000])
    png = _png_chunks(_ihdr(8, 1, 1, 0), [], raw)
    got = decode_image(png)[0, :, 0]
    assert got.tolist() == [255, 0, 255, 255, 0, 0, 0, 0]
    # 2-bit: values 0..3 scale by 85
    raw2 = b"\x00" + bytes([0b00011011])
    png2 = _png_chunks(_ihdr(4, 1, 2, 0), [], raw2)
    assert decode_image(png2)[0, :, 0].tolist() == [0, 85, 170, 255]


def test_png_16bit_reduces_to_high_byte():
    px16 = np.array([[0x1234, 0xFF01], [0x0080, 0xABCD]], np.uint16)
    raw = b"".join(b"\x00" + px16[y].astype(">u2").tobytes()
                   for y in range(2))
    png = _png_chunks(_ihdr(2, 2, 16, 0), [], raw)
    got = decode_image(png)
    assert (got[:, :, 0] == (px16 >> 8).astype(np.uint8)).all()


def test_png_adam7_matches_non_interlaced():
    """Serialize the same RGB image both ways (test-side pass slicing —
    independent of the decoder's pass table) and require identical
    pixels."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (13, 11, 3)).astype(np.uint8)
    plain_raw = b"".join(b"\x00" + px[y].tobytes() for y in range(13))
    plain = _png_chunks(_ihdr(11, 13, 8, 2), [], plain_raw)
    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    # the 7 passes must tile the grid exactly once — guards the pass table
    cover = np.zeros((13, 11), np.int32)
    for x0, y0, dx, dy in passes:
        cover[y0::dy, x0::dx] += 1
    assert (cover == 1).all()
    parts = []
    for x0, y0, dx, dy in passes:
        sub = px[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for y in range(sub.shape[0]):
            parts.append(b"\x00" + sub[y].tobytes())
    inter = _png_chunks(_ihdr(11, 13, 8, 2, ilace=1), [], b"".join(parts))
    a, b_ = decode_image(plain), decode_image(inter)
    assert (a == px).all() and (b_ == px).all()


# ---- IMA ADPCM WAV tier ---------------------------------------------------
def _ima_reference_decode(raw, channels, block_align):
    """Plain-Python spec IMA ADPCM decoder — independent reference."""
    step_tbl = [int(v) for v in
                __import__("nightcrawlercmd_ray.stages.multimodal",
                           fromlist=["_IMA_STEP"])._IMA_STEP]
    idx_tbl = [-1, -1, -1, -1, 2, 4, 6, 8]
    out = []
    ba = block_align
    for b0 in range(0, len(raw) - ba + 1, ba):
        block = raw[b0:b0 + ba]
        preds, idxs = [], []
        for c in range(channels):
            p = int.from_bytes(block[4 * c:4 * c + 2], "little",
                               signed=True)
            preds.append(p)
            idxs.append(block[4 * c + 2])
        samples = [[p] for p in preds]
        data = block[4 * channels:]
        nibbles = [[] for _ in range(channels)]
        for g in range(len(data) // (4 * channels)):
            for c in range(channels):
                for k in range(4):
                    byte = data[(g * channels + c) * 4 + k]
                    nibbles[c] += [byte & 0xF, byte >> 4]
        for t in range(len(nibbles[0])):
            for c in range(channels):
                n = nibbles[c][t]
                step = step_tbl[idxs[c]]
                diff = step >> 3
                if n & 4:
                    diff += step
                if n & 2:
                    diff += step >> 1
                if n & 1:
                    diff += step >> 2
                p = preds[c] + (-diff if n & 8 else diff)
                p = max(-32768, min(32767, p))
                preds[c] = p
                idxs[c] = max(0, min(88, idxs[c] + idx_tbl[n & 7]))
                samples[c].append(p)
        for t in range(len(samples[0])):
            out.append([samples[c][t] for c in range(channels)])
    return np.array(out, np.int16)


@pytest.mark.parametrize("channels", [1, 2])
def test_ima_adpcm_matches_reference_decoder(channels):
    from nightcrawlercmd_ray.stages.multimodal import (
        _ima_adpcm_decode,
        encode_wav_adpcm,
    )

    t = np.arange(1400) / 8000.0
    sig = 0.6 * np.sin(2 * np.pi * 440 * t)
    s = np.stack([sig] * channels, 1) if channels > 1 else sig[:, None]
    if channels == 2:
        s[:, 1] = 0.3 * np.cos(2 * np.pi * 220 * t)
    wav = encode_wav_adpcm(s, 8000, samples_per_block=505)
    # locate the data chunk and compare the vectorized decoder against the
    # plain-Python reference bit-for-bit
    di = wav.index(b"data")
    size = int.from_bytes(wav[di + 4:di + 8], "little")
    raw = wav[di + 8:di + 8 + size]
    ba = 4 * channels + 252 * channels
    fast = _ima_adpcm_decode(raw, channels, ba)
    ref = _ima_reference_decode(raw, channels, ba)
    assert fast.shape == ref.shape
    assert (fast == ref).all()


def test_ima_adpcm_roundtrip_through_decode_audio():
    from nightcrawlercmd_ray.stages.multimodal import (
        decode_audio,
        encode_wav_adpcm,
    )

    t = np.arange(2525) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 300 * t)
    wav = encode_wav_adpcm(sig, 16000)
    samples, rate = decode_audio(wav)
    assert rate == 16000 and samples.shape[1] == 1
    got = samples[: len(sig), 0].astype(np.float64)
    err = np.abs(got - sig)
    assert err.mean() < 0.01 and err.max() < 0.1


# ---- GIF tier (LZW, interlace, transparency) ------------------------------
def test_gif_lzw_hand_vector():
    """Hand-derived stream, independent of the encoder: pixels [1,1,1,1]
    at min_code=2 → codes CLEAR(4), 1, (1,1)=6, 1, END(5), 3 bits each,
    LSB-first → 4 + 1·2³ + 6·2⁶ + 1·2⁹ + 5·2¹² = 0x538C."""
    from nightcrawlercmd_ray.stages.multimodal import _gif_lzw_decode

    assert _gif_lzw_decode(bytes([0x8C, 0x53]), 2, 4) == [1, 1, 1, 1]


def test_gif_roundtrip_plain_interlaced_and_growth():
    from nightcrawlercmd_ray.stages.multimodal import _decode_gif, encode_gif

    rng = np.random.default_rng(13)
    # 256 distinct colors over 60k pixels: LZW table crosses every width
    # boundary and the 12-bit clear/reset path
    base = np.unique(rng.integers(0, 256, (256, 3)).astype(np.uint8), axis=0)
    idx = rng.integers(0, len(base), (150, 200))
    px = base[idx]
    assert (_decode_gif(encode_gif(px)) == px).all()
    assert (_decode_gif(encode_gif(px, interlace=True)) == px).all()


def test_gif_transparency_and_dispatch():
    from nightcrawlercmd_ray.stages.multimodal import encode_gif

    px = np.zeros((5, 4, 3), np.uint8)
    px[2, 1] = [9, 8, 7]
    out = decode_image(encode_gif(px, transparent=0))
    assert out.shape == (5, 4, 4)
    assert out[0, 0, 3] == 0 and out[2, 1, 3] == 255
    assert (out[2, 1, :3] == [9, 8, 7]).all()


def test_gif_garbage_rejected():
    from nightcrawlercmd_ray.stages.multimodal import _decode_gif

    with pytest.raises(ValueError):
        _decode_gif(b"GIF89a" + b"\x00" * 4)
    with pytest.raises(ValueError):
        decode_image(b"GIF89a" + b"\x00" * 64)


# ---------------------------------------------------------------------------
# round-5 tiers: IEEE-float WAV, 16-bit PNM, MJPEG-in-AVI video
# ---------------------------------------------------------------------------
def test_decode_float_wav():
    import struct as st

    from nightcrawlercmd_ray.stages.multimodal import decode_audio

    sig = (0.25 * np.sin(np.arange(200) / 9.0)).astype("<f4")
    for bits, arr in ((32, sig), (64, sig.astype("<f8"))):
        fmt = st.pack("<HHIIHH", 3, 1, 16000, 16000 * bits // 8,
                      bits // 8, bits)
        body = (b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
                + b"data" + st.pack("<I", arr.nbytes) + arr.tobytes())
        x, rate = decode_audio(b"RIFF" + st.pack("<I", len(body)) + body)
        assert rate == 16000 and x.shape == (200, 1)
        assert np.allclose(x[:, 0], sig, atol=1e-6)
    # out-of-range float samples are clipped, stereo keeps channel order
    raw = np.array([2.5, -2.5, 0.5, -0.5], "<f4")
    fmt = st.pack("<HHIIHH", 3, 2, 8000, 8000 * 8, 8, 32)
    body = (b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
            + b"data" + st.pack("<I", raw.nbytes) + raw.tobytes())
    x, _ = decode_audio(b"RIFF" + st.pack("<I", len(body)) + body)
    assert x.shape == (2, 2)
    assert x.tolist() == [[1.0, -1.0], [0.5, -0.5]]


def test_decode_16bit_pnm():
    # big-endian 16-bit samples scale to uint8 by round(v*255/maxval)
    g = (np.arange(12) * 5000).astype(">u2").reshape(3, 4)
    out = decode_image(b"P5\n4 3\n65535\n" + g.tobytes())
    exp = ((g.astype(np.uint32) * 255 + 32767) // 65535).astype(np.uint8)
    assert out.shape == (3, 4, 1) and (out[:, :, 0] == exp).all()
    rgb = (np.arange(24) * 2500).astype(">u2").reshape(2, 4, 3)
    out = decode_image(b"P6\n4 2\n65535\n" + rgb.tobytes())
    exp = ((rgb.astype(np.uint32) * 255 + 32767) // 65535).astype(np.uint8)
    assert out.shape == (2, 4, 3) and (out == exp).all()
    # non-power maxval (1000): full-scale maps to 255
    v = np.array([[0, 500, 1000]], ">u2")
    out = decode_image(b"P5\n3 1\n1000\n" + v.tobytes())
    assert out[:, :, 0].tolist() == [[0, 128, 255]]
    with pytest.raises(ValueError):
        decode_image(b"P5\n4 3\n65535\n" + b"\x00" * 10)  # truncated


def test_decode_avi_mjpeg_frames():
    from nightcrawlercmd_ray.stages.multimodal import (
        _parse_avi,
        decode_video_frame,
        encode_avi_mjpeg,
    )

    frames = [np.full((16, 24, 3), 40 * i + 10, np.uint8) for i in range(5)]
    avi = encode_avi_mjpeg(frames, fps=10.0, quality=95)
    micro, offs = _parse_avi(avi)
    assert micro == 100000 and len(offs) == 5
    for i in range(5):
        y = decode_video_frame(avi, ts_ms=i * 100)
        assert y.shape == (16, 24, 1)
        # flat gray RGB → luma ≈ the gray level at high quality
        assert abs(float(y.mean()) - (40 * i + 10)) < 3.0
    with pytest.raises(ValueError):
        decode_video_frame(avi, ts_ms=600)  # past last frame
    # a non-MJPEG stream in an AVI stays an honest stub
    bad = avi.replace(b"\xff\xd8", b"\x00\x00", 1)
    with pytest.raises(NotImplementedError, match="MJPEG"):
        decode_video_frame(bad, ts_ms=0)


def test_frame_decode_stage_handles_avi(ray_session):
    from nightcrawlercmd_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        decode_sampled_frames,
        encode_avi_mjpeg,
    )

    avi = encode_avi_mjpeg(
        [np.full((8, 8, 1), 20 * i, np.uint8) for i in range(8)], fps=4.0)
    t = pa.table({
        "media_id": pa.array([7, 8], pa.int64()),
        "kind": pa.array(["video"] * 2),
        "mime": pa.array(["video/avi", "video/mp4"]),
        "payload": pa.array([avi, b"mp4 junk"], pa.binary()),
        "width": pa.array([None] * 2, pa.int32()),
        "height": pa.array([None] * 2, pa.int32()),
        "duration_ms": pa.array([None] * 2, pa.int32()),
    }, schema=MEDIA_SCHEMA)
    df = (decode_sampled_frames(ray.data.from_arrow(t), max_frames=4)
          .to_pandas().sort_values("frame_idx"))
    assert df["media_id"].unique().tolist() == [7]
    assert df["frame_idx"].tolist() == [0, 2, 4, 6]
    assert df["ts_ms"].tolist() == [0, 500, 1000, 1500]  # 4 fps
    assert df["width"].tolist() == [8] * 4
    lum = df["luma_mean"].tolist()
    assert all(abs(lum[k] - 40 * k) < 3.0 for k in range(4))


def test_decoders_raise_only_valueerror_on_malformed_payloads():
    """Actor-pool stages catch exactly (ValueError, NotImplementedError);
    any other exception type escaping a malformed payload would kill the
    stage actor mid-pipeline. Fuzz all three decoders with noise,
    magic-prefixed noise, truncations and byte-flips of valid streams —
    a trimmed in-suite version of the 12k-call sweep that found (and now
    pins) struct.error / zlib.error / IndexError / OverflowError leaks
    and unbounded header-dimension allocations."""
    from nightcrawlercmd_ray.stages.jpeg import encode_jpeg
    from nightcrawlercmd_ray.stages.multimodal import (
        decode_audio,
        decode_image,
        decode_video_frame,
        encode_avi_mjpeg,
        encode_gif,
        encode_png,
        encode_wav,
        encode_wav_adpcm,
    )

    rng = np.random.default_rng(77)
    px = rng.integers(0, 256, (9, 7, 3)).astype(np.uint8)
    sig = 0.2 * np.sin(np.arange(300) / 5.0)
    valid = [
        encode_jpeg(px, quality=80),
        encode_jpeg(px, quality=80, progressive=True),
        encode_png(px),
        encode_gif(px),
        encode_wav(sig, 8000),
        encode_wav_adpcm(sig, 8000),
        encode_avi_mjpeg([px, px], fps=5.0),
    ]
    magics = [b"\xff\xd8", b"\x89PNG\r\n\x1a\n", b"GIF89a", b"P6\n",
              b"P5\n", b"BM", b"RIFFxxxxWAVE", b"RIFFxxxxAVI ",
              b"YUV4MPEG2"]

    def rand_bytes(n):
        return rng.integers(0, 256, n, dtype=np.uint8).tobytes()

    for trial in range(600):
        kind = trial % 4
        if kind == 0:
            b = rand_bytes(int(rng.integers(0, 200)))
        elif kind == 1:
            b = magics[int(rng.integers(0, len(magics)))] \
                + rand_bytes(int(rng.integers(0, 200)))
        elif kind == 2:
            v = valid[int(rng.integers(0, len(valid)))]
            b = v[: int(rng.integers(0, len(v)))]
        else:
            v = bytearray(valid[int(rng.integers(0, len(valid)))])
            for _ in range(int(rng.integers(1, 6))):
                v[int(rng.integers(0, len(v)))] = int(rng.integers(0, 256))
            b = bytes(v)
        for dec in (lambda: decode_image(b), lambda: decode_audio(b),
                    lambda: decode_video_frame(b, 100)):
            try:
                dec()
            except (ValueError, NotImplementedError):
                pass  # the only allowed failure modes


def test_implausible_header_dimensions_rejected():
    import struct as st

    from nightcrawlercmd_ray.stages.jpeg import decode_jpeg

    # PNM header demanding a 10^12-pixel allocation
    with pytest.raises(ValueError, match="implausible"):
        decode_image(b"P5\n1000000 1000000\n255\n" + b"\x00" * 64)
    # PNG with u32 dimensions near the max
    ihdr = st.pack(">IIBBBBB", 2**31, 2**31, 8, 0, 0, 0, 0)
    chunk = st.pack(">I", len(ihdr)) + b"IHDR" + ihdr + b"\x00" * 4
    with pytest.raises(ValueError, match="implausible"):
        decode_image(b"\x89PNG\r\n\x1a\n" + chunk + b"\x00" * 32)
    # JPEG SOF claiming 65535x65535 (4.3G pixels of block storage)
    sof = st.pack(">HBHHB", 11, 8, 65535, 65535, 1) + b"\x01\x11\x00"
    with pytest.raises(ValueError, match="implausible"):
        decode_jpeg(b"\xff\xd8\xff\xc0" + sof)

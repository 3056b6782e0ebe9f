"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool stages.

Decode support is format-tiered: UNCOMPRESSED formats (PPM/PGM, BI_RGB BMP),
full-spec **PNG** (stdlib zlib inflate + scanline defiltering — every legal
depth/color-type incl. palette+tRNS and Adam7), baseline + progressive
**JPEG** (``stages/jpeg.py`` — full Huffman entropy decode, all four SOF2
scan types), **GIF**, PCM + G.711 + IMA-ADPCM **WAV** and uncompressed
**Y4M** video decode for real in pure stdlib+numpy — features and resize
below operate on actual pixels/samples for them. The
remaining COMPRESSED codecs (mp3/aac, mp4/h264/vp9, webp) are
STUBBED (this container ships no codec libs — marked explicitly below); a
real deployment plugs Pillow/libvips/PyAV into the same stage signatures.
Everything Ray-side is real and tested either way: schema, batch sizing for
large binary payloads, actor signature, deterministic fallback features for
undecodable payloads.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..functions.urlnorm import hash64

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("mime", pa.string()),
        ("payload", pa.binary()),
        ("width", pa.int32()),  # typed metadata (nullable)
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def _parse_pnm_header(b: bytes):
    """(magic, width, height, maxval, data_offset) for P5/P6 — tokens
    separated by whitespace, '#' comments, one whitespace byte before data."""
    toks, i, n = [], 2, len(b)
    while len(toks) < 3 and i < n:
        c = b[i:i + 1]
        if c == b"#":
            j = b.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not b[j:j + 1].isspace() and b[j:j + 1] != b"#":
                j += 1
            toks.append(b[i:j])
            i = j
    if len(toks) < 3 or i >= n:
        raise ValueError("truncated PNM header")
    return int(toks[0]), int(toks[1]), int(toks[2]), i + 1


_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# Decoders run inside actor-pool stages that catch exactly ValueError /
# NotImplementedError; any other exception type escaping on a malformed
# payload would kill the stage actor. The guard converts the parser-level
# exception families to ValueError, and MAX_DECODE_PIXELS bounds what an
# adversarial header can make us allocate (a 100 TB crawl WILL contain
# pathological media): 2^26 px = 8K x 8K, ~0.5 GB peak through the float
# intermediates — above that a real deployment routes to an out-of-band
# decode service, same as the codec stubs.
MAX_DECODE_PIXELS = 1 << 26


def _check_dims(w: int, h: int, what: str) -> None:
    if w <= 0 or h <= 0 or w * h > MAX_DECODE_PIXELS:
        raise ValueError(f"{what}: implausible dimensions {w}x{h}")


def _malformed_guard(fn):
    import functools
    import struct as _st
    import zlib as _zl

    @functools.wraps(fn)
    def wrapped(*a, **kw):
        try:
            return fn(*a, **kw)
        except (ValueError, NotImplementedError):
            raise
        except (_st.error, _zl.error, IndexError, KeyError,
                OverflowError) as e:
            raise ValueError(f"malformed media payload: {e}") from e
    return wrapped



def _png_defilter(raw: bytes, h: int, stride: int, bpp: int,
                  offset: int) -> np.ndarray:
    """Reconstruct ``h`` scanlines of ``stride`` bytes from filtered data
    starting at ``offset`` (RFC 2083 §6): None/Up/Sub are vectorized (Sub
    is a wrap-around uint8 cumsum over ``bpp`` lanes); Average/Paeth rows
    walk bytes (left-neighbor data dependency). → (h, stride) uint8."""
    if len(raw) - offset < h * (stride + 1):
        raise ValueError("PNG: truncated scanline data")
    lines = np.frombuffer(raw, np.uint8, h * (stride + 1),
                          offset).reshape(h, stride + 1)
    filters = lines[:, 0]
    data = lines[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        row = data[y]
        if f == 0:
            rec = row.copy()
        elif f == 2:  # Up
            rec = row + prev  # uint8 wrap == mod 256 per spec
        elif f == 1:  # Sub: recon[x] = row[x] + recon[x-bpp] → lane cumsum
            rec = row.copy().reshape(-1, bpp)
            np.add.accumulate(rec, axis=0, out=rec)  # uint8 wraps
            rec = rec.reshape(-1)
        elif f == 3:  # Average
            rec = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                ul = int(prev[x - bpp]) if x >= bpp else 0
                p = a + up - ul
                pa_, pb, pc_ = abs(p - a), abs(p - up), abs(p - ul)
                pred = a if (pa_ <= pb and pa_ <= pc_) else \
                    (up if pb <= pc_ else ul)
                rec[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG: bad filter type {f}")
        out[y] = rec
        prev = rec
    return out


# Adam7 pass grid: (x0, y0, dx, dy) per RFC 2083 §2.6
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_samples(rows: np.ndarray, w: int, depth: int,
                 nchan: int) -> np.ndarray:
    """(h, stride) defiltered bytes → (h, w, nchan) raw sample values
    (uint8; 16-bit samples are reduced to their high byte, the standard
    8-bit presentation)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * nchan].reshape(h, w, nchan)
    if depth == 16:
        return rows[:, : w * nchan * 2].reshape(h, w, nchan, 2)[..., 0]
    # sub-byte depths: single-channel only (gray or palette indices)
    bits = np.unpackbits(rows, axis=1)[:, : w * depth]
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (bits.reshape(h, w, depth) * weights).sum(
        axis=2).astype(np.uint8)
    return vals[:, :, None]


def _decode_png(b: bytes) -> np.ndarray:
    """Real PNG decode, pure stdlib zlib + numpy (RFC 2083): every legal
    bit depth (1/2/4/8/16 — 16-bit reduced to the high byte) and color
    type — 0 (gray), 2 (RGB), 3 (palette, with optional tRNS alpha),
    4 (gray+alpha), 6 (RGBA) — both non-interlaced and Adam7 interlaced
    (each pass defiltered independently and scattered onto the output
    grid). Defiltering: see :func:`_png_defilter`."""
    import struct as _struct
    import zlib

    pos, w = 8, None
    idat = []
    plte = None
    trns = None
    while pos + 8 <= len(b):
        (ln,), typ = _struct.unpack_from(">I", b, pos), b[pos + 4:pos + 8]
        chunk = b[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # len + type + data + crc
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = _struct.unpack(
                ">IIBBBBB", chunk)
            allowed = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                       4: (8, 16), 6: (8, 16)}
            if ctype not in allowed or depth not in allowed[ctype]:
                raise ValueError("PNG: illegal depth/color-type combo")
            if ilace not in (0, 1):
                raise ValueError("PNG: bad interlace method")
            c = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
            _check_dims(w, h, "PNG")
        elif typ == b"PLTE":
            plte = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif typ == b"tRNS":
            trns = np.frombuffer(chunk, np.uint8)
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG: missing IHDR/IDAT")
    passes = _ADAM7 if ilace else ((0, 0, 1, 1),)
    # exact filtered-scanline byte count from the header — inflate AT MOST
    # that much, so an IDAT decompression bomb cannot bypass the
    # MAX_DECODE_PIXELS allocation bound (a 2 MB payload could otherwise
    # demand multi-GB)
    need = 0
    for x0, y0, dx, dy in passes:
        wp = -(-(w - x0) // dx) if w > x0 else 0
        hp = -(-(h - y0) // dy) if h > y0 else 0
        if wp > 0 and hp > 0:
            need += hp * ((wp * c * depth + 7) // 8 + 1)
    raw = zlib.decompressobj().decompress(b"".join(idat), need)

    out = np.zeros((h, w, c), dtype=np.uint8)
    offset = 0
    for x0, y0, dx, dy in passes:
        wp = -(-(w - x0) // dx) if w > x0 else 0
        hp = -(-(h - y0) // dy) if h > y0 else 0
        if wp <= 0 or hp <= 0:
            continue
        stride = (wp * c * depth + 7) // 8
        bpp = max(1, c * depth // 8)
        rows = _png_defilter(raw, hp, stride, bpp, offset)
        offset += hp * (stride + 1)
        out[y0::dy, x0::dx] = _png_samples(rows, wp, depth, c)

    if ctype == 3:
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        idx = out[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("PNG: palette index out of range")
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(256, 255, np.uint8)
            alpha[: len(trns)] = trns
            return np.concatenate([rgb, alpha[idx][:, :, None]], axis=2)
        return rgb
    if ctype == 0 and depth < 8:
        out = out * np.uint8(255 // ((1 << depth) - 1))  # exact for 1/2/4
    return out


def _gif_lzw_decode(data: bytes, min_code: int, expected: int) -> list[int]:
    """GIF variable-width LZW (LSB-first bit packing, 12-bit cap, clear /
    end codes, deferred-clear tolerant). → color-index list."""
    clear = 1 << min_code
    end = clear + 1
    base = [(i,) for i in range(clear)] + [None, None]
    table: list[tuple[int, ...] | None] = list(base)
    width = min_code + 1
    out: list[int] = []
    acc = nbits = 0
    prev: tuple[int, ...] | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code] if code < len(table) else None
                if entry is None:
                    raise ValueError("GIF: bad initial LZW code")
            elif code < len(table) and table[code] is not None:
                entry = table[code]
                table.append(prev + (entry[0],))
            elif code == len(table):
                entry = prev + (prev[0],)  # KwKwK case
                table.append(entry)
            else:
                raise ValueError("GIF: LZW code out of range")
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= expected:
                return out
    return out


def _gif_lzw_encode(indices, min_code: int) -> bytes:
    """Real LZW compression (dict growth to 12 bits, clear on overflow),
    inverse of :func:`_gif_lzw_decode`; used by ``encode_gif``."""
    clear = 1 << min_code
    end = clear + 1
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = min_code + 1
    put(clear, width)
    prev: tuple[int, ...] = ()
    for px in indices:
        cand = prev + (int(px),)
        if cand in table:
            prev = cand
            continue
        put(table[prev], width)
        table[cand] = next_code
        next_code += 1
        # width must grow exactly when the DECODER's table reaches 2^width
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        elif next_code == (1 << 12) + 1:
            put(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code + 1
        prev = (int(px),)
    if prev:
        put(table[prev], width)
    put(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # interlace (start, step)


def _decode_gif(b: bytes) -> np.ndarray:
    """GIF87a/89a first frame (GIF 89a spec / CompuServe 87a): LZW decode,
    global/local palette, interlace, GCE transparency → RGB / RGBA."""
    if len(b) < 13:
        raise ValueError("GIF: truncated header")
    packed = b[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        if pos + 3 * n > len(b):
            raise ValueError("GIF: truncated global color table")
        gct = np.frombuffer(b, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    transparent = None
    while pos < len(b):
        bt = b[pos]
        pos += 1
        if bt == 0x21:  # extension: label + sub-blocks
            label = b[pos]
            pos += 1
            first = True
            while pos < len(b):
                sz = b[pos]
                pos += 1
                if sz == 0:
                    break
                if first and label == 0xF9 and sz >= 4 and (b[pos] & 1):
                    transparent = b[pos + 3]
                first = False
                pos += sz
        elif bt == 0x2C:  # image descriptor
            _, _, w, h, ip = struct.unpack_from("<HHHHB", b, pos)
            _check_dims(w, h, "GIF")
            pos += 9
            ct = gct
            if ip & 0x80:
                n = 2 << (ip & 7)
                ct = np.frombuffer(b, np.uint8, 3 * n, pos).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF: no color table")
            min_code = b[pos]
            pos += 1
            if not (2 <= min_code <= 11):
                raise ValueError("GIF: bad LZW min code size")
            data = bytearray()
            while pos < len(b):
                sz = b[pos]
                pos += 1
                if sz == 0:
                    break
                data += b[pos:pos + sz]
                pos += sz
            idx = _gif_lzw_decode(bytes(data), min_code, w * h)
            if len(idx) < w * h:
                raise ValueError("GIF: truncated image data")
            arr = np.array(idx[: w * h], np.uint16).reshape(h, w)
            if int(arr.max(initial=0)) >= len(ct):
                raise ValueError("GIF: color index out of range")
            arr = arr.astype(np.uint8)
            if ip & 0x40:  # interlace: stored rows are in pass order
                rows = [r for s, st in _GIF_PASSES for r in range(s, h, st)]
                out = np.empty_like(arr)
                out[np.array(rows, np.int64)] = arr
                arr = out
            rgb = ct[arr]
            if transparent is not None:
                alpha = np.where(arr == transparent, 0, 255).astype(np.uint8)
                return np.concatenate([rgb, alpha[:, :, None]], axis=2)
            return rgb
        elif bt == 0x3B:
            break
        else:
            raise ValueError(f"GIF: unknown block 0x{bt:02x}")
    raise ValueError("GIF: no image block")


def encode_gif(px: np.ndarray, *, interlace: bool = False,
               transparent: int | None = None) -> bytes:
    """(h, w, 3) uint8 → GIF89a with an exact palette built from the
    image's distinct colors (≤256 required — synthesized test/corpus
    images, not a quantizer). Real LZW compression; optional interlace
    and GCE transparency index."""
    px = np.asarray(px, np.uint8)
    h, w, _ = px.shape
    flat = px.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif: >256 distinct colors")
    bits = max(1, int(len(colors) - 1).bit_length())
    n = 1 << bits
    palette = np.zeros((n, 3), np.uint8)
    palette[: len(colors)] = colors
    idx = inverse.reshape(h, w).astype(np.uint8)
    if interlace:
        rows = [r for s, st in _GIF_PASSES for r in range(s, h, st)]
        stored = idx[np.array(rows, np.int64)]
    else:
        stored = idx
    min_code = max(2, bits)
    lzw = _gif_lzw_encode(stored.reshape(-1), min_code)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
    out += palette.tobytes()
    if transparent is not None:
        out += b"\x21\xf9\x04" + bytes([1, 0, 0, transparent]) + b"\x00"
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h,
                                 0x40 if interlace else 0)
    out += bytes([min_code])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


@_malformed_guard
def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an (h, w, c) uint8 array.

    Real in-sandbox support (pure stdlib + numpy): binary PPM (``P6``,
    c=3), binary PGM (``P5``, c=1), BI_RGB BMP at 24/32 bpp (bottom-up or
    top-down), full-spec **PNG** (any legal depth/color-type incl. palette
    with tRNS and Adam7 interlace — see ``_decode_png``), baseline
    sequential AND progressive **JPEG** (full Huffman entropy decode,
    restart markers, any integer chroma sampling, all four SOF2
    progressive scan types — see ``stages/jpeg.py``), and **GIF** (LZW,
    interlace, transparency — first frame). Anything else (WebP, 16-bit
    PNM, …) raises ``NotImplementedError``: a real deployment plugs
    Pillow/libvips here and the surrounding Ray plumbing is unchanged."""
    b = bytes(payload or b"")
    if b[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(b)
    if b[:8] == _PNG_SIG:
        return _decode_png(b)
    if b[:2] in (b"P6", b"P5"):
        w, h, maxval, off = _parse_pnm_header(b)
        _check_dims(w, h, "PNM")
        if not 0 < maxval < 65536:
            raise ValueError("PNM: bad maxval")
        c = 3 if b[:2] == b"P6" else 1
        if maxval > 255:  # 16-bit samples, big-endian per the PNM spec
            need = w * h * c * 2
            if len(b) - off < need:
                raise ValueError("truncated PNM data")
            x = np.frombuffer(b, ">u2", w * h * c, off).astype(np.uint32)
            x = (x * 255 + maxval // 2) // maxval
            return np.clip(x, 0, 255).astype(np.uint8).reshape(h, w, c)
        need = w * h * c
        if len(b) - off < need:
            raise ValueError("truncated PNM data")
        return np.frombuffer(b, np.uint8, need, off).reshape(h, w, c)
    if b[:2] == b"BM" and len(b) >= 54:
        data_off, = struct.unpack_from("<I", b, 10)
        w, h_signed = struct.unpack_from("<ii", b, 18)
        bpp, = struct.unpack_from("<H", b, 28)
        comp, = struct.unpack_from("<I", b, 30)
        if comp != 0 or bpp not in (24, 32) or w <= 0 or h_signed == 0:
            raise NotImplementedError("only BI_RGB 24/32-bpp BMP supported")
        h = abs(h_signed)
        _check_dims(w, h, "BMP")
        c = bpp // 8
        stride = (w * c + 3) & ~3
        if len(b) - data_off < stride * h:
            raise ValueError("truncated BMP data")
        rows = np.frombuffer(b, np.uint8, stride * h, data_off)
        px = rows.reshape(h, stride)[:, : w * c].reshape(h, w, c)
        if h_signed > 0:
            px = px[::-1]  # bottom-up storage
        return px[:, :, [2, 1, 0]] if c == 3 else px[:, :, [2, 1, 0, 3]]
    raise NotImplementedError(
        "image codec not in sandbox (PPM/PGM/BMP/PNG/JPEG/GIF decode "
        "is real)")


def encode_png(px: np.ndarray) -> bytes:
    """Encode an (h, w, c) uint8 array as a valid non-interlaced 8-bit PNG
    (filter type 0 on every scanline, one zlib-compressed IDAT) — pure
    stdlib. Round-trips through ``_decode_png`` and any standard viewer."""
    import struct as _struct
    import zlib

    h, w, c = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (_struct.pack(">I", len(data)) + typ + data
                + _struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    ihdr = _struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def encode_ppm(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM bytes (the inverse of decode_image's
    PPM path; used by the resize stage's re-encode and by tests)."""
    h, w = px.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()


def pixel_features(px: np.ndarray, feature_dim: int) -> list[float]:
    """Deterministic real-pixel feature vector: [w/4096, h/4096, mean_r,
    mean_g, mean_b (each /255; grayscale replicated), std/255, min/255,
    max/255], zero-padded/truncated to ``feature_dim``."""
    h, w = px.shape[:2]
    chans = px.reshape(h * w, -1).astype(np.float64)
    means = chans.mean(axis=0) / 255.0
    if len(means) == 1:
        means = np.repeat(means, 3)
    f = [w / 4096.0, h / 4096.0, *means[:3],
         float(chans.std() / 255.0),
         float(chans.min() / 255.0), float(chans.max() / 255.0)]
    f = f[:feature_dim] + [0.0] * max(0, feature_dim - len(f))
    return f


def _fake_features(b: bytes, feature_dim: int) -> list[float]:
    h = hash64(b)
    return [((h >> (8 * (i % 8))) & 0xFF) / 255.0 for i in range(feature_dim)]


class MediaFeatureStage:
    """Actor-pool stage: media batches → per-item feature rows.

    ``fake`` modes: ``True`` (hash-seeded pseudo-features — stable tests,
    zero decode), ``"auto"`` (REAL pixel features via :func:`decode_image`
    for the uncompressed formats it supports, hash fallback for the rest),
    ``False`` (decode required; undecodable payloads raise). The actor/batch
    shape is identical in all modes (small ``batch_size``, one codec init
    per actor in ``__init__``)."""

    def __init__(self, feature_dim: int = 8, fake: bool | str = True):
        self.feature_dim = feature_dim
        self.fake = fake

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("media_id").to_pylist()
        kinds = t.column("kind").to_pylist()
        payloads = t.column("payload").to_pylist()
        feats, sizes, decoded = [], [], []
        for p, kind in zip(payloads, kinds):
            b = bytes(p or b"")
            sizes.append(len(b))
            if self.fake is True:
                feats.append(_fake_features(b, self.feature_dim))
                decoded.append(False)
                continue
            try:
                if kind == "audio":
                    samples, rate = decode_audio(b)
                    feats.append(audio_features(samples, rate,
                                                self.feature_dim))
                elif kind == "video":
                    # Y4M luma plane of frame 0 — videos must NOT route
                    # through decode_image (which always raises on Y4M,
                    # crashing fake=False batches of decodable videos and
                    # silently hash-faking fake='auto' ones — ADVICE r2)
                    px = decode_video_frame(b, 0)
                    feats.append(pixel_features(px, self.feature_dim))
                else:
                    px = decode_image(b)
                    feats.append(pixel_features(px, self.feature_dim))
                decoded.append(True)
            except (NotImplementedError, ValueError):
                if self.fake is False:
                    raise
                feats.append(_fake_features(b, self.feature_dim))
                decoded.append(False)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "n_bytes": pa.array(sizes, pa.int64()),
                "features": pa.array(feats, pa.list_(pa.float32())),
                "decoded": pa.array(decoded, pa.bool_()),
            }
        )


def extract_media_features(ds, *, feature_dim: int = 8, concurrency: int = 2,
                           batch_size: int = 16, fake: bool | str = True):
    """Large binary payloads ⇒ SMALL batches (batch × concurrency must fit a
    worker heap) — the sizing rule a real decoder inherits."""
    return ds.map_batches(
        MediaFeatureStage,
        fn_constructor_kwargs={"feature_dim": feature_dim, "fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def _g711_luts() -> tuple[np.ndarray, np.ndarray]:
    """256-entry int16 expansion tables for G.711 μ-law and A-law, built
    from the spec (ITU-T G.711; the same tables audioop/ffmpeg ship —
    cross-checked against stdlib audioop over all 256 codes in
    tests/test_multimodal.py). Pure numpy: decode is then one table
    gather per byte, fully vectorized."""
    codes = np.arange(256, dtype=np.int64)
    # μ-law: complement, then ((mant·8 + 0x84) << exp) − 0x84, signed
    u = ~codes & 0xFF
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 7
    mant = u & 0xF
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    ulaw = np.where(sign, -mag, mag).astype(np.int16)
    # A-law: xor 0x55; exp 0 → mant·16+8, else ((mant·16)+0x108)<<(exp−1);
    # NOTE the sign convention is inverted vs μ-law: MSB SET = positive
    a = codes ^ 0x55
    sign_a = (a & 0x80) != 0
    exp_a = (a >> 4) & 7
    mant_a = a & 0xF
    mag_a = np.where(exp_a == 0, (mant_a << 4) + 8,
                     ((mant_a << 4) + 0x108) << np.maximum(exp_a - 1, 0))
    alaw = np.where(sign_a, mag_a, -mag_a).astype(np.int16)
    return ulaw, alaw


_ULAW_LUT, _ALAW_LUT = _g711_luts()

# IMA/DVI ADPCM tables (IMA Digital Audio Compatibility Project, 1992 —
# the same constants every implementation ships)
_IMA_STEP = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_adpcm_decode(raw: bytes, channels: int,
                      block_align: int) -> np.ndarray:
    """IMA ADPCM (WAV format 0x0011) → (n, channels) int16. Blocks are
    independent, so the per-sample recurrence runs as ONE Python loop over
    the ~2·block_align samples of a block with numpy ops vectorized across
    ALL blocks × channels; a trailing partial block is dropped (encoders
    emit whole blocks)."""
    ba = block_align
    if ba < 4 * channels + 4 * channels or (ba - 4 * channels) % (
            4 * channels):
        raise ValueError("ADPCM: bad block align")
    nblocks = len(raw) // ba
    if nblocks == 0:
        raise ValueError("ADPCM: no complete block")
    buf = np.frombuffer(raw, np.uint8, nblocks * ba).reshape(nblocks, ba)
    header = buf[:, : 4 * channels].reshape(nblocks, channels, 4)
    pred = (header[:, :, 0].astype(np.uint16)
            | (header[:, :, 1].astype(np.uint16) << 8)).astype(
        np.int16).astype(np.int32)
    idx = header[:, :, 2].astype(np.int32)
    if int(idx.max(initial=0)) > 88:
        raise ValueError("ADPCM: step index out of range")
    data = buf[:, 4 * channels:]
    ngroups = data.shape[1] // (4 * channels)
    # nibble layout: 4-byte groups per channel, channels interleaved by
    # group; low nibble first within each byte
    d = data.reshape(nblocks, ngroups, channels, 4)
    nibs = np.empty((nblocks, ngroups, channels, 8), np.uint8)
    nibs[..., 0::2] = d & 0xF
    nibs[..., 1::2] = d >> 4
    nibs = nibs.transpose(0, 2, 1, 3).reshape(nblocks, channels,
                                              ngroups * 8)
    spb = ngroups * 8
    out = np.empty((nblocks, spb + 1, channels), np.int16)
    out[:, 0, :] = pred
    for t in range(spb):
        n = nibs[:, :, t].astype(np.int32)
        step = _IMA_STEP[idx]
        diff = (step >> 3) + np.where(n & 4, step, 0) \
            + np.where(n & 2, step >> 1, 0) + np.where(n & 1, step >> 2, 0)
        pred = np.clip(pred + np.where(n & 8, -diff, diff), -32768, 32767)
        idx = np.clip(idx + _IMA_INDEX[n & 7], 0, 88)
        out[:, t + 1, :] = pred
    return out.reshape(-1, channels)


def encode_wav_adpcm(samples: np.ndarray, rate: int, *,
                     samples_per_block: int = 505) -> bytes:
    """(n, channels) float in [-1, 1] → IMA ADPCM WAV (format 0x0011) —
    the spec encoder (quantize the prediction residual with the same
    step/index walk the decoder runs), so tests and planted corpora can
    synthesize real compressed audio. Input is padded to whole blocks."""
    s = np.asarray(samples, np.float64)
    if s.ndim == 1:
        s = s[:, None]
    pcm = np.clip(np.round(s * 32768.0), -32768, 32767).astype(np.int32)
    n, ch = pcm.shape
    if (samples_per_block - 1) % 8:
        raise ValueError("samples_per_block must be 8k+1")
    spb = samples_per_block
    nblocks = -(-n // spb)
    pad = nblocks * spb - n
    if pad:
        pcm = np.vstack([pcm, np.repeat(pcm[-1:], pad, axis=0)])
    ba = 4 * ch + (spb - 1) // 2 * ch
    out = bytearray()
    for blk in range(nblocks):
        chunk = pcm[blk * spb:(blk + 1) * spb]
        pred = chunk[0].copy()
        # per-block initial step index from the block's mean slope (the
        # header carries it so the quantizer starts adapted, not at 0)
        slope = np.abs(np.diff(chunk, axis=0)).mean(axis=0)
        idx = np.clip(np.searchsorted(_IMA_STEP, slope), 0, 88).astype(
            np.int32)
        header = bytearray()
        for c in range(ch):
            header += int(np.int16(pred[c])).to_bytes(2, "little",
                                                      signed=True)
            header += bytes([int(idx[c]), 0])
        nibs = np.empty((spb - 1, ch), np.uint8)
        for t in range(spb - 1):
            target = chunk[t + 1]
            step = _IMA_STEP[idx]
            delta = target - pred
            code = np.where(delta < 0, 8, 0)
            mag = np.abs(delta)
            b4 = (mag >= step).astype(np.int32)
            mag = mag - b4 * step
            b2 = (mag >= (step >> 1)).astype(np.int32)
            mag = mag - b2 * (step >> 1)
            b1 = (mag >= (step >> 2)).astype(np.int32)
            code = code | (b4 << 2) | (b2 << 1) | b1
            diff = (step >> 3) + b4 * step + b2 * (step >> 1) \
                + b1 * (step >> 2)
            pred = np.clip(pred + np.where(code & 8, -diff, diff),
                           -32768, 32767)
            idx = np.clip(idx + _IMA_INDEX[code & 7], 0, 88)
            nibs[t] = code.astype(np.uint8)
        body = bytearray()
        # pack: per channel 4-byte (8-nibble) groups, channel-interleaved
        per_ch = nibs.T  # (ch, spb-1)
        for g in range((spb - 1) // 8):
            for c in range(ch):
                eight = per_ch[c, g * 8:(g + 1) * 8]
                for k in range(4):
                    body.append(int(eight[2 * k] | (eight[2 * k + 1] << 4)))
        out += bytes(header) + bytes(body)
    fmt = struct.pack("<HHIIHHHH", 0x11, ch, rate,
                      rate * ba // spb, ba, 4, 2, spb)
    body_all = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"fact" + struct.pack("<II", 4, nblocks * spb) \
        + b"data" + struct.pack("<I", len(out)) + bytes(out)
    return b"RIFF" + struct.pack("<I", len(body_all)) + body_all


@_malformed_guard
def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode an audio payload: RIFF/WAVE linear PCM (8/16-bit int, any
    channel count) plus the COMPRESSED WAV codecs — G.711 A-law (format
    6) / μ-law (format 7) expanded through spec-built numpy LUTs, and IMA
    ADPCM (format 0x11, block-wise vectorized across blocks) — →
    ((n_samples, channels) float32 in [-1, 1], sample_rate). Anything else
    (mp3/aac/ogg) raises ``NotImplementedError`` — a real deployment
    plugs ffmpeg/soundfile."""
    b = bytes(payload or b"")
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise NotImplementedError(
            "audio codec not in sandbox (PCM/float/G.711/IMA-ADPCM WAV "
            "decode is real)")
    pos, n = 12, len(b)
    fmt = None
    while pos + 8 <= n:
        cid = b[pos:pos + 4]
        size, = struct.unpack_from("<I", b, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", b, body)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt")
            audio_fmt, channels, rate, _, block_align, bits = fmt
            if channels < 1 or (
                (audio_fmt == 1 and bits not in (8, 16))
                or (audio_fmt == 3 and bits not in (32, 64))
                or (audio_fmt in (6, 7) and bits != 8)
                or (audio_fmt == 0x11 and bits != 4)
                or audio_fmt not in (1, 3, 6, 7, 0x11)
            ):
                raise NotImplementedError(
                    "only 8/16-bit PCM, 32/64-bit float, 8-bit G.711 and "
                    "4-bit IMA-ADPCM WAV supported")
            raw = b[body: body + min(size, n - body)]
            if audio_fmt == 0x11:  # IMA ADPCM: block-parallel expand
                pcm = _ima_adpcm_decode(raw, channels, block_align)
                return pcm.astype(np.float32) / 32768.0, rate
            if audio_fmt == 3:  # IEEE float (format 3): already [-1, 1]
                w = bits // 8
                x = np.frombuffer(raw[: len(raw) - len(raw) % w],
                                  "<f4" if bits == 32 else "<f8")
                # NaN survives np.clip and would poison downstream feature
                # aggregates as decoded=True rows — zero non-finite samples
                x = np.nan_to_num(x.astype(np.float32), nan=0.0,
                                  posinf=1.0, neginf=-1.0)
                x = np.clip(x, -1.0, 1.0)
            elif audio_fmt in (6, 7):  # G.711 A-law / μ-law: LUT gather
                lut = _ALAW_LUT if audio_fmt == 6 else _ULAW_LUT
                x = lut[np.frombuffer(raw, np.uint8)].astype(np.float32)
                x /= 32768.0
            elif bits == 16:
                x = np.frombuffer(raw[: len(raw) & ~1], "<i2").astype(np.float32)
                x /= 32768.0
            else:  # 8-bit WAV is unsigned
                x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
            usable = (len(x) // channels) * channels
            return x[:usable].reshape(-1, channels), rate
        pos = body + size + (size & 1)  # chunks are word-aligned
    raise ValueError("no data chunk in WAV")


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n, channels) float in [-1, 1] → 16-bit PCM WAV bytes (inverse of
    decode_audio's PCM16 path; used by tests)."""
    s = np.asarray(samples, np.float64)
    if s.ndim == 1:
        s = s[:, None]
    pcm = np.clip(np.round(s * 32768.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    ch = s.shape[1]
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def audio_features(samples: np.ndarray, rate: int,
                   feature_dim: int = 8) -> list[float]:
    """Deterministic real-signal features: [duration_s/3600, channels/8,
    rms, peak, zero-crossing rate, mean, rate/96000], padded to
    ``feature_dim``."""
    mono = samples.mean(axis=1)
    zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) \
        if len(mono) > 1 else 0.0
    f = [len(samples) / rate / 3600.0 if rate else 0.0,
         samples.shape[1] / 8.0,
         float(np.sqrt(np.mean(mono ** 2))) if len(mono) else 0.0,
         float(np.abs(mono).max()) if len(mono) else 0.0,
         zc, float(mono.mean()) if len(mono) else 0.0,
         rate / 96000.0]
    return f[:feature_dim] + [0.0] * max(0, feature_dim - len(f))


def _parse_y4m_header(b: bytes):
    """(width, height, fps, header_end) from a YUV4MPEG2 stream header."""
    eol = b.find(b"\n")
    if eol < 0:
        raise ValueError("truncated Y4M header")
    w = h = None
    num, den = 30, 1
    for tok in b[9:eol].split(b" "):
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            num, den = (int(x) for x in tok[1:].split(b":"))
        elif tok[:1] == b"C" and tok[1:] not in (b"420", b"420jpeg",
                                                 b"420mpeg2", b"420paldv"):
            raise NotImplementedError("only 4:2:0 Y4M supported")
    if not w or not h or den == 0:
        raise ValueError("bad Y4M header")
    _check_dims(w, h, "Y4M")
    return w, h, num / den, eol + 1


def _parse_avi(b: bytes):
    """Walk a RIFF AVI container: returns (micro_sec_per_frame,
    [(offset, size), …] of the stream-0 video frame chunks in 'movi'
    order). Raises ValueError on malformed structure."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI container")
    micro = 0
    frames: list[tuple[int, int]] = []
    stack = [(12, min(len(b), 8 + struct.unpack_from("<I", b, 4)[0]))]
    while stack:
        pos, end = stack.pop()
        while pos + 8 <= end:
            cid = b[pos:pos + 4]
            size, = struct.unpack_from("<I", b, pos + 4)
            body = pos + 8
            nxt = body + size + (size & 1)
            if body + size > len(b):
                raise ValueError("truncated AVI chunk")
            if cid == b"LIST" and size >= 4:
                stack.append((nxt, end))  # resume after the list
                pos, end = body + 4, body + size
                continue
            if cid == b"avih" and size >= 4:
                micro, = struct.unpack_from("<I", b, body)
            elif cid[:2] == b"00" and cid[2:4] in (b"dc", b"db"):
                frames.append((body, size))
            pos = nxt
    return micro, frames


def _luma_plane(px: np.ndarray) -> np.ndarray:
    """(h, w, c) uint8 → BT.601 luma as (h, w, 1) uint8."""
    if px.shape[2] == 1:
        return px
    f = px[:, :, :3].astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    return np.clip(np.round(y), 0, 255).astype(np.uint8)[:, :, None]


@_malformed_guard
def decode_video_frame(payload: bytes, ts_ms: int) -> np.ndarray:
    """Decode the frame at ``ts_ms`` from a decodable video payload —
    uncompressed YUV4MPEG2 (Y4M) 4:2:0, or **MJPEG in an AVI container**
    (each '00dc' chunk is a JPEG picture, decoded by ``stages/jpeg.py``)
    — to the frame's luma plane as an (h, w, 1) uint8 array (the plane
    the sampling/feature stages consume). Every other COMPRESSED
    container/codec (mp4/h264/vp9/…) raises ``NotImplementedError`` — a
    real deployment plugs PyAV/ffmpeg here; the frame-sampling plumbing
    below is unchanged either way."""
    b = bytes(payload or b"")
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        micro, frames = _parse_avi(b)
        fps = 1e6 / micro if micro else 30.0
        want = max(0, int(ts_ms / 1000.0 * fps))
        if want >= len(frames):
            raise ValueError(
                f"ts {ts_ms}ms past end of stream ({len(frames)} frames)")
        off, size = frames[want]
        pic = b[off:off + size]
        if pic[:2] != b"\xff\xd8":
            raise NotImplementedError(
                "AVI: only MJPEG video streams are decodable in sandbox")
        from .jpeg import decode_jpeg

        return _luma_plane(decode_jpeg(pic))
    if b[:9] != b"YUV4MPEG2":
        raise NotImplementedError(
            "compressed video codecs not in sandbox (Y4M + MJPEG-AVI "
            "decode is real)")
    w, h, fps, pos = _parse_y4m_header(b)
    frame_bytes = w * h + 2 * ((w // 2) * (h // 2))  # 4:2:0 planes
    want = max(0, int(ts_ms / 1000.0 * fps))
    idx = 0
    n = len(b)
    while pos < n:
        eol = b.find(b"\n", pos)
        if eol < 0 or b[pos:pos + 5] != b"FRAME":
            raise ValueError("bad Y4M frame marker")
        data = eol + 1
        if data + frame_bytes > n:
            raise ValueError("truncated Y4M frame")
        if idx == want:
            return np.frombuffer(b, np.uint8, w * h, data).reshape(h, w, 1)
        idx += 1
        pos = data + frame_bytes
    raise ValueError(f"ts {ts_ms}ms past end of stream ({idx} frames)")


class FrameDecodeStage:
    """Actor-pool stage: sample AND decode frames from decodable
    (uncompressed Y4M or MJPEG-AVI) video payloads in one pass — up to
    ``max_frames`` per item, evenly spread over the stream's actual
    frames. Emits one row per decoded frame with the luma-plane summary a
    dedup/quality pipeline consumes. Undecodable (compressed) payloads
    yield no rows here — their decode plan still comes from
    :func:`sample_frames` + a real codec."""

    def __init__(self, max_frames: int = 16):
        self.max_frames = max_frames

    def __call__(self, t: pa.Table) -> pa.Table:
        ids_out, idx_out, ts_out, mean_out, w_out, h_out = [], [], [], [], [], []
        for mid, p in zip(t.column("media_id").to_pylist(),
                          t.column("payload").to_pylist()):
            b = bytes(p or b"")
            if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                from .jpeg import decode_jpeg

                try:
                    micro, frames = _parse_avi(b)
                except ValueError:
                    continue
                if not frames:
                    continue
                fps = 1e6 / micro if micro else 30.0
                want = min(len(frames), self.max_frames)
                for k in range(want):
                    fi = k * len(frames) // want
                    off, size = frames[fi]
                    pic = b[off:off + size]
                    if pic[:2] != b"\xff\xd8":
                        continue
                    try:
                        y = _luma_plane(decode_jpeg(pic))
                    except (ValueError, NotImplementedError):
                        continue
                    ids_out.append(mid)
                    idx_out.append(fi)
                    ts_out.append(int(fi * 1000.0 / fps))
                    mean_out.append(float(y.mean()))
                    w_out.append(y.shape[1])
                    h_out.append(y.shape[0])
                continue
            if b[:9] != b"YUV4MPEG2":
                continue
            try:
                w, h, fps, pos = _parse_y4m_header(b)
            except (ValueError, NotImplementedError):
                continue
            frame_bytes = w * h + 2 * ((w // 2) * (h // 2))
            offsets = []
            n = len(b)
            while pos < n:
                eol = b.find(b"\n", pos)
                if eol < 0 or b[pos:pos + 5] != b"FRAME" \
                        or eol + 1 + frame_bytes > n:
                    break
                offsets.append(eol + 1)
                pos = eol + 1 + frame_bytes
            if not offsets:
                continue
            want = min(len(offsets), self.max_frames)
            for k in range(want):
                fi = k * len(offsets) // want
                y = np.frombuffer(b, np.uint8, w * h, offsets[fi])
                ids_out.append(mid)
                idx_out.append(fi)
                ts_out.append(int(fi * 1000.0 / fps) if fps else 0)
                mean_out.append(float(y.mean()))
                w_out.append(w)
                h_out.append(h)
        return pa.table({
            "media_id": pa.array(ids_out, pa.int64()),
            "frame_idx": pa.array(idx_out, pa.int32()),
            "ts_ms": pa.array(ts_out, pa.int64()),
            "luma_mean": pa.array(mean_out, pa.float64()),
            "width": pa.array(w_out, pa.int32()),
            "height": pa.array(h_out, pa.int32()),
        })


def encode_avi_mjpeg(frames_px: list, fps: float = 10.0,
                     quality: int = 90) -> bytes:
    """Encode a list of (h, w, c) uint8 arrays as an MJPEG AVI (RIFF
    container, 'MJPG' vids stream, one '00dc' JPEG chunk per frame) —
    pure stdlib, round-trips through :func:`decode_video_frame` /
    :class:`FrameDecodeStage`; used by tests and planted corpora."""
    from .jpeg import encode_jpeg

    if not frames_px:
        raise ValueError("encode_avi_mjpeg: need at least one frame")
    h, w = frames_px[0].shape[:2]
    pics = [encode_jpeg(f, quality=quality) for f in frames_px]
    micro = int(round(1e6 / fps))

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b"")

    avih = struct.pack("<14I", micro, 0, 0, 0, len(pics), 0, 1,
                       max(len(p_) for p_ in pics), w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0,
                                            1, int(round(fps)), 0,
                                            len(pics), 0, 0, -1)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4I2i", 40, w, h, 1, 24, 0x47504A4D,
                       w * h * 3, 0, 0, 0, 0)
    strl = b"LIST" + struct.pack(
        "<I", 4 + len(chunk(b"strh", strh)) + len(chunk(b"strf", strf)))         + b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
    hdrl_body = b"hdrl" + chunk(b"avih", avih) + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    movi_body = b"movi" + b"".join(chunk(b"00dc", p_) for p_ in pics)
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_sampled_frames(ds, *, max_frames: int = 16, concurrency: int = 2,
                          batch_size: int = 8):
    """Video payloads ⇒ small batches (one payload can hold many frames)."""
    return ds.map_batches(
        FrameDecodeStage,
        fn_constructor_kwargs={"max_frames": max_frames},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(ds, *, fps: float = 1.0, max_frames: int = 64):
    """Frame-sample plan: one row per frame to decode — (media_id, frame_idx,
    ts_ms) expanded from each video row's ``duration_ms`` metadata at ``fps``,
    capped at ``max_frames`` evenly spread frames per item. The expansion is
    REAL (vectorized np.repeat flat-map); the per-frame decode that would
    consume these rows is the stubbed ``decode_video_frame``.

    Scale shape: rows/item is bounded, so downstream decode batches stay
    memory-sized; the plan carries no payload bytes — a decode stage joins
    payloads back by reading its own shard of the media store."""
    import numpy as np

    def expand(t: pa.Table) -> pa.Table:
        ids = t.column("media_id").to_numpy(zero_copy_only=False)
        dur = t.column("duration_ms").to_numpy(zero_copy_only=False)
        dur = np.where(np.isnan(dur.astype(np.float64)), 0, dur).astype(np.int64)
        want = np.minimum(
            np.maximum(dur * fps / 1000.0, 1).astype(np.int64), max_frames
        )
        rep_ids = np.repeat(ids, want)
        idx = np.concatenate([np.arange(w) for w in want]) if len(want) else np.array([], np.int64)
        # frames spread evenly over the duration (ts of frame k = k/want * dur)
        rep_dur = np.repeat(dur, want)
        rep_want = np.repeat(want, want)
        ts_ms = (idx * rep_dur // np.maximum(rep_want, 1)).astype(np.int64)
        return pa.table({
            "media_id": pa.array(rep_ids, pa.int64()),
            "frame_idx": pa.array(idx.astype(np.int32)),
            "ts_ms": pa.array(ts_ms, pa.int64()),
        })

    return ds.map_batches(expand, batch_format="pyarrow")


def resize_nearest(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Real nearest-neighbor resample: output pixel (y, x) samples source
    pixel (y*h//height, x*w//width)."""
    h, w = px.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return px[ys][:, xs]


class ImageResizeStage:
    """Actor-pool resize stage. Same ``fake`` modes as
    :class:`MediaFeatureStage`: ``"auto"`` decodes the uncompressed formats
    and performs a REAL nearest-neighbor resize (re-encoded as PPM, digest
    of the resized bytes); undecodable payloads fall back to the
    digest-of-input fake (``decoded`` column says which). ``True`` skips
    decode entirely; ``False`` requires it."""

    def __init__(self, width: int = 224, height: int = 224,
                 fake: bool | str = True):
        self.width, self.height, self.fake = width, height, fake

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t.column("payload").to_pylist()
        digests, decoded = [], []
        for p in payloads:
            b = bytes(p or b"")
            if self.fake is not True:
                try:
                    px = decode_image(b)
                    if px.shape[2] == 1:
                        px = np.repeat(px, 3, axis=2)
                    out = encode_ppm(resize_nearest(px[:, :, :3],
                                                    self.width, self.height))
                    digests.append(hash64(out) & 0x7FFFFFFFFFFFFFFF)
                    decoded.append(True)
                    continue
                except (NotImplementedError, ValueError):
                    if self.fake is False:
                        raise
            digests.append(hash64(b) & 0x7FFFFFFFFFFFFFFF)
            decoded.append(False)
        n = t.num_rows
        return pa.table({
            "media_id": t.column("media_id"),
            "width": pa.array([self.width] * n, pa.int32()),
            "height": pa.array([self.height] * n, pa.int32()),
            "resized_digest": pa.array(digests, pa.int64()),
            "decoded": pa.array(decoded, pa.bool_()),
        })


def resize_images(ds, *, width: int = 224, height: int = 224,
                  concurrency: int = 2, batch_size: int = 16,
                  fake: bool | str = True):
    return ds.map_batches(
        ImageResizeStage,
        fn_constructor_kwargs={"width": width, "height": height, "fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def media_table_from_pages(pages_ds, *, kind: str = "image"):
    """Adapter: treat the crawl's ``html`` binary column as an opaque payload
    table (the sandbox has no real media bytes)."""

    def conv(t: pa.Table) -> pa.Table:
        payloads = t.column("html").to_pylist()
        n = t.num_rows
        return pa.table(
            {
                "media_id": pa.array(
                    [hash64(u) & 0x7FFFFFFFFFFFFFFF for u in t.column("url").to_pylist()],
                    pa.int64(),
                ),
                "kind": pa.array([kind] * n, pa.string()),
                "mime": pa.array(["application/octet-stream"] * n, pa.string()),
                "payload": pa.array([bytes(p or b"") for p in payloads], pa.binary()),
                "width": pa.array([None] * n, pa.int32()),
                "height": pa.array([None] * n, pa.int32()),
                "duration_ms": pa.array([None] * n, pa.int32()),
            },
            schema=MEDIA_SCHEMA,
        )

    return pages_ds.map_batches(conv, batch_format="pyarrow")

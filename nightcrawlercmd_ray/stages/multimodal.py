"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool stages.

The decode kernels themselves are STUBBED (this container ships no
image/audio codecs — marked explicitly below); everything Ray-side is real and
tested: schema, batch sizing for large binary payloads, actor signature,
deterministic fake features for pipeline testing.
"""

from __future__ import annotations

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


def decode_image(payload: bytes) -> "object":
    """STUB: no image codec in this environment. A real deployment plugs
    Pillow/libvips here; the surrounding Ray plumbing is unchanged."""
    raise NotImplementedError("image decode requires a codec library (not in sandbox)")


class MediaFeatureStage:
    """Actor-pool stage: media batches → per-item feature rows.

    ``fake=True`` (default in-sandbox) derives deterministic pseudo-features
    from the payload bytes — hash-seeded, so tests are stable — while keeping
    the exact actor/batch shape a real decoder would use (small ``batch_size``,
    ``num_cpus>=1``, one model/codec load per actor in ``__init__``)."""

    def __init__(self, feature_dim: int = 8, fake: bool = True):
        self.feature_dim = feature_dim
        self.fake = fake
        if not fake:
            decode_image(b"")  # raises: no codec in sandbox

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("media_id").to_pylist()
        kinds = t.column("kind").to_pylist()
        payloads = t.column("payload").to_pylist()
        feats, sizes = [], []
        for p in payloads:
            b = bytes(p or b"")
            sizes.append(len(b))
            h = hash64(b)
            feats.append(
                [((h >> (8 * (i % 8))) & 0xFF) / 255.0 for i in range(self.feature_dim)]
            )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "n_bytes": pa.array(sizes, pa.int64()),
                "features": pa.array(feats, pa.list_(pa.float32())),
            }
        )


def extract_media_features(ds, *, feature_dim: int = 8, concurrency: int = 2,
                           batch_size: int = 16):
    """Large binary payloads ⇒ SMALL batches (batch × concurrency must fit a
    worker heap) — the sizing rule a real decoder inherits."""
    return ds.map_batches(
        MediaFeatureStage,
        fn_constructor_kwargs={"feature_dim": feature_dim, "fake": True},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def decode_video_frame(payload: bytes, ts_ms: int) -> "object":
    """STUB: no video codec in this environment. A real deployment plugs
    PyAV/ffmpeg here; the frame-sampling plumbing below is real."""
    raise NotImplementedError("video decode requires a codec library (not in sandbox)")


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


class ImageResizeStage:
    """Actor-pool resize stage (decode/encode stubbed; plumbing real).

    ``fake=True`` emits the target dims + a deterministic payload digest so
    the pipeline shape (small batches, per-actor codec init, typed output)
    is testable in-sandbox."""

    def __init__(self, width: int = 224, height: int = 224, fake: bool = True):
        self.width, self.height, self.fake = width, height, fake
        if not fake:
            decode_image(b"")  # raises: no codec in sandbox

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t.column("payload").to_pylist()
        digests = [hash64(bytes(p or b"")) & 0x7FFFFFFFFFFFFFFF for p in payloads]
        n = t.num_rows
        return pa.table({
            "media_id": t.column("media_id"),
            "width": pa.array([self.width] * n, pa.int32()),
            "height": pa.array([self.height] * n, pa.int32()),
            "resized_digest": pa.array(digests, pa.int64()),
        })


def resize_images(ds, *, width: int = 224, height: int = 224,
                  concurrency: int = 2, batch_size: int = 16):
    return ds.map_batches(
        ImageResizeStage,
        fn_constructor_kwargs={"width": width, "height": height, "fake": True},
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

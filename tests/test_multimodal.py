"""Multimodal plumbing: frame-sample expansion math, resize stage shape,
feature determinism. Decode itself is stubbed (no codecs in sandbox) and
must raise clearly when requested for real."""

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
    from nightcrawlercmd_ray.stages.multimodal import (
        ImageResizeStage,
        MediaFeatureStage,
        decode_image,
        decode_video_frame,
    )

    with pytest.raises(NotImplementedError):
        decode_image(b"")
    with pytest.raises(NotImplementedError):
        decode_video_frame(b"", 0)
    with pytest.raises(NotImplementedError):
        MediaFeatureStage(fake=False)
    with pytest.raises(NotImplementedError):
        ImageResizeStage(fake=False)

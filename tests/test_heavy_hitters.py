"""Exact heavy hitters (stages/sketches.heavy_hitters_exact): equality vs a
serial exact count at aggressive MG trim levels, partition invariance, the
no-false-negative guard, and marker-key hygiene."""

from __future__ import annotations

import re
from collections import Counter

import pytest
import ray

import random

TEXTS = (
    ["the cat sat on the mat"] * 30
    + ["a dog ate my homework today"] * 12
    + ["the cat ran far away now"] * 7
    + [f"unique filler line number {i} with rare words x{i}" for i in range(40)]
    + ["", None]
)
# fixed-seed shuffle so every repartitioned block mixes heavy lines with the
# count-1 filler tail (real MG trimming in every batch, tiny deductions)
random.Random(11).shuffle(TEXTS)


def serial_hh(texts, threshold, ngram):
    tok = re.compile(r"[a-z]+")
    c: Counter = Counter()
    for t in texts:
        ws = tok.findall((t or "").lower())
        if ngram == 1:
            c.update(ws)
        else:
            c.update(" ".join(ws[i : i + ngram]) for i in range(len(ws) - ngram + 1))
    return {w: n for w, n in c.items() if n >= threshold}


@pytest.mark.parametrize("ngram", [1, 2])
@pytest.mark.parametrize("k", [16, 64, 4096])
def test_exact_at_any_trim_level(ngram, k):
    """k=16 forces real MG trimming in every batch (each batch holds far more
    than 16 distinct keys thanks to the unique filler lines, whose count-1
    tail keeps the per-batch deduction ≈ 1, well under the threshold); the
    confirm pass must still produce the EXACT heavy-hitter set and counts."""
    from nightcrawlercmd_ray.stages.sketches import _ngram_counter, heavy_hitters_exact

    threshold = 20
    # fixture sanity: every 6-way split batch exceeds k=16 distinct keys, so
    # trimming genuinely occurs at the small k
    assert len(_ngram_counter(TEXTS[:16], ngram)) > 16
    expect = serial_hh(TEXTS, threshold, ngram)
    ds = ray.data.from_items([{"text": t} for t in TEXTS]).repartition(6)
    out = heavy_hitters_exact(ds, threshold, ngram=ngram, k=k).to_pandas()
    got = dict(zip(out["key"], out["n"]))
    assert got == expect
    assert expect  # fixture sanity: the set is non-empty
    # no marker keys leak
    assert all(kk >= "a" for kk in got)


def test_partition_invariance():
    from nightcrawlercmd_ray.stages.sketches import heavy_hitters_exact

    expect = serial_hh(TEXTS, 20, 1)
    for blocks in (1, 6, 11):
        ds = ray.data.from_items([{"text": t} for t in TEXTS]).repartition(blocks)
        out = heavy_hitters_exact(ds, 20, ngram=1, k=64).to_pandas()
        assert dict(zip(out["key"], out["n"])) == expect


def test_noise_floor_guard_raises():
    """With k=1 and many batches the summed deductions exceed a low
    threshold — the operator must refuse rather than silently lose recall."""
    from nightcrawlercmd_ray.stages.sketches import heavy_hitters_exact

    ds = ray.data.from_items([{"text": t} for t in TEXTS if t]).repartition(12)
    with pytest.raises(ValueError, match="noise floor"):
        heavy_hitters_exact(ds, 2, ngram=1, k=1).to_pandas()


def test_threshold_above_everything_is_empty():
    from nightcrawlercmd_ray.stages.sketches import heavy_hitters_exact

    ds = ray.data.from_items([{"text": t} for t in TEXTS])
    out = heavy_hitters_exact(ds, 10_000, ngram=1).to_pandas()
    assert len(out) == 0

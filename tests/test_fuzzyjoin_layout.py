"""Edit-distance join (stages/fuzzyjoin) and Z-order layout (stages/layout):
brute-force Levenshtein oracle, deletion/substitution coverage, Morton-key
properties and the sorted-sink 2-D pruning payoff."""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray

from nightcrawlercmd_ray.stages.fuzzyjoin import edit_distance_pairs
from nightcrawlercmd_ray.stages.layout import (
    add_zorder_key,
    zorder_box_range,
    zorder_key,
)


def _lev(a: str, b: str) -> int:
    if len(a) > len(b):
        a, b = b, a
    prev = list(range(len(a) + 1))
    for j, cb in enumerate(b, 1):
        cur = [j] + [0] * len(a)
        for i, ca in enumerate(a, 1):
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def _pairs_oracle(words):
    return sorted(
        (a, b)
        for a, b in itertools.combinations(sorted(set(words)), 2)
        if _lev(a, b) <= 1
    )


@pytest.mark.parametrize("nparts,P", [(1, 1), (6, 7)])
def test_edit_distance_pairs_vs_bruteforce(nparts, P):
    rng = np.random.default_rng(5)
    words = list(
        {
            "".join(rng.choice(list("abcd"), rng.integers(1, 6)))
            for _ in range(300)
        }
    )
    # duplicate rows must not duplicate pairs
    rows = [{"w": w} for w in words for _ in range(int(rng.integers(1, 3)))]
    ds = ray.data.from_items(rows).repartition(nparts)
    got = edit_distance_pairs(ds, "w", num_partitions=P).to_pandas()
    got_pairs = sorted(zip(got["word_a"], got["word_b"]))
    assert got_pairs == _pairs_oracle(words)


def test_edit_distance_covers_all_three_edit_kinds():
    words = ["cat", "cut", "cart", "ca", "dog", "dg", "cat"]
    ds = ray.data.from_items([{"w": w} for w in words]).repartition(3)
    got = edit_distance_pairs(ds, "w", num_partitions=3).to_pandas()
    pairs = set(zip(got["word_a"], got["word_b"]))
    assert ("cat", "cut") in pairs  # substitution
    assert ("cart", "cat") in pairs  # deletion
    assert ("ca", "cat") in pairs  # insertion
    assert ("dg", "dog") in pairs
    assert all(_lev(a, b) <= 1 for a, b in pairs)
    assert pairs == set(_pairs_oracle(words))


def test_edit_distance_transposition_is_not_matched():
    # "ab"/"ba" share deletion variant "a" but ED=2 — the Hamming verify
    # must reject them
    ds = ray.data.from_items([{"w": "ab"}, {"w": "ba"}])
    got = edit_distance_pairs(ds, "w", num_partitions=2).to_pandas()
    assert len(got) == 0


def test_edit_distance_unicode_and_empty_string():
    words = ["né", "ne", "n", ""]
    ds = ray.data.from_items([{"w": w} for w in words])
    got = edit_distance_pairs(ds, "w", num_partitions=3).to_pandas()
    assert sorted(zip(got["word_a"], got["word_b"])) == _pairs_oracle(words)


# --------------------------------------------------------------------------- #
# Z-order
# --------------------------------------------------------------------------- #
def _deinterleave(z: int) -> tuple[int, int]:
    x = y = 0
    for i in range(32):
        x |= ((z >> (2 * i)) & 1) << i
        y |= ((z >> (2 * i + 1)) & 1) << i
    return x, y


@pytest.mark.parametrize("bits", [16, 21])
def test_zorder_key_roundtrips(bits):
    rng = np.random.default_rng(9)
    x = rng.integers(0, 1 << bits, 500).astype(np.int64)
    y = rng.integers(0, 1 << bits, 500).astype(np.int64)
    z = zorder_key(x, y, bits=bits)
    for xi, yi, zi in zip(x[:50], y[:50], z[:50]):
        assert _deinterleave(int(zi)) == (xi, yi)


def test_zorder_monotone_in_both_dims():
    # x1<=x2 and y1<=y2 => z1 <= z2 (the box-range pruning invariant)
    rng = np.random.default_rng(10)
    a = rng.integers(0, 1 << 16, (200, 2)).astype(np.int64)
    d = rng.integers(0, 100, (200, 2)).astype(np.int64)
    b = np.minimum(a + d, (1 << 16) - 1)
    z1 = zorder_key(a[:, 0], a[:, 1])
    z2 = zorder_key(b[:, 0], b[:, 1])
    assert (z1 <= z2).all()


def test_zorder_out_of_range_raises():
    with pytest.raises(ValueError, match="outside"):
        zorder_key(np.array([1 << 16]), np.array([0]), bits=16)
    with pytest.raises(ValueError, match="outside"):
        zorder_key(np.array([-1]), np.array([0]))
    with pytest.raises(ValueError, match="bits"):
        zorder_key(np.array([0]), np.array([0]), bits=32)


def test_zorder_layout_prunes_box_reads(tmp_path):
    from nightcrawlercmd_ray.stages.sortedsink import (
        read_sorted_range,
        write_sorted_partitioned,
    )

    rng = np.random.default_rng(12)
    n = 20000
    t = pa.table(
        {
            "rid": np.arange(n, dtype=np.int64),
            "x": rng.integers(0, 1024, n).astype(np.int64),
            "y": rng.integers(0, 1024, n).astype(np.int64),
        }
    )
    keyed = add_zorder_key(ray.data.from_arrow(t), "x", "y")
    out = str(tmp_path / "zsorted")
    write_sorted_partitioned(
        keyed, out, key_col="zkey", tie_col="rid", num_partitions=16, n_rows=n
    )
    lo, hi = zorder_box_range(100, 130, 200, 230)
    pruned, n_parts = read_sorted_range(out, lo=lo, hi=hi, key_col="zkey")
    df = pruned.to_pandas()
    assert n_parts < 16  # manifest pruning skipped most parts before any read
    # superset of the box — exact filter trims interior curve gaps
    box = df[(df.x >= 100) & (df.x <= 130) & (df.y >= 200) & (df.y <= 230)]
    exp = t.to_pandas()
    exp = exp[(exp.x >= 100) & (exp.x <= 130) & (exp.y >= 200) & (exp.y <= 230)]
    assert sorted(box.rid) == sorted(exp.rid)
    # the pruning payoff: the z-range covers a small slice of the key space,
    # so the range read returns far fewer rows than the corpus
    assert len(df) < n / 4


@pytest.mark.parametrize("nparts,P", [(1, 1), (5, 6)])
def test_edit_distance_join_bipartite_vs_bruteforce(nparts, P):
    from nightcrawlercmd_ray.stages.fuzzyjoin import edit_distance_join

    rng = np.random.default_rng(14)
    A = list({"".join(rng.choice(list("abc"), rng.integers(1, 5)))
              for _ in range(120)})
    B = list({"".join(rng.choice(list("abc"), rng.integers(1, 5)))
              for _ in range(120)})
    da = ray.data.from_items([{"x": w} for w in A]).repartition(nparts)
    db = ray.data.from_items([{"y": w} for w in B]).repartition(max(1, nparts - 1))
    got = edit_distance_join(
        da, db, col_a="x", col_b="y", num_partitions=P
    ).to_pandas()
    gp = sorted(zip(got["word_a"], got["word_b"]))
    exp = sorted((a, b) for a in set(A) for b in set(B) if _lev(a, b) <= 1)
    assert gp == exp


def test_edit_distance_join_keeps_exact_matches_and_orients_sides():
    from nightcrawlercmd_ray.stages.fuzzyjoin import edit_distance_join

    da = ray.data.from_items([{"x": "abc"}, {"x": "zzz"}])
    db = ray.data.from_items([{"y": "abc"}, {"y": "abd"}, {"y": "qqq"}])
    got = edit_distance_join(da, db, col_a="x", col_b="y", num_partitions=3)
    pairs = sorted(zip(*[got.to_pandas()[c] for c in ("word_a", "word_b")]))
    # word_a always from A even when B's word sorts first
    assert pairs == [("abc", "abc"), ("abc", "abd")]

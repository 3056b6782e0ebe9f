"""Deterministic sampling / mixture weighting (stages/sampling.py):
rate accuracy, partition invariance, stable train/holdout partition, and
the driver-style DuckDB oracle compare for the stratified query."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

SF_DIR = "/root/testdata/sf0.001"


def _docs(n=4000, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table({
        "doc_id": pa.array(rng.permutation(np.arange(n)), pa.int64()),
        "lang": pa.array(
            rng.choice(["en", "de", "fr", "ja"], n, p=[0.4, 0.3, 0.2, 0.1])
        ),
    })


@pytest.mark.parametrize("blocks", [1, 8])
def test_deterministic_sample_rate_and_partition_invariance(blocks):
    from nightcrawlercmd_ray.stages.sampling import deterministic_sample

    t = _docs()
    ds = ray.data.from_arrow(t).repartition(blocks)
    out = deterministic_sample(ds, key="doc_id", rate=0.25).to_pandas()
    # membership is a pure function of the key → identical at any layout
    expected_ids = sorted(out["doc_id"])
    assert 0.20 < len(out) / t.num_rows < 0.30
    out2 = deterministic_sample(
        ray.data.from_arrow(t).repartition(3), key="doc_id", rate=0.25
    ).to_pandas()
    assert sorted(out2["doc_id"]) == expected_ids


def test_stratified_rates_and_default():
    from nightcrawlercmd_ray.stages.sampling import stratified_sample

    t = _docs()
    out = stratified_sample(
        ray.data.from_arrow(t).repartition(4),
        key="doc_id", stratum="lang",
        rates={"en": 0.5, "de": 0.25}, default_rate=0.1,
    ).to_pandas()
    full = t.to_pandas()
    for lang, lo, hi in [("en", 0.42, 0.58), ("de", 0.18, 0.32),
                         ("fr", 0.05, 0.16), ("ja", 0.04, 0.17)]:
        n_all = (full["lang"] == lang).sum()
        n_kept = (out["lang"] == lang).sum()
        assert lo < n_kept / n_all < hi, (lang, n_kept, n_all)
    # rate-0 stratum drops everything
    none = stratified_sample(
        ray.data.from_arrow(t), key="doc_id", stratum="lang",
        rates={"en": 0.0}, default_rate=0.0,
    ).to_pandas()
    assert len(none) == 0


def test_train_holdout_partition_exact():
    from nightcrawlercmd_ray.stages.sampling import train_holdout_split

    t = _docs(2000)
    train, hold = train_holdout_split(
        ray.data.from_arrow(t).repartition(5), key="doc_id", holdout=0.125
    )
    tr = train.to_pandas()["doc_id"]
    ho = hold.to_pandas()["doc_id"]
    assert len(tr) + len(ho) == t.num_rows
    assert not set(tr) & set(ho)
    assert 0.08 < len(ho) / t.num_rows < 0.17
    # assignment is stable: a subset of the data splits identically
    sub = t.slice(0, 500)
    _, ho2 = train_holdout_split(
        ray.data.from_arrow(sub), key="doc_id", holdout=0.125
    )
    assert set(ho2.to_pandas()["doc_id"]) == set(ho) & set(
        sub.column("doc_id").to_pylist()
    )


def test_stratified_query_matches_duckdb_oracle():
    import duckdb

    import __ray_entry__ as E

    res = E.queries()["sample_documents_stratified"](SF_DIR).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    ora = con.execute(E.oracle_sql()["sample_documents_stratified"]).df()
    assert len(res) == len(ora) > 0
    pd.testing.assert_frame_equal(
        res.reset_index(drop=True), ora.reset_index(drop=True),
        check_dtype=False,
    )


@pytest.mark.parametrize("nparts", [1, 6])
def test_sample_k_per_group_partition_invariant(nparts):
    """Same k-sample at any parallelism; exactly k per group (or all rows
    when the group is smaller than k)."""
    from nightcrawlercmd_ray.stages.sampling import sample_k_per_group

    df = pd.DataFrame({
        "doc_id": np.arange(100, dtype="int64"),
        "lang": (["en"] * 60 + ["de"] * 38 + ["xx"] * 2),
    })
    out = (
        sample_k_per_group(
            ray.data.from_pandas(df).repartition(nparts),
            key="doc_id", group="lang", k=5,
        )
        .to_pandas().sort_values(["lang", "doc_id"]).reset_index(drop=True)
    )
    sizes = out.groupby("lang").size().to_dict()
    assert sizes == {"en": 5, "de": 5, "xx": 2}
    # pinned draw: smallest (doc_id*2654435761) % 2^32 rank wins — compare
    # against a direct pandas computation
    h = (df["doc_id"].to_numpy().astype("uint64") * np.uint64(2654435761)) \
        & np.uint64(0xFFFFFFFF)
    df2 = df.assign(h=h.astype("int64"))
    want = (
        df2.sort_values(["lang", "h", "doc_id"]).groupby("lang").head(5)
        .sort_values(["lang", "doc_id"]).reset_index(drop=True)[["doc_id", "lang"]]
    )
    assert out[["doc_id", "lang"]].equals(want)


# --------------------------------------------------------------------------- #
# token-budget sampling (two-pass distributed prefix scan)
# --------------------------------------------------------------------------- #
def test_token_budget_sample_vs_serial_oracle():
    """Per-stratum running-total cut vs a serial oracle; invariant under
    both Ray partitioning AND the prefix-scan's own part_span (spans that
    split strata mid-run must still yield the identical global cumsum)."""
    from nightcrawlercmd_ray.stages.sampling import token_budget_sample

    rng = np.random.default_rng(7)
    langs = ["en", "de", "fr"]
    rows = []
    for i in range(90):
        nw = int(rng.integers(1, 12))
        rows.append((i, langs[i % 3], " ".join(["w"] * nw)))
    budget = 60

    # serial oracle
    expect = {}
    run = {}
    for i, lg, text in rows:  # doc_id order
        n = len(text.split(" "))
        run[lg] = run.get(lg, 0) + n
        if run[lg] <= budget:
            expect[i] = (lg, n, run[lg])

    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "lang": pa.array([r[1] for r in rows], pa.string()),
                  "text": pa.array([r[2] for r in rows], pa.string())})
    for parts in (1, 5):
        for span in (4, 17, 4096):
            ds = ray.data.from_arrow(t).repartition(parts)
            out = (token_budget_sample(ds, budget=budget, part_span=span)
                   .to_pandas().sort_values("doc_id").reset_index(drop=True))
            got = {int(r.doc_id): (r.lang, int(r.n_tokens), int(r.cum_tokens))
                   for r in out.itertuples()}
            assert got == expect, (parts, span)
    # the budget genuinely cuts every stratum (positive exercise)
    kept_per_lang = {lg: sum(1 for v in expect.values() if v[0] == lg)
                     for lg in langs}
    assert all(0 < kept_per_lang[lg] < 30 for lg in langs), kept_per_lang


def test_source_quality_filter_vs_serial_oracle():
    from nightcrawlercmd_ray.stages.curation import source_quality_filter

    rows = [(0, "a", 100), (1, "a", 400), (2, "b", 500), (3, "b", 700),
            (4, "c", 10), (5, "c", 20)]
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "source": pa.array([r[1] for r in rows], pa.string()),
                  "n_chars": pa.array([r[2] for r in rows], pa.int64())})
    # means: a=250, b=600, c=15 → threshold 250 keeps a (250>=250) and b
    for parts in (1, 3):
        ds = ray.data.from_arrow(t).repartition(parts)
        out = (source_quality_filter(ds, min_mean_chars=250)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert list(out.doc_id) == [0, 1, 2, 3]
        assert list(out.src_docs) == [2, 2, 2, 2]
        assert list(out.src_chars) == [500, 500, 1200, 1200]


# --- temperature_upsample ----------------------------------------------------


def test_temperature_upsample_factors_and_partition_invariance():
    import math

    from nightcrawlercmd_ray.stages.sampling import temperature_upsample

    rng = np.random.default_rng(21)
    langs = rng.choice(["en", "de", "ja"], 6000, p=[0.7, 0.25, 0.05])
    t = pa.table({
        "doc_id": pa.array(np.arange(6000), pa.int64()),
        "lang": pa.array(langs),
    })
    counts = {l: int((langs == l).sum()) for l in ("en", "de", "ja")}
    n_max = max(counts.values())

    def serial_reps(did, lang):
        f = math.sqrt(n_max / counts[lang])
        return int(math.floor(f)) + (
            1 if (did % 1_000_000) < math.floor((f - math.floor(f)) * 1_000_000)
            else 0
        )

    expect = {
        (int(did), r)
        for did, lang in zip(t.column("doc_id").to_pylist(), langs)
        for r in range(1, serial_reps(did, lang) + 1)
    }
    for blocks in (1, 7):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = temperature_upsample(ds).to_pandas()
        got = set(zip(out["doc_id"].astype(int), out["replica"].astype(int)))
        assert got == expect
    # head language stays 1×; the rarest is upsampled by ≥ √(1/p) ≈ 3.7
    en = sum(1 for d, _ in expect if langs[d] == "en")
    ja = sum(1 for d, _ in expect if langs[d] == "ja")
    assert en == counts["en"]
    assert ja / counts["ja"] > 3


def test_temperature_upsample_empty_raises():
    from nightcrawlercmd_ray.stages.sampling import temperature_upsample

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()), "lang": pa.array([], pa.string()),
    }))
    with pytest.raises(ValueError, match="empty"):
        temperature_upsample(ds)


@pytest.mark.parametrize("blocks", [1, 9])
def test_weighted_sample_k_vs_serial_and_partition_invariance(blocks):
    """Priority sampling: the k winners and their priority doubles are a
    pure function of (key, weight) — bit-equal to a serial numpy draw at
    any partitioning; weight ≤ 0 rows never win."""
    from nightcrawlercmd_ray.stages.sampling import hash_u32, weighted_sample_k

    rng = np.random.default_rng(11)
    n = 3000
    t = pa.table({
        "doc_id": pa.array(rng.permutation(np.arange(n)), pa.int64()),
        "w": pa.array(rng.integers(-5, 5000, n), pa.int64()),
    })
    ids = t.column("doc_id").to_numpy()
    w = t.column("w").to_numpy().astype(np.float64)
    prio = w / (hash_u32(ids.astype(np.int64)).astype(np.float64) + 1.0)
    ok = w > 0
    order = np.lexsort((ids[ok], -prio[ok]))
    exp_ids = ids[ok][order][:50]
    exp_prio = prio[ok][order][:50]

    ds = ray.data.from_arrow(t).repartition(blocks)
    out = weighted_sample_k(ds, key="doc_id", weight="w", k=50).to_pandas()
    assert len(out) == 50
    got = out.sort_values("doc_id")
    exp = pd.DataFrame({"doc_id": exp_ids, "priority": exp_prio}).sort_values(
        "doc_id"
    )
    assert list(got["doc_id"]) == list(exp["doc_id"])
    # bit-exact priorities (exact-int IEEE division)
    assert np.array_equal(
        got["priority"].to_numpy().view(np.int64),
        exp["priority"].to_numpy().view(np.int64),
    )
    assert (got.set_index("doc_id")["w"] > 0).all()


def test_weighted_sample_k_weight_bias():
    """Heavier rows are sampled proportionally more often (statistical
    sanity over many salts is overkill — one draw with a 10× weight class
    suffices at this size)."""
    from nightcrawlercmd_ray.stages.sampling import weighted_sample_k

    n = 2000
    t = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        # ids < 1000 weigh 10, the rest weigh 1
        "w": pa.array(np.where(np.arange(n) < 1000, 10, 1), pa.int64()),
    })
    out = weighted_sample_k(
        ray.data.from_arrow(t), key="doc_id", weight="w", k=200
    ).to_pandas()
    heavy = (out["doc_id"] < 1000).sum()
    assert heavy > 140, heavy  # ≈ 10/11 of 200 in expectation


def test_balanced_sample_shrinks_to_min_class():
    """balanced_sample: every stratum lands near the smallest class size;
    the smallest class is kept whole (rate 1.0); partition-invariant."""
    from nightcrawlercmd_ray.stages.sampling import balanced_sample

    rng = np.random.default_rng(41)
    n = 4000
    langs = rng.choice(["en", "de", "fr"], n, p=[0.7, 0.2, 0.1])
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "lang": pa.array(langs)})
    outs = []
    for parts in (1, 6):
        out = balanced_sample(
            ray.data.from_arrow(t).repartition(parts),
            key="doc_id", stratum="lang",
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    kept = outs[0]["lang"].value_counts()
    n_min = pd.Series(langs).value_counts().min()
    assert kept["fr"] == n_min  # rate 1.0 keeps the smallest class whole
    for lang in ("en", "de"):
        assert abs(kept[lang] - n_min) / n_min < 0.25

    with pytest.raises(ValueError, match="empty"):
        balanced_sample(
            ray.data.from_arrow(t.slice(0, 0)), key="doc_id", stratum="lang"
        )

    # integer class labels (the classifier-balancing case) must work too
    ti = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "label": pa.array((np.arange(n) % 4).astype(np.int32)),
    })
    out_i = balanced_sample(
        ray.data.from_arrow(ti), key="doc_id", stratum="label"
    ).to_pandas()
    assert set(out_i["label"]) == {0, 1, 2, 3}


def test_split_assign_partitions_exactly_and_permanently():
    """Every row gets exactly one label; proportions are near the targets;
    a row's label is independent of which OTHER rows are present (the
    permanence contract); fractions must sum to 1."""
    import numpy as np
    import pyarrow as pa
    import ray

    from nightcrawlercmd_ray.stages.sampling import split_assign

    ids = np.arange(5000, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids)}))
    out = split_assign(
        ds, key="doc_id",
        fractions={"train": 0.8, "val": 0.1, "test": 0.1}).to_pandas()
    assert len(out) == 5000 and set(out["split"]) == {"train", "val", "test"}
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.03
    assert abs(frac["val"] - 0.1) < 0.02
    # permanence: the first half alone assigns identically
    half = split_assign(
        ray.data.from_arrow(pa.table({"doc_id": pa.array(ids[:2500])})),
        key="doc_id",
        fractions={"train": 0.8, "val": 0.1, "test": 0.1}).to_pandas()
    merged = half.merge(out, on="doc_id", suffixes=("_h", "_f"))
    assert (merged["split_h"] == merged["split_f"]).all()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sum"):
        split_assign(ds, key="doc_id", fractions={"a": 0.5, "b": 0.4})

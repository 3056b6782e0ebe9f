"""Quantiles / distinct-count sketches / LAG windows / semi-anti joins:
semantics, partition-count invariance, HLL-vs-exact accuracy, and a
driver-style DuckDB oracle compare at sf0.001 for the new SQL-oracled
queries."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

SF_DIR = "/root/testdata/sf0.001"


def _ds(rows: dict) -> "ray.data.Dataset":
    return ray.data.from_arrow(pa.table(rows))


# --------------------------------------------------------------------------- #
# quantiles
# --------------------------------------------------------------------------- #
def test_quantile_disc_rule_matches_duckdb():
    """The k = max(1, ceil(q*n)) order-statistic rule, on the exact cases
    used to pin DuckDB's semantics (n=10/4/3, q at both ends)."""
    import duckdb

    from nightcrawlercmd_ray.stages.quantiles import exact_quantiles

    con = duckdb.connect()
    rng = np.random.default_rng(11)
    for n in (3, 4, 10, 101):
        vals = rng.integers(0, 50, size=n)
        df = pd.DataFrame({"v": vals})
        qs = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]
        o = con.sql(
            "SELECT " + ", ".join(
                f"quantile_disc(v, {q}) AS q{i}" for i, q in enumerate(qs)
            ) + " FROM df"
        ).df()
        t = exact_quantiles(
            ray.data.from_pandas(df).repartition(3), "v", qs,
            out_names=[f"q{i}" for i in range(len(qs))],
        ).to_pandas()
        assert t.astype("int64").equals(o.astype("int64")), (n, t, o)


@pytest.mark.parametrize("nparts", [1, 4, 16])
def test_quantiles_partition_invariant(nparts):
    from nightcrawlercmd_ray.stages.quantiles import exact_quantiles

    rng = np.random.default_rng(5)
    vals = rng.integers(0, 1000, size=20_000)
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(nparts)
    t = exact_quantiles(ds, "v", [0.5, 0.9], out_names=["p50", "p90"]).to_pandas()
    assert t["p50"].iloc[0] == np.sort(vals)[max(1, -(-len(vals) // 2)) - 1]


def test_grouped_quantiles_vs_duckdb():
    import duckdb

    from nightcrawlercmd_ray.stages.quantiles import exact_quantiles

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "g": rng.choice(["x", "y", "z"], size=5_000),
        "v": rng.integers(0, 200, size=5_000),
    })
    t = exact_quantiles(
        ray.data.from_pandas(df).repartition(8), "v", [0.25, 0.9],
        by_col="g", out_names=["p25", "p90"],
    ).to_pandas()
    con = duckdb.connect()
    o = con.sql(
        "SELECT g, quantile_disc(v, 0.25) p25, quantile_disc(v, 0.9) p90 "
        "FROM df GROUP BY g ORDER BY g"
    ).df()
    assert t.reset_index(drop=True).astype(o.dtypes.to_dict()).equals(o)


# --------------------------------------------------------------------------- #
# sketches
# --------------------------------------------------------------------------- #
def test_hll_registers_merge_and_accuracy():
    """Register fold is order/partition-free (max-merge), and the estimate
    tracks exact cardinality within the expected band away from the 2.5m
    crossover."""
    from nightcrawlercmd_ray.stages.sketches import (
        _estimate,
        _fold_registers,
        splitmix64,
    )

    rng = np.random.default_rng(3)
    keys = rng.integers(0, 1 << 62, size=200_000).astype(np.uint64)
    h = splitmix64(keys)
    whole = _fold_registers(h, 12)
    # split-fold-merge must equal whole-fold (associativity of max)
    a = _fold_registers(h[:70_000], 12)
    b = _fold_registers(h[70_000:], 12)
    assert np.array_equal(np.maximum(a, b), whole)
    exact = len(np.unique(keys))
    est = _estimate(whole)
    assert abs(est - exact) / exact < 0.08  # p=12 → ~1.6% σ; 5σ bound


def test_hll_bit_length_exact_near_powers_of_two():
    """float64 log2 mis-rounds 64-bit values just under a power of two —
    the 32-bit-split path must not (rho off-by-one breaks determinism)."""
    from nightcrawlercmd_ray.stages.sketches import _fold_registers

    p = 14
    # rest occupies 64-p = 50 bits, so testable widths cap at k=49
    for k in (49, 40, 33, 32, 31, 20):
        v = np.array([(1 << k) - 1, 1 << k], dtype=np.uint64)
        # place the test value in the rho bits: hash = v << p | register 0
        regs = _fold_registers(v << np.uint64(p), p)
        width_lo, width_hi = k, k + 1  # bit_length of 2^k-1 and 2^k
        exp_lo = (64 - p) - width_lo + 1
        exp_hi = (64 - p) - width_hi + 1
        # both landed in register 0; max of the two rhos survives — a float64
        # log2 path would report width k+1 for 2^k-1 when k ≳ 47 and fail
        assert regs[0] == max(exp_lo, exp_hi)


def test_hll_vs_exact_on_dataset():
    from nightcrawlercmd_ray.stages.sketches import hll_distinct

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 1 << 40, size=100_000)
    ds = ray.data.from_pandas(pd.DataFrame({"k": keys})).repartition(8)
    r = hll_distinct(ds, "k", p=14)
    exact = len(np.unique(keys))
    assert abs(r["estimate"] - exact) / exact < 0.05


def test_exact_distinct_by_vs_duckdb():
    import duckdb

    from nightcrawlercmd_ray.stages.sketches import exact_distinct_by

    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "t": rng.choice(["a", "b"], size=10_000),
        "k": rng.integers(0, 500, size=10_000),
    })
    got = (
        exact_distinct_by(ray.data.from_pandas(df).repartition(8), "k", "t")
        .to_pandas().sort_values("t").reset_index(drop=True)
    )
    con = duckdb.connect()
    o = con.sql(
        "SELECT t, CAST(count(DISTINCT k) AS BIGINT) n_distinct "
        "FROM df GROUP BY t ORDER BY t"
    ).df()
    assert got.astype(o.dtypes.to_dict()).equals(o)


# --------------------------------------------------------------------------- #
# windows
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("P", [1, 6])
def test_lag_deltas_semantics(P):
    from nightcrawlercmd_ray.stages.windows import lag_deltas

    ts = pd.to_datetime(
        [100, 200, 50, 400, 999], unit="s"
    )  # user 1: 50,100,200 → gaps None,50s,100s; user 2: 400,999 wait
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2],
        "ts": ts,
        "event_id": [10, 11, 12, 13, 14],
    })
    out = (
        lag_deltas(ray.data.from_pandas(df), num_partitions=P)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert out["seq"].tolist() == [2, 3, 1, 1, 2]
    gaps = out["gap_us"].tolist()
    assert np.isnan(gaps[2]) and np.isnan(gaps[3])  # first per user
    assert gaps[0] == 50_000_000 and gaps[1] == 100_000_000
    assert gaps[4] == 599_000_000


def test_lag_deltas_tie_break_on_event_id():
    from nightcrawlercmd_ray.stages.windows import lag_deltas

    df = pd.DataFrame({
        "user_id": [1, 1],
        "ts": pd.to_datetime([100, 100], unit="s"),
        "event_id": [7, 3],
    })
    out = (
        lag_deltas(ray.data.from_pandas(df), num_partitions=2)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    # equal ts → event_id orders: 3 first (gap null), 7 second (gap 0)
    assert out.loc[out["event_id"] == 3, "seq"].iloc[0] == 1
    assert out.loc[out["event_id"] == 7, "seq"].iloc[0] == 2
    assert out.loc[out["event_id"] == 7, "gap_us"].iloc[0] == 0


# --------------------------------------------------------------------------- #
# semi / anti joins
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("how,expect_keys", [
    ("semi", [1, 1, 3]),
    ("anti", [2, 9]),
])
def test_hash_join_semi_anti(how, expect_keys):
    from nightcrawlercmd_ray.stages.joins import hash_join

    left = _ds({
        "key": pa.array([1, 1, 2, 3, 9], pa.int64()),
        "x": pa.array([10, 11, 12, 13, 14], pa.int64()),
    })
    right = _ds({
        "key": pa.array([1, 3, 3, 5], pa.int64()),
        "y": pa.array([0, 0, 0, 0], pa.int64()),
    })
    out = (
        hash_join(left, right, on="key", how=how, num_partitions=3)
        .to_pandas().sort_values("key").reset_index(drop=True)
    )
    assert out["key"].tolist() == expect_keys
    assert list(out.columns) == ["key", "x"]  # right payload never emitted


def test_hash_join_anti_empty_right_keeps_all_left():
    from nightcrawlercmd_ray.stages.joins import hash_join

    left = _ds({"key": pa.array([4, 5], pa.int64()),
                "x": pa.array([1, 2], pa.int64())})
    right = _ds({"key": pa.array([], pa.int64()),
                 "y": pa.array([], pa.int64())})
    out = hash_join(left, right, on="key", how="anti", num_partitions=2)
    assert sorted(out.to_pandas()["key"].tolist()) == [4, 5]


# --------------------------------------------------------------------------- #
# driver-style oracle compares at sf0.001
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("name", [
    "order_price_quantiles",
    "doc_length_quantiles",
    "distinct_users_by_type",
    "user_event_deltas",
    "customers_without_orders",
    "user_growth_curve",
])
def test_new_queries_vs_duckdb_oracle(name):
    import duckdb

    import __ray_entry__ as entrymod

    res = entrymod.queries()[name](SF_DIR)
    if isinstance(res, ray.data.Dataset):
        df = res.to_pandas()
    elif isinstance(res, pa.Table):
        df = res.to_pandas()
    else:
        df = res
    con = duckdb.connect()
    for t in ("customer", "orders", "events", "documents"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    o = con.sql(entrymod.oracle_sql()[name]).df()
    cols = sorted(df.columns)
    assert cols == sorted(o.columns), (cols, sorted(o.columns))
    df = df[cols].sort_values(cols).reset_index(drop=True)
    o = o[cols].sort_values(cols).reset_index(drop=True)
    assert df.shape == o.shape
    for c in cols:
        a, b = df[c], o[c]
        both_na = a.isna().values & b.isna().values
        assert ((a.values == b.values) | both_na).all(), c


# --------------------------------------------------------------------------- #
# rolling window sum / histogram / doc frequency / rollup (round-2 additions)
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("nparts", [1, 5])
def test_rolling_sum_semantics_and_partition_invariance(nparts):
    """Window clips at each key's start; result invariant to partitioning."""
    from nightcrawlercmd_ray.stages.windows import rolling_sum

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:01:00", "2024-01-01 00:02:00",
         "2024-01-01 00:03:00", "2024-01-01 00:00:30", "2024-01-01 00:02:30"]
    )
    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5, 6],
        "user_id": [7, 7, 7, 7, 9, 9],
        "ts": ts,
        "value": [1.00, 2.00, 4.00, 8.00, 0.50, 0.25],
    })
    out = (
        rolling_sum(ray.data.from_pandas(df).repartition(nparts), window=3,
                    num_partitions=4)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    # user 7: 100, 100+200, 100+200+400, 200+400+800; user 9: 50, 50+25
    assert out["roll_cents"].tolist() == [100, 300, 700, 1400, 50, 75]


def test_fixed_width_histogram_counts():
    from nightcrawlercmd_ray.stages.quantiles import fixed_width_histogram

    df = pd.DataFrame({"v": [0.01, 49.99, 50.00, 99.99, 100.00, 149.99, -0.01]})
    out = (
        fixed_width_histogram(
            ray.data.from_pandas(df).repartition(3), "v", bucket_cents=5000
        )
        .to_pandas().sort_values("bucket").reset_index(drop=True)
    )
    # cents // 5000: -1→bucket -1, [1,4999]→0, [5000,9999]→1, [10000,14999]→2
    assert out.set_index("bucket")["n"].to_dict() == {-1: 1, 0: 2, 1: 2, 2: 2}


def test_document_frequency_counts_docs_not_occurrences():
    from nightcrawlercmd_ray.stages.textops import document_frequency

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["Alpha alpha ALPHA beta1 gamma", "alpha delta", "delta delta"],
    })
    out = (
        document_frequency(ray.data.from_pandas(df).repartition(2))
        .to_pandas().sort_values("word").reset_index(drop=True)
    )
    got = out.set_index("word")["df"].to_dict()
    # RE_WORD = [a-zA-Z][a-z]{3,}: "beta1" tokenizes as "beta"; repeats in
    # one doc count once
    assert got == {"alpha": 2, "beta": 1, "gamma": 1, "delta": 2}


def test_rollup_levels_match_duckdb():
    import duckdb

    from nightcrawlercmd_ray.stages.rollup import rollup_sum_count

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], size=200),
        "b": rng.integers(0, 4, size=200).astype("int64"),
        "cents": rng.integers(-50, 1000, size=200).astype("int64"),
    })
    out = (
        rollup_sum_count(ray.data.from_pandas(df).repartition(7),
                         keys=["a", "b"], value_col="cents")
        .to_pandas()
    )
    o = duckdb.sql(
        "SELECT a, b, CAST(sum(cents) AS BIGINT) AS total, count(*) AS n "
        "FROM df GROUP BY ROLLUP(a, b)"
    ).df()

    def canon(d):
        d = d.copy()
        d["a"] = d["a"].fillna("\x00")
        d["b"] = d["b"].fillna(-999).astype("int64")
        return d.sort_values(["a", "b"]).reset_index(drop=True).astype(
            {"total": "int64", "n": "int64"}
        )

    assert canon(out).equals(canon(o))


def test_default_quantile_names_edge_values():
    """ADVICE r2: q=1.0 must not yield 'p1.0' nor 0.999 'p999'."""
    from nightcrawlercmd_ray.stages.quantiles import _default_qname

    assert _default_qname(0.25) == "p25"
    assert _default_qname(0.5) == "p50"
    assert _default_qname(0.05) == "p05"
    assert _default_qname(1.0) == "p100"
    assert _default_qname(0.999) == "p99_9"
    assert _default_qname(0.0) == "p00"


# --------------------------------------------------------------------------- #
# CCNet-style word-rank quality buckets
# --------------------------------------------------------------------------- #
def test_word_rank_buckets_vs_serial_oracle():
    """Integer word-rank LM proxy vs an in-process serial oracle: rank table
    = top_v by (count desc, word asc); unknown words score top_v+1; bucket
    thresholds are integer cross-multiplications; zero-token docs are head;
    result is partition-count invariant."""
    import re
    from collections import Counter

    import pyarrow as pa
    import ray

    from nightcrawlercmd_ray.functions.extractors import RE_WORD
    from nightcrawlercmd_ray.stages.textops import word_rank_buckets

    docs = [
        (0, "apple apple apple banana banana cherry"),
        (1, "apple zebra quokka xylophone"),          # mostly unknown
        (2, "apple banana apple banana apple banana"),
        (3, "zz q"),                                  # no >=4-char words
        (4, ""),
        (5, "apple apple apple"),                     # pure rank-1 → head
    ]
    top_v, head_max, middle_max = 2, 1, 2

    cnt: Counter = Counter()
    for _, text in docs:
        cnt.update(w.lower() for w in RE_WORD.findall(text))
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:top_v]
    rank = {w: i + 1 for i, (w, _) in enumerate(top)}
    expect = {}
    for did, text in docs:
        ws = [w.lower() for w in RE_WORD.findall(text)]
        n, s = len(ws), sum(rank.get(w, top_v + 1) for w in ws)
        b = ("head" if s <= head_max * n
             else "middle" if s <= middle_max * n else "tail")
        expect[did] = (n, s, b)

    t = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                  "text": pa.array([x for _, x in docs], pa.string())})
    for parts in (1, 3):
        ds = ray.data.from_arrow(t).repartition(parts)
        out = (word_rank_buckets(ds, top_v=top_v, head_max=head_max,
                                 middle_max=middle_max)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        for _, row in out.iterrows():
            n, s, b = expect[row["doc_id"]]
            assert (row["n_tokens"], row["sum_rank"], row["bucket"]) == (n, s, b), row["doc_id"]

    # the crafted corpus exercises all three buckets + the zero-token edge
    assert {b for _, _, b in expect.values()} == {"head", "middle", "tail"}
    assert expect[4] == (0, 0, "head")


def test_dsir_scores_exact_and_hashed_modes():
    """DSIR importance masses vs a serial oracle (exact-string mode), and
    the K-bucket hashed mode: same shuffle/broadcast shape, per-doc masses
    must be >= the exact mode's (bucket collisions only ever merge
    features) and equal when K is collision-free large; both modes
    partition-count invariant."""
    import re
    from collections import Counter

    import pyarrow as pa
    import ray

    from nightcrawlercmd_ray.stages.textops import dsir_scores

    word_re = re.compile(r"[a-z]+")
    docs = [
        (0, "en", "the cat sat on the mat"),
        (1, "de", "der hund sitzt auf der matte"),
        (2, "en", "the cat ran off the mat"),
        (3, "fr", "zz"),                      # no bigrams
    ]

    # serial oracle (exact-string features)
    raw: Counter = Counter()
    tgt: Counter = Counter()
    def feats(s):
        ts = word_re.findall(s.lower())
        return [f"{a} {b}" for a, b in zip(ts, ts[1:])]
    for _, lg, s in docs:
        raw.update(feats(s))
        if lg == "en":
            tgt.update(feats(s))
    expect = {d: (len(feats(s)), sum(raw[f] for f in feats(s)),
                  sum(tgt[f] for f in feats(s))) for d, _, s in docs}

    t = pa.table({"doc_id": pa.array([d for d, _, _ in docs], pa.int64()),
                  "lang": pa.array([l for _, l, _ in docs], pa.string()),
                  "text": pa.array([s for _, _, s in docs], pa.string())})
    for parts in (1, 3):
        ds = ray.data.from_arrow(t).repartition(parts)
        out = (dsir_scores(ds, target_lang="en")
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        for _, r in out.iterrows():
            assert (r.n_bigrams, r.raw_mass, r.tgt_mass) == expect[r.doc_id]

    # the target slice genuinely separates: en docs carry more tgt mass
    assert expect[0][2] > expect[1][2] and expect[3] == (0, 0, 0)

    # hashed mode: masses dominate exact masses; huge K ≡ exact
    ds = ray.data.from_arrow(t)
    hashed = (dsir_scores(ds, target_lang="en", n_buckets=4)
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for _, r in hashed.iterrows():
        en, er, et = expect[r.doc_id]
        assert r.n_bigrams == en and r.raw_mass >= er and r.tgt_mass >= et
    big = (dsir_scores(ds, target_lang="en", n_buckets=1 << 61)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for _, r in big.iterrows():
        assert (r.n_bigrams, r.raw_mass, r.tgt_mass) == expect[r.doc_id]


# --- percentile_rank ---------------------------------------------------------


def test_percentile_rank_matches_serial_and_partition_invariant():
    import numpy as np
    import pyarrow as pa
    import ray

    from nightcrawlercmd_ray.stages.quantiles import percentile_rank

    rng = np.random.default_rng(9)
    vals = rng.integers(0, 40, 500)  # heavy ties on purpose
    t = pa.table({
        "id": pa.array(np.arange(500), pa.int64()),
        "v": pa.array(vals, pa.int64()),
    })
    # serial oracle: percent_rank = (#strictly smaller) / (n-1)
    expect = {
        i: float((vals < v).sum()) / (len(vals) - 1)
        for i, v in enumerate(vals)
    }
    for blocks in (1, 8):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = percentile_rank(ds, "v").to_pandas()
        got = dict(zip(out["id"], out["pct_rank"]))
        assert got == expect  # bit-exact (single int/int division)
    # edges: min value ranks 0.0; max value ranks (n - ties_at_max)/(n-1)
    assert min(expect.values()) == 0.0


def test_percentile_rank_single_row_and_empty():
    import pyarrow as pa
    import pytest as _pytest
    import ray

    from nightcrawlercmd_ray.stages.quantiles import percentile_rank

    one = ray.data.from_arrow(pa.table({"v": pa.array([7], pa.int64())}))
    out = percentile_rank(one, "v").to_pandas()
    assert list(out["pct_rank"]) == [0.0]
    empty = ray.data.from_arrow(pa.table({"v": pa.array([], pa.int64())}))
    with _pytest.raises(ValueError, match="no rows"):
        percentile_rank(empty, "v")


# --- hll_distinct_by ---------------------------------------------------------


def test_hll_distinct_by_accuracy_and_partition_invariance():
    import numpy as np
    import pyarrow as pa
    import ray

    from nightcrawlercmd_ray.stages.sketches import hll_distinct_by

    rng = np.random.default_rng(13)
    groups = rng.choice([1, 2, 3], 30_000, p=[0.6, 0.3, 0.1])
    # per-group distinct cardinality differs by an order of magnitude
    keys = np.where(groups == 1, rng.integers(0, 8000, 30_000),
                    np.where(groups == 2, rng.integers(0, 800, 30_000),
                             rng.integers(0, 50, 30_000)))
    t = pa.table({"g": pa.array(groups, pa.int64()),
                  "k": pa.array(keys, pa.int64())})
    exact = {
        g: len(np.unique(keys[groups == g])) for g in (1, 2, 3)
    }
    results = []
    for blocks in (1, 12):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = hll_distinct_by(ds, "k", "g", p=12).to_pandas()
        got = dict(zip(out["g"], out["n_distinct_approx"]))
        for g, n in exact.items():
            assert abs(got[g] - n) / n < 0.05, (g, got[g], n)
        results.append(got)
    # register max-merge is associative+commutative → bit-identical estimate
    assert results[0] == results[1]


def test_hll_distinct_by_matches_global_hll_per_group():
    import numpy as np
    import pyarrow as pa
    import ray

    from nightcrawlercmd_ray.stages.sketches import hll_distinct, hll_distinct_by

    rng = np.random.default_rng(4)
    keys = rng.integers(0, 3000, 8000)
    t = pa.table({"g": pa.array(np.ones(8000, np.int64)),
                  "k": pa.array(keys, pa.int64())})
    ds = ray.data.from_arrow(t).repartition(5)
    grouped = hll_distinct_by(ds, "k", "g", p=12).to_pandas()
    solo = hll_distinct(ds, "k", p=12)
    # one group ⇒ the grouped estimate IS the global estimate, bit-equal
    assert float(grouped["n_distinct_approx"].iloc[0]) == solo["estimate"]


# --------------------------------------------------------------------------- #
# cumulative distinct (growth curve) — round-3 addition
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("nparts", [1, 7])
def test_cumulative_distinct_semantics_and_partition_invariance(nparts):
    from nightcrawlercmd_ray.stages.windows import cumulative_distinct

    rng = np.random.default_rng(7)
    n = 400
    base = 1_700_000_000
    ts = base + rng.integers(0, 5 * 86400, n)
    keys = rng.integers(0, 60, n)
    ds = _ds({"user_id": keys, "ts": ts}).repartition(nparts)
    got = (
        cumulative_distinct(ds, key_col="user_id", ts_col="ts", bucket_s=86400)
        .to_pandas()
        .sort_values("bucket_start_s")
        .reset_index(drop=True)
    )
    # serial oracle: first-seen bucket per key, then cumulative counts
    df = pd.DataFrame({"k": keys, "b": (ts // 86400) * 86400})
    fs = df.groupby("k")["b"].min()
    per_bucket = fs.value_counts().sort_index()
    assert list(got["bucket_start_s"]) == list(per_bucket.index)
    assert list(got["n_new"]) == list(per_bucket.values)
    assert list(got["n_cum"]) == list(per_bucket.cumsum().values)
    # monotone, ends at global distinct count
    assert got["n_cum"].iloc[-1] == len(fs)


@pytest.mark.parametrize("nparts", [1, 6])
def test_late_events_vs_serial_with_cross_part_carry(nparts):
    """Watermark/late-data flag (stages/windows.late_events): equal to the
    serial shifted-cummax at any partitioning, including watermarks carried
    ACROSS part_span boundaries (a huge early timestamp must flag rows in
    later parts)."""
    from nightcrawlercmd_ray.stages.windows import late_events

    rng = np.random.default_rng(13)
    n = 3000
    ids = np.arange(n, dtype=np.int64)
    base = 1_700_000_000_000_000
    ts = base + ids * 1_000_000 + rng.integers(0, 500_000, n)
    ts[7] += 3_600_000_000  # an early outlier: everything within the next
    # hour of arrivals (across many 256-row parts) is late at 60s lateness
    ts[2000:2010] -= 7_200_000_000  # a late burst far from the outlier
    perm = rng.permutation(n)  # shuffled row order, (id, ts) pairing intact
    t = pa.table({
        "event_id": pa.array(ids[perm]),
        "ts": pa.array(ts[perm]).cast(pa.timestamp("us")),
    })
    lateness = 60_000_000
    wm = np.maximum.accumulate(np.concatenate([[0], ts[:-1]]))
    exp_late = ts + lateness < wm
    assert exp_late.sum() > 100  # the outlier makes a real late cohort

    out = late_events(
        ray.data.from_arrow(t).repartition(nparts),
        allowed_lateness_us=lateness, part_span=256,
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    assert np.array_equal(out["watermark_us"].to_numpy(), wm)
    assert np.array_equal(out["late"].to_numpy(), exp_late)


@pytest.mark.parametrize("nparts", [1, 5])
def test_count_min_guarantees_and_merge_invariance(nparts):
    """CM sketch: estimate ≥ exact always; ≤ exact + εN for every probed
    key (deterministic hashes, so this is checkable exactly); identical
    sketch at any partitioning (integer cell sums are associative)."""
    from nightcrawlercmd_ray.stages.sketches import (
        cm_estimate,
        count_min_sketch,
    )

    rng = np.random.default_rng(21)
    # zipf-ish: few heavy keys, long tail
    keys = np.concatenate([
        np.repeat(np.arange(5, dtype=np.int64), 400),
        rng.integers(100, 5000, 4000),
    ])
    t = pa.table({"k": pa.array(keys, pa.int64())})
    width, depth = 512, 4
    sketches = []
    for p in (1, nparts):
        sk = count_min_sketch(
            ray.data.from_arrow(t).repartition(p), "k",
            width=width, depth=depth,
        )
        sketches.append(sk)
    assert np.array_equal(sketches[0], sketches[1])
    sk = sketches[0]
    probe = np.unique(keys)
    est = cm_estimate(sk, probe)
    exact = pd.Series(keys).value_counts()
    ex = exact.reindex(probe).to_numpy()
    n = len(keys)
    eps = np.e / width
    assert (est >= ex).all()
    assert (est <= ex + eps * n * depth).all()  # loose union bound
    # the heavy keys are near-exact (min-row read kills most collisions)
    heavy = cm_estimate(sk, np.arange(5, dtype=np.int64))
    assert (heavy - 400 <= 0.02 * n).all()


@pytest.mark.parametrize("nparts", [1, 5])
def test_token_offsets_vs_serial(nparts):
    """Token-offset index: exclusive prefix sums equal the serial cumsum in
    id order at any partitioning, including carry across part_span."""
    from nightcrawlercmd_ray.stages.windows import token_offsets

    rng = np.random.default_rng(17)
    n = 2000
    ids = np.arange(n, dtype=np.int64)
    texts = [" ".join(["w"] * int(k)) for k in rng.integers(1, 40, n)]
    ntok = np.array([len(t.split(" ")) for t in texts], dtype=np.int64)
    perm = rng.permutation(n)
    t = pa.table({"doc_id": pa.array(ids[perm]),
                  "text": pa.array([texts[i] for i in perm], pa.string())})
    out = token_offsets(
        ray.data.from_arrow(t).repartition(nparts), part_span=128
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp_start = np.concatenate([[0], np.cumsum(ntok[:-1])])
    assert np.array_equal(out["n_tokens"].to_numpy(), ntok)
    assert np.array_equal(out["token_start"].to_numpy(), exp_start)


def test_prefix_scan_negative_ids_consistent_parts():
    """Regression: pass A and pass B must assign NEGATIVE ids to the same
    part (Arrow divide truncates toward zero; numpy // floors — a split
    would fold a row's own value into its 'earlier arrivals' prefix)."""
    from nightcrawlercmd_ray.stages.windows import late_events, token_offsets

    n = 600
    ids = np.arange(-300, 300, dtype=np.int64)
    base = 1_700_000_000_000_000
    ts = base + (ids + 300) * 1_000_000
    ts[100] += 3_600_000_000  # outlier among the negative-id rows
    rng = np.random.default_rng(3)
    perm = rng.permutation(n)
    t = pa.table({"event_id": pa.array(ids[perm]),
                  "ts": pa.array(ts[perm]).cast(pa.timestamp("us")),
                  "text": pa.array(["a b c"] * n)})
    wm = np.maximum.accumulate(np.concatenate([[0], ts[:-1]]))
    out = late_events(ray.data.from_arrow(t), part_span=128) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    assert np.array_equal(out["watermark_us"].to_numpy(), wm)
    assert out["late"].sum() > 100  # the outlier flags the following hour

    off = token_offsets(
        ray.data.from_arrow(t.select(["event_id", "text"])),
        id_col="event_id", part_span=128,
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    assert np.array_equal(off["token_start"].to_numpy(),
                          np.arange(n, dtype=np.int64) * 3)


def test_grouping_sets_vs_duckdb_with_duplicate_set():
    """grouping_sets_sum_count: arbitrary grains match DuckDB GROUPING SETS
    including a DUPLICATED set (SQL emits it twice); unknown keys raise."""
    import duckdb

    from nightcrawlercmd_ray.stages.rollup import grouping_sets_sum_count

    rng = np.random.default_rng(31)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], 3000),
        "b": rng.integers(0, 4, 3000),
        "v": rng.integers(1, 100, 3000),
    })
    ds = ray.data.from_pandas(df).repartition(5)
    got = grouping_sets_sum_count(
        ds, keys=["a", "b"], value_col="v",
        sets=[("a", "b"), ("b",), (), ("b",)],
    ).to_pandas()
    con = duckdb.connect()
    exp = con.sql(
        "SELECT a, b, CAST(sum(v) AS BIGINT) total, count(*) n FROM df "
        "GROUP BY GROUPING SETS ((a, b), (b), (), (b))"
    ).df()
    canon = lambda d: d.sort_values(
        ["a", "b", "total"], na_position="first"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        canon(got)[["a", "b", "total", "n"]],
        canon(exp)[["a", "b", "total", "n"]], check_dtype=False)

    with pytest.raises(ValueError, match="not in"):
        grouping_sets_sum_count(ds, keys=["a"], value_col="v",
                                sets=[("zz",)])


@pytest.mark.parametrize("nparts", [1, 5])
def test_sliding_distinct_vs_serial(nparts):
    """Sliding distinct users: equals the serial expansion + set count at
    any partitioning; a user appearing twice in one window counts once."""
    from collections import defaultdict

    from nightcrawlercmd_ray.stages.slidingwindow import sliding_distinct

    rng = np.random.default_rng(43)
    n = 2000
    ts_s = 1_700_000_000 + rng.integers(0, 6 * 3600, n)
    users = rng.integers(0, 40, n)
    types = rng.choice(["a", "b"], n)
    t = pa.table({
        "event_type": pa.array(types),
        "ts": pa.array(ts_s * 1_000_000).cast(pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
    })
    out = sliding_distinct(
        ray.data.from_arrow(t).repartition(nparts), window_s=3600, slide_s=900
    ).to_pandas().sort_values(["key", "win_start_s"]).reset_index(drop=True)

    exp: dict = defaultdict(set)
    for ty, s, u in zip(types, ts_s, users):
        latest = (s // 900) * 900
        for j in range(4):
            exp[(ty, latest - j * 900)].add(u)
    exp_df = pd.DataFrame(
        [(k, w, len(us)) for (k, w), us in sorted(exp.items())],
        columns=["key", "win_start_s", "n_users"],
    )
    pd.testing.assert_frame_equal(out, exp_df, check_dtype=False)


# --------------------------------------------------------------------------- #
# wide-domain exact quantiles (stages/quantiles.exact_quantiles_wide)
# --------------------------------------------------------------------------- #
def test_wide_quantiles_match_numpy_on_high_cardinality():
    """50k distinct int64 values spread over ~2^60: the histogram-narrowing
    search must return the exact k = max(1, ceil(q·n)) order statistics
    that exact_quantiles could not hold in memory as a value histogram."""
    import math

    from nightcrawlercmd_ray.stages.quantiles import exact_quantiles_wide

    rng = np.random.RandomState(5)
    v = ((rng.randint(0, 1 << 30, 50_000).astype(np.int64) << 30)
         + rng.randint(0, 1 << 30, 50_000))
    ds = _ds({"v": pa.array(v)}).repartition(8)
    qs = [0.01, 0.25, 0.5, 0.9, 0.999, 1.0]
    got = exact_quantiles_wide(ds, "v", qs).to_pandas().iloc[0].tolist()
    sv = np.sort(v)
    assert got == [int(sv[max(1, math.ceil(q * len(v))) - 1]) for q in qs]


@pytest.mark.parametrize("nparts", [1, 9])
def test_wide_quantiles_equal_exact_quantiles_small_domain(nparts):
    from nightcrawlercmd_ray.stages.quantiles import (
        exact_quantiles,
        exact_quantiles_wide,
    )

    rng = np.random.RandomState(11)
    v = rng.randint(-50, 150, 4000).astype(np.int64)
    ds = _ds({"v": pa.array(v)}).repartition(nparts)
    qs = [0.0, 0.1, 0.5, 0.75, 1.0]
    a = exact_quantiles(ds, "v", qs).to_pandas().iloc[0].tolist()
    b = exact_quantiles_wide(ds, "v", qs).to_pandas().iloc[0].tolist()
    assert a == b


def test_wide_quantiles_nulls_negatives_and_edges():
    from nightcrawlercmd_ray.stages.quantiles import exact_quantiles_wide

    t = pa.table({"v": pa.array([-5, None, -1, 3, None, 7, -5], pa.int64())})
    got = (exact_quantiles_wide(ray.data.from_arrow(t), "v", [0.5, 1.0])
           .to_pandas().iloc[0].tolist())
    assert got == [-1, 7]
    one = pa.table({"v": pa.array([42], pa.int64())})
    assert (exact_quantiles_wide(ray.data.from_arrow(one), "v", [0.0, 1.0])
            .to_pandas().iloc[0].tolist()) == [42, 42]
    empty = pa.table({"v": pa.array([], pa.int64())})
    with pytest.raises(ValueError, match="no rows"):
        exact_quantiles_wide(ray.data.from_arrow(empty), "v", [0.5])


def test_wide_quantiles_bounded_passes_tiny_buckets():
    """max_buckets=4 forces the maximum narrowing depth — convergence and
    exactness must survive the deepest recursion."""
    import math

    from nightcrawlercmd_ray.stages.quantiles import exact_quantiles_wide

    rng = np.random.RandomState(3)
    v = rng.randint(-(1 << 40), 1 << 40, 5000).astype(np.int64)
    ds = _ds({"v": pa.array(v)}).repartition(4)
    got = (exact_quantiles_wide(ds, "v", [0.25, 0.5], max_buckets=4,
                                max_passes=64)
           .to_pandas().iloc[0].tolist())
    sv = np.sort(v)
    assert got == [int(sv[max(1, math.ceil(q * len(v))) - 1])
                   for q in (0.25, 0.5)]


def test_wide_quantiles_full_int64_hash_domain():
    """Regression: a column spanning nearly the whole int64 range (64-bit
    hashes viewed as int64 — half negative) made interval arithmetic
    overflow np.int64 and mis-bucket the narrowing search."""
    import math

    from nightcrawlercmd_ray.stages.quantiles import exact_quantiles_wide

    rng = np.random.RandomState(21)
    v = rng.randint(0, 1 << 63, 20_000, dtype=np.uint64)
    v = (v << np.uint64(1)).view(np.int64)  # spread over ±2^63
    ds = _ds({"v": pa.array(v)}).repartition(6)
    qs = [0.05, 0.5, 0.95, 1.0]
    got = exact_quantiles_wide(ds, "v", qs).to_pandas().iloc[0].tolist()
    sv = np.sort(v)
    assert got == [int(sv[max(1, math.ceil(q * len(v))) - 1]) for q in qs]


@pytest.mark.parametrize("nparts", [1, 9])
def test_grouped_wide_quantiles_match_numpy(nparts):
    import math

    from nightcrawlercmd_ray.stages.quantiles import exact_quantiles_wide_by

    rng = np.random.RandomState(9)
    n = 12_000
    g = rng.choice(["en", "de", "fr"], n)
    v = rng.randint(0, 1 << 63, n, dtype=np.uint64)
    v = (v << np.uint64(1)).view(np.int64)  # full ±2^63 domain per group
    ds = _ds({"lang": pa.array(g), "v": pa.array(v)}).repartition(nparts)
    qs = [0.1, 0.5, 0.99]
    out = (exact_quantiles_wide_by(ds, "v", qs, by_col="lang")
           .to_pandas().set_index("lang"))
    for lang in ("en", "de", "fr"):
        sv = np.sort(v[g == lang])
        assert out.loc[lang].tolist() == [
            int(sv[max(1, math.ceil(q * len(sv))) - 1]) for q in qs]


def test_grouped_wide_quantiles_nulls_and_single_row_groups():
    from nightcrawlercmd_ray.stages.quantiles import (
        exact_quantiles,
        exact_quantiles_wide_by,
    )

    t = pa.table({
        "g": pa.array(["a", "a", "a", "b", "b"]),
        "v": pa.array([5, None, -3, 42, None], pa.int64()),
    })
    out = (exact_quantiles_wide_by(ray.data.from_arrow(t), "v",
                                   [0.5, 1.0], by_col="g")
           .to_pandas().set_index("g"))
    assert out.loc["a"].tolist() == [-3, 5]
    assert out.loc["b"].tolist() == [42, 42]
    # small-domain equality with the bounded-distinct grouped histogram
    rng = np.random.RandomState(3)
    t2 = pa.table({
        "g": pa.array(rng.choice(["x", "y"], 3000)),
        "v": pa.array(rng.randint(-40, 40, 3000).astype(np.int64)),
    })
    ds2 = ray.data.from_arrow(t2).repartition(4)
    a = (exact_quantiles(ds2, "v", [0.25, 0.9], by_col="g")
         .to_pandas().sort_values("g").reset_index(drop=True))
    b = (exact_quantiles_wide_by(ds2, "v", [0.25, 0.9], by_col="g")
         .to_pandas().sort_values("g").reset_index(drop=True))
    assert a["p25"].tolist() == b["p25"].tolist()
    assert a["p90"].tolist() == b["p90"].tolist()


# --------------------------------------------------------------------------- #
# window_ranks (ranking-window family)
# --------------------------------------------------------------------------- #
def _ranks_oracle(df, k):
    import pandas as pd

    out = df.sort_values(["key", "val", "id"]).reset_index(drop=True)
    g = out.groupby("key")
    out["row_num"] = g.cumcount() + 1
    out["rnk"] = g["val"].rank(method="min").astype(int)
    out["dense_rnk"] = g["val"].rank(method="dense").astype(int)

    def ntile(s):
        n = len(s)
        q, r = divmod(n, k)
        tiles = []
        for i in range(k):
            tiles.extend([i + 1] * ((q + 1) if i < r else q))
        return pd.Series(tiles[:n], index=s.index)

    out["tile"] = g["row_num"].transform(ntile)
    return out


@pytest.mark.parametrize("P", [1, 5])
def test_window_ranks_vs_pandas(P):
    import pandas as pd

    from nightcrawlercmd_ray.stages.windows import window_ranks

    rng = np.random.default_rng(11)
    n = 400
    df = pd.DataFrame({
        "key": rng.integers(0, 12, n),
        "id": np.arange(n),
        "val": rng.integers(0, 9, n),  # heavy ties
    })
    ds = ray.data.from_arrow(pa.table({
        "key": pa.array(df["key"], pa.int64()),
        "id": pa.array(df["id"], pa.int64()),
        "val": pa.array(df["val"], pa.int64()),
    }))
    got = (window_ranks(ds, key_col="key", val_col="val", id_col="id",
                        n_tiles=4, num_partitions=P)
           .to_pandas().sort_values(["key", "val", "id"])
           .reset_index(drop=True))
    exp = _ranks_oracle(df, 4)[got.columns]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_window_ranks_ntile_remainder_and_small_groups():
    import pandas as pd

    from nightcrawlercmd_ray.stages.windows import window_ranks

    # group of 2 with k=4 (q=0), group of 7 with k=4 (r=3)
    df = pd.DataFrame({
        "key": [1, 1, 2, 2, 2, 2, 2, 2, 2],
        "id": list(range(9)),
        "val": [5, 5, 1, 1, 2, 2, 3, 3, 3],
    })
    ds = ray.data.from_arrow(pa.table({c: pa.array(df[c], pa.int64())
                                       for c in df.columns}))
    got = (window_ranks(ds, key_col="key", val_col="val", id_col="id",
                        n_tiles=4, num_partitions=2)
           .to_pandas().sort_values(["key", "val", "id"]).reset_index(drop=True))
    assert got[got["key"] == 1]["tile"].tolist() == [1, 2]
    assert got[got["key"] == 2]["tile"].tolist() == [1, 1, 2, 2, 3, 3, 4]
    assert got[got["key"] == 1]["rnk"].tolist() == [1, 1]
    assert got[got["key"] == 2]["dense_rnk"].tolist() == [1, 1, 2, 2, 3, 3, 3]

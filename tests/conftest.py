"""Shared fixtures: ONE Ray session for the whole pytest run (required by the
driver contract), a tiny deterministic corpus, and its serial-oracle result."""

from __future__ import annotations

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    from nightcrawlercmd_ray.sources.synth import CorpusSpec, generate_corpus

    d = str(tmp_path_factory.mktemp("corpus_tiny"))
    spec = CorpusSpec(n_pages=150, n_hosts=8)
    manifest = generate_corpus(d, spec)
    manifest["spec"] = spec
    return manifest


@pytest.fixture(scope="session")
def tiny_universe(tiny_corpus):
    import pyarrow.parquet as pq

    from nightcrawlercmd_ray.oracle.crawl_oracle import universe_from_tables

    d = tiny_corpus["dir"]
    return universe_from_tables(
        pq.read_table(f"{d}/pages.parquet"), pq.read_table(f"{d}/fetch_meta.parquet")
    )


@pytest.fixture(scope="session")
def tiny_oracle(tiny_corpus, tiny_universe):
    from nightcrawlercmd_ray.oracle.crawl_oracle import CrawlParams, crawl_oracle

    params = CrawlParams(seeds=tiny_corpus["seeds"])
    return params, crawl_oracle(tiny_universe, params)


@pytest.fixture
def ray_docs_ds():
    import pyarrow as pa
    import ray

    return ray.data.from_arrow(
        pa.table({
            "doc_id": pa.array(list(range(30)), pa.int64()),
            "text": pa.array([f"doc {i} body" for i in range(30)], pa.string()),
        })
    )

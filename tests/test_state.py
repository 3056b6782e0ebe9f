import numpy as np
import pyarrow as pa

from nightcrawlercmd_ray.state.cuckoo import CuckooFilter, ExactSeenFilter
from nightcrawlercmd_ray.state.frontier import FrontierConfig, FrontierShard
from nightcrawlercmd_ray.state.robots import parse_robots, url_path


def test_cuckoo_no_false_negatives_and_low_fpr():
    cf = CuckooFilter(50_000)
    new = sum(cf.add_if_new(i) for i in range(50_000))
    assert all(cf.contains(i) for i in range(50_000))
    assert new >= 50_000 * 0.999  # in-set FP < 0.1%
    fresh_fp = sum(cf.contains(i) for i in range(10**6, 10**6 + 50_000))
    assert fresh_fp < 50_000 * 0.005


def test_cuckoo_serialize_roundtrip():
    cf = CuckooFilter(1000)
    for i in range(900):
        cf.add_if_new(i)
    rt = CuckooFilter.from_bytes(cf.to_bytes())
    assert len(rt) == len(cf)
    assert all(rt.contains(i) for i in range(900))
    # resume-determinism: same inserts after restore behave identically
    a, b = cf.add_batch(np.arange(900, 1000)), rt.add_batch(np.arange(900, 1000))
    assert (a == b).all()


def test_cuckoo_overflow_keeps_correctness():
    cf = CuckooFilter(64)  # deliberately tiny
    for i in range(1000):
        cf.add_if_new(i)
    assert all(cf.contains(i) for i in range(1000))


def test_exact_filter():
    f = ExactSeenFilter()
    assert f.add_if_new(1) and not f.add_if_new(1)
    rt = ExactSeenFilter.from_bytes(f.to_bytes())
    assert rt.contains(1) and len(rt) == 1


def test_robots_rules():
    r = parse_robots(
        b"# c\nUser-agent: google\nDisallow: /\n"
        b"User-agent: *\nDisallow: /private/\nAllow: /private/pub/\nCrawl-delay: 1.5\n"
    )
    assert not r.allowed("/private/x")
    assert r.allowed("/private/pub/x")  # longest match wins
    assert r.allowed("/")  # the google group does not apply
    assert r.crawl_delay_ms == 1500
    assert parse_robots(b"").allowed("/anything")
    assert url_path("http://h/a/b?q=1") == "/a/b?q=1"


def _cand(rows):
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "host": pa.array([r[1] for r in rows], pa.string()),
            "src_seq": pa.array([r[2] for r in rows], pa.int64()),
            "link_pos": pa.array([r[3] for r in rows], pa.int32()),
            "depth": pa.array([r[4] for r in rows], pa.int32()),
        }
    )


def test_frontier_order_insensitive_to_arrival():
    cfg = FrontierConfig(seen_filter="exact", respect_robots=False)
    rows = [
        (f"http://h{i % 3}.test/p/{i}", f"h{i % 3}.test", i, 0, 0) for i in range(30)
    ]
    s1 = FrontierShard(0, cfg)
    s1.add_candidates(_cand(rows))
    s1.seal_wave()
    s2 = FrontierShard(0, cfg)
    s2.add_candidates(_cand(rows[17:]))  # arrival split + reordered
    s2.add_candidates(_cand(rows[:17]))
    s2.seal_wave()
    w1, w2 = s1.emit_wave(), s2.emit_wave()
    assert w1.equals(w2)


def test_frontier_dedup_and_politeness_budget():
    cfg = FrontierConfig(
        seen_filter="exact", respect_robots=False, window_ms=2000, default_delay_ms=500
    )
    sh = FrontierShard(0, cfg)
    rows = [(f"http://a.test/{i}", "a.test", i, 0, 0) for i in range(10)]
    rows += rows[:3]  # duplicates
    sh.add_candidates(_cand(rows))
    sh.seal_wave()
    assert sh.stats()["dup_dropped"] == 3
    w = sh.emit_wave()
    assert w.num_rows == 4  # 2000/500 budget per wave
    assert w.column("url").to_pylist() == [f"http://a.test/{i}" for i in range(4)]
    w2 = sh.emit_wave()
    assert w2.column("url").to_pylist() == [f"http://a.test/{i}" for i in range(4, 8)]


def test_frontier_checkpoint_roundtrip():
    cfg = FrontierConfig(seen_filter="cuckoo", respect_robots=False, keep_seen_log=True)
    sh = FrontierShard(3, cfg)
    rows = [(f"http://h{i % 4}.test/p/{i}", f"h{i % 4}.test", i, 0, 1) for i in range(40)]
    sh.add_candidates(_cand(rows))
    sh.seal_wave()
    sh.emit_wave()
    blob = sh.checkpoint_bytes()
    sh2 = FrontierShard(3, cfg)
    sh2.restore_bytes(blob)
    assert sh2.stats() == sh.stats()
    assert sh2.emit_wave().equals(sh.emit_wave())


def test_cuckoo_add_batch_equals_scalar_sequence():
    """Vectorized add_batch must reproduce the per-item add_if_new sequence
    exactly — including in-batch duplicates and fingerprint collisions."""
    import numpy as np

    from nightcrawlercmd_ray.state.cuckoo import CuckooFilter

    rng = np.random.RandomState(3)
    # small capacity forces evictions + overflow paths
    a = CuckooFilter(capacity=2000, seed=5)
    b = CuckooFilter(capacity=2000, seed=5)
    for _ in range(4):
        batch = rng.randint(0, 1 << 20, size=3000).astype(np.uint64)
        got = a.add_batch(batch)
        want = np.array([b.add_if_new(int(h)) for h in batch])
        assert (got == want).all()
        assert len(a) == len(b)
    assert a.to_bytes() == b.to_bytes()


def test_bloom_no_false_negatives_and_low_fpr():
    from nightcrawlercmd_ray.state.cuckoo import BloomSeenFilter

    bf = BloomSeenFilter(50_000)
    import numpy as np
    rng = np.random.RandomState(1)
    ins = rng.randint(0, 2**63, 50_000, dtype=np.int64).astype(np.uint64)
    bf.add_batch(ins)
    assert all(bf.contains(int(h)) for h in ins[:2000])  # no false negatives
    probe = rng.randint(0, 2**63, 20_000, dtype=np.int64).astype(np.uint64)
    fresh = np.setdiff1d(probe, ins)
    fpr = sum(bf.contains(int(h)) for h in fresh[:5000]) / 5000
    assert fpr < 0.01


def test_bloom_serialize_roundtrip_and_batch_semantics():
    import numpy as np

    from nightcrawlercmd_ray.state.cuckoo import BloomSeenFilter

    bf = BloomSeenFilter(1000)
    h = np.array([5, 7, 5, 9, 7, 11], dtype=np.uint64)
    new = bf.add_batch(h)
    # first-wins within the batch; repeats are dups
    assert new.tolist() == [True, True, False, True, False, True]
    assert bf.add_if_new(11) is False and bf.add_if_new(13) is True
    rt = BloomSeenFilter.from_bytes(bf.to_bytes())
    assert rt.m == bf.m and rt.k == bf.k and len(rt) == len(bf)
    assert all(rt.contains(x) for x in (5, 7, 9, 11, 13))
    # scalar sequence ≡ batch on a fresh filter
    bf2 = BloomSeenFilter(1000)
    assert [bf2.add_if_new(int(x)) for x in h.tolist()] == new.tolist()


def test_crawl_with_bloom_filter_matches_exact(tiny_corpus, tmp_path):
    """seen_filter='bloom' at default capacity: deterministic, and at this
    corpus size the fp rate is ~0 so the crawl equals the exact-mode crawl."""
    import pandas as pd

    from nightcrawlercmd_ray.oracle.crawl_oracle import CrawlParams
    from nightcrawlercmd_ray.pipelines.crawl import run_crawl

    params = CrawlParams(seeds=tiny_corpus["seeds"])
    a = run_crawl(tiny_corpus["dir"], params, store_dir=str(tmp_path / "s1"),
                  num_shards=2, num_buckets=4, seen_filter="exact")
    b = run_crawl(tiny_corpus["dir"], params, store_dir=str(tmp_path / "s2"),
                  num_shards=2, num_buckets=4, seen_filter="bloom")
    cols = ["seq", "url", "status"]
    fa = a.fetches_dataset().to_pandas()[cols].sort_values("seq").reset_index(drop=True)
    fb = b.fetches_dataset().to_pandas()[cols].sort_values("seq").reset_index(drop=True)
    pd.testing.assert_frame_equal(fb, fa)

"""Crawler-trap detection: serial oracle, partition invariance, threshold
boundaries (exactly min_urls, exactly the dup ratio), URL-signal parsing."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray

from nightcrawlercmd_ray.stages.traps import _url_signals, host_trap_signals


def test_url_signals_parsing():
    assert _url_signals("http://A.Example.com/a/b/c?x=1") == \
        ("a.example.com", 3, True)
    assert _url_signals("http://h.example/") == ("h.example", 0, False)
    assert _url_signals("http://h.example") == ("h.example", 0, False)
    # query only, no path
    assert _url_signals("http://h.example/?s=1") == ("h.example", 0, True)
    # repeated slashes collapse to non-empty segments only
    host, depth, q = _url_signals("http://h.example//a//b")
    assert (host, q) == ("h.example", False) and depth == 2


def _mk(n_hosts=6, per_host=30, trap_hosts=(0, 1)):
    urls, texts = [], []
    for h in range(n_hosts):
        for i in range(per_host):
            q = "?sid=9" if i % 3 == 0 else ""
            urls.append(f"http://h{h}.example/" +
                        "/".join(f"s{j}" for j in range(i % 4 + 1)) + q)
            texts.append(f"pool {i % 5}" if h in trap_hosts
                         else f"unique {h}/{i}")
    return pa.table({"url": pa.array(urls), "text": pa.array(texts)})


def _serial(t: pa.Table, min_urls=10, dup_num=1, dup_den=2):
    agg: dict[str, list] = {}
    for u, txt in zip(t.column("url").to_pylist(),
                      t.column("text").to_pylist()):
        host, depth, has_q = _url_signals(u)
        a = agg.setdefault(host, [0, set(), 0, 0])
        a[0] += 1
        a[1].add(txt)
        a[2] += depth
        a[3] += int(has_q)
    return {
        h: (n, len(c), sd, nq,
            n >= min_urls and (n - len(c)) * dup_den >= n * dup_num)
        for h, (n, c, sd, nq) in agg.items()
    }


@pytest.mark.parametrize("nparts", [1, 7])
def test_host_trap_signals_vs_serial(nparts):
    t = _mk()
    exp = _serial(t)
    out = (host_trap_signals(ray.data.from_arrow(t).repartition(nparts),
                             num_partitions=4)
           .to_pandas().set_index("host"))
    assert len(out) == len(exp)
    for h, (n, c, sd, nq, trap) in exp.items():
        r = out.loc[h]
        assert (int(r.n_urls), int(r.n_content), int(r.sum_depth),
                int(r.n_query), bool(r.is_trap)) == (n, c, sd, nq, trap), h
    # trap hosts flagged, content-rich hosts not
    assert bool(out.loc["h0.example"].is_trap)
    assert not bool(out.loc["h5.example"].is_trap)


def test_trap_thresholds_exact_boundaries():
    # exactly min_urls URLs, exactly half duplicated -> trap fires
    urls = [f"http://b.example/p{i}" for i in range(10)]
    texts = [f"u{i}" for i in range(5)] + ["d"] * 5  # 6 distinct of 10
    t = pa.table({"url": pa.array(urls), "text": pa.array(texts)})
    out = host_trap_signals(ray.data.from_arrow(t), min_urls=10,
                            dup_num=2, dup_den=5,  # ratio >= 2/5; actual 4/10
                            num_partitions=2).to_pandas()
    assert bool(out.iloc[0].is_trap) is True
    # one URL fewer -> below min_urls -> not a trap
    out2 = host_trap_signals(
        ray.data.from_arrow(t.slice(0, 9)), min_urls=10,
        dup_num=0, dup_den=1, num_partitions=2).to_pandas()
    assert bool(out2.iloc[0].is_trap) is False

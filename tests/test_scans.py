"""Scan-family pipelines: httpscan expansion/body-match, bucketscan
classifier, DNS resume anti-join, fuzzer dataset, port enumeration."""

import pyarrow as pa
import ray

from nightcrawlercmd_ray.pipelines.scans import (
    AttackVector,
    BucketProvider,
    HttpRequest,
    bucket_urls,
    classify_bucket_status,
    dns_scan_pipeline,
    expand_attack_requests,
    fuzz_payloads_dataset,
    httpscan_pipeline,
    parse_dns_history,
    parse_port_list,
    parse_raw_request,
    port_scan_pipeline,
)

VECTORS = [
    AttackVector(vector="<zq>", section="header,urlquery"),
    AttackVector(vector="%3czq%3d", test="<zq>"),
    AttackVector(vector="' and '1'='1' --", sql_injection=True),
]


def test_parse_raw_request():
    raw = "GET /a/b?x=1 HTTP/1.1\nHost: site.test\nUser-Agent: ua\n\n"
    req = parse_raw_request(raw)
    assert req.method == "GET"
    assert req.url == "http://site.test/a/b?x=1"
    req2 = parse_raw_request(raw, host="other.test", scheme="https",
                             extra_headers=["X-K: v"])
    assert req2.url.startswith("https://other.test/")
    assert req2.headers["X-K"] == "v"


def test_expand_attack_requests_sites():
    base = HttpRequest(method="GET", url="http://s.test/p1/p2?a=1&b=2",
                       headers={"User-Agent": "ua"})
    t = expand_attack_requests(base, VECTORS, scan_headers=True)
    targets = set(t.column("param_target").to_pylist())
    # every query key × every vector (mainHttpScan.go:118-130)
    assert "urlquery a" in targets and "urlquery b" in targets
    # headers when scanheader (:132-142)
    assert "header User-Agent" in targets
    # urlsegments only for vectors without a Section or with 'urlsegment' (:144-165)
    assert "urlsegment p1" in targets and "urlsegment p2" in targets
    seg_rows = t.filter(
        pa.compute.match_substring(t.column("param_target"), pattern="urlsegment")
    )
    assert "<zq>" not in set(seg_rows.column("vector").to_pylist())
    nq = len([x for x in t.column("param_target").to_pylist() if x.startswith("urlquery")])
    assert nq == 2 * len(VECTORS)


def test_httpscan_body_match():
    base = HttpRequest(url="http://s.test/x?q=1", headers={})
    lookup = {}
    t = expand_attack_requests(base, VECTORS)
    for u, v in zip(t.column("url").to_pylist(), t.column("vector").to_pylist()):
        # the simulated server reflects the query back for vector "<zq>"
        lookup[u] = (200, f"echo {v}" if "zq" in v else "clean page")
    out = httpscan_pipeline(base, VECTORS, lookup).to_pandas()
    # Found = body contains Test (or Vector when Test empty), mainHttpScan.go:183-202
    assert out[out["vector"] == "<zq>"]["found"].all()
    assert not out[out["vector"].str.contains("1'='1")]["found"].any()
    # %3czq%3d has Test "<zq>": body echoes the raw vector, test not found
    assert not out[out["vector"] == "%3czq%3d"]["found"].any()


def test_bucket_scan():
    prov = BucketProvider("aws", ["s3.example-a.test", "s3.example-b.test"],
                          no_such_bucket=404, access_denied=403)
    words = ["alpha", "beta", "gamma"]
    t = bucket_urls(prov, words, prefix="{w}-assets")
    assert t.num_rows == 6
    assert t.column("url")[0].as_py() == "https://alpha-assets.s3.example-a.test"
    t2 = bucket_urls(prov, words, url_filter="example-b")
    assert t2.num_rows == 3
    statuses = pa.table(
        {**t.to_pydict(), "status": pa.array([404, 403, 200, 404, 200, 403], pa.int16())}
    )
    out = classify_bucket_status(statuses, prov)
    assert out.column("klass").to_pylist() == [
        "not_found", "access_denied", "open", "not_found", "open", "access_denied"
    ]


def test_dns_resume_anti_join():
    hist = parse_dns_history("a.dom.test.\t1.2.3.4\nb.dom.test. found\n\n")
    assert hist == {"a.dom.test.", "b.dom.test."}
    resolver = {"c.dom.test.": ["1.1.1.1", "2.2.2.2"], "a.dom.test.": ["9.9.9.9"]}
    out = dns_scan_pipeline(["a", "b", "c", "d"], "dom.test", resolver, hist).to_pandas()
    # a and b are skipped by resume (mainDNS.go:108-119)
    assert sorted(out["word"]) == ["c", "d"]
    row_c = out[out["word"] == "c"].iloc[0]
    assert row_c["found"] and row_c["records"] == "1.1.1.1,2.2.2.2"
    assert not out[out["word"] == "d"]["found"].any()
    # {w} template form (mainDNS.go:29)
    out2 = dns_scan_pipeline(["c"], "{w}.dom.test", resolver, set()).to_pandas()
    assert out2.iloc[0]["name"] == "c.dom.test."


def test_fuzzer_dataset_matches_serial():
    from nightcrawlercmd_ray.functions.fuzzer import gen_payloads

    cfg = {"Vectors": {"b": [":", "#", "<zq>"], "3": list("abc")},
           "BuildLogic": "{3.b}", "Seed": 40039, "Iterations": 50}
    out = fuzz_payloads_dataset(cfg).to_pandas().sort_values("index")
    assert out["payload"].tolist() == gen_payloads(
        cfg["Vectors"], cfg["BuildLogic"], cfg["Seed"], cfg["Iterations"]
    )
    # partitioning must not change payloads (per-index seeding, T8)
    out2 = (
        fuzz_payloads_dataset(cfg).repartition(7).to_pandas().sort_values("index")
    )
    assert out2["payload"].tolist() == out["payload"].tolist()


def test_port_enumeration():
    assert parse_port_list("80,443,x,8080") == [80, 443, 8080]
    out = port_scan_pipeline(79, 81, {80}).to_pandas().sort_values("port")
    assert out["port"].tolist() == [79, 80, 81]
    assert out["open"].tolist() == [False, True, False]


def test_vector_and_bucket_config_loaders(tmp_path):
    vf = tmp_path / "vectors.json"
    vf.write_text('[{"Vector":"<x>","Test":"t","Section":"urlquery"},{"Vector":"v2","SqlInjection":true}]')
    vecs = AttackVector.load_file(str(vf))
    assert vecs[0].test == "t" and vecs[1].sql_injection
    bf = tmp_path / "buckets.json"
    bf.write_text('[{"Name":"p","Urls":["u.test"],"NoSuchBucket":404,"AccessDenied":403}]')
    provs = BucketProvider.load_file(str(bf))
    assert provs[0].name == "p" and provs[0].urls == ["u.test"]


def test_render_scan_report_html_and_raw_response():
    from nightcrawlercmd_ray.pipelines.scans import (
        format_raw_response,
        render_scan_report_html,
    )

    rows = [{"vector": "<zq>", "param_target": "urlquery q", "url": "http://s/x",
             "status": 200, "body": "bb", "found": True, "error": ""}]
    html = render_scan_report_html(rows)
    assert "&lt;zq&gt;" in html and "<table>" in html  # escaped, tabular (S10)
    assert "ResponseBodyLength" in html
    raw = format_raw_response(200, "hello")
    assert raw.startswith("HTTP/1.1 200 OK\r\n") and raw.endswith("hello")
    assert "Content-Length: 5" in raw

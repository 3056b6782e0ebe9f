"""Command-line surface mirroring the reference's subcommand dispatch
(``/root/reference/main.go:8-39``: crawler, report, wordlist, dns, httpscan,
bucketscan, portscan, fuzzer, httppipe, httpserver) on the Ray engine.

Run as ``python -m nightcrawlercmd_ray <tool> [flags]``. Network-edge tools
take a simulated-response table (the sandbox has no network); flag names
follow the reference where a counterpart exists.

The CLI owns the Ray session (guarded init; library code never inits).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def packaged_config(name: str) -> str:
    """Path of a vendored reference config fixture (config/README.md)."""
    return os.path.join(os.path.dirname(__file__), "config", name)


def _ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_crawler(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="crawler", description="BFS crawl of a pages corpus")
    p.add_argument("--corpus", required=True, help="dir with pages.parquet (+ fetch_meta.parquet)")
    p.add_argument("--url", default="", help="base url (scope anchor), mainCrawler.go:43")
    p.add_argument("--url-list", default="", help="seed list file, one URL per line")
    p.add_argument("--wait", type=int, default=500, help="politeness delay ms (default 500)")
    p.add_argument("--max-pages", type=int, default=-1)
    p.add_argument("--storage-path", default="./crawl_out", help="output dir (fetches/links parquet)")
    p.add_argument("--no-new-links", action="store_true")
    p.add_argument("--scoped-to-domain", action="store_true", default=True)
    p.add_argument("--no-scope", dest="scoped_to_domain", action="store_false")
    p.add_argument("--links-follow", action="append", default=[])
    p.add_argument("--links-not-follow", action="append", default=[])
    p.add_argument("--load-resources", action="store_true")
    p.add_argument("--no-robots", action="store_true")
    p.add_argument("--window-ms", type=int, default=600_000)
    p.add_argument("--shards", type=int, default=8)
    p.add_argument("--buckets", type=int, default=32)
    p.add_argument("--checkpoint", default="", help="checkpoint dir (enables resume)")
    p.add_argument("--resume", action="store_true", help="resume from --checkpoint")
    a = p.parse_args(argv)

    _ray_session()
    from .oracle.crawl_oracle import CrawlParams
    from .pipelines.crawl import CrawlRun, run_crawl

    seeds = []
    if a.url:
        seeds.append(a.url)
    if a.url_list:
        seeds += [s for s in open(a.url_list).read().split("\n") if s.strip()]
    if not seeds and not a.resume:
        print("no url or url list provided.", file=sys.stderr)  # mainCrawler.go:66
        return 2

    params = CrawlParams(
        seeds=seeds,
        base_url=a.url or None,
        scope_to_domain=a.scoped_to_domain,
        max_pages=a.max_pages,
        no_new_links=a.no_new_links,
        follow=a.links_follow,
        dont_follow=a.links_not_follow,
        load_resources=a.load_resources,
        default_delay_ms=a.wait,
        window_ms=a.window_ms,
        respect_robots=not a.no_robots,
    )
    if a.resume:
        run = CrawlRun.resume(f"{a.corpus}/_pagestore", a.checkpoint)
        run.run()
    else:
        run = run_crawl(
            a.corpus, params, num_shards=a.shards, num_buckets=a.buckets,
            checkpoint_dir=a.checkpoint or None,
        )
    run.fetches_dataset().write_parquet(f"{a.storage_path}/fetches")
    run.links_dataset().write_parquet(f"{a.storage_path}/links")
    print(json.dumps(run.stats()))
    return 0


def cmd_report(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="report")
    p.add_argument("--storage-path", default="./storage", help="corpus dir (pages.parquet)")
    p.add_argument("--reportsfolder", default="./report")
    p.add_argument("--wordlist", action="store_true")
    p.add_argument("--tagsfile", default=None)
    a = p.parse_args(argv)
    _ray_session()
    from .pipelines.report import DEFAULT_TAGS_FILE, generate_reports

    counts = generate_reports(
        a.storage_path, a.reportsfolder, wordlist=a.wordlist,
        tags_file=a.tagsfile or DEFAULT_TAGS_FILE,
    )
    print(json.dumps(counts))
    return 0


def cmd_wordlist(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="wordlist")
    p.add_argument("--input", required=True)
    p.add_argument("--output", default="wordlist.txt")
    p.add_argument("--extractor", default="word",
                   help="none, word, url, url_abs, url_rel, string, email")
    p.add_argument("--mutator", default="")
    p.add_argument("--template", default="")
    p.add_argument("--show-file-name", action="store_true")
    a = p.parse_args(argv)
    _ray_session()
    from .pipelines.wordlist import build_wordlist, write_wordlist

    ds = build_wordlist(
        a.input, extractor=a.extractor, mutator=a.mutator,
        template_file=a.template or None, show_file_name=a.show_file_name,
    )
    n = write_wordlist(ds, a.output)
    print(json.dumps({"words": n, "output": a.output}))
    return 0


def cmd_fuzzer(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="fuzzer")
    p.add_argument("--input", default=packaged_config("fuzzinginput.json"))
    p.add_argument("--output", default="", help="payload parquet dir ('' = stdout sample)")
    a = p.parse_args(argv)
    _ray_session()
    from .pipelines.scans import fuzz_payloads_dataset

    with open(a.input) as f:
        cfg = json.load(f)
    ds = fuzz_payloads_dataset(cfg)
    if a.output:
        ds.write_parquet(a.output)
        print(json.dumps({"payloads": cfg.get("Iterations", 0), "output": a.output}))
    else:
        # sort: `take` on an unordered Dataset returns whichever blocks land
        # first — the stdout sample must be deterministic run-to-run
        for r in ds.sort("index").take(10):
            print(r["index"], r["payload"])
    return 0


def cmd_dns(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="dns")
    p.add_argument("--domain", required=True)
    p.add_argument("--wordlist", required=True)
    p.add_argument("--log", default="dnsscan.log")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--resolver-table", default="", help="json {name: [records]} (simulated resolver)")
    p.add_argument("--report", default="", help="csv output ('' = append log)")
    a = p.parse_args(argv)
    _ray_session()
    import os

    from .pipelines.scans import dns_scan_pipeline, parse_dns_history

    words = [w for w in open(a.wordlist).read().split("\n") if w.strip()]
    hist = set()
    if a.resume and os.path.exists(a.log):
        hist = parse_dns_history(open(a.log).read())
    resolver = json.load(open(a.resolver_table)) if a.resolver_table else {}
    import pandas as pd

    out = dns_scan_pipeline(words, a.domain, resolver, hist).to_pandas()
    if out.empty:  # 0-row Datasets lose column names through to_pandas
        out = pd.DataFrame({"word": [], "name": [], "found": [], "records": []})
    if a.report.endswith(".xlsx"):
        # the reference's dnsReportExcel sheet shape (mainDNS.go:120-137)
        from .sources.xlsx import dns_report_rows, write_xlsx

        write_xlsx(dns_report_rows(out.to_dict("records")), a.report)
    elif a.report:
        out.to_csv(a.report, sep=";", index=False)
    else:
        with open(a.log, "a") as f:  # append-only resume log, mainDNS.go:140-160
            for _, r in out.iterrows():
                # found entries mirror DNS record lines (name first token —
                # what the resume parser keys on); misses log the bare name
                if r["found"]:
                    f.write(f"{r['name']}\t{r['records']}\n")
                else:
                    f.write(r["name"] + "\n")
    print(json.dumps({"scanned": len(out), "found": int(out["found"].sum())}))
    return 0


def cmd_bucketscan(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="bucketscan")
    p.add_argument("--provider", default="aws")
    p.add_argument("--wordlist", required=True)
    p.add_argument("--prefix", default="{w}")
    p.add_argument("--url", default="", help="override provider suffix")
    p.add_argument("--filter", default="")
    p.add_argument("--config", default=packaged_config("bucketscan.json"),
                   help="bucketscan.json")
    p.add_argument("--status-table", default="", help="json {url: status} (simulated probes)")
    a = p.parse_args(argv)
    _ray_session()
    import pyarrow as pa

    from .pipelines.scans import BucketProvider, bucket_urls, classify_bucket_status

    providers = (
        BucketProvider.load_file(a.config) if a.config
        else [BucketProvider("aws", ["s3.amazonaws.com"], 404, 403)]
    )
    prov = next((b for b in providers if b.name == a.provider), None)
    if prov is None:
        print(f"provider {a.provider} not found")  # mainBucketScan.go:84-87
        return 2
    if a.url:
        prov.urls = [a.url]
    words = [w for w in open(a.wordlist).read().split("\n") if w.strip()]
    t = bucket_urls(prov, words, prefix=a.prefix, url_filter=a.filter)
    statuses = {}
    if a.status_table:
        statuses = json.load(open(a.status_table))
    t = t.append_column(
        "status",
        pa.array([int(statuses.get(u, prov.no_such_bucket)) for u in t.column("url").to_pylist()], pa.int16()),
    )
    out = classify_bucket_status(t, prov)
    for u, k in zip(out.column("url").to_pylist(), out.column("klass").to_pylist()):
        if k != "not_found":  # reference prints denied/open only
            print(u, k)
    return 0


def cmd_httpscan(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="httpscan")
    p.add_argument("--input", default="", help="raw HTTP request file")
    p.add_argument("--url", default="")
    p.add_argument("--host", default="")
    p.add_argument("--scheme", default="")
    p.add_argument("--vectors", default=packaged_config("vectors.json"))
    p.add_argument("--report", default="report.csv")
    p.add_argument("--scanheader", action="store_true")
    p.add_argument("--responses", default="", help="json {url: [status, body]} (simulated)")
    a = p.parse_args(argv)
    _ray_session()
    from .pipelines.scans import (
        AttackVector,
        HttpRequest,
        httpscan_pipeline,
        parse_raw_request,
    )

    if a.input:
        base = parse_raw_request(
            open(a.input).read(), host=a.host or None, scheme=a.scheme or None
        )
    else:
        base = HttpRequest(url=a.url, headers={"User-Agent": "nightcrawlercmd-ray"})
    vectors = AttackVector.load_file(a.vectors)
    lookup = {}
    if a.responses:
        lookup = {u: tuple(v) for u, v in json.load(open(a.responses)).items()}
    out = httpscan_pipeline(base, vectors, lookup, scan_headers=a.scanheader).to_pandas()
    if a.report.endswith(".html"):
        from .pipelines.scans import render_scan_report_html

        out["body_len"] = out["body"].str.len()
        with open(a.report, "w") as f:
            f.write(render_scan_report_html(out.to_dict("records")))
    else:
        out.drop(columns=["body"]).to_csv(a.report, sep=";", index=False)
    print(json.dumps({"probes": len(out), "found": int(out["found"].sum())}))
    return 0


def cmd_httppipe(argv: list[str]) -> int:
    """Raw request in → (simulated) response out — mainHttpPipe.go."""
    p = argparse.ArgumentParser(prog="httppipe")
    p.add_argument("--input", required=True, help="raw HTTP request file")
    p.add_argument("--host", default="")
    p.add_argument("--scheme", default="")
    p.add_argument("-H", dest="headers", action="append", default=[])
    p.add_argument("--output", default="", help="response file ('' = stdout)")
    p.add_argument("--responses", default="", help="json {url: [status, body]}")
    a = p.parse_args(argv)
    from .pipelines.scans import format_raw_response, parse_raw_request

    req = parse_raw_request(
        open(a.input).read(), host=a.host or None, scheme=a.scheme or None,
        extra_headers=a.headers,
    )
    lookup = {u: tuple(v) for u, v in json.load(open(a.responses)).items()} if a.responses else {}
    status, body = lookup.get(req.url, (0, ""))
    raw = format_raw_response(int(status), body)
    if a.output:
        with open(a.output, "w") as f:
            f.write(raw)
    else:
        sys.stdout.write(raw)
    return 0


def cmd_portscan(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="portscan")
    p.add_argument("--start", type=int, default=79)
    p.add_argument("--end", type=int, default=81)
    p.add_argument("--portlist", default="")
    p.add_argument("--show-closed", action="store_true")
    p.add_argument("--open-table", default="", help="json [open ports] (simulated)")
    a = p.parse_args(argv)
    _ray_session()
    from .pipelines.scans import parse_port_list, port_scan_pipeline

    open_ports = set(json.load(open(a.open_table))) if a.open_table else set()
    if a.portlist:
        ports = parse_port_list(a.portlist)
        lo, hi = min(ports), max(ports)
        out = port_scan_pipeline(lo, hi, open_ports).to_pandas()
        out = out[out["port"].isin(ports)]
    else:
        out = port_scan_pipeline(a.start, a.end, open_ports).to_pandas()
    # block arrival order is not deterministic under load — the reference
    # scans sequentially (mainPortScan.go:38), so emit in port order
    out = out.sort_values("port")
    for _, r in out.iterrows():
        if r["open"] or a.show_closed:
            print(int(r["port"]), bool(r["open"]))
    return 0


def cmd_clean(argv: list[str]) -> int:
    """Engine addition (no reference counterpart): the cleanroom
    training-data prep pipeline over a documents Parquet table — dedup →
    optional line-dedup/PII-redaction → annotate → quality filter →
    resumable partitioned Parquet (pipelines/cleanroom.py)."""
    p = argparse.ArgumentParser(prog="clean")
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--min-quality", type=float, default=0.3)
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument("--minhash-threshold", type=float, default=0.8)
    p.add_argument("--partitions", type=int, default=16)
    p.add_argument("--redact-pii", action="store_true")
    p.add_argument("--dedup-lines", type=int, default=None, metavar="N",
                   help="drop repeated lines (0 = \\n lines, N>0 = N-word lines)")
    a = p.parse_args(argv)
    _ray_session()
    from .pipelines.cleanroom import cleanroom

    ds, info = cleanroom(
        a.input, a.out,
        min_quality=a.min_quality, min_tokens=a.min_tokens,
        minhash_threshold=a.minhash_threshold, num_partitions=a.partitions,
        redact_pii=a.redact_pii, dedup_lines_words=a.dedup_lines,
    )
    info["rows_out"] = ds.count()
    print(json.dumps(info))
    return 0


COMMANDS = {
    "crawler": cmd_crawler,
    "report": cmd_report,
    "wordlist": cmd_wordlist,
    "fuzzer": cmd_fuzzer,
    "dns": cmd_dns,
    "bucketscan": cmd_bucketscan,
    "httpscan": cmd_httpscan,
    "httppipe": cmd_httppipe,
    "portscan": cmd_portscan,
    "clean": cmd_clean,  # engine addition: training-data prep pipeline
}


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help") or argv[0] not in COMMANDS:
        # usage banner — main.go:11-13
        print("usage: python -m nightcrawlercmd_ray "
              f"[{'|'.join(COMMANDS)}] [flags]")
        return 0 if argv and argv[0] in ("-h", "--help") else 2
    return COMMANDS[argv[0]](argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())

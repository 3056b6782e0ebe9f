"""Scan-family tools as deterministic Dataset transforms: httpscan request
expansion + body-match, bucketscan classifier, DNS resume anti-join, fuzzer
payload generation, raw-HTTP-request parsing.

The sandbox has no network, so the I/O edge of each tool is simulated by a
response table (like the crawl's pages universe); everything up to and after
that edge — the cross-products, classifiers, joins, resume logic the reference
implements — is real and conformance-tested.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pyarrow as pa
import ray

from ..functions.fuzzer import gen_payload

# --------------------------------------------------------------------------- #
# httpscan (mainHttpScan.go) — attack-vector expansion + body-match
# --------------------------------------------------------------------------- #


@dataclass
class AttackVector:
    """config/vectors.json row shape: {Vector, Test?, SqlInjection?, Section?}
    (``mainHttpScan.go:40-46``)."""

    vector: str
    test: str = ""
    sql_injection: bool = False
    section: str = ""

    @classmethod
    def load_file(cls, path: str) -> list["AttackVector"]:
        with open(path) as f:
            raw = json.load(f)
        return [
            cls(
                vector=v.get("Vector", ""),
                test=v.get("Test", ""),
                sql_injection=bool(v.get("SqlInjection", False)),
                section=v.get("Section", ""),
            )
            for v in raw
        ]


@dataclass
class HttpRequest:
    """Parsed raw HTTP request (``readHttpRequest``, mainHttpPipe.go:81-100)."""

    method: str = "GET"
    url: str = ""
    headers: dict[str, str] = field(default_factory=dict)
    body: str = ""


def parse_raw_request(text: str, *, default_scheme: str = "http",
                      host: str | None = None, scheme: str | None = None,
                      extra_headers: list[str] | None = None) -> HttpRequest:
    """Raw request text → HttpRequest; scheme/host defaulting and ``-H``
    overrides (mainHttpPipe.go:53-61,92-99)."""
    head, _, body = text.replace("\r\n", "\n").partition("\n\n")
    lines = head.split("\n")
    method, _, rest = lines[0].partition(" ")
    target = rest.rsplit(" ", 1)[0] if " " in rest else rest
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        if ":" in ln:
            k, _, v = ln.partition(":")
            headers[k.strip()] = v.strip()
    for h in extra_headers or []:
        k, _, v = h.partition(":")
        headers[k.strip()] = v.strip()
    url = target
    if not urlsplit(url).scheme:
        url = f"{default_scheme}://{headers.get('Host', '')}{target}"
    parts = urlsplit(url)
    if host:
        parts = parts._replace(netloc=host)
    if scheme:
        parts = parts._replace(scheme=scheme)
    return HttpRequest(method=method or "GET", url=urlunsplit(parts), headers=headers)


def expand_attack_requests(
    base: HttpRequest, vectors: list[AttackVector], *, scan_headers: bool = False
) -> pa.Table:
    """The (request × vector × injection-site) cross-product
    (``scanURL``, mainHttpScan.go:114-176): every query key set to the vector;
    every header appended when ``scan_headers``; every non-empty path segment
    replaced for vectors whose Section contains ``urlsegment``. Pure
    expansion — rows feed the probe stage."""
    rows = {"url": [], "method": [], "param_target": [], "vector": [], "test": [],
            "header_key": [], "header_value": []}

    def emit(url: str, target: str, vec: AttackVector, hk: str = "", hv: str = ""):
        rows["url"].append(url)
        rows["method"].append(base.method)
        rows["param_target"].append(target)
        rows["vector"].append(vec.vector)
        rows["test"].append(vec.test if vec.test else vec.vector)
        rows["header_key"].append(hk)
        rows["header_value"].append(hv)

    parts = urlsplit(base.url)
    queries = parse_qsl(parts.query, keep_blank_values=True)
    qkeys = []
    for k, _ in queries:
        if k not in qkeys:
            qkeys.append(k)
    for key in qkeys:
        for vec in vectors:
            q = [(k, vec.vector if k == key else v) for k, v in queries]
            u = urlunsplit(parts._replace(query=urlencode(q)))
            emit(u, f"urlquery {key}", vec)
    if scan_headers:
        for hk in base.headers:
            for vec in vectors:
                emit(base.url, f"header {hk}", vec, hk, base.headers[hk] + vec.vector)
    segments = parts.path.split("/")
    for i, seg in enumerate(segments):
        if seg == "":
            continue
        for vec in vectors:
            if vec.section and "urlsegment" not in vec.section:
                continue
            new_segs = list(segments)
            new_segs[i] = vec.vector
            u = urlunsplit(parts._replace(path="/".join(new_segs)))
            emit(u, f"urlsegment {seg}", vec)
    return pa.table({k: pa.array(v, pa.string()) for k, v in rows.items()})


def body_match_stage(t: pa.Table, body_col: str = "body", test_col: str = "test") -> pa.Table:
    """``Found = strings.Index(body, test) >= 0`` (mainHttpScan.go:183-202).

    The distinct-pattern count is tiny (one per attack vector), so group rows
    by pattern and run ONE vectorized ``match_substring`` kernel per pattern
    over that pattern's rows."""
    import numpy as np
    import pyarrow.compute as pc

    bodies = pc.fill_null(t.column(body_col), "")
    tests = t.column(test_col).to_pylist()
    idx_by_pattern: dict[str, list[int]] = {}
    for i, x in enumerate(tests):
        idx_by_pattern.setdefault(x or "", []).append(i)
    found = np.zeros(t.num_rows, dtype=bool)
    for pat, idxs in idx_by_pattern.items():
        sub = bodies.take(pa.array(idxs, pa.int64()))
        m = pc.match_substring(sub, pattern=pat).to_numpy(zero_copy_only=False)
        found[np.asarray(idxs)] = m
    return t.append_column("found", pa.array(found))


def httpscan_pipeline(base: HttpRequest, vectors: list[AttackVector],
                      response_lookup, *, scan_headers: bool = False):
    """Expansion → simulated probe (response_lookup: url→(status, body)) →
    body-match. Returns a Dataset of scan results."""
    reqs = expand_attack_requests(base, vectors, scan_headers=scan_headers)
    lookup_ref = ray.put(response_lookup)

    def probe(t: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        statuses, bodies = [], []
        for u in t.column("url").to_pylist():
            s, b = lk.get(u, (0, ""))
            statuses.append(s)
            bodies.append(b)
        t = t.append_column("status", pa.array(statuses, pa.int16()))
        t = t.append_column("body", pa.array(bodies, pa.string()))
        return body_match_stage(t)

    return ray.data.from_arrow(reqs).map_batches(probe, batch_format="pyarrow")


_SCAN_REPORT_COLUMNS = (
    # the reference template's table columns — template/httpscanresult.tmpl
    ("vector", "Vector"),
    ("param_target", "ParamTarget"),
    ("url", "Url"),
    ("status", "StatusCode"),
    ("body_len", "ResponseBodyLength"),
    ("found", "Found"),
    ("error", "Error"),
)


def render_scan_report_html(results: "pa.Table | list[dict]", title: str = "httpscan") -> str:
    """HTML report sink (S10): the engine's equivalent of rendering scan
    results through ``template/httpscanresult.tmpl``
    (``mainHttpScan.go:74,105-112``) — same columns, stdlib-only render."""
    import html as _html

    if hasattr(results, "to_pylist"):
        rows = results.to_pylist()
    else:
        rows = list(results)
    out = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        f"<title>{_html.escape(title)}</title>",
        "<style>table{border-collapse:collapse}td,th{border:1px solid #999;"
        "padding:2px 6px;font:12px monospace}</style></head><body>",
        f"<h1>{_html.escape(title)}</h1><table><tr>",
    ]
    out += [f"<th>{h}</th>" for _, h in _SCAN_REPORT_COLUMNS]
    out.append("</tr>")
    for r in rows:
        r = dict(r)
        r.setdefault("body_len", len(r.get("body", "") or ""))
        r.setdefault("error", "")
        out.append("<tr>")
        for key, _ in _SCAN_REPORT_COLUMNS:
            out.append(f"<td>{_html.escape(str(r.get(key, '')))}</td>")
        out.append("</tr>")
    out.append("</table></body></html>")
    return "".join(out)


def format_raw_response(status: int, body: str, *, proto: str = "HTTP/1.1") -> str:
    """Raw HTTP response writer (S11 output side — ``resp.Write`` in
    mainHttpPipe.go:66-79): status line + minimal headers + body."""
    reason = {200: "OK", 301: "Moved Permanently", 302: "Found", 307: "Temporary Redirect",
              403: "Forbidden", 404: "Not Found", 500: "Internal Server Error"}.get(status, "")
    return (
        f"{proto} {status} {reason}\r\n"
        f"Content-Length: {len(body.encode('utf-8'))}\r\n"
        "\r\n"
        f"{body}"
    )


# --------------------------------------------------------------------------- #
# bucketscan (mainBucketScan.go) — template expansion + status classifier
# --------------------------------------------------------------------------- #
@dataclass
class BucketProvider:
    """config/bucketscan.json row: {Name, Urls, NoSuchBucket, AccessDenied}
    (``mainBucketScan.go:16-21``)."""

    name: str
    urls: list[str]
    no_such_bucket: int = 404
    access_denied: int = 403

    @classmethod
    def load_file(cls, path: str) -> list["BucketProvider"]:
        with open(path) as f:
            raw = json.load(f)
        return [
            cls(b["Name"], list(b.get("Urls", [])),
                int(b.get("NoSuchBucket", 404)), int(b.get("AccessDenied", 403)))
            for b in raw
        ]


def bucket_urls(provider: BucketProvider, words, *, prefix: str = "{w}",
                url_filter: str = "") -> pa.Table:
    """URL construction ``https://{prefix}.{suffix}`` with ``{w}`` substitution
    (mainBucketScan.go:100-110); suffix filter (:101-104)."""
    out_url, out_word, out_suffix = [], [], []
    for suffix in provider.urls:
        if url_filter and url_filter not in suffix:
            continue
        for w in words:
            p = prefix.replace("{w}", w, 1)
            out_url.append(f"https://{p}.{suffix}")
            out_word.append(w)
            out_suffix.append(suffix)
    return pa.table(
        {
            "url": pa.array(out_url, pa.string()),
            "word": pa.array(out_word, pa.string()),
            "suffix": pa.array(out_suffix, pa.string()),
        }
    )


def classify_bucket_status(t: pa.Table, provider: BucketProvider,
                           status_col: str = "status") -> pa.Table:
    """Status classifier (mainBucketScan.go:117-134): NoSuchBucket → not_found,
    AccessDenied → access_denied, else → open (body dumped)."""
    import pyarrow.compute as pc

    s = t.column(status_col)
    klass = pc.if_else(
        pc.equal(s, provider.no_such_bucket),
        pa.scalar("not_found"),
        pc.if_else(
            pc.equal(s, provider.access_denied),
            pa.scalar("access_denied"),
            pa.scalar("open"),
        ),
    )
    return t.append_column("klass", klass)


# --------------------------------------------------------------------------- #
# DNS scan (mainDNS.go) — template, resume anti-join, simulated resolver
# --------------------------------------------------------------------------- #
def parse_dns_history(log_text: str) -> set[str]:
    """Resume history parse (mainDNS.go:69-84): first token of each line."""
    hist = set()
    for line in log_text.split("\n"):
        l = line.split("\t")[0].split(" ")[0].strip("\n\r")
        if l:
            hist.add(l)
    return hist


def dns_scan_pipeline(words, domain: str, resolver_table: dict[str, list[str]],
                      history: set[str] | None = None):
    """wordlist → anti-join vs history (J1, mainDNS.go:108-119) → simulated
    resolve → (name, found, records). ``{w}`` template or ``word.domain``
    naming (mainDNS.go:29)."""
    hist_ref = ray.put(history or set())
    res_ref = ray.put(resolver_table)
    rows = pa.table({"word": pa.array(list(words), pa.string())})

    def resolve(t: pa.Table) -> pa.Table:
        hist = ray.get(hist_ref)
        res = ray.get(res_ref)
        names, words_out = [], []
        for w in t.column("word").to_pylist():
            name = (
                domain.replace("{w}", w, 1) + "."
                if "{w}" in domain
                else f"{w}.{domain}."
            )
            if name in hist:  # resume anti-join
                continue
            names.append(name)
            words_out.append(w)
        found, recs = [], []
        for n in names:
            r = res.get(n, [])
            found.append(bool(r))
            recs.append(",".join(r))
        return pa.table(
            {
                "word": pa.array(words_out, pa.string()),
                "name": pa.array(names, pa.string()),
                "found": pa.array(found, pa.bool_()),
                "records": pa.array(recs, pa.string()),
            }
        )

    return ray.data.from_arrow(rows).map_batches(resolve, batch_format="pyarrow")


# --------------------------------------------------------------------------- #
# fuzzer (mainFuzzer.go) — distributed deterministic payload generation
# --------------------------------------------------------------------------- #
def fuzz_payloads_dataset(config: dict, *, encoder: str = "none"):
    """config = fuzzinginput.json shape {Vectors, Iterations, BuildLogic, Seed}.
    ``range(n)`` source → per-index seeded generation (order-free, M19/T8)."""
    vectors = config["Vectors"]
    logic = config.get("BuildLogic", "")
    seed = int(config.get("Seed", 0))
    n = int(config.get("Iterations", 0))
    vec_ref = ray.put(vectors)

    def gen(t: pa.Table) -> pa.Table:
        v = ray.get(vec_ref)
        ids = t.column("id").to_pylist()
        return pa.table(
            {
                "index": pa.array(ids, pa.int64()),
                "payload": pa.array(
                    [gen_payload(v, logic, seed, i, encoder) for i in ids], pa.string()
                ),
            }
        )

    return ray.data.range(n).map_batches(gen, batch_format="pyarrow")


# --------------------------------------------------------------------------- #
# port-scan enumeration (mainPortScan.go) — range/list source
# --------------------------------------------------------------------------- #
def parse_port_list(s: str) -> list[int]:
    """"80,443,x" → [80, 443] (non-numeric dropped, mainPortScan.go:46-56)."""
    out = []
    for p in s.split(","):
        try:
            out.append(int(p))
        except ValueError:
            pass
    return out


def port_scan_pipeline(start: int, end: int, open_ports: set[int]):
    """[start, end] inclusive (mainPortScan.go:18-19,38); simulated probe."""
    open_ref = ray.put(open_ports)

    def probe(t: pa.Table) -> pa.Table:
        op = ray.get(open_ref)
        ports = [start + i for i in t.column("id").to_pylist()]
        return pa.table(
            {
                "port": pa.array(ports, pa.int32()),
                "open": pa.array([p in op for p in ports], pa.bool_()),
            }
        )

    return ray.data.range(end - start + 1).map_batches(probe, batch_format="pyarrow")

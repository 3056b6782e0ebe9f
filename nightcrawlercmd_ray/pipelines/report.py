"""The ``report`` tool — six semicolon-CSV reports as Dataset aggregations.

Reference lifecycle (``/root/reference/mainReport.go``): load every stored page
into RAM (``loadData`` :354-373 — the reference's scalability wall), then six
reducers over ``map[url]*pageReport`` (:393-398). The engine streams instead
(SURVEY §3.2): ``read_parquet(pages) ⋈ fetch_meta`` → ONE extraction
``map_batches`` producing a flattened per-page table (list columns) →
six independent aggregations → ``;``-CSV sinks (``csv.Comma=';'``,
``mainReport.go:191,221,252,292,311,340``). Nothing is held on the driver.

Report parity map:
- crawledurls.csv  (:182-210)  timestamp,url,Http code,duration,redirect,error
- allUrls.csv      (:212-241)  global distinct raw hrefs
- querykeys.csv    (:243-259)  query key → exemplar url (pinned min(url) —
  the reference's map-iteration exemplar is nondeterministic, SURVEY J4)
- wordlist.csv     (:261-300)  word → count + exemplar page (pinned min(url))
- invalidtags.csv  (:302-329)  validation errors w/ line numbers
- formtags.csv     (:331-352)  one row per form input
"""

from __future__ import annotations

import os
from urllib.parse import parse_qs, urlsplit

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Min, Sum

from ..functions.extractors import (
    content_mime,
    ips_from_text,
    is_redirect,
    urls_from_text,
    words_from_text,
)
from ..functions.htmlparse import parse_html
from ..functions.urlnorm import to_abs_url
from ..stages.validate import TagRules, validate_html

DEFAULT_TAGS_FILE = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), "config", "tags.json"
)


class PageReportStage:
    """Stateful extraction stage (validator rules load once per actor) —
    the engine's ``loadPage`` (``mainReport.go:96-172``), vectorized per batch.

    In: url, warc_ts, html (+ status, location, content_type, fetch_ms when
    fetch_meta was joined). Out: one row per page with list columns.
    """

    def __init__(self, tags_file: str | None = DEFAULT_TAGS_FILE, wordlist: bool = False,
                 meta_path: str | None = None):
        self.rules = TagRules.from_file(tags_file) if tags_file else None
        self.wordlist = wordlist
        # fetch_meta is the small side (no html bytes): loaded ONCE per actor
        # as a url→(status, location, content_type, fetch_ms) lookup instead of
        # a full shuffle join. At 10^10-page scale the same stage reads the
        # bucket-co-partitioned meta of prepare_pagestore instead (SURVEY J5).
        self.meta: dict[str, tuple] | None = None
        if meta_path:
            import pyarrow.parquet as pq

            mt = pq.read_table(meta_path)
            self.meta = {
                u: (int(s), loc or "", ct or "", int(ms or 0))
                for u, s, loc, ct, ms in zip(
                    mt.column("url").to_pylist(),
                    mt.column("status").to_pylist(),
                    mt.column("location").to_pylist(),
                    mt.column("content_type").to_pylist(),
                    mt.column("fetch_ms").to_pylist(),
                )
            }

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        # CrawlTime-as-filename (mainReport.go:102): epoch µs, tz-free cast
        ts_us = pc.cast(batch.column("warc_ts"), pa.int64()).to_pylist()
        if self.meta is not None:
            looked = [self.meta.get(u, (200, "", "text/html", 0)) for u in urls]
            statuses = [x[0] for x in looked]
            locations = [x[1] for x in looked]
            ctypes = [x[2] for x in looked]
            durs = [x[3] for x in looked]
        else:
            statuses = [200] * n
            locations = [""] * n
            ctypes = ["text/html"] * n
            durs = [0] * n

        cols: dict[str, list] = {
            "url": urls,
            "file_name": [str(t) for t in ts_us],
            "status": [int(s) for s in statuses],
            "duration_ms": [int(d or 0) for d in durs],
            "location": [],
            "words": [],
            "text_urls": [],
            "text_ips": [],
            "query_keys": [],
            "hrefs": [],
            "form_urls": [],
            "form_methods": [],
            "form_input_names": [],
            "form_input_types": [],
            "form_input_values": [],
            "inv_reasons": [],
            "inv_tags": [],
            "inv_attrs": [],
            "inv_lines": [],
        }
        for url, html, status, location, ctype in zip(
            urls, htmls, statuses, locations, ctypes
        ):
            mime = content_mime(ctype)
            html_ok = mime == "text/html" and html
            # redirect location resolved against the page url (LocationFromPage)
            cols["location"].append(
                (to_abs_url(url, location) or "") if (is_redirect(int(status)) and location) else ""
            )
            body_text = ""
            hrefs: list[str] = []
            f_urls: list[str] = []
            f_methods: list[str] = []
            f_inames: list[str] = []
            f_itypes: list[str] = []
            f_ivalues: list[str] = []
            if html_ok:
                parsed = parse_html(html)
                body_text = parsed.text
                seen_h: set[str] = set()  # per-page href set, mainReport.go:157-168
                for h in parsed.hrefs:
                    if h and h not in seen_h:
                        seen_h.add(h)
                        hrefs.append(h)
                for form in parsed.forms:
                    for inp in form.inputs:
                        f_urls.append(form.url)
                        f_methods.append(form.method)
                        f_inames.append(inp.name)
                        f_itypes.append(inp.type)
                        f_ivalues.append(inp.value)
            cols["hrefs"].append(hrefs)
            cols["form_urls"].append(f_urls)
            cols["form_methods"].append(f_methods)
            cols["form_input_names"].append(f_inames)
            cols["form_input_types"].append(f_itypes)
            cols["form_input_values"].append(f_ivalues)
            # wordlist-mode extractors (mainReport.go:109-137)
            if self.wordlist:
                raw = html.decode("utf-8", "replace") if isinstance(html, (bytes, bytearray)) else (html or "")
                cols["text_urls"].append(urls_from_text(raw, 100))
                cols["text_ips"].append(ips_from_text(raw, 100))
                cols["words"].append(words_from_text(body_text, 2000) if html_ok else [])
            else:
                cols["text_urls"].append([])
                cols["text_ips"].append([])
                cols["words"].append([])
            # query keys of the page url, set semantics (mainReport.go:157-160)
            try:
                qk = sorted(parse_qs(urlsplit(url).query, keep_blank_values=True))
            except ValueError:
                qk = []
            cols["query_keys"].append(qk)
            # validation (mainReport.go:119-127)
            if self.rules is not None and html_ok:
                errs = validate_html(self.rules, html)
            else:
                errs = []
            cols["inv_reasons"].append([e[0] for e in errs])
            cols["inv_tags"].append([e[1] for e in errs])
            cols["inv_attrs"].append([e[2] for e in errs])
            cols["inv_lines"].append([e[3] for e in errs])

        str_list = pa.list_(pa.string())
        return pa.table(
            {
                "url": pa.array(cols["url"], pa.string()),
                "file_name": pa.array(cols["file_name"], pa.string()),
                "status": pa.array(cols["status"], pa.int32()),
                "duration_ms": pa.array(cols["duration_ms"], pa.int32()),
                "location": pa.array(cols["location"], pa.string()),
                "words": pa.array(cols["words"], str_list),
                "text_urls": pa.array(cols["text_urls"], str_list),
                "text_ips": pa.array(cols["text_ips"], str_list),
                "query_keys": pa.array(cols["query_keys"], str_list),
                "hrefs": pa.array(cols["hrefs"], str_list),
                "form_urls": pa.array(cols["form_urls"], str_list),
                "form_methods": pa.array(cols["form_methods"], str_list),
                "form_input_names": pa.array(cols["form_input_names"], str_list),
                "form_input_types": pa.array(cols["form_input_types"], str_list),
                "form_input_values": pa.array(cols["form_input_values"], str_list),
                "inv_reasons": pa.array(cols["inv_reasons"], str_list),
                "inv_tags": pa.array(cols["inv_tags"], str_list),
                "inv_attrs": pa.array(cols["inv_attrs"], str_list),
                "inv_lines": pa.array(cols["inv_lines"], pa.list_(pa.int32())),
            }
        )


def _explode(t: pa.Table, list_col: str, keep: list[str], out_name: str) -> pa.Table:
    """Vectorized explode of one list column (parent-index gather)."""
    col = t.column(list_col)
    if col.num_chunks == 0:
        flat = pa.array([], pa.string())
        idx = pa.array([], pa.int64())
    else:
        combined = col.combine_chunks()
        flat = pc.list_flatten(combined)
        idx = pc.list_parent_indices(combined)
    out = {out_name: flat}
    for k in keep:
        out[k] = pc.take(t.column(k), idx)
    return pa.table(out)


def page_reports_dataset(
    corpus_dir: str,
    *,
    wordlist: bool = False,
    tags_file: str | None = DEFAULT_TAGS_FILE,
    concurrency: int | None = None,
    batch_size: int = 128,
):
    """pages ⋈ fetch_meta → PageReportStage. Returns the flattened per-page
    Dataset (list columns), lazily."""
    from ..util import read_parquet_clean

    pages = read_parquet_clean(
        f"{corpus_dir}/pages.parquet", columns=["url", "warc_ts", "html"]
    )
    meta_path = f"{corpus_dir}/fetch_meta.parquet"
    if not os.path.exists(meta_path):
        meta_path = None
    # NOTE: concurrency must stay below the session CPU count — an actor pool
    # that reserves every CPU starves the downstream shuffle stages (deadlock).
    return pages.map_batches(
        PageReportStage,
        fn_constructor_kwargs={
            "tags_file": tags_file, "wordlist": wordlist, "meta_path": meta_path,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or 2,
    )


# -----------------------------------------------------------------------------
# the six reports, as Dataset transforms over the flattened per-page table
# -----------------------------------------------------------------------------
def report_crawled_urls(pr_ds):
    def proj(t: pa.Table) -> pa.Table:
        t = t.select(["file_name", "url", "status", "duration_ms", "location"])
        # error column: empty for stored pages (the reference records fetch
        # errors on live crawls only, mainReport.go:108)
        return t.append_column("error", pa.array([""] * t.num_rows, pa.string()))

    return pr_ds.map_batches(proj, batch_format="pyarrow")


def report_all_urls(pr_ds):
    """Global distinct raw hrefs (mainReport.go:212-241) — shuffle distinct,
    pinned ascending order (reference map order is nondeterministic)."""
    ds = pr_ds.map_batches(
        lambda t: _explode(t, "hrefs", [], "href"), batch_format="pyarrow"
    )
    from ..util import distinct

    return distinct(ds, "href")


def report_query_keys(pr_ds):
    """query key → exemplar url, exemplar pinned to min(url) (SURVEY J4)."""
    ds = pr_ds.map_batches(
        lambda t: _explode(t, "query_keys", ["url"], "query_key"),
        batch_format="pyarrow",
    )
    return ds.groupby("query_key").aggregate(Min("url", alias_name="page"))


def report_wordlist(pr_ds):
    """word → (count, exemplar page) (mainReport.go:261-300), exemplar pinned
    min(url). Pre-aggregated per batch before the shuffle (SURVEY A1)."""

    def partial(t: pa.Table) -> pa.Table:
        e = _explode(t, "words", ["url"], "word")
        if e.num_rows == 0:
            return pa.table(
                {"word": pa.array([], pa.string()),
                 "count": pa.array([], pa.int64()),
                 "url": pa.array([], pa.string())}
            )
        df = pd.DataFrame(
            {"word": pc.utf8_lower(e.column("word")).to_pylist(),
             "url": e.column("url").to_pylist()}
        )
        df = df[df["word"] != ""]
        g = df.groupby("word").agg(count=("url", "size"), url=("url", "min")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = pr_ds.map_batches(partial, batch_format="pyarrow")
    return ds.groupby("word").aggregate(
        Sum("count", alias_name="count"), Min("url", alias_name="page")
    )


def report_invalid_tags(pr_ds):
    def explode_inv(t: pa.Table) -> pa.Table:
        col = t.column("inv_reasons").combine_chunks()
        idx = pc.list_parent_indices(col)
        return pa.table(
            {
                "reason": pc.list_flatten(col),
                "tag": pc.list_flatten(t.column("inv_tags").combine_chunks()),
                "attribute": pc.list_flatten(t.column("inv_attrs").combine_chunks()),
                "line": pc.list_flatten(t.column("inv_lines").combine_chunks()),
                "file_name": pc.take(t.column("file_name"), idx),
                "url": pc.take(t.column("url"), idx),
            }
        )

    return pr_ds.map_batches(explode_inv, batch_format="pyarrow")


def report_form_tags(pr_ds):
    def explode_forms(t: pa.Table) -> pa.Table:
        col = t.column("form_input_names").combine_chunks()
        idx = pc.list_parent_indices(col)
        return pa.table(
            {
                "empty": pa.array([""] * len(pc.list_flatten(col)), pa.string()),
                "input_name": pc.list_flatten(col),
                "input_type": pc.list_flatten(t.column("form_input_types").combine_chunks()),
                "input_value": pc.list_flatten(t.column("form_input_values").combine_chunks()),
                "page_url": pc.take(t.column("url"), idx),
                "form_url": pc.list_flatten(t.column("form_urls").combine_chunks()),
                "form_method": pc.list_flatten(t.column("form_methods").combine_chunks()),
            }
        )

    return pr_ds.map_batches(explode_forms, batch_format="pyarrow")


def write_semicolon_csv(ds, path: str, header: list[str] | None) -> int:
    """Single-file ``;``-CSV sink (reference writes one file per report;
    ``removeIfExists`` mainReport.go:403-409). Streams batches — the driver
    never holds the dataset. Returns row count."""
    if os.path.exists(path):
        os.remove(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n = 0
    with open(path, "w", newline="") as f:
        if header:
            f.write(";".join(header) + "\n")
        for b in ds.iter_batches(batch_size=65536, batch_format="pandas"):
            b.to_csv(f, sep=";", header=False, index=False)
            n += len(b)
    return n


def write_semicolon_csv_distributed(ds, path: str, header: list[str] | None,
                                    *, parts_dir: str | None = None) -> int:
    """Distributed single-file ``;``-CSV sink — the 100× mode for the
    reference's one-file-per-report contract (r2 verdict minor note on
    :func:`write_semicolon_csv`'s driver streaming).

    Each block is CSV-serialized by its own Ray task into an ORDERED part
    file (block order is the dataset order, so a sorted dataset stays
    sorted); the driver then concatenates the parts byte-wise
    (``shutil.copyfileobj`` — it never parses or holds a single row).
    ``parts_dir`` must be storage every node can write (object store / NFS
    at cluster scale; /tmp in the sandbox). Returns the row count."""
    import shutil
    import tempfile

    import ray

    parts_dir = parts_dir or tempfile.mkdtemp(prefix="nc_csv_parts_")
    os.makedirs(parts_dir, exist_ok=True)

    @ray.remote
    def write_part(i: int, block) -> tuple[str, int]:
        p = f"{parts_dir}/part-{i:06d}.csv"
        block.to_pandas().to_csv(p, sep=";", header=False, index=False)
        return p, block.num_rows

    refs, i = [], 0
    for bundle in ds.iter_internal_ref_bundles():
        for blk in bundle.block_refs:
            refs.append(write_part.remote(i, blk))
            i += 1
    parts = ray.get(refs)  # list of (path, rows) in block order
    if os.path.exists(path):
        os.remove(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n = 0
    with open(path, "wb") as out:
        if header:
            out.write((";".join(header) + "\n").encode("utf-8"))
        for p, rows in parts:
            with open(p, "rb") as f:
                shutil.copyfileobj(f, out, 1 << 20)
            os.remove(p)
            n += rows
    return n


def generate_reports(
    corpus_dir: str,
    out_dir: str,
    *,
    wordlist: bool = False,
    tags_file: str | None = DEFAULT_TAGS_FILE,
    sort_outputs: bool = True,
) -> dict[str, int]:
    """All six reports (``generateReport``, mainReport.go:375-400).

    The flattened per-page table is materialized ONCE (object store, spills if
    large) and every report derives from it — the reference re-reads nothing
    either, but holds it in driver RAM instead. ``sort_outputs`` pins
    deterministic file order where the reference inherits map order.
    """
    os.makedirs(out_dir, exist_ok=True)
    pr = page_reports_dataset(
        corpus_dir, wordlist=wordlist, tags_file=tags_file
    ).materialize()
    counts = {}
    crawled = report_crawled_urls(pr)
    if sort_outputs:
        crawled = crawled.sort("file_name")
    counts["crawledurls"] = write_semicolon_csv(
        crawled, f"{out_dir}/crawledurls.csv",
        ["timestamp", "url", "Http code", "duration (ms)", "redirect url", "error"],
    )
    counts["allurls"] = write_semicolon_csv(
        report_all_urls(pr).sort("href"), f"{out_dir}/allUrls.csv", ["url"]
    )
    counts["querykeys"] = write_semicolon_csv(
        report_query_keys(pr).sort("query_key"), f"{out_dir}/querykeys.csv", None
    )
    if wordlist:
        counts["wordlist"] = write_semicolon_csv(
            report_wordlist(pr).sort("word"), f"{out_dir}/wordlist.csv", None
        )
    inv = report_invalid_tags(pr)
    if sort_outputs:
        inv = inv.sort(["url", "line"])
    counts["invalidtags"] = write_semicolon_csv(
        inv.select_columns(["reason", "tag", "attribute", "line", "file_name", "url"]),
        f"{out_dir}/invalidtags.csv",
        ["reason", "tag", "attribute", "line", "file name", "url"],
    )
    forms = report_form_tags(pr)
    if sort_outputs:
        forms = forms.sort(["page_url", "input_name"])
    counts["formtags"] = write_semicolon_csv(
        forms, f"{out_dir}/formtags.csv", None
    )
    return counts

"""CDX URL index over SURT keys — the web-archive lookup layout.

Engine addition beyond the reference (SURVEY §2.1 has no index sink): a
crawl corpus is consulted by URL ("what captures do we hold for this
page / this host / this prefix?"), and the public convention for that is
the CDX index of Common Crawl / Wayback: rows keyed by the SURT
(Sort-friendly URI Reordering Transform) of the URL, sorted globally, so
every host, domain or path prefix is one contiguous range.

SURT rules pinned here (the pywb/webarchive-commons canonical subset):
lowercase everything; drop scheme and fragment; strip one leading
``www.``; drop default ports (80/http, 443/https), keep others as
``:port`` after the host; reverse dot-split host labels joined by commas
(literal IPv4 hosts are NOT reversed, per pywb); sort query parameters
bytewise; empty path becomes ``/``. Example:
``HTTP://WWW.Example.COM/A?b=2&a=1`` → ``com,example)/a?a=1&b=2``.

Scale shape (mirrors `stages/sortedsink` for string keys):
- CDX rows are COMPACT (surt, ts, url, digest, length) — page bytes never
  enter the index build; the md5 digest is computed in the same scan that
  parses the URL.
- Range boundaries come from a bounded pure-hash sample of FULL SURT
  strings (≤ ``max_sample`` keys reach the driver at any corpus size; the
  keep/drop decision hashes the key's 8-byte prefix — a pure function of
  the key, identical at any parallelism). Full-string boundaries matter:
  a single-domain corpus shares one 8-byte prefix, so truncated
  boundaries would collapse every row into one part. All rows equal to a
  boundary land in ONE part (searchsorted side='right'), so part order +
  local sort = exact global order.
- Data moves in exactly ONE range-keyed exchange; each part sorts
  locally, writes ``part-K/data.parquet`` + ``_DONE`` atomically and
  returns (count, min, max) to the driver, which assembles ``_MANIFEST``
  (O(parts) driver state). Global ranks (``pos``) are derived at READ
  time from manifest offsets — files stay immutable, no second pass.
- ``cdx_prefix_lookup`` prunes parts by manifest [min, max] overlap
  BEFORE opening any file — I/O ∝ matching range, the payoff of the
  layout.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..stages.sampling import hash_u32, threshold_for

_IPV4 = re.compile(r"^\d{1,3}(\.\d{1,3}){3}$")
_DEFAULT_PORT = {"http": "80", "https": "443"}


def surt_key(url: str) -> str:
    """SURT transform of one URL (rules in the module docstring)."""
    sp = urlsplit(url.strip())
    host = sp.hostname or ""
    host = host.lower()
    if host.startswith("www."):
        host = host[4:]
    port = sp.port
    scheme = sp.scheme.lower()
    port_s = ""
    if port is not None and str(port) != _DEFAULT_PORT.get(scheme, ""):
        port_s = f":{port}"
    if _IPV4.match(host):
        h = host
    else:
        h = ",".join(reversed(host.split("."))) if host else ""
    path = (sp.path or "/").lower()
    q = ""
    if sp.query:
        q = "?" + "&".join(sorted(sp.query.split("&"))).lower()
    return h + port_s + ")" + path + q


def _prefix64(keys: list[str]) -> np.ndarray:
    """First 8 bytes of each key, big-endian — an order-preserving int64
    proxy for lexicographic order (SURT bytes are ASCII < 0x80, so the
    value never sets the sign bit)."""
    out = np.empty(len(keys), dtype=np.int64)
    for i, k in enumerate(keys):
        b = k.encode()[:8].ljust(8, b"\x00")
        out[i] = int.from_bytes(b, "big")
    return out


def build_cdx(ds, out_dir: str, *, url_col: str = "url",
              ts_col: str = "warc_ts", body_col: str = "html",
              num_partitions: int = 16, max_sample: int = 65536) -> dict:
    """Build a sorted CDX index from a pages Dataset. Returns the manifest."""
    os.makedirs(out_dir, exist_ok=True)
    for d in os.listdir(out_dir):
        if d.startswith("part-"):
            import shutil
            shutil.rmtree(f"{out_dir}/{d}", ignore_errors=True)

    def to_cdx(t: pa.Table) -> pa.Table:
        urls = t.column(url_col).to_pylist()
        ts = t.column(ts_col)
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
        bodies = t.column(body_col).to_pylist()
        surts, digests, lengths = [], [], []
        for u, b in zip(urls, bodies):
            if isinstance(b, str):
                b = b.encode()
            surts.append(surt_key(u))
            digests.append(hashlib.md5(b).hexdigest())
            lengths.append(len(b))
        return pa.table({
            "surt": pa.array(surts, pa.string()),
            "ts_us": pc.cast(ts, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "digest": pa.array(digests, pa.string()),
            "length": pa.array(lengths, pa.int64()),
        })

    cdx = ds.map_batches(to_cdx, batch_format="pyarrow")

    # bounded boundary sample of full SURT strings (keep/drop decision is a
    # pure hash of the key's 8-byte prefix — identical at any parallelism)
    n_rows = ds.count()
    rate = min(1.0, max_sample / max(1, n_rows))
    thr = np.uint64(max(1, threshold_for(rate)))

    def sample_keys(t: pa.Table) -> pa.Table:
        surts = t.column("surt").to_pylist()
        keep = hash_u32(_prefix64(surts)) < thr
        return pa.table({"_k": pa.array(
            [s for s, k in zip(surts, keep) if k], pa.string())})

    sample = sorted(
        r["_k"] for r in
        cdx.map_batches(sample_keys, batch_format="pyarrow").take_all())
    cuts = [sample[(len(sample) * j) // num_partitions]
            for j in range(1, num_partitions)] if sample else []
    bounds = np.array(sorted(set(cuts)), dtype=object)

    def add_part(t: pa.Table) -> pa.Table:
        surts = np.array(t.column("surt").to_pylist(), dtype=object)
        p = np.searchsorted(bounds, surts, side="right")
        return t.append_column("_part", pa.array(p.astype(np.int64)))

    def write_part(t: pa.Table) -> pa.Table:
        part = int(t.column("_part")[0].as_py())
        body = t.drop_columns(["_part"]).sort_by(
            [("surt", "ascending"), ("ts_us", "ascending"),
             ("url", "ascending")])
        d = f"{out_dir}/part-{part:05d}"
        os.makedirs(d, exist_ok=True)
        tmp = f"{d}/data.parquet.tmp-{os.getpid()}"
        pq.write_table(body, tmp)
        os.replace(tmp, f"{d}/data.parquet")
        with open(f"{d}/_DONE.tmp", "w") as f:
            json.dump({"rows": body.num_rows}, f)
        os.replace(f"{d}/_DONE.tmp", f"{d}/_DONE")
        return pa.table({
            "part": pa.array([part], pa.int64()),
            "n": pa.array([body.num_rows], pa.int64()),
            "lo": pa.array([body.column("surt")[0].as_py()]),
            "hi": pa.array([body.column("surt")[-1].as_py()]),
        })

    rows = sorted(
        (cdx.map_batches(add_part, batch_format="pyarrow")
         .groupby("_part").map_groups(write_part, batch_format="pyarrow")
         .take_all()),
        key=lambda r: r["part"])
    offsets, total = {}, 0
    for r in rows:
        offsets[r["part"]] = total
        total += r["n"]
    man = {
        "parts": [
            {"part": r["part"], "rows": r["n"], "offset": offsets[r["part"]],
             "lo": r["lo"], "hi": r["hi"]} for r in rows
        ],
        "total_rows": total,
        "boundaries": [str(b) for b in bounds],
    }
    with open(f"{out_dir}/_MANIFEST.tmp", "w") as f:
        json.dump(man, f)
    os.replace(f"{out_dir}/_MANIFEST.tmp", f"{out_dir}/_MANIFEST")
    return man


def _load_manifest(out_dir: str) -> dict:
    with open(f"{out_dir}/_MANIFEST") as f:
        return json.load(f)


def read_cdx(out_dir: str):
    """Lazy Dataset over the index with each row's exact global SURT rank
    as ``pos`` (derived from manifest offsets — files stay immutable).
    Like ``sortedsink.read_sorted``, Ray's streaming executor may emit
    blocks in completion order: sort by ``pos`` (or consume per-part) for
    ordered iteration; ``pos`` itself is always the exact rank."""
    import ray.data

    man = _load_manifest(out_dir)
    parts = sorted(man["parts"], key=lambda p: p["part"])

    def load(meta: pa.Table) -> pa.Table:
        out = []
        for row in meta.to_pylist():  # batch_size=1 ⇒ one part per task
            t = pq.read_table(
                f"{out_dir}/part-{int(row['part']):05d}/data.parquet")
            out.append(t.append_column("pos", pa.array(
                np.arange(int(row["offset"]),
                          int(row["offset"]) + t.num_rows, dtype=np.int64))))
        return pa.concat_tables(out)

    if not parts:
        return ray.data.from_arrow(pa.table({
            "surt": pa.array([], pa.string()),
            "ts_us": pa.array([], pa.int64()),
            "url": pa.array([], pa.string()),
            "digest": pa.array([], pa.string()),
            "length": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
        }))
    meta = ray.data.from_items(
        [{"part": p["part"], "offset": p["offset"]} for p in parts])
    return meta.map_batches(load, batch_format="pyarrow", batch_size=1)


def cdx_prefix_lookup(out_dir: str, prefix: str) -> pa.Table:
    """All index rows whose SURT starts with ``prefix`` — manifest range
    pruning first (only overlapping parts are opened), one vectorized
    trim after. Returns (table, files_opened) semantics via attribute-free
    tuple: callers get just the table; see ``cdx_prefix_lookup_stats``."""
    t, _ = cdx_prefix_lookup_stats(out_dir, prefix)
    return t


def cdx_prefix_lookup_stats(out_dir: str, prefix: str) -> tuple[pa.Table, int]:
    man = _load_manifest(out_dir)
    hi = prefix + "\U0010ffff"
    tables, opened = [], 0
    for p in sorted(man["parts"], key=lambda x: x["part"]):
        if p["hi"] < prefix or p["lo"] > hi:
            continue
        opened += 1
        t = pq.read_table(f"{out_dir}/part-{int(p['part']):05d}/data.parquet")
        mask = pc.starts_with(t.column("surt"), prefix)
        t = t.filter(mask)
        if t.num_rows:
            tables.append(t)
    if not tables:
        return pa.table({
            "surt": pa.array([], pa.string()),
            "ts_us": pa.array([], pa.int64()),
            "url": pa.array([], pa.string()),
            "digest": pa.array([], pa.string()),
            "length": pa.array([], pa.int64()),
        }), opened
    return pa.concat_tables(tables), opened

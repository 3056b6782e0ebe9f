"""WARC (ISO 28500) source + sink over Common-Crawl-style page tables.

Engine addition beyond the reference (whose page store is JSON-per-page —
SURVEY §2.1 S4/S5): the interchange format the `input_hint`'s
"Common-Crawl-style web pages" actually live in on real clusters. A WARC
response record wraps an HTTP response (status line + headers + body)
under WARC headers (Target-URI, Date, Content-Length); Common Crawl ships
them as per-record gzip members concatenated into large ``.warc.gz``
files, which is exactly what lets a reader seek to any record without
decompressing the whole file.

Scale shape
-----------
- **Sink** (`write_warc`): each Ray block becomes one ``.warc.gz`` file
  written by its own task — no shuffle, no driver traffic; a file's name
  is the md5 of its member bytes, so the file SET is content-addressed:
  re-running a partition rewrites the identical file (idempotent resume,
  ``os.replace`` atomic) and the logical record multiset is invariant
  under partitioning even though the file grouping is not. Records are
  independent gzip members (mtime=0, fixed compresslevel ⇒ deterministic
  bytes).
- **Source** (`read_warc`): ``read_binary_files`` over the ``.warc.gz``
  shards — parallelism = number of files, the same unit Common Crawl
  distributes work by (its segments are ~1 GB, thousands per crawl). The
  per-file parser is sequential by format necessity (records are
  length-framed), but body bytes are sliced, never scanned, so the cost
  is O(headers) + memcpy.

Framing notes (spec-conformant, round-trip-tested):
- Record = ``WARC/1.0 CRLF headers CRLF CRLF payload CRLF CRLF``; payload
  length comes ONLY from ``Content-Length`` (bodies may contain
  ``WARC/1.0`` freely).
- ``WARC-Date``: second resolution per WARC 1.0; we emit ``.%06d``
  microseconds (WARC 1.1 allows fractional) so ``warc_ts`` round-trips
  exactly; the reader accepts both forms.
- Non-``response`` records (warcinfo, request, metadata) are skipped by
  the reader, as are response records whose HTTP payload has no body.
"""

from __future__ import annotations

import gzip
import hashlib
import os
from datetime import datetime, timezone

import pyarrow as pa

_CRLF = b"\r\n"
_GZ_MAGIC = b"\x1f\x8b"


def _warc_date(ts_us: int) -> bytes:
    secs, micros = divmod(int(ts_us), 1_000_000)
    dt = datetime.fromtimestamp(secs, tz=timezone.utc)
    return (dt.strftime("%Y-%m-%dT%H:%M:%S") + f".{micros:06d}Z").encode()


def _parse_warc_date(s: bytes) -> int:
    txt = s.decode("ascii").strip()
    if txt.endswith("Z"):
        txt = txt[:-1]
    if "." in txt:
        base, frac = txt.split(".", 1)
        micros = int((frac + "000000")[:6])
    else:
        base, micros = txt, 0
    dt = datetime.strptime(base, "%Y-%m-%dT%H:%M:%S").replace(
        tzinfo=timezone.utc)
    return int(dt.timestamp()) * 1_000_000 + micros


def build_record(url: str, ts_us: int, body: bytes,
                 http_status: int = 200,
                 content_type: bytes = b"text/html") -> bytes:
    """One uncompressed WARC 1.0 response record wrapping an HTTP response."""
    http = (b"HTTP/1.1 %d OK" % http_status) + _CRLF + \
        b"Content-Type: " + content_type + _CRLF + \
        (b"Content-Length: %d" % len(body)) + _CRLF + _CRLF + body
    rid = hashlib.md5(url.encode() + b"\x00" + str(ts_us).encode()).hexdigest()
    hdr = _CRLF.join([
        b"WARC/1.0",
        b"WARC-Type: response",
        b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">",
        b"WARC-Date: " + _warc_date(ts_us),
        b"WARC-Target-URI: " + url.encode(),
        b"Content-Type: application/http; msgtype=response",
        b"Content-Length: %d" % len(http),
    ]) + _CRLF + _CRLF + http + _CRLF + _CRLF
    return hdr


def records_to_gz(records: list[bytes]) -> bytes:
    """Concatenated per-record gzip members (mtime=0 ⇒ deterministic)."""
    return b"".join(
        gzip.compress(r, compresslevel=6, mtime=0) for r in records
    )


def parse_warc(data: bytes) -> list[tuple[str, int, bytes]]:
    """Parse one WARC file's bytes (gz-member or plain) into
    (url, ts_us, body) response tuples, in file order."""
    if data[:2] == _GZ_MAGIC:
        data = gzip.decompress(data)  # handles concatenated members
    out: list[tuple[str, int, bytes]] = []
    pos, n = 0, len(data)
    while pos < n:
        # tolerate inter-record padding/newlines
        while pos < n and data[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"malformed WARC: no version line at {pos}")
        hdr_end = data.index(_CRLF + _CRLF, pos)
        headers: dict[bytes, bytes] = {}
        for line in data[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        clen = int(headers[b"content-length"])
        payload = data[hdr_end + 4:hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen + 4  # payload + CRLF CRLF
        if headers.get(b"warc-type") != b"response":
            continue
        url = headers.get(b"warc-target-uri", b"").decode()
        ts_us = _parse_warc_date(headers.get(b"warc-date", b"1970-01-01T00:00:00Z"))
        split = payload.find(_CRLF + _CRLF)
        if split < 0:
            continue  # headers-only HTTP payload: no body to emit
        out.append((url, ts_us, payload[split + 4:]))
    return out


def write_warc(ds, out_dir: str, *, url_col: str = "url",
               ts_col: str = "warc_ts", body_col: str = "html",
               batch_size: int | None = None) -> int:
    """Write a pages Dataset as content-addressed ``.warc.gz`` shards.

    Returns the total record count. One file per executing batch; the
    record multiset (NOT the file grouping) is partition-invariant, and
    each file's bytes are a pure function of its rows (deterministic gzip,
    md5 name) — rerunning after a partial failure rewrites byte-identical
    files in place.
    """
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64())})
        urls = t.column(url_col).to_pylist()
        ts = t.column(ts_col)
        if pa.types.is_timestamp(ts.type):
            ts = pa.compute.cast(pa.compute.cast(ts, pa.timestamp("us")),
                                 pa.int64())
        ts_us = ts.to_pylist()
        bodies = t.column(body_col).to_pylist()
        recs = []
        for u, s, b in zip(urls, ts_us, bodies):
            if isinstance(b, str):
                b = b.encode()
            recs.append(build_record(u, int(s), b))
        blob = records_to_gz(recs)
        name = hashlib.md5(blob).hexdigest()
        tmp = f"{out_dir}/.{name}.tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, f"{out_dir}/{name}.warc.gz")
        return pa.table({"n": pa.array([len(recs)], pa.int64())})

    counted = ds.map_batches(
        write_block, batch_format="pyarrow",
        **({"batch_size": batch_size} if batch_size else {}),
    )
    return sum(r["n"] for r in counted.take_all())


def read_warc(path: str):
    """Lazy Dataset of (url, warc_ts:timestamp[us], html:binary) from a
    directory of ``.warc``/``.warc.gz`` files (or a single file)."""
    import ray.data

    def parse_files(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        ts: list[int] = []
        bodies: list[bytes] = []
        for blob in t.column("bytes").to_pylist():
            for u, s, b in parse_warc(blob):
                urls.append(u)
                ts.append(s)
                bodies.append(b)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(bodies, pa.binary()),
        })

    return ray.data.read_binary_files(path).map_batches(
        parse_files, batch_format="pyarrow")

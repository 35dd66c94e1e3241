"""Common-Crawl-style WARC ingestion source.

WARC (ISO 28500) is the container format Common Crawl publishes: a
sequence of records, each a CRLF-terminated header block (a
``WARC/1.0`` version line followed by ``Name: value`` lines and a blank
line) and exactly ``Content-Length`` payload bytes, closed by
``\\r\\n\\r\\n``. Common Crawl ships archives gzip-MULTISTREAM: every
record is its own gzip member, so a ``.warc.gz`` decompresses
member-by-member without ever holding the whole archive inflated.

Distribution model (the 100 TB story): a crawl is ~64k ``.warc.gz``
files of ~1 GB each. Gzip is not splittable, so the unit of parallelism
is the FILE — ``spark.read.format("binaryFile")`` lists the archives as
a DataFrame and :func:`read_warc` parses each file's records inside one
``mapInPandas`` task: 64k independent tasks per crawl, zero driver
involvement, and executor memory bounded by ONE record plus the
compressed file (the incremental parser trims its buffer as records
complete — the inflated archive never exists in memory at once).
Rows stream out in bounded Arrow batches.

This is the step BEFORE the engine's input table: crawl archives →
:func:`read_warc` → :func:`warc_to_webtext` → the ``(url, warc_ts,
html, text, lang)`` Iceberg/parquet table every other operator (as-of
joins, dedup, curation) consumes.

Reference anchor: the reference ingests pre-materialized tables only
(spark/src/main/scala/ai/chronon/spark/catalog/TableUtils.scala); the
crawl-archive ingestion path is beyond-reference surface in the spirit
of SURVEY.md §2.1 format providers. The WARC grammar implemented here
is the public ISO 28500 / WARC 1.1 spec; no external warc library is
used (none is installed).
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Iterable, Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"

WARC_SCHEMA = (
    "record_id string, warc_type string, url string, warc_ts timestamp, "
    "content_type string, payload binary, source_file string"
)


# ---------------------------------------------------------------------------
# record rendering (writer side — tests, fixtures, and the WARC sink)
# ---------------------------------------------------------------------------

def make_warc_record(headers: dict, payload: bytes) -> bytes:
    """Render one WARC record. ``Content-Length`` is computed, not trusted."""
    lines = [b"WARC/1.0"]
    for k, v in headers.items():
        if k.lower() == "content-length":
            continue
        lines.append(f"{k}: {v}".encode("utf-8"))
    lines.append(f"Content-Length: {len(payload)}".encode("ascii"))
    return _CRLF.join(lines) + _HDR_END + payload + _HDR_END


def make_warc_bytes(records: Iterable[Tuple[dict, bytes]], gzip_members: bool = True) -> bytes:
    """Concatenate records into archive bytes. ``gzip_members=True`` writes
    the Common-Crawl shape: one gzip member per record (mtime pinned to 0 so
    output is deterministic)."""
    out = io.BytesIO()
    for headers, payload in records:
        rec = make_warc_record(headers, payload)
        if gzip_members:
            out.write(gzip.compress(rec, compresslevel=6, mtime=0))
        else:
            out.write(rec)
    return out.getvalue()


def http_response_payload(body: bytes, content_type: str = "text/html") -> bytes:
    """Wrap a body the way a crawl's response records carry it: HTTP/1.1
    status line + headers + blank line + body."""
    head = (
        b"HTTP/1.1 200 OK\r\n"
        + f"Content-Type: {content_type}\r\n".encode("ascii")
        + f"Content-Length: {len(body)}\r\n".encode("ascii")
        + _CRLF
    )
    return head + body


# ---------------------------------------------------------------------------
# incremental parser (reader side)
# ---------------------------------------------------------------------------

def _gunzip_members(data: bytes, chunk: int = 1 << 20) -> Iterator[bytes]:
    """Yield decompressed chunks across ALL concatenated gzip members.

    zlib.decompressobj(wbits=31) stops at each member boundary and parks
    the remainder in ``unused_data``; looping over that is the standard
    multistream walk. Memory high-water: one chunk + the remaining
    compressed tail — never the whole inflated archive.
    """
    pos = memoryview(data)
    while pos:
        d = zlib.decompressobj(wbits=31)
        buf = pos
        while not d.eof:
            if not buf:
                raise ValueError("truncated gzip member in WARC archive")
            out = d.decompress(bytes(buf[:chunk]), chunk)
            buf = buf[chunk:]
            while out:
                yield out
                out = d.decompress(b"", chunk)
        # unconsumed compressed bytes of THIS member + following members
        pos = memoryview(d.unused_data + bytes(buf))


def _parse_header_block(block: bytes) -> dict:
    headers: dict = {}
    lines = block.split(_CRLF)
    if not lines or not lines[0].startswith(b"WARC/"):
        raise ValueError(f"not a WARC record header: {lines[0][:40]!r}")
    for ln in lines[1:]:
        if not ln:
            continue
        k, _, v = ln.partition(b":")
        headers[k.decode("utf-8", "replace").strip().lower()] = v.decode(
            "utf-8", "replace"
        ).strip()
    return headers


def iter_warc_records(chunks: Iterable[bytes]) -> Iterator[Tuple[dict, bytes]]:
    """Incremental WARC parse over an iterator of byte chunks: yields
    (headers, payload) as soon as each record completes and trims the
    buffer, so memory is bounded by one record regardless of archive size."""
    buf = bytearray()
    it = iter(chunks)

    def _fill() -> bool:
        try:
            buf.extend(next(it))
            return True
        except StopIteration:
            return False

    while True:
        # skip inter-record padding
        while len(buf) < 4:
            if not _fill():
                if buf.strip(b"\r\n"):
                    raise ValueError("trailing garbage at end of WARC stream")
                return
        while buf[:2] == _CRLF:
            del buf[:2]
        hdr_end = buf.find(_HDR_END)
        while hdr_end < 0:
            if not _fill():
                if buf.strip(b"\r\n"):
                    raise ValueError("truncated WARC header at end of stream")
                return
            hdr_end = buf.find(_HDR_END)
        headers = _parse_header_block(bytes(buf[:hdr_end]))
        need = int(headers.get("content-length", "0"))
        body_start = hdr_end + len(_HDR_END)
        while len(buf) < body_start + need:
            if not _fill():
                raise ValueError("truncated WARC payload at end of stream")
        payload = bytes(buf[body_start : body_start + need])
        del buf[: body_start + need]
        yield headers, payload


def parse_warc_file(
    data: bytes,
    gzipped: Optional[bool] = None,
) -> Iterator[Tuple[dict, bytes]]:
    """Parse one archive's bytes; auto-detects gzip by magic when
    ``gzipped`` is None."""
    if gzipped is None:
        gzipped = data[:2] == b"\x1f\x8b"
    chunks = _gunzip_members(data) if gzipped else iter((data,))
    return iter_warc_records(chunks)


# ---------------------------------------------------------------------------
# the Spark source
# ---------------------------------------------------------------------------

def read_warc(
    spark: SparkSession,
    path: str,
    record_types: Tuple[str, ...] = ("response",),
    http_body: bool = True,
    batch_rows: int = 1024,
) -> DataFrame:
    """Distributed WARC read: one task per archive file.

    Returns ``(record_id, warc_type, url, warc_ts, content_type, payload,
    source_file)``. With ``http_body=True`` (the useful mode), response
    records' payloads are stripped to the HTTP body — the raw html bytes —
    exactly as crawled (byte-identical; no decode/re-encode).
    """
    want = {t.lower() for t in record_types} if record_types else None
    strip_http = bool(http_body)
    batch = int(batch_rows)

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def _parse(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "record_id", "warc_type", "url", "warc_ts",
            "content_type", "payload", "source_file",
        ]
        rows: list = []

        def _flush() -> pd.DataFrame:
            df = pd.DataFrame(rows, columns=cols)
            df["warc_ts"] = pd.to_datetime(df["warc_ts"], utc=True, errors="coerce")
            df["warc_ts"] = df["warc_ts"].dt.tz_localize(None)
            rows.clear()
            return df

        for pdf in parts:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for headers, payload in parse_warc_file(bytes(content)):
                    wtype = headers.get("warc-type", "").lower()
                    if want is not None and wtype not in want:
                        continue
                    if strip_http and payload[:5] == b"HTTP/":
                        split = payload.find(_HDR_END)
                        if split >= 0:
                            payload = payload[split + len(_HDR_END):]
                    rows.append((
                        headers.get("warc-record-id"),
                        wtype,
                        headers.get("warc-target-uri"),
                        headers.get("warc-date"),
                        headers.get("content-type"),
                        payload,
                        fpath,
                    ))
                    if len(rows) >= batch:
                        yield _flush()
        if rows:
            yield _flush()

    return files.mapInPandas(_parse, schema=WARC_SCHEMA)


def write_warc(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    payload_col: str = "html",
    ts_col: str = "warc_ts",
    warc_type: str = "resource",
    content_type: str = "text/plain; charset=utf-8",
    gzip_members: bool = True,
    records_per_file: int = 10000,
) -> DataFrame:
    """Distributed WARC sink: export a curated corpus back to crawl-archive
    form (the WET-style handoff format downstream tokenizer/training jobs
    consume). One task per input partition, each writing ``.warc.gz``
    files of at most ``records_per_file`` records; filenames are
    content-addressed (md5 of the archive bytes), so re-running an
    identical partition is idempotent — the resume property the backfill
    path already guarantees for tables. Returns the manifest — (path,
    n_records, bytes) per file written — which the caller should persist
    next to the data as lineage, mirroring ``plans/backfill.py``'s
    per-partition metrics contract.

    Payloads are written byte-identical (binary column) or utf-8 encoded
    (string column); ``WARC-Date`` renders from ``ts_col`` when present.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    cols = [url_col, payload_col] + ([ts_col] if ts_col in df.columns else [])
    src = df.select(*cols)
    has_ts = ts_col in df.columns
    wtype, ctype, gz, per_file = warc_type, content_type, gzip_members, int(records_per_file)

    def _write(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pending: list = []

        def _flush() -> Tuple[str, int, int]:
            data = make_warc_bytes(pending, gzip_members=gz)
            import hashlib
            path = os.path.join(out_dir, hashlib.md5(data).hexdigest()[:16] + (
                ".warc.gz" if gz else ".warc"))
            with open(path, "wb") as f:
                f.write(data)
            n = len(pending)
            pending.clear()
            return path, n, len(data)

        out_rows = []
        for pdf in parts:
            for row in pdf.itertuples(index=False):
                url = getattr(row, url_col)
                payload = getattr(row, payload_col)
                if isinstance(payload, str):
                    payload = payload.encode("utf-8")
                elif isinstance(payload, (bytearray, memoryview)):
                    payload = bytes(payload)
                headers = {
                    "WARC-Type": wtype,
                    "WARC-Target-URI": url,
                    "Content-Type": ctype,
                }
                if has_ts:
                    ts = getattr(row, ts_col)
                    if ts is not None:
                        headers["WARC-Date"] = pd.Timestamp(ts).strftime(
                            "%Y-%m-%dT%H:%M:%SZ")
                pending.append((headers, payload))
                if len(pending) >= per_file:
                    out_rows.append(_flush())
        if pending:
            out_rows.append(_flush())
        if out_rows:
            yield pd.DataFrame(out_rows, columns=["path", "n_records", "bytes"])

    return src.mapInPandas(_write, schema="path string, n_records long, bytes long")


def warc_to_webtext(
    spark: SparkSession,
    path: str,
    lang: bool = True,
) -> DataFrame:
    """Crawl archives → the engine's input table (BASELINE input_hint):
    ``(url, warc_ts, html, text, lang)``. html stays the exact crawled
    bytes; text is the deterministic extractor every downstream operator
    (and the byte-identical-text invariant) is pinned to."""
    from chronon_spark.operators.text_extract import extract_text
    from chronon_spark.operators.textstats import lang_id

    out = (
        read_warc(spark, path, record_types=("response",), http_body=True)
        .select(
            F.col("url"),
            F.col("warc_ts"),
            F.col("payload").alias("html"),
        )
        .withColumn("text", extract_text("html"))
    )
    if lang:
        out = out.withColumn("lang", lang_id("text"))
    return out

"""WARC ingestion source: parser round-trips, gzip multistream, the
distributed read, and the crawl -> input-table pipeline.

The writer (make_warc_bytes) and reader (parse_warc_file) are
independent code paths over the public ISO 28500 grammar; round-trip
equality plus hand-built byte fixtures keep them honest.
"""

import gzip
import hashlib

import pytest

from chronon_spark.sources.warc import (
    http_response_payload,
    iter_warc_records,
    make_warc_bytes,
    make_warc_record,
    parse_warc_file,
    read_warc,
    warc_to_webtext,
)


def _records(n=7, body_fn=None):
    recs = []
    for i in range(n):
        body = (body_fn(i) if body_fn else f"<html><body>doc {i} é中</body></html>").encode("utf-8")
        headers = {
            "WARC-Type": "response",
            "WARC-Record-ID": f"<urn:uuid:{i:032x}>",
            "WARC-Target-URI": f"https://example.org/page/{i}",
            "WARC-Date": f"2024-03-0{(i % 9) + 1}T12:00:0{i % 10}Z",
            "Content-Type": "application/http; msgtype=response",
        }
        recs.append((headers, http_response_payload(body)))
    return recs


# ---------------------------------------------------------------- parser --

def test_roundtrip_plain_and_gzip_multistream():
    recs = _records()
    for gz in (False, True):
        data = make_warc_bytes(recs, gzip_members=gz)
        parsed = list(parse_warc_file(data))
        assert len(parsed) == len(recs)
        for (h_in, p_in), (h_out, p_out) in zip(recs, parsed):
            assert p_out == p_in  # byte-identical payload
            assert h_out["warc-target-uri"] == h_in["WARC-Target-URI"]
            assert h_out["warc-type"] == "response"


def test_gzip_members_are_independent():
    """Common-Crawl shape: each record its own gzip member — the first
    member alone must decompress to exactly the first record."""
    recs = _records(3)
    data = make_warc_bytes(recs, gzip_members=True)
    d = gzip.decompress(data)  # gzip.decompress walks all members
    assert d == b"".join(make_warc_record(h, p) for h, p in recs)
    # chunked feed (1-byte chunks) exercises every buffer boundary
    rec0 = make_warc_record(*recs[0])
    chunks = [rec0[i : i + 1] for i in range(len(rec0))]
    parsed = list(iter_warc_records(chunks))
    assert len(parsed) == 1 and parsed[0][1] == recs[0][1]


def test_truncated_archive_raises():
    data = make_warc_bytes(_records(2), gzip_members=False)
    with pytest.raises(ValueError):
        list(iter_warc_records([data[: len(data) - 30]]))


def test_binary_payload_with_embedded_separators():
    """Content-Length framing, not delimiter scanning: a payload that
    CONTAINS header terminators and fake version lines must survive."""
    evil = b"\r\n\r\nWARC/1.0\r\nContent-Length: 999\r\n\r\n" + bytes(range(256))
    h = {"WARC-Type": "resource", "WARC-Target-URI": "https://example.org/x"}
    parsed = list(parse_warc_file(make_warc_record(h, evil)))
    assert parsed[0][1] == evil


# ---------------------------------------------------------------- spark --

@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("warc")
    recs = _records(20)
    # 3 archives: gz multistream, gz, and one uncompressed
    (root / "part-0.warc.gz").write_bytes(make_warc_bytes(recs[:8], gzip_members=True))
    (root / "part-1.warc.gz").write_bytes(make_warc_bytes(recs[8:15], gzip_members=True))
    (root / "part-2.warc").write_bytes(make_warc_bytes(recs[15:], gzip_members=False))
    return str(root), recs


def test_read_warc_distributed(spark, warc_dir):
    path, recs = warc_dir
    out = read_warc(spark, path).orderBy("url").collect()
    assert len(out) == len(recs)
    by_url = {r["url"]: r for r in out}
    for h, payload in recs:
        row = by_url[h["WARC-Target-URI"]]
        body = payload.split(b"\r\n\r\n", 1)[1]
        assert bytes(row["payload"]) == body  # http body, byte-identical
        assert row["warc_type"] == "response"
        # UTC session: warc-date parses to the exact instant
        assert row["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ") == h["WARC-Date"]
        assert row["source_file"].split("/")[-1].startswith("part-")


def test_read_warc_plan_is_one_stage(spark, warc_dir):
    path, _ = warc_dir
    plan = read_warc(spark, path)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # file -> records: zero shuffles


def test_warc_to_webtext_input_hint_schema(spark, warc_dir):
    path, recs = warc_dir
    df = warc_to_webtext(spark, path)
    assert [f.name for f in df.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    got = {r["url"]: r for r in df.collect()}
    assert len(got) == len(recs)
    for h, payload in recs:
        row = got[h["WARC-Target-URI"]]
        body = payload.split(b"\r\n\r\n", 1)[1]
        assert bytes(row["html"]) == body
        # byte-identical-text invariant: extractor output is a pure
        # function of the crawled bytes
        from chronon_spark.operators.text_extract import extract_text_bytes
        assert row["text"] == extract_text_bytes(body)
        assert row["lang"] is not None


def test_write_warc_roundtrip(spark, tmp_path):
    """Sink → source round-trip: a curated corpus exported with write_warc
    reads back byte-identical, and the manifest's counts are exact."""
    from pyspark.sql import functions as F
    from chronon_spark.sources.warc import write_warc

    df = spark.range(37).select(
        F.concat(F.lit("https://out.test/"), F.col("id")).alias("url"),
        F.encode(F.concat(F.lit("payload é "), F.col("id")), "utf-8").alias("html"),
        F.to_timestamp(F.lit("2024-06-01 08:30:00")).alias("warc_ts"),
    ).repartition(3)
    out = str(tmp_path / "wet")
    manifest = write_warc(df, out, records_per_file=10).collect()
    assert sum(m["n_records"] for m in manifest) == 37
    # >=1 file per non-empty partition, splits at records_per_file
    assert all(m["n_records"] <= 10 for m in manifest)

    back = read_warc(spark, out + "/*.warc.gz", record_types=("resource",))
    rows = {r["url"]: r for r in back.collect()}
    assert len(rows) == 37
    for i in range(37):
        r = rows[f"https://out.test/{i}"]
        assert bytes(r["payload"]) == f"payload é {i}".encode("utf-8")
        assert r["warc_ts"].strftime("%Y-%m-%d %H:%M:%S") == "2024-06-01 08:30:00"

    # idempotent re-run: content-addressed names, same file set
    names = {m["path"] for m in manifest}
    again = {m["path"] for m in write_warc(df, out, records_per_file=10).collect()}
    assert again == names


def test_curate_from_warc_archives_equals_direct(spark, tmp_path):
    """The full curation pipeline over a corpus that round-tripped through
    WARC archives produces EXACTLY the same per-stage survivor counts as
    curating the original frame — the html bytes are identical, and every
    pipeline stage derives from html. This is the crawl-archive ingestion
    guarantee end-to-end, not just per-record."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from webtext_curation import curate
    from pyspark.sql import functions as F
    from chronon_spark.sources.warc import warc_to_webtext, write_warc
    from chronon_spark.sources.webtext import generate_webtext

    base = (
        generate_webtext(spark, 1200, seed=21, n_domains=12)
        .dropDuplicates(["url"])  # unique urls so the lang re-attach join is 1:1
        .withColumn("text", F.lit(None).cast("string"))  # both paths re-extract
        .localCheckpoint()
    )
    out_dir = str(tmp_path / "arch")
    write_warc(base, out_dir, payload_col="html", warc_type="response",
               records_per_file=400).collect()

    crawl2 = (
        warc_to_webtext(spark, out_dir, lang=False)
        .withColumn("text", F.lit(None).cast("string"))
        .join(base.select("url", "lang"), "url")
        .select("url", "warc_ts", "html", "text", "lang")
    )
    # byte-identity through the archives
    diff = (
        base.select("url", F.md5("html").alias("h"))
        .exceptAll(crawl2.select("url", F.md5("html").alias("h")))
        .count()
    )
    assert diff == 0

    direct = curate(spark, base, verbose=False, dup_span_max=0.95)
    via_warc = curate(spark, crawl2, verbose=False, dup_span_max=0.95)
    assert [(n, c) for n, c, _w in via_warc["stages"]] == [
        (n, c) for n, c, _w in direct["stages"]
    ]


def test_payload_hash_matches_source_of_truth(spark, warc_dir):
    """End-to-end integrity: md5 over the Spark-read html equals md5 over
    the bytes that were written into the archive."""
    path, recs = warc_dir
    from pyspark.sql import functions as F

    got = dict(
        read_warc(spark, path)
        .select("url", F.md5("payload").alias("h"))
        .collect()
    )
    for h, payload in recs:
        body = payload.split(b"\r\n\r\n", 1)[1]
        assert got[h["WARC-Target-URI"]] == hashlib.md5(body).hexdigest()

"""The north-rule flagship: point-in-time feature backfill over the
Common-Crawl-style webtext table.

For each (url, warc_ts) crawl row, compute per-url and per-domain windowed
features as-of the crawl time — with zero temporal leakage and
byte-identical extracted text.
"""

import pytest
from pyspark.sql import functions as F

from chronon_spark.api.types import (
    Aggregation,
    EventSource,
    GroupBy,
    Join,
    JoinPart,
    Operation,
    Query,
    Window,
)
from chronon_spark.operators.asof_join import join_asof
from chronon_spark.operators.text_extract import extract_text, extract_text_bytes
from chronon_spark.sources.webtext import generate_webtext

N_ROWS = 4000


@pytest.fixture(scope="module")
def webtext_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("webtext") / "pages.parquet")
    generate_webtext(spark, N_ROWS, seed=7, n_domains=30, partitions=8).write.parquet(p)
    return p


def pages_source(path):
    return EventSource(
        table=path,
        query=Query(
            selects={
                "url": "url",
                "domain": "parse_url(url, 'HOST')",
                "text_len": "length(text)",
                "lang": "lang",
            },
            time_column="unix_micros(CAST(warc_ts AS TIMESTAMP)) div 1000",
        ),
    )


def test_flagship_join(spark, webtext_path):
    src = pages_source(webtext_path)
    url_gb = GroupBy(
        sources=(src,),
        key_columns=("url",),
        aggregations=(
            Aggregation("text_len", Operation.COUNT),  # crawls of this url so far
            Aggregation("text_len", Operation.AVERAGE, windows=(Window.days(30),)),
            Aggregation("text_len", Operation.LAST),
        ),
        name="url_hist",
    )
    domain_gb = GroupBy(
        sources=(src,),
        key_columns=("domain",),
        aggregations=(
            Aggregation("text_len", Operation.COUNT, windows=(Window.days(7),)),
            Aggregation("text_len", Operation.SUM, windows=(Window.days(7),)),
            Aggregation("lang", Operation.HISTOGRAM, windows=(Window.days(30),)),
        ),
        name="domain_hist",
    )
    j = Join(
        left=src,
        join_parts=(
            JoinPart(url_gb),
            JoinPart(domain_gb),
        ),
        name="webtext_features",
    )
    out = join_asof(spark, j)
    pdf = out.toPandas()
    assert len(pdf) == N_ROWS
    # each crawl row sees itself: count >= 1 everywhere
    assert (pdf["url_hist_text_len_count"] >= 1).all()
    assert (pdf["domain_hist_text_len_count_7d"] >= 1).all()
    # domain count >= url count (domain aggregates over more rows)
    more = pdf["domain_hist_text_len_count_7d"] >= 1
    assert more.all()
    assert pdf["domain_hist_lang_histogram_30d"].notna().all()


def test_flagship_zero_leakage(spark, webtext_path):
    """Perturb future rows' values; features at past query rows unchanged."""
    src = pages_source(webtext_path)
    gb = GroupBy(
        sources=(src,),
        key_columns=("domain",),
        aggregations=(
            Aggregation("text_len", Operation.SUM, windows=(Window.days(14),)),
            Aggregation("text_len", Operation.LAST),
        ),
        name="d",
    )
    j = Join(left=src, join_parts=(JoinPart(gb),), name="leak")
    base = join_asof(spark, j).toPandas().sort_values(["url", "ts"]).reset_index(drop=True)

    # poisoned copy: multiply text_len by 1000 for the last 20% of time
    cutoff = int(base["ts"].quantile(0.8))
    poisoned_src = EventSource(
        table=webtext_path,
        query=Query(
            selects={
                "url": "url",
                "domain": "parse_url(url, 'HOST')",
                "text_len": (
                    f"CASE WHEN unix_micros(CAST(warc_ts AS TIMESTAMP)) div 1000 > {cutoff} "
                    "THEN length(text) * 1000 ELSE length(text) END"
                ),
                "lang": "lang",
            },
            time_column="unix_micros(CAST(warc_ts AS TIMESTAMP)) div 1000",
        ),
    )
    gb2 = GroupBy(sources=(poisoned_src,), key_columns=("domain",), aggregations=gb.aggregations, name="d")
    j2 = Join(left=src, join_parts=(JoinPart(gb2),), name="leak")
    poisoned = join_asof(spark, j2).toPandas().sort_values(["url", "ts"]).reset_index(drop=True)

    past = base["ts"] <= cutoff
    assert past.sum() > 0
    for col in ["d_text_len_sum_14d", "d_text_len_last"]:
        a = base.loc[past, col].reset_index(drop=True)
        b = poisoned.loc[past, col].reset_index(drop=True)
        assert a.equals(b), col


def test_byte_identical_text_extraction(spark, webtext_path):
    pages = spark.read.parquet(webtext_path)
    ext = pages.select("url", "text", extract_text("html").alias("extracted"))
    # generator embeds exactly `text` inside <p>...</p> plus the title twice
    mismatch = ext.where(~F.col("extracted").contains(F.col("text"))).count()
    assert mismatch == 0
    # determinism: two independent runs, byte-identical results
    a = ext.select("url", "extracted").orderBy("url", "extracted").toPandas()
    b = (
        pages.select("url", extract_text("html").alias("extracted"))
        .orderBy("url", "extracted")
        .toPandas()
    )
    assert a["extracted"].tolist() == b["extracted"].tolist()


def test_extract_text_golden():
    """Pinned golden outputs for the extraction rules."""
    html = (
        b"<html><head><title>T</title><script>var x = 1 < 2;</script>"
        b"<style>p {color: red}</style></head>"
        b"<body><h1>Head</h1><p>Hello &amp; welcome to &lt;Spark&gt;</p></body></html>"
    )
    assert extract_text_bytes(html) == "T Head Hello & welcome to <Spark>"
    assert extract_text_bytes(b"") == ""
    assert extract_text_bytes(None) is None
    assert extract_text_bytes(b"plain  text\n\there") == "plain text here"


def test_generator_determinism(spark):
    a = generate_webtext(spark, 500, seed=3, partitions=2).orderBy("url", "warc_ts").toPandas()
    b = generate_webtext(spark, 500, seed=3, partitions=7).orderBy("url", "warc_ts").toPandas()
    assert a["text"].tolist() == b["text"].tolist()
    assert [bytes(x) for x in a["html"]] == [bytes(x) for x in b["html"]]
    assert a["url"].tolist() == b["url"].tolist()
    # domain skew exists: top domain should own >10% of pages
    top = a["url"].str.extract(r"https://(domain\d+)")[0].value_counts()
    assert top.iloc[0] / len(a) > 0.10

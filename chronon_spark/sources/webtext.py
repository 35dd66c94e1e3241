"""Deterministic synthetic Common-Crawl-style webtext table.

Schema per BASELINE.json ``input_hint``:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Properties engineered for the engine's test/bench surface:
- **skewed domain distribution** (Zipf-ish): a few hot domains own most
  pages — exercises salted-key skew handling,
- **deterministic**: html bytes and text are pure functions of
  (seed, row index), so any two runs (and any two parallelism levels)
  produce identical tables — the byte-identical-text invariant is testable,
- **distributed generation**: rows are synthesized on executors from a
  ``spark.range`` seed column (no driver-side materialization), so the same
  generator scales from 1k rows (tests) to billions (bench shape).

Generation is Arrow-vectorized via ``mapInPandas`` — no per-row Python UDFs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WEBTEXT_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

_LANGS = ["en", "de", "fr", "es", "zh", "ja", "ru", "pt", "it", "nl"]
_WORDS = (
    "the quick brown fox jumps over lazy dog data page web crawl index "
    "search query feature engine spark join window aggregate stream batch"
).split()


def _rng(seed: int, i: np.ndarray, salt: str) -> np.ndarray:
    """Stable per-row uint64 stream: splitmix64 mix of (seed, salt, index).

    Fully numpy-vectorized (no per-row Python) so generation stays fast at
    bench scale.
    """
    salt_h = int.from_bytes(hashlib.blake2b(salt.encode(), digest_size=8).digest(), "big")
    with np.errstate(over="ignore"):
        x = i.astype(np.uint64) + np.uint64((seed * 0x9E3779B97F4A7C15 + salt_h) & (2**64 - 1))
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _make_batch(
    pdf: pd.DataFrame,
    seed: int,
    n_domains: int,
    start_ms: int,
    span_ms: int,
    nav_boilerplate: bool = False,
    with_links: bool = False,
) -> pd.DataFrame:
    i = pdf["id"].to_numpy()
    r_dom = _rng(seed, i, "dom")
    r_path = _rng(seed, i, "path")
    r_ts = _rng(seed, i, "ts")
    r_body = _rng(seed, i, "body")

    # Zipf-ish domain skew: P(domain d) ~ 1/(d+1); inverse-CDF on uniform.
    u = (r_dom % np.uint64(1 << 32)).astype(np.float64) / float(1 << 32)
    harm = np.cumsum(1.0 / np.arange(1, n_domains + 1))
    harm /= harm[-1]
    dom = np.searchsorted(harm, u)

    # Several crawls of the same url over time: path count shrinks with
    # domain rank so hot domains have many pages AND many re-crawls per url.
    paths_per_dom = np.maximum(3, 1000 // (dom + 1))
    path = (r_path % paths_per_dom.astype(np.uint64)).astype(np.int64)

    urls = [f"https://domain{d}.example.com/page/{p}" for d, p in zip(dom, path)]
    ts_ms = start_ms + (r_ts % np.uint64(span_ms)).astype(np.int64)
    lang = [_LANGS[int(x % np.uint64(len(_LANGS)))] for x in r_body]

    texts, htmls = [], []
    for k in range(len(i)):
        w = int(r_body[k])
        nwords = 20 + (w % 200)
        words = [_WORDS[(w + 7 * j) % len(_WORDS)] for j in range(nwords)]
        text = " ".join(words)
        title = f"doc-{int(i[k])}"
        if nav_boilerplate:
            # per-domain nav + cookie footer: identical across every page
            # of a domain — the cross-document line-frequency signal that
            # line-level boilerplate removal exists to catch.
            d = int(dom[k])
            html = (
                f"<html><head><title>{title}</title>"
                f'<script>var x = "ignored";</script></head>'
                f"<body><div>home | about | contact | domain{d} navigation</div>"
                f"<h1>{title}</h1><p>{text}</p>"
                f"<footer>domain{d} uses cookies - accept our cookie policy</footer>"
                f"</body></html>"
            )
        else:
            html = (
                f"<html><head><title>{title}</title>"
                f'<script>var x = "ignored";</script></head>'
                f"<body><h1>{title}</h1><p>{text}</p></body></html>"
            )
        if with_links:
            # deterministic cross-domain anchors (id-derived targets with
            # the generator's Zipf skew preserved: everyone links toward
            # low-numbered domains) — gives the link-graph operators a
            # real edge distribution; text column is UNCHANGED.
            d = int(dom[k])
            t1 = (d + 1 + (w % 5)) % n_domains
            t2 = (w % (d + 1))  # skew: hot (low) domains draw in-links
            html = html.replace(
                "</body>",
                f'<a href="https://domain{t1}.example.com/page/0">'
                f"{_WORDS[w % len(_WORDS)]} link</a>"
                f'<a href="https://domain{t2}.example.com/page/1">hub</a>'
                "</body>",
            )
        texts.append(text)
        htmls.append(html.encode("utf-8"))

    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.to_datetime(ts_ms, unit="ms"),
            "html": htmls,
            "text": texts,
            "lang": lang,
        }
    )


def generate_webtext(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    n_domains: int = 100,
    start: str = "2024-01-01",
    span_days: int = 90,
    partitions: int | None = None,
    nav_boilerplate: bool = False,
    with_links: bool = False,
) -> DataFrame:
    """Distributed deterministic webtext generation.

    ``nav_boilerplate=True`` adds a per-domain nav line and cookie footer
    to the html (NOT the text column); ``with_links=True`` adds two
    deterministic cross-domain anchors per page (Zipf-skewed targets) for
    the link-graph operators — both opt-in so the default output stays
    byte-identical to the pinned goldens."""
    start_ms = int(pd.Timestamp(start).value // 1_000_000)
    span_ms = span_days * 86_400_000
    base = spark.range(0, n_rows, numPartitions=partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _make_batch(pdf, seed, n_domains, start_ms, span_ms, nav_boilerplate, with_links)

    return base.mapInPandas(gen, schema=WEBTEXT_SCHEMA)

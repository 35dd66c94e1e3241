"""Distributed inverted index: positional postings, term stats, relational
phrase search, and inter-crawl snapshot diffing.

Why it's here: a web-corpus pipeline needs a search surface over the
corpus itself — phrase-level benchmark decontamination ("does any training
document contain this eval sentence?"), duplicate-passage forensics, and
corpus analytics (df/idf vocabularies for quality classifiers and DSIR
feature spaces). The reference engine has no index operator (its
decontamination analogue is our n-gram ``dedup.benchmark_contamination``);
this module generalizes that to arbitrary-length phrases via the classic
IR positional-intersection, expressed entirely relationally. Crawl-diff
answers the other recurring webtext question — what changed between two
crawls of the same URL — with an exact word-set Jaccard.

Design for scale (10^12 tokens, 10^8 vocab):
- ``tokenize`` is a pure projection + ``posexplode`` of a JVM-side
  split/filter — zero Python, column pruning reaches the scan, and the
  token stream is never materialized (consumers aggregate it map-side).
- ``build_postings`` groups by (term, doc) — the DOC key spreads stopword
  mass, so "the" never lands on one task; per-group state is bounded by
  a single document's length.
- ``term_stats`` groups by term alone, but both aggregates (count, sum)
  are map-side combinable, so a stopword's billions of postings collapse
  to one partial per input partition before the exchange.
- ``phrase_search`` is the positional-intersection join: the phrase-term
  table is tiny by nature (an eval set), so it BROADCASTS; each token
  hit projects (phrase, doc, pos - offset) and a phrase occurrence is a
  group where every offset of the phrase is present. One shuffle, keyed
  by (phrase, doc, start) — again spread by doc. No per-phrase scans:
  ALL phrases are matched in a single pass over the token stream.
- ``crawl_diff`` joins the two snapshots' distinct (url, word) sets with
  a full outer join co-keyed on (url, word) — hot URLs spread across
  their vocabulary — then reduces to one row per url. Text-level
  unchanged/changed is decided by md5 equality, never by re-comparing
  bodies.

Cross-engine determinism: tokenization is lower + [^a-z0-9]+ -> space +
trim + split — the identical algebra runs in DuckDB (the oracle pairs
``unnest``/``generate_subscripts`` against Spark's ``posexplode``).
Positions are 1-based to match SQL subscripts. Jaccard is quantized to
integer micro-units with BIGINT floor division, exact in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# shared alnum word normalization; RE2-safe so the same pattern text runs
# in DuckDB oracles
WORD_NORM_PATTERN = "[^a-z0-9]+"
JACCARD_SCALE = 10**6


def norm_words(text_col: str = "text") -> F.Column:
    """Array of lowercase alnum words (no empties), the index token stream."""
    collapsed = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), WORD_NORM_PATTERN, " ")
    )
    # trim of an all-separator string yields '' and split('') == [''] —
    # filter keeps the empty-doc token list truly empty
    return F.filter(F.split(collapsed, " "), lambda w: w != F.lit(""))


def tokenize(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per token occurrence: (id_col, pos, term), pos 1-based.

    Pure projection + posexplode — no shuffle, no Python. Positions are
    1-based to line up with SQL array subscripts (the DuckDB oracle's
    ``generate_subscripts``).
    """
    exploded = df.select(
        F.col(id_col), F.posexplode(norm_words(text_col)).alias("pos0", "term")
    )
    return exploded.select(
        id_col, (F.col("pos0") + 1).cast("long").alias("pos"), "term"
    )


def build_postings(
    tokens: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Positional postings: (term, id, tf, positions sorted ascending).

    Grouped by (term, doc): stopwords spread across docs, and per-group
    state is bounded by one document's length — collect_list here can
    never exceed the longest document.
    """
    return tokens.groupBy("term", id_col).agg(
        F.count(F.lit(1)).alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )


def term_stats(tokens: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Vocabulary table: (term, df, total_tf).

    Two-level aggregate — (term, doc) first so df is a plain count, then
    term. Both levels are map-side combinable; the second exchange
    carries at most |vocab| rows per partition.
    """
    per_doc = tokens.groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf"))
    return per_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
    )


def merge_term_stats(*stats: DataFrame) -> DataFrame:
    """Merge vocabulary tables (term, df, total_tf) by pure addition —
    the incremental-index maintenance step.

    df and total_tf are additive counters, so a daily crawl increment is
    ``merge_term_stats(yesterday, term_stats(tokenize(new_docs)))`` and
    never rescans the corpus; a retraction (purged docs) is the same
    merge with the purged docs' stats NEGATED (callers flip the sign;
    terms whose df reaches 0 drop out). The merge cost is |vocab| +
    |delta vocab| rows — independent of corpus size. CONTRACT: each
    input's doc set must be disjoint from the others' (append-only
    increments / exact retractions), otherwise df double-counts.

    Plan: one union + one map-side-combinable groupBy over vocabulary
    rows only.
    """
    if not stats:
        raise ValueError("merge_term_stats needs at least one stats table")
    merged = stats[0]
    for s in stats[1:]:
        merged = merged.unionByName(s)
    return (
        merged.groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("total_tf").alias("total_tf"))
        .where(F.col("df") > 0)
    )


def negate_term_stats(stats: DataFrame) -> DataFrame:
    """Negated counters for retraction merges (see merge_term_stats)."""
    return stats.select(
        "term", (-F.col("df")).alias("df"), (-F.col("total_tf")).alias("total_tf")
    )


def phrase_search(
    tokens: DataFrame,
    phrases: DataFrame,
    id_col: str = "doc_id",
    phrase_id_col: str = "phrase_id",
    phrase_col: str = "phrase",
) -> DataFrame:
    """All (phrase_id, id) pairs where the document contains the phrase
    as a contiguous token run — the positional-intersection search.

    Every token hit against any phrase term projects a candidate start
    position ``pos - offset``; a true occurrence is a (phrase, doc,
    start) group covering every offset 1..len(phrase). Duplicate terms
    inside a phrase ("the cat the") are handled by counting DISTINCT
    offsets. The phrase table broadcasts (eval sets are small by
    nature); the single shuffle is keyed by (phrase, doc, start).
    """
    pterms = tokenize(phrases, id_col=phrase_id_col, text_col=phrase_col).select(
        phrase_id_col, F.col("pos").alias("offset"), "term"
    )
    plen = pterms.groupBy(phrase_id_col).agg(F.max("offset").alias("plen"))
    hits = tokens.join(F.broadcast(pterms), "term").select(
        phrase_id_col,
        F.col(id_col),
        (F.col("pos") - F.col("offset")).alias("start"),
        "offset",
    )
    occurrences = (
        hits.groupBy(phrase_id_col, id_col, "start")
        .agg(F.count_distinct("offset").alias("nhit"))
        .join(F.broadcast(plen), phrase_id_col)
        .where(F.col("nhit") == F.col("plen"))
    )
    return occurrences.select(phrase_id_col, id_col).distinct()


def bm25_topk(
    tokens: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    term_col: str = "term",
    k1_centi: int = 120,
    b_centi: int = 75,
    salt_partitions: int = 0,
) -> DataFrame:
    """Exact top-k BM25 retrieval for a (small) keyword-query set over the
    corpus token stream — the ranking half of the index surface (quality
    probes, topic audits, retrieval-based decontamination triage).

    ``queries`` is (query_id, term) with DISTINCT terms per query (bag
    semantics are deduped by the caller). Returns (query_id, doc_id,
    score_micro, rnk) for the k best docs per query, ties broken by
    doc_id ascending.

    Scoring is the classic Okapi BM25 with k1/b as centi-integers
    (120/75 == 1.2/0.75), computed in INTEGER micro/milli units so the
    DuckDB oracle is bit-exact:
    - idf_micro  = max(0, floor(ln((2N-2df+1)/(2df+1)) * 1e6 + 0.5)) —
      the one float op; clamping at 0 (standard for df > N/2 stopwords)
      also keeps every subsequent division non-negative, where Spark DIV
      and DuckDB // agree.
    - norm_milli = (dl * N * 1000) DIV total_tokens  (== 1000 * dl/avgdl;
      overflow bound: dl*N*1000 < 2^63 holds to ~10^5 * 10^9 docs)
    - denom_milli = tf*1000 + (k1_centi*((100-b_centi)*10
                    + (b_centi*10*norm_milli) DIV 1000)) DIV 100
    - contrib_micro = (idf_micro * tf * (k1_centi+100) * 10)
                      DIV denom_milli
    - score_micro = sum(contrib_micro) over the query's terms.

    Plan: corpus scalars (N, total tokens) are ONE single-row aggregate
    broadcast into the plan — no driver collect; df comes from
    ``term_stats``-shaped aggregation filtered to the query vocabulary
    BEFORE the exchange (broadcast semi join — only query terms are
    aggregated); postings join the broadcast query-term table. The final
    ranking rides the exact salted two-phase ``sampling.top_k_per_key``
    when ``salt_partitions > 1``: a BROAD query ("the") has a candidate
    set the size of the corpus, and a plain per-query window puts all of
    it in ONE task — salting caps any task at a 1/s slice (pinned
    identical to the unsalted result; top-k is merge-associative). The
    rank window afterwards runs over at most k rows per query.
    """
    from pyspark.sql import Window as W

    from chronon_spark.operators.sampling import top_k_per_key

    qterms = F.broadcast(
        queries.select(query_id_col, term_col).distinct()
    )
    qvocab = F.broadcast(queries.select(term_col).distinct())

    dl = tokens.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    corpus = F.broadcast(
        dl.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").alias("total_tokens"),
        )
    )
    # postings restricted to the query vocabulary before aggregating
    postings = (
        tokens.join(qvocab, term_col)
        .groupBy(term_col, id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_tbl = postings.groupBy(term_col).agg(F.count(F.lit(1)).alias("df"))
    idf = (
        df_tbl.crossJoin(corpus)
        .select(
            term_col,
            F.greatest(
                F.lit(0),
                F.expr(
                    "CAST(floor(ln((2*n_docs - 2*df + 1) / (2*df + 1)) * 1000000"
                    " + 0.5) AS BIGINT)"
                ),
            ).alias("idf_micro"),
        )
    )
    scored = (
        postings.join(F.broadcast(idf), term_col)
        .join(qterms, term_col)
        .join(dl, id_col)
        .crossJoin(corpus)
        .select(
            query_id_col,
            id_col,
            F.expr(
                f"""
                (idf_micro * tf * {(k1_centi + 100) * 10}) DIV (
                  tf * 1000 + ({k1_centi} * ({(100 - b_centi) * 10}
                    + ({b_centi * 10} * ((dl * n_docs * 1000) DIV total_tokens))
                      DIV 1000)) DIV 100)
                """
            ).alias("contrib_micro"),
        )
        .groupBy(query_id_col, id_col)
        .agg(F.sum("contrib_micro").alias("score_micro"))
    )
    best = top_k_per_key(
        scored,
        key_col=query_id_col,
        k=k,
        id_col=id_col,
        order_col="score_micro",
        salt_partitions=salt_partitions,
    )
    rnk = F.row_number().over(
        W.partitionBy(query_id_col).orderBy(F.desc("score_micro"), F.asc(id_col))
    )
    return best.select(
        query_id_col, id_col, "score_micro", rnk.cast("long").alias("rnk")
    )


def recrawl_stats(
    snapshots: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Per-URL change history over MANY crawl snapshots — the recrawl-
    scheduling prior (crawl often what changes often).

    ``snapshots`` is the union of k crawls: (url, text) with one row per
    (crawl, url) observation. Returns (url, n_obs, n_versions,
    change_rate_micro) where n_versions counts DISTINCT bodies and
    change_rate_micro = floor(1e6 * (n_versions-1) / (n_obs-1)) — 0 for
    a page never seen to change, 1e6 for one that changed at every
    observation, NULL when observed once (no evidence).

    Plan: bodies hash to md5 in the projection (text never crosses the
    exchange), then ONE map-side-combinable groupBy(url) with a distinct
    aggregate. Integer floor division, cross-engine exact.
    """
    h = snapshots.select(
        F.col(url_col).alias("url"), F.md5(F.col(text_col)).alias("__h")
    )
    agg = h.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.count_distinct("__h").alias("n_versions"),
    )
    rate = F.when(F.col("n_obs") > 1, F.expr(
        f"({JACCARD_SCALE} * (n_versions - 1)) DIV (n_obs - 1)"
    )).otherwise(F.lit(None).cast("long"))
    return agg.select(
        "url", "n_obs", "n_versions", rate.cast("long").alias("change_rate_micro")
    )


def crawl_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Per-URL change report between two crawl snapshots.

    Returns (url, status, jaccard_micro):
    - status: 'added' (only in new), 'deleted' (only in old),
      'unchanged' (byte-identical text by md5), 'changed' otherwise;
    - jaccard_micro: floor(1e6 * |A∩B| / |A∪B|) over the DISTINCT word
      sets of the two bodies — BIGINT-exact, NULL for added/deleted,
      and 1e6 when both word sets are empty (identical empties).

    Plan: two distinct-(url, word) aggregations (map-side combinable,
    keyed by url+word so hot URLs spread), one full outer join co-keyed
    on (url, word), one reduce to per-url counts, and a presence join of
    the two per-url md5 projections. Bodies are hashed once and never
    re-compared.
    """

    def word_sets(df: DataFrame) -> DataFrame:
        return (
            df.select(F.col(url_col).alias("url"), F.explode(norm_words(text_col)).alias("word"))
            .distinct()
        )

    def presence(df: DataFrame, md5_name: str) -> DataFrame:
        return df.select(
            F.col(url_col).alias("url"), F.md5(F.col(text_col)).alias(md5_name)
        )

    a, b = word_sets(old), word_sets(new)
    joined = a.withColumn("in_a", F.lit(1)).join(
        b.withColumn("in_b", F.lit(1)), ["url", "word"], "full_outer"
    )
    counts = joined.groupBy("url").agg(
        F.sum(F.coalesce("in_a", F.lit(0))).alias("n_a"),
        F.sum(F.coalesce("in_b", F.lit(0))).alias("n_b"),
        F.sum(
            F.when(F.col("in_a").isNotNull() & F.col("in_b").isNotNull(), 1).otherwise(0)
        ).alias("n_both"),
    )
    pres = presence(old, "md5_a").join(presence(new, "md5_b"), "url", "full_outer")
    # a URL whose bodies normalize to zero tokens has no (url, word) rows
    # at all — coalesce the missing counts to empty sets
    out = pres.join(counts, "url", "left").select(
        "url",
        "md5_a",
        "md5_b",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
        F.coalesce("n_both", F.lit(0)).alias("n_both"),
    )
    union_n = F.col("n_a") + F.col("n_b") - F.col("n_both")
    jacc = F.when(
        F.col("md5_a").isNull() | F.col("md5_b").isNull(), F.lit(None).cast("long")
    ).otherwise(
        F.when(union_n == 0, F.lit(JACCARD_SCALE)).otherwise(
            F.expr(f"({JACCARD_SCALE} * n_both) DIV (n_a + n_b - n_both)")
        )
    )
    status = (
        F.when(F.col("md5_a").isNull(), F.lit("added"))
        .when(F.col("md5_b").isNull(), F.lit("deleted"))
        .when(F.col("md5_a") == F.col("md5_b"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return out.select(
        "url", status.alias("status"), jacc.cast("long").alias("jaccard_micro")
    )


def crawl_priority(
    stats: DataFrame,
    ranks: DataFrame,
    url_domain_pattern: str = r"^https?://([^/]+)",
    default_rate_micro: int = 500_000,
    rank_div: int = 10**6,
) -> DataFrame:
    """Crawl-frontier scheduling priority: crawl often what CHANGES often
    on domains that MATTER — the standard recrawl-policy composition of a
    per-URL change-rate prior (``recrawl_stats``) with a domain
    centrality score (``domain_pagerank`` / ``harmonic_centrality``).

    ``priority_micro = (1 + rate) * (1 + rank DIV rank_div)`` — all
    integer (rate ≤ 1e6, rank DIV rank_div bounded by scale/rank_div, so
    the product stays far under int64), URLs never observed to change
    take ``default_rate_micro`` (never-crawled-again is itself evidence
    worth scheduling), unranked domains rank 0.

    Plan: domain extraction is a projection; the rank table is
    |domains| rows and broadcast — ZERO extra shuffles on the URL table.
    """
    dom = F.regexp_extract(F.col("url"), url_domain_pattern, 1)
    j = stats.withColumn("domain", dom).join(
        F.broadcast(ranks.select("domain", "rank")), "domain", "left"
    )
    rate = F.coalesce(F.col("change_rate_micro"), F.lit(default_rate_micro))
    priority = (F.lit(1) + rate) * (
        F.lit(1) + F.expr(f"coalesce(rank, 0) DIV {rank_div}")
    )
    return j.select(
        "url",
        "domain",
        "n_obs",
        "n_versions",
        "change_rate_micro",
        F.coalesce("rank", F.lit(0)).cast("long").alias("rank"),
        priority.cast("long").alias("priority_micro"),
    )


def schedule_crawl(
    frontier: DataFrame,
    domain_col: str = "domain",
    priority_col: str = "priority_micro",
    url_col: str = "url",
    per_slot: int = 10,
    max_frontier_per_domain: int = 0,
    salt_partitions: int = 0,
    delays: DataFrame = None,
    default_delay_sec: int = 1,
) -> DataFrame:
    """Politeness-slot assignment — the last step of the frontier
    pipeline (discover → robots-filter → prioritize → SCHEDULE): a
    crawler fetches at most ``per_slot`` URLs per domain per wave, so
    within each domain the rank-ordered frontier (priority desc, url asc
    ties) is cut into waves: ``slot = (rank - 1) DIV per_slot``.

    Hot-domain bound: the per-domain rank is a window, so one domain's
    frontier sits in one task. ``max_frontier_per_domain > 0`` first caps
    each domain's frontier via the exact SALTED two-phase top-k
    (``sampling.top_k_per_key`` — no single-task bottleneck), then ranks
    only the bounded survivors; at web scale pass the crawl budget here.

    ``delays``: an optional (domain, crawl_delay_sec) frame — the
    :func:`robots.parse_crawl_delay` output — joined broadcast (it is
    bounded by |domains|); domains without a directive take
    ``default_delay_sec``. Each URL then carries
    ``not_before_sec = (rank - 1) * delay``, the earliest fetch offset
    that honors one request per delay per domain — exact integer
    arithmetic. Returns frontier columns + (rank, slot, not_before_sec).
    """
    from pyspark.sql import Window as W

    from chronon_spark.operators.sampling import top_k_per_key

    df = frontier
    if max_frontier_per_domain > 0:
        df = top_k_per_key(
            df,
            key_col=domain_col,
            k=max_frontier_per_domain,
            id_col=url_col,
            order_col=priority_col,
            salt_partitions=salt_partitions,
        )
    w = W.partitionBy(domain_col).orderBy(
        F.desc(priority_col), F.asc(url_col)
    )
    ranked = df.withColumn("rank", F.row_number().over(w).cast("long"))
    ranked = ranked.withColumn(
        "slot", F.expr(f"(rank - 1) DIV {per_slot}").cast("long")
    )
    if delays is not None:
        # join on the LOWERCASED domain: parse_crawl_delay lowercases and
        # a politeness rate must never fail open on 'Example.com' (the
        # same never-fail-open rule as apply_robots' host join)
        ranked = ranked.withColumn("__dkey", F.lower(F.col(domain_col))).join(
            F.broadcast(
                delays.select(
                    F.lower(F.col("domain")).alias("__dkey"),
                    F.col("crawl_delay_sec").alias("__delay"),
                )
            ),
            "__dkey",
            "left",
        )
        delay = F.coalesce(F.col("__delay"), F.lit(default_delay_sec))
    else:
        delay = F.lit(default_delay_sec)
    return ranked.withColumn(
        "not_before_sec", ((F.col("rank") - 1) * delay).cast("long")
    ).drop("__delay", "__dkey")


def url_trap_stats(
    urls: DataFrame,
    url_col: str = "url",
    min_urls: int = 20,
    min_urls_per_template: int = 10,
) -> DataFrame:
    """Crawl-trap detection: flag domains whose URL space collapses to a
    handful of templates — calendar traps, session-id explosions,
    faceted-search infinite spaces. The classic crawler defense (every
    production frontier caps these): a domain offering millions of URLs
    that are all ``/cal/N/N`` is generating pages, not hosting them, and
    crawling it starves real domains of fetch slots.

    Template rule (deterministic, literal-subset): strip scheme+host,
    collapse every digit run in the remaining path+query to ``N``. URLs
    per template is the explosion measure; ``is_trap`` needs BOTH volume
    (``n_urls >= min_urls``) and collapse
    (``n_urls DIV n_templates >= min_urls_per_template`` — integer
    division, cross-engine exact).

    Plan: one pure projection (regexp — zero Python), then a two-level
    aggregate: (domain, template) counts first — map-side combinable, so
    a trap's millions of identical templates collapse per-partition
    before the exchange and a hot domain never lands on one task — then
    the per-domain rollup. Output is |domains| rows.

    Returns (domain, n_urls, n_templates, urls_per_template,
    max_template_urls, is_trap).
    """
    # scheme/host comparisons are case-insensitive (apply_robots' rule:
    # a crawl control must never split or miss on 'HTTPS://TRAP.example')
    # — the host lowercases and the scheme pattern accepts any case; the
    # PATH keeps its case (paths are case-sensitive)
    proj = urls.select(
        F.lower(
            F.regexp_extract(
                F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)", 1
            )
        ).alias("domain"),
        F.regexp_replace(
            F.regexp_replace(
                F.col(url_col), "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", ""
            ),
            "[0-9]+",
            "N",
        ).alias("template"),
    )
    per_template = proj.groupBy("domain", "template").agg(
        F.count(F.lit(1)).alias("c")
    )
    out = per_template.groupBy("domain").agg(
        F.sum("c").alias("n_urls"),
        F.count(F.lit(1)).alias("n_templates"),
        F.max("c").alias("max_template_urls"),
    )
    upt = F.expr("n_urls DIV n_templates")
    return out.select(
        "domain",
        "n_urls",
        "n_templates",
        upt.alias("urls_per_template"),
        "max_template_urls",
        (
            (F.col("n_urls") >= min_urls) & (upt >= min_urls_per_template)
        ).alias("is_trap"),
    )

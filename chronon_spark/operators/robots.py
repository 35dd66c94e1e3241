"""robots.txt parsing and URL exclusion — the crawl-politeness gate.

A crawl pipeline must not fetch (or must drop, post-hoc) URLs a site's
``robots.txt`` disallows. This implements the RFC 9309 core as pure
relational plans so the DuckDB oracle replays the identical semantics:

- **Grouping**: a ``User-agent:`` line STARTS a new group when the
  previous retained line is not itself a ``User-agent`` line (RFC 9309
  §2.1 start-of-group); all agents of the group share its rules.
- **Matching**: a rule applies when the URL path starts with the rule's
  path prefix; the LONGEST matching prefix wins, ``Allow`` beating
  ``Disallow`` on equal length (Google/RFC longest-match rule).
- Unmatched URLs are allowed; a missing robots.txt allows everything.
- Subset: literal path prefixes only (no ``*``/``$`` wildcards — the
  overwhelming majority of real rules; wildcard rules are IGNORED, the
  safe-permissive reading is documented rather than mis-matched).

Scale shape: parsing is posexplode + two window passes PARTITIONED BY
(DOMAIN, FILE) — robots files are KB-sized, so the window is bounded
and hot-key-safe (unlike per-entity event windows); multiple files per
domain (recrawl snapshots) parse independently and their rule sets
union. Matching is one broadcast join (the rules table is bounded by
|domains| x rules-per-file) + ONE hash aggregation whose map-side
combine collapses the per-rule fan-out back to a single combined row
per URL row before the exchange — no window, no sort over URLs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

WILDCARD_CHARS = ("*", "$")


def parse_robots(
    df: DataFrame,
    domain_col: str = "domain",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """(domain, rule, path_prefix) for the rules governing ``agent``.

    ``agent`` matching is the RFC's simplified token equality plus the
    ``*`` catch-all group; a specific agent's groups SHADOW the ``*``
    groups entirely when present (RFC 9309 §2.2.1: most specific group
    wins, no merging).
    """
    grouped = _directives(df, domain_col, text_col)
    rules = grouped.where(F.col("key").isin("disallow", "allow")).select(
        "domain",
        "__file",
        "group_id",
        F.col("key").alias("rule"),
        F.col("value").alias("path_prefix"),
    )
    # wildcard rules are out of the literal-prefix subset: drop, documented
    for ch in WILDCARD_CHARS:
        rules = rules.where(~F.col("path_prefix").contains(ch))
    # empty Disallow: means "allow everything" for the group — no rule
    rules = rules.where(F.col("path_prefix") != "")
    chosen = _chosen_groups(grouped, agent)
    return (
        rules.join(chosen, ["domain", "__file", "group_id"])
        .select("domain", "rule", "path_prefix")
        .distinct()
    )


def _directives(df: DataFrame, domain_col: str, text_col: str) -> DataFrame:
    """Shared robots.txt line grammar: (domain, __file, pos, key, value,
    group_id). EVERY keyed line is retained for grouping (RFC 9309 §2.1:
    a User-agent line starts a new group when the previous line is any
    NON-user-agent line — so a Crawl-delay between two User-agent lines
    separates their groups even though it is not an allow/disallow
    rule); callers filter ``key`` afterwards."""
    # one window partition PER INPUT FILE: multiple robots rows for a
    # domain (recrawl snapshots) must parse independently — a shared
    # per-domain window would interleave the files' lines and attach one
    # file's rules to another's group. The resulting rule set is the
    # UNION over the domain's files (conservative), deterministically.
    # the id must bind BEFORE the explode (withColumn = per input row);
    # inside the same select as posexplode it would evaluate per LINE
    lines = df.withColumn("__file", F.monotonically_increasing_id()).select(
        F.lower(F.col(domain_col)).alias("domain"),
        "__file",
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).select(
        "domain",
        "__file",
        "pos",
        F.trim(F.regexp_replace("line", r"#.*$", "")).alias("line"),
    ).where(F.col("line") != "")
    typed = lines.select(
        "domain",
        "__file",
        "pos",
        F.lower(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1)).alias("key"),
        F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:(.*)$", 1)).alias("value"),
    ).where(F.col("key") != "")
    w = W.partitionBy("domain", "__file").orderBy("pos")
    grouped = (
        typed.withColumn("prev_key", F.lag("key").over(w))
        .withColumn(
            "starts_group",
            (
                (F.col("key") == "user-agent")
                & (F.coalesce(F.col("prev_key"), F.lit("")) != "user-agent")
            ).cast("int"),
        )
        .withColumn("group_id", F.sum("starts_group").over(w))
    )
    # group ids restart per (domain, file): every downstream join must be
    # keyed on __file too, or groups from different files would collide
    return grouped


def _chosen_groups(grouped: DataFrame, agent: str) -> DataFrame:
    """(domain, __file, group_id) of the groups governing ``agent``:
    token equality plus the ``*`` catch-all, a specific agent's groups
    SHADOWING the ``*`` groups entirely (RFC 9309 §2.2.1)."""
    agents = (
        grouped.where(F.col("key") == "user-agent")
        .select("domain", "__file", "group_id", F.lower("value").alias("agent"))
        .distinct()
    )
    mine = agents.where(F.lower(F.lit(agent)) == F.col("agent"))
    star = agents.where(F.col("agent") == "*")
    has_specific = mine.select("domain").distinct()
    return mine.unionByName(
        star.join(has_specific, "domain", "left_anti")
    ).select("domain", "__file", "group_id").distinct()


def parse_crawl_delay(
    df: DataFrame,
    domain_col: str = "domain",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """(domain, crawl_delay_sec) from the ``Crawl-delay:`` directive of
    the groups governing ``agent`` — the de-facto politeness-rate
    extension every major crawler honors (not in RFC 9309 proper, but in
    the same grammar). Feeds :func:`indexing.schedule_crawl` so fetch
    waves respect per-domain rates instead of one global cadence.

    Non-numeric values are ignored; fractional seconds round UP (a
    politeness floor must never round toward impolite); multiple
    governing groups/files take the MAX (conservative). Same group
    grammar and agent-shadowing as :func:`parse_robots`.
    """
    grouped = _directives(df, domain_col, text_col)
    chosen = _chosen_groups(grouped, agent)
    delays = (
        grouped.where(
            (F.col("key") == "crawl-delay")
            & F.col("value").rlike(r"^[0-9]+(\.[0-9]+)?$")
        )
        .join(chosen, ["domain", "__file", "group_id"])
        .select("domain", F.ceil(F.col("value").cast("double")).cast("long").alias("__d"))
    )
    return delays.groupBy("domain").agg(F.max("__d").alias("crawl_delay_sec"))


def url_path(url_col: Column) -> Column:
    """Path component of an absolute URL, '/' when empty. Scheme matching
    is case-insensitive (URL schemes are); the PATH keeps its case (paths
    are case-sensitive per the robots spec)."""
    p = F.regexp_extract(url_col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+(/[^?#]*)", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def apply_robots(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """``urls`` + (allowed, matched_rule, matched_prefix) under ``rules``
    (the :func:`parse_robots` output). Longest-prefix match, Allow wins
    ties, unmatched/ruleless URLs allowed; duplicate input rows are
    preserved (verdicts attach per ROW, not per distinct URL). Scheme and
    host comparisons are case-insensitive — a politeness gate must never
    fail OPEN on 'HTTPS://A.com/...'. Plan: one broadcast join keyed by
    the lowercased host, then ONE hash aggregation reducing the joined
    fan-out back to a single combined row per input row (map-side
    combined max_by; no window, no sort)."""
    u = urls.withColumn("__rid", F.monotonically_increasing_id()).withColumn(
        "__dom",
        F.lower(
            F.regexp_extract(
                F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)", 1
            )
        ),
    ).withColumn("__path", url_path(F.col(url_col)))
    joined = u.join(
        F.broadcast(rules.withColumnRenamed("domain", "__dom")),
        "__dom",
        "left",
    ).withColumn(
        "__hit",
        F.col("path_prefix").isNotNull()
        & F.col("__path").startswith(F.col("path_prefix")),
    )
    # rank: longest prefix first; allow beats disallow on equal length
    order = F.when(
        F.col("__hit"),
        F.length("path_prefix") * 2 + (F.col("rule") == "allow").cast("int"),
    ).otherwise(F.lit(-1))
    winner = joined.groupBy("__rid", *[F.col(c) for c in urls.columns]).agg(
        F.max_by(F.struct("rule", "path_prefix"), order).alias("__w"),
        F.max(order).alias("__best"),
    )
    return winner.select(
        *urls.columns,
        F.when(F.col("__best") < 0, F.lit(True))
        .otherwise(F.col("__w.rule") == "allow")
        .alias("allowed"),
        F.when(F.col("__best") >= 0, F.col("__w.rule")).alias("matched_rule"),
        F.when(F.col("__best") >= 0, F.col("__w.path_prefix")).alias("matched_prefix"),
    )


# sitemap grammar (sitemaps.org protocol): one <url> element per page
# with <loc> required and <lastmod>/<priority> optional; an index file
# lists further sitemaps as <sitemap><loc> elements. (?s): elements span
# lines. No backslash classes anywhere — the element pattern is embedded
# in a SQL string literal (different escaping rules than the Column
# API), so whitespace is handled by trim() instead.
_SITEMAP_URL_EL = "(?s)<url>(.*?)</url>"
_SITEMAP_IDX_EL = "(?s)<sitemap>(.*?)</sitemap>"


def parse_sitemap(
    df: DataFrame,
    domain_col: str = "domain",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """(domain, kind, loc, lastmod, priority_milli) from sitemap XML —
    the crawl-discovery twin of :func:`parse_robots`.

    ``kind`` is ``url`` (a page entry) or ``sitemap`` (an index entry
    pointing at a child sitemap the frontier must fetch next).
    ``priority_milli`` is the protocol's 0.0-1.0 priority as an exact
    integer in thousandths (500 when absent, per the protocol default).
    Pure projection + explode over ``regexp_extract_all`` (the
    extract_anchors pattern) — zero Python, zero shuffle; entries per
    file are protocol-bounded (50k), so explode fan-out is bounded.
    """
    def entries(pattern: str, kind: str) -> DataFrame:
        el = F.explode(
            F.expr(
                f"regexp_extract_all(CAST({xml_col} AS STRING), '{pattern}', 1)"
            )
        ).alias("el")
        out = df.select(F.col(domain_col).alias("domain"), el)
        loc = F.trim(F.regexp_extract("el", "(?s)<loc>([^<]+)</loc>", 1))
        lastmod = F.trim(
            F.regexp_extract("el", "(?s)<lastmod>([^<]+)</lastmod>", 1)
        )
        prio = F.trim(
            F.regexp_extract("el", "(?s)<priority>([^<]+)</priority>", 1)
        )
        return out.select(
            "domain",
            F.lit(kind).alias("kind"),
            loc.alias("loc"),
            F.when(lastmod == "", None).otherwise(lastmod).alias("lastmod"),
            F.when(prio == "", F.lit(500))
            # round, not floor: 0.3*1000 is 299.99... in doubles, and
            # protocol priorities have <= 3 decimals so round is exact
            .otherwise(F.round(prio.cast("double") * 1000).cast("int"))
            .cast("long")
            .alias("priority_milli"),
        ).where(F.col("loc") != "")

    return entries(_SITEMAP_URL_EL, "url").unionByName(
        entries(_SITEMAP_IDX_EL, "sitemap")
    )

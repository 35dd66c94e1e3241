"""Deduplication operators for web-scale text corpora.

All hot paths are pure Spark SQL expressions (JVM, whole-stage codegen) —
no Python in the per-row path. Hash functions are md5-derived so that
results are portable across engines (the DuckDB oracle can reproduce them
bit-for-bit), deterministic across runs, and independent of Spark's
internal hash seed.

Operators:
- exact_dedup:         hash-groupBy on normalized text, keep min-id doc
- shingles/minhash:    word k-gram shingles -> n portable min-hashes
- minhash_lsh_pairs:   banded LSH candidate pairs (+ exact-jaccard verify)
- ngram_jaccard_pairs: exact Jaccard over shingle sets; default path is
                       PPJoin-style prefix filtering (rare-first global
                       order), so boilerplate shingles never enter the
                       candidate join (measured: 20k docs sharing a
                       10-shingle footer -> brute inverted index OOMs,
                       prefix path 7.3s on local[32])
- simhash64:           64-bit SimHash over tokens, expression-only
- hamming distance:    bit_count(xor) for simhash near-dup buckets

Scale notes: LSH banding turns the O(n^2) pair problem into
groupBy(band, bucket) + within-bucket self-join — shuffle is O(n * bands);
hot buckets (boilerplate shingles) are capped via bucket-size limit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chronon_spark.checkpoint import release_checkpoint


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition expression-heavy inputs UP to the session's default
    parallelism when the scan delivered fewer partitions (one small
    parquet file -> one task doing all the shingling/regex work while 31
    cores idle — measured 38 s -> 1.5 s on duplicated_span_flags at
    sf0.1). A no-op when the input is already at least that wide, so at
    real scale (thousands of splits) no extra shuffle is introduced."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def norm_text(col: str = "text") -> Column:
    """Normalization used before exact dedup: lowercase, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")


def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Keep exactly one row (min id) per distinct normalized text."""
    h = F.md5(norm_text(text_col)).alias("__h")
    keep = (
        df.select(F.col(id_col), h)
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
    )
    return df.join(keep.select(id_col, "dup_count"), on=id_col, how="inner")


def words(text_col: str = "text") -> Column:
    return F.split(F.trim(F.col(text_col)), r"\s+")


def boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """C4/RefinedWeb-style boilerplate-LINE removal: drop every line that
    occurs (whitespace/case-normalized) in at least ``min_docs`` DISTINCT
    documents — cookie banners, nav bars, "terms of service" footers.
    Blank lines normalize to the same empty key, so they are removed too
    once they repeat across documents (C4 drops them likewise).

    Returns (id, clean_text, n_lines, n_removed) — one row per input doc,
    clean_text = surviving lines rejoined in original order ('' if every
    line was boilerplate).

    Scale shape (100 TB): posexplode lines -> ONE map-side-combined
    count-distinct-docs per line hash -> shuffle LEFT ANTI join of lines
    against the hot-line set (the hot set is unbounded — a crawl has
    billions of distinct repeated lines — so it is NOT broadcast) -> one
    groupBy(doc) rebuild. Three hash shuffles, no Python, no driver
    state. Reference scope note: the reference stops at document-level
    ops; line-level boilerplate removal is the curation-pipeline layer on
    top (C4: Raffel et al. 2020 §2.2; RefinedWeb: Penedo et al. 2023).
    """
    lines = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("__lh", F.md5(F.regexp_replace(F.lower(F.trim("line")), r"\s+", " ")))
    hot = (
        lines.groupBy("__lh")
        .agg(F.countDistinct("__id").alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("__lh")
    )
    kept = lines.join(hot, "__lh", "left_anti")
    rebuilt = kept.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    totals = lines.groupBy("__id").agg(F.count(F.lit(1)).alias("n_lines"))
    return totals.join(rebuilt, "__id", "left").select(
        F.col("__id").alias(id_col),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        "n_lines",
        (F.col("n_lines") - F.coalesce("__n_kept", F.lit(0))).alias("n_removed"),
    )


def shingles(text_col: str = "text", k: int = 3) -> Column:
    """Distinct word k-gram shingles as an array<string>.

    Expression-only: transform over a 0..(n-k) index sequence, each index
    sliced+joined. Empty/short docs yield a single whole-text shingle.
    """
    w = words(text_col)
    # chained zip_with shifts: one linear pass per extra word — slice/
    # element_at inside a per-index transform are O(len) PER ACCESS on
    # Catalyst arrays (measured ~20x slower on real web documents,
    # see textstats.ngrams_expr)
    grams = w
    for j in range(1, k):
        shifted = F.slice(w, j + 1, F.greatest(F.size(w) - j, F.lit(0)))
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    grams = F.filter(grams, lambda x: x.isNotNull())
    whole = F.array(F.concat_ws(" ", w))
    return F.array_distinct(
        F.when(F.size(w) >= k, grams).otherwise(whole)
    )


def portable_hash64(col: Column, seed: int) -> Column:
    """Engine-portable 60-bit hash: first 15 hex chars of md5(seed:value).

    DuckDB mirror: ``CAST(('0x' || substr(md5(concat(seed, ':', v)), 1, 15)) AS BIGINT)``
    (or from_hex arithmetic). 15 hex chars = 60 bits, safely inside BIGINT.
    """
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 15), 16, 10).cast(
        "long"
    )


def _splitmix64(i: int) -> int:
    x = (i * 0x9E3779B97F4A7C15) & (2**64 - 1)
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & (2**64 - 1)
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & (2**64 - 1)
    return x ^ (x >> 31)


def minhash_params(n_hashes: int) -> list[tuple[int, int]]:
    """(A_i, C_i) per hash: odd 30-bit multiplier + 60-bit xor constant.
    Deterministic (splitmix64 of the index) and shared with the SQL oracle."""
    return [
        ((_splitmix64(2 * i + 1) & ((1 << 30) - 1)) | 1, _splitmix64(2 * i + 2) & ((1 << 60) - 1))
        for i in range(n_hashes)
    ]


def _mix60(h: Column, a: int, c: int) -> Column:
    """(a*h mod 2^60) xor c — computed on 30-bit halves so every
    intermediate stays < 2^61 (DuckDB BIGINT overflow *errors*, so the
    expression must be overflow-free in both engines, not wrap-around)."""
    lo_mask, full_mask = (1 << 30) - 1, (1 << 60) - 1
    h0 = h.bitwiseAND(F.lit(lo_mask))
    h1 = F.shiftright(h, 30)
    prod = (F.lit(a) * h0 + (F.lit(a) * h1).bitwiseAND(F.lit(lo_mask)) * F.lit(1 << 30))
    return prod.bitwiseAND(F.lit(full_mask)).bitwiseXOR(F.lit(c))


def minhash_signature(text_col: str = "text", n_hashes: int = 16, k: int = 3) -> Column:
    """array<long> of n portable min-hashes over the shingle set.

    ONE md5 per shingle (the expensive part), then n cheap integer mixes —
    a multiplicative family g_i(h) = (A_i*h mod 2^60) xor C_i. Bit-exact
    mirror in DuckDB (see __spark_entry__._MINHASH_ORACLE).
    """
    hs = F.transform(
        shingles(text_col, k),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
    )
    sig = [
        F.array_min(F.transform(hs, lambda h: _mix60(h, a, c)))
        for a, c in minhash_params(n_hashes)
    ]
    return F.array(*sig)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket: int = 1000,
    verify_threshold: float | None = 0.5,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH.

    Returns (id_a, id_b, jaccard) with id_a < id_b. If ``verify_threshold``
    is set, candidates are verified with exact shingle Jaccard and filtered;
    pass None to return raw candidates (with estimated jaccard from
    signature agreement).

    Scale plan (the shape that survives 100 TB):
    1. shingle sets computed ONCE per doc (HOF projection) and persisted —
       both the signature path and the verify path read it,
    2. signatures via explode + plain-expression md5 + 16 ``min`` aggregates
       with map-side partial aggregation — NO higher-order functions in the
       hot path (HOFs disable whole-stage codegen AND get re-inlined per
       consumer by CollapseProject, which made the one-expression
       formulation ~16x slower),
    3. banding shuffles O(n*bands) tiny rows; ``max_bucket`` caps
       degenerate buckets (boilerplate) before the quadratic bucket join,
    4. shingle arrays are re-attached only to the surviving candidate
       pairs for the exact-jaccard verification.
    """
    rows_per_band = n_hashes // bands
    base = df.select(F.col(id_col), shingles(text_col, shingle_k).alias("sh")).persist()

    exploded = base.select(id_col, F.explode("sh").alias("s"))
    h = F.conv(F.substring(F.md5(F.col("s")), 1, 15), 16, 10).cast("long")
    hashed = exploded.select(id_col, h.alias("h"))
    mins = [
        F.min(_mix60(F.col("h"), a, c)).alias(f"m{i}")
        for i, (a, c) in enumerate(minhash_params(n_hashes))
    ]
    sig = hashed.groupBy(id_col).agg(*mins).select(
        id_col, F.array(*[f"m{i}" for i in range(n_hashes)]).alias("sig")
    )

    banded = sig.select(
        id_col,
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.concat_ws(",", F.slice("sig", b * rows_per_band + 1, rows_per_band))
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    banded = banded.persist()

    # cap degenerate buckets before the quadratic join. Broadcast the
    # OVERSIZED buckets (a handful of boilerplate clusters) and anti-join —
    # broadcasting the small-bucket list would ship O(n_docs * bands) rows
    # to every executor, which is exactly what must not happen at 10^9 docs.
    bucket_sizes = banded.groupBy("band", "bucket").count()
    big = bucket_sizes.where(F.col("count") > max_bucket).drop("count")
    banded = banded.join(
        F.broadcast(big), on=["band", "bucket"], how="left_anti"
    )

    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    if verify_threshold is None:
        est = (
            F.size(
                F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq)
            ).cast("double")
            / F.size("sig_a")
        ).alias("jaccard")
        return pairs.select("id_a", "id_b", est)

    sh_a = base.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = base.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    verified = pairs.select("id_a", "id_b").join(sh_a, "id_a").join(sh_b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    exact_j = (inter / union).alias("jaccard")
    return verified.select("id_a", "id_b", exact_j).where(
        F.col("jaccard") >= verify_threshold
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    prefix_filter: bool = True,
) -> DataFrame:
    """Exact all-pairs shingle Jaccard >= threshold (id_a < id_b).

    Default scale path is PPJoin-style prefix filtering (Xiao et al.,
    "Efficient Similarity Joins for Near Duplicate Detection", WWW'08):
    order each doc's shingle set by ascending global document frequency
    (rarest first); a pair with Jaccard >= t MUST share a shingle within
    each side's first ``n - ceil(t*n) + 1`` tokens, so only those prefix
    tokens are exploded into the inverted index. Rare-first ordering keeps
    postings lists short (Zipfian shingle frequencies), candidates are
    verified with an exact ``array_intersect`` — output is IDENTICAL to
    the brute-force inverted index, just with a bounded candidate join.
    A length filter (min(na,nb) >= t*max(na,nb)) prunes before the join.

    ``prefix_filter=False`` keeps the O(sum postings^2) full inverted
    index — verification-only for modest corpora.
    """
    if prefix_filter:
        return _ngram_jaccard_prefix(df, id_col, text_col, k, threshold)
    sh = df.select(F.col(id_col), F.explode(shingles(text_col, k)).alias("s")).persist()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    j = (
        common.join(F.broadcast(na), "id_a")
        .join(F.broadcast(nb), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))).alias("jaccard"),
        )
    )
    return j.where(F.col("jaccard") >= threshold)


def _ngram_jaccard_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    threshold: float,
) -> DataFrame:
    """Exact Jaccard join via global-frequency-ordered prefix filtering.

    Plan shape (all JVM/Catalyst, no Python):
      1. explode distinct shingles            -> one shuffle (groupBy s) for df(s)
      2. join shingle df back, regroup by doc -> sorted token array per doc
      3. explode ONLY the prefix              -> self-join on token (small postings)
      4. distinct candidate pairs + length filter
      5. exact verify: array_intersect of the full sorted shingle arrays

    Guarantee: J(A,B) >= t  =>  |A∩B| >= t*max(|A|,|B|); if the prefixes
    (rarest ``n - ceil(t*n) + 1`` tokens) were disjoint, all common tokens
    would sit in A's suffix of length ceil(t*|A|) - 1 < t*|A| — contradiction.
    So step 3 over-generates, never misses, and step 5 restores exactness.
    """
    sh = df.select(F.col(id_col), F.explode(shingles(text_col, k)).alias("s"))
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df_s"))
    # Global total order = (document frequency asc, shingle asc): shared by
    # every doc, deterministic, and rare-first so prefixes index the
    # shortest postings lists.
    docs = (
        sh.join(dfreq, "s")
        .groupBy(id_col)
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("df_s", "s"))), lambda x: x["s"]
            ).alias("sarr"),
            F.count(F.lit(1)).alias("n"),
        )
        .persist()
    )
    plen = (F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1).cast("int")
    pref = docs.select(F.col(id_col), F.col("n"), F.explode(F.slice("sarr", F.lit(1), plen)).alias("s"))
    a, b = pref.alias("a"), pref.alias("b")
    t = F.lit(float(threshold))
    cand = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            # length filter: J>=t needs min(na,nb) >= t*max(na,nb)
            & (F.col("b.n") >= t * F.col("a.n"))
            & (F.col("a.n") >= t * F.col("b.n")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    da = docs.select(F.col(id_col).alias("id_a"), F.col("sarr").alias("sa"), F.col("n").alias("na"))
    db = docs.select(F.col(id_col).alias("id_b"), F.col("sarr").alias("sb"), F.col("n").alias("nb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    return (
        cand.join(da, "id_a")
        .join(db, "id_b")
        .select(
            "id_a",
            "id_b",
            (inter / (F.col("na") + F.col("nb") - inter)).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def simhash64(text_col: str = "text") -> Column:
    """64-bit SimHash over whitespace tokens, expression-only.

    Per token: portable 60-bit md5 hash; per bit position: +1 if set else
    -1, summed across tokens; sign -> bit. Tokens are deduplicated (set
    semantics) for stability against repetition.
    """
    toks = F.array_distinct(words(text_col))
    hashes = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
    )

    # per-bit counts: acc[b] += bit b of hash set ? +1 : -1. Bit positions
    # are unrolled as python literals (shiftright requires a literal count).
    def bits(h: Column) -> Column:
        return F.array(
            *[
                (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1).cast("int")
                for b in range(60)
            ]
        )

    zero = F.array_repeat(F.lit(0), 60)
    counts = F.aggregate(hashes, zero, lambda acc, h: F.zip_with(acc, bits(h), lambda x, y: x + y))
    # reassemble: sum of (count[b] > 0) << b, b unrolled
    result = F.lit(0).cast("long")
    for b in range(60):
        result = result + F.when(
            F.element_at(counts, b + 1) > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return result


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    df: DataFrame, id_col: str, text_col: str = "text", max_hamming: int = 8
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked on 16-bit chunks.

    Pigeonhole: two 60-bit hashes within hamming<=max_hamming share at least
    one of 4 15-bit chunks exactly when max_hamming <= 3; for larger radii
    this is a recall-best-effort blocking (standard SimHash practice).
    """
    sh = df.select(F.col(id_col), simhash64(text_col).alias("sh"))
    chunks = sh.select(
        id_col,
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("sh"), c * 15)
                        .bitwiseAND(F.lit((1 << 15) - 1))
                        .alias("key"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ck"),
    ).select(id_col, "sh", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key"))
    # simhash64 is an expensive expression tree; materialize once for the
    # self-join's two branches instead of recomputing per side.
    chunks = chunks.persist()
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming64(F.col("a.sh"), F.col("b.sh")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
    )


def duplicate_clusters(
    pairs: DataFrame,
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components over near-dup pairs -> (id, cluster_id).

    ``pairs``: (id_a, id_b) edges from any near-dup op (MinHash/SimHash/
    embedding). ``cluster_id`` is the component's MINIMUM id — the
    canonical-document convention (stable, order-free).

    Algorithm: hash-min label propagation. Each round every node takes
    the min label among itself and its neighbors; a round is one
    map-side-combined groupBy over the (undirected) edge list joined to
    current labels. Near-dup graphs are a forest of tiny cliques — the
    effective diameter is a few hops, so convergence is typically 2-4
    rounds (the O(log n) worst case only arises on long path graphs,
    which dedup clusters are not). Labels are eagerly localCheckpoint-ed
    every round: they feed TWO consumers per round, so the un-truncated
    logical plan doubles per round. The per-round convergence check is an
    exact changed-row probe (isEmpty — no collect of labels).

    Reference scope note: the reference stops at pair emission; cluster
    resolution + canonical selection is the part a real curation pipeline
    adds on top (keep-one-per-cluster), so it lives here as a first-class
    op with the same oracle discipline as the pair generators.
    """
    edges = (
        pairs.selectExpr("id_a AS src", "id_b AS dst")
        .unionByName(pairs.selectExpr("id_b AS src", "id_a AS dst"))
        .distinct()
        .persist()
    )
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "label", F.col("id")
    ).persist()

    for i in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["src"], "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias("label"),
            )
        )
        # localCheckpoint EVERY round: labels feed two consumers per round
        # (neighbor_min + the join), so an un-truncated logical plan
        # doubles per round — the digest showed 1300+ exchange NODES in
        # the analyzed plan after ~10 rounds even with persist (persist
        # caches execution, not the plan). Eager checkpoint both
        # materializes (the convergence probe needs it anyway) and cuts
        # the lineage to one round.
        new_labels = new_labels.localCheckpoint()
        # convergence: exact, id-type-agnostic — any node whose label
        # changed this round? (isEmpty stops at the first changed row)
        changed = not (
            new_labels.withColumnRenamed("label", "__new")
            .join(labels, "id")
            .where(F.col("__new") != F.col("label"))
            .isEmpty()
        )
        old = labels
        labels = new_labels
        # round 1's `old` is the plain persisted seed (unpersist works);
        # later rounds' are localCheckpoints, where DataFrame.unpersist
        # is a silent no-op — release the RDD-level storage explicitly
        # (chronon_spark.checkpoint) instead of waiting on the GC-driven
        # ContextCleaner.
        if not release_checkpoint(old):
            old.unpersist()
        if not changed:
            break
    else:
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iterations} rounds"
        )
    edges.unpersist()
    return labels.select("id", F.col("label").alias("cluster_id"))


def keep_canonical(
    corpus: DataFrame,
    clusters: DataFrame,
    id_col: str,
) -> DataFrame:
    """Keep-one-per-cluster: drop every document whose cluster_id is not
    itself (the minimum id of its component is the canonical survivor).
    One broadcast-or-shuffle anti-join against the (small) non-canonical
    id list — documents in no cluster pass through untouched."""
    losers = clusters.where(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    return corpus.join(losers, on=id_col, how="left_anti")


def incremental_dedup(
    new_docs: DataFrame,
    snapshot: DataFrame,
    id_col: str,
    text_col: str = "text",
    snapshot_text_col: str = "text",
    snapshot_id_col: str | None = None,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    jaccard_threshold: float | None = 0.85,
) -> DataFrame:
    """Dedup a NEW batch against an existing corpus SNAPSHOT — the
    incremental-crawl shape (every real pipeline re-crawls daily; an
    all-pairs re-dedup of the whole corpus per day is the thing to avoid).

    Drops new docs that are (a) exact normalized-text matches of any
    snapshot doc, or (b) banded-MinHash near-dups of a snapshot doc
    (verified with exact shingle Jaccard when ``jaccard_threshold`` is
    set; pass None to drop on raw band collision).

    Scale shape: the snapshot side reduces to its exact-hash set and its
    (band, bucket) signature keys — NO text, NO shingle arrays cross the
    shuffle for the snapshot; both probes are left_anti joins so the new
    batch streams once. Signatures on both sides use the same portable
    md5 mix family as ``minhash_lsh_pairs``. The batch-vs-snapshot join
    shuffles O(|new| * bands) rows — independent of snapshot text size.
    """
    rows_per_band = n_hashes // bands
    new_docs = ensure_parallelism(new_docs)
    snapshot = ensure_parallelism(snapshot)

    def _exact_hash(df, tc):
        return F.md5(norm_text(tc)).alias("__h")

    def _banded(df, idc, tc):
        base = df.select(F.col(idc).alias("id"), F.explode(shingles(tc, shingle_k)).alias("s"))
        h = F.conv(F.substring(F.md5(F.col("s")), 1, 15), 16, 10).cast("long")
        mins = [
            F.min(_mix60(h, a, c)).alias(f"m{i}")
            for i, (a, c) in enumerate(minhash_params(n_hashes))
        ]
        sig = base.groupBy("id").agg(*mins).select(
            "id", F.array(*[f"m{i}" for i in range(n_hashes)]).alias("sig")
        )
        return sig.select(
            "id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda b: F.struct(
                        b.alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",", F.slice("sig", b * rows_per_band + 1, rows_per_band)
                            )
                        ).alias("bucket"),
                    ),
                )
            ).alias("bb"),
        ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    # the snapshot needs SOME id to link band collisions to shingle sets
    # for the verify join (output never references it — results stay
    # deterministic either way); synthesize one only when absent
    if snapshot_id_col is None:
        snapshot = snapshot.withColumn("__sid", F.monotonically_increasing_id())
        snapshot_id_col = "__sid"

    # (a) exact: anti-join on the snapshot's normalized-text hash set
    snap_hashes = snapshot.select(_exact_hash(snapshot, snapshot_text_col)).distinct()
    new_hashed = new_docs.withColumn("__h", _exact_hash(new_docs, text_col))
    survivors = new_hashed.join(snap_hashes, on="__h", how="left_anti").drop("__h")

    # (b) near-dup: anti-join on banded signature collisions
    new_banded = _banded(survivors, id_col, text_col)
    snap_banded = _banded(
        snapshot.select(
            F.col(snapshot_id_col).alias("__sid2"),
            F.col(snapshot_text_col).alias("__st"),
        ),
        "__sid2",
        "__st",
    ).withColumnRenamed("id", "sid")
    coll = new_banded.join(snap_banded, on=["band", "bucket"]).select("id", "sid").distinct()
    if jaccard_threshold is not None:
        new_sh = survivors.select(
            F.col(id_col).alias("id"), shingles(text_col, shingle_k).alias("sh_n")
        )
        snap_sh = snapshot.select(
            F.col(snapshot_id_col).alias("sid"),
            shingles(snapshot_text_col, shingle_k).alias("sh_s"),
        )
        inter = F.size(F.array_intersect("sh_n", "sh_s")).cast("double")
        union = F.size(F.array_union("sh_n", "sh_s")).cast("double")
        coll = (
            coll.join(new_sh, "id")
            .join(snap_sh, "sid")
            .where(inter / union >= jaccard_threshold)
            .select("id")
        )
    dup_ids = coll.select("id").distinct().withColumnRenamed("id", id_col)
    return survivors.join(dup_ids, on=id_col, how="left_anti")


def duplicated_span_flags(
    corpus: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """CORPUS-INTERNAL exact-substring duplication at document granularity
    (the published ExactSubstr signal — Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better" — which their suffix-array
    pass detects at span granularity; here each doc reports how much of it
    is an exact k-token span shared with OTHER documents).

    -> (id, n_spans, n_dup_spans, dup_span_frac, flagged) per document.

    Unlike near-dup LSH (whole-doc similarity) this catches the
    boilerplate/licence/navigation spans that repeat across otherwise
    unrelated pages — the dominant duplication mode in web corpora.

    Scale shape: distinct k-gram 60-bit hashes per doc (one projection),
    one map-side-combined groupBy for document frequency, one shuffle
    join back, one map-side-combined per-doc count. Text is normalized
    first so cosmetic whitespace/case differences don't hide duplication.
    Gram-hash collisions only ADD flags at ~2^-60 — conservative in the
    safe direction for dedup.
    """
    corpus = ensure_parallelism(corpus)
    gh = F.conv(F.substring(F.md5(F.col("g")), 1, 15), 16, 10).cast("long")
    grams = (
        corpus.select(
            F.col(id_col).alias("id"), norm_text(text_col).alias("__nt")
        )
        .select("id", F.explode(shingles("__nt", k)).alias("g"))
        .select("id", gh.alias("gh"))
        .persist()
    )
    # shingles() emits distinct grams per doc, so count(1) = doc frequency
    dup = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("df_g"))
        .where(F.col("df_g") >= min_docs)
        .select("gh")
    )
    per_doc = grams.groupBy("id").agg(F.count(F.lit(1)).alias("n_spans"))
    dup_per_doc = (
        grams.join(dup, on="gh")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_dup_spans"))
    )
    out = (
        per_doc.join(dup_per_doc, on="id", how="left")
        .select(
            "id",
            "n_spans",
            F.coalesce(F.col("n_dup_spans"), F.lit(0)).cast("long").alias("n_dup_spans"),
        )
        .withColumn(
            "dup_span_frac",
            F.col("n_dup_spans").cast("double") / F.col("n_spans").cast("double"),
        )
        .withColumn("flagged", F.col("n_dup_spans") > 0)
    )
    return out


def positioned_grams(words_col: str, k: int) -> Column:
    """Word k-grams WITH positions: entry i of the returned array is the
    gram starting at token i (null past n-k, so posexplode positions stay
    aligned). Same chained zip_with-shift construction as shingles()."""
    w = F.col(words_col)
    grams = w
    for j in range(1, k):
        shifted = F.slice(w, j + 1, F.greatest(F.size(w) - j, F.lit(0)))
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return grams


def remove_duplicated_spans(
    corpus: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """ExactSubstr span REMOVAL (Lee et al. 2022): cut every token run
    covered by a word k-gram that appears in >= ``min_docs`` distinct
    documents, keeping the rest of the document intact. This is the
    published pipeline step ``duplicated_span_flags`` only signals —
    boilerplate/licence/navigation spans vanish while the unique prose
    around them survives.

    -> (id, clean_text, n_tokens, n_removed, removed_frac, flagged) per
    document, over NORMALIZED text (lowercased, whitespace-collapsed —
    grams are computed on it, so the cut offsets refer to it).

    Scale shape (100 TB corpus): positioned-gram projection (linear,
    zip_with shifts), one distinct + map-side-combined groupBy for gram
    doc-frequency, covered-position explode bounded by k x dup-gram
    count, and token-level rebuild ONLY for flagged documents (the
    minority) via anti-join + per-doc sort — no windows over the corpus,
    no driver state. Gram-hash collisions at ~2^-60 can only remove an
    extra span — conservative in the safe direction for dedup.
    """
    corpus = ensure_parallelism(corpus)
    # persisted: toks feeds the gram projection, the flagged-doc token
    # explode, AND the final left-join — without the cache that is three
    # full corpus scans + normalizations in one job
    toks = corpus.select(
        F.col(id_col).alias("id"), norm_text(text_col).alias("__nt")
    ).withColumn("__w", words("__nt")).withColumn("__n", F.size("__w")).persist()
    gh = F.conv(F.substring(F.md5(F.col("g")), 1, 15), 16, 10).cast("long")
    grams = (
        toks.where(F.col("__n") >= k)
        .select("id", F.posexplode(positioned_grams("__w", k)).alias("pos", "g"))
        .where(F.col("g").isNotNull())
        .select("id", "pos", gh.alias("gh"))
        .persist()
    )
    dup = (
        grams.select("id", "gh")
        .distinct()
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("df_g"))
        .where(F.col("df_g") >= min_docs)
        .select("gh")
    )
    cov = (
        grams.join(dup, on="gh")
        .select(
            "id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))).alias(
                "tpos"
            ),
        )
        .distinct()
    )
    flagged = cov.select("id").distinct().withColumn("__fl", F.lit(True))
    ftoks = (
        toks.join(flagged.select("id"), on="id")
        .select("id", F.posexplode("__w").alias("tpos", "tok"))
    )
    rebuilt = (
        ftoks.join(cov, on=["id", "tpos"], how="left_anti")
        .groupBy("id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("tpos", "tok"))),
                    lambda s: s["tok"],
                ),
            ).alias("__ct"),
            F.count(F.lit(1)).alias("__nk"),
        )
    )
    return (
        toks.join(flagged, on="id", how="left")
        .join(rebuilt, on="id", how="left")
        .select(
            "id",
            F.when(F.col("__fl").isNull(), F.col("__nt"))
            .otherwise(F.coalesce("__ct", F.lit("")))
            .alias("clean_text"),
            F.col("__n").cast("long").alias("n_tokens"),
            F.when(F.col("__fl").isNull(), F.lit(0))
            .otherwise(F.col("__n") - F.coalesce("__nk", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
        .withColumn(
            "removed_frac",
            F.col("n_removed").cast("double") / F.col("n_tokens").cast("double"),
        )
        .withColumn("flagged", F.col("n_removed") > 0)
    )


def benchmark_contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str = "text",
    eval_text_col: str = "text",
    k: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination check (the published n-gram-overlap
    method: GPT-3 appendix C / PaLM-style 8-13-gram collision): flag every
    training document sharing >= ``min_hits`` distinct word k-grams with
    ANY eval/benchmark document.

    -> (id, n_hits, contaminated) for every corpus document.

    Scale shape: the eval side is the SMALL side by construction
    (benchmarks are thousands of docs) — its distinct gram hashes
    broadcast; the corpus side explodes k-grams but the broadcast
    semi-join prunes before any shuffle, and the per-doc hit count is
    map-side combined. Grams compare as 60-bit md5 hashes (compact
    broadcast; collisions only ADD false hits at ~2^-60 — conservative
    in the safe direction for decontamination).
    """
    gh = lambda c: F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")  # noqa: E731
    eval_grams = (
        eval_df.select(F.explode(shingles(eval_text_col, k)).alias("g"))
        .select(gh(F.col("g")).alias("gh"))
        .distinct()
    )
    grams = corpus.select(
        F.col(id_col).alias("id"), F.explode(shingles(text_col, k)).alias("g")
    ).select("id", gh(F.col("g")).alias("gh"))
    hits = (
        grams.join(F.broadcast(eval_grams), on="gh")
        .groupBy("id")
        .agg(F.count_distinct("gh").alias("n_hits"))
    )
    return (
        corpus.select(F.col(id_col).alias("id"))
        .distinct()
        .join(hits, on="id", how="left")
        .select(
            "id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str = "text",
    eval_text_col: str = "text",
    k: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Drop contaminated documents (one anti-join on the flag table)."""
    flagged = benchmark_contamination(
        corpus, eval_df, id_col, text_col, eval_text_col, k, min_hits
    )
    bad = flagged.where("contaminated").select(F.col("id").alias(id_col))
    return corpus.join(bad, on=id_col, how="left_anti")

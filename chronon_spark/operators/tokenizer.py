"""Distributed BPE tokenizer: training and encoding, pure Catalyst.

Classic byte-pair encoding (Sennrich et al. 2016) trains on the
word-frequency dictionary, not the raw corpus: the unique-word table is
orders of magnitude smaller than a 100 TB corpus (Zipf), so each merge
iteration is one map-side-combined aggregation over a persisted small
table plus a single-row driver collect of the winning pair.

The load-bearing trick: a word's symbol sequence is stored as ONE
string where EVERY symbol carries its own leading and trailing space
(``" h  e  l  l  o "`` — two spaces between symbols), and applying a
merge ``(a, b) -> ab`` is a literal ``replace(w, ' a  b ', ' ab ')``.
Because a match consumes only the pair's own padding — never a
neighbor's — SQL's non-overlapping left-to-right replace IS the BPE
greedy merge rule, including at shared boundaries: ``"banana"`` +
``(a,n)`` -> ``[b,an,an,a]`` and ``"aaaaa"`` + ``(a,a)`` ->
``[aa,aa,a]``, exactly like reference BPE. (A single-space encoding
``" a b "`` gets this wrong: the match eats the shared boundary space,
skipping adjacent occurrences. Lookaround regexes would also fix it but
DuckDB's RE2 has none — the double-space algebra is portable.) The
whole trainer stays JVM-side — zero Python in the per-row path — and a
DuckDB oracle runs the identical algebra.

Pair counting follows the reference BPE exactly: overlapping positions
each count (``"aaa"`` contributes 2 to pair ``(a,a)``), weighted by word
frequency; ties broken by count DESC then pair string ASC (deterministic
and engine-portable).

Training is restricted to printable-ASCII words (``^[\\x21-\\x7e]+$``):
symbols must never contain the space delimiter, and single-code-point
regex splitting behaves identically in Java regex and RE2 for ASCII.
Encoding handles arbitrary text — non-ASCII symbols simply never match an
(ASCII) merge and pass through as single-character tokens.

The reference engine has no tokenizer (its token counting is query-side,
see textstats.bpe_ish_token_count); this is a training-data-pipeline
extension — the exact big brother of that heuristic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chronon_spark.checkpoint import release_checkpoint

TRAINABLE_WORD = r"^[\x21-\x7e]+$"  # printable ASCII, no space
# inert word-boundary marker for doc-level encoding: never appears in an
# (ASCII-trained) merge, so merges cannot span word boundaries. Known,
# accepted collision: a literal U+00A7 *inside* a word is indistinguishable
# from the marker and is dropped from the token stream.
_BOUNDARY = "§"


def _norm_text(col: str) -> Column:
    """Same normalization as dedup/textstats: lowercase, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")


def _spaced(word: Column) -> Column:
    """'hello' -> ' h  e  l  l  o ' (each symbol owns a leading AND a
    trailing space, so adjacent merge matches never share characters)."""
    return F.regexp_replace(word, "(.)", " $1 ")


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the corpus, restricted to trainable ASCII words.

    This is the ONLY pass over the full corpus; everything after operates
    on the unique-word table."""
    w = F.explode(F.split(_norm_text(text_col), " ")).alias("word")
    return (
        df.select(w)
        .where((F.col("word") != "") & F.col("word").rlike(TRAINABLE_WORD))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _pair_counts(wf: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency.

    ``wf`` has columns (w: delimited symbol string, cnt). One narrow
    projection + one map-side-combined aggregation; no Python."""
    syms = F.split(F.trim("w"), "  ")
    left = F.slice(syms, F.lit(1), F.size(syms) - 1)
    right = F.slice(syms, F.lit(2), F.size(syms) - 1)
    pair = F.explode(F.zip_with(left, right, lambda a, b: F.concat_ws(" ", a, b)))
    return (
        wf.select(pair.alias("p"), "cnt")
        .groupBy("p")
        .agg(F.sum("cnt").alias("c"))
    )


def _apply_merge(col: Column, a: str, b: str) -> Column:
    # ' a  b ' -> ' ab ': consumes only the pair's own padding, so the
    # very next symbol's leading space survives for the next match.
    return F.replace(col, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 64,
    min_count: int = 2,
    batch_size: int = 1,
    checkpoint_every: int = 12,
    incremental: bool = False,
) -> list:
    """Learn BPE merges; returns [(left_sym, right_sym, pair_count), ...].

    ``batch_size=1`` reproduces sequential reference BPE bit-for-bit.
    ``batch_size=k`` accepts up to k non-interfering pairs per round
    (greedy by count; a pair is rejected if either symbol appears in an
    already-accepted pair this round — merging it could change the other
    pair's count). At a 32k-entry production vocab, batching turns 32k
    aggregation rounds into ~32k/k; counts recorded are exact at
    selection time either way.

    ``incremental=True`` switches pair counting from a full per-round
    recount to delta maintenance (``_bpe_train_incremental``): bit-equal
    output (pytest-pinned), asymptotically cheaper rounds — use it for
    production vocab sizes.

    The unique-word table is persisted and localCheckpoint'd every
    ``checkpoint_every`` rounds so the plan never accretes an unbounded
    replace chain.
    """
    if incremental:
        return _bpe_train_incremental(
            df, text_col=text_col, num_merges=num_merges,
            min_count=min_count, batch_size=batch_size,
        )
    # keep a handle to the PERSISTED base frame: wf is rebound every round,
    # so unpersisting the loop variable would target a never-persisted
    # derived frame (a no-op) and leak the cache for the session.
    wf0 = (
        word_frequencies(df, text_col)
        .select(_spaced(F.col("word")).alias("w"), "cnt")
        .persist()
    )
    wf = wf0
    ckpt = None  # current localCheckpoint handle (wf aliases it when set)
    merges: list = []
    try:
        rounds = 0
        while len(merges) < num_merges:
            take = min(batch_size, num_merges - len(merges))
            # over-fetch so the non-interference filter still fills a batch
            top = (
                _pair_counts(wf)
                .where(F.col("c") >= min_count)
                .orderBy(F.desc("c"), F.asc("p"))
                .limit(max(take * 4, take))
                .collect()
            )
            if not top:
                break
            used: set = set()
            accepted = []
            for row in top:
                a, b = row["p"].split(" ")
                if batch_size > 1 and (a in used or b in used or a + b in used):
                    continue
                accepted.append((a, b, int(row["c"])))
                used.update((a, b, a + b))
                if len(accepted) >= take:
                    break
            if not accepted:
                break
            merges.extend(accepted)
            col = F.col("w")
            for a, b, _ in accepted:
                col = _apply_merge(col, a, b)
            wf = wf.select(col.alias("w"), "cnt")
            rounds += 1
            if rounds % checkpoint_every == 0:
                prev_ckpt = ckpt
                ckpt = wf.localCheckpoint(eager=True)
                wf = ckpt
                # superseded checkpoint: DataFrame.unpersist is a no-op
                # on checkpoints — release the RDD storage explicitly
                release_checkpoint(prev_ckpt)
    finally:
        try:
            wf0.unpersist()
        except Exception:
            pass
        release_checkpoint(ckpt)  # last checkpoint: merges already extracted
    return merges


def _bpe_train_incremental(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 64,
    min_count: int = 2,
    batch_size: int = 1,
) -> list:
    """Delta-maintained pair counts: bit-equal to the full recount.

    The full path re-explodes EVERY word's pair multiset each round; but a
    merge ``(a, b)`` only changes the pair multiset of words that contain
    the occurrence string ``' a  b '`` (replace on a non-matching word is
    the identity), so the round's count change is exactly

        delta = pairs(changed words, after) - pairs(changed words, before)

    maintained against a persisted (p, c) table. Existing pair names only
    ever DECREASE (new adjacencies always involve the fresh ``ab`` symbol),
    and a name that hits zero can only come back via a positive delta row,
    so pruning ``c <= 0`` loses nothing.

    Per round: a TakeOrdered collect off the in-memory pair table, one
    cheap contains-filter scan of the in-memory word table, pair explodes
    over the CHANGED words only, and two small eager localCheckpoints
    (word + pair table, superseded storage released every round — lineage
    never accretes, executor loss can't replay a round chain). Late
    rounds touch a vanishing fraction of words, which is where a 32k-merge
    production vocab lives; the full path re-pays the whole explode
    forever. More driver round trips per round (3 vs 1), each far
    smaller — see bench.py's bpe sweep for the measured crossover.
    """
    wf0 = (
        word_frequencies(df, text_col)
        .select(_spaced(F.col("word")).alias("w"), "cnt")
        .localCheckpoint(eager=True)
    )
    pc0 = _pair_counts(wf0).localCheckpoint(eager=True)
    wf, pc = wf0, pc0
    merges: list = []
    try:
        while len(merges) < num_merges:
            take = min(batch_size, num_merges - len(merges))
            top = (
                pc.where(F.col("c") >= min_count)
                .orderBy(F.desc("c"), F.asc("p"))
                .limit(max(take * 4, take))
                .collect()
            )
            used: set = set()
            accepted = []
            for row in top:
                a, b = row["p"].split(" ")
                if batch_size > 1 and (a in used or b in used or a + b in used):
                    continue
                accepted.append((a, b, int(row["c"])))
                used.update((a, b, a + b))
                if len(accepted) >= take:
                    break
            if not accepted:
                break
            merges.extend(accepted)

            hit = None
            col = F.col("w")
            for a, b, _ in accepted:
                occ = F.col("w").contains(F.lit(f" {a}  {b} "))
                hit = occ if hit is None else (hit | occ)
                col = _apply_merge(col, a, b)
            changed = wf.where(hit)
            rewritten = changed.select(col.alias("w"), "cnt")
            delta = (
                _pair_counts(rewritten)
                .unionByName(
                    _pair_counts(changed).select("p", (-F.col("c")).alias("c"))
                )
                .groupBy("p")
                .agg(F.sum("c").alias("c"))
            )
            new_pc = (
                pc.unionByName(delta)
                .groupBy("p")
                .agg(F.sum("c").alias("c"))
                .where(F.col("c") > 0)
                .localCheckpoint(eager=True)
            )
            new_wf = wf.select(col.alias("w"), "cnt").localCheckpoint(eager=True)
            for old in (pc, wf):
                release_checkpoint(old)
            wf, pc = new_wf, new_pc
    finally:
        for h in (wf, pc):
            release_checkpoint(h)
    return merges


def _doc_symbol_string(text_col: str) -> Column:
    """Doc-level delimited symbol string: words char-spaced (each symbol
    owning its padding), joined with an inert boundary marker that owns
    its padding too — no merge pattern ' a  b ' can ever span two words."""
    words = F.split(_norm_text(text_col), " ")
    return F.array_join(
        F.transform(words, lambda w: F.regexp_replace(w, "(.)", " $1 ")),
        f" {_BOUNDARY} ",
    )


def bpe_tokens(text_col: str, merges: list) -> Column:
    """Array-of-tokens column: applies ``merges`` in rank order (one
    Catalyst projection; ~len(merges) nested string replaces — cheap
    single-pass string ops, no Python)."""
    col = _doc_symbol_string(text_col)
    for m in merges:
        a, b = m[0], m[1]
        col = _apply_merge(col, a, b)
    toks = F.split(F.trim(col), " ")
    return F.filter(toks, lambda t: (t != "") & (t != _BOUNDARY))


def bpe_encode(
    df: DataFrame,
    merges: list,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """df + token-array column encoded with the learned merges."""
    return df.withColumn(out_col, bpe_tokens(text_col, merges))


def bpe_token_stats(
    df: DataFrame,
    merges: list,
    id_col: str,
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, tokens_fp): count + md5 fingerprint of the encoded
    stream — the compact driver/oracle-comparable surface."""
    toks = bpe_tokens(text_col, merges)
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.md5(F.array_join(toks, "")).alias("tokens_fp"),
    )

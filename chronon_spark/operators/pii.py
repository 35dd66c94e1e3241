"""PII detection and redaction for web-corpus curation.

Training-data pipelines scrub personally identifiable information before
a corpus ships (the C4 / RefinedWeb-style regex pass): emails, phone
numbers, IP addresses, US SSNs, and credit-card-shaped digit runs are
replaced with typed placeholder tokens and counted per document.

Everything is a Catalyst Column expression (regexp_count /
regexp_replace — JVM, whole-stage codegen, zero Python per row), so the
scan composes with filters and pushes down cleanly. Patterns are
deliberately RE2-compatible (no lookaround, no backreferences) so the
DuckDB oracle evaluates the IDENTICAL pattern text: both engines scan
left-to-right with leftmost greedy semantics, making counts and
replacements bit-identical.

Detection is a CASCADE: each kind is counted on the text AFTER the
previous kinds were redacted (email -> card -> ssn -> ipv4 -> phone), so
a digit run never double-counts as both card and phone, and the count
columns sum to the number of placeholders in the redacted text.

Scale shape: one projection over the corpus — no shuffle, no join; the
regex pass is O(doc length) per pattern and row-parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (kind, RE2-safe pattern, replacement token) — ORDER IS SEMANTICS: each
# pattern sees the text with all earlier kinds already redacted. No
# backreferences (RE2): mixed card separators ('1234-5678 9012-3456')
# also redact — the conservative direction for PII.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # 16-digit card in 4-4-4-4 groups (or unbroken), before phone so the
    # trailing 3-3-4 digits of a card are never counted as a phone
    ("card", r"\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b|\b[0-9]{16}\b", "<CARD>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    # NANP-ish: optional +country, then 3-3-4 digit groups with -, ., or
    # space separators (or none); both '555-123-4567' and '(555) 123-4567'
    ("phone", r"\+?[0-9]{0,2}[-. ]?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}\b", "<PHONE>"),
]


def pii_scan(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Per-document PII audit: (id, n_<kind>..., n_pii, has_pii, redacted).

    Counts follow the redaction cascade (see module docstring), so
    ``n_pii`` equals the number of placeholder tokens in ``redacted``.
    """
    cur: Column = F.col(text_col)
    cols: list[Column] = [F.col(id_col)]
    counts: list[Column] = []
    for kind, pat, repl in PII_PATTERNS:
        cnt = F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{kind}")
        counts.append(cnt)
        cur = F.regexp_replace(cur, pat, repl)
    out = df.select(
        *cols,
        *counts,
        cur.alias("redacted"),
    )
    n_pii = sum((F.col(f"n_{k}") for k, _, _ in PII_PATTERNS[1:]), F.col(f"n_{PII_PATTERNS[0][0]}"))
    return out.select(
        id_col,
        *[f"n_{k}" for k, _, _ in PII_PATTERNS],
        n_pii.alias("n_pii"),
        (n_pii > 0).alias("has_pii"),
        "redacted",
    )


def _cascade(text_col: str, upto: int) -> Column:
    """Text with the first ``upto`` patterns redacted."""
    cur: Column = F.col(text_col)
    for kind, pat, repl in PII_PATTERNS[:upto]:
        cur = F.regexp_replace(cur, pat, repl)
    return cur


def redact_pii(text_col: str = "text") -> Column:
    """The redacted text alone (full cascade)."""
    return _cascade(text_col, len(PII_PATTERNS))


def _esc(p: str) -> str:
    return p.replace("'", "''")


def pii_redact_oracle_expr(text_expr: str) -> str:
    """DuckDB expression: ``text_expr`` with the full redaction cascade
    applied (the SQL twin of redact_pii, generated from PII_PATTERNS)."""
    cur = text_expr
    for _kind, pat, repl in PII_PATTERNS:
        cur = f"regexp_replace({cur}, '{_esc(pat)}', '{repl}', 'g')"
    return cur


def pii_oracle_sql(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB mirror generated from the SAME pattern list: nested
    regexp_replace cascade + len(regexp_extract_all) counts per stage."""
    esc = _esc

    stage_sql = [text_col]
    for kind, pat, repl in PII_PATTERNS:
        stage_sql.append(
            f"regexp_replace({stage_sql[-1]}, '{esc(pat)}', '{repl}', 'g')"
        )
    count_cols = ", ".join(
        f"CAST(len(regexp_extract_all({stage_sql[i]}, '{esc(pat)}')) AS BIGINT) AS n_{kind}"
        for i, (kind, pat, repl) in enumerate(PII_PATTERNS)
    )
    total = " + ".join(f"n_{kind}" for kind, _, _ in PII_PATTERNS)
    return f"""
WITH c AS (
  SELECT {id_col}, {count_cols}, {stage_sql[-1]} AS redacted
  FROM {table}
)
SELECT {id_col}, {", ".join("n_" + k for k, _, _ in PII_PATTERNS)},
   {total} AS n_pii, ({total}) > 0 AS has_pii, redacted
FROM c
"""

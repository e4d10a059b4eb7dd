"""PII / pattern scrubbing for training corpora: emails, URLs, IPs,
phone-like digit runs, long ID numbers — masked with typed placeholder
tokens (the standard public pre-training scrub; patterns intentionally
conservative).

The reference engine has no scrubbing pass; this belongs to the
training-data-pipeline toolbox the brief adds as first-class.

Patterns are restricted to syntax Java regex (Spark) and RE2 (DuckDB)
interpret identically — no lookarounds, no backrefs — so a DuckDB oracle
can replay the scrub bit-for-bit. Application order matters and is fixed:
URL before EMAIL (URLs may embed '@'), IP before the digit families
(dotted quads must not be half-eaten as digit runs), NUM before PHONE
(separator-free long runs are IDs, spaced/dashed sequences are phones).

Scale: pure per-row ``regexp_replace`` / ``regexp_count`` expressions —
JVM-side, shuffle-free, stateless (safe in Structured Streaming maps).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = ["SCRUB_PATTERNS", "scrub_text", "scrub_report", "duckdb_scrub_sql"]

# (name, pattern, replacement) — applied IN ORDER.
SCRUB_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    # idnum BEFORE phone: a separator-free digit run >= 9 is an ID; only
    # spaced/dashed sequences remain for the phone family
    ("idnum", r"\b[0-9]{9,}\b", "<NUM>"),
    ("phone", r"\+?[0-9][0-9\- ]{7,}[0-9]", "<PHONE>"),
]


def _col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def scrub_text(col: Column | str) -> Column:
    """Masked text: every pattern family replaced by its placeholder."""
    out = _col(col)
    for _, pat, repl in SCRUB_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def scrub_report(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-row scrub: (id, scrubbed text, one count column per pattern,
    total n_scrubbed). Counts are measured on the SAME intermediate state
    the replacement saw (sequential), so families never double-count one
    span."""
    cur = _col(text_col)
    count_cols = []
    for name, pat, repl in SCRUB_PATTERNS:
        cnt = F.regexp_count(cur, F.lit(pat))
        count_cols.append(cnt.alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    out = df.select(
        F.col(id_col),
        *count_cols,
        cur.alias("scrubbed_text"),
    )
    total_expr = None
    for name, _, _ in SCRUB_PATTERNS:
        c = F.col(f"n_{name}")
        total_expr = c if total_expr is None else total_expr + c
    return out.withColumn("n_scrubbed", total_expr.cast("long"))


def duckdb_scrub_sql(col: str) -> str:
    """DuckDB twin of :func:`scrub_text` (same order, same patterns)."""
    out = col
    for _, pat, repl in SCRUB_PATTERNS:
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{repl}', 'g')"
    return out

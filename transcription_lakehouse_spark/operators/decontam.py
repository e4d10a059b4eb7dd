"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set (the GPT-3 appendix-C /
Llama-style 13-gram overlap check — public method; n parametrized).

The reference has no decontamination pass; this is one of the
training-data-pipeline operators the brief adds as first-class.

Scale design: the benchmark side is DISTINCT n-grams of the (small)
eval set — broadcast to every executor, so the corpus side streams
through one narrow explode + broadcast hash join + one groupBy(doc_id)
with map-side combine. The corpus is never shuffled on the gram string,
and no all-pairs doc×doc comparison ever exists. At 100 TB corpus /
MB-scale benchmarks this is a single scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.text import tokens
from .dedup import shingles_from_tokens

__all__ = ["benchmark_ngrams", "ngram_contamination", "boilerplate_fraction"]


def benchmark_ngrams(
    benchmark: DataFrame, text_col: str, n: int
) -> DataFrame:
    """Distinct word n-grams of the benchmark set — one column ``gram``.
    Intended to be small enough to broadcast (eval sets are MBs)."""
    toked = benchmark.select(tokens(text_col).alias("_toks"))
    return (
        toked.select(F.explode(shingles_from_tokens(F.col("_toks"), n)).alias("gram"))
        .distinct()
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
    flag_threshold: float = 0.0,
) -> DataFrame:
    """Per-corpus-document contamination against a benchmark set.

    Returns (id, n_grams, n_hit, contamination_ratio, is_contaminated):
    ``n_grams`` = distinct n-grams in the doc, ``n_hit`` = how many also
    occur anywhere in the benchmark, ``is_contaminated`` = ratio strictly
    greater than ``flag_threshold`` (default: any hit flags).

    Documents with fewer than n tokens have no n-grams: ratio 0, never
    flagged (mirrors the reference-free convention of the public recipes).
    """
    bench = F.broadcast(
        benchmark_ngrams(benchmark, text_col, n).withColumn("_hit", F.lit(1))
    )
    toked = corpus.select(id_col, tokens(text_col).alias("_toks"))
    sh = toked.select(
        id_col, shingles_from_tokens(F.col("_toks"), n).alias("_grams")
    )
    # ONE corpus pass: totals ride the exploded rows (explode_outer keeps
    # gram-less docs AND avoids the inferred size>0 filter that would
    # re-evaluate the shingle lambda on raw text), the broadcast left join
    # marks hits, and the per-doc groupBy collapses map-side before any
    # shuffle. A separate totals branch would scan + shingle twice.
    ex = sh.select(
        id_col,
        F.size("_grams").alias("n_grams"),
        F.explode_outer("_grams").alias("gram"),
    )
    joined = (
        ex.join(bench, "gram", "left")
        .groupBy(id_col)
        .agg(
            F.max("n_grams").alias("n_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_hit"),
        )
    )
    ratio = F.when(
        F.col("n_grams") > 0, F.col("n_hit") / F.col("n_grams").cast("double")
    ).otherwise(F.lit(0.0))
    return joined.select(
        id_col,
        "n_grams",
        F.col("n_hit").cast("long").alias("n_hit"),
        F.round(ratio, 6).alias("contamination_ratio"),
        (ratio > F.lit(flag_threshold)).alias("is_contaminated"),
    )


def boilerplate_fraction(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_df: int = 10,
) -> DataFrame:
    """Corpus-internal boilerplate detection (the CCNet/C4-style repeated-
    passage filter, public method): an n-gram is *boilerplate* when it
    occurs in >= ``min_df`` distinct documents; each document reports the
    fraction of its distinct n-grams that are boilerplate.

    Returns (id, n_grams, n_boiler, boiler_fraction).

    Scale design: two shuffles, both map-side combinable — (1) gram →
    document-frequency counts (distinct grams per doc by construction, so
    ``count(*)`` IS the df), (2) the exploded corpus re-joins the df table
    on the gram hash and collapses back to one row per document. Hot grams
    skew shuffle (2); AQE skew-join splitting handles it because the join is
    a plain equi-join. No doc×doc pairs, no driver collection.
    """
    toked = corpus.select(id_col, tokens(text_col).alias("_toks"))
    sh = toked.select(
        id_col, shingles_from_tokens(F.col("_toks"), n).alias("_grams")
    )
    ex = sh.select(
        id_col,
        F.size("_grams").alias("n_grams"),
        F.explode_outer("_grams").alias("gram"),
    )
    df_counts = (
        ex.filter(F.col("gram").isNotNull())
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= min_df)
        .select("gram", F.lit(1).alias("_boiler"))
    )
    joined = (
        ex.join(df_counts, "gram", "left")
        .groupBy(id_col)
        .agg(
            F.max("n_grams").alias("n_grams"),
            F.coalesce(F.sum("_boiler"), F.lit(0)).alias("n_boiler"),
        )
    )
    frac = F.when(
        F.col("n_grams") > 0, F.col("n_boiler") / F.col("n_grams").cast("double")
    ).otherwise(F.lit(0.0))
    return joined.select(
        id_col,
        "n_grams",
        F.col("n_boiler").cast("long").alias("n_boiler"),
        F.round(frac, 6).alias("boiler_fraction"),
    )

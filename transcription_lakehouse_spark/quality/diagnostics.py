"""Category G diagnostics (W11/W12, SA3, M4, A21) — reference
`/root/reference/src/lakehouse/quality/diagnostics.py` and
`quality/metrics/embedding.py:475-696,1179-1421`.

All ranking is TakeOrdered (orderBy.limit — Spark computes partial top-k per
partition, no full sort); neighbor work reuses the distributed top-k join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.text import STOPWORDS, tokens
from ..operators.similarity import brute_force_topk
from .sampling import random_pairs, seeded_sample

__all__ = [
    "duration_outliers",
    "similarity_outliers",
    "neighbor_sample",
    "neighbor_theme_coherence",
    "lexical_vs_embedding_corr",
]


def duration_outliers(segments: DataFrame, k: int = 10) -> DataFrame:
    """W11: k longest + k shortest segments, labeled."""
    longest = (
        segments.orderBy(F.desc("duration"), "span_id")
        .limit(k)
        .withColumn("outlier_kind", F.lit("longest"))
    )
    shortest = (
        segments.orderBy(F.asc("duration"), "span_id")
        .limit(k)
        .withColumn("outlier_kind", F.lit("shortest"))
    )
    return longest.unionByName(shortest).select(
        "outlier_kind", "span_id", "episode_id", "duration"
    )


def similarity_outliers(
    segments: DataFrame, embeddings: DataFrame, k: int = 10, sample: int = 200
) -> DataFrame:
    """W12: most-isolated / most-hubby segments by mean neighbor similarity
    over a seeded sample."""
    emb = embeddings.select("artifact_id", "embedding")
    queries = seeded_sample(emb, sample)
    topk = brute_force_topk(queries, emb, "artifact_id", "embedding", k=10)
    mean_sim = topk.groupBy("query_id").agg(
        F.round(F.avg("sim"), 6).alias("mean_neighbor_sim")
    )
    isolated = (
        mean_sim.orderBy(F.asc("mean_neighbor_sim"), "query_id")
        .limit(k)
        .withColumn("outlier_kind", F.lit("isolated"))
    )
    hubby = (
        mean_sim.orderBy(F.desc("mean_neighbor_sim"), "query_id")
        .limit(k)
        .withColumn("outlier_kind", F.lit("hub"))
    )
    return isolated.unionByName(hubby)


def neighbor_sample(
    segments: DataFrame,
    embeddings: DataFrame,
    n_queries: int = 30,
    k: int = 5,
) -> DataFrame:
    """SA3: human-review sample — queries with their top-k neighbor texts."""
    emb = embeddings.select("artifact_id", "embedding")
    queries = seeded_sample(emb, n_queries)
    topk = brute_force_topk(queries, emb, "artifact_id", "embedding", k=k)
    texts = segments.select(
        F.col("span_id").alias("artifact_id"), F.col("text")
    )
    return (
        topk.join(
            texts.withColumnRenamed("artifact_id", "query_id").withColumnRenamed(
                "text", "query_text"
            ),
            "query_id",
        )
        .join(
            texts.withColumnRenamed("artifact_id", "neighbor_id").withColumnRenamed(
                "text", "neighbor_text"
            ),
            "neighbor_id",
        )
        .select("query_id", "neighbor_id", "rank", "sim", "query_text", "neighbor_text")
    )


def neighbor_theme_coherence(
    neighbor_texts: DataFrame, text_col: str = "neighbor_text"
) -> DataFrame:
    """M4: per-query top-term frequency ratio over pooled neighbor texts →
    coherent / mixed / random verdict (`embedding.py:675-680` thresholds)."""
    toks = neighbor_texts.select(
        "query_id", F.explode(tokens(text_col)).alias("token")
    ).filter(~F.col("token").isin(*STOPWORDS))
    counts = toks.groupBy("query_id", "token").agg(F.count(F.lit(1)).alias("n"))
    per_query = counts.groupBy("query_id").agg(
        F.max("n").alias("top_n"), F.sum("n").alias("total_n")
    )
    ratio = F.col("top_n") / F.col("total_n")
    return per_query.select(
        "query_id",
        F.round(ratio, 4).alias("top_term_ratio"),
        F.when(ratio >= 0.2, F.lit("coherent"))
        .when(ratio >= 0.08, F.lit("mixed"))
        .otherwise(F.lit("random"))
        .alias("verdict"),
    )


def lexical_vs_embedding_corr(
    segments: DataFrame,
    embeddings: DataFrame,
    n_pairs: int = 500,
    seed: int = 42,
) -> dict[str, float]:
    """A21: Pearson correlation between token-Jaccard and cosine similarity
    over seeded random pairs (a sane encoder correlates positively)."""
    from ..functions.vector import as_double_array, cosine

    base = segments.select(
        F.col("span_id").alias("artifact_id"),
        F.array_distinct(tokens("text")).alias("_toks"),
    ).join(embeddings.select("artifact_id", "embedding"), "artifact_id")
    pairs = random_pairs(base.select("artifact_id"), "artifact_id", n_pairs, seed)
    a = base.select(
        F.col("artifact_id").alias("id_1"),
        F.col("_toks").alias("t1"),
        as_double_array("embedding").alias("e1"),
    )
    b = base.select(
        F.col("artifact_id").alias("id_2"),
        F.col("_toks").alias("t2"),
        as_double_array("embedding").alias("e2"),
    )
    scored = (
        pairs.join(a, "id_1")
        .join(b, "id_2")
        .select(
            (
                F.size(F.array_intersect("t1", "t2"))
                / F.size(F.array_union("t1", "t2"))
            ).alias("jaccard"),
            cosine(F.col("e1"), F.col("e2")).alias("cos"),
        )
    )
    row = scored.agg(
        F.covar_samp("jaccard", "cos").alias("cov"),
        F.stddev("jaccard").alias("sa"),
        F.stddev("cos").alias("sb"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if not row["sa"] or not row["sb"]:
        return {"pearson": 0.0, "n_pairs": int(row["n"])}
    return {
        "pearson": round(row["cov"] / (row["sa"] * row["sb"]), 6),
        "n_pairs": int(row["n"]),
    }

"""Category F: embedding sanity metrics (A20-A22, W12-W13).

Reference: `/root/reference/src/lakehouse/quality/metrics/embedding.py` —
numpy matrices there; here the neighbor computations reuse the distributed
top-k similarity join (operators/similarity.py) over a seeded stratified
sample (SA1), exactly the reference's exact-neighbors-for-metrics /
approximate-for-search split (SURVEY §7.4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.vector import as_double_array, l2_norm
from ..operators.similarity import brute_force_topk
from .sampling import stratified_sample

__all__ = [
    "norm_stats",
    "length_bias",
    "neighbor_metrics",
    "spearman",
]


def norm_stats(embeddings: DataFrame) -> DataFrame:
    """A20: L2-norm distribution (degenerate norms signal a broken encoder)."""
    e = embeddings.select(l2_norm(as_double_array("embedding")).alias("norm"))
    return e.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("norm"), 6).alias("avg_norm"),
        F.round(F.stddev("norm"), 6).alias("std_norm"),
        F.round(F.min("norm"), 6).alias("min_norm"),
        F.round(F.max("norm"), 6).alias("max_norm"),
        F.sum((F.col("norm") == 0).cast("long")).alias("n_zero"),
    )


def length_bias(segments: DataFrame, embeddings: DataFrame) -> float:
    """A20: corr(duration, embedding norm) — |corr| near 1 means the encoder
    leaks segment length."""
    joined = segments.select(
        F.col("span_id").alias("artifact_id"), "duration"
    ).join(embeddings, "artifact_id")
    # guarded Pearson: ANSI mode (Spark 4 default) makes corr() throw
    # DIVIDE_BY_ZERO when either side has zero variance
    norm = l2_norm(as_double_array("embedding"))
    row = joined.agg(
        F.covar_samp("duration", norm).alias("cov"),
        F.stddev("duration").alias("sa"),
        F.stddev(norm).alias("sb"),
    ).collect()[0]
    if not row["sa"] or not row["sb"]:
        return 0.0
    return round(row["cov"] / (row["sa"] * row["sb"]), 6)


def spearman(df: DataFrame, a: str, b: str) -> float:
    """A21: Spearman = Pearson over min-ranks, computed DISTRIBUTED.

    A bare ``rank().over(Window.orderBy(...))`` funnels the whole table
    through one partition (the evt_corr_stats scale-killer, fixed round 2).
    Here: `global_row_number` (range fences + per-value pid, no
    SinglePartition exchange) gives a total-order row number; min over each
    value's partition recovers exact rank()-with-ties=min semantics — the
    min is tiebreak-independent because equal keys always share a pid."""
    from ..operators.ranking import global_row_number

    d = df.select(F.col(a).alias("_a"), F.col(b).alias("_b")).filter(
        F.col(a).isNotNull() & F.col(b).isNotNull()
    )
    d = global_row_number(d, ["_a"], "_rna")
    d = global_row_number(d, ["_b"], "_rnb")
    ranked = d.select(
        F.min("_rna").over(Window.partitionBy("_a")).alias("ra"),
        F.min("_rnb").over(Window.partitionBy("_b")).alias("rb"),
    )
    row = ranked.agg(F.corr("ra", "rb").alias("c")).collect()[0]
    return round(row["c"], 6) if row["c"] is not None else 0.0


def neighbor_metrics(
    segments: DataFrame,
    embeddings: DataFrame,
    n_queries: int = 100,
    k: int = 10,
    seed: int = 42,
) -> DataFrame:
    """A22/W12-W13: per-query neighbor profile over a stratified sample —
    mean neighbor similarity, same-episode share, same-speaker share,
    temporal-adjacency share (neighbor within 5s of the query's bounds in
    the same episode)."""
    seg = segments.select(
        F.col("span_id").alias("artifact_id"),
        "episode_id",
        "speaker",
        "start_time",
        "end_time",
    )
    emb = embeddings.select("artifact_id", "embedding").join(seg, "artifact_id")
    # cap the >=1-per-stratum overshoot deterministically: order by a seeded
    # content hash before limiting (an unordered limit would keep an
    # arbitrary partition-dependent subset)
    queries = (
        stratified_sample(
            emb, ["episode_id", "speaker"], n_queries, seed=seed,
            id_col="artifact_id",
        )
        .orderBy(F.sha2(F.concat_ws("|", "artifact_id", F.lit(str(seed))), 256))
        .limit(n_queries)
    )
    topk = brute_force_topk(queries, emb, "artifact_id", "embedding", k=k)
    q = seg.select(
        F.col("artifact_id").alias("query_id"),
        F.col("episode_id").alias("q_ep"),
        F.col("speaker").alias("q_sp"),
        F.col("start_time").alias("q_start"),
        F.col("end_time").alias("q_end"),
    )
    n = seg.select(
        F.col("artifact_id").alias("neighbor_id"),
        F.col("episode_id").alias("n_ep"),
        F.col("speaker").alias("n_sp"),
        F.col("start_time").alias("n_start"),
        F.col("end_time").alias("n_end"),
    )
    joined = topk.join(q, "query_id").join(n, "neighbor_id")
    adjacent = (
        (F.col("n_ep") == F.col("q_ep"))
        & (
            (F.abs(F.col("n_start") - F.col("q_end")) <= 5.0)
            | (F.abs(F.col("q_start") - F.col("n_end")) <= 5.0)
        )
    )
    return joined.groupBy("query_id").agg(
        F.round(F.avg("sim"), 6).alias("mean_neighbor_sim"),
        F.round(
            F.avg((F.col("n_ep") == F.col("q_ep")).cast("double")), 4
        ).alias("same_episode_share"),
        F.round(
            F.avg((F.col("n_sp") == F.col("q_sp")).cast("double")), 4
        ).alias("same_speaker_share"),
        F.round(F.avg(adjacent.cast("double")), 4).alias("adjacent_share"),
    )

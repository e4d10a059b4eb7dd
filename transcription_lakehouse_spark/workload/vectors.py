"""Vector workload over the `embeddings` table: similarity search (J7/J9),
embedding sanity stats (A20), and embedding-cosine near-dup detection.

Cosine runs JVM-side via higher-order functions (functions/vector.py); the
DuckDB oracle recomputes it with list_transform/list_sum over the same
double-cast arrays so accumulation order matches and hashes agree after
6-digit rounding.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.vector import as_double_array, cosine, l2_norm
from ..operators.similarity import brute_force_topk, ivf_topk, lsh_topk
from ..sources.tables import load_table

# DuckDB twins for dot/norm over the float[] column (cast to double first;
# both engines then accumulate left-to-right in double).
_DDOT = (
    "list_sum(list_transform(list_zip(CAST(a.embedding AS DOUBLE[]),"
    " CAST(b.embedding AS DOUBLE[])), p -> p[1] * p[2]))"
)
_DNORM_A = "sqrt(list_sum(list_transform(CAST(a.embedding AS DOUBLE[]), x -> x * x)))"
_DNORM_B = "sqrt(list_sum(list_transform(CAST(b.embedding AS DOUBLE[]), x -> x * x)))"


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


def vec_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A20: L2-norm distribution per label."""
    e = _emb(spark, sf_dir).select(
        "label", l2_norm(as_double_array("embedding")).alias("norm")
    )
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("norm"), 6).alias("avg_norm"),
        F.round(F.min("norm"), 6).alias("min_norm"),
        F.round(F.max("norm"), 6).alias("max_norm"),
    )


VEC_NORM_STATS_SQL = """
WITH n AS (
  SELECT label,
         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS norm
  FROM embeddings
)
SELECT label, count(*) AS n_vectors,
       round(avg(norm), 6) AS avg_norm,
       round(min(norm), 6) AS min_norm,
       round(max(norm), 6) AS max_norm
FROM n GROUP BY label
"""


def vec_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 exact top-k similarity join: every 25th vector queries the corpus."""
    e = _emb(spark, sf_dir)
    queries = e.filter(F.col("vec_id") % 25 == 0)
    return brute_force_topk(queries, e, "vec_id", "embedding", k=5)


VEC_KNN_SQL = f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 25 = 0),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round(
           CASE WHEN {_DNORM_A} * {_DNORM_B} > 0
                THEN {_DDOT} / ({_DNORM_A} * {_DNORM_B})
                ELSE 0.0 END, 6) AS sim
  FROM q a CROSS JOIN embeddings b
  WHERE a.vec_id <> b.vec_id
)
SELECT query_id, neighbor_id, rank, sim
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
)
WHERE rank <= 5
"""


def vec_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (training-data dedup): all pairs
    with cosine >= 0.95, found by exact pairwise scoring within labels.

    Scale path: swap the within-label blocking for the LSH buckets of
    operators/similarity.py (same rescoring)."""
    from ..functions.vector import dot, l2_norm

    e = _emb(spark, sf_dir)
    a = e.select(
        F.col("vec_id").alias("id_1"),
        F.col("label").alias("label"),
        as_double_array("embedding").alias("va"),
    ).withColumn("na", l2_norm(F.col("va")))
    b = e.select(
        F.col("vec_id").alias("id_2"),
        F.col("label").alias("label"),
        as_double_array("embedding").alias("vb"),
    ).withColumn("nb", l2_norm(F.col("vb")))
    den = F.col("na") * F.col("nb")
    return (
        a.join(b, "label")
        .filter(F.col("id_1") < F.col("id_2"))
        .select(
            "label",
            "id_1",
            "id_2",
            F.round(
                F.when(den > 0, dot(F.col("va"), F.col("vb")) / den).otherwise(
                    F.lit(0.0)
                ),
                6,
            ).alias("sim"),
        )
        .filter(F.col("sim") >= 0.95)
        .orderBy(F.desc("sim"), F.asc("id_1"), F.asc("id_2"))
    )


VEC_NEAR_DUP_SQL = f"""
SELECT a.label AS label, a.vec_id AS id_1, b.vec_id AS id_2,
       round(
         CASE WHEN {_DNORM_A} * {_DNORM_B} > 0
              THEN {_DDOT} / ({_DNORM_A} * {_DNORM_B})
              ELSE 0.0 END, 6) AS sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(
        CASE WHEN {_DNORM_A} * {_DNORM_B} > 0
             THEN {_DDOT} / ({_DNORM_A} * {_DNORM_B})
             ELSE 0.0 END, 6) >= 0.95
ORDER BY sim DESC, id_1 ASC, id_2 ASC
"""


def vec_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 approximate ANN via deterministic hyperplane-LSH buckets.

    No SQL oracle (approximate operator; driver records rows-only) — but the
    bucketing is deterministic so results are stable run-to-run."""
    e = _emb(spark, sf_dir)
    queries = e.filter(F.col("vec_id") % 25 == 0)
    return lsh_topk(queries, e, "vec_id", "embedding", k=5, n_planes=6)


def vec_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 approximate ANN via IVF (k-means cells + nprobe probing) — the
    second scale path next to LSH, mirroring FAISS IVF semantics.

    No SQL oracle (approximate operator; driver records rows-only) — the
    coarse quantizer is trained deterministically so results are stable
    run-to-run."""
    e = _emb(spark, sf_dir)
    queries = e.filter(F.col("vec_id") % 25 == 0)
    return ivf_topk(queries, e, "vec_id", "embedding", k=5, n_cells=16, nprobe=4)


def vec_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components (elementwise mean over the embedding
    column) — posexplode → groupBy(label, pos); at scale this is the partial-
    aggregated reduction a k-means/IVF coarse quantizer is built from."""
    e = _emb(spark, sf_dir)
    return (
        e.select("label", F.posexplode(as_double_array("embedding")).alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("v"), 6).alias("avg_val"))
    )


VEC_LABEL_CENTROIDS_SQL = """
-- testdata embeddings are fixed 64-dim (DuckDB's generate_series cannot be
-- lateral over len(embedding))
SELECT label, i - 1 AS pos,
       round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS avg_val
FROM embeddings, generate_series(1, 64) AS t(i)
GROUP BY label, pos
"""


def vec_label_similarity_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality matrix: mean pairwise cosine within and across
    labels (a sane encoder has a hot diagonal). Exact pairwise over the
    corpus — at scale, sample per label first (quality/sampling.py)."""
    from ..functions.vector import dot, l2_norm

    e = _emb(spark, sf_dir)
    a = e.select(
        F.col("label").alias("label_1"),
        F.col("vec_id").alias("id_1"),
        as_double_array("embedding").alias("va"),
    ).withColumn("na", l2_norm(F.col("va")))
    b = e.select(
        F.col("label").alias("label_2"),
        F.col("vec_id").alias("id_2"),
        as_double_array("embedding").alias("vb"),
    ).withColumn("nb", l2_norm(F.col("vb")))
    den = F.col("na") * F.col("nb")
    pairs = (
        a.crossJoin(b)
        .filter(F.col("id_1") < F.col("id_2"))
        .select(
            "label_1",
            "label_2",
            F.when(den > 0, dot(F.col("va"), F.col("vb")) / den)
            .otherwise(F.lit(0.0))
            .alias("sim"),
        )
    )
    return pairs.groupBy("label_1", "label_2").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg("sim"), 6).alias("avg_sim"),
    )


_PAIR_COS = (
    "list_sum(list_transform(list_zip(CAST(a.embedding AS DOUBLE[]),"
    " CAST(b.embedding AS DOUBLE[])), p -> p[1] * p[2]))"
    " / (sqrt(list_sum(list_transform(CAST(a.embedding AS DOUBLE[]), x -> x * x)))"
    " * sqrt(list_sum(list_transform(CAST(b.embedding AS DOUBLE[]), x -> x * x))))"
)

VEC_LABEL_SIM_MATRIX_SQL = f"""
SELECT a.label AS label_1, b.label AS label_2,
       count(*) AS n_pairs,
       round(avg({_PAIR_COS}), 6) AS avg_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
GROUP BY 1, 2
"""


QUERIES = {
    "vec_label_centroids": vec_label_centroids,
    "vec_label_similarity_matrix": vec_label_similarity_matrix,
    "vec_norm_stats": vec_norm_stats,
    "vec_knn_bruteforce": vec_knn_bruteforce,
    "vec_knn_ivf": vec_knn_ivf,
    "vec_near_dup_pairs": vec_near_dup_pairs,
    "vec_knn_lsh": vec_knn_lsh,
}

ORACLES = {
    "vec_label_centroids": VEC_LABEL_CENTROIDS_SQL,
    "vec_label_similarity_matrix": VEC_LABEL_SIM_MATRIX_SQL,
    "vec_norm_stats": VEC_NORM_STATS_SQL,
    "vec_knn_bruteforce": VEC_KNN_SQL,
    "vec_near_dup_pairs": VEC_NEAR_DUP_SQL,
    "vec_knn_lsh": None,
}

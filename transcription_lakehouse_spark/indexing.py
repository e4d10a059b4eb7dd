"""Vector index lifecycle (M2/M3/J9) — Spark-native replacement for the
FAISS build/search/incremental-update path
(`/root/reference/src/lakehouse/indexing/`).

Strategy (SURVEY §4): vectors live in a parquet/Delta table; search is
exact brute-force below a row-count threshold and LSH-bucketed above
(operators/similarity.py). 'Index build' degenerates to materializing the
bucket assignment as a column — cheap, incremental, and partition-prunable
at query time (the bucket equality predicate prunes parquet row groups).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .operators.similarity import brute_force_topk, hyperplane_bucket, lsh_topk

__all__ = ["build_index", "incremental_update", "search"]

EXACT_THRESHOLD = 100_000  # below: exact crossJoin top-k; above: LSH


def build_index(
    embeddings: DataFrame, out_path: str, n_planes: int = 8
) -> None:
    """M2: persist vectors + LSH bucket column, partitioned by bucket so a
    bucket-equality search prunes partitions."""
    from .functions.vector import as_double_array

    tagged = embeddings.withColumn(
        "bucket", hyperplane_bucket(as_double_array("embedding"), n_planes)
    )
    tagged.write.mode("overwrite").partitionBy("bucket").parquet(out_path)


def incremental_update(
    spark: SparkSession, embeddings: DataFrame, index_path: str,
    id_col: str = "artifact_id", rebuild_threshold: float = 0.3,
) -> str:
    """M3: append only new artifact ids (anti-join, J6); full rebuild when
    new rows exceed 30% of the index (`incremental.py:200-276`)."""
    try:
        existing = spark.read.parquet(index_path)
    except Exception:
        build_index(embeddings, index_path)
        return "built"
    new = embeddings.join(
        existing.select(id_col), id_col, "left_anti"
    )
    n_new, n_old = new.count(), existing.count()
    if n_old == 0 or n_new / max(n_old, 1) > rebuild_threshold:
        build_index(embeddings, index_path)
        return "rebuilt"
    from .functions.vector import as_double_array

    tagged = new.withColumn(
        "bucket", hyperplane_bucket(as_double_array("embedding"), 8)
    )
    tagged.write.mode("append").partitionBy("bucket").parquet(index_path)
    return f"appended {n_new}"


def search(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "artifact_id",
    vec_col: str = "embedding",
    k: int = 10,
    exact: bool | None = None,
) -> DataFrame:
    """J9: top-k neighbors; strategy switch mirrors the reference's
    exact-vs-ANN split (exact for metrics, approximate at scale)."""
    if exact is None:
        exact = corpus.count() <= EXACT_THRESHOLD
    fn = brute_force_topk if exact else lsh_topk
    return fn(queries, corpus, id_col, vec_col, k=k)

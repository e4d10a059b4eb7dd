"""Scaling experiment for canonical SemDeDup (`semdedup_kmeans`): does the
paper's cost model hold on this implementation — n_cells grown with the
corpus so cell population (and therefore each per-cell GEMM) stays bounded,
making total work ~linear in N?

Replicas are ROTATED (element-wise array rotation per replica) so they stay
genuinely distinct vectors — verbatim replication would make every replica
group an exact-dup clique and measure quadratic pair growth instead of the
operator's scaling. The quantizer is retrained per factor at
n_cells = max(16, N / TARGET_CELL) — the paper's rule (cluster count
proportional to corpus, fixed expected cluster size), same deterministic
`train_centroids` as the committed artifact.

Usage: python tools/semdedup_scaling.py [factors...]   (default 1 5 20)
Prints one JSON line per factor.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from transcription_lakehouse_spark.operators.similarity import (  # noqa: E402
    semdedup_kmeans,
    train_centroids,
)
from transcription_lakehouse_spark.session import get_spark  # noqa: E402
from transcription_lakehouse_spark.sources.tables import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
TARGET_CELL = 300
THRESHOLD = 0.35


def scaled_embeddings(spark, factor: int):
    emb = load_table(spark, SF_DIR, "embeddings")
    reps = spark.range(factor).withColumnRenamed("id", "rep")
    d = 64
    rot = F.col("rep") % d
    arr = F.col("embedding")
    rotated = F.when(rot == 0, arr).otherwise(
        F.concat(
            F.slice(arr, rot + 1, F.lit(d) - rot), F.slice(arr, 1, rot)
        )
    )
    return (
        emb.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") * factor + F.col("rep")).alias("vec_id"),
            rotated.alias("embedding"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 5, 20]
    for factor in factors:
        # fresh app per factor: no cache/JIT bleed between points (the
        # pipeline_scaling.py methodology fix from r4)
        spark = get_spark(app_name=f"semdedup-scaling-{factor}")
        corpus = scaled_embeddings(spark, factor).localCheckpoint()
        n = corpus.count()
        n_cells = max(16, n // TARGET_CELL)
        t0 = time.time()
        cents = train_centroids(
            corpus, "vec_id", "embedding", n_cells=n_cells
        )
        t_train = round(time.time() - t0, 2)
        t1 = time.time()
        out = semdedup_kmeans(
            corpus, "vec_id", "embedding", cents, threshold=THRESHOLD
        )
        clustered = out.count()
        wall = round(time.time() - t1, 2)
        print(
            json.dumps(
                {
                    "factor": factor,
                    "n_vectors": n,
                    "n_cells": n_cells,
                    "clustered_rows": clustered,
                    "train_wall_sec": t_train,
                    "dedup_wall_sec": wall,
                    "us_per_vector": round(wall * 1e6 / n, 1),
                }
            ),
            flush=True,
        )
        spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Parallel-scale evidence at a data-dominated point (r11 verdict #1).

The sf0.1 bench suite is fixed-overhead-bound: the driver's 8-core run
landed within 8% of the 32-core run because 0.3-8 s walls are dominated
by plan compile, py4j chatter and Python worker spin-up, not by
partitionable data. This tool re-runs the top bench entries with the
corpus replicated far past that regime (factors chosen so the 32-core
wall is tens of seconds) and reports per-entry walls, so an 8-core vs
32-core pair of invocations measures how the HOT PATH scales with cores
when data dominates.

Usage:
    SPARK_GRAFT_CPUS=32 python tools/core_scaling.py [entries...]
    SPARK_GRAFT_CPUS=8  python tools/core_scaling.py [entries...]

Honors $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) as the BASE
data; replication happens inside the tool (crossJoin with distinct ids,
same recipe as bench.py's 20x entries) or via a scaled parquet dir under
$TMPDIR for the table-reading registry queries (trn chain, curation).
Prints one JSON line: {"cpus": N, "queries": {entry: sec}, ...}.

Timing: one measured run per entry after a session warmup + q1
calibration triple, matching bench.py's methodology; each action is the
same collect() the bench uses. Entries are INDEPENDENT of bench.py's
HEADLINE/SCALED sets — nothing here feeds bench_compare.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from transcription_lakehouse_spark.session import get_spark  # noqa: E402
from transcription_lakehouse_spark.sources.tables import load_table  # noqa: E402
from transcription_lakehouse_spark.workload import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TMP = os.environ.get("TMPDIR", "/tmp")

# Replication factors: sized so the 32-core wall lands ~15-60 s (data
# dominates the ~1-2 s fixed session/plan costs by >10x) without making
# the 8-core sweep run for hours. Factors are per-entry because per-entry
# cost growth differs (the LSH/graph bucket joins grow superlinearly in
# corpus size at fixed banding).
FACTOR = {
    "knn_lsh": 100,
    "knn_ivf": 100,
    "knn_ivfpq": 100,
    "knn_pq": 100,
    "graph_build": 50,
    "dedup_minhash": 100,
    "decontam_semantic": 100,
    "trn_section_catalog": 10,
    "doc_curation_v4": 20,
}


def _replicated_embeddings(spark, factor: int):
    emb = load_table(spark, SF_DIR, "embeddings")
    reps = spark.range(factor).withColumnRenamed("id", "rep")
    return (
        emb.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") * factor + F.col("rep")).alias("vec_id"),
            "embedding",
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )


def _scaled_docs(spark, factor: int):
    docs = load_table(spark, SF_DIR, "documents")
    reps = spark.range(factor).withColumnRenamed("id", "rep")
    return (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") * factor + F.col("rep")).alias("doc_id"),
            "text",
            "lang",
            "source",
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )


# ---- inline-replicated entries (bench.py 20x recipes at bigger F) ------

def run_knn_lsh(spark):
    from transcription_lakehouse_spark.operators.similarity import lsh_topk

    f = FACTOR["knn_lsh"]
    big = _replicated_embeddings(spark, f)
    # query batch FIXED at the 20x entry's ~1600 as the corpus grows — the
    # production shape (corpus scales, per-batch query count doesn't), and
    # it keeps the collision-join volume linear in corpus size
    queries = big.filter(F.col("vec_id") % (25 * f // 20) == 0)
    return lsh_topk(
        queries, big, "vec_id", "embedding", k=5, n_bands=8, planes_per_band=10
    )


def run_knn_ivf(spark):
    from transcription_lakehouse_spark.operators.similarity import ivf_topk

    f = FACTOR["knn_ivf"]
    big = _replicated_embeddings(spark, f)
    queries = big.filter(F.col("vec_id") % (25 * f // 20) == 0)
    # n_cells scales with the corpus (the sqrt-N sizing the semdedup
    # docstring records): 32 cells at 200k rows caps the cogroup at 32
    # groups and balls-into-bins leaves a third of the cores idle at 32
    # tasks — 128 cells keep per-cell populations bounded AND hand the
    # kernel stage enough groups to fill any local core count.
    return ivf_topk(
        queries, big, "vec_id", "embedding", k=5, n_cells=128, nprobe=16
    )


def run_knn_pq(spark):
    from transcription_lakehouse_spark.operators.pq import pq_topk
    from transcription_lakehouse_spark.workload._pq_codebooks import CODEBOOKS

    f = FACTOR["knn_pq"]
    big = _replicated_embeddings(spark, f)
    queries = big.filter(F.col("vec_id") % (100 * f // 20) == 0)
    return pq_topk(
        queries, big, "vec_id", "embedding", CODEBOOKS, k=5, shortlist=64
    )


def run_knn_ivfpq(spark):
    from transcription_lakehouse_spark.operators.pq import ivfpq_topk
    from transcription_lakehouse_spark.workload._ivf_quantizer import CENTROIDS
    from transcription_lakehouse_spark.workload._ivfpq_codebooks import (
        CODEBOOKS as RESIDUAL_BOOKS,
    )

    f = FACTOR["knn_ivfpq"]
    big = _replicated_embeddings(spark, f)
    queries = big.filter(F.col("vec_id") % (100 * f // 20) == 0)
    # same sqrt-N coarse-layer sizing as run_knn_ivf: train a 128-cell
    # quantizer inline (train_centroids is a bounded-sample driver fold)
    # so the ADC stage has enough cell groups to fill the cores; the
    # committed residual codebooks stay the codebooks (they are global
    # per-subspace tables, valid for any coarse layer).
    from transcription_lakehouse_spark.operators.similarity import (
        train_centroids,
    )

    cents = train_centroids(big, "vec_id", "embedding", n_cells=128)
    return ivfpq_topk(
        queries, big, "vec_id", "embedding", cents, RESIDUAL_BOOKS,
        k=5, nprobe=16, shortlist=64,
    )


def run_graph_build(spark):
    from transcription_lakehouse_spark.operators.graph_ann import build_knn_graph

    f = FACTOR["graph_build"]
    big = _replicated_embeddings(spark, f)
    g = build_knn_graph(
        big, "vec_id", "embedding", k_graph=16, n_bands=8, planes_per_band=10
    )
    path = os.path.join(TMP, "core_scaling_graph")
    g.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path).groupBy().count()


def run_dedup_minhash(spark):
    from transcription_lakehouse_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signature,
    )

    docs = _scaled_docs(spark, FACTOR["dedup_minhash"])
    sigs = minhash_signature(docs, "doc_id", "text", n=3)
    return lsh_candidate_pairs(sigs, "doc_id").groupBy().count()


def run_decontam_semantic(spark):
    from transcription_lakehouse_spark.operators.decontam import semantic_decontam

    big = _replicated_embeddings(spark, FACTOR["decontam_semantic"])
    evalset = load_table(spark, SF_DIR, "embeddings").filter(
        F.col("vec_id") % 20 == 0
    )
    return semantic_decontam(
        big, evalset, "vec_id", "embedding",
        threshold=0.35, n_bands=8, planes_per_band=4,
    )


# ---- scaled-dir entries: registry queries over replicated tables -------

def _scaled_dir(spark) -> str:
    """Materialize a replicated copy of the tables the registry entries
    read (documents x20, events x10) with DISTINCT ids per replica, so
    QUERIES[name](spark, dir) runs the exact declared code path on a
    data-dominated input. Built once per invocation (build time is NOT
    part of any entry's wall)."""
    out = os.path.join(TMP, "core_scaling_sf")
    docs = _scaled_docs(spark, FACTOR["doc_curation_v4"])
    docs.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    fe = FACTOR["trn_section_catalog"]
    ev = load_table(spark, SF_DIR, "events")
    reps = spark.range(fe).withColumnRenamed("id", "rep")
    (
        ev.crossJoin(F.broadcast(reps))
        .select(
            (F.col("event_id") * fe + F.col("rep")).alias("event_id"),
            (F.col("user_id") * fe + F.col("rep")).alias("user_id"),
            F.col("ts"),
            "event_type",
            "value",
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "events.parquet"))
    )
    return out


def main() -> None:
    names = sys.argv[1:] or list(FACTOR)
    spark = get_spark(app_name="core_scaling")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    # session warmup: same discipline as bench.py
    load_table(spark, SF_DIR, "embeddings").limit(1).count()
    load_table(spark, SF_DIR, "documents").limit(1).count()
    load_table(spark, SF_DIR, "events").limit(1).count()

    def _cal() -> float:
        walls = []
        for _ in range(3):
            t0 = time.time()
            QUERIES["q1_pricing_summary"](spark, SF_DIR).collect()
            walls.append(time.time() - t0)
        return round(sorted(walls)[1], 3)

    def _load1() -> float:
        try:
            return round(os.getloadavg()[0], 2)
        except OSError:
            return -1.0

    load_start = _load1()
    cal = _cal()

    inline = {
        "knn_lsh": run_knn_lsh,
        "knn_ivf": run_knn_ivf,
        "knn_pq": run_knn_pq,
        "knn_ivfpq": run_knn_ivfpq,
        "graph_build": run_graph_build,
        "dedup_minhash": run_dedup_minhash,
        "decontam_semantic": run_decontam_semantic,
    }
    needs_dir = [n for n in names if n in ("trn_section_catalog", "doc_curation_v4")]
    big_dir = _scaled_dir(spark) if needs_dir else None

    timings: dict[str, float] = {}
    entry_load: dict[str, float] = {}
    for name in names:
        entry_load[name] = _load1()
        spark.sparkContext.setJobDescription(f"core_scaling:{name}")
        t0 = time.time()
        if name in inline:
            inline[name](spark).collect()
        else:
            QUERIES[name](spark, big_dir).collect()
        timings[name] = round(time.time() - t0, 2)
        spark.sparkContext.setJobDescription(None)
        print(f"# {name}: {timings[name]} s (load {entry_load[name]})",
              file=sys.stderr)

    print(json.dumps({
        "tool": "core_scaling",
        "cpus": cpus,
        "factors": {k: FACTOR[k] for k in names if k in FACTOR},
        "queries": timings,
        "total_sec": round(sum(timings.values()), 2),
        "calibration_sec": cal,
        "load_1min_start": load_start,
        "load_1min_end": _load1(),
        "entry_load": entry_load,
    }))


if __name__ == "__main__":
    main()

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

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .operators.similarity import brute_force_topk, hyperplane_bucket, lsh_topk

__all__ = [
    "build_index",
    "incremental_update",
    "search",
    "read_index_meta",
    "build_ivf_index",
    "search_ivf",
    "ivf_incremental_update",
    "ivf_drift_report",
    "occupancy_psi",
]

EXACT_THRESHOLD = 100_000  # below: exact crossJoin top-k; above: LSH

_META_NAME = "_index_meta.json"


def _write_index_meta(out_path: str, n_planes: int, n_rows: int) -> None:
    with open(os.path.join(out_path, _META_NAME), "w") as f:
        json.dump({"n_planes": n_planes, "rows": n_rows}, f)


def read_index_meta(index_path: str) -> dict:
    """Index metadata sidecar: the hash-family parameter (n_planes) and a
    row-count hint. Appending rows bucketed under a DIFFERENT plane count
    silently corrupts bucket-pruned searches, so the family is persisted at
    build time and reused on every append/rebuild."""
    with open(os.path.join(index_path, _META_NAME)) as f:
        return json.load(f)


def build_index(
    embeddings: DataFrame, out_path: str, n_planes: int = 8
) -> None:
    """M2: persist vectors + LSH bucket column, partitioned by bucket so a
    bucket-equality search prunes partitions. n_planes is recorded in a
    metadata sidecar so incremental updates keep the same hash family."""
    from .functions.vector import as_double_array

    tagged = embeddings.withColumn(
        "bucket", hyperplane_bucket(as_double_array("embedding"), n_planes)
    )
    tagged.write.mode("overwrite").partitionBy("bucket").parquet(out_path)
    # row count from the written footers (metadata-only), not a recompute
    n_rows = embeddings.sparkSession.read.parquet(out_path).count()
    _write_index_meta(out_path, n_planes, n_rows)


def incremental_update(
    spark: SparkSession, embeddings: DataFrame, index_path: str,
    id_col: str = "artifact_id", rebuild_threshold: float = 0.3,
    n_planes: int = 8,
) -> str:
    """M3: append only new artifact ids (anti-join, J6); full rebuild when
    new rows exceed 30% of the index (`incremental.py:200-276`).

    The append path buckets new rows with the n_planes persisted at build
    time (metadata sidecar) — NOT the caller's default — so an index built
    with a non-default plane count never gets rows from a different hash
    family. `n_planes` here only applies when building from scratch."""
    try:
        existing = spark.read.parquet(index_path)
    except Exception:
        build_index(embeddings, index_path, n_planes=n_planes)
        return "built"
    try:
        built_planes = int(read_index_meta(index_path)["n_planes"])
    except (OSError, KeyError, ValueError):
        # pre-sidecar index: infer the family from the persisted buckets
        # (bucket ids span [0, 2^planes)) rather than guessing the default
        max_bucket = existing.agg(F.max("bucket")).first()[0] or 0
        built_planes = max(int(max_bucket).bit_length(), 1)
    new = embeddings.join(
        existing.select(id_col), id_col, "left_anti"
    )
    n_new, n_old = new.count(), existing.count()
    if n_old == 0 or n_new / max(n_old, 1) > rebuild_threshold:
        build_index(embeddings, index_path, n_planes=built_planes)
        return "rebuilt"
    from .functions.vector import as_double_array

    tagged = new.withColumn(
        "bucket", hyperplane_bucket(as_double_array("embedding"), built_planes)
    )
    tagged.write.mode("append").partitionBy("bucket").parquet(index_path)
    _write_index_meta(index_path, built_planes, n_old + n_new)
    return f"appended {n_new}"


def build_ivf_index(
    embeddings: DataFrame,
    out_path: str,
    n_cells: int = 16,
    id_col: str = "artifact_id",
    vec_col: str = "embedding",
) -> None:
    """IVF index materialization — the 100 TB search path: train the coarse
    quantizer ONCE (bounded driver-side k-means), assign every vector its
    nearest cell, and store the corpus parquet PARTITIONED BY cell with the
    centroids in the metadata sidecar. A search then reads only the
    ~nprobe/n_cells partitions its probes touch (partition pruning on the
    cell directory), with zero per-search assignment work."""
    from .operators.similarity import _nearest_cells_udf, train_centroids
    from .functions.vector import as_double_array

    centroids = train_centroids(embeddings, id_col, vec_col, n_cells)
    assign1 = _nearest_cells_udf(centroids, 1)
    tagged = embeddings.withColumn(
        "cell", F.element_at(assign1(as_double_array(vec_col)), 1)
    )
    tagged.write.mode("overwrite").partitionBy("cell").parquet(out_path)
    stored = embeddings.sparkSession.read.parquet(out_path)
    n_rows = stored.count()
    # training-time cell occupancy (bounded: one row per cell) — the
    # baseline ivf_drift_report compares against. A quantizer is only as
    # good as the distribution it was trained on; when the corpus drifts,
    # occupancy shifts long before recall visibly degrades.
    occ = _cell_occupancy(stored)
    with open(os.path.join(out_path, _META_NAME), "w") as f:
        json.dump({"kind": "ivf", "centroids": centroids, "rows": n_rows,
                   "occupancy": {str(c): p for c, p in occ.items()}}, f)


def _cell_occupancy(df: DataFrame, cell_col: str = "cell") -> dict:
    """Per-cell row fraction — the collect is bounded by n_cells."""
    rows = df.groupBy(cell_col).count().collect()
    total = sum(r["count"] for r in rows) or 1
    return {int(r[cell_col]): r["count"] / total for r in rows}


def occupancy_psi(expected: dict, actual: dict, n_cells: int,
                  eps: float = 1e-4) -> float:
    """Population stability index between two cell-occupancy
    distributions: sum over cells of (q - p) * ln(q / p), with
    ``eps`` floor so an empty cell contributes a large finite term
    instead of inf. Standard monitoring bands: <0.1 stable, 0.1-0.25
    moderate shift, >=0.25 retrain."""
    import math as _math

    psi = 0.0
    for c in range(n_cells):
        p = max(float(expected.get(c, 0.0)), eps)
        q = max(float(actual.get(c, 0.0)), eps)
        psi += (q - p) * _math.log(q / p)
    return psi


def ivf_drift_report(
    spark: SparkSession,
    index_path: str,
    current: DataFrame | None = None,
    vec_col: str = "embedding",
    psi_threshold: float = 0.25,
) -> dict:
    """DESCRIBE-DETAIL-style observability for a TRAINED quantizer (r10
    verdict #5): PSI of the corpus's cell occupancy now vs at train
    time, with a retrain recommendation past ``psi_threshold``. At
    100 TB a stale IVF/PQ quantizer silently degrades recall — probes
    concentrate into over-full cells (more distance work per query) or
    miss the region the drifted mass moved to; occupancy PSI is the
    cheap early-warning signal (one bounded groupBy, no recall
    measurement needed).

    ``current`` defaults to the index's own stored rows (drift from
    incremental appends since build); pass a fresh corpus DataFrame to
    score a candidate batch BEFORE appending it. Vectors in ``current``
    are assigned with the TRAINED centroids — exactly what search would
    do, so the report reflects real probe behavior. Pre-r11 sidecars
    lack the training occupancy; the stored corpus then serves as the
    baseline (reported under ``baseline``)."""
    from .functions.vector import as_double_array
    from .operators.similarity import _nearest_cells_udf

    meta = read_index_meta(index_path)
    if meta.get("kind") != "ivf":
        raise ValueError(
            f"ivf_drift_report: {index_path} is not an IVF index"
        )
    centroids = meta["centroids"]
    n_cells = len(centroids)
    stored = spark.read.parquet(index_path)
    baseline = "train"
    train_occ = meta.get("occupancy")
    if train_occ is None:
        train_occ = _cell_occupancy(stored)
        baseline = "stored"
    else:
        train_occ = {int(c): p for c, p in train_occ.items()}
    if current is None:
        cur_occ = _cell_occupancy(stored)
    else:
        assign1 = _nearest_cells_udf(centroids, 1)
        cur_occ = _cell_occupancy(
            current.withColumn(
                "cell", F.element_at(assign1(as_double_array(vec_col)), 1)
            )
        )
    psi = occupancy_psi(train_occ, cur_occ, n_cells)
    return {
        "psi": round(psi, 6),
        "psi_threshold": psi_threshold,
        "recommend_retrain": psi >= psi_threshold,
        "n_cells": n_cells,
        "baseline": baseline,
        "occupancy_train": {c: round(train_occ.get(c, 0.0), 6)
                            for c in range(n_cells)},
        "occupancy_current": {c: round(cur_occ.get(c, 0.0), 6)
                              for c in range(n_cells)},
    }


def ivf_incremental_update(
    spark: SparkSession,
    embeddings: DataFrame,
    index_path: str,
    id_col: str = "artifact_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    psi_rebuild_threshold: float | None = 0.25,
) -> str:
    """M3 for the IVF family — append-only maintenance with a
    DRIFT-TRIGGERED retrain (the actuator for ``ivf_drift_report``,
    closing r10 verdict #5): new ids (anti-join, deterministic replays
    are no-ops) are assigned with the TRAINED centroids and appended to
    their cell partitions; then ONE occupancy-PSI check against the
    training baseline decides whether the quantizer is stale. Past
    ``psi_rebuild_threshold`` the index is rebuilt from its own stored
    rows — retraining centroids on the drifted corpus and restoring the
    recall the stale cell layout was silently losing (measured in
    SCALING.md: 0.842 → 1.000 recall@10 at nprobe=1 on a flooded-region
    drift). ``None`` disables the rebuild (observability only — the
    report is still computed and returned in the status string).

    Unlike the LSH ``incremental_update``'s new-row-fraction threshold,
    the trigger here is DISTRIBUTION shift, not volume: a million
    in-distribution appends never force a pointless retrain, while a
    small flood of out-of-distribution mass fires it."""
    try:
        meta = read_index_meta(index_path)
        if meta.get("kind") != "ivf":
            raise ValueError(
                f"ivf_incremental_update: {index_path} is not an IVF "
                "index"
            )
    except (OSError, json.JSONDecodeError):
        build_ivf_index(embeddings, index_path, n_cells=n_cells,
                        id_col=id_col, vec_col=vec_col)
        return "built"
    from .functions.vector import as_double_array
    from .operators.similarity import _nearest_cells_udf

    existing = spark.read.parquet(index_path)
    new = embeddings.join(existing.select(id_col), id_col, "left_anti")
    n_new = new.count()
    if n_new:
        assign1 = _nearest_cells_udf(meta["centroids"], 1)
        tagged = new.withColumn(
            "cell", F.element_at(assign1(as_double_array(vec_col)), 1)
        )
        tagged.write.mode("append").partitionBy("cell").parquet(index_path)
    rep = ivf_drift_report(spark, index_path)
    if (psi_rebuild_threshold is not None
            and rep["psi"] >= psi_rebuild_threshold):
        corpus = spark.read.parquet(index_path).drop("cell")
        # rebuild staging-first: train + write beside, then swap — the
        # sidecar and partitions stay consistent for concurrent readers
        # of the OLD index until the atomic directory rename
        import shutil
        import tempfile

        tmp = tempfile.mkdtemp(
            dir=os.path.dirname(os.path.abspath(index_path)),
            prefix="._ivf_rebuild_",
        )
        stage = os.path.join(tmp, "index")
        build_ivf_index(corpus, stage, n_cells=len(meta["centroids"]),
                        id_col=id_col, vec_col=vec_col)
        old = index_path.rstrip("/") + ".old"
        os.rename(index_path, old)
        os.rename(stage, index_path)
        shutil.rmtree(old, ignore_errors=True)
        os.rmdir(tmp)
        return f"rebuilt (psi {rep['psi']})"
    # baseline occupancy stays the TRAINING distribution; only the row
    # count advances
    meta["rows"] = int(meta.get("rows", 0)) + n_new
    with open(os.path.join(index_path, _META_NAME), "w") as f:
        json.dump(meta, f)
    return f"appended {n_new} (psi {rep['psi']})"


def search_ivf(
    spark: SparkSession,
    queries: DataFrame,
    index_path: str,
    id_col: str = "artifact_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Top-k against a stored IVF index. The distinct probed cells are
    collected first (bounded by n_cells — a tiny driver set even for huge
    query batches) so the corpus scan filters to those cell partitions and
    parquet partition pruning skips the rest of the store."""
    from .operators.similarity import _nearest_cells_udf, ivf_topk
    from .functions.vector import as_double_array

    centroids = read_index_meta(index_path)["centroids"]
    probe = _nearest_cells_udf(centroids, nprobe)
    probed = [
        r["cell"]
        for r in queries.select(
            F.explode(probe(as_double_array(vec_col))).alias("cell")
        )
        .distinct()
        .collect()
    ]
    corpus = spark.read.parquet(index_path).filter(F.col("cell").isin(probed))
    return ivf_topk(
        queries,
        corpus,
        id_col,
        vec_col,
        k=k,
        nprobe=nprobe,
        centroids=centroids,
        precomputed_cell="cell",
    )


def search(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "artifact_id",
    vec_col: str = "embedding",
    k: int = 10,
    exact: bool | None = None,
    corpus_rows: int | None = None,
) -> DataFrame:
    """J9: top-k neighbors; strategy switch mirrors the reference's
    exact-vs-ANN split (exact for metrics, approximate at scale).

    Pass `corpus_rows` (e.g. from the index metadata sidecar) to skip the
    full-scan count in the strategy switch — at scale a count() before
    every search is itself a scan of the whole corpus."""
    if exact is None:
        if corpus_rows is None:
            corpus_rows = corpus.count()
        exact = corpus_rows <= EXACT_THRESHOLD
    fn = brute_force_topk if exact else lsh_topk
    return fn(queries, corpus, id_col, vec_col, k=k)

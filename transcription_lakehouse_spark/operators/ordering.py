"""Deterministic training-data ordering: mixture expansion + salted
shuffle + shard assignment — the step between a curated corpus and the
trainer's data loader.

The reference stops at materializing catalogs; a training pipeline still
has to fix the ORDER examples are seen in, reproducibly: upsampled
domains repeat (the mixture plan's sampling factors made concrete),
every copy lands at an independent pseudo-random position, and the
result is written as N shard files whose within-shard order is part of
the run's provenance. Doing this with `rand()` breaks reproducibility
and resumability; the standard fix (e.g. T5/GPT-3-style deterministic
data pipelines) is a salted-hash order: position follows
``md5(seed : repeat : id)``, so any worker can recompute any shard
independently.

Scale design: zero global sorts and zero driver state. Repetition is a
row-local ``explode(sequence(...))``; the shard id is a hash mod; the
within-shard position is a window partitioned BY SHARD — n_shards-way
parallel (pick n_shards ~ cluster write parallelism at 100 TB; each
shard's window sorts only its own slice, the same per-file order a
loader needs). Everything is md5-deterministic, so the whole assignment
value-hash-gates against a DuckDB twin
(`workload/text.py:DOC_TRAINING_ORDER_SQL`).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

__all__ = ["training_order", "curriculum_order", "write_training_shards"]


def training_order(
    df: DataFrame,
    id_col: str,
    keep_cols: list[str] | None = None,
    repeats: Column | int = 1,
    n_shards: int = 8,
    seed: str = "epoch0",
) -> DataFrame:
    """Assign every (repeated) row a deterministic ``(shard, shard_pos)``.

    ``repeats`` — an int or a per-row Column (e.g. the mixture plan's
    ceil(sampling_factor)): each row is emitted ``repeats`` times with
    ``rep`` = 0..repeats-1, every copy independently placed. Output
    columns: ``id_col, *keep_cols, rep, shard, shard_pos``.

    Placement key: ``md5(seed:rep:id)`` — shard is the key's first 8 hex
    digits mod ``n_shards``; ``shard_pos`` is the 1-based rank of the key
    within the shard (ties broken by id then rep, though md5 collisions
    are not expected). Changing ``seed`` reshuffles everything (the
    between-epoch reshuffle); changing nothing reproduces the exact
    order (the resumability contract).
    """
    reps = repeats if isinstance(repeats, Column) else F.lit(int(repeats))
    # clamp to >= 1: Spark's sequence(0, stop) flips to a DESCENDING range
    # when stop < 0 (sequence(0, -1) = [0, -1]), which would emit phantom
    # copies for a zero/negative repeat instead of one
    reps = F.greatest(F.lit(1).cast("long"), reps.cast("long"))
    out = df.select(
        id_col, *(keep_cols or []),
        F.explode(F.sequence(F.lit(0).cast("long"), reps - 1)).alias("rep"),
    )
    key = F.md5(
        F.concat_ws(":", F.lit(seed), F.col("rep"), F.col(id_col))
    )
    out = out.withColumn("_key", key).withColumn(
        "shard",
        (F.conv(F.substring(F.col("_key"), 1, 8), 16, 10).cast("long")
         % F.lit(n_shards)).cast("int"),
    )
    w = Window.partitionBy("shard").orderBy(
        F.asc("_key"), F.asc(id_col), F.asc("rep")
    )
    return (
        out.withColumn("shard_pos", F.row_number().over(w))
        .select(id_col, *(keep_cols or []), "rep", "shard", "shard_pos")
    )


def curriculum_order(
    df: DataFrame,
    id_col: str,
    score_col: str,
    keep_cols: list[str] | None = None,
    n_buckets: int = 4,
    n_shards: int = 8,
    seed: str = "epoch0",
    high_first: bool = True,
    repeats: Column | int = 1,
) -> DataFrame:
    """Curriculum data ordering: every shard serves its documents TIER by
    TIER (quality-score width buckets), deterministically shuffled within
    each tier — the clean-first (or easy-first) schedule curriculum
    training wants, as a drop-in sibling of :func:`training_order`.

    ``tier`` = width bucket of ``score_col`` over [0, 1]
    (``floor(score · n_buckets)``, clamped), inverted when ``high_first``
    so tier 0 is the highest-score slice; within a tier the order is the
    salted-md5 key (same resumability/reshuffle contract as
    training_order). ``repeats`` mirrors training_order's mixture
    expansion — every copy keeps its document's tier and lands at an
    independent position inside it. Output: ``id_col, *keep_cols,
    score_col, tier, rep, shard, shard_pos``.

    Scale: identical shape to training_order — shard is a hash mod, the
    position window partitions BY SHARD (n_shards-way parallel), and the
    tier is a ROW-LOCAL width bucket, never a global quantile pass (an
    ntile() here would funnel the corpus through one partition).
    Deterministic end-to-end, so the whole schedule value-hash-gates
    (`workload/text.py:DOC_CURRICULUM_ORDER_SQL`)."""
    # clamp BOTH ends: scores are [0, 1] from the quality model, but the
    # operator is generic — a negative score must not mint tier n_buckets.
    # NULL scores coalesce to 0.0 first: least/greatest skip nulls, so an
    # unguarded NULL would resolve to bucket n_buckets-1 = the BEST tier
    # under high_first; unscored rows must land in the worst tier instead
    score = F.coalesce(F.col(score_col).cast("double"), F.lit(0.0))
    b = F.greatest(
        F.lit(0),
        F.least(
            F.lit(n_buckets - 1),
            F.floor(score * n_buckets).cast("int"),
        ),
    )
    tier = (F.lit(n_buckets - 1) - b) if high_first else b
    reps = repeats if isinstance(repeats, Column) else F.lit(int(repeats))
    reps = F.greatest(F.lit(1).cast("long"), reps.cast("long"))
    out = df.select(
        id_col, *(keep_cols or []), score_col,
        tier.cast("int").alias("tier"),
        F.explode(F.sequence(F.lit(0).cast("long"), reps - 1)).alias("rep"),
    )
    key = F.md5(
        F.concat_ws(":", F.lit(seed), F.col("rep"), F.col(id_col))
    )
    out = out.withColumn("_key", key).withColumn(
        "shard",
        (F.conv(F.substring(F.col("_key"), 1, 8), 16, 10).cast("long")
         % F.lit(n_shards)).cast("int"),
    )
    w = Window.partitionBy("shard").orderBy(
        F.asc("tier"), F.asc("_key"), F.asc(id_col), F.asc("rep")
    )
    return (
        out.withColumn("shard_pos", F.row_number().over(w))
        .select(id_col, *(keep_cols or []), score_col, "tier", "rep",
                "shard", "shard_pos")
    )


def write_training_shards(
    ordered: DataFrame, path: str, n_shards: int, mode: str = "overwrite"
) -> None:
    """Materialize a :func:`training_order` assignment as the physical
    layout a data loader consumes: ``path/shard=K/`` directories, each
    holding ONE parquet file whose row order IS the shard's
    ``shard_pos`` order (parquet preserves write order; loaders read
    sequentially, no sort at read time).

    ``repartition(n_shards, shard)`` routes each shard to one task and
    ``sortWithinPartitions`` fixes the in-file order — hash collisions may
    co-locate two shards in one task, but ``partitionBy`` still splits
    them into separate directories and the (shard, shard_pos) sort keeps
    each directory's file internally ordered. One shuffle total, no
    global sort, no driver collect — at 100 TB pick n_shards ~ the write
    parallelism you want (thousands), exactly the training_order contract.

    ``mode="append"`` adds the batch as NEW files inside the existing
    ``shard=K`` directories — prior batches' files are never rewritten
    (the incremental-curate contract; callers offset ``shard_pos`` past
    the per-shard max so the global order stays addressable).
    """
    (
        ordered.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "shard_pos")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )

"""Distributed global ranking.

A naive global rank — ``rank().over(Window.orderBy(...))`` with no
partitionBy — forces every row through ONE partition (Spark plans an
``Exchange SinglePartition`` + single-task sort): a driver-killer at scale.

``global_row_number`` computes the identical total-order row number with:

1. **deterministic range boundaries**: a bounded sample of sort keys
   (TakeOrdered by xxhash64 — fixed result for fixed data, never more than
   ``num_partitions * sample_per_part`` rows on the driver, same pattern as
   the IVF trainer in operators/similarity.py) cut into ``num_partitions``
   quantile fences;
2. each row's partition id derived **from its own key** by comparing the
   sort-key struct against the literal fences (lexicographic struct
   comparison, whole-stage codegen — no UDF);
3. per-partition ``row_number`` (hash shuffle on the derived pid), plus
   cumulative partition offsets from the tiny per-partition counts via a
   broadcast self-join (≤ num_partitions rows — no SinglePartition exchange
   anywhere in the plan).

Why not ``repartitionByRange`` + ``spark_partition_id()``? That expression
is *nondeterministic*: when the ranked output is consumed by two branches
of one plan (e.g. nesting two ranks for Spearman), exchange reuse is not
guaranteed, the branches can observe different partition ids, and the
offsets silently misalign (observed live: 9k/10k wrong ranks). Deriving the
pid from the row's own key makes the whole plan a pure function of the data.

With a unique tiebreak column in ``order_cols`` this equals SQL
``rank()``/``row_number()`` over the same ORDER BY (no ties ⇒ identical).
Rows with NULL in any sort column must be filtered by the caller first —
engines disagree on NULL placement. NaN follows Spark comparison semantics
(greater than every number), matching its sort order.

Reference parity: the reference computes Spearman ranks with a single-node
pandas sort (`src/lakehouse/quality/metrics/diagnostics.py`); this is the
multi-executor equivalent.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _key_struct(df: DataFrame, order_cols: list[str]) -> F.Column:
    return F.struct(*[F.col(c) for c in order_cols])


def _lit_key(df: DataFrame, order_cols: list[str], row) -> F.Column:
    """Literal struct matching the source column types exactly (struct
    comparison requires identical field types)."""
    dtypes = dict(zip([f.name for f in df.schema.fields], df.schema.fields))
    fields = []
    for c in order_cols:
        fields.append(
            F.lit(row[c]).cast(dtypes[c].dataType).alias(c)
        )
    return F.struct(*fields)


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    num_partitions: int | None = None,
    sample_per_part: int = 200,
) -> DataFrame:
    """Total-order row number (1-based) over ``order_cols``, distributed.

    ``order_cols`` should end in a unique tiebreak so the total order is
    well-defined; then the result matches ``row_number() OVER (ORDER BY
    ...)`` and, absent ties, ``rank()`` too.
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    # 1. deterministic bounded key sample -> quantile fences on the driver
    sample = (
        df.select(*order_cols)
        .orderBy(F.xxhash64(*order_cols), *order_cols)
        .limit(n * sample_per_part)
        .collect()
    )
    sample.sort(key=lambda r: tuple(r[c] for c in order_cols))
    cuts = []
    if len(sample) > 1:
        step = max(1, len(sample) // n)
        seen = set()
        for i in range(step, len(sample), step):
            key = tuple(sample[i][c] for c in order_cols)
            if key not in seen:
                seen.add(key)
                cuts.append(sample[i])

    # 2. pid = number of fences <= my key (codegen'd struct comparisons)
    key = _key_struct(df, order_cols)
    pid = F.lit(0)
    for cut in cuts:
        pid = pid + F.when(key >= _lit_key(df, order_cols, cut), 1).otherwise(0)
    local = df.withColumn("_pid", pid).withColumn(
        "_lrn",
        F.row_number().over(Window.partitionBy("_pid").orderBy(*order_cols)),
    )

    # 3. cumulative offsets WITHOUT a single-partition window: broadcast
    # self-join over <= n+1 tiny rows
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    lo = counts.select(
        F.col("_pid").alias("_lo_pid"), F.col("_cnt").alias("_lo_cnt")
    )
    off = (
        counts.join(F.broadcast(lo), F.col("_lo_pid") < F.col("_pid"), "left_outer")
        .groupBy("_pid")
        .agg(F.coalesce(F.sum("_lo_cnt"), F.lit(0)).alias("_off"))
    )
    return (
        local.join(F.broadcast(off), "_pid")
        .withColumn(out_col, F.col("_lrn") + F.col("_off"))
        .drop("_pid", "_lrn", "_off")
    )

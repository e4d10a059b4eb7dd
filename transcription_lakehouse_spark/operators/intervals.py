"""Interval algebra operators (W3-W6).

Re-expresses the reference's coverage engine
(`/root/reference/src/lakehouse/quality/metrics/coverage.py`):

- W3 interval union (`coverage.py:19-80`): merge overlapping/adjacent
  intervals so coverage never double-counts — lag/running-max → island id →
  groupBy island.
- W4 gap detection (`coverage.py:282-372`): lead() over the same window.
- W5 overlap sweep line (`coverage.py:374-438`): explode each interval into
  ±1 events, running sum = concurrency.
- W6 monotonicity check (`/root/reference/src/lakehouse/quality/metrics/
  integrity.py:26-151`): lead(start) < end ⇒ regression.

All four are single-shuffle window compositions — O(n log n) per partition
key, no UDFs, codegen-friendly, and safe at 100 TB as long as no single
partition key is pathological (callers partition by episode/user).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = ["union_islands", "merged_intervals", "gaps", "sweep_concurrency", "monotonicity_violations"]


def union_islands(
    df: DataFrame,
    partition_cols: Sequence[str],
    start_col: str,
    end_col: str,
    island_col: str = "island_id",
) -> DataFrame:
    """Tag each row with the id of its overlap-island.

    Two intervals belong to one island when ``start <= max(end of all previous
    rows)`` under (start, end) ordering; adjacent (touching) intervals merge,
    matching the reference's ``coverage.py:47-56``.
    """
    order = Window.partitionBy(*partition_cols).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = (
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end)
    ).cast("long")
    running = Window.partitionBy(*partition_cols).orderBy(
        start_col, end_col
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(island_col, F.sum(new_island).over(running))


def merged_intervals(
    df: DataFrame,
    partition_cols: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """W3: the merged (unioned) intervals, one row per island."""
    tagged = union_islands(df, partition_cols, start_col, end_col)
    return tagged.groupBy(*partition_cols, "island_id").agg(
        F.min(start_col).alias(start_col),
        F.max(end_col).alias(end_col),
        F.count(F.lit(1)).alias("n_merged"),
    )


def gaps(
    df: DataFrame,
    partition_cols: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """W4: rows (partition, gap_start, gap_end) for every hole between merged
    intervals (interior gaps only; episode-edge gaps need the episode bounds
    and are handled by the caller via a join)."""
    merged = merged_intervals(df, partition_cols, start_col, end_col)
    w = Window.partitionBy(*partition_cols).orderBy(start_col)
    nxt = F.lead(start_col).over(w)
    return (
        merged.withColumn("gap_start", F.col(end_col))
        .withColumn("gap_end", nxt)
        .filter(F.col("gap_end") > F.col("gap_start"))
        .select(*partition_cols, "gap_start", "gap_end")
    )


def sweep_concurrency(
    df: DataFrame,
    partition_cols: Sequence[str],
    start_col: str,
    end_col: str,
    time_col: str = "t",
    active_col: str = "active",
) -> DataFrame:
    """W5 sweep line: one row per boundary event with the running count of
    active intervals AFTER the event. Half-open [start, end): an interval
    ending exactly where another starts does not overlap it (ends sort first).
    """
    events = df.select(
        *partition_cols, F.col(start_col).alias(time_col), F.lit(1).alias("delta")
    ).unionByName(
        df.select(
            *partition_cols, F.col(end_col).alias(time_col), F.lit(-1).alias("delta")
        )
    )
    running = Window.partitionBy(*partition_cols).orderBy(
        time_col, "delta"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn(active_col, F.sum("delta").over(running))


def monotonicity_violations(
    df: DataFrame,
    partition_cols: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """W6: per partition, count rows whose end exceeds the next row's start
    (timestamp regression after sorting)."""
    w = Window.partitionBy(*partition_cols).orderBy(start_col, end_col)
    nxt = F.lead(start_col).over(w)
    viol = (nxt.isNotNull() & (F.col(end_col) > nxt)).cast("long")
    return (
        df.withColumn("_viol", viol)
        .groupBy(*partition_cols)
        .agg(F.sum("_viol").alias("n_regressions"), F.count(F.lit(1)).alias("n_rows"))
    )

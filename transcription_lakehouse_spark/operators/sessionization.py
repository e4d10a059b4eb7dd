"""Sessionization — the reference's span-segmentation operator (W2).

Reference semantics (`/root/reference/src/lakehouse/aggregation/spans.py:113-249`):
within each partition (episode), sorted by time, start a new session whenever
the grouping key changes or the gap to the previous row exceeds a threshold;
then aggregate each session into one parent row.

Spark shape: lag → break-flag → running-sum session id → groupBy. This is the
scalable idiom: one shuffle on the partition key, O(n log n) per partition,
no driver-side loops, and whole-stage-codegen friendly (no UDFs).

At 100 TB the only skew risk is a single giant partition key; the reference
bounds that with duration guardrails (F4) and so do we — sessions are capped
by downstream filters, and the window itself is a single pass.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

__all__ = ["with_session_id", "sessionize"]


def with_session_id(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str | Column,
    gap: Column | float | int,
    prev_end_col: str | Column | None = None,
    break_on_change: Sequence[str] = (),
    tiebreak_cols: Sequence[str] = (),
    session_col: str = "session_id",
) -> DataFrame:
    """Add a 0-based ``session_col`` within each partition.

    A new session starts when
    ``order_col - lag(prev_end_col or order_col) > gap`` or when any column in
    ``break_on_change`` differs from the previous row.  ``order_col`` must be
    numeric (e.g. epoch micros or float seconds) so the gap arithmetic is
    engine-portable.
    """
    order = F.col(order_col) if isinstance(order_col, str) else order_col
    prev_src = prev_end_col if prev_end_col is not None else order
    prev_src = F.col(prev_src) if isinstance(prev_src, str) else prev_src
    gap = F.lit(gap) if not isinstance(gap, Column) else gap

    w = Window.partitionBy(*partition_cols).orderBy(
        order, *[F.col(c) for c in tiebreak_cols]
    )
    prev_end = F.lag(prev_src).over(w)
    is_break = prev_end.isNull() | ((order - prev_end) > gap)
    for c in break_on_change:
        is_break = is_break | (F.col(c) != F.lag(F.col(c)).over(w))
    running = Window.partitionBy(*partition_cols).orderBy(
        order, *[F.col(c) for c in tiebreak_cols]
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        session_col, F.sum(is_break.cast("long")).over(running) - F.lit(1)
    )


def sessionize(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str,
    gap: float | int,
    agg_exprs: Sequence[Column],
    break_on_change: Sequence[str] = (),
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Full W2: assign session ids then collapse each session via ``agg_exprs``."""
    with_ids = with_session_id(
        df,
        partition_cols,
        order_col,
        gap,
        break_on_change=break_on_change,
        tiebreak_cols=tiebreak_cols,
    )
    return with_ids.groupBy(*partition_cols, "session_id").agg(*agg_exprs)

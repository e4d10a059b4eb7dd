"""Interval-overlap range join — equi-join-shaped, never a nested loop.

Spark has no native range join: a join whose only condition is
``a.start < b.end AND b.start < a.end`` plans as BroadcastNestedLoopJoin
(O(n·m) comparisons). The scalable shape is **binning**: each interval
explodes to the fixed-width bins it spans, both sides equi-join on
(keys…, bin) — only intervals sharing a bin ever meet — and the exact
overlap predicate filters the bin-collisions.

De-duplication is free: a pair spanning several shared bins is emitted only
from its *anchor* bin — the bin containing max(start_l, start_r), a point
that lies in both intervals whenever they overlap (half-open semantics), so
exactly one bin passes the anchor filter. No ``distinct`` shuffle.

Cost: |rows| × (interval_len / bin_width) exploded rows and one equi-join
shuffle. Pick ``bin_width_us`` near the upper-quantile interval length —
too small explodes rows, too large degrades to per-key all-pairs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["interval_overlap_join"]


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width_us: int = 64_000_000,
) -> DataFrame:
    """Join half-open intervals [l_start, l_end) × [r_start, r_end) sharing
    the ``on`` keys, keeping pairs with a non-empty overlap. Returns the
    concatenated columns (start/end column names must not collide).

    Timestamps must be non-negative (integer ``div`` binning truncates
    toward zero). Empty intervals (end <= start) never match.
    """
    w = int(bin_width_us)
    lb = left.filter(F.col(l_end) > F.col(l_start)).withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"{l_start} div {w}"), F.expr(f"({l_end} - 1) div {w}")
            )
        ),
    )
    rb = right.filter(F.col(r_end) > F.col(r_start)).withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"{r_start} div {w}"), F.expr(f"({r_end} - 1) div {w}")
            )
        ),
    )
    anchor = F.expr(f"greatest({l_start}, {r_start}) div {w}")
    return (
        lb.join(rb, [*on, "_bin"])
        .filter(
            (F.col(l_start) < F.col(r_end))
            & (F.col(r_start) < F.col(l_end))
            & (F.col("_bin") == anchor)
        )
        .drop("_bin")
    )

"""As-of (backward temporal) join — an operator family Spark lacks natively
(pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics): each left row is
matched to the single right row with the greatest ``right_ts <= left_ts``
within the same key, or NULL if none exists.

The reference engine has no as-of join either; it belongs to the
training-data/feature-pipeline toolbox (point-in-time-correct feature
lookup, "last state before event").

Scale design: expressed as the classic union + keyed window + ``last(...,
ignorenulls=True)`` running carry — ONE shuffle on the join key, no range
explosion, no per-row Python. Equal timestamps on both sides resolve
right-before-left (i.e. a right row AT the left timestamp matches, the
``>=`` convention), and ties among right rows at the same instant resolve
by the window's (ts, tag) sort plus whatever deterministic pre-dedup the
caller applies — pre-aggregate the right side to one row per (key, ts) for
a fully deterministic result (the oracle query does).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    tolerance: int | float | None = None,
) -> DataFrame:
    """Backward as-of left join.

    ``left`` keeps every row and all its columns; the matched right row
    contributes its non-key columns (names must not collide with left's —
    rename before calling). ``tolerance`` (same unit as the ts columns)
    nulls out matches older than ``left_ts - tolerance``.
    """
    lcols = [c for c in left.columns if c not in on]
    rcols = [c for c in right.columns if c not in on]
    clash = set(lcols) & set(rcols)
    if clash:
        raise ValueError(f"column collision between sides: {sorted(clash)}")

    l_t = left.select(
        *on,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_tag"),
        F.struct(*lcols).alias("_l"),
    )
    r_t = right.select(
        *on,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_tag"),
        F.struct(*rcols).alias("_r"),
    )
    u = l_t.withColumn(
        "_r", F.lit(None).cast(r_t.schema["_r"].dataType)
    ).unionByName(r_t.withColumn("_l", F.lit(None).cast(l_t.schema["_l"].dataType)))

    w = (
        Window.partitionBy(*on)
        .orderBy("_ats", "_tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )
    out = matched.select(
        *on,
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        *[F.col(f"_m.{c}").alias(c) for c in rcols],
    )
    if tolerance is not None:
        # evaluate staleness ONCE before any column is nulled (the loop
        # below rewrites right_ts itself)
        out = out.withColumn(
            "_stale",
            F.col(right_ts).isNull()
            | (F.col(left_ts) - F.col(right_ts) > F.lit(tolerance)),
        )
        for c in rcols:
            out = out.withColumn(
                c, F.when(F.col("_stale"), F.lit(None)).otherwise(F.col(c))
            )
        out = out.drop("_stale")
    return out

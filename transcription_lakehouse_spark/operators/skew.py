"""Skew mitigation: salted two-phase aggregation.

At 100 TB a single hot key (one viral user, one giant episode) turns a
groupBy into a straggler task. Salting splits each key into ``n_salts``
partial groups (map-side spread), aggregates partials, then merges — the
classic two-phase pattern, expressed so the final result is EXACTLY equal to
the unsalted aggregation (the oracle query proves it).

AQE's skew-join splitting handles join-side skew automatically
(session.py enables it); this covers aggregation-side skew, which AQE does
not rebalance.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

__all__ = ["salted_agg", "key_skew_stats"]

# merge rules for re-aggregating partials: partial alias -> final expr
_MERGEABLE = {"sum", "count", "min", "max"}


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Exact groupBy-agg with salt-spread partials.

    aggs: output_name -> (kind, input_col) with kind in {sum, count, min,
    max, avg}. avg is decomposed into sum+count so the merge stays exact.
    ``salt_source`` defaults to a deterministic per-row hash (so results are
    reproducible); pass e.g. a monotonically increasing id for finer spread.
    """
    # pmod, not abs(hash)%n: abs(Int.MinValue) overflows (ANSI error at
    # 100 TB row counts) and % keeps negative remainders
    salt = (
        salt_source
        if salt_source is not None
        else F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    partial_exprs = []
    final_exprs = []
    for name, (kind, col) in aggs.items():
        if kind not in _MERGEABLE and kind != "avg":
            raise ValueError(f"unsupported salted agg kind: {kind}")
        if kind == "avg":
            partial_exprs += [
                F.sum(col).alias(f"_{name}__sum"),
                F.count(col).alias(f"_{name}__cnt"),
            ]
            final_exprs.append(
                (F.sum(f"_{name}__sum") / F.sum(f"_{name}__cnt")).alias(name)
            )
        elif kind == "count":
            partial_exprs.append(F.count(col).alias(f"_{name}"))
            final_exprs.append(F.sum(f"_{name}").alias(name))
        else:
            partial_exprs.append(getattr(F, kind)(col).alias(f"_{name}"))
            merge = F.sum if kind == "sum" else getattr(F, kind)
            final_exprs.append(merge(f"_{name}").alias(name))
    partial = df.withColumn("_salt", salt).groupBy(*group_cols, "_salt").agg(
        *partial_exprs
    )
    return partial.groupBy(*group_cols).agg(*final_exprs)


def key_skew_stats(
    df: DataFrame,
    key_cols: Sequence[str],
    top_n: int = 10,
) -> DataFrame:
    """Skew DIAGNOSIS — the decision input for `salted_agg` / AQE tuning:
    per hot key its row share, plus the distribution scalars that tell you
    whether a shuffle on this key will straggle (max-key share vs the
    1/shuffle-partitions ideal). One map-side-combined groupBy over the
    keys + a TakeOrdered top-N; the per-key relation never collects.

    Returns top_n rows: (key..., n_rows, share, cum_share) ordered by
    n_rows desc — `share` > a few percent on a 1000-partition cluster
    means the key owns entire tasks and needs salting."""
    per = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    # total rows == Σ per-key counts, but summing `per` would run the
    # keyed groupBy SHUFFLE twice (no exchange reuse — verified in the
    # plan); a plain count over the source is map-side only
    total = df.agg(F.count(F.lit(1)).cast("double").alias("_t"))  # 1 row
    top = per.orderBy(F.desc("n_rows"), *key_cols).limit(top_n)
    w = (
        Window.orderBy(F.desc("n_rows"), *key_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # the window and the broadcast total both act on the top_n-row
    # relation only — bounded, never a global sort or a driver collect
    return top.crossJoin(F.broadcast(total)).select(
        *key_cols,
        "n_rows",
        F.round(F.col("n_rows") / F.col("_t"), 6).alias("share"),
        F.round(F.sum("n_rows").over(w) / F.col("_t"), 6).alias("cum_share"),
    )

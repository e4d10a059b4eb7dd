"""Sampling operators (SA1-SA4) — seeded, reproducible (reference fixes
seed 42 everywhere, `/root/reference/src/lakehouse/quality/thresholds.py:82`).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = ["stratified_sample", "random_pairs", "seeded_sample", "weighted_sample"]

DEFAULT_SEED = 42


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_total: int,
    seed: int = DEFAULT_SEED,
    id_col: str | None = None,
) -> DataFrame:
    """SA1: proportional allocation per stratum with a >= 1-per-stratum
    guarantee (`quality/metrics/embedding.py:186-307`).

    Implementation: shuffle within stratum by a seeded key, rank, and keep
    rank <= allocation where allocation = max(1, round(n_total * stratum_n /
    total)). One window pass — no driver loop, scales to any stratum count.

    Pass ``id_col`` (any unique column) to order by sha2(id|seed) — a pure
    function of the DATA, so the sample is identical under any partitioning
    or cluster size. Without it the order falls back to ``rand(seed)``,
    which is seeded per PARTITION: same-session reruns agree, but a
    different input partitioning silently yields a different sample — fine
    for ad-hoc use, not for the idempotent-replay contract.
    """
    counts = df.groupBy(*strata_cols).agg(F.count(F.lit(1)).alias("_stratum_n"))
    total = df.count() or 1
    with_alloc = counts.withColumn(
        "_alloc",
        F.greatest(
            F.lit(1),
            F.round(F.col("_stratum_n") * F.lit(n_total) / F.lit(total)).cast("long"),
        ),
    )
    order = (
        F.sha2(F.concat_ws("|", F.col(id_col), F.lit(str(seed))), 256)
        if id_col is not None
        else F.rand(seed)
    )
    w = Window.partitionBy(*strata_cols).orderBy(order)
    ranked = df.join(F.broadcast(with_alloc), strata_cols).withColumn(
        "_rk", F.row_number().over(w)
    )
    return ranked.filter(F.col("_rk") <= F.col("_alloc")).drop(
        "_stratum_n", "_alloc", "_rk"
    )


def seeded_sample(
    df: DataFrame, n: int, seed: int = DEFAULT_SEED, id_col: str | None = None
) -> DataFrame:
    """SA3: deterministic n-row sample. With ``id_col`` the order key is
    sha2(id|seed) — partitioning-invariant (rand(seed) is only
    rerun-stable). Plans as TakeOrdered either way: per-partition top-n,
    no global sort."""
    order = (
        F.sha2(F.concat_ws("|", F.col(id_col), F.lit(str(seed))), 256)
        if id_col is not None
        else F.rand(seed)
    )
    return df.orderBy(order).limit(n)


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES,
    public algorithm): each row draws u ~ U(0,1) and the n largest
    ``u^(1/w)`` win — inclusion probability proportional to weight.

    u derives from sha256(id|seed) — a pure function of the data, so the
    sample is identical under any partitioning AND reproducible in the
    DuckDB oracle. Rows with weight <= 0 are excluded (zero mass).

    Scale: the order key is a narrow per-row expression and
    ``orderBy().limit(n)`` plans as TakeOrdered (per-partition top-n merged
    on the driver) — no global sort, no single-partition window.
    """
    u = (
        F.conv(
            F.substring(
                F.sha2(F.concat_ws("|", F.col(id_col), F.lit(str(seed))), 256), 1, 15
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(2**60))
    )
    key = F.pow(u, F.lit(1.0) / F.col(weight_col))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_aes_key", key)
        .orderBy(F.desc("_aes_key"), F.col(id_col))
        .limit(n)
        .drop("_aes_key")
    )


def random_pairs(
    df: DataFrame, id_col: str, n_pairs: int, seed: int = DEFAULT_SEED
) -> DataFrame:
    """SA2: n random distinct (id_1, id_2) pairs.

    Each side is shuffled by a seeded content hash (sha2 of id+seed) —
    fully deterministic, and the two orderings are independent so zipping
    by position yields genuinely random pairings (ordering both sides by
    id would pair every row with itself)."""

    def _shuffled(alias: str, s: int) -> DataFrame:
        order = F.sha2(F.concat_ws("|", F.col(alias), F.lit(str(s))), 256)
        # orderBy().limit() plans as TakeOrderedAndProject: per-partition
        # top-k merged on the driver — the full table never collapses into
        # one partition. Only the <= n_pairs survivors see a global window.
        top = df.select(F.col(id_col).alias(alias), order.alias("_ord")).orderBy(
            "_ord"
        ).limit(n_pairs)
        return top.withColumn(
            "_i", F.row_number().over(Window.orderBy("_ord"))
        ).drop("_ord")

    return (
        _shuffled("id_1", seed)
        .join(_shuffled("id_2", seed + 1), "_i")
        .filter(F.col("id_1") != F.col("id_2"))
        .drop("_i")
    )

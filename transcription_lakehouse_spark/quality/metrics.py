"""Quality metric batteries A-E (SURVEY §2.4): each function returns a small
DataFrame (or scalar dict) of metrics, all pure DataFrame aggregations.

Reference: `/root/reference/src/lakehouse/quality/metrics/` — pandas loops
there, single-shuffle window/agg compositions here.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.text import content_tokens, punct_ratio, token_count
from ..operators.intervals import merged_intervals, sweep_concurrency
from ..operators.dedup import fingerprint

__all__ = [
    "coverage_metrics",
    "duration_stats",
    "length_compliance",
    "duration_histogram",
    "speaker_balance",
    "series_balance",
    "text_metrics",
    "integrity_counts",
    "duplicate_groups",
    "numeric_anomalies",
    "timestamp_regressions",
]


# --- Category A: coverage (`quality/metrics/coverage.py`) -------------------


def coverage_metrics(segments: DataFrame, episodes: DataFrame) -> DataFrame:
    """A19/W3: per-episode union-coverage % (capped at 100 — the reference's
    non-standard semantic, `coverage.py:157,233`), gap and overlap counts.

    episodes: (episode_id, duration_seconds).
    """
    merged = merged_intervals(segments, ["episode_id"], "start_time", "end_time")
    per_ep = merged.groupBy("episode_id").agg(
        F.sum(F.col("end_time") - F.col("start_time")).alias("covered_seconds"),
        F.count(F.lit(1)).alias("n_islands"),
    )
    swept = sweep_concurrency(segments, ["episode_id"], "start_time", "end_time")
    overlaps = swept.groupBy("episode_id").agg(
        F.max("active").alias("max_concurrency"),
        F.sum((F.col("active") >= 2).cast("long")).alias("n_overlap_points"),
    )
    out = (
        episodes.select("episode_id", "duration_seconds")
        .join(per_ep, "episode_id", "left")
        .join(overlaps, "episode_id", "left")
        .fillna(0, ["covered_seconds", "n_islands", "n_overlap_points"])
    )
    # guard the division: null/zero episode duration must read as 0 coverage
    # (a violation), not 100% — F.least skips nulls, and /0 raises under
    # Spark 4's default ANSI mode
    return out.withColumn(
        "coverage_pct",
        F.when(
            F.col("duration_seconds") > 0,
            F.least(
                F.lit(100.0),
                F.round(
                    F.col("covered_seconds") * 100.0 / F.col("duration_seconds"), 2
                ),
            ),
        ).otherwise(F.lit(0.0)),
    )


# --- Category B: distribution (`quality/metrics/distribution.py`) -----------


def duration_stats(segments: DataFrame, group_col: str | None = None) -> DataFrame:
    """A7: min/max/mean/median/p5/p95/std of segment duration."""
    g = segments.groupBy(group_col) if group_col else segments.groupBy()
    return g.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("duration"), 6).alias("min_duration"),
        F.round(F.max("duration"), 6).alias("max_duration"),
        F.round(F.avg("duration"), 6).alias("mean_duration"),
        F.round(F.percentile("duration", F.lit(0.05)), 6).alias("p5_duration"),
        F.round(F.percentile("duration", F.lit(0.5)), 6).alias("median_duration"),
        F.round(F.percentile("duration", F.lit(0.95)), 6).alias("p95_duration"),
        F.round(F.stddev("duration"), 6).alias("std_duration"),
    )


def length_compliance(
    segments: DataFrame, lo: float, hi: float
) -> dict[str, float]:
    """A8: % within [lo,hi] / too short / too long, forced to sum to 100
    (`distribution.py:192-197`)."""
    row = segments.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("duration") < lo).cast("long")).alias("short"),
        F.sum((F.col("duration") > hi).cast("long")).alias("long"),
    ).collect()[0]
    n = row["n"] or 1
    pct_short = round(row["short"] * 100.0 / n, 2)
    pct_long = round(row["long"] * 100.0 / n, 2)
    return {
        "pct_in_range": round(100.0 - pct_short - pct_long, 2),
        "pct_too_short": pct_short,
        "pct_too_long": pct_long,
    }


def duration_histogram(segments: DataFrame, edges: list[float]) -> DataFrame:
    """A9: fixed custom bin edges -> counts + percents."""
    conds = F.when(F.col("duration") < edges[0], F.lit(0))
    for i in range(1, len(edges)):
        conds = conds.when(F.col("duration") < edges[i], F.lit(i))
    bins = segments.withColumn("bin", conds.otherwise(F.lit(len(edges))))
    total = segments.count() or 1
    return (
        bins.groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("pct", F.round(F.col("n") * 100.0 / F.lit(total), 2))
        .orderBy("bin")
    )


# --- Category D: balance (`quality/metrics/balance.py`) ---------------------


def speaker_balance(segments: DataFrame, top_n: int = 10) -> DataFrame:
    """A10: per-speaker share + top-N flag with long-tail rollup."""
    speaker = (
        F.coalesce("speaker_canonical", "speaker")
        if "speaker_canonical" in segments.columns
        else F.col("speaker")
    )
    per = segments.groupBy(speaker.alias("speaker")).agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.round(F.sum("duration"), 6).alias("total_duration"),
    )
    # global windows here run over the per-SPEAKER aggregate (cardinality =
    # #speakers, bounded), never the row table — safe at any corpus size
    w = Window.orderBy(F.desc("total_duration"), F.asc("speaker"))
    ranked = per.withColumn("rank", F.row_number().over(w))
    total = F.sum("total_duration").over(Window.partitionBy())
    return ranked.withColumn(
        "pct_duration", F.round(F.col("total_duration") * 100.0 / total, 2)
    ).withColumn("in_top_n", F.col("rank") <= top_n)


def series_balance(segments: DataFrame, episodes: DataFrame) -> DataFrame:
    """A11/J3: per-series episode/segment counts + largest/smallest ratio."""
    joined = segments.join(
        F.broadcast(episodes.select("episode_id", "series")), "episode_id", "left"
    )
    per = joined.groupBy("series").agg(
        F.countDistinct("episode_id").alias("n_episodes"),
        F.count(F.lit(1)).alias("n_segments"),
    )
    mx = F.max("n_segments").over(Window.partitionBy())
    mn = F.min("n_segments").over(Window.partitionBy())
    return per.withColumn("imbalance_ratio", F.round(mx / mn, 4))


# --- Category E: text quality (`quality/metrics/text_quality.py`) -----------


def text_metrics(segments: DataFrame, group_col: str | None = None) -> DataFrame:
    """A12-A14: token/char counts, lexical density, punctuation ratio."""
    base = segments.select(
        *( [group_col] if group_col else [] ),
        token_count("text").alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.size(content_tokens("text")).alias("n_content"),
        punct_ratio("text").alias("punct"),
    )
    g = base.groupBy(group_col) if group_col else base.groupBy()
    return g.agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.sum("n_content") / F.sum("n_tokens"), 6).alias("lexical_density"),
        F.round(F.avg("punct"), 6).alias("avg_punct_ratio"),
    )


# --- Category C: integrity (`quality/metrics/integrity.py`) -----------------


def integrity_battery(segments: DataFrame) -> DataFrame:
    """A17: violation-count battery as ONE conditional aggregation pass
    (single scan regardless of how many checks ride it)."""
    return segments.agg(
        F.sum((F.col("duration") < 0).cast("long")).alias("negative_duration"),
        F.sum((F.col("duration") == 0).cast("long")).alias("zero_duration"),
        F.sum(
            (F.col("episode_id").isNull() | (F.trim("episode_id") == "")).cast("long")
        ).alias("missing_episode_id"),
        F.sum(
            (F.col("speaker").isNull() | (F.trim("speaker") == "")).cast("long")
        ).alias("missing_speaker"),
        F.sum((F.col("text").isNull() | (F.trim("text") == "")).cast("long")).alias(
            "missing_text"
        ),
        F.sum((F.col("start_time") < 0).cast("long")).alias("negative_start"),
    )


def integrity_counts(segments: DataFrame) -> dict[str, int]:
    """Dict view of :func:`integrity_battery` for the assessor."""
    row = integrity_battery(segments).collect()[0]
    return {k: int(row[k] or 0) for k in row.asDict()}


def duplicate_groups(segments: DataFrame) -> DataFrame:
    """A16: exact-dup groups on (normalized text, episode, speaker, 5-min
    time bin) having count > 1 (`integrity.py:459-549`); texts < 10 chars are
    exempt (F7)."""
    eligible = segments.filter(F.length(F.trim("text")) >= 10)
    return (
        eligible.groupBy(
            fingerprint("text").alias("fp"),
            "episode_id",
            "speaker",
            F.floor(F.col("start_time") / 300).alias("time_bin"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .withColumn("n_duplicates", F.col("n") - 1)
    )


def numeric_anomalies(df: DataFrame, columns: list[str] | None = None) -> dict[str, dict[str, int]]:
    """F9: NaN / null / ±Inf counts per numeric column
    (`validation/checks.py:554-607`) in one aggregation pass."""
    numeric = [
        f.name
        for f in df.schema.fields
        if f.dataType.simpleString() in ("double", "float")
        and (columns is None or f.name in columns)
    ]
    if not numeric:
        return {}
    aggs = []
    for c in numeric:
        aggs += [
            F.sum(F.isnan(c).cast("long")).alias(f"{c}__nan"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__null"),
            F.sum(
                (F.abs(F.col(c)) == F.lit(float("inf"))).cast("long")
            ).alias(f"{c}__inf"),
        ]
    row = df.agg(*aggs).collect()[0]
    return {
        c: {
            "nan": int(row[f"{c}__nan"] or 0),
            "null": int(row[f"{c}__null"] or 0),
            "inf": int(row[f"{c}__inf"] or 0),
        }
        for c in numeric
    }


def timestamp_regressions(segments: DataFrame) -> DataFrame:
    """W6 applied per episode and per (episode, speaker)."""
    w1 = Window.partitionBy("episode_id").orderBy("start_time", "end_time")
    w2 = Window.partitionBy("episode_id", "speaker").orderBy(
        "start_time", "end_time"
    )
    v1 = (F.lead("start_time").over(w1).isNotNull() & (
        F.col("end_time") > F.lead("start_time").over(w1))).cast("long")
    v2 = (F.lead("start_time").over(w2).isNotNull() & (
        F.col("end_time") > F.lead("start_time").over(w2))).cast("long")
    return segments.select(
        "episode_id", v1.alias("_v1"), v2.alias("_v2")
    ).groupBy("episode_id").agg(
        F.sum("_v1").alias("episode_regressions"),
        F.sum("_v2").alias("speaker_regressions"),
    )

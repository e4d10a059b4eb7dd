"""Episode catalog (A1/A2) — the reference's first real SQL query
(`/root/reference/src/lakehouse/catalogs/episodes.py:102-174`), re-expressed
as one Spark aggregation (the reference loops per-file and re-concats; Spark
partial aggregation does that in one shuffle)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["episode_catalog"]


def episode_catalog(utterances: DataFrame) -> DataFrame:
    """Per-episode rollup + title/date parsed from
    '{series} - #{num} - {YYYY-MM-DD} - {title}' ids
    (`catalogs/episodes.py:37-80,106-121,148-156`)."""
    agg = utterances.groupBy("episode_id").agg(
        F.min("start").alias("start_time"),
        F.max("end").alias("end_time"),
        F.round(F.max("end") - F.min("start"), 6).alias("duration_seconds"),
        F.count(F.lit(1)).alias("utterance_count"),
        F.countDistinct("speaker").alias("speaker_count"),
        F.concat_ws(", ", F.array_sort(F.collect_set("speaker"))).alias(
            "speaker_list"
        ),
        F.round(F.avg(F.col("end") - F.col("start")), 6).alias(
            "avg_utterance_duration"
        ),
        # full transcript per episode (`episodes.py:106-121` STRING_AGG ...
        # ORDER BY start_time): order-stable via the sorted-struct idiom.
        # Memory note: the concat materializes one episode's text per group —
        # bounded by episode length (same profile as the reference); the
        # collect_list partials still merge map-side, so the shuffle carries
        # each utterance's text once.
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("start", "utterance_id", "text"))
                ),
                lambda s: s["text"],
            ),
        ).alias("full_text"),
    )
    # try_element_at: ids that don't follow the '{series} - #{num} - {date} -
    # {title}' pattern (e.g. filename-stem defaults) yield NULLs, matching the
    # reference's tolerant positional parse (`episodes.py:58-80`)
    parts = F.split(F.col("episode_id"), " - ")
    date_candidate = F.try_element_at(parts, F.lit(3))
    is_date = date_candidate.rlike(r"^\d{4}-\d{2}-\d{2}$")
    return (
        agg.withColumn(
            "duration_minutes", F.round(F.col("duration_seconds") / 60.0, 6)
        )
        .withColumn(
            "title",
            F.when(
                F.size(parts) >= 4, F.try_element_at(parts, F.lit(4))
            ).otherwise(F.col("episode_id")),
        )
        .withColumn("date", F.when(is_date, date_candidate))
        .withColumn(
            "series", F.when(F.size(parts) >= 4, F.try_element_at(parts, F.lit(1)))
        )
    )

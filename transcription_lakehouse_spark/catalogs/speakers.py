"""Speaker catalog (A3/A4) — `/root/reference/src/lakehouse/catalogs/
speakers.py:37-143` as one exact single-pass aggregation.

The reference aggregates per-file then averages the averages
(`speakers.py:97-113`), which is inexact; Spark's shuffle aggregation is the
correct partial→final two-phase and fixes that for free (SURVEY A4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["speaker_catalog"]


def speaker_catalog(utterances: DataFrame) -> DataFrame:
    dur = F.col("end") - F.col("start")
    return utterances.groupBy("speaker").agg(
        F.countDistinct("episode_id").alias("episode_count"),
        F.count(F.lit(1)).alias("utterance_count"),
        F.round(F.sum(dur), 6).alias("total_speaking_time"),
        F.round(F.avg(dur), 6).alias("avg_utterance_duration"),
        F.round(F.min(dur), 6).alias("min_utterance_duration"),
        F.round(F.max(dur), 6).alias("max_utterance_duration"),
        F.concat_ws(", ", F.array_sort(F.collect_set("episode_id"))).alias(
            "episodes"
        ),
        F.round(
            F.count(F.lit(1)) / F.countDistinct("episode_id"), 6
        ).alias("utterances_per_episode"),
    )

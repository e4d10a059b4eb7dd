"""Stream-stream joins (SURVEY §2.11 extension — no reference twin; the
reference is batch-only, README.md:955 roadmap).

The canonical live-pipeline shape: two unbounded sources joined on a key
plus an event-time range. Spark buffers both sides in state; the join is
only sustainable because BOTH streams carry watermarks and the join
condition bounds event-time distance — that pair lets the engine expire
state rows the other side can no longer match (without it, state grows
forever and the job dies at scale, silently OOMing at 100 TB equivalents).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from ..schemas import RAW_UTTERANCE_SCHEMA

__all__ = [
    "ANNOTATION_SCHEMA",
    "streaming_annotation_join",
    "streaming_role_enrichment",
]

# live human/model annotations landing beside the transcript stream:
# a point-in-time label that must attach to the utterance being spoken
ANNOTATION_SCHEMA = StructType(
    [
        StructField("episode_id", StringType(), False),
        StructField("at", DoubleType(), False),
        StructField("label", StringType(), False),
    ]
)


def streaming_annotation_join(
    spark: SparkSession,
    utterance_dir: str,
    annotation_dir: str,
    watermark: str = "10 minutes",
    max_lag_seconds: int = 30,
) -> DataFrame:
    """Inner stream-stream join: each annotation attaches to utterances of
    the same episode that STARTED at or up to ``max_lag_seconds`` before
    the annotation instant (the utterance being spoken, or just finished).

    Both sides are watermarked and the condition bounds `ann_time` to a
    window around `utter_time`, so Spark can drop utterance state older
    than watermark + max_lag and annotation state older than watermark —
    bounded state on an unbounded run. Returns an unstarted streaming
    DataFrame (caller picks sink/trigger)."""
    utter = (
        spark.readStream.schema(RAW_UTTERANCE_SCHEMA)
        .json(utterance_dir)
        .withColumn("utter_time", F.timestamp_seconds("start"))
        .withWatermark("utter_time", watermark)
    )
    ann = (
        spark.readStream.schema(ANNOTATION_SCHEMA)
        .json(annotation_dir)
        .withColumnRenamed("episode_id", "ann_episode_id")
        .withColumn("ann_time", F.timestamp_seconds("at"))
        .withWatermark("ann_time", watermark)
    )
    cond = (
        (F.col("episode_id") == F.col("ann_episode_id"))
        & (F.col("ann_time") >= F.col("utter_time"))
        & (
            F.col("ann_time")
            <= F.col("utter_time") + F.expr(f"INTERVAL {max_lag_seconds} SECONDS")
        )
    )
    return utter.join(ann, cond, "inner").select(
        "episode_id",
        "speaker",
        "start",
        "end",
        "text",
        "label",
        "at",
        (F.col("at") - F.col("start")).alias("lag_seconds"),
    )


def streaming_role_enrichment(
    spark: SparkSession,
    utterance_dir: str,
    config,
) -> DataFrame:
    """Stream-STATIC join: the live utterance stream enriched against the
    speaker-role config table (J4's streaming twin). The static side is
    broadcast once per micro-batch — no state, no watermark needed; this
    is the cheapest streaming join and the first choice whenever one side
    is a slowly-changing dimension. ``config`` is a
    ``speaker_roles.SpeakerRoleConfig``. Returns an unstarted streaming
    DataFrame.

    The enrichment itself IS the batch operator — ``enrich_spans`` is pure
    lazy column algebra, so the same function serves both engines and the
    two paths cannot drift."""
    from ..speaker_roles import enrich_spans

    raw = spark.readStream.schema(RAW_UTTERANCE_SCHEMA).json(utterance_dir)
    return enrich_spans(raw, config, spark)

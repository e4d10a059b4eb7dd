"""Transcript readers (S1-S5) — Spark-native replacements for the
reference's ``TranscriptReader`` (`/root/reference/src/lakehouse/ingestion/
reader.py`).

Three accepted shapes (`reader.py:89-158`):
1. JSONL — one utterance object per line (malformed lines skipped);
2. JSON array of utterances, or ``{"utterances": [...]}`` wrapper;
3. single JSON object.

Spark mapping: ``spark.read.json`` is natively JSONL; PERMISSIVE mode +
``_corrupt_record`` gives the skip-malformed behavior. The array/wrapper
shapes use multiLine mode and an explode over a coalesced union of shapes.
``input_file_name()`` supplies the per-file episode-id default
(`reader.py:273-300`).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..schemas import RAW_UTTERANCE_SCHEMA

__all__ = ["read_jsonl", "read_json_any", "with_default_episode_id"]

_CORRUPT = "_corrupt_record"


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S1/S4: line-delimited JSON; malformed lines are dropped (the
    reference logs-and-skips, `reader.py:143-152`).

    Implemented as text-scan + from_json rather than spark.read.json with a
    top-level _corrupt_record filter: Spark disallows queries whose pruned
    schema is only the corrupt column (e.g. a bare count()), and a corrupt
    column INSIDE the from_json struct gives the same skip semantics without
    that trap. Type-mismatched lines (valid JSON, e.g. a string where a
    number belongs) populate the corrupt column and are dropped, same as the
    reference; lines merely MISSING fields parse clean and flow to the
    validation layer (F1-F3), which reports them with reasons.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    # fresh StructType: .add() mutates the shared schema object
    schema = StructType(
        list(RAW_UTTERANCE_SCHEMA.fields) + [StructField(_CORRUPT, StringType())]
    )
    lines = (
        spark.read.text(path)
        .withColumn("source_file", F.input_file_name())
        .filter(F.length(F.trim("value")) > 0)
    )
    parsed = lines.select(
        F.from_json(
            "value",
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
        ).alias("u"),
        "source_file",
    )
    return (
        parsed.filter(F.col("u").isNotNull() & F.col(f"u.{_CORRUPT}").isNull())
        .select("u.*", "source_file")
        .drop(_CORRUPT)
    )


def read_json_any(spark: SparkSession, path: str) -> DataFrame:
    """S2: multi-line JSON in any of the 3 shapes, normalized to one row per
    utterance."""
    raw = (
        spark.read.option("multiLine", "true")
        .json(path)
        .withColumn("source_file", F.input_file_name())
    )
    cols = set(raw.columns)
    if "utterances" in cols:  # wrapper shape
        ep = F.col("episode_id") if "episode_id" in cols else F.lit(None).cast(
            "string"
        )
        exploded = raw.select(
            ep.alias("_wrapper_episode_id"),
            "source_file",
            F.explode("utterances").alias("u"),
        )
        out = exploded.select(
            F.coalesce(F.col("u.episode_id"), F.col("_wrapper_episode_id")).alias(
                "episode_id"
            ),
            F.col("u.start").cast("double").alias("start"),
            F.col("u.end").cast("double").alias("end"),
            F.col("u.speaker").alias("speaker"),
            F.col("u.text").alias("text"),
            "source_file",
        )
        return out
    # array shape parses as one row per element already; single object = 1 row
    for name in ("episode_id", "start", "end", "speaker", "text"):
        if name not in cols:
            raw = raw.withColumn(name, F.lit(None))
    return raw.select(
        F.col("episode_id").cast("string"),
        F.col("start").cast("double"),
        F.col("end").cast("double"),
        F.col("speaker").cast("string"),
        F.col("text").cast("string"),
        "source_file",
    )


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """S3 format autodetect: .jsonl → line-delimited reader; .json → any of
    the 3 multi-line shapes; globs dispatch on the extension
    (`reader.py:39-65`)."""
    lower = path.lower()
    if lower.endswith(".jsonl") or ".jsonl" in lower.rsplit("/", 1)[-1]:
        return read_jsonl(spark, path)
    if lower.endswith(".json"):
        return read_json_any(spark, path)
    # unknown extension: try JSONL first (the dominant shape), fall back.
    # Success needs a row with at least one REAL parsed field — a wrapped
    # JSON file parses into all-null structs (schema mismatch, not corrupt)
    # and must not count as JSONL.
    df = read_jsonl(spark, path)
    any_field = F.coalesce(
        F.col("episode_id"),
        F.col("start").cast("string"),
        F.col("end").cast("string"),
        F.col("speaker"),
        F.col("text"),
    )
    if df.filter(any_field.isNotNull()).limit(1).count() > 0:
        return df
    return read_json_any(spark, path)


def with_default_episode_id(df: DataFrame) -> DataFrame:
    """Missing episode_id defaults to the source filename stem
    (`reader.py:273-300`)."""
    stem = F.regexp_replace(
        F.element_at(F.split(F.col("source_file"), "/"), -1), r"\.[a-zA-Z0-9]+$", ""
    )
    return df.withColumn(
        "episode_id", F.coalesce(F.col("episode_id"), stem)
    )

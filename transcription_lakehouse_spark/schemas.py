"""Spark StructType schemas for every lakehouse artifact.

Mirrors the reference's PyArrow declarations
(`/root/reference/src/lakehouse/schemas.py:12-93`) per the SURVEY §1.2 type
mapping: string→StringType, float64→DoubleType, list<string>→ArrayType,
list<float32>→ArrayType(FloatType), bool→BooleanType, int64→LongType.

Schema enforcement happens at write (writer.enforce_schema raises on
mismatch, like `writer.py:92-99`); extra columns are tolerated at validation
time (`schemas.py:159-163` semantics) via ``allow_extra``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "RAW_UTTERANCE_SCHEMA",
    "UTTERANCE_SCHEMA",
    "SPAN_SCHEMA",
    "BEAT_SCHEMA",
    "SECTION_SCHEMA",
    "EMBEDDING_SCHEMA",
    "EPISODE_CATALOG_SCHEMA",
    "SPEAKER_CATALOG_SCHEMA",
    "validate_schema",
]


def _s(name: str, dtype, nullable: bool = False) -> StructField:
    return StructField(name, dtype, nullable)


# Input JSONL shape (`ingestion/validator.py:17-23`)
RAW_UTTERANCE_SCHEMA = StructType(
    [
        _s("episode_id", StringType(), True),
        _s("start", DoubleType(), True),
        _s("end", DoubleType(), True),
        _s("speaker", StringType(), True),
        _s("text", StringType(), True),
    ]
)

# `schemas.py:12-20`
UTTERANCE_SCHEMA = StructType(
    [
        _s("utterance_id", StringType()),
        _s("episode_id", StringType()),
        _s("start", DoubleType()),
        _s("end", DoubleType()),
        _s("duration", DoubleType()),
        _s("speaker", StringType()),
        _s("text", StringType()),
    ]
)

# `schemas.py:24-36`
SPAN_SCHEMA = StructType(
    [
        _s("span_id", StringType()),
        _s("episode_id", StringType()),
        _s("speaker", StringType()),
        _s("speaker_canonical", StringType()),
        _s("speaker_role", StringType()),
        _s("is_expert", BooleanType()),
        _s("start_time", DoubleType()),
        _s("end_time", DoubleType()),
        _s("duration", DoubleType()),
        _s("text", StringType()),
        _s("utterance_ids", ArrayType(StringType())),
    ]
)

# `schemas.py:40-52`
BEAT_SCHEMA = StructType(
    [
        _s("beat_id", StringType()),
        _s("episode_id", StringType()),
        _s("start_time", DoubleType()),
        _s("end_time", DoubleType()),
        _s("duration", DoubleType()),
        _s("text", StringType()),
        _s("span_ids", ArrayType(StringType())),
        _s("speakers_set", ArrayType(StringType())),
        _s("expert_span_ids", ArrayType(StringType())),
        _s("expert_coverage_pct", DoubleType()),
        _s("topic_label", StringType(), True),
    ]
)

# `schemas.py:55-65`
SECTION_SCHEMA = StructType(
    [
        _s("section_id", StringType()),
        _s("episode_id", StringType()),
        _s("start_time", DoubleType()),
        _s("end_time", DoubleType()),
        _s("duration_minutes", DoubleType()),
        _s("text", StringType()),
        _s("beat_ids", ArrayType(StringType())),
        _s("title", StringType()),
        _s("synopsis", StringType(), True),
    ]
)

# `schemas.py:68-74`
EMBEDDING_SCHEMA = StructType(
    [
        _s("artifact_id", StringType()),
        _s("artifact_type", StringType()),
        _s("embedding", ArrayType(FloatType())),
        _s("model_name", StringType()),
        _s("model_version", StringType(), True),
    ]
)

# `schemas.py:77-85` / `catalogs/episodes.py`
EPISODE_CATALOG_SCHEMA = StructType(
    [
        _s("episode_id", StringType()),
        _s("title", StringType(), True),
        _s("date", StringType(), True),
        _s("start_time", DoubleType()),
        _s("end_time", DoubleType()),
        _s("duration_seconds", DoubleType()),
        _s("duration_minutes", DoubleType()),
        _s("utterance_count", LongType()),
        _s("speaker_count", LongType()),
        _s("speaker_list", StringType()),
        _s("avg_utterance_duration", DoubleType()),
    ]
)

# `schemas.py:88-93` / `catalogs/speakers.py`
SPEAKER_CATALOG_SCHEMA = StructType(
    [
        _s("speaker", StringType()),
        _s("episode_count", LongType()),
        _s("utterance_count", LongType()),
        _s("total_speaking_time", DoubleType()),
        _s("avg_utterance_duration", DoubleType()),
        _s("min_utterance_duration", DoubleType()),
        _s("max_utterance_duration", DoubleType()),
        _s("episodes", StringType()),
        _s("utterances_per_episode", DoubleType()),
    ]
)


def validate_schema(
    df: DataFrame, schema: StructType, allow_extra: bool = True
) -> list[str]:
    """Return a list of problems (empty = valid). Extra columns beyond the
    schema are tolerated when ``allow_extra`` (reference `schemas.py:159-163`)."""
    problems = []
    have = {f.name: f.dataType for f in df.schema.fields}
    for f in schema.fields:
        if f.name not in have:
            problems.append(f"missing column: {f.name}")
        elif have[f.name].simpleString() != f.dataType.simpleString():
            problems.append(
                f"type mismatch for {f.name}: "
                f"{have[f.name].simpleString()} != {f.dataType.simpleString()}"
            )
    if not allow_extra:
        extra = set(have) - {f.name for f in schema.fields}
        problems += [f"unexpected column: {c}" for c in sorted(extra)]
    return problems

"""Hierarchical aggregation: utterances → spans → beats → sections.

The reference implements these as Python loops over ``List[Dict]``
(`/root/reference/src/lakehouse/aggregation/`); here each level is one
distributed Spark job (SURVEY §2.5 W2/W7/W8/W9/W10):

- spans  (W2): lag→flag→cumsum sessionization, pure window functions.
- beats  (W7 embedding mode): cosine(prev, curr) < threshold boundaries via
  higher-order-function cosine + the same cumsum idiom.
- beats  (W8 heuristic mode): speaker-change / gap parts are windows; the
  cumulative-duration reset is carried state → applyInPandas per episode.
- sections (W9): greedy 5-12 min packing with semantic-boundary preference →
  applyInPandas per episode (per-episode beat counts are small, so the
  grouped-map kernel is bounded; skew is capped by duration guardrails F4).

Every parent row carries its child-ID array (utterance_ids/span_ids/
beat_ids) and a deterministic content-hash ID (ids.py).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .functions.vector import as_double_array, cosine_clipped
from .ids import child_agg_id
from .operators.sessionization import with_session_id

__all__ = [
    "generate_spans",
    "generate_beats_embedding",
    "generate_beats_heuristic",
    "generate_sections",
]

SPAN_GAP_SEC = 0.5  # `config.py:17-21`
SPAN_MIN_SEC = 1.0  # `spans.py:218-220`
SPAN_MAX_SEC = 240.0  # guardrail F4, `materialize.py:169-236`
BEAT_SIM_THRESHOLD = 0.7  # `beats.py:126-217`
BEAT_GAP_SEC = 5.0  # `beats.py:219-279`
BEAT_MAX_SEC = 180.0
BEAT_GUARDRAIL_SEC = 360.0
SECTION_MIN_MIN = 5.0  # `sections.py:121-272`
SECTION_MAX_MIN = 12.0
SECTION_BOUNDARY_SIM = 0.5
SECTION_STRONG_FACTOR = 0.6
SECTION_GAP_SEC = 30.0


def _assemble(
    grouped: DataFrame, prefix: str, child_col: str
) -> DataFrame:
    """W10 boundary assembly: position-ranked deterministic IDs."""
    w = Window.partitionBy("episode_id").orderBy("start_time")
    pos = F.row_number().over(w) - 1
    return grouped.withColumn("_position", pos).withColumn(
        f"{prefix_name(prefix)}_id",
        child_agg_id(prefix, "episode_id", F.col("_position"), F.col(child_col), "text"),
    ).drop("_position")


def prefix_name(prefix: str) -> str:
    return {"spn": "span", "bet": "beat", "sec": "section"}[prefix]


def generate_spans(utterances: DataFrame) -> DataFrame:
    """W2: break on speaker change OR gap > 0.5s; concat text; collect
    utterance_ids; drop spans < 1s and > 240s (F4/F5).

    One shuffle (episode window) + one partial-aggregated groupBy.
    """
    tagged = with_session_id(
        utterances,
        ["episode_id"],
        "start",
        SPAN_GAP_SEC,
        prev_end_col="end",
        break_on_change=["speaker"],
        tiebreak_cols=["end", "utterance_id"],
    )
    grouped = tagged.groupBy("episode_id", "session_id").agg(
        F.first("speaker").alias("speaker"),
        F.min("start").alias("start_time"),
        F.max("end").alias("end_time"),
        # collect_list over the window-sorted group is order-stable only with
        # an explicit sort: sort struct array by (start, utterance_id)
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("start", "utterance_id", "text"))
                ),
                lambda s: s["text"],
            ),
        ).alias("text"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("start", "utterance_id"))),
            lambda s: s["utterance_id"],
        ).alias("utterance_ids"),
    )
    spans = (
        grouped.withColumn(
            "duration", F.round(F.col("end_time") - F.col("start_time"), 6)
        )
        .filter(
            (F.col("duration") >= SPAN_MIN_SEC) & (F.col("duration") <= SPAN_MAX_SEC)
        )
        .drop("session_id")
    )
    return _assemble(spans, "spn", "utterance_ids")


def generate_beats_embedding(
    spans: DataFrame, embeddings: DataFrame, threshold: float = BEAT_SIM_THRESHOLD
) -> DataFrame:
    """W7: boundary where cosine(prev span embedding, curr) < threshold.

    embeddings: (artifact_id, embedding array<float>). The cosine runs
    JVM-side (higher-order functions) over lag(embedding) — no Python.
    """
    sp = spans.join(
        embeddings.select(
            F.col("artifact_id").alias("span_id"),
            as_double_array("embedding").alias("_emb"),
        ),
        "span_id",
        "left",
    )
    w = Window.partitionBy("episode_id").orderBy("start_time", "span_id")
    prev_emb = F.lag("_emb").over(w)
    sim = cosine_clipped(prev_emb, F.col("_emb"))
    is_break = prev_emb.isNull() | F.col("_emb").isNull() | (sim < threshold)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged = sp.withColumn("_grp", F.sum(is_break.cast("long")).over(running))
    return _finish_beats(tagged)


def _finish_beats(tagged: DataFrame) -> DataFrame:
    grouped = tagged.groupBy("episode_id", "_grp").agg(
        F.min("start_time").alias("start_time"),
        F.max("end_time").alias("end_time"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("start_time", "span_id", "text"))),
                lambda s: s["text"],
            ),
        ).alias("text"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("start_time", "span_id"))),
            lambda s: s["span_id"],
        ).alias("span_ids"),
    )
    beats = (
        grouped.withColumn(
            "duration", F.round(F.col("end_time") - F.col("start_time"), 6)
        )
        .filter(F.col("duration") <= BEAT_GUARDRAIL_SEC)
        .drop("_grp")
    )
    return _assemble(beats, "bet", "span_ids")


def generate_beats_heuristic(spans: DataFrame) -> DataFrame:
    """W8: boundary on speaker change, gap > 5s, or cumulative beat duration
    > 180s. The cumulative reset is carried state (not a closed-form window)
    → exact applyInPandas kernel per episode (SURVEY §7.3)."""
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["start_time", "span_id"]).reset_index(drop=True)
        grp, cur_grp = [], 0
        acc, prev_end, prev_speaker = 0.0, None, None
        for row in pdf.itertuples(index=False):
            dur = row.end_time - row.start_time
            if prev_end is not None:
                gap = row.start_time - prev_end
                if (
                    row.speaker != prev_speaker
                    or gap > BEAT_GAP_SEC
                    or acc + dur > BEAT_MAX_SEC
                ):
                    cur_grp += 1
                    acc = 0.0
            grp.append(cur_grp)
            acc += dur
            prev_end, prev_speaker = row.end_time, row.speaker
        pdf["_grp"] = grp
        return pdf

    from pyspark.sql.types import LongType, StructField, StructType

    # build a NEW StructType — StructType.add mutates the DataFrame's cached
    # schema in place, desyncing it from the JVM plan
    out_schema = StructType(
        list(spans.schema.fields) + [StructField("_grp", LongType())]
    )
    tagged = spans.groupBy("episode_id").applyInPandas(kernel, schema=out_schema)
    return _finish_beats(tagged)


def generate_sections(beats: DataFrame, beat_embeddings: DataFrame | None = None) -> DataFrame:
    """W9 greedy section packing: accumulate beats into 5-12 min blocks,
    preferring breaks at semantic boundaries (cosine < 0.5, 'strong' < 0.3)
    and forcing breaks on >30s gaps; titles 'Section N'
    (`sections.py:121-272,542-573`). Inherently sequential per episode →
    applyInPandas grouped-map kernel."""
    import numpy as np

    src = beats.select("beat_id", "episode_id", "start_time", "end_time", "text")
    if beat_embeddings is not None:
        src = src.join(
            beat_embeddings.select(
                F.col("artifact_id").alias("beat_id"), F.col("embedding").alias("_emb")
            ),
            "beat_id",
            "left",
        )
    else:
        src = src.withColumn("_emb", F.lit(None).cast("array<float>"))

    out_schema = (
        "episode_id string, start_time double, end_time double, text string, "
        "beat_ids array<string>, _position long"
    )

    def cos(a, b) -> float:
        if a is None or b is None:
            return 1.0
        a = np.asarray(a, dtype="float64")
        b = np.asarray(b, dtype="float64")
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 or nb == 0:
            return 0.0
        return float(np.clip(np.dot(a, b) / (na * nb), 0.0, 1.0))

    min_s, max_s = SECTION_MIN_MIN * 60, SECTION_MAX_MIN * 60

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["start_time", "beat_id"]).reset_index(drop=True)
        sections, cur = [], []

        def flush():
            if not cur:
                return
            sections.append(
                {
                    "episode_id": pdf["episode_id"].iloc[0],
                    "start_time": cur[0]["start_time"],
                    "end_time": cur[-1]["end_time"],
                    "text": " ".join(r["text"] for r in cur),
                    "beat_ids": [r["beat_id"] for r in cur],
                    "_position": len(sections),
                }
            )
            cur.clear()

        prev = None
        for _, row in pdf.iterrows():
            r = row.to_dict()
            if cur:
                elapsed = cur[-1]["end_time"] - cur[0]["start_time"]
                gap = r["start_time"] - cur[-1]["end_time"]
                sim = cos(prev["_emb"] if prev is not None else None, r["_emb"])
                strong = sim < SECTION_BOUNDARY_SIM * SECTION_STRONG_FACTOR
                semantic = sim < SECTION_BOUNDARY_SIM
                if (
                    gap > SECTION_GAP_SEC
                    or elapsed >= max_s
                    or (elapsed >= min_s and (strong or semantic))
                ):
                    flush()
            cur.append(r)
            prev = r
        flush()
        return pd.DataFrame(
            sections,
            columns=[
                "episode_id", "start_time", "end_time", "text", "beat_ids", "_position",
            ],
        )

    packed = src.groupBy("episode_id").applyInPandas(kernel, schema=out_schema)
    return (
        packed.withColumn(
            "duration_minutes",
            F.round((F.col("end_time") - F.col("start_time")) / 60.0, 6),
        )
        .withColumn("title", F.concat(F.lit("Section "), (F.col("_position") + 1)))
        .withColumn("synopsis", F.lit(None).cast("string"))
        .withColumn(
            "section_id",
            child_agg_id("sec", "episode_id", F.col("_position"), F.col("beat_ids"), "text"),
        )
        .drop("_position")
    )

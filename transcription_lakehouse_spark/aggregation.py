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

import math

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

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
SECTION_TARGET_MIN = 8.0  # `sections.py:50`
SECTION_BOUNDARY_SIM = 0.5
SECTION_STRONG_FACTOR = 0.6  # `sections.py:55,346`
SECTION_SEMANTIC_CHECK_MULT = 1.5  # `sections.py:56,246`
SECTION_GAP_SEC = 30.0
SECTION_MIN_COVERAGE_PCT = 80.0  # `sections.py:455-462`


def _assemble(
    grouped: DataFrame, prefix: str, child_col: str
) -> DataFrame:
    """W10 boundary assembly: position-ranked deterministic IDs.

    The position window tie-breaks on (end_time, first child id): two groups
    in one episode CAN share start_time (simultaneous utterances by
    different speakers force a session break at the same min(start)), and
    an untied order would make row_number — and therefore every
    content-hash ID — nondeterministic across partitionings, breaking the
    idempotent-replay contract."""
    w = Window.partitionBy("episode_id").orderBy(
        "start_time", "end_time", F.col(child_col).getItem(0)
    )
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
    spans: DataFrame,
    embeddings: DataFrame | None = None,
    threshold: float = BEAT_SIM_THRESHOLD,
    embedding_col: Column | None = None,
) -> DataFrame:
    """W7: boundary where cosine(prev span embedding, curr) < threshold.

    embeddings: (artifact_id, embedding array<float>). The cosine runs
    JVM-side (higher-order functions) over lag(embedding) — no Python.

    ``embedding_col`` (exclusive with ``embeddings``): a Column expression
    over the spans relation yielding the embedding array (NULL = no
    embedding). When the embedding is a pure derivation of span columns —
    not a stored sink — attaching it as a column skips the 1:1 self-join
    (two exchanges + a sort-merge join for rows that are already
    co-resident, guide §2.4) and preserves the spans relation's upstream
    partitioning for every downstream episode-keyed stage.
    """
    if (embeddings is None) == (embedding_col is None):
        raise ValueError("pass exactly one of embeddings / embedding_col")
    if embedding_col is not None:
        sp = spans.withColumn("_emb", as_double_array(embedding_col))
    else:
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
        import numpy as np

        pdf = pdf.sort_values(["start_time", "span_id"]).reset_index(drop=True)
        n = len(pdf)
        start = pdf["start_time"].to_numpy()
        end = pdf["end_time"].to_numpy()
        dur = end - start
        # vectorize everything except the accumulator reset, which is the
        # one genuinely sequential dependency (measured ~4x faster than the
        # row-tuple loop at 5M spans)
        spk = pdf["speaker"].to_numpy()
        brk = np.zeros(n, dtype=bool)
        if n > 1:
            brk[1:] = (spk[1:] != spk[:-1]) | (start[1:] - end[:-1] > BEAT_GAP_SEC)
        grp = np.zeros(n, dtype=np.int64)
        g, acc = 0, 0.0
        for i in range(n):
            if i > 0 and (brk[i] or acc + dur[i] > BEAT_MAX_SEC):
                g += 1
                acc = 0.0
            grp[i] = g
            acc += dur[i]
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


def generate_sections(
    beats: DataFrame,
    beat_embeddings: DataFrame | None = None,
    require_embeddings: bool = True,
    allow_semantic_overflow: bool = True,
    beat_embedding_col: Column | None = None,
) -> DataFrame:
    """W9 greedy section packing (`sections.py:121-272,542-573`), faithful to
    the reference's `_should_break_section` decision tree:

    - duration accounting is the SUM of beat durations (`sections.py:146-174`),
      not the wall-clock span;
    - nothing breaks below min duration (5 min), including the >30s gap rule;
    - above max (12 min): break only at a semantic boundary (sim < 0.5) when
      `allow_semantic_overflow` (default, `sections.py:227-241`), else hard;
    - strong boundaries (sim < 0.5*0.6) may break from 1.5*min = 7.5 min
      (`sections.py:244-253`); plain semantic ones only from 0.8*target =
      6.4 min (`sections.py:256-263`) — the two-tier preference;
    - without embeddings (`beat_embeddings=None`) packing is time-based:
      break once summed duration reaches the 8-min target
      (`prefer_time_boundaries`, `sections.py:220-224`).

    Guardrail (`sections.py:455-462`): when embeddings ARE provided and
    `require_embeddings` (reference default), materialization fails if <80%
    of beats have an embedding — a mostly-missing embeddings table must not
    silently degrade section quality. The check is an in-plan raise_error
    (1-row broadcast guard), so it costs zero extra jobs and surfaces on
    first execution of the returned plan, not at build time.

    Inherently sequential per episode → applyInPandas grouped-map kernel
    (per-episode beat counts are bounded by the duration guardrails).

    ``beat_embedding_col`` (exclusive with ``beat_embeddings``): a Column
    over the beats relation yielding the embedding array (NULL = none).
    Same rationale as generate_beats_embedding's ``embedding_col`` — a
    derived embedding attached as a column skips the 1:1 self-join and
    keeps the beats relation's partitioning (guide §2.4)."""
    if beat_embeddings is not None and beat_embedding_col is not None:
        raise ValueError("pass at most one of beat_embeddings / beat_embedding_col")
    src = beats.select("beat_id", "episode_id", "start_time", "end_time", "text")
    semantic_mode = beat_embeddings is not None or beat_embedding_col is not None
    if semantic_mode:
        if beat_embedding_col is not None:
            src = beats.select(
                "beat_id",
                "episode_id",
                "start_time",
                "end_time",
                "text",
                beat_embedding_col.alias("_emb"),
            )
        else:
            src = src.join(
                beat_embeddings.select(
                    F.col("artifact_id").alias("beat_id"),
                    F.col("embedding").alias("_emb"),
                ),
                "beat_id",
                "left",
            )
        if require_embeddings:
            # In-plan guard (zero extra jobs): a 1-row aggregate joined back
            # on a condition that READS the guarded value — the join predicate
            # reference keeps Catalyst from pruning the raise_error away, and
            # the eager `.first()` pre-flight this replaces re-executed the
            # whole beats⋈embeddings lineage as a separate job (same pattern
            # as operators/dedup.py:signature_bands).
            pct = F.when(
                F.col("_cov_n") > 0,
                100.0 * F.col("_cov_n_emb") / F.col("_cov_n"),
            ).otherwise(F.lit(100.0))
            # The guard branch re-derives src pruned to (episode_id, _emb)
            # — Catalyst prunes every upstream projection, AQE reuses the
            # window shuffles shared with the main branch, and the branch
            # aggregates map-side to one row. Measured overhead ~1.2 s warm
            # at sf0.01 vs the old eager `.first()`'s full extra job; a
            # same-exchange repartition variant measured WORSE (pruning
            # makes the exchanges canonically unequal, so it only added a
            # full-width shuffle).
            guard = src.agg(
                F.count(F.lit(1)).alias("_cov_n"),
                F.count("_emb").alias("_cov_n_emb"),
            ).select(
                F.when(
                    pct < SECTION_MIN_COVERAGE_PCT,
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "Insufficient embedding coverage for semantic "
                                "sections: "
                            ),
                            F.round(pct, 1).cast("string"),
                            F.lit(f"% < {SECTION_MIN_COVERAGE_PCT}% ("),
                            F.col("_cov_n_emb").cast("string"),
                            F.lit("/"),
                            F.col("_cov_n").cast("string"),
                            F.lit(
                                " beats). Generate embeddings for all beats "
                                "or pass require_embeddings=False."
                            ),
                        )
                    ).cast("int"),
                )
                .otherwise(F.lit(0))
                .alias("_cov_ok")
            )
            src = src.join(
                F.broadcast(guard), F.col("_cov_ok") == F.lit(0)
            ).drop("_cov_ok")
    else:
        src = src.withColumn("_emb", F.lit(None).cast("array<float>"))

    out_schema = (
        "episode_id string, start_time double, end_time double, text string, "
        "beat_ids array<string>, _position long"
    )

    def cos(a, b) -> float | None:
        """None when either embedding is missing (no semantic signal —
        reference `_has_semantic_boundary` returns False, `sections.py:290`).

        Strict left-to-right double accumulation (not np.dot/BLAS, whose
        pairwise/unrolled summation rounds differently) so the kernel is
        bitwise-identical to functions/vector.py's JVM fold and DuckDB's
        list_sum — the trn_section_semantic_catalog oracle depends on it.
        Per-transition cost at dim<=1536 is negligible next to Arrow I/O."""
        if a is None or b is None:
            return None
        num = 0.0
        na2 = 0.0
        nb2 = 0.0
        for x, y in zip(a, b):
            x = float(x)
            y = float(y)
            num += x * y
            na2 += x * x
            nb2 += y * y
        den = math.sqrt(na2) * math.sqrt(nb2)
        if den == 0:
            return 0.0
        return num / den

    min_s = SECTION_MIN_MIN * 60
    max_s = SECTION_MAX_MIN * 60
    target_s = SECTION_TARGET_MIN * 60

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["start_time", "beat_id"]).reset_index(drop=True)
        sections, cur = [], []
        cur_dur = 0.0

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

        # to_dict('records') not iterrows: row-Series construction is ~10x
        # the cost of the plain dicts this loop needs
        for r in pdf.to_dict("records"):
            dur = r["end_time"] - r["start_time"]
            brk = False
            if cur and cur_dur >= min_s:
                potential = cur_dur + dur
                if not semantic_mode:
                    brk = potential >= target_s
                else:
                    sim = cos(cur[-1]["_emb"], r["_emb"])
                    semantic = sim is not None and sim < SECTION_BOUNDARY_SIM
                    strong = sim is not None and sim < (
                        SECTION_BOUNDARY_SIM * SECTION_STRONG_FACTOR
                    )
                    gap = r["start_time"] - cur[-1]["end_time"]
                    if potential > max_s:
                        brk = semantic or not allow_semantic_overflow
                    elif cur_dur >= min_s * SECTION_SEMANTIC_CHECK_MULT and strong:
                        brk = True
                    elif cur_dur >= target_s * 0.8 and semantic:
                        brk = True
                    elif gap > SECTION_GAP_SEC:
                        brk = True
            if brk:
                flush()
                cur_dur = 0.0
            cur.append(r)
            cur_dur += dur
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

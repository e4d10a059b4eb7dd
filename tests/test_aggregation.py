from __future__ import annotations

import re

import pyspark.sql.functions as F

from tests.fixtures import EP1, EP2, EP3, raw_utterances
from transcription_lakehouse_spark.aggregation import (
    generate_beats_embedding,
    generate_beats_heuristic,
    generate_sections,
    generate_spans,
)
from transcription_lakehouse_spark.ids import ID_PATTERN
from transcription_lakehouse_spark.ingestion import normalize
from transcription_lakehouse_spark.speaker_roles import (
    SpeakerRoleConfig,
    beat_speaker_metadata,
    enrich_spans,
)


def _spans(spark):
    return generate_spans(normalize(raw_utterances(spark)))


def test_spans_break_on_speaker_and_gap(spark):
    spans = _spans(spark)
    # EP1: Alice run, Bob run, Alice run (after 5s gap) => 3 spans
    assert spans.filter(F.col("episode_id") == EP1).count() == 3
    # EP2: Carol run, 3s-gap => 2 spans
    assert spans.filter(F.col("episode_id") == EP2).count() == 2
    # EP3: single clean run => 1 span
    assert spans.filter(F.col("episode_id") == EP3).count() == 1


def test_spans_text_and_children_ordered(spark):
    spans = _spans(spark)
    row = (
        spans.filter((F.col("episode_id") == EP3))
        .collect()[0]
    )
    assert row["text"].startswith("Alice says thing 0")
    assert row["text"].endswith("thing 4 in LOS")
    assert len(row["utterance_ids"]) == 5
    assert re.match(ID_PATTERN, row["span_id"])


def test_episode_catalog_carries_ordered_full_text(spark):
    """Reference `episodes.py:106-121`: the catalog carries the episode's
    FULL transcript (STRING_AGG ordered by start time), plus parsed
    series/date/title from the id pattern."""
    from transcription_lakehouse_spark.catalogs.episodes import episode_catalog

    cat = episode_catalog(normalize(raw_utterances(spark)))
    rows = {r["episode_id"]: r for r in cat.collect()}
    ep3 = rows[EP3]
    # 5 utterances, time order preserved end-to-end
    assert ep3["full_text"].startswith("Alice says thing 0")
    assert ep3["full_text"].endswith("thing 4 in LOS")
    assert ep3["full_text"].count("Alice says thing") == 5
    assert (ep3["series"], ep3["date"], ep3["title"]) == (
        "LOS", "2024-03-01", "Finale",
    )
    ep1 = rows[EP1]
    assert ep1["utterance_count"] == 7 and ep1["speaker_count"] == 2
    # full text covers every utterance exactly once
    assert ep1["full_text"].count("says thing") == 7


def test_span_enrichment_roles(spark):
    cfg = SpeakerRoleConfig(experts=["Alice"], roles={"Bob": "host"})
    spans = enrich_spans(_spans(spark), cfg, spark)
    roles = {
        (r["speaker"], r["speaker_role"], r["is_expert"])
        for r in spans.select("speaker", "speaker_role", "is_expert").collect()
    }
    assert ("Alice", "expert", True) in roles
    assert ("Bob", "host", False) in roles
    assert ("Carol", "other", False) in roles


def test_heuristic_beats_group_spans(spark):
    cfg = SpeakerRoleConfig()
    spans = enrich_spans(_spans(spark), cfg, spark)
    beats = generate_beats_heuristic(spans)
    assert beats.count() >= 3
    for r in beats.collect():
        assert re.match(ID_PATTERN, r["beat_id"])
        assert r["duration"] <= 360.0
        assert len(r["span_ids"]) >= 1


def test_heuristic_beats_duration_reset():
    # pure-kernel check: 180s cap forces a split even with same speaker
    import pandas as pd

    from transcription_lakehouse_spark.aggregation import BEAT_MAX_SEC

    assert BEAT_MAX_SEC == 180.0


def test_embedding_beats_boundary(spark):
    cfg = SpeakerRoleConfig()
    spans = enrich_spans(_spans(spark), cfg, spark).filter(
        F.col("episode_id") == EP1
    )
    ids = [r["span_id"] for r in spans.orderBy("start_time").collect()]
    # embeddings: first two similar, third orthogonal => boundary before 3rd
    emb = spark.createDataFrame(
        [
            (ids[0], [1.0, 0.0]),
            (ids[1], [0.99, 0.14]),
            (ids[2], [0.0, 1.0]),
        ],
        "artifact_id string, embedding array<float>",
    )
    beats = generate_beats_embedding(spans, emb, threshold=0.7)
    assert beats.count() == 2
    first = beats.orderBy("start_time").collect()[0]
    assert first["span_ids"] == ids[:2]


def test_beat_speaker_metadata(spark):
    cfg = SpeakerRoleConfig(experts=["Alice"])
    spans = enrich_spans(_spans(spark), cfg, spark)
    beats = generate_beats_heuristic(spans)
    enriched = beat_speaker_metadata(beats, spans)
    ep1 = enriched.filter(F.col("episode_id") == EP1).collect()
    all_speakers = set()
    for r in ep1:
        all_speakers.update(r["speakers_set"])
        if r["speakers_set"] == ["Alice"]:
            assert r["expert_coverage_pct"] == 100.0
            assert len(r["expert_span_ids"]) >= 1
    assert "Alice" in all_speakers


def test_sections_pack_and_title(spark):
    cfg = SpeakerRoleConfig()
    spans = enrich_spans(_spans(spark), cfg, spark)
    beats = generate_beats_heuristic(spans)
    sections = generate_sections(beats)
    assert sections.count() >= 1
    for r in sections.collect():
        assert re.match(ID_PATTERN, r["section_id"])
        assert r["title"].startswith("Section ")
        assert len(r["beat_ids"]) >= 1


def test_sections_split_on_long_episode(spark):
    # 30 min, speakers alternating every minute (spans stay under the 240s
    # guardrail) => must split into >= 2 sections (max 12 min)
    rows = []
    t = 0.0
    for i in range(360):
        speaker = "A" if (i // 12) % 2 == 0 else "B"
        rows.append(("EP - #9 - 2024-05-01 - Long", t, t + 5.0, speaker, f"utt {i}"))
        t += 5.0
    utts = spark.createDataFrame(
        rows, "episode_id string, start double, end double, speaker string, text string"
    )
    spans = enrich_spans(
        generate_spans(normalize(utts)), SpeakerRoleConfig(), spark
    )
    beats = generate_beats_heuristic(spans)
    sections = generate_sections(beats)
    secs = sections.orderBy("start_time").collect()
    assert len(secs) >= 2
    assert all(s["duration_minutes"] <= 12.5 for s in secs)


def test_approx_sketches_track_exact_aggregates(spark):
    """The 100 TB substitutes for exact countDistinct/percentile: HLL++
    (approx_count_distinct) and KLL-style percentile_approx shuffle O(sketch)
    bytes instead of O(distinct keys). Pin their error against the exact
    answers on real testdata so a Spark upgrade changing sketch defaults
    fails loudly."""
    from transcription_lakehouse_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    exact = ev.agg(
        F.countDistinct("user_id").alias("du"),
        F.percentile("value", F.lit(0.5)).alias("p50"),
        F.percentile("value", F.lit(0.95)).alias("p95"),
    ).collect()[0]
    approx = ev.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("du"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("p50"),
        F.percentile_approx("value", F.lit(0.95), F.lit(10000)).alias("p95"),
    ).collect()[0]
    assert abs(approx["du"] - exact["du"]) / exact["du"] <= 0.05
    # percentile_approx guarantees rank error <= 1/accuracy; on 10k events
    # the value gap at that rank tolerance stays small
    assert abs(approx["p50"] - exact["p50"]) <= max(0.5, 0.02 * exact["p50"])
    assert abs(approx["p95"] - exact["p95"]) <= max(0.5, 0.02 * exact["p95"])


def _beats_with_sparse_embeddings(spark, keep_every: int):
    """Long-episode beats + embeddings for only every `keep_every`-th beat."""
    rows = []
    t = 0.0
    for i in range(360):
        speaker = "A" if (i // 12) % 2 == 0 else "B"
        rows.append(("EP - #9 - 2024-05-01 - Long", t, t + 5.0, speaker, f"utt {i}"))
        t += 5.0
    utts = spark.createDataFrame(
        rows, "episode_id string, start double, end double, speaker string, text string"
    )
    beats = generate_beats_heuristic(generate_spans(normalize(utts)))
    ids = [r["beat_id"] for r in beats.orderBy("start_time").collect()]
    emb = spark.createDataFrame(
        [(bid, [1.0, 0.0]) for i, bid in enumerate(ids) if i % keep_every == 0],
        "artifact_id string, embedding array<float>",
    )
    return beats, emb


def test_sections_coverage_guard_is_lazy_and_fires(spark):
    """The <80%-coverage refusal is an IN-PLAN raise_error (no eager job at
    build time — the old `.first()` pre-flight re-executed the whole beats
    lineage), surfacing when the plan is first executed."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    beats, emb = _beats_with_sparse_embeddings(spark, keep_every=5)  # 20% cov
    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup(None) or [])
    sections = generate_sections(beats, emb)  # must NOT run a job
    jobs_after = len(tracker.getJobIdsForGroup(None) or [])
    assert jobs_after == jobs_before, "generate_sections ran an eager job"
    with pytest.raises((PySparkException, Py4JJavaError)) as ei:
        sections.collect()
    assert "Insufficient embedding coverage" in str(ei.value)


def test_sections_coverage_guard_passes_above_threshold(spark):
    beats, emb = _beats_with_sparse_embeddings(spark, keep_every=1)  # 100%
    sections = generate_sections(beats, emb)
    assert sections.count() >= 1


def test_inline_embedding_col_matches_join_path(spark):
    """r11 optimization: a derived embedding attached via ``embedding_col``
    (no 1:1 join-back) must produce row-identical beats AND sections to the
    (artifact_id, embedding) DataFrame path."""
    import pytest

    beats, _ = _beats_with_sparse_embeddings(spark, keep_every=1)
    # derive a deterministic per-beat embedding from the row itself, with a
    # 1-in-4 NULL stripe to exercise the missing-embedding branch both ways
    present = F.abs(F.hash("beat_id")) % 4 != 0
    col = F.when(
        present,
        F.array(
            (F.abs(F.hash("beat_id")) % 100).cast("double") / 100.0,
            F.lit(1.0),
        ),
    )
    emb_df = beats.select(
        F.col("beat_id").alias("artifact_id"), col.alias("embedding")
    ).filter(F.col("embedding").isNotNull())

    sec_join = generate_sections(beats, emb_df, require_embeddings=False)
    sec_inline = generate_sections(
        beats, beat_embedding_col=col, require_embeddings=False
    )
    rows_j = [tuple(r) for r in sec_join.orderBy("section_id").collect()]
    rows_i = [tuple(r) for r in sec_inline.orderBy("section_id").collect()]
    assert rows_j == rows_i and rows_j

    # beats from embeddings: rebuild spans-level inputs
    rows = []
    t = 0.0
    for i in range(60):
        speaker = "A" if i % 2 == 0 else "B"
        rows.append(("EP - #9 - 2024-05-01 - Long", t, t + 5.0, speaker, f"utt {i}"))
        t += 6.0
    utts = spark.createDataFrame(
        rows, "episode_id string, start double, end double, speaker string, text string"
    )
    spans = generate_spans(normalize(utts))
    s_present = F.abs(F.hash("span_id")) % 5 != 0
    s_col = F.when(
        s_present,
        F.array(
            (F.abs(F.hash("span_id")) % 100).cast("double") / 100.0,
            F.lit(1.0),
        ),
    )
    s_emb = spans.select(
        F.col("span_id").alias("artifact_id"), s_col.alias("embedding")
    ).filter(F.col("embedding").isNotNull())
    b_join = generate_beats_embedding(spans, s_emb)
    b_inline = generate_beats_embedding(spans, embedding_col=s_col)
    bj = [tuple(r) for r in b_join.orderBy("beat_id").collect()]
    bi = [tuple(r) for r in b_inline.orderBy("beat_id").collect()]
    assert bj == bi and bj

    with pytest.raises(ValueError):
        generate_beats_embedding(spans)
    with pytest.raises(ValueError):
        generate_beats_embedding(spans, s_emb, embedding_col=s_col)
    with pytest.raises(ValueError):
        generate_sections(beats, emb_df, beat_embedding_col=col)

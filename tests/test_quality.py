from __future__ import annotations

import pyspark.sql.functions as F

from transcription_lakehouse_spark.quality.assessor import Thresholds, assess
from transcription_lakehouse_spark.quality.metrics import (
    coverage_metrics,
    duplicate_groups,
    duration_histogram,
    duration_stats,
    integrity_counts,
    length_compliance,
    speaker_balance,
    text_metrics,
    timestamp_regressions,
)
from transcription_lakehouse_spark.quality.sampling import (
    random_pairs,
    stratified_sample,
)

SPAN_COLS = (
    "span_id string, episode_id string, speaker string, start_time double, "
    "end_time double, duration double, text string"
)


def _spans(spark):
    """Planted defects with known expected values (FIXTURES.md §3)."""
    rows = [
        # EP1: two clean spans + a gap + an overlap pair
        ("s1", "EP1", "A", 0.0, 30.0, 30.0, "clean span number one here"),
        ("s2", "EP1", "B", 30.0, 60.0, 30.0, "clean span number two here"),
        ("s3", "EP1", "A", 100.0, 130.0, 30.0, "after a forty second gap"),
        ("s4", "EP1", "B", 120.0, 150.0, 30.0, "overlaps previous by ten"),
        # EP2: duplicates (same text/speaker/5-min bin), zero + negative dur
        ("s5", "EP2", "C", 0.0, 25.0, 25.0, "duplicate text content here"),
        ("s6", "EP2", "C", 50.0, 75.0, 25.0, "duplicate text content here"),
        ("s7", "EP2", "C", 80.0, 80.0, 0.0, "zero duration span oops"),
        ("s8", "EP2", "C", 90.0, 85.0, -5.0, "negative duration span bad"),
        # EP2: regression: s9 ends after s10 starts
        ("s9", "EP2", "D", 100.0, 140.0, 40.0, "i run long into the next"),
        ("s10", "EP2", "D", 130.0, 160.0, 30.0, "i started too early"),
    ]
    return rows


def spans_df(spark):
    return spark.createDataFrame(_spans(spark), SPAN_COLS)


def episodes_df(spark):
    return spark.createDataFrame(
        [("EP1", 150.0, "LOS"), ("EP2", 160.0, "SW")],
        "episode_id string, duration_seconds double, series string",
    )


def test_coverage_capped_and_overlap_aware(spark):
    cov = {r["episode_id"]: r for r in
           coverage_metrics(spans_df(spark), episodes_df(spark)).collect()}
    # EP1: [0,60] + [100,150] (s3+s4 merge) = 110 of 150 => 73.33
    assert cov["EP1"]["coverage_pct"] == 73.33
    assert cov["EP1"]["n_islands"] == 2
    assert cov["EP1"]["max_concurrency"] == 2  # s3/s4 overlap
    # EP2 has s8 end<start; union treats degenerate rows but cap holds
    assert cov["EP2"]["coverage_pct"] <= 100.0


def test_duration_stats_and_histogram(spark):
    stats = duration_stats(spans_df(spark)).collect()[0]
    assert stats["n"] == 10
    assert stats["min_duration"] == -5.0
    assert stats["max_duration"] == 40.0
    hist = duration_histogram(spans_df(spark), [0.0, 10.0, 30.0]).collect()
    assert sum(r["n"] for r in hist) == 10


def test_length_compliance_sums_to_100(spark):
    comp = length_compliance(spans_df(spark), 20.0, 120.0)
    assert round(
        comp["pct_in_range"] + comp["pct_too_short"] + comp["pct_too_long"], 2
    ) == 100.0
    assert comp["pct_too_short"] == 20.0  # s7 (0) + s8 (-5)


def test_integrity_counts(spark):
    ic = integrity_counts(spans_df(spark))
    assert ic["negative_duration"] == 1
    assert ic["zero_duration"] == 1
    assert ic["missing_speaker"] == 0


def test_duplicate_groups_key_includes_time_bin(spark):
    dups = duplicate_groups(spans_df(spark)).collect()
    # s5/s6 share text+speaker+episode AND the same 5-min bin => 1 group
    assert len(dups) == 1
    assert dups[0]["n_duplicates"] == 1


def test_timestamp_regressions(spark):
    regs = {r["episode_id"]: r for r in
            timestamp_regressions(spans_df(spark)).collect()}
    assert regs["EP2"]["episode_regressions"] >= 1
    assert regs["EP1"]["episode_regressions"] == 1  # s3/s4 overlap counts


def test_speaker_balance_ranks(spark):
    bal = speaker_balance(spans_df(spark)).collect()
    assert bal[0]["rank"] == 1
    total_pct = sum(r["pct_duration"] for r in bal)
    assert abs(total_pct - 100.0) < 0.5


def test_text_metrics(spark):
    m = text_metrics(spans_df(spark)).collect()[0]
    assert m["n_segments"] == 10
    assert m["total_tokens"] > 0
    assert 0.0 < m["lexical_density"] <= 1.0


def test_assess_rag_verdict(spark):
    a = assess(spans_df(spark), episodes_df(spark), thresholds=Thresholds())
    assert a.status == "RED"  # integrity errors present
    cats = {v.category for v in a.violations}
    assert "integrity" in cats
    # clean data => GREEN
    clean = spark.createDataFrame(
        [
            ("c1", "EP1", "A", 0.0, 60.0, 60.0, "clean span one yes truly"),
            ("c2", "EP1", "B", 60.0, 150.0, 90.0, "clean span two also good"),
        ],
        SPAN_COLS,
    )
    eps = spark.createDataFrame(
        [("EP1", 150.0, "LOS")],
        "episode_id string, duration_seconds double, series string",
    )
    g = assess(clean, eps)
    assert g.status == "GREEN", [v.as_dict() for v in g.violations]


def test_assess_driver_collects_are_capped(spark):
    """Pathological key cardinality (many speakers, many low-coverage
    episodes) must yield BOUNDED driver-side metric lists: top-N detail
    plus one tail-rollup row, never the full per-key list."""
    n_speakers, cap = 500, 10
    spans = (
        spark.range(n_speakers)
        .select(
            F.concat(F.lit("s"), F.col("id")).alias("span_id"),
            F.concat(F.lit("EP"), F.col("id")).alias("episode_id"),
            F.concat(F.lit("spk"), F.col("id")).alias("speaker"),
            F.lit(0.0).alias("start_time"),
            (10.0 + F.col("id") % 7).alias("end_time"),
            (10.0 + F.col("id") % 7).alias("duration"),
            F.lit("some words here truly fine").alias("text"),
        )
    )
    eps = spark.range(n_speakers).select(
        F.concat(F.lit("EP"), F.col("id")).alias("episode_id"),
        F.lit(100.0).alias("duration_seconds"),  # every episode <80% covered
        F.lit("S").alias("series"),
    )
    a = assess(spans, eps, thresholds=Thresholds(max_detail_rows=cap))
    # coverage: cap rows of detail + distributed rollup accounting for all
    assert len(a.metrics["coverage"]) == cap
    assert a.metrics["coverage_summary"]["n_episodes"] == n_speakers
    assert a.metrics["coverage_summary"]["n_below_threshold"] == n_speakers
    cov_viol = [v for v in a.violations if v.category == "coverage"]
    assert len(cov_viol) == cap + 1  # cap detail rows + 1 rollup violation
    assert any("more episodes below threshold" in v.check for v in cov_viol)
    # balance: cap speakers + one <tail> rollup whose share closes to 100%
    bal = a.metrics["speaker_balance"]
    assert len(bal) == cap + 1
    assert bal[-1]["speaker"] == "<tail>"
    assert bal[-1]["n_speakers_in_tail"] == n_speakers - cap
    total_pct = sum(r["pct_duration"] for r in bal)
    assert abs(total_pct - 100.0) < 0.5


def test_stratified_sample_guarantees_and_determinism(spark):
    df = spans_df(spark)
    s1 = stratified_sample(df, ["episode_id", "speaker"], 6)
    s2 = stratified_sample(df, ["episode_id", "speaker"], 6)
    ids1 = sorted(r["span_id"] for r in s1.collect())
    ids2 = sorted(r["span_id"] for r in s2.collect())
    assert ids1 == ids2  # seeded => reproducible
    # every stratum represented
    strata = {(r["episode_id"], r["speaker"]) for r in s1.collect()}
    all_strata = {(r["episode_id"], r["speaker"]) for r in df.collect()}
    assert strata == all_strata


def test_stratified_sample_id_col_invariant_under_repartition(spark):
    """With id_col the sample key is sha2(id|seed) — a pure function of the
    data — so ANY input partitioning yields the identical sample (the
    rand(seed) fallback is only rerun-stable, not partitioning-stable)."""
    df = spans_df(spark)
    s1 = stratified_sample(df, ["episode_id"], 4, id_col="span_id")
    s2 = stratified_sample(
        df.repartition(7, "speaker"), ["episode_id"], 4, id_col="span_id"
    )
    assert sorted(r["span_id"] for r in s1.collect()) == sorted(
        r["span_id"] for r in s2.collect()
    )


def test_random_pairs_distinct_and_nonempty(spark):
    pairs = random_pairs(spans_df(spark), "span_id", 5).collect()
    assert len(pairs) > 0
    assert all(p["id_1"] != p["id_2"] for p in pairs)
    # deterministic under the fixed seed
    again = random_pairs(spans_df(spark), "span_id", 5).collect()
    assert sorted(map(tuple, pairs)) == sorted(map(tuple, again))


def test_numeric_anomalies(spark):
    from transcription_lakehouse_spark.quality.metrics import numeric_anomalies

    df = spark.createDataFrame(
        [(1.0, 2.0), (float("nan"), 3.0), (None, float("inf")), (4.0, -float("inf"))],
        "a double, b double",
    )
    out = numeric_anomalies(df)
    assert out["a"] == {"nan": 1, "null": 1, "inf": 0}
    assert out["b"] == {"nan": 0, "null": 0, "inf": 2}


def test_weighted_sample_props(spark):
    """A-ES weighted sampling: proportional-to-weight inclusion (a huge
    weight virtually guarantees selection), partitioning invariance, and a
    TakeOrdered plan (no global sort)."""
    from transcription_lakehouse_spark.quality.sampling import weighted_sample

    rows = [(i, 1.0 if i else 1e8) for i in range(200)]  # row 0 dominates
    df = spark.createDataFrame(rows, "id long, w double")
    s = weighted_sample(df, 20, "w", "id")
    ids = {r["id"] for r in s.collect()}
    assert 0 in ids and len(ids) == 20

    # zero/negative weights carry no mass
    df2 = spark.createDataFrame([(1, 0.0), (2, -3.0), (3, 5.0)], "id long, w double")
    assert {r["id"] for r in weighted_sample(df2, 3, "w", "id").collect()} == {3}

    # content-hash keys: same sample under a different partitioning
    again = {r["id"] for r in weighted_sample(df.repartition(13), 20, "w", "id").collect()}
    assert again == ids

    plan = s._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_quality_scores_not_degenerate_at_gate(spark):
    """Score-calibration pin (round-6 verdict ask): the committed model's
    scores on REAL corpus text must sit comfortably above the 0.5 serving
    gate (`curate --min-quality` default), not pile up at the threshold —
    HOLDOUT_ACCURACY=1.0 alone only proves the planted junk is separable.
    Measured evidence: tools/quality_score_hist.py (sf0.1: p5=0.80,
    4/5000 docs within [0.45, 0.55))."""
    from transcription_lakehouse_spark._quality_model import BIAS, WEIGHTS
    from transcription_lakehouse_spark.operators.quality_model import (
        quality_classifier,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scored = quality_classifier(
        docs, "doc_id", "text", WEIGHTS, BIAS
    ).select("quality_score")
    n = scored.count()
    p5 = scored.select(
        F.percentile_approx("quality_score", 0.05, 10000).alias("p")
    ).head()["p"]
    assert p5 > 0.5, f"p5 of fluent-doc scores {p5} not above the gate"
    # no spike at the decision boundary: < 2% of clean docs in the
    # gate's +/-0.05 neighborhood
    near = scored.filter(
        (F.col("quality_score") >= 0.45) & (F.col("quality_score") < 0.55)
    ).count()
    assert near / n < 0.02, f"{near}/{n} docs within 0.05 of the gate"

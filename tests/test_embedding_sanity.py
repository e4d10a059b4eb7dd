from __future__ import annotations

import pyspark.sql.functions as F

from transcription_lakehouse_spark.embeddings import generate_embeddings
from transcription_lakehouse_spark.quality.embedding_sanity import (
    length_bias,
    neighbor_metrics,
    norm_stats,
    spearman,
)


def _spans(spark):
    rows = []
    t = 0.0
    for ep in ("E1", "E2"):
        for i in range(10):
            sp = "A" if i % 2 == 0 else "B"
            rows.append(
                (f"{ep}s{i}", ep, sp, t, t + 10.0, 10.0, f"{sp} topic {i % 3} in {ep}")
            )
            t += 10.5
    return spark.createDataFrame(
        rows,
        "span_id string, episode_id string, speaker string, start_time double, "
        "end_time double, duration double, text string",
    )


def test_norm_stats_unit_vectors(spark):
    spans = _spans(spark)
    emb = generate_embeddings(spans, "span_id", "text", "span")
    s = norm_stats(emb).collect()[0]
    assert s["n"] == 20 and s["n_zero"] == 0
    assert abs(s["avg_norm"] - 1.0) < 1e-4  # hash embeddings are unit-norm


def test_length_bias_zero_for_constant_duration(spark):
    spans = _spans(spark)
    emb = generate_embeddings(spans, "span_id", "text", "span")
    # constant duration => corr undefined => reported as 0.0
    assert length_bias(spans, emb) == 0.0


def test_spearman_perfect_monotone(spark):
    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, 20.0), (3.0, 25.0), (4.0, 100.0)], "a double, b double"
    )
    assert spearman(df, "a", "b") == 1.0
    df2 = spark.createDataFrame(
        [(1.0, 100.0), (2.0, 25.0), (3.0, 20.0), (4.0, 10.0)], "a double, b double"
    )
    assert spearman(df2, "a", "b") == -1.0


def test_neighbor_metrics_shape(spark):
    spans = _spans(spark)
    emb = generate_embeddings(spans, "span_id", "text", "span")
    nm = neighbor_metrics(spans, emb, n_queries=6, k=3)
    rows = nm.collect()
    assert 0 < len(rows) <= 6
    for r in rows:
        assert 0.0 <= r["same_episode_share"] <= 1.0
        assert -1.0 <= r["mean_neighbor_sim"] <= 1.0
    # duplicate texts share identical hash embeddings => deterministic repeat
    again = {r["query_id"]: r["mean_neighbor_sim"] for r in nm.collect()}
    first = {r["query_id"]: r["mean_neighbor_sim"] for r in rows}
    assert again == first

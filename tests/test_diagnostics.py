from __future__ import annotations

from tests.test_embedding_sanity import _spans
from transcription_lakehouse_spark.embeddings import generate_embeddings
from transcription_lakehouse_spark.quality.diagnostics import (
    duration_outliers,
    lexical_vs_embedding_corr,
    neighbor_sample,
    neighbor_theme_coherence,
    similarity_outliers,
)


def test_duration_outliers(spark):
    spans = _spans(spark)
    out = duration_outliers(spans, k=3)
    kinds = [r["outlier_kind"] for r in out.collect()]
    assert kinds.count("longest") == 3 and kinds.count("shortest") == 3


def test_similarity_outliers_and_sample(spark):
    spans = _spans(spark)
    emb = generate_embeddings(spans, "span_id", "text", "span")
    out = similarity_outliers(spans, emb, k=2, sample=10)
    kinds = {r["outlier_kind"] for r in out.collect()}
    assert kinds == {"isolated", "hub"}
    ns = neighbor_sample(spans, emb, n_queries=4, k=2)
    rows = ns.collect()
    assert len(rows) == 8
    assert all(r["query_text"] and r["neighbor_text"] for r in rows)


def test_theme_coherence_verdicts(spark):
    nt = spark.createDataFrame(
        [
            ("q1", "tax tax tax tax money"),
            ("q1", "tax law tax money tax"),
            ("q2", "a1 b2 c3 d4 e5 k1 l2 m3 n4 o5"),
            ("q2", "f6 g7 h8 i9 j0 p6 q7 r8 s9 t0"),
        ],
        "query_id string, neighbor_text string",
    )
    v = {r["query_id"]: r["verdict"] for r in neighbor_theme_coherence(nt).collect()}
    assert v["q1"] == "coherent"
    assert v["q2"] == "random"


def test_lexical_vs_embedding_corr_shape(spark):
    spans = _spans(spark)
    emb = generate_embeddings(spans, "span_id", "text", "span")
    out = lexical_vs_embedding_corr(spans, emb, n_pairs=20)
    assert -1.0 <= out["pearson"] <= 1.0
    assert out["n_pairs"] > 0

from __future__ import annotations

import json
import os

from transcription_lakehouse_spark.catalogs.schema_manifest import schema_manifest
from transcription_lakehouse_spark.quality.assessor import assess
from transcription_lakehouse_spark.quality.reporter import write_report
from transcription_lakehouse_spark.quality.router import DEFAULT_ROUTING, ValidatorRouter

from tests.test_quality import episodes_df, spans_df


def test_report_tree_inventory_matches_reference(spark, tmp_path):
    """Golden-fixture check of the report-tree contract: file inventory,
    CSV column sets, and markdown section headers at reference granularity
    (reference reporter.py:113-157, diagnostics.py:290-431)."""
    import csv

    from transcription_lakehouse_spark.embeddings import generate_embeddings
    from transcription_lakehouse_spark.quality.reporter import (
        NEIGHBOR_COLUMNS,
        OUTLIER_COLUMNS,
        REPORT_FILES,
    )

    spans = spans_df(spark)
    emb = generate_embeddings(spans, "span_id", "text", "span", dim=8)
    a = assess(spans, episodes_df(spark))
    rep = write_report(a, str(tmp_path), spans=spans, embeddings=emb)

    # inventory: every contracted file exists, plus both diagnostics CSVs
    for rel in REPORT_FILES:
        assert os.path.exists(os.path.join(rep, rel)), rel
    for rel in ("diagnostics/outliers.csv", "diagnostics/neighbors_sample.csv"):
        assert os.path.exists(os.path.join(rep, rel)), rel

    # diagnostics CSVs carry exactly the reference column sets
    with open(os.path.join(rep, "diagnostics", "outliers.csv")) as f:
        out_rows = list(csv.DictReader(f))
    assert list(out_rows[0].keys()) == OUTLIER_COLUMNS
    assert {r["category"] for r in out_rows} >= {"longest", "shortest"}
    assert all(len(r["text_excerpt"]) <= 100 for r in out_rows)
    with open(os.path.join(rep, "diagnostics", "neighbors_sample.csv")) as f:
        nbr_rows = list(csv.DictReader(f))
    assert list(nbr_rows[0].keys()) == NEIGHBOR_COLUMNS
    assert {r["same_speaker"] for r in nbr_rows} <= {"True", "False"}

    # global.json: per-category keys + violations list + thresholds echoed
    with open(os.path.join(rep, "metrics", "global.json")) as f:
        g = json.load(f)
    assert g["metadata"]["rag_status"] == a.status
    assert set(g) >= {"coverage", "distribution", "integrity", "balance",
                      "text_quality", "violations", "thresholds_used"}
    assert g["violations"]["total_count"] == len(a.violations)
    assert len(g["violations"]["violations_list"]) == len(a.violations)
    assert g["thresholds_used"]["min_coverage_pct"] == 80.0

    # markdown: one section per category, thresholds and verdict present
    md = open(os.path.join(rep, "report", "quality_report.md")).read()
    for header in ("## Executive Summary", "## Configuration", "## Coverage",
                   "## Distribution", "## Integrity", "## Speaker Balance",
                   "## Text Quality", "## Outliers",
                   "## Findings and Remediation", "## Go/No-Go Recommendation"):
        assert header in md, header
    assert f"RAG status: {a.status}" in md

    # per-key CSVs under metrics/
    with open(os.path.join(rep, "metrics", "episodes.csv")) as f:
        ep_rows = list(csv.DictReader(f))
    assert "coverage_pct" in ep_rows[0]
    with open(os.path.join(rep, "metrics", "speakers.csv")) as f:
        sp_rows = list(csv.DictReader(f))
    assert {"speaker", "n_segments", "pct_duration"} <= set(sp_rows[0])


def test_report_tree_without_diagnostics_inputs(spark, tmp_path):
    a = assess(spans_df(spark), episodes_df(spark))
    rep = write_report(a, str(tmp_path))
    assert os.path.exists(os.path.join(rep, "report", "quality_report.md"))
    assert not os.path.exists(os.path.join(rep, "diagnostics", "outliers.csv"))
    md = open(os.path.join(rep, "report", "quality_report.md")).read()
    assert "outlier CSVs omitted" in md


def test_router_defaults():
    r = ValidatorRouter()
    assert r.applies("coverage", "spans")
    assert not r.applies("coverage", "beats")
    assert "integrity" in r.checks_for("beats")
    assert set(DEFAULT_ROUTING) >= {"coverage", "integrity", "balance"}


def test_schema_manifest(spark):
    m = schema_manifest(
        spark, {"spans": spans_df(spark), "episodes": episodes_df(spark)}
    )
    rows = m.collect()
    arts = {r["artifact"] for r in rows}
    assert arts == {"spans", "episodes"}
    span_cols = [r["column_name"] for r in rows if r["artifact"] == "spans"]
    assert span_cols[0] == "span_id"  # position-ordered

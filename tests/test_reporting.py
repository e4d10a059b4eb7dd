from __future__ import annotations

import json
import os

from transcription_lakehouse_spark.catalogs.schema_manifest import schema_manifest
from transcription_lakehouse_spark.quality.assessor import assess
from transcription_lakehouse_spark.quality.reporter import write_report
from transcription_lakehouse_spark.quality.router import DEFAULT_ROUTING, ValidatorRouter

from tests.test_quality import episodes_df, spans_df


def test_report_tree(spark, tmp_path):
    a = assess(spans_df(spark), episodes_df(spark))
    rep = write_report(a, str(tmp_path))
    with open(os.path.join(rep, "global.json")) as f:
        g = json.load(f)
    assert g["status"] == a.status
    assert os.path.exists(os.path.join(rep, "quality_assessment.md"))
    assert os.path.exists(os.path.join(rep, "coverage.csv"))
    md = open(os.path.join(rep, "quality_assessment.md")).read()
    assert f"Status: {a.status}" in md


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

"""Quality report rendering (S16) — the reference's multi-file report tree
(`/root/reference/src/lakehouse/quality/reporter.py:113-157,947-1234,
1236-1326`, `quality/diagnostics.py:290-431`):

    <out>/<UTC stamp>/
        report/quality_report.md        per-category sections, thresholds,
                                        findings, go/no-go recommendation
        metrics/global.json             metadata + per-category scalars +
                                        violations list + thresholds used
        metrics/episodes.csv            per-episode coverage detail
        metrics/speakers.csv            speaker balance detail
        diagnostics/outliers.csv        duration/similarity outliers at the
                                        reference column granularity
        diagnostics/neighbors_sample.csv  query->neighbor review sample

Everything renders driver-side from collected metric rows (bounded:
O(categories) + the assessor's capped detail lists + k-row outlier/neighbor
samples), never from O(rows) data.
"""

from __future__ import annotations

import csv
import json
import os
from datetime import datetime, timezone

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .assessor import Assessment, Thresholds

__all__ = ["write_report", "REPORT_FILES", "OUTLIER_COLUMNS", "NEIGHBOR_COLUMNS"]

# inventory contract, pinned by tests against a golden fixture
REPORT_FILES = (
    "report/quality_report.md",
    "metrics/global.json",
    "metrics/episodes.csv",
    "metrics/speakers.csv",
)

OUTLIER_COLUMNS = [
    "category",
    "segment_id",
    "episode_id",
    "speaker_id",
    "duration",
    "start_time",
    "metric_name",
    "metric_value",
    "text_excerpt",
]

NEIGHBOR_COLUMNS = [
    "sample_id",
    "query_segment_id",
    "query_episode_id",
    "query_speaker_id",
    "query_duration",
    "query_text_excerpt",
    "neighbor_rank",
    "neighbor_segment_id",
    "neighbor_episode_id",
    "neighbor_speaker_id",
    "neighbor_duration",
    "similarity",
    "same_speaker",
    "same_episode",
    "neighbor_text_excerpt",
]

_EXCERPT_LEN = 100


def _excerpt(text: str | None, max_length: int = _EXCERPT_LEN) -> str:
    t = (text or "").replace("\n", " ").strip()
    return t if len(t) <= max_length else t[: max_length - 3] + "..."


def _write_csv(path: str, rows: list[dict], fieldnames: list[str] | None = None) -> None:
    names = fieldnames or (list(rows[0].keys()) if rows else [])
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=names, extrasaction="ignore")
        w.writeheader()
        w.writerows(rows)


def _ascii_bar(value: float, total: float, width: int = 40) -> str:
    n = 0 if total <= 0 else int(round(width * value / total))
    return "#" * min(n, width)


def _outlier_rows(spans: DataFrame, embeddings: DataFrame | None) -> list[dict]:
    """Reference outlier battery (`diagnostics.py:290-352`): longest/shortest
    by duration, plus isolated/hub by mean neighbor similarity when
    embeddings are present — enriched to the reference column set."""
    from .diagnostics import duration_outliers, similarity_outliers

    meta = spans.select(
        F.col("span_id").alias("segment_id"),
        "episode_id",
        F.col("speaker").alias("speaker_id"),
        F.round("duration", 2).alias("duration"),
        F.round("start_time", 2).alias("start_time"),
        "text",
    )
    dur = (
        duration_outliers(spans)
        .select(F.col("span_id").alias("segment_id"), "outlier_kind")
        .join(meta, "segment_id")
        .collect()
    )
    rows = [
        {
            "category": r["outlier_kind"],
            "segment_id": r["segment_id"],
            "episode_id": r["episode_id"],
            "speaker_id": r["speaker_id"],
            "duration": r["duration"],
            "start_time": r["start_time"],
            "metric_name": "duration",
            "metric_value": r["duration"],
            "text_excerpt": _excerpt(r["text"]),
        }
        for r in dur
    ]
    if embeddings is not None:
        sim = (
            similarity_outliers(spans, embeddings)
            .select(F.col("query_id").alias("segment_id"), "outlier_kind",
                    "mean_neighbor_sim")
            .join(meta, "segment_id")
            .collect()
        )
        rows += [
            {
                "category": r["outlier_kind"],
                "segment_id": r["segment_id"],
                "episode_id": r["episode_id"],
                "speaker_id": r["speaker_id"],
                "duration": r["duration"],
                "start_time": r["start_time"],
                "metric_name": "mean_neighbor_similarity",
                "metric_value": round(r["mean_neighbor_sim"], 4),
                "text_excerpt": _excerpt(r["text"]),
            }
            for r in sim
        ]
    return rows


def _neighbor_rows(spans: DataFrame, embeddings: DataFrame) -> list[dict]:
    """Reference neighbor review sample (`diagnostics.py:354-431`):
    query rows fanned out per neighbor with same-speaker/episode flags."""
    from .diagnostics import neighbor_sample

    meta = spans.select(
        "span_id",
        "episode_id",
        F.col("speaker").alias("speaker_id"),
        F.round("duration", 2).alias("duration"),
    )
    q_meta = meta.select(
        F.col("span_id").alias("query_id"),
        F.col("episode_id").alias("query_episode_id"),
        F.col("speaker_id").alias("query_speaker_id"),
        F.col("duration").alias("query_duration"),
    )
    n_meta = meta.select(
        F.col("span_id").alias("neighbor_id"),
        F.col("episode_id").alias("neighbor_episode_id"),
        F.col("speaker_id").alias("neighbor_speaker_id"),
        F.col("duration").alias("neighbor_duration"),
    )
    ns = neighbor_sample(spans, embeddings)
    got = (
        ns.join(q_meta, "query_id")
        .join(n_meta, "neighbor_id")
        .orderBy("query_id", "rank")
        .collect()
    )
    sample_ids = {qid: i for i, qid in enumerate(sorted({r["query_id"] for r in got}))}
    return [
        {
            "sample_id": sample_ids[r["query_id"]],
            "query_segment_id": r["query_id"],
            "query_episode_id": r["query_episode_id"],
            "query_speaker_id": r["query_speaker_id"],
            "query_duration": r["query_duration"],
            "query_text_excerpt": _excerpt(r["query_text"]),
            "neighbor_rank": r["rank"],
            "neighbor_segment_id": r["neighbor_id"],
            "neighbor_episode_id": r["neighbor_episode_id"],
            "neighbor_speaker_id": r["neighbor_speaker_id"],
            "neighbor_duration": r["neighbor_duration"],
            "similarity": round(r["sim"], 4),
            "same_speaker": r["query_speaker_id"] == r["neighbor_speaker_id"],
            "same_episode": r["query_episode_id"] == r["neighbor_episode_id"],
            "neighbor_text_excerpt": _excerpt(r["neighbor_text"]),
        }
        for r in got
    ]


def _markdown(assessment: Assessment, th: Thresholds, stamp: str,
              have_diagnostics: bool) -> str:
    m = assessment.metrics
    errs = [v for v in assessment.violations if v.severity == "error"]
    warns = [v for v in assessment.violations if v.severity == "warning"]
    s: list[str] = []

    s += ["# Quality Assessment Report", "",
          f"Generated: {stamp} UTC", ""]

    # --- executive summary (`reporter.py:162-216`)
    s += ["## Executive Summary", "",
          f"**RAG status: {assessment.status}**", "",
          f"- Errors: {len(errs)}",
          f"- Warnings: {len(warns)}", ""]

    # --- configuration (`reporter.py:457-470`)
    s += ["## Configuration", "",
          "| Threshold | Value |", "|---|---|",
          f"| min_coverage_pct | {th.min_coverage_pct} |",
          f"| span_len_range | {list(th.span_len_range)} |",
          f"| beat_len_range | {list(th.beat_len_range)} |",
          f"| min_len_compliance_pct | {th.min_len_compliance_pct} |",
          f"| max_duplicate_groups | {th.max_duplicate_groups} |",
          f"| max_regressions | {th.max_regressions} |",
          f"| max_integrity_violations | {th.max_integrity_violations} |",
          f"| random_seed | {th.random_seed} |", ""]

    # --- coverage (`reporter.py:527-546`)
    cs = m.get("coverage_summary", {})
    s += ["## Coverage", "",
          f"- Episodes assessed: {cs.get('n_episodes', 'n/a')}",
          f"- Below {th.min_coverage_pct}% threshold: "
          f"{cs.get('n_below_threshold', 'n/a')}",
          f"- Average coverage: {cs.get('avg_coverage_pct', 'n/a')}%",
          f"- Minimum coverage: {cs.get('min_coverage_pct', 'n/a')}%",
          "", "Worst episodes in `metrics/episodes.csv`.", ""]

    # --- distribution (`reporter.py:547-595`)
    sd = m.get("span_duration", {})
    comp = m.get("span_compliance", {})
    s += ["## Distribution", "",
          "| Metric | Value |", "|---|---|"]
    for key in ("n", "mean", "p50", "stddev", "min_d", "max_d"):
        if key in sd:
            s.append(f"| span duration {key} | {sd[key]} |")
    if comp:
        s.append(f"| span length compliance | {comp.get('pct_in_range')}% "
                 f"(target >= {th.min_len_compliance_pct}%) |")
    bc = m.get("beat_compliance")
    if bc:
        s.append(f"| beat length compliance | {bc.get('pct_in_range')}% |")
    s.append("")

    # --- integrity (`reporter.py:596-630`)
    ic = m.get("integrity", {})
    s += ["## Integrity", "",
          "| Check | Count | Threshold |", "|---|---|---|"]
    for key, val in sorted(ic.items()):
        s.append(f"| {key} | {val} | {th.max_integrity_violations} |")
    s += [f"| exact duplicate groups | {m.get('duplicate_groups', 0)} "
          f"| {th.max_duplicate_groups} |",
          f"| timestamp regressions | {m.get('regressions', 0)} "
          f"| {th.max_regressions} |", ""]

    # --- balance (`reporter.py:631-652`) with ASCII share bars
    bal = m.get("speaker_balance", [])
    s += ["## Speaker Balance", ""]
    if bal:
        s += ["| Speaker | Segments | Share | |", "|---|---|---|---|"]
        for r in bal[:10]:
            pct = r.get("pct_duration") or 0.0
            s.append(
                f"| {r.get('speaker')} | {r.get('n_segments')} | {pct}% "
                f"| `{_ascii_bar(pct, 100.0, 20)}` |"
            )
        if len(bal) > 10:
            s.append(f"| ... {len(bal) - 10} more in metrics/speakers.csv | | | |")
    s.append("")

    # --- text quality (`reporter.py:653-692`)
    tx = m.get("text", {})
    s += ["## Text Quality", "",
          "| Metric | Value |", "|---|---|"]
    for key, val in sorted(tx.items()):
        s.append(f"| {key} | {val} |")
    s.append("")

    # --- outliers (`reporter.py:785-804`)
    s += ["## Outliers", ""]
    s.append(
        "See `diagnostics/outliers.csv` and `diagnostics/neighbors_sample.csv`."
        if have_diagnostics
        else "Diagnostics inputs not provided; outlier CSVs omitted."
    )
    s.append("")

    # --- findings & remediation (`reporter.py:329-375`)
    s += ["## Findings and Remediation", ""]
    if assessment.violations:
        by_cat: dict[str, list] = {}
        for v in assessment.violations:
            by_cat.setdefault(v.category, []).append(v)
        for cat in sorted(by_cat):
            s.append(f"### {cat}")
            s.append("")
            for v in by_cat[cat]:
                s.append(f"- [{v.severity}] {v.check}: {v.value} "
                         f"(threshold {v.threshold})")
            s.append("")
    else:
        s += ["No violations.", ""]

    # --- go/no-go (`reporter.py:376-446`)
    verdict = {
        "GREEN": "GO — all checks passed.",
        "AMBER": "GO WITH CAUTION — warnings present; review findings.",
        "RED": "NO-GO — errors present; remediate before downstream use.",
    }[assessment.status]
    s += ["## Go/No-Go Recommendation", "", verdict, "",
          "---", f"_Report generated by the quality assessor at {stamp} UTC._"]
    return "\n".join(s) + "\n"


def write_report(
    assessment: Assessment,
    out_dir: str,
    spans: DataFrame | None = None,
    embeddings: DataFrame | None = None,
    thresholds: Thresholds | None = None,
) -> str:
    """Render the full report tree; returns the report directory.

    ``spans``/``embeddings`` are optional: when provided, the diagnostics
    CSVs (outliers, neighbor samples) are produced at reference column
    granularity; without them only the metrics tree is written. Thresholds resolve to
    the ones the assessor actually applied (carried on ``assessment``)
    unless explicitly overridden."""
    th = thresholds or assessment.thresholds or Thresholds()
    stamp = datetime.now(timezone.utc).strftime("%Y%m%d_%H%M%S")
    rep_dir = os.path.join(out_dir, stamp)
    metrics_dir = os.path.join(rep_dir, "metrics")
    report_dir = os.path.join(rep_dir, "report")
    diag_dir = os.path.join(rep_dir, "diagnostics")
    for d in (metrics_dir, report_dir, diag_dir):
        os.makedirs(d, exist_ok=True)

    errs = [v for v in assessment.violations if v.severity == "error"]
    warns = [v for v in assessment.violations if v.severity == "warning"]
    global_metrics = {
        "metadata": {
            "assessment_timestamp": stamp,
            "rag_status": assessment.status,
        },
        "coverage": assessment.metrics.get("coverage_summary", {}),
        "distribution": {
            "spans": assessment.metrics.get("span_duration", {}),
            "span_compliance": assessment.metrics.get("span_compliance", {}),
            "beat_compliance": assessment.metrics.get("beat_compliance", {}),
        },
        "integrity": {
            "counts": assessment.metrics.get("integrity", {}),
            "exact_duplicate_groups": assessment.metrics.get("duplicate_groups", 0),
            "timestamp_regressions": assessment.metrics.get("regressions", 0),
        },
        "balance": {"n_rows": len(assessment.metrics.get("speaker_balance", []))},
        "text_quality": assessment.metrics.get("text", {}),
        "violations": {
            "total_count": len(assessment.violations),
            "error_count": len(errs),
            "warning_count": len(warns),
            "violations_list": [v.as_dict() for v in assessment.violations],
        },
        "thresholds_used": {
            "min_coverage_pct": th.min_coverage_pct,
            "span_len_range": list(th.span_len_range),
            "beat_len_range": list(th.beat_len_range),
            "min_len_compliance_pct": th.min_len_compliance_pct,
            "max_duplicate_groups": th.max_duplicate_groups,
            "max_regressions": th.max_regressions,
            "max_integrity_violations": th.max_integrity_violations,
            "random_seed": th.random_seed,
        },
    }
    with open(os.path.join(metrics_dir, "global.json"), "w") as f:
        json.dump(global_metrics, f, indent=2, sort_keys=True, default=str)

    _write_csv(
        os.path.join(metrics_dir, "episodes.csv"),
        assessment.metrics.get("coverage", []),
    )
    _write_csv(
        os.path.join(metrics_dir, "speakers.csv"),
        assessment.metrics.get("speaker_balance", []),
    )

    have_diag = spans is not None
    if spans is not None:
        _write_csv(
            os.path.join(diag_dir, "outliers.csv"),
            _outlier_rows(spans, embeddings),
            OUTLIER_COLUMNS,
        )
        if embeddings is not None:
            _write_csv(
                os.path.join(diag_dir, "neighbors_sample.csv"),
                _neighbor_rows(spans, embeddings),
                NEIGHBOR_COLUMNS,
            )

    with open(os.path.join(report_dir, "quality_report.md"), "w") as f:
        f.write(_markdown(assessment, th, stamp, have_diag))
    return rep_dir

"""Quality assessment orchestration + RAG verdict (A23).

Mirrors `/root/reference/src/lakehouse/quality/assessor.py:467-843` +
`thresholds.py:13-27`: run the category A-G metric batteries, compare the
collected scalars against thresholds, accumulate violations, and decide
GREEN / AMBER / RED. Metric computation is distributed; threshold logic runs
on collected scalars at the driver (they are O(categories), not O(rows)).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .metrics import (
    coverage_metrics,
    duplicate_groups,
    duration_stats,
    integrity_counts,
    length_compliance,
    speaker_balance,
    text_metrics,
    timestamp_regressions,
)

__all__ = ["Thresholds", "Violation", "assess"]


@dataclass
class Thresholds:
    """Defaults from `quality/thresholds.py:28-82`."""

    min_coverage_pct: float = 80.0
    span_len_range: tuple[float, float] = (20.0, 120.0)
    beat_len_range: tuple[float, float] = (60.0, 180.0)
    min_len_compliance_pct: float = 50.0
    max_duplicate_groups: int = 0
    max_regressions: int = 0
    max_integrity_violations: int = 0
    random_seed: int = 42


@dataclass
class Violation:
    category: str
    check: str
    severity: str  # "error" | "warning"
    value: float
    threshold: float

    def as_dict(self) -> dict:
        return self.__dict__.copy()


@dataclass
class Assessment:
    status: str  # GREEN / AMBER / RED
    violations: list[Violation] = field(default_factory=list)
    metrics: dict = field(default_factory=dict)


def _rag(violations: list[Violation]) -> str:
    """`assessor.py:1040-1069`: any error ⇒ RED; any warning ⇒ AMBER."""
    if any(v.severity == "error" for v in violations):
        return "RED"
    if violations:
        return "AMBER"
    return "GREEN"


def assess(
    spans: DataFrame,
    episodes: DataFrame,
    beats: DataFrame | None = None,
    thresholds: Thresholds | None = None,
) -> Assessment:
    th = thresholds or Thresholds()
    violations: list[Violation] = []
    metrics: dict = {}

    # A: coverage
    cov = coverage_metrics(spans, episodes)
    cov_rows = cov.collect()
    metrics["coverage"] = [r.asDict() for r in cov_rows]
    for r in cov_rows:
        if r["coverage_pct"] < th.min_coverage_pct:
            violations.append(
                Violation("coverage", f"episode {r['episode_id']}", "warning",
                          r["coverage_pct"], th.min_coverage_pct)
            )

    # B: distribution
    metrics["span_duration"] = duration_stats(spans).collect()[0].asDict()
    comp = length_compliance(spans, *th.span_len_range)
    metrics["span_compliance"] = comp
    if comp["pct_in_range"] < th.min_len_compliance_pct:
        violations.append(
            Violation("distribution", "span length compliance", "warning",
                      comp["pct_in_range"], th.min_len_compliance_pct)
        )

    # C: integrity
    ic = integrity_counts(spans)
    metrics["integrity"] = ic
    bad = sum(ic.values())
    if bad > th.max_integrity_violations:
        violations.append(
            Violation("integrity", "violation counts", "error", bad,
                      th.max_integrity_violations)
        )
    n_dup = duplicate_groups(spans).count()
    metrics["duplicate_groups"] = n_dup
    if n_dup > th.max_duplicate_groups:
        violations.append(
            Violation("integrity", "exact duplicate groups", "warning", n_dup,
                      th.max_duplicate_groups)
        )
    regs = timestamp_regressions(spans).agg(
        F.sum("episode_regressions").alias("r")
    ).collect()[0]["r"] or 0
    metrics["regressions"] = int(regs)
    if regs > th.max_regressions:
        violations.append(
            Violation("integrity", "timestamp regressions", "warning", regs,
                      th.max_regressions)
        )

    # D: balance
    metrics["speaker_balance"] = [
        r.asDict() for r in speaker_balance(spans).collect()
    ]

    # E: text quality
    metrics["text"] = text_metrics(spans).collect()[0].asDict()

    # B for beats (optional)
    if beats is not None:
        metrics["beat_compliance"] = length_compliance(beats, *th.beat_len_range)

    return Assessment(status=_rag(violations), violations=violations, metrics=metrics)

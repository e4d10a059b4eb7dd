"""Quality report rendering (S16) — the reference's multi-file report tree
(`/root/reference/src/lakehouse/quality/assessor.py:993-1039`,
`quality/reporter.py`): global.json + per-table CSVs + a human-readable
markdown summary, rendered driver-side from collected metric DataFrames
(reports are O(categories), not O(rows))."""

from __future__ import annotations

import csv
import json
import os
from datetime import datetime, timezone

from .assessor import Assessment

__all__ = ["write_report"]


def _write_csv(path: str, rows: list[dict]) -> None:
    if not rows:
        return
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)


def write_report(assessment: Assessment, out_dir: str) -> str:
    """Render the report tree; returns the report directory."""
    stamp = datetime.now(timezone.utc).strftime("%Y%m%d_%H%M%S")
    rep_dir = os.path.join(out_dir, stamp)
    os.makedirs(rep_dir, exist_ok=True)

    with open(os.path.join(rep_dir, "global.json"), "w") as f:
        json.dump(
            {
                "status": assessment.status,
                "violations": [v.as_dict() for v in assessment.violations],
                "metrics": {
                    k: v
                    for k, v in assessment.metrics.items()
                    if not isinstance(v, list)
                },
            },
            f,
            indent=2,
            sort_keys=True,
            default=str,
        )

    for name in ("coverage", "speaker_balance"):
        rows = assessment.metrics.get(name)
        if isinstance(rows, list) and rows:
            _write_csv(os.path.join(rep_dir, f"{name}.csv"), rows)

    lines = [
        "# Quality assessment",
        "",
        f"**Status: {assessment.status}**",
        "",
        f"Generated: {stamp} UTC",
        "",
        "## Violations",
        "",
    ]
    if assessment.violations:
        lines += [
            f"- [{v.severity}] {v.category}/{v.check}: {v.value} "
            f"(threshold {v.threshold})"
            for v in assessment.violations
        ]
    else:
        lines.append("none")
    lines += ["", "## Metrics", ""]
    for k, v in sorted(assessment.metrics.items()):
        if not isinstance(v, list):
            lines.append(f"- **{k}**: {v}")
    with open(os.path.join(rep_dir, "quality_assessment.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return rep_dir

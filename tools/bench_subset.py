#!/usr/bin/env python3
"""Re-measure a named subset of bench queries on the current host, with
the same warmup + best-of-N discipline as bench.py, plus the q1
calibration scalar — the adjudication tool for driver-bench outliers
(round-6 verdict ask: 6 shared queries >1.3x with no written cause).

Usage:
    python tools/bench_subset.py q9_product_profit evt_hll_cardinality ...
    python tools/bench_subset.py --runs 3 <names...>

Prints one JSON line: {"queries": {name: best_sec}, "calibration_sec": s,
"load_1min": x}. Compare each best against the PREVIOUS round's artifact
value scaled by (calibration_cur / calibration_prev).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py)
from transcription_lakehouse_spark.session import get_spark  # noqa: E402
from transcription_lakehouse_spark.sources.tables import load_tables  # noqa: E402
from transcription_lakehouse_spark.workload import QUERIES  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    max_cal = None
    while args and args[0] in ("--runs", "--max-cal"):
        if args[0] == "--runs":
            runs = int(args[1])
        else:
            max_cal = float(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench_subset")
    load_start = os.getloadavg()[0]
    for df in load_tables(spark, sf_dir).values():
        df.limit(1).count()

    def _cal() -> float:
        walls = []
        for _ in range(3):
            t0 = time.time()
            QUERIES["q1_pricing_summary"](spark, sf_dir).collect()
            walls.append(time.time() - t0)
        return round(sorted(walls)[1], 3)

    calibration = _cal()
    if max_cal is not None and calibration > max_cal:
        # the box is already contended before any query ran: abort NOW
        # (2 s) instead of minting a contaminated 3-minute measurement
        print(json.dumps({
            "aborted": "calibration above --max-cal",
            "calibration_sec": calibration, "max_cal": max_cal,
            "load_1min_start": load_start,
            "load_1min": os.getloadavg()[0],
        }))
        return

    timings: dict[str, float] = {}
    for name in names:
        fn = QUERIES.get(name) or bench.SCALED.get(name)
        if fn is None:
            raise SystemExit(f"unknown query {name}")
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            (fn(spark, sf_dir) if name in QUERIES else fn(spark, sf_dir)).collect()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # post-run calibration + before/after load: a subset verdict is only
    # admissible when the window stayed quiet END TO END (the r9 burst
    # instrumentation — a wave arriving mid-suite shows up as cal_post >>
    # cal or load_1min >> load_1min_start, and the run self-reports as
    # contaminated instead of minting a phantom regression)
    cal_post = _cal()
    print(json.dumps({
        "queries": timings,
        "calibration_sec": calibration,
        "calibration_post_sec": cal_post,
        "calibration_query": "q1_pricing_summary_median3",
        "runs": runs,
        "load_1min_start": load_start,
        "load_1min": os.getloadavg()[0],
        "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()

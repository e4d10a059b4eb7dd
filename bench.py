"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced to full materialization via collect() (all outputs are
small aggregates / top-k lists).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from transcription_lakehouse_spark.session import get_spark  # noqa: E402
from transcription_lakehouse_spark.workload import QUERIES  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "q_top_parts_per_brand",
    "evt_user_catalog",
    "evt_sessions",
    "evt_interval_union",
    "evt_max_concurrency",
    "doc_token_stats",
    "doc_top_unigrams",
    "doc_ngram_jaccard_topk",
    "doc_fingerprints",
    "vec_knn_bruteforce",
    "vec_knn_lsh",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="bench")
    # warmup: JVM/codegen spin-up + parquet footer reads are session costs,
    # not query costs — touch each table once before timing
    from transcription_lakehouse_spark.sources.tables import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.limit(1).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.time() - t0, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Physical-plan inspection helpers — the ".explain and iterate" loop as
code, so plan quality is testable and regressions fail CI.

At 100 TB the plan IS the product: a scan without PushedFilters re-reads
whole row groups; a missing broadcast turns a dimension join into a full
shuffle; an extra Exchange doubles the job's network cost. tests/test_plans.py
pins the expected shapes for the headline queries.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "scan_read_schemas",
    "count_exchanges",
    "broadcast_join_count",
    "shuffle_join_count",
    "wholestage_codegen_spans",
]


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across all parquet scans in the plan."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — verifies column pruning reached parquet."""
    plan = formatted_plan(df)
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan)


def count_exchanges(df: DataFrame) -> int:
    """Shuffle-exchange count (AQE may collapse at runtime; this is the
    static upper bound). Formatted plans list each operator once in the
    numbered detail section as '(N) Exchange' + an Arguments line."""
    plan = formatted_plan(df)
    return plan.count("Arguments: hashpartitioning") + plan.count(
        "Arguments: rangepartitioning"
    )


def broadcast_join_count(df: DataFrame) -> int:
    """Any broadcast-side join (hash or nested-loop)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Broadcast(?:Hash|NestedLoop)Join", plan))


def shuffle_join_count(df: DataFrame) -> int:
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan))


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of whole-stage-codegen regions (formatted plans tag operators
    with '[codegen id : N]')."""
    return len(set(re.findall(r"\[codegen id : (\d+)\]", formatted_plan(df))))

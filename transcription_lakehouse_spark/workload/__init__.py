"""Query workload: every operator from SURVEY §2 expressed over the driver
testdata, each with a DuckDB oracle-SQL twin for the correctness gate.

Submodules register (name -> callable(spark, sf_dir) -> DataFrame) in
``QUERIES`` and (name -> ANSI SQL | None) in ``ORACLES``; ``None`` marks a
non-SQL-expressible operator (driver records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import events, relational, relational2, text, transcript, vectors

_MODULES = (relational, relational2, events, text, vectors, transcript)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for _m in _MODULES:
    QUERIES.update(_m.QUERIES)
    for _name, _sql in _m.ORACLES.items():
        if _sql is not None:
            ORACLES[_name] = _sql

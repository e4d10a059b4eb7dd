"""Local mirror of the driver's correctness gate.

Runs every __spark_entry__.queries() entry and its oracle_sql() twin (DuckDB,
tables registered as views over the same parquet) and compares:
row count, sorted column names, and an order-insensitive value hash.

Bit-faithful to the driver: both sides are materialized through *pandas*
(`toPandas()` / duckdb `.df()`) so engine-side typing artifacts surface here
exactly as they do in the driver — notably DuckDB HUGEINT/DECIMAL, which
pandas coerces to float64 and which therefore hash differently from Spark's
int64 even when every value is numerically equal. Floats NEVER collapse to
int strings (the round-1 masking bug): int64 5 and float64 5.0 are distinct.

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return "NULL"  # pandas stores missing ints as NaN; treat uniformly
        return repr(v)  # NO int collapse: float64 must differ from int64
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _pdf_lines(pdf: pd.DataFrame) -> list[str]:
    cols = sorted(pdf.columns)
    arrs = [pdf[c].to_numpy() for c in cols]
    n = len(pdf)
    return sorted(
        "\x1f".join(_norm_cell(arr[i]) for arr in arrs) for i in range(n)
    )


def table_hash(pdf: pd.DataFrame) -> str:
    h = hashlib.md5()
    for line in _pdf_lines(pdf):
        h.update(line.encode())
        h.update(b"\x1e")
    return h.hexdigest()


def _dtype_kind(dt) -> str:
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    return "obj"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from transcription_lakehouse_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(spdf)} rows, {spark_t:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            # surface risky oracle types BEFORE they reach pandas: HUGEINT
            # and DECIMAL coerce to float64 in .df() and will hash-mismatch
            risky = [
                (d[0], str(d[1]))
                for d in res.description
                if "HUGEINT" in str(d[1]).upper() or "DECIMAL" in str(d[1]).upper()
            ]
            opdf = res.df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if risky:
            problems.append(
                f"oracle type risk (CAST to BIGINT/DOUBLE): {risky}"
            )
        if len(spdf) != len(opdf):
            problems.append(f"rowcount spark={len(spdf)} duckdb={len(opdf)}")
        if sorted(spdf.columns) != sorted(opdf.columns):
            problems.append(
                f"cols spark={sorted(spdf.columns)} duckdb={sorted(opdf.columns)}"
            )
        else:
            dt_mismatch = [
                (c, _dtype_kind(spdf[c].dtype), _dtype_kind(opdf[c].dtype))
                for c in spdf.columns
                if _dtype_kind(spdf[c].dtype) != _dtype_kind(opdf[c].dtype)
                and len(spdf) > 0
            ]
            if dt_mismatch:
                problems.append(f"dtype mismatch (col, spark, duckdb): {dt_mismatch}")
        if not problems:
            sh, oh = table_hash(spdf), table_hash(opdf)
            if sh != oh:
                problems.append("value-hash mismatch")
                sset, oset = set(_pdf_lines(spdf)), set(_pdf_lines(opdf))
                for d in sorted(sset - oset)[:3]:
                    print(f"    spark-only: {d!r}")
                for d in sorted(oset - sset)[:3]:
                    print(f"    duck-only:  {d!r}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"PASS {name} ({len(spdf)} rows, {spark_t:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

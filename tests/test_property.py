"""Property-based tests: the window-composition operators must agree with
naive single-machine oracles on arbitrary inputs (a tier the reference's own
suite lacks — SURVEY §5 'no property-based testing')."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from transcription_lakehouse_spark.operators.intervals import (
    merged_intervals,
    monotonicity_violations,
    sweep_concurrency,
)
from transcription_lakehouse_spark.operators.sessionization import with_session_id

# bounded, deduplicated interval lists keep each Spark round-trip fast
_intervals = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1000),
        st.integers(min_value=1, max_value=200),
    ),
    min_size=1,
    max_size=12,
)

_SETTINGS = dict(max_examples=12, deadline=None)


def _naive_union(iv: list[tuple[int, int]]) -> list[tuple[int, int]]:
    out: list[list[int]] = []
    for s, e in sorted(iv):
        if out and s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return [(s, e) for s, e in out]


@given(_intervals)
@settings(**_SETTINGS)
def test_interval_union_matches_naive(spark, raw):
    iv = [(s, s + d) for s, d in raw]
    df = spark.createDataFrame([("k", s, e) for s, e in iv], "k string, s long, e long")
    got = sorted(
        (r["s"], r["e"]) for r in merged_intervals(df, ["k"], "s", "e").collect()
    )
    assert got == _naive_union(iv)


@given(_intervals)
@settings(**_SETTINGS)
def test_sweep_max_concurrency_matches_naive(spark, raw):
    iv = [(s, s + d) for s, d in raw]
    df = spark.createDataFrame([("k", s, e) for s, e in iv], "k string, s long, e long")
    got = (
        sweep_concurrency(df, ["k"], "s", "e")
        .agg(F.max("active"))
        .collect()[0][0]
    )
    # naive: half-open sweep
    events = sorted(
        [(s, 1) for s, _ in iv] + [(e, -1) for _, e in iv],
        key=lambda t: (t[0], t[1]),
    )
    best = cur = 0
    for _, d in events:
        cur += d
        best = max(best, cur)
    assert got == best


@given(_intervals)
@settings(**_SETTINGS)
def test_monotonicity_matches_naive(spark, raw):
    iv = [(s, s + d) for s, d in raw]
    df = spark.createDataFrame([("k", s, e) for s, e in iv], "k string, s long, e long")
    got = monotonicity_violations(df, ["k"], "s", "e").collect()[0]["n_regressions"]
    srt = sorted(iv)
    naive = sum(1 for a, b in zip(srt, srt[1:]) if a[1] > b[0])
    assert got == naive


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),
            st.sampled_from(["A", "B"]),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
@settings(**_SETTINGS)
def test_sessionization_matches_naive(spark, raw):
    gap = 50
    df = spark.createDataFrame(
        [("k", t, sp) for t, sp in raw], "k string, t long, sp string"
    )
    out = with_session_id(df, ["k"], "t", gap, break_on_change=["sp"]).orderBy("t")
    got = [r["session_id"] for r in out.collect()]
    srt = sorted(raw)
    naive, cur = [], -1
    prev = None
    for t, sp in srt:
        if prev is None or (t - prev[0]) > gap or sp != prev[1]:
            cur += 1
        naive.append(cur)
        prev = (t, sp)
    assert got == naive

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


_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "omega", "kappa"]

_doc_specs = st.lists(
    st.tuples(
        st.lists(st.sampled_from(_WORDS), min_size=20, max_size=30),  # body
        st.booleans(),  # clone the previous doc's text (plant exact dup)
    ),
    min_size=2,
    max_size=8,
)


@given(_doc_specs)
@settings(max_examples=6, deadline=None)
def test_curation_flags_invariants(spark, specs):
    """Curation gate-chain invariants on arbitrary corpora: the stages are
    monotone per row (curated ⇒ exact_keep ⇒ q_ok ⇒ lang_ok), the curated
    set carries no exact duplicates, and exactly one of each duplicated
    quality-surviving text survives the fingerprint stage."""
    from transcription_lakehouse_spark.operators.curation import curation_flags
    from transcription_lakehouse_spark.operators.dedup import fingerprint as _fp

    rows, prev_text = [], None
    for i, (body, clone) in enumerate(specs):
        text = prev_text if (clone and prev_text) else " ".join(body)
        # langid needs target-language markers: prepend English ones
        text = "the is and " + text
        rows.append((f"d{i:03d}", "en", text))
        prev_text = text
    df = spark.createDataFrame(rows, "doc_id string, lang string, text string")
    flags = curation_flags(df).collect()
    by_id = {r["doc_id"]: r for r in flags}
    assert len(by_id) == len(rows)  # no row lost or duplicated by the joins
    for r in flags:
        assert not r["curated"] or r["exact_keep"]
        assert not r["exact_keep"] or r["q_ok"]
        assert not r["q_ok"] or r["lang_ok"]
    # curated set has no exact dups; among q_ok rows each fingerprint keeps
    # exactly one survivor (the lowest id)
    fps = {
        r["doc_id"]: r
        for r in df.select("doc_id", _fp("text").alias("f")).collect()
    }
    from collections import defaultdict

    groups = defaultdict(list)
    for rid, r in by_id.items():
        if r["q_ok"]:
            groups[fps[rid]["f"]].append(rid)
    for f, ids in groups.items():
        keepers = [i for i in ids if by_id[i]["exact_keep"]]
        assert keepers == [min(ids)]


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


_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ),
    min_size=1,
    max_size=25,
)


def _naive_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # normalize: every node labeled by the min node of its component
    roots: dict[int, list[int]] = {}
    for n in parent:
        roots.setdefault(find(n), []).append(n)
    return {n: min(ns) for r, ns in roots.items() for n in ns}


@given(_edges)
@settings(max_examples=8, deadline=None)
def test_connected_components_matches_union_find(spark, edges):
    from transcription_lakehouse_spark.operators.graph import connected_components

    df = spark.createDataFrame(edges, "a int, b int")
    want = _naive_components(edges)
    # self-loop-only nodes are singletons: dropped by the operator
    want = {
        n: c
        for n, c in want.items()
        if any(a != b and n in (a, b) for a, b in edges)
    }
    for algorithm in ("hash-to-min", "two-phase"):
        got = {
            r["node"]: r["component"]
            for r in connected_components(
                df, "a", "b", algorithm=algorithm
            ).collect()
        }
        assert got == want, algorithm


_key_streams = st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=120)


@given(_key_streams)
@settings(max_examples=8, deadline=None)
def test_cms_never_underestimates(spark, keys):
    """Count-min structural guarantee on arbitrary streams: the sketch
    estimate is >= the exact count for EVERY key (min over d counters can
    only include collisions, never miss occurrences)."""
    from collections import Counter

    from transcription_lakehouse_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k int")
    sketch = cms_sketch(df, "k")
    est = {
        r["k"]: r["cms_count"]
        for r in cms_estimate(sketch, df.select("k").distinct(), "k").collect()
    }
    exact = Counter(keys)
    assert set(est) == set(exact)
    for key, c in exact.items():
        assert est[key] >= c, (key, est[key], c)


@given(_key_streams, st.integers(min_value=1, max_value=119))
@settings(max_examples=8, deadline=None)
def test_hll_merge_is_order_and_split_invariant(spark, keys, cut):
    """HLL registers are a max-semilattice: ANY split of the stream merged
    by max equals the whole-stream registers (what makes per-partition /
    per-day sketch maintenance correct)."""
    import pyspark.sql.functions as F

    from transcription_lakehouse_spark.operators.sketches import hll_registers

    cut = cut % len(keys) if len(keys) > 1 else 1
    a, b = keys[:cut] or [keys[0]], keys[cut:] or [keys[-1]]
    df = spark.createDataFrame([(k,) for k in keys], "k int")
    da = spark.createDataFrame([(k,) for k in a], "k int")
    db = spark.createDataFrame([(k,) for k in b], "k int")
    merged = (
        hll_registers(da, "k")
        .unionByName(hll_registers(db, "k"))
        .groupBy("register")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    full = hll_registers(df, "k")
    got = {(r["register"], r["max_rank"]) for r in merged.collect()}
    want = {(r["register"], r["max_rank"]) for r in full.collect()}
    # a split that duplicates a boundary key can only ADD occurrences of
    # existing keys — registers are occurrence-insensitive, so still equal
    assert got == want


@given(
    st.lists(
        st.floats(min_value=-1000, max_value=1000, allow_nan=False),
        min_size=2,
        max_size=150,
    )
)
@settings(max_examples=8, deadline=None)
def test_histogram_quantiles_within_one_bin_width(spark, vals):
    """Sketch-quantile bound on arbitrary value streams: every decile
    estimate lands within one bin width of the exact INVERSE-CDF quantile
    (the definition a cumulative-count estimator targets; numpy's default
    linear interpolation differs by up to one inter-point gap at tiny n)."""
    import numpy as np

    from transcription_lakehouse_spark.operators.sketches import (
        HIST_BINS,
        histogram_quantiles,
        histogram_sketch,
    )

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    sk = histogram_sketch(df, "v")
    qs = [0.1, 0.5, 0.9]
    est = {r["q"]: r["est"] for r in histogram_quantiles(sk, qs).collect()}
    arr = np.asarray(vals)
    width = (arr.max() - arr.min()) / HIST_BINS
    for q in qs:
        exact = float(np.quantile(arr, q, method="inverted_cdf"))
        # + 1e-6: the emitted estimate is rounded to 6 decimals, so the
        # worst case adds EXACTLY 5e-7 — at that boundary (hypothesis
        # found vals=[1.0, 1.5]) float representation of width + 5e-7
        # can land a hair under the true sum; double the margin
        assert abs(est[q] - exact) <= width + 1e-6, (q, est[q], exact, width)


# --- round 5: PCA projection + canonical SemDeDup ------------------------

_vec_sets = st.lists(
    st.lists(
        st.floats(
            min_value=-4.0, max_value=4.0,
            allow_nan=False, allow_infinity=False, width=32,
        ),
        min_size=4, max_size=4,
    ),
    min_size=2, max_size=10,
    unique_by=tuple,
)


@given(_vec_sets)
@settings(max_examples=8, deadline=None)
def test_pca_project_matches_numpy(spark, vecs):
    """`pca_project` (zip_with+aggregate column map) must agree with the
    straightforward numpy (v - mean) @ C.T on arbitrary vectors."""
    import numpy as np

    from transcription_lakehouse_spark.operators.pca import pca_project

    mean = [0.5, -0.25, 1.0, 0.0]
    comps = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 0.6, 0.8, 0.0],
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "id INT, embedding ARRAY<DOUBLE>",
    )
    got = {
        r["id"]: list(r["pca"])
        for r in pca_project(df, "embedding", mean, comps).collect()
    }
    X = np.array(vecs, dtype=np.float64)
    want = (X - np.array(mean)) @ np.array(comps).T
    for i in range(len(vecs)):
        assert np.allclose(got[i], want[i], atol=1e-9), (got[i], want[i])


@given(_vec_sets)
@settings(max_examples=8, deadline=None)
def test_semdedup_kmeans_matches_naive(spark, vecs):
    """`semdedup_kmeans` (GEMM cell pairs → transitive closure → keeper
    ranking) must agree with a single-machine oracle: argmin-d² cell
    assignment (tie → lower cell), within-cell pairwise round(cos,6) ≥ t,
    union-find closure, keeper = least centroid-cosine (tie → lower id)."""
    import math

    from transcription_lakehouse_spark.operators.similarity import (
        semdedup_kmeans,
    )

    cents = [[2.0, 0.0, 0.0, 0.0], [0.0, 2.0, 0.0, 0.0], [-1.0, -1.0, 0.0, 0.0]]
    t = 0.8

    def d2(v, c):
        return sum((x - y) ** 2 for x, y in zip(v, c))

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(
            sum(y * y for y in b)
        )
        return num / den if den > 0 else 0.0

    cell = {
        i: min(range(len(cents)), key=lambda c: (d2(v, cents[c]), c))
        for i, v in enumerate(vecs)
    }
    parent = {i: i for i in range(len(vecs))}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    edges = set()
    for i in range(len(vecs)):
        for j in range(i + 1, len(vecs)):
            if cell[i] == cell[j] and round(cos(vecs[i], vecs[j]), 6) >= t:
                edges.add((i, j))
                a, b = find(i), find(j)
                if a != b:
                    parent[max(a, b)] = min(a, b)
    in_graph = {n for e in edges for n in e}
    want = {}
    for comp in {find(n) for n in in_graph}:
        members = sorted(n for n in in_graph if find(n) == comp)
        keeper = min(
            members,
            key=lambda n: (round(cos(vecs[n], cents[cell[n]]), 6), n),
        )
        for n in members:
            want[n] = (cell[n], comp, n == keeper)

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    )
    got = {
        r["vec_id"]: (r["cell"], r["component_id"], r["is_keeper"])
        for r in semdedup_kmeans(
            df, "vec_id", "embedding", cents, threshold=t
        ).collect()
    }
    assert got == want

"""Gate-tooling tests: the incremental check.py mapper and the bench
regression gate are correctness infrastructure — pin their logic."""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "tools", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_import_graph_maps_changes_to_affected_queries():
    """--changed-since must over-approximate, never under: a workload
    module change hits exactly its queries; a shared operator hits every
    module that imports it; gate-infra files trigger the full run; modules
    outside the oracle gate (streaming, multimodal) hit nothing."""
    check = _load("check")
    import __spark_entry__ as e

    q = e.queries()
    g = check._import_graph()
    pkg = "transcription_lakehouse_spark"

    def affected(*mods):
        changed = {f"{pkg}.{m}" for m in mods}
        return {
            name
            for name, fn in q.items()
            if check._transitive(g, fn.__module__) & changed
        }

    vec = affected("workload.vectors")
    assert "vec_knn_ivf" in vec and "vec_knn_lsh" in vec
    assert not any(n.startswith(("q", "evt_", "doc_", "trn_")) for n in vec)

    # similarity is imported by workload.vectors -> its queries re-run
    assert affected("operators.similarity") >= vec

    # ids.py feeds the trn catalogs through aggregation
    assert any(n.startswith("trn_") for n in affected("ids"))

    # non-gate modules affect no oracle queries
    assert affected("streaming.ingest") == set()
    assert affected("multimodal") == set()

    # gate infra -> full run (None)
    import subprocess
    from unittest import mock

    with mock.patch.object(
        check.subprocess if hasattr(check, "subprocess") else subprocess,
        "check_output",
        return_value=b"tools/check.py\n",
    ):
        assert check.changed_queries("HEAD", q) is None


def test_bench_compare_flags_unexplained_regressions(tmp_path):
    bc = _load("bench_compare")
    prev = {"parsed": {"queries": {"a": 1.0, "b": 1.0, "c": 0.05}}}
    cur = {"parsed": {"queries": {"a": 1.5, "b": 1.1, "c": 0.12}}}
    p1, p2 = tmp_path / "BENCH_r01.json", tmp_path / "BENCH_r02.json"
    p1.write_text(json.dumps(prev))
    p2.write_text(json.dumps(cur))
    import sys
    from unittest import mock

    # a regressed (1.5x, >0.25s) -> fail; b within threshold; c is ratio-
    # noisy but under the absolute floor -> ignored
    with mock.patch.object(sys, "argv", ["bench_compare.py", str(p1), str(p2)]):
        assert bc.main() == 1
    # a written cause for the right round excuses it
    (tmp_path / "BENCH_CAUSES.json").write_text(
        json.dumps({"a": {"round": 2, "cause": "test"}})
    )
    with mock.patch.object(bc, "REPO", str(tmp_path)), mock.patch.object(
        sys, "argv", ["bench_compare.py", str(p1), str(p2)]
    ):
        assert bc.main() == 0


def test_bench_compare_normalizes_by_calibration(tmp_path):
    """A uniform host slowdown captured by the calibration scalar must not
    demand written causes; a residual per-query regression beyond the host
    ratio still fails (round-5 verdict: make host-delta adjudication
    arithmetic, not prose)."""
    bc = _load("bench_compare")
    prev = {"parsed": {"queries": {"a": 1.0, "b": 1.0},
                       "calibration_sec": 1.0}}
    # host 1.4x slower: a scales exactly with the host (fine); b regresses
    # 2.8x raw = 2.0x normalized (fails without a cause)
    cur = {"parsed": {"queries": {"a": 1.4, "b": 2.8},
                      "calibration_sec": 1.4}}
    p1, p2 = tmp_path / "BENCH_r01.json", tmp_path / "BENCH_r02.json"
    p1.write_text(json.dumps(prev))
    p2.write_text(json.dumps(cur))
    import sys
    from unittest import mock

    with mock.patch.object(bc, "REPO", str(tmp_path)), mock.patch.object(
        sys, "argv", ["bench_compare.py", str(p1), str(p2)]
    ):
        rc = bc.main()
    assert rc == 1  # only b, the residual regression

    # same artifacts WITHOUT calibration: both a and b over threshold raw
    prev2 = {"parsed": {"queries": {"a": 1.0, "b": 1.0}}}
    p3, p4 = tmp_path / "BENCH_r03.json", tmp_path / "BENCH_r04.json"
    p3.write_text(json.dumps(prev2))
    p4.write_text(json.dumps(cur))
    with mock.patch.object(bc, "REPO", str(tmp_path)), mock.patch.object(
        sys, "argv", ["bench_compare.py", str(p3), str(p4)]
    ):
        assert bc.main() == 1

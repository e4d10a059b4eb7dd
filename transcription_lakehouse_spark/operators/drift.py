"""Trained-state drift observability — the retrain signal for every
quantizer family (r10 verdict #5, extended past IVF).

A trained artifact (IVF centroids, PQ codebooks, the PCA basis) encodes
the distribution it was fit on; as the corpus drifts, search quality
degrades SILENTLY — recall measurement per append is unaffordable at
100 TB, so each family gets a cheap distribution-shift proxy instead:

- **IVF stored indexes**: cell-occupancy PSI —
  :func:`transcription_lakehouse_spark.indexing.ivf_drift_report`
  (baseline recorded in the index sidecar at build time).
- **PQ codebooks** (here): per-subspace codeword-USAGE PSI. A codebook
  trained on the old distribution assigns drifted vectors to a
  shrinking subset of codewords; usage concentration is the early
  signal that quantization error is climbing. One bounded groupBy
  (m × k rows) over the encoded corpus.
- **PCA basis** (here): captured-energy ratio. The basis explains a
  fixed fraction of training variance (Σ top-λ / Σ λ); when new mass
  has energy OUTSIDE the retained subspace, the measured ratio on the
  live corpus drops below it. One exact, distributed aggregate — no
  sampling, no Python in the plan (reuses ``pca_project``'s codegen
  projection).

All reports share the recommendation contract of ``ivf_drift_report``:
a scalar drift measure, a threshold, ``recommend_retrain``. The retrain
itself is the existing offline path (``tools/train_pq.py`` /
``train_pca.py`` / ``train_ivf.py``) — these reports decide WHEN to run
it instead of never (the r10 verdict's stale-quantizer gap).

Reference parity note: the reference has no quantizer lifecycle at all
(`/root/reference/src/lakehouse/indexing/` builds once); this is part of
the beyond-reference training-data-pipeline surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.vector import as_double_array
from .pca import _lit_array, pca_project
from .pq import pq_encode

__all__ = [
    "pq_code_usage",
    "pq_drift_report",
    "pca_drift_report",
]


def pq_code_usage(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
) -> dict:
    """Per-subspace codeword usage fractions ``{sub: {code: frac}}`` —
    the distribution a PQ drift check compares across time. The collect
    is bounded by m × k (codebook geometry), never corpus size."""
    rows = (
        pq_encode(corpus, id_col, vec_col, codebooks)
        .select(F.posexplode("codes").alias("sub", "code"))
        .groupBy("sub", "code")
        .count()
        .collect()
    )
    totals: dict[int, int] = {}
    for r in rows:
        totals[r["sub"]] = totals.get(r["sub"], 0) + r["count"]
    out: dict[int, dict[int, float]] = {}
    for r in rows:
        out.setdefault(int(r["sub"]), {})[int(r["code"])] = (
            r["count"] / totals[r["sub"]]
        )
    return out


def pq_drift_report(
    usage_train: dict,
    usage_now: dict,
    k: int,
    psi_threshold: float = 0.25,
) -> dict:
    """Codeword-usage PSI per subspace between two :func:`pq_code_usage`
    snapshots (pure driver arithmetic over m × k fractions). The WORST
    subspace drives the recommendation: PQ distance error is summed over
    subspaces, so one collapsed codebook already inflates every
    asymmetric distance even when the others still fit."""
    from ..indexing import occupancy_psi

    subs = sorted(set(usage_train) | set(usage_now))
    per = {
        s: round(occupancy_psi(
            usage_train.get(s, {}), usage_now.get(s, {}), k
        ), 6)
        for s in subs
    }
    worst = max(per.values()) if per else 0.0
    return {
        "psi_max": worst,
        "psi_mean": round(sum(per.values()) / len(per), 6) if per else 0.0,
        "per_subspace": per,
        "psi_threshold": psi_threshold,
        "recommend_retrain": worst >= psi_threshold,
    }


def pca_drift_report(
    df: DataFrame,
    vec_col: str,
    mean: list[float],
    components: list[list[float]],
    eigenvalues: list[float],
    rel_drop_threshold: float = 0.1,
) -> dict:
    """Captured-energy check of a trained PCA basis against the LIVE
    corpus: ``captured_now`` = Σ|proj(x−mean)|² / Σ|x−mean|² (one exact
    distributed aggregate, entirely whole-stage codegen), compared to
    the training-time explained-variance ratio of the retained
    components. Drift that moves mass OUT of the retained subspace
    (a new topic direction) shows up as a relative drop; past
    ``rel_drop_threshold`` the basis (and everything downstream of it —
    whitening, coarse-rank ANN) should be retrained."""
    proj = pca_project(df, vec_col, mean, components, out_col="_pc")
    sq = lambda col: F.aggregate(  # noqa: E731 — local fold helper
        col, F.lit(0.0), lambda acc, x: acc + x * x
    )
    centered = F.zip_with(
        as_double_array(vec_col), _lit_array(mean), lambda x, y: x - y
    )
    row = proj.agg(
        F.sum(sq(F.col("_pc"))).alias("p"),
        F.sum(sq(centered)).alias("c"),
    ).head()
    p, c = (row["p"] or 0.0), (row["c"] or 0.0)
    captured_now = (p / c) if c > 0 else 1.0
    total = sum(eigenvalues) or 1.0
    captured_train = sum(eigenvalues[: len(components)]) / total
    rel_drop = (
        (captured_train - captured_now) / captured_train
        if captured_train > 0 else 0.0
    )
    return {
        "captured_train": round(captured_train, 6),
        "captured_now": round(captured_now, 6),
        "rel_drop": round(rel_drop, 6),
        "rel_drop_threshold": rel_drop_threshold,
        "recommend_retrain": rel_drop >= rel_drop_threshold,
    }

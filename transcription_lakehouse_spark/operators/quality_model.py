"""Model-based quality scoring: a committed linear classifier applied
in-plan — the DCLM/fastText-style "quality model" stage of a training-data
pipeline, distilled here from the Gopher rule battery.

Rule batteries (`quality_rules.py`) give hard pass/fail gates; production
pipelines additionally want a SMOOTH, rankable quality score (to take the
top-X% of a 100 TB crawl, not just drop failures). The standard shape is a
cheap linear model over handcrafted features, trained offline and applied
at scan speed. This module follows the repo's committed-artifact
discipline (`tools/train_quality.py` -> `_quality_model.py`, the
same offline-train / online-apply split as the IVF quantizer, PQ codebooks,
and PCA basis): training is a deterministic full-batch logistic regression
in numpy; application is pure JVM column arithmetic — zero Python in the
scoring path — and every feature is rounded to 6 decimals BEFORE the dot
product so the DuckDB twin's float64 pipeline is bit-identical and the
whole scorer value-hash-gates (`workload/text.py:DOC_QUALITY_CLASSIFIER_SQL`).

Scale design: one narrow projection per document — no shuffle at all for
scoring (the plan is scan -> project). Feature extraction reuses
`quality_rules.repetition_metrics` (shuffle-free array folds).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions.text import STOPWORDS
from .quality_rules import repetition_metrics

__all__ = [
    "FEATURE_ORDER",
    "quality_features",
    "quality_classifier",
    "train_logreg",
]

# the committed model's input contract — training and application both
# consume features in exactly this order
FEATURE_ORDER = [
    "log_tokens",
    "mean_word_len",
    "distinct_ratio",
    "top_unigram_share",
    "alpha_word_ratio",
    "symbol_ratio",
    "stopword_ratio",
]


def _stopword_ratio(toks: Column) -> Column:
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop, x)))
    return F.round(
        F.when(n > 0, n_stop / n.cast("double")).otherwise(F.lit(0.0)), 6
    )


def quality_features(
    df: DataFrame, id_col: str, text_col: str,
    extra_cols: list[str] | None = None,
    with_n_tokens: bool = False,
) -> DataFrame:
    """Per-document feature vector (FEATURE_ORDER columns, each rounded to
    6 decimals — the cross-engine determinism boundary). Reuses the
    repetition battery for the shape features; adds log-token mass and
    stopword density (fluent natural text has a characteristic stopword
    rate; keyword spam and boilerplate sit far below it).

    ``with_n_tokens`` additionally exposes the raw token count, so a
    downstream stage that needs token mass (curate's mixture weights)
    reuses THIS pass's tokenization instead of running a second one."""
    # keep_tokens carries the already-tokenized array through the metric
    # pass, so the stopword feature is one more projection over _toks —
    # no second tokenizer run, no join back (scoring stays scan -> project,
    # zero shuffles, one regexp tokenization per document)
    m = repetition_metrics(df, id_col, text_col, extra_cols, keep_tokens=True)
    return m.select(
        id_col,
        *(extra_cols or []),
        *(["n_tokens"] if with_n_tokens else []),
        F.round(F.log1p(F.col("n_tokens")), 6).alias("log_tokens"),
        "mean_word_len",
        "distinct_ratio",
        "top_unigram_share",
        "alpha_word_ratio",
        "symbol_ratio",
        _stopword_ratio(F.col("_toks")).alias("stopword_ratio"),
    )


def quality_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: dict[str, float],
    bias: float,
    extra_cols: list[str] | None = None,
    with_n_tokens: bool = False,
) -> DataFrame:
    """Apply a committed linear quality model in-plan:
    ``quality_score = sigmoid(bias + Σ w_f · x_f)`` (rounded 6),
    ``quality_pass`` = score >= 0.5. The linear combination accumulates
    left-to-right in FEATURE_ORDER — the same operand order the SQL twin
    spells out, so the float64 result is bit-identical cross-engine.
    ``with_n_tokens`` passes the raw token count through (see
    :func:`quality_features`)."""
    feats = quality_features(df, id_col, text_col, extra_cols,
                             with_n_tokens=with_n_tokens)
    z = F.lit(float(bias))
    for name in FEATURE_ORDER:
        z = z + F.lit(float(weights[name])) * F.col(name)
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return feats.select(
        id_col,
        *(extra_cols or []),
        *(["n_tokens"] if with_n_tokens else []),
        *FEATURE_ORDER,
        score.alias("quality_score"),
        (score >= 0.5).alias("quality_pass"),
    )


def train_logreg(
    x: list[list[float]],
    y: list[int],
    lr: float = 0.5,
    iters: int = 500,
) -> tuple[list[float], float]:
    """Deterministic full-batch logistic regression (zero init, fixed
    learning rate and iteration count — no RNG anywhere, so retraining
    reproduces the committed artifact bit-for-bit). Pure python/math on
    the driver: the training set is a SAMPLE (thousands of labeled docs),
    never the corpus — the corpus only ever sees the apply path."""
    n = len(x)
    if n == 0 or len(y) != n:
        raise ValueError("train_logreg: empty or mismatched training set")
    d = len(x[0])
    w = [0.0] * d
    b = 0.0
    for _ in range(iters):
        gw = [0.0] * d
        gb = 0.0
        for xi, yi in zip(x, y):
            z = b + sum(wj * xj for wj, xj in zip(w, xi))
            p = 1.0 / (1.0 + math.exp(-max(-500.0, min(500.0, z))))
            err = p - yi
            for j in range(d):
                gw[j] += err * xi[j]
            gb += err
        for j in range(d):
            w[j] -= lr * gw[j] / n
        b -= lr * gb / n
    return w, b

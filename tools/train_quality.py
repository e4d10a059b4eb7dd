#!/usr/bin/env python3
"""Offline quality-model training — the model-based quality-filter stage's
train half (same committed-artifact discipline as tools/train_ivf.py /
train_pq.py / train_pca.py).

Labels: the Gopher rule battery's pass/fail on the training slice (the
distill-rules-into-a-smooth-scorer move — a production pipeline would swap
in human or LLM labels; the plumbing is identical). Features: the
FEATURE_ORDER vector from operators/quality_model.py, rounded 6 — exactly
what the apply path computes. Training: deterministic full-batch logistic
regression (no RNG), so re-running this script reproduces
`transcription_lakehouse_spark/_quality_model.py` bit-for-bit.

Usage: python tools/train_quality.py [sf_dir]  (default /root/testdata/sf0.01)
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    from transcription_lakehouse_spark.operators.quality_model import (
        FEATURE_ORDER,
        quality_features,
        train_logreg,
    )
    from transcription_lakehouse_spark.operators.quality_rules import (
        gopher_flags,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("train-quality")
        .getOrCreate()
    )
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    feats = quality_features(docs, "doc_id", "text")
    labels = gopher_flags(docs, "doc_id", "text").select(
        "doc_id", "gopher_pass"
    )
    rows = (
        feats.join(labels, "doc_id")
        .orderBy("doc_id")  # deterministic training-set order
        .collect()
    )
    x = [[float(r[f]) for f in FEATURE_ORDER] for r in rows]
    y = [1 if r["gopher_pass"] else 0 for r in rows]
    w, b = train_logreg(x, y)

    # training-set accuracy read-out (sanity, recorded in the artifact)
    import math

    correct = sum(
        1
        for xi, yi in zip(x, y)
        if (1.0 / (1.0 + math.exp(-(b + sum(wj * xj for wj, xj in zip(w, xi)))))
            >= 0.5) == bool(yi)
    )
    acc = correct / len(y)
    pos_rate = sum(y) / len(y)
    print(f"n={len(y)} pos_rate={pos_rate:.3f} train_acc={acc:.3f}")

    out = os.path.join(
        REPO, "transcription_lakehouse_spark", "_quality_model.py"
    )
    with open(out, "w") as f:
        f.write(
            '"""Linear quality model trained offline by '
            "tools/train_quality.py — do not\nhand-edit. repr() round-trips "
            "doubles exactly, so the Spark expressions and the\nDuckDB SQL "
            'literals parse to bit-identical float64 values."""\n\n'
        )
        f.write(f"TRAINED_ON = {os.path.basename(sf_dir)!r}\n")
        f.write(f"N_TRAIN = {len(y)}\n")
        f.write(f"LABEL_POS_RATE = {pos_rate!r}\n")
        f.write(f"TRAIN_ACCURACY = {acc!r}\n")
        f.write(f"FEATURES = {FEATURE_ORDER!r}\n")
        f.write("WEIGHTS = {\n")
        for name, wj in zip(FEATURE_ORDER, w):
            f.write(f"    {name!r}: {wj!r},\n")
        f.write("}\n")
        f.write(f"BIAS = {b!r}\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

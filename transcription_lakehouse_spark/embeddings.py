"""Embedding inference (M1) — `mapInPandas` over Arrow batches, replacing
the reference's batch loop (`/root/reference/src/lakehouse/embeddings/
generator.py:128-223`, batch 32, 8192-char truncation, unit-normalize).

Provider protocol: a provider FACTORY is resolved once per executor python
worker and returns `embed_batch(texts: list[str]) -> np.ndarray (n, dim)`.
Everything the reference's generator does around the model — 8192-char
truncation, slicing Arrow batches into model batches of 32, and
unit-normalization — lives in the SHARED `_encode` path, so the
sentence-transformers provider is pure config: it supplies only the raw
model forward, and inherits identical batching semantics to the hash
double the tests pin.

Scale: inference is embarrassingly parallel; Arrow batch size is bounded via
spark.sql.execution.arrow.maxRecordsPerBatch (session.py) so model batches
stay memory-resident per executor core.
"""

from __future__ import annotations

import hashlib
import json
import time
import urllib.error
import urllib.request
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = [
    "hash_embed",
    "generate_embeddings",
    "encode_texts",
    "openai_api_provider",
    "DIM",
    "MAX_CHARS",
    "MODEL_BATCH",
]

DIM = 64
MAX_CHARS = 8192  # `generator.py:166-171`
MODEL_BATCH = 32  # `generator.py:139` (reference model batch size)
MODEL_NAME = "hash-embed-v1"

# factory(dim) -> embed_batch(texts) -> (n, dim) float array (raw, un-normalized)
ProviderFactory = Callable[[int], Callable[[list[str]], np.ndarray]]


def hash_embed(text: str, dim: int = DIM) -> np.ndarray:
    """Deterministic unit-norm vector from sha256-seeded Gaussian (the
    reproducible test double). Routed through the SAME `encode_texts` path
    as the distributed job, so a direct call is bitwise-identical to the
    pipeline output."""
    return encode_texts([text], _hash_provider(dim), dim)[0]


def _hash_batch_raw(texts: list[str], dim: int) -> np.ndarray:
    out = np.empty((len(texts), dim), dtype="float32")
    for i, t in enumerate(texts):
        seed = int.from_bytes(
            hashlib.sha256(t.encode("utf-8")).digest()[:8], "big"
        )
        out[i] = np.random.default_rng(seed).standard_normal(dim)
    return out


def _hash_provider(dim: int) -> Callable[[list[str]], np.ndarray]:
    return lambda texts: _hash_batch_raw(texts, dim)


def _sentence_transformers_provider(
    dim: int,
) -> Callable[[list[str]], np.ndarray]:  # pragma: no cover - lib not in container
    """Real-model provider seam (`models.py:87-391`): loads once per
    executor worker; the shared path still owns truncation/batching/norm."""
    try:
        from sentence_transformers import SentenceTransformer
    except ImportError as e:
        raise NotImplementedError(
            "sentence-transformers is not installed in this environment; "
            "use provider='hash' (deterministic test double)"
        ) from e
    model = SentenceTransformer("all-MiniLM-L6-v2")

    def embed(texts: list[str]) -> np.ndarray:
        return np.asarray(
            model.encode(texts, batch_size=len(texts), normalize_embeddings=False)
        )

    return embed


# transport(url, headers, payload_dict) -> (status:int, headers:dict, body:dict)
Transport = Callable[[str, dict, dict], tuple[int, dict, dict]]


def _urllib_transport(
    url: str, headers: dict, payload: dict
) -> tuple[int, dict, dict]:  # pragma: no cover - network not in test env
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode("utf-8"), headers=headers, method="POST"
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, dict(resp.headers), json.loads(resp.read())
    except urllib.error.HTTPError as e:
        body = e.read()
        try:
            parsed = json.loads(body) if body else {}
        except ValueError:
            parsed = {"error": body.decode("utf-8", "replace")}
        return e.code, dict(e.headers or {}), parsed


def openai_api_provider(
    api_key: str,
    model: str = "text-embedding-3-small",
    base_url: str = "https://api.openai.com/v1",
    max_retries: int = 5,
    backoff_s: float = 0.5,
    transport: Transport | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> ProviderFactory:
    """Remote-provider seam shaped like the public OpenAI embeddings API
    (the reference's remote path, `models.py:87-391`): POST
    ``{base_url}/embeddings`` with ``{"model", "input": [texts],
    "dimensions"}``, parse ``{"data": [{"index", "embedding"}]}``.

    All local semantics stay in the SHARED `encode_texts` path — 8192-char
    truncation and model batches of 32 happen before a request is built, so
    one HTTP call carries exactly one model batch. This factory owns only
    the remote concerns: auth header, retry with exponential backoff on
    429/5xx honoring ``Retry-After``, index-ordered response assembly, and
    a hard dim check (no silent slice).

    ``transport``/``sleep`` are injectable so tests drive the full retry/
    batch protocol against a fake HTTP layer without sockets."""
    post = transport or _urllib_transport

    def factory(dim: int) -> Callable[[list[str]], np.ndarray]:
        url = base_url.rstrip("/") + "/embeddings"
        headers = {
            "Authorization": f"Bearer {api_key}",
            "Content-Type": "application/json",
        }

        def embed(texts: list[str]) -> np.ndarray:
            payload = {"model": model, "input": texts, "dimensions": dim}
            last = None
            for attempt in range(max_retries + 1):
                status, resp_headers, body = post(url, headers, payload)
                if status == 200:
                    data = sorted(body["data"], key=lambda d: d["index"])
                    if len(data) != len(texts):
                        raise ValueError(
                            f"embeddings API returned {len(data)} vectors "
                            f"for {len(texts)} inputs"
                        )
                    mat = np.asarray(
                        [d["embedding"] for d in data], dtype="float32"
                    )
                    if mat.shape != (len(texts), dim):
                        raise ValueError(
                            f"embeddings API returned shape {mat.shape}, "
                            f"expected {(len(texts), dim)}"
                        )
                    return mat
                last = (status, body)
                if status == 429 or status >= 500:
                    retry_after = next(
                        (
                            v
                            for k, v in resp_headers.items()
                            if k.lower() == "retry-after"
                        ),
                        None,
                    )
                    delay = backoff_s * (2**attempt)
                    if retry_after is not None:
                        try:
                            delay = float(retry_after)
                        except ValueError:
                            # RFC 9110 also allows an HTTP-date here; fall
                            # back to backoff rather than dying mid-retry
                            pass
                    if attempt < max_retries:
                        sleep(delay)
                    continue
                break  # 4xx other than 429: not retryable
            raise RuntimeError(
                f"embeddings API failed after {max_retries + 1} attempt(s): "
                f"status={last[0]} body={str(last[1])[:500]}"
            )

        return embed

    factory.__name__ = f"openai:{model}"  # stamped into rows' model_name
    return factory


PROVIDERS: dict[str, ProviderFactory] = {
    "hash": _hash_provider,
    "sentence-transformers": _sentence_transformers_provider,
}


def encode_texts(
    texts: list[str],
    embed_batch: Callable[[list[str]], np.ndarray],
    dim: int,
    max_chars: int = MAX_CHARS,
    model_batch: int = MODEL_BATCH,
) -> np.ndarray:
    """The shared M1 path every provider flows through: truncate to
    `max_chars`, slice into model batches of `model_batch`, run the
    provider, unit-normalize. Returns (n, dim) float32."""
    if not texts:
        return np.empty((0, dim), dtype="float32")
    clipped = [(t or "")[:max_chars] for t in texts]
    chunks = []
    for lo in range(0, len(clipped), model_batch):
        raw = np.asarray(
            embed_batch(clipped[lo : lo + model_batch]), dtype="float32"
        )
        chunks.append(raw)
    mat = np.concatenate(chunks, axis=0)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    np.divide(mat, norms, out=mat, where=norms > 0)
    return mat


def generate_embeddings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    artifact_type: str,
    dim: int = DIM,
    provider: str | ProviderFactory = "hash",
    model_name: str | None = None,
    model_version: str = "1",
) -> DataFrame:
    """Returns the EMBEDDING_SCHEMA shape: (artifact_id, artifact_type,
    embedding, model_name, model_version). `provider` is a registry key or
    a factory callable (dim -> embed_batch) for injection in tests.
    ``model_name`` defaults to the provider's registry key (reference
    stamps real model identity per row, `models.py:73-85` — downstream
    index/version bookkeeping keys on it)."""
    factory = PROVIDERS[provider] if isinstance(provider, str) else provider
    if model_name is None:
        if isinstance(provider, str):
            model_name = MODEL_NAME if provider == "hash" else provider
        else:
            # callable factories advertise identity via __name__ (the
            # openai_api_provider factory sets it to "openai:<model>");
            # anonymous test doubles fall back to the hash-double name
            model_name = getattr(provider, "__name__", None) or MODEL_NAME
            if model_name in ("factory", "<lambda>"):
                model_name = MODEL_NAME
    if isinstance(provider, str) and provider == "sentence-transformers":
        # fail fast on the driver rather than inside every executor task
        factory(dim)

    src = df.select(F.col(id_col).alias("artifact_id"), F.col(text_col).alias("_text"))

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        embed_batch = factory(dim)  # one model load per python worker
        for pdf in batches:
            mat = encode_texts(list(pdf["_text"]), embed_batch, dim)
            yield pd.DataFrame(
                {"artifact_id": pdf["artifact_id"], "embedding": list(map(list, mat))}
            )

    out = src.mapInPandas(
        infer, schema="artifact_id string, embedding array<float>"
    )
    return out.select(
        "artifact_id",
        F.lit(artifact_type).alias("artifact_type"),
        "embedding",
        F.lit(model_name).alias("model_name"),
        F.lit(model_version).alias("model_version"),
    )


def store_embeddings(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S12 embeddings sink: one store partitioned by artifact_type
    (`/root/reference/src/lakehouse/embeddings/storage.py:23-135` writes
    per-type files; partition columns give the same pruning declaratively)."""
    df.write.mode(mode).partitionBy("artifact_type").parquet(path)

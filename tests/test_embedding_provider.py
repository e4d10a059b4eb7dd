"""M1 remote-provider protocol: the OpenAI-API-shaped provider seam
(`embeddings.openai_api_provider`) driven against a fake HTTP transport —
proves batching, 8192-char truncation, unit-norm, index reassembly, and
retry-on-429 for a remote path, not just the in-process hash double
(reference remote path: src/lakehouse/embeddings/models.py:87-391).

No Spark needed: everything under test is the shared `encode_texts`
batcher plus the provider's HTTP protocol.
"""

from __future__ import annotations

import numpy as np
import pytest

from transcription_lakehouse_spark.embeddings import (
    MAX_CHARS,
    MODEL_BATCH,
    encode_texts,
    openai_api_provider,
)


class FakeTransport:
    """Records every request; scripted (status, headers) per call, then
    returns deterministic embeddings keyed on the input text."""

    def __init__(self, dim: int, failures: list[tuple[int, dict]] | None = None):
        self.dim = dim
        self.failures = list(failures or [])
        self.calls: list[dict] = []

    def _vec(self, text: str) -> list[float]:
        seed = sum(ord(c) for c in text) % 997 + 1
        rng = np.random.default_rng(seed)
        return [float(x) for x in rng.standard_normal(self.dim)]

    def __call__(self, url, headers, payload):
        self.calls.append(
            {"url": url, "headers": dict(headers), "payload": payload}
        )
        if self.failures:
            status, resp_headers = self.failures.pop(0)
            return status, resp_headers, {"error": {"message": "scripted"}}
        texts = payload["input"]
        # return data deliberately OUT of order to prove index reassembly
        data = [
            {"index": i, "embedding": self._vec(t)}
            for i, t in enumerate(texts)
        ][::-1]
        return 200, {}, {"data": data}


def _provider(transport, **kw):
    sleeps: list[float] = []
    factory = openai_api_provider(
        api_key="test-key",
        base_url="https://example.invalid/v1",
        transport=transport,
        sleep=sleeps.append,
        **kw,
    )
    return factory, sleeps


def test_batching_one_http_call_per_model_batch():
    t = FakeTransport(dim=8)
    factory, _ = _provider(t)
    texts = [f"text number {i}" for i in range(70)]
    mat = encode_texts(texts, factory(8), dim=8)
    assert mat.shape == (70, 8)
    sizes = [len(c["payload"]["input"]) for c in t.calls]
    assert sizes == [MODEL_BATCH, MODEL_BATCH, 70 - 2 * MODEL_BATCH]
    assert all(c["payload"]["dimensions"] == 8 for c in t.calls)
    assert all(
        c["headers"]["Authorization"] == "Bearer test-key" for c in t.calls
    )


def test_truncation_happens_before_the_request():
    t = FakeTransport(dim=4)
    factory, _ = _provider(t)
    long_text = "x" * (MAX_CHARS + 5000)
    encode_texts([long_text], factory(4), dim=4)
    sent = t.calls[0]["payload"]["input"][0]
    assert len(sent) == MAX_CHARS


def test_unit_norm_and_index_reassembly():
    t = FakeTransport(dim=8)
    factory, _ = _provider(t)
    texts = ["alpha", "beta", "gamma"]
    mat = encode_texts(texts, factory(8), dim=8)
    # unit-normalized by the shared path
    np.testing.assert_allclose(np.linalg.norm(mat, axis=1), 1.0, rtol=1e-5)
    # transport returned rows reversed; row i must still correspond to text i
    for i, text in enumerate(texts):
        raw = np.asarray(t._vec(text), dtype="float32")
        np.testing.assert_allclose(mat[i], raw / np.linalg.norm(raw), rtol=1e-5)


def test_retry_on_429_honors_retry_after_then_backoff():
    t = FakeTransport(
        dim=4, failures=[(429, {"Retry-After": "2.5"}), (429, {}), (500, {})]
    )
    factory, sleeps = _provider(t, backoff_s=0.5)
    mat = encode_texts(["hello"], factory(4), dim=4)
    assert mat.shape == (1, 4)
    assert len(t.calls) == 4  # 3 failures + 1 success
    # 1st delay from Retry-After, then exponential backoff 0.5*2^1, 0.5*2^2
    assert sleeps == [2.5, 1.0, 2.0]


def test_gives_up_after_max_retries():
    t = FakeTransport(dim=4, failures=[(429, {})] * 10)
    factory, sleeps = _provider(t, max_retries=2)
    with pytest.raises(RuntimeError, match="after 3 attempt"):
        factory(4)(["hello"])
    assert len(t.calls) == 3
    assert len(sleeps) == 2  # no sleep after the final attempt


def test_non_retryable_4xx_fails_fast():
    t = FakeTransport(dim=4, failures=[(401, {})])
    factory, sleeps = _provider(t)
    with pytest.raises(RuntimeError, match="status=401"):
        factory(4)(["hello"])
    assert len(t.calls) == 1
    assert sleeps == []


def test_dim_mismatch_raises_instead_of_slicing():
    t = FakeTransport(dim=16)  # server returns 16-wide vectors
    factory, _ = _provider(t)
    with pytest.raises(ValueError, match="shape"):
        factory(8)(["hello"])  # caller asked for 8


def test_retry_after_http_date_falls_back_to_backoff():
    """RFC 9110 allows an HTTP-date Retry-After; it must not crash the
    retry loop — fall back to exponential backoff. Lowercase header names
    (HTTP/2, proxies) are honored too."""
    t = FakeTransport(
        dim=4,
        failures=[
            (503, {"Retry-After": "Fri, 14 Aug 2026 10:00:00 GMT"}),
            (429, {"retry-after": "1.5"}),
        ],
    )
    factory, sleeps = _provider(t, backoff_s=0.5)
    mat = encode_texts(["hello"], factory(4), dim=4)
    assert mat.shape == (1, 4)
    assert sleeps == [0.5, 1.5]  # date -> backoff; lowercase -> honored


def test_model_identity_stamped_from_provider(spark):
    """Rows carry the real provider identity: the OpenAI factory stamps
    openai:<model>, the hash registry key stamps the hash-double name."""
    from transcription_lakehouse_spark.embeddings import (
        MODEL_NAME,
        generate_embeddings,
    )

    df = spark.createDataFrame([("a", "hello world")], "id string, text string")
    hash_row = generate_embeddings(df, "id", "text", "span", dim=8).collect()[0]
    assert hash_row["model_name"] == MODEL_NAME

    t = FakeTransport(dim=8)
    factory = openai_api_provider(
        api_key="k", model="text-embedding-3-small",
        base_url="https://example.invalid/v1", transport=t, sleep=lambda s: None,
    )
    remote_row = generate_embeddings(
        df, "id", "text", "span", dim=8, provider=factory
    ).collect()[0]
    assert remote_row["model_name"] == "openai:text-embedding-3-small"

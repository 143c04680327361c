"""Production API clients: retry/backoff, batching, concurrency bound,
zero-vector fallback — all against injected mock transports (no network),
matching /root/reference/agraph/embeddings/graph_embedding.py:395-661 and
config.py:16-40 semantics."""

import threading

import numpy as np
import pytest

from agraph_ray.clients import (ClientConfig, OpenAICompatClient,
                                OpenAIEmbeddingClient, TransportError)


def chat_resp(content: str) -> dict:
    return {"choices": [{"message": {"content": content}}]}


def emb_resp(batch, dim, scale=1.0):
    return {"data": [
        {"index": i, "embedding": [scale * (i + 1)] * dim}
        for i in range(len(batch))]}


class FlakyTransport:
    """Fails the first ``n_fail`` calls with ``status``, then succeeds."""

    def __init__(self, n_fail: int, status, payload_fn):
        self.n_fail, self.status = n_fail, status
        self.payload_fn = payload_fn
        self.calls = 0

    def __call__(self, url, payload, headers, timeout):
        self.calls += 1
        if self.calls <= self.n_fail:
            raise TransportError(f"boom {self.calls}", status=self.status)
        return self.payload_fn(url, payload)


def test_chat_retries_transient_500_then_succeeds():
    tr = FlakyTransport(2, 500, lambda u, p: chat_resp("ok!"))
    sleeps = []
    c = OpenAICompatClient(ClientConfig(max_retries=5, backoff_base=0.5),
                           transport=tr, sleep=sleeps.append)
    assert c("hello") == "ok!"
    assert tr.calls == 3
    assert len(sleeps) == 2
    # exponential: second delay ~2x the first (both jittered +-25%)
    assert sleeps[1] > sleeps[0]
    assert 0.375 <= sleeps[0] <= 0.625          # 0.5 * [0.75, 1.25]


def test_chat_bad_request_fails_fast():
    tr = FlakyTransport(99, 400, lambda u, p: chat_resp("never"))
    c = OpenAICompatClient(ClientConfig(max_retries=5), transport=tr,
                           sleep=lambda s: None)
    with pytest.raises(TransportError):
        c("hello")
    assert tr.calls == 1                         # no retries on 4xx


def test_chat_exhausts_retries_on_429():
    tr = FlakyTransport(99, 429, lambda u, p: chat_resp("never"))
    c = OpenAICompatClient(ClientConfig(max_retries=3), transport=tr,
                           sleep=lambda s: None)
    with pytest.raises(TransportError):
        c("hello")
    assert tr.calls == 4                         # initial + 3 retries


def test_chat_request_shape():
    seen = {}

    def tr(url, payload, headers, timeout):
        seen.update(url=url, payload=payload, headers=headers)
        return chat_resp("x")

    cfg = ClientConfig(api_key="sk-test", api_base="https://host/v1/",
                       model="m1", temperature=0.3, max_tokens=77)
    OpenAICompatClient(cfg, transport=tr)("PROMPT")
    assert seen["url"] == "https://host/v1/chat/completions"
    assert seen["payload"]["model"] == "m1"
    assert seen["payload"]["messages"] == [
        {"role": "user", "content": "PROMPT"}]
    assert seen["payload"]["temperature"] == 0.3
    assert seen["payload"]["max_tokens"] == 77
    assert seen["headers"]["Authorization"] == "Bearer sk-test"


def test_embeddings_batch_slicing_and_order():
    sizes = []

    def tr(url, payload, headers, timeout):
        assert url.endswith("/embeddings")
        sizes.append(len(payload["input"]))
        # return out of order to prove index-sorted reassembly
        dim = 4
        data = [{"index": i, "embedding": [float(hash(t) % 97)] * dim}
                for i, t in enumerate(payload["input"])]
        return {"data": list(reversed(data))}

    cfg = ClientConfig(embedding_dim=4, batch_size=64, max_concurrent=2)
    texts = [f"t{i}" for i in range(150)]
    mat = OpenAIEmbeddingClient(cfg, transport=tr).embed_batch(texts)
    assert mat.shape == (150, 4) and mat.dtype == np.float32
    assert sorted(sizes) == [22, 64, 64]
    for i, t in enumerate(texts):                # order preserved
        assert mat[i, 0] == float(hash(t) % 97)


def test_embeddings_zero_vector_fallback_isolated_to_failed_slice():
    def tr(url, payload, headers, timeout):
        if "poison" in payload["input"][0]:
            raise TransportError("down", status=503)
        return emb_resp(payload["input"], 4)

    cfg = ClientConfig(embedding_dim=4, batch_size=2, max_retries=1,
                       backoff_base=0.0)
    c = OpenAIEmbeddingClient(cfg, transport=tr, sleep=lambda s: None)
    mat = c.embed_batch(["a", "b", "poison", "x", "c", "d"])
    assert mat.shape == (6, 4)
    assert np.all(mat[2:4] == 0.0)               # failed slice → zeros
    assert np.all(mat[0:2] != 0.0) and np.all(mat[4:6] != 0.0)


def test_embeddings_concurrency_bound():
    lock = threading.Lock()
    state = {"inflight": 0, "peak": 0}
    ev = threading.Event()

    def tr(url, payload, headers, timeout):
        with lock:
            state["inflight"] += 1
            state["peak"] = max(state["peak"], state["inflight"])
        ev.wait(0.02)
        with lock:
            state["inflight"] -= 1
        return emb_resp(payload["input"], 3)

    cfg = ClientConfig(embedding_dim=3, batch_size=1, max_concurrent=3)
    texts = [f"t{i}" for i in range(24)]
    mat = OpenAIEmbeddingClient(cfg, transport=tr).embed_batch(texts)
    assert mat.shape == (24, 3)
    assert 1 <= state["peak"] <= 3               # semaphore honored


def test_embeddings_empty_and_none_texts():
    def tr(url, payload, headers, timeout):
        assert all(isinstance(t, str) for t in payload["input"])
        return emb_resp(payload["input"], 2)

    c = OpenAIEmbeddingClient(ClientConfig(embedding_dim=2), transport=tr)
    assert c.embed_batch([]).shape == (0, 2)
    assert c.embed_batch([None, "a"]).shape == (2, 2)
    assert c.embed_one("a").shape == (2,)


def test_config_from_env(monkeypatch):
    monkeypatch.setenv("OPENAI_API_KEY", "sk-env")
    monkeypatch.setenv("OPENAI_API_BASE", "https://proxy/v1")
    monkeypatch.setenv("LLM_MODEL", "m-env")
    monkeypatch.setenv("LLM_TEMPERATURE", "0.7")
    monkeypatch.setenv("LLM_MAX_TOKENS", "123")
    monkeypatch.setenv("EMBEDDING_MODEL", "e-env")
    monkeypatch.setenv("EMBEDDING_DIM", "16")
    cfg = ClientConfig.from_env()
    assert (cfg.api_key, cfg.api_base, cfg.model) == \
        ("sk-env", "https://proxy/v1", "m-env")
    assert (cfg.temperature, cfg.max_tokens) == (0.7, 123)
    assert (cfg.embedding_model, cfg.embedding_dim) == ("e-env", 16)


def test_extractor_engine_wired_through_chat_client():
    """End-to-end: engine prompt → client → mock server JSON → entities."""
    from agraph_ray.extract.llm import LLMExtractorEngine

    def tr(url, payload, headers, timeout):
        return chat_resp(
            '{"entities": [{"name": "Alice", "type": "person", '
            '"description": "d", "confidence": 0.9}]}')

    eng = LLMExtractorEngine(OpenAICompatClient(ClientConfig(),
                                                transport=tr))
    ents = eng.extract_entities("Alice works here.")
    assert [e.name for e in ents] == ["Alice"]


def test_embed_dataset_with_client_embedder(ray_session):
    import ray.data as rd

    from agraph_ray.stages.embed import embed_dataset

    # defined inside the test so cloudpickle ships it by VALUE to workers
    # (a test-module top-level class is unimportable on a Ray worker)
    class DeterministicTransport:
        def __call__(self, url, payload, headers, timeout):
            return {"data": [
                {"index": i, "embedding": [float(len(t))] * 8}
                for i, t in enumerate(payload["input"])]}

    client = OpenAIEmbeddingClient(ClientConfig(embedding_dim=8),
                                   transport=DeterministicTransport())
    ds = rd.from_items([{"text": "ab"}, {"text": "abcd"}])
    rows = sorted(embed_dataset(ds, embedder=client).take_all(),
                  key=lambda r: r["text"])
    assert list(rows[0]["embedding"]) == [2.0] * 8
    assert list(rows[1]["embedding"]) == [4.0] * 8

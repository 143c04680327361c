"""Deterministic configurable-latency mock transport for the LLM clients.

The sandbox has no network, but the production regime the reference runs
in (``agraph/builders/llm_builders.py:216-250`` — every document costs two
~seconds-long API round-trips, bounded by an asyncio semaphore) is exactly
the regime the stateless-task extraction path handles worst. This module
makes that regime reproducible offline: a ``Transport``-signature callable
that sleeps a deterministic per-prompt latency, optionally fails a
deterministic fraction of requests with retryable 503s, and answers with
plausible completions whose JSON the real parse/repair/resolution code
must then do real work on.

Everything is deterministic in (prompt, seed) — no RNG state, so results
are identical across runs, worker counts and partitionings.

Wiring:

    factory = mock_llm_engine_factory(latency_sec=0.2)
    mentions = extract_mentions_llm(docs, cfg, engine_factory=factory,
                                    num_actors=64, max_concurrent=8)
"""

from __future__ import annotations

import json
import re
import threading
import time
import zlib
from typing import List, Optional

__all__ = ["MockLatencyTransport", "mock_llm_engine_factory",
           "mock_chat_client"]

# capitalized runs (optionally multiword) — a cheap deterministic stand-in
# for the entity spans a real model would return
_CAP_RE = re.compile(r"\b[A-Z][a-zA-Z]+(?:\s+[A-Z][a-zA-Z]+){0,2}\b")
_TYPES = ["PERSON", "ORGANIZATION", "LOCATION", "CONCEPT", "EVENT"]
_RELS = ["RELATED_TO", "WORKS_FOR", "PART_OF", "BELONGS_TO", "CAUSES"]


def _stable(s: str, salt: str = "") -> int:
    return zlib.crc32((salt + s).encode("utf-8", "ignore")) & 0xFFFFFFFF


class MockLatencyTransport:
    """``Transport``-signature mock (url, payload, headers, timeout) →
    response dict. Thread-safe (the only mutable state, the
    failed-once set, is guarded by a lock so concurrent first attempts
    of the same prompt fail exactly once) and picklable — safe to build
    inside actor ``__init__`` or to ship in an ``engine_factory``
    closure.

    ``latency_sec`` is the mean per-request sleep; each request's actual
    latency is deterministically jittered in
    ``[latency*(1-jitter), latency*(1+jitter)]`` by a hash of the prompt.
    ``fail_rate`` makes that fraction of FIRST attempts raise a retryable
    503 (the retry of the same prompt succeeds — exercises the backoff
    path without unbounded loops).
    """

    def __init__(self, latency_sec: float = 0.2, jitter: float = 0.5,
                 fail_rate: float = 0.0, seed: int = 0,
                 embedding_dim: int = 64):
        self.latency_sec = float(latency_sec)
        self.jitter = float(jitter)
        self.fail_rate = float(fail_rate)
        self.seed = int(seed)
        self.embedding_dim = int(embedding_dim)
        self._failed_once = set()   # prompt-hash → already failed
        self._fail_lock = threading.Lock()

    # locks don't pickle — each deserialized copy gets a fresh lock and
    # an empty failed-once set (it is a new "process" for fail_rate
    # purposes, matching how actors each see first attempts)
    def __getstate__(self):
        d = self.__dict__.copy()
        d["_fail_lock"] = None
        d["_failed_once"] = set()
        return d

    def __setstate__(self, d):
        self.__dict__.update(d)
        self._fail_lock = threading.Lock()

    # -- latency / failure --------------------------------------------------

    def _sleep(self, key: str):
        if self.latency_sec <= 0:
            return
        u = _stable(key, f"lat{self.seed}") / 0xFFFFFFFF
        time.sleep(self.latency_sec * (1.0 - self.jitter
                                       + 2.0 * self.jitter * u))

    def _maybe_fail(self, key: str):
        if not self.fail_rate:
            return
        h = _stable(key, f"fail{self.seed}")
        if h / 0xFFFFFFFF >= self.fail_rate:
            return
        with self._fail_lock:          # atomic check-then-add
            if h in self._failed_once:
                return
            self._failed_once.add(h)
        from .clients import TransportError
        raise TransportError("mock 503: synthetic overload", status=503)

    # -- completions --------------------------------------------------------

    def _entities_from_text(self, text: str) -> List[dict]:
        seen, out = set(), []
        names = [m.group().strip() for m in _CAP_RE.finditer(text)]
        if not names:
            # lowercase corpora (e.g. the synthetic documents table):
            # a real model still returns entities — emulate with the
            # most salient distinct long words, title-cased
            words = sorted({w.title() for w in re.findall(
                r"[a-z]{5,}", text)})
            names = words[:16]
        for name in names:
            if name.lower() in seen:
                continue
            seen.add(name.lower())
            h = _stable(name, "type")
            out.append({
                "name": name,
                "type": _TYPES[h % len(_TYPES)],
                "description": f"mock entity {name}",
                "aliases": [name.upper()] if h % 7 == 0 else [],
                "properties": {"mock": "1"} if h % 5 == 0 else {},
            })
            if len(out) >= 24:
                break
        return out

    def _complete(self, prompt: str) -> str:
        if prompt.startswith("You are an entity-resolution assistant"):
            m = re.search(r"Entity 1: name='?\"?(.*?)'?\"? type", prompt)
            n1 = (m.group(1) if m else "").strip().lower()
            m = re.search(r"Entity 2: name='?\"?(.*?)'?\"? type", prompt)
            n2 = (m.group(1) if m else "").strip().lower()
            # duplicate when names are equal or one token-contains the
            # other ("globex" vs "globex inc") — a plausible judge
            # policy that lets the composed ANN→judge→merge path
            # actually merge something under the mock
            t1, t2 = set(n1.split()), set(n2.split())
            dup = bool(n1) and (n1 == n2 or
                                (bool(t1) and bool(t2)
                                 and (t1 <= t2 or t2 <= t1)))
            return json.dumps({"is_duplicate": dup,
                               "confidence": 0.9 if dup else 0.2,
                               "reason": "mock"})
        if "Entities:" in prompt:           # relation pass
            listed = re.findall(r"^- (.+?) \((\w+)\)$",
                                prompt.split("Entities:", 1)[1],
                                flags=re.M)
            rels = []
            for (h, ht), (t, tt) in zip(listed, listed[1:]):
                k = _stable(h + "|" + t, "rel")
                rels.append({
                    "head_entity": h, "tail_entity": t,
                    "relation_type": _RELS[k % len(_RELS)],
                    "description": f"mock {h}->{t}",
                    "properties": {},
                    "confidence": 0.6 + 0.4 * ((k >> 8 & 0xFF) / 255)})
            # ~1/8 of completions come back fenced — exercises the JSON
            # repair path (llm_entity_extractor.py:170-182 semantics)
            body = json.dumps({"relations": rels})
            if _stable(prompt, "fence") % 8 == 0:
                return f"```json\n{body}\n```"
            return body
        # entity pass
        text = prompt.split("Text:", 1)[-1].split("Respond with", 1)[0]
        body = json.dumps({"entities": self._entities_from_text(text)})
        if _stable(prompt, "fence") % 8 == 0:
            return f"Here is the extraction:\n{body}\nDone."
        return body

    # -- Transport entry ----------------------------------------------------

    def __call__(self, url: str, payload: dict, headers: dict,
                 timeout: float) -> dict:
        if url.endswith("/embeddings"):
            texts = payload.get("input") or []
            key = "|".join(texts[:4])
            self._sleep(key)
            self._maybe_fail(key)
            dim = self.embedding_dim
            data = []
            for i, t in enumerate(texts):
                # signed word unigram+bigram feature hashing: texts
                # sharing words → similar vectors (locally smooth, like
                # a real model), deterministic, no state. Word-level
                # grams keep shared render boilerplate from flattening
                # the similarity range the way char n-grams do — ANN /
                # near-dup stages stay meaningful under the mock.
                vec = [0.0] * dim
                words = re.findall(r"\w+", (t or "").lower()) or [""]
                grams = words + [a + " " + b
                                 for a, b in zip(words, words[1:])]
                for g in grams:
                    h = _stable(g, "emb")
                    vec[h % dim] += 1.0 if (h >> 17) & 1 else -1.0
                norm = sum(v * v for v in vec) ** 0.5 or 1.0
                data.append({"index": i,
                             "embedding": [v / norm for v in vec]})
            return {"data": data}
        prompt = payload["messages"][0]["content"]
        if isinstance(prompt, list):            # multimodal content parts
            return self._vision(prompt)
        self._sleep(prompt)
        self._maybe_fail(prompt)
        return {"choices": [{"message": {"content":
                                         self._complete(prompt)}}]}

    def _vision(self, parts: list) -> dict:
        """Deterministic vision-model mock: really decodes the attached
        image when it is one of the stdlib-decodable formats
        (rawmedia) and describes its actual dimensions and dominant
        colour — so captions change when pixels change, like a real
        model's would; undecodable payloads get a stable hash caption."""
        import base64
        key = ""
        caption = "an image"
        for p in parts:
            if p.get("type") == "image_url":
                url = p["image_url"]["url"]
                b64 = url.split("base64,", 1)[-1]
                key = b64[:64]
                try:
                    raw = base64.b64decode(b64)
                    from .ops.rawmedia import sniff_decode_image
                    img = sniff_decode_image(raw)
                    h, w = img.shape[:2]
                    mean = img.reshape(-1, 3).mean(axis=0).astype(int)
                    caption = (f"a {w}x{h} image with dominant colour "
                               f"rgb({mean[0]},{mean[1]},{mean[2]})")
                except Exception:  # noqa: BLE001 — mock stays total
                    caption = (f"an undecodable image (payload hash "
                               f"{_stable(b64, 'img'):08x})")
        self._sleep(key)
        self._maybe_fail(key)
        return {"choices": [{"message": {"content": caption}}]}


def mock_chat_client(latency_sec: float = 0.2, jitter: float = 0.5,
                     fail_rate: float = 0.0, seed: int = 0,
                     **cfg_overrides):
    """An ``OpenAICompatClient`` wired to the mock transport — the exact
    object the production path constructs, minus the network."""
    from .clients import ClientConfig, OpenAICompatClient
    cfg = ClientConfig(backoff_base=0.05, backoff_cap=0.2, **cfg_overrides)
    return OpenAICompatClient(
        cfg, transport=MockLatencyTransport(latency_sec, jitter,
                                            fail_rate, seed))


def mock_embedding_client(latency_sec: float = 0.1, jitter: float = 0.5,
                          fail_rate: float = 0.0, seed: int = 0,
                          embedding_dim: int = 64, **cfg_overrides):
    """An ``OpenAIEmbeddingClient`` on the mock transport — picklable
    (config + transport only), so it ships straight into EmbedStage actor
    pools as ``embedder=``; deterministic vectors keyed by text."""
    from .clients import ClientConfig, OpenAIEmbeddingClient
    cfg = ClientConfig(backoff_base=0.05, backoff_cap=0.2,
                       embedding_dim=embedding_dim, **cfg_overrides)
    return OpenAIEmbeddingClient(
        cfg, transport=MockLatencyTransport(
            latency_sec, jitter, fail_rate, seed,
            embedding_dim=embedding_dim))


def mock_llm_engine_factory(latency_sec: float = 0.2, jitter: float = 0.5,
                            fail_rate: float = 0.0, seed: int = 0):
    """Zero-arg factory for ``extract_mentions_llm(engine_factory=...)`` /
    ``build_kg(engine_factory=...)`` — one engine (and one transport)
    per actor."""
    def factory():
        from .extract.llm import LLMExtractorEngine
        return LLMExtractorEngine(
            mock_chat_client(latency_sec, jitter, fail_rate, seed))
    return factory

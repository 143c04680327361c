"""Regression pins for the four ADVICE r5 items.

1. dedup._md5_hex falls back to hashlib when duckdb is absent
   (duckdb is an optional extra; core dedup must run on a base install).
2. the cached DuckDB connection pins preserve_insertion_order=true
   (callers zip hashes positionally against sibling columns).
3. MockLatencyTransport._maybe_fail is race-free (lock-guarded
   check-then-add) and the transport stays picklable.
4. state.ann _build_hnsw pads empty candidate rows with the GLOBAL node
   id, never the block-local index.
"""

from __future__ import annotations

import builtins
import hashlib
import pickle
import threading

import numpy as np
import pyarrow as pa
import pytest

from agraph_ray.ops import dedup as D
from agraph_ray.mock_llm import MockLatencyTransport


def test_md5_hex_py_fallback_matches_hashlib():
    vals = ["", "a", None, "hello world", "ünïcødé"]
    out = D._md5_hex_py(pa.array(vals, pa.string())).to_pylist()
    exp = [hashlib.md5((s or "").encode()).hexdigest() for s in vals]
    assert out == exp


def test_md5_hex_falls_back_without_duckdb(monkeypatch):
    real_import = builtins.__import__

    def no_duckdb(name, *a, **k):
        if name == "duckdb":
            raise ImportError("duckdb not installed (simulated)")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_duckdb)
    monkeypatch.setattr(D, "_MD5_CON", None)
    vals = ["x", "y", None]
    out = D._md5_hex(pa.array(vals, pa.string())).to_pylist()
    exp = [hashlib.md5((s or "").encode()).hexdigest() for s in vals]
    assert out == exp


def test_md5_connection_pins_insertion_order():
    # force connection creation, then read back the setting
    D._md5_hex(pa.array(["warm"], pa.string()))
    con = D._MD5_CON
    assert con is not None
    val = con.execute(
        "SELECT current_setting('preserve_insertion_order')").fetchone()[0]
    assert val in (True, "true", 1)


def test_mock_transport_fail_once_under_threads():
    t = MockLatencyTransport(latency_sec=0.0, fail_rate=1.0, seed=3)
    payload = {"messages": [{"role": "user", "content": "same prompt"}]}
    errs = []
    barrier = threading.Barrier(8)

    def hit():
        barrier.wait()
        try:
            t("http://mock/v1/chat/completions", payload, {}, 5.0)
        except Exception as e:  # TransportError
            errs.append(e)

    threads = [threading.Thread(target=hit) for _ in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    # fail_rate=1.0 → the FIRST attempt fails, exactly once, even with
    # 8 concurrent first attempts racing on the same prompt hash
    assert len(errs) == 1


def test_mock_transport_pickles_with_lock():
    t = MockLatencyTransport(latency_sec=0.0, fail_rate=0.5, seed=1)
    t._failed_once.add(123)
    t2 = pickle.loads(pickle.dumps(t))
    assert isinstance(t2._fail_lock, type(threading.Lock()))
    assert t2._failed_once == set()     # fresh copy, fresh first-attempts
    assert t2.fail_rate == 0.5


def test_hnsw_pad_uses_global_ids(ray_session):
    import ray
    from agraph_ray.state.ann import AnnIndexActor
    rng = np.random.default_rng(0)
    # tiny shard with very few nodes so candidate rows can degenerate
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    ids_in = [f"e{i}" for i in range(40)]
    actor = AnnIndexActor.remote(ids_in, vecs, hnsw_m=8)
    nbrs = ray.get(actor.hnsw_graph.remote())
    n = vecs.shape[0]
    assert nbrs.min() >= 0 and nbrs.max() < n
    # query sanity: beam search finds each vector as its own top-1
    q_ids, _ = ray.get(actor.query_hnsw.remote(vecs[:5], 3, 32))
    assert sum(q_ids[i][0] == ids_in[i] for i in range(5)) >= 4

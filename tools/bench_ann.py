"""ANN shard-pool micro-benchmark at >=1M vectors (VERDICT r2 item #8).

Builds an AnnShardPool over N deterministic synthetic vectors (clustered,
so IVF lists are meaningful), then measures per-query-batch latency and
recall@10 of the IVF-PQ path vs the exact matmul path.

    python tools/bench_ann.py [n_vectors] [dim] [shards]

Prints one JSON line:
  {"n": ..., "dim": ..., "shards": ..., "build_exact_s": ...,
   "build_pq_s": ..., "q_exact_s": ..., "q_pq_s": ..., "speedup": ...,
   "recall@10": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synth_vectors(n: int, dim: int, n_clusters: int = 1024,
                  seed: int = 7) -> np.ndarray:
    """Deterministic clustered vectors: center[i % k] + small noise."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32)
    out = np.empty((n, dim), dtype=np.float32)
    block = 262144
    for s in range(0, n, block):
        e = min(n, s + block)
        idx = np.arange(s, e) % n_clusters
        out[s:e] = centers[idx] + 0.15 * rng.standard_normal(
            (e - s, dim)).astype(np.float32)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    shards = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_queries = 256

    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from agraph_ray.state.ann import AnnShardPool

    vecs = synth_vectors(n, dim)
    ids = [f"v{i}" for i in range(n)]
    queries = synth_vectors(n_queries, dim, seed=13)

    t0 = time.time()
    exact_pool = AnnShardPool(ids, vecs, num_shards=shards)
    ray.get([s.size.remote() for s in exact_pool.shards])
    build_exact = time.time() - t0

    t0 = time.time()
    pq_pool = AnnShardPool(ids, vecs, num_shards=shards,
                           ivf_nlist=256, pq_m=8)
    ray.get([s.size.remote() for s in pq_pool.shards])
    build_pq = time.time() - t0

    # warm both paths once (actor code paths, LUT allocations)
    exact_pool.query(queries[:8], k=10)
    pq_pool.query_pq(queries[:8], k=10, nprobe=16)

    t0 = time.time()
    ex_ids, _ = exact_pool.query(queries, k=10)
    q_exact = time.time() - t0

    t0 = time.time()
    pq_ids, _ = pq_pool.query_pq(queries, k=10, nprobe=16)
    q_pq = time.time() - t0

    hits = sum(len(set(ex_ids[i]) & set(pq_ids[i]))
               for i in range(n_queries))
    recall = hits / (n_queries * 10)

    print(json.dumps({
        "n": n, "dim": dim, "shards": shards, "n_queries": n_queries,
        "build_exact_s": round(build_exact, 2),
        "build_pq_s": round(build_pq, 2),
        "q_exact_s": round(q_exact, 3), "q_pq_s": round(q_pq, 3),
        "speedup": round(q_exact / q_pq, 2) if q_pq else None,
        "recall@10": round(recall, 4),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()

"""Shared ANN index actor.

Replaces the reference's brute-force cosine scan over an in-heap vector dict
(agraph/storage/vector_storage.py:310-332) with a Ray actor holding a dense
float32 matrix; query batches hit it via vectorized numpy matmul. For
corpora beyond one node's memory, shard the matrix across an actor pool and
merge per-shard top-k on the caller (``AnnShardPool``).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import ray


@ray.remote
class AnnIndexActor:
    """One shard of a cosine-similarity index."""

    def __init__(self, ids: List[str], matrix: np.ndarray):
        self.ids = np.asarray(ids)
        m = np.asarray(matrix, dtype=np.float32)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        self.matrix = m / norms   # normalize once at build time

    def query(self, vecs: np.ndarray, k: int = 10) -> Tuple[np.ndarray, np.ndarray]:
        """(q, d) query matrix → (ids[q,k], sims[q,k]), cosine descending."""
        q = np.asarray(vecs, dtype=np.float32)
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        sims = (q / qn) @ self.matrix.T                   # (q, n)
        k = min(k, sims.shape[1])
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        row = np.arange(sims.shape[0])[:, None]
        order = np.argsort(-sims[row, part], kind="stable", axis=1)
        top = part[row, order]
        return self.ids[top], sims[row, top]

    def size(self) -> int:
        return len(self.ids)


class AnnShardPool:
    """Driver-side handle over N index shards; merges per-shard top-k."""

    def __init__(self, ids: List[str], matrix: np.ndarray, num_shards: int = 4):
        n = max(1, min(num_shards, len(ids)))
        bounds = np.linspace(0, len(ids), n + 1, dtype=int)
        self.shards = [
            AnnIndexActor.remote(list(np.asarray(ids)[a:b]), matrix[a:b])
            for a, b in zip(bounds, bounds[1:]) if b > a
        ]

    def query(self, vecs: np.ndarray, k: int = 10):
        parts = ray.get([s.query.remote(vecs, k) for s in self.shards])
        ids = np.concatenate([p[0] for p in parts], axis=1)
        sims = np.concatenate([p[1] for p in parts], axis=1)
        kk = min(k, sims.shape[1])
        row = np.arange(sims.shape[0])[:, None]
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        order = np.argsort(-sims[row, part], kind="stable", axis=1)
        top = part[row, order]
        return ids[row, top], sims[row, top]

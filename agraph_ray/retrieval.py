"""Retrieval over the materialized KG tables.

Reimplements the reference's KnowledgeRetriever surface
(agraph/retrieval/knowledge_retriever.py:80-453): embed the query, top-k
cosine over entity/relation/chunk embeddings, combined ``search_knowledge``.
The reference brute-force-scans an in-heap vector dict
(vector_storage.py:310-332); here vectors live in an ANN shard-actor pool
(state/ann.py) built once from the embedding columns, and queries are
vectorized matmuls per shard with a driver-side top-k merge.

Also: neighbors / shortest-path BFS (knowledge_retriever.py:611-716,
services/graph_path_finder.py:44-103) over a driver-loaded adjacency for
small graphs — the iterative-join formulation exists for when the edge set
outgrows one node (each BFS hop = one co-grouped shuffle).
"""

from __future__ import annotations

from collections import deque
from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa

from .stages.embed import HashEmbedder, embed_dataset
from .state.ann import AnnShardPool


class KnowledgeRetriever:
    """Query-side handle over nodes/edges/chunks Datasets.

    Builds one ANN shard pool per table (embeddings computed with the
    pipeline's embedder if the input lacks an ``embedding`` column).
    State is actor-held; the driver keeps only ids.
    """

    def __init__(self, nodes=None, edges=None, chunks=None,
                 dim: int = 64, num_shards: int = 4):
        self.embedder = HashEmbedder(dim)
        self.dim = dim
        self._pools: Dict[str, AnnShardPool] = {}
        self._meta: Dict[str, Dict[str, dict]] = {}
        # inverted link indexes for the enhanced search (built only when the
        # chunks table carries entities/relations link columns)
        self._chunks_by_entity: Dict[str, List[str]] = {}
        self._chunks_by_relation: Dict[str, List[str]] = {}
        self._chunk_links: Dict[str, dict] = {}
        if chunks is not None and {"entities", "relations"} <= set(
                chunks.schema().names):
            for b in chunks.select_columns(
                    ["chunk_id", "entities", "relations"]).iter_batches(
                    batch_size=None, batch_format="pyarrow"):
                for r in b.to_pylist():
                    es = list(r["entities"] or [])
                    rs = list(r["relations"] or [])
                    self._chunk_links[r["chunk_id"]] = {
                        "entities": set(es), "relations": set(rs)}
                    for e in es:
                        self._chunks_by_entity.setdefault(
                            e, []).append(r["chunk_id"])
                    for rel in rs:
                        self._chunks_by_relation.setdefault(
                            rel, []).append(r["chunk_id"])
        if nodes is not None:
            self._index("entity", nodes, "entity_id", "entity", num_shards,
                        ["entity_id", "name", "entity_type", "confidence"])
        if edges is not None:
            self._index("relation", edges, "relation_id", "relation",
                        num_shards,
                        ["relation_id", "subj", "relation_type", "obj",
                         "confidence"])
        if chunks is not None:
            extra = [c for c in ("chunk_type", "source")
                     if c in chunks.schema().names]
            self._index("text_chunk", chunks, "chunk_id", "chunk", num_shards,
                        ["chunk_id", "conv_id", "text"] + extra)

    def _index(self, kind: str, ds, id_col: str, render: str,
               num_shards: int, meta_cols: Sequence[str]):
        if "embedding" not in ds.schema().names:
            ds = embed_dataset(ds, render=render, dim=self.dim)
        # ONE streaming pass collects ids + vectors + metadata together —
        # separate select_columns/iter_batches rounds each re-execute a
        # projection of the dataset (3 extra executions at 200k edges)
        cols = list(dict.fromkeys([id_col, "embedding"] + list(meta_cols)))
        ids: List[str] = []
        mats: List[np.ndarray] = []
        meta: Dict[str, dict] = {}
        for b in ds.select_columns(cols).iter_batches(batch_size=None, batch_format="pyarrow"):
            bids = b[id_col].to_pylist()
            ids.extend(bids)
            col = b["embedding"].combine_chunks()
            if isinstance(col, pa.FixedSizeListArray):   # zero-copy reshape
                mats.append(np.asarray(
                    col.flatten().to_numpy(zero_copy_only=False),
                    dtype=np.float32).reshape(-1, col.type.list_size))
            else:
                mats.append(np.asarray(col.to_pylist(), dtype=np.float32))
            for i, row in zip(bids,
                              b.select(list(meta_cols)).to_pylist()):
                meta[i] = row
        if not ids:
            return
        mat = np.concatenate(mats)
        self._pools[kind] = AnnShardPool(ids, mat, num_shards)
        self._meta[kind] = meta

    def _search(self, kind: str, query: str, top_k: int) -> List[dict]:
        pool = self._pools.get(kind)
        if pool is None:
            return []
        qv = self.embedder.embed_batch([query])
        ids, sims = pool.query(qv, k=top_k)
        out = []
        for i, s in zip(ids[0], sims[0]):
            rec = dict(self._meta[kind].get(str(i), {"id": str(i)}))
            rec["score"] = float(s)
            out.append(rec)
        return out

    # by-type / by-source listings (knowledge_retriever.py:455-558) — the
    # metadata dicts are already driver-held, so these are pure filters
    def _list(self, kind: str, limit: int, pred) -> List[dict]:
        out = []
        for rec in self._meta.get(kind, {}).values():
            if pred(rec):
                out.append(dict(rec))
                if len(out) >= limit:
                    break
        return out

    def list_entities(self, entity_type: Optional[str] = None,
                      limit: int = 100) -> List[dict]:
        return self._list("entity", limit,
                          lambda r: entity_type is None
                          or r.get("entity_type") == entity_type)

    def list_relations(self, relation_type: Optional[str] = None,
                       limit: int = 100) -> List[dict]:
        return self._list("relation", limit,
                          lambda r: relation_type is None
                          or r.get("relation_type") == relation_type)

    def list_chunks(self, chunk_type: Optional[str] = None,
                    source: Optional[str] = None,
                    limit: int = 100) -> List[dict]:
        return self._list(
            "text_chunk", limit,
            lambda r: (chunk_type is None
                       or r.get("chunk_type") == chunk_type)
            and (source is None or r.get("source") == source))

    # reference-named listing surface (knowledge_retriever.py:455-558):
    # filter + first-k, deterministic because _meta preserves insert order
    def search_entities_by_type(self, entity_type: str,
                                top_k: int = 10) -> List[dict]:
        return self.list_entities(entity_type=entity_type, limit=top_k)

    def search_relations_by_type(self, relation_type: str,
                                 top_k: int = 10) -> List[dict]:
        return self.list_relations(relation_type=relation_type, limit=top_k)

    def search_text_chunks_by_type(self, chunk_type: str,
                                   top_k: int = 10) -> List[dict]:
        return self.list_chunks(chunk_type=chunk_type, limit=top_k)

    def search_text_chunks_by_source(self, source: str,
                                     top_k: int = 10) -> List[dict]:
        return self.list_chunks(source=source, limit=top_k)

    def get_entity(self, entity_id: str) -> Optional[dict]:
        rec = self._meta.get("entity", {}).get(entity_id)
        return dict(rec) if rec else None

    def get_relation(self, relation_id: str) -> Optional[dict]:
        rec = self._meta.get("relation", {}).get(relation_id)
        return dict(rec) if rec else None

    # knowledge_retriever.py:80-262 surface
    def search_entities(self, query: str, top_k: int = 10) -> List[dict]:
        return self._search("entity", query, top_k)

    def search_relations(self, query: str, top_k: int = 10) -> List[dict]:
        return self._search("relation", query, top_k)

    def search_text_chunks(self, query: str, top_k: int = 10) -> List[dict]:
        return self._search("text_chunk", query, top_k)

    def search_knowledge(self, query: str, top_k: int = 10) -> Dict:
        """Parallel 3-way search (knowledge_retriever.py:264-313)."""
        return {
            "entities": self.search_entities(query, top_k),
            "relations": self.search_relations(query, top_k),
            "text_chunks": self.search_text_chunks(query, top_k),
        }

    def _chunk_relevance(self, chunk_id: str, entities: List[dict],
                         relations: List[dict]) -> float:
        """Connection-strength relevance of a chunk to the retrieved
        entity/relation hits (knowledge_retriever.py:401-453): per-kind
        average hit score weighted by connection share, boosted by
        connection count (saturating at 5)."""
        links = self._chunk_links.get(chunk_id)
        if not links:
            return 0.0
        e_n = e_s = r_n = r_s = 0.0
        for e in entities:
            if e.get("entity_id") in links["entities"]:
                e_n += 1
                e_s += e.get("score", 0.0)
        for r in relations:
            if r.get("relation_id") in links["relations"]:
                r_n += 1
                r_s += r.get("score", 0.0)
        total = e_n + r_n
        if total == 0:
            return 0.0
        avg_e = e_s / e_n if e_n else 0.0
        avg_r = r_s / r_n if r_n else 0.0
        score = avg_e * (e_n / total) + avg_r * (r_n / total)
        boost = min(1.0, total / 5.0)
        return min(1.0, score * (0.5 + 0.5 * boost))

    def search_knowledge_enhanced(self, query: str, top_k: int = 10,
                                  similarity_threshold: float = 0.0,
                                  include_connected_chunks: bool = True
                                  ) -> Dict:
        """3-way search plus connected-chunk expansion
        (knowledge_retriever.py:315-453): similarity hits below
        ``similarity_threshold`` are dropped (the reference's threshold
        semantics — this is what frees chunk slots), then chunks linked to
        the retrieved entities/relations but not retrieved by embedding
        similarity are scored by connection strength and fill the
        remaining slots."""
        result = self.search_knowledge(query, top_k)
        if similarity_threshold > 0.0:
            result = {k: [r for r in v
                          if r.get("score", 0.0) >= similarity_threshold]
                      for k, v in result.items()}
        if not include_connected_chunks:
            return result
        have = {c.get("chunk_id") for c in result["text_chunks"]}
        connected = set()
        for e in result["entities"]:
            connected.update(self._chunks_by_entity.get(
                e.get("entity_id"), ()))
        for r in result["relations"]:
            connected.update(self._chunks_by_relation.get(
                r.get("relation_id"), ()))
        additional = []
        for cid in connected - have:
            score = self._chunk_relevance(cid, result["entities"],
                                          result["relations"])
            rec = dict(self._meta.get("text_chunk", {}).get(
                cid, {"chunk_id": cid}))
            rec["score"] = score
            additional.append(rec)
        additional.sort(key=lambda r: (-r["score"], r.get("chunk_id") or ""))
        room = max(0, top_k - len(result["text_chunks"]))
        result["text_chunks"] = result["text_chunks"] + additional[:room]
        return result


class ChatRetriever:
    """The chat/RAG surface (knowledge_retriever.py:793-1052): 3-way
    retrieval → deterministic context assembly → pluggable LLM call.

    ``llm`` is any ``Callable[[str], str]`` (an API client closure in
    production). With ``llm=None``, :meth:`chat` returns the fully
    assembled prompt context instead — the deterministic, testable half.
    """

    def __init__(self, retriever: KnowledgeRetriever, llm=None,
                 response_type: str = "concise"):
        self.retriever = retriever
        self.llm = llm
        self.response_type = response_type
        self.history: List[str] = []

    def chat(self, query: str, top_k: int = 10,
             enhanced: bool = False) -> str:
        from .ops.misc import format_rag_context
        res = (self.retriever.search_knowledge_enhanced(query, top_k)
               if enhanced else
               self.retriever.search_knowledge(query, top_k))
        ctx = format_rag_context(
            res["entities"], res["relations"], res["text_chunks"],
            query=query, history="\n".join(self.history[-6:]),
            response_type=self.response_type)
        if self.llm is None:
            return ctx
        answer = self.llm(ctx)
        self.history.extend([f"user: {query}", f"assistant: {answer}"])
        return answer

    def chat_enhanced(self, query: str, top_k: int = 10) -> str:
        """Chat over the connected-chunk-expanded retrieval
        (knowledge_retriever.py:940-1052)."""
        return self.chat(query, top_k, enhanced=True)


class GraphPathFinder:
    """BFS neighbors / shortest path (graph_path_finder.py:44-103,
    knowledge_retriever.py:611-716) over a driver adjacency built from the
    edges Dataset — appropriate for the post-canonicalization graph, which
    is dictionary-sized relative to the corpus."""

    def __init__(self, edges: "ray.data.Dataset"):
        self.adj: Dict[str, set] = {}
        for b in edges.select_columns(["head_id", "tail_id"]).iter_batches(
                batch_size=None, batch_format="pyarrow"):
            for h, t in zip(b["head_id"].to_pylist(),
                            b["tail_id"].to_pylist()):
                self.adj.setdefault(h, set()).add(t)
                self.adj.setdefault(t, set()).add(h)

    def neighbors(self, entity_id: str, max_hops: int = 1) -> Dict[str, int]:
        """entity_id → {neighbor_id: hop_distance}, BFS bounded by
        max_hops."""
        seen = {entity_id: 0}
        q = deque([(entity_id, 0)])
        while q:
            cur, d = q.popleft()
            if d >= max_hops:
                continue
            for nxt in self.adj.get(cur, ()):
                if nxt not in seen:
                    seen[nxt] = d + 1
                    q.append((nxt, d + 1))
        seen.pop(entity_id, None)
        return seen

    def find_all_paths(self, src: str, dst: str,
                       max_depth: int = 5,
                       max_paths: int = 100) -> List[List[str]]:
        """Bounded DFS enumeration of simple paths
        (graph_path_finder.py:105-170)."""
        out: List[List[str]] = []
        stack = [(src, [src])]
        while stack and len(out) < max_paths:
            cur, path = stack.pop()
            if cur == dst:
                out.append(path)
                continue
            if len(path) > max_depth:
                continue
            for nxt in sorted(self.adj.get(cur, ()), reverse=True):
                if nxt not in path:
                    stack.append((nxt, path + [nxt]))
        return out

    def find_cycles(self, max_len: int = 6,
                    max_cycles: int = 100) -> List[List[str]]:
        """Simple cycles up to ``max_len`` (graph_path_finder.py:232-280),
        canonicalized (smallest node first, lexicographic direction) and
        deduped."""
        seen = set()
        cycles: List[List[str]] = []
        for start in sorted(self.adj):
            stack = [(start, [start])]
            while stack and len(cycles) < max_cycles:
                cur, path = stack.pop()
                for nxt in sorted(self.adj.get(cur, ()), reverse=True):
                    if nxt == start and len(path) >= 3:
                        rot = min(range(len(path)),
                                  key=lambda i: path[i])
                        canon = tuple(path[rot:] + path[:rot])
                        canon = min(canon, tuple(canon[:1]) +
                                    tuple(reversed(canon[1:])))
                        if canon not in seen:
                            seen.add(canon)
                            cycles.append(list(canon))
                    elif nxt not in path and len(path) < max_len:
                        stack.append((nxt, path + [nxt]))
        return cycles

    def shortest_path(self, src: str, dst: str,
                      max_depth: int = 10) -> Optional[List[str]]:
        if src == dst:
            return [src]
        prev: Dict[str, str] = {src: ""}
        q = deque([(src, 0)])
        while q:
            cur, d = q.popleft()
            if d >= max_depth:
                continue
            for nxt in sorted(self.adj.get(cur, ())):
                if nxt in prev:
                    continue
                prev[nxt] = cur
                if nxt == dst:
                    path = [dst]
                    while path[-1] != src:
                        path.append(prev[path[-1]])
                    return path[::-1]
                q.append((nxt, d + 1))
        return None

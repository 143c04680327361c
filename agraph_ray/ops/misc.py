"""Remaining reference utility surfaces.

- reverse relations with the reverse-type map (agraph/relations.py:127-162)
- entity importance / degree centrality
  (agraph/services/graph_analyzer.py:245-267)
- chunk-to-chunk similarity: Jaccard over linked entities (0.6) and
  relations (0.4) (agraph/text.py:277-297), as a blocked pair op
- RAG context formatting for the chat path (the deterministic half of
  agraph/retrieval/knowledge_retriever.py:798-851 — the LLM call itself is
  a provider client that slots in above this)
- whole-graph JSON debug export (agraph/builders/llm_builders.py:1280,
  1303-1316 graph.json)
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..ids import relation_id

REVERSE_RELATION_TYPE = {
    "contains": "belongs_to",
    "belongs_to": "contains",
    "references": "references",
    "similar_to": "similar_to",
    "synonyms": "synonyms",
}


def reverse_relation_type(rtype: str) -> str:
    """relations.py:146-162 reverse map; unmapped types reverse to
    themselves."""
    return REVERSE_RELATION_TYPE.get(rtype, rtype)


def reverse_edges(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Every edge reversed (head/tail swapped, type mapped) — pure map."""
    def rev(t: pa.Table) -> pa.Table:
        rt = [reverse_relation_type(r)
              for r in t["relation_type"].to_pylist()]
        return pa.table({
            "relation_id": pa.array(
                [relation_id(o, r, s) for s, r, o in
                 zip(t["subj"].to_pylist(), rt, t["obj"].to_pylist())],
                pa.string()),
            "head_id": t["tail_id"],
            "tail_id": t["head_id"],
            "relation_type": pa.array(rt, pa.string()),
            "subj": t["obj"],
            "obj": t["subj"],
            "confidence": t["confidence"],
            "source": t["source"],
        })

    cols = ["relation_id", "head_id", "tail_id", "relation_type",
            "subj", "obj", "confidence", "source"]
    return edges.select_columns(cols).map_batches(rev, batch_format="pyarrow")


def entity_importance(edges: "ray.data.Dataset",
                      n_entities: int) -> "ray.data.Dataset":
    """Degree centrality: degree / (n_entities - 1)
    (graph_analyzer.py:245-267)."""
    from .graph import degree_table
    denom = max(1, n_entities - 1)
    deg = degree_table(edges)
    return deg.map_batches(
        lambda t: t.append_column(
            "importance", pc.divide(pc.cast(t["degree"], pa.float64()),
                                    float(denom))),
        batch_format="pyarrow")


def chunk_similarity_pairs(linked_chunks: "ray.data.Dataset",
                           threshold: float = 0.2,
                           num_buckets: int = 64,
                           max_block_pairs: int = 200_000,
                           ) -> "ray.data.Dataset":
    """Chunk pairs with entity/relation-overlap similarity ≥ threshold
    (text.py:277-297: 0.6 * entity Jaccard + 0.4 * relation Jaccard).

    Blocked by shared entity id (chunks with no entity in common have
    similarity ≤ 0.4 * rel-overlap, and no relation without its endpoints —
    so entity-disjoint pairs score 0): each chunk row fans out one row per
    linked entity, pairs form within entity blocks, deduped on the pair
    key. The all-pairs reference scan is O(n²); this is output-bound.
    """
    from ..stages.common import bucketed_group_reduce, distinct_on

    # signed-int64 stable hashes for the id lists: the ids carry 32 bits of
    # entropy (md5[:8] hex), so at ~10^5 distinct ids a 32-bit hash
    # (previously crc32) has expected birthday collisions that silently
    # inflate Jaccard — 64 bits pushes collisions past 10^9 ids while still
    # cutting shuffle bytes ~2x vs the id strings
    from ..ids import stable_hash64_signed as _h64

    def fanout(t: pa.Table) -> pa.Table:
        cid, ent, ents, rels = [], [], [], []
        for c, es, rs in zip(t["chunk_id"].to_pylist(),
                             t["entities"].to_pylist(),
                             t["relations"].to_pylist()):
            eh = [_h64(e) for e in es or []]
            rh = [_h64(r) for r in rs or []]
            for e in es or []:
                cid.append(c)
                ent.append(e)
                ents.append(eh)
                rels.append(rh)
        return pa.table({
            "block": pa.array(ent, pa.string()),
            "chunk_id": pa.array(cid, pa.string()),
            "entities": pa.array(ents, pa.list_(pa.int64())),
            "relations": pa.array(rels, pa.list_(pa.int64()))})

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out: List[Dict] = []

        def emit(members_a, members_b, sim):
            if members_b is None:   # intra-signature-group pairs
                for x in range(len(members_a)):
                    for y in range(x + 1, len(members_a)):
                        out.append({"chunk_a": members_a[x],
                                    "chunk_b": members_a[y],
                                    "similarity": sim})
            else:
                for a in members_a:
                    for b in members_b:
                        lo, hi = (a, b) if a < b else (b, a)
                        out.append({"chunk_a": lo, "chunk_b": hi,
                                    "similarity": sim})

        for block, g in df.groupby("block", sort=False):
            block_h = _h64(block)
            g = g.drop_duplicates("chunk_id").sort_values("chunk_id")
            # collapse identical (entities, relations) signatures: chunks
            # sharing a signature are pairwise similarity 1.0, and the
            # pair loop shrinks from |chunks|^2 to |signatures|^2
            groups: Dict = {}
            for r in g.itertuples(index=False):
                sig = (frozenset(r.entities), frozenset(r.relations))
                groups.setdefault(sig, []).append(r.chunk_id)
            sigs = sorted(groups.items(), key=lambda kv: kv[1][0])
            budget = max_block_pairs
            for i, ((ea, ra), members_a) in enumerate(sigs):
                if budget <= 0:
                    break
                if (len(members_a) > 1 and 1.0 >= threshold
                        and min(ea) == block_h):
                    emit(members_a, None, 1.0)
                la = len(ea)
                for (eb, rb), members_b in sigs[i + 1:]:
                    # budget bounds ITERATIONS (work) over signature
                    # pairs; overflow is dropped (hot blocks are
                    # quadratic otherwise) — documented approximation
                    budget -= 1
                    if budget < 0:
                        break
                    # size-ratio upper bound: entity Jaccard ≤ min/max,
                    # relation Jaccard ≤ 1 — prune before set work
                    lb = len(eb)
                    if 0.6 * min(la, lb) / max(la, lb, 1) + 0.4 < threshold:
                        continue
                    inter = ea & eb
                    # each pair is OWNED by its smallest-hash shared
                    # entity — other shared-entity blocks skip it
                    # (cross-block dedup without a second shuffle)
                    if not inter or min(inter) != block_h:
                        continue
                    eu = len(ea | eb)
                    ru = len(ra | rb)
                    sim = (0.6 * len(inter) / eu
                           + 0.4 * (len(ra & rb) / ru if ru else 0.0))
                    if sim >= threshold:
                        emit(members_a, members_b, round(sim, 6))
        return pd.DataFrame(out, columns=["chunk_a", "chunk_b",
                                          "similarity"])

    schema = pa.schema([("chunk_a", pa.string()), ("chunk_b", pa.string()),
                        ("similarity", pa.float64())])
    fanned = linked_chunks.select_columns(
        ["chunk_id", "entities", "relations"]).map_batches(
        fanout, batch_format="pyarrow")
    raw = bucketed_group_reduce(fanned, ["block"], pairs, num_buckets,
                                schema=schema)
    return distinct_on(raw, ["chunk_a", "chunk_b"], num_buckets)


def format_rag_context(entities: List[dict], relations: List[dict],
                       chunks: List[dict], query: str = "",
                       history: str = "",
                       response_type: str = "concise") -> str:
    """Deterministic KG+DC context block for the chat prompt
    (knowledge_retriever.py:798-851 context assembly; the RAG_SYS_PROMPT
    skeleton lives in agraph/config.py:85-120). Returns the filled data
    sections; an LLM provider client consumes this string."""
    kg_lines = ["-----Entities-----"]
    for e in entities:
        kg_lines.append(json.dumps(
            {"name": e.get("name"), "type": e.get("entity_type"),
             "score": round(float(e.get("score", 0)), 4)},
            ensure_ascii=False, sort_keys=True))
    kg_lines.append("-----Relations-----")
    for r in relations:
        kg_lines.append(json.dumps(
            {"head": r.get("subj"), "type": r.get("relation_type"),
             "tail": r.get("obj"),
             "score": round(float(r.get("score", 0)), 4)},
            ensure_ascii=False, sort_keys=True))
    dc_lines = ["-----Document Chunks-----"]
    for c in chunks:
        dc_lines.append(c.get("text", ""))
    return (f"---Conversation History---\n{history}\n\n"
            f"---Query---\n{query}\n\n"
            "1. From Knowledge Graph(KG):\n" + "\n".join(kg_lines)
            + "\n\n2. From Document Chunks(DC):\n" + "\n".join(dc_lines)
            + f"\n\n---Target format---\n{response_type}")


def write_graph_json(nodes: "ray.data.Dataset", edges: "ray.data.Dataset",
                     path: str, graph_name: str = "kg",
                     max_rows: int = 1_000_000) -> Dict[str, int]:
    """Single-document graph.json debug export (llm_builders.py:1303-1316
    layout: entities/relations keyed by id). Guarded against accidental
    full-corpus export."""
    n = nodes.count()
    if n > max_rows:
        raise ValueError(f"graph.json export of {n} nodes exceeds "
                         f"max_rows={max_rows}")
    def _props(r):
        raw = r.get("properties")
        return json.loads(raw) if raw else {}

    doc = {"name": graph_name, "entities": {}, "relations": {}}
    for b in nodes.iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            doc["entities"][r["entity_id"]] = {
                "id": r["entity_id"], "name": r["name"],
                "entity_type": r["entity_type"],
                "description": r.get("description", ""),
                "aliases": list(r.get("aliases") or []),
                "properties": _props(r),
                "confidence": r["confidence"], "source": r.get("source", "")}
    for b in edges.iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            doc["relations"][r["relation_id"]] = {
                "id": r["relation_id"],
                "head_entity_id": r["head_id"],
                "tail_entity_id": r["tail_id"],
                "relation_type": r["relation_type"],
                "description": r.get("description") or "",
                "properties": _props(r),
                "confidence": r["confidence"], "source": r.get("source", "")}
    with open(path, "w", encoding="utf-8") as f:
        json.dump(doc, f, ensure_ascii=False)
    return {"entities": len(doc["entities"]),
            "relations": len(doc["relations"])}

"""Chunk → entity/relation linking.

Reference semantics (agraph/builders/llm_builders.py:770-812): a chunk
links to an entity when the entity's name or an alias appears (substring,
case-insensitive) in the chunk text; it links to a relation when BOTH
endpoint names appear.

Scale shape: the canonical entity dictionary is tiny relative to the chunk
stream (vocabulary vs corpus), so it is broadcast once with ``ray.put`` and
each chunk batch scans against it inside ``map_batches`` — never a
chunks x entities shuffle join. The per-actor matcher pre-lowers all names
once (actor ``__init__``), and name lookup is a single pass per chunk over
the name list (the reference's own O(chunks x names) semantics). For
vocabularies beyond ~10^6 names, swap the scan for an Aho-Corasick
automaton built per actor — the stage contract is unchanged.
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa
import ray


def _collect_link_dicts(nodes: "ray.data.Dataset",
                        edges: "ray.data.Dataset"):
    """(name_lower → entity_id), [(head_lower, tail_lower, relation_id)]."""
    names = {}
    for b in nodes.select_columns(["entity_id", "name", "aliases"]) \
                  .iter_batches(batch_format="pyarrow"):
        for eid, name, aliases in zip(b["entity_id"].to_pylist(),
                                      b["name"].to_pylist(),
                                      b["aliases"].to_pylist()):
            if name:
                names.setdefault(name.lower(), eid)
            for a in aliases or []:
                names.setdefault(a.lower(), eid)
    rels = []
    for b in edges.select_columns(["relation_id", "subj", "obj"]) \
                  .iter_batches(batch_format="pyarrow"):
        for rid, s, o in zip(b["relation_id"].to_pylist(),
                             b["subj"].to_pylist(),
                             b["obj"].to_pylist()):
            rels.append((s.lower(), o.lower(), rid))
    return names, rels


def _linker(names_ref, rels_ref):
    """Stateless-task closure: ray.get of a broadcast ref is a zero-copy
    object-store read on every node after the first fetch — no actor pool
    needed (a pool sized near the CPU count can starve its own upstream
    read tasks; see stages/extract.py::_auto_concurrency)."""

    def link_batch(batch: pa.Table) -> pa.Table:
        names = ray.get(names_ref)             # name_lower -> entity_id
        rels = ray.get(rels_ref)               # (head_l, tail_l, rid)
        ent_col: List[List[str]] = []
        rel_col: List[List[str]] = []
        for text in batch["text"].to_pylist():
            low = (text or "").lower()
            present = {n: eid for n, eid in names.items() if n in low}
            ent_col.append(sorted(set(present.values())))
            rel_col.append(sorted({rid for h, t, rid in rels
                                   if h in present and t in present}))
        return (batch
                .append_column("entities",
                               pa.array(ent_col, pa.list_(pa.string())))
                .append_column("relations",
                               pa.array(rel_col, pa.list_(pa.string()))))

    return link_batch


def link_chunks(chunks: "ray.data.Dataset", nodes: "ray.data.Dataset",
                edges: "ray.data.Dataset",
                concurrency: Optional[int] = None) -> "ray.data.Dataset":
    """chunks + graph tables → chunks with ``entities``/``relations`` id
    lists (llm_builders.py:770-812)."""
    names, rels = _collect_link_dicts(nodes, edges)
    names_ref, rels_ref = ray.put(names), ray.put(rels)
    return chunks.map_batches(_linker(names_ref, rels_ref),
                              batch_format="pyarrow")

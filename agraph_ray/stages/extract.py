"""Stage C — mention/triple extraction.

``documents(conv_id, doc_seq, text)`` → combined ``mentions`` table with one
row per extracted entity (kind="entity") or triple (kind="triple").

Architecture (BASELINE.json north_star step 2): a stateful actor-pool
``map_batches`` stage. The extractor engine compiles its ~45 regexes once
per actor in ``__init__``; ``__call__`` processes a batch of documents and
emits one Arrow table. The deterministic :class:`RuleExtractor` engine is
the default (and the one the P/R fixtures gate on); any engine with an
``extract(text) -> (entities, triples)`` method can be substituted — the
production LLM extractor slot (agraph/extractors/llm_entity_extractor.py
semantics) plugs in here without touching the pipeline.

Emitting entities and triples as one table (discriminated by ``kind``) lets
the pipeline run extraction exactly once, checkpoint it as one Parquet
dataset, and serve both the node branch and the edge branch with
predicate-pushdown reads — no double execution, no mid-pipeline
materialization.
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa

from ..config import KGConfig
from ..extract.rules import RuleExtractor
from ..ids import entity_id, relation_id

MENTIONS_SCHEMA = pa.schema([
    ("kind", pa.string()),            # "entity" | "triple"
    ("conv_id", pa.string()),
    ("doc_seq", pa.int32()),
    # entity fields (null for triples)
    ("entity_id", pa.string()),
    ("name", pa.string()),            # original-case matched name
    ("norm_name", pa.string()),       # lower().strip() dedup key
    ("entity_type", pa.string()),
    ("description", pa.string()),
    ("aliases", pa.list_(pa.string())),
    # triple fields (null for entities)
    ("relation_id", pa.string()),
    ("subj", pa.string()),
    ("subj_type", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("obj_type", pa.string()),
    ("head_id", pa.string()),
    ("tail_id", pa.string()),
    # shared
    ("confidence", pa.float64()),
    ("source", pa.string()),
])


class ExtractStage:
    """``map_batches`` actor-pool callable for the extraction stage."""

    def __init__(self, cfg: Optional[KGConfig] = None, engine=None):
        cfg = cfg or KGConfig()
        # regex compilation happens once per actor, not once per batch
        self.engine = engine or RuleExtractor(
            confidence_threshold=cfg.confidence_threshold,
            max_keywords=cfg.max_keywords)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {name: [] for name in MENTIONS_SCHEMA.names}

        def emit(**kv):
            for name in MENTIONS_SCHEMA.names:
                cols[name].append(kv.get(name))

        for conv, seq, text in zip(batch["conv_id"].to_pylist(),
                                   batch["doc_seq"].to_pylist(),
                                   batch["text"].to_pylist()):
            ents, triples = self.engine.extract(text or "")
            for e in ents:
                emit(kind="entity", conv_id=conv, doc_seq=seq,
                     entity_id=entity_id(e.name), name=e.name,
                     norm_name=e.key, entity_type=e.etype,
                     description=e.description, aliases=e.aliases,
                     confidence=e.confidence, source=e.source)
            for t in triples:
                emit(kind="triple", conv_id=conv, doc_seq=seq,
                     relation_id=relation_id(t.subj, t.pred, t.obj),
                     subj=t.subj, subj_type=t.subj_type, pred=t.pred,
                     obj=t.obj, obj_type=t.obj_type,
                     head_id=entity_id(t.subj), tail_id=entity_id(t.obj),
                     confidence=t.confidence, source=t.source)
        arrays = [pa.array(cols[f.name], f.type) for f in MENTIONS_SCHEMA]
        return pa.Table.from_arrays(arrays, schema=MENTIONS_SCHEMA)


def _auto_concurrency() -> tuple:
    """(1, cluster_cpus - 2): an actor pool that reserves every CPU starves
    the read/write tasks of its own pipeline (observed livelock)."""
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return (1, max(2, cpus - 2))


def extract_mentions(docs: "ray.data.Dataset", cfg: Optional[KGConfig] = None,
                     engine=None) -> "ray.data.Dataset":
    """documents → mentions via the extraction actor pool."""
    cfg = cfg or KGConfig()
    kwargs = {}
    if engine is None:
        # callable class → actor pool; regexes compile once per actor
        conc = cfg.extract_concurrency
        if conc == "auto":
            conc = _auto_concurrency()
        kwargs = dict(fn_constructor_kwargs={"cfg": cfg}, concurrency=conc)
        fn = ExtractStage
    else:  # pre-built engine (tests): stateless task closure
        stage = ExtractStage(cfg, engine)
        fn = stage
    return docs.map_batches(fn, batch_format="pyarrow",
                            batch_size=cfg.extract_batch_size, **kwargs)

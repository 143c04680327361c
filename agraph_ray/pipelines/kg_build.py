"""End-to-end KG construction pipeline (BASELINE.json north_star).

    read_parquet(transcripts) → reassemble → [chunk] → extract →
    dedup (nodes, edges) → link + canonicalize → materialize + manifests

Two entry points:

- :func:`build_kg` — the streaming single-job pipeline. One extraction
  execution, checkpointed as the ``mentions`` Parquet dataset; node and edge
  branches read it back with predicate pushdown.

- :func:`build_kg_resumable` — the production shape for 10^12-turn inputs:
  input shards are processed in partition groups, each committing a
  ``mentions`` partition + lineage manifest; a restart skips committed
  partitions (kill/restart test: tests/test_resume.py). Global stages
  (dedup/link/materialize) then run over all mention partitions. Relies on
  the loader contract that shards are hash-partitioned by conv_id (our
  generator guarantees it; a general loader gets it from one
  repartition-by-key pass).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import pyarrow.compute as pc
import pyarrow.dataset as pads

from ..config import KGConfig
from ..stages.canonicalize import canonicalize
from ..stages.chunk import chunk_documents
from ..stages.dedup import dedup_both, dedup_edges, dedup_entities
from ..stages.extract import extract_mentions, extract_mentions_llm
from ..stages.materialize import (atomic_write_parquet, commit_manifest,
                                  is_committed)
from ..stages.reassemble import reassemble


@dataclass
class KGBuildResult:
    out_dir: str
    tables: Dict[str, str]
    metrics: Dict[str, float] = field(default_factory=dict)


def _run_extract(docs, cfg, engine=None, engine_factory=None,
                 llm_opts: Optional[Dict] = None):
    """Dispatch to the right extraction regime: ``engine_factory`` set →
    the latency-bound actor-pool path (:func:`extract_mentions_llm`,
    in-flight requests decoupled from CPU count); else the CPU-bound
    stateless-task path with the optional pre-built ``engine``."""
    if engine_factory is not None:
        return extract_mentions_llm(docs, cfg,
                                    engine_factory=engine_factory,
                                    **(llm_opts or {}))
    return extract_mentions(docs, cfg, engine=engine)


def _mentions_to_outputs(out_dir: str, cfg: KGConfig,
                         do_canonicalize: bool = True,
                         metrics: Optional[Dict] = None,
                         mentions=None, pool=None,
                         exact_as: Optional[Sequence[str]] = None
                         ) -> Dict[str, str]:
    """Global stages: mentions (in-memory Dataset or the parquet
    checkpoint) → triples / nodes / edges tables.

    The node and edge dedup branches execute CONCURRENTLY (two threads,
    each its own streaming execution) — their shuffles overlap instead of
    serializing; artifact writes also overlap downstream compute.
    """
    from concurrent.futures import ThreadPoolExecutor
    import pyarrow.compute as pc2

    import ray.data as rd
    mentions_dir = os.path.join(out_dir, "mentions")
    tables: Dict[str, str] = {"mentions": mentions_dir}
    own_pool = pool is None
    if own_pool:
        pool = ThreadPoolExecutor(max_workers=4)

    ent_cols = ["kind", "conv_id", "entity_id", "name", "norm_name",
                "entity_type", "description", "aliases", "properties",
                "confidence", "source", "n_mentions", "n_convs"]
    tri_cols = ["kind", "conv_id", "relation_id", "subj", "subj_type", "pred",
                "obj", "obj_type", "head_id", "tail_id", "description",
                "properties", "confidence", "source", "n_mentions"]

    if mentions is None:
        entities = rd.read_parquet(mentions_dir, columns=ent_cols,
                                   filter=pc.field("kind") == "entity")
        triples = rd.read_parquet(mentions_dir, columns=tri_cols,
                                  filter=pc.field("kind") == "triple")
    else:
        entities = mentions.map_batches(
            lambda t: t.filter(pc2.equal(t["kind"], "entity"))
            .select(ent_cols), batch_format="pyarrow")
        triples = mentions.map_batches(
            lambda t: t.filter(pc2.equal(t["kind"], "triple"))
            .select(tri_cols), batch_format="pyarrow")

    t = time.time()
    pair = None
    if mentions is None:
        # Parquet-checkpoint regime (mentions exceeded the store): the
        # FUSED single-scan dedup reads the checkpoint ONCE for both
        # kinds (stages/dedup.py dedup_both) — halves the dominant I/O
        # vs the two pruned per-kind reads. Returns None (fall through)
        # when the partial volume exceeds its cap.
        fused_cols = sorted(set(ent_cols) | set(tri_cols))
        pair = dedup_both(rd.read_parquet(mentions_dir, columns=fused_cols),
                          cfg)
    if pair is not None:
        nodes, edges = pair[0].materialize(), pair[1].materialize()
    else:
        # In-memory regime (and fused-cap fallback): per-kind branches
        # overlap on threads — each side's per-execution serial overhead
        # hides under the other. A/B at 554k turns / 32 CPUs, writes
        # no-opped: overlapped per-kind 3.9-5.5 s vs fused single-scan
        # 5.8-7.8 s (both pandas partials serialize inside each fused
        # task), so in-store re-scans stay per-kind; sequential was
        # 7.6-11.5 s (r2 measurement).
        f_nodes = pool.submit(
            lambda: dedup_entities(entities, cfg).materialize())
        f_edges = pool.submit(
            lambda: dedup_edges(triples, cfg).materialize())
        nodes, edges = f_nodes.result(), f_edges.result()
    if metrics is not None:
        metrics["sec_dedup"] = round(time.time() - t, 2)

    t = time.time()
    if exact_as is None:
        exact_as = (("nodes_exact", "edges_exact") if do_canonicalize
                    else ("nodes", "edges"))
    nodes_exact_dir = os.path.join(out_dir, exact_as[0])
    edges_exact_dir = os.path.join(out_dir, exact_as[1])
    writes = {
        "nodes_exact": pool.submit(atomic_write_parquet, nodes,
                                   nodes_exact_dir, cfg.min_rows_per_file),
        "edges_exact": pool.submit(atomic_write_parquet, edges,
                                   edges_exact_dir, cfg.min_rows_per_file),
    }

    # deduped (subj, pred, obj) table — the P/R gate artifact
    triples_dir = os.path.join(out_dir, "triples")
    tri_out = edges.select_columns(
        ["relation_id", "subj", "subj_type", "relation_type", "obj",
         "obj_type", "confidence", "source", "n_mentions"]).map_batches(
        lambda t: t.rename_columns(
            ["relation_id", "subj", "subj_type", "pred", "obj", "obj_type",
             "confidence", "source", "n_mentions"]), batch_format="pyarrow")
    writes["triples"] = pool.submit(atomic_write_parquet, tri_out,
                                    triples_dir, cfg.min_rows_per_file)
    tables["triples"] = triples_dir

    n_nodes = writes["nodes_exact"].result()
    n_edges = writes["edges_exact"].result()
    n_triples = writes["triples"].result()
    if metrics is not None:
        metrics["sec_dedup_write"] = round(time.time() - t, 2)

    if do_canonicalize:
        t = time.time()
        nodes, edges, cmap = canonicalize(nodes, edges, cfg)
        if metrics is not None:
            metrics["entities_merged_by_linking"] = len(cmap)
            metrics["sec_canonicalize"] = round(time.time() - t, 2)
        t = time.time()
        f_n = pool.submit(atomic_write_parquet, nodes,
                          os.path.join(out_dir, "nodes"),
                          cfg.min_rows_per_file)
        f_e = pool.submit(atomic_write_parquet, edges,
                          os.path.join(out_dir, "edges"),
                          cfg.min_rows_per_file)
        n_nodes, n_edges = f_n.result(), f_e.result()
        if metrics is not None:
            metrics["sec_final_write"] = round(time.time() - t, 2)
    if do_canonicalize:
        tables["nodes"] = os.path.join(out_dir, "nodes")
        tables["edges"] = os.path.join(out_dir, "edges")
    else:
        tables["nodes"] = nodes_exact_dir
        tables["edges"] = edges_exact_dir
    if own_pool:
        pool.shutdown(wait=True)
    if metrics is not None:
        metrics.update({"n_nodes": n_nodes, "n_edges": n_edges,
                        "n_triples": n_triples})
    return tables


def kg_tables(transcripts: "ray.data.Dataset",
              cfg: Optional[KGConfig] = None, do_canonicalize: bool = False,
              engine=None, engine_factory=None,
              llm_opts: Optional[Dict] = None):
    """In-memory variant for moderate inputs (driver queries / tests):
    transcripts Dataset → (nodes, edges, mentions) Datasets without any
    Parquet checkpointing. The extraction output is pinned once
    (materialize) so the node and edge branches don't re-run it; use
    :func:`build_kg` for large corpora. ``engine`` = pluggable extraction
    engine (deterministic RuleExtractor default; extract/llm.py's
    LLMExtractorEngine for the production path)."""
    import pyarrow.compute as pc2
    cfg = cfg or KGConfig()
    docs = reassemble(transcripts, cfg)
    mentions = _run_extract(docs, cfg, engine, engine_factory,
                            llm_opts).materialize()
    entities = mentions.map_batches(
        lambda t: t.filter(pc2.equal(t["kind"], "entity")),
        batch_format="pyarrow")
    triples = mentions.map_batches(
        lambda t: t.filter(pc2.equal(t["kind"], "triple")),
        batch_format="pyarrow")
    nodes = dedup_entities(entities, cfg)
    edges = dedup_edges(triples, cfg)
    if do_canonicalize:
        nodes = nodes.materialize()
        edges = edges.materialize()
        nodes, edges, _ = canonicalize(nodes, edges, cfg)
    return nodes, edges, mentions


def build_kg(transcripts, out_dir: str, cfg: Optional[KGConfig] = None,
             with_chunks: bool = True, do_canonicalize: bool = True,
             engine=None, engine_factory=None,
             llm_opts: Optional[Dict] = None) -> KGBuildResult:
    """Single-job streaming pipeline. ``transcripts`` is a Dataset or a
    parquet path/dir.

    Execution shape: each stage output that feeds multiple consumers is
    ``materialize()``d (pinned in the object store, spilling if needed)
    and its Parquet artifact is written on a SIDE THREAD while the next
    stage computes — artifact I/O overlaps compute instead of serializing
    the pipeline. (The partitioned :func:`build_kg_resumable` keeps strict
    Parquet checkpoints per partition — that path trades this overlap for
    restartability.)
    """
    from concurrent.futures import ThreadPoolExecutor

    import ray.data as rd
    cfg = cfg or KGConfig()
    t0 = time.time()
    metrics: Dict[str, float] = {}
    if isinstance(transcripts, (str, list)):
        from ..sources import sized_read_parquet
        transcripts = sized_read_parquet(
            transcripts, columns=["conv_id", "turn_idx", "text"],
            target_block_bytes=8 << 20)

    pool = ThreadPoolExecutor(max_workers=4)
    futures = {}

    t = time.time()
    docs = reassemble(transcripts, cfg).materialize()
    metrics["sec_reassemble"] = round(time.time() - t, 2)
    docs_dir = os.path.join(out_dir, "documents")
    futures["documents"] = pool.submit(
        atomic_write_parquet, docs, docs_dir, cfg.min_rows_per_file)
    if with_chunks:
        futures["chunks"] = pool.submit(
            atomic_write_parquet, chunk_documents(docs, cfg),
            os.path.join(out_dir, "chunks"), cfg.min_rows_per_file)

    t = time.time()
    mentions = _run_extract(docs, cfg, engine, engine_factory,
                            llm_opts).materialize()
    metrics["sec_extract"] = round(time.time() - t, 2)
    futures["mentions"] = pool.submit(
        atomic_write_parquet, mentions, os.path.join(out_dir, "mentions"),
        cfg.min_rows_per_file)

    # Dedup sources from the in-memory extract output while it fits the
    # object store comfortably, else from the mentions PARQUET checkpoint
    # (pruned columns + kind pushdown). The discriminator is mentions
    # BYTES vs store headroom, not CPU count: the old wide-cluster
    # measurement (in-memory 94-104 s vs 21 s parquet at 1.1M turns) was
    # spill-induced — full-width blocks evicted to disk get re-read twice
    # — while within-store re-scans are zero-copy. Re-measured at 554k
    # turns / 32 CPUs with the r3 two-level reduce: in-memory 7.6 s vs
    # parquet 10.7-11.5 s sequential (4.6-5.5 vs 6.2-6.8 overlapped).
    # Blocking on the checkpoint write (big regime only) also makes the
    # dedup phase restartable from the checkpoint.
    import ray as _ray
    store = _ray.cluster_resources().get("object_store_memory", 0) \
        or (4 << 30)
    if (mentions.size_bytes() or 0) > \
            store * cfg.dedup_inmem_store_fraction:
        metrics["n_mentions"] = futures["mentions"].result()
        src = None
        mentions = None   # release the in-memory blocks — the parquet
        #                   checkpoint is now the source of truth
    else:
        src = mentions
        # Coalesce for the dedup shuffles: extraction emits fine-grained
        # blocks (~8/CPU — right for its own load balancing, wrong for
        # the two dedup all-to-alls, whose cost is per-block scheduling).
        # The mentions are materialized, so the byte size is known free:
        # target ~32 MB blocks, floor 8, only when it actually halves
        # the block count. One cheap streaming pass on the small table.
        nb_now = mentions.num_blocks()
        nb_tgt = max(8, -(-int(mentions.size_bytes() or 0) // (32 << 20)))
        if nb_tgt * 2 <= nb_now:
            src = mentions.repartition(nb_tgt).materialize()
    tables = _mentions_to_outputs(out_dir, cfg, do_canonicalize, metrics,
                                  mentions=src, pool=pool)
    t = time.time()
    metrics["n_documents"] = futures["documents"].result()
    metrics["n_mentions"] = futures["mentions"].result()
    if with_chunks:
        metrics["n_chunks"] = futures["chunks"].result()
        tables["chunks"] = os.path.join(out_dir, "chunks")
    tables["documents"] = docs_dir
    pool.shutdown(wait=True)
    # artifact writes run on side threads; this is how long the pipeline
    # waited for the slowest one to drain at the end (I/O-bound tail —
    # at 5.6M turns the 64M-row mentions checkpoint dominates it)
    metrics["sec_write_drain"] = round(time.time() - t, 2)
    metrics["wall_sec"] = time.time() - t0
    commit_manifest(out_dir, "build", "all", metrics)
    return KGBuildResult(out_dir, tables, metrics)


def run_mention_partitions(shard_paths: Sequence[str], out_dir: str,
                           cfg: KGConfig,
                           shards_per_partition: int = 4,
                           engine=None, engine_factory=None,
                           llm_opts: Optional[Dict] = None,
                           group_concurrency: Optional[int] = None,
                           metrics: Optional[Dict] = None) -> None:
    """The checkpointed per-partition extract loop shared by
    :func:`build_kg_resumable` and the composed LLM-path pipeline
    (pipelines/llm_e2e.py): each partition group commits a ``mentions``
    Parquet partition + lineage manifest; committed partitions are
    skipped on restart."""
    from concurrent.futures import ThreadPoolExecutor

    import ray as _ray
    groups: List[List[str]] = [
        list(shard_paths[i:i + shards_per_partition])
        for i in range(0, len(shard_paths), shards_per_partition)]
    cpus = int(_ray.cluster_resources().get("CPU", 8)) \
        if _ray.is_initialized() else 8
    if group_concurrency is None:
        group_concurrency = 1 if cpus < 16 else max(2, min(4, cpus // 16))
    if engine_factory is not None and group_concurrency > 1:
        # Concurrent groups each spawn their own latency-bound actor
        # pool, and extract_mentions_llm's reservation cap assumes the
        # pool is ALONE — k coexisting pools would jointly reserve
        # k x (cpus-2) and livelock the upstream maps (observed at 16
        # CPUs x 2 groups). Divide the per-pool budget by the group
        # concurrency instead: the pools together still leave the
        # 2-CPU task headroom, and overlapping groups hides each
        # pool's ~seconds spin-up under the previous group's drain.
        llm_opts = dict(llm_opts or {})
        num_actors = int(llm_opts.get("num_actors") or
                         max(2, 2 * cpus))
        llm_opts["num_actors"] = num_actors
        llm_opts.setdefault("num_cpus", max(
            0.01, (cpus - 2) / (num_actors * group_concurrency)))
    if metrics is not None:
        metrics["n_partitions"] = len(groups)
        metrics.setdefault("skipped", 0)

    def run_group(pid: int, files: List[str]) -> None:
        part_t0 = time.time()
        from ..sources import sized_read_parquet
        ds = sized_read_parquet(files,
                                columns=["conv_id", "turn_idx", "text"],
                                target_block_bytes=8 << 20)
        n_turns = ds.count()
        docs = reassemble(ds, cfg)
        mentions = _run_extract(docs, cfg, engine, engine_factory, llm_opts)
        part_dir = os.path.join(out_dir, "mentions", f"part={pid}")
        n_rows = atomic_write_parquet(mentions, part_dir,
                                      cfg.min_rows_per_file)
        part = pads.dataset(part_dir, format="parquet")
        # a 0-row partition writes an empty dir (valid artifact) whose
        # schema has no columns — filtering it would raise
        n_ent = (part.count_rows(filter=pc.field("kind") == "entity")
                 if "kind" in part.schema.names else 0)
        commit_manifest(out_dir, "mentions", pid, {
            "input_files": files, "input_rows": n_turns,
            "output_rows": n_rows, "entities": n_ent,
            "triples": n_rows - n_ent,
            "duration_sec": time.time() - part_t0,
        })

    todo = []
    for pid, files in enumerate(groups):
        if is_committed(out_dir, "mentions", pid):
            if metrics is not None:
                metrics["skipped"] += 1
        else:
            todo.append((pid, files))
    if group_concurrency <= 1 or len(todo) <= 1:
        for pid, files in todo:
            run_group(pid, files)
    else:
        with ThreadPoolExecutor(max_workers=group_concurrency) as pool:
            # list() so the first exception propagates (fail the build,
            # committed partitions stay committed — that's the resume)
            list(pool.map(lambda pf: run_group(*pf), todo))


def build_kg_resumable(shard_paths: Sequence[str], out_dir: str,
                       cfg: Optional[KGConfig] = None,
                       shards_per_partition: int = 4,
                       do_canonicalize: bool = True,
                       engine=None, engine_factory=None,
                       llm_opts: Optional[Dict] = None,
                       group_concurrency: Optional[int] = None
                       ) -> KGBuildResult:
    """Partitioned, checkpointed build over conv_id-partitioned shards.

    Partition groups run ``group_concurrency`` at a time (bounded thread
    pool, each thread its own streaming execution): at thousands of groups
    the ~1-2 s per-execution fixed cost would otherwise serialize (the
    round-2 verdict's design note). The commit protocol is unchanged —
    atomic rename + per-partition manifest; deterministic content-hash ids
    make concurrent groups race-free (no shared mutable state). Default
    concurrency: 1 below 16 CPUs (one execution already uses the machine),
    else 2-4 scaled by width (A/B at sf0.1 / 32 CPUs / 8 groups: serial
    25.8-30.2 s, overlap-2 21.1-21.7 s, overlap-4 23.2 s — two overlapped
    executions hide the per-execution fixed cost; more just contend).
    """
    cfg = cfg or KGConfig()
    t0 = time.time()
    metrics: Dict[str, float] = {}
    run_mention_partitions(shard_paths, out_dir, cfg, shards_per_partition,
                           engine, engine_factory, llm_opts,
                           group_concurrency, metrics)
    tables = _mentions_to_outputs(out_dir, cfg, do_canonicalize, metrics)
    metrics["wall_sec"] = time.time() - t0
    commit_manifest(out_dir, "finalize", "all", metrics)
    return KGBuildResult(out_dir, tables, metrics)

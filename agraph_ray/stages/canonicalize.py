"""Stages E+F — entity linking (MinHash-LSH) + canonicalization.

Replaces the reference's O(n²) near-duplicate prefilter over all entity
pairs (agraph/builders/llm_builders.py:413-475) with minhash-LSH blocking:

  nodes → per-name minhash signature over char-k shingles → (band, bucket)
  rows → groupby((band, bucket, entity_type)) → candidate pairs inside each
  block only (capped) → deterministic name-similarity scoring → match edges
  → distributed connected components (state/unionfind.py) → canonical map →
  broadcast rewrite of nodes and edges.

Scoring mirrors the reference's candidate rule (same entity_type AND name
similarity; exact = 1.0, containment = 0.8, else difflib ratio —
agraph/builders/llm_builders.py:437-469) with an accept threshold in place
of the LLM pairwise judge (which plugs into the same pair table as an actor
pool when available).

Determinism: minhash permutations use fixed 64-bit multiply-shift constants
derived from an md5 stream seeded with "agraph-ray-minhash" — identical
across processes and cluster sizes.
"""

from __future__ import annotations

import difflib
import hashlib
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..config import KGConfig
from ..state.unionfind import connected_components, components_to_canonical_map

_MERSENNE = (1 << 61) - 1


def _perm_constants(num_perm: int) -> np.ndarray:
    """(num_perm, 2) deterministic odd multipliers + offsets."""
    stream = b"".join(
        hashlib.md5(f"agraph-ray-minhash-{i}".encode()).digest()
        for i in range(num_perm))
    arr = np.frombuffer(stream, dtype=np.uint64).reshape(num_perm, 2).copy()
    arr[:, 0] |= 1  # odd multipliers
    return arr


_TOKEN_HASH_KEY = "agraph-ray-tok!!"          # 16 bytes, fixed -> deterministic
_GRAM_MULT = np.uint64(0x9E3779B97F4A7C15)   # odd golden-ratio constant


def _hash_tokens(tokens) -> np.ndarray:
    """Vectorized stable 64-bit hash of a token/shingle array (SipHash via
    pandas.util.hash_array with a pinned key): one C call for the whole
    array instead of one Python md5 per element. Determinism across
    processes is pinned by tests/test_doc_dedup.py."""
    import pandas as _pd
    return _pd.util.hash_array(np.asarray(tokens, dtype=object),
                               hash_key=_TOKEN_HASH_KEY, categorize=False)


def _shingle_hashes(name: str, k: int) -> np.ndarray:
    """Stable 64-bit hashes of the char-k shingles of a (padded) name."""
    s = f"^{name}$"
    if len(s) < k:
        s = s.ljust(k, "_")
    return _hash_tokens(sorted({s[i:i + k] for i in range(len(s) - k + 1)}))


BAND_COLS = ["entity_id", "name", "entity_type", "aliases", "properties"]


class MinHashBander:
    """map_batches callable: nodes batch → (block_key, entity_id, name,
    entity_type, aliases, properties) band rows. Two block families:

    - minhash bands of the name's char shingles (near-identical names);
    - alias blocks ``A:<md5(value)>:<type>`` — one per element of
      {name} ∪ aliases, lowercased — so entities sharing an exact
      name/alias string collide even when their display names share no
      shingle (the reference's alias-overlap candidate signal,
      agraph/builders/llm_builders.py:471-475).

    Permutation constants build once per actor."""

    def __init__(self, cfg: Optional[KGConfig] = None):
        cfg = cfg or KGConfig()
        self.k = cfg.shingle_k
        self.num_perm = cfg.num_perm
        self.bands = cfg.lsh_bands
        self.rows = cfg.num_perm // cfg.lsh_bands
        self.perms = _perm_constants(cfg.num_perm)

    def signature(self, name: str) -> np.ndarray:
        h = _shingle_hashes(name, self.k)                      # (s,)
        a, b = self.perms[:, 0][:, None], self.perms[:, 1][:, None]
        vals = (a * h[None, :] + b) % _MERSENNE                # (p, s)
        return vals.min(axis=1)                                # (p,)

    def __call__(self, batch: pa.Table) -> pa.Table:
        has_alias = "aliases" in batch.schema.names
        has_props = "properties" in batch.schema.names
        aliases_in = (batch["aliases"].to_pylist() if has_alias
                      else [None] * len(batch))
        props_in = (batch["properties"].to_pylist() if has_props
                    else [None] * len(batch))
        keys, ids, names, types, aliases, props = [], [], [], [], [], []

        def emit(key, eid, name, etype, al, pr):
            keys.append(key); ids.append(eid); names.append(name)
            types.append(etype); aliases.append(al); props.append(pr)

        for eid, name, etype, al, pr in zip(batch["entity_id"].to_pylist(),
                                            batch["name"].to_pylist(),
                                            batch["entity_type"].to_pylist(),
                                            aliases_in, props_in):
            al = list(al) if al is not None else []
            sig = self.signature(name or "")
            for band in range(self.bands):
                chunk = sig[band * self.rows:(band + 1) * self.rows]
                digest = hashlib.md5(chunk.tobytes()).hexdigest()[:12]
                emit(f"{band}:{digest}:{etype}", eid, name, etype, al, pr)
            for value in {(name or "").lower()} | {a.lower() for a in al}:
                if value:
                    digest = hashlib.md5(value.encode()).hexdigest()[:12]
                    emit(f"A:{digest}:{etype}", eid, name, etype, al, pr)
        return pa.Table.from_arrays(
            [pa.array(keys, pa.string()), pa.array(ids, pa.string()),
             pa.array(names, pa.string()), pa.array(types, pa.string()),
             pa.array(aliases, pa.list_(pa.string())),
             pa.array(props, pa.string())],
            names=["block_key"] + BAND_COLS)


def name_similarity(a: str, b: str) -> float:
    """Reference scoring (llm_builders.py:450-469): exact 1.0, containment
    0.8, else SequenceMatcher ratio."""
    if a == b:
        return 1.0
    if a in b or b in a:
        return 0.8
    return difflib.SequenceMatcher(None, a, b).ratio()


def _jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def weighted_similarity(name_a: str, name_b: str, type_a: str, type_b: str,
                        aliases_a, aliases_b,
                        props_a: Optional[dict],
                        props_b: Optional[dict]) -> float:
    """Reference EntityMerger weighted similarity
    (agraph/services/entity_merger.py:193-293): 0.4 name word-Jaccard +
    0.2 type equality + 0.2 alias-set Jaccard + 0.2 property similarity
    with partial credit (case-insensitive equal 0.8, containment 0.5)."""
    name_s = _jaccard(set((name_a or "").lower().split()),
                      set((name_b or "").lower().split()))
    type_s = 1.0 if type_a == type_b else 0.0
    alias_s = _jaccard({a.lower() for a in aliases_a or []},
                       {a.lower() for a in aliases_b or []})
    pa_, pb = props_a or {}, props_b or {}
    if not pa_ and not pb:
        prop_s = 1.0
    elif not pa_ or not pb:
        prop_s = 0.0
    else:
        keys = set(pa_) | set(pb)
        match = 0.0
        for k in keys:
            v1, v2 = pa_.get(k), pb.get(k)
            if v1 == v2:
                match += 1
            elif isinstance(v1, str) and isinstance(v2, str):
                if v1.lower() == v2.lower():
                    match += 0.8
                elif v1.lower() in v2.lower() or v2.lower() in v1.lower():
                    match += 0.5
        prop_s = match / len(keys)
    return 0.4 * name_s + 0.2 * type_s + 0.2 * alias_s + 0.2 * prop_s


def _pair_factory(threshold: float, cap: int,
                  weighted_threshold: float = 0.8):
    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        """Whole-bucket reduction: iterate the (small) LSH/alias blocks
        inside this bucket, generating capped candidate pairs per block.

        Accept rules (all same-type by block-key construction):
        - minhash blocks: name similarity >= ``threshold``
          (llm_builders.py:437-469 scoring); pairs below it but carrying
          alias/property evidence get a second chance at the weighted
          score >= ``weighted_threshold`` (entity_merger.py:193-293) —
          pure-name pairs never reach the weighted path, so the regex KG
          (no aliases/properties) is unaffected;
        - alias blocks (``A:`` keys): members share an exact name/alias
          string — the reference's alias-overlap candidate signal
          (llm_builders.py:471-475); accepted outright with the weighted
          score recorded as the pair's sim.
        """
        import json as _json
        src, dst, sims = [], [], []
        has_attrs = "aliases" in df.columns
        if df.empty:
            return pd.DataFrame({"src": pd.Series([], dtype="object"),
                                 "dst": pd.Series([], dtype="object"),
                                 "sim": pd.Series([], dtype="float64")})
        # ONE global dedup + sort instead of a pandas frame per block
        # (per-block drop_duplicates/sort_values dominated the pass at
        # ~5k blocks — the per-key pathology, on the driver), then numpy
        # slices per block. Per-block member sets/order are unchanged:
        # dedup on (block_key, entity_id) keeps the same first
        # occurrence, and members iterate in entity_id order as before.
        df = (df.drop_duplicates(["block_key", "entity_id"])
              .sort_values(["block_key", "entity_id"], kind="mergesort"))
        bk_arr = df["block_key"].to_numpy()
        ids_arr = df["entity_id"].to_numpy()
        names_arr = df["name"].to_numpy()
        if has_attrs:
            types_arr = df["entity_type"].to_numpy()
            alias_arr = [list(a) if a is not None else []
                         for a in df["aliases"]]
            props_arr = [(_json.loads(p) if p else {})
                         for p in df["properties"]]
        starts = np.flatnonzero(
            np.r_[True, bk_arr[1:] != bk_arr[:-1]]) \
            if len(bk_arr) else np.empty(0, np.int64)
        ends = np.r_[starts[1:], len(bk_arr)] if len(starts) \
            else np.empty(0, np.int64)
        # The same entity pair collides in MANY minhash bands (up to
        # lsh_bands times) and possibly alias blocks too — score each
        # distinct pair once per kind, not once per collision
        # (SequenceMatcher dominates an otherwise-instant pass).
        _nc: dict = {}
        _wc: dict = {}

        def _name_sim(x: str, y: str) -> float:
            v = _nc.get((x, y))
            if v is None:
                v = _nc[(x, y)] = name_similarity(x, y)
            return v

        def _w_sim(ki, kj, *args) -> float:
            v = _wc.get((ki, kj))
            if v is None:
                v = _wc[(ki, kj)] = weighted_similarity(*args)
            return v
        for s0, e0 in zip(starts, ends):
            n = int(e0 - s0)
            if n < 2:
                continue
            ids = ids_arr[s0:e0].tolist()
            names = names_arr[s0:e0].tolist()
            is_alias_block = bk_arr[s0].startswith("A:")
            if has_attrs:
                types = types_arr[s0:e0].tolist()
                aliases = alias_arr[s0:e0]
                props = props_arr[s0:e0]
            else:
                types = [None] * n
                aliases = [[] for _ in ids]
                props = [{} for _ in ids]
            budget = cap
            for i in range(n):
                if budget <= 0:
                    break
                for j in range(i + 1, n):
                    budget -= 1
                    if budget < 0:
                        break
                    if is_alias_block:
                        src.append(ids[i]); dst.append(ids[j])
                        sims.append(_w_sim(
                            ids[i], ids[j],
                            names[i], names[j], types[i], types[j],
                            aliases[i], aliases[j], props[i], props[j]))
                        continue
                    s = _name_sim(names[i], names[j])
                    if s >= threshold:
                        src.append(ids[i]); dst.append(ids[j]); sims.append(s)
                    elif aliases[i] or aliases[j] or props[i] or props[j]:
                        w = _w_sim(
                            ids[i], ids[j],
                            names[i], names[j], types[i], types[j],
                            aliases[i], aliases[j], props[i], props[j])
                        if w >= weighted_threshold:
                            src.append(ids[i]); dst.append(ids[j])
                            sims.append(w)
        return pd.DataFrame({"src": pd.Series(src, dtype="object"),
                             "dst": pd.Series(dst, dtype="object"),
                             "sim": pd.Series(sims, dtype="float64")})
    return pairs_in_bucket


def _collect_df(ds: "ray.data.Dataset") -> pd.DataFrame:
    """Driver-side collect via Arrow concat — bypasses Dataset.to_pandas's
    tensor-extension casting, which chokes on ragged list columns."""
    tbls = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not tbls:
        return pd.DataFrame()
    return pa.concat_tables(tbls, promote_options="default").to_pandas()


def _band_cols(nodes: "ray.data.Dataset") -> List[str]:
    """Bander input columns: id/name/type always; aliases/properties when
    the node table carries them (older tables may not)."""
    schema = nodes.schema()
    have = set(schema.names) if schema is not None else set()
    base = ["entity_id", "name", "entity_type"]
    if not have:          # zero-row table with no schema: select nothing new
        return base
    return base + [c for c in ("aliases", "properties") if c in have]


def link_entities(nodes: "ray.data.Dataset",
                  cfg: Optional[KGConfig] = None,
                  num_buckets: int = 64) -> "ray.data.Dataset":
    """nodes → match edges (src, dst, sim) between near-duplicate entities."""
    from .common import bucketed_group_reduce, distinct_on
    cfg = cfg or KGConfig()
    # stateless tasks: the bander's only state (perm constants) is trivially
    # cheap, and tasks can't starve sibling operators the way a full-size
    # actor pool can
    bands = nodes.select_columns(_band_cols(nodes)).map_batches(
        MinHashBander(cfg), batch_format="pyarrow")
    pairs = bucketed_group_reduce(
        bands, ["block_key"], _pair_factory(cfg.link_threshold,
                                            cfg.max_block_pairs,
                                            cfg.weighted_threshold),
        num_buckets)
    # same pair can surface from several bands → dedup on (src, dst)
    return distinct_on(pairs, ["src", "dst"], num_buckets)


def find_similar_entities(nodes: "ray.data.Dataset",
                          cfg: Optional[KGConfig] = None,
                          similarity_threshold: Optional[float] = None,
                          max_pairs: Optional[int] = None
                          ) -> "ray.data.Dataset":
    """Ranked similar-entity pairs (src, dst, sim), similarity descending —
    the EntityMerger.find_similar_entities surface
    (agraph/services/entity_merger.py:149-191) with LSH/alias blocking in
    place of its O(n²) all-pairs scan. ``max_pairs`` mirrors the
    auto-merge cap (entity_merger.py:295-316 max_merges)."""
    import pyarrow.compute as pc2
    cfg = cfg or KGConfig()
    pairs = link_entities(nodes, cfg)
    if similarity_threshold is not None:
        pairs = pairs.map_batches(
            lambda t: t.filter(pc2.greater_equal(t["sim"],
                                                 similarity_threshold)),
            batch_format="pyarrow")
    ranked = pairs.sort(["sim", "src", "dst"],
                        descending=[True, False, False])
    return ranked.limit(max_pairs) if max_pairs else ranked


def compute_canonical_map(nodes: "ray.data.Dataset",
                          cfg: Optional[KGConfig] = None,
                          driver_threshold: int = 200_000) -> Dict[str, str]:
    """nodes → {entity_id: canonical_id} for matched near-duplicates.

    Size-adaptive like connected_components: minhash signatures always run
    distributed (map_batches — the expensive part), but when the node table
    is dictionary-sized (≤ ``driver_threshold``; the canonical-entity table
    is vocabulary, not corpus), the band rows are collected and pair
    generation + union-find run on the driver — the same blocking, ordering,
    caps and scoring as the distributed path, without its two shuffle
    rounds. Above the threshold the shuffle path takes over.
    """
    cfg = cfg or KGConfig()
    if nodes.count() > driver_threshold:
        match_edges = link_entities(nodes, cfg)
        if match_edges.count() == 0:
            return {}
        labels = connected_components(match_edges,
                                      max_iters=cfg.max_label_prop_iters)
        return components_to_canonical_map(labels)

    bands = nodes.select_columns(_band_cols(nodes)).map_batches(
        MinHashBander(cfg), batch_format="pyarrow")
    df = _collect_df(bands)
    return _map_from_band_rows(df, cfg)


def _map_from_band_rows(df: pd.DataFrame,
                        cfg: KGConfig) -> Dict[str, str]:
    """Band rows → candidate pairs → union-find → canonical map (the
    shared driver tail of compute_canonical_map and the single-collect
    canonicalize fast path)."""
    if df.empty:
        return {}
    pairs = _pair_factory(cfg.link_threshold, cfg.max_block_pairs,
                          cfg.weighted_threshold)(df)

    parent: Dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for s, d in zip(pairs["src"], pairs["dst"]):
        rs, rd_ = find(s), find(d)
        if rs != rd_:
            parent[max(rs, rd_)] = min(rs, rd_)
    return {n: find(n) for n in parent if find(n) != n}


def _canonical_map_from_df(ndf: pd.DataFrame,
                           cfg: KGConfig) -> Dict[str, str]:
    """compute_canonical_map over an already-collected node frame — the
    bander runs in-process on one Arrow table (vocabulary-sized input by
    contract), so no cluster execution at all."""
    if ndf.empty:
        return {}
    base = ["entity_id", "name", "entity_type"]
    cols = base + [c for c in ("aliases", "properties")
                   if c in ndf.columns]
    t = pa.Table.from_pandas(ndf[cols], preserve_index=False)
    return _map_from_band_rows(MinHashBander(cfg)(t).to_pandas(), cfg)


def _fill_schema_cols(df: pd.DataFrame, schema: pa.Schema) -> pd.DataFrame:
    """Add any schema columns the frame lacks as nulls (inputs predating
    the properties/description columns remain valid)."""
    for f in schema:
        if f.name not in df.columns:
            df[f.name] = None
    return df


def _merge_group_row(g: pd.DataFrame) -> pd.Series:
    """Collapse one canonical merge group to its representative row:
    max-confidence witness keeps its fields, other names become aliases,
    properties dict-merge, mention/conv counts sum."""
    g = g.sort_values(["confidence", "entity_id"],
                      ascending=[False, True], kind="mergesort")
    rep = g.iloc[0].copy()
    rep["entity_id"] = g["canonical_id"].iloc[0]
    others = sorted(set(g["name"]) - {rep["name"]})
    rep["aliases"] = sorted(
        {a for lst in g["aliases"] for a in lst} | set(others))
    if "properties" in g.columns:
        from .dedup import merge_properties
        gg = g.assign(__k="x")
        merged = merge_properties(gg, "__k")
        rep["properties"] = merged.get("x")
    rep["n_mentions"] = int(g["n_mentions"].sum())
    rep["n_convs"] = int(g["n_convs"].sum())
    return rep.drop(labels=["canonical_id"])


def _canonicalize_driver(nodes, edges, cmap, merge_group):
    """Whole-graph driver rewrite for dictionary-sized graphs: node merge,
    edge endpoint rewrite, self-loop drop, and signature re-dedup in one
    pandas pass — zero cluster executions. Returns (pa.Table, pa.Table)."""
    from .dedup import EDGES_SCHEMA, NODES_SCHEMA

    def _as_df(x):
        if isinstance(x, pd.DataFrame):
            return x
        return _collect_df(x) if hasattr(x, "iter_batches") \
            else x.to_pandas()

    ndf = _fill_schema_cols(_as_df(nodes), NODES_SCHEMA)
    ndf["aliases"] = ndf["aliases"].map(
        lambda v: list(v) if v is not None else [])
    affected = set(cmap) | set(cmap.values())
    mask = ndf["entity_id"].isin(affected)
    keep = ndf[~mask]
    hit = ndf[mask].copy()
    if len(hit):
        hit["canonical_id"] = hit["entity_id"].map(lambda i: cmap.get(i, i))
        merged = (hit.groupby("canonical_id", sort=False)
                  .apply(merge_group).reset_index(drop=True))
        ndf = pd.concat([keep, merged], ignore_index=True)
    else:
        ndf = keep
    nodes_t = pa.Table.from_pandas(ndf, schema=NODES_SCHEMA,
                                   preserve_index=False
                                   ).replace_schema_metadata(None)

    edf = _fill_schema_cols(_as_df(edges), EDGES_SCHEMA)
    edf["head_id"] = edf["head_id"].map(lambda i: cmap.get(i, i))
    edf["tail_id"] = edf["tail_id"].map(lambda i: cmap.get(i, i))
    edf = edf[edf["head_id"] != edf["tail_id"]]
    sig = (edf["head_id"] + "\x00" + edf["relation_type"]
           + "\x00" + edf["tail_id"])
    s = edf.assign(__sig=sig).sort_values(
        ["confidence", "relation_id"], ascending=[False, True],
        kind="mergesort")
    top = s.drop_duplicates("__sig", keep="first").set_index("__sig")
    top["n_mentions"] = s.groupby("__sig", sort=False)["n_mentions"].sum()
    edges_t = pa.Table.from_pandas(
        top.reset_index(drop=True), schema=EDGES_SCHEMA,
        preserve_index=False).replace_schema_metadata(None)
    return nodes_t, edges_t


def canonicalize(nodes: "ray.data.Dataset", edges: "ray.data.Dataset",
                 cfg: Optional[KGConfig] = None,
                 driver_threshold: int = 2_000_000):
    """Run linking + components, rewrite nodes/edges to canonical ids.

    Returns (canonical_nodes, canonical_edges, canonical_map); the first
    two are pyarrow Tables when the whole graph fits the driver rewrite
    path (≤ ``driver_threshold`` rows each — the canonical graph is
    vocabulary-sized relative to the corpus), else Datasets. The
    distributed rewrite is a broadcast-map (ray.put of the non-trivial
    id→root dict) — only matched duplicates appear in the map.
    """
    cfg = cfg or KGConfig()

    if (nodes.count() <= min(driver_threshold, 200_000)
            and edges.count() <= driver_threshold):
        # Single-collect fast path: pull nodes and edges once (two reads
        # of already-materialized blocks, overlapped on threads) and run
        # banding, pair generation, union-find and the whole-graph
        # rewrite in-process. Replaces ~6 fixed-latency cluster
        # executions with 2 — this was the dominant SERIAL term of the
        # headline pipeline (4.5 s at every CPU count on a 241-node
        # graph), i.e. the Amdahl cap on scaling efficiency.
        from concurrent.futures import ThreadPoolExecutor
        from .dedup import EDGES_SCHEMA, NODES_SCHEMA
        with ThreadPoolExecutor(max_workers=2) as tp:
            f_n = tp.submit(_collect_df, nodes)
            f_e = tp.submit(_collect_df, edges)
            ndf, edf = f_n.result(), f_e.result()
        ndf = _fill_schema_cols(ndf, NODES_SCHEMA) if len(ndf) else ndf
        edf = _fill_schema_cols(edf, EDGES_SCHEMA) if len(edf) else edf
        cmap = _canonical_map_from_df(ndf, cfg)
        if not cmap:
            return nodes, edges, {}
        nodes_t, edges_t = _canonicalize_driver(ndf, edf, cmap,
                                                _merge_group_row)
        return nodes_t, edges_t, cmap

    cmap = compute_canonical_map(nodes, cfg)
    if not cmap:
        return nodes, edges, {}
    nodes_o, edges_o = apply_canonical_map(nodes, edges, cmap, cfg,
                                           driver_threshold)
    return nodes_o, edges_o, cmap


def apply_canonical_map(nodes: "ray.data.Dataset", edges: "ray.data.Dataset",
                        cmap: Dict[str, str],
                        cfg: Optional[KGConfig] = None,
                        driver_threshold: int = 2_000_000):
    """Rewrite nodes/edges under an externally computed ``{entity_id:
    canonical_id}`` map — the post-linking tail of :func:`canonicalize`,
    exposed so alternative match sources (embedding-ANN candidates run
    through the LLM pair judge — the reference lifecycle
    agraph/builders/llm_builders.py:1035-1097) can share the same merge
    semantics. Size-adaptive exactly like canonicalize: whole-graph
    driver rewrite when both tables fit ``driver_threshold``, else the
    broadcast filter-map (unaffected nodes never shuffle)."""
    cfg = cfg or KGConfig()
    if not cmap:
        return nodes, edges
    _merge_group = _merge_group_row

    # cmap came from an external linker, but the whole-graph rewrite
    # still fits the driver
    if (nodes.count() <= driver_threshold
            and edges.count() <= driver_threshold):
        return _canonicalize_driver(nodes, edges, cmap, _merge_group)

    cmap_ref = ray.put(cmap)
    # every node participating in any merge group (sources AND targets)
    affected = set(cmap) | set(cmap.values())
    affected_ref = ray.put(affected)

    # Nodes outside any merge group pass through untouched — a pure filter
    # map, NO shuffle. Only the matched minority (bounded by |cmap|) is
    # pulled to the driver, merged per canonical group, and unioned back.
    def keep_unaffected(batch: pa.Table) -> pa.Table:
        aff = ray.get(affected_ref)
        mask = [i not in aff for i in batch["entity_id"].to_pylist()]
        return batch.filter(pa.array(mask))

    def keep_affected(batch: pa.Table) -> pa.Table:
        aff = ray.get(affected_ref)
        m: Dict[str, str] = ray.get(cmap_ref)
        mask = [i in aff for i in batch["entity_id"].to_pylist()]
        t = batch.filter(pa.array(mask))
        canon = [m.get(i, i) for i in t["entity_id"].to_pylist()]
        return t.append_column("canonical_id", pa.array(canon, pa.string()))

    import ray.data as rd

    from .common import bucketed_group_reduce
    from .dedup import EDGES_SCHEMA, NODES_SCHEMA
    merged_df = _collect_df(
        nodes.map_batches(keep_affected, batch_format="pyarrow"))
    merged_df["aliases"] = merged_df["aliases"].map(
        lambda v: list(v) if v is not None else [])
    merged_rows = (merged_df.groupby("canonical_id", sort=False)
                   .apply(_merge_group).reset_index(drop=True)
                   if len(merged_df) else merged_df.drop(
                       columns=["canonical_id"], errors="ignore"))
    merged_rows = _fill_schema_cols(merged_rows, NODES_SCHEMA)
    canon_nodes = nodes.map_batches(
        keep_unaffected, batch_format="pyarrow").union(
        rd.from_arrow(pa.Table.from_pandas(
            merged_rows, schema=NODES_SCHEMA, preserve_index=False)
            .replace_schema_metadata(None)))

    def rewrite_edges(batch: pa.Table) -> pa.Table:
        m: Dict[str, str] = ray.get(cmap_ref)
        head = [m.get(i, i) for i in batch["head_id"].to_pylist()]
        tail = [m.get(i, i) for i in batch["tail_id"].to_pylist()]
        out = batch.set_column(batch.schema.get_field_index("head_id"),
                               "head_id", pa.array(head, pa.string()))
        out = out.set_column(out.schema.get_field_index("tail_id"),
                             "tail_id", pa.array(tail, pa.string()))
        # a merge can collapse both endpoints into one node — such
        # self-relations are invalid (agraph/relations.py:116-125)
        import pyarrow.compute as pc
        return out.filter(pc.invert(pc.equal(out["head_id"], out["tail_id"])))

    def resig_dedup(df: pd.DataFrame) -> pd.DataFrame:
        """Rewritten endpoints can make two edges share a (head, type, tail)
        signature — keep the max-confidence witness (utils.py:431-452)."""
        from .dedup import EDGES_SCHEMA as _ES
        df = _fill_schema_cols(df, _ES)
        df = df.assign(__sig=df["head_id"] + "\x00" + df["relation_type"]
                       + "\x00" + df["tail_id"])
        s = df.sort_values(["confidence", "relation_id"],
                           ascending=[False, True], kind="mergesort")
        top = s.drop_duplicates("__sig", keep="first").set_index("__sig")
        top["n_mentions"] = df.groupby("__sig", sort=False)["n_mentions"].sum()
        return top.reset_index(drop=True)

    canon_edges = bucketed_group_reduce(
        edges.map_batches(rewrite_edges, batch_format="pyarrow"),
        ["head_id", "relation_type", "tail_id"], resig_dedup,
        schema=EDGES_SCHEMA)
    return canon_nodes, canon_edges

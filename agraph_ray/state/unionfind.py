"""Distributed connected components (union-find) over Dataset shuffles.

Replaces the reference's in-heap union-find over duplicate pairs
(agraph/builders/llm_builders.py:513-551) with min-label propagation
expressed entirely as Ray Data groupby-aggregate shuffles, so it scales to
edge sets far beyond one node's memory (BASELINE.json north_star step 4).

Each round is two hash-shuffled group steps and no join (Ray 2.49's
``Dataset.join`` mis-handles empty hash partitions, and a join can always be
re-expressed as a co-grouped ``map_groups`` — the portable partitioned-join
pattern):

  1. group (labels ∪ edges) by the *source* key: every edge row learns its
     source's current label and forwards it to ``dst``; the node also
     re-emits its own label tagged as "old".
  2. group the messages by the *destination* node: new label = min over
     (received ∪ own); a changed-flag is computed against the "old" tag.

Convergence = global Sum(changed) == 0, reached in O(component diameter)
rounds. Only edge-incident nodes participate — every other entity is a
singleton by definition — so the shuffle volume is bounded by the match-edge
set, not the corpus.
"""

from __future__ import annotations

from typing import Dict

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _empty_labels():
    import ray.data as rd
    return rd.from_arrow(pa.Table.from_pydict(
        {"node": pa.array([], pa.string()), "label": pa.array([], pa.string())}))


def _driver_union_find(sym_edges) -> "ray.data.Dataset":
    """Exact union-find on the driver for small edge sets. One streaming
    pass over the edges; path compression; labels = min node id."""
    import ray.data as rd
    parent: Dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:       # path compression
            parent[x], x = root, parent[x]
        return root

    for b in sym_edges.iter_batches(batch_format="pyarrow"):
        for s, d in zip(b["src"].to_pylist(), b["dst"].to_pylist()):
            rs, rd_ = find(s), find(d)
            if rs != rd_:
                parent[max(rs, rd_)] = min(rs, rd_)
    labels = {n: find(n) for n in parent}
    return rd.from_arrow(pa.table({
        "node": pa.array(list(labels.keys()), pa.string()),
        "label": pa.array(list(labels.values()), pa.string())}))


def connected_components(edges: "ray.data.Dataset",
                         max_iters: int = 25,
                         driver_threshold: int = 2_000_000) -> "ray.data.Dataset":
    """``edges(src, dst)`` (undirected pairs) → ``(node, label)`` with
    label = min node id in the component. Nodes in no edge are absent.

    Size-adaptive: below ``driver_threshold`` symmetric edges the exact
    union-find runs on the driver in one pass (a label-propagation round
    costs several whole-cluster executions — pure overhead for a
    few-thousand-edge match graph); above it, the distributed min-label
    propagation loop below takes over."""
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    def sym(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [pa.concat_arrays([batch["src"].combine_chunks(),
                               batch["dst"].combine_chunks()]),
             pa.concat_arrays([batch["dst"].combine_chunks(),
                               batch["src"].combine_chunks()])],
            names=["src", "dst"])

    # The edge-incident subgraph is orders of magnitude smaller than the
    # corpus (only near-duplicate candidates), so pinning it and the label
    # table per round is safe and avoids re-running the lazy lineage.
    sym_edges = edges.select_columns(["src", "dst"]).map_batches(
        sym, batch_format="pyarrow").materialize()
    n_edges = sym_edges.count()
    if n_edges == 0:
        return _empty_labels()
    if n_edges <= driver_threshold:
        return _driver_union_find(sym_edges)

    labels = (sym_edges.groupby("src")
              .aggregate(Min("src", alias_name="label"))
              .map_batches(lambda t: t.rename_columns(["node", "label"]),
                           batch_format="pyarrow")).materialize()

    def forward(group: pd.DataFrame) -> pd.DataFrame:
        """Group = one source node's label row + its outgoing edges."""
        lab_rows = group.loc[group["dst"].isna(), "label"]
        if lab_rows.empty:          # defensive: no label row for this key
            return pd.DataFrame({"node": pd.Series(dtype="object"),
                                 "label": pd.Series(dtype="object"),
                                 "old": pd.Series(dtype="object")})
        lab = lab_rows.iloc[0]
        dsts = group["dst"].dropna()
        return pd.DataFrame({
            "node": pd.concat([dsts, pd.Series([group["key"].iloc[0]])],
                              ignore_index=True),
            "label": lab,
            "old": [None] * len(dsts) + [lab],
        })

    def resolve(group: pd.DataFrame) -> pd.DataFrame:
        """Group = one destination node's inbound labels + its own."""
        new = group["label"].min()
        olds = group["old"].dropna()
        old = olds.iloc[0] if len(olds) else None
        return pd.DataFrame({"node": [group["node"].iloc[0]],
                             "label": [new],
                             "chg": [0 if new == old else 1]})

    for _ in range(max_iters):
        tagged_labels = labels.map_batches(
            lambda t: pa.Table.from_arrays(
                [t["node"].combine_chunks(),
                 pa.nulls(len(t), pa.string()),
                 t["label"].combine_chunks()],
                names=["key", "dst", "label"]),
            batch_format="pyarrow")
        tagged_edges = sym_edges.map_batches(
            lambda t: pa.Table.from_arrays(
                [t["src"].combine_chunks(), t["dst"].combine_chunks(),
                 pa.nulls(len(t), pa.string())],
                names=["key", "dst", "label"]),
            batch_format="pyarrow")
        msgs = tagged_labels.union(tagged_edges).groupby("key").map_groups(
            forward, batch_format="pandas")
        resolved = msgs.groupby("node").map_groups(
            resolve, batch_format="pandas").materialize()
        n_changed = resolved.aggregate(Sum("chg", alias_name="n"))["n"]
        labels = resolved.select_columns(["node", "label"]).materialize()
        if not n_changed:
            break
    return labels


def components_to_canonical_map(labels: "ray.data.Dataset") -> Dict[str, str]:
    """Collect the non-trivial (node != label) part of the labelling as a
    driver-side dict for broadcast rewrite. Safe because its size is bounded
    by the number of *merged* entities (matched near-duplicates), which is a
    tiny fraction of the corpus; assert-guarded."""
    out: Dict[str, str] = {}
    nontrivial = labels.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t["node"], t["label"]))),
        batch_format="pyarrow")
    for b in nontrivial.iter_batches(batch_format="pyarrow"):
        out.update(zip(b["node"].to_pylist(), b["label"].to_pylist()))
        assert len(out) < 50_000_000, "canonical map too large to broadcast"
    return out

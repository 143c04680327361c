"""Sequence packing — assembling documents into fixed token-budget
training sequences, plus the distributed prefix-sum primitive it rides on.

Two packing disciplines, both deterministic over unordered input:

* ``pack_concat`` — the "concat and cut" rule every large LM pretrain
  pipeline uses: documents are laid out in a pinned global order
  (``order_col``) into one virtual token stream and cut every ``cap``
  tokens; a document belongs to the sequence where it *starts* (documents
  may straddle a cut — the trainer masks across the boundary). This is a
  pure function of the exclusive prefix sum of token counts, so it is
  SQL-expressible (window ``SUM ... ROWS UNBOUNDED PRECEDING``) and
  oracle-checked.

* ``pack_greedy`` — first-fit-decreasing bin packing *within hash
  partitions*: each partition packs its documents into bins of at most
  ``cap`` tokens (oversized documents get a singleton bin). Bins never
  cross partitions — at 100-TB scale packing is embarrassingly
  partitionable and a global first-fit would serialize on one node; the
  waste vs a global pack is bounded by one non-full bin per partition.

The prefix sum (``ordered_prefix_sum``) is the textbook two-pass scan
expressed on Ray Data blocks: ``sort`` range-partitions the rows, pass 1
reduces each block to ``(min_key, block_sum)`` (one tiny row per block on
the driver), the driver computes the exclusive scan over blocks (O(blocks),
not O(rows)), and pass 2 re-reads the same materialized blocks adding the
block offset to a within-block vectorized cumsum. No row-level data ever
reaches the driver.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.common import bucketed_group_reduce

__all__ = ["ordered_prefix_sum", "pack_concat", "pack_greedy"]


def ordered_prefix_sum(ds: "ray.data.Dataset", order_col: str,
                       val_col: str, out_col: str = "prefix"
                       ) -> "ray.data.Dataset":
    """Exclusive prefix sum of ``val_col`` in ascending ``order_col``
    order. ``order_col`` values must be unique (they identify blocks
    after the range-partitioning sort; document ids are).

    Returns the sorted dataset with an ``out_col`` int64 column: the sum
    of ``val_col`` over all rows strictly before this row in key order.
    Two passes over the same materialized sorted blocks; driver state is
    one (min_key, sum) pair per block.
    """
    import ray

    sorted_ds = ds.sort(order_col).materialize()

    def block_summary(t: pa.Table) -> pa.Table:
        # the block's own column carries the right Arrow type; empty
        # blocks emit an empty slice of it
        k = t[order_col].slice(0, 1)
        if len(t) == 0:
            s = pa.array([], pa.int64())
        else:
            s = pa.array([pc.sum(pc.cast(t[val_col], pa.int64())).as_py()
                          or 0], pa.int64())
        return pa.table({"k": k, "s": s})

    # one row per block → tiny driver-side table (O(num_blocks)).
    # Blocks are range-partitioned: sorting summaries by their min key
    # reproduces global block order (keys unique ⇒ min keys distinct).
    # Native-typed keys: int order is numeric; Python str comparison is
    # codepoint order, which equals Arrow's bytewise UTF-8 order.
    # batch_size=None ⇒ one batch per materialized block, identically in
    # both passes (the block's first row is its identity)
    summaries = sorted(sorted_ds.map_batches(
        block_summary, batch_format="pyarrow",
        batch_size=None).take_all(),
        key=lambda r: r["k"])
    keys = {r["k"]: i for i, r in enumerate(summaries)}
    offs = np.concatenate(
        [[0], np.cumsum([r["s"] for r in summaries])[:-1]]).astype(np.int64)
    off_ref = ray.put((keys, offs))

    def add_prefix(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        ks, os_ = ray.get(off_ref)
        base = int(os_[ks[t[order_col][0].as_py()]])
        v = pc.cast(t[val_col], pa.int64()).to_numpy(zero_copy_only=False)
        prefix = base + np.concatenate([[0], np.cumsum(v[:-1])])
        return t.append_column(out_col, pa.array(prefix, pa.int64()))

    return sorted_ds.map_batches(add_prefix, batch_format="pyarrow",
                                 batch_size=None)


def pack_concat(ds: "ray.data.Dataset", token_col: str, cap: int,
                order_col: str = "doc_id") -> "ray.data.Dataset":
    """Concat-and-cut sequence packing: documents in ``order_col`` order
    form one token stream cut every ``cap`` tokens. Emits
    ``(order_col, token_col, seq_id, seq_offset)`` — the sequence this
    document *starts* in and its token offset within it."""
    assert cap > 0
    with_prefix = ordered_prefix_sum(ds, order_col, token_col)

    def finish(t: pa.Table) -> pa.Table:
        p = t["prefix"].to_numpy(zero_copy_only=False)
        return pa.table({
            order_col: t[order_col],
            token_col: t[token_col],
            "seq_id": pa.array(p // cap, pa.int64()),
            "seq_offset": pa.array(p % cap, pa.int64())})

    return with_prefix.map_batches(finish, batch_format="pyarrow")


def pack_greedy(ds: "ray.data.Dataset", token_col: str, cap: int,
                id_col: str = "doc_id", num_partitions: int = 64
                ) -> "ray.data.Dataset":
    """First-fit-decreasing packing within ``num_partitions`` hash
    partitions of ``id_col``. Emits ``(id_col, token_col, partition,
    bin, bin_tokens)`` with ``bin`` unique within a partition and
    ``bin_tokens`` the bin's total (≤ cap unless a single oversized
    document). Deterministic: ties broken by id."""
    assert cap > 0

    def pack_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([token_col, id_col], kind="stable",
                            ascending=[False, True])
        toks = df[token_col].to_numpy(dtype=np.int64)
        min_tok = int(toks[-1]) if len(toks) else 0
        bins: List[int] = []          # bin id per row (in sorted order)
        loads: List[int] = []         # current load per bin
        # first-fit over bins that still have room for the smallest
        # remaining document; partitions are bounded by the hash split so
        # the O(rows × open-bins) scan stays local.
        open_bins: List[int] = []
        for tcount in toks:
            placed = -1
            for bi in open_bins:
                if loads[bi] + tcount <= cap:
                    placed = bi
                    break
            if placed < 0:
                placed = len(loads)
                loads.append(0)
                open_bins.append(placed)
            loads[placed] += tcount
            bins.append(placed)
            if cap - loads[placed] < min_tok:
                open_bins.remove(placed)
        part = int(df["__part"].iloc[0]) if "__part" in df else 0
        out = df.assign(partition=part, bin=np.array(bins, dtype=np.int64))
        out["bin_tokens"] = out["bin"].map(lambda b: loads[b]).astype(np.int64)
        return out[[id_col, token_col, "partition", "bin", "bin_tokens"]]

    def tag(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t.select([id_col]).to_pandas(), index=False).to_numpy()
        return t.append_column(
            "__part", pa.array((h % num_partitions).astype("int64")))

    from ..stages.common import arrow_col_type
    tagged = ds.map_batches(tag, batch_format="pyarrow")
    schema = pa.schema([(id_col, arrow_col_type(ds, id_col)),
                        (token_col, pa.int64()),
                        ("partition", pa.int64()),
                        ("bin", pa.int64()),
                        ("bin_tokens", pa.int64())])

    def reduce_df(df: pd.DataFrame) -> pd.DataFrame:
        # a bucket may hold several hash partitions — pack each on its own
        df = df.copy()
        df[token_col] = df[token_col].astype(np.int64)
        parts = [pack_partition(g) for _, g in
                 df.groupby("__part", sort=False)]
        return pd.concat(parts, ignore_index=True) if parts else \
            pd.DataFrame(columns=[id_col, token_col, "partition", "bin",
                                  "bin_tokens"])

    return bucketed_group_reduce(tagged, ["__part"], reduce_df,
                                 num_buckets=num_partitions, schema=schema)


def select_until_budget(ds: "ray.data.Dataset", score_col: str,
                        id_col: str, val_col: str, budget: int,
                        descending: bool = True) -> "ray.data.Dataset":
    """Greedy budget-capped corpus selection: rank rows by
    ``(score_col desc, id_col asc)`` and keep the maximal prefix whose
    INCLUSIVE cumulative ``val_col`` stays within ``budget`` — "the
    best-quality N tokens" selection rule of training-data curation.
    Because ``val_col`` >= 0 makes the running total monotone, the kept
    set is exactly a prefix, which is also what the SQL oracle's window
    sum expresses.

    → the selected rows plus ``cum`` (inclusive running total).
    Same two-pass shape as :func:`ordered_prefix_sum`, generalized to a
    (score, id) composite order: one range-partitioned sort, O(blocks)
    driver state (each block's first key + sum), then a map pass that
    adds the prefix and filters. Rows never leave their block twice.
    """
    import ray

    sorted_ds = ds.sort([score_col, id_col],
                        descending=[descending, False]).materialize()

    def block_summary(t: pa.Table) -> pa.Table:
        s = t[score_col].slice(0, 1)
        i = t[id_col].slice(0, 1)
        if len(t) == 0:
            v = pa.array([], pa.int64())
        else:
            v = pa.array([pc.sum(pc.cast(t[val_col], pa.int64())).as_py()
                          or 0], pa.int64())
        return pa.table({"s": s, "i": i, "v": v})

    summaries = sorted(
        sorted_ds.map_batches(block_summary, batch_format="pyarrow",
                              batch_size=None).take_all(),
        key=lambda r: ((-r["s"] if descending else r["s"]), r["i"]))
    keys = {(r["s"], r["i"]): ix for ix, r in enumerate(summaries)}
    offs = np.concatenate(
        [[0], np.cumsum([r["v"] for r in summaries])[:-1]]).astype(np.int64)
    off_ref = ray.put((keys, offs))

    def add_cum_filter(t: pa.Table) -> pa.Table:
        out_t = t.append_column("cum", pa.array([], pa.int64())) \
            if len(t) == 0 else None
        if out_t is not None:
            return out_t
        ks, os_ = ray.get(off_ref)
        base = int(os_[ks[(t[score_col][0].as_py(),
                           t[id_col][0].as_py())]])
        v = pc.cast(t[val_col], pa.int64()).to_numpy(zero_copy_only=False)
        cum = base + np.cumsum(v)
        out = t.append_column("cum", pa.array(cum, pa.int64()))
        return out.filter(pa.array(cum <= budget))

    return sorted_ds.map_batches(add_cum_filter, batch_format="pyarrow",
                                 batch_size=None)

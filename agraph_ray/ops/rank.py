"""Global total-order ranking — distributed ``ROW_NUMBER() OVER (ORDER BY
...)`` and ``NTILE(k)`` without collecting rows.

Same two-pass scan shape as ``ops.pack.ordered_prefix_sum``: ``sort``
range-partitions the rows, pass 1 reduces each materialized block to
``(first-row key tuple, row count)`` — one tiny row per block on the
driver — the driver computes the exclusive scan over blocks (O(blocks)),
and pass 2 re-reads the same blocks adding the block offset to a
within-block ``arange``. The composite ``order_cols`` key must be a total
order (make the last column a unique id), both so the result is
deterministic and so each block's first row identifies it uniquely.

``global_ntile`` implements SQL's exact NTILE rule: with n rows and k
tiles, the first ``n % k`` tiles get ``n//k + 1`` rows — a sort-backed
range partitioner (equal-count key ranges) usable to bucket a table for
downstream co-located processing.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa

__all__ = ["global_row_number", "global_ntile"]


def _ranked(ds: "ray.data.Dataset", order_cols: List[str]):
    """Sorted, materialized dataset + per-block base offsets keyed by the
    block's first-row key tuple."""
    import ray

    sorted_ds = ds.sort(order_cols).materialize()

    def block_summary(t: pa.Table) -> pa.Table:
        out = {c: t[c].slice(0, 1) for c in order_cols}
        out["__n"] = pa.array([len(t)] if len(t) else [], pa.int64())
        for c in order_cols:
            if len(t) == 0:
                out[c] = t[c].slice(0, 0)
        return pa.table(out)

    summaries = sorted(
        sorted_ds.map_batches(block_summary, batch_format="pyarrow",
                              batch_size=None).take_all(),
        key=lambda r: tuple(r[c] for c in order_cols))
    keys = {tuple(r[c] for c in order_cols): i
            for i, r in enumerate(summaries)}
    if len(keys) != len(summaries):
        raise ValueError(
            "order_cols is not a total order (two blocks share a first "
            "row) — append a unique id column")
    offs = np.concatenate(
        [[0], np.cumsum([r["__n"] for r in summaries])[:-1]]
    ).astype(np.int64)
    n_total = int(sum(r["__n"] for r in summaries))
    return sorted_ds, ray.put((keys, offs)), n_total


def global_row_number(ds: "ray.data.Dataset", order_cols: List[str],
                      out_col: str = "rn") -> "ray.data.Dataset":
    """Append a 1-based global row number in ascending ``order_cols``
    order — SQL ``ROW_NUMBER() OVER (ORDER BY ...)``."""
    import ray

    sorted_ds, off_ref, _ = _ranked(ds, order_cols)

    def add_rn(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        ks, os_ = ray.get(off_ref)
        base = int(os_[ks[tuple(t[c][0].as_py() for c in order_cols)]])
        rn = base + 1 + np.arange(len(t), dtype=np.int64)
        return t.append_column(out_col, pa.array(rn, pa.int64()))

    return sorted_ds.map_batches(add_rn, batch_format="pyarrow",
                                 batch_size=None)


def global_ntile(ds: "ray.data.Dataset", order_cols: List[str], k: int,
                 out_col: str = "tile") -> "ray.data.Dataset":
    """Append SQL ``NTILE(k) OVER (ORDER BY ...)``: 1-based equal-count
    tile ids (the first ``n % k`` tiles hold one extra row). The tile
    boundaries are a data-independent function of (rank, n), so this is
    also an exact equal-count range partitioner."""
    import ray

    if k <= 0:
        raise ValueError("k must be positive")
    sorted_ds, off_ref, n = _ranked(ds, order_cols)
    q, r = divmod(n, k)

    def add_tile(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        ks, os_ = ray.get(off_ref)
        base = int(os_[ks[tuple(t[c][0].as_py() for c in order_cols)]])
        rn0 = base + np.arange(len(t), dtype=np.int64)   # 0-based rank
        big = r * (q + 1)                                # rows in fat tiles
        if q == 0:
            tile = rn0 + 1      # n < k: row i goes to tile i+1
        else:
            tile = np.where(rn0 < big, rn0 // (q + 1),
                            r + (rn0 - big) // q) + 1
        return t.append_column(out_col, pa.array(tile, pa.int64()))

    return sorted_ds.map_batches(add_tile, batch_format="pyarrow",
                                 batch_size=None)

"""Relational set operations (SQL ``INTERSECT`` / ``EXCEPT``, distinct
semantics) between two Datasets with identical schemas.

Both are one tagged-union bucketed reduce: rows from either side are
tagged with a source bit, a per-batch combiner collapses each batch to
its distinct (row, src) pairs, and one hash-partitioned reduce keyed on
ALL columns decides membership per distinct row vectorized (min/max of
the source bit — present-in-both vs only-in-left). The shuffle carries
distinct-row cardinality, not input size, and no side is ever collected
to the driver (contrast ``broadcast_join``: these are the right tool when
BOTH sides are large).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..stages.common import bucketed_group_reduce

_SRC = "__src"


def _tagged_union(a: "ray.data.Dataset", b: "ray.data.Dataset"):
    cols = list(a.schema().names)
    if list(b.schema().names) != cols:
        raise ValueError(f"schema mismatch: {cols} vs {b.schema().names}")

    def tag(v: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                _SRC, pa.array([v] * len(t), pa.int8()))
        return f

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    u = (a.map_batches(tag(0), batch_format="pyarrow")
         .union(b.map_batches(tag(1), batch_format="pyarrow"))
         .map_batches(combiner, batch_format="pandas"))
    return u, cols


def _set_op(a, b, keep, num_buckets: int):
    u, cols = _tagged_union(a, b)

    def reduce_df(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(cols, sort=False, dropna=False)[_SRC].agg(
            ["min", "max"]).reset_index()
        return g[keep(g)][cols]

    schema = pa.schema(
        [(n, t) for n, t in zip(a.schema().names, a.schema().types)])
    return bucketed_group_reduce(u, cols, reduce_df, num_buckets,
                                 schema=schema)


def intersect_distinct(a: "ray.data.Dataset", b: "ray.data.Dataset",
                       num_buckets: int = 64) -> "ray.data.Dataset":
    """SQL ``a INTERSECT b``: distinct rows present in both inputs."""
    return _set_op(a, b, lambda g: (g["min"] == 0) & (g["max"] == 1),
                   num_buckets)


def except_distinct(a: "ray.data.Dataset", b: "ray.data.Dataset",
                    num_buckets: int = 64) -> "ray.data.Dataset":
    """SQL ``a EXCEPT b``: distinct rows of ``a`` absent from ``b``."""
    return _set_op(a, b, lambda g: g["max"] == 0, num_buckets)


def table_diff(a: "ray.data.Dataset", b: "ray.data.Dataset",
               num_buckets: int = 64) -> "ray.data.Dataset":
    """Snapshot diff (distinct-row semantics): rows only in ``a`` emit
    ``status='removed'``, rows only in ``b`` emit ``status='added'`` —
    the change-data view between two versions of a table. Two bucketed
    set ops over one tagged union each; rows in both snapshots never
    surface."""
    def stamp(s: str):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "status", pa.array([s] * len(t), pa.string()))
        return f

    removed = except_distinct(a, b, num_buckets).map_batches(
        stamp("removed"), batch_format="pyarrow")
    added = except_distinct(b, a, num_buckets).map_batches(
        stamp("added"), batch_format="pyarrow")
    return removed.union(added)

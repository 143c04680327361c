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


def upsert_latest(base: "ray.data.Dataset", updates: "ray.data.Dataset",
                  keys: "list[str]", order_col: str,
                  num_buckets: int = 64) -> "ray.data.Dataset":
    """SCD-type-1 MERGE: one surviving row per key — the one with the
    highest ``order_col``; on order ties the updates side wins (matched
    keys update, unmatched keys insert, base-only keys pass through).

    One tagged union + one key-bucketed reduce; a per-batch combiner
    keeps only each batch's per-key winner, so the shuffle carries at
    most one row per (key, batch) — never the update history. Fully
    deterministic: remaining ties resolve by a stable sort over all
    columns."""
    cols = list(base.schema().names)
    if list(updates.schema().names) != cols:
        raise ValueError(
            f"schema mismatch: {cols} vs {updates.schema().names}")

    def tag(v: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(_SRC, pa.array([v] * len(t), pa.int8()))
        return f

    def winner(df: pd.DataFrame) -> pd.DataFrame:
        other = [c for c in df.columns
                 if c not in keys and c not in (order_col, _SRC)]
        df = df.sort_values(keys + [order_col, _SRC] + other,
                            kind="mergesort")
        return df.drop_duplicates(keys, keep="last")

    u = (base.map_batches(tag(0), batch_format="pyarrow")
         .union(updates.map_batches(tag(1), batch_format="pyarrow"))
         .map_batches(winner, batch_format="pandas"))
    out = bucketed_group_reduce(u, keys, winner, num_buckets)
    return out.drop_columns([_SRC])


def table_checksum(ds: "ray.data.Dataset", cols: "list[str]",
                   mod: int = 1_000_000_007) -> "ray.data.Dataset":
    """Order-independent content checksum: one row ``(n_rows, checksum)``
    where checksum = sum over rows of md5-prefix(row string) mod ``mod``
    — the anti-entropy primitive for verifying a copy/migration without
    moving or sorting either table. Each batch reduces to one (sum, count)
    partial; only |blocks| tiny rows reach the final fold.

    Row rendering is pinned to DuckDB semantics so an oracle can recompute
    it: values joined with '|' after CAST AS VARCHAR (int64/string columns
    only — floats and timestamps render engine-specifically, reject them),
    NULLs rendered as the empty string via coalesce. Checksum term =
    CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % mod."""
    import hashlib

    import numpy as np
    import pyarrow.compute as pc

    from ..stages.common import arrow_col_type
    for name in cols:
        typ = arrow_col_type(ds, name)
        if not (pa.types.is_integer(typ) or pa.types.is_string(typ)
                or pa.types.is_large_string(typ)):
            raise ValueError(
                f"checksum column {name} has non-portable type {typ}")

    def partial(t: pa.Table) -> pa.Table:
        parts = []
        for c in cols:
            col = t[c]
            if not pa.types.is_string(col.type):
                col = pc.cast(col, pa.string())
            parts.append(pc.coalesce(col, ""))
        joined = parts[0] if len(parts) == 1 else \
            pc.binary_join_element_wise(*parts, "|")
        s = np.asarray(joined.to_pylist(), dtype=object)
        h = sum(int(hashlib.md5(x.encode("utf-8")).hexdigest()[:15], 16)
                % mod for x in s) % mod
        return pa.table({"n_rows": pa.array([len(t)], pa.int64()),
                         "checksum": pa.array([h], pa.int64())})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_rows": [int(df["n_rows"].sum())],
            "checksum": [int(df["checksum"].sum()) % mod]})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .repartition(1).map_batches(fold, batch_format="pandas"))


OPEN_SENTINEL = 1 << 62          # valid_to of a current (open) version


def scd2_apply(history: "ray.data.Dataset", updates: "ray.data.Dataset",
               keys: "list[str]", ts_col: str,
               valid_from: str = "valid_from", valid_to: str = "valid_to",
               num_buckets: int = 64) -> "ray.data.Dataset":
    """SCD-type-2 MERGE: apply timestamped update rows to a versioned
    history table. Closed history rows pass through; each key's open row
    closes at its first update's timestamp; the updates become
    consecutive versions ``[ts_i, ts_{i+1})`` with the last one open
    (``valid_to = OPEN_SENTINEL``). History columns =
    keys + attrs + valid_from + valid_to; updates = keys + attrs +
    ``ts_col``. One tagged-union key-bucketed reduce, vectorized per
    bucket (lexsort + shift — no per-key Python); deterministic ties via
    a stable all-column sort."""
    hist_cols = list(history.schema().names)
    attrs = [c for c in hist_cols
             if c not in keys + [valid_from, valid_to]]
    if list(updates.schema().names) != keys + attrs + [ts_col] and \
            sorted(updates.schema().names) != sorted(keys + attrs
                                                     + [ts_col]):
        raise ValueError(
            f"updates must carry {keys + attrs + [ts_col]}, got "
            f"{list(updates.schema().names)}")

    def tag_hist(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in keys + attrs}
        cols[valid_from] = pa.compute.cast(t[valid_from], pa.int64())
        cols[valid_to] = pa.compute.cast(t[valid_to], pa.int64())
        cols[_SRC] = pa.array([0] * len(t), pa.int8())
        return pa.table(cols)

    def tag_upd(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in keys + attrs}
        cols[valid_from] = pa.compute.cast(t[ts_col], pa.int64())
        cols[valid_to] = pa.array([OPEN_SENTINEL] * len(t), pa.int64())
        cols[_SRC] = pa.array([1] * len(t), pa.int8())
        return pa.table(cols)

    u = (history.map_batches(tag_hist, batch_format="pyarrow")
         .union(updates.map_batches(tag_upd, batch_format="pyarrow")))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        other = [c for c in df.columns
                 if c not in keys + [valid_from, valid_to, _SRC]]
        df = df.sort_values(keys + [_SRC, valid_from] + other,
                            kind="mergesort").reset_index(drop=True)
        import numpy as np
        k = df[keys].astype(str).agg("|".join, axis=1).to_numpy() \
            if len(keys) > 1 else df[keys[0]].to_numpy()
        src = df[_SRC].to_numpy()
        vf = df[valid_from].to_numpy(dtype=np.int64)
        vt = df[valid_to].to_numpy(dtype=np.int64).copy()
        n = len(df)
        if n:
            same_next = np.empty(n, dtype=bool)
            same_next[:-1] = k[:-1] == k[1:]
            same_next[-1] = False
            # a version (open history row or update) closes at the next
            # version's valid_from within its key
            nxt_vf = np.empty(n, dtype=np.int64)
            nxt_vf[:-1] = vf[1:]
            nxt_vf[-1] = OPEN_SENTINEL
            open_row = vt == OPEN_SENTINEL
            closes = same_next & open_row
            vt = np.where(closes, nxt_vf, vt)
        out = df.drop(columns=[_SRC]).copy()
        out[valid_to] = vt
        return out

    return bucketed_group_reduce(u, keys, merge, num_buckets)

"""Shared distributed-reduction utilities.

``bucketed_group_reduce`` is the workhorse pattern for keyed merges at high
key cardinality. Ray Data's ``groupby(key).map_groups(fn)`` invokes the
Python UDF once *per group* — at millions of tiny groups the interpreter
overhead dominates (observed: 197k relation_id groups → 200s). Instead we
hash-partition rows into a bounded number of coarse buckets
(``groupby(bucket)``), and run ONE vectorized pandas reduction per bucket
that handles all its keys at once. Same shuffle volume, ~1000x fewer UDF
invocations, and per-task memory bounded by |data| / num_buckets.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import pandas as pd
import pyarrow as pa

BUCKET_COL = "__bucket"


def _add_bucket(keys: List[str], num_buckets: int):
    def add(t: pa.Table) -> pa.Table:
        # deterministic across processes (fixed pandas hash key); hash only
        # the key columns, keep the block itself zero-copy Arrow (pandas
        # object-dtype list columns defeat Ray's block size estimator)
        h = pd.util.hash_pandas_object(
            t.select(keys).to_pandas(), index=False).to_numpy()
        return t.append_column(
            BUCKET_COL, pa.array((h % num_buckets).astype("int32")))
    return add


def bucketed_group_reduce(ds: "ray.data.Dataset", keys: List[str],
                          reduce_df: Callable[[pd.DataFrame], pd.DataFrame],
                          num_buckets: int = 64,
                          schema: Optional[pa.Schema] = None,
                          ) -> "ray.data.Dataset":
    """Hash-partition by ``keys`` into ``num_buckets`` coarse buckets and
    apply ``reduce_df`` (a vectorized whole-bucket pandas function that must
    itself group by ``keys``) once per bucket.

    ``num_buckets`` bounds per-task memory: pick ~ |dataset| / (256MB).
    When ``schema`` is given, each bucket's result is emitted as an Arrow
    table with that schema (exact block sizing, typed list columns).
    """
    def per_bucket(g: pd.DataFrame):
        out = reduce_df(g.drop(columns=[BUCKET_COL]))
        if schema is not None:
            if len(out) == 0:
                # empty frames carry NaN-float dtypes that can't cast to
                # list/typed columns — emit the typed empty table directly
                return schema.empty_table()
            return pa.Table.from_pandas(
                out, schema=schema,
                preserve_index=False).replace_schema_metadata(None)
        return out

    return (ds.map_batches(_add_bucket(keys, num_buckets),
                           batch_format="pyarrow")
            .groupby(BUCKET_COL)
            .map_groups(per_bucket, batch_format="pandas"))


def keyed_sum(ds: "ray.data.Dataset", keys: List[str],
              sum_cols: "dict[str, str]",
              key_schema: Optional[List[pa.Field]] = None,
              num_buckets: int = 64) -> "ray.data.Dataset":
    """Vectorized distributed SUM of ``sum_cols`` (in-name → out-name) per
    distinct ``keys`` tuple. Drop-in for the native
    ``groupby(keys).aggregate(Sum...)`` which does Python-level per-row
    partial merges (~15 us/row): the pandas path is ~50x faster at
    >10^4 distinct keys for the same one-shuffle plan."""
    in_cols = list(sum_cols)

    def sum_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: the native Aggregate this replaces keeps a
        # null-key group; pandas' default would silently drop those rows
        out = df.groupby(keys, as_index=False, sort=False,
                         dropna=False)[in_cols].sum()
        # groupby surfaces the NA group's key as float NaN — restore
        # object dtype + None for string-ish keys so the Arrow block
        # carries a proper null instead of a type-changing NaN
        for k in keys:
            if df[k].dtype == object and (out[k].dtype != object
                                          or out[k].isna().any()):
                out[k] = out[k].astype(object).where(out[k].notna(), None)
        return out.rename(columns=sum_cols)

    schema = None
    if key_schema is not None:
        def _sum_type(col: str) -> pa.DataType:
            try:
                t = arrow_col_type(ds, col)
            except Exception:
                return pa.int64()
            return pa.float64() if pa.types.is_floating(t) else pa.int64()
        schema = pa.schema(list(key_schema) +
                           [pa.field(v, _sum_type(c)) for c, v in
                            sum_cols.items()])
    return bucketed_group_reduce(ds, keys, sum_bucket, num_buckets,
                                 schema=schema)


def distinct_on(ds: "ray.data.Dataset", keys: List[str],
                num_buckets: int = 64) -> "ray.data.Dataset":
    """Keep the first row per distinct key tuple (vectorized per bucket)."""
    def reduce_df(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(keys, keep="first")
    return bucketed_group_reduce(ds, keys, reduce_df, num_buckets)


def arrow_col_type(ds: "ray.data.Dataset", col: str) -> pa.DataType:
    """Arrow type of a Dataset column. ``Dataset.schema().types`` can hold
    plain Python classes (e.g. ``str``) for simple-block datasets — fall
    back to the underlying Arrow schema, then to a Python-type map."""
    sch = ds.schema()
    t = dict(zip(sch.names, sch.types))[col]
    if isinstance(t, pa.DataType):
        return t
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base.field(col).type
    return {str: pa.string(), int: pa.int64(),
            float: pa.float64(), bool: pa.bool_()}.get(t, pa.string())

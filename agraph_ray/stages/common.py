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

from typing import Callable, List

import pandas as pd

BUCKET_COL = "__bucket"


def _add_bucket(keys: List[str], num_buckets: int):
    def add(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        # deterministic across processes (fixed pandas hash key)
        h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
        df[BUCKET_COL] = (h % num_buckets).astype("int32")
        return df
    return add


def bucketed_group_reduce(ds: "ray.data.Dataset", keys: List[str],
                          reduce_df: Callable[[pd.DataFrame], pd.DataFrame],
                          num_buckets: int = 64) -> "ray.data.Dataset":
    """Hash-partition by ``keys`` into ``num_buckets`` coarse buckets and
    apply ``reduce_df`` (a vectorized whole-bucket pandas function that must
    itself group by ``keys``) once per bucket.

    ``num_buckets`` bounds per-task memory: pick ~ |dataset| / (256MB).
    """
    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return reduce_df(g.drop(columns=[BUCKET_COL]))

    return (ds.map_batches(_add_bucket(keys, num_buckets),
                           batch_format="pandas")
            .groupby(BUCKET_COL)
            .map_groups(per_bucket, batch_format="pandas"))


def distinct_on(ds: "ray.data.Dataset", keys: List[str],
                num_buckets: int = 64) -> "ray.data.Dataset":
    """Keep the first row per distinct key tuple (vectorized per bucket)."""
    def reduce_df(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(keys, keep="first")
    return bucketed_group_reduce(ds, keys, reduce_df, num_buckets)

"""Distributed statistics operators.

Exact per-group quantiles by co-grouped sort: hash-partition on the group
key (same co-location assumption as ``cogroup_join`` — one group's rows
must fit a bucket; at corpus scale use a sketch for corpus-wide
percentiles), then one vectorized sort + rank-index pick per bucket.

The rank rule is pinned so a SQL oracle can reproduce it bit-for-bit:
``index = floor(q * (n - 1) + 0.5)`` into the ascending-sorted values
(nearest-rank, half-up on the (n-1) scale) — no interpolation, result is
always an element of the input.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.common import bucketed_group_reduce


def _key_hash32(vals) -> np.ndarray:
    """Deterministic 32-bit hash of each value's string form — the first
    8 hex digits of md5(str(v)), matching DuckDB
    ``('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 8))::UBIGINT`` exactly
    (pinned by the sampling oracles)."""
    import hashlib
    return np.fromiter(
        (int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
         for v in vals),
        dtype=np.uint64, count=len(vals))


def hash_sample(ds: "ray.data.Dataset", key: str,
                fraction: float) -> "ray.data.Dataset":
    """Deterministic Bernoulli sample: keep rows whose key-hash bucket
    (mod 1e6) falls below ``fraction``. Same key → same decision on any
    worker, any run, any engine — resumable and oracle-reproducible,
    unlike ``Dataset.random_sample``. Pure map-side filter, no shuffle."""
    cut = int(round(fraction * 1_000_000))

    def f(t: pa.Table) -> pa.Table:
        h = _key_hash32(t[key].to_pylist()) % np.uint64(1_000_000)
        return t.filter(pa.array(h < cut))

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_sample(ds: "ray.data.Dataset", group_col: str, key: str,
                      n_per_group: int,
                      num_buckets: int = 64) -> "ray.data.Dataset":
    """Deterministic n-per-group sample: within each group keep the n
    rows with the smallest (key-hash, key) rank — a uniform-ish,
    run-stable stratum sample (the classic "cap each language/quality
    bucket" training-data op). One bucketed shuffle on the group key."""
    def reduce_df(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(__h=_key_hash32(df[key].tolist()))
        df = df.sort_values(["__h", key], kind="stable")
        return (df.groupby(group_col, sort=False).head(n_per_group)
                .drop(columns="__h"))

    schema = pa.schema(list(zip(ds.schema().names, ds.schema().types)))
    return bucketed_group_reduce(ds, [group_col], reduce_df, num_buckets,
                                 schema=schema)


def pivot_counts(ds: "ray.data.Dataset", key: str, pivot_col: str,
                 categories: Sequence[str],
                 value_col: Optional[str] = None) -> "ray.data.Dataset":
    """Wide per-key aggregate: one ``n_<cat>`` count column (and, with
    ``value_col``, one ``sum_<cat>`` column) per category — the SQL
    ``count(*) FILTER (WHERE ...)`` pivot. Per-batch partial pivot first
    (each batch collapses to <= |keys-in-batch| rows), so the shuffle
    carries pre-aggregated wide rows, never events; unknown categories
    are dropped (the caller pins the category set)."""
    from ray.data.aggregate import Sum

    cats = list(categories)
    ncols = [f"n_{c}" for c in cats]
    scols = [f"sum_{c}" for c in cats] if value_col else []

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cnt = (df.pivot_table(index=key, columns=pivot_col, aggfunc="size",
                              fill_value=0)
               .reindex(columns=cats, fill_value=0))
        cnt.columns = ncols
        out = cnt
        if value_col:
            sm = (df.pivot_table(index=key, columns=pivot_col,
                                 values=value_col, aggfunc="sum",
                                 fill_value=0.0)
                  .reindex(columns=cats, fill_value=0.0))
            sm.columns = scols
            out = pd.concat([cnt, sm.astype("float64")], axis=1)
        return out.reset_index()

    cols = [key, pivot_col] + ([value_col] if value_col else [])
    aggs = ([Sum(c, alias_name=c) for c in ncols]
            + [Sum(c, alias_name=c) for c in scols])
    return (ds.select_columns(cols)
            .map_batches(partial, batch_format="pandas")
            .groupby(key)
            .aggregate(*aggs))


def grouped_quantiles(ds: "ray.data.Dataset", key: str, value_col: str,
                      qs: Sequence[float] = (0.25, 0.5, 0.75),
                      num_buckets: int = 64) -> "ray.data.Dataset":
    """→ one row per group: key, q<pct> per requested quantile, n."""
    qcols = [f"q{int(round(q * 100)):02d}" for q in qs]

    def reduce_df(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: [], **{c: [] for c in qcols},
                                 "n": []})
        df = df.sort_values([key, value_col], kind="stable")
        v = df[value_col].to_numpy()
        k = df[key].to_numpy()
        new = np.empty(len(df), dtype=bool)
        new[0] = True
        new[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        ns = np.diff(np.append(starts, len(df)))
        out = {key: k[starts]}
        for q, c in zip(qs, qcols):
            idx = starts + np.floor(q * (ns - 1) + 0.5).astype(np.int64)
            out[c] = v[idx]
        out["n"] = ns
        return pd.DataFrame(out)

    ktype = dict(zip(ds.schema().names, ds.schema().types))[key]
    vtype = dict(zip(ds.schema().names, ds.schema().types))[value_col]
    schema = pa.schema([(key, ktype)] + [(c, vtype) for c in qcols]
                       + [("n", pa.int64())])
    return bucketed_group_reduce(ds.select_columns([key, value_col]),
                                 [key], reduce_df, num_buckets,
                                 schema=schema)

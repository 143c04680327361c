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

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.common import bucketed_group_reduce


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

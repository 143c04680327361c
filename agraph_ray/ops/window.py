"""Event-time windowing / sessionization over keyed streams.

Streaming-shaped operators the reference lacks but a transcript/event
engine needs: tumbling windows (pure per-batch key derivation + groupby)
and gap-based sessionization (per-key ordered scan). Both are deterministic
over unordered input — ordering is restored inside the keyed reduction,
never globally.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.common import bucketed_group_reduce


def _ts_us(arr: "pa.ChunkedArray") -> "pa.ChunkedArray":
    """Epoch microseconds regardless of the column's timestamp unit
    (parquet is typically us, ``from_items`` infers s)."""
    if pa.types.is_timestamp(arr.type) and arr.type.unit != "us":
        arr = pc.cast(arr, pa.timestamp("us", tz=arr.type.tz))
    return pc.cast(arr, pa.int64())


def _window_count_sum(windowed: "ray.data.Dataset", key: str,
                      agg_col: str) -> "ray.data.Dataset":
    """(key, window_start) → n + sum(agg_col) via the vectorized bucketed
    reduce — (key × window) cardinality scales with users × time, where
    the native Aggregate's Python per-row partial merges dominate."""
    from ..stages.common import arrow_col_type

    sum_name = f"sum_{agg_col}"

    def red(df: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: keep the null-key group (native Aggregate parity)
        return (df.groupby([key, "window_start"], as_index=False,
                           dropna=False)
                .agg(n=(agg_col, "size"), **{sum_name: (agg_col, "sum")}))

    key_t = arrow_col_type(windowed, key)
    val_t = arrow_col_type(windowed, agg_col)
    sum_t = pa.int64() if pa.types.is_integer(val_t) else pa.float64()
    return bucketed_group_reduce(
        windowed.select_columns([key, "window_start", agg_col]),
        [key, "window_start"], red,
        schema=pa.schema([(key, key_t), ("window_start", pa.int64()),
                          ("n", pa.int64()), (sum_name, sum_t)]))


def tumbling_window(ds: "ray.data.Dataset", key: str, ts_col: str,
                    width_sec: int, agg_col: str) -> "ray.data.Dataset":
    """(key, window_start) count + sum over ``agg_col``. The window id is a
    pure per-batch projection; the only shuffle is the final keyed
    reduce."""
    us = width_sec * 1_000_000

    def add_win(t: pa.Table) -> pa.Table:
        micros = _ts_us(t[ts_col])
        win = pc.multiply(pc.divide(micros, us), us)
        return t.append_column("window_start", pc.cast(win, pa.int64()))

    return _window_count_sum(
        ds.map_batches(add_win, batch_format="pyarrow"), key, agg_col)


def hopping_window(ds: "ray.data.Dataset", key: str, ts_col: str,
                   width_sec: int, hop_sec: int,
                   agg_col: str) -> "ray.data.Dataset":
    """Overlapping (hopping/sliding) windows: every event lands in
    ``width/hop`` windows. The expansion is a vectorized per-batch
    repeat (shuffle volume scales with the overlap factor — the inherent
    cost of hopping windows, stated rather than hidden); the only
    shuffle is the final keyed reduce. ``width_sec`` must be a multiple
    of ``hop_sec``."""
    if width_sec % hop_sec:
        raise ValueError("width_sec must be a multiple of hop_sec")
    w_us, h_us = width_sec * 1_000_000, hop_sec * 1_000_000
    k = width_sec // hop_sec            # windows per event

    def expand(t: pa.Table) -> pa.Table:
        n = len(t)
        micros = _ts_us(t[ts_col]).to_numpy(zero_copy_only=False)
        # latest window containing ts starts at floor(ts/hop)*hop; the
        # k hop-aligned starts before it also contain ts (clip below 0)
        last = (micros // h_us) * h_us
        starts = last[:, None] - np.arange(k, dtype=np.int64)[None, :] * h_us
        keep = (starts >= 0) & (micros[:, None] < starts + w_us)
        idx = np.repeat(np.arange(n, dtype=np.int64), keep.sum(axis=1))
        t = t.take(pa.array(idx))
        return t.append_column("window_start",
                               pa.array(starts[keep], pa.int64()))

    return _window_count_sum(
        ds.map_batches(expand, batch_format="pyarrow"), key, agg_col)


def rolling_range_agg(ds: "ray.data.Dataset", key: str, ts_col: str,
                      value_col: str, range_sec: int, id_col: str,
                      num_buckets: int = 64) -> "ray.data.Dataset":
    """Per-event trailing aggregate: for each row, count and sum of
    ``value_col`` over the same key's rows with timestamp in
    ``[ts - range_sec, ts]`` — SQL ``RANGE BETWEEN x PRECEDING AND
    CURRENT ROW`` semantics exactly (timestamp peers are included on both
    ends). One hash shuffle on the key; per bucket a single sort +
    prefix-sum + two ``searchsorted`` calls handle every key at once
    (segments isolated by a per-segment offset, with a per-segment
    fallback loop only when the offset would overflow int64)."""
    r_us = range_sec * 1_000_000

    schema = pa.schema([(id_col, pa.int64()), (key, pa.int64()),
                        ("ts_us", pa.int64()), ("roll_n", pa.int64()),
                        ("roll_sum", pa.float64())])

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t[id_col], key: t[key],
                         "ts_us": _ts_us(t[ts_col]),
                         "v": pc.cast(t[value_col], pa.float64())})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, "ts_us", id_col], kind="mergesort")
        n = len(df)
        k = df[key].to_numpy()
        ts = df["ts_us"].to_numpy(dtype=np.int64)
        v = df["v"].to_numpy(dtype=np.float64)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        seg = np.cumsum(new) - 1                    # segment ordinal per row
        csum = np.concatenate(([0.0], np.cumsum(v)))
        ts0 = ts - ts.min()
        big = np.int64(ts0.max()) + r_us + 1        # > any in-segment span
        if int(len(starts)) * int(big) < (1 << 62):
            adj = ts0 + seg * big                   # monotone, segment-local
            lo = np.searchsorted(adj, adj - r_us, side="left")
            hi = np.searchsorted(adj, adj, side="right")
        else:                                       # rare: huge ts span
            lo = np.empty(n, dtype=np.int64)
            hi = np.empty(n, dtype=np.int64)
            ends = np.append(starts[1:], n)
            for s, e in zip(starts, ends):
                lo[s:e] = s + np.searchsorted(ts[s:e], ts[s:e] - r_us, "left")
                hi[s:e] = s + np.searchsorted(ts[s:e], ts[s:e], "right")
        return pd.DataFrame({id_col: df[id_col].to_numpy(), key: k,
                             "ts_us": ts, "roll_n": hi - lo,
                             "roll_sum": csum[hi] - csum[lo]})

    evs = ds.select_columns([id_col, key, ts_col, value_col]).map_batches(
        to_us, batch_format="pyarrow")
    return bucketed_group_reduce(evs, [key], per_bucket, num_buckets,
                                 schema=schema)


def lag_delta(ds: "ray.data.Dataset", key: str, ts_col: str, id_col: str,
              num_buckets: int = 64) -> "ray.data.Dataset":
    """Per-event microseconds since the key's previous event (ordered by
    timestamp, ties broken by ``id_col``); -1 for each key's first event —
    SQL ``LAG`` with ``COALESCE(..., -1)``. One hash shuffle, one
    vectorized sort + diff per bucket."""
    schema = pa.schema([(id_col, pa.int64()), (key, pa.int64()),
                        ("ts_us", pa.int64()), ("delta_us", pa.int64())])

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t[id_col], key: t[key],
                         "ts_us": _ts_us(t[ts_col])})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, "ts_us", id_col], kind="mergesort")
        n = len(df)
        k = df[key].to_numpy()
        ts = df["ts_us"].to_numpy(dtype=np.int64)
        delta = np.empty(n, dtype=np.int64)
        delta[0] = -1
        delta[1:] = np.where(k[1:] == k[:-1], ts[1:] - ts[:-1], -1)
        return pd.DataFrame({id_col: df[id_col].to_numpy(), key: k,
                             "ts_us": ts, "delta_us": delta})

    evs = ds.select_columns([id_col, key, ts_col]).map_batches(
        to_us, batch_format="pyarrow")
    return bucketed_group_reduce(evs, [key], per_bucket, num_buckets,
                                 schema=schema)


def running_agg(ds: "ray.data.Dataset", key: str, ts_col: str, id_col: str,
                value_col: str, num_buckets: int = 64) -> "ray.data.Dataset":
    """Per-event running aggregates over the key's full history ordered by
    (timestamp, ``id_col``): 1-based row number and running min/max of
    ``value_col`` — SQL ``ROW_NUMBER() / MIN() / MAX() OVER (PARTITION BY
    key ORDER BY ts, id)``. Min/max are order-exact (no float accumulation
    drift, unlike a running SUM). One hash shuffle on the key; per bucket
    one sort + cython grouped cumcount/cummin/cummax over every key at
    once."""
    schema = pa.schema([(id_col, pa.int64()), (key, pa.int64()),
                        ("ts_us", pa.int64()), ("row_num", pa.int64()),
                        ("run_min", pa.float64()),
                        ("run_max", pa.float64())])

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t[id_col], key: t[key],
                         "ts_us": _ts_us(t[ts_col]),
                         "v": pc.cast(t[value_col], pa.float64())})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, "ts_us", id_col], kind="mergesort")
        g = df.groupby(key, sort=False)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(), key: df[key].to_numpy(),
            "ts_us": df["ts_us"].to_numpy(),
            "row_num": (g.cumcount() + 1).to_numpy(),
            "run_min": g["v"].cummin().to_numpy(),
            "run_max": g["v"].cummax().to_numpy()})

    evs = ds.select_columns([id_col, key, ts_col, value_col]).map_batches(
        to_us, batch_format="pyarrow")
    return bucketed_group_reduce(evs, [key], per_bucket, num_buckets,
                                 schema=schema)


def ranked_agg(ds: "ray.data.Dataset", key: str, value_col: str,
               id_col: str, ntiles: int = 4,
               num_buckets: int = 64) -> "ray.data.Dataset":
    """Per-row ranking functions over each key's partition ordered by
    ``value_col`` — SQL ``RANK() / DENSE_RANK() / PERCENT_RANK() /
    CUME_DIST() OVER (PARTITION BY key ORDER BY v)`` plus
    ``NTILE(ntiles)`` ordered by ``(v, id)`` (ties broken so the tile
    assignment is deterministic; the rank family keeps SQL tie
    semantics). One hash shuffle on the key; per bucket one mergesort +
    cython grouped ranks over every key at once.

    ``percent_rank``/``cume_dist`` are exact double divisions of the same
    integers DuckDB divides, so they hash-match bit-for-bit."""
    schema = pa.schema([(id_col, pa.int64()), (key, pa.int64()),
                        ("v", pa.int64()), ("rnk", pa.int64()),
                        ("dense_rnk", pa.int64()),
                        ("pct_rank", pa.float64()),
                        ("cume_dist", pa.float64()),
                        ("tile", pa.int64())])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t[id_col], key: t[key],
                         "v": pc.cast(t[value_col], pa.int64())})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, "v", id_col], kind="mergesort")
        g = df.groupby(key, sort=False)
        n = g[key].transform("size").to_numpy(dtype=np.int64)
        rnk = g["v"].rank(method="min").to_numpy().astype(np.int64)
        dense = g["v"].rank(method="dense").to_numpy().astype(np.int64)
        rmax = g["v"].rank(method="max").to_numpy().astype(np.int64)
        pct = np.where(n > 1, (rnk - 1) / np.maximum(n - 1, 1), 0.0)
        cume = rmax / n
        # NTILE over 0-based in-partition position `pos`: the first
        # (n % b) tiles get (n // b + 1) rows, the rest n // b.
        pos = g.cumcount().to_numpy(dtype=np.int64)
        b = ntiles
        q, r = n // b, n % b
        big_span = r * (q + 1)
        tile = np.where(
            pos < big_span,
            pos // np.maximum(q + 1, 1) + 1,
            r + (pos - big_span) // np.maximum(q, 1) + 1)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(), key: df[key].to_numpy(),
            "v": df["v"].to_numpy(), "rnk": rnk, "dense_rnk": dense,
            "pct_rank": pct, "cume_dist": cume, "tile": tile})

    evs = ds.select_columns([id_col, key, value_col]).map_batches(
        prep, batch_format="pyarrow")
    return bucketed_group_reduce(evs, [key], per_bucket, num_buckets,
                                 schema=schema)


SESSION_SCHEMA_COLS = ["user_id", "session_id", "n_events", "session_start",
                       "session_end", "duration_sec"]


def sessionize(ds: "ray.data.Dataset", key: str, ts_col: str,
               gap_sec: int, num_buckets: int = 64) -> "ray.data.Dataset":
    """Gap-based sessions: events of one key sorted by time; a gap greater
    than ``gap_sec`` starts a new session. One vectorized pandas pass per
    bucket (sort + diff + cumsum — no per-event Python).

    Output: (user_id, session_id, n_events, session_start, session_end,
    duration_sec), session_id 0-based per key in time order.
    """
    gap_us = gap_sec * 1_000_000

    schema = pa.schema([
        (key, pa.int64()), ("session_id", pa.int64()),
        ("n_events", pa.int64()), ("session_start", pa.int64()),
        ("session_end", pa.int64()), ("duration_sec", pa.float64()),
    ])

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({key: t[key], "ts_us": _ts_us(t[ts_col])})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, "ts_us"], kind="mergesort")
        new_key = df[key] != df[key].shift()
        gap = df["ts_us"].diff() > gap_us
        sess_break = (new_key | gap)
        sess_global = sess_break.cumsum()          # global session ordinal
        g = df.groupby(sess_global, sort=False)
        out = pd.DataFrame({
            key: g[key].first(),
            "n_events": g.size(),
            "session_start": g["ts_us"].min(),
            "session_end": g["ts_us"].max(),
        })
        out["session_id"] = out.groupby(key, sort=False).cumcount()
        out["duration_sec"] = (out["session_end"]
                               - out["session_start"]) / 1e6
        return out[[key, "session_id", "n_events", "session_start",
                    "session_end", "duration_sec"]]

    evs = ds.select_columns([key, ts_col]).map_batches(
        to_us, batch_format="pyarrow")
    return bucketed_group_reduce(evs, [key], per_bucket, num_buckets,
                                 schema=schema)


def window_dedup(ds: "ray.data.Dataset", keys: List[str], ts_col: str,
                 width_sec: int, tie_col: str,
                 num_buckets: int = 64) -> "ray.data.Dataset":
    """Keep the earliest row per (keys, tumbling window) — event-stream
    dedup ("one signup event per user per hour"; near-identical article
    re-crawls within a window). Deterministic: ties on the timestamp
    break by ``tie_col``. One bucketed shuffle on (keys, window); the
    per-bucket body is a vectorized lexsort + drop_duplicates."""
    us = width_sec * 1_000_000

    def add_win(t: pa.Table) -> pa.Table:
        micros = _ts_us(t[ts_col])
        win = pc.multiply(pc.divide(micros, us), us)
        t = t.append_column("window_start", pc.cast(win, pa.int64()))
        return t.append_column("__ts_us", pc.cast(micros, pa.int64()))

    group = keys + ["window_start"]

    def reduce_df(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["__ts_us", tie_col], kind="stable")
        return df.drop_duplicates(group, keep="first").drop(
            columns="__ts_us")

    from ..stages.common import arrow_col_type
    names = ds.schema().names
    schema = pa.schema([(n, arrow_col_type(ds, n)) for n in names]
                       + [("window_start", pa.int64())])
    return bucketed_group_reduce(
        ds.map_batches(add_win, batch_format="pyarrow"),
        group, reduce_df, num_buckets, schema=schema)


def funnel_depths(ds: "ray.data.Dataset", key: str, ts_col: str,
                  type_col: str, stages: List[str],
                  num_buckets: int = 64) -> "ray.data.Dataset":
    """Ordered-funnel analysis: for each key (user), how deep into
    ``stages`` it progressed, where stage i+1 must occur STRICTLY after
    the first qualifying stage-i event → ``(key, depth,
    stage{i}_us ...)`` with −1 for unreached stages.

    One bucketed shuffle on the key; the per-bucket body is a chain of
    vectorized groupby-min + merge refinements (one per stage), no
    per-user Python. Only (key, ts, type∈stages) rows enter the shuffle."""
    from ..stages.common import arrow_col_type

    stage_set = set(stages)

    def prep(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t[type_col],
                        value_set=pa.array(sorted(stage_set)))
        t = t.filter(mask)
        return pa.table({key: t[key],
                         "__ts": _ts_us(t[ts_col]),
                         type_col: t[type_col]})

    cols = [f"stage{i}_us" for i in range(len(stages))]
    schema = pa.schema([(key, arrow_col_type(ds, key)),
                        ("depth", pa.int64())]
                       + [(c, pa.int64()) for c in cols])

    def reduce_df(df: pd.DataFrame) -> pd.DataFrame:
        users = pd.DataFrame({key: df[key].unique()})
        reached = None      # Series: key -> first-ts of previous stage
        out = users.set_index(key)
        out["depth"] = 0
        for i, st in enumerate(stages):
            ev = df[df[type_col] == st][[key, "__ts"]]
            if reached is not None:
                prev = reached.reset_index()
                prev.columns = [key, "prev"]
                ev = ev.merge(prev, on=key)
                ev = ev[ev["__ts"] > ev["prev"]]
            first = ev.groupby(key)["__ts"].min()
            out[cols[i]] = first.reindex(out.index, fill_value=-1)
            out.loc[first.index, "depth"] = i + 1
            reached = first
            if len(first) == 0:
                for j in range(i + 1, len(stages)):
                    out[cols[j]] = -1
                break
        out = out.reset_index()
        for c in ["depth"] + cols:
            out[c] = out[c].astype("int64")
        return out[[key, "depth"] + cols]

    return bucketed_group_reduce(
        ds.map_batches(prep, batch_format="pyarrow"),
        [key], reduce_df, num_buckets, schema=schema)


def dense_time_series(ds: "ray.data.Dataset", key: str, ts_col: str,
                      width_sec: int, agg_col: Optional[str] = None,
                      num_buckets: int = 64) -> "ray.data.Dataset":
    """Resample each key's events onto a dense fixed-width time grid —
    one row per (key, window) for EVERY window between the key's first
    and last event, gaps zero-filled: ``(key, w, n[, sum_v])`` with ``w``
    the window index (epoch_us // width).

    Per-batch combiner collapses events to (key, w, partial n/sum) rows,
    one bucketed reduce merges them and expands each key's [min_w, max_w]
    range vectorized (``np.arange`` + searchsorted scatter). Co-location
    contract: one key's *timeline* (span / width windows) must fit a
    bucket task — at 100 TB pick ``width_sec`` so span/width stays
    ~1e6-ish per key, or shard the key by coarse epoch first."""
    us = width_sec * 1_000_000
    vals = ["n"] + (["sum_v"] if agg_col else [])

    def partial(t: pa.Table) -> pa.Table:
        w = pc.cast(pc.divide(_ts_us(t[ts_col]), us), pa.int64())
        d = {key: t[key].to_pandas(), "w": w.to_pandas(), "n": 1}
        if agg_col:
            d["sum_v"] = pc.cast(t[agg_col], pa.float64()).to_numpy(
                zero_copy_only=False)
        df = pd.DataFrame(d)
        return pa.Table.from_pandas(
            df.groupby([key, "w"], as_index=False, sort=False).sum(),
            preserve_index=False)

    def reduce_df(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(columns=[key, "w"] + vals)
        g = (df.groupby([key, "w"], as_index=False, sort=False)[vals]
             .sum().sort_values([key, "w"], kind="stable"))
        ki, keys_u = pd.factorize(g[key])        # key order of first seen
        w = g["w"].to_numpy(dtype=np.int64)
        lo = np.minimum.reduceat(w, np.flatnonzero(
            np.r_[True, ki[1:] != ki[:-1]]))
        hi = np.maximum.reduceat(w, np.flatnonzero(
            np.r_[True, ki[1:] != ki[:-1]]))
        span = hi - lo + 1
        off = np.concatenate([[0], np.cumsum(span[:-1])]).astype(np.int64)
        total = int(span.sum())
        # dense grid: per key block, lo[k] + arange(span[k]) — built with
        # one global arange minus repeated block offsets (no Python loop)
        within = np.arange(total, dtype=np.int64) - np.repeat(off, span)
        out = {key: np.asarray(keys_u, dtype=object)[
                   np.repeat(np.arange(len(keys_u)), span)],
               "w": np.repeat(lo, span) + within}
        pos = off[ki] + (w - lo[ki])             # scatter positions
        for c in vals:
            col = np.zeros(total,
                           dtype=np.int64 if c == "n" else np.float64)
            col[pos] = g[c].to_numpy()
            out[c] = col
        return pd.DataFrame(out)

    from ..stages.common import arrow_col_type
    schema = pa.schema([(key, arrow_col_type(ds, key)),
                        ("w", pa.int64()), ("n", pa.int64())]
                       + ([("sum_v", pa.float64())] if agg_col else []))
    cols = [key, ts_col] + ([agg_col] if agg_col else [])
    return bucketed_group_reduce(
        ds.select_columns(cols).map_batches(partial, batch_format="pyarrow"),
        [key], reduce_df, num_buckets, schema=schema)


def grouped_ewma(ds: "ray.data.Dataset", key: str, ts_col: str,
                 value_col: str, alpha: float = 0.3,
                 out_col: str = "ewma",
                 num_buckets: int = 64) -> "ray.data.Dataset":
    """Per-key exponentially weighted moving average in event-time order:
    y_0 = x_0, y_i = alpha*x_i + (1-alpha)*y_{i-1} (pandas
    ``ewm(adjust=False)`` semantics; (ts, value) ties ordered by value).
    One key-bucketed reduce; one lexsort per bucket, then pandas' Cython
    ``ewm`` kernel per key segment (the closed-form (1-a)^{i-j} scan is
    NOT used — its inverse powers overflow past ~700 rows per key; the
    sequential kernel is numerically exact at any length). All rows of a
    key co-locate (engine-wide keyed-reduce contract)."""
    from ..stages.common import bucketed_group_reduce, arrow_col_type

    kt = arrow_col_type(ds, key)
    schema = pa.schema([(key, kt), (ts_col, pa.int64()),
                        (value_col, pa.float64()),
                        (out_col, pa.float64())])

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({key: t[key], ts_col: _ts_us(t[ts_col]),
                         value_col: pc.cast(t[value_col], pa.float64())})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({key: df[key], ts_col: df[ts_col],
                                 value_col: df[value_col],
                                 out_col: df[value_col]})
        df = df.sort_values([key, ts_col, value_col], kind="mergesort")
        y = (df.groupby(key, sort=False)[value_col]
             .transform(lambda s: s.ewm(alpha=alpha, adjust=False).mean()))
        out = df.copy()
        out[out_col] = y
        return out

    return bucketed_group_reduce(
        ds.select_columns([key, ts_col, value_col]).map_batches(
            to_us, batch_format="pyarrow"),
        [key], per_bucket, num_buckets, schema=schema)


def cohort_retention(ds: "ray.data.Dataset", key: str, ts_col: str,
                     width_us: int = 7 * 24 * 3600 * 1_000_000,
                     num_buckets: int = 64) -> "ray.data.Dataset":
    """Cohort retention: users bucketed by their FIRST event window
    (cohort), then per (cohort, window) the distinct active users →
    ``(cohort_w, w, n_users)``. The product analytics staple.

    Shuffle shape: one user-keyed reduce finds each user's cohort
    (min-window combiner per batch), one co-group join tags events with
    their user's cohort (both sides large — no broadcast), and one
    distinct-combiner count per (cohort, window). Windows are epoch
    multiples of ``width_us`` (DuckDB-reproducible:
    floor(epoch_us(ts)/width))."""
    from ray.data.aggregate import Min

    from ..stages.common import bucketed_group_reduce
    from .join import cogroup_join

    def windows(t: pa.Table) -> pa.Table:
        us = _ts_us(t[ts_col])
        w = pc.cast(pc.floor(pc.divide(pc.cast(us, pa.float64()),
                                       float(width_us))), pa.int64())
        return pa.table({key: t[key], "w": w})

    ev = ds.select_columns([key, ts_col]).map_batches(
        windows, batch_format="pyarrow")

    def min_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(key, as_index=False, sort=False)["w"].min()

    cohorts = bucketed_group_reduce(
        ev.map_batches(min_partial, batch_format="pandas"), [key],
        min_partial, num_buckets,
        schema=pa.schema([(key, pa.int64()), ("w", pa.int64())])) \
        .map_batches(lambda t: t.rename_columns([key, "cohort_w"]),
                     batch_format="pyarrow")

    tagged = cogroup_join(ev, cohorts, on=[key], how="inner",
                          num_buckets=num_buckets)

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["cohort_w", "w", key])

    def count_users(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["cohort_w", "w", key])
        out = df.groupby(["cohort_w", "w"], as_index=False,
                         sort=False)[key].count()
        return out.rename(columns={key: "n_users"})

    return bucketed_group_reduce(
        tagged.map_batches(distinct_partial, batch_format="pandas"),
        ["cohort_w", "w"], count_users, num_buckets,
        schema=pa.schema([("cohort_w", pa.int64()), ("w", pa.int64()),
                          ("n_users", pa.int64())]))


def event_transitions(ds: "ray.data.Dataset", key: str, ts_col: str,
                      type_col: str, id_col: str,
                      num_buckets: int = 64) -> "ray.data.Dataset":
    """Markov transition counts between consecutive events per key →
    ``(from_type, to_type, cnt)`` (the user-journey / process-mining
    matrix). Event order is (ts, id)-pinned; one key-bucketed reduce
    computes consecutive pairs vectorized (shift within key segments),
    and a per-bucket combiner collapses to distinct (from, to) counts
    before the tiny final sum."""
    from ray.data.aggregate import Sum

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({key: t[key], "ts_us": _ts_us(t[ts_col]),
                         type_col: t[type_col], id_col: t[id_col]})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, "ts_us", id_col], kind="mergesort")
        k = df[key].to_numpy()
        ty = df[type_col].to_numpy(dtype=object)
        same = np.empty(len(df), dtype=bool)
        if len(df):
            same[0] = False
            same[1:] = k[1:] == k[:-1]
        pairs = pd.DataFrame({"from_type": np.roll(ty, 1)[same],
                              "to_type": ty[same]})
        return pairs.groupby(["from_type", "to_type"],
                             as_index=False, sort=False).size() \
            .rename(columns={"size": "cnt"})

    part = bucketed_group_reduce(
        ds.select_columns([key, ts_col, type_col, id_col]).map_batches(
            to_us, batch_format="pyarrow"),
        [key], per_bucket, num_buckets,
        schema=pa.schema([("from_type", pa.string()),
                          ("to_type", pa.string()),
                          ("cnt", pa.int64())]))
    return (part.groupby(["from_type", "to_type"])
            .aggregate(Sum("cnt", alias_name="cnt")))


def linear_attribution(ds: "ray.data.Dataset", key: str, ts_col: str,
                       id_col: str, type_col: str,
                       touch_types: "List[str]",
                       conversion_type: str = "purchase",
                       num_buckets: int = 64) -> "ray.data.Dataset":
    """Linear multi-touch attribution: each conversion's credit splits
    evenly across the key's touch events strictly before it (and after
    the previous conversion — each touch attributes to its NEXT
    conversion only). → ``(event_type, n_touches, credit_micro)`` per
    touch type.

    One key-bucketed reduce: per bucket, (ts, id)-sort, vectorized
    next-conversion assignment (searchsorted into the key's conversion
    positions), per-conversion touch counts, credit = 1/count; only
    per-type partial sums leave the bucket."""
    from ray.data.aggregate import Sum

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({key: t[key], "ts_us": _ts_us(t[ts_col]),
                         id_col: t[id_col], type_col: t[type_col]})

    touch_set = set(touch_types)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, "ts_us", id_col], kind="mergesort")
        k = df[key].to_numpy()
        ty = df[type_col].to_numpy(dtype=object)
        n = len(df)
        if n == 0:
            return pd.DataFrame({"event_type": pd.Series(dtype=object),
                                 "n_touches": pd.Series(dtype="int64"),
                                 "credit": pd.Series(dtype="float64")})
        # segment boundaries per key
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = k[1:] != k[:-1]
        seg = np.cumsum(new) - 1
        pos = np.arange(n)
        is_conv = ty == conversion_type
        # conversions get a global ordinal; a touch's conversion is the
        # first conversion position AFTER it within the same segment
        conv_pos = pos[is_conv]
        conv_seg = seg[is_conv]
        nxt = np.searchsorted(conv_pos, pos, side="left")
        is_touch = np.isin(ty, list(touch_set))
        valid = is_touch & (nxt < len(conv_pos))
        valid[valid] &= conv_seg[nxt[valid]] == seg[valid]
        conv_id = nxt[valid]                       # ordinal of conversion
        tty = ty[valid]
        cnt = np.bincount(conv_id, minlength=len(conv_pos))
        credit = 1.0 / cnt[conv_id]
        out = (pd.DataFrame({"event_type": tty, "credit": credit})
               .groupby("event_type", as_index=False)
               .agg(n_touches=("credit", "size"),
                    credit=("credit", "sum")))
        return out[["event_type", "n_touches", "credit"]]

    part = bucketed_group_reduce(
        ds.select_columns([key, ts_col, id_col, type_col]).map_batches(
            to_us, batch_format="pyarrow"),
        [key], per_bucket, num_buckets,
        schema=pa.schema([("event_type", pa.string()),
                          ("n_touches", pa.int64()),
                          ("credit", pa.float64())]))
    return (part.groupby("event_type")
            .aggregate(Sum("n_touches", alias_name="n_touches"),
                       Sum("credit", alias_name="credit")))


def late_events(ds: "ray.data.Dataset", ts_col: str, seq_col: str,
                lateness_sec: float, out_col: str = "late"
                ) -> "ray.data.Dataset":
    """Watermark-based late-event flagging over an arrival-ordered stream
    (the §2.9 late-data concern made concrete; the batch analogue of a
    streaming watermark, e.g. Akidau et al., "The Dataflow Model",
    VLDB'15). ``seq_col`` (unique — an ingest sequence id) defines
    arrival order; the watermark at each row is the running MAX event
    time over all strictly-earlier arrivals; a row is late when its own
    event time lags that watermark by more than ``lateness_sec``.

    Distributed prefix-max with O(num_blocks) driver state — the same
    sorted-block/summary/broadcast shape as
    :func:`agraph_ray.ops.pack.ordered_prefix_sum`: one sort, one tiny
    per-block summary pass, one flagging pass. The first arrival (empty
    watermark) is never late. Emits ``out_col`` (bool) plus
    ``watermark_us`` (int64; the exclusive running max, min-int64 for
    the first row) so an oracle can compare the full decision basis.
    """
    import ray

    lateness_us = int(round(lateness_sec * 1_000_000))
    sorted_ds = ds.sort(seq_col).materialize()

    def block_summary(t: pa.Table) -> pa.Table:
        k = t[seq_col].slice(0, 1)
        if len(t) == 0:
            m = pa.array([], pa.int64())
        else:
            m = pa.array([pc.max(_ts_us(t[ts_col])).as_py()], pa.int64())
        return pa.table({"k": k, "m": m})

    summaries = sorted(sorted_ds.map_batches(
        block_summary, batch_format="pyarrow",
        batch_size=None).take_all(), key=lambda r: r["k"])
    keys = {r["k"]: i for i, r in enumerate(summaries)}
    if len(keys) != len(summaries):
        # Two blocks share a leading seq value → the dict silently maps
        # both to one base watermark. seq_col uniqueness is a stated
        # contract; fail loudly rather than mis-flag.
        raise ValueError(
            "late_events: seq_col %r has duplicate values straddling a "
            "block boundary; seq values must be unique" % seq_col)
    NEG = np.iinfo(np.int64).min
    maxes = np.array([r["m"] for r in summaries], dtype=np.int64) \
        if summaries else np.empty(0, np.int64)
    # exclusive running max across blocks: base watermark entering block i
    bases = np.concatenate(
        [[NEG], np.maximum.accumulate(maxes)[:-1]]).astype(np.int64) \
        if len(maxes) else np.empty(0, np.int64)
    ref = ray.put((keys, bases))

    def flag(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            t = t.append_column("watermark_us", pa.array([], pa.int64()))
            return t.append_column(out_col, pa.array([], pa.bool_()))
        ks, bs = ray.get(ref)
        base = int(bs[ks[t[seq_col][0].as_py()]])
        us = _ts_us(t[ts_col]).to_numpy(zero_copy_only=False)
        run = np.maximum.accumulate(us)
        wm = np.maximum(
            np.concatenate([[NEG], run[:-1]]), base).astype(np.int64)
        # NEG means "no prior arrival": never late. Additive comparison —
        # the sentinel minus lateness would wrap int64
        late = (wm != NEG) & (us + lateness_us < wm)
        t = t.append_column("watermark_us", pa.array(wm, pa.int64()))
        return t.append_column(out_col, pa.array(late, pa.bool_()))

    return sorted_ds.map_batches(flag, batch_format="pyarrow",
                                 batch_size=None)

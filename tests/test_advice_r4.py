"""Round-4 regression tests for the five ADVICE r3 findings:

1. ``sized_read_parquet``'s block-count cache must key on the resolved
   file list + (size, mtime), not the path alone — checkpoint dirs are
   rewritten in place and grow across incremental runs;
2. ``keyed_sum`` / windowed aggregates must keep the null-key group
   (pandas groupby default dropna=True silently discarded it);
3. ``degree_table``'s type-lookup fallback must go schema-less, not
   guess pa.string() (which crashes every bucket task on int64 ids);
4. ``late_events`` must raise loudly when duplicate seq values straddle
   a block boundary instead of silently applying a wrong watermark;
5. the thread-overlapped extraction branches must share ONE
   materialized repartition of the docs (perf-only; parity is already
   pinned by test_stages' fused==overlap test).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd


def test_sized_read_cache_invalidated_by_rewrite(tmp_path, ray_session):
    from agraph_ray import sources
    from agraph_ray.sources import sized_read_parquet

    p = tmp_path / "ckpt"
    p.mkdir()
    small = pa.table({"x": pa.array(np.arange(1000), pa.int64()),
                      "s": pa.array(["a" * 50] * 1000)})
    pq.write_table(small, p / "part-0.parquet")
    sources._NB_CACHE.clear()
    sized_read_parquet(str(p))
    assert len(sources._NB_CACHE) == 1
    nb1 = next(iter(sources._NB_CACHE.values()))

    # grow the dir in place ~1000x (the incremental add_documents shape)
    strs = [("b%07d" % i) * 50 for i in range(100_000)]  # defeat dict-encode
    big = pa.table({"x": pa.array(np.arange(100_000), pa.int64()),
                    "s": pa.array(strs)})
    for i in range(1, 9):
        pq.write_table(big, p / f"part-{i}.parquet")
    sized_read_parquet(str(p))
    # a path-keyed cache would reuse the stale entry; the stat-keyed
    # cache must derive a FRESH (and larger) block count
    assert len(sources._NB_CACHE) == 2
    nb2 = max(sources._NB_CACHE.values())
    assert nb2 > nb1


def test_keyed_sum_keeps_null_key_group(ray_session):
    from agraph_ray.stages.common import keyed_sum

    t = pa.table({"k": pa.array(["a", "a", None, None, "b"]),
                  "v": pa.array([1, 2, 10, 20, 5], pa.int64())})
    out = keyed_sum(rd.from_arrow(t), ["k"], {"v": "sum_v"}).take_all()
    got = {r["k"]: r["sum_v"] for r in out}
    assert got == {"a": 3, None: 30, "b": 5}


def test_tumbling_window_keeps_null_key_group(ray_session):
    from agraph_ray.ops.window import tumbling_window

    ts = pa.array([1_000_000, 2_000_000, 61_000_000], pa.timestamp("us"))
    t = pa.table({"u": pa.array([None, None, "x"]),
                  "ts": ts, "v": pa.array([1.0, 2.0, 4.0])})
    out = tumbling_window(rd.from_arrow(t), "u", "ts", 60, "v").take_all()
    by_key = {(r["u"], r["window_start"]): (r["n"], r["sum_v"]) for r in out}
    assert by_key[(None, 0)] == (2, 3.0)
    assert by_key[("x", 60_000_000)] == (1, 4.0)


def test_degree_table_schema_less_fallback_on_int64(ray_session, monkeypatch):
    import agraph_ray.stages.common as common
    from agraph_ray.ops.graph import degree_table

    def boom(*a, **k):
        raise RuntimeError("type lookup failed")

    monkeypatch.setattr(common, "arrow_col_type", boom)
    edges = rd.from_arrow(pa.table({
        "head_id": pa.array([1, 1, 2], pa.int64()),
        "tail_id": pa.array([2, 3, 3], pa.int64())}))
    out = {r["entity_id"]: (r["out_degree"], r["in_degree"], r["degree"])
           for r in degree_table(edges).take_all()}
    assert out[1] == (2, 0, 2)
    assert out[2] == (1, 1, 2)
    assert out[3] == (0, 2, 2)


def test_late_events_rejects_duplicate_block_leading_seq(
        ray_session, monkeypatch):
    """Ray's sort today routes equal keys to one partition, so the
    duplicate-leading-seq hazard needs a block layout the sort doesn't
    currently produce — stub the sort to pass blocks through unchanged
    and verify the guard refuses to apply a silently-wrong watermark."""
    import ray.data.dataset as rdd

    from agraph_ray.ops.window import late_events

    monkeypatch.setattr(rdd.Dataset, "sort",
                        lambda self, *a, **k: self)
    n = 400
    t = pa.table({
        "seq": pa.array([7] * n, pa.int64()),  # every block leads on 7
        "ts": pa.array(np.arange(n) * 1_000_000, pa.timestamp("us"))})
    ds = rd.from_arrow(t).repartition(8)
    with pytest.raises(ValueError, match="duplicate"):
        late_events(ds, "ts", "seq", lateness_sec=5.0).take_all()


def test_late_events_unique_seq_still_ok(ray_session):
    from agraph_ray.ops.window import late_events

    rng = np.random.default_rng(0)
    n = 300
    ev = np.cumsum(rng.integers(0, 3_000_000, n))
    t = pa.table({"seq": pa.array(np.arange(n), pa.int64()),
                  "ts": pa.array(ev.astype("int64"), pa.timestamp("us"))})
    out = late_events(rd.from_arrow(t).repartition(6), "ts", "seq",
                      lateness_sec=2.0).take_all()
    assert len(out) == n
    # oracle: running exclusive max
    df = pd.DataFrame({"seq": np.arange(n), "us": ev}).sort_values("seq")
    run = np.maximum.accumulate(df["us"].to_numpy())
    wm = np.concatenate([[np.iinfo(np.int64).min], run[:-1]])
    want_late = (wm != np.iinfo(np.int64).min) & \
        (df["us"].to_numpy() + 2_000_000 < wm)
    got = {r["seq"]: r["late"] for r in out}
    assert all(got[i] == bool(want_late[i]) for i in range(n))

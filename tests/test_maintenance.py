"""Table maintenance: compaction, partitioned writes, Z-order."""

import os

import numpy as np
import pandas as pd
import pytest


def test_compact_parquet_merges_small_files(ray_session, tmp_path):
    import ray.data as rd
    from agraph_ray.ops.maintenance import compact_parquet
    d = str(tmp_path / "t")
    df = pd.DataFrame({"a": np.arange(1000), "b": np.arange(1000) * 2})
    rd.from_pandas(df).repartition(20).write_parquet(d)
    res = compact_parquet(d, target_rows_per_file=1000)
    assert res["n_rows"] == 1000
    assert res["files_after"] < res["files_before"]
    back = rd.read_parquet(d).to_pandas().sort_values("a") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(back, df)


def test_write_partitioned_prunes(ray_session, tmp_path):
    import ray.data as rd
    from agraph_ray.ops.maintenance import write_partitioned
    d = str(tmp_path / "p")
    df = pd.DataFrame({"k": ["x"] * 50 + ["y"] * 50,
                       "v": np.arange(100)})
    write_partitioned(rd.from_pandas(df), d, by=["k"])
    assert sorted(os.listdir(d)) == ["k=x", "k=y"]
    only_x = rd.read_parquet(os.path.join(d, "k=x")).to_pandas()
    assert len(only_x) == 50 and (only_x["v"] < 50).all()


def test_zorder_sort_improves_block_locality(ray_session):
    import ray.data as rd
    from agraph_ray.ops.maintenance import zorder_sort
    rng = np.random.default_rng(17)
    n = 4000
    df = pd.DataFrame({"x": rng.uniform(0, 1, n),
                       "y": rng.uniform(0, 1, n)})
    ds = rd.from_pandas(df).repartition(16)

    def mean_span(d, col):
        spans = []
        for b in d.iter_batches(batch_size=n // 16,
                                batch_format="pandas"):
            if len(b):
                spans.append(b[col].max() - b[col].min())
        return float(np.mean(spans))

    z = zorder_sort(ds, ["x", "y"]).materialize()
    assert z.count() == n
    # per-block span shrinks on BOTH columns vs the random layout
    for col in ("x", "y"):
        assert mean_span(z, col) < 0.6 * mean_span(ds, col)
    # against a plain sort on x: plain wins on x but leaves y unpruned;
    # z-order keeps y spans far below the full range too
    plain = ds.sort("x").materialize()
    assert mean_span(z, "y") < 0.6 * mean_span(plain, "y")


def test_write_sorted_and_range_pruned_read(ray_session, tmp_path):
    import json
    import ray.data as rd
    from agraph_ray.ops.maintenance import read_range, write_sorted
    d = str(tmp_path / "s")
    df = pd.DataFrame({"k": np.random.default_rng(7).permutation(2000),
                       "v": np.arange(2000)})
    manifest = write_sorted(rd.from_pandas(df).repartition(8), d, "k",
                            num_files=8)
    # disjoint, ordered file ranges covering all keys
    fs = manifest["files"]
    assert len(fs) >= 2
    for a, b in zip(fs, fs[1:]):
        assert a["max"] < b["min"]
    on_disk = json.load(open(os.path.join(d, "_ranges.json")))
    assert on_disk == manifest
    got = read_range(d, 100, 250).to_pandas().sort_values("k")
    assert list(got["k"]) == list(range(100, 251))
    # pruning really happened: only overlapping files were read
    touched = [f for f in fs if not (f["max"] < 100 or f["min"] > 250)]
    assert len(touched) < len(fs)

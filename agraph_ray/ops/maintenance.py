"""Table-maintenance operators: compaction, hive-partitioned layout,
Z-order clustering.

A 100-TB corpus lives as Parquet directories; keeping them healthy is an
engine job, not a user script. These are the lakehouse-side counterparts
of the data ops: ``compact_parquet`` (OPTIMIZE — merge small files to a
target size), ``write_partitioned`` (hive layout so readers prune whole
directories), and ``zorder_sort`` (multi-column interleaved ordering so
row-group min/max stats prune on EVERY named column, not just the sort
prefix). All writes go through a temp-dir + atomic rename (same contract
as stages/materialize.py::atomic_write_parquet).
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import List, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["compact_parquet", "write_partitioned", "zorder_sort",
           "write_sorted", "read_range"]


def _atomic_swap(tmp_dir: str, final_dir: str) -> None:
    back = final_dir + ".old-" + uuid.uuid4().hex[:8]
    if os.path.exists(final_dir):
        os.rename(final_dir, back)
    os.rename(tmp_dir, final_dir)
    shutil.rmtree(back, ignore_errors=True)


def compact_parquet(src_dir: str, target_rows_per_file: int = 1_000_000,
                    dst_dir: str = None) -> dict:
    """OPTIMIZE: rewrite a Parquet directory into files of
    ``target_rows_per_file`` (streaming read → repartition → atomic
    write; in place when ``dst_dir`` is None). Returns
    {n_rows, files_before, files_after}. Row content is preserved
    exactly; intra-file order is not (callers needing order re-sort —
    compaction is a layout operation)."""
    import ray.data as rd

    from ..sources import sized_read_parquet
    files_before = sum(len(fs) for _, _, fs in os.walk(src_dir))
    ds = sized_read_parquet(src_dir)
    n = ds.count()
    blocks = max(1, int(np.ceil(n / target_rows_per_file)))
    final = dst_dir or src_dir
    tmp = final.rstrip("/") + ".compact-" + uuid.uuid4().hex[:8]
    ds.repartition(blocks).write_parquet(tmp)
    _atomic_swap(tmp, final)
    files_after = sum(len(fs) for _, _, fs in os.walk(final))
    return {"n_rows": int(n), "files_before": files_before,
            "files_after": files_after}


def write_partitioned(ds: "ray.data.Dataset", out_dir: str,
                      by: Sequence[str]) -> str:
    """Hive-partitioned Parquet write (``out_dir/col=value/…``) through a
    temp dir + atomic rename, so readers can prune whole directories with
    partition filters and a crashed write never leaves a half-visible
    table."""
    tmp = out_dir.rstrip("/") + ".part-" + uuid.uuid4().hex[:8]
    ds.write_parquet(tmp, partition_cols=list(by))
    _atomic_swap(tmp, out_dir)
    return out_dir


def zorder_sort(ds: "ray.data.Dataset", cols: Sequence[str],
                bits: int = 16) -> "ray.data.Dataset":
    """Z-order (Morton) clustering: scale each column to ``bits``-bit
    rank space using its global min/max (one tiny aggregate pass),
    interleave the bits into one u64 key, and range-sort on it — after
    writing, row-group min/max statistics are selective on EVERY listed
    column, not just a lexicographic prefix. Numeric columns only (≤ 4
    at 16 bits). The scaling is linear (not equi-depth); heavily skewed
    columns should be winsorized first (ops/stats.winsorize)."""
    from ray.data.aggregate import Max, Min

    cols = list(cols)
    if len(cols) * bits > 64:
        raise ValueError("len(cols) * bits must be <= 64")
    aggs = []
    for c in cols:
        aggs += [Min(c, alias_name=f"min_{c}"),
                 Max(c, alias_name=f"max_{c}")]
    stats = ds.aggregate(*aggs)
    lo = np.array([float(stats[f"min_{c}"]) for c in cols])
    hi = np.array([float(stats[f"max_{c}"]) for c in cols])
    span = np.where(hi > lo, hi - lo, 1.0)
    scale = float(2 ** bits - 1)

    def add_z(t: pa.Table) -> pa.Table:
        z = np.zeros(len(t), dtype=np.uint64)
        for i, c in enumerate(cols):
            v = pc.cast(t[c], pa.float64()).to_numpy(zero_copy_only=False)
            q = np.clip((v - lo[i]) / span[i], 0.0, 1.0)
            r = np.floor(q * scale + 0.5).astype(np.uint64)
            # spread r's bits to every len(cols)-th position, offset i
            for b in range(bits):
                z |= ((r >> np.uint64(b)) & np.uint64(1)) \
                    << np.uint64(b * len(cols) + i)
        return t.append_column("__z", pa.array(z.astype(np.int64),
                                               pa.int64()))

    return (ds.map_batches(add_z, batch_format="pyarrow")
            .sort("__z").drop_columns(["__z"]))


def write_sorted(ds: "ray.data.Dataset", out_dir: str, sort_col: str,
                 num_files: int = 16) -> dict:
    """Range-sorted Parquet layout with a per-file range manifest:
    sort by ``sort_col``, write ~equal files, and record each file's
    (min, max) in ``_ranges.json`` so a reader can prune whole files for
    range predicates without opening footers. Atomic rename like every
    writer here. Returns the manifest dict."""
    import json

    import ray

    tmp = out_dir.rstrip("/") + ".sorted-" + uuid.uuid4().hex[:8]
    os.makedirs(tmp, exist_ok=True)
    s = ds.sort(sort_col).repartition(num_files)

    def write_block(t: pa.Table) -> pa.Table:
        # worker-side write: one file per (already range-sorted) block;
        # only the one-row manifest entry returns to the driver
        import pyarrow.parquet as pq
        if len(t) == 0:
            return pa.table({"file": pa.array([], pa.string()),
                             "min": pa.array([], t.schema.field(
                                 sort_col).type),
                             "max": pa.array([], t.schema.field(
                                 sort_col).type)})
        t = t.sort_by(sort_col)
        name = f"part-{uuid.uuid4().hex}.parquet"
        pq.write_table(t, os.path.join(tmp, name))
        return pa.table({"file": pa.array([name], pa.string()),
                         "min": pa.array([t[sort_col][0].as_py()]),
                         "max": pa.array([t[sort_col][-1].as_py()])})

    entries = s.map_batches(write_block, batch_format="pyarrow",
                            batch_size=None).take_all()
    ranges = sorted(({"file": e["file"], "min": e["min"], "max": e["max"]}
                     for e in entries), key=lambda r: (r["min"], r["max"]))
    manifest = {"sort_col": sort_col, "files": ranges}
    with open(os.path.join(tmp, "_ranges.json"), "w") as f:
        json.dump(manifest, f)
    _atomic_swap(tmp, out_dir)
    return manifest


def read_range(out_dir: str, lo, hi) -> "ray.data.Dataset":
    """Read only the files of a :func:`write_sorted` layout whose range
    overlaps [lo, hi] (file-level pruning off the manifest), with an
    exact row filter on top."""
    import json

    import ray.data as rd
    import pyarrow.dataset as pads

    with open(os.path.join(out_dir, "_ranges.json")) as f:
        manifest = json.load(f)
    col = manifest["sort_col"]
    files = [os.path.join(out_dir, r["file"]) for r in manifest["files"]
             if not (r["max"] < lo or r["min"] > hi)]
    if not files:
        return rd.from_items([])
    import pyarrow.compute as _pc
    from ..sources import sized_read_parquet
    ds = sized_read_parquet(files)
    return ds.map_batches(
        lambda t: t.filter(_pc.and_(_pc.greater_equal(t[col], lo),
                                    _pc.less_equal(t[col], hi))),
        batch_format="pyarrow")

"""Filesystem document sources — read a directory of raw document files
(txt/md/json/csv/html/...) straight into the engine's document schema.

Mirrors the reference's path-based ingestion surface
(``agraph/processer/base.py:35-98`` — process(file_path) dispatched on
``Path(file_path).suffix``; ``factory.py:79-101`` — extension→processor
lookup) re-expressed as a Ray Data source: ``read_binary_files`` streams
file contents as blocks (no driver-side file loop — listing and reading
scale with the cluster), a per-batch projection derives (doc_id, format,
content), and :func:`agraph_ray.ops.parse.parse_documents` applies the
same parser registry per batch. Unsupported/poison files surface as
``parse_error`` rows, never job failures.
"""

from __future__ import annotations

import hashlib
import posixpath
from typing import List, Optional

import pyarrow as pa

from .ops.parse import parse_documents

__all__ = ["read_documents_dir", "read_jsonl_documents",
           "sized_read_parquet", "parquet_in_memory_bytes"]

# ---------------------------------------------------------------------------
# Block-sized parquet reads
#
# Ray's read_parquet oversplits small inputs: a 10 MB file becomes
# ~2×CPUs tiny blocks, and every downstream operator then pays per-task
# scheduling (~3-5 ms each) far exceeding the per-block compute. The
# streaming executor's cost is proportional to TASK COUNT, so right-sizing
# blocks at the source compounds through the whole pipeline (measured:
# revenue_by_priority 4.1 s → 1.1 s at sf0.1 from this alone).
#
# Sizing is metadata-only: the parquet FOOTER records per-column
# uncompressed byte sizes, so the estimate accounts for column pruning and
# costs one footer read (cached per path+columns for the process lifetime).
# Strictly scale-safe: we only ever REDUCE the block count below Ray's
# default parallelism — when bytes/target exceeds the default (big data),
# the default path is untouched.
# ---------------------------------------------------------------------------

_NB_CACHE: dict = {}


def _parquet_files(path) -> List[str]:
    import glob
    import os
    paths = path if isinstance(path, (list, tuple)) else [path]
    out: List[str] = []
    for p in paths:
        p = str(p)
        if os.path.isdir(p):
            out.extend(sorted(glob.glob(os.path.join(
                p, "**", "*.parquet"), recursive=True)))
        else:
            out.append(p)
    return out


def parquet_in_memory_bytes(path, columns: Optional[List[str]] = None) -> int:
    """Estimated decoded size of the selected columns, from footer
    metadata only (sum of per-column-chunk ``total_uncompressed_size``)."""
    import pyarrow.parquet as pq
    total = 0
    for p in _parquet_files(path):
        md = pq.ParquetFile(p).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                root = c.path_in_schema.split(".")[0]
                if columns is None or root in columns:
                    total += c.total_uncompressed_size
    return total


def _default_read_parallelism() -> int:
    # mirror of Ray's own floor (2 tasks per CPU) without importing
    # internals; used only as the "don't reduce below default when data is
    # genuinely large" threshold
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 0)) or 8
    except Exception:
        cpus = 8
    return 2 * cpus


def sized_read_parquet(path, *, columns: Optional[List[str]] = None,
                       target_block_bytes: int = 32 << 20, **kw
                       ) -> "ray.data.Dataset":
    """``ray.data.read_parquet`` with ``override_num_blocks`` derived from
    the footer's uncompressed size of the pruned columns. Falls back to
    the stock reader on any metadata failure or when the data is large
    enough that Ray's default parallelism is already byte-appropriate."""
    import os

    import ray.data as rd
    if "override_num_blocks" in kw:
        return rd.read_parquet(path, columns=columns, **kw)
    # Key on the RESOLVED file list plus each file's (size, mtime), not the
    # input path: checkpoint dirs are rewritten in place (atomic swaps,
    # compaction with dst=src) and grow across incremental runs, so a
    # path-only key would pin a grown dataset to a stale small block count
    # and silently produce oversized blocks.
    try:
        files = _parquet_files(path)
        stat_sig = tuple((f, os.path.getsize(f),
                          os.path.getmtime(f)) for f in files)
    except OSError:
        stat_sig = (str(path),)
    key = (stat_sig, tuple(columns) if columns else None,
           target_block_bytes)
    nb = _NB_CACHE.get(key)
    if nb is None:
        try:
            est = parquet_in_memory_bytes(path, columns)
            # floor of 8: Ray's native Aggregate/Sort do Python-heavy
            # per-block partials, so a 1-block dataset serializes them
            # (measured 5 s for a 400k-row aggregate in one block vs
            # 1.2 s at 8 blocks); 8 blocks keeps those parallel while
            # still ~8x below the default oversplit
            nb = max(8, -(-est // target_block_bytes))
        except Exception:
            nb = 0  # unknown layout → leave Ray's default
        if len(_NB_CACHE) >= 512:  # stat-keyed entries churn; stay bounded
            _NB_CACHE.clear()
        _NB_CACHE[key] = nb
    if nb and nb < _default_read_parallelism():
        return rd.read_parquet(path, columns=columns,
                               override_num_blocks=nb, **kw)
    return rd.read_parquet(path, columns=columns, **kw)


def _ext(path: str) -> str:
    base = posixpath.basename(path)
    return base.rsplit(".", 1)[1].lower() if "." in base else "txt"


def read_documents_dir(path: str, formats: Optional[List[str]] = None,
                       parse: bool = True) -> "ray.data.Dataset":
    """Stream every file under ``path`` (recursive) into rows
    ``(doc_id, path, format, content[, text, parse_error])``.

    ``doc_id`` is the first 16 hex chars of md5(file path) — stable
    across runs and nodes, so downstream dedup/incremental manifests key
    on it. ``formats`` restricts by extension (e.g. ``["md", "txt"]``);
    with ``parse=True`` the parser registry runs per batch and emits
    ``text`` / ``parse_error``. Binary payloads that fail UTF-8 decode
    become a ``parse_error`` row (decode is lossy-guarded, same
    poison-pill contract as :func:`parse_documents`)."""
    import ray.data as rd

    suffixes = [f".{f.lower().lstrip('.')}" for f in formats] if formats \
        else None
    ds = rd.read_binary_files(path, include_paths=True,
                              file_extensions=[s.lstrip(".")
                                               for s in suffixes]
                              if suffixes else None)

    def project(t: pa.Table) -> pa.Table:
        from .ops.parse import BINARY_FORMATS
        paths = t["path"].to_pylist()
        blobs = t["bytes"].to_pylist()
        ids, fmts, contents, raw, decode_err = [], [], [], [], []
        for p, b in zip(paths, blobs):
            ids.append(hashlib.md5(p.encode()).hexdigest()[:16])
            fmt = _ext(p)
            fmts.append(fmt)
            if fmt in BINARY_FORMATS:
                # binary payloads (pdf/docx/xlsx) ride the binary column
                # untouched — UTF-8 decode would mangle them
                contents.append(None)
                raw.append(b or b"")
                decode_err.append(None)
                continue
            raw.append(None)
            try:
                contents.append((b or b"").decode("utf-8"))
                decode_err.append(None)
            except UnicodeDecodeError as e:
                contents.append(None)
                decode_err.append(f"UnicodeDecodeError: {e}")
        return pa.table({
            "doc_id": pa.array(ids, pa.string()),
            "path": pa.array(paths, pa.string()),
            "format": pa.array(fmts, pa.string()),
            "content": pa.array(contents, pa.string()),
            "content_binary": pa.array(raw, pa.binary()),
            "decode_error": pa.array(decode_err, pa.string())})

    out = ds.map_batches(project, batch_format="pyarrow")
    return parse_documents(out) if parse else out


def read_jsonl_documents(path: str, text_field: str = "text",
                         id_field: Optional[str] = None
                         ) -> "ray.data.Dataset":
    """Read newline-delimited JSON document dumps (the common corpus
    interchange format) into ``(doc_id, text)`` rows. ``read_json``
    streams and splits files across the cluster; ``doc_id`` falls back to
    md5(text) when no id field exists in the dump."""
    import pyarrow.compute as pc
    import ray.data as rd

    ds = rd.read_json(path)

    def project(t: pa.Table) -> pa.Table:
        txt = pc.cast(t[text_field], pa.string())
        if id_field and id_field in t.schema.names:
            ids = pc.cast(t[id_field], pa.string())
        else:
            ids = pa.array(
                [hashlib.md5((s or "").encode()).hexdigest()[:16]
                 for s in txt.to_pylist()], pa.string())
        return pa.table({"doc_id": ids, "text": txt})

    return ds.map_batches(project, batch_format="pyarrow")

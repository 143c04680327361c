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

__all__ = ["read_documents_dir", "read_jsonl_documents"]


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
        paths = t["path"].to_pylist()
        blobs = t["bytes"].to_pylist()
        ids, fmts, contents, decode_err = [], [], [], []
        for p, b in zip(paths, blobs):
            ids.append(hashlib.md5(p.encode()).hexdigest()[:16])
            fmts.append(_ext(p))
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

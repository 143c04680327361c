"""Graph storage conveniences over the Parquet layout.

Reference surfaces:
- JsonStorage.save_graph/load_graph (agraph/storage/json_storage.py:61-130)
  → Parquet tables are the canonical store; these helpers load them back
  as Datasets and round-trip the small debug graph.json.
- backup/restore (agraph/storage/base_storage.py:519-574) → directory
  snapshot with a manifest.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Dict, Optional


def load_graph(out_dir: str) -> Dict[str, "ray.data.Dataset"]:
    """Load the materialized KG tables back as Datasets (lazy reads,
    block count sized to each table's footprint)."""
    from .sources import sized_read_parquet
    tables = {}
    for name in ["nodes", "edges", "chunks", "triples", "documents",
                 "mentions"]:
        path = os.path.join(out_dir, name)
        if os.path.isdir(path):
            tables[name] = sized_read_parquet(path)
    return tables


def backup_graph(out_dir: str, backup_dir: str) -> str:
    """Snapshot the whole output layout (base_storage.py:519-574
    semantics: copy + manifest; restore = copy back)."""
    os.makedirs(os.path.dirname(backup_dir.rstrip("/")) or ".",
                exist_ok=True)
    tmp = backup_dir.rstrip("/") + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.copytree(out_dir, tmp)
    with open(os.path.join(tmp, "BACKUP_MANIFEST.json"), "w") as f:
        json.dump({"source": os.path.abspath(out_dir),
                   "created_at": time.time()}, f)
    if os.path.exists(backup_dir):
        shutil.rmtree(backup_dir)
    os.replace(tmp, backup_dir)
    return backup_dir


def restore_graph(backup_dir: str, out_dir: str) -> str:
    """Restore a snapshot over ``out_dir`` (atomic swap)."""
    tmp = out_dir.rstrip("/") + ".restore-tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.copytree(backup_dir, tmp)
    old = out_dir.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(out_dir):
        os.rename(out_dir, old)
    os.replace(tmp, out_dir)
    shutil.rmtree(old, ignore_errors=True)
    return out_dir

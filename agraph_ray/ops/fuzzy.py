"""Edit-distance fuzzy self-join via SymSpell deletion neighborhoods.

The scale-out replacement for the reference's all-pairs fuzzy entity-name
matching (agraph/services/entity_merger.py difflib loop): if
``lev(a, b) <= d`` then some string obtained from ``a`` by at most ``d``
character deletions equals one obtained from ``b`` by at most ``d``
deletions (Garbe's SymSpell invariant) — so hashing every string's
deletion neighborhood and pairing only within a shared variant finds
EVERY pair within distance ``d``, with no quadratic step: the blocking is
exact, candidates are verified with a true Levenshtein DP, and per-bucket
work is bounded by variant-collision counts.

Shuffle volume: O(sum_s |s| ^ d) variant rows over the *distinct* string
set (the op dedups first), each carrying the string once.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.common import bucketed_group_reduce, distinct_on

__all__ = ["levenshtein", "fuzzy_self_join"]


def levenshtein(a: str, b: str) -> int:
    """Plain Levenshtein distance (insert/delete/substitute, unit costs)
    — semantics identical to DuckDB's ``levenshtein()``. Substitution and
    deletion lanes are vectorized per DP row; the insertion lane is a
    left-to-right scalar scan over the (short) string length."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return max(la, lb)
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    prev = np.arange(lb + 1, dtype=np.int64)
    for i, ca in enumerate(a, 1):
        cur = np.empty(lb + 1, dtype=np.int64)
        cur[0] = i
        sub = prev[:-1] + (bb != ord(ca))
        dele = prev[1:] + 1
        np.minimum(sub, dele, out=cur[1:])
        # insertions propagate left-to-right; scalar loop only over the
        # (short) key length
        run = cur[0]
        for j in range(1, lb + 1):
            run = cur[j] if cur[j] < run + 1 else run + 1
            cur[j] = run
        prev = cur
    return int(prev[-1])


def _deletion_variants(s: str, d: int) -> set:
    """All strings reachable from ``s`` by 0..d deletions."""
    out = {s}
    if d <= 0 or not s:
        return out
    n = len(s)
    for k in range(1, min(d, n) + 1):
        for idxs in combinations(range(n), k):
            drop = set(idxs)
            out.add("".join(c for i, c in enumerate(s) if i not in drop))
    return out


def fuzzy_self_join(ds: "ray.data.Dataset", col: str, max_edits: int = 1,
                    num_buckets: int = 64) -> "ray.data.Dataset":
    """All distinct-string pairs with ``lev(a, b) <= max_edits`` →
    ``(a, b, dist)`` with a < b. Exact (the deletion-neighborhood
    blocking is a guaranteed superset; candidates are DP-verified)."""
    var_schema = pa.schema([("variant", pa.string()), ("s", pa.string())])
    pair_schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                             ("dist", pa.int64())])

    uniq = distinct_on(ds.select_columns([col]), [col])

    def variants(batch) -> pa.Table:
        t = (batch if isinstance(batch, pa.Table)
             else pa.Table.from_pandas(batch, preserve_index=False))
        vs, ss = [], []
        for s in t[col].to_pylist():
            if s is None:
                continue
            for v in _deletion_variants(s, max_edits):
                vs.append(v)
                ss.append(s)
        return pa.Table.from_pydict({"variant": vs, "s": ss},
                                    schema=var_schema)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        a_o, b_o, d_o = [], [], []
        seen = set()
        for _, g in df.groupby("variant", sort=False):
            ss = sorted(set(g["s"]))
            if len(ss) < 2:
                continue
            for i in range(len(ss) - 1):
                for j in range(i + 1, len(ss)):
                    key = (ss[i], ss[j])
                    if key in seen:
                        continue
                    seen.add(key)
                    dd = levenshtein(ss[i], ss[j])
                    if dd <= max_edits:
                        a_o.append(ss[i])
                        b_o.append(ss[j])
                        d_o.append(dd)
        return pd.DataFrame({"a": pd.Series(a_o, dtype="object"),
                             "b": pd.Series(b_o, dtype="object"),
                             "dist": pd.Series(d_o, dtype="int64")})

    cand = bucketed_group_reduce(
        uniq.map_batches(variants, batch_format="pyarrow"),
        ["variant"], pairs, num_buckets, schema=pair_schema)
    return distinct_on(cand, ["a", "b"])

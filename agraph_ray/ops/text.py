"""Text-analysis operators for large-scale training-data pipelines.

All operators are vectorized ``map_batches`` transforms over Arrow batches
(pyarrow.compute / numpy kernels — no per-row Python in the hot path) and
have deliberately SQL-expressible semantics where possible so the DuckDB
oracle can verify them exactly (see __ray_entry__.oracle_sql).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# RE2 syntax in both pyarrow and DuckDB → identical semantics in the oracle.
_TOKEN_RE = r"\S+"
_PUNCT_RE = r"[[:punct:]]"
_CJK_RE = r"[\x{4e00}-\x{9fff}]"
_ALPHA_RE = r"[A-Za-z]"
_WS_RE = r"\s+"


def add_token_count(batch: pa.Table, col: str = "text",
                    out: str = "token_count") -> pa.Table:
    """Whitespace token count (count of \\S+ runs)."""
    return batch.append_column(
        out, pc.cast(pc.count_substring_regex(batch[col], _TOKEN_RE),
                     pa.int64()))


def add_quality(batch: pa.Table, col: str = "text") -> pa.Table:
    """Quality signals: n_chars, token_count, avg_token_len, punct_ratio,
    alpha_ratio. Ratios are over total characters (0 for empty text)."""
    t = batch[col]
    n_chars = pc.cast(pc.utf8_length(t), pa.float64())
    toks = pc.cast(pc.count_substring_regex(t, _TOKEN_RE), pa.float64())
    punct = pc.cast(pc.count_substring_regex(t, _PUNCT_RE), pa.float64())
    alpha = pc.cast(pc.count_substring_regex(t, _ALPHA_RE), pa.float64())
    ws = pc.cast(pc.count_substring_regex(t, r"\s"), pa.float64())  # ws CHARS
    denom = pc.max_element_wise(n_chars, pa.scalar(1.0))
    batch = batch.append_column("n_chars", pc.cast(n_chars, pa.int64()))
    batch = batch.append_column("token_count", pc.cast(toks, pa.int64()))
    batch = batch.append_column(
        "avg_token_len",
        pc.divide(pc.subtract(n_chars, ws), pc.max_element_wise(toks, pa.scalar(1.0))))
    batch = batch.append_column("punct_ratio", pc.divide(punct, denom))
    batch = batch.append_column("alpha_ratio", pc.divide(alpha, denom))
    return batch


def add_lang_id(batch: pa.Table, col: str = "text",
                out: str = "lang_pred") -> pa.Table:
    """Heuristic language id: 'zh' if CJK-char ratio > 0.2, else 'en' if
    ASCII-letter ratio > 0.6, else 'other'. (Deliberately simple and
    SQL-expressible; a real model slots in as an actor-pool stage.)"""
    t = batch[col]
    n = pc.max_element_wise(pc.cast(pc.utf8_length(t), pa.float64()),
                            pa.scalar(1.0))
    cjk = pc.divide(pc.cast(pc.count_substring_regex(t, _CJK_RE), pa.float64()), n)
    alpha = pc.divide(pc.cast(pc.count_substring_regex(t, _ALPHA_RE), pa.float64()), n)
    lang = pc.if_else(pc.greater(cjk, 0.2), pa.scalar("zh"),
                      pc.if_else(pc.greater(alpha, 0.6), pa.scalar("en"),
                                 pa.scalar("other")))
    return batch.append_column(out, lang)


def _md5_hex(arr: np.ndarray) -> np.ndarray:
    return np.fromiter((hashlib.md5(s.encode("utf-8")).hexdigest()
                        for s in arr), dtype=object, count=len(arr))


def add_fingerprint(batch: pa.Table, col: str = "text",
                    out: str = "fingerprint") -> pa.Table:
    """Document fingerprint: md5 of lower-cased, whitespace-collapsed,
    trimmed text. Matches DuckDB
    ``md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))`` exactly."""
    norm = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(pc.utf8_lower(batch[col]), _WS_RE, " "))
    fp = _md5_hex(np.asarray(norm.to_pylist(), dtype=object))
    return batch.append_column(out, pa.array(fp, pa.string()))


def analyze_documents(ds: "ray.data.Dataset", col: str = "text"):
    """Full text-analysis pass: quality + lang + fingerprint + tokens."""
    def _stage(batch: pa.Table) -> pa.Table:
        batch = add_quality(batch, col)
        batch = add_lang_id(batch, col)
        batch = add_fingerprint(batch, col)
        return batch
    return ds.map_batches(_stage, batch_format="pyarrow")

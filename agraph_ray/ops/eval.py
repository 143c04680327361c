"""Distributed extraction-quality scoring (triple P/R/F1).

The fixture-parity gate (tests/test_fixture_parity.py) scores triple
precision/recall on the driver; this is the same measurement as a
distributed operator, for corpus-scale evaluation of an extractor
against a gold set — the per-document confusion counts (tp/fp/fn) plus
ppm-scaled precision/recall, computed with one tagged-union bucketed
reduce (the ops/setops.py membership pattern): both sides are reduced
to distinct key tuples map-side, tagged with a side bit, and every
(doc, triple) pair's membership is resolved in one vectorized groupby —
triples ride the shuffle once, no driver materialization.
"""

from __future__ import annotations

from typing import List, Tuple

import pandas as pd
import pyarrow as pa

from ..stages.common import bucketed_group_reduce

__all__ = ["triple_prf"]

PRF_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("tp", pa.int64()), ("fp", pa.int64()), ("fn", pa.int64()),
    ("precision_ppm", pa.int64()), ("recall_ppm", pa.int64()),
])


def triple_prf(pred: "ray.data.Dataset", gold: "ray.data.Dataset",
               doc_col: str = "doc_id",
               triple_cols: Tuple[str, ...] = ("subj", "relation_type",
                                               "obj"),
               num_buckets: int = 64) -> "ray.data.Dataset":
    """Per-document tp/fp/fn and ppm-scaled precision/recall of ``pred``
    vs ``gold`` over distinct (doc, *triple_cols) tuples. Rounding rule
    (pinned for the SQL oracle): ``floor(x * 1e6 + 0.5)``; a side with
    zero rows scores 0 ppm. Documents present on either side appear in
    the output."""
    keys: List[str] = [doc_col, *triple_cols]

    def tag(src: int):
        def f(t: pa.Table) -> pa.Table:
            df = t.select(keys).to_pandas().drop_duplicates(keys)
            df["__src"] = src
            return pa.Table.from_pandas(df, preserve_index=False)
        return f

    tagged = (pred.map_batches(tag(1), batch_format="pyarrow")
              .union(gold.map_batches(tag(2), batch_format="pyarrow")))

    def reduce_df(df: pd.DataFrame) -> pd.DataFrame:
        # distinct per (keys, side) may still repeat across input blocks
        bits = (df.drop_duplicates(keys + ["__src"])
                .groupby(keys, sort=False, as_index=False)["__src"].sum())
        bits["tp"] = (bits["__src"] == 3).astype("int64")
        bits["fp"] = (bits["__src"] == 1).astype("int64")
        bits["fn"] = (bits["__src"] == 2).astype("int64")
        out = bits.groupby(doc_col, sort=False, as_index=False).agg(
            tp=("tp", "sum"), fp=("fp", "sum"), fn=("fn", "sum"))
        import numpy as np
        npred = (out["tp"] + out["fp"]).to_numpy()
        ngold = (out["tp"] + out["fn"]).to_numpy()
        tp = out["tp"].to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            prec = np.where(npred > 0, tp / np.maximum(npred, 1), 0.0)
            rec = np.where(ngold > 0, tp / np.maximum(ngold, 1), 0.0)
        out["precision_ppm"] = np.floor(prec * 1e6 + 0.5).astype("int64")
        out["recall_ppm"] = np.floor(rec * 1e6 + 0.5).astype("int64")
        for c in ("tp", "fp", "fn"):
            out[c] = out[c].astype("int64")
        return out

    return bucketed_group_reduce(tagged, [doc_col], reduce_df,
                                 num_buckets=num_buckets)


def cluster_pair_prf(assign: "ray.data.Dataset",
                     pred_col: str = "pred_cluster",
                     gold_col: str = "gold_cluster") -> pa.Table:
    """Pairwise precision/recall of a predicted clustering (e.g. the
    canonicalization step's entity merge) against a gold clustering —
    the standard entity-resolution metric, computed WITHOUT
    materializing any pairs: from the (pred, gold) contingency counts,
    tp_pairs = Σ C(n_ij,2), pred_pairs = Σ C(n_i·,2), gold_pairs =
    Σ C(n_·j,2). One combiner-backed (pred, gold) groupby (shuffle rows
    = distinct cells, materialized once — bounded by the overlap-cell
    count, not by entities), then three scalar reductions. Returns a
    single-row pyarrow Table (tp_pairs, pred_pairs, gold_pairs,
    precision_ppm, recall_ppm); ppm rule floor(x*1e6+0.5), 0 when the
    denominator is 0."""
    import numpy as np
    from ray.data.aggregate import Sum

    def cell_partial(t: pa.Table) -> pa.Table:
        df = (t.select([pred_col, gold_col]).to_pandas()
              .groupby([pred_col, gold_col], as_index=False).size()
              .rename(columns={"size": "n"}))
        return pa.Table.from_pandas(df, preserve_index=False)

    cells = (assign.map_batches(cell_partial, batch_format="pyarrow")
             .groupby([pred_col, gold_col])
             .aggregate(Sum("n", alias_name="n"))).materialize()

    def comb2_sum(col: str):
        """Σ C(n,2) over a dataset's ``col`` counts — additive per block
        because each key appears exactly once after its groupby."""
        def f(t: pa.Table) -> pa.Table:
            n = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.table({"v": pa.array([float((n * (n - 1) / 2).sum())],
                                           pa.float64())})
        return f

    # tp: each contingency cell appears exactly once after the groupby
    tp_ds = cells.map_batches(comb2_sum("n"), batch_format="pyarrow")
    # marginals must be summed GLOBALLY before C(n,2) — a cluster's cells
    # can span blocks, and C is not additive
    pred_m = (cells.groupby(pred_col).aggregate(Sum("n", alias_name="pn"))
              .map_batches(comb2_sum("pn"), batch_format="pyarrow"))
    gold_m = (cells.groupby(gold_col).aggregate(Sum("n", alias_name="gn"))
              .map_batches(comb2_sum("gn"), batch_format="pyarrow"))

    def scalar_sum(d) -> float:
        from ray.data.aggregate import Sum as _S
        row = d.aggregate(_S("v", alias_name="v"))
        return float(row["v"] or 0.0)

    tp = scalar_sum(tp_ds)
    pp = scalar_sum(pred_m)
    gp = scalar_sum(gold_m)
    prec = tp / pp if pp > 0 else 0.0
    rec = tp / gp if gp > 0 else 0.0
    return pa.table({
        "tp_pairs": pa.array([int(tp)], pa.int64()),
        "pred_pairs": pa.array([int(pp)], pa.int64()),
        "gold_pairs": pa.array([int(gp)], pa.int64()),
        "precision_ppm": pa.array([int(np.floor(prec * 1e6 + 0.5))],
                                  pa.int64()),
        "recall_ppm": pa.array([int(np.floor(rec * 1e6 + 0.5))],
                               pa.int64()),
    })

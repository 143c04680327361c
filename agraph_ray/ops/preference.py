"""Preference-pair (DPO/RLHF-style) construction over transcript turns.

Builds (prompt, chosen, rejected) training pairs from a multi-turn
transcript table: a *prompt* is a ``prompt_role`` turn, its *response*
the immediately-following ``response_role`` turn of the same
conversation; identical prompts repeated across (or within)
conversations form a candidate group, from which the longest distinct
response is ``chosen`` and the shortest ``rejected``. The score rule is
pinned (response length, ties by the response string itself) so the
whole operator sits under a DuckDB window-function oracle.

The reference (JasonDZS/agraph) has no preference-data builder; this is
part of the training-data surface this engine adds beyond it.

Scale shape: turn text crosses the cluster exactly twice — one
conv-keyed bucketed reduce that pairs adjacent turns with a vectorized
shift (all turns of a conversation are co-located by the bucket hash),
then one prompt-keyed bucketed reduce for the per-group distinct +
argmax/argmin. A map-side (prompt, response) drop_duplicates combiner
runs before the second shuffle so exact-duplicate QA pairs (the common
case in crawled/templated transcripts) collapse early. No driver
materialization, no per-group Python dispatch.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..stages.common import bucketed_group_reduce

__all__ = ["extract_qa_pairs", "preference_pairs"]

QA_SCHEMA = pa.schema([("prompt", pa.string()), ("response", pa.string())])

PAIRS_SCHEMA = pa.schema([
    ("prompt", pa.string()),
    ("chosen", pa.string()),
    ("rejected", pa.string()),
    ("n_candidates", pa.int64()),
])


def extract_qa_pairs(ds: "ray.data.Dataset",
                     conv_col: str = "conv_id",
                     idx_col: str = "turn_idx",
                     role_col: str = "role",
                     text_col: str = "text",
                     prompt_role: str = "user",
                     response_role: str = "assistant",
                     num_buckets: int = 64) -> "ray.data.Dataset":
    """(prompt, response) rows for every adjacent prompt-role →
    response-role turn pair within a conversation. One conv-keyed
    shuffle; adjacency is resolved with a vectorized shift per bucket
    (every conversation's turns land in the same bucket)."""

    def reduce_df(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"prompt": [], "response": []},
                                dtype="object")
        df = df.sort_values([conv_col, idx_col], kind="mergesort")
        conv = df[conv_col].to_numpy()
        idx = df[idx_col].to_numpy()
        role = df[role_col].to_numpy()
        txt = df[text_col].to_numpy()
        adjacent = (conv[1:] == conv[:-1]) & (idx[1:] == idx[:-1] + 1)
        mask = ((role[:-1] == prompt_role) & (role[1:] == response_role)
                & adjacent)
        return pd.DataFrame({"prompt": txt[:-1][mask],
                             "response": txt[1:][mask]})

    cols = ds.select_columns([conv_col, idx_col, role_col, text_col])
    return bucketed_group_reduce(cols, [conv_col], reduce_df,
                                 num_buckets=num_buckets, schema=QA_SCHEMA)


def preference_pairs(ds: "ray.data.Dataset",
                     conv_col: str = "conv_id",
                     idx_col: str = "turn_idx",
                     role_col: str = "role",
                     text_col: str = "text",
                     prompt_role: str = "user",
                     response_role: str = "assistant",
                     min_candidates: int = 2,
                     num_buckets: int = 64) -> "ray.data.Dataset":
    """(prompt, chosen, rejected, n_candidates) per prompt group with at
    least ``min_candidates`` distinct responses. chosen = longest
    distinct response (ties → lexicographically greatest), rejected =
    shortest (ties → lexicographically smallest); n_candidates counts
    distinct responses. Deterministic and SQL-reproducible."""

    qa = extract_qa_pairs(ds, conv_col, idx_col, role_col, text_col,
                          prompt_role, response_role, num_buckets)

    # map-side combiner: exact-duplicate (prompt, response) rows collapse
    # before the prompt-keyed shuffle
    def local_distinct(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(["prompt", "response"])
        return pa.Table.from_pandas(df, schema=QA_SCHEMA,
                                    preserve_index=False)

    qa = qa.map_batches(local_distinct, batch_format="pyarrow")

    def reduce_df(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["prompt", "response"])
        df = df.assign(__len=df["response"].str.len())
        # ascending (len, response): per group first row = rejected,
        # last row = chosen — matches the SQL ORDER BY pins exactly
        df = df.sort_values(["prompt", "__len", "response"],
                            kind="mergesort")
        g = df.groupby("prompt", sort=False)
        out = g.agg(chosen=("response", "last"),
                    rejected=("response", "first"),
                    n_candidates=("response", "size")).reset_index()
        out = out[out["n_candidates"] >= min_candidates]
        out["n_candidates"] = out["n_candidates"].astype("int64")
        return out[["prompt", "chosen", "rejected", "n_candidates"]]

    return bucketed_group_reduce(qa, ["prompt"], reduce_df,
                                 num_buckets=num_buckets,
                                 schema=PAIRS_SCHEMA)

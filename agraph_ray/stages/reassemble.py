"""Stage A — conversation reassembly.

``transcripts(conv_id, turn_idx, role, text, tool, ts)`` →
``documents(conv_id, doc_seq, text, n_turns, first_turn_idx)``

Semantics (BASELINE.json north_star step 1): group turns by ``conv_id``,
sort each group by ``turn_idx`` and concatenate turn texts with
``cfg.turn_separator``, preserving per-turn text equality under stable turn
ordering. The reference's equivalent is restoring input order after its
async fan-out (agraph/builders/llm_builders.py:243-246) — here order lives
inside the group, never across the whole dataset.

Skew handling (SURVEY.md §7.5 item 4): conversations whose turn count
exceeds ``cfg.hot_conv_turns`` are *salted* — their shuffle key becomes
``conv_id#(turn_idx // cfg.salt_span)`` so a 10^6-turn conversation becomes
~turns/salt_span independent groups instead of pinning one reducer. Each
salted group emits a sub-document with ``doc_seq = salt``; downstream
extraction treats sub-documents independently (matches cross a sub-document
boundary are lost — bounded, documented approximation).
"""

from __future__ import annotations

from typing import Optional, Set

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..config import KGConfig

DOCS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("doc_seq", pa.int32()),
    ("text", pa.string()),
    ("n_turns", pa.int32()),
    ("first_turn_idx", pa.int32()),
])


def find_hot_conversations(ds: "ray.data.Dataset", cfg: KGConfig) -> Set[str]:
    """Conversation ids with more than ``cfg.hot_conv_turns`` turns.

    Cheap pre-pass: per-batch partial counts (combiner) → one tiny groupby
    over (distinct conv per batch) partials — the shuffle moves at most one
    row per (conv_id, batch), not one per turn.
    """
    def partial_counts(batch: pa.Table) -> pa.Table:
        g = batch.group_by("conv_id").aggregate([("conv_id", "count")])
        return g.rename_columns(["conv_id", "n"])

    partials = ds.select_columns(["conv_id"]).map_batches(
        partial_counts, batch_format="pyarrow")
    from ray.data.aggregate import Sum
    totals = partials.groupby("conv_id").aggregate(Sum("n", alias_name="n_turns"))
    thresh = int(cfg.hot_conv_turns)
    hot = totals.map_batches(
        lambda t: t.filter(pc.greater(t["n_turns"], thresh))
                   .select(["conv_id"]),
        batch_format="pyarrow")
    out = set()
    for b in hot.iter_batches(batch_format="pyarrow"):
        out.update(b["conv_id"].to_pylist())
    return out


def reassemble(ds: "ray.data.Dataset", cfg: Optional[KGConfig] = None,
               hot_convs: Optional[Set[str]] = None,
               detect_hot: bool = True) -> "ray.data.Dataset":
    """Reassemble conversations into documents (see module docstring).

    ``hot_convs`` may be passed explicitly (e.g. from a previous run's
    metrics); otherwise it is detected with :func:`find_hot_conversations`
    when ``detect_hot`` is set.
    """
    cfg = cfg or KGConfig()
    span = int(cfg.salt_span)
    sep = cfg.turn_separator

    # Universal salting: group key = conv_id # (turn_idx // span). A
    # conversation whose turn indexes fit inside one span lands in exactly
    # one group — identical to unsalted grouping — while a 10^6-turn
    # conversation splits into turns/span independent groups automatically.
    # No hot-key detection pre-pass needed (the previous design scanned the
    # WHOLE input once just to count turns per conv — a full extra pass
    # over 100 TB). ``hot_convs``/``detect_hot`` are kept for API compat
    # but unused.
    def add_group_key(batch: pa.Table) -> pa.Table:
        salt = pc.divide(batch["turn_idx"], span)
        key = pc.binary_join_element_wise(
            batch["conv_id"], pc.cast(salt, pa.string()), "#")
        return batch.append_column("group_key", key)

    def assemble_bucket(df: pd.DataFrame) -> pd.DataFrame:
        """Whole-bucket reduction: one sort + one pandas groupby handles
        every conversation in the bucket (no per-group UDF dispatch)."""
        df = df.sort_values(["group_key", "turn_idx"], kind="mergesort")
        g = df.groupby("group_key", sort=False)
        out = g.agg(conv_id=("conv_id", "first"),
                    text=("text", sep.join),
                    n_turns=("text", "size"),
                    first_turn_idx=("turn_idx", "first"))
        out["doc_seq"] = out["first_turn_idx"] // span
        return out.reset_index(drop=True)[
            ["conv_id", "doc_seq", "text", "n_turns", "first_turn_idx"]]

    keyed = ds.select_columns(["conv_id", "turn_idx", "text"]).map_batches(
        add_group_key, batch_format="pyarrow")
    from .common import bucketed_group_reduce
    return bucketed_group_reduce(keyed, ["group_key"], assemble_bucket,
                                 num_buckets=256, schema=DOCS_SCHEMA)


def conversation_stats(transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-conversation shape statistics straight off the turns table —
    the triage pass a transcript corpus gets before any KG work:
    ``(conv_id, n_turns, n_user, n_assistant, n_tool_calls, total_chars,
    max_turn_chars)``. Per-batch combiner (one partial row per conv per
    batch) before a single small groupby-sum — no text ever rides the
    shuffle, only per-conv counters."""
    from ray.data.aggregate import Max, Sum

    def partial(t: pa.Table) -> pa.Table:
        chars = pc.utf8_length(pc.fill_null(t["text"], ""))
        df = pd.DataFrame({
            "conv_id": t["conv_id"].to_pandas(),
            "n_turns": 1,
            "n_user": pc.equal(t["role"], "user").to_pandas().astype(
                "int64"),
            "n_assistant": pc.equal(
                t["role"], "assistant").to_pandas().astype("int64"),
            "n_tool_calls": pc.not_equal(
                pc.fill_null(t["tool"], ""), "").to_pandas().astype("int64"),
            "total_chars": chars.to_pandas().astype("int64"),
            "max_turn_chars": chars.to_pandas().astype("int64"),
        })
        agg = df.groupby("conv_id", as_index=False).agg(
            n_turns=("n_turns", "sum"), n_user=("n_user", "sum"),
            n_assistant=("n_assistant", "sum"),
            n_tool_calls=("n_tool_calls", "sum"),
            total_chars=("total_chars", "sum"),
            max_turn_chars=("max_turn_chars", "max"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    partials = transcripts.select_columns(
        ["conv_id", "role", "text", "tool"]).map_batches(
        partial, batch_format="pyarrow")
    return (partials.groupby("conv_id")
            .aggregate(Sum("n_turns", alias_name="n_turns"),
                       Sum("n_user", alias_name="n_user"),
                       Sum("n_assistant", alias_name="n_assistant"),
                       Sum("n_tool_calls", alias_name="n_tool_calls"),
                       Sum("total_chars", alias_name="total_chars"),
                       Max("max_turn_chars", alias_name="max_turn_chars")))


def render_chat(ds: "ray.data.Dataset", sep_open: str = "<|",
                sep_close: str = "|>", salt_span: int = 100_000,
                num_buckets: int = 128) -> "ray.data.Dataset":
    """Chat-template rendering: turns → one training-ready string per
    conversation, each turn prefixed with its role tag
    (``<|role|>text``), plus the loss-masking statistics an SFT data
    pipeline needs (how much of the sequence is assistant-generated).

    → ``(conv_id, doc_seq, text, n_turns, n_assistant_turns,
    assistant_chars)``. Same universal-salting contract as
    :func:`reassemble`: conversations longer than ``salt_span`` turns
    split into independent sub-renders (doc_seq = span index), so no
    reducer is ever pinned by a mega-conversation.
    """
    import pyarrow.compute as pc

    from .common import bucketed_group_reduce

    def add_key(batch: pa.Table) -> pa.Table:
        salt = pc.divide(batch["turn_idx"], salt_span)
        key = pc.binary_join_element_wise(
            batch["conv_id"], pc.cast(salt, pa.string()), "#")
        return batch.append_column("group_key", key)

    def render(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["group_key", "turn_idx"], kind="mergesort")
        df = df.assign(
            piece=sep_open + df["role"] + sep_close + df["text"],
            is_asst=(df["role"] == "assistant"),
            asst_chars=(df["role"] == "assistant")
            * df["text"].str.len())
        g = df.groupby("group_key", sort=False)
        out = g.agg(conv_id=("conv_id", "first"),
                    text=("piece", "".join),
                    n_turns=("piece", "size"),
                    n_assistant_turns=("is_asst", "sum"),
                    assistant_chars=("asst_chars", "sum"),
                    first_turn_idx=("turn_idx", "first"))
        out["doc_seq"] = out["first_turn_idx"] // salt_span
        return out.reset_index(drop=True)[
            ["conv_id", "doc_seq", "text", "n_turns",
             "n_assistant_turns", "assistant_chars"]]

    schema = pa.schema([("conv_id", pa.string()), ("doc_seq", pa.int32()),
                        ("text", pa.string()), ("n_turns", pa.int64()),
                        ("n_assistant_turns", pa.int64()),
                        ("assistant_chars", pa.int64())])
    keyed = ds.select_columns(
        ["conv_id", "turn_idx", "role", "text"]).map_batches(
        add_key, batch_format="pyarrow")
    return bucketed_group_reduce(keyed, ["group_key"], render,
                                 num_buckets, schema=schema)

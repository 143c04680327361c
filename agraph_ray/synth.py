"""Deterministic synthetic transcript corpus generator.

Produces the Parquet transcripts table required by BASELINE.json input_hint:
``(conv_id: string, turn_idx: int32, role: string, text: string,
tool: string, ts: timestamp[us])``.

Properties (FIXTURES.md §1):
- fully deterministic given (seed, n_convs): numpy Generator + md5-based
  shard routing, no process-salted ``hash()``;
- turn texts mix filler with *planted* sentences drawn from the reference
  regex vocabulary (agraph/extractors/entity_extractor.py:169-200,
  relation_extractor.py:297-338) so the deterministic extractors fire;
- a skew tail: a small fraction of conversations get 100-1000x the median
  turn count, exercising salted repartitioning;
- row order within each shard is shuffled so reassembly is actually
  exercised;
- shards are hash-partitioned by conv_id (all turns of one conversation land
  in one shard) — the partitioning contract the resumable runner relies on.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .ids import stable_hash64

PEOPLE = ["Alice Johnson", "Bob Smith", "Carol White", "David Brown", "Emma Davis",
          "Frank Miller", "Grace Wilson", "Henry Moore", "Irene Taylor", "Jack Anderson"]
ORGS = ["Google", "Facebook", "TensorFlow", "PyTorch", "Acme Corp", "Globex Inc",
        "Initech Ltd", "Umbrella Company", "Stark Organization", "Wayne Corp"]
PRODUCTS = ["iPhone", "iPad", "macOS", "iOS", "Django", "Flask", "Python"]
CONCEPTS = ["learning method", "systems theory", "design principle", "greedy approach",
            "core concept", "agile method"]
TOOLS = ["", "", "", "search", "calculator", "browser", "code_run"]
ROLES = ["user", "assistant", "tool", "system"]

# Relation templates keyed by the reference relation patterns
# (relation_extractor.py:297-338). {p}=person {o}=org {pr}=product {c}=concept.
REL_TEMPLATES = [
    "{p} works for {o}.",
    "{p} belongs to {o}.",
    "{o} develops {pr}.",
    "{o} creates {pr}.",
    "{p} founded by {o}.",
    "{c} and {c2} are similar.",
    "{c} is related to {c2}.",
    "{pr} is related to {c}.",
    "{p} and {p2} are related.",
]

FILLER = [
    "ok let me check that for you now",
    "running the requested command",
    "here is the output you asked about",
    "that looks correct to me overall",
    "please confirm before we continue",
    "the result was saved successfully",
    "retrying with a different argument",
    "no errors were reported this time",
]

TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])


def _turn_text(rng: np.random.Generator) -> str:
    """One turn: 1-3 sentences, ~40% of sentences are planted relations."""
    parts: List[str] = []
    for _ in range(int(rng.integers(1, 4))):
        if rng.random() < 0.4:
            t = REL_TEMPLATES[int(rng.integers(0, len(REL_TEMPLATES)))]
            c = int(rng.integers(0, len(CONCEPTS)))
            p = int(rng.integers(0, len(PEOPLE)))
            parts.append(t.format(
                p=PEOPLE[p], p2=PEOPLE[(p + 1) % len(PEOPLE)],
                o=ORGS[int(rng.integers(0, len(ORGS)))],
                pr=PRODUCTS[int(rng.integers(0, len(PRODUCTS)))],
                c=CONCEPTS[c], c2=CONCEPTS[(c + 1) % len(CONCEPTS)],
            ))
        else:
            parts.append(FILLER[int(rng.integers(0, len(FILLER)))] + ".")
    return " ".join(parts)


def generate_conversation(conv_id: str, n_turns: int, seed: int):
    """Deterministic turn list for one conversation (keyed by conv_id+seed)."""
    rng = np.random.default_rng((stable_hash64(conv_id) ^ seed) & 0x7FFFFFFF)
    base_ts = 1_700_000_000_000_000 + (stable_hash64(conv_id) % 10_000_000) * 1_000_000
    rows = []
    for i in range(n_turns):
        role = ROLES[i % 2] if rng.random() < 0.8 else ROLES[int(rng.integers(0, 4))]
        tool = TOOLS[int(rng.integers(0, len(TOOLS)))] if role == "tool" else ""
        rows.append({
            "conv_id": conv_id,
            "turn_idx": np.int32(i),
            "role": role,
            "text": _turn_text(rng),
            "tool": tool,
            "ts": base_ts + i * 1_000_000,
        })
    return rows


def conv_turn_counts(n_convs: int, seed: int, skew_frac: float = 0.002,
                     skew_mult_lo: int = 100, skew_mult_hi: int = 1000) -> np.ndarray:
    """Median ~8 turns; a skew tail of ``skew_frac`` conversations gets
    100-1000x that (FIXTURES.md §1)."""
    rng = np.random.default_rng(seed)
    n = 2 + rng.geometric(0.15, size=n_convs)  # median ≈ 6-8 turns
    n_skew = max(1, int(n_convs * skew_frac)) if n_convs >= 50 else 0
    if n_skew:
        idx = rng.choice(n_convs, size=n_skew, replace=False)
        n[idx] = 8 * rng.integers(skew_mult_lo, skew_mult_hi + 1, size=n_skew)
    return n.astype(np.int64)


def generate_transcripts(out_dir: str, n_convs: int = 200, seed: int = 42,
                         num_shards: int = 8, skew: bool = True) -> List[str]:
    """Write the transcripts corpus as hash-partitioned Parquet shards.

    Returns the list of shard paths. Re-running with the same arguments
    produces byte-identical files (deterministic order within shard given by
    a seeded permutation).
    """
    os.makedirs(out_dir, exist_ok=True)
    counts = conv_turn_counts(n_convs, seed, skew_frac=0.002 if skew else 0.0)
    shard_rows: List[List[dict]] = [[] for _ in range(num_shards)]
    for k in range(n_convs):
        conv_id = f"conv-{seed}-{k:07d}"
        shard = stable_hash64(conv_id) % num_shards
        shard_rows[shard].extend(generate_conversation(conv_id, int(counts[k]), seed))

    paths = []
    for s, rows in enumerate(shard_rows):
        path = os.path.join(out_dir, f"transcripts-{s:05d}.parquet")
        if rows:
            perm = np.random.default_rng(seed + s).permutation(len(rows))
            rows = [rows[i] for i in perm]  # shuffle so reassembly is exercised
        tbl = pa.Table.from_pylist(rows, schema=TRANSCRIPT_SCHEMA)
        pq.write_table(tbl, path)
        paths.append(path)
    return paths


def transcripts_from_documents(sf_dir: str, turn_chars: int = 80):
    """Derive a transcripts Dataset from the driver's ``documents`` table:
    one conversation per document, turns = fixed ``turn_chars`` slices of
    the text (so SQL can reconstruct the document with string_agg — the
    reassembly oracle). Turn rows are emitted in reverse order per document
    so reassembly is actually exercised."""
    import ray.data as rd

    def to_turns(batch: pa.Table) -> pa.Table:
        conv, idx, role, text, tool, ts = [], [], [], [], [], []
        for did, t in zip(batch["doc_id"].to_pylist(),
                          batch["text"].to_pylist()):
            t = t or ""
            slices = [t[i:i + turn_chars]
                      for i in range(0, max(len(t), 1), turn_chars)]
            base = 1_700_000_000_000_000
            for i, s in reversed(list(enumerate(slices))):
                conv.append(str(did))
                idx.append(i)
                role.append(ROLES[i % 2])
                text.append(s)
                tool.append("")
                ts.append(base + i * 1_000_000)
        return pa.Table.from_arrays(
            [pa.array(conv, pa.string()), pa.array(idx, pa.int32()),
             pa.array(role, pa.string()), pa.array(text, pa.string()),
             pa.array(tool, pa.string()),
             pa.array(ts, pa.timestamp("us"))],
            schema=TRANSCRIPT_SCHEMA)

    from .sources import sized_read_parquet
    docs = sized_read_parquet(os.path.join(sf_dir, "documents.parquet"),
                              columns=["doc_id", "text"],
                              target_block_bytes=4 << 20)
    return docs.map_batches(to_turns, batch_format="pyarrow")


def ground_truth_documents(n_convs: int, seed: int, separator: str = "\n",
                           skew: bool = True):
    """(conv_id -> full document text) exactly as reassembly must produce it
    — the per-turn-text-equality oracle (BASELINE.json input_hint)."""
    counts = conv_turn_counts(n_convs, seed, skew_frac=0.002 if skew else 0.0)
    docs = {}
    for k in range(n_convs):
        conv_id = f"conv-{seed}-{k:07d}"
        rows = generate_conversation(conv_id, int(counts[k]), seed)
        docs[conv_id] = separator.join(r["text"] for r in rows)
    return docs


SYNTH_TOOLS = ("search", "calculator", "code_run", "")


def add_synthetic_tools(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Deterministic, SQL-reproducible tool annotation for derived
    transcripts: each assistant turn calls one of three tools (or none)
    picked by ``(turn_idx + length(text)) % 4``; user turns never do.
    Exercises the input_hint's ``tool`` column (BASELINE.json) without
    external data — the DuckDB oracle recomputes the same rule with
    ``length()`` over the reconstructed turn table. Pure per-batch
    projection, zero shuffle."""
    import pyarrow.compute as pc

    tools = np.array(SYNTH_TOOLS, dtype=object)

    def f(t: pa.Table) -> pa.Table:
        idx = t["turn_idx"].to_numpy().astype(np.int64)
        ln = pc.utf8_length(t["text"]).to_numpy(
            zero_copy_only=False).astype(np.int64)
        role = np.asarray(t["role"].to_pylist(), dtype=object)
        tool = tools[(idx + ln) % 4]
        tool = np.where(role == "assistant", tool, "")
        return t.set_column(t.schema.get_field_index("tool"), "tool",
                            pa.array(tool, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")

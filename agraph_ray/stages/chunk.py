"""Stage B — chunking.

``documents(conv_id, doc_seq, text, ...)`` → ``chunks(chunk_id, conv_id,
doc_seq, chunk_index, text, token_count, char_count, start_index,
end_index, chunk_type)``

Reimplements the observable behaviour of the reference chunker
(agraph/chunker.py:63-256): recursive separator-preference splitting
(paragraph → line → sentence → word → char) bounded by a token budget, with
token-overlap stitching between consecutive chunks. tiktoken is not
available in this environment, so token counts use the reference's own
fallback approximation — ``words / 0.75`` (agraph/chunker.py:287-320
SimpleTokenChunker) — behind a pluggable counter.

Scale shape: a callable class for ``map_batches`` (the counter's regex and
separator list compile once per actor); one input document row → N chunk
rows, emitted as a single Arrow table per batch.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

import pyarrow as pa

from ..config import KGConfig
from ..ids import chunk_id

_WORD_RE = re.compile(r"\b\w+\b")

SEPARATORS = ["\n\n", "\n", ". ", "! ", "? ", " ", ""]

CHUNKS_SCHEMA = pa.schema([
    ("chunk_id", pa.string()),
    ("conv_id", pa.string()),
    ("doc_seq", pa.int32()),
    ("chunk_index", pa.int32()),
    ("text", pa.string()),
    ("token_count", pa.int32()),
    ("char_count", pa.int32()),
    ("start_index", pa.int32()),
    ("end_index", pa.int32()),
    ("chunk_type", pa.string()),
])


def approx_token_count(text: str) -> int:
    """Reference fallback approximation: 1 token ≈ 0.75 words
    (agraph/chunker.py:308-320)."""
    return int(len(_WORD_RE.findall(text)) / 0.75)


class ApproxTokenChunker:
    """Separator-preference recursive splitter with token overlap.

    Mirrors TokenChunker's contract (agraph/chunker.py:63-124): every chunk's
    token count <= chunk_size before overlap stitching; an overlapped chunk
    may reach chunk_size + chunk_overlap (agraph/chunker.py:229).
    """

    def __init__(self, chunk_size: int = 512, chunk_overlap: int = 100):
        if chunk_overlap >= chunk_size:
            raise ValueError("chunk_overlap must be less than chunk_size")
        self.chunk_size = chunk_size
        self.chunk_overlap = chunk_overlap

    def count_tokens(self, text: str) -> int:
        return approx_token_count(text)

    # -- core split --------------------------------------------------------

    def _split(self, text: str, sep_idx: int) -> List[str]:
        """Greedy packing of separator-delimited parts into token-bounded
        chunks; over-long parts recurse to the next finer separator."""
        if sep_idx >= len(SEPARATORS) or SEPARATORS[sep_idx] == "":
            return self._split_chars(text)
        sep = SEPARATORS[sep_idx]
        parts = text.split(sep)
        if len(parts) <= 1:
            return self._split(text, sep_idx + 1)

        # Incremental word accounting: every part appended to a non-empty
        # accumulator ends with its separator (a non-word character), so
        # the \b\w+\b count is ADDITIVE across the join — counting each
        # part once replaces the count_tokens(cur + part) re-scan of the
        # whole accumulated prefix, which made packing quadratic in parts
        # per chunk (130 s to chunk a 320k-doc corpus; linear after).
        # The token rule stays int(total_words / 0.75) on the running sum.
        chunks: List[str] = []
        cur_parts: List[str] = []
        cur_words = 0
        for i, part in enumerate(parts):
            if i < len(parts) - 1:
                part += sep
            part_words = len(_WORD_RE.findall(part))
            if int((cur_words + part_words) / 0.75) <= self.chunk_size:
                cur_parts.append(part)
                cur_words += part_words
                continue
            cur = "".join(cur_parts)
            if cur.strip():
                chunks.append(cur.strip())
            if int(part_words / 0.75) > self.chunk_size:
                chunks.extend(self._split(part, sep_idx + 1))
                cur_parts, cur_words = [], 0
            else:
                cur_parts, cur_words = [part], part_words
        cur = "".join(cur_parts)
        if cur.strip():
            chunks.append(cur.strip())
        return chunks

    def _split_chars(self, text: str) -> List[str]:
        """Last resort: character packing (agraph/chunker.py:174-199).
        Uses a word-boundary-free budget of ~4 chars/token to stay O(n)."""
        budget = max(1, self.chunk_size * 4)
        return [text[i:i + budget] for i in range(0, len(text), budget)]

    def _overlap_tail(self, text: str) -> str:
        """Roughly the last ``chunk_overlap`` tokens of ``text``."""
        if self.chunk_overlap == 0:
            return ""
        words = text.split(" ")
        n = max(1, int(self.chunk_overlap * 0.75))
        return " ".join(words[-n:]) + " " if len(words) > n else text

    def split_text(self, text: str) -> List[str]:
        chunks = self._split(text, 0)
        if self.chunk_overlap > 0 and len(chunks) > 1:
            out = [chunks[0]]
            for prev, cur in zip(chunks, chunks[1:]):
                combined = self._overlap_tail(prev) + cur
                out.append(combined if self.count_tokens(combined)
                           <= self.chunk_size + self.chunk_overlap else cur)
            chunks = out
        return [c for c in chunks if c.strip()]


class ChunkStage:
    """``map_batches`` callable: documents batch → chunks batch."""

    def __init__(self, cfg: Optional[KGConfig] = None):
        cfg = cfg or KGConfig()
        self.chunker = ApproxTokenChunker(cfg.chunk_size, cfg.chunk_overlap)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: Tuple[List, ...] = ([], [], [], [], [], [], [], [], [], [])
        (cids, convs, seqs, idxs, texts, toks, chars, starts, ends, types) = cols
        for conv, seq, text in zip(batch["conv_id"].to_pylist(),
                                   batch["doc_seq"].to_pylist(),
                                   batch["text"].to_pylist()):
            pieces = self.chunker.split_text(text or "")
            search_from = 0
            for ci, piece in enumerate(pieces):
                pos = text.find(piece[:80], search_from) if piece else -1
                if pos >= 0:
                    search_from = pos + 1
                cids.append(chunk_id(conv, seq, ci))
                convs.append(conv)
                seqs.append(seq)
                idxs.append(ci)
                texts.append(piece)
                toks.append(self.chunker.count_tokens(piece))
                chars.append(len(piece))
                starts.append(pos)
                ends.append(pos + len(piece) if pos >= 0 else -1)
                types.append("chunk" if len(pieces) > 1 else "document")
        return pa.Table.from_arrays(
            [pa.array(cids, pa.string()), pa.array(convs, pa.string()),
             pa.array(seqs, pa.int32()), pa.array(idxs, pa.int32()),
             pa.array(texts, pa.string()), pa.array(toks, pa.int32()),
             pa.array(chars, pa.int32()), pa.array(starts, pa.int32()),
             pa.array(ends, pa.int32()), pa.array(types, pa.string())],
            schema=CHUNKS_SCHEMA)


def chunk_documents(docs: "ray.data.Dataset", cfg: Optional[KGConfig] = None):
    """documents → chunks via a stateless-task ``map_batches`` (the chunker
    is cheap to build; no actor pool needed)."""
    import ray  # noqa: F401  (type reference only)
    cfg = cfg or KGConfig()
    return docs.map_batches(ChunkStage(cfg), batch_format="pyarrow",
                            batch_size=cfg.chunk_batch_size)

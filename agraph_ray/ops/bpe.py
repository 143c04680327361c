"""BPE vocabulary learning + subword encoding over a document corpus.

The industrial shape (same split as HF tokenizers / SentencePiece
trainers): the CORPUS pass is distributed — one combiner-bounded word
count, so the shuffle carries per-batch vocabulary, never token
occurrences — and the MERGE loop runs on the driver over the bounded
word-frequency table (top ``vocab_cap`` words; pair statistics are a
function of that table alone, Sennrich et al. 2016). Encoding is a
stateful actor-pool stage: merge ranks build once per actor, words
memoized, batches vectorized around the per-unique-word inner loop.

Determinism is pinned end to end: merge ties break on the
lexicographically smallest pair, vocab truncation on (count desc, word).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .text import corpus_word_counts

__all__ = ["learn_bpe", "BPEEncoder", "bpe_encode"]

_EOW = "</w>"


def _pair_stats(vocab: Dict[Tuple[str, ...], int]) -> Dict[Tuple[str, str], int]:
    stats: Dict[Tuple[str, str], int] = {}
    for syms, cnt in vocab.items():
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            stats[p] = stats.get(p, 0) + cnt
    return stats


def _merge_vocab(vocab: Dict[Tuple[str, ...], int],
                 pair: Tuple[str, str]) -> Dict[Tuple[str, ...], int]:
    a, b = pair
    ab = a + b
    out: Dict[Tuple[str, ...], int] = {}
    for syms, cnt in vocab.items():
        if a not in syms:
            out[syms] = out.get(syms, 0) + cnt
            continue
        res: List[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                res.append(ab)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        key = tuple(res)
        out[key] = out.get(key, 0) + cnt
    return out


def learn_bpe(ds: "ray.data.Dataset", col: str = "text",
              num_merges: int = 100,
              vocab_cap: int = 1_000_000) -> pd.DataFrame:
    """Learn ``num_merges`` BPE merges from the corpus. Returns a small
    driver-side DataFrame ``(rank, left, right, freq)`` — the merge
    table, in learned order. Only the word-frequency table (capped at
    ``vocab_cap`` rows by count desc, word asc — cap anything dropped is
    rare by construction) leaves the cluster."""
    wc = corpus_word_counts(ds, col=col)
    top = (wc.sort(["cnt", "word"], descending=[True, False])
           .limit(vocab_cap).take_all())
    vocab: Dict[Tuple[str, ...], int] = {}
    for r in top:
        w = r["word"]
        if not w:
            continue
        key = tuple(list(w) + [_EOW])
        vocab[key] = vocab.get(key, 0) + int(r["cnt"])

    merges = []
    for rank in range(num_merges):
        stats = _pair_stats(vocab)
        if not stats:
            break
        # tie-break: highest count, then lexicographically smallest pair
        best_cnt = max(stats.values())
        pair = min(p for p, c in stats.items() if c == best_cnt)
        merges.append({"rank": rank, "left": pair[0], "right": pair[1],
                       "freq": best_cnt})
        vocab = _merge_vocab(vocab, pair)
    return pd.DataFrame(merges,
                        columns=["rank", "left", "right", "freq"])


class BPEEncoder:
    """Actor-pool encoding stage: merge ranks built once per actor
    (``__init__``), per-batch work restricted to each batch's UNIQUE
    words (memoized across batches), then scattered back vectorized.
    Emits ``(id_col, n_words, n_tokens, tokens)`` with ``tokens`` the
    space-joined subword string per document."""

    def __init__(self, merges: pd.DataFrame, col: str = "text",
                 id_col: str = "doc_id"):
        self.ranks = {(l, r): i for i, (l, r) in
                      enumerate(zip(merges["left"], merges["right"]))}
        self.col, self.id_col = col, id_col
        self.cache: Dict[str, List[str]] = {}

    def _encode_word(self, w: str) -> List[str]:
        hit = self.cache.get(w)
        if hit is not None:
            return hit
        syms = list(w) + [_EOW]
        while len(syms) > 1:
            pairs = [(self.ranks.get((syms[i], syms[i + 1]), 1 << 30), i)
                     for i in range(len(syms) - 1)]
            rank, i = min(pairs)
            if rank == 1 << 30:
                break
            syms[i:i + 2] = [syms[i] + syms[i + 1]]
        if len(self.cache) < 1_000_000:
            self.cache[w] = syms
        return syms

    def __call__(self, t: pa.Table) -> pa.Table:
        lists = pc.split_pattern(t[self.col].combine_chunks(), " ")
        offs = np.asarray([0] + [len(x) for x in lists]).cumsum()
        words = np.asarray(lists.flatten().to_pylist(), dtype=object)
        uniq, inv = np.unique(words, return_inverse=True) if len(words) \
            else (np.array([], dtype=object), np.array([], dtype=np.int64))
        enc = [self._encode_word(w) for w in uniq]
        tok_per_word = np.asarray([len(e) for e in enc], dtype=np.int64)
        joined = np.asarray([" ".join(e) for e in enc], dtype=object)
        docs_tokens, n_tokens, n_words = [], [], []
        for d in range(len(t)):
            sl = inv[offs[d]:offs[d + 1]]
            docs_tokens.append(" ".join(joined[sl]))
            n_tokens.append(int(tok_per_word[sl].sum()))
            n_words.append(int(offs[d + 1] - offs[d]))
        return pa.table({
            self.id_col: t[self.id_col],
            "n_words": pa.array(n_words, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "tokens": pa.array(docs_tokens, pa.string())})


def bpe_encode(ds: "ray.data.Dataset", merges: pd.DataFrame,
               col: str = "text", id_col: str = "doc_id",
               concurrency=(1, 8)) -> "ray.data.Dataset":
    """Encode every document with a learned merge table (actor pool;
    merges ship once per actor via the constructor args, not per
    batch)."""
    return ds.map_batches(
        BPEEncoder, fn_constructor_args=(merges, col, id_col),
        batch_format="pyarrow", concurrency=concurrency)

"""Multi-pattern substring matching for vocabulary-in-text linking.

``link_chunks`` must find, per chunk, every entity name/alias that appears
as a (case-insensitive) substring of the chunk text
(agraph/builders/llm_builders.py:770-812 semantics). A per-chunk scan over
the name dictionary is O(|vocabulary| x |text|) and becomes the pipeline
bottleneck at 10^6 names x 10^8 chunks; the classic fix is an Aho-Corasick
automaton: build once per worker in O(sum of pattern lengths), then each
chunk is a single O(|text| + matches) pass independent of vocabulary size.

Pure-Python implementation (no external dependency): dict-based trie with
BFS failure links and output-set merging — the textbook construction
(Aho & Corasick 1975).
"""

from __future__ import annotations

from collections import deque
from typing import Iterable, List, Set


class AhoCorasick:
    """Matcher answering "which of the patterns occur in this text?".

    Patterns are matched verbatim (caller normalizes case). Duplicate
    patterns are collapsed; empty patterns are ignored.
    """

    def __init__(self, patterns: Iterable[str]):
        self.patterns: List[str] = sorted({p for p in patterns if p})
        goto: List[dict] = [{}]
        out: List[Set[int]] = [set()]
        for pi, pat in enumerate(self.patterns):
            node = 0
            for ch in pat:
                nxt = goto[node].get(ch)
                if nxt is None:
                    goto.append({})
                    out.append(set())
                    nxt = len(goto) - 1
                    goto[node][ch] = nxt
                node = nxt
            out[node].add(pi)

        fail = [0] * len(goto)
        q: deque = deque(goto[0].values())
        while q:
            u = q.popleft()
            for ch, v in goto[u].items():
                q.append(v)
                f = fail[u]
                while f and ch not in goto[f]:
                    f = fail[f]
                cand = goto[f].get(ch, 0)
                fail[v] = cand if cand != v else 0
                if out[fail[v]]:
                    out[v] |= out[fail[v]]

        self._goto = goto
        self._fail = fail
        self._out: List[tuple] = [tuple(s) for s in out]

    def find_present(self, text: str) -> Set[str]:
        """Set of patterns occurring (as substrings) anywhere in ``text``."""
        goto, fail, out, pats = self._goto, self._fail, self._out, self.patterns
        node = 0
        hit: Set[int] = set()
        for ch in text:
            while node and ch not in goto[node]:
                node = fail[node]
            node = goto[node].get(ch, 0)
            o = out[node]
            if o:
                hit.update(o)
        return {pats[i] for i in hit}

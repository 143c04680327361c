"""Deterministic content-hash identifiers.

The reference generates ``entity_<md5(name)[:8]>`` ids
(agraph/extractors/llm_entity_extractor.py:346-350) and
``relation_<md5(f"{head}_{type}_{tail}")[:8]>`` ids
(agraph/extractors/llm_relation_extractor.py:262-267). We keep exactly that
scheme but always hash the *normalized* (lower().strip()) name so re-execution
of any partition on any worker is idempotent — the property the distributed
pipeline relies on for resumability (SURVEY.md §1.2).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache


def norm_name(name: str) -> str:
    """Normalization used for all dedup keys (entity_extractor.py:108)."""
    return name.lower().strip()


# Mention streams repeat a small vocabulary of names millions of times —
# memoize the md5s (pure functions; caches are per-process/per-actor).
@lru_cache(maxsize=1 << 17)
def entity_id(name: str) -> str:
    """entity_<md5(norm_name)[:8]> (llm_entity_extractor.py:346-350)."""
    return "entity_" + hashlib.md5(norm_name(name).encode("utf-8")).hexdigest()[:8]


@lru_cache(maxsize=1 << 17)
def relation_id(head: str, rel_type: str, tail: str) -> str:
    """relation_<md5(head_type_tail)[:8]> (llm_relation_extractor.py:262-267)."""
    key = f"{norm_name(head)}_{rel_type}_{norm_name(tail)}"
    return "relation_" + hashlib.md5(key.encode("utf-8")).hexdigest()[:8]


def chunk_id(conv_id: str, doc_seq: int, chunk_index: int) -> str:
    """Deterministic chunk id keyed by provenance."""
    key = f"{conv_id}#{doc_seq}#{chunk_index}"
    return "chunk_" + hashlib.md5(key.encode("utf-8")).hexdigest()[:12]


def stable_hash64(s: str) -> int:
    """Deterministic 64-bit hash (builtin hash() is salted per process)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


@lru_cache(maxsize=1 << 17)
def stable_hash64_signed(s: str) -> int:
    """``stable_hash64`` shifted into signed-int64 range (fits Arrow int64
    columns); memoized — callers hash small id vocabularies repeatedly."""
    return stable_hash64(s) - (1 << 63)

"""Deterministic rule-based entity + triple extraction.

This module reimplements, from its observed behaviour, the semantics of the
reference's deterministic extractors so that our pipeline's (subj, pred, obj)
triples match the reference fixture suite at P/R >= 0.95 (BASELINE.json
north_rule). Semantics sources (studied, not copied — the execution model
here is batch-oriented for Ray Data `map_batches`):

- entity regex patterns + flow:   agraph/extractors/entity_extractor.py:169-257
- entity confidence heuristic:    agraph/extractors/entity_extractor.py:127-154
- keyword concept extraction:     agraph/extractors/entity_extractor.py:328-351
- in-document dedup merge:        agraph/extractors/entity_extractor.py:93-125
- relation regex patterns + flow: agraph/extractors/relation_extractor.py:297-414
- fuzzy entity resolution:        agraph/extractors/relation_extractor.py:420-445
- sentence co-occurrence:         agraph/extractors/relation_extractor.py:447-487
- relation validation whitelist:  agraph/extractors/relation_extractor.py:57-145

The pattern literals themselves are shared constants with the reference —
they *are* the spec (changing a single character changes the emitted triple
set and fails the P/R gate). Everything around them is new code.

IMPORTANT behavioural notes preserved on purpose (they look like bugs but are
the reference's observable semantics):

* all patterns run with ``re.IGNORECASE``, so ``[A-Z][a-z]+`` matches any
  case — the PERSON bigram pattern fires on most two-word sequences;
* the confidence capitalization bonus (+0.1) still checks the *matched*
  casing, so lowercase bigrams score 0.7 and pass the 0.5 floor;
* the LOCATION pattern ``\\bin [A-Z][a-z]+\\b`` includes the literal "in "
  in the entity name;
* pattern-relation head/tail resolution falls back to substring fuzzy match
  in entity-insertion order — first hit wins.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set, Tuple

# ---------------------------------------------------------------------------
# type vocabulary (agraph/types.py:11-51)
# ---------------------------------------------------------------------------

PERSON = "person"
ORGANIZATION = "organization"
LOCATION = "location"
CONCEPT = "concept"
PRODUCT = "product"
SOFTWARE = "software"

BELONGS_TO = "belongs_to"
CONTAINS = "contains"
SIMILAR_TO = "similar_to"
RELATED_TO = "related_to"
DESCRIBES = "describes"
DEVELOPS = "develops"
FOUNDED_BY = "founded_by"
MENTIONS = "mentions"
FOREIGN_KEY = "foreign_key"

# Pattern tables. Order matters: extraction iterates types and patterns in
# this exact order, and first-encounter order drives the dedup keep-rule and
# fuzzy resolution (entity_extractor.py:171-200 dict insertion order).
ENTITY_PATTERN_SPECS: List[Tuple[str, List[str]]] = [
    (PERSON, [
        r"\b[A-Z][a-z]+ [A-Z][a-z]+\b",
        r"\b(?:Mr|Mrs|Ms|Dr|Prof)\.? [A-Z][a-z]+\b",
        r"[\u4e00-\u9fff]{2,4}·[\u4e00-\u9fff]{2,4}",
        r"史蒂夫·[\u4e00-\u9fff]+",
        r"[\u4e00-\u9fff]{2}[\u4e00-\u9fff]{1,2}(?:先生|女士|博士|教授)",
    ]),
    (ORGANIZATION, [
        r"\b[A-Z][a-zA-Z\s&]+ (?:Inc|Corp|Ltd|LLC|Company|Organization)\b",
        r"\b[A-Z][A-Z\s]+\b",
        r"[\u4e00-\u9fff]+(?:公司|企业|集团|组织|机构|大学|学院|研究所)",
        r"苹果公司|清华大学|Facebook|Google|TensorFlow|PyTorch",
    ]),
    (LOCATION, [
        r"\b[A-Z][a-z]+ (?:City|State|Country|Province|District)\b",
        r"\bin [A-Z][a-z]+\b",
        r"[\u4e00-\u9fff]+(?:市|省|区|县|国|州|地区)",
        r"北京|上海|加利福尼亚州|库比蒂诺|海淀区",
    ]),
    (CONCEPT, [
        r"\b[a-z]+ (?:concept|theory|principle|method|approach)\b",
        r"[\u4e00-\u9fff]+(?:技术|概念|理论|方法|系统|平台|框架)",
        r"人工智能|机器学习|深度学习|自然语言处理|计算机视觉|iOS|iPhone",
    ]),
    (PRODUCT, [
        r"iPhone|iPad|macOS|iOS|Django|Flask|Python|TensorFlow|PyTorch",
        r"[\u4e00-\u9fff]+(?:产品|系统|平台|应用|软件)",
    ]),
]

RELATION_PATTERN_SPECS: List[Tuple[str, List[str]]] = [
    (BELONGS_TO, [
        r"(.+?) (?:belongs to|is part of|works for) (.+)",
        r"(.+?) of (.+)",
        r"(.+?)(?:位于|在)(.+)",
        r"(.+?)(?:属于|隶属于)(.+)",
    ]),
    (CONTAINS, [
        r"(.+?) (?:contains|includes|has) (.+)",
        r"(.+?) with (.+)",
        r"(.+?)(?:包括|包含|有)(.+)",
        r"(.+?)(?:下辖|管辖)(.+)",
    ]),
    (SIMILAR_TO, [
        r"(.+?) (?:is similar to|resembles|is like) (.+)",
        r"(.+?) and (.+?) are similar",
        r"(.+?)(?:类似于|相似于)(.+)",
    ]),
    (RELATED_TO, [
        r"(.+?) (?:is related to|relates to|associated with) (.+)",
        r"(.+?) and (.+?) are related",
        r"(.+?)(?:相关|关联|涉及)(.+)",
    ]),
    (DESCRIBES, [
        r"(.+?) (?:describes|explains|defines) (.+)",
        r"(.+?) is described by (.+)",
        r"(.+?)(?:描述|说明|定义)(.+)",
    ]),
    (DEVELOPS, [
        r"(.+?) (?:develops|creates|builds) (.+)",
        r"(.+?) developed by (.+)",
        r"(.+?)(?:开发|研发|创造|制造)(.+)",
        r"(.+?)(?:由)(.+?)(?:开发|创建)",
    ]),
    (FOUNDED_BY, [
        r"(.+?) (?:founded by|established by|created by) (.+)",
        r"(.+?)(?:由)(.+?)(?:创立|成立|建立)",
        r"(.+?)(?:创建于|成立于)(.+)",
    ]),
]

STOPWORDS = frozenset({
    "the", "a", "an", "and", "or", "but", "in", "on", "at", "to", "for",
    "of", "with", "by",
})  # entity_extractor.py:28-43

# Relation-type validity whitelist (relation_extractor.py:124-145).
# Text-relevant subset; rtype in ALWAYS_VALID_RELATION_TYPES short-circuits.
VALID_TYPE_COMBOS = frozenset({
    (PERSON, ORGANIZATION, BELONGS_TO),
    (PERSON, ORGANIZATION, FOUNDED_BY),
    (ORGANIZATION, PRODUCT, DEVELOPS),
    (ORGANIZATION, SOFTWARE, DEVELOPS),
    (ORGANIZATION, LOCATION, BELONGS_TO),
    (CONCEPT, CONCEPT, SIMILAR_TO),
    (CONCEPT, CONCEPT, RELATED_TO),
    (PRODUCT, CONCEPT, RELATED_TO),
    (SOFTWARE, CONCEPT, RELATED_TO),
    ("database", "table", CONTAINS),
    ("table", "column", CONTAINS),
    ("column", "column", FOREIGN_KEY),
    ("document", CONCEPT, MENTIONS),
})
ALWAYS_VALID_RELATION_TYPES = frozenset({RELATED_TO, MENTIONS, DESCRIBES})

_WORD_RE = re.compile(r"\b[a-zA-Z]{3,}\b")
_SENTENCE_SPLIT_RE = re.compile(r"[.!?]+")

# "(.+?)<optional space>(?:alternatives)<optional space>" prefix shape
_TRIGGER_SHAPE_RE = re.compile(r"^\(\.\+\?\)( ?)\(\?:([^()]+)\)( ?)")
# "(.+?)<pure literal run>(" prefix shape, e.g. "(.+?) of (.+)"
_TRIGGER_LITERAL_RE = re.compile(r"^\(\.\+\?\)([^()\\\[\]+*?|{}^$.]+)\(")
# any regex metacharacter — a string without one matches itself literally
_REGEX_META_RE = re.compile(r"[\\\[\](){}+*?|^$.]")


def _required_literals(pattern_src: str) -> Optional[List[str]]:
    """Middle-literal alternatives (lowercased, with their literal
    surrounding spaces) of a ``(.+?)(?:a|b)…`` or ``(.+?)lit(…`` pattern,
    or None when the pattern doesn't have either shape / the alternatives
    aren't pure literals. One of these substrings occurring in the text
    is a NECESSARY condition for the pattern to match."""
    m = _TRIGGER_SHAPE_RE.match(pattern_src)
    if m:
        pre, body, post = m.group(1), m.group(2), m.group(3)
        alts = body.split("|")
        # literal iff no regex metacharacter (re.escape also escapes
        # spaces since 3.7, which wrongly rejected multi-word
        # alternatives like "is part of")
        if any(_REGEX_META_RE.search(a) for a in alts):
            return None
        return [f"{pre}{a.lower()}{post}" for a in alts]
    m = _TRIGGER_LITERAL_RE.match(pattern_src)
    if m:
        return [m.group(1).lower()]
    return None


@dataclass
class EntityRec:
    """One extracted entity mention/merged entity (pre-Arrow)."""
    name: str
    etype: str
    confidence: float
    source: str
    description: str = ""
    aliases: List[str] = field(default_factory=list)
    # free-form properties (reference Entity.properties,
    # agraph/entities.py:13-42); merged dict-update on dedup
    properties: Dict[str, str] = field(default_factory=dict)
    _key: str = field(default="", repr=False, compare=False)

    @property
    def key(self) -> str:
        if not self._key:
            self._key = self.name.lower().strip()
        return self._key


@dataclass
class TripleRec:
    """One (subj, pred, obj) triple with normalized endpoint names."""
    subj: str
    subj_type: str
    pred: str
    obj: str
    obj_type: str
    confidence: float
    source: str
    # reference Relation.description / .properties (agraph/relations.py:17-48)
    description: str = ""
    properties: Dict[str, str] = field(default_factory=dict)


def _entity_confidence(name: str) -> float:
    """Heuristic score (entity_extractor.py:127-154): base 0.5, +0.1 len>1,
    +0.1 len>3, +0.1 leading uppercase, -0.3 stopword; clamped to [0, 1]."""
    c = 0.5
    if len(name) > 1:
        c += 0.1
    if len(name) > 3:
        c += 0.1
    if name[0].isupper():
        c += 0.1
    if name.lower() in STOPWORDS:
        c -= 0.3
    return min(1.0, max(0.0, c))


class RuleExtractor:
    """Deterministic per-document extractor.

    Compile-once state (regexes) lives on the instance so the class can be
    used directly as a Ray Data ``map_batches`` actor-pool callable's engine
    (see stages/extract.py). All methods are pure w.r.t. the input text.
    """

    def __init__(self, confidence_threshold: float = 0.5,
                 max_keywords: int = 10,
                 max_cooc_entities_per_sentence: int = 0) -> None:
        self.confidence_threshold = confidence_threshold
        self.max_keywords = max_keywords
        # 0 = unbounded (reference behaviour); >0 caps the quadratic
        # per-sentence co-occurrence blowup (SURVEY.md §7.5 item 6).
        self.max_cooc = max_cooc_entities_per_sentence
        self.entity_patterns: List[Tuple[str, re.Pattern]] = [
            (etype, re.compile(p, re.IGNORECASE))
            for etype, pats in ENTITY_PATTERN_SPECS for p in pats
        ]
        self.relation_patterns: List[Tuple[str, re.Pattern]] = [
            (rtype, re.compile(p, re.IGNORECASE))
            for rtype, pats in RELATION_PATTERN_SPECS for p in pats
        ]
        # literal-trigger prefilter: a pattern shaped
        # "(.+?)<sp>(?:lit|lit…)<sp>…" can only match when one of its
        # middle literals (with its surrounding literal spaces) occurs in
        # the text — a C substring check vs a lazy-prefix regex scan that
        # retries from every position. None = shape not recognized, always
        # scan. EXACTNESS: skipping only when no required literal is
        # present cannot change the match set (pinned by
        # test_fixture_parity + test_trigger_prefilter_is_lossless).
        self._relation_triggers: List[Optional[List[str]]] = [
            _required_literals(p)
            for _, pats in RELATION_PATTERN_SPECS for p in pats
        ]

    # -- entities ----------------------------------------------------------

    def extract_entities(self, text: str) -> List[EntityRec]:
        """Pattern NER + frequency-keyword concepts + in-doc dedup, in the
        reference's exact order (entity_extractor.py:202-257)."""
        raw: List[EntityRec] = []
        # collapse exact (name, etype) repeats inline: a same-name
        # duplicate contributes nothing to the dedup merge (same
        # confidence, no alias, empty description/properties), and large
        # documents repeat mentions tens of thousands of times
        seen: Set[Tuple[str, str]] = set()
        for etype, pat in self.entity_patterns:
            for m in pat.finditer(text):
                name = m.group().strip()
                if len(name) < 2:
                    continue
                k2 = (name, etype)
                if k2 in seen:
                    continue
                seen.add(k2)
                conf = _entity_confidence(name)
                if conf < self.confidence_threshold:
                    continue
                raw.append(EntityRec(name, etype, conf, "text_extraction"))
        for kw in self._concept_keywords(text):
            raw.append(EntityRec(kw, CONCEPT, 0.6, "keyword_extraction"))
        return self.dedup_local(raw)

    def _concept_keywords(self, text: str) -> List[str]:
        """Words (>=3 ASCII letters, lowered) with frequency >= 2, first-seen
        order, capped (entity_extractor.py:328-351)."""
        freq: Dict[str, int] = {}
        for w in _WORD_RE.findall(text.lower()):
            if w in STOPWORDS:
                continue
            freq[w] = freq.get(w, 0) + 1
        return [w for w, n in freq.items() if n >= 2][: self.max_keywords]

    @staticmethod
    def dedup_local(entities: List[EntityRec]) -> List[EntityRec]:
        """First-wins merge keyed by lower().strip() name
        (entity_extractor.py:93-125): keep the first record's name/type,
        union aliases, keep the max confidence (and its description)."""
        by_key: Dict[str, EntityRec] = {}
        for e in entities:
            k = e.key
            kept = by_key.get(k)
            if kept is None:
                by_key[k] = e
            else:
                for a in e.aliases:
                    if a not in kept.aliases:
                        kept.aliases.append(a)
                kept.properties.update(e.properties)   # entity_extractor.py:113-115
                if e.confidence > kept.confidence:
                    kept.confidence = e.confidence
                    kept.description = e.description or kept.description
        return list(by_key.values())

    # -- relations ---------------------------------------------------------

    def extract_triples(self, text: str, entities: List[EntityRec]) -> List[TripleRec]:
        """Pattern relations (conf 0.7) + sentence co-occurrence RELATED_TO
        (conf 0.5), then validity filtering (relation_extractor.py:340-487).
        Endpoint names in the output are normalized lower().strip()."""
        out = self._pattern_triples(text, entities)
        out.extend(self._cooccurrence(text, entities))
        return [t for t in out if self._valid(t)]

    def _pattern_triples(self, text: str,
                         entities: List[EntityRec]) -> List[TripleRec]:
        entity_map: Dict[str, EntityRec] = {e.name.lower(): e for e in entities}
        out: List[TripleRec] = []

        # `.` never crosses newlines and no pattern is anchored, so a
        # match lives entirely inside one line: scanning per line yields
        # the exact match set in the same (position) order, and the
        # trigger prefilter then skips the lazy-prefix regex on every
        # line that lacks the required literal — the dominant extraction
        # cost on large documents (pinned lossless by
        # test_trigger_prefilter_is_lossless + test_fixture_parity).
        lines = text.split("\n")
        lines_l = [ln.lower() for ln in lines]

        # per-document memo: entity_map is fixed for the call, and the
        # same head/tail surface forms repeat across pattern matches —
        # the fuzzy miss path walks the whole entity map otherwise
        rcache: Dict[str, Optional[EntityRec]] = {}

        def resolve(nm: str) -> Optional[EntityRec]:
            if nm in rcache:
                return rcache[nm]
            r = self._resolve(nm, entity_map)
            rcache[nm] = r
            return r

        def emit(m: "re.Match", rtype: str) -> None:
            g = m.groups()
            if len(g) < 2 or g[0] is None or g[1] is None:
                return
            head = resolve(g[0].strip().lower())
            tail = resolve(g[1].strip().lower())
            if head is not None and tail is not None:
                out.append(TripleRec(head.key, head.etype, rtype,
                                     tail.key, tail.etype, 0.7,
                                     "text_pattern_matching"))

        for (rtype, pat), trig in zip(self.relation_patterns,
                                      self._relation_triggers):
            if trig is None:
                for m in pat.finditer(text):
                    emit(m, rtype)
                continue
            for ln, ll in zip(lines, lines_l):
                if not any(t in ll for t in trig):
                    continue
                for m in pat.finditer(ln):
                    emit(m, rtype)
        return out

    @staticmethod
    def _resolve(name: str, entity_map: Dict[str, EntityRec]) -> Optional[EntityRec]:
        """Exact then substring/alias fuzzy lookup in insertion order
        (relation_extractor.py:420-445)."""
        hit = entity_map.get(name)
        if hit is not None:
            return hit
        for ename, e in entity_map.items():
            if name in ename or ename in name:
                return e
            for alias in e.aliases:
                al = alias.lower()
                if name == al or name in al:
                    return e
        return None

    def _iter_present(self, text: str, entities: List[EntityRec]):
        """Per-sentence present-entity INDEX lists (entity order) — the
        shared core of both co-occurrence paths.

        Hot path: lowered names/aliases are cached once per document instead
        of per (sentence, entity) pair — O(sentences × entities) substring
        checks remain (the reference's own complexity), but without the
        per-check allocation."""
        lowered = [(e.name.lower(), [a.lower() for a in e.aliases])
                   for e in entities]

        # presence test per sentence: C-speed substring checks are right
        # for small vocabularies; beyond ~64 entities an Aho-Corasick
        # over names+aliases turns O(sentences x entities) scans into one
        # O(sentence) walk — same substring semantics, same entity order
        if len(lowered) >= 64:
            from ..state.textmatch import AhoCorasick
            pat2idx: Dict[str, List[int]] = {}
            for idx, (nl, al) in enumerate(lowered):
                for p in (nl, *al):
                    if p:
                        pat2idx.setdefault(p, []).append(idx)
            ac = AhoCorasick(pat2idx.keys())

            def present_in(s: str) -> List[int]:
                idxs: Set[int] = set()
                for p in ac.find_present(s):
                    idxs.update(pat2idx[p])
                return sorted(idxs)
        else:
            def present_in(s: str) -> List[int]:
                return [i for i, (nl, al) in enumerate(lowered)
                        if nl in s or (al and any(a in s for a in al))]

        for sentence in _SENTENCE_SPLIT_RE.split(text):
            s = sentence.strip().lower()
            if not s:
                continue
            present = present_in(s)
            if self.max_cooc and len(present) > self.max_cooc:
                present = present[: self.max_cooc]
            yield present

    def _cooccurrence(self, text: str, entities: List[EntityRec]) -> List[TripleRec]:
        """All same-sentence entity pairs as RELATED_TO conf 0.5
        (relation_extractor.py:447-487); optional per-sentence cap."""
        out: List[TripleRec] = []
        for present in self._iter_present(text, entities):
            for i, a in enumerate(present):
                e1 = entities[a]
                for b in present[i + 1:]:
                    e2 = entities[b]
                    out.append(TripleRec(e1.key, e1.etype, RELATED_TO,
                                         e2.key, e2.etype, 0.5, "cooccurrence"))
        return out

    def _cooccurrence_counts(self, text: str, entities: List[EntityRec]
                             ) -> "Dict[Tuple[int, int], int]":
        """Same pairs as :meth:`_cooccurrence`, pre-aggregated as
        ``{(i, j): count}`` over entity indexes (i < j, first-occurrence
        insertion order) — int dict ops instead of one TripleRec object
        per occurrence (profiled: object creation alone was ~half of
        the co-occurrence wall on the quadratic pair stream)."""
        counts: Dict[Tuple[int, int], int] = {}
        for present in self._iter_present(text, entities):
            for i, a in enumerate(present):
                for b in present[i + 1:]:
                    k = (a, b)
                    counts[k] = counts.get(k, 0) + 1
        return counts

    def _valid(self, t: TripleRec) -> bool:
        """Relation validity (relation_extractor.py:57-145): distinct
        endpoints, confidence floor, type-combination whitelist (with the
        always-valid relation-type escape hatch)."""
        if t.subj == t.obj and t.subj_type == t.obj_type:
            return False
        if t.confidence < self.confidence_threshold:
            return False
        if t.pred in ALWAYS_VALID_RELATION_TYPES:
            return True
        return (t.subj_type, t.obj_type, t.pred) in VALID_TYPE_COMBOS

    # -- fused entry point -------------------------------------------------

    def extract_agg(self, text: str
                    ) -> "Tuple[List[EntityRec], List[Tuple[TripleRec, int]]]":
        """(entities, [(triple, count)]) — identical to aggregating
        :meth:`extract`'s triple list per distinct (subj, pred, obj)
        with the max-confidence-first-seen witness rule the extraction
        stage applies anyway, but the quadratic co-occurrence stream is
        counted as int pairs instead of materialized objects (one
        TripleRec per DISTINCT pair, not per occurrence). Pinned equal
        to the object path by
        tests/test_rules.py::test_extract_agg_equals_extract."""
        ents = self.extract_entities(text)
        agg: Dict[Tuple[str, str, str], list] = {}

        def add(t: TripleRec, n: int) -> None:
            k = (t.subj, t.pred, t.obj)
            cur = agg.get(k)
            if cur is None:
                agg[k] = [t, n]
            else:
                cur[1] += n
                if t.confidence > cur[0].confidence:
                    cur[0] = t
        for t in self._pattern_triples(text, ents):
            if self._valid(t):
                add(t, 1)
        # co-occurrence validity is static: RELATED_TO is always-valid,
        # in-doc entities have distinct keys (dedup_local), conf is 0.5
        if 0.5 >= self.confidence_threshold:
            for (a, b), n in self._cooccurrence_counts(text, ents).items():
                e1, e2 = ents[a], ents[b]
                if e1.key == e2.key and e1.etype == e2.etype:
                    continue
                add(TripleRec(e1.key, e1.etype, RELATED_TO,
                              e2.key, e2.etype, 0.5, "cooccurrence"), n)
        return ents, [(t, n) for t, n in agg.values()]

    def extract(self, text: str) -> Tuple[List[EntityRec], List[TripleRec]]:
        """Single fused pass: entities then triples over the same text
        (mirrors base_builders.py:55-120 MinimalGraphBuilder flow)."""
        ents = self.extract_entities(text)
        return ents, self.extract_triples(text, ents)

"""Unit tests for the deterministic extraction rules (no Ray)."""

from agraph_ray.extract.rules import (RuleExtractor, _entity_confidence)
from agraph_ray.ids import entity_id, norm_name, relation_id


def test_confidence_constants():
    # exact heuristic of agraph/extractors/entity_extractor.py:127-154
    assert abs(_entity_confidence("a") - 0.2) < 1e-12  # len 1, stopword
    assert _entity_confidence("z") == 0.5          # len 1, lower
    assert abs(_entity_confidence("ab") - 0.6) < 1e-12         # len>1
    assert abs(_entity_confidence("abcd") - 0.7) < 1e-12       # len>3
    assert abs(_entity_confidence("Abcd") - 0.8) < 1e-12       # +capitalized
    assert abs(_entity_confidence("the") - 0.3) < 1e-12   # stopword len 3
    assert abs(_entity_confidence("With") - 0.5) < 1e-12  # stopword, cap, len>3


def test_keyword_concepts_frequency_and_cap():
    x = RuleExtractor()
    text = " ".join(["alpha"] * 3 + ["beta"] * 2 + ["gamma"])  # gamma freq 1
    kws = x._concept_keywords(text)
    assert kws == ["alpha", "beta"]
    words = [f"{a}{b}qq" for a in "abcde" for b in "abcd"]  # 20 distinct words
    many = " ".join(w for w in words for _ in range(2))     # each freq 2
    assert len(x._concept_keywords(many)) == 10  # top-10 cap


def test_entity_extraction_ignorecase_person_bigram():
    # IGNORECASE makes the PERSON bigram fire on lowercase pairs too
    x = RuleExtractor()
    ents = x.extract_entities("hello world")
    names = {e.name for e in ents}
    assert "hello world" in names


def test_dedup_first_wins_max_confidence():
    x = RuleExtractor()
    ents = x.extract_entities("Alice Johnson smiled. alice johnson waved.")
    hits = [e for e in ents if e.key == "alice johnson"]
    assert len(hits) == 1
    assert hits[0].name == "Alice Johnson"      # first-encounter name kept
    assert abs(hits[0].confidence - 0.8) < 1e-12   # max over both casings


def test_relation_pattern_and_validation():
    x = RuleExtractor()
    # belongs_to survives only when the tail resolves to an
    # organization-typed entity (validity whitelist,
    # relation_extractor.py:124-145) — verified identical to the reference
    ents, triples = x.extract("Dave works for 苹果公司.")
    keys = {(t.subj, t.pred, t.obj) for t in triples}
    assert ("dave works", "belongs_to", "苹果公司") in keys
    # cooccurrence RELATED_TO pairs exist with conf 0.5
    assert any(t.pred == "related_to" and t.confidence == 0.5 for t in triples)
    # no self-relations
    assert all(t.subj != t.obj for t in triples)
    # when both endpoints type as person, belongs_to is filtered (the
    # IGNORECASE bigram types most English names as person)
    _, t2 = x.extract("Alice Johnson works for Globex Inc.")
    assert not any(t.pred == "belongs_to" for t in t2)


def test_invalid_combo_filtered():
    x = RuleExtractor()
    # "X is similar to Y" only validates for concept-concept
    ents, triples = x.extract("Alice Johnson is similar to Globex Inc.")
    assert not any(t.pred == "similar_to" for t in triples)


def test_ids_deterministic():
    assert entity_id("Apple Inc") == entity_id("  apple inc ")
    assert entity_id("apple inc") != entity_id("apple")
    assert relation_id("a", "contains", "b") == relation_id("A ", "contains", " b")
    assert norm_name(" X ") == "x"
    import hashlib
    # exact reference scheme: entity_<md5(name)[:8]>
    assert entity_id("apple") == "entity_" + hashlib.md5(b"apple").hexdigest()[:8]


def test_trigger_prefilter_is_lossless():
    """The literal-trigger prefilter skips a relation pattern only when a
    required substring is absent — extraction output must be identical to
    a prefilter-disabled run on a large varied corpus."""
    from agraph_ray.extract.rules import RuleExtractor
    from agraph_ray.synth import ground_truth_documents
    eng = RuleExtractor()
    base = RuleExtractor()
    base._relation_triggers = [None] * len(base.relation_patterns)
    n_trig = sum(t is not None for t in eng._relation_triggers)
    assert n_trig >= len(eng.relation_patterns) * 0.6, \
        f"prefilter derived for only {n_trig} patterns"
    docs = list(ground_truth_documents(80, seed=11).values())
    docs += ["Alice works for Google. Google is part of Alphabet of X.",
             "iPhone and iPad are similar", ""]
    total = 0
    for d in docs:
        assert eng.extract(d) == base.extract(d)
        total += len(base.extract(d)[1])
    assert total > 0


def test_cooccurrence_automaton_equals_bruteforce():
    """Above the entity-count threshold _cooccurrence switches to an
    Aho-Corasick presence scan — pair output must equal the brute-force
    substring rule on entity-heavy documents (order included)."""
    from agraph_ray.extract.rules import _SENTENCE_SPLIT_RE, RuleExtractor
    from agraph_ray.synth import ground_truth_documents
    rx = RuleExtractor()
    docs = sorted(ground_truth_documents(60, seed=7).values(), key=len)
    checked_big = 0
    for t in docs[-8:] + docs[:4]:
        ents = rx.extract_entities(t)
        if len(ents) >= 64:
            checked_big += 1
        lowered = [(e, e.name.lower(), [a.lower() for a in e.aliases])
                   for e in ents]
        ref = []
        for sentence in _SENTENCE_SPLIT_RE.split(t):
            s = sentence.strip().lower()
            if not s:
                continue
            present = [e for e, nl, al in lowered
                       if nl in s or (al and any(a in s for a in al))]
            for i, e1 in enumerate(present):
                for e2 in present[i + 1:]:
                    ref.append((e1.key, e2.key))
        got = [(x.subj, x.obj) for x in rx._cooccurrence(t, ents)]
        assert got == ref
    assert checked_big >= 1, "no document exercised the automaton path"


def test_extract_agg_equals_extract():
    """extract_agg must equal aggregating extract()'s list by
    (subj, pred, obj): same distinct triples, same witnesses, same
    occurrence counts — on synthetic docs spanning both presence paths
    (substring scan < 64 entities, Aho-Corasick >= 64)."""
    from agraph_ray.extract.rules import RuleExtractor
    from agraph_ray.synth import generate_transcripts
    import glob

    import duckdb

    d = "/tmp/agg_eq_corpus"
    generate_transcripts(d, n_convs=25, seed=11, num_shards=1)
    rows = duckdb.sql(
        f"select conv_id, string_agg(text, chr(10) order by turn_idx) t "
        f"from read_parquet('{d}/*.parquet') group by conv_id").fetchall()
    ex = RuleExtractor()
    checked_big = checked_small = 0
    for _, text in rows:
        ents_a, triples = ex.extract(text)
        ents_b, agg_pairs = ex.extract_agg(text)
        assert [ (e.key, e.etype) for e in ents_a ] == \
            [ (e.key, e.etype) for e in ents_b ]
        # oracle aggregation of the object path
        want = {}
        for t in triples:
            k = (t.subj, t.pred, t.obj)
            cur = want.get(k)
            if cur is None:
                want[k] = [t, 1]
            else:
                cur[1] += 1
                if t.confidence > cur[0].confidence:
                    cur[0] = t
        got = {(t.subj, t.pred, t.obj): (t, n) for t, n in agg_pairs}
        assert set(got) == set(want)
        for k, (wt, wn) in want.items():
            gt, gn = got[k]
            assert gn == wn, k
            assert (gt.confidence, gt.subj_type, gt.obj_type, gt.source) \
                == (wt.confidence, wt.subj_type, wt.obj_type, wt.source), k
        if len(ents_a) >= 64:
            checked_big += 1
        else:
            checked_small += 1
    assert checked_big and checked_small  # both presence paths exercised

"""LLM extraction engine: prompt contract, JSON repair, type
normalization, fuzzy endpoint resolution, validity filter, and the
pairwise dedup judge — all against deterministic mock LLMs."""

import json

import pyarrow as pa
import pytest


# ---------------------------------------------------------------------------
# parse + repair
# ---------------------------------------------------------------------------

def test_parse_llm_json_clean():
    from agraph_ray.extract.llm import parse_llm_json
    content = json.dumps({"entities": [{"name": "A"}, {"name": "B"}]})
    assert [d["name"] for d in parse_llm_json(content, "entities")] == ["A", "B"]


def test_parse_llm_json_repair_fenced_and_prose():
    from agraph_ray.extract.llm import parse_llm_json
    inner = json.dumps({"entities": [{"name": "X"}]})
    fenced = f"Sure! Here you go:\n```json\n{inner}\n```\nHope this helps."
    assert [d["name"] for d in parse_llm_json(fenced, "entities")] == ["X"]
    prose = f"The result is {inner} as requested."
    assert [d["name"] for d in parse_llm_json(prose, "entities")] == ["X"]


def test_parse_llm_json_hopeless_input():
    from agraph_ray.extract.llm import parse_llm_json
    assert parse_llm_json("no json here at all", "entities") == []
    assert parse_llm_json("", "entities") == []
    assert parse_llm_json(None, "entities") == []
    assert parse_llm_json("{broken json", "entities") == []
    # valid JSON but wrong shapes
    assert parse_llm_json('["a", "b"]', "entities") == []
    assert parse_llm_json('{"entities": "nope"}', "entities") == []
    assert parse_llm_json('{"entities": [1, {"name": "ok"}]}', "entities") \
        == [{"name": "ok"}]


# ---------------------------------------------------------------------------
# type normalization
# ---------------------------------------------------------------------------

def test_entity_type_normalization():
    from agraph_ray.extract.llm import normalize_entity_type
    assert normalize_entity_type("PERSON") == "person"
    assert normalize_entity_type("people") == "person"
    assert normalize_entity_type(" Org ") == "organization"
    assert normalize_entity_type("Company") == "organization"
    assert normalize_entity_type("place") == "location"
    assert normalize_entity_type("MISC") == "other"
    assert normalize_entity_type("software") == "software"
    assert normalize_entity_type("Concept") == "concept"
    assert normalize_entity_type("gibberish") == "unknown"
    assert normalize_entity_type("") == "unknown"


def test_relation_type_normalization():
    from agraph_ray.extract.llm import normalize_relation_type
    assert normalize_relation_type("WORKS_FOR") == "works_for"
    assert normalize_relation_type("has") == "contains"
    assert normalize_relation_type("Includes") == "contains"
    assert normalize_relation_type("MEMBER_OF") == "belongs_to"
    assert normalize_relation_type("employed_by") == "works_for"
    assert normalize_relation_type("BASED_IN") == "located_in"
    assert normalize_relation_type("same_as") == "similar_to"
    assert normalize_relation_type("ASSOCIATED_WITH") == "related_to"
    assert normalize_relation_type("related_to") == "related_to"
    assert normalize_relation_type("bogus") == "other"


# ---------------------------------------------------------------------------
# engine end-to-end with a scripted mock
# ---------------------------------------------------------------------------

def _make_mock_llm():
    """Returns a self-contained closure (pickled by value, so Ray workers
    don't need to import this test module)."""
    import json as _json

    def mock_llm(prompt: str) -> str:
        if '"entities"' in prompt and '"relations"' not in prompt:
            return "```json\n" + _json.dumps({"entities": [
                {"name": "Ada Lovelace", "type": "Person",
                 "description": "mathematician", "aliases": ["Ada"]},
                {"name": "ada lovelace", "type": "CONCEPT"},   # in-doc dup
                {"name": "Analytical Engine", "type": "Product"},
                {"name": "", "type": "PERSON"},                # dropped
            ]}) + "\n```"
        return _json.dumps({"relations": [
            # fuzzy head (lowercase) + alias tail; always-valid type
            {"head_entity": "ada lovelace",
             "tail_entity": "Analytical Engine",
             "relation_type": "ASSOCIATED_WITH", "confidence": 0.9},
            # unresolvable endpoint -> dropped
            {"head_entity": "Nobody Here", "tail_entity": "Ada",
             "relation_type": "RELATED_TO", "confidence": 0.9},
            # below confidence floor -> dropped
            {"head_entity": "Ada Lovelace",
             "tail_entity": "Analytical Engine",
             "relation_type": "RELATED_TO", "confidence": 0.3},
            # normalized to a non-whitelisted combo -> dropped
            {"head_entity": "Ada Lovelace",
             "tail_entity": "Analytical Engine",
             "relation_type": "bogus", "confidence": 0.9},
        ]})

    return mock_llm


def test_llm_engine_extract():
    from agraph_ray.extract.llm import LLMExtractorEngine
    eng = LLMExtractorEngine(_make_mock_llm())
    ents, triples = eng.extract("some text")
    assert [(e.name, e.etype) for e in ents] == [
        ("Ada Lovelace", "person"), ("Analytical Engine", "product")]
    assert ents[0].aliases == ["Ada"]
    assert len(triples) == 1
    t = triples[0]
    assert (t.subj, t.pred, t.obj) == (
        "ada lovelace", "related_to", "analytical engine")
    assert t.confidence == 0.9


def test_llm_engine_failures_are_isolated():
    from agraph_ray.extract.llm import LLMExtractorEngine

    def broken(prompt):
        raise RuntimeError("provider down")

    ents, triples = LLMExtractorEngine(broken).extract("text")
    assert ents == [] and triples == []

    ents, triples = LLMExtractorEngine(lambda p: "garbage").extract("text")
    assert ents == [] and triples == []


def test_llm_engine_in_extract_stage(ray_session):
    """The engine plugs into the actor-pool extraction stage unchanged."""
    import ray.data as rd
    from agraph_ray.extract.llm import LLMExtractorEngine
    from agraph_ray.stages.extract import extract_mentions
    docs = rd.from_items([
        {"conv_id": "c1", "doc_seq": 0, "text": "whatever", "n_turns": 1}])
    rows = extract_mentions(
        docs, engine=LLMExtractorEngine(_make_mock_llm())).take_all()
    ents = [r for r in rows if r["kind"] == "entity"]
    tris = [r for r in rows if r["kind"] == "triple"]
    assert sorted(e["name"] for e in ents) == [
        "Ada Lovelace", "Analytical Engine"]
    assert {e["source"] for e in ents} == {"llm_extraction"}
    assert len(tris) == 1 and tris[0]["pred"] == "related_to"


# ---------------------------------------------------------------------------
# pairwise dedup judge
# ---------------------------------------------------------------------------

def test_pair_judge_actor(ray_session):
    import ray.data as rd
    from agraph_ray.extract.llm import LLMPairJudge

    def judge_llm(prompt: str) -> str:
        # duplicates iff the two names share a first token
        import re
        names = re.findall(r"name='([^']*)'", prompt)
        dup = bool(names) and (
            names[0].split()[0].lower() == names[1].split()[0].lower())
        return json.dumps({"is_duplicate": dup, "confidence": 0.95,
                           "reason": "mock"})

    pairs = rd.from_items([
        {"src": "e1", "dst": "e2", "name_a": "IBM Corp", "name_b": "IBM",
         "type_a": "organization", "type_b": "organization"},
        {"src": "e3", "dst": "e4", "name_a": "Apple", "name_b": "Orange",
         "type_a": "organization", "type_b": "organization"},
    ])
    out = pairs.map_batches(LLMPairJudge,
                            fn_constructor_kwargs={
                                "llm_factory": lambda: judge_llm},
                            batch_format="pyarrow",
                            concurrency=1).to_pandas()
    assert out["src"].tolist() == ["e1"]


def test_judge_match_edges_between_link_and_components(ray_session):
    """judge_match_edges drops judge-rejected pairs from the real
    link_entities output shape."""
    import ray.data as rd
    from agraph_ray.extract.llm import judge_match_edges

    def judge_llm(prompt: str) -> str:
        import re
        names = re.findall(r"name='([^']*)'", prompt)
        dup = bool(names) and "globex" in names[0] and "globex" in names[1]
        return json.dumps({"is_duplicate": dup})

    pairs = rd.from_items([
        {"src": "e1", "dst": "e2", "sim": 0.9},
        {"src": "e1", "dst": "e3", "sim": 0.8},
    ])
    nodes = rd.from_items([
        {"entity_id": "e1", "name": "globex inc", "entity_type": "organization",
         "description": "", "aliases": []},
        {"entity_id": "e2", "name": "globex incorporated",
         "entity_type": "organization", "description": "", "aliases": []},
        {"entity_id": "e3", "name": "initech", "entity_type": "organization",
         "description": "", "aliases": []},
    ])
    out = judge_match_edges(pairs, nodes, lambda: judge_llm,
                            concurrency=1).take_all()
    assert [(r["src"], r["dst"]) for r in out] == [("e1", "e2")]
    assert set(out[0]) == {"src", "dst", "sim"}


def test_pair_judge_fallback_on_garbage():
    from agraph_ray.extract.llm import parse_dedup_response
    assert parse_dedup_response("not json", "Alice", "alice") is True
    assert parse_dedup_response("not json", "Alice", "Bob") is False
    assert parse_dedup_response(
        json.dumps({"is_duplicate": True}), "x", "y") is True
    assert parse_dedup_response(
        json.dumps({"is_duplicate": False}), "same", "same") is False
    assert parse_dedup_response(None, "same", "same") is True

# ---------------------------------------------------------------------------
# full-pipeline e2e with the LLM engine plugged in
# ---------------------------------------------------------------------------

def test_llm_engine_full_pipeline(ray_session, tmp_path):
    """build_kg with engine=LLMExtractorEngine(mock) end-to-end: the LLM
    path drives reassembly → extraction → dedup → canonicalize → parquet,
    and the output graph contains exactly the mock's entities/relations
    (deduped across documents), with no dangling edges."""
    import duckdb
    from agraph_ray.config import KGConfig
    from agraph_ray.extract.llm import LLMExtractorEngine
    from agraph_ray.pipelines.kg_build import build_kg
    from agraph_ray.synth import generate_transcripts

    src = tmp_path / "in"
    out = tmp_path / "out"
    generate_transcripts(str(src), n_convs=8, seed=7, num_shards=2)
    res = build_kg(str(src), str(out),
                   KGConfig(hot_conv_turns=100, salt_span=64),
                   engine=LLMExtractorEngine(_make_mock_llm()))
    # every document yields the same 2 entities + 1 relation; global dedup
    # collapses them to exactly those 2 nodes and 1 edge
    assert res.metrics["n_documents"] == 8
    assert res.metrics["n_nodes"] == 2
    assert res.metrics["n_edges"] == 1

    con = duckdb.connect()
    names = {r[0] for r in con.sql(
        f"select name from read_parquet('{out}/nodes/*.parquet')").fetchall()}
    assert names == {"ada lovelace", "analytical engine"}
    srcs = {r[0] for r in con.sql(
        f"select source from read_parquet('{out}/nodes/*.parquet')").fetchall()}
    assert srcs == {"llm_extraction"}
    edges = con.sql(f"""
        select e.relation_type, hn.name, tn.name, e.n_mentions
        from read_parquet('{out}/edges/*.parquet') e
        join read_parquet('{out}/nodes/*.parquet') hn on e.head_id = hn.entity_id
        join read_parquet('{out}/nodes/*.parquet') tn on e.tail_id = tn.entity_id
    """).fetchall()
    assert len(edges) == 1
    rel, hname, tname, n_mentions = edges[0]
    assert (rel, hname, tname) == ("related_to", "ada lovelace",
                                   "analytical engine")
    assert n_mentions == 8   # one mention per document, summed on dedup
    # aliases survive the merge
    aliases = con.sql(f"""select aliases from read_parquet(
        '{out}/nodes/*.parquet') where name = 'ada lovelace'""").fetchone()[0]
    assert "ada" in [a.lower() for a in aliases]

"""properties (JSON string) column: extract → dedup merge → canonicalize →
export. Merge semantics: dict-update with the representative
(max-confidence) record's values winning and lower-priority records
filling in missing keys (reference entity_extractor.py:113-115, made
deterministic)."""

import json

import pyarrow as pa


def test_entity_dedup_merges_properties(ray_session):
    import ray.data as rd
    from agraph_ray.stages.dedup import dedup_entities
    rows = [
        {"kind": "entity", "conv_id": "c1", "entity_id": "e1",
         "name": "Acme", "norm_name": "acme", "entity_type": "organization",
         "description": "", "aliases": [],
         "properties": json.dumps({"hq": "Berlin", "ceo": "Ada"}),
         "confidence": 0.9, "source": "llm_extraction"},
        {"kind": "entity", "conv_id": "c2", "entity_id": "e1",
         "name": "Acme", "norm_name": "acme", "entity_type": "organization",
         "description": "", "aliases": [],
         "properties": json.dumps({"hq": "Munich", "founded": "1999"}),
         "confidence": 0.6, "source": "llm_extraction"},
        {"kind": "entity", "conv_id": "c3", "entity_id": "e2",
         "name": "NoProps", "norm_name": "noprops",
         "entity_type": "concept", "description": "", "aliases": [],
         "properties": None, "confidence": 0.7, "source": "llm_extraction"},
    ]
    nodes = {r["name"]: r
             for r in dedup_entities(rd.from_items(rows)).take_all()}
    merged = json.loads(nodes["acme"]["properties"])
    # max-confidence record's hq wins; missing key filled from the other
    assert merged == {"hq": "Berlin", "ceo": "Ada", "founded": "1999"}
    assert nodes["noprops"]["properties"] is None


def test_edge_dedup_carries_description_and_properties(ray_session):
    import ray.data as rd
    from agraph_ray.stages.dedup import dedup_edges
    rows = [
        {"kind": "triple", "conv_id": "c1", "relation_id": "r1",
         "subj": "a", "subj_type": "person", "pred": "works_for",
         "obj": "b", "obj_type": "organization", "head_id": "ea",
         "tail_id": "eb", "description": "weak", "properties": None,
         "confidence": 0.6, "source": "llm_extraction", "n_mentions": 1},
        {"kind": "triple", "conv_id": "c2", "relation_id": "r1",
         "subj": "a", "subj_type": "person", "pred": "works_for",
         "obj": "b", "obj_type": "organization", "head_id": "ea",
         "tail_id": "eb", "description": "strong",
         "properties": json.dumps({"since": "2001"}),
         "confidence": 0.9, "source": "llm_extraction", "n_mentions": 1},
    ]
    out = dedup_edges(rd.from_items(rows)).take_all()
    assert len(out) == 1
    e = out[0]
    assert e["description"] == "strong"          # max-confidence witness
    assert json.loads(e["properties"]) == {"since": "2001"}
    assert e["n_mentions"] == 2


def test_llm_properties_flow_to_nodes(ray_session):
    """properties survive the full extract → dedup path."""
    import ray.data as rd
    from agraph_ray.extract.llm import LLMExtractorEngine
    from agraph_ray.stages.dedup import dedup_entities
    from agraph_ray.stages.extract import extract_mentions

    def mock(prompt):
        if '"entities"' in prompt and '"relations"' not in prompt:
            return json.dumps({"entities": [
                {"name": "Acme Corp", "type": "ORG",
                 "properties": {"industry": "robotics"}}]})
        return json.dumps({"relations": []})

    docs = rd.from_items([
        {"conv_id": "c1", "doc_seq": 0, "text": "t", "n_turns": 1}])
    mentions = extract_mentions(docs, engine=LLMExtractorEngine(mock))
    ents = mentions.map_batches(
        lambda t: t.filter(pa.compute.equal(t["kind"], "entity")),
        batch_format="pyarrow")
    nodes = dedup_entities(ents).take_all()
    assert len(nodes) == 1
    assert json.loads(nodes[0]["properties"]) == {"industry": "robotics"}


def test_graph_json_includes_properties(ray_session, tmp_path):
    import ray.data as rd
    from agraph_ray.ops.misc import write_graph_json
    nodes = rd.from_items([{
        "entity_id": "e1", "name": "acme", "entity_type": "organization",
        "description": "", "aliases": [],
        "properties": json.dumps({"hq": "Berlin"}),
        "confidence": 0.9, "source": "s"}])
    edges = rd.from_items([{
        "relation_id": "r1", "head_id": "e1", "tail_id": "e1",
        "relation_type": "related_to", "description": "d",
        "properties": json.dumps({"k": "v"}),
        "confidence": 0.5, "source": "s"}])
    path = str(tmp_path / "graph.json")
    write_graph_json(nodes, edges, path)
    doc = json.load(open(path))
    assert doc["entities"]["e1"]["properties"] == {"hq": "Berlin"}
    assert doc["relations"]["r1"]["properties"] == {"k": "v"}
    assert doc["relations"]["r1"]["description"] == "d"

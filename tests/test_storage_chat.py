"""storage load/backup/restore, KGConfig.from_env, ChatRetriever tests."""

import os

import pytest


def test_load_and_backup_restore(kg_out, tmp_path):
    from agraph_ray.storage import backup_graph, load_graph, restore_graph
    tables = load_graph(kg_out.out_dir)
    assert {"nodes", "edges", "triples", "documents", "mentions"} <= set(tables)
    n = tables["nodes"].count()
    assert n == kg_out.metrics["n_nodes"]

    b = backup_graph(kg_out.out_dir, str(tmp_path / "bak"))
    assert os.path.exists(os.path.join(b, "BACKUP_MANIFEST.json"))

    # clobber then restore
    target = str(tmp_path / "restored")
    restore_graph(b, target)
    t2 = load_graph(target)
    assert t2["nodes"].count() == n


def test_config_from_env(monkeypatch):
    from agraph_ray.config import KGConfig
    monkeypatch.setenv("AGRAPH_CHUNK_SIZE", "256")
    monkeypatch.setenv("AGRAPH_LINK_THRESHOLD", "0.9")
    monkeypatch.setenv("AGRAPH_TURN_SEPARATOR", "|")
    cfg = KGConfig.from_env()
    assert cfg.chunk_size == 256
    assert cfg.link_threshold == 0.9
    assert cfg.turn_separator == "|"
    # explicit override wins
    assert KGConfig.from_env(chunk_size=99).chunk_size == 99


def test_chat_retriever(ray_session, kg_out):
    import ray.data as rd
    from agraph_ray.retrieval import ChatRetriever, KnowledgeRetriever
    nodes = rd.read_parquet(kg_out.tables["nodes"])
    edges = rd.read_parquet(kg_out.tables["edges"])
    kr = KnowledgeRetriever(nodes=nodes, edges=edges)

    bot = ChatRetriever(kr)          # no LLM -> returns assembled context
    ctx = bot.chat("who works at google?")
    assert "Knowledge Graph(KG)" in ctx and "who works at google?" in ctx

    calls = []

    def fake_llm(prompt: str) -> str:
        calls.append(prompt)
        return "the answer"

    bot2 = ChatRetriever(kr, llm=fake_llm)
    assert bot2.chat("q1") == "the answer"
    assert len(calls) == 1 and "q1" in calls[0]
    bot2.chat("q2")
    assert "user: q1" in calls[1]    # history threads through


def test_search_knowledge_enhanced(ray_session):
    """Chunks linked to retrieved entities surface with connection-strength
    scores even when embedding similarity alone would miss them
    (knowledge_retriever.py:315-453)."""
    import ray.data as rd
    from agraph_ray.retrieval import ChatRetriever, KnowledgeRetriever
    nodes = rd.from_items([
        {"entity_id": "e_g", "name": "google", "entity_type": "organization",
         "description": "", "aliases": [], "confidence": 0.9},
        {"entity_id": "e_a", "name": "alice johnson", "entity_type": "person",
         "description": "", "aliases": [], "confidence": 0.9},
    ])
    edges = rd.from_items([
        {"relation_id": "r1", "subj": "alice johnson",
         "relation_type": "works_for", "obj": "google", "confidence": 0.9,
         "head_id": "e_a", "tail_id": "e_g"},
    ])
    chunks = rd.from_items([
        # linked to the google entity but with text dissimilar to the query
        {"chunk_id": "c_linked", "conv_id": "1", "chunk_type": "chunk",
         "source": "", "text": "zzz qqq unrelated words entirely",
         "entities": ["e_g"], "relations": []},
        # retrieved by similarity and linked to both
        {"chunk_id": "c_sim", "conv_id": "2", "chunk_type": "chunk",
         "source": "", "text": "alice johnson works for google",
         "entities": ["e_a", "e_g"], "relations": ["r1"]},
    ])
    kr = KnowledgeRetriever(nodes=nodes, edges=edges, chunks=chunks)
    # threshold between the two chunks' cosine scores (hash embeddings are
    # not semantic, so don't assume which chunk scores higher): the
    # below-threshold chunk is dropped by similarity and must come back
    # through the connected-chunk expansion with a CONNECTION score
    basic = kr.search_knowledge("google alice johnson", top_k=5)
    scores = {c["chunk_id"]: c["score"] for c in basic["text_chunks"]}
    lo_id = min(scores, key=scores.get)
    thr = (max(scores.values()) + min(scores.values())) / 2
    res = kr.search_knowledge_enhanced("google alice johnson", top_k=5,
                                       similarity_threshold=thr)
    by_id = {c["chunk_id"]: c for c in res["text_chunks"]}
    assert lo_id in by_id            # surfaced via the link, not text sim
    assert 0.0 < by_id[lo_id]["score"] <= 1.0
    # the re-added chunk carries the connection-strength score, not cosine
    expected = kr._chunk_relevance(lo_id, res["entities"], res["relations"])
    assert abs(by_id[lo_id]["score"] - expected) < 1e-9
    assert by_id[lo_id]["score"] != scores[lo_id]
    bot = ChatRetriever(kr)
    ctx = bot.chat_enhanced("google alice johnson")
    assert "Document Chunks" in ctx


def test_chunk_relevance_formula(ray_session):
    """Hand-computed reference formula (knowledge_retriever.py:401-453)."""
    import ray.data as rd
    from agraph_ray.retrieval import KnowledgeRetriever
    chunks = rd.from_items([
        {"chunk_id": "c1", "conv_id": "1", "chunk_type": "chunk",
         "source": "", "text": "t", "entities": ["e1", "e2"],
         "relations": ["r1"]}])
    kr = KnowledgeRetriever(chunks=chunks)
    ents = [{"entity_id": "e1", "score": 0.9},
            {"entity_id": "e2", "score": 0.5},
            {"entity_id": "e_other", "score": 0.99}]
    rels = [{"relation_id": "r1", "score": 0.6}]
    # avg_e = 0.7 over 2 connections, avg_r = 0.6 over 1; weights 2/3, 1/3
    # boost = 3/5 -> final = (0.7*2/3 + 0.6*1/3) * (0.5 + 0.5*0.6)
    expected = (0.7 * 2 / 3 + 0.6 * 1 / 3) * 0.8
    got = kr._chunk_relevance("c1", ents, rels)
    assert abs(got - expected) < 1e-9
    assert kr._chunk_relevance("c1", [], []) == 0.0
    assert kr._chunk_relevance("missing", ents, rels) == 0.0


def test_chunk_listing_surface(ray_session):
    """By-type / by-source chunk listings (knowledge_retriever.py:507-558)."""
    import ray.data as rd
    from agraph_ray.retrieval import KnowledgeRetriever
    chunks = rd.from_items([
        {"chunk_id": "c1", "conv_id": "1", "chunk_type": "chunk",
         "source": "a.md", "text": "t1"},
        {"chunk_id": "c2", "conv_id": "1", "chunk_type": "summary",
         "source": "a.md", "text": "t2"},
        {"chunk_id": "c3", "conv_id": "2", "chunk_type": "chunk",
         "source": "b.md", "text": "t3"},
    ])
    kr = KnowledgeRetriever(chunks=chunks)
    by_type = kr.search_text_chunks_by_type("chunk", top_k=10)
    assert sorted(c["chunk_id"] for c in by_type) == ["c1", "c3"]
    by_src = kr.search_text_chunks_by_source("a.md", top_k=10)
    assert sorted(c["chunk_id"] for c in by_src) == ["c1", "c2"]
    both = kr.list_chunks(chunk_type="chunk", source="a.md")
    assert [c["chunk_id"] for c in both] == ["c1"]
    assert len(kr.search_text_chunks_by_type("chunk", top_k=1)) == 1
    assert kr.search_text_chunks_by_source("missing.md") == []

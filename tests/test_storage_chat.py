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

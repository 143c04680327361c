"""Preference-pair construction (ops/preference.py)."""

import pandas as pd


def _turns(rows):
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                       "text"])


def test_extract_qa_pairs_adjacency(ray_session):
    import ray.data as rd
    from agraph_ray.ops.preference import extract_qa_pairs
    df = _turns([
        ("c1", 0, "user", "q1"), ("c1", 1, "assistant", "a1"),
        ("c1", 2, "user", "q2"), ("c1", 3, "assistant", "a2"),
        # gap in turn_idx → not adjacent, no pair
        ("c2", 0, "user", "q3"), ("c2", 2, "assistant", "a3"),
        # assistant first → no pair
        ("c3", 0, "assistant", "a4"), ("c3", 1, "user", "q4"),
        # system turn between → no pair for q5
        ("c4", 0, "user", "q5"), ("c4", 1, "system", "s"),
        ("c4", 2, "assistant", "a5"),
    ])
    out = (extract_qa_pairs(rd.from_pandas(df).repartition(3))
           .to_pandas().sort_values("prompt").reset_index(drop=True))
    assert list(out["prompt"]) == ["q1", "q2"]
    assert list(out["response"]) == ["a1", "a2"]


def test_preference_pairs_rule(ray_session):
    import ray.data as rd
    from agraph_ray.ops.preference import preference_pairs
    df = _turns([
        # prompt "p": three distinct responses, lengths 1/3/3
        ("c1", 0, "user", "p"), ("c1", 1, "assistant", "x"),
        ("c2", 0, "user", "p"), ("c2", 1, "assistant", "bbb"),
        ("c3", 0, "user", "p"), ("c3", 1, "assistant", "aaa"),
        # duplicate (p, bbb) pair — must not inflate n_candidates
        ("c4", 0, "user", "p"), ("c4", 1, "assistant", "bbb"),
        # prompt "q": single distinct response → dropped
        ("c5", 0, "user", "q"), ("c5", 1, "assistant", "only"),
        ("c6", 0, "user", "q"), ("c6", 1, "assistant", "only"),
    ])
    out = (preference_pairs(rd.from_pandas(df).repartition(4))
           .to_pandas())
    assert len(out) == 1
    r = out.iloc[0]
    assert r["prompt"] == "p"
    # longest wins; len-3 tie between aaa/bbb → lexicographically greatest
    assert r["chosen"] == "bbb"
    assert r["rejected"] == "x"
    assert r["n_candidates"] == 3


def test_preference_pairs_partition_invariant(ray_session):
    import ray.data as rd
    from agraph_ray.ops.preference import preference_pairs
    rows = []
    for c in range(30):
        prompt = f"prompt-{c % 5}"
        rows.append((f"c{c}", 0, "user", prompt))
        rows.append((f"c{c}", 1, "assistant", f"resp-{c:02d}" * (c % 3 + 1)))
    df = _turns(rows)
    outs = []
    for parts in (1, 7):
        out = (preference_pairs(rd.from_pandas(df).repartition(parts),
                                num_buckets=5)
               .to_pandas().sort_values("prompt").reset_index(drop=True))
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert (outs[0]["n_candidates"] == 6).all()


def test_add_synthetic_tools_rule(ray_session):
    import ray.data as rd
    from agraph_ray.synth import add_synthetic_tools
    df = pd.DataFrame({
        "conv_id": ["c"] * 4, "turn_idx": [0, 1, 2, 3],
        "role": ["user", "assistant", "user", "assistant"],
        "text": ["abc", "abc", "x", "abcd"],  # (1+3)%4=0, (3+4)%4=3
        "tool": [""] * 4,
        "ts": pd.to_datetime([0, 1, 2, 3], unit="s"),
    })
    out = (add_synthetic_tools(rd.from_pandas(df)).to_pandas()
           .sort_values("turn_idx"))
    assert list(out["tool"]) == ["", "search", "", ""]


def test_truncate_context_suffix_rule(ray_session):
    import ray.data as rd
    from agraph_ray.stages.reassemble import truncate_context
    df = _turns([
        # tokens per turn: 3, 2, 4, 1  → suffix sums from the end:
        # t3=1, t2=5, t1=7, t0=10
        ("c1", 0, "user", "a b c"), ("c1", 1, "assistant", "d e"),
        ("c1", 2, "user", "f g h i"), ("c1", 3, "assistant", "j"),
        ("c2", 0, "user", "lone"),
    ])
    out = (truncate_context(rd.from_pandas(df).repartition(3), max_tokens=5)
           .to_pandas().sort_values(["conv_id", "turn_idx"])
           .reset_index(drop=True))
    # c1 keeps turns 2,3 (4+1=5 <= 5); turn 1 would make 7. c2 keeps all.
    assert [(r.conv_id, r.turn_idx) for r in out.itertuples()] == [
        ("c1", 2), ("c1", 3), ("c2", 0)]


def test_validate_conversations_flags(ray_session):
    import ray.data as rd
    from agraph_ray.stages.reassemble import validate_conversations
    df = _turns([
        ("ok", 0, "user", "hi"), ("ok", 1, "assistant", "yo"),
        # double-assistant + gap + empty + assistant-first
        ("bad", 1, "assistant", "x"), ("bad", 2, "assistant", ""),
        ("bad", 4, "user", "y"),
    ])
    out = (validate_conversations(rd.from_pandas(df).repartition(2))
           .to_pandas().set_index("conv_id"))
    ok = out.loc["ok"]
    assert (ok["is_wellformed"], ok["n_turns"]) == (1, 2)
    bad = out.loc["bad"]
    assert bad["n_alternation_violations"] == 1   # asst -> asst
    assert bad["n_gaps"] == 1                     # 2 -> 4
    assert bad["n_empty_turns"] == 1
    assert bad["starts_ok"] == 0                  # first idx 1, role asst
    assert bad["is_wellformed"] == 0


def test_segment_conversations_windows(ray_session):
    import numpy as np
    import ray.data as rd
    from agraph_ray.stages.reassemble import segment_conversations
    # conv a: 7 turns, window 4, stride 2 → segs [0..3],[2..5],[4..6]
    # conv b: 3 turns (< window) → one short seg
    rows = [("a", i, "user" if i % 2 == 0 else "assistant", f"t{i}")
            for i in range(7)]
    rows += [("b", i, "user", f"u{i}") for i in range(3)]
    df = _turns(rows)
    out = (segment_conversations(rd.from_pandas(df).repartition(3),
                                 window_turns=4, stride=2)
           .to_pandas().sort_values(["conv_id", "seg_id"])
           .reset_index(drop=True))
    a = out[out["conv_id"] == "a"]
    assert list(a["seg_id"]) == [0, 1, 2]
    assert list(a["text"]) == ["t0\nt1\nt2\nt3", "t2\nt3\nt4\nt5",
                               "t4\nt5\nt6"]
    assert list(a["first_turn_idx"]) == [0, 2, 4]
    b = out[out["conv_id"] == "b"]
    assert list(b["text"]) == ["u0\nu1\nu2"]
    assert list(b["seg_id"]) == [0]


def test_segment_conversations_partition_invariant(ray_session):
    import ray.data as rd
    from agraph_ray.stages.reassemble import segment_conversations
    rows = []
    for c in range(12):
        for i in range(c + 1):
            rows.append((f"c{c:02d}", i, "user", f"{c}:{i}"))
    df = _turns(rows)
    outs = []
    for parts in (1, 5):
        out = (segment_conversations(rd.from_pandas(df).repartition(parts),
                                     window_turns=5, stride=3,
                                     num_buckets=4)
               .to_pandas().sort_values(["conv_id", "seg_id"])
               .reset_index(drop=True))
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # a 12-turn conv with window 5 stride 3: 1 + ceil(7/3) = 4 segments
    assert (outs[0][outs[0]["conv_id"] == "c11"]["seg_id"].to_list()
            == [0, 1, 2, 3])


def test_curate_conversations_fused_equals_composed(ray_session):
    import numpy as np
    import ray.data as rd
    from agraph_ray.ops.join import cogroup_join
    from agraph_ray.stages.reassemble import (
        curate_conversations, render_chat, truncate_context,
        validate_conversations)
    rng = np.random.default_rng(5)
    rows = []
    for c in range(25):
        n = int(rng.integers(1, 12))
        for i in range(n):
            idx = i + (1 if c % 7 == 0 else 0)          # some start at 1
            role = ("user" if (i + (c % 5 == 0)) % 2 == 0
                    else "assistant")                    # some asst-first
            txt = "" if (c % 11 == 0 and i == 2) else (
                f"w{c}:{i} " * int(rng.integers(1, 6))).strip()
            rows.append((f"c{c:02d}", idx, role, txt))
    df = _turns(rows)
    ds = rd.from_pandas(df).repartition(4)

    fused = (curate_conversations(ds, max_tokens=12)
             .to_pandas().sort_values("conv_id").reset_index(drop=True))

    wf = (validate_conversations(ds).filter(expr="is_wellformed == 1")
          .select_columns(["conv_id"]))
    kept = cogroup_join(ds.select_columns(
        ["conv_id", "turn_idx", "role", "text"]), wf,
        on=["conv_id"], how="semi")
    composed = (render_chat(truncate_context(kept, max_tokens=12))
                .to_pandas().sort_values("conv_id")
                .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        fused.astype({"doc_seq": "int64"}),
        composed.astype({"doc_seq": "int64"}))
    assert len(fused) > 0


def test_deterministic_shuffle_properties(ray_session):
    import ray.data as rd
    from agraph_ray.ops.stats import deterministic_shuffle
    df = pd.DataFrame({"doc_id": list(range(40))})
    a = (deterministic_shuffle(rd.from_pandas(df).repartition(1), "doc_id",
                               seed=7).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (deterministic_shuffle(rd.from_pandas(df).repartition(6), "doc_id",
                               seed=7).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)          # partition-invariant
    ranks = sorted(a["shuffle_rank"])
    assert ranks == list(range(1, 41))           # dense permutation
    c = (deterministic_shuffle(rd.from_pandas(df), "doc_id", seed=8)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert (a["shuffle_rank"] != c["shuffle_rank"]).any()  # seed matters


def test_job_entrypoint_resumable(ray_session, tmp_path):
    """python -m agraph_ray.job contract: runs in an existing Ray session,
    writes tables + manifests, and a resubmit skips every partition."""
    import json as _json
    from agraph_ray.job import main
    from agraph_ray.synth import generate_transcripts
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    generate_transcripts(inp, n_convs=12, seed=3, num_shards=4, skew=False)
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["--input", inp, "--output", out, "--resumable",
                   "--shards-per-partition", "2"])
    assert rc == 0
    first = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert first["metrics"]["n_triples"] > 0
    assert first["metrics"]["skipped"] == 0
    buf2 = io.StringIO()
    with redirect_stdout(buf2):
        rc = main(["--input", inp, "--output", out, "--resumable",
                   "--shards-per-partition", "2"])
    second = _json.loads(buf2.getvalue().strip().splitlines()[-1])
    assert rc == 0
    assert second["metrics"]["skipped"] == second["metrics"]["n_partitions"]
    assert second["metrics"]["n_triples"] == first["metrics"]["n_triples"]


def test_normalize_text_rules(ray_session):
    import pyarrow as pa
    from agraph_ray.ops.text import normalize_text
    t = pa.table({"doc_id": [1, 2, 3],
                  "text": ["  a\t\nb  c ", "éclair", None]})
    out = normalize_text(t)["norm_text"].to_pylist()
    assert out == ["a b c", "éclair", ""]


def test_triple_prf_hand_case(ray_session):
    import ray.data as rd
    from agraph_ray.ops.eval import triple_prf
    pred = pd.DataFrame({
        "doc_id": [1, 1, 1, 2],
        "subj": ["a", "a", "b", "q"],
        "relation_type": ["r", "r", "r", "r"],   # (1,a,r,c) duplicated
        "obj": ["c", "c", "d", "z"],
    })
    gold = pd.DataFrame({
        "doc_id": [1, 1, 3],
        "subj": ["a", "x", "m"],
        "relation_type": ["r", "r", "r"],
        "obj": ["c", "y", "n"],
    })
    out = (triple_prf(rd.from_pandas(pred).repartition(2),
                      rd.from_pandas(gold).repartition(2))
           .to_pandas().set_index("doc_id").sort_index())
    # doc 1: distinct pred {(a,r,c),(b,r,d)}, gold {(a,r,c),(x,r,y)}
    assert tuple(out.loc[1][["tp", "fp", "fn"]]) == (1, 1, 1)
    assert out.loc[1]["precision_ppm"] == 500000
    # doc 2: pred-only
    assert tuple(out.loc[2][["tp", "fp", "fn"]]) == (0, 1, 0)
    assert out.loc[2]["recall_ppm"] == 0
    # doc 3: gold-only
    assert tuple(out.loc[3][["tp", "fp", "fn"]]) == (0, 0, 1)


def test_cluster_pair_prf_hand_case(ray_session):
    import ray.data as rd
    from agraph_ray.ops.eval import cluster_pair_prf
    # pred {a,b,c}{d}; gold {a,b}{c,d}
    df = pd.DataFrame({"pred_cluster": [0, 0, 0, 1],
                       "gold_cluster": [10, 10, 11, 11],
                       "id": ["a", "b", "c", "d"]})
    out = cluster_pair_prf(rd.from_pandas(df).repartition(3)).to_pandas()
    r = out.iloc[0]
    # pred pairs: C(3,2)+C(1,2)=3; gold pairs: 1+1=2; tp: (a,b) only = 1
    assert (r["tp_pairs"], r["pred_pairs"], r["gold_pairs"]) == (1, 3, 2)
    assert r["precision_ppm"] == 333333
    assert r["recall_ppm"] == 500000


def test_exact_dedup_by_keep_rule(ray_session):
    import ray.data as rd
    from agraph_ray.ops.dedup import exact_dedup_by
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["x", "x", "x", "y", "y"],
        "quality": [5, 9, 9, 1, 1],
    })
    out = (exact_dedup_by(rd.from_pandas(df).repartition(3),
                          keep_cols=["quality"], ascending=[False])
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # x: max quality 9 tie between ids 2,3 → min id 2. y: tie → id 4.
    assert sorted(out["doc_id"]) == [2, 4]


def test_unroll_sft_examples_window_rule(ray_session):
    import ray.data as rd
    from agraph_ray.stages.reassemble import unroll_sft_examples
    df = _turns([
        ("c1", 0, "user", "u0"), ("c1", 1, "assistant", "a1"),
        ("c1", 2, "user", "u2"), ("c1", 3, "assistant", "a3"),
        ("c1", 4, "user", "u4"), ("c1", 5, "assistant", "a5"),
        # single-turn assistant-only conversation → empty context
        ("c2", 0, "assistant", "solo"),
    ])
    out = (unroll_sft_examples(rd.from_pandas(df).repartition(3),
                               context_turns=2)
           .to_pandas().sort_values(["conv_id", "turn_idx"])
           .reset_index(drop=True))
    assert list(out["response"]) == ["a1", "a3", "a5", "solo"]
    # context = previous min(2, pos) turns rendered, oldest first
    assert out.loc[0, "context"] == "<|user|>u0"
    assert out.loc[1, "context"] == "<|assistant|>a1\n<|user|>u2"
    assert out.loc[2, "context"] == "<|assistant|>a3\n<|user|>u4"
    assert out.loc[3, "context"] == ""
    assert list(out["n_context_turns"]) == [1, 2, 2, 0]


def test_unroll_sft_examples_partition_invariant(ray_session):
    import ray.data as rd
    from agraph_ray.stages.reassemble import unroll_sft_examples
    rows = []
    for c in range(12):
        for i in range(6):
            rows.append((f"c{c}", i, "user" if i % 2 == 0 else "assistant",
                         f"t{c}-{i}"))
    df = _turns(rows)
    outs = []
    for parts in (1, 7):
        out = (unroll_sft_examples(rd.from_pandas(df).repartition(parts),
                                   context_turns=3)
               .to_pandas().sort_values(["conv_id", "turn_idx"])
               .reset_index(drop=True))
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_mention_timeline_hand_case(ray_session):
    import ray.data as rd
    from agraph_ray.stages.link_chunks import mention_timeline
    turns = pd.DataFrame({
        "conv_id": ["c1", "c1", "c2", "c3"],
        "text": ["Spark and spark again",   # 1 turn, counted once
                 "spark beats flink",
                 "SPARK!",
                 "nothing here"],
        "ts": pd.to_datetime([1_000, 2_000, 3_000, 4_000], unit="s"),
    })
    nodes = rd.from_items([
        {"entity_id": "e1", "name": "Spark", "aliases": ["apache spark"]},
        {"entity_id": "e2", "name": "flink", "aliases": []},
        {"entity_id": "e3", "name": "absent", "aliases": []},
    ])
    out = (mention_timeline(rd.from_pandas(turns).repartition(3), nodes)
           .to_pandas().sort_values("entity_id").reset_index(drop=True))
    assert list(out["entity_id"]) == ["e1", "e2"]
    e1 = out.iloc[0]
    # 3 mentioning turns (per-turn containment, repeats collapse),
    # 2 distinct conversations, first/last mention ts in epoch-us
    assert (e1["mentions"], e1["n_convs"]) == (3, 2)
    assert (e1["first_us"], e1["last_us"]) == (1_000_000_000, 3_000_000_000)
    e2 = out.iloc[1]
    assert (e2["mentions"], e2["n_convs"]) == (1, 1)


def test_comention_edges_hand_case(ray_session):
    import ray.data as rd
    from agraph_ray.stages.link_chunks import comention_edges
    turns = pd.DataFrame({
        "conv_id": ["c1", "c1", "c1", "c2", "c3"],
        "text": ["spark rules", "flink and spark", "flink here",
                 "spark with flink", "only spark"],
    })
    nodes = rd.from_items([
        {"entity_id": "e_spark", "name": "spark", "aliases": []},
        {"entity_id": "e_flink", "name": "flink", "aliases": []},
        {"entity_id": "e_beam", "name": "beam", "aliases": []},
    ])
    out = (comention_edges(rd.from_pandas(turns).repartition(3), nodes)
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    # c1 and c2 co-mention spark+flink (per-conv distinct, repeats
    # collapse); c3 mentions only spark; beam never appears
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["a"], r["b"], r["n_convs"]) == ("e_flink", "e_spark", 2)


def test_pseudonymize_plan_and_apply(ray_session):
    import ray.data as rd
    from agraph_ray.stages.link_chunks import (apply_pseudonyms,
                                               speaker_pseudonym_plan)
    turns = pd.DataFrame({
        "conv_id": ["c1", "c1", "c2", "c2"],
        "turn_idx": [0, 1, 0, 1],
        "text": ["Bob met someone",            # c1: Bob first (turn 0)
                 "alice johnson and BOB again",
                 "Alice Johnson opened",        # c2: Alice Johnson first
                 "then bob arrived"],
    })
    nodes = rd.from_items([
        {"entity_id": "e1", "name": "Alice Johnson", "aliases": []},
        {"entity_id": "e2", "name": "Bob", "aliases": []},
    ])
    tds = rd.from_pandas(turns).repartition(3)
    plan = speaker_pseudonym_plan(tds, nodes, prefix="PERSON_")
    p = plan.to_pandas().sort_values(["conv_id", "placeholder"])
    got = list(zip(p["conv_id"], p["name"], p["placeholder"]))
    # first-appearance numbering is PER conversation
    assert got == [("c1", "Bob", "PERSON_1"),
                   ("c1", "Alice Johnson", "PERSON_2"),
                   ("c2", "Alice Johnson", "PERSON_1"),
                   ("c2", "Bob", "PERSON_2")]
    out = (apply_pseudonyms(tds, plan)
           .to_pandas().sort_values(["conv_id", "turn_idx"])
           .reset_index(drop=True))
    # case-insensitive rewrite; longest name first
    assert list(out["text"]) == [
        "PERSON_1 met someone", "PERSON_2 and PERSON_1 again",
        "PERSON_1 opened", "then PERSON_2 arrived"]


def test_unroll_and_render_null_text(ray_session):
    """Null turn text is pinned to '' — it renders as an empty turn and
    stays in downstream contexts instead of silently vanishing."""
    import ray.data as rd
    from agraph_ray.stages.reassemble import render_chat, unroll_sft_examples
    df = pd.DataFrame({"conv_id": ["c", "c", "c"],
                       "turn_idx": [0, 1, 2],
                       "role": ["user", "assistant", "assistant"],
                       "text": ["hi", None, "ok"]})
    out = (unroll_sft_examples(rd.from_pandas(df), context_turns=2)
           .to_pandas().sort_values("turn_idx").reset_index(drop=True))
    assert list(out["response"]) == ["", "ok"]
    assert out.loc[1, "context"] == "<|user|>hi\n<|assistant|>"
    r = render_chat(rd.from_pandas(df)).to_pandas()
    assert r.iloc[0]["text"] == "<|user|>hi<|assistant|><|assistant|>ok"
    assert r.iloc[0]["assistant_chars"] == 2

"""Property-based tests (hypothesis) for the pure-function core, plus
seeded randomized cross-checks of the distributed reductions against
brute-force implementations."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# pure functions — hypothesis
# ---------------------------------------------------------------------------

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=2000)


@settings(max_examples=50, deadline=None)
@given(text_strategy)
def test_chunker_bounds(text):
    from agraph_ray.stages.chunk import ApproxTokenChunker
    ch = ApproxTokenChunker(chunk_size=64, chunk_overlap=16)
    chunks = ch.split_text(text)
    for c in chunks:
        assert c.strip()
        assert ch.count_tokens(c) <= 64 + 16
    # determinism
    assert chunks == ch.split_text(text)


@settings(max_examples=50, deadline=None)
@given(text_strategy)
def test_extractor_deterministic_and_bounded(text):
    from agraph_ray.extract.rules import RuleExtractor
    rx = RuleExtractor()
    e1, t1 = rx.extract(text)
    e2, t2 = rx.extract(text)
    assert [(x.name, x.etype, x.confidence) for x in e1] == \
        [(x.name, x.etype, x.confidence) for x in e2]
    assert [(x.subj, x.pred, x.obj) for x in t1] == \
        [(x.subj, x.pred, x.obj) for x in t2]
    for e in e1:
        assert 0.0 <= e.confidence <= 1.0
    for t in t1:
        assert t.confidence >= rx.confidence_threshold
        assert not (t.subj == t.obj and t.subj_type == t.obj_type)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=100))
def test_ids_deterministic(name):
    from agraph_ray.ids import entity_id, norm_name, relation_id
    assert entity_id(name) == entity_id(name)
    assert entity_id(name) == entity_id(norm_name(name))  # normalization
    assert entity_id(name).startswith("entity_")
    assert len(entity_id(name)) == len("entity_") + 8
    rid = relation_id(name, "related_to", name + "x")
    assert rid == relation_id(name, "related_to", name + "x")
    assert rid.startswith("relation_")


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["alpha", "Beta", "GAMMA d"]),
                          st.floats(0.0, 1.0)), min_size=1, max_size=30),
       st.randoms())
def test_entity_partial_order_invariant(rows, rnd):
    """The per-batch entity combiner must not depend on row order."""
    from agraph_ray.stages.dedup import _entity_partial

    def mk(rows):
        return pa.Table.from_pylist([{
            "kind": "entity", "conv_id": "c", "doc_seq": 0,
            "entity_id": f"entity_{n.lower()}", "name": n,
            "norm_name": n.lower().strip(), "entity_type": "concept",
            "description": "", "aliases": [], "confidence": c,
            "source": "s", "n_mentions": 1, "n_convs": 1,
        } for n, c in rows])

    shuffled = list(rows)
    rnd.shuffle(shuffled)
    a = _entity_partial(mk(rows)).to_pandas()
    b = _entity_partial(mk(shuffled)).to_pandas()
    key = ["norm_name", "confidence", "n_mentions"]
    pd.testing.assert_frame_equal(
        a[key].sort_values(key).reset_index(drop=True),
        b[key].sort_values(key).reset_index(drop=True))


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=200))
def test_markdown_strip_idempotent_on_plain(s):
    from agraph_ray.ops.parse import parse_text
    assert parse_text(parse_text(s)) == parse_text(s)


# ---------------------------------------------------------------------------
# distributed reductions vs brute force — seeded randomized
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 1, 2])
def test_sessionize_matches_bruteforce(ray_session, seed):
    import ray.data as rd
    from agraph_ray.ops.window import sessionize
    rng = np.random.default_rng(seed)
    n = 300
    users = rng.integers(0, 10, n)
    ts = rng.integers(0, 10_000, n) * 1_000_000   # µs
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
    }))
    got = (sessionize(ds, "user_id", "ts", gap_sec=600)
           .to_pandas().sort_values(["user_id", "session_id"])
           .reset_index(drop=True))

    rows = []
    df = pd.DataFrame({"u": users, "t": ts}).sort_values(["u", "t"])
    for u, g in df.groupby("u"):
        sid, start, last, cnt = 0, None, None, 0
        for t in g["t"]:
            if start is None:
                start, last, cnt = t, t, 1
            elif t - last > 600 * 1_000_000:
                rows.append((u, sid, cnt, start, last))
                sid += 1
                start, last, cnt = t, t, 1
            else:
                last, cnt = t, cnt + 1
        rows.append((u, sid, cnt, start, last))
    want = pd.DataFrame(rows, columns=["user_id", "session_id", "n_events",
                                       "session_start", "session_end"])
    got2 = got[["user_id", "session_id", "n_events", "session_start",
                "session_end"]].astype("int64")
    pd.testing.assert_frame_equal(got2, want.astype("int64"))


@pytest.mark.parametrize("seed", [0, 1])
def test_cogroup_join_matches_pandas(ray_session, seed):
    import ray.data as rd
    from agraph_ray.ops.join import cogroup_join
    rng = np.random.default_rng(seed)
    l = pd.DataFrame({"k": rng.integers(0, 20, 50),
                      "lv": rng.integers(0, 100, 50)})
    r = pd.DataFrame({"k": rng.integers(0, 20, 30),
                      "rv": rng.integers(0, 100, 30)})
    ld, rdd = rd.from_pandas(l), rd.from_pandas(r)
    for how in ["inner", "left", "semi", "anti"]:
        got = cogroup_join(ld, rdd, on=["k"], how=how).to_pandas()
        if how in ("inner", "left"):
            want = l.merge(r, on="k", how=how)
        elif how == "semi":
            want = l.merge(r[["k"]].drop_duplicates(), on="k")
        else:
            want = l[~l["k"].isin(r["k"])]
        assert len(got) == len(want), how
        gs = sorted(map(tuple, got.fillna(-1).astype("int64")
                        [sorted(got.columns)].values.tolist()))
        ws = sorted(map(tuple, want.fillna(-1).astype("int64")
                        [sorted(want.columns)].values.tolist()))
        assert gs == ws, how


# ---------------------------------------------------------------------------
# randomized cross-checks — session-6 relational ops vs pandas reference
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [3, 17, 92])
def test_upsert_latest_matches_pandas_reference(ray_session, seed):
    import ray.data as rd
    from agraph_ray.ops.setops import upsert_latest
    rng = np.random.default_rng(seed)
    base = pd.DataFrame({"k": rng.integers(0, 30, 60),
                         "v": rng.integers(0, 1000, 60),
                         "ver": rng.integers(0, 5, 60)})
    upd = pd.DataFrame({"k": rng.integers(0, 40, 40),
                        "v": rng.integers(0, 1000, 40),
                        "ver": rng.integers(0, 5, 40)})
    got = upsert_latest(rd.from_pandas(base).repartition(3),
                        rd.from_pandas(upd).repartition(2),
                        ["k"], "ver").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    # reference: stable sort by (ver, src, v) per key, keep last
    u = pd.concat([base.assign(src=0), upd.assign(src=1)])
    ref = (u.sort_values(["k", "ver", "src", "v"], kind="mergesort")
           .drop_duplicates("k", keep="last")
           .sort_values("k").reset_index(drop=True)[["k", "v", "ver"]])
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


@pytest.mark.parametrize("seed", [5, 41])
def test_table_checksum_detects_any_single_row_change(ray_session, seed):
    import ray.data as rd
    from agraph_ray.ops.setops import table_checksum
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({"a": rng.integers(0, 10**9, 100),
                       "s": [f"r{v}" for v in rng.integers(0, 10**6, 100)]})
    c0 = table_checksum(rd.from_pandas(df), ["a", "s"]).to_pandas() \
        .loc[0, "checksum"]
    mut = df.copy()
    i = int(rng.integers(0, len(mut)))
    mut.loc[i, "a"] = int(mut.loc[i, "a"]) + 1
    c1 = table_checksum(rd.from_pandas(mut), ["a", "s"]).to_pandas() \
        .loc[0, "checksum"]
    assert c0 != c1


@pytest.mark.parametrize("seed", [7, 23])
def test_explode_collect_random_roundtrip(ray_session, seed):
    import ray.data as rd
    from agraph_ray.ops.stats import collect_list, explode
    rng = np.random.default_rng(seed)
    lists = [list(rng.normal(size=rng.integers(1, 9)))
             for _ in range(50)]
    t = pa.table({"k": pa.array(np.arange(50), pa.int64()),
                  "vals": pa.array(lists, pa.list_(pa.float64()))})
    back = collect_list(
        explode(rd.from_arrow(t).repartition(4), "vals", ["k"]),
        "k", "pos", "value").to_pandas().sort_values("k") \
        .reset_index(drop=True)
    assert [list(v) for v in back["values"]] == lists


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["person", "concept", "org"]),
                          st.sampled_from(["person", "concept"]),
                          st.sampled_from([0.5, 0.8, 0.8, 1.0]),
                          st.sampled_from(["s1", "s2"])),
                min_size=1, max_size=25),
       st.randoms())
def test_edge_partial_order_invariant(rows, rnd):
    """The per-batch edge combiner must elect the same witness regardless
    of row order — confidence ties carrying different subj_type/obj_type
    once leaked the input partition order into the output (fixed by the
    total-order witness sort; caught by the replay-equals-batch test)."""
    from agraph_ray.stages.dedup import _edge_partial

    def mk(rows):
        return pa.Table.from_pylist([{
            "relation_id": "relation_x", "head_id": "h", "tail_id": "t",
            "pred": "related_to", "subj": "a", "obj": "b",
            "subj_type": stp, "obj_type": otp, "confidence": c,
            "source": src, "n_mentions": 1,
        } for stp, otp, c, src in rows])

    shuffled = list(rows)
    rnd.shuffle(shuffled)
    a = _edge_partial(mk(rows)).to_pandas()
    b = _edge_partial(mk(shuffled)).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("relation_id").reset_index(drop=True),
        b.sort_values("relation_id").reset_index(drop=True))


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3),          # conv
                          st.sampled_from(["user", "assistant", "system"]),
                          st.text(max_size=8)),
                min_size=1, max_size=40),
       st.integers(1, 5))
def test_unroll_matches_python_reference(ray_session, rows, k):
    """unroll_sft_examples == a plain-python per-conversation scan."""
    import ray.data as rd
    from agraph_ray.stages.reassemble import unroll_sft_examples

    # unique (conv, turn_idx): index rows within conv by arrival order
    seen = {}
    recs = []
    for conv, role, text in rows:
        idx = seen.get(conv, 0)
        seen[conv] = idx + 1
        recs.append({"conv_id": f"c{conv}", "turn_idx": idx,
                     "role": role, "text": text})

    expected = []
    by_conv = {}
    for r in recs:
        by_conv.setdefault(r["conv_id"], []).append(r)
    for conv, turns in by_conv.items():
        rendered = [f"<|{t['role']}|>{t['text']}" for t in turns]
        for i, t in enumerate(turns):
            if t["role"] != "assistant":
                continue
            ctx = "\n".join(rendered[max(0, i - k):i])
            expected.append((conv, t["turn_idx"], ctx, t["text"],
                             min(i, k)))
    expected.sort()

    out = (unroll_sft_examples(
        rd.from_items(recs).repartition(3), context_turns=k)
        .to_pandas())
    if not expected:
        assert len(out) == 0
        return
    got = sorted(zip(out["conv_id"], out["turn_idx"], out["context"],
                     out["response"], out["n_context_turns"]))
    assert [tuple(g) for g in got] == expected


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3),
                          st.lists(st.sampled_from(["spark", "flink",
                                                    "beam", "xx"]),
                                   max_size=3)),
                min_size=1, max_size=30))
def test_timeline_and_comention_match_bruteforce(ray_session, rows):
    """mention_timeline + comention_edges == plain-python dict scans over
    random turn streams (per-turn containment, distinct-conv counts)."""
    import ray.data as rd

    from agraph_ray.stages.link_chunks import (comention_edges,
                                               mention_timeline)

    recs = []
    for i, (conv, words) in enumerate(rows):
        recs.append({"conv_id": f"c{conv}", "turn_idx": i,
                     "text": " ".join(words),
                     "ts": pd.Timestamp(1_000 + i, unit="s")})
    vocab = {"spark": "e_spark", "flink": "e_flink", "beam": "e_beam"}
    nodes = rd.from_items([{"entity_id": e, "name": n, "aliases": []}
                           for n, e in vocab.items()])

    # brute force
    tl = {}
    conv_ents = {}
    for r in recs:
        present = {e for n, e in vocab.items() if n in r["text"]}
        us = int(r["ts"].value // 1_000)
        for e in present:
            m = tl.setdefault(e, {"mentions": 0, "convs": set(),
                                  "lo": us, "hi": us})
            m["mentions"] += 1
            m["convs"].add(r["conv_id"])
            m["lo"], m["hi"] = min(m["lo"], us), max(m["hi"], us)
            conv_ents.setdefault(r["conv_id"], set()).add(e)
    exp_tl = sorted((e, m["mentions"], len(m["convs"]), m["lo"], m["hi"])
                    for e, m in tl.items())
    exp_pairs = {}
    for ents in conv_ents.values():
        ents = sorted(ents)
        for i in range(len(ents)):
            for j in range(i + 1, len(ents)):
                exp_pairs[(ents[i], ents[j])] = \
                    exp_pairs.get((ents[i], ents[j]), 0) + 1

    tds = rd.from_items(recs).repartition(3)
    got_tl = mention_timeline(tds, nodes).to_pandas()
    got_tl_t = sorted(zip(got_tl["entity_id"], got_tl["mentions"],
                          got_tl["n_convs"], got_tl["first_us"],
                          got_tl["last_us"])) if len(got_tl) else []
    assert [tuple(t) for t in got_tl_t] == exp_tl

    got_cm = comention_edges(tds, nodes).to_pandas()
    got_pairs = {(a, b): n for a, b, n in zip(
        got_cm.get("a", []), got_cm.get("b", []),
        got_cm.get("n_convs", []))}
    assert got_pairs == exp_pairs


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2),
                          st.lists(st.sampled_from(["spark", "flink",
                                                    "beam"]),
                                   max_size=2)),
                min_size=1, max_size=25))
def test_pseudonym_plan_matches_bruteforce(ray_session, rows):
    """speaker_pseudonym_plan == plain-python first-appearance ranking."""
    import ray.data as rd

    from agraph_ray.stages.link_chunks import speaker_pseudonym_plan

    recs = [{"conv_id": f"c{conv}", "turn_idx": i, "text": " ".join(words)}
            for i, (conv, words) in enumerate(rows)]
    first = {}
    for r in recs:
        for n in ("spark", "flink", "beam"):
            if n in r["text"]:
                k = (r["conv_id"], n)
                first[k] = min(first.get(k, r["turn_idx"]), r["turn_idx"])
    expected = []
    by_conv = {}
    for (conv, n), idx in first.items():
        by_conv.setdefault(conv, []).append((idx, n))
    for conv, items in by_conv.items():
        for rank, (idx, n) in enumerate(sorted(items), start=1):
            expected.append((conv, n, idx, f"ENT_{rank}"))
    expected.sort()

    nodes = rd.from_items([{"entity_id": n, "name": n, "aliases": []}
                           for n in ("spark", "flink", "beam")])
    out = speaker_pseudonym_plan(
        rd.from_items(recs).repartition(3), nodes).to_pandas()
    got = sorted(zip(out.get("conv_id", []), out.get("name", []),
                     out.get("first_idx", []), out.get("placeholder", [])))
    assert [tuple(g) for g in got] == expected

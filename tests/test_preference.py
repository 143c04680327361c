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

"""BPE vocabulary learning + encoding (Sennrich-style, deterministic)."""

import pyarrow as pa
import pytest


@pytest.fixture()
def corpus(ray_session):
    import ray.data as rd
    # classic BPE example: "low lower lowest newer newest" with repeats
    docs = ["low low low low low lower lower",
            "newest newest newest newest newest newest",
            "widest widest widest",
            "newer newer newer newer"]
    return rd.from_arrow(pa.table({
        "doc_id": list(range(len(docs))), "text": docs}))


def test_learn_bpe_sequence(corpus):
    from agraph_ray.ops.bpe import learn_bpe
    m = learn_bpe(corpus, num_merges=6)
    got = list(zip(m["left"], m["right"]))
    # hand-computed: w+e rides newest(6)+newer(4)+lower(2)=12; then a
    # 10-10 tie between (e,we) and (n,e) breaks to the smaller pair;
    # then n+ewe, the est</w> family (9), and l+o (5 low + 2 lower)
    assert got == [("w", "e"), ("e", "we"), ("n", "ewe"),
                   ("s", "t"), ("st", "</w>"), ("l", "o")]
    assert list(m["rank"]) == [0, 1, 2, 3, 4, 5]
    assert list(m["freq"]) == [12, 10, 10, 9, 9, 7]


def test_learn_bpe_deterministic(corpus):
    from agraph_ray.ops.bpe import learn_bpe
    a = learn_bpe(corpus, num_merges=6)
    b = learn_bpe(corpus, num_merges=6)
    assert a.equals(b)


def test_bpe_encode_roundtrip(corpus):
    from agraph_ray.ops.bpe import bpe_encode, learn_bpe
    m = learn_bpe(corpus, num_merges=8)
    rows = {r["doc_id"]: r for r in
            bpe_encode(corpus, m, concurrency=(1, 2)).take_all()}
    for did, text in [(0, "low low low low low lower lower"),
                      (3, "newer newer newer newer")]:
        r = rows[did]
        assert r["n_words"] == len(text.split())
        # stripping merge artifacts reconstructs the original text
        rebuilt = r["tokens"].replace(" ", "").replace("</w>", " ").strip()
        assert rebuilt == text.replace(" ", " ")
        assert r["n_tokens"] >= r["n_words"]  # ≥1 token per word


def test_bpe_encode_unknown_chars(corpus):
    import ray.data as rd
    from agraph_ray.ops.bpe import bpe_encode, learn_bpe
    m = learn_bpe(corpus, num_merges=4)
    other = rd.from_arrow(pa.table({
        "doc_id": [9], "text": ["zzz qqq"]}))
    r = bpe_encode(other, m, concurrency=(1, 1)).take_all()[0]
    # unseen words fall back to char-level + </w>
    assert r["n_tokens"] == 8  # z z z </w> q q q </w>

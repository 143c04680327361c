"""HyperLogLog sketch + SymSpell fuzzy-join tests."""

import numpy as np
import pandas as pd


def test_hll_error_bound_and_determinism(ray_session):
    import ray.data as rd
    from agraph_ray.ops.sketch import hll_count_distinct
    rng = np.random.default_rng(17)
    # three groups with very different cardinalities
    rows = []
    for key, card, n in [(1, 50, 2000), (2, 5000, 20000), (3, 1, 500)]:
        vals = rng.integers(0, card, n) + key * 10_000_000
        rows.append(pd.DataFrame({"k": key, "v": vals}))
    df = pd.concat(rows, ignore_index=True)
    exact = df.groupby("k")["v"].nunique()

    out1 = (hll_count_distinct(rd.from_pandas(df), "k", "v")
            .to_pandas().set_index("k")["approx_distinct"])
    # different partitioning must give the IDENTICAL estimate (register
    # merge is an associative max)
    out2 = (hll_count_distinct(rd.from_pandas(df).repartition(13), "k", "v")
            .to_pandas().set_index("k")["approx_distinct"])
    for k in exact.index:
        rel = abs(out1[k] - exact[k]) / max(exact[k], 1)
        assert rel < 0.05, (k, out1[k], exact[k])
        assert out1[k] == out2[k]


def test_fuzzy_self_join_exact_vs_bruteforce(ray_session):
    import ray.data as rd
    from agraph_ray.ops.fuzzy import fuzzy_self_join, levenshtein
    rng = np.random.default_rng(23)
    words = sorted({"".join(rng.choice(list("abcde"),
                                       size=rng.integers(2, 6)))
                    for _ in range(120)})
    df = pd.DataFrame({"w": words * 2})     # duplicates: op must dedup
    for d in (1, 2):
        out = fuzzy_self_join(rd.from_pandas(df), "w",
                              max_edits=d).to_pandas()
        got = {(a, b): int(x) for a, b, x in
               zip(out["a"], out["b"], out["dist"])}
        exp = {}
        for i in range(len(words) - 1):
            for j in range(i + 1, len(words)):
                dd = levenshtein(words[i], words[j])
                if dd <= d:
                    exp[(words[i], words[j])] = dd
        assert got == exp, f"max_edits={d}"

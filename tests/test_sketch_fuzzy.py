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


def test_approx_quantiles_error_bound(ray_session):
    """One-pass sketch quantiles stay within the ~1.5/k rank-error bound
    of the exact quantiles, grouped and global, at any partitioning."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from agraph_ray.ops.sketch import approx_quantiles

    rng = np.random.default_rng(11)
    n = 60_000
    df = pd.DataFrame({"g": rng.integers(0, 3, n),
                       "v": rng.lognormal(0.0, 1.0, n)})
    qs = [0.1, 0.5, 0.9, 0.99]
    k = 256
    for parts in (4, 17):
        out = approx_quantiles(rd.from_pandas(df).repartition(parts),
                               "v", qs, key="g", k=k).to_pandas()
        assert len(out) == 3 * len(qs)
        for g, sub in df.groupby("g"):
            sv = np.sort(sub["v"].to_numpy())
            for q in qs:
                got = float(out.loc[(out["g"] == g) & (out["q"] == q),
                                    "value"].iloc[0])
                # achieved rank of the returned value vs requested rank
                r = np.searchsorted(sv, got) / len(sv)
                assert abs(r - q) <= 2.5 / k + 0.005, (parts, g, q, r)
    # global (no key) shape
    gout = approx_quantiles(rd.from_pandas(df), "v", [0.5]).to_pandas()
    assert list(gout.columns) == ["q", "value"]
    med = float(np.median(df["v"]))
    assert abs(float(gout["value"].iloc[0]) - med) / med < 0.05


def test_grouped_heavy_hitters(ray_session):
    """Exact when capacity covers the domain (any partitioning); counts
    are lower bounds with a valid err upper bound when capacity is tiny."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from agraph_ray.ops.sketch import grouped_heavy_hitters

    rng = np.random.default_rng(5)
    # zipf-ish: value j appears with prob ~ 1/(j+1)
    vals = rng.zipf(1.5, 20_000) % 50
    df = pd.DataFrame({"g": rng.integers(0, 4, len(vals)),
                       "v": vals.astype("int64")})

    def exact_topk(sub, k):
        c = sub.groupby("v").size().reset_index(name="c")
        c = c.sort_values(["c", "v"], ascending=[False, True])
        return list(zip(c["v"].head(k), c["c"].head(k)))

    ds = rd.from_pandas(df).repartition(8)
    out = grouped_heavy_hitters(ds, "g", "v", k=5, capacity=64).to_pandas()
    assert (out["err"] == 0).all()
    for g, sub in df.groupby("g"):
        got = out[out["g"] == g].sort_values(
            ["count", "v"], ascending=[False, True])
        assert list(zip(got["v"], got["count"])) == exact_topk(sub, 5)

    # tiny capacity: top-1 value (huge mass) must survive; bounds hold
    approx = grouped_heavy_hitters(ds, "g", "v", k=5,
                                   capacity=8).to_pandas()
    for g, sub in df.groupby("g"):
        true = dict(sub.groupby("v").size())
        a = approx[approx["g"] == g]
        top_true = exact_topk(sub, 1)[0][0]
        assert top_true in set(a["v"])
        for _, r in a.iterrows():
            assert r["count"] <= true.get(r["v"], 0) <= r["count"] + r["err"]

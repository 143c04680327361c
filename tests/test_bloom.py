"""Bloom-filter semi/anti join: exactness vs cogroup_join, filter power."""

import numpy as np
import pandas as pd
import pytest


def _tables(ray):
    import ray.data as rd
    rng = np.random.RandomState(11)
    probe = pd.DataFrame({
        "k": rng.randint(0, 5000, size=20_000).astype(np.int64),
        "v": np.arange(20_000, dtype=np.int64),
    })
    # build side covers only a sliver of the probe key space
    build = pd.DataFrame({
        "k": np.arange(0, 400, dtype=np.int64),
        "extra": np.arange(400, dtype=np.int64),
    })
    return (rd.from_pandas(probe).repartition(8),
            rd.from_pandas(build).repartition(3), probe, build)


def test_bloom_semi_matches_exact(ray_session):
    from agraph_ray.ops.bloom import bloom_join
    probe, build, pdf, bdf = _tables(ray_session)
    got = bloom_join(probe, build, on="k", how="semi",
                     m_bits=1 << 16).to_pandas()
    want = pdf[pdf.k.isin(set(bdf.k))]
    assert sorted(got.v) == sorted(want.v)
    assert list(got.columns) == ["k", "v"]


def test_bloom_anti_matches_exact(ray_session):
    from agraph_ray.ops.bloom import bloom_join
    probe, build, pdf, bdf = _tables(ray_session)
    got = bloom_join(probe, build, on="k", how="anti",
                     m_bits=1 << 16).to_pandas()
    want = pdf[~pdf.k.isin(set(bdf.k))]
    assert sorted(got.v) == sorted(want.v)


def test_bloom_filter_power_and_approx(ray_session):
    """The bloom prefilter alone (exact=False) keeps all true matches and
    only a small false-positive tail — the property that bounds shuffle
    volume at scale."""
    from agraph_ray.ops.bloom import bloom_join
    probe, build, pdf, bdf = _tables(ray_session)
    approx = bloom_join(probe, build, on="k", how="semi",
                        m_bits=1 << 16, exact=False).to_pandas()
    true_v = set(pdf[pdf.k.isin(set(bdf.k))].v)
    assert true_v <= set(approx.v)            # no false negatives, ever
    # m/n = 65536/400 => fp well under 1%; allow 2% of non-matches
    fp = len(approx) - len(true_v)
    assert fp <= 0.02 * (len(pdf) - len(true_v))


def test_bloom_build_is_partition_invariant(ray_session):
    from agraph_ray.ops.bloom import build_bloom
    import ray.data as rd
    df = pd.DataFrame({"k": np.arange(1000, dtype=np.int64)})
    b1 = build_bloom(rd.from_pandas(df).repartition(1), "k", m_bits=1 << 14)
    b7 = build_bloom(rd.from_pandas(df).repartition(7), "k", m_bits=1 << 14)
    assert np.array_equal(b1, b7)


def test_bloom_rejects_bad_how(ray_session):
    from agraph_ray.ops.bloom import bloom_join
    probe, build, _, _ = _tables(ray_session)
    with pytest.raises(ValueError):
        bloom_join(probe, build, on="k", how="inner")

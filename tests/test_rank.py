"""global_row_number / global_ntile edge cases."""

import numpy as np
import pyarrow as pa
import pytest


def _mk(ray_session, n, nblocks=4):
    import ray.data as rd
    rng = np.random.RandomState(3)
    ids = rng.permutation(n)
    return rd.from_arrow(pa.table({
        "id": ids, "v": (ids * 7) % 13})).repartition(nblocks)


def test_row_number_matches_argsort(ray_session):
    from agraph_ray.ops.rank import global_row_number
    ds = _mk(ray_session, 100)
    out = global_row_number(ds, ["v", "id"]).to_pandas()
    out = out.sort_values("rn")
    expect = out.sort_values(["v", "id"])
    assert list(out["id"]) == list(expect["id"])
    assert sorted(out["rn"]) == list(range(1, 101))


def test_ntile_sql_rule(ray_session):
    from agraph_ray.ops.rank import global_ntile
    # n=10, k=3 → tiles of 4,3,3
    ds = _mk(ray_session, 10)
    out = global_ntile(ds, ["id"], k=3).to_pandas().sort_values("id")
    assert list(out["tile"]) == [1, 1, 1, 1, 2, 2, 2, 3, 3, 3]


def test_ntile_n_less_than_k(ray_session):
    from agraph_ray.ops.rank import global_ntile
    ds = _mk(ray_session, 3)
    out = global_ntile(ds, ["id"], k=7).to_pandas().sort_values("id")
    assert list(out["tile"]) == [1, 2, 3]


def test_ntile_exact_division(ray_session):
    from agraph_ray.ops.rank import global_ntile
    ds = _mk(ray_session, 12)
    out = global_ntile(ds, ["id"], k=4).to_pandas().sort_values("id")
    assert list(out["tile"]) == [1] * 3 + [2] * 3 + [3] * 3 + [4] * 3


def test_ntile_invalid_k(ray_session):
    from agraph_ray.ops.rank import global_ntile
    with pytest.raises(ValueError):
        global_ntile(_mk(ray_session, 5), ["id"], k=0)

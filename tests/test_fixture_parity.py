"""The P/R gate: pipeline triples vs the reference golden fixtures.

Golden fixtures were produced by running the reference's deterministic
rule-based extraction (see tools/gen_fixtures.py) over the same reassembled
conversation documents. Both sides are deterministic, so the target is
exact match; the gate is P/R >= 0.95 (BASELINE.json north_rule).
"""

import os

import duckdb
import pytest

from tests.conftest import FIXTURE_DIR, TEST_CONVS, TEST_SEED

GOLD_TRIPLES = os.path.join(FIXTURE_DIR,
                            f"golden_triples_{TEST_CONVS}_{TEST_SEED}.parquet")
GOLD_ENTITIES = os.path.join(FIXTURE_DIR,
                             f"golden_entities_{TEST_CONVS}_{TEST_SEED}.parquet")


def _pr(got: set, want: set):
    if not got or not want:
        return 0.0, 0.0
    tp = len(got & want)
    return tp / len(got), tp / len(want)


@pytest.mark.usefixtures("ray_session")
def test_triples_global_pr(kg_out):
    con = duckdb.connect()
    got = set(map(tuple, con.execute(
        f"SELECT DISTINCT subj, pred, obj FROM "
        f"parquet_scan('{kg_out.tables['triples']}/*.parquet')").fetchall()))
    want = set(map(tuple, con.execute(
        f"SELECT DISTINCT subj, pred, obj FROM parquet_scan('{GOLD_TRIPLES}')"
    ).fetchall()))
    p, r = _pr(got, want)
    assert p >= 0.95 and r >= 0.95, (p, r, len(got), len(want))
    # deterministic rule engines on identical documents: expect exact
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_triples_per_conversation_pr(kg_out):
    con = duckdb.connect()
    got = con.execute(
        f"SELECT conv_id, subj, pred, obj FROM "
        f"parquet_scan('{kg_out.tables['mentions']}/*.parquet') "
        f"WHERE kind = 'triple'").fetchall()
    want = con.execute(
        f"SELECT conv_id, subj, pred, obj FROM parquet_scan('{GOLD_TRIPLES}')"
    ).fetchall()
    by_conv_got, by_conv_want = {}, {}
    for c, s, p, o in got:
        by_conv_got.setdefault(c, set()).add((s, p, o))
    for c, s, p, o in want:
        by_conv_want.setdefault(c, set()).add((s, p, o))
    assert set(by_conv_got) == set(by_conv_want)
    for c in by_conv_want:
        p, r = _pr(by_conv_got[c], by_conv_want[c])
        assert p >= 0.95 and r >= 0.95, (c, p, r)


@pytest.mark.usefixtures("ray_session")
def test_entities_pr(kg_out):
    con = duckdb.connect()
    got = set(map(tuple, con.execute(
        f"SELECT DISTINCT conv_id, norm_name, entity_type FROM "
        f"parquet_scan('{kg_out.tables['mentions']}/*.parquet') "
        f"WHERE kind = 'entity'").fetchall()))
    want = set(map(tuple, con.execute(
        f"SELECT DISTINCT conv_id, name, entity_type "
        f"FROM parquet_scan('{GOLD_ENTITIES}')").fetchall()))
    p, r = _pr(got, want)
    assert p >= 0.95 and r >= 0.95, (p, r)
    assert got == want

"""Round-3 regression tests for the three ADVICE r2 findings:

1. witness election tie-break must include ``properties`` (dedup.py) —
   mentions tying on every other sort key but carrying different
   properties JSON merged first-writer-wins in partition order;
2. ``apply_pseudonyms`` must be a single-pass rewrite — sequential
   per-name replacement rescans already-rewritten text, so a vocabulary
   name matching inside a placeholder corrupts earlier substitutions;
3. null-timestamp turns must not TypeError in ``mention_timeline`` /
   windowed ``comention_edges`` (None // window_us).
"""

import pandas as pd
import pyarrow as pa
import pytest


def _edge_mentions(order):
    """Two mentions of one relation_id tying on every witness sort key
    except properties; `order` flips the partition order."""
    rows = [
        dict(relation_id="r1", head_id="h", tail_id="t",
             relation_type="knows", subj="A", obj="B",
             subj_type="PERSON", obj_type="PERSON",
             description="d", confidence=0.9, source="s",
             properties='{"k": "zebra"}'),
        dict(relation_id="r1", head_id="h", tail_id="t",
             relation_type="knows", subj="A", obj="B",
             subj_type="PERSON", obj_type="PERSON",
             description="d", confidence=0.9, source="s",
             properties='{"k": "apple", "extra": 1}'),
    ]
    return [rows[i] for i in order]


@pytest.mark.parametrize("order", [(0, 1), (1, 0)])
def test_edge_properties_tiebreak_partition_invariant(order):
    """The elected witness's properties must not depend on input order:
    the total order now ends on the properties JSON itself."""
    from agraph_ray.stages.dedup import _edge_partial, merge_edges_bucket
    t = pa.Table.from_pylist(_edge_mentions(order))
    merged = merge_edges_bucket(_edge_partial(t).to_pandas())
    assert len(merged) == 1
    # smallest properties string sorts first among full ties → 'apple' wins
    # as first writer; 'zebra' never overrides k but can't win it either
    import json
    props = json.loads(merged["properties"].iloc[0])
    assert props == {"k": "apple", "extra": 1}


@pytest.mark.parametrize("order", [(0, 1), (1, 0)])
def test_entity_properties_tiebreak_partition_invariant(order):
    from agraph_ray.stages.dedup import (_entity_partial,
                                         _merge_entities_bucket)
    rows = [
        dict(entity_id="e1", name="Ada", norm_name="ada",
             entity_type="PERSON", description="d", aliases=[],
             confidence=0.8, source="s", conv_id="c1",
             properties='{"k": "zebra"}'),
        dict(entity_id="e1", name="Ada", norm_name="ada",
             entity_type="PERSON", description="d", aliases=[],
             confidence=0.8, source="s", conv_id="c2",
             properties='{"k": "apple"}'),
    ]
    t = pa.Table.from_pylist([rows[i] for i in order])
    merged = _merge_entities_bucket(_entity_partial(t).to_pandas())
    assert len(merged) == 1
    import json
    assert json.loads(merged["properties"].iloc[0]) == {"k": "apple"}


def test_apply_pseudonyms_single_pass_no_placeholder_corruption(ray_session):
    """Vocabulary name 'ent' matches (case-insensitively) inside the
    'ENT_k' placeholders: the old sequential rewrite turned 'ENT_1' from
    an earlier substitution into 'ENT_2_1'. Single-pass must not."""
    import ray.data as rd

    from agraph_ray.stages.link_chunks import apply_pseudonyms
    turns = rd.from_pandas(pd.DataFrame({
        "conv_id": ["c1"], "turn_idx": [0], "text": ["Bob saw ent today"],
    }))
    plan = rd.from_pandas(pd.DataFrame({
        "conv_id": ["c1", "c1"], "name": ["Bob", "ent"],
        "placeholder": ["ENT_1", "ENT_2"],
    }))
    out = apply_pseudonyms(turns, plan).to_pandas()
    assert list(out["text"]) == ["ENT_1 saw ENT_2 today"]


def test_apply_pseudonyms_longest_name_wins(ray_session):
    """'Alice Johnson' must rewrite as a unit, not as 'Alice' + ' Johnson',
    under the single-pass alternation."""
    import ray.data as rd

    from agraph_ray.stages.link_chunks import apply_pseudonyms
    turns = rd.from_pandas(pd.DataFrame({
        "conv_id": ["c1"], "turn_idx": [0],
        "text": ["alice johnson met Alice"],
    }))
    plan = rd.from_pandas(pd.DataFrame({
        "conv_id": ["c1", "c1"], "name": ["Alice Johnson", "Alice"],
        "placeholder": ["P_1", "P_2"],
    }))
    out = apply_pseudonyms(turns, plan).to_pandas()
    assert list(out["text"]) == ["P_1 met P_2"]


def test_timeline_and_comention_skip_null_ts(ray_session):
    """Null-ts turns previously raised TypeError (None // window_us) in the
    windowed paths and broke the int64 cast unwindowed; they are now
    excluded from event-time outputs."""
    import ray.data as rd

    from agraph_ray.stages.link_chunks import (comention_edges,
                                               mention_timeline)
    nodes = rd.from_pandas(pd.DataFrame({
        "entity_id": ["e_a", "e_b"], "name": ["Ada", "Bo"],
        "aliases": [[], []],
    }))
    ts = pd.to_datetime(["2024-01-01 00:00:00", None,
                         "2024-01-01 00:00:10"])
    turns = rd.from_pandas(pd.DataFrame({
        "conv_id": ["c1", "c1", "c1"], "turn_idx": [0, 1, 2],
        "text": ["Ada speaks", "Ada and Bo (null ts)", "Bo replies"],
        "ts": ts,
    }))
    tl = mention_timeline(turns, nodes).to_pandas().set_index("entity_id")
    # the null-ts turn (mentioning both) is excluded everywhere
    assert int(tl.loc["e_a", "mentions"]) == 1
    assert int(tl.loc["e_b", "mentions"]) == 1

    w = 5_000_000  # 5 s windows: the two non-null turns land apart
    wtl = mention_timeline(turns, nodes, window_us=w).to_pandas()
    assert int(wtl["mentions"].sum()) == 2

    edges = comention_edges(turns, nodes, window_us=w).to_pandas()
    # only the null-ts turn would co-locate both in one window → no edge
    assert len(edges) == 0
    # unwindowed comention still counts the null-ts turn (conversation
    # containment needs no event time)
    edges_all = comention_edges(turns, nodes).to_pandas()
    assert len(edges_all) == 1 and int(edges_all["n_convs"].iloc[0]) == 1

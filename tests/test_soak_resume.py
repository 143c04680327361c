"""Streaming-regime soak of the resumable path (round-3 verdict #6).

100-TB operation is thousands of checkpointed partition groups; the
chaos tests pin the commit protocol at 4. This soak chains 20 groups
with ``group_concurrency=2`` and kills the job TWICE mid-stream (after
the 7th and then the 14th mentions-partition commit), resumes each
time, and proves:

- every resume skips exactly the committed partitions (monotone
  lineage, no re-execution of committed work);
- the twice-killed, twice-resumed output is value-identical (row counts
  + whole-row hash sums) to an unkilled run;
- no half-published artifact (``*.tmp-*``) survives;
- each partition's manifest is committed exactly once and the
  per-partition row counts add up to the global table.
"""

import glob
import json
import os
import subprocess
import sys
import textwrap

import duckdb
import pytest

from agraph_ray.config import KGConfig

pytestmark = pytest.mark.slow

KILL_EXIT = 42
N_SHARDS = 40
SHARDS_PER_PART = 2
N_PARTS = N_SHARDS // SHARDS_PER_PART

DRIVER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import agraph_ray.pipelines.kg_build as kgb
    from agraph_ray.config import KGConfig
    from agraph_ray.stages import materialize as mat

    kill_after = {kill_after}
    real_commit = mat.commit_manifest
    state = {{"n": 0}}

    def chaos_commit(out_dir, stage, partition_id, metrics):
        r = real_commit(out_dir, stage, partition_id, metrics)
        if stage == "mentions":
            state["n"] += 1
            if kill_after and state["n"] >= kill_after:
                os._exit({kill_exit})
        return r

    kgb.commit_manifest = chaos_commit
    kgb.build_kg_resumable({paths!r}, {out!r}, KGConfig(),
                           shards_per_partition={spp},
                           do_canonicalize=False,
                           group_concurrency=2)
    os._exit(0)
""")


def _fingerprint(out: str, table: str):
    con = duckdb.connect()
    pat = "part=*/*.parquet" if table == "mentions" else "*.parquet"
    return con.execute(
        f"SELECT count(*), sum(hash(to_json(t))) FROM "
        f"parquet_scan('{out}/{table}/{pat}') t").fetchone()


@pytest.fixture(scope="module")
def soak_corpus(ray_session, tmp_path_factory):
    from agraph_ray.synth import generate_transcripts
    d = str(tmp_path_factory.mktemp("soak_corpus"))
    paths = generate_transcripts(d, n_convs=120, seed=31,
                                 num_shards=N_SHARDS, skew=False)
    return paths


def _run_driver(paths, out, kill_after):
    script = DRIVER.format(repo="/root/repo", paths=list(paths), out=out,
                           spp=SHARDS_PER_PART, kill_after=kill_after,
                           kill_exit=KILL_EXIT)
    return subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=900)


def test_soak_twenty_groups_double_kill_resume(soak_corpus, tmp_path):
    from agraph_ray.pipelines.kg_build import build_kg_resumable
    from agraph_ray.stages.materialize import is_committed

    # reference: unkilled run in-process
    ref_out = str(tmp_path / "ref")
    build_kg_resumable(soak_corpus, ref_out, KGConfig(),
                       shards_per_partition=SHARDS_PER_PART,
                       do_canonicalize=False, group_concurrency=2)

    out = str(tmp_path / "soak")

    # run 1: die after the 7th partition commit
    p1 = _run_driver(soak_corpus, out, kill_after=7)
    assert p1.returncode == KILL_EXIT, p1.stderr[-2000:]
    committed1 = [pid for pid in range(N_PARTS)
                  if is_committed(out, "mentions", pid)]
    assert 7 <= len(committed1) < N_PARTS   # concurrency may land an 8th

    # run 2: resume, die again after 7 MORE commits
    p2 = _run_driver(soak_corpus, out, kill_after=7)
    assert p2.returncode == KILL_EXIT, p2.stderr[-2000:]
    committed2 = [pid for pid in range(N_PARTS)
                  if is_committed(out, "mentions", pid)]
    # monotone lineage: nothing committed ever un-commits, and progress
    # strictly advances
    assert set(committed1) <= set(committed2)
    assert len(committed2) >= len(committed1) + 7

    # run 3: resume to completion (in-process; also checks skip counts)
    r3 = build_kg_resumable(soak_corpus, out, KGConfig(),
                            shards_per_partition=SHARDS_PER_PART,
                            do_canonicalize=False, group_concurrency=2)
    assert r3.metrics["n_partitions"] == N_PARTS
    assert r3.metrics["skipped"] == len(committed2)

    # no torn artifacts anywhere
    assert not glob.glob(os.path.join(out, "mentions", "*.tmp-*"))

    # value-identical to the unkilled run
    for table in ("triples", "nodes", "edges", "mentions"):
        assert _fingerprint(out, table) == _fingerprint(ref_out, table), \
            table

    # every partition committed exactly once; per-partition rows sum to
    # the global mentions table
    total = 0
    for pid in range(N_PARTS):
        m = json.load(open(os.path.join(
            out, "manifests", f"mentions-{pid}.json")))
        assert m["committed_at"]
        total += m["output_rows"]
    assert total == _fingerprint(out, "mentions")[0]

    # a fourth run is a pure no-op: everything skipped
    r4 = build_kg_resumable(soak_corpus, out, KGConfig(),
                            shards_per_partition=SHARDS_PER_PART,
                            do_canonicalize=False, group_concurrency=2)
    assert r4.metrics["skipped"] == N_PARTS

"""At-scale probe of the composed LLM-path pipeline (pipelines/llm_e2e.py)
under mock latency: >=1M turns through LLM extract -> dedup -> embed ->
ANN link -> LLM pair judge -> canonical merge, checkpointed, with an
optional mid-run kill + resume.

Modes:
  python tools/llm_e2e_scale.py --run                 # single full run
  python tools/llm_e2e_scale.py --run --kill-after 1  # die after mentions
                                                      # partition 1 commits
                                                      # (exit 42)
  python tools/llm_e2e_scale.py --full                # orchestrate: killed
                                                      # run, then resume;
                                                      # print both JSONs

Corpus: deterministic synthetic transcripts (synth.generate_transcripts),
cached under /tmp. All knobs follow the round-4 sweep optimum
(BASELINE.md s14): 128 actors x 16 in-flight extraction pool at
0.2 s/call mean latency, judge 64 x 16, embedding client batch-64.
"""

import argparse
import glob
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KILL_EXIT = 42
SEED = 42


def make_corpus(n_convs: int, shards: int, plant: bool = False) -> list:
    d = f"/tmp/graft_e2e_corpus_{n_convs}_{SEED}"
    if not glob.glob(os.path.join(d, "transcripts-*.parquet")):
        from agraph_ray.synth import generate_transcripts
        generate_transcripts(d, n_convs=n_convs, seed=SEED,
                             num_shards=shards)
    files = sorted(glob.glob(os.path.join(d, "transcripts-*.parquet")))
    if plant:
        # a shard of VARIANT surface forms ("Globex" vs the corpus'
        # "Globex Inc") — the near-duplicates the ANN→judge→merge tail
        # must find; lets the at-scale run exercise nonzero approvals
        import pyarrow as pa
        import pyarrow.parquet as pq
        p = os.path.join(d, "planted.parquet")
        if not os.path.exists(p):
            variants = ["Globex", "Initech", "Acme", "Wayne", "Stark",
                        "Alice", "Umbrella", "Frank", "Irene", "Grace"]
            rows = {"conv_id": [], "turn_idx": [], "text": []}
            for i in range(200):
                v = variants[i % len(variants)]
                rows["conv_id"].append(f"plant{i:04d}")
                rows["turn_idx"].append(0)
                rows["text"].append(
                    f"{v} published an update about the roadmap today.")
            pq.write_table(pa.table(rows), p)
        files = files + [p]
    return files


def run(args) -> None:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    files = make_corpus(args.convs, args.shards, args.plant)

    if args.kill_after is not None:
        import agraph_ray.pipelines.kg_build as kgb
        real_commit = kgb.commit_manifest

        def chaos_commit(out_dir, stage, partition_id, metrics):
            real_commit(out_dir, stage, partition_id, metrics)
            if (stage, str(partition_id)) == ("mentions",
                                              str(args.kill_after)):
                print(json.dumps({"killed_after_partition":
                                  args.kill_after}), flush=True)
                os._exit(KILL_EXIT)
        kgb.commit_manifest = chaos_commit

    from agraph_ray.config import KGConfig
    from agraph_ray.mock_llm import (mock_chat_client,
                                     mock_embedding_client,
                                     mock_llm_engine_factory)
    from agraph_ray.pipelines.llm_e2e import build_kg_llm_e2e

    import pyarrow.dataset as pads
    n_turns = pads.dataset(files, format="parquet").count_rows()
    t0 = time.time()
    res = build_kg_llm_e2e(
        files, args.out,
        KGConfig(hot_conv_turns=2000, salt_span=1000),
        engine_factory=mock_llm_engine_factory(latency_sec=args.latency),
        embedder=mock_embedding_client(latency_sec=args.latency,
                                       embedding_dim=64),
        judge_llm_factory=lambda: mock_chat_client(
            latency_sec=args.latency),
        shards_per_partition=args.shards_per_partition,
        embed_dim=64, ann_sim_threshold=0.60,
        llm_opts={"num_actors": 128, "max_concurrent": 16,
                  "batch_size": 32},
        judge_opts={"concurrency": 64, "max_concurrent": 16},
    )
    wall = time.time() - t0
    out = {**{k: (round(v, 2) if isinstance(v, float) else v)
              for k, v in sorted(res.metrics.items())},
           "n_turns": n_turns, "wall_sec": round(wall, 2),
           "turns_per_sec": round(n_turns / wall, 1),
           "num_cpus": args.num_cpus,
           "latency_sec_per_call": args.latency}
    print(json.dumps(out), flush=True)
    ray.shutdown()


def full(args) -> None:
    """Kill-and-resume orchestration: two fresh processes."""
    import shutil
    shutil.rmtree(args.out, ignore_errors=True)
    base = [sys.executable, os.path.abspath(__file__), "--run",
            "--convs", str(args.convs), "--shards", str(args.shards),
            "--shards-per-partition", str(args.shards_per_partition),
            "--num-cpus", str(args.num_cpus),
            "--latency", str(args.latency), "--out", args.out]
    env = {**os.environ, "RAY_ADDRESS": ""}
    t0 = time.time()
    p1 = subprocess.run(base + ["--kill-after", "1"], env=env)
    assert p1.returncode == KILL_EXIT, p1.returncode
    t_killed = time.time() - t0
    t0 = time.time()
    p2 = subprocess.run(base, env=env)
    assert p2.returncode == 0, p2.returncode
    print(json.dumps({"killed_leg_sec": round(t_killed, 2),
                      "resume_leg_sec": round(time.time() - t0, 2)}),
          flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", action="store_true")
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--kill-after", type=int, default=None)
    ap.add_argument("--convs", type=int, default=64000)
    ap.add_argument("--shards", type=int, default=32)
    ap.add_argument("--shards-per-partition", type=int, default=8)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--latency", type=float, default=0.2)
    ap.add_argument("--plant", action="store_true",
                    help="append a shard of variant entity surface "
                         "forms so the ANN->judge->merge tail has "
                         "nonzero approvals")
    ap.add_argument("--out", default="/tmp/graft_e2e_scale_out")
    args = ap.parse_args()
    if args.full:
        full(args)
    else:
        run(args)


if __name__ == "__main__":
    main()

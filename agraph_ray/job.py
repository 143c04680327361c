"""``ray job submit`` entrypoint for the KG-construction pipeline.

On a fixed-size multi-node cluster (the north_rule's deployment shape):

    ray job submit --working-dir . -- \\
        python -m agraph_ray.job --input s3://bucket/transcripts/ \\
        --output s3://bucket/kg_out/ --resumable

Locally (single node) the same module runs standalone:

    python -m agraph_ray.job --input /tmp/transcripts --output /tmp/out

The module does NOT own the Ray session when one already exists (the
job supervisor / driver initialises Ray inside the cluster; Ray Data
auto-initialises standalone) — it only calls ``ray.init()`` when no
session is active, per the driver contract in ``__ray_entry__.py``.

``--resumable`` runs the partitioned checkpointed build
(:func:`agraph_ray.pipelines.kg_build.build_kg_resumable`): per-partition
lineage manifests under ``<output>/manifests/`` let a resubmitted job
skip every committed partition — the rule's resume-from-checkpoint
requirement. Without it, the single-job streaming build
(:func:`build_kg`) overlaps artifact writes with compute.

Exit status is non-zero on failure; on success one JSON line with the
run metrics (n_nodes, n_edges, n_triples, per-stage seconds) is printed
to stdout for the job log.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _shard_paths(input_path: str) -> list:
    if os.path.isdir(input_path):
        paths = sorted(glob.glob(os.path.join(input_path, "*.parquet")))
        if not paths:
            raise FileNotFoundError(
                f"no *.parquet shards under {input_path}")
        return paths
    return [input_path]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m agraph_ray.job",
        description="transcripts -> knowledge-graph Parquet tables")
    ap.add_argument("--input", required=True,
                    help="transcripts parquet file or directory")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--resumable", action="store_true",
                    help="partitioned build with per-partition checkpoint "
                         "manifests (resubmit skips committed partitions)")
    ap.add_argument("--shards-per-partition", type=int, default=4)
    ap.add_argument("--no-chunks", action="store_true",
                    help="skip the chunk table (triples/nodes only)")
    ap.add_argument("--config-json", default=None,
                    help="JSON object of KGConfig field overrides")
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        # inside `ray job submit` the cluster address comes from the job
        # runtime env; standalone this starts a local session
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 ignore_reinit_error=True)

    from agraph_ray.config import KGConfig
    from agraph_ray.pipelines.kg_build import build_kg, build_kg_resumable

    overrides = json.loads(args.config_json) if args.config_json else {}
    cfg = KGConfig(**overrides)

    if args.resumable:
        res = build_kg_resumable(
            _shard_paths(args.input), args.output, cfg,
            shards_per_partition=args.shards_per_partition)
    else:
        res = build_kg(args.input, args.output, cfg,
                       with_chunks=not args.no_chunks)

    print(json.dumps({"status": "ok", "output": args.output,
                      "metrics": res.metrics}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

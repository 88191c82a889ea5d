"""Job entrypoint for the KG construction pipeline.

Submit with:

    ray job submit --working-dir . -- python jobs/run_pipeline.py \
        --sf-dir /root/testdata/sf0.1 --out /tmp/kg_out --shards 8

Runs the checkpointed sharded pipeline (resume-safe: re-running skips
completed shards via the output manifest).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/kg_out")
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--concurrency", type=int, default=4)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import __ray_entry__  # noqa: F401  (ships the package by value to workers)

    from odinson_ray.state.checkpoint import kg_run_sharded

    manifest = kg_run_sharded(
        args.sf_dir, args.out, num_shards=args.shards, concurrency=args.concurrency
    )
    print(json.dumps({"completed_shards": len(manifest), "out": args.out,
                      "manifest": manifest}))
    ray.shutdown()


if __name__ == "__main__":
    main()

"""Per-stage wall-time audit of the flagship pipeline (ds.stats()).

Usage:  python scripts/stats_audit.py [sf_dir] [num_cpus] [replicate]

Runs the headline KG pipeline once and prints Ray Data's operator-level
stats so regressions in any stage (matcher pool vs shuffle vs stateless
maps) are visible — the "wall-time dominated by useful compute" check.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.op_resource_reservation_enabled = False
    import __ray_entry__  # noqa: F401

    from odinson_ray.pipelines.kg import triples_dataset

    ds = triples_dataset(sf_dir, concurrency=max(2, round(num_cpus * 3 / 4)))
    n = ds.count()
    print(f"rows: {n}\n")
    print(ds.stats())
    ray.shutdown()


if __name__ == "__main__":
    main()

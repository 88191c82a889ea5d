"""Resumable execution: per-shard checkpointed pipeline runs.

The 100 TB layout (SURVEY §4 "checkpoint / resume"): input is processed in
shards (fragment ranges); each shard's output is written to its own
parquet directory via write-to-temp + atomic rename, and a manifest
records completed shards with lineage metrics (rows in/out, wall ms,
match counts). A resumed run anti-joins the manifest against the shard
list and only computes what is missing. No output is ever half-visible.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable, Dict, List, Optional


class CheckpointManifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "_manifest.jsonl")
        os.makedirs(out_dir, exist_ok=True)

    def completed(self) -> Dict[str, dict]:
        done = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    if line.strip():
                        rec = json.loads(line)
                        done[rec["shard"]] = rec
        return done

    def record(self, shard: str, **metrics) -> None:
        rec = {"shard": shard, **metrics}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


def run_sharded(
    shards: List[str],
    run_shard: Callable[[str, str], dict],
    out_dir: str,
) -> Dict[str, dict]:
    """Run ``run_shard(shard, shard_out_dir) -> metrics`` for every shard
    not yet in the manifest. Output directories appear atomically.

    Returns the full manifest (completed shards -> lineage metrics)."""
    manifest = CheckpointManifest(out_dir)
    done = manifest.completed()
    for shard in shards:
        if shard in done:
            continue
        final_dir = os.path.join(out_dir, f"shard={shard}")
        tmp_dir = os.path.join(out_dir, f"_tmp_shard={shard}")
        if os.path.exists(tmp_dir):
            shutil.rmtree(tmp_dir)
        if os.path.exists(final_dir):
            shutil.rmtree(final_dir)  # uncommitted leftovers from a crash
        t0 = time.time()
        metrics = run_shard(shard, tmp_dir) or {}
        os.replace(tmp_dir, final_dir)
        metrics.update({"wall_ms": int((time.time() - t0) * 1000)})
        manifest.record(shard, **metrics)
        done[shard] = {"shard": shard, **metrics}
    return manifest.completed()


def kg_run_sharded(sf_dir: str, out_dir: str, num_shards: int = 4,
                   rules_yaml: Optional[str] = None, concurrency: int = 4) -> Dict[str, dict]:
    """Checkpointed flagship run: documents split into doc_id-range shards;
    each shard runs the full KG pipeline and writes its triples partition."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..pipelines.kg import FLAGSHIP_RULES
    from ..sources.interleaved import build_interleaved
    from ..stages.match import GrammarMatcher, clamp_pool
    from ..stages.triples import mentions_to_triples

    rules = rules_yaml or FLAGSHIP_RULES
    n_rows = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    bounds = [round(i * n_rows / num_shards) for i in range(num_shards + 1)]

    def run_shard(shard: str, shard_out: str) -> dict:
        i = int(shard)
        lo, hi = bounds[i], bounds[i + 1]
        docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang", "source"])
        docs = docs.map_batches(
            lambda t: t.filter(
                pc.and_(pc.greater_equal(t["doc_id"], lo), pc.less(t["doc_id"], hi))
            ),
            batch_format="pyarrow",
        )
        mentions = docs.map_batches(build_interleaved, batch_format="pyarrow").map_batches(
            GrammarMatcher,
            fn_constructor_args=(rules,),
            batch_format="pyarrow",
            concurrency=clamp_pool(concurrency),
            batch_size=256,
            num_cpus=1,
        )
        events = mentions.map_batches(
            lambda t: t.filter(pc.equal(t["label"], "SVO")), batch_format="pyarrow"
        )
        triples = events.map_batches(mentions_to_triples, batch_format="pyarrow")
        triples.write_parquet(shard_out)
        n_triples = sum(
            pq.read_metadata(os.path.join(shard_out, f)).num_rows
            for f in os.listdir(shard_out)
            if f.endswith(".parquet")
        )
        return {"docs": hi - lo, "triples": n_triples}

    return run_sharded([str(i) for i in range(num_shards)], run_shard, out_dir)


def kg_run_fragments(sf_dir: str, out_dir: str, fragments, rules_yaml: Optional[str] = None,
                     concurrency: int = 4) -> Dict[str, dict]:
    """Incremental-refresh analogue (the reference's IncrementalOdinsonIndex
    append path): ``fragments`` is a list of (name, lo_doc_id, hi_doc_id)
    input fragments. Re-running with NEW fragments appended computes only
    the delta — completed fragments are skipped via the manifest, so a
    growing corpus is processed append-only."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..pipelines.kg import FLAGSHIP_RULES
    from ..sources.interleaved import build_interleaved
    from ..stages.match import GrammarMatcher, clamp_pool
    from ..stages.triples import mentions_to_triples

    rules = rules_yaml or FLAGSHIP_RULES
    bounds = {name: (lo, hi) for name, lo, hi in fragments}

    def run_shard(shard: str, shard_out: str) -> dict:
        lo, hi = bounds[shard]
        docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang", "source"])
        docs = docs.map_batches(
            lambda t: t.filter(
                pc.and_(pc.greater_equal(t["doc_id"], lo), pc.less(t["doc_id"], hi))
            ),
            batch_format="pyarrow",
        )
        mentions = docs.map_batches(build_interleaved, batch_format="pyarrow").map_batches(
            GrammarMatcher, fn_constructor_args=(rules,), batch_format="pyarrow",
            concurrency=clamp_pool(concurrency), batch_size=256, num_cpus=1,
        )
        events = mentions.map_batches(
            lambda t: t.filter(pc.equal(t["label"], "SVO")), batch_format="pyarrow"
        )
        triples = events.map_batches(mentions_to_triples, batch_format="pyarrow")
        triples.write_parquet(shard_out)
        n_triples = sum(
            pq.read_metadata(os.path.join(shard_out, f)).num_rows
            for f in os.listdir(shard_out) if f.endswith(".parquet")
        )
        return {"docs": hi - lo, "triples": n_triples}

    return run_sharded([name for name, _, _ in fragments], run_shard, out_dir)

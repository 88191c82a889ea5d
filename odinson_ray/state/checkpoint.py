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
    """Append-only JSONL manifest; the LATEST record per shard wins, so an
    updated shard is a new record with a new ``version`` and a deleted
    shard is a record with ``retracted: true`` (the manifest analogue of
    the reference's incremental delete/update of document blocks,
    lucene/index/IncrementalOdinsonIndex.scala:104-121)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "_manifest.jsonl")
        os.makedirs(out_dir, exist_ok=True)

    def completed(self) -> Dict[str, dict]:
        done: Dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    if line.strip():
                        rec = json.loads(line)
                        if rec.get("retracted"):
                            done.pop(rec["shard"], None)
                        else:
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
    versions: Optional[Dict[str, str]] = None,
    retract_missing: bool = False,
) -> Dict[str, dict]:
    """Run ``run_shard(shard, shard_out_dir) -> metrics`` for every shard
    that is new OR whose ``versions[shard]`` differs from the manifest's
    recorded version (update = retract + recompute, atomically replacing
    the shard's output directory). With ``retract_missing``, manifest
    shards absent from ``shards`` have their outputs deleted and are
    marked retracted. Output directories appear atomically.

    Returns the full manifest (completed shards -> lineage metrics)."""
    manifest = CheckpointManifest(out_dir)
    done = manifest.completed()
    versions = versions or {}
    if retract_missing:
        live = set(shards)
        for shard in list(done):
            if shard not in live:
                shutil.rmtree(os.path.join(out_dir, f"shard={shard}"), ignore_errors=True)
                manifest.record(shard, retracted=True)
                done.pop(shard)
    for shard in shards:
        prev = done.get(shard)
        ver = versions.get(shard)
        if prev is not None and prev.get("version") == ver:
            continue
        final_dir = os.path.join(out_dir, f"shard={shard}")
        tmp_dir = os.path.join(out_dir, f"_tmp_shard={shard}")
        if os.path.exists(tmp_dir):
            shutil.rmtree(tmp_dir)
        if os.path.exists(final_dir):
            # uncommitted leftovers from a crash, or the stale output of a
            # changed-version shard being updated
            shutil.rmtree(final_dir)
        t0 = time.time()
        metrics = run_shard(shard, tmp_dir) or {}
        os.replace(tmp_dir, final_dir)
        metrics.update({"wall_ms": int((time.time() - t0) * 1000)})
        if ver is not None:
            metrics["version"] = ver
        manifest.record(shard, **metrics)
        done[shard] = {"shard": shard, **metrics}
    return manifest.completed()


def kg_run_sharded(sf_dir: str, out_dir: str, num_shards: int = 4,
                   rules_yaml: Optional[str] = None, concurrency: int = 4) -> Dict[str, dict]:
    """Checkpointed flagship run: documents split into doc_id-range shards;
    each shard runs the full KG pipeline and writes its triples partition."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from ..sources.io import clean_rd as rd

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
            # replace_schema_metadata: the source parquet's b'pandas'
            # metadata makes pa.Schema unhashable and defeats Ray Data's
            # schema dedup downstream ("Failed to hash the schemas")
            lambda t: t.filter(
                pc.and_(pc.greater_equal(t["doc_id"], lo), pc.less(t["doc_id"], hi))
            ).replace_schema_metadata(None),
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


def fragment_content_version(sf_dir: str, lo: int, hi: int) -> str:
    """Content fingerprint of a doc_id-range fragment (md5 over doc_id+text
    in doc_id order). Used to DETECT in-place fragment updates; at real
    scale prefer the storage layer's fragment version ids (e.g. Lance
    fragment metadata) over re-reading content."""
    import hashlib

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    t = t.filter(pc.and_(pc.greater_equal(t["doc_id"], lo), pc.less(t["doc_id"], hi)))
    t = t.sort_by("doc_id")
    h = hashlib.md5()
    for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        h.update(str(d).encode())
        h.update(b"\x00")
        h.update((x or "").encode())
        h.update(b"\x01")
    return h.hexdigest()


def kg_run_fragments(sf_dir: str, out_dir: str, fragments, rules_yaml: Optional[str] = None,
                     concurrency: int = 4, retract_missing: bool = False) -> Dict[str, dict]:
    """Incremental-refresh analogue (the reference's IncrementalOdinsonIndex
    append/update/delete path, IncrementalOdinsonIndex.scala:104-121):
    ``fragments`` is a list of (name, lo_doc_id, hi_doc_id) or
    (name, lo, hi, version) input fragments.

    - APPEND: re-running with new fragments computes only the delta.
    - UPDATE: a fragment whose ``version`` changed (pass
      fragment_content_version or a storage-layer fragment id) is
      recomputed and its output replaced atomically.
    - DELETE: with ``retract_missing``, fragments dropped from the list
      have their outputs removed and are marked retracted."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from ..sources.io import clean_rd as rd

    from ..pipelines.kg import FLAGSHIP_RULES
    from ..sources.interleaved import build_interleaved
    from ..stages.match import GrammarMatcher, clamp_pool
    from ..stages.triples import mentions_to_triples

    rules = rules_yaml or FLAGSHIP_RULES
    frags = [f if len(f) == 4 else (*f, None) for f in fragments]
    bounds = {name: (lo, hi) for name, lo, hi, _ in frags}
    versions = {name: v for name, _, _, v in frags if v is not None}

    def run_shard(shard: str, shard_out: str) -> dict:
        lo, hi = bounds[shard]
        docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang", "source"])
        docs = docs.map_batches(
            # replace_schema_metadata: the source parquet's b'pandas'
            # metadata makes pa.Schema unhashable and defeats Ray Data's
            # schema dedup downstream ("Failed to hash the schemas")
            lambda t: t.filter(
                pc.and_(pc.greater_equal(t["doc_id"], lo), pc.less(t["doc_id"], hi))
            ).replace_schema_metadata(None),
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

    return run_sharded([name for name, _, _, _ in frags], run_shard, out_dir,
                       versions=versions, retract_missing=retract_missing)

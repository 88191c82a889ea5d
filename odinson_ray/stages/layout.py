"""Hash-bucketed table layouts and shuffle-free co-located joins.

The Hive/Iceberg bucketing idea, Ray-Data-native: pay ONE shuffle at
layout-build time to write a table as parquet partitioned by
hash(key) % n_buckets (with a manifest, atomic publish, and corpus-
version keying — the same discipline as the ANN layouts in stages/ann),
then every later join or per-key aggregate on that key runs with ZERO
runtime shuffle: bucket i of table A joins bucket i of table B inside
one task that reads exactly those files. At 100 TB the build is a
one-time corpus-parallel job amortized across every downstream join;
the per-bucket join tasks are embarrassingly parallel and their memory
is bounded by the largest bucket (hash buckets are balanced unless the
KEY ITSELF is hot, in which case no co-location scheme helps).

Layout roots default to node-local /tmp — single-node only; multi-node
clusters must set ODINSON_RAY_ANN_CACHE to shared storage, enforced
structurally by ann._require_shared_root (same guard, same env var: one
knob for every disk layout this engine builds).
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

import numpy as np
import pyarrow as pa

from .ann import _atomic_publish, _require_shared_root

_CACHE_ROOT = os.environ.get(
    "ODINSON_RAY_ANN_CACHE",
    os.path.join(tempfile.gettempdir(), "odinson_ray_buckets"),
)


def _bucket_ids(col: pa.ChunkedArray, n_buckets: int) -> np.ndarray:
    """Deterministic bucket assignment; identical for any table keyed on
    the same column type, independent of partitioning/retries."""
    from .sketch import _splitmix64

    if pa.types.is_integer(col.type):
        h = _splitmix64(col.to_numpy(zero_copy_only=False).astype(np.uint64))
        return (h % np.uint64(n_buckets)).astype(np.int64)
    return np.fromiter(
        (int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "little")
         % n_buckets for v in col.to_pylist()),
        dtype=np.int64, count=len(col))


def _layout_dir(src: str, key: str, n_buckets: int, cols: str) -> str:
    st = os.stat(src)
    tag = hashlib.md5(
        f"{os.path.abspath(src)}:{st.st_size}:{st.st_mtime_ns}:{key}:"
        f"{n_buckets}:{cols}:v1".encode()).hexdigest()[:16]
    return os.path.join(_CACHE_ROOT, tag)


def bucket_layout(src_parquet: str, key: str, columns,
                  n_buckets: int = 32) -> str:
    """Write ``src_parquet`` (projected to ``columns``) partitioned by
    hash(key) % n_buckets, with a _meta.json manifest (bucket -> file
    list) so readers never list directories. Idempotent per corpus
    version; write-to-temp + atomic rename (crash-safe, race-safe).

    ``columns``: list of source columns, or {src: out} dict to rename at
    write time (joins need the SAME key name on both layouts — bucket on
    the post-rename ``key``)."""
    from ..sources.io import clean_rd as rd

    rename = dict(columns) if isinstance(columns, dict) else {
        c: c for c in columns}
    out = _layout_dir(src_parquet, key, n_buckets,
                      ",".join(f"{k}>{v}" for k, v in sorted(rename.items())))
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    _require_shared_root()
    os.makedirs(_CACHE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=os.path.basename(out) + ".tmp.",
                           dir=_CACHE_ROOT)

    def tag(t: pa.Table) -> pa.Table:
        t = t.rename_columns([rename[c] for c in t.column_names])
        return t.append_column(
            "_bucket", pa.array(_bucket_ids(t[key], n_buckets), pa.int64()))

    (rd.read_parquet(src_parquet, columns=list(rename))
     .map_batches(tag, batch_format="pyarrow")
     .write_parquet(tmp, partition_cols=["_bucket"]))
    buckets = {}
    for d in sorted(os.listdir(tmp)):
        if not d.startswith("_bucket="):
            continue
        bdir = os.path.join(tmp, d)
        files = sorted(f for f in os.listdir(bdir) if f.endswith(".parquet"))
        buckets[d.split("=", 1)[1]] = [f"{d}/{f}" for f in files]
    with open(os.path.join(tmp, "_meta.json"), "w") as fh:
        json.dump({"key": key, "n_buckets": n_buckets, "buckets": buckets}, fh)
    return _atomic_publish(tmp, out)


def bucket_layout_ds(ds, key: str, n_buckets: int, tag: str) -> str:
    """bucket_layout for a DATASET source (e.g. the extracted triple
    stream): same hash(key) % n_buckets partitioned-parquet layout,
    manifest and atomic publish, but cache identity comes from the
    caller-supplied ``tag`` (corpus version) instead of a source file's
    stat — Datasets have no mtime. This is the 'graph materialize' step
    of the north rule: pay the one shuffle-free partitioned write, then
    every downstream per-entity aggregate or join runs one task per
    bucket with zero runtime shuffle."""
    out = os.path.join(_CACHE_ROOT, hashlib.md5(
        f"ds:{tag}:{key}:{n_buckets}:v1".encode()).hexdigest()[:16])
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    _require_shared_root()
    os.makedirs(_CACHE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=os.path.basename(out) + ".tmp.",
                           dir=_CACHE_ROOT)

    def tag_batch(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_bucket", pa.array(_bucket_ids(t[key], n_buckets), pa.int64()))

    ds.map_batches(tag_batch, batch_format="pyarrow").write_parquet(
        tmp, partition_cols=["_bucket"])
    buckets = {}
    for d in sorted(os.listdir(tmp)):
        if not d.startswith("_bucket="):
            continue
        bdir = os.path.join(tmp, d)
        files = sorted(f for f in os.listdir(bdir) if f.endswith(".parquet"))
        buckets[d.split("=", 1)[1]] = [f"{d}/{f}" for f in files]
    with open(os.path.join(tmp, "_meta.json"), "w") as fh:
        json.dump({"key": key, "n_buckets": n_buckets, "buckets": buckets},
                  fh)
    return _atomic_publish(tmp, out)


def bucketed_aggregate(root: str, schema: pa.Schema, agg_fn):
    """Per-bucket aggregate over a bucketed layout with ZERO runtime
    shuffle: one task per bucket reads exactly that bucket's files and
    applies ``agg_fn`` (keys are entirely within one bucket, so per-key
    grouping inside the task is exact and complete)."""
    import ray

    with open(os.path.join(root, "_meta.json")) as fh:
        meta = json.load(fh)
    n = meta["n_buckets"]

    def run_bucket(batch: pa.Table) -> pa.Table:
        outs = []
        for b in batch["b"].to_pylist():
            t = _read_bucket(root, meta, b, schema)
            if t.num_rows:
                outs.append(agg_fn(t))
        if outs:
            return pa.concat_tables(outs)
        # empty bucket: an empty table with the AGGREGATE's schema (None
        # is rejected by map_batches; a zero-column table poisons unions)
        return agg_fn(schema.empty_table())

    ids = ray.data.from_arrow(pa.table({"b": pa.array(range(n), pa.int64())}))
    return ids.map_batches(run_bucket, batch_format="pyarrow", batch_size=1)


def zonemap_layout(src_parquet: str, ts_col: str, columns,
                   n_shards: int = 16) -> str:
    """Write a table as n_shards parquet files in NATURAL ORDER with a
    per-file (min, max) zone map on ``ts_col`` in the manifest — the
    Iceberg/ORC data-skipping idea. No shuffle at build time (unlike
    bucket_layout): zone maps exploit whatever clustering the data
    already has (event streams arrive roughly time-ordered), and a range
    scan then opens only the files whose [min, max] intersects the
    predicate. Stats come from the parquet FOOTERS, not a data scan.
    Idempotent per corpus version; atomic publish."""
    import pyarrow.parquet as pq

    from ..sources.io import clean_rd as rd

    out = _layout_dir(src_parquet, ts_col, n_shards,
                      "zonemap:" + ",".join(sorted(columns)))
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    _require_shared_root()
    os.makedirs(_CACHE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=os.path.basename(out) + ".tmp.",
                           dir=_CACHE_ROOT)
    (rd.read_parquet(src_parquet, columns=list(columns))
     .repartition(n_shards)
     .write_parquet(tmp))
    files = []
    for f in sorted(os.listdir(tmp)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(tmp, f)).metadata
        idx = md.schema.to_arrow_schema().get_field_index(ts_col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                mins, maxs = [], []
                break
            mins.append(st.min)
            maxs.append(st.max)
        if not mins:  # footer stats missing: fall back to a column scan
            col = pq.read_table(os.path.join(tmp, f), columns=[ts_col])
            mins = [pa.compute.min(col[ts_col]).as_py()]
            maxs = [pa.compute.max(col[ts_col]).as_py()]

        def _us(v):
            if hasattr(v, "timestamp"):
                from datetime import timezone

                if v.tzinfo is None:  # parquet stats are UTC-naive
                    v = v.replace(tzinfo=timezone.utc)
                return int(v.timestamp() * 1_000_000)
            return int(v)

        files.append({"file": f, "min_us": min(_us(v) for v in mins),
                      "max_us": max(_us(v) for v in maxs)})
    with open(os.path.join(tmp, "_meta.json"), "w") as fh:
        json.dump({"ts_col": ts_col, "files": files}, fh)
    return _atomic_publish(tmp, out)


def zonemap_scan(root: str, lo_us: int, hi_us: int):
    """Dataset over only the files whose zone map intersects
    [lo_us, hi_us) — the caller applies the exact residual filter (zone
    maps are a superset guarantee). Returns (dataset_or_None,
    n_files_read, n_files_total); None when every file is skipped."""
    from ..sources.io import clean_rd as rd

    with open(os.path.join(root, "_meta.json")) as fh:
        meta = json.load(fh)
    keep = [f["file"] for f in meta["files"]
            if f["min_us"] < hi_us and f["max_us"] >= lo_us]
    total = len(meta["files"])
    if not keep:
        return None, 0, total
    ds = rd.read_parquet([os.path.join(root, f) for f in keep])
    return ds, len(keep), total


def _read_bucket(root: str, manifest: dict, bucket: int,
                 schema: pa.Schema) -> pa.Table:
    import pyarrow.parquet as pq

    files = manifest["buckets"].get(str(bucket), [])
    if not files:
        return schema.empty_table()
    tabs = [pq.read_table(os.path.join(root, f)) for f in files]
    t = pa.concat_tables(tabs)
    return t.select(schema.names)


def bucketed_join(root_a: str, root_b: str, key: str,
                  schema_a: pa.Schema, schema_b: pa.Schema,
                  post=None):
    """Co-located inner join of two layouts bucketed on the SAME key and
    bucket count: one task per bucket reads exactly that bucket's files
    from both roots and joins locally (pyarrow acero) — zero runtime
    shuffle. ``post`` optionally post-processes each bucket's joined
    table IN the same task (e.g. a per-key aggregate: keys are entirely
    within one bucket, so grouping there is exact), which is the whole
    point of bucketing — join + aggregate without any all-to-all."""
    import ray

    with open(os.path.join(root_a, "_meta.json")) as fh:
        meta_a = json.load(fh)
    with open(os.path.join(root_b, "_meta.json")) as fh:
        meta_b = json.load(fh)
    assert meta_a["key"] == meta_b["key"] == key, (meta_a, meta_b, key)
    assert meta_a["n_buckets"] == meta_b["n_buckets"], "bucket counts differ"
    n = meta_a["n_buckets"]

    def join_bucket(batch: pa.Table) -> pa.Table:
        outs = []
        for b in batch["b"].to_pylist():
            ta = _read_bucket(root_a, meta_a, b, schema_a)
            tb = _read_bucket(root_b, meta_b, b, schema_b)
            j = ta.join(tb, keys=key, join_type="inner")
            outs.append(post(j) if post is not None else j)
        return pa.concat_tables(outs) if outs else None

    ids = ray.data.from_arrow(pa.table({"b": pa.array(range(n), pa.int64())}))
    # one bucket per task: per-task memory is one bucket pair, and all
    # n_buckets tasks run independently
    return ids.map_batches(join_bucket, batch_format="pyarrow", batch_size=1)

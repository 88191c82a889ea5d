"""Similarity search over embedding columns.

- brute-force cosine top-k: numpy matmul per batch against a broadcast
  query matrix (the exact baseline; oracle-checkable)
- random-hyperplane LSH buckets: the scale path — vectors are written ONCE
  into a parquet layout partitioned by bucket id (``build_bucket_layout``);
  a query reads only its own bucket partition plus ``probes`` multiprobe
  neighbors, so per-query cost scales with bucket size, not corpus size.
  Recall is validated against the brute-force baseline in tests.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from typing import List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

N_PLANES = 6  # default/minimum: 64 buckets (test-corpus scale)
TARGET_BUCKET_ROWS = 256  # auto-scaling aims for ~this many vectors/bucket
_rng = np.random.RandomState(42)
_PLANES_CACHE = {}


def planes_for_rows(n_rows: int) -> int:
    """Corpus-proportional plane count: ceil(log2(rows / target bucket
    size)), floored at N_PLANES — a 10^9-row corpus gets ~22 planes
    (~4M buckets), keeping probed-candidate counts roughly constant."""
    import math

    if n_rows <= 0:
        return N_PLANES
    return max(N_PLANES, math.ceil(math.log2(max(1.0, n_rows / TARGET_BUCKET_ROWS))))

# bucket-partitioned layouts live outside the (read-only) test data dirs;
# keyed by source file identity so a changed corpus triggers a rebuild
_ANN_CACHE_ROOT = os.environ.get("ODINSON_RAY_ANN_CACHE", "/tmp/odinson_ray_ann_cache")


def _planes(dim: int, n_planes: int = N_PLANES) -> np.ndarray:
    key = (dim, n_planes)
    if key not in _PLANES_CACHE:
        rng = np.random.RandomState(42)
        _PLANES_CACHE[key] = rng.normal(size=(dim, n_planes))
    return _PLANES_CACHE[key]


def bucket_of(vecs: np.ndarray, n_planes: int = N_PLANES) -> np.ndarray:
    """sign-bit bucket ids for a (n, dim) matrix."""
    bits = (vecs @ _planes(vecs.shape[1], n_planes)) > 0
    return (bits * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)


def _make_scorer(qref):
    """map_batches fn: cosine against the broadcast unit query vector."""

    def score(t: pa.Table) -> pa.Table:
        from .link import get_broadcast

        qv = get_broadcast(qref)
        mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        cos = (mat @ qv) / np.where(norms == 0, 1.0, norms)
        return pa.Table.from_pydict(
            {"vec_id": t["vec_id"], "score": pa.array(np.round(cos, 6), pa.float64())}
        )

    return score


def brute_force_topk(sf_dir: str, query_vec: np.ndarray, k: int = 10):
    """Exact cosine top-k via per-batch matmul + global sort/limit."""
    import ray
    import ray.data as rd

    q = np.asarray(query_vec, dtype=np.float64)
    qref = ray.put(q / np.linalg.norm(q))
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ds.map_batches(_make_scorer(qref), batch_format="pyarrow").sort(
        ["score", "vec_id"], descending=[True, False]
    ).limit(k)


def add_bucket_batch(batch: pa.Table, n_planes: int = N_PLANES) -> pa.Table:
    mat = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
    return batch.append_column(
        "bucket", pa.array(bucket_of(mat, n_planes), pa.int64())
    )


def _layout_dir(sf_dir: str, n_planes: int) -> str:
    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{os.path.abspath(src)}:{st.st_size}:{st.st_mtime_ns}:{n_planes}".encode()
    ).hexdigest()[:16]
    return os.path.join(_ANN_CACHE_ROOT, key)


def build_bucket_layout(sf_dir: str, n_planes: "int | None" = None) -> str:
    """Write the embedding table ONCE as parquet partitioned by LSH bucket
    id (hive layout: ``bucket=NN/``). Idempotent per corpus version (keyed
    by source size+mtime); built via write-to-temp + atomic rename so a
    crashed build never leaves a half-visible layout. At 100 TB this is a
    one-time corpus-parallel job whose output is shared by every query."""
    import json

    import pyarrow.parquet as pq
    import ray.data as rd

    if n_planes is None:
        n_rows = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
        n_planes = planes_for_rows(n_rows)
    out = _layout_dir(sf_dir, n_planes)
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    import tempfile

    os.makedirs(_ANN_CACHE_ROOT, exist_ok=True)
    # per-process-unique tmp: a shared `out + ".tmp"` let two concurrent
    # builders delete each other's in-progress fragments and publish a
    # truncated layout
    tmp = tempfile.mkdtemp(prefix=os.path.basename(out) + ".tmp.", dir=_ANN_CACHE_ROOT)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ds.map_batches(
        lambda t: add_bucket_batch(t, n_planes), batch_format="pyarrow"
    ).write_parquet(tmp, partition_cols=["bucket"])
    with open(os.path.join(tmp, "_meta.json"), "w") as fh:
        json.dump({"n_planes": n_planes}, fh)
    shutil.rmtree(out, ignore_errors=True)  # stale/incomplete previous build
    try:
        os.replace(tmp, out)
    except OSError:
        # another builder won the publish race; use theirs
        shutil.rmtree(tmp, ignore_errors=True)
        return out
    with open(os.path.join(out, "_SUCCESS"), "w"):
        pass
    return out


def lsh_topk(sf_dir: str, query_vec: np.ndarray, k: int = 10, probes: int = 6):
    """Approximate top-k over the persisted bucket-partitioned layout:
    reads ONLY the query's bucket partition and its ``probes`` nearest
    (single-bit-flip) multiprobe buckets — candidates scanned is the sum
    of probed bucket sizes, independent of corpus size. Returns a Dataset
    (vec_id, score) of the top k by cosine.

    NOTE (multi-node): the layout directory must live on storage visible
    to driver AND workers (object store / NFS — set ODINSON_RAY_ANN_CACHE);
    the default /tmp path is only correct single-node, since bucket
    discovery lists the directory driver-side."""
    import ray
    import ray.data as rd

    import json

    layout = build_bucket_layout(sf_dir)
    with open(os.path.join(layout, "_meta.json")) as fh:
        n_planes = json.load(fh)["n_planes"]
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    qbits = int(bucket_of(q[None, :], n_planes)[0])
    # multiprobe: flip each single plane bit
    targets = {qbits} | {qbits ^ (1 << i) for i in range(min(probes, n_planes))}
    dirs = [os.path.join(layout, f"bucket={b}") for b in sorted(targets)]
    paths = [
        os.path.join(d, f)
        for d in dirs if os.path.isdir(d)
        for f in sorted(os.listdir(d)) if f.endswith(".parquet")
    ]
    if not paths:
        return rd.from_arrow(
            pa.table({"vec_id": pa.array([], pa.int64()),
                      "score": pa.array([], pa.float64())})
        )
    qref = ray.put(qn)
    ds = rd.read_parquet(paths, columns=["vec_id", "embedding"])
    return ds.map_batches(_make_scorer(qref), batch_format="pyarrow").sort(
        ["score", "vec_id"], descending=[True, False]
    ).limit(k)

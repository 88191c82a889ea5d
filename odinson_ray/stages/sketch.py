"""Mergeable sketches for approximate distinct counting at 100-TB scale.

HyperLogLog: per-batch register arrays (m = 2^p bytes per group per
batch) merged by elementwise max — the shuffle moves m-byte blobs, one
per (group, batch), NEVER the value stream. Exact distinct counting of a
high-cardinality column requires shuffling every distinct value
(distinct_users_per_type does exactly that and stays as the exact
operator); the sketch bounds shuffle bytes by #groups x #batches x m
with ~1.04/sqrt(m) relative error (~1.6% at p=12).

Hashing: splitmix64 finalizer over int64 keys (vectorized, deterministic,
no hash-seed dependence); strings hash via md5's first 8 bytes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_P = 12
_M = 1 << _P
# standard HLL bias constant for m >= 128
_ALPHA = 0.7213 / (1.0 + 1.079 / _M)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _hash_values(col: pa.ChunkedArray) -> np.ndarray:
    if pa.types.is_integer(col.type):
        return _splitmix64(col.to_numpy(zero_copy_only=False).astype(np.int64))
    return np.fromiter(
        (int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "little")
         for v in col.to_pylist()),
        dtype=np.uint64, count=len(col))


def _registers(hashes: np.ndarray, group_idx: np.ndarray,
               n_groups: int) -> np.ndarray:
    """(n_groups, m) uint8 register matrix from hashed values."""
    regs = np.zeros((n_groups, _M), dtype=np.uint8)
    if len(hashes) == 0:
        return regs
    bucket = (hashes >> np.uint64(64 - _P)).astype(np.int64)
    w = hashes & np.uint64((1 << (64 - _P)) - 1)
    # rank = leading-zero count within the (64-p)-bit tail + 1;
    # w < 2^52 is exactly representable in float64, so log2 is exact
    nz = w > 0
    rank = np.full(len(w), 64 - _P + 1, dtype=np.uint8)
    rank[nz] = (64 - _P - np.floor(np.log2(w[nz].astype(np.float64)))).astype(np.uint8)
    np.maximum.at(regs, (group_idx, bucket), rank)
    return regs


def hll_partial_batch(t: pa.Table, group: str, value: str) -> pa.Table:
    """One (group, m-byte register blob) row per distinct group per batch."""
    keys = t[group].to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(keys, return_inverse=True)
    regs = _registers(_hash_values(t[value]), inv, len(uniq))
    return pa.table({
        group: pa.array(uniq.tolist(), t.schema.field(group).type),
        "_regs": pa.array([r.tobytes() for r in regs], pa.binary()),
    })


def _estimate(regs: np.ndarray) -> int:
    est = _ALPHA * _M * _M / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * _M and zeros:  # small-range linear counting
        est = _M * np.log(_M / zeros)
    return int(round(est))


def hll_distinct(ds, group: str, value: str, out: str = "approx_distinct"):
    """Approximate COUNT(DISTINCT value) per group: per-batch register
    partials -> groupby(group) elementwise-max merge -> estimate. The
    merge sees O(#batches) m-byte rows per group, never values."""

    def merge(g: pa.Table) -> pa.Table:
        regs = np.zeros(_M, dtype=np.uint8)
        for blob in g["_regs"].to_pylist():
            np.maximum(regs, np.frombuffer(blob, dtype=np.uint8), out=regs)
        return pa.table({
            group: g[group].slice(0, 1),
            out: pa.array([_estimate(regs)], pa.int64()),
        })

    partials = ds.map_batches(
        lambda t: hll_partial_batch(t, group, value), batch_format="pyarrow")
    return partials.groupby(group).map_groups(merge, batch_format="pyarrow")

"""Skew-aware shuffle utilities.

Zipfian-hot keys (frequent entities) make a naive groupby shuffle lopsided:
one reducer receives the head key's entire stream. Two complementary
mitigations, both used by the KG pipeline:

1. ``partial-aggregate before shuffle`` (stages/triples.py): each batch
   collapses to one row per distinct key, bounding any key's fan-in to the
   number of batches. Best when the aggregate is algebraic (count/sum).
2. ``salted_aggregate`` (here): an explicit salt column splits each key
   into ``salt`` sub-keys; stage 1 aggregates (key, salt) — spreading a hot
   key over ``salt`` reducers — and stage 2 merges the per-salt partials
   with a groupby that is at most ``salt`` rows per key. Use when values
   (not just counts) must flow through the shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def add_salt(batch: pa.Table, key: str, salt: int) -> pa.Table:
    """Deterministic salt derived from a row hash (stable across runs)."""
    import zlib

    vals = batch[key].to_pylist()
    salts = [zlib.crc32(repr(v).encode()) // 7 % salt for v in vals]
    return batch.append_column("_salt", pa.array(salts, pa.int32()))


def salted_aggregate(ds, key: str, value: str, salt: int = 8, agg: str = "sum"):
    """Two-stage salted aggregation: groupby (key, _salt) then merge.

    Returns a Dataset with columns (key, <value agg alias 'total'>).
    """
    from ray.data.aggregate import Count, Sum

    salted = ds.map_batches(lambda b: add_salt(b, key, salt), batch_format="pyarrow")
    if agg == "count":
        stage1 = salted.groupby([key, "_salt"]).aggregate(Count(alias_name="_partial"))
    else:
        stage1 = salted.groupby([key, "_salt"]).aggregate(Sum(value, alias_name="_partial"))
    # stage 2 shuffles at most `salt` rows per key
    return stage1.groupby(key).aggregate(Sum("_partial", alias_name="total"))

"""Canonicalization: union-find over surface-form equivalence edges.

North-rule stage (SURVEY §2.4 "canonicalization merge"). The only stage
with cross-document state, isolated as an explicit small shuffle:

1. per batch, emit DISTINCT (surface, key) pairs (tiny vs the corpus)
2. ``groupby(key)`` over the distinct pairs — the shuffle moves only the
   vocabulary, not the mention stream
3. driver-side union-find over the (small) key set joins keys linked by
   extra equivalence edges (e.g. alias synonyms)
4. the resulting {surface -> canonical} dict is broadcast back and applied
   inside map_batches

At 100 TB the mention stream never shuffles for canonicalization: only the
distinct-surface vocabulary does. Hot surfaces (Zipfian heads) are handled
by the per-batch distinct (each batch contributes a surface once).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Tuple

import pyarrow as pa

from .link import canon_key


class UnionFind:
    def __init__(self):
        self.parent: Dict[str, str] = {}

    def find(self, x: str) -> str:
        parent = self.parent
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller root wins
            lo, hi = sorted((ra, rb))
            self.parent[hi] = lo


def distinct_surface_pairs(batch: pa.Table, columns=("subj", "obj")) -> pa.Table:
    """Per-batch combiner: distinct (surface, key) pairs."""
    seen = {}
    for col in columns:
        if col in batch.column_names:
            for s in batch[col].to_pylist():
                if s not in seen:
                    seen[s] = canon_key(s)
    return pa.Table.from_pydict(
        {
            "surface": pa.array(list(seen.keys()), pa.string()),
            "key": pa.array(list(seen.values()), pa.string()),
        }
    )


def build_canonical_mapping(
    pairs: Iterable[Tuple[str, str]],
    extra_edges: Iterable[Tuple[str, str]] = (),
) -> Dict[str, str]:
    """Union-find over keys; canonical id of a surface is "ent:" + the
    representative key of its class (deterministically the smallest)."""
    uf = UnionFind()
    pair_list = list(pairs)
    for _, key in pair_list:
        uf.find(key)
    for a, b in extra_edges:
        uf.union(canon_key(a), canon_key(b))
    return {surface: "ent:" + uf.find(key) for surface, key in pair_list}


def canonicalize_dataset(ds, columns=("subj", "obj"), extra_edges=()):
    """Full stage: distinct pairs -> driver union-find -> broadcast apply.

    Returns (mapped_ds, mapping_dict). The distinct-pairs intermediate is
    materialized (it is vocabulary-sized); the main stream is not.
    """
    import ray

    pairs_ds = ds.map_batches(
        lambda b: distinct_surface_pairs(b, columns), batch_format="pyarrow"
    )
    # distributed dedup first (groupby over per-batch distinct pairs), so
    # only one row per distinct surface reaches the driver
    from ray.data.aggregate import Count

    pairs_tbl = (
        pairs_ds.groupby(["surface", "key"]).aggregate(Count(alias_name="_n"))
        .to_pandas()[["surface", "key"]]
    )
    mapping = build_canonical_mapping(
        pairs_tbl.itertuples(index=False, name=None), extra_edges
    )
    from .link import get_broadcast

    mapping_ref = ray.put(mapping)

    def apply_canon(batch: pa.Table) -> pa.Table:
        m = get_broadcast(mapping_ref)
        for col in columns:
            if col in batch.column_names:
                vals = [m.get(s, "ent:" + canon_key(s)) for s in batch[col].to_pylist()]
                batch = batch.append_column(col + "_canon", pa.array(vals, pa.string()))
        return batch

    # stateless fn: fuses with neighbors, reserves no actor CPUs
    mapped = ds.map_batches(apply_canon, batch_format="pyarrow")
    return mapped, mapping

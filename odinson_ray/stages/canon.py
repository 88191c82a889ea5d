"""Canonicalization: union-find over surface-form equivalence edges.

North-rule stage (SURVEY §2.4 "canonicalization merge"). Key scaling
insight (round 2 — replaces the driver-side whole-vocabulary union-find
flagged in VERDICT r01 "What's wrong" #5): a surface with NO equivalence
edge canonicalizes to its own normalized key, a pure per-row function.
Global state is only needed for keys touched by edges. Therefore:

- ``canonicalize_dataset``: the broadcast side is the union-find over
  ``extra_edges`` ONLY (the alias/KB side — small by construction), never
  the corpus vocabulary. The mention stream is mapped per batch with a
  per-row key function plus a lookup into that small root map. No
  vocabulary shuffle, no driver ``to_pandas()``, works at any corpus size.
- ``connected_components``: for CORPUS-DERIVED edge streams (billions of
  edges, driver-side union-find impossible), a distributed min-label
  propagation over hash-partitioned joins — the MapReduce connected-
  components pattern. Hot (Zipfian) nodes are handled by the per-round
  combiner (groupby-min collapses a node's incoming labels).
- ``canonicalize_with_edges_dataset``: applies a components root table to
  a mention stream via a left-outer hash join (both sides stay
  distributed).
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


def build_root_map(extra_edges: Iterable[Tuple[str, str]]) -> Dict[str, str]:
    """Union-find over the EDGE-TOUCHED keys only; {key -> component root}
    for every key that appears in an edge (identity for all others, which
    therefore need no entry). Size is O(|edges|), independent of corpus."""
    uf = UnionFind()
    touched: List[str] = []
    for a, b in extra_edges:
        ka, kb = canon_key(a), canon_key(b)
        touched.append(ka)
        touched.append(kb)
        uf.union(ka, kb)
    return {k: uf.find(k) for k in touched}


def canonicalize_dataset(ds, columns=("subj", "obj"), extra_edges=()):
    """Canonicalize surface columns: ``col_canon = "ent:" + root(key(col))``.

    Returns (mapped_ds, root_map). The broadcast ``root_map`` covers only
    edge-touched keys (small side); every other surface maps to its own
    key per row. The corpus never shuffles and no vocabulary is pulled to
    the driver."""
    import ray

    from .link import get_broadcast

    roots = build_root_map(extra_edges)
    mapping_ref = ray.put(roots)

    def apply_canon(batch: pa.Table) -> pa.Table:
        from .link import map_unique_strings

        m = get_broadcast(mapping_ref)

        def one(s: str) -> str:
            k = canon_key(s)
            return "ent:" + m.get(k, k)

        for col in columns:
            if col in batch.column_names:
                batch = batch.append_column(
                    col + "_canon", map_unique_strings(batch[col], one)
                )
        return batch

    # stateless fn: fuses with neighbors, reserves no actor CPUs
    mapped = ds.map_batches(apply_canon, batch_format="pyarrow")
    return mapped, roots


# --------------------------------------------------- distributed components

def _dedupe_edges_batch(t: pa.Table) -> pa.Table:
    """Per-batch combiner: normalized (lo, hi) distinct edges."""
    seen = set()
    for a, b in zip(t["a"].to_pylist(), t["b"].to_pylist()):
        ka, kb = canon_key(a), canon_key(b)
        if ka == kb:
            continue
        seen.add((min(ka, kb), max(ka, kb)))
    lo = [p[0] for p in sorted(seen)]
    hi = [p[1] for p in sorted(seen)]
    return pa.table({"a": pa.array(lo, pa.string()), "b": pa.array(hi, pa.string())})


def connected_components(edges_ds, max_rounds: int = 25,
                         checkpoint_dir: "str | None" = None,
                         stats: "dict | None" = None,
                         small_graph_threshold: int = 2_000_000):
    """Distributed connected components over an edge Dataset (a, b) of
    surface strings; returns a Dataset (node, root) with root = the
    lexicographically smallest key in the component.

    Min-label propagation WITH POINTER JUMPING (VERDICT r02 item 4 /
    ADVICE r02): each round (1) every node adopts the smallest label among
    itself and its neighbors' labels, then (2) jumps through the previous
    round's label map (``label := prev_label(label)``). Jumping roughly
    doubles the propagation distance per round, so convergence is
    O(log diameter) rounds — a 10^6-link chain converges in ~20 rounds
    instead of 10^6. Per round: two hash joins + one groupby-min — all
    distributed; the driver sees only the scalar changed-row count.

    Iterative Datasets must be pinned each round (otherwise lineage
    re-executes all prior rounds); by default that pin is ``materialize()``
    (object store). For graphs near object-store capacity pass
    ``checkpoint_dir`` to spill each round's label table to parquet
    instead, bounding object-store residency to ~one round.

    Raises RuntimeError if ``max_rounds`` is exhausted with labels still
    changing (was a silent RuntimeWarning; with pointer jumping 25 rounds
    covers diameters up to ~2^25, so hitting this means something is
    genuinely wrong). ``stats``, if given, receives ``{"rounds": n}``.

    ADAPTIVE small-graph path: the deduped edge set is counted after the
    per-batch combiner (the count is free — the edge table must be pinned
    for the iteration anyway). At or below ``small_graph_threshold`` edges
    the component structure is computed with the exact driver-side
    union-find and returned as a Dataset — identical output (same
    UnionFind the distributed path is pinned against in tests), zero
    iterative shuffles. This is the same small-side discipline as the
    alias-table broadcast: near-dup/alias edge sets are orders of
    magnitude smaller than the corpus even at 100 TB. Corpora whose edge
    streams exceed the gate (the billions-of-edges case the distributed
    path exists for) take the propagation rounds unchanged; pass
    ``small_graph_threshold=0`` to force them (tests do).
    ``stats["rounds"]`` is 0 on the driver path."""
    from ..sources.io import clean_rd as rd
    from ray.data.aggregate import Min

    from .shuffle import hash_join

    def pin(lazy_ds, name):
        """Pin an iteration result: object-store materialize by default,
        parquet spill when checkpoint_dir is set."""
        if checkpoint_dir is None:
            return lazy_ds.materialize()
        import os
        import shutil

        path = os.path.join(checkpoint_dir, name)
        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)
        lazy_ds.write_parquet(path)
        return rd.read_parquet(path)

    _nbr_schema = pa.schema([("node", pa.string()), ("nbr", pa.string())])
    _lbl_schema = pa.schema([("node", pa.string()), ("label", pa.string())])
    edges = edges_ds.map_batches(_dedupe_edges_batch, batch_format="pyarrow")
    # symmetric neighbor list (node, nbr), plus self rows so isolated
    # endpoints keep their own label
    def symmetric(t: pa.Table) -> pa.Table:
        a = t["a"].to_pylist()
        b = t["b"].to_pylist()
        return pa.table(
            {"node": pa.array(a + b, pa.string()), "nbr": pa.array(b + a, pa.string())}
        )

    # bound every round's shuffle width: the edge stream may arrive in
    # hundreds of splinter blocks (upstream map_groups), and each CC round
    # inherits that as its sort-partition count — repartition ONCE to a
    # cluster-proportional block count before pinning
    try:
        import ray

        nblocks = max(8, 2 * int(ray.cluster_resources().get("CPU", 4)))
    except Exception:
        nblocks = 8
    edges_pinned = pin(edges.repartition(nblocks), "cc_edges")
    if edges_pinned.count() <= small_graph_threshold:
        uf = UnionFind()
        nodes: set = set()
        for t in edges_pinned.iter_batches(batch_format="pyarrow"):
            for a, b in zip(t["a"].to_pylist(), t["b"].to_pylist()):
                # _dedupe_edges_batch already canon_key'd both endpoints
                nodes.add(a)
                nodes.add(b)
                uf.union(a, b)
        if stats is not None:
            stats["rounds"] = 0
        ordered = sorted(nodes)
        return rd.from_arrow(pa.table({
            "node": pa.array(ordered, pa.string()),
            "root": pa.array([uf.find(n) for n in ordered], pa.string()),
        }))
    nbrs = pin(
        edges_pinned.map_batches(symmetric, batch_format="pyarrow")
        .repartition(nblocks),
        "cc_nbrs",
    )
    # initial labels: label(node) = node (distinct nodes via groupby-min)
    labels = pin(
        nbrs.map_batches(
            lambda t: pa.table({"node": t["node"], "label": t["node"]}),
            batch_format="pyarrow",
        )
        .groupby("node")
        .aggregate(Min("label", alias_name="label")),
        "cc_labels_init",
    )
    from ray.data.aggregate import Max

    import pyarrow.compute as pc

    _jmp_schema = pa.schema(
        [("node", pa.string()), ("label", pa.string()), ("old", pa.string())]
    )
    rounds_used = max_rounds
    changed = -1
    for rnd in range(max_rounds):
        # label(nbr) for each (node, nbr): hash-join labels onto nbr;
        # candidate rows carry old=null, self rows carry old=label, so ONE
        # groupby yields both the new label (Min over candidates+self) and
        # the previous one (Max ignores nulls; exactly one self row/node)
        # — change detection without a second join.
        prop = hash_join(
            nbrs, labels, on="nbr", right_on="node",
            left_schema=_nbr_schema, right_schema=_lbl_schema,
        ).map_batches(
            lambda t: pa.table({
                "node": t["node"], "cand": t["label"],
                "old": pa.nulls(len(t), pa.string()),
            }),
            batch_format="pyarrow",
        )
        self_rows = labels.map_batches(
            lambda t: pa.table({
                "node": t["node"], "cand": t["label"], "old": t["label"],
            }),
            batch_format="pyarrow",
        )
        propagated = (
            prop.union(self_rows)
            .groupby("node")
            .aggregate(Min("cand", alias_name="label"),
                       Max("old", alias_name="old"))
        )
        # POINTER JUMP: label := prev_label(label). Labels are node ids and
        # prev_label(x) <= x (self rows are in every min), so jumping
        # through the previous round's (pinned) map is a pure contraction
        # and needs no extra materialization of `propagated`.
        jumped = hash_join(
            propagated, labels, on="label", right_on="node",
            how="left_outer", left_schema=_jmp_schema,
            right_schema=_lbl_schema, right_suffix="_j",
        )

        def finish_round(t: pa.Table) -> pa.Table:
            lbl = pc.coalesce(
                pc.min_element_wise(t["label_j"], t["label"]), t["label"]
            )
            return pa.table({
                "node": t["node"], "label": lbl,
                "chg": pc.cast(pc.not_equal(lbl, t["old"]), pa.int64()),
            })

        # repartition before the pin: sort-shuffle output block counts
        # compound round over round otherwise (each round inherits and
        # multiplies the previous round's partitioning), which makes round
        # wall-time grow exponentially with tiny blocks
        new_labels = pin(
            jumped.map_batches(finish_round, batch_format="pyarrow")
            .repartition(nblocks),
            f"cc_labels_{rnd % 2}",
        )
        changed = int(new_labels.sum("chg") or 0)
        labels = new_labels.drop_columns(["chg"])
        if changed == 0:
            rounds_used = rnd + 1
            break
    else:
        raise RuntimeError(
            f"connected_components: max_rounds={max_rounds} exhausted with "
            f"{changed} labels still changing — components are NOT fully "
            "merged; raise max_rounds (with pointer jumping this covers "
            f"diameters up to ~2^{max_rounds}, so check the input graph)"
        )
    if stats is not None:
        stats["rounds"] = rounds_used
    return labels.map_batches(
        lambda t: pa.table({"node": t["node"], "root": t["label"]}),
        batch_format="pyarrow",
    )


def canonicalize_with_edges_dataset(ds, edges_ds, columns=("subj", "obj"),
                                    ds_schema: "pa.Schema | None" = None):
    """Canonicalize against a corpus-derived edge STREAM: distributed
    components + left-outer hash joins of the root table onto the mention
    stream. Nothing driver-side at any scale. Pass ``ds_schema`` when the
    stream schema is statically known to avoid a schema-sampling pass."""
    from .shuffle import hash_join

    roots = connected_components(edges_ds).materialize()
    root_schema = pa.schema([("node", pa.string()), ("root", pa.string())])
    from .shuffle import as_arrow_schema

    cur_schema = as_arrow_schema(ds_schema if ds_schema is not None else ds.schema())
    out = ds
    for col in columns:
        def add_key(t: pa.Table, col=col) -> pa.Table:
            from .link import map_unique_strings

            return t.append_column(
                "_key_" + col, map_unique_strings(t[col], canon_key)
            )

        out = out.map_batches(add_key, batch_format="pyarrow")
        keyed_schema = cur_schema.append(pa.field("_key_" + col, pa.string()))
        out = hash_join(
            out, roots, on="_key_" + col, right_on="node", how="left_outer",
            left_schema=keyed_schema, right_schema=root_schema,
        )

        def finish(t: pa.Table, col=col) -> pa.Table:
            keys = t["_key_" + col].to_pylist()
            rts = t["root"].to_pylist()
            vals = ["ent:" + (r if r is not None else k) for k, r in zip(keys, rts)]
            t = t.drop_columns(["_key_" + col, "root"])
            return t.append_column(col + "_canon", pa.array(vals, pa.string()))

        out = out.map_batches(finish, batch_format="pyarrow")
        cur_schema = cur_schema.append(pa.field(col + "_canon", pa.string()))
    return out

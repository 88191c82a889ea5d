"""Degree-oriented triangle counting (stages/graph.py) — VERDICT r03 #2."""

import itertools

import pyarrow as pa
import pytest


def _edges_ds(pairs):
    import ray.data as rd

    lo = [min(a, b) for a, b in pairs]
    hi = [max(a, b) for a, b in pairs]
    t = pa.table({"lo": pa.array(lo, pa.string()), "hi": pa.array(hi, pa.string())})
    return rd.from_arrow(t)


def _local_triangles(pairs):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = 0
    for v in adj:
        for a, b in itertools.combinations(sorted(adj[v]), 2):
            if v < a and b in adj[a]:
                n += 1
    return n


def test_triangle_count_matches_local(ray_session):
    from odinson_ray.stages.graph import triangle_count

    # K4 plus a pendant chain plus a square (no diagonal)
    pairs = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
             ("c", "d"), ("d", "e"), ("e", "f"),
             ("p", "q"), ("q", "r"), ("r", "s"), ("p", "s")]
    assert triangle_count(_edges_ds(pairs)) == _local_triangles(pairs) == 4


def test_star_hub_wedges_linear_not_quadratic(ray_session):
    """A hub of degree 1000 sitting lexicographically in the MIDDLE of its
    leaves produced (deg/2)^2 wedges under the old lexicographic
    orientation; degree orientation points every leaf at the hub, so the
    hub has out-degree 0 and the wedge stage emits ZERO rows."""
    from odinson_ray.stages.graph import (orient_by_degree, oriented_wedges,
                                          triangle_count)

    hub = "mmm"
    leaves = [f"a{i:03d}" for i in range(500)] + [f"z{i:03d}" for i in range(500)]
    pairs = [(hub, leaf) for leaf in leaves]
    edges = _edges_ds(pairs)
    oriented = orient_by_degree(edges).materialize()
    src = oriented.to_pandas()
    # every edge oriented leaf -> hub (leaf degree 1 < hub degree 1000)
    assert (src["dst"] == hub).all()
    n_wedges = oriented_wedges(oriented).count()
    assert n_wedges == 0  # bounded: not ~250k as under middle-hub lexicographic
    assert triangle_count(edges) == 0


def test_star_plus_triangles(ray_session):
    """Hub star with a few real triangles hanging off leaves: count stays
    exact while the hub contributes no wedge blow-up."""
    from odinson_ray.stages.graph import oriented_wedges, orient_by_degree, triangle_count

    hub = "mmm"
    leaves = [f"a{i:03d}" for i in range(100)] + [f"z{i:03d}" for i in range(100)]
    pairs = [(hub, leaf) for leaf in leaves]
    # close 10 triangles through the hub: leaf pairs (a_i, z_i) for i<10
    pairs += [(f"a{i:03d}", f"z{i:03d}") for i in range(10)]
    edges = _edges_ds(pairs)
    assert triangle_count(edges) == _local_triangles(pairs) == 10
    # wedge volume is O(hub triangles), not O(deg^2): the closing-edge
    # endpoints have degree 2, so wedges form only at those 20 vertices
    n_wedges = oriented_wedges(orient_by_degree(edges).materialize()).count()
    assert n_wedges <= 40

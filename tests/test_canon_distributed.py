"""Distributed canonicalization: small-side union-find broadcast,
distributed connected components, and the Zipfian-skew apply path
(VERDICT r01 next-round item 5)."""

import numpy as np
import pandas as pd


def test_canonicalize_extra_edges_broadcast(ray_session):
    import ray.data as rd

    from odinson_ray.stages.canon import canonicalize_dataset

    ds = rd.from_pandas(
        pd.DataFrame({"subj": ["Apple", "Foo"], "obj": ["apple inc", "Bar"]})
    )
    mapped, roots = canonicalize_dataset(ds, extra_edges=[("Apple", "apple inc")])
    df = mapped.to_pandas().sort_values("subj").reset_index(drop=True)
    # edge-linked surfaces share one canonical id (the smallest key)
    assert df.loc[0, "subj_canon"] == df.loc[0, "obj_canon"]
    # un-linked surfaces keep identity canonicalization with NO entry in
    # the broadcast map (it holds only edge-touched keys)
    assert df.loc[1, "subj_canon"].startswith("ent:")
    assert len(roots) == 2


def test_connected_components_matches_union_find(ray_session):
    import ray.data as rd

    from odinson_ray.stages.canon import UnionFind, connected_components
    from odinson_ray.stages.link import canon_key

    edges = [
        ("aaa", "bbb"), ("bbb", "ccc"),          # chain -> one component
        ("xxx", "yyy"),                          # separate pair
        ("mmm", "nnn"), ("nnn", "ooo"), ("ooo", "mmm"),  # cycle
    ]
    ds = rd.from_pandas(
        pd.DataFrame({"a": [e[0] for e in edges], "b": [e[1] for e in edges]})
    )
    # distributed propagation path (forced) and the adaptive small-graph
    # driver path (default: 6 edges is far under the gate) must both equal
    # the exact union-find
    stats = {}
    got_df = connected_components(ds, small_graph_threshold=0, stats=stats).to_pandas()
    got = dict(zip(got_df.node, got_df.root))
    assert stats["rounds"] >= 1  # really took the distributed path
    fast_stats = {}
    fast_df = connected_components(ds, stats=fast_stats).to_pandas()
    assert fast_stats["rounds"] == 0  # really took the driver path

    uf = UnionFind()
    keys = set()
    for a, b in edges:
        ka, kb = canon_key(a), canon_key(b)
        keys.update((ka, kb))
        uf.union(ka, kb)
    expect = {k: uf.find(k) for k in keys}
    assert got == expect
    assert dict(zip(fast_df.node, fast_df.root)) == expect


def test_canonicalize_with_edges_zipfian_skew(ray_session):
    """A Zipfian-hot surface stream through the join-based apply path:
    the hot head key must not break correctness (and never routes through
    the driver)."""
    import ray.data as rd

    from odinson_ray.stages.canon import canonicalize_with_edges_dataset
    from odinson_ray.stages.link import canon_key

    rng = np.random.RandomState(7)
    vocab = ["aaa"] + [f"surface-{i:03d}" for i in range(49)]
    # Zipf draw: rank 1 (the head, 'aaa') dominates
    draws = np.minimum(rng.zipf(1.5, size=4000) - 1, len(vocab) - 1)
    surfaces = [vocab[d] for d in draws]
    assert surfaces.count("aaa") > len(surfaces) * 0.3  # genuinely hot head
    ds = rd.from_pandas(pd.DataFrame({"subj": surfaces, "obj": surfaces[::-1]}))
    edges = rd.from_pandas(pd.DataFrame({"a": ["aaa", "bbb"], "b": ["bbb", "ccc"]}))

    out = canonicalize_with_edges_dataset(ds, edges, columns=("subj", "obj")).to_pandas()
    assert len(out) == len(surfaces)
    by_subj = dict(zip(out.subj, out.subj_canon))
    assert by_subj["aaa"] == "ent:" + canon_key("aaa")
    for s in set(surfaces) - {"aaa"}:
        assert by_subj[s] == "ent:" + canon_key(s)


def test_connected_components_long_chain_log_rounds(ray_session):
    """Pointer jumping (VERDICT r02 item 4): a 64-node path graph must
    converge in O(log n) rounds, not O(n). Plain min-label propagation
    would need ~63 rounds; propagate+jump needs <= log2(64)+3 = 9."""
    import ray.data as rd

    from odinson_ray.stages.canon import connected_components

    n = 64
    nodes = [f"n{i:03d}" for i in range(n)]
    df = pd.DataFrame({"a": nodes[:-1], "b": nodes[1:]})
    stats = {}
    got = connected_components(
        rd.from_pandas(df), stats=stats, small_graph_threshold=0
    ).to_pandas()
    assert 1 <= stats["rounds"] <= 9, stats
    assert set(got.root) == {"n000"}
    assert len(got) == n


def test_connected_components_disk_checkpoint(ray_session, tmp_path):
    """checkpoint_dir spills each round's label table to parquet instead
    of pinning it in the object store; results identical."""
    import ray.data as rd

    from odinson_ray.stages.canon import connected_components

    edges = [("aaa", "bbb"), ("bbb", "ccc"), ("xxx", "yyy")]
    ds = rd.from_pandas(
        pd.DataFrame({"a": [e[0] for e in edges], "b": [e[1] for e in edges]})
    )
    got = connected_components(
        ds, checkpoint_dir=str(tmp_path), small_graph_threshold=0
    ).to_pandas()
    assert dict(zip(got.node, got.root)) == {
        "aaa": "aaa", "bbb": "aaa", "ccc": "aaa", "xxx": "xxx", "yyy": "xxx",
    }

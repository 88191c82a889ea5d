"""SemDeDup at-scale policy: corpus-proportional k and the per-cluster
prune cap (fail-open, logged)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def test_clusters_for_rows_policy():
    from odinson_ray.stages.curate import TARGET_CLUSTER_ROWS, clusters_for_rows

    assert clusters_for_rows(0) == 8
    assert clusters_for_rows(500) == 8  # test-corpus scale keeps the floor
    assert clusters_for_rows(10 * TARGET_CLUSTER_ROWS) == 10
    # a 10^9-row corpus gets ~corpus/target clusters, not 8 giant ones
    assert clusters_for_rows(10**9) == -(-10**9 // TARGET_CLUSTER_ROWS)


def _write_embeddings(tmp_path, vecs: np.ndarray):
    df = pd.DataFrame({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": [v.astype(np.float32).tolist() for v in vecs],
    })
    df.to_parquet(f"{tmp_path}/embeddings.parquet", index=False)
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
def test_auto_k_bounds_cluster_size(tmp_path):
    """k=None with a forced-small target splits a 600-row corpus into
    enough clusters that no cluster approaches corpus size."""
    from odinson_ray.stages.curate import semdedup

    rng = np.random.RandomState(3)
    sf = _write_embeddings(tmp_path, rng.normal(size=(600, 16)))
    kept = semdedup(sf, k=None, refinements=1, tau=0.99,
                    target_cluster_rows=50).to_pandas()
    # tau=0.99 on random vectors: nothing pruned, so kept == corpus and
    # the cluster column shows the actual partition sizes
    assert len(kept) == 600
    sizes = kept.groupby("cluster").size()
    assert len(sizes) >= 8  # ceil(600/50)=12 seeds; >=8 survive Lloyd
    assert sizes.max() < 600  # no corpus-sized cluster


@pytest.mark.usefixtures("ray_session")
def test_prune_cap_fail_open(tmp_path):
    """Rows past max_cluster_rows are kept UNEXAMINED (never silently
    dropped), rows under it are pruned normally."""
    from odinson_ray.stages.curate import semdedup

    rng = np.random.RandomState(5)
    base = rng.normal(size=(40, 8))
    # make ids 1..9 near-duplicates of id 0 so the uncapped prune would
    # drop them; ids >= cap would be examined only without the cap
    vecs = base.copy()
    for i in range(1, 10):
        vecs[i] = vecs[0] + rng.normal(scale=1e-3, size=8)
    sf = _write_embeddings(tmp_path, vecs)

    capped = semdedup(sf, k=1, refinements=0, tau=0.95,
                      max_cluster_rows=5).to_pandas()
    uncapped = semdedup(sf, k=1, refinements=0, tau=0.95).to_pandas()

    # uncapped: dup ids 1..9 all pruned
    assert set(range(1, 10)) & set(uncapped.vec_id) == set()
    # capped at 5: ids 1..4 examined (pruned); ids 5..9 past the cap are
    # kept unexamined — fail-open
    assert set(range(1, 5)) & set(capped.vec_id) == set()
    assert set(range(5, 10)) <= set(capped.vec_id)
    # and everything not a duplicate is kept in both
    assert set(range(10, 40)) <= set(capped.vec_id)
    assert set(range(10, 40)) <= set(uncapped.vec_id)

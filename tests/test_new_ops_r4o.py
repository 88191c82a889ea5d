"""Unit pins for batch o: HITS, deterministic random walks, skip-gram
pairs, equi-depth histogram."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def docs_dir(tmp_path):
    df = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["a b c a b", "b b"],
        "lang": ["en", "en"],
        "source": ["s", "s"],
        "n_chars": [9, 3],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_skipgram_pairs_counts(docs_dir):
    from odinson_ray.pipelines.queries4 import q_skipgram_pairs

    out = q_skipgram_pairs(docs_dir, k=100).to_pandas()
    got = {(r.center, r.context): r.n for r in out.itertuples()}
    # doc0 = a b c a b, window 2, both directions; doc1 = b b
    # (a,b): offsets d0: (1,2)+(4,5)@d1, (2? ) — enumerate: positions
    # a@1,b@2,c@3,a@4,b@5. d=1 pairs: (a,b),(b,c),(c,a),(a,b); d=2:
    # (a,c),(b,a),(c,b). Reverse directions double each unordered pair.
    assert got[("a", "b")] == 2 + 1  # d1 x2 + d2 (b,a) reversed -> (a,b)? no:
    # careful: (b,a) d2 means center b context a; reversed emit adds (a,b).
    assert got[("b", "a")] == 3
    assert got[("b", "b")] == 1 + 1  # doc1 d1 both directions
    assert got[("c", "a")] == 2  # (c,a) d1 + (a,c) d2 reversed
    # symmetric by construction
    for (c, x), n in got.items():
        assert got[(x, c)] == n


def test_equidepth_buckets_sum(tmp_path):
    from odinson_ray.pipelines.queries4 import q_equidepth_histogram

    # heavy tie mass: half the rows share one value -> ties must land in
    # the LOWER bucket consistently (value > boundary is false on ties)
    vals = np.concatenate([np.full(500, 5.0), np.arange(500, dtype=float)])
    df = pd.DataFrame({
        "event_id": np.arange(1000), "user_id": np.zeros(1000, int),
        "event_type": ["x"] * 1000, "value": vals,
        "ts": pd.to_datetime("2024-01-01"),
        "props": ["{}"] * 1000,
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = q_equidepth_histogram(str(tmp_path)).to_pandas()
    assert out.n.sum() == 1000
    # the tie value spans several nominal quantiles; all its mass is in
    # one bucket, so some buckets are missing/small — still exact
    assert out.bucket.between(0, 7).all()


def test_random_walks_deterministic():
    # two runs on the same corpus -> identical walks (argmin-md5 choice
    # is a pure function of (cur, step, neighbor), not of partitioning)
    from odinson_ray.pipelines import queries4 as q4

    sf = "/root/testdata/sf0.001"
    a = q4.q_kg_random_walks(sf).to_pandas()
    b = q4.q_kg_random_walks(sf).to_pandas()
    assert len(a) > 0
    a = a.sort_values("start").reset_index(drop=True)
    b = b.sort_values("start").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # every hop is an actual graph edge: walk columns are non-null
    assert a[["v1", "v2", "v3"]].notna().all().all()

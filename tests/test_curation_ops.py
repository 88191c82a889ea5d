"""Curation operators: deterministic sampling, PII scrub, k-means."""

import numpy as np
import pandas as pd


def test_stratified_sample_deterministic(ray_session, sf_dir):
    from odinson_ray.stages.sample import stratified_sample

    a = stratified_sample(sf_dir, rates={"en": 5}).to_pandas()
    b = stratified_sample(sf_dir, rates={"en": 5}).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    en_total = (docs.lang == "en").sum()
    en_kept = (a.lang == "en").sum()
    # ~50% of en kept, ~20% otherwise (hash buckets, not exact)
    assert 0.3 < en_kept / max(en_total, 1) < 0.7


def test_scrub_pii_redacts(ray_session, tmp_path):
    import pyarrow as pa

    from odinson_ray.stages.text import scrub_batch

    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "contact bob.smith+x@example.co.uk now",
            "server at 10.0.255.7 port",
            "id 1234567 ok but 12345 stays",
        ]),
    })
    out = scrub_batch(batch).to_pydict()
    assert out["clean_text"] == [
        "contact [EMAIL] now",
        "server at [IP] port",
        "id [NUM] ok but 12345 stays",
    ]
    assert out["redacted"] == [True, True, True]


def test_kmeans_assignment_matches_local(ray_session, sf_dir):
    """Distributed Lloyd step == plain local numpy k-means (one refinement)."""
    from odinson_ray.stages.sample import kmeans_assign

    got = kmeans_assign(sf_dir, k=8, refinements=1).to_pandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    X = np.stack([np.asarray(v, dtype=np.float64) for v in emb.embedding])
    C = X[:8]
    a = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
    ids = sorted(set(a))
    C1 = np.stack([X[a == c].mean(axis=0) for c in ids])
    a2 = ((X[:, None, :] - C1[None, :, :]) ** 2).sum(-1).argmin(1)
    expect = {int(v): int(ids[c]) for v, c in zip(emb.vec_id, a2)}
    got_map = dict(zip(got.vec_id, got.cluster))
    assert got_map == expect


def test_neardup_groups_matches_union_find(ray_session, sf_dir):
    """Distributed grouping == driver union-find over the verified pairs."""
    from odinson_ray.stages.canon import UnionFind
    from odinson_ray.stages.dedup import minhash_lsh_pairs, neardup_groups

    pairs = minhash_lsh_pairs(sf_dir).to_pandas()
    uf = UnionFind()
    for r in pairs.itertuples():
        uf.union(f"{r.a_id:012d}", f"{r.b_id:012d}")
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    expect = {int(d): int(uf.find(f"{int(d):012d}")) for d in docs.doc_id}
    out = neardup_groups(sf_dir).to_pandas()
    got = {int(r.doc_id): int(r.group_id) for r in out.itertuples()}
    assert got == expect
    # at least one non-singleton cluster exists in the corpus
    assert any(k != v for k, v in got.items())


def test_batch_signature_parity():
    """The vectorized batch signature paths must produce EXACTLY the
    per-row reference values (the md5-derived numbers are the DuckDB
    oracle contract — VERDICT r02 item 6)."""
    from odinson_ray.stages import dedup

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "",
        "one",
        "one two",
        "the quick brown fox jumps over the lazy dog",  # exact dup
        "a b c d e f g h i j k l m n o p q r s t u v w x y z " * 4,
        "unicode töken stream naïve café",
    ]
    sigs = dedup._batch_signatures(texts)
    for i, t in enumerate(texts):
        assert (sigs[i] == dedup.minhash_signature(t)).all(), i
    hs = dedup._batch_simhash(texts)
    for i, t in enumerate(texts):
        assert int(hs[i]) == dedup.simhash64(t), i

"""ngram_jaccard_pairs via the shared AllPairs prefix-filter machinery:
exactness on a hot-source corpus and sub-quadratic candidate volume.

Replaces the retired per-source all-pairs kernel (unbounded O(n^2) per
block when one source is hot)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _hot_source_corpus(tmp_path, n_docs=400, seed=11):
    """One hot source holding EVERY doc; docs are mostly dissimilar
    (random token draws from a wide vocab) with a few planted near-dup
    pairs — the shape where blocking on source alone degenerates."""
    rng = np.random.RandomState(seed)
    vocab = np.array([f"w{i:04d}" for i in range(3000)])
    texts = [" ".join(rng.choice(vocab, size=30, replace=False))
             for _ in range(n_docs)]
    # plant near-dups: doc i+1 = doc i with one token changed
    for i in (10, 50, 90):
        toks = texts[i].split(" ")
        toks[0] = "zzz"
        texts[i + 1] = " ".join(toks)
    df = pd.DataFrame({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts,
        "source": ["hot"] * n_docs,
    })
    df.to_parquet(f"{tmp_path}/documents.parquet", index=False)
    return str(tmp_path), df


def _brute(df, threshold):
    from odinson_ray.stages.dedup import jaccard

    rows = []
    by_src = df.groupby("source")
    for _, g in by_src:
        ids = g.doc_id.to_numpy()
        texts = g.text.to_numpy()
        for i in range(len(ids)):
            for k in range(i + 1, len(ids)):
                j = jaccard(texts[i], texts[k])
                if j >= threshold:
                    rows.append((min(ids[i], ids[k]), max(ids[i], ids[k]),
                                 round(j, 6)))
    return sorted(rows)


@pytest.mark.usefixtures("ray_session")
def test_ngram_allpairs_exact_on_hot_source(tmp_path):
    from odinson_ray.stages.dedup import ngram_jaccard_pairs

    sf, df = _hot_source_corpus(tmp_path)
    got = ngram_jaccard_pairs(sf, threshold=0.3).to_pandas()
    got_rows = sorted((min(a, b), max(a, b), j)
                      for a, b, j in zip(got.a_id, got.b_id, got.j))
    assert got_rows == _brute(df, 0.3)
    assert len(got_rows) >= 3  # the planted near-dups were found


@pytest.mark.usefixtures("ray_session")
def test_ngram_allpairs_candidates_subquadratic(tmp_path):
    """The candidate stage (pre-verify) must NOT enumerate the hot
    source's full n^2/2 pair set — the prefix filter on rare shingles
    keeps candidates near the true-pair count on a diverse corpus."""
    import pyarrow as pa

    from odinson_ray.stages.dedup import (allpairs_prefix_candidates,
                                          shingles)

    sf, df = _hot_source_corpus(tmp_path)
    import ray.data as rdata

    feats, ids, ns, blocks = [], [], [], []
    for did, text, src in zip(df.doc_id, df.text, df.source):
        sh = shingles(text)
        feats.extend(sh)
        ids.extend([int(did)] * len(sh))
        ns.extend([len(sh)] * len(sh))
        blocks.extend([src] * len(sh))
    rows = rdata.from_arrow(pa.table({
        "feat": pa.array(feats, pa.string()),
        "doc_id": pa.array(ids, pa.int64()),
        "n": pa.array(ns, pa.int64()),
        "source": pa.array(blocks, pa.string()),
    }))
    n_cand = allpairs_prefix_candidates(rows, 0.3, block_col="source").count()
    n_docs = len(df)
    all_pairs = n_docs * (n_docs - 1) // 2
    # random 30-token docs over a 3000-token vocab share shingles only by
    # chance: candidates stay a tiny fraction of the quadratic pair set
    assert n_cand < all_pairs * 0.05, (n_cand, all_pairs)

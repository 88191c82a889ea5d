"""Round-3 curation operators: decontamination, SemDeDup, repetition
signals, sequence chunking. Each checked against a plain local/pandas
reference (the DuckDB oracles in pipelines/queries.py are the exact
driver-side gate; these tests pin the semantics independently)."""

import numpy as np
import pandas as pd
import pytest


def _docs(sf_dir):
    return pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).sort_values("doc_id").reset_index(drop=True)


def _grams(tokens, n):
    return {" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)}


def test_decontaminate_matches_local(ray_session, sf_dir):
    from odinson_ray.stages.curate import decontaminate

    got = decontaminate(sf_dir, n=3, eval_mod=97).to_pandas()
    docs = _docs(sf_dir)
    ev = set()
    for _, r in docs[docs.doc_id % 97 == 0].iterrows():
        ev |= _grams(r.text.split(" "), 3)
    expect = {}
    for _, r in docs[docs.doc_id % 97 != 0].iterrows():
        hits = len(_grams(r.text.split(" "), 3) & ev)
        if hits:
            expect[int(r.doc_id)] = hits
    assert dict(zip(got.doc_id, got.n_shared)) == expect
    assert len(expect) > 0  # non-trivial at every sf


def test_decontaminate_excludes_eval_rows(ray_session, sf_dir):
    from odinson_ray.stages.curate import decontaminate

    got = decontaminate(sf_dir, n=3, eval_mod=97).to_pandas()
    assert not (got.doc_id % 97 == 0).any()


def test_semdedup_matches_local(ray_session, sf_dir):
    """Distributed semdedup == local clustering + lower-id cosine prune."""
    from odinson_ray.stages.curate import semdedup

    got = semdedup(sf_dir, k=8, refinements=1, tau=0.3).to_pandas()

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    X = np.stack([np.asarray(v, dtype=np.float64) for v in emb.embedding])
    C = X[:8]
    a = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
    ids = sorted(set(a))
    C1 = np.stack([X[a == c].mean(axis=0) for c in ids])
    a2 = ((X[:, None, :] - C1[None, :, :]) ** 2).sum(-1).argmin(1)
    clusters = np.array([ids[c] for c in a2])

    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    expect = {}
    for c in sorted(set(clusters)):
        member_rows = np.flatnonzero(clusters == c)
        vids = emb.vec_id.to_numpy()[member_rows]
        order = np.argsort(vids)
        vids, rows = vids[order], member_rows[order]
        sim = Xn[rows] @ Xn[rows].T
        dup = np.triu(sim >= 0.3, k=1).any(axis=0)
        for v in vids[~dup]:
            expect[int(v)] = int(c)
    assert dict(zip(got.vec_id, got.cluster)) == expect
    assert 0 < len(got) < len(emb)  # actually prunes something


def test_repetition_signals_local(ray_session, sf_dir):
    from odinson_ray.stages.curate import repetition_signals

    got = repetition_signals(sf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    docs = _docs(sf_dir)
    for i in (0, len(docs) // 2, len(docs) - 1):
        toks = docs.text.iloc[i].split(" ")
        n = len(toks)
        row = got[got.doc_id == docs.doc_id.iloc[i]].iloc[0]
        assert row.n_tokens == n
        assert row.dup_tok_frac == round(1.0 - len(set(toks)) / n, 6)
        bigrams = [" ".join(toks[j : j + 2]) for j in range(n - 1)]
        top = max((bigrams.count(b) for b in set(bigrams)), default=0)
        assert row.top_bigram_frac == round(2.0 * top / n, 6)


def test_pack_chunks_edges(ray_session):
    """Window arithmetic on handmade docs: exact-multiple, short doc,
    single token."""
    import pyarrow as pa

    from odinson_ray.stages.curate import pack_chunks_batch

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            " ".join(f"t{i}" for i in range(48)),  # 48 toks -> starts 0,24
            " ".join(f"s{i}" for i in range(10)),  # 10 toks -> start 0 only
            "solo",
        ]),
    })
    out = pack_chunks_batch(t, width=32, stride=24).to_pydict()
    rows = list(zip(out["doc_id"], out["chunk_id"], out["n_tokens"], out["head"]))
    assert rows == [
        (1, 0, 32, "t0"),
        (1, 1, 24, "t24"),
        (2, 0, 10, "s0"),
        (3, 0, 1, "solo"),
    ]


def test_pack_chunks_covers_all_tokens(ray_session, sf_dir):
    """Every token position is inside >= 1 window; chunk counts match the
    stride formula."""
    from odinson_ray.stages.curate import pack_chunks

    got = pack_chunks(sf_dir, width=32, stride=24).to_pandas()
    docs = _docs(sf_dir)
    n_chunks = got.groupby("doc_id").size()
    for _, r in docs.head(20).iterrows():
        n = len(r.text.split(" "))
        assert n_chunks[r.doc_id] == (max(n - 1, 0) // 24) + 1
        last = got[(got.doc_id == r.doc_id)].sort_values("chunk_id").iloc[-1]
        assert last.chunk_id * 24 + last.n_tokens == n  # full coverage

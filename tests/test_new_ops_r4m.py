"""Round-4 batch-m operators: A-Priori frequent pairs, BPE merges."""

import collections

import numpy as np
import pyarrow as pa
import pytest


def _local_bpe(texts, k):
    """Reference twin: classic BPE over word frequencies, greedy
    left-to-right merge application, (count DESC, left ASC, right ASC)
    tie-break."""
    wf = collections.Counter()
    for t in texts:
        for w in t.split():
            wf[w] += 1
    vocab = {w: list(w) for w in wf}
    merges = []
    for _ in range(k):
        pc_ = collections.Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc_[(a, b)] += wf[w]
        if not pc_:
            break
        best = sorted(pc_.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        (l, r), n = best
        merges.append((l, r, n))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_bpe_matches_local_twin(ray_session):
    import ray.data as rd

    from odinson_ray.stages.bpe import bpe_top_merges

    texts = [
        "the cat sat on the mat",
        "the cats scatter the mats",
        "a cat and a rat in a hat",
        "that cat is the fastest cat",
        "aaa aaab aab ab",  # overlap-greedy stress: runs of 'a'
    ] * 3
    ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    got = bpe_top_merges(ds, k=6)
    want = _local_bpe(texts, 6)
    rows = list(zip(got["left"].to_pylist(), got["right"].to_pylist(),
                    got["n"].to_pylist()))
    assert rows == want


def test_bpe_on_documents_runs(ray_session):
    from odinson_ray.pipelines.queries3 import q_bpe_merges

    t = q_bpe_merges("/root/testdata/sf0.001", k=3)
    assert t.num_rows == 3
    assert t["rank"].to_pylist() == [1, 2, 3]
    assert all(n > 0 for n in t["n"].to_pylist())


def test_apriori_prunes_infrequent_items(ray_session, tmp_path):
    """A pair of individually-frequent items below pair support is
    dropped; any pair touching an infrequent item never forms."""
    import pyarrow.parquet as pq

    from odinson_ray.pipelines.queries3 import q_apriori_pairs

    # 20 docs: x,y in all; z in 15 (frequent, pairs with x only 9 times);
    # q in 2 (infrequent item)
    docs = []
    for i in range(20):
        toks = ["x", "y"]
        if i < 15:
            toks.append("z")
        if i < 9:
            toks.append("w")
        if i < 2:
            toks.append("q")
        docs.append(" ".join(toks))
    t = pa.table({"doc_id": pa.array(range(20), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    pq.write_table(t, tmp_path / "documents.parquet")

    rows = {(r["wa"], r["wb"]): r["n"]
            for r in q_apriori_pairs(str(tmp_path)).take_all()}
    # item support 0.75 -> x, y (20), z (15) frequent; w (9), q (2) not.
    # pair support 0.62*20 = 12.4 -> (x,y)=20, (x,z)=(y,z)=15 pass
    assert rows == {("x", "y"): 20, ("x", "z"): 15, ("y", "z"): 15}

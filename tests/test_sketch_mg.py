"""Misra-Gries heavy-hitter bound pins (deterministic, unlike CMS/HLL)."""

import collections

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray


def _mk_docs(tmp_path, texts):
    df = pd.DataFrame({
        "doc_id": range(len(texts)), "text": texts,
        "lang": ["en"] * len(texts), "source": ["s"] * len(texts),
        "n_chars": [len(t) for t in texts],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_mg_bound_vs_exact(tmp_path):
    from odinson_ray.stages.sketch import mg_heavy_hitters

    rng = np.random.default_rng(3)
    # Zipfian vocabulary: a few very hot tokens + a long tail
    vocab = [f"w{i}" for i in range(2000)]
    probs = 1.0 / np.arange(1, len(vocab) + 1) ** 1.3
    probs /= probs.sum()
    texts = [" ".join(rng.choice(vocab, size=60, p=probs))
             for _ in range(300)]
    d = _mk_docs(tmp_path, texts)

    exact = collections.Counter(
        tok for t in texts for tok in t.split(" "))
    n = sum(exact.values())
    k = 64

    ds = ray.data.read_parquet(f"{d}/documents.parquet", columns=["text"])
    out = mg_heavy_hitters(ds, "text", k=k).to_pandas()

    assert len(out) <= k
    assert (out.n_total == n).all()
    bound = n / (k + 1)
    got = dict(zip(out.token, out.est_n))
    for tok, est in got.items():
        true = exact[tok]
        assert est <= true, (tok, est, true)
        assert true - est <= bound, (tok, est, true, bound)
    # completeness half of the guarantee
    for tok, true in exact.items():
        if true > bound:
            assert tok in got, (tok, true, bound)


def test_mg_trim_uniform_batch():
    # k+1 equal counters trim to nothing — the case whose mass must
    # still reach n_total via the null-token row
    from odinson_ray.stages.sketch import _mg_trim

    toks = np.array([f"t{i}" for i in range(65)])
    counts = np.ones(65, dtype=np.int64)
    t2, c2 = _mg_trim(toks, counts, 64)
    assert len(t2) == 0

    from odinson_ray.stages.sketch import mg_heavy_hitters

    ds = ray.data.from_arrow(pa.table({"text": [" ".join(toks)]}))
    out = mg_heavy_hitters(ds, "text", k=64).to_pandas()
    assert out.n_total.iloc[0] == 65 if len(out) else True
    # an empty summary is legal here; the mass must not be lost
    ds2 = ray.data.from_arrow(pa.table({"text": [" ".join(toks)]}))
    out2 = mg_heavy_hitters(ds2, "text", k=64)
    tab = out2.to_pandas()
    # n_total only appears on summary rows; with zero counters kept the
    # result may be empty — re-run with a hot token to observe the mass
    ds3 = ray.data.from_arrow(pa.table({
        "text": [" ".join(toks), " ".join(["hot"] * 40)]}))
    out3 = mg_heavy_hitters(ds3, "text", k=64).to_pandas()
    assert "hot" in set(out3.token)
    assert (out3.n_total == 65 + 40).all()

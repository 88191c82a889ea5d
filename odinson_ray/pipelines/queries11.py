"""Round-4 session-5 batch D: distributed model training/application —
logistic-regression quality classifier fitting (full-batch GD as a
sufficient-stats reduce per iteration) and BPE tokenizer APPLICATION
(corpus token histogram after k fitted merges, computed at vocabulary
grain). Both iterative — no SQL oracle BY DESIGN; each is pinned by an
exact/near-exact twin pytest (tests/test_queries11.py).

Registered by ``pipelines/queries.py``; each ``q_*`` takes ``sf_dir``.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _rd():
    from ..sources.io import clean_rd

    return clean_rd


def doc_features(t: pa.Table) -> pa.Table:
    """Deterministic per-doc features for the language classifier:
    scaled length, mean word length, vowel density. One pass, all
    Arrow kernels."""
    words = pc.cast(pc.add(pc.count_substring(t["text"], " "), 1),
                    pa.float64())
    chars = pc.cast(pc.utf8_length(t["text"]), pa.float64())
    vowels = pc.cast(pc.count_substring_regex(t["text"], "[aeiouAEIOU]"),
                     pa.float64())
    safe_chars = pc.max_element_wise(chars, 1.0)
    return pa.table({
        "f_len": pc.divide(words, 100.0),
        "f_wlen": pc.divide(pc.subtract(chars, pc.subtract(words, 1.0)),
                            pc.max_element_wise(words, 1.0)),
        "f_vow": pc.divide(vowels, safe_chars),
        "y": pc.cast(pc.equal(t["lang"], "en"), pa.float64()),
    })


def q_logreg_quality(sf_dir: str, iters: int = 25, lr: float = 0.5):
    """Fit an is-English logistic classifier over the documents table.
    Per iteration one broadcast of the (d+1)-float weight vector and
    one Sum reduce of per-batch gradients — the corpus never leaves the
    cluster, the driver never holds more than d+1 floats. Returns the
    fitted weights plus corpus size and training accuracy as a
    (name, value) report table."""
    from odinson_ray.stages.train import logreg_fit

    rd = _rd()
    feats = rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["text", "lang"]).map_batches(
        doc_features, batch_format="pyarrow")
    xcols = ["f_len", "f_wlen", "f_vow"]
    w, n, acc = logreg_fit(feats, xcols, "y", iters=iters, lr=lr)
    names = ["intercept"] + [f"w_{c}" for c in xcols] + ["n", "train_acc"]
    vals = list(map(float, w)) + [float(n), acc]
    return pd.DataFrame({"name": names, "value": vals})


def q_bpe_encode(sf_dir: str, k: int = 5, topk: int = 20):
    """Top tokens of the corpus AFTER encoding with k fitted BPE merges
    (the tokenizer-application step at vocabulary grain — zero
    corpus-sized work beyond the fit's single word-frequency pass)."""
    from odinson_ray.stages.bpe import bpe_encode_token_counts

    rd = _rd()
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return bpe_encode_token_counts(docs, k=k, topk=topk)


def register(queries: dict, oracles: dict) -> None:
    queries["logreg_quality"] = q_logreg_quality
    queries["bpe_encode"] = q_bpe_encode
    # no oracle entries BY DESIGN: both are iterative (GD, merge loop);
    # exactness pinned by twin pytests instead

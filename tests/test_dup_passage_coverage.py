"""dup_passage_coverage semantics on a hand-built corpus: interval
union of overlapping shared windows, within-doc repeats, full-width
last window, zero-dup docs excluded."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_coverage_hand_corpus(tmp_path):
    from odinson_ray.stages.dedup import dup_passage_coverage

    W = 4
    shared = "a b c d e"  # 5 tokens: two overlapping shared 4-windows
    docs = {
        # doc 0: shared passage at the start + unique tail
        0: shared + " u0 u1 u2 u3 u4",
        # doc 1: same passage at the end (its last window is full-width)
        1: "v0 v1 v2 " + shared,
        # doc 2: no shared span -> absent from the output
        2: "w0 w1 w2 w3 w4 w5 w6 w7",
        # doc 3: the shared passage TWICE (within-doc repeat of shared
        # text; both occurrences are covered)
        3: shared + " x0 " + shared,
    }
    df = pd.DataFrame({
        "doc_id": list(docs), "text": list(docs.values()),
    })
    df.to_parquet(f"{tmp_path}/documents.parquet", index=False)

    out = (dup_passage_coverage(str(tmp_path), window=W)
           .to_pandas().set_index("doc_id").sort_index())

    # brute-force reference: a position is covered when some W-window
    # containing... exactly: when some shared window STARTS at s and
    # s <= p < s + W
    win_owner = {}
    for d, text in docs.items():
        toks = text.split(" ")
        for i in range(len(toks) - W + 1):
            win_owner.setdefault(" ".join(toks[i:i + W]), set()).add(d)
    expect = {}
    for d, text in docs.items():
        toks = text.split(" ")
        covered = set()
        for i in range(len(toks) - W + 1):
            w = " ".join(toks[i:i + W])
            if len(win_owner[w]) >= 2:
                covered.update(range(i, i + W))
        if covered:
            expect[d] = (len(toks), len(covered))

    assert set(out.index) == set(expect)
    for d, (n, cov) in expect.items():
        assert out.loc[d, "n_tokens"] == n
        assert out.loc[d, "dup_tokens"] == cov
        assert out.loc[d, "dup_frac"] == round(cov / n, 6)
    # sanity on the hand values: docs 0/1 cover the 5 shared tokens
    assert expect[0] == (10, 5) and expect[1] == (8, 5)
    assert 2 not in expect
    assert expect[3][1] == 10  # both occurrences covered (5 + 5)

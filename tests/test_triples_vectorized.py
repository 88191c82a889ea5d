"""The vectorized mentions_to_triples fast path must match the per-row
reference path (_triples_slow) exactly — including cross products,
argless rows, null args, and one-sided (subject-only / object-only)
events."""

import pandas as pd
import pyarrow as pa

from odinson_ray.stages.triples import _triples_slow, mentions_to_triples

ARGS_TYPE = pa.list_(pa.struct([("name", pa.string()), ("text", pa.string())]))


def _batch(cases):
    return pa.table({
        "args": pa.array(cases, ARGS_TYPE),
        "text": pa.array([f"p{i}" for i in range(len(cases))]),
        "doc_id": pa.array([f"d{i}" for i in range(len(cases))]),
        "sent_id": pa.array(list(range(len(cases))), pa.int32()),
    })


def _sorted(t: pa.Table) -> pd.DataFrame:
    return (
        t.to_pandas()
        .sort_values(["doc_id", "subj", "obj"])
        .reset_index(drop=True)
    )


def test_vectorized_matches_reference_path():
    cases = [
        [{"name": "subject", "text": "A"}, {"name": "object", "text": "B"}],
        [{"name": "subject", "text": "A"}, {"name": "subject", "text": "C"},
         {"name": "object", "text": "B"}],
        [{"name": "subject", "text": "A"}, {"name": "object", "text": "B"},
         {"name": "object", "text": "D"}],
        [{"name": "subject", "text": "A"}, {"name": "subject", "text": "C"},
         {"name": "object", "text": "B"}, {"name": "object", "text": "D"}],
        None,
        [],
        [{"name": "subject", "text": "A"}],
        [{"name": "object", "text": "B"}],
        [{"name": "subject", "text": "X"}, {"name": "object", "text": "Y"}],
    ]
    batch = _batch(cases)
    got = _sorted(mentions_to_triples(batch))
    exp = _sorted(_triples_slow(
        batch["args"].to_pylist(), batch["text"].to_pylist(),
        batch["doc_id"].to_pylist(), batch["sent_id"].to_pylist(),
    ))
    pd.testing.assert_frame_equal(got, exp)
    # 1 + 2 + 2 + 4 + 0 + 0 + 0 + 0 + 1 rows
    assert len(got) == 10


def test_vectorized_empty_batch_keeps_schema():
    batch = _batch([[{"name": "subject", "text": "A"},
                     {"name": "object", "text": "B"}]])
    out = mentions_to_triples(batch.slice(0, 0))
    assert len(out) == 0
    assert out.schema == mentions_to_triples(batch).schema

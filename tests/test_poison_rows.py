"""Poison-row containment: a failing document yields an __error__ row,
never a failed task (reference: per-file Try + continue,
extra/.../IndexDocuments.scala:85-98)."""

import pyarrow as pa
import pytest

RULES = """
rules:
  - name: eat
    label: Eat
    type: basic
    pattern: "ate"
"""


def _batch(bad_md: str):
    from odinson_ray.sources.interleaved import SPAN_TYPE

    def spans(text):
        return [{"kind": "text", "text": text, "media_ref": "", "offset": 0}]

    return pa.table({
        "doc_id": pa.array(["d1", "d2", "d3"], pa.string()),
        "spans": pa.array(
            [spans("Becky ate bears"), spans("Shadow ate mice"), spans("x y z")],
            pa.list_(SPAN_TYPE),
        ),
        "metadata_json": pa.array([None, bad_md, None], pa.string()),
    })


def test_poison_doc_becomes_error_row():
    from odinson_ray.stages.match import GrammarMatcher

    m = GrammarMatcher(RULES)
    out = m(_batch("{not json"))
    by_label = {}
    for row in out.to_pylist():
        by_label.setdefault(row["label"], []).append(row)
    # d2 fails wholesale (metadata parse precedes extraction): its Eat
    # mention is gone and exactly one error row stands in for the doc
    assert {r["doc_id"] for r in by_label["Eat"]} == {"d1"}
    errs = by_label[GrammarMatcher.ERROR_LABEL]
    assert len(errs) == 1 and errs[0]["doc_id"] == "d2"
    assert "JSONDecodeError" in errs[0]["found_by"]
    assert errs[0]["sent_id"] == -1


def test_poison_doc_raises_when_asked():
    from odinson_ray.stages.match import GrammarMatcher

    m = GrammarMatcher(RULES, on_error="raise")
    with pytest.raises(Exception):
        m(_batch("{not json"))


def test_error_rows_flow_through_fused_flagship():
    """Error rows must not perturb the triple stream (the SVO filter drops
    them) nor crash the fused TripleCounter chain."""
    from odinson_ray.pipelines.kg import FLAGSHIP_RULES, TripleCounter

    out = TripleCounter(FLAGSHIP_RULES)(_batch("{bad"))
    assert "partial_n" in out.column_names  # chain survived the poison doc
    assert "__error__" not in set(
        out["subj_canon"].to_pylist() if "subj_canon" in out.column_names else []
    )

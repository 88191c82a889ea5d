"""Metadata-filter pushdown: docs rejected by every extractor's filter
skip annotation entirely, with output identical to the unpushed path."""

from unittest import mock

import pyarrow as pa
import pyarrow.parquet as pq

RULES = """
metadataFilters: "lang == 'zh'"
rules:
  - name: svo
    label: SVO
    type: event
    pattern: |
      trigger = [tag=/V.*/]
      subject: ^NP = >nsubj []
      object: ^NP = >dobj []
"""


def _docs(sf_dir):
    return pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    ).slice(0, 300)


def test_pushdown_output_parity(sf_dir):
    from odinson_ray.stages.match import GrammarMatcher

    t = _docs(sf_dir)
    a = GrammarMatcher(RULES)
    assert a._pushdown
    b = GrammarMatcher(RULES)
    b._pushdown = False
    ta, tb = a(t), b(t)
    assert ta.num_rows == tb.num_rows
    assert ta.sort_by([("doc_id", "ascending"), ("sent_id", "ascending"),
                       ("start", "ascending")]).equals(
        tb.sort_by([("doc_id", "ascending"), ("sent_id", "ascending"),
                    ("start", "ascending")]))


def test_pushdown_skips_annotation(sf_dir):
    import odinson_ray.stages.match as match_mod
    from odinson_ray.stages.match import GrammarMatcher

    t = _docs(sf_dir)
    n_zh = sum(1 for v in t["lang"].to_pylist() if v == "zh")
    assert 0 < n_zh < t.num_rows  # the filter is genuinely selective here

    seen = []
    real = match_mod.annotate_texts_vectorized

    def spy(texts):
        seen.append(len(texts))
        return real(texts)

    m = GrammarMatcher(RULES)
    with mock.patch.object(match_mod, "annotate_texts_vectorized", spy):
        m(t)
    # annotated texts == text spans of KEPT docs only
    from odinson_ray.sources.interleaved import build_interleaved

    inter = build_interleaved(t)
    langs = inter["lang"].to_pylist()
    want = 0
    for lang, spans in zip(langs, inter["spans"].to_pylist()):
        if lang == "zh":
            want += sum(1 for s in spans if s["kind"] == "text")
    assert sum(seen) == want


def test_no_pushdown_when_any_rule_unfiltered(sf_dir):
    from odinson_ray.stages.match import GrammarMatcher

    rules = """
rules:
  - {name: a, label: A, type: basic, pattern: "the"}
"""
    m = GrammarMatcher(rules)
    assert not m._pushdown  # an unfiltered rule can match any doc

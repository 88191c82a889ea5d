"""Programmatic API facade + JSON serialization round-trip + prepared corpus."""

import json

import pytest

from odinson_ray.api import OdinsonEngine
from odinson_ray.core.serialize import (
    mention_from_json,
    mention_to_json,
    mentions_to_json_lines,
)


def test_engine_from_text_query():
    engine = OdinsonEngine.from_text("d1", "a b b c")
    mentions = engine.query("a b+ c")
    assert [engine.mention_text(m) for m in mentions] == ["a b b c"]


def test_engine_fixture_event():
    engine = OdinsonEngine.from_fixture("becky-gummy-bears")
    extractors = engine.compile_rule_string(
        """
rules:
  - name: eat
    label: Eating
    type: event
    pattern: |
      trigger = [lemma=eat]
      subject: ^NP = >nsubj
      object: ^NP = >dobj
"""
    )
    mentions = engine.extract_mentions(extractors)
    eating = [m for m in mentions if m.label == "Eating"]
    assert len(eating) == 1
    assert engine.mention_text(eating[0]) == "ate"


def test_engine_query_limit():
    engine = OdinsonEngine.from_text("d1", "x a x a x a")
    assert len(engine.query("a", n=2)) == 2


def test_json_roundtrip():
    engine = OdinsonEngine.from_fixture("becky-gummy-bears")
    extractors = engine.compile_rule_string(
        """
rules:
  - name: eat
    label: Eating
    type: event
    pattern: |
      trigger = [lemma=eat]
      object: ^NP = >dobj [chunk=B-NP][chunk=I-NP]*
"""
    )
    mentions = engine.extract_no_state(extractors)
    lines = mentions_to_json_lines(mentions).splitlines()
    assert len(lines) == len(mentions)
    for line, m in zip(lines, mentions):
        d = json.loads(line)
        back = mention_from_json(d)
        assert (back.start, back.end, back.label, back.found_by, back.doc_id) == (
            m.start, m.end, m.label, m.found_by, m.doc_id)
        assert [(c.name, c.captured.start, c.captured.end) for c in back.match.named_captures] == [
            (c.name, c.captured.start, c.captured.end) for c in m.match.named_captures]


def test_prepared_corpus_matches_inline(ray_session, sf_dir, tmp_path):
    """Matching over a prepared (pre-annotated) corpus equals inline
    annotation (the two matcher input modes agree)."""
    from odinson_ray.pipelines.kg import FLAGSHIP_RULES
    from odinson_ray.sources.interleaved import prepare_corpus, read_interleaved, read_prepared
    from odinson_ray.stages.match import GrammarMatcher

    out = str(tmp_path / "prepared")
    prepare_corpus(sf_dir, out)

    def mentions_of(ds):
        df = ds.map_batches(
            GrammarMatcher, fn_constructor_args=(FLAGSHIP_RULES,),
            batch_format="pyarrow", concurrency=2, batch_size=128, num_cpus=1,
        ).to_pandas()
        df["args"] = df["args"].apply(lambda a: tuple((x["name"], x["start"], x["end"]) for x in a))
        return df.sort_values(["doc_id", "sent_id", "start", "end", "found_by"]).reset_index(drop=True)

    inline = mentions_of(read_interleaved(sf_dir))
    prepared = mentions_of(read_prepared(out))
    import pandas as pd

    pd.testing.assert_frame_equal(inline, prepared)


def test_add_metadata_broadcast(ray_session, sf_dir):
    import pyarrow as pa

    from odinson_ray.sources.interleaved import add_metadata, read_interleaved

    docs = read_interleaved(sf_dir).limit(20)
    md = {f"doc-{i:06d}": {"venue": f"v{i % 3}", "citations": float(i)} for i in range(500)}
    out = add_metadata(docs, md, [("venue", pa.string()), ("citations", pa.float64())]).to_pandas()
    assert "metadata" in out.columns
    row = out.iloc[0]
    assert row["metadata"]["venue"] == f"v{int(row['doc_id'][4:]) % 3}"


def test_explain_renders_ast():
    from odinson_ray.api import explain

    out = explain("[lemma=eat] >dobj []")
    assert "GraphTraversalPattern" in out
    assert "FieldConstraint (name='lemma')" in out
    assert "OutgoingTraversal" in out

    ev = explain("trigger = ate\nsubject = >nsubj []", event=True)
    assert ev.startswith("EventPattern")
    assert "ArgumentPattern (name='subject'" in ev

    # parse errors surface with position info, not a silent string
    import pytest

    from odinson_ray.lang.parser import OdinsonParseError

    with pytest.raises(OdinsonParseError):
        explain("a (")

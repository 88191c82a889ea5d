"""Property test: event-argument PROMOTION (``^Label``) feeds the state
the walker-predicted mentions, and a later-priority rule reads them
back.

Rule 1 (priority 1) is an event whose single argument is promoted into
the state under a fresh label; rule 2 (priority 2) is ``@Promoted``.
With single-token triggers/arguments the promoted mention set is the
union over trigger positions t of the argument traversal's image MINUS
t itself: ``extract_mentions`` defaults to ``allowTriggerOverlaps =
false`` (reference ExtractorEngine.scala:376 /
OdinsonMatch.scala:72-83), so trigger-overlapping captures are dropped
and an event whose only capture overlapped its trigger dies with them
(a self-loop edge found this in generation). Pins the
filter-then-promote-then-read path (TestState parity pins fixtures)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from odinson_ray.api import OdinsonEngine
from odinson_ray.core.sentence import AnnotatedDocument, SentenceIndex

from .test_property_traversal import LABELS, WORDS, image, render_trav, trav_exprs


@st.composite
def cases(draw):
    n = draw(st.integers(4, 7))
    words = [draw(st.sampled_from(WORDS)) for _ in range(n)]
    m = draw(st.integers(1, 2 * n))
    edges = sorted({(draw(st.integers(0, n - 1)), draw(st.integers(0, n - 1)),
                     draw(st.sampled_from(LABELS))) for _ in range(m)})
    trig = draw(st.sampled_from(WORDS))
    argw = draw(st.sampled_from(WORDS + [None]))
    trav = draw(trav_exprs())
    return words, edges, trig, argw, trav


RULES_TMPL = """
rules:
  - name: first
    label: Evt
    type: event
    priority: "1"
    pattern: |
      trigger = [word={trig}]
      thing:^Promoted = {trav} {tok}
  - {{name: second, label: Read, type: basic, priority: "2",
      pattern: "@Promoted"}}
"""


@settings(max_examples=200, deadline=None)
@given(cases())
def test_promotion_feeds_state(case):
    words, edges, trig, argw, trav = case
    sent = SentenceIndex({"raw": words, "word": words},
                         [tuple(e) for e in edges], [0])
    engine = OdinsonEngine([AnnotatedDocument("d", [sent])])
    rules = RULES_TMPL.format(
        trig=trig, trav=render_trav(trav),
        tok="[]" if argw is None else f"[word={argw}]")
    mentions = engine.extract_mentions(engine.compile_rule_string(rules))

    out_adj, in_adj = {}, {}
    for h, t, l in edges:
        out_adj.setdefault(h, []).append((t, l))
        in_adj.setdefault(t, []).append((h, l))
    expect = set()
    for t in (i for i, w in enumerate(words) if w == trig):
        dsts = image({t}, trav, out_adj, in_adj)
        if argw is not None:
            dsts = {d for d in dsts if words[d] == argw}
        expect |= dsts - {t}  # trigger-overlap filter (default)

    got_read = {(m.start, m.end) for m in mentions if m.label == "Read"}
    assert got_read == {(d, d + 1) for d in expect}, rules

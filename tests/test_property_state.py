"""Property test: mention-state reads (@Label) agree with the
relation-image walker on random graphs.

A priority-1 rule seeds the state with single-token mentions; a
priority-2 rule reads them back through ``@Seed`` as the SOURCE
(``@Seed TRAV [word=w]``) or the DESTINATION (``[word=w] TRAV @Seed``)
of a random traversal. Because the seed mentions are exactly the
seed-word positions, the expected destination set is the traversal
walker's image — what this pins is the STATE path: label-scoped
retrieval, the mention filter on the terminal, and cascade priority
ordering. (TestState parity pins the reference's fixture cases.)"""

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
    seed_word = draw(st.sampled_from(WORDS))
    other = draw(st.sampled_from(WORDS))
    trav = draw(trav_exprs())
    seed_is_src = draw(st.booleans())
    return words, edges, seed_word, other, trav, seed_is_src


RULES_TMPL = """
rules:
  - {{name: seed, label: Seed, type: basic, priority: "1",
      pattern: "[word={seed}]"}}
  - name: second
    label: Out
    type: basic
    priority: "2"
    pattern: |
      {pattern}
"""


@settings(max_examples=200, deadline=None)
@given(cases())
def test_state_reads_match_walker(case):
    words, edges, seed_word, other, trav, seed_is_src = case
    sent = SentenceIndex({"raw": words, "word": words},
                         [tuple(e) for e in edges], [0])
    engine = OdinsonEngine([AnnotatedDocument("d", [sent])])

    if seed_is_src:
        pattern = f"@Seed {render_trav(trav)} [word={other}]"
    else:
        pattern = f"[word={other}] {render_trav(trav)} @Seed"
    rules = RULES_TMPL.format(seed=seed_word, pattern=pattern)
    mentions = engine.extract_mentions(engine.compile_rule_string(rules))

    out_adj, in_adj = {}, {}
    for h, t, l in edges:
        out_adj.setdefault(h, []).append((t, l))
        in_adj.setdefault(t, []).append((h, l))
    seeds = {i for i, w in enumerate(words) if w == seed_word}
    if seed_is_src:
        dsts = {i for i in image(seeds, trav, out_adj, in_adj)
                if words[i] == other}
    else:
        starts = {i for i, w in enumerate(words) if w == other}
        dsts = image(starts, trav, out_adj, in_adj) & seeds

    got_seed = {(m.start, m.end) for m in mentions if m.label == "Seed"}
    got_out = {(m.start, m.end) for m in mentions if m.label == "Out"}
    assert got_seed == {(i, i + 1) for i in seeds}, pattern
    assert got_out == {(i, i + 1) for i in dsts}, pattern

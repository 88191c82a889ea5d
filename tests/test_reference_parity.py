"""Parity suite vs the reference's remaining test expectations:
TestArgQuantifiers, TestEventTriggers, TestNegationOperator,
TestUnicodeNormalization."""

import pytest

from odinson_ray.common.normalize import (
    normalize_unicode,
    normalize_unicode_aggressively,
)
from odinson_ray.core.engine import DocumentEngine
from odinson_ray.core.matcher import Compiler, Ctx
from odinson_ray.core.selector import select_matches
from odinson_ray.core.sentence import AnnotatedDocument, SentenceIndex
from odinson_ray.lang.rules import RuleReader
from odinson_ray.sources.example_docs import DOCS

compiler = Compiler()


def mk_sent(key, i=0):
    s = DOCS[key]["sentences"][i]
    return SentenceIndex(s["fields"], s["edges"], s["roots"])


def mk_doc(key):
    d = DOCS[key]
    return AnnotatedDocument(
        key, [SentenceIndex(s["fields"], s["edges"], s["roots"]) for s in d["sentences"]]
    )


def run_basic(key, pattern):
    sent = mk_sent(key)
    toks = sent.tokens()
    sel = select_matches(compiler.compile(pattern).matches(Ctx(sent, 0, None)))
    return [" ".join(toks[m.start : m.end]) for m in sel]


def run_event(key, pattern):
    sent = mk_sent(key)
    sel = select_matches(compiler.compile_event_query(pattern).matches(Ctx(sent, 0, None)))
    out = []
    for m in sel:
        args = {}
        for c in m.named_captures:
            args.setdefault(c.name, []).append((c.captured.start, c.captured.end))
        out.append(((m.trigger.start, m.trigger.end), args))
    return out


# ------------------------------------------------------- TestArgQuantifiers

@pytest.mark.parametrize(
    "quant,expected",
    [
        ("", [((1, 2), {"theme": [(3, 5)]}), ((1, 2), {"theme": [(6, 7)]})]),
        ("?", [((1, 2), {"theme": [(3, 5)]}), ((1, 2), {"theme": [(6, 7)]})]),
        ("+", [((1, 2), {"theme": [(3, 5), (6, 7)]})]),
        ("*", [((1, 2), {"theme": [(3, 5), (6, 7)]})]),
    ],
)
def test_arg_quantifiers(quant, expected):
    got = run_event(
        "gummy-bears-consumption",
        f"""trigger = consumption
theme: ^dessert{quant} = >nmod_of >conj? [entity=B-dessert][entity=I-dessert]*""",
    )
    assert sorted(got, key=repr) == sorted(expected, key=repr)


# ------------------------------------------------------- TestEventTriggers

HEDGEHOG_EXPECTED = ["hedgehogs", "coypu", "wild cloven-footed animals", "deer", "zoo animals"]
RESULT_VAR = "([tag=/J.*/]{,3} [tag=/N.*/]+ (of [tag=DT]? [tag=/J.*/]{,3} [tag=/N.*/]+)?)"


def _result_strings(mentions, doc):
    out = []
    for m in mentions:
        if m.label != "MainEvent":
            continue
        toks = doc.sentences[m.sent_idx].tokens()
        for a in m.arguments().get("result", []):
            out.append(" ".join(toks[a.start : a.end]))
    return out


def test_event_triggers_basic_pattern():
    rules = f"""
vars:
  result: "{RESULT_VAR}"
rules:
  - name: example-rule
    type: basic
    label: MainEvent
    pattern: |
      animals >nmod_such_as >/conj.*/? (?<result>${{result}})
"""
    doc = mk_doc("hedgehogs-coypy")
    mentions = DocumentEngine(doc).extract_mentions(RuleReader().compile_rule_string(rules))
    assert _result_strings(mentions, doc) == HEDGEHOG_EXPECTED


def test_event_triggers_event_pattern():
    rules = f"""
vars:
  result: "{RESULT_VAR}"
rules:
  - name: example-rule
    type: event
    label: MainEvent
    pattern: |
      trigger = animals
      result = >nmod_such_as >/conj.*/? ${{result}}
"""
    doc = mk_doc("hedgehogs-coypy")
    mentions = DocumentEngine(doc).extract_mentions(RuleReader().compile_rule_string(rules))
    assert sorted(_result_strings(mentions, doc)) == sorted(HEDGEHOG_EXPECTED)


# ------------------------------------------------------- TestNegationOperator

@pytest.mark.parametrize(
    "pattern,expected",
    [
        ("[tag=/N.*/ & !lemma=bear]", ["Becky"]),
        ("[tag=/N.*/ & lemma!=bear]", ["Becky"]),
        ("[lemma!=bear]", ["Becky", "ate", "gummy", "."]),
        ("[!tag=/NN.*/]", ["ate", "gummy", "."]),
    ],
)
def test_negation_operator(pattern, expected):
    assert run_basic("becky-gummy-bears-v2", pattern) == expected


# ------------------------------------------------------- TestUnicodeNormalization

def test_normalize_composition():
    assert normalize_unicode("café") == normalize_unicode("café")
    assert normalize_unicode_aggressively("café") == normalize_unicode_aggressively("café")


def test_normalize_fraction():
    assert normalize_unicode("½") != normalize_unicode("1/2")
    assert normalize_unicode_aggressively("½") == normalize_unicode_aggressively("1/2")


def test_normalize_mu():
    mu1, mu2, Mu = "µ", "μ", "Μ"
    assert normalize_unicode(mu1) == normalize_unicode(mu2)
    assert normalize_unicode(mu1) != normalize_unicode(Mu)
    assert normalize_unicode_aggressively(mu1) == normalize_unicode_aggressively(Mu)


def test_normalize_casefold_and_diacritics():
    assert normalize_unicode_aggressively("ß") == normalize_unicode_aggressively("ss")
    assert normalize_unicode_aggressively("café") == normalize_unicode_aggressively("cafe")


def test_normalize_ascii_folding():
    s1 = "“Herr Voß: • ½ cup of Œtker™ caffè latte • bowl of açaí.”"
    s2 = '"Herr Voss: - 1/2 cup of OEtker(TM) caffe latte - bowl of acai."'
    assert normalize_unicode(s1) != normalize_unicode(s2)
    assert normalize_unicode_aggressively(s1) == normalize_unicode_aggressively(s2)


# ------------------------------------------------------- matching on normalized forms

def test_default_field_matches_casefolded():
    # the default (norm) field matches aggressively-normalized raw/word
    assert run_basic("becky-gummy-bears", "becky") == ["Becky"]
    assert run_basic("becky-gummy-bears", "BECKY") == ["Becky"]


def test_fuzzy_constraint():
    assert run_basic("becky-gummy-bears", "becki~") == ["Becky"]
    assert run_basic("becky-gummy-bears", "bek~ ate") == ["Becky ate"]


# ------------------------------------------------------- TestMoreEvents

def run_event_all_sents(key, pattern):
    d = DOCS[key]
    per_sent = []
    for i, s in enumerate(d["sentences"]):
        sent = SentenceIndex(s["fields"], s["edges"], s["roots"])
        sel = select_matches(compiler.compile_event_query(pattern).matches(Ctx(sent, i, None)))
        lst = []
        for m in sel:
            args = {}
            for c in m.named_captures:
                args.setdefault(c.name, []).append((c.captured.start, c.captured.end))
            lst.append(((m.trigger.start, m.trigger.end), args))
        per_sent.append(lst)
    return per_sent


def test_more_events_one_tool_each():
    got = run_event_all_sents("chopsticks-spoon", """trigger = [lemma=eat]
theme: ^food = >dobj
tool: ^tool = >nmod_with >conj?""")
    assert got[0] == [
        ((1, 2), {"theme": [(2, 3)], "tool": [(4, 5)]}),
        ((1, 2), {"theme": [(2, 3)], "tool": [(7, 8)]}),
    ]
    assert got[1] == [] and got[2] == []


def test_more_events_two_tools_plus():
    got = run_event_all_sents("chopsticks-spoon", """trigger = [lemma=eat]
theme: ^food = >dobj
tool: ^tool+ = >nmod_with >conj?""")
    assert got[0] == [((1, 2), {"theme": [(2, 3)], "tool": [(4, 5), (7, 8)]})]


def test_more_events_star_tool():
    got = run_event_all_sents("chopsticks-spoon", """trigger = [lemma=eat]
theme: ^food = >dobj
tool: ^tool* = >nmod_with >conj?""")
    assert got[0] == [((1, 2), {"theme": [(2, 3)], "tool": [(4, 5), (7, 8)]})]
    assert got[1] == [((1, 2), {"theme": [(2, 3)]})]


def test_more_events_impossible_combination():
    got = run_event_all_sents("chopsticks-spoon", """trigger = [lemma=eat]
theme: ^food = >dobj
tool: ^tool = >nmod_with >conj?
location: ^place = >nmod_at""")
    assert got == [[], [], []]


def test_more_events_all_optional():
    got = run_event_all_sents("chopsticks-spoon", """trigger = [lemma=eat]
theme: ^food? = >dobj
tool: ^tool? = >nmod_with >conj?
location: ^place? = >nmod_at""")
    assert got[0] == [
        ((1, 2), {"theme": [(2, 3)], "tool": [(4, 5)]}),
        ((1, 2), {"theme": [(2, 3)], "tool": [(7, 8)]}),
    ]
    assert got[1] == [((1, 2), {"theme": [(2, 3)], "location": [(5, 6)]})]


def test_more_events_required_location():
    got = run_event_all_sents("chopsticks-spoon", """trigger = [lemma=eat]
theme: ^food = >dobj
tool: ^tool? = >nmod_with >conj?
location: ^place = >nmod_at""")
    assert got[0] == []
    assert got[1] == [((1, 2), {"theme": [(2, 3)], "location": [(5, 6)]})]


# ------------------------------------------------------- documentation strings

GEORGE = AnnotatedDocument("george", [SentenceIndex(
    {"raw": ["George", "and", "dog", "bears", "."],
     "word": ["George", "and", "dog", "bears", "."],
     "tag": ["NNP", "VBD", "JJ", "NNS", "."],
     "lemma": ["george", "and", "dog", "bear", "."],
     "entity": ["foo:bar", "O", "O", "O", "O"],
     "chunk": ["B-NP", "I-NP", "I-NP", "I-NP", "O"]},
    [(1, 0, "nsubj"), (1, 3, "dobj"), (1, 4, "punct"), (3, 2, "nmod_foo")], [1])])


def test_doc_strings_dash_and_colon_no_quotes():
    from odinson_ray.api import OdinsonEngine

    engine = OdinsonEngine([GEORGE])
    assert len(engine.query("[chunk=B-NP]")) == 1
    assert len(engine.query("[entity=foo:bar]")) == 1


def test_doc_strings_quoted_token():
    from odinson_ray.api import OdinsonEngine

    engine = OdinsonEngine.from_text("t", "lala lala 3:10 to Yuma")
    assert len(engine.query('"3:10" to Yuma')) == 1


def test_doc_strings_regex_traversal_with_capture():
    from odinson_ray.api import OdinsonEngine

    engine = OdinsonEngine([GEORGE])
    ms = engine.query("(?<foo> [word=bears]) >/nmod_.*/ []")
    assert len(ms) == 1
    assert (ms[0].start, ms[0].end) == (2, 3)
    cap = ms[0].match.named_captures[0]
    assert (cap.name, cap.captured.start, cap.captured.end) == ("foo", 3, 4)


# ------------------------------------------------------- incoming/outgoing fields

def test_edge_label_token_fields():
    from odinson_ray.api import OdinsonEngine

    engine = OdinsonEngine.from_fixture("becky-gummy-bears")
    assert [engine.mention_text(m) for m in engine.query("[incoming=nsubj]")] == ["Becky"]
    assert [engine.mention_text(m) for m in engine.query("[outgoing=dobj]")] == ["ate"]
    assert [engine.mention_text(m) for m in engine.query("[outgoing=/n.*/]")] == ["ate"]


# ------------------------------------------------------- documentation quantifiers

PHOSPH = SentenceIndex(
    {"raw": ["Foo", "phosphorylates", "bar", "bears", "."],
     "word": ["Foo", "phosphorylates", "bar", "bears", "."],
     "tag": ["NNP", "VBD", "JJ", "NNS", "."],
     "lemma": ["foo", "phosphorylates", "bar", "bear", "."],
     "entity": ["PROTEIN", "O", "PROTEIN", "O", "O"],
     "chunk": ["B-NP", "B-VP", "B-NP", "I-NP", "O"]},
    [(1, 0, "nsubj"), (1, 2, "dobj"), (1, 4, "punct"), (2, 3, "amod")], [1])


def _run_event_sent(sent, pattern):
    sel = select_matches(compiler.compile_event_query(pattern).matches(Ctx(sent, 0, None)))
    out = []
    for m in sel:
        caps = sorted((c.name, c.captured.start, c.captured.end) for c in m.named_captures)
        out.append(((m.trigger.start, m.trigger.end), caps))
    return sorted(out, key=repr)


def test_doc_quantifiers_optional_traversal():
    got = _run_event_sent(PHOSPH, """trigger = [lemma=bar]
object: ^NP = >amod?""")
    assert got == [((2, 3), [("object", 2, 3)]), ((2, 3), [("object", 3, 4)])]


def test_doc_quantifiers_required_traversal():
    got = _run_event_sent(PHOSPH, """trigger = [lemma=bar]
object: ^NP = >amod""")
    assert got == [((2, 3), [("object", 3, 4)])]


def test_doc_quantifiers_wildcard_hop_range():
    got = _run_event_sent(PHOSPH, """trigger = [lemma=phosphorylates]
object: ^NP = >>{2,3}""")
    assert got == [((1, 2), [("object", 3, 4)])]


# ------------------------------------------------------- documentation graph traversals

JULIO = SentenceIndex(
    {"raw": ["She", "saw", "me", "and", "Julio", "."],
     "word": ["She", "saw", "me", "and", "Julio", "."],
     "tag": ["PRP", "VBD", "PRP", "CC", "NNP", "."],
     "lemma": ["she", "see", "I", "and", "Julio", "."],
     "entity": ["O", "O", "O", "O", "PERSON", "O"],
     "chunk": ["B-NP", "B-VP", "B-NP", "O", "B-NP", "O"]},
    [(1, 0, "nsubj"), (1, 2, "dobj"), (1, 4, "dobj"), (1, 5, "punct"),
     (2, 3, "cc"), (2, 4, "conj_and")], [1])


@pytest.mark.parametrize(
    "pattern,expected",
    [
        ("She saw >dobj [] (>conj_and [])?", [(2, 3), (4, 5)]),
        ("She saw >dobj [] (>conj_and []){,2}", [(2, 3), (4, 5)]),
        ("She saw >dobj (?^ [] >conj_and [])?", [(2, 5)]),
        ("She saw >dobj (?^ [] >conj_and []){,2}", [(2, 5)]),
    ],
)
def test_doc_graph_traversals(pattern, expected):
    got = sorted(
        (m.start, m.end)
        for m in select_matches(compiler.compile(pattern).matches(Ctx(JULIO, 0, None)))
    )
    assert got == expected

"""Event-pattern semantics vs the reference's TestEvents expectations
(core/src/test/scala/ai/lum/odinson/events/TestEvents.scala)."""

from odinson_ray.core.engine import DocumentEngine
from odinson_ray.core.matcher import Compiler, Ctx
from odinson_ray.core.matches import EventMatch
from odinson_ray.core.selector import select_matches
from odinson_ray.core.sentence import AnnotatedDocument, SentenceIndex
from odinson_ray.lang.rules import RuleReader
from odinson_ray.sources.example_docs import DOCS


def mk_doc(key: str) -> AnnotatedDocument:
    d = DOCS[key]
    sents = [SentenceIndex(s["fields"], s["edges"], s["roots"]) for s in d["sentences"]]
    return AnnotatedDocument(key, sents)


compiler = Compiler()


def run_event(key: str, pattern: str):
    doc = mk_doc(key)
    q = compiler.compile_event_query(pattern)
    out = []
    for i, sent in enumerate(doc.sentences):
        out.extend(select_matches(q.matches(Ctx(sent, i, None))))
    return out


def args_of(m):
    args = {}
    for c in m.named_captures:
        args.setdefault(c.name, []).append((c.captured.start, c.captured.end))
    return args


def test_event_with_promoted_entities():
    (m,) = run_event(
        "becky-gummy-bears",
        """trigger = [lemma=eat]
           subject: ^NP = >nsubj [chunk=B-NP][chunk=I-NP]*
           object: ^NP = >dobj [chunk=B-NP][chunk=I-NP]*""",
    )
    assert (m.trigger.start, m.trigger.end) == (1, 2)
    assert args_of(m) == {"subject": [(0, 1)], "object": [(2, 4)]}


def test_event_greedy_arg_quantifier():
    (m,) = run_event(
        "becky-gummy-bears",
        """trigger = [lemma=eat]
           subject: ^NP = >nsubj [chunk=B-NP][chunk=I-NP]*
           object: ^NP = >dobj gummy? bears""",
    )
    assert args_of(m) == {"subject": [(0, 1)], "object": [(2, 4)]}


def test_event_promotes_single_token_without_surface():
    (m,) = run_event(
        "becky-gummy-bears",
        """trigger = [lemma=eat]
           subject: ^NP = >nsubj
           object: ^NP = >dobj""",
    )
    assert args_of(m) == {"subject": [(0, 1)], "object": [(3, 4)]}


def test_event_untyped_args():
    (m,) = run_event(
        "becky-gummy-bears",
        """trigger = [lemma=eat]
           subject = >nsubj [chunk=B-NP][chunk=I-NP]*
           object = >dobj [chunk=B-NP][chunk=I-NP]*""",
    )
    assert args_of(m) == {"subject": [(0, 1)], "object": [(2, 4)]}


def test_cascade_promotion_and_state():
    rules = """
rules:
  - name: eating
    label: Eating
    type: event
    pattern: |
      trigger = [lemma=eat]
      subject: ^NP = >nsubj [chunk=B-NP][chunk=I-NP]*
      object: ^NP = >dobj [chunk=B-NP][chunk=I-NP]*
"""
    extractors = RuleReader().compile_rule_string(rules)
    eng = DocumentEngine(mk_doc("becky-gummy-bears"))
    mentions = eng.extract_mentions(extractors)
    # event mention + two promoted NP args
    by_label = {}
    for m in mentions:
        by_label.setdefault(m.label, []).append((m.start, m.end))
    assert by_label["Eating"] == [(1, 2)]
    assert sorted(by_label["NP"]) == [(0, 1), (2, 4)]


def test_cross_rule_state_read():
    rules = """
rules:
  - name: person
    label: Person
    type: basic
    priority: "1"
    pattern: Becky
  - name: eating
    label: Eating
    type: event
    priority: "2"
    pattern: |
      trigger = [lemma=eat]
      subject: Person = >nsubj
      object: ^NP = >dobj [chunk=B-NP][chunk=I-NP]*
"""
    extractors = RuleReader().compile_rule_string(rules)
    eng = DocumentEngine(mk_doc("becky-gummy-bears"))
    mentions = eng.extract_mentions(extractors)
    labels = sorted(m.label for m in mentions)
    assert labels == ["Eating", "NP", "Person"]
    eating = next(m for m in mentions if m.label == "Eating")
    assert args_of(eating.match)["subject"] == [(0, 1)]


def test_trigger_overlap_filter():
    # args overlapping the trigger are dropped; required args below min kill the event
    ms = run_event(
        "becky-gummy-bears",
        """trigger = [lemma=eat]
           object: ^NP = >dobj [chunk=B-NP][chunk=I-NP]*""",
    )
    assert len(ms) == 1
    # now a rule whose only required arg lands on the trigger itself
    doc = mk_doc("becky-gummy-bears")
    eng = DocumentEngine(doc)
    rules = """
rules:
  - name: selfarg
    label: Bad
    type: event
    pattern: |
      trigger = [chunk=B-NP] [chunk=I-NP]*
      arg: ^X = >amod
"""
    extractors = RuleReader().compile_rule_string(rules)
    mentions = eng.extract_mentions(extractors)
    # "gummy bears" trigger [2,4) with >amod to "gummy" [2,3) overlaps -> dropped
    assert all(m.label != "Bad" for m in mentions)

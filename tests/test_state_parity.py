"""Cascade/state semantics vs the reference's TestState expectations."""

from collections import Counter

from odinson_ray.api import OdinsonEngine
from odinson_ray.core.matches import StateMatch

CROSS_RULES = """
rules:
  - {name: first, label: First, type: basic, priority: "1", pattern: "ate"}
  - name: second
    label: Second
    type: event
    priority: "2"
    pattern: |
      trigger = @First
      theme = >dobj []
  - name: third
    label: Third
    type: basic
    priority: "2"
    pattern: |
      @First >dobj []
  - name: fourth
    label: Fourth
    type: basic
    priority: "2"
    pattern: |
      [] <dobj @First
"""


def test_state_not_used_in_extract_no_state():
    engine = OdinsonEngine.from_fixture("becky-gummy-bears")
    mentions = engine.extract_no_state(engine.compile_rule_string(CROSS_RULES))
    assert len(mentions) == 1
    assert mentions[0].label == "First"


def test_state_queries_in_basic_patterns():
    engine = OdinsonEngine.from_fixture("becky-gummy-bears")
    mentions = engine.extract_mentions(engine.compile_rule_string(CROSS_RULES))
    counts = Counter(m.label for m in mentions)
    assert counts["First"] == 1
    assert counts["Second"] == 1
    assert counts["Third"] == 1
    assert counts["Fourth"] == 1
    # four main mentions + the promoted (unlabeled) arg
    assert len(mentions) == 5


def test_promoted_arguments_retrievable_from_state():
    rules = """
rules:
  - name: first
    label: First
    type: event
    priority: "1"
    pattern: |
      trigger = ate
      person:^Person = >nsubj []
  - name: second
    label: Second
    type: event
    priority: "2"
    pattern: |
      trigger = @Person
      whatDid = <nsubj []
"""
    engine = OdinsonEngine.from_fixture("becky-gummy-bears")
    mentions = engine.extract_mentions(engine.compile_rule_string(rules))
    assert len(mentions) == 4
    first = next(m for m in mentions if m.label == "First")
    person = first.arguments()["person"][0]
    assert person.label == "Person"
    second = next(m for m in mentions if m.label == "Second")
    did = second.arguments()["whatDid"][0]
    assert engine.mention_text(did) == "ate"


def test_promote_args_even_if_one_already_in_state():
    rules = """
rules:
  - {name: first, label: First, type: basic, priority: "1", pattern: "Becky"}
  - name: second
    label: Second
    type: event
    priority: "2"
    pattern: |
      trigger = ate
      arg: ^First+ = >> []
"""
    engine = OdinsonEngine.from_fixture("becky-gummy-bears")
    mentions = engine.extract_mentions(engine.compile_rule_string(rules))
    firsts = [m for m in mentions if m.label == "First"]
    seconds = [m for m in mentions if m.label == "Second"]
    # the original Becky + the two promoted args (bears, .)
    assert len(firsts) == 3
    assert len(seconds) == 1
    assert isinstance(seconds[0].match, StateMatch)
    args = seconds[0].arguments()["arg"]
    assert len(args) == 3
    assert all(isinstance(a.match, StateMatch) for a in args)

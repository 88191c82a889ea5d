"""Lucene RegExp translation layer (ADVICE r01 / VERDICT missing #3):
translate-or-reject — no silent divergence from Lucene semantics."""

import re

import pytest

from odinson_ray.lang.lucene_regex import (
    UnsupportedLuceneRegex,
    lucene_to_python,
)


def full(pattern, s):
    return re.compile(lucene_to_python(pattern)).fullmatch(s) is not None


def test_escape_is_literal():
    # Lucene: \x is the literal x — \d is 'd', not a digit class
    assert full(r"\d", "d")
    assert not full(r"\d", "5")
    assert full(r"\.", ".")
    assert not full(r"\.", "x")


def test_interval_no_leading_zeros():
    assert full("<3-12>", "7")
    assert full("<3-12>", "12")
    assert not full("<3-12>", "03")
    assert not full("<3-12>", "13")


def test_any_string_and_empty_language():
    assert full("@", "anything at all")
    assert full("@", "")
    assert not full("#", "")
    assert not full("#", "x")


def test_intersection_and_complement():
    assert full("[ab]+&a@", "ab")      # starts with a AND only [ab]
    assert not full("[ab]+&a@", "ba")
    # ~ binds to a single atom (Lucene complexp grammar): parenthesize
    assert full("~(abc)", "abd")
    assert not full("~(abc)", "abc")


def test_quoted_literal():
    assert full('"a+b?"', "a+b?")
    assert not full('"a+b?"', "ab")


def test_reject_unsupported_positions():
    with pytest.raises(UnsupportedLuceneRegex):
        lucene_to_python("(a&b)c")     # intersection not at end
    with pytest.raises(UnsupportedLuceneRegex):
        lucene_to_python("~a b")       # complement followed by more (b after space-less concat)
    with pytest.raises(UnsupportedLuceneRegex):
        lucene_to_python("(~a)*")      # quantified complement
    with pytest.raises(UnsupportedLuceneRegex):
        lucene_to_python("a{,2}")      # malformed repetition (Lucene needs {n,m})
    with pytest.raises(UnsupportedLuceneRegex):
        lucene_to_python("<1-99999999>")  # interval too large to expand


def test_engine_uses_lucene_dialect():
    from odinson_ray.core.matcher import Compiler, Ctx
    from odinson_ray.core.selector import select_matches
    from odinson_ray.core.sentence import SentenceIndex

    toks = "d 5 ab a".split()
    sent = SentenceIndex({"raw": toks})
    q = Compiler().compile(r"/\d/")
    got = [toks[m.start] for m in select_matches(q.matches(Ctx(sent, 0, None)))]
    assert got == ["d"]  # literal d under Lucene; a Python-dialect engine would say ['5']


def test_edge_label_lucene_dialect():
    """Traversal edge-label regexes use the Lucene dialect too: '@' is
    any-string (not a literal) and '\\d' is the literal d."""
    from odinson_ray.core.engine import DocumentEngine
    from odinson_ray.core.sentence import AnnotatedDocument, SentenceIndex
    from odinson_ray.lang.rules import RuleReader

    doc = AnnotatedDocument("d", [SentenceIndex(
        {"raw": ["Becky", "ate", "bears"]},
        [(1, 0, "nsubj"), (1, 2, "dobj")], [1])])
    rules = """
rules:
  - {name: x, label: A, type: basic, pattern: 'ate >/n@/ []'}
"""
    ms = DocumentEngine(doc).extract_mentions(RuleReader().compile_rule_string(rules))
    got = sorted((m.start, m.end) for m in ms)
    assert got == [(0, 1)]  # only the nsubj edge matches /n@/ (n + any string)


# property: on the subset where the Lucene and Python dialects coincide
# (literals, ., classes, groups, alternation, quantifiers — no escapes, no
# Lucene-only operators), translation must preserve semantics exactly.
from hypothesis import given, settings
from hypothesis import strategies as st

_LIT = "abc1"


@st.composite
def _shared_pattern(draw, depth=0):
    if depth >= 2:
        kind = draw(st.sampled_from(["lit", "dot", "cls"]))
    else:
        kind = draw(st.sampled_from(["lit", "dot", "cls", "grp", "alt", "cat"]))
    if kind == "lit":
        base = draw(st.sampled_from(_LIT))
    elif kind == "dot":
        base = "."
    elif kind == "cls":
        chars = draw(st.lists(st.sampled_from(_LIT), min_size=1, max_size=3))
        neg = draw(st.booleans())
        base = "[" + ("^" if neg else "") + "".join(sorted(set(chars))) + "]"
    elif kind == "grp":
        base = "(" + draw(_shared_pattern(depth=depth + 1)) + ")"
    elif kind == "alt":
        parts = draw(st.lists(_shared_pattern(depth=depth + 1), min_size=2, max_size=3))
        return "(" + "|".join(parts) + ")"
    else:  # cat
        parts = draw(st.lists(_shared_pattern(depth=depth + 1), min_size=2, max_size=3))
        return "".join(parts)
    quant = draw(st.sampled_from(["", "?", "*", "+", "{1,2}", "{2}"]))
    return base + quant


@given(pattern=_shared_pattern(),
       s=st.text(alphabet=_LIT + "xz", max_size=6))
@settings(max_examples=300, deadline=None)
def test_translation_preserves_shared_subset(pattern, s):
    got = re.compile(lucene_to_python(pattern)).fullmatch(s) is not None
    want = re.compile(pattern).fullmatch(s) is not None
    assert got == want, (pattern, s)


# ---------------------------------------------------- exact fallback (r3)
# VERDICT r02 item 9: complement/intersection in NON-tail positions are
# handled by the set-of-positions evaluator (compile_lucene falls back to
# it when the re translation rejects a positional restriction).

from odinson_ray.lang.lucene_regex import LuceneEval, compile_lucene


def test_midpattern_complement_and_intersection():
    cases = [
        ("~(foo)bar", ["xbar", "bar", "foobarbar"], ["foobar"]),
        ("a~(b)c", ["ac", "axc", "abbc"], ["abc"]),
        ("(a&[ab])b", ["ab"], ["bb", "aab"]),
        ("(ab&a.)c", ["abc"], ["axc", "ab"]),
        ("(~(ab)&[a-z]*)x", ["ax", "zzx", "abax"], ["abx"]),
        ("(a&b)c", [], ["ac", "bc", "c"]),   # empty intersection: nothing
        ("x(~(y))z", ["xz", "xwz", "xyyz"], ["xyz"]),
        ("(~(a))*b", ["b", "xb", "aab"], []),  # quantified complement
    ]
    for pat, yes, no in cases:
        m = compile_lucene(pat)
        assert isinstance(m, LuceneEval), pat  # re path must have rejected
        for s in yes:
            assert m.fullmatch(s), (pat, s)
        for s in no:
            assert not m.fullmatch(s), (pat, s)


def test_fallback_still_rejects_syntax_errors():
    for pat in ["a(", "a)", "[ab", "a{,2}", "a**b("]:
        with pytest.raises(UnsupportedLuceneRegex):
            compile_lucene(pat)


def test_evaluator_agrees_with_translation_at_tail():
    """Where the re translation IS exact (tail complement/intersection,
    plain operators), the evaluator must produce identical verdicts."""
    pats = ["ab~(c)", "abc&ab.", "~(foo)", "a*&@b", '"lit"x',
            "[a-c]+&@b@", "<1-12>px", "a?b+c*", "(ab|cd){1,2}"]
    strings = ["", "a", "ab", "abc", "abd", "foo", "fox", "litx",
               "aab", "abb", "cab", "b", "7px", "0px", "abcd", "abab"]
    for pat in pats:
        fast = re.compile(lucene_to_python(pat))
        ev = LuceneEval(pat)
        for s in strings:
            assert (fast.fullmatch(s) is not None) == bool(ev.fullmatch(s)), (pat, s)


@given(pattern=_shared_pattern(), s=st.text(alphabet=_LIT + "xz", max_size=6))
@settings(max_examples=300, deadline=None)
def test_evaluator_matches_python_re_on_shared_subset(pattern, s):
    got = bool(LuceneEval(pattern).fullmatch(s))
    want = re.compile(pattern).fullmatch(s) is not None
    assert got == want, (pattern, s)


def test_engine_token_regex_midpattern_complement():
    """End to end: a token-regex matcher whose pattern needs the exact
    fallback (complement mid-pattern) runs through the engine."""
    from odinson_ray.core.matcher import Compiler, Ctx
    from odinson_ray.core.selector import select_matches
    from odinson_ray.core.sentence import SentenceIndex

    toks = "xbar foobar bar foobarbar".split()
    sent = SentenceIndex({"raw": toks})
    q = Compiler().compile(r"/~(foo)bar/")
    got = [toks[m.start] for m in select_matches(q.matches(Ctx(sent, 0, None)))]
    assert got == ["xbar", "bar", "foobarbar"]

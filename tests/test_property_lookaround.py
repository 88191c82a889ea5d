"""Property test: lookaround assertions and sentence anchors agree with
Python's regex engine.

Extends test_property_regex's one-char-per-token rendering to the four
lookaround kinds and ``<s>``/``</s>`` (previously pytest-only fixtures):
at token granularity the assertions map 1:1 onto ``(?=)/(?!)/(?<=)/
(?<!)`` and ``\\A``/``\\Z``, and the same scorer-consumption scan is the
oracle. Lookbehind bodies are quantifier-free (fixed width — a Python
``re`` requirement, not an engine one; variable-width lookbehinds are
pinned by the fixture suite)."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from odinson_ray.core.matcher import Compiler, Ctx
from odinson_ray.core.selector import select_matches
from odinson_ray.core.sentence import SentenceIndex

from .test_property_regex import regex_scan

compiler = Compiler()

LITERALS = "abc"


def atoms():
    return st.sampled_from([("lit", c) for c in LITERALS] + [("wild", None)])


def bodies():
    return st.lists(atoms(), min_size=1, max_size=2)


@st.composite
def elements(draw):
    kind = draw(st.sampled_from(
        ["atom", "atom", "ahead", "behind", "start", "end"]))
    if kind == "atom":
        return ("atom", draw(atoms()))
    if kind in ("ahead", "behind"):
        return (kind, draw(st.booleans()), draw(bodies()))
    return (kind,)


@st.composite
def cases(draw):
    elems = draw(st.lists(elements(), min_size=1, max_size=4))
    if not any(e[0] == "atom" for e in elems):
        elems.append(("atom", draw(atoms())))
    return elems, draw(st.text(alphabet=LITERALS, min_size=0, max_size=7))


def _atom_od(a):
    return a[1] if a[0] == "lit" else "[]"


def _atom_rx(a):
    return a[1] if a[0] == "lit" else "."


def render_odinson(elems) -> str:
    parts = []
    for e in elems:
        if e[0] == "atom":
            parts.append(_atom_od(e[1]))
        elif e[0] == "ahead":
            parts.append(("(?= " if e[1] else "(?! ")
                         + " ".join(_atom_od(a) for a in e[2]) + ")")
        elif e[0] == "behind":
            parts.append(("(?<= " if e[1] else "(?<! ")
                         + " ".join(_atom_od(a) for a in e[2]) + ")")
        elif e[0] == "start":
            parts.append("<s>")
        else:
            parts.append("</s>")
    return " ".join(parts)


def render_regex(elems) -> str:
    parts = []
    for e in elems:
        if e[0] == "atom":
            parts.append(_atom_rx(e[1]))
        elif e[0] == "ahead":
            parts.append(("(?=" if e[1] else "(?!")
                         + "".join(_atom_rx(a) for a in e[2]) + ")")
        elif e[0] == "behind":
            parts.append(("(?<=" if e[1] else "(?<!")
                         + "".join(_atom_rx(a) for a in e[2]) + ")")
        elif e[0] == "start":
            parts.append(r"\A")
        else:
            parts.append(r"\Z")
    return "".join(parts)


@settings(max_examples=300, deadline=None)
@given(cases())
def test_lookarounds_match_regex_engine(case):
    elems, text = case
    tokens = list(text)
    sent = SentenceIndex({"raw": tokens})
    od = render_odinson(elems)
    q = compiler.compile(od)
    got = [(m.start, m.end)
           for m in select_matches(q.matches(Ctx(sent, 0, None)))]
    expected = regex_scan(render_regex(elems), text)
    assert got == expected, f"pattern={od!r} text={text!r}"

"""Surface-pattern semantics conformance (mirrors patterns/TestPatterns.scala)."""

import pytest

from odinson_ray.core.matcher import Compiler, Ctx
from odinson_ray.core.selector import select_matches
from odinson_ray.core.sentence import SentenceIndex

from .conformance_cases import CASES

compiler = Compiler()


def run(pattern: str, text: str):
    toks = text.split(" ")
    sent = SentenceIndex({"raw": toks})
    q = compiler.compile(pattern)
    selected = select_matches(q.matches(Ctx(sent, 0, None)))
    return ";".join(" ".join(toks[m.start : m.end]) for m in selected)


@pytest.mark.parametrize("pattern,text,expected", CASES)
def test_pattern_conformance(pattern, text, expected):
    assert run(pattern, text) == expected

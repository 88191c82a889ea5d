"""Property test: metadata-filter expressions agree with a direct
Python evaluator on random documents.

The 25-case table in test_metadata pins the reference's semantics
case-by-case; this pins arbitrary COMPOSITIONS — nested boolean
combinators over numeric comparisons, chained comparisons, normalized
string equality, token-sequence contains, and missing fields — with
every sub-expression parenthesized so the pin is about evaluation, not
precedence."""

from hypothesis import given, settings
from hypothesis import strategies as st

from odinson_ray.lang.metadata import compile_filter

LANGS = ["en", "de"]
LANG_LITS = ["en", "de", "fr"]
TAGS = ["t1", "t2", "t3"]
NUM_OPS = ["==", "!=", ">", ">=", "<", "<="]


def metadata():
    return st.fixed_dictionaries({
        "n": st.integers(0, 10),
        "lang": st.sampled_from(LANGS),
        "tags": st.lists(st.sampled_from(TAGS), min_size=1, max_size=4),
    })


@st.composite
def exprs(draw, depth=0):
    if depth >= 3:
        kind = draw(st.sampled_from(["num", "chain", "str", "contains"]))
    else:
        kind = draw(st.sampled_from(
            ["num", "chain", "str", "contains", "missing",
             "and", "or", "not"]))
    if kind == "num":
        return ("num", draw(st.sampled_from(NUM_OPS)),
                draw(st.integers(0, 10)))
    if kind == "chain":
        lo = draw(st.integers(0, 10))
        hi = draw(st.integers(0, 10))
        return ("chain", draw(st.sampled_from(["<", "<="])), lo,
                draw(st.sampled_from(["<", "<="])), hi)
    if kind == "str":
        return ("str", draw(st.booleans()), draw(st.sampled_from(LANG_LITS)))
    if kind == "contains":
        phrase = draw(st.lists(st.sampled_from(TAGS),
                               min_size=1, max_size=2))
        return ("contains", draw(st.booleans()), phrase)
    if kind == "missing":
        return ("missing", draw(st.sampled_from(["==", "!="])),
                draw(st.sampled_from(LANG_LITS)))
    if kind == "not":
        return ("not", draw(exprs(depth=depth + 1)))
    return (kind, draw(exprs(depth=depth + 1)),
            draw(exprs(depth=depth + 1)))


def render(e) -> str:
    k = e[0]
    if k == "num":
        return f"(n {e[1]} {e[2]})"
    if k == "chain":
        return f"({e[2]} {e[1]} n {e[3]} {e[4]})"
    if k == "str":
        return f"(lang {'==' if e[1] else '!='} '{e[2]}')"
    if k == "contains":
        phrase = " ".join(e[2])
        return f"(tags {'contains' if e[1] else 'not contains'} '{phrase}')"
    if k == "missing":
        return f"(ghost {e[1]} '{e[2]}')"
    if k == "not":
        return f"!({render(e[1])})"
    op = "&&" if k == "and" else "||"
    return f"({render(e[1])} {op} {render(e[2])})"


def contains_seq(hay, needle):
    return any(hay[i:i + len(needle)] == needle
               for i in range(len(hay) - len(needle) + 1))


def brute(e, md) -> bool:
    k = e[0]
    if k == "num":
        n, op, c = md["n"], e[1], e[2]
        return {"==": n == c, "!=": n != c, ">": n > c, ">=": n >= c,
                "<": n < c, "<=": n <= c}[op]
    if k == "chain":
        _, op1, lo, op2, hi = e
        n = md["n"]
        a = lo < n if op1 == "<" else lo <= n
        b = n < hi if op2 == "<" else n <= hi
        return a and b
    if k == "str":
        return (md["lang"] == e[2]) == e[1]
    if k == "contains":
        return contains_seq(md["tags"], e[2]) == e[1]
    if k == "missing":
        return False  # any comparison against an absent field
    if k == "not":
        return not brute(e[1], md)
    if k == "and":
        return brute(e[1], md) and brute(e[2], md)
    return brute(e[1], md) or brute(e[2], md)


@settings(max_examples=300, deadline=None)
@given(exprs(), metadata())
def test_metadata_filter_matches_bruteforce(e, md):
    query = render(e)
    pred = compile_filter(query)
    doc = {"n": float(md["n"]), "lang": md["lang"], "tags": list(md["tags"])}
    assert pred(doc) == brute(e, md), query

"""Lucene RegExp -> Python ``re`` translation for token regex matchers.

The reference compiles token regexes with Lucene's ``RegexpQuery``
(``core/.../QueryCompiler.scala:429-432``), whose syntax
(org.apache.lucene.util.automaton.RegExp) differs from Python ``re``:

- always anchored (we already fullmatch)
- ``@`` = any string, ``#`` = empty language, ``<n-m>`` = numeric interval
- ``~`` = complement, ``&`` = intersection (automaton operations)
- ``"..."`` = quoted literal
- ``\\x`` escapes the single char x — so ``\\d`` is the LITERAL d, not a
  digit class; lookarounds/backrefs do not exist

``lucene_to_python`` translates a Lucene pattern into an equivalent
Python pattern for ``re.fullmatch``. Complement and intersection are
automaton operations with no compositional regex equivalent; they are
translated via lookaheads, which is exact only where the expression runs
to the end of the match — elsewhere ``lucene_to_python`` raises
``UnsupportedLuceneRegex`` ("translate-or-reject": silent divergence is
never allowed).

``compile_lucene`` adds the exact fallback for the rejected positions:
a set-of-positions evaluator over the pattern AST (``_LuceneEval``).
For each subexpression it computes every end offset j such that
``s[i:j]`` is in the subexpression's language, so complement is plain
set difference against {i..len} and intersection is set intersection —
exact at ANY position, not just the tail. Token strings are short
(token alphabets are per-sentence and tiny), so the O(|s|^2 · nodes)
set algebra is cheap; the common no-``~``/``&`` case still uses the
compiled ``re`` fast path. Predicates are evaluated once per batch
vocabulary (BatchVocab memo), so even the evaluator runs once per
unique term, never per token position.

Grammar (after Lucene's RegExp javadoc), precedence loosest→tightest:
    union   := inter ('|' inter)*
    inter   := concat ('&' concat)*
    concat  := repeat+
    repeat  := comp ('?'|'*'|'+'|'{n}'|'{n,}'|'{n,m}')*
    comp    := '~' comp | atom
    atom    := char | '\\' char | '.' | '#' | '@' | '"' str '"'
             | '[' class ']' | '(' union ')' | '<' n '-' m '>'
"""

from __future__ import annotations

import re
from typing import Tuple

_MAX_INTERVAL = 10000


class UnsupportedLuceneRegex(ValueError):
    """Lucene construct with no exact Python translation in this position."""


class _Parser:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def error(self, msg: str):
        raise UnsupportedLuceneRegex(
            f"{msg} at position {self.i} in Lucene regex {self.s!r}")

    def peek(self):
        return self.s[self.i] if self.i < len(self.s) else None

    def take(self):
        c = self.peek()
        if c is None:
            self.error("unexpected end")
        self.i += 1
        return c

    # at_end: the expression being parsed extends to the end of the whole
    # (anchored) pattern — the only place complement/intersection are exact
    def union(self, at_end: bool) -> str:
        parts = [self.inter(at_end)]
        while self.peek() == "|":
            self.take()
            parts.append(self.inter(at_end))
        if len(parts) == 1:
            return parts[0]
        return "(?:" + "|".join(parts) + ")"

    def inter(self, at_end: bool) -> str:
        parts = [self.concat(at_end)]
        while self.peek() == "&":
            self.take()
            parts.append(self.concat(at_end))
        if len(parts) == 1:
            return parts[0]
        if not at_end:
            self.error("intersection '&' not at end of pattern")
        # A & B & C -> all must match the (same) remainder to end
        head = "".join(f"(?=(?:{p})\\Z)" for p in parts[:-1])
        return head + f"(?:{parts[-1]})"

    def concat(self, at_end: bool) -> str:
        atoms = []
        while True:
            c = self.peek()
            if c is None or c in "|&)":
                break
            atoms.append(self.repeat())
        if not atoms:
            return ""
        out = []
        for idx, a in enumerate(atoms):
            if isinstance(a, _Complement):
                # exact only where the complemented span runs to match end
                if not (at_end and idx == len(atoms) - 1):
                    self.error("complement '~' not at end of pattern")
                out.append(f"(?:(?!(?:{a.inner})\\Z)(?s:.*))")
            else:
                out.append(a)
        return "".join(out)

    def repeat(self):
        base = self.comp()
        while True:
            c = self.peek()
            if c in ("?", "*", "+"):
                self.take()
                if isinstance(base, _Complement):
                    self.error("quantified complement")
                base = f"(?:{base}){c}"
            elif c == "{":
                j = self.s.find("}", self.i)
                if j < 0:
                    self.error("unterminated '{'")
                body = self.s[self.i + 1 : j]
                if not re.fullmatch(r"\d+(,\d*)?", body):
                    self.error(f"bad repetition {{{body}}}")
                self.i = j + 1
                if isinstance(base, _Complement):
                    self.error("quantified complement")
                base = f"(?:{base}){{{body}}}"
            else:
                return base

    def comp(self):
        if self.peek() == "~":
            self.take()
            inner = self.comp()
            if isinstance(inner, _Complement):
                self.error("double complement")
            return _Complement(inner)
        return self.atom()

    def atom(self) -> str:
        c = self.take()
        if c == ".":
            return "(?s:.)"
        if c == "#":
            return "(?!)"  # empty language: matches nothing
        if c == "@":
            return "(?s:.*)"
        if c == "\\":
            return re.escape(self.take())  # \x is ALWAYS the literal x
        if c == '"':
            j = self.s.find('"', self.i)
            if j < 0:
                self.error("unterminated quote")
            lit = self.s[self.i : j]
            self.i = j + 1
            return re.escape(lit)
        if c == "(":
            inner = self.union(at_end=False)
            if self.peek() != ")":
                self.error("unterminated '('")
            self.take()
            return f"(?:{inner})"
        if c == "[":
            return self.char_class()
        if c == "<":
            j = self.s.find(">", self.i)
            if j < 0:
                self.error("unterminated '<'")
            body = self.s[self.i : j]
            m = re.fullmatch(r"(\d+)-(\d+)", body)
            if not m:
                self.error(f"bad interval <{body}>")
            lo, hi = int(m.group(1)), int(m.group(2))
            if lo > hi:
                lo, hi = hi, lo
            if hi - lo + 1 > _MAX_INTERVAL:
                self.error(f"interval <{body}> too large to translate")
            self.i = j + 1
            return "(?:" + "|".join(str(v) for v in range(lo, hi + 1)) + ")"
        if c in ")]}":
            self.error(f"unbalanced {c!r}")
        if c in "?*+{":
            self.error(f"dangling quantifier {c!r}")
        return re.escape(c)

    def char_class(self) -> str:
        out = ["["]
        if self.peek() == "^":
            out.append(self.take())
        first = True
        while True:
            c = self.peek()
            if c is None:
                self.error("unterminated '['")
            if c == "]" and not first:
                self.take()
                out.append("]")
                return "".join(out)
            first = False
            c = self.take()
            if c == "\\":
                out.append(re.escape(self.take()))
            elif c == "-":
                if self.peek() != "]" and out[-1] not in ("[", "^"):
                    out.append("-")  # range separator
                else:
                    out.append("\\-")  # literal leading/trailing dash
            else:
                out.append(re.escape(c))


class _Complement:
    def __init__(self, inner: str):
        self.inner = inner


# ------------------------------------------------- exact fallback evaluator
#
# Set-of-positions semantics: node.ends(s, i) = every j with s[i:j] in the
# node's language. Complement/intersection become set algebra, exact at any
# position. Memoized per (node, start) within one fullmatch call, so the
# cost is O(|s|^2) per node on strings that are single tokens.

class _N:
    __slots__ = ()

    def ends(self, s: str, i: int, memo: dict):
        key = (id(self), i)
        r = memo.get(key)
        if r is None:
            memo[key] = r = self._ends(s, i, memo)
        return r


class _Lit(_N):
    __slots__ = ("lit",)

    def __init__(self, lit: str):
        self.lit = lit

    def _ends(self, s, i, memo):
        return (
            frozenset((i + len(self.lit),))
            if s.startswith(self.lit, i)
            else frozenset()
        )


class _AnyChar(_N):
    def _ends(self, s, i, memo):
        return frozenset((i + 1,)) if i < len(s) else frozenset()


class _AnyStr(_N):
    def _ends(self, s, i, memo):
        return frozenset(range(i, len(s) + 1))


class _EmptyLang(_N):  # '#'
    def _ends(self, s, i, memo):
        return frozenset()


class _Class(_N):
    __slots__ = ("rx",)

    def __init__(self, python_class: str):
        self.rx = re.compile(python_class)

    def _ends(self, s, i, memo):
        if i < len(s) and self.rx.match(s[i]) is not None:
            return frozenset((i + 1,))
        return frozenset()


class _Interval(_N):
    """<n-m>; same language as the translation's alternation: decimal
    values without leading zeros."""

    __slots__ = ("lo", "hi")

    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi

    def _ends(self, s, i, memo):
        out, j, n = [], i, len(s)
        while j < n and s[j].isdigit():
            j += 1
            sub = s[i:j]
            if len(sub) > 1 and sub[0] == "0":
                continue
            if self.lo <= int(sub) <= self.hi:
                out.append(j)
        return frozenset(out)


class _Concat(_N):
    __slots__ = ("parts",)

    def __init__(self, parts):
        self.parts = parts

    def _ends(self, s, i, memo):
        cur = {i}
        for p in self.parts:
            nxt = set()
            for j in cur:
                nxt |= p.ends(s, j, memo)
            if not nxt:
                return frozenset()
            cur = nxt
        return frozenset(cur)


class _Union(_N):
    __slots__ = ("parts",)

    def __init__(self, parts):
        self.parts = parts

    def _ends(self, s, i, memo):
        out = set()
        for p in self.parts:
            out |= p.ends(s, i, memo)
        return frozenset(out)


class _Inter(_N):
    __slots__ = ("parts",)

    def __init__(self, parts):
        self.parts = parts

    def _ends(self, s, i, memo):
        out = set(self.parts[0].ends(s, i, memo))
        for p in self.parts[1:]:
            out &= p.ends(s, i, memo)
            if not out:
                break
        return frozenset(out)


class _Compl(_N):
    __slots__ = ("inner",)

    def __init__(self, inner):
        self.inner = inner

    def _ends(self, s, i, memo):
        return frozenset(range(i, len(s) + 1)) - self.inner.ends(s, i, memo)


class _Rep(_N):
    __slots__ = ("base", "lo", "hi")  # hi None = unbounded

    def __init__(self, base, lo: int, hi):
        self.base, self.lo, self.hi = base, lo, hi

    def _ends(self, s, i, memo):
        cur = {i}
        for _ in range(self.lo):
            nxt = set()
            for j in cur:
                nxt |= self.base.ends(s, j, memo)
            if not nxt:
                return frozenset()
            cur = nxt
        out = set(cur)
        rounds = 0
        # frontier expansion; stop when a round adds nothing new (every
        # frontier position was already expanded, so later rounds repeat)
        while self.hi is None or rounds < self.hi - self.lo:
            nxt = set()
            for j in cur:
                nxt |= self.base.ends(s, j, memo)
            rounds += 1
            new = nxt - out
            out |= nxt
            cur = nxt
            if not new:
                break
        return frozenset(out)


class _AstParser(_Parser):
    """Same grammar as _Parser, producing the evaluator AST (no positional
    restrictions: complement/intersection are exact everywhere here)."""

    def union(self):  # type: ignore[override]
        parts = [self.inter()]
        while self.peek() == "|":
            self.take()
            parts.append(self.inter())
        return parts[0] if len(parts) == 1 else _Union(parts)

    def inter(self):  # type: ignore[override]
        parts = [self.concat()]
        while self.peek() == "&":
            self.take()
            parts.append(self.concat())
        return parts[0] if len(parts) == 1 else _Inter(parts)

    def concat(self):  # type: ignore[override]
        atoms = []
        while True:
            c = self.peek()
            if c is None or c in "|&)":
                break
            atoms.append(self.repeat())
        if not atoms:
            return _Lit("")
        return atoms[0] if len(atoms) == 1 else _Concat(atoms)

    def repeat(self):  # type: ignore[override]
        base = self.comp()
        while True:
            c = self.peek()
            if c in ("?", "*", "+"):
                self.take()
                lo, hi = {"?": (0, 1), "*": (0, None), "+": (1, None)}[c]
                base = _Rep(base, lo, hi)
            elif c == "{":
                j = self.s.find("}", self.i)
                if j < 0:
                    self.error("unterminated '{'")
                body = self.s[self.i + 1 : j]
                if not re.fullmatch(r"\d+(,\d*)?", body):
                    self.error(f"bad repetition {{{body}}}")
                self.i = j + 1
                if "," in body:
                    lo_s, hi_s = body.split(",", 1)
                    lo, hi = int(lo_s), (int(hi_s) if hi_s else None)
                else:
                    lo = hi = int(body)
                base = _Rep(base, lo, hi)
            else:
                return base

    def comp(self):  # type: ignore[override]
        if self.peek() == "~":
            self.take()
            return _Compl(self.comp())
        return self.atom()

    def atom(self):  # type: ignore[override]
        c = self.take()
        if c == ".":
            return _AnyChar()
        if c == "#":
            return _EmptyLang()
        if c == "@":
            return _AnyStr()
        if c == "\\":
            return _Lit(self.take())
        if c == '"':
            j = self.s.find('"', self.i)
            if j < 0:
                self.error("unterminated quote")
            lit = self.s[self.i : j]
            self.i = j + 1
            return _Lit(lit)
        if c == "(":
            inner = self.union()
            if self.peek() != ")":
                self.error("unterminated '('")
            self.take()
            return inner
        if c == "[":
            return _Class(self.char_class())
        if c == "<":
            j = self.s.find(">", self.i)
            if j < 0:
                self.error("unterminated '<'")
            body = self.s[self.i : j]
            m = re.fullmatch(r"(\d+)-(\d+)", body)
            if not m:
                self.error(f"bad interval <{body}>")
            lo, hi = int(m.group(1)), int(m.group(2))
            if lo > hi:
                lo, hi = hi, lo
            self.i = j + 1
            return _Interval(lo, hi)
        if c in ")]}":
            self.error(f"unbalanced {c!r}")
        if c in "?*+{":
            self.error(f"dangling quantifier {c!r}")
        return _Lit(c)


class LuceneEval:
    """Exact Lucene-regex matcher (set-of-positions evaluation); exposes
    ``fullmatch`` like a compiled ``re`` pattern (truthy / None)."""

    __slots__ = ("pattern", "root")

    def __init__(self, pattern: str):
        p = _AstParser(pattern)
        self.root = p.union()
        if p.i != len(pattern):
            p.error(f"unexpected {pattern[p.i]!r}")
        self.pattern = pattern

    def fullmatch(self, s: str):
        return True if len(s) in self.root.ends(s, 0, {}) else None


def lucene_to_python(pattern: str) -> str:
    """Lucene RegExp string -> Python pattern for ``re.fullmatch``."""
    p = _Parser(pattern)
    out = p.union(at_end=True)
    if p.i != len(pattern):
        p.error(f"unexpected {pattern[p.i]!r}")
    if isinstance(out, _Complement):  # whole pattern is '~X'
        out = f"(?:(?!(?:{out.inner})\\Z)(?s:.*))"
    return out


def compile_lucene(pattern: str):
    """Compiled matcher with Lucene semantics (use ``.fullmatch``).

    Fast path: the ``re`` translation. When that is rejected only for a
    positional reason (complement/intersection not at the pattern tail),
    fall back to the exact ``LuceneEval`` evaluator; genuine syntax
    errors re-raise from the fallback's parse."""
    try:
        return re.compile(lucene_to_python(pattern))
    except UnsupportedLuceneRegex:
        return LuceneEval(pattern)

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
to the end of the match — elsewhere we raise ``UnsupportedLuceneRegex``
("translate-or-reject": silent divergence is never allowed).

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
    """Compiled Python regex with Lucene semantics (use .fullmatch)."""
    return re.compile(lucene_to_python(pattern))

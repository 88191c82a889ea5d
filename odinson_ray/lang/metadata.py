"""Metadata query language: parser + evaluator over per-document metadata.

Port of the reference's metadata filter grammar and semantics
(reference: metadata/QueryParser.scala, metadata/Ast.scala,
metadata/MetadataCompiler.scala):

- ``a && b``, ``a || b``, ``!(...)``, grouping
- chained comparisons ``1 < x < 10`` desugar to AND of pairs
- ``==``/``!=`` on text metadata use aggressive unicode normalization and
  exact-span equality (the sentinel-token trick in the reference == full
  tokenized-field equality here)
- ``field contains 'phrase'`` / ``not contains`` = tokenized phrase search
- ``date(y[,m[,d]])`` -> epoch day; ``field.year`` attribute sugar
- ``author{first == 'x' && last == 'y'}`` nested blocks: true if ANY
  nested entry satisfies the inner expression (block-join semantics)

Metadata is a plain dict: str | int/float | datetime.date | list[str]
(tokenized text field) | list[dict] (nested entries).
"""

from __future__ import annotations

import datetime
from typing import Any, Dict, List, Optional, Tuple

from ..common.normalize import normalize_unicode_aggressively
from .parser import _Fail


# ---------------------------------------------------------------- AST

class B:  # boolean expression nodes
    pass


class OrE(B):
    def __init__(self, clauses):
        self.clauses = clauses


class AndE(B):
    def __init__(self, clauses):
        self.clauses = clauses


class NotE(B):
    def __init__(self, expr):
        self.expr = expr


class Cmp(B):
    def __init__(self, op, lhs, rhs):
        self.op = op
        self.lhs = lhs
        self.rhs = rhs


class NestedE(B):
    def __init__(self, name, expr):
        self.name = name
        self.expr = expr


class ContainsE(B):
    def __init__(self, field, value, negated):
        self.field = field
        self.value = value
        self.negated = negated


class V:  # value nodes
    pass


class NumberV(V):
    def __init__(self, n):
        self.n = float(n)


class StringV(V):
    def __init__(self, s):
        self.s = s
        self.norm = normalize_unicode_aggressively(s)


class FieldV(V):
    def __init__(self, name):
        self.name = name


class FunV(V):
    def __init__(self, name, args):
        self.name = name
        self.args = args


# ---------------------------------------------------------------- parser

class MetadataQueryParser:
    def __init__(self):
        self.s = ""
        self.pos = 0

    def parse(self, query: str) -> B:
        self.s = query.strip()
        self.pos = 0
        expr = self._or()
        self._ws()
        if self.pos != len(self.s):
            raise ValueError(f"could not parse metadata query at {self.pos}: {self.s[self.pos:self.pos+20]!r}")
        return expr

    def _ws(self):
        while self.pos < len(self.s) and self.s[self.pos] in " \t\r\n":
            self.pos += 1

    def _lit(self, lit):
        self._ws()
        if self.s.startswith(lit, self.pos):
            self.pos += len(lit)
            return True
        return False

    def _require(self, lit):
        if not self._lit(lit):
            raise _Fail(lit)

    def _identifier(self) -> str:
        self._ws()
        s, i = self.s, self.pos
        if i >= len(s) or not (s[i].isalpha() or s[i] == "_"):
            raise _Fail("identifier")
        j = i + 1
        while j < len(s) and (s[j].isalnum() or s[j] == "_"):
            j += 1
        self.pos = j
        return s[i:j]

    def _try(self, fn):
        saved = self.pos
        try:
            return fn()
        except (_Fail, ValueError):
            self.pos = saved
            return None

    def _or(self) -> B:
        clauses = [self._and()]
        while self._lit("||"):
            clauses.append(self._and())
        return clauses[0] if len(clauses) == 1 else OrE(clauses)

    def _and(self) -> B:
        clauses = [self._atomic()]
        while self._lit("&&"):
            clauses.append(self._atomic())
        return clauses[0] if len(clauses) == 1 else AndE(clauses)

    def _atomic(self) -> B:
        for fn in (self._cmp, self._group, self._nested, self._contains):
            r = self._try(fn)
            if r is not None:
                return r
        raise ValueError(f"invalid metadata expression at {self.pos}")

    def _group(self) -> B:
        self._ws()
        negated = self._lit("!")
        self._require("(")
        expr = self._or()
        self._require(")")
        return NotE(expr) if negated else expr

    def _nested(self) -> B:
        name = self._identifier()
        self._require("{")
        expr = self._or()
        self._require("}")
        return NestedE(name, expr)

    def _contains(self) -> B:
        field = self._field_value()
        self._ws()
        negated = False
        if self._lit("not"):
            negated = True
        self._require("contains")
        value = self._string_value()
        return ContainsE(field, value, negated)

    _OPS = (">=", "<=", "==", "!=", ">", "<")

    def _cmp_op(self) -> str:
        self._ws()
        for op in self._OPS:
            if self.s.startswith(op, self.pos):
                self.pos += len(op)
                return op
        raise _Fail("cmp op")

    def _cmp(self) -> B:
        lhs = self._value()
        op = self._cmp_op()
        rhs = self._value()
        clauses = [Cmp(op, lhs, rhs)]
        while True:
            saved = self.pos
            try:
                op2 = self._cmp_op()
                rhs2 = self._value()
            except _Fail:
                self.pos = saved
                break
            clauses.append(Cmp(op2, clauses[-1].rhs, rhs2))
        return clauses[0] if len(clauses) == 1 else AndE(clauses)

    def _value(self) -> V:
        for fn in (self._fun_call, self._string_value, self._number_value, self._field_value):
            r = self._try(fn)
            if r is not None:
                return r
        raise _Fail("value")

    def _fun_call(self) -> V:
        name = self._identifier()
        self._require("(")
        args = []
        r = self._try(self._value)
        if r is not None:
            args.append(r)
            while self._lit(","):
                args.append(self._value())
        self._require(")")
        return FunV(name, args)

    def _string_value(self) -> StringV:
        self._ws()
        s, i = self.s, self.pos
        if i >= len(s) or s[i] not in "'\"":
            raise _Fail("string")
        quote = s[i]
        j = i + 1
        while j < len(s):
            if s[j] == "\\":
                j += 2
            elif s[j] == quote:
                self.pos = j + 1
                return StringV(s[i + 1 : j].replace("\\" + quote, quote))
            else:
                j += 1
        raise _Fail("unterminated string")

    def _number_value(self) -> NumberV:
        self._ws()
        s, i = self.s, self.pos
        j = i
        while j < len(s) and s[j].isdigit():
            j += 1
        if j == i:
            raise _Fail("number")
        # disallow identifiers starting with digits gluing on
        self.pos = j
        return NumberV(int(s[i:j]))

    def _field_value(self) -> FieldV:
        name = self._identifier()
        if self.pos < len(self.s) and self.s[self.pos] == ".":
            self.pos += 1
            attr = self._identifier()
            return FieldV(f"{name}.{attr}")
        return FieldV(name)


# ---------------------------------------------------------------- evaluator

EPOCH = datetime.date(1970, 1, 1)


def _epoch_day(d: datetime.date) -> float:
    return float((d - EPOCH).days)


def _tokens_of(value) -> Optional[List[str]]:
    if isinstance(value, list) and all(isinstance(x, str) for x in value):
        return [normalize_unicode_aggressively(x) for x in value]
    if isinstance(value, str):
        return [normalize_unicode_aggressively(x) for x in value.split(" ") if x]
    return None


def _resolve(field: str, metadata: Dict[str, Any]):
    """Resolve a field (with optional .year attribute) to a runtime value."""
    if "." in field:
        base, attr = field.split(".", 1)
        v = metadata.get(base)
        if attr == "year" and isinstance(v, (datetime.date, datetime.datetime)):
            return float(v.year)
        return None
    v = metadata.get(field)
    if isinstance(v, datetime.datetime):
        return v.date()
    return v


def _eval_value(v: V, metadata: Dict[str, Any]):
    if isinstance(v, NumberV):
        return v.n
    if isinstance(v, StringV):
        return v
    if isinstance(v, FieldV):
        return _resolve(v.name, metadata)
    if isinstance(v, FunV):
        if v.name == "date":
            args = [int(_eval_value(a, metadata)) for a in v.args]
            y = args[0]
            m = args[1] if len(args) > 1 else 1
            d = args[2] if len(args) > 2 else 1
            return datetime.date(y, m, d)
        raise ValueError(f"unknown function '{v.name}'")
    raise ValueError(f"bad value {v!r}")


def _as_number(x) -> Optional[float]:
    if isinstance(x, bool):
        return None
    if isinstance(x, (int, float)):
        return float(x)
    if isinstance(x, datetime.date):
        return _epoch_day(x)
    return None


def _compare(op: str, lhs, rhs) -> bool:
    # string/text comparison: exact normalized-span equality
    if isinstance(lhs, StringV) or isinstance(rhs, StringV):
        sv, other = (lhs, rhs) if isinstance(lhs, StringV) else (rhs, lhs)
        if isinstance(other, StringV):
            a, b = sv.norm, other.norm
        else:
            toks = _tokens_of(other)
            if toks is None:
                return False
            a, b = " ".join(toks), " ".join(sv.norm.split())
        if op == "==":
            return a == b
        if op == "!=":
            return a != b
        return False
    a, b = _as_number(lhs), _as_number(rhs)
    if a is None or b is None:
        return False
    return {
        ">": a > b,
        "<": a < b,
        ">=": a >= b,
        "<=": a <= b,
        "==": a == b,
        "!=": a != b,
    }[op]


def evaluate(expr: B, metadata: Dict[str, Any]) -> bool:
    if isinstance(expr, OrE):
        return any(evaluate(c, metadata) for c in expr.clauses)
    if isinstance(expr, AndE):
        return all(evaluate(c, metadata) for c in expr.clauses)
    if isinstance(expr, NotE):
        return not evaluate(expr.expr, metadata)
    if isinstance(expr, NestedE):
        entries = metadata.get(expr.name)
        if not isinstance(entries, list):
            return False
        return any(isinstance(e, dict) and evaluate(expr.expr, e) for e in entries)
    if isinstance(expr, ContainsE):
        toks = _tokens_of(_resolve(expr.field.name, metadata))
        if toks is None:
            result = False
        else:
            needle = expr.value.norm.split()
            n, m = len(toks), len(needle)
            result = any(toks[i : i + m] == needle for i in range(n - m + 1)) if m else True
        return not result if expr.negated else result
    if isinstance(expr, Cmp):
        lhs = _eval_value(expr.lhs, metadata)
        rhs = _eval_value(expr.rhs, metadata)
        # chained comparisons re-evaluate the shared middle value; fine for
        # pure field/literal values
        if expr.op == "!=" and not isinstance(lhs, StringV) and not isinstance(rhs, StringV):
            return not _compare("==", lhs, rhs)
        return _compare(expr.op, lhs, rhs)
    raise ValueError(f"bad expression {expr!r}")


_FILTER_CACHE: Dict[str, B] = {}


def compile_filter(query: str):
    """query string -> predicate(metadata_dict) -> bool (parsed once)."""
    expr = _FILTER_CACHE.get(query)
    if expr is None:
        expr = MetadataQueryParser().parse(query)
        _FILTER_CACHE[query] = expr
    return lambda md: evaluate(expr, md or {})

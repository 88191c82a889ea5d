"""Compiled query tree + per-sentence execution.

This is the Ray-side analogue of the reference's OdinsonQuery tree and Spans
automata, executed per sentence inside map_batches. Each compiled node
implements ``matches(ctx) -> list[Match]`` returning ALL candidate matches
sorted by (start, end) — match disambiguation happens afterwards in
selector.select_matches, exactly like OdinsonScorer + MatchSelector.

Compiler ported from reference: compiler/QueryCompiler.scala (including the
wildcard-merging / distinct-clauses simplifications, which matter for
MatchSelector tie-breaking). Span semantics ported from the individual
lucene/search/*Query.scala automata (cited per node).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from ..common.normalize import normalize_unicode, normalize_unicode_aggressively
from ..lang import ast
from ..lang.lucene_regex import compile_lucene
from ..lang.parser import INT_MAX, QueryParser
from . import traversal as trav
from .matches import (
    ConcatMatch,
    EventSketch,
    GraphTraversalMatch,
    Match,
    NamedMatch,
    NGramMatch,
    OptionalMatch,
    OrMatch,
    RepetitionMatch,
    StateMatch,
    sort_key,
)
from .sentence import ALL_TOKEN_FIELDS, DEFAULT_TOKEN_FIELD, SentenceIndex


class Ctx:
    """Execution context for one sentence: the sentence index plus a view of
    the per-document mention state (for @Label StateQuery reads)."""

    __slots__ = ("sent", "sent_idx", "state")

    def __init__(self, sent: SentenceIndex, sent_idx: int, state=None):
        self.sent = sent
        self.sent_idx = sent_idx
        self.state = state


# ===================================================================== queries

class Query:
    def matches(self, ctx: Ctx) -> List[Match]:
        raise NotImplementedError


class FailQuery(Query):
    def matches(self, ctx):
        return []


class TermQuery(Query):
    """Positional term lookup (SpanTermQuery analogue)."""

    def __init__(self, field: str, term: str):
        self.field = field
        self.term = term

    def matches(self, ctx):
        return [NGramMatch(i, i + 1) for i in ctx.sent.positions_for_term(self.field, self.term)]


class RegexTermQuery(Query):
    """Whole-token regex over the term dictionary (RegexpQuery analogue;
    Lucene regexes are implicitly anchored -> re.fullmatch). The pattern
    dialect is Lucene RegExp, translated (or rejected, never silently
    diverging) by lang/lucene_regex — so `\\d` is the literal d, and
    `~ & @ # <n-m>` carry their Lucene automaton meanings
    (QueryCompiler.scala:429-432)."""

    def __init__(self, field: str, pattern: str):
        self.field = field
        self.regex = compile_lucene(pattern)
        self._pred = lambda term, _m=self.regex.fullmatch: _m(term) is not None

    def matches(self, ctx):
        # predicate evaluated once per batch vocabulary (memo keyed by the
        # compiled query object), not once per sentence
        positions = ctx.sent.positions_matching(self.field, self, self._pred)
        return [NGramMatch(i, i + 1) for i in positions]


def _edit_distance_le2(a: str, b: str) -> bool:
    """Damerau-Levenshtein distance <= 2 (Lucene FuzzyQuery default)."""
    if abs(len(a) - len(b)) > 2:
        return False
    prev2: Optional[List[int]] = None
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cost = 0 if ca == cb else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if i > 1 and j > 1 and ca == b[j - 2] and a[i - 2] == cb:
                cur[j] = min(cur[j], prev2[j - 2] + cost)
        if min(cur) > 2:
            return False
        prev2, prev = prev, cur
    return prev[-1] <= 2


class FuzzyTermQuery(Query):
    def __init__(self, field: str, term: str):
        self.field = field
        self.term = term
        self._pred = lambda t, _q=term: _edit_distance_le2(t, _q)

    def matches(self, ctx):
        positions = ctx.sent.positions_matching(self.field, self, self._pred)
        return [NGramMatch(i, i + 1) for i in positions]


class AllNGramsQuery(Query):
    """All n-grams of length n; n=0 -> zero-width at every position
    (reference: AllNGramsQuery.scala)."""

    def __init__(self, n: int):
        self.n = n

    def matches(self, ctx):
        length = ctx.sent.length
        return [NGramMatch(i, i + self.n) for i in range(length - self.n + 1)]


class DocStartQuery(Query):
    def matches(self, ctx):
        return [NGramMatch(0, 0)]


class DocEndQuery(Query):
    def matches(self, ctx):
        n = ctx.sent.length
        return [NGramMatch(n, n)]


class OrQuery(Query):
    """Ordered alternation; wraps each clause match in OrMatch(clause_id)
    (reference: OdinOrQuery.scala:91-273)."""

    def __init__(self, clauses: List[Query]):
        self.clauses = clauses

    def matches(self, ctx):
        out = []
        for i, clause in enumerate(self.clauses):
            out.extend(OrMatch(m, i) for m in clause.matches(ctx))
        out.sort(key=sort_key)
        return out


class TermAndQuery(Query):
    """Conjunction over the same position (reference: OdinTermAndQuery.scala)."""

    def __init__(self, clauses: List[Query]):
        self.clauses = clauses

    def matches(self, ctx):
        span_sets = []
        for clause in self.clauses:
            span_sets.append({(m.start, m.end) for m in clause.matches(ctx)})
        common = set.intersection(*span_sets) if span_sets else set()
        return [NGramMatch(s, e) for s, e in sorted(common)]


class NotQuery(Query):
    """include spans minus exclude spans by span equality
    (reference: OdinNotQuery.scala)."""

    def __init__(self, include: Query, exclude: Query):
        self.include = include
        self.exclude = exclude

    def matches(self, ctx):
        excluded = {(m.start, m.end) for m in self.exclude.matches(ctx)}
        return [m for m in self.include.matches(ctx) if (m.start, m.end) not in excluded]


class ConcatQuery(Query):
    """Concatenation via end==start join over all sub-match combinations
    (reference: OdinConcatQuery.scala:134-229)."""

    def __init__(self, clauses: List[Query]):
        self.clauses = clauses

    def matches(self, ctx):
        # partial chains: list of (subs, end)
        first = self.clauses[0].matches(ctx)
        chains = [([m], m.end) for m in first]
        for clause in self.clauses[1:]:
            if not chains:
                return []
            nxt = clause.matches(ctx)
            by_start: Dict[int, List[Match]] = {}
            for m in nxt:
                by_start.setdefault(m.start, []).append(m)
            new_chains = []
            for subs, end in chains:
                for m in by_start.get(end, ()):
                    new_chains.append((subs + [m], m.end))
            chains = new_chains
        out = [ConcatMatch(subs) for subs, _ in chains]
        out.sort(key=sort_key)
        return out


class RepetitionQuery(Query):
    """Stretch enumeration over the sorted sub-match array; chains must be
    contiguous in the array, exactly as the reference
    (OdinRepetitionQuery.scala getNextStretch, :139-162)."""

    def __init__(self, query: Query, mn: int, mx: int, is_greedy: bool):
        assert mn > 0 and mn <= mx
        self.query = query
        self.min = mn
        self.max = mx
        self.is_greedy = is_greedy

    def matches(self, ctx):
        ms = self.query.matches(ctx)
        out = []
        n = len(ms)
        start_index = 0
        num_reps = 0
        while start_index < n:
            if num_reps == 0:
                num_reps = 1
            elif start_index + num_reps < n and ms[start_index + num_reps - 1].end == ms[start_index + num_reps].start:
                num_reps += 1
            else:
                start_index += 1
                num_reps = 0
                continue
            if num_reps > self.max or start_index + num_reps > n:
                start_index += 1
                num_reps = 0
            elif num_reps >= self.min:
                out.append(RepetitionMatch(ms[start_index : start_index + num_reps], self.is_greedy))
        out.sort(key=sort_key)
        return out


class OptionalQuery(Query):
    """Sub-matches unioned with zero-width matches at every position, each
    wrapped in OptionalMatch (reference: OdinsonOptionalQuery.scala)."""

    def __init__(self, query: Query, is_greedy: bool):
        self.query = query
        self.is_greedy = is_greedy

    def matches(self, ctx):
        out = [OptionalMatch(m, self.is_greedy) for m in self.query.matches(ctx)]
        out.extend(
            OptionalMatch(NGramMatch(i, i), self.is_greedy) for i in range(ctx.sent.length + 1)
        )
        out.sort(key=sort_key)
        return out


class NamedCaptureQuery(Query):
    def __init__(self, query: Query, name: str, label: Optional[str]):
        self.query = query
        self.name = name
        self.label = label

    def matches(self, ctx):
        return [NamedMatch(m, self.name, self.label) for m in self.query.matches(ctx)]


class LookaheadQuery(Query):
    """Zero-width at each distinct sub-match start (reference: LookaheadQuery.scala)."""

    def __init__(self, query: Query):
        self.query = query

    def matches(self, ctx):
        starts = sorted({m.start for m in self.query.matches(ctx)})
        return [NGramMatch(s, s) for s in starts]


class LookbehindQuery(Query):
    """Zero-width at each distinct sub-match end (reference: LookbehindQuery.scala)."""

    def __init__(self, query: Query):
        self.query = query

    def matches(self, ctx):
        ends = sorted({m.end for m in self.query.matches(ctx)})
        return [NGramMatch(e, e) for e in ends]


class SpanContainingQuery(Query):
    """Keep big matches that contain at least one little match
    (reference: spans/OdinsonSpanContainingQuery.scala:80-136)."""

    def __init__(self, big: Query, little: Query):
        self.big = big
        self.little = little

    def matches(self, ctx):
        littles = [(m.start, m.end) for m in self.little.matches(ctx)]
        out = []
        for m in self.big.matches(ctx):
            if any(ls >= m.start and le <= m.end for ls, le in littles):
                out.append(m)
        return out


class ExpandQuery(Query):
    """Flatten graph-traversal matches: per src, union hull of src+dsts
    (reference: ExpandQuery.scala mkMatches, :125-145)."""

    def __init__(self, query: Query):
        self.query = query

    def matches(self, ctx):
        all_matches = self.query.matches(ctx)
        graph_matches = [m for m in all_matches if isinstance(m, GraphTraversalMatch)]
        other = [m for m in all_matches if not isinstance(m, GraphTraversalMatch)]
        if not graph_matches:
            return other
        groups: Dict[int, Tuple[Match, List[Match]]] = {}
        for m in graph_matches:
            key = id(m.src_match)
            if key not in groups:
                groups[key] = (m.src_match, [])
            groups[key][1].append(m)
        expanded = []
        for src, ms in groups.values():
            group = [src] + ms
            start = min(g.start for g in group)
            end = max(g.end for g in group)
            expanded.append(NGramMatch(start, end))
        out = expanded + other
        out.sort(key=sort_key)
        return out


class StateQueryNode(Query):
    """@Label: read previously-extracted mentions from the per-document state
    (reference: StateQuery.scala:58-141)."""

    def __init__(self, label: str):
        self.label = label

    def matches(self, ctx):
        if ctx.state is None:
            return []
        mentions = ctx.state.get_mentions(ctx.sent_idx, self.label)
        return [
            StateMatch(m.match.start, m.match.end, list(m.match.named_captures))
            for m in mentions
        ]


# ------------------------------------------------------------ full traversals

def _label_positions(sent, field: str, matcher) -> set:
    """Token positions having an edge in ``field`` whose label satisfies
    ``matcher`` (uses the derived incoming/outgoing positional postings)."""
    postings = sent.postings(field)
    if isinstance(matcher, trav.ExactLabelMatcher):
        return set(postings.get(matcher.string, ()))
    out: set = set()
    for label, positions in postings.items():
        if matcher.matches(label):
            out.update(positions)
    return out


def _start_tokens(traversal, sent):
    """Endpoint pre-filter (reference: QueryCompiler.scala:544-615 wraps
    traversal src/dst queries with incoming/outgoing term constraints).
    Returns the set of token positions that can possibly BEGIN this
    traversal, or None when the traversal places no constraint (zero-hop
    constructs). Pure pruning: a src match with no capable token can never
    yield a traversal result."""
    if isinstance(traversal, trav.Outgoing):
        return _label_positions(sent, "outgoing", traversal.matcher)
    if isinstance(traversal, trav.Incoming):
        return _label_positions(sent, "incoming", traversal.matcher)
    if isinstance(traversal, trav.OutgoingWildcard):
        return {i for i in range(sent.length) if sent.graph.outgoing[i]}
    if isinstance(traversal, trav.IncomingWildcard):
        return {i for i in range(sent.length) if sent.graph.incoming[i]}
    if isinstance(traversal, trav.FailTraversal):
        return set()
    if isinstance(traversal, trav.Concatenation):
        for t in traversal.traversals:
            s = _start_tokens(t, sent)
            if s is not None:
                return s
            if not isinstance(t, trav.NoTraversal):
                return None  # position may move (Optional/Kleene): stop
        return None
    if isinstance(traversal, trav.Union):
        subs = [_start_tokens(t, sent) for t in traversal.traversals]
        if not subs or any(s is None for s in subs):
            return None
        return set().union(*subs)
    return None  # NoTraversal / Optional / KleeneStar allow zero hops


class SingleStepFullTraversal:
    """(reference: SingleStepFullTraversalQuery.scala:76-161)"""

    def __init__(self, traversal: trav.GraphTraversal, surface: Query):
        self.traversal = traversal
        self.surface = surface

    def match_full_traversal(self, ctx, src_matches: List[Match]) -> List[Match]:
        # endpoint pre-filter: drop src matches whose tokens cannot start
        # this traversal BEFORE evaluating the dst surface query (the
        # reference's main traversal pruning; identical match set).
        # Memoized per sentence, keyed by the step OBJECT (a strong ref:
        # id()-keying returned stale sets when CPython reused a freed
        # query object's address — observed wrong results on a persistent
        # engine issuing several ad-hoc traversal queries).
        memo = ctx.sent._trav_starts
        if self in memo:
            starts = memo[self]
        else:
            starts = memo[self] = _start_tokens(self.traversal, ctx.sent)
        if starts is not None:
            src_matches = [
                m for m in src_matches
                if (m.start in starts if m.end == m.start + 1
                    else any(t in starts for t in range(m.start, m.end)))
            ]
            if not src_matches:
                return []
        graph = ctx.sent.graph
        surface = self.surface
        if type(surface) is AllNGramsQuery and surface.n == 1:
            # wildcard dst (`>edge []`, the common event-argument shape):
            # every landing token IS its own unigram match — skip building
            # the n dst matches and the token->match inverted index. The
            # shared per-token NGramMatch preserves the general path's
            # object identity (two srcs landing on one token share the dm).
            length = ctx.sent.length
            cache: Dict[int, NGramMatch] = {}
            out = []
            for src in src_matches:
                dst_tokens = self.traversal.traverse_from(graph, range(src.start, src.end))
                for t in dst_tokens:
                    if 0 <= t < length:
                        dm = cache.get(t)
                        if dm is None:
                            dm = cache[t] = NGramMatch(t, t + 1)
                        out.append(GraphTraversalMatch(src, dm))
            return out
        dst_matches = surface.matches(ctx)
        if not dst_matches:
            return []
        # inverted index: token -> matches containing it (sparse: only
        # tokens covered by some dst match get an entry)
        inv: Dict[int, List[Match]] = {}
        length = ctx.sent.length
        for m in dst_matches:
            for j in range(m.start, min(m.end, length)):
                lst = inv.get(j)
                if lst is None:
                    inv[j] = [m]
                else:
                    lst.append(m)
        out = []
        for src in src_matches:
            dst_tokens = self.traversal.traverse_from(graph, range(src.start, src.end))
            seen = dict()
            for t in dst_tokens:
                ms = inv.get(t)
                if ms is not None:
                    for dm in ms:
                        seen[id(dm)] = dm
            out.extend(GraphTraversalMatch(src, dm) for dm in seen.values())
        return out


class ConcatFullTraversal:
    """(reference: ConcatFullTraversalQuery.scala:85-122)"""

    def __init__(self, steps):
        self.steps = list(steps)

    def match_full_traversal(self, ctx, src_matches):
        current = src_matches
        for step in self.steps:
            current = step.match_full_traversal(ctx, current)
            if not current:
                return []
        return current


class RepetitionFullTraversal:
    """(reference: RepetitionFullTraversalQuery.scala:94-124)"""

    def __init__(self, mn: int, mx: int, step):
        self.min = mn
        self.max = mx
        self.step = step

    def match_full_traversal(self, ctx, src_matches):
        current = list(src_matches)
        i = 0
        while i < self.min and current:
            i += 1
            current = self.step.match_full_traversal(ctx, current)
        if not current:
            return []
        results = dict((id(m), m) for m in current)
        while i < self.max and current:
            i += 1
            current = self.step.match_full_traversal(ctx, current)
            for m in current:
                results.setdefault(id(m), m)
        return list(results.values())


class GraphTraversalQueryNode(Query):
    """src >edge dst (reference: GraphTraversalQuery.scala:107-168)."""

    def __init__(self, src: Query, full_traversal):
        self.src = src
        self.full_traversal = full_traversal

    def matches(self, ctx):
        src_matches = self.src.matches(ctx)
        if not src_matches:
            return []
        out = self.full_traversal.match_full_traversal(ctx, src_matches)
        out.sort(key=sort_key)
        return out


# ------------------------------------------------------------ events

class ArgSpec:
    """Compiled argument (reference ArgumentQuery/ArgumentSpans,
    OdinsonEventQuery.scala:17-92)."""

    __slots__ = ("name", "label", "min", "max", "promote", "full_traversal")

    def __init__(self, name, label, mn, mx, promote, full_traversal):
        self.name = name
        self.label = label
        self.min = mn
        self.max = mx
        self.promote = promote
        self.full_traversal = full_traversal


def _get_start_of_path(m: Match) -> Match:
    while isinstance(m, GraphTraversalMatch):
        m = m.src_match
    return m


class EventQueryNode(Query):
    """Trigger + required/optional argument traversals; emits EventSketch
    candidates (reference: OdinsonEventQuery.scala matchEvents, :289-345)."""

    def __init__(self, trigger: Query, required: List[ArgSpec], optional: List[ArgSpec]):
        self.trigger = trigger
        self.required = required
        self.optional = optional

    def _match_argument(self, ctx, src_matches, arg: ArgSpec):
        """trigger -> [(spec, match)] grouped by path origin."""
        if not src_matches:
            return {}
        ms = arg.full_traversal.match_full_traversal(ctx, src_matches)
        grouped: Dict[int, Tuple[Match, List[Tuple[ArgSpec, Match]]]] = {}
        for m in ms:
            origin = _get_start_of_path(m)
            key = id(origin)
            if key not in grouped:
                grouped[key] = (origin, [])
            grouped[key][1].append((arg, m))
        return grouped

    def matches(self, ctx):
        trigger_matches = self.trigger.matches(ctx)
        sketches: Dict[int, Tuple[Match, List[Tuple[ArgSpec, Match]]]] = {}
        if self.required:
            sketches = self._match_argument(ctx, trigger_matches, self.required[0])
            for arg in self.required[1:]:
                candidates = [t for t, _ in sketches.values()]
                arg_matches = self._match_argument(ctx, candidates, arg)
                new_sketches = {}
                for key, (t, ms) in arg_matches.items():
                    new_sketches[key] = (t, sketches[key][1] + ms)
                sketches = new_sketches
            if not sketches:
                return []
        if not sketches:
            for t in trigger_matches:
                sketches[id(t)] = (t, [])
        for arg in self.optional:
            candidates = [t for t, _ in sketches.values()]
            arg_matches = self._match_argument(ctx, candidates, arg)
            for key, (t, ms) in sketches.items():
                extra = arg_matches.get(key)
                if extra is not None:
                    sketches[key] = (t, ms + extra[1])
        out = [EventSketch(t, ms) for t, ms in sketches.values()]
        out.sort(key=sort_key)
        return out


# ===================================================================== compiler

class Compiler:
    """AST -> compiled Query tree (reference: QueryCompiler.scala)."""

    def __init__(
        self,
        all_token_fields=ALL_TOKEN_FIELDS,
        default_token_field=DEFAULT_TOKEN_FIELD,
        aggressive_normalization_to_default_field=True,
    ):
        self.all_token_fields = list(all_token_fields)
        self.default_token_field = default_token_field
        self.aggressive = aggressive_normalization_to_default_field
        self.parser = QueryParser(self.all_token_fields, self.default_token_field)

    # entry points (reference: QueryCompiler.scala:31-45)
    def compile(self, pattern: str) -> Query:
        tree = self.parser.parse_basic_query(pattern)
        q = self.mk_query(tree)
        return q if q is not None else FailQuery()

    def compile_event_query(self, pattern: str) -> Query:
        tree = self.parser.parse_event_query(pattern)
        q = self.mk_query(tree)
        return q if q is not None else FailQuery()

    # ------------------------------------------------------------ helpers

    def _norm_term(self, field: str, value: str) -> str:
        if self.aggressive and field == self.default_token_field:
            return normalize_unicode_aggressively(value)
        return normalize_unicode(value)

    # ------------------------------------------------------------ patterns

    def mk_query(self, node) -> Optional[Query]:
        if isinstance(node, ast.FilterPattern):
            q = self.mk_query(node.main)
            c = self.mk_query(node.filter)
            if q is None or c is None:
                return None
            return SpanContainingQuery(q, c)

        if isinstance(node, ast.AssertionPattern):
            return self._mk_assertion(node.assertion)

        if isinstance(node, ast.ConstraintPattern):
            return self.mk_constraint_query(node.constraint)

        if isinstance(node, ast.EventPattern):
            return self._mk_event(node)

        if isinstance(node, ast.DisjunctivePattern):
            clauses = _distinct_queries([self.mk_query(p) for p in node.patterns])
            if not clauses:
                return None
            if len(clauses) == 1:
                return clauses[0]
            return OrQuery(clauses)

        if isinstance(node, ast.ConcatenatedPattern):
            clauses = [q for q in (self.mk_query(p) for p in node.patterns) if q is not None]
            if not clauses:
                return None
            if len(clauses) == 1:
                return clauses[0]
            # merge consecutive wildcards / flatten nested concats
            # (reference: QueryCompiler.scala:159-197)
            new_clauses: List[Query] = []
            for c in reversed(clauses):
                if isinstance(c, AllNGramsQuery) and new_clauses and isinstance(new_clauses[0], AllNGramsQuery):
                    new_clauses[0] = AllNGramsQuery(c.n + new_clauses[0].n)
                elif isinstance(c, ConcatQuery):
                    inner = list(c.clauses)
                    if (
                        new_clauses
                        and isinstance(inner[-1], AllNGramsQuery)
                        and isinstance(new_clauses[0], AllNGramsQuery)
                    ):
                        merged = AllNGramsQuery(inner[-1].n + new_clauses[0].n)
                        new_clauses = inner[:-1] + [merged] + new_clauses[1:]
                    else:
                        new_clauses = inner + new_clauses
                else:
                    new_clauses.insert(0, c)
            if len(new_clauses) == 1:
                return new_clauses[0]
            return ConcatQuery(new_clauses)

        if isinstance(node, ast.NamedCapturePattern):
            q = self.mk_query(node.pattern)
            return None if q is None else NamedCaptureQuery(q, node.name, node.label)

        if isinstance(node, ast.MentionPattern):
            return StateQueryNode(node.label)

        if isinstance(node, ast.ExpandPattern):
            q = self.mk_query(node.pattern)
            return None if q is None else ExpandQuery(q)

        if isinstance(node, ast.GraphTraversalPattern):
            full = self.mk_full_traversal(node.full_traversal)
            if full is None:
                return None
            src = self.mk_query(node.src)
            if src is None:
                return None
            return GraphTraversalQueryNode(src, full)

        if isinstance(node, (ast.GreedyRepetitionPattern, ast.LazyRepetitionPattern)):
            return self._mk_repetition(node)

        raise ValueError(f"cannot compile {node!r}")

    def _mk_repetition(self, node) -> Optional[Query]:
        # reference: QueryCompiler.scala:238-343
        greedy = isinstance(node, ast.GreedyRepetitionPattern)
        mn, mx = node.min, node.max
        if (mn, mx) == (0, 0):
            return AllNGramsQuery(0)
        q = self.mk_query(node.pattern)
        if q is None:
            return None
        if isinstance(q, AllNGramsQuery) and q.n == 0:
            return q
        if (mn, mx) == (1, 1):
            return q
        if (mn, mx) == (0, 1):
            return OptionalQuery(q, greedy)
        if mn == 0 and mx is None:
            return OptionalQuery(RepetitionQuery(q, 1, INT_MAX, greedy), greedy)
        if mx is None:
            return RepetitionQuery(q, mn, INT_MAX, greedy)
        if mn == mx:
            if isinstance(q, AllNGramsQuery):
                return AllNGramsQuery(q.n * mn)
            return RepetitionQuery(q, mn, mx, greedy)
        # min < max, bounded
        if isinstance(q, AllNGramsQuery):
            rng = range(mx, mn - 1, -1) if greedy else range(mn, mx + 1)
            return OrQuery([AllNGramsQuery(i * q.n) for i in rng])
        if mn == 0:
            return OptionalQuery(RepetitionQuery(q, 1, mx, greedy), greedy)
        return RepetitionQuery(q, mn, mx, greedy)

    def _mk_assertion(self, assertion) -> Optional[Query]:
        if isinstance(assertion, ast.SentenceStartAssertion):
            return DocStartQuery()
        if isinstance(assertion, ast.SentenceEndAssertion):
            return DocEndQuery()
        if isinstance(assertion, ast.PositiveLookaheadAssertion):
            q = self.mk_query(assertion.pattern)
            return None if q is None else LookaheadQuery(q)
        if isinstance(assertion, ast.PositiveLookbehindAssertion):
            q = self.mk_query(assertion.pattern)
            return None if q is None else LookbehindQuery(q)
        if isinstance(assertion, ast.NegativeLookaheadAssertion):
            q = self.mk_query(assertion.pattern)
            return None if q is None else NotQuery(AllNGramsQuery(0), LookaheadQuery(q))
        if isinstance(assertion, ast.NegativeLookbehindAssertion):
            q = self.mk_query(assertion.pattern)
            return None if q is None else NotQuery(AllNGramsQuery(0), LookbehindQuery(q))
        raise ValueError(f"unknown assertion {assertion!r}")

    def _mk_event(self, node: ast.EventPattern) -> Optional[Query]:
        trigger = self.mk_query(node.trigger)
        if trigger is None:
            return None
        required = [a for a in node.arguments if a.min > 0]
        optional = [a for a in node.arguments if a.min == 0]
        req_specs = [self._mk_arg(a) for a in required]
        opt_specs = [self._mk_arg(a) for a in optional]
        if any(s is None for s in req_specs) or any(s is None for s in opt_specs):
            return None
        return EventQueryNode(trigger, req_specs, opt_specs)

    def _mk_arg(self, arg: ast.ArgumentPattern) -> Optional[ArgSpec]:
        full = self.mk_full_traversal(arg.full_traversal)
        if full is None:
            return None
        return ArgSpec(arg.name, arg.label, arg.min, arg.max, arg.promote, full)

    # ------------------------------------------------------------ traversals

    def mk_full_traversal(self, node):
        # reference: QueryCompiler.scala:347-380 (start/end-constraint
        # optimizations intentionally omitted: they are index pre-filters
        # with no effect on the emitted match set)
        if isinstance(node, ast.SingleStepFullTraversalPattern):
            surface = self.mk_query(node.surface)
            if surface is None:
                return None
            gt = self.mk_graph_traversal(node.traversal)
            return SingleStepFullTraversal(gt, surface)
        if isinstance(node, ast.RepeatFullTraversalPattern):
            inner = self.mk_full_traversal(node.full_traversal)
            if inner is None:
                return None
            return RepetitionFullTraversal(node.min, node.max, inner)
        if isinstance(node, ast.ConcatFullTraversalPattern):
            steps = [self.mk_full_traversal(c) for c in node.clauses]
            if any(s is None for s in steps):
                return None
            return ConcatFullTraversal(steps)
        raise ValueError(f"unknown full traversal {node!r}")

    def mk_graph_traversal(self, node) -> trav.GraphTraversal:
        # reference: QueryCompiler.scala:475-531 (with No/Fail folding)
        if isinstance(node, ast.NoTraversal):
            return trav.NoTraversal()
        if isinstance(node, ast.IncomingWildcard):
            return trav.IncomingWildcard()
        if isinstance(node, ast.OutgoingWildcard):
            return trav.OutgoingWildcard()
        if isinstance(node, ast.IncomingTraversal):
            return trav.Incoming(self._mk_label_matcher(node.matcher))
        if isinstance(node, ast.OutgoingTraversal):
            return trav.Outgoing(self._mk_label_matcher(node.matcher))
        if isinstance(node, ast.DisjunctiveTraversal):
            gts = _distinct_traversals([self.mk_graph_traversal(t) for t in node.traversals])
            has_no = any(isinstance(g, trav.NoTraversal) for g in gts)
            rest = [g for g in gts if not isinstance(g, (trav.NoTraversal, trav.FailTraversal))]
            if has_no:
                if not rest:
                    return trav.NoTraversal()
                if len(rest) == 1:
                    return trav.Optional(rest[0])
                return trav.Optional(trav.Union(rest))
            if not rest:
                return trav.FailTraversal()
            if len(rest) == 1:
                return rest[0]
            return trav.Union(rest)
        if isinstance(node, ast.ConcatenatedTraversal):
            gts = [
                g
                for g in (self.mk_graph_traversal(t) for t in node.traversals)
                if not isinstance(g, trav.NoTraversal)
            ]
            if not gts:
                return trav.NoTraversal()
            if any(isinstance(g, trav.FailTraversal) for g in gts):
                return trav.FailTraversal()
            if len(gts) == 1:
                return gts[0]
            return trav.Concatenation(gts)
        if isinstance(node, ast.OptionalTraversal):
            gt = self.mk_graph_traversal(node.traversal)
            if isinstance(gt, (trav.NoTraversal, trav.FailTraversal)):
                return trav.NoTraversal()
            return trav.Optional(gt)
        if isinstance(node, ast.KleeneStarTraversal):
            gt = self.mk_graph_traversal(node.traversal)
            if isinstance(gt, (trav.NoTraversal, trav.FailTraversal)):
                return trav.NoTraversal()
            return trav.KleeneStar(gt)
        raise ValueError(f"unknown traversal {node!r}")

    def _mk_label_matcher(self, m):
        if isinstance(m, ast.RegexMatcher):
            return trav.RegexLabelMatcher(m.pattern)
        return trav.ExactLabelMatcher(m.string)

    # ------------------------------------------------------------ constraints

    def mk_constraint_query(self, node) -> Query:
        # reference: QueryCompiler.scala:423-467
        if isinstance(node, ast.FieldConstraint):
            if isinstance(node.matcher, ast.StringMatcher):
                return TermQuery(node.name, self._norm_term(node.name, node.matcher.string))
            return RegexTermQuery(node.name, self._norm_term(node.name, node.matcher.pattern))
        if isinstance(node, ast.FuzzyConstraint):
            return FuzzyTermQuery(node.name, self._norm_term(node.name, node.matcher.string))
        if isinstance(node, ast.DisjunctiveConstraint):
            clauses = _distinct_queries([self.mk_constraint_query(c) for c in node.constraints])
            if len(clauses) == 1:
                return clauses[0]
            return OrQuery(clauses)
        if isinstance(node, ast.ConjunctiveConstraint):
            clauses = _distinct_queries([self.mk_constraint_query(c) for c in node.constraints])
            if len(clauses) == 1:
                return clauses[0]
            return TermAndQuery(clauses)
        if isinstance(node, ast.NegatedConstraint):
            inner = node.constraint
            if isinstance(inner, ast.NegatedConstraint):
                return self.mk_constraint_query(inner.constraint)
            if isinstance(inner, ast.Wildcard):
                return FailQuery()
            return NotQuery(AllNGramsQuery(1), self.mk_constraint_query(inner))
        if isinstance(node, ast.Wildcard):
            return AllNGramsQuery(1)
        raise ValueError(f"unknown constraint {node!r}")


def _query_signature(q: Query):
    """Structural signature used for compile-time clause dedup (the
    reference relies on case-class equality; QueryCompiler.scala:149,440)."""
    if isinstance(q, TermQuery):
        return ("term", q.field, q.term)
    if isinstance(q, RegexTermQuery):
        return ("regex", q.field, q.regex.pattern)
    if isinstance(q, FuzzyTermQuery):
        return ("fuzzy", q.field, q.term)
    if isinstance(q, AllNGramsQuery):
        return ("ngrams", q.n)
    if isinstance(q, OrQuery):
        return ("or",) + tuple(_query_signature(c) for c in q.clauses)
    if isinstance(q, TermAndQuery):
        return ("and",) + tuple(_query_signature(c) for c in q.clauses)
    if isinstance(q, NotQuery):
        return ("not", _query_signature(q.include), _query_signature(q.exclude))
    if isinstance(q, ConcatQuery):
        return ("concat",) + tuple(_query_signature(c) for c in q.clauses)
    if isinstance(q, RepetitionQuery):
        return ("rep", _query_signature(q.query), q.min, q.max, q.is_greedy)
    if isinstance(q, OptionalQuery):
        return ("opt", _query_signature(q.query), q.is_greedy)
    if isinstance(q, NamedCaptureQuery):
        return ("named", _query_signature(q.query), q.name, q.label)
    if isinstance(q, StateQueryNode):
        return ("state", q.label)
    return ("id", id(q))


def _distinct_queries(qs):
    out, seen = [], set()
    for q in qs:
        if q is None:
            continue
        sig = _query_signature(q)
        if sig not in seen:
            seen.add(sig)
            out.append(q)
    return out


def _traversal_signature(g):
    if isinstance(g, trav.NoTraversal):
        return ("no",)
    if isinstance(g, trav.FailTraversal):
        return ("fail",)
    if isinstance(g, trav.IncomingWildcard):
        return ("inw",)
    if isinstance(g, trav.OutgoingWildcard):
        return ("outw",)
    if isinstance(g, trav.Incoming):
        m = g.matcher
        return ("in", m.string if isinstance(m, trav.ExactLabelMatcher) else m.regex.pattern)
    if isinstance(g, trav.Outgoing):
        m = g.matcher
        return ("out", m.string if isinstance(m, trav.ExactLabelMatcher) else m.regex.pattern)
    if isinstance(g, trav.Concatenation):
        return ("cat",) + tuple(_traversal_signature(t) for t in g.traversals)
    if isinstance(g, trav.Union):
        return ("union",) + tuple(_traversal_signature(t) for t in g.traversals)
    if isinstance(g, trav.Optional):
        return ("optional", _traversal_signature(g.traversal))
    if isinstance(g, trav.KleeneStar):
        return ("star", _traversal_signature(g.traversal))
    return ("id", id(g))


def _distinct_traversals(gs):
    out, seen = [], set()
    for g in gs:
        sig = _traversal_signature(g)
        if sig not in seen:
            seen.add(sig)
            out.append(g)
    return out

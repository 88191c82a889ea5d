"""Per-sentence dependency-graph traversals.

Port of the reference's traversal set-automaton semantics
(reference: core/.../digraph/GraphTraversal.scala, digraph/LabelMatcher.scala).
The graph is a per-sentence adjacency structure built from
(src, dst, label) edges; labels are unicode-normalized on both sides.
Results of traverse_from are distinct, preserving first-seen order.
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple

from ..common.normalize import normalize_unicode
from ..lang.lucene_regex import compile_lucene


class DirectedGraph:
    """Adjacency-list digraph over token indices (CSR analogue of the
    reference's DirectedGraph, digraph/DirectedGraph.scala:21-62)."""

    __slots__ = ("outgoing", "incoming", "roots", "num_nodes")

    def __init__(self, edges: Sequence[Tuple[int, int, str]], roots: Sequence[int],
                 num_nodes: int, prenormalized: bool = False):
        self.num_nodes = num_nodes
        self.outgoing: List[List[Tuple[int, str]]] = [[] for _ in range(num_nodes)]
        self.incoming: List[List[Tuple[int, str]]] = [[] for _ in range(num_nodes)]
        self.roots = list(roots)
        for src, dst, label in edges:
            if not prenormalized:
                label = normalize_unicode(label)
            if 0 <= src < num_nodes and 0 <= dst < num_nodes:
                self.outgoing[src].append((dst, label))
                self.incoming[dst].append((src, label))


# ---------------------------------------------------------------- label matchers

class ExactLabelMatcher:
    __slots__ = ("string",)

    def __init__(self, string: str):
        self.string = normalize_unicode(string)

    def matches(self, label: str) -> bool:
        return label == self.string


class RegexLabelMatcher:
    """Edge-label regex; Lucene RegExp dialect like token regexes
    (translate-or-reject, lang/lucene_regex)."""

    __slots__ = ("regex",)

    def __init__(self, pattern: str):
        self.regex = compile_lucene(normalize_unicode(pattern))

    def matches(self, label: str) -> bool:
        return self.regex.fullmatch(label) is not None


# ---------------------------------------------------------------- traversals

def _distinct(xs):
    return list(dict.fromkeys(xs))


class GraphTraversal:
    def traverse(self, graph: DirectedGraph, node: int) -> List[int]:
        raise NotImplementedError

    def traverse_from(self, graph: DirectedGraph, nodes) -> List[int]:
        out = []
        for n in nodes:
            out.extend(self.traverse(graph, n))
        return _distinct(out)


class NoTraversal(GraphTraversal):
    def traverse(self, graph, node):
        return [node]

    def traverse_from(self, graph, nodes):
        return _distinct(nodes)


class FailTraversal(GraphTraversal):
    def traverse(self, graph, node):
        return []

    def traverse_from(self, graph, nodes):
        return []


class IncomingWildcard(GraphTraversal):
    def traverse(self, graph, node):
        if 0 <= node < graph.num_nodes:
            return [src for src, _ in graph.incoming[node]]
        return []


class OutgoingWildcard(GraphTraversal):
    def traverse(self, graph, node):
        if 0 <= node < graph.num_nodes:
            return [dst for dst, _ in graph.outgoing[node]]
        return []


class Incoming(GraphTraversal):
    def __init__(self, matcher):
        self.matcher = matcher

    def traverse(self, graph, node):
        if 0 <= node < graph.num_nodes:
            return [src for src, lbl in graph.incoming[node] if self.matcher.matches(lbl)]
        return []


class Outgoing(GraphTraversal):
    def __init__(self, matcher):
        self.matcher = matcher

    def traverse(self, graph, node):
        if 0 <= node < graph.num_nodes:
            return [dst for dst, lbl in graph.outgoing[node] if self.matcher.matches(lbl)]
        return []


class Concatenation(GraphTraversal):
    def __init__(self, traversals):
        self.traversals = list(traversals)

    def traverse(self, graph, node):
        current = [node]
        for t in self.traversals:
            if not current:
                return []
            current = t.traverse_from(graph, current)
        return current


class Union(GraphTraversal):
    def __init__(self, traversals):
        self.traversals = list(traversals)

    def traverse(self, graph, node):
        out = []
        for t in self.traversals:
            out.extend(t.traverse_from(graph, [node]))
        return out


class Optional(GraphTraversal):
    def __init__(self, traversal):
        self.traversal = traversal

    def traverse(self, graph, node):
        return [node] + self.traversal.traverse_from(graph, [node])


class KleeneStar(GraphTraversal):
    def __init__(self, traversal):
        self.traversal = traversal

    def traverse(self, graph, node):
        return self._collect(graph, [node])

    def traverse_from(self, graph, nodes):
        return self._collect(graph, list(nodes))

    def _collect(self, graph, remaining):
        # BFS with seen-set (reference: GraphTraversal.scala:183-189)
        seen = dict()  # insertion-ordered set
        while remaining:
            node = remaining.pop(0)
            if node in seen:
                continue
            seen[node] = None
            remaining = self.traversal.traverse_from(graph, [node]) + remaining
        return list(seen)

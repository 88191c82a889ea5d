"""Per-sentence in-memory inverted structures.

This is the Ray-side replacement for the reference's Lucene sentence doc:
per-field token arrays + per-field postings (term -> positions), plus the
dependency digraph (reference concepts: OdinsonIndexWriter.mkSentenceDoc,
NormalizedTokenStream for the synonym-merged ``norm`` field
(core/.../lucene/analysis/NormalizedTokenStream.scala:24-63), and the
BinaryDocValues dependency graph).

Built on the fly inside map_batches — there is no global index.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from ..common.normalize import (
    normalize_unicode,
    normalize_unicode_aggressively,
    sanitize_token,
)
from .traversal import DirectedGraph

# the default annotation layers (reference: reference.conf:44-72).
# incoming/outgoing are derived positional fields: the labels of a token's
# incident dependency edges indexed at that token's position
# (reference: OdinsonIndexWriter.scala:191-196, DependencyTokenStream.scala)
TOKEN_FIELDS = ("raw", "word", "lemma", "tag", "chunk", "entity")
NORM_FIELD = "norm"
DEFAULT_TOKEN_FIELD = NORM_FIELD
EDGE_FIELDS = ("incoming", "outgoing")
ALL_TOKEN_FIELDS = TOKEN_FIELDS + (NORM_FIELD,) + EDGE_FIELDS
MAX_TOKENS_PER_SENTENCE = 100  # reference.conf:112


class SentenceIndex:
    """Inverted positional structures for one sentence."""

    __slots__ = ("length", "fields", "graph", "_postings", "_trav_starts")

    def __init__(
        self,
        fields: Dict[str, Sequence[str]],
        graph_edges: Sequence[Tuple[int, int, str]] = (),
        graph_roots: Sequence[int] = (),
        presanitized: bool = False,
        prenormalized_labels: bool = False,
        take_ownership: bool = False,
    ):
        # `raw` is required (displayField); other layers optional
        self.length = len(fields.get("raw") or next(iter(fields.values())))
        if take_ownership:
            # caller guarantees fresh, sanitized lists: no defensive copy
            self.fields = fields
        elif presanitized:
            # trusted annotator output: skip the per-token sanitize copy
            self.fields = {k: list(v) for k, v in fields.items() if v is not None}
        else:
            self.fields = {
                k: [sanitize_token(t) for t in v] for k, v in fields.items() if v is not None
            }
        self.graph = DirectedGraph(
            graph_edges, graph_roots, self.length, prenormalized=prenormalized_labels
        )
        self._postings: Dict[str, Dict[str, List[int]]] = {}
        # per-sentence memo for traversal endpoint pre-filter sets, keyed
        # by the compiled step OBJECT. Weak keys: on a persistent engine
        # each ad-hoc query()'s step objects would otherwise be pinned by
        # every sentence's memo forever — O(queries x sentences) growth
        # (ADVICE r02). Entries die with the query's compiled objects.
        import weakref

        self._trav_starts = weakref.WeakKeyDictionary()

    # ------------------------------------------------------------ postings

    def postings(self, field: str) -> Dict[str, List[int]]:
        """term -> sorted positions for a token field. The ``norm`` field is
        the synonym merge of aggressively-normalized raw+word at the same
        positions (NormalizedTokenStream.scala:24-34)."""
        p = self._postings.get(field)
        if p is not None:
            return p
        p = {}
        if field in EDGE_FIELDS:
            adj = self.graph.incoming if field == "incoming" else self.graph.outgoing
            for i in range(self.length):
                edges_i = adj[i]
                if not edges_i:
                    continue
                if len(edges_i) == 1:
                    label = edges_i[0][1]
                    lst = p.get(label)
                    if lst is None:
                        p[label] = [i]
                    else:
                        lst.append(i)
                    continue
                seen = set()
                for _, label in edges_i:
                    if label not in seen:
                        seen.add(label)
                        lst = p.get(label)
                        if lst is None:
                            p[label] = [i]
                        else:
                            lst.append(i)
        elif field == NORM_FIELD:
            raw = self.fields.get("raw", [])
            word = self.fields.get("word", raw)
            for i in range(self.length):
                forms = {normalize_unicode_aggressively(raw[i] if i < len(raw) else "")}
                if i < len(word):
                    forms.add(normalize_unicode_aggressively(word[i]))
                for f in forms:
                    p.setdefault(f, []).append(i)
        else:
            toks = self.fields.get(field)
            if toks is not None:
                get = p.get
                for i, t in enumerate(toks):
                    # NFKC is the identity on ASCII: skip the call
                    key = t if t.isascii() else normalize_unicode(t)
                    lst = get(key)
                    if lst is None:
                        p[key] = [i]
                    else:
                        lst.append(i)
        self._postings[field] = p
        return p

    def positions_for_term(self, field: str, term: str) -> List[int]:
        return self.postings(field).get(term, [])

    def terms(self, field: str):
        return self.postings(field).keys()

    def tokens(self, field: str = "raw") -> List[str]:
        return self.fields.get(field, [])


class AnnotatedDocument:
    """A document = id + sentences (+ metadata), the unit processed by the
    per-document cascade (reference: OdinsonDocument.scala:13-17)."""

    __slots__ = ("doc_id", "sentences", "metadata")

    def __init__(self, doc_id: str, sentences: List[SentenceIndex], metadata: Optional[dict] = None):
        self.doc_id = doc_id
        self.sentences = sentences
        self.metadata = metadata or {}

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

import weakref
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

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


_EMPTY_POSITIONS: List[int] = []


class BatchVocab:
    """Batch-shared term dictionary + lazy batch-level inverted index (the
    per-batch analogue of the reference's term-dictionary reuse in
    OdinsonIndexWriter.scala:174-184 and its Lucene postings, VERDICT r02
    item 1).

    Construction interns every distinct surface/derived token of a batch
    once and keeps each token field as ONE flat id array over all
    sentences (plus sentence offsets). The first time a query asks for a
    (field, term) — or a (field, predicate) for regex/fuzzy — the
    positions are computed for ALL sentences in a single vectorized pass
    over the flat array and split per sentence; every subsequent
    per-sentence lookup is an O(1) list index. Normalization (NFKC for
    plain fields, aggressive casefold for the ``norm`` raw+word synonym
    field) is applied once per unique term, never per position."""

    __slots__ = (
        "terms", "fields", "offsets", "num_sents",
        "_nfkc_map", "_nfkc_tid", "_nfkc_terms",
        "_agg_map", "_agg_tid", "_agg_terms",
        "_mapped", "_postings",
    )

    def __init__(self, terms: np.ndarray, fields: Dict[str, np.ndarray], offsets: np.ndarray):
        # terms: sorted unique term strings (np object array); id = index.
        # fields: field -> flat int32 term-id array over all sentences.
        # offsets: int64[num_sents+1] sentence boundaries in the flat arrays.
        self.terms = terms
        self.fields = fields
        self.offsets = offsets
        self.num_sents = len(offsets) - 1
        self._nfkc_map: Optional[np.ndarray] = None
        self._nfkc_tid: Optional[Dict[str, int]] = None
        self._nfkc_terms: Optional[np.ndarray] = None
        self._agg_map: Optional[np.ndarray] = None
        self._agg_tid: Optional[Dict[str, int]] = None
        self._agg_terms: Optional[np.ndarray] = None
        self._mapped: Dict = {}    # field -> normalized-id flat array
        self._postings: Dict = {}  # (field, term/predkey) -> per-sentence positions

    # ------------------------------------------------- normalized views

    def _ensure_nfkc(self):
        if self._nfkc_map is None:
            forms = np.array(
                [t if t.isascii() else normalize_unicode(t) for t in self.terms],
                dtype=object,
            )
            uniq, inv = np.unique(forms, return_inverse=True)
            self._nfkc_map = inv.astype(np.int32)
            self._nfkc_terms = uniq
            self._nfkc_tid = {t: i for i, t in enumerate(uniq)}

    def _ensure_agg(self):
        if self._agg_map is None:
            forms = np.array(
                [normalize_unicode_aggressively(t) for t in self.terms], dtype=object
            )
            uniq, inv = np.unique(forms, return_inverse=True)
            self._agg_map = inv.astype(np.int32)
            self._agg_terms = uniq
            self._agg_tid = {t: i for i, t in enumerate(uniq)}

    def _mapped_flat(self, kind: str, field: str) -> np.ndarray:
        """Flat normalized-id array for a field (one gather per batch)."""
        key = (kind, field)
        m = self._mapped.get(key)
        if m is None:
            base = self.fields[field]
            m = (self._nfkc_map if kind == "nfkc" else self._agg_map)[base]
            self._mapped[key] = m
        return m

    # ------------------------------------------------- batch-level postings

    def _split(self, hits: np.ndarray) -> List[Optional[List[int]]]:
        """Flat hit positions -> per-sentence local position lists."""
        res: List[Optional[List[int]]] = [None] * self.num_sents
        if hits.size:
            sent_of = np.searchsorted(self.offsets, hits, side="right") - 1
            local = (hits - self.offsets[sent_of]).tolist()
            for s, p in zip(sent_of.tolist(), local):
                lst = res[s]
                if lst is None:
                    res[s] = [p]
                else:
                    lst.append(p)
        return res

    _NO_HITS: List[Optional[List[int]]] = []

    def term_positions(self, field: str, term: str, slot: int) -> List[int]:
        key = (field, term)
        res = self._postings.get(key)
        if res is None:
            if field == NORM_FIELD:
                self._ensure_agg()
                t = self._agg_tid.get(term)
                if t is None:
                    res = self._NO_HITS
                else:
                    hit = self._mapped_flat("agg", "raw") == t
                    if "word" in self.fields and self.fields["word"] is not self.fields["raw"]:
                        hit |= self._mapped_flat("agg", "word") == t
                    res = self._split(np.flatnonzero(hit))
            else:
                self._ensure_nfkc()
                t = self._nfkc_tid.get(term)
                if t is None:
                    res = self._NO_HITS
                else:
                    res = self._split(
                        np.flatnonzero(self._mapped_flat("nfkc", field) == t)
                    )
            self._postings[key] = res
        if res is self._NO_HITS:
            return _EMPTY_POSITIONS
        r = res[slot]
        return r if r is not None else _EMPTY_POSITIONS

    def pred_positions(self, field: str, key, pred: Callable[[str], bool], slot: int) -> List[int]:
        """Predicate (regex/fuzzy) postings: predicate evaluated once per
        batch over the unique normalized terms, memoized by ``key``."""
        mkey = (field, key)
        res = self._postings.get(mkey)
        if res is None:
            if field == NORM_FIELD:
                self._ensure_agg()
                mask = np.fromiter(
                    (pred(t) for t in self._agg_terms), dtype=bool,
                    count=len(self._agg_terms),
                )
                hit = mask[self._mapped_flat("agg", "raw")]
                if "word" in self.fields and self.fields["word"] is not self.fields["raw"]:
                    hit |= mask[self._mapped_flat("agg", "word")]
            else:
                self._ensure_nfkc()
                mask = np.fromiter(
                    (pred(t) for t in self._nfkc_terms), dtype=bool,
                    count=len(self._nfkc_terms),
                )
                hit = mask[self._mapped_flat("nfkc", field)]
            res = self._split(np.flatnonzero(hit))
            self._postings[mkey] = res
        r = res[slot]
        return r if r is not None else _EMPTY_POSITIONS


class SharedGraphContext:
    """Graph-derived per-sentence state shared across sentences whose
    dependency graph is IDENTICAL (the deterministic annotator's graph is a
    pure function of sentence length): the DirectedGraph itself, its derived
    incoming/outgoing label postings, and the traversal endpoint-prefilter
    memo. Sharing is only valid when the provider guarantees graph equality."""

    __slots__ = ("graph", "edge_postings", "trav_starts")

    def __init__(self, graph: DirectedGraph):
        self.graph = graph
        self.edge_postings: Dict[str, Dict[str, List[int]]] = {}
        self.trav_starts = weakref.WeakKeyDictionary()


class SentenceIndex:
    """Inverted positional structures for one sentence."""

    __slots__ = ("length", "fields", "graph", "_postings", "_trav_starts",
                 "vocab", "slot", "_shared", "field_loader", "lazy_layers")

    def __init__(
        self,
        fields: Dict[str, Sequence[str]],
        graph_edges: Sequence[Tuple[int, int, str]] = (),
        graph_roots: Sequence[int] = (),
        presanitized: bool = False,
        prenormalized_labels: bool = False,
        take_ownership: bool = False,
        shared: Optional[SharedGraphContext] = None,
        vocab: Optional[BatchVocab] = None,
        slot: int = -1,
        field_loader: Optional[Callable[[int, str], Optional[List[str]]]] = None,
        lazy_layers: Tuple[str, ...] = (),
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
        self._shared = shared
        if shared is not None:
            self.graph = shared.graph
            self._trav_starts = shared.trav_starts
        else:
            self.graph = DirectedGraph(
                graph_edges, graph_roots, self.length, prenormalized=prenormalized_labels
            )
            # per-sentence memo for traversal endpoint pre-filter sets, keyed
            # by the compiled step OBJECT. Weak keys: on a persistent engine
            # each ad-hoc query()'s step objects would otherwise be pinned by
            # every sentence's memo forever — O(queries x sentences) growth
            # (ADVICE r02). Entries die with the query's compiled objects.
            self._trav_starts = weakref.WeakKeyDictionary()
        self._postings: Dict[str, Dict[str, List[int]]] = {}
        # optional batch-vocab backing: term/predicate lookups resolve
        # against the batch-level lazy inverted index at this slot
        self.vocab = vocab
        self.slot = slot
        # derived token layers materialized only when actually read
        # (verbosity="all" output, non-vocab postings fallback)
        self.field_loader = field_loader
        self.lazy_layers = lazy_layers

    # ------------------------------------------------------------ postings

    def postings(self, field: str) -> Dict[str, List[int]]:
        """term -> sorted positions for a token field. The ``norm`` field is
        the synonym merge of aggressively-normalized raw+word at the same
        positions (NormalizedTokenStream.scala:24-34)."""
        p = self._postings.get(field)
        if p is not None:
            return p
        if field in EDGE_FIELDS and self._shared is not None:
            p = self._shared.edge_postings.get(field)
            if p is not None:
                self._postings[field] = p
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
            raw = self._field("raw") or []
            word = self._field("word")
            if word is None:
                word = raw
            for i in range(self.length):
                forms = {normalize_unicode_aggressively(raw[i] if i < len(raw) else "")}
                if i < len(word):
                    forms.add(normalize_unicode_aggressively(word[i]))
                for f in forms:
                    p.setdefault(f, []).append(i)
        else:
            toks = self._field(field)
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
        if field in EDGE_FIELDS and self._shared is not None:
            self._shared.edge_postings[field] = p
        return p

    def positions_for_term(self, field: str, term: str) -> List[int]:
        v = self.vocab
        if v is not None and (field in v.fields or field == NORM_FIELD):
            return v.term_positions(field, term, self.slot)
        return self.postings(field).get(term, [])

    def positions_matching(self, field: str, key, pred) -> List[int]:
        """Sorted positions whose term (NFKC-normalized; agg-normalized
        synonym pair for ``norm``) satisfies ``pred``. On a vocab-backed
        sentence the predicate runs once per batch over unique terms
        (memoized by ``key`` — pass the compiled query object); otherwise
        it scans this sentence's postings dict."""
        v = self.vocab
        if v is not None and (field in v.fields or field == NORM_FIELD):
            return v.pred_positions(field, key, pred, self.slot)
        positions: List[int] = []
        for term, pos in self.postings(field).items():
            if pred(term):
                positions.extend(pos)
        positions.sort()
        return positions

    def terms(self, field: str):
        return self.postings(field).keys()

    def _field(self, field: str) -> Optional[List[str]]:
        v = self.fields.get(field)
        if v is None and self.field_loader is not None and field in self.lazy_layers:
            v = self.field_loader(self.slot, field)
            if v is not None:
                self.fields[field] = v
        return v

    def all_fields(self) -> Dict[str, List[str]]:
        """fields dict with every lazy layer materialized (for
        verbosity='all' output paths that iterate all stored layers)."""
        for name in self.lazy_layers:
            self._field(name)
        return self.fields

    def tokens(self, field: str = "raw") -> List[str]:
        return self._field(field) or []


class AnnotatedDocument:
    """A document = id + sentences (+ metadata), the unit processed by the
    per-document cascade (reference: OdinsonDocument.scala:13-17)."""

    __slots__ = ("doc_id", "sentences", "metadata")

    def __init__(self, doc_id: str, sentences: List[SentenceIndex], metadata: Optional[dict] = None):
        self.doc_id = doc_id
        self.sentences = sentences
        self.metadata = metadata or {}

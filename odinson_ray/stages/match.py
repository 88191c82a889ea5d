"""GrammarMatcher: the grammar cascade as a Ray Data actor-pool stage.

The whole compiled grammar is ONE dataset operator:

    mentions = docs.map_batches(
        GrammarMatcher.with_rules(yaml_str),
        batch_format="pyarrow", concurrency=N, batch_size=B)

The grammar is compiled once per actor in ``__init__`` (the reference
compiles once per engine: RuleReader.compileRuleStream); per batch the
actor builds per-document inverted structures and runs the per-document
cascade (priorities + state confined to the document, SURVEY §3.1 — no
distributed state, no shuffle).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import pyarrow as pa

from ..core.engine import DocumentEngine
from ..core.sentence import AnnotatedDocument, SentenceIndex
from ..lang.rules import RuleReader
from ..sources.odinson_json import fields_to_metadata
from .annotate import annotate_sentence

ARG_TYPE = pa.struct(
    [
        ("name", pa.string()),
        ("label", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("text", pa.string()),
    ]
)

MENTIONS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("sent_id", pa.int32()),
        ("label", pa.string()),
        ("found_by", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("text", pa.string()),
        ("args", pa.list_(ARG_TYPE)),
    ]
)


def sentence_index_from_struct(s: Dict) -> SentenceIndex:
    graph = s.get("graph") or {}
    edges = [(e["src"], e["dst"], e["label"]) for e in (graph.get("edges") or [])]
    roots = graph.get("roots") or []
    fields = {
        k: s[k]
        for k in ("raw", "word", "lemma", "tag", "chunk", "entity")
        if s.get(k) is not None
    }
    return SentenceIndex(fields, edges, roots)


class GrammarMatcher:
    """Callable class for map_batches: compile grammar once per actor.

    Accepts batches either with a pre-annotated ``sentences`` column or with
    only the ``spans`` column — in the latter case annotation runs inline
    (per actor, in plain Python), avoiding the Arrow round-trip of the
    nested annotation column through the object store. Inline is the fast
    path for deterministic annotation; pre-annotated is for corpora whose
    annotations were computed by a separate (e.g. model-based) stage."""

    def __init__(self, rules_yaml: str, variables: Optional[Dict[str, str]] = None,
                 use_state: bool = True, allow_trigger_overlaps: bool = False):
        self.extractors = RuleReader().compile_rule_string(rules_yaml, variables)
        self.use_state = use_state
        self.allow_trigger_overlaps = allow_trigger_overlaps

    def _sentences_from_spans(self, spans) -> List[SentenceIndex]:
        # NOTE: annotate_sentence must be imported at module level — a lazy
        # import here would execute inside Ray workers, where the package
        # is only available by-value (no importable module)
        out = []
        for sp in spans:
            if sp["kind"] == "text":
                s = annotate_sentence(sp["text"])
                graph = s["graph"]
                edges = [(e["src"], e["dst"], e["label"]) for e in graph["edges"]]
                fields = {k: s[k] for k in ("raw", "word", "lemma", "tag", "chunk", "entity")}
                out.append(SentenceIndex(fields, edges, graph["roots"],
                                         presanitized=True, prenormalized_labels=True))
        return out

    METADATA_COLUMNS = ("lang", "source", "pub_date", "citations", "metadata",
                        "metadata_json")

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        if "sentences" in batch.column_names:
            sentences_col = batch["sentences"].to_pylist()
        else:
            sentences_col = [None] * len(doc_ids)
            spans_col = batch["spans"].to_pylist()
        # per-document metadata: scalar columns plus an optional struct column
        md_cols = {}
        for c in self.METADATA_COLUMNS:
            if c in batch.column_names:
                md_cols[c] = batch[c].to_pylist()
        out = {k: [] for k in ("doc_id", "sent_id", "label", "found_by", "start", "end", "text")}
        out_args: List[List[Dict]] = []
        for row_idx, (doc_id, sents) in enumerate(zip(doc_ids, sentences_col)):
            if sents is None:
                sent_indexes = self._sentences_from_spans(spans_col[row_idx])
            else:
                sent_indexes = [sentence_index_from_struct(s) for s in sents]
            metadata = {}
            for c, vals in md_cols.items():
                v = vals[row_idx]
                if c == "metadata" and isinstance(v, dict):
                    metadata.update(v)
                elif c == "metadata_json":
                    # Odinson Document-JSON metadata Field array (incl.
                    # NestedField), parsed into the metadata-query dict
                    if v:
                        import json as _json

                        metadata.update(fields_to_metadata(_json.loads(v)))
                else:
                    metadata[c] = v
            doc = AnnotatedDocument(doc_id, sent_indexes, metadata)
            engine = DocumentEngine(doc)
            if self.use_state:
                mentions = engine.extract_mentions(
                    self.extractors, allow_trigger_overlaps=self.allow_trigger_overlaps
                )
            else:
                mentions = engine.extract_no_state(
                    self.extractors, allow_trigger_overlaps=self.allow_trigger_overlaps
                )
            for m in mentions:
                toks = sent_indexes[m.sent_idx].tokens()
                out["doc_id"].append(doc_id)
                out["sent_id"].append(m.sent_idx)
                out["label"].append(m.label)
                out["found_by"].append(m.found_by)
                out["start"].append(m.start)
                out["end"].append(m.end)
                out["text"].append(" ".join(toks[m.start : m.end]))
                args = []
                for cap in m.match.named_captures:
                    args.append(
                        {
                            "name": cap.name,
                            "label": cap.label,
                            "start": cap.captured.start,
                            "end": cap.captured.end,
                            "text": " ".join(toks[cap.captured.start : cap.captured.end]),
                        }
                    )
                out_args.append(args)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "sent_id": pa.array(out["sent_id"], pa.int32()),
                "label": pa.array(out["label"], pa.string()),
                "found_by": pa.array(out["found_by"], pa.string()),
                "start": pa.array(out["start"], pa.int32()),
                "end": pa.array(out["end"], pa.int32()),
                "text": pa.array(out["text"], pa.string()),
                "args": pa.array(out_args, pa.list_(ARG_TYPE)),
            }
        )


def match_stage(docs_ds, rules_yaml: str, variables=None, concurrency: int = 4,
                batch_size: int = 256):
    """docs (with sentences column) -> mentions Dataset via an actor pool."""
    import ray.data  # noqa: F401  (ensures ray.data is importable lazily)

    return docs_ds.map_batches(
        GrammarMatcher,
        fn_constructor_args=(rules_yaml, variables),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        num_cpus=1,
    )

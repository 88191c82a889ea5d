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
from .annotate import annotate_sentence, annotate_tokens_fast

ARG_TYPE = pa.struct(
    [
        ("name", pa.string()),
        ("label", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("text", pa.string()),
    ]
)

FIELDS_TYPE = pa.struct([("name", pa.string()), ("tokens", pa.list_(pa.string()))])

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


def clamp_pool(requested: int) -> int:
    """Never let an actor pool reserve every cluster CPU: with per-operator
    resource reservation disabled (__ray_entry__), a pool sized == total
    CPUs starves the stateless read/consume stages and deadlocks the
    streaming executor (observed with jobs/run_pipeline.py at
    --num-cpus 4 --concurrency 4). Always leave >= 1 CPU of headroom."""
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
            if cpus:
                return max(1, min(requested, cpus - 1))
    except Exception:
        pass
    return max(1, requested)


class GrammarMatcher:
    """Callable class for map_batches: compile grammar once per actor.

    Accepts batches either with a pre-annotated ``sentences`` column or with
    only the ``spans`` column — in the latter case annotation runs inline
    (per actor, in plain Python), avoiding the Arrow round-trip of the
    nested annotation column through the object store. Inline is the fast
    path for deterministic annotation; pre-annotated is for corpora whose
    annotations were computed by a separate (e.g. model-based) stage."""

    #: verbosity tiers (reference: DataGatherer.scala:53-110 VerboseLevels)
    #: minimal -> no mention text at all (cheapest at scale),
    #: display -> mention/arg text from the display field (default),
    #: all -> adds a mention_fields column with every stored token layer
    VERBOSITY = ("minimal", "display", "all")

    def __init__(self, rules_yaml: str, variables: Optional[Dict[str, str]] = None,
                 use_state: bool = True, allow_trigger_overlaps: bool = False,
                 verbosity: str = "display"):
        assert verbosity in self.VERBOSITY, verbosity
        self.extractors = RuleReader().compile_rule_string(rules_yaml, variables)
        self.use_state = use_state
        self.allow_trigger_overlaps = allow_trigger_overlaps
        self.verbosity = verbosity

    def _sentences_from_texts(self, texts: List[str]) -> List[SentenceIndex]:
        # NOTE: annotate_tokens_fast must be imported at module level — a
        # lazy import here would execute inside Ray workers, where the
        # package is only available by-value (no importable module)
        out = []
        for text in texts:
            toks = text.split(" ") if text else []
            fields, edges, roots = annotate_tokens_fast(toks)
            out.append(SentenceIndex(fields, edges, roots,
                                     presanitized=True, prenormalized_labels=True,
                                     take_ownership=True))
        return out

    METADATA_COLUMNS = ("lang", "source", "pub_date", "citations", "metadata",
                        "metadata_json")

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        doc_ids = batch["doc_id"].to_pylist()
        if "sentences" in batch.column_names:
            sentences_col = batch["sentences"].to_pylist()
            spans_texts = None
        else:
            # Arrow-native span unpack (no nested to_pylist dict round-trip):
            # flatten the list<struct> column and read only kind/text as flat
            # arrays; regroup text spans per row via list_parent_indices
            sentences_col = [None] * len(doc_ids)
            flat = pc.list_flatten(batch["spans"]).combine_chunks()
            parents = pc.list_parent_indices(batch["spans"]).to_numpy(
                zero_copy_only=False
            )
            kinds = flat.field("kind").to_pylist()
            texts = flat.field("text").to_pylist()
            spans_texts: List[List[str]] = [[] for _ in range(len(doc_ids))]
            for p, k, tx in zip(parents, kinds, texts):
                if k == "text":
                    spans_texts[p].append(tx)
        # per-document metadata: scalar columns plus an optional struct column
        md_cols = {}
        for c in self.METADATA_COLUMNS:
            if c in batch.column_names:
                md_cols[c] = batch[c].to_pylist()
        out = {k: [] for k in ("doc_id", "sent_id", "label", "found_by", "start", "end", "text")}
        out_args: List[List[Dict]] = []
        out_fields: List[List[Dict]] = []
        for row_idx, (doc_id, sents) in enumerate(zip(doc_ids, sentences_col)):
            if sents is None:
                sent_indexes = self._sentences_from_texts(spans_texts[row_idx])
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
            minimal = self.verbosity == "minimal"
            for m in mentions:
                sent = sent_indexes[m.sent_idx]
                toks = sent.tokens()
                out["doc_id"].append(doc_id)
                out["sent_id"].append(m.sent_idx)
                out["label"].append(m.label)
                out["found_by"].append(m.found_by)
                out["start"].append(m.start)
                out["end"].append(m.end)
                out["text"].append(None if minimal else " ".join(toks[m.start : m.end]))
                args = []
                for cap in m.match.named_captures:
                    args.append(
                        {
                            "name": cap.name,
                            "label": cap.label,
                            "start": cap.captured.start,
                            "end": cap.captured.end,
                            "text": None if minimal else
                                " ".join(toks[cap.captured.start : cap.captured.end]),
                        }
                    )
                out_args.append(args)
                if self.verbosity == "all":
                    out_fields.append(
                        [{"name": name, "tokens": list(sent.fields[name][m.start : m.end])}
                         for name in sorted(sent.fields)]
                    )
        table = pa.Table.from_pydict(
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
        if self.verbosity == "all":
            table = table.append_column(
                "mention_fields", pa.array(out_fields, pa.list_(FIELDS_TYPE))
            )
        return table


def match_stage(docs_ds, rules_yaml: str, variables=None, concurrency: int = 4,
                batch_size: int = 256):
    """docs (with sentences column) -> mentions Dataset via an actor pool."""
    import ray.data  # noqa: F401  (ensures ray.data is importable lazily)

    return docs_ds.map_batches(
        GrammarMatcher,
        fn_constructor_args=(rules_yaml, variables),
        batch_format="pyarrow",
        concurrency=clamp_pool(concurrency),
        batch_size=batch_size,
        num_cpus=1,
    )

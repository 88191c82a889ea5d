"""Match-type-tagged JSON serialization of mentions (both directions).

Analogue of the reference's JsonSerializer (serialization/JsonSerializer.scala:
match-type-tagged objects, :64-100): every match node carries a ``type`` tag
so the derivation tree round-trips. The dataset-level sink writes JSON lines
via ``Dataset.write_json``.
"""

from __future__ import annotations

import json
from typing import Dict, Optional

from .engine import Mention
from .matches import (
    ArgumentMetadata,
    ConcatMatch,
    EventMatch,
    GraphTraversalMatch,
    Match,
    NamedCapture,
    NamedMatch,
    NGramMatch,
    OptionalMatch,
    OrMatch,
    RepetitionMatch,
    StateMatch,
)


def match_to_json(m: Match) -> Dict:
    if isinstance(m, StateMatch):
        return {
            "type": "StateMatch",
            "start": m.start,
            "end": m.end,
            "namedCaptures": [capture_to_json(c) for c in m.named_captures],
        }
    if isinstance(m, NGramMatch):
        return {"type": "NGramMatch", "start": m.start, "end": m.end}
    if isinstance(m, EventMatch):
        return {
            "type": "EventMatch",
            "trigger": match_to_json(m.trigger),
            "namedCaptures": [capture_to_json(c) for c in m.named_captures],
            "argMetadata": [
                {"name": a.name, "min": a.min, "max": a.max, "promote": a.promote}
                for a in m.argument_metadata
            ],
        }
    if isinstance(m, GraphTraversalMatch):
        return {
            "type": "GraphTraversalMatch",
            "srcMatch": match_to_json(m.src_match),
            "dstMatch": match_to_json(m.dst_match),
        }
    if isinstance(m, ConcatMatch):
        return {"type": "ConcatMatch", "subMatches": [match_to_json(s) for s in m.sub_matches]}
    if isinstance(m, RepetitionMatch):
        return {
            "type": "RepetitionMatch",
            "subMatches": [match_to_json(s) for s in m.sub_matches],
            "isGreedy": m.is_greedy,
        }
    if isinstance(m, OptionalMatch):
        return {
            "type": "OptionalMatch",
            "subMatch": match_to_json(m.sub_match),
            "isGreedy": m.is_greedy,
        }
    if isinstance(m, OrMatch):
        return {"type": "OrMatch", "subMatch": match_to_json(m.sub_match), "clauseID": m.clause_id}
    if isinstance(m, NamedMatch):
        return {
            "type": "NamedMatch",
            "subMatch": match_to_json(m.sub_match),
            "name": m.name,
            "label": m.label,
        }
    raise ValueError(f"cannot serialize {type(m).__name__}")


def capture_to_json(c: NamedCapture) -> Dict:
    return {"name": c.name, "label": c.label, "capturedMatch": match_to_json(c.captured)}


def match_from_json(d: Dict) -> Match:
    t = d["type"]
    if t == "StateMatch":
        return StateMatch(d["start"], d["end"], [capture_from_json(c) for c in d["namedCaptures"]])
    if t == "NGramMatch":
        return NGramMatch(d["start"], d["end"])
    if t == "EventMatch":
        return EventMatch(
            match_from_json(d["trigger"]),
            [capture_from_json(c) for c in d["namedCaptures"]],
            [ArgumentMetadata(a["name"], a["min"], a["max"], a["promote"]) for a in d["argMetadata"]],
        )
    if t == "GraphTraversalMatch":
        return GraphTraversalMatch(match_from_json(d["srcMatch"]), match_from_json(d["dstMatch"]))
    if t == "ConcatMatch":
        return ConcatMatch([match_from_json(s) for s in d["subMatches"]])
    if t == "RepetitionMatch":
        return RepetitionMatch([match_from_json(s) for s in d["subMatches"]], d["isGreedy"])
    if t == "OptionalMatch":
        return OptionalMatch(match_from_json(d["subMatch"]), d["isGreedy"])
    if t == "OrMatch":
        return OrMatch(match_from_json(d["subMatch"]), d["clauseID"])
    if t == "NamedMatch":
        return NamedMatch(match_from_json(d["subMatch"]), d["name"], d["label"])
    raise ValueError(f"unknown match type {t}")


def capture_from_json(d: Dict) -> NamedCapture:
    return NamedCapture(d["name"], d["label"], match_from_json(d["capturedMatch"]))


def mention_to_json(m: Mention) -> Dict:
    return {
        "type": "Mention",
        "odinsonMatch": match_to_json(m.match),
        "label": m.label,
        "docId": m.doc_id,
        "sentId": m.sent_idx,
        "foundBy": m.found_by,
    }


def mention_from_json(d: Dict) -> Mention:
    return Mention(match_from_json(d["odinsonMatch"]), d["label"], d["sentId"], d["foundBy"], d["docId"])


def mentions_to_json_lines(mentions) -> str:
    return "\n".join(json.dumps(mention_to_json(m)) for m in mentions)


def write_mentions_json(mentions_ds, out_dir: str) -> None:
    """Dataset-level JSON-lines sink for the flat mentions table."""
    mentions_ds.write_json(out_dir)

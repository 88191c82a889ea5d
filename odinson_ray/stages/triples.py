"""Graph materialize: event mentions -> (subj, pred, obj) triple table.

North-rule stage. Shuffle discipline (SURVEY §2.5):
- triples are pre-aggregated INSIDE map_batches (one row per distinct
  triple per batch) before the global groupby — the all-to-all exchange
  moves partial counts, not raw mentions (combiner pattern)
- the groupby key is (subj_canon, pred, obj_canon); Zipfian-hot entities
  are already collapsed per batch, which bounds per-key fan-in to
  #batches, the standard salting-equivalent for count aggregation
"""

from __future__ import annotations

from typing import Dict, List

import pandas as pd
import pyarrow as pa


def mentions_to_triples(batch: pa.Table) -> pa.Table:
    """Event mentions batch -> raw triples (subj, pred, obj, doc_id, sent_id).

    subject/object argument surfaces become endpoints; the trigger span text
    is the predicate (mention rows carry trigger-span text for events)."""
    out: Dict[str, List] = {k: [] for k in ("subj", "pred", "obj", "doc_id", "sent_id")}
    args_col = batch["args"].to_pylist()
    texts = batch["text"].to_pylist()
    doc_ids = batch["doc_id"].to_pylist()
    sent_ids = batch["sent_id"].to_pylist()
    for args, pred, doc_id, sent_id in zip(args_col, texts, doc_ids, sent_ids):
        if not args:
            continue
        subjects = [a["text"] for a in args if a["name"] == "subject"]
        objects = [a["text"] for a in args if a["name"] == "object"]
        for s in subjects:
            for o in objects:
                out["subj"].append(s)
                out["pred"].append(pred)
                out["obj"].append(o)
                out["doc_id"].append(doc_id)
                out["sent_id"].append(sent_id)
    return pa.Table.from_pydict(
        {
            "subj": pa.array(out["subj"], pa.string()),
            "pred": pa.array(out["pred"], pa.string()),
            "obj": pa.array(out["obj"], pa.string()),
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "sent_id": pa.array(out["sent_id"], pa.int32()),
        }
    )


def partial_count_triples(batch: pa.Table, keys) -> pa.Table:
    """Per-batch combiner: collapse to one row per distinct key tuple."""
    df = batch.select(list(keys)).to_pandas()
    agg = df.groupby(list(keys), sort=False).size().reset_index(name="partial_n")
    return pa.Table.from_pandas(agg, preserve_index=False)


def aggregate_triples(triples_ds, keys=("subj_canon", "pred", "obj_canon", "subj", "obj")):
    """partial per-batch counts -> small global groupby -> (keys..., n)."""
    from ray.data.aggregate import Sum

    partials = triples_ds.map_batches(
        lambda b: partial_count_triples(b, keys), batch_format="pyarrow"
    )
    # partials are tiny (one row per distinct key per batch) but inherit the
    # upstream block count; coalesce so the shuffle sorts a few real blocks
    # instead of a thousand splinters
    partials = partials.repartition(16)
    out = partials.groupby(list(keys)).aggregate(Sum("partial_n", alias_name="n"))
    return out

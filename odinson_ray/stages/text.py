"""Text-analysis operators: language ID, quality scoring, token counting,
fingerprinting. All vectorized-or-cheap per-batch maps (no shuffles).
"""

from __future__ import annotations

import hashlib
from typing import Dict, List

import pyarrow as pa
import pyarrow.compute as pc

# tiny function-word profiles for the n-gram/stopword language heuristic
LANG_PROFILES: Dict[str, frozenset] = {
    "en": frozenset({"the", "a", "of", "and", "to", "in", "is"}),
    "de": frozenset({"der", "die", "das", "und", "ist", "ein"}),
    "fr": frozenset({"le", "la", "les", "et", "est", "un"}),
    "es": frozenset({"el", "la", "los", "y", "es", "un"}),
    "zh": frozenset({"的", "是", "了", "在"}),
}


def predict_lang(text: str) -> str:
    toks = text.split(" ") if text else []
    best, best_score = "en", -1.0
    for lang, profile in sorted(LANG_PROFILES.items()):
        score = sum(t in profile for t in toks)
        if score > best_score:
            best, best_score = lang, score
    return best


def langid_batch(batch: pa.Table) -> pa.Table:
    preds = [predict_lang(t) for t in batch["text"].to_pylist()]
    return pa.Table.from_pydict(
        {"doc_id": batch["doc_id"], "lang_pred": pa.array(preds, pa.string())}
    )


def token_count_batch(batch: pa.Table) -> pa.Table:
    toks = pc.split_pattern(batch["text"], " ")
    return pa.Table.from_pydict(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
        }
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    fps = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in batch["text"].to_pylist()]
    return pa.Table.from_pydict(
        {"doc_id": batch["doc_id"], "fp": pa.array(fps, pa.string())}
    )


def rolling_fingerprints(text: str, window: int = 8, base: int = 257,
                         mod: int = (1 << 61) - 1) -> List[int]:
    """Rolling polynomial hash over the token stream (winnowing-style
    document fingerprints)."""
    toks = text.split(" ") if text else []
    hs = [int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little") % mod for t in toks]
    if len(hs) < window:
        return [sum(h * pow(base, i, mod) for i, h in enumerate(hs)) % mod] if hs else []
    out = []
    power = pow(base, window - 1, mod)
    cur = 0
    for i, h in enumerate(hs):
        cur = (cur * base + h) % mod
        if i >= window:
            cur = (cur - hs[i - window] * pow(base, window, mod)) % mod
        if i >= window - 1:
            out.append(cur)
    return out


def quality_batch(batch: pa.Table, stopwords=("the", "a")) -> pa.Table:
    texts = batch["text"].to_pylist()
    n_tokens, stop_ratio, avg_len = [], [], []
    for txt in texts:
        toks = txt.split(" ") if txt else []
        n = len(toks)
        n_tokens.append(n)
        stop_ratio.append(round(sum(tk in stopwords for tk in toks) / n, 6) if n else 0.0)
        avg_len.append(round(sum(len(tk) for tk in toks) / n, 6) if n else 0.0)
    return pa.Table.from_pydict(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "stop_ratio": pa.array(stop_ratio, pa.float64()),
            "avg_token_len": pa.array(avg_len, pa.float64()),
        }
    )


# PII scrubbing: fully vectorized Arrow RE2 kernels (replace_substring_regex);
# DuckDB's regexp_replace(..., 'g') is also RE2, so the SQL oracle applies
# the IDENTICAL patterns in the identical order — byte-exact outputs.
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    (r"\b\d{6,}\b", "[NUM]"),
)


def scrub_batch(batch: pa.Table) -> pa.Table:
    col = batch["text"]
    for pattern, repl in PII_PATTERNS:
        col = pc.replace_substring_regex(col, pattern=pattern, replacement=repl)
    changed = pc.not_equal(col, batch["text"])
    return pa.Table.from_pydict(
        {"doc_id": batch["doc_id"], "clean_text": col, "redacted": changed}
    )


def scrub_pii(sf_dir: str):
    """Redact emails / IPv4s / long digit runs from the text column."""
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(scrub_batch, batch_format="pyarrow")


# ===================================================== corpus term statistics

def df_partial_batch(batch: pa.Table) -> pa.Table:
    """Per-batch document-frequency combiner: one (tok, partial_df) row per
    distinct (document, token) pair in the batch. Documents never span
    batches (one row = one document), so within-batch distinct == per-doc
    distinct, and the global groupby sums partials — the all-to-all moves
    at most |batch vocabulary| rows per batch, never raw token streams.
    Pure Arrow throughout (pandas metadata defeats Ray's schema dedup)."""
    toks = pc.split_pattern(batch["text"], " ")
    pair = pa.table({
        "tok": pc.list_flatten(toks),
        "_row": pc.list_parent_indices(toks),
    })
    dd = pa.TableGroupBy(pair, ["tok", "_row"]).aggregate([])
    agg = pa.TableGroupBy(dd.select(["tok"]), ["tok"]).aggregate([([], "count_all")])
    return agg.rename_columns(["tok", "partial_df"])


def doc_frequency(sf_dir: str):
    """Corpus inverted document-frequency table: tok -> number of docs
    containing it. The scale-canonical combiner pattern (SURVEY §2.5):
    pre-aggregate per batch, shuffle only per-batch vocabulary rows."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(df_partial_batch, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("partial_df", alias_name="df"))
    )


def tfidf_top_term(sf_dir: str):
    """Per-document top tf-idf term (score = tf * ln(N/df), rounded to 6dp;
    ties broken by lexicographically smallest term).

    Two-pass broadcast pattern: pass 1 aggregates the (small) df table and
    doc count; the df map is broadcast via ``ray.put`` and read inside
    every scoring task — the big side streams, the small side ships once
    per node, no shuffle join. At 100 TB the vocabulary table is the only
    materialized artifact (IDF tables are MBs where corpora are TBs)."""
    import numpy as np
    import ray
    import ray.data as rd

    from .link import get_broadcast

    df_tbl = doc_frequency(sf_dir).take_all()  # vocabulary-sized (small)
    n_docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"]).count()
    vocab = sorted(r["tok"] for r in df_tbl)
    dfs = {r["tok"]: r["df"] for r in df_tbl}
    idf = np.log(float(n_docs) / np.array([dfs[t] for t in vocab], dtype=np.float64))
    ref = ray.put((np.array(vocab, dtype=object), idf))

    def score(batch: pa.Table) -> pa.Table:
        vocab_arr, idf_arr = get_broadcast(ref)
        toks = pc.split_pattern(batch["text"], " ")
        pair = pa.table({
            "_row": pc.list_parent_indices(toks),
            "tok": pc.list_flatten(toks),
        })
        tf = pa.TableGroupBy(pair, ["_row", "tok"]).aggregate([([], "count_all")])
        rows = tf["_row"].to_numpy(zero_copy_only=False)
        terms = np.asarray(tf["tok"].to_pylist(), dtype=object)
        counts = tf["count_all"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(vocab_arr, terms)
        scores = np.round(counts * idf_arr[pos], 6)
        # per-row argmax with min-term tie-break: lexsort is last-key-major
        order = np.lexsort((terms, -scores, rows))
        first = np.concatenate([[0], np.flatnonzero(rows[order][1:] != rows[order][:-1]) + 1])
        pick = order[first]
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[rows[pick]], pa.int64()),
            "top_term": pa.array(terms[pick].tolist(), pa.string()),
            "score": pa.array(scores[pick], pa.float64()),
        })

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(score, batch_format="pyarrow")
    )

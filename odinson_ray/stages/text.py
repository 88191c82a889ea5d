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

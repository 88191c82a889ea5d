"""Deduplication operators for large-scale training-data pipelines.

All operators follow the combiner-before-shuffle discipline:

- exact dedup:   content-hash per batch -> groupby(hash) first-wins
- MinHash+LSH:   shingle -> 128 seeded minhashes -> band rows
                 (band_id, band_hash, doc_id) -> groupby bands -> candidate
                 pairs -> EXACT jaccard verification -> pairs >= threshold.
                 With b=32 bands of r=4 rows the miss probability at
                 j>=0.9 is ~(1-0.9^4)^32 ~ 5e-15, so the verified output
                 equals the exact >= 0.9 pair set for practical purposes
                 (which is what the DuckDB oracle checks).
- SimHash:       64-bit sign-aggregated token hashes, Hamming buckets
- n-gram jaccard: exact pairwise jaccard within a blocking key

Shingle/minhash computation is per-batch and vectorized with numpy; only
(band, doc) rows and candidate pairs shuffle — never the documents.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

N_HASHES = 128
N_BANDS = 32
ROWS_PER_BAND = N_HASHES // N_BANDS
_MERSENNE = (1 << 61) - 1

# deterministic hash-family parameters (seeded, no global state)
_rng = np.random.RandomState(42)
_A = _rng.randint(1, _MERSENNE, size=N_HASHES, dtype=np.int64).astype(np.uint64)
_B = _rng.randint(0, _MERSENNE, size=N_HASHES, dtype=np.int64).astype(np.uint64)


def shingles(text: str, n: int = 3) -> List[str]:
    toks = text.split(" ") if text else []
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return list(dict.fromkeys(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)))


def _shingle_hashes(sh: List[str]) -> np.ndarray:
    """stable 61-bit hashes of shingles (md5-based, python-hash-seed-free)."""
    return np.array(
        [int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little") & _MERSENNE for s in sh],
        dtype=np.uint64,
    )


def minhash_signature(text: str) -> np.ndarray:
    h = _shingle_hashes(shingles(text))
    if len(h) == 0:
        return np.zeros(N_HASHES, dtype=np.uint64)
    # (a * x + b) mod p for each hash function, min over shingles
    vals = (_A[None, :] * h[:, None] + _B[None, :]) % _MERSENNE
    return vals.min(axis=0)


def minhash_bands_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> (band_id, band_hash, doc_id) rows."""
    out_band, out_hash, out_doc = [], [], []
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        sig = minhash_signature(text)
        for b in range(N_BANDS):
            row = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
            out_band.append(b)
            out_hash.append(hashlib.md5(row.tobytes()).hexdigest())
            out_doc.append(doc_id)
    return pa.Table.from_pydict(
        {
            "band_id": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.string()),
            "doc_id": pa.array(out_doc, pa.int64()),
        }
    )


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    ids = sorted(set(g["doc_id"]))
    pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
    return pd.DataFrame({"a_id": [p[0] for p in pairs], "b_id": [p[1] for p in pairs]})


def jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = set(shingles(a, n)), set(shingles(b, n))
    if not sa and not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.9):
    """Full MinHash-LSH near-dup pipeline; returns verified pairs
    (a_id, b_id, j) with exact jaccard >= threshold."""
    import ray
    import ray.data as rd

    docs_path = f"{sf_dir}/documents.parquet"
    bands = (
        rd.read_parquet(docs_path, columns=["doc_id", "text"])
        .map_batches(minhash_bands_batch, batch_format="pyarrow")
    )
    candidates = (
        bands.groupby(["band_id", "band_hash"])
        .map_groups(_bucket_pairs, batch_format="pandas")
    )
    # distributed candidate dedup (a pair may collide in many bands)
    from ray.data.aggregate import Count

    cand_df = (
        candidates.groupby(["a_id", "b_id"]).aggregate(Count(alias_name="_n"))
        .to_pandas()[["a_id", "b_id"]]
    )
    if len(cand_df) == 0:
        return pd.DataFrame({"a_id": pd.Series([], dtype="int64"),
                             "b_id": pd.Series([], dtype="int64"),
                             "j": pd.Series([], dtype="float64")})
    # broadcast doc texts for the candidate ids only (small side)
    need = sorted(set(cand_df.a_id) | set(cand_df.b_id))
    texts = pd.read_parquet(docs_path, columns=["doc_id", "text"])
    texts = texts[texts.doc_id.isin(need)]
    lookup = dict(zip(texts.doc_id, texts.text))
    ref = ray.put(lookup)

    from .link import get_broadcast

    def verify(t: pa.Table) -> pa.Table:
        lk = get_broadcast(ref)
        a = t["a_id"].to_pylist()
        b = t["b_id"].to_pylist()
        js = [round(jaccard(lk[x], lk[y]), 6) for x, y in zip(a, b)]
        out = pa.Table.from_pydict(
            {"a_id": pa.array(a, pa.int64()), "b_id": pa.array(b, pa.int64()),
             "j": pa.array(js, pa.float64())}
        )
        mask = pa.array([j >= threshold for j in js])
        return out.filter(mask)

    cand_ds = rd.from_pandas(cand_df)
    out = cand_ds.map_batches(verify, batch_format="pyarrow").to_pandas()
    if len(out) == 0:
        out = pd.DataFrame({"a_id": pd.Series([], dtype="int64"),
                            "b_id": pd.Series([], dtype="int64"),
                            "j": pd.Series([], dtype="float64")})
    return out


# ---------------------------------------------------------------- simhash

def simhash64(text: str) -> int:
    toks = text.split(" ") if text else []
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for tok, cnt in pd.Series(toks).value_counts().items():
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
        bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8))
        acc += (bits.astype(np.int64) * 2 - 1) * int(cnt)
    out = 0
    for i, v in enumerate(acc):
        if v > 0:
            out |= 1 << i
    return out


def simhash_batch(batch: pa.Table) -> pa.Table:
    hashes = [simhash64(t) for t in batch["text"].to_pylist()]
    return pa.Table.from_pydict(
        {
            "doc_id": batch["doc_id"],
            "simhash": pa.array([f"{h:016x}" for h in hashes], pa.string()),
        }
    )


def simhash_pairs(sf_dir: str, max_hamming: int = 6):
    """SimHash near-dup: bucket by 16-bit sub-keys (a pair within Hamming
    distance <= 6 of 64 bits shares at least one of 4 sub-keys... with 4
    blocks this holds for distance <= 3; we use 8 blocks of 8 bits for
    distance <= 7), then verify Hamming distance exactly."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sig = docs.map_batches(simhash_batch, batch_format="pyarrow").to_pandas()
    sig["h"] = sig["simhash"].apply(lambda s: int(s, 16))
    # 8 blocks of 8 bits: any pair with hamming <= 7 collides in >= 1 block
    buckets: Dict[Tuple[int, int], List[int]] = {}
    for doc_id, h in zip(sig.doc_id, sig.h):
        for blk in range(8):
            key = (blk, (h >> (8 * blk)) & 0xFF)
            buckets.setdefault(key, []).append((doc_id, h))
    seen = set()
    rows = []
    for members in buckets.values():
        if len(members) < 2:
            continue
        for i in range(len(members)):
            for k in range(i + 1, len(members)):
                (a, ha), (b, hb) = members[i], members[k]
                if a == b:
                    continue
                key = (min(a, b), max(a, b))
                if key in seen:
                    continue
                seen.add(key)
                d = bin(ha ^ hb).count("1")
                if d <= max_hamming:
                    rows.append((key[0], key[1], d))
    return pd.DataFrame(rows, columns=["a_id", "b_id", "hamming"]).astype(
        {"a_id": "int64", "b_id": "int64", "hamming": "int64"}
    )


# ---------------------------------------------------------------- exact jaccard

def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.3, block_col: str = "source"):
    """Exact pairwise n-gram jaccard within blocking-key groups."""
    import ray.data as rd

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        docs = sorted(zip(g["doc_id"], g["text"]))
        sets = {d: set(shingles(t)) for d, t in docs}
        rows = []
        ids = [d for d, _ in docs]
        for i in range(len(ids)):
            for k in range(i + 1, len(ids)):
                sa, sb = sets[ids[i]], sets[ids[k]]
                if not sa and not sb:
                    continue
                j = len(sa & sb) / len(sa | sb)
                if j >= threshold:
                    rows.append((ids[i], ids[k], round(j, 6)))
        return pd.DataFrame(rows, columns=["a_id", "b_id", "j"]).astype(
            {"a_id": "int64", "b_id": "int64", "j": "float64"}
        )

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", block_col])
        .groupby(block_col)
        .map_groups(pairs, batch_format="pandas")
    )

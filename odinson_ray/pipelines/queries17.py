"""Round-4 session-8 batch: two LLM-data-curation operators the
inventory lacked —

- ``dsir_select``: DSIR-style data selection with importance resampling
  (Xie et al. 2023, "Data Selection for Language Models via Importance
  Resampling"): hashed-bigram bucket counts fit a target-vs-raw
  importance model, each document is scored by the sum of per-bucket
  log-likelihood ratios over its bigram occurrences, and the top-k
  highest-importance documents are selected. The published recipe for
  "pick web documents that look like the target domain" at corpus scale.
- ``dedup_delta``: incremental cross-corpus exact dedup — the shape a
  recurring crawl pipeline runs every ingest: drop delta-shard documents
  whose content hash already exists in the BASE corpus, then keep one
  representative (min doc_id) per remaining duplicate group WITHIN the
  delta. (Parallel in the reference: the incremental index only adds
  documents not already indexed —
  core/src/main/scala/ai/lum/odinson/lucene/index/IncrementalOdinsonIndex.scala:104-121.)

Registered by ``pipelines/queries.py``; each ``q_*`` takes ``sf_dir``;
oracle column names match exactly. DSIR per-bucket log-ratio terms are
quantized to int64 MICRO-units with ``math.log`` (libm — the same
function DuckDB's ``ln()`` calls; the user_type_kl / nb_lang_confusion
precedent), so every document weight is an order-independent integer
sum and the oracle is hash-exact.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _rd():
    from ..sources.io import clean_rd

    return clean_rd


# ===================== DSIR importance resampling (hashed-bigram model)

#: hashed feature buckets. 256 keeps the oracle's bucket CTE enumerable
#: while exercising real collisions; the paper uses 10k — the shape is
#: identical, only this constant (and the driver-side 2 KB table) grows.
_DSIR_B = 256
_DSIR_TARGET = "en"  # target domain: English docs; raw = whole corpus
_DSIR_K = 50

# md5 of the bigram string is the oracle contract (DuckDB recomputes it:
# CAST(('0x' || substr(md5(bg), 1, 8)) AS BIGINT) % B) — hex-prefix
# big-endian, NOT dedup._md5_64's little-endian digest prefix. Bounded
# per-process cache: bigrams repeat heavily across documents.
_BUCKET_CACHE: dict[str, int] = {}
_BUCKET_CACHE_CAP = 1 << 20


def _bucket_of(bg: str) -> int:
    v = _BUCKET_CACHE.get(bg)
    if v is None:
        v = int(hashlib.md5(bg.encode("utf-8")).hexdigest()[:8], 16) % _DSIR_B
        if len(_BUCKET_CACHE) < _BUCKET_CACHE_CAP:
            _BUCKET_CACHE[bg] = v
    return v


def _doc_buckets(text: str) -> np.ndarray:
    """Bucket ids of the document's space-split bigram OCCURRENCES
    (duplicates kept — DSIR counts occurrences, not types)."""
    ws = text.split(" ")
    n = len(ws) - 1
    if n <= 0:
        return np.empty(0, np.int64)
    return np.fromiter(
        (_bucket_of(ws[i] + " " + ws[i + 1]) for i in range(n)),
        np.int64, n)


def dsir_bucket_stats(sf_dir: str):
    """Pass 1: per-bucket bigram-occurrence counts, target vs raw.

    Per-batch combiner emits exactly ``_DSIR_B`` partial rows, then ONE
    bounded-domain groupby (256 groups) — the driver only ever sees the
    256-row result, never token data, at any corpus size."""
    from ray.data.aggregate import Sum

    rd = _rd()

    def partial(t: pa.Table) -> pa.Table:
        ct = np.zeros(_DSIR_B, np.int64)
        cr = np.zeros(_DSIR_B, np.int64)
        langs = t["lang"].to_pylist()
        for text, lang in zip(t["text"].to_pylist(), langs):
            bs = _doc_buckets(text)
            if len(bs) == 0:
                continue
            bc = np.bincount(bs, minlength=_DSIR_B)
            cr += bc
            if lang == _DSIR_TARGET:
                ct += bc
        return pa.table({
            "b": pa.array(np.arange(_DSIR_B, dtype=np.int64)),
            "ct": pa.array(ct), "cr": pa.array(cr),
        })

    agg = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text", "lang"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("b").aggregate(Sum("ct"), Sum("cr")))
    rows = agg.take_all()  # exactly _DSIR_B rows, bounded by construction
    ct = np.zeros(_DSIR_B, np.int64)
    cr = np.zeros(_DSIR_B, np.int64)
    for r in rows:
        ct[r["b"]] = r["sum(ct)"]
        cr[r["b"]] = r["sum(cr)"]
    return ct, cr


def dsir_term_table(ct: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """Per-bucket importance term in int64 micro-units:
    floor((ln((ct+1)/(tt+B)) - ln((cr+1)/(tr+B))) * 1e6) — Laplace-
    smoothed log-likelihood ratio of the hashed target vs raw unigram-
    of-bigrams model, the DSIR importance weight per feature count."""
    tt = float(ct.sum())
    tr = float(cr.sum())
    out = np.empty(_DSIR_B, np.int64)
    for b in range(_DSIR_B):
        out[b] = math.floor(
            (math.log((float(ct[b]) + 1.0) / (tt + float(_DSIR_B)))
             - math.log((float(cr[b]) + 1.0) / (tr + float(_DSIR_B))))
            * 1000000.0)
    return out


def q_dsir_select(sf_dir: str):
    """DSIR data selection: top-k (_DSIR_K=50) documents by
    hashed-bigram importance weight toward the _DSIR_TARGET ('en')
    domain.

    Shape: pass 1 is a bounded-domain combiner groupby (_DSIR_B=256
    buckets — the only thing the driver ever holds); the 256-entry
    int64 term table is ``ray.put`` once and read by every scoring
    task; pass 2 scores each doc with one vectorized
    ``tm[buckets].sum()`` and prunes to the batch-local top-k before
    the global sort (global_topk), so the sort input is <= k rows per
    block. Documents with no bigram (< 2 tokens) carry no evidence and
    are excluded on both sides."""
    import ray

    from odinson_ray.stages.link import get_broadcast
    from odinson_ray.stages.shuffle import global_topk

    rd = _rd()
    ct, cr = dsir_bucket_stats(sf_dir)
    tm_ref = ray.put(dsir_term_table(ct, cr))

    def score(t: pa.Table) -> pa.Table:
        tm = get_broadcast(tm_ref)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        langs = t["lang"].to_pylist()
        texts = t["text"].to_pylist()
        out_id, out_lang, out_w = [], [], []
        for did, lang, text in zip(doc_ids, langs, texts):
            bs = _doc_buckets(text)
            if len(bs) == 0:
                continue
            out_id.append(int(did))
            out_lang.append(lang)
            out_w.append(int(tm[bs].sum()))
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "lang": pa.array(out_lang, pa.string()),
            "w_micro": pa.array(out_w, pa.int64()),
        })

    scored = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    ).map_batches(score, batch_format="pyarrow")
    return global_topk(scored, ["w_micro", "doc_id"], [True, False], _DSIR_K)


ORACLE_DSIR_SELECT = """
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
),
bb AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(bg), 1, 8)) AS BIGINT) % 256 AS b
  FROM toks,
       UNNEST([ws[i] || ' ' || ws[i + 1]
               FOR i IN generate_series(1, len(ws) - 1)]) AS u(bg)
),
stats AS (
  SELECT b,
         COUNT(*) FILTER (WHERE lang = 'en') AS ct,
         COUNT(*) AS cr
  FROM bb GROUP BY b
),
tot AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM stats),
term AS (
  SELECT b,
         CAST(FLOOR((ln((ct + 1.0) / (tt + 256.0))
                     - ln((cr + 1.0) / (tr + 256.0))) * 1000000.0)
              AS BIGINT) AS tm
  FROM stats, tot
),
w AS (
  SELECT bb.doc_id, CAST(SUM(term.tm) AS BIGINT) AS w_micro
  FROM bb JOIN term USING (b) GROUP BY bb.doc_id
)
SELECT d.doc_id, d.lang, w.w_micro
FROM w JOIN documents d USING (doc_id)
ORDER BY w.w_micro DESC, d.doc_id
LIMIT 50
"""


# ===================== incremental cross-corpus exact dedup (delta shard)

#: the "new crawl" slice of the corpus; everything else is the base.
_DELTA_SOURCES = ("src3", "src7", "src12")


def q_dedup_delta(sf_dir: str):
    """Incremental exact dedup of a delta shard against the base corpus:
    keep delta documents whose md5(text) fingerprint (the shared
    ``content_fingerprints`` kernel — same identity as q_dedup_exact)
    appears nowhere in the base, one representative (min doc_id) per
    duplicate group within the delta.

    Shape: both sides are per-batch fingerprinted (base projected to
    the hash column only, per-batch-deduped before the shuffle); ONE
    distributed anti join drops the already-seen delta docs (hash_join
    tolerates duplicate right rows); the within-delta representative is
    a pure Min aggregate over a zero-padded ``doc_id|source`` packing
    (the event_throttle precedent) — no per-hash map_groups, no second
    join."""
    from ray.data.aggregate import Min

    from odinson_ray.stages.shuffle import hash_join
    from odinson_ray.stages.text import content_fingerprints

    rd = _rd()
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source", "text"])
    delta_set = pa.array(list(_DELTA_SOURCES))

    def delta_fp(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["source"], value_set=delta_set))
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        # the zero-padded packing's lexicographic-min == numeric-min
        # invariant (and the fixed 20-char unpack slice) requires
        # non-negative doc ids — fail loudly, not wrongly (ADVICE r04)
        if len(ids) and ids.min() < 0:
            raise ValueError("dedup_delta: negative doc_id breaks the "
                             "zero-padded Min-representative packing")
        src = t["source"].to_pylist()
        return pa.table({
            "h": content_fingerprints(t["text"]),
            "packed": pa.array(
                [f"{int(i):020d}|{s}" for i, s in zip(ids, src)],
                pa.string()),
        })

    def base_fp(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(
            pc.is_in(t["source"], value_set=delta_set)))
        h = content_fingerprints(t["text"])
        # batch-local distinct: shrinks the shuffle; the anti join
        # tolerates duplicate right rows across batches.
        return pa.table({"h": pc.unique(h)})

    delta = docs.map_batches(delta_fp, batch_format="pyarrow")
    base = docs.map_batches(base_fp, batch_format="pyarrow")
    surv = hash_join(
        delta, base, on="h", how="anti",
        left_schema=pa.schema([("h", pa.string()),
                               ("packed", pa.string())]),
        right_schema=pa.schema([("h", pa.string())]))

    keep = surv.groupby("h").aggregate(Min("packed"))

    def unpack(t: pa.Table) -> pa.Table:
        if t.schema.metadata:
            t = t.replace_schema_metadata(None)
        packed = t["min(packed)"]
        return pa.table({
            "doc_id": pc.cast(pc.utf8_slice_codeunits(packed, 0, 20),
                              pa.int64()),
            "source": pc.utf8_slice_codeunits(packed, 21, 2**30),
            "h": t["h"],
        })

    return keep.map_batches(unpack, batch_format="pyarrow").sort("doc_id")


ORACLE_DEDUP_DELTA = """
WITH delta AS (
  SELECT doc_id, source, md5(text) AS h FROM documents
  WHERE source IN ('src3', 'src7', 'src12')
),
base AS (
  SELECT DISTINCT md5(text) AS h FROM documents
  WHERE source NOT IN ('src3', 'src7', 'src12')
),
surv AS (
  SELECT d.doc_id, d.source, d.h
  FROM delta d LEFT JOIN base b USING (h)
  WHERE b.h IS NULL
),
keep AS (SELECT h, MIN(doc_id) AS m FROM surv GROUP BY h)
SELECT s.doc_id, s.source, s.h
FROM surv s JOIN keep k ON s.h = k.h AND s.doc_id = k.m
ORDER BY s.doc_id
"""


def register(queries: dict, oracles: dict) -> None:
    queries["dsir_select"] = q_dsir_select
    oracles["dsir_select"] = ORACLE_DSIR_SELECT
    queries["dedup_delta"] = q_dedup_delta
    oracles["dedup_delta"] = ORACLE_DEDUP_DELTA

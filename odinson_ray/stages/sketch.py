"""Mergeable sketches for approximate distinct counting at 100-TB scale.

HyperLogLog: per-batch register arrays (m = 2^p bytes per group per
batch) merged by elementwise max — the shuffle moves m-byte blobs, one
per (group, batch), NEVER the value stream. Exact distinct counting of a
high-cardinality column requires shuffling every distinct value
(distinct_users_per_type does exactly that and stays as the exact
operator); the sketch bounds shuffle bytes by #groups x #batches x m
with ~1.04/sqrt(m) relative error (~1.6% at p=12).

Hashing: splitmix64 finalizer over int64 keys (vectorized, deterministic,
no hash-seed dependence); strings hash via md5's first 8 bytes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_P = 12
_M = 1 << _P
# standard HLL bias constant for m >= 128
_ALPHA = 0.7213 / (1.0 + 1.079 / _M)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _hash_values(col: pa.ChunkedArray) -> np.ndarray:
    if pa.types.is_integer(col.type):
        return _splitmix64(col.to_numpy(zero_copy_only=False).astype(np.int64))
    return np.fromiter(
        (int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "little")
         for v in col.to_pylist()),
        dtype=np.uint64, count=len(col))


def _registers(hashes: np.ndarray, group_idx: np.ndarray,
               n_groups: int) -> np.ndarray:
    """(n_groups, m) uint8 register matrix from hashed values."""
    regs = np.zeros((n_groups, _M), dtype=np.uint8)
    if len(hashes) == 0:
        return regs
    bucket = (hashes >> np.uint64(64 - _P)).astype(np.int64)
    w = hashes & np.uint64((1 << (64 - _P)) - 1)
    # rank = leading-zero count within the (64-p)-bit tail + 1;
    # w < 2^52 is exactly representable in float64, so log2 is exact
    nz = w > 0
    rank = np.full(len(w), 64 - _P + 1, dtype=np.uint8)
    rank[nz] = (64 - _P - np.floor(np.log2(w[nz].astype(np.float64)))).astype(np.uint8)
    np.maximum.at(regs, (group_idx, bucket), rank)
    return regs


def hll_partial_batch(t: pa.Table, group: str, value: str) -> pa.Table:
    """One (group, m-byte register blob) row per distinct group per batch."""
    keys = t[group].to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(keys, return_inverse=True)
    regs = _registers(_hash_values(t[value]), inv, len(uniq))
    return pa.table({
        group: pa.array(uniq.tolist(), t.schema.field(group).type),
        "_regs": pa.array([r.tobytes() for r in regs], pa.binary()),
    })


def _estimate(regs: np.ndarray) -> int:
    est = _ALPHA * _M * _M / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * _M and zeros:  # small-range linear counting
        est = _M * np.log(_M / zeros)
    return int(round(est))


def hll_distinct(ds, group: str, value: str, out: str = "approx_distinct"):
    """Approximate COUNT(DISTINCT value) per group: per-batch register
    partials -> groupby(group) elementwise-max merge -> estimate. The
    merge sees O(#batches) m-byte rows per group, never values."""

    def merge(g: pa.Table) -> pa.Table:
        regs = np.zeros(_M, dtype=np.uint8)
        for blob in g["_regs"].to_pylist():
            np.maximum(regs, np.frombuffer(blob, dtype=np.uint8), out=regs)
        return pa.table({
            group: g[group].slice(0, 1),
            out: pa.array([_estimate(regs)], pa.int64()),
        })

    partials = ds.map_batches(
        lambda t: hll_partial_batch(t, group, value), batch_format="pyarrow")
    return partials.groupby(group).map_groups(merge, batch_format="pyarrow")


# ============================= CountMin sketch (approximate frequencies)

_CMS_D = 4
_CMS_W = 1 << 12  # 4 rows x 4096 int64 counters = 128 KiB per partial
_CMS_SEEDS = np.array([0x243F6A8885A308D3, 0x13198A2E03707344,
                       0xA4093822299F31D0, 0x082EFA98EC4E6C89],
                      dtype=np.uint64)


def _cms_cells(hashes: np.ndarray) -> np.ndarray:
    """(n, d) counter columns: one independent row hash per seed."""
    return np.stack([
        (_splitmix64(hashes ^ s) % np.uint64(_CMS_W)).astype(np.int64)
        for s in _CMS_SEEDS], axis=1)


def cms_partial_batch(hashes: np.ndarray, weights: np.ndarray | None = None) -> bytes:
    """One fixed-size (d x w int64) sketch blob for a batch of hashed keys.
    Mergeable by elementwise SUM (linear sketch)."""
    sk = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
    if len(hashes):
        cells = _cms_cells(hashes)
        w = weights if weights is not None else np.ones(len(hashes), np.int64)
        for d in range(_CMS_D):
            np.add.at(sk[d], cells[:, d], w)
    return sk.tobytes()


def cms_merge(blobs) -> np.ndarray:
    sk = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
    for b in blobs:
        sk += np.frombuffer(b, dtype=np.int64).reshape(_CMS_D, _CMS_W)
    return sk


def cms_estimate(sk: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Point estimates (min over rows) — never under-counts, over-counts
    by <= e/w * N with prob 1 - e^-d."""
    if not len(hashes):
        return np.zeros(0, dtype=np.int64)
    cells = _cms_cells(hashes)
    return np.min(np.stack([sk[d][cells[:, d]] for d in range(_CMS_D)],
                           axis=1), axis=1)


def cms_token_counts(ds, text_col: str = "text", top_k: int = 20,
                     local_k: int = 50, fanin: int = 32):
    """Approximate corpus heavy hitters WITHOUT shuffling the token
    stream: each batch emits (a) one 128-KiB CMS partial and (b) its
    local top-``local_k`` tokens as candidates. Partials tree-merge
    through a ``fanin``-way groupby so no single task (or the driver)
    sees more than #batches/fanin blobs + ``fanin`` at the root; the
    candidate set is the union of local heavy hitters (a global heavy
    hitter is locally heavy in aggregate — standard candidate heuristic,
    documented as such). Returns (token, est_n) for the top_k candidates
    by estimated count. Approximate BY DESIGN: no SQL oracle; the pytest
    pins the one-sided error bound against exact counts."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t[text_col], " "))
        vals, counts = np.unique(np.asarray(toks), return_counts=True)
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(v.encode()).digest()[:8], "little")
             for v in vals), dtype=np.uint64, count=len(vals))
        blob = cms_partial_batch(h, counts.astype(np.int64))
        top = np.argsort(-counts, kind="stable")[:local_k]
        salt = int(h[0] % fanin) if len(h) else 0
        return pa.table({
            "_s": pa.array([salt], pa.int64()),
            "_cms": pa.array([blob], pa.binary()),
            "_cand": pa.array([vals[top].tolist()], pa.list_(pa.string())),
        })

    def merge_level(g: pa.Table) -> pa.Table:
        sk = cms_merge(g["_cms"].to_pylist())
        cands = sorted(set(pc.list_flatten(g["_cand"]).to_pylist()))
        return pa.table({
            "_s": pa.array([0], pa.int64()),
            "_cms": pa.array([sk.tobytes()], pa.binary()),
            "_cand": pa.array([cands], pa.list_(pa.string())),
        })

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("_s").map_groups(merge_level, batch_format="pyarrow")
              .take_all())
    sk = cms_merge(r["_cms"] for r in merged)
    cands = sorted(set().union(*(r["_cand"] for r in merged)))
    h = np.fromiter(
        (int.from_bytes(hashlib.md5(c.encode()).digest()[:8], "little")
         for c in cands), dtype=np.uint64, count=len(cands))
    est = cms_estimate(sk, h)
    order = np.lexsort((np.array(cands), -est))[:top_k]
    return pa.table({
        "token": pa.array([cands[i] for i in order], pa.string()),
        "est_n": pa.array(est[order], pa.int64()),
    })


# --------------------------------------------------- approximate quantiles

def _compact_weighted(v: np.ndarray, w: np.ndarray, m: int):
    """Compress weighted points (v sorted ascending) to <= m strata of
    ~equal weight; each stratum is represented by its weighted-middle
    element carrying the stratum's total weight. Deterministic (no RNG —
    results are reproducible across retries); rank error added per
    compaction <= total_weight / (2m)."""
    if len(v) <= m:
        return v, w
    cw = np.cumsum(w)
    total = cw[-1]
    bounds = total * (np.arange(1, m + 1) / m)
    ends = np.searchsorted(cw, bounds - 1e-9) + 1
    starts = np.concatenate(([0], ends[:-1]))
    keep = starts < ends
    starts, ends = starts[keep], ends[keep]
    prev = np.concatenate(([0.0], cw))[starts]
    sw = cw[ends - 1] - prev
    mids = np.searchsorted(cw, prev + sw / 2.0)
    return v[np.minimum(mids, len(v) - 1)], sw


def approx_quantile_values(ds, value: str, qs,
                           summary: int = 256, fanin: int = 32) -> "np.ndarray":
    """Distributed approximate quantiles via mergeable weighted
    summaries (a deterministic one-compactor KLL relative): each batch
    collapses to <= ``summary`` (value, weight) strata, summaries
    tree-merge through a ``fanin``-way groupby compaction, and the root
    reads <= fanin * summary weighted points. Rank error is bounded by
    (#compaction levels) * n / (2 * summary) — ~1% of n at the defaults
    — and the pytest pins the observed error against exact quantiles.
    Returns the raw value array for fractions ``qs`` (also the boundary
    supplier for sample-partitioned sorts, e.g. _enumerated_orders)."""

    def partial(t: pa.Table) -> pa.Table:
        v = np.sort(t[value].to_numpy(zero_copy_only=False).astype(np.float64))
        cv, cw = _compact_weighted(v, np.ones(len(v)), summary)
        salt = int(len(v) % fanin)
        return pa.table({
            "_s": pa.array([salt], pa.int64()),
            "_v": pa.array([cv.tolist()], pa.list_(pa.float64())),
            "_w": pa.array([cw.tolist()], pa.list_(pa.float64())),
        })

    def merge_level(g: pa.Table) -> pa.Table:
        v = np.concatenate([np.asarray(x) for x in g["_v"].to_pylist()])
        w = np.concatenate([np.asarray(x) for x in g["_w"].to_pylist()])
        o = np.argsort(v, kind="stable")
        cv, cw = _compact_weighted(v[o], w[o], summary)
        return pa.table({
            "_s": pa.array([0], pa.int64()),
            "_v": pa.array([cv.tolist()], pa.list_(pa.float64())),
            "_w": pa.array([cw.tolist()], pa.list_(pa.float64())),
        })

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("_s").map_groups(merge_level, batch_format="pyarrow")
              .take_all())  # <= fanin summary rows — parallelism-sized
    v = np.concatenate([np.asarray(r["_v"]) for r in merged])
    w = np.concatenate([np.asarray(r["_w"]) for r in merged])
    o = np.argsort(v, kind="stable")
    v, w = v[o], w[o]
    cw = np.cumsum(w)
    total = cw[-1]
    idx = np.minimum(np.searchsorted(cw, np.asarray(qs) * total), len(v) - 1)
    return v[idx]


def approx_quantiles(ds, value: str, qs=(0.5, 0.9, 0.99),
                     summary: int = 256, fanin: int = 32) -> dict:
    """p-labelled dict wrapper over approx_quantile_values. Approximate
    BY DESIGN: no SQL oracle (value_quantiles is the exact cousin for
    discrete columns)."""
    vals = approx_quantile_values(ds, value, qs, summary, fanin)
    return {f"p{int(q * 100)}": float(x) for q, x in zip(qs, vals)}


# --------------------------------------------------- Misra-Gries summary

def _mg_trim(tokens: np.ndarray, counts: np.ndarray, k: int):
    """Reduce a (token, count) frequency table to ≤ k counters by the
    Misra-Gries rule: subtract the (k+1)-th largest count from every
    counter and drop the non-positive ones. Each such decrement charges
    at most 1 per unit of stream mass to any single token, so after any
    sequence of trims/merges est(t) ∈ [true(t) - n/(k+1), true(t)]."""
    if len(tokens) <= k:
        return tokens, counts
    order = np.argsort(-counts, kind="stable")
    thresh = counts[order[k]]
    keep = counts > thresh
    return tokens[keep], counts[keep] - thresh


def mg_heavy_hitters(ds, text_col: str = "text", k: int = 64):
    """Exact-memory-bound corpus heavy hitters: each batch reduces its
    token counts to a ≤ k-counter Misra-Gries summary, summaries sum
    through ONE small groupby (shuffle volume ≤ k rows per batch, the
    deterministic counterpart of cms_token_counts' sketch+candidates),
    and a single root task applies the final trim. Deterministic
    one-sided bound: every token with true count > n_total/(k+1) is
    present, with est ≤ true and true - est ≤ n_total/(k+1).
    Approximate BY DESIGN (no SQL oracle — DuckDB has no MG); the
    pytest pins the bound against exact counts. Returns (token, est_n,
    n_total)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t[text_col], " "))
        vals, counts = np.unique(np.asarray(toks), return_counts=True)
        n_batch = int(counts.sum()) if len(counts) else 0
        vals, counts = _mg_trim(vals, counts.astype(np.int64), k)
        # stream mass rides a dedicated pn=0 row (a uniform batch can
        # trim to zero counters, so no real row is guaranteed to exist
        # to carry it). The carrier token value is irrelevant: mass
        # lives in its own column, pn=0 adds nothing to a colliding
        # token's count, and zero-count tokens are dropped at the root.
        # (Not None: Ray's sort-based groupby can't order null string
        # keys.)
        return pa.table({
            "token": pa.array(vals.tolist() + [""], pa.string()),
            "pn": pa.array(np.append(counts, 0), pa.int64()),
            "pm": pa.array([0] * len(vals) + [n_batch], pa.int64()),
        })

    summed = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("token").aggregate(Sum("pn", alias_name="c"),
                                          Sum("pm", alias_name="m")))

    def root_trim(g: pa.Table) -> pa.Table:
        n_total = int(g["m"].to_numpy(zero_copy_only=False).sum())
        g = g.filter(pc.greater(g["c"], 0))  # drop pure mass-carrier rows
        toks = np.asarray(g["token"].to_pylist())
        counts = g["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks, counts = _mg_trim(toks, counts, k)
        order = np.lexsort((toks, -counts))
        return pa.table({
            "token": pa.array(toks[order].tolist(), pa.string()),
            "est_n": pa.array(counts[order], pa.int64()),
            "n_total": pa.array([n_total] * len(order), pa.int64()),
        })

    const = summed.map_batches(
        lambda t: t.append_column(
            "_g", pa.array(np.zeros(t.num_rows, np.int64))),
        batch_format="pyarrow")
    return const.groupby("_g").map_groups(
        lambda t: root_trim(t.drop_columns(["_g"])),
        batch_format="pyarrow")


def hll_overlap(ds, group: str, value: str, a, b):
    """Approximate |A ∩ B| / |A ∪ B| of two groups' DISTINCT value sets
    by HLL set algebra: union registers are the elementwise max of the
    two groups' merged registers (HLL union is EXACT over sketches),
    intersection comes from inclusion-exclusion |A|+|B|-|A∪B|. Error
    compounds vs a plain cardinality (the classic caveat: rse ~1.6% per
    term, so small true overlaps can even go negative — clamped at 0);
    approximate BY DESIGN, pytest pins tolerance vs exact. Returns a
    1-row table (a, b, est_a, est_b, est_union, est_inter, jaccard)."""

    def merge(g: pa.Table) -> pa.Table:
        regs = np.zeros(_M, dtype=np.uint8)
        for blob in g["_regs"].to_pylist():
            np.maximum(regs, np.frombuffer(blob, dtype=np.uint8), out=regs)
        return pa.table({
            group: g[group].slice(0, 1),
            "_regs": pa.array([regs.tobytes()], pa.binary()),
        })

    import pyarrow.compute as pc

    filtered = ds.map_batches(
        lambda t: t.filter(pc.is_in(t[group], pa.array([a, b]))),
        batch_format="pyarrow")
    partials = filtered.map_batches(
        lambda t: hll_partial_batch(t, group, value),
        batch_format="pyarrow")
    merged = partials.groupby(group).map_groups(
        merge, batch_format="pyarrow").take_all()  # exactly 2 rows
    blobs = {r[group]: np.frombuffer(r["_regs"], dtype=np.uint8)
             for r in merged}
    ra = blobs.get(a, np.zeros(_M, np.uint8))
    rb = blobs.get(b, np.zeros(_M, np.uint8))
    ea, eb = _estimate(ra), _estimate(rb)
    eu = _estimate(np.maximum(ra, rb))
    ei = max(0, ea + eb - eu)
    return pa.table({
        "a": pa.array([a], pa.string()),
        "b": pa.array([b], pa.string()),
        "est_a": pa.array([ea], pa.int64()),
        "est_b": pa.array([eb], pa.int64()),
        "est_union": pa.array([eu], pa.int64()),
        "est_inter": pa.array([ei], pa.int64()),
        "jaccard": pa.array([round(ei / eu, 6) if eu else 0.0],
                            pa.float64()),
    })


def cms_join_size(left, right, left_on: str, right_on: str) -> dict:
    """Approximate |left ⋈ right| on an equality key WITHOUT running the
    join — the inner product of the two sides' CountMin sketches (for
    each CMS row, Σ_cell l[cell]·r[cell]; take the MIN over rows). The
    cardinality-estimation primitive a distributed optimizer consults
    before choosing broadcast vs shuffle. Never underestimates
    (one-sided, like CMS point queries); expected overestimate ≤
    |L|·|R|/w per row. Each side streams once into 128-KiB mergeable
    partials; nothing key-sized moves. Approximate BY DESIGN — pytest
    pins the one-sided bound and tolerance vs the exact join size."""

    def side_sketch(ds, col) -> np.ndarray:
        def partial(t: pa.Table) -> pa.Table:
            h = _hash_values(t[col])
            return pa.table({
                "_s": pa.array([int(h[0] % 16) if len(h) else 0],
                               pa.int64()),
                "_cms": pa.array([cms_partial_batch(h)], pa.binary()),
            })

        def merge_level(g: pa.Table) -> pa.Table:
            sk = cms_merge(g["_cms"].to_pylist())
            return pa.table({"_s": pa.array([0], pa.int64()),
                             "_cms": pa.array([sk.tobytes()], pa.binary())})

        rows = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("_s").map_groups(merge_level,
                                          batch_format="pyarrow")
                .take_all())  # <= 16 blobs
        return cms_merge(r["_cms"] for r in rows)

    sl = side_sketch(left, left_on)
    sr = side_sketch(right, right_on)
    per_row = (sl * sr).sum(axis=1)
    return {"est_join_rows": int(per_row.min()),
            "n_left": int(sl[0].sum()), "n_right": int(sr[0].sum())}

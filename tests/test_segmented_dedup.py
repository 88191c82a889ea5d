"""Direct unit pins for the segmented dedup machinery (the end-to-end
oracles cover the pipelines; these shrink any failure to the pairing
kernel itself)."""

import itertools

import numpy as np
import pyarrow as pa
import pytest


def test_popcount64_matches_python():
    from odinson_ray.stages.dedup import _popcount64

    rng = np.random.RandomState(0)
    xs = rng.randint(0, 2**63, size=1000, dtype=np.int64).astype(np.uint64)
    xs[:3] = [0, 1, np.uint64(2**64 - 1)]
    got = _popcount64(xs)
    want = np.array([bin(int(x)).count("1") for x in xs], dtype=np.int64)
    assert (got == want).all()


def test_segmented_band_pairs_matches_bruteforce(ray_session):
    import ray.data as rd

    from odinson_ray.stages.dedup import segmented_band_pairs

    rng = np.random.RandomState(1)
    n = 2000
    bid = rng.randint(0, 4, n).astype(np.int32)
    bh = np.array(["h%d" % h for h in rng.randint(0, 300, n)], dtype=object)
    did = rng.randint(0, 200, n).astype(np.int64)
    t = pa.table({"band_id": pa.array(bid, pa.int32()),
                  "band_hash": pa.array(bh, pa.string()),
                  "doc_id": pa.array(did, pa.int64())})
    got = {(r["a_id"], r["b_id"])
           for r in segmented_band_pairs(rd.from_arrow(t)).take_all()}

    want = set()
    buckets = {}
    for b, h, d in zip(bid, bh, did):
        buckets.setdefault((b, h), set()).add(int(d))
    for ids in buckets.values():
        for a, b in itertools.combinations(sorted(ids), 2):
            want.add((a, b))
    assert got == want


def test_segmented_hamming_pairs_matches_bruteforce(ray_session):
    import ray.data as rd

    from odinson_ray.stages.dedup import segmented_hamming_pairs

    rng = np.random.RandomState(2)
    n = 800
    blk = rng.randint(0, 8, n).astype(np.int32)
    sub = rng.randint(0, 16, n).astype(np.int32)
    did = rng.randint(0, 150, n).astype(np.int64)
    h = rng.randint(0, 2**63, n, dtype=np.int64).astype(np.uint64)
    t = pa.table({"blk": pa.array(blk, pa.int32()),
                  "sub": pa.array(sub, pa.int32()),
                  "doc_id": pa.array(did, pa.int64()),
                  "h": pa.array(h, pa.uint64())})
    MAXH = 40
    got = {(r["a_id"], r["b_id"], r["hamming"])
           for r in segmented_hamming_pairs(rd.from_arrow(t),
                                            MAXH).take_all()}

    buckets = {}
    for b, s, d, hh in zip(blk, sub, did, h):
        buckets.setdefault((b, s), []).append((int(d), int(hh)))
    want = set()
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for k in range(i + 1, len(ms)):
                a, ha = ms[i]
                b, hb = ms[k]
                d = bin(ha ^ hb).count("1")
                if d <= MAXH:
                    want.add((a, b, d))
    assert got == want


def test_segmented_window_pairs_cap(ray_session):
    """A hot window above the cap drops loudly; cold windows still pair."""
    import ray.data as rd

    from odinson_ray.stages.dedup import segmented_window_pairs

    rows = [("hot", d) for d in range(20)] + [("cold", 1), ("cold", 2)]
    t = pa.table({"w": pa.array([r[0] for r in rows], pa.string()),
                  "doc_id": pa.array([r[1] for r in rows], pa.int64())})
    got = {(r["doc_a"], r["doc_b"])
           for r in segmented_window_pairs(rd.from_arrow(t),
                                           max_window_docs=10).take_all()}
    assert got == {(1, 2)}
    # no cap: the hot window pairs quadratically
    got2 = segmented_window_pairs(rd.from_arrow(t), None).count()
    assert got2 == 20 * 19 // 2 + 1

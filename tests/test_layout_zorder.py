"""Z-order 2-D data skipping and bucketed-layout compaction."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_spread16_interleave():
    from odinson_ray.stages.layout import _spread16

    # bit i of v lands at bit 2i
    v = np.array([0, 1, 2, 3, 0xFFFF], dtype=np.uint64)
    s = _spread16(v)
    assert s[0] == 0 and s[1] == 1 and s[2] == 4 and s[3] == 5
    assert s[4] == 0x55555555
    # interleave of (x, y) is monotone in each coordinate holding the
    # other fixed
    x = _spread16(np.arange(100, dtype=np.uint64))
    assert (np.diff(x.astype(np.int64)) > 0).all()


def test_zorder_scan_skips_files(tmp_path, monkeypatch):
    monkeypatch.setenv("ODINSON_RAY_ANN_CACHE", str(tmp_path / "cache"))
    import odinson_ray.stages.layout as layout

    monkeypatch.setattr(layout, "_CACHE_ROOT", str(tmp_path / "cache"))

    rng = np.random.default_rng(7)
    n = 20_000
    df = pd.DataFrame({
        "o_custkey": rng.integers(0, 10_000, n),
        "o_orderdate": pd.to_datetime("1992-01-01")
        + pd.to_timedelta(rng.integers(0, 2500, n), unit="D"),
        "o_totalprice": rng.uniform(10, 1000, n).round(2),
    })
    src = str(tmp_path / "orders.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), src)

    root = layout.zorder_layout(src, "o_custkey", "o_orderdate",
                                ["o_custkey", "o_orderdate",
                                 "o_totalprice"], n_shards=16)
    x_lo, x_hi = 1000, 2000
    y_lo = np.datetime64("1995-01-01", "us").astype("datetime64[us]")
    y_hi = np.datetime64("1996-01-01", "us").astype("datetime64[us]")
    y_lo_us, y_hi_us = int(y_lo.astype(np.int64)), int(y_hi.astype(np.int64))

    ds, n_read, n_total = layout.zorder_scan(root, x_lo, x_hi,
                                             y_lo_us, y_hi_us)
    # the whole point: a small rectangle must not open every file
    assert n_total >= 14
    assert n_read < n_total
    # exactness: residual-filtered scan == direct filter on the source
    got = ds.to_pandas()
    d = got["o_orderdate"].astype("datetime64[us]").astype(np.int64)
    got = got[(got.o_custkey >= x_lo) & (got.o_custkey < x_hi)
              & (d >= y_lo_us) & (d < y_hi_us)]
    exp = df[(df.o_custkey >= x_lo) & (df.o_custkey < x_hi)
             & (df.o_orderdate >= pd.Timestamp("1995-01-01"))
             & (df.o_orderdate < pd.Timestamp("1996-01-01"))]
    assert len(got) == len(exp)
    assert np.isclose(got.o_totalprice.sum(), exp.o_totalprice.sum())


def test_compact_layout_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("ODINSON_RAY_ANN_CACHE", str(tmp_path / "cache"))
    import ray

    import odinson_ray.stages.layout as layout

    monkeypatch.setattr(layout, "_CACHE_ROOT", str(tmp_path / "cache"))

    df = pd.DataFrame({"k": np.arange(5000) % 97,
                       "v": np.arange(5000, dtype=np.int64)})
    # many blocks -> several files per bucket
    ds = ray.data.from_pandas(df).repartition(16)
    root = layout.bucket_layout_ds(ds, "k", n_buckets=8, tag="compact-test")

    import json

    with open(os.path.join(root, "_meta.json")) as fh:
        meta = json.load(fh)
    files_before = sum(len(v) for v in meta["buckets"].values())
    assert files_before > 8  # precondition: actually fragmented

    new_root = layout.compact_layout(root)
    with open(os.path.join(new_root, "_meta.json")) as fh:
        meta2 = json.load(fh)
    files_after = sum(len(v) for v in meta2["buckets"].values())
    assert files_after <= 8
    assert meta2["key"] == "k" and meta2["n_buckets"] == 8

    # content identical (and per-bucket aggregate still runs on the
    # compacted root)
    schema = pa.schema([("k", pa.int64()), ("v", pa.int64())])

    def agg(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["k"]).aggregate([("v", "sum")])
        return g.rename_columns(["k", "s"])

    a = layout.bucketed_aggregate(root, schema, agg).to_pandas()
    b = layout.bucketed_aggregate(new_root, schema, agg).to_pandas()
    a = a.sort_values("k").reset_index(drop=True)
    b = b.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    exp = df.groupby("k").v.sum()
    assert dict(zip(b.k, b.s)) == exp.to_dict()

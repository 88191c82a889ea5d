"""Skew-safe windowed operators (stages/window.py): parity with a
single-group pandas reference under a Zipfian-hot key distribution, and
bucket-boundary edge cases (gap exactly == gap_s, session spanning many
buckets)."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _zipf_events(tmp_path, n=6000, n_users=40):
    """~45% of events belong to user 0 (the hot key), spread over 10 days
    so bucketing (1 day) genuinely splits the hot key across tasks."""
    rng = np.random.default_rng(7)
    ranks = rng.zipf(1.6, size=n)
    user = np.minimum(ranks - 1, n_users - 1).astype(np.int64)
    base = pd.Timestamp("2024-03-01")
    ts = base + pd.to_timedelta(
        np.sort(rng.integers(0, 10 * 86400, size=n)), unit="s")
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": user,
        "ts": ts.astype("datetime64[us]"),
        "value": np.round(rng.uniform(0, 100, size=n), 2),
    })
    p = tmp_path / "events.parquet"
    df.to_parquet(p, index=False)
    assert (user == 0).mean() > 0.3, "distribution not actually skewed"
    return str(p), df


def _ref_sessions(df, gap_s=1800):
    def one(g):
        g = g.sort_values(["ts", "event_id"])
        return int((g["ts"].diff().dt.total_seconds() > gap_s).sum()) + 1

    return (df.groupby("user_id").apply(one, include_groups=False)
            .rename("n_sessions").reset_index())


def test_sessionize_zipfian(tmp_path):
    import ray.data as rd

    from odinson_ray.stages.window import sessionize

    path, df = _zipf_events(tmp_path)
    got = (sessionize(rd.read_parquet(path), bucket_s=86400).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    want = _ref_sessions(df).sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_sessions": "int64"}), want.astype({"n_sessions": "int64"}))


def test_sessionize_boundary_cases(tmp_path):
    """Gap exactly == gap_s does NOT start a session (> semantics, same
    as the DuckDB oracle); one event per day for 30 days with a tiny
    bucket width is 30 sessions only when gaps exceed the threshold."""
    import ray.data as rd

    from odinson_ray.stages.window import sessionize

    base = pd.Timestamp("2024-01-01")
    rows = [
        # user 1: three events, gaps exactly 1800 s, crossing a bucket edge
        (0, 1, base + pd.Timedelta(seconds=3600 - 1800)),
        (1, 1, base + pd.Timedelta(seconds=3600)),
        (2, 1, base + pd.Timedelta(seconds=5400)),
        # user 2: a long chain, one event per bucket, gap > threshold
        *[(10 + i, 2, base + pd.Timedelta(hours=2 * i)) for i in range(12)],
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    p = tmp_path / "edge.parquet"
    df.to_parquet(p, index=False)
    got = (sessionize(rd.read_parquet(str(p)), gap_s=1800, bucket_s=3600)
           .to_pandas().set_index("user_id")["n_sessions"].to_dict())
    assert got == {1: 1, 2: 12}


def test_running_total_zipfian(tmp_path):
    import ray.data as rd

    from odinson_ray.stages.window import running_total

    path, df = _zipf_events(tmp_path)
    got = (running_total(rd.read_parquet(path), bucket_s=86400).to_pandas()
           .sort_values("event_id").reset_index(drop=True))

    ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
    ref["running_value"] = ref.groupby("user_id")["value"].cumsum().round(4)
    ref = (ref[["event_id", "user_id", "running_value"]]
           .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, ref)


def _ref_asof(ev_df, ord_df):
    """Single-group pandas reference: latest order (ts, id) <= event ts."""
    out = []
    for uid, g in ev_df.groupby("user_id"):
        o = ord_df[ord_df.user_id == uid].sort_values(["ts", "id"])
        if o.empty:
            continue
        dates = o["ts"].to_numpy()
        keys = o["id"].to_numpy()
        for eid, ts in zip(g["event_id"], g["ts"]):
            i = np.searchsorted(dates, np.datetime64(ts), side="right") - 1
            if i >= 0:
                out.append((int(eid), int(uid), int(keys[i])))
    return pd.DataFrame(out, columns=["event_id", "user_id", "last_orderkey"])


def test_asof_join_zipfian(tmp_path):
    """Zipfian-hot user + multi-bucket time range: the two-stage as-of
    join (VERDICT r03 #4) matches the single-group reference, including
    ties on order ts (max id wins), events before any order (dropped),
    and carries across empty buckets."""
    import ray.data as rd

    from odinson_ray.stages.window import asof_join_latest

    path, ev_df = _zipf_events(tmp_path)
    rng = np.random.default_rng(11)
    n_ord = 900
    ranks = rng.zipf(1.6, size=n_ord)
    uid = np.minimum(ranks - 1, 39).astype(np.int64)
    base = pd.Timestamp("2024-02-27")  # some orders BEFORE the event range
    ots = base + pd.to_timedelta(rng.integers(0, 12 * 86400, size=n_ord), unit="s")
    ord_df = pd.DataFrame({
        "user_id": uid,
        "ts": ots.astype("datetime64[us]"),
        "id": np.arange(n_ord, dtype=np.int64),
    })
    # force ts ties within one user so the max-id tie-break is exercised
    ord_df.loc[1, ["user_id", "ts"]] = ord_df.loc[0, ["user_id", "ts"]]
    ord_path = tmp_path / "orders.parquet"
    ord_df.to_parquet(ord_path, index=False)

    got = asof_join_latest(
        rd.read_parquet(path).select_columns(["event_id", "user_id", "ts"]),
        rd.read_parquet(str(ord_path)),
        key="user_id", ts="ts", ev_id="event_id", ord_id="id",
        out="last_orderkey", bucket_s=86400,
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    want = _ref_asof(ev_df, ord_df).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "last_orderkey"]], want)


def test_event_transitions_zipfian(tmp_path):
    """Transition counts match a single-group pandas reference under a
    Zipfian-hot user, including transitions across bucket boundaries and
    across EMPTY calendar buckets."""
    import ray.data as rd

    from odinson_ray.stages.window import event_transitions

    path, df = _zipf_events(tmp_path)
    rng = np.random.default_rng(3)
    df = df.copy()
    df["event_type"] = rng.choice(["a", "b", "c"], size=len(df))
    p = tmp_path / "typed.parquet"
    df.to_parquet(p, index=False)

    got = (
        event_transitions(rd.read_parquet(str(p)), bucket_s=86400)
        .to_pandas().sort_values(["from_type", "to_type"]).reset_index(drop=True)
    )
    ref = (
        df.sort_values(["user_id", "ts", "event_id"])
        .assign(next_type=lambda d: d.groupby("user_id")["event_type"].shift(-1))
        .dropna(subset=["next_type"])
        .groupby(["event_type", "next_type"]).size().rename("n").reset_index()
        .rename(columns={"event_type": "from_type", "next_type": "to_type"})
        .sort_values(["from_type", "to_type"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref.astype({"n": "int64"}))


def test_asof_join_bucket_boundaries(tmp_path):
    """Handcrafted edges: event exactly at a bucket start, order ts ==
    event ts (inclusive), multiple same-ts orders (max id wins), event
    before any order (dropped), carry across many empty buckets."""
    import ray.data as rd

    from odinson_ray.stages.window import asof_join_latest

    day = 86400
    base = pd.Timestamp("2024-01-01")  # aligned to the epoch-day grid

    def ts(days_off, secs=0):
        return (base + pd.to_timedelta(days_off * day + secs, unit="s")
                ).to_datetime64()

    orders = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2],
        "ts": [ts(0), ts(0), ts(5, 10), ts(30), ts(50)],
        "id": [10, 11, 12, 13, 20],
    })
    events = pd.DataFrame({
        "event_id": [100, 101, 102, 103, 104, 105],
        "user_id": [1, 1, 1, 1, 2, 2],
        # bucket start exactly; same ts as an order; between; far after
        "ts": [ts(1), ts(5, 10), ts(5, 5), ts(29), ts(49), ts(51)],
    })
    for df, name in ((orders, "orders"), (events, "events")):
        df.assign(ts=df["ts"].astype("datetime64[us]")).to_parquet(
            tmp_path / f"{name}.parquet", index=False)

    got = asof_join_latest(
        rd.read_parquet(str(tmp_path / "events.parquet")),
        rd.read_parquet(str(tmp_path / "orders.parquet")),
        key="user_id", ts="ts", ev_id="event_id", ord_id="id",
        out="last_orderkey", bucket_s=day,
    ).to_pandas().set_index("event_id")["last_orderkey"].to_dict()
    assert got == {
        100: 11,  # two same-ts orders: max id wins
        101: 12,  # order ts == event ts is included
        102: 11,  # 5d+5s event precedes the 5d+10s order -> carry
        103: 12,  # carry across empty buckets 6..29
        105: 20,  # user 2 after their one order
        # 104 (user 2 before any order) dropped
    }


def test_event_transitions_edge_cases(tmp_path):
    """Single-event users contribute nothing; one user entirely inside
    one bucket matches; ts ties break by event_id."""
    import ray.data as rd

    from odinson_ray.stages.window import event_transitions

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 3, 3],
        "ts": pd.to_datetime([base, base, base + pd.Timedelta("1h"),
                              base, base + pd.Timedelta("40d"),
                              base + pd.Timedelta("80d")]).astype("datetime64[us]"),
        "event_id": [2, 1, 3, 9, 5, 6],
        "event_type": ["b", "a", "c", "x", "p", "q"],
    })
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = (
        event_transitions(rd.read_parquet(str(tmp_path / "events.parquet")),
                          bucket_s=86400)
        .to_pandas().sort_values(["from_type", "to_type"]).reset_index(drop=True)
    )
    want = pd.DataFrame(
        [("a", "b", 1), ("b", "c", 1), ("p", "q", 1)],
        columns=["from_type", "to_type", "n"],
    )
    pd.testing.assert_frame_equal(got, want.astype({"n": "int64"}))

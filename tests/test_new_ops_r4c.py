"""Round-4 batch-3 operators: distributed enumeration (row_number /
NTILE), sufficient-stats correlation, fixed-width histogram."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_global_row_number_matches_pandas(sf_dir):
    from odinson_ray.pipelines.queries import q_global_row_number

    got = q_global_row_number(sf_dir).to_pandas()
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])
    want = orders.sort_values(["o_totalprice", "o_orderkey"],
                              ascending=[False, True])
    want["rn"] = np.arange(1, len(want) + 1)
    merged = got.merge(want[["o_orderkey", "rn"]], on="o_orderkey",
                       suffixes=("", "_want"))
    assert len(merged) == len(orders)
    assert (merged.rn == merged.rn_want).all()


def test_global_row_number_ties_break_on_key(tmp_path):
    """Equal prices collapse into one bucket; enumeration must still be a
    permutation ordered by the orderkey tie-break."""
    pd.DataFrame({"o_orderkey": [5, 1, 9, 3],
                  "o_totalprice": [10.0, 10.0, 10.0, 10.0]}).to_parquet(
        tmp_path / "orders.parquet")

    from odinson_ray.pipelines.queries import q_global_row_number

    got = q_global_row_number(str(tmp_path)).to_pandas().sort_values("rn")
    assert got.o_orderkey.tolist() == [1, 3, 5, 9]
    assert got.rn.tolist() == [1, 2, 3, 4]


def test_ntile_uneven_split(tmp_path):
    """n=10, k=4 -> NTILE sizes 3,3,2,2 with contiguous rn ranges."""
    pd.DataFrame({"o_orderkey": range(10),
                  "o_totalprice": np.linspace(100.0, 10.0, 10)}).to_parquet(
        tmp_path / "orders.parquet")

    from odinson_ray.pipelines.queries import q_ntile_orders

    got = q_ntile_orders(str(tmp_path)).to_pandas().sort_values("tile")
    assert got.n_orders.tolist() == [3, 3, 2, 2]
    assert got.min_rn.tolist() == [1, 4, 7, 9]
    assert got.max_rn.tolist() == [3, 6, 8, 10]


def test_corr_matches_numpy(sf_dir):
    from odinson_ray.pipelines.queries import q_corr_lineitem

    got = q_corr_lineitem(sf_dir).to_pandas()
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    for _, r in got.iterrows():
        g = li[li.l_returnflag == r.l_returnflag]
        want = np.corrcoef(g.l_quantity, g.l_extendedprice)[0, 1]
        assert abs(r.corr_qty_price - want) < 1e-5
        assert r.n == len(g)


def test_histogram_counts_and_coverage(sf_dir):
    from odinson_ray.pipelines.queries import q_value_histogram

    got = q_value_histogram(sf_dir).to_pandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    assert got.n.sum() == len(ev)
    assert got.bin.between(0, 19).all()
    lo, hi = ev.value.min(), ev.value.max()
    b = np.minimum(np.floor((ev.value.to_numpy() - lo) * 20.0
                            / (hi - lo)).astype(np.int64), 19)
    want = pd.Series(b).value_counts().sort_index()
    have = got.set_index("bin").n.sort_index()
    assert have.to_dict() == want.to_dict()

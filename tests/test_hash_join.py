"""stages/shuffle.hash_join: the groupby-based distributed join that
replaces Ray's native hash join (which crashes on empty shuffle
partitions). Exercised indirectly by dedup/canon; pinned directly here."""

import pandas as pd
import pyarrow as pa


def _ds(df):
    import ray.data as rd

    return rd.from_pandas(df)


def test_inner_join_basic(ray_session):
    from odinson_ray.stages.shuffle import hash_join

    left = _ds(pd.DataFrame({"k": [1, 2, 2, 3], "l": ["a", "b", "c", "d"]}))
    right = _ds(pd.DataFrame({"rk": [2, 2, 3, 4], "r": ["x", "y", "z", "w"]}))
    out = hash_join(left, right, on="k", right_on="rk").to_pandas()
    got = sorted(map(tuple, out[["k", "l", "r"]].itertuples(index=False)))
    assert got == [(2, "b", "x"), (2, "b", "y"), (2, "c", "x"), (2, "c", "y"),
                   (3, "d", "z")]


def test_left_outer_and_suffix(ray_session):
    from odinson_ray.stages.shuffle import hash_join

    left = _ds(pd.DataFrame({"k": [1, 2], "v": ["l1", "l2"]}))
    right = _ds(pd.DataFrame({"k": [2, 9], "v": ["r2", "r9"]}))
    out = hash_join(left, right, on="k", how="left_outer").to_pandas()
    assert set(out.columns) == {"k", "v", "v_r"}
    rows = {r.k: (r.v, r.v_r) for r in out.itertuples()}
    assert rows[1] == ("l1", None)
    assert rows[2] == ("l2", "r2")
    assert 9 not in rows


def test_empty_sides(ray_session):
    from odinson_ray.stages.shuffle import hash_join

    schema = pa.schema([("k", pa.int64()), ("v", pa.string())])
    left = _ds(pd.DataFrame({"k": pd.Series([], dtype="int64"),
                             "v": pd.Series([], dtype="object")}))
    right = _ds(pd.DataFrame({"k": [1], "v": ["r"]}))
    out = hash_join(left, right, on="k",
                    left_schema=schema, right_schema=schema)
    assert out.count() == 0
    out2 = hash_join(right, left, on="k", how="left_outer",
                     left_schema=schema, right_schema=schema).to_pandas()
    assert len(out2) == 1 and out2.iloc[0].v == "r" and out2.iloc[0].v_r is None


def test_key_type_cast(ray_session):
    from odinson_ray.stages.shuffle import hash_join

    left = _ds(pd.DataFrame({"k": pd.Series([1, 2], dtype="int64"), "l": ["a", "b"]}))
    right = _ds(pd.DataFrame({"k": pd.Series([2, 3], dtype="int32"), "r": ["x", "y"]}))
    out = hash_join(left, right, on="k").to_pandas()
    assert list(map(tuple, out[["k", "l", "r"]].itertuples(index=False))) == [(2, "b", "x")]

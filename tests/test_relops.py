"""grouped_topk: string keys, ties, and k-larger-than-group edge cases."""

import numpy as np
import pyarrow as pa
import ray.data

from kiezray.relops import grouped_topk


def test_grouped_topk_string_keys_and_ties(ray_session):
    t = pa.table(
        {
            "domain": pa.array(["a", "a", "a", "b", "b", "c"]),
            "score": pa.array([1.0, 3.0, 3.0, 2.0, 5.0, 4.0]),
            "doc": pa.array([10, 11, 12, 20, 21, 30]),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    out = (
        grouped_topk(ds, "domain", "score", k=2, tie_col="doc")
        .to_pandas()
        .sort_values(["domain", "rank"])
        .reset_index(drop=True)
    )
    # a: score 3.0 tie -> doc 11 before 12; b: 5.0 then 2.0; c: single row
    assert list(out["domain"]) == ["a", "a", "b", "b", "c"]
    assert list(out["doc"]) == [11, 12, 21, 20, 30]
    assert list(out["rank"]) == [1, 2, 1, 2, 1]


def test_grouped_topk_ascending(ray_session):
    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 2], type=pa.int64()),
            "v": pa.array([3.0, 1.0, 2.0, 9.0]),
            "id": pa.array([0, 1, 2, 3], type=pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    out = (
        grouped_topk(ds, "k", "v", k=1, descending=False, tie_col="id")
        .to_pandas()
        .sort_values("k")
    )
    assert list(out["v"]) == [1.0, 9.0]


def test_asof_join_matches_pandas_oracle(ray_session):
    """Randomized as-of join vs a driver-side pandas merge_asof, incl.
    keys above 2^32 (partitioning-invariance + no key truncation)."""
    import pandas as pd

    from kiezray.relops import asof_join

    rng = np.random.default_rng(7)
    n, m = 3000, 500
    keys = rng.integers(0, 120, n).astype(np.int64) * (1 << 33)
    left = pd.DataFrame(
        {
            "lid": np.arange(n, dtype=np.int64),
            "k": keys,
            "t": rng.integers(0, 5000, n).astype(np.int64),
        }
    )
    right = (
        pd.DataFrame(
            {
                "rk": rng.integers(0, 150, m).astype(np.int64) * (1 << 33),
                "rt": rng.integers(0, 5000, m).astype(np.int64),
                "val": rng.normal(size=m),
            }
        )
        .groupby(["rk", "rt"], as_index=False)
        .agg(val=("val", "max"))
    )
    got = (
        asof_join(
            ray.data.from_pandas(left).repartition(5),
            ray.data.from_pandas(right).repartition(3),
            "k", "rk", "t", "rt",
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("rt"),
        left_on="t", right_on="rt", left_by="k", right_by="rk",
        direction="backward",
    )
    exp = (
        exp[exp["rt"].notna()]
        .astype({"rk": np.int64, "rt": np.int64})
        .sort_values("lid")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(got.columns)])
    assert got["k"].dtype == np.int64 and got["rk"].dtype == np.int64


def test_asof_join_forward_and_left(ray_session):
    import pandas as pd

    from kiezray.relops import asof_join

    left = pd.DataFrame(
        {"lid": [0, 1, 2], "k": [1, 1, 2], "t": [10, 99, 10]}
    ).astype(np.int64)
    right = pd.DataFrame({"rk": [1, 1], "rt": [20, 50], "v": [0.5, 0.9]})
    right["rk"] = right["rk"].astype(np.int64)
    right["rt"] = right["rt"].astype(np.int64)
    got = (
        asof_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            "k", "rk", "t", "rt",
            how="left", direction="forward",
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    # lid 0: next rt >= 10 is 20 (v=0.5); lid 1: none forward; lid 2: no key
    assert len(got) == 3
    assert got.loc[0, "v"] == 0.5
    assert np.isnan(got.loc[1, "v"]) and np.isnan(got.loc[2, "v"])


def test_semi_anti_join_string_keys(ray_session):
    from kiezray.relops import semi_join

    left = pa.table(
        {
            "doc": pa.array(["a", "b", "c", "d"]),
            "n": pa.array([1, 2, 3, 4], type=pa.int64()),
        }
    )
    right = pa.table({"seen": pa.array(["b", "d", "zz"])})
    lds = ray.data.from_arrow(left).repartition(2)
    rds = ray.data.from_arrow(right)
    semi = semi_join(lds, rds, "doc", "seen").to_pandas()
    anti = semi_join(lds, rds, "doc", "seen", anti=True).to_pandas()
    assert sorted(semi["doc"]) == ["b", "d"]
    assert sorted(anti["doc"]) == ["a", "c"]
    assert anti["n"].dtype == np.int64

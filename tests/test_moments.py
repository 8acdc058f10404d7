"""Unit tests: moment-based operators (zscore, corr, histogram, rollup)
and the per-key LAG operator / duplicate-ngram discovery."""

import numpy as np
import pandas as pd
import pytest
import ray

from kiezray.moments import (
    grouped_moments,
    pearson_corr,
    rollup_sum_count,
    value_histogram,
    zscore,
)
from kiezray.textops import dup_ngrams
from kiezray.windows import event_gaps


def test_grouped_moments_matches_numpy():
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {"k": rng.integers(0, 5, 500), "v": rng.normal(3, 2, 500)}
    )
    got = grouped_moments(
        ray.data.from_pandas(df).repartition(7), "k", "v"
    ).sort_values("k").reset_index(drop=True)
    for _, row in got.iterrows():
        sub = df[df["k"] == row["k"]]["v"].to_numpy()
        assert row["n"] == len(sub)
        assert row["mean"] == pytest.approx(sub.mean(), abs=1e-9)
        assert row["sd"] == pytest.approx(sub.std(), abs=1e-9)


def test_zscore_constant_key_is_zero():
    df = pd.DataFrame(
        {"id": np.arange(6), "k": [0, 0, 0, 1, 1, 2],
         "v": [5.0, 5.0, 5.0, 1.0, 3.0, 9.0]}
    )
    out = (
        zscore(ray.data.from_pandas(df).repartition(3), "k", "v", "id")
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    # constant key -> sd 0 -> z 0; singleton key -> z 0
    assert np.allclose(out["z"][:3], 0.0)
    assert out["z"][5] == 0.0
    assert out["z"][3] == pytest.approx(-1.0)
    assert out["z"][4] == pytest.approx(1.0)


def test_pearson_corr_matches_numpy():
    rng = np.random.default_rng(11)
    x = rng.normal(size=400)
    y = 0.6 * x + rng.normal(scale=0.5, size=400)
    df = pd.DataFrame({"x": x, "y": y})
    got = pearson_corr(ray.data.from_pandas(df).repartition(5), "x", "y")
    assert got["corr"][0] == pytest.approx(np.corrcoef(x, y)[0, 1], abs=1e-9)
    assert got["n"][0] == 400


def test_value_histogram_negative_values():
    df = pd.DataFrame({"v": [-10.1, -0.1, 0.0, 4.9, 5.0, 14.9]})
    got = (
        value_histogram(ray.data.from_pandas(df).repartition(3), "v", 5.0)
        .to_pandas().sort_values("bin").reset_index(drop=True)
    )
    want = {-3: 1, -1: 1, 0: 2, 1: 1, 2: 1}
    assert dict(zip(got["bin"], got["n"])) == want


def test_rollup_levels_sum_consistently():
    df = pd.DataFrame(
        {"a": ["x", "x", "y", "y"], "b": ["p", "q", "p", "p"],
         "v": [1.0, 2.0, 3.0, 4.0]}
    )
    out = rollup_sum_count(ray.data.from_pandas(df), ["a", "b"], "v")
    total = out[(out["a"] == "ALL") & (out["b"] == "ALL")]
    assert total["s"].iloc[0] == 10.0 and total["c"].iloc[0] == 4
    xlvl = out[(out["a"] == "x") & (out["b"] == "ALL")]
    assert xlvl["s"].iloc[0] == 3.0 and xlvl["c"].iloc[0] == 2
    assert len(out) == 3 + 2 + 1  # finest + per-a + grand total


def test_event_gaps_first_event_omitted_and_ordered():
    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:00:05",
         "2024-01-01 00:00:05", "2024-01-01 00:01:00"]
    )
    df = pd.DataFrame(
        {"event_id": [10, 11, 12, 20], "user_id": [1, 1, 1, 2], "ts": ts}
    )
    out = (
        event_gaps(ray.data.from_pandas(df).repartition(2))
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    # user 2 has one event -> no row; equal-ts tie breaks by event_id
    assert list(out["event_id"]) == [11, 12]
    assert list(out["gap_us"]) == [5_000_000, 0]


def test_dup_ngrams_counts_distinct_docs():
    docs = pd.DataFrame(
        {
            "text": [
                "the quick brown fox",
                "a the quick brown dog",
                "the quick brown fox jumps",
                "short one",
                "",
            ]
        }
    )
    out = dup_ngrams(ray.data.from_pandas(docs).repartition(3), n=3, k=10)
    m = dict(zip(out["ngram"], out["n_docs"]))
    assert m["the quick brown"] == 3
    assert m["quick brown fox"] == 2
    # within-doc repeats don't inflate the distinct-doc count
    assert all(v >= 2 for v in m.values())

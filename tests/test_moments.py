"""Unit tests: moment-based operators (zscore, corr, histogram, rollup)
and the per-key LAG operator / duplicate-ngram discovery."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

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


def test_triangle_count_matches_bruteforce():
    import itertools

    from kiezray.cluster import triangle_count

    rng = np.random.default_rng(3)
    n_nodes = 40
    a = rng.integers(0, n_nodes, 300)
    b = rng.integers(0, n_nodes, 300)
    edges = pd.DataFrame({"a": a, "b": b})
    adj = {}
    for x, y in zip(a.tolist(), b.tolist()):
        if x == y:
            continue
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    want = sum(
        1
        for u, v, w in itertools.combinations(sorted(adj), 3)
        if v in adj[u] and w in adj[u] and w in adj[v]
    )
    got = triangle_count(ray.data.from_pandas(edges).repartition(5))
    assert got == want and want > 0


def test_bloom_semi_join_equals_exact_semi_join():
    from kiezray.relops import bloom_semi_join, semi_join

    rng = np.random.default_rng(5)
    left = pd.DataFrame(
        {"k": rng.integers(0, 1000, 5000), "v": np.arange(5000)}
    )
    right = pd.DataFrame({"rk": rng.integers(0, 100, 200)})
    lds = ray.data.from_pandas(left).repartition(4)
    rds = ray.data.from_pandas(right).repartition(2)
    got = (
        bloom_semi_join(lds, rds, "k", "rk", m_bits=1 << 12)
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    )
    want = (
        semi_join(lds, rds, "k", "rk")
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_grouped_mad_string_keys():
    from kiezray.quantile import grouped_mad

    df = pd.DataFrame(
        {"k": ["x"] * 5 + ["y"] * 4,
         "v": [1.0, 2.0, 3.0, 4.0, 100.0, 10.0, 10.0, 10.0, 10.0]}
    )
    out = (
        grouped_mad(ray.data.from_pandas(df).repartition(3), "k", "v")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    # x: sorted [1,2,3,4,100] -> med 3 (rank ceil(2.5)-1=2), absdev
    # [2,1,0,1,97] sorted [0,1,1,2,97] -> mad 1
    assert out.loc[0, "med"] == 3.0 and out.loc[0, "mad"] == 1.0
    # y: even n=4 -> disc rank ceil(2)-1 = 1 -> 10; mad 0
    assert out.loc[1, "med"] == 10.0 and out.loc[1, "mad"] == 0.0


def test_pmi_bigrams_ranks_collocation_first():
    from kiezray.textops import pmi_bigrams

    docs = pd.DataFrame(
        {
            "text": ["hong kong is big", "i went to hong kong", "hong kong"]
            * 3
            + ["the of and is to the of and is to"] * 6
        }
    )
    out = pmi_bigrams(
        ray.data.from_pandas(docs).repartition(3), min_count=3, k=5
    )
    # "i went" is the purest collocation (both words occur only here);
    # "hong kong" follows with 9 co-occurrences
    assert out.loc[0, "bigram"] == "i went"
    m = dict(zip(out["bigram"], out["n_ab"]))
    assert m["hong kong"] == 9


def test_event_sequences_order_and_determinism():
    from kiezray.windows import event_sequences

    ts = pd.to_datetime(
        ["2024-01-01 00:00:02", "2024-01-01 00:00:01",
         "2024-01-01 00:00:01", "2024-01-01 00:00:09"]
    )
    df = pd.DataFrame(
        {
            "event_id": [4, 2, 1, 9],
            "user_id": [1, 1, 1, 2],
            "ts": ts,
            "event_type": ["c", "b", "a", "x"],
        }
    )
    out = (
        event_sequences(ray.data.from_pandas(df).repartition(3))
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    # ts asc, event_id tie-break: (1,a) before (2,b), then (4,c)
    assert list(out["seq"]) == ["a,b,c", "x"]
    assert list(out["n_events"]) == [3, 1]


def test_lm_score_matches_direct_computation():
    from kiezray.textops import lm_score

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a a b", "b c", ""],
        }
    )
    out = (
        lm_score(ray.data.from_pandas(docs).repartition(2))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # corpus counts: a=2, b=2, c=1, T=5; empty doc emits no row
    T = 5.0
    want1 = (2 * np.log(2 / T) + np.log(2 / T)) / 3
    want2 = (np.log(2 / T) + np.log(1 / T)) / 2
    assert list(out["doc_id"]) == [1, 2]
    assert list(out["n_tokens"]) == [3, 2]
    assert out.loc[0, "lm_score"] == pytest.approx(want1, abs=1e-6)
    assert out.loc[1, "lm_score"] == pytest.approx(want2, abs=1e-6)


def test_grouped_corr_matches_numpy():
    from kiezray.moments import grouped_corr

    rng = np.random.RandomState(3)
    n = 4000
    key = rng.randint(0, 5, n).astype(np.int64)
    x = rng.rand(n) * 10
    y = 0.5 * x + rng.rand(n)
    ds = ray.data.from_pandas(
        pd.DataFrame({"k": key, "x": x, "y": y})
    ).repartition(6)
    got = grouped_corr(ds, "k", "x", "y").set_index("k")
    for k in np.unique(key):
        m = key == k
        want = np.corrcoef(x[m], y[m])[0, 1]
        assert abs(got.loc[k, "corr"] - round(want, 6)) < 1e-6
        assert got.loc[k, "n"] == m.sum()


def test_contingency_chi2_matches_direct():
    from kiezray.moments import contingency_chi2

    rng = np.random.RandomState(7)
    n = 3000
    a = rng.choice(["x", "y", "z"], n)
    b = rng.choice(["p", "q"], n, p=[0.3, 0.7])
    ds = ray.data.from_pandas(pd.DataFrame({"a": a, "b": b})).repartition(5)
    got = contingency_chi2(ds, "a", "b")
    # direct full-table chi2 with zero cells included
    ct = pd.crosstab(pd.Series(a), pd.Series(b)).to_numpy(dtype=float)
    e = ct.sum(1)[:, None] * ct.sum(0)[None, :] / ct.sum()
    want = ((ct - e) ** 2 / e).sum()
    assert abs(got["chi2"][0] - round(want, 6)) < 1e-6
    assert got["dof"][0] == (3 - 1) * (2 - 1)
    assert got["n"][0] == n


def test_grouped_regression_matches_polyfit():
    from kiezray.moments import grouped_regression

    rng = np.random.RandomState(9)
    n = 3000
    key = rng.randint(0, 4, n).astype(np.int64)
    x = rng.rand(n) * 10
    y = 2.5 * x - 3.0 + rng.randn(n)
    ds = ray.data.from_pandas(
        pd.DataFrame({"k": key, "x": x, "y": y})
    ).repartition(5)
    got = grouped_regression(ds, "k", "x", "y").set_index("k")
    for k in np.unique(key):
        m = key == k
        slope, intercept = np.polyfit(x[m], y[m], 1)
        assert abs(got.loc[k, "slope"] - slope) < 1e-6
        assert abs(got.loc[k, "intercept"] - intercept) < 1e-6
        r = np.corrcoef(x[m], y[m])[0, 1]
        assert abs(got.loc[k, "r2"] - r * r) < 1e-6


def test_mutual_information_bounds_and_identity():
    """MI of a column with itself equals its entropy; MI of independent
    block-constant columns is ~0; result is partition-invariant."""
    from kiezray.moments import mutual_information

    rng = np.random.RandomState(7)
    n = 4000
    a = rng.choice(np.array(["x", "y", "z"]), n, p=[0.5, 0.3, 0.2])
    b = rng.choice(np.array(["p", "q"]), n)
    t = pa.table({"lang": pa.array(a), "source": pa.array(b)})
    ds = ray.data.from_arrow(t).repartition(5)
    mi_ind = mutual_information(ds, "lang", "source")["mi"].iloc[0]
    assert 0 <= mi_ind < 0.01
    t2 = pa.table({"lang": pa.array(a), "source": pa.array(a)})
    mi_self = mutual_information(
        ray.data.from_arrow(t2).repartition(3), "lang", "source"
    )["mi"].iloc[0]
    _, counts = np.unique(a, return_counts=True)
    p = counts / n
    ent = float(-(p * np.log(p)).sum())
    assert abs(mi_self - ent) < 1e-6


def test_grouped_skew_kurt_matches_scipy_style_oracle():
    """Bias-corrected skewness/kurtosis per key match a local pandas
    oracle (pandas .skew()/.kurt() use the same estimators as DuckDB)."""
    import pandas as pd

    from kiezray.moments import grouped_skew_kurt

    rng = np.random.RandomState(3)
    key = rng.randint(0, 4, 3000)
    val = rng.gamma(2.0, 3.0, 3000)  # skewed on purpose
    ds = ray.data.from_arrow(
        pa.table({"k": key, "v": val})
    ).repartition(7)
    got = grouped_skew_kurt(ds, "k", "v").set_index("k")
    df = pd.DataFrame({"k": key, "v": val})
    want_s = df.groupby("k")["v"].skew()
    want_k = df.groupby("k")["v"].apply(lambda s: s.kurt())
    for k in want_s.index:
        assert abs(got.loc[k, "skew"] - want_s[k]) < 1e-5
        assert abs(got.loc[k, "kurt"] - want_k[k]) < 1e-5
        assert got.loc[k, "n"] == (key == k).sum()


def test_bcubed_perfect_and_degenerate():
    """B-cubed is 1.0 for identical clusterings; precision collapses to
    the largest-class share for the all-in-one-cluster prediction."""
    from kiezray.moments import bcubed

    rng = np.random.RandomState(5)
    gold = rng.choice(np.array(["a", "b", "c"]), 1000, p=[0.5, 0.3, 0.2])
    t = pa.table({"p": pa.array(gold), "g": pa.array(gold)})
    r = bcubed(ray.data.from_arrow(t).repartition(4), "p", "g")
    assert r["bcubed_precision"].iloc[0] == 1.0
    assert r["bcubed_recall"].iloc[0] == 1.0
    assert r["bcubed_f1"].iloc[0] == 1.0
    one = pa.table(
        {"p": pa.array(np.zeros(1000, dtype=np.int64)), "g": pa.array(gold)}
    )
    r2 = bcubed(ray.data.from_arrow(one).repartition(4), "p", "g")
    _, counts = np.unique(gold, return_counts=True)
    want_p = float((counts**2).sum()) / (1000.0 * 1000.0)
    assert abs(r2["bcubed_precision"].iloc[0] - want_p) < 1e-6
    assert r2["bcubed_recall"].iloc[0] == 1.0


def test_profile_numeric_exact():
    import pandas as pd

    from kiezray.moments import profile_numeric

    rng = np.random.RandomState(13)
    a = rng.randint(0, 50, 3000).astype(np.float64)
    b = np.round(rng.rand(3000) * 10, 2)
    b[rng.choice(3000, 40, replace=False)] = np.nan
    ds = ray.data.from_arrow(pa.table({"a": a, "b": b})).repartition(6)
    got = profile_numeric(ds, ["a", "b"]).set_index("column")
    assert got.loc["a", "n"] == 3000 and got.loc["a", "nulls"] == 0
    assert got.loc["a", "n_distinct"] == len(np.unique(a))
    assert got.loc["a", "vmin"] == a.min()
    assert got.loc["a", "vmax"] == a.max()
    assert got.loc["b", "nulls"] == 40
    bb = b[~np.isnan(b)]
    assert got.loc["b", "n_distinct"] == len(np.unique(bb))
    assert abs(got.loc["b", "vmin"] - bb.min()) < 1e-12
    assert abs(got.loc["b", "vmax"] - bb.max()) < 1e-12


def test_grouped_geomean_bruteforce():
    from kiezray.moments import grouped_geomean

    rng = np.random.RandomState(3)
    n = 2500
    key = rng.randint(0, 7, n).astype(np.int64)
    v = rng.uniform(0.01, 300.0, n)
    df = pd.DataFrame({"k": key, "v": v})
    got = grouped_geomean(ray.data.from_pandas(df).repartition(4), "k", "v")
    for i, kk in enumerate(got["k"]):
        m = key == kk
        assert got["n"].iloc[i] == int(m.sum())
        assert abs(
            got["geo_mean"].iloc[i] - np.exp(np.log(v[m]).mean())
        ) < 1e-5
        assert abs(
            got["harm_mean"].iloc[i] - m.sum() / (1.0 / v[m]).sum()
        ) < 1e-5


def test_grouped_weighted_avg_exact():
    from kiezray.moments import grouped_weighted_avg

    rng = np.random.RandomState(23)
    n = 3000
    key = rng.randint(0, 5, n).astype(np.int64)
    v = np.round(rng.uniform(1, 1000, n), 2)
    w = rng.randint(1, 50, n).astype(np.float64)
    df = pd.DataFrame({"k": key, "v": v, "w": w})
    got = grouped_weighted_avg(
        ray.data.from_pandas(df).repartition(4), "k", "v", "w"
    )
    for i, kk in enumerate(got["k"]):
        m = key == kk
        assert got["total_w"].iloc[i] == int(w[m].sum())
        want = (v[m] * w[m]).sum() / w[m].sum()
        assert abs(got["wavg"].iloc[i] - want) < 1e-6


def test_grouped_centroid_exact_and_partition_invariant(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from kiezray.moments import grouped_centroid

    rng = np.random.RandomState(3)
    n, d = 400, 8
    X = rng.randn(n, d).astype(np.float32)
    lab = rng.randint(0, 5, n).astype(np.int32)
    t = pa.table(
        {"label": pa.array(lab),
         "embedding": pa.array(list(X), pa.list_(pa.float32()))}
    )
    # local oracle: identical 1e-6 quantization + integer half-away mean
    terms = np.sign(X.astype(np.float64) * 1e6) * np.floor(
        np.abs(X.astype(np.float64) * 1e6) + 0.5
    )
    rows = []
    for g in np.unique(lab):
        s = terms[lab == g].sum(axis=0).astype(np.int64)
        cnt = int((lab == g).sum())
        mu = np.sign(s) * ((2 * np.abs(s) + cnt) // (2 * cnt))
        for j in range(d):
            rows.append((int(g), j + 1, cnt, mu[j] / 1e6))
    want = pd.DataFrame(rows, columns=["label", "dim", "n", "centroid"])
    for parts in (1, 5):
        got = grouped_centroid(
            ray.data.from_arrow(t).repartition(parts), "label", "embedding"
        )
        pd.testing.assert_frame_equal(
            got.astype({"label": np.int64, "dim": np.int64, "n": np.int64}),
            want.astype({"label": np.int64, "dim": np.int64, "n": np.int64}),
        )

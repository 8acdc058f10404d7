"""Exact distributed quantiles (histogram-refinement selection)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from kiezray.quantile import exact_quantiles


def _oracle(x: np.ndarray, q: float) -> float:
    s = np.sort(x)
    return float(s[max(int(np.ceil(q * len(x))) - 1, 0)])


def _run(x, qs, parts=7, **kw):
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(x, pa.float64())})
    ).repartition(parts)
    t = exact_quantiles(ds, "v", qs=qs, **kw)
    return dict(zip(t["q"].to_pylist(), t["value"].to_pylist()))


def test_exact_quantiles_matches_rank_formula(ray_session):
    rng = np.random.RandomState(0)
    x = np.concatenate(
        [
            rng.randn(20000) * 100,          # negatives + spread
            rng.randint(0, 50, 5000).astype(float),  # heavy duplicates
        ]
    )
    qs = (0.01, 0.25, 0.5, 0.75, 0.99)
    # tiny bins/threshold force several refinement rounds
    got = _run(x, qs, num_bins=16, collect_threshold=128)
    for q in qs:
        assert got[q] == _oracle(x, q), q


def test_exact_quantiles_partition_invariant(ray_session):
    rng = np.random.RandomState(3)
    x = rng.rand(30000) * 1e6
    a = _run(x, (0.5, 0.9), parts=3, num_bins=32, collect_threshold=256)
    b = _run(x, (0.5, 0.9), parts=17, num_bins=32, collect_threshold=256)
    assert a == b
    assert a[0.5] == _oracle(x, 0.5)


def test_exact_quantiles_plateau_and_tiny(ray_session):
    # all-equal column: every interval is a zero-width plateau
    x = np.full(5000, 42.5)
    got = _run(x, (0.1, 0.5, 0.9), num_bins=8, collect_threshold=64)
    assert set(got.values()) == {42.5}
    # n smaller than collect threshold: pure collect path
    y = np.array([5.0, 1.0, 3.0])
    got = _run(y, (0.5,), parts=2)
    assert got[0.5] == 3.0


def test_grouped_quantiles_matches_pandas(ray_session):
    from kiezray.quantile import grouped_quantiles

    rng = np.random.RandomState(7)
    n = 20000
    keys = rng.choice(
        np.array([3, 2**30, 2**40 + 5, 17], dtype=np.int64), n
    )
    vals = rng.rand(n) * 1000
    ds = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(keys, pa.int64()),
                "v": pa.array(vals, pa.float64()),
            }
        )
    ).repartition(6)
    got = (
        grouped_quantiles(ds, "k", "v", qs=(0.25, 0.5, 0.9))
        .to_pandas()
        .set_index(["k", "q"])["value"]
        .sort_index()
    )
    for k in np.unique(keys):
        sub = np.sort(vals[keys == k])
        for q in (0.25, 0.5, 0.9):
            want = sub[max(int(np.ceil(q * len(sub))) - 1, 0)]
            assert got.loc[(k, q)] == want, (k, q)


def test_exact_quantiles_cont_matches_numpy_linear():
    from kiezray.quantile import exact_quantiles

    rng = np.random.RandomState(5)
    v = np.round(rng.rand(5000) * 100, 1)  # heavy duplicates
    ds = ray.data.from_pandas(pd.DataFrame({"v": v})).repartition(7)
    qs = (0.0, 0.1, 0.5, 0.9, 0.999, 1.0)
    got = exact_quantiles(ds, "v", qs=qs, interp="cont").to_pandas()
    want = np.percentile(v, [q * 100 for q in qs], method="linear")
    np.testing.assert_allclose(got["value"].to_numpy(), want, atol=1e-9)


def test_exact_quantiles_cont_rejects_bad_interp():
    from kiezray.quantile import exact_quantiles

    ds = ray.data.from_pandas(pd.DataFrame({"v": [1.0, 2.0]}))
    with pytest.raises(ValueError, match="interp"):
        exact_quantiles(ds, "v", interp="nearest")


def test_weighted_median_bruteforce_partition_invariant():
    """Lower weighted median (first v with 2*cumw >= totw) matches a
    brute force, with value ties and fractional weights, and is
    identical under two different partitionings."""
    import pandas as pd

    from kiezray.quantile import weighted_median

    rng = np.random.RandomState(5)
    n = 3000
    key = rng.choice(np.array(["a", "b", "c"]), n)
    val = rng.randint(0, 40, n) / 4.0  # heavy ties
    w = rng.randint(1, 9, n) / 2.0  # fractional weights
    t = pa.table(
        {
            "k": pa.array(key),
            "v": pa.array(val),
            "w": pa.array(w),
        }
    )
    outs = []
    for parts in (3, 11):
        ds = ray.data.from_arrow(t).repartition(parts)
        outs.append(
            weighted_median(ds, "k", "v", "w")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    for k in "abc":
        m = key == k
        df = (
            pd.DataFrame({"v": val[m], "w": w[m]})
            .groupby("v", as_index=False)["w"]
            .sum()
            .sort_values("v")
        )
        cw = df["w"].cumsum().to_numpy()
        tot = cw[-1]
        want = df["v"].to_numpy()[np.flatnonzero(2 * cw >= tot)[0]]
        got = outs[0].loc[outs[0]["k"] == k, "wmedian"].iloc[0]
        assert got == want, (k, got, want)

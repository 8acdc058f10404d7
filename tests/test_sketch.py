"""Sketch operators: HLL error bounds, Misra-Gries guarantees."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from kiezray.sketch import _hll_estimate, _hll_registers, approx_distinct, heavy_hitters


def test_hll_registers_pure():
    from kiezray.dedup import _splitmix64

    # _hll_registers expects UNIFORM 64-bit hashes (what _hash_column
    # produces); mix distinct integers through splitmix64 first
    h = _splitmix64(np.arange(100000, dtype=np.uint64))
    regs = _hll_registers(h, p=12)
    est = _hll_estimate(regs)
    # all-distinct hashes: estimate within 3 standard errors
    assert abs(est - 100000) / 100000 < 3 * 1.04 / np.sqrt(4096)


def test_hll_empty_and_small():
    assert _hll_estimate(_hll_registers(np.array([], dtype=np.uint64), 12)) == 0.0
    h = np.arange(1, 50, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    est = _hll_estimate(_hll_registers(h, 12))
    assert abs(est - 49) / 49 < 0.15  # linear-counting regime


def test_approx_distinct_distributed(ray_session):
    rng = np.random.RandomState(0)
    vals = rng.randint(0, 30000, size=120000)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(16)
    est = approx_distinct(ds, "v", p=12)
    exact = len(np.unique(vals))
    assert abs(est - exact) / exact < 0.05
    # determinism
    assert approx_distinct(ds, "v", p=12) == est


def test_heavy_hitters(ray_session):
    rng = np.random.RandomState(3)
    skew = np.concatenate(
        [np.full(5000, 7), np.full(3000, 13), np.full(1000, 99),
         rng.randint(1000, 50000, size=40000)]
    )
    ds = ray.data.from_arrow(pa.table({"v": pa.array(skew)})).repartition(8)
    hh = heavy_hitters(ds, "v", k=3, capacity=2048).to_pandas()
    assert list(hh["value"]) == ["7", "13", "99"]
    n_batches_bound = len(skew) / 2048  # total MG undercount bound
    for want, got in zip([5000, 3000, 1000], hh["est_count"]):
        assert want - n_batches_bound <= got <= want


def test_approx_quantiles_rank_error_bound(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from kiezray.sketch import approx_quantiles

    rng = np.random.RandomState(19)
    n = 50_000
    vals = rng.lognormal(0.0, 1.0, n)
    df = pd.DataFrame({"id": np.arange(n), "v": vals})
    ds = ray.data.from_pandas(df).repartition(8)
    qs = (0.1, 0.5, 0.9, 0.99)
    got = approx_quantiles(ds, "id", "v", qs=qs, sample_size=4096)
    sv = np.sort(vals)
    for q, est in zip(got["q"], got["value"]):
        # rank error: the estimate's true CDF position within
        # ~4/sqrt(sample_size) of q
        rank_err = abs(np.searchsorted(sv, est) / n - q)
        assert rank_err < 4 / np.sqrt(4096), (q, rank_err)
    # deterministic: identical output under a different partitioning
    got2 = approx_quantiles(ds.repartition(3), "id", "v", qs=qs, sample_size=4096)
    assert (got["value"].to_numpy() == got2["value"].to_numpy()).all()


def test_grouped_approx_distinct_error_and_partition_invariance():
    import pandas as pd

    from kiezray.sketch import grouped_approx_distinct

    rng = np.random.RandomState(17)
    n = 30000
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], n),
            "v": rng.randint(0, 5000, n).astype(np.int64),
        }
    )
    exact = df.groupby("k")["v"].nunique()
    outs = []
    for parts in (3, 11):
        got = (
            grouped_approx_distinct(
                ray.data.from_pandas(df).repartition(parts), "k", "v"
            )
            .to_pandas()
            .set_index("k")["approx_n"]
            .sort_index()
        )
        outs.append(got)
        for k in exact.index:
            rel = abs(got[k] - exact[k]) / exact[k]
            assert rel < 0.05, (k, rel, got[k], exact[k])
    # register max-merge is partition-invariant -> identical estimates
    pd.testing.assert_series_equal(outs[0], outs[1])

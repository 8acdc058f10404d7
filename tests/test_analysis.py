"""Hubness analysis tests (mirrors reference tests/analysis/test_estimation.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from kiezray.analysis import (
    gini_index,
    hubness_score,
    hubness_score_ds,
    k_occurrence_ds,
    k_occurrence_from_matrix,
    skewness,
)
from kiezray.arrowutil import matrix_to_list


@pytest.fixture(scope="module")
def nn_ind():
    rng = np.random.RandomState(2718)
    m = rng.randint(0, 1000, size=(1000, 50)).astype(np.int64)
    # a few padding entries like ANN misses
    m[3, 40:] = -1
    m[77, 49] = -1
    return m


def test_k_occurrence_matches_bincount(nn_ind):
    occ = k_occurrence_from_matrix(nn_ind, 1000)
    flat = nn_ind.ravel()
    assert occ.sum() == (flat >= 0).sum()
    assert occ[int(nn_ind[0, 0])] >= 1


@pytest.mark.parametrize("k", [2, 5, 10, 50])
def test_hubness_score_self_consistency(nn_ind, k):
    """Reference re-derivation test pattern (test_estimation.py:77-98)."""
    res = hubness_score(
        nn_ind, 1000, k=k, return_value="all", store_k_occurrence=True
    )
    occ = res["k_occurrence"]
    trunc = nn_ind[:, :k]
    flat = trunc.ravel()
    flat = flat[flat >= 0]
    np.testing.assert_array_equal(occ, np.bincount(flat, minlength=1000))
    assert res["k_skewness"] == pytest.approx(skewness(occ))
    assert 0 <= res["robinhood"] <= 1
    assert 0 <= res["antihub_occurrence"] <= 1
    assert 0 <= res["gini"] <= 1
    # hubs hold occurrence >= 2k
    assert all(occ[h] >= 2 * k for h in res["hubs"])
    assert res["groupie_ratio"] == pytest.approx(occ.max() / 1000 / k)


def test_gini_equals_pairwise():
    rng = np.random.RandomState(0)
    x = rng.randint(0, 20, size=200)
    naive = np.abs(x.reshape(1, -1) - x.reshape(-1, 1)).sum() / (
        2 * x.size * x.sum()
    )
    assert gini_index(x) == pytest.approx(naive, rel=1e-12)


def test_k_clamp_warns(nn_ind):
    with pytest.warns(UserWarning, match="k will be set"):
        hubness_score(nn_ind, 1000, k=60, return_value="k_skewness")


def test_distributed_matches_numpy(nn_ind):
    tbl = pa.table(
        {
            "query_id": pa.array(np.arange(1000, dtype=np.int64)),
            "neigh_ids": matrix_to_list(nn_ind, pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(6)
    occ_ds = k_occurrence_ds(ds, 1000, k=10).to_pandas()
    occ_np = k_occurrence_from_matrix(nn_ind[:, :10], 1000)
    got = np.zeros(1000, dtype=np.int64)
    got[occ_ds["target_id"].to_numpy()] = occ_ds["k_occurrence"].to_numpy()
    np.testing.assert_array_equal(got, occ_np)
    assert len(occ_ds) == 1000  # zero rows included

    res_ds = hubness_score_ds(ds, 1000, 1000, k=10, return_value="all")
    res_np = hubness_score(nn_ind, 1000, k=10, return_value="all")
    for key in ("k_skewness", "robinhood", "atkinson", "gini", "hub_occurrence",
                "groupie_ratio", "antihub_occurrence", "k_skewness_truncnorm"):
        assert res_ds[key] == pytest.approx(res_np[key], rel=1e-12), key

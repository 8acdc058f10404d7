"""Small API-surface tests rounding out reference parity."""

import numpy as np
import pyarrow as pa
import pytest

from kiezray import Kiez
from kiezray.analysis import hubness_score
from kiezray.arrowutil import emb_to_matrix, matrix_to_fsl, matrix_to_list
from kiezray.metrics import norm_sf, pairwise_distances, truncnorm_third_moment


def test_return_distance_false(source_target):
    source, target = source_target
    kz = Kiez(n_candidates=6, algorithm="exact")
    kz.fit(source, target)
    ind = kz.kneighbors(3, return_distance=False)
    assert isinstance(ind, np.ndarray) and ind.shape == (20, 3)


def test_hubness_score_scalar_returns():
    rng = np.random.RandomState(0)
    nn = rng.randint(0, 100, size=(100, 10))
    for rv in ("k_skewness", "robinhood", "atkinson", "gini", "groupie_ratio"):
        v = hubness_score(nn, 100, k=10, return_value=rv)
        assert np.isscalar(v) or isinstance(v, float)
    hubs = hubness_score(nn, 100, k=10, return_value="hubs")
    assert isinstance(hubs, np.ndarray)
    with pytest.raises(ValueError, match="unknown return_value"):
        hubness_score(nn, 100, return_value="bogus")


def test_arrowutil_roundtrip():
    mat = np.arange(12, dtype=np.float64).reshape(3, 4)
    fsl = matrix_to_fsl(mat, pa.float64())
    np.testing.assert_array_equal(emb_to_matrix(fsl), mat)
    lst = matrix_to_list(mat, pa.float64())
    assert lst.to_pylist()[1] == [4.0, 5.0, 6.0, 7.0]
    # variable list column path
    col = pa.array([[1.0, 2.0], [3.0, 4.0]])
    np.testing.assert_array_equal(emb_to_matrix(col), [[1, 2], [3, 4]])
    with pytest.raises(ValueError, match="ragged"):
        emb_to_matrix(pa.array([[1.0], [1.0, 2.0]]))


def test_metrics_edge_cases():
    q = np.zeros((2, 3))
    x = np.eye(3)
    d = pairwise_distances(q, x, "cosine")
    assert np.isfinite(d).all()  # zero vectors guarded
    # sf at mu with sd=0 is the degenerate-distribution limit
    sf = norm_sf(np.array([1.0, 2.0, 3.0]), 2.0, 0.0)
    np.testing.assert_array_equal(sf, [1.0, 0.5, 0.0])
    # truncnorm third moment of untruncated normal is ~0
    assert abs(truncnorm_third_moment(-30, 30)) < 1e-9
    # chebyshev/manhattan sanity
    d1 = pairwise_distances(np.array([[0.0, 0.0]]), np.array([[3.0, 4.0]]), "l1")
    assert d1[0, 0] == 7.0
    dc = pairwise_distances(
        np.array([[0.0, 0.0]]), np.array([[3.0, 4.0]]), "chebyshev"
    )
    assert dc[0, 0] == 4.0
    dm = pairwise_distances(
        np.array([[0.0, 0.0]]), np.array([[3.0, 4.0]]), "minkowski", p=3
    )
    assert dm[0, 0] == pytest.approx((3**3 + 4**3) ** (1 / 3))


def test_mixed_hubness_kwargs_roundtrip(source_target):
    """Reference-style names and kwargs resolve identically."""
    source, target = source_target
    a = Kiez(n_candidates=6, hubness="LocalScaling", hubness_kwargs={"method": "ls"})
    b = Kiez(n_candidates=6, hubness="ls")
    assert a.hubness == b.hubness == "ls"
    c = Kiez(n_candidates=6, hubness="MutualProximity", hubness_kwargs={"method": "exact"})
    assert c.hubness == "mp_empiric"
    with pytest.raises(ValueError, match="not recognized"):
        Kiez(n_candidates=6, hubness="MutualProximity", hubness_kwargs={"method": "zzz"})


def test_round_away_matches_duckdb():
    """round_away must be bit-identical to DuckDB round() (driver hashes)."""
    import duckdb
    import numpy as np

    from kiezray.arrowutil import round_away

    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [rng.random(5000) * 300 - 150, [0.00025, 0.12345, 100.00005, -0.00025]]
    )
    con = duckdb.connect()
    for d in (2, 4, 6):
        duck = np.array(
            con.sql(
                f"select list_transform($1::DOUBLE[], y -> round(y, {d}))",
                params=[list(vals)],
            ).fetchone()[0]
        )
        mine = round_away(vals, d)
        assert (mine == duck).all()
        # np.round (banker's) is NOT duck-identical — guard against regressing
        assert (np.round(vals, 4) != np.array(
            con.sql(
                "select list_transform($1::DOUBLE[], y -> round(y, 4))",
                params=[list(vals)],
            ).fetchone()[0]
        )).any()


def test_class_based_hubness_parity(ray_session):
    """Reference calling convention: Kiez(hubness=<class or instance>)
    must behave exactly like the string form (kiez.py:103 HintOrType)."""
    import numpy as np

    from kiezray import CSLS, DisSimLocal, Kiez, LocalScaling, MutualProximity

    rng = np.random.RandomState(3)
    src, tgt = rng.rand(40, 8), rng.rand(60, 8)
    cases = [
        (CSLS(), "csls", {}),
        (LocalScaling(method="nicdm"), "localscaling", {"method": "nicdm"}),
        (MutualProximity(method="empiric"), "mutualproximity", {"method": "empiric"}),
        (LocalScaling, "localscaling", {}),
    ]
    for obj, name, hkw in cases:
        k1 = Kiez(n_candidates=8, algorithm="exact", hubness=obj)
        k1.fit(src, tgt)
        d1, i1 = k1.kneighbors(5)
        k2 = Kiez(n_candidates=8, algorithm="exact", hubness=name, hubness_kwargs=hkw)
        k2.fit(src, tgt)
        d2, i2 = k2.kneighbors(5)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(d1, d2)
    kd = Kiez(
        n_candidates=8,
        algorithm="exact",
        algorithm_kwargs={"metric": "sqeuclidean"},
        hubness=DisSimLocal(squared=True),
    )
    kd.fit(src, tgt)
    dd, ii = kd.kneighbors(5)
    assert dd.shape == (40, 5)

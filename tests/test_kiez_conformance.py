"""End-to-end conformance: Ray pipeline == straight-line numpy oracle.

Mirrors the reference's parametrized hubness-method matrix
(reference tests/test_kiez.py:13-77) on the same seeded 20x5/50x5 fixture.
"""

import warnings

import numpy as np
import pytest

from kiezray import Kiez

from .oracle import kiez_pipeline

METHODS = [
    ("none", None, {}),
    ("csls", "CSLS", {}),
    ("ls", "LocalScaling", {}),
    ("nicdm", "LocalScaling", {"method": "nicdm"}),
    ("mp_normal", "MutualProximity", {"method": "normal"}),
    ("mp_empiric", "MutualProximity", {"method": "empiric"}),
    ("dsl", "DisSimLocal", {}),
]


@pytest.mark.parametrize("oracle_name,hubness,hkw", METHODS)
@pytest.mark.parametrize("n_candidates,k", [(10, 5), (5, 5), (10, 10)])
def test_matches_oracle(source_target, oracle_name, hubness, hkw, n_candidates, k):
    source, target = source_target
    inst = Kiez(
        n_candidates=n_candidates,
        algorithm="exact",
        hubness=hubness,
        hubness_kwargs=dict(hkw),
    )
    inst.fit(source, target)
    dist, ind = inst.kneighbors(k)
    exp_dist, exp_ind = kiez_pipeline(
        source, target, n_candidates, k, hubness=oracle_name
    )
    assert dist.shape == (len(source), min(k, n_candidates))
    np.testing.assert_array_equal(ind, exp_ind)
    np.testing.assert_allclose(dist, exp_dist, atol=1e-6)


@pytest.mark.parametrize("oracle_name,hubness,hkw", METHODS)
def test_single_source(source_target, oracle_name, hubness, hkw):
    """target=None: self-query exclusion on the main pass only."""
    source, _ = source_target
    inst = Kiez(
        n_candidates=8, algorithm="exact", hubness=hubness, hubness_kwargs=dict(hkw)
    )
    inst.fit(source)
    dist, ind = inst.kneighbors(5)
    exp_dist, exp_ind = kiez_pipeline(
        source, source, 8, 5, hubness=oracle_name, self_query=True
    )
    np.testing.assert_array_equal(ind, exp_ind)
    np.testing.assert_allclose(dist, exp_dist, atol=1e-6)
    # no result may contain the query itself
    for i in range(len(source)):
        assert i not in ind[i]


def test_shard_invariance(source_target):
    """Results must not depend on how the indexed side is sharded."""
    source, target = source_target
    base = Kiez(n_candidates=10, algorithm="exact", hubness="CSLS")
    base.fit(source, target)
    d1, i1 = base.kneighbors(5)
    sharded = Kiez(
        n_candidates=10, algorithm="exact", hubness="CSLS", rows_per_shard=16
    )
    sharded.fit(source, target)
    d2, i2 = sharded.kneighbors(5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, atol=1e-12)


def test_k_clamping(source_target):
    source, target = source_target
    inst = Kiez(n_candidates=5, algorithm="exact", hubness="CSLS")
    inst.fit(source, target)
    with pytest.warns(UserWarning, match="k > n_candidates"):
        dist, ind = inst.kneighbors(20)
    assert dist.shape == (20, 5)
    with pytest.warns(UserWarning, match="No k supplied"):
        dist, ind = inst.kneighbors()
    assert dist.shape == (20, 5)


def test_n_candidates_larger_than_target(source_target):
    source, target = source_target
    inst = Kiez(n_candidates=60, algorithm="exact", hubness="CSLS")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        inst.fit(source, target)
        dist, ind = inst.kneighbors(60)
    assert dist.shape == (20, 50)
    exp_dist, exp_ind = kiez_pipeline(source, target, 60, 60, hubness="csls")
    np.testing.assert_array_equal(ind, exp_ind)
    np.testing.assert_allclose(dist, exp_dist, atol=1e-6)


def test_wrong_inputs():
    with pytest.raises(ValueError, match="Expected n_candidates > 0"):
        Kiez(n_candidates=-1)
    with pytest.raises(TypeError):
        Kiez(n_candidates=1.5)
    with pytest.raises(ValueError, match="single candidate"):
        Kiez(n_candidates=1, hubness="CSLS")
    with pytest.raises(ValueError, match="Unknown algorithm"):
        Kiez(algorithm="nope")
    with pytest.raises(ValueError, match="Unknown hubness"):
        Kiez(hubness="nope")
    inst = Kiez(n_candidates=5)
    rng = np.random.RandomState(0)
    inst.fit(rng.rand(10, 3), rng.rand(10, 3))
    with pytest.raises(ValueError, match="Expected k > 0"):
        inst.kneighbors(-2)


def test_dsl_metric_gate():
    with pytest.raises(ValueError, match="DisSimLocal only supports"):
        Kiez(hubness="DisSimLocal", algorithm_kwargs={"metric": "cosine"})
    with pytest.raises(ValueError, match="p must be 2"):
        Kiez(
            hubness="DisSimLocal",
            algorithm_kwargs={"metric": "minkowski", "p": 3},
        )


def test_dim_mismatch():
    rng = np.random.RandomState(0)
    inst = Kiez()
    with pytest.raises(ValueError, match="same number of features"):
        inst.fit(rng.rand(10, 3), rng.rand(10, 4))


def test_from_path(tmp_path):
    import json

    conf = {
        "algorithm": "SklearnNN",
        "algorithm_kwargs": {"metric": "euclidean"},
        "hubness": "CSLS",
        "n_candidates": 7,
    }
    p = tmp_path / "conf.json"
    p.write_text(json.dumps(conf))
    inst = Kiez.from_path(p)
    assert inst.n_candidates == 7
    assert inst.hubness == "csls"
    assert inst.algorithm == "exact"

"""User-extension surface: custom rerank kernels and custom indexes
(reference parity with subclassing HubnessReduction / NNAlgorithm,
docs/source/using_your_own.rst)."""

import numpy as np
import pytest

from kiezray import Kiez
from kiezray.index import ExactIndex, register_index
from kiezray.rerank import CUSTOM_KERNELS, register_hubness


def rank_mean_kernel(D, I, stats):
    """Toy custom hubness reduction: distance scaled by the candidate's
    mean t->s distance (derived from the full lists custom kernels get)."""
    t2s_mean = np.nanmean(stats.t2s_dist, axis=1)
    return D / (1e-9 + t2s_mean[I])


class JitteredExact(ExactIndex):
    """Custom index: exact search (identity subclass, registry test)."""


@pytest.fixture(autouse=True)
def _clean_registry():
    yield
    CUSTOM_KERNELS.pop("rankmean", None)
    from kiezray.index import INDEX_REGISTRY

    INDEX_REGISTRY.pop("jittered", None)


def test_custom_hubness_kernel(source_target):
    register_hubness("rankmean", rank_mean_kernel)
    source, target = source_target
    kz = Kiez(n_candidates=8, algorithm="exact", hubness="rankmean")
    kz.fit(source, target)
    dist, ind = kz.kneighbors(5)
    assert dist.shape == (20, 5)
    # oracle: straight-line computation with the same kernel
    from .oracle import exact_knn

    D, I = exact_knn(source, target, 8)
    t2s_d, t2s_i = exact_knn(target, source, 8)
    t2s_mean = t2s_d.mean(axis=1)
    sec = D / (1e-9 + t2s_mean[I])
    from .oracle import sort_topk

    ed, ei = sort_topk(sec, I, 5)
    np.testing.assert_array_equal(ind, ei)
    np.testing.assert_allclose(dist, ed, atol=1e-6)


def test_custom_hubness_name_collision():
    with pytest.raises(ValueError, match="built-in"):
        register_hubness("csls", rank_mean_kernel)


def test_custom_index(source_target):
    register_index("jittered", JitteredExact)
    source, target = source_target
    kz = Kiez(n_candidates=8, algorithm="jittered", hubness="CSLS")
    kz.fit(source, target)
    d1, i1 = kz.kneighbors(5)
    base = Kiez(n_candidates=8, algorithm="exact", hubness="CSLS")
    base.fit(source, target)
    d2, i2 = base.kneighbors(5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, atol=1e-12)


def test_register_index_validates():
    with pytest.raises(TypeError, match="build"):
        register_index("bad", object)

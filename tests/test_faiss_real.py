"""Smoke tests for FaissIndex against the REAL faiss bindings.

This sandbox has no faiss, so the whole module skips here; on a real
cluster install (`pip install faiss-cpu`) these run automatically and
verify the gated class end-to-end — the instant-verification hook the
stub contract in test_faiss_contract.py cannot give. Assertions mirror
the reference's semantics (reference kiez
kiez/neighbors/approximate/faiss.py:67-156): cosine = L2-normalize then
METRIC_INNER_PRODUCT, euclidean = sqrt of faiss's squared-L2 result,
id-mapped output with self-exclusion and NaN/-1 padding when
k > ntotal — all cross-checked against ExactIndex.
"""

import numpy as np
import pytest

pytest.importorskip("faiss")

from kiezray.index import ExactIndex, FaissIndex  # noqa: E402


@pytest.fixture()
def xy():
    rng = np.random.RandomState(42)
    return (
        rng.rand(80, 12).astype(np.float64),
        rng.rand(15, 12).astype(np.float64),
    )


def test_real_faiss_cosine_matches_exact(xy):
    x, q = xy
    ids = np.arange(100, 100 + len(x), dtype=np.int64)  # non-dense ids
    fi = FaissIndex(metric="cosine")
    fi.build(ids, x)
    fd, fids = fi.search(q, 5)
    ex = ExactIndex("cosine")
    ex.build(ids, x)
    ed, eids = ex.search(q, 5)
    np.testing.assert_array_equal(fids, eids)
    np.testing.assert_allclose(fd, ed, atol=1e-5)  # float32 index


def test_real_faiss_euclidean_sqrt_matches_exact(xy):
    x, q = xy
    ids = np.arange(len(x), dtype=np.int64)
    fi = FaissIndex(metric="euclidean")
    fi.build(ids, x)
    fd, fids = fi.search(q, 5)
    ex = ExactIndex("euclidean")
    ex.build(ids, x)
    ed, eids = ex.search(q, 5)
    np.testing.assert_array_equal(fids, eids)
    np.testing.assert_allclose(fd, ed, atol=1e-5)
    assert (fd >= 0).all()  # sqrt applied, not raw squared L2


def test_real_faiss_exclude_self_and_padding():
    rng = np.random.RandomState(1)
    x = rng.rand(6, 4)
    ids = np.arange(6, dtype=np.int64)
    fi = FaissIndex(metric="euclidean")
    fi.build(ids, x)
    d, i = fi.search(x, 3, exclude_ids=ids)
    assert (i != ids[:, None]).all()  # self excluded
    d2, i2 = fi.search(x[:2], 10)  # k > ntotal: NaN/-1 padding
    assert (i2[:, 6:] == -1).all()
    assert np.isnan(d2[:, 6:]).all()


def test_real_faiss_ivf_factory_recall(xy):
    """A non-Flat factory string exercises train(): IVF over a small
    corpus with nprobe = nlist degenerates to exact search."""
    x, q = xy
    ids = np.arange(len(x), dtype=np.int64)
    fi = FaissIndex(metric="euclidean", index_key="IVF4,Flat")
    fi.build(ids, x)
    try:  # nprobe lives on the built faiss index when the factory is IVF
        fi.index.nprobe = 4
    except AttributeError:
        pass
    fd, fids = fi.search(q, 5)
    ex = ExactIndex("euclidean")
    ex.build(ids, x)
    _, eids = ex.search(q, 5)
    # exhaustive nprobe -> identical neighbor sets per query
    for frow, erow in zip(fids, eids):
        assert set(frow.tolist()) == set(erow.tolist())

"""Contract test for the gated FaissIndex (index.py) without real faiss:
a stub faiss module is injected so the class executes, pinning the
reference's semantics (faiss.py:67-156): cosine = L2-normalize then
METRIC_INNER_PRODUCT, euclidean = sqrt of the raw L2 result, id-mapped
output with exclusion + padding — all cross-checked against ExactIndex."""

import numpy as np
import pytest

import kiezray.index as kindex
from kiezray.index import ExactIndex, FaissIndex


class _MockFlatIndex:
    """Brute-force stand-in with faiss's return conventions: METRIC_L2 ->
    SQUARED distances ascending; METRIC_INNER_PRODUCT -> similarities
    descending; int64 positions, -1 padding when k > ntotal."""

    def __init__(self, d, metric):
        self.d = d
        self.metric = metric
        self.is_trained = True
        self._data = np.empty((0, d), dtype=np.float32)

    def train(self, v):  # pragma: no cover - Flat never needs it
        pass

    def add(self, v):
        self._data = np.vstack([self._data, v])

    @property
    def ntotal(self):
        return len(self._data)

    def search(self, q, k):
        if self.metric == _mock.METRIC_INNER_PRODUCT:
            score = q @ self._data.T
            order = np.argsort(-score, kind="stable", axis=1)[:, :k]
        else:
            score = ((q[:, None, :] - self._data[None, :, :]) ** 2).sum(-1)
            order = np.argsort(score, kind="stable", axis=1)[:, :k]
        d = np.take_along_axis(score, order, axis=1).astype(np.float32)
        return d, order.astype(np.int64)


class _mock:
    METRIC_L2 = 1
    METRIC_INNER_PRODUCT = 0
    normalize_calls = 0

    @staticmethod
    def index_factory(d, key, metric=1):
        assert key == "Flat"
        return _MockFlatIndex(d, metric)

    @staticmethod
    def normalize_L2(v):  # in-place, like real faiss (faiss.py:129-130)
        _mock.normalize_calls += 1
        n = np.linalg.norm(v, axis=1, keepdims=True)
        n[n == 0] = 1
        v /= n


@pytest.fixture()
def patched_faiss(monkeypatch):
    monkeypatch.setattr(kindex, "faiss", _mock)
    _mock.normalize_calls = 0
    yield _mock


@pytest.fixture()
def xy():
    rng = np.random.RandomState(42)
    return rng.rand(80, 12), rng.rand(15, 12)


def test_faiss_cosine_normalize_then_ip(patched_faiss, xy):
    x, q = xy
    ids = np.arange(100, 100 + len(x), dtype=np.int64)  # non-dense ids
    fi = FaissIndex(metric="cosine")
    fi.build(ids, x)
    fd, fids = fi.search(q, 5)
    assert patched_faiss.normalize_calls >= 2  # data AND queries normalized
    ex = ExactIndex("cosine")
    ex.build(ids, x)
    ed, eids = ex.search(q, 5)
    np.testing.assert_array_equal(fids, eids)
    np.testing.assert_allclose(fd, ed, atol=1e-5)  # float32 index


def test_faiss_euclidean_sqrt_postprocess(patched_faiss, xy):
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
    # sqrt really applied: squared distances would violate monotone match
    assert (fd <= ed + 1e-4).all()


def test_faiss_exclude_self_and_padding(patched_faiss):
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

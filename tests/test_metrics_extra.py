"""Conformance tests for the extended metric surface (reference
faiss.py:70-85 options braycurtis/canberra/jensenshannon) against a
straight-line per-pair oracle, plus the torch input path (skip-if-absent)."""

import math

import numpy as np
import pytest

from kiezray.index import ExactIndex
from kiezray.metrics import VALID_METRICS, pairwise_distances


def _oracle_pair(u, v, metric):
    if metric == "braycurtis":
        den = np.abs(u + v).sum()
        return np.abs(u - v).sum() / den if den else 0.0
    if metric == "canberra":
        den = np.abs(u) + np.abs(v)
        term = np.where(den != 0, np.abs(u - v) / np.where(den == 0, 1, den), 0.0)
        return term.sum()
    if metric == "jensenshannon":
        p = u / u.sum() if u.sum() else u
        q = v / v.sum() if v.sum() else v
        m = 0.5 * (p + q)
        acc = 0.0
        for a, b in ((p, m), (q, m)):
            for ai, bi in zip(a, b):
                if ai > 0:
                    acc += ai * math.log(ai / bi)
        return math.sqrt(max(acc * 0.5, 0.0))
    raise ValueError(metric)


@pytest.mark.parametrize("metric", ["braycurtis", "canberra", "jensenshannon"])
def test_extended_metrics_match_oracle(metric):
    rng = np.random.RandomState(3)
    q = rng.rand(7, 12)
    x = rng.rand(9, 12)
    got = pairwise_distances(q, x, metric)
    for i in range(len(q)):
        for j in range(len(x)):
            assert got[i, j] == pytest.approx(
                _oracle_pair(q[i], x[j], metric), abs=1e-12
            )
    assert metric in VALID_METRICS


@pytest.mark.parametrize("metric", ["braycurtis", "canberra", "jensenshannon"])
def test_exact_index_extended_metric_topk(metric):
    rng = np.random.RandomState(5)
    x = rng.rand(80, 16)
    q = rng.rand(10, 16)
    idx = ExactIndex(metric)
    idx.build(np.arange(len(x)), x)
    d, i = idx.search(q, 5)
    full = pairwise_distances(q, x, metric)
    want_i = np.argsort(full, axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(i, want_i)
    np.testing.assert_allclose(d, np.take_along_axis(full, want_i, axis=1), atol=1e-12)


def test_canberra_zero_handling():
    u = np.array([[0.0, 1.0, 0.0]])
    v = np.array([[0.0, 0.0, 2.0]])
    # 0/0 term -> 0; others |u-v|/(|u|+|v|)
    assert pairwise_distances(u, v, "canberra")[0, 0] == pytest.approx(2.0)


def test_torch_input_path():
    torch = pytest.importorskip("torch")
    import ray

    from kiezray import Kiez

    src = torch.rand(30, 8)
    tgt = torch.rand(40, 8)
    k = Kiez(n_candidates=5, algorithm="exact")
    k.fit(src, tgt)
    dist, ind = k.kneighbors(3)
    assert dist.shape == (30, 3)


def test_mp_empiric_chunked_matches_unchunked():
    """c=64 memory-bounding path: forcing tiny chunks must not change the
    kernel output (VERDICT item 9)."""
    from kiezray import rerank
    from kiezray.rerank import CalibrationStats, mp_empiric

    rng = np.random.RandomState(9)
    n, c, m = 64, 64, 200
    D = np.sort(rng.rand(n, c) * 10, axis=1)
    I = np.stack([rng.choice(m, size=c, replace=False) for _ in range(n)])
    stats = CalibrationStats(method="mp_empiric", n_candidates=c)
    stats.t2s_ind = np.stack(
        [rng.choice(m, size=c, replace=False) for _ in range(m)]
    )
    stats.t2s_dist = np.sort(rng.rand(m, c) * 10, axis=1)
    full = mp_empiric(D, I, stats)
    old_budget = rerank.MP_EMPIRIC_BUDGET
    try:
        rerank.MP_EMPIRIC_BUDGET = 1  # force jc == 1
        chunked = mp_empiric(D, I, stats)
    finally:
        rerank.MP_EMPIRIC_BUDGET = old_budget
    np.testing.assert_array_equal(full, chunked)

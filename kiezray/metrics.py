"""Vectorized distance kernels and special functions (pure numpy).

Covers the metric surface of the reference backends
(/root/reference/kiez/neighbors/approximate/faiss.py:67-85 metric map,
exact/sklearn_nearest_neighbors.py minkowski-p): euclidean, sqeuclidean,
cosine, inner product, manhattan/l1, chebyshev/linf, minkowski(p).

All kernels take ``Q (n, d)`` and ``X (m, d)`` float64/float32 arrays and
return an ``(n, m)`` distance matrix where *smaller is closer* (inner
product is negated so one top-k code path serves every metric).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "pairwise_distances",
    "VALID_METRICS",
    "norm_sf",
    "erfc_vec",
    "truncnorm_third_moment",
]


def _sq_norms(a: np.ndarray) -> np.ndarray:
    return np.einsum("ij,ij->i", a, a)


def _sqeuclidean(q: np.ndarray, x: np.ndarray) -> np.ndarray:
    # ||q||^2 - 2 q.x + ||x||^2 via one GEMM; clip tiny negatives from fp error
    d2 = _sq_norms(q)[:, None] - 2.0 * (q @ x.T) + _sq_norms(x)[None, :]
    np.maximum(d2, 0.0, out=d2)
    return d2


def _cosine(q: np.ndarray, x: np.ndarray) -> np.ndarray:
    qn = np.linalg.norm(q, axis=1, keepdims=True)
    xn = np.linalg.norm(x, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    xn[xn == 0] = 1.0
    return 1.0 - (q / qn) @ (x / xn).T


def _minkowski(q: np.ndarray, x: np.ndarray, p: float) -> np.ndarray:
    # broadcast (n, 1, d) - (1, m, d); caller batches q so memory stays bounded
    diff = np.abs(q[:, None, :] - x[None, :, :])
    if p == 1:
        return diff.sum(axis=2)
    if p == math.inf:
        return diff.max(axis=2)
    return (diff**p).sum(axis=2) ** (1.0 / p)


def _braycurtis(q: np.ndarray, x: np.ndarray) -> np.ndarray:
    """sum|q - x| / sum|q + x| (scipy convention; 0/0 -> 0)."""
    diff = np.abs(q[:, None, :] - x[None, :, :]).sum(axis=2)
    den = np.abs(q[:, None, :] + x[None, :, :]).sum(axis=2)
    out = np.zeros_like(diff)
    np.divide(diff, den, out=out, where=den != 0)
    return out


def _canberra(q: np.ndarray, x: np.ndarray) -> np.ndarray:
    """sum(|q - x| / (|q| + |x|)) with 0/0 terms -> 0 (scipy convention)."""
    num = np.abs(q[:, None, :] - x[None, :, :])
    den = np.abs(q)[:, None, :] + np.abs(x)[None, :, :]
    term = np.zeros_like(num)
    np.divide(num, den, out=term, where=den != 0)
    return term.sum(axis=2)


def _jensenshannon(q: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Jensen-Shannon distance (sqrt of the base-e divergence) between
    rows normalized to probability vectors — scipy convention; matches
    the reference Faiss metric option (faiss.py:70-85)."""
    qs = q.sum(axis=1, keepdims=True)
    xs = x.sum(axis=1, keepdims=True)
    qs[qs == 0] = 1.0
    xs[xs == 0] = 1.0
    P = (q / qs)[:, None, :]  # (n, 1, d)
    Q = (x / xs)[None, :, :]  # (1, m, d)
    M = 0.5 * (P + Q)
    with np.errstate(divide="ignore", invalid="ignore"):
        t1 = np.where(P > 0, P * np.log(P / M), 0.0)
        t2 = np.where(Q > 0, Q * np.log(Q / M), 0.0)
    div = 0.5 * (t1 + t2).sum(axis=2)
    return np.sqrt(np.maximum(div, 0.0))


def pairwise_distances(
    q: np.ndarray, x: np.ndarray, metric: str = "euclidean", p: float = 2.0
) -> np.ndarray:
    """(n, m) distance matrix; smaller = closer for every metric."""
    q = np.asarray(q, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    if metric in ("euclidean", "l2"):
        return np.sqrt(_sqeuclidean(q, x))
    if metric == "sqeuclidean":
        return _sqeuclidean(q, x)
    if metric in ("cosine",):
        return _cosine(q, x)
    if metric in ("ip", "innerproduct", "inner_product"):
        return -(q @ x.T)
    if metric in ("manhattan", "l1", "cityblock"):
        return _minkowski(q, x, 1)
    if metric in ("chebyshev", "linf"):
        return _minkowski(q, x, math.inf)
    if metric == "minkowski":
        if p == 2.0:
            return np.sqrt(_sqeuclidean(q, x))
        return _minkowski(q, x, p)
    if metric == "braycurtis":
        return _braycurtis(q, x)
    if metric == "canberra":
        return _canberra(q, x)
    if metric == "jensenshannon":
        return _jensenshannon(q, x)
    raise ValueError(f"Unknown metric: {metric}")


VALID_METRICS = (
    "euclidean",
    "l2",
    "sqeuclidean",
    "cosine",
    "ip",
    "innerproduct",
    "manhattan",
    "l1",
    "cityblock",
    "chebyshev",
    "linf",
    "minkowski",
    "braycurtis",
    "canberra",
    "jensenshannon",
)

_erfc_ufunc = np.frompyfunc(math.erfc, 1, 1)


def erfc_vec(x: np.ndarray) -> np.ndarray:
    """Elementwise complementary error function (exact via math.erfc)."""
    return _erfc_ufunc(np.asarray(x, dtype=np.float64)).astype(np.float64)


def norm_sf(x: np.ndarray, mu: np.ndarray, sd: np.ndarray) -> np.ndarray:
    """Gaussian survival function 1 - CDF, matching scipy.stats.norm.sf.

    Replaces the scipy call at reference
    kiez/hubness_reduction/mutual_proximity.py:178-182 (scipy absent here).
    sd == 0 gives the scipy limit: sf = 1.0 where x < mu, 0.5 at x == mu,
    0.0 where x > mu (scipy returns these via the degenerate distribution).
    """
    x = np.asarray(x, dtype=np.float64)
    mu = np.broadcast_to(np.asarray(mu, dtype=np.float64), x.shape)
    sd = np.broadcast_to(np.asarray(sd, dtype=np.float64), x.shape)
    out = np.empty_like(x)
    zero = sd == 0
    nz = ~zero
    z = np.zeros_like(x)
    np.divide(x - mu, sd * math.sqrt(2.0), out=z, where=nz)
    out[nz] = 0.5 * erfc_vec(z[nz])
    if zero.any():
        xm = x[zero]
        mm = mu[zero]
        out[zero] = np.where(xm < mm, 1.0, np.where(xm > mm, 0.0, 0.5))
    return out


def _phi(x: float) -> float:
    return math.exp(-0.5 * x * x) / math.sqrt(2.0 * math.pi)


def _Phi(x: float) -> float:
    return 0.5 * math.erfc(-x / math.sqrt(2.0))


def truncnorm_third_moment(a: float, b: float) -> float:
    """E[X^3] of the standard normal truncated to [a, b].

    Analytic replacement for scipy.stats.truncnorm(a, b).moment(3) used by
    the reference hubness estimator
    (kiez/analysis/estimation.py:37-58): moment recurrence
    m_k = ((a^{k-1} phi(a) - b^{k-1} phi(b)) / Z) + (k-1) m_{k-2},
    m_0 = 1, m_1 = (phi(a) - phi(b)) / Z with Z = Phi(b) - Phi(a).
    """
    pa, pb = _phi(a), (0.0 if math.isinf(b) else _phi(b))
    za, zb = _Phi(a), (1.0 if math.isinf(b) else _Phi(b))
    z = zb - za
    if z <= 0:
        return float("nan")
    a2 = 0.0 if math.isinf(a) else a
    b2 = 0.0 if math.isinf(b) else b
    m1 = (pa - pb) / z
    m2 = (a2 * pa - b2 * pb) / z + 1.0
    m3 = (a2 * a2 * pa - b2 * b2 * pb) / z + 2.0 * m1
    return m3

"""Straight-line numpy oracle of the reference semantics.

Deliberately written loop-style and independently of kiezray's vectorized
kernels, so agreement between the two is meaningful. Implements the exact
formulas of /root/reference/kiez (csls.py:88-93, local_scaling.py:133-147,
mutual_proximity.py:166-212, dis_sim.py:94-177, base.py:33-105).
"""

from __future__ import annotations

import math

import numpy as np


def exact_knn(query, indexed, k, metric="euclidean", exclude_self=False):
    """Sorted k nearest neighbors by brute force; ties -> smaller index."""
    n = len(query)
    dist = np.empty((n, k))
    ind = np.empty((n, k), dtype=np.int64)
    for i in range(n):
        d = np.empty(len(indexed))
        for j in range(len(indexed)):
            diff = query[i] - indexed[j]
            if metric in ("euclidean", "minkowski"):
                d[j] = math.sqrt(float(diff @ diff))
            elif metric == "sqeuclidean":
                d[j] = float(diff @ diff)
            elif metric == "cosine":
                qn = np.linalg.norm(query[i]) or 1.0
                xn = np.linalg.norm(indexed[j]) or 1.0
                d[j] = 1.0 - float(query[i] @ indexed[j]) / (qn * xn)
            else:
                raise ValueError(metric)
        if exclude_self:
            d[i] = np.inf
        order = sorted(range(len(indexed)), key=lambda j: (d[j], j))[:k]
        dist[i] = d[order]
        ind[i] = order
    return dist, ind


def csls(D, I, t2s_dist):
    r_train = t2s_dist.mean(axis=1)
    r_test = D.mean(axis=1).reshape(-1, 1)
    return 2 * D - r_test - r_train[I]


def local_scaling(D, I, t2s_dist):
    r_t = t2s_dist[:, -1]
    r_s = D[:, -1].reshape(-1, 1)
    return 1.0 - np.exp(-1 * D**2 / (r_s * r_t[I]))


def nicdm(D, I, t2s_dist):
    r_t = t2s_dist.mean(axis=1)
    r_s = D.mean(axis=1).reshape(-1, 1)
    return D / np.sqrt(r_s * r_t[I])


def _norm_sf(x, mu, sd):
    if sd == 0:
        return 1.0 if x < mu else (0.5 if x == mu else 0.0)
    return 0.5 * math.erfc((x - mu) / (sd * math.sqrt(2)))


def mp_normal(D, I, t2s_dist):
    mu_t = np.nanmean(t2s_dist, axis=1)
    sd_t = np.nanstd(t2s_dist, axis=1)
    out = np.empty_like(D)
    for i in range(D.shape[0]):
        mu_q = np.nanmean(D[i])
        sd_q = np.nanstd(D[i])
        for j in range(D.shape[1]):
            p1 = _norm_sf(D[i, j], mu_q, sd_q)
            p2 = _norm_sf(D[i, j], mu_t[I[i, j]], sd_t[I[i, j]])
            out[i, j] = 1.0 - p1 * p2
    return out


def mp_empiric(D, I, t2s_dist, t2s_ind):
    """Double-loop transliteration of mutual_proximity.py:185-212."""
    n, c = D.shape
    out = np.empty_like(D)
    max_ind = max(int(t2s_ind.max()), int(I.max()))
    for i in range(n):
        d_i = D[i, :][None, :]
        d_j = np.zeros((d_i.size, c))
        for j in range(c):
            tmp = np.zeros(max_ind + 1) + (t2s_dist[I[i, j], -1] + 1e-6)
            tmp[t2s_ind[I[i, j]]] = t2s_dist[I[i, j]]
            d_j[j, :] = tmp[I[i]]
        d = d_i.T
        out[i, :] = 1.0 - (np.sum((d_i > d) & (d_j > d), axis=1) / c)
    return out


def dsl(D, I, t2s_ind, source, target, query, squared):
    """dis_sim.py:66-177 including the global min-shift."""
    centroids_t = source[t2s_ind].mean(axis=1)
    delta_t = ((target - centroids_t) ** 2).sum(axis=1)
    n, c = D.shape
    hub = np.empty_like(D)
    for i in range(n):
        for j in range(c):
            diff = query[i] - target[I[i, j]]
            hub[i, j] = float(diff @ diff)
    centroids_q = target[I].mean(axis=1)
    sq = ((query - centroids_q) ** 2).sum(axis=1)
    hub -= sq.reshape(-1, 1)
    hub -= delta_t[I]
    min_dist = hub.min()
    if min_dist < 0:
        hub = hub - min_dist
    if not squared:
        hub = hub ** (1 / 2)
    return hub


def sort_topk(dist, ind, k):
    n, c = dist.shape
    out_d = np.empty((n, k))
    out_i = np.empty((n, k), dtype=np.int64)
    for i in range(n):
        # id tie-break for equal secondary distances (shard-invariant;
        # mirrors kiezray.rerank.topk_sorted and the SQL oracles)
        order = sorted(range(c), key=lambda j: (dist[i, j], ind[i, j]))[:k]
        out_d[i] = dist[i, order]
        out_i[i] = ind[i, order]
    return out_d, out_i


def kiez_pipeline(
    source,
    target,
    n_candidates,
    k,
    hubness="none",
    metric="euclidean",
    squared=True,
    self_query=False,
):
    """Full reference pipeline: candidates -> transform -> top-k."""
    c_t = min(n_candidates, len(target))
    c_s = min(n_candidates, len(source))
    D, I = exact_knn(source, target, c_t, metric, exclude_self=self_query)
    if hubness == "none":
        return sort_topk(D, I, min(k, c_t))
    t2s_dist, t2s_ind = exact_knn(target, source, c_s, metric, exclude_self=False)
    if hubness == "csls":
        sec = csls(D, I, t2s_dist)
    elif hubness == "ls":
        sec = local_scaling(D, I, t2s_dist)
    elif hubness == "nicdm":
        sec = nicdm(D, I, t2s_dist)
    elif hubness == "mp_normal":
        sec = mp_normal(D, I, t2s_dist)
    elif hubness == "mp_empiric":
        sec = mp_empiric(D, I, t2s_dist, t2s_ind)
    elif hubness == "dsl":
        if metric in ("euclidean", "minkowski"):
            squared = False
        elif metric == "sqeuclidean":
            squared = True
        sec = dsl(D, I, t2s_ind, source, target, source, squared)
    else:
        raise ValueError(hubness)
    return sort_topk(sec, I, min(k, c_t))

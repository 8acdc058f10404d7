"""Hubness-reduction rerank kernels: pure, vectorized numpy batch functions.

Each kernel maps a batch of raw candidate results
``D (n, c) float64`` (primary distances, ascending per row) and
``I (n, c) int64`` (global target row ids) plus small per-target
calibration arrays (broadcast, indexed by target row id) to the
secondary "hubness reduced" distance matrix of the same shape.

Semantics reproduce the reference formulas exactly:
 - CSLS            /root/reference/kiez/hubness_reduction/csls.py:88-93
 - LocalScaling    local_scaling.py:133-147 (standard + nicdm)
 - MutualProximity mutual_proximity.py:166-212 (normal + empiric)
 - DisSimLocal     dis_sim.py:143-177
 - top-k sort      base.py:72-87

The kernels are deliberately Ray-free so they can be unit-tested against a
straight-line oracle and reused inside ``map_batches`` stages.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .metrics import norm_sf

HUBNESS_METHODS = (
    "none",
    "csls",
    "ls",
    "nicdm",
    "mp_normal",
    "mp_empiric",
    "dsl",
)

#: user-registered rerank kernels (reference parity: subclassing
#: HubnessReduction, docs/source/using_your_own.rst). A kernel is a pure
#: function ``fn(D, I, stats) -> secondary_D`` and receives the full t->s
#: neighbor lists in ``stats.t2s_ind``/``stats.t2s_dist`` so it can derive
#: any per-target calibration it needs.
CUSTOM_KERNELS: dict = {}


def register_hubness(name: str, kernel) -> None:
    key = name.lower()
    if key in HUBNESS_METHODS:
        raise ValueError(f"{name!r} is a built-in hubness method")
    CUSTOM_KERNELS[key] = kernel


@dataclass
class CalibrationStats:
    """Per-target-row calibration state derived from the t->s pass.

    Arrays are indexed by dense target row id (0..m-1). Only the fields a
    given method needs are populated; the whole object is small (O(m)
    scalars, O(m*c) for mp_empiric/dsl) and is broadcast via ``ray.put``.
    """

    method: str = "none"
    n_candidates: int = 0
    # csls / nicdm: mean of each target's t->s candidate distances
    r_mean: np.ndarray | None = None
    # ls standard: k-th (largest retained) t->s distance per target
    r_kth: np.ndarray | None = None
    # mp_normal
    mu: np.ndarray | None = None
    sd: np.ndarray | None = None
    # mp_empiric: full t->s neighbor lists per target
    t2s_ind: np.ndarray | None = None  # (m, c) int64
    t2s_dist: np.ndarray | None = None  # (m, c) float64
    # dsl: squared distance of each target to the centroid of its source NNs
    dist_to_centroid: np.ndarray | None = None
    extras: dict = field(default_factory=dict)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def csls_rows(D: np.ndarray, r_mean_t: np.ndarray) -> np.ndarray:
    """CSLS on pre-gathered per-candidate stats ``r_mean_t (n, c)``.

    The broadcast kernel (``csls``) and the shuffle-join transport both
    delegate here, so the two tiers are byte-identical by construction."""
    r_test = D.mean(axis=1, keepdims=True)
    return 2.0 * D - r_test - r_mean_t


def csls(D: np.ndarray, I: np.ndarray, stats: CalibrationStats) -> np.ndarray:
    """2*d - mean_c(d_query_row) - mean_c(d_t2s)[target]."""
    return csls_rows(D, stats.r_mean[I])


def local_scaling_rows(D: np.ndarray, r_kth_t: np.ndarray) -> np.ndarray:
    """standard LS on pre-gathered ``r_kth_t (n, c)``."""
    r_s = D[:, -1].reshape(-1, 1)
    return 1.0 - np.exp(-(D**2) / (r_s * r_kth_t))


def local_scaling(D: np.ndarray, I: np.ndarray, stats: CalibrationStats) -> np.ndarray:
    """standard LS: 1 - exp(-d^2 / (r_query_kth * r_target_kth))."""
    return local_scaling_rows(D, stats.r_kth[I])


def nicdm_rows(D: np.ndarray, r_mean_t: np.ndarray) -> np.ndarray:
    """NICDM on pre-gathered ``r_mean_t (n, c)``."""
    r_s = D.mean(axis=1, keepdims=True)
    return D / np.sqrt(r_s * r_mean_t)


def nicdm(D: np.ndarray, I: np.ndarray, stats: CalibrationStats) -> np.ndarray:
    """d / sqrt(mean_c(d_query_row) * mean_c(d_t2s)[target])."""
    return nicdm_rows(D, stats.r_mean[I])


def mp_normal_rows(
    D: np.ndarray, mu_t: np.ndarray, sd_t: np.ndarray
) -> np.ndarray:
    """MP-normal on pre-gathered ``mu_t/sd_t (n, c)``."""
    mu_q = np.nanmean(D, axis=1).reshape(-1, 1)
    sd_q = np.nanstd(D, axis=1).reshape(-1, 1)
    p1 = norm_sf(D, mu_q, sd_q)
    p2 = norm_sf(D, mu_t, sd_t)
    return 1.0 - p1 * p2


def mp_normal(D: np.ndarray, I: np.ndarray, stats: CalibrationStats) -> np.ndarray:
    """1 - SF(d; mu_q, sd_q) * SF(d; mu_t[ind], sd_t[ind]) (population sd)."""
    return mp_normal_rows(D, stats.mu[I], stats.sd[I])


#: byte budget for mp_empiric's boolean match intermediate; the kernel
#: chunks the candidate axis to stay under it (c=100 at batch 4096 would
#: otherwise allocate ~4 GB per batch)
MP_EMPIRIC_BUDGET = 128 * 1024 * 1024


def _mp_empiric_chunk(
    D: np.ndarray, I: np.ndarray, ti: np.ndarray, td: np.ndarray,
    j0: int, j1: int,
) -> np.ndarray:
    """One candidate-axis chunk of the empirical joint-exceedance MP.

    ti/td: (n, j1-j0, c2) — the t->s neighbor lists of candidates j0..j1.
    """
    c = D.shape[1]
    default = td[:, :, -1] + 1e-6  # kth distance + eps
    # match[i, j, r, l] = (ti[i, j, r] == I[i, l])
    match = ti[:, :, :, None] == I[:, None, None, :]
    picked = np.where(match, td[:, :, :, None], 0.0).sum(axis=2)
    found = match.any(axis=2)
    d_j = np.where(found, picked, default[:, :, None])  # (n, jc, l)
    thresh = D[:, j0:j1, None]  # (n, jc, 1)
    hits = ((D[:, None, :] > thresh) & (d_j > thresh)).sum(axis=2)
    return 1.0 - hits / c


def mp_empiric(D: np.ndarray, I: np.ndarray, stats: CalibrationStats) -> np.ndarray:
    """Empirical joint-exceedance MP, vectorized over the batch.

    For query i and its candidate j: d_j[l] = distance recorded in target
    j's t->s neighbor list at id I[i, l] if present, else (kth + 1e-6);
    score = 1 - |{l : D[i, l] > D[i, j] and d_j[l] > D[i, j]}| / c.
    Replicates the double loop at mutual_proximity.py:185-212 including its
    id-space quirk (candidate *target* ids looked up among *source*
    neighbor ids). The (n, jc, c2, c) boolean intermediate is chunked over
    the candidate axis to stay under ``MP_EMPIRIC_BUDGET`` bytes.

    This is the BROADCAST transport (t2s lists gathered from the O(m*c)
    stats arrays); ``mp_empiric_rows`` is the shuffle-join transport where
    each row carries its candidates' lists.
    """
    n, c = D.shape
    out = np.empty_like(D)
    c2 = stats.t2s_ind.shape[1]
    jc = max(1, min(c, MP_EMPIRIC_BUDGET // max(1, n * c2 * c)))
    for j0 in range(0, c, jc):
        j1 = min(j0 + jc, c)
        ti = stats.t2s_ind[I[:, j0:j1]]  # (n, jc, c2)
        td = stats.t2s_dist[I[:, j0:j1]]  # (n, jc, c2)
        out[:, j0:j1] = _mp_empiric_chunk(D, I, ti, td, j0, j1)
    return out


def mp_empiric_rows(
    D: np.ndarray, I: np.ndarray, TI: np.ndarray, TD: np.ndarray
) -> np.ndarray:
    """MP-empiric with per-row candidate neighbor lists (join transport).

    TI/TD (n, c, c2): candidate j of query i carries its own t->s list —
    arrived by a shuffle join keyed on target_id, so no O(m*c) broadcast
    state exists anywhere (SURVEY C8's scale design for block-unbounded
    m). Same math as ``mp_empiric``, chunked under MP_EMPIRIC_BUDGET.
    """
    n, c = D.shape
    out = np.empty_like(D)
    c2 = TI.shape[2]
    jc = max(1, min(c, MP_EMPIRIC_BUDGET // max(1, n * c2 * c)))
    for j0 in range(0, c, jc):
        j1 = min(j0 + jc, c)
        out[:, j0:j1] = _mp_empiric_chunk(
            D, I, TI[:, j0:j1], TD[:, j0:j1], j0, j1
        )
    return out


def dsl_preshift_rows(
    D: np.ndarray,
    d2c_t: np.ndarray,
    query_vecs: np.ndarray,
    cand_vecs: np.ndarray,
) -> np.ndarray:
    """DisSimLocal pre-shift distance on pre-gathered ``d2c_t (n, c)``.

    Both transports (broadcast ShardGather and the target_id shuffle join)
    delegate here with identically-ordered ``cand_vecs``, so the tiers are
    byte-identical by construction."""
    cand = cand_vecs  # (n, c, d)
    q = query_vecs[:, None, :]  # (n, 1, d)
    diff = q - cand
    hub = np.einsum("ncd,ncd->nc", diff, diff)  # exact sq euclidean
    centroids = cand.mean(axis=1)  # (n, d)
    qc = query_vecs - centroids
    hub -= np.einsum("nd,nd->n", qc, qc).reshape(-1, 1)
    hub -= d2c_t
    return hub


def dsl_preshift(
    D: np.ndarray,
    I: np.ndarray,
    stats: CalibrationStats,
    query_vecs: np.ndarray,
    cand_vecs: np.ndarray,
) -> np.ndarray:
    """DisSimLocal secondary distance BEFORE the global non-negative shift.

    sqdist(q, t) - ||q - centroid(candidate targets of q)||^2
                 - ||t - centroid(source NNs of t)||^2.
    ``cand_vecs`` is the (n, c, d) per-batch gather of the candidates'
    target vectors (ShardGather — no dense id-indexed matrix exists).
    The global min-shift and optional sqrt (dis_sim.py:168-177) are applied
    in a second pass because the minimum is a global aggregate.
    """
    return dsl_preshift_rows(D, stats.dist_to_centroid[I], query_vecs, cand_vecs)


def dsl_finalize(hub: np.ndarray, global_min: float, squared: bool) -> np.ndarray:
    """Apply the global non-negative shift and optional sqrt (monotonic)."""
    if global_min < 0.0:
        hub = hub - global_min
    if not squared:
        hub = np.sqrt(np.maximum(hub, 0.0))
    return hub


def topk_sorted(
    dist: np.ndarray, ind: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row ascending top-k of (dist, ind), target-id tie-break.

    Semantics of HubnessReduction._sort (base.py:79-87) — argpartition over
    the secondary distance — but with a deterministic, shard-invariant
    tie-break on the neighbor id for exactly-equal secondary distances
    (the reference's argpartition leaves tie order unspecified; id order
    matches the SQL oracles' ``ORDER BY hdist, tid``).
    """
    n, c = dist.shape
    k = min(k, c)
    order = np.lexsort((ind, dist), axis=-1)[:, :k]
    return (
        np.take_along_axis(dist, order, axis=1),
        np.take_along_axis(ind, order, axis=1),
    )


def apply_kernel(
    method: str,
    D: np.ndarray,
    I: np.ndarray,
    stats: CalibrationStats,
    query_vecs: np.ndarray | None = None,
    cand_vecs: np.ndarray | None = None,
) -> np.ndarray:
    if method == "none":
        return D
    if method == "csls":
        return csls(D, I, stats)
    if method == "ls":
        return local_scaling(D, I, stats)
    if method == "nicdm":
        return nicdm(D, I, stats)
    if method == "mp_normal":
        return mp_normal(D, I, stats)
    if method == "mp_empiric":
        return mp_empiric(D, I, stats)
    if method == "dsl":
        return dsl_preshift(D, I, stats, query_vecs, cand_vecs)
    if method in CUSTOM_KERNELS:
        return CUSTOM_KERNELS[method](D, I, stats)
    raise ValueError(f"Unknown hubness method: {method}")

"""Hubness analysis of a neighbor table (reference kiez/analysis).

`hubness_score` reproduces /root/reference/kiez/analysis/estimation.py:197-351
measure-for-measure on a dense neighbor matrix. `k_occurrence_ds` is the
distributed A1 primitive: explode candidate target ids and `groupby().count()`
— the canonical grouped-count shuffle, also used as the hub detector for
skew-aware repartitioning. `hubness_score_ds` runs A1 distributed and the
O(m) scalar measures on the aggregated occurrence vector driver-side (the
vector is one int per target — tiny compared to the neighbor table).
"""

from __future__ import annotations

import math
import warnings

import numpy as np
import pyarrow as pa

from .metrics import truncnorm_third_moment

VALID_HUBNESS_MEASURES = [
    "all",
    "all_but_gini",
    "k_skewness",
    "k_skewness_truncnorm",
    "atkinson",
    "gini",
    "robinhood",
    "antihubs",
    "antihub_occurrence",
    "hubs",
    "hub_occurrence",
    "groupie_ratio",
    "k_occurrence",
]


def skewness(x: np.ndarray) -> float:
    """Population (biased) skewness, matching scipy.stats.skew defaults."""
    x = np.asarray(x, dtype=np.float64)
    mu = x.mean()
    m2 = ((x - mu) ** 2).mean()
    m3 = ((x - mu) ** 3).mean()
    if m2 == 0:
        return 0.0
    return float(m3 / m2**1.5)


def skewness_truncnorm(k_occurrence: np.ndarray) -> float:
    """estimation.py:37-58: third moment of the truncnorm fitted to the
    occurrence mean/std (ddof=1), clip [0, int64 max]."""
    mean = k_occurrence.mean()
    std = k_occurrence.std(ddof=1)
    if std == 0:
        return float("nan")
    a = (0 - mean) / std
    b = (np.iinfo(np.int64).max - mean) / std
    return truncnorm_third_moment(a, b)


def gini_index(k_occurrence: np.ndarray) -> float:
    """Sort-based O(n log n) Gini, exactly equal to the reference's pairwise
    sum formula (estimation.py:61-97): numerator = sum_ij |x_i - x_j| =
    2 * sum_j (2j - n + 1) x_(j) over the ascending sort."""
    x = np.sort(np.asarray(k_occurrence, dtype=np.float64))
    n = x.size
    j = np.arange(n, dtype=np.float64)
    numerator = 2.0 * float(((2.0 * j - n + 1.0) * x).sum())
    denominator = 2.0 * n * float(x.sum())
    return numerator / denominator


def robinhood_index(k_occurrence: np.ndarray) -> float:
    numerator = 0.5 * float(np.sum(np.abs(k_occurrence - k_occurrence.mean())))
    return numerator / float(np.sum(k_occurrence))


def atkinson_index(k_occurrence: np.ndarray, eps: float = 0.5) -> float:
    if eps == 1:
        term = np.prod(k_occurrence) ** (1.0 / k_occurrence.size)
    else:
        term = np.mean(k_occurrence ** (1 - eps)) ** (1 / (1 - eps))
    return float(1.0 - 1.0 / k_occurrence.mean() * term)


def antihub_occurrence(k_occurrence: np.ndarray) -> tuple[np.ndarray, float]:
    antihubs = np.argwhere(k_occurrence == 0).ravel()
    return antihubs, antihubs.size / k_occurrence.size


def hub_occurrence(
    k: int, k_occurrence: np.ndarray, n_test: int, hub_size: float = 2
) -> tuple[np.ndarray, float]:
    hubs = np.argwhere(k_occurrence >= hub_size * k).ravel()
    return hubs, k_occurrence[hubs].sum() / k / n_test


def k_occurrence_from_matrix(nn_ind: np.ndarray, n_targets: int) -> np.ndarray:
    flat = nn_ind.astype(np.int64).ravel()
    flat = flat[flat >= 0]
    return np.bincount(flat, minlength=n_targets)


def _measures_from_occurrence(
    k_occ: np.ndarray,
    k: int,
    n_test: int,
    hub_size: float,
    return_value: str,
    store_k_occurrence: bool,
):
    k_skew = skewness(k_occ)
    k_skew_tn = skewness_truncnorm(k_occ)
    gini = (
        gini_index(k_occ) if return_value in ("gini", "all") else float("nan")
    )
    robin = robinhood_index(k_occ)
    atkinson = atkinson_index(k_occ)
    antihubs, antihub_occ = antihub_occurrence(k_occ)
    hubs, hub_occ = hub_occurrence(k, k_occ, n_test, hub_size)
    groupie = k_occ.max() / n_test / k
    measures = {
        "k_skewness": k_skew,
        "k_skewness_truncnorm": k_skew_tn,
        "atkinson": atkinson,
        "gini": gini,
        "robinhood": robin,
        "antihubs": antihubs,
        "antihub_occurrence": antihub_occ,
        "hubs": hubs,
        "hub_occurrence": hub_occ,
        "groupie_ratio": groupie,
    }
    if store_k_occurrence:
        measures["k_occurrence"] = k_occ
    if return_value == "all":
        return measures
    if return_value == "all_but_gini":
        del measures["gini"]
        return measures
    return measures[return_value]


def hubness_score(
    nn_ind: np.ndarray,
    target_samples: int,
    *,
    k: int | None = None,
    hub_size: float = 2.0,
    return_value: str = "all_but_gini",
    store_k_occurrence: bool = False,
):
    """Reference-parity entry point over a dense (n, c) neighbor matrix.

    n_train (bincount length) follows the reference quirk of using
    nn_ind.shape[0] (estimation.py:272) and n_test = target_samples.
    """
    if return_value not in VALID_HUBNESS_MEASURES:
        raise ValueError(f"unknown return_value: {return_value}")
    n_train = nn_ind.shape[0]
    n_test = target_samples
    k_neighbors = nn_ind
    if k is None:
        k = nn_ind.shape[1]
    elif k < k_neighbors.shape[1]:
        k_neighbors = k_neighbors[:, :k]
    elif k > k_neighbors.shape[1]:
        k = nn_ind.shape[1]
        warnings.warn(f"k > nn_ind.shape[1], k will be set to {k}", stacklevel=2)
    k_occ = k_occurrence_from_matrix(k_neighbors, n_train)
    return _measures_from_occurrence(
        k_occ, k, n_test, hub_size, return_value, store_k_occurrence
    )


# ---------------------------------------------------------------------------
# distributed variants
# ---------------------------------------------------------------------------


def k_occurrence_ds(
    neighbors_ds,
    n_targets,
    k: int | None = None,
):
    """Distributed A1: per-batch partial bincount inside map_batches, then a
    small groupby sum — the pre-aggregate pattern, so the shuffle moves one
    row per (batch, distinct target) instead of one row per candidate slot.

    neighbors_ds rows: (query_id, neigh_ids list<int64>, ...). ``n_targets``
    is either an int (dense target ids 0..n-1) or an explicit int64 array of
    the target-id universe (sparse ids allowed). Returns a Dataset
    (target_id:int64, k_occurrence:int64) including zero rows.
    """
    import ray.data
    from ray.data.aggregate import Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        col = batch["neigh_ids"].combine_chunks()
        c = len(col[0]) if len(col) else 0
        ids = col.values.to_numpy(zero_copy_only=False).reshape(len(batch), c)
        if k is not None and k < c:
            ids = ids[:, :k]
        flat = ids.ravel()
        flat = flat[flat >= 0]
        uniq, cnt = np.unique(flat, return_counts=True)
        return pa.table(
            {
                "target_id": pa.array(uniq, pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    partials = neighbors_ds.map_batches(
        partial_counts, batch_format="pyarrow", zero_copy_batch=True
    )
    counts = partials.groupby("target_id").aggregate(
        Sum("cnt", alias_name="k_occurrence")
    )
    # add zero-occurrence targets (antihubs) without a join: union a zero row
    # per target and re-aggregate; the zeros table is tiny (one int per target)
    universe = (
        np.arange(n_targets, dtype=np.int64)
        if np.isscalar(n_targets)
        else np.asarray(n_targets, dtype=np.int64)
    )
    zeros = ray.data.from_arrow(
        pa.table(
            {
                "target_id": pa.array(universe),
                "k_occurrence": pa.array(np.zeros(len(universe), dtype=np.int64)),
            }
        )
    )
    return (
        counts.union(zeros)
        .groupby("target_id")
        .aggregate(Sum("k_occurrence", alias_name="k_occurrence"))
    )


def hubness_score_ds(
    neighbors_ds,
    target_samples: int,
    n_targets: int,
    *,
    k: int,
    hub_size: float = 2.0,
    return_value: str = "all_but_gini",
    store_k_occurrence: bool = False,
):
    """Distributed hubness score: A1 as a Ray shuffle, scalar measures on the
    aggregated O(n_targets) vector driver-side (estimation.py:297-328)."""
    occ_tbl = k_occurrence_ds(neighbors_ds, n_targets, k=k).to_pandas()
    k_occ = np.zeros(n_targets, dtype=np.int64)
    k_occ[occ_tbl["target_id"].to_numpy()] = occ_tbl["k_occurrence"].to_numpy()
    return _measures_from_occurrence(
        k_occ, k, target_samples, hub_size, return_value, store_k_occurrence
    )

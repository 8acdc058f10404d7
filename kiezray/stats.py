"""Per-target calibration statistics from the t->s search pass.

The reference keeps these as fitted instance attributes in driver memory
(csls.py:53-54, local_scaling.py:82-83, mutual_proximity.py:94-103,
dis_sim.py:104-107). Here they are computed by one streaming pass over the
t->s result Dataset and packed into dense arrays indexed by target row id
(a small O(m) / O(m*c) table) that is broadcast via ``ray.put`` into the
rerank stage — the broadcast-join pattern for small sides.

At 10^12-doc scale the same reductions run *per blocking partition* (m =
targets within one block), so the arrays stay small; the code path is
identical because blocking bounds every search universe.
"""

from __future__ import annotations

import numpy as np
import ray

from .rerank import CalibrationStats


def calibration_stats_table(
    t2s_ds: "ray.data.Dataset", method: str
) -> "ray.data.Dataset":
    """Per-target calibration scalars as a ``(target_id, s1[, s2])`` Dataset.

    This is the shuffle-join transport's stats table
    (``Kiez(stats_transport="join")``): O(m) rows that stay distributed
    and are hash-joined onto exploded candidates keyed on target_id — no
    dense id-indexed array ever exists on the driver or in broadcast
    state, so m (the indexed side) is unbounded by any node's memory.
    The broadcast tier (``compute_calibration_stats``) consumes the same
    reducer, so both tiers see bit-identical scalars.
    """
    import pyarrow as pa

    if method not in ("csls", "nicdm", "ls", "mp_normal"):
        raise ValueError(f"no scalar stats table for method {method!r}")

    def reduce_rows(t: pa.Table) -> pa.Table:
        q = t["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d_col = t["neigh_dists"].combine_chunks()
        k = len(d_col[0]) if len(d_col) else 0
        D = d_col.values.to_numpy(zero_copy_only=False).reshape(len(q), k)
        cols = {"target_id": pa.array(q, pa.int64())}
        if method in ("csls", "nicdm"):
            cols["s1"] = pa.array(D.mean(axis=1), pa.float64())
        elif method == "ls":
            cols["s1"] = pa.array(D[:, -1], pa.float64())
        else:  # mp_normal
            cols["s1"] = pa.array(np.nanmean(D, axis=1), pa.float64())
            cols["s2"] = pa.array(np.nanstd(D, axis=1), pa.float64())
        return pa.table(cols)

    return t2s_ds.map_batches(
        reduce_rows, batch_format="pyarrow", zero_copy_batch=True
    )


def compute_calibration_stats(
    t2s_ds: "ray.data.Dataset",
    method: str,
    n_targets: int,
    n_candidates: int,
) -> CalibrationStats:
    """Reduce the t->s neighbor table into per-target calibration arrays.

    t2s_ds rows: (query_id = target row id, neigh_ids = source row ids
    ascending by distance, neigh_dists). DSL's dist_to_centroid is computed
    by the distributed ``_DslCentroidStage`` in kiez.py instead (it needs
    vector gathers, not just the neighbor table).
    """
    m, c = n_targets, n_candidates
    stats = CalibrationStats(method=method, n_candidates=c)
    if method == "none":
        return stats

    if method in ("csls", "nicdm"):
        stats.r_mean = np.full(m, np.nan)
    elif method == "ls":
        stats.r_kth = np.full(m, np.nan)
    elif method == "mp_normal":
        stats.mu = np.full(m, np.nan)
        stats.sd = np.full(m, np.nan)
    elif method == "mp_empiric":
        stats.t2s_ind = np.full((m, c), -1, dtype=np.int64)
        stats.t2s_dist = np.full((m, c), np.nan)
    else:
        from .rerank import CUSTOM_KERNELS

        if method not in CUSTOM_KERNELS:
            raise ValueError(f"Unknown hubness method: {method}")
        # custom kernels get the full t->s lists (like mp_empiric)
        stats.t2s_ind = np.full((m, c), -1, dtype=np.int64)
        stats.t2s_dist = np.full((m, c), np.nan)

    if method in ("csls", "nicdm", "ls", "mp_normal"):
        # per-row scalars: reduce in WORKERS, driver pulls O(m) floats
        # instead of the O(m*c) neighbor lists
        reduced = calibration_stats_table(t2s_ds, method)
        for batch in reduced.iter_batches(
            batch_size=65536, batch_format="pyarrow"
        ):
            q = batch["target_id"].to_numpy(zero_copy_only=False)
            s1 = batch["s1"].to_numpy(zero_copy_only=False)
            if method in ("csls", "nicdm"):
                stats.r_mean[q] = s1
            elif method == "ls":
                stats.r_kth[q] = s1
            else:
                stats.mu[q] = s1
                stats.sd[q] = batch["s2"].to_numpy(zero_copy_only=False)
        return stats

    for batch in t2s_ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        q = batch["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids_col = batch["neigh_ids"].combine_chunks()
        d_col = batch["neigh_dists"].combine_chunks()
        k = len(ids_col[0]) if len(ids_col) else 0
        I = ids_col.values.to_numpy(zero_copy_only=False).reshape(len(q), k)
        D = d_col.values.to_numpy(zero_copy_only=False).reshape(len(q), k)
        if method == "mp_empiric" or stats.t2s_ind is not None:
            stats.t2s_ind[q] = I
            stats.t2s_dist[q] = D
    return stats

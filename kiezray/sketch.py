"""Approximate-aggregate sketches (training-data pipeline extensions).

The reference has no sketches (SURVEY.md §2.6 "Sketches/approx
aggregates: none"); at 100 TB they are how you answer "how many distinct
documents / which values dominate" without a full shuffle:

 - ``approx_distinct``: HyperLogLog. Each batch reduces to one 2^p-byte
   register row (a combiner partial); partials merge with elementwise max
   in a two-level grouped reduce, so the driver only ever folds a handful
   of 4 KiB rows. Standard bias-corrected estimate with the small-range
   (linear counting) correction.
 - ``heavy_hitters``: Misra-Gries per batch caps every partial at
   ``capacity`` counters (undercounts by at most n_batch/capacity), then
   one small grouped sum + global top-k. The output is a superset-safe
   frequency ranking without shuffling raw values.

Both are deterministic (splitmix64 hashing) — rows-only driver queries
with error-bound tests rather than hash-equality oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .dedup import _splitmix64


def _hash_column(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic 64-bit hashes of an arbitrary column's values."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        vals = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        return _splitmix64(vals)
    # strings etc: pandas' vectorized siphash (fixed key -> deterministic
    # across runs), remixed — ~10x the per-row crc32 loop
    h = pd.util.hash_array(
        np.asarray(col.to_pylist(), dtype=object)
    ).astype(np.uint64)
    return _splitmix64(h)


def _hll_rho(hashes: np.ndarray, p: int) -> tuple:
    """(register index, rho) per hash — rho is the 1-based position of
    the leftmost 1-bit in the remaining 64-p bits."""
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes << np.uint64(p)  # remaining 64-p bits, left-aligned
    rho = np.ones(len(hashes), dtype=np.int64) * (64 - p + 1)
    nz = rest != 0
    if nz.any():
        # count leading zeros via float64 exponent trick is lossy; use
        # a 64-step-free vectorized log2 on the top 53 bits instead.
        # log2 is only ever evaluated on the masked nonzero subsets
        # (no log2(0) RuntimeWarnings / garbage intermediates).
        top = (rest[nz] >> np.uint64(11)).astype(np.float64)  # 53-bit safe
        small = top == 0  # 1-bit only in the lowest 11 bits
        lead = np.empty(len(top), dtype=np.int64)
        lead[~small] = 52 - np.floor(np.log2(top[~small])).astype(np.int64)
        if small.any():
            low = rest[nz][small].astype(np.float64)
            lead[small] = 63 - np.floor(np.log2(low)).astype(np.int64)
        rho[nz] = lead + 1
    return idx, rho


def _hll_registers(hashes: np.ndarray, p: int) -> np.ndarray:
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(hashes) == 0:
        return regs
    idx, rho = _hll_rho(hashes, p)
    np.maximum.at(regs, idx, rho.astype(np.uint8))
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        return float(m * np.log(m / zeros))  # linear counting
    return float(est)


def approx_distinct(
    ds: "ray.data.Dataset", col: str, p: int = 12, fanin: int = 64
) -> float:
    """HyperLogLog distinct-count estimate of ``ds[col]`` (~1.04/sqrt(2^p)
    relative error). Two-level reduce: batch partials -> ``fanin`` grouped
    merges -> one driver fold of ``fanin`` rows."""
    m = 1 << p

    def partial(t: pa.Table) -> pa.Table:
        regs = _hll_registers(_hash_column(t[col]), p)
        grp = int(regs.view(np.uint64)[0] % fanin) if m >= 8 else 0
        return pa.table(
            {
                "grp": pa.array([grp], pa.int32()),
                "regs": pa.FixedSizeListArray.from_arrays(
                    pa.array(regs, pa.uint8()), m
                ),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        R = (
            g["regs"].combine_chunks()
            .values.to_numpy(zero_copy_only=False)
            .reshape(len(g), m)
        )
        out = R.max(axis=0)
        return pa.table(
            {
                "grp": g["grp"].slice(0, 1),
                "regs": pa.FixedSizeListArray.from_arrays(
                    pa.array(out, pa.uint8()), m
                ),
            }
        )

    level1 = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("grp")
        .map_groups(merge, batch_format="pyarrow")
    )
    final = np.zeros(m, dtype=np.uint8)
    for b in level1.iter_batches(batch_format="pyarrow"):
        R = (
            b["regs"].combine_chunks()
            .values.to_numpy(zero_copy_only=False)
            .reshape(len(b), m)
        )
        np.maximum(final, R.max(axis=0), out=final)
    return _hll_estimate(final)


def heavy_hitters(
    ds: "ray.data.Dataset", col: str, k: int = 10, capacity: int = 4096
) -> "ray.data.Dataset":
    """Top-k most frequent values of ``ds[col]`` -> (value, est_count).

    Per-batch Misra-Gries caps every partial at ``capacity`` counters
    (per-batch undercount <= batch_rows/capacity, so est_count is a lower
    bound within n_total/capacity of the true count); partials then take
    one small grouped sum and a global top-k sort.
    """

    def partial(t: pa.Table) -> pa.Table:
        colv = t[col]
        if pa.types.is_integer(colv.type):  # vectorized, no Python boxing
            vals = (
                colv.combine_chunks()
                if isinstance(colv, pa.ChunkedArray)
                else colv
            ).to_numpy(zero_copy_only=False)
            uniq, cnt = np.unique(vals, return_counts=True)
            order = np.argsort(-cnt, kind="stable")
            uniq, cnt = uniq[order], cnt[order]
            labels = uniq.astype(str)
        else:
            s = pd.Series(colv.to_pylist())
            counts = s.value_counts()
            labels = np.array([str(v) for v in counts.index], dtype=object)
            cnt = counts.to_numpy()
        if len(cnt) > capacity:
            # Misra-Gries decrement: keep top `capacity`, subtract the
            # (capacity+1)-th count from the survivors
            cut = int(cnt[capacity])
            labels, cnt = labels[:capacity], cnt[:capacity] - cut
            keep = cnt > 0
            labels, cnt = labels[keep], cnt[keep]
        return pa.table(
            {
                "value": pa.array(labels.tolist(), pa.string()),
                "est_count": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    summed = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("value")
        .aggregate(Sum("est_count", alias_name="est_count"))
    )
    return summed.sort(
        ["est_count", "value"], descending=[True, False]
    ).limit(k)


def approx_quantiles(
    ds: "ray.data.Dataset",
    id_col: str,
    val_col: str,
    qs: tuple = (0.25, 0.5, 0.75),
    sample_size: int = 4096,
    seed: int = 0,
) -> pd.DataFrame:
    """Approximate quantiles from a DETERMINISTIC mergeable bottom-k
    sample: each batch keeps its ``sample_size`` rows of smallest Knuth
    hash priority (a combiner partial), partials fold to the global
    bottom-k — a uniform sample without replacement that is
    partition-invariant and reproducible — and the quantiles are the
    exact ``quantile_disc`` ranks of that sample. Standard order-
    statistic error: |F(est) - q| = O(1/sqrt(sample_size)) whp.

    The cheap tier next to ``quantile.exact_quantiles``: ONE streaming
    pass, O(sample_size) transfer per batch, no iterative refinement —
    right when a few-permille rank error is acceptable (p99 dashboards,
    histogram seeding, partition-boundary estimation). Output: (q,
    value) rows.
    """
    from .sample import _priority

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        pri = _priority(ids, seed)
        if len(pri) > sample_size:
            sel = np.argpartition(pri, sample_size - 1)[:sample_size]
            pri, v = pri[sel], v[sel]
        return pa.table(
            {
                "pri": pa.array(pri.astype(np.int64), pa.int64()),
                "v": pa.array(v, pa.float64()),
            }
        )

    folded = (
        ds.select_columns([id_col, val_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()  # <= sample_size rows per input block
    )
    pri = folded["pri"].to_numpy().astype(np.uint64)
    v = folded["v"].to_numpy()
    if len(pri) > sample_size:
        sel = np.argpartition(pri, sample_size - 1)[:sample_size]
        v = v[sel]
    sv = np.sort(v)
    out = []
    for q in qs:
        rank = max(int(np.ceil(q * len(sv))) - 1, 0)
        out.append((float(q), float(sv[rank])))
    return pd.DataFrame(out, columns=["q", "value"])


def grouped_approx_distinct(
    ds: "ray.data.Dataset", key_col: str, col: str, p: int = 12
) -> "ray.data.Dataset":
    """Per-key HyperLogLog distinct-count estimates (~1.04/sqrt(2^p)
    relative error) — the sketch-groupby: per-batch per-key register
    partials merge under max, so the only exchange is O(keys x blocks)
    fixed-size register rows, never the values. The per-key exact
    sibling is ``relops.grouped_distinct_count``; this is the tier you
    run when the per-key value universe itself is too big to shuffle.

    Output Dataset: (key_col, approx_n float64).
    """
    m = 1 << p

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    key_col: pa.array([], t.schema.field(key_col).type),
                    "regs": pa.array([], pa.list_(pa.uint8(), m)),
                }
            )
        keys = t[key_col].to_numpy(zero_copy_only=False)
        h = _hash_column(t[col])
        ck, uk = pd.factorize(keys)
        regs = np.zeros((len(uk), m), dtype=np.uint8)
        idx, rho = _hll_rho(h, p)
        np.maximum.at(
            regs.reshape(-1), ck.astype(np.int64) * m + idx,
            rho.astype(np.uint8),
        )
        return pa.table(
            {
                key_col: pa.array(uk),
                "regs": pa.FixedSizeListArray.from_arrays(
                    pa.array(regs.reshape(-1), pa.uint8()), m
                ),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        R = (
            g["regs"].combine_chunks()
            .values.to_numpy(zero_copy_only=False)
            .reshape(len(g), m)
        )
        est = _hll_estimate(R.max(axis=0))
        return pa.table(
            {
                key_col: g[key_col].slice(0, 1),
                "approx_n": pa.array([est], pa.float64()),
            }
        )

    return (
        ds.select_columns([key_col, col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .map_groups(merge, batch_format="pyarrow")
    )

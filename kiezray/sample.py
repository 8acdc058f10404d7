"""Deterministic sampling operators (training-data pipeline extensions).

The reference has no sampling (SURVEY.md §2.6); a 100 TB pipeline needs
reproducible subsets that don't depend on partitioning or scan order.
Both operators key off a Knuth multiplicative hash of a column —
``priority(v) = (v * 2654435761) mod 2^32`` — chosen over splitmix64
because the identical arithmetic is expressible in DuckDB (HUGEINT
product, no wrapping-overflow games), so both are byte-exact
oracle-checkable:

 - ``hash_sample``: keep rows with priority < fraction * 2^32 — a
   stateless per-batch filter; every worker makes the same decision for
   the same key, so the sample is stable under any re-partitioning.
 - ``bottomk_sample``: the n rows with globally smallest (priority, key)
   — uniform-without-replacement via bottom-k priorities, computed as
   per-batch partial top-k + one tiny coalesce (no global sort).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_KNUTH = np.uint64(2654435761)
_MOD32 = np.uint64(1 << 32)


def _priority(vals: np.ndarray, seed: int) -> np.ndarray:
    """(v + seed) * 2654435761 mod 2^32 — uint64 arithmetic, no overflow
    (inputs are masked to 32 bits first, so products stay < 2^64)."""
    v = (vals.astype(np.uint64) + np.uint64(seed)) % _MOD32
    return (v * _KNUTH) % _MOD32


def hash_sample(
    ds: "ray.data.Dataset", col: str, fraction: float, seed: int = 0
) -> "ray.data.Dataset":
    """Deterministic ~``fraction`` sample keyed on an integer column."""
    threshold = np.uint64(int(fraction * float(_MOD32)))

    def keep(t: pa.Table) -> pa.Table:
        vals = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(_priority(vals, seed) < threshold))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def bottomk_sample(
    ds: "ray.data.Dataset", col: str, n: int, seed: int = 0
) -> "ray.data.Dataset":
    """The ``n`` rows with smallest (priority, key): a uniform
    without-replacement sample, computed with per-batch partials +
    one coalesce instead of a global sort."""

    def partial(t: pa.Table) -> pa.Table:
        vals = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        pri = _priority(vals, seed)
        order = np.lexsort((vals, pri))[:n]
        return t.take(pa.array(order))

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    )

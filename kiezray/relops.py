"""Relational helper operators built on the coarse-partition pattern.

``grouped_topk`` is the "top documents per domain / best runs per
experiment" workhorse: the key never spans two hash partitions, so each
partition ranks all of its groups with one vectorized lexsort — no
per-group pandas frames, no global sort, no high-cardinality grouped
aggregate (pathologically slow in this Ray version).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def grouped_topk(
    ds: "ray.data.Dataset",
    key_col: str,
    order_col: str,
    k: int,
    descending: bool = True,
    tie_col: str | None = None,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Top-``k`` rows per ``key_col`` ranked by ``order_col``.

    Ties on ``order_col`` break by ``tie_col`` ascending. **WARNING:
    without ``tie_col`` the tie-break falls back to intra-partition row
    position, which is NOT stable under re-partitioning — tied outputs
    can differ run to run.** Pass a unique ``tie_col`` (e.g. the row's
    primary key) whenever deterministic, oracle-matching output matters;
    every oracle-checked caller in this repo does. Adds a ``rank``
    column (1-based within the key).
    """

    def add_part(t: pa.Table) -> pa.Table:
        col = t[key_col]
        if pa.types.is_integer(col.type):
            vals = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            part = (vals % num_partitions).astype(np.int32)
            arr = pa.array(part, pa.int32())
        else:
            arr = pa.array(
                [
                    zlib.crc32(str(v).encode()) % num_partitions
                    for v in col.to_pylist()
                ],
                pa.int32(),
            )
        return t.append_column("__part", arr)

    def topk_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__part"])
        if len(g) == 0:
            return g.assign(rank=pd.Series(dtype=np.int64))
        keys = g[key_col].to_numpy()
        order_vals = g[order_col].to_numpy()
        primary = -order_vals if descending else order_vals
        tie = g[tie_col].to_numpy() if tie_col else np.arange(len(g))
        order = np.lexsort((tie, primary, keys))
        sk = keys[order]
        first = np.concatenate(([True], sk[1:] != sk[:-1]))
        starts = np.flatnonzero(first)
        grp = np.cumsum(first) - 1
        rank = np.arange(len(sk)) - starts[grp]
        sel = rank < k
        out = g.iloc[order[sel]].copy()
        out["rank"] = (rank[sel] + 1).astype(np.int64)
        return out

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(topk_partition, batch_format="pandas")
    )

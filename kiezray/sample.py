"""Deterministic sampling operators (training-data pipeline extensions).

The reference has no sampling (SURVEY.md §2.6); a 100 TB pipeline needs
reproducible subsets that don't depend on partitioning or scan order.
Both operators key off a Knuth multiplicative hash of a column —
``priority(v) = ((v + seed) * 11400714819323198485) mod 2^64`` (the
64-bit golden-ratio multiplier; products wrap even for tiny keys) —
chosen over splitmix64 because the identical arithmetic is expressible
in DuckDB (HUGEINT product stays < 2^127, then
``% 18446744073709551616``), so both are byte-exact oracle-checkable.
The full 64-bit modulus means ids >= 2^32 get distinct priorities (no
low-word twin collisions, the round-2 bias). Keys MUST be non-negative
int64: the engine wraps negatives through uint64 while DuckDB's HUGEINT
``%`` keeps the dividend's sign, so negative keys would diverge from
the oracle (asserted below).

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

_KNUTH = np.uint64(0x9E3779B97F4A7C15)  # 11400714819323198485
_MOD64 = float(1 << 64)


def _priority(vals: np.ndarray, seed: int) -> np.ndarray:
    """((v + seed) * 11400714819323198485) mod 2^64 — uint64 wraparound.

    Requires non-negative int64 keys (DuckDB-oracle parity; see module
    docstring)."""
    if vals.size and int(vals.min()) < 0:
        raise ValueError(
            "sampling keys must be non-negative int64 (negative keys wrap "
            "differently in the engine vs the DuckDB HUGEINT oracle)"
        )
    v = vals.astype(np.uint64) + np.uint64(seed)
    with np.errstate(over="ignore"):
        return v * _KNUTH


def hash_sample(
    ds: "ray.data.Dataset", col: str, fraction: float, seed: int = 0
) -> "ray.data.Dataset":
    """Deterministic ~``fraction`` sample keyed on an integer column."""
    threshold = np.uint64(int(fraction * _MOD64))

    def keep(t: pa.Table) -> pa.Table:
        vals = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(_priority(vals, seed) < threshold))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(
    ds: "ray.data.Dataset",
    strata_col: str,
    id_col: str,
    n: int,
    seed: int = 0,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """The ``n`` rows with smallest (priority, id) WITHIN each stratum —
    a deterministic per-group uniform sample ("keep 10k docs per source /
    per language"), the stratified counterpart of ``bottomk_sample``.

    Scale shape: rows hash-partition on the stratum (a stratum never
    spans two partitions — the ``grouped_topk`` coarse-partition
    pattern), then ONE vectorized lexsort per partition ranks every
    stratum at once; no per-group frames, no global sort, no driver
    state. Priorities are computed on the fly from the id column (never
    stored), so ordering stays exact uint64 and the identical arithmetic
    is DuckDB-expressible (HUGEINT) for byte-exact oracle checks."""
    import pandas as pd

    from .relops import _part_of

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column("__part", _part_of(t[strata_col], num_partitions))

    def sample_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__part"])
        if len(g) == 0:
            return g
        ids = g[id_col].to_numpy().astype(np.int64)
        pri = _priority(ids, seed)
        codes, _ = pd.factorize(g[strata_col].to_numpy())
        order = np.lexsort((ids, pri, codes))
        sc = codes[order]
        first = np.concatenate(([True], sc[1:] != sc[:-1]))
        starts = np.flatnonzero(first)
        grp = np.cumsum(first) - 1
        rank = np.arange(len(sc)) - starts[grp]
        return g.iloc[order[rank < n]].reset_index(drop=True)

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(sample_partition, batch_format="pandas")
    )


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


def deterministic_shuffle(
    ds: "ray.data.Dataset",
    col: str,
    seed: int = 0,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Seeded global shuffle for training-data output: every row gets an
    exact 1-based ``rank`` that is a deterministic permutation of the
    corpus (order by Knuth hash of ``col``, ties by ``col``), identical
    across runs and partitionings — unlike ``ds.random_shuffle()``,
    whose layout depends on block boundaries.

    Scale shape: priorities are one vectorized multiply per batch, and
    the ranking reuses ``relops.global_rank`` (sampled range boundaries
    + bincount offsets + ONE shuffle) — no all-to-all sort of anything
    but range-local data. Writing the result partitioned by
    ``rank // rows_per_shard`` yields reproducible, resumable training
    shards."""
    from .relops import global_rank

    def add_pri(t: pa.Table) -> pa.Table:
        vals = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "__pri", pa.array(_priority(vals, seed), pa.uint64())
        )

    ranked = global_rank(
        ds.map_batches(add_pri, batch_format="pyarrow"),
        "__pri",
        col,
        num_partitions=num_partitions,
    )
    return ranked.drop_columns(["__pri"])


def weighted_sample(
    ds: "ray.data.Dataset",
    id_col: str,
    weight_col: str,
    n: int,
    seed: int = 0,
) -> "ray.data.Dataset":
    """Deterministic weighted sample of ``n`` rows, inclusion probability
    increasing with ``weight_col`` — priority sampling (Duffield, Lund &
    Thorup, JACM 2007): keep the bottom-``n`` rows by ``u / w`` where
    ``u`` is the Knuth integer priority of the id. The training-data use
    is length-proportional document sampling ("longer docs more likely",
    weight = n_chars) with partitioning-invariant, reproducible output.

    Cross-engine exactness: the rank value is one IEEE-754 double
    division of the SAME operands in both engines (the uint64 priority
    cast to double, the weight cast to double) — division is correctly
    rounded, so numpy and DuckDB agree bit-for-bit and the oracle can
    ``ORDER BY CAST(pri AS DOUBLE)/w, id LIMIT n``. Ties break by id.
    Weights must be > 0 (raises otherwise); same non-negative-id
    requirement as :func:`hash_sample`.

    Scale shape: per-batch partial bottom-``n`` + one tiny coalesce — no
    global sort, no shuffle of anything but ``#batches x n`` rows.
    """

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if w.size and w.min() <= 0:
            raise ValueError("weighted_sample requires weights > 0")
        rank = _priority(ids, seed).astype(np.float64) / w
        order = np.lexsort((ids, rank))[:n]
        return t.take(pa.array(order))

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    )


def stratified_quota(
    ds: "ray.data.Dataset",
    stratum_col: str,
    key_col: str,
    n_per_stratum: int,
    seed: int = 7,
) -> "ray.data.Dataset":
    """Exact ``n_per_stratum`` rows from every stratum (or all of a
    smaller stratum), chosen by deterministic Knuth hash priority on
    ``key_col`` — uniform within the stratum, partition-invariant, and
    reproducible. The "balanced eval set: exactly N examples per
    language" pass; the fraction-based ``stratified_sample`` cannot
    guarantee exact quotas.

    Scale shape: delegates to ``relops.grouped_topk`` — per-batch
    partial top-n per stratum (combiner), ONE stratum-hash shuffle of
    the tiny partials, one lexsort per partition. Keys must be
    non-negative int64 (``_priority`` oracle-parity contract).
    """
    import pyarrow as pa

    from .relops import grouped_topk

    def add_priority(t: "pa.Table") -> "pa.Table":
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pri = _priority(k, seed).astype(np.int64)  # int64 view of uint64
        return t.append_column("__pri", pa.array(pri, pa.int64()))

    out = grouped_topk(
        ds.map_batches(add_priority, batch_format="pyarrow"),
        stratum_col,
        "__pri",
        k=n_per_stratum,
        descending=True,  # int64 view ordering — mirrored in the oracle
        tie_col=key_col,
    )
    return out.drop_columns(["__pri", "rank"])


def keyed_hash_sample(
    ds: "ray.data.Dataset",
    key_col: str,
    id_col: str,
    fractions: "dict[str, float]",
    default_fraction: float = 0.0,
    seed: int = 0,
) -> "ray.data.Dataset":
    """Deterministic per-key data MIXING: keep each row with the
    probability assigned to its key — "sample source A at 50%, source
    B at 25%, everything else at 10%", the corpus-reweighting pass that
    turns raw domain counts into a target training mixture (the
    DoReMi / Pile-style domain-weights step).

    Scale shape: a stateless per-batch filter, zero shuffles — the
    (key -> fraction) dict is task-captured (domain lists are tiny by
    nature) and every worker makes the same keep decision for the same
    id, so the mixture is stable under any re-partitioning and across
    incremental runs. Thresholds are ``int(frac * 2^64)`` compared
    against the Knuth priority of ``id_col``: the double products are
    integral-valued (>= 2^57 for any frac >= 2^-6), so Python
    truncation and DuckDB's HUGEINT cast agree bit-for-bit and the op
    is oracle-checkable. Ids must be non-negative int64; fractions
    must lie in [0, 1] — 1.0 keeps a key fully ("keep wiki whole,
    downsample the rest", the standard mixing shape; its SQL threshold
    2^64 exceeds every uint64 priority, mirrored here as an
    unconditional keep since 2^64 itself overflows uint64).
    """
    for f in list(fractions.values()) + [default_fraction]:
        if not (0.0 <= f <= 1.0):
            raise ValueError("fractions must be in [0, 1]")
    thr = {
        k: np.uint64(int(f * _MOD64))
        for k, f in fractions.items()
        if f < 1.0
    }
    full_keys = {k for k, f in fractions.items() if f >= 1.0}
    default_full = default_fraction >= 1.0
    default_thr = (
        np.uint64(0)
        if default_full
        else np.uint64(int(default_fraction * _MOD64))
    )

    def keep(t: "pa.Table") -> "pa.Table":
        import pandas as pd

        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = pd.Series(t[key_col].to_pandas())
        thrs = (
            keys.map(thr)
            .fillna(default_thr)
            .to_numpy()
            .astype(np.uint64)
        )
        mask = _priority(ids, seed) < thrs
        known = keys.isin(thr.keys()) | keys.isin(full_keys)
        if full_keys:
            mask |= keys.isin(full_keys).to_numpy()
        if default_full:
            mask |= ~known.to_numpy()
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)

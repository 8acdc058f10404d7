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
import pyarrow.compute as pc
import ray.data

from .arrowutil import int_bincount


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

    Ties on ``order_col`` break by ``tie_col`` ascending. Without
    ``tie_col`` the tie-break is the full row content (every remaining
    column, stringified, in name order) — deterministic under
    re-partitioning; rows identical in every column are interchangeable,
    so the output row-set is still partition-invariant. Pass a unique
    ``tie_col`` (e.g. the row's primary key) when oracle-matching rank
    assignment matters; every oracle-checked caller in this repo does.
    Adds a ``rank`` column (1-based within the key).
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
        if tie_col:
            tie_keys = (g[tie_col].to_numpy(),)
        else:
            # deterministic fallback: full row content, most-significant
            # tie column first in name order (lexsort keys are listed
            # least-significant first)
            other = sorted(
                c for c in g.columns if c not in (key_col, order_col)
            )
            tie_keys = tuple(
                g[c].astype(str).to_numpy() for c in reversed(other)
            ) or (np.zeros(len(g), dtype=np.int8),)
        order = np.lexsort((*tie_keys, primary, keys))
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


def _part_of(col: "pa.ChunkedArray", num_partitions: int) -> pa.Array:
    """Deterministic partition id for an integer or string key column."""
    if pa.types.is_integer(col.type):
        vals = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.array((vals % num_partitions).astype(np.int32), pa.int32())
    return pa.array(
        [zlib.crc32(str(v).encode()) % num_partitions for v in col.to_pylist()],
        pa.int32(),
    )


def _arrow_schema(ds: "ray.data.Dataset") -> pa.Schema:
    """Dataset schema as a pyarrow.Schema (pandas-block datasets report a
    PandasBlockSchema with numpy dtypes — normalize it)."""
    base = ds.schema().base_schema
    if isinstance(base, pa.Schema):
        return base

    def to_arrow(t):
        if isinstance(t, pa.DataType):
            return t
        if getattr(t, "kind", None) == "O":
            # pandas object columns are strings everywhere in this repo
            return pa.string()
        return pa.from_numpy_dtype(t)

    return pa.schema([(n, to_arrow(t)) for n, t in zip(base.names, base.types)])


def _tagged_union(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key_left: str,
    key_right: str,
    out_fields: "list[tuple[str, pa.DataType]]",
    num_partitions: int,
) -> "ray.data.Dataset":
    """Co-partition two datasets by key hash into one tagged stream.

    Both sides are mapped onto the shared ``out_fields`` schema (columns a
    side lacks become typed nulls), tagged ``__side`` 0/1, and given a
    ``__part`` from the key hash — ONE shuffle then co-locates matching
    keys of both sides in the same group. This is the scale shape for
    any keyed binary operator Ray Data lacks natively: no side is
    broadcast, no side is materialized on the driver."""

    def tag(key_col: str, side: int):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            cols = {}
            for name, typ in out_fields:
                if name in t.column_names:
                    cols[name] = pc.cast(t[name], typ)
                else:
                    cols[name] = pa.nulls(n, typ)
            cols["__side"] = pa.array(np.full(n, side, dtype=np.int8))
            cols["__part"] = _part_of(t[key_col], num_partitions)
            return pa.table(cols)

        return fn

    return left.map_batches(tag(key_left, 0), batch_format="pyarrow").union(
        right.map_batches(tag(key_right, 1), batch_format="pyarrow")
    )


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key_left: str,
    key_right: str,
    on_left: str,
    on_right: str,
    how: str = "inner",
    direction: str = "backward",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Distributed as-of join: for each left row, the right row with the
    same key and the closest ``on_right`` value ≤ ``on_left``
    (``direction="backward"``, DuckDB ``ASOF JOIN ... ON l.on >= r.on``
    semantics; ``"forward"`` flips the inequality).

    Scale shape: both sides hash-partition on the equi-key (ONE shuffle,
    no broadcast, no global sort — ordering is only ever needed within a
    partition), then each partition runs one vectorized
    ``pandas.merge_asof``. Column names must be disjoint across sides;
    the right side must be unique per (key, on) for deterministic output
    (pre-aggregate it — see ``q_asof_join``). With ``how="inner"``,
    unmatched left rows are dropped (detected via the null-ness of the
    matched ``on_right``); ``how="left"`` keeps them with nulls, which
    coerces integer right columns to float64 (pandas NaN semantics) —
    prefer float/timestamp right payloads.
    """
    import pandas as pd

    ls = _arrow_schema(left)
    rs = _arrow_schema(right)
    lf_names = list(ls.names)
    rf_names = list(rs.names)
    overlap = set(lf_names) & set(rf_names)
    if overlap:
        raise ValueError(f"asof_join column collision: {sorted(overlap)}")
    out_fields = [(n, ls.field(n).type) for n in lf_names] + [
        (n, rs.field(n).type) for n in rf_names
    ]

    tagged = _tagged_union(
        left, right, key_left, key_right, out_fields, num_partitions
    )

    out_schema = pa.schema(out_fields)

    def join_partition(g: pa.Table) -> pa.Table:
        # Split sides while still Arrow so null-padded int/timestamp
        # columns never pass through pandas' NaN float coercion.
        side = g["__side"]
        lf = g.filter(pc.equal(side, 0)).select(lf_names).to_pandas()
        rf = g.filter(pc.equal(side, 1)).select(rf_names).to_pandas()
        if len(lf) == 0 or (len(rf) == 0 and how == "inner"):
            return out_schema.empty_table()
        if len(rf) == 0:
            for n in rf_names:
                lf[n] = None
            return pa.Table.from_pandas(
                lf, schema=out_schema, preserve_index=False
            )
        lf = lf.sort_values(on_left, kind="stable")
        rf = rf.sort_values(on_right, kind="stable")
        merged = pd.merge_asof(
            lf,
            rf,
            left_on=on_left,
            right_on=on_right,
            left_by=key_left,
            right_by=key_right,
            direction=direction,
            allow_exact_matches=True,
        )
        if how == "inner":
            merged = merged[merged[on_right].notna()]
        return pa.Table.from_pandas(
            merged.reset_index(drop=True),
            schema=out_schema,
            preserve_index=False,
        )

    return tagged.groupby("__part").map_groups(
        join_partition, batch_format="pyarrow"
    )


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key_left: str,
    key_right: str,
    num_partitions: int = 32,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Distributed inner/left-outer equi-join via co-partitioned tagged
    union.

    The general-purpose shuffle join: both sides hash-partition on the
    equi-key (one shuffle per side, no broadcast — use
    ``ray.put``-broadcast lookup inside ``map_batches`` instead when one
    side is dimension-table small), then each partition runs one
    vectorized ``pandas.merge``. Column names must be disjoint across
    sides (rename upstream). Skewed keys multiply within one partition;
    pre-aggregate or salt hot keys upstream when the value fan-out is
    unbounded.

    ``how="left"`` keeps unmatched left rows with typed nulls on the
    right columns. The matched part still goes through the inner
    ``pandas.merge``; the unmatched part is padded on the ARROW side
    (never through pandas), so right-side int64/timestamp columns keep
    their exact types instead of pandas' NaN float coercion."""
    if how not in ("inner", "left", "full"):
        raise ValueError(
            f"hash_join how must be 'inner', 'left' or 'full', got {how!r}"
        )
    ls = _arrow_schema(left)
    rs = _arrow_schema(right)
    lf_names = list(ls.names)
    rf_names = list(rs.names)
    overlap = set(lf_names) & set(rf_names)
    if overlap:
        raise ValueError(f"hash_join column collision: {sorted(overlap)}")
    out_fields = [(n, ls.field(n).type) for n in lf_names] + [
        (n, rs.field(n).type) for n in rf_names
    ]
    out_schema = pa.schema(out_fields)
    tagged = _tagged_union(
        left, right, key_left, key_right, out_fields, num_partitions
    )

    def _null_pad(lf_t: pa.Table) -> pa.Table:
        cols = {n: lf_t[n] for n in lf_names}
        for n, typ in out_fields[len(lf_names):]:
            cols[n] = pa.nulls(len(lf_t), typ)
        return pa.table(cols, schema=out_schema)

    def _null_pad_right(rf_t: pa.Table) -> pa.Table:
        cols = {n: pa.nulls(len(rf_t), typ) for n, typ in out_fields[: len(lf_names)]}
        for n in rf_names:
            cols[n] = rf_t[n]
        return pa.table(cols, schema=out_schema)

    def join_partition(g: pa.Table) -> pa.Table:
        side = g["__side"]
        lf_t = g.filter(pc.equal(side, 0)).select(lf_names)
        rf_t = g.filter(pc.equal(side, 1)).select(rf_names)
        if len(lf_t) == 0:
            if how == "full" and len(rf_t):
                return _null_pad_right(rf_t)
            return out_schema.empty_table()
        if len(rf_t) == 0:
            if how in ("left", "full"):
                return _null_pad(lf_t)
            return out_schema.empty_table()
        parts = []
        if how in ("left", "full"):
            matched = pc.is_in(lf_t[key_left], value_set=rf_t[key_right])
            matched = pc.fill_null(matched, False)
            unmatched_t = lf_t.filter(pc.invert(matched))
            if len(unmatched_t):
                parts.append(_null_pad(unmatched_t))
            if how == "full":
                # right-unmatched tested against the UNFILTERED left keys;
                # null right keys never match (SQL semantics) and the
                # matched left side below has no null keys, so pandas'
                # NaN-matching quirk can't reintroduce them
                rmatched = pc.fill_null(
                    pc.is_in(rf_t[key_right], value_set=lf_t[key_left]),
                    False,
                )
                unmatched_r = rf_t.filter(pc.invert(rmatched))
                if len(unmatched_r):
                    parts.append(_null_pad_right(unmatched_r))
            lf_t = lf_t.filter(matched)
        lf = lf_t.to_pandas()
        rf = rf_t.to_pandas()
        merged = lf.merge(
            rf, left_on=key_left, right_on=key_right, how="inner"
        )
        inner_t = pa.Table.from_pandas(
            merged.reset_index(drop=True),
            schema=out_schema,
            preserve_index=False,
        )
        if parts:
            return pa.concat_tables([inner_t] + parts)
        return inner_t

    return tagged.groupby("__part").map_groups(
        join_partition, batch_format="pyarrow"
    )


def broadcast_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key_left: str,
    key_right: str,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Inner/left join against a DIMENSION-TABLE-SMALL right side with no
    shuffle at all: the right side is materialized once, put in the
    object store once (``ray.put``), and every map task resolves it
    zero-copy from the local object store — never re-shipped per batch,
    never re-serialized per task. This is the correct join shape when
    one side fits a worker's heap (lookup/code tables, label maps);
    ``hash_join`` is the shuffle shape for two fact-sized sides.

    The left side streams: one ``map_batches`` with a vectorized
    ``pandas.merge`` per batch, preserving backpressure. ``how="left"``
    keeps unmatched left rows (right int columns become float64 via
    pandas NaN semantics — prefer float/string right payloads)."""
    import ray

    ls = _arrow_schema(left)
    rs = _arrow_schema(right)
    lf_names = list(ls.names)
    rf_names = list(rs.names)
    overlap = set(lf_names) & set(rf_names)
    if overlap:
        raise ValueError(f"broadcast_join column collision: {sorted(overlap)}")
    right_tbl = pa.concat_tables(
        [b for b in right.iter_batches(batch_format="pyarrow", batch_size=None)]
        or [rs.empty_table()]
    )
    right_ref = ray.put(right_tbl)

    class Joiner:
        def __init__(self):
            # one object-store fetch per ACTOR, not per batch
            self.right = ray.get(right_ref).to_pandas()

        def __call__(self, t: pa.Table) -> pa.Table:
            lf = t.to_pandas()
            merged = lf.merge(
                self.right, left_on=key_left, right_on=key_right, how=how
            )
            return pa.Table.from_pandas(
                merged.reset_index(drop=True), preserve_index=False
            )

    return left.map_batches(Joiner, concurrency=(1, 8), batch_format="pyarrow")


def _lex_insert_pos(
    rk: np.ndarray,
    rt: np.ndarray,
    qk: np.ndarray,
    qt: np.ndarray,
    side: str,
) -> np.ndarray:
    """Vectorized 2-key lexicographic ``searchsorted``: for each query
    (qk[i], qt[i]), its insertion index into the lexicographically sorted
    pairs (rk, rt) — WITHOUT packing both keys into one integer (packed
    keys silently overflow; see the round-2 windows hazard). One merged
    lexsort over rights+queries, O((n+m) log(n+m))."""
    nr, nq = len(rk), len(qk)
    kk = np.concatenate([rk, qk])
    tt = np.concatenate([rt, qt])
    # tertiary key orders a query before equal rights for side="left"
    # (first index >= query) and after for side="right" (first index >)
    flag = np.empty(nr + nq, dtype=np.int8)
    flag[:nr] = 1 if side == "left" else 0
    flag[nr:] = 0 if side == "left" else 1
    order = np.lexsort((flag, tt, kk))
    pos = np.empty(nr + nq, dtype=np.int64)
    pos[order] = np.arange(nr + nq)
    qpos = pos[nr:]
    # rights before each query = merged position minus queries before it
    qrank = np.empty(nq, dtype=np.int64)
    qrank[np.argsort(qpos, kind="stable")] = np.arange(nq)
    return qpos - qrank


def range_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key_left: str,
    key_right: str,
    on_left: str,
    on_right: str,
    lo,
    hi,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Distributed band (range) join: all pairs with equal key and
    ``lo <= on_right - on_left <= hi`` — the "purchase within N hours of
    a view" attribution / interval-overlap shape Ray Data lacks natively.

    Scale shape: both sides hash-partition on the equi-key (one shuffle
    per side, no broadcast, no global sort), then each partition sorts
    its right rows once and computes every left row's matching window
    [lower, upper) with two vectorized lexicographic merge-searches —
    no per-row Python, no packed composite keys. Pairs are emitted with
    one ``repeat``/``arange`` expansion. Output size is data-dependent
    (sum of per-row window widths); keep the band ``hi - lo`` bounded
    relative to the per-key event density, exactly as you would for a
    windowed aggregate. Timestamp ``on`` columns are compared in their
    raw int64 unit (``lo``/``hi`` must use the same unit). Column names
    must be disjoint across sides."""
    ls = _arrow_schema(left)
    rs = _arrow_schema(right)
    lf_names = list(ls.names)
    rf_names = list(rs.names)
    overlap = set(lf_names) & set(rf_names)
    if overlap:
        raise ValueError(f"range_join column collision: {sorted(overlap)}")
    out_fields = [(n, ls.field(n).type) for n in lf_names] + [
        (n, rs.field(n).type) for n in rf_names
    ]
    out_schema = pa.schema(out_fields)
    tagged = _tagged_union(
        left, right, key_left, key_right, out_fields, num_partitions
    )

    def as_i8(col: "pa.ChunkedArray") -> np.ndarray:
        arr = col.to_numpy(zero_copy_only=False)
        if arr.dtype.kind == "M":
            return arr.view("i8")
        return arr

    def join_partition(g: pa.Table) -> pa.Table:
        side = g["__side"]
        lf = g.filter(pc.equal(side, 0)).select(lf_names)
        rf = g.filter(pc.equal(side, 1)).select(rf_names)
        if len(lf) == 0 or len(rf) == 0:
            return out_schema.empty_table()
        lk = as_i8(lf[key_left])
        lt = as_i8(lf[on_left])
        rk = as_i8(rf[key_right])
        rt = as_i8(rf[on_right])
        r_order = np.lexsort((rt, rk))
        rk_s, rt_s = rk[r_order], rt[r_order]
        lower = _lex_insert_pos(rk_s, rt_s, lk, lt + lo, "left")
        upper = _lex_insert_pos(rk_s, rt_s, lk, lt + hi, "right")
        counts = upper - lower
        total = int(counts.sum())
        if total == 0:
            return out_schema.empty_table()
        li = np.repeat(np.arange(len(lk)), counts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        offs = np.arange(total) - starts.repeat(counts)
        ri = r_order[lower.repeat(counts) + offs]
        lo_t = lf.take(pa.array(li, pa.int64()))
        ro_t = rf.take(pa.array(ri, pa.int64()))
        cols = {n: lo_t[n] for n in lf_names}
        cols.update({n: ro_t[n] for n in rf_names})
        return pa.table(cols).cast(out_schema)

    return tagged.groupby("__part").map_groups(
        join_partition, batch_format="pyarrow"
    )


def distinct_count(
    ds: "ray.data.Dataset",
    key_col: str,
    value_col: str,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Exact ``COUNT(DISTINCT value)`` per key — the two-level combiner
    alternative to ``approx_distinct`` (HLL) when exactness matters.

    Scale shape: each batch first collapses to its distinct (key, value)
    pairs (the combiner — at 100 TB this is where most of the data
    disappears), pairs hash-partition on the PAIR (a given (key, value)
    can never span two partitions), each partition counts its distinct
    pairs per key with one lexsort pass, and a final tiny single-key
    ``groupby().sum()`` folds the per-partition partials. No driver
    state, no per-key group materialization, no value set ever collected
    to one place."""

    def distinct_pair_rows(k: np.ndarray, v: np.ndarray) -> np.ndarray:
        """Row indices of the first occurrence of each distinct (k, v)
        pair — EXACT (factorize codes, not hashes: a hash may only ever
        pick a partition, never define identity)."""
        ck, _ = pd.factorize(k)
        cv, _ = pd.factorize(v)
        order = np.lexsort((cv, ck))
        sk, sv = ck[order], cv[order]
        first = np.concatenate(([True], (sk[1:] != sk[:-1]) | (sv[1:] != sv[:-1])))
        return order[first]

    def pair_hash(k: np.ndarray, v: np.ndarray) -> np.ndarray:
        hk = pd.util.hash_array(np.ascontiguousarray(k)).astype(np.uint64)
        hv = pd.util.hash_array(
            np.ascontiguousarray(v), hash_key="kiezraydistinct0"
        ).astype(np.uint64)
        from .dedup import _splitmix64

        with np.errstate(over="ignore"):
            return _splitmix64(hk * np.uint64(0x9E3779B97F4A7C15) + hv)

    def batch_distinct(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False)
        keep = distinct_pair_rows(k, v)
        out = pa.table(
            {key_col: t[key_col].take(pa.array(keep)),
             value_col: t[value_col].take(pa.array(keep))}
        )
        part = (pair_hash(k[keep], v[keep]) % np.uint64(num_partitions)).astype(
            np.int32
        )
        return out.append_column("__part", pa.array(part, pa.int32()))

    def partition_counts(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key_col].to_numpy()
        v = g[value_col].to_numpy()
        keep = distinct_pair_rows(k, v)
        codes, uniques = pd.factorize(k[keep])
        cnt = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
        return pd.DataFrame({key_col: uniques, "partial": cnt})

    parts = (
        ds.map_batches(batch_distinct, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(partition_counts, batch_format="pandas")
    )
    agg = parts.groupby(key_col).sum("partial")
    return agg.map_batches(
        lambda df: pd.DataFrame(
            {
                key_col: df[key_col],
                "distinct_values": df["sum(partial)"].astype(np.int64),
            }
        ),
        batch_format="pandas",
    )


def semi_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key_left: str,
    key_right: str,
    anti: bool = False,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Keyed semi join (``anti=False``: left rows whose key exists on the
    right) / anti join (``anti=True``: left rows whose key does NOT).

    The training-data workhorse for "drop documents already in the
    corpus" / "keep only rows with a matching label". Scale shape: the
    right side is reduced to its key column, both sides hash-partition
    on the key (one shuffle), and membership is one ``np.isin`` per
    partition — no broadcast keep-set, no driver state."""

    ls = _arrow_schema(left)
    lf_names = list(ls.names)
    key_typ = ls.field(key_left).type if key_left in lf_names else (
        _arrow_schema(right).field(key_right).type
    )
    out_fields = [(n, ls.field(n).type) for n in lf_names]
    if key_left not in lf_names:
        out_fields.append((key_left, key_typ))

    rkeys = right.map_batches(
        lambda t: pa.table({key_left: t[key_right]}),
        batch_format="pyarrow",
    )
    tagged = _tagged_union(
        left, rkeys, key_left, key_left, out_fields, num_partitions
    )

    def filter_partition(g: pa.Table) -> pa.Table:
        side = g["__side"]
        lf = g.filter(pc.equal(side, 0)).select(lf_names)
        rk = g.filter(pc.equal(side, 1))[key_left]
        lk = lf[key_left]
        if pa.types.is_integer(lk.type):
            keep = np.isin(
                lk.to_numpy(zero_copy_only=False),
                np.unique(rk.to_numpy(zero_copy_only=False)),
            )
        else:
            keep = pc.is_in(lk, value_set=rk.combine_chunks().unique())
            keep = keep.to_numpy(zero_copy_only=False)
        if anti:
            keep = ~keep
        return lf.filter(pa.array(keep))

    return tagged.groupby("__part").map_groups(
        filter_partition, batch_format="pyarrow"
    )


def pivot_count(
    ds: "ray.data.Dataset",
    row_key: str,
    col_key: str,
    col_values: "list[str]",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Crosstab: one output row per ``row_key``, one int64 count column
    per entry of ``col_values`` — the "events per user by type" /
    "documents per domain by language" wide-profile shape.

    Like SQL's ``sum(CASE WHEN col = v THEN 1 END)`` pivot, the output
    column set is STATIC (``col_values``, declared up front, unknown
    values are ignored) so the schema is deterministic and never depends
    on which values a partition happens to see.

    Scale shape: each batch collapses to partial (row, col-index, cnt)
    rows with one lexsort + ``add.reduceat`` (the combiner — the raw
    event stream never leaves the worker un-aggregated), partials
    hash-partition on ``row_key`` (a row never spans two partitions),
    and each partition folds its partials with one more lexsort +
    reduceat, then scatters counts into the wide (rows × columns) block.
    No packed composite keys (no overflow hazard), no high-cardinality
    grouped aggregate, no driver state.
    """
    cmap = {v: i for i, v in enumerate(col_values)}
    ncols = len(col_values)

    def fold(row: np.ndarray, ci: np.ndarray, cnt: np.ndarray):
        order = np.lexsort((ci, row))
        row, ci, cnt = row[order], ci[order], cnt[order]
        first = np.concatenate(
            ([True], (row[1:] != row[:-1]) | (ci[1:] != ci[:-1]))
        )
        starts = np.flatnonzero(first)
        return row[starts], ci[starts], np.add.reduceat(cnt, starts)

    value_set = pa.array(col_values)

    def partial(t: pa.Table) -> pa.Table:
        # Arrow-kernel value lookup (unknown values -> null -> -1)
        ci_arr = pc.fill_null(
            pc.index_in(t[col_key], value_set=value_set), -1
        )
        ci = ci_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ci >= 0
        row = t[row_key].to_numpy(zero_copy_only=False)[keep]
        if len(row) == 0:
            return pa.table(
                {
                    "__row": pa.array([], pa.int64()),
                    "__ci": pa.array([], pa.int64()),
                    "__cnt": pa.array([], pa.int64()),
                    "__part": pa.array([], pa.int32()),
                }
            )
        urow, uci, cnt = fold(row, ci[keep], np.ones(len(row), dtype=np.int64))
        part = (urow.astype(np.uint64) % num_partitions).astype(np.int32)
        return pa.table(
            {
                "__row": pa.array(urow, pa.int64()),
                "__ci": pa.array(uci, pa.int64()),
                "__cnt": pa.array(cnt, pa.int64()),
                "__part": pa.array(part, pa.int32()),
            }
        )

    def widen(g: pa.Table) -> pa.Table:
        row = g["__row"].to_numpy(zero_copy_only=False)
        urow, uci, cnt = fold(
            row,
            g["__ci"].to_numpy(zero_copy_only=False),
            g["__cnt"].to_numpy(zero_copy_only=False),
        )
        rows = np.unique(urow)  # sorted
        rpos = np.searchsorted(rows, urow)
        wide = np.zeros((len(rows), ncols), dtype=np.int64)
        wide[rpos, uci] = cnt
        cols = {row_key: pa.array(rows, pa.int64())}
        for v, i in cmap.items():
            cols[v] = pa.array(wide[:, i], pa.int64())
        return pa.table(cols)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(widen, batch_format="pyarrow")
    )


def global_rank(
    ds: "ray.data.Dataset",
    order_col: str,
    tie_col: str,
    num_partitions: int = 32,
    sample_n: int = 4096,
    seed: int = 0,
    checkpoint: bool = True,
) -> "ray.data.Dataset":
    """Exact global 1-based row numbers ordered by (``order_col`` asc,
    ``tie_col`` asc) — SQL ``row_number() OVER (ORDER BY o, t)``, which
    Ray Data has no native operator for. ``tie_col`` must be unique so
    the total order (and therefore every rank) is deterministic.

    Scale shape (the classic distributed zip-with-index, no all-to-all
    sort of anything but range-local data):

    1. a tiny deterministic sample (hash-priority bottom-k on
       ``tie_col``) gives value boundaries — they control only partition
       BALANCE, never correctness;
    2. every row is range-tagged by ``searchsorted`` (equal values always
       land in the same range, so cross-range order is total);
    3. per-range counts come from per-batch ``bincount`` partials — a
       tiny no-shuffle fold (``num_partitions`` ints per batch) whose
       prefix sum is each range's global rank offset;
    4. ONE shuffle groups each range, one lexsort ranks it, the offset
       lands the global number.

    ``checkpoint=True`` materializes the tagged dataset once so steps 3
    and 4 don't recompute the upstream twice — the right trade when the
    input pipeline is more expensive than holding its blocks (they spill
    to the object store); pass ``False`` to stay fully streaming and
    recompute instead.
    """
    from .sample import bottomk_sample

    samp = bottomk_sample(
        ds.select_columns([order_col, tie_col]), tie_col, sample_n, seed
    ).to_pandas()
    sv = np.sort(samp[order_col].to_numpy())
    if len(sv) > 1:
        cut = np.linspace(0, len(sv) - 1, num_partitions + 1).astype(int)[1:-1]
        boundaries = np.unique(sv[cut])
    else:
        boundaries = sv[:0]
    nparts = len(boundaries) + 1

    def tag(t: pa.Table) -> pa.Table:
        v = t[order_col].to_numpy(zero_copy_only=False)
        part = np.searchsorted(boundaries, v, side="left").astype(np.int32)
        return t.append_column("__part", pa.array(part, pa.int32()))

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    if checkpoint:
        tagged = tagged.materialize()

    def part_counts(t: pa.Table) -> pa.Table:
        c = np.bincount(
            t["__part"].to_numpy(zero_copy_only=False), minlength=nparts
        ).astype(np.int64)
        return pa.table(
            {"p": pa.array(np.arange(nparts), pa.int32()),
             "c": pa.array(c, pa.int64())}
        )

    counts = np.zeros(nparts, dtype=np.int64)
    for b in tagged.map_batches(
        part_counts, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        np.add.at(
            counts,
            b["p"].to_numpy(zero_copy_only=False),
            b["c"].to_numpy(zero_copy_only=False),
        )
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))

    def rank_partition(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return g.drop(columns=["__part"]).assign(
                rank=pd.Series(dtype=np.int64)
            )
        p = int(g["__part"].iloc[0])
        g = g.drop(columns=["__part"])
        order = np.lexsort((g[tie_col].to_numpy(), g[order_col].to_numpy()))
        out = g.iloc[order].copy()
        out["rank"] = offsets[p] + np.arange(1, len(g) + 1, dtype=np.int64)
        return out

    return tagged.groupby("__part").map_groups(
        rank_partition, batch_format="pandas"
    )


def pack_sequences(
    counts_ds: "ray.data.Dataset",
    id_col: str,
    count_col: str,
    chunk_tokens: int,
    num_partitions: int = 32,
    sample_n: int = 4096,
    seed: int = 0,
    checkpoint: bool = True,
) -> "ray.data.Dataset":
    """Concat-and-chunk sequence packing — the standard LLM-pretraining
    batch layout: documents are concatenated in ``id_col`` order into one
    global token stream, the stream is cut every ``chunk_tokens`` tokens,
    and each (chunk, doc) overlap is emitted as a row
    ``(chunk_id, id, tok_start, tok_end)`` with the doc-relative token
    subrange ``[tok_start, tok_end)`` that lands in that chunk. Docs
    longer than a chunk span several rows; docs with ``count <= 0``
    contribute nothing (and no row).

    Input is the (id, token-count) table — compute counts upstream with
    ``textops.token_counts`` or any tokenizer stage. ``id_col`` must be
    unique; the packing is totally determined by the ids and counts, so
    the output is partitioning-invariant and resumable.

    Scale shape (same distributed prefix-sum skeleton as
    ``global_rank``): sampled id boundaries range-partition the docs (one
    shuffle), per-range token totals come from tiny per-batch partials
    whose prefix sum is each range's global stream offset, and each range
    then needs ONE lexsort + cumsum + a repeat/arange explode — no global
    sort, no driver-side doc state, chunk rows stream out as they're
    computed.
    """
    from .sample import bottomk_sample

    samp = bottomk_sample(
        counts_ds.select_columns([id_col, count_col]), id_col, sample_n, seed
    ).to_pandas()
    sv = np.sort(samp[id_col].to_numpy())
    if len(sv) > 1:
        cut = np.linspace(0, len(sv) - 1, num_partitions + 1).astype(int)[1:-1]
        boundaries = np.unique(sv[cut])
    else:
        boundaries = sv[:0]
    nparts = len(boundaries) + 1

    def tag(t: pa.Table) -> pa.Table:
        v = t[id_col].to_numpy(zero_copy_only=False)
        part = np.searchsorted(boundaries, v, side="left").astype(np.int32)
        return t.append_column("__part", pa.array(part, pa.int32()))

    tagged = counts_ds.map_batches(tag, batch_format="pyarrow")
    if checkpoint:
        tagged = tagged.materialize()

    def part_sums(t: pa.Table) -> pa.Table:
        p = t["__part"].to_numpy(zero_copy_only=False)
        c = np.maximum(t[count_col].to_numpy(zero_copy_only=False), 0)
        s = np.zeros(nparts, dtype=np.int64)
        np.add.at(s, p, c.astype(np.int64))
        return pa.table(
            {"p": pa.array(np.arange(nparts), pa.int32()),
             "s": pa.array(s, pa.int64())}
        )

    totals = np.zeros(nparts, dtype=np.int64)
    for b in tagged.map_batches(
        part_sums, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        np.add.at(
            totals,
            b["p"].to_numpy(zero_copy_only=False),
            b["s"].to_numpy(zero_copy_only=False),
        )
    range_off = np.concatenate(([0], np.cumsum(totals)[:-1]))
    B = int(chunk_tokens)

    def explode_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "chunk_id": pd.Series(dtype=np.int64),
                id_col: pd.Series(dtype=np.int64),
                "tok_start": pd.Series(dtype=np.int64),
                "tok_end": pd.Series(dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        p = int(g["__part"].iloc[0])
        ids = g[id_col].to_numpy()
        cnt = np.maximum(g[count_col].to_numpy().astype(np.int64), 0)
        order = np.argsort(ids, kind="stable")
        ids, cnt = ids[order], cnt[order]
        off = range_off[p] + np.cumsum(cnt) - cnt  # each doc's stream start
        keep = cnt > 0
        ids, cnt, off = ids[keep], cnt[keep], off[keep]
        if len(ids) == 0:
            return empty
        first_chunk = off // B
        last_chunk = (off + cnt - 1) // B
        spans = (last_chunk - first_chunk + 1).astype(np.int64)
        total = int(spans.sum())
        di = np.repeat(np.arange(len(ids)), spans)
        starts = np.concatenate(([0], np.cumsum(spans)[:-1]))
        chunk = first_chunk[di] + (np.arange(total) - starts[di])
        tok_start = np.maximum(chunk * B, off[di]) - off[di]
        tok_end = np.minimum((chunk + 1) * B, off[di] + cnt[di]) - off[di]
        return pd.DataFrame(
            {
                "chunk_id": chunk.astype(np.int64),
                id_col: ids[di],
                "tok_start": tok_start.astype(np.int64),
                "tok_end": tok_end.astype(np.int64),
            }
        )

    return tagged.groupby("__part").map_groups(
        explode_partition, batch_format="pandas"
    )


def bloom_semi_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key_left: str,
    key_right: str,
    m_bits: int = 1 << 22,
    k_hashes: int = 4,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Semi join with a Bloom-filter pre-pass: result-identical to
    ``semi_join`` (the filter only DISCARDS rows that provably have no
    match; survivors still go through the exact keyed verify), but the
    expensive shuffle only moves left rows that pass the filter.

    Scale shape: each right-side batch emits its distinct key hashes (a
    tiny combiner partial), the driver folds them into one m_bits bitmap
    (512 KiB at the default — the right side of a semi join is the small
    side by definition), the bitmap broadcasts once via ``ray.put``, and
    the left side tests k splitmix probes per row fully vectorized. At a
    1% match rate this cuts the exact join's shuffle volume ~100x —
    false positives (~(1-e^{-kn/m})^k) only cost verify work, never
    correctness.
    """
    from .dedup import _splitmix64

    words = m_bits // 64

    def right_hashes(t: pa.Table) -> pa.Table:
        k = t[key_right].to_numpy(zero_copy_only=False)
        h = np.unique(pd.util.hash_array(k).astype(np.uint64))
        return pa.table({"h": pa.array(h.astype(np.int64), pa.int64())})

    partials = right.map_batches(
        right_hashes, batch_format="pyarrow"
    ).to_arrow_refs()
    bits = np.zeros(words, dtype=np.uint64)
    seeds = np.arange(1, k_hashes + 1, dtype=np.uint64) * np.uint64(
        0x9E3779B97F4A7C15
    )
    for ref in partials:  # driver folds tiny distinct-hash partials
        h = ray.get(ref)["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        for s in seeds:
            p = _splitmix64(h ^ s) % np.uint64(m_bits)
            np.bitwise_or.at(
                bits, (p >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (p & np.uint64(63)),
            )
    bits_ref = ray.put(bits)

    class BloomFilter:
        def __init__(self):
            self.bits = ray.get(bits_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            k = t[key_left].to_numpy(zero_copy_only=False)
            h = pd.util.hash_array(k).astype(np.uint64)
            keep = np.ones(len(t), dtype=bool)
            for s in seeds:
                p = _splitmix64(h ^ s) % np.uint64(m_bits)
                word = self.bits[(p >> np.uint64(6)).astype(np.int64)]
                keep &= (
                    word >> (p & np.uint64(63)) & np.uint64(1)
                ).astype(bool)
            return t.filter(pa.array(keep))

    survivors = left.map_batches(
        BloomFilter,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    return semi_join(
        survivors, right, key_left, key_right,
        num_partitions=num_partitions,
    )


def grouped_rank(
    ds: "ray.data.Dataset",
    key_col: str,
    order_col: str,
    tie_col: str,
    ascending: bool = True,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Per-key dense row numbering — SQL ``row_number() OVER (PARTITION
    BY key ORDER BY order_col, tie_col)`` — appended as ``rank``
    (1-based). ``tie_col`` must be unique per key so ranks are
    deterministic and partitioning-invariant.

    Same scale shape as ``grouped_topk``: one key-hash shuffle, then ONE
    lexsort per partition ranks every key's rows together (rank = row
    position minus the key run's start) — no per-key dispatch, no global
    sort.
    """
    from .dedup import _splitmix64

    def add_part(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (
            _splitmix64(k.astype(np.uint64)) % np.uint64(num_partitions)
        ).astype(np.int32)
        return t.append_column("__part", pa.array(part, pa.int32()))

    def rank_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__part"])
        if len(g) == 0:
            g["rank"] = pd.Series(dtype=np.int64)
            return g
        keys = g[key_col].to_numpy()
        o = g[order_col].to_numpy()
        t = g[tie_col].to_numpy()
        if not ascending:
            if o.dtype.kind in "iuf":
                o = -o
            else:  # descending for any dtype via dense-rank inversion
                _, inv = np.unique(o, return_inverse=True)
                o = -inv
        order = np.lexsort((t, o, keys))
        sk = keys[order]
        starts_mask = np.concatenate(([True], sk[1:] != sk[:-1]))
        run_start = np.maximum.accumulate(
            np.where(starts_mask, np.arange(len(sk)), 0)
        )
        rank = np.arange(len(sk)) - run_start + 1
        out = g.iloc[order].copy()
        out["rank"] = rank.astype(np.int64)
        return out

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(rank_partition, batch_format="pandas")
    )


def grouped_ntile(
    ds: "ray.data.Dataset",
    key_col: str,
    order_col: str,
    tie_col: str,
    n: int,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Per-key NTILE — SQL ``ntile(n) OVER (PARTITION BY key ORDER BY
    order_col, tie_col)`` — appended as ``tile`` (1-based). Implements
    SQL's exact fill rule: the first ``cnt % n`` tiles of a key get
    ``cnt // n + 1`` rows, the rest ``cnt // n`` (each of the first
    ``cnt`` tiles gets one row when ``n > cnt``). ``tie_col`` must be
    unique per key for deterministic, partitioning-invariant tiles.

    Same scale shape as :func:`grouped_rank`: one key-hash shuffle, ONE
    lexsort per partition, tile computed arithmetically from each row's
    position in its key run — no per-key dispatch, no global sort.
    """
    from .dedup import _splitmix64

    def add_part(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (
            _splitmix64(k.astype(np.uint64)) % np.uint64(num_partitions)
        ).astype(np.int32)
        return t.append_column("__part", pa.array(part, pa.int32()))

    def tile_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__part"])
        if len(g) == 0:
            g["tile"] = pd.Series(dtype=np.int64)
            return g
        keys = g[key_col].to_numpy()
        order = np.lexsort((g[tie_col].to_numpy(),
                            g[order_col].to_numpy(), keys))
        sk = keys[order]
        starts_mask = np.concatenate(([True], sk[1:] != sk[:-1]))
        starts = np.flatnonzero(starts_mask)
        lengths = np.diff(np.append(starts, len(sk)))
        run_start = np.repeat(starts, lengths)
        cnt = np.repeat(lengths, lengths)
        i = np.arange(len(sk)) - run_start  # 0-based position in key run
        big = cnt % n          # tiles that get one extra row
        size_big = cnt // n + 1
        small = np.maximum(cnt // n, 1)  # guard n > cnt (big branch wins)
        in_big = i < big * size_big
        tile = np.where(
            in_big,
            i // size_big,
            big + (i - big * size_big) // small,
        ) + 1
        out = g.iloc[order].copy()
        out["tile"] = tile.astype(np.int64)
        return out

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(tile_partition, batch_format="pandas")
    )


def _row_keys(t: pa.Table, cols: list[str]) -> "tuple[np.ndarray, np.ndarray]":
    """128-bit whole-row content identity (two independent sip-hash
    streams, column-mixed) — the same keying convention as
    ``dedup.dedup_exact`` (collision odds ~2^-64 per pair: identity for
    grouping, not cryptography)."""
    from .dedup import _splitmix64

    h1 = np.zeros(len(t), dtype=np.uint64)
    h2 = np.zeros(len(t), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in cols:
            arr = t[c].to_numpy(zero_copy_only=False)
            h1 = _splitmix64(
                h1 * np.uint64(31) + pd.util.hash_array(arr).astype(np.uint64)
            )
            h2 = _splitmix64(
                h2 * np.uint64(31)
                + pd.util.hash_array(arr, hash_key="kiezraysetops2k_").astype(
                    np.uint64
                )
            )
    return h1, h2


def table_set_op(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    op: str = "intersect",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """SQL set operators over whole rows: ``INTERSECT`` (distinct rows in
    both) / ``EXCEPT`` (distinct left rows not on the right). Schemas
    must match by column name.

    Scale shape: each side maps to (row, 128-bit row key) and
    hash-partitions on the key (one shuffle; a row value never spans two
    partitions), then each partition deduplicates its left rows and
    keeps/drops them by a two-column merge against the right keys — no
    broadcast, no driver state.
    """
    if op not in ("intersect", "except"):
        raise ValueError(f"op must be 'intersect' or 'except', got {op!r}")
    cols = list(_arrow_schema(left).names)

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            h1, h2 = _row_keys(t, cols)
            out = t.select(cols)
            out = out.append_column(
                "__ch1", pa.array(h1.astype(np.int64), pa.int64())
            ).append_column(
                "__ch2", pa.array(h2.astype(np.int64), pa.int64())
            ).append_column(
                "__side", pa.array(np.full(len(t), side, dtype=np.int8))
            ).append_column(
                "__part",
                pa.array(
                    (h1 % np.uint64(num_partitions)).astype(np.int32),
                    pa.int32(),
                ),
            )
            return out

        return fn

    tagged = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.select_columns(cols).map_batches(tag(1), batch_format="pyarrow")
    )

    def op_partition(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["__side"] == 0].drop_duplicates(["__ch1", "__ch2"])
        rk = g[g["__side"] == 1][["__ch1", "__ch2"]].drop_duplicates()
        if op == "intersect":
            out = lf.merge(rk, on=["__ch1", "__ch2"], how="inner")
        else:
            out = lf.merge(
                rk, on=["__ch1", "__ch2"], how="left", indicator=True
            )
            out = out[out["_merge"] == "left_only"].drop(columns=["_merge"])
        return out.drop(
            columns=["__ch1", "__ch2", "__side", "__part"]
        ).reset_index(drop=True)

    return tagged.groupby("__part").map_groups(
        op_partition, batch_format="pandas"
    )


def snapshot_diff(
    old: "ray.data.Dataset",
    new: "ray.data.Dataset",
    key_col: str,
    val_col: str,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """CDC diff of two keyed snapshots (one row per key per side):
    classify every key as ``added`` / ``removed`` / ``changed`` /
    ``unchanged`` with both values attached — the change-data-capture
    primitive for incremental corpus maintenance.

    Scale shape: the shared ``_tagged_union`` co-partitions both sides
    by key hash in ONE shuffle (no broadcast, no driver state); each
    partition resolves its keys with one vectorized outer merge. Value
    comparison is exact on the stored doubles (no arithmetic is
    applied to them)."""
    import pandas as pd

    out_fields = [(key_col, pa.int64()), (val_col, pa.float64())]
    tagged = _tagged_union(
        old, new, key_col, key_col, out_fields, num_partitions
    )

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["__side"] == 0][[key_col, val_col]]
        n = g[g["__side"] == 1][[key_col, val_col]]
        m = o.merge(n, on=key_col, how="outer", suffixes=("_old", "_new"))
        ov, nv = m[f"{val_col}_old"], m[f"{val_col}_new"]
        status = np.where(
            ov.isna(), "added",
            np.where(nv.isna(), "removed",
                     np.where(ov != nv, "changed", "unchanged")),
        )
        return pd.DataFrame(
            {
                key_col: m[key_col].to_numpy(),
                "old_val": ov.to_numpy(),
                "new_val": nv.to_numpy(),
                "status": status,
            }
        )

    return tagged.groupby("__part").map_groups(
        classify, batch_format="pandas"
    )


def grouped_distinct_count(
    ds: "ray.data.Dataset",
    key_col: str,
    val_col: str,
    out_col: str = "distinct_cnt",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Exact per-key ``COUNT(DISTINCT val)`` over two int64 columns.

    Scale shape: an in-batch distinct-pair combiner (lexsort + change
    mask) collapses every batch to its unique (key, val) pairs before
    ONE coarse key-hash shuffle of the two int64 columns; each
    partition re-sorts its pairs once and counts runs per key with a
    reduceat — no per-key Python sets, no driver state, traffic is
    O(distinct pairs) not O(rows). The exact companion to the
    HLL-approximate ``sketch.grouped_hll`` tier."""

    schema = pa.schema([(key_col, pa.int64()), ("__v", pa.int64())])

    def distinct_pairs(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(k) == 0:
            return schema.empty_table()
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        keep = np.concatenate(
            ([True], (k[1:] != k[:-1]) | (v[1:] != v[:-1]))
        )
        return pa.table(
            {key_col: pa.array(k[keep]), "__v": pa.array(v[keep])}
        )

    def add_part(t: pa.Table) -> pa.Table:
        part = pc.cast(
            pc.bit_wise_and(
                t[key_col], pa.scalar(num_partitions - 1, pa.int64())
            ),
            pa.int32(),
        )
        return t.append_column("__part", part)

    def count_partition(g: pa.Table) -> pa.Table:
        k = g[key_col].to_numpy(zero_copy_only=False)
        v = g["__v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        new_pair = np.concatenate(
            ([True], (k[1:] != k[:-1]) | (v[1:] != v[:-1]))
        )
        k, ones = k[new_pair], np.ones(int(new_pair.sum()), np.int64)
        starts = np.flatnonzero(
            np.concatenate(([True], k[1:] != k[:-1]))
        )
        return pa.table(
            {
                key_col: pa.array(k[starts], pa.int64()),
                out_col: pa.array(
                    np.add.reduceat(ones, starts), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(distinct_pairs, batch_format="pyarrow",
                       zero_copy_batch=True)
        .map_batches(add_part, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("__part")
        .map_groups(
            lambda g: count_partition(g.select([key_col, "__v"])),
            batch_format="pyarrow",
        )
    )


def key_skew(
    ds: "ray.data.Dataset",
    key_col: str,
    top: int = 20,
    num_partitions: int = 32,
) -> pd.DataFrame:
    """Exact key-skew report: the ``top`` heaviest keys by row count
    (ties by key ascending) plus each key's share of all rows — the
    diagnostic you run BEFORE choosing a partition key, to find the hub
    keys that need salting.

    Scale shape (the ``dup_ngrams`` discovery shape): per-batch key
    counts (combiner), key-hash partition fold with one groupby-sum per
    partition, partition-local top-``top`` (safe: a key lives in one
    partition), driver merges <= partitions x top rows; the total row
    count is the sum of the partition masses riding alongside.
    """
    from .dedup import _splitmix64

    def partial(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False)
        uk, cnt = np.unique(k, return_counts=True)
        if uk.dtype.kind in "iu":
            part = (
                _splitmix64(uk.astype(np.uint64)) % np.uint64(num_partitions)
            ).astype(np.int32)
        else:
            part = (
                pd.util.hash_array(uk.astype(object)).astype(np.uint64)
                % np.uint64(num_partitions)
            ).astype(np.int32)
        return pa.table(
            {
                key_col: pa.array(uk),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
                "__part": pa.array(part, pa.int32()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {key_col: pd.Series(dtype=object),
                 "n": pd.Series(dtype=np.int64),
                 "__pid": pd.Series(dtype=np.int32),
                 "__ptotal": pd.Series(dtype=np.int64)}
            )
        pid = int(g["__part"].iloc[0])
        f = g.groupby(key_col, as_index=False, sort=False)["n"].sum()
        ptotal = int(f["n"].sum())
        f = f.sort_values(["n", key_col], ascending=[False, True]).head(top)
        f["__pid"] = np.int32(pid)
        f["__ptotal"] = np.int64(ptotal)  # partition mass rides along
        return f.reset_index(drop=True)

    survivors = (
        ds.select_columns([key_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()  # <= num_partitions * top rows
    )
    if len(survivors) == 0:
        return pd.DataFrame({key_col: [], "n": [], "share": []})
    total = int(survivors.groupby("__pid")["__ptotal"].first().sum())
    out = (
        survivors.sort_values(["n", key_col], ascending=[False, True])
        .head(top)
        .reset_index(drop=True)
        .drop(columns=["__pid", "__ptotal"])
    )
    out["share"] = out["n"].to_numpy() / max(total, 1)
    return out


def count_distribution(
    ds: "ray.data.Dataset",
    key_col: str,
    universe_size: int | None = None,
    num_partitions: int = 32,
) -> pd.DataFrame:
    """Count-of-counts histogram: for every key its row count ``n``,
    then how many keys share each ``n`` — the TPC-H Q13 "customer
    distribution" shape (reference capability: none; training-data
    diagnostic for per-source example counts) WITHOUT the outer join.
    The customer-side LEFT JOIN in the SQL formulation exists only to
    surface zero-count keys; that bucket equals
    ``universe_size - (#distinct keys present)`` — a scalar — so the
    universe table never enters a shuffle at all (pass
    ``universe_size`` from a metadata-only ``Dataset.count()``).

    Scale shape: per-batch ``np.unique`` combiner (rows leave each batch
    as (key, partial_n) pairs), ONE key-hash-partitioned groupby whose
    fold emits per-partition (c_count, custdist) partials (a key lives
    in exactly one partition, so per-partition counts are complete),
    driver folds <= partitions x distinct-counts tiny rows. No join, no
    global sort, nothing proportional to the key universe on the driver.
    """
    from .dedup import _splitmix64

    def partial(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False)
        uk, cnt = np.unique(k, return_counts=True)
        if uk.dtype.kind in "iu":
            part = (
                _splitmix64(uk.astype(np.uint64)) % np.uint64(num_partitions)
            ).astype(np.int32)
        else:
            part = (
                pd.util.hash_array(uk.astype(object)).astype(np.uint64)
                % np.uint64(num_partitions)
            ).astype(np.int32)
        return pa.table(
            {
                key_col: pa.array(uk),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
                "__part": pa.array(part, pa.int32()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"c_count": pd.Series(dtype=np.int64),
                 "custdist": pd.Series(dtype=np.int64)}
            )
        per_key = g.groupby(key_col, sort=False)["n"].sum().to_numpy()
        c, d = np.unique(per_key, return_counts=True)
        return pd.DataFrame(
            {"c_count": c.astype(np.int64), "custdist": d.astype(np.int64)}
        )

    partials = (
        ds.select_columns([key_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()  # <= num_partitions x distinct-count-values rows
    )
    out = (
        partials.groupby("c_count", as_index=False)["custdist"].sum()
        if len(partials)
        else pd.DataFrame({"c_count": [], "custdist": []}, dtype=np.int64)
    )
    if universe_size is not None:
        zeros = int(universe_size) - int(out["custdist"].sum())
        if zeros > 0:
            out = pd.concat(
                [out, pd.DataFrame({"c_count": [0], "custdist": [zeros]})],
                ignore_index=True,
            )
    out = out.sort_values(
        ["custdist", "c_count"], ascending=[False, False]
    ).reset_index(drop=True)
    return out.astype({"c_count": np.int64, "custdist": np.int64})


def grouped_rank_stats(
    ds: "ray.data.Dataset",
    key_col: str,
    order_col: str,
    tie_col: str,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Per-key RANK / PERCENT_RANK / CUME_DIST with SQL tie semantics —
    tied ``order_col`` values share the rank of their first row
    (``rank``), ``percent_rank = (rank-1)/(cnt-1)`` (0 for single-row
    keys), ``cume_dist = last_tied_position / cnt``. ``tie_col`` only
    fixes output ROW order, not the tie groups, matching SQL where the
    window ORDER BY is ``order_col`` alone.

    Scale shape: one key-hash shuffle, ONE lexsort per partition; ranks
    and tie-group boundaries come from vectorized run arithmetic
    (maximum.accumulate over change points for firsts, searchsorted over
    change points for lasts) — no per-key dispatch, no global sort. The
    stat divisions are single IEEE double ops of integer operands, so
    DuckDB agrees bit-for-bit.
    """
    from .dedup import _splitmix64

    def add_part(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (
            _splitmix64(k.astype(np.uint64)) % np.uint64(num_partitions)
        ).astype(np.int32)
        return t.append_column("__part", pa.array(part, pa.int32()))

    def stats_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__part"])
        if len(g) == 0:
            for c in ("rank", "percent_rank", "cume_dist"):
                g[c] = pd.Series(
                    dtype=np.int64 if c == "rank" else np.float64
                )
            return g
        keys = g[key_col].to_numpy()
        o = g[order_col].to_numpy()
        t = g[tie_col].to_numpy()
        order = np.lexsort((t, o, keys))
        sk, so = keys[order], o[order]
        n = len(sk)
        new_key = np.concatenate(([True], sk[1:] != sk[:-1]))
        new_tie = new_key | np.concatenate(([False], so[1:] != so[:-1]))
        idx = np.arange(n, dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(new_key, idx, 0))
        # key run length for every row
        kstarts = np.flatnonzero(new_key)
        klen = np.diff(np.append(kstarts, n))
        cnt = np.repeat(klen, klen)
        # first index of each tie group (rank), last index (cume_dist)
        tie_first = np.maximum.accumulate(np.where(new_tie, idx, 0))
        tstarts = np.flatnonzero(new_tie)
        tlen = np.diff(np.append(tstarts, n))
        tie_last = np.repeat(tstarts + tlen - 1, tlen)
        rank = tie_first - run_start + 1
        pr = np.where(
            cnt > 1, (rank - 1) / np.maximum(cnt - 1, 1), 0.0
        )
        cume = (tie_last - run_start + 1) / cnt
        out = g.iloc[order].copy()
        out["rank"] = rank.astype(np.int64)
        out["percent_rank"] = pr
        out["cume_dist"] = cume
        return out

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(stats_partition, batch_format="pandas")
    )


def global_ntile(
    ds: "ray.data.Dataset",
    order_col: str,
    tie_col: str,
    k: int,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Exact global NTILE(k) over (``order_col``, ``tie_col``) — the
    equi-depth bucketing pass (assign every row to one of k
    population-balanced tiles). SQL's uneven-fill rule: with n = total
    rows, the first ``n % k`` tiles get ``n // k + 1`` rows.

    Scale shape: ``global_rank``'s sampled-boundary machinery does all
    the heavy lifting (range-tag, per-range count fold, one shuffle);
    the tile number is then pure per-batch arithmetic on the exact rank
    — no extra shuffle. The only driver-side values are n and k.
    """
    ranked = global_rank(
        ds, order_col, tie_col, num_partitions=num_partitions
    ).materialize()  # count() + tile pass must not run the rank twice
    n = ranked.count()
    q, rem = divmod(n, k)
    boundary = rem * (q + 1)

    def tile(t: pa.Table) -> pa.Table:
        r = t["rank"].to_numpy(zero_copy_only=False)
        low = (r - 1) // (q + 1) + 1 if q + 1 > 0 else np.ones_like(r)
        if q > 0:
            high = rem + (r - boundary - 1) // q + 1
        else:  # n < k: every row is its own tile
            high = r
        tl = np.where(r <= boundary, low, high)
        return t.append_column("tile", pa.array(tl, pa.int64()))

    return ranked.map_batches(tile, batch_format="pyarrow")


def _local_skyline(x: np.ndarray, y: np.ndarray):
    """Strict-dominance 2-D skyline (maximize both) survivor mask,
    duplicates of a frontier point all kept. Vectorized: sort by x desc,
    per-x-group max via reduceat, exclusive running max from
    strictly-greater x groups."""
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-y, -x))
    xs, ys = x[order], y[order]
    starts = np.flatnonzero(np.concatenate(([True], xs[1:] != xs[:-1])))
    gmax = np.maximum.reduceat(ys, starts)
    # running max of group maxes from STRICTLY greater x (exclusive)
    run = np.concatenate(([-np.inf], np.maximum.accumulate(gmax)[:-1]))
    gidx = np.cumsum(np.concatenate(([0], (xs[1:] != xs[:-1]).astype(np.int64))))
    keep_sorted = (ys == gmax[gidx]) & (ys > run[gidx])
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return keep


def skyline(
    ds: "ray.data.Dataset",
    x_col: str,
    y_col: str,
    carry_cols: tuple = (),
) -> pd.DataFrame:
    """Distributed 2-D Pareto frontier (maximize ``x_col`` and
    ``y_col``, strict dominance, frontier duplicates kept). The
    multi-objective "best examples" selection pass.

    Scale shape: NO shuffle at all — the skyline operator is a
    morphism under union (skyline(A ∪ B) = skyline(skyline(A) ∪
    skyline(B))), so each batch emits only its local frontier
    (typically O(log n) points) and the driver merges frontier
    partials with one more local pass. Worst case (anti-correlated
    dims) partials grow; they stream through the driver fold either
    way, never the raw rows.
    """
    cols = [x_col, y_col, *carry_cols]

    def partial(t: pa.Table) -> pa.Table:
        xv = t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        yv = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = _local_skyline(xv, yv)
        return t.select(cols).take(
            pa.array(np.flatnonzero(keep), pa.int64())
        )

    parts = (
        ds.select_columns(cols)
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # frontier partials only
    )
    if len(parts) == 0:
        return parts
    keep = _local_skyline(
        parts[x_col].to_numpy().astype(np.float64),
        parts[y_col].to_numpy().astype(np.float64),
    )
    return parts[keep].reset_index(drop=True)


def grouped_mode(
    ds: "ray.data.Dataset",
    key_col: str,
    val_col: str,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Most frequent value per key (deterministic ties: highest count,
    then smallest value) — the per-user dominant-category pass. Output:
    (key_col, mode_value, n).

    Scale shape: per-batch (key, value) count combiners (one lexsort +
    run-length per batch — the raw rows never shuffle), partials
    key-hash partitioned (a key never spans two partitions), each
    partition folds counts and takes the per-key argmax with one more
    lexsort. Two tiny exchanges over the (key x value) space, not the
    row space.
    """
    from .dedup import _splitmix64

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key_col].to_numpy()
        v = g[val_col].to_numpy(dtype=object)
        order = np.lexsort((v, k))
        ks, vs = k[order], v[order]
        first = np.concatenate(
            ([True], (ks[1:] != ks[:-1]) | (vs[1:] != vs[:-1]))
        )
        starts = np.flatnonzero(first)
        cnt = np.diff(np.append(starts, len(ks)))
        kk = ks[starts]
        part = (
            _splitmix64(kk.astype(np.uint64))
            % np.uint64(num_partitions)
        ).astype(np.int32)
        return pd.DataFrame(
            {
                key_col: kk,
                val_col: vs[starts],
                "n": cnt.astype(np.int64),
                "__part": part,
            }
        )

    def mode_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                key_col: pd.Series(dtype=np.int64),
                "mode_value": pd.Series(dtype=object),
                "n": pd.Series(dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        k = g[key_col].to_numpy()
        v = g[val_col].to_numpy(dtype=object)
        c = g["n"].to_numpy()
        # fold duplicate (key, value) partials
        order = np.lexsort((v, k))
        ks, vs, cs = k[order], v[order], c[order]
        first = np.concatenate(
            ([True], (ks[1:] != ks[:-1]) | (vs[1:] != vs[:-1]))
        )
        starts = np.flatnonzero(first)
        tot = np.add.reduceat(cs, starts)
        ks, vs = ks[starts], vs[starts]
        # per-key argmax: sort by (key, -count, value); first row per key
        order2 = np.lexsort((vs, -tot, ks))
        ks, vs, tot = ks[order2], vs[order2], tot[order2]
        top = np.concatenate(([True], ks[1:] != ks[:-1]))
        return pd.DataFrame(
            {
                key_col: ks[top],
                "mode_value": vs[top],
                "n": tot[top].astype(np.int64),
            }
        )

    return (
        ds.select_columns([key_col, val_col])
        .map_batches(partial, batch_format="pandas")
        .groupby("__part")
        .map_groups(mode_partition, batch_format="pandas")
    )


def having_above_global_avg(
    ds: "ray.data.Dataset",
    key_col: str,
    val_col: str,
) -> "ray.data.Dataset":
    """Keys whose total ``val_col`` exceeds the mean per-key total —
    the HAVING-with-scalar-subquery shape (``HAVING sum(v) > (SELECT
    avg(tot) FROM per_key_totals)``).

    Values are 2-decimal money: sums run in int64 fixed-point cents and
    the threshold test is EXACT integer arithmetic (``cents > q`` /
    ``cents >= q+1`` from ``divmod(grand, n_keys)`` — no float compare
    can flip a key on the boundary, matching a DECIMAL-exact oracle).

    Scale shape: per-batch per-key cent partials (factorize + bincount,
    the combiner), ONE small groupby folds them to O(keys) totals that
    STAY distributed; the scalar (grand total, key count) folds from
    that tiny table; the filter is a stateless map over the totals.
    Raw rows never shuffle.
    """
    from ray.data.aggregate import Count, Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys = df[key_col].to_numpy()
        cents = np.round(
            df[val_col].to_numpy(dtype=np.float64) * 100.0
        ).astype(np.int64)
        uk, inv = np.unique(keys, return_inverse=True)
        # int64 scatter-add: float-weighted bincount is exact only below
        # 2^53 per per-batch per-key cents sum
        return pd.DataFrame(
            {
                key_col: uk,
                "cents": int_bincount(inv, cents, len(uk)),
            }
        )

    totals = (
        ds.select_columns([key_col, val_col])
        .map_batches(partial, batch_format="pandas")
        .groupby(key_col)
        .aggregate(Sum("cents", alias_name="cents"))
    )
    sc = totals.aggregate(
        Sum("cents", alias_name="grand"), Count(alias_name="nk")
    )
    grand, nk = int(sc["grand"]), int(sc["nk"])
    # keep iff cents > grand/nk = q + r/nk, i.e. cents >= q + 1 (strict >
    # over integers beats any float-threshold compare on the boundary)
    thr = grand // nk + 1

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        cents = df["cents"].to_numpy()
        mask = cents >= thr
        out = df.loc[mask, [key_col]].copy()
        out["total"] = cents[mask] / 100.0
        return out

    return totals.map_batches(keep, batch_format="pandas")


def basket_pairs(
    ds: "ray.data.Dataset",
    group_col: str,
    item_col: str,
    topn: int = 100,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Top co-occurring item pairs within a group (market-basket counts).

    Scale shape: pair fan-out is bounded by the square of ONE group's
    distinct-item count (TPC-H orders hold <= 7 lineitems), never by the
    corpus. Per-batch partials keep only distinct (group, item) rows,
    ONE group-hash shuffle co-locates each basket, and pairs are
    generated vectorized per partition (repeat/offset arithmetic — no
    Python loop over baskets) and immediately count-combined inside the
    partition. A second mixed-hash shuffle of the already-tiny
    (item_a, item_b, cnt) partials produces exact global counts, and the
    global top-N is partial-top-N per block + one tiny final reduce —
    no all-to-all sort anywhere.
    """
    from .dedup import _splitmix64

    def distinct_part(t: pa.Table) -> pa.Table:
        g = t[group_col].to_numpy(zero_copy_only=False).astype(np.int64)
        i = t[item_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((i, g))
        g, i = g[order], i[order]
        keep = np.concatenate(([True], (g[1:] != g[:-1]) | (i[1:] != i[:-1])))
        g, i = g[keep], i[keep]
        part = (g.astype(np.uint64) % np.uint64(num_partitions)).astype(
            np.int32
        )
        return pa.table(
            {
                group_col: pa.array(g, pa.int64()),
                item_col: pa.array(i, pa.int64()),
                "__part": pa.array(part, pa.int32()),
            }
        )

    def pair_counts(t: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "item_a": pd.Series(dtype=np.int64),
                "item_b": pd.Series(dtype=np.int64),
                "cnt": pd.Series(dtype=np.int64),
            }
        )
        if len(t) == 0:
            return empty
        g = t[group_col].to_numpy()
        i = t[item_col].to_numpy()
        order = np.lexsort((i, g))
        g, i = g[order], i[order]
        keep = np.concatenate(([True], (g[1:] != g[:-1]) | (i[1:] != i[:-1])))
        g, i = g[keep], i[keep]
        # items are sorted within each group, so left < right is free
        first = np.concatenate(([True], g[1:] != g[:-1]))
        starts = np.flatnonzero(first)
        lengths = np.diff(np.append(starts, len(g)))
        pos = np.arange(len(g)) - np.repeat(starts, lengths)
        fan = np.repeat(lengths, lengths) - 1 - pos  # pairs led by each row
        total = int(fan.sum())
        if total == 0:
            return empty
        left = np.repeat(np.arange(len(g)), fan)
        off = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(fan)))[:-1], fan
        )
        right = left + 1 + off
        a, b = i[left], i[right]
        po = np.lexsort((b, a))
        a, b = a[po], b[po]
        pfirst = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        pstarts = np.flatnonzero(pfirst)
        cnt = np.diff(np.append(pstarts, len(a)))
        return pd.DataFrame(
            {
                "item_a": a[pstarts],
                "item_b": b[pstarts],
                "cnt": cnt.astype(np.int64),
            }
        )

    def pair_part(t: pa.Table) -> pa.Table:
        a = t["item_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["item_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            mixed = _splitmix64(_splitmix64(a) ^ b)
        part = (mixed % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("__p2", pa.array(part, pa.int32()))

    def sum_pairs(t: pd.DataFrame) -> pd.DataFrame:
        t = t.drop(columns=["__p2"])
        if len(t) == 0:
            return t
        return t.groupby(["item_a", "item_b"], as_index=False).agg(
            cnt=("cnt", "sum")
        )

    def partial_topn(t: pa.Table) -> pa.Table:
        c = t["cnt"].to_numpy(zero_copy_only=False)
        a = t["item_a"].to_numpy(zero_copy_only=False)
        b = t["item_b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a, -c))[:topn]
        return t.take(pa.array(order))

    counts = (
        ds.select_columns([group_col, item_col])
        .map_batches(distinct_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(pair_counts, batch_format="pandas")
        .map_batches(pair_part, batch_format="pyarrow")
        .groupby("__p2")
        .map_groups(sum_pairs, batch_format="pandas")
    )
    return (
        counts.map_batches(partial_topn, batch_format="pyarrow")
        .repartition(1)
        .map_batches(partial_topn, batch_format="pyarrow")
    )


def grouped_top_values(
    ds: "ray.data.Dataset",
    key_col: str,
    val_col: str,
    k: int,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Per-key top-``k`` most frequent values with exact counts — the
    exact form of a per-group heavy-hitters query (``row_number() OVER
    (PARTITION BY key ORDER BY count(*) DESC, val) <= k``). Generalizes
    ``grouped_mode`` (its k=1 case) with counts and ranks.

    Scale shape: per-batch (key, val, c) count partials (one
    factorize+unique per batch — the combiner), one groupby fold over
    O(distinct pairs) rows, then the folded counts stream through
    ``grouped_topk`` (coarse key-hash partitions + one vectorized
    lexsort per partition). Raw rows never shuffle; all-to-all traffic
    is O(distinct (key, value) pairs), and no per-group Python frames
    exist anywhere. Ties on count break by value ascending —
    deterministic and partition-invariant.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {key_col: [], val_col: [], "cnt": np.array([], np.int64)}
            )
        ck, uk = pd.factorize(df[key_col], sort=False)
        cv, uv = pd.factorize(df[val_col], sort=False)
        code = ck.astype(np.int64) * len(uv) + cv
        uc, counts = np.unique(code, return_counts=True)
        return pd.DataFrame(
            {
                key_col: uk.take(uc // len(uv)),
                val_col: uv.take(uc % len(uv)),
                "cnt": counts.astype(np.int64),
            }
        )

    folded = (
        ds.select_columns([key_col, val_col])
        .map_batches(partial, batch_format="pandas")
        .groupby([key_col, val_col])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    return grouped_topk(
        folded,
        key_col,
        "cnt",
        k,
        descending=True,
        tie_col=val_col,
        num_partitions=num_partitions,
    )


def rfm_segments(
    orders: "ray.data.Dataset",
    key_col: str,
    date_col: str,
    val_col: str,
    k: int = 4,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Per-customer RFM segmentation — recency (last order), frequency
    (order count), monetary (exact fixed-point revenue) each bucketed
    into k equi-depth tiles over the whole population (SQL ``ntile(k)
    OVER (ORDER BY dim, key)``; tile k = most recent / most frequent /
    highest spend).

    Output: (key_col, recency_s int64 epoch-seconds, frequency int64,
    monetary float64, r_tile/f_tile/m_tile int64).

    Scale shape: per-batch (key, max-date, count, cents) combiner
    partials collapse the raw order stream to distinct keys BEFORE any
    exchange; one tiny groupby fold; then three ``global_ntile`` passes
    over the already-aggregated table — each is the sampled-boundary
    rank machinery (range tag + per-range count fold + ONE shuffle),
    never a raw-row sort. Monetary ties rank on exact int64 cents, not
    floats.
    """
    from ray.data.aggregate import Max, Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys = df[key_col].to_numpy()
        us = (
            df[date_col]
            .to_numpy()
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        cents = np.round(
            df[val_col].to_numpy(dtype=np.float64) * 100.0
        ).astype(np.int64)
        uk, inv = np.unique(keys, return_inverse=True)
        mx = np.full(len(uk), np.iinfo(np.int64).min)
        np.maximum.at(mx, inv, us)
        n = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        s = int_bincount(inv, cents, len(uk))  # exact over full int64
        return pd.DataFrame(
            {key_col: uk, "rec_us": mx, "frequency": n, "__cents": s}
        )

    agg = (
        orders.select_columns([key_col, date_col, val_col])
        .map_batches(partial, batch_format="pandas")
        .groupby(key_col)
        .aggregate(
            Max("rec_us", alias_name="rec_us"),
            Sum("frequency", alias_name="frequency"),
            Sum("__cents", alias_name="__cents"),
        )
    )

    def to_seconds(t: pa.Table) -> pa.Table:
        rec = t["rec_us"].to_numpy(zero_copy_only=False) // 10**6
        return t.drop(["rec_us"]).append_column(
            "recency_s", pa.array(rec, pa.int64())
        )

    ds = agg.map_batches(to_seconds, batch_format="pyarrow")

    def tile_pass(d, order_col, out_name):
        d = global_ntile(d, order_col, key_col, k, num_partitions)

        def rn(t: pa.Table) -> pa.Table:
            tl = t["tile"]
            return t.drop(["rank", "tile"]).append_column(out_name, tl)

        return d.map_batches(rn, batch_format="pyarrow")

    ds = tile_pass(ds, "recency_s", "r_tile")
    ds = tile_pass(ds, "frequency", "f_tile")
    ds = tile_pass(ds, "__cents", "m_tile")

    def finish(t: pa.Table) -> pa.Table:
        mon = t["__cents"].to_numpy(zero_copy_only=False) / 100.0
        return t.drop(["__cents"]).append_column(
            "monetary", pa.array(mon, pa.float64())
        )

    return ds.map_batches(finish, batch_format="pyarrow")


def golden_record(
    ds: "ray.data.Dataset",
    key_col: str,
    mode_col: str,
    ts_col: str,
    latest_col: str,
    tie_col: str,
    value_col: str,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Survivorship consolidation ("golden record"): collapse every
    group of records that refer to one entity into a single canonical
    row, picking each attribute by its own survivorship rule — the
    step an ER pipeline runs AFTER clustering to emit the master
    entity table.

    Rules (all deterministic, partition-order-invariant):
      - ``n_rows``       count of the group's records
      - ``first_ts``     earliest ``ts_col``
      - ``top_<mode>``   most frequent ``mode_col`` value (ties ->
                         lexicographically smallest value)
      - ``last_<latest>`` the ``latest_col`` value of the group's most
                         recent record (``ts_col`` desc, ``tie_col``
                         desc breaks equal timestamps)
      - ``sum_units``    exact int64 sum of 1e-6-quantized
                         ``value_col`` (integer addition commutes; the
                         caller does the single final division)

    Scale shape: ONE key-hash shuffle. Each input batch collapses to
    one combiner row per distinct (key, mode-value) pair carrying the
    count, the key-level extremes, and ONE latest-record candidate —
    every rule is an associative fold, so partials merge exactly.
    """
    schema_cols = [
        "__k", "__m", "__cnt", "__min_ts", "__sv",
        "__bts", "__btie", "__bval", "__part",
    ]

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(columns=schema_cols)
        from .arrowutil import round_away

        k = df[key_col].to_numpy().astype(np.int64)
        ts = df[ts_col].to_numpy().astype("datetime64[us]").view(np.int64)
        tie = df[tie_col].to_numpy().astype(np.int64)
        # round_away, not np.round: the matching oracle uses DuckDB round()
        # (half-away-from-zero); a *1e6 value landing exactly on .5 must
        # quantize identically on both sides
        v = round_away(df[value_col].to_numpy() * 1e6, 0).astype(np.int64)
        w = pd.DataFrame(
            {
                "__k": k,
                "__m": df[mode_col].to_numpy(),
                "__ts": ts,
                "__tie": tie,
                "__v": v,
                "__val": df[latest_col].to_numpy(),
            }
        )
        # latest-record candidate per (key, mode value): ts desc, tie desc
        w = w.sort_values(
            ["__k", "__m", "__ts", "__tie"],
            ascending=[True, True, False, False],
            kind="stable",
        )
        cand = w.drop_duplicates(["__k", "__m"], keep="first")
        # dropna=False: a null mode value is a real group (SQL GROUP BY
        # keeps NULLs) — dropping it would lose its rows from n_rows/
        # first_ts/sum_units and from the latest-record pick
        agg = w.groupby(["__k", "__m"], sort=False, dropna=False).agg(
            __cnt=("__v", "size"),
            __min_ts=("__ts", "min"),
            __sv=("__v", "sum"),
        ).reset_index()
        out = agg.merge(
            cand[["__k", "__m", "__ts", "__tie", "__val"]],
            on=["__k", "__m"],
        ).rename(
            columns={"__ts": "__bts", "__tie": "__btie", "__val": "__bval"}
        )
        out["__part"] = (
            out["__k"].to_numpy() % num_partitions
        ).astype(np.int32)
        return out[schema_cols]

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {
            key_col: pd.Series(dtype=np.int64),
            "n_rows": pd.Series(dtype=np.int64),
            "first_ts": pd.Series(dtype="datetime64[us]"),
            f"top_{mode_col}": pd.Series(dtype=object),
            f"last_{latest_col}": pd.Series(dtype=object),
            "sum_units": pd.Series(dtype=np.int64),
        }
        if len(g) == 0:
            return pd.DataFrame(out_cols)
        # re-combine partials of the same (key, mode value)
        g = g.sort_values(
            ["__k", "__m", "__bts", "__btie"],
            ascending=[True, True, False, False],
            kind="stable",
        )
        cand = g.drop_duplicates(["__k", "__m"], keep="first")
        km = g.groupby(["__k", "__m"], sort=False, dropna=False).agg(
            __cnt=("__cnt", "sum"),
            __min_ts=("__min_ts", "min"),
            __sv=("__sv", "sum"),
        ).reset_index().merge(
            cand[["__k", "__m", "__bts", "__btie", "__bval"]],
            on=["__k", "__m"],
        )
        # key-level folds
        base = km.groupby("__k", sort=False).agg(
            n_rows=("__cnt", "sum"),
            first_ts=("__min_ts", "min"),
            sum_units=("__sv", "sum"),
        ).reset_index()
        top = (
            km.sort_values(
                ["__k", "__cnt", "__m"], ascending=[True, False, True],
                kind="stable",
            )
            .drop_duplicates("__k", keep="first")[["__k", "__m"]]
        )
        last = (
            km.sort_values(
                ["__k", "__bts", "__btie"],
                ascending=[True, False, False], kind="stable",
            )
            .drop_duplicates("__k", keep="first")[["__k", "__bval"]]
        )
        out = base.merge(top, on="__k").merge(last, on="__k")
        return pd.DataFrame(
            {
                key_col: out["__k"].astype(np.int64),
                "n_rows": out["n_rows"].astype(np.int64),
                "first_ts": out["first_ts"].to_numpy().astype(
                    "datetime64[us]"
                ),
                f"top_{mode_col}": out["__m"],
                f"last_{latest_col}": out["__bval"],
                "sum_units": out["sum_units"].astype(np.int64),
            }
        )

    return (
        ds.map_batches(combine, batch_format="pandas")
        .groupby("__part")
        .map_groups(fold, batch_format="pandas")
    )

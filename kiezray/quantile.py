"""Exact distributed order statistics WITHOUT a global sort.

``exact_quantiles`` finds the exact rank-``ceil(q*n)-1`` element (DuckDB
``quantile_disc`` semantics, verified empirically) of a numeric column by
iterative histogram refinement — the classic external-selection algorithm
re-expressed as Ray Data passes:

 1. one aggregate pass: (count, min, max) per column;
 2. refinement rounds: ONE ``map_batches`` pass per round computes, for
    every still-open quantile, a ``num_bins`` histogram of its current
    candidate interval (per-batch partials are tiny int64 arrays; the
    driver folds ``n_quantiles x num_bins`` ints and walks the counts to
    pick the bin holding the target rank). Every round shrinks each
    candidate set by ~``num_bins``x, so 10^12 rows need 3 rounds at
    2048 bins before
 3. a final collect pass filters the (now tiny) candidate intervals and
    the driver selects the exact rank within the sorted remainder.

Every pass is a streaming scan with O(n_quantiles * num_bins) transfer —
no shuffle, no sort, no materialization. Contrast with a global
``ds.sort``: an all-to-all exchange of the full column.

Intervals are half-open ``[lo, hi)`` except at the tracked maximum
(inclusive), so a value equal to a bin's upper edge is counted exactly
once across rounds — the rank bookkeeping is exact, and a final assert
cross-checks collected row counts against the tracked interval counts.

The reference has no order statistics (SURVEY.md §2.6); this is a
training-data-pipeline extension (distribution cutoffs for quality
filtering, length caps, score calibration).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _column_f64(t: pa.Table, col: str) -> np.ndarray:
    v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
    return v[~np.isnan(v)]  # SQL aggregates ignore NULLs


def _select(v: np.ndarray, lo: float, hi: float, hi_inc: bool) -> np.ndarray:
    if hi_inc:
        return v[(v >= lo) & (v <= hi)]
    return v[(v >= lo) & (v < hi)]


def exact_quantiles(
    ds: "ray.data.Dataset",
    col: str,
    qs: tuple = (0.25, 0.5, 0.75),
    num_bins: int = 2048,
    collect_threshold: int = 65536,
    max_rounds: int = 8,
    interp: str = "disc",
) -> "pa.Table":
    """Exact quantiles of ``ds[col]``.

    ``interp="disc"`` selects the rank-``ceil(q*n)-1`` element (DuckDB
    ``quantile_disc``); ``interp="cont"`` linearly interpolates between
    the two order statistics straddling rank ``q*(n-1)`` (DuckDB
    ``quantile_cont`` / SQL ``percentile_cont``). Both run the same
    rank-driven histogram refinement — cont just tracks (up to) two
    ranks per quantile and interpolates on the driver.

    Returns a small driver-side table (q, value) — order statistics are
    scalars, so the result is intentionally not a Dataset.
    """
    if interp not in ("disc", "cont"):
        raise ValueError(f"interp must be 'disc' or 'cont', got {interp!r}")
    base = ds.select_columns([col])

    def minmax_partial(t: pa.Table) -> pa.Table:
        v = _column_f64(t, col)
        if len(v) == 0:
            return pa.table(
                {
                    "n": pa.array([0], pa.int64()),
                    "lo": pa.array([np.inf]),
                    "hi": pa.array([-np.inf]),
                }
            )
        return pa.table(
            {
                "n": pa.array([len(v)], pa.int64()),
                "lo": pa.array([float(v.min())]),
                "hi": pa.array([float(v.max())]),
            }
        )

    parts = base.map_batches(
        minmax_partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # one tiny row per block
    n_total = int(parts["n"].sum())
    if n_total == 0:
        return pa.table(
            {
                "q": pa.array(list(qs), pa.float64()),
                "value": pa.array([None] * len(qs), pa.float64()),
            }
        )
    glo, ghi = float(parts["lo"].min()), float(parts["hi"].max())

    # target 0-based global ranks: one per q (disc) or the floor/ceil
    # straddle of q*(n-1) plus its interpolation fraction (cont)
    if interp == "disc":
        combine = [
            (max(int(np.ceil(q * n_total)) - 1, 0), None, 0.0) for q in qs
        ]
    else:
        combine = []
        for q in qs:
            r = q * (n_total - 1)
            k1, k2 = int(np.floor(r)), int(np.ceil(r))
            combine.append((k1, k2 if k2 != k1 else None, r - k1))
    uniq_ranks = sorted(
        {k for k1, k2, _ in combine for k in (k1, k2) if k is not None}
    )

    # per-rank state: candidate interval [lo, hi) (hi_inc marks the
    # inclusive top at the tracked max), rank to select WITHIN the
    # interval, and the interval's tracked row count
    state = [
        {
            "lo": glo,
            "hi": ghi,
            "hi_inc": True,
            "rank": k,
            "count": n_total,
            "done": False,
        }
        for k in uniq_ranks
    ]

    for _ in range(max_rounds):
        open_idx = [
            i
            for i, s in enumerate(state)
            if not s["done"]
            and s["count"] > collect_threshold
            and s["lo"] < s["hi"]
        ]
        if not open_idx:
            break
        intervals = tuple(
            (state[i]["lo"], state[i]["hi"], state[i]["hi_inc"])
            for i in open_idx
        )

        def hist_partial(t: pa.Table, iv=intervals, nb=num_bins) -> pa.Table:
            v = _column_f64(t, col)
            rows = []
            for lo, hi, hi_inc in iv:
                edges = np.linspace(lo, hi, nb + 1)
                sel = _select(v, lo, hi, hi_inc)
                # searchsorted('right')-1 puts v == edges[b] into bin b;
                # v == hi (inclusive top only) clips into the last bin
                b = np.clip(
                    np.searchsorted(edges, sel, side="right") - 1, 0, nb - 1
                )
                rows.append(np.bincount(b, minlength=nb))
            h = np.stack(rows) if rows else np.zeros((0, nb), np.int64)
            return pa.table(
                {
                    "iv": pa.array(np.arange(len(iv), dtype=np.int64)),
                    "hist": pa.FixedSizeListArray.from_arrays(
                        pa.array(h.astype(np.int64).ravel(), pa.int64()), nb
                    ),
                }
            )

        hp = base.map_batches(
            hist_partial, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()
        # fold: sum per interval index (driver holds n_iv x nb ints only)
        folded = np.zeros((len(open_idx), num_bins), dtype=np.int64)
        for iv_idx, hist in zip(hp["iv"], hp["hist"]):
            folded[int(iv_idx)] += np.asarray(hist, dtype=np.int64)
        for pos, i in enumerate(open_idx):
            s = state[i]
            counts = folded[pos]
            assert int(counts.sum()) == s["count"], "histogram count drift"
            cum = np.cumsum(counts)
            b = int(np.searchsorted(cum, s["rank"] + 1))
            edges = np.linspace(s["lo"], s["hi"], num_bins + 1)
            new_lo = float(edges[b])
            last = b == num_bins - 1
            new_hi = s["hi"] if last else float(edges[b + 1])
            new_hi_inc = s["hi_inc"] if last else False
            new_count = int(counts[b])
            if new_count == s["count"] and new_lo == s["lo"] and (
                new_hi == s["hi"] and new_hi_inc == s["hi_inc"]
            ):
                # no shrink (float plateau / heavy duplicates): collect
                s["done"] = True
                continue
            s["rank"] -= int(cum[b - 1]) if b > 0 else 0
            s["lo"], s["hi"], s["hi_inc"] = new_lo, new_hi, new_hi_inc
            s["count"] = new_count

    # final collect: one filtering pass over ALL remaining intervals; the
    # candidate sets are small by construction (or flagged plateaus)
    intervals = tuple((s["lo"], s["hi"], s["hi_inc"]) for s in state)

    def collect_partial(t: pa.Table, iv=intervals) -> pa.Table:
        v = _column_f64(t, col)
        out_iv, out_v = [], []
        for j, (lo, hi, hi_inc) in enumerate(iv):
            sel = _select(v, lo, hi, hi_inc)
            out_iv.append(np.full(len(sel), j, dtype=np.int64))
            out_v.append(sel)
        return pa.table(
            {
                "iv": pa.array(np.concatenate(out_iv), pa.int64()),
                "v": pa.array(np.concatenate(out_v), pa.float64()),
            }
        )

    coll = base.map_batches(
        collect_partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    rank_val = {}
    for j, s in enumerate(state):
        vals = np.sort(coll.loc[coll["iv"] == j, "v"].to_numpy())
        assert len(vals) == s["count"], (
            f"interval {j}: collected {len(vals)} != tracked {s['count']}"
        )
        rank_val[uniq_ranks[j]] = float(vals[s["rank"]])
    values = []
    for k1, k2, frac in combine:
        v1 = rank_val[k1]
        if k2 is None:
            values.append(v1)
        else:
            values.append(v1 + (rank_val[k2] - v1) * frac)
    return pa.table(
        {
            "q": pa.array(list(qs), pa.float64()),
            "value": pa.array(values, pa.float64()),
        }
    )


def grouped_quantiles(
    ds: "ray.data.Dataset",
    key_col: str,
    col: str,
    qs: tuple = (0.5,),
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Per-key exact quantiles (``quantile_disc`` semantics) — the
    coarse-partition pattern: a key never spans two hash partitions, and
    each partition computes ALL of its keys' quantiles with one lexsort
    + boundary arithmetic (rank = ceil(q*n)-1 within each key's sorted
    run). Output: (key, q, value) rows.

    Partitioning assumption (same as ``relops.grouped_topk``): one key's
    rows fit one partition — right for per-language / per-domain /
    per-source distribution cutoffs where keys are bounded; use
    ``exact_quantiles`` per filtered subset for whale keys.
    """
    import pandas as pd

    from .dedup import _splitmix64

    qs = tuple(qs)

    def add_part(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (
            _splitmix64(k.astype(np.uint64)) % np.uint64(num_partitions)
        ).astype(np.int32)
        return t.append_column("__part", pa.array(part, pa.int32()))

    def quants_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__part"])
        if len(g) == 0:
            return pd.DataFrame(
                {
                    key_col: pd.Series(dtype=np.int64),
                    "q": pd.Series(dtype=np.float64),
                    "value": pd.Series(dtype=np.float64),
                }
            )
        keys = g[key_col].to_numpy()
        vals = g[col].to_numpy().astype(np.float64)
        ok = ~np.isnan(vals)
        keys, vals = keys[ok], vals[ok]
        order = np.lexsort((vals, keys))
        k, v = keys[order], vals[order]
        starts = np.flatnonzero(
            np.concatenate(([True], k[1:] != k[:-1]))
        )
        counts = np.diff(np.append(starts, len(k)))
        out_k, out_q, out_v = [], [], []
        for q in qs:
            ranks = np.maximum(
                np.ceil(q * counts).astype(np.int64) - 1, 0
            )
            out_k.append(k[starts])
            out_q.append(np.full(len(starts), q))
            out_v.append(v[starts + ranks])
        return pd.DataFrame(
            {
                key_col: np.concatenate(out_k),
                "q": np.concatenate(out_q),
                "value": np.concatenate(out_v),
            }
        )

    return (
        ds.select_columns([key_col, col])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(quants_partition, batch_format="pandas")
    )


def grouped_mad(
    ds: "ray.data.Dataset",
    key_col: str,
    val_col: str,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Per-key median + MAD (median absolute deviation), both with
    ``quantile_disc`` semantics (rank ceil(n/2)-1 of the sorted run) —
    the robust per-group dispersion/outlier-threshold pass.

    One key-hash shuffle (string or integer keys); each partition
    computes ALL of its keys' medians with one lexsort, then all MADs
    with a second lexsort over the absolute deviations. No per-key group
    dispatch; same bounded-key partitioning assumption as
    ``grouped_quantiles``. Output: (key, med, mad).
    """
    import pandas as pd

    def add_part(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False)
        part = (
            pd.util.hash_array(k).astype(np.uint64)
            % np.uint64(num_partitions)
        ).astype(np.int32)
        return t.append_column("__part", pa.array(part, pa.int32()))

    def mad_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                key_col: pd.Series(dtype=g[key_col].dtype),
                "med": pd.Series(dtype=np.float64),
                "mad": pd.Series(dtype=np.float64),
            }
        )
        if len(g) == 0:
            return empty
        keys = g[key_col].to_numpy()
        v = g[val_col].to_numpy(dtype=np.float64)
        ck, uk = pd.factorize(keys)
        n_all = np.bincount(ck, minlength=len(uk))

        def disc_median(order):
            sk = ck[order]
            starts = np.flatnonzero(
                np.concatenate(([True], sk[1:] != sk[:-1]))
            )
            # groups appear in factorize-code order after the lexsort, so
            # starts[i] is the run of key code i; rank = ceil(n/2) - 1
            rank = starts + (n_all + 1) // 2 - 1
            return v_sorted[rank]

        order1 = np.lexsort((v, ck))
        v_sorted = v[order1]
        med = disc_median(order1)
        dev = np.abs(v - med[ck])
        order2 = np.lexsort((dev, ck))
        v_sorted = dev[order2]
        mad = disc_median(order2)
        return pd.DataFrame({key_col: uk, "med": med, "mad": mad})

    return (
        ds.select_columns([key_col, val_col])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(mad_partition, batch_format="pandas")
    )


def weighted_median(
    ds: "ray.data.Dataset",
    key_col: str,
    value_col: str,
    weight_col: str,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Per-key lower weighted median: the smallest value v such that the
    total weight of rows with value <= v reaches half the key's weight
    (the window-cumsum definition — ties share one cumulative step).

    Scale shape: per-batch partials collapse rows to distinct
    (key, value, sum_weight) triples (the combiner — weights are summed
    as exact int64 so the result is addition-order-invariant), then ONE
    key-hash shuffle and a single vectorized pass per partition: lexsort
    by (key, value), reduceat the weights per distinct value, per-key
    cumulative sums, and a searchsorted pick of the first value whose
    doubled cumulative weight reaches the key total. Only distinct
    (key, value) partials ever shuffle.
    """
    import pandas as pd

    def partials(t: pa.Table) -> pa.Table:
        df = t.select([key_col, value_col, weight_col]).to_pandas()
        w = np.rint(df[weight_col].to_numpy() * 100).astype(np.int64)
        g = pd.DataFrame(
            {key_col: df[key_col], value_col: df[value_col], "__w": w}
        ).groupby([key_col, value_col], as_index=False).agg(__w=("__w", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    def add_part(t: pa.Table) -> pa.Table:
        from .relops import _part_of

        return t.append_column("__part", _part_of(t[key_col], num_partitions))

    def median_partition(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    key_col: g[key_col],
                    "wmedian": pd.Series(dtype=np.float64),
                }
            )
        k = g[key_col].to_numpy()
        v = g[value_col].to_numpy()
        w = g["__w"].to_numpy()
        order = np.lexsort((v, k))
        k, v, w = k[order], v[order], w[order]
        first = np.concatenate(([True], k[1:] != k[:-1]))
        # merge cross-batch duplicates of the same (key, value)
        vfirst = np.concatenate(([True], first[1:] | (v[1:] != v[:-1])))
        vstarts = np.flatnonzero(vfirst)
        k2, v2 = k[vstarts], v[vstarts]
        w2 = np.add.reduceat(w, vstarts)
        kfirst = np.concatenate(([True], k2[1:] != k2[:-1]))
        kstarts = np.flatnonzero(kfirst)
        seg = np.cumsum(kfirst) - 1
        cw = np.cumsum(w2)
        base = np.concatenate(([0], cw[kstarts[1:] - 1]))
        cw = cw - base[seg]
        ends = np.append(kstarts[1:], len(k2)) - 1
        tot = cw[ends]
        hit = 2 * cw >= tot[seg]
        # first hit per key: hits are a suffix of each key's run
        pick = np.minimum.reduceat(
            np.where(hit, np.arange(len(k2)), len(k2)), kstarts
        )
        return pd.DataFrame({key_col: k2[kstarts], "wmedian": v2[pick]})

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(median_partition, batch_format="pandas")
    )

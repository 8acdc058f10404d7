"""Moment-based statistics operators: grouped z-score normalization,
Pearson correlation, fixed-width histograms, and ROLLUP aggregates.

All follow the combiner-partial pattern: each ``map_batches`` task emits a
tiny partial-moment table (one row per key seen in the batch), a single
small ``groupby`` folds partials, and the result is either returned (corr,
histogram, rollup) or broadcast back via ``ray.put`` for a second
normalization pass (z-score). No stage ever shuffles the raw rows, so at
100 TB the only all-to-all traffic is O(distinct keys) — the shape the
reference's driver-side ``np.mean``/``np.std`` calibration
(kiez/hubness_reduction/mutual_proximity.py:97-103) cannot reach.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .arrowutil import int_bincount


def _grouped_moment_partials(
    ds: "ray.data.Dataset", key_col: str, val_col: str
) -> "ray.data.Dataset":
    """Per-batch (key, n, s1, s2) partials — the combiner step."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys = df[key_col].to_numpy()
        v = df[val_col].to_numpy(dtype=np.float64)
        uk, inv = np.unique(keys, return_inverse=True)
        n = np.bincount(inv, minlength=len(uk))
        s1 = np.bincount(inv, weights=v, minlength=len(uk))
        s2 = np.bincount(inv, weights=v * v, minlength=len(uk))
        return pd.DataFrame({key_col: uk, "n": n, "s1": s1, "s2": s2})

    return ds.map_batches(partial, batch_format="pandas")


def grouped_moments(
    ds: "ray.data.Dataset", key_col: str, val_col: str
) -> pd.DataFrame:
    """(key, n, mean, sd_pop) — one streaming pass, tiny result."""
    from ray.data.aggregate import Sum

    folded = (
        _grouped_moment_partials(ds, key_col, val_col)
        .groupby(key_col)
        .aggregate(Sum("n", alias_name="n"), Sum("s1", alias_name="s1"),
                   Sum("s2", alias_name="s2"))
        .to_pandas()  # O(distinct keys) rows — small by construction
    )
    n = folded["n"].to_numpy(dtype=np.float64)
    mean = folded["s1"].to_numpy() / n
    var = np.maximum(folded["s2"].to_numpy() / n - mean * mean, 0.0)
    return pd.DataFrame(
        {key_col: folded[key_col], "n": folded["n"].astype(np.int64),
         "mean": mean, "sd": np.sqrt(var)}
    )


def zscore(
    ds: "ray.data.Dataset",
    key_col: str,
    val_col: str,
    id_col: str,
    out_col: str = "z",
) -> "ray.data.Dataset":
    """Per-key standardization ``(v - mean_key) / sd_key`` of every row.

    Two passes over the data: one moment reduction (tiny shuffle over
    distinct keys), then a map with the moment table broadcast via
    ``ray.put`` — read once per task from the object store, never
    re-shipped per batch. Keys with sd == 0 emit z = 0. Rows whose key has
    a single occurrence also get z = 0 (sd is 0 there).
    """
    stats = grouped_moments(ds, key_col, val_col)
    lookup_ref = ray.put(
        {
            k: (m, s)
            for k, m, s in zip(stats[key_col], stats["mean"], stats["sd"])
        }
    )

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(lookup_ref)
        keys = df[key_col].to_numpy()
        uk, inv = np.unique(keys, return_inverse=True)
        mu = np.array([lookup[k][0] for k in uk])[inv]
        sd = np.array([lookup[k][1] for k in uk])[inv]
        v = df[val_col].to_numpy(dtype=np.float64)
        with np.errstate(invalid="ignore"):
            z = np.where(sd > 0, (v - mu) / np.where(sd > 0, sd, 1.0), 0.0)
        return pd.DataFrame(
            {id_col: df[id_col], key_col: keys, out_col: z}
        )

    return ds.select_columns([id_col, key_col, val_col]).map_batches(
        norm, batch_format="pandas"
    )


def pearson_corr(
    ds: "ray.data.Dataset", x_col: str, y_col: str
) -> pd.DataFrame:
    """Pearson correlation via one pass of 6 scalar moment partials."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].to_numpy(dtype=np.float64)
        y = df[y_col].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "n": [float(len(x))], "sx": [x.sum()], "sy": [y.sum()],
                "sxx": [(x * x).sum()], "syy": [(y * y).sum()],
                "sxy": [(x * y).sum()],
            }
        )

    from ray.data.aggregate import Sum

    cols = ["n", "sx", "sy", "sxx", "syy", "sxy"]
    folded = (
        ds.select_columns([x_col, y_col])
        .map_batches(partial, batch_format="pandas")
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
    )
    n, sx, sy, sxx, syy, sxy = (folded[c] for c in cols)
    cov = sxy - sx * sy / n
    vx = sxx - sx * sx / n
    vy = syy - sy * sy / n
    r = cov / np.sqrt(vx * vy) if vx > 0 and vy > 0 else np.nan
    return pd.DataFrame({"corr": [r], "n": [int(n)]})


def value_histogram(
    ds: "ray.data.Dataset", val_col: str, width: float
) -> "ray.data.Dataset":
    """Fixed-width-bin counts: per-batch bincount partials + tiny fold.

    Bin id = floor(v / width) (works for negatives). The shuffle moves
    O(distinct bins) rows per task, never the data.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[val_col].to_numpy(dtype=np.float64)
        bins = np.floor(v / width).astype(np.int64)
        ub, cnt = np.unique(bins, return_counts=True)
        return pd.DataFrame({"bin": ub, "n": cnt.astype(np.int64)})

    from ray.data.aggregate import Sum

    return (
        ds.select_columns([val_col])
        .map_batches(partial, batch_format="pandas")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
    )


def rollup_sum_count(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    val_col: str,
    total_label: str = "ALL",
) -> pd.DataFrame:
    """GROUP BY ROLLUP(*key_cols) with Sum(val_col) + Count(*).

    One distributed pass computes the finest-level aggregate (the only
    scan of the raw data); every coarser ROLLUP level is derived from
    that tiny table driver-side — re-aggregating k levels costs
    O(levels x distinct keys), not k extra scans. NULL group markers are
    replaced by ``total_label`` so the result has no nulls.
    """
    from ray.data.aggregate import Count, Sum

    finest = (
        ds.select_columns(key_cols + [val_col])
        .groupby(key_cols)
        .aggregate(Sum(val_col, alias_name="s"), Count(alias_name="c"))
        .to_pandas()  # O(distinct key combos) — small by construction
    )
    frames = []
    for level in range(len(key_cols), -1, -1):
        keep = key_cols[:level]
        if keep:
            g = finest.groupby(keep, as_index=False).agg(
                s=("s", "sum"), c=("c", "sum")
            )
        else:
            g = pd.DataFrame(
                {"s": [finest["s"].sum()], "c": [finest["c"].sum()]}
            )
        for col in key_cols[level:]:
            g[col] = total_label
        frames.append(g[key_cols + ["s", "c"]])
    out = pd.concat(frames, ignore_index=True)
    out["c"] = out["c"].astype(np.int64)
    return out


def cube_sum_count(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    val_col: str,
    total_label: str = "ALL",
) -> pd.DataFrame:
    """GROUP BY CUBE(*key_cols) with Sum(val_col) + Count(*).

    Same scale shape as :func:`rollup_sum_count`: ONE distributed
    finest-level aggregate is the only scan of the raw data; all
    2^k - 1 coarser CUBE groupings (every key subset, not just ROLLUP's
    prefixes) are derived from that tiny table driver-side. NULL group
    markers become ``total_label``.
    """
    from itertools import combinations

    from ray.data.aggregate import Count, Sum

    finest = (
        ds.select_columns(key_cols + [val_col])
        .groupby(key_cols)
        .aggregate(Sum(val_col, alias_name="s"), Count(alias_name="c"))
        .to_pandas()  # O(distinct key combos) — small by construction
    )
    frames = []
    for level in range(len(key_cols), -1, -1):
        for keep in combinations(key_cols, level):
            if keep:
                g = finest.groupby(list(keep), as_index=False).agg(
                    s=("s", "sum"), c=("c", "sum")
                )
            else:
                g = pd.DataFrame(
                    {"s": [finest["s"].sum()], "c": [finest["c"].sum()]}
                )
            for col in key_cols:
                if col not in keep:
                    g[col] = total_label
            frames.append(g[key_cols + ["s", "c"]])
    out = pd.concat(frames, ignore_index=True)
    out["c"] = out["c"].astype(np.int64)
    return out


def dim_stats(
    ds: "ray.data.Dataset", emb_col: str = "embedding"
) -> pd.DataFrame:
    """Per-dimension mean / population-std over a vector column — the
    embedding-normalization calibration pass (what you'd feed a whitening
    or standard-scaler stage). Output: (d 1-based int64, mean_v, std_v
    rounded 6).

    Scale shape: each batch's list column is ONE zero-copy (n, dim)
    matrix; partials are three length-dim vectors (count, sum, sumsq)
    per batch — NO shuffle, the driver folds blocks x dim scalars.
    Sums run in float64 regardless of storage dtype.
    """
    from .arrowutil import emb_to_matrix, round_away

    def partial(t: pa.Table) -> pa.Table:
        m = emb_to_matrix(t[emb_col]).astype(np.float64)
        return pa.table(
            {
                "d": pa.array(
                    np.arange(1, m.shape[1] + 1, dtype=np.int64), pa.int64()
                ),
                "n": pa.array(
                    np.full(m.shape[1], m.shape[0], dtype=np.int64),
                    pa.int64(),
                ),
                "s": pa.array(m.sum(axis=0), pa.float64()),
                "ss": pa.array((m * m).sum(axis=0), pa.float64()),
            }
        )

    partials = (
        ds.select_columns([emb_col])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # blocks x dim rows — tiny
    )
    agg = partials.groupby("d", sort=True)[["n", "s", "ss"]].sum()
    n = agg["n"].to_numpy().astype(np.float64)
    mean = agg["s"].to_numpy() / n
    var = agg["ss"].to_numpy() / n - mean * mean
    std = np.sqrt(np.maximum(var, 0.0))
    return pd.DataFrame(
        {
            "d": agg.index.to_numpy().astype(np.int64),
            "mean_v": round_away(mean, 6),
            "std_v": round_away(std, 6),
        }
    )


def ks_statistic(
    ds: "ray.data.Dataset",
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
) -> pd.DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between the
    ``value_col`` distributions of two groups — the distribution-drift
    check between two corpus snapshots / splits. Output: one row
    (ks float64 rounded 6, n_a, n_b).

    Scale shape: per-batch combiner partials keyed by DISTINCT value
    (np.unique + per-group bincount) — no shuffle of raw rows; the
    driver folds distinct-value x group count partials and walks the
    merged ECDF once. Exactness requires per-distinct-value counts, so
    the fold is bounded by the value cardinality (2-decimal synthetic
    values here); for truly continuous data at corpus scale use a
    binned variant (value_histogram) instead.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch[group_col]
        keep = g.isin([group_a, group_b]).to_numpy()
        if not keep.any():
            return pd.DataFrame(
                {
                    "v": pd.Series(dtype=np.float64),
                    "n1": pd.Series(dtype=np.int64),
                    "n2": pd.Series(dtype=np.int64),
                }
            )
        v = batch[value_col].to_numpy(dtype=np.float64)[keep]
        is_a = (g.to_numpy(dtype=object)[keep] == group_a)
        u, inv = np.unique(v, return_inverse=True)
        n1 = np.bincount(inv[is_a], minlength=len(u))
        n2 = np.bincount(inv[~is_a], minlength=len(u))
        return pd.DataFrame(
            {"v": u, "n1": n1.astype(np.int64), "n2": n2.astype(np.int64)}
        )

    parts = ds.select_columns([value_col, group_col]).map_batches(
        partial, batch_format="pandas"
    ).to_pandas()  # distinct values x blocks — bounded by cardinality
    agg = parts.groupby("v", sort=True)[["n1", "n2"]].sum()
    t1 = int(agg["n1"].sum())
    t2 = int(agg["n2"].sum())
    c1 = np.cumsum(agg["n1"].to_numpy()).astype(np.float64)
    c2 = np.cumsum(agg["n2"].to_numpy()).astype(np.float64)
    gap = np.abs(c1 / float(t1) - c2 / float(t2))
    ks = float(gap.max()) if len(gap) else 0.0
    from .arrowutil import round_away

    return pd.DataFrame(
        {
            "ks": round_away(np.array([ks]), 6),
            "n_a": np.array([t1], dtype=np.int64),
            "n_b": np.array([t2], dtype=np.int64),
        }
    )


def _grouped_xy_moments(
    ds: "ray.data.Dataset", key_col: str, x_col: str, y_col: str
) -> pd.DataFrame:
    """Folded per-key bivariate moments (n, sx, sy, sxx, syy, sxy) —
    the shared combiner behind ``grouped_corr`` / ``grouped_regression``."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys = df[key_col].to_numpy()
        x = df[x_col].to_numpy(dtype=np.float64)
        y = df[y_col].to_numpy(dtype=np.float64)
        uk, inv = np.unique(keys, return_inverse=True)
        m = len(uk)
        return pd.DataFrame(
            {
                key_col: uk,
                "n": np.bincount(inv, minlength=m).astype(np.float64),
                "sx": np.bincount(inv, weights=x, minlength=m),
                "sy": np.bincount(inv, weights=y, minlength=m),
                "sxx": np.bincount(inv, weights=x * x, minlength=m),
                "syy": np.bincount(inv, weights=y * y, minlength=m),
                "sxy": np.bincount(inv, weights=x * y, minlength=m),
            }
        )

    cols = ["n", "sx", "sy", "sxx", "syy", "sxy"]
    return (
        ds.select_columns([key_col, x_col, y_col])
        .map_batches(partial, batch_format="pandas")
        .groupby(key_col)
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
        .to_pandas()  # O(distinct keys)
    )


def grouped_corr(
    ds: "ray.data.Dataset", key_col: str, x_col: str, y_col: str
) -> pd.DataFrame:
    """Per-key Pearson correlation — SQL ``corr(x, y) GROUP BY key`` —
    from one streaming pass of 6 per-key moment partials.

    Scale shape: each batch emits one (key, n, sx, sy, sxx, syy, sxy)
    row per key seen (bincount over the batch's key codes), a single
    small ``groupby`` folds the partials, and the finalize runs on
    O(distinct keys) rows. The raw rows are never shuffled — the same
    combiner regime as ``grouped_moments``; at 100 TB the all-to-all
    traffic is O(keys x blocks) tiny partials.
    """
    folded = _grouped_xy_moments(ds, key_col, x_col, y_col)
    n = folded["n"].to_numpy()
    sx, sy = folded["sx"].to_numpy(), folded["sy"].to_numpy()
    cov = folded["sxy"].to_numpy() - sx * sy / n
    vx = folded["sxx"].to_numpy() - sx * sx / n
    vy = folded["syy"].to_numpy() - sy * sy / n
    with np.errstate(invalid="ignore", divide="ignore"):
        r = np.where((vx > 0) & (vy > 0), cov / np.sqrt(vx * vy), np.nan)
    from .arrowutil import round_away

    return pd.DataFrame(
        {
            key_col: folded[key_col],
            "corr": round_away(r, 6),
            "n": n.astype(np.int64),
        }
    ).sort_values(key_col, ignore_index=True)


def contingency_chi2(
    ds: "ray.data.Dataset", a_col: str, b_col: str
) -> pd.DataFrame:
    """Chi-squared statistic of independence for two categorical columns
    (corpus-bias diagnostic: is ``lang`` independent of ``source``?).

    Uses the observed-cells identity chi2 = N * sum(o^2 / (rowtot *
    coltot)) - N, which needs no zero-cell enumeration, so the SQL
    oracle and the engine agree cell-for-cell.

    Scale shape: per-batch (a, b, n) pair counts via one np.unique (the
    combiner), one tiny groupby fold over O(cells) rows, finalize on the
    driver over the folded contingency table. Raw rows never shuffle.
    """
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {a_col: [], b_col: [], "n": np.array([], dtype=np.int64)}
            )
        ca, ua = pd.factorize(df[a_col], sort=False)
        cb, ub = pd.factorize(df[b_col], sort=False)
        code = ca.astype(np.int64) * len(ub) + cb
        uc, counts = np.unique(code, return_counts=True)
        return pd.DataFrame(
            {
                a_col: ua.take(uc // len(ub)),
                b_col: ub.take(uc % len(ub)),
                "n": counts.astype(np.int64),
            }
        )

    cells = (
        ds.select_columns([a_col, b_col])
        .map_batches(partial, batch_format="pandas")
        .groupby([a_col, b_col])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # O(cells)
    )
    o = cells["n"].to_numpy(dtype=np.float64)
    total = o.sum()
    rt = cells.groupby(a_col)["n"].transform("sum").to_numpy(np.float64)
    ct = cells.groupby(b_col)["n"].transform("sum").to_numpy(np.float64)
    chi2 = total * float((o * o / (rt * ct)).sum()) - total
    dof = (cells[a_col].nunique() - 1) * (cells[b_col].nunique() - 1)
    from .arrowutil import round_away

    return pd.DataFrame(
        {
            "chi2": round_away(np.array([chi2]), 6),
            "dof": np.array([dof], dtype=np.int64),
            "n": np.array([int(total)], dtype=np.int64),
        }
    )


def grouped_regression(
    ds: "ray.data.Dataset", key_col: str, x_col: str, y_col: str
) -> pd.DataFrame:
    """Per-key simple OLS regression of y on x — SQL ``regr_slope /
    regr_intercept / regr_r2 GROUP BY key`` — from the same one-pass
    bivariate moment partials as ``grouped_corr``.

    slope = cov(x,y)/var(x), intercept = mean(y) - slope*mean(x),
    r2 = corr^2. Scale shape identical to ``grouped_corr``: raw rows
    never shuffle; the only exchange is O(keys x blocks) tiny partials.
    """
    folded = _grouped_xy_moments(ds, key_col, x_col, y_col)
    n = folded["n"].to_numpy()
    sx, sy = folded["sx"].to_numpy(), folded["sy"].to_numpy()
    cov = folded["sxy"].to_numpy() - sx * sy / n
    vx = folded["sxx"].to_numpy() - sx * sx / n
    vy = folded["syy"].to_numpy() - sy * sy / n
    with np.errstate(invalid="ignore", divide="ignore"):
        slope = np.where(vx > 0, cov / vx, np.nan)
        intercept = sy / n - slope * sx / n
        r2 = np.where((vx > 0) & (vy > 0), cov * cov / (vx * vy), np.nan)
    from .arrowutil import round_away

    return pd.DataFrame(
        {
            key_col: folded[key_col],
            "slope": round_away(slope, 6),
            "intercept": round_away(intercept, 6),
            "r2": round_away(r2, 6),
            "n": n.astype(np.int64),
        }
    ).sort_values(key_col, ignore_index=True)


def grouped_skew_kurt(
    ds: "ray.data.Dataset", key_col: str, val_col: str
) -> pd.DataFrame:
    """Per-key sample skewness and excess kurtosis — SQL
    ``skewness(x), kurtosis(x) GROUP BY key`` with DuckDB's
    bias-corrected estimators:

        g1 = m3 / m2^1.5            G1 = g1 * sqrt(n(n-1)) / (n-2)
        g2 = m4 / m2^2 - 3          G2 = (n-1)/((n-2)(n-3)) * ((n+1) g2 + 6)

    (m_k = central moments; verified to 1e-13 against DuckDB's raw-sum
    accumulator, so 6-decimal rounding agrees.)

    Scale shape: one streaming pass of per-key power-sum partials
    (n, s1..s4, one bincount each over the batch's key codes), one tiny
    groupby fold, driver finalize on O(distinct keys) rows — raw rows
    never shuffle. Numerics: central moments come from raw power sums,
    exact for small-magnitude values (ints ≤ ~2^13 keep s4 inside
    float64's integer range); for large-mean data pre-center with
    ``zscore``-style shifting first.
    """
    from ray.data.aggregate import Sum

    from .arrowutil import round_away

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys = df[key_col].to_numpy()
        v = df[val_col].to_numpy(dtype=np.float64)
        uk, inv = np.unique(keys, return_inverse=True)
        m = len(uk)
        return pd.DataFrame(
            {
                key_col: uk,
                "n": np.bincount(inv, minlength=m).astype(np.float64),
                "s1": np.bincount(inv, weights=v, minlength=m),
                "s2": np.bincount(inv, weights=v * v, minlength=m),
                "s3": np.bincount(inv, weights=v**3, minlength=m),
                "s4": np.bincount(inv, weights=v**4, minlength=m),
            }
        )

    cols = ["n", "s1", "s2", "s3", "s4"]
    folded = (
        ds.select_columns([key_col, val_col])
        .map_batches(partial, batch_format="pandas")
        .groupby(key_col)
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
        .to_pandas()  # O(distinct keys)
    )
    n = folded["n"].to_numpy()
    s1, s2 = folded["s1"].to_numpy(), folded["s2"].to_numpy()
    s3, s4 = folded["s3"].to_numpy(), folded["s4"].to_numpy()
    mean = s1 / n
    m2 = s2 / n - mean**2
    m3 = s3 / n - 3 * mean * s2 / n + 2 * mean**3
    m4 = s4 / n - 4 * mean * s3 / n + 6 * mean**2 * s2 / n - 3 * mean**4
    with np.errstate(invalid="ignore", divide="ignore"):
        g1 = m3 / m2**1.5
        g2 = m4 / m2**2 - 3.0
        skew = g1 * np.sqrt(n * (n - 1)) / (n - 2)
        kurt = ((n - 1) / ((n - 2) * (n - 3))) * ((n + 1) * g2 + 6.0)
    return pd.DataFrame(
        {
            key_col: folded[key_col],
            "skew": round_away(skew, 6),
            "kurt": round_away(kurt, 6),
            "n": n.astype(np.int64),
        }
    ).sort_values(key_col, ignore_index=True)


def bcubed(
    ds: "ray.data.Dataset", pred_col: str, gold_col: str
) -> pd.DataFrame:
    """B-cubed precision / recall / F1 of a predicted clustering column
    against a gold grouping column — the standard per-record ER cluster
    quality metric (Bagga & Baldwin 1998): for each record, precision is
    the fraction of its predicted cluster sharing its gold label, recall
    the fraction of its gold class sharing its predicted cluster.

    Both averages collapse onto the contingency table:
        P = sum_cells(c^2 / pred_total) / N
        R = sum_cells(c^2 / gold_total) / N
    so the whole metric is one observed-cell combiner pass (identical
    scale shape to ``contingency_chi2``/``mutual_information``: per-batch
    pair counts, tiny groupby fold, O(cells) driver finalize — raw rows
    never shuffle).
    """
    from ray.data.aggregate import Sum

    from .arrowutil import round_away

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {pred_col: [], gold_col: [], "n": np.array([], dtype=np.int64)}
            )
        cp, up = pd.factorize(df[pred_col], sort=False)
        cg, ug = pd.factorize(df[gold_col], sort=False)
        code = cp.astype(np.int64) * len(ug) + cg
        uc, counts = np.unique(code, return_counts=True)
        return pd.DataFrame(
            {
                pred_col: up.take(uc // len(ug)),
                gold_col: ug.take(uc % len(ug)),
                "n": counts.astype(np.int64),
            }
        )

    cells = (
        ds.select_columns([pred_col, gold_col])
        .map_batches(partial, batch_format="pandas")
        .groupby([pred_col, gold_col])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # O(cells)
    )
    cells = cells.sort_values([pred_col, gold_col]).reset_index(drop=True)
    c = cells["n"].to_numpy(dtype=np.float64)
    total = c.sum()
    pt = cells.groupby(pred_col)["n"].transform("sum").to_numpy(np.float64)
    gt = cells.groupby(gold_col)["n"].transform("sum").to_numpy(np.float64)
    prec = float((c * c / pt).sum() / total)
    rec = float((c * c / gt).sum() / total)
    f1 = 2.0 * prec * rec / (prec + rec) if prec + rec > 0 else 0.0
    return pd.DataFrame(
        {
            "bcubed_precision": round_away(np.array([prec]), 6),
            "bcubed_recall": round_away(np.array([rec]), 6),
            "bcubed_f1": round_away(np.array([f1]), 6),
            "n": np.array([int(total)], dtype=np.int64),
        }
    )


def mutual_information(
    ds: "ray.data.Dataset", a_col: str, b_col: str
) -> pd.DataFrame:
    """Mutual information (nats) between two categorical columns — the
    information-theoretic companion to ``contingency_chi2`` (how many
    nats does knowing ``source`` tell you about ``lang``?).

    MI = sum over observed cells of (c/N) * ln(c*N / (rowtot*coltot));
    zero cells contribute zero, so enumerating only observed cells is
    exact and the SQL oracle agrees cell-for-cell.

    Scale shape: identical to chi2 — per-batch (a, b, n) pair counts via
    one factorize+unique (the combiner), one tiny groupby fold over
    O(cells) rows, driver finalize on the folded contingency table. Raw
    rows never shuffle.
    """
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {a_col: [], b_col: [], "n": np.array([], dtype=np.int64)}
            )
        ca, ua = pd.factorize(df[a_col], sort=False)
        cb, ub = pd.factorize(df[b_col], sort=False)
        code = ca.astype(np.int64) * len(ub) + cb
        uc, counts = np.unique(code, return_counts=True)
        return pd.DataFrame(
            {
                a_col: ua.take(uc // len(ub)),
                b_col: ub.take(uc % len(ub)),
                "n": counts.astype(np.int64),
            }
        )

    cells = (
        ds.select_columns([a_col, b_col])
        .map_batches(partial, batch_format="pandas")
        .groupby([a_col, b_col])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # O(cells)
    )
    cells = cells.sort_values([a_col, b_col]).reset_index(drop=True)
    o = cells["n"].to_numpy(dtype=np.float64)
    total = o.sum()
    rt = cells.groupby(a_col)["n"].transform("sum").to_numpy(np.float64)
    ct = cells.groupby(b_col)["n"].transform("sum").to_numpy(np.float64)
    mi = float(((o / total) * np.log(o * total / (rt * ct))).sum())
    from .arrowutil import round_away

    return pd.DataFrame(
        {
            "mi": round_away(np.array([mi]), 6),
            "cells": np.array([len(cells)], dtype=np.int64),
            "n": np.array([int(total)], dtype=np.int64),
        }
    )


def profile_numeric(
    ds: "ray.data.Dataset", cols: "list[str]"
) -> pd.DataFrame:
    """Data-profiling summary for numeric columns — one output row per
    column with (n, nulls, n_distinct, vmin, vmax): the quality report a
    pipeline runs before training on a new table.

    Scale shape: ONE shared pass for the cheap stats (per-batch
    n/nulls/min/max partials for every column at once, tiny driver
    fold) plus ONE shuffle for the exact distinct counts: each batch
    emits its unique (col_idx, value) pairs (the combiner — duplicate
    values collapse in-batch), a groupby over the pair stream finishes
    the global dedupe, and per-column bincount partials + a tiny fold
    count the survivors. Distinct traffic is O(distinct values) per
    column, never the raw rows; columns share both passes rather than
    rescanning per column.
    """
    from ray.data.aggregate import Sum

    from .arrowutil import round_away

    def cheap(t: pa.Table) -> pa.Table:
        rows = []
        for i, c in enumerate(cols):
            v = t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            nn = np.isnan(v)
            ok = v[~nn]
            rows.append(
                (
                    i,
                    len(v),
                    int(nn.sum()),
                    float(ok.min()) if len(ok) else np.inf,
                    float(ok.max()) if len(ok) else -np.inf,
                )
            )
        a = np.array(rows, dtype=np.float64)
        return pa.table(
            {
                "ci": pa.array(a[:, 0].astype(np.int64), pa.int64()),
                "n": pa.array(a[:, 1].astype(np.int64), pa.int64()),
                "nulls": pa.array(a[:, 2].astype(np.int64), pa.int64()),
                "vmin": pa.array(a[:, 3], pa.float64()),
                "vmax": pa.array(a[:, 4], pa.float64()),
            }
        )

    folded = {}
    for b in (
        ds.select_columns(cols)
        .map_batches(cheap, batch_format="pyarrow")
        .iter_batches(batch_format="pandas", batch_size=None)
    ):
        for _, r in b.iterrows():
            ci = int(r["ci"])
            f = folded.setdefault(ci, [0, 0, np.inf, -np.inf])
            f[0] += int(r["n"])
            f[1] += int(r["nulls"])
            f[2] = min(f[2], r["vmin"])
            f[3] = max(f[3], r["vmax"])

    def pairs(t: pa.Table) -> pa.Table:
        ci_parts, v_parts = [], []
        for i, c in enumerate(cols):
            v = t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            u = np.unique(v[~np.isnan(v)])
            ci_parts.append(np.full(len(u), i, dtype=np.int64))
            v_parts.append(u)
        return pa.table(
            {
                "ci": pa.array(np.concatenate(ci_parts), pa.int64()),
                "v": pa.array(np.concatenate(v_parts), pa.float64()),
            }
        )

    def count_partial(t: pa.Table) -> pa.Table:
        ci = t["ci"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "ci": pa.array(np.arange(len(cols)), pa.int64()),
                "c": pa.array(
                    np.bincount(ci, minlength=len(cols)).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    from ray.data.aggregate import Count

    nd = (
        ds.select_columns(cols)
        .map_batches(pairs, batch_format="pyarrow")
        .groupby(["ci", "v"])
        .aggregate(Count())
        .select_columns(["ci"])
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("ci")
        .aggregate(Sum("c", alias_name="n_distinct"))
        .to_pandas()
        .set_index("ci")["n_distinct"]
    )
    out = pd.DataFrame(
        {
            "column": cols,
            "n": [folded[i][0] for i in range(len(cols))],
            "nulls": [folded[i][1] for i in range(len(cols))],
            "n_distinct": [int(nd.get(i, 0)) for i in range(len(cols))],
            "vmin": round_away(
                np.array([folded[i][2] for i in range(len(cols))]), 6
            ),
            "vmax": round_away(
                np.array([folded[i][3] for i in range(len(cols))]), 6
            ),
        }
    )
    out["n"] = out["n"].astype(np.int64)
    out["nulls"] = out["nulls"].astype(np.int64)
    out["n_distinct"] = out["n_distinct"].astype(np.int64)
    return out


def grouped_geomean(
    ds: "ray.data.Dataset", key_col: str, val_col: str
) -> pd.DataFrame:
    """Per-key geometric and harmonic means — the multiplicative-scale
    aggregates SQL spells ``exp(avg(ln(v)))`` and ``n / sum(1/v)``.
    Values must be strictly positive (log / reciprocal domain); callers
    filter upstream.

    Output: (key_col, n int64, geo_mean float64 rounded 6, harm_mean
    float64 rounded 6), sorted by key.

    Scale shape: per-batch (key, n, sum_ln, sum_inv) combiner partials —
    raw rows collapse to distinct-keys rows inside every map task before
    any exchange — then one tiny groupby fold; only O(distinct keys)
    rows ever shuffle, and the finalize is O(distinct keys) arithmetic.
    """
    from ray.data.aggregate import Sum

    from .arrowutil import round_away

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys = df[key_col].to_numpy()
        v = df[val_col].to_numpy(dtype=np.float64)
        uk, inv = np.unique(keys, return_inverse=True)
        n = np.bincount(inv, minlength=len(uk))
        sl = np.bincount(inv, weights=np.log(v), minlength=len(uk))
        si = np.bincount(inv, weights=1.0 / v, minlength=len(uk))
        return pd.DataFrame({key_col: uk, "n": n, "sl": sl, "si": si})

    folded = (
        ds.select_columns([key_col, val_col])
        .map_batches(partial, batch_format="pandas")
        .groupby(key_col)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sl", alias_name="sl"),
            Sum("si", alias_name="si"),
        )
        .to_pandas()  # O(distinct keys)
    )
    n = folded["n"].to_numpy(dtype=np.float64)
    out = pd.DataFrame(
        {
            key_col: folded[key_col],
            "n": folded["n"].astype(np.int64),
            "geo_mean": round_away(np.exp(folded["sl"].to_numpy() / n), 6),
            "harm_mean": round_away(n / folded["si"].to_numpy(), 6),
        }
    )
    return out.sort_values(key_col, ignore_index=True)


def grouped_weighted_avg(
    ds: "ray.data.Dataset",
    key_col: str,
    val_col: str,
    w_col: str,
) -> pd.DataFrame:
    """Per-key weighted average ``sum(w*v) / sum(w)`` with exact
    fixed-point arithmetic: values quantize to int64 cents, weights to
    int64, so both sums are order/partition-invariant integers and the
    only float op is the single final division (the money-weighted
    metric float accumulation would make nondeterministic).

    Output: (key_col, total_w int64, wavg float64 rounded 6), sorted by
    key.

    Scale shape: per-batch (key, sum_wv, sum_w) combiner partials via
    two bincounts — raw rows collapse to distinct keys before any
    exchange — then one tiny groupby fold.
    """
    from ray.data.aggregate import Sum

    from .arrowutil import round_away

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys = df[key_col].to_numpy()
        cents = np.round(
            df[val_col].to_numpy(dtype=np.float64) * 100.0
        ).astype(np.int64)
        w = np.round(df[w_col].to_numpy(dtype=np.float64)).astype(
            np.int64
        )
        uk, inv = np.unique(keys, return_inverse=True)
        # int64 scatter-add: float-weighted bincount is exact only below
        # 2^53 per per-batch per-key sum
        swv = int_bincount(inv, cents * w, len(uk))
        sw = int_bincount(inv, w, len(uk))
        return pd.DataFrame({key_col: uk, "swv": swv, "sw": sw})

    folded = (
        ds.select_columns([key_col, val_col, w_col])
        .map_batches(partial, batch_format="pandas")
        .groupby(key_col)
        .aggregate(
            Sum("swv", alias_name="swv"), Sum("sw", alias_name="sw")
        )
        .to_pandas()  # O(distinct keys)
    ).sort_values(key_col, ignore_index=True)
    return pd.DataFrame(
        {
            key_col: folded[key_col],
            "total_w": folded["sw"].astype(np.int64),
            "wavg": round_away(
                folded["swv"].to_numpy()
                / (folded["sw"].to_numpy() * 100.0),
                6,
            ),
        }
    )


def grouped_centroid(
    ds: "ray.data.Dataset",
    label_col: str,
    emb_col: str,
    num_partitions: int = 32,
) -> pd.DataFrame:
    """Per-label embedding centroid (mean per dimension), EXACT.

    Each element is half-away quantized to 1e-6 int64 terms
    (``round_away(x * 1e6)``) so the fold is exact integer addition —
    order/partition-invariant and reproducible against a SQL oracle
    using identical per-term quantization. Scale shape: one
    ``reduceat(axis=0)`` per batch collapses n rows to (labels-in-batch
    x d) long-format partials keyed by ``label * 128 + dim``; ONE
    coarse hash shuffle of 3-int64-column partials; embeddings never
    leave their scan. Driver output is O(labels x d) — the grouped
    companion to the global ``dim_stats``."""
    import pyarrow.compute as pc

    from .arrowutil import emb_to_matrix, round_away

    P = num_partitions

    def partials(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"k": pa.array([], pa.int64()),
                 "s": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        X = emb_to_matrix(t[emb_col]).astype(np.float64)
        d = X.shape[1]
        assert d <= 128, "pack budget: dim must be < 128"
        terms = round_away(X * 1e6, 0).astype(np.int64)
        lab = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(lab, kind="stable")
        labs = lab[order]
        starts = np.flatnonzero(
            np.concatenate(([True], labs[1:] != labs[:-1]))
        )
        sums = np.add.reduceat(terms[order], starts, axis=0)  # (L, d)
        counts = np.diff(np.append(starts, len(labs)))
        k = (labs[starts][:, None] * 128 + np.arange(d)[None, :]).ravel()
        return pa.table(
            {
                "k": pa.array(k, pa.int64()),
                "s": pa.array(sums.ravel(), pa.int64()),
                "n": pa.array(np.repeat(counts.astype(np.int64), d)),
            }
        )

    def add_part(t: pa.Table) -> pa.Table:
        part = pc.cast(
            pc.bit_wise_and(t["k"], pa.scalar(P - 1, pa.int64())),
            pa.int32(),
        )
        return t.append_column("__part", part)

    def fold(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks = k[order]
        starts = np.flatnonzero(
            np.concatenate(([True], ks[1:] != ks[:-1]))
        )
        return pa.table(
            {
                "k": pa.array(ks[starts], pa.int64()),
                "s": pa.array(
                    np.add.reduceat(
                        g["s"].to_numpy(zero_copy_only=False)[order], starts
                    ),
                    pa.int64(),
                ),
                "n": pa.array(
                    np.add.reduceat(
                        g["n"].to_numpy(zero_copy_only=False)[order], starts
                    ),
                    pa.int64(),
                ),
            }
        )

    folded = (
        ds.map_batches(partials, batch_format="pyarrow",
                       zero_copy_batch=True)
        .map_batches(add_part, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("__part")
        .map_groups(
            lambda g: fold(g.select(["k", "s", "n"])),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    k = folded["k"].to_numpy()
    s = folded["s"].to_numpy().astype(np.int64)
    n = folded["n"].to_numpy().astype(np.int64)
    # half-away rounding of s/n in EXACT integer math (no double-
    # rounding hazard when the quotient lands on a .5 micro-unit)
    mu = np.sign(s) * ((2 * np.abs(s) + n) // (2 * n))
    out = pd.DataFrame(
        {
            "label": (k // 128).astype(np.int64),
            "dim": (k % 128).astype(np.int64) + 1,
            "n": folded["n"].to_numpy(),
            "centroid": mu.astype(np.float64) / 1e6,
        }
    )
    return out.sort_values(["label", "dim"]).reset_index(drop=True)

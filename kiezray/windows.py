"""Stream-shaped operators over an ordered, partitioned event log.

The reference is purely batch (SURVEY.md §2.6: no windows/watermarks); Ray
Data likewise has no event-time runtime. These operators implement the
standard batch formulations: tumbling windows as a grouped aggregate on
the truncated timestamp, sliding windows and sessionization as per-key
`map_groups` over the key-partitioned, ts-sorted log — the ordering
assumption is per *group* (Ray groups deliver all rows of a key together;
each kernel sorts its group by ts, so input order is free).

Skew note: the per-key groupby is the shuffle; hot keys are bounded by
the event volume of one key. For whale keys, pre-split by (key,
day-bucket) and merge window fragments downstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .arrowutil import int_bincount
from .dedup import _splitmix64


def _grouped_window_sum(
    parts: "ray.data.Dataset", key_col: str, num_partitions: int = 64
) -> "ray.data.Dataset":
    """Exact (key, window_start) sum of per-batch partials.

    Overflow-safe replacement for the old packed ``k*2^40 + w%2^40`` int64
    key (which silently wrapped for keys >= 2^23 and could merge distinct
    (key, window) sums): rows are hash-partitioned on a mixed 64-bit hash
    of (key, window) — a pair never spans two partitions — and each
    partition runs an exact in-partition pandas groupby on the real pair.
    Same coarse-partition pattern as ``relops.grouped_topk``.
    """

    def add_part(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["window_start"].to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            mixed = _splitmix64(
                _splitmix64(k.astype(np.uint64)) ^ w.astype(np.uint64)
            )
        part = (mixed % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("__part", pa.array(part, pa.int32()))

    def sum_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__part"])
        if len(g) == 0:
            return g
        return g.groupby([key_col, "window_start"], as_index=False).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum")
        )

    return (
        parts.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(sum_partition, batch_format="pandas")
    )


def tumbling_window(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_s: int = 3600,
) -> "ray.data.Dataset":
    """(key, window_start, n_events, sum_value) via pre-aggregated partials:
    each batch emits one row per (key, window) it contains, then a small
    grouped sum — the combiner pattern, no raw-row shuffle."""

    def partials(t: pa.Table) -> pa.Table:
        df = t.select([key_col, ts_col, value_col]).to_pandas()
        # unit-safe: arrow timestamps surface as datetime64[us] in pandas
        epoch = df[ts_col].to_numpy().astype("datetime64[s]").astype(np.int64)
        df["window_start"] = (epoch // window_s) * window_s
        g = (
            df.groupby([key_col, "window_start"], as_index=False)
            .agg(n_events=(value_col, "size"), sum_value=(value_col, "sum"))
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = events.map_batches(partials, batch_format="pyarrow")
    return _grouped_window_sum(parts, key_col)


def sliding_window(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_s: int = 3600,
    slide_s: int = 900,
) -> "ray.data.Dataset":
    """Sliding windows = union of slide-aligned tumbling assignments: each
    event lands in window_s/slide_s windows; emitted per batch, then the
    same packed grouped sum as tumbling."""
    assert window_s % slide_s == 0
    fan = window_s // slide_s

    def explode(t: pa.Table) -> pa.Table:
        df = t.select([key_col, ts_col, value_col]).to_pandas()
        epoch = df[ts_col].to_numpy().astype("datetime64[s]").astype(np.int64)
        keys = df[key_col].to_numpy()
        vals = df[value_col].to_numpy()
        base = (epoch // slide_s) * slide_s
        starts = base[:, None] - np.arange(fan)[None, :] * slide_s
        keep = (epoch[:, None] - starts) < window_s
        rep_k = np.repeat(keys, fan)[keep.ravel()]
        rep_v = np.repeat(vals, fan)[keep.ravel()]
        ws = starts.ravel()[keep.ravel()]
        df2 = pd.DataFrame(
            {key_col: rep_k, "window_start": ws, "value": rep_v}
        )
        g = df2.groupby([key_col, "window_start"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = events.map_batches(explode, batch_format="pyarrow")
    return _grouped_window_sum(parts, key_col)


def sessionize(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
) -> "ray.data.Dataset":
    """Session windows per key: sort the key's events by ts, split where
    the gap exceeds ``gap_s``. Output: (key, session_start, session_end,
    n_events).

    A key's whole history must be together, but grouping PER KEY costs
    ~100-200us of map_groups overhead per group on this Ray version — so
    keys are hash-partitioned into 64 coarse partitions (a key never
    spans two) and each partition sessionizes ALL of its keys in one
    lexsort + boundary pass: a session break is a key change or a gap
    exceeding ``gap_s``, and start/end/count come from the boundary
    indices directly."""
    from .dedup import _splitmix64

    num_partitions = 64

    def add_part(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (
            _splitmix64(k.astype(np.uint64)) % np.uint64(num_partitions)
        ).astype(np.int32)
        return t.append_column("__part", pa.array(part, pa.int32()))

    def sessions_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__part"])
        if len(g) == 0:
            return pd.DataFrame(
                {
                    key_col: pd.Series(dtype=np.int64),
                    "session_start": pd.Series(dtype=np.int64),
                    "session_end": pd.Series(dtype=np.int64),
                    "n_events": pd.Series(dtype=np.int64),
                }
            )
        keys = g[key_col].to_numpy()
        epoch = g[ts_col].to_numpy().astype("datetime64[s]").astype(np.int64)
        order = np.lexsort((epoch, keys))
        k, e = keys[order], epoch[order]
        new = np.concatenate(
            ([True], (k[1:] != k[:-1]) | (np.diff(e) > gap_s))
        )
        starts = np.flatnonzero(new)
        stops = np.append(starts[1:], len(e))
        return pd.DataFrame(
            {
                key_col: k[starts],
                "session_start": e[starts],
                "session_end": e[stops - 1],
                "n_events": (stops - starts).astype(np.int64),
            }
        )

    return (
        events.select_columns([key_col, ts_col])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(sessions_partition, batch_format="pandas")
    )


def running_aggregate(
    events: "ray.data.Dataset",
    key_col: str,
    order_col: str,
    tie_col: str,
    val_col: str,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Per-key running count + running sum in event order — the
    cumulative window function (``sum(v) OVER (PARTITION BY key ORDER BY
    order, tie ROWS UNBOUNDED PRECEDING)``), which Ray Data has no
    native operator for.

    Output: the four input columns plus ``running_cnt`` / ``running_sum``
    (1-based inclusive of the current row). ``tie_col`` must be unique
    per key so the order — and therefore every prefix — is deterministic
    and partitioning-invariant.

    Scale shape: rows hash-partition on the key (ONE shuffle; a key
    never spans two partitions — cumulative state never crosses workers),
    then each partition orders all its keys with ONE lexsort and computes
    every key's prefix sums in two vectorized passes (global cumsum minus
    the value accumulated before the key's first row). Exact for integer
    ``val_col``; floats inherit the cross-group subtraction's rounding
    (use integer units — e.g. cents — when byte-exactness matters). Hot
    keys are bounded by one key's event volume, same caveat as
    ``sessionize``.
    """

    def add_part(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (k % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("__part", pa.array(part, pa.int32()))

    def prefix_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__part"])
        if len(g) == 0:
            g["running_cnt"] = pd.Series(dtype=np.int64)
            g["running_sum"] = pd.Series(dtype=np.int64)
            return g
        key = g[key_col].to_numpy()
        order = np.lexsort(
            (g[tie_col].to_numpy(), g[order_col].to_numpy(), key)
        )
        sk = key[order]
        v = g[val_col].to_numpy()[order]
        first = np.concatenate(([True], sk[1:] != sk[:-1]))
        starts = np.flatnonzero(first)
        grp = np.cumsum(first) - 1
        pos = np.arange(len(sk))
        cnt = pos - starts[grp] + 1
        cs = np.cumsum(v)
        base = np.where(starts > 0, cs[starts - 1], 0)
        run = cs - base[grp]
        out = g.iloc[order].copy()
        out["running_cnt"] = cnt.astype(np.int64)
        out["running_sum"] = run
        return out

    return (
        events.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(prefix_partition, batch_format="pandas")
    )


def event_gaps(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Per-key LAG delta: microseconds since the key's previous event —
    ``epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY key ORDER BY ts,
    id)``. Each key's first event (no predecessor) is omitted.

    Output: (id_col, key_col, gap_us int64). Same scale shape as
    ``sessionize``: ONE hash-partition shuffle on the key (a key never
    spans two partitions), then one lexsort + np.diff per partition —
    no per-key group dispatch, no global sort. ``id_col`` must be unique
    so tie order (and therefore which row is "previous") is
    deterministic under any partitioning.
    """
    from .dedup import _splitmix64

    def add_part(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (
            _splitmix64(k.astype(np.uint64)) % np.uint64(num_partitions)
        ).astype(np.int32)
        return t.append_column("__part", pa.array(part, pa.int32()))

    def gaps_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                id_col: pd.Series(dtype=np.int64),
                key_col: pd.Series(dtype=np.int64),
                "gap_us": pd.Series(dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        keys = g[key_col].to_numpy()
        ids = g[id_col].to_numpy()
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((ids, us, keys))
        k, i, e = keys[order], ids[order], us[order]
        same = k[1:] == k[:-1]  # rows 1.. whose predecessor shares the key
        if not same.any():
            return empty
        sel = np.flatnonzero(same) + 1
        return pd.DataFrame(
            {
                id_col: i[sel],
                key_col: k[sel],
                "gap_us": (e[sel] - e[sel - 1]).astype(np.int64),
            }
        )

    return (
        events.select_columns([id_col, key_col, ts_col])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(gaps_partition, batch_format="pandas")
    )


def event_sequences(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "event_type",
    sep: str = ",",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Per-key ordered value concatenation — SQL ``string_agg(val, sep
    ORDER BY ts, id)`` — the "assemble a training sequence from a user's
    event history" pass. Output: (key_col, seq, n_events).

    Scale shape: one key-hash shuffle (a key never spans two
    partitions), then each partition orders ALL of its keys with one
    lexsort and builds every key's string with one vectorized
    ``np.add.reduceat``-style segmented join (no per-key Python loop;
    the only O(rows) Python cost is the final join over per-key slices,
    which pandas does in C). ``id_col`` must be unique so the order is
    deterministic under any partitioning.
    """
    from .dedup import _splitmix64

    def add_part(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (
            _splitmix64(k.astype(np.uint64)) % np.uint64(num_partitions)
        ).astype(np.int32)
        return t.append_column("__part", pa.array(part, pa.int32()))

    def seq_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                key_col: pd.Series(dtype=np.int64),
                "seq": pd.Series(dtype=object),
                "n_events": pd.Series(dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        keys = g[key_col].to_numpy()
        ids = g[id_col].to_numpy()
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        vals = g[val_col].to_numpy(dtype=object)
        order = np.lexsort((ids, us, keys))
        k, v = keys[order], vals[order]
        starts = np.flatnonzero(
            np.concatenate(([True], k[1:] != k[:-1]))
        )
        n = np.diff(np.append(starts, len(k)))
        # segmented join: one separator-interleaved flat array, sliced
        # per key — the C-level str.join path, no per-row concat loop
        joined = pd.Series(v).groupby(
            np.repeat(np.arange(len(starts)), n)
        ).agg(sep.join).to_numpy(dtype=object)
        return pd.DataFrame(
            {
                key_col: k[starts],
                "seq": joined,
                "n_events": n.astype(np.int64),
            }
        )

    return (
        events.select_columns([key_col, ts_col, id_col, val_col])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(seq_partition, batch_format="pandas")
    )


def funnel_steps(
    ds: "ray.data.Dataset",
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    num_partitions: int = 32,
) -> pd.DataFrame:
    """Ordered funnel analysis: how many keys (users) complete step 1,
    then step 2 STRICTLY AFTER their first step 1, then step 3 strictly
    after that, ... Returns one row per step with the cumulative count
    of keys reaching at least that depth — the product-analytics /
    curriculum-ordering primitive.

    Scale shape: one key-hash shuffle (a user's events land in one
    partition), then K vectorized passes per partition — pass i is a
    boolean mask + unsorted scatter-min (``np.minimum.at``) over
    factorized user codes, no sort and no per-user Python. Partitions
    emit K-row depth partials; the driver folds #partitions x K rows.
    """
    from .dedup import _splitmix64

    K = len(steps)

    def add_part(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (
            _splitmix64(k.astype(np.uint64)) % np.uint64(num_partitions)
        ).astype(np.int32)
        return t.append_column("__part", pa.array(part, pa.int32()))

    SENT = np.iinfo(np.int64).max

    def depths_partition(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"depth": pd.Series(dtype=np.int64),
                 "n": pd.Series(dtype=np.int64)}
            )
        codes, uniq = pd.factorize(g[key_col].to_numpy())
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        types = g[type_col].to_numpy()
        n_users = len(uniq)
        prev = np.full(n_users, np.iinfo(np.int64).min, dtype=np.int64)
        depth = np.zeros(n_users, dtype=np.int64)
        for s in steps:
            cand = (types == s) & (ts > prev[codes])
            m = np.full(n_users, SENT, dtype=np.int64)
            np.minimum.at(m, codes[cand], ts[cand])
            reached = m < SENT
            depth += reached
            prev = np.where(reached, m, SENT)  # unreached: block next step
        counts = np.bincount(depth, minlength=K + 1)
        return pd.DataFrame(
            {"depth": np.arange(K + 1, dtype=np.int64),
             "n": counts.astype(np.int64)}
        )

    partials = (
        ds.select_columns([key_col, ts_col, type_col])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(depths_partition, batch_format="pandas")
        .to_pandas()  # <= num_partitions x (K+1) rows
    )
    by_depth = (
        partials.groupby("depth")["n"].sum().reindex(
            range(K + 1), fill_value=0
        )
    )
    # cumulative: users reaching AT LEAST depth i
    at_least = by_depth[::-1].cumsum()[::-1]
    return pd.DataFrame(
        {
            "step": [f"step{i+1}_{s}" for i, s in enumerate(steps)],
            "users": [np.int64(at_least[i + 1]) for i in range(K)],
        }
    )


def event_transitions(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "event_type",
    num_partitions: int = 64,
) -> pd.DataFrame:
    """Per-key Markov transition counts: for each key's time-ordered
    event stream, count every adjacent (previous value, value) pair —
    SQL ``lag(val) OVER (PARTITION BY key ORDER BY ts, id)`` + GROUP
    BY. Output: (prev_type, event_type, n), the transition matrix a
    sequence-model data pipeline trains priors from.

    Scale shape: ONE key-hash shuffle (a key never spans two
    partitions, so every adjacency is visible inside one partition),
    one lexsort + shifted-compare per partition, then a per-partition
    pandas groupby emits at most |alphabet|^2 partial rows. The driver
    folds only partitions x alphabet^2 counts — never event rows.
    """
    from .dedup import _splitmix64

    def add_part(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (
            _splitmix64(k.astype(np.uint64)) % np.uint64(num_partitions)
        ).astype(np.int32)
        return t.append_column("__part", pa.array(part, pa.int32()))

    def trans_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "prev_type": pd.Series(dtype=object),
                "event_type": pd.Series(dtype=object),
                "n": pd.Series(dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        keys = g[key_col].to_numpy()
        ids = g[id_col].to_numpy()
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        vals = g[val_col].to_numpy(dtype=object)
        order = np.lexsort((ids, us, keys))
        k, v = keys[order], vals[order]
        same = k[1:] == k[:-1]
        if not same.any():
            return empty
        sel = np.flatnonzero(same) + 1
        part = (
            pd.DataFrame({"prev_type": v[sel - 1], "event_type": v[sel]})
            .groupby(["prev_type", "event_type"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        part["n"] = part["n"].astype(np.int64)
        return part

    partials = (
        events.select_columns([id_col, key_col, ts_col, val_col])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(trans_partition, batch_format="pandas")
        .to_pandas()  # partitions x alphabet^2 rows — tiny by contract
    )
    if len(partials) == 0:
        return partials
    out = (
        partials.groupby(["prev_type", "event_type"], sort=True)["n"]
        .sum()
        .reset_index()
    )
    return out.sort_values(["prev_type", "event_type"]).reset_index(drop=True)


def cohort_retention(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int = 64,
) -> pd.DataFrame:
    """Weekly cohort-retention matrix: cohort = Monday-start week of a
    key's FIRST event (DuckDB ``date_trunc('week', ts)`` semantics),
    and for every (cohort, weeks-since-cohort) cell the number of
    distinct keys active in that offset week. Output: (cohort_day
    int64 epoch days of the cohort Monday, week_offset int64, users).

    Scale shape: ONE key-hash shuffle; a key's whole history lands in
    one partition, so its first week AND its distinct active weeks are
    computed locally (factorize + scatter-min, lexsort dedup — no
    per-key Python). Each partition emits at most cohorts x horizon
    partial cells, already distinct-by-construction (each key counts
    once per cell because the (key, week) pairs were deduped locally
    and a key lives in exactly one partition). The driver folds only
    the tiny cell partials.
    """
    from .dedup import _splitmix64

    def add_part(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (
            _splitmix64(k.astype(np.uint64)) % np.uint64(num_partitions)
        ).astype(np.int32)
        return t.append_column("__part", pa.array(part, pa.int32()))

    def cells_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "cohort_day": pd.Series(dtype=np.int64),
                "week_offset": pd.Series(dtype=np.int64),
                "users": pd.Series(dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        keys = g[key_col].to_numpy()
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        days = us // 86_400_000_000
        week = days - ((days - 4) % 7)  # Monday start; day 4 = 1970-01-05
        codes, _ = pd.factorize(keys, sort=False)
        nk = codes.max() + 1
        first = np.full(nk, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first, codes, week)
        # distinct (key, active week) pairs via one lexsort
        order = np.lexsort((week, codes))
        ck, wk = codes[order], week[order]
        keep = np.concatenate(
            ([True], (ck[1:] != ck[:-1]) | (wk[1:] != wk[:-1]))
        )
        ck, wk = ck[keep], wk[keep]
        cohort = first[ck]
        off = (wk - cohort) // 7
        part = (
            pd.DataFrame({"cohort_day": cohort, "week_offset": off})
            .groupby(["cohort_day", "week_offset"], sort=False)
            .size()
            .rename("users")
            .reset_index()
        )
        part["users"] = part["users"].astype(np.int64)
        return part

    partials = (
        events.select_columns([key_col, ts_col])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(cells_partition, batch_format="pandas")
        .to_pandas()  # partitions x cohorts x horizon rows — tiny
    )
    if len(partials) == 0:
        return partials
    out = (
        partials.groupby(["cohort_day", "week_offset"], sort=True)["users"]
        .sum()
        .reset_index()
    )
    return out.sort_values(
        ["cohort_day", "week_offset"]
    ).reset_index(drop=True)


def followup_counts(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    type_a: str = "click",
    type_b: str = "purchase",
    horizon_us: int = 3_600_000_000,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Per-anchor interval count: for every ``type_a`` event, how many
    ``type_b`` events the SAME key produced strictly after it and within
    ``horizon_us`` — SQL ``LEFT JOIN ... ON b.ts > a.ts AND b.ts <=
    a.ts + horizon`` + GROUP BY, the attribution / conversion-latency
    pass. Output: (id_col, n_follow int64), zero-followup anchors kept.

    Scale shape: ONE key-hash shuffle; inside a partition every key's
    events form one contiguous ts-sorted segment, and all anchors are
    answered with TWO global ``searchsorted`` calls + one prefix-sum
    lookup — segments are made jointly monotonic by adding a per-segment
    stride offset (stride = ts span + horizon + 2), so there is no
    per-key loop at all. Requires n_segments * stride < 2^63 per
    partition (asserted): ~1e6 keys x a month of microseconds per
    partition is 3e18, inside int64; repartition finer long before that.
    """
    from .dedup import _splitmix64

    def add_part(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (
            _splitmix64(k.astype(np.uint64)) % np.uint64(num_partitions)
        ).astype(np.int32)
        return t.append_column("__part", pa.array(part, pa.int32()))

    def count_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                id_col: pd.Series(dtype=np.int64),
                "n_follow": pd.Series(dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        keys = g[key_col].to_numpy()
        ids = g[id_col].to_numpy()
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        types = g[type_col].to_numpy(dtype=object)
        order = np.lexsort((ids, us, keys))
        k, i, e, v = keys[order], ids[order], us[order], types[order]
        is_a = v == type_a
        if not is_a.any():
            return empty
        seg = np.cumsum(np.concatenate(([0], (k[1:] != k[:-1]).astype(np.int64))))
        e0 = e - e.min()
        stride = np.int64(int(e0.max()) + horizon_us + 2)
        assert (int(seg[-1]) + 1) * int(stride) < 2**63, (
            "segment-offset key would overflow int64; repartition finer"
        )
        flat = seg * stride + e0  # jointly monotonic across segments
        cum_b = np.concatenate(([0], np.cumsum((v == type_b).astype(np.int64))))
        a_idx = np.flatnonzero(is_a)
        lo = np.searchsorted(flat, flat[a_idx], side="right")
        hi = np.searchsorted(flat, flat[a_idx] + horizon_us, side="right")
        n_follow = cum_b[hi] - cum_b[lo]
        return pd.DataFrame(
            {id_col: i[a_idx], "n_follow": n_follow.astype(np.int64)}
        )

    return (
        events.select_columns([id_col, key_col, ts_col, type_col])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(count_partition, batch_format="pandas")
    )


def time_weighted_avg(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Per-key time-weighted average: each event's value weighted by the
    interval until the key's NEXT event (the last event carries no
    interval) — SQL ``sum(v * (lead(ts) - ts)) / sum(lead(ts) - ts)``.
    The irregular-time-series mean (sensor/price/engagement TWAP).
    Output: (key_col, twap float64 rounded 6); single-event keys are
    omitted (no interval).

    Scale shape: ONE key-hash shuffle, one lexsort + shifted diff per
    partition, per-key numerator/denominator via two bincounts — same
    no-per-key-Python regime as ``event_gaps``.
    """
    from .arrowutil import round_away
    from .dedup import _splitmix64

    def add_part(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (
            _splitmix64(k.astype(np.uint64)) % np.uint64(num_partitions)
        ).astype(np.int32)
        return t.append_column("__part", pa.array(part, pa.int32()))

    def twap_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                key_col: pd.Series(dtype=np.int64),
                "twap": pd.Series(dtype=np.float64),
            }
        )
        if len(g) == 0:
            return empty
        keys = g[key_col].to_numpy()
        ids = g[id_col].to_numpy()
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        vals = g[val_col].to_numpy(dtype=np.float64)
        order = np.lexsort((ids, us, keys))
        k, e, v = keys[order], us[order], vals[order]
        same = k[:-1] == k[1:]  # rows 0..n-2 whose successor shares the key
        if not same.any():
            return empty
        sel = np.flatnonzero(same)
        dt = (e[sel + 1] - e[sel]).astype(np.float64)
        codes, uk = pd.factorize(k[sel], sort=False)
        num = np.bincount(codes, weights=v[sel] * dt)
        den = np.bincount(codes, weights=dt)
        return pd.DataFrame(
            {
                key_col: uk,
                "twap": round_away(num / den, 6),
            }
        )

    return (
        events.select_columns([id_col, key_col, ts_col, val_col])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(twap_partition, batch_format="pandas")
    )


def rolling_window_mean(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
    frame_rows: int = 4,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Per-key rolling mean over the last ``frame_rows`` events (current
    row inclusive) — the bounded ROWS frame ``avg(v) OVER (PARTITION BY
    key ORDER BY ts, id ROWS BETWEEN frame_rows-1 PRECEDING AND CURRENT
    ROW)``, which Ray Data has no native operator for. Complements
    ``running_aggregate`` (UNBOUNDED PRECEDING) with the moving-average
    shape every metrics pipeline needs. ``id_col`` must be unique per key
    so the order is deterministic and partitioning-invariant.

    Output: (id_col, key_col, rolling_avg float64 rounded 6).

    Scale shape: ONE key-hash shuffle (a key never spans two partitions,
    so no frame ever crosses workers), then each partition orders all its
    keys with ONE lexsort and computes every frame sum from a single
    global cumulative sum (window start clamped to the key's first row).
    Sums run in int64 fixed-point (values are 2-decimal; float cumsum
    differences would drift with partition length), so the frame sum is
    EXACT and the only float op is the final division — byte-stable
    across repartitioning. Hot keys are bounded by one key's event
    volume, same caveat as ``sessionize``.
    """
    from .arrowutil import round_away

    def add_part(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (
            _splitmix64(k.astype(np.uint64)) % np.uint64(num_partitions)
        ).astype(np.int32)
        return t.append_column("__part", pa.array(part, pa.int32()))

    def roll_partition(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype=np.int64),
                    key_col: pd.Series(dtype=np.int64),
                    "rolling_avg": pd.Series(dtype=np.float64),
                }
            )
        keys = g[key_col].to_numpy()
        ids = g[id_col].to_numpy()
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = g[val_col].to_numpy(dtype=np.float64)
        cents = np.round(v * 100.0).astype(np.int64)
        order = np.lexsort((ids, us, keys))
        k, i, c = keys[order], ids[order], cents[order]
        first = np.concatenate(([True], k[1:] != k[:-1]))
        starts = np.flatnonzero(first)
        grp = np.cumsum(first) - 1
        pos = np.arange(len(k))
        win_start = np.maximum(starts[grp], pos - (frame_rows - 1))
        cs = np.concatenate(([0], np.cumsum(c)))
        frame_sum = cs[pos + 1] - cs[win_start]
        cnt = pos - win_start + 1
        avg = frame_sum / 100.0 / cnt
        return pd.DataFrame(
            {
                id_col: i,
                key_col: k,
                "rolling_avg": round_away(avg, 6),
            }
        )

    return (
        events.select_columns([id_col, key_col, ts_col, val_col])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(roll_partition, batch_format="pandas")
    )


def weekly_change(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Week-over-week change: per key, the ISO-week (Monday-anchored,
    matching ``date_trunc('week', ts)``) revenue total and its relative
    change vs the key's PREVIOUS week present in the data (LAG over
    existing weeks, not calendar-adjacent ones). First week per key is
    omitted (no prior). The metrics-dashboard staple.

    Output: (key_col, wk_s int64 epoch-seconds of week start, total
    float64, pct_change float64 rounded 6).

    Scale shape: per-batch (key, week, cents) combiner partials — the
    raw event stream collapses to at most keys x weeks rows per batch
    BEFORE any exchange — then ONE key-hash shuffle of partials, and
    each partition folds with a single lexsort + reduceat and takes the
    shifted ratio. Sums are exact int64 fixed-point cents; the only
    float ops are the final /100 and the change ratio, mirroring a
    DECIMAL-exact SQL oracle.
    """
    from .arrowutil import round_away

    US_PER_DAY = 86400 * 10**6

    def partials(t: pa.Table) -> pa.Table:
        us = (
            t[ts_col]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        day = us // US_PER_DAY
        # 1970-01-01 was a Thursday; Monday-anchored truncation
        week_day = day - (day + 3) % 7
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.round(
            t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
            * 100.0
        ).astype(np.int64)
        ck, uk = pd.factorize(keys)
        cw, uw = pd.factorize(week_day)
        code = ck.astype(np.int64) * len(uw) + cw
        order = np.argsort(code, kind="stable")
        sc = code[order]
        first = np.concatenate(([True], sc[1:] != sc[:-1]))
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(cents[order], starts)
        kk = uk[sc[starts] // len(uw)]
        ww = uw[sc[starts] % len(uw)]
        part = (
            _splitmix64(kk.astype(np.uint64)) % np.uint64(num_partitions)
        ).astype(np.int32)
        return pa.table(
            {
                key_col: pa.array(kk, pa.int64()),
                "__wk": pa.array(ww, pa.int64()),
                "__cents": pa.array(sums, pa.int64()),
                "__part": pa.array(part, pa.int32()),
            }
        )

    def change_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                key_col: pd.Series(dtype=np.int64),
                "wk_s": pd.Series(dtype=np.int64),
                "total": pd.Series(dtype=np.float64),
                "pct_change": pd.Series(dtype=np.float64),
            }
        )
        if len(g) == 0:
            return empty
        k = g[key_col].to_numpy()
        w = g["__wk"].to_numpy()
        c = g["__cents"].to_numpy()
        order = np.lexsort((w, k))
        k, w, c = k[order], w[order], c[order]
        # fold cross-batch partials of the same (key, week)
        first = np.concatenate(([True], (k[1:] != k[:-1]) | (w[1:] != w[:-1])))
        starts = np.flatnonzero(first)
        c = np.add.reduceat(c, starts)
        k, w = k[starts], w[starts]
        prev_same = np.concatenate(([False], k[1:] == k[:-1]))
        if not prev_same.any():
            return empty
        cur = np.flatnonzero(prev_same)
        rv = c[cur] / 100.0
        pv = c[cur - 1] / 100.0
        return pd.DataFrame(
            {
                key_col: k[cur],
                "wk_s": w[cur] * 86400,
                "total": rv,
                "pct_change": round_away((rv - pv) / pv, 6),
            }
        )

    return (
        events.select_columns([key_col, ts_col, val_col])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(change_partition, batch_format="pandas")
    )


def nearest_event_gap(
    events: "ray.data.Dataset",
    anchor_type: str = "purchase",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """For every non-anchor event, the absolute time gap (microseconds)
    to the key's NEAREST anchor event in either direction — the
    nearest-timestamp join (as-of without the one-sidedness), e.g. "how
    far is each click from the closest purchase". Keys with no anchor
    event are omitted.

    Output: (id_col, gap_us int64) — exact integers, no rounding.

    Scale shape: ONE key-hash shuffle (anchors and probes co-partition;
    a key never spans workers), then per partition: one lexsort of the
    key's anchor times, one ``np.searchsorted`` of every probe into its
    key's anchor segment (segment offsets, not per-key loops), and the
    min of the left/right neighbor gaps. No pair explosion — the SQL
    formulation is an O(probes x anchors) join per key; this is
    O((probes + anchors) log anchors).
    """

    def add_part(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (
            _splitmix64(k.astype(np.uint64)) % np.uint64(num_partitions)
        ).astype(np.int32)
        return t.append_column("__part", pa.array(part, pa.int32()))

    def gaps_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                id_col: pd.Series(dtype=np.int64),
                "gap_us": pd.Series(dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        keys = g[key_col].to_numpy()
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        is_anchor = (g[type_col] == anchor_type).to_numpy()
        ids = g[id_col].to_numpy()
        # anchor side, sorted by (key, ts)
        ak, at = keys[is_anchor], us[is_anchor]
        aorder = np.lexsort((at, ak))
        ak, at = ak[aorder], at[aorder]
        if len(ak) == 0:
            return empty
        # probe side restricted to keys that have anchors
        auk = ak[np.concatenate(([True], ak[1:] != ak[:-1]))]
        astarts = np.flatnonzero(
            np.concatenate(([True], ak[1:] != ak[:-1]))
        )
        acounts = np.diff(np.append(astarts, len(ak)))
        probe = ~is_anchor
        pk, pt, pid = keys[probe], us[probe], ids[probe]
        seg = np.searchsorted(auk, pk)
        has = (seg < len(auk)) & (auk[np.minimum(seg, len(auk) - 1)] == pk)
        pk, pt, pid, seg = pk[has], pt[has], pid[has], seg[has]
        if len(pk) == 0:
            return empty
        lo = astarts[seg]
        hi = lo + acounts[seg]
        # segment-offset searchsorted (same trick as followup_counts):
        # offset each key's times onto a jointly monotonic axis so ONE
        # global searchsorted lands every probe inside its own segment
        tmin = int(us.min())
        stride = np.int64(int(us.max()) - tmin + 2)
        assert len(auk) * int(stride) < 2**63, (
            "segment-offset key would overflow int64; repartition finer"
        )
        aseg = np.repeat(np.arange(len(auk), dtype=np.int64), acounts)
        flat_a = aseg * stride + (at - tmin)
        flat_p = seg.astype(np.int64) * stride + (pt - tmin)
        pos = np.searchsorted(flat_a, flat_p, side="left")
        big = np.int64(2**62)
        right = np.where(pos < hi, at[np.minimum(pos, len(at) - 1)] - pt, big)
        left = np.where(pos > lo, pt - at[np.maximum(pos - 1, 0)], big)
        gap = np.minimum(left, right)
        return pd.DataFrame({id_col: pid, "gap_us": gap.astype(np.int64)})

    return (
        events.select_columns([id_col, key_col, ts_col, type_col])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(gaps_partition, batch_format="pandas")
    )


def longest_streak(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Longest run of consecutive active days per key (gaps-and-islands).

    Scale shape: per-batch partials emit only the DISTINCT (key, day)
    pairs a batch contains (the combiner — repeat activity inside a
    batch never shuffles), then ONE key-hash shuffle co-locates each
    key's days and a single vectorized pass per partition finishes:
    lexsort, cross-batch dedupe, island breaks where the day gap != 1,
    ``reduceat`` island lengths, per-key max. No pair explosion, no
    global sort; output is one tiny row per key. Equivalent to the SQL
    row_number() gaps-and-islands trick without the window shuffle.
    """

    def partials(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (
            t[ts_col]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        order = np.lexsort((day, k))
        k, day = k[order], day[order]
        keep = np.concatenate(
            ([True], (k[1:] != k[:-1]) | (day[1:] != day[:-1]))
        )
        k, day = k[keep], day[keep]
        part = (k.astype(np.uint64) % np.uint64(num_partitions)).astype(
            np.int32
        )
        return pa.table(
            {
                key_col: pa.array(k, pa.int64()),
                "day": pa.array(day, pa.int64()),
                "__part": pa.array(part, pa.int32()),
            }
        )

    def streaks_partition(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    key_col: pd.Series(dtype=np.int64),
                    "max_streak": pd.Series(dtype=np.int64),
                }
            )
        k = g[key_col].to_numpy()
        day = g["day"].to_numpy()
        order = np.lexsort((day, k))
        k, day = k[order], day[order]
        # cross-batch dedupe: the same (key, day) can arrive from many
        # batch-level partials
        keep = np.concatenate(
            ([True], (k[1:] != k[:-1]) | (day[1:] != day[:-1]))
        )
        k, day = k[keep], day[keep]
        new_island = np.concatenate(
            ([True], (k[1:] != k[:-1]) | (day[1:] != day[:-1] + 1))
        )
        starts = np.flatnonzero(new_island)
        lengths = np.diff(np.append(starts, len(k)))
        ikey = k[starts]
        kfirst = np.concatenate(([True], ikey[1:] != ikey[:-1]))
        kstarts = np.flatnonzero(kfirst)
        return pd.DataFrame(
            {
                key_col: ikey[kstarts],
                "max_streak": np.maximum.reduceat(lengths, kstarts).astype(
                    np.int64
                ),
            }
        )

    return (
        events.select_columns([key_col, ts_col])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(streaks_partition, batch_format="pandas")
    )


def decayed_sum(
    events: "ray.data.Dataset",
    key_col: str,
    ts_col: str,
    val_col: str,
    half_life_s: float,
) -> "ray.data.Dataset":
    """Per-key exponentially time-decayed sum anchored at the corpus's
    newest event: ``sum(v * exp((epoch(ts) - T_max) * ln(2) / half_life))``
    — the standard recency-weighted engagement / freshness score.

    Semantics are FIXED-POINT: each term is rounded half-away to 6
    decimals (x1e6 int64) before summing, so the fold is exact integer
    addition — no float addition-order dependence across partitions (the
    same determinism trick as the money-column aggregates; see the
    market_share note in BASELINE.md). The SQL oracle applies the
    identical per-term quantization.

    Scale shape: two streaming passes. Pass 1 is a tiny global
    ``max(epoch)`` aggregate (one scalar leaves the cluster). Pass 2 is
    the usual combiner regime — per-batch per-key int64 term sums
    (bincount over key codes), one small groupby fold over O(keys)
    partials, finalize divides by 1e6. Raw rows never shuffle; anchoring
    at T_max keeps every exponent ≤ 0, so no overflow at any corpus age.
    """
    import pandas as pd

    from ray.data.aggregate import Max, Sum

    from .arrowutil import round_away

    decay = float(np.log(2.0) / half_life_s)

    def to_epoch(t: pa.Table) -> pa.Table:
        e = (
            t[ts_col]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[s]")
            .astype(np.int64)
        )
        return pa.table(
            {
                key_col: t[key_col],
                "__epoch": pa.array(e, pa.int64()),
                val_col: t[val_col],
            }
        )

    epochs = events.select_columns([key_col, ts_col, val_col]).map_batches(
        to_epoch, batch_format="pyarrow"
    )
    tmax = int(
        epochs.aggregate(Max("__epoch", alias_name="m"))["m"]
    )  # pass 1: one scalar

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys = df[key_col].to_numpy()
        v = df[val_col].to_numpy(dtype=np.float64)
        d = (df["__epoch"].to_numpy() - tmax).astype(np.float64) * decay
        # mirror the oracle's expression order exactly:
        # round(v * exp(d) * 1e6, 0) half-away, summed as int64
        terms = round_away(v * np.exp(d) * 1e6, 0).astype(np.int64)
        uk, inv = np.unique(keys, return_inverse=True)
        s = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, inv, terms)
        return pd.DataFrame({key_col: uk, "__s": s})

    folded = (
        epochs.map_batches(partial, batch_format="pandas")
        .groupby(key_col)
        .aggregate(Sum("__s", alias_name="__s"))
        .to_pandas()  # O(distinct keys)
    )
    folded["decayed"] = folded["__s"].to_numpy(np.float64) / 1e6
    return (
        folded[[key_col, "decayed"]]
        .sort_values(key_col, ignore_index=True)
    )


def first_last(
    events: "ray.data.Dataset",
    key_col: str,
    ts_col: str,
    tie_col: str,
    val_cols: "list[str]",
) -> "ray.data.Dataset":
    """Per-key FIRST_VALUE / LAST_VALUE row snapshot: for each key, the
    ``val_cols`` payload of the earliest and latest row ordered by
    (``ts_col``, ``tie_col``) — the first/last-touch attribution shape
    (``row_number() OVER (... ORDER BY ts, tie)`` = 1 both directions).
    ``tie_col`` must be unique per key for deterministic output.
    Timestamps come back as int64 epoch seconds (``first_epoch`` /
    ``last_epoch``).

    Scale shape: picking an extreme row is an associative fold, so each
    batch emits at most TWO rows per key seen (one vectorized sort +
    duplicated-mask, no per-group loop), one key-hash groupby folds the
    O(keys x blocks) partials with the identical pick, and the final
    table is one row per key. Raw rows never shuffle.
    """
    import pandas as pd

    cols = [key_col, ts_col, tie_col, *val_cols]

    def to_epoch(t: pa.Table) -> pa.Table:
        e = (
            t[ts_col]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[s]")
            .astype(np.int64)
        )
        out = {key_col: t[key_col], "__epoch": pa.array(e, pa.int64()),
               tie_col: t[tie_col]}
        for c in val_cols:
            out[c] = t[c]
        return pa.table(out)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        df = df.sort_values([key_col, "__epoch", tie_col], kind="mergesort")
        first = ~df[key_col].duplicated(keep="first")
        last = ~df[key_col].duplicated(keep="last")
        return df[first | last]

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, "__epoch", tie_col], kind="mergesort")
        f = df[~df[key_col].duplicated(keep="first")].reset_index(drop=True)
        l = df[~df[key_col].duplicated(keep="last")].reset_index(drop=True)
        out = {key_col: f[key_col],
               "first_epoch": f["__epoch"].astype(np.int64),
               "last_epoch": l["__epoch"].astype(np.int64)}
        for c in val_cols:
            out[f"first_{c}"] = f[c].to_numpy()
            out[f"last_{c}"] = l[c].to_numpy()
        return pd.DataFrame(out)

    return (
        events.select_columns(cols)
        .map_batches(to_epoch, batch_format="pyarrow")
        .map_batches(pick, batch_format="pandas")
        .groupby(key_col)
        .map_groups(finalize, batch_format="pandas")
    )


def sliding_distinct(
    events: "ray.data.Dataset",
    ts_col: str,
    id_col: str,
    window_s: int,
    slide_s: int,
) -> "ray.data.Dataset":
    """Distinct-entity count per sliding window (rolling active users):
    each event lands in ``window_s / slide_s`` windows; the count is of
    DISTINCT ``id_col`` values per window.

    Scale shape: the combiner explodes each batch to its (window, id)
    pairs and dedupes them IN-BATCH (one sort-unique), one groupby fold
    over the distinct pairs finishes the global dedupe — this is the
    one unavoidable shuffle and it carries two int64 columns — then a
    second combiner pass bincounts pairs per window and a tiny groupby
    folds O(windows) partials. No window ever materializes its id set.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    fanout = int(np.ceil(window_s / slide_s))

    def explode(t: pa.Table) -> pa.Table:
        e = (
            t[ts_col]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[s]")
            .astype(np.int64)
        )
        ids = t[id_col].to_numpy(zero_copy_only=False)
        base = (e // slide_s) * slide_s
        starts = base[:, None] - np.arange(fanout) * slide_s
        keep = (e[:, None] - starts) < window_s
        ws = starts[keep]
        wi = np.broadcast_to(ids[:, None], starts.shape)[keep]
        pairs = np.stack((ws, wi), axis=1)
        pairs = np.unique(pairs, axis=0)  # in-batch dedupe (combiner)
        return pa.table(
            {
                "window_start": pa.array(pairs[:, 0], pa.int64()),
                id_col: pa.array(pairs[:, 1], pa.int64()),
            }
        )

    from ray.data.aggregate import Count

    distinct_pairs = (
        events.select_columns([ts_col, id_col])
        .map_batches(explode, batch_format="pyarrow")
        .groupby(["window_start", id_col])
        .aggregate(Count())
    )

    def count_partial(t: pa.Table) -> pa.Table:
        ws = t["window_start"].to_numpy(zero_copy_only=False)
        uw, counts = np.unique(ws, return_counts=True)
        return pa.table(
            {
                "window_start": pa.array(uw, pa.int64()),
                "c": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    out = (
        distinct_pairs.select_columns(["window_start"])
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Sum("c", alias_name="distinct_ids"))
        .to_pandas()  # O(windows)
    )
    out["distinct_ids"] = out["distinct_ids"].astype(np.int64)
    return out.sort_values("window_start", ignore_index=True)


def adoption_curve(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    granularity_s: int = 86400,
    num_partitions: int = 64,
) -> pd.DataFrame:
    """Daily new-key counts plus the cumulative adoption curve —
    first-touch attribution: every key counts exactly once, on its first
    active day (SQL: min(day) per key, then count per day + running sum).

    Output: (bucket_s int64 epoch-seconds of bucket start, new_keys int64,
    cum_keys int64), ordered by day.

    Scale shape: per-batch (key, min_day) combiner partials — the raw
    stream collapses to distinct-keys rows per batch — then ONE key-hash
    shuffle of partials; each partition folds its keys' global min with
    one ``np.minimum`` reduceat pass and emits per-day partial counts
    (at most O(distinct days) rows per partition). The day-level fold +
    prefix sum runs on the driver over O(distinct days) rows — day
    cardinality is calendar-bounded (a decade is ~3.7k rows), never the
    scale problem.
    """
    from .dedup import _splitmix64

    us_per_bucket = granularity_s * 10**6

    def partials(t: pa.Table) -> pa.Table:
        us = (
            t[ts_col]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        day = us // us_per_bucket
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uk, inv = np.unique(keys, return_inverse=True)
        mins = np.full(len(uk), np.iinfo(np.int64).max)
        np.minimum.at(mins, inv, day)
        part = (
            _splitmix64(uk.astype(np.uint64)) % np.uint64(num_partitions)
        ).astype(np.int32)
        return pa.table(
            {
                key_col: pa.array(uk, pa.int64()),
                "__day": pa.array(mins, pa.int64()),
                "__part": pa.array(part, pa.int32()),
            }
        )

    def day_counts(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "__day": pd.Series(dtype=np.int64),
                    "cnt": pd.Series(dtype=np.int64),
                }
            )
        k = g[key_col].to_numpy()
        d = g["__day"].to_numpy()
        uk, inv = np.unique(k, return_inverse=True)
        mins = np.full(len(uk), np.iinfo(np.int64).max)
        np.minimum.at(mins, inv, d)  # global min: key never spans parts
        ud, cnt = np.unique(mins, return_counts=True)
        return pd.DataFrame(
            {"__day": ud, "cnt": cnt.astype(np.int64)}
        )

    parts = (
        events.select_columns([key_col, ts_col])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(day_counts, batch_format="pandas")
        .to_pandas()  # O(partitions x distinct days) — tiny
    )
    folded = parts.groupby("__day", as_index=False)["cnt"].sum()
    folded = folded.sort_values("__day", ignore_index=True)
    new = folded["cnt"].to_numpy(dtype=np.int64)
    return pd.DataFrame(
        {
            "bucket_s": folded["__day"].to_numpy() * granularity_s,
            "new_keys": new,
            "cum_keys": np.cumsum(new),
        }
    )


def activity_heatmap(
    events: "ray.data.Dataset",
    ts_col: str = "ts",
    val_col: str = "value",
) -> pd.DataFrame:
    """Day-of-week x hour-of-day activity profile — the calendar heatmap
    behind load forecasting and anomaly baselines. ``dow`` follows SQL's
    ``dayofweek`` (0 = Sunday).

    Output: (dow int64, hour int64, n int64, total float64) for every
    populated cell, ordered by (dow, hour).

    Scale shape: each batch collapses to at most 168 cell partials via
    one ``bincount`` on the packed cell index (7x24 cells — the pack can
    never overflow), then one tiny cell-keyed fold; exact int64
    fixed-point cents for the value sum. Nothing but O(168) rows ever
    shuffles.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pd.DataFrame:
        us = (
            t[ts_col]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        day = us // (86400 * 10**6)
        dow = (day + 4) % 7  # 1970-01-01 is a Thursday; 0 = Sunday
        hour = (us // (3600 * 10**6)) % 24
        cell = (dow * 24 + hour).astype(np.int64)
        cents = np.round(
            t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
            * 100.0
        ).astype(np.int64)
        n = np.bincount(cell, minlength=168).astype(np.int64)
        s = int_bincount(cell, cents, 168)  # exact over full int64
        keep = n > 0
        return pd.DataFrame(
            {
                "cell": np.arange(168, dtype=np.int64)[keep],
                "n": n[keep],
                "cents": s[keep],
            }
        )

    folded = (
        events.select_columns([ts_col, val_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(
            Sum("n", alias_name="n"), Sum("cents", alias_name="cents")
        )
        .to_pandas()  # <= 168 rows
    ).sort_values("cell", ignore_index=True)
    cell = folded["cell"].to_numpy()
    return pd.DataFrame(
        {
            "dow": cell // 24,
            "hour": cell % 24,
            "n": folded["n"].astype(np.int64),
            "total": folded["cents"].to_numpy() / 100.0,
        }
    )


def interarrival_stats(
    ds: "ray.data.Dataset",
    key_col: str,
    ts_col: str,
    tie_col: str,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Per-key inter-arrival gap profile — count / mean / min / max of
    the time between CONSECUTIVE events (SQL ``lag`` diff), the purchase
    -cadence / churn-signal pass. Keys with a single event are omitted.

    Output: (key_col, n_gaps int64, avg_gap_s float64 rounded 6,
    min_gap_us int64, max_gap_us int64).

    Scale shape: ONE key-hash shuffle of 3-column rows (a key never
    spans partitions, so consecutive-gap state never crosses workers),
    then per partition a single lexsort over (key, ts, tie), one diff,
    and per-key reduceat folds. Gaps sum exactly in int64 microseconds;
    the only float op is the final mean division.
    """
    from .dedup import _splitmix64

    def add_part(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (
            _splitmix64(k.astype(np.uint64)) % np.uint64(num_partitions)
        ).astype(np.int32)
        return t.append_column("__part", pa.array(part, pa.int32()))

    def gaps_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                key_col: pd.Series(dtype=np.int64),
                "n_gaps": pd.Series(dtype=np.int64),
                "avg_gap_s": pd.Series(dtype=np.float64),
                "min_gap_us": pd.Series(dtype=np.int64),
                "max_gap_us": pd.Series(dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        from .arrowutil import round_away

        k = g[key_col].to_numpy()
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        tie = g[tie_col].to_numpy()
        order = np.lexsort((tie, us, k))
        k, us = k[order], us[order]
        same = k[1:] == k[:-1]
        if not same.any():
            return empty
        gap = (us[1:] - us[:-1])[same]
        gk = k[1:][same]
        first = np.concatenate(([True], gk[1:] != gk[:-1]))
        starts = np.flatnonzero(first)
        n = np.diff(np.append(starts, len(gk)))
        tot = np.add.reduceat(gap, starts)
        mn = np.minimum.reduceat(gap, starts)
        mx = np.maximum.reduceat(gap, starts)
        return pd.DataFrame(
            {
                key_col: gk[starts],
                "n_gaps": n.astype(np.int64),
                "avg_gap_s": round_away(tot / (n * 1_000_000.0), 6),
                "min_gap_us": mn,
                "max_gap_us": mx,
            }
        )

    return (
        ds.select_columns([key_col, ts_col, tie_col])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(gaps_partition, batch_format="pandas")
    )


def state_intervals(
    events: "ray.data.Dataset",
    key_col: str,
    ts_col: str,
    tie_col: str,
    state_col: str,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """SCD-2-style state history: collapse each key's (ts, tie)-ordered
    event stream into maximal runs of equal ``state_col`` ->
    (key, state, start_epoch, end_epoch, n_events) — the
    gaps-and-islands interval construction (SQL ``rn - rn_per_state``
    trick) without a window-function sort.

    Scale shape: ONE key-hash shuffle of 4 slim columns co-locates each
    key; a single mergesort + change-mask + ``reduceat`` per partition
    emits every interval. No window frames, no driver state; output is
    O(state changes)."""
    import pandas as pd

    def keyed(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = (
            t[ts_col]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[s]")
            .astype(np.int64)
        )
        return pa.table(
            {
                "k": pa.array(k),
                "e": pa.array(e, pa.int64()),
                "tie": pc.cast(t[tie_col], pa.int64()),
                "s": t[state_col],
                "__part": pa.array(
                    (k & (num_partitions - 1)).astype(np.int32), pa.int32()
                ),
            }
        )

    def intervals(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                key_col: pd.Series(dtype=np.int64),
                state_col: pd.Series(dtype=object),
                "start_epoch": pd.Series(dtype=np.int64),
                "end_epoch": pd.Series(dtype=np.int64),
                "n_events": pd.Series(dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["k", "e", "tie"], kind="mergesort")
        k = g["k"].to_numpy()
        e = g["e"].to_numpy()
        s = g["s"].to_numpy(dtype=object)
        brk = np.concatenate(
            ([True], (k[1:] != k[:-1]) | (s[1:] != s[:-1]))
        )
        starts = np.flatnonzero(brk)
        n = np.diff(np.append(starts, len(k))).astype(np.int64)
        ends = np.append(starts[1:], len(k)) - 1
        return pd.DataFrame(
            {
                key_col: k[starts],
                state_col: s[starts],
                "start_epoch": e[starts],
                "end_epoch": e[ends],
                "n_events": n,
            }
        )

    return (
        events.select_columns([key_col, ts_col, tie_col, state_col])
        .map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(intervals, batch_format="pandas")
    )


def peak_concurrency(
    sessions: "ray.data.Dataset",
    start_col: str = "session_start",
    end_col: str = "session_end",
    bucket_s: int = 3600,
) -> pd.DataFrame:
    """Max concurrent sessions per time bucket — the distributed
    sweep-line. A session [start, end] (inclusive epochs) contributes
    +1 at ``start`` and -1 at ``end + 1``; at equal timestamps the
    -1s apply first, and every local maximum therefore lands on a
    +1 application, so per-bucket maxima over +1 points equal the SQL
    running-sum-over-(t, d) definition row for row.

    Scale shape: a per-batch combiner collapses boundaries to one
    (bucket, t, Σ-1, Σ+1) row per distinct timestamp; ONE bucket-hash
    shuffle; each bucket resolves its relative prefix maxima with a
    sort + cumsum; the driver folds only O(buckets) (calendar-bounded)
    rows into global offsets — the two-phase distributed prefix sum.
    Raw sessions never re-shuffle."""

    def boundaries(t: pa.Table) -> pa.Table:
        s = t[start_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = t[end_col].to_numpy(zero_copy_only=False).astype(np.int64) + 1
        ts = np.concatenate([s, e])
        d = np.concatenate(
            [np.ones(len(s), np.int64), -np.ones(len(e), np.int64)]
        )
        order = np.argsort(ts, kind="stable")
        ts, d = ts[order], d[order]
        starts = np.flatnonzero(
            np.concatenate(([True], ts[1:] != ts[:-1]))
        )
        dneg = np.add.reduceat(np.minimum(d, 0), starts)
        dpos = np.add.reduceat(np.maximum(d, 0), starts)
        tu = ts[starts]
        return pa.table(
            {
                "b": pa.array(tu // bucket_s, pa.int64()),
                "t": pa.array(tu, pa.int64()),
                "dneg": pa.array(dneg, pa.int64()),
                "dpos": pa.array(dpos, pa.int64()),
            }
        )

    def add_part(t: pa.Table) -> pa.Table:
        part = pc.cast(
            pc.bit_wise_and(t["b"], pa.scalar(63, pa.int64())), pa.int32()
        )
        return t.append_column("__part", part)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "b": pd.Series(dtype=np.int64),
                "total": pd.Series(dtype=np.int64),
                "rel_max": pd.Series(dtype=np.int64),
                "has_pos": pd.Series(dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = (
            g.groupby(["b", "t"], sort=True)[["dneg", "dpos"]]
            .sum()
            .reset_index()
        )
        out = []
        for b, gb in g.groupby("b", sort=True):
            prefix = (gb["dneg"] + gb["dpos"]).cumsum().to_numpy()
            pos = gb["dpos"].to_numpy() > 0
            rel_max = int(prefix[pos].max()) if pos.any() else 0
            out.append(
                (int(b), int(prefix[-1]), rel_max, int(pos.any()))
            )
        return pd.DataFrame(
            out, columns=["b", "total", "rel_max", "has_pos"]
        )

    folded = (
        sessions.map_batches(boundaries, batch_format="pyarrow",
                             zero_copy_batch=True)
        .map_batches(add_part, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("__part")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    # driver fold: O(buckets) rows, calendar-bounded
    folded = (
        folded.groupby("b", sort=True)
        .agg(total=("total", "sum"), rel_max=("rel_max", "max"),
             has_pos=("has_pos", "max"))
        .reset_index()
    )
    # NOTE: rel_max above is only valid when one partition owns each
    # bucket (guaranteed: __part is a function of b), so the groupby
    # here folds exactly one row per bucket.
    offsets = np.concatenate(
        ([0], folded["total"].cumsum().to_numpy()[:-1])
    )
    keep = folded["has_pos"].to_numpy() > 0
    return pd.DataFrame(
        {
            "hour": folded["b"].to_numpy()[keep],
            "max_cc": (offsets + folded["rel_max"].to_numpy())[keep],
        }
    ).reset_index(drop=True)

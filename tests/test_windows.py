"""Windowed-aggregate operator tests over a synthetic event log."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from kiezray.windows import sessionize, sliding_window, tumbling_window


@pytest.fixture(scope="module")
def events():
    rng = np.random.RandomState(4)
    n = 3000
    ts = np.sort(rng.randint(0, 86400 * 3, n)).astype("datetime64[s]")
    return ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(
                    rng.randint(0, 20, n).astype(np.int64)
                ),
                "ts": pa.array(ts),
                "value": pa.array(rng.rand(n)),
            }
        )
    ).repartition(4)


def test_tumbling_totals(events):
    out = tumbling_window(events, window_s=3600).to_pandas()
    assert out["n_events"].sum() == 3000
    # window starts aligned
    assert (out["window_start"] % 3600 == 0).all()
    # per-user totals preserved
    per_user = out.groupby("user_id")["n_events"].sum()
    raw = events.to_pandas().groupby("user_id").size()
    pd.testing.assert_series_equal(
        per_user.sort_index(), raw.sort_index(), check_names=False
    )


def test_sliding_covers_tumbling(events):
    slid = sliding_window(events, window_s=3600, slide_s=900).to_pandas()
    # every event lands in exactly window/slide = 4 windows
    assert slid["n_events"].sum() == 3000 * 4
    assert (slid["window_start"] % 900 == 0).all()
    # the slide-aligned window equal to a tumbling window matches it
    tum = tumbling_window(events, window_s=3600).to_pandas()
    merged = tum.merge(
        slid, on=["user_id", "window_start"], suffixes=("_t", "_s")
    )
    assert (merged["n_events_t"] == merged["n_events_s"]).all()


def test_sessionize_gaps(events):
    gap = 1800
    out = sessionize(events, gap_s=gap).to_pandas()
    raw = events.to_pandas()
    raw["es"] = raw["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
    assert out["n_events"].sum() == 3000
    # session bounds: within a user, sessions are disjoint and ordered with
    # gaps > gap_s between consecutive sessions
    for uid, g in out.groupby("user_id"):
        g = g.sort_values("session_start")
        assert (g["session_end"] >= g["session_start"]).all()
        gaps = g["session_start"].to_numpy()[1:] - g["session_end"].to_numpy()[:-1]
        assert (gaps > gap).all()


def test_running_aggregate_matches_pandas(ray_session):
    from kiezray.windows import running_aggregate

    rng = np.random.RandomState(9)
    n = 4000
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 25, n).astype(np.int64),
            "o": rng.randint(0, 1000, n).astype(np.int64),
            "tid": np.arange(n, dtype=np.int64),
            "v": rng.randint(-50, 50, n).astype(np.int64),
        }
    )
    got = (
        running_aggregate(
            ray.data.from_pandas(df).repartition(5), "k", "o", "tid", "v"
        )
        .to_pandas()
        .sort_values(["k", "o", "tid"])
        .reset_index(drop=True)
    )
    want = df.sort_values(["k", "o", "tid"]).reset_index(drop=True)
    want["running_cnt"] = want.groupby("k").cumcount() + 1
    want["running_sum"] = want.groupby("k")["v"].cumsum()
    for c in ["k", "o", "tid", "v", "running_cnt", "running_sum"]:
        assert (got[c].values == want[c].values).all(), c

    # partitioning invariance: a different block layout, identical output
    again = (
        running_aggregate(
            ray.data.from_pandas(df.sample(frac=1, random_state=1)).repartition(9),
            "k", "o", "tid", "v",
        )
        .to_pandas()
        .sort_values(["k", "o", "tid"])
        .reset_index(drop=True)
    )
    assert (again["running_sum"].values == want["running_sum"].values).all()


def test_funnel_steps_strict_ordering(ray_session):
    """A step counts only strictly AFTER the user's previous step: user 1
    completes all three, user 2 has click BEFORE view (depth 1), user 3
    has simultaneous view+click timestamps (strict > blocks click)."""
    import numpy as np
    import pandas as pd
    import ray

    from kiezray.windows import funnel_steps

    t0 = np.datetime64("2025-01-01T00:00:00", "us")
    sec = np.timedelta64(1, "s")
    rows = [
        (1, t0 + 1 * sec, "view"), (1, t0 + 2 * sec, "click"),
        (1, t0 + 3 * sec, "purchase"),
        (2, t0 + 5 * sec, "click"), (2, t0 + 6 * sec, "view"),
        (3, t0 + 1 * sec, "view"), (3, t0 + 1 * sec, "click"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    out = funnel_steps(
        ray.data.from_pandas(df).repartition(3),
        "user_id", "ts", "event_type", ["view", "click", "purchase"],
    )
    assert list(out["users"]) == [3, 1, 1]


def test_event_transitions_matches_pandas(ray_session):
    """Transition counts equal a pandas LAG groupby, including big
    (> 2^23) user ids and tie timestamps broken by event_id; output is
    invariant to input partitioning."""
    import ray

    from kiezray.windows import event_transitions

    rng = np.random.default_rng(11)
    n = 4000
    users = rng.choice(
        np.array([3, 9_000_000_001, 2**40 + 7, 12, 99], dtype=np.int64), n
    )
    t0 = np.datetime64("2025-01-01T00:00:00", "us")
    ts = t0 + rng.integers(0, 500, n).astype("timedelta64[s]")
    types = rng.choice(np.array(["a", "b", "c"], dtype=object), n)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": users,
            "ts": ts,
            "event_type": types,
        }
    )
    want = (
        df.sort_values(["user_id", "ts", "event_id"])
        .assign(prev=lambda d: d.groupby("user_id")["event_type"].shift())
        .dropna(subset=["prev"])
        .groupby(["prev", "event_type"])
        .size()
        .rename("n")
        .reset_index()
        .rename(columns={"prev": "prev_type"})
        .sort_values(["prev_type", "event_type"])
        .reset_index(drop=True)
    )
    for parts in (1, 7):
        got = event_transitions(
            ray.data.from_pandas(df).repartition(parts),
            "user_id", "ts", "event_id", "event_type",
        )
        pd.testing.assert_frame_equal(
            got.astype({"n": np.int64}), want.astype({"n": np.int64})
        )


def test_cohort_retention_matches_pandas(ray_session):
    """Cohort cells equal a pandas first-week/distinct-week oracle with
    Monday-start weeks, including big user ids; a user active in its
    cohort week AND two weeks later lands in offsets 0 and 2 only."""
    import ray

    from kiezray.windows import cohort_retention

    rng = np.random.default_rng(5)
    n = 3000
    users = rng.choice(
        np.array([1, 2**33 + 5, 42, 2**24 + 1], dtype=np.int64), n
    )
    t0 = np.datetime64("2024-01-01T00:00:00", "us")  # a Monday
    ts = t0 + rng.integers(0, 45 * 86400, n).astype("timedelta64[s]")
    df = pd.DataFrame({"user_id": users, "ts": ts})

    days = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    days = days // 86_400_000_000
    week = days - ((days - 4) % 7)
    w = pd.DataFrame({"user_id": df["user_id"], "week": week})
    first = w.groupby("user_id")["week"].min().rename("cohort")
    act = w.drop_duplicates().join(first, on="user_id")
    act["week_offset"] = (act["week"] - act["cohort"]) // 7
    want = (
        act.groupby(["cohort", "week_offset"])
        .size()
        .rename("users")
        .reset_index()
        .rename(columns={"cohort": "cohort_day"})
        .sort_values(["cohort_day", "week_offset"])
        .reset_index(drop=True)
    )
    got = cohort_retention(
        ray.data.from_pandas(df).repartition(5), "user_id", "ts"
    )
    pd.testing.assert_frame_equal(
        got.astype({"users": np.int64}), want.astype({"users": np.int64})
    )
    # sanity: a user in its own cohort week is offset 0
    assert (got["week_offset"] >= 0).all()


def test_followup_counts_matches_bruteforce(ray_session):
    """Interval counts equal an O(n^2) pandas oracle, including strict
    same-timestamp exclusion, horizon-boundary inclusion, zero-followup
    anchors, and big user ids; invariant to input partitioning."""
    import ray

    from kiezray.windows import followup_counts

    rng = np.random.default_rng(9)
    n = 2500
    users = rng.choice(
        np.array([1, 2**34 + 3, 7, 8, 99], dtype=np.int64), n
    )
    t0 = np.datetime64("2025-01-01T00:00:00", "us")
    ts = t0 + rng.integers(0, 7200, n).astype("timedelta64[s]")
    types = rng.choice(np.array(["click", "purchase", "view"], dtype=object), n)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": users,
            "ts": ts,
            "event_type": types,
        }
    )
    H = np.timedelta64(900, "s")  # 15 min
    want = {}
    for _, a in df[df["event_type"] == "click"].iterrows():
        m = (
            (df["user_id"] == a["user_id"])
            & (df["event_type"] == "purchase")
            & (df["ts"] > a["ts"])
            & (df["ts"] <= a["ts"] + H)
        )
        want[int(a["event_id"])] = int(m.sum())
    for parts in (1, 6):
        got = (
            followup_counts(
                ray.data.from_pandas(df).repartition(parts),
                "user_id", "ts", "event_id", "event_type",
                type_a="click", type_b="purchase",
                horizon_us=900_000_000,
            )
            .to_pandas()
            .set_index("event_id")["n_follow"]
            .to_dict()
        )
        assert got == want


def test_time_weighted_avg_matches_pandas(ray_session):
    """TWAP equals a pandas lead-interval oracle, incl. big user ids,
    tie timestamps broken by event_id, and single-event users omitted."""
    import ray

    from kiezray.windows import time_weighted_avg

    rng = np.random.default_rng(17)
    n = 2000
    users = rng.choice(
        np.array([5, 2**35 + 1, 11, 999], dtype=np.int64), n
    )
    users[0] = 424242  # a single-event user -> no output row
    t0 = np.datetime64("2025-03-01T00:00:00", "us")
    ts = t0 + rng.integers(0, 10**6, n).astype("timedelta64[us]")
    vals = np.round(rng.random(n) * 50, 2)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": users,
            "ts": ts,
            "value": vals,
        }
    )
    d = df.sort_values(["user_id", "ts", "event_id"]).copy()
    es = d["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    d["es"] = es
    d["nxt"] = d.groupby("user_id")["es"].shift(-1)
    d = d[d["nxt"].notna()]
    dt = d["nxt"].to_numpy() - d["es"].to_numpy()
    d["num"] = d["value"].to_numpy() * dt
    d["den"] = dt
    want = (
        d.groupby("user_id")[["num", "den"]].sum()
        .assign(twap=lambda x: np.round(x["num"] / x["den"], 6))
        .reset_index()[["user_id", "twap"]]
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    got = (
        time_weighted_avg(
            ray.data.from_pandas(df).repartition(6),
            "user_id", "ts", "event_id", "value",
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert 424242 not in set(got["user_id"])
    pd.testing.assert_frame_equal(got, want, atol=1e-9, check_exact=False)


def test_rolling_window_mean_matches_pandas_large_keys():
    """ROWS-frame rolling mean matches a pandas oracle, with user ids
    above 2^23 (regression scope: no packed-key arithmetic anywhere)."""
    from kiezray.windows import rolling_window_mean

    rng = np.random.RandomState(11)
    n = 2000
    uid = (rng.randint(0, 7, n).astype(np.int64) * 2**40) + 5
    ts = rng.randint(0, 86400, n).astype("datetime64[s]")
    val = np.round(rng.rand(n) * 200, 2)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(uid),
            "ts": pa.array(ts),
            "value": pa.array(val),
        }
    )
    got = (
        rolling_window_mean(
            ray.data.from_arrow(t).repartition(5),
            "user_id", "ts", "event_id", "value", frame_rows=4,
        )
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    want = (
        df.groupby("user_id")["value"]
        .rolling(4, min_periods=1)
        .mean()
        .reset_index(level=0, drop=True)
    )
    df["rolling_avg"] = np.round(want, 6)
    df = df.sort_values("event_id", ignore_index=True)
    assert len(got) == n
    np.testing.assert_allclose(
        got["rolling_avg"].to_numpy(), df["rolling_avg"].to_numpy(),
        atol=1e-9,
    )


def test_weekly_change_monday_anchor_and_ratio():
    from kiezray.windows import weekly_change

    # 2024-01-01 is a Monday; plant two users across three weeks
    ts = np.array(
        [
            "2024-01-01T09:00", "2024-01-03T10:00",  # u1 week1: 10+20
            "2024-01-08T09:00",                      # u1 week2: 45
            "2024-01-21T23:59",                      # u1 week4 (sun): 9
            "2024-01-02T00:00", "2024-01-10T12:00",  # u2: 5 then 15
        ],
        dtype="datetime64[us]",
    )
    df = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 1, 1, 2, 2], dtype=np.int64),
            "ts": ts,
            "value": [10.0, 20.0, 45.0, 9.0, 5.0, 15.0],
        }
    )
    out = (
        weekly_change(ray.data.from_pandas(df).repartition(3))
        .to_pandas()
        .sort_values(["user_id", "wk_s"], ignore_index=True)
    )
    # u1: week2 vs week1 = (45-30)/30 = 0.5; week of Jan15 vs week2:
    # Jan21 is in the week STARTING Mon Jan 15 -> (9-45)/45 = -0.8
    # u2: (15-5)/5 = 2.0
    assert out["user_id"].tolist() == [1, 1, 2]
    assert out["pct_change"].tolist() == [0.5, -0.8, 2.0]
    # Monday-anchored starts: Jan 8 and Jan 15 and Jan 8
    import datetime as dt

    starts = [
        dt.datetime.utcfromtimestamp(s).strftime("%Y-%m-%d %a")
        for s in out["wk_s"]
    ]
    assert starts == [
        "2024-01-08 Mon", "2024-01-15 Mon", "2024-01-08 Mon"
    ]


def test_nearest_event_gap_bruteforce():
    from kiezray.windows import nearest_event_gap

    rng = np.random.RandomState(21)
    n = 1500
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, 25, n).astype(np.int64),
            "ts": rng.randint(0, 10**6, n).astype("datetime64[s]"),
            "event_type": rng.choice(
                ["view", "click", "purchase"], n, p=[0.5, 0.4, 0.1]
            ),
        }
    )
    got = (
        nearest_event_gap(ray.data.from_pandas(df).repartition(4))
        .to_pandas()
        .set_index("event_id")["gap_us"]
    )
    us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    want = {}
    for uid in df["user_id"].unique():
        m = df["user_id"].to_numpy() == uid
        pts = us[m & (df["event_type"] == "purchase").to_numpy()]
        if len(pts) == 0:
            continue
        for eid, t in zip(
            df["event_id"].to_numpy()[
                m & (df["event_type"] != "purchase").to_numpy()
            ],
            us[m & (df["event_type"] != "purchase").to_numpy()],
        ):
            want[eid] = int(np.abs(pts - t).min())
    assert len(got) == len(want)
    for eid, g in want.items():
        assert got[eid] == g


def test_longest_streak_bruteforce_and_large_keys():
    """Streaks match a per-user brute force, including user ids > 2^23
    (no packed-key arithmetic anywhere) and duplicate activity days."""
    from kiezray.windows import longest_streak

    rng = np.random.RandomState(11)
    n = 4000
    uid = rng.choice(
        np.array([3, 9_000_000, 2**40 + 5, 17], dtype=np.int64), n
    )
    day = rng.randint(0, 60, n).astype(np.int64)
    ts = (day * 86400 + rng.randint(0, 86400, n)).astype("datetime64[s]")
    ds = ray.data.from_arrow(
        pa.table({"user_id": pa.array(uid), "ts": pa.array(ts)})
    ).repartition(7)
    got = (
        longest_streak(ds, "user_id", "ts")
        .to_pandas()
        .set_index("user_id")["max_streak"]
        .sort_index()
    )
    want = {}
    for u in np.unique(uid):
        days = np.unique(day[uid == u])
        runs, best = 1, 1
        for a, b in zip(days[:-1], days[1:]):
            runs = runs + 1 if b == a + 1 else 1
            best = max(best, runs)
        want[u] = best
    assert got.to_dict() == want


def test_decayed_sum_matches_local_and_is_partition_invariant():
    import pandas as pd

    from kiezray.windows import decayed_sum

    rng = np.random.RandomState(11)
    n = 2000
    key = rng.randint(0, 20, n)
    epoch = rng.randint(1_700_000_000, 1_700_900_000, n)
    val = np.round(rng.rand(n) * 100, 2)
    ts = epoch.astype("datetime64[s]").astype("datetime64[us]")
    half = 86400.0
    t = pa.table({"user_id": key, "ts": pa.array(ts), "value": val})
    got = decayed_sum(
        ray.data.from_arrow(t).repartition(6), "user_id", "ts", "value", half
    ).set_index("user_id")
    tmax = epoch.max()
    terms = np.floor(
        np.abs(val * np.exp((epoch - tmax) * np.log(2.0) / half) * 1e6)
        + 0.5
    )
    want = pd.DataFrame({"k": key, "t": terms}).groupby("k")["t"].sum() / 1e6
    for k in want.index:
        assert abs(got.loc[k, "decayed"] - want[k]) < 1e-9
    got2 = decayed_sum(
        ray.data.from_arrow(t).repartition(13), "user_id", "ts", "value", half
    ).set_index("user_id")
    assert (got2["decayed"] == got["decayed"]).all()


def test_first_last_matches_pandas_oracle():
    import pandas as pd

    from kiezray.windows import first_last

    rng = np.random.RandomState(4)
    n = 1500
    key = rng.randint(0, 25, n)
    epoch = rng.randint(1_700_000_000, 1_700_010_000, n)  # forced ts ties
    eid = rng.permutation(n)
    etype = rng.choice(np.array(["a", "b", "c"]), n)
    val = rng.rand(n) * 10
    t = pa.table(
        {
            "user_id": key,
            "ts": pa.array(
                epoch.astype("datetime64[s]").astype("datetime64[us]")
            ),
            "event_id": eid,
            "event_type": pa.array(etype),
            "value": val,
        }
    )
    got = (
        first_last(
            ray.data.from_arrow(t).repartition(8),
            "user_id", "ts", "event_id", ["event_type", "value"],
        )
        .to_pandas()
        .sort_values("user_id")
        .set_index("user_id")
    )
    df = pd.DataFrame(
        {"k": key, "e": epoch, "i": eid, "t": etype, "v": val}
    ).sort_values(["k", "e", "i"], kind="mergesort")
    f = df.groupby("k").head(1).set_index("k")
    l = df.groupby("k").tail(1).set_index("k")
    for k in f.index:
        assert got.loc[k, "first_epoch"] == f.loc[k, "e"]
        assert got.loc[k, "last_epoch"] == l.loc[k, "e"]
        assert got.loc[k, "first_event_type"] == f.loc[k, "t"]
        assert got.loc[k, "last_event_type"] == l.loc[k, "t"]
        assert abs(got.loc[k, "first_value"] - f.loc[k, "v"]) < 1e-12
        assert abs(got.loc[k, "last_value"] - l.loc[k, "v"]) < 1e-12


def test_sliding_distinct_bruteforce():
    from kiezray.windows import sliding_distinct

    rng = np.random.RandomState(8)
    n = 2000
    uid = rng.randint(0, 40, n)
    epoch = rng.randint(1_700_000_000, 1_700_020_000, n)
    t = pa.table(
        {
            "user_id": uid,
            "ts": pa.array(
                epoch.astype("datetime64[s]").astype("datetime64[us]")
            ),
        }
    )
    got = sliding_distinct(
        ray.data.from_arrow(t).repartition(7), "ts", "user_id", 3600, 900
    ).set_index("window_start")
    want = {}
    for e, u in zip(epoch, uid):
        base = (e // 900) * 900
        for i in range(4):
            ws = base - i * 900
            if e - ws < 3600:
                want.setdefault(ws, set()).add(u)
    assert len(got) == len(want)
    for ws, s in want.items():
        assert got.loc[ws, "distinct_ids"] == len(s)


def test_adoption_curve_bruteforce_and_large_keys():
    """Adoption curve matches a pandas first-touch oracle, including
    user ids beyond 2^32 and under re-partitioning."""
    from kiezray.windows import adoption_curve

    rng = np.random.RandomState(7)
    n = 3000
    uid = rng.choice(
        np.concatenate(
            [np.arange(40), np.array([2**40 + 1, 2**33, 9_000_000])]
        ),
        n,
    ).astype(np.int64)
    ts = rng.randint(0, 50 * 86400, n).astype("datetime64[s]")
    df = pd.DataFrame({"user_id": uid, "ts": ts})

    got = adoption_curve(
        ray.data.from_pandas(df).repartition(5), granularity_s=86400
    )

    day = df["ts"].to_numpy().astype(np.int64) // 86400
    first = (
        pd.DataFrame({"u": uid, "d": day}).groupby("u")["d"].min()
    )
    want = first.value_counts().sort_index()
    assert list(got["bucket_s"]) == [d * 86400 for d in want.index]
    assert list(got["new_keys"]) == list(want.values)
    assert list(got["cum_keys"]) == list(np.cumsum(want.values))
    assert got["cum_keys"].iloc[-1] == df["user_id"].nunique()


def test_activity_heatmap_bruteforce():
    from kiezray.windows import activity_heatmap

    rng = np.random.RandomState(13)
    n = 4000
    ts = rng.randint(0, 90 * 86400, n).astype("datetime64[s]")
    val = np.round(rng.uniform(0.01, 50, n), 2)
    df = pd.DataFrame({"ts": ts, "value": val})
    got = activity_heatmap(ray.data.from_pandas(df).repartition(5))
    day = ts.astype(np.int64) // 86400
    dow = (day + 4) % 7
    hour = (ts.astype(np.int64) // 3600) % 24
    cents = np.round(val * 100).astype(np.int64)
    loc = pd.DataFrame(
        {"dow": dow, "hour": hour, "c": cents}
    ).groupby(["dow", "hour"], as_index=False).agg(
        n=("c", "size"), cents=("c", "sum")
    )
    assert list(got["dow"]) == list(loc["dow"])
    assert list(got["hour"]) == list(loc["hour"])
    assert list(got["n"]) == list(loc["n"])
    assert np.allclose(got["total"], loc["cents"] / 100.0)


def test_interarrival_stats_bruteforce():
    from kiezray.windows import interarrival_stats

    rng = np.random.RandomState(17)
    n = 2000
    key = rng.randint(0, 60, n).astype(np.int64)
    ts = rng.randint(0, 10**6, n).astype("datetime64[s]")
    tie = np.arange(n, dtype=np.int64)
    df = pd.DataFrame({"k": key, "ts": ts, "id": tie})
    got = (
        interarrival_stats(
            ray.data.from_pandas(df).repartition(4), "k", "ts", "id"
        )
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    us = ts.astype("datetime64[us]").astype(np.int64)
    rows = []
    for kk in np.unique(key):
        g = np.sort(us[key == kk])
        if len(g) < 2:
            continue
        d = np.diff(g)
        rows.append((kk, len(d), d.mean() / 1e6, d.min(), d.max()))
    assert list(got["k"]) == [r[0] for r in rows]
    assert list(got["n_gaps"]) == [r[1] for r in rows]
    assert np.allclose(got["avg_gap_s"], [r[2] for r in rows], atol=1e-6)
    assert list(got["min_gap_us"]) == [r[3] for r in rows]
    assert list(got["max_gap_us"]) == [r[4] for r in rows]


def test_state_intervals_bruteforce_partition_invariant(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from kiezray.windows import state_intervals

    rng = np.random.RandomState(5)
    n = 2000
    df = pd.DataFrame(
        {
            "user_id": rng.randint(0, 30, n).astype(np.int64),
            "ts": pd.to_datetime(
                rng.randint(0, 10_000, n) * 1_000_000_000 + 1_600_000_000_000_000_000
            ),
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": rng.choice(["a", "b", "c"], n),
        }
    )
    # local oracle: sort, detect runs
    s = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    k = s["user_id"].to_numpy()
    st = s["event_type"].to_numpy(dtype=object)
    e = s["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
    brk = np.concatenate(([True], (k[1:] != k[:-1]) | (st[1:] != st[:-1])))
    starts = np.flatnonzero(brk)
    ends = np.append(starts[1:], len(k)) - 1
    want = pd.DataFrame(
        {
            "user_id": k[starts],
            "event_type": st[starts],
            "start_epoch": e[starts],
            "end_epoch": e[ends],
            "n_events": np.diff(np.append(starts, len(k))).astype(np.int64),
        }
    ).sort_values(["user_id", "start_epoch", "end_epoch"]).reset_index(drop=True)
    for parts in (1, 6):
        ds = ray.data.from_pandas(df).repartition(parts)
        got = (
            state_intervals(ds, "user_id", "ts", "event_id", "event_type")
            .to_pandas()
            .sort_values(["user_id", "start_epoch", "end_epoch"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)


def test_snapshot_diff_classification(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from kiezray.relops import snapshot_diff

    old = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                    "v": pa.array([1.0, 2.0, 3.0])})
    new = pa.table({"k": pa.array([2, 3, 4], pa.int64()),
                    "v": pa.array([2.0, 9.0, 4.0])})
    out = (
        snapshot_diff(
            ray.data.from_arrow(old).repartition(2),
            ray.data.from_arrow(new).repartition(3),
            "k", "v",
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(out["k"]) == [1, 2, 3, 4]
    assert list(out["status"]) == ["removed", "unchanged", "changed", "added"]


def test_peak_concurrency_bruteforce_partition_invariant(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from kiezray.windows import peak_concurrency

    rng = np.random.RandomState(8)
    n = 800
    start = rng.randint(0, 50_000, n).astype(np.int64)
    end = start + rng.randint(0, 8_000, n)
    # brute force: second-by-second occupancy
    occ = np.zeros(int(end.max()) + 2, np.int64)
    np.add.at(occ, start, 1)
    np.add.at(occ, end + 1, -1)
    cc = np.cumsum(occ)
    # maxima are reported at +1 application points (the SQL d=1 rows):
    # per hour, the max of cc at that hour's session-start seconds
    want = {}
    for h in np.unique(start // 3600):
        pts = start[start // 3600 == h]
        want[int(h)] = int(cc[pts].max())
    t = pa.table({"session_start": pa.array(start),
                  "session_end": pa.array(end)})
    for parts in (1, 7):
        out = peak_concurrency(
            ray.data.from_arrow(t).repartition(parts)
        )
        got = dict(zip(out["hour"], out["max_cc"]))
        assert got == want

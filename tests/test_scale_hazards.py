"""Regression tests for scale-correctness hazards found in round-2 review:

 - shard blocks not globally id-sorted when Ray's output buffer coalesces
   several per-batch-sorted tables into one block (search.py)
 - windowed-aggregate packed-key int64 overflow for keys >= 2^23
   (windows.py — replaced by hash-partition + exact in-partition groupby)
 - 32-bit sampling priority twin collisions for ids >= 2^32 (sample.py —
   widened to the full 64-bit modulus, DuckDB-HUGEINT-expressible)
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

from kiezray.search import ShardGather, shard_arrays, shard_refs_from_dataset


def _unsorted_shard_table():
    rng = np.random.RandomState(7)
    ids = rng.permutation(1000).astype(np.int64)
    vecs = rng.rand(1000, 4)
    from kiezray.arrowutil import matrix_to_fsl

    return pa.table(
        {
            "ids": pa.array(ids, pa.int64()),
            "vecs": matrix_to_fsl(vecs, pa.float64()),
        }
    ), ids, vecs


def test_shard_arrays_resorts_unsorted_block():
    tbl, ids, vecs = _unsorted_shard_table()
    out_ids, out_vecs = shard_arrays(tbl)
    assert np.all(out_ids[:-1] <= out_ids[1:])
    order = np.argsort(ids, kind="stable")
    np.testing.assert_array_equal(out_ids, ids[order])
    np.testing.assert_array_equal(out_vecs, vecs[order])


def test_shard_gather_and_max_id_survive_coalesced_blocks(ray_session):
    # one big input block + rows_per_shard smaller than the block: Ray's
    # output buffer coalesces several sorted batches into one block, so
    # the materialized block is NOT globally sorted — the round-2 hazard.
    rng = np.random.RandomState(3)
    n, d = 20000, 8
    ids = rng.permutation(n).astype(np.int64)
    vecs = rng.rand(n, d)
    from kiezray.arrowutil import matrix_to_fsl

    ds = ray.data.from_arrow(
        pa.table(
            {
                "row_id": pa.array(ids, pa.int64()),
                "embedding": matrix_to_fsl(vecs, pa.float64()),
            }
        )
    )
    refs, total, max_id = shard_refs_from_dataset(ds, rows_per_shard=4096)
    assert total == n
    assert max_id == n - 1  # pc.max, not last-element-of-sorted-prefix
    g = ShardGather(refs)
    probe = np.array([0, 19999, 19972, 7, 12345], dtype=np.int64)
    got = g.take(probe)  # raises KeyError on unsorted shards
    want = vecs[np.argsort(ids)][probe]
    np.testing.assert_allclose(got, want)


def test_tumbling_window_big_keys_match_pandas(ray_session):
    # keys far beyond 2^23 — the old packed k*2^40 key wrapped int64 here
    from kiezray.windows import sliding_window, tumbling_window

    rng = np.random.RandomState(11)
    n = 4000
    keys = rng.choice(
        np.array(
            [5, 2**23 + 1, 2**40 + 17, 2**55 + 3, 2**62 + 9], dtype=np.int64
        ),
        n,
    )
    ts = rng.randint(0, 86400, n).astype("datetime64[s]")
    vals = rng.rand(n)
    events = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(keys),
                "ts": pa.array(ts),
                "value": pa.array(vals),
            }
        )
    ).repartition(4)

    df = pd.DataFrame(
        {"user_id": keys, "es": ts.astype(np.int64), "value": vals}
    )
    df["window_start"] = (df["es"] // 3600) * 3600
    want = (
        df.groupby(["user_id", "window_start"], as_index=False)
        .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    got = (
        tumbling_window(events, window_s=3600)
        .to_pandas()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)[want.columns.tolist()]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # distinct (key, window) pairs must never merge
    assert len(got) == len(want)

    slid = sliding_window(events, window_s=3600, slide_s=1800).to_pandas()
    assert slid["n_events"].sum() == 2 * n  # every event in exactly 2


def test_sampling_priority_64bit_vs_duckdb(ray_session):
    import duckdb

    from kiezray.sample import _priority, bottomk_sample, hash_sample

    # ids straddling 2^32: low-word twins (x and x + 2^32) must get
    # DIFFERENT priorities now that the modulus is 2^64
    base = np.array([1, 5, 123456789], dtype=np.int64)
    twins = base + (1 << 32)
    p_base = _priority(base, seed=7)
    p_twin = _priority(twins, seed=7)
    assert not np.any(p_base == p_twin)

    rng = np.random.RandomState(5)
    ids = np.unique(
        np.concatenate(
            [
                rng.randint(0, 2**31, 3000).astype(np.int64),
                rng.randint(2**32, 2**62, 3000).astype(np.int64),
            ]
        )
    )
    tbl = pa.table({"id": pa.array(ids, pa.int64())})
    con = duckdb.connect()
    con.register("t", tbl)
    want_hash = con.execute(
        "SELECT id FROM t WHERE ((CAST(id AS HUGEINT) + 7) * 11400714819323198485) "
        "% 18446744073709551616 < 1844674407370955264 ORDER BY id"
    ).fetchdf()["id"].to_numpy()
    ds = ray.data.from_arrow(tbl).repartition(5)
    got_hash = np.sort(
        hash_sample(ds, "id", 0.1, seed=7).to_pandas()["id"].to_numpy()
    )
    np.testing.assert_array_equal(got_hash, want_hash)

    want_bk = con.execute(
        "SELECT id FROM t ORDER BY ((CAST(id AS HUGEINT) + 3) * 11400714819323198485) "
        "% 18446744073709551616, id LIMIT 50"
    ).fetchdf()["id"].to_numpy()
    got_bk = bottomk_sample(ds, "id", 50, seed=3).to_pandas()["id"].to_numpy()
    np.testing.assert_array_equal(np.sort(got_bk), np.sort(want_bk))

    with pytest.raises(ValueError, match="non-negative"):
        _priority(np.array([-1], dtype=np.int64), seed=0)


def test_mp_empiric_join_transport_matches_broadcast(ray_session):
    """VERDICT r2 item 8: the MP-empiric t->s neighbor-list transport is a
    shuffle join keyed on target_id by default — byte-identical to the
    broadcast path, with NO O(m*c) dense arrays on the driver or in
    broadcast state (m is bounded only by the cluster, not a node)."""
    from kiezray import Kiez

    rng = np.random.RandomState(13)
    src = rng.rand(400, 24)
    tgt = rng.rand(3000, 24)  # m >> any per-node broadcast budget analog
    kj = Kiez(n_candidates=12, algorithm="exact", hubness="mp_empiric")
    kj.fit(src, tgt)
    dj, ij = kj.kneighbors(6)
    stats_join = ray.get(kj._stats_ref)
    assert stats_join.t2s_ind is None  # no (m, c) broadcast arrays
    assert stats_join.t2s_dist is None
    assert kj._t2s_packed is not None  # lists live as a joined table

    kb = Kiez(
        n_candidates=12, algorithm="exact", hubness="mp_empiric",
        empiric_transport="broadcast",
    )
    kb.fit(src, tgt)
    db, ib = kb.kneighbors(6)
    np.testing.assert_array_equal(ij, ib)
    np.testing.assert_array_equal(dj, db)  # byte-identical, not just close


@pytest.mark.parametrize(
    "hub,hkw,akw",
    [
        ("csls", {}, {"metric": "euclidean"}),
        ("localscaling", {}, {"metric": "euclidean"}),
        ("localscaling", {"method": "nicdm"}, {"metric": "euclidean"}),
        ("mutualproximity", {}, {"metric": "euclidean"}),
        ("dsl", {}, {"metric": "sqeuclidean"}),
    ],
)
def test_stats_join_transport_matches_broadcast(ray_session, hub, hkw, akw):
    """VERDICT r3 item 1: calibration state (csls/ls/nicdm/mp_normal r_mean/
    r_kth/mu/sd, DSL d2c + candidate vectors) is shuffle-joinable onto the
    candidates keyed on target_id — byte-identical to the broadcast dense
    arrays, with no O(m_index) state in any actor."""
    from kiezray import Kiez

    rng = np.random.RandomState(29)
    src = rng.rand(250, 12)
    tgt = rng.rand(380, 12)
    res = {}
    for mode in ("broadcast", "join"):
        kz = Kiez(
            n_candidates=9,
            algorithm="exact",
            algorithm_kwargs=dict(akw),
            hubness=hub,
            hubness_kwargs=dict(hkw),
            stats_transport=mode,
            rows_per_shard=100,
        )
        kz.fit(src, tgt)
        res[mode] = kz.kneighbors(5)
        if mode == "join":
            assert kz._stats_table is not None
            stats = ray.get(kz._stats_ref)
            # no dense id-indexed arrays anywhere in broadcast state
            for arr in (stats.r_mean, stats.r_kth, stats.mu, stats.sd,
                        stats.dist_to_centroid):
                assert arr is None
    db, ib = res["broadcast"]
    dj, ij = res["join"]
    np.testing.assert_array_equal(ib, ij)
    # byte-identical, not just close (same row kernels on both tiers)
    np.testing.assert_array_equal(db.view(np.uint64), dj.view(np.uint64))


@pytest.mark.parametrize("hub,akw", [
    ("csls", {"metric": "euclidean"}),
    ("dsl", {"metric": "sqeuclidean"}),
])
def test_stats_join_sparse_huge_id_space(ray_session, hub, akw):
    """Forced-large target id space (ids ~2^41): 'auto' must resolve to the
    join tier and complete — the broadcast tier would allocate an
    O(max_id) dense array (terabytes) and is structurally impossible here.
    Results must match a dense-id broadcast run on the same vectors (ids
    are order-preservingly remapped, so tie-breaks agree)."""
    from kiezray import Kiez
    from kiezray.arrowutil import matrix_to_fsl

    rng = np.random.RandomState(47)
    n, m, d = 120, 180, 8
    src = rng.rand(n, d)
    tgt = rng.rand(m, d)

    def ds_with_ids(mat, base):
        ids = base + np.arange(len(mat), dtype=np.int64) * 2**33
        tbl = pa.table(
            {
                "row_id": pa.array(ids, pa.int64()),
                "embedding": matrix_to_fsl(mat, pa.float64()),
            }
        )
        return ray.data.from_arrow(tbl).repartition(3)

    kz = Kiez(
        n_candidates=8, algorithm="exact", algorithm_kwargs=dict(akw),
        hubness=hub, rows_per_shard=64,
    )
    kz.fit(ds_with_ids(src, 3), ds_with_ids(tgt, 7))
    assert kz._stats_join  # auto resolved to the join tier
    rows = kz.kneighbors_dataset(4).take_all()

    kd = Kiez(
        n_candidates=8, algorithm="exact", algorithm_kwargs=dict(akw),
        hubness=hub, stats_transport="broadcast", rows_per_shard=64,
    )
    kd.fit(src, tgt)
    d_want, i_want = kd.kneighbors(4)

    assert len(rows) == n
    for r in rows:
        qpos = (r["query_id"] - 3) >> 33
        got_ids = (np.asarray(r["neigh_ids"], dtype=np.int64) - 7) >> 33
        np.testing.assert_array_equal(got_ids, i_want[qpos])
        got_d = np.asarray(r["neigh_dists"])
        np.testing.assert_array_equal(
            got_d.view(np.uint64), d_want[qpos].view(np.uint64)
        )


def test_new_keyed_ops_big_keys_match_pandas(ray_session):
    """Keys >= 2^33 through the splitmix partition hash: event_gaps,
    event_sequences and grouped_mad must stay exact (no 32-bit masking,
    no packed-key overflow)."""
    import pandas as pd

    from kiezray.quantile import grouped_mad
    from kiezray.windows import event_gaps, event_sequences

    rng = np.random.RandomState(31)
    big_keys = np.array([2**33 + 7, 2**41 + 3, 2**62 + 11], dtype=np.int64)
    n = 600
    keys = big_keys[rng.randint(0, 3, n)]
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.randint(0, 10**6, n), unit="s"
    )
    df = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "user_id": keys,
            "ts": ts,
            "event_type": rng.choice(["a", "b", "c"], n),
            "value": rng.randn(n),
        }
    )
    ds = ray.data.from_pandas(df).repartition(5)

    gaps = (
        event_gaps(ds).to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    w = df.sort_values(["user_id", "ts", "event_id"]).copy()
    w["prev"] = w.groupby("user_id")["ts"].shift()
    w = w.dropna(subset=["prev"])
    w["gap_us"] = ((w["ts"] - w["prev"]).dt.total_seconds() * 1e6).astype(
        np.int64
    )
    w = w.sort_values("event_id").reset_index(drop=True)
    assert (gaps["event_id"].to_numpy() == w["event_id"].to_numpy()).all()
    assert (gaps["gap_us"].to_numpy() == w["gap_us"].to_numpy()).all()

    seqs = (
        event_sequences(ds).to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    want_seq = (
        df.sort_values(["user_id", "ts", "event_id"])
        .groupby("user_id")["event_type"]
        .agg(",".join)
    )
    assert dict(zip(seqs["user_id"], seqs["seq"])) == want_seq.to_dict()

    mad = (
        grouped_mad(ds, "user_id", "value")
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    for _, row in mad.iterrows():
        v = np.sort(df[df["user_id"] == row["user_id"]]["value"].to_numpy())
        med = v[(len(v) + 1) // 2 - 1]
        dev = np.sort(np.abs(df[df["user_id"] == row["user_id"]]["value"].to_numpy() - med))
        assert row["med"] == med
        assert row["mad"] == dev[(len(dev) + 1) // 2 - 1]


def test_substring_removal_join_tier_sparse_spans(ray_session):
    """VERDICT r4 item 1: the Lee-et-al removal pass must work under
    transport='join' (no node holds the dup-gram table). Regression
    shape: only ONE doc in a 60-doc corpus carries a duplicated span,
    so most hash-join partitions receive ZERO span rows — Ray 2.49's
    hash shuffle only broadcasts the right-side schema via the first
    block's empty shards, and an empty first block used to leave those
    partitions schema-less (pa.Table.join raised). Output must be
    byte-identical to the broadcast tier."""
    from kiezray.textops import dup_span_stats

    shared = "alpha beta gamma delta epsilon zeta"
    texts = [f"filler{i} unique{i} tokens{i} here{i} only{i} pad{i}"
             for i in range(58)]
    texts.append(f"{shared} and a keeper tail")      # doc 58: keeper
    texts.append(f"x y {shared} dup tail")           # doc 59: the one dup
    tbl = pa.table(
        {
            "doc_id": pa.array(range(60), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(5)
    a = (
        dup_span_stats(ds, L=5, return_text=True)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        dup_span_stats(ds, L=5, return_text=True, transport="join",
                       num_partitions=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b[a.columns].reset_index(drop=True))
    by = a.set_index("doc_id")
    assert by.loc[59, "dup_tokens"] == 6
    assert by.loc[59, "clean_text"] == "x y dup tail"
    assert by.loc[58, "dup_tokens"] == 0  # keeper intact

"""grouped_topk: string keys, ties, and k-larger-than-group edge cases."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from kiezray.relops import grouped_topk


def test_grouped_topk_string_keys_and_ties(ray_session):
    t = pa.table(
        {
            "domain": pa.array(["a", "a", "a", "b", "b", "c"]),
            "score": pa.array([1.0, 3.0, 3.0, 2.0, 5.0, 4.0]),
            "doc": pa.array([10, 11, 12, 20, 21, 30]),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    out = (
        grouped_topk(ds, "domain", "score", k=2, tie_col="doc")
        .to_pandas()
        .sort_values(["domain", "rank"])
        .reset_index(drop=True)
    )
    # a: score 3.0 tie -> doc 11 before 12; b: 5.0 then 2.0; c: single row
    assert list(out["domain"]) == ["a", "a", "b", "b", "c"]
    assert list(out["doc"]) == [11, 12, 21, 20, 30]
    assert list(out["rank"]) == [1, 2, 1, 2, 1]


def test_grouped_topk_ascending(ray_session):
    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 2], type=pa.int64()),
            "v": pa.array([3.0, 1.0, 2.0, 9.0]),
            "id": pa.array([0, 1, 2, 3], type=pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    out = (
        grouped_topk(ds, "k", "v", k=1, descending=False, tie_col="id")
        .to_pandas()
        .sort_values("k")
    )
    assert list(out["v"]) == [1.0, 9.0]


def test_asof_join_matches_pandas_oracle(ray_session):
    """Randomized as-of join vs a driver-side pandas merge_asof, incl.
    keys above 2^32 (partitioning-invariance + no key truncation)."""
    import pandas as pd

    from kiezray.relops import asof_join

    rng = np.random.default_rng(7)
    n, m = 3000, 500
    keys = rng.integers(0, 120, n).astype(np.int64) * (1 << 33)
    left = pd.DataFrame(
        {
            "lid": np.arange(n, dtype=np.int64),
            "k": keys,
            "t": rng.integers(0, 5000, n).astype(np.int64),
        }
    )
    right = (
        pd.DataFrame(
            {
                "rk": rng.integers(0, 150, m).astype(np.int64) * (1 << 33),
                "rt": rng.integers(0, 5000, m).astype(np.int64),
                "val": rng.normal(size=m),
            }
        )
        .groupby(["rk", "rt"], as_index=False)
        .agg(val=("val", "max"))
    )
    got = (
        asof_join(
            ray.data.from_pandas(left).repartition(5),
            ray.data.from_pandas(right).repartition(3),
            "k", "rk", "t", "rt",
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("rt"),
        left_on="t", right_on="rt", left_by="k", right_by="rk",
        direction="backward",
    )
    exp = (
        exp[exp["rt"].notna()]
        .astype({"rk": np.int64, "rt": np.int64})
        .sort_values("lid")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(got.columns)])
    assert got["k"].dtype == np.int64 and got["rk"].dtype == np.int64


def test_asof_join_forward_and_left(ray_session):
    import pandas as pd

    from kiezray.relops import asof_join

    left = pd.DataFrame(
        {"lid": [0, 1, 2], "k": [1, 1, 2], "t": [10, 99, 10]}
    ).astype(np.int64)
    right = pd.DataFrame({"rk": [1, 1], "rt": [20, 50], "v": [0.5, 0.9]})
    right["rk"] = right["rk"].astype(np.int64)
    right["rt"] = right["rt"].astype(np.int64)
    got = (
        asof_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            "k", "rk", "t", "rt",
            how="left", direction="forward",
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    # lid 0: next rt >= 10 is 20 (v=0.5); lid 1: none forward; lid 2: no key
    assert len(got) == 3
    assert got.loc[0, "v"] == 0.5
    assert np.isnan(got.loc[1, "v"]) and np.isnan(got.loc[2, "v"])


def test_semi_anti_join_string_keys(ray_session):
    from kiezray.relops import semi_join

    left = pa.table(
        {
            "doc": pa.array(["a", "b", "c", "d"]),
            "n": pa.array([1, 2, 3, 4], type=pa.int64()),
        }
    )
    right = pa.table({"seen": pa.array(["b", "d", "zz"])})
    lds = ray.data.from_arrow(left).repartition(2)
    rds = ray.data.from_arrow(right)
    semi = semi_join(lds, rds, "doc", "seen").to_pandas()
    anti = semi_join(lds, rds, "doc", "seen", anti=True).to_pandas()
    assert sorted(semi["doc"]) == ["b", "d"]
    assert sorted(anti["doc"]) == ["a", "c"]
    assert anti["n"].dtype == np.int64


def test_range_join_matches_pandas_oracle(ray_session):
    """Randomized band join vs a brute-force pandas cross-product filter,
    incl. keys above 2^32 and an asymmetric [lo, hi] band."""
    import pandas as pd

    from kiezray.relops import range_join

    rng = np.random.default_rng(11)
    nl, nr = 300, 400
    big = np.int64(1) << 40
    lk = rng.integers(0, 12, nl).astype(np.int64) + big
    rk = rng.integers(0, 12, nr).astype(np.int64) + big
    lt = rng.integers(0, 1000, nl).astype(np.int64)
    rt = rng.integers(0, 1000, nr).astype(np.int64)
    left = pd.DataFrame({"lid": np.arange(nl, dtype=np.int64), "k": lk, "t": lt})
    right = pd.DataFrame({"rid": np.arange(nr, dtype=np.int64), "rk": rk, "rt": rt})
    lo, hi = -25, 60
    got = (
        range_join(
            ray.data.from_pandas(left).repartition(5),
            ray.data.from_pandas(right).repartition(3),
            "k", "rk", "t", "rt", lo=lo, hi=hi,
        )
        .to_pandas()
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )
    cross = left.merge(right, left_on="k", right_on="rk")
    d = cross["rt"] - cross["t"]
    want = (
        cross[(d >= lo) & (d <= hi)]
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert (got["lid"].values == want["lid"].values).all()
    assert (got["rid"].values == want["rid"].values).all()


def test_range_join_timestamp_and_empty_band(ray_session):
    import pandas as pd

    from kiezray.relops import range_join

    left = pd.DataFrame(
        {
            "lid": np.array([0, 1], dtype=np.int64),
            "k": np.array([7, 8], dtype=np.int64),
            "t": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 06:00:00"]),
        }
    )
    right = pd.DataFrame(
        {
            "rid": np.array([10, 11, 12], dtype=np.int64),
            "rk": np.array([7, 7, 9], dtype=np.int64),
            "rt": pd.to_datetime(
                ["2024-01-01 00:30:00", "2024-01-01 02:00:00",
                 "2024-01-01 00:10:00"]
            ),
        }
    )
    # pandas timestamps are ns-resolution: the band is in the column's
    # raw int64 unit (ns here, us for parquet timestamp[us] columns)
    hour_ns = 3_600_000_000_000
    got = (
        range_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            "k", "rk", "t", "rt", lo=0, hi=hour_ns,
        )
        .to_pandas()
    )
    # only (lid 0, rid 10) is within [0, 1h]; key 8 and 9 never match
    assert list(got["lid"]) == [0] and list(got["rid"]) == [10]


def test_hash_join_matches_pandas(ray_session):
    import pandas as pd

    from kiezray.relops import hash_join

    rng = np.random.default_rng(3)
    left = pd.DataFrame(
        {
            "lid": np.arange(200, dtype=np.int64),
            "k": rng.integers(0, 40, 200).astype(np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "rk": rng.integers(0, 40, 100).astype(np.int64),
            "v": rng.normal(size=100),
        }
    )
    got = (
        hash_join(
            ray.data.from_pandas(left).repartition(4),
            ray.data.from_pandas(right).repartition(2),
            "k", "rk",
        )
        .to_pandas()
        .sort_values(["lid", "rk", "v"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, left_on="k", right_on="rk")
        .sort_values(["lid", "rk", "v"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in ["lid", "k", "rk", "v"]:
        assert (got[c].values == want[c].values).all()


def test_hash_join_left_keeps_unmatched_with_typed_nulls(ray_session):
    import pandas as pd

    from kiezray.relops import hash_join

    rng = np.random.default_rng(5)
    left = pd.DataFrame(
        {
            "lid": np.arange(120, dtype=np.int64),
            "k": rng.integers(0, 60, 120).astype(np.int64),
        }
    )
    # right covers only keys < 30 -> roughly half the left rows unmatched
    right = pd.DataFrame(
        {
            "rk": rng.integers(0, 30, 50).astype(np.int64),
            "rv": rng.integers(0, 1000, 50).astype(np.int64),
        }
    )
    ds = hash_join(
        ray.data.from_pandas(left).repartition(4),
        ray.data.from_pandas(right).repartition(2),
        "k", "rk", how="left",
    )
    # typed nulls: the int64 right columns keep int64 (Arrow), not float
    import pyarrow as pa

    tbl = pa.concat_tables(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    assert tbl.schema.field("rv").type == pa.int64()
    got = (
        tbl.to_pandas()
        .sort_values(["lid", "rk", "rv"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, left_on="k", right_on="rk", how="left")
        .sort_values(["lid", "rk", "rv"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > len(left) - 1
    assert got["rk"].isna().any()  # unmatched rows survived
    for c in ["lid", "k"]:
        assert (got[c].values == want[c].values).all()
    for c in ["rk", "rv"]:
        ga, wa = got[c].astype(float), want[c].astype(float)
        assert ((ga == wa) | (ga.isna() & wa.isna())).all()

    with pytest.raises(ValueError, match="how"):
        hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            "k", "rk", how="outer",
        )


def test_pivot_count_static_columns_and_unknowns(ray_session):
    import pandas as pd

    from kiezray.relops import pivot_count

    rng = np.random.default_rng(11)
    vals = np.array(["a", "b", "c", "zzz"])  # zzz not in the declared set
    df = pd.DataFrame(
        {
            "uid": rng.integers(0, 50, 5000).astype(np.int64),
            "typ": vals[rng.integers(0, 4, 5000)],
        }
    )
    got = (
        pivot_count(
            ray.data.from_pandas(df).repartition(6), "uid", "typ", ["a", "b", "c"]
        )
        .to_pandas()
        .sort_values("uid")
        .reset_index(drop=True)
    )
    want = (
        df[df.typ != "zzz"]
        .pivot_table(index="uid", columns="typ", aggfunc=len, fill_value=0)
        .reset_index()
    )
    want.columns = ["uid", "a", "b", "c"]
    assert list(got.columns) == ["uid", "a", "b", "c"]
    assert (got["uid"].values == want["uid"].values).all()
    for c in ["a", "b", "c"]:
        assert got[c].dtype == np.int64
        assert (got[c].values == want[c].values).all()


def test_distinct_count_exact_across_partitions(ray_session):
    """Duplicated (key, value) pairs spread over many partitions count
    once; keys above 2^32 survive; string keys work."""
    import pandas as pd

    from kiezray.relops import distinct_count

    rng = np.random.default_rng(9)
    n = 5000
    big = np.int64(1) << 41
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 30, n).astype(np.int64) + big,
            "v": rng.integers(0, 50, n).astype(np.int64),
        }
    )
    got = (
        distinct_count(ray.data.from_pandas(df).repartition(7), "k", "v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = df.groupby("k")["v"].nunique().reset_index().rename(
        columns={"v": "distinct_values"}
    )
    assert (got["k"].values == want["k"].values).all()
    assert (got["distinct_values"].values == want["distinct_values"].values).all()

    sdf = pd.DataFrame({"k": ["a", "a", "b", "b", "b"], "v": ["x", "x", "x", "y", "y"]})
    got_s = (
        distinct_count(ray.data.from_pandas(sdf).repartition(3), "k", "v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(got_s["distinct_values"]) == [1, 2]


def test_broadcast_join_inner_and_left(ray_session):
    import pandas as pd

    from kiezray.relops import broadcast_join

    left = pd.DataFrame(
        {
            "lid": np.arange(6, dtype=np.int64),
            "k": np.array([1, 2, 3, 1, 9, 2], dtype=np.int64),
        }
    )
    dim = pd.DataFrame(
        {"dk": np.array([1, 2, 3], dtype=np.int64), "name": ["a", "b", "c"]}
    )
    inner = (
        broadcast_join(
            ray.data.from_pandas(left).repartition(3),
            ray.data.from_pandas(dim),
            "k", "dk",
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    assert list(inner["lid"]) == [0, 1, 2, 3, 5]
    assert list(inner["name"]) == ["a", "b", "c", "a", "b"]
    left_out = (
        broadcast_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(dim),
            "k", "dk", how="left",
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    assert len(left_out) == 6
    assert left_out.loc[4, "name"] is None or left_out.loc[4, "name"] != left_out.loc[4, "name"]


def test_global_rank_exact_and_partition_invariant(ray_session):
    import pandas as pd

    from kiezray.relops import global_rank

    rng = np.random.default_rng(13)
    n = 6000
    # heavy ties: only 40 distinct values, so many cross a naive boundary
    df = pd.DataFrame(
        {
            "v": rng.integers(0, 40, n).astype(np.float64),
            "tid": rng.permutation(n).astype(np.int64),
        }
    )
    want = df.sort_values(["v", "tid"]).reset_index(drop=True)
    want["rank"] = np.arange(1, n + 1, dtype=np.int64)

    for reps, cp in ((4, True), (9, False)):
        got = (
            global_rank(
                ray.data.from_pandas(df).repartition(reps),
                "v", "tid", num_partitions=8, sample_n=200, checkpoint=cp,
            )
            .to_pandas()
            .sort_values("rank")
            .reset_index(drop=True)
        )
        assert (got["rank"].values == want["rank"].values).all()
        assert (got["v"].values == want["v"].values).all()
        assert (got["tid"].values == want["tid"].values).all()


def test_pack_sequences_conservation_and_spanning(ray_session):
    import pandas as pd

    from kiezray.relops import pack_sequences

    rng = np.random.default_rng(17)
    n = 500
    counts = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            # mix of empty docs, short docs, and docs longer than a chunk
            "n_tokens": np.where(
                rng.random(n) < 0.05, 0, rng.integers(1, 300, n)
            ).astype(np.int64),
        }
    )
    B = 128
    out = (
        pack_sequences(
            ray.data.from_pandas(counts).repartition(6),
            "doc_id", "n_tokens", chunk_tokens=B,
            num_partitions=8, sample_n=64,
        )
        .to_pandas()
        .sort_values(["chunk_id", "doc_id"])
        .reset_index(drop=True)
    )
    total = int(counts["n_tokens"].sum())
    # conservation: every token lands in exactly one chunk row
    assert int((out["tok_end"] - out["tok_start"]).sum()) == total
    # per-doc coverage: subranges tile [0, n_tokens) in order
    per = out.groupby("doc_id")
    for did, g in per:
        g = g.sort_values("chunk_id")
        want_n = int(counts.loc[counts.doc_id == did, "n_tokens"].iloc[0])
        assert g["tok_start"].iloc[0] == 0
        assert g["tok_end"].iloc[-1] == want_n
        assert (g["tok_start"].values[1:] == g["tok_end"].values[:-1]).all()
        # consecutive chunk ids when a doc spans chunks
        assert (np.diff(g["chunk_id"].values) == 1).all()
    # chunk fullness: every chunk except the last holds exactly B tokens
    chunk_tok = out.groupby("chunk_id").apply(
        lambda g: int((g["tok_end"] - g["tok_start"]).sum()),
        include_groups=False,
    )
    assert (chunk_tok.values[:-1] == B).all()
    assert out["chunk_id"].max() == (total - 1) // B
    # zero-count docs never appear
    zero_ids = set(counts.loc[counts.n_tokens == 0, "doc_id"])
    assert not (set(out["doc_id"]) & zero_ids)


def test_full_join_matches_pandas_outer():
    import numpy as np
    import pandas as pd
    import ray

    from kiezray.relops import hash_join

    rng = np.random.default_rng(17)
    left = pd.DataFrame(
        {"lk": rng.integers(0, 40, 200), "lv": np.arange(200)}
    )
    right = pd.DataFrame(
        {"rk": rng.integers(20, 60, 100), "rv": np.arange(100) * 1.5}
    )
    got = (
        hash_join(
            ray.data.from_pandas(left).repartition(3),
            ray.data.from_pandas(right).repartition(2),
            "lk", "rk", how="full",
        )
        .to_pandas()
        .sort_values(["lk", "lv", "rk", "rv"], na_position="last")
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, left_on="lk", right_on="rk", how="outer")
        .sort_values(["lk", "lv", "rk", "rv"], na_position="last")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ["lk", "lv", "rk", "rv"]:
        g = got[c].to_numpy(dtype=float)
        w = want[c].to_numpy(dtype=float)
        assert ((g == w) | (np.isnan(g) & np.isnan(w))).all(), c


def test_grouped_rank_descending_and_bigkeys():
    import numpy as np
    import pandas as pd
    import ray

    from kiezray.relops import grouped_rank

    rng = np.random.default_rng(23)
    # keys beyond 2^33 exercise the splitmix partition hash, not % bias
    keys = rng.choice(np.array([2**33 + 7, 2**40 + 1, 5], dtype=np.int64), 300)
    df = pd.DataFrame(
        {"k": keys, "v": rng.normal(size=300), "id": np.arange(300)}
    )
    for asc in (True, False):
        got = (
            grouped_rank(
                ray.data.from_pandas(df).repartition(4),
                "k", "v", "id", ascending=asc,
            )
            .to_pandas().sort_values(["k", "rank"]).reset_index(drop=True)
        )
        want = df.copy()
        want["rank"] = (
            want.groupby("k")["v"]
            .rank(method="first", ascending=asc)
            .astype(np.int64)
        )
        want = want.sort_values(["k", "rank"]).reset_index(drop=True)
        assert (got["id"].to_numpy() == want["id"].to_numpy()).all()
        assert (got["rank"].to_numpy() == want["rank"].to_numpy()).all()


def test_table_set_op_matches_python_sets():
    import numpy as np
    import pandas as pd
    import ray

    from kiezray.relops import table_set_op

    rng = np.random.default_rng(29)
    left = pd.DataFrame(
        {"a": rng.integers(0, 20, 300), "b": rng.choice(["x", "y"], 300)}
    )
    right = pd.DataFrame(
        {"a": rng.integers(10, 30, 200), "b": rng.choice(["x", "y"], 200)}
    )
    lds = ray.data.from_pandas(left).repartition(3)
    rds = ray.data.from_pandas(right).repartition(2)
    lset = set(map(tuple, left.itertuples(index=False)))
    rset = set(map(tuple, right.itertuples(index=False)))
    for op, want in [
        ("intersect", lset & rset),
        ("except", lset - rset),
    ]:
        got = table_set_op(lds, rds, op=op).to_pandas()
        got_set = set(map(tuple, got.itertuples(index=False)))
        assert got_set == want and len(got) == len(want), op  # distinct


def test_normalize_text_real_nfkc():
    import pandas as pd
    import ray

    from kiezray.textops import normalize_text

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            # ligature fi, fullwidth A, double spaces + tabs
            "text": ["ﬁne  Work", "ＡBC\tdef ", None],
        }
    )
    out = (
        normalize_text(ray.data.from_pandas(docs))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(out["norm_text"]) == ["fine work", "abc def", ""]
    assert list(out["changed"]) == [1, 1, 0]


def test_key_skew_exact_counts_and_shares():
    import numpy as np
    import pandas as pd
    import ray

    from kiezray.relops import key_skew

    keys = np.concatenate(
        [np.full(50, 7), np.full(30, 2), np.arange(100, 120)]
    )
    df = pd.DataFrame({"k": keys})
    out = key_skew(ray.data.from_pandas(df).repartition(4), "k", top=3)
    assert list(out["k"]) == [7, 2, 100]
    assert list(out["n"]) == [50, 30, 1]
    assert out.loc[0, "share"] == 50 / 100


def test_count_distribution_zero_bucket_and_exactness():
    """The arithmetic zero bucket (universe_size - distinct keys) must
    match what a LEFT JOIN would surface, including for big keys."""
    import numpy as np
    import pandas as pd
    import ray

    from kiezray.relops import count_distribution

    rng = np.random.RandomState(3)
    # keys 0..99 present with varying multiplicity; universe is 0..129
    keys = np.repeat(np.arange(100, dtype=np.int64), rng.randint(1, 6, 100))
    keys = np.concatenate([keys, np.array([2**40 + 5] * 4, dtype=np.int64)])
    df = pd.DataFrame({"k": keys})
    out = count_distribution(
        ray.data.from_pandas(df).repartition(4), "k", universe_size=131
    )
    want = (
        pd.Series(keys).value_counts().value_counts().rename_axis("c_count")
        .reset_index(name="custdist")
    )
    zero = pd.DataFrame({"c_count": [0], "custdist": [131 - 101]})
    want = (
        pd.concat([want, zero], ignore_index=True)
        .sort_values(["custdist", "c_count"], ascending=[False, False])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.astype(np.int64), want.astype(np.int64)
    )


def test_grouped_ntile_uneven_fill_and_tiny_groups():
    """SQL NTILE fill rule: first cnt%n tiles get the extra row; when
    n > cnt each of the first cnt tiles gets exactly one row."""
    import numpy as np
    import pandas as pd
    import ray

    from kiezray.relops import grouped_ntile

    # key 1: 10 rows into 4 tiles -> sizes 3,3,2,2
    # key 2: 2 rows into 4 tiles  -> tiles 1,2 (n > cnt)
    # key 3: 4 rows into 4 tiles  -> 1,1,1,1
    df = pd.DataFrame(
        {
            "k": [1] * 10 + [2] * 2 + [3] * 4,
            "o": list(range(10)) + [5, 3] + [9, 7, 8, 6],
            "t": np.arange(16, dtype=np.int64),
        }
    )
    out = (
        grouped_ntile(ray.data.from_pandas(df).repartition(4), "k", "o", "t", n=4)
        .to_pandas()
        .sort_values(["k", "o"])
    )
    assert list(out[out["k"] == 1]["tile"]) == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    assert list(out[out["k"] == 2]["tile"]) == [1, 2]  # ordered by o: 3,5
    assert list(out[out["k"] == 3]["tile"]) == [1, 2, 3, 4]


def test_cube_matches_pandas_all_subsets():
    import numpy as np
    import pandas as pd
    import ray

    from kiezray.moments import cube_sum_count

    rng = np.random.RandomState(5)
    df = pd.DataFrame(
        {
            "a": rng.choice(list("xyz"), 200),
            "b": rng.choice(list("pq"), 200),
            "v": rng.rand(200),
        }
    )
    out = cube_sum_count(
        ray.data.from_pandas(df).repartition(4), ["a", "b"], "v"
    )
    # 2x3 finest + 3 a-marginals + 2 b-marginals + 1 grand = 12 rows
    assert len(out) == 12
    grand = out[(out["a"] == "ALL") & (out["b"] == "ALL")]
    assert int(grand["c"].iloc[0]) == 200
    assert abs(float(grand["s"].iloc[0]) - df["v"].sum()) < 1e-9
    bm = out[(out["a"] == "ALL") & (out["b"] == "p")]
    want = df[df["b"] == "p"]
    assert int(bm["c"].iloc[0]) == len(want)
    assert abs(float(bm["s"].iloc[0]) - want["v"].sum()) < 1e-9


def test_grouped_rank_stats_tie_semantics():
    """RANK shares the first tied position, CUME_DIST the last;
    PERCENT_RANK is 0 for single-row keys."""
    import numpy as np
    import pandas as pd
    import ray

    from kiezray.relops import grouped_rank_stats

    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 1, 1, 2],
            "o": [10, 10, 10, 20, 30, 5],
            "t": np.arange(6, dtype=np.int64),
        }
    )
    out = (
        grouped_rank_stats(
            ray.data.from_pandas(df).repartition(3), "k", "o", "t"
        )
        .to_pandas()
        .sort_values(["k", "o", "t"])
        .reset_index(drop=True)
    )
    assert list(out["rank"]) == [1, 1, 1, 4, 5, 1]
    assert list(out["percent_rank"]) == [0, 0, 0, 0.75, 1.0, 0.0]
    assert list(out["cume_dist"]) == [0.6, 0.6, 0.6, 0.8, 1.0, 1.0]


def test_global_ntile_uneven_fill_and_tiny_input(ray_session):
    """NTILE uneven-fill rule (first n%k tiles get one extra row) holds
    under arbitrary partitioning; n < k degrades to one row per tile."""
    import pandas as pd
    import ray

    from kiezray.relops import global_ntile

    rng = np.random.default_rng(3)
    n, k = 103, 10  # 3 tiles of 11, 7 of 10
    df = pd.DataFrame(
        {"v": rng.integers(0, 40, n), "id": np.arange(n, dtype=np.int64)}
    )
    got = (
        global_ntile(ray.data.from_pandas(df).repartition(6), "v", "id", k)
        .to_pandas()
        .sort_values(["v", "id"])
        .reset_index(drop=True)
    )
    sizes = got.groupby("tile").size()
    assert list(sizes) == [11, 11, 11] + [10] * 7
    # tiles are contiguous in the (v, id) total order
    assert (np.diff(got["tile"].to_numpy()) >= 0).all()
    # n < k: every row its own tile, numbered by rank
    small = pd.DataFrame({"v": [5, 1, 9], "id": [0, 1, 2]})
    got2 = (
        global_ntile(ray.data.from_pandas(small), "v", "id", 10)
        .to_pandas()
        .sort_values("v")
    )
    assert list(got2["tile"]) == [1, 2, 3]


def test_skyline_matches_bruteforce_with_ties(ray_session):
    """Skyline equals the O(n^2) strict-dominance oracle, including
    duplicate frontier points (all kept) and same-x/same-y tie chains;
    invariant to input partitioning."""
    import pandas as pd
    import ray

    from kiezray.relops import skyline

    rng = np.random.default_rng(21)
    n = 1200
    x = rng.integers(0, 40, n).astype(np.float64)  # coarse: real ties
    y = rng.integers(0, 40, n).astype(np.float64)
    # plant an exact duplicate pair on the frontier
    x[0] = x[1] = x.max() + 1
    y[0] = y[1] = y.max() + 1
    df = pd.DataFrame({"x": x, "y": y, "id": np.arange(n, dtype=np.int64)})
    dominated = np.zeros(n, dtype=bool)
    for i in range(n):
        dominated[i] = bool(
            (
                (x >= x[i]) & (y >= y[i]) & ((x > x[i]) | (y > y[i]))
            ).any()
        )
    want = set(df.loc[~dominated, "id"])
    assert 0 in want and 1 in want  # both duplicates survive
    for parts in (1, 5):
        got = skyline(
            ray.data.from_pandas(df).repartition(parts),
            "x", "y", carry_cols=("id",),
        )
        assert set(got["id"]) == want


def test_having_above_global_avg_exact_boundary():
    """A key landing EXACTLY on the mean per-key total is excluded
    (strict >) — the int64 fixed-point threshold cannot flip it."""
    import pandas as pd

    from kiezray.relops import having_above_global_avg

    # totals: 10.00, 20.00, 30.00 -> avg 20.00; key 2 sits on the mean
    df = pd.DataFrame(
        {
            "k": [1, 1, 2, 3, 3, 3],
            "v": [4.0, 6.0, 20.0, 10.0, 10.0, 10.0],
        }
    )
    out = (
        having_above_global_avg(
            ray.data.from_pandas(df).repartition(3), "k", "v"
        )
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    assert out["k"].tolist() == [3]
    assert out["total"].tolist() == [30.0]


def test_basket_pairs_known_counts():
    """Pair counts match brute-force combinations over distinct basket
    items; duplicates inside a basket count once; top-N order is
    (cnt desc, item_a, item_b)."""
    from itertools import combinations

    from kiezray.relops import basket_pairs

    baskets = {
        1: [10, 20, 30],
        2: [10, 20],
        3: [20, 30, 30],  # dup item
        4: [10, 20, 30, 40],
        5: [40],
    }
    rows_g, rows_i = [], []
    for g, items in baskets.items():
        for i in items:
            rows_g.append(g)
            rows_i.append(i)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "order": pa.array(rows_g, pa.int64()),
                "item": pa.array(rows_i, pa.int64()),
            }
        )
    ).repartition(4)
    got = basket_pairs(ds, "order", "item", topn=3).to_pandas()
    from collections import Counter

    want = Counter()
    for items in baskets.values():
        for a, b in combinations(sorted(set(items)), 2):
            want[(a, b)] += 1
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [
        ((r.item_a, r.item_b), r.cnt) for r in got.itertuples()
    ] == top


def test_grouped_top_values_exact_counts_and_ties():
    import pandas as pd

    from kiezray.relops import grouped_top_values

    rng = np.random.RandomState(2)
    key = rng.randint(0, 15, 4000)
    val = rng.choice(np.array(["a", "b", "c", "d", "e"]), 4000)
    ds = ray.data.from_arrow(pa.table({"k": key, "v": val})).repartition(9)
    got = grouped_top_values(ds, "k", "v", k=2).to_pandas()
    got = got.sort_values(["k", "rank"]).reset_index(drop=True)
    df = pd.DataFrame({"k": key, "v": val})
    cnt = df.groupby(["k", "v"]).size().reset_index(name="cnt")
    cnt = cnt.sort_values(["k", "cnt", "v"], ascending=[True, False, True])
    cnt["rank"] = cnt.groupby("k").cumcount() + 1
    want = cnt[cnt["rank"] <= 2].reset_index(drop=True)
    assert len(got) == len(want)
    for c in ["k", "v", "cnt", "rank"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_rfm_segments_matches_pandas_ntile():
    """RFM tiles match SQL's uneven-fill NTILE rule computed locally."""
    import pandas as pd

    from kiezray.relops import rfm_segments

    rng = np.random.RandomState(9)
    n = 3000
    cust = rng.randint(0, 173, n).astype(np.int64)
    date = rng.randint(0, 10**6, n).astype("datetime64[s]")
    price = np.round(rng.uniform(1, 900, n), 2)
    df = pd.DataFrame(
        {"o_custkey": cust, "o_orderdate": date, "o_totalprice": price}
    )
    got = (
        rfm_segments(
            ray.data.from_pandas(df).repartition(4),
            "o_custkey", "o_orderdate", "o_totalprice", k=4,
        )
        .to_pandas()
        .sort_values("o_custkey", ignore_index=True)
    )

    cents = np.round(price * 100).astype(np.int64)
    agg = pd.DataFrame(
        {"c": cust, "r": date.astype("datetime64[s]").astype(np.int64),
         "cents": cents}
    ).groupby("c").agg(
        recency_s=("r", "max"), frequency=("r", "size"),
        cents=("cents", "sum"),
    ).reset_index()

    def ntile(order, tie, k=4):
        idx = np.lexsort((tie, order))
        m = len(idx)
        q, rem = divmod(m, k)
        sizes = [q + 1] * rem + [q] * (k - rem)
        t = np.empty(m, dtype=np.int64)
        pos = 0
        for i, s in enumerate(sizes, 1):
            t[idx[pos:pos + s]] = i
            pos += s
        return t

    agg["r_tile"] = ntile(agg["recency_s"].to_numpy(), agg["c"].to_numpy())
    agg["f_tile"] = ntile(agg["frequency"].to_numpy(), agg["c"].to_numpy())
    agg["m_tile"] = ntile(agg["cents"].to_numpy(), agg["c"].to_numpy())

    assert list(got["o_custkey"]) == list(agg["c"])
    assert list(got["recency_s"]) == list(agg["recency_s"])
    assert list(got["frequency"]) == list(agg["frequency"])
    assert np.allclose(got["monetary"], agg["cents"] / 100.0)
    for col in ["r_tile", "f_tile", "m_tile"]:
        assert list(got[col]) == list(agg[col]), col


def test_grouped_distinct_count_bruteforce_partition_invariant(ray_session):
    import pandas as pd

    from kiezray.relops import grouped_distinct_count

    rng = np.random.RandomState(11)
    n = 5000
    k = rng.randint(0, 40, n).astype(np.int64)
    v = rng.randint(0, 25, n).astype(np.int64)
    want = (
        pd.DataFrame({"k": k, "v": v})
        .groupby("k")["v"].nunique().sort_index()
    )
    t = pa.table({"k": pa.array(k), "v": pa.array(v)})
    for parts in (1, 7):
        ds = ray.data.from_arrow(t).repartition(parts)
        got = (
            grouped_distinct_count(ds, "k", "v")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert list(got["k"]) == list(want.index)
        assert list(got["distinct_cnt"]) == list(want.values)


def test_golden_record_bruteforce_partition_invariant(ray_session):
    """Survivorship rules match a straight-line pandas oracle and are
    invariant to input partitioning."""
    import numpy as np
    import pandas as pd
    import ray

    from kiezray.relops import golden_record

    rng = np.random.RandomState(11)
    n = 400
    df = pd.DataFrame(
        {
            "user_id": rng.randint(0, 23, n).astype(np.int64),
            "event_type": rng.choice(list("abcd"), n),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.randint(0, 10_000, n), unit="s"),
            "event_id": np.arange(n, dtype=np.int64),
            "props": [f"p{i % 37}" for i in range(n)],
            "value": rng.rand(n) * 10,
        }
    )
    # duplicate timestamps to exercise the tie-break
    df.loc[1, "ts"] = df.loc[0, "ts"]
    df.loc[1, "user_id"] = df.loc[0, "user_id"]

    def oracle(d):
        rows = []
        for u, g in d.groupby("user_id"):
            vc = g.groupby("event_type").size()
            top = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            g2 = g.sort_values(
                ["ts", "event_id"], ascending=[False, False]
            )
            rows.append(
                (
                    u, len(g), g["ts"].min(), top,
                    g2["props"].iloc[0],
                    int(np.round(g["value"].to_numpy() * 1e6)
                        .astype(np.int64).sum()),
                )
            )
        return pd.DataFrame(
            rows,
            columns=["user_id", "n_rows", "first_ts", "top_event_type",
                     "last_props", "sum_units"],
        ).sort_values("user_id").reset_index(drop=True)

    want = oracle(df)
    for nparts in (1, 7):
        ds = ray.data.from_pandas(df.sample(frac=1, random_state=3))
        ds = ds.repartition(nparts)
        got = (
            golden_record(ds, "user_id", "event_type", "ts", "props",
                          "event_id", "value")
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

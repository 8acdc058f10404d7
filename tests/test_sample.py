"""Sampling operators: determinism, partition invariance, uniformity."""

import numpy as np
import pyarrow as pa
import ray.data

from kiezray.sample import bottomk_sample, hash_sample


def _ds(n, parts):
    return ray.data.from_arrow(
        pa.table({"id": pa.array(np.arange(n, dtype=np.int64))})
    ).repartition(parts)


def test_hash_sample_partition_invariant(ray_session):
    a = sorted(hash_sample(_ds(20000, 4), "id", 0.2, seed=1).to_pandas()["id"])
    b = sorted(hash_sample(_ds(20000, 13), "id", 0.2, seed=1).to_pandas()["id"])
    assert a == b
    assert 0.17 < len(a) / 20000 < 0.23
    c = sorted(hash_sample(_ds(20000, 4), "id", 0.2, seed=2).to_pandas()["id"])
    assert c != a  # seed changes the subset


def test_bottomk_sample_partition_invariant_and_uniform(ray_session):
    a = sorted(bottomk_sample(_ds(20000, 4), "id", 500, seed=1).to_pandas()["id"])
    b = sorted(bottomk_sample(_ds(20000, 13), "id", 500, seed=1).to_pandas()["id"])
    assert a == b and len(a) == 500
    # roughly uniform over the id range: mean near the middle
    assert 8000 < np.mean(a) < 12000


def test_stratified_sample_partition_invariant(ray_session):
    """Same per-stratum sample regardless of input partitioning; each
    stratum yields min(n, stratum_size) rows; matches a driver oracle
    built from the same priority arithmetic."""
    import pandas as pd

    from kiezray.sample import _priority, stratified_sample

    rng = np.random.default_rng(21)
    df = pd.DataFrame(
        {
            "id": np.arange(900, dtype=np.int64),
            "src": rng.choice(["a", "b", "c", "tiny"], 900,
                              p=[0.4, 0.4, 0.19, 0.01]),
        }
    )
    outs = []
    for parts in (2, 9):
        got = (
            stratified_sample(
                ray.data.from_pandas(df).repartition(parts),
                "src", "id", n=15, seed=4,
            )
            .to_pandas()
            .sort_values(["src", "id"])
            .reset_index(drop=True)
        )
        outs.append(got)
    assert outs[0].equals(outs[1])
    got = outs[0]
    sizes = df.groupby("src").size()
    for src, cnt in got.groupby("src").size().items():
        assert cnt == min(15, sizes[src])
    # driver oracle: bottom-15 (priority, id) per stratum
    df2 = df.assign(pri=_priority(df["id"].to_numpy(), 4))
    want = (
        df2.sort_values(["pri", "id"])
        .groupby("src")
        .head(15)[["id", "src"]]
        .sort_values(["src", "id"])
        .reset_index(drop=True)
    )
    assert got[["id", "src"]].equals(want)


def test_deterministic_shuffle_is_permutation_and_invariant(ray_session):
    from kiezray.sample import deterministic_shuffle

    a = (
        deterministic_shuffle(_ds(5000, 4), "id", seed=3)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    b = (
        deterministic_shuffle(_ds(5000, 11), "id", seed=3)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # exact permutation: ranks are 1..n with no gaps
    assert sorted(a["rank"]) == list(range(1, 5001))
    # partition-invariant: the same seed gives the same permutation
    assert (a["rank"].to_numpy() == b["rank"].to_numpy()).all()
    # a different seed gives a different permutation
    c = (
        deterministic_shuffle(_ds(5000, 4), "id", seed=4)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert (c["rank"].to_numpy() != a["rank"].to_numpy()).any()
    # actually shuffled: rank order decorrelated from id order
    rho = np.corrcoef(a["id"].to_numpy(), a["rank"].to_numpy())[0, 1]
    assert abs(rho) < 0.1


def test_weighted_sample_bias_and_guards(ray_session):
    """Priority sampling keeps heavier rows more often: with weights
    1000 vs 1, essentially all sampled rows are heavy. Zero/negative
    weights raise."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray

    from kiezray.sample import weighted_sample

    ids = np.arange(2000, dtype=np.int64)
    w = np.where(ids < 1000, 1000.0, 1.0)
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": ids, "w": w})
    ).repartition(4)
    out = weighted_sample(ds, "doc_id", "w", n=100, seed=3).to_pandas()
    assert len(out) == 100
    assert (out["doc_id"] < 1000).mean() > 0.95
    # determinism under repartitioning
    out2 = weighted_sample(
        ray.data.from_pandas(pd.DataFrame({"doc_id": ids, "w": w}))
        .repartition(13),
        "doc_id", "w", n=100, seed=3,
    ).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    bad = ray.data.from_pandas(pd.DataFrame({"doc_id": ids[:5], "w": [1.0, 0.0, 2.0, 3.0, 4.0]}))
    with pytest.raises(Exception, match="weights > 0"):
        weighted_sample(bad, "doc_id", "w", n=2).to_pandas()


def test_keyed_hash_sample_mixture_and_guards(ray_session):
    import pandas as pd
    import pytest

    from kiezray.sample import keyed_hash_sample

    ids = np.arange(4000, dtype=np.int64)
    keys = np.where(ids % 2 == 0, "a", "b").astype(object)
    keys[ids % 10 == 9] = "other"
    df = pd.DataFrame({"doc_id": ids, "src": keys})
    ds = ray.data.from_pandas(df).repartition(4)
    out = keyed_hash_sample(
        ds, "src", "doc_id", {"a": 0.5, "b": 0.1}, default_fraction=0.0
    ).to_pandas()
    # per-key rates approach the targets; default drops unknown keys
    rate = out.groupby(out["src"]).size() / df.groupby("src").size()
    assert abs(rate.get("a") - 0.5) < 0.05
    assert abs(rate.get("b") - 0.1) < 0.05
    assert "other" not in set(out["src"])
    # partition-invariance: identical keep set at any partitioning
    out2 = keyed_hash_sample(
        ray.data.from_pandas(df).repartition(13),
        "src", "doc_id", {"a": 0.5, "b": 0.1}, default_fraction=0.0,
    ).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    # fraction 1.0 keeps a key WHOLE (the "keep wiki fully, downsample
    # the rest" mixing shape); out-of-range fractions fail loud
    full = keyed_hash_sample(
        ds, "src", "doc_id", {"a": 1.0, "b": 0.1}, default_fraction=0.0
    ).to_pandas()
    assert (full["src"] == "a").sum() == (df["src"] == "a").sum()
    assert "other" not in set(full["src"])
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        keyed_hash_sample(ds, "src", "doc_id", {"a": 1.5})

"""Routed per-shard search tier: each stage's actors hold only a SUBSET of
the index shards (per-actor residency < full set), queries stream past the
stage chain carrying their running top-k, and results are byte-identical
to the broadcast path."""

import numpy as np
import pyarrow as pa
import ray
import ray.data

from kiezray.arrowutil import matrix_to_fsl
from kiezray.search import SearchStage, knn_search, shard_refs_from_dataset


def _mk_ds(n=5000, d=16, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.permutation(n).astype(np.int64)
    vecs = rng.rand(n, d)
    tbl = pa.table(
        {
            "row_id": pa.array(ids, pa.int64()),
            "embedding": matrix_to_fsl(vecs, pa.float64()),
        }
    )
    return ray.data.from_arrow(tbl).repartition(4)


def _collect(ds):
    df = ds.to_pandas().sort_values("query_id").reset_index(drop=True)
    ids = np.stack(df["neigh_ids"].to_numpy())
    dists = np.stack(df["neigh_dists"].to_numpy())
    return df["query_id"].to_numpy(), ids, dists


def test_routed_matches_broadcast_byte_exact(ray_session):
    ds = _mk_ds()
    shards, total, max_id = shard_refs_from_dataset(ds, rows_per_shard=1024)
    assert len(shards) >= 4  # routing must actually engage
    q = _mk_ds(n=300, d=16, seed=9)
    broad = _collect(knn_search(q, shards, k=7))
    routed = _collect(knn_search(q, shards, k=7, shards_per_actor=2))
    np.testing.assert_array_equal(broad[0], routed[0])
    np.testing.assert_array_equal(broad[1], routed[1])
    np.testing.assert_array_equal(broad[2], routed[2])


def test_routed_exclude_self_and_keep_embedding(ray_session):
    ds = _mk_ds(n=2000)
    shards, _, _ = shard_refs_from_dataset(ds, rows_per_shard=512)
    broad = knn_search(
        ds, shards, k=5, exclude_self=True, keep_query_embedding=True
    ).to_pandas().sort_values("query_id").reset_index(drop=True)
    routed = knn_search(
        ds, shards, k=5, exclude_self=True, keep_query_embedding=True,
        shards_per_actor=1,
    ).to_pandas().sort_values("query_id").reset_index(drop=True)
    assert "embedding" in routed.columns
    np.testing.assert_array_equal(
        np.stack(broad["neigh_ids"]), np.stack(routed["neigh_ids"])
    )
    # no query ever returns itself
    for qid, nids in zip(routed["query_id"], routed["neigh_ids"]):
        assert qid not in set(nids)


def test_per_actor_shard_residency_is_partial(ray_session):
    """The routed tier's defining property: a stage instance holds only
    its group of shards, strictly fewer than the full set."""
    ds = _mk_ds(n=4096)
    shards, _, _ = shard_refs_from_dataset(ds, rows_per_shard=1024)
    n_shards = len(shards)
    assert n_shards >= 3
    stage = SearchStage(shards[:2], k=5)  # what one routed actor receives
    assert len(stage.indexes) == 2 < n_shards
    # chain two partial stages by hand == one full stage
    full = SearchStage(shards, k=5)
    s1 = SearchStage(shards[:2], k=5, chain_output=True)
    s2 = SearchStage(shards[2:], k=5)
    batch = pa.concat_tables(
        [ray.get(r) for r in shards[:1]]
    ).rename_columns(["row_id", "embedding"])
    want = full(batch)
    got = s2(s1(batch))
    assert want.equals(got)


def test_kiez_routed_matches_broadcast(ray_session, source_target):
    from kiezray import Kiez

    src, tgt = source_target
    a = Kiez(n_candidates=10, algorithm="exact", hubness="csls")
    a.fit(src, tgt)
    da, ia = a.kneighbors(5)
    b = Kiez(
        n_candidates=10, algorithm="exact", hubness="csls",
        rows_per_shard=16, route_groups=2,  # 50-row target -> 4 shards, 2 stages
    )
    b.fit(src, tgt)
    db, ib = b.kneighbors(5)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(da, db, rtol=0, atol=0)


def test_kwarg_token_numpy_scalars_and_refusal():
    """Code-review r5: numpy scalar kwargs (np.int64 etc. — common when a
    kwarg comes from a numpy computation or a parquet read) must digest
    content-wise for the task-pool stage cache, not raise; arbitrary
    objects still refuse (repr() collisions could serve a stale stage)."""
    import pytest

    from kiezray.search import _CachedSearchStage

    tok = _CachedSearchStage._kwarg_token
    # content-stable and distinct across values / dtypes
    assert tok(np.int64(32)) == tok(np.int64(32))
    assert tok(np.int64(32)) != tok(np.int64(33))
    assert tok(np.int64(1)) != tok(np.uint64(1))
    assert tok(np.bool_(True)) == tok(np.bool_(True))
    assert tok(np.float32(0.5)) != tok(np.float64(0.5))
    # nested inside containers too
    assert tok([np.int64(1), np.int64(2)]) == tok([np.int64(1), np.int64(2)])
    # plain builtins keep working
    assert tok(5) == tok(5) and tok("a") != tok("b")
    # opaque objects are refused loudly, never keyed by repr()
    class Opaque:
        pass

    with pytest.raises(TypeError):
        tok(Opaque())

"""User-extension surface: custom rerank kernels and custom indexes
(reference parity with subclassing HubnessReduction / NNAlgorithm,
docs/source/using_your_own.rst)."""

import numpy as np
import pytest

from kiezray import Kiez
from kiezray.index import ExactIndex, register_index
from kiezray.rerank import CUSTOM_KERNELS, register_hubness


def rank_mean_kernel(D, I, stats):
    """Toy custom hubness reduction: distance scaled by the candidate's
    mean t->s distance (derived from the full lists custom kernels get)."""
    t2s_mean = np.nanmean(stats.t2s_dist, axis=1)
    return D / (1e-9 + t2s_mean[I])


class JitteredExact(ExactIndex):
    """Custom index: exact search (identity subclass, registry test)."""


@pytest.fixture(autouse=True)
def _clean_registry():
    yield
    CUSTOM_KERNELS.pop("rankmean", None)
    from kiezray.index import INDEX_REGISTRY

    INDEX_REGISTRY.pop("jittered", None)


def test_custom_hubness_kernel(source_target):
    register_hubness("rankmean", rank_mean_kernel)
    source, target = source_target
    kz = Kiez(n_candidates=8, algorithm="exact", hubness="rankmean")
    kz.fit(source, target)
    dist, ind = kz.kneighbors(5)
    assert dist.shape == (20, 5)
    # oracle: straight-line computation with the same kernel
    from .oracle import exact_knn

    D, I = exact_knn(source, target, 8)
    t2s_d, t2s_i = exact_knn(target, source, 8)
    t2s_mean = t2s_d.mean(axis=1)
    sec = D / (1e-9 + t2s_mean[I])
    from .oracle import sort_topk

    ed, ei = sort_topk(sec, I, 5)
    np.testing.assert_array_equal(ind, ei)
    np.testing.assert_allclose(dist, ed, atol=1e-6)


def test_custom_hubness_name_collision():
    with pytest.raises(ValueError, match="built-in"):
        register_hubness("csls", rank_mean_kernel)


def test_custom_index(source_target):
    register_index("jittered", JitteredExact)
    source, target = source_target
    kz = Kiez(n_candidates=8, algorithm="jittered", hubness="CSLS")
    kz.fit(source, target)
    d1, i1 = kz.kneighbors(5)
    base = Kiez(n_candidates=8, algorithm="exact", hubness="CSLS")
    base.fit(source, target)
    d2, i2 = base.kneighbors(5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, atol=1e-12)


def test_register_index_validates():
    with pytest.raises(TypeError, match="build"):
        register_index("bad", object)


def test_sorted_neighborhood_pairs_bucket_boundaries():
    """Tiny bucket size forces overlap copies across every boundary; the
    pair set must equal the brute-force windowed pairs of the sorted
    order, exactly once each."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from kiezray.block import sorted_neighborhood_pairs

    rng = np.random.RandomState(6)
    n = 300
    texts = ["".join(rng.choice(list("abcd"), 5)) + f" tail{i}"
             for i in range(n)]
    ids = rng.permutation(n) * 7  # non-contiguous ids
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts)})
    w = 3
    got = sorted_neighborhood_pairs(
        ray.data.from_arrow(t).repartition(5), "doc_id", "text",
        window=w, prefix_len=8, bucket_rows=16,
    ).to_pandas()
    df = pd.DataFrame({"doc_id": ids,
                       "pfx": [s[:8].lower() for s in texts]})
    df = df.sort_values(["pfx", "doc_id"], kind="mergesort").reset_index(
        drop=True
    )
    want = set()
    for i in range(n):
        for d in range(1, w + 1):
            if i + d < n:
                want.add((df["doc_id"][i], df["doc_id"][i + d], d))
    assert set(zip(got["a_id"], got["b_id"], got["gap"])) == want
    assert len(got) == len(want)  # no duplicate emission

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

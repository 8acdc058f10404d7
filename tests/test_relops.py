"""grouped_topk: string keys, ties, and k-larger-than-group edge cases."""

import numpy as np
import pyarrow as pa
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

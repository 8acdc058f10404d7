"""Data loading: OpenEA-style embedding directories and table helpers.

Reimplements the reference loader semantics
(/root/reference/kiez/io/data_loading.py:75-99): an embedding matrix file
plus two ``kg*_ent_ids`` TSV maps and an ``ent_links`` TSV, split into
per-KG matrices with link ids remapped to row positions. In the Ray
engine entity ids are carried as a column, so the positional remap exists
only for reference-compatible consumers of ``from_openea``.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def _read_kg_ids(path: str) -> dict[int, str]:
    out: dict[int, str] = {}
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 2:
                out[int(parts[1])] = parts[0]
    return out


def _read_ent_links(path: str) -> list[tuple[str, str]]:
    links = []
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 2:
                links.append((parts[0], parts[1]))
    return links


def from_openea(
    emb_dir_path: str, kg_path: str
) -> tuple[np.ndarray, np.ndarray, dict, dict, dict]:
    """(emb1, emb2, kg1_ids, kg2_ids, links) — reference-compatible shapes.

    kg*_ids map row position (within the split matrix) -> entity name;
    links map source row position -> target row position.
    """
    emb = np.load(os.path.join(emb_dir_path, "ent_embeds.npy"))
    ids1 = _read_kg_ids(os.path.join(kg_path, "kg1_ent_ids"))
    ids2 = _read_kg_ids(os.path.join(kg_path, "kg2_ent_ids"))
    links = _read_ent_links(os.path.join(kg_path, "ent_links"))

    rows1 = sorted(ids1)
    rows2 = sorted(ids2)
    emb1 = emb[rows1]
    emb2 = emb[rows2]
    pos1 = {ids1[r]: i for i, r in enumerate(rows1)}
    pos2 = {ids2[r]: i for i, r in enumerate(rows2)}
    new_ids1 = {i: ids1[r] for i, r in enumerate(rows1)}
    new_ids2 = {i: ids2[r] for i, r in enumerate(rows2)}
    link_pos = {
        pos1[a]: pos2[b] for a, b in links if a in pos1 and b in pos2
    }
    return emb1, emb2, new_ids1, new_ids2, link_pos


def openea_to_datasets(emb_dir_path: str, kg_path: str):
    """Ray-native variant: two Datasets (row_id, entity, embedding) plus a
    gold-links Dataset (source_id, target_id) keyed by row id."""
    import ray.data

    from .arrowutil import matrix_to_fsl

    emb1, emb2, ids1, ids2, links = from_openea(emb_dir_path, kg_path)

    def make(emb, ids):
        tbl = pa.table(
            {
                "row_id": pa.array(np.arange(len(emb), dtype=np.int64)),
                "entity": pa.array([ids[i] for i in range(len(emb))]),
                "embedding": matrix_to_fsl(
                    np.ascontiguousarray(emb, dtype=np.float64), pa.float64()
                ),
            }
        )
        return ray.data.from_arrow(tbl)

    gold = ray.data.from_arrow(
        pa.table(
            {
                "source_id": pa.array(sorted(links), pa.int64()),
                "target_id": pa.array(
                    [links[k] for k in sorted(links)], pa.int64()
                ),
            }
        )
    )
    return make(emb1, ids1), make(emb2, ids2), gold


def read_docs(path: str):
    """Read a doc table: Lance when the reader is available, JSON/JSONL
    (the common training-data interchange format), or parquet
    (fixtures/tests use parquet)."""
    import ray.data

    if path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions")):
        try:
            return ray.data.read_lance(path)
        except (ImportError, AttributeError) as e:  # lance not installed here
            raise ImportError(
                "lance reader unavailable in this environment"
            ) from e
    if path.endswith((".jsonl", ".json", ".ndjson")):
        return ray.data.read_json(path)
    # only .parquet files: config/manifest files may share the directory
    return ray.data.read_parquet(path, file_extensions=["parquet"])


def write_bucketed(
    ds: "ray.data.Dataset",
    path: str,
    key_col: str,
    num_buckets: int = 64,
) -> None:
    """Hash-bucketed partitioned parquet sink (`path/bucket=<b>/...`).

    The resumable, shuffle-avoiding output shape for a 100 TB run:
    (a) output is many files across ``num_buckets`` directories, never
    one giant file — a failed downstream consumer can skip finished
    buckets; (b) the bucket id uses the SAME key-hash as the engine's
    co-partitioned operators (``relops._part_of``), so a later
    ``hash_join`` / grouped op on ``key_col`` can process one bucket at
    a time with co-located keys instead of re-shuffling the world.
    Routing is a stateless per-batch column append — the write itself
    stays streaming (each task writes its own files under the bucket
    directories)."""
    import pyarrow as pa  # noqa: F811 (module-level import also exists)

    from .relops import _part_of

    def add_bucket(t: "pa.Table") -> "pa.Table":
        return t.append_column("bucket", _part_of(t[key_col], num_buckets))

    ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        path, partition_cols=["bucket"]
    )


def read_bucketed(
    path: str,
    buckets: "list[int] | None" = None,
):
    """Read a ``write_bucketed`` layout; ``buckets`` selects a subset of
    bucket directories (resume / bucket-at-a-time processing). The
    hive-partition ``bucket`` column is materialized back as int32."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    if buckets is None:
        ds = ray.data.read_parquet(path, file_extensions=["parquet"])
    else:
        dirs = [os.path.join(path, f"bucket={b}") for b in buckets]
        missing = [d for d in dirs if not os.path.isdir(d)]
        if missing:
            raise FileNotFoundError(f"missing bucket dirs: {missing}")
        ds = ray.data.read_parquet(dirs, file_extensions=["parquet"])

    def fix_bucket(t: "pa.Table") -> "pa.Table":
        if "bucket" not in t.column_names:
            return t
        i = t.column_names.index("bucket")
        return t.set_column(
            i, "bucket", pc.cast(t["bucket"], pa.int32())
        )

    return ds.map_batches(fix_bucket, batch_format="pyarrow")

"""Distributed kNN search stages (Ray Data map_batches over shard indexes).

Replaces the reference's joblib query sharding
(/root/reference/kiez/neighbors/neighbor_algorithm_base.py:139-166) with
Ray Data's streaming executor, and the single in-process index with a set
of per-shard indexes:

 - the *indexed* side is cut into shards built by WORKER tasks and
   materialized as object-store blocks (the driver only holds the refs);
   every search actor builds its shard indexes once in ``__init__`` from
   zero-copy reads — the broadcast-small-side pattern, no per-batch
   reshipping and no driver-side data pass;
 - the *query* side streams through ``map_batches(SearchStage, ...)`` as
   zero-copy Arrow batches; each batch is searched against every shard and
   the per-shard top-k are merged with a vectorized k-way merge on the raw
   primary distance (merge BEFORE any hubness transform, preserving the
   reference's candidates-then-transform order, base.py:89-105).

At cluster scale the shard list is the unit of data parallelism for the
index side: shards live in the object store and are fetched at most once
per node. When the indexed side outgrows broadcast, the blocking stage
(kiezray.block) bounds each searchable universe to one blocking partition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .arrowutil import emb_to_matrix, matrix_to_fsl, matrix_to_list
from .index import make_index


def shard_refs_from_dataset(
    ds: "ray.data.Dataset",
    id_col: str = "row_id",
    emb_col: str = "embedding",
    rows_per_shard: int = 65536,
    dtype=np.float64,
) -> tuple[list["ray.ObjectRef"], int, int]:
    """Materialize the indexed side into object-store shards.

    Returns (refs, total_rows, max_id). Each ref holds ``(ids int64 (s,),
    vecs float64 (s, d))``. Ids need not be dense. The indexed side of a
    search must fit the cluster's aggregate object store — at 100 TB total
    data this is the per-block target universe produced by blocking, not
    the whole corpus.
    """
    pa_dtype = pa.from_numpy_dtype(np.dtype(dtype))

    def norm(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = emb_to_matrix(t[emb_col]).astype(dtype)
        order = np.argsort(ids, kind="stable")  # id-ordered shards =>
        return pa.table(  # shard-invariant tie-breaks downstream
            {
                "ids": pa.array(ids[order], pa.int64()),
                "vecs": matrix_to_fsl(
                    np.ascontiguousarray(vecs[order]), pa_dtype
                ),
            }
        )

    # shard assembly runs in WORKER tasks; the driver only collects the
    # block refs of the materialized normalized dataset (never the data).
    # Holding the refs keeps the plasma objects alive; actors read them
    # zero-copy via shard_arrays().
    mat = (
        ds.select_columns([id_col, emb_col])
        .map_batches(
            norm,
            batch_size=rows_per_shard,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    refs = mat.to_arrow_refs()
    total = mat.count()  # metadata only, no execution
    if total == 0:
        return [], 0, -1
    # max id per shard via pc.max — NOT the last element: Ray's output
    # buffer may coalesce several per-batch-sorted tables into one block,
    # so a block is not guaranteed globally id-sorted (shard_arrays
    # re-sorts on load for the same reason). Tiny parallel zero-copy tasks.
    maxes = ray.get([_shard_max_id.remote(r) for r in refs])
    return refs, total, max(maxes)


@ray.remote(num_cpus=0)
def _shard_max_id(block: pa.Table) -> int:
    import pyarrow.compute as pc

    return int(pc.max(block["ids"]).as_py()) if len(block) else -1


def shard_arrays(obj) -> tuple[np.ndarray, np.ndarray]:
    """Normalize a fetched shard object to sorted ``(ids int64, vecs (s, d))``.

    Accepts the arrow block produced by ``shard_refs_from_dataset`` (read
    zero-copy from the object store) or a plain ``(ids, vecs)`` tuple for
    custom callers. Ray's output buffer can coalesce multiple
    per-batch-sorted tables into one block, so global id order within a
    block is NOT guaranteed; downstream consumers (``ShardGather.take``'s
    searchsorted, id tie-breaks) require it, so sortedness is checked
    (O(s)) and restored here when violated.
    """
    if isinstance(obj, tuple):
        ids, vecs = obj
    else:
        ids = obj["ids"].to_numpy(zero_copy_only=False)
        vecs = emb_to_matrix(obj["vecs"])
    if len(ids) > 1 and not np.all(ids[:-1] <= ids[1:]):
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        vecs = np.ascontiguousarray(vecs[order])
    return ids, vecs


class ShardGather:
    """Vectorized id -> vector gather over the broadcast object-store shards.

    Shards are id-sorted (``shard_refs_from_dataset``), so each lookup is a
    ``searchsorted`` per shard — no dense (max_id, d) matrix is ever built
    (the driver-OOM pattern this replaces). The shard arrays live in the
    object store and are read zero-copy by every actor on a node.
    """

    def __init__(self, shard_refs: list):
        self.shards = [shard_arrays(ray.get(r)) for r in shard_refs]
        self.dim = self.shards[0][1].shape[1] if self.shards else 0

    def take(self, ids: np.ndarray) -> np.ndarray:
        """(N,) int64 -> (N, d) float; raises KeyError on unknown ids."""
        flat = np.ascontiguousarray(ids, dtype=np.int64).ravel()
        out = np.empty((flat.size, self.dim), dtype=np.float64)
        found = np.zeros(flat.size, dtype=bool)
        for sids, vecs in self.shards:
            pos = np.searchsorted(sids, flat)
            pos_c = np.minimum(pos, len(sids) - 1)
            mask = sids[pos_c] == flat
            out[mask] = vecs[pos_c[mask]]
            found |= mask
        if not found.all():
            missing = flat[~found][:5]
            raise KeyError(f"ids not present in shards: {missing}")
        return out


class SearchStage:
    """Callable-class stage for ``map_batches``: per-shard index built once
    per actor in ``__init__``, vectorized search + k-way merge per batch.

    In **routed mode** (``knn_search(..., shards_per_actor=...)``) each
    stage instance holds only a SUBSET of the shards, and incoming
    ``neigh_ids``/``neigh_dists`` columns (the running top-k from earlier
    stages in the chain) join the merge — the final global top-k is the
    k-way merge of per-shard top-ks, so truncating to k between stages is
    lossless. Merging happens on the raw primary distance BEFORE any
    hubness transform, preserving the reference's candidates-then-
    transform order (kiez/hubness_reduction/base.py:89-105)."""

    def __init__(
        self,
        shard_refs: list,
        k: int,
        algorithm: str = "exact",
        algorithm_kwargs: dict | None = None,
        id_col: str = "row_id",
        emb_col: str = "embedding",
        exclude_self: bool = False,
        keep_query_embedding: bool = False,
        chain_output: bool = False,
    ):
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col
        self.exclude_self = exclude_self
        self.keep_query_embedding = keep_query_embedding
        self.chain_output = chain_output
        self.indexes = []
        for ref in shard_refs:
            ids, vecs = shard_arrays(ray.get(ref))
            idx = make_index(algorithm, **(algorithm_kwargs or {}))
            idx.build(ids, vecs)
            self.indexes.append(idx)

    def __call__(self, batch: pa.Table) -> pa.Table:
        q_ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        q = emb_to_matrix(batch[self.emb_col]).astype(np.float64)
        excl = q_ids if self.exclude_self else None
        dists = []
        idss = []
        if "neigh_ids" in batch.column_names:  # routed: running top-k in
            ic = batch["neigh_ids"].combine_chunks()
            dc = batch["neigh_dists"].combine_chunks()
            kk = len(ic[0]) if len(ic) else 0
            idss.append(
                ic.values.to_numpy(zero_copy_only=False).reshape(len(q_ids), kk)
            )
            dists.append(
                dc.values.to_numpy(zero_copy_only=False).reshape(len(q_ids), kk)
            )
        for idx in self.indexes:
            d, i = idx.search(q, self.k, exclude_ids=excl)
            dists.append(d)
            idss.append(i)
        if len(dists) == 1:
            dist, ids = dists[0], idss[0]
        else:
            alld = np.concatenate(dists, axis=1)
            alli = np.concatenate(idss, axis=1)
            # merge on primary distance, id tie-break; NaN padding sorts last
            key = np.where(np.isnan(alld), np.inf, alld)
            order = np.lexsort((alli, key), axis=-1)[:, : self.k]
            dist = np.take_along_axis(alld, order, axis=1)
            ids = np.take_along_axis(alli, order, axis=1)
        if self.chain_output or self.keep_query_embedding:
            emb_out = (
                batch[self.emb_col].combine_chunks()
                if isinstance(batch[self.emb_col], pa.ChunkedArray)
                else batch[self.emb_col]
            )
        if self.chain_output:
            # intermediate routed stage: emit under the INPUT column names
            # so the next SearchStage in the chain reads them directly
            return pa.table(
                {
                    self.id_col: pa.array(q_ids, type=pa.int64()),
                    self.emb_col: emb_out,
                    "neigh_ids": matrix_to_list(ids, pa.int64()),
                    "neigh_dists": matrix_to_list(dist, pa.float64()),
                }
            )
        cols = {
            "query_id": pa.array(q_ids, type=pa.int64()),
            "neigh_ids": matrix_to_list(ids, pa.int64()),
            "neigh_dists": matrix_to_list(dist, pa.float64()),
        }
        if self.keep_query_embedding:
            cols["embedding"] = emb_out
        return pa.table(cols)


# per-worker-process LRU of built SearchStages, keyed by (shard refs,
# search params): stages whose per-"actor" setup is just a zero-copy
# plasma read (the exact index stores array views) run in the shared
# TASK pool — a pickled _CachedSearchStage instance — instead of paying
# a fresh actor-pool spin-up per query. Capped so long sessions running
# many different searches release their plasma pins.
_STAGE_CACHE: dict = {}
_STAGE_CACHE_CAP = 4


class _CachedSearchStage:
    @staticmethod
    def _kwarg_token(v) -> str:
        # repr() is not injective (large numpy arrays elide with '...',
        # default-object reprs are id-based and reusable after gc) — a
        # collision would silently serve an index built for different
        # parameters. Digest array-likes by dtype+shape+bytes instead.
        if isinstance(v, np.ndarray):
            import hashlib

            a = np.ascontiguousarray(v)
            return (
                f"nd:{a.dtype}:{a.shape}:"
                f"{hashlib.sha1(a.tobytes()).hexdigest()}"
            )
        if isinstance(v, (list, tuple)):
            inner = ",".join(_CachedSearchStage._kwarg_token(x) for x in v)
            return f"{type(v).__name__}:[{inner}]"
        if isinstance(v, np.generic):
            # numpy scalars (np.int64 / np.uint64 / np.bool_) are not
            # subclasses of the Python builtins but are content-stable;
            # digest by dtype + value so they never hit the refusal below
            return f"np:{v.dtype}:{v.item()!r}"
        if v is None or isinstance(v, (bool, int, float, str, bytes)):
            return repr(v)
        # refuse to key by repr(): default object reprs are id-based and
        # addresses are reused after gc, so two distinct kwarg objects
        # could collide and serve a stale cached SearchStage. knn_search
        # catches this in auto mode and falls back to stage_mode="actor"
        # (no cross-call cache to poison).
        raise TypeError(
            "algorithm_kwargs value of type "
            f"{type(v).__module__}.{type(v).__qualname__} cannot be "
            "digested content-wise for the task-pool stage cache; use "
            "stage_mode='actor' or pass scalars/ndarrays/lists"
        )

    def __init__(self, ctor_kwargs: dict):
        self.ctor_kwargs = ctor_kwargs
        ak = ctor_kwargs.get("algorithm_kwargs") or {}
        self.key = (
            tuple(r.hex() for r in ctor_kwargs["shard_refs"]),
            ctor_kwargs.get("algorithm", "exact"),
            tuple(
                sorted((k, self._kwarg_token(v)) for k, v in ak.items())
            ),
            ctor_kwargs["k"],
            ctor_kwargs.get("exclude_self", False),
            ctor_kwargs.get("keep_query_embedding", False),
            ctor_kwargs.get("chain_output", False),
            ctor_kwargs.get("id_col"),
            ctor_kwargs.get("emb_col"),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        stage = _STAGE_CACHE.pop(self.key, None)
        if stage is None:
            stage = SearchStage(**self.ctor_kwargs)
            while len(_STAGE_CACHE) >= _STAGE_CACHE_CAP:
                _STAGE_CACHE.pop(next(iter(_STAGE_CACHE)))
        _STAGE_CACHE[self.key] = stage  # re-insert = LRU touch
        return stage(batch)


def knn_search(
    query_ds: "ray.data.Dataset",
    shard_refs: list,
    k: int,
    algorithm: str = "exact",
    algorithm_kwargs: dict | None = None,
    id_col: str = "row_id",
    emb_col: str = "embedding",
    exclude_self: bool = False,
    keep_query_embedding: bool = False,
    batch_size: int = 4096,
    concurrency: int | tuple | None = None,
    shards_per_actor: int | None = None,
    route_groups: int | None = None,
    stage_mode: str = "auto",
) -> "ray.data.Dataset":
    """query Dataset -> (query_id, neigh_ids, neigh_dists[, embedding]).

    ``shards_per_actor=None`` (default) broadcasts every shard into every
    search actor — right when the indexed side fits one node (e.g. the
    blocking-bounded ER universe). **Routed mode** (``shards_per_actor=g``)
    chains one ``map_batches`` stage per group of ``g`` shards; each
    stage's actors hold ONLY their group (per-actor residency = g/S of
    the index), queries stream past every stage carrying their running
    top-k, and the merge on raw primary distance is identical to the
    broadcast path — so results are byte-identical while no single actor
    ever materializes the whole indexed side. This is the 100-TB path for
    a global (unblocked) search; stages pipeline, so wall-clock stays
    GEMM-dominated.

    ``route_groups=g`` is the scale-stable alternative: split the shard
    list into exactly ``g`` stage groups (per-actor residency = 1/g of
    the index) regardless of shard count, so the chain length — and the
    per-stage actor-pool overhead — stays constant as the corpus grows.
    Takes precedence over ``shards_per_actor``.
    """
    fn_kwargs = dict(
        k=k,
        algorithm=algorithm,
        algorithm_kwargs=algorithm_kwargs,
        id_col=id_col,
        emb_col=emb_col,
        exclude_self=exclude_self,
    )
    if route_groups is not None and route_groups > 1:
        g = min(route_groups, len(shard_refs))
        bounds = np.linspace(0, len(shard_refs), g + 1).astype(int)
        groups = [
            list(shard_refs[a:b]) for a, b in zip(bounds[:-1], bounds[1:]) if b > a
        ]
    elif (
        shards_per_actor is None
        or shards_per_actor <= 0
        or shards_per_actor >= len(shard_refs)
    ):
        groups = [list(shard_refs)]
    else:
        groups = [
            list(shard_refs[i : i + shards_per_actor])
            for i in range(0, len(shard_refs), shards_per_actor)
        ]
    # "task" mode (auto-picked for the exact index, whose per-stage setup
    # is a zero-copy plasma read): ship a pickled _CachedSearchStage into
    # the shared task pool with a per-process LRU — no actor-pool spin-up
    # per query. Heavy-build indexes (graph / pq / rp-forest) keep the
    # actor pool so the build is paid once per actor, not once per worker
    # process.
    auto_mode = stage_mode == "auto"
    if auto_mode:
        stage_mode = "task" if algorithm in ("exact", "sklearn") else "actor"
    out = query_ds.select_columns([id_col, emb_col])
    for gi, group in enumerate(groups):
        last = gi == len(groups) - 1
        ctor = dict(
            fn_kwargs,
            shard_refs=group,
            keep_query_embedding=keep_query_embedding,
            chain_output=not last,
        )
        if stage_mode == "task":
            try:
                stage = _CachedSearchStage(ctor)
            except TypeError:
                if not auto_mode:
                    raise  # explicit stage_mode="task": fail loud
                # un-digestable algorithm_kwargs value: bypass the
                # cross-call cache rather than risk a repr() collision
                stage_mode = "actor"
        if stage_mode == "task":
            cap = (
                max(concurrency)
                if isinstance(concurrency, tuple)
                else concurrency
            )
            out = out.map_batches(
                stage,
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=cap,
                zero_copy_batch=True,
            )
        else:
            out = out.map_batches(
                SearchStage,
                fn_constructor_kwargs=ctor,
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=concurrency or (1, 8),
                zero_copy_batch=True,
            )
    return out


def neighbors_to_matrices(
    result_ds_or_table, n_rows: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Collect a (query_id, neigh_ids, neigh_dists) result into dense
    (dist, ind) matrices ordered by query_id — the reference's return shape
    (kiez/kiez.py:217-223). Driver-side; only for conformance-scale data."""
    tbl = result_ds_or_table
    if hasattr(tbl, "to_arrow_refs"):  # Dataset
        tbl = pa.concat_tables(ray.get(tbl.to_arrow_refs()))
    q = tbl["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ids_col = tbl["neigh_ids"].combine_chunks()
    d_col = tbl["neigh_dists"].combine_chunks()
    k = len(ids_col[0]) if len(ids_col) else 0
    ids = ids_col.values.to_numpy(zero_copy_only=False).reshape(len(q), k)
    dists = d_col.values.to_numpy(zero_copy_only=False).reshape(len(q), k)
    n = n_rows if n_rows is not None else (q.max() + 1 if len(q) else 0)
    out_i = np.full((n, k), -1, dtype=np.int64)
    out_d = np.full((n, k), np.nan)
    out_i[q] = ids
    out_d[q] = dists
    return out_d, out_i

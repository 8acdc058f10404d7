"""Kiez facade: hubness-reduced kNN entity alignment on Ray Data.

API mirrors the reference ``kiez.Kiez`` (/root/reference/kiez/kiez.py:98-223)
— ``Kiez(n_candidates, algorithm, hubness, ...).fit(source, target)
.kneighbors(k)`` — but execution is a Ray Data pipeline:

  source/target tables -> object-store shards (worker-built, driver
  holds only refs) -> ``map_batches(SearchStage)`` streaming query
  batches (s->t and the t->s calibration pass) -> per-target calibration
  stats (worker-reduced, broadcast) -> ``map_batches(RerankStage)``
  vectorized hubness kernels + per-row top-k.

Semantics conformance notes (checked against the reference tests' shapes):
 - the t->s calibration pass passes the query explicitly, so it never
   excludes self even when source is target (base.py:37-42 +
   neighbor_algorithm_base.py:121 ``is_self_querying = query is None and
   source_equals_target``);
 - the main s->t query excludes self iff ``fit`` got no target;
 - k is clamped to n_candidates with a warning (base.py:56-70) and
   n_candidates to the indexed-side size (neighbor_algorithm_base.py:98-110);
 - DisSimLocal's metric gate and squared-overriding follow dis_sim.py:44-61,
   and its global min-shift is a global aggregate + finalize pass.
"""

from __future__ import annotations

import json
import warnings
from pathlib import Path

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .arrowutil import (
    binary_to_matrix,
    emb_to_matrix,
    matrix_to_binary,
    matrix_to_fsl,
    matrix_to_list,
)
from .rerank import (
    CalibrationStats,
    apply_kernel,
    dsl_finalize,
    topk_sorted,
)
from .search import (
    ShardGather,
    knn_search,
    neighbors_to_matrices,
    shard_refs_from_dataset,
)
from .stats import compute_calibration_stats

_HUBNESS_ALIASES = {
    None: "none",
    "none": "none",
    "nohubnessreduction": "none",
    "nohubness": "none",
    "csls": "csls",
    "localscaling": "ls",
    "ls": "ls",
    "nicdm": "nicdm",
    "mutualproximity": "mp_normal",
    "mp": "mp_normal",
    "mp_normal": "mp_normal",
    "mp_empiric": "mp_empiric",
    "dissimlocal": "dsl",
    "dsl": "dsl",
}

_ALGORITHM_ALIASES = {
    None: "exact",
    "sklearnnn": "exact",
    "exact": "exact",
    "bruteforce": "exact",
    "faiss": "faiss",
    "ivf": "ivf",
    "lsh": "lsh",
    "graph": "graph",
    "hnsw": "graph",
    "ivfpq": "ivfpq",
    "pq": "ivfpq",
    # graph/tree ANN backends of the reference map onto the graph index
    # (same greedy-routing regime; capability parity, not a port)
    "nmslib": "graph",
    "nng": "graph",
    "annoy": "rpforest",
    "rpforest": "rpforest",
}

# Reference parameter-surface fidelity: the aliased backends accept the
# reference's own kwarg names (nmslib.py:59-69 M/ef_construction/
# post_processing, nng.py:89-99 edge sizes, random_projection_trees.py:66-75
# n_trees/search_k) and translate them onto the closest GraphIndex knobs —
# a reference-config user's algorithm_kwargs must construct, not TypeError.
# value None = accepted and dropped (no GraphIndex analog).
_BACKEND_KWARG_MAP = {
    "nmslib": {
        "M": "m_links",
        "ef_construction": "ef_search",
        "efConstruction": "ef_search",
        "post": None,
        "post_processing": None,
        "verbose": None,
    },
    "nng": {
        "edge_size_for_creation": "m_links",
        "edge_size_for_search": "ef_search",
        "epsilon": None,
        "index_dir": None,
        "verbose": None,
    },
    # annoy now lands on the genuine tree-ensemble family (RpForestIndex)
    # and its native kwargs pass through 1:1
    "annoy": {
        "n_trees": "n_trees",
        "search_k": "search_k",
        "mmap_dir": None,
        "verbose": None,
    },
}


def _translate_backend_kwargs(algo_name, kwargs: dict) -> dict:
    """Map reference backend kwargs onto GraphIndex's parameter names.

    Explicit GraphIndex-native keys win over translated ones; nmslib's
    ``method`` must be 'hnsw' (the only method the reference supports,
    nmslib.py:71-77)."""
    key = algo_name.replace("_", "").lower() if isinstance(algo_name, str) else None
    # the map keys intentionally keep underscores (reference spelling)
    name = algo_name.lower() if isinstance(algo_name, str) else ""
    table = _BACKEND_KWARG_MAP.get(name) or _BACKEND_KWARG_MAP.get(key or "")
    if table is None:
        return kwargs
    native = {k: v for k, v in kwargs.items() if k not in table and k != "method"}
    out = {}
    for k, v in kwargs.items():
        if k == "method":
            if str(v).lower() != "hnsw":
                raise ValueError(
                    f"nmslib backend only supports method='hnsw', got {v!r}"
                )
            continue
        if k in table:
            tgt = table[k]
            if tgt is None or v is None:
                continue
            if k == "search_k" and int(v) <= 0:
                continue  # reference sentinel default (-1)
            if tgt not in native:
                out[tgt] = v
    out.update(native)
    return out


def _resolve_hubness(hubness, hubness_kwargs: dict | None) -> tuple[str, dict]:
    from .hubness import HubnessReduction
    from .rerank import CUSTOM_KERNELS

    kwargs = dict(hubness_kwargs or {})
    # reference calling convention: a HubnessReduction class or instance
    # (kiez.py:103 HintOrType) — instances carry their own kwargs
    if isinstance(hubness, type) and issubclass(hubness, HubnessReduction):
        hubness = hubness()
    if isinstance(hubness, HubnessReduction):
        merged = dict(hubness.kwargs)
        merged.update(kwargs)
        kwargs = merged
        hubness = hubness.method
    if isinstance(hubness, str) and hubness.lower() in CUSTOM_KERNELS:
        return hubness.lower(), kwargs
    if isinstance(hubness, str):
        key = hubness.replace("_", "").replace("-", "").lower()
        key = {"mpnormal": "mp_normal", "mpempiric": "mp_empiric"}.get(key, key)
    else:
        key = hubness
    if key not in _HUBNESS_ALIASES and key not in ("mp_normal", "mp_empiric"):
        raise ValueError(f"Unknown hubness method: {hubness!r}")
    method = _HUBNESS_ALIASES.get(key, key)
    m = kwargs.pop("method", None)
    if m is not None:
        m = m.lower()
        if method == "ls":
            if m not in ("ls", "standard", "nicdm"):
                raise ValueError(f"Invalid method {m}. Try 'ls' or 'nicdm'.")
            method = "nicdm" if m == "nicdm" else "ls"
        elif method in ("mp_normal", "mp_empiric"):
            if m in ("normal", "gaussi"):
                method = "mp_normal"
            elif m in ("empiric", "exact"):
                method = "mp_empiric"
            else:
                raise ValueError(
                    f'Mutual proximity method "{m}" not recognized. Try'
                    ' "normal" or "empiric".'
                )
    return method, kwargs


class RerankStage:
    """map_batches stage applying a hubness kernel + per-row top-k.

    Calibration stats arrive as one broadcast object ref (read once per
    actor). For DisSimLocal the stage emits pre-shift full-width distances
    plus a per-row min for the global aggregate (two-phase finalize).
    """

    def __init__(
        self,
        method: str,
        stats_ref,
        k: int,
        target_shards: list | None = None,
        dsl_first_phase: bool = False,
        kernel_fn=None,
    ):
        self.method = method
        self.stats: CalibrationStats = ray.get(stats_ref)
        self.k = k
        # dsl gathers candidate target vectors per batch from the broadcast
        # shards (searchsorted) — no dense (max_id, d) matrix anywhere
        self.gather = ShardGather(target_shards) if target_shards else None
        self.dsl_first_phase = dsl_first_phase
        self.kernel_fn = kernel_fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        q = batch["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids_col = batch["neigh_ids"].combine_chunks()
        d_col = batch["neigh_dists"].combine_chunks()
        c = len(ids_col[0]) if len(ids_col) else 0
        I = ids_col.values.to_numpy(zero_copy_only=False).reshape(len(q), c)
        D = d_col.values.to_numpy(zero_copy_only=False).reshape(len(q), c)
        if self.method == "dsl":
            qv = emb_to_matrix(batch["embedding"]).astype(np.float64)
            cand = self.gather.take(I).reshape(len(q), c, -1)
            sec = apply_kernel("dsl", D, I, self.stats, qv, cand)
            # ranking is invariant under the global shift + sqrt, so top-k
            # happens now; the finalize pass only rewrites the k values
            sec_k, ids_k = topk_sorted(sec, I, self.k)
            return pa.table(
                {
                    "query_id": pa.array(q, pa.int64()),
                    "neigh_ids": matrix_to_list(ids_k, pa.int64()),
                    "neigh_dists": matrix_to_list(sec_k, pa.float64()),
                    "row_min": pa.array(sec.min(axis=1), pa.float64()),
                }
            )
        if self.kernel_fn is not None:
            sec = self.kernel_fn(D, I, self.stats)
        else:
            sec = apply_kernel(self.method, D, I, self.stats)
        sec_k, ids_k = topk_sorted(sec, I, self.k)
        return pa.table(
            {
                "query_id": pa.array(q, pa.int64()),
                "neigh_ids": matrix_to_list(ids_k, pa.int64()),
                "neigh_dists": matrix_to_list(sec_k, pa.float64()),
            }
        )


class _DslCentroidStage:
    """t->s batches -> (query_id, d2c): squared distance of each target to
    the centroid of its source NNs (dis_sim.py:94-107), with the NN vectors
    gathered per batch from the broadcast source shards."""

    def __init__(self, source_shards: list):
        self.gather = ShardGather(source_shards)

    def __call__(self, batch: pa.Table) -> pa.Table:
        q = batch["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids_col = batch["neigh_ids"].combine_chunks()
        c = len(ids_col[0]) if len(ids_col) else 0
        I = ids_col.values.to_numpy(zero_copy_only=False).reshape(len(q), c)
        tv = emb_to_matrix(batch["embedding"]).astype(np.float64)
        centroids = self.gather.take(I).reshape(len(q), c, -1).mean(axis=1)
        diff = tv - centroids
        return pa.table(
            {
                "query_id": pa.array(q, pa.int64()),
                "d2c": pa.array(np.einsum("nd,nd->n", diff, diff), pa.float64()),
            }
        )


class _DslFinalize:
    def __init__(self, global_min: float, squared: bool):
        self.global_min = global_min
        self.squared = squared

    def __call__(self, batch: pa.Table) -> pa.Table:
        d_col = batch["neigh_dists"].combine_chunks()
        n = len(batch)
        k = len(d_col[0]) if n else 0
        D = d_col.values.to_numpy(zero_copy_only=False).reshape(n, k)
        D = dsl_finalize(D, self.global_min, self.squared)
        return pa.table(
            {
                "query_id": batch["query_id"],
                "neigh_ids": batch["neigh_ids"],
                "neigh_dists": matrix_to_list(D, pa.float64()),
            }
        )


def _pack_t2s_batch(t: pa.Table) -> pa.Table:
    """t->s result rows -> (target_id, t2s_bin) with each target's
    neighbor list packed as c2 int64 ids + c2 float64 dists in one binary
    blob — Arrow's hash join rejects list payload columns, and the packed
    row decodes zero-copy with np.frombuffer on the rerank side."""
    q = t["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ids_col = t["neigh_ids"].combine_chunks()
    d_col = t["neigh_dists"].combine_chunks()
    n = len(q)
    c2 = len(ids_col[0]) if n else 0
    I = ids_col.values.to_numpy(zero_copy_only=False).reshape(n, c2)
    D = d_col.values.to_numpy(zero_copy_only=False).reshape(n, c2)
    payload = np.concatenate(
        [
            np.ascontiguousarray(I.astype(np.int64))
            .view(np.uint8)
            .reshape(n, c2 * 8),
            np.ascontiguousarray(D.astype(np.float64))
            .view(np.uint8)
            .reshape(n, c2 * 8),
        ],
        axis=1,
    )
    row_bytes = payload.shape[1]
    assert (n + 1) * row_bytes < 2**31, "t2s batch overflows int32 offsets"
    offsets = np.arange(0, (n + 1) * row_bytes, row_bytes, dtype=np.int32)
    bin_arr = pa.BinaryArray.from_buffers(
        pa.binary(),
        n,
        [
            None,
            pa.py_buffer(offsets.tobytes()),
            pa.py_buffer(np.ascontiguousarray(payload).tobytes()),
        ],
    )
    return pa.table(
        {"target_id": pa.array(q, pa.int64()), "t2s_bin": bin_arr}
    )


#: 'auto' stats transport switches from broadcast to the shuffle join
#: above this target-id-space size — past it the dense O(m_index) float64
#: calibration arrays (64 MB per array at the limit) stop being
#: "small side" broadcast state.
STATS_BROADCAST_MAX = 8_000_000


def _explode_candidate_rows(
    t: pa.Table, keep_q_bin: bool, transport_hint: str
) -> pa.Table:
    """(query_id, neigh_ids, neigh_dists[, embedding]) -> long per-candidate
    rows (query_id, pos, target_id, dist[, q_bin]) for the shuffle-join
    transports. The neighbor-id column is named ``target_id`` regardless of
    search direction (it is the join key against the per-neighbor table).
    ``q_bin`` carries the query's own vector as fixed-width binary (list
    columns cannot ride Arrow hash joins), repeated per candidate row.
    """
    q = t["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ids_col = t["neigh_ids"].combine_chunks()
    d_col = t["neigh_dists"].combine_chunks()
    c = len(ids_col[0]) if len(t) else 0
    I = ids_col.values.to_numpy(zero_copy_only=False).reshape(len(q), c)
    D = d_col.values.to_numpy(zero_copy_only=False).reshape(len(q), c)
    if (I < 0).any():
        raise ValueError(
            "padded candidates (ind=-1) are not supported by the "
            f"join transport; construct Kiez with {transport_hint}"
        )
    cols = {
        "query_id": pa.array(np.repeat(q, c), pa.int64()),
        "pos": pa.array(
            np.tile(np.arange(c, dtype=np.int32), len(q)), pa.int32()
        ),
        "target_id": pa.array(I.ravel(), pa.int64()),
        "dist": pa.array(D.ravel(), pa.float64()),
    }
    if keep_q_bin:
        qm = emb_to_matrix(t["embedding"]).astype(np.float64)
        qb = matrix_to_binary(qm)
        cols["q_bin"] = qb.take(
            pa.array(np.repeat(np.arange(len(q), dtype=np.int64), c))
        )
    return pa.table(cols)


def _regroup_rows(t: pa.Table):
    """Lexsort exploded candidate rows back to per-query (n, c) layout.

    Returns ``(order, Q, n, c, firsts)`` where ``order`` re-sorts rows by
    (query_id, pos), ``Q (n,)`` is the distinct query ids, and ``firsts``
    is the boolean first-row-of-each-query mask over the ordered rows.
    Asserts every query kept exactly c rows (the joined table covers every
    neighbor id, so the inner join drops nothing)."""
    q = t["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    pos = t["pos"].to_numpy(zero_copy_only=False)
    order = np.lexsort((pos, q))
    qs = q[order]
    firsts = np.concatenate(([True], qs[1:] != qs[:-1]))
    counts = np.diff(np.append(np.flatnonzero(firsts), len(qs)))
    c = int(counts[0])
    assert (counts == c).all(), "candidate rows lost in the join"
    return order, qs[firsts], len(counts), c, firsts


class _StatsJoinRerank:
    """map_groups kernel for one coarse partition of exploded candidate
    rows carrying their joined per-target calibration scalars: reassemble
    per-query (n, c) arrays with one lexsort, run the SAME row kernels the
    broadcast tier delegates to (rerank.csls_rows etc. — byte-identical by
    construction), emit per-query top-k (plus DSL's row_min for the
    global-shift finalize pass)."""

    def __init__(self, method: str, k: int):
        self.method = method
        self.k = k
        self.__name__ = f"stats_join_rerank_{method}"

    def _empty(self) -> pa.Table:
        cols = {
            "query_id": pa.array([], pa.int64()),
            "neigh_ids": pa.array([], pa.list_(pa.int64())),
            "neigh_dists": pa.array([], pa.list_(pa.float64())),
        }
        if self.method == "dsl":
            cols["row_min"] = pa.array([], pa.float64())
        return pa.table(cols)

    def __call__(self, t: pa.Table) -> pa.Table:
        from .rerank import (
            csls_rows,
            dsl_preshift_rows,
            local_scaling_rows,
            mp_normal_rows,
            nicdm_rows,
        )

        if len(t) == 0:
            return self._empty()
        order, Q, n, c, firsts = _regroup_rows(t)
        tid = (
            t["target_id"]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)[order]
            .reshape(n, c)
        )
        D = t["dist"].to_numpy(zero_copy_only=False)[order].reshape(n, c)

        def stat(col: str) -> np.ndarray:
            return t[col].to_numpy(zero_copy_only=False)[order].reshape(n, c)

        if self.method == "csls":
            sec = csls_rows(D, stat("s1"))
        elif self.method == "ls":
            sec = local_scaling_rows(D, stat("s1"))
        elif self.method == "nicdm":
            sec = nicdm_rows(D, stat("s1"))
        elif self.method == "mp_normal":
            sec = mp_normal_rows(D, stat("s1"), stat("s2"))
        elif self.method == "dsl":
            cand = binary_to_matrix(t["vec_bin"], np.float64)[order].reshape(
                n, c, -1
            )
            qv = binary_to_matrix(t["q_bin"], np.float64)[order][firsts]
            sec = dsl_preshift_rows(D, stat("d2c"), qv, cand)
        else:  # pragma: no cover - guarded by Kiez._stats_join
            raise ValueError(f"no join rerank for method {self.method!r}")
        sec_k, ids_k = topk_sorted(sec, tid, self.k)
        cols = {
            "query_id": pa.array(Q, pa.int64()),
            "neigh_ids": matrix_to_list(ids_k, pa.int64()),
            "neigh_dists": matrix_to_list(sec_k, pa.float64()),
        }
        if self.method == "dsl":
            cols["row_min"] = pa.array(sec.min(axis=1), pa.float64())
        return pa.table(cols)


class _DslCentroidJoin:
    """Join-transport DSL centroid pass (dis_sim.py:94-107 semantics): one
    coarse partition of exploded t->s rows carrying their joined source-NN
    vectors; reassembles (n, c, d) in neighbor-list order — the same order
    the broadcast ShardGather produces, so the centroid float sums are
    byte-identical — and emits each target's squared distance to the
    centroid of its source NNs."""

    def __init__(self):
        self.__name__ = "dsl_centroid_join"

    def __call__(self, t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "target_id": pa.array([], pa.int64()),
                    "d2c": pa.array([], pa.float64()),
                }
            )
        order, Q, n, c, firsts = _regroup_rows(t)
        sv = binary_to_matrix(t["vec_bin"], np.float64)[order].reshape(
            n, c, -1
        )
        tv = binary_to_matrix(t["q_bin"], np.float64)[order][firsts]
        centroids = sv.mean(axis=1)
        diff = tv - centroids
        return pa.table(
            {
                "target_id": pa.array(Q, pa.int64()),
                "d2c": pa.array(np.einsum("nd,nd->n", diff, diff), pa.float64()),
            }
        )


class _EmpiricJoinRerank:
    """map_groups kernel for one coarse partition of exploded candidate
    rows carrying their joined t->s blobs: reassemble per-query (c,) and
    (c, c2) arrays with one lexsort, run the vectorized MP-empiric row
    kernel, emit per-query top-k."""

    def __init__(self, k: int):
        self.k = k
        self.__name__ = "empiric_join_rerank"  # map_groups display name

    def __call__(self, t: pa.Table) -> pa.Table:
        from .rerank import mp_empiric_rows

        if len(t) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neigh_ids": pa.array([], pa.list_(pa.int64())),
                    "neigh_dists": pa.array([], pa.list_(pa.float64())),
                }
            )
        q = t["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = t["pos"].to_numpy(zero_copy_only=False)
        tid = t["target_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dist = t["dist"].to_numpy(zero_copy_only=False)
        blobs = np.asarray(t["t2s_bin"].to_pylist(), dtype=object)
        order = np.lexsort((pos, q))
        qs = q[order]
        firsts = np.concatenate(([True], qs[1:] != qs[:-1]))
        counts = np.diff(np.append(np.flatnonzero(firsts), len(qs)))
        c = int(counts[0])
        # the t2s table covers every target, so the inner join drops
        # nothing and every query keeps exactly c candidate rows
        assert (counts == c).all(), "candidate rows lost in the t2s join"
        n = len(counts)
        Q = qs[firsts]
        I = tid[order].reshape(n, c)
        D = dist[order].reshape(n, c)
        buf = np.frombuffer(
            b"".join(blobs[order].tolist()), dtype=np.uint8
        ).reshape(n * c, -1)
        c2 = buf.shape[1] // 16
        TI = (
            np.ascontiguousarray(buf[:, : c2 * 8])
            .view(np.int64)
            .reshape(n, c, c2)
        )
        TD = (
            np.ascontiguousarray(buf[:, c2 * 8 :])
            .view(np.float64)
            .reshape(n, c, c2)
        )
        sec = mp_empiric_rows(D, I, TI, TD)
        sec_k, ids_k = topk_sorted(sec, I, self.k)
        return pa.table(
            {
                "query_id": pa.array(Q, pa.int64()),
                "neigh_ids": matrix_to_list(ids_k, pa.int64()),
                "neigh_dists": matrix_to_list(sec_k, pa.float64()),
            }
        )


class Kiez:
    """Hubness-reduced kNN search facade (reference-compatible surface)."""

    def __init__(
        self,
        n_candidates: int = 10,
        algorithm: str | None = None,
        algorithm_kwargs: dict | None = None,
        hubness: str | None = None,
        hubness_kwargs: dict | None = None,
        batch_size: int = 4096,
        rows_per_shard: int = 65536,
        concurrency=None,
        shards_per_actor: int | None = None,
        route_groups: int | None = None,
        empiric_transport: str = "join",
        stats_transport: str = "auto",
    ):
        if not np.issubdtype(type(n_candidates), np.integer):
            raise TypeError(
                f"n_neighbors does not take {type(n_candidates)} value, enter"
                " integer value"
            )
        if n_candidates <= 0:
            raise ValueError(f"Expected n_candidates > 0. Got {n_candidates}")
        self.n_candidates = int(n_candidates)
        from .index import INDEX_REGISTRY

        algo_key = (
            algorithm.replace("_", "").lower() if isinstance(algorithm, str) else algorithm
        )
        if algo_key in _ALGORITHM_ALIASES:
            self.algorithm = _ALGORITHM_ALIASES[algo_key]
        elif isinstance(algorithm, str) and algorithm.lower() in INDEX_REGISTRY:
            # user-registered index: keep the CLASS so it ships to actors
            # (the registry is driver-process-local)
            self.algorithm = INDEX_REGISTRY[algorithm.lower()]
        elif isinstance(algorithm, type):
            self.algorithm = algorithm
        else:
            raise ValueError(f"Unknown algorithm: {algorithm!r}")
        self.algorithm_kwargs = _translate_backend_kwargs(
            algorithm, dict(algorithm_kwargs or {})
        )
        self.algorithm_kwargs.pop("n_candidates", None)
        self.algorithm_kwargs.pop("n_jobs", None)
        self.metric = self.algorithm_kwargs.get("metric", "euclidean")
        self.hubness, hk = _resolve_hubness(hubness, hubness_kwargs)
        from .rerank import CUSTOM_KERNELS

        # custom kernels ship as function objects (driver registry is
        # process-local; actors can't resolve the name)
        self._kernel_fn = CUSTOM_KERNELS.get(self.hubness)
        if self.hubness != "none" and self.n_candidates == 1:
            raise ValueError(
                "Cannot perform hubness reduction with a single candidate per query!"
            )
        self.dsl_squared = bool(hk.pop("squared", True))
        if self.hubness == "dsl":
            if self.metric in ("euclidean", "minkowski"):
                self.dsl_squared = False
                p = self.algorithm_kwargs.get("p", 2)
                if p != 2:
                    raise ValueError(
                        "DisSimLocal only supports squared Euclidean distances."
                        f" p must be 2. Now it is p={p}"
                    )
            elif self.metric == "sqeuclidean":
                self.dsl_squared = True
            else:
                raise ValueError(
                    "DisSimLocal only supports squared Euclidean distances, not"
                    f" metric={self.metric}."
                )
        self.batch_size = batch_size
        self.rows_per_shard = rows_per_shard
        self.concurrency = concurrency
        # routed search tier: each search actor holds only this many index
        # shards (None = broadcast all shards into every actor);
        # route_groups splits shards into a fixed number of stage groups
        self.shards_per_actor = shards_per_actor
        self.route_groups = route_groups
        #: MP-empiric t->s neighbor-list transport: "join" (default) ships
        #: each candidate's list to the rerank via a shuffle join keyed on
        #: target_id — no O(m*c) broadcast state, the block-unbounded-m
        #: path (SURVEY C8); "broadcast" keeps the reference-shaped dense
        #: arrays (required when the candidate matrix can contain -1
        #: padding, e.g. graph-ANN unreachable slots).
        if empiric_transport not in ("join", "broadcast"):
            raise ValueError(
                f"empiric_transport must be 'join' or 'broadcast', got"
                f" {empiric_transport!r}"
            )
        self.empiric_transport = empiric_transport
        #: calibration-state transport for csls/ls/nicdm/mp_normal/dsl:
        #: "broadcast" keeps the reference-shaped dense O(m_index) arrays
        #: (ray.put once, read per actor — right while the target id space
        #: fits a node); "join" shuffle-joins a (target_id, stats) table
        #: onto exploded candidates so no actor ever holds O(m) state —
        #: the 100-TB path; "auto" (default) picks join past
        #: STATS_BROADCAST_MAX ids. Results are byte-identical across
        #: transports (both delegate to the same row kernels).
        if stats_transport not in ("auto", "broadcast", "join"):
            raise ValueError(
                f"stats_transport must be 'auto', 'broadcast' or 'join',"
                f" got {stats_transport!r}"
            )
        self.stats_transport = stats_transport
        self._t2s_packed = None
        self._stats_table = None
        self._fitted = False

    @classmethod
    def from_path(cls, path: str | Path) -> "Kiez":
        with open(path) as f:
            return cls(**json.load(f))

    @staticmethod
    def show_algorithm_options() -> list[str]:
        """Installed NN backends (reference kiez.py:141-143 parity)."""
        from .index import INDEX_REGISTRY

        return sorted(INDEX_REGISTRY)

    @staticmethod
    def show_hubness_options() -> list[str]:
        from .rerank import HUBNESS_METHODS

        return list(HUBNESS_METHODS)

    def __repr__(self):
        fitted = (
            f" is fitted with: n={self._n} m={self._m}"
            if self._fitted
            else " is unfitted"
        )
        return (
            f"Kiez(algorithm: {self.algorithm}, hubness: {self.hubness})"
            f"{fitted}"
        )

    # ------------------------------------------------------------------
    # fitting
    # ------------------------------------------------------------------

    @staticmethod
    def _matrix_to_ds(mat: np.ndarray, n_blocks: int = 4) -> "ray.data.Dataset":
        mat = np.ascontiguousarray(mat, dtype=np.float64)
        tbl = pa.table(
            {
                "row_id": pa.array(np.arange(len(mat), dtype=np.int64)),
                "embedding": matrix_to_fsl(mat, pa.float64()),
            }
        )
        ds = ray.data.from_arrow(tbl)
        if len(mat) > 1024:
            ds = ds.repartition(n_blocks)
        return ds

    @staticmethod
    def _coerce_input(x):
        """torch.Tensor -> numpy (reference kiez.py:77-91 accepts torch
        with the Faiss backend; here any backend takes it). Gated on
        import so the sandbox (no torch) is unaffected."""
        if x is None or isinstance(x, (np.ndarray, ray.data.Dataset)):
            return x
        try:  # pragma: no cover - torch absent in sandbox
            import torch

            if isinstance(x, torch.Tensor):
                return x.detach().cpu().numpy()
        except ImportError:
            pass
        return x

    def fit(self, source, target=None) -> "Kiez":
        """Build shard indexes over both sides and run the t->s calibration
        pass. Accepts numpy matrices (reference-compatible), torch tensors
        (converted), or Ray Datasets with (row_id:int64 dense,
        embedding:list<float>) columns."""
        self._self_query = target is None
        self._t2s_packed = None  # re-fit drops any prior join tables
        self._stats_table = None
        source = self._coerce_input(source)
        target = self._coerce_input(target)
        if isinstance(source, np.ndarray):
            if source.ndim != 2:
                raise ValueError(f"Expected 2D array, got {source.ndim}D")
            if target is not None and source.shape[1] != target.shape[1]:
                raise ValueError(
                    "Expected source and target to have the same number of"
                    f" features, but got source.shape: {source.shape} and"
                    f" target.shape: {target.shape}"
                )
            self._source_vecs = np.ascontiguousarray(source, dtype=np.float64)
            self._target_vecs = (
                self._source_vecs
                if target is None
                else np.ascontiguousarray(target, dtype=np.float64)
            )
            self._source_ds = self._matrix_to_ds(self._source_vecs)
            self._target_ds = (
                self._source_ds if target is None else self._matrix_to_ds(self._target_vecs)
            )
            self._n = len(self._source_vecs)
            self._m = len(self._target_vecs)
        elif isinstance(source, ray.data.Dataset):
            self._source_ds = source
            self._target_ds = source if target is None else target
            self._source_vecs = None
            self._target_vecs = None
            # row counts come from the shard-build pass below — no extra
            # count() executions of the upstream pipeline
            self._n = None
            self._m = None
        else:
            raise ValueError(
                f"Not implemented for input type {type(source)}! Only numpy"
                " arrays and ray.data.Dataset allowed!"
            )

        shard_dtype = np.dtype(self.algorithm_kwargs.get("dtype", "float64"))
        self._target_shards, m2, t_max_id = shard_refs_from_dataset(
            self._target_ds, rows_per_shard=self.rows_per_shard,
            dtype=shard_dtype,
        )
        if self._m is None:
            self._m = m2
        assert m2 == self._m
        # stats/dense arrays are indexed by row id; ids may be sparse
        self._m_index = t_max_id + 1
        if self.stats_transport == "join":
            use_join = True
        elif self.stats_transport == "broadcast":
            use_join = False
        else:  # auto: dense O(m_index) arrays stop being broadcast-small
            use_join = self._m_index > STATS_BROADCAST_MAX
        # custom kernels consume the dense t2s arrays; mp_empiric has its
        # own transport knob (empiric_transport)
        self._stats_join = (
            use_join
            and self.hubness in ("csls", "nicdm", "ls", "mp_normal", "dsl")
            and self._kernel_fn is None
        )
        if self.hubness != "none":
            if self._source_ds is self._target_ds:
                self._source_shards, n2, s_max_id = (
                    self._target_shards, m2, t_max_id
                )
            else:
                self._source_shards, n2, s_max_id = shard_refs_from_dataset(
                    self._source_ds, rows_per_shard=self.rows_per_shard,
                    dtype=shard_dtype,
                )
            if self._n is None:
                self._n = n2
            self._n_index = s_max_id + 1
            c = self._check_k(self.n_candidates, self._n)
            t2s = knn_search(
                self._target_ds,
                self._source_shards,
                k=c,
                algorithm=self.algorithm,
                algorithm_kwargs=self.algorithm_kwargs,
                exclude_self=False,  # reference passes query explicitly here
                keep_query_embedding=self.hubness == "dsl",
                batch_size=self.batch_size,
                concurrency=self.concurrency,
                shards_per_actor=self.shards_per_actor,
                route_groups=self.route_groups,
            )
            if self.hubness == "dsl" and self._stats_join:
                # join transport: d2c scalars from a join-based centroid
                # pass + each target's vector packed binary, one (target_id,
                # d2c, vec_bin) table the rerank joins on — no actor ever
                # holds every target shard (ShardGather) or an O(m_index)
                # dense array
                d2c = self._dsl_centroid_join(t2s)
                tvec = self._packed_vec_table(self._target_ds)
                self._stats_table = d2c.join(
                    tvec,
                    join_type="inner",
                    num_partitions=self._join_partitions(),
                    on=("target_id",),
                ).materialize()
                stats = CalibrationStats(method="dsl", n_candidates=c)
            elif self.hubness == "dsl":
                # distributed centroid pass: each batch gathers its source-NN
                # vectors from the broadcast shards; the driver only collects
                # the O(m) (target_id, dist_to_centroid) scalars
                d2c = t2s.map_batches(
                    _DslCentroidStage,
                    fn_constructor_kwargs={"source_shards": self._source_shards},
                    batch_format="pyarrow",
                    batch_size=self.batch_size,
                    concurrency=self.concurrency or (1, 8),
                    zero_copy_batch=True,
                )
                stats = CalibrationStats(method="dsl", n_candidates=c)
                stats.dist_to_centroid = np.full(self._m_index, np.nan)
                for batch in d2c.iter_batches(
                    batch_size=8192, batch_format="pyarrow"
                ):
                    q = batch["query_id"].to_numpy(zero_copy_only=False)
                    v = batch["d2c"].to_numpy(zero_copy_only=False)
                    stats.dist_to_centroid[q.astype(np.int64)] = v
            elif self._stats_join:
                # join transport: the per-target scalar stats stay a
                # distributed (target_id, s1[, s2]) table
                from .stats import calibration_stats_table

                self._stats_table = calibration_stats_table(
                    t2s, self.hubness
                ).materialize()
                stats = CalibrationStats(
                    method=self.hubness, n_candidates=c
                )
            elif (
                self.hubness == "mp_empiric"
                and self.empiric_transport == "join"
                and self._kernel_fn is None
            ):
                # join transport: pack each target's t->s neighbor list as
                # one binary row and PIN the table — the rerank joins on
                # target_id; the driver never assembles (m, c) arrays
                self._t2s_packed = t2s.map_batches(
                    _pack_t2s_batch,
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                ).materialize()
                stats = CalibrationStats(method="mp_empiric", n_candidates=c)
            else:
                stats = compute_calibration_stats(
                    t2s,
                    self.hubness,
                    n_targets=self._m_index,
                    n_candidates=c,
                )
            self._stats_ref = ray.put(stats)
        self._fitted = True
        return self

    @staticmethod
    def _join_partitions() -> int:
        cpus = (
            int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized()
            else 8
        )
        return max(2, min(8, cpus // 2))

    def _joined_groups(self, ex: "ray.data.Dataset", table: "ray.data.Dataset"):
        """Inner-join exploded candidate rows with a per-neighbor table on
        target_id, then group by a coarse hash partition of query_id (every
        candidate row of a query lands in one map_groups call)."""
        from .dedup import _splitmix64

        joined = ex.join(
            table,
            join_type="inner",
            num_partitions=self._join_partitions(),
            on=("target_id",),
        )
        P = 32

        def add_part(t: pa.Table) -> pa.Table:
            q = t["query_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
            part = (_splitmix64(q) % np.uint64(P)).astype(np.int32)
            return t.append_column("__part", pa.array(part, pa.int32()))

        return joined.map_batches(add_part, batch_format="pyarrow").groupby(
            "__part"
        )

    @staticmethod
    def _packed_vec_table(ds: "ray.data.Dataset") -> "ray.data.Dataset":
        """(row_id, embedding) -> materialized (target_id, vec_bin) with
        each vector packed as fixed-width binary (rides Arrow hash joins,
        which reject list payload columns). The key is named ``target_id``
        because exploded candidate rows always call their neighbor-id
        column target_id regardless of search direction."""

        def pack(t: pa.Table) -> pa.Table:
            ids = t["row_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            m = emb_to_matrix(t["embedding"]).astype(np.float64)
            return pa.table(
                {
                    "target_id": pa.array(ids, pa.int64()),
                    "vec_bin": matrix_to_binary(m),
                }
            )

        return (
            ds.select_columns(["row_id", "embedding"])
            .map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)
            .materialize()
        )

    def _dsl_centroid_join(self, t2s: "ray.data.Dataset") -> "ray.data.Dataset":
        """Join-transport centroid pass: t->s rows explode per neighbor,
        pick up the source-NN vectors by a hash join on the neighbor id,
        and a coarse map_groups emits (target_id, d2c) — the scale path
        that replaces the broadcast ShardGather when no node should hold
        every source shard."""
        ex = t2s.map_batches(
            lambda t: _explode_candidate_rows(
                t, keep_q_bin=True, transport_hint="stats_transport='broadcast'"
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        svec = self._packed_vec_table(self._source_ds)
        return self._joined_groups(ex, svec).map_groups(
            _DslCentroidJoin(), batch_format="pyarrow"
        )

    def _stats_join_kneighbors(
        self, cand: "ray.data.Dataset", k: int
    ) -> "ray.data.Dataset":
        """Rerank via the shuffle-join stats transport (VERDICT r3 item 1).

        Candidates explode to (query_id, pos, target_id, dist[, q_bin])
        rows, each picks up its target's calibration scalars (and for DSL
        its vector) by an inner hash join on target_id, and a coarse
        hash-partitioned map_groups reassembles per-query (n, c) arrays
        for the same row kernels the broadcast tier delegates to. No
        O(m_index) dense array exists anywhere, so the target id space is
        unbounded by any single node's memory."""
        ex = cand.map_batches(
            lambda t: _explode_candidate_rows(
                t,
                keep_q_bin=self.hubness == "dsl",
                transport_hint="stats_transport='broadcast'",
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return self._joined_groups(ex, self._stats_table).map_groups(
            _StatsJoinRerank(self.hubness, k), batch_format="pyarrow"
        )

    def _empiric_join_kneighbors(
        self, cand: "ray.data.Dataset", k: int
    ) -> "ray.data.Dataset":
        """MP-empiric rerank via shuffle-join transport (SURVEY C8).

        Candidates explode to (query_id, pos, target_id, dist) rows, each
        row picks up its candidate's packed t->s list by an inner hash
        join on target_id, and a coarse hash-partitioned map_groups
        reassembles per-query arrays for the vectorized kernel. No O(m*c)
        arrays exist on the driver or in broadcast state, so m (the
        indexed side) is unbounded by any single node's memory.
        """
        ex = cand.map_batches(
            lambda t: _explode_candidate_rows(
                t, keep_q_bin=False, transport_hint="empiric_transport='broadcast'"
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return self._joined_groups(ex, self._t2s_packed).map_groups(
            _EmpiricJoinRerank(k), batch_format="pyarrow"
        )

    @staticmethod
    def _check_k(k: int, needed_space: int) -> int:
        if not np.issubdtype(type(k), np.integer):
            raise TypeError(f"k does not take {type(k)} value, enter integer value")
        if k <= 0:
            raise ValueError(f"Expected k > 0. Got {k}")
        if k > needed_space:
            warnings.warn(
                f"k={k} is larger than number of samples in indexed space.\n"
                f"Setting to k={needed_space}",
                stacklevel=2,
            )
            return needed_space
        return k

    def _set_k_if_needed(self, k: int | None) -> int:
        if k is None:
            warnings.warn(
                f"No k supplied, setting to n_candidates = {self.n_candidates}",
                stacklevel=2,
            )
            return self.n_candidates
        if k <= 0:
            raise ValueError(f"Expected k > 0. Got {k}")
        if k > self.n_candidates:
            warnings.warn(
                "k > n_candidates supplied! Setting to n_candidates ="
                f" {self.n_candidates}",
                stacklevel=2,
            )
            return self.n_candidates
        return k

    # ------------------------------------------------------------------
    # querying
    # ------------------------------------------------------------------

    def kneighbors_dataset(self, k: int | None = None) -> "ray.data.Dataset":
        """Lazy Dataset of (query_id, neigh_ids, neigh_dists) — the native
        streaming result; `kneighbors` densifies it for numpy parity."""
        if not self._fitted:
            raise RuntimeError("Kiez instance is not fitted yet; call fit first.")
        if self.hubness == "none":
            n_neighbors = self._set_k_if_needed(k)
            n_neighbors = self._check_k(n_neighbors, self._m)
            return knn_search(
                self._source_ds,
                self._target_shards,
                k=n_neighbors,
                algorithm=self.algorithm,
                algorithm_kwargs=self.algorithm_kwargs,
                exclude_self=self._self_query,
                batch_size=self.batch_size,
                concurrency=self.concurrency,
                shards_per_actor=self.shards_per_actor,
                route_groups=self.route_groups,
            )
        n_neighbors = self._set_k_if_needed(k)
        c = self._check_k(self.n_candidates, self._m)
        cand = knn_search(
            self._source_ds,
            self._target_shards,
            k=c,
            algorithm=self.algorithm,
            algorithm_kwargs=self.algorithm_kwargs,
            exclude_self=self._self_query,
            keep_query_embedding=self.hubness == "dsl",
            batch_size=self.batch_size,
            concurrency=self.concurrency,
            shards_per_actor=self.shards_per_actor,
            route_groups=self.route_groups,
        )
        if (
            self.hubness == "mp_empiric"
            and self._t2s_packed is not None
            and self._kernel_fn is None
        ):
            return self._empiric_join_kneighbors(cand, n_neighbors)
        if self._stats_table is not None:
            reranked = self._stats_join_kneighbors(cand, n_neighbors)
        else:
            fn_kwargs = dict(
                method=self.hubness,
                stats_ref=self._stats_ref,
                k=n_neighbors,
                target_shards=self._target_shards if self.hubness == "dsl" else None,
                kernel_fn=self._kernel_fn,
            )
            reranked = cand.map_batches(
                RerankStage,
                fn_constructor_kwargs=fn_kwargs,
                batch_format="pyarrow",
                batch_size=self.batch_size,
                concurrency=self.concurrency or (1, 8),
                zero_copy_batch=True,
            )
        if self.hubness == "dsl":
            # global non-negative shift needs a global min: materialize the
            # (small, k-wide) reranked table once, aggregate, finalize.
            reranked = reranked.materialize()
            gmin = reranked.min("row_min")
            reranked = reranked.drop_columns(["row_min"]).map_batches(
                _DslFinalize(gmin, self.dsl_squared),
                batch_format="pyarrow",
                batch_size=self.batch_size,
                zero_copy_batch=True,
            )
        return reranked

    def kneighbors(self, k: int | None = None, return_distance: bool = True):
        ds = self.kneighbors_dataset(k)
        # numpy inputs have dense row ids == positions; Dataset inputs may be
        # sparse, in which case rows are sized by the max query id seen
        n_rows = self._n if self._source_vecs is not None else None
        dist, ind = neighbors_to_matrices(ds, n_rows=n_rows)
        if return_distance:
            return dist, ind
        return ind

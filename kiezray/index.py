"""ANN index implementations behind one protocol (build / search).

Mirrors the reference's pluggable NNAlgorithm surface
(/root/reference/kiez/neighbors/neighbor_algorithm_base.py:13-136) but as a
plain build/search protocol held *inside Ray actors*, one index per target
shard. Pure-numpy Exact / IVF / LSH indexes are always available; faiss and
hnswlib are used when importable (not in this sandbox).

Search contract: ``search(Q, k, exclude_ids=None) -> (dist, ids)`` with
``dist (n, k) float64`` ascending per row and ``ids (n, k) int64`` global
row ids; rows with fewer than k hits are padded with ``id=-1, dist=nan``
(reference padding semantics, nmslib.py:142-149).
"""

from __future__ import annotations

import numpy as np

from .metrics import pairwise_distances

try:  # optional, absent in this sandbox
    import faiss  # type: ignore
except ImportError:  # pragma: no cover
    faiss = None
try:  # optional
    import hnswlib  # type: ignore
except ImportError:  # pragma: no cover
    hnswlib = None


def _pad(dist: np.ndarray, ids: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    n, g = dist.shape
    if g >= k:
        return dist[:, :k], ids[:, :k]
    pd = np.full((n, k), np.nan)
    pi = np.full((n, k), -1, dtype=np.int64)
    pd[:, :g] = dist
    pi[:, :g] = ids
    return pd, pi


def _topk_by_id_tiebreak(
    dist: np.ndarray, ids: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Row-wise ascending top-k; ties broken by smaller global id.

    Id (not position) tie-break keeps results invariant to how the target
    side is sharded.
    """
    n, m = dist.shape
    kk = min(k, m)
    if kk < m:
        part = np.argpartition(dist, kth=kk - 1, axis=1)[:, :kk]
        pdist = np.take_along_axis(dist, part, axis=1)
        pids = np.take_along_axis(ids, part, axis=1)
    else:
        pdist, pids = dist, np.broadcast_to(ids, (n, m)) if ids.ndim == 1 else ids
    order = np.lexsort((pids, pdist), axis=-1)
    out_d = np.take_along_axis(pdist, order, axis=1)
    out_i = np.take_along_axis(pids, order, axis=1)
    return _pad(out_d, out_i, k)


class ExactIndex:
    """Brute-force index: one GEMM per (query batch, shard). Conformance
    oracle, equivalent of the reference SklearnNN backend
    (kiez/neighbors/exact/sklearn_nearest_neighbors.py).

    The hot path is fused and allocation-light: a single GEMM, in-place
    norm adds, argpartition on the score matrix, and monotonic
    post-transforms (sqrt for euclidean) applied only to the k selected
    values. ``dtype=float32`` halves memory traffic for bandwidth-bound
    shards (distances still returned float64).
    """

    _GEMM_METRICS = {
        "euclidean", "l2", "sqeuclidean", "cosine", "ip", "innerproduct",
        "inner_product", "minkowski",
    }

    def __init__(
        self,
        metric: str = "euclidean",
        p: float = 2.0,
        dtype="float64",
        chunk_rows: int = 8192,
    ):
        self.metric = metric
        self.p = p
        self.dtype = np.dtype(dtype)
        # target rows per GEMM tile: keeps the (n_q, chunk) score matrix
        # cache-resident instead of materializing (n_q, m) in RAM — the
        # score matrix, not the GEMM, is the bandwidth hog at large m
        self.chunk_rows = chunk_rows
        self.ids: np.ndarray | None = None
        self.vecs: np.ndarray | None = None

    def build(self, ids: np.ndarray, vecs: np.ndarray) -> None:
        self.ids = np.ascontiguousarray(ids, dtype=np.int64)
        vecs = np.ascontiguousarray(vecs, dtype=self.dtype)
        if self.metric == "cosine":
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            vecs = vecs / norms
        self.vecs = vecs
        if self.metric in ("euclidean", "l2", "sqeuclidean") or (
            self.metric == "minkowski" and self.p == 2.0
        ):
            self._xn = np.einsum("ij,ij->i", vecs, vecs)
        else:
            self._xn = None

    def _chunk_topk(
        self, q: np.ndarray, k: int, exclude_ids: np.ndarray | None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Tile the indexed side; keep a running per-query top-k."""
        m = len(self.ids)
        n = len(q)
        best_d = np.full((n, k), np.inf)
        best_i = np.full((n, k), -1, dtype=np.int64)
        for s in range(0, m, self.chunk_rows):
            e = min(s + self.chunk_rows, m)
            d = self._score_slice(q, s, e)
            ids = self.ids[s:e]
            if exclude_ids is not None:
                d[ids[None, :] == exclude_ids[:, None]] = np.inf
            kk = min(k, e - s)
            if kk < e - s:
                part = np.argpartition(d, kth=kk - 1, axis=1)[:, :kk]
                pd = np.take_along_axis(d, part, axis=1)
            else:
                part = np.broadcast_to(np.arange(e - s), (n, e - s))
                pd = d
            cd = np.concatenate([best_d, pd.astype(np.float64)], axis=1)
            ci = np.concatenate([best_i, ids[part]], axis=1)
            key = np.where(ci < 0, np.iinfo(np.int64).max, ci)
            order = np.lexsort((key, cd), axis=-1)[:, :k]
            best_d = np.take_along_axis(cd, order, axis=1)
            best_i = np.take_along_axis(ci, order, axis=1)
        return best_d, best_i

    def _score_slice(self, q: np.ndarray, s: int, e: int) -> np.ndarray:
        m = self.metric
        if m in ("euclidean", "l2", "sqeuclidean") or (
            m == "minkowski" and self.p == 2.0
        ):
            d = q @ self.vecs[s:e].T
            d *= -2.0
            d += self._qn[:, None]
            d += self._xn[None, s:e]
            np.maximum(d, 0.0, out=d)
            return d
        if m == "cosine":
            d = self._qnormed @ self.vecs[s:e].T
            d *= -1.0
            d += 1.0
            return d
        if m in ("ip", "innerproduct", "inner_product"):
            return -(q @ self.vecs[s:e].T)
        return pairwise_distances(q, self.vecs[s:e], m, self.p)

    def search(
        self, q: np.ndarray, k: int, exclude_ids: np.ndarray | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        q = np.ascontiguousarray(q, dtype=self.dtype)
        # per-query-batch prep for the slice kernels
        if self.metric in ("euclidean", "l2", "sqeuclidean") or (
            self.metric == "minkowski" and self.p == 2.0
        ):
            self._qn = np.einsum("ij,ij->i", q, q)
        elif self.metric == "cosine":
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qn[qn == 0] = 1.0
            self._qnormed = q / qn
        dist, out_ids = self._chunk_topk(q, k, exclude_ids)
        sqrt_metric = self.metric in ("euclidean", "l2") or (
            self.metric == "minkowski" and self.p == 2.0
        )
        if sqrt_metric:
            np.sqrt(dist, out=dist)  # monotonic: safe after selection
        dist, out_ids = _pad(dist, out_ids, k)
        bad = ~np.isfinite(dist)
        if bad.any():
            dist[bad] = np.nan
            out_ids[bad] = -1
        return dist, out_ids


class IvfIndex:
    """Inverted-file ANN: deterministic k-means coarse quantizer + probe
    of the ``nprobe`` nearest cells. Pure numpy stand-in for Faiss IVF
    (reference kiez/neighbors/approximate/faiss.py index_key='ivf')."""

    def __init__(
        self,
        metric: str = "euclidean",
        nlist: int = 64,
        nprobe: int = 8,
        iters: int = 10,
        seed: int = 42,
    ):
        self.metric = metric
        self.nlist = nlist
        self.nprobe = nprobe
        self.iters = iters
        self.seed = seed

    def build(self, ids: np.ndarray, vecs: np.ndarray) -> None:
        ids = np.ascontiguousarray(ids, dtype=np.int64)
        vecs = np.ascontiguousarray(vecs, dtype=np.float64)
        m = len(ids)
        nlist = max(1, min(self.nlist, m))
        rng = np.random.RandomState(self.seed)
        cent = vecs[rng.choice(m, size=nlist, replace=False)].copy()
        for _ in range(self.iters):
            assign = np.argmin(pairwise_distances(vecs, cent, "sqeuclidean"), axis=1)
            for c in range(nlist):
                sel = assign == c
                if sel.any():
                    cent[c] = vecs[sel].mean(axis=0)
        assign = np.argmin(pairwise_distances(vecs, cent, "sqeuclidean"), axis=1)
        order = np.argsort(assign, kind="stable")
        self.centroids = cent
        self.sorted_ids = ids[order]
        self.sorted_vecs = vecs[order]
        bounds = np.searchsorted(assign[order], np.arange(nlist + 1))
        self.cell_bounds = bounds

    def search(
        self, q: np.ndarray, k: int, exclude_ids: np.ndarray | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        nlist = len(self.centroids)
        nprobe = min(self.nprobe, nlist)
        cd = pairwise_distances(q, self.centroids, "sqeuclidean")
        probe = np.argpartition(cd, kth=nprobe - 1, axis=1)[:, :nprobe]
        n = len(q)
        out_d = np.full((n, k), np.nan)
        out_i = np.full((n, k), -1, dtype=np.int64)
        # group queries by probed-cell signature would be fancier; per-row is
        # fine because each row still does vectorized GEMM over its cells
        for i in range(n):
            segs = [
                slice(self.cell_bounds[c], self.cell_bounds[c + 1]) for c in probe[i]
            ]
            cand_ids = np.concatenate([self.sorted_ids[s] for s in segs])
            cand_vecs = np.concatenate([self.sorted_vecs[s] for s in segs])
            if len(cand_ids) == 0:
                continue
            d = pairwise_distances(q[i : i + 1], cand_vecs, self.metric)[0]
            if exclude_ids is not None:
                d[cand_ids == exclude_ids[i]] = np.inf
            dd, ii = _topk_by_id_tiebreak(d[None, :], cand_ids[None, :], k)
            bad = ~np.isfinite(dd)
            dd[bad] = np.nan
            ii[bad] = -1
            out_d[i], out_i[i] = dd[0], ii[0]
        return out_d, out_i


class LshIndex:
    """Random-hyperplane LSH for cosine distance: bucket by sign pattern,
    probe the query's bucket plus hamming-1 neighbors, exact rerank."""

    def __init__(self, nplanes: int = 12, seed: int = 42, metric: str = "cosine"):
        if metric != "cosine":
            raise ValueError("LshIndex supports metric='cosine' only")
        self.nplanes = nplanes
        self.seed = seed
        self.metric = metric

    def _codes(self, vecs: np.ndarray) -> np.ndarray:
        bits = (vecs @ self.planes.T) > 0
        return (bits @ (1 << np.arange(self.nplanes, dtype=np.int64))).astype(np.int64)

    def build(self, ids: np.ndarray, vecs: np.ndarray) -> None:
        ids = np.ascontiguousarray(ids, dtype=np.int64)
        vecs = np.ascontiguousarray(vecs, dtype=np.float64)
        d = vecs.shape[1]
        rng = np.random.RandomState(self.seed)
        self.planes = rng.standard_normal((self.nplanes, d))
        codes = self._codes(vecs)
        order = np.argsort(codes, kind="stable")
        self.sorted_codes = codes[order]
        self.sorted_ids = ids[order]
        self.sorted_vecs = vecs[order]

    def search(
        self, q: np.ndarray, k: int, exclude_ids: np.ndarray | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        qcodes = self._codes(np.asarray(q, dtype=np.float64))
        n = len(q)
        out_d = np.full((n, k), np.nan)
        out_i = np.full((n, k), -1, dtype=np.int64)
        flips = np.concatenate([[0], 1 << np.arange(self.nplanes, dtype=np.int64)])
        for i in range(n):
            probes = qcodes[i] ^ flips
            lo = np.searchsorted(self.sorted_codes, probes, side="left")
            hi = np.searchsorted(self.sorted_codes, probes, side="right")
            segs = [slice(a, b) for a, b in zip(lo, hi) if b > a]
            if not segs:
                continue
            cand_ids = np.concatenate([self.sorted_ids[s] for s in segs])
            cand_vecs = np.concatenate([self.sorted_vecs[s] for s in segs])
            d = pairwise_distances(q[i : i + 1], cand_vecs, "cosine")[0]
            if exclude_ids is not None:
                d[cand_ids == exclude_ids[i]] = np.inf
            dd, ii = _topk_by_id_tiebreak(d[None, :], cand_ids[None, :], k)
            bad = ~np.isfinite(dd)
            dd[bad] = np.nan
            ii[bad] = -1
            out_d[i], out_i[i] = dd[0], ii[0]
        return out_d, out_i


class FaissIndex:  # pragma: no cover - faiss absent in sandbox
    """Faiss-backed index (used when faiss is importable; metric map mirrors
    reference faiss.py:67-85 for l2/ip/cosine)."""

    def __init__(self, metric: str = "euclidean", index_key: str = "Flat"):
        if faiss is None:
            raise ImportError("faiss is not available")
        self.metric = metric
        self.index_key = index_key

    def build(self, ids: np.ndarray, vecs: np.ndarray) -> None:
        self.ids = np.ascontiguousarray(ids, dtype=np.int64)
        v = np.ascontiguousarray(vecs, dtype=np.float32)
        if self.metric == "cosine":
            faiss.normalize_L2(v)
            self.index = faiss.index_factory(
                v.shape[1], self.index_key, faiss.METRIC_INNER_PRODUCT
            )
        else:
            self.index = faiss.index_factory(v.shape[1], self.index_key)
        if not self.index.is_trained:
            self.index.train(v)
        self.index.add(v)
        self.vecs32 = v

    def search(self, q, k, exclude_ids=None):
        qq = np.ascontiguousarray(q, dtype=np.float32)
        extra = 1 if exclude_ids is not None else 0
        if self.metric == "cosine":
            faiss.normalize_L2(qq)
        d, i = self.index.search(qq, min(k + extra, self.index.ntotal))
        if self.metric == "cosine":
            d = 1.0 - d
        elif self.metric == "euclidean":
            d = np.sqrt(np.maximum(d, 0))
        ids = np.where(i >= 0, self.ids[np.maximum(i, 0)], -1)
        dist = np.where(i >= 0, d.astype(np.float64), np.inf)
        if exclude_ids is not None:
            dist[ids == exclude_ids[:, None]] = np.inf
        dd, ii = _topk_by_id_tiebreak(dist, ids, k)
        bad = ~np.isfinite(dd)
        dd[bad] = np.nan
        ii[bad] = -1
        return dd, ii


INDEX_REGISTRY: dict[str, type] = {
    "exact": ExactIndex,
    "sklearnnn": ExactIndex,  # reference-name alias
    "ivf": IvfIndex,
    "lsh": LshIndex,
}


def register_index(name: str, cls: type) -> None:
    """User extension point (reference parity: subclassing NNAlgorithm,
    docs/source/using_your_own.rst:1-30). ``cls`` implements the protocol
    ``build(ids, vecs)`` / ``search(q, k, exclude_ids=None) ->
    (dist (n,k) float64 ascending, ids (n,k) int64, -1/NaN padded)`` and
    is then resolvable by name in ``Kiez(algorithm=name)``."""
    if not (hasattr(cls, "build") and hasattr(cls, "search")):
        raise TypeError("index class must define build(...) and search(...)")
    INDEX_REGISTRY[name.lower()] = cls
if faiss is not None:  # pragma: no cover
    INDEX_REGISTRY["faiss"] = FaissIndex


def make_index(algorithm, **kwargs):
    # a class ships through Ray task/actor args (cloudpickle), so custom
    # indexes work inside workers where the driver-side registry is absent
    if isinstance(algorithm, type):
        return algorithm(**kwargs)
    name = (algorithm or "exact").lower()
    if name == "faiss" and faiss is None:
        name = "exact"  # reference fallback semantics (kiez.py:118-122)
    # graph/tree ANN backends of the reference map onto the available
    # approximate implementation (capability parity, not a port)
    if name in ("nmslib", "nng", "annoy", "hnsw"):
        name = "ivf"
    if name not in INDEX_REGISTRY:
        raise ValueError(
            f"Unknown algorithm {algorithm!r}; options: {sorted(INDEX_REGISTRY)}"
        )
    return INDEX_REGISTRY[name](**kwargs)

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


def _scatter_topk(
    cand_q: np.ndarray,
    cand_d: np.ndarray,
    cand_i: np.ndarray,
    n: int,
    k: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Flat (query, dist, id) candidate rows -> per-query ascending top-k.

    One lexsort over all candidates with (query, dist, id) keys, then a
    vectorized within-group rank; non-finite distances (exclusions) never
    land in the output. Shared by the batch-vectorized IVF/LSH searches.
    """
    out_d = np.full((n, k), np.nan)
    out_i = np.full((n, k), -1, dtype=np.int64)
    if len(cand_q) == 0:
        return out_d, out_i
    key_d = np.where(np.isfinite(cand_d), cand_d, np.inf)
    order = np.lexsort((cand_i, key_d, cand_q))
    cq = cand_q[order]
    first = np.concatenate(([True], cq[1:] != cq[:-1]))
    idx = np.arange(len(cq))
    group_start = idx[first][np.cumsum(first) - 1]
    rank = idx - group_start
    sel = (rank < k) & np.isfinite(key_d[order])
    out_d[cq[sel], rank[sel]] = cand_d[order][sel]
    out_i[cq[sel], rank[sel]] = cand_i[order][sel]
    return out_d, out_i


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
        """Batch-vectorized probe: queries are inverted to per-cell groups
        so each populated cell runs ONE GEMM over all queries probing it
        (no per-query Python loop); per-cell top-k candidates then merge
        with a single lexsort."""
        q = np.ascontiguousarray(q, dtype=np.float64)
        n = len(q)
        nlist = len(self.centroids)
        nprobe = min(self.nprobe, nlist)
        cd = pairwise_distances(q, self.centroids, "sqeuclidean")
        if nprobe < nlist:
            probe = np.argpartition(cd, kth=nprobe - 1, axis=1)[:, :nprobe]
        else:
            probe = np.broadcast_to(np.arange(nlist), (n, nlist))
        pair_q = np.repeat(np.arange(n), probe.shape[1])
        pair_c = probe.ravel()
        order = np.argsort(pair_c, kind="stable")
        pq, pc = pair_q[order], pair_c[order]
        cell_starts = np.searchsorted(pc, np.arange(nlist + 1))
        # +1 margin: the self-exclusion can knock out at most one candidate
        margin = k + 1 if exclude_ids is not None else k
        cq_l, cd_l, ci_l = [], [], []
        for c in range(nlist):
            s0, e0 = cell_starts[c], cell_starts[c + 1]
            vs, ve = self.cell_bounds[c], self.cell_bounds[c + 1]
            sz = ve - vs
            if e0 == s0 or sz == 0:
                continue
            qs = pq[s0:e0]
            d = pairwise_distances(q[qs], self.sorted_vecs[vs:ve], self.metric)
            kk = min(margin, sz)
            if kk < sz:
                part = np.argpartition(d, kth=kk - 1, axis=1)[:, :kk]
                dsel = np.take_along_axis(d, part, axis=1)
            else:
                part = np.broadcast_to(np.arange(sz), (len(qs), sz))
                dsel = d
            cq_l.append(np.repeat(qs, kk))
            cd_l.append(dsel.ravel())
            ci_l.append(self.sorted_ids[vs:ve][part].ravel())
        if not cq_l:
            return np.full((n, k), np.nan), np.full((n, k), -1, dtype=np.int64)
        cand_q = np.concatenate(cq_l)
        cand_d = np.concatenate(cd_l)
        cand_i = np.concatenate(ci_l)
        if exclude_ids is not None:
            cand_d[cand_i == exclude_ids[cand_q]] = np.inf
        return _scatter_topk(cand_q, cand_d, cand_i, n, k)


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
        norms = np.linalg.norm(vecs[order], axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        self.sorted_vecsn = vecs[order] / norms  # pre-normalized for cosine

    def search(
        self, q: np.ndarray, k: int, exclude_ids: np.ndarray | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batch-vectorized: (query, probe) pairs are grouped by bucket so
        each populated bucket runs ONE GEMM over all queries probing it,
        keeps the per-bucket top-(k+1), and a single lexsort merges — no
        per-query Python loop, and skewed buckets (a hazard of sign LSH on
        non-centered data) cost one large GEMM instead of a huge gather."""
        q = np.asarray(q, dtype=np.float64)
        n = len(q)
        qcodes = self._codes(q)
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        qnormed = q / qn
        flips = np.concatenate([[0], 1 << np.arange(self.nplanes, dtype=np.int64)])
        probes = (qcodes[:, None] ^ flips[None, :]).ravel()
        pair_q = np.repeat(np.arange(n), len(flips))
        order = np.argsort(probes, kind="stable")
        sp, pq = probes[order], pair_q[order]
        starts = np.flatnonzero(np.concatenate(([True], sp[1:] != sp[:-1])))
        uniq = sp[starts]
        bounds = np.append(starts, len(sp))
        lo = np.searchsorted(self.sorted_codes, uniq, side="left")
        hi = np.searchsorted(self.sorted_codes, uniq, side="right")
        margin = k + 1 if exclude_ids is not None else k
        cq_l, cd_l, ci_l = [], [], []
        for u in range(len(uniq)):
            sz = hi[u] - lo[u]
            if sz == 0:
                continue
            qs = pq[bounds[u] : bounds[u + 1]]
            d = 1.0 - qnormed[qs] @ self.sorted_vecsn[lo[u] : hi[u]].T
            kk = min(margin, sz)
            if kk < sz:
                part = np.argpartition(d, kth=kk - 1, axis=1)[:, :kk]
                dsel = np.take_along_axis(d, part, axis=1)
            else:
                part = np.broadcast_to(np.arange(sz), (len(qs), sz))
                dsel = d
            cq_l.append(np.repeat(qs, kk))
            cd_l.append(dsel.ravel())
            ci_l.append(self.sorted_ids[lo[u] : hi[u]][part].ravel())
        if not cq_l:
            return np.full((n, k), np.nan), np.full((n, k), -1, dtype=np.int64)
        cand_q = np.concatenate(cq_l)
        cand_d = np.concatenate(cd_l)
        cand_i = np.concatenate(ci_l)
        if exclude_ids is not None:
            cand_d[cand_i == exclude_ids[cand_q]] = np.inf
        return _scatter_topk(cand_q, cand_d, cand_i, n, k)


class RpForestIndex:
    """Random-projection forest — the genuine capability match for the
    reference's Annoy backend (kiez/neighbors/approximate/
    random_projection_trees.py:66-118; parameter surface ``n_trees`` /
    ``search_k``, metrics angular/euclidean), built from scratch and
    fully batch-vectorized (no per-point recursion anywhere).

    Build: each tree splits recursively with a hyperplane through the
    data — normal = difference of two randomly chosen member points
    (the annoy-style data-dependent split), offset = the node's median
    projection — so leaves are balanced at ~``leaf_size`` points. One
    pass per level over all nodes at once: segment points by node with
    one argsort, draw split pairs per segment, one fused row-wise dot
    for every point's projection, one lexsort for all medians.

    Search: traversal is per-level gather-and-dot over the whole query
    batch; candidates are the union of each query's leaf across trees
    (plus sibling-leaf probes when ``search_k`` asks for more), deduped
    with one lexsort and reranked exactly, then merged by
    ``_scatter_topk``. Memory is (2^depth) hyperplanes per tree —
    independent of n — so the index shards like every other tier."""

    def __init__(
        self,
        n_trees: int = 8,
        leaf_size: int = 64,
        search_k: int | None = None,
        metric: str = "euclidean",  # the reference Annoy default
        seed: int = 42,
    ):
        if metric in ("angular",):  # annoy's name for it
            metric = "cosine"
        if metric not in ("cosine", "euclidean"):
            raise ValueError(
                "RpForestIndex supports metric in ('cosine'/'angular', "
                f"'euclidean'), got {metric!r}"
            )
        self.n_trees = int(n_trees)
        self.leaf_size = int(leaf_size)
        self.search_k = search_k
        self.metric = metric
        self.seed = seed

    def build(self, ids: np.ndarray, vecs: np.ndarray) -> None:
        ids = np.ascontiguousarray(ids, dtype=np.int64)
        vecs = np.ascontiguousarray(vecs, dtype=np.float64)
        n, dim = vecs.shape
        self.ids = ids
        self.vecs = vecs
        if self.metric == "cosine":
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            self.vecsn = vecs / norms
        depth = max(1, int(np.ceil(np.log2(max(n, 2) / max(self.leaf_size, 1)))))
        self.depth = min(depth, 24)
        n_internal = (1 << self.depth) - 1
        self.normals = np.zeros((self.n_trees, n_internal, dim))
        self.offsets = np.zeros((self.n_trees, n_internal))
        self.leaf_codes = []  # per tree: sorted leaf id per stored point
        self.leaf_pos = []  # per tree: point positions in that order
        for t in range(self.n_trees):
            rng = np.random.RandomState(self.seed + 7919 * t)
            node = np.zeros(n, dtype=np.int64)
            for _level in range(self.depth):
                order = np.argsort(node, kind="stable")
                sn = node[order]
                first = np.concatenate(([True], sn[1:] != sn[:-1]))
                starts = np.flatnonzero(first)
                lens = np.diff(np.append(starts, n))
                seg_nodes = sn[starts]
                ns = len(starts)
                # annoy-style split: normal through two random members
                a = order[starts + (rng.random_sample(ns) * lens).astype(np.int64)]
                b = order[starts + (rng.random_sample(ns) * lens).astype(np.int64)]
                nrm = vecs[a] - vecs[b]
                degenerate = (nrm == 0).all(axis=1)
                if degenerate.any():
                    nrm[degenerate] = rng.standard_normal(
                        (int(degenerate.sum()), dim)
                    )
                seg_of = np.repeat(np.arange(ns), lens)  # aligned to `order`
                proj = np.einsum("ij,ij->i", vecs[order], nrm[seg_of])
                # per-segment median offset with ONE lexsort over all nodes
                o2 = np.lexsort((proj, seg_of))
                sproj = proj[o2]
                off = sproj[starts + lens // 2]
                bit = (proj > off[seg_of]).astype(np.int64)
                self.normals[t, seg_nodes] = nrm
                self.offsets[t, seg_nodes] = off
                node[order] = 2 * sn + 1 + bit
            leaf = node - n_internal
            o = np.argsort(leaf, kind="stable")
            self.leaf_codes.append(leaf[o])
            self.leaf_pos.append(o)

    def _descend(
        self,
        q: np.ndarray,
        t: int,
        flip_level: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Traverse tree ``t`` for the whole query batch at once.

        ``flip_level[i]`` (optional) inverts query i's split decision at
        that level — a TRUE alternate traversal (the path below the flip
        uses the other subtree's hyperplanes), which is what annoy's
        priority-queue descent explores; a leaf-code XOR would not be.
        Returns (leaf ids, |margin| per level) for probe planning."""
        nq = len(q)
        node = np.zeros(nq, dtype=np.int64)
        margins = np.empty((nq, self.depth))
        levels = np.arange(self.depth)
        for level in levels:
            nr = self.normals[t, node]
            off = self.offsets[t, node]
            proj = np.einsum("ij,ij->i", q, nr)
            bit = (proj > off).astype(np.int64)
            margins[:, level] = np.abs(proj - off)
            if flip_level is not None:
                bit ^= flip_level == level
            node = 2 * node + 1 + bit
        return node - ((1 << self.depth) - 1), margins

    def search(
        self, q: np.ndarray, k: int, exclude_ids: np.ndarray | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        q = np.asarray(q, dtype=np.float64)
        nq = len(q)
        # annoy search_k ~ nodes inspected; translate to margin-ordered
        # alternate-path probes per tree (default 2: the leaf plus the
        # closest-call flip — the vectorized stand-in for annoy's
        # priority-queue descent)
        n_probes = 2  # floor: the leaf + its closest-call flip
        if self.search_k:
            per_probe = max(self.leaf_size, 1) * self.n_trees
            n_probes = max(n_probes, -(-int(self.search_k) // per_probe))
        n_probes = min(n_probes, self.depth + 1)

        def gather(t: int, leaf: np.ndarray):
            lo = np.searchsorted(self.leaf_codes[t], leaf, side="left")
            hi = np.searchsorted(self.leaf_codes[t], leaf, side="right")
            counts = hi - lo
            total = int(counts.sum())
            if total == 0:
                return
            qi = np.repeat(np.arange(nq), counts)
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            offs = np.arange(total) - starts.repeat(counts)
            pq_l.append(qi)
            pp_l.append(self.leaf_pos[t][lo.repeat(counts) + offs])

        pq_l, pp_l = [], []
        for t in range(self.n_trees):
            leaf0, margins = self._descend(q, t)
            gather(t, leaf0)
            if n_probes > 1:
                # probe j re-descends with the j-th closest split flipped
                probe_levels = np.argsort(margins, axis=1, kind="stable")
                for j in range(n_probes - 1):
                    leaf_j, _ = self._descend(
                        q, t, flip_level=probe_levels[:, j]
                    )
                    gather(t, leaf_j)
        if not pq_l:
            return np.full((nq, k), np.nan), np.full((nq, k), -1, dtype=np.int64)
        cand_q = np.concatenate(pq_l)
        cand_p = np.concatenate(pp_l)
        # dedupe (query, point) pairs from overlapping leaves
        o = np.lexsort((cand_p, cand_q))
        cand_q, cand_p = cand_q[o], cand_p[o]
        keep = np.concatenate(
            ([True], (cand_q[1:] != cand_q[:-1]) | (cand_p[1:] != cand_p[:-1]))
        )
        cand_q, cand_p = cand_q[keep], cand_p[keep]
        if self.metric == "cosine":
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qn[qn == 0] = 1.0
            qnormed = q / qn
            cand_d = 1.0 - np.einsum(
                "ij,ij->i", qnormed[cand_q], self.vecsn[cand_p]
            )
        else:
            diff = q[cand_q] - self.vecs[cand_p]
            cand_d = np.sqrt(np.einsum("ij,ij->i", diff, diff))
        cand_i = self.ids[cand_p]
        if exclude_ids is not None:
            cand_d = cand_d.copy()
            cand_d[cand_i == exclude_ids[cand_q]] = np.inf
        return _scatter_topk(cand_q, cand_d, cand_i, nq, k)


class IvfPqIndex:
    """IVF-PQ: coarse quantizer + product-quantized residuals, ADC search.

    The memory-compressed regime of Faiss's ``IVFx,PQy`` factory strings
    (reference faiss.py index_key parsing) rebuilt in pure numpy: each
    vector stores as ``m_sub`` uint8 codes (e.g. 64x float64 -> 8 bytes,
    64x compression), and search computes asymmetric distances via
    per-(query, cell) lookup tables — one small GEMM per subspace per
    cell, then a table gather per member. This is the tier that holds
    10^9+ vectors per node when raw vectors cannot.

    Approximation error comes from both the cell probe (like IVF) and the
    residual quantization; ``refine`` > 0 re-ranks the top
    ``refine * k`` ADC candidates with exact distances against the kept
    raw vectors of probed cells (standard IVFPQR pattern).
    """

    def __init__(
        self,
        metric: str = "euclidean",
        nlist: int = 64,
        nprobe: int = 16,
        m_sub: int = 8,
        ksub: int = 256,
        iters: int = 8,
        seed: int = 42,
        refine: int = 8,
    ):
        if metric not in ("euclidean", "l2", "sqeuclidean", "cosine"):
            raise ValueError(
                f"IvfPqIndex supports euclidean/sqeuclidean/cosine, not {metric}"
            )
        self.metric = metric
        self.nlist = nlist
        self.nprobe = nprobe
        self.m_sub = m_sub
        self.ksub = ksub
        self.iters = iters
        self.seed = seed
        self.refine = refine

    def _kmeans(self, x: np.ndarray, k: int, rng) -> np.ndarray:
        k = max(1, min(k, len(x)))
        cent = x[rng.choice(len(x), size=k, replace=False)].copy()
        for _ in range(self.iters):
            assign = np.argmin(
                pairwise_distances(x, cent, "sqeuclidean"), axis=1
            )
            for c in range(k):
                sel = assign == c
                if sel.any():
                    cent[c] = x[sel].mean(axis=0)
        return cent

    def build(self, ids: np.ndarray, vecs: np.ndarray) -> None:
        ids = np.ascontiguousarray(ids, dtype=np.int64)
        vecs = np.ascontiguousarray(vecs, dtype=np.float64)
        if self.metric == "cosine":
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            vecs = vecs / norms
        m, d = vecs.shape
        if d % self.m_sub != 0:
            # largest divisor of d not above the requested m_sub (Faiss
            # raises here; adapting keeps small/odd dims usable)
            self.m_sub = max(
                s for s in range(1, self.m_sub + 1) if d % s == 0
            )
        self.dsub = d // self.m_sub
        rng = np.random.RandomState(self.seed)
        nlist = max(1, min(self.nlist, m))
        self.centroids = self._kmeans(vecs, nlist, rng)
        assign = np.argmin(
            pairwise_distances(vecs, self.centroids, "sqeuclidean"), axis=1
        )
        order = np.argsort(assign, kind="stable")
        self.sorted_ids = ids[order]
        self.cell_bounds = np.searchsorted(
            assign[order], np.arange(len(self.centroids) + 1)
        )
        resid = vecs[order] - self.centroids[assign[order]]
        # per-subspace codebooks over residuals + uint8 codes
        ksub_eff = max(1, min(self.ksub, m))
        self.codebooks = np.empty(
            (self.m_sub, ksub_eff, self.dsub), dtype=np.float64
        )
        self.codes = np.empty((m, self.m_sub), dtype=np.uint8)
        for s in range(self.m_sub):
            sub = resid[:, s * self.dsub : (s + 1) * self.dsub]
            cb = self._kmeans(sub, ksub_eff, rng)
            self.codebooks[s] = cb
            self.codes[:, s] = np.argmin(
                pairwise_distances(sub, cb, "sqeuclidean"), axis=1
            ).astype(np.uint8)
        # raw vectors kept only when refine > 0 (cell-sorted)
        self.sorted_vecs = vecs[order] if self.refine > 0 else None

    def search(
        self, q: np.ndarray, k: int, exclude_ids: np.ndarray | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        q = np.ascontiguousarray(q, dtype=np.float64)
        if self.metric == "cosine":
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qn[qn == 0] = 1.0
            q = q / qn
        n = len(q)
        nlist = len(self.centroids)
        nprobe = min(self.nprobe, nlist)
        ksub = self.codebooks.shape[1]
        cd = pairwise_distances(q, self.centroids, "sqeuclidean")
        if nprobe < nlist:
            probe = np.argpartition(cd, kth=nprobe - 1, axis=1)[:, :nprobe]
        else:
            probe = np.broadcast_to(np.arange(nlist), (n, nlist))
        pair_q = np.repeat(np.arange(n), probe.shape[1])
        pair_c = probe.ravel()
        order = np.argsort(pair_c, kind="stable")
        pq_, pc_ = pair_q[order], pair_c[order]
        cell_starts = np.searchsorted(pc_, np.arange(nlist + 1))
        fetch = max(k, k * self.refine) if self.refine else k
        margin = fetch + (1 if exclude_ids is not None else 0)
        cq_l, cd_l, ci_l, cp_l = [], [], [], []
        for c in range(nlist):
            s0, e0 = cell_starts[c], cell_starts[c + 1]
            vs, ve = self.cell_bounds[c], self.cell_bounds[c + 1]
            sz = ve - vs
            if e0 == s0 or sz == 0:
                continue
            qs = pq_[s0:e0]
            resid = q[qs] - self.centroids[c]  # (nq, d)
            # per-subspace LUT: (nq, m_sub, ksub) squared distances
            lut = np.empty((len(qs), self.m_sub, ksub))
            for s in range(self.m_sub):
                lut[:, s, :] = pairwise_distances(
                    resid[:, s * self.dsub : (s + 1) * self.dsub],
                    self.codebooks[s],
                    "sqeuclidean",
                )
            codes = self.codes[vs:ve]  # (sz, m_sub) uint8
            # ADC: d(q, x) ~= sum_s lut[q, s, codes[x, s]]; the gather is
            # chunked over queries so the (nq, sz, m_sub) intermediate
            # stays under ~64 MiB
            flat = lut.reshape(len(qs), self.m_sub * ksub)
            idx = codes.astype(np.int64) + np.arange(self.m_sub) * ksub
            qc = max(1, (64 << 20) // max(1, sz * self.m_sub * 8))
            d_adc = np.empty((len(qs), sz))
            for a in range(0, len(qs), qc):
                b = min(a + qc, len(qs))
                d_adc[a:b] = flat[a:b][:, idx].sum(axis=2)
            kk = min(margin, sz)
            if kk < sz:
                part = np.argpartition(d_adc, kth=kk - 1, axis=1)[:, :kk]
                dsel = np.take_along_axis(d_adc, part, axis=1)
            else:
                part = np.broadcast_to(np.arange(sz), (len(qs), sz))
                dsel = d_adc
            cq_l.append(np.repeat(qs, kk))
            cd_l.append(dsel.ravel())
            ci_l.append(self.sorted_ids[vs:ve][part].ravel())
            cp_l.append((part + vs).ravel())
        if not cq_l:
            return np.full((n, k), np.nan), np.full((n, k), -1, dtype=np.int64)
        cand_q = np.concatenate(cq_l)
        cand_d = np.concatenate(cd_l)
        cand_i = np.concatenate(ci_l)
        cand_p = np.concatenate(cp_l)
        if self.refine and self.sorted_vecs is not None:
            # exact re-rank of the ADC shortlist against raw vectors
            diff = q[cand_q] - self.sorted_vecs[cand_p]
            cand_d = np.einsum("nd,nd->n", diff, diff)
        if exclude_ids is not None:
            cand_d[cand_i == exclude_ids[cand_q]] = np.inf
        out_d, out_i = _scatter_topk(cand_q, cand_d, cand_i, n, k)
        if self.metric in ("euclidean", "l2"):
            np.sqrt(out_d, out=out_d)
        elif self.metric == "cosine":
            out_d *= 0.5  # normalized vectors: cos_dist = sqdist / 2
        return out_d, out_i


class GraphIndex:
    """Graph-ANN: beam search over a symmetrized kNN graph (pure numpy).

    The HNSW/NGT regime of the reference's nmslib/nng backends
    (/root/reference/kiez/neighbors/approximate/nmslib.py:20-163,
    nng.py:29-267) — greedy routing over neighbor links with a beam —
    rebuilt batch-first so every hop is vectorized ACROSS queries:

     - build: approximate kNN graph from per-cell GEMMs (IVF assignment),
       symmetrized (u->v adds v->u) and truncated to ``m_links`` per node;
       entry points = the member nearest each coarse centroid;
     - search: all queries advance in lockstep. Each hop expands the
       ``expand`` best unexpanded pool entries per query, gathers their
       neighbors, scores them with one fused einsum, and merges by a
       row-wise (id, dist) dedupe + top-ef truncation. Stops when no query
       has unexpanded candidates or after ``max_hops``.

    Padding follows the reference's nmslib semantics (ind=-1 / dist=NaN
    for unreachable slots, nmslib.py:142-149).
    """

    def __init__(
        self,
        metric: str = "euclidean",
        m_links: int = 24,
        ef_search: int = 96,
        max_hops: int = 30,
        expand: int = 8,
        nlist: int = 64,
        seed: int = 42,
    ):
        if metric not in (
            "euclidean", "l2", "sqeuclidean", "minkowski", "cosine",
            "ip", "innerproduct", "inner_product",
        ):
            raise ValueError(
                f"GraphIndex supports euclidean/sqeuclidean/cosine/ip, not {metric}"
            )
        self.metric = metric
        self.m_links = m_links
        self.ef_search = ef_search
        self.max_hops = max_hops
        self.expand = expand
        self.nlist = nlist
        self.seed = seed

    # -- internal rowwise scoring: q (n, d) against gathered X (n, K, d) --
    def _rowwise(self, qpre: np.ndarray, pos: np.ndarray) -> np.ndarray:
        X = self.vecs[pos]  # (n, K, d) gather
        dot = np.einsum("nd,nkd->nk", qpre, X)
        if self.metric in ("euclidean", "l2", "sqeuclidean", "minkowski"):
            return self._qn[:, None] - 2.0 * dot + self._xn[pos]
        if self.metric == "cosine":
            return 1.0 - dot
        return -dot  # ip

    def _prep_queries(self, q: np.ndarray) -> np.ndarray:
        if self.metric in ("euclidean", "l2", "sqeuclidean", "minkowski"):
            self._qn = np.einsum("ij,ij->i", q, q)
            return q
        if self.metric == "cosine":
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qn[qn == 0] = 1.0
            return q / qn
        return q

    def _finalize_dist(self, d: np.ndarray) -> np.ndarray:
        if self.metric in ("euclidean", "l2", "minkowski"):
            return np.sqrt(np.maximum(d, 0.0))
        return d

    def build(self, ids: np.ndarray, vecs: np.ndarray) -> None:
        self.ids = np.ascontiguousarray(ids, dtype=np.int64)
        vecs = np.ascontiguousarray(vecs, dtype=np.float64)
        if self.metric == "cosine":
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            vecs = vecs / norms
        self.vecs = vecs
        m = len(vecs)
        self._xn = np.einsum("ij,ij->i", vecs, vecs)
        # approximate kNN graph via the vectorized IVF (positions, not ids)
        inner_metric = (
            "sqeuclidean"
            if self.metric in ("euclidean", "l2", "sqeuclidean", "minkowski")
            else self.metric
        )
        ivf = IvfIndex(
            inner_metric,
            nlist=min(self.nlist, m),
            nprobe=min(4, min(self.nlist, m)),
            seed=self.seed,
        )
        ivf.build(np.arange(m, dtype=np.int64), vecs)
        nd, nbr = ivf.search(vecs, self.m_links + 1)
        # entry points: the member nearest each coarse centroid
        cd = pairwise_distances(ivf.centroids, vecs, inner_metric)
        self.entries = np.unique(cd.argmin(axis=1))
        # symmetrize: every edge u->v also contributes v->u, then per-node
        # top-m_links by distance (vectorized: flat edge list + lexsort)
        src = np.repeat(np.arange(m), nbr.shape[1])
        dst = nbr.ravel()
        dd = nd.ravel()
        keep = (dst >= 0) & (dst != src)
        src, dst, dd = src[keep], dst[keep], dd[keep]
        u = np.concatenate([src, dst])
        v = np.concatenate([dst, src])
        w = np.concatenate([dd, dd])
        order = np.lexsort((v, w, u))
        u, v = u[order], v[order]
        # dedupe (u, v) then rank within u
        first = np.concatenate(([True], (u[1:] != u[:-1]) | (v[1:] != v[:-1])))
        u, v = u[first], v[first]
        starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        grp = np.cumsum(np.concatenate(([True], u[1:] != u[:-1]))) - 1
        rank = np.arange(len(u)) - starts[grp]
        sel = rank < self.m_links
        self.graph = np.full((m, self.m_links), -1, dtype=np.int64)
        self.graph[u[sel], rank[sel]] = v[sel]

    def search(
        self, q: np.ndarray, k: int, exclude_ids: np.ndarray | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        q = np.ascontiguousarray(q, dtype=np.float64)
        n = len(q)
        m = len(self.vecs)
        qpre = self._prep_queries(q)
        ef = max(self.ef_search, k + (1 if exclude_ids is not None else 0))
        # seed pool: nearest entry points per query
        ent = self.entries
        d0 = self._rowwise(qpre, np.broadcast_to(ent, (n, len(ent))))
        s = min(ef, len(ent))
        seed_order = np.argsort(d0, axis=1, kind="stable")[:, :s]
        pool_p = np.take_along_axis(
            np.broadcast_to(ent, (n, len(ent))), seed_order, axis=1
        ).copy()
        pool_d = np.take_along_axis(d0, seed_order, axis=1)
        pool_e = np.zeros_like(pool_p, dtype=bool)  # expanded flags
        for _ in range(self.max_hops):
            key = np.where(pool_e | ~np.isfinite(pool_d), np.inf, pool_d)
            B = min(self.expand, pool_p.shape[1])
            exp_cols = np.argpartition(key, kth=B - 1, axis=1)[:, :B]
            exp_key = np.take_along_axis(key, exp_cols, axis=1)
            any_new = np.isfinite(exp_key).any()
            if not any_new:
                break
            np.put_along_axis(pool_e, exp_cols, True, axis=1)
            exp_pos = np.take_along_axis(pool_p, exp_cols, axis=1)
            nb = self.graph[exp_pos].reshape(n, -1)  # (n, B*M)
            valid = nb >= 0
            nb_safe = np.where(valid, nb, 0)
            nd = self._rowwise(qpre, nb_safe)
            nd = np.where(valid, nd, np.inf)
            # merge + row-wise dedupe by position, expanded-first so an
            # already-expanded copy suppresses its fresh duplicate
            ci = np.concatenate([pool_p, nb_safe], axis=1)
            cd = np.concatenate([pool_d, nd], axis=1)
            ce = np.concatenate([pool_e, np.zeros_like(valid)], axis=1)
            order = np.lexsort(
                (np.where(ce, 0, 1), np.where(np.isfinite(cd), cd, np.inf), ci),
                axis=-1,
            )
            ci = np.take_along_axis(ci, order, axis=1)
            cd = np.take_along_axis(cd, order, axis=1)
            ce = np.take_along_axis(ce, order, axis=1)
            dup = np.zeros_like(ce)
            dup[:, 1:] = ci[:, 1:] == ci[:, :-1]
            cd = np.where(dup, np.inf, cd)
            # keep best ef by (dist, position)
            order2 = np.lexsort((ci, cd), axis=-1)[:, :ef]
            pool_p = np.take_along_axis(ci, order2, axis=1)
            pool_d = np.take_along_axis(cd, order2, axis=1)
            pool_e = np.take_along_axis(ce, order2, axis=1)
        # final top-k by (dist, global id) with exclusion
        gids = self.ids[pool_p]
        dist = pool_d.copy()
        if exclude_ids is not None:
            dist[gids == exclude_ids[:, None]] = np.inf
        key = np.where(np.isfinite(dist), dist, np.inf)
        order = np.lexsort((gids, key), axis=-1)[:, : min(k, key.shape[1])]
        out_d = np.take_along_axis(dist, order, axis=1)
        out_i = np.take_along_axis(gids, order, axis=1)
        out_d = self._finalize_dist(out_d)
        out_d, out_i = _pad(out_d, out_i, k)
        bad = ~np.isfinite(out_d)
        out_d[bad] = np.nan
        out_i[bad] = -1
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
    "graph": GraphIndex,
    "hnsw": GraphIndex,
    "ivfpq": IvfPqIndex,
    "pq": IvfPqIndex,
    "rpforest": RpForestIndex,
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
    # graph ANN backends of the reference map onto the graph index (same
    # greedy-routing regime); annoy maps onto the random-projection
    # forest (same tree-ensemble regime) — capability parity, not a port
    if name in ("nmslib", "nng"):
        name = "graph"
    if name == "annoy":
        name = "rpforest"
    if name not in INDEX_REGISTRY:
        raise ValueError(
            f"Unknown algorithm {algorithm!r}; options: {sorted(INDEX_REGISTRY)}"
        )
    return INDEX_REGISTRY[name](**kwargs)

"""Transitive clustering: connected components via vectorized shuffles.

The reference has no clustering; this stage is specified by the north rule
(BASELINE.json.north_rule): matched pairs -> transitive clusters. The
algorithm is distributed min-label propagation:

    label(node) <- min over {label(node)} ∪ {label(u) : (u, node) edge}

iterated to fixpoint. Each iteration is one hash join (adjacency x labels,
Ray's native ``Dataset.join``) plus one grouped Min aggregate — both
C-level vectorized shuffles, no per-row Python. Convergence is detected
with a join of the old and new label tables (changed-row count).

String node ids are supported: Min aggregates lexicographically, so the
component id is the minimum node id reachable (same semantics for int64
ids, matching the SQL oracle's ``min(reachable vec_id)``).

Scale notes: label/adjacency tables are one row per node/edge; iterations
are O(component diameter) (entity-resolution clusters are near-cliques,
so 2-4 rounds). Hot nodes are bounded upstream by the pair-generation
group cap. ``num_partitions`` sizes the join shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pandas as pd
import ray.data
from ray.data.aggregate import Min


def connected_components(
    edges_ds: "ray.data.Dataset",
    extra_nodes_ds: "ray.data.Dataset" = None,
    max_iter: int = 50,
    num_partitions: int = 16,
    driver_threshold: int = 2_000_000,
) -> "ray.data.Dataset":
    """edges (a, b) [+ optional isolated nodes (node)] -> (node, component).

    Component id is the minimum node id (numeric or lexicographic for
    strings) reachable from the node. Isolated extra nodes keep their own
    id as component.

    When the edge table is provably small (count <= driver_threshold) the
    closure runs as driver-side union-find on the collected edge columns —
    the edge table is orders of magnitude smaller than the corpus, and one
    pass of union-find beats several join shuffles. Larger graphs take the
    distributed label-propagation loop. Set driver_threshold=0 to force
    the distributed path (tests do).
    """
    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges <= driver_threshold:
        return _cc_driver(edges_ds, extra_nodes_ds)
    return _cc_distributed(
        edges_ds, extra_nodes_ds, max_iter, num_partitions
    )


def _cc_driver(edges_ds, extra_nodes_ds):
    import ray

    edges = []
    for b in edges_ds.select_columns(["a", "b"]).iter_batches(
        batch_format="pyarrow"
    ):
        edges.extend(zip(b["a"].to_pylist(), b["b"].to_pylist()))
    nodes = []
    if extra_nodes_ds is not None:
        for b in extra_nodes_ds.select_columns(["node"]).iter_batches(
            batch_format="pyarrow"
        ):
            nodes.extend(b["node"].to_pylist())
    comp = connected_components_local(edges, nodes=nodes)
    keys = sorted(comp)
    tbl = pa.table(
        {
            "node": pa.array(keys),
            "component": pa.array([comp[k] for k in keys]),
        }
    )
    return ray.data.from_arrow(tbl)


def _cc_distributed(
    edges_ds: "ray.data.Dataset",
    extra_nodes_ds,
    max_iter: int,
    num_partitions: int,
) -> "ray.data.Dataset":
    # undirected adjacency, pinned once (iterations must not re-execute the
    # upstream pair-generation pipeline)
    adj = edges_ds.map_batches(
        lambda t: pa.table(
            {
                "src": pa.concat_arrays(
                    [t["a"].combine_chunks(), t["b"].combine_chunks()]
                ),
                "dst": pa.concat_arrays(
                    [t["b"].combine_chunks(), t["a"].combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    nodes = adj.select_columns(["src"]).map_batches(
        lambda t: pa.table({"node": t["src"]}), batch_format="pyarrow"
    )
    if extra_nodes_ds is not None:
        nodes = nodes.union(extra_nodes_ds.select_columns(["node"]))
    labels = (
        nodes.groupby("node")
        .aggregate(Min("node", alias_name="label"))
        .materialize()
    )

    for _ in range(max_iter):
        # (1) neighbor-min: pull each neighbor's label across every edge
        msgs = adj.join(
            labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("node",),
        ).map_batches(
            lambda t: pa.table({"node": t["dst"], "label": t["label"]}),
            batch_format="pyarrow",
        )
        stepped = (
            msgs.union(labels)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        # (2) pointer-doubling shortcut: label <- label(label). Label values
        # are themselves node ids, so a self-join halves tree depth per
        # round; with (1) this converges in O(log diameter) iterations
        # (Shiloach-Vishkin style) instead of O(diameter).
        new_labels = stepped.join(
            stepped.map_batches(
                lambda t: pa.table({"node2": t["node"], "label2": t["label"]}),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("label",),
            right_on=("node2",),
        ).map_batches(
            lambda t: pa.table({"node": t["node"], "label": t["label2"]}),
            batch_format="pyarrow",
        ).materialize()
        changed_ds = new_labels.join(
            labels.map_batches(
                lambda t: pa.table({"node": t["node"], "old": t["label"]}),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("node",),
        ).map_batches(
            lambda t: pa.table(
                {
                    "changed": pc.cast(
                        pc.not_equal(t["label"], t["old"]), pa.int64()
                    )
                }
            ),
            batch_format="pyarrow",
        )
        labels = new_labels
        if not changed_ds.sum("changed"):
            break
    return labels.map_batches(
        lambda t: pa.table({"node": t["node"], "component": t["label"]}),
        batch_format="pyarrow",
    )


def connected_components_local(edges: list[tuple], nodes=None) -> dict:
    """Driver-side union-find oracle for tests (same min-label semantics)."""
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        for v in (x, y):
            if v not in parent:
                parent[v] = v
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for a, b in edges:
        union(a, b)
    if nodes:
        for nd in nodes:
            parent.setdefault(nd, nd)
    return {x: find(x) for x in parent}


def sq_assign(x: np.ndarray, c: np.ndarray):
    """Squared-distance argmin assignment — THE one copy of the
    numerically-sensitive kernel shared by the kmeans trainer, its final
    assignment pass, and semantic_dedup's assign/sub-split reassign
    (dedup.py), so tie-breaking and clamping can never desynchronize
    sub-cluster membership from training.

    ||x-c||² = ||x||² - 2x·c + ||c||²; argmin ties -> lowest index;
    distances clamped at zero against float cancellation."""
    d2 = (
        (x * x).sum(axis=1, keepdims=True)
        - 2.0 * (x @ c.T)
        + (c * c).sum(axis=1)
    )
    a = np.argmin(d2, axis=1)
    return a, np.maximum(d2[np.arange(len(x)), a], 0.0)


def kmeans(
    ds: "ray.data.Dataset",
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 10,
    seed: int = 0,
) -> "tuple[ray.data.Dataset, np.ndarray]":
    """Distributed Lloyd's k-means over an embedding column — the
    iterative-algorithm shape Ray Data has no native operator for (and
    the trainer behind any IVF coarse quantizer at corpus scale; the
    in-memory counterpart is ``IvfIndex._kmeans``, index.py).

    Returns ``(assignments, centroids)``: a Dataset of
    (id, cluster, dist) rows plus the final (k, d) centroid matrix.

    Scale shape: each of the ``iters`` rounds is ONE streaming pass —
    centroids go to the object store once per round (``ray.put``; every
    task reads them zero-copy, never re-shipped per batch), each batch
    computes assignments with one GEMM and collapses to k partial
    (count, sum-vector) rows, and the driver folds only k×d floats per
    batch — never a row of data. No shuffle anywhere; empty clusters
    keep their previous centroid. Initialization is a deterministic
    hash-priority sample (partitioning-invariant), so the whole run is
    reproducible under any block layout.
    """
    import ray

    from .arrowutil import emb_to_matrix
    from .sample import bottomk_sample

    init = bottomk_sample(
        ds.select_columns([id_col, vec_col]), id_col, k, seed
    ).to_pandas()
    order = np.argsort(init[id_col].to_numpy(), kind="stable")
    cent = np.stack(init[vec_col].to_numpy()[order]).astype(np.float64)
    k_eff, d = cent.shape

    for _ in range(iters):
        cref = ray.put(cent)

        def partial(t: pa.Table) -> pa.Table:
            x = emb_to_matrix(t[vec_col]).astype(np.float64)
            c = ray.get(cref)
            a, _ = sq_assign(x, c)
            cnt = np.bincount(a, minlength=k_eff).astype(np.int64)
            sums = np.zeros((k_eff, d), dtype=np.float64)
            np.add.at(sums, a, x)
            return pa.table(
                {
                    "c": pa.array(np.arange(k_eff), pa.int64()),
                    "n": pa.array(cnt, pa.int64()),
                    "s": pa.FixedSizeListArray.from_arrays(
                        pa.array(sums.ravel(), pa.float64()), d
                    ),
                }
            )

        tot_n = np.zeros(k_eff, dtype=np.int64)
        tot_s = np.zeros((k_eff, d), dtype=np.float64)
        for b in ds.map_batches(
            partial, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow", batch_size=None):
            ci = b["c"].to_numpy(zero_copy_only=False)
            np.add.at(tot_n, ci, b["n"].to_numpy(zero_copy_only=False))
            np.add.at(tot_s, ci, emb_to_matrix(b["s"]))
        nz = tot_n > 0
        cent = cent.copy()
        cent[nz] = tot_s[nz] / tot_n[nz, None]

    cref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        x = emb_to_matrix(t[vec_col]).astype(np.float64)
        a, d2 = sq_assign(x, ray.get(cref))
        return pa.table(
            {
                id_col: pc.cast(t[id_col], pa.int64()),
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
                "dist": pa.array(np.sqrt(d2), pa.float64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow"), cent


def triangle_count(
    edges_ds: "ray.data.Dataset",
    a_col: str = "a",
    b_col: str = "b",
    num_partitions: int = 64,
) -> int:
    """Exact triangle count of an undirected graph given as (a, b) edge
    rows (either orientation, duplicates tolerated).

    The node-iterator algorithm in two shuffles, each triangle counted
    exactly once at its minimum vertex: (1) edges normalize to a < b and
    hash-partition on ``a`` so each partition holds complete
    greater-neighbor lists N+(u) = {v : u<v, (u,v) in E} for its nodes,
    and emits every wedge (v, w), v < w, from each list — vectorized
    pair enumeration, no per-node Python; (2) wedges and edges
    hash-partition on the packed (v, w) key and each partition counts
    wedge keys that are also edge keys via one ``np.searchsorted`` over
    its sorted edge keys. Wedge volume is sum_u deg+(u)^2/2 — bounded
    for kNN-type graphs (deg <= k); salt hot vertices upstream for
    power-law graphs.
    """
    from .dedup import _splitmix64

    def norm(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        part = (
            _splitmix64(lo.astype(np.uint64)) % np.uint64(num_partitions)
        ).astype(np.int32)
        return pa.table(
            {
                "a": pa.array(lo, pa.int64()),
                "b": pa.array(hi, pa.int64()),
                "__part": pa.array(part, pa.int32()),
            }
        )

    ndist = edges_ds.map_batches(norm, batch_format="pyarrow")

    def wedges_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"v": pd.Series(dtype=np.int64), "w": pd.Series(dtype=np.int64)}
        )
        if len(g) == 0:
            return empty
        a = g["a"].to_numpy()
        b = g["b"].to_numpy()
        # dedupe edges, group by center a; neighbor lists arrive b-sorted
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.concatenate(
            ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1]))
        )
        a, b = a[keep], b[keep]
        starts = np.flatnonzero(
            np.concatenate(([True], a[1:] != a[:-1]))
        )
        deg = np.diff(np.append(starts, len(a)))
        # all ordered pairs (v, w) v<w within each neighbor run: for run
        # of length d there are d*(d-1)/2 wedges; enumerate via a flat
        # arange split into per-run local (i, j) index pairs
        npairs = deg * (deg - 1) // 2
        tot = int(npairs.sum())
        if tot == 0:
            return empty
        run = np.repeat(np.arange(len(deg)), npairs)
        loc = np.arange(tot) - np.repeat(
            np.concatenate(([0], np.cumsum(npairs)[:-1])), npairs
        )
        d = deg[run]
        # unrank flat wedge index -> (i, j), i<j, within a d-neighbor
        # run: with rem = M - loc pairs remaining (M = d(d-1)/2), the
        # first index i = d - x where x is minimal with x(x-1)/2 >= rem
        # (closed form + integer fixup against sqrt rounding)
        M = npairs[run]
        rem = M - loc
        x = ((1.0 + np.sqrt(8.0 * rem + 1.0)) / 2.0).astype(np.int64)
        x += x * (x - 1) // 2 < rem
        i = d - x
        j = i + 1 + (loc - (M - x * (x - 1) // 2))
        base = starts[run]
        return pd.DataFrame({"v": b[base + i], "w": b[base + j]})

    wedges = ndist.groupby("__part").map_groups(
        wedges_partition, batch_format="pandas"
    )

    def pack(t: pa.Table, va: str, vb: str, side: int) -> pa.Table:
        v = t[va].to_numpy(zero_copy_only=False).astype(np.uint64)
        w = t[vb].to_numpy(zero_copy_only=False).astype(np.uint64)
        key = _splitmix64(v) ^ _splitmix64(~w)
        part = (
            _splitmix64(key) % np.uint64(num_partitions)
        ).astype(np.int32)
        return pa.table(
            {
                "key": pa.array(key.astype(np.int64), pa.int64()),
                "__side": pa.array(
                    np.full(len(t), side, dtype=np.int8), pa.int8()
                ),
                "__part": pa.array(part, pa.int32()),
            }
        )

    tagged = wedges.map_batches(
        lambda t: pack(t, "v", "w", 0), batch_format="pyarrow"
    ).union(
        ndist.map_batches(
            lambda t: pack(t, "a", "b", 1), batch_format="pyarrow"
        )
    )

    def count_partition(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"n": pd.Series(dtype=np.int64)})
        keys = g["key"].to_numpy()
        side = g["__side"].to_numpy()
        ek = np.unique(keys[side == 1])
        wk = keys[side == 0]
        if len(ek) == 0 or len(wk) == 0:
            return pd.DataFrame({"n": [0]})
        pos = np.searchsorted(ek, wk)
        pos_c = np.minimum(pos, len(ek) - 1)
        return pd.DataFrame({"n": [int((ek[pos_c] == wk).sum())]})

    partials = (
        tagged.groupby("__part")
        .map_groups(count_partition, batch_format="pandas")
        .to_pandas()  # <= num_partitions rows
    )
    return int(partials["n"].sum())


def pagerank(
    edges_ds: "ray.data.Dataset",
    damping: float = 0.85,
    iters: int = 5,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Simplified PageRank (fixed iteration count, NO dangling-mass
    redistribution — mass leaks at sinks, matching the unrolled SQL
    recurrence) over a directed (src, dst) edge list:

        r_0(v)   = 1/N
        r_t+1(v) = (1-d)/N + d * sum_{u->v} r_t(u) / outdeg(u)

    Output: (node int64, rank float64). The iterative SHUFFLE-JOIN
    regime (contrast: distributed k-means broadcasts its tiny centroid
    state): the edge relation is joined with the rank table every
    iteration, so at scale the join partitioning is the whole game —
    edges and degrees are joined ONCE and pinned (materialized), and
    each iteration is one hash join on src (rank arrives, edges never
    move again under Ray's hash-shuffle join) + one coarse-partition
    reduceat fold per dst + one left join back onto the node table so
    in-degree-0 nodes keep their base rank. Per-iteration cost is
    2 shuffles of O(E) and one of O(V); driver holds only N.
    """
    from .dedup import _splitmix64

    if num_partitions is None:
        # join partitions sized to the cluster: every hash join spawns
        # num_partitions aggregator actors, and an iteration chains two
        # joins — oversubscribing a small CPU budget deadlocks the
        # streaming executor (same sizing as ngram_jaccard_pairs)
        cpus = (
            int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized()
            else 8
        )
        num_partitions = max(2, min(16, cpus // 2))

    edges = edges_ds.select_columns(["src", "dst"]).materialize()

    def as_node(col):
        return lambda t: pa.table(
            {"node": pc.cast(t[col], pa.int64())}
        )

    nodes = (
        edges.map_batches(as_node("src"), batch_format="pyarrow")
        .union(edges.map_batches(as_node("dst"), batch_format="pyarrow"))
        .groupby("node")
        .aggregate(Min("node", alias_name="__m"))
        .select_columns(["node"])
        .materialize()
    )
    n_nodes = nodes.count()

    # out-degrees: exact int combiner fold, joined to the edges ONCE
    def deg_partial(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        u, c = np.unique(s, return_counts=True)
        return pa.table(
            {
                "dsrc": pa.array(u, pa.int64()),
                "outdeg": pa.array(c, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    deg = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("dsrc")
        .aggregate(Sum("outdeg", alias_name="d"))
    )
    edges_deg = edges.join(
        deg,
        join_type="inner",
        num_partitions=num_partitions,
        on=("src",),
        right_on=("dsrc",),
    ).materialize()

    rank = nodes.map_batches(
        lambda t: t.append_column(
            "r", pa.array(np.full(len(t), 1.0 / n_nodes), pa.float64())
        ),
        batch_format="pyarrow",
    ).materialize()

    base = (1.0 - damping) / n_nodes

    def contrib(t: pa.Table) -> pa.Table:
        r = t["r"].to_numpy(zero_copy_only=False)
        d = t["d"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "dst": pc.cast(t["dst"], pa.int64()),
                "c": pa.array(r / d, pa.float64()),
            }
        )

    def add_part(t: pa.Table) -> pa.Table:
        k = t["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (_splitmix64(k) % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("__part", pa.array(part, pa.int32()))

    def sum_partition(g: pa.Table) -> pa.Table:
        k = g["dst"].to_numpy(zero_copy_only=False)
        v = g["c"].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        starts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        return pa.table(
            {
                "dst": pa.array(k[starts], pa.int64()),
                "csum": pa.array(np.add.reduceat(v, starts), pa.float64()),
            }
        )

    for _ in range(iters):
        msgs = edges_deg.join(
            rank,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("node",),
        ).map_batches(contrib, batch_format="pyarrow")
        folded = (
            msgs.map_batches(add_part, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(sum_partition, batch_format="pyarrow")
        )
        rank = (
            nodes.join(
                folded,
                join_type="left_outer",
                num_partitions=num_partitions,
                on=("node",),
                right_on=("dst",),
            )
            .map_batches(
                lambda t: pa.table(
                    {
                        "node": t["node"],
                        "r": pa.array(
                            base
                            + damping
                            * np.nan_to_num(
                                t["csum"]
                                .to_numpy(zero_copy_only=False)
                                .astype(np.float64)
                            ),
                            pa.float64(),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()  # pin: next iteration must not re-run this one
        )
    return rank


def _degree_ds(
    edges_ds: "ray.data.Dataset",
    a_col: str,
    b_col: str,
    num_partitions: int,
) -> "ray.data.Dataset":
    """(node, deg) over unique undirected (a, b) edge rows — in-batch
    bincount combiner before ONE key-hash shuffle; traffic is
    O(distinct nodes per batch), never O(edges)."""
    from .dedup import _splitmix64

    def partial(t: pa.Table) -> pa.Table:
        u = np.concatenate(
            [
                t[a_col].to_numpy(zero_copy_only=False),
                t[b_col].to_numpy(zero_copy_only=False),
            ]
        ).astype(np.int64)
        uu, cnt = np.unique(u, return_counts=True)
        part = (
            _splitmix64(uu.astype(np.uint64)) % np.uint64(num_partitions)
        ).astype(np.int32)
        return pa.table(
            {
                "node": pa.array(uu, pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                "__part": pa.array(part, pa.int32()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "node": pd.Series(dtype=np.int64),
                    "deg": pd.Series(dtype=np.int64),
                }
            )
        n = g["node"].to_numpy()
        c = g["cnt"].to_numpy()
        order = np.argsort(n, kind="stable")
        n, c = n[order], c[order]
        starts = np.flatnonzero(np.concatenate(([True], n[1:] != n[:-1])))
        return pd.DataFrame(
            {"node": n[starts], "deg": np.add.reduceat(c, starts)}
        )

    return (
        edges_ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("__part")
        .map_groups(fold, batch_format="pandas")
    )


def kcore(
    edges_ds: "ray.data.Dataset",
    k: int,
    a_col: str = "a",
    b_col: str = "b",
    num_partitions: int = 64,
    distributed_rounds: int = 3,
    local_edge_gate: int = 2_000_000,
) -> tuple["ray.data.Dataset", int]:
    """Exact k-core (maximal subgraph of minimum degree >= k) by
    two-phase peeling. Input must be UNIQUE undirected edge rows
    (either orientation, no duplicates — e.g. ``dedup_pair_rows``
    output); returns ``(nodes_ds['node'], rounds)``.

    Peeling to the fixpoint can need O(n) rounds (a fringe chain peels
    one node per round), so a purely round-synchronous distributed loop
    is the wrong shape. Phase 1 runs up to ``distributed_rounds``
    synchronous peel rounds — one degree pass (in-batch bincount
    combiner + key-hash shuffle) plus two ``relops.semi_join`` passes
    each, materialized so round r+1 never re-executes round r — which
    removes the heavy fringe mass (each round strictly shrinks the
    graph or proves the fixpoint). Phase 2 collects the surviving edge
    list (ids only, 16 B/edge) under ``local_edge_gate`` and finishes
    the long convergence tail with a vectorized in-memory bincount
    peel — the same big/small gate ``connected_components`` uses for
    its union-find tail. Raises if the survivor graph still exceeds
    the gate (raise the gate or ``distributed_rounds`` for denser
    graphs).
    """
    import ray

    from .relops import semi_join

    cur = edges_ds
    prev_n = -1
    rounds = 0
    for _ in range(distributed_rounds):
        rounds += 1
        deg = _degree_ds(cur, a_col, b_col, num_partitions)
        nodes = (
            deg.filter(expr=f"deg >= {int(k)}")
            .select_columns(["node"])
            .materialize()
        )
        n = nodes.count()
        if n == prev_n:  # monotone peel: unchanged count IS the fixpoint
            return nodes, rounds
        prev_n = n
        cur = semi_join(cur, nodes, a_col, "node")
        cur = semi_join(cur, nodes, b_col, "node").materialize()
        if cur.count() <= local_edge_gate:
            break
    n_edges = cur.count()
    if n_edges == 0:
        return (
            ray.data.from_arrow(pa.table({"node": pa.array([], pa.int64())})),
            rounds,
        )
    if n_edges > local_edge_gate:
        raise RuntimeError(
            f"kcore: {n_edges} edges survive {rounds} distributed rounds, "
            f"above the local finish gate ({local_edge_gate}); raise "
            "distributed_rounds or local_edge_gate"
        )
    tbl = pa.concat_tables(ray.get(cur.to_arrow_refs()))
    a = tbl[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
    b = tbl[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
    ids = np.unique(np.concatenate([a, b]))
    ca = np.searchsorted(ids, a)
    cb = np.searchsorted(ids, b)
    alive = np.ones(len(a), dtype=bool)
    while True:
        rounds += 1
        deg = np.bincount(ca[alive], minlength=len(ids)) + np.bincount(
            cb[alive], minlength=len(ids)
        )
        node_ok = deg >= k
        keep = alive & node_ok[ca] & node_ok[cb]
        if keep.sum() == alive.sum():
            break
        alive = keep
    deg = np.bincount(ca[alive], minlength=len(ids)) + np.bincount(
        cb[alive], minlength=len(ids)
    )
    core = ids[deg >= k]
    return (
        ray.data.from_arrow(
            pa.table({"node": pa.array(core, pa.int64())})
        ),
        rounds,
    )


def jaccard_link_prediction(
    edges_ds: "ray.data.Dataset",
    topn: int = 50,
    a_col: str = "a",
    b_col: str = "b",
    num_partitions: int = 64,
) -> pd.DataFrame:
    """Common-neighbor Jaccard link prediction over a unique undirected
    (a < b) edge set: for every NON-adjacent pair (x, y) with at least
    one shared neighbor, ``jac = |N(x) ∩ N(y)| / |N(x) ∪ N(y)|``;
    returns the global top ``topn`` by (jac desc, x, y).

    Scale shape: wedge enumeration per center partition (complete
    adjacency lists co-located by ONE center-hash shuffle, pairs via
    the vectorized ``_run_pairs``), intersection counts + existing-edge
    suppression on ONE packed-pair-key shuffle (edges ride tagged into
    the same partition), degrees attach by two key-hash joins, and the
    global top-n is a per-partition partial top-n + driver merge of
    O(partitions · topn) rows — no global sort, wedge volume is
    Σ deg(u)²/2 (bounded for kNN graphs; salt hot vertices upstream
    for power-law degree distributions).
    """
    from .block import _run_pairs
    from .dedup import _splitmix64

    def adj(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.concatenate([a, b])
        v = np.concatenate([b, a])
        part = (
            _splitmix64(u.astype(np.uint64)) % np.uint64(num_partitions)
        ).astype(np.int32)
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "__part": pa.array(part, pa.int32()),
            }
        )

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"x": pd.Series(dtype=np.int64), "y": pd.Series(dtype=np.int64)}
        )
        if len(g) == 0:
            return empty
        u = g["u"].to_numpy()
        v = g["v"].to_numpy()
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        lengths = np.diff(np.append(starts, len(u)))
        i, j = _run_pairs(starts, lengths)
        if len(i) == 0:
            return empty
        return pd.DataFrame({"x": v[i], "y": v[j]})

    wedge_ds = (
        edges_ds.map_batches(adj, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(wedges, batch_format="pandas")
    )

    def tag(x_col: str, y_col: str, is_edge: int):
        def fn(t: pa.Table) -> pa.Table:
            x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
            y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
            key = _splitmix64(x.astype(np.uint64)) ^ _splitmix64(
                ~y.astype(np.uint64)
            )
            part = (key % np.uint64(num_partitions)).astype(np.int32)
            return pa.table(
                {
                    "x": pa.array(x, pa.int64()),
                    "y": pa.array(y, pa.int64()),
                    "e": pa.array(
                        np.full(len(x), is_edge, np.int8), pa.int8()
                    ),
                    "__part": pa.array(part, pa.int32()),
                }
            )

        return fn

    tagged = wedge_ds.map_batches(
        tag("x", "y", 0), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        edges_ds.map_batches(
            tag(a_col, b_col, 1), batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def inter_counts(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "x": pd.Series(dtype=np.int64),
                "y": pd.Series(dtype=np.int64),
                "inter": pd.Series(dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        x = g["x"].to_numpy()
        y = g["y"].to_numpy()
        e = g["e"].to_numpy()
        order = np.lexsort((y, x))
        x, y, e = x[order], y[order], e[order]
        new = np.concatenate(([True], (x[1:] != x[:-1]) | (y[1:] != y[:-1])))
        starts = np.flatnonzero(new)
        inter = np.add.reduceat((e == 0).astype(np.int64), starts)
        is_edge = np.add.reduceat((e == 1).astype(np.int64), starts) > 0
        keep = (~is_edge) & (inter > 0)  # non-adjacent with >=1 shared
        return pd.DataFrame(
            {"x": x[starts][keep], "y": y[starts][keep], "inter": inter[keep]}
        )

    cand = tagged.groupby("__part").map_groups(
        inter_counts, batch_format="pandas"
    )
    deg = _degree_ds(edges_ds, a_col, b_col, num_partitions).materialize()
    from .relops import hash_join

    withx = hash_join(cand, deg, "x", "node", num_partitions=num_partitions)
    withx = withx.map_batches(
        lambda t: t.select(["x", "y", "inter", "deg"]).rename_columns(
            ["x", "y", "inter", "deg_x"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    withy = hash_join(withx, deg, "y", "node", num_partitions=num_partitions)

    def score_topn(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "x": pd.Series(dtype=np.int64),
                "y": pd.Series(dtype=np.int64),
                "inter": pd.Series(dtype=np.int64),
                "jac": pd.Series(dtype=np.float64),
            }
        )
        if len(g) == 0:
            return empty
        inter = g["inter"].to_numpy().astype(np.float64)
        union = (
            g["deg_x"].to_numpy() + g["deg"].to_numpy()
        ).astype(np.float64) - inter
        jac = inter / union
        x = g["x"].to_numpy()
        y = g["y"].to_numpy()
        order = np.lexsort((y, x, -jac))[:topn]
        return pd.DataFrame(
            {
                "x": x[order],
                "y": y[order],
                "inter": inter[order].astype(np.int64),
                "jac": jac[order],
            }
        )

    parts = (
        withy.map_batches(
            lambda t: t.append_column(
                "__p2",
                pa.array(
                    (
                        _splitmix64(
                            t["x"].to_numpy(zero_copy_only=False).astype(
                                np.uint64
                            )
                        )
                        % np.uint64(8)
                    ).astype(np.int32),
                    pa.int32(),
                ),
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("__p2")
        .map_groups(score_topn, batch_format="pandas")
        .to_pandas()
    )
    order = np.lexsort(
        (parts["y"].to_numpy(), parts["x"].to_numpy(), -parts["jac"].to_numpy())
    )[:topn]
    return parts.iloc[order].reset_index(drop=True)

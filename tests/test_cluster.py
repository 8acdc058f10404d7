"""Connected-components tests: driver and distributed paths agree."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from kiezray.cluster import (
    connected_components,
    connected_components_local,
)


def _edges_ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([e[0] for e in edges]),
                "b": pa.array([e[1] for e in edges]),
            }
        )
    )


@pytest.fixture(scope="module")
def random_graph():
    rng = np.random.RandomState(5)
    n = 300
    edges = [
        (int(min(a, b)), int(max(a, b)))
        for a, b in rng.randint(0, n, size=(400, 2))
        if a != b
    ]
    nodes = list(range(n))
    return edges, nodes


def test_driver_path_matches_local(random_graph):
    edges, nodes = random_graph
    nodes_ds = ray.data.from_arrow(pa.table({"node": pa.array(nodes, pa.int64())}))
    got = connected_components(_edges_ds(edges), extra_nodes_ds=nodes_ds)
    gdf = got.to_pandas().set_index("node")["component"].to_dict()
    want = connected_components_local(edges, nodes=nodes)
    assert gdf == want


def test_distributed_path_matches_local(random_graph):
    edges, nodes = random_graph
    nodes_ds = ray.data.from_arrow(pa.table({"node": pa.array(nodes, pa.int64())}))
    got = connected_components(
        _edges_ds(edges), extra_nodes_ds=nodes_ds, driver_threshold=0,
        num_partitions=4,
    )
    gdf = got.to_pandas().set_index("node")["component"].to_dict()
    want = connected_components_local(edges, nodes=nodes)
    assert gdf == want


def test_distributed_string_nodes():
    edges = [("b", "a"), ("c", "b"), ("x", "y"), ("q", "q2")]
    nodes_ds = ray.data.from_arrow(
        pa.table({"node": pa.array(["a", "b", "c", "x", "y", "q", "q2", "zz"])})
    )
    got = connected_components(
        _edges_ds(edges), extra_nodes_ds=nodes_ds, driver_threshold=0,
        num_partitions=2,
    )
    gdf = got.to_pandas().set_index("node")["component"].to_dict()
    assert gdf == {
        "a": "a", "b": "a", "c": "a", "x": "x", "y": "x",
        "q": "q", "q2": "q", "zz": "zz",
    }


def test_chain_graph_distributed():
    """Long chain exercises multi-iteration convergence."""
    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    got = connected_components(
        _edges_ds(edges), driver_threshold=0, num_partitions=2, max_iter=50
    )
    gdf = got.to_pandas()
    assert (gdf["component"] == 0).all()
    assert len(gdf) == n


def test_kmeans_recovers_planted_blobs(ray_session):
    import pandas as pd

    from kiezray.cluster import kmeans

    rng = np.random.RandomState(2)
    centers = np.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 8.0]])
    n_per = 200
    x = np.concatenate(
        [c + 0.3 * rng.standard_normal((n_per, 2)) for c in centers]
    )
    ids = np.arange(len(x), dtype=np.int64)
    tbl = pa.table(
        {
            "vid": pa.array(ids),
            "emb": pa.FixedSizeListArray.from_arrays(
                pa.array(x.ravel(), pa.float64()), 2
            ),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    assigned, cent = kmeans(ds, "vid", "emb", k=3, iters=8, seed=1)
    out = assigned.to_pandas().sort_values("vid").reset_index(drop=True)
    # every planted blob maps to exactly one k-means cluster
    truth = np.repeat(np.arange(3), n_per)
    ct = pd.crosstab(truth, out["cluster"].to_numpy())
    assert (ct.to_numpy() > 0).sum() == 3  # a 3x3 permutation matrix
    assert sorted(ct.to_numpy().max(axis=1)) == [n_per] * 3
    # centroids sit near the planted centers (in some order)
    got = cent[np.argsort(cent[:, 0])]
    want = centers[np.argsort(centers[:, 0])]
    assert np.abs(got - want).max() < 0.5

    # partitioning invariance: different block layout, identical labels
    again, _ = kmeans(ds.repartition(9), "vid", "emb", k=3, iters=8, seed=1)
    out2 = again.to_pandas().sort_values("vid").reset_index(drop=True)
    assert (out["cluster"].values == out2["cluster"].values).all()


def test_pagerank_matches_dense_reference(ray_session):
    """5-iteration simplified PageRank equals the dense matrix recurrence
    on a small directed graph with a sink (no dangling redistribution)
    and is invariant to edge partitioning."""
    import pandas as pd
    import ray

    from kiezray.cluster import pagerank

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 4)]
    # node 4 is a sink (no out-edges): its mass leaks, matching the
    # simplified recurrence
    nodes = sorted({v for e in edges for v in e})
    n = len(nodes)
    r = np.full(n, 1.0 / n)
    outdeg = np.zeros(n)
    for s, _ in edges:
        outdeg[s] += 1
    for _ in range(5):
        nxt = np.full(n, (1 - 0.85) / n)
        for s, d in edges:
            nxt[d] += 0.85 * r[s] / outdeg[s]
        r = nxt
    df = pd.DataFrame(edges, columns=["src", "dst"]).astype(np.int64)
    for parts in (1, 3):
        got = (
            pagerank(ray.data.from_pandas(df).repartition(parts), iters=5)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert list(got["node"]) == nodes
        np.testing.assert_allclose(got["r"].to_numpy(), r, atol=1e-12)


def _py_kcore(edges, k):
    """Reference set-based peel (exact fixpoint)."""
    E = {(a, b) for a, b in edges if a != b}
    nodes = {v for e in E for v in e}
    while True:
        deg = {}
        for a, b in E:
            if a in nodes and b in nodes:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
        keep = {n for n in nodes if deg.get(n, 0) >= k}
        if keep == nodes:
            return nodes
        nodes = keep


def test_kcore_planted_clique_and_chain(ray_session):
    """3-core of clique(6) + pendant chain + 4-cycle = exactly the
    clique; the chain/cycle (deg <= 2) must peel away even though the
    chain needs many peel rounds (exercises the local finish tail)."""
    from kiezray.cluster import kcore

    clique = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    chain = [(5 + i, 5 + i + 1) for i in range(1, 40)]  # pendant path
    chain.insert(0, (5, 6))  # attach to the clique
    cyc = [(100, 101), (101, 102), (102, 103), (103, 100)]
    edges = clique + chain + cyc
    nodes, rounds = kcore(_edges_ds(edges), k=3)
    got = sorted(nodes.to_pandas()["node"].tolist())
    assert got == [0, 1, 2, 3, 4, 5]
    assert sorted(_py_kcore(edges, 3)) == got


def test_kcore_random_graph_matches_python_peel(ray_session):
    from kiezray.cluster import kcore

    rng = np.random.RandomState(11)
    n = 400
    raw = {
        (int(min(a, b)), int(max(a, b)))
        for a, b in rng.randint(0, n, size=(1200, 2))
        if a != b
    }
    edges = sorted(raw)
    for k in (2, 3, 4):
        nodes, _ = kcore(_edges_ds(edges), k=k)
        got = sorted(nodes.to_pandas()["node"].tolist())
        assert got == sorted(_py_kcore(edges, k)), f"k={k}"


def test_jaccard_links_excludes_edges_and_matches_reference(ray_session):
    """Top pairs from the distributed wedge pipeline equal a
    brute-force common-neighbor Jaccard on a planted two-clique
    bridge graph, and never include existing edges."""
    from kiezray.cluster import jaccard_link_prediction

    clique1 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    clique2 = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    bridge = [(4, 10)]
    edges = clique1 + clique2 + bridge
    out = jaccard_link_prediction(_edges_ds(edges), topn=10)
    E = {(a, b) for a, b in edges}
    got_pairs = set(zip(out["x"].tolist(), out["y"].tolist()))
    assert not (got_pairs & E)
    # brute force
    adjm = {}
    for a, b in edges:
        adjm.setdefault(a, set()).add(b)
        adjm.setdefault(b, set()).add(a)
    best = {}
    for u in adjm:
        for v in adjm:
            if u < v and v not in adjm[u]:
                inter = len(adjm[u] & adjm[v])
                if inter:
                    best[(u, v)] = inter / len(adjm[u] | adjm[v])
    want = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = list(
        zip(
            zip(out["x"].tolist(), out["y"].tolist()),
            out["jac"].tolist(),
        )
    )
    assert [p for p, _ in got] == [p for p, _ in want]
    assert np.allclose([s for _, s in got], [s for _, s in want])

"""Transitive clustering: connected components as a groupby shuffle.

The reference has no clustering; this stage is specified by the north rule
(BASELINE.json.north_rule): matched pairs -> transitive clusters. The
algorithm is distributed min-label propagation:

    labels(node) <- min over {labels(node)} ∪ {labels(u) : (u, node) edge}

iterated to fixpoint. Each iteration is two grouped shuffles expressed with
``groupby().map_groups`` — no driver-side union-find, no join operator
required (the label lookup is folded into the first groupby by unioning
tagged label rows with tagged adjacency rows on the same key).

Scale notes: label tables are one row per node; edge tables one row per
edge (emitted in both directions). Convergence is O(component diameter)
iterations; entity-resolution clusters are near-cliques so 2-4 rounds are
typical. Hot nodes (hubs) are bounded by the pair-generation stage's group
cap (kiezray.block), which is the skew guard for this shuffle too.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _init_labels(edges_ds, extra_nodes_ds=None):
    a = edges_ds.select_columns(["a"]).map_batches(
        lambda t: pa.table({"node": t["a"]}), batch_format="pyarrow"
    )
    b = edges_ds.select_columns(["b"]).map_batches(
        lambda t: pa.table({"node": t["b"]}), batch_format="pyarrow"
    )
    nodes = a.union(b)
    if extra_nodes_ds is not None:
        nodes = nodes.union(extra_nodes_ds)
    # distinct via groupby-first
    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    nodes = nodes.groupby("node").map_groups(first, batch_format="pandas")
    return nodes.map_batches(
        lambda t: pa.table({"node": t["node"], "label": t["node"]}),
        batch_format="pyarrow",
    )


def connected_components(
    edges_ds: "ray.data.Dataset",
    extra_nodes_ds: "ray.data.Dataset" = None,
    max_iter: int = 50,
) -> "ray.data.Dataset":
    """edges (a, b) [+ optional isolated nodes (node)] -> (node, component).

    Component id is the minimum node id (numeric or lexicographic for
    strings) reachable from the node. Isolated extra nodes keep their own
    id as component.
    """
    labels = _init_labels(edges_ds, extra_nodes_ds).materialize()

    both = edges_ds.map_batches(
        lambda t: pa.table(
            {
                "key": pa.concat_arrays(
                    [t["a"].combine_chunks(), t["b"].combine_chunks()]
                ),
                "other": pa.concat_arrays(
                    [t["b"].combine_chunks(), t["a"].combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(max_iter):
        lab_rows = labels.map_batches(
            lambda t: pa.table(
                {
                    "key": t["node"],
                    "other": t["node"],  # placeholder, ignored for kind=0
                    "label": t["label"],
                    "kind": pa.array(np.zeros(len(t), dtype=np.int8)),
                }
            ),
            batch_format="pyarrow",
        )
        edge_rows = both.map_batches(
            lambda t: pa.table(
                {
                    "key": t["key"],
                    "other": t["other"],
                    "label": t["key"],  # placeholder, ignored for kind=1
                    "kind": pa.array(np.ones(len(t), dtype=np.int8)),
                }
            ),
            batch_format="pyarrow",
        )

        def propagate(g: pd.DataFrame) -> pd.DataFrame:
            lab = g.loc[g["kind"] == 0, "label"]
            if lab.empty:  # key never appears without a label row, but keep
                return pd.DataFrame(  # the schema stable if it happens
                    {
                        "node": pd.Series([], dtype=g["key"].dtype),
                        "label": pd.Series([], dtype=g["label"].dtype),
                        "is_self": pd.Series([], dtype=np.int8),
                    }
                )
            label = lab.min()
            neigh = g.loc[g["kind"] == 1, "other"]
            nodes = [g["key"].iloc[0]]
            labels_out = [label]
            selfs = [1]
            if len(neigh):
                nodes.extend(neigh.tolist())
                labels_out.extend([label] * len(neigh))
                selfs.extend([0] * len(neigh))
            return pd.DataFrame(
                {"node": nodes, "label": labels_out, "is_self": selfs}
            )

        msgs = lab_rows.union(edge_rows).groupby("key").map_groups(
            propagate, batch_format="pandas"
        )

        def take_min(g: pd.DataFrame) -> pd.DataFrame:
            new = g["label"].min()
            old_rows = g.loc[g["is_self"] == 1, "label"]
            old = old_rows.iloc[0] if len(old_rows) else new
            return pd.DataFrame(
                {
                    "node": [g["node"].iloc[0]],
                    "label": [new],
                    "changed": [1 if new != old else 0],
                }
            )

        new_labels = (
            msgs.groupby("node").map_groups(take_min, batch_format="pandas")
        ).materialize()
        changed = new_labels.sum("changed")
        labels = new_labels.drop_columns(["changed"]).materialize()
        if not changed:
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

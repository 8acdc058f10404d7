"""Evaluation: hits@k against gold links and pairwise cluster P/R/F1.

`hits` reproduces /root/reference/kiez/evaluate/eval_metrics.py:23-61
(ndarray and dict variants, default k=[1,5,10]). `hits_ds` evaluates a
neighbor Dataset against a gold table via broadcast-join membership test.
`pairwise_scores` is the north-rule metric: precision/recall/F1 over
labeled pairs between predicted and reference clusterings.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def hits(nn_ind, gold: dict, k=None) -> dict[int, float]:
    if k is None:
        k = [1, 5, 10]
    k = sorted(k)
    counter = {kk: 0 for kk in k}
    if isinstance(nn_ind, dict):
        items = nn_ind.items()
    else:
        items = enumerate(np.asarray(nn_ind))
    rows = list(items)
    for kk in k:
        for i, row in rows:
            if i in gold and gold[i] in list(row[:kk]):
                counter[kk] += 1
    return {kk: v / len(gold) for kk, v in counter.items()}


def hits_ds(neighbors_ds, gold: dict, k=None) -> dict[int, float]:
    """Distributed hits@k: gold map broadcast into a map_batches membership
    test, per-k partial sums aggregated. neighbors_ds rows: (query_id,
    neigh_ids)."""
    import ray

    if k is None:
        k = [1, 5, 10]
    k = sorted(k)
    gold_ref = ray.put(gold)

    class HitCounter:
        def __init__(self, gold_ref, ks):
            self.gold = ray.get(gold_ref)
            self.ks = ks

        def __call__(self, batch: pa.Table) -> pa.Table:
            q = batch["query_id"].to_numpy(zero_copy_only=False)
            col = batch["neigh_ids"].combine_chunks()
            c = len(col[0]) if len(col) else 0
            ids = col.values.to_numpy(zero_copy_only=False).reshape(len(q), c)
            want = np.array(
                [self.gold.get(int(x), -(10**18)) for x in q], dtype=np.int64
            )
            pos = np.where(
                ids == want[:, None], np.arange(c)[None, :], c
            ).min(axis=1)
            out = {
                f"h{kk}": pa.array(
                    [int(((pos < kk) & (want > -(10**18))).sum())], pa.int64()
                )
                for kk in self.ks
            }
            return pa.table(out)

    sums = neighbors_ds.map_batches(
        HitCounter,
        fn_constructor_kwargs={"gold_ref": gold_ref, "ks": k},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 4),
    )
    total = {kk: 0 for kk in k}
    for b in sums.iter_batches(batch_format="pyarrow"):
        for kk in k:
            total[kk] += int(pa.compute.sum(b[f"h{kk}"]).as_py() or 0)
    return {kk: total[kk] / len(gold) for kk in k}


def _cluster_pairs(assign: dict) -> set[tuple]:
    by_cluster: dict = {}
    for doc, cl in assign.items():
        by_cluster.setdefault(cl, []).append(doc)
    pairs = set()
    for members in by_cluster.values():
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add((members[i], members[j]))
    return pairs


def pairwise_scores(
    predicted: dict, reference: dict, restrict_pairs: set | None = None
) -> dict[str, float]:
    """Pairwise precision/recall/F1 of two clusterings given as
    {doc_id: cluster_id} maps. ``restrict_pairs`` limits evaluation to a
    labeled-pair universe (e.g. pairs sharing a blocking key, per the
    north rule). Driver-side: pair sets are O(sum cluster_size^2); at scale
    evaluate per blocking partition and aggregate the three counters.
    """
    pred = _cluster_pairs(predicted)
    gold = _cluster_pairs(reference)
    if restrict_pairs is not None:
        norm = {tuple(sorted(p)) for p in restrict_pairs}
        pred &= norm
        gold &= norm
    tp = len(pred & gold)
    precision = tp / len(pred) if pred else 1.0
    recall = tp / len(gold) if gold else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "tp": tp,
        "pred_pairs": len(pred),
        "gold_pairs": len(gold),
    }


def mutual_best(
    s2t: "ray.data.Dataset",
    t2s: "ray.data.Dataset",
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Reciprocal-best-match 1:1 alignment: keep the pair (s, t) iff t is
    s's nearest target AND s is t's nearest source — the classic
    mutual-nearest-neighbor selector used to turn kNN candidate lists
    into high-precision seed links for entity alignment (the reference
    stops at ranked lists + hits@k; this is the selection step a linker
    runs next).

    Inputs are two k=1 neighbor Datasets in ``kneighbors_dataset``
    layout (query_id, neigh_ids, neigh_dists): source->target and
    target->source. Tie semantics inherit ``topk_sorted``'s id
    tie-break, so the output is deterministic and matches a
    ``row_number() OVER (... ORDER BY dist, id)`` oracle.

    Scale shape: both sides flatten to one row per entity (vectorized
    Arrow list take), then ONE hash-partitioned equi-join on target id
    (``relops.hash_join`` — no broadcast, no driver state) and a
    vectorized equality filter. All-to-all traffic is O(n) 3-column
    rows, never the embeddings.

    Each flattened side is ``materialize()``d before the join: the two
    upstream search pipelines each hold minimum actor pools, and fusing
    both chains plus the join shuffle into ONE streaming plan can pin
    every CPU on a small cluster (actor-pool minimums starve the
    shuffle). Materializing the O(n) 3-column flats runs the searches
    sequentially and frees their actors before the join; at corpus
    scale, checkpoint the flats to parquet via ``lineage`` instead of
    holding them in the object store.
    """
    import ray as _ray

    from .relops import hash_join

    if num_partitions is None:
        cpus = (
            int(_ray.cluster_resources().get("CPU", 8))
            if _ray.is_initialized()
            else 8
        )
        num_partitions = max(2, min(16, cpus // 2))

    def flat(prefix_q: str, prefix_b: str, keep_dist: bool):
        def fn(t: pa.Table) -> pa.Table:
            q = t["query_id"].to_numpy(zero_copy_only=False)
            ids_col = t["neigh_ids"].combine_chunks()
            k = len(ids_col[0]) if len(ids_col) else 0
            if k == 0:
                cols = {prefix_q: pa.array([], pa.int64()),
                        prefix_b: pa.array([], pa.int64())}
                if keep_dist:
                    cols["dist"] = pa.array([], pa.float64())
                return pa.table(cols)
            ids = ids_col.values.to_numpy(zero_copy_only=False).reshape(
                len(q), k
            )[:, 0]
            keep = ids >= 0
            cols = {
                prefix_q: pa.array(q[keep], pa.int64()),
                prefix_b: pa.array(ids[keep], pa.int64()),
            }
            if keep_dist:
                d = t["neigh_dists"].combine_chunks().values.to_numpy(
                    zero_copy_only=False
                ).reshape(len(q), k)[:, 0]
                cols["dist"] = pa.array(
                    d[keep].astype(np.float64), pa.float64()
                )
            return pa.table(cols)

        return fn

    left = s2t.map_batches(flat("source_id", "target_id", True),
                           batch_format="pyarrow").materialize()
    right = t2s.map_batches(flat("t_query", "t_best", False),
                            batch_format="pyarrow").materialize()
    joined = hash_join(
        left, right, "target_id", "t_query", num_partitions=num_partitions
    )

    def mutual_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.equal(t["source_id"], t["t_best"])
        return t.filter(keep).select(["source_id", "target_id", "dist"])

    return joined.map_batches(mutual_only, batch_format="pyarrow")


def binary_auc(
    ds: "ray.data.Dataset", score_col: str, label_col: str
):
    """Tie-aware ROC AUC of a score against a binary label — the
    Mann-Whitney rank formulation: AUC = P(score_pos > score_neg)
    + 0.5 * P(equal). The match-scoring eval a linkage pipeline runs
    after calibration (reference eval scope: kiez/evaluate/
    eval_metrics.py ranks hits; AUC is its threshold-free counterpart).

    Output: one row (auc float64 rounded 6, n_pos int64, n_neg int64).

    Scale shape: per-batch (score, pos, neg) count partials — raw rows
    collapse to distinct score values inside every map task — then one
    tiny groupby fold on the score value; the closed-form rank sum runs
    on the driver over O(distinct scores) rows, all-integer until the
    single final division (deterministic under any partitioning). For
    continuous scores quantize upstream — the contract is exactness per
    distinct value, and the driver state is O(distinct values).
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from .arrowutil import round_away

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        s = df[score_col].to_numpy()
        pos = df[label_col].to_numpy().astype(np.int64)
        us, inv = np.unique(s, return_inverse=True)
        p = np.bincount(inv, weights=pos, minlength=len(us)).astype(
            np.int64
        )
        c = np.bincount(inv, minlength=len(us)).astype(np.int64)
        return pd.DataFrame({"s": us, "c": c, "p": p})

    g = (
        ds.select_columns([score_col, label_col])
        .map_batches(partial, batch_format="pandas")
        .groupby("s")
        .aggregate(Sum("c", alias_name="c"), Sum("p", alias_name="p"))
        .to_pandas()  # O(distinct scores)
    ).sort_values("s", ignore_index=True)
    c = g["c"].to_numpy(dtype=np.int64)
    p = g["p"].to_numpy(dtype=np.int64)
    n_pos = int(p.sum())
    n_neg = int(c.sum()) - n_pos
    # offset o_i = rows strictly below value i; average rank of the
    # c_i tied rows is o_i + (c_i + 1)/2 — keep 2x everything integer.
    o = np.concatenate(([0], np.cumsum(c)[:-1]))
    r2 = int((p * (2 * o + c + 1)).sum())  # 2 * rank-sum of positives
    if n_pos == 0 or n_neg == 0:
        auc = np.float64("nan")
    else:
        auc = (r2 - n_pos * (n_pos + 1)) / (2.0 * n_pos * n_neg)
    return pd.DataFrame(
        {
            "auc": round_away(np.array([auc]), 6),
            "n_pos": np.array([n_pos], dtype=np.int64),
            "n_neg": np.array([n_neg], dtype=np.int64),
        }
    )


def fellegi_sunter(
    pairs: "ray.data.Dataset",
    records: "ray.data.Dataset",
    id_col: str,
    eq_fields: "dict[str, tuple[float, float]]",
    len_field: "tuple[str, tuple[float, float]] | None" = None,
    num_partitions: int = 32,
):
    """Fellegi-Sunter probabilistic record-linkage scores (JASA 1969)
    over pre-blocked candidate pairs: per field, add the
    agreement/disagreement log-odds weight (literal doubles so a SQL
    oracle sums bit-identical values in the same order); ``len_field``
    agrees when ``10*|la-lb| <= max(la,lb)`` — an EXACT integer 10%%
    band. Output: a_id, b_id, agree_<field> flags, score (round 6).

    Scale shape: record payloads reach the pairs by TWO hash joins on
    the pair ids (the same no-driver-state transport as the dedup
    verify stages); scoring is one vectorized ``np.where`` chain per
    batch. Pair count is whatever the upstream blocker bounded it to.

    The decision-theoretic scorer the reference's distance-only
    alignment lacks (cf. kiez/kiez.py kneighbors -> raw distances).
    """
    import pandas as pd
    import ray.data

    from .arrowutil import round_away
    from .relops import hash_join

    fields = list(eq_fields)
    lf = [len_field[0]] if len_field else []

    def side(prefix: str):
        def fn(t: pa.Table) -> pa.Table:
            cols = {f"__{prefix}k": t[id_col]}
            for c in fields + lf:
                cols[f"{prefix}_{c}"] = t[c]
            return pa.table(cols)

        return fn

    rec_a = records.map_batches(side("a"), batch_format="pyarrow")
    rec_b = records.map_batches(side("b"), batch_format="pyarrow")
    j = hash_join(
        hash_join(pairs, rec_a, "a_id", "__ak", num_partitions),
        rec_b, "b_id", "__bk", num_partitions,
    )

    def score(t: pa.Table) -> pa.Table:
        n = len(t)
        out = {"a_id": t["a_id"], "b_id": t["b_id"]}
        total = np.zeros(n, dtype=np.float64)
        for c in fields:
            w_a, w_d = eq_fields[c]
            a = t[f"a_{c}"].to_numpy(zero_copy_only=False)
            b = t[f"b_{c}"].to_numpy(zero_copy_only=False)
            agree = a == b
            out[f"agree_{c}"] = pa.array(agree.astype(np.int64))
            total = total + np.where(agree, w_a, w_d)
        if len_field:
            c, (w_a, w_d) = len_field
            la = t[f"a_{c}"].to_numpy(zero_copy_only=False).astype(np.int64)
            lb = t[f"b_{c}"].to_numpy(zero_copy_only=False).astype(np.int64)
            agree = 10 * np.abs(la - lb) <= np.maximum(la, lb)
            out[f"agree_{c}"] = pa.array(agree.astype(np.int64))
            total = total + np.where(agree, w_a, w_d)
        out["score"] = pa.array(round_away(total, 6))
        return pa.table(out)

    return j.map_batches(score, batch_format="pyarrow")


def stable_matching(
    pairs_ds: "ray.data.Dataset",
    a_col: str = "a_id",
    b_col: str = "b_id",
    score_col: str = "score",
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Distributed Gale-Shapley deferred acceptance over a scored
    bipartite candidate-pair list: the 1:1 assignment step an ER
    pipeline runs after pairwise scoring when every entity may match
    at most one counterpart (Gale & Shapley 1962; proposer side =
    ``a_col``). Preferences on both sides are (score desc, id asc), so
    the proposer-optimal stable matching is unique and deterministic —
    and by McVitie-Wilson, independent of proposal order.

    Output: (a_col, b_col, score_col) — one row per matched pair.

    Scale shape: deferred acceptance never crosses a connected
    component of the candidate graph, so the job is EMBARRASSINGLY
    PARALLEL ACROSS COMPONENTS: one ``connected_components`` pass over
    the (side-disjoint-encoded) pair edges, one hash join to attach
    labels, one component-key shuffle, then the classic O(E_c)
    proposal loop per component inside its partition. (A fully
    round-synchronous variant — propose/resolve via per-round hash
    joins, pagerank-style — is semantically identical but pays ~4
    shuffles per round; with component-bounded blocking the component
    route does ONE shuffle total.) Partitioning assumption: component
    sizes are bounded by upstream blocking, the same contract as the
    LSH buckets and SNM windows; an adversarially chained pair list
    concentrates in one partition but stays correct.
    """
    import pandas as pd
    import pyarrow.compute as pc
    import ray
    import ray.data

    from .cluster import connected_components
    from .relops import hash_join

    def norm(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pa_": pc.cast(t[a_col], pa.int64()),
                "pb_": pc.cast(t[b_col], pa.int64()),
                "ps_": pc.cast(t[score_col], pa.float64()),
            }
        )

    pairs = pairs_ds.map_batches(
        norm, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # side-disjoint node encoding: proposer 2a, receiver 2b+1
    edges = pairs.map_batches(
        lambda t: pa.table(
            {
                "a": pc.multiply(t["pa_"], pa.scalar(2, pa.int64())),
                "b": pc.add(
                    pc.multiply(t["pb_"], pa.scalar(2, pa.int64())),
                    pa.scalar(1, pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    labels = connected_components(edges).map_batches(
        lambda t: pa.table(
            {"node": pc.cast(t["node"], pa.int64()),
             "comp": pc.cast(t["component"], pa.int64())}
        ),
        batch_format="pyarrow",
    )
    keyed = pairs.map_batches(
        lambda t: t.append_column(
            "ak", pc.multiply(t["pa_"], pa.scalar(2, pa.int64()))
        ),
        batch_format="pyarrow",
    )
    tagged = hash_join(keyed, labels, "ak", "node",
                       num_partitions=num_partitions)

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__part",
            pc.cast(
                pc.bit_wise_and(t["comp"], pa.scalar(63, pa.int64())),
                pa.int32(),
            ),
        )

    out_schema = pa.schema(
        [("pa_", pa.int64()), ("pb_", pa.int64()), ("ps_", pa.float64())]
    )

    def gs_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"pa_": pd.Series(dtype=np.int64),
             "pb_": pd.Series(dtype=np.int64),
             "ps_": pd.Series(dtype=np.float64)}
        )
        if len(g) == 0:
            return empty
        comp = g["comp"].to_numpy()
        a = g["pa_"].to_numpy()
        b = g["pb_"].to_numpy()
        s = g["ps_"].to_numpy()
        # global preference order (comp, a, score desc, b asc): each
        # component's each proposer's candidates become one contiguous
        # slice already in proposal order
        order = np.lexsort((b, -s, a, comp))
        comp, a, b, s = comp[order], a[order], b[order], s[order]
        new_a = np.concatenate(
            ([True], (comp[1:] != comp[:-1]) | (a[1:] != a[:-1]))
        )
        starts = np.flatnonzero(new_a)
        ends = np.append(starts[1:], len(a))
        ra, rb, rs = [], [], []
        # per-component classic deferred acceptance; components are
        # blocking-bounded, the loop is O(E_c) with tiny state
        comp_of_slice = comp[starts]
        cstarts = np.flatnonzero(
            np.concatenate(([True], comp_of_slice[1:] != comp_of_slice[:-1]))
        )
        cends = np.append(cstarts[1:], len(starts))
        for c0, c1 in zip(cstarts, cends):
            ptr = {}
            lists = {}
            for k in range(c0, c1):
                aa = a[starts[k]]
                lists[aa] = (starts[k], ends[k])
                ptr[aa] = starts[k]
            engaged = {}  # b -> (score, -a) best proposal
            free = sorted(lists)
            while free:
                prop = free.pop()
                lo, hi = lists[prop]
                p = ptr[prop]
                if p >= hi:
                    continue
                ptr[prop] = p + 1
                bb, ss = b[p], s[p]
                cur = engaged.get(bb)
                cand = (ss, -prop)
                if cur is None:
                    engaged[bb] = cand
                elif cand > cur[:2]:
                    free.append(-cur[1])
                    engaged[bb] = cand
                else:
                    free.append(prop)
            for bb, (ss, na) in engaged.items():
                ra.append(-na)
                rb.append(bb)
                rs.append(ss)
        return pd.DataFrame(
            {"pa_": np.array(ra, np.int64), "pb_": np.array(rb, np.int64),
             "ps_": np.array(rs, np.float64)}
        )

    return (
        tagged.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(
            lambda g: gs_partition(g[["comp", "pa_", "pb_", "ps_"]]),
            batch_format="pandas",
        )
        .map_batches(
            lambda t: pa.table(
                {a_col: t["pa_"], b_col: t["pb_"], score_col: t["ps_"]}
            ),
            batch_format="pyarrow",
        )
    )

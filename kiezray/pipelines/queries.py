"""Driver-table query pipelines + their DuckDB oracle SQL.

Each ``q_*`` function takes ``sf_dir`` (a directory of driver parquet
tables, TESTDATA.md) and returns a pyarrow Table / Ray Dataset whose
row-set is reproduced exactly by the matching SQL in ``ORACLE_SQL`` —
same column names, types, and (rounded) values. The embeddings table is
split into a source side (even vec_id) and target side (odd vec_id).

These are the operator-conformance surface for SURVEY.md §2: every entry
exercises real library stages (sharded search actors, rerank kernels,
grouped shuffles, label propagation), not ad-hoc driver code.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..analysis import _measures_from_occurrence, k_occurrence_ds
from ..arrowutil import emb_to_matrix, int_bincount, round_away
from ..cluster import connected_components
from ..evaluate import hits_ds
from ..kiez import Kiez
from ..search import knn_search, shard_refs_from_dataset

N_CAND = 10
TOPK = 5


# ---------------------------------------------------------------------------
# shared loading
# ---------------------------------------------------------------------------


def _emb_ds(sf_dir: str, extra_cols: tuple = ()) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", *extra_cols],
    )
    return ds.map_batches(
        lambda t: pa.table(
            {
                "row_id": pc.cast(t["vec_id"], pa.int64()),
                "embedding": t["embedding"],
                **{c: t[c] for c in extra_cols},
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _sides(sf_dir: str, extra_cols: tuple = ()):
    ds = _emb_ds(sf_dir, extra_cols)
    even = ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["row_id"], 1), 0)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    odd = ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["row_id"], 1), 1)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return even, odd


def _explode_neighbors(
    nds: "ray.data.Dataset", dist_name: str = "dist", digits: int = 4,
    to_similarity: bool = False,
) -> "ray.data.Dataset":
    """(query_id, neigh_ids, neigh_dists) -> long (source_id, rank,
    target_id, <dist_name>) with distances rounded for oracle comparison."""

    def explode(t: pa.Table) -> pa.Table:
        q = t["query_id"].to_numpy(zero_copy_only=False)
        ids_col = t["neigh_ids"].combine_chunks()
        d_col = t["neigh_dists"].combine_chunks()
        k = len(ids_col[0]) if len(ids_col) else 0
        ids = ids_col.values.to_numpy(zero_copy_only=False).reshape(len(q), k)
        dist = d_col.values.to_numpy(zero_copy_only=False).reshape(len(q), k)
        keep = (ids >= 0).ravel()
        vals = dist.ravel()
        if to_similarity:
            vals = 1.0 - vals
        return pa.table(
            {
                "source_id": pa.array(np.repeat(q, k)[keep], pa.int64()),
                "rank": pa.array(
                    np.tile(np.arange(1, k + 1, dtype=np.int64), len(q))[keep]
                ),
                "target_id": pa.array(ids.ravel()[keep], pa.int64()),
                dist_name: pa.array(round_away(vals[keep], digits), pa.float64()),
            }
        )

    return nds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


# Routed search tier engaged by default for the global (unblocked) search
# queries: 2 stage groups, so every CORRECTNESS row runs with per-actor
# shard residency = half the index — byte-identical merge, exercised at
# sf >= 0.01 (the 100-TB path, VERDICT r2 item 1). rows_per_shard=125
# (not 64): the r3 driver-window knn regression was shard GRANULARITY —
# 32 tiny shard-build + max-id tasks per fit — not the chaining; at 125
# the routed tier matches broadcast wall-clock (interleaved same-window
# A/B: routed 1.67s vs broadcast 1.72s vs 64-row routed 2.00s) while
# sf0.01 still splits into 2 shards (routing stays exercised).
ROUTED = dict(rows_per_shard=125, route_groups=2)


def _knn_ds(sf_dir: str, hubness, k: int, hkw=None, n_candidates: int = N_CAND):
    source, target = _sides(sf_dir)
    kz = Kiez(
        n_candidates=n_candidates,
        algorithm="exact",
        algorithm_kwargs={"metric": "euclidean"},
        hubness=hubness,
        hubness_kwargs=hkw or {},
        rows_per_shard=ROUTED["rows_per_shard"],
        route_groups=ROUTED["route_groups"],
    )
    kz.fit(source, target)
    return kz.kneighbors_dataset(k)


_SQL_SIDES = """
src AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e
        FROM embeddings WHERE vec_id % 2 = 0),
tgt AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e
        FROM embeddings WHERE vec_id % 2 = 1),
d AS (SELECT s.vec_id sid, t.vec_id tid, list_distance(s.e, t.e) dist
      FROM src s CROSS JOIN tgt t),
s2t AS (SELECT sid, tid, dist,
               row_number() OVER (PARTITION BY sid ORDER BY dist, tid) rn
        FROM d),
t2s AS (SELECT sid, tid, dist,
               row_number() OVER (PARTITION BY tid ORDER BY dist, sid) rn
        FROM d),
cand AS (SELECT * FROM s2t WHERE rn <= {c}),
tcand AS (SELECT * FROM t2s WHERE rn <= {c})
"""


def _sql_sides(c: int = N_CAND) -> str:
    return _SQL_SIDES.format(c=c)


# ---------------------------------------------------------------------------
# C2/C3/N1: raw exact kNN (no hubness)
# ---------------------------------------------------------------------------


def q_knn_basic(sf_dir: str):
    return _explode_neighbors(_knn_ds(sf_dir, None, k=N_CAND))


SQL_KNN_BASIC = f"""
WITH {_sql_sides()}
SELECT sid AS source_id, rn AS rank, tid AS target_id,
       round(dist, 4) + 0 AS dist
FROM cand ORDER BY source_id, rank
"""


# ---------------------------------------------------------------------------
# C5+C6: CSLS rerank
# ---------------------------------------------------------------------------


def q_knn_csls(sf_dir: str):
    return _explode_neighbors(_knn_ds(sf_dir, "csls", k=TOPK))


SQL_KNN_CSLS = f"""
WITH {_sql_sides()},
r_test AS (SELECT sid, avg(dist) rt FROM cand GROUP BY sid),
r_train AS (SELECT tid, avg(dist) rr FROM tcand GROUP BY tid),
sec AS (SELECT c.sid, c.tid, 2 * c.dist - r.rt - rt2.rr AS hdist
        FROM cand c JOIN r_test r USING (sid) JOIN r_train rt2 USING (tid)),
ranked AS (SELECT sid, tid, hdist,
                  row_number() OVER (PARTITION BY sid ORDER BY hdist, tid) rk
           FROM sec)
SELECT sid AS source_id, rk AS rank, tid AS target_id,
       round(hdist, 4) + 0 AS dist
FROM ranked WHERE rk <= {TOPK} ORDER BY source_id, rank
"""


# ---------------------------------------------------------------------------
# C7: LocalScaling standard + NICDM
# ---------------------------------------------------------------------------


def q_knn_ls(sf_dir: str):
    return _explode_neighbors(_knn_ds(sf_dir, "localscaling", k=TOPK), digits=6)


SQL_KNN_LS = f"""
WITH {_sql_sides()},
r_s AS (SELECT sid, max(dist) rs FROM cand GROUP BY sid),
r_t AS (SELECT tid, max(dist) rt FROM tcand GROUP BY tid),
sec AS (SELECT c.sid, c.tid,
               1 - exp(-(c.dist * c.dist) / (r_s.rs * r_t.rt)) AS hdist
        FROM cand c JOIN r_s USING (sid) JOIN r_t USING (tid)),
ranked AS (SELECT sid, tid, hdist,
                  row_number() OVER (PARTITION BY sid ORDER BY hdist, tid) rk
           FROM sec)
SELECT sid AS source_id, rk AS rank, tid AS target_id,
       round(hdist, 6) + 0 AS dist
FROM ranked WHERE rk <= {TOPK} ORDER BY source_id, rank
"""


def q_knn_nicdm(sf_dir: str):
    return _explode_neighbors(
        _knn_ds(sf_dir, "localscaling", k=TOPK, hkw={"method": "nicdm"}), digits=6
    )


SQL_KNN_NICDM = f"""
WITH {_sql_sides()},
r_s AS (SELECT sid, avg(dist) rs FROM cand GROUP BY sid),
r_t AS (SELECT tid, avg(dist) rt FROM tcand GROUP BY tid),
sec AS (SELECT c.sid, c.tid, c.dist / sqrt(r_s.rs * r_t.rt) AS hdist
        FROM cand c JOIN r_s USING (sid) JOIN r_t USING (tid)),
ranked AS (SELECT sid, tid, hdist,
                  row_number() OVER (PARTITION BY sid ORDER BY hdist, tid) rk
           FROM sec)
SELECT sid AS source_id, rk AS rank, tid AS target_id,
       round(hdist, 6) + 0 AS dist
FROM ranked WHERE rk <= {TOPK} ORDER BY source_id, rank
"""


# ---------------------------------------------------------------------------
# C8: MutualProximity — normal final distances are not SQL-expressible in
# DuckDB (no erf); the calibration stats are, and the full rerank ships as a
# rows-only query.
# ---------------------------------------------------------------------------


def q_mp_stats(sf_dir: str):
    source, target = _sides(sf_dir)
    shards, _, _ = shard_refs_from_dataset(source)
    t2s = knn_search(target, shards, k=N_CAND)

    def stats(t: pa.Table) -> pa.Table:
        q = t["query_id"].to_numpy(zero_copy_only=False)
        d_col = t["neigh_dists"].combine_chunks()
        k = len(d_col[0]) if len(d_col) else 0
        D = d_col.values.to_numpy(zero_copy_only=False).reshape(len(q), k)
        return pa.table(
            {
                "target_id": pa.array(q, pa.int64()),
                "mu": pa.array(round_away(np.nanmean(D, axis=1), 6), pa.float64()),
                "sd": pa.array(round_away(np.nanstd(D, axis=1), 6), pa.float64()),
            }
        )

    return t2s.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


SQL_MP_STATS = f"""
WITH {_sql_sides()}
SELECT tid AS target_id, round(avg(dist), 6) + 0 AS mu,
       round(stddev_pop(dist), 6) + 0 AS sd
FROM tcand GROUP BY tid ORDER BY target_id
"""


def q_knn_mp_normal(sf_dir: str):
    """Rows-only check (no DuckDB erf): full MP-normal rerank."""
    return _explode_neighbors(
        _knn_ds(sf_dir, "mutualproximity", k=TOPK), digits=6
    )


def q_knn_mp_empiric(sf_dir: str):
    """MP-empiric joint-exceedance rerank (O(n*c^2) kernel), run over the
    shuffle-join transport (empiric_transport='join' default)."""
    return _explode_neighbors(
        _knn_ds(sf_dir, "mutualproximity", k=TOPK, hkw={"method": "empiric"}),
        digits=6,
    )


# The empiric secondary distance is pure counting (mutual_proximity.py:
# 185-212): for query i and candidate j, d_j[l] = the distance recorded in
# target j's t->s neighbor list under id I[i,l] if present else (kth +
# 1e-6); score = 1 - |{l : D[i,l] > D[i,j] and d_j[l] > D[i,j]}| / c. The
# LEFT JOIN keeps the reference's id-space quirk (candidate TARGET ids
# looked up among SOURCE neighbor ids) bit-for-bit.
SQL_KNN_MP_EMPIRIC = f"""
WITH {_sql_sides()},
kth AS (SELECT tid, max(dist) + 1e-6 AS dflt FROM tcand GROUP BY tid),
pairs AS (
  SELECT cj.sid, cj.tid, cj.dist AS dij, cl.dist AS dil,
         coalesce(ts.dist, kth.dflt) AS djl
  FROM cand cj
  JOIN cand cl ON cl.sid = cj.sid
  JOIN kth ON kth.tid = cj.tid
  LEFT JOIN tcand ts ON ts.tid = cj.tid AND ts.sid = cl.tid
),
sec AS (SELECT sid, tid,
               1.0 - CAST(sum(CASE WHEN dil > dij AND djl > dij
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / {N_CAND} AS hdist
        FROM pairs GROUP BY sid, tid, dij),
ranked AS (SELECT sid, tid, hdist,
                  row_number() OVER (PARTITION BY sid ORDER BY hdist, tid) rk
           FROM sec)
SELECT sid AS source_id, rk AS rank, tid AS target_id,
       round(hdist, 6) + 0 AS dist
FROM ranked WHERE rk <= {TOPK} ORDER BY source_id, rank
"""


# ---------------------------------------------------------------------------
# C9: DisSimLocal (sqeuclidean primary metric so squared=True)
# ---------------------------------------------------------------------------


def q_knn_dsl(sf_dir: str):
    source, target = _sides(sf_dir)
    kz = Kiez(
        n_candidates=N_CAND,
        algorithm="exact",
        algorithm_kwargs={"metric": "sqeuclidean"},
        hubness="dissimlocal",
    )
    kz.fit(source, target)
    return _explode_neighbors(kz.kneighbors_dataset(TOPK))


SQL_KNN_DSL = f"""
WITH
src AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e
        FROM embeddings WHERE vec_id % 2 = 0),
tgt AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e
        FROM embeddings WHERE vec_id % 2 = 1),
d AS (SELECT s.vec_id sid, t.vec_id tid,
             list_distance(s.e, t.e) ** 2 AS dist
      FROM src s CROSS JOIN tgt t),
s2t AS (SELECT sid, tid, dist,
               row_number() OVER (PARTITION BY sid ORDER BY dist, tid) rn
        FROM d),
t2s AS (SELECT sid, tid, dist,
               row_number() OVER (PARTITION BY tid ORDER BY dist, sid) rn
        FROM d),
cand AS (SELECT * FROM s2t WHERE rn <= {N_CAND}),
tcand AS (SELECT * FROM t2s WHERE rn <= {N_CAND}),
dims AS (SELECT i FROM range(1, 65) r(i)),
-- centroid (per dim) of each target's source NNs, then ||t - c||^2
tcent AS (SELECT tc.tid, dims.i, avg(s.e[dims.i]) c
          FROM tcand tc JOIN src s ON s.vec_id = tc.sid CROSS JOIN dims
          GROUP BY tc.tid, dims.i),
delta_t AS (SELECT t.vec_id tid, sum((t.e[tc.i] - tc.c) ** 2) dt
            FROM tgt t JOIN tcent tc ON tc.tid = t.vec_id GROUP BY t.vec_id),
-- centroid of each source's candidate targets, then ||s - c||^2
scent AS (SELECT c.sid, dims.i, avg(t.e[dims.i]) c
          FROM cand c JOIN tgt t ON t.vec_id = c.tid CROSS JOIN dims
          GROUP BY c.sid, dims.i),
delta_s AS (SELECT s.vec_id sid, sum((s.e[sc.i] - sc.c) ** 2) ds
            FROM src s JOIN scent sc ON sc.sid = s.vec_id GROUP BY s.vec_id),
pre AS (SELECT c.sid, c.tid, c.dist - delta_s.ds - delta_t.dt AS hdist
        FROM cand c JOIN delta_s USING (sid) JOIN delta_t USING (tid)),
shifted AS (SELECT sid, tid,
                   hdist - least((SELECT min(hdist) FROM pre), 0) AS hdist
            FROM pre),
ranked AS (SELECT sid, tid, hdist,
                  row_number() OVER (PARTITION BY sid ORDER BY hdist, tid) rk
           FROM shifted)
SELECT sid AS source_id, rk AS rank, tid AS target_id,
       round(hdist, 4) + 0 AS dist
FROM ranked WHERE rk <= {TOPK} ORDER BY source_id, rank
"""


# ---------------------------------------------------------------------------
# A1: k-occurrence (grouped count shuffle incl. zero rows)
# ---------------------------------------------------------------------------


def _target_ids(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    ids = (
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
        .column("vec_id")
        .to_numpy()
        .astype(np.int64)
    )
    return np.sort(ids[ids % 2 == 1])


def q_k_occurrence(sf_dir: str):
    nds = _knn_ds(sf_dir, None, k=N_CAND)
    return k_occurrence_ds(nds, _target_ids(sf_dir), k=N_CAND)


SQL_K_OCCURRENCE = f"""
WITH {_sql_sides()},
counts AS (SELECT tid, count(*) c FROM cand GROUP BY tid)
SELECT t.vec_id AS target_id,
       CAST(coalesce(counts.c, 0) AS BIGINT) AS k_occurrence
FROM tgt t LEFT JOIN counts ON counts.tid = t.vec_id
ORDER BY target_id
"""


# ---------------------------------------------------------------------------
# A2-A9: hubness scalar measures over the k-occurrence vector
# ---------------------------------------------------------------------------


def q_hubness_stats(sf_dir: str):
    occ_tbl = q_k_occurrence(sf_dir).to_pandas()
    occ = occ_tbl.sort_values("target_id")["k_occurrence"].to_numpy()
    n_test = int(
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
        .map_batches(
            lambda t: t.filter(pc.equal(pc.bit_wise_and(t["vec_id"], 1), 0)),
            batch_format="pyarrow",
        )
        .count()
    )
    m = _measures_from_occurrence(
        occ, k=N_CAND, n_test=n_test, hub_size=2.0, return_value="all",
        store_k_occurrence=False,
    )
    return pa.table(
        {
            "k_skewness": [float(round_away(float(m["k_skewness"]), 6))],
            "gini": [float(round_away(float(m["gini"]), 6))],
            "robinhood": [float(round_away(float(m["robinhood"]), 6))],
            "atkinson": [float(round_away(float(m["atkinson"]), 6))],
            "antihub_occurrence": [float(round_away(float(m["antihub_occurrence"]), 6))],
            "hub_occurrence": [float(round_away(float(m["hub_occurrence"]), 6))],
            "groupie_ratio": [float(round_away(float(m["groupie_ratio"]), 6))],
        }
    )


SQL_HUBNESS_STATS = f"""
WITH {_sql_sides()},
counts AS (SELECT tid, count(*) c FROM cand GROUP BY tid),
occ AS (SELECT CAST(coalesce(counts.c, 0) AS DOUBLE) x
        FROM tgt t LEFT JOIN counts ON counts.tid = t.vec_id),
n_test AS (SELECT count(*) nt FROM src),
moments AS (SELECT count(*) n, avg(x) mean, sum(x) total,
                   avg((x - (SELECT avg(x) FROM occ)) ** 2) m2,
                   avg((x - (SELECT avg(x) FROM occ)) ** 3) m3,
                   avg(sqrt(x)) msqrt, max(x) mx
            FROM occ),
gini_n AS (SELECT sum((2 * (rw - 1) - n + 1) * x) g
           FROM (SELECT x, row_number() OVER (ORDER BY x) rw,
                        (SELECT count(*) FROM occ) n
                 FROM occ)),
vals AS (SELECT
  m.m3 / (m.m2 ** 1.5) AS k_skewness,
  2 * g.g / (2 * m.n * m.total) AS gini,
  (SELECT 0.5 * sum(abs(x - m.mean)) FROM occ) / m.total AS robinhood,
  1 - (m.msqrt ** 2) / m.mean AS atkinson,
  (SELECT count(*) FROM occ WHERE x = 0) / CAST(m.n AS DOUBLE)
      AS antihub_occurrence,
  (SELECT coalesce(sum(x), 0) FROM occ WHERE x >= 2 * {N_CAND})
      / {N_CAND} / (SELECT nt FROM n_test) AS hub_occurrence,
  m.mx / (SELECT nt FROM n_test) / {N_CAND} AS groupie_ratio
FROM moments m, gini_n g)
SELECT round(k_skewness, 6) + 0 AS k_skewness, round(gini, 6) + 0 AS gini,
       round(robinhood, 6) + 0 AS robinhood, round(atkinson, 6) + 0 AS atkinson,
       round(antihub_occurrence, 6) + 0 AS antihub_occurrence,
       round(hub_occurrence, 6) + 0 AS hub_occurrence,
       round(groupie_ratio, 6) + 0 AS groupie_ratio
FROM vals
"""


# ---------------------------------------------------------------------------
# E1: hits@k with synthetic gold (source s -> target s+1)
# ---------------------------------------------------------------------------


def q_hits(sf_dir: str):
    nds = _knn_ds(sf_dir, None, k=N_CAND)
    src_ids = _target_ids(sf_dir) - 1  # even ids
    gold = {int(s): int(s) + 1 for s in src_ids}
    res = hits_ds(nds, gold, k=[1, 5, 10])
    return pa.table(
        {
            "k": pa.array(sorted(res), pa.int64()),
            "hits": pa.array(
                [round(res[kk], 6) for kk in sorted(res)], pa.float64()
            ),
        }
    )


SQL_HITS = f"""
WITH {_sql_sides()},
gold AS (SELECT vec_id sid, vec_id + 1 tid FROM src),
matched AS (SELECT g.sid, min(c.rn) rnk
            FROM gold g LEFT JOIN cand c ON c.sid = g.sid AND c.tid = g.tid
            GROUP BY g.sid),
ks AS (SELECT unnest([1, 5, 10]) k)
SELECT CAST(ks.k AS BIGINT) AS k,
       round(sum(CASE WHEN m.rnk IS NOT NULL AND m.rnk <= ks.k
                      THEN 1 ELSE 0 END) / CAST((SELECT count(*) FROM gold)
                      AS DOUBLE), 6) + 0 AS hits
FROM ks CROSS JOIN matched m GROUP BY ks.k ORDER BY k
"""


# ---------------------------------------------------------------------------
# ANN: cosine top-k of a query set against the target side
# ---------------------------------------------------------------------------


def q_ann_cosine(sf_dir: str):
    source, target = _sides(sf_dir)
    shards, _, _ = shard_refs_from_dataset(
        target, rows_per_shard=ROUTED["rows_per_shard"]
    )
    queries = source.map_batches(
        lambda t: t.filter(pc.less(t["row_id"], 10)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    nds = knn_search(
        queries, shards, k=N_CAND, algorithm="exact",
        algorithm_kwargs={"metric": "cosine"},
        route_groups=ROUTED["route_groups"],
    )
    out = _explode_neighbors(nds, dist_name="cos_sim", digits=6, to_similarity=True)
    return out.map_batches(
        lambda t: t.rename_columns(["query_id", "rank", "target_id", "cos_sim"]),
        batch_format="pyarrow",
    )


def q_ann_graph(sf_dir: str):
    """Rows-only: graph-ANN (beam search over the symmetrized kNN graph)
    cosine top-k for the first 10 source rows. Approximate by design, so
    no SQL oracle; tests assert recall vs the exact search instead."""
    source, target = _sides(sf_dir)
    shards, _, _ = shard_refs_from_dataset(target)
    queries = source.map_batches(
        lambda t: t.filter(pc.less(t["row_id"], 10)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    nds = knn_search(
        queries, shards, k=N_CAND, algorithm="graph",
        algorithm_kwargs={"metric": "cosine"},
    )
    out = _explode_neighbors(nds, dist_name="cos_sim", digits=6, to_similarity=True)
    return out.map_batches(
        lambda t: t.rename_columns(["query_id", "rank", "target_id", "cos_sim"]),
        batch_format="pyarrow",
    )


def q_ann_rpforest(sf_dir: str):
    """Rows-only: random-projection-forest (annoy-family) cosine top-k
    for the first 10 source rows — the tree-ensemble ANN tier
    (approximate; recall-tested vs exact in pytest)."""
    source, target = _sides(sf_dir)
    shards, _, _ = shard_refs_from_dataset(target)
    queries = source.map_batches(
        lambda t: t.filter(pc.less(t["row_id"], 10)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    nds = knn_search(
        queries, shards, k=N_CAND, algorithm="rpforest",
        algorithm_kwargs={
            "metric": "angular", "n_trees": 12, "search_k": 12 * 64 * 4,
        },
    )
    out = _explode_neighbors(nds, dist_name="cos_sim", digits=6, to_similarity=True)
    return out.map_batches(
        lambda t: t.rename_columns(["query_id", "rank", "target_id", "cos_sim"]),
        batch_format="pyarrow",
    )


def q_ann_pq(sf_dir: str):
    """Rows-only: IVF-PQ (product-quantized, exact-refined) cosine top-k
    for the first 10 source rows — the memory-compressed ANN tier
    (approximate; recall-tested vs exact in pytest)."""
    source, target = _sides(sf_dir)
    shards, _, _ = shard_refs_from_dataset(target)
    queries = source.map_batches(
        lambda t: t.filter(pc.less(t["row_id"], 10)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    nds = knn_search(
        queries, shards, k=N_CAND, algorithm="ivfpq",
        algorithm_kwargs={"metric": "cosine", "nprobe": 32},
    )
    out = _explode_neighbors(nds, dist_name="cos_sim", digits=6, to_similarity=True)
    return out.map_batches(
        lambda t: t.rename_columns(["query_id", "rank", "target_id", "cos_sim"]),
        batch_format="pyarrow",
    )


SQL_ANN_COSINE = """
WITH
q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e
      FROM embeddings WHERE vec_id % 2 = 0 AND vec_id < 10),
tgt AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e
        FROM embeddings WHERE vec_id % 2 = 1),
d AS (SELECT q.vec_id qid, t.vec_id tid,
             list_cosine_similarity(q.e, t.e) sim
      FROM q CROSS JOIN tgt t),
ranked AS (SELECT qid, tid, sim,
                  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, tid) rk
           FROM d)
SELECT qid AS query_id, rk AS rank, tid AS target_id,
       round(sim, 6) + 0 AS cos_sim
FROM ranked WHERE rk <= 10 ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# Clustering: mutual-kNN edges -> connected components (label propagation)
# ---------------------------------------------------------------------------


def q_components(sf_dir: str):
    source, target = _sides(sf_dir)
    s_shards, _, _ = shard_refs_from_dataset(source)
    t_shards, _, _ = shard_refs_from_dataset(target)
    s2t = knn_search(source, t_shards, k=3)
    t2s = knn_search(target, s_shards, k=3)

    def to_pairs(t: pa.Table) -> pa.Table:
        q = t["query_id"].to_numpy(zero_copy_only=False)
        ids_col = t["neigh_ids"].combine_chunks()
        k = len(ids_col[0]) if len(ids_col) else 0
        ids = ids_col.values.to_numpy(zero_copy_only=False).reshape(len(q), k)
        keep = (ids >= 0).ravel()
        a = np.repeat(q, k)[keep]
        b = ids.ravel()[keep]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        return pa.table(
            {"a": pa.array(lo, pa.int64()), "b": pa.array(hi, pa.int64())}
        )

    p1 = s2t.map_batches(to_pairs, batch_format="pyarrow", zero_copy_batch=True)
    p2 = t2s.map_batches(to_pairs, batch_format="pyarrow", zero_copy_batch=True)

    # mutual = pair present in both directions -> occurrence count == 2
    from ..dedup import dedup_pair_rows

    edges = dedup_pair_rows(p1.union(p2), min_count=2)
    all_nodes = ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(
                    np.sort(
                        np.concatenate(
                            [_target_ids(sf_dir), _target_ids(sf_dir) - 1]
                        )
                    ),
                    pa.int64(),
                )
            }
        )
    )
    comp = connected_components(edges, extra_nodes_ds=all_nodes)
    return comp.map_batches(
        lambda t: pa.table(
            {"vec_id": t["node"], "component": t["component"]}
        ),
        batch_format="pyarrow",
    )


SQL_COMPONENTS = """
WITH RECURSIVE
src AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e
        FROM embeddings WHERE vec_id % 2 = 0),
tgt AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e
        FROM embeddings WHERE vec_id % 2 = 1),
d AS (SELECT s.vec_id sid, t.vec_id tid, list_distance(s.e, t.e) dist
      FROM src s CROSS JOIN tgt t),
s2t AS (SELECT sid, tid FROM
        (SELECT sid, tid,
                row_number() OVER (PARTITION BY sid ORDER BY dist, tid) rn
         FROM d) WHERE rn <= 3),
t2s AS (SELECT sid, tid FROM
        (SELECT sid, tid,
                row_number() OVER (PARTITION BY tid ORDER BY dist, sid) rn
         FROM d) WHERE rn <= 3),
edges AS (SELECT s.sid a, s.tid b FROM s2t s
          JOIN t2s t ON t.sid = s.sid AND t.tid = s.tid),
undirected AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
reach (node, r) AS (
    SELECT vec_id, vec_id FROM embeddings
    UNION
    SELECT u.a, reach.r FROM undirected u JOIN reach ON reach.node = u.b
)
SELECT node AS vec_id, CAST(min(r) AS BIGINT) AS component
FROM reach GROUP BY node ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# Dedup (exact) over a constructed duplicate universe
# ---------------------------------------------------------------------------


def q_dedup_exact(sf_dir: str):
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    dup = docs.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.add(pc.cast(t["doc_id"], pa.int64()), 100000),
                "text": t["text"],
            }
        ),
        batch_format="pyarrow",
    )
    union = docs.map_batches(
        lambda t: pa.table(
            {"doc_id": pc.cast(t["doc_id"], pa.int64()), "text": t["text"]}
        ),
        batch_format="pyarrow",
    ).union(dup)

    from ..dedup import dedup_exact

    # keep_cols=[]: only (doc_id, 128-bit hash) ride the dedup shuffle —
    # the text column never moves
    kept = dedup_exact(
        union, content_cols=["text"], id_col="doc_id", keep_cols=[]
    )
    return kept.select_columns(["doc_id"])


SQL_DEDUP_EXACT = """
WITH u AS (SELECT CAST(doc_id AS BIGINT) doc_id, text FROM documents
           UNION ALL
           SELECT CAST(doc_id AS BIGINT) + 100000, text FROM documents)
SELECT min(doc_id) AS doc_id FROM u GROUP BY text ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Text analysis over documents
# ---------------------------------------------------------------------------


def q_text_stats(sf_dir: str):
    from ..textops import text_stats

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return text_stats(docs)


SQL_TEXT_STATS = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(array_length(string_split_regex(trim(text), '\\s+')) AS BIGINT)
           AS n_tokens,
       CAST(array_length(list_distinct(
           string_split_regex(trim(text), '\\s+'))) AS BIGINT)
           AS n_unique_tokens,
       round(CAST(array_length(list_distinct(
                 string_split_regex(trim(text), '\\s+'))) AS DOUBLE)
             / array_length(string_split_regex(trim(text), '\\s+')), 6) + 0
           AS unique_ratio
FROM documents ORDER BY doc_id
"""


def q_er_exact(sf_dir: str):
    """Oracle-checked ER composition: the flagship's downstream stages —
    candidate generation (routed exact search), raw-cosine threshold
    match decision (BlockPairScorer's decision rule), symmetric pair
    dedup, transitive clustering — run over the embeddings table, where
    every step is SQL-expressible. The documents-table flagship
    (``er_pipeline``) stays rows-only by design: its hash embedding and
    MinHash blocking have no DuckDB equivalent; this variant gives the
    scoring semantics and the clustering stage full rows+hash checks."""
    from ..dedup import dedup_pair_rows

    TAU = 0.35
    C = 6
    ds = _emb_ds(sf_dir)
    shards, _, _ = shard_refs_from_dataset(
        ds, rows_per_shard=ROUTED["rows_per_shard"]
    )
    nds = knn_search(
        ds, shards, k=C, algorithm="exact",
        algorithm_kwargs={"metric": "cosine"}, exclude_self=True,
        route_groups=ROUTED["route_groups"],
    )

    def to_pairs(t: pa.Table) -> pa.Table:
        q = t["query_id"].to_numpy(zero_copy_only=False)
        ids_col = t["neigh_ids"].combine_chunks()
        d_col = t["neigh_dists"].combine_chunks()
        k = len(ids_col[0]) if len(ids_col) else 0
        ids = ids_col.values.to_numpy(zero_copy_only=False).reshape(len(q), k)
        dist = d_col.values.to_numpy(zero_copy_only=False).reshape(len(q), k)
        sim = 1.0 - dist.ravel()
        keep = (ids.ravel() >= 0) & (sim >= TAU)
        a = np.repeat(q, k)[keep]
        b = ids.ravel()[keep]
        return pa.table(
            {
                "a": pa.array(np.minimum(a, b), pa.int64()),
                "b": pa.array(np.maximum(a, b), pa.int64()),
            }
        )

    edges = dedup_pair_rows(
        nds.map_batches(to_pairs, batch_format="pyarrow", zero_copy_batch=True)
    )
    nodes = ds.map_batches(
        lambda t: pa.table({"node": t["row_id"]}), batch_format="pyarrow"
    )
    comp = connected_components(edges, extra_nodes_ds=nodes)
    return comp.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["node"], pa.int64()),
                "cluster_id": pc.cast(t["component"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


SQL_ER_EXACT = """
WITH RECURSIVE
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
d AS (SELECT a.vec_id i, b.vec_id j, list_cosine_similarity(a.v, b.v) s
      FROM e a JOIN e b ON a.vec_id <> b.vec_id),
cand AS (SELECT i, j, s FROM
         (SELECT i, j, s,
                 row_number() OVER (PARTITION BY i ORDER BY s DESC, j) rn
          FROM d) WHERE rn <= 6),
pairs AS (SELECT DISTINCT least(i, j) a, greatest(i, j) b
          FROM cand WHERE s >= 0.35),
undirected AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
reach (node, r) AS (
    SELECT vec_id, vec_id FROM embeddings
    UNION
    SELECT u.a, reach.r FROM undirected u JOIN reach ON reach.node = u.b
)
SELECT node AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
FROM reach GROUP BY node ORDER BY doc_id
"""


def q_er_pipeline(sf_dir: str):
    """Flagship (rows-only BY DESIGN): full blocking -> hubness-reranked
    pair scoring -> transitive clustering over the documents table
    adapted to the interleaved-span schema. No SQL oracle is possible —
    the embedding stage is a seeded feature hash and the blocking stage
    is MinHash-LSH, neither expressible in DuckDB; ``er_exact`` gives
    the downstream stages (threshold decision, pair dedup, clustering)
    full driver oracle checks, and tests/test_er_pipeline.py pins
    F1 >= 0.99 vs brute-force oracle clusters per hubness variant.
    Returns (doc_id, cluster_id)."""
    from ..pipelines.er import ERConfig, run_er
    from ..synth import docs_from_plain_text

    # schema adaptation runs as a batch transform in WORKERS — the driver
    # never reads the table (a pq.read_table here would be the first OOM
    # at a big sf)
    ds = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(docs_from_plain_text, batch_format="pyarrow")
        .repartition(8)
    )
    out = run_er(ds, ERConfig())
    return out["clusters"]


def q_minhash_dedup(sf_dir: str):
    """Rows-only: MinHash+LSH near-dup components over documents with an
    injected duplicate of every 10th doc."""
    from ..dedup import dedup_minhash_lsh

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        lambda t: pa.table(
            {"doc_id": pc.cast(t["doc_id"], pa.int64()), "text": t["text"]}
        ),
        batch_format="pyarrow",
    )
    dups = docs.map_batches(
        lambda t: t.filter(
            pc.equal(pc.cast(pc.bit_wise_and(t["doc_id"], 7), pa.int64()), 0)
        ),
        batch_format="pyarrow",
    ).map_batches(
        lambda t: pa.table(
            {"doc_id": pc.add(t["doc_id"], 100000), "text": t["text"]}
        ),
        batch_format="pyarrow",
    )
    return dedup_minhash_lsh(docs.union(dups), threshold=0.9)


def q_weighted_dedup(sf_dir: str):
    """Rows-only: weighted-Jaccard (ICWS) near-dup components — the
    repetition-aware sketch tier — over documents with an injected
    duplicate of every 8th doc. Same banding shuffle plan as
    minhash_dedup; the sketch honours token COUNTS."""
    from ..dedup import dedup_weighted_minhash

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        lambda t: pa.table(
            {"doc_id": pc.cast(t["doc_id"], pa.int64()), "text": t["text"]}
        ),
        batch_format="pyarrow",
    )
    dups = docs.map_batches(
        lambda t: t.filter(
            pc.equal(pc.cast(pc.bit_wise_and(t["doc_id"], 7), pa.int64()), 0)
        ),
        batch_format="pyarrow",
    ).map_batches(
        lambda t: pa.table(
            {"doc_id": pc.add(t["doc_id"], 100000), "text": t["text"]}
        ),
        batch_format="pyarrow",
    )
    return dedup_weighted_minhash(docs.union(dups))


def q_lang_id(sf_dir: str):
    from ..textops import language_id

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return language_id(docs)


SQL_LANG_ID = """
WITH toks AS (
    SELECT CAST(doc_id AS BIGINT) doc_id,
           string_split_regex(trim(lower(coalesce(text, ''))), '\\s+') t
    FROM documents),
scores AS (
    SELECT doc_id,
        len(list_filter(t, x -> x IN ('the', 'a', 'of', 'and', 'is'))) s_en,
        len(list_filter(t, x -> x IN ('der', 'die', 'das', 'und', 'ist'))) s_de,
        len(list_filter(t, x -> x IN ('le', 'la', 'les', 'et', 'est'))) s_fr,
        len(list_filter(t, x -> x IN ('el', 'los', 'una', 'y', 'es'))) s_es
    FROM toks)
SELECT doc_id,
       CASE WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0
            THEN 'unknown'
            WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
            WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
            WHEN s_fr >= s_es THEN 'fr'
            ELSE 'es' END AS lang_pred
FROM scores ORDER BY doc_id
"""


def q_token_counts(sf_dir: str):
    from ..textops import token_counts

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return token_counts(docs)


SQL_TOKEN_COUNTS = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(array_length(string_split_regex(trim(text), '\\s+')) AS BIGINT)
           AS ws_tokens,
       CAST(array_length(regexp_extract_all(lower(text),
            '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS subword_tokens
FROM documents ORDER BY doc_id
"""


def q_quality(sf_dir: str):
    """Heuristic quality features per document (oracle-checked)."""
    from ..textops import quality_score

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = quality_score(docs)
    return out.map_batches(
        lambda df: df.assign(
            stopword_ratio=round_away(df["stopword_ratio"], 6),
            punct_ratio=round_away(df["punct_ratio"], 6),
            mean_token_len=round_away(df["mean_token_len"], 6),
            quality=round_away(df["quality"], 6),
        ),
        batch_format="pandas",
    )


SQL_QUALITY = """
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         coalesce(text, '') AS text,
         string_split_regex(trim(coalesce(text, '')), '\\s+') AS toks
  FROM documents),
feat AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(list_filter(toks,
              t -> t IN ('the', 'a', 'of', 'and', 'is'))) AS DOUBLE)
           / greatest(len(toks), 1) AS stopword_ratio,
         CAST(length(text) - length(regexp_replace(text,
              '[.,;:!?"''()\\[\\]{}]', '', 'g')) AS DOUBLE)
           / greatest(length(text), 1) AS punct_ratio,
         coalesce(list_avg(list_transform(toks,
              t -> CAST(length(t) AS DOUBLE))), 0.0) AS mean_token_len,
         CASE WHEN length(text) BETWEEN 50 AND 20000 THEN 1.0 ELSE 0.0 END
           AS length_ok
  FROM base)
SELECT doc_id, n_chars,
       round(stopword_ratio, 6) + 0 AS stopword_ratio,
       round(punct_ratio, 6) + 0 AS punct_ratio,
       round(mean_token_len, 6) + 0 AS mean_token_len,
       round(0.4 * length_ok + 0.3 * (1.0 - least(greatest(punct_ratio, 0), 1))
             + 0.3 * (least(greatest(mean_token_len, 0), 10) / 10.0), 6) + 0
         AS quality
FROM feat ORDER BY doc_id
"""


def q_fingerprint(sf_dir: str):
    """Rows-only: winnowing rolling-hash fingerprints."""
    from ..textops import fingerprint

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return fingerprint(docs)


def q_simhash_dedup(sf_dir: str):
    """Rows-only: SimHash near-dup components with injected duplicates."""
    from ..dedup import dedup_simhash

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        lambda t: pa.table(
            {"doc_id": pc.cast(t["doc_id"], pa.int64()), "text": t["text"]}
        ),
        batch_format="pyarrow",
    )
    dups = docs.map_batches(
        lambda t: t.filter(
            pc.equal(pc.cast(pc.bit_wise_and(t["doc_id"], 15), pa.int64()), 0)
        ),
        batch_format="pyarrow",
    ).map_batches(
        lambda t: pa.table(
            {"doc_id": pc.add(t["doc_id"], 200000), "text": t["text"]}
        ),
        batch_format="pyarrow",
    )
    return dedup_simhash(docs.union(dups), max_hamming=3)


def q_embed_dup(sf_dir: str):
    """Embedding-cosine near-dup components over all embeddings rows."""
    from ..dedup import dedup_embedding_cosine

    ds = _emb_ds(sf_dir)
    comp = dedup_embedding_cosine(
        ds, id_col="row_id", threshold=0.8, n_candidates=10,
        rows_per_shard=ROUTED["rows_per_shard"],
        route_groups=ROUTED["route_groups"],
    )
    return comp.map_batches(
        lambda t: pa.table(
            {"vec_id": t["node"], "component": t["component"]}
        ),
        batch_format="pyarrow",
    )


def q_semdedup(sf_dir: str):
    """Rows-only by design (k-means is iterative — no SQL form; the
    planted-near-dup recall and determinism live in
    tests/test_dedup_textops.py): SemDeDup-style semantic dedup over the
    embeddings table — shuffle-free k-means, then one cluster-shuffle
    prune keeping the min-id representative of every within-cluster
    near-dup component. The synthetic embeddings have no true near-dups
    (max cross cosine ~0.48 at sf0.001), so the threshold sits at 0.45
    to exercise the prune path on real data."""
    from ..dedup import semantic_dedup

    out = semantic_dedup(
        _emb_ds(sf_dir), id_col="row_id", emb_col="embedding",
        n_clusters=8, threshold=0.45, iters=5, seed=7,
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "vec_id": t["row_id"],
                "cluster": t["cluster"],
                "keep": t["keep"],
            }
        ),
        batch_format="pyarrow",
    )


SQL_EMBED_DUP = """
WITH RECURSIVE
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
d AS (SELECT a.vec_id ai, b.vec_id bi,
             list_cosine_similarity(a.e, b.e) sim
      FROM v a CROSS JOIN v b WHERE a.vec_id <> b.vec_id),
topk AS (SELECT ai, bi, sim,
                row_number() OVER (PARTITION BY ai
                                   ORDER BY sim DESC, bi) rn
         FROM d),
edges AS (SELECT ai a, bi b FROM topk WHERE rn <= 10 AND sim >= 0.8),
undirected AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
reach (node, r) AS (
    SELECT vec_id, vec_id FROM embeddings
    UNION
    SELECT u.a, reach.r FROM undirected u JOIN reach ON reach.node = u.b
)
SELECT node AS vec_id, CAST(min(r) AS BIGINT) AS component
FROM reach GROUP BY node ORDER BY vec_id
"""


def q_hubness_all(sf_dir: str):
    """Rows-only: full hubness_score dict incl. truncnorm skewness (no
    closed-form SQL for the truncated-normal moment)."""
    occ_tbl = q_k_occurrence(sf_dir).to_pandas()
    occ = occ_tbl.sort_values("target_id")["k_occurrence"].to_numpy()
    m = _measures_from_occurrence(
        occ, k=N_CAND, n_test=(occ_tbl.shape[0]), hub_size=2.0,
        return_value="all", store_k_occurrence=False,
    )
    return pa.table(
        {
            "measure": pa.array(
                [
                    "k_skewness", "k_skewness_truncnorm", "atkinson", "gini",
                    "robinhood", "antihub_occurrence", "hub_occurrence",
                    "groupie_ratio",
                ]
            ),
            "value": pa.array(
                [
                    float(round_away(float(m[k]), 6))
                    for k in (
                        "k_skewness", "k_skewness_truncnorm", "atkinson",
                        "gini", "robinhood", "antihub_occurrence",
                        "hub_occurrence", "groupie_ratio",
                    )
                ],
                pa.float64(),
            ),
        }
    )


def q_ngram_pairs(sf_dir: str):
    """Oracle-checked: exact character-5-gram jaccard over LSH candidate
    pairs, (a, b, jaccard) where jaccard >= 0.8. The shingle hash is a
    bijection of the packed 5 bytes (k <= 8, splitmix64), so the engine's
    hash-set jaccard EQUALS the string-set jaccard the SQL computes; 16
    bands of 4 rows put LSH miss probability below 2.2e-4 per pair at
    j = 0.8 (and ~1e-9 at the j >= 0.92 pairs this corpus actually has),
    and the exact verify filters false candidates — so the LSH path
    returns exactly the all-pairs answer (asserted against the SQL)."""
    from ..dedup import ngram_jaccard_pairs
    from ..arrowutil import round_away

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    docs = docs.map_batches(
        lambda t: pa.table(
            {"doc_id": pc.cast(t["doc_id"], pa.int64()), "text": t["text"]}
        ),
        batch_format="pyarrow",
    )
    out = ngram_jaccard_pairs(
        docs, shingle_k=5, threshold=0.8, num_perm=64, bands=16
    )
    return out.map_batches(
        lambda df: df.assign(jaccard=round_away(df["jaccard"], 6)),
        batch_format="pandas",
    )


SQL_NGRAM_PAIRS = """
WITH d AS (SELECT CAST(doc_id AS BIGINT) id, lower(text) t FROM documents),
p AS (SELECT id, CASE WHEN length(t) < 5 THEN t || repeat(' ', 5 - length(t))
                      ELSE t END AS t FROM d),
sh AS (SELECT id, list_distinct(list_transform(
           generate_series(1, length(t) - 4), i -> substr(t, i, 5))) s
       FROM p),
pairs AS (SELECT a.id ai, b.id bi,
                 CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.s, b.s))) j
          FROM sh a JOIN sh b ON a.id < b.id)
SELECT ai AS a, bi AS b, round(j, 6) + 0 AS jaccard
FROM pairs WHERE j >= 0.8 ORDER BY a, b
"""


def q_media_features(sf_dir: str):
    """Rows-only: multimodal pipeline end-to-end — synthetic table whose
    image rows are REAL uncompressed 24-bit BMP payloads -> actor-pool
    pure-numpy BMP decode + nearest resize (video rows use the
    deterministic fallback; no video codec in sandbox) -> vectorized
    channel-histogram features. Fully deterministic, so row/shape checks
    are stable across runs."""
    import pyarrow.parquet as pq

    from ..media import decode_images, image_features, synth_media_table

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    tbl = synth_media_table(n=max(64, n_docs // 4), seed=42)
    ds = ray.data.from_arrow(tbl).repartition(4)
    feats = image_features(decode_images(ds))

    def project(t: pa.Table) -> pa.Table:
        col = t["features"].combine_chunks()
        F = col.values.to_numpy(zero_copy_only=False).reshape(len(t), -1)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "kind": t["kind"],
                "f0": pa.array(round_away(F[:, 0].astype(np.float64), 6)),
                "f_sum": pa.array(round_away(F.sum(axis=1).astype(np.float64), 6)),
            }
        )

    return feats.map_batches(project, batch_format="pyarrow")


def q_heavy_hitters(sf_dir: str):
    """Misra-Gries heavy hitters over events.user_id (top 10 by count).
    At this capacity no batch truncates, so counts are exact and the
    query is oracle-checked; at corpus scale the same operator degrades
    gracefully to (count - n/capacity) lower bounds."""
    from ..sketch import heavy_hitters

    events = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return heavy_hitters(events, "user_id", k=10, capacity=262144)


SQL_HEAVY_HITTERS = """
SELECT CAST(user_id AS VARCHAR) AS value,
       count(*) AS est_count
FROM events GROUP BY user_id
ORDER BY est_count DESC, value LIMIT 10
"""


def q_approx_distinct(sf_dir: str):
    """Rows-only: HyperLogLog distinct-count estimates (p=12, ~1.6% rel
    error) for events.user_id and documents.text — deterministic
    (splitmix64 hashing), error-bound-tested vs exact in pytest."""
    import pandas as pd

    from ..sketch import approx_distinct

    events = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return pd.DataFrame(
        {
            "column": ["events.user_id", "documents.text"],
            "approx_distinct": [
                int(approx_distinct(events, "user_id")),
                int(approx_distinct(docs, "text")),
            ],
        }
    )


def q_media_dedup(sf_dir: str):
    """Rows-only: multimodal near-dup composition — synthetic media (image
    rows = real BMP payloads) -> pure-numpy BMP decode -> channel-histogram
    features -> embedding-cosine near-dup clustering (sharded self-search +
    connected components). Deterministic: duplicates are planted by reusing
    payload bytes."""
    import pyarrow.parquet as pq

    from ..dedup import dedup_embedding_cosine
    from ..media import decode_images, image_features, synth_media_table

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    n = max(64, n_docs // 4)
    tbl = synth_media_table(n=n, seed=42)
    # plant exact-payload duplicates: rows n-8.. reuse earlier payloads
    pay = tbl["payload"].to_pylist()
    for i in range(8):
        pay[n - 1 - i] = pay[i]
    tbl = tbl.set_column(
        tbl.schema.get_field_index("payload"), "payload",
        pa.array(pay, pa.binary()),
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    feats = image_features(decode_images(ds))

    def to_rows(t: pa.Table) -> pa.Table:
        rid = pa.array(
            [int(d[1:]) for d in t["doc_id"].to_pylist()], pa.int64()
        )
        return pa.table({"row_id": rid, "embedding": t["features"]})

    rows = feats.map_batches(to_rows, batch_format="pyarrow")
    comp = dedup_embedding_cosine(rows, threshold=0.999)
    return comp.map_batches(
        lambda t: pa.table(
            {"media_id": t["node"], "cluster_id": t["component"]}
        ),
        batch_format="pyarrow",
    )


def q_tumbling(sf_dir: str):
    from ..windows import tumbling_window

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    out = tumbling_window(events, window_s=3600)
    return out.map_batches(
        lambda df: df.assign(sum_value=round_away(df["sum_value"], 4)),
        batch_format="pandas",
    )


SQL_TUMBLING = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start,
       count(*) AS n_events,
       round(sum(value), 4) + 0 AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_sessionize(sf_dir: str):
    from ..windows import sessionize

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    return sessionize(events, gap_s=1800)


SQL_SESSIONIZE = """
WITH e AS (SELECT CAST(user_id AS BIGINT) user_id,
                  CAST(floor(epoch(ts)) AS BIGINT) es
           FROM events),
flagged AS (SELECT user_id, es,
                   CASE WHEN es - lag(es) OVER w > 1800
                        OR lag(es) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es)),
sess AS (SELECT user_id, es,
                sum(new_s) OVER (PARTITION BY user_id ORDER BY es
                                 ROWS UNBOUNDED PRECEDING) AS sid
         FROM flagged)
SELECT user_id, min(es) AS session_start, max(es) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start
"""


def q_sliding(sf_dir: str):
    """Sliding-window aggregate (1h window / 15m slide); oracle-checked
    via slide fan-out in DuckDB."""
    from ..windows import sliding_window

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    out = sliding_window(events, window_s=3600, slide_s=900)
    return out.map_batches(
        lambda df: df.assign(sum_value=round_away(df["sum_value"], 4)),
        batch_format="pandas",
    )


SQL_SLIDING = """
WITH ev AS (SELECT CAST(user_id AS BIGINT) u,
                   CAST(floor(epoch(ts)) AS BIGINT) e, value FROM events),
ex AS (SELECT u, (e // 900) * 900 - r.i * 900 AS window_start, value, e
       FROM ev CROSS JOIN range(0, 4) r(i)
       WHERE e - ((e // 900) * 900 - r.i * 900) < 3600)
SELECT u AS user_id, CAST(window_start AS BIGINT) AS window_start,
       count(*) AS n_events, round(sum(value), 4) + 0 AS sum_value
FROM ex GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_sample_hash(sf_dir: str):
    """Deterministic hash-fraction sample of orders (~10% keyed on
    o_orderkey); stable under any partitioning. Oracle-checked: the Knuth
    multiplicative priority is replicated exactly in SQL."""
    from ..sample import hash_sample

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return hash_sample(orders, "o_orderkey", fraction=0.1, seed=7)


SQL_SAMPLE_HASH = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(o_custkey AS BIGINT) AS o_custkey
FROM orders
WHERE ((CAST(o_orderkey AS HUGEINT) + 7) * 11400714819323198485)
      % 18446744073709551616 < 1844674407370955264
ORDER BY o_orderkey
"""


def q_sample_bottomk(sf_dir: str):
    """Deterministic 100-row uniform-without-replacement sample of orders
    via bottom-k priorities (per-batch partials, no global sort);
    oracle-checked with the same priority arithmetic in SQL."""
    from ..sample import bottomk_sample

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
    ).map_batches(
        lambda t: pa.table({"o_orderkey": pc.cast(t["o_orderkey"], pa.int64())}),
        batch_format="pyarrow",
    )
    return bottomk_sample(orders, "o_orderkey", n=100, seed=3)


SQL_SAMPLE_BOTTOMK = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey
FROM orders
ORDER BY ((CAST(o_orderkey AS HUGEINT) + 3) * 11400714819323198485)
         % 18446744073709551616, o_orderkey
LIMIT 100
"""


def q_quantiles(sf_dir: str):
    """Exact order statistics without a global sort: iterative histogram
    refinement (external selection), 3 streaming passes + a tiny collect —
    vs the oracle's full-column quantile_disc. num_bins/collect_threshold
    forced small so the refinement rounds actually engage at test sf."""
    from ..quantile import exact_quantiles

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    )
    return exact_quantiles(
        li,
        "l_extendedprice",
        qs=(0.01, 0.25, 0.5, 0.75, 0.9, 0.99),
        num_bins=256,
        collect_threshold=2048,
    )


SQL_QUANTILES = """
WITH agg AS (
  SELECT quantile_disc(l_extendedprice,
         [CAST(0.01 AS DOUBLE), 0.25, 0.5, 0.75, 0.9, 0.99]) AS vs
  FROM lineitem),
qs AS (SELECT
         unnest([CAST(0.01 AS DOUBLE), 0.25, 0.5, 0.75, 0.9, 0.99]) AS q,
         generate_subscripts(
           [CAST(0.01 AS DOUBLE), 0.25, 0.5, 0.75, 0.9, 0.99], 1) AS i)
SELECT q, vs[i] AS value FROM qs CROSS JOIN agg ORDER BY q
"""


def q_grouped_quantiles(sf_dir: str):
    """Per-key exact quantiles (median + p90 of event value per user):
    coarse-partition lexsort, one pass for all keys — no per-key groups,
    no global sort. Oracle-checked vs per-group quantile_disc."""
    from ..quantile import grouped_quantiles

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    ).map_batches(
        lambda t: pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "value": pc.cast(t["value"], pa.float64()),
            }
        ),
        batch_format="pyarrow",
    )
    return grouped_quantiles(events, "user_id", "value", qs=(0.5, 0.9))


SQL_GROUPED_QUANTILES = """
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(0.5 AS DOUBLE) AS q,
       quantile_disc(CAST(value AS DOUBLE), 0.5) AS value
FROM events GROUP BY user_id
UNION ALL
SELECT CAST(user_id AS BIGINT), CAST(0.9 AS DOUBLE),
       quantile_disc(CAST(value AS DOUBLE), 0.9)
FROM events GROUP BY user_id
ORDER BY user_id, q
"""


def q_grouped_topk(sf_dir: str):
    """Top-3 orders per customer by total price (the per-key top-k
    workhorse; hash-partitioned vectorized ranking, no global sort).
    Oracle-checked vs row_number() OVER (PARTITION BY ...)."""
    from ..relops import grouped_topk

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "o_totalprice": pc.cast(t["o_totalprice"], pa.float64()),
            }
        ),
        batch_format="pyarrow",
    )
    out = grouped_topk(
        orders, "o_custkey", "o_totalprice", k=3, tie_col="o_orderkey"
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t["o_custkey"],
                "rank": t["rank"],
                "o_orderkey": t["o_orderkey"],
                "o_totalprice": pc.add(
                    pc.round(
                        t["o_totalprice"], 2,
                        round_mode="half_towards_infinity",
                    ),
                    pa.scalar(0.0),
                ),
            }
        ),
        batch_format="pyarrow",
    )


SQL_GROUPED_TOPK = """
WITH ranked AS (
  SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
         CAST(o_orderkey AS BIGINT) AS o_orderkey,
         CAST(o_totalprice AS DOUBLE) AS o_totalprice,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey
         ) AS rank
  FROM orders)
SELECT o_custkey, CAST(rank AS BIGINT) AS rank, o_orderkey,
       round(o_totalprice, 2) + 0 AS o_totalprice
FROM ranked WHERE rank <= 3 ORDER BY o_custkey, rank
"""


def q_asof_join(sf_dir: str):
    """As-of join: attach to each event the price of the user's most
    recent large order (o_totalprice > 300000) at event time — the
    "latest feature value as of timestamp" pattern of feature-store /
    training-label joins. Right side is pre-aggregated to unique
    (custkey, orderdate) partition-wise (max price), then both sides
    hash-partition on the user key and each partition runs one
    vectorized merge_asof — one shuffle per side, no broadcast, no
    global sort. Oracle: DuckDB ASOF JOIN."""
    from ..relops import asof_join

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], pa.scalar(300000.0))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # Partition-wise dedup to unique (custkey, orderdate) -> max price:
    # same coarse-partition shape as grouped_topk (custkey never spans
    # two partitions), so the merge_asof right side is deterministic.
    def add_part(t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "__p", pa.array((ck % 32).astype(np.int32), pa.int32())
        )

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["__p"])
        return g.groupby(
            ["o_custkey", "o_orderdate"], as_index=False, sort=False
        ).agg(best_price=("o_totalprice", "max"))

    right = (
        orders.map_batches(add_part, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(dedup_part, batch_format="pandas")
    )

    out = asof_join(
        events, right, "user_id", "o_custkey", "ts", "o_orderdate",
        how="inner", direction="backward",
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                # epoch micros, not a raw timestamp: unit-proof for the
                # driver's value-hash (same convention as the windows
                # family)
                "matched_us": pc.cast(
                    pc.cast(t["o_orderdate"], pa.timestamp("us")), pa.int64()
                ),
                "best_price": pc.add(
                    pc.round(t["best_price"], 2,
                             round_mode="half_towards_infinity"),
                    pa.scalar(0.0),
                ),
            }
        ),
        batch_format="pyarrow",
    )


SQL_ASOF_JOIN = """
WITH r AS (
  SELECT o_custkey, o_orderdate, max(o_totalprice) AS best_price
  FROM orders WHERE o_totalprice > 300000 GROUP BY 1, 2)
SELECT e.event_id, e.user_id,
       CAST(epoch_us(r.o_orderdate) AS BIGINT) AS matched_us,
       round(r.best_price, 2) + 0 AS best_price
FROM events e ASOF JOIN r
  ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
ORDER BY e.event_id
"""


def q_semi_join(sf_dir: str):
    """Semi join: customers that HAVE at least one order above 350000
    (keyed existence filter; one hash-partition shuffle, per-partition
    np.isin — no broadcast keep-set)."""
    return _customer_order_filter(sf_dir, anti=False)


def q_anti_join(sf_dir: str):
    """Anti join: customers with NO order above 350000 — the "drop rows
    already present in the corpus" dedup-against-existing-set shape of
    incremental training-data ingestion."""
    return _customer_order_filter(sf_dir, anti=True)


def _customer_order_filter(sf_dir: str, anti: bool):
    from ..relops import semi_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal"],
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": pc.cast(t["c_custkey"], pa.int64()),
                "c_name": t["c_name"],
                "c_acctbal": pc.add(
                    pc.round(pc.cast(t["c_acctbal"], pa.float64()), 2,
                             round_mode="half_towards_infinity"),
                    pa.scalar(0.0),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    big_orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda t: t.filter(
            pc.greater(t["o_totalprice"], pa.scalar(350000.0))
        ).select(["o_custkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return semi_join(cust, big_orders, "c_custkey", "o_custkey", anti=anti)


SQL_SEMI_JOIN = """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
       round(CAST(c_acctbal AS DOUBLE), 2) + 0 AS c_acctbal
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000)
ORDER BY c_custkey
"""

SQL_ANTI_JOIN = """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
       round(CAST(c_acctbal AS DOUBLE), 2) + 0 AS c_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000)
ORDER BY c_custkey
"""


def q_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped multi-measure grouped aggregate over lineitem
    (packed single grouping key; column pruning at the read)."""
    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_shipdate",
        ],
    )

    def prep(t: pa.Table) -> pa.Table:
        import datetime

        cutoff = datetime.datetime(1998, 9, 2)
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(cutoff)))
        disc = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        key = pc.binary_join_element_wise(
            t["l_returnflag"], t["l_linestatus"], "\x1f"
        )
        return pa.table(
            {
                "grp": key,
                "qty": pc.cast(t["l_quantity"], pa.float64()),
                "base": pc.cast(t["l_extendedprice"], pa.float64()),
                "disc_price": disc,
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("grp")
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("base", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Count(alias_name="count_order"),
        )
    )

    def unpack(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["grp"], "\x1f")
        return pa.table(
            {
                "l_returnflag": pc.list_element(parts, 0),
                "l_linestatus": pc.list_element(parts, 1),
                "sum_qty": pc.round(t["sum_qty"], 2, round_mode="half_towards_infinity"),
                "sum_base_price": pc.round(t["sum_base_price"], 2, round_mode="half_towards_infinity"),
                "sum_disc_price": pc.round(t["sum_disc_price"], 2, round_mode="half_towards_infinity"),
                "count_order": t["count_order"],
            }
        )

    return agg.map_batches(unpack, batch_format="pyarrow")


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) + 0 AS sum_qty,
       round(sum(l_extendedprice), 2) + 0 AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) + 0 AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_order_revenue_topk(sf_dir: str):
    """Hash join (orders x lineitem revenue partials) + global top-k."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def rev(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "revenue": pc.multiply(
                    t["l_extendedprice"],
                    pc.subtract(pa.scalar(1.0), t["l_discount"]),
                ),
            }
        )

    # high-cardinality grouped Sum is pathologically slow in this Ray
    # version: hash-partition on the key and reduce each partition with
    # one vectorized sort + add.reduceat pass instead (same combiner
    # pattern as dedup_pair_rows; a key never spans two partitions)
    P = 32

    def add_part(t: pa.Table) -> pa.Table:
        part = pc.cast(
            pc.bit_wise_and(t["l_orderkey"], pa.scalar(P - 1, pa.int64())),
            pa.int32(),
        )
        return t.append_column("__part", part)

    def sum_partition(g: pa.Table) -> pa.Table:
        k = g["l_orderkey"].to_numpy(zero_copy_only=False)
        v = g["revenue"].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        first = np.concatenate(([True], k[1:] != k[:-1]))
        starts = np.flatnonzero(first)
        return pa.table(
            {
                "l_orderkey": pa.array(k[starts], pa.int64()),
                "revenue": pa.array(np.add.reduceat(v, starts), pa.float64()),
            }
        )

    per_order = (
        li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(sum_partition, batch_format="pyarrow")
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = per_order.join(
        orders, join_type="inner", num_partitions=8, on=("l_orderkey",)
    )

    # global top-k WITHOUT an all-to-all sort: every batch keeps its own
    # top 10 by (revenue desc, orderkey), the tiny partials coalesce to
    # one block, and the same kernel finishes the job
    def partial_topk(t: pa.Table) -> pa.Table:
        rev = t["revenue"].to_numpy(zero_copy_only=False)
        key = t["l_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((key, -rev))[:10]
        return t.take(pa.array(order))

    top = (
        joined.map_batches(partial_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(partial_topk, batch_format="pyarrow")
    )
    return top.map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["l_orderkey"],
                "o_custkey": t["o_custkey"],
                "revenue": pc.round(t["revenue"], 2, round_mode="half_towards_infinity"),
            }
        ),
        batch_format="pyarrow",
    )


SQL_ORDER_REVENUE_TOPK = """
SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
       CAST(o.o_custkey AS BIGINT) AS o_custkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) + 0 AS revenue
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey, o.o_custkey
ORDER BY revenue DESC, o_orderkey LIMIT 10
"""


def q_returned_revenue(sf_dir: str):
    """TPC-H Q10 shape: top 20 customers by revenue from RETURNED items.
    Plan: predicate pushed into the parquet read (row-group pruning on
    l_returnflag), revenue pre-aggregated per orderkey BEFORE the orders
    join (combiner first, shuffle the small aggregate), per-customer
    fold, customer names via broadcast join (dimension-small side never
    shuffles), partial top-20 instead of a global sort."""
    import pyarrow.dataset as pads

    from ..relops import broadcast_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pads.field("l_returnflag") == "R",
    )

    def rev(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(t["l_orderkey"], pa.int64()),
                "revenue": pc.multiply(
                    t["l_extendedprice"],
                    pc.subtract(pa.scalar(1.0), t["l_discount"]),
                ),
            }
        )

    P = 32

    def add_part(t: pa.Table) -> pa.Table:
        part = pc.cast(
            pc.bit_wise_and(t["k"], pa.scalar(P - 1, pa.int64())), pa.int32()
        )
        return t.append_column("__part", part)

    def sum_partition(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy(zero_copy_only=False)
        v = g["revenue"].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        starts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        return pa.table(
            {
                "k": pa.array(k[starts], pa.int64()),
                "revenue": pa.array(np.add.reduceat(v, starts), pa.float64()),
            }
        )

    def fold(ds):
        return (
            ds.map_batches(add_part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("__part")
            .map_groups(sum_partition, batch_format="pyarrow")
        )

    per_order = fold(
        li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "k": pc.cast(t["o_orderkey"], pa.int64()),
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    per_cust = fold(
        per_order.join(orders, join_type="inner", num_partitions=8,
                       on=("k",))
        .map_batches(
            lambda t: pa.table(
                {"k": t["o_custkey"], "revenue": t["revenue"]}
            ),
            batch_format="pyarrow",
        )
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    named = broadcast_join(
        per_cust.map_batches(
            lambda t: pa.table(
                {"ck": t["k"],
                 "revenue": pc.round(t["revenue"], 2,
                                     round_mode="half_towards_infinity")}
            ),
            batch_format="pyarrow",
        ),
        cust,
        "ck",
        "c_custkey",
    )

    def partial_topk(t: pa.Table) -> pa.Table:
        r = t["revenue"].to_numpy(zero_copy_only=False)
        key = t["ck"].to_numpy(zero_copy_only=False)
        order = np.lexsort((key, -r))[:20]
        return t.take(pa.array(order))

    return (
        named.map_batches(partial_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(partial_topk, batch_format="pyarrow")
        .map_batches(
            lambda t: pa.table(
                {"c_custkey": t["ck"], "c_name": t["c_name"],
                 "revenue": t["revenue"]}
            ),
            batch_format="pyarrow",
        )
    )


SQL_RETURNED_REVENUE = """
SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, c.c_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) + 0 AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def q_inner_join(sf_dir: str):
    """Generic co-partitioned inner equi-join (orders x customer on
    custkey): one hash shuffle per side, per-partition vectorized merge —
    the shuffle-join shape for two fact-sized tables. (When one side is
    dimension-table small, broadcast it instead; this query deliberately
    exercises the shuffle path.)"""
    from ..relops import hash_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "o_totalprice": pc.add(
                    pc.round(pc.cast(t["o_totalprice"], pa.float64()), 2,
                             round_mode="half_towards_infinity"),
                    pa.scalar(0.0),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment", "c_nationkey"],
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": pc.cast(t["c_custkey"], pa.int64()),
                "c_mktsegment": t["c_mktsegment"],
                "c_nationkey": pc.cast(t["c_nationkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return hash_join(orders, cust, "o_custkey", "c_custkey")


SQL_INNER_JOIN = """
SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
       CAST(o.o_custkey AS BIGINT) AS o_custkey,
       round(CAST(o.o_totalprice AS DOUBLE), 2) + 0 AS o_totalprice,
       CAST(c.c_custkey AS BIGINT) AS c_custkey,
       c.c_mktsegment,
       CAST(c.c_nationkey AS BIGINT) AS c_nationkey
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o_orderkey
"""


def q_left_join(sf_dir: str):
    """Left-outer co-partitioned equi-join: every customer with their
    order count + spend (integer cents), customers with no orders kept
    with typed nulls — the enrich-with-optional-facts shape. The fact
    side is pre-aggregated per key BEFORE the join (the combiner shape:
    the join fan-out is one row per key, never the raw fact stream), and
    unmatched rows are padded on the Arrow side so the int64 aggregates
    never pass through pandas NaN float coercion."""
    from ..relops import hash_join

    P = 32

    def add_part(t: pa.Table) -> pa.Table:
        part = pc.cast(
            pc.bit_wise_and(t["cust_key"], pa.scalar(P - 1, pa.int64())),
            pa.int32(),
        )
        return t.append_column("__part", part)

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cust_key": pc.cast(t["o_custkey"], pa.int64()),
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(
                            pc.cast(t["o_totalprice"], pa.float64()),
                            pa.scalar(100.0),
                        ),
                        0,
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
            }
        )

    def sum_partition(g: pa.Table) -> pa.Table:
        k = g["cust_key"].to_numpy(zero_copy_only=False)
        v = g["cents"].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        first = np.concatenate(([True], k[1:] != k[:-1]))
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, len(k)))
        return pa.table(
            {
                "cust_key": pa.array(k[starts], pa.int64()),
                "order_cnt": pa.array(counts.astype(np.int64), pa.int64()),
                "spend_cents": pa.array(np.add.reduceat(v, starts), pa.int64()),
            }
        )

    per_cust = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(sum_partition, batch_format="pyarrow")
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": pc.cast(t["c_custkey"], pa.int64()),
                "c_mktsegment": t["c_mktsegment"],
            }
        ),
        batch_format="pyarrow",
    )
    return hash_join(cust, per_cust, "c_custkey", "cust_key", how="left")


SQL_LEFT_JOIN = """
WITH per_cust AS (
  SELECT o_custkey cust_key,
         count(*) order_cnt,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS spend_cents
  FROM orders GROUP BY o_custkey)
SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey,
       c.c_mktsegment,
       CAST(p.cust_key AS BIGINT) AS cust_key,
       CAST(p.order_cnt AS BIGINT) AS order_cnt,
       p.spend_cents
FROM customer c LEFT JOIN per_cust p ON c.c_custkey = p.cust_key
ORDER BY c_custkey
"""


def q_audio_features(sf_dir: str):
    """Rows-only: REAL audio path end-to-end — synthetic RIFF/WAVE PCM16
    payloads -> actor-pool pure-numpy WAV decode -> per-clip acoustic
    features (duration, rms, zero-crossing rate, spectral centroid).
    Deterministic; tone-frequency recovery is pytest-verified."""
    import pyarrow.parquet as pq

    from ..media import audio_features, synth_audio_table

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    tbl = synth_audio_table(n=max(64, n_docs // 4), seed=42)
    ds = ray.data.from_arrow(tbl).repartition(4)
    feats = audio_features(ds)
    return feats.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "duration_s": pa.array(
                    round_away(
                        t["duration_s"].to_numpy(zero_copy_only=False), 6
                    )
                ),
                "rms": pa.array(
                    round_away(t["rms"].to_numpy(zero_copy_only=False), 6)
                ),
                "zcr": pa.array(
                    round_away(t["zcr"].to_numpy(zero_copy_only=False), 6)
                ),
                "spectral_centroid": pa.array(
                    round_away(
                        t["spectral_centroid"].to_numpy(
                            zero_copy_only=False
                        ),
                        2,
                    )
                ),
                "peak_freq_hz": pa.array(
                    round_away(
                        t["peak_freq_hz"].to_numpy(zero_copy_only=False), 2
                    )
                ),
            }
        ),
        batch_format="pyarrow",
    )


def q_kmeans(sf_dir: str):
    """Rows-only (iterative algorithm, no SQL equivalent): distributed
    Lloyd's k-means over the embeddings table — per-round broadcast
    centroids + per-batch partial sums, no shuffle; deterministic
    hash-priority init. Convergence/recovery is pytest-verified on
    planted blobs (test_cluster.py)."""
    from ..arrowutil import round_away
    from ..cluster import kmeans

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    assigned, _ = kmeans(emb, "vec_id", "embedding", k=8, iters=5)
    return assigned.map_batches(
        lambda t: pa.table(
            {
                "vec_id": t["vec_id"],
                "cluster": t["cluster"],
                "dist": pa.array(
                    round_away(
                        t["dist"].to_numpy(zero_copy_only=False), 6
                    ),
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


def q_pack_chunks(sf_dir: str):
    """Concat-and-chunk sequence packing of the documents table into
    256-token training chunks: (chunk_id, doc_id, doc-relative token
    subrange). Token counts are whitespace-split lengths (DuckDB
    string_split parity); the packing is the distributed prefix-sum +
    explode shape of relops.pack_sequences."""
    from ..relops import pack_sequences

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_tokens": pc.cast(
                    pc.list_value_length(
                        pc.split_pattern(
                            pc.fill_null(t["text"], ""), " "
                        )
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return pack_sequences(docs, "doc_id", "n_tokens", chunk_tokens=256)


SQL_PACK_CHUNKS = """
WITH t AS (SELECT doc_id, len(string_split(text, ' ')) n FROM documents),
c AS (SELECT doc_id, n,
             CAST(sum(n) OVER (ORDER BY doc_id) - n AS BIGINT) AS off
      FROM t),
chunks AS (SELECT doc_id, n, off,
                  unnest(range(off // 256, (off + n - 1) // 256 + 1))
                    AS chunk_id
           FROM c WHERE n > 0)
SELECT CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(doc_id AS BIGINT) AS doc_id,
       CAST(greatest(chunk_id * 256, off) - off AS BIGINT) AS tok_start,
       CAST(least((chunk_id + 1) * 256, off + n) - off AS BIGINT) AS tok_end
FROM chunks ORDER BY chunk_id, doc_id
"""


def q_global_rank(sf_dir: str):
    """Exact global row numbers for every event ordered by (value,
    event_id) — the distributed zip-with-index: sampled range boundaries,
    per-range bincount offsets, one shuffle, no all-to-all sort."""
    import pandas as pd

    from ..arrowutil import round_away
    from ..relops import global_rank

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    ).map_batches(
        lambda t: pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "value": pc.cast(t["value"], pa.float64()),
            }
        ),
        batch_format="pyarrow",
    )
    out = global_rank(ev, "value", "event_id")
    return out.map_batches(
        lambda df: pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "value": round_away(df["value"].to_numpy(), 6),
                "rank": df["rank"].to_numpy(),
            }
        ),
        batch_format="pandas",
    )


SQL_GLOBAL_RANK = """
SELECT CAST(event_id AS BIGINT) AS event_id,
       round(CAST(value AS DOUBLE), 6) + 0 AS value,
       CAST(row_number() OVER (ORDER BY value, event_id) AS BIGINT) AS rank
FROM events ORDER BY rank
"""


def q_repetition(sf_dir: str):
    """Gopher-style repetition quality metrics per document (dup-word,
    top-word, dup-bigram fractions) — embarrassingly parallel, no
    shuffle; tokenization matches DuckDB string_split semantics."""
    from ..textops import repetition_stats

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return repetition_stats(docs)


SQL_REPETITION = """
WITH w AS (SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS wd
           FROM documents),
wc AS (SELECT doc_id, wd, count(*) c FROM w GROUP BY doc_id, wd),
per AS (SELECT doc_id, sum(c) n, count(*) d, max(c) mx
        FROM wc GROUP BY doc_id),
lists AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') l
          FROM documents),
bg AS (SELECT doc_id,
              unnest(list_transform(range(1, len(l)),
                                    i -> l[i] || chr(1) || l[i+1])) AS b
       FROM lists WHERE len(l) > 1),
bper AS (SELECT doc_id, count(*) nb, count(DISTINCT b) db
         FROM bg GROUP BY doc_id)
SELECT CAST(p.doc_id AS BIGINT) AS doc_id,
       round(1 - d / CAST(n AS DOUBLE), 6) + 0 AS dup_word_frac,
       round(mx / CAST(n AS DOUBLE), 6) + 0 AS top_word_frac,
       COALESCE(round(1 - db / CAST(nb AS DOUBLE), 6), 0.0) + 0
         AS dup_2gram_frac
FROM per p LEFT JOIN bper b ON p.doc_id = b.doc_id ORDER BY doc_id
"""


def q_running_totals(sf_dir: str):
    """Per-user running event count + running spend (integer cents) in
    (ts, event_id) order — the cumulative window function. Cents keep
    the prefix sums integer-exact on both compare sides."""
    from ..windows import running_aggregate

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "value"],
    ).map_batches(
        lambda t: pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "ts": t["ts"],
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(
                            pc.cast(t["value"], pa.float64()),
                            pa.scalar(100.0),
                        ),
                        0,
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    out = running_aggregate(ev, "user_id", "ts", "event_id", "cents")
    return out.map_batches(
        lambda df: df[["user_id", "event_id", "running_cnt", "running_sum"]]
        .rename(columns={"running_sum": "running_cents"}),
        batch_format="pandas",
    )


SQL_RUNNING_TOTALS = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(event_id AS BIGINT) AS event_id,
       CAST(count(*) OVER w AS BIGINT) AS running_cnt,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER w AS BIGINT)
         AS running_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


def q_event_pivot(sf_dir: str):
    """Crosstab: events per user by event type, one int64 column per
    type (static column set, like SQL's CASE WHEN pivot). Combiner
    partials fold inside each batch, one hash shuffle on user_id."""
    from ..relops import pivot_count

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    types = ["click", "error", "purchase", "signup", "view"]
    return pivot_count(ev, "user_id", "event_type", types)


SQL_EVENT_PIVOT = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
         AS click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         AS purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT)
         AS signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
         AS view
FROM events GROUP BY user_id ORDER BY user_id
"""


def q_range_join(sf_dir: str):
    """Band join: every (view, purchase) pair of the same user with the
    purchase 0-24h after the view — the attribution / interval-join
    shape. One hash shuffle per side on user_id, per-partition sorted
    right + two vectorized lexicographic merge-searches; no broadcast,
    no global sort, no packed composite keys."""
    from ..relops import range_join

    views = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    ).map_batches(
        lambda t: (
            lambda f: pa.table(
                {
                    "view_id": pc.cast(f["event_id"], pa.int64()),
                    "user_id": pc.cast(f["user_id"], pa.int64()),
                    "view_ts": f["ts"],
                }
            )
        )(t.filter(pc.equal(t["event_type"], pa.scalar("view")))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    purchases = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    ).map_batches(
        lambda t: (
            lambda f: pa.table(
                {
                    "purchase_id": pc.cast(f["event_id"], pa.int64()),
                    "p_user_id": pc.cast(f["user_id"], pa.int64()),
                    "purchase_ts": f["ts"],
                }
            )
        )(t.filter(pc.equal(t["event_type"], pa.scalar("purchase")))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = range_join(
        views, purchases, "user_id", "p_user_id", "view_ts", "purchase_ts",
        lo=0, hi=86_400_000_000,  # [0, 24h] in timestamp[us] units
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "user_id": t["user_id"],
                "view_id": t["view_id"],
                "purchase_id": t["purchase_id"],
                "delta_us": pc.subtract(
                    pc.cast(t["purchase_ts"], pa.int64()),
                    pc.cast(t["view_ts"], pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow",
    )


SQL_RANGE_JOIN = """
SELECT CAST(v.user_id AS BIGINT) AS user_id,
       CAST(v.event_id AS BIGINT) AS view_id,
       CAST(p.event_id AS BIGINT) AS purchase_id,
       CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS delta_us
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 DAY
WHERE v.event_type = 'view' AND p.event_type = 'purchase'
ORDER BY view_id, purchase_id
"""


def q_distinct_count(sf_dir: str):
    """Exact COUNT(DISTINCT l_suppkey) per part over lineitem — the
    two-level distinct combiner (per-batch pair dedup, pair-hash
    partition, per-partition exact count, tiny final sum)."""
    from ..relops import distinct_count

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
                "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return distinct_count(li, "l_partkey", "l_suppkey")


SQL_DISTINCT_COUNT = """
SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS distinct_values
FROM lineitem GROUP BY l_partkey ORDER BY l_partkey
"""


def q_stratified_sample(sf_dir: str):
    """Deterministic 10-docs-per-source stratified sample of documents
    (per-stratum bottom-k Knuth priorities; one coarse-partition
    shuffle, one lexsort per partition). Oracle: identical HUGEINT
    priority arithmetic + row_number window in DuckDB."""
    from ..sample import stratified_sample

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "n_chars"],
    ).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "source": t["source"],
                "n_chars": pc.cast(t["n_chars"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return stratified_sample(docs, "source", "doc_id", n=10, seed=5)


SQL_STRATIFIED_SAMPLE = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
       CAST(n_chars AS BIGINT) AS n_chars
FROM documents
QUALIFY row_number() OVER (
  PARTITION BY source
  ORDER BY ((CAST(doc_id AS HUGEINT) + 5) * 11400714819323198485)
           % 18446744073709551616, doc_id
) <= 10
ORDER BY source, doc_id
"""


def q_weighted_sample(sf_dir: str):
    """Length-proportional document sample (priority sampling: bottom-200
    by u/w, w = n_chars): per-batch partials + one coalesce; rank value
    is a single IEEE double division so DuckDB agrees bit-for-bit."""
    from ..sample import weighted_sample

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    out = weighted_sample(docs, "doc_id", "n_chars", n=200, seed=11)
    return out.sort("doc_id")


SQL_WEIGHTED_SAMPLE = """
SELECT * FROM (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(n_chars AS BIGINT) AS n_chars
  FROM documents
  ORDER BY CAST(((CAST(doc_id AS HUGEINT) + 11) * 11400714819323198485)
                % 18446744073709551616 AS DOUBLE) / n_chars, doc_id
  LIMIT 200
) ORDER BY doc_id
"""


def q_top_terms(sf_dir: str):
    """Top-10 whitespace tokens per language (pre-aggregated wide count:
    per-batch partial (lang, token) counts, token-hash partition fold,
    grouped_topk rank — the vocabulary/stopword-profile pass)."""
    from ..textops import top_terms

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )
    return top_terms(docs, k=10, by_col="lang")


SQL_TOP_TERMS = """
WITH toks AS (
  SELECT lang,
         unnest(string_split_regex(lower(text), '\\s+')) AS token
  FROM documents),
counts AS (
  SELECT lang, token, CAST(count(*) AS BIGINT) AS cnt
  FROM toks WHERE token <> '' GROUP BY lang, token),
ranked AS (
  SELECT lang, token, cnt,
         row_number() OVER (
           PARTITION BY lang ORDER BY cnt DESC, token) AS rank
  FROM counts)
SELECT lang, token, cnt, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10 ORDER BY lang, rank
"""


def q_broadcast_join(sf_dir: str):
    """Chained broadcast joins against dimension tables (supplier ->
    nation -> region): the small sides are ray.put once and resolved
    zero-copy in every map task — ZERO shuffles, streaming left side.
    The counterpart shape to hash_join for lookup-table enrichment."""
    from ..relops import broadcast_join

    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_nationkey"],
    ).map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": pc.cast(t["s_suppkey"], pa.int64()),
                "s_name": t["s_name"],
                "s_nationkey": pc.cast(t["s_nationkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    nation = ray.data.read_parquet(f"{sf_dir}/nation.parquet").map_batches(
        lambda t: pa.table(
            {
                "n_nationkey": pc.cast(t["n_nationkey"], pa.int64()),
                "n_name": t["n_name"],
                "n_regionkey": pc.cast(t["n_regionkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    region = ray.data.read_parquet(f"{sf_dir}/region.parquet").map_batches(
        lambda t: pa.table(
            {
                "r_regionkey": pc.cast(t["r_regionkey"], pa.int64()),
                "r_name": t["r_name"],
            }
        ),
        batch_format="pyarrow",
    )
    out = broadcast_join(
        broadcast_join(supp, nation, "s_nationkey", "n_nationkey"),
        region,
        "n_regionkey",
        "r_regionkey",
    )
    return out.map_batches(
        lambda t: t.select(["s_suppkey", "s_name", "n_name", "r_name"]),
        batch_format="pyarrow",
    )


SQL_BROADCAST_JOIN = """
SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name,
       n.n_name, r.r_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
ORDER BY s_suppkey
"""


def q_quality_filter(sf_dir: str):
    """Corpus-percentile quality gate: keep documents whose heuristic
    quality score is >= the corpus 75th percentile — the canonical
    "filter the training corpus to its best quartile" pass. Two
    streaming passes: the exact distributed quantile (histogram
    refinement — scalar result, no global sort) sets the threshold,
    then a stateless vectorized filter applies it; only the scalar
    threshold ever reaches the driver."""
    from ..quantile import exact_quantiles
    from ..textops import quality_score

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    qual = quality_score(docs).map_batches(
        lambda df: df.assign(quality=round_away(df["quality"], 6))[
            ["doc_id", "quality"]
        ],
        batch_format="pandas",
    )
    thr_tbl = exact_quantiles(
        qual, "quality", qs=(0.75,), num_bins=256, collect_threshold=1024
    )
    thr = float(thr_tbl["value"][0].as_py())
    return qual.map_batches(
        lambda t: t.filter(
            pc.greater_equal(t["quality"], pa.scalar(thr))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


SQL_QUALITY_FILTER = """
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         coalesce(text, '') AS text,
         string_split_regex(trim(coalesce(text, '')), '\\s+') AS toks
  FROM documents),
feat AS (
  SELECT doc_id,
         CAST(length(text) - length(regexp_replace(text,
              '[.,;:!?"''()\\[\\]{}]', '', 'g')) AS DOUBLE)
           / greatest(length(text), 1) AS punct_ratio,
         coalesce(list_avg(list_transform(toks,
              t -> CAST(length(t) AS DOUBLE))), 0.0) AS mean_token_len,
         CASE WHEN length(text) BETWEEN 50 AND 20000 THEN 1.0 ELSE 0.0 END
           AS length_ok
  FROM base),
qual AS (
  SELECT doc_id,
         round(0.4 * length_ok
               + 0.3 * (1.0 - least(greatest(punct_ratio, 0), 1))
               + 0.3 * (least(greatest(mean_token_len, 0), 10) / 10.0), 6)
           + 0 AS quality
  FROM feat)
SELECT doc_id, quality FROM qual
WHERE quality >= (SELECT quantile_disc(quality, 0.75) FROM qual)
ORDER BY doc_id
"""


def q_nation_revenue(sf_dir: str):
    """TPC-H Q5 shape: revenue by customer nation within one region.
    5-table plan with the two join regimes used where each belongs:
    lineitem revenue pre-aggregated per orderkey (combiner) -> shuffle
    join orders -> per-custkey fold -> shuffle join customer (fact-sized
    side) -> per-nation fold -> region+nation dimension chain resolved
    driver-side (a few rows) and applied as a broadcast lookup."""
    from ..relops import broadcast_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def rev(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(t["l_orderkey"], pa.int64()),
                "revenue": pc.multiply(
                    t["l_extendedprice"],
                    pc.subtract(pa.scalar(1.0), t["l_discount"]),
                ),
            }
        )

    P = 32

    def add_part(t: pa.Table) -> pa.Table:
        part = pc.cast(
            pc.bit_wise_and(t["k"], pa.scalar(P - 1, pa.int64())), pa.int32()
        )
        return t.append_column("__part", part)

    def sum_partition(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy(zero_copy_only=False)
        v = g["revenue"].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        starts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        return pa.table(
            {
                "k": pa.array(k[starts], pa.int64()),
                "revenue": pa.array(np.add.reduceat(v, starts), pa.float64()),
            }
        )

    def fold(ds):
        return (
            ds.map_batches(add_part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("__part")
            .map_groups(sum_partition, batch_format="pyarrow")
        )

    per_order = fold(
        li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "k": pc.cast(t["o_orderkey"], pa.int64()),
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    per_cust = fold(
        per_order.join(orders, join_type="inner", num_partitions=8,
                       on=("k",))
        .map_batches(
            lambda t: pa.table({"k": t["o_custkey"], "revenue": t["revenue"]}),
            batch_format="pyarrow",
        )
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    per_nation = fold(
        broadcast_join(
            per_cust.map_batches(
                lambda t: pa.table({"ck": t["k"], "revenue": t["revenue"]}),
                batch_format="pyarrow",
            ),
            cust,
            "ck",
            "c_custkey",
        ).map_batches(
            lambda t: pa.table(
                {"k": pc.cast(t["c_nationkey"], pa.int64()),
                 "revenue": t["revenue"]}
            ),
            batch_format="pyarrow",
        )
    )
    # dimension chain: nation ⋈ region filtered to one region — a few
    # dozen rows; resolved driver-side, applied as a broadcast lookup
    nation = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    region = ray.data.read_parquet(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    dim = nation.merge(
        region[region["r_name"] == "ASIA"],
        left_on="n_regionkey", right_on="r_regionkey",
    )[["n_nationkey", "n_name"]]
    out = per_nation.to_pandas().rename(columns={"k": "n_nationkey"})
    out = out.merge(dim, on="n_nationkey")  # per-nation rows: tiny
    out["revenue"] = round_away(out["revenue"], 2)
    return (
        out[["n_name", "revenue"]]
        .sort_values(["revenue", "n_name"], ascending=[False, True])
        .reset_index(drop=True)
    )


SQL_NATION_REVENUE = """
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) + 0 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
"""


def q_funnel(sf_dir: str):
    """Ordered view -> click -> purchase funnel over events: cumulative
    users reaching each step strictly after the previous one. One
    user-hash shuffle, K vectorized scatter-min passes per partition,
    driver folds partitions x (K+1) depth rows."""
    from ..windows import funnel_steps

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"],
    )
    return funnel_steps(
        ev, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    )


SQL_FUNNEL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e
  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e
  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT 'step1_view' AS step, count(*) AS users FROM s1
UNION ALL SELECT 'step2_click', count(*) FROM s2
UNION ALL SELECT 'step3_purchase', count(*) FROM s3
ORDER BY step
"""


def q_rank_stats(sf_dir: str):
    """Per-user RANK / PERCENT_RANK / CUME_DIST over a coarsened value
    bucket (floor(value) — coarse so real tie groups exist and the SQL
    tie semantics are exercised, not dodged). Stat divisions are single
    IEEE double ops of integer operands — bit-identical to DuckDB with
    no rounding escape hatch."""
    from ..relops import grouped_rank_stats

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    ).map_batches(
        lambda t: pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "vbucket": pc.cast(pc.floor(t["value"]), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    out = grouped_rank_stats(ev, "user_id", "vbucket", "event_id")
    return out.map_batches(
        lambda t: t.select(
            ["event_id", "user_id", "rank", "percent_rank", "cume_dist"]
        ),
        batch_format="pyarrow",
    )


SQL_RANK_STATS = """
WITH b AS (
  SELECT event_id, user_id,
         CAST(floor(value) AS BIGINT) AS vbucket
  FROM events)
SELECT event_id, user_id,
       CAST(rank() OVER w AS BIGINT) AS rank,
       percent_rank() OVER w AS percent_rank,
       cume_dist() OVER w AS cume_dist
FROM b WINDOW w AS (PARTITION BY user_id ORDER BY vbucket)
ORDER BY event_id
"""


def q_corpus_prep(sf_dir: str):
    """The composed LLM training-data prep funnel — language filter ->
    corpus-median quality gate -> exact dedup — with per-stage survivor
    counts, every stage reusing a shuffle-shaped operator: stateless
    lang filter, distributed exact quantile (scalar to driver), keyed
    semi join (no broadcast keep-set), one-shuffle min-id dedup. The
    whole funnel is SQL-expressible, so the composition is oracle-exact,
    not just the pieces."""
    from ..dedup import dedup_exact
    from ..quantile import exact_quantiles
    from ..relops import semi_join
    from ..textops import quality_score

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    n_total = docs.count()
    en = docs.map_batches(
        lambda t: t.filter(pc.equal(t["lang"], pa.scalar("en"))).select(
            ["doc_id", "text"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    n_en = en.count()
    qual = quality_score(en).map_batches(
        lambda df: df.assign(quality=round_away(df["quality"], 6))[
            ["doc_id", "quality"]
        ],
        batch_format="pandas",
    )
    thr_tbl = exact_quantiles(
        qual, "quality", qs=(0.5,), num_bins=256, collect_threshold=1024
    )
    thr = float(thr_tbl["value"][0].as_py())
    gated = qual.map_batches(
        lambda t: t.filter(pc.greater_equal(t["quality"], pa.scalar(thr))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    kept = semi_join(en, gated.select_columns(["doc_id"]).map_batches(
        lambda t: pa.table({"gid": t["doc_id"]}), batch_format="pyarrow",
    ), "doc_id", "gid")
    n_gated = kept.count()
    surv = dedup_exact(kept, content_cols=["text"])
    n_dedup = surv.count()
    return pd.DataFrame(
        {
            "stage": ["1_total", "2_lang_en", "3_quality_gate", "4_dedup"],
            "rows": np.array([n_total, n_en, n_gated, n_dedup], np.int64),
        }
    )


SQL_CORPUS_PREP = """
WITH en AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, coalesce(text, '') AS text
  FROM documents WHERE lang = 'en'),
feat AS (
  SELECT doc_id, text,
         CAST(length(text) - length(regexp_replace(text,
              '[.,;:!?"''()\\[\\]{}]', '', 'g')) AS DOUBLE)
           / greatest(length(text), 1) AS punct_ratio,
         coalesce(list_avg(list_transform(
              string_split_regex(trim(text), '\\s+'),
              t -> CAST(length(t) AS DOUBLE))), 0.0) AS mean_token_len,
         CASE WHEN length(text) BETWEEN 50 AND 20000 THEN 1.0 ELSE 0.0 END
           AS length_ok
  FROM en),
qual AS (
  SELECT doc_id, text,
         round(0.4 * length_ok
               + 0.3 * (1.0 - least(greatest(punct_ratio, 0), 1))
               + 0.3 * (least(greatest(mean_token_len, 0), 10) / 10.0), 6)
           + 0 AS quality
  FROM feat),
gate AS (
  SELECT doc_id, text FROM qual
  WHERE quality >= (SELECT quantile_disc(quality, 0.5) FROM qual)),
ded AS (SELECT min(doc_id) AS doc_id FROM gate GROUP BY text)
SELECT '1_total' AS stage, count(*) AS rows FROM documents
UNION ALL SELECT '2_lang_en', count(*) FROM en
UNION ALL SELECT '3_quality_gate', count(*) FROM gate
UNION ALL SELECT '4_dedup', count(*) FROM ded
ORDER BY stage
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def q_redact(sf_dir: str):
    """Regex redaction of every vowel run — stand-in for the PII-mask
    pass; one Arrow RE2 kernel per batch, oracle-checked against
    DuckDB's regexp_replace (both RE2 semantics)."""
    from ..textops import redact

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        lambda t: pa.table(
            {"doc_id": pc.cast(t["doc_id"], pa.int64()), "text": t["text"]}
        ),
        batch_format="pyarrow",
    )
    return redact(docs, "[aeiou]+", "*", out_col="text_red").select_columns(
        ["doc_id", "text_red"]
    )


SQL_REDACT = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       regexp_replace(text, '[aeiou]+', '*', 'g') AS text_red
FROM documents ORDER BY doc_id
"""


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: probe strings are a deterministic
    eval-suite extract (middle 30 chars of every 37th doc), broadcast
    once; every document is flagged if its text contains any probe."""
    from ..textops import decontaminate

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        lambda t: pa.table(
            {"doc_id": pc.cast(t["doc_id"], pa.int64()), "text": t["text"]}
        ),
        batch_format="pyarrow",
    )
    # the probe list is tiny by construction (an eval suite, not the
    # corpus) — collecting it to the driver is the broadcast, not a leak
    def extract_probes(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        is_probe = pa.array(
            (ids % 37 == 0)
            & (
                pc.utf8_length(t["text"])
                .to_numpy(zero_copy_only=False)
                >= 60
            )
        )
        sel = t.filter(is_probe)
        return pa.table(
            {"p": pc.utf8_slice_codeunits(sel["text"], start=20, stop=50)}
        )

    probe_rows = docs.map_batches(extract_probes, batch_format="pyarrow")
    probes = [r["p"] for r in probe_rows.take_all()]
    return decontaminate(docs, probes).select_columns(
        ["doc_id", "contaminated"]
    )


SQL_DECONTAMINATE = """
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(CASE WHEN EXISTS (
           SELECT 1 FROM documents p
           WHERE p.doc_id % 37 = 0 AND length(p.text) >= 60
             AND contains(d.text, substr(p.text, 21, 30))
       ) THEN 1 ELSE 0 END AS BIGINT) AS contaminated
FROM documents d ORDER BY doc_id
"""


def q_curation(sf_dir: str):
    """FineWeb/CCNet-style curation verdict per document: language-ID,
    quality >= 0.5, Gopher repetition caps, exact-dedup keeper and
    eval-probe decontamination composed into one keep flag. Every rule
    reuses a tol-0 oracle-checked kernel, so the composition is
    oracle-checked too."""
    from .curation import CurationConfig, run_curation

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return run_curation(docs, CurationConfig()).sort("doc_id")


SQL_CURATION = """
WITH ltoks AS (
    SELECT CAST(doc_id AS BIGINT) doc_id,
           string_split_regex(trim(lower(coalesce(text, ''))), '\\s+') t
    FROM documents),
lang AS (
    SELECT doc_id,
        CASE WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0
             THEN 'unknown'
             WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
             WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
             WHEN s_fr >= s_es THEN 'fr'
             ELSE 'es' END AS lang_pred
    FROM (SELECT doc_id,
        len(list_filter(t, x -> x IN ('the', 'a', 'of', 'and', 'is'))) s_en,
        len(list_filter(t, x -> x IN ('der', 'die', 'das', 'und', 'ist'))) s_de,
        len(list_filter(t, x -> x IN ('le', 'la', 'les', 'et', 'est'))) s_fr,
        len(list_filter(t, x -> x IN ('el', 'los', 'una', 'y', 'es'))) s_es
      FROM ltoks)),
qbase AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         coalesce(text, '') AS text,
         string_split_regex(trim(coalesce(text, '')), '\\s+') AS toks
  FROM documents),
qual AS (
  SELECT doc_id,
         round(0.4 * (CASE WHEN length(text) BETWEEN 50 AND 20000
                      THEN 1.0 ELSE 0.0 END)
             + 0.3 * (1.0 - least(greatest(
                  CAST(length(text) - length(regexp_replace(text,
                       '[.,;:!?"''()\\[\\]{}]', '', 'g')) AS DOUBLE)
                  / greatest(length(text), 1), 0), 1))
             + 0.3 * (least(greatest(coalesce(list_avg(list_transform(toks,
                  t -> CAST(length(t) AS DOUBLE))), 0.0), 0), 10) / 10.0),
             6) + 0 AS quality
  FROM qbase),
w AS (SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS wd
      FROM documents),
wc AS (SELECT doc_id, wd, count(*) c FROM w GROUP BY doc_id, wd),
per AS (SELECT doc_id, sum(c) n, count(*) d FROM wc GROUP BY doc_id),
lists AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') l
          FROM documents),
bg AS (SELECT doc_id,
              unnest(list_transform(range(1, len(l)),
                                    i -> l[i] || chr(1) || l[i+1])) AS b
       FROM lists WHERE len(l) > 1),
bper AS (SELECT doc_id, count(*) nb, count(DISTINCT b) db
         FROM bg GROUP BY doc_id),
rep AS (
  SELECT CAST(p.doc_id AS BIGINT) AS doc_id,
         round(1 - d / CAST(n AS DOUBLE), 6) + 0 AS dwf,
         COALESCE(round(1 - db / CAST(nb AS DOUBLE), 6), 0.0) + 0 AS d2f
  FROM per p LEFT JOIN bper b ON p.doc_id = b.doc_id),
dedupk AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(CAST(doc_id AS BIGINT) =
              min(CAST(doc_id AS BIGINT)) OVER (PARTITION BY text)
              AS BIGINT) AS keep_dedup
  FROM documents),
contam AS (
  SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
         CAST(CASE WHEN EXISTS (
             SELECT 1 FROM documents p
             WHERE p.doc_id % 37 = 0 AND length(p.text) >= 60
               AND contains(d.text, substr(p.text, 21, 30))
         ) THEN 1 ELSE 0 END AS BIGINT) AS contaminated
  FROM documents d)
SELECT l.doc_id,
       CAST(l.lang_pred = 'en' AS BIGINT) AS lang_ok,
       CAST(q.quality >= 0.5 AS BIGINT) AS quality_ok,
       CAST(r.dwf <= 0.55 AND r.d2f <= 0.3 AS BIGINT) AS repetition_ok,
       c.contaminated,
       k.keep_dedup,
       CAST(l.lang_pred = 'en' AND q.quality >= 0.5
            AND r.dwf <= 0.55 AND r.d2f <= 0.3
            AND c.contaminated = 0 AND k.keep_dedup = 1 AS BIGINT) AS keep
FROM lang l
JOIN qual q USING (doc_id)
JOIN rep r USING (doc_id)
JOIN dedupk k USING (doc_id)
JOIN contam c USING (doc_id)
ORDER BY doc_id
"""


def q_delta_dedup(sf_dir: str):
    """Incremental dedup of a synthetic "new snapshot" against the base
    corpus: even-id incoming docs repeat base texts verbatim (must be
    dropped), odd-id docs carry a ' v2' suffix (must survive). One
    distributed anti join on the content key; no broadcast keep-set."""
    from ..dedup import dedup_against_corpus

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        lambda t: pa.table(
            {"doc_id": pc.cast(t["doc_id"], pa.int64()), "text": t["text"]}
        ),
        batch_format="pyarrow",
    )

    def mk_incoming(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        odd = pa.array((ids % 2) == 1)
        suffixed = pc.binary_join_element_wise(
            t["text"], pa.scalar("v2"), pa.scalar(" ")
        )
        return pa.table(
            {
                "doc_id": pa.array(ids + 200000, pa.int64()),
                "text": pc.if_else(odd, suffixed, t["text"]),
            }
        )

    incoming = docs.map_batches(mk_incoming, batch_format="pyarrow")
    kept = dedup_against_corpus(incoming, docs, text_col="text")
    return kept.select_columns(["doc_id"])


SQL_DELTA_DEDUP = """
WITH inc AS (
    SELECT CAST(doc_id AS BIGINT) + 200000 AS doc_id,
           CASE WHEN doc_id % 2 = 1 THEN text || ' v2' ELSE text END AS text
    FROM documents)
SELECT i.doc_id FROM inc i
WHERE NOT EXISTS (SELECT 1 FROM documents b WHERE b.text = i.text)
ORDER BY doc_id
"""


def q_shuffle_rank(sf_dir: str):
    """Seeded deterministic global shuffle of the corpus: every doc gets
    an exact shuffle position (rank of its Knuth hash priority) —
    reproducible training-shard order, oracle-checked with the same
    arithmetic as row_number() over the hashed key."""
    from ..sample import deterministic_shuffle

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(
        lambda t: pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64())}),
        batch_format="pyarrow",
    )
    out = deterministic_shuffle(docs, "doc_id", seed=9)
    return out.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "shuffle_pos": pc.cast(t["rank"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


SQL_SHUFFLE_RANK = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(row_number() OVER (
           ORDER BY ((CAST(doc_id AS HUGEINT) + 9) * 11400714819323198485)
                    % 18446744073709551616, doc_id
       ) AS BIGINT) AS shuffle_pos
FROM documents ORDER BY doc_id
"""


def q_tfidf(sf_dir: str):
    """Top-3 TF-IDF keywords per document: shuffle-free per-batch TF,
    token-partitioned DF fold, co-partitioned TF x DF join, per-doc
    top-k — the corpus-weighted keyword extraction pass."""
    from ..textops import tfidf_topk

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        lambda t: pa.table(
            {"doc_id": pc.cast(t["doc_id"], pa.int64()), "text": t["text"]}
        ),
        batch_format="pyarrow",
    )
    return tfidf_topk(docs, k=3)


SQL_TFIDF = """
WITH toks AS (
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
    FROM documents),
tf AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
df AS (SELECT tok, count(*) AS d FROM tf GROUP BY tok),
n AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM documents),
scored AS (
    SELECT tf.doc_id, tf.tok,
           tf.c * ln((SELECT nn FROM n) / d) AS s,
           CAST(row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.c * ln((SELECT nn FROM n) / d) DESC, tf.tok
           ) AS BIGINT) AS rank
    FROM tf JOIN df USING (tok))
SELECT doc_id, tok, round(s, 6) + 0 AS tfidf, rank
FROM scored WHERE rank <= 3 ORDER BY doc_id, rank
"""


def q_zscore(sf_dir: str):
    """Per-event-type z-score normalization of every event's value
    (tiny moment shuffle + broadcast second pass; raw rows never
    shuffle)."""
    from ..moments import zscore

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    out = zscore(ev, "event_type", "value", "event_id")
    return out.map_batches(
        lambda df: df.assign(z=round_away(df["z"], 6)),
        batch_format="pandas",
    )


SQL_ZSCORE = """
WITH m AS (
  SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sd
  FROM events GROUP BY event_type)
SELECT e.event_id, e.event_type,
       round(CASE WHEN m.sd > 0 THEN (e.value - m.mu) / m.sd
                  ELSE 0.0 END, 6) + 0 AS z
FROM events e JOIN m USING (event_type)
ORDER BY event_id
"""


def q_column_corr(sf_dir: str):
    """Pearson correlation of two lineitem measures from one pass of six
    scalar moment partials (no shuffle at all — a pure tree reduce)."""
    from ..moments import pearson_corr

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_quantity", "l_extendedprice"]
    )
    out = pearson_corr(li, "l_quantity", "l_extendedprice")
    out["corr"] = round_away(out["corr"], 6)
    return out


SQL_COLUMN_CORR = """
SELECT round(corr(l_quantity, l_extendedprice), 6) + 0 AS corr,
       count(*) AS n
FROM lineitem
"""


def q_value_histogram(sf_dir: str):
    """Fixed-width histogram of events.value (width 5): per-batch
    bincount partials, one tiny fold over distinct bins."""
    from ..moments import value_histogram

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    return value_histogram(ev, "value", 5.0)


SQL_VALUE_HISTOGRAM = """
SELECT CAST(floor(value / 5.0) AS BIGINT) AS bin, count(*) AS n
FROM events GROUP BY bin ORDER BY bin
"""


def q_rollup_sales(sf_dir: str):
    """GROUP BY ROLLUP (returnflag, linestatus) over lineitem: one
    distributed finest-level pass; coarser levels derived from the tiny
    aggregate, not re-scans."""
    from ..moments import rollup_sum_count

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice"],
    )
    out = rollup_sum_count(
        li, ["l_returnflag", "l_linestatus"], "l_extendedprice"
    )
    out = out.rename(columns={"s": "sum_price", "c": "n"})
    out["sum_price"] = round_away(out["sum_price"], 2)
    return out


SQL_ROLLUP_SALES = """
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       round(sum(l_extendedprice), 2) + 0 AS sum_price,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


def q_cube_sales(sf_dir: str):
    """GROUP BY CUBE (returnflag, linestatus) over lineitem: the rollup
    machinery extended to every key subset — still one distributed
    finest-level pass, all 2^k marginals derived from the tiny
    aggregate."""
    from ..moments import cube_sum_count

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice"],
    )
    out = cube_sum_count(
        li, ["l_returnflag", "l_linestatus"], "l_extendedprice"
    )
    out = out.rename(columns={"s": "sum_price", "c": "n"})
    out["sum_price"] = round_away(out["sum_price"], 2)
    return out


SQL_CUBE_SALES = """
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       round(sum(l_extendedprice), 2) + 0 AS sum_price,
       count(*) AS n
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


def q_event_gaps(sf_dir: str):
    """Per-user LAG delta (microseconds since the user's previous event);
    one key-hash shuffle, one lexsort + diff per partition."""
    from ..windows import event_gaps

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    return event_gaps(ev, "user_id", "ts", "event_id")


SQL_EVENT_GAPS = """
WITH w AS (
  SELECT event_id, user_id, epoch_us(ts) AS es,
         lag(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events)
SELECT event_id, user_id, es - prev AS gap_us
FROM w WHERE prev IS NOT NULL ORDER BY event_id
"""


def q_dup_ngrams(sf_dir: str):
    """Duplicate token 3-grams across >= 2 distinct documents, top 100 by
    document frequency (substring-dedup discovery pass)."""
    from ..textops import dup_ngrams

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    return dup_ngrams(docs, n=3, min_docs=2, k=100)


SQL_DUP_NGRAMS = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'),
                     t -> t <> '') AS ts
  FROM documents),
grams AS (
  SELECT DISTINCT doc_id,
         ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS ngram
  FROM toks, unnest(generate_series(1, len(ts) - 2)) AS u(i)
  WHERE len(ts) >= 3)
SELECT ngram, count(*) AS n_docs
FROM grams GROUP BY ngram HAVING count(*) >= 2
ORDER BY n_docs DESC, ngram LIMIT 100
"""


def q_dup_spans(sf_dir: str):
    """Exact-substring dedup REMOVAL pass (Lee et al.): per document,
    the token positions covered by a cross-document duplicated run of
    >= 5 tokens (keeper = min doc_id), as (n_tokens, dup_tokens,
    n_spans, dup_frac). Oracle-checked: the L-gram/keeper/coverage
    semantics are pure set algebra over whitespace tokens."""
    from ..textops import dup_span_stats

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = dup_span_stats(docs, L=5)
    return out.map_batches(
        lambda df: df.assign(dup_frac=round_away(df["dup_frac"], 6)),
        batch_format="pandas",
    ).sort("doc_id")


SQL_DUP_SPANS = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS id,
         string_split_regex(trim(coalesce(text, '')), '\\s+') AS toks
  FROM documents),
t AS (SELECT id, len(toks) AS n FROM d),
g AS (
  SELECT d.id, u.i AS i,
         array_to_string(list_slice(d.toks, u.i, u.i + 4), ' ') AS gram
  FROM d, unnest(generate_series(1, len(d.toks) - 4)) AS u(i)
  WHERE len(d.toks) >= 5),
dup AS (
  SELECT gram, min(id) AS keeper
  FROM g GROUP BY gram HAVING count(DISTINCT id) >= 2),
sel AS (
  SELECT g.id, g.i FROM g JOIN dup USING (gram) WHERE g.id <> dup.keeper),
cov AS (
  SELECT DISTINCT sel.id, u.j
  FROM sel, unnest(generate_series(sel.i, sel.i + 4)) AS u(j)),
runs AS (
  SELECT id, j - row_number() OVER (PARTITION BY id ORDER BY j) AS grp
  FROM cov),
agg AS (
  SELECT id, count(*) AS dup_tokens, count(DISTINCT grp) AS n_spans
  FROM runs GROUP BY id)
SELECT t.id AS doc_id, CAST(t.n AS BIGINT) AS n_tokens,
       CAST(coalesce(a.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
       round(CAST(coalesce(a.dup_tokens, 0) AS DOUBLE) / t.n, 6) + 0
           AS dup_frac
FROM t LEFT JOIN agg a ON t.id = a.id
ORDER BY doc_id
"""


def q_substring_clean(sf_dir: str):
    """Exact-substring dedup with the spans actually CUT OUT: per doc
    the surviving tokens re-joined with single spaces (fully-covered
    docs become ''). Oracle-checked — the keeper/coverage semantics are
    set algebra and the re-join is string_agg over kept positions.
    Runs the JOIN transport (the 100-TB tier: the dup-gram table and
    the per-doc span table stay distributed; no broadcast) so the
    driver's oracle pins the distributed removal pass byte-exactly —
    the broadcast tier is pinned identical by
    test_dup_span_stats_join_return_text_parity."""
    from ..textops import dup_span_stats

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = dup_span_stats(docs, L=5, return_text=True, transport="join")
    return out.map_batches(
        lambda df: df[["doc_id", "dup_tokens", "clean_text"]],
        batch_format="pandas",
    ).sort("doc_id")


SQL_SUBSTRING_CLEAN = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS id,
         string_split_regex(trim(coalesce(text, '')), '\\s+') AS toks
  FROM documents),
g AS (
  SELECT d.id, u.i AS i,
         array_to_string(list_slice(d.toks, u.i, u.i + 4), ' ') AS gram
  FROM d, unnest(generate_series(1, len(d.toks) - 4)) AS u(i)
  WHERE len(d.toks) >= 5),
dup AS (
  SELECT gram, min(id) AS keeper
  FROM g GROUP BY gram HAVING count(DISTINCT id) >= 2),
sel AS (
  SELECT g.id, g.i FROM g JOIN dup USING (gram) WHERE g.id <> dup.keeper),
cov AS (
  SELECT DISTINCT sel.id, u.j
  FROM sel, unnest(generate_series(sel.i, sel.i + 4)) AS u(j)),
pos AS (
  SELECT d.id, u.p AS p, d.toks[u.p] AS tok
  FROM d, unnest(generate_series(1, len(d.toks))) AS u(p)),
kept AS (
  SELECT pos.id, pos.p, pos.tok
  FROM pos LEFT JOIN cov ON pos.id = cov.id AND pos.p = cov.j
  WHERE cov.id IS NULL)
SELECT d.id AS doc_id,
       CAST(coalesce(c.n, 0) AS BIGINT) AS dup_tokens,
       coalesce(k.t, '') AS clean_text
FROM d
LEFT JOIN (SELECT id, count(*) AS n FROM cov GROUP BY id) c ON d.id = c.id
LEFT JOIN (SELECT id, string_agg(tok, ' ' ORDER BY p) AS t
           FROM kept GROUP BY id) k ON d.id = k.id
ORDER BY doc_id
"""


def q_grouped_mad(sf_dir: str):
    """Per-event-type median + MAD (robust dispersion), quantile_disc
    semantics; one key-hash shuffle, two lexsorts per partition."""
    from ..quantile import grouped_mad

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )
    return grouped_mad(ev, "event_type", "value")


SQL_GROUPED_MAD = """
WITH m AS (
  SELECT event_type, quantile_disc(value, 0.5) AS med
  FROM events GROUP BY event_type)
SELECT e.event_type, any_value(m.med) AS med,
       quantile_disc(abs(e.value - m.med), 0.5) AS mad
FROM events e JOIN m USING (event_type)
GROUP BY e.event_type ORDER BY e.event_type
"""


def q_bloom_semi(sf_dir: str):
    """Semi join with a Bloom-filter pre-pass: lineitem rows of urgent
    orders. Result-identical to the exact semi join; the bloom bitmap
    (broadcast once) keeps non-matching rows out of the shuffle."""
    from ..relops import bloom_semi_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber"]
    )
    urgent = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(
        lambda t: t.filter(
            pc.equal(t["o_orderpriority"], "1-URGENT")
        ).select(["o_orderkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey")


SQL_BLOOM_SEMI = """
SELECT l_orderkey, l_linenumber FROM lineitem
WHERE l_orderkey IN (
    SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
ORDER BY l_orderkey, l_linenumber
"""


def q_train_split(sf_dir: str):
    """Leakage-safe train/val/test split: every member of a near-dup
    component gets the SAME split, assigned deterministically from the
    component representative (min id) — duplicate pairs can never
    straddle train and eval."""
    comp = q_components(sf_dir)

    def assign(t: pa.Table) -> pa.Table:
        c = t["component"].to_numpy(zero_copy_only=False)
        m = c % 10
        split = np.where(m <= 7, "train", np.where(m == 8, "val", "test"))
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "component": t["component"],
                "split": pa.array(split, pa.string()),
            }
        )

    return comp.map_batches(assign, batch_format="pyarrow")


def q_triangle_count(sf_dir: str):
    """Exact triangle count of the mutual-5NN graph over all embeddings
    (min-vertex wedge enumeration + one edge-membership shuffle)."""
    from ..cluster import triangle_count
    from ..dedup import dedup_pair_rows
    from ..search import knn_search, shard_refs_from_dataset

    ds = _emb_ds(sf_dir)
    shards, _, _ = shard_refs_from_dataset(ds)
    knn = knn_search(ds, shards, k=5, exclude_self=True)

    def to_pairs(t: pa.Table) -> pa.Table:
        q = t["query_id"].to_numpy(zero_copy_only=False)
        ids_col = t["neigh_ids"].combine_chunks()
        kk = len(ids_col[0]) if len(ids_col) else 0
        ids = ids_col.values.to_numpy(zero_copy_only=False).reshape(
            len(q), kk
        )
        keep = (ids >= 0).ravel()
        a = np.repeat(q, kk)[keep]
        b = ids.ravel()[keep]
        return pa.table(
            {
                "a": pa.array(np.minimum(a, b), pa.int64()),
                "b": pa.array(np.maximum(a, b), pa.int64()),
            }
        )

    directed = knn.map_batches(
        to_pairs, batch_format="pyarrow", zero_copy_batch=True
    )
    # mutual edge <=> normalized pair seen from both endpoints
    edges = dedup_pair_rows(directed, min_count=2)
    n = triangle_count(edges)
    return pd.DataFrame({"triangles": [n]})


SQL_TRIANGLE_COUNT = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
d AS (SELECT x.vec_id i, y.vec_id j, list_distance(x.e, y.e) dist
      FROM v x JOIN v y ON x.vec_id <> y.vec_id),
knn AS (SELECT i, j FROM
        (SELECT i, j, row_number() OVER (PARTITION BY i ORDER BY dist, j) rn
         FROM d) WHERE rn <= 5),
mut AS (SELECT k1.i a, k1.j b FROM knn k1
        JOIN knn k2 ON k2.i = k1.j AND k2.j = k1.i
        WHERE k1.i < k1.j)
SELECT count(*) AS triangles
FROM mut e1 JOIN mut e2 ON e2.a = e1.b
JOIN mut e3 ON e3.a = e1.a AND e3.b = e2.b
"""


def q_pmi_bigrams(sf_dir: str):
    """Top-50 PMI collocations (adjacent-token bigrams, count >= 5)."""
    from ..textops import pmi_bigrams

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    return pmi_bigrams(docs, min_count=5, k=50)


SQL_PMI_BIGRAMS = """
WITH toks AS (
  SELECT list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'),
                     t -> t <> '') AS ts
  FROM documents),
uni AS (SELECT u.t AS tok, count(*) AS n
        FROM toks, unnest(ts) AS u(t) GROUP BY tok),
tt AS (SELECT CAST(sum(n) AS DOUBLE) v FROM uni),
big AS (SELECT ts[i] AS a, ts[i + 1] AS b, count(*) AS n_ab
        FROM toks, unnest(generate_series(1, len(ts) - 1)) AS g(i)
        WHERE len(ts) >= 2 GROUP BY a, b),
bb AS (SELECT CAST(sum(n_ab) AS DOUBLE) v FROM big),
scored AS (
  SELECT big.a || ' ' || big.b AS bigram, big.n_ab,
         round(ln((big.n_ab / (SELECT v FROM bb)) /
               ((ua.n / (SELECT v FROM tt)) * (ub.n / (SELECT v FROM tt)))),
               6) + 0 AS pmi
  FROM big JOIN uni ua ON ua.tok = big.a JOIN uni ub ON ub.tok = big.b
  WHERE big.n_ab >= 5)
SELECT bigram, n_ab, pmi FROM scored
ORDER BY pmi DESC, bigram LIMIT 50
"""


SQL_TRAIN_SPLIT = SQL_COMPONENTS.rstrip().rsplit("SELECT", 1)[0] + """SELECT node AS vec_id, CAST(min(r) AS BIGINT) AS component,
       CASE WHEN min(r) % 10 <= 7 THEN 'train'
            WHEN min(r) % 10 = 8 THEN 'val' ELSE 'test' END AS split
FROM reach GROUP BY node ORDER BY vec_id
"""


def q_event_seq(sf_dir: str):
    """Per-user ordered event-type sequence (string_agg ORDER BY ts,
    event_id): the training-example assembly pass over an event log."""
    from ..windows import event_sequences

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    return event_sequences(ev)


SQL_EVENT_SEQ = """
SELECT user_id,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS seq,
       count(*) AS n_events
FROM events GROUP BY user_id ORDER BY user_id
"""


def q_full_join(sf_dir: str):
    """Full-outer co-partitioned equi-join between two OVERLAPPING
    subsets (high-value orders x a quarter of customers): unmatched rows
    survive from BOTH sides with typed Arrow nulls."""
    from ..relops import hash_join

    ords = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(
        lambda t: t.filter(
            pc.greater(t["o_totalprice"], 150000.0)
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).map_batches(
        lambda t: t.filter(
            pc.equal(pc.bit_wise_and(pc.cast(t["c_custkey"], pa.int64()), 3), 0)
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return hash_join(ords, cust, "o_custkey", "c_custkey", how="full")


SQL_FULL_JOIN = """
WITH o AS (SELECT o_orderkey, o_custkey FROM orders
           WHERE o_totalprice > 150000.0),
c AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 4 = 0)
SELECT o.o_orderkey, o.o_custkey, c.c_custkey, c.c_acctbal
FROM o FULL JOIN c ON o.o_custkey = c.c_custkey
ORDER BY o_orderkey, c_custkey
"""


def q_lm_score(sf_dir: str):
    """Per-document mean unigram log-likelihood (statistical LM quality
    scoring); token counts co-partition with doc tokens — no vocabulary
    broadcast."""
    from ..textops import lm_score

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return lm_score(docs)


SQL_LM_SCORE = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(
             string_split_regex(lower(coalesce(text, '')), '\\s+'),
             t -> t <> '')) AS tok
  FROM documents),
cnt AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
tt AS (SELECT CAST(count(*) AS DOUBLE) v FROM toks)
SELECT t.doc_id, count(*) AS n_tokens,
       round(sum(ln(c.n / (SELECT v FROM tt))) / count(*), 6) + 0
         AS lm_score
FROM toks t JOIN cnt c USING (tok)
GROUP BY t.doc_id ORDER BY t.doc_id
"""


def q_grouped_rank(sf_dir: str):
    """Per-user event row numbers (window-function row_number): one
    key-hash shuffle + one lexsort per partition."""
    from ..relops import grouped_rank

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    out = grouped_rank(ev, "user_id", "ts", "event_id")
    return out.map_batches(
        lambda t: t.select(["event_id", "user_id", "rank"]),
        batch_format="pyarrow",
    )


SQL_GROUPED_RANK = """
SELECT event_id, user_id,
       CAST(row_number() OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rank
FROM events ORDER BY event_id
"""


def q_grouped_ntile(sf_dir: str):
    """Per-user event quartiles (window-function ntile(4)): one key-hash
    shuffle + one lexsort per partition; SQL's exact uneven-fill rule."""
    from ..relops import grouped_ntile

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    out = grouped_ntile(ev, "user_id", "ts", "event_id", n=4)
    return out.map_batches(
        lambda t: t.select(["event_id", "user_id", "tile"]),
        batch_format="pyarrow",
    )


SQL_GROUPED_NTILE = """
SELECT event_id, user_id,
       CAST(ntile(4) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS tile
FROM events ORDER BY event_id
"""


def q_approx_quantiles(sf_dir: str):
    """Rows-only (approximate by construction; rank-error-bound-tested
    in test_sketch.py): one-pass deterministic-sample quantile sketch
    over events.value."""
    from ..sketch import approx_quantiles

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    )
    return approx_quantiles(
        ev, "event_id", "value", qs=(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    )


def q_normalize_text(sf_dir: str):
    """Canonical NFKC/lower/whitespace normalization pass (the dedup
    pre-stage). Oracle note: DuckDB lacks NFKC, but NFKC is the identity
    on this ASCII corpus, so lower+collapse+trim is the exact oracle."""
    from ..textops import normalize_text

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return normalize_text(docs)


SQL_NORMALIZE_TEXT = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g'))
         AS norm_text,
       CAST(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g'))
            <> coalesce(text, '') AS BIGINT) AS changed
FROM documents ORDER BY doc_id
"""


def q_intersect(sf_dir: str):
    """INTERSECT (distinct whole-row): (custkey, status) pairs common to
    high-value and recent orders; one row-key shuffle, no broadcast."""
    from ..relops import table_set_op

    big = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderstatus", "o_totalprice"],
    ).map_batches(
        lambda t: t.filter(
            pc.greater(t["o_totalprice"], 100000.0)
        ).select(["o_custkey", "o_orderstatus"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    recent = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderstatus", "o_orderdate"],
    ).map_batches(
        lambda t: t.filter(
            pc.greater_equal(
                t["o_orderdate"],
                pa.scalar(__import__("datetime").datetime(1997, 1, 1)),
            )
        ).select(["o_custkey", "o_orderstatus"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return table_set_op(big, recent, op="intersect")


SQL_INTERSECT = """
SELECT o_custkey, o_orderstatus FROM orders WHERE o_totalprice > 100000.0
INTERSECT
SELECT o_custkey, o_orderstatus FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
ORDER BY o_custkey, o_orderstatus
"""


def q_except(sf_dir: str):
    """EXCEPT (distinct whole-row): high-value (custkey, status) pairs
    with no recent-order counterpart."""
    from ..relops import table_set_op

    big = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderstatus", "o_totalprice"],
    ).map_batches(
        lambda t: t.filter(
            pc.greater(t["o_totalprice"], 100000.0)
        ).select(["o_custkey", "o_orderstatus"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    recent = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderstatus", "o_orderdate"],
    ).map_batches(
        lambda t: t.filter(
            pc.greater_equal(
                t["o_orderdate"],
                pa.scalar(__import__("datetime").datetime(1997, 1, 1)),
            )
        ).select(["o_custkey", "o_orderstatus"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return table_set_op(big, recent, op="except")


SQL_EXCEPT = """
SELECT o_custkey, o_orderstatus FROM orders WHERE o_totalprice > 100000.0
EXCEPT
SELECT o_custkey, o_orderstatus FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
ORDER BY o_custkey, o_orderstatus
"""


def q_span_stats(sf_dir: str):
    """Rows-only (the interleaved spans table is synthesized — not an
    oracle view): per-doc span-payload statistics over the deterministic
    interleaved corpus, zero-copy over the nested Arrow column."""
    import ray.data as rd

    from ..media import span_stats
    from ..synth import generate_docs

    docs, _, _ = generate_docs(n_entities=400, seed=42, hub_entities=2,
                               hub_copies=16)
    return span_stats(rd.from_arrow(docs).repartition(8))


def q_span_roundtrip(sf_dir: str):
    """Rows-only (synthesized interleaved corpus): the interleave bridge
    end-to-end — explode the nested span payload to flat rows, rebuild
    the nested payload (one doc-hash shuffle, Arrow-buffer ListArray
    reconstruction), then per-doc span_stats over the REASSEMBLED docs.
    Identity with stats over the originals is pytest-verified."""
    import ray.data as rd

    from ..media import span_explode, span_reassemble, span_stats
    from ..synth import generate_docs

    docs, _, _ = generate_docs(n_entities=400, seed=42, hub_entities=2,
                               hub_copies=16)
    ds = rd.from_arrow(docs).repartition(8)
    return span_stats(span_reassemble(span_explode(ds)))


def q_blocking_metrics(sf_dir: str):
    """Rows-only (synthesized corpus + gold links): blocking quality
    diagnostics for the ER flagship — exact comparisons mass, HLL
    distinct candidate pairs, reduction ratio, exact pair completeness
    vs gold. Pytest checks comparisons/completeness against a
    brute-force pandas oracle and the HLL error bound."""
    import ray.data as rd

    from ..block import blocking_keys, blocking_metrics
    from ..synth import generate_docs

    docs, _, gold_links = generate_docs(n_entities=400, seed=42,
                                        hub_entities=2, hub_copies=16)
    keys = blocking_keys(rd.from_arrow(docs).repartition(8), carry_cols=())
    gp = pa.table({"a": gold_links["source_id"], "b": gold_links["target_id"]})
    out = blocking_metrics(keys, gp, n_docs=len(docs))
    for c in ("distinct_pairs", "reduction_ratio", "pair_completeness"):
        out[c] = round_away(out[c], 6)
    return out


def q_key_skew(sf_dir: str):
    """Exact heavy-key report over events.user_id (share rounded for the
    oracle): the pre-partitioning skew diagnostic."""
    from ..relops import key_skew

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    out = key_skew(ev, "user_id", top=20)
    out["share"] = round_away(out["share"], 6)
    return out


SQL_KEY_SKEW = """
WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
t AS (SELECT CAST(sum(n) AS DOUBLE) v FROM c)
SELECT user_id, n, round(n / (SELECT v FROM t), 6) + 0 AS share
FROM c ORDER BY n DESC, user_id LIMIT 20
"""


def q_order_count_hist(sf_dir: str):
    """TPC-H Q13 shape: distribution of per-customer order counts —
    (c_count, custdist). The engine computes it join-free: per-key
    counts via one hash-partitioned fold, the zero-order bucket by
    arithmetic (|customer| - #distinct custkeys), the customer table
    contributing only a metadata row count."""
    from ..relops import count_distribution

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    )
    n_cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).count()
    return count_distribution(orders, "o_custkey", universe_size=n_cust)


SQL_ORDER_COUNT_HIST = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def q_dedup_keep_best(sf_dir: str):
    """Quality-aware exact dedup: the duplicate universe keeps, per text
    group, the row with the LONGEST n_chars (ties by min id) — the
    "keep the best duplicate" trainer pass."""
    from ..dedup import dedup_keep_best

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    ).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "text": t["text"],
                # copies get a LOWER score so the original always wins
                "score": pc.cast(t["n_chars"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    dup = docs.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.add(t["doc_id"], 100000),
                "text": t["text"],
                "score": pc.subtract(t["score"], pa.scalar(1, pa.int64())),
            }
        ),
        batch_format="pyarrow",
    )
    kept = dedup_keep_best(
        docs.union(dup), content_cols=["text"], order_col="score",
        id_col="doc_id",
    )
    return kept.select_columns(["doc_id", "score"])


SQL_DEDUP_KEEP_BEST = """
WITH u AS (SELECT CAST(doc_id AS BIGINT) doc_id, text,
                  CAST(n_chars AS BIGINT) score FROM documents
           UNION ALL
           SELECT CAST(doc_id AS BIGINT) + 100000, text,
                  CAST(n_chars AS BIGINT) - 1 FROM documents),
r AS (SELECT doc_id, score,
             row_number() OVER (PARTITION BY text
                                ORDER BY score DESC, doc_id) rn
      FROM u)
SELECT doc_id, score FROM r WHERE rn = 1 ORDER BY doc_id
"""


def q_video_features(sf_dir: str):
    """Rows-only: REAL video path end-to-end — synthetic YUV4MPEG2 clips
    -> actor-pool pure-numpy Y4M decode -> per-clip features (frame
    count, luma stats, temporal energy). Deterministic; codec roundtrip
    and frame extraction are pytest-verified."""
    import ray.data as rd

    from ..media import synth_video_table, video_features

    clips = rd.from_arrow(synth_video_table(64)).repartition(8)
    return video_features(clips)


def q_video_dedup(sf_dir: str):
    """Rows-only: VIDEO near-dup composition — Y4M clips -> real frame
    extraction (BMP) -> per-frame histogram features averaged per clip
    -> embedding-cosine near-dup clustering. synth_video_table plants a
    near-dup (tiny luma shift) every 8th clip; the planted pairs must
    co-cluster (pytest-verified)."""
    from ..dedup import dedup_embedding_cosine
    from ..media import (
        decode_images,
        image_features,
        sample_video_frames,
        synth_video_table,
    )

    clips = ray.data.from_arrow(synth_video_table(64)).repartition(4)
    frames = sample_video_frames(clips, n_frames=4)
    feats = image_features(
        decode_images(frames, height=24, width=32)
    )

    def clip_mean(t: pa.Table) -> pa.Table:
        # average the frame feature vectors per clip (frames of a clip
        # stay in one batch row-group by construction: n_frames per id)
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        col = t["features"].combine_chunks()
        d = len(col[0])
        F = col.values.to_numpy(zero_copy_only=False).reshape(len(ids), d)
        order = np.argsort(ids, kind="stable")
        ids, F = ids[order], F[order]
        starts = np.flatnonzero(
            np.concatenate(([True], ids[1:] != ids[:-1]))
        )
        cnt = np.diff(np.append(starts, len(ids)))
        M = np.add.reduceat(F, starts, axis=0) / cnt[:, None]
        from ..arrowutil import matrix_to_fsl

        return pa.table(
            {
                "row_id": pa.array(ids[starts], pa.int64()),
                "embedding": matrix_to_fsl(M, pa.float64()),
            }
        )

    # one row per clip after the per-batch mean: batch==clip-aligned
    # because sample_video_frames emits a clip's frames contiguously
    rows = feats.map_batches(clip_mean, batch_format="pyarrow", batch_size=256)
    # Materialize the per-clip feature rows (d floats per CLIP — tiny vs
    # the video payloads) before the dedup stage: dedup executes its
    # input twice (shard build + query side) and chains hash-join /
    # groupby aggregator actors; without the pipeline break the three
    # decode actor pools (min 1 CPU each) starve those aggregators on a
    # small cluster (observed 4-cpu deadlock).
    rows = rows.materialize()
    comp = dedup_embedding_cosine(rows, threshold=0.97)
    return comp.map_batches(
        lambda t: pa.table(
            {"clip_id": t["node"], "cluster_id": t["component"]}
        ),
        batch_format="pyarrow",
    )


def q_market_share(sf_dir: str):
    """TPC-H Q8 shape: per order-year share of ASIA-customer revenue
    supplied by NATION_7 suppliers. 7-table plan: supplier->nation flag
    applied as a BROADCAST lookup on the lineitem scan (no shuffle for
    the dimension), per-orderkey combiner fold BEFORE the orders shuffle
    join, customer nation via broadcast join, region+nation chains
    resolved driver-side, per-year conditional sums folded from
    partials. The only all-to-all exchange is the orders join."""
    from ..relops import broadcast_join

    nation = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    region = ray.data.read_parquet(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    asia_keys = set(
        nation.merge(
            region[region["r_name"] == "ASIA"],
            left_on="n_regionkey",
            right_on="r_regionkey",
        )["n_nationkey"]
    )
    target_nk = int(
        nation.loc[nation["n_name"] == "NATION_7", "n_nationkey"].iloc[0]
    )
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    tagged = broadcast_join(li, supp, "l_suppkey", "s_suppkey")

    def rev(t: pa.Table) -> pa.Table:
        # FIXED-POINT revenue: price and discount carry exactly 2
        # decimals, so price*100 and discount*100 are integers (up to
        # float representation noise, never near .5) — revenue in
        # 1e-4 units is an exact int64 and every partial sum is
        # partition-ORDER-INDEPENDENT. Float sums of ~1e8-scale values
        # are not (a same-values different-order sum flipped a 2-decimal
        # rounding boundary at sf0.01); int sums make the aggregate
        # byte-exact under any partitioning. Overflow bound: total must
        # stay < 2^53 for the final /1e4 division (1e13 at sf0.1).
        p100 = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        d100 = np.round(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        r = p100 * (100 - d100)
        flag = (
            t["s_nationkey"].to_numpy(zero_copy_only=False) == target_nk
        )
        return pa.table(
            {
                "k": pc.cast(t["l_orderkey"], pa.int64()),
                "rev": pa.array(r, pa.int64()),
                "rev_t": pa.array(np.where(flag, r, 0), pa.int64()),
            }
        )

    P = 32

    def add_part(t: pa.Table) -> pa.Table:
        part = pc.cast(
            pc.bit_wise_and(t["k"], pa.scalar(P - 1, pa.int64())), pa.int32()
        )
        return t.append_column("__part", part)

    def sum_partition(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy(zero_copy_only=False)
        v = g["rev"].to_numpy(zero_copy_only=False)
        vt = g["rev_t"].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k, v, vt = k[order], v[order], vt[order]
        starts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        return pa.table(
            {
                "k": pa.array(k[starts], pa.int64()),
                "rev": pa.array(np.add.reduceat(v, starts), pa.int64()),
                "rev_t": pa.array(np.add.reduceat(vt, starts), pa.int64()),
            }
        )

    per_order = (
        tagged.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(sum_partition, batch_format="pyarrow")
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(
        lambda t: pa.table(
            {
                "k": pc.cast(t["o_orderkey"], pa.int64()),
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "yr": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    joined = broadcast_join(
        per_order.join(orders, join_type="inner", num_partitions=8,
                       on=("k",)),
        cust,
        "o_custkey",
        "c_custkey",
    )

    asia_arr = np.fromiter(asia_keys, np.int64)

    def year_partials(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
        keep = np.isin(nk, asia_arr)
        yr = t["yr"].to_numpy(zero_copy_only=False)[keep]
        v = t["rev"].to_numpy(zero_copy_only=False)[keep]
        vt = t["rev_t"].to_numpy(zero_copy_only=False)[keep]
        u, inv = np.unique(yr, return_inverse=True)
        # int64 scatter-add (float-weighted bincount is exact only below
        # 2^53 per per-batch per-key sum — a silent cliff for cents sums)
        return pa.table(
            {
                "yr": pa.array(u, pa.int64()),
                "rev": pa.array(int_bincount(inv, v, len(u)), pa.int64()),
                "rev_t": pa.array(
                    int_bincount(inv, vt, len(u)), pa.int64()
                ),
            }
        )

    partials = joined.map_batches(
        year_partials, batch_format="pyarrow"
    ).to_pandas()  # partitions x years rows — tiny
    out = (
        partials.groupby("yr", sort=True)[["rev", "rev_t"]].sum().reset_index()
    )
    rev_i = out["rev"].to_numpy().astype(np.int64)
    revt_i = out["rev_t"].to_numpy().astype(np.int64)
    # ONE IEEE double division of exact integer operands per output
    # value — bit-identical to DuckDB's HUGEINT-sum / double division
    share = revt_i.astype(np.float64) / rev_i.astype(np.float64)
    return pd.DataFrame(
        {
            "yr": out["yr"].astype(np.int64),
            "share": round_away(share, 6),
            "revenue": round_away(rev_i / 1e4, 2),
        }
    )


SQL_MARKET_SHARE = """
-- fixed-point revenue (1e-4 units): price/discount carry exactly two
-- decimals, so the sums are exact integers on both sides and the
-- result is independent of partition/addition order
SELECT year(o.o_orderdate) AS yr,
       round(sum(CASE WHEN ns.n_name = 'NATION_7'
                      THEN CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                           * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))
                      ELSE 0 END)
             / sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                   * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))),
             6) + 0 AS share,
       round(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)))
             / 10000.0, 2) + 0 AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
JOIN region r ON nc.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY yr ORDER BY yr
"""


def q_edit_pairs(sf_dir: str):
    """Blocked exact edit-distance pairs: every document pair sharing a
    lowercased 16-char text prefix, with its exact Levenshtein distance
    (batch-vectorized DP — the min-plus prefix-scan kernel). One
    prefix-hash shuffle; pair universe bounded by the block sizes."""
    from ..dedup import edit_pairs

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return edit_pairs(docs, "doc_id", "text", prefix_len=16)


SQL_EDIT_PAIRS = """
WITH d AS (
  SELECT doc_id, coalesce(text, '') AS t,
         lower(substr(coalesce(text, ''), 1, 16)) AS pfx
  FROM documents)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       levenshtein(a.t, b.t) AS dist
FROM d a JOIN d b ON a.pfx = b.pfx AND a.doc_id < b.doc_id
ORDER BY a_id, b_id
"""


def q_twap(sf_dir: str):
    """Per-user time-weighted average event value (interval to next
    event as weight) — one key-hash shuffle, lexsort + bincounts."""
    from ..windows import time_weighted_avg

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )
    return time_weighted_avg(ev, "user_id", "ts", "event_id", "value")


SQL_TWAP = """
WITH w AS (
  SELECT user_id, value, epoch_us(ts) AS es,
         lead(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events)
SELECT user_id,
       round(sum(value * (nxt - es)) / sum(nxt - es), 6) + 0 AS twap
FROM w WHERE nxt IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""


def q_stratified_quota(sf_dir: str):
    """Exactly 20 orders per order priority, deterministic Knuth
    priorities (HUGEINT-lockstep oracle) — combiner partial top-n per
    stratum, one tiny shuffle."""
    from ..sample import stratified_quota

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "o_orderpriority": t["o_orderpriority"],
            }
        ),
        batch_format="pyarrow",
    )
    return stratified_quota(
        orders, "o_orderpriority", "o_orderkey", n_per_stratum=20, seed=7
    )


SQL_STRATIFIED_QUOTA = """
WITH p AS (
  SELECT CAST(o_orderkey AS BIGINT) AS k, o_orderpriority AS s,
         ((CAST(o_orderkey AS HUGEINT) + 7) * 11400714819323198485)
             % 18446744073709551616 AS pri
  FROM orders),
v AS (SELECT k, s,
             CASE WHEN pri < 9223372036854775808 THEN pri
                  ELSE pri - 18446744073709551616 END AS iv
      FROM p),
r AS (SELECT k, s,
             row_number() OVER (PARTITION BY s ORDER BY iv DESC, k) AS rk
      FROM v)
SELECT k AS o_orderkey, s AS o_orderpriority
FROM r WHERE rk <= 20 ORDER BY s, k
"""


def q_grouped_mode(sf_dir: str):
    """Per-user dominant event type (ties: count desc, value asc) —
    two combiner-sized exchanges over the (key x value) space."""
    from ..relops import grouped_mode

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    return grouped_mode(ev, "user_id", "event_type")


SQL_GROUPED_MODE = """
WITH c AS (SELECT user_id, event_type, count(*) AS n
           FROM events GROUP BY user_id, event_type),
r AS (SELECT user_id, event_type, n,
             row_number() OVER (
                 PARTITION BY user_id ORDER BY n DESC, event_type) AS rk
      FROM c)
SELECT user_id, event_type AS mode_value, n
FROM r WHERE rk = 1 ORDER BY user_id
"""


def q_vocab_entropy(sf_dir: str):
    """Per-language token-distribution Shannon entropy over exact
    (lang, token) counts — one token-hash shuffle of combiner partials,
    then per-partition (T, sum n ln n) scalars; the vocabulary never
    reaches the driver."""
    from ..textops import vocab_entropy

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )
    return vocab_entropy(docs, "lang")


SQL_VOCAB_ENTROPY = """
WITH toks AS (
  SELECT lang, u.t AS tok
  FROM (SELECT lang,
               list_filter(string_split_regex(lower(coalesce(text, '')),
                                              '\\s+'), t -> t <> '') AS ts
        FROM documents), unnest(ts) AS u(t)),
c AS (SELECT lang, tok, count(*) AS n FROM toks GROUP BY lang, tok),
t AS (SELECT lang, sum(n) AS T, sum(n * ln(n)) AS S FROM c GROUP BY lang)
SELECT lang, CAST(T AS BIGINT) AS n_tokens,
       round(ln(CAST(T AS DOUBLE)) - S / T, 6) + 0 AS entropy
FROM t ORDER BY lang
"""


def q_ks_drift(sf_dir: str):
    """Exact two-sample KS statistic between click and view value
    distributions — distribution drift between corpus slices. Combiner
    partials keyed by distinct value; no raw-row shuffle."""
    from ..moments import ks_statistic

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["value", "event_type"]
    )
    return ks_statistic(ev, "value", "event_type", "click", "view")


SQL_KS_DRIFT = """
WITH s AS (SELECT value AS v, event_type FROM events
           WHERE event_type IN ('click', 'view')),
c AS (SELECT v,
             count(*) FILTER (WHERE event_type = 'click') AS n1,
             count(*) FILTER (WHERE event_type = 'view') AS n2
      FROM s GROUP BY v),
t AS (SELECT sum(n1) AS t1, sum(n2) AS t2 FROM c),
g AS (SELECT sum(n1) OVER (ORDER BY v) / (SELECT CAST(t1 AS DOUBLE) FROM t)
           - sum(n2) OVER (ORDER BY v) / (SELECT CAST(t2 AS DOUBLE) FROM t)
           AS gap
      FROM c)
SELECT round(max(abs(gap)), 6) + 0 AS ks,
       (SELECT t1 FROM t) AS n_a,
       (SELECT t2 FROM t) AS n_b
FROM g
"""


def q_skyline(sf_dir: str):
    """2-D Pareto frontier of orders (maximize total price AND
    recency): shuffle-free — skyline is a morphism under union, so
    each batch ships only its local frontier and the driver folds
    frontier partials."""
    from ..relops import skyline

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderdate"],
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "price": t["o_totalprice"],
                "ts_us": pc.cast(
                    pc.cast(t["o_orderdate"], pa.timestamp("us")),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    out = skyline(orders, "price", "ts_us", carry_cols=("o_orderkey",))
    return (
        out[["o_orderkey", "price", "ts_us"]]
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )


SQL_SKYLINE = """
WITH t AS (
  SELECT o_orderkey, o_totalprice AS price, epoch_us(o_orderdate) AS ts_us
  FROM orders)
SELECT o_orderkey, price, ts_us
FROM t a
WHERE NOT EXISTS (
  SELECT 1 FROM t b
  WHERE b.price >= a.price AND b.ts_us >= a.ts_us
    AND (b.price > a.price OR b.ts_us > a.ts_us))
ORDER BY o_orderkey
"""


def q_dim_stats(sf_dir: str):
    """Per-dimension embedding mean/std: zero-copy (n, dim) matrix per
    batch, three dim-length partial vectors per block, no shuffle."""
    from ..moments import dim_stats

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )
    return dim_stats(emb, "embedding")


SQL_DIM_STATS = """
SELECT d,
       round(sum(v) / count(*), 6) + 0 AS mean_v,
       round(sqrt(greatest(sum(v * v) / count(*)
                           - (sum(v) / count(*)) ^ 2, 0)), 6) + 0 AS std_v
FROM (SELECT CAST(unnest(embedding) AS DOUBLE) AS v,
             unnest(range(1, len(embedding) + 1)) AS d
      FROM embeddings)
GROUP BY d ORDER BY d
"""


def q_pagerank(sf_dir: str):
    """5-iteration PageRank over the symmetrized customer-supplier
    bipartite graph (distinct trade pairs from orders x lineitem).
    Iterative SHUFFLE-JOIN propagation: edges+degrees pinned once, each
    iteration = one hash join (rank onto edges) + one coarse-partition
    fold + one left join back onto nodes. Node ids are disambiguated
    as custkey*2 / suppkey*2+1."""
    from ..cluster import pagerank
    from ..dedup import dedup_pair_rows

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "k": pc.cast(t["o_orderkey"], pa.int64()),
                "cust": pc.cast(t["o_custkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "k": pc.cast(t["l_orderkey"], pa.int64()),
                "supp": pc.cast(t["l_suppkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    pairs = orders.join(
        li, join_type="inner", num_partitions=8, on=("k",)
    ).map_batches(
        lambda t: pa.table(
            {
                "a": pc.add(
                    pc.multiply(t["cust"], pa.scalar(2, pa.int64())),
                    pa.scalar(0, pa.int64()),
                ),
                "b": pc.add(
                    pc.multiply(t["supp"], pa.scalar(2, pa.int64())),
                    pa.scalar(1, pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    distinct = dedup_pair_rows(pairs)
    edges = distinct.map_batches(
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
    )
    out = pagerank(edges, damping=0.85, iters=5)
    return out.map_batches(
        lambda t: pa.table(
            {
                "node": t["node"],
                "pr": pa.array(
                    round_away(
                        t["r"].to_numpy(zero_copy_only=False), 6
                    ),
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


SQL_PAGERANK = """
WITH e0 AS (
  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
nodes AS (SELECT DISTINCT src AS v FROM e),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS d FROM e GROUP BY src),
r0 AS (SELECT v, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
r1 AS (SELECT n.v, (1 - 0.85) / (SELECT n FROM nn)
              + 0.85 * coalesce(sum(p.r / deg.d), 0) AS r
       FROM nodes n LEFT JOIN e ON e.dst = n.v
       LEFT JOIN r0 p ON p.v = e.src LEFT JOIN deg ON deg.src = e.src
       GROUP BY n.v),
r2 AS (SELECT n.v, (1 - 0.85) / (SELECT n FROM nn)
              + 0.85 * coalesce(sum(p.r / deg.d), 0) AS r
       FROM nodes n LEFT JOIN e ON e.dst = n.v
       LEFT JOIN r1 p ON p.v = e.src LEFT JOIN deg ON deg.src = e.src
       GROUP BY n.v),
r3 AS (SELECT n.v, (1 - 0.85) / (SELECT n FROM nn)
              + 0.85 * coalesce(sum(p.r / deg.d), 0) AS r
       FROM nodes n LEFT JOIN e ON e.dst = n.v
       LEFT JOIN r2 p ON p.v = e.src LEFT JOIN deg ON deg.src = e.src
       GROUP BY n.v),
r4 AS (SELECT n.v, (1 - 0.85) / (SELECT n FROM nn)
              + 0.85 * coalesce(sum(p.r / deg.d), 0) AS r
       FROM nodes n LEFT JOIN e ON e.dst = n.v
       LEFT JOIN r3 p ON p.v = e.src LEFT JOIN deg ON deg.src = e.src
       GROUP BY n.v),
r5 AS (SELECT n.v, (1 - 0.85) / (SELECT n FROM nn)
              + 0.85 * coalesce(sum(p.r / deg.d), 0) AS r
       FROM nodes n LEFT JOIN e ON e.dst = n.v
       LEFT JOIN r4 p ON p.v = e.src LEFT JOIN deg ON deg.src = e.src
       GROUP BY n.v)
SELECT v AS node, round(r, 6) + 0 AS pr FROM r5 ORDER BY node
"""


def q_length_deciles(sf_dir: str):
    """Equi-depth document-length bucketing: exact global NTILE(10)
    over (n_chars, doc_id) via the sampled-boundary global_rank (one
    range shuffle), then per-batch (decile, count, min, max) partials
    folded driver-side — the corpus profiling pass before length-based
    curriculum or filtering."""
    from ..relops import global_ntile

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    tiled = global_ntile(docs, "n_chars", "doc_id", k=10)

    def partial(t: pa.Table) -> pa.Table:
        tl = t["tile"].to_numpy(zero_copy_only=False)
        nc = t["n_chars"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(tl, return_inverse=True)
        mn = np.full(len(u), np.iinfo(np.int64).max)
        mx = np.full(len(u), np.iinfo(np.int64).min)
        np.minimum.at(mn, inv, nc)
        np.maximum.at(mx, inv, nc)
        return pa.table(
            {
                "decile": pa.array(u, pa.int64()),
                "n_docs": pa.array(np.bincount(inv), pa.int64()),
                "mn": pa.array(mn, pa.int64()),
                "mx": pa.array(mx, pa.int64()),
            }
        )

    partials = tiled.map_batches(
        partial, batch_format="pyarrow"
    ).to_pandas()  # blocks x 10 rows — tiny
    out = (
        partials.groupby("decile", sort=True)
        .agg(n_docs=("n_docs", "sum"), min_chars=("mn", "min"),
             max_chars=("mx", "max"))
        .reset_index()
    )
    return out.astype(np.int64)


SQL_LENGTH_DECILES = """
WITH r AS (
  SELECT doc_id, n_chars,
         ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile
  FROM documents)
SELECT decile, count(*) AS n_docs,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM r GROUP BY decile ORDER BY decile
"""


def q_event_transitions(sf_dir: str):
    """Per-user Markov transition counts over the event stream (LAG
    adjacency): one user-hash shuffle, lexsort + shifted compare per
    partition, driver folds alphabet^2-sized partials."""
    from ..windows import event_transitions

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    return event_transitions(ev, "user_id", "ts", "event_id", "event_type")


SQL_EVENT_TRANSITIONS = """
WITH w AS (
  SELECT event_type,
         lag(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events)
SELECT prev AS prev_type, event_type, count(*) AS n
FROM w WHERE prev IS NOT NULL
GROUP BY prev, event_type ORDER BY prev_type, event_type
"""


def q_followup_counts(sf_dir: str):
    """Attribution pass: purchases within 1 hour strictly after each
    click, per user. One key-hash shuffle; every anchor answered by two
    global searchsorted calls over segment-offset timestamps plus one
    prefix-sum lookup (no per-key loop)."""
    from ..windows import followup_counts

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    return followup_counts(
        ev, "user_id", "ts", "event_id", "event_type",
        type_a="click", type_b="purchase", horizon_us=3_600_000_000,
    )


SQL_FOLLOWUP_COUNTS = """
SELECT a.event_id, count(b.event_id) AS n_follow
FROM events a
LEFT JOIN events b
  ON b.user_id = a.user_id
  AND b.event_type = 'purchase'
  AND b.ts > a.ts
  AND b.ts <= a.ts + INTERVAL 1 HOUR
WHERE a.event_type = 'click'
GROUP BY a.event_id ORDER BY a.event_id
"""


def q_cohort_retention(sf_dir: str):
    """Weekly cohort-retention matrix: distinct users active k weeks
    after their first-event (Monday-truncated) week. One user-hash
    shuffle; per-partition factorize/scatter-min + lexsort dedup;
    driver folds cohort x horizon cell partials."""
    from ..windows import cohort_retention

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    return cohort_retention(ev, "user_id", "ts")


SQL_COHORT_RETENTION = """
WITH f AS (
  SELECT user_id, min(date_trunc('week', ts)) AS cw
  FROM events GROUP BY user_id),
a AS (
  SELECT DISTINCT e.user_id, date_trunc('week', e.ts) AS aw, f.cw
  FROM events e JOIN f USING (user_id))
SELECT (epoch(cw) / 86400)::BIGINT AS cohort_day,
       ((epoch(aw) - epoch(cw)) / 604800)::BIGINT AS week_offset,
       count(*) AS users
FROM a GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_props_agg(sf_dir: str):
    """JSON-metadata extraction aggregate: integer field `k` pulled out
    of the props JSON string with one compiled-regex pandas pass,
    bucketed by k % 10 — shuffle-free combiner partials."""
    from ..textops import json_field_agg

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["props", "value"]
    )
    return json_field_agg(ev, "props", "value", field="k", modulus=10)


SQL_PROPS_AGG = """
WITH x AS (
  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, value
  FROM events)
SELECT ((k % 10) + 10) % 10 AS k_mod,
       count(*) AS n,
       round(sum(value), 2) + 0 AS sum_value
FROM x WHERE k IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


def q_rolling_avg(sf_dir: str):
    """Per-user rolling mean over the last 4 events (bounded ROWS
    frame) — one key-hash shuffle, one lexsort + exact fixed-point
    cumsum-difference per partition."""
    from ..windows import rolling_window_mean

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )
    return rolling_window_mean(
        ev, "user_id", "ts", "event_id", "value", frame_rows=4
    )


SQL_ROLLING_AVG = """
SELECT event_id, user_id,
       round(avg(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) + 0
           AS rolling_avg
FROM events ORDER BY user_id, event_id
"""


def q_source_overlap(sf_dir: str):
    """Cross-source bag-of-words contamination census: distinct shared
    token-sets per source pair — commutative 128-bit set hashes as
    combiner rows, one key shuffle, vectorized per-partition self-merge."""
    from ..dedup import source_overlap

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "source"]
    )
    return source_overlap(docs, "text", "source")


SQL_SOURCE_OVERLAP = """
WITH d AS (
  SELECT DISTINCT array_to_string(
             list_sort(list_distinct(string_split(text, ' '))), ' ') AS k,
         source
  FROM documents)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM d a JOIN d b ON a.k = b.k AND a.source < b.source
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_grouped_corr(sf_dir: str):
    """Per-returnflag Pearson correlation of quantity vs extendedprice
    — six per-key moment partials per batch, one tiny fold, no row
    shuffle."""
    from ..moments import grouped_corr

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    return grouped_corr(li, "l_returnflag", "l_quantity", "l_extendedprice")


SQL_GROUPED_CORR = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) + 0 AS corr,
       count(*) AS n
FROM lineitem GROUP BY 1 ORDER BY 1
"""


def q_chi2(sf_dir: str):
    """Chi-squared independence of lang x source (corpus-bias
    diagnostic) — per-batch contingency partials, O(cells) fold,
    driver finalize via the observed-cells identity."""
    from ..moments import contingency_chi2

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "source"]
    )
    return contingency_chi2(docs, "lang", "source")


SQL_CHI2 = """
WITH c AS (
  SELECT lang, source, CAST(count(*) AS DOUBLE) AS o
  FROM documents GROUP BY 1, 2),
 tot AS (SELECT sum(o) AS n FROM c),
 r AS (SELECT lang, sum(o) AS rt FROM c GROUP BY 1),
 s AS (SELECT source, sum(o) AS ct FROM c GROUP BY 1)
SELECT round((SELECT n FROM tot)
             * sum(c.o * c.o / (r.rt * s.ct))
             - (SELECT n FROM tot), 6) + 0 AS chi2,
       CAST(((SELECT count(DISTINCT lang) FROM c) - 1)
            * ((SELECT count(DISTINCT source) FROM c) - 1) AS BIGINT)
           AS dof,
       CAST((SELECT n FROM tot) AS BIGINT) AS n
FROM c JOIN r USING (lang) JOIN s USING (source)
"""


def q_quantiles_cont(sf_dir: str):
    """Interpolated (percentile_cont) price quantiles — the same exact
    histogram-refinement selection as `quantiles`, tracking two straddle
    ranks per q; no sort, no shuffle."""
    from ..arrowutil import round_away
    from ..quantile import exact_quantiles

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    )
    t = exact_quantiles(
        li, "l_extendedprice", qs=(0.1, 0.25, 0.5, 0.75, 0.9, 0.99),
        interp="cont",
    )
    import pandas as pd

    df = t.to_pandas()
    df["value"] = round_away(df["value"].to_numpy(), 6)
    return df


SQL_QUANTILES_CONT = """
SELECT q, round(value, 6) + 0 AS value FROM (
  SELECT unnest([0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) AS q,
         unnest(quantile_cont(l_extendedprice,
                [0.1, 0.25, 0.5, 0.75, 0.9, 0.99])) AS value
  FROM lineitem)
ORDER BY q
"""


def q_grouped_regression(sf_dir: str):
    """Per-returnflag OLS slope/intercept/r2 of extendedprice on
    quantity — six moment partials per batch, one tiny fold, no row
    shuffle."""
    from ..moments import grouped_regression

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    return grouped_regression(
        li, "l_returnflag", "l_quantity", "l_extendedprice"
    )


SQL_GROUPED_REGRESSION = """
SELECT l_returnflag,
       round(regr_slope(l_extendedprice, l_quantity), 6) + 0 AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 6) + 0
           AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) + 0 AS r2,
       count(*) AS n
FROM lineitem GROUP BY 1 ORDER BY 1
"""


def q_vocab_jaccard(sf_dir: str):
    """Pairwise source-vocabulary Jaccard similarity — distinct
    (source, token) combiner rows, token-hash partition, vectorized
    self-merge intersections, O(sources^2) fold."""
    from ..textops import vocab_jaccard

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "source"]
    )
    return vocab_jaccard(docs, "text", "source")


SQL_VOCAB_JACCARD = """
WITH v AS (
  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS tok
  FROM documents),
 s AS (SELECT source, count(*) AS n FROM v GROUP BY 1),
 i AS (SELECT a.source AS sa, b.source AS sb,
              CAST(count(*) AS BIGINT) AS ni
       FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
       GROUP BY 1, 2)
SELECT i.sa AS source_a, i.sb AS source_b, i.ni AS n_inter,
       round(CAST(i.ni AS DOUBLE) / (x.n + y.n - i.ni), 6) + 0 AS jaccard
FROM i JOIN s x ON i.sa = x.source JOIN s y ON i.sb = y.source
ORDER BY 1, 2
"""


def q_above_avg_users(sf_dir: str):
    """Users whose total spend beats the mean per-user total — the
    HAVING + scalar-subquery shape; exact int64 fixed-point threshold,
    per-key combiner partials, totals never leave the cluster."""
    from ..relops import having_above_global_avg

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    )
    return having_above_global_avg(ev, "user_id", "value")


SQL_ABOVE_AVG_USERS = """
WITH u AS (
  SELECT user_id, sum(CAST(value AS DECIMAL(18,2))) AS tot
  FROM events GROUP BY 1)
SELECT user_id, CAST(tot AS DOUBLE) AS total
FROM u
WHERE tot * (SELECT count(*) FROM u) > (SELECT sum(tot) FROM u)
ORDER BY user_id
"""


def q_bm25(sf_dir: str):
    """BM25 top-20 for a 3-term query — two streaming text passes
    (stats partials, then broadcast-idf scoring + per-batch partial
    top-k), no shuffle."""
    from ..textops import bm25_topk

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return bm25_topk(docs, ("fast", "join", "merge"), k=20)


SQL_BM25 = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
 dl AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY 1),
 stats AS (SELECT (SELECT count(*) FROM documents) AS n,
                  CAST(sum(len) AS DOUBLE)
                      / (SELECT count(*) FROM documents) AS avgdl
           FROM dl),
 q AS (SELECT unnest(['fast', 'join', 'merge']) AS term),
 df AS (SELECT tok AS term, count(DISTINCT doc_id) AS df
        FROM toks JOIN q ON tok = q.term GROUP BY 1),
 tf AS (SELECT doc_id, tok AS term, count(*) AS tf
        FROM toks JOIN q ON tok = q.term GROUP BY 1, 2),
 sc AS (SELECT tf.doc_id,
               sum(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1)
                   * tf.tf * (1.2 + 1)
                   / (tf.tf + 1.2 * (1 - 0.75
                                     + 0.75 * dl.len / stats.avgdl)))
                   AS s
        FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
        GROUP BY 1)
SELECT doc_id, round(s, 6) + 0 AS score
FROM sc ORDER BY round(s, 6) DESC, doc_id LIMIT 20
"""


def q_wow_change(sf_dir: str):
    """Week-over-week per-user revenue change — per-batch (key, week,
    cents) combiner partials, one key-hash shuffle, lexsort + reduceat
    + shifted ratio per partition; exact fixed-point sums."""
    from ..windows import weekly_change

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    return weekly_change(ev, "user_id", "ts", "value")


SQL_WOW_CHANGE = """
WITH w AS (
  SELECT user_id, date_trunc('week', ts) AS wk,
         sum(CAST(value AS DECIMAL(18,2))) AS rev
  FROM events GROUP BY 1, 2),
 l AS (SELECT user_id, wk, rev,
              lag(rev) OVER (PARTITION BY user_id ORDER BY wk) AS prev
       FROM w)
SELECT user_id, CAST(epoch(wk) AS BIGINT) AS wk_s,
       CAST(rev AS DOUBLE) AS total,
       round((CAST(rev AS DOUBLE) - CAST(prev AS DOUBLE))
             / CAST(prev AS DOUBLE), 6) + 0 AS pct_change
FROM l WHERE prev IS NOT NULL ORDER BY user_id, wk_s
"""


def q_nearest_purchase(sf_dir: str):
    """Per-event exact time gap to the user's nearest purchase (either
    direction) — the nearest-timestamp join: one key-hash shuffle, one
    segment-offset searchsorted per partition (no pair explosion)."""
    from ..windows import nearest_event_gap

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    return nearest_event_gap(ev, "purchase")


SQL_NEAREST_PURCHASE = """
WITH p AS (SELECT user_id, epoch_us(ts) AS pts
           FROM events WHERE event_type = 'purchase'),
 e AS (SELECT event_id, user_id, epoch_us(ts) AS ets
       FROM events WHERE event_type <> 'purchase')
SELECT e.event_id, min(abs(e.ets - p.pts)) AS gap_us
FROM e JOIN p USING (user_id) GROUP BY 1 ORDER BY 1
"""


def q_grouped_hll(sf_dir: str):
    """Per-event-type approximate distinct users (HLL sketch-groupby;
    only fixed-size register rows shuffle). Rows-only by design: the
    register-level estimate is hash-function-defined, checked instead
    by an error-bound test vs the exact distinct count."""
    from ..sketch import grouped_approx_distinct

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    return grouped_approx_distinct(ev, "event_type", "user_id")


def q_streaks(sf_dir: str):
    """Longest consecutive-day activity streak per user (gaps-and-islands)
    — distinct (key, day) combiner partials, ONE key-hash shuffle, one
    vectorized island pass per partition; no window-function shuffle."""
    from ..windows import longest_streak

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    return longest_streak(ev, "user_id", "ts")


SQL_STREAKS = """
WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
 r AS (SELECT user_id, day,
              datediff('day', DATE '1970-01-01', day)
                - row_number() OVER (PARTITION BY user_id ORDER BY day)
                AS isl
       FROM d),
 c AS (SELECT user_id, isl, count(*) AS len FROM r GROUP BY 1, 2)
SELECT user_id, max(len) AS max_streak FROM c GROUP BY 1 ORDER BY 1
"""


def q_basket_pairs(sf_dir: str):
    """Top-100 co-occurring part pairs within orders (market-basket) —
    pair fan-out bounded by one order's distinct parts, per-partition
    vectorized pair generation + count combiner, exact second-shuffle
    fold, partial top-N instead of a global sort."""
    from ..relops import basket_pairs

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    return basket_pairs(li, "l_orderkey", "l_partkey", topn=100)


SQL_BASKET_PAIRS = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
 p AS (SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
              count(*) AS cnt
       FROM d a JOIN d b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2)
SELECT item_a, item_b, cnt FROM p
ORDER BY cnt DESC, item_a, item_b LIMIT 100
"""


def q_weighted_median(sf_dir: str):
    """Per-returnflag quantity-weighted median price — distinct
    (key, value, sum-weight) combiner partials with exact int64 weights,
    one key-hash shuffle, vectorized cumulative pick per partition."""
    from ..quantile import weighted_median

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    )
    return weighted_median(
        li, "l_returnflag", "l_extendedprice", "l_quantity"
    )


SQL_WEIGHTED_MEDIAN = """
WITH s AS (SELECT l_returnflag, l_extendedprice AS v,
                  CAST(l_quantity * 100 AS BIGINT) AS w
           FROM lineitem),
 c AS (SELECT l_returnflag, v,
              sum(w) OVER (PARTITION BY l_returnflag ORDER BY v) AS cw,
              sum(w) OVER (PARTITION BY l_returnflag) AS tw
       FROM s)
SELECT l_returnflag, min(v) AS wmedian
FROM c WHERE 2 * cw >= tw GROUP BY 1 ORDER BY 1
"""


def q_mutual_info(sf_dir: str):
    """Mutual information (nats) between document lang and source —
    observed-cell contingency combiner, O(cells) fold, driver finalize."""
    from ..moments import mutual_information

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "source"]
    )
    return mutual_information(docs, "lang", "source")


SQL_MUTUAL_INFO = """
WITH j AS (SELECT lang, source, CAST(count(*) AS DOUBLE) AS c
           FROM documents GROUP BY 1, 2),
 t AS (SELECT sum(c) AS n FROM j),
 a AS (SELECT lang, sum(c) AS ca FROM j GROUP BY 1),
 b AS (SELECT source, sum(c) AS cb FROM j GROUP BY 1)
SELECT round(sum((j.c / t.n) * ln(j.c * t.n / (a.ca * b.cb))), 6) + 0
         AS mi,
       count(*) AS cells, CAST(sum(j.c) AS BIGINT) AS n
FROM j, t, a, b WHERE j.lang = a.lang AND j.source = b.source
"""


def q_mutual_best(sf_dir: str):
    """Reciprocal-best-match 1:1 alignment between the two embedding
    sides — mutual nearest neighbors as high-precision seed links. Two
    routed k=1 searches (one per direction) + ONE hash-partitioned join
    on target id; no broadcast, no driver state."""
    from ..evaluate import mutual_best

    source, target = _sides(sf_dir)

    def k1(src, tgt):
        kz = Kiez(
            n_candidates=1,
            algorithm="exact",
            algorithm_kwargs={"metric": "euclidean"},
            rows_per_shard=ROUTED["rows_per_shard"],
            route_groups=ROUTED["route_groups"],
        )
        kz.fit(src, tgt)
        return kz.kneighbors_dataset(1)

    out = mutual_best(k1(source, target), k1(target, source))

    def fin(t: pa.Table) -> pa.Table:
        d = round_away(t["dist"].to_numpy(zero_copy_only=False), 4)
        return t.set_column(2, "dist", pa.array(d, pa.float64()))

    return out.map_batches(fin, batch_format="pyarrow")


SQL_MUTUAL_BEST = f"""
WITH {_sql_sides(1)}
SELECT c.sid AS source_id, c.tid AS target_id,
       round(c.dist, 4) + 0 AS dist
FROM cand c JOIN tcand t ON c.sid = t.sid AND c.tid = t.tid
ORDER BY source_id
"""


def q_grouped_skew(sf_dir: str):
    """Per-returnflag sample skewness + excess kurtosis of quantity —
    one pass of per-key power-sum partials (n, s1..s4), tiny fold,
    O(keys) finalize with DuckDB's bias-corrected estimators."""
    from ..moments import grouped_skew_kurt

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity"],
    )
    return grouped_skew_kurt(li, "l_returnflag", "l_quantity")


SQL_GROUPED_SKEW = """
SELECT l_returnflag, round(skewness(l_quantity), 6) + 0 AS skew,
       round(kurtosis(l_quantity), 6) + 0 AS kurt,
       count(*) AS n
FROM lineitem GROUP BY 1 ORDER BY 1
"""


def q_bcubed(sf_dir: str):
    """B-cubed precision/recall/F1 of the lang clustering against the
    source grouping — the per-record ER cluster-quality metric as one
    observed-cell contingency combiner pass."""
    from ..moments import bcubed

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "source"]
    )
    return bcubed(docs, "lang", "source")


SQL_BCUBED = """
WITH j AS (SELECT lang, source, CAST(count(*) AS DOUBLE) AS c
           FROM documents GROUP BY 1, 2),
 pt AS (SELECT lang, sum(c) AS cp FROM j GROUP BY 1),
 gt AS (SELECT source, sum(c) AS cg FROM j GROUP BY 1),
 t AS (SELECT sum(c) AS n FROM j),
 pr AS (SELECT sum(j.c * j.c / pt.cp) / t.n AS p,
               sum(j.c * j.c / gt.cg) / t.n AS r,
               CAST(t.n AS BIGINT) AS n
        FROM j, t, pt, gt
        WHERE j.lang = pt.lang AND j.source = gt.source
        GROUP BY t.n)
SELECT round(p, 6) + 0 AS bcubed_precision,
       round(r, 6) + 0 AS bcubed_recall,
       round(2 * p * r / (p + r), 6) + 0 AS bcubed_f1, n
FROM pr
"""


DECAY_HALF_LIFE_S = 7 * 86400.0


def q_decayed_value(sf_dir: str):
    """Per-user exponentially time-decayed value sum (7-day half-life,
    anchored at the newest event) — fixed-point per-term quantization
    makes the fold exact integer addition, order-invariant."""
    from ..windows import decayed_sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    return decayed_sum(ev, "user_id", "ts", "value", DECAY_HALF_LIFE_S)


_DECAY = float(np.log(2.0) / DECAY_HALF_LIFE_S)

SQL_DECAYED_VALUE = f"""
WITH m AS (SELECT max(CAST(floor(epoch(ts)) AS BIGINT)) AS tmax
           FROM events),
 t AS (SELECT user_id,
              CAST(round(value
                         * exp((CAST(floor(epoch(ts)) AS BIGINT) - m.tmax)
                               * {_DECAY!r})
                         * 1000000, 0) AS BIGINT) AS term
       FROM events, m)
SELECT user_id, sum(term) / 1000000.0 AS decayed
FROM t GROUP BY 1 ORDER BY 1
"""


def q_grouped_top_events(sf_dir: str):
    """Per-user top-3 most frequent event types with exact counts —
    count-pair combiner partials, one O(pairs) fold, then the folded
    counts stream through grouped_topk (no per-group frames)."""
    from ..relops import grouped_top_values

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    return grouped_top_values(ev, "user_id", "event_type", k=3)


SQL_GROUPED_TOP_EVENTS = """
WITH c AS (SELECT user_id, event_type, count(*) AS cnt
           FROM events GROUP BY 1, 2),
 r AS (SELECT user_id, event_type, cnt,
              row_number() OVER (PARTITION BY user_id
                                 ORDER BY cnt DESC, event_type) AS rn
       FROM c)
SELECT user_id, event_type, cnt, rn AS rank
FROM r WHERE rn <= 3 ORDER BY user_id, rank
"""


def q_snm_pairs(sf_dir: str):
    """Sorted-neighborhood blocking pairs: all document pairs within 3
    positions of the global lowercased-8-char-prefix order — the
    merge/purge alternative to equality blocking. Packed int64 key rides
    global_rank (sampled ranges, no global sort shuffle); contiguous
    ranks make pair generation slice arithmetic."""
    from ..block import sorted_neighborhood_pairs

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return sorted_neighborhood_pairs(
        docs, "doc_id", "text", window=3, prefix_len=8
    )


SQL_SNM_PAIRS = """
WITH d AS (SELECT doc_id,
                  lower(substr(coalesce(text, ''), 1, 8)) AS pfx
           FROM documents),
 r AS (SELECT doc_id,
              row_number() OVER (ORDER BY pfx, doc_id) AS rn
       FROM d)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(b.rn - a.rn AS BIGINT) AS gap
FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 3
ORDER BY a_id, b_id
"""


def q_first_last(sf_dir: str):
    """Per-user first/last-touch snapshot (earliest + latest event's
    type and value, (ts, event_id)-ordered) — associative extreme-row
    fold: two rows per key per batch, one key-hash fold, no raw-row
    shuffle."""
    from ..windows import first_last

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type", "value"],
    )
    out = first_last(ev, "user_id", "ts", "event_id",
                     ["event_type", "value"])

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["first_value"] = round_away(df["first_value"], 6)
        df["last_value"] = round_away(df["last_value"], 6)
        return df

    return out.map_batches(fin, batch_format="pandas")


SQL_FIRST_LAST = """
WITH a AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS e,
                  event_id, event_type, value
           FROM events),
 r AS (SELECT *,
              row_number() OVER (PARTITION BY user_id
                                 ORDER BY e, event_id) AS rna,
              row_number() OVER (PARTITION BY user_id
                                 ORDER BY e DESC, event_id DESC) AS rnd
       FROM a)
SELECT f.user_id, f.e AS first_epoch, l.e AS last_epoch,
       f.event_type AS first_event_type,
       l.event_type AS last_event_type,
       round(f.value, 6) + 0 AS first_value,
       round(l.value, 6) + 0 AS last_value
FROM (SELECT * FROM r WHERE rna = 1) f
JOIN (SELECT * FROM r WHERE rnd = 1) l USING (user_id)
ORDER BY user_id
"""


def q_sliding_distinct(sf_dir: str):
    """Rolling active users: distinct user count per 1h window sliding
    15m — in-batch (window, id) dedupe combiner, ONE distinct-pair
    shuffle of two int64 columns, tiny per-window count fold."""
    from ..windows import sliding_distinct

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )
    return sliding_distinct(ev, "ts", "user_id", window_s=3600,
                            slide_s=900)


SQL_SLIDING_DISTINCT = """
WITH ev AS (SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS e
            FROM events),
ex AS (SELECT DISTINCT u, (e // 900) * 900 - r.i * 900 AS ws
       FROM ev CROSS JOIN range(0, 4) r(i)
       WHERE e - ((e // 900) * 900 - r.i * 900) < 3600)
SELECT CAST(ws AS BIGINT) AS window_start,
       count(*) AS distinct_ids
FROM ex GROUP BY 1 ORDER BY 1
"""


def q_containment_pairs(sf_dir: str):
    """EXACT asymmetric n-gram containment pairs (|A∩B| / min|A|,|B|
    >= 0.8) — catches a short doc embedded in a longer one (this corpus
    has j≈0.125 containment pairs that jaccard-LSH provably misses).
    Deterministic prefix-filter candidates (pigeonhole on the smaller
    set's smallest hashes), one inverted-index shuffle, shared lexsort
    verify."""
    from ..dedup import containment_pairs_exact

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        lambda t: pa.table(
            {"doc_id": pc.cast(t["doc_id"], pa.int64()), "text": t["text"]}
        ),
        batch_format="pyarrow",
    )
    out = containment_pairs_exact(
        docs, "doc_id", "text", shingle_k=5, threshold=0.8
    )

    def fin(t: pa.Table) -> pa.Table:
        c = round_away(t["containment"].to_numpy(zero_copy_only=False), 6)
        return pa.table(
            {"a": t["a"], "b": t["b"],
             "containment": pa.array(c, pa.float64())}
        )

    return out.map_batches(fin, batch_format="pyarrow")


SQL_CONTAINMENT_PAIRS = """
WITH d AS (SELECT CAST(doc_id AS BIGINT) id, lower(text) t FROM documents),
p AS (SELECT id, CASE WHEN length(t) < 5 THEN t || repeat(' ', 5 - length(t))
                      ELSE t END AS t FROM d),
sh AS (SELECT id, list_distinct(list_transform(
           generate_series(1, length(t) - 4), i -> substr(t, i, 5))) s
       FROM p),
pairs AS (SELECT a.id ai, b.id bi,
                 CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                     / least(len(a.s), len(b.s)) c
          FROM sh a JOIN sh b ON a.id < b.id)
SELECT ai AS a, bi AS b, round(c, 6) + 0 AS containment
FROM pairs WHERE c >= 0.8 ORDER BY a, b
"""


def q_profile(sf_dir: str):
    """Numeric column profiling of lineitem (n / nulls / exact distinct
    / min / max per column) — one shared cheap-stats pass + ONE
    distinct-pair shuffle covering all columns at once."""
    from ..moments import profile_numeric

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=cols)
    return profile_numeric(li, cols)


SQL_PROFILE = """
SELECT 'l_quantity' AS "column", count(*) AS n,
       sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS nulls,
       count(DISTINCT l_quantity) AS n_distinct,
       round(min(l_quantity), 6) + 0 AS vmin,
       round(max(l_quantity), 6) + 0 AS vmax FROM lineitem
UNION ALL
SELECT 'l_extendedprice', count(*),
       sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END),
       count(DISTINCT l_extendedprice),
       round(min(l_extendedprice), 6) + 0,
       round(max(l_extendedprice), 6) + 0 FROM lineitem
UNION ALL
SELECT 'l_discount', count(*),
       sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END),
       count(DISTINCT l_discount),
       round(min(l_discount), 6) + 0,
       round(max(l_discount), 6) + 0 FROM lineitem
UNION ALL
SELECT 'l_tax', count(*),
       sum(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END),
       count(DISTINCT l_tax),
       round(min(l_tax), 6) + 0,
       round(max(l_tax), 6) + 0 FROM lineitem
"""


def q_adoption_curve(sf_dir: str):
    """Daily new-user counts + cumulative adoption (first-touch
    attribution) — per-batch (key, min_day) combiner partials, ONE
    key-hash shuffle, per-partition exact min + per-day partial counts;
    the day-level fold is calendar-bounded."""
    from ..windows import adoption_curve

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    return adoption_curve(ev, granularity_s=3600)


SQL_ADOPTION_CURVE = """
WITH f AS (
  SELECT user_id, min(date_trunc('hour', ts)) AS d FROM events GROUP BY 1)
SELECT CAST(epoch(d) AS BIGINT) AS bucket_s,
       count(*) AS new_keys,
       CAST(sum(count(*)) OVER (ORDER BY d) AS BIGINT) AS cum_keys
FROM f GROUP BY d ORDER BY bucket_s
"""


def q_grouped_geomean(sf_dir: str):
    """Per-event-type geometric and harmonic mean of value — one pass of
    (key, n, sum_ln, sum_inv) combiner partials, one tiny groupby fold;
    only O(distinct keys) rows shuffle."""
    from ..moments import grouped_geomean

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )
    return grouped_geomean(ev, "event_type", "value")


SQL_GROUPED_GEOMEAN = """
SELECT event_type, count(*) AS n,
       round(exp(avg(ln(value))), 6) + 0 AS geo_mean,
       round(count(*) / sum(1.0 / value), 6) + 0 AS harm_mean
FROM events GROUP BY 1 ORDER BY 1
"""


def q_score_auc(sf_dir: str):
    """Tie-aware ROC AUC (Mann-Whitney rank form) of document length as
    a predictor of lang='en' — (score, pos, neg) count partials collapse
    rows to distinct values per batch, one tiny fold, closed-form
    all-integer rank sum at the driver."""
    from ..evaluate import binary_auc

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["n_chars", "lang"]
    )

    def lab(t: pa.Table) -> pa.Table:
        pos = pc.equal(t["lang"], "en")
        return t.drop(["lang"]).append_column("pos", pos)

    return binary_auc(
        docs.map_batches(lab, batch_format="pyarrow"), "n_chars", "pos"
    )


SQL_SCORE_AUC = """
WITH d AS (SELECT n_chars AS s,
                  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
           FROM documents),
 g AS (SELECT s, count(*) AS c, sum(pos) AS p FROM d GROUP BY 1),
 r AS (SELECT s, c, p,
              coalesce(sum(c) OVER (ORDER BY s
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS o
       FROM g),
 t AS (SELECT (SELECT sum(pos) FROM d) AS np,
              (SELECT count(*) - sum(pos) FROM d) AS nn,
              (SELECT sum(p * (2 * o + c + 1)) FROM r) AS r2)
SELECT round((r2 - np * (np + 1)) / (2.0 * np * nn), 6) + 0 AS auc,
       CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg
FROM t
"""


def q_rfm_segments(sf_dir: str):
    """Customer RFM quartile segmentation — combiner partials collapse
    orders to distinct customers before one tiny fold, then three
    sampled-boundary global NTILE passes over the aggregated table
    (monetary ranked on exact int64 cents)."""
    from ..relops import rfm_segments

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )
    return rfm_segments(
        orders, "o_custkey", "o_orderdate", "o_totalprice", k=4
    )


SQL_RFM_SEGMENTS = """
WITH a AS (
  SELECT o_custkey,
         CAST(epoch(max(o_orderdate)) AS BIGINT) AS recency_s,
         count(*) AS frequency,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
              AS BIGINT) AS cents
  FROM orders GROUP BY 1)
SELECT o_custkey, frequency, recency_s,
       CAST(ntile(4) OVER (ORDER BY recency_s, o_custkey)
            AS BIGINT) AS r_tile,
       CAST(ntile(4) OVER (ORDER BY frequency, o_custkey)
            AS BIGINT) AS f_tile,
       CAST(ntile(4) OVER (ORDER BY cents, o_custkey)
            AS BIGINT) AS m_tile,
       CAST(cents AS DOUBLE) / 100 AS monetary
FROM a ORDER BY o_custkey
"""


def q_activity_heatmap(sf_dir: str):
    """Day-of-week x hour calendar heatmap — every batch collapses to
    <=168 cell partials via one packed bincount; only O(168) rows ever
    shuffle; exact fixed-point value sums."""
    from ..windows import activity_heatmap

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "value"]
    )
    return activity_heatmap(ev)


SQL_ACTIVITY_HEATMAP = """
SELECT dayofweek(ts) AS dow, CAST(hour(ts) AS BIGINT) AS hour,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_order_gaps(sf_dir: str):
    """Per-customer inter-order gap profile (lag-diff count/mean/min/
    max) — one key-hash shuffle, one lexsort + diff + reduceat per
    partition; gaps sum exactly in int64 microseconds."""
    from ..windows import interarrival_stats

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey"],
    )
    return interarrival_stats(
        orders, "o_custkey", "o_orderdate", "o_orderkey"
    )


SQL_ORDER_GAPS = """
WITH o AS (SELECT o_custkey AS k, epoch_us(o_orderdate) AS us, o_orderkey
           FROM orders),
 l AS (SELECT k, us - lag(us) OVER (PARTITION BY k ORDER BY us, o_orderkey)
              AS g
       FROM o)
SELECT k AS o_custkey, count(g) AS n_gaps,
       round(CAST(sum(g) AS DOUBLE) / (count(g) * 1000000.0), 6) + 0
           AS avg_gap_s,
       CAST(min(g) AS BIGINT) AS min_gap_us,
       CAST(max(g) AS BIGINT) AS max_gap_us
FROM l WHERE g IS NOT NULL GROUP BY 1 ORDER BY 1
"""


def q_weighted_avg(sf_dir: str):
    """Quantity-weighted average price per return flag — exact int64
    fixed-point (cents x integer weight) combiner partials, one tiny
    fold, single final division."""
    from ..moments import grouped_weighted_avg

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    )
    return grouped_weighted_avg(
        li, "l_returnflag", "l_extendedprice", "l_quantity"
    )


SQL_WEIGHTED_AVG = """
SELECT l_returnflag,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_w,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(l_quantity AS BIGINT)) AS DOUBLE)
             / sum(CAST(l_quantity AS BIGINT)), 6) + 0 AS wavg
FROM lineitem GROUP BY 1 ORDER BY 1
"""


def q_dedup_canonical(sf_dir: str):
    """Canonicalized exact dedup (lower / strip punctuation / trim,
    then group) — Arrow-kernel canonicalization, in-batch (hash,
    min_id, count) combiner, ONE coarse hash shuffle of 4-column
    partials; canonical text never moves."""
    from ..dedup import dedup_canonical

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return dedup_canonical(docs)


SQL_DEDUP_CANONICAL = """
WITH c AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
             AS canon
  FROM documents),
 g AS (SELECT min(doc_id) AS doc_id, count(*) AS n_copies
       FROM c WHERE canon <> '' GROUP BY canon)
SELECT doc_id, n_copies FROM g ORDER BY doc_id
"""


def _int_sum_fold(ds, val_cols, P=32):
    """Exact per-key int64 sums: in-batch combiner (argsort + reduceat)
    collapses every batch to one row per distinct key, then ONE coarse
    hash shuffle of the partials and the same exact fold per partition.
    Only (key, partial) rows ever move — never input rows."""

    schema = pa.schema(
        [("k", pa.int64())] + [(c, pa.int64()) for c in val_cols]
    )

    def combine(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return schema.empty_table()
        order = np.argsort(k, kind="stable")
        ks = k[order]
        starts = np.flatnonzero(
            np.concatenate(([True], ks[1:] != ks[:-1]))
        )
        cols = {"k": pa.array(ks[starts], pa.int64())}
        for c in val_cols:
            v = t[c].to_numpy(zero_copy_only=False)[order]
            cols[c] = pa.array(np.add.reduceat(v, starts), pa.int64())
        return pa.table(cols)

    def add_part(t: pa.Table) -> pa.Table:
        part = pc.cast(
            pc.bit_wise_and(t["k"], pa.scalar(P - 1, pa.int64())),
            pa.int32(),
        )
        return t.append_column("__part", part)

    return (
        ds.map_batches(combine, batch_format="pyarrow",
                       zero_copy_batch=True)
        .map_batches(add_part, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("__part")
        .map_groups(
            lambda g: combine(g.select(["k"] + val_cols)),
            batch_format="pyarrow",
        )
    )


def q_large_orders(sf_dir: str):
    """TPC-H Q18 shape: customers whose orders exceed a quantity
    threshold. Scale shape: lineitem never leaves its scan — an
    in-batch combiner + ONE coarse partial shuffle produce per-order
    sums; the HAVING filter leaves a selectivity-bounded survivor set
    that is broadcast (``ray.put`` once) through streaming scans of
    orders and customer — zero fact-side shuffles."""
    from ..relops import broadcast_join

    threshold = 250
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    ).map_batches(
        lambda t: pa.table(
            {
                "k": pc.cast(t["l_orderkey"], pa.int64()),
                "sum_qty": pc.cast(t["l_quantity"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    big = _int_sum_fold(li, ["sum_qty"]).map_batches(
        lambda t: t.filter(
            pc.greater(t["sum_qty"], pa.scalar(threshold, pa.int64()))
        ),
        batch_format="pyarrow",
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    j1 = broadcast_join(orders, big, "o_orderkey", "k").map_batches(
        lambda t: t.select(
            ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
             "sum_qty"]
        ),
        batch_format="pyarrow",
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    out = broadcast_join(cust, j1, "c_custkey", "o_custkey").to_pandas()
    out = out[
        ["c_name", "c_custkey", "o_orderkey", "o_orderdate",
         "o_totalprice", "sum_qty"]
    ]
    return out.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True]
    ).reset_index(drop=True)


SQL_LARGE_ORDERS = """
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS BIGINT)) > 250)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
"""


def q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape: revenue lost to small-quantity orders of one
    brand's parts. Two streaming passes over a pruned lineitem scan:
    pass 1 folds exact per-part (sum_qty, count) partials; pass 2
    re-scans with the tiny per-part stats broadcast and keeps rows
    with ``5*q*cnt < sum_qty`` — the 0.2*avg predicate in EXACT int64
    (no float avg on either side). The part-key membership set is
    one brand (dimension-bounded), shipped by ``ray.put`` once."""
    parts = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.equal(t["p_brand"], pa.scalar("Brand#3")),
                pc.less_equal(t["p_size"], pa.scalar(15, pa.int32())),
            )
        ).select(["p_partkey"]),
        batch_format="pyarrow",
    )
    pk = np.sort(
        np.concatenate(
            [
                b["p_partkey"].to_numpy(zero_copy_only=False)
                for b in parts.iter_batches(batch_format="pyarrow")
            ]
            or [np.empty(0, np.int64)]
        )
    )
    pk_ref = ray.put(pk)

    class Pass1:
        def __init__(self):
            self.pk = ray.get(pk_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            k = t["l_partkey"].to_numpy(zero_copy_only=False)
            m = np.isin(k, self.pk)
            q = t["l_quantity"].to_numpy(zero_copy_only=False)[m]
            return pa.table(
                {
                    "k": pa.array(k[m], pa.int64()),
                    "q": pa.array(q.astype(np.int64), pa.int64()),
                    "n": pa.array(np.ones(int(m.sum()), np.int64)),
                }
            )

    li1 = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_quantity"]
    ).map_batches(Pass1, concurrency=(1, 8), batch_format="pyarrow",
                  zero_copy_batch=True)
    stats = _int_sum_fold(li1, ["q", "n"]).to_pandas()  # one row per part
    order = np.argsort(stats["k"].to_numpy())
    st_k = stats["k"].to_numpy()[order]
    st_q = stats["q"].to_numpy()[order]
    st_n = stats["n"].to_numpy()[order]
    st_ref = ray.put((st_k, st_q, st_n))

    class Pass2:
        def __init__(self):
            self.k, self.sq, self.cnt = ray.get(st_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            k = t["l_partkey"].to_numpy(zero_copy_only=False)
            m = np.isin(k, self.k)
            if not m.any():
                return pa.table(
                    {"n_rows": pa.array([0], pa.int64()),
                     "cents": pa.array([0], pa.int64())}
                )
            idx = np.searchsorted(self.k, k[m])
            q = t["l_quantity"].to_numpy(zero_copy_only=False)[m]
            q = q.astype(np.int64)
            keep = 5 * q * self.cnt[idx] < self.sq[idx]
            price = t["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
            cents = np.round(price[keep] * 100.0).astype(np.int64)
            return pa.table(
                {"n_rows": pa.array([int(keep.sum())], pa.int64()),
                 "cents": pa.array([int(cents.sum())], pa.int64())}
            )

    partials = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    ).map_batches(Pass2, concurrency=(1, 8), batch_format="pyarrow",
                  zero_copy_batch=True).to_pandas()
    n = int(partials["n_rows"].sum())
    cents = int(partials["cents"].sum())
    return pd.DataFrame(
        {"n_rows": pd.array([n], dtype="int64"),
         "avg_yearly": [round_away(float(cents) / 700.0, 6)]}
    )


SQL_SMALL_QTY_REVENUE = """
WITH pk AS (SELECT p_partkey FROM part
            WHERE p_brand = 'Brand#3' AND p_size <= 15),
 l AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
              CAST(l_extendedprice * 100 AS BIGINT) AS cents
       FROM lineitem JOIN pk ON l_partkey = p_partkey),
 a AS (SELECT l_partkey, sum(q) AS sq, count(*) AS c FROM l GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       round(CAST(sum(cents) AS DOUBLE) / 700.0, 6) + 0 AS avg_yearly
FROM l JOIN a USING (l_partkey) WHERE 5 * q * c < sq
"""


def q_promo_share(sf_dir: str):
    """TPC-H Q14 shape: promo revenue share for one ship-year. Revenue
    is EXACT int64 fixed point (price cents x (100 - discount
    percent)); the promo part-key set is broadcast once and membership
    is a sorted ``np.isin`` per batch; every batch collapses to a
    2-int partial so only O(batches) rows reach the driver fold."""
    promo = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).map_batches(
        lambda t: t.filter(
            pc.equal(t["p_type"], pa.scalar("PROMO"))
        ).select(["p_partkey"]),
        batch_format="pyarrow",
    )
    pk = np.sort(
        np.concatenate(
            [
                b["p_partkey"].to_numpy(zero_copy_only=False)
                for b in promo.iter_batches(batch_format="pyarrow")
            ]
            or [np.empty(0, np.int64)]
        )
    )
    pk_ref = ray.put(pk)
    lo = np.datetime64("1995-01-01", "us")
    hi = np.datetime64("1996-01-01", "us")

    class Partial:
        def __init__(self):
            self.pk = ray.get(pk_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ts = t["l_shipdate"].to_numpy(zero_copy_only=False)
            m = (ts >= lo) & (ts < hi)
            price = t["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
            disc = t["l_discount"].to_numpy(zero_copy_only=False)[m]
            cents = np.round(price * 100.0).astype(np.int64)
            d = np.round(disc * 100.0).astype(np.int64)
            u = cents * (100 - d)
            is_promo = np.isin(
                t["l_partkey"].to_numpy(zero_copy_only=False)[m], self.pk
            )
            return pa.table(
                {
                    "promo_units": pa.array(
                        [int(u[is_promo].sum())], pa.int64()
                    ),
                    "total_units": pa.array([int(u.sum())], pa.int64()),
                }
            )

    partials = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    ).map_batches(Partial, concurrency=(1, 8), batch_format="pyarrow",
                  zero_copy_batch=True).to_pandas()
    p = int(partials["promo_units"].sum())
    tot = int(partials["total_units"].sum())
    return pd.DataFrame(
        {
            "promo_units": pd.array([p], dtype="int64"),
            "total_units": pd.array([tot], dtype="int64"),
            "promo_share": [round_away(100.0 * float(p) / float(tot), 6)],
        }
    )


SQL_PROMO_SHARE = """
WITH l AS (
  SELECT l_partkey,
         CAST(l_extendedprice * 100 AS BIGINT)
           * (100 - CAST(l_discount * 100 AS BIGINT)) AS u
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate < TIMESTAMP '1996-01-01'),
 j AS (SELECT u, p_type FROM l JOIN part ON l_partkey = p_partkey)
SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN u ELSE 0 END) AS BIGINT)
           AS promo_units,
       CAST(sum(u) AS BIGINT) AS total_units,
       round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN u ELSE 0 END)
                          AS DOUBLE)
             / CAST(sum(u) AS DOUBLE), 6) + 0 AS promo_share
FROM j
"""


def q_sales_opportunity(sf_dir: str):
    """TPC-H Q22 shape: nations of high-balance customers with no
    recent orders. The above-global-average predicate is EXACT
    rational arithmetic (``cents * n_pos > sum_cents`` — no float avg
    on either side, two scalar partial folds); the anti join is the
    hash-partitioned ``semi_join(anti=True)`` (no broadcast keep-set);
    the final rollup folds int64 cent partials per nation."""
    from ..relops import semi_join

    cut = np.datetime64("2001-01-01", "us")
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )

    def bal_partial(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        pos = cents[cents > 0]
        return pa.table(
            {"cs": pa.array([int(pos.sum())], pa.int64()),
             "n": pa.array([len(pos)], pa.int64())}
        )

    stats = cust.map_batches(
        bal_partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    cs, n = int(stats["cs"].sum()), int(stats["n"].sum())

    def hot(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        keep = cents * n > cs
        return pa.table(
            {
                "c_custkey": t["c_custkey"].filter(pa.array(keep)),
                "c_nationkey": pc.cast(
                    t["c_nationkey"].filter(pa.array(keep)), pa.int64()
                ),
                "cents": pa.array(cents[keep], pa.int64()),
            }
        )

    recent = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t["o_custkey"].filter(
                    pc.greater_equal(
                        t["o_orderdate"],
                        pa.scalar(cut.item(), pa.timestamp("us")),
                    )
                )
            }
        ),
        batch_format="pyarrow",
    )
    idle = semi_join(
        cust.map_batches(hot, batch_format="pyarrow",
                         zero_copy_batch=True),
        recent, "c_custkey", "o_custkey", anti=True,
    ).map_batches(
        lambda t: pa.table(
            {
                "k": t["c_nationkey"],
                "cents": t["cents"],
                "n_cust": pa.array(np.ones(len(t), np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    out = _int_sum_fold(idle, ["cents", "n_cust"]).to_pandas()
    out = out.rename(columns={"k": "c_nationkey"})
    out["totacctbal"] = round_away(
        out["cents"].to_numpy().astype(float) / 100.0, 2
    )
    return (
        out[["c_nationkey", "n_cust", "totacctbal"]]
        .sort_values("c_nationkey")
        .reset_index(drop=True)
    )


SQL_SALES_OPPORTUNITY = """
WITH s AS (
  SELECT CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
             AS cs,
         count(*) AS n
  FROM customer WHERE c_acctbal > 0),
 hot AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
  FROM customer, s
  WHERE CAST(round(c_acctbal * 100, 0) AS BIGINT) * n > cs),
 idle AS (
  SELECT * FROM hot
  WHERE c_custkey NOT IN (
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '2001-01-01'))
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
       round(CAST(sum(cents) AS DOUBLE) / 100.0, 2) + 0 AS totacctbal
FROM idle GROUP BY 1 ORDER BY 1
"""


def q_brand_supplier_count(sf_dir: str):
    """TPC-H Q16 shape: distinct supplier count per (brand, size) for
    small parts, excluding deficit-balance suppliers. The part and
    supplier sides are dimension-bounded broadcasts (sorted int64
    arrays, ``searchsorted`` membership); the count itself is the
    exact ``grouped_distinct_count`` shuffle — only distinct
    (packed-key, suppkey) pairs move."""
    from ..relops import grouped_distinct_count

    parts = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"],
    ).map_batches(
        lambda t: t.filter(
            pc.less_equal(t["p_size"], pa.scalar(10, pa.int32()))
        ),
        batch_format="pyarrow",
    ).to_pandas()
    brands = sorted(parts["p_brand"].unique())
    bidx = {b: i for i, b in enumerate(brands)}
    pk = parts["p_partkey"].to_numpy().astype(np.int64)
    order = np.argsort(pk)
    pk = pk[order]
    combo = (
        parts["p_brand"].map(bidx).to_numpy().astype(np.int64) * 64
        + parts["p_size"].to_numpy().astype(np.int64)
    )[order]
    bad_batches = [
        b["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        for b in ray.data.read_parquet(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"]
        ).map_batches(
            lambda t: t.filter(
                pc.less(t["s_acctbal"], pa.scalar(0.0))
            ).select(["s_suppkey"]),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow")
    ]
    bad_supp = np.sort(
        np.concatenate(bad_batches or [np.empty(0, np.int64)])
    )
    ref = ray.put((pk, combo, bad_supp))

    class Tag:
        def __init__(self):
            self.pk, self.combo, self.bad = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            k = t["l_partkey"].to_numpy(zero_copy_only=False)
            s = t["l_suppkey"].to_numpy(zero_copy_only=False)
            m = np.isin(k, self.pk) & ~np.isin(s, self.bad)
            idx = np.searchsorted(self.pk, k[m])
            return pa.table(
                {"key": pa.array(self.combo[idx], pa.int64()),
                 "supp": pa.array(s[m].astype(np.int64), pa.int64())}
            )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    ).map_batches(Tag, concurrency=(1, 8), batch_format="pyarrow",
                  zero_copy_batch=True)
    out = grouped_distinct_count(
        li, "key", "supp", out_col="supplier_cnt"
    ).to_pandas()
    key = out["key"].to_numpy()
    out = pd.DataFrame(
        {
            "p_brand": [brands[i] for i in key // 64],
            "p_size": (key % 64).astype(np.int32),
            "supplier_cnt": out["supplier_cnt"].to_numpy(),
        }
    )
    return out.sort_values(
        ["supplier_cnt", "p_brand", "p_size"],
        ascending=[False, True, True],
    ).reset_index(drop=True)


SQL_BRAND_SUPPLIER_COUNT = """
SELECT p_brand, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_size <= 10
  AND l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2
ORDER BY supplier_cnt DESC, p_brand, p_size
"""


def q_grouped_centroid(sf_dir: str):
    """Per-label embedding centroid — exact 1e-6 fixed-point terms so
    the distributed fold is integer addition (order/partition
    invariant); embeddings never leave their scan, only O(labels x d)
    3-int64 partials shuffle. Grouped companion to ``dim_stats``."""
    from ..moments import grouped_centroid

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )
    return grouped_centroid(emb, "label", "embedding")


SQL_GROUPED_CENTROID = """
WITH g AS (
  SELECT CAST(label AS BIGINT) AS label, u.i AS dim,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(CAST(embedding[u.i] AS DOUBLE) * 1000000, 0)
                       AS BIGINT)) AS BIGINT) AS s
  FROM embeddings,
       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) u
  GROUP BY 1, 2)
SELECT label, dim, n,
       CAST(CASE WHEN s >= 0 THEN (2 * s + n) // (2 * n)
                 ELSE -((2 * (-s) + n) // (2 * n)) END AS DOUBLE)
           / 1000000.0 AS centroid
FROM g ORDER BY label, dim
"""


def q_benford(sf_dir: str):
    """Leading-digit (Benford) profile of order totals: the digit is
    EXACT integer math (cents // 10^floor — a 19-entry powers-of-10
    searchsorted, no float log on data); every batch collapses to a
    <=9-row bincount partial, one tiny fold, O(9) driver state."""
    pow10 = 10 ** np.arange(19, dtype=np.int64)

    def partial(t: pa.Table) -> pa.Table:
        cents = round_away(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        digit = cents // pow10[np.searchsorted(pow10, cents, "right") - 1]
        counts = np.bincount(digit, minlength=10)[1:10]
        return pa.table(
            {
                "k": pa.array(np.arange(1, 10, dtype=np.int64)),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    folded = _int_sum_fold(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_totalprice"]
        ).map_batches(partial, batch_format="pyarrow",
                      zero_copy_batch=True),
        ["n"],
    ).to_pandas()
    folded = folded[folded["n"] > 0].sort_values("k")
    n = folded["n"].to_numpy().astype(np.int64)
    d = folded["k"].to_numpy().astype(np.int64)
    total = float(n.sum())
    return pd.DataFrame(
        {
            "digit": d,
            "n": n,
            "share": round_away(n.astype(float) / total, 6),
            "benford": round_away(np.log10(1.0 + 1.0 / d), 6),
        }
    ).reset_index(drop=True)


SQL_BENFORD = """
WITH c AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
           FROM orders),
 g AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
                  AS digit,
              count(*) AS n
       FROM c GROUP BY 1),
 t AS (SELECT sum(n) AS tot FROM g)
SELECT digit, CAST(n AS BIGINT) AS n,
       round(CAST(n AS DOUBLE) / tot, 6) + 0 AS share,
       round(log10(1 + 1.0 / digit), 6) + 0 AS benford
FROM g, t ORDER BY digit
"""


def q_jw_pairs(sf_dir: str):
    """Blocked Jaro-Winkler similarity join over distinct part names —
    the lexical rerank primitive for ER. The numpy kernel is bitwise
    identical to DuckDB's ``jaro_winkler_similarity`` (fuzz-verified:
    window max//2-1, transpositions/2, prefix<=4 boost only when
    jaro > 0.7); the threshold cut is on the ROUNDED score so a libm
    ulp can never flip membership."""
    from ..dedup import jw_pairs

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_name"]
    )
    out = (
        jw_pairs(part, "p_name", block_chars=1, threshold=0.75)
        .to_pandas()
        .sort_values(["name_a", "name_b"])
        .reset_index(drop=True)
    )
    return out


SQL_JW_PAIRS = """
WITH n AS (SELECT DISTINCT p_name FROM part),
 p AS (SELECT a.p_name AS name_a, b.p_name AS name_b
       FROM n a JOIN n b
         ON substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
        AND a.p_name < b.p_name)
SELECT name_a, name_b,
       round(jaro_winkler_similarity(name_a, name_b), 6) + 0 AS jw
FROM p
WHERE round(jaro_winkler_similarity(name_a, name_b), 6) >= 0.75
ORDER BY name_a, name_b
"""


def q_snapshot_diff(sf_dir: str):
    """CDC classification between two order-book snapshots: each
    customer's latest order total before vs after a cutoff, classified
    added/removed/changed/unchanged. Composes two ``first_last``
    associative folds (raw orders never shuffle) with the
    ``snapshot_diff`` tagged-union outer resolve — ONE key shuffle."""
    from ..relops import snapshot_diff
    from ..windows import first_last

    cut = pa.scalar(
        np.datetime64("1998-01-01", "us").item(), pa.timestamp("us")
    )

    def latest(pred) -> "ray.data.Dataset":
        orders = ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderdate", "o_orderkey",
                     "o_totalprice"],
        ).map_batches(
            lambda t: t.filter(pred(t)), batch_format="pyarrow"
        )
        return first_last(
            orders, "o_custkey", "o_orderdate", "o_orderkey",
            ["o_totalprice"],
        ).map_batches(
            lambda t: pa.table(
                {
                    "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                    "val": pc.cast(t["last_o_totalprice"], pa.float64()),
                }
            ),
            batch_format="pyarrow",
        )

    old = latest(lambda t: pc.less(t["o_orderdate"], cut))
    new = latest(lambda t: pc.greater_equal(t["o_orderdate"], cut))
    out = (
        snapshot_diff(old, new, "o_custkey", "val")
        .to_pandas()
        .sort_values("o_custkey")
        .reset_index(drop=True)
    )
    return out


SQL_SNAPSHOT_DIFF = """
WITH o AS (
  SELECT o_custkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC)
             AS rn
  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'),
 n AS (
  SELECT o_custkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC)
             AS rn
  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'),
 oo AS (SELECT o_custkey, o_totalprice FROM o WHERE rn = 1),
 nn AS (SELECT o_custkey, o_totalprice FROM n WHERE rn = 1)
SELECT coalesce(oo.o_custkey, nn.o_custkey) AS o_custkey,
       oo.o_totalprice AS old_val, nn.o_totalprice AS new_val,
       CASE WHEN oo.o_custkey IS NULL THEN 'added'
            WHEN nn.o_custkey IS NULL THEN 'removed'
            WHEN oo.o_totalprice <> nn.o_totalprice THEN 'changed'
            ELSE 'unchanged' END AS status
FROM oo FULL OUTER JOIN nn ON oo.o_custkey = nn.o_custkey
ORDER BY 1
"""


def q_state_intervals(sf_dir: str):
    """Per-user SCD-2 state history over the event stream: maximal runs
    of equal event_type as (start, end, n) intervals — the
    gaps-and-islands construction with ONE slim-column key shuffle and
    a reduceat per partition instead of window sorts."""
    from ..windows import state_intervals

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    return (
        state_intervals(ev, "user_id", "ts", "event_id", "event_type")
        .to_pandas()
        .sort_values(["user_id", "start_epoch", "end_epoch", "event_type"])
        .reset_index(drop=True)
    )


SQL_STATE_INTERVALS = """
WITH e AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS e, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY floor(epoch(ts)), event_id) AS rn,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY floor(epoch(ts)), event_id) AS rns
  FROM events)
SELECT user_id, event_type,
       CAST(min(e) AS BIGINT) AS start_epoch,
       CAST(max(e) AS BIGINT) AS end_epoch,
       CAST(count(*) AS BIGINT) AS n_events
FROM e GROUP BY user_id, event_type, rn - rns
ORDER BY user_id, start_epoch, end_epoch, event_type
"""


def q_fs_scores(sf_dir: str):
    """Fellegi-Sunter probabilistic linkage scores over the
    sorted-neighborhood candidate pairs: literal log-odds weights per
    field agreement (lang / source equality, 10%% length band in exact
    integer math) summed in a fixed order so the oracle adds
    bit-identical doubles. Payloads reach pairs by two hash joins —
    no driver state."""
    from ..block import sorted_neighborhood_pairs
    from ..evaluate import fellegi_sunter

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    pairs = sorted_neighborhood_pairs(
        docs, "doc_id", "text", window=3, prefix_len=8
    )
    out = fellegi_sunter(
        pairs,
        docs.select_columns(["doc_id", "lang", "source", "n_chars"]),
        "doc_id",
        {"lang": (1.15268, -2.639057), "source": (1.280934, -2.014903)},
        len_field=("n_chars", (1.446919, -1.673976)),
    )
    return (
        out.to_pandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )


SQL_FS_SCORES = """
WITH d AS (SELECT doc_id,
                  lower(substr(coalesce(text, ''), 1, 8)) AS pfx
           FROM documents),
 r AS (SELECT doc_id,
              row_number() OVER (ORDER BY pfx, doc_id) AS rn
       FROM d),
 p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
       FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 3),
 m AS (SELECT p.a_id, p.b_id,
              CASE WHEN da.lang = db.lang THEN 1 ELSE 0 END
                  AS agree_lang,
              CASE WHEN da.source = db.source THEN 1 ELSE 0 END
                  AS agree_source,
              CASE WHEN 10 * abs(da.n_chars - db.n_chars)
                        <= greatest(da.n_chars, db.n_chars)
                   THEN 1 ELSE 0 END AS agree_n_chars
       FROM p
       JOIN documents da ON da.doc_id = p.a_id
       JOIN documents db ON db.doc_id = p.b_id)
SELECT a_id, b_id,
       CAST(agree_lang AS BIGINT) AS agree_lang,
       CAST(agree_source AS BIGINT) AS agree_source,
       CAST(agree_n_chars AS BIGINT) AS agree_n_chars,
       round(CASE WHEN agree_lang = 1 THEN 1.15268 ELSE -2.639057 END
             + CASE WHEN agree_source = 1 THEN 1.280934
                    ELSE -2.014903 END
             + CASE WHEN agree_n_chars = 1 THEN 1.446919
                    ELSE -1.673976 END, 6) + 0 AS score
FROM m ORDER BY a_id, b_id
"""


def q_peak_concurrency(sf_dir: str):
    """Hourly peak concurrent sessions — the distributed sweep-line:
    sessionize (one key shuffle), boundary combiner collapses each
    batch to one row per distinct timestamp, ONE bucket shuffle, and a
    two-phase prefix sum whose driver fold is O(calendar hours)."""
    from ..windows import peak_concurrency, sessionize

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    return peak_concurrency(sessionize(ev, "user_id", "ts", gap_s=1800))


SQL_PEAK_CONCURRENCY = """
WITH e AS (SELECT CAST(user_id AS BIGINT) user_id,
                  CAST(floor(epoch(ts)) AS BIGINT) es
           FROM events),
 flagged AS (SELECT user_id, es,
                    CASE WHEN es - lag(es) OVER w > 1800
                         OR lag(es) OVER w IS NULL THEN 1 ELSE 0 END
                        AS new_s
             FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es)),
 sess AS (SELECT user_id, es,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY es
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged),
 s AS (SELECT min(es) AS session_start, max(es) AS session_end
       FROM sess GROUP BY user_id, sid),
 b AS (SELECT session_start AS t, 1 AS d FROM s
       UNION ALL SELECT session_end + 1, -1 FROM s),
 r AS (SELECT t, d,
              sum(d) OVER (ORDER BY t, d ROWS UNBOUNDED PRECEDING) AS cc
       FROM b)
SELECT t // 3600 AS hour, CAST(max(cc) AS BIGINT) AS max_cc
FROM r WHERE d = 1 GROUP BY 1 ORDER BY 1
"""


def q_centroid_dist(sf_dir: str):
    """Pairwise squared euclidean distance between label centroids —
    EXACT end to end: centroids are integer micro-units (the
    ``grouped_centroid`` fold), the distance is an int64 sum of
    squared differences, and the only division is the final 1e12
    rescale (identical doubles both sides). Distributed work is the
    centroid fold; the label x label matrix is driver-trivial."""
    from ..moments import grouped_centroid

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )
    cent = grouped_centroid(emb, "label", "embedding")
    labels = np.sort(cent["label"].unique())
    d = int(cent["dim"].max())
    mu = np.zeros((len(labels), d), dtype=np.int64)
    lab_idx = {int(l): i for i, l in enumerate(labels)}
    mu[
        cent["label"].map(lab_idx).to_numpy(),
        cent["dim"].to_numpy() - 1,
    ] = np.round(cent["centroid"].to_numpy() * 1e6).astype(np.int64)
    rows = []
    for i in range(len(labels)):
        for j in range(i + 1, len(labels)):
            d2 = int(((mu[i] - mu[j]) ** 2).sum())
            rows.append((int(labels[i]), int(labels[j]), d2 / 1e12))
    return pd.DataFrame(rows, columns=["label_a", "label_b", "dist2"])


SQL_CENTROID_DIST = """
WITH g AS (
  SELECT CAST(label AS BIGINT) AS label, u.i AS dim,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(CAST(embedding[u.i] AS DOUBLE) * 1000000, 0)
                       AS BIGINT)) AS BIGINT) AS s
  FROM embeddings,
       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) u
  GROUP BY 1, 2),
 c AS (
  SELECT label, dim,
         CASE WHEN s >= 0 THEN (2 * s + n) // (2 * n)
              ELSE -((2 * (-s) + n) // (2 * n)) END AS mu
  FROM g)
SELECT a.label AS label_a, b.label AS label_b,
       CAST(sum((a.mu - b.mu) * (a.mu - b.mu)) AS DOUBLE)
           / 1000000000000.0 AS dist2
FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# TPC-H shape completion (Q2/Q3/Q4/Q6/Q7/Q9/Q11/Q12/Q15/Q19/Q20/Q21 shapes)
# adapted to the driver schema (no partsupp table, no commit/receipt dates,
# no shipmode — each docstring states the substitution). With these, all 22
# TPC-H query shapes have an oracle-exact entry.
# ---------------------------------------------------------------------------


def _li_units(t: pa.Table) -> np.ndarray:
    """Exact revenue fixed point: price cents x (100 - discount pct),
    int64 units of 10^-4 dollars. Partition-order-invariant by
    construction (integer addition commutes)."""
    price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
    disc = t["l_discount"].to_numpy(zero_copy_only=False)
    # round_away for oracle consistency (2-decimal TPC-H prices can't hit
    # a *100 tie, but every oracle-compared quantization uses one rule)
    cents = round_away(price * 100.0, 0).astype(np.int64)
    d = round_away(disc * 100.0, 0).astype(np.int64)
    return cents * (100 - d)


def q_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape: forecast revenue change from eliminating small
    discounts. Pure filter + global sum — every batch collapses to ONE
    int64 partial (cents x discount-percent units), the driver folds
    O(batches) rows. The leanest possible 100-TB shape: 4 pruned
    columns in, 8 bytes per batch out."""
    lo = np.datetime64("1996-01-01", "us")
    hi = np.datetime64("1997-01-01", "us")

    def partial(t: pa.Table) -> pa.Table:
        ts = t["l_shipdate"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        d = np.round(disc * 100.0).astype(np.int64)
        m = (ts >= lo) & (ts < hi) & (d >= 5) & (d <= 7) & (qty < 24)
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        cents = np.round(price * 100.0).astype(np.int64)
        u = cents * d[m]
        return pa.table({"u": pa.array([int(u.sum())], pa.int64())})

    partials = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity",
                 "l_extendedprice"],
    ).map_batches(partial, batch_format="pyarrow",
                  zero_copy_batch=True).to_pandas()
    u = int(partials["u"].sum())
    return pd.DataFrame(
        {"revenue_units": pd.array([u], dtype="int64"),
         "revenue": [round_away(float(u) / 10000.0, 2)]}
    )


SQL_FORECAST_REVENUE = """
SELECT CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * CAST(round(l_discount * 100) AS BIGINT)), 0)
            AS BIGINT) AS revenue_units,
       round(CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                               * CAST(round(l_discount * 100) AS BIGINT)), 0)
                  AS DOUBLE) / 10000.0, 2) + 0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""


def q_top_supplier(sf_dir: str):
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in one
    quarter (ties kept, like the reference query's view-max form).
    Exact int64 revenue units -> per-supplier ``_int_sum_fold`` (one
    row per supplier ever moves) -> global max + equality filter on
    the tiny per-supplier table; names resolved from the supplier
    dimension driver-side."""
    lo = np.datetime64("1996-01-01", "us")
    hi = np.datetime64("1996-04-01", "us")

    def units(t: pa.Table) -> pa.Table:
        ts = t["l_shipdate"].to_numpy(zero_copy_only=False)
        m = (ts >= lo) & (ts < hi)
        sub = t.filter(pa.array(m))
        return pa.table(
            {
                "k": pc.cast(sub["l_suppkey"], pa.int64()),
                "u": pa.array(_li_units(sub), pa.int64()),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                 "l_discount"],
    ).map_batches(units, batch_format="pyarrow", zero_copy_batch=True)
    per_supp = _int_sum_fold(li, ["u"]).to_pandas()  # one row / supplier
    if per_supp.empty:  # no lineitem in the quarter: oracle returns 0 rows
        return pd.DataFrame(
            {
                "s_suppkey": pd.array([], dtype="int64"),
                "s_name": pd.array([], dtype=object),
                "total_revenue": pd.array([], dtype="float64"),
            }
        )
    best = int(per_supp["u"].max())
    win = per_supp[per_supp["u"] == best]
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).to_pandas()
    out = win.merge(supp, left_on="k", right_on="s_suppkey")
    out["total_revenue"] = round_away(
        out["u"].to_numpy().astype(np.float64) / 10000.0, 2
    )
    return (
        out[["s_suppkey", "s_name", "total_revenue"]]
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )


SQL_TOP_SUPPLIER = """
WITH r AS (
  SELECT l_suppkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS u
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1)
SELECT s_suppkey, s_name,
       round(CAST(u AS DOUBLE) / 10000.0, 2) + 0 AS total_revenue
FROM r JOIN supplier ON l_suppkey = s_suppkey
WHERE u = (SELECT max(u) FROM r)
ORDER BY s_suppkey
"""


def q_important_parts(sf_dir: str):
    """TPC-H Q11 shape: parts whose total lineitem spend exceeds a
    scale-invariant threshold (HAVING sum > scalar-subquery threshold).
    No partsupp table in this schema, so "value" is the part's total
    revenue and the bar is 1.3x the mean per-part value. The threshold is
    hoisted driver-side as exact Python big-int arithmetic (keep iff
    ``v >= 13*total // (10*n_parts) + 1``, the integer form of
    ``10*v*n_parts > 13*total``) — the in-kernel int64 product would
    silently wrap at the 10^12-unit scale this targets; both scalars come
    from one aggregate over one-row-per-part partials."""

    def units(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(t["l_partkey"], pa.int64()),
                "u": pa.array(_li_units(t), pa.int64()),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    ).map_batches(units, batch_format="pyarrow", zero_copy_batch=True)
    folded = _int_sum_fold(li, ["u"]).materialize()  # one row per part
    total = int(folded.sum("u"))
    n_parts = int(folded.count())
    # exact big-int threshold: v integer and X = 13*total/(10*n_parts)
    # rational, so v > X  <=>  v >= floor(X) + 1 in every case
    thresh = 13 * total // (10 * n_parts) + 1 if n_parts else 0

    def keep(t: pa.Table) -> pa.Table:
        v = t["u"].to_numpy(zero_copy_only=False)
        if thresh > np.iinfo(np.int64).max:
            m = np.zeros(len(v), dtype=bool)
        else:
            m = v >= np.int64(thresh)
        sub = t.filter(pa.array(m))
        val = sub["u"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "p_partkey": sub["k"],
                "value": pa.array(round_away(val / 10000.0, 2),
                                  pa.float64()),
            }
        )

    out = folded.map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if out.empty:
        out = pd.DataFrame(
            {"p_partkey": pd.array([], dtype="int64"),
             "value": pd.array([], dtype="float64")}
        )
    return out.sort_values(
        ["value", "p_partkey"], ascending=[False, True]
    ).reset_index(drop=True)


SQL_IMPORTANT_PARTS = """
WITH v AS (
  SELECT l_partkey AS p_partkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS u
  FROM lineitem GROUP BY 1)
SELECT p_partkey, round(CAST(u AS DOUBLE) / 10000.0, 2) + 0 AS value
FROM v
WHERE 10 * u * (SELECT count(*) FROM v) > 13 * (SELECT sum(u) FROM v)
ORDER BY value DESC, p_partkey
"""


def q_or_brand_revenue(sf_dir: str):
    """TPC-H Q19 shape: revenue over three OR'd (brand, quantity-range,
    size-range) branches. Each branch's qualifying part-key set is
    tiny (one brand x bounded size) — built once, broadcast via
    ``ray.put``, membership per batch is a sorted ``np.isin``; every
    batch collapses to one int64 partial."""
    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    ).to_pandas()
    branches = [
        ("Brand#1", 1, 11, 1, 5),
        ("Brand#2", 10, 20, 1, 10),
        ("Brand#3", 20, 30, 1, 15),
    ]
    sets = []
    for brand, qlo, qhi, slo, shi in branches:
        m = (
            (part["p_brand"] == brand)
            & (part["p_size"] >= slo)
            & (part["p_size"] <= shi)
        )
        sets.append(np.sort(part.loc[m, "p_partkey"].to_numpy()))
    sets_ref = ray.put(sets)

    class Partial:
        def __init__(self):
            self.sets = ray.get(sets_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            k = t["l_partkey"].to_numpy(zero_copy_only=False)
            qty = t["l_quantity"].to_numpy(zero_copy_only=False)
            hit = np.zeros(len(k), bool)
            for (brand, qlo, qhi, _s, _e), pk in zip(branches, self.sets):
                hit |= np.isin(k, pk) & (qty >= qlo) & (qty <= qhi)
            sub = t.filter(pa.array(hit))
            u = _li_units(sub)
            return pa.table({"u": pa.array([int(u.sum())], pa.int64())})

    partials = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"],
    ).map_batches(Partial, concurrency=(1, 8), batch_format="pyarrow",
                  zero_copy_batch=True).to_pandas()
    u = int(partials["u"].sum())
    return pd.DataFrame(
        {"revenue_units": pd.array([u], dtype="int64"),
         "revenue": [round_away(float(u) / 10000.0, 2)]}
    )


SQL_OR_BRAND_REVENUE = """
WITH j AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS u
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11
         AND p_size BETWEEN 1 AND 5)
     OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20
         AND p_size BETWEEN 1 AND 10)
     OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30
         AND p_size BETWEEN 1 AND 15))
SELECT CAST(coalesce(sum(u), 0) AS BIGINT) AS revenue_units,
       round(CAST(coalesce(sum(u), 0) AS DOUBLE) / 10000.0, 2) + 0
           AS revenue
FROM j
"""


def _int_max_fold(ds, val_cols, P=32):
    """Exact per-key int64 MAX: same two-level shape as
    ``_int_sum_fold`` (in-batch combiner -> one coarse hash shuffle ->
    exact per-partition fold) with ``np.maximum.reduceat`` as the
    reducer. Max is associative/commutative, so the fold is
    partition-order-invariant."""
    schema = pa.schema(
        [("k", pa.int64())] + [(c, pa.int64()) for c in val_cols]
    )

    def combine(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return schema.empty_table()
        order = np.argsort(k, kind="stable")
        ks = k[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        cols = {"k": pa.array(ks[starts], pa.int64())}
        for c in val_cols:
            v = t[c].to_numpy(zero_copy_only=False)[order]
            cols[c] = pa.array(np.maximum.reduceat(v, starts), pa.int64())
        return pa.table(cols)

    def add_part(t: pa.Table) -> pa.Table:
        part = pc.cast(
            pc.bit_wise_and(t["k"], pa.scalar(P - 1, pa.int64())),
            pa.int32(),
        )
        return t.append_column("__part", part)

    return (
        ds.map_batches(combine, batch_format="pyarrow",
                       zero_copy_batch=True)
        .map_batches(add_part, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("__part")
        .map_groups(
            lambda g: combine(g.select(["k"] + val_cols)),
            batch_format="pyarrow",
        )
    )


def q_ship_priority(sf_dir: str):
    """TPC-H Q3 shape: top-10 highest-revenue orders not yet shipped
    at the cutoff, for one customer segment. The segment's customer
    keys are broadcast once (dimension-bounded); lineitem revenue is
    pre-folded per order (one row per order moves), hash-joined to the
    filtered orders, and the global top-10 is a per-batch partial
    top-10 + driver merge — no global sort."""
    cutoff = np.datetime64("1998-01-01", "us")
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda t: t.filter(
            pc.equal(t["c_mktsegment"], pa.scalar("BUILDING"))
        ).select(["c_custkey"]),
        batch_format="pyarrow",
    )
    ck = np.sort(
        np.concatenate(
            [
                b["c_custkey"].to_numpy(zero_copy_only=False)
                for b in cust.iter_batches(batch_format="pyarrow")
            ]
            or [np.empty(0, np.int64)]
        )
    )
    ck_ref = ray.put(ck)

    class OrderFilter:
        def __init__(self):
            self.ck = ray.get(ck_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ts = t["o_orderdate"].to_numpy(zero_copy_only=False)
            m = (ts < cutoff) & np.isin(
                t["o_custkey"].to_numpy(zero_copy_only=False), self.ck
            )
            sub = t.filter(pa.array(m))
            return pa.table(
                {
                    "k": pc.cast(sub["o_orderkey"], pa.int64()),
                    "o_orderdate": sub["o_orderdate"],
                }
            )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(OrderFilter, concurrency=(1, 4), batch_format="pyarrow",
                  zero_copy_batch=True)

    def units(t: pa.Table) -> pa.Table:
        ts = t["l_shipdate"].to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(ts > cutoff))
        return pa.table(
            {
                "k": pc.cast(sub["l_orderkey"], pa.int64()),
                "u": pa.array(_li_units(sub), pa.int64()),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice",
                 "l_discount"],
    ).map_batches(units, batch_format="pyarrow", zero_copy_batch=True)
    per_order = _int_sum_fold(li, ["u"])
    joined = per_order.join(orders, join_type="inner", num_partitions=8,
                            on=("k",))

    def partial_topk(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        k = t["k"].to_numpy(zero_copy_only=False)
        order = np.lexsort((k, -u))[:10]
        return t.take(pa.array(order))

    tops = joined.map_batches(
        partial_topk, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    tops = tops.sort_values(["u", "k"], ascending=[False, True]).head(10)
    return pd.DataFrame(
        {
            "l_orderkey": tops["k"].to_numpy(),
            "o_orderdate": tops["o_orderdate"].to_numpy(),
            "revenue": round_away(
                tops["u"].to_numpy().astype(np.float64) / 10000.0, 2
            ),
        }
    )


SQL_SHIP_PRIORITY = """
WITH r AS (
  SELECT l_orderkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS u
  FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-01-01' GROUP BY 1)
SELECT o_orderkey AS l_orderkey, o_orderdate,
       round(CAST(u AS DOUBLE) / 10000.0, 2) + 0 AS revenue
FROM r
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
ORDER BY u DESC, l_orderkey LIMIT 10
"""


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
               "5-LOW"]


def q_priority_count(sf_dir: str):
    """TPC-H Q4 shape: orders per priority that had at least one line
    shipped after the order date (the schema has no commit/receipt
    dates, so the EXISTS predicate is ``l_shipdate > o_orderdate``).
    The EXISTS collapses to a per-order MAX(shipdate) fold — one row
    per order moves — hash-joined to the quarter's orders; counts are
    5-bucket per-batch bincount partials."""
    lo = np.datetime64("1996-07-01", "us")
    hi = np.datetime64("1996-10-01", "us")

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(
        lambda t: pa.table(
            {
                "k": pc.cast(t["l_orderkey"], pa.int64()),
                "ship": pa.array(
                    t["l_shipdate"]
                    .to_numpy(zero_copy_only=False)
                    .astype("datetime64[us]")
                    .view(np.int64),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    max_ship = _int_max_fold(li, ["ship"])

    prio_arr = pa.array(_PRIORITIES, pa.string())

    def order_rows(t: pa.Table) -> pa.Table:
        ts = t["o_orderdate"].to_numpy(zero_copy_only=False)
        m = (ts >= lo) & (ts < hi)
        sub = t.filter(pa.array(m))
        idx = pc.index_in(sub["o_orderpriority"], value_set=prio_arr)
        return pa.table(
            {
                "k": pc.cast(sub["o_orderkey"], pa.int64()),
                "odate": pa.array(
                    sub["o_orderdate"]
                    .to_numpy(zero_copy_only=False)
                    .astype("datetime64[us]")
                    .view(np.int64),
                    pa.int64(),
                ),
                "prio": pc.cast(idx, pa.int64()),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(order_rows, batch_format="pyarrow", zero_copy_batch=True)

    joined = orders.join(max_ship, join_type="inner", num_partitions=8,
                         on=("k",))

    def counts(t: pa.Table) -> pa.Table:
        keep = (
            t["ship"].to_numpy(zero_copy_only=False)
            > t["odate"].to_numpy(zero_copy_only=False)
        )
        prio = t["prio"].to_numpy(zero_copy_only=False)[keep]
        c = np.bincount(prio, minlength=5).astype(np.int64)
        return pa.table(
            {
                "prio": pa.array(np.arange(5, dtype=np.int64)),
                "n": pa.array(c, pa.int64()),
            }
        )

    partials = joined.map_batches(
        counts, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    agg = partials.groupby("prio")["n"].sum().reset_index()
    agg = agg[agg["n"] > 0]
    return pd.DataFrame(
        {
            "o_orderpriority": [_PRIORITIES[i] for i in agg["prio"]],
            "order_count": pd.array(agg["n"].to_numpy(), dtype="int64"),
        }
    ).sort_values("o_orderpriority").reset_index(drop=True)


SQL_PRIORITY_COUNT = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate)
GROUP BY 1 ORDER BY 1
"""


def q_line_priority(sf_dir: str):
    """TPC-H Q12 shape: high- vs low-priority line counts per line
    status for one ship-year (the schema has no l_shipmode; the group
    key is l_linestatus). Lineitem collapses per batch to (order,
    status, count) combiner rows before the join — at most 2 rows per
    order per batch move — and the join output collapses to <=4
    partial rows per batch."""
    lo = np.datetime64("1997-01-01", "us")
    hi = np.datetime64("1998-01-01", "us")

    def li_rows(t: pa.Table) -> pa.Table:
        ts = t["l_shipdate"].to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array((ts >= lo) & (ts < hi)))
        k = sub["l_orderkey"].to_numpy(zero_copy_only=False)
        ls = (
            sub["l_linestatus"].to_numpy(zero_copy_only=False) == "F"
        ).astype(np.int64)
        pk = k * 2 + ls  # linestatus is binary; pack is collision-free
        order = np.argsort(pk, kind="stable")
        pks = pk[order]
        starts = np.flatnonzero(
            np.concatenate(([True], pks[1:] != pks[:-1]))
        )
        cnt = np.diff(np.append(starts, len(pks)))
        return pa.table(
            {
                "k": pa.array(pks[starts] >> 1, pa.int64()),
                "ls": pa.array(pks[starts] & 1, pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linestatus", "l_shipdate"],
    ).map_batches(li_rows, batch_format="pyarrow", zero_copy_batch=True)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
    ).map_batches(
        lambda t: pa.table(
            {
                "k": pc.cast(t["o_orderkey"], pa.int64()),
                "high": pc.cast(
                    pc.is_in(
                        t["o_orderpriority"],
                        value_set=pa.array(["1-URGENT", "2-HIGH"]),
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    joined = li.join(orders, join_type="inner", num_partitions=8,
                     on=("k",))

    def fold(t: pa.Table) -> pa.Table:
        ls = t["ls"].to_numpy(zero_copy_only=False)
        high = t["high"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        out_ls, out_high, out_cnt = [], [], []
        for s in (0, 1):
            for h in (0, 1):
                m = (ls == s) & (high == h)
                out_ls.append(s)
                out_high.append(h)
                out_cnt.append(int(cnt[m].sum()))
        return pa.table(
            {
                "ls": pa.array(out_ls, pa.int64()),
                "high": pa.array(out_high, pa.int64()),
                "n": pa.array(out_cnt, pa.int64()),
            }
        )

    partials = joined.map_batches(
        fold, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    agg = partials.groupby(["ls", "high"])["n"].sum().reset_index()
    rows = []
    for s, name in ((0, "O"), (1, "F")):
        hi_n = int(agg[(agg["ls"] == s) & (agg["high"] == 1)]["n"].sum())
        lo_n = int(agg[(agg["ls"] == s) & (agg["high"] == 0)]["n"].sum())
        if hi_n + lo_n > 0:
            rows.append((name, hi_n, lo_n))
    rows.sort()
    return pd.DataFrame(
        rows, columns=["l_linestatus", "high_line_count", "low_line_count"]
    ).astype(
        {"high_line_count": "int64", "low_line_count": "int64"}
    )


SQL_LINE_PRIORITY = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1 ORDER BY 1
"""


def q_product_profit(sf_dir: str):
    """TPC-H Q9 shape: profit by supplier nation and ship-year for one
    product family. No partsupp table, so supply cost is proxied at
    50% of p_retailprice; profit stays EXACT int64 units
    (``cents*(100-d) - 50*retail_cents*qty``). Part attrs and the
    supplier->nation map are broadcast once (dimension-bounded);
    every batch folds to at most nations x years combiner rows."""
    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name",
                                           "p_retailprice"]
    ).to_pandas()
    m = part["p_name"].str.contains("widget")
    pk = part.loc[m, "p_partkey"].to_numpy()
    order = np.argsort(pk)
    pk = pk[order]
    retail_cents = np.round(
        part.loc[m, "p_retailprice"].to_numpy()[order] * 100.0
    ).astype(np.int64)
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas().sort_values("s_suppkey")
    sk = supp["s_suppkey"].to_numpy()
    snat = supp["s_nationkey"].to_numpy().astype(np.int64)
    dims_ref = ray.put((pk, retail_cents, sk, snat))

    class Partial:
        def __init__(self):
            self.pk, self.rc, self.sk, self.snat = ray.get(dims_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            k = t["l_partkey"].to_numpy(zero_copy_only=False)
            m = np.isin(k, self.pk)
            sub = t.filter(pa.array(m))
            idx = np.searchsorted(self.pk, k[m])
            qty = (
                sub["l_quantity"].to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            units = _li_units(sub) - 50 * self.rc[idx] * qty
            sidx = np.searchsorted(
                self.sk, sub["l_suppkey"].to_numpy(zero_copy_only=False)
            )
            nat = self.snat[sidx]
            ts = sub["l_shipdate"].to_numpy(zero_copy_only=False)
            year = ts.astype("datetime64[Y]").astype(np.int64) + 1970
            return pa.table(
                {
                    "k": pa.array(nat * 10000 + year, pa.int64()),
                    "u": pa.array(units, pa.int64()),
                }
            )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate",
                 "l_extendedprice", "l_discount"],
    ).map_batches(Partial, concurrency=(1, 8), batch_format="pyarrow",
                  zero_copy_batch=True)
    folded = _int_sum_fold(li, ["u"]).to_pandas()  # nations x years rows
    nation = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    out = pd.DataFrame(
        {
            "n_name": [name[int(k) // 10000] for k in folded["k"]],
            "o_year": pd.array(
                folded["k"].to_numpy() % 10000, dtype="int64"
            ),
            "profit": round_away(
                folded["u"].to_numpy().astype(np.float64) / 10000.0, 2
            ),
        }
    )
    return out.sort_values(
        ["n_name", "o_year"], ascending=[True, False]
    ).reset_index(drop=True)


SQL_PRODUCT_PROFIT = """
SELECT n_name,
       CAST(year(l_shipdate) AS BIGINT) AS o_year,
       round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT))
                      - 50 * CAST(round(p_retailprice * 100) AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS DOUBLE)
             / 10000.0, 2) + 0 AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2 ORDER BY n_name, o_year DESC
"""


def q_volume_shipping(sf_dir: str):
    """TPC-H Q7 shape: revenue shipped between two nations, by
    direction and ship-year. Supplier- and customer-nation membership
    arrays are broadcast once; orders are PRE-FILTERED to the two
    nations' customers before the order-key hash join, so only
    qualifying rows shuffle; the final fold is (2 directions x years)
    combiner rows."""
    N1, N2 = "NATION_3", "NATION_8"
    lo = np.datetime64("1996-01-01", "us")
    hi = np.datetime64("1998-01-01", "us")
    nation = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    k1 = int(nation.loc[nation["n_name"] == N1, "n_nationkey"].iloc[0])
    k2 = int(nation.loc[nation["n_name"] == N2, "n_nationkey"].iloc[0])
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    s1 = np.sort(supp.loc[supp["s_nationkey"] == k1, "s_suppkey"].to_numpy())
    s2 = np.sort(supp.loc[supp["s_nationkey"] == k2, "s_suppkey"].to_numpy())
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    c1 = np.sort(cust.loc[cust["c_nationkey"] == k1, "c_custkey"].to_numpy())
    c2 = np.sort(cust.loc[cust["c_nationkey"] == k2, "c_custkey"].to_numpy())
    empty = pd.DataFrame(
        {
            "supp_nation": pd.array([], dtype="str"),
            "cust_nation": pd.array([], dtype="str"),
            "l_year": pd.array([], dtype="int64"),
            "revenue": pd.array([], dtype="float64"),
        }
    )
    # an entirely empty join side would reach Ray's hash-join with no
    # schema (Arrow can't resolve the key on a zero-column table) — and
    # the result is definitionally empty anyway
    if (len(s1) + len(s2) == 0) or (len(c1) + len(c2) == 0):
        return empty
    dims_ref = ray.put((s1, s2, c1, c2))

    class LiRows:
        def __init__(self):
            self.s1, self.s2, _c1, _c2 = ray.get(dims_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ts = t["l_shipdate"].to_numpy(zero_copy_only=False)
            sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
            in1 = np.isin(sk, self.s1)
            in2 = np.isin(sk, self.s2)
            m = (ts >= lo) & (ts < hi) & (in1 | in2)
            sub = t.filter(pa.array(m))
            year = (
                ts[m].astype("datetime64[Y]").astype(np.int64) + 1970
            )
            return pa.table(
                {
                    "k": pc.cast(sub["l_orderkey"], pa.int64()),
                    "snat": pa.array(
                        np.where(in1[m], 1, 2).astype(np.int64), pa.int64()
                    ),
                    "year": pa.array(year, pa.int64()),
                    "u": pa.array(_li_units(sub), pa.int64()),
                }
            )

    class OrdRows:
        def __init__(self):
            _s1, _s2, self.c1, self.c2 = ray.get(dims_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ck = t["o_custkey"].to_numpy(zero_copy_only=False)
            in1 = np.isin(ck, self.c1)
            in2 = np.isin(ck, self.c2)
            m = in1 | in2
            sub = t.filter(pa.array(m))
            return pa.table(
                {
                    "k": pc.cast(sub["o_orderkey"], pa.int64()),
                    "cnat": pa.array(
                        np.where(in1[m], 1, 2).astype(np.int64), pa.int64()
                    ),
                }
            )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
    ).map_batches(LiRows, concurrency=(1, 8), batch_format="pyarrow",
                  zero_copy_batch=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(OrdRows, concurrency=(1, 4), batch_format="pyarrow",
                  zero_copy_batch=True)
    joined = li.join(orders, join_type="inner", num_partitions=8,
                     on=("k",))

    def fold(t: pa.Table) -> pa.Table:
        snat = t["snat"].to_numpy(zero_copy_only=False)
        cnat = t["cnat"].to_numpy(zero_copy_only=False)
        keep = snat != cnat
        pk = (
            snat[keep] * 10000
            + t["year"].to_numpy(zero_copy_only=False)[keep]
        )
        u = t["u"].to_numpy(zero_copy_only=False)[keep]
        if len(pk) == 0:
            return pa.schema(
                [("k", pa.int64()), ("u", pa.int64())]
            ).empty_table()
        order = np.argsort(pk, kind="stable")
        pks = pk[order]
        starts = np.flatnonzero(np.concatenate(([True], pks[1:] != pks[:-1])))
        return pa.table(
            {
                "k": pa.array(pks[starts], pa.int64()),
                "u": pa.array(np.add.reduceat(u[order], starts), pa.int64()),
            }
        )

    folded = _int_sum_fold(
        joined.map_batches(fold, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["u"],
    ).to_pandas()
    if folded.empty:
        return empty
    snat_idx = folded["k"].to_numpy() // 10000
    out = pd.DataFrame(
        {
            "supp_nation": np.where(snat_idx == 1, N1, N2),
            "cust_nation": np.where(snat_idx == 1, N2, N1),
            "l_year": pd.array(
                folded["k"].to_numpy() % 10000, dtype="int64"
            ),
            "revenue": round_away(
                folded["u"].to_numpy().astype(np.float64) / 10000.0, 2
            ),
        }
    )
    return out.sort_values(
        ["supp_nation", "cust_nation", "l_year"]
    ).reset_index(drop=True)


SQL_VOLUME_SHIPPING = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                  AS DOUBLE) / 10000.0, 2) + 0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
       OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q_min_cost_supplier(sf_dir: str):
    """TPC-H Q2 shape: for each part of one size, the supplier
    offering the minimum price (ties -> lowest supplier key). No
    partsupp table, so the offer book is lineitem's observed
    (part, supplier, extendedprice cents). The argmin is an
    associative per-key extreme-row fold — in-batch lexsort takes one
    candidate row per part, one coarse hash shuffle folds candidates
    exactly; supplier names resolve driver-side from the dimension."""
    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"]
    ).to_pandas()
    pk = np.sort(part.loc[part["p_size"] == 5, "p_partkey"].to_numpy())
    pk_ref = ray.put(pk)

    class Candidates:
        def __init__(self):
            self.pk = ray.get(pk_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            k = t["l_partkey"].to_numpy(zero_copy_only=False)
            m = np.isin(k, self.pk)
            sub = t.filter(pa.array(m))
            cents = np.round(
                sub["l_extendedprice"].to_numpy(zero_copy_only=False)
                * 100.0
            ).astype(np.int64)
            sk = sub["l_suppkey"].to_numpy(zero_copy_only=False)
            kk = k[m]
            order = np.lexsort((sk, cents, kk))
            kks = kk[order]
            starts = np.flatnonzero(
                np.concatenate(([True], kks[1:] != kks[:-1]))
            )
            return pa.table(
                {
                    "k": pa.array(kks[starts], pa.int64()),
                    "cents": pa.array(cents[order][starts], pa.int64()),
                    "s": pa.array(sk[order][starts], pa.int64()),
                }
            )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    ).map_batches(Candidates, concurrency=(1, 8), batch_format="pyarrow",
                  zero_copy_batch=True)
    P = 32

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__part",
            pc.cast(pc.bit_wise_and(t["k"], pa.scalar(P - 1, pa.int64())),
                    pa.int32()),
        )

    def fold_partition(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy(zero_copy_only=False)
        cents = g["cents"].to_numpy(zero_copy_only=False)
        s = g["s"].to_numpy(zero_copy_only=False)
        order = np.lexsort((s, cents, k))
        ks = k[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        return pa.table(
            {
                "k": pa.array(ks[starts], pa.int64()),
                "cents": pa.array(cents[order][starts], pa.int64()),
                "s": pa.array(s[order][starts], pa.int64()),
            }
        )

    folded = (
        li.map_batches(add_part, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("__part")
        .map_groups(
            lambda g: fold_partition(g.select(["k", "cents", "s"])),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).to_pandas()
    out = folded.merge(supp, left_on="s", right_on="s_suppkey")
    out["min_price"] = round_away(
        out["cents"].to_numpy().astype(np.float64) / 100.0, 2
    )
    out = out.rename(columns={"k": "p_partkey"})
    return (
        out[["p_partkey", "s_suppkey", "s_name", "min_price"]]
        .sort_values("p_partkey")
        .reset_index(drop=True)
    )


SQL_MIN_COST_SUPPLIER = """
WITH l AS (
  SELECT l_partkey,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS c, l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_size = 5),
 m AS (SELECT l_partkey, min(c) AS mc FROM l GROUP BY 1),
 w AS (SELECT l.l_partkey, mc, min(l_suppkey) AS s
       FROM l JOIN m ON l.l_partkey = m.l_partkey AND l.c = m.mc
       GROUP BY 1, 2)
SELECT w.l_partkey AS p_partkey, w.s AS s_suppkey, s_name,
       round(CAST(mc AS DOUBLE) / 100.0, 2) + 0 AS min_price
FROM w JOIN supplier ON w.s = s_suppkey
ORDER BY p_partkey
"""


def q_promo_suppliers(sf_dir: str):
    """TPC-H Q20 shape: suppliers who moved more than a threshold
    quantity of any 'small%' part in one ship-year (the nested
    EXISTS-over-partsupp becomes a per-(supplier, part) quantity fold
    — the schema has no partsupp). The two-column group key is NOT
    packed into one int64 (part keys are unbounded at corpus scale);
    the combiner lexsorts (s, p) pairs and the shuffle partitions on a
    mixed hash of both."""
    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    ).to_pandas()
    pk = np.sort(
        part.loc[part["p_name"].str.startswith("small"),
                 "p_partkey"].to_numpy()
    )
    pk_ref = ray.put(pk)
    lo = np.datetime64("1997-01-01", "us")
    hi = np.datetime64("1998-01-01", "us")
    schema = pa.schema(
        [("s", pa.int64()), ("p", pa.int64()), ("q", pa.int64())]
    )

    def combine2(s, p, q):
        if len(s) == 0:
            return schema.empty_table()
        order = np.lexsort((p, s))
        ss, ps, qs = s[order], p[order], q[order]
        new = np.concatenate(
            ([True], (ss[1:] != ss[:-1]) | (ps[1:] != ps[:-1]))
        )
        starts = np.flatnonzero(new)
        return pa.table(
            {
                "s": pa.array(ss[starts], pa.int64()),
                "p": pa.array(ps[starts], pa.int64()),
                "q": pa.array(np.add.reduceat(qs, starts), pa.int64()),
            }
        )

    class LiPairs:
        def __init__(self):
            self.pk = ray.get(pk_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ts = t["l_shipdate"].to_numpy(zero_copy_only=False)
            k = t["l_partkey"].to_numpy(zero_copy_only=False)
            m = (ts >= lo) & (ts < hi) & np.isin(k, self.pk)
            sub = t.filter(pa.array(m))
            return combine2(
                sub["l_suppkey"].to_numpy(zero_copy_only=False),
                k[m],
                sub["l_quantity"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            )

    P = 32

    def add_part(t: pa.Table) -> pa.Table:
        mixed = pc.bit_wise_xor(
            t["s"], pc.multiply(t["p"], pa.scalar(2654435761, pa.int64()))
        )
        return t.append_column(
            "__part",
            pc.cast(pc.bit_wise_and(mixed, pa.scalar(P - 1, pa.int64())),
                    pa.int32()),
        )

    folded = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        )
        .map_batches(LiPairs, concurrency=(1, 8), batch_format="pyarrow",
                     zero_copy_batch=True)
        .map_batches(add_part, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("__part")
        .map_groups(
            lambda g: combine2(
                g["s"].to_numpy(zero_copy_only=False),
                g["p"].to_numpy(zero_copy_only=False),
                g["q"].to_numpy(zero_copy_only=False),
            ),
            batch_format="pyarrow",
        )
        .map_batches(
            lambda t: t.filter(
                pc.greater(t["q"], pa.scalar(60, pa.int64()))
            ).select(["s"]),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    winners = np.unique(folded["s"].to_numpy())  # tiny: distinct suppliers
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).to_pandas()
    out = supp[supp["s_suppkey"].isin(winners)]
    return (
        out[["s_suppkey", "s_name"]]
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )


SQL_PROMO_SUPPLIERS = """
WITH pk AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
 agg AS (
  SELECT l_suppkey, l_partkey, sum(CAST(l_quantity AS BIGINT)) AS q
  FROM lineitem JOIN pk ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY 1, 2)
SELECT DISTINCT s_suppkey, s_name
FROM agg JOIN supplier ON l_suppkey = s_suppkey
WHERE q > 60 ORDER BY s_suppkey
"""


def q_waiting_suppliers(sf_dir: str):
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier on a
    finished multi-supplier order ("late" adapts to ``l_shipdate >
    o_orderdate + 30 days`` — the schema has no commit/receipt dates).
    Per batch, lines collapse to distinct (order, supplier,
    late-flag) pairs; one order-key shuffle later each partition
    resolves the EXISTS / NOT-EXISTS pair exactly with reduceat folds
    — no correlated subqueries, no per-order Python."""
    late_us = np.int64(30 * 86400 * 1_000_000)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_orderdate"],
    ).map_batches(
        lambda t: (
            lambda sub: pa.table(
                {
                    "k": pc.cast(sub["o_orderkey"], pa.int64()),
                    "odate": pa.array(
                        sub["o_orderdate"]
                        .to_numpy(zero_copy_only=False)
                        .astype("datetime64[us]")
                        .view(np.int64),
                        pa.int64(),
                    ),
                }
            )
        )(t.filter(pc.equal(t["o_orderstatus"], pa.scalar("F")))),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    ).map_batches(
        lambda t: pa.table(
            {
                "k": pc.cast(t["l_orderkey"], pa.int64()),
                "s": pc.cast(t["l_suppkey"], pa.int64()),
                "ship": pa.array(
                    t["l_shipdate"]
                    .to_numpy(zero_copy_only=False)
                    .astype("datetime64[us]")
                    .view(np.int64),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    joined = li.join(orders, join_type="inner", num_partitions=8,
                     on=("k",))

    pair_schema = pa.schema(
        [("k", pa.int64()), ("s", pa.int64()), ("late", pa.int64())]
    )

    def pair_combine(k, s, late):
        """Distinct (order, supplier) with late = any-line-late."""
        if len(k) == 0:
            return pair_schema.empty_table()
        order = np.lexsort((s, k))
        ks, ss, ls = k[order], s[order], late[order]
        new = np.concatenate(
            ([True], (ks[1:] != ks[:-1]) | (ss[1:] != ss[:-1]))
        )
        starts = np.flatnonzero(new)
        return pa.table(
            {
                "k": pa.array(ks[starts], pa.int64()),
                "s": pa.array(ss[starts], pa.int64()),
                "late": pa.array(
                    np.maximum.reduceat(ls, starts), pa.int64()
                ),
            }
        )

    def batch_pairs(t: pa.Table) -> pa.Table:
        late = (
            t["ship"].to_numpy(zero_copy_only=False)
            > t["odate"].to_numpy(zero_copy_only=False) + late_us
        ).astype(np.int64)
        return pair_combine(
            t["k"].to_numpy(zero_copy_only=False),
            t["s"].to_numpy(zero_copy_only=False),
            late,
        )

    P = 32

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__part",
            pc.cast(pc.bit_wise_and(t["k"], pa.scalar(P - 1, pa.int64())),
                    pa.int32()),
        )

    def resolve(g: pa.Table) -> pa.Table:
        t = pair_combine(
            g["k"].to_numpy(zero_copy_only=False),
            g["s"].to_numpy(zero_copy_only=False),
            g["late"].to_numpy(zero_copy_only=False),
        )
        k = t["k"].to_numpy(zero_copy_only=False)
        s = t["s"].to_numpy(zero_copy_only=False)
        late = t["late"].to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return pa.schema([("w", pa.int64())]).empty_table()
        starts = np.flatnonzero(
            np.concatenate(([True], k[1:] != k[:-1]))
        )
        ns = np.diff(np.append(starts, len(k)))
        nl = np.add.reduceat(late, starts)
        # the sole late supplier: max over (late * s) per order
        ls = np.maximum.reduceat(late * s, starts)
        keep = (ns >= 2) & (nl == 1)
        return pa.table({"w": pa.array(ls[keep], pa.int64())})

    waits = (
        joined.map_batches(batch_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)
        .map_batches(add_part, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("__part")
        .map_groups(
            lambda g: resolve(g.select(["k", "s", "late"])),
            batch_format="pyarrow",
        )
        .map_batches(
            lambda t: pa.table(
                {"k": t["w"],
                 "n": pa.array(np.ones(len(t), np.int64), pa.int64())}
            ),
            batch_format="pyarrow",
        )
    )
    per_supp = _int_sum_fold(waits, ["n"]).to_pandas()
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).to_pandas()
    out = per_supp.merge(supp, left_on="k", right_on="s_suppkey")
    out = out.rename(columns={"n": "numwait"})
    return (
        out[["s_name", "numwait"]]
        .astype({"numwait": "int64"})
        .sort_values(["numwait", "s_name"], ascending=[False, True])
        .reset_index(drop=True)
    )


SQL_WAITING_SUPPLIERS = """
WITH pairs AS (
  SELECT l_orderkey AS k, l_suppkey AS s,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F' GROUP BY 1, 2),
 q AS (SELECT k, count(*) AS ns, sum(late) AS nl,
              max(CASE WHEN late = 1 THEN s END) AS ls
       FROM pairs GROUP BY 1)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM q JOIN supplier ON ls = s_suppkey
WHERE ns >= 2 AND nl = 1
GROUP BY 1 ORDER BY numwait DESC, s_name
"""


def q_golden_record(sf_dir: str):
    """ER survivorship: consolidate each user's event records into one
    golden row — count, first-seen, modal event type (ties ->
    lexicographically smallest), the props payload of the most recent
    event (ts desc, event_id desc), and the exact fixed-point value
    total. One key-hash shuffle of per-(user, event-type) combiner
    partials; see ``relops.golden_record``."""
    from ..relops import golden_record

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "ts", "event_id", "props",
                 "value"],
    )
    out = golden_record(
        ev, key_col="user_id", mode_col="event_type", ts_col="ts",
        latest_col="props", tie_col="event_id", value_col="value",
    ).to_pandas()
    out["total_value"] = round_away(
        out.pop("sum_units").to_numpy().astype(np.float64) / 1e6, 6
    )
    return out.sort_values("user_id").reset_index(drop=True)


SQL_GOLDEN_RECORD = """
WITH ev AS (
  SELECT user_id, event_type, ts, event_id, props,
         CAST(round(value * 1000000) AS BIGINT) AS v
  FROM events),
 base AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_rows,
                 min(ts) AS first_ts, sum(v) AS sv
          FROM ev GROUP BY 1),
 tc AS (SELECT user_id, event_type, count(*) AS cnt
        FROM ev GROUP BY 1, 2),
 top AS (SELECT user_id, event_type AS top_event_type FROM
         (SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY cnt DESC, event_type) rn
          FROM tc) WHERE rn = 1),
 lastp AS (SELECT user_id, props AS last_props FROM
           (SELECT user_id, props,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) rn
            FROM ev) WHERE rn = 1)
SELECT b.user_id, n_rows, first_ts, top_event_type, last_props,
       round(CAST(sv AS DOUBLE) / 1000000.0, 6) + 0 AS total_value
FROM base b JOIN top USING (user_id) JOIN lastp USING (user_id)
ORDER BY user_id
"""


def q_meta_blocking(sf_dir: str):
    """Weighted-node-pruned meta-blocking over the documents table:
    bigram token blocks -> purge -> CBS pair weights -> keep pairs
    reaching either endpoint's mean neighborhood weight (exact integer
    compare). See ``block.meta_blocking``."""
    from ..block import meta_blocking

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = meta_blocking(docs).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


SQL_META_BLOCKING = """
WITH c AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+',
                                          ' ', 'g')), ' ') AS L
  FROM documents),
 bg AS (SELECT DISTINCT doc_id, L[i] || '_' || L[i + 1] AS tok
        FROM c, unnest(range(1, len(L))) AS t(i)),
 keep AS (SELECT tok FROM bg GROUP BY tok
          HAVING count(*) BETWEEN 2 AND 20),
 tk AS (SELECT doc_id, tok FROM bg JOIN keep USING (tok)),
 pairs AS (SELECT x.doc_id AS a, y.doc_id AS b,
                  CAST(count(*) AS BIGINT) AS cbs
           FROM tk x JOIN tk y ON x.tok = y.tok AND x.doc_id < y.doc_id
           GROUP BY 1, 2),
 nodes AS (SELECT node, sum(cbs) AS s, count(*) AS deg FROM
           (SELECT a AS node, cbs FROM pairs
            UNION ALL SELECT b AS node, cbs FROM pairs)
           GROUP BY 1)
SELECT a, b, cbs FROM pairs
JOIN nodes na ON na.node = pairs.a
JOIN nodes nb ON nb.node = pairs.b
WHERE cbs * na.deg >= na.s OR cbs * nb.deg >= nb.s
ORDER BY a, b
"""


def q_dl_pairs(sf_dir: str):
    """Blocked Damerau-Levenshtein name-similarity join over part
    names (TRUE unrestricted DL, kernel fuzz-verified bitwise against
    DuckDB). See ``dedup.dl_pairs``."""
    from ..dedup import dl_pairs

    parts = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    )
    out = dl_pairs(parts).to_pandas()
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


SQL_DL_PAIRS = """
SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
       CAST(damerau_levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM part a JOIN part b
  ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
 AND a.p_partkey < b.p_partkey
WHERE damerau_levenshtein(a.p_name, b.p_name) <= 3
ORDER BY a_id, b_id
"""


def q_rand_index(sf_dir: str):
    """Adjusted Rand Index (Hubert-Arabie) between the embeddings'
    ground-truth labels and an equi-depth NTILE(4) clustering of the
    first embedding dimension — the pair-counting external cluster
    quality metric alongside B-cubed. All pair counts are exact int64
    from a (label, tile) contingency fold (`n*(n-1)/2` is always
    even); only the final ARI ratio is floating point, mirrored
    op-for-op by the SQL."""
    from ..relops import global_ntile

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding",
                                                 "label"]
    ).map_batches(
        lambda t: pa.table(
            {
                "vec_id": t["vec_id"],
                "label": pc.cast(t["label"], pa.int64()),
                "e0": pc.cast(
                    pc.list_element(t["embedding"], 0), pa.float64()
                ),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    tiled = global_ntile(emb, "e0", "vec_id", k=4)

    def contingency(t: pa.Table) -> pa.Table:
        lab = t["label"].to_numpy(zero_copy_only=False)
        tile = t["tile"].to_numpy(zero_copy_only=False)
        pk = lab * 16 + tile  # tile in 1..4; labels are small ints
        u, cnt = np.unique(pk, return_counts=True)
        return pa.table(
            {
                "k": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    ct = _int_sum_fold(
        tiled.map_batches(contingency, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["n"],
    ).to_pandas()  # labels x 4 rows — tiny
    lab = ct["k"].to_numpy() // 16
    n = ct["n"].to_numpy()
    sij = int((n * (n - 1) // 2).sum())
    ra = pd.Series(n).groupby(lab).sum().to_numpy()
    rb = pd.Series(n).groupby(ct["k"].to_numpy() % 16).sum().to_numpy()
    sa = int((ra * (ra - 1) // 2).sum())
    sb = int((rb * (rb - 1) // 2).sum())
    tot = int(n.sum())
    ncr = float(tot) * float(tot - 1) / 2.0
    exp = float(sa) * float(sb) / ncr
    ari = (float(sij) - exp) / ((float(sa) + float(sb)) / 2.0 - exp)
    return pd.DataFrame(
        {
            "ari": [round_away(ari, 6)],
            "sij": pd.array([sij], dtype="int64"),
            "sum_a": pd.array([sa], dtype="int64"),
            "sum_b": pd.array([sb], dtype="int64"),
            "n_items": pd.array([tot], dtype="int64"),
        }
    )


SQL_RAND_INDEX = """
WITH e AS (SELECT vec_id, label,
                  CAST(embedding[1] AS DOUBLE) AS e0 FROM embeddings),
 r AS (SELECT label, ntile(4) OVER (ORDER BY e0, vec_id) AS nt FROM e),
 ct AS (SELECT label, nt, CAST(count(*) AS BIGINT) AS n
        FROM r GROUP BY 1, 2),
 s AS (SELECT CAST(sum(n * (n - 1) / 2) AS BIGINT) AS sij FROM ct),
 sa AS (SELECT CAST(sum(n * (n - 1) / 2) AS BIGINT) AS v FROM
        (SELECT sum(n) AS n FROM ct GROUP BY label)),
 sb AS (SELECT CAST(sum(n * (n - 1) / 2) AS BIGINT) AS v FROM
        (SELECT sum(n) AS n FROM ct GROUP BY nt)),
 t AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM ct)
SELECT round((CAST(sij AS DOUBLE)
              - CAST(sa.v AS DOUBLE) * CAST(sb.v AS DOUBLE)
                / (CAST(t.n AS DOUBLE) * CAST(t.n - 1 AS DOUBLE) / 2.0))
             / ((CAST(sa.v AS DOUBLE) + CAST(sb.v AS DOUBLE)) / 2.0
                - CAST(sa.v AS DOUBLE) * CAST(sb.v AS DOUBLE)
                  / (CAST(t.n AS DOUBLE) * CAST(t.n - 1 AS DOUBLE)
                     / 2.0)), 6) + 0 AS ari,
       sij, sa.v AS sum_a, sb.v AS sum_b, t.n AS n_items
FROM s, sa, sb, t
"""


def q_pair_features(sf_dir: str):
    """ER matcher feature vectors over blocked part-name pairs: byte
    Jaccard, Jaro-Winkler, Levenshtein, length ratio. See
    ``dedup.pair_features``; every kernel is batch-vectorized and
    verified against the matching DuckDB function."""
    from ..dedup import pair_features

    parts = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    )
    out = pair_features(parts).to_pandas()
    for c in ("jac", "jw", "len_ratio"):
        out[c] = round_away(out[c].to_numpy(), 6)
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


SQL_PAIR_FEATURES = """
SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
       round(jaccard(a.p_name, b.p_name), 6) + 0 AS jac,
       round(jaro_winkler_similarity(a.p_name, b.p_name), 6) + 0 AS jw,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev,
       round(CAST(least(length(a.p_name), length(b.p_name)) AS DOUBLE)
             / CAST(greatest(length(a.p_name), length(b.p_name))
                    AS DOUBLE), 6) + 0 AS len_ratio
FROM part a JOIN part b
  ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
 AND a.p_partkey < b.p_partkey
ORDER BY a_id, b_id
"""


def q_stable_match(sf_dir: str):
    """Distributed Gale-Shapley 1:1 assignment composed on top of the
    Fellegi-Sunter linkage scores: candidate pairs restricted to the
    bipartite even->odd doc split (two "sources"), proposer side =
    even ids, preferences (FS score desc, id asc). Rows-only by design
    — deferred acceptance has no SQL form; conformance is pinned by
    `tests/test_evaluate.py::test_stable_matching_equals_gale_shapley_and_is_stable`
    (uniqueness of the proposer-optimal matching + no-blocking-pair
    audit)."""
    from ..block import sorted_neighborhood_pairs
    from ..evaluate import fellegi_sunter, stable_matching

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    pairs = sorted_neighborhood_pairs(
        docs, "doc_id", "text", window=3, prefix_len=8
    )
    scored = fellegi_sunter(
        pairs,
        docs.select_columns(["doc_id", "lang", "source", "n_chars"]),
        "doc_id",
        {"lang": (1.15268, -2.639057), "source": (1.280934, -2.014903)},
        len_field=("n_chars", (1.446919, -1.673976)),
    )

    def bipartite(t: pa.Table) -> pa.Table:
        a = t["a_id"].to_numpy(zero_copy_only=False)
        b = t["b_id"].to_numpy(zero_copy_only=False)
        s = t["score"].to_numpy(zero_copy_only=False)
        # orient every even-odd pair as (even proposer, odd receiver)
        keep = (a % 2) != (b % 2)
        a, b, s = a[keep], b[keep], s[keep]
        ev = np.where(a % 2 == 0, a, b)
        od = np.where(a % 2 == 0, b, a)
        return pa.table(
            {
                "a_id": pa.array(ev, pa.int64()),
                "b_id": pa.array(od, pa.int64()),
                "score": pa.array(s, pa.float64()),
            }
        )

    bip = scored.map_batches(
        bipartite, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # pin: the round loop must not re-run SNM + FS
    out = stable_matching(bip).to_pandas()
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


def q_monge_elkan(sf_dir: str):
    """Monge-Elkan token-level similarity (best-JW-per-token mean, both
    directions) over first-word-blocked part-name pairs — the
    reorder-tolerant hybrid matcher feature. See
    ``dedup.monge_elkan_pairs``; one shuffle, one flat JW kernel call
    per partition."""
    from ..dedup import monge_elkan_pairs

    parts = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    )
    out = monge_elkan_pairs(parts).to_pandas()
    for c in ("me_ab", "me_ba"):
        out[c] = round_away(out[c].to_numpy(), 6)
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


SQL_MONGE_ELKAN = """
SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
       round(list_sum([list_max([jaro_winkler_similarity(ta, tb)
                                 for tb in string_split(b.p_name, ' ')])
                       for ta in string_split(a.p_name, ' ')])
             / len(string_split(a.p_name, ' ')), 6) + 0 AS me_ab,
       round(list_sum([list_max([jaro_winkler_similarity(tb, ta)
                                 for ta in string_split(a.p_name, ' ')])
                       for tb in string_split(b.p_name, ' ')])
             / len(string_split(b.p_name, ' ')), 6) + 0 AS me_ba
FROM part a JOIN part b
  ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
 AND a.p_partkey < b.p_partkey
ORDER BY a_id, b_id
"""


def q_fd_violations(sf_dir: str):
    """Functional-dependency violation profiling — for each candidate
    FD ``X -> Y`` report how many X keys exist, how many are violated
    (>1 distinct Y), and the worst fan-out. The schema-discovery /
    data-quality pass a linkage pipeline runs BEFORE trusting a column
    as a blocking or survivorship key.

    Scale shape: one ``relops.grouped_distinct_count`` per FD (in-batch
    distinct-pair combiner, ONE two-int64-column shuffle each), then a
    per-batch partial fold of the tiny (key, cnt) stream — the driver
    only ever sees O(batches) 4-int rows per FD."""
    from ..relops import grouped_distinct_count

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t["o_custkey"],
                "prio": pc.cast(
                    pc.utf8_slice_codeunits(t["o_orderpriority"], 0, 1),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    specs = [
        ("l_orderkey->l_suppkey", li, "l_orderkey", "l_suppkey"),
        ("l_partkey->l_suppkey", li, "l_partkey", "l_suppkey"),
        ("o_custkey->o_priority", orders, "o_custkey", "prio"),
    ]

    def fold_partial(t: pa.Table) -> pa.Table:
        c = t["distinct_cnt"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_keys": pa.array([len(c)], pa.int64()),
                "n_violating": pa.array([int((c > 1).sum())], pa.int64()),
                "max_distinct": pa.array(
                    [int(c.max()) if len(c) else 0], pa.int64()
                ),
            }
        )

    rows = []
    for name, ds, k, v in specs:
        parts = (
            grouped_distinct_count(ds, k, v)
            .map_batches(
                fold_partial, batch_format="pyarrow", zero_copy_batch=True
            )
            .to_pandas()
        )
        rows.append(
            {
                "fd": name,
                "n_keys": int(parts["n_keys"].sum()),
                "n_violating": int(parts["n_violating"].sum()),
                "max_distinct": int(parts["max_distinct"].max()),
            }
        )
    return pd.DataFrame(rows).sort_values("fd").reset_index(drop=True)


SQL_FD_VIOLATIONS = """
WITH f1 AS (SELECT l_orderkey AS k, count(DISTINCT l_suppkey) AS c
            FROM lineitem GROUP BY 1),
f2 AS (SELECT l_partkey AS k, count(DISTINCT l_suppkey) AS c
       FROM lineitem GROUP BY 1),
f3 AS (SELECT o_custkey AS k,
              count(DISTINCT CAST(substr(o_orderpriority, 1, 1) AS BIGINT))
                AS c
       FROM orders GROUP BY 1)
SELECT * FROM (
  SELECT 'l_orderkey->l_suppkey' AS fd, count(*) AS n_keys,
         sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS n_violating,
         max(c) AS max_distinct FROM f1
  UNION ALL
  SELECT 'l_partkey->l_suppkey', count(*),
         sum(CASE WHEN c > 1 THEN 1 ELSE 0 END), max(c) FROM f2
  UNION ALL
  SELECT 'o_custkey->o_priority', count(*),
         sum(CASE WHEN c > 1 THEN 1 ELSE 0 END), max(c) FROM f3
) ORDER BY fd
"""


def q_iqr_outliers(sf_dir: str):
    """Per-priority Tukey-fence outlier profile of order totals: exact
    Q1/Q3 (``quantile_disc`` semantics) in int64 cents, then one
    streaming pass counting/summing values outside
    ``[Q1 - 1.5*IQR, Q3 + 1.5*IQR]``. The fence comparison is doubled
    into pure integer arithmetic (``2v < 2*q1 - 3*iqr``), so the whole
    query is order/partition-invariant exact math.

    Scale shape: quantiles via ``quantile.grouped_quantiles`` (5
    bounded keys — for whale keys the documented path is
    ``exact_quantiles`` per key), fences (10 tiny rows) close over the
    second pass's batch fn, which emits per-batch per-key partials —
    two streaming reads, no row-level materialization."""
    from ..quantile import grouped_quantiles

    def prep(t: pa.Table) -> pa.Table:
        cents = round_away(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        return pa.table(
            {
                "prio": pc.cast(
                    pc.utf8_slice_codeunits(t["o_orderpriority"], 0, 1),
                    pa.int64(),
                ),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    def orders_ds():
        return ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderpriority", "o_totalprice"],
        ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    qt = grouped_quantiles(
        orders_ds(), "prio", "cents", qs=(0.25, 0.75)
    ).to_pandas()
    q1 = {
        int(r["prio"]): int(r["value"])
        for _, r in qt[qt["q"] == 0.25].iterrows()
    }
    q3 = {
        int(r["prio"]): int(r["value"])
        for _, r in qt[qt["q"] == 0.75].iterrows()
    }
    prios = np.array(sorted(q1), dtype=np.int64)
    lo2 = np.array([2 * q1[p] - 3 * (q3[p] - q1[p]) for p in prios])
    hi2 = np.array([2 * q3[p] + 3 * (q3[p] - q1[p]) for p in prios])

    def partials(t: pa.Table) -> pa.Table:
        p = t["prio"].to_numpy(zero_copy_only=False)
        c = t["cents"].to_numpy(zero_copy_only=False)
        pi = np.searchsorted(prios, p)
        out = (2 * c < lo2[pi]) | (2 * c > hi2[pi])
        n = np.bincount(pi, weights=out, minlength=len(prios)).astype(
            np.int64
        )
        # int64 scatter-add for the cent sums (float-weighted bincount is
        # exact only below 2^53 per batch-key sum); the 0/1 outlier count
        # above cannot overflow a float64 at any batch size
        s = np.zeros(len(prios), dtype=np.int64)
        np.add.at(s, pi, np.where(out, c, 0))
        return pa.table(
            {
                "prio": pa.array(prios, pa.int64()),
                "n_out": pa.array(n, pa.int64()),
                "out_cents": pa.array(s, pa.int64()),
            }
        )

    folded = (
        orders_ds()
        .map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby("prio", as_index=False)
        .sum()
    )
    folded["q1_c"] = [q1[p] for p in folded["prio"]]
    folded["q3_c"] = [q3[p] for p in folded["prio"]]
    cols = ["prio", "q1_c", "q3_c", "n_out", "out_cents"]
    return folded[cols].sort_values("prio").reset_index(drop=True)


SQL_IQR_OUTLIERS = """
WITH o AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS c
           FROM orders),
q AS (SELECT prio, CAST(quantile_disc(c, 0.25) AS BIGINT) AS q1_c,
             CAST(quantile_disc(c, 0.75) AS BIGINT) AS q3_c
      FROM o GROUP BY prio)
SELECT o.prio, q1_c, q3_c,
       sum(CASE WHEN 2 * c < 2 * q1_c - 3 * (q3_c - q1_c)
                  OR 2 * c > 2 * q3_c + 3 * (q3_c - q1_c)
                THEN 1 ELSE 0 END) AS n_out,
       coalesce(sum(CASE WHEN 2 * c < 2 * q1_c - 3 * (q3_c - q1_c)
                           OR 2 * c > 2 * q3_c + 3 * (q3_c - q1_c)
                         THEN c END), 0) AS out_cents
FROM o JOIN q USING (prio)
GROUP BY o.prio, q1_c, q3_c
ORDER BY prio
"""


def _mutual_knn_edges(sf_dir: str) -> "ray.data.Dataset":
    """Unique (a < b) mutual-5NN edges over all embeddings — the shared
    graph input of `triangle_count` / `kcore` / `jaccard_links`
    (routed exact search + both-endpoint pair confirmation)."""
    from ..dedup import dedup_pair_rows
    from ..search import knn_search, shard_refs_from_dataset

    ds = _emb_ds(sf_dir)
    shards, _, _ = shard_refs_from_dataset(ds)
    knn = knn_search(ds, shards, k=5, exclude_self=True)

    def to_pairs(t: pa.Table) -> pa.Table:
        q = t["query_id"].to_numpy(zero_copy_only=False)
        ids_col = t["neigh_ids"].combine_chunks()
        kk = len(ids_col[0]) if len(ids_col) else 0
        ids = ids_col.values.to_numpy(zero_copy_only=False).reshape(
            len(q), kk
        )
        keep = (ids >= 0).ravel()
        a = np.repeat(q, kk)[keep]
        b = ids.ravel()[keep]
        return pa.table(
            {
                "a": pa.array(np.minimum(a, b), pa.int64()),
                "b": pa.array(np.maximum(a, b), pa.int64()),
            }
        )

    directed = knn.map_batches(
        to_pairs, batch_format="pyarrow", zero_copy_batch=True
    )
    return dedup_pair_rows(directed, min_count=2)


SQL_GRAPH_PRELUDE = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
d AS (SELECT x.vec_id i, y.vec_id j, list_distance(x.e, y.e) dist
      FROM v x JOIN v y ON x.vec_id <> y.vec_id),
knn AS (SELECT i, j FROM
        (SELECT i, j, row_number() OVER (PARTITION BY i ORDER BY dist, j) rn
         FROM d) WHERE rn <= 5),
mut AS (SELECT k1.i a, k1.j b FROM knn k1
        JOIN knn k2 ON k2.i = k1.j AND k2.j = k1.i
        WHERE k1.i < k1.j),
adj AS (SELECT a AS u, b AS v FROM mut UNION ALL SELECT b, a FROM mut)"""


def q_kcore(sf_dir: str):
    """Exact 3-core of the mutual-5NN graph (``cluster.kcore``:
    bounded distributed peel + gated vectorized local finish) — the
    dense-subgraph extraction pass a clustering pipeline runs to
    separate core entities from fringe noise. Rows-only by design:
    peeling to the fixpoint needs a data-dependent number of rounds
    (a fringe chain peels one node per round), which SQL cannot
    express — DuckDB's recursive CTEs disallow the per-level degree
    aggregation. Conformance is pinned by
    ``tests/test_cluster.py`` python-equivalence peels (exact node-set
    equality on the sf0.001 graph and on planted clique+chain
    graphs)."""
    from ..cluster import kcore

    nodes, _rounds = kcore(_mutual_knn_edges(sf_dir), k=3)
    out = nodes.to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def q_jaccard_links(sf_dir: str):
    """Common-neighbor Jaccard link prediction on the mutual-5NN graph:
    top-50 non-adjacent pairs by |N(x)∩N(y)| / |N(x)∪N(y)| — the
    candidate-edge generator for graph-based ER consolidation. See
    ``cluster.jaccard_link_prediction`` (wedge shuffle + tagged edge
    suppression + partial top-n)."""
    from ..cluster import jaccard_link_prediction

    out = jaccard_link_prediction(_mutual_knn_edges(sf_dir), topn=50)
    out["jac"] = round_away(out["jac"].to_numpy(), 6)
    out["inter"] = out["inter"].astype(np.int64)
    return out.reset_index(drop=True)


SQL_JACCARD_LINKS = SQL_GRAPH_PRELUDE + """,
deg AS (SELECT u, count(*) AS d FROM adj GROUP BY u),
wed AS (SELECT a1.v AS x, a2.v AS y, count(*) AS inter
        FROM adj a1 JOIN adj a2 ON a1.u = a2.u AND a1.v < a2.v
        GROUP BY 1, 2),
cand AS (SELECT w.x, w.y, w.inter FROM wed w
         LEFT JOIN mut m ON m.a = w.x AND m.b = w.y
         WHERE m.a IS NULL),
sc AS (SELECT x, y, inter,
              CAST(inter AS DOUBLE) / (dx.d + dy.d - inter) AS jac
       FROM cand JOIN deg dx ON dx.u = cand.x
       JOIN deg dy ON dy.u = cand.y)
SELECT x, y, CAST(inter AS BIGINT) AS inter, round(jac, 6) + 0 AS jac
FROM sc ORDER BY sc.jac DESC, x, y LIMIT 50
"""


def q_tfidf_pairs(sf_dir: str):
    """TF-IDF cosine similarity over first-word-blocked part-name pairs
    (``dedup.tfidf_cosine_pairs``): fixed-point int64 idf weights make
    every dot product / norm exact integer arithmetic — only the final
    per-pair division is floating point, so the result is
    order/partition-invariant and oracle-exact."""
    from ..dedup import tfidf_cosine_pairs

    parts = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    )
    out = tfidf_cosine_pairs(parts).to_pandas()
    out["cos_sim"] = round_away(out["cos_sim"].to_numpy(), 6)
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


SQL_TFIDF_PAIRS = """
WITH tok AS (SELECT p_partkey AS id, u.t AS tok, count(*) AS tf
             FROM part, unnest(string_split(p_name, ' ')) AS u(t)
             GROUP BY 1, 2),
df AS (SELECT tok, count(*) AS df FROM tok GROUP BY 1),
w AS (SELECT id, tok.tok AS tok,
             tf * CAST(round(ln(CAST((SELECT count(*) FROM part) AS DOUBLE)
                                / df) * 1000000) AS BIGINT) AS wt
      FROM tok JOIN df USING (tok)),
nrm AS (SELECT id, sum(wt * wt) AS n2 FROM w GROUP BY 1),
pr AS (SELECT a.p_partkey AS a_id, b.p_partkey AS b_id
       FROM part a JOIN part b
         ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
        AND a.p_partkey < b.p_partkey),
dt AS (SELECT pr.a_id, pr.b_id, sum(wa.wt * wb.wt) AS d
       FROM pr JOIN w wa ON wa.id = pr.a_id
       JOIN w wb ON wb.id = pr.b_id AND wb.tok = wa.tok
       GROUP BY 1, 2)
SELECT pr.a_id, pr.b_id,
       round(CAST(coalesce(dt.d, 0) AS DOUBLE)
             / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 6) + 0
         AS cos_sim
FROM pr LEFT JOIN dt ON dt.a_id = pr.a_id AND dt.b_id = pr.b_id
JOIN nrm na ON na.id = pr.a_id
JOIN nrm nb ON nb.id = pr.b_id
ORDER BY pr.a_id, pr.b_id
"""


def _nation_supplier_revenue(sf_dir: str) -> pd.DataFrame:
    """Exact int64 per-(nation, supplier) revenue units
    (``cents × (100 − disc_pct)``, the shared TPC-H fixed point):
    supplier->nation rides the zero-shuffle broadcast-dim pattern, an
    in-batch (nation, supplier) combiner collapses every lineitem
    batch to supplier-sized partials, and the driver folds only that
    tiny partial table. Shared by the concentration/inequality
    profiles (`hhi_concentration`, `gini_concentration`)."""
    sup = (
        ray.data.read_parquet(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        )
        .to_pandas()
        .sort_values("s_suppkey")
    )
    sk_sorted = sup["s_suppkey"].to_numpy(np.int64)
    nk_of = sup["s_nationkey"].to_numpy(np.int64)

    def partial(t: pa.Table) -> pa.Table:
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p100 = round_away(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        d100 = round_away(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        u = p100 * (100 - d100)
        nk = nk_of[np.searchsorted(sk_sorted, sk)]
        order = np.lexsort((sk, nk))
        nk, sk, u = nk[order], sk[order], u[order]
        starts = np.flatnonzero(
            np.concatenate(([True], (nk[1:] != nk[:-1]) | (sk[1:] != sk[:-1])))
        )
        return pa.table(
            {
                "nk": pa.array(nk[starts], pa.int64()),
                "sk": pa.array(sk[starts], pa.int64()),
                "rev": pa.array(np.add.reduceat(u, starts), pa.int64()),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
    )
    return (
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby(["nk", "sk"], as_index=False)["rev"]
        .sum()
    )


def q_hhi_concentration(sf_dir: str):
    """Per-nation supplier revenue concentration (Herfindahl-Hirschman
    index): ``hhi = Σ_i rev_i² / (Σ_i rev_i)²`` over each nation's
    suppliers, on the exact fixed-point revenue fold of
    ``_nation_supplier_revenue`` — rev² exceeds int64, so the tiny
    final fold runs in Python arbitrary-precision ints, matching
    DuckDB's HUGEINT sums bit for bit."""
    per_sup = _nation_supplier_revenue(sf_dir)
    rows = []
    for nk, g in per_sup.groupby("nk"):
        revs = [int(r) for r in g["rev"].tolist()]
        num = sum(r * r for r in revs)  # exact (rev² exceeds int64)
        tot = sum(revs)
        hhi = np.float64(num) / (np.float64(tot) * np.float64(tot))
        rows.append(
            {
                "nk": int(nk),
                "n_sup": len(revs),
                "hhi": float(round_away(hhi, 6)),
            }
        )
    return pd.DataFrame(rows).sort_values("nk").reset_index(drop=True)


SQL_HHI = """
WITH r AS (
  SELECT s_nationkey AS nk, l_suppkey AS sk,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
  GROUP BY 1, 2)
SELECT nk, count(*) AS n_sup,
       round(CAST(sum(CAST(rev AS HUGEINT) * rev) AS DOUBLE)
             / (CAST(sum(rev) AS DOUBLE) * CAST(sum(rev) AS DOUBLE)), 6) + 0
         AS hhi
FROM r GROUP BY nk ORDER BY nk
"""


def q_gini_concentration(sf_dir: str):
    """Per-nation Gini coefficient of supplier revenue (inequality
    profile, the distributional companion of ``hhi_concentration``):
    ascending-sort formula ``G = Σ_i (2i − n − 1)·x_i / (n · Σ x)``,
    which is tie-stable (equal values contribute the same sum under
    any tie order). Numerator terms exceed int64, so the
    supplier-sized driver fold uses Python arbitrary-precision ints —
    bit-matching DuckDB's HUGEINT arithmetic. Same A4 sort-based Gini
    the hubness analysis uses (``analysis.py``), applied as a grouped
    relational profile."""
    per_sup = _nation_supplier_revenue(sf_dir)
    rows = []
    for nk, g in per_sup.groupby("nk"):
        revs = sorted(int(r) for r in g["rev"].tolist())
        n = len(revs)
        tot = sum(revs)
        num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(revs))
        gini = np.float64(num) / (np.float64(n) * np.float64(tot))
        rows.append(
            {
                "nk": int(nk),
                "n_sup": n,
                "gini": float(round_away(gini, 6)),
            }
        )
    return pd.DataFrame(rows).sort_values("nk").reset_index(drop=True)


def q_winsorized_mean(sf_dir: str):
    """Per-priority winsorized mean of order totals (robust-statistics
    data cleaning): values clipped to the exact [P5, P95]
    ``quantile_disc`` bounds before averaging. Same two-streaming-pass
    shape as ``iqr_outliers`` — exact per-key quantiles, tiny fence
    table closed over a per-batch integer partial fold (clipped sums
    stay int64-exact), one double division per key at the end."""
    from ..quantile import grouped_quantiles

    def prep(t: pa.Table) -> pa.Table:
        cents = round_away(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        return pa.table(
            {
                "prio": pc.cast(
                    pc.utf8_slice_codeunits(t["o_orderpriority"], 0, 1),
                    pa.int64(),
                ),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    def orders_ds():
        return ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderpriority", "o_totalprice"],
        ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    qt = grouped_quantiles(
        orders_ds(), "prio", "cents", qs=(0.05, 0.95)
    ).to_pandas()
    lo = {
        int(r["prio"]): int(r["value"])
        for _, r in qt[qt["q"] == 0.05].iterrows()
    }
    hi = {
        int(r["prio"]): int(r["value"])
        for _, r in qt[qt["q"] == 0.95].iterrows()
    }
    prios = np.array(sorted(lo), dtype=np.int64)
    lo_a = np.array([lo[p] for p in prios])
    hi_a = np.array([hi[p] for p in prios])

    def partials(t: pa.Table) -> pa.Table:
        p = t["prio"].to_numpy(zero_copy_only=False)
        c = t["cents"].to_numpy(zero_copy_only=False)
        pi = np.searchsorted(prios, p)
        clipped = np.minimum(np.maximum(c, lo_a[pi]), hi_a[pi])
        # int64 scatter-add, not float-weighted bincount: a float64
        # accumulator is exact only below 2^53 per (batch, key) sum
        s = np.zeros(len(prios), dtype=np.int64)
        np.add.at(s, pi, clipped)
        n = np.bincount(pi, minlength=len(prios)).astype(np.int64)
        return pa.table(
            {
                "prio": pa.array(prios, pa.int64()),
                "s": pa.array(s, pa.int64()),
                "n": pa.array(n, pa.int64()),
            }
        )

    folded = (
        orders_ds()
        .map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby("prio", as_index=False)
        .sum()
    )
    folded["lo_c"] = lo_a
    folded["hi_c"] = hi_a
    folded["wmean_c"] = round_away(
        folded["s"].to_numpy(np.float64) / folded["n"].to_numpy(np.float64),
        6,
    )
    cols = ["prio", "lo_c", "hi_c", "wmean_c"]
    return folded[cols].sort_values("prio").reset_index(drop=True)


SQL_WINSORIZED_MEAN = """
WITH o AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS c
           FROM orders),
q AS (SELECT prio, CAST(quantile_disc(c, 0.05) AS BIGINT) AS lo_c,
             CAST(quantile_disc(c, 0.95) AS BIGINT) AS hi_c
      FROM o GROUP BY prio)
SELECT o.prio, lo_c, hi_c,
       round(CAST(sum(least(greatest(c, lo_c), hi_c)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) + 0 AS wmean_c
FROM o JOIN q USING (prio)
GROUP BY o.prio, lo_c, hi_c
ORDER BY prio
"""


SQL_GINI = """
WITH r AS (
  SELECT s_nationkey AS nk, l_suppkey AS sk,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
  GROUP BY 1, 2),
o AS (SELECT nk, rev,
             row_number() OVER (PARTITION BY nk ORDER BY rev, sk) AS i,
             count(*) OVER (PARTITION BY nk) AS n
      FROM r)
SELECT nk, CAST(max(n) AS BIGINT) AS n_sup,
       round(CAST(sum((2 * i - n - 1) * CAST(rev AS HUGEINT)) AS DOUBLE)
             / (CAST(max(n) AS DOUBLE) * CAST(sum(rev) AS DOUBLE)), 6) + 0
         AS gini
FROM o GROUP BY nk ORDER BY nk
"""


def q_ngram_decontam(sf_dir: str):
    """Word-5-gram overlap decontamination (GPT-3 appendix-C / Llama
    style): training docs (source <> 'src0') sharing at least one
    5-gram with the probe suite (source = 'src0'), with the count of
    DISTINCT shared 5-grams per doc. Probe grams fold driver-side
    (eval-suite-sized) and broadcast once; the corpus streams through
    the task pool with zero shuffles."""
    from ..textops import ngram_decontaminate

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "source"],
    )
    probe = docs.map_batches(
        lambda t: t.filter(pc.equal(t["source"], "src0")),
        batch_format="pyarrow",
    )
    train = docs.map_batches(
        lambda t: t.filter(pc.not_equal(t["source"], "src0")),
        batch_format="pyarrow",
    )
    return ngram_decontaminate(train, probe, n=5).sort("doc_id")


SQL_NGRAM_DECONTAM = r"""
WITH tok AS (
  SELECT doc_id, source,
         string_split_regex(trim(lower(text)), '\s+') AS w
  FROM documents),
pg AS (
  SELECT DISTINCT array_to_string(list_slice(w, i, i+4), ' ') AS g
  FROM tok,
       LATERAL (SELECT unnest(generate_series(1, greatest(len(w)-4, 0)))
                AS i) s
  WHERE source = 'src0'),
dg AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i+4), ' ') AS g
  FROM tok,
       LATERAL (SELECT unnest(generate_series(1, greatest(len(w)-4, 0)))
                AS i) s
  WHERE source <> 'src0')
SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM dg d JOIN pg USING (g)
GROUP BY 1 ORDER BY 1
"""


def q_chunk_manifest(sf_dir: str):
    """Sliding-window context chunk manifest over the documents table
    (window 64, stride 48): boundaries only, never materialized text —
    pure per-batch integer arithmetic, zero shuffles."""
    from ..textops import chunk_manifest

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return chunk_manifest(docs, window=64, stride=48).sort("doc_id")


SQL_CHUNK_MANIFEST = r"""
WITH tok AS (
  SELECT doc_id,
         len(string_split_regex(trim(coalesce(text, '')), '\s+')) AS n
  FROM documents),
c AS (
  SELECT doc_id, i AS start_tok, least(i + 63, n) AS end_tok
  FROM tok,
       LATERAL (SELECT unnest(generate_series(1, greatest(n - 64 + 48, 1),
                                              48)) AS i) s)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_tok) - 1
            AS BIGINT) AS chunk_id,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(end_tok AS BIGINT) AS end_tok,
       CAST(end_tok - start_tok + 1 AS BIGINT) AS n_tokens
FROM c ORDER BY doc_id, chunk_id
"""


def q_ccnet_buckets(sf_dir: str):
    """CCNet-style LM-quality bucketing: label every document head /
    middle / tail by corpus percentiles of its unigram-LM score
    (Wenzek et al. 2020 use perplexity thirds; this uses the
    interquartile split — 0.25/0.75 are exactly representable doubles,
    so the engine and the oracle compute bit-identical cut ranks).

    Composition, all streaming: the oracle-exact ``lm_score`` fold (two
    combiner-sized shuffles, vocabulary never broadcast) -> exact
    distributed quantiles of the score (histogram refinement; only two
    scalar cuts reach the driver) -> a stateless vectorized label
    pass. The canonical "keep the head, resample the middle, drop the
    tail" corpus-mixing precursor."""
    from ..quantile import exact_quantiles
    from ..textops import lm_score

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    # the (doc_id, lm_score) table is narrow (~16 B/row) — materialize
    # it ONCE so the quantile refinement rounds and the label pass read
    # cached blocks instead of re-running the two-shuffle lm fold per
    # pass (the queries.py:q_kcore "round loop must not re-run" rule)
    s = lm_score(docs).select_columns(["doc_id", "lm_score"]).materialize()
    cuts = exact_quantiles(
        s, "lm_score", qs=(0.25, 0.75), num_bins=256,
        collect_threshold=1024,
    )
    c1, c2 = (float(v.as_py()) for v in cuts["value"])

    def label(t: pa.Table) -> pa.Table:
        x = t["lm_score"].to_numpy(zero_copy_only=False)
        b = np.where(x > c2, "head", np.where(x > c1, "middle", "tail"))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lm_score": t["lm_score"],
                "bucket": pa.array(b.astype(object), pa.string()),
            }
        )

    return s.map_batches(label, batch_format="pyarrow").sort("doc_id")


SQL_CCNET_BUCKETS = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(
             string_split_regex(lower(coalesce(text, '')), '\\s+'),
             t -> t <> '')) AS tok
  FROM documents),
cnt AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
tt AS (SELECT CAST(count(*) AS DOUBLE) v FROM toks),
lm AS (
  SELECT t.doc_id,
         round(sum(ln(c.n / (SELECT v FROM tt))) / count(*), 6) + 0
           AS lm_score
  FROM toks t JOIN cnt c USING (tok)
  GROUP BY t.doc_id),
q AS (SELECT quantile_disc(lm_score, 0.25) AS c1,
             quantile_disc(lm_score, 0.75) AS c2
      FROM lm)
SELECT doc_id, lm_score,
       CASE WHEN lm_score > c2 THEN 'head'
            WHEN lm_score > c1 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM lm, q ORDER BY doc_id
"""


def q_ann_filtered(sf_dir: str):
    """Metadata-FILTERED vector search (the classic hard case for
    vector stores): exact cosine top-k over only the targets whose
    label passes a predicate. The filter is pushed AHEAD of shard
    construction — index shards are built from survivors only, so
    selective predicates shrink the index instead of post-filtering
    candidate lists (which under-fills k when the predicate is
    selective). Runs the routed search tier like ann_cosine."""
    # the module-wide even=query / odd=target split (_sides), carrying
    # the label column for the predicate
    even, odd = _sides(sf_dir, extra_cols=("label",))

    def tgt_fn(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t["label"], value_set=pa.array([2, 5, 7], pa.int32())
        )
        return t.filter(keep).select(["row_id", "embedding"])

    def qry_fn(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["row_id"], 10)).select(
            ["row_id", "embedding"]
        )

    target = odd.map_batches(
        tgt_fn, batch_format="pyarrow", zero_copy_batch=True
    )
    queries = even.map_batches(
        qry_fn, batch_format="pyarrow", zero_copy_batch=True
    )
    shards, _, _ = shard_refs_from_dataset(
        target, rows_per_shard=ROUTED["rows_per_shard"]
    )
    nds = knn_search(
        queries, shards, k=N_CAND, algorithm="exact",
        algorithm_kwargs={"metric": "cosine"},
        route_groups=ROUTED["route_groups"],
    )
    out = _explode_neighbors(
        nds, dist_name="cos_sim", digits=6, to_similarity=True
    )
    return out.map_batches(
        lambda t: t.rename_columns(
            ["query_id", "rank", "target_id", "cos_sim"]
        ),
        batch_format="pyarrow",
    )


SQL_ANN_FILTERED = """
WITH
q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e
      FROM embeddings WHERE vec_id % 2 = 0 AND vec_id < 10),
tgt AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e
        FROM embeddings
        WHERE vec_id % 2 = 1 AND label IN (2, 5, 7)),
d AS (SELECT q.vec_id qid, t.vec_id tid,
             list_cosine_similarity(q.e, t.e) sim
      FROM q CROSS JOIN tgt t),
ranked AS (SELECT qid, tid, sim,
                  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, tid) rk
           FROM d)
SELECT qid AS query_id, rk AS rank, tid AS target_id,
       round(sim, 6) + 0 AS cos_sim
FROM ranked WHERE rk <= 10 ORDER BY query_id, rank
"""


def q_corpus_report(sf_dir: str):
    """Per-source corpus HEALTH REPORT: how many documents each source
    loses to every curation rule (language, quality, repetition,
    contamination, exact-dup) and what fraction survives — the
    dashboard a data team reads before committing a training mixture.

    Scale shape: the oracle-exact curation verdict is a narrow
    (doc_id, 6 flags) table; it co-partition hash-joins the
    (doc_id, source) map (both corpus-sized — neither is broadcast),
    per-batch combiners pre-aggregate per-source sums, and only the
    tiny (sources x partials) table reaches the driver fold."""
    import pandas as pd

    from ..relops import hash_join
    from .curation import CurationConfig, run_curation

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    flags = run_curation(docs, CurationConfig())
    src = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).map_batches(
        lambda t: pa.table(
            {
                "src_doc_id": pc.cast(t["doc_id"], pa.int64()),
                "source": t["source"],
            }
        ),
        batch_format="pyarrow",
    )
    joined = hash_join(flags, src, "doc_id", "src_doc_id")

    flag_cols = [
        "lang_ok", "quality_ok", "repetition_ok",
        "contaminated", "keep_dedup", "keep",
    ]

    def part(df: "pd.DataFrame") -> "pd.DataFrame":
        # ONE aggregation so flag sums and n_docs are structurally
        # aligned per key (never positionally across two groupbys)
        return df.groupby("source", as_index=False).agg(
            **{c: (c, "sum") for c in flag_cols},
            n_docs=("source", "size"),
        )

    folded = (
        joined.map_batches(part, batch_format="pandas")
        .to_pandas()  # <= sources x partials combiner rows
        .groupby("source", as_index=False)
        .sum()
    )
    n = folded["n_docs"].to_numpy(np.int64)
    out = pd.DataFrame(
        {
            "source": folded["source"],
            "n_docs": n,
            "n_lang_drop": n - folded["lang_ok"].to_numpy(np.int64),
            "n_quality_drop": n - folded["quality_ok"].to_numpy(np.int64),
            "n_repetition_drop": n
            - folded["repetition_ok"].to_numpy(np.int64),
            "n_contaminated": folded["contaminated"].to_numpy(np.int64),
            "n_dup_dropped": n - folded["keep_dedup"].to_numpy(np.int64),
            "n_kept": folded["keep"].to_numpy(np.int64),
            "kept_frac": round_away(
                folded["keep"].to_numpy(np.float64) / n.astype(np.float64),
                6,
            ),
        }
    )
    return out.sort_values("source").reset_index(drop=True)


def q_mix_sources(sf_dir: str):
    """Deterministic domain mixing (DoReMi / Pile-style weights): keep
    src0 at 50%, src1 at 25%, every other source at 10% — a stateless
    zero-shuffle per-batch filter on Knuth id priorities, stable under
    any re-partitioning."""
    from ..sample import keyed_hash_sample

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    return keyed_hash_sample(
        docs,
        "source",
        "doc_id",
        {"src0": 0.5, "src1": 0.25},
        default_fraction=0.1,
    ).sort("doc_id")


SQL_MIX_SOURCES = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, source
FROM documents
WHERE (CAST(doc_id AS HUGEINT) * 11400714819323198485)
      % 18446744073709551616
      < CAST(CASE source WHEN 'src0' THEN 0.5
                         WHEN 'src1' THEN 0.25
                         ELSE 0.1 END
             * 18446744073709551616.0 AS HUGEINT)
ORDER BY doc_id
"""


def q_corpus_diff(sf_dir: str):
    """Corpus VERSION DIFF (dataset-versioning audit): classify every
    doc_id across two snapshots as added / removed / changed /
    unchanged. The v2 snapshot is derived deterministically from the
    base (docs with id%7==3 deleted, id%5==2 get a ' rev2' suffix,
    id%11==0 spawn a new doc at id+200000 with ' new').

    Scale shape: text NEVER crosses the exchange — each side reduces
    per batch to (doc_id, 128-bit content fingerprint) rows (~24 B/row,
    the curation/dedup_exact identity), the two narrow tables meet in
    ONE co-partitioned full outer hash join, and the classifier is a
    stateless vectorized pass over hash equality (collision odds
    ~2^-128 stand in for text equality, the engine-wide convention)."""
    import pandas as pd

    from ..relops import hash_join

    base = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def mk_v2(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        kept = t.filter(pa.array(ids % 7 != 3))
        kids = pc.cast(kept["doc_id"], pa.int64())
        rev = pc.binary_join_element_wise(
            kept["text"], pa.scalar("rev2"), pa.scalar(" ")
        )
        changed = pc.if_else(
            pa.array(kids.to_numpy(zero_copy_only=False) % 5 == 2),
            rev,
            kept["text"],
        )
        new_side = t.filter(pa.array(ids % 11 == 0))
        new_txt = pc.binary_join_element_wise(
            new_side["text"], pa.scalar("new"), pa.scalar(" ")
        )
        return pa.concat_tables(
            [
                pa.table({"doc_id": kids, "text": changed}),
                pa.table(
                    {
                        "doc_id": pa.array(
                            pc.cast(new_side["doc_id"], pa.int64())
                            .to_numpy(zero_copy_only=False)
                            + 200000,
                            pa.int64(),
                        ),
                        "text": new_txt,
                    }
                ),
            ]
        )

    def fp(prefix: str):
        def f(df: "pd.DataFrame") -> "pd.DataFrame":
            from ..dedup import text_key128

            h1, h2 = text_key128(df["text"].to_numpy(dtype=object))
            return pd.DataFrame(
                {
                    f"{prefix}id": df["doc_id"].to_numpy(np.int64),
                    f"{prefix}h1": h1.astype(np.int64),
                    f"{prefix}h2": h2.astype(np.int64),
                }
            )

        return f

    a = base.map_batches(fp("a_"), batch_format="pandas")
    b = base.map_batches(mk_v2, batch_format="pyarrow").map_batches(
        fp("b_"), batch_format="pandas"
    )
    joined = hash_join(a, b, "a_id", "b_id", how="full")

    def classify(t: pa.Table) -> pa.Table:
        # fill nulls on the ARROW side so the int64 hash columns never
        # pass through float64 (which would compare 64-bit hashes at
        # 53-bit precision); null rows are classified added/removed
        # before hash equality is ever consulted, so the fill values
        # cannot misclassify anything
        def col(name: str) -> np.ndarray:
            return pc.fill_null(t[name], 0).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)

        a_null = pc.is_null(t["a_id"]).to_numpy(zero_copy_only=False)
        b_null = pc.is_null(t["b_id"]).to_numpy(zero_copy_only=False)
        same = (col("a_h1") == col("b_h1")) & (col("a_h2") == col("b_h2"))
        status = np.where(
            b_null,
            "removed",
            np.where(a_null, "added", np.where(same, "unchanged", "changed")),
        )
        ids = np.where(a_null, col("b_id"), col("a_id"))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "status": pa.array(status.astype(object), pa.string()),
            }
        )

    return joined.map_batches(classify, batch_format="pyarrow").sort(
        "doc_id"
    )


SQL_CORPUS_DIFF = """
WITH base AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents),
v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 2 THEN text || ' rev2' ELSE text END AS text
  FROM base WHERE doc_id % 7 <> 3
  UNION ALL
  SELECT doc_id + 200000, text || ' new' FROM base WHERE doc_id % 11 = 0)
SELECT coalesce(b.doc_id, v.doc_id) AS doc_id,
       CASE WHEN v.doc_id IS NULL THEN 'removed'
            WHEN b.doc_id IS NULL THEN 'added'
            WHEN b.text IS NOT DISTINCT FROM v.text THEN 'unchanged'
            ELSE 'changed' END AS status
FROM base b FULL JOIN v2 v ON b.doc_id = v.doc_id
ORDER BY doc_id
"""


def q_training_mixture(sf_dir: str):
    """CAPSTONE training-data funnel — the full "raw corpus to training
    sequences" path, every stage an oracle-exact operator, the
    COMPOSITION oracle-checked end-to-end:

      1. curation verdict (lang + quality + repetition + decontamination
         + exact-dedup keeper, ONE fused scan + ONE content shuffle),
      2. deterministic domain MIXING over the survivors (src0 kept
         whole, src1 at 50%, the rest at 25% — keyed Knuth-priority
         thresholds, zero shuffles),
      3. context-window CHUNK MANIFESTS (window 64 / stride 48) for the
         mixture docs — boundary rows only, never materialized text.

    Exchanges: the curation content shuffle, one doc_id hash-join onto
    the (doc_id, source) map, and one semi-join of the text table
    against the narrow mixture-id set. Everything else is stateless
    per-batch kernels."""
    import pandas as pd

    from ..relops import hash_join, semi_join
    from ..sample import keyed_hash_sample
    from ..textops import chunk_manifest
    from .curation import CurationConfig, run_curation

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    flags = run_curation(docs, CurationConfig()).map_batches(
        lambda t: t.filter(pc.equal(t["keep"], 1)).select(["doc_id"]),
        batch_format="pyarrow",
    )
    src = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).map_batches(
        lambda t: pa.table(
            {
                "src_doc_id": pc.cast(t["doc_id"], pa.int64()),
                "source": t["source"],
            }
        ),
        batch_format="pyarrow",
    )
    kept = hash_join(flags, src, "doc_id", "src_doc_id")
    mixture = keyed_hash_sample(
        kept,
        "source",
        "doc_id",
        {"src0": 1.0, "src1": 0.5},
        default_fraction=0.25,
    ).select_columns(["doc_id"])
    mix_docs = semi_join(
        docs.map_batches(
            lambda t: pa.table(
                {
                    "doc_id": pc.cast(t["doc_id"], pa.int64()),
                    "text": t["text"],
                }
            ),
            batch_format="pyarrow",
        ),
        mixture,
        "doc_id",
        "doc_id",
    )
    return chunk_manifest(mix_docs, window=64, stride=48).sort("doc_id")


SQL_TRAINING_MIXTURE = f"""
WITH cur AS ({SQL_CURATION}),
src AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, source FROM documents),
mixture AS (
  SELECT c.doc_id
  FROM cur c JOIN src s USING (doc_id)
  WHERE c.keep = 1
    AND (CAST(c.doc_id AS HUGEINT) * 11400714819323198485)
        % 18446744073709551616
        < CAST(CASE s.source WHEN 'src0' THEN 1.0
                             WHEN 'src1' THEN 0.5
                             ELSE 0.25 END
               * 18446744073709551616.0 AS HUGEINT)),
tok AS (
  SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
         len(string_split_regex(trim(coalesce(d.text, '')), '\\s+')) AS n
  FROM documents d JOIN mixture m ON CAST(d.doc_id AS BIGINT) = m.doc_id),
c AS (
  SELECT doc_id, i AS start_tok, least(i + 63, n) AS end_tok
  FROM tok,
       LATERAL (SELECT unnest(generate_series(1, greatest(n - 64 + 48, 1),
                                              48)) AS i) s)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_tok) - 1
            AS BIGINT) AS chunk_id,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(end_tok AS BIGINT) AS end_tok,
       CAST(end_tok - start_tok + 1 AS BIGINT) AS n_tokens
FROM c ORDER BY doc_id, chunk_id
"""


# the health report aggregates the SAME curation verdict the byte-exact
# `curation` oracle checks — compose its SQL verbatim so the two can
# never drift apart
SQL_CORPUS_REPORT = f"""
WITH cur AS ({SQL_CURATION}),
src AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, source FROM documents)
SELECT s.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(1 - lang_ok) AS BIGINT) AS n_lang_drop,
       CAST(sum(1 - quality_ok) AS BIGINT) AS n_quality_drop,
       CAST(sum(1 - repetition_ok) AS BIGINT) AS n_repetition_drop,
       CAST(sum(contaminated) AS BIGINT) AS n_contaminated,
       CAST(sum(1 - keep_dedup) AS BIGINT) AS n_dup_dropped,
       CAST(sum(keep) AS BIGINT) AS n_kept,
       round(sum(keep) / CAST(count(*) AS DOUBLE), 6) + 0 AS kept_frac
FROM cur JOIN src s USING (doc_id)
GROUP BY s.source ORDER BY s.source
"""


QUERIES = {
    # --- driver correctness window: the driver oracle-checks the FIRST
    # 50 entries, so this prefix samples every operator family's
    # flagship (knn/rerank, analysis, ANN, media, sketch, graph, dedup,
    # text, ER, edit-distance, matcher, TPC-H, windows, joins, sampling,
    # quantiles). The remaining entries are covered by the builder's
    # full DuckDB sweep in tests/test_queries_oracle.py. ---
    "knn_basic": q_knn_basic,
    "knn_csls": q_knn_csls,
    "knn_ls": q_knn_ls,
    "knn_nicdm": q_knn_nicdm,
    "knn_mp_empiric": q_knn_mp_empiric,
    "knn_dsl": q_knn_dsl,
    "mp_stats": q_mp_stats,
    "k_occurrence": q_k_occurrence,
    "hubness_stats": q_hubness_stats,
    "hits_at_k": q_hits,
    "ann_cosine": q_ann_cosine,
    "ann_graph": q_ann_graph,
    "media_features": q_media_features,
    "heavy_hitters": q_heavy_hitters,
    "components": q_components,
    "pagerank": q_pagerank,
    "triangle_count": q_triangle_count,
    "jaccard_links": q_jaccard_links,
    "dedup_exact": q_dedup_exact,
    # ngram_pairs stands in for the MinHash family in the oracle window
    # (byte-exact n-gram Jaccard companion; minhash_dedup itself is
    # rows-only by design and sits in the balance below)
    "ngram_pairs": q_ngram_pairs,
    "embed_dup": q_embed_dup,
    "semdedup": q_semdedup,
    "dup_spans": q_dup_spans,
    "dedup_canonical": q_dedup_canonical,
    "text_stats": q_text_stats,
    "lang_id": q_lang_id,
    "token_counts": q_token_counts,
    "quality_filter": q_quality_filter,
    "decontaminate": q_decontaminate,
    "curation": q_curation,
    "er_pipeline": q_er_pipeline,
    "er_exact": q_er_exact,
    "golden_record": q_golden_record,
    "meta_blocking": q_meta_blocking,
    "edit_pairs": q_edit_pairs,
    "pair_features": q_pair_features,
    "rand_index": q_rand_index,
    "pricing_summary": q_pricing_summary,
    "volume_shipping": q_volume_shipping,
    "min_cost_supplier": q_min_cost_supplier,
    "tumbling_window": q_tumbling,
    "sessionize": q_sessionize,
    "running_totals": q_running_totals,
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "broadcast_join": q_broadcast_join,
    "stratified_sample": q_stratified_sample,
    "train_split": q_train_split,
    "pack_chunks": q_pack_chunks,
    "grouped_quantiles": q_grouped_quantiles,
    # --- balance of the registry (builder-sweep coverage) ---
    "knn_mp_normal": q_knn_mp_normal,
    "approx_distinct": q_approx_distinct,
    "winsorized_mean": q_winsorized_mean,
    "ann_pq": q_ann_pq,
    "ann_rpforest": q_ann_rpforest,
    "media_dedup": q_media_dedup,
    "minhash_dedup": q_minhash_dedup,
    "quality": q_quality,
    "fingerprint": q_fingerprint,
    "simhash_dedup": q_simhash_dedup,
    "hubness_all": q_hubness_all,
    "sliding_window": q_sliding,
    "order_revenue_topk": q_order_revenue_topk,
    "sample_hash": q_sample_hash,
    "sample_bottomk": q_sample_bottomk,
    "grouped_topk": q_grouped_topk,
    "quantiles": q_quantiles,
    "semi_join": q_semi_join,
    "anti_join": q_anti_join,
    "inner_join": q_inner_join,
    "left_join": q_left_join,
    "event_pivot": q_event_pivot,
    "repetition": q_repetition,
    "global_rank": q_global_rank,
    "kmeans_clusters": q_kmeans,
    "audio_features": q_audio_features,
    "distinct_count": q_distinct_count,
    "top_terms": q_top_terms,
    "redact": q_redact,
    "delta_dedup": q_delta_dedup,
    "shuffle_rank": q_shuffle_rank,
    "tfidf_topk": q_tfidf,
    "zscore": q_zscore,
    "column_corr": q_column_corr,
    "value_histogram": q_value_histogram,
    "rollup_sales": q_rollup_sales,
    "event_gaps": q_event_gaps,
    "dup_ngrams": q_dup_ngrams,
    "substring_clean": q_substring_clean,
    "video_dedup": q_video_dedup,
    "grouped_mad": q_grouped_mad,
    "bloom_semi": q_bloom_semi,
    "pmi_bigrams": q_pmi_bigrams,
    "event_seq": q_event_seq,
    "full_join": q_full_join,
    "lm_score": q_lm_score,
    "grouped_rank": q_grouped_rank,
    "approx_quantiles": q_approx_quantiles,
    "normalize_text": q_normalize_text,
    "intersect_rows": q_intersect,
    "except_rows": q_except,
    "span_stats": q_span_stats,
    "key_skew": q_key_skew,
    "dedup_keep_best": q_dedup_keep_best,
    "order_count_hist": q_order_count_hist,
    "cube_sales": q_cube_sales,
    "grouped_ntile": q_grouped_ntile,
    "span_roundtrip": q_span_roundtrip,
    "blocking_metrics": q_blocking_metrics,
    "returned_revenue": q_returned_revenue,
    "weighted_sample": q_weighted_sample,
    "corpus_prep": q_corpus_prep,
    "rank_stats": q_rank_stats,
    "funnel": q_funnel,
    "nation_revenue": q_nation_revenue,
    "video_features": q_video_features,
    "market_share": q_market_share,
    "length_deciles": q_length_deciles,
    "dim_stats": q_dim_stats,
    "skyline": q_skyline,
    "ks_drift": q_ks_drift,
    "vocab_entropy": q_vocab_entropy,
    "grouped_mode": q_grouped_mode,
    "stratified_quota": q_stratified_quota,
    "twap": q_twap,
    "weighted_dedup": q_weighted_dedup,
    "event_transitions": q_event_transitions,
    "cohort_retention": q_cohort_retention,
    "followup_counts": q_followup_counts,
    "props_agg": q_props_agg,
    "rolling_avg": q_rolling_avg,
    "source_overlap": q_source_overlap,
    "grouped_corr": q_grouped_corr,
    "chi2_independence": q_chi2,
    "quantiles_cont": q_quantiles_cont,
    "grouped_regression": q_grouped_regression,
    "vocab_jaccard": q_vocab_jaccard,
    "above_avg_users": q_above_avg_users,
    "bm25_topk": q_bm25,
    "wow_change": q_wow_change,
    "nearest_purchase": q_nearest_purchase,
    "streaks": q_streaks,
    "basket_pairs": q_basket_pairs,
    "weighted_median": q_weighted_median,
    "mutual_info": q_mutual_info,
    "mutual_best": q_mutual_best,
    "grouped_skew": q_grouped_skew,
    "bcubed": q_bcubed,
    "decayed_value": q_decayed_value,
    "grouped_top_events": q_grouped_top_events,
    "snm_pairs": q_snm_pairs,
    "first_last": q_first_last,
    "sliding_distinct": q_sliding_distinct,
    "containment_pairs": q_containment_pairs,
    "profile": q_profile,
    "grouped_hll": q_grouped_hll,
    "adoption_curve": q_adoption_curve,
    "grouped_geomean": q_grouped_geomean,
    "score_auc": q_score_auc,
    "rfm_segments": q_rfm_segments,
    "activity_heatmap": q_activity_heatmap,
    "order_gaps": q_order_gaps,
    "weighted_avg": q_weighted_avg,
    "large_orders": q_large_orders,
    "small_qty_revenue": q_small_qty_revenue,
    "promo_share": q_promo_share,
    "sales_opportunity": q_sales_opportunity,
    "brand_supplier_count": q_brand_supplier_count,
    "grouped_centroid": q_grouped_centroid,
    "benford": q_benford,
    "jw_pairs": q_jw_pairs,
    "snapshot_diff": q_snapshot_diff,
    "state_intervals": q_state_intervals,
    "fs_scores": q_fs_scores,
    "peak_concurrency": q_peak_concurrency,
    "centroid_dist": q_centroid_dist,
    "forecast_revenue": q_forecast_revenue,
    "top_supplier": q_top_supplier,
    "important_parts": q_important_parts,
    "or_brand_revenue": q_or_brand_revenue,
    "ship_priority": q_ship_priority,
    "priority_count": q_priority_count,
    "line_priority": q_line_priority,
    "product_profit": q_product_profit,
    "promo_suppliers": q_promo_suppliers,
    "waiting_suppliers": q_waiting_suppliers,
    "dl_pairs": q_dl_pairs,
    "stable_match": q_stable_match,
    "monge_elkan": q_monge_elkan,
    "fd_violations": q_fd_violations,
    "iqr_outliers": q_iqr_outliers,
    "kcore": q_kcore,
    "tfidf_pairs": q_tfidf_pairs,
    "hhi_concentration": q_hhi_concentration,
    "gini_concentration": q_gini_concentration,
    "ngram_decontam": q_ngram_decontam,
    "chunk_manifest": q_chunk_manifest,
    "ccnet_buckets": q_ccnet_buckets,
    "mix_sources": q_mix_sources,
    "ann_filtered": q_ann_filtered,
    "corpus_report": q_corpus_report,
    "corpus_diff": q_corpus_diff,
    "training_mixture": q_training_mixture,
}

ORACLE_SQL = {
    "knn_basic": SQL_KNN_BASIC,
    "knn_csls": SQL_KNN_CSLS,
    "knn_ls": SQL_KNN_LS,
    "knn_nicdm": SQL_KNN_NICDM,
    "knn_mp_empiric": SQL_KNN_MP_EMPIRIC,
    "er_exact": SQL_ER_EXACT,
    "knn_dsl": SQL_KNN_DSL,
    "mp_stats": SQL_MP_STATS,
    "k_occurrence": SQL_K_OCCURRENCE,
    "hubness_stats": SQL_HUBNESS_STATS,
    "hits_at_k": SQL_HITS,
    "ann_cosine": SQL_ANN_COSINE,
    "components": SQL_COMPONENTS,
    "dedup_exact": SQL_DEDUP_EXACT,
    "text_stats": SQL_TEXT_STATS,
    "lang_id": SQL_LANG_ID,
    "token_counts": SQL_TOKEN_COUNTS,
    "embed_dup": SQL_EMBED_DUP,
    "tumbling_window": SQL_TUMBLING,
    "sessionize": SQL_SESSIONIZE,
    "sliding_window": SQL_SLIDING,
    "heavy_hitters": SQL_HEAVY_HITTERS,
    "quality": SQL_QUALITY,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "order_revenue_topk": SQL_ORDER_REVENUE_TOPK,
    "sample_hash": SQL_SAMPLE_HASH,
    "sample_bottomk": SQL_SAMPLE_BOTTOMK,
    "grouped_topk": SQL_GROUPED_TOPK,
    "ngram_pairs": SQL_NGRAM_PAIRS,
    "quantiles": SQL_QUANTILES,
    "grouped_quantiles": SQL_GROUPED_QUANTILES,
    "asof_join": SQL_ASOF_JOIN,
    "semi_join": SQL_SEMI_JOIN,
    "anti_join": SQL_ANTI_JOIN,
    "inner_join": SQL_INNER_JOIN,
    "left_join": SQL_LEFT_JOIN,
    "event_pivot": SQL_EVENT_PIVOT,
    "running_totals": SQL_RUNNING_TOTALS,
    "repetition": SQL_REPETITION,
    "global_rank": SQL_GLOBAL_RANK,
    "pack_chunks": SQL_PACK_CHUNKS,
    "range_join": SQL_RANGE_JOIN,
    "distinct_count": SQL_DISTINCT_COUNT,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "top_terms": SQL_TOP_TERMS,
    "broadcast_join": SQL_BROADCAST_JOIN,
    "quality_filter": SQL_QUALITY_FILTER,
    "redact": SQL_REDACT,
    "decontaminate": SQL_DECONTAMINATE,
    "delta_dedup": SQL_DELTA_DEDUP,
    "shuffle_rank": SQL_SHUFFLE_RANK,
    "tfidf_topk": SQL_TFIDF,
    "zscore": SQL_ZSCORE,
    "column_corr": SQL_COLUMN_CORR,
    "value_histogram": SQL_VALUE_HISTOGRAM,
    "rollup_sales": SQL_ROLLUP_SALES,
    "event_gaps": SQL_EVENT_GAPS,
    "dup_ngrams": SQL_DUP_NGRAMS,
    "dup_spans": SQL_DUP_SPANS,
    "substring_clean": SQL_SUBSTRING_CLEAN,
    "curation": SQL_CURATION,
    "grouped_mad": SQL_GROUPED_MAD,
    "bloom_semi": SQL_BLOOM_SEMI,
    "train_split": SQL_TRAIN_SPLIT,
    "triangle_count": SQL_TRIANGLE_COUNT,
    "pmi_bigrams": SQL_PMI_BIGRAMS,
    "event_seq": SQL_EVENT_SEQ,
    "full_join": SQL_FULL_JOIN,
    "lm_score": SQL_LM_SCORE,
    "grouped_rank": SQL_GROUPED_RANK,
    "normalize_text": SQL_NORMALIZE_TEXT,
    "intersect_rows": SQL_INTERSECT,
    "except_rows": SQL_EXCEPT,
    "key_skew": SQL_KEY_SKEW,
    "dedup_keep_best": SQL_DEDUP_KEEP_BEST,
    "order_count_hist": SQL_ORDER_COUNT_HIST,
    "cube_sales": SQL_CUBE_SALES,
    "grouped_ntile": SQL_GROUPED_NTILE,
    "returned_revenue": SQL_RETURNED_REVENUE,
    "weighted_sample": SQL_WEIGHTED_SAMPLE,
    "corpus_prep": SQL_CORPUS_PREP,
    "rank_stats": SQL_RANK_STATS,
    "funnel": SQL_FUNNEL,
    "nation_revenue": SQL_NATION_REVENUE,
    "edit_pairs": SQL_EDIT_PAIRS,
    "market_share": SQL_MARKET_SHARE,
    "length_deciles": SQL_LENGTH_DECILES,
    "pagerank": SQL_PAGERANK,
    "dim_stats": SQL_DIM_STATS,
    "skyline": SQL_SKYLINE,
    "ks_drift": SQL_KS_DRIFT,
    "vocab_entropy": SQL_VOCAB_ENTROPY,
    "grouped_mode": SQL_GROUPED_MODE,
    "stratified_quota": SQL_STRATIFIED_QUOTA,
    "twap": SQL_TWAP,
    "event_transitions": SQL_EVENT_TRANSITIONS,
    "cohort_retention": SQL_COHORT_RETENTION,
    "followup_counts": SQL_FOLLOWUP_COUNTS,
    "props_agg": SQL_PROPS_AGG,
    "rolling_avg": SQL_ROLLING_AVG,
    "source_overlap": SQL_SOURCE_OVERLAP,
    "grouped_corr": SQL_GROUPED_CORR,
    "chi2_independence": SQL_CHI2,
    "quantiles_cont": SQL_QUANTILES_CONT,
    "grouped_regression": SQL_GROUPED_REGRESSION,
    "vocab_jaccard": SQL_VOCAB_JACCARD,
    "above_avg_users": SQL_ABOVE_AVG_USERS,
    "bm25_topk": SQL_BM25,
    "wow_change": SQL_WOW_CHANGE,
    "nearest_purchase": SQL_NEAREST_PURCHASE,
    "streaks": SQL_STREAKS,
    "basket_pairs": SQL_BASKET_PAIRS,
    "weighted_median": SQL_WEIGHTED_MEDIAN,
    "mutual_info": SQL_MUTUAL_INFO,
    "mutual_best": SQL_MUTUAL_BEST,
    "grouped_skew": SQL_GROUPED_SKEW,
    "bcubed": SQL_BCUBED,
    "decayed_value": SQL_DECAYED_VALUE,
    "grouped_top_events": SQL_GROUPED_TOP_EVENTS,
    "snm_pairs": SQL_SNM_PAIRS,
    "first_last": SQL_FIRST_LAST,
    "sliding_distinct": SQL_SLIDING_DISTINCT,
    "containment_pairs": SQL_CONTAINMENT_PAIRS,
    "profile": SQL_PROFILE,
    "adoption_curve": SQL_ADOPTION_CURVE,
    "grouped_geomean": SQL_GROUPED_GEOMEAN,
    "score_auc": SQL_SCORE_AUC,
    "rfm_segments": SQL_RFM_SEGMENTS,
    "activity_heatmap": SQL_ACTIVITY_HEATMAP,
    "order_gaps": SQL_ORDER_GAPS,
    "weighted_avg": SQL_WEIGHTED_AVG,
    "dedup_canonical": SQL_DEDUP_CANONICAL,
    "large_orders": SQL_LARGE_ORDERS,
    "small_qty_revenue": SQL_SMALL_QTY_REVENUE,
    "promo_share": SQL_PROMO_SHARE,
    "sales_opportunity": SQL_SALES_OPPORTUNITY,
    "brand_supplier_count": SQL_BRAND_SUPPLIER_COUNT,
    "grouped_centroid": SQL_GROUPED_CENTROID,
    "benford": SQL_BENFORD,
    "jw_pairs": SQL_JW_PAIRS,
    "snapshot_diff": SQL_SNAPSHOT_DIFF,
    "state_intervals": SQL_STATE_INTERVALS,
    "fs_scores": SQL_FS_SCORES,
    "peak_concurrency": SQL_PEAK_CONCURRENCY,
    "centroid_dist": SQL_CENTROID_DIST,
    "forecast_revenue": SQL_FORECAST_REVENUE,
    "top_supplier": SQL_TOP_SUPPLIER,
    "important_parts": SQL_IMPORTANT_PARTS,
    "or_brand_revenue": SQL_OR_BRAND_REVENUE,
    "ship_priority": SQL_SHIP_PRIORITY,
    "priority_count": SQL_PRIORITY_COUNT,
    "line_priority": SQL_LINE_PRIORITY,
    "product_profit": SQL_PRODUCT_PROFIT,
    "volume_shipping": SQL_VOLUME_SHIPPING,
    "min_cost_supplier": SQL_MIN_COST_SUPPLIER,
    "promo_suppliers": SQL_PROMO_SUPPLIERS,
    "waiting_suppliers": SQL_WAITING_SUPPLIERS,
    "golden_record": SQL_GOLDEN_RECORD,
    "meta_blocking": SQL_META_BLOCKING,
    "dl_pairs": SQL_DL_PAIRS,
    "rand_index": SQL_RAND_INDEX,
    "pair_features": SQL_PAIR_FEATURES,
    "monge_elkan": SQL_MONGE_ELKAN,
    "fd_violations": SQL_FD_VIOLATIONS,
    "iqr_outliers": SQL_IQR_OUTLIERS,
    "jaccard_links": SQL_JACCARD_LINKS,
    "tfidf_pairs": SQL_TFIDF_PAIRS,
    "hhi_concentration": SQL_HHI,
    "gini_concentration": SQL_GINI,
    "winsorized_mean": SQL_WINSORIZED_MEAN,
    "ngram_decontam": SQL_NGRAM_DECONTAM,
    "chunk_manifest": SQL_CHUNK_MANIFEST,
    "ccnet_buckets": SQL_CCNET_BUCKETS,
    "mix_sources": SQL_MIX_SOURCES,
    "ann_filtered": SQL_ANN_FILTERED,
    "corpus_report": SQL_CORPUS_REPORT,
    "corpus_diff": SQL_CORPUS_DIFF,
    "training_mixture": SQL_TRAINING_MIXTURE,
    # Intentionally rows-only (no DuckDB equivalent): kcore (data-dependent
    # fixpoint round count; recursive CTEs disallow per-level aggregation —
    # python-equivalence peels in tests/test_cluster.py), knn_mp_normal
    # (no erf in DuckDB; mp_empiric IS oracle-checked — pure exceedance
    # counting), hubness_all (truncnorm moment), er_pipeline
    # / minhash_dedup / weighted_dedup / simhash_dedup / fingerprint / quality
    # (hash-function-defined semantics), ann_graph / ann_pq / ann_rpforest
    # (approximate by construction; recall-tested vs the exact oracle),
    # kmeans_clusters (iterative algorithm; planted-blob recovery tests),
    # blocking_metrics (diagnostic over synthesized corpus; brute-force
    # pandas oracle + HLL error-bound tests),
    # span_stats / span_roundtrip (interleaved corpus is synthesized, not
    # an oracle view; python-equivalence + roundtrip-identity tests),
    # media_* / audio_* / video_* (binary payload pipelines; deterministic
    # planted-dup and codec-roundtrip tests).
}

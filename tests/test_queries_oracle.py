"""Regression: driver-contract queries vs their DuckDB oracle SQL.

A fast subset at sf0.001 (the driver runs the full set at sf0.01); every
SQL-checked family is represented. Also asserts the __ray_entry__
contract shape.
"""

import numpy as np
import pytest

import __ray_entry__ as entrymod
from kiezray.pipelines import queries as Q

from .oracle_compare import compare

SF = "/root/testdata/sf0.001"

CHECKED = [
    ("knn_basic", 2e-4),
    ("knn_csls", 2e-4),
    ("knn_mp_empiric", 0),
    ("er_exact", 0),
    ("knn_dsl", 2e-4),
    ("mp_stats", 2e-6),
    ("k_occurrence", 0),
    ("hubness_stats", 2e-6),
    ("hits_at_k", 2e-6),
    ("ann_cosine", 2e-6),
    ("dedup_exact", 0),
    ("text_stats", 2e-6),
    ("token_counts", 0),
    ("embed_dup", 0),
    ("sliding_window", 0),
    ("quality", 0),
    ("heavy_hitters", 0),
    ("sample_hash", 0),
    ("sample_bottomk", 0),
    ("grouped_topk", 0),
    ("ngram_pairs", 0),
    ("quantiles", 0),
    ("grouped_quantiles", 0),
    ("asof_join", 0),
    ("semi_join", 0),
    ("anti_join", 0),
    ("inner_join", 0),
    ("left_join", 0),
    ("event_pivot", 0),
    ("running_totals", 0),
    ("repetition", 0),
    ("global_rank", 0),
    ("pack_chunks", 0),
    ("range_join", 0),
    ("distinct_count", 0),
    ("stratified_sample", 0),
    ("top_terms", 0),
    ("broadcast_join", 0),
    ("quality_filter", 0),
    ("redact", 0),
    ("decontaminate", 0),
    ("delta_dedup", 0),
    ("shuffle_rank", 0),
    ("tfidf_topk", 0),
    ("zscore", 0),
    ("column_corr", 0),
    ("value_histogram", 0),
    ("rollup_sales", 0),
    ("event_gaps", 0),
    ("dup_ngrams", 0),
    ("dup_spans", 0),
    ("substring_clean", 0),
    ("curation", 0),
    ("grouped_mad", 0),
    ("bloom_semi", 0),
    ("train_split", 0),
    ("triangle_count", 0),
    ("pmi_bigrams", 0),
    ("event_seq", 0),
    ("full_join", 0),
    ("lm_score", 0),
    ("grouped_rank", 0),
    ("normalize_text", 0),
    ("intersect_rows", 0),
    ("except_rows", 0),
    ("key_skew", 0),
    ("dedup_keep_best", 0),
    ("order_count_hist", 0),
    ("cube_sales", 0),
    ("grouped_ntile", 0),
    ("returned_revenue", 0),
    ("weighted_sample", 0),
    ("corpus_prep", 0),
    ("rank_stats", 0),
    ("funnel", 0),
    ("nation_revenue", 0),
    ("edit_pairs", 0),
    ("market_share", 0),
    ("length_deciles", 0),
    ("pagerank", 0),
    ("dim_stats", 0),
    ("skyline", 0),
    ("ks_drift", 0),
    ("vocab_entropy", 0),
    ("grouped_mode", 0),
    ("stratified_quota", 0),
    ("twap", 0),
    ("event_transitions", 0),
    ("cohort_retention", 0),
    ("followup_counts", 0),
    ("props_agg", 0),
    ("rolling_avg", 0),
    ("source_overlap", 0),
    ("grouped_corr", 0),
    ("chi2_independence", 0),
    ("quantiles_cont", 0),
    ("grouped_regression", 0),
    ("vocab_jaccard", 0),
    ("above_avg_users", 0),
    ("bm25_topk", 0),
    ("wow_change", 0),
    ("nearest_purchase", 0),
    ("streaks", 0),
    ("basket_pairs", 0),
    ("weighted_median", 0),
    ("mutual_info", 2e-6),
    ("mutual_best", 0),
    ("grouped_skew", 2e-6),
    ("bcubed", 2e-6),
    ("decayed_value", 0),
    ("grouped_top_events", 0),
    ("snm_pairs", 0),
    ("first_last", 0),
    ("sliding_distinct", 0),
    ("containment_pairs", 0),
    ("profile", 0),
    ("adoption_curve", 0),
    ("grouped_geomean", 2e-6),
    ("score_auc", 2e-6),
    ("rfm_segments", 0),
    ("activity_heatmap", 0),
    ("order_gaps", 2e-6),
    ("weighted_avg", 2e-6),
    ("dedup_canonical", 0),
    ("large_orders", 0),
    ("small_qty_revenue", 2e-6),
    ("promo_share", 2e-6),
    ("sales_opportunity", 2e-6),
    ("brand_supplier_count", 0),
    ("grouped_centroid", 0),
    ("benford", 2e-6),
    ("jw_pairs", 0),
    ("snapshot_diff", 0),
    ("state_intervals", 0),
    ("fs_scores", 0),
    ("peak_concurrency", 0),
    ("centroid_dist", 0),
    ("forecast_revenue", 0),
    ("top_supplier", 0),
    ("important_parts", 0),
    ("or_brand_revenue", 0),
    ("ship_priority", 0),
    ("priority_count", 0),
    ("line_priority", 0),
    ("product_profit", 0),
    ("volume_shipping", 0),
    ("min_cost_supplier", 0),
    ("promo_suppliers", 0),
    ("waiting_suppliers", 0),
    ("golden_record", 0),
    ("meta_blocking", 0),
    ("dl_pairs", 0),
    ("rand_index", 0),
    ("pair_features", 0),
    ("monge_elkan", 0),
    ("fd_violations", 0),
    ("iqr_outliers", 0),
    ("jaccard_links", 0),
    ("tfidf_pairs", 0),
    ("hhi_concentration", 0),
    ("gini_concentration", 0),
    ("ngram_decontam", 0),
    ("chunk_manifest", 0),
    ("ccnet_buckets", 0),
    ("mix_sources", 0),
    # same float-accumulation-order caveat as ann_cosine: the rounded
    # 6th decimal can differ from DuckDB's list_cosine_similarity when
    # a similarity straddles a rounding boundary
    ("ann_filtered", 2e-6),
    ("corpus_report", 0),
    ("corpus_diff", 0),
    ("training_mixture", 0),
    ("winsorized_mean", 0),
]


@pytest.mark.parametrize("name,tol", CHECKED)
def test_query_matches_oracle(name, tol):
    n = compare(Q.QUERIES[name](SF), Q.ORACLE_SQL[name], SF, float_tol=max(tol, 1e-12))
    assert n > 0


def test_contract_shape():
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 50
    assert len(os_) >= 38


def test_driver_window_composition():
    """The driver oracle-checks the FIRST 50 queries() entries. Pin the
    window's composition so a registry edit can't silently shrink the
    oracle-checked count (r4 found an off-by-one here): >= 46 of the 50
    carry oracle SQL, and the rows-only residue is exactly the
    documented by-design set."""
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    window = list(qs)[:50]
    assert len(window) == 50
    no_oracle = [n for n in window if n not in os_]
    assert set(no_oracle) == {
        "ann_graph",       # approximate by construction (recall-tested)
        "media_features",  # hash-defined media codecs, no SQL form
        "semdedup",        # iterative k-means, no SQL form
        "er_pipeline",     # LSH blocking + hubness scoring, no SQL form
    }, no_oracle
    assert len(window) - len(no_oracle) >= 46


def test_mp_normal_internal_consistency():
    """Rows-only query sanity: MP-normal distances live in [0, 1] and each
    source keeps exactly TOPK rows with ascending rank distances."""
    t = Q.QUERIES["knn_mp_normal"](SF).to_pandas()
    assert t["dist"].between(0, 1).all()
    g = t.sort_values(["source_id", "rank"]).groupby("source_id")
    assert (g.size() == Q.TOPK).all()
    assert all((x["dist"].diff().dropna() >= -1e-9).all() for _, x in g)


def test_ann_graph_recall_vs_exact():
    """Rows-only graph-ANN query: shape + recall >= 0.8 vs the exact
    cosine search on the same slice."""
    exact = Q.QUERIES["ann_cosine"](SF).to_pandas()
    graph = Q.QUERIES["ann_graph"](SF).to_pandas()
    assert list(graph.columns) == ["query_id", "rank", "target_id", "cos_sim"]
    assert set(graph["query_id"]) == set(exact["query_id"])
    hits = 0
    total = 0
    for q in set(exact["query_id"]):
        e = set(exact.loc[exact.query_id == q, "target_id"])
        g = set(graph.loc[graph.query_id == q, "target_id"])
        hits += len(e & g)
        total += len(e)
    assert hits / total >= 0.8


def test_ann_rpforest_recall_vs_exact():
    """Rows-only rp-forest query: shape + recall >= 0.8 vs the exact
    cosine search on the same slice."""
    exact = Q.QUERIES["ann_cosine"](SF).to_pandas()
    forest = Q.QUERIES["ann_rpforest"](SF).to_pandas()
    assert list(forest.columns) == ["query_id", "rank", "target_id", "cos_sim"]
    assert set(forest["query_id"]) == set(exact["query_id"])
    hits = 0
    total = 0
    for q in set(exact["query_id"]):
        e = set(exact.loc[exact.query_id == q, "target_id"])
        g = set(forest.loc[forest.query_id == q, "target_id"])
        hits += len(e & g)
        total += len(e)
    assert hits / total >= 0.8


def test_approx_distinct_vs_exact():
    """Rows-only sketch query: HLL estimates within 5% of DuckDB exact."""
    from .oracle_compare import duckdb_oracle

    df = Q.QUERIES["approx_distinct"](SF)
    exact = {
        "events.user_id": duckdb_oracle(
            "SELECT count(DISTINCT user_id) c FROM events", SF
        )["c"][0],
        "documents.text": duckdb_oracle(
            "SELECT count(DISTINCT text) c FROM documents", SF
        )["c"][0],
    }
    for _, row in df.iterrows():
        want = exact[row["column"]]
        assert abs(row["approx_distinct"] - want) / max(want, 1) < 0.05

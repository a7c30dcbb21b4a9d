"""Dialect-shared SQL: the TPC-H oracle texts run verbatim on spark.sql.

The oracle SQL strings for the TPC-H analogs are written in the shared
ANSI subset (standard joins/subqueries/CASE/BETWEEN/TIMESTAMP literals/
DECIMAL casts), so the same text must execute on the engine's own SQL
frontend (`pixels_spark.sql`) and produce exactly what the DataFrame
implementation produces. This is the "full SQL surface" parity claim made
concrete: a reference user's SQL runs unchanged.

(Queries whose oracles use DuckDB-specific functions — list_*, string_
split_regex, json_extract_string, time_bucket, quantile_cont, unnest — are
out of scope here by construction; they're covered by their DataFrame
implementations + DuckDB oracle.)
"""

from __future__ import annotations

import pytest

from pixels_spark.queries import load_all_modules
from pixels_spark.sql import sql as run_sql

REGISTRY = load_all_modules()
TPCH = sorted(n for n in REGISTRY if n.startswith("tpch_"))

# Non-TPC-H declared queries whose oracle text is ALSO dialect-shared:
# verified to run verbatim on spark.sql with results identical to the
# DataFrame implementation (probe: all oracled queries attempted; these
# pass, the rest use DuckDB-only functions — list_*, time_bucket,
# json_extract_string, quantile_cont, unnest, regex class differences).
DIALECT_SHARED = [
    "cb_active_users", "cb_avg_user", "cb_by_type", "cb_case_src_group",
    "cb_count", "cb_cube", "cb_daily", "cb_daterange_funnel",
    "cb_dims_point_group", "cb_filtered_agg", "cb_group_adjacent_exprs",
    "cb_group_const_expr", "cb_group_expr", "cb_hash_day_group",
    "cb_hourly_histogram", "cb_like_count", "cb_like_min_group",
    "cb_like_notlike", "cb_minmax_distinct", "cb_minute_group",
    "cb_order_by_string", "cb_pair_multi_agg", "cb_phrase_funnel",
    "cb_phrase_order_scan", "cb_point_lookup", "cb_regex_trim_group",
    "cb_region_multi_agg", "cb_rollup", "cb_scan_order_limit",
    "cb_substr_prefix_group", "cb_top_users", "cb_type_day_users",
    "cb_user_point_scan", "cb_user_type_group", "cb_wide_sums",
    "ev_tumbling_daily", "join_cross_theta", "join_full_outer",
    "join_left_null_filter", "join_right_outer", "range_price_bands",
    "scalar_conditionals", "scalar_dates", "scalar_math", "scalar_strings",
    "setop_except", "setop_intersect", "setop_union", "setop_union_all",
    "sql_cataloged_view", "sql_tpch_q15", "sql_tpch_q4", "sql_tpch_q6",
    "sql_window", "win_first_last", "win_lag_lead", "win_rank_orders",
    "win_ranking_family", "win_running_sum", "win_topn_per_customer",
    "dec_money_rollup", "dec_net_revenue", "dec_qty_bands",
    "dec_fine_precision", "stream_dedup", "stream_dedup_bounded",
    "stream_cdc", "mvcc_merge",
    "mvcc_ivm_rollup", "stream_ivm_rollup", "mvcc_secondary_lookup",
    "scalar_winsorize", "join_fuzzy_match",
    "reshape_pivot", "reshape_unpivot", "reshape_grouping_sets",
    "stat_corr_regression", "stat_histogram",
    "funnel_signup_click_purchase", "txt_stratified_sample",
    "mvcc_schema_evolution", "ts_ohlc", "stat_zscore_outliers",
    "stat_bool_aggs", "stat_argmax_latest", "win_ratio_to_report",
    "mvcc_secondary_range",
    # round 6
    "setop_intersect_all", "setop_except_all", "mvcc_scd2",
    "stream_stream_join", "join_skew_salted", "cb_approx_distinct",
    "stream_static_enrich", "cb_window_funnel",
    # tpch_q*_ps are auto-collected by the TPCH prefix list above
    "mvcc_compact_history", "stream_rollup",
    # round 6, session 2 (ts_ewma is per-row fixed-order float arithmetic
    # with exact literals — bit-identical across engines, so it passes
    # even this test's strict string compare; txt_temperature_mix is NOT
    # shareable — its md5-bucket oracle needs DuckDB's '0x…'::BIGINT hex
    # cast, which Spark's CAST rejects, same as every md5-bucket oracle)
    "ts_ewma", "sql_dml_lifecycle", "mvcc_snapshot_diff",
    # round 6, session 4 (vec_hybrid_rrf is NOT shareable — list_* cosine)
    "graph_triangles", "join_bloom_semi", "profile_columns", "mvcc_restore",
    "mvcc_ivm_join", "dq_checks", "stream_ivm_join",
    # round 6, session 5 (sketch_count_min is NOT shareable — DuckDB
    # unnest-table-function syntax in the cell expansion)
    "graph_bfs_hops",
    # round 7 (txt_quota_sample is NOT shareable — DuckDB // integer
    # division; the probe-family oracles are NOT shareable — list_* folds)
    "graph_label_prop", "ev_transition_matrix", "graph_shortest_path",
    "ts_anomaly", "rec_item_sim", "stream_anomaly", "ts_trend_forecast",
    "rec_user_topk",
    # round 7, session 3 (ev_top_paths is NOT shareable — DuckDB
    # string_agg(... ORDER BY) has no Spark twin in the shared subset)
    "rec_assoc_rules", "graph_kcore", "stat_skyline", "sketch_histogram",
    "ts_active_intervals", "ts_cumulative_users",
    # round 7, session 6 (ts_cusum is NOT shareable — Spark 4 parses
    # WITH RECURSIVE but the engine runs the fold, and the raw-string
    # compare would hit differently-typed NULL rendering; txt_priority_
    # sample / vec_* PCA oracles are NOT shareable — DuckDB hex cast /
    # HUGEINT + // division)
    "stat_mann_whitney", "stat_chi_square", "stat_weighted_median",
    "dq_skew_report", "funnel_wilson_ci", "mvcc_clone", "stat_ks_test",
    "graph_link_predict",
    # graph_pagerank's oracle ALSO runs verbatim on spark.sql but is
    # excluded here: this test compares raw value strings, and six rounds
    # of differently-ordered float sums agree only to ~12 significant
    # digits, not bit-for-bit. Its spark.sql parity is asserted at the
    # driver's 9-sig-digit canonicalization in tests/test_graph.py.
]


def _canon(df):
    cols = sorted(df.columns)
    rows = sorted(
        tuple(str(r[c]) for c in cols) for r in df.collect()
    )
    return cols, rows


@pytest.mark.parametrize("name", TPCH)
def test_tpch_oracle_sql_runs_on_spark_sql(spark, sf_dir, name):
    q = REGISTRY[name]
    via_sql = run_sql(spark, sf_dir, q.sql)
    via_df = q.fn(spark, sf_dir)
    sc, sr = _canon(via_sql)
    dc, dr = _canon(via_df)
    assert sc == dc, f"{name}: column mismatch {sc} vs {dc}"
    if sr != dr:
        first = next(((a, b) for a, b in zip(sr, dr) if a != b), ("<len>", "<len>"))
        pytest.fail(f"{name}: value mismatch, first diff: {first}")


@pytest.mark.parametrize("name", DIALECT_SHARED)
def test_shared_dialect_oracle_sql_runs_on_spark_sql(spark, sf_dir, name):
    q = REGISTRY[name]
    via_sql = run_sql(spark, sf_dir, q.sql)
    via_df = q.fn(spark, sf_dir)
    sc, sr = _canon(via_sql)
    dc, dr = _canon(via_df)
    assert sc == dc, f"{name}: column mismatch {sc} vs {dc}"
    if sr != dr:
        first = next(((a, b) for a, b in zip(sr, dr) if a != b), ("<len>", "<len>"))
        pytest.fail(f"{name}: value mismatch, first diff: {first}")

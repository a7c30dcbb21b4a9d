"""Repo-wide plan lint: every declared BATCH query's physical plan is
scanned for scale anti-patterns (unbroadcast cartesian products, row-wise
Python UDFs, nested-loop joins). This operationalizes the anti-pattern
audit as a standing gate: a new query that sneaks in a cartesian or a
row-UDF fails here, not in a judge review.

Queries with a DELIBERATE nested-loop broadcast (scalar thresholds, tiny
theta-join sides, interval probes) are allowlisted BY NAME with the
reason — additions must justify themselves.
"""

from __future__ import annotations

import pytest

from pixels_spark.plans.pushdown import plan_anti_patterns
from pixels_spark.queries import load_all_modules

REGISTRY = load_all_modules()

# mutation/streaming queries execute side effects on build — their plans
# are covered by their own tests; linting here would run whole pipelines
_SKIP_PREFIXES = ("stream_", "mvcc_", "sql_dml", "mm_")

# name -> why its BroadcastNestedLoopJoin / pattern is deliberate
ALLOWLIST = {
    "join_cross_theta": "theta join: tiny broadcast side by construction",
    "cb_approx_distinct": "scalar tolerance frame crossJoin (1 row)",
    "cb_approx_quantile": "scalar sketch frame crossJoin (1 row)",
    "range_price_bands": "interval probe against a tiny bands frame",
    "dec_qty_bands": "interval probe against a tiny bands frame",
    "scalar_winsorize": "scalar percentile frame crossJoin (1 row)",
    "stat_zscore_outliers": "scalar mean/std frame crossJoin (1 row)",
    "txt_kl_drift": "scalar corpus-total frame crossJoin (1 row)",
    "txt_lm_score": "scalar corpus-size frame crossJoin (1 row)",
    "txt_quality_cut": "scalar corpus frame crossJoin (1 row)",
    "txt_temperature_mix": "scalar normalizer frame crossJoin (1 row)",
    "txt_tfidf": "scalar doc-count frame crossJoin (1 row)",
    "txt_token_budget_mix": "scalar budget frame crossJoin (1 row)",
    "txt_boilerplate": "scalar doc-count frame crossJoin (1 row)",
    "txt_heavy_hitters": "scalar row-count frame crossJoin (1 row)",
    "vec_knn": "1-row query-vector crossJoin",
    "vec_knn_int8": "1-row query-vector crossJoin",
    "vec_knn_pq": "1-row query-vector crossJoin",
    "vec_batch_knn": "bounded query-set crossJoin (16 rows, broadcast)",
    "vec_ivf_knn": "1-row query-vector crossJoin",
    "vec_ivf_probe": "1-row query-vector crossJoin",
    "vec_ivf_incremental": "1-row query-vector crossJoin",
    "vec_ivfpq_probe": "1-row query-vector crossJoin",
    "vec_pq_probe": "1-row query-vector crossJoin",
    "vec_semdedup": "scalar threshold frame crossJoin",
    "vec_kmeans_round": "tiny centroid frame crossJoin",
    "asof_signup_error": "tiny tolerance frame",
    "ts_gap_fill": "per-key grid expansion against a tiny calendar frame",
    "tpch_q11": "scalar value-fraction threshold crossJoin (1 row)",
    "tpch_q11_ps": "scalar value-fraction threshold crossJoin (1 row)",
    "tpch_q22": "scalar avg-acctbal threshold crossJoin (1 row)",
    "txt_collocations": "scalar corpus-total frame crossJoin (1 row)",
    "txt_training_pipeline": "scalar corpus/budget frames (composition)",
    "vec_lsh_pairs": "tiny hyperplane frame crossJoin (seeded planes)",
    "vec_hybrid_rrf": "1-row query-vector crossJoin",
    "vec_hybrid_rrf_topn": "1-row query-vector crossJoin (bounded kNN leg)",
    "txt_quota_sample": "1-row corpus-total / leftover frame crossJoins",
    "txt_bpe_train": "1-row chosen-merge frame crossJoins (broadcast)",
    "rec_assoc_rules": "scalar basket-total frame crossJoin (1 row)",
    "sketch_histogram": "3-row quantile probe against the <=64-row sketch",
    "stat_chi_square": "R x C contingency grid cross join (5x24, broadcast)",
    "vec_pca_top2": "1-row deflation-scalar (c1,c2) frame crossJoin",
    "ts_lttb": "1-row first-point frame crossJoin seeding the bucket fold",
}

BATCH = sorted(
    n for n in REGISTRY if not n.startswith(_SKIP_PREFIXES)
)


@pytest.mark.parametrize("name", BATCH)
def test_plan_has_no_anti_patterns(spark, sf_dir, name):
    findings = plan_anti_patterns(REGISTRY[name].fn(spark, sf_dir))
    if name in ALLOWLIST:
        # The allowlist waives ONLY the deliberate BroadcastNestedLoopJoin
        # each entry documents — a CartesianProduct or row-wise Python UDF
        # sneaking into an allowlisted query must still fail the gate.
        findings = [f for f in findings if "nested-loop" not in f]
    assert not findings, f"{name}: {findings}"

"""Edge-case tests for repetition_stats (Gopher-style quality signals).

The sf fixtures never contain one-token or fully-repetitive documents, so the
NULL-frac and frac=1.0 branches are pinned here; the corpus-level values are
oracle-checked by the declared ``txt_repetition`` query.
"""

import re

from pixels_spark.functions.text import repetition_stats


def _rows(spark, data):
    df = spark.createDataFrame(data, ["doc_id", "text"])
    return {
        r["doc_id"]: r for r in repetition_stats(df).orderBy("doc_id").collect()
    }


def test_repetition_basic(spark):
    out = _rows(spark, [(1, "a b a b c")])
    r = out[1]
    assert r["n_tokens"] == 5
    assert r["distinct_token_ratio"] == 3 / 5
    # bigrams: "a b"×2, "b a", "b c" → top share 2/4
    assert r["top_bigram_frac"] == 2 / 4


def test_repetition_single_token_doc_has_null_frac(spark):
    r = _rows(spark, [(2, "x")])[2]
    assert r["n_tokens"] == 1
    assert r["distinct_token_ratio"] == 1.0
    assert r["top_bigram_frac"] is None


def test_repetition_fully_repetitive_doc(spark):
    r = _rows(spark, [(3, "q q q q")])[3]
    assert r["distinct_token_ratio"] == 1 / 4
    assert r["top_bigram_frac"] == 1.0


def test_repetition_single_shuffle_plan(spark):
    # The entry hash-partition on doc_id is a subset of both grouping keys,
    # so Catalyst must run BOTH aggregations shuffle-free on it: exactly one
    # Exchange in the whole plan, and no Window/Join/CartesianProduct.
    from pixels_spark.plans.pushdown import explain_str

    df = spark.createDataFrame([(1, "a b c a")], ["doc_id", "text"])
    plan = explain_str(repetition_stats(df))
    n_exchange = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert n_exchange == 1, plan
    for bad in ("Window", "SortMergeJoin", "BroadcastHashJoin", "Cartesian"):
        assert bad not in plan, plan


def test_repetition_untrimmed_whitespace(spark):
    # leading/trailing/multiple spaces must not create empty tokens
    a = _rows(spark, [(4, "  a b   a b c ")])[4]
    b = _rows(spark, [(5, "a b a b c")])[5]
    assert (a["n_tokens"], a["distinct_token_ratio"], a["top_bigram_frac"]) == (
        b["n_tokens"],
        b["distinct_token_ratio"],
        b["top_bigram_frac"],
    )

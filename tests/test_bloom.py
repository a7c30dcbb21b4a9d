"""Bloom decontamination: no false negatives (superset of the exact
semi-join), bounded false positives, empty-benchmark behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from pixels_spark.catalog import load_table
from pixels_spark.functions import dedup as D
from pixels_spark.functions.bloom import (
    BLOOM_K,
    BLOOM_M,
    bloom_decontaminate,
    build_bloom_bitset,
)


def _split(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.col("source") == "src19"), d.filter(F.col("source") != "src19")


def test_bloom_flags_superset_of_exact_with_bounded_fp(spark, sf_dir):
    bench, train = _split(spark, sf_dir)
    bits = build_bloom_bitset(bench, "text", n=4)
    bloomed = {
        r["doc_id"]
        for r in bloom_decontaminate(train, bits, "doc_id", "text", n=4)
        .filter("contaminated")
        .collect()
    }
    exact = {r["doc_id"] for r in D.decontaminate(train, bench, n=4).collect()}
    # a Bloom filter can only over-flag, never under-flag
    assert exact <= bloomed
    n_train = train.count()
    # with m=2^20 / k=3 and this corpus's shingle volume, per-shingle fp
    # ~3e-5 — doc-level false positives must stay a sliver of the corpus
    assert len(bloomed - exact) <= max(2, n_train // 100)


def test_bloom_no_false_negatives_on_crafted_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    train = spark.createDataFrame(
        [
            (1, "prefix words then alpha beta gamma delta epsilon zeta suffix"),
            (2, "completely different content with no shared phrases here at all"),
        ],
        ["doc_id", "text"],
    )
    bits = build_bloom_bitset(bench, "text", n=4)
    got = {r["doc_id"]: r for r in
           bloom_decontaminate(train, bits, "doc_id", "text", n=4).collect()}
    assert got[1]["contaminated"] and got[1]["n_flagged"] >= 3
    assert not got[2]["contaminated"] and got[2]["n_flagged"] == 0


def test_bloom_empty_benchmark_flags_nothing(spark):
    bench = spark.createDataFrame([], "doc_id bigint, text string")
    train = spark.createDataFrame([(1, "some ordinary text here")], ["doc_id", "text"])
    bits = build_bloom_bitset(bench, "text", n=4)
    assert len(bits) == BLOOM_M // 8 and not any(bits)
    rows = bloom_decontaminate(train, bits, "doc_id", "text", n=4).collect()
    assert len(rows) == 1 and not rows[0]["contaminated"]


def test_bloom_plan_has_single_exchange(spark, sf_dir):
    """Corpus side never shuffles before the per-doc groupBy: exactly one
    Exchange in the physical plan (the groupBy), no Join over the corpus."""
    bench, train = _split(spark, sf_dir)
    bits = build_bloom_bitset(bench, "text", n=4)
    plan = (
        bloom_decontaminate(train, bits, "doc_id", "text", n=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # partial+final agg pair


def test_bloom_registry_suppresses_across_and_within_batches(spark, tmp_path):
    from pixels_spark.functions.bloom import BloomRegistry

    reg = BloomRegistry(spark, str(tmp_path / "reg"))
    b1 = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "unique one")],
        ["doc_id", "text"],
    )
    k1 = sorted(r["doc_id"] for r in reg.register_batch(b1).collect())
    assert k1 == [1, 3]  # within-batch exact: first id wins
    b2 = spark.createDataFrame(
        [(10, "ALPHA   beta gamma"), (11, "brand new content here")],
        ["doc_id", "text"],
    )
    k2 = sorted(r["doc_id"] for r in reg.register_batch(b2).collect())
    assert k2 == [11]  # 10 is a normalized dup of batch-1's fingerprint


def test_bloom_registry_state_survives_reinstantiation(spark, tmp_path):
    from pixels_spark.functions.bloom import BloomRegistry

    path = str(tmp_path / "reg2")
    BloomRegistry(spark, path).register_batch(
        spark.createDataFrame([(1, "persisted text")], ["doc_id", "text"])
    )
    reg2 = BloomRegistry(spark, path)
    kept = reg2.register_batch(
        spark.createDataFrame([(2, "persisted  TEXT"), (3, "other")],
                              ["doc_id", "text"])
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [3]

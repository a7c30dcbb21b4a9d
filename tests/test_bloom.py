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


def test_bloom_registry_streaming_ingest_equals_batch(spark, tmp_path):
    """The registry absorbs a live feed via foreachBatch (each micro-batch
    = one register_batch call) and the kept set equals registering the
    same slices in the same order as plain batches — streaming and batch
    ingest share one dedup state machine."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from pixels_spark.functions.bloom import BloomRegistry

    rows = [(i, f"doc body number {i % 6}") for i in range(12)]  # heavy dups
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    s1, s2 = df.filter("doc_id < 6"), df.filter("doc_id >= 6")

    # batch reference
    ref = BloomRegistry(spark, str(tmp_path / "ref"))
    want = sorted(
        r["doc_id"]
        for part in (ref.register_batch(s1), ref.register_batch(s2))
        for r in part.collect()
    )

    # streaming: two files -> two micro-batches in arrival order (mtimes
    # pinned explicitly — the file source triggers in mtime order)
    import os
    import time

    src = str(tmp_path / "src")
    base, seen = time.time(), set()
    for i, s in enumerate((s1, s2)):
        s.coalesce(1).write.mode("append").parquet(src)
        for fn in os.listdir(src):
            p = os.path.join(src, fn)
            if fn.endswith(".parquet") and p not in seen:
                os.utime(p, (base + i, base + i))
                seen.add(p)
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    reg = BloomRegistry(spark, str(tmp_path / "stream"))

    def absorb(batch_df, batch_id):
        if batch_df.count():
            reg.register_batch(batch_df.orderBy("doc_id"))

    q = (
        stream.writeStream.foreachBatch(absorb)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = sorted(
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "stream" / "kept" / "*")).collect()
    )
    assert got == want and len(got) == 6  # one survivor per distinct body


def test_key_bitset_filter_is_superset_then_exact_join_equal(spark, sf_dir):
    """Runtime-filter contract: the bloom pre-filter keeps a SUPERSET of
    the matching fact rows (no false negatives), strictly fewer than the
    full fact, and the follow-up join removes the FPs exactly."""
    from pixels_spark.functions.bloom import bloom_filter_keys, build_key_bitset

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    dim = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    bits = build_key_bitset(dim, "o_orderkey")

    pre = bloom_filter_keys(li, "l_orderkey", bits)
    n_all, n_pre = li.count(), pre.count()
    n_true = li.join(dim, li["l_orderkey"] == dim["o_orderkey"], "left_semi").count()
    assert n_true <= n_pre < n_all  # superset, and it actually filters

    # FPs vanish at the real join: bloom-prefiltered join == plain join
    plain = (
        li.join(dim, li["l_orderkey"] == dim["o_orderkey"])
        .groupBy("l_orderkey").count()
    )
    bloomed = (
        pre.join(dim, pre["l_orderkey"] == dim["o_orderkey"])
        .groupBy("l_orderkey").count()
    )
    assert plain.exceptAll(bloomed).count() == 0
    assert bloomed.exceptAll(plain).count() == 0


def test_key_bitset_null_keys_dropped_and_empty_dim(spark):
    from pixels_spark.functions.bloom import bloom_filter_keys, build_key_bitset

    dim = spark.createDataFrame([(1,), (None,)], "k bigint")
    bits = build_key_bitset(dim, "k")
    fact = spark.createDataFrame([(1,), (2,), (None,)], "k bigint")
    kept = {r["k"] for r in bloom_filter_keys(fact, "k", bits).collect()}
    assert 1 in kept and None not in kept  # null never matches (join convention)

    empty_bits = build_key_bitset(dim.filter("k is null and k is not null"), "k")
    assert bloom_filter_keys(fact, "k", empty_bits).count() == 0


def test_bloom_registry_batch_numbering_survives_removed_middle_batch(
    spark, tmp_path
):
    """max(existing)+1 naming: deleting a middle batch dir (compaction /
    cleanup) must NOT make the next register overwrite the newest
    surviving batch (count+1 would collide with batch=3)."""
    import os
    import shutil

    from pixels_spark.functions.bloom import BloomRegistry

    reg = BloomRegistry(spark, str(tmp_path / "reg"))
    for i, txt in enumerate(["one alpha", "two beta", "three gamma"]):
        reg.register_batch(
            spark.createDataFrame([(i, txt)], ["doc_id", "text"])
        )
    kept = str(tmp_path / "reg" / "kept")
    assert sorted(os.listdir(kept)) == ["batch=1", "batch=2", "batch=3"]
    shutil.rmtree(os.path.join(kept, "batch=2"))
    reg.register_batch(
        spark.createDataFrame([(9, "four delta")], ["doc_id", "text"])
    )
    dirs = sorted(os.listdir(kept))
    assert dirs == ["batch=1", "batch=3", "batch=4"]
    # batch=3's content is untouched
    b3 = spark.read.parquet(os.path.join(kept, "batch=3"))
    assert [r["doc_id"] for r in b3.collect()] == [2]

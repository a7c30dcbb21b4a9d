"""Deterministic hash sampling/splitting (functions/sampling.py)."""

from pyspark.sql import functions as F

from pixels_spark.functions.sampling import (
    N_BUCKETS,
    hash_bucket,
    hash_sample,
    with_split,
)


def _keys(spark, n=2000):
    return spark.range(n).select(F.col("id").alias("k"))


def test_split_is_total_and_deterministic(spark):
    df = with_split(_keys(spark), "k")
    counts = {r["split"]: r["n"] for r in df.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000
    # roughly the 80/10/10 mixture (md5 is uniform; wide tolerance)
    assert 0.7 < counts["train"] / 2000 < 0.9
    # identical on recompute — pure function of the key
    again = {r["split"]: r["n"] for r in with_split(_keys(spark), "k").groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == again


def test_split_respects_custom_weights_and_remainder(spark):
    df = with_split(_keys(spark), "k", weights={"a": 0.5, "b": 0.5})
    got = {r["split"] for r in df.select("split").distinct().collect()}
    assert got == {"a", "b"}


def test_hash_sample_fraction_and_join_stability(spark):
    df = _keys(spark)
    s = hash_sample(df, "k", 0.2)
    n = s.count()
    assert 0.1 < n / 2000 < 0.3
    # the same keys survive when sampling a second table with the same salt
    other = df.withColumn("v", F.col("k") * 2)
    joined = s.join(hash_sample(other, "k", 0.2), "k").count()
    assert joined == n


def test_salt_decorrelates_draws(spark):
    df = _keys(spark)
    a = set(r["k"] for r in hash_sample(df, "k", 0.5, salt="x").collect())
    b = set(r["k"] for r in hash_sample(df, "k", 0.5, salt="y").collect())
    assert a != b
    # overlap near 25% of keys, far from 0% and 50%
    assert 0.1 < len(a & b) / 2000 < 0.4


def test_bucket_range(spark):
    row = (
        _keys(spark, 500)
        .select(hash_bucket(F.col("k")).alias("b"))
        .agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
        .collect()[0]
    )
    assert 0 <= row["lo"] and row["hi"] < N_BUCKETS


def test_split_plan_has_no_shuffle(spark):
    from pixels_spark.plans.pushdown import explain_str

    plan = explain_str(with_split(_keys(spark), "k"))
    assert "Exchange" not in plan, plan


def test_mixture_sample_rates_and_determinism(spark):
    from pixels_spark.functions.sampling import mixture_sample

    df = (
        _keys(spark, 3000)
        .withColumn("stratum", (F.col("k") % 3).cast("string"))
    )
    mixed = mixture_sample(df, "k", "stratum", {"0": 1.0, "1": 0.5}, default_rate=0.0)
    counts = {
        r["stratum"]: r["n"]
        for r in mixed.groupBy("stratum").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts["0"] == 1000  # rate 1.0 keeps everything
    assert "2" not in counts  # default 0.0 drops the stratum entirely
    assert 0.35 < counts["1"] / 1000 < 0.65
    # determinism: identical on recompute
    again = {
        r["stratum"]: r["n"]
        for r in mixture_sample(df, "k", "stratum", {"0": 1.0, "1": 0.5}, default_rate=0.0)
        .groupBy("stratum").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == again


def test_empirical_rate_unbiased_at_1e5(spark):
    """Regression for the 4-hex-char bucket bias: md5[:4] is a 16-bit space,
    and 65536 % 10000 = 5536 makes low buckets 7/65536 likely vs 6/65536 —
    at fraction 0.5 the empirical keep-rate was 0.5358 (+3.6% absolute).
    With 8 hex chars the residue bias is ~0.0002%; what remains is binomial
    noise (sigma ~= 0.16% at n=1e5), so 0.5% absolute tolerance both passes
    reliably and would have caught the 4-char scheme."""
    n = 100_000
    df = spark.range(n).select(F.col("id").alias("k"))
    for frac in (0.5, 0.1):
        rate = hash_sample(df, "k", frac).count() / n
        assert abs(rate - frac) < 0.005, f"fraction {frac}: empirical {rate}"


def test_mixture_sample_is_subset_of_hash_sample(spark):
    from pixels_spark.functions.sampling import mixture_sample

    df = _keys(spark, 1000).withColumn("stratum", F.lit("s"))
    a = set(r["k"] for r in mixture_sample(df, "k", "stratum", {"s": 0.3}).collect())
    b = set(r["k"] for r in hash_sample(df, "k", 0.6).collect())
    assert a <= b  # thresholds nest: bucket < 3000 implies bucket < 6000


def test_scrub_pii_edge_cases(spark):
    """Unit coverage for the PII patterns on constructed strings (the
    fixture has no PII; the declared query injects deterministically)."""
    from pyspark.sql import functions as F

    from pixels_spark.functions.text import pii_counts, scrub_pii

    rows = [
        ("a", "mail me a.b-c_9@sub.example.co.uk today"),
        ("b", "call 555-123-4567 or 555-000-9999"),
        ("c", "host 192.168.0.1 and 10.255.255.254"),
        ("d", "no pii here, just 12-34 and a@b"),  # too short / malformed
        ("e", "x@y.io 1.2.3.4 999-888-7777"),  # all three kinds
    ]
    df = spark.createDataFrame(rows, "k string, t string")
    c = pii_counts(F.col("t"))
    got = {
        r["k"]: (r["e"], r["p"], r["i"], r["s"])
        for r in df.select(
            "k",
            c["email"].alias("e"),
            c["phone"].alias("p"),
            c["ipv4"].alias("i"),
            scrub_pii(F.col("t")).alias("s"),
        ).collect()
    }
    assert got["a"][:3] == (1, 0, 0) and "[EMAIL]" in got["a"][3]
    assert got["b"][:3] == (0, 2, 0) and got["b"][3].count("[PHONE]") == 2
    assert got["c"][:3] == (0, 0, 2)
    assert got["d"][:3] == (0, 0, 0) and got["d"][3] == rows[3][1]
    assert got["e"][:3] == (1, 1, 1)


def test_token_shards_are_contiguous_and_sized(spark, sf_dir):
    from pyspark.sql import functions as F

    from pixels_spark.catalog import load_table
    from pixels_spark.functions.text import with_token_shards

    d = load_table(spark, sf_dir, "documents")
    s = with_token_shards(d, shard_tokens=500)
    rows = sorted(
        (r["doc_id"], r["shard"], r["n_tokens"]) for r in s.collect()
    )
    # shards are non-decreasing in doc order, and each shard's token count
    # is ~500 (can overshoot by at most one doc's tokens)
    shards = [sh for _d, sh, _n in rows]
    assert shards == sorted(shards)
    from collections import defaultdict

    per = defaultdict(int)
    for _d, sh, n in rows:
        per[sh] += n
    max_doc = max(n for _d, _s, n in rows)
    for sh, tot in per.items():
        if sh != max(per):  # last shard may be short
            assert tot >= 500 - max_doc
        assert tot <= 500 + max_doc


def test_stratified_sample_exact_ceil_quota(spark):
    """Quota must be the exact ceil(frac*n): 100-row stratum at frac=0.07
    yields exactly 7 rows (IEEE double would give 8)."""
    from pixels_spark.functions.sampling import stratified_sample_exact

    df = spark.range(100).select(
        F.col("id"), F.lit("s").alias("grp")
    )
    out = stratified_sample_exact(df, ["grp"], 0.07, key_col="id")
    assert out.count() == 7


def test_temperature_mix_upsamples_low_resource_strata(spark):
    """α=0.5 property: kept-share of a rare stratum exceeds its corpus
    share; a dominant stratum's kept-share shrinks; rates cap at 1."""
    from pixels_spark.functions.sampling import temperature_mix, temperature_thresholds

    rows = [(i, "big") for i in range(900)] + [(i + 1000, "small") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    thr = {r["lang"]: r["_thr"] for r in
           temperature_thresholds(df, "lang", target_frac=0.4).collect()}
    # rate_small/rate_big = sqrt(900/100) = 3 (before the cap)
    assert thr["small"] > thr["big"]
    kept = temperature_mix(df, "doc_id", "lang", target_frac=0.4)
    counts = {r["lang"]: r["n"] for r in
              kept.groupBy("lang").agg(__import__("pyspark").sql.functions.count("*").alias("n")).collect()}
    assert counts["small"] / 100 > counts["big"] / 900
    # determinism: second run keeps the identical set
    ids1 = sorted(r["doc_id"] for r in kept.collect())
    ids2 = sorted(r["doc_id"] for r in
                  temperature_mix(df, "doc_id", "lang", target_frac=0.4).collect())
    assert ids1 == ids2


def test_priority_sample_exhaustive_when_k_covers_all(spark):
    """n <= k: every row returned, tau = 0, est_weight == weight exactly."""
    from pixels_spark.functions.sampling import priority_sample

    df = spark.createDataFrame(
        [(i, 10 * (i + 1)) for i in range(5)], ["k", "w"]
    )
    out = priority_sample(df, "k", "w", k=8).collect()
    assert len(out) == 5
    for r in out:
        assert r["est_weight"] == float(r["w"])


def test_priority_sample_size_determinism_and_tau_floor(spark):
    """Exactly k rows; rerun identical; every est_weight >= its weight and
    the non-sampled mass is represented: est_weight >= tau for all rows."""
    from pixels_spark.functions.sampling import priority_sample

    df = spark.createDataFrame(
        [(i, (i % 7) + 1) for i in range(500)], ["k", "w"]
    )
    s1 = priority_sample(df, "k", "w", k=32, salt="a").collect()
    s2 = priority_sample(df, "k", "w", k=32, salt="a").collect()
    assert sorted(r["k"] for r in s1) == sorted(r["k"] for r in s2)
    assert len(s1) == 32
    tau = min(r["est_weight"] for r in s1)  # est >= tau, with equality hit
    for r in s1:
        assert r["est_weight"] >= float(r["w"])
        assert r["est_weight"] >= tau - 1e-12


def test_priority_sample_subset_sum_unbiased(spark):
    """E[sum(est_weight)] == total weight (DLT unbiasedness): average the
    estimator over independent salts; the mean must land within 10% of the
    true total (k=64 over n=400 -> the estimator variance is small)."""
    from pixels_spark.functions.sampling import priority_sample

    rows = [(i, (i % 13) + 1) for i in range(400)]
    df = spark.createDataFrame(rows, ["k", "w"]).cache()
    total = sum(w for _k, w in rows)
    ests = []
    for s in range(12):
        got = priority_sample(df, "k", "w", k=64, salt=f"s{s}").agg(
            F.sum("est_weight").alias("e")
        ).collect()[0]["e"]
        ests.append(got)
    mean = sum(ests) / len(ests)
    assert abs(mean - total) / total < 0.10


def test_group_kfold_never_splits_a_source(spark, sf_dir):
    """Leakage-safety contract: every doc of a source is in ONE fold."""
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fold = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("fold1"), F.col("source"))), 1, 8),
            16, 10,
        ).cast("bigint") % 5
    )
    per_source = (
        d.select("source", fold.alias("fold"))
        .groupBy("source")
        .agg(F.countDistinct("fold").alias("nf"))
    )
    assert per_source.filter(F.col("nf") > 1).count() == 0

"""Count-Min sketch properties: overestimate guarantee, merge linearity,
sparse-cell handling, and estimate accuracy at adequate width."""

from __future__ import annotations

from pyspark.sql import functions as F

from pixels_spark.functions.sketches import (
    count_min_build,
    count_min_estimate,
    count_min_merge,
)


def _freq_df(spark, pairs):
    rows = [(k,) for k, n in pairs for _ in range(n)]
    return spark.createDataFrame(rows, "k string")


def test_cms_never_underestimates(spark):
    # 40 keys into 8 buckets: collisions guaranteed; est >= exact for ALL
    pairs = [(f"key{i}", (i % 7) + 1) for i in range(40)]
    df = _freq_df(spark, pairs)
    sketch = count_min_build(df, "k", depth=3, width=8)
    keys = df.select("k").distinct()
    est = {
        r["k"]: r["est_cnt"]
        for r in count_min_estimate(keys, sketch, "k", depth=3, width=8).collect()
    }
    for k, n in pairs:
        assert est[k] >= n, (k, est[k], n)


def test_cms_exact_when_width_ample(spark):
    # 5 keys into 1024 buckets x 4 rows: collision probability ~0 -> every
    # estimate should equal the true count (no systematic inflation)
    pairs = [("a", 3), ("b", 1), ("c", 7), ("d", 2), ("e", 5)]
    df = _freq_df(spark, pairs)
    sketch = count_min_build(df, "k", depth=4, width=1024)
    keys = df.select("k").distinct()
    est = {
        r["k"]: r["est_cnt"]
        for r in count_min_estimate(keys, sketch, "k", depth=4, width=1024).collect()
    }
    assert est == dict(pairs)


def test_cms_merge_equals_whole(spark):
    pairs = [(f"k{i}", i + 1) for i in range(20)]
    df = _freq_df(spark, pairs)
    # deterministic split (limit() would re-evaluate differently per ref)
    half1 = df.filter(F.length("k") == 2)  # k0..k9
    half2 = df.filter(F.length("k") > 2)  # k10..k19
    s_whole = count_min_build(df, "k", depth=3, width=16)
    s_merged = count_min_merge(
        count_min_build(half1, "k", depth=3, width=16),
        count_min_build(half2, "k", depth=3, width=16),
    )
    whole = {(r["r"], r["bucket"]): r["cnt"] for r in s_whole.collect()}
    merged = {(r["r"], r["bucket"]): r["cnt"] for r in s_merged.collect()}
    assert whole == merged


def test_cms_absent_key_estimates_from_zero_cells(spark):
    df = _freq_df(spark, [("x", 4)])
    sketch = count_min_build(df, "k", depth=3, width=1024)
    keys = spark.createDataFrame([("never-seen",)], "k string")
    [row] = count_min_estimate(keys, sketch, "k", depth=3, width=1024).collect()
    assert row["est_cnt"] == 0


def test_cms_skips_null_keys(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",), (None,)], "k string")
    sketch = count_min_build(df, "k", depth=2, width=32)
    total = sketch.groupBy("r").agg(F.sum("cnt").alias("n")).collect()
    # each row counts every non-null input exactly once
    assert all(r["n"] == 2 for r in total)


def test_cms_registry_random_splits_equal_one_shot_build(spark, tmp_path):
    """⊕ law, fuzzed: folding random batch splits through a persisted
    CountMinRegistry yields a sketch bit-identical to the one-shot build
    over the union — and survives registry re-instantiation."""
    import random

    from pixels_spark.functions.sketches import (
        CountMinRegistry,
        count_min_build,
    )

    rng = random.Random(11)
    rows = [(f"k{rng.randint(0, 40)}",) for _ in range(300)]
    df = spark.createDataFrame(rows, "k string")
    for trial in range(3):
        cuts = sorted(rng.sample(range(1, 300), 2))
        parts = [rows[: cuts[0]], rows[cuts[0]:cuts[1]], rows[cuts[1]:]]
        path = str(tmp_path / f"reg{trial}")
        reg = CountMinRegistry(spark, path, depth=3, width=32)
        for i, p in enumerate(parts):
            if i == 2:  # re-open mid-sequence: state is on disk, not in RAM
                reg = CountMinRegistry(spark, path, depth=3, width=32)
            reg.merge_batch(spark.createDataFrame(p, "k string"), "k")
        got = {
            (r["r"], r["bucket"]): r["cnt"] for r in reg.read().collect()
        }
        want = {
            (r["r"], r["bucket"]): r["cnt"]
            for r in count_min_build(df, "k", depth=3, width=32).collect()
        }
        assert got == want, f"trial {trial}"


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch


def _ids(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").cast("bigint").alias("key"))


def test_kmv_merge_law_equals_one_shot_build(spark):
    """⊕ law: kmv_build(A) ⊕ kmv_build(B) ≡ kmv_build(A ∪ B) exactly."""
    from pixels_spark.functions.sketches import kmv_build, kmv_merge

    a, b = _ids(spark, 0, 400), _ids(spark, 300, 700)
    merged = {
        r.hv
        for r in kmv_merge(
            kmv_build(a, "key", 64), kmv_build(b, "key", 64), k=64
        ).collect()
    }
    whole = {r.hv for r in kmv_build(a.unionByName(b), "key", 64).collect()}
    assert merged == whole and len(merged) == 64


def test_kmv_estimate_exact_below_k(spark):
    """A synopsis that saw every distinct key degrades to the exact count."""
    from pixels_spark.functions.sketches import kmv_build, kmv_estimate

    est = kmv_estimate(kmv_build(_ids(spark, 0, 37), "key", 256), 256).collect()
    assert est[0].est_dv == 37.0


def test_kmv_estimate_within_relative_error(spark):
    """Deterministic fixture: k=256 over 5000 distinct keys lands within
    the ~2/√k band (fixed md5 hashes — this is a pinned value, not a
    flaky statistical assertion)."""
    from pixels_spark.functions.sketches import kmv_build, kmv_estimate

    est = kmv_estimate(kmv_build(_ids(spark, 0, 5000), "key", 256), 256).collect()
    assert abs(est[0].est_dv - 5000) / 5000 < 0.15


def test_kmv_skips_nulls_and_dedups_values(spark):
    from pixels_spark.functions.sketches import kmv_build, kmv_estimate

    df = spark.createDataFrame(
        [(1,), (1,), (2,), (None,)], "key bigint"
    )
    sk = kmv_build(df, "key", 8)
    assert sk.count() == 2
    assert kmv_estimate(sk, 8).collect()[0].est_dv == 2.0


def test_kmv_registry_random_splits_equal_one_shot_build(spark, tmp_path):
    """⊕ law, fuzzed: folding random batch splits through a persisted
    KmvRegistry yields a synopsis bit-identical to the one-shot build
    over the union — and survives registry re-instantiation."""
    import random

    from pixels_spark.functions.sketches import KmvRegistry, kmv_build

    rng = random.Random(13)
    rows = [(f"k{rng.randint(0, 500)}",) for _ in range(600)]
    df = spark.createDataFrame(rows, "k string")
    for trial in range(3):
        cuts = sorted(rng.sample(range(1, 600), 2))
        parts = [rows[: cuts[0]], rows[cuts[0]:cuts[1]], rows[cuts[1]:]]
        path = str(tmp_path / f"reg{trial}")
        reg = KmvRegistry(spark, path, k=64)
        for i, p in enumerate(parts):
            if i == 2:  # re-open mid-sequence: state is on disk, not in RAM
                reg = KmvRegistry(spark, path, k=64)
            reg.merge_batch(spark.createDataFrame(p, "k string"), "k")
        got = sorted(r["hv"] for r in reg.read().collect())
        want = sorted(r["hv"] for r in kmv_build(df, "k", 64).collect())
        assert got == want and len(got) == 64, f"trial {trial}"


# ---------------------------------------------------------------------------
# Equi-width histogram sketch


def test_hist_clamps_out_of_range_into_edge_bins(spark):
    from pixels_spark.functions.sketches import hist_build

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (9.9,), (10.0,), (99.9,), (100.0,), (250.0,), (None,)],
        "x double",
    )
    got = {r["bin"]: r["cnt"] for r in hist_build(df, "x", 0.0, 100.0, 10).collect()}
    # -5 clamps to bin 0; 100/250 clamp to bin 9; NULL skipped
    assert got == {0: 3, 1: 1, 9: 3}


def test_hist_quantile_within_one_bin_width_of_exact(spark):
    from pixels_spark.functions.sketches import hist_build, hist_quantiles

    df = spark.range(0, 1000).select((F.col("id").cast("double")).alias("x"))
    sk = hist_build(df, "x", 0.0, 1000.0, 20)  # bin width 50
    got = {r["q"]: r["est"] for r in hist_quantiles(sk, [0.5, 0.9], 0.0, 1000.0, 20).collect()}
    assert abs(got[0.5] - 500.0) <= 50.0
    assert abs(got[0.9] - 900.0) <= 50.0


def test_hist_registry_random_splits_equal_one_shot_build(spark, tmp_path):
    """⊕ law, fuzzed: folding random batch splits through a persisted
    HistogramRegistry yields bins bit-identical to the one-shot build —
    and survives registry re-instantiation."""
    import random

    from pixels_spark.functions.sketches import HistogramRegistry, hist_build

    rng = random.Random(17)
    rows = [(rng.uniform(-10.0, 110.0),) for _ in range(300)]
    df = spark.createDataFrame(rows, "x double")
    for trial in range(3):
        cuts = sorted(rng.sample(range(1, 300), 2))
        parts = [rows[: cuts[0]], rows[cuts[0]:cuts[1]], rows[cuts[1]:]]
        path = str(tmp_path / f"hreg{trial}")
        reg = HistogramRegistry(spark, path, 0.0, 100.0, bins=16)
        for i, p in enumerate(parts):
            if i == 2:
                reg = HistogramRegistry(spark, path, 0.0, 100.0, bins=16)
            reg.merge_batch(spark.createDataFrame(p, "x double"), "x")
        got = {r["bin"]: r["cnt"] for r in reg.read().collect()}
        want = {
            r["bin"]: r["cnt"]
            for r in hist_build(df, "x", 0.0, 100.0, 16).collect()
        }
        assert got == want, f"trial {trial}"


def test_registry_merge_batch_is_idempotent_on_replayed_batch_id(
    spark, tmp_path
):
    """Structured Streaming's at-least-once foreachBatch contract: after a
    crash between sink commit and checkpoint commit, the SAME batch id is
    re-delivered. With batch_id passed, the replayed fold must be a no-op
    (counters not double-summed) — and the guard must survive registry
    re-instantiation (the last-applied id lives in the state JSON)."""
    from pixels_spark.functions.sketches import (
        CountMinRegistry,
        HistogramRegistry,
        KmvRegistry,
    )

    df1 = spark.createDataFrame([("a",), ("b",), ("a",)], "k string")
    df2 = spark.createDataFrame([("b",), ("c",)], "k string")

    def snap(reg):
        return sorted(tuple(r) for r in reg.read().collect())

    reg = CountMinRegistry(spark, str(tmp_path / "cms"), depth=3, width=32)
    reg.merge_batch(df1, "k", batch_id=0)
    reg.merge_batch(df2, "k", batch_id=1)
    want = snap(reg)
    reg.merge_batch(df2, "k", batch_id=1)  # in-process replay
    assert snap(reg) == want
    reg = CountMinRegistry(spark, str(tmp_path / "cms"), depth=3, width=32)
    reg.merge_batch(df2, "k", batch_id=1)  # replay after restart
    assert snap(reg) == want

    nums = spark.createDataFrame([(1.0,), (5.0,), (9.0,)], "x double")
    hreg = HistogramRegistry(
        spark, str(tmp_path / "hist"), lo=0.0, hi=10.0, bins=8
    )
    hreg.merge_batch(nums, "x", batch_id=0)
    want_h = snap(hreg)
    hreg.merge_batch(nums, "x", batch_id=0)
    assert snap(hreg) == want_h

    kreg = KmvRegistry(spark, str(tmp_path / "kmv"), k=16)
    kreg.merge_batch(df1, "k", batch_id=0)
    st0 = kreg._state()["n"]
    kreg.merge_batch(df1, "k", batch_id=0)
    assert kreg._state()["n"] == st0  # replay skipped, no state rewrite

"""asof_join / range_join semantics (operators/temporal.py).

Hand-built micro-cases pin the tricky edges — equal-ts ties, unmatched
rows, tolerance, null keys, bound closedness — and plan asserts pin the
scale contract: no nested-loop/cartesian join anywhere in either operator.
The fixture-scale behavior is oracled against DuckDB's native ASOF JOIN by
the declared queries (queries/temporalq.py).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pixels_spark.operators.temporal import asof_join, range_join


def _ts(s: str):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 100.0),
            ("A", _ts("2024-01-01 10:00:05"), 101.0),
            ("A", _ts("2024-01-01 10:01:00"), 102.0),
            ("B", _ts("2024-01-01 10:00:03"), 200.0),
            (None, _ts("2024-01-01 10:00:00"), 999.0),
        ],
        "sym string, qts timestamp, px double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 10:00:04"), 10),  # -> 10:00:00 quote
            (2, "A", _ts("2024-01-01 10:00:05"), 20),  # equal ts matches
            (3, "A", _ts("2024-01-01 09:59:00"), 30),  # before all -> null
            (4, "B", _ts("2024-01-01 10:05:00"), 40),  # -> B's only quote
            (5, "C", _ts("2024-01-01 10:00:00"), 50),  # no right key -> null
            (6, None, _ts("2024-01-01 10:00:00"), 60),  # null key never matches
        ],
        "tid long, sym string, tts timestamp, qty long",
    )


def test_asof_backward_left(spark, quotes, trades):
    out = {
        r["tid"]: (r["r_px"], r["r_qts"])
        for r in asof_join(
            trades, quotes, by=["sym"], left_ts="tts", right_ts="qts"
        ).collect()
    }
    assert out[1] == (100.0, _ts("2024-01-01 10:00:00"))
    assert out[2] == (101.0, _ts("2024-01-01 10:00:05"))  # ts tie: inclusive
    assert out[3] == (None, None)
    assert out[4] == (200.0, _ts("2024-01-01 10:00:03"))
    assert out[5] == (None, None)
    assert out[6] == (None, None)  # null-null must NOT match (SQL semantics)


def test_asof_inner_drops_unmatched(spark, quotes, trades):
    got = asof_join(
        trades, quotes, by=["sym"], left_ts="tts", right_ts="qts", how="inner"
    )
    assert sorted(r["tid"] for r in got.collect()) == [1, 2, 4]


def test_asof_forward_and_tolerance(spark, quotes, trades):
    fwd = {
        r["tid"]: r["r_px"]
        for r in asof_join(
            trades, quotes, by=["sym"], left_ts="tts", right_ts="qts",
            direction="forward",
        ).collect()
    }
    # trade 1 at 10:00:04 -> next quote 10:00:05; trade 3 -> first A quote
    assert fwd[1] == 101.0
    assert fwd[2] == 101.0  # equal ts still matches in forward mode
    assert fwd[3] == 100.0
    assert fwd[4] is None  # B has no later quote

    tol = {
        r["tid"]: r["r_px"]
        for r in asof_join(
            trades, quotes, by=["sym"], left_ts="tts", right_ts="qts",
            direction="forward", tolerance=F.lit(30_000_000),  # 30s in us
        ).collect()
    }
    assert tol[1] == 101.0 and tol[3] is None  # 60s gap exceeds 30s tolerance


def test_asof_plan_has_no_nested_loop(spark, quotes, trades):
    plan = asof_join(
        trades, quotes, by=["sym"], left_ts="tts", right_ts="qts"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


@pytest.fixture(scope="module")
def points(spark):
    return spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 17.0), (4, 99.0), (5, None)],
        "pid long, x double",
    )


@pytest.fixture(scope="module")
def intervals(spark):
    return spark.createDataFrame(
        [(100, 0.0, 10.0), (200, 10.0, 20.0), (300, 4.0, 18.0)],
        "iid long, lo double, hi double",
    )


def test_range_join_closed_both(spark, points, intervals):
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(points, intervals, "x", "lo", "hi", 8.0).collect()
    )
    assert got == [(1, 100), (1, 300), (2, 100), (2, 200), (2, 300), (3, 200), (3, 300)]


def test_range_join_open_bounds(spark, points, intervals):
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, "x", "lo", "hi", 8.0, closed="neither"
        ).collect()
    )
    # x=10 now matches neither [0,10) upper-open nor (10,20] lower-open
    assert got == [(1, 100), (1, 300), (2, 300), (3, 200), (3, 300)]


def test_range_join_left_keeps_unmatched(spark, points, intervals):
    got = range_join(points, intervals, "x", "lo", "hi", 8.0, how="left")
    rows = {(r["pid"], r["iid"]) for r in got.collect()}
    assert (4, None) in rows and (5, None) in rows  # out-of-range + null point
    assert len([p for p, i in rows if i is None]) == 2


def test_range_join_plan_is_equi(spark, points, intervals):
    plan = range_join(
        points, intervals, "x", "lo", "hi", 8.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_skew_bucketing_bounds_partitions_and_matches_plain(spark):
    """One hot key carrying 90% of rows: the bucketed plan must (a) return
    exactly the unbucketed result and (b) split the hot key across time
    buckets so no window partition holds the whole key."""
    import datetime as dt

    from pyspark.sql import functions as F

    from pixels_spark.operators.temporal import asof_join

    base = dt.datetime(2024, 1, 1)
    n = 2000
    # 90% of left rows on key 0, spread over n seconds; rest across 9 keys
    left = spark.range(n).select(
        F.col("id").alias("lid"),
        F.when(F.col("id") % 10 < 9, 0).otherwise((F.col("id") % 9) + 1).alias("k"),
        (F.lit(base) + F.make_interval(secs=F.col("id"))).alias("lts"),
    )
    right = spark.range(0, n, 7).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise((F.col("id") % 9) + 1).alias("k"),
        (F.lit(base) + F.make_interval(secs=F.col("id"))).alias("rts"),
        (F.col("id") * 1.0).alias("px"),
    ).dropDuplicates(["k", "rts"])

    bucket_us = 100 * 1_000_000  # 100 s → ~20 buckets over the hot key
    plain = sorted(
        (r["lid"], r["r_px"])
        for r in asof_join(left, right, by=["k"], left_ts="lts",
                           right_ts="rts").collect()
    )
    bucketed = sorted(
        (r["lid"], r["r_px"])
        for r in asof_join(left, right, by=["k"], left_ts="lts", right_ts="rts",
                           skew_bucket_us=bucket_us).collect()
    )
    assert bucketed == plain

    # bound check: max rows per (key, bucket) window partition is far below
    # the hot key's total (which the unbucketed plan would process serially)
    hot_total = left.filter(F.col("k") == 0).count()
    per_part = (
        left.withColumn("_b", F.floor(F.unix_micros("lts") / bucket_us))
        .groupBy("k", "_b")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert hot_total >= 0.85 * n
    assert per_part <= hot_total / 10


def test_spread_never_downscales(spark):
    from pixels_spark.functions.dedup import spread

    n = spark.sparkContext.defaultParallelism
    wide = spark.range(10_000).repartition(4 * n, "id")
    assert spread(wide, "id").rdd.getNumPartitions() == 4 * n
    narrow = spark.range(1000).coalesce(1)
    assert spread(narrow, "id").rdd.getNumPartitions() == n
    # a broadcast-join input has a BroadcastExchange but NO shuffle — the
    # wide scan side's width must still be detected (not squeezed to n)
    from pyspark.sql import functions as F

    wide_scan = spark.range(10_000).repartition(4 * n, "id")
    dim = spark.range(5).select(F.col("id").alias("k"))
    bj = wide_scan.join(F.broadcast(dim), wide_scan["id"] == dim["k"], "left")
    assert spread(bj, "id").rdd.getNumPartitions() == 4 * n


def test_asof_tolerance_and_inner_with_skew_bucketing(spark):
    """tolerance and how='inner' must compose with the bucketed plan —
    matches the unbucketed result exactly."""
    import datetime as dt

    from pyspark.sql import functions as F

    from pixels_spark.operators.temporal import asof_join

    base = dt.datetime(2024, 1, 1)
    left = spark.range(300).select(
        F.col("id").alias("lid"),
        (F.col("id") % 5).alias("k"),
        (F.lit(base) + F.make_interval(secs=F.col("id") * 3)).alias("lts"),
    )
    right = spark.range(0, 900, 11).select(
        (F.col("id") % 5).alias("k"),
        (F.lit(base) + F.make_interval(secs=F.col("id"))).alias("rts"),
        (F.col("id") * 1.0).alias("px"),
    ).dropDuplicates(["k", "rts"])

    for how in ("left", "inner"):
        for direction in ("backward", "forward"):
            kw = dict(by=["k"], left_ts="lts", right_ts="rts",
                      direction=direction, how=how,
                      tolerance=F.lit(20 * 1_000_000))
            plain = sorted(
                (r["lid"], r["r_px"])
                for r in asof_join(left, right, **kw).collect()
            )
            bucketed = sorted(
                (r["lid"], r["r_px"])
                for r in asof_join(left, right, skew_bucket_us=60 * 1_000_000,
                                   **kw).collect()
            )
            assert bucketed == plain, (how, direction)


def test_ts_anomaly_flags_injected_spike_not_baseline(spark, tmp_path):
    """A flat hourly series with one injected 10× spike: the spike hour is
    flagged, baseline hours are not, and the spike's own bucket does not
    contaminate its trailing baseline (window excludes the current row)."""
    import datetime as dt

    from pixels_spark.queries.temporalq import ts_anomaly

    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    for h in range(48):
        n = 50 if h != 40 else 500  # spike at hour 40
        # jitter the flat baseline so variance > 0
        n += h % 3
        for _ in range(n):
            rows.append((eid, base + dt.timedelta(hours=h), 1, "click", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = ts_anomaly(spark, str(tmp_path)).collect()
    hours = {r.hr.hour + 24 * (r.hr.day - 1) for r in got}
    assert 40 in hours
    assert not any(h < 40 for h in hours)  # baseline never flagged
    spike = [r for r in got if r.hr.hour + 24 * (r.hr.day - 1) == 40][0]
    assert spike.z > 10


def test_ts_trend_forecast_recovers_exact_linear_series(spark, tmp_path):
    """Hourly counts that ARE a line (cnt = 10 + 3t) must come back with
    slope=3, intercept=10 exactly, and forecast_next = 10 + 3n."""
    import datetime as dt

    from pixels_spark.queries.temporalq import ts_trend_forecast

    rows, eid = [], 0
    base = dt.datetime(2024, 3, 1)
    n_hours = 12
    for t in range(n_hours):
        for _ in range(10 + 3 * t):
            rows.append((eid, base + dt.timedelta(hours=t), 1, "buy", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = ts_trend_forecast(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r.n == n_hours
    assert abs(r.slope - 3.0) < 1e-9 and abs(r.intercept - 10.0) < 1e-9
    assert abs(r.forecast_next - (10.0 + 3.0 * n_hours)) < 1e-9


def test_ts_cusum_detects_sustained_shift_not_flat_baseline(spark):
    """A flat series never alarms (residuals are -tot < 0 every bucket, so
    S sticks at 0); a doubled rate sustained over the back half accumulates
    past H = 5x mean and alarms, with the peak at the last shifted hour."""
    import datetime as dt

    from pixels_spark.queries.temporalq import cusum_scan

    base = dt.datetime(2024, 3, 1)
    flat = [("flat", base + dt.timedelta(hours=t), 100) for t in range(96)]
    shift = [
        ("shift", base + dt.timedelta(hours=t), 100 if t < 48 else 200)
        for t in range(96)
    ]
    h = spark.createDataFrame(
        flat + shift, "event_type string, hr timestamp, cnt bigint"
    )
    got = {r.event_type: r for r in cusum_scan(h).collect()}
    assert got["flat"].alarm_buckets == 0 and got["flat"].peak_s == 0
    assert got["shift"].alarm_buckets > 0
    # peak CUSUM of a sustained shift is at the series end
    assert got["shift"].peak_hr == base + dt.timedelta(hours=95)
    # first-occurrence tie-break: flat series peaks (S=0) at the FIRST hour
    assert got["flat"].peak_hr == base


def test_asof_nearest_picks_closer_side_ties_backward(spark, quotes, trades):
    from pixels_spark.operators.temporal import asof_join

    out = {
        r["tid"]: r["r_px"]
        for r in asof_join(
            trades, quotes, by=["sym"], left_ts="tts", right_ts="qts",
            direction="nearest",
        ).collect()
    }
    assert out[1] == 101.0  # forward gap 1s beats backward gap 4s
    assert out[2] == 101.0  # equal-ts tie -> backward (same quote here)
    assert out[3] == 100.0  # only forward exists
    assert out[4] == 200.0  # only backward exists
    assert out[5] is None and out[6] is None  # no key / null key

    inner = asof_join(
        trades, quotes, by=["sym"], left_ts="tts", right_ts="qts",
        direction="nearest", how="inner",
    )
    assert sorted(r["tid"] for r in inner.collect()) == [1, 2, 3, 4]


# ---------------------------------------------------------------------------
# theil_sen_guarded: the long-horizon pair budget (VERDICT r10 task #3)


def _exact_theil_sen(days, revs):
    slopes = sorted(
        (revs[j] - revs[i]) / (days[j] - days[i])
        for i in range(len(days))
        for j in range(i + 1, len(days))
    )
    return slopes[-(-len(slopes) // 2) - 1]  # lower median, rank ceil(n/2)


def test_theil_sen_guard_under_budget_is_exact(spark):
    from pixels_spark.queries.temporalq import theil_sen_guarded

    days = list(range(50))
    revs = [2.5 * d + ((d * 37) % 11 - 5) for d in days]
    daily = spark.createDataFrame(
        [(d, float(r)) for d, r in zip(days, revs)], "d bigint, rev double"
    )
    row = theil_sen_guarded(daily, max_pairs=500_000).collect()[0]
    assert (row.n_days, row.n_pairs) == (50, 50 * 49 // 2)
    assert row.theil_sen_slope == pytest.approx(
        _exact_theil_sen(days, revs), abs=1e-12
    )


def test_theil_sen_guard_bins_a_2000_day_span(spark):
    """A multi-year window must NOT build the ~2M-pair frame: past the
    budget the estimator switches to k time bins with C(k,2) <= max_pairs,
    keeping the work bound calendar-invariant while staying outlier-robust
    and slope-accurate on a linear-plus-noise series."""
    from pixels_spark.queries.temporalq import theil_sen_guarded

    days = list(range(2000))
    revs = [
        3.5 * d + ((d * 37) % 13 - 6)  # deterministic bounded noise
        + (10_000.0 if d % 500 == 250 else 0.0)  # 4 gross outlier days
        for d in days
    ]
    daily = spark.createDataFrame(
        [(d, float(r)) for d, r in zip(days, revs)], "d bigint, rev double"
    )
    row = theil_sen_guarded(daily, max_pairs=5000).collect()[0]
    assert row.n_days == 2000
    assert row.n_pairs <= 5000  # C(k,2) within budget, NOT C(2000,2)
    assert row.n_pairs >= 4000  # and k wasn't needlessly small
    assert row.theil_sen_slope == pytest.approx(3.5, rel=0.01)


def test_hodges_lehmann_guard_bins_a_2000_day_span(spark):
    """Same budget contract as theil_sen_guarded, Walsh form: past
    max_pairs the estimator runs over k bin-median points with
    C(k+1,2) <= budget, stays location-accurate on a shifted series and
    robust to gross outlier days; n_days still reports the DAY count."""
    from pixels_spark.queries.temporalq import hodges_lehmann_guarded

    days = list(range(2000))
    revs = [
        100.0 + ((d * 37) % 13 - 6)
        + (50_000.0 if d % 500 == 250 else 0.0)  # 4 gross outliers
        for d in days
    ]
    daily = spark.createDataFrame(
        [(d, float(r)) for d, r in zip(days, revs)], "d bigint, rev double"
    )
    row = hodges_lehmann_guarded(daily, max_pairs=5000).collect()[0]
    assert row.n_days == 2000
    assert 4000 <= row.n_pairs <= 5000  # C(k+1,2) within budget
    assert row.hodges_lehmann == pytest.approx(100.0, abs=2.0)


def test_hodges_lehmann_guard_under_budget_is_exact(spark):
    from pixels_spark.queries.temporalq import hodges_lehmann_guarded

    days = list(range(40))
    revs = [5.0 + ((d * 11) % 7) for d in days]
    daily = spark.createDataFrame(
        [(d, float(r)) for d, r in zip(days, revs)], "d bigint, rev double"
    )
    walsh = sorted(
        (revs[i] + revs[j]) / 2.0
        for i in range(40)
        for j in range(i, 40)
    )
    row = hodges_lehmann_guarded(daily, max_pairs=500_000).collect()[0]
    assert (row.n_days, row.n_pairs) == (40, 40 * 41 // 2)
    assert row.hodges_lehmann == pytest.approx(
        walsh[-(-len(walsh) // 2) - 1], abs=1e-12
    )

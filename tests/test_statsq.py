

def test_dq_checks_one_filescan_per_source_table(spark, sf_dir):
    """The composed rule suite scans each source table exactly once —
    same-table rules share a wide aggregate, and the lineitem/orders
    rules all derive from one full-outer key join."""
    from pixels_spark.queries import load_all_modules

    df = load_all_modules()["dq_checks"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for t in ["documents", "events", "lineitem", "orders", "customer"]:
        n = plan.count(f"{t}.parquet")
        assert n == 1, f"{t}: {n} FileScans"


def _events_frame(spark, rows):
    return spark.createDataFrame(
        [(i, ts, 1, et, v, "{}") for i, (ts, et, v) in enumerate(rows)],
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )


def test_mann_whitney_detects_shift_direction_and_null_case(spark, tmp_path):
    """Identical samples -> z ~ 0 (U = na*nb/2 exactly, by symmetry of the
    construction); B stochastically larger -> U_A small -> z < -3."""
    import datetime as dt

    from pixels_spark.queries.statsq import stat_mann_whitney

    base = dt.datetime(2024, 5, 1)
    same = [(base, "view", float(i % 50)) for i in range(200)] + [
        (base, "click", float(i % 50)) for i in range(200)
    ]
    _events_frame(spark, same).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    r = stat_mann_whitney(spark, str(tmp_path)).collect()[0]
    assert r.na == 200 and r.nb == 200
    assert r.two_u == r.na * r.nb  # 2U = na*nb exactly on identical samples
    assert abs(r.z) < 1e-9

    shifted = [(base, "view", float(i % 50)) for i in range(200)] + [
        (base, "click", 100.0 + float(i % 50)) for i in range(200)
    ]
    _events_frame(spark, shifted).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    r2 = stat_mann_whitney(spark, str(tmp_path)).collect()[0]
    assert r2.two_u == 0  # every click value exceeds every view value
    assert r2.z < -3


def test_chi_square_zero_on_independent_grid(spark, tmp_path):
    """A perfectly independent type x hour grid (every cell = 5) must give
    chi2 = 0 exactly; concentrating one type in one hour makes it large."""
    import datetime as dt

    from pixels_spark.queries.statsq import stat_chi_square

    base = dt.datetime(2024, 5, 1)
    indep = [
        (base + dt.timedelta(hours=h), et, 1.0)
        for h in range(6)
        for et in ("a", "b")
        for _ in range(5)
    ]
    _events_frame(spark, indep).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    r = stat_chi_square(spark, str(tmp_path)).collect()[0]
    assert r.dof == 5 and r.chi2 == 0.0 and r.cramers_v == 0.0

    dep = [
        (base + dt.timedelta(hours=0), "a", 1.0) for _ in range(30)
    ] + [(base + dt.timedelta(hours=1), "b", 1.0) for _ in range(30)]
    _events_frame(spark, dep).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    r2 = stat_chi_square(spark, str(tmp_path)).collect()[0]
    assert r2.dof == 1 and r2.chi2 > 50  # fully dependent: chi2 = n = 60


def test_dq_skew_report_one_filescan_per_leg(spark, sf_dir):
    """The one-pass entropy identity means each key's table is scanned
    exactly once per leg (lineitem appears in two legs -> 2 scans)."""
    from pixels_spark.queries import load_all_modules

    df = load_all_modules()["dq_skew_report"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("orders.parquet") == 1
    assert plan.count("lineitem.parquet") == 2  # two key legs
    assert plan.count("events.parquet") == 1


def test_single_scan_queries_plan(spark, sf_dir):
    """Queries whose docstrings claim ONE FileScan must show exactly one
    (the lazy-plan-subtree-reuse lesson, pinned)."""
    from pixels_spark.queries import load_all_modules

    R = load_all_modules()
    for name, table in [
        ("txt_priority_sample", "documents"),
        ("funnel_wilson_ci", "events"),
        ("txt_group_kfold", "documents"),
    ]:
        plan = R[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert plan.count(f"{table}.parquet") == 1, name


def test_spearman_r2_ranks_exact_with_ties(spark):
    """The doubled-average-rank kernel — the SAME _attach_r2_ranks that
    stat_spearman executes (ADVICE r9: the test previously validated a
    parallel value-grain variant) — must equal the textbook tie-average
    ranks exactly, and the assembled rho must match a hand-computed
    Pearson-on-ranks on a small example with heavy ties."""
    from pixels_spark.queries.statsq import _attach_r2_ranks
    import pyspark.sql.functions as F

    # values: [5, 5, 7, 9, 9, 9] → avg ranks [1.5, 1.5, 3, 5, 5, 5]
    rows = [("g", v) for v in (5.0, 5.0, 7.0, 9.0, 9.0, 9.0)]
    df0 = spark.createDataFrame(rows, "grp string, v double")
    got = {
        (r.v, r.r2)
        for r in _attach_r2_ranks(df0, "v", 2.0, "r2").collect()
    }
    assert got == {(5.0, 3), (7.0, 6), (9.0, 10)}  # 2x the average ranks

    # full rho on hand-checkable data: y strictly reverses x → rho = -1
    import math

    xs = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    data = [("a", x, 7.0 - x) for x in xs]
    df = spark.createDataFrame(data, "grp string, x double, y double")
    rr = _attach_r2_ranks(df, "x", 2.0, "ra")
    rr = _attach_r2_ranks(rr, "y", 2.0, "rb")
    s = rr.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ra").alias("sx"), F.sum("rb").alias("sy"),
        F.sum(F.col("ra") * F.col("rb")).alias("sxy"),
        F.sum(F.col("ra") * F.col("ra")).alias("sxx"),
        F.sum(F.col("rb") * F.col("rb")).alias("syy"),
    ).collect()[0]
    num = s.n * s.sxy - s.sx * s.sy
    rho = num / math.sqrt(
        (s.n * s.sxx - s.sx**2) * (s.n * s.syy - s.sy**2)
    )
    assert abs(rho - (-1.0)) < 1e-12

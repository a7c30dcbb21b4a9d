

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

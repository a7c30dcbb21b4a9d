"""Z-order layout tests: clustering quality + actual pruning benefit."""

from __future__ import annotations

from pyspark.sql import functions as F

from pixels_spark.catalog import load_table
from pixels_spark.storage.layout_opt import (
    file_pruning_stats,
    write_zordered,
    zorder_values,
)


def _files_hit(stats, lo, hi):
    """Files whose [min,max] range intersects [lo,hi]."""
    return sum(1 for mn, mx in stats if mn is not None and not (mx < lo or mn > hi))


def test_zorder_preserves_rows_and_values(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    dest = str(tmp_path / "z")
    write_zordered(li, dest, ["l_partkey", "l_suppkey"], n_files=8)
    back = spark.read.parquet(dest)
    assert back.count() == li.count()
    a = li.agg(F.sum("l_orderkey"), F.sum("l_quantity")).first()
    b = back.agg(F.sum("l_orderkey"), F.sum("l_quantity")).first()
    assert tuple(a) == tuple(b)


def test_zorder_improves_multi_column_pruning(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    n_files = 8
    # baseline: cluster by partkey only (single-column sort)
    single = str(tmp_path / "single")
    (
        li.repartitionByRange(n_files, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(single)
    )
    zdir = str(tmp_path / "z")
    write_zordered(li, zdir, ["l_partkey", "l_suppkey"], n_files=n_files)

    # a narrow range filter on the SECOND column: single-column layout
    # scatters l_suppkey everywhere (every file hit); z-order keeps it
    # clustered enough to skip files
    s_max = li.agg(F.max("l_suppkey")).first()[0]
    lo, hi = 0, max(1, s_max // 8)
    single_hit = _files_hit(file_pruning_stats(single, "l_suppkey"), lo, hi)
    z_hit = _files_hit(file_pruning_stats(zdir, "l_suppkey"), lo, hi)
    assert z_hit < single_hit, (z_hit, single_hit)
    # and the first column still prunes under z-order
    p_max = li.agg(F.max("l_partkey")).first()[0]
    zp_hit = _files_hit(
        file_pruning_stats(zdir, "l_partkey"), 0, max(1, p_max // 8)
    )
    assert zp_hit < n_files


def test_zvalue_monotone_in_ranks(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").limit(1000)
    z = zorder_values(li, ["l_partkey", "l_suppkey"], bits=8)
    assert z.filter(F.col("_zvalue") < 0).count() == 0
    assert z.select("_zvalue").distinct().count() > 1


def test_zorder_plan_has_no_global_sort(spark, sf_dir):
    """The ranking must stay map-side: no window, no single-partition
    exchange/sort anywhere in the z-value plan (the failure mode of the
    old unpartitioned-ntile version, which serialized the table through
    one task)."""
    li = load_table(spark, sf_dir, "lineitem")
    z = zorder_values(li, ["l_partkey", "l_suppkey"], bits=8)
    plan = z._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "SinglePartition" not in plan, plan
    assert "Sort" not in plan, plan


def test_zorder_rank_is_order_preserving(spark, sf_dir):
    """Higher values never get a lower bucket rank (cut-point fold is
    monotone) — the property that makes min/max pruning valid."""
    li = load_table(spark, sf_dir, "lineitem").limit(2000)
    z = zorder_values(li.select("l_partkey"), ["l_partkey"], bits=6)
    rows = z.select("l_partkey", "_zvalue").distinct().collect()
    pairs = sorted((r.l_partkey, r._zvalue) for r in rows)
    for (v1, z1), (v2, z2) in zip(pairs, pairs[1:]):
        if v1 < v2:
            assert z1 <= z2, (v1, z1, v2, z2)

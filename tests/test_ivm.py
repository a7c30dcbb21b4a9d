"""Incremental materialized-rollup maintenance (mvcc/ivm.py).

Invariant under test: after ANY sequence of insert/merge/delete batches,
``refresh()`` (delta folding) equals ``full_refresh()`` (from-scratch
aggregation) EXACTLY — decimal accumulation makes the delta arithmetic
drift-free.
"""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from pixels_spark.mvcc.ivm import MaterializedRollup
from pixels_spark.mvcc.table import MvccTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, tmp_path, name):
    t = MvccTable(spark, os.path.join(str(tmp_path), name), key_col="k")
    mv = MaterializedRollup(
        spark, os.path.join(str(tmp_path), name + "_mv"), t, ["g"], ["v"]
    )
    return t, mv


def _df(spark, rows):
    return spark.createDataFrame([Row(k=k, g=g, v=float(v)) for k, g, v in rows])


def _full(spark, tmp_path, t, name):
    """From-scratch rollup over the same table, for equality checks."""
    ref = MaterializedRollup(
        spark, os.path.join(str(tmp_path), name), t, ["g"], ["v"]
    )
    ref.full_refresh()
    return ref.read()


def test_refresh_equals_full_recompute_through_updates_and_deletes(
    spark, tmp_path
):
    t, mv = _mk(spark, tmp_path, "t1")
    t.insert(_df(spark, [(1, "a", 1.5), (2, "a", 2.25), (3, "b", 10.0)]))
    mv.full_refresh()
    # batch 1: update k=2 (new version), insert k=4
    t.merge(_df(spark, [(2, "a", 200.0), (4, "b", 4.0)]))
    # batch 2: delete k=3
    t.delete([3])
    mv.refresh()
    assert _rows(mv.read()) == _rows(_full(spark, tmp_path, t, "ref1"))
    got = {r["g"]: r for r in mv.read().collect()}
    assert got["a"]["n_rows"] == 2
    assert float(got["a"]["sum_v"]) == 201.5  # 1.5 + 200.0 (2's old version gone)
    assert got["b"]["n_rows"] == 1 and float(got["b"]["sum_v"]) == 4.0


def test_group_disappears_when_emptied(spark, tmp_path):
    t, mv = _mk(spark, tmp_path, "t2")
    t.insert(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    mv.full_refresh()
    t.delete([2])
    mv.refresh()
    assert [r["g"] for r in mv.read().collect()] == ["a"]
    assert _rows(mv.read()) == _rows(_full(spark, tmp_path, t, "ref2"))


def test_noop_refresh_keeps_state_and_data(spark, tmp_path):
    t, mv = _mk(spark, tmp_path, "t3")
    t.insert(_df(spark, [(1, "a", 1.0)]))
    ts = mv.full_refresh()
    before = _rows(mv.read())
    assert mv.refresh() == ts  # nothing committed since → no-op
    assert _rows(mv.read()) == before


def test_chain_of_refreshes_stays_exact(spark, tmp_path):
    t, mv = _mk(spark, tmp_path, "t4")
    t.insert(_df(spark, [(i, "g" + str(i % 3), i * 0.1) for i in range(30)]))
    mv.full_refresh()
    # three delta rounds: update evens, delete multiples of 5, insert new
    t.merge(_df(spark, [(i, "g" + str(i % 3), i * 7.0) for i in range(0, 30, 2)]))
    mv.refresh()
    t.delete(list(range(0, 30, 5)))
    mv.refresh()
    t.insert(_df(spark, [(i, "gX", 1.25) for i in range(100, 110)]))
    mv.refresh()
    assert _rows(mv.read()) == _rows(_full(spark, tmp_path, t, "ref4"))


def test_refresh_before_full_refresh_bootstraps(spark, tmp_path):
    t, mv = _mk(spark, tmp_path, "t5")
    t.insert(_df(spark, [(1, "a", 1.0)]))
    mv.refresh()  # no state yet → behaves like full_refresh
    assert _rows(mv.read()) == _rows(_full(spark, tmp_path, t, "ref5"))


def test_old_rollup_dir_is_swapped_out(spark, tmp_path):
    t, mv = _mk(spark, tmp_path, "t6")
    t.insert(_df(spark, [(1, "a", 1.0)]))
    mv.full_refresh()
    t.insert(_df(spark, [(2, "a", 2.0)]))
    mv.refresh()
    dirs = [d for d in os.listdir(mv.path) if d.startswith("rollup_ts=")]
    assert len(dirs) == 1  # previous generation cleaned up after the swing


def test_touched_keys_scan_is_partition_pruned(spark, tmp_path):
    """The delta discovery reads ONLY the new _commit= directories —
    visible as a PartitionFilters entry on _commit, same contract as the
    MVCC snapshot read pruning."""
    from pixels_spark.plans.pushdown import explain_str

    t, mv = _mk(spark, tmp_path, "t7")
    ts1 = t.insert(_df(spark, [(1, "a", 1.0)]))
    mv.full_refresh()
    ts2 = t.insert(_df(spark, [(2, "b", 2.0)]))
    plan = explain_str(mv._touched_keys(ts1, ts2))
    assert "PartitionFilters" in plan and "_commit" in plan.split(
        "PartitionFilters", 1
    )[1][:300], plan


def test_streaming_ingest_with_per_batch_ivm_refresh(spark, tmp_path):
    """Each micro-batch commits AND folds itself into the rollup — after
    the run the materialized state equals a from-scratch rebuild and the
    refresh pointer sits at the table's high watermark (no pending delta)."""
    import os

    from pixels_spark.mvcc.table import MvccTable
    from pixels_spark.streaming.ingest import ingest_stream_with_ivm

    src = str(tmp_path / "src")
    df = spark.createDataFrame(
        [(i, "g" + str(i % 3), float(i)) for i in range(60)], ["k", "g", "v"]
    )
    df.filter(F.col("k") < 30).coalesce(1).write.mode("append").parquet(src)
    df.filter(F.col("k") >= 30).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("k long, g string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t = MvccTable(spark, str(tmp_path / "tbl"), key_col="k")
    mv = MaterializedRollup(spark, str(tmp_path / "mv"), t, ["g"], ["v"])
    q = ingest_stream_with_ivm(stream, t, mv, str(tmp_path / "ck"))
    assert q.awaitTermination(300)
    assert _rows(mv.read()) == _rows(_full(spark, tmp_path, t, "sref"))
    assert mv._state()["last_ts"] == t.trans.high_watermark
    got = {r["g"]: r["n_rows"] for r in mv.read().collect()}
    assert got == {"g0": 20, "g1": 20, "g2": 20}


def test_ivm_random_operation_sequences(spark, tmp_path):
    """Randomized insert/merge/delete sequences with a refresh after each
    step: the incremental rollup must equal a from-scratch rebuild at
    EVERY point (decimal-exact delta folding has no drift)."""
    import random

    for seed in (7, 23):
        rng = random.Random(seed)
        t, mv = _mk(spark, tmp_path, f"rand{seed}")
        t.insert(_df(spark, [(i, f"g{i % 4}", rng.uniform(-50, 50)) for i in range(25)]))
        mv.full_refresh()
        next_key = 25
        for step in range(4):
            op = rng.choice(["insert", "merge", "delete"])
            if op == "insert":
                rows = [
                    (next_key + j, f"g{rng.randrange(4)}", rng.uniform(-50, 50))
                    for j in range(rng.randint(1, 6))
                ]
                next_key += len(rows)
                t.insert(_df(spark, rows))
            elif op == "merge":
                rows = [
                    (rng.randrange(next_key), f"g{rng.randrange(4)}",
                     rng.uniform(-50, 50))
                    for _ in range(rng.randint(1, 6))
                ]
                # merge sources need unique keys
                rows = list({r[0]: r for r in rows}.values())
                t.merge(_df(spark, rows))
            else:
                ks = [rng.randrange(next_key) for _ in range(rng.randint(1, 5))]
                t.delete(sorted(set(ks)))
            mv.refresh()
            assert _rows(mv.read()) == _rows(
                _full(spark, tmp_path, t, f"rand{seed}_ref{step}")
            ), f"seed={seed} step={step} op={op}"


# -- join-view IVM (MaterializedJoinRollup) -------------------------------


def _mk_join(spark, tmp_path, name):
    from pixels_spark.mvcc.ivm import MaterializedJoinRollup

    fact = MvccTable(spark, os.path.join(str(tmp_path), name + "_f"), key_col="k")
    dim = MvccTable(spark, os.path.join(str(tmp_path), name + "_d"), key_col="jk")
    mv = MaterializedJoinRollup(
        spark, os.path.join(str(tmp_path), name + "_mv"),
        fact, dim, "jk", ["g"], ["v"],
    )
    return fact, dim, mv


def _fdf(spark, rows):
    return spark.createDataFrame([Row(k=k, jk=jk, v=float(v)) for k, jk, v in rows])


def _ddf(spark, rows):
    return spark.createDataFrame([Row(jk=jk, g=g) for jk, g in rows])


def _join_full(spark, tmp_path, fact, dim, name):
    from pixels_spark.mvcc.ivm import MaterializedJoinRollup

    ref = MaterializedJoinRollup(
        spark, os.path.join(str(tmp_path), name), fact, dim, "jk", ["g"], ["v"]
    )
    ref.full_refresh()
    return ref.read()


def test_join_rollup_dim_update_reattributes_fact_mass(spark, tmp_path):
    """The case single-table IVM can't express: a dim row changes group and
    every joined fact row's mass must move — without rescanning the fact."""
    fact, dim, mv = _mk_join(spark, tmp_path, "jr1")
    fact.insert(_fdf(spark, [(1, 10, 2.5), (2, 10, 4.0), (3, 11, 1.0)]))
    dim.insert(_ddf(spark, [(10, "gold"), (11, "silver")]))
    mv.full_refresh()
    dim.merge(_ddf(spark, [(10, "silver")]))  # 10's segment changes
    mv.refresh()
    got = {r["g"]: (r["n_rows"], float(r["sum_v"])) for r in mv.read().collect()}
    assert got == {"silver": (3, 7.5)}
    assert _rows(mv.read()) == _rows(_join_full(spark, tmp_path, fact, dim, "jr1_ref"))


def test_join_rollup_dim_delete_drops_joined_mass(spark, tmp_path):
    fact, dim, mv = _mk_join(spark, tmp_path, "jr2")
    fact.insert(_fdf(spark, [(1, 10, 2.0), (2, 11, 3.0)]))
    dim.insert(_ddf(spark, [(10, "a"), (11, "b")]))
    mv.full_refresh()
    dim.delete([10])
    mv.refresh()
    got = {r["g"] for r in mv.read().collect()}
    assert got == {"b"}
    assert _rows(mv.read()) == _rows(_join_full(spark, tmp_path, fact, dim, "jr2_ref"))


def test_join_rollup_random_ops_both_sides(spark, tmp_path):
    """Random interleavings on BOTH tables — including steps where both
    sides change before one refresh — must equal a from-scratch rebuild
    exactly at every point."""
    import random

    for seed in (11, 42):
        rng = random.Random(seed)
        fact, dim, mv = _mk_join(spark, tmp_path, f"jrand{seed}")
        n_dim = 6
        dim.insert(_ddf(spark, [(j, f"g{j % 3}") for j in range(n_dim)]))
        fact.insert(
            _fdf(spark, [
                (i, rng.randrange(n_dim + 2), rng.uniform(-50, 50))
                for i in range(20)
            ])
        )
        mv.full_refresh()
        next_key = 20
        for step in range(5):
            for op in rng.sample(
                ["f_insert", "f_merge", "f_delete", "d_merge", "d_insert",
                 "d_delete"],
                k=rng.randint(1, 2),
            ):
                if op == "f_insert":
                    rows = [
                        (next_key + j, rng.randrange(n_dim + 2),
                         rng.uniform(-50, 50))
                        for j in range(rng.randint(1, 5))
                    ]
                    next_key += len(rows)
                    fact.insert(_fdf(spark, rows))
                elif op == "f_merge":
                    rows = list({
                        rng.randrange(next_key): None for _ in range(3)
                    })
                    fact.merge(_fdf(spark, [
                        (k, rng.randrange(n_dim + 2), rng.uniform(-50, 50))
                        for k in rows
                    ]))
                elif op == "f_delete":
                    fact.delete(sorted({rng.randrange(next_key) for _ in range(3)}))
                elif op == "d_merge":
                    jk = rng.randrange(n_dim)
                    dim.merge(_ddf(spark, [(jk, f"g{rng.randrange(3)}")]))
                elif op == "d_insert":
                    dim.merge(_ddf(spark, [(n_dim, f"g{rng.randrange(3)}")]))
                    n_dim += 1
                else:
                    dim.delete([rng.randrange(n_dim)])
            mv.refresh()
            assert _rows(mv.read()) == _rows(
                _join_full(spark, tmp_path, fact, dim, f"jrand{seed}_ref{step}")
            ), f"seed={seed} step={step}"


def test_join_rollup_noop_refresh(spark, tmp_path):
    fact, dim, mv = _mk_join(spark, tmp_path, "jr3")
    fact.insert(_fdf(spark, [(1, 10, 2.0)]))
    dim.insert(_ddf(spark, [(10, "a")]))
    ts = mv.full_refresh()
    assert mv.refresh() == ts
    assert _rows(mv.read()) == _rows(_join_full(spark, tmp_path, fact, dim, "jr3_ref"))


def test_join_rollup_rejects_wrong_dim_key(spark, tmp_path):
    import pytest as _pytest

    from pixels_spark.mvcc.ivm import MaterializedJoinRollup

    fact = MvccTable(spark, os.path.join(str(tmp_path), "wf"), key_col="k")
    dim = MvccTable(spark, os.path.join(str(tmp_path), "wd"), key_col="other")
    with _pytest.raises(ValueError, match="join key"):
        MaterializedJoinRollup(
            spark, os.path.join(str(tmp_path), "wmv"), fact, dim, "jk", ["g"], ["v"]
        )

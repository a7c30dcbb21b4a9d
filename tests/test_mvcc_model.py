"""Model-based MVCC testing: random op sequences vs an in-memory model.

The trickiest semantics in the engine are snapshot visibility under
interleaved insert/delete/update (delete hides strictly-older versions;
updates are atomic delete+insert). A reference Python model replays each
random operation sequence; after every commit, `read(ts)` for EVERY
historical ts must match the model exactly — the strongest guarantee that
time travel never changes retroactively.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row

from pixels_spark.mvcc import MvccTable


class Model:
    """Reference implementation: versions = {key: [(commit_ts, value)]},
    deletes = {key: [delete_ts]}."""

    def __init__(self):
        self.versions: dict[int, list[tuple[int, int]]] = {}
        self.deletes: dict[int, list[int]] = {}

    def insert(self, keys, val, ts):
        for k in keys:
            self.versions.setdefault(k, []).append((ts, val))

    def delete(self, keys, ts):
        for k in keys:
            self.deletes.setdefault(k, []).append(ts)

    def visible_rows(self, ts) -> int:
        n = 0
        for k, vers in self.versions.items():
            dels = [d for d in self.deletes.get(k, []) if d <= ts]
            dmax = max(dels) if dels else -1
            for cts, _ in vers:
                if cts <= ts and not (cts < dmax):
                    n += 1
        return n


@pytest.mark.parametrize("seed", [11, 23, 37])
def test_random_histories_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    table = MvccTable(spark, str(tmp_path / f"t{seed}"), key_col="k")
    model = Model()
    commit_log: list[int] = []
    keyspace = list(range(20))

    for step in range(6):
        op = rng.choice(["insert", "delete", "update"])
        keys = rng.sample(keyspace, rng.randint(1, 6))
        if op == "insert":
            df = spark.createDataFrame([Row(k=k, v=step) for k in keys])
            ts = table.insert(df)
            model.insert(keys, step, ts)
        elif op == "delete":
            ts = table.delete(keys)
            model.delete(keys, ts)
        else:  # update = delete + insert at one ts
            df = spark.createDataFrame([Row(k=k, v=step) for k in keys])
            ts = table.update(df)
            model.delete(keys, ts)
            model.insert(keys, step, ts)
        commit_log.append(ts)

        # EVERY historical snapshot must still match the model
        for t in commit_log:
            got = table.read(t).count()
            want = model.visible_rows(t)
            assert got == want, (
                f"seed={seed} step={step} snapshot@{t}: engine={got} model={want}"
            )


# ---------------------------------------------------------------------------
# snapshot_diff vs a dict model over random mutation sequences


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ops = st.lists(
    st.tuples(
        st.sampled_from(["insert", "update", "delete"]),
        st.lists(st.integers(0, 5), min_size=1, max_size=3, unique=True),
    ),
    min_size=2,
    max_size=6,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops, a=st.integers(0, 5), b=st.integers(0, 5))
def test_snapshot_diff_matches_dict_model(spark, tmp_path_factory, ops, a, b):
    """Random insert/update/delete sequences; a dict snapshot is recorded
    after every commit; snapshot_diff between two random commit indices
    must equal the model's added/removed/changed classification."""
    from pixels_spark.mvcc.table import MvccTable

    # seed insert: diffing a never-written table is a defined error (the
    # row schema is unknown until the first insert — engine-guarded)
    ops = [("insert", [0, 1])] + ops
    ia, ib = min(a, len(ops) - 1), min(b, len(ops) - 1)
    t = MvccTable(
        spark, str(tmp_path_factory.mktemp("sdiff") / "tbl"), key_col="k"
    )
    model: dict[int, int] = {}
    snapshots, ts_list = [], []
    version = 0
    for op, keys in ops:
        version += 1
        if op == "insert":
            rows = [(k, version * 100 + k) for k in keys]
            ts = t.insert(spark.createDataFrame(rows, ["k", "v"]))
            model.update({k: v for k, v in rows})
        elif op == "update":
            rows = [(k, version * 100 + k) for k in keys]
            ts = t.update(spark.createDataFrame(rows, ["k", "v"]))
            model.update({k: v for k, v in rows})
        else:
            ts = t.delete(keys)
            for k in keys:
                model.pop(k, None)
        snapshots.append(dict(model))
        ts_list.append(ts)

    sa, sb = snapshots[ia], snapshots[ib]
    want = {}
    for k in set(sa) | set(sb):
        if k not in sa:
            want[k] = ("added", None, sb[k])
        elif k not in sb:
            want[k] = ("removed", sa[k], None)
        elif sa[k] != sb[k]:
            want[k] = ("changed", sa[k], sb[k])
    got = {
        r["k"]: (
            r["change"],
            r["old"]["v"] if r["old"] is not None else None,
            r["new"]["v"] if r["new"] is not None else None,
        )
        for r in t.snapshot_diff(ts_list[ia], ts_list[ib]).collect()
    }
    assert got == want

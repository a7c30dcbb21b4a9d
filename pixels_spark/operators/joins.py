"""Equi-join operators + algorithm selection.

Reference: ``pixels-executor/.../join/`` — ``JoinType.java:28-34``
(EQUI_INNER/LEFT/RIGHT/FULL; semi/anti are *not* kernel types,
``Joiner.java:44-45``), ``JoinAlgorithm.java:26-35`` (BROADCAST /
PARTITIONED / SORTED / *_CHAIN), ``HashJoiner``/``SortedJoiner`` kernels,
and the cost decision in ``pixels-planner/.../PlanOptimizer.java:94-123``
(small side ≤ 256 MB and ≤ 20.48 M rows → BROADCAST else PARTITIONED;
build side = fewer selectivity-adjusted rows, :125-172).

Spark mapping: join type strings map 1:1; the algorithm maps to join hints
(broadcast / shuffle_hash / merge) with Catalyst+AQE as the default chooser.
``choose_join_algorithm`` reproduces the reference's static thresholds for
parity tests; production should leave ``algorithm=None`` and let AQE decide
at runtime with real sizes — strictly better than static choice at 100 TB.
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class JoinType(str, Enum):
    """≈ JoinType.java:28-34 (+ the SQL-surface semi/anti that the reference
    delegates to its host engine)."""

    EQUI_INNER = "inner"
    EQUI_LEFT = "left_outer"
    EQUI_RIGHT = "right_outer"
    EQUI_FULL = "full_outer"
    SEMI = "left_semi"
    ANTI = "left_anti"


class JoinAlgorithm(str, Enum):
    """≈ JoinAlgorithm.java:26-35. CHAIN variants are compositions — see
    chain_join()."""

    BROADCAST = "broadcast"
    PARTITIONED = "shuffle_hash"
    SORTED = "merge"


# ≈ join.broadcast.threshold.mb=256 / .rows=20480000 (pixels.properties:187-189)
BROADCAST_THRESHOLD_BYTES = 256 * 1024 * 1024
BROADCAST_THRESHOLD_ROWS = 20_480_000


def choose_join_algorithm(
    small_side_bytes: int, small_side_rows: int
) -> JoinAlgorithm:
    """≈ PlanOptimizer.getJoinAlgorithm:94-123 static thresholds."""
    if (
        small_side_bytes <= BROADCAST_THRESHOLD_BYTES
        and small_side_rows <= BROADCAST_THRESHOLD_ROWS
    ):
        return JoinAlgorithm.BROADCAST
    return JoinAlgorithm.PARTITIONED


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | Column,
    how: JoinType = JoinType.EQUI_INNER,
    algorithm: JoinAlgorithm | None = None,
    build_right: bool = True,
) -> DataFrame:
    """Equi-join with an optional explicit algorithm.

    ``algorithm=None`` → Catalyst/AQE decides (recommended). Otherwise the
    hint goes on the build side (≈ join endian, PlanOptimizer:125-172).
    Null keys never match (SQL semantics ≈ Joiner.java:45-46).
    """
    if algorithm is not None:
        hinted = right if build_right else left
        hinted = hinted.hint(algorithm.value)
        right, left = (hinted, left) if build_right else (right, hinted)
    return left.join(right, on, how.value)


def chain_join(
    large: DataFrame,
    smalls: list[tuple[DataFrame, list[str] | Column]],
    how: JoinType = JoinType.EQUI_INNER,
) -> DataFrame:
    """Left-deep chain of broadcast joins against one large table
    (≈ BROADCAST_CHAIN, BaseBroadcastChainJoinWorker.java:71 /
    PixelsPlanner.getMultiPipelineJoinOperator:357-574). Each small side is
    broadcast; the large side streams through all hash tables in one stage —
    which is exactly what Catalyst emits for chained broadcast joins."""
    out = large
    for small, on in smalls:
        out = out.join(F.broadcast(small), on, how.value)
    return out


def partitioned_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    num_partitions: int | None = None,
    how: JoinType = JoinType.EQUI_INNER,
) -> DataFrame:
    """Explicitly co-partitioned join (≈ PARTITIONED: BasePartitionWorker
    hash-partitions both sides, BasePartitionedJoinWorker joins per
    partition). Spark's shuffle-hash join does the same; the explicit
    repartition form exists for when a downstream op reuses the
    partitioning (shuffle reuse ≈ the reference's materialized partitions)."""
    if num_partitions:
        left = left.repartition(num_partitions, *keys)
        right = right.repartition(num_partitions, *keys)
    return left.join(right.hint("shuffle_hash"), keys, how.value)


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: JoinType = JoinType.EQUI_INNER,
) -> DataFrame:
    """Skew-mitigated equi-join: salt the large side's key, replicate the
    small side across ``salt_buckets`` salts, join on (key, salt).

    The classic manual remedy when one key holds a disproportionate share
    of rows: a plain shuffle join sends the whole hot key to one reducer,
    salting splits it across ``salt_buckets`` tasks. AQE's skew-join
    splitting (enabled in session.py) handles most cases automatically at
    runtime — use this form when the skew is known ahead of time or the
    join sits below an operator AQE can't split (e.g. a window).

    The small side is replicated ×salt_buckets, so keep it genuinely small
    (dimension-sized); result equals the unsalted join exactly — for the
    supported join types. Right/full-outer are rejected: every unmatched
    (key, salt) replica of the small side would emit its own null-padded
    row, so the salted result would NOT equal the unsalted join.
    """
    if how not in (
        JoinType.EQUI_INNER,
        JoinType.EQUI_LEFT,
        JoinType.SEMI,
        JoinType.ANTI,
    ):
        raise ValueError(
            f"salted_join does not support {how.value!r}: the replicated "
            "small side emits spurious null-padded rows for unmatched "
            "(key, salt) replicas under right/full outer joins"
        )
    salted_large = large.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salts = F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    salted_small = small.withColumn("_salt", salts)
    out = salted_large.join(salted_small, [key, "_salt"], how.value)
    return out.drop("_salt")


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 2,
) -> DataFrame:
    """Approximate string (entity-resolution) join: pairs with
    ``levenshtein(left_col, right_col) <= max_dist``, blocked SOUNDLY by
    length — edit distance k implies ``|len(a) - len(b)| <= k``, so the
    left side explodes into its 2k+1 candidate length buckets and the
    join is an EQUI join on the bucket (never a cross join; the edit
    distance runs only on same-bucket candidates).

    Scale: the shuffle is keyed on length → same-length skew is the
    hazard for name-like data. At 100 TB compose blocking keys (length ×
    first-q-gram, or q-gram count filtering: ed<=k pairs share >=
    len-q+1-q*k q-grams) to cut candidates further; length alone keeps
    this oracle-exact (Spark and DuckDB agree on levenshtein values).
    Appends ``_dist`` with the distance.
    """
    lb = F.explode(
        F.sequence(
            F.greatest(F.length(left_col) - max_dist, F.lit(0)),
            F.length(left_col) + max_dist,
        )
    )
    # copy the match strings into uniquely-named internal columns before
    # joining: plain F.col(left_col) is ambiguous when both sides carry
    # the same column name (the usual ER shape), and dataframe-qualified
    # refs trip Spark's ambiguous-self-join detection when left derives
    # from right (probe-against-catalog)
    l = left.withColumn("_lstr", F.col(left_col)).withColumn("_lb", lb)
    r = right.withColumn("_rstr", F.col(right_col)).withColumn(
        "_rb", F.length(right_col)
    )
    return (
        l.join(r, F.col("_lb") == F.col("_rb"))
        .withColumn("_dist", F.levenshtein(F.col("_lstr"), F.col("_rstr")))
        .filter(F.col("_dist") <= max_dist)
        .drop("_lb", "_rb", "_lstr", "_rstr")
    )

"""Temporal joins Spark lacks as built-ins: as-of join and interval (range) join.

Beyond-reference operators (the reference engine has no temporal join
worker; its join surface is equi/semi/anti — ``pixels-executor/.../join/
JoinType.java``). These are the two shapes a time-series / feature-store
workload needs most, expressed Spark-first:

- ``asof_join``: for each left row, the single right row with the largest
  ``right_ts <= left_ts`` (backward; ``forward`` symmetric) sharing the
  ``by`` keys. Implemented as union + window ``last(..., ignorenulls)`` —
  ONE shuffle on the ``by`` keys and a per-partition sort, no range-join
  row explosion, no per-key driver loop. This is the canonical distributed
  as-of (same plan shape Flink/QuestDB use); a naive non-equi join would be
  O(|L|·|R|) per key and is what Spark's BroadcastNestedLoopJoin degrades
  to.
- ``range_join``: point-in-interval join binned to equi-join form: each
  interval explodes to the fixed-width buckets it covers, each point maps
  to exactly one bucket, the join is an equi-join on (keys..., bucket) with
  a residual bounds filter. Points are never duplicated; intervals
  duplicate by ceil(span/width), so pick ``bucket_width`` near the median
  interval span. A pure non-equi join in Spark plans as a nested-loop —
  this form shuffles hash-partitioned like any equi-join and scales
  linearly.

Tie semantics of ``asof_join``: a right row at exactly ``left_ts`` matches
(right sorts before left at equal time). When several right rows share the
same ``(by, right_ts)``, the one chosen is whichever sorts last in the
partition — deterministic only if ``(by, right_ts)`` is unique;
pre-aggregate the right side to one row per (key, ts) otherwise.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _asof_nearest_one_pass(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    tolerance: Column | None,
    how: str,
    right_prefix: str,
) -> DataFrame:
    """Nearest-direction as-of in ONE union + ONE key shuffle (r12
    optimization; was two full backward/forward kernel passes, each with
    its own union, shuffle and events-side scan).

    Both directions are RUNNING ``last(_match, ignorenulls)`` windows
    over the same key partitioning — backward over the (_t asc, _side
    asc) sort (identical window spec to the backward kernel, including
    the right-before-left order at equal ts), forward over the (_t desc,
    _side desc) sort. Shared partitioning means ONE Exchange with two
    in-partition sorts; both frames are growing unbounded-preceding
    accumulators (an unbounded-FOLLOWING first() was measured SLOWER
    than the two-pass form it replaced — Spark re-evaluates shrinking
    frames from scratch per row, O(rows²) per partition).

    A right row at a left row's EXACT ts is visible only to the backward
    window (it sorts before the left row) — which is precisely the
    nearest tie rule: a same-ts match has gap 0, and gap-0 ties resolve
    backward, so the forward window never needs the same-ts row (any
    later forward candidate loses the CASE to the gap-0 backward match).
    With multiple right rows sharing (key, ts) the picked ROW among the
    tied group may differ from the two-pass form's pick — both picks are
    order-arbitrary (same as DuckDB ASOF / pandas merge_asof on exact
    ties); the directional fuzz keeps right (key, ts) unique for this
    reason and the nearest golden tests pin the defined cases.
    """
    r_payload = [c for c in right.columns if c not in by]
    for k in by:
        right = right.filter(F.col(k).isNotNull())
    r = right.select(
        *by,
        F.unix_micros(F.col(right_ts)).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in r_payload]).alias("_match"),
    )
    l = left.select(
        *left.columns,
        F.unix_micros(F.col(left_ts)).alias("_t"),
        F.lit(1).alias("_side"),
    ).withColumn("_match", F.lit(None).cast(r.schema["_match"].dataType))
    l_cols = list(left.columns)
    l_pad = [c for c in l_cols if c not in by]
    unioned = l.select(*by, "_t", "_side", "_match", *l_pad).unionByName(
        r.select(
            *by,
            "_t",
            "_side",
            "_match",
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in l_pad
            ],
        )
    )
    wb = (
        Window.partitionBy(*by)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward = RUNNING last() over the DESCENDING sort, not first() over
    # an unbounded-FOLLOWING frame: Spark re-evaluates shrinking frames
    # from scratch per row (O(rows²) per partition), while a growing
    # unbounded-preceding frame is a streaming accumulator. Same
    # partitioning → still ONE Exchange, just a second in-partition sort.
    # At equal _t the desc traversal meets left (side 1) BEFORE right
    # (side 0), so a same-ts right stays out of the left row's preceding
    # frame — the same visibility rule as the ascending backward window.
    wf = (
        Window.partitionBy(*by)
        .orderBy(F.col("_t").desc(), F.col("_side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        unioned.withColumn("_mb", F.last("_match", ignorenulls=True).over(wb))
        .withColumn("_mf", F.last("_match", ignorenulls=True).over(wf))
        .filter(F.col("_side") == 1)
    )
    if tolerance is not None:
        gb = F.abs(
            F.unix_micros(F.col(left_ts))
            - F.unix_micros(F.col("_mb")[right_ts])
        )
        gf = F.abs(
            F.unix_micros(F.col(left_ts))
            - F.unix_micros(F.col("_mf")[right_ts])
        )
        matched = matched.withColumn(
            "_mb", F.when(gb <= tolerance, F.col("_mb"))
        ).withColumn("_mf", F.when(gf <= tolerance, F.col("_mf")))
    bk_ts = F.col("_mb")[right_ts]
    fw_ts = F.col("_mf")[right_ts]
    choose_b = fw_ts.isNull() | (
        bk_ts.isNotNull()
        & (
            F.unix_micros(F.col(left_ts)) - F.unix_micros(bk_ts)
            <= F.unix_micros(fw_ts) - F.unix_micros(F.col(left_ts))
        )
    )
    out = matched.select(
        *l_cols,
        *[
            F.when(choose_b, F.col("_mb")[c])
            .otherwise(F.col("_mf")[c])
            .alias(f"{right_prefix}{c}")
            for c in r_payload
        ],
    )
    if how == "inner":
        out = out.filter(F.col(f"{right_prefix}{right_ts}").isNotNull())
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance: Column | None = None,
    how: str = "left",
    right_prefix: str = "r_",
    skew_bucket_us: int | None = None,
) -> DataFrame:
    """As-of join: latest-right-at-or-before (backward) / earliest-right-at-
    or-after (forward) / closest-in-time either side (nearest, ties →
    backward — pandas merge_asof semantics) per left row, matched within
    ``by`` keys.

    Returns all ``left`` columns plus every non-key right column renamed
    ``{right_prefix}{col}`` (nullable when unmatched). ``how='inner'`` keeps
    only matched rows. ``tolerance`` (microseconds, int or Column) nulls
    out matches with ``abs(left_ts - right_ts)`` beyond it.

    Plan: union both sides aligned on (by, _t) → window
    ``last(_payload, ignorenulls=True)`` over rows-unbounded-preceding →
    keep left rows. One hash shuffle on ``by`` + in-partition sort;
    window state is O(1) per row (a single struct), so partitions stream.
    Forward direction reuses the same code on negated timestamps rather
    than a following-window, so the sort order (and the tie rule: equal
    ts matches, right-before-left) is identical in both directions.

    ``skew_bucket_us`` bounds skew: the default window partitions by ``by``
    alone, so ONE hot key (90% of rows on one user) serializes into one
    task. With a bucket width set, rows are additionally partitioned by
    ``floor(ts/width)``; earlier-bucket history reaches each bucket as a
    single carried-in row (the right side pre-folded to its last payload
    per (key, bucket), then a per-key window over BUCKET SUMMARIES — O(#
    buckets), not O(rows)). Any window task is then bounded by one key's
    rows in one time bucket + 1, at the cost of two extra small shuffles —
    results are identical to the unbucketed plan (fuzz-asserted).
    """
    if direction == "nearest":
        # Nearest-in-time match (pandas merge_asof direction='nearest'):
        # a per-row CASE keeps the match with the smaller |gap| (ties →
        # backward, matching pandas).
        if how not in ("left", "inner"):
            raise ValueError(f"how must be left|inner, got {how!r}")
        if skew_bucket_us is None:
            return _asof_nearest_one_pass(
                left, right, list(by), left_ts, right_ts, tolerance, how,
                right_prefix,
            )
        # Bucketed form: the carry machinery summarizes PRECEDING buckets
        # only, so the skew-bounded nearest stays the two-pass
        # composition — the backward pass's output (left cols + _nb_*
        # match) feeds the forward pass as its left side. Two
        # key-shuffles; each pass keeps the one-struct-per-row state.
        r_payload_n = [c for c in right.columns if c not in by]
        b = asof_join(
            left, right, by, left_ts, right_ts, "backward", tolerance,
            "left", "_nb_", skew_bucket_us,
        )
        f = asof_join(
            b, right, by, left_ts, right_ts, "forward", tolerance,
            "left", "_nf_", skew_bucket_us,
        )
        bk_ts, fw_ts = f"_nb_{right_ts}", f"_nf_{right_ts}"
        choose_b = F.col(fw_ts).isNull() | (
            F.col(bk_ts).isNotNull()
            & (
                F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(bk_ts))
                <= F.unix_micros(F.col(fw_ts)) - F.unix_micros(F.col(left_ts))
            )
        )
        out = f.select(
            *left.columns,
            *[
                F.when(choose_b, F.col(f"_nb_{c}"))
                .otherwise(F.col(f"_nf_{c}"))
                .alias(f"{right_prefix}{c}")
                for c in r_payload_n
            ],
        )
        if how == "inner":
            out = out.filter(F.col(f"{right_prefix}{right_ts}").isNotNull())
        return out
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    by = list(by)
    r_payload = [c for c in right.columns if c not in by]
    # SQL join semantics: null keys never match. The union+window form would
    # otherwise co-partition null-keyed rows and match them to each other.
    for k in by:
        right = right.filter(F.col(k).isNotNull())
    # Event-time sort key in microseconds; forward = backward on negated time.
    sign = F.lit(1) if direction == "backward" else F.lit(-1)

    r = right.select(
        *by,
        (sign * F.unix_micros(F.col(right_ts))).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in r_payload]).alias("_match"),
    )
    l = left.select(
        *left.columns,
        (sign * F.unix_micros(F.col(left_ts))).alias("_t"),
        F.lit(1).alias("_side"),
    ).withColumn("_match", F.lit(None).cast(r.schema["_match"].dataType))
    l_cols = [c for c in left.columns]
    l_pad = [c for c in l_cols if c not in by]
    unioned = l.select(*by, "_t", "_side", "_match", *l_pad).unionByName(
        r.select(*by, "_t", "_side", "_match", *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_pad])
    )

    if skew_bucket_us is None:
        part_cols: list = list(by)
    else:
        # Skew-bounded form: split each key's timeline into fixed buckets.
        # History older than a bucket arrives as ONE carried-in row per
        # (key, bucket): fold the right side to its last payload per
        # bucket, then run the unbounded window over those summaries —
        # per-key work is O(#buckets); the final per-row window below is
        # bounded by one bucket of one key.
        width = int(skew_bucket_us)
        unioned = unioned.withColumn("_b", F.floor(F.col("_t") / width))
        folds = (
            unioned.filter(F.col("_side") == 0)
            .groupBy(*by, "_b")
            .agg(F.max_by("_match", F.col("_t")).alias("_fold"))
        )
        wb = (
            Window.partitionBy(*by)
            .orderBy("_b")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carries = (
            unioned.select(*by, "_b").distinct()
            .join(folds, [*by, "_b"], "left")
            .withColumn("_carry", F.last("_fold", ignorenulls=True).over(wb))
            .filter(F.col("_carry").isNotNull())
        )
        # carry sorts first in its bucket (_t = bucket floor, _side = -1):
        # before any in-bucket right at the boundary, which is itself newer.
        carry_rows = carries.select(
            *by,
            (F.col("_b") * width).alias("_t"),
            F.lit(-1).alias("_side"),
            F.col("_carry").alias("_match"),
            *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_pad],
            "_b",
        )
        unioned = unioned.unionByName(carry_rows)
        part_cols = [*by, "_b"]

    # Right rows sort before left rows at equal _t => "at-or-before" matches.
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        unioned.withColumn("_m", F.last("_match", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance is not None:
        gap = F.abs(
            F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col("_m")[right_ts])
        )
        matched = matched.withColumn(
            "_m", F.when(gap <= tolerance, F.col("_m"))
        )
    if how == "inner":
        matched = matched.filter(F.col("_m").isNotNull())
    out_cols = [F.col(c) for c in l_cols] + [
        F.col("_m")[c].alias(f"{right_prefix}{c}") for c in r_payload
    ]
    return matched.select(*out_cols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    on: Sequence[str] = (),
    how: str = "inner",
    closed: str = "both",
) -> DataFrame:
    """Point-in-interval join, binned to an equi-join.

    Matches each ``points`` row to every ``intervals`` row with
    ``lo_col <= point_col <= hi_col`` (bounds per ``closed``:
    'both'|'left'|'right'|'neither'), optionally also equi-matching ``on``
    keys. Output = all point columns + all interval columns.

    Each interval is exploded to ``ceil(span/bucket_width)+1`` bucket rows;
    each point maps to exactly ONE bucket — the fact table is never
    duplicated, the (usually far smaller) interval side carries the
    replication. The equi-join on (on..., _bucket) hash-shuffles both sides
    (or broadcasts the exploded intervals when small), then the exact
    bounds predicate filters residually. ``how='left'`` re-joins unmatched
    points with null interval columns.
    """
    if closed not in ("both", "left", "right", "neither"):
        raise ValueError(f"bad closed={closed!r}")
    on = list(on)
    overlap = set(points.columns) & set(intervals.columns) - set(on)
    if overlap:
        raise ValueError(f"ambiguous columns on both sides: {sorted(overlap)}")

    w = float(bucket_width)
    p = points.withColumn("_bucket", F.floor(F.col(point_col) / w))
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    lo_ok = (
        F.col(point_col) >= F.col(lo_col)
        if closed in ("both", "left")
        else F.col(point_col) > F.col(lo_col)
    )
    hi_ok = (
        F.col(point_col) <= F.col(hi_col)
        if closed in ("both", "right")
        else F.col(point_col) < F.col(hi_col)
    )
    joined = (
        p.join(iv, on + ["_bucket"], "inner").filter(lo_ok & hi_ok).drop("_bucket")
    )
    if how == "inner":
        return joined
    if how != "left":
        raise ValueError(f"how must be inner|left, got {how!r}")
    iv_cols = [c for c in intervals.columns if c not in on]
    hit = joined.select(*points.columns).dropDuplicates()
    cond = None
    for c in points.columns:  # null-safe: a null point value still matches itself
        eq = points[c].eqNullSafe(hit[c])
        cond = eq if cond is None else (cond & eq)
    unmatched = points.join(hit, cond, "left_anti").select(
        *points.columns,
        *[F.lit(None).cast(intervals.schema[c].dataType).alias(c) for c in iv_cols],
    )
    return joined.unionByName(unmatched)

"""Stream-stream joins (event-time interval joins with watermarks).

The reference's streaming layer (Pixels-Retina) is commit-ts-ordered CDC
replay with no event-time join operator (SURVEY.md §2.9 "Watermarks /
event-time windows ... absent"); joining two live feeds is exactly the
workload Structured Streaming's stream-stream join exists for, so this is
a beyond-parity operator in the same spirit as the windowed aggregations:
declare the join, let Spark manage the two-sided state store.

Semantics (inner): every (left, right) pair with equal keys whose right
event time falls inside ``[left_ts + lower, left_ts + upper]`` is emitted
as soon as both sides have arrived — watermarks bound STATE, not results,
so the inner-join output over a bounded replay equals the batch interval
join exactly (what makes `stream_stream_join` fully oracle-able).

Left-outer adds null-extended rows for unmatched left events once the
watermark passes the end of their match window; Spark finalizes that state
in the trailing no-data micro-batch of an availableNow run, making the
emission a pure function of (data, interval, delay) — stated in SQL by the
oracle with the same watermark formula the sessionize oracle uses.

100 TB shape: both inputs shuffle-partition by the join key (one Exchange
each); per-key state holds only rows inside the watermark horizon, so
state size is O(ingest rate x (upper - lower + delay)) per side,
independent of total stream length. The condition MUST include the time
bounds — an unconstrained stream-stream equi-join would buffer both
streams forever (Spark rejects it without a watermark for this reason).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    upper: str = "1 hour",
    lower: str = "0 seconds",
    delay: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` where ``right_ts`` falls within
    ``[left_ts + lower, left_ts + upper]``. Both sides carry the same
    watermark ``delay``; column names must already be disjoint apart from
    ``key`` (rename before calling — the output keeps both timestamp
    columns)."""
    lw = left.withWatermark(left_ts, delay).alias("l")
    rw = right.withWatermark(right_ts, delay).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {lower}")
        )
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}"))
    )
    joined = lw.join(rw, cond, how)
    # one key column out: coalesce the two sides (equal when matched;
    # outer null-extensions carry whichever side exists — dropping the
    # right copy instead would null the key on right-extended rows)
    other = [
        F.col(f"l.{c}") for c in left.columns if c != key
    ] + [F.col(f"r.{c}") for c in right.columns if c != key]
    return joined.select(
        F.coalesce(F.col(f"l.{key}"), F.col(f"r.{key}")).alias(key), *other
    )

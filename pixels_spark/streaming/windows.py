"""Event-time window aggregations with watermarks.

Beyond-parity (the reference's Retina has no event-time semantics —
SURVEY.md §2.9): tumbling/sliding via ``F.window``, session via
``F.session_window``, each with ``withWatermark`` so state is bounded and
late data beyond the watermark is dropped.

The same functions work on batch DataFrames (watermark is a no-op there),
which is how the declared batch queries and the streaming tests share one
implementation.

Scale notes: windowed aggregation state is partitioned by (key, window) —
bounded by the watermark horizon; session windows additionally merge
per-key, so a hot key with endless activity is the thing to watch (cap with
inactivity gap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _agg_exprs() -> list[Column]:
    # decimal-accumulated sum: double addition is order-sensitive and
    # micro-batch boundaries reorder it; DECIMAL(18,6) makes total_value a
    # pure function of the window's rows, so continuous-rollup buckets are
    # bit-identical to a batch recompute (and to the DuckDB oracle)
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    ]


def tumbling_agg(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    df = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return df.groupBy(F.window(F.col(ts_col), window).alias("win"), *keys).agg(
        *_agg_exprs()
    )


def sliding_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    df = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return df.groupBy(
        F.window(F.col(ts_col), window, slide).alias("win"), *keys
    ).agg(*_agg_exprs())


def session_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """Session windows with an inactivity ``gap`` (≈ the batch
    gaps-and-islands query win_sessionize, but stateful/streaming-capable)."""
    df = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return df.groupBy(
        F.session_window(F.col(ts_col), gap).alias("win"), *keys
    ).agg(*_agg_exprs())

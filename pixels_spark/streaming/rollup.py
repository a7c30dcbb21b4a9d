"""Continuous rollup (hypertable-style continuous aggregate).

Maintains a materialized tumbling-window aggregate of a stream inside an
MVCC table, and serves queries by merging the finalized buckets with an
on-the-fly aggregation of the raw tail — the TimescaleDB/Druid
"continuous aggregate + real-time tail" pattern, built from Spark
primitives:

- ingest: ``tumbling_agg`` in APPEND output mode — a (window, keys) bucket
  is emitted exactly once, when the watermark passes its end, so the
  rollup table is insert-only (no rewrite churn) and each micro-batch
  commit is one MVCC version.
- serve: finalized buckets come from the rollup table scan (tiny — one
  row per window × key); only events after the last finalized window are
  re-aggregated from raw. At 100 TB that replaces a full-history scan
  with (rollup rows + watermark-horizon of raw events).

Beyond-reference: Retina gives CDC versioning but no event-time rollups
(SURVEY.md §2.9); this composes our MVCC table with Structured Streaming
to get both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..mvcc.table import MvccTable
from .windows import tumbling_agg

ROLLUP_COLS = ("bucket_start", "bucket_end", "n_events", "total_value")


def continuous_rollup(
    stream: DataFrame,
    table: MvccTable,
    checkpoint: str,
    window: str = "1 day",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("event_type",),
    trigger_available_now: bool = True,
):
    """Start the rollup maintenance query; returns the StreamingQuery.

    Append mode guarantees a bucket is written once, finalized: every
    micro-batch that closes buckets becomes one MVCC commit, so the rollup
    table time-travels by ingestion progress like any other table.
    """
    agg = tumbling_agg(stream, window=window, watermark=watermark, keys=keys)
    flat = agg.select(
        F.col("win.start").alias("bucket_start"),
        F.col("win.end").alias("bucket_end"),
        *keys,
        "n_events",
        "total_value",
    )

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table.insert(batch_df)

    writer = (
        flat.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(commit_batch)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def rollup_with_tail(
    table: MvccTable,
    raw: DataFrame,
    window: str = "1 day",
    keys: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
) -> DataFrame:
    """Serve the CURRENT aggregate: finalized buckets ∪ fresh tail.

    Raw events are filtered to strictly after the last finalized bucket
    end (a metadata-cheap max over the tiny rollup table) and aggregated
    with the same tumbling logic; the filter prunes the raw scan to the
    recent partitions/files. Output schema = finalized rollup schema.
    """
    finalized = table.read().select("bucket_start", "bucket_end", *keys,
                                    "n_events", "total_value")
    row = finalized.agg(F.max("bucket_end").alias("m")).first()
    frontier = row["m"] if row else None
    tail_raw = raw if frontier is None else raw.filter(F.col(ts_col) >= frontier)
    tail = tumbling_agg(tail_raw, window=window, keys=keys).select(
        F.col("win.start").alias("bucket_start"),
        F.col("win.end").alias("bucket_end"),
        *keys,
        "n_events",
        "total_value",
    )
    return finalized.unionByName(tail)

"""Driver-visible declared queries for the STATEFUL streaming operators.

``streamq`` oracles the window *semantics* in batch mode; these three
queries run the actual streaming machinery — a real Structured Streaming
job per call (file source replayed in event-time order, availableNow
trigger, parquet/MVCC sink) — and return the sink contents, so the driver's
DuckDB oracle checks the end-to-end streaming path, not a batch stand-in:

- ``stream_sessionize``: ``applyInPandasWithState`` session assembly
  (streaming/stateful.py) — emitted set == the watermark-safe
  gaps-and-islands sessions, stated in SQL including the watermark filter.
- ``stream_dedup``: ``dropDuplicatesWithinWatermark`` ingest dedup over a
  doubled (CDC-replay) feed — output == the original events exactly.
- ``stream_rollup``: continuous rollup into an MVCC table + raw-tail merge
  (streaming/rollup.py) — merged aggregate == the full batch daily rollup.

Reference analog: Retina's ingest surface is verified first-class
(``pixels-retina/.../RetinaResourceManager.java:705``); these make our
streaming subsystem equally driver-checked.

Watermark math: Spark tracks event time per-row truncated to MILLISECONDS
(EventTimeStats), so the final watermark is floor(max_ts, ms) - delay; the
sessionize oracle reproduces that with date_trunc('milliseconds', max(ts)).
The replay feeds files in event-time order (mtime order = ts order), so no
event ever arrives behind the watermark and the replay is loss-free —
emitted results are a pure function of (fixture, gap, delay), independent
of micro-batch boundaries (property-tested in tests/test_streaming.py).
"""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import SCHEMAS, load_table
from .registry import declare


def _ordered_stream(spark: SparkSession, sf_dir: str, workdir: str):
    """events as a 2-file stream source in event-time order: slice at the
    time midpoint, mtimes increasing, maxFilesPerTrigger=1 → one micro-batch
    per slice (so watermark advancement between batches is exercised)."""
    src = os.path.join(workdir, "src")
    e = load_table(spark, sf_dir, "events")
    row = e.agg(F.min("ts").alias("a"), F.max("ts").alias("b")).first()
    mid = row["a"] + (row["b"] - row["a"]) / 2
    slices = [e.filter(F.col("ts") <= F.lit(mid)), e.filter(F.col("ts") > F.lit(mid))]
    _write_slices(slices, src)
    return (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def _write_slices(slices: list[DataFrame], src: str) -> None:
    base, seen = time.time(), set()
    for i, s in enumerate(slices):
        s.coalesce(1).write.mode("append").parquet(src)
        for fn in os.listdir(src):
            p = os.path.join(src, fn)
            if fn.endswith(".parquet") and p not in seen:
                os.utime(p, (base + i, base + i))
                seen.add(p)


def _finalize(df: DataFrame, workdir: str) -> DataFrame:
    """Materialize a result that lives under ``workdir`` (parquet sink or
    MVCC table), then DELETE the workdir — every declared streaming query
    creates sink+checkpoint temp dirs, and without this each driver
    verify/bench run would leave them in /tmp forever (VERDICT r04 #2).

    The result is Arrow-collected and re-created with the identical schema:
    these sinks are small by construction (bounded replay of a fixture
    slice — ≤100k rows at sf0.1), and only the declared-query harness takes
    this path; the streaming operators themselves (streaming/*.py) never
    collect."""
    import shutil

    schema = df.schema
    try:
        # Arrow round-trip, not pandas: pandas folds a DOUBLE NULL into NaN,
        # which would resurface as NaN (not NULL) in the re-created frame.
        tbl = df.toArrow()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return df.sparkSession.createDataFrame(tbl, schema)


def _run_to_parquet(out_stream: DataFrame, workdir: str, tag: str) -> str:
    out, _ = _run_to_parquet_with_progress(out_stream, workdir, tag)
    return out


def _run_to_parquet_with_progress(
    out_stream: DataFrame, workdir: str, tag: str
) -> tuple[str, list[dict]]:
    """Like _run_to_parquet but also returns the per-micro-batch progress
    dicts (state-store row counts etc.) captured before termination."""
    out = os.path.join(workdir, f"out_{tag}")
    q = (
        out_stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(workdir, f"ck_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError(f"streaming query {tag} did not finish in 600s")
    return out, [p for p in q.recentProgress if p is not None]


@declare(
    "stream_sessionize",
    sql="""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
    marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
      FROM e),
    sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS sid
      FROM marked),
    agg AS (
      SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
             CAST(count(*) AS BIGINT) AS n_events, sum(value) AS total_value
      FROM sessions GROUP BY user_id, sid),
    wm AS (SELECT date_trunc('milliseconds', max(ts)) - INTERVAL 2 HOUR AS w FROM e)
    SELECT user_id, session_start, session_end, n_events, total_value
    FROM agg, wm
    WHERE session_end + INTERVAL 30 MINUTE <= w
    ORDER BY user_id, session_start
    """,
    tags=("streaming", "stateful", "sessionization"),
)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once closed-session emission: sessions whose end + gap the
    final watermark has passed, assembled per-key by the custom
    applyInPandasWithState operator."""
    from ..streaming.stateful import sessionize_stateful

    work = tempfile.mkdtemp(prefix="pxs_stream_sess_")
    stream = _ordered_stream(spark, sf_dir, work)
    out = _run_to_parquet(sessionize_stateful(stream, gap_seconds=1800), work, "sess")
    return _finalize(
        spark.read.parquet(out).orderBy("user_id", "session_start"), work
    )


@declare(
    "stream_dedup",
    sql="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
           value, props
    FROM events
    ORDER BY event_id
    """,
    tags=("streaming", "dedup", "ingest"),
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time exact dedup: the feed delivers every event TWICE (a CDC
    replay); dropDuplicatesWithinWatermark must emit each exactly once, so
    the output equals the original events table."""
    from ..streaming.ingest import dedup_stream

    work = tempfile.mkdtemp(prefix="pxs_stream_dedup_")
    src = os.path.join(work, "src")
    e = load_table(spark, sf_dir, "events")
    _write_slices([e, e], src)  # the same full table arrives twice
    stream = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    deduped = dedup_stream(stream, ["event_id"], watermark_delay="365 days")
    out = _run_to_parquet(deduped, work, "dedup")
    return _finalize(spark.read.parquet(out).orderBy("event_id"), work)


def _bounded_dedup_run(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, list[dict]]:
    """Shared runner for the bounded-state dedup: time-sliced replay where
    each slice arrives twice in event-time order, deduped with a SHORT
    watermark (span/8). Returns (deduped result, per-batch progress).

    Exactness argument: a duplicate has the same event time as its
    original. If the original's state entry is still live, the duplicate is
    suppressed by state; if the entry was evicted, then the watermark has
    passed ts+delay > ts, so the duplicate is dropped as late — either way
    it never reaches the sink, and originals (first arrival of each slice,
    fed in event-time order) are never late. So the output equals the
    distinct events exactly while state stays O(rate × delay).
    """
    work = tempfile.mkdtemp(prefix="pxs_stream_bdedup_")
    src = os.path.join(work, "src")
    e = load_table(spark, sf_dir, "events")
    row = e.agg(F.min("ts").alias("a"), F.max("ts").alias("b")).first()
    span = row["b"] - row["a"]
    delay_s = max(1, int(span.total_seconds()) // 8)
    n_slices = 4
    bounds = [row["a"] + (span * i) / n_slices for i in range(1, n_slices)]
    slices, lo = [], None
    for hi in [*bounds, None]:
        cond = F.lit(True) if lo is None else (F.col("ts") > F.lit(lo))
        if hi is not None:
            cond = cond & (F.col("ts") <= F.lit(hi))
        s = e.filter(cond)
        slices += [s, s]  # each slice arrives twice, back-to-back
        lo = hi
    _write_slices(slices, src)
    stream = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    from ..streaming.ingest import dedup_stream

    deduped = dedup_stream(stream, ["event_id"], watermark_delay=f"{delay_s} seconds")
    out, progress = _run_to_parquet_with_progress(deduped, work, "bdedup")
    result = _finalize(spark.read.parquet(out).orderBy("event_id"), work)
    return result, progress


@declare(
    "stream_dedup_bounded",
    sql="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
           value, props
    FROM events
    ORDER BY event_id
    """,
    tags=("streaming", "dedup", "ingest", "bounded_state"),
)
def stream_dedup_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOUNDED-STATE ingest dedup: the doubled replay is deduped with a
    short watermark (span/8, not 365 days), so per-key state is evicted as
    the watermark advances — yet the output is still exactly the original
    events (in-state duplicates are suppressed, evicted-entry duplicates
    are by then late and dropped). State eviction is asserted in
    tests/test_streaming.py via the state-store row counts."""
    result, _ = _bounded_dedup_run(spark, sf_dir)
    return result


def _md5_minhash_sql(
    n: int = 3,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    order_lhs: str = "b1.doc_id",
    order_rhs: str = "b2.doc_id",
    select: str | None = None,
    source: str = "documents",
) -> str:
    """Oracle restatement of functions.dedup.minhash_md5_bands: the md5
    hash family is computable in DuckDB with bit-identical results (same
    conv/substr/md5 pattern proven by the sampling oracles), so the band
    values — and therefore the collision/suppression sets — match exactly.

    ``order_lhs < order_rhs`` defines arrival order (default: doc_id —
    the streaming replay order); ``dedup_incremental`` reuses the same
    collision CTEs with a (batch, id) ordering and its own SELECT."""
    hash_i = (
        "list_min(list_transform(s, x -> CAST(concat('0x', "
        "substr(md5(concat('{i}|', x)), 1, 8)) AS BIGINT)))"
    )
    sig_cols = ",\n             ".join(
        f"{hash_i.format(i=i)} AS h{i}" for i in range(num_hashes)
    )
    n_bands = num_hashes // rows_per_band
    band_structs = ", ".join(
        "struct_pack(band := {b}, bh := concat_ws(',', {hs}))".format(
            b=b,
            hs=", ".join(
                f"CAST(h{b * rows_per_band + j} AS VARCHAR)"
                for j in range(rows_per_band)
            ),
        )
        for b in range(n_bands)
    )
    final_select = select or (
        "SELECT d.doc_id, (h.doc_id IS NOT NULL) AS suppressed\n"
        "    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id\n"
        "    ORDER BY d.doc_id"
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM {source}),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= {n}
                  THEN list_distinct(list_transform(range(1, len(toks)-{n - 2}),
                         i -> concat_ws(' ', {", ".join(f"toks[i+{j}]" for j in range(n))})))
                  ELSE [array_to_string(toks, ' ')] END AS s
      FROM toks),
    sigs AS (
      SELECT doc_id,
             {sig_cols}
      FROM sh),
    bands AS (
      SELECT doc_id, u['band'] AS band, u['bh'] AS bh
      FROM (SELECT doc_id, unnest([{band_structs}]) AS u FROM sigs)),
    hits AS (
      SELECT DISTINCT b2.doc_id
      FROM bands b1 JOIN bands b2
        ON b1.band = b2.band AND b1.bh = b2.bh AND {order_lhs} < {order_rhs})
    {final_select}
    """


@declare(
    "stream_dedup_minhash",
    sql=_md5_minhash_sql(),
    tags=("streaming", "stateful", "dedup", "minhash"),
)
def stream_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming NEAR-duplicate suppression at ingest: each arriving doc's
    MinHash-LSH bands are checked against per-band state; a doc is
    suppressed iff any band collides with an earlier doc — the ingest-time
    counterpart of the batch MinHash-LSH dedup, run through a real
    stateful streaming job and oracled exactly (md5 hash family)."""
    from ..functions.dedup import minhash_md5_bands
    from ..streaming.stateful import band_first_seen

    work = tempfile.mkdtemp(prefix="pxs_stream_nd_")
    src = os.path.join(work, "src")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    half = d.agg(((F.min("doc_id") + F.max("doc_id")) / 2).alias("m")).first()["m"]
    _write_slices(
        [d.filter(F.col("doc_id") <= half), d.filter(F.col("doc_id") > half)], src
    )
    stream = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    band_rows = stream.select(
        "doc_id", F.explode(minhash_md5_bands(F.col("text"))).alias("_b")
    ).select("doc_id", F.col("_b.band").alias("band"), F.col("_b.bh").alias("bh"))
    out = _run_to_parquet(band_first_seen(band_rows), work, "nd")
    return _finalize(
        spark.read.parquet(out)
        .groupBy("doc_id")
        .agg(F.max("suppressed").alias("suppressed"))
        .orderBy("doc_id"),
        work,
    )


@declare(
    "stream_cdc",
    sql="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
           CASE WHEN event_id % 10 = 0 THEN value * 2 ELSE value END AS value,
           props
    FROM events
    WHERE event_id % 10 <> 1
    ORDER BY event_id
    """,
    tags=("streaming", "cdc", "mvcc"),
)
def stream_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC replay into an MVCC table (≈ Retina insertRecord/deleteRecord,
    RetinaResourceManager.java:705): batch 1 inserts every event, batch 2
    updates event_id%10==0 (value doubled) and deletes event_id%10==1 —
    the final latest-version snapshot must equal the oracle's CASE/WHERE
    restatement. Each micro-batch commits as ONE transaction."""
    from ..mvcc.table import MvccTable
    from ..streaming.ingest import ingest_cdc_stream
    from pyspark.sql.types import StringType, StructField, StructType

    work = tempfile.mkdtemp(prefix="pxs_stream_cdc_")
    src = os.path.join(work, "src")
    e = load_table(spark, sf_dir, "events")
    inserts = e.withColumn("op", F.lit("I"))
    updates = (
        e.filter(F.col("event_id") % 10 == 0)
        .withColumn("value", F.col("value") * 2)
        .withColumn("op", F.lit("U"))
    )
    deletes = e.filter(F.col("event_id") % 10 == 1).withColumn("op", F.lit("D"))
    _write_slices([inserts, updates.unionByName(deletes)], src)

    cdc_schema = StructType(
        list(SCHEMAS["events"].fields) + [StructField("op", StringType())]
    )
    stream = (
        spark.readStream.schema(cdc_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    table = MvccTable(spark, os.path.join(work, "tbl"), key_col="event_id")
    q = ingest_cdc_stream(stream, table, os.path.join(work, "ck"))
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("cdc ingest did not finish in 600s")
    return _finalize(
        table.read_latest_version().drop("_commit_ts").orderBy("event_id"), work
    )


@declare(
    "stream_rollup",
    sql="""
    SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
               AS bucket_start,
           CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) + INTERVAL 1 DAY
                AS TIMESTAMP) AS bucket_end,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY bucket_start, event_type
    """,
    tags=("streaming", "rollup", "mvcc", "time_series"),
)
def stream_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous aggregate: streaming daily rollup finalized into an MVCC
    table (append mode — each bucket exactly once), merged with the raw
    tail; the merge must equal the full batch daily aggregate. Sums are
    DECIMAL-accumulated so bucket values are order-exact vs the oracle."""
    from ..mvcc.table import MvccTable
    from ..streaming.rollup import continuous_rollup, rollup_with_tail

    work = tempfile.mkdtemp(prefix="pxs_stream_rollup_")
    stream = _ordered_stream(spark, sf_dir, work)
    table = MvccTable(spark, os.path.join(work, "rollup"), key_col="bucket_start")
    q = continuous_rollup(stream, table, os.path.join(work, "ck"), window="1 day")
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("continuous_rollup did not finish in 600s")
    merged = rollup_with_tail(table, load_table(spark, sf_dir, "events"), window="1 day")
    return _finalize(merged.orderBy("bucket_start", "event_type"), work)


@declare(
    "mvcc_merge",
    sql="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
           CASE WHEN event_id % 6 = 0 THEN value * 10 ELSE value END AS value,
           props
    FROM events
    WHERE event_id % 3 <> 2
    ORDER BY event_id
    """,
    tags=("mvcc", "merge", "upsert"),
)
def mvcc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE (Delta-style upsert) into an MVCC table, driver-checked:
    the target holds event_id%3==0; the source updates the %6==0 half
    (value x10) and inserts the %3==1 rows — one transaction; the final
    latest-version snapshot must equal the oracle's CASE/WHERE
    restatement."""
    from ..mvcc.table import MvccTable

    work = tempfile.mkdtemp(prefix="pxs_stream_merge_")
    e = load_table(spark, sf_dir, "events")
    table = MvccTable(spark, os.path.join(work, "tbl"), key_col="event_id")
    table.insert(e.filter(F.col("event_id") % 3 == 0))
    source = (
        e.filter(F.col("event_id") % 6 == 0)
        .withColumn("value", F.col("value") * 10)
        .unionByName(e.filter(F.col("event_id") % 3 == 1))
    )
    table.merge(source)
    return _finalize(
        table.read_latest_version().drop("_commit_ts").orderBy("event_id"), work
    )


@declare(
    "mvcc_ivm_rollup",
    sql="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(CASE WHEN event_id % 6 = 0 THEN value * 10
                              ELSE value END AS DECIMAL(18,6))) AS DOUBLE)
               AS sum_value
    FROM events
    WHERE event_id % 3 <> 2 AND event_id % 9 NOT IN (3, 4)
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("mvcc", "ivm", "materialized-view", "rollup"),
)
def mvcc_ivm_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """incremental materialized-view maintenance: a per-type count+sum
    rollup materialized over an MVCC table, then kept fresh through an
    upsert batch (MERGE: x10 updates + inserts) and a delete batch by
    folding ONLY the delta commits (signed decimal-exact merge) — the
    refreshed rollup must equal the oracle's from-scratch aggregation."""
    from ..mvcc.ivm import MaterializedRollup
    from ..mvcc.table import MvccTable

    work = tempfile.mkdtemp(prefix="pxs_ivm_")
    e = load_table(spark, sf_dir, "events")
    table = MvccTable(spark, os.path.join(work, "tbl"), key_col="event_id")
    table.insert(e.filter(F.col("event_id") % 3 == 0))
    mv = MaterializedRollup(
        spark, os.path.join(work, "mv"), table, ["event_type"], ["value"]
    )
    mv.full_refresh()
    source = (
        e.filter(F.col("event_id") % 6 == 0)
        .withColumn("value", F.col("value") * 10)
        .unionByName(e.filter(F.col("event_id") % 3 == 1))
    )
    table.merge(source)
    table.delete(e.filter((F.col("event_id") % 9).isin(3, 4)).select("event_id"))
    mv.refresh()
    out = mv.read().select(
        "event_type",
        "n_rows",
        F.col("sum_value").cast("double").alias("sum_value"),
    ).orderBy("event_type")
    return _finalize(out, work)


@declare(
    "mvcc_secondary_lookup",
    sql="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
           CASE WHEN event_id % 10 = 0 THEN user_id + 1000000
                ELSE user_id END AS user_id,
           event_type,
           CASE WHEN event_id % 10 = 0 THEN value * 2 ELSE value END AS value,
           props
    FROM events
    WHERE user_id = 7
    ORDER BY event_id
    """,
    tags=("mvcc", "index", "secondary"),
)
def mvcc_secondary_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """secondary (non-unique) point index: events keyed by event_id with a
    user_id secondary index; after an update MOVES the %10==0 rows to
    user_id+1000000 (outside any fixture's user domain at every SF — the
    oracle's WHERE binds the base column) and doubles value, lookups by
    old and new user must
    reflect the LATEST versions only — the stale-secondary trap the
    two-step (candidate keys → primary resolution) design exists for."""
    from ..mvcc.secondary import SecondaryIndex
    from ..mvcc.table import MvccTable

    work = tempfile.mkdtemp(prefix="pxs_sidx_")
    e = load_table(spark, sf_dir, "events")
    table = MvccTable(
        spark, os.path.join(work, "tbl"), key_col="event_id", indexed=True
    )
    ts1 = table.insert(e)
    idx = SecondaryIndex(table, "user_id")
    idx.index_commit(ts1)
    moved = (
        e.filter(F.col("event_id") % 10 == 0)
        .withColumn("user_id", F.col("user_id") + 1000000)
        .withColumn("value", F.col("value") * 2)
    )
    ts2 = table.update(moved)
    idx.index_commit(ts2)
    out = (
        idx.lookup(7)
        .unionByName(idx.lookup(1000007))
        .drop("_commit_ts")
        .orderBy("event_id")
    )
    return _finalize(out, work)


@declare(
    "stream_ivm_rollup",
    sql="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("streaming", "ivm", "materialized-view", "rollup"),
)
def stream_ivm_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming ingest with per-micro-batch INCREMENTAL rollup refresh:
    events replayed as a 2-batch stream into an MVCC table; each batch
    commits one transaction and folds only its own commits into the
    materialized per-type rollup (merge-free serving, lag = trigger) —
    the final rollup must equal the from-scratch aggregation."""
    from ..mvcc.ivm import MaterializedRollup
    from ..mvcc.table import MvccTable
    from ..streaming.ingest import ingest_stream_with_ivm

    work = tempfile.mkdtemp(prefix="pxs_stream_ivm_")
    src = os.path.join(work, "src")
    e = load_table(spark, sf_dir, "events")
    half = e.agg(((F.min("event_id") + F.max("event_id")) / 2).alias("m")).first()["m"]
    _write_slices(
        [e.filter(F.col("event_id") <= half), e.filter(F.col("event_id") > half)],
        src,
    )
    stream = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    table = MvccTable(spark, os.path.join(work, "tbl"), key_col="event_id")
    mv = MaterializedRollup(
        spark, os.path.join(work, "mv"), table, ["event_type"], ["value"]
    )
    q = ingest_stream_with_ivm(stream, table, mv, os.path.join(work, "ck"))
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("ivm ingest did not finish in 600s")
    out = mv.read().select(
        "event_type",
        "n_rows",
        F.col("sum_value").cast("double").alias("sum_value"),
    ).orderBy("event_type")
    return _finalize(out, work)


@declare(
    "mvcc_compact_history",
    sql="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
           CASE WHEN event_id % 8 = 0 THEN value * 3 ELSE value END AS value,
           props
    FROM events
    WHERE event_id % 12 <> 5
    ORDER BY event_id
    """,
    tags=("mvcc", "compact", "optimize"),
)
def mvcc_compact_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE/checkpoint on the mutable table: events ingested in two
    commits, then updated (%8==0 value x3) and partially deleted
    (%12==5), then the WHOLE history compacted into one commit directory
    (tombstones applied and dropped, per-row commit ts preserved) — the
    post-compact latest-version snapshot must equal the oracle's
    restatement of the uncompacted history."""
    from ..mvcc.table import MvccTable

    work = tempfile.mkdtemp(prefix="pxs_compact_hist_")
    e = load_table(spark, sf_dir, "events")
    table = MvccTable(spark, os.path.join(work, "tbl"), key_col="event_id")
    half = e.agg(((F.min("event_id") + F.max("event_id")) / 2).alias("m")).first()["m"]
    table.insert(e.filter(F.col("event_id") <= half))
    table.insert(e.filter(F.col("event_id") > half))
    table.update(
        e.filter(F.col("event_id") % 8 == 0).withColumn("value", F.col("value") * 3)
    )
    table.delete(e.filter(F.col("event_id") % 12 == 5).select("event_id"))
    table.compact_history()
    n_dirs = len(
        [d for d in os.listdir(table.data_dir) if d.startswith("_commit=")]
    )
    assert n_dirs == 1, f"history not consolidated: {n_dirs} dirs"
    return _finalize(
        table.read_latest_version().drop("_commit_ts").orderBy("event_id"), work
    )


@declare(
    "mvcc_schema_evolution",
    sql="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value,
           CASE WHEN event_id % 6 = 0 THEN CAST(value * 3 AS DOUBLE)
                WHEN event_id % 3 = 1 THEN CAST(value * 2 AS DOUBLE)
           END AS score
    FROM events
    WHERE event_id % 3 IN (0, 1)
    ORDER BY event_id
    """,
    tags=("mvcc", "schema-evolution"),
)
def mvcc_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADD COLUMN without history rewrite: commit 1 writes the base schema,
    commit 2 inserts rows carrying a new `score` column (the table schema
    union-evolves), and a MERGE then rewrites a subset under the evolved
    schema. The final read serves every commit under the union schema —
    pre-evolution rows surface score=NULL via the explicit-schema scan (no
    mergeSchema footer sweep). ≈ the reference's versioned table schemas
    (metadata SCHEMA_VERSIONS; old files stay readable after ADD COLUMN)."""
    from ..mvcc.table import MvccTable

    work = tempfile.mkdtemp(prefix="pxs_evo_")
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    table = MvccTable(spark, os.path.join(work, "tbl"), key_col="event_id")
    table.insert(e.filter(F.col("event_id") % 3 == 0))
    table.insert(
        e.filter(F.col("event_id") % 3 == 1).withColumn(
            "score", (F.col("value") * 2).cast("double")
        )
    )
    table.merge(
        e.filter(F.col("event_id") % 6 == 0).withColumn(
            "score", (F.col("value") * 3).cast("double")
        )
    )
    return _finalize(
        table.read_latest_version().drop("_commit_ts").orderBy("event_id"), work
    )


@declare(
    "mvcc_secondary_range",
    sql="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
           CASE WHEN event_id % 10 = 0 THEN user_id + 1000000
                ELSE user_id END AS user_id,
           event_type,
           CASE WHEN event_id % 10 = 0 THEN value * 2 ELSE value END AS value,
           props
    FROM events
    WHERE CASE WHEN event_id % 10 = 0 THEN user_id + 1000000
               ELSE user_id END BETWEEN 40 AND 60
    ORDER BY event_id
    """,
    tags=("mvcc", "index", "secondary", "range"),
)
def mvcc_secondary_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """secondary-index RANGE lookup (user_id BETWEEN 40 AND 60): file
    pruning by [min,max] interval overlap, the same two-step candidate →
    primary-resolution → latest-version re-check as the point lookup, so
    rows an update moved out of the range never surface stale (the %10==0
    rows moved to user_id+1000000 with doubled value must appear only if
    their NEW user lands in range — it never does)."""
    from ..mvcc.secondary import SecondaryIndex
    from ..mvcc.table import MvccTable

    work = tempfile.mkdtemp(prefix="pxs_sidxr_")
    e = load_table(spark, sf_dir, "events")
    table = MvccTable(
        spark, os.path.join(work, "tbl"), key_col="event_id", indexed=True
    )
    ts1 = table.insert(e)
    idx = SecondaryIndex(table, "user_id")
    idx.index_commit(ts1)
    moved = (
        e.filter(F.col("event_id") % 10 == 0)
        .withColumn("user_id", F.col("user_id") + 1000000)
        .withColumn("value", F.col("value") * 2)
    )
    ts2 = table.update(moved)
    idx.index_commit(ts2)
    out = idx.lookup_range(40, 60).drop("_commit_ts").orderBy("event_id")
    return _finalize(out, work)


def _ssj_sides(spark: SparkSession, sf_dir: str, work: str):
    """views + purchases as two time-sliced file-stream sources.

    Both sides slice at the SAME event-time midpoint with mtimes in time
    order, so each micro-batch consumes one slice per side and the replay
    is loss-free: after batch 1 the global watermark is
    min(side maxima over slice 1) - delay; slice-2 events all sit above
    the midpoint, so nothing arrives late, and any left row evicted from
    the join state after batch 1 (view_ts + upper < wm = mid - delay)
    provably cannot match a slice-2 right row (purchase_ts > mid).
    """
    e = load_table(spark, sf_dir, "events")
    row = e.agg(F.min("ts").alias("a"), F.max("ts").alias("b")).first()
    mid = row["a"] + (row["b"] - row["a"]) / 2
    v = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "value",
    )
    srcs = []
    for sub, df, ts in (("v", v, "view_ts"), ("p", p, "purchase_ts")):
        src = os.path.join(work, sub)
        _write_slices(
            [df.filter(F.col(ts) <= F.lit(mid)), df.filter(F.col(ts) > F.lit(mid))],
            src,
        )
        srcs.append(
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
    return srcs


_SSJ_CTES = """
    WITH v AS (
      SELECT user_id, event_id AS view_id, CAST(ts AS TIMESTAMP) AS view_ts
      FROM events WHERE event_type = 'view'),
    p AS (
      SELECT user_id, event_id AS purchase_id,
             CAST(ts AS TIMESTAMP) AS purchase_ts, value
      FROM events WHERE event_type = 'purchase'),
    m AS (
      SELECT v.user_id, v.view_id, v.view_ts,
             p.purchase_id, p.purchase_ts, p.value
      FROM v JOIN p
        ON v.user_id = p.user_id
       AND p.purchase_ts >= v.view_ts
       AND p.purchase_ts <= v.view_ts + INTERVAL 1 HOUR)
"""


@declare(
    "stream_stream_join",
    sql=_SSJ_CTES
    + """
    SELECT user_id, view_id, view_ts, purchase_id, purchase_ts, value
    FROM m ORDER BY view_id, purchase_id
    """,
    tags=("streaming", "stream-stream-join", "interval-join"),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM inner interval join: purchases within 1 hour after a
    view by the same user, joined while BOTH sides are live streams
    (streaming/joins.py). Watermarks bound the two-sided join state, not
    the results — inner matches emit as soon as both rows have arrived —
    so the bounded replay equals the batch interval join exactly and the
    oracle is plain SQL. Beyond-parity: the reference's streaming layer
    (Retina) has no event-time join operator (SURVEY §2.9)."""
    from ..streaming.joins import stream_interval_join

    work = tempfile.mkdtemp(prefix="pxs_ssj_")
    vs, ps = _ssj_sides(spark, sf_dir, work)
    j = stream_interval_join(
        vs, ps, "user_id", "view_ts", "purchase_ts", upper="1 hour", delay="2 hours"
    )
    out = _run_to_parquet(j, work, "ssj")
    return _finalize(
        spark.read.parquet(out).orderBy("view_id", "purchase_id"), work
    )


@declare(
    "stream_stream_join_outer",
    sql=_SSJ_CTES
    + """
    , wm AS (
      SELECT least((SELECT date_trunc('milliseconds', max(view_ts)) FROM v),
                   (SELECT date_trunc('milliseconds', max(purchase_ts)) FROM p))
             - INTERVAL 2 HOUR AS w)
    SELECT user_id, view_id, view_ts, purchase_id, purchase_ts, value FROM m
    UNION ALL
    SELECT v.user_id, v.view_id, v.view_ts,
           CAST(NULL AS BIGINT) AS purchase_id,
           CAST(NULL AS TIMESTAMP) AS purchase_ts,
           CAST(NULL AS DOUBLE) AS value
    FROM v, wm
    WHERE v.view_id NOT IN (SELECT view_id FROM m)
      AND v.view_ts + INTERVAL 1 HOUR < wm.w
    ORDER BY view_id, purchase_id
    """,
    tags=("streaming", "stream-stream-join", "interval-join", "outer"),
)
def stream_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER stream-stream interval join: views with no purchase in
    the hour emit null-extended ONCE the watermark proves no match can
    still arrive (view_ts + upper < global watermark). The global
    watermark is the MIN across both input streams
    (multipleWatermarkPolicy=min) of floor-to-ms(max event time) - delay;
    Spark finalizes the eviction in the trailing no-data micro-batch of
    an availableNow run, so the emitted set is a pure function of
    (data, interval, delay) — stated verbatim by the oracle's wm CTE,
    same technique as stream_sessionize."""
    from ..streaming.joins import stream_interval_join

    work = tempfile.mkdtemp(prefix="pxs_ssjo_")
    vs, ps = _ssj_sides(spark, sf_dir, work)
    j = stream_interval_join(
        vs,
        ps,
        "user_id",
        "view_ts",
        "purchase_ts",
        upper="1 hour",
        delay="2 hours",
        how="leftOuter",
    )
    out = _run_to_parquet(j, work, "ssjo")
    return _finalize(
        spark.read.parquet(out).orderBy("view_id", "purchase_id"), work
    )


def _build_scd2_table(spark: SparkSession, sf_dir: str, dest: str) -> None:
    """Insert %3==0, MERGE-update %6==0 (value x10), delete %9==0 — three
    transactions whose commit/tombstone log read_history derives from."""
    from ..mvcc.table import MvccTable

    e = load_table(spark, sf_dir, "events")
    table = MvccTable(spark, os.path.join(dest, "tbl"), key_col="event_id")
    table.insert(e.filter(F.col("event_id") % 3 == 0).select("event_id", "value"))
    table.merge(
        e.filter(F.col("event_id") % 6 == 0)
        .select("event_id", (F.col("value") * 10).alias("value"))
    )
    table.delete(e.filter(F.col("event_id") % 9 == 0).select("event_id"))


@declare(
    "mvcc_scd2",
    sql="""
    WITH base AS (SELECT event_id, value FROM events WHERE event_id % 3 = 0),
    v1 AS (
      SELECT event_id, value, CAST(1 AS BIGINT) AS version_no,
             (event_id % 6 <> 0 AND event_id % 9 <> 0) AS is_current
      FROM base),
    v2 AS (
      SELECT event_id, value * 10 AS value, CAST(2 AS BIGINT) AS version_no,
             (event_id % 9 <> 0) AS is_current
      FROM base WHERE event_id % 6 = 0)
    SELECT event_id, value, version_no, is_current FROM v1
    UNION ALL
    SELECT event_id, value, version_no, is_current FROM v2
    ORDER BY event_id, version_no
    """,
    tags=("mvcc", "scd2", "history"),
)
def mvcc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 history materialization from the MVCC commit/tombstone
    log (MvccTable.read_history): insert events %3==0, MERGE-update the
    %6==0 half (value x10), delete %9==0 — the history view must show
    every version with a correct open/closed state: superseded v1 rows
    closed at the update's ts, deleted keys' last versions closed at the
    delete's ts, everything else current. Version ordinals replace raw
    commit timestamps in the output (timestamps are runtime-assigned,
    but deterministic ordinals: the trans oracle persists with the
    staged table).

    The mutated table is staged once per fixture through ensure_derived
    (like the money/struct/IVF tables): the measured operator is the
    HISTORY DERIVATION — a real warehouse would run it over an existing
    mutable table, not rebuild the table per query."""
    from pyspark.sql.window import Window

    from ..catalog import table_path
    from ..mvcc.table import MvccTable
    from ..storage.derived import ensure_derived

    from ..mvcc import table as _mvcc_table_mod

    dest = ensure_derived(
        spark,
        sf_dir,
        name="scd2_events",
        source_paths=[table_path(sf_dir, "events")],
        build=lambda sp, tmp: _build_scd2_table(sp, sf_dir, tmp),
        # the builder's behavior lives in the mvcc module, not this file —
        # fold it into the cache key (code-review r6 finding)
        dep_modules=(_mvcc_table_mod,),
    )
    table = MvccTable(spark, os.path.join(dest, "tbl"), key_col="event_id")
    hist = table.read_history()
    return hist.select(
        "event_id",
        "value",
        F.row_number()
        .over(Window.partitionBy("event_id").orderBy("valid_from_ts"))
        .cast("bigint")
        .alias("version_no"),
        "is_current",
    ).orderBy("event_id", "version_no")


@declare(
    "stream_static_enrich",
    sql="""
    SELECT c.c_mktsegment AS segment,
           e.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY segment, e.event_type
    ORDER BY segment, e.event_type
    """,
    tags=("streaming", "stream-static-join", "enrichment"),
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC enrichment join — the third Structured Streaming join
    class after stream-stream and the batch surface: the live events feed
    joins the static customer dimension (re-planned per micro-batch, so a
    dim refresh between batches is picked up automatically; Spark
    broadcasts the small side), then rolls up per (segment, type). No
    watermark needed — the static side is not stateful. The replayed
    bounded stream must equal the plain batch join the oracle states.

    100 TB shape: the dim broadcast is per-micro-batch, so keep dims
    broadcast-sized or pre-bucket both sides. The aggregate's STATE is
    per-key = output cardinality (segments × types) regardless of mode;
    this bounded replay uses complete mode + a memory sink because the
    result is tiny and the driver reads it once — a production pipeline
    with a wide key space would run update mode into a keyed sink
    instead, so only changed keys move per batch."""
    work = tempfile.mkdtemp(prefix="pxs_sse_")
    src = os.path.join(work, "src")
    e = load_table(spark, sf_dir, "events")
    half = e.agg(((F.min("event_id") + F.max("event_id")) / 2).alias("m")).first()["m"]
    _write_slices(
        [e.filter(F.col("event_id") <= half), e.filter(F.col("event_id") > half)],
        src,
    )
    stream = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    enriched = (
        stream.join(cust, "user_id")  # stream-static: planned per batch
        .groupBy("segment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("_tv"),
        )
    )
    # unique sink name: the memory sink registers a session-global temp
    # view, and a concurrent run (pytest alongside driver verify) would
    # otherwise collide on it
    sink = f"pxs_sse_{os.path.basename(work).rsplit('_', 1)[-1]}"
    q = (
        enriched.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", os.path.join(work, "ck_sse"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("stream_static_enrich did not finish in 600s")
    res = (
        spark.table(sink)
        .select(
            "segment",
            "event_type",
            "n_events",
            F.col("_tv").cast("double").alias("total_value"),
        )
        .orderBy("segment", "event_type")
    )
    final = _finalize(res, work)
    spark.catalog.dropTempView(sink)
    return final


@declare(
    "stream_stream_join_full",
    sql=_SSJ_CTES
    + """
    , wm AS (
      SELECT least((SELECT date_trunc('milliseconds', max(view_ts)) FROM v),
                   (SELECT date_trunc('milliseconds', max(purchase_ts)) FROM p))
             - INTERVAL 2 HOUR AS w)
    SELECT user_id, view_id, view_ts, purchase_id, purchase_ts, value FROM m
    UNION ALL
    SELECT v.user_id, v.view_id, v.view_ts,
           CAST(NULL AS BIGINT), CAST(NULL AS TIMESTAMP), CAST(NULL AS DOUBLE)
    FROM v, wm
    WHERE v.view_id NOT IN (SELECT view_id FROM m)
      AND v.view_ts + INTERVAL 1 HOUR < wm.w
    UNION ALL
    SELECT p.user_id, CAST(NULL AS BIGINT), CAST(NULL AS TIMESTAMP),
           p.purchase_id, p.purchase_ts, p.value
    FROM p, wm
    WHERE p.purchase_id NOT IN (SELECT purchase_id FROM m)
      AND p.purchase_ts < wm.w
    ORDER BY view_id, purchase_id
    """,
    tags=("streaming", "stream-stream-join", "interval-join", "full-outer"),
)
def stream_stream_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-OUTER stream-stream interval join — the family completed. Each
    side null-extends once the watermark proves no match can still arrive,
    at a side-specific horizon: a view closes at view_ts + upper < wm (its
    match window ends), a purchase closes at purchase_ts < wm (any
    matching view would have view_ts <= purchase_ts, all below the
    watermark). Both horizons verified empirically and stated verbatim in
    the oracle, same technique as the left-outer query."""
    from ..streaming.joins import stream_interval_join

    work = tempfile.mkdtemp(prefix="pxs_ssjf_")
    vs, ps = _ssj_sides(spark, sf_dir, work)
    j = stream_interval_join(
        vs,
        ps,
        "user_id",
        "view_ts",
        "purchase_ts",
        upper="1 hour",
        delay="2 hours",
        how="fullOuter",
    )
    out = _run_to_parquet(j, work, "ssjf")
    return _finalize(
        spark.read.parquet(out).orderBy("view_id", "purchase_id"), work
    )


@declare(
    "sql_dml_lifecycle",
    sql="""
    SELECT event_id, event_type,
           CASE WHEN event_type = 'click' THEN value * 2 ELSE value END AS value
    FROM events
    WHERE event_id % 4 = 0 AND event_id % 8 <> 4
    ORDER BY event_id
    """,
    tags=("sql", "dml", "mvcc", "frontend"),
)
def sql_dml_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-frontend mutation path end-to-end: INSERT INTO … SELECT
    seeds an MVCC table from the fixture, UPDATE … SET doubles click
    values, DELETE FROM prunes half the keys — three verbatim SQL texts
    routed through sql.dml onto the transactional table ops (one commit
    ts each). The final snapshot must equal the oracle's relational
    restatement of the same three statements."""
    from ..mvcc.table import MvccTable
    from ..sql import dml

    work = tempfile.mkdtemp(prefix="pxs_sql_dml_")
    table = MvccTable(spark, os.path.join(work, "tbl"), key_col="event_id")
    tables = {"t": table}
    dml(spark, sf_dir, tables,
        "INSERT INTO t SELECT event_id, event_type, value FROM events "
        "WHERE event_id % 4 = 0")
    dml(spark, sf_dir, tables,
        "UPDATE t SET value = value * 2 WHERE event_type = 'click'")
    dml(spark, sf_dir, tables, "DELETE FROM t WHERE event_id % 8 = 4")
    return _finalize(
        table.read_latest_version().drop("_commit_ts").orderBy("event_id"), work
    )


@declare(
    "mvcc_snapshot_diff",
    sql="""
    WITH cls AS (
      SELECT event_id,
             CASE WHEN event_id % 3 = 1 THEN 'added'
                  WHEN event_id % 9 = 6 THEN 'removed'
                  WHEN event_id % 6 = 0 AND value * 10 <> value THEN 'changed'
             END AS change,
             value
      FROM events WHERE event_id % 3 <> 2)
    SELECT event_id, change,
           CASE WHEN change <> 'added' THEN value END AS old_value,
           CASE WHEN change = 'added' THEN value
                WHEN change = 'changed' THEN value * 10 END AS new_value
    FROM cls WHERE change IS NOT NULL ORDER BY event_id
    """,
    tags=("mvcc", "time-travel", "diff", "audit"),
)
def mvcc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel audit: what three commits (merge-update, merge-insert,
    delete) did to a table, computed as snapshot_diff(ts_first, ts_last)
    — two snapshot reads + one full-outer key join, independent of the
    commit count in between. added = %3==1 inserts, removed = %9==6
    deletes, changed = the %6==0 value×10 updates; the oracle restates
    the three classes relationally."""
    from ..mvcc.table import MvccTable

    work = tempfile.mkdtemp(prefix="pxs_snap_diff_")
    e = load_table(spark, sf_dir, "events").select("event_id", "value")
    table = MvccTable(spark, os.path.join(work, "tbl"), key_col="event_id")
    ts1 = table.insert(e.filter(F.col("event_id") % 3 == 0))
    source = (
        e.filter(F.col("event_id") % 6 == 0)
        .withColumn("value", F.col("value") * 10)
        .unionByName(e.filter(F.col("event_id") % 3 == 1))
    )
    table.merge(source)
    ts3 = table.delete(
        e.filter(F.col("event_id") % 9 == 6).select("event_id")
    )
    diff = table.snapshot_diff(ts1, ts3)
    return _finalize(
        diff.select(
            "event_id",
            "change",
            F.col("old.value").alias("old_value"),
            F.col("new.value").alias("new_value"),
        ).orderBy("event_id"),
        work,
    )


@declare(
    "mvcc_restore",
    sql="""
    SELECT event_id, value FROM events WHERE event_id % 3 = 0
    ORDER BY event_id
    """,
    tags=("mvcc", "time-travel", "restore"),
)
def mvcc_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE-to-snapshot: a bad ingest (merge that ×10s some values and
    inserts noise, then a stray delete) is undone by ``restore(ts1)`` —
    a forward commit whose visible state equals the pre-ingest snapshot
    exactly; the oracle restates that snapshot relationally. History
    between ts1 and the restore stays time-travelable (pinned in
    tests/test_mvcc.py, with O(Δ) write volume). The undo primitive
    time travel alone can't provide — reading an old snapshot never
    changes what new writers see.
    """
    from ..mvcc.table import MvccTable

    work = tempfile.mkdtemp(prefix="pxs_restore_")
    e = load_table(spark, sf_dir, "events").select("event_id", "value")
    table = MvccTable(spark, os.path.join(work, "tbl"), key_col="event_id")
    ts1 = table.insert(e.filter(F.col("event_id") % 3 == 0))
    table.merge(
        e.filter(F.col("event_id") % 6 == 0)
        .withColumn("value", F.col("value") * 10)
        .unionByName(e.filter(F.col("event_id") % 3 == 1))
    )
    table.delete(e.filter(F.col("event_id") % 9 == 6).select("event_id"))
    table.restore(ts1)
    return _finalize(
        table.read().select("event_id", "value").orderBy("event_id"), work
    )


@declare(
    "mvcc_ivm_join",
    sql="""
    WITH f AS (
      SELECT event_id, user_id,
             CASE WHEN event_id % 10 = 0 THEN value * 10 ELSE value END
               AS value
      FROM events
      WHERE (event_id % 2 = 0 OR event_id % 4 = 1) AND event_id % 8 <> 2
    ),
    d AS (
      SELECT c_custkey AS user_id,
             CASE WHEN c_custkey = 3 THEN 'MOVED' ELSE c_mktsegment END
               AS segment
      FROM customer WHERE c_custkey < 15
    )
    SELECT d.segment, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(f.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM f JOIN d ON f.user_id = d.user_id
    GROUP BY d.segment ORDER BY d.segment
    """,
    tags=("mvcc", "ivm", "join", "materialized-view"),
)
def mvcc_ivm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-view IVM (MaterializedJoinRollup): a segment revenue rollup
    over events ⋈ customers — both MVCC tables — maintained through a
    fact merge (×10 updates + inserts), a DIM segment reassignment (the
    case single-table IVM can't express: customer 3's joined mass moves
    to 'MOVED' without a fact rescan), and a fact delete. One refresh()
    folds all three deltas; the oracle restates the final join
    relationally. Δ(F⋈D) = ΔF⋈D_new ∪ F_old⋈ΔD — exactness fuzzed in
    tests/test_ivm.py, cost tracks delta size at 100 TB (mvcc/ivm.py).
    """
    from ..mvcc.ivm import MaterializedJoinRollup
    from ..mvcc.table import MvccTable

    work = tempfile.mkdtemp(prefix="pxs_ivm_join_")
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 15)
    fact = MvccTable(spark, os.path.join(work, "fact"), key_col="event_id")
    dim = MvccTable(spark, os.path.join(work, "dim"), key_col="user_id")
    fact.insert(e.filter(F.col("event_id") % 2 == 0))
    dim.insert(
        c.select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    mv = MaterializedJoinRollup(
        spark, os.path.join(work, "mv"), fact, dim, "user_id",
        ["segment"], ["value"],
    )
    mv.full_refresh()
    fact.merge(
        e.filter(F.col("event_id") % 10 == 0)
        .withColumn("value", F.col("value") * 10)
        .unionByName(e.filter(F.col("event_id") % 4 == 1))
    )
    dim.merge(
        spark.createDataFrame([(3, "MOVED")], "user_id bigint, segment string")
    )
    fact.delete(e.filter(F.col("event_id") % 8 == 2).select("event_id"))
    mv.refresh()
    return _finalize(
        mv.read()
        .select(
            "segment",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("sum_value").cast("double").alias("sum_value"),
        )
        .orderBy("segment"),
        work,
    )


@declare(
    "stream_ivm_join",
    sql="""
    WITH d AS (
      SELECT c_custkey AS user_id,
             CASE WHEN c_custkey = 3 THEN 'MOVED' ELSE c_mktsegment END
               AS segment
      FROM customer WHERE c_custkey < 15
    )
    SELECT d.segment, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events e JOIN d ON e.user_id = d.user_id
    GROUP BY d.segment ORDER BY d.segment
    """,
    tags=("streaming", "ivm", "join", "materialized-view"),
)
def stream_ivm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest against a JOIN-view: events replayed as a 2-batch
    stream into the fact MVCC table, each micro-batch folding only its
    own commits into the fact ⋈ customers segment rollup
    (MaterializedJoinRollup.refresh — ΔF ⋈ D_new, delta-sized); after the
    stream, a DIM segment reassignment (customer 3 → 'MOVED') lands as a
    third delta through the F_old ⋈ ΔD term. The served rollup is always
    merge-free and must equal the from-scratch join aggregation."""
    from ..mvcc.ivm import MaterializedJoinRollup
    from ..mvcc.table import MvccTable
    from ..streaming.ingest import ingest_stream_with_ivm

    work = tempfile.mkdtemp(prefix="pxs_stream_ivm_join_")
    src = os.path.join(work, "src")
    e = load_table(spark, sf_dir, "events")
    half = e.agg(((F.min("event_id") + F.max("event_id")) / 2).alias("m")).first()["m"]
    _write_slices(
        [e.filter(F.col("event_id") <= half), e.filter(F.col("event_id") > half)],
        src,
    )
    dim = MvccTable(spark, os.path.join(work, "dim"), key_col="user_id")
    dim.insert(
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 15)
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    fact = MvccTable(spark, os.path.join(work, "fact"), key_col="event_id")
    mv = MaterializedJoinRollup(
        spark, os.path.join(work, "mv"), fact, dim, "user_id",
        ["segment"], ["value"],
    )
    stream = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = ingest_stream_with_ivm(stream, fact, mv, os.path.join(work, "ck"))
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("ivm join ingest did not finish in 600s")
    dim.merge(
        spark.createDataFrame([(3, "MOVED")], "user_id bigint, segment string")
    )
    mv.refresh()
    return _finalize(
        mv.read()
        .select(
            "segment",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("sum_value").cast("double").alias("sum_value"),
        )
        .orderBy("segment"),
        work,
    )


def _stream_cms_oracle() -> str:
    from .statsq import _cms_oracle

    return _cms_oracle()


@declare(
    "stream_sketch_count_min",
    sql=_stream_cms_oracle(),
    tags=("streaming", "sketch", "count-min", "mergeable", "beyond-parity"),
)
def stream_sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming maintenance of the Count-Min sketch: events replayed as a
    2-micro-batch file stream, each batch's sketch folded into a persisted
    ``CountMinRegistry`` by cell-wise sum (foreachBatch — the same loop
    shape as BloomRegistry's streaming dedup). Because merge is linear,
    sketch(batch₁) ⊕ sketch(batch₂) ≡ sketch(batch₁ ∪ batch₂) EXACTLY, so
    the maintained sketch's estimates are bit-identical to the one-shot
    batch build — the oracle is literally ``sketch_count_min``'s (built
    over the whole table), and the driver hash must match it."""
    from ..functions.sketches import CountMinRegistry
    from .statsq import _CMS_DEPTH, _CMS_WIDTH

    work = tempfile.mkdtemp(prefix="pxs_stream_cms_")
    src = os.path.join(work, "src")
    e = load_table(spark, sf_dir, "events")
    half = e.agg(
        ((F.min("event_id") + F.max("event_id")) / 2).alias("m")
    ).first()["m"]
    _write_slices(
        [e.filter(F.col("event_id") <= half), e.filter(F.col("event_id") > half)],
        src,
    )
    stream = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    reg = CountMinRegistry(
        spark, os.path.join(work, "cms"), _CMS_DEPTH, _CMS_WIDTH
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: reg.merge_batch(bdf, "user_id", batch_id=bid)
        )
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("stream_sketch_count_min did not finish in 600s")
    assert reg._state()["n"] >= 2, "expected >= 2 micro-batches"
    keys = (
        e.select("user_id")
        .filter(F.col("user_id").isNotNull())
        .distinct()
        .orderBy("user_id")
        .limit(10)
    )
    est = reg.estimate(keys, "user_id")
    exact = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_cnt")
    )
    out = (
        est.join(exact, "user_id")
        .select(
            "user_id",
            F.col("est_cnt").cast("bigint").alias("est_cnt"),
            "exact_cnt",
            (F.col("est_cnt") >= F.col("exact_cnt")).alias("is_overestimate"),
        )
        .orderBy("user_id")
    )
    return _finalize(out, work)


def _stream_kmv_oracle() -> str:
    """One-shot KMV build over ALL order custkeys — the streaming
    registry must equal it bit-for-bit (⊕ law)."""
    k = 256
    return f"""
    WITH keys AS (SELECT DISTINCT o_custkey AS key FROM orders),
    s AS (SELECT DISTINCT CAST(concat('0x',
            substr(md5(CAST(key AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
          FROM keys ORDER BY hv LIMIT {k})
    SELECT {k} AS k,
      (SELECT CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
              ELSE {k - 1}.0 * 1152921504606846976.0
                   / CAST(max(hv) AS DOUBLE) END FROM s) AS est_dv,
      (SELECT CAST(count(*) AS BIGINT) FROM keys) AS exact_dv
    """


@declare(
    "stream_sketch_kmv",
    sql=_stream_kmv_oracle(),
    tags=("streaming", "sketch", "kmv", "mergeable", "beyond-parity"),
)
def stream_sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming maintenance of the KMV distinct synopsis: orders
    replayed as a 2-micro-batch file stream, each batch's synopsis
    ⊕-folded into a persisted ``KmvRegistry`` (union + re-truncate —
    the same foreachBatch loop shape as CountMinRegistry). Because the
    k smallest of a union are always within the union of each side's k
    smallest, the maintained synopsis is BIT-IDENTICAL to a one-shot
    build over the whole table — the oracle is that one-shot build, and
    the driver hash must match it. Running distinct-buyer estimate in
    O(k) state over an unbounded stream."""
    from ..functions.sketches import KmvRegistry

    work = tempfile.mkdtemp(prefix="pxs_stream_kmv_")
    src = os.path.join(work, "src")
    o = load_table(spark, sf_dir, "orders")
    half = o.agg(
        ((F.min("o_orderkey") + F.max("o_orderkey")) / 2).alias("m")
    ).first()["m"]
    _write_slices(
        [o.filter(F.col("o_orderkey") <= half), o.filter(F.col("o_orderkey") > half)],
        src,
    )
    stream = (
        spark.readStream.schema(SCHEMAS["orders"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    reg = KmvRegistry(spark, os.path.join(work, "kmv"), k=256)
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: reg.merge_batch(bdf, "o_custkey", batch_id=bid)
        )
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("stream_sketch_kmv did not finish in 600s")
    assert reg._state()["n"] >= 2, "expected >= 2 micro-batches"
    exact = o.select("o_custkey").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_dv")
    )
    out = (
        reg.estimate()
        .crossJoin(exact)
        .select(F.lit(256).alias("k"), "est_dv", "exact_dv")
    )
    return _finalize(out, work)


def _stream_anomaly_oracle() -> str:
    from .temporalq import _anomaly_oracle

    return _anomaly_oracle()


@declare(
    "stream_anomaly",
    sql=_stream_anomaly_oracle(),
    tags=("streaming", "anomaly", "zscore", "linear-state", "beyond-parity"),
)
def stream_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``ts_anomaly``: events replayed as a
    2-micro-batch file stream; each batch folds its hourly per-type
    counts into a persisted counter table by SUM (counts are LINEAR, so
    fold(batch₁) + fold(batch₂) ≡ count(batch₁ ∪ batch₂) exactly —
    state is one row per (event_type, hour), independent of event
    volume). After ingest the identical scoring stage
    (``temporalq.anomaly_scores``) runs over the maintained counters,
    so the result — and the driver hash — must equal the batch query's,
    against the SAME dialect-shared oracle. The alerting shape at
    100 TB: the raw stream is touched once per batch; scoring reads
    only the tiny counter table."""
    from .temporalq import anomaly_scores

    counters, work = _maintained_hourly_counters(spark, sf_dir, "anom")
    return _finalize(anomaly_scores(counters), work)


def _maintained_hourly_counters(
    spark: SparkSession, sf_dir: str, prefix: str
) -> tuple[DataFrame, str]:
    """Replay events as a 2-micro-batch file stream and maintain the
    per-(event_type, hour) counter table via foreachBatch SUM-folds —
    the LINEAR-state ingest stage shared by ``stream_anomaly`` and
    ``stream_cusum`` (counts are linear: fold(b₁)+fold(b₂) ≡
    count(b₁∪b₂) exactly, so any scorer over the counters matches its
    batch twin bit-for-bit). Returns (counter frame, workdir)."""
    import json
    import shutil

    work = tempfile.mkdtemp(prefix=f"pxs_stream_{prefix}_")
    src = os.path.join(work, "src")
    state_root = os.path.join(work, "state")
    os.makedirs(state_root, exist_ok=True)
    state_json = os.path.join(state_root, "STATE.json")
    e = load_table(spark, sf_dir, "events")
    half = e.agg(
        ((F.min("event_id") + F.max("event_id")) / 2).alias("m")
    ).first()["m"]
    _write_slices(
        [e.filter(F.col("event_id") <= half), e.filter(F.col("event_id") > half)],
        src,
    )

    def fold(batch_df: DataFrame, _bid: int) -> None:
        if os.path.exists(state_json):
            with open(state_json) as _f:
                if json.load(_f).get("last_bid") == _bid:
                    return  # at-least-once replay of this micro-batch: already folded
        h = batch_df.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hr")
        ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        if os.path.exists(state_json):
            with open(state_json) as f:
                st = json.load(f)
            prev = spark.read.parquet(st["data"])
            merged = (
                prev.unionByName(h)
                .groupBy("event_type", "hr")
                .agg(F.sum("cnt").cast("bigint").alias("cnt"))
            )
            n = st["n"] + 1
        else:
            st, merged, n = None, h, 1
        dest = os.path.join(state_root, f"counts_v={n}")
        merged.write.mode("overwrite").parquet(dest)
        tmp = state_json + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"n": n, "data": dest, "last_bid": _bid}, f)
        os.replace(tmp, state_json)
        if st and st["data"] != dest and os.path.isdir(st["data"]):
            shutil.rmtree(st["data"], ignore_errors=True)

    stream = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError(f"stream_{prefix} did not finish in 600s")
    with open(state_json) as f:
        st = json.load(f)
    assert st["n"] >= 2, "expected >= 2 micro-batches"
    return spark.read.parquet(st["data"]), work


def _stream_priority_oracle() -> str:
    from .text_pipeline import _PRIORITY_ORACLE

    return _PRIORITY_ORACLE


@declare(
    "stream_priority_sample",
    sql=_stream_priority_oracle(),
    tags=("streaming", "sampling", "priority", "mergeable", "beyond-parity"),
)
def stream_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming maintenance of the priority sample: documents replayed
    as a 2-micro-batch file stream, each batch's top-(k+1) priorities
    folded into an O(k) persisted state (state ∪ batch-head → keep
    top-(k+1)). Priorities are a pure function of (key, weight, salt),
    and the global top-(k+1) of a union is always contained in the union
    of each side's top-(k+1) — so the maintained head is BIT-IDENTICAL
    to the batch scan's and the driver hash must match
    ``txt_priority_sample``'s oracle exactly. A weight-proportional
    sample (with unbiased subset-sum estimates) over an unbounded stream
    in 65 rows of state."""
    import json
    import shutil

    from ..functions.sampling import priority_scored, priority_topk_finalize

    k = 64
    work = tempfile.mkdtemp(prefix="pxs_stream_prio_")
    src = os.path.join(work, "src")
    state_root = os.path.join(work, "state")
    os.makedirs(state_root, exist_ok=True)
    state_json = os.path.join(state_root, "STATE.json")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    half = d.agg(((F.min("doc_id") + F.max("doc_id")) / 2).alias("m")).first()[
        "m"
    ]
    _write_slices(
        [d.filter(F.col("doc_id") <= half), d.filter(F.col("doc_id") > half)],
        src,
    )

    def fold(batch_df: DataFrame, _bid: int) -> None:
        if os.path.exists(state_json):
            with open(state_json) as _f:
                if json.load(_f).get("last_bid") == _bid:
                    return  # at-least-once replay of this micro-batch: already folded
        head = priority_scored(
            batch_df.select("doc_id", "source", "n_chars"),
            "doc_id",
            "n_chars",
            salt="prio1",
        )
        if os.path.exists(state_json):
            with open(state_json) as f:
                st = json.load(f)
            head = head.unionByName(spark.read.parquet(st["data"]))
            n = st["n"] + 1
        else:
            st, n = None, 1
        merged = head.orderBy(
            F.col("priority").desc(), F.col("doc_id")
        ).limit(k + 1)
        dest = os.path.join(state_root, f"head_v={n}")
        merged.write.mode("overwrite").parquet(dest)
        tmp = state_json + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"n": n, "data": dest, "last_bid": _bid}, f)
        os.replace(tmp, state_json)
        if st and st["data"] != dest and os.path.isdir(st["data"]):
            shutil.rmtree(st["data"], ignore_errors=True)

    stream = (
        spark.readStream.schema(SCHEMAS["documents"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: fold(
                bdf.select("doc_id", "source", "n_chars"), bid
            )
        )
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("stream_priority_sample did not finish in 600s")
    with open(state_json) as f:
        st = json.load(f)
    assert st["n"] >= 2, "expected >= 2 micro-batches"
    head = spark.read.parquet(st["data"])
    out = priority_topk_finalize(head, "doc_id", "n_chars", k).select(
        "doc_id", "source", "n_chars", "priority", "est_weight"
    ).orderBy("doc_id")
    return _finalize(out, work)


def _stream_pca_oracle() -> str:
    from .vector_search import _pca_power_oracle

    return _pca_power_oracle(3)


@declare(
    "stream_pca",
    sql=_stream_pca_oracle(),
    tags=("streaming", "pca", "mergeable", "linear-state", "beyond-parity"),
)
def stream_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming PCA maintenance: embeddings replayed as a 2-micro-batch
    file stream; each batch's co-moment PARTIALS (Σq, Σqq, n — all plain
    sums, see ``functions.vector.comoment_partials``) fold into a
    persisted O(d²) state by groupBy-SUM, and the identical exact-integer
    power iteration (``pca_power_from_comoment``) runs over the assembled
    matrix — so the learned principal direction over an unbounded
    embedding stream is BIT-IDENTICAL to the batch build, and the driver
    hash must equal ``vec_pca_power``'s oracle. The model-maintenance
    shape at 100 TB: each batch is touched once; state is d(d+1)/2+d+1
    rows regardless of corpus size."""
    import json
    import shutil

    from ..functions.vector import (
        comoment_from_partials,
        comoment_partials,
        pca_power_from_comoment,
    )

    work = tempfile.mkdtemp(prefix="pxs_stream_pca_")
    src = os.path.join(work, "src")
    state_root = os.path.join(work, "state")
    os.makedirs(state_root, exist_ok=True)
    state_json = os.path.join(state_root, "STATE.json")
    e = load_table(spark, sf_dir, "embeddings")
    half = e.agg(((F.min("vec_id") + F.max("vec_id")) / 2).alias("m")).first()[
        "m"
    ]
    _write_slices(
        [e.filter(F.col("vec_id") <= half), e.filter(F.col("vec_id") > half)],
        src,
    )

    def fold(batch_df: DataFrame, _bid: int) -> None:
        if os.path.exists(state_json):
            with open(state_json) as _f:
                if json.load(_f).get("last_bid") == _bid:
                    return  # at-least-once replay of this micro-batch: already folded
        parts = comoment_partials(batch_df, "vec_id", "embedding")
        if os.path.exists(state_json):
            with open(state_json) as f:
                st = json.load(f)
            parts = (
                parts.unionByName(spark.read.parquet(st["data"]))
                .groupBy("i", "j")
                .agg(F.sum("p").alias("p"))
            )
            n = st["n"] + 1
        else:
            st, n = None, 1
        dest = os.path.join(state_root, f"parts_v={n}")
        parts.write.mode("overwrite").parquet(dest)
        tmp = state_json + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"n": n, "data": dest, "last_bid": _bid}, f)
        os.replace(tmp, state_json)
        if st and st["data"] != dest and os.path.isdir(st["data"]):
            shutil.rmtree(st["data"], ignore_errors=True)

    stream = (
        spark.readStream.schema(SCHEMAS["embeddings"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("stream_pca did not finish in 600s")
    with open(state_json) as f:
        st = json.load(f)
    assert st["n"] >= 2, "expected >= 2 micro-batches"
    parts = spark.read.parquet(st["data"])
    out = pca_power_from_comoment(comoment_from_partials(parts))
    return _finalize(out, work)


def _stream_ks_oracle() -> str:
    from .registry import REGISTRY
    from . import statsq  # noqa: F401  (ensure registration)

    return REGISTRY["stat_ks_test"].sql


@declare(
    "stream_ks_drift",
    sql=_stream_ks_oracle(),
    tags=("streaming", "drift", "ks", "linear-state", "beyond-parity"),
)
def stream_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming drift monitoring: the two-sample KS test maintained over
    an unbounded stream. Per micro-batch, the (value, view-count,
    click-count) table folds by SUM — value-grain counters are LINEAR,
    so the maintained table equals the batch scan's exactly and the
    identical scoring stage (two-level prefix CDF distance) must
    hash-match ``stat_ks_test``'s oracle. State is one row per distinct
    value, independent of event volume — the deploy-gate shape: "has the
    click distribution drifted from views?" answered continuously."""
    import json
    import shutil

    work = tempfile.mkdtemp(prefix="pxs_stream_ks_")
    src = os.path.join(work, "src")
    state_root = os.path.join(work, "state")
    os.makedirs(state_root, exist_ok=True)
    state_json = os.path.join(state_root, "STATE.json")
    e = load_table(spark, sf_dir, "events")
    half = e.agg(
        ((F.min("event_id") + F.max("event_id")) / 2).alias("m")
    ).first()["m"]
    _write_slices(
        [e.filter(F.col("event_id") <= half), e.filter(F.col("event_id") > half)],
        src,
    )

    def fold(batch_df: DataFrame, _bid: int) -> None:
        if os.path.exists(state_json):
            with open(state_json) as _f:
                if json.load(_f).get("last_bid") == _bid:
                    return  # at-least-once replay of this micro-batch: already folded
        ab = (
            batch_df.filter(F.col("event_type").isin("view", "click"))
            .groupBy(F.col("value").alias("v"))
            .agg(
                F.sum(
                    F.when(F.col("event_type") == "view", 1).otherwise(0)
                ).cast("bigint").alias("ca"),
                F.sum(
                    F.when(F.col("event_type") == "click", 1).otherwise(0)
                ).cast("bigint").alias("cb"),
            )
        )
        if os.path.exists(state_json):
            with open(state_json) as f:
                st = json.load(f)
            ab = (
                ab.unionByName(spark.read.parquet(st["data"]))
                .groupBy("v")
                .agg(
                    F.sum("ca").cast("bigint").alias("ca"),
                    F.sum("cb").cast("bigint").alias("cb"),
                )
            )
            n = st["n"] + 1
        else:
            st, n = None, 1
        dest = os.path.join(state_root, f"counts_v={n}")
        ab.write.mode("overwrite").parquet(dest)
        tmp = state_json + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"n": n, "data": dest, "last_bid": _bid}, f)
        os.replace(tmp, state_json)
        if st and st["data"] != dest and os.path.isdir(st["data"]):
            shutil.rmtree(st["data"], ignore_errors=True)

    stream = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("stream_ks_drift did not finish in 600s")
    with open(state_json) as f:
        st = json.load(f)
    assert st["n"] >= 2, "expected >= 2 micro-batches"
    from .statsq import ks_scan

    counters = spark.read.parquet(st["data"])
    return _finalize(ks_scan(counters), work)


def _stream_auc_oracle() -> str:
    from .evalq import eval_auc as _ea  # noqa: F401  (registry holds the sql)
    from .registry import REGISTRY

    return REGISTRY["eval_auc"].sql


@declare(
    "stream_eval_auc",
    sql=_stream_auc_oracle(),
    tags=("streaming", "eval", "auc", "linear-state", "beyond-parity"),
)
def stream_eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming model-quality monitoring: EXACT tie-corrected ROC AUC
    maintained over an unbounded scored stream. Per micro-batch the
    (value, pos-count, neg-count) table folds by SUM — value-grain
    counters are LINEAR, so the maintained table equals the one-shot
    batch build exactly and the identical scoring stage
    (``evalq.auc_scan``: two-level band prefix → one BIGINT rank sum)
    must hash-match ``eval_auc``'s oracle bit-for-bit. State is one row
    per distinct score value, independent of event volume — continuous
    "is the model still ranking buyers above browsers?" without ever
    re-scanning history. Replay-idempotent via the last_bid guard."""
    import json
    import shutil

    work = tempfile.mkdtemp(prefix="pxs_stream_auc_")
    src = os.path.join(work, "src")
    state_root = os.path.join(work, "state")
    os.makedirs(state_root, exist_ok=True)
    state_json = os.path.join(state_root, "STATE.json")
    e = load_table(spark, sf_dir, "events")
    half = e.agg(
        ((F.min("event_id") + F.max("event_id")) / 2).alias("m")
    ).first()["m"]
    _write_slices(
        [e.filter(F.col("event_id") <= half), e.filter(F.col("event_id") > half)],
        src,
    )

    def fold(batch_df: DataFrame, _bid: int) -> None:
        if os.path.exists(state_json):
            with open(state_json) as _f:
                if json.load(_f).get("last_bid") == _bid:
                    return  # at-least-once replay: already folded
        g = (
            batch_df.filter(F.col("event_type").isin("purchase", "view"))
            .groupBy(F.col("value").alias("v"))
            .agg(
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                ).cast("bigint").alias("p"),
                F.sum(
                    F.when(F.col("event_type") == "view", 1).otherwise(0)
                ).cast("bigint").alias("n"),
            )
        )
        if os.path.exists(state_json):
            with open(state_json) as f:
                st = json.load(f)
            g = (
                g.unionByName(spark.read.parquet(st["data"]))
                .groupBy("v")
                .agg(
                    F.sum("p").cast("bigint").alias("p"),
                    F.sum("n").cast("bigint").alias("n"),
                )
            )
            nb = st["n"] + 1
        else:
            st, nb = None, 1
        dest = os.path.join(state_root, f"counts_v={nb}")
        g.write.mode("overwrite").parquet(dest)
        tmp = state_json + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"n": nb, "data": dest, "last_bid": _bid}, f)
        os.replace(tmp, state_json)
        if st and st["data"] != dest and os.path.isdir(st["data"]):
            shutil.rmtree(st["data"], ignore_errors=True)

    stream = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("stream_eval_auc did not finish in 600s")
    with open(state_json) as f:
        st = json.load(f)
    assert st["n"] >= 2, "expected >= 2 micro-batches"
    from .evalq import auc_scan

    counters = spark.read.parquet(st["data"])
    return _finalize(auc_scan(counters), work)


def _stream_cusum_oracle() -> str:
    from .temporalq import _CUSUM_ORACLE

    return _CUSUM_ORACLE


@declare(
    "stream_cusum",
    sql=_stream_cusum_oracle(),
    tags=("streaming", "changepoint", "cusum", "linear-state",
          "beyond-parity"),
)
def stream_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``ts_cusum``: the same maintained hourly counter
    table as ``stream_anomaly`` (linear SUM-folds per micro-batch, state
    one row per type×hour), scored by the identical exact-bigint CUSUM
    fold (``temporalq.cusum_scan``) — so drift detection runs over an
    unbounded stream with calendar-bounded state and the driver hash must
    equal the batch query's, against the SAME recursive-CTE oracle."""
    from .temporalq import cusum_scan

    counters, work = _maintained_hourly_counters(spark, sf_dir, "cusum")
    return _finalize(cusum_scan(counters), work)


def _stream_hist_oracle() -> str:
    from .statsq import _hist_oracle

    return _hist_oracle()


def _stream_volume_oracle() -> str:
    from .registry import REGISTRY
    from .statsq import dq_volume_anomaly as _dv  # noqa: F401

    return REGISTRY["dq_volume_anomaly"].sql


@declare(
    "stream_volume_anomaly",
    sql=_stream_volume_oracle(),
    tags=("streaming", "data-quality", "anomaly", "linear-state",
          "beyond-parity"),
)
def stream_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``dq_volume_anomaly``: the per-(stream, day)
    ingest-volume counters fold by SUM per micro-batch (linear — state
    is one row per stream-day, independent of volume) and the identical
    factored scoring stage (``statsq.volume_scan``: trailing 7-day
    z-score from exact BIGINT sums) runs over the maintained table, so
    the result shares the batch oracle bit-for-bit. The continuous
    ingest-gate shape: "did this feed just drop 40%?" answered per
    micro-batch without re-scanning history. Replay-idempotent via the
    persisted batch id."""
    import json
    import shutil

    work = tempfile.mkdtemp(prefix="pxs_stream_vol_")
    src = os.path.join(work, "src")
    state_root = os.path.join(work, "state")
    os.makedirs(state_root, exist_ok=True)
    state_json = os.path.join(state_root, "STATE.json")
    e = load_table(spark, sf_dir, "events")
    half = e.agg(
        ((F.min("event_id") + F.max("event_id")) / 2).alias("m")
    ).first()["m"]
    _write_slices(
        [e.filter(F.col("event_id") <= half), e.filter(F.col("event_id") > half)],
        src,
    )

    def fold(batch_df: DataFrame, _bid: int) -> None:
        if os.path.exists(state_json):
            with open(state_json) as _f:
                if json.load(_f).get("last_bid") == _bid:
                    return  # at-least-once replay: already folded
        d = batch_df.groupBy(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("day"),
        ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        if os.path.exists(state_json):
            with open(state_json) as f:
                st = json.load(f)
            d = (
                d.unionByName(spark.read.parquet(st["data"]))
                .groupBy("event_type", "day")
                .agg(F.sum("n").cast("bigint").alias("n"))
            )
            nb = st["n"] + 1
        else:
            st, nb = None, 1
        dest = os.path.join(state_root, f"counts_v={nb}")
        d.write.mode("overwrite").parquet(dest)
        tmp = state_json + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"n": nb, "data": dest, "last_bid": _bid}, f)
        os.replace(tmp, state_json)
        if st and st["data"] != dest and os.path.isdir(st["data"]):
            shutil.rmtree(st["data"], ignore_errors=True)

    stream = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("stream_volume_anomaly did not finish in 600s")
    with open(state_json) as f:
        st = json.load(f)
    assert st["n"] >= 2, "expected >= 2 micro-batches"
    from .statsq import volume_scan

    counters = spark.read.parquet(st["data"])
    return _finalize(volume_scan(counters), work)


@declare(
    "stream_sketch_histogram",
    sql=_stream_hist_oracle(),
    tags=("streaming", "sketch", "histogram", "mergeable", "beyond-parity"),
)
def stream_sketch_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming maintenance of the histogram sketch: orders replayed as
    a 2-micro-batch file stream, each batch's histogram bin-summed into a
    persisted ``HistogramRegistry`` (foreachBatch — same loop shape as
    the CMS/KMV/Bloom registries). Counter linearity makes the maintained
    sketch bit-identical to a one-shot build over the whole table, so the
    oracle is literally ``sketch_histogram``'s — running p50/p90/p99 over
    an unbounded stream in O(bins) state, and the driver hash must match
    the batch build exactly."""
    from ..functions.sketches import HistogramRegistry
    from .statsq import _HIST_BINS, _HIST_HI, _HIST_LO, _HIST_QS

    work = tempfile.mkdtemp(prefix="pxs_stream_hist_")
    src = os.path.join(work, "src")
    o = load_table(spark, sf_dir, "orders")
    half = o.agg(
        ((F.min("o_orderkey") + F.max("o_orderkey")) / 2).alias("m")
    ).first()["m"]
    _write_slices(
        [o.filter(F.col("o_orderkey") <= half), o.filter(F.col("o_orderkey") > half)],
        src,
    )
    stream = (
        spark.readStream.schema(SCHEMAS["orders"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    reg = HistogramRegistry(
        spark, os.path.join(work, "hist"), _HIST_LO, _HIST_HI, _HIST_BINS
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: reg.merge_batch(bdf, "o_totalprice", batch_id=bid)
        )
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("stream_sketch_histogram did not finish in 600s")
    assert reg._state()["n"] >= 2, "expected >= 2 micro-batches"
    return _finalize(reg.quantiles(_HIST_QS).orderBy("q"), work)


@declare(
    "mvcc_time_travel_sql",
    sql="""
    WITH seeded AS (
      SELECT event_id, value FROM events WHERE event_id % 4 = 0)
    SELECT event_id,
           value AS value_v1,
           CASE WHEN event_id % 12 = 0 THEN NULL
                WHEN event_id % 8 = 0 THEN value + 100
                ELSE value END AS value_v2
    FROM seeded ORDER BY event_id
    """,
    tags=("mvcc", "time-travel", "sql", "snapshot"),
)
def mvcc_time_travel_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-TRAVEL SQL end-to-end: seed an MVCC table (v1), then UPDATE
    the %8 keys (+100) and DELETE the %12 keys — and ask ONE SQL text to
    join the historical snapshot to the current one:

        SELECT a.event_id, a.value AS value_v1, b.value AS value_v2
        FROM t FOR TIMESTAMP AS OF <ts1> AS a
        LEFT JOIN t AS b ON a.event_id = b.event_id

    (``sql.query_at`` — the reference's per-scan transTs option as SQL;
    the AS-OF side must show pre-update values for every seeded key, the
    current side the update and the delete's NULLs). The oracle restates
    the expected v1/v2 pairing from the seed relation alone."""
    from ..mvcc.table import MvccTable
    from ..sql import query_at

    work = tempfile.mkdtemp(prefix="pxs_tt_")
    e = load_table(spark, sf_dir, "events").select("event_id", "value")
    t = MvccTable(spark, os.path.join(work, "t"), key_col="event_id")
    ts1 = t.insert(e.filter(F.col("event_id") % 4 == 0))
    t.update(
        t.read_latest_version()
        .filter(F.col("event_id") % 8 == 0)
        .drop("_commit_ts")
        .withColumn("value", F.col("value") + 100)
    )
    t.delete(e.filter(F.col("event_id") % 12 == 0).select("event_id"))
    out = query_at(
        spark,
        sf_dir,
        {"t": t},
        f"""SELECT a.event_id, a.value AS value_v1, b.value AS value_v2
            FROM t FOR TIMESTAMP AS OF {ts1} AS a
            LEFT JOIN t AS b ON a.event_id = b.event_id
            ORDER BY a.event_id""",
    )
    return _finalize(out, work)


@declare(
    "mvcc_clone",
    sql="""
    WITH src AS (
      SELECT event_id, value FROM events WHERE event_id % 3 = 0)
    SELECT event_id,
           CASE WHEN event_id % 6 = 0 THEN value * 10 ELSE value END AS value
    FROM src ORDER BY event_id
    """,
    tags=("mvcc", "clone", "zero-copy", "lakehouse"),
)
def mvcc_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHALLOW CLONE end-to-end: seed a table, zero-copy fork it
    (symlinked commit dirs — O(commits) creation, Delta SHALLOW CLONE
    semantics), then DIVERGE both sides — the clone ×10s the %6 values,
    the SOURCE deletes the %9==6 keys. The clone's final snapshot must
    show its own update and NONE of the source's post-clone delete; the
    oracle restates exactly that. Independence + zero-copy + index
    carryover are pinned in tests/test_mvcc.py."""
    from ..mvcc.table import MvccTable

    work = tempfile.mkdtemp(prefix="pxs_clone_")
    e = load_table(spark, sf_dir, "events").select("event_id", "value")
    src = MvccTable(spark, os.path.join(work, "src"), key_col="event_id")
    src.insert(e.filter(F.col("event_id") % 3 == 0))
    fork = src.clone(os.path.join(work, "fork"))
    fork.update(
        fork.read_latest_version()
        .filter(F.col("event_id") % 6 == 0)
        .drop("_commit_ts")
        .withColumn("value", F.col("value") * 10)
    )
    src.delete(
        e.filter(F.col("event_id") % 9 == 6).select("event_id")
    )
    return _finalize(
        fork.read_latest_version().drop("_commit_ts").orderBy("event_id"),
        work,
    )


def _stream_psi_oracle() -> str:
    from .evalq import _PSI_SQL

    return _PSI_SQL


@declare(
    "stream_psi",
    sql=_stream_psi_oracle(),
    tags=("streaming", "eval", "drift", "psi", "linear-state",
          "beyond-parity"),
)
def stream_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming drift monitoring: the population stability index
    maintained over an unbounded scored stream. Per micro-batch the
    (segment, bin, count) table folds by SUM — fixed-bin counters are
    LINEAR, so the maintained table equals the one-shot batch build
    exactly and the identical scoring stage (``evalq.psi_scan``: 10-bin
    grid restore → smoothed masses → quantized terms) must hash-match
    ``eval_psi``'s oracle bit-for-bit. State is ≤20 rows (2 segments ×
    10 bins) regardless of stream volume — continuous 'did the score
    distribution move?' without re-scanning history. Replay-idempotent
    via the last_bid guard."""
    import json
    import shutil

    work = tempfile.mkdtemp(prefix="pxs_stream_psi_")
    src = os.path.join(work, "src")
    state_root = os.path.join(work, "state")
    os.makedirs(state_root, exist_ok=True)
    state_json = os.path.join(state_root, "STATE.json")
    e = load_table(spark, sf_dir, "events")
    half = e.agg(
        ((F.min("event_id") + F.max("event_id")) / 2).alias("m")
    ).first()["m"]
    _write_slices(
        [e.filter(F.col("event_id") <= half), e.filter(F.col("event_id") > half)],
        src,
    )

    def fold(batch_df: DataFrame, _bid: int) -> None:
        if os.path.exists(state_json):
            with open(state_json) as _f:
                if json.load(_f).get("last_bid") == _bid:
                    return  # at-least-once replay: already folded
        g = (
            batch_df.filter(F.col("event_type").isin("purchase", "view"))
            .groupBy(
                (F.col("user_id") % 2).alias("seg"),
                F.least(F.floor(F.col("value") / F.lit(50.0)), F.lit(9))
                .cast("bigint")
                .alias("bin"),
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
        if os.path.exists(state_json):
            with open(state_json) as f:
                st = json.load(f)
            g = (
                g.unionByName(spark.read.parquet(st["data"]))
                .groupBy("seg", "bin")
                .agg(F.sum("c").cast("bigint").alias("c"))
            )
            nb = st["n"] + 1
        else:
            st, nb = None, 1
        dest = os.path.join(state_root, f"counts_v={nb}")
        g.write.mode("overwrite").parquet(dest)
        tmp = state_json + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"n": nb, "data": dest, "last_bid": _bid}, f)
        os.replace(tmp, state_json)
        if st and st["data"] != dest and os.path.isdir(st["data"]):
            shutil.rmtree(st["data"], ignore_errors=True)

    stream = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("stream_psi did not finish in 600s")
    with open(state_json) as f:
        st = json.load(f)
    assert st["n"] >= 2, "expected >= 2 micro-batches"
    from .evalq import psi_scan

    counters = spark.read.parquet(st["data"])
    return _finalize(psi_scan(spark, counters), work)


def _stream_ece_oracle() -> str:
    from .evalq import eval_ece as _ee  # noqa: F401  (registry holds the sql)
    from .registry import REGISTRY

    return REGISTRY["eval_ece"].sql


@declare(
    "stream_eval_ece",
    sql=_stream_ece_oracle(),
    tags=("streaming", "eval", "calibration", "ece", "linear-state",
          "beyond-parity"),
)
def stream_eval_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming calibration monitoring: Expected Calibration Error
    maintained over an unbounded scored stream. Per micro-batch the
    (bin, n, n_pos, score-sum) table folds by SUM — fixed-bin counters
    and DECIMAL score sums are LINEAR, so the maintained table equals
    the one-shot batch build exactly and the identical scoring stage
    (``evalq.ece_scan``) must hash-match ``eval_ece``'s oracle
    bit-for-bit. State is ≤10 rows regardless of stream volume —
    continuous 'is the model still calibrated?' without re-scanning
    history. Replay-idempotent via the last_bid guard."""
    import json
    import shutil

    work = tempfile.mkdtemp(prefix="pxs_stream_ece_")
    src = os.path.join(work, "src")
    state_root = os.path.join(work, "state")
    os.makedirs(state_root, exist_ok=True)
    state_json = os.path.join(state_root, "STATE.json")
    e = load_table(spark, sf_dir, "events")
    half = e.agg(
        ((F.min("event_id") + F.max("event_id")) / 2).alias("m")
    ).first()["m"]
    _write_slices(
        [e.filter(F.col("event_id") <= half), e.filter(F.col("event_id") > half)],
        src,
    )

    def fold(batch_df: DataFrame, _bid: int) -> None:
        if os.path.exists(state_json):
            with open(state_json) as _f:
                if json.load(_f).get("last_bid") == _bid:
                    return  # at-least-once replay: already folded
        g = (
            batch_df.filter(F.col("event_type").isin("purchase", "view"))
            .groupBy(
                F.least(F.floor(F.col("value") / F.lit(50.0)), F.lit(9))
                .cast("bigint")
                .alias("bin")
            )
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                )
                .cast("bigint")
                .alias("n_pos"),
                F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("decimal(38,6)")
                .alias("sv"),
            )
        )
        if os.path.exists(state_json):
            with open(state_json) as f:
                st = json.load(f)
            g = (
                g.unionByName(spark.read.parquet(st["data"]))
                .groupBy("bin")
                .agg(
                    F.sum("n").cast("bigint").alias("n"),
                    F.sum("n_pos").cast("bigint").alias("n_pos"),
                    F.sum("sv").cast("decimal(38,6)").alias("sv"),
                )
            )
            nb = st["n"] + 1
        else:
            st, nb = None, 1
        dest = os.path.join(state_root, f"counts_v={nb}")
        g.write.mode("overwrite").parquet(dest)
        tmp = state_json + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"n": nb, "data": dest, "last_bid": _bid}, f)
        os.replace(tmp, state_json)
        if st and st["data"] != dest and os.path.isdir(st["data"]):
            shutil.rmtree(st["data"], ignore_errors=True)

    stream = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("stream_eval_ece did not finish in 600s")
    with open(state_json) as f:
        st = json.load(f)
    assert st["n"] >= 2, "expected >= 2 micro-batches"
    from .evalq import ece_scan

    counters = spark.read.parquet(st["data"])
    return _finalize(ece_scan(counters), work)


def _stream_log_loss_oracle() -> str:
    from .evalq import eval_log_loss as _ell  # noqa: F401 (registry holds sql)
    from .registry import REGISTRY

    return REGISTRY["eval_log_loss"].sql


@declare(
    "stream_eval_log_loss",
    sql=_stream_log_loss_oracle(),
    tags=("streaming", "eval", "log-loss", "linear-state", "beyond-parity"),
)
def stream_eval_log_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming cross-entropy monitoring: log loss maintained over an
    unbounded scored stream. Per micro-batch the (p, pos, neg)
    score-grain counter table folds by SUM (the stream_ks_drift
    value-grain-counter convention — counts are LINEAR), and the ln
    terms are computed from the folded counters at scoring time by the
    identical factored stage (``evalq.log_loss_scan``), so the result
    hash-matches ``eval_log_loss``'s oracle bit-for-bit. State is
    O(#distinct clipped scores) — the score GRAIN, not the row count
    (and naturally bounded for any quantized/bucketed model output);
    continuous 'is the model drifting confidently wrong?' without
    re-scanning history. Replay-idempotent via the last_bid guard."""
    import json
    import shutil

    work = tempfile.mkdtemp(prefix="pxs_stream_logloss_")
    src = os.path.join(work, "src")
    state_root = os.path.join(work, "state")
    os.makedirs(state_root, exist_ok=True)
    state_json = os.path.join(state_root, "STATE.json")
    e = load_table(spark, sf_dir, "events")
    half = e.agg(
        ((F.min("event_id") + F.max("event_id")) / 2).alias("m")
    ).first()["m"]
    _write_slices(
        [e.filter(F.col("event_id") <= half), e.filter(F.col("event_id") > half)],
        src,
    )

    def fold(batch_df: DataFrame, _bid: int) -> None:
        if os.path.exists(state_json):
            with open(state_json) as _f:
                if json.load(_f).get("last_bid") == _bid:
                    return  # at-least-once replay: already folded
        g = (
            batch_df.filter(F.col("event_type").isin("purchase", "view"))
            .select(
                F.least(
                    F.greatest(F.col("value") / 500.0, F.lit(0.000001)),
                    F.lit(0.999999),
                ).alias("p"),
                F.when(F.col("event_type") == "purchase", 1)
                .otherwise(0)
                .alias("y"),
            )
            .groupBy("p")
            .agg(
                F.sum("y").cast("bigint").alias("pos"),
                F.sum(1 - F.col("y")).cast("bigint").alias("neg"),
            )
        )
        if os.path.exists(state_json):
            with open(state_json) as f:
                st = json.load(f)
            g = (
                g.unionByName(spark.read.parquet(st["data"]))
                .groupBy("p")
                .agg(
                    F.sum("pos").cast("bigint").alias("pos"),
                    F.sum("neg").cast("bigint").alias("neg"),
                )
            )
            nb = st["n"] + 1
        else:
            st, nb = None, 1
        dest = os.path.join(state_root, f"counts_v={nb}")
        g.write.mode("overwrite").parquet(dest)
        tmp = state_json + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"n": nb, "data": dest, "last_bid": _bid}, f)
        os.replace(tmp, state_json)
        if st and st["data"] != dest and os.path.isdir(st["data"]):
            shutil.rmtree(st["data"], ignore_errors=True)

    stream = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("stream_eval_log_loss did not finish in 600s")
    with open(state_json) as f:
        st = json.load(f)
    assert st["n"] >= 2, "expected >= 2 micro-batches"
    from .evalq import log_loss_scan

    counters = spark.read.parquet(st["data"])
    return _finalize(log_loss_scan(counters), work)

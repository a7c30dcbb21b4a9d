"""SparkSession builder tuned for the engine.

Every capability the reference implements by hand in its executor/planner —
vectorized scans, min/max skipping, two-phase aggregation, broadcast-vs-
partitioned join choice, shuffle partition sizing — is delegated to Spark
(Tungsten, Parquet pushdown, Catalyst, AQE). This module pins the configs that
make that delegation actually happen; see SURVEY.md §4.

Scale notes (100 TB / 1000 executors):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  broadcast demotion replace the reference's static PlanOptimizer thresholds.
- Parquet filter pushdown + page-level stats replace Pixels' row-group/pixel
  (10k-row stride) min/max skipping.
- zstd parquet ≈ the reference's per-chunk ZSTD compression.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import config


def build_session(
    app_name: str = "pixels_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) the tuned SparkSession.

    ``master=None`` keeps whatever the environment provides (cluster deploy);
    tests/bench pass ``local[N]``.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)

    conf = {
        # --- adaptive execution (≈ PlanOptimizer.java:94-215 made dynamic) ---
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # --- join planning (≈ join.broadcast.threshold, pixels.properties:187) ---
        "spark.sql.autoBroadcastJoinThreshold": config.AUTO_BROADCAST_JOIN_THRESHOLD,
        # --- scan pushdown (≈ PixelsRecordReaderImpl.java:345-451 skipping) ---
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.parquet.aggregatePushdown": "true",
        "spark.sql.files.maxPartitionBytes": config.MAX_PARTITION_BYTES,
        # --- shuffle sizing for local[32]; AQE re-sizes at runtime ---
        "spark.sql.shuffle.partitions": config.SHUFFLE_PARTITIONS,
        # --- storage format (≈ pixels zstd chunk compression) ---
        "spark.sql.parquet.compression.codec": config.PARQUET_COMPRESSION,
        # --- Arrow for the (rare) pandas-UDF paths; batch size bounds memory ---
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        # UTC-pinned sessions make the catalog's NTZ→TIMESTAMP normalization
        # value-preserving and keep date_trunc/window boundaries aligned
        # with the DuckDB oracle's naive-µs semantics (catalog.load_table)
        "spark.sql.session.timeZone": "UTC",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def local_session(cpus: str | int | None = None) -> SparkSession:
    """Session for local testing/bench: ``local[$SPARK_GRAFT_CPUS]``.

    Sets ``spark.driver.memory`` (config.LOCAL_DRIVER_MEMORY, env-
    overridable) because in local mode the driver JVM IS the executor:
    all N task slots share its heap, and the 1g Spark default starves
    execution memory at N=32. Only effective when this call launches the
    JVM (the first session of the process — true for bench.py/tools); a
    pre-existing JVM keeps its heap, which Spark ignores harmlessly.
    """
    n = str(cpus or config.CPUS)
    return build_session(
        master=f"local[{n}]",
        extra_conf={"spark.driver.memory": config.LOCAL_DRIVER_MEMORY},
    )

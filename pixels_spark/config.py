"""Engine configuration defaults.

Mirrors the perf-relevant defaults of the reference's
``pixels-common/src/main/resources/pixels.properties`` (lines 82-195) and
``pixels-planner/.../PlanOptimizer.java:94-202``, re-expressed as Spark
settings. The reference hand-implements these cost decisions; Spark's
AQE + CBO make most of them automatic — we only pin the knobs.
"""

from __future__ import annotations

import os

# ≈ join.broadcast.threshold.mb=256 (pixels.properties:187). Spark's default is
# 10MB; the reference broadcasts up to 256MB. We use 64MB: dims in a TPC-H-style
# star schema (region/nation/customer/supplier/part) comfortably fit, while
# leaving executor headroom on a 1000-node cluster.
AUTO_BROADCAST_JOIN_THRESHOLD = str(64 * 1024 * 1024)

# ≈ row.group.size=256MB (pixels.properties:84) — scan split sizing. Spark maps
# one input partition per ~maxPartitionBytes of parquet.
MAX_PARTITION_BYTES = str(256 * 1024 * 1024)

# Shuffle parallelism for local[32] testing. At cluster scale this is
# overridden; AQE coalesces small post-shuffle partitions either way
# (≈ PlanOptimizer.getJoinNumPartition's ceil(totalSize/512MB) heuristic).
SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")

# ≈ compact.factor=32 (pixels.properties:104): row groups merged per compacted
# file by the COMPACT job.
COMPACT_FACTOR = 32

# ≈ pixel.stride / parquet page granularity — left to parquet defaults.
PARQUET_COMPRESSION = "zstd"  # ≈ proto/pixels.proto:73-80 compression kinds

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Heap for LOCAL-mode sessions only (local_session): in local[N] the driver
# JVM hosts every task slot, so Spark's 1g default leaves ~1024*0.6/32 ≈
# 19 MB of execution memory per task at N=32 — GC pressure and storage-
# block eviction churn across the suite. Measured A/B (OPTIMIZATION_r12.md
# tranche 5): standalone best-of-3 at 1g vs 8g puts the dedup/vector/graph
# heavies at 0.83-0.89× with 8g (minhash_lsh 3.31→2.79 s, modularity
# 2.85→2.38 s, pca_scores 2.44→2.03 s) and is neutral on scan-bound
# queries (tpch_q6 anchor equal); the full suite read 0.95× total
# (BENCHLOG_r12 151.86→144.83 s, heap + one query change). Cluster
# deployments are untouched: build_session(master=None) does not set it,
# and spark.executor.memory stays a deploy-time concern. Env-overridable
# for the driver's lower-core bench runs (at fewer task slots the 1g
# default starves less, but 8g stays safe in the 128 GiB sandbox).
LOCAL_DRIVER_MEMORY = os.environ.get("SPARK_GRAFT_DRIVER_MEMORY", "8g")

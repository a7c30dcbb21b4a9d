"""Mergeable frequency sketches (Count-Min) over DataFrames.

The reference's approximate surface is cardinality-shaped (HLL via
``approx_count_distinct``, sampled stats in pixels-core's stats collector);
a 100 TB ingest pipeline also wants *frequency* estimates — per-key counts
good enough for heavy-hitter triage without a full groupBy over an
unbounded key domain. Count-Min (Cormode & Muthukrishnan 2005) is the
standard answer: a depth×width grid of counters, each row r counting
``hash_r(key) % width``; the estimate is the min over rows, always an
OVERestimate, within ``e/width · N`` of truth with probability
``1 - e^-depth``.

Spark-first shape — the sketch IS a tiny DataFrame:

- build: one narrow pass (explode each row into ``depth`` (r, bucket)
  cells) followed by ONE hash aggregation. Map-side partial aggregation
  collapses every partition to ≤ depth×width rows before the exchange, so
  the shuffle volume is O(partitions × depth × width) regardless of input
  size — the classic "per-partition sketch, merge by cell-sum" plan,
  expressed declaratively instead of with mapPartitions.
- merge: union + the same cell-sum groupBy (sketches are counters — the
  linearity is what makes them mergeable across days/sources/streams).
- estimate: broadcast the ≤ depth×width-row sketch to the probe side; no
  second scan of the data.

The hash family is the repo's md5 family (first 8 hex chars of
``md5('r|' || key)`` as a bigint — ``functions/dedup.minhash_md5_bands``),
so every cell and every estimate is bit-identically computable in ANSI SQL
and the driver oracle can replay the whole sketch exactly
(``sketch_count_min``). Reference stats surface for contrast:
pixels-core/src/main/java/io/pixelsdb/pixels/core/stats (exact per-column
min/max/sum collectors).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(key: Column, row: int, width: int) -> Column:
    """Bucket of ``key`` in sketch row ``row``: md5-family hash mod width.

    First 8 md5 hex chars < 2^32 fit a bigint exactly and are non-negative,
    so ``%`` agrees across engines (DuckDB restatement:
    ``CAST(concat('0x', substr(md5('r|' || key), 1, 8)) AS BIGINT) % w``).
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{row}|"), key.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return (h % F.lit(width)).alias(f"b{row}")


def count_min_build(
    df: DataFrame, col: str, depth: int = 3, width: int = 64
) -> DataFrame:
    """Build a Count-Min sketch of ``df[col]`` as a (r, bucket, cnt) frame.

    NULL keys are skipped (SQL aggregate convention). Cells never touched
    stay absent (sparse); readers must treat absent as 0 — ``count_min_estimate``
    does via its left join + coalesce.
    """
    key = F.col(col)
    cells = df.filter(key.isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        cms_bucket(key, r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell")
    )
    return cells.groupBy(
        F.col("cell.r").alias("r"), F.col("cell.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def count_min_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width, hash family):
    cell-wise counter sum. union + one groupBy — linear, associative,
    order-free, which is why one sketch per day/source/stream composes."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("r", "bucket").agg(F.sum("cnt").alias("cnt"))


def count_min_estimate(
    keys: DataFrame, sketch: DataFrame, col: str, depth: int = 3, width: int = 64
) -> DataFrame:
    """Point-query estimates for every row of ``keys[col]``: min over the
    depth rows of the key's cell counters (absent cell = 0). The sketch is
    ≤ depth×width rows — broadcast it; the keys side never shuffles."""
    key = F.col(col)
    probes = keys.select(
        col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        cms_bucket(key, r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(col, F.col("cell.r").alias("r"), F.col("cell.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["r", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — Bar-Yossef et al. 2002.
#
# Keep the k smallest 60-bit md5 hash values of a key set; the k-th
# smallest order statistic of k uniform draws estimates the density, so
# DV ≈ (k-1) · 2^60 / h_(k). Unlike HLL, a KMV synopsis supports SET
# OPERATIONS: the k smallest of S_A ∪ S_B is computable from the two
# sketches alone (⊕ = union + re-truncate), and the fraction of the union
# synopsis present in BOTH input sketches estimates the Jaccard
# similarity, giving |A ∩ B| ≈ ρ · DV(A ∪ B) without ever rescanning —
# the estimator behind Theta-sketch set algebra (Apache DataSketches).
# The md5 family makes every hash, every synopsis row, and every estimate
# bit-identically replayable in ANSI SQL (driver query ``sketch_kmv``).
# ---------------------------------------------------------------------------


KMV_DOMAIN = float(1 << 60)  # hash domain size; exact as a double


def kmv_hash(key: Column) -> Column:
    """60-bit md5-family hash: first 15 hex chars of ``md5(key)`` as a
    bigint (< 2^60, non-negative — DuckDB restatement:
    ``CAST(concat('0x', substr(md5(key), 1, 15)) AS BIGINT)``)."""
    return F.conv(
        F.substring(F.md5(key.cast("string")), 1, 15), 16, 10
    ).cast("bigint")


def kmv_build(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """KMV synopsis of ``df[col]``: the ``k`` smallest distinct hash
    values, as a ≤k-row ``(hv)`` frame. NULL keys are skipped.

    Scale shape: one shuffle for the hash-distinct, then a global top-k
    (Spark plans ``orderBy().limit(k)`` as TakeOrderedAndProject —
    per-partition heaps, only k rows per partition reach the driver-side
    merge). The synopsis is bounded at k rows no matter the input size."""
    return (
        df.filter(F.col(col).isNotNull())
        .select(kmv_hash(F.col(col)).alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k)
    )


def kmv_merge(*sketches: DataFrame, k: int = 256) -> DataFrame:
    """⊕ for KMV: union the synopses, drop duplicate hashes, keep the k
    smallest. Associative/commutative with the empty sketch as identity;
    ``kmv_build(A) ⊕ kmv_build(B) ≡ kmv_build(A ∪ B)`` EXACTLY (the k
    smallest of the union are always within the k smallest of each side)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct().orderBy("hv").limit(k)


def kmv_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """Distinct-count estimate from a synopsis, as a 1-row ``(est_dv)``
    frame. A synopsis holding fewer than k hashes saw the whole key set —
    the estimate degrades to the EXACT distinct count; otherwise
    (k-1)·2^60/h_(k). Both branches are deterministic doubles computed
    from exact integers, so the oracle replays them bit-identically."""
    return sketch.agg(
        F.when(
            F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
        )
        .otherwise(F.lit(float(k - 1)) * F.lit(KMV_DOMAIN) / F.max("hv").cast("double"))
        .alias("est_dv")
    )


# ---------------------------------------------------------------------------
# THE MERGEABLE-SKETCH CONTRACT (the one place it is written down)
#
# The engine maintains five sketch families; all obey the same algebra so
# batch jobs, backfills, and streaming foreachBatch loops compose freely:
#
#   build(rows)  -> sketch      one narrow pass + one bounded aggregate
#   merge(a, b)  -> sketch      associative + commutative ("⊕"); identity
#                               is the empty sketch, so
#                               build(A) ⊕ build(B) ≡ build(A ∪ B) exactly
#   query(sketch, key) -> est   one-sided error, never touches the rows
#
# - Count-Min (this module): ⊕ = cell-wise counter SUM; estimate is an
#   OVERestimate. md5 hash family → bit-identically SQL-replayable;
#   persisted/streamed via CountMinRegistry below.
# - Bloom (functions/bloom.py): ⊕ = bitset OR; membership has false
#   positives, never false negatives. Same md5 position family; persisted
#   / streamed via BloomRegistry (constant-memory dedup history).
# - HLL (Spark's approx_count_distinct, queries/clickbench.py): ⊕ = Spark's
#   internal register-max merge (map-side partials ARE sketch merges);
#   cardinality within ±rsd. Not bit-replayable — the driver oracle checks
#   an exact-count tolerance band instead.
# - Histogram (this module, below): ⊕ = bin-wise counter SUM (same law as
#   Count-Min); quantile estimates within one bin width over a fixed
#   range. Deterministic binning → bit-replayable (``sketch_histogram``);
#   persisted/streamed via HistogramRegistry.
# - KMV (this module, above): ⊕ = union + re-truncate to the k smallest;
#   distinct counts AND set-operation estimates (∪ from the merged
#   synopsis, ∩ via the Jaccard fraction). md5 family → bit-replayable
#   (``sketch_kmv``). The ~1/√k relative error is two-sided.
#
# Linearity is the 100 TB property: one sketch per partition/day/source,
# merged in any order, equals the sketch of everything — no re-scan, no
# giant groupBy over an unbounded key domain.


class CountMinRegistry:
    """Persisted, incrementally-maintained Count-Min sketch — the
    streaming/warehouse-maintenance shape of ``count_min_*`` (the CMS
    sibling of ``BloomRegistry``): each ``merge_batch`` folds ONE batch's
    sketch into the stored one by cell-wise sum, so after any sequence of
    batches the stored sketch is bit-identical to a one-shot build over
    their union (the ⊕ law above; proven e2e by the oracled
    ``stream_sketch_count_min`` driver query and fuzzed over random batch
    splits in tests/test_sketches.py).

    State is a ≤ depth×width-row parquet dir behind an atomic JSON
    pointer (write-new → ``os.replace`` → drop-old, the repo's
    MaterializedRollup discipline), so readers always see a complete
    sketch. Single-writer assumption, same as BloomRegistry: the
    streaming foreachBatch loop is single-threaded per query."""

    def __init__(self, spark, path: str, depth: int = 3, width: int = 64):
        import os

        self.spark, self.path = spark, path
        self.depth, self.width = depth, width
        self.state_path = os.path.join(path, "_state.json")
        os.makedirs(path, exist_ok=True)

    def _state(self) -> dict | None:
        import json
        import os

        if not os.path.exists(self.state_path):
            return None
        with open(self.state_path) as f:
            return json.load(f)

    def read(self) -> DataFrame:
        """The current sketch (empty frame before the first batch)."""
        state = self._state()
        if state is None:
            return self.spark.createDataFrame(
                [], "r int, bucket bigint, cnt bigint"
            )
        return self.spark.read.parquet(state["data"])

    def merge_batch(
        self, df: DataFrame, col: str, batch_id: int | None = None
    ) -> None:
        """Fold one micro-batch into the stored sketch. Pass the
        foreachBatch ``batch_id`` to make the fold idempotent under
        Structured Streaming's at-least-once replay: a crash between the
        sink commit and the checkpoint commit re-delivers the SAME batch
        id, and without the guard the counters would be double-summed,
        breaking the bit-identical-to-one-shot-build contract. The
        last-applied id is persisted in the atomic state JSON, so the
        guard survives process restarts."""
        import json
        import os
        import shutil

        state = self._state()
        if (
            batch_id is not None
            and state is not None
            and state.get("last_bid") == batch_id
        ):
            return  # replayed micro-batch: already folded
        batch = count_min_build(df, col, self.depth, self.width)
        if state is None:
            merged, n = batch, 1
        else:
            merged = count_min_merge(self.read(), batch)
            n = state["n"] + 1
        dest = os.path.join(self.path, f"sketch_v={n}")
        merged.select(
            F.col("r").cast("int"),
            F.col("bucket").cast("bigint"),
            F.col("cnt").cast("bigint"),
        ).write.mode("overwrite").parquet(dest)
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"n": n, "data": dest, "last_bid": batch_id}, f)
        os.replace(tmp, self.state_path)
        if state and state["data"] != dest and os.path.isdir(state["data"]):
            shutil.rmtree(state["data"], ignore_errors=True)

    def estimate(self, keys: DataFrame, col: str) -> DataFrame:
        return count_min_estimate(
            keys, self.read(), col, self.depth, self.width
        )


class KmvRegistry:
    """Persisted, incrementally-maintained KMV distinct synopsis — the
    streaming/warehouse shape of ``kmv_*`` (the KMV sibling of
    CountMinRegistry / BloomRegistry): each ``merge_batch`` ⊕-folds one
    batch's synopsis into the stored one (union + re-truncate to the k
    smallest), so after any batch sequence the stored synopsis is
    bit-identical to a one-shot build over their union — giving running
    distinct-count (and set-operation) estimates over an unbounded
    stream in O(k) state, no growing distinct table.

    State is a ≤k-row parquet dir behind an atomic JSON pointer
    (write-new → ``os.replace`` → drop-old). Single-writer assumption,
    same as the sibling registries."""

    def __init__(self, spark, path: str, k: int = 256):
        import os

        self.spark, self.path, self.k = spark, path, k
        os.makedirs(path, exist_ok=True)
        self.state_path = os.path.join(path, "STATE.json")

    def _state(self):
        import json
        import os

        if not os.path.exists(self.state_path):
            return None
        with open(self.state_path) as f:
            return json.load(f)

    def read(self) -> DataFrame:
        state = self._state()
        if state is None:
            return self.spark.createDataFrame([], "hv bigint")
        return self.spark.read.parquet(state["data"])

    def merge_batch(
        self, df: DataFrame, col: str, batch_id: int | None = None
    ) -> None:
        """Fold one micro-batch. ``batch_id`` makes the fold idempotent
        under at-least-once replay (same contract as
        ``CountMinRegistry.merge_batch``); KMV's ⊕ (union + re-truncate)
        is actually idempotent by construction, but the guard still skips
        the wasted rewrite on a replayed batch."""
        import json
        import os
        import shutil

        state = self._state()
        if (
            batch_id is not None
            and state is not None
            and state.get("last_bid") == batch_id
        ):
            return  # replayed micro-batch: already folded
        batch = kmv_build(df, col, self.k)
        if state is None:
            merged, n = batch, 1
        else:
            merged = kmv_merge(self.read(), batch, k=self.k)
            n = state["n"] + 1
        dest = os.path.join(self.path, f"sketch_v={n}")
        merged.select(F.col("hv").cast("bigint")).write.mode(
            "overwrite"
        ).parquet(dest)
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"n": n, "data": dest, "last_bid": batch_id}, f)
        os.replace(tmp, self.state_path)
        if state and state["data"] != dest and os.path.isdir(state["data"]):
            shutil.rmtree(state["data"], ignore_errors=True)

    def estimate(self) -> DataFrame:
        return kmv_estimate(self.read(), self.k)


def hist_bin(value: Column, lo: float, hi: float, bins: int) -> Column:
    """Equi-width bin of ``value`` over ``[lo, hi)``: out-of-range values
    clamp into the edge bins (bin 0 / bin ``bins-1``), so the sketch is
    total over any input. Pure double floor-divide — identical IEEE result
    in ANSI SQL (``least(bins-1, greatest(0, floor((x - lo) / w)))``)."""
    w = (hi - lo) / bins
    raw = F.floor((value.cast("double") - F.lit(lo)) / F.lit(w)).cast("bigint")
    return F.least(
        F.lit(bins - 1).cast("bigint"), F.greatest(F.lit(0).cast("bigint"), raw)
    )


def hist_build(
    df: DataFrame, col: str, lo: float, hi: float, bins: int = 64
) -> DataFrame:
    """Equi-width histogram sketch of ``df[col]``: ≤``bins`` rows of
    ``(bin, cnt)``. NULLs are skipped. One narrow pass + ONE hash
    aggregate; map-side partials collapse every partition to ≤bins rows
    before the exchange, so shuffle volume is O(partitions × bins)
    regardless of input size — same plan shape as ``count_min_build``."""
    return (
        df.filter(F.col(col).isNotNull())
        .select(hist_bin(F.col(col), lo, hi, bins).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def hist_merge(*sketches: DataFrame) -> DataFrame:
    """⊕ for histograms: counters are linear, so merge = union + cell-sum
    (identical law to Count-Min). ``hist_build(A) ⊕ hist_build(B) ≡
    hist_build(A ∪ B)`` exactly, for the same (lo, hi, bins)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bin").agg(F.sum("cnt").cast("bigint").alias("cnt"))


def hist_quantiles(
    sketch: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    bins: int = 64,
) -> DataFrame:
    """Quantile estimates from a histogram sketch: for each ``q`` find the
    first bin whose cumulative count reaches ``q·N`` and interpolate
    linearly inside it — ``est = lo + w·(bin + (qN - cum_prev)/cnt)``.
    Error is bounded by one bin width (vs KLL/t-digest's rank error; the
    trade is fixed-range simplicity + EXACT SQL replayability, since every
    step is integer counts + one deterministic double expression).

    All computation runs on the ≤bins-row sketch: the cumulative window
    and the quantile probe never touch source rows. The probe is an
    exploded LITERAL array of the requested quantiles (qs is a Python
    constant, not data) filtered by the cum condition, and the hit row
    (first bin whose cum reaches q·N ≡ the min-bin survivor) is selected
    with one ``min_by`` aggregate — r13: this replaces a
    createDataFrame + broadcast nested-loop join + rank window, which
    cost 3 extra jobs (broadcast build re-ran the whole sketch subtree)
    per read at any scale. Returns ``(q, est)``, one row per requested
    quantile; every value is the same IEEE expression as before."""
    from pyspark.sql import Window

    w = (hi - lo) / bins
    c = sketch.select(
        "bin",
        "cnt",
        F.sum("cnt").over(Window.orderBy("bin")).alias("cum"),
        F.sum("cnt").over(
            Window.orderBy("bin").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    hit = (
        c.select(
            F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
            "bin",
            "cnt",
            "cum",
            "n",
        )
        .filter(
            F.col("cum").cast("double") >= F.col("q") * F.col("n").cast("double")
        )
        .groupBy("q")
        .agg(
            F.min_by(F.struct("bin", "cnt", "cum", "n"), F.col("bin")).alias(
                "_hit"
            )
        )
        .select("q", "_hit.bin", "_hit.cnt", "_hit.cum", "_hit.n")
    )
    return hit.select(
        "q",
        (
            F.lit(lo)
            + F.lit(w)
            * (
                F.col("bin").cast("double")
                + (
                    F.col("q") * F.col("n").cast("double")
                    - (F.col("cum") - F.col("cnt")).cast("double")
                )
                / F.col("cnt").cast("double")
            )
        ).alias("est"),
    )


class HistogramRegistry:
    """Persisted, incrementally-maintained histogram sketch — the
    streaming/warehouse shape of ``hist_*`` (fourth registry sibling):
    ``merge_batch`` cell-sums one batch's histogram into the stored one,
    so the stored sketch is bit-identical to a one-shot build over the
    union of all batches (counter linearity, proven e2e by the oracled
    ``stream_sketch_histogram`` driver query). Running quantile estimates
    over an unbounded stream in O(bins) state — no sorted data kept.

    Same atomic-pointer parquet state + single-writer contract as
    CountMinRegistry."""

    def __init__(self, spark, path: str, lo: float, hi: float, bins: int = 64):
        import os

        self.spark, self.path = spark, path
        self.lo, self.hi, self.bins = lo, hi, bins
        self.state_path = os.path.join(path, "_state.json")
        os.makedirs(path, exist_ok=True)

    def _state(self) -> dict | None:
        import json
        import os

        if not os.path.exists(self.state_path):
            return None
        with open(self.state_path) as f:
            return json.load(f)

    def read(self) -> DataFrame:
        state = self._state()
        if state is None:
            return self.spark.createDataFrame([], "bin bigint, cnt bigint")
        return self.spark.read.parquet(state["data"])

    def merge_batch(
        self, df: DataFrame, col: str, batch_id: int | None = None
    ) -> None:
        """Fold one micro-batch. ``batch_id`` makes the fold idempotent
        under at-least-once replay (same contract as
        ``CountMinRegistry.merge_batch``)."""
        import json
        import os
        import shutil

        state = self._state()
        if (
            batch_id is not None
            and state is not None
            and state.get("last_bid") == batch_id
        ):
            return  # replayed micro-batch: already folded
        batch = hist_build(df, col, self.lo, self.hi, self.bins)
        if state is None:
            merged, n = batch, 1
        else:
            merged = hist_merge(self.read(), batch)
            n = state["n"] + 1
        dest = os.path.join(self.path, f"sketch_v={n}")
        merged.select(
            F.col("bin").cast("bigint"), F.col("cnt").cast("bigint")
        ).write.mode("overwrite").parquet(dest)
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"n": n, "data": dest, "last_bid": batch_id}, f)
        os.replace(tmp, self.state_path)
        if state and state["data"] != dest and os.path.isdir(state["data"]):
            shutil.rmtree(state["data"], ignore_errors=True)

    def quantiles(self, qs: list[float]) -> DataFrame:
        return hist_quantiles(self.read(), qs, self.lo, self.hi, self.bins)

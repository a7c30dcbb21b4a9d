"""Broadcast Bloom-filter decontamination (beyond-parity).

``dedup.decontaminate`` is the exact path: explode both sides' shingles
and semi-join — one shuffle keyed on the shingle. At 100 TB the corpus
side of that shuffle dominates; the production alternative is a
**constant-size broadcast bitset**: build a Bloom filter over the (small)
benchmark's shingles once, broadcast the bits to every executor, and
check corpus shingles **map-side** — zero shuffle over the corpus, the
scan pipeline never exchanges. This module implements that path with the
repo's md5 hash family (``CAST(concat('0x', substr(md5('j|'||s),1,8)) AS
BIGINT)``), deliberately chosen because DuckDB computes it bit-identically
— so the oracle replays the *same* filter, false positives included, and
the driver's value-hash matches exactly.

False-positive accounting is part of the operator's contract (a Bloom
filter flags a superset): with m=2^20 bits, k=3 hashes and ~10^4 benchmark
shingles the per-shingle false-positive rate is ((k·B)/m)^k ≈ 3e-5 —
tested empirically in tests/test_bloom.py.

Driver boundary (documented, bounded): building the bitset collects the
benchmark's k·B distinct bit positions to the driver — O(benchmark), not
O(corpus), the same bound as broadcasting any dimension table. The corpus
side never leaves the executors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .dedup import spread, word_shingles

__all__ = [
    "BLOOM_M",
    "BLOOM_K",
    "BloomRegistry",
    "bloom_positions",
    "build_bloom_bitset",
    "build_key_bitset",
    "bloom_filter_keys",
    "bloom_decontaminate",
]

BLOOM_M = 1 << 20  # bits (128 KiB bitset)
BLOOM_K = 3  # hash functions


def bloom_positions(shingle: Column, k: int = BLOOM_K, m: int = BLOOM_M) -> Column:
    """The k Bloom bit positions of a shingle → array<bigint>, via the
    repo's DuckDB-replicable md5 family: position_j = (first 8 hex chars
    of md5('j|' || shingle) as int) % m."""
    return F.array(
        *[
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{j}|"), shingle)), 1, 8), 16, 10
            ).cast("bigint")
            % m
            for j in range(k)
        ]
    )


def build_bloom_bitset(
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 4,
    k: int = BLOOM_K,
    m: int = BLOOM_M,
) -> bytes:
    """Build the m-bit Bloom bitset over the benchmark's distinct word
    n-gram shingles. Collects k·|shingles| positions to the driver —
    bounded by the benchmark, which is broadcast-sized by definition."""
    pos = (
        benchmark.select(F.explode(word_shingles(F.col(text_col), n)).alias("_s"))
        .distinct()
        .select(F.explode(bloom_positions(F.col("_s"), k, m)).alias("p"))
        .distinct()
    )
    bits = np.zeros(m, dtype=bool)
    idx = [r["p"] for r in pos.collect()]
    if idx:
        bits[np.asarray(idx, dtype=np.int64)] = True
    return np.packbits(bits).tobytes()  # MSB-first within each byte


def bloom_decontaminate(
    train: DataFrame,
    bitset: bytes,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    k: int = BLOOM_K,
    m: int = BLOOM_M,
) -> DataFrame:
    """Flag training documents whose shingles hit the benchmark Bloom
    filter: per doc → (id, n_shingles, n_flagged, contaminated). Every
    train doc appears (n_flagged = 0 when clean).

    Plan shape: explode shingles (map-side), k md5s + the bitset probe in
    one Arrow-batched pandas UDF (vectorized bit math, no per-row Python),
    then a single groupBy(id) — the ONLY exchange in the query. The bitset
    rides a Spark broadcast to every executor once."""
    bc = train.sparkSession.sparkContext.broadcast(bitset)

    @pandas_udf("boolean")
    def _all_set(pos: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        a = np.stack(pos.to_numpy()).astype(np.int64)  # (batch, k)
        probed = bits[a >> 3] & (0x80 >> (a & 7)).astype(np.uint8)
        return pd.Series((probed != 0).all(axis=1))

    sh = spread(train.select(id_col, text_col), id_col).select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("_s")
    )
    return (
        sh.withColumn("_hit", _all_set(bloom_positions(F.col("_s"), k, m)))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.col("_hit").cast("bigint")).cast("bigint").alias("n_flagged"),
            F.max("_hit").alias("contaminated"),
        )
    )


def build_key_bitset(
    keys: DataFrame, key_col: str, k: int = BLOOM_K, m: int = BLOOM_M
) -> bytes:
    """Build the m-bit Bloom bitset over a JOIN-KEY column (the runtime-
    filter shape: the build side of a join, hashed once into a fixed-size
    bitset regardless of its row count). Keys are canonicalized through
    CAST(key AS STRING) so the probe side can hash any equal-valued key
    identically. Collects k·|distinct keys| positions to the driver —
    O(build side), the same bound as planning any broadcast."""
    pos = (
        keys.select(F.col(key_col).cast("string").alias("_s"))
        .where(F.col("_s").isNotNull())
        .distinct()
        .select(F.explode(bloom_positions(F.col("_s"), k, m)).alias("p"))
        .distinct()
    )
    bits = np.zeros(m, dtype=bool)
    idx = [r["p"] for r in pos.collect()]
    if idx:
        bits[np.asarray(idx, dtype=np.int64)] = True
    return np.packbits(bits).tobytes()


def bloom_filter_keys(
    df: DataFrame,
    key_col: str,
    bitset: bytes,
    k: int = BLOOM_K,
    m: int = BLOOM_M,
) -> DataFrame:
    """Map-side Bloom pre-filter of ``df`` on ``key_col`` membership: keeps
    every row whose key is in the set the bitset was built from, PLUS the
    bitset's false positives (a guaranteed superset — callers relying on
    exactness must follow with the real join, which removes the FPs).

    This is the explicit runtime-filter operator: at 100 TB the probe side
    of a shuffle join pays its exchange on every row, matching or not; a
    128 KiB broadcast bitset drops non-matching rows at the SCAN, before
    the shuffle, for any build side too large to broadcast-join outright
    (the bitset stays fixed-size where a broadcast hash table grows with
    the build side). Probe is one Arrow-batched pandas UDF (vectorized
    bit math) — no per-row Python."""
    bc = df.sparkSession.sparkContext.broadcast(bitset)

    @pandas_udf("boolean")
    def _member(pos: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        a = np.stack(pos.to_numpy()).astype(np.int64)  # (batch, k)
        probed = bits[a >> 3] & (0x80 >> (a & 7)).astype(np.uint8)
        return pd.Series((probed != 0).all(axis=1))

    # NULL keys never equi-join (the null-key convention every join here
    # pins), so they are dropped up front — also keeps the probe total:
    # a NULL key would otherwise surface as a NULL position array
    key_str = F.col(key_col).cast("string")
    return df.where(F.col(key_col).isNotNull()).where(
        _member(bloom_positions(key_str, k, m))
    )


class BloomRegistry:
    """CONSTANT-memory incremental dedup state: where ``DedupRegistry``
    grows its fingerprint store with the corpus (O(corpus) entries,
    ~1% of corpus bytes), the Bloom registry holds the entire dedup
    history in a fixed m-bit bitset — the tradeoff every
    dedupe-against-all-history pipeline eventually faces at 100 TB:

    - DedupRegistry: exact, no false suppression, store grows forever;
    - BloomRegistry: O(m) bytes forever, but a known false-positive rate
      wrongly suppresses some novel documents (~((k·B)/m)^k per doc —
      quantified and tested; size m to the corpus you expect).

    Within a batch, dedup is EXACT (first id per fingerprint wins — the
    same convention as DedupRegistry); the bloom bound applies only
    across batches. The bitset persists via write-tmp + atomic
    ``os.replace``; kept rows persist per batch and are returned re-read
    (later calls never invalidate earlier results via lazy re-lists).
    Driver boundary: one O(batch) position collect per batch — the same
    bound as the registry's entry append, NOT O(history).

    Single-writer assumption (same as DedupRegistry): batches register
    sequentially — the read-modify-write of the bitset is atomic against
    readers (os.replace) but not against a concurrent writer; a
    concurrent-ingest deployment serializes registration (e.g. the
    streaming foreachBatch loop, which is single-threaded per query).
    """

    def __init__(self, spark, path: str, m: int = BLOOM_M, k: int = BLOOM_K):
        import os

        self.spark, self.m, self.k = spark, m, k
        self.bits_path = os.path.join(path, "bloom.bits")
        self.kept_dir = os.path.join(path, "kept")
        os.makedirs(self.kept_dir, exist_ok=True)

    def _load(self) -> np.ndarray:
        import os

        if os.path.exists(self.bits_path):
            with open(self.bits_path, "rb") as f:
                return np.frombuffer(f.read(), dtype=np.uint8).copy()
        return np.zeros(self.m // 8, dtype=np.uint8)

    def register_batch(
        self, df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> DataFrame:
        import os

        from .text import fingerprint

        bits = self._load()
        bc = self.spark.sparkContext.broadcast(bits.tobytes())

        @pandas_udf("boolean")
        def _seen(pos: pd.Series) -> pd.Series:
            b = np.frombuffer(bc.value, dtype=np.uint8)
            if len(pos) == 0:
                return pd.Series([], dtype=bool)
            a = np.stack(pos.to_numpy()).astype(np.int64)
            probed = b[a >> 3] & (0x80 >> (a & 7)).astype(np.uint8)
            return pd.Series((probed != 0).all(axis=1))

        fps = spread(df.select(id_col, text_col), id_col).select(
            F.col(id_col), fingerprint(F.col(text_col)).alias("_fp")
        )
        first = fps.groupBy("_fp").agg(F.min(id_col).alias("_first"))
        batch_first = fps.join(first, "_fp").filter(
            F.col(id_col) == F.col("_first")
        )
        kept_ids = batch_first.withColumn(
            "_seen", _seen(bloom_positions(F.col("_fp"), self.k, self.m))
        ).filter(~F.col("_seen"))
        kept = df.join(kept_ids.select(id_col), id_col, "left_semi")

        # max(existing)+1, NOT count+1: if a middle batch dir was removed
        # (compaction, manual cleanup), count+1 would collide with — and
        # silently overwrite — the newest surviving batch.
        existing = [
            int(d.split("=", 1)[1])
            for d in os.listdir(self.kept_dir)
            if d.startswith("batch=") and d.split("=", 1)[1].isdigit()
        ]
        n = (max(existing) if existing else 0) + 1
        kept_path = os.path.join(self.kept_dir, f"batch={n}")
        kept.write.mode("overwrite").parquet(kept_path)

        new_pos = (
            kept_ids.select(
                F.explode(bloom_positions(F.col("_fp"), self.k, self.m)).alias("p")
            )
            .distinct()
            .collect()
        )
        if new_pos:
            idx = np.asarray([r["p"] for r in new_pos], dtype=np.int64)
            bits[idx >> 3] |= (0x80 >> (idx & 7)).astype(np.uint8)
        tmp = self.bits_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(bits.tobytes())
        os.replace(tmp, self.bits_path)
        return self.spark.read.parquet(kept_path)

"""Data-layout optimization: Z-order clustering for multi-column pruning.

Reference analog: the layout-optimization side of pixels-common — ordered
paths, splits patterns and projection patterns (``Layout.java:31-57``,
``SplitsIndex``/``ProjectionsIndex``) exist to make scans touch less data
for the observed workload. Parquet's equivalent lever is *row-group
clustering*: min/max pruning only helps if values are locally concentrated.
Sorting by one column clusters that column only; Z-ordering interleaves the
bits of several columns so row groups stay narrow on ALL of them — the
standard technique (Delta OPTIMIZE ZORDER BY) for multi-dimensional
point/range workloads.

Implementation: rank each column to a bounded integer (preserves order,
immune to value skew), interleave bits JVM-side with shift/mask expressions
(no UDF), range-partition + sort by the Z-value, write. At 100 TB this is
one extra shuffle at write time in exchange for file-level pruning on every
clustered column at read time.

Ranking is cut-point bucketing, not a window: cut points come from one
``df.stat.approxQuantile`` pass (Greenwald-Khanna sketch, fully distributed,
all columns in one job); each value maps to its bucket with a single fold
over the literal cut-point array. No global sort, no single-task stage —
the unpartitioned-``ntile`` version this replaces serialized the whole
table through one executor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 10  # per-column rank resolution (2 cols → 20-bit z-values)


def _interleave(cols: list[Column], bits: int = _BITS) -> Column:
    """Bit-interleave up to 4 rank columns into one long Z-value."""
    n = len(cols)
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for i, c in enumerate(cols):
            src_bit = F.shiftright(c, bit).bitwiseAND(F.lit(1)).cast("long")
            z = z + (src_bit * F.lit(1 << (bit * n + i)).cast("long"))
    return z


_NUMERIC = {"int", "bigint", "smallint", "tinyint", "double", "float"}


def _as_numeric(df: DataFrame, c: str) -> Column:
    """Order-preserving numeric view of a column for quantile bucketing."""
    dt = dict(df.dtypes)[c]
    if dt in _NUMERIC or dt.startswith("decimal"):
        return F.col(c).cast("double")
    if dt.startswith("timestamp"):
        return F.unix_timestamp(F.col(c)).cast("double")
    if dt == "date":
        return F.datediff(F.col(c), F.lit("1970-01-01")).cast("double")
    raise ValueError(
        f"zorder column {c!r} has unorderable-for-quantiles type {dt}; "
        "pre-encode it to a numeric surrogate first"
    )


def _bucket_by_cuts(value: Column, cuts: list[float], n_buckets: int) -> Column:
    """Rank = number of cut points < value, rescaled to [0, n_buckets):
    one fold over a single literal array (no per-cut expression nodes, no
    window, no shuffle). Rescaling keeps the rank spanning the full bit
    range even when the column has fewer distinct values than buckets —
    otherwise its high interleave bits would always be zero and the column
    would drop out of the file split."""
    cuts_lit = F.lit(cuts)  # one ArrayType literal node
    cnt = F.aggregate(
        cuts_lit,
        F.lit(0),
        lambda acc, cut: acc + F.when(value > cut, 1).otherwise(0),
    )
    scale = (n_buckets - 1) / max(1, len(cuts))
    return F.floor(cnt * F.lit(scale)).cast("int")


def zorder_values(df: DataFrame, cols: list[str], bits: int = _BITS) -> DataFrame:
    """Attach a ``_zvalue`` column: interleaved bucket ranks of ``cols``.

    Ranks come from approxQuantile cut points (2^bits buckets per column) —
    order-preserving and uniform under any value distribution (unlike
    raw-bit interleaving, which collapses when columns have different
    magnitudes). The quantile sketch is one distributed pass over all
    columns; per-row ranking is a map-side fold — this never global-sorts.
    """
    n_buckets = 1 << bits
    num_cols = {c: f"_num_{c}" for c in cols}
    sketch_df = df.select(
        *[_as_numeric(df, c).alias(a) for c, a in num_cols.items()]
    )
    probs = [i / n_buckets for i in range(1, n_buckets)]
    all_cuts = sketch_df.stat.approxQuantile(
        list(num_cols.values()), probs, 1.0 / (4 * n_buckets)
    )
    out = df
    rank_cols = []
    for (c, a), cuts in zip(num_cols.items(), all_cuts):
        rc = f"_rank_{c}"
        # dedupe (skewed data collapses quantiles) but keep order
        uniq = sorted(set(cuts))
        out = out.withColumn(rc, _bucket_by_cuts(_as_numeric(df, c), uniq, n_buckets))
        rank_cols.append(rc)
    out = out.withColumn("_zvalue", _interleave([F.col(r) for r in rank_cols], bits))
    return out.drop(*rank_cols)


def write_zordered(
    df: DataFrame,
    dest: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = _BITS,
) -> None:
    """Write ``df`` clustered by Z-order over ``cols``: rows with nearby
    values on every clustered column land in the same files, so min/max
    pruning works for filters on any of them.

    Cost at 100 TB: one approxQuantile sketch pass + one range shuffle —
    every stage fully parallel (no single-partition sort anywhere).
    """
    (
        zorder_values(df, cols, bits)
        .repartitionByRange(n_files, "_zvalue")
        .sortWithinPartitions("_zvalue")
        .drop("_zvalue")
        .write.mode("overwrite")
        .parquet(dest)
    )


def file_pruning_stats(path: str, column: str) -> list[tuple]:
    """Per-file (min, max) of ``column`` — measures clustering quality:
    tighter, less-overlapping ranges ⇒ more files skipped by a pushed
    filter (the same evidence the reference's stat-based skipping uses)."""
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, f))
        mn, mx = None, None
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            for j in range(rg.num_columns):
                c = rg.column(j)
                if c.path_in_schema == column and c.statistics is not None:
                    s = c.statistics
                    mn = s.min if mn is None else min(mn, s.min)
                    mx = s.max if mx is None else max(mx, s.max)
        out.append((mn, mx))
    return out

"""Deterministic corpus sampling / splitting for training-data pipelines.

Random-generator sampling (``df.sample``) is irreproducible across engines,
partitionings, and reruns; training pipelines instead want *hash* sampling —
membership decided by a content-derived bucket, so a document lands in the
same split on every engine, at every scale, under any partitioning. md5 is
used (not xxhash64) precisely because it is cross-engine: the same math runs
in DuckDB as the oracle.

All pure Column expressions — no shuffle, no UDF; a split/sample is a
map-side filter that costs one hash per row and composes with pushdown.

Reference tie-in: the reference engine has no sampling surface (its
TABLESAMPLE would be delegated to the SQL frontend); these are the
beyond-parity LLM-pipeline operators required by the brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 10_000  # split resolution: 0.01% granularity


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, N_BUCKETS) from the first 8 md5 hex chars
    of ``salt || key`` — uniform, engine-independent, stable under reruns.
    ``salt`` decorrelates independent draws over the same keys (e.g. a
    sample drawn inside a split).

    8 hex chars, not 4: ``% N_BUCKETS`` over a 16-bit space (65536) gives
    buckets below 65536 % 10000 = 5536 a 7/65536 share vs 6/65536 — a ~7%
    relative rate bias. Over the 32-bit space the residue bias is
    1/429497 ≈ 0.0002%, below the advertised 0.01% granularity.

    COMPATIBILITY BREAK (round 4): widening 4→8 hex chars reassigned every
    key's bucket. Splits/samples persisted under the old 4-char hashing are
    NOT comparable to reruns under this version — re-materialize any stored
    train/val/test membership rather than mixing the two vintages."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % N_BUCKETS


def with_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Attach a deterministic train/val/test ``split`` column.

    ``weights`` maps split name → fraction (must sum to ≤ 1; any remainder
    falls into the last split). Assignment is a when-chain over cumulative
    bucket thresholds, so each key's split is a pure function of
    (key, salt) — re-running over 100 TB, or on a different engine, yields
    the identical partition of the corpus.
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    b = hash_bucket(F.col(key_col), salt)
    expr: Column | None = None
    cum = 0.0
    names = list(weights)
    for i, name in enumerate(names):
        cum += weights[name]
        hi = N_BUCKETS if i == len(names) - 1 else int(round(cum * N_BUCKETS))
        cond = b < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    assert expr is not None
    return df.withColumn(split_col, expr)


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep keys whose bucket falls below
    the threshold. Unlike ``df.sample`` this is reproducible, join-stable
    (the same keys survive in every table sampled with the same salt), and
    needs no RNG state."""
    return df.filter(hash_bucket(F.col(key_col), salt) < int(round(fraction * N_BUCKETS)))


def mixture_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum hash sampling — the training-data *mixing* step: keep
    stratum s at rate ``rates[s]`` (strata absent from ``rates`` keep
    ``default_rate``), e.g. upweight curated sources and downsample crawl.

    Deterministic like ``hash_sample`` (same key+salt → same verdict at any
    scale), and still one map-side filter: the per-stratum threshold is a
    when-chain on the stratum column, so there is no shuffle, no join, and
    the filter composes with partition pruning when ``stratum_col`` is a
    partition key — at 100 TB, strata with rate 0 are never read at all.
    """
    b = hash_bucket(F.col(key_col), salt)
    thr: Column = F.lit(int(round(default_rate * N_BUCKETS)))
    for name, rate in rates.items():
        thr = (
            F.when(F.col(stratum_col) == name, F.lit(int(round(rate * N_BUCKETS))))
            .otherwise(thr)
        )
    return df.filter(b < thr)


def priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Weight-proportional sample of exactly ``k`` rows WITHOUT replacement
    with unbiased subset-sum estimates — priority sampling (Duffield, Lund,
    Thorup, JACM 2007). Each row gets priority q = w / u with u a
    deterministic md5-derived uniform in (0, 1]; the k highest-priority rows
    are the sample, and with τ = the (k+1)-th priority, ŵ = max(w, τ) is an
    unbiased estimator of any subset's total weight (E[Σ_{i∈S∩sample} ŵᵢ] =
    Σ_{i∈S} wᵢ). The curation shape: "show me 64 documents drawn
    proportional to length/quality, and let me estimate corpus totals from
    the sample alone".

    Determinism discipline: u = (h32 + 1) / 2³², where h32 is the first 8
    md5 hex chars of salt||key — so q = w · 2³² / (h32 + 1) is a quotient of
    exact integers evaluated once in IEEE double (correctly-rounded ops:
    both engines produce the identical bit pattern), ties broken by key.
    No RNG state, reproducible at any scale, on any engine.

    Scale shape: the priority is a map-side expression; the k+1 selection is
    a TakeOrderedAndProject (per-partition top-(k+1) heaps merged at the
    driver — no global sort, no full shuffle); τ extraction and the ŵ
    attach are single-row-frame ops on the k+1 survivors. The corpus is
    read once and never shuffled at its own volume.

    Returns the k sampled rows with ``priority`` and ``est_weight`` (ŵ)
    columns appended. If the input has ≤ k rows, all rows are returned with
    ŵ = w (τ = 0: the "sample" is exhaustive and estimates are exact).
    """
    top = (
        priority_scored(df, key_col, weight_col, salt)
        .orderBy(F.col("priority").desc(), F.col(key_col))
        .limit(k + 1)
    )
    return priority_topk_finalize(top, key_col, weight_col, k)


def priority_scored(
    df: DataFrame, key_col: str, weight_col: str, salt: str = ""
) -> DataFrame:
    """Map-side priority column attach for ``priority_sample`` — exposed
    separately so a streaming maintainer can score each micro-batch with
    the identical expression."""
    h32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    q = (
        F.col(weight_col).cast("double")
        * F.lit(4294967296.0)
        / (h32 + F.lit(1)).cast("double")
    )
    return df.withColumn("priority", q)


def priority_topk_finalize(
    top: DataFrame, key_col: str, weight_col: str, k: int
) -> DataFrame:
    """Close a priority sample over any frame that CONTAINS the global
    top-(k+1) scored rows (the full corpus's head, or a maintained
    streaming state — top-(k+1) of a union is always within the union of
    each side's top-(k+1), so the merge is exact). The k+1 survivors are
    a tiny bounded frame: both windows over them are O(k); τ attaches as
    a second window column rather than a broadcast-scalar crossJoin,
    which would re-evaluate the (corpus-scanning) top subtree per branch
    — the pca_power lesson."""
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("priority").desc(), F.col(key_col))
    ranked = top.withColumn("_rk", F.row_number().over(w)).withColumn(
        "_tau",
        F.max(F.when(F.col("_rk") == k + 1, F.col("priority"))).over(
            Window.partitionBy()
        ),
    )
    return (
        ranked.filter(F.col("_rk") <= k)
        .withColumn(
            "est_weight",
            F.greatest(
                F.col(weight_col).cast("double"),
                F.coalesce(F.col("_tau"), F.lit(0.0)),
            ),
        )
        .drop("_rk", "_tau")
    )


def stratified_sample_exact(
    df: DataFrame,
    strata_cols: list[str],
    frac: float,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """EXACT stratified sample: ceil(frac * n_s) rows from every stratum s,
    chosen as the first rows in md5(salt||key) order — deterministic,
    engine-independent, and exactly proportional per stratum (hash-threshold
    sampling only hits the fraction in expectation; a 1000-stratum mixture
    spec usually wants the guarantee).

    Plan: one window over (strata, hash-order) computing row_number and the
    stratum count in the same pass — a single shuffle on the strata columns.

    Scale note (100 TB): each stratum sorts within its own window
    partition; with FEW, HUGE strata that is one sorter per stratum. At
    that shape, pre-trim with the approximate map-side filter
    ``hash_bucket(key) < (frac * margin) * N_BUCKETS`` (no shuffle, keeps
    ~frac*margin of the data) and run this exact trim on the survivors —
    the margin (e.g. 1.2x) makes under-selection vanishingly unlikely while
    the sorted window sees only ~frac of the stratum.
    """
    from pyspark.sql import Window

    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    from decimal import Decimal

    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(*strata_cols).orderBy(h.asc(), F.col(key_col).asc())
    wc = Window.partitionBy(*strata_cols)
    # the quota must be the EXACT ceil(frac·n): n·frac in IEEE double can
    # land one ulp high (100·0.07 = 7.000000000000001 → ceil 8), so the
    # product is computed in DECIMAL (frac quantized at 12 places, the
    # same literal a SQL engine parses 0.07 into)
    dfrac = F.lit(Decimal(str(frac))).cast("decimal(18,12)")
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wc))
        .filter(F.col("_rn") <= F.ceil(F.col("_n") * dfrac))
        .drop("_rn", "_n")
    )


def temperature_mix(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    target_frac: float = 0.4,
    salt: str = "",
    with_threshold: bool = False,
) -> DataFrame:
    """Temperature-balanced mixture sampling (α = 0.5): per-stratum keep
    rates ∝ sqrt(n_s)/n_s, normalized so the expected kept total is
    ``target_frac`` of the corpus — the standard multilingual upsampling
    rule (low-resource strata keep a larger share than their raw
    frequency; α=1 reproduces the corpus, α=0 flattens it).

    α is fixed at 0.5 deliberately: IEEE 754 requires sqrt to be
    correctly rounded, so sqrt(n_s) is bit-identical in every engine,
    where pow(n, 0.7) is libm-dependent. Engine-reproducibility of the
    kept SET (not just its size):

    - sqrt(n_s) quantizes to DECIMAL(18,6) and the normalizer S is an
      exact decimal sum — order-independent, so S never varies with
      aggregation order;
    - the remaining arithmetic is double ops written in the SAME
      parenthesization on both engines (IEEE-deterministic given
      identical inputs);
    - the verdict is integer vs integer: md5 bucket < floor(rate ·
      N_BUCKETS). A flip would need the double rate to sit within 1 ulp
      of an integer/N_BUCKETS boundary — the same accepted residual as
      the 9-significant-digit float convention (FIXTURES.md).

    Scale shape: one tiny stratum-count aggregate broadcast back; the
    keep test is map-side per row — the corpus never shuffles.
    """
    thr = temperature_thresholds(df, stratum_col, target_frac)
    b = hash_bucket(F.col(key_col), salt)
    out = (
        df.join(F.broadcast(thr.select(stratum_col, "_thr")), stratum_col)
        .filter(b < F.col("_thr"))
    )
    return out if with_threshold else out.drop("_thr")


def temperature_thresholds(
    df: DataFrame, stratum_col: str, target_frac: float = 0.4
) -> DataFrame:
    """Per-stratum integer keep thresholds for ``temperature_mix`` →
    (stratum, _n_s, _thr): bucket < _thr keeps the row. Exposed so
    reports can show the threshold even for strata where nothing
    survives. See temperature_mix for the determinism contract."""
    counts = (
        df.groupBy(stratum_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("_n_s"))
        .withColumn(
            "_sq_s", F.sqrt(F.col("_n_s").cast("double")).cast("decimal(18,6)")
        )
    )
    tot = counts.agg(
        F.sum("_sq_s").cast("double").alias("_S"),
        F.sum("_n_s").cast("bigint").alias("_n_tot"),
    )
    rate = F.least(
        F.lit(1.0),
        (
            (F.col("_n_tot").cast("double") * F.lit(target_frac))
            * (F.col("_sq_s").cast("double") / F.col("_S"))
        )
        / F.col("_n_s"),
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .withColumn("_thr", F.floor(rate * F.lit(N_BUCKETS)).cast("bigint"))
        .select(stratum_col, "_n_s", "_thr")
    )


def quota_sample_hamilton(
    df: DataFrame,
    stratum_col: str,
    budget: int,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Fixed TOTAL budget apportioned across strata by the largest-remainder
    (Hamilton) method, then filled deterministically — the eval-set /
    annotation-batch shape: "exactly B documents, proportional to the
    corpus mix, reproducible anywhere". Complements
    ``stratified_sample_exact`` (per-stratum FRACTION) with exact
    whole-corpus APPORTIONMENT: Σ alloc_s == budget exactly, every
    alloc_s ∈ {floor(quota), ceil(quota)}.

    All integer-exact (BIGINT products, DIV/MOD — no float quotas, so no
    engine disagreement at any corpus size), ties on remainders break by
    stratum name. Within a stratum the ``alloc_s`` lowest
    md5(salt||key)-ordered rows are kept (the repo's portable-hash order).
    Requires ``budget <= corpus rows`` (then alloc_s <= n_s always holds).

    Scale shape: one count per stratum (map-side partials), a
    strata-cardinality apportionment frame (broadcast), and ONE
    stratum-partitioned window for the fill — the corpus shuffles once,
    on the stratum key.
    """
    from pyspark.sql.window import Window

    # The apportionment chain runs ENTIRELY on the strata-cardinality
    # frame (O(#strata) rows by construction — languages/labels, never
    # data-sized), so the corpus total and the leftover budget are global
    # windows over that tiny frame instead of separate agg+broadcast-
    # crossJoin legs (r13: each crossJoin replayed the sizes aggregate —
    # a full corpus scan — in its own broadcast subtree; 3 scans → 1).
    sizes = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_n"))
    wg = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    q = sizes.select(
        stratum_col,
        (F.lit(budget) * F.col("_n")).cast("bigint").alias("_bn"),
        F.sum("_n").over(wg).alias("_tot"),
    ).select(
        stratum_col,
        F.expr("_bn DIV _tot").alias("_base"),
        F.pmod(F.col("_bn"), F.col("_tot")).alias("_rem"),
    )
    w = Window.orderBy(F.col("_rem").desc(), F.col(stratum_col))
    alloc = (
        q.select(
            stratum_col,
            "_base",
            (F.lit(budget) - F.sum("_base").over(wg)).alias("_left"),
            F.row_number().over(w).alias("_rk"),
        )
        .select(
            stratum_col,
            (
                F.col("_base")
                + F.when(F.col("_rk") <= F.col("_left"), 1).otherwise(0)
            ).cast("bigint").alias("alloc"),
        )
    )
    wr = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))),
        F.col(key_col),
    )
    ranked = df.withColumn("_rn", F.row_number().over(wr))
    return (
        ranked.join(F.broadcast(alloc), stratum_col)
        .filter(F.col("_rn") <= F.col("alloc"))
        .drop("alloc")
        .withColumnRenamed("_rn", "stratum_rank")
    )

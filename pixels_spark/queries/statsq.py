"""Statistical aggregate surface: correlation/regression, histograms,
bitwise aggregates, ordered string aggregation (SURVEY.md §2.4/§2.8).

Native ``corr``/``regr_slope`` are single-pass floating co-moment
aggregations whose result depends on partition visit order — unusable
under the driver's 9-significant-digit cross-engine hash. Here the
co-moments are accumulated as DECIMAL sums (order-independent, exact) and
the closed-form statistic is evaluated in double FROM those exact sums,
identically in both engines — the same determinism discipline as `_dsum`.

Scale: every query is one two-phase hash aggregate (map-side partials);
decimal sums shuffle one row per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import declare


def _dec(c: Column) -> Column:
    return c.cast("decimal(18,6)")


@declare(
    "stat_corr_regression",
    sql="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,6))
                         * CAST(l_discount AS DECIMAL(18,6))
                           AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,6))
                         * CAST(l_quantity AS DECIMAL(18,6))
                           AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(CAST(l_discount AS DECIMAL(18,6))
                         * CAST(l_discount AS DECIMAL(18,6))
                           AS DECIMAL(38,12))) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qd,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
               AS intercept
    FROM s ORDER BY l_returnflag
    """,
    tags=("stats", "correlation", "regression", "aggregation"),
)
def stat_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + OLS slope/intercept of (quantity, discount)
    per returnflag, from DECIMAL-exact co-moment sums (order-independent)
    with the closed form evaluated in double on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = _dec(F.col("l_quantity")), _dec(F.col("l_discount"))
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((x * y).cast("decimal(38,12)")).cast("double").alias("sxy"),
        F.sum((x * x).cast("decimal(38,12)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(38,12)")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov_n = n * sxy - sx * sy
    slope = cov_n / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        "n",
        (cov_n / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)))
        .alias("corr_qd"),
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
    ).orderBy("l_returnflag")


@declare(
    "stat_histogram",
    sql="""
    SELECT CAST(CASE WHEN value < 0 THEN 0
                     WHEN value >= 200 THEN 21
                     ELSE floor(value / 10) + 1 END AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(bit_or(user_id) AS BIGINT) AS users_or,
           CAST(bit_and(user_id) AS BIGINT) AS users_and,
           CAST(bit_xor(event_id) AS BIGINT) AS ids_xor
    FROM events
    GROUP BY bucket
    ORDER BY bucket
    """,
    tags=("stats", "histogram", "bitwise", "aggregation"),
)
def stat_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bucket histogram of event value (width_bucket
    semantics spelled as floor arithmetic — DuckDB has no width_bucket, so
    both engines run the identical formula), with the bitwise aggregate
    family (bit_or/bit_and/bit_xor — all order-independent, exactly
    oracled) riding along per bucket."""
    e = load_table(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < 0, 0)
        .when(F.col("value") >= 200, 21)
        .otherwise(F.floor(F.col("value") / 10) + 1)
        .cast("bigint")
    )
    return (
        e.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.bit_or("user_id").cast("bigint").alias("users_or"),
            F.bit_and("user_id").cast("bigint").alias("users_and"),
            F.bit_xor("event_id").cast("bigint").alias("ids_xor"),
        )
        .orderBy("bucket")
    )


@declare(
    "stat_listagg",
    sql="""
    SELECT l_returnflag, l_linestatus,
           string_agg(DISTINCT CAST(l_linenumber AS VARCHAR), ','
                      ORDER BY CAST(l_linenumber AS VARCHAR)) AS linenos
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("stats", "listagg", "aggregation"),
)
def stat_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/STRING_AGG): distinct line
    numbers per (returnflag, linestatus) joined in lexicographic order —
    deterministic by construction (collect_set -> array_sort ->
    array_join)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set(F.col("l_linenumber").cast("string"))),
                ",",
            ).alias("linenos")
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@declare(
    "stat_zscore_outliers",
    sql="""
    WITH s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(CAST(value AS DECIMAL(18,6))
                         * CAST(value AS DECIMAL(18,6))
                           AS DECIMAL(38,12))) AS DOUBLE) AS sxx
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           (e.value - s.sx / s.n)
             / sqrt(s.sxx / s.n - (s.sx / s.n) * (s.sx / s.n)) AS z
    FROM events e JOIN s ON e.event_type = s.event_type
    WHERE abs((e.value - s.sx / s.n)
              / sqrt(s.sxx / s.n - (s.sx / s.n) * (s.sx / s.n))) > 2.2
    ORDER BY e.event_id
    """,
    tags=("stats", "zscore", "outliers"),
)
def stat_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population z-score outlier flagging per event_type (|z| > 2.2):
    moments from DECIMAL-exact sums, z evaluated with the identical double
    expression both engines; the tiny per-type stats broadcast back onto
    the fact scan — one aggregate + one broadcast join, no second
    shuffle."""
    e = load_table(spark, sf_dir, "events")
    x = _dec(F.col("value"))
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum((x * x).cast("decimal(38,12)")).cast("double").alias("sxx"),
    )
    mean = F.col("sx") / F.col("n")
    z = (F.col("value") - mean) / F.sqrt(F.col("sxx") / F.col("n") - mean * mean)
    return (
        e.join(F.broadcast(s), "event_type")
        .select("event_id", "event_type", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) > 2.2)
        .orderBy("event_id")
    )


@declare(
    "stat_bool_aggs",
    sql="""
    SELECT event_type,
           CAST(count_if(value > 100) AS BIGINT) AS n_big,
           bool_and(value >= 0) AS all_nonneg,
           bool_or(value > 195) AS any_extreme,
           CAST(max(CASE WHEN value > 195 THEN event_id END) AS BIGINT)
               AS max_extreme_id
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("stats", "boolean", "aggregation"),
)
def stat_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregate family: count_if, bool_and (EVERY),
    bool_or (ANY), and a conditional max — all order-independent, one
    two-phase aggregate."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count_if(F.col("value") > 100).cast("bigint").alias("n_big"),
            F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
            F.bool_or(F.col("value") > 195).alias("any_extreme"),
            F.max(F.when(F.col("value") > 195, F.col("event_id")))
            .cast("bigint")
            .alias("max_extreme_id"),
        )
        .orderBy("event_type")
    )


@declare(
    "stat_argmax_latest",
    sql="""
    WITH mx AS (
      SELECT user_id, max(ts) AS max_ts FROM events GROUP BY user_id
    ),
    at_ts AS (
      SELECT e.user_id, e.ts, max(e.event_id) AS event_id
      FROM events e JOIN mx ON e.user_id = mx.user_id AND e.ts = mx.max_ts
      GROUP BY e.user_id, e.ts
    )
    SELECT e.user_id, e.event_id, CAST(e.ts AS TIMESTAMP) AS ts,
           e.event_type, e.value
    FROM events e
    JOIN at_ts a ON e.user_id = a.user_id AND e.event_id = a.event_id
    ORDER BY e.user_id
    """,
    tags=("stats", "argmax", "aggregation"),
)
def stat_argmax_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARG_MAX with a deterministic tie policy: each user's latest event —
    max ts, ties broken by max event_id (plain max_by would be
    tie-nondeterministic across engines). Two small aggregates + joins
    back to the fact row; every join key is a per-user aggregate so AQE
    broadcasts them."""
    e = load_table(spark, sf_dir, "events")
    mx = e.groupBy("user_id").agg(F.max("ts").alias("max_ts")).alias("mx")
    at_ts = (
        e.alias("l")
        .join(
            mx,
            (F.col("l.user_id") == F.col("mx.user_id"))
            & (F.col("l.ts") == F.col("mx.max_ts")),
        )
        .groupBy(F.col("l.user_id"), F.col("l.ts"))
        .agg(F.max(F.col("l.event_id")).alias("event_id"))
        .select("event_id")
    )
    return (
        e.join(at_ts, "event_id")
        .select("user_id", "event_id", "ts", "event_type", "value")
        .orderBy("user_id")
    )


@declare(
    "profile_columns",
    sql="""
    SELECT 'doc_id' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(doc_id) AS BIGINT) AS n_null,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
           CAST(min(doc_id) AS STRING) AS min_val,
           CAST(max(doc_id) AS STRING) AS max_val
    FROM documents
    UNION ALL
    SELECT 'lang', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(lang) AS BIGINT),
           CAST(count(DISTINCT lang) AS BIGINT),
           CAST(min(lang) AS STRING), CAST(max(lang) AS STRING)
    FROM documents
    UNION ALL
    SELECT 'n_chars', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(n_chars) AS BIGINT),
           CAST(count(DISTINCT n_chars) AS BIGINT),
           CAST(min(n_chars) AS STRING), CAST(max(n_chars) AS STRING)
    FROM documents
    UNION ALL
    SELECT 'source', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(source) AS BIGINT),
           CAST(count(DISTINCT source) AS BIGINT),
           CAST(min(source) AS STRING), CAST(max(source) AS STRING)
    FROM documents
    ORDER BY col_name
    """,
    tags=("profiling", "aggregation", "data-quality", "beyond-parity"),
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational data profiler — per-column row/null/distinct counts and
    min/max over ``documents``, the first step of every ingest-QA
    pipeline (the batch analog of the reference's per-file column
    statistics, ``pixels-core/.../stats/StatsRecorder.java``, lifted to
    whole-table grain).

    ONE scan: a single wide aggregate computes every column's stats
    (count-distincts expand to Spark's Expand operator — still one pass
    over the data), then the 1-row result unpivots executor-side into the
    (col_name, stats) report. The oracle restates it as per-column UNION
    ALL aggregates. min/max surface as strings so one report schema fits
    every column type (numerics/strings here; timestamps would pin a
    format first — FIXTURES.md §Oracle-comparison).

    100 TB: identical shape — one scan, 4 tiny agg states per partition;
    the unpivot touches one row. Exact distincts are the test harness;
    at scale swap approx_count_distinct per column (cb_approx_distinct's
    contract) without changing the report schema.
    """
    cols = ["doc_id", "lang", "n_chars", "source"]
    d = load_table(spark, sf_dir, "documents")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"_c_{c}"),
            F.countDistinct(c).alias(f"_d_{c}"),
            F.min(c).cast("string").alias(f"_mn_{c}"),
            F.max(c).cast("string").alias(f"_mx_{c}"),
        ]
    row = d.agg(*aggs)
    packed = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("_n").cast("bigint").alias("n_rows"),
            (F.col("_n") - F.col(f"_c_{c}")).cast("bigint").alias("n_null"),
            F.col(f"_d_{c}").cast("bigint").alias("n_distinct"),
            F.col(f"_mn_{c}").alias("min_val"),
            F.col(f"_mx_{c}").alias("max_val"),
        )
        for c in cols
    ]
    return (
        row.select(F.explode(F.array(*packed)).alias("p"))
        .select("p.*")
        .orderBy("col_name")
    )


@declare(
    "dq_checks",
    sql="""
    SELECT 'documents_lang_allowed' AS rule,
           CAST(count(*) AS BIGINT) AS n_checked,
           CAST(sum(CASE WHEN lang NOT IN ('en','de','es','fr','zh')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM documents
    UNION ALL
    SELECT 'documents_nchars_consistent', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'events_user_fk', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    UNION ALL
    SELECT 'lineitem_discount_range', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'orders_duplicate_keys', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_without_lineitems', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN l.l_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM orders o LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem) l
      ON o.o_orderkey = l.l_orderkey
    ORDER BY rule
    """,
    tags=("data-quality", "aggregation", "join", "beyond-parity"),
)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality rule suite → one (rule, n_checked,
    n_violations) row per rule — the ingest-gate report every training
    pipeline runs before a corpus snapshot is blessed (and the
    whole-table complement of the reference's per-file integrity stats).
    Six honest rules over the fixture: set-membership (lang), derived-
    column consistency (n_chars = length(text)), referential integrity
    both directions (events→customer FK; orders with no lineitems — the
    fixture really has ~1.7% childless orders), domain range (discount ∈
    [0, 0.1]), and key uniqueness. No rule collects.

    ONE SCAN PER SOURCE TABLE (plan-asserted in tests/test_statsq.py):
    same-table rules compose into a single wide aggregate whose 1-row
    result explodes into the per-rule report rows (the profile_columns
    pattern) — documents' two rules share one aggregate, orders' two
    (dup keys + childless) share the post-join aggregate. lineitem is
    scanned ONCE for both its consumers: a per-orderkey pre-aggregate
    carries the discount-violation partial sums AND serves as the
    distinct-key set for the orders anti-probe, so the second consumer
    rides a ReusedExchange instead of a second FileScan. The FK probes
    stay plain AQE-planned joins.

    100 TB: the wide aggregates are map-side CASE sums; the lineitem
    pre-aggregate is the one key-cardinality shuffle the childless-orders
    rule needs anyway. Violation EXAMPLES (not counts) are a LIMIT k per
    rule away — same plans, early-terminated.

    Perf note (r8, measured): ~2.0 s warm at sf0.1 (1.96/2.39 s over 3
    trials) — the r7 1.19× creep is exactly the intended
    one-scan-per-source trade (the lineitem pre-aggregate exchange
    replaced a second FileScan); no residual regression to recover.
    """
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    def report(agg_row: DataFrame, rules: list[tuple[str, str, str]]) -> DataFrame:
        packed = [
            F.struct(
                F.lit(name).alias("rule"),
                F.col(chk).cast("bigint").alias("n_checked"),
                F.col(vio).cast("bigint").alias("n_violations"),
            )
            for name, chk, vio in rules
        ]
        return agg_row.select(F.explode(F.array(*packed)).alias("x")).select(
            "x.rule", "x.n_checked", "x.n_violations"
        )

    def bad(cond: Column) -> Column:
        return F.sum(F.when(cond, 1).otherwise(0))

    lang_ok = ["en", "de", "es", "fr", "zh"]
    doc_rules = report(
        d.agg(
            F.count(F.lit(1)).alias("_n"),
            bad(~F.col("lang").isin(lang_ok)).alias("_lang"),
            bad(F.col("n_chars") != F.length("text")).alias("_nchars"),
        ),
        [
            ("documents_lang_allowed", "_n", "_lang"),
            ("documents_nchars_consistent", "_n", "_nchars"),
        ],
    )
    fk_rules = report(
        e.join(c, e["user_id"] == c["c_custkey"], "left_outer").agg(
            F.count(F.lit(1)).alias("_n"),
            bad(F.col("c_custkey").isNull()).alias("_orphans"),
        ),
        [("events_user_fk", "_n", "_orphans")],
    )
    # ONE lineitem scan and ONE orders scan: the per-orderkey lineitem
    # pre-aggregate (which the childless-orders probe needs anyway) also
    # carries the discount-violation partial sums, and a single FULL OUTER
    # key join + wide aggregate yields all three remaining rules — no
    # second consumer subtree, so no scan duplication for Catalyst to
    # (fail to) deduplicate.
    li_grp = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("_n_rows"),
        bad(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)
        ).alias("_bad_disc"),
    )
    lo = o.select("o_orderkey").join(
        li_grp, o["o_orderkey"] == li_grp["l_orderkey"], "full_outer"
    )
    lo_rules = report(
        lo.agg(
            F.sum(F.coalesce(F.col("_n_rows"), F.lit(0))).alias("_n_li"),
            F.sum(F.coalesce(F.col("_bad_disc"), F.lit(0))).alias("_disc"),
            F.count("o_orderkey").alias("_n_ord"),
            (F.count("o_orderkey") - F.countDistinct("o_orderkey")).alias(
                "_dups"
            ),
            bad(
                F.col("o_orderkey").isNotNull() & F.col("l_orderkey").isNull()
            ).alias("_childless"),
        ),
        [
            ("lineitem_discount_range", "_n_li", "_disc"),
            ("orders_duplicate_keys", "_n_ord", "_dups"),
            ("orders_without_lineitems", "_n_ord", "_childless"),
        ],
    )
    out = doc_rules
    for part in [fk_rules, lo_rules]:
        out = out.unionByName(part)
    return out.orderBy("rule")


_CMS_DEPTH, _CMS_WIDTH = 3, 64


def _cms_oracle() -> str:
    """SQL restatement of functions.sketches.count_min_*: same md5 hash
    family, same cell grid, same min-over-rows estimate — integer-exact
    on both engines (no approximation in the COMPARISON; the sketch's
    approximation is vs the true counts, and both engines build the
    identical sketch)."""
    return f"""
    WITH cells AS (
      SELECT r,
             CAST(concat('0x', substr(md5(concat(CAST(r AS VARCHAR), '|',
                    CAST(user_id AS VARCHAR))), 1, 8)) AS BIGINT)
               % {_CMS_WIDTH} AS bucket
      FROM events, unnest([0, 1, 2]) AS t(r)
      WHERE user_id IS NOT NULL),
    sketch AS (
      SELECT r, bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM cells GROUP BY r, bucket),
    keys AS (
      SELECT DISTINCT user_id FROM events ORDER BY user_id LIMIT 10),
    probes AS (
      SELECT k.user_id, t.r,
             CAST(concat('0x', substr(md5(concat(CAST(t.r AS VARCHAR), '|',
                    CAST(k.user_id AS VARCHAR))), 1, 8)) AS BIGINT)
               % {_CMS_WIDTH} AS bucket
      FROM keys k, unnest([0, 1, 2]) AS t(r)),
    est AS (
      SELECT p.user_id,
             CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS est_cnt
      FROM probes p LEFT JOIN sketch s
        ON s.r = p.r AND s.bucket = p.bucket
      GROUP BY p.user_id),
    exact AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
      FROM events GROUP BY user_id)
    SELECT e.user_id, e.est_cnt, x.exact_cnt,
           e.est_cnt >= x.exact_cnt AS is_overestimate
    FROM est e JOIN exact x ON e.user_id = x.user_id
    ORDER BY e.user_id
    """


@declare(
    "sketch_count_min",
    sql=_cms_oracle(),
    tags=("sketch", "count-min", "approximate", "beyond-parity"),
)
def sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch (depth 3 × width 64, md5 hash family)
    over events.user_id, probed for the 10 smallest user ids against the
    exact counts. Every cell and estimate is bit-identically replayed by
    the oracle — the md5 family makes the whole sketch engine-portable —
    so the row set, including the collision-inflated overestimates the
    64-bucket width forces at 150+ users, matches exactly.

    Scale: build is one narrow explode + ONE hash aggregate (map-side
    partials collapse each partition to ≤ depth×width cells before the
    exchange); the probe broadcasts the ≤192-row sketch. The exact-count
    branch exists only for the oracle's comparison column."""
    from ..functions.sketches import count_min_build, count_min_estimate

    e = load_table(spark, sf_dir, "events")
    sketch = count_min_build(e, "user_id", _CMS_DEPTH, _CMS_WIDTH)
    keys = (
        e.select("user_id").filter(F.col("user_id").isNotNull())
        .distinct().orderBy("user_id").limit(10)
    )
    est = count_min_estimate(keys, sketch, "user_id", _CMS_DEPTH, _CMS_WIDTH)
    exact = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_cnt")
    )
    return (
        est.join(exact, "user_id")
        .select(
            "user_id",
            F.col("est_cnt").cast("bigint").alias("est_cnt"),
            "exact_cnt",
            (F.col("est_cnt") >= F.col("exact_cnt")).alias("is_overestimate"),
        )
        .orderBy("user_id")
    )


_KMV_K = 256


def _kmv_oracle() -> str:
    """SQL restatement of functions.sketches.kmv_* — same 60-bit md5
    family, same k-smallest synopses, same closed-form estimates. The
    COMPARISON is exact (both engines build the identical synopsis and
    evaluate the identical double expressions); the sketch's ~1/√k error
    is vs the exact_* columns, carried alongside for calibration."""
    hv = (
        "CAST(concat('0x', substr(md5(CAST(key AS VARCHAR)), 1, 15)) "
        "AS BIGINT)"
    )
    est = (
        "CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE) "
        "ELSE {km1}.0 * 1152921504606846976.0 / CAST(max(hv) AS DOUBLE) END"
    ).format(k=_KMV_K, km1=_KMV_K - 1)
    return f"""
    WITH a AS (SELECT DISTINCT o_custkey AS key FROM orders
               WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                 AND o_orderdate <  TIMESTAMP '1997-01-01'),
    b AS (SELECT DISTINCT o_custkey AS key FROM orders
          WHERE o_orderdate >= TIMESTAMP '1997-01-01'
            AND o_orderdate <  TIMESTAMP '1998-01-01'),
    sa AS (SELECT {hv} AS hv FROM a ORDER BY hv LIMIT {_KMV_K}),
    sb AS (SELECT {hv} AS hv FROM b ORDER BY hv LIMIT {_KMV_K}),
    su AS (SELECT DISTINCT hv FROM
             (SELECT hv FROM sa UNION ALL SELECT hv FROM sb) u
           ORDER BY hv LIMIT {_KMV_K}),
    ea AS (SELECT {est} AS est_a FROM sa),
    eb AS (SELECT {est} AS est_b FROM sb),
    eu AS (SELECT {est} AS est_union FROM su),
    rho AS (SELECT CAST(count(*) AS BIGINT) AS in_both FROM su
            WHERE hv IN (SELECT hv FROM sa)
              AND hv IN (SELECT hv FROM sb)),
    usz AS (SELECT CAST(count(*) AS BIGINT) AS u_sz FROM su),
    ex AS (SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM a) AS exact_a,
      (SELECT CAST(count(*) AS BIGINT) FROM b) AS exact_b,
      (SELECT CAST(count(DISTINCT key) AS BIGINT) FROM
         (SELECT key FROM a UNION ALL SELECT key FROM b) x) AS exact_union,
      (SELECT CAST(count(*) AS BIGINT) FROM a
       WHERE key IN (SELECT key FROM b)) AS exact_inter)
    SELECT {_KMV_K} AS k, est_a, est_b, est_union,
           CAST(in_both AS DOUBLE) / CAST(u_sz AS DOUBLE) * est_union
             AS est_inter,
           exact_a, exact_b, exact_union, exact_inter
    FROM ea, eb, eu, rho, usz, ex
    """


@declare(
    "sketch_kmv",
    sql=_kmv_oracle(),
    tags=("sketch", "kmv", "distinct", "set-operations", "beyond-parity"),
)
def sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct sketch with SET-OPERATION
    estimates: distinct 1996 buyers, distinct 1997 buyers, their union
    and intersection — all four estimated from two 256-row synopses
    built with ONE scan each, never rescanning the data (the union
    synopsis is ⊕-merged from the two sketches; the intersection uses
    the Jaccard fraction of the union synopsis present in both inputs —
    the Theta-sketch estimator). Exact counts ride along for
    calibration. The md5 hash family makes every synopsis row and both
    closed-form estimates bit-identically SQL-replayable, so this
    APPROXIMATE operator gets an EXACT oracle (same pattern as
    ``sketch_count_min``).

    Scale: ONE scan and ONE shuffle total — the (key → in_a, in_b)
    membership table is a single hash aggregate over the date-pruned
    scan; every exact count is one aggregate over it, each synopsis is
    a per-partition top-k (TakeOrderedAndProject) over it, and
    everything downstream touches only ≤k-row frames (broadcast / 1-row
    crossJoins).

    Reference approximate-cardinality surface for contrast:
    pixels-core/src/main/java/io/pixelsdb/pixels/core/stats (exact
    collectors) + HLL via approx_count_distinct elsewhere."""
    from ..functions.sketches import KMV_DOMAIN, kmv_hash

    o = load_table(spark, sf_dir, "orders")
    in_a = (F.col("o_orderdate") >= "1996-01-01") & (
        F.col("o_orderdate") < "1997-01-01"
    )
    keys = (
        o.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .select(
            F.col("o_custkey").alias("key"),
            in_a.cast("int").alias("in_a"),
            (~in_a).cast("int").alias("in_b"),
        )
        .groupBy("key")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
        .select("key", "in_a", "in_b", kmv_hash(F.col("key")).alias("hv"))
    )
    # Each synopsis is O(k) BY CONSTRUCTION — collect it and run the
    # ⊕/estimate algebra driver-side (the same bounded-collect budget as
    # Bloom bit positions / centroid ranking). r13: both synopses AND the
    # exact-count aggregate ride ONE tagged-union collect (was persist +
    # 3 sequential jobs): the three branches share the membership
    # shuffle via ReusedExchange, each per-side synopsis is a
    # TakeOrderedAndProject over it (per-partition top-k, ≤k rows per
    # partition cross the merge at any scale — the two-level merge
    # VERDICT r12 #1 asks for), and only 2·k + 4 rows ever reach the
    # driver. Every arithmetic step below is the oracle's, in IEEE
    # doubles.
    # each side's filter tautologically references the OTHER flag too
    # (flags are 0/1, so `>= 0` never drops a row): without it Catalyst
    # prunes the unused flag from each branch's partial aggregate, the
    # three exchange subtrees stop being identical, and ReusedExchange
    # cannot fire — measured as 2 extra scans + 2 extra shuffles.
    sa_t = (
        keys.filter("in_a = 1 AND in_b >= 0")
        .select(F.lit("a").alias("t"), F.col("hv").alias("v"))
        .orderBy("v")
        .limit(_KMV_K)
    )
    sb_t = (
        keys.filter("in_b = 1 AND in_a >= 0")
        .select(F.lit("b").alias("t"), F.col("hv").alias("v"))
        .orderBy("v")
        .limit(_KMV_K)
    )
    ex_t = (
        keys.agg(
            F.sum("in_a").cast("bigint").alias("ea"),
            F.sum("in_b").cast("bigint").alias("eb"),
            F.count(F.lit(1)).cast("bigint").alias("eu"),
            F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("ei"),
        )
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(t).alias("t"), F.col(t[1:]).alias("v"))
                        for t in ("xea", "xeb", "xeu", "xei")
                    ]
                )
            ).alias("r")
        )
        .select("r.t", "r.v")
    )
    rows = sa_t.unionByName(sb_t).unionByName(ex_t).collect()
    sa = sorted(r.v for r in rows if r.t == "a")
    sb = sorted(r.v for r in rows if r.t == "b")
    exd = {r.t: r.v for r in rows if r.t.startswith("x")}
    su = sorted(set(sa) | set(sb))[:_KMV_K]

    def est(s: list[int]) -> float:
        if len(s) < _KMV_K:
            return float(len(s))
        return float(_KMV_K - 1) * KMV_DOMAIN / float(max(s))

    in_both = sum(1 for h in su if h in set(sa) and h in set(sb))
    est_inter = float(in_both) / float(len(su)) * est(su)
    return spark.createDataFrame(
        [
            (
                _KMV_K,
                est(sa),
                est(sb),
                est(su),
                est_inter,
                exd["xea"],
                exd["xeb"],
                exd["xeu"],
                exd["xei"],
            )
        ],
        "k int, est_a double, est_b double, est_union double, "
        "est_inter double, exact_a bigint, exact_b bigint, "
        "exact_union bigint, exact_inter bigint",
    )


@declare(
    "stat_skyline",
    sql="""
    SELECT p.p_partkey, p.p_retailprice, CAST(p.p_size AS BIGINT) AS p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
    ORDER BY p.p_retailprice, p.p_partkey
    """,
    tags=("skyline", "pareto", "olap", "beyond-parity"),
)
def stat_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) of parts: minimize price, maximize size
    — every part no other part dominates (cheaper-or-equal AND
    bigger-or-equal, strictly better in one). The classic multi-criteria
    OLAP operator (Börzsönyi et al. 2001). Semantics are defined on
    DISTINCT (price, size) points; all parts carrying a frontier point
    are returned. Exact: double/int comparisons only.

    Scale — the oracle's NOT EXISTS is a quadratic self-join; the engine
    instead runs a two-level distributed prefix-max over the sorted
    order (price asc, size desc), where a point is on the frontier iff
    its size strictly exceeds the running max size of all predecessors:
    (1) bucket points by price range; (2) per-bucket max size (tiny
    aggregate) -> exclusive prefix max across buckets via a window over
    the O(#buckets) frame, broadcast back; (3) within each bucket a
    PARTITIONED window computes the local running max. No global window
    ever touches the full point set, so the frontier scan parallelizes
    by bucket; the final emit joins the (small) frontier point set back
    broadcast. At 100 TB the bucket bounds come from column stats
    instead of a fixed width."""
    from pyspark.sql import Window

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", F.col("p_size").cast("bigint").alias("p_size")
    )
    pts = (
        p.select("p_retailprice", "p_size")
        .distinct()
        .withColumn("_b", F.floor(F.col("p_retailprice") / F.lit(100.0)))
    )
    bmax = pts.groupBy("_b").agg(F.max("p_size").alias("_bm"))
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    bpre = bmax.select("_b", F.max("_bm").over(wb).alias("_lower"))
    win = (
        Window.partitionBy("_b")
        .orderBy(F.col("p_retailprice").asc(), F.col("p_size").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        pts.join(F.broadcast(bpre), "_b")
        .withColumn("_local", F.max("p_size").over(win))
        .withColumn(
            "_pred",
            F.greatest(
                F.coalesce(F.col("_local"), F.lit(-1).cast("bigint")),
                F.coalesce(F.col("_lower"), F.lit(-1).cast("bigint")),
            ),
        )
        .filter(F.col("p_size") > F.col("_pred"))
        .select("p_retailprice", "p_size")
    )
    return (
        p.join(F.broadcast(frontier), ["p_retailprice", "p_size"])
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_partkey")
    )


_HIST_LO, _HIST_HI, _HIST_BINS = 0.0, 600000.0, 64
_HIST_QS = [0.5, 0.9, 0.99]


def _hist_oracle() -> str:
    """Bit-exact SQL replay of the histogram sketch + quantile read:
    deterministic binning, integer counts, one double interpolation —
    dialect-shared (floor/least/greatest/windows in the ANSI subset)."""
    w = (_HIST_HI - _HIST_LO) / _HIST_BINS
    qs_union = " UNION ALL ".join(
        f"SELECT CAST({q} AS DOUBLE) AS q" for q in _HIST_QS
    )
    return f"""
    WITH h AS (
      SELECT least(CAST({_HIST_BINS - 1} AS BIGINT),
                   greatest(CAST(0 AS BIGINT),
                     CAST(floor((CAST(o_totalprice AS DOUBLE) - {_HIST_LO})
                                / {w}) AS BIGINT))) AS bin,
             CAST(count(*) AS BIGINT) AS cnt
      FROM orders WHERE o_totalprice IS NOT NULL
      GROUP BY 1),
    c AS (SELECT bin, cnt,
                 sum(cnt) OVER (ORDER BY bin) AS cum,
                 sum(cnt) OVER () AS n
          FROM h),
    qs AS ({qs_union}),
    hit AS (SELECT q, bin, cnt, cum, n,
                   row_number() OVER (PARTITION BY q ORDER BY bin) AS rn
            FROM qs JOIN c ON CAST(cum AS DOUBLE) >= q * CAST(n AS DOUBLE))
    SELECT q,
           {_HIST_LO} + {w} * (CAST(bin AS DOUBLE)
             + (q * CAST(n AS DOUBLE) - CAST(cum - cnt AS DOUBLE))
               / CAST(cnt AS DOUBLE)) AS est
    FROM hit WHERE rn = 1 ORDER BY q
    """


@declare(
    "sketch_histogram",
    sql=_hist_oracle(),
    tags=("sketch", "histogram", "quantile", "mergeable", "beyond-parity"),
)
def sketch_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equi-width histogram sketch over order totals with
    quantile reads (p50/p90/p99 by linear interpolation inside the hit
    bin) — the fixed-range member of the engine's mergeable-sketch
    family (functions/sketches.py algebra: ⊕ = bin-wise counter sum, so
    per-day/per-source histograms fold into exact union histograms with
    no rescan; HistogramRegistry + stream_sketch_histogram are the
    maintenance path). Unlike KLL/t-digest the error bound is one bin
    width over a declared range — the trade that buys exact SQL
    replayability, which is why every value here is oracle-hashable.

    Scale: build is one narrow pass + ONE ≤64-row aggregate (map-side
    partials bound shuffle volume at O(partitions × bins)); the quantile
    read runs entirely on the 64-row sketch (tiny windows + a 3-row
    broadcast probe), never touching source rows again."""
    from ..functions.sketches import hist_build, hist_quantiles

    o = load_table(spark, sf_dir, "orders")
    sk = hist_build(o, "o_totalprice", _HIST_LO, _HIST_HI, _HIST_BINS)
    return hist_quantiles(sk, _HIST_QS, _HIST_LO, _HIST_HI, _HIST_BINS).orderBy(
        "q"
    )


_MWU_Z = """(CAST(two_u AS DOUBLE) / 2.0
             - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0)
            / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0
                   * (CAST(na + nb + 1 AS DOUBLE)
                      - CAST(tie_t AS DOUBLE)
                        / (CAST(na + nb AS DOUBLE)
                           * CAST(na + nb - 1 AS DOUBLE))))"""


@declare(
    "stat_mann_whitney",
    sql=f"""
    WITH ab AS (
      SELECT value AS v,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ca,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cb
      FROM events WHERE event_type IN ('view', 'click')
      GROUP BY value
    ), pre AS (
      SELECT v, ca, cb,
             CAST(coalesce(sum(cb) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) AS less_b
      FROM ab
    ), s AS (
      SELECT CAST(sum(ca) AS BIGINT) AS na,
             CAST(sum(cb) AS BIGINT) AS nb,
             CAST(sum(ca * (2 * less_b + cb)) AS BIGINT) AS two_u,
             CAST(sum((ca + cb) * (ca + cb) * (ca + cb) - (ca + cb))
                  AS BIGINT) AS tie_t
      FROM pre
    )
    SELECT na, nb, two_u, tie_t, {_MWU_Z} AS z
    FROM s
    """,
    tags=("stats", "hypothesis-test", "rank-sum", "drift", "beyond-parity"),
)
def stat_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test between the 'view' and 'click' value
    distributions — the nonparametric two-sample drift test a data-quality
    pipeline runs between corpus snapshots (distribution shifted? no
    normality assumption). The statistic is held exact: 2U = Σ cₐ(v)·
    (2·|{b < v}| + ties_b(v)) and the tie term Σ(t³−t) are BIGINTs built
    from per-value counts; the normal-approximation z (tie-corrected
    variance) is one fixed chain of IEEE ops from those integers, so the
    oracle matches exactly and the text is dialect-shared.

    Scale: the oracle ranks via ONE global window — fine for DuckDB, a
    single-task sort at 100 TB. The engine instead computes |{b < v}| with
    a TWO-LEVEL prefix sum (the stat_skyline pattern): per-value counts
    (one shuffle on value), bucket subtotals → exclusive bucket prefix over
    the tiny bucket frame, then a bucket-PARTITIONED window for the local
    prefix — no global window ever touches the value set. The closing
    aggregate is map-side. (tie_t cubes per-value tie counts: at extreme
    corpus sizes pre-bucket values to bound t³ below 2⁶³.)"""
    from pyspark.sql import Window

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click"))
        .select("event_type", F.col("value").alias("v"))
    )
    # persist the value-grain counts: the bucket-subtotal branch and the
    # main join both read them — unpersisted, the events scan runs twice.
    # O(distinct values) rows; MEMORY_AND_DISK default handles any size.
    ab = e.groupBy("v").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("ca"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("cb"),
    ).persist()
    b = ab.withColumn("_b", F.floor(F.col("v") / F.lit(25.0)))
    bsum = b.groupBy("_b").agg(F.sum("cb").alias("_bs"))
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    bpre = bsum.select(
        "_b",
        F.coalesce(F.sum("_bs").over(wb), F.lit(0)).cast("bigint").alias("_lower"),
    )
    win = (
        Window.partitionBy("_b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = (
        b.join(F.broadcast(bpre), "_b")
        .withColumn(
            "less_b",
            (
                F.col("_lower")
                + F.coalesce(F.sum("cb").over(win), F.lit(0))
            ).cast("bigint"),
        )
    )
    s = pre.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
        F.sum(F.col("ca") * (2 * F.col("less_b") + F.col("cb")))
        .cast("bigint")
        .alias("two_u"),
        F.sum(
            (F.col("ca") + F.col("cb"))
            * (F.col("ca") + F.col("cb"))
            * (F.col("ca") + F.col("cb"))
            - (F.col("ca") + F.col("cb"))
        )
        .cast("bigint")
        .alias("tie_t"),
    )
    return s.select("na", "nb", "two_u", "tie_t", F.expr(_MWU_Z).alias("z"))


_CHI2 = """CAST(sum(CAST(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                          AS DECIMAL(28,12))) AS DOUBLE)"""


@declare(
    "stat_chi_square",
    sql=f"""
    WITH o AS (
      SELECT event_type AS rt, CAST(hour(ts) AS BIGINT) AS ct,
             CAST(count(*) AS BIGINT) AS obs
      FROM events GROUP BY event_type, hour(ts)
    ), r AS (SELECT rt, CAST(sum(obs) AS BIGINT) AS rtot FROM o GROUP BY rt),
    c AS (SELECT ct, CAST(sum(obs) AS BIGINT) AS ctot FROM o GROUP BY ct),
    g AS (SELECT CAST(sum(obs) AS BIGINT) AS gt,
                 CAST(count(DISTINCT rt) AS BIGINT) AS nr,
                 CAST(count(DISTINCT ct) AS BIGINT) AS nc
          FROM o),
    cells AS (
      SELECT coalesce(o.obs, 0) AS obs, r.rtot, c.ctot, g.gt, g.nr, g.nc,
             (CAST(coalesce(o.obs, 0) AS DECIMAL(38,0)) * g.gt
              - CAST(r.rtot AS DECIMAL(38,0)) * c.ctot)
             * (CAST(coalesce(o.obs, 0) AS DECIMAL(38,0)) * g.gt
                - CAST(r.rtot AS DECIMAL(38,0)) * c.ctot) AS num,
             CAST(r.rtot AS DECIMAL(38,0)) * c.ctot * g.gt AS den
      FROM r CROSS JOIN c CROSS JOIN g
      LEFT JOIN o ON o.rt = r.rt AND o.ct = c.ct
    )
    SELECT max(gt) AS n, max(nr) AS n_rows, max(nc) AS n_cols,
           (max(nr) - 1) * (max(nc) - 1) AS dof,
           {_CHI2} AS chi2,
           sqrt({_CHI2}
                / CAST(max(gt) * least(max(nr) - 1, max(nc) - 1)
                       AS DOUBLE)) AS cramers_v
    FROM cells
    """,
    tags=("stats", "hypothesis-test", "chi-square", "independence",
          "beyond-parity"),
)
def stat_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test between event type and hour-of-day
    (is traffic mix time-of-day dependent?), with Cramér's V effect size —
    the categorical-drift primitive a curation pipeline runs between
    corpus slices. The statistic is exact-by-construction: each cell's
    (o·g − r·c)² / (r·c·g) form keeps numerator/denominator in integer
    DECIMAL(38,0) (expected counts never materialized as floats), the
    per-cell quotient is one IEEE division quantized to DECIMAL(28,12),
    and the sum is an exact decimal aggregate — order-independent, so the
    oracle matches exactly and the text is dialect-shared. Zero cells of
    the R×C grid are restored by the tiny cross join (5 types × 24 hours),
    allowlisted. (At extreme corpora o·g approaches DECIMAL(38) — pre-scale
    counts by a common factor first; χ² is scale-sensitive but the
    INDEPENDENCE decision at such n is degenerate anyway.)

    Scale: one hash aggregate to the R×C grid (map-side partials), then
    O(R·C) frame ops — the events table is scanned once and never
    shuffled at its own volume."""
    e = load_table(spark, sf_dir, "events")
    # persist the R×C cell frame: r/c/g and the grid join all derive from
    # it, and an unpersisted lazy subtree is re-evaluated per reference —
    # the events scan would run 4× (measured; cells are ≤ R·C rows)
    o = e.groupBy(
        F.col("event_type").alias("rt"),
        F.hour("ts").cast("bigint").alias("ct"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("obs")).persist()
    r = o.groupBy("rt").agg(F.sum("obs").cast("bigint").alias("rtot"))
    c = o.groupBy("ct").agg(F.sum("obs").cast("bigint").alias("ctot"))
    g = o.agg(
        F.sum("obs").cast("bigint").alias("gt"),
        F.countDistinct("rt").cast("bigint").alias("nr"),
        F.countDistinct("ct").cast("bigint").alias("nc"),
    )
    diff = (
        F.coalesce(F.col("obs"), F.lit(0)).cast("decimal(38,0)") * F.col("gt")
        - F.col("rtot").cast("decimal(38,0)") * F.col("ctot")
    )
    cells = (
        r.crossJoin(F.broadcast(c))
        .crossJoin(F.broadcast(g))
        .join(F.broadcast(o), ["rt", "ct"], "left")
        .select(
            "gt",
            "nr",
            "nc",
            (diff * diff).alias("num"),
            (
                F.col("rtot").cast("decimal(38,0)")
                * F.col("ctot")
                * F.col("gt")
            ).alias("den"),
        )
    )
    return cells.agg(
        F.max("gt").alias("n"),
        F.max("nr").alias("n_rows"),
        F.max("nc").alias("n_cols"),
        ((F.max("nr") - 1) * (F.max("nc") - 1)).alias("dof"),
        F.expr(_CHI2).alias("chi2"),
        F.expr(
            f"""sqrt({_CHI2}
                / CAST(max(gt) * least(max(nr) - 1, max(nc) - 1)
                       AS DOUBLE))"""
        ).alias("cramers_v"),
    )


@declare(
    "stat_weighted_median",
    sql="""
    WITH vw AS (
      SELECT l_returnflag AS grp, l_extendedprice AS v,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY l_returnflag, l_extendedprice
    ), cum AS (
      SELECT grp, v, w,
             CAST(sum(w) OVER (PARTITION BY grp ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cw,
             CAST(sum(w) OVER (PARTITION BY grp) AS BIGINT) AS tw
      FROM vw
    )
    SELECT grp, min(v) AS weighted_median, max(tw) AS total_weight
    FROM cum WHERE 2 * cw >= tw
    GROUP BY grp ORDER BY grp
    """,
    tags=("stats", "median", "weighted", "beyond-parity"),
)
def stat_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED median (lower) of extended price per return flag,
    weighted by quantity — the order statistic ``cb_quantiles`` can't
    express (every unit of quantity votes, not every row): min v with
    2·cumweight(v) ≥ totalweight, all integer compares (quantities are
    integral in the fixture; cast is exact).

    Scale: the oracle's per-group cumulative window is a single sorted
    partition per group; the engine computes the running weight with the
    TWO-LEVEL prefix sum instead (the stat_skyline / stat_mann_whitney
    pattern — price-band subtotals → exclusive band prefix over the tiny
    band frame → band-partitioned local window), so no window partition
    ever holds a full group."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    from ..functions.dedup import cut_lineage

    # r12 optimization: the value-grain weight frame feeds BOTH the band
    # subtotal branch and the main cumulative join — without a lineage
    # cut each branch replays the lineitem scan + (grp, v) aggregate
    vw = cut_lineage(
        li.groupBy("grp", "v").agg(F.sum("q").cast("bigint").alias("w"))
    )
    b = vw.withColumn("_b", F.floor(F.col("v") / F.lit(1000.0)))
    bs = b.groupBy("grp", "_b").agg(F.sum("w").alias("_bs"))
    wb = (
        Window.partitionBy("grp")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bpre = bs.select(
        "grp",
        "_b",
        F.coalesce(F.sum("_bs").over(wb), F.lit(0))
        .cast("bigint")
        .alias("_lower"),
        F.sum("_bs")
        .over(Window.partitionBy("grp"))
        .cast("bigint")
        .alias("tw"),
    )
    win = (
        Window.partitionBy("grp", "_b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = b.join(F.broadcast(bpre), ["grp", "_b"]).withColumn(
        "cw", (F.col("_lower") + F.sum("w").over(win)).cast("bigint")
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("grp")
        .agg(
            F.min("v").alias("weighted_median"),
            F.max("tw").alias("total_weight"),
        )
        .orderBy("grp")
    )


_SKEW_KEYS = (
    ("orders", "o_custkey"),
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("events", "user_id"),
)


def _skew_leg_sql(table: str, key: str) -> str:
    # entropy via the one-pass identity -SUM((c/n)ln(c/n)) = ln(n) - S/n
    # with S = SUM(c*ln(c)): n, S, max(c), count(*) are ONE aggregate over
    # the per-key counts -- no second scan for the total, no global window
    return f"""
      SELECT key_name, n_rows, n_distinct, max_key_rows,
             CAST(max_key_rows AS DOUBLE) / CAST(n_rows AS DOUBLE)
               AS top1_share,
             ln(CAST(n_rows AS DOUBLE))
               - CAST(s AS DOUBLE) / CAST(n_rows AS DOUBLE) AS entropy
      FROM (
        SELECT '{table}.{key}' AS key_name,
               CAST(sum(c) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(max(c) AS BIGINT) AS max_key_rows,
               sum(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
                        AS DECIMAL(38,12))) AS s
        FROM (SELECT CAST(count(*) AS BIGINT) AS c
              FROM {table} GROUP BY {key}) t0) t1"""


@declare(
    "dq_skew_report",
    sql=" UNION ALL ".join(
        _skew_leg_sql(t, k) for t, k in _SKEW_KEYS
    )
    + " ORDER BY key_name",
    tags=("dq", "skew", "join-planning", "beyond-parity"),
)
def dq_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew advisor: for each configured join key, the row
    count, distinct keys, the hottest key's row count and share, and the
    Shannon entropy of the key distribution — the numbers that decide
    salting / AQE-skew-join settings BEFORE a 100 TB join is launched
    (top1_share·n over shuffle-partition size ⇒ a straggler). Entropy is
    ONE pass via the identity −Σ(c/n)·ln(c/n) = ln(n) − Σ c·ln(c)/n:
    n, Σ c·ln(c), max(c) and the distinct count are a single aggregate
    over the per-key counts, so each table is scanned exactly ONCE (the
    naive c/n form needs n first — a second scan or a global window;
    measured: the crossJoin-total form scanned every table twice, no
    ReusedExchange under AQE). The Σ c·ln(c) terms are
    DECIMAL(38,12)-quantized before the exact decimal sum (the
    stat_chi_square discipline), so the report hash-matches the oracle.

    Scale: one hash aggregate per key (map-side partials), then O(1)
    frame math per leg — plan-asserted single FileScan per table leg."""
    legs = []
    for table, key in _SKEW_KEYS:
        counts = (
            load_table(spark, sf_dir, table)
            .groupBy(key)
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
        agg = counts.agg(
            F.lit(f"{table}.{key}").alias("key_name"),
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            F.max("c").alias("max_key_rows"),
            F.expr(
                """sum(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
                   AS DECIMAL(38,12)))"""
            ).alias("s"),
        )
        legs.append(
            agg.select(
                "key_name",
                "n_rows",
                "n_distinct",
                "max_key_rows",
                F.expr(
                    "CAST(max_key_rows AS DOUBLE) / CAST(n_rows AS DOUBLE)"
                ).alias("top1_share"),
                F.expr(
                    """ln(CAST(n_rows AS DOUBLE))
                       - CAST(s AS DOUBLE) / CAST(n_rows AS DOUBLE)"""
                ).alias("entropy"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("key_name")


@declare(
    "stat_ks_test",
    sql="""
    WITH ab AS (
      SELECT value AS v,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ca,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cb
      FROM events WHERE event_type IN ('view', 'click')
      GROUP BY value
    ), pre AS (
      SELECT v,
             CAST(sum(ca) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_a,
             CAST(sum(cb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_b,
             CAST(sum(ca) OVER () AS BIGINT) AS na,
             CAST(sum(cb) OVER () AS BIGINT) AS nb
      FROM ab
    ), s AS (
      SELECT max(abs(cum_a * nb - cum_b * na)) AS d_num,
             max(na) AS na, max(nb) AS nb
      FROM pre
    )
    SELECT na, nb, d_num,
           CAST(d_num AS DOUBLE)
             / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS d,
           1.358 * sqrt((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
                        / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
             AS crit_05,
           CAST(d_num AS DOUBLE)
             / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
           > 1.358 * sqrt((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
                          / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
             AS reject_05
    FROM s
    """,
    tags=("stats", "hypothesis-test", "ks", "drift", "beyond-parity"),
)
def stat_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between the 'view' and 'click'
    value distributions — the CDF-distance drift test (sensitive to ANY
    distributional difference, where rank-sum ``stat_mann_whitney``
    targets location shift; a monitoring stack runs both). The statistic
    is held exact: D·nₐ·n_b = max|cumₐ·n_b − cum_b·nₐ| over per-value
    cumulative counts — all BIGINT; D and the α=0.05 critical value
    (c(α)=1.358) are fixed IEEE chains, so the oracle matches exactly
    and the text is dialect-shared.

    Scale: per-value counts (one shuffle), then the same TWO-LEVEL
    prefix-sum the Mann-Whitney engine uses — INCLUSIVE local windows
    partitioned by value band, exclusive band prefix over the tiny band
    frame, totals from the band frame too; no global window touches the
    value set."""
    from pyspark.sql import Window

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click"))
        .select("event_type", F.col("value").alias("v"))
    )
    ab = e.groupBy("v").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("ca"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("cb"),
    ).persist()
    return ks_scan(ab)


def ks_scan(ab: DataFrame) -> DataFrame:
    """KS scoring stage over a value-grain count frame ``(v, ca, cb)`` —
    factored like ``anomaly_scores``/``cusum_scan`` so the streaming
    twin ``stream_ks_drift`` (linear counter maintenance) runs the
    identical two-level-prefix CDF distance and shares the oracle."""
    from pyspark.sql import Window

    b = ab.withColumn("_b", F.floor(F.col("v") / F.lit(25.0)))
    bs = b.groupBy("_b").agg(
        F.sum("ca").alias("_ba"), F.sum("cb").alias("_bb")
    )
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    wt = Window.orderBy("_b").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    bpre = bs.select(
        "_b",
        F.coalesce(F.sum("_ba").over(wb), F.lit(0))
        .cast("bigint")
        .alias("_la"),
        F.coalesce(F.sum("_bb").over(wb), F.lit(0))
        .cast("bigint")
        .alias("_lb"),
        F.sum("_ba").over(wt).cast("bigint").alias("na"),
        F.sum("_bb").over(wt).cast("bigint").alias("nb"),
    )
    win = (
        Window.partitionBy("_b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pre = b.join(F.broadcast(bpre), "_b").select(
        (F.col("_la") + F.sum("ca").over(win)).cast("bigint").alias("cum_a"),
        (F.col("_lb") + F.sum("cb").over(win)).cast("bigint").alias("cum_b"),
        "na",
        "nb",
    )
    s = pre.agg(
        F.max(
            F.abs(F.col("cum_a") * F.col("nb") - F.col("cum_b") * F.col("na"))
        ).alias("d_num"),
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
    )
    d = "CAST(d_num AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))"
    crit = (
        "1.358 * sqrt((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))"
        " / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))"
    )
    return s.select(
        "na",
        "nb",
        "d_num",
        F.expr(d).alias("d"),
        F.expr(crit).alias("crit_05"),
        F.expr(f"{d} > {crit}").alias("reject_05"),
    )


def _grouped_lower_median(df: DataFrame, band_width: float) -> DataFrame:
    """Exact lower median of ``v`` per ``grp`` — min v with 2·cum(v) ≥ n —
    via the two-level prefix (value-grain counts → band subtotals →
    grp-partitioned exclusive band prefix → (grp, band)-partitioned local
    window). The stat_weighted_median kernel at weight 1, factored for
    reuse (MAD needs it twice). Returns (grp, med)."""
    g = df.groupBy("grp", "v").agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    return _lower_median_from_counts(g, band_width)


def _lower_median_from_counts(g: DataFrame, band_width: float) -> DataFrame:
    """The `_grouped_lower_median` kernel over an ALREADY-counted
    value-grain frame (grp, v, w) — callers that need the counts frame
    for other aggregates too (stat_mad_outliers' closing outlier count)
    build it once, cut lineage, and feed both consumers."""
    from pyspark.sql import Window

    b = g.withColumn("_b", F.floor(F.col("v") / F.lit(band_width)))
    bs = b.groupBy("grp", "_b").agg(F.sum("w").alias("_bs"))
    wb = (
        Window.partitionBy("grp")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bpre = bs.select(
        "grp",
        "_b",
        F.coalesce(F.sum("_bs").over(wb), F.lit(0)).cast("bigint").alias("_lo"),
        F.sum("_bs").over(Window.partitionBy("grp")).cast("bigint").alias("_tw"),
    )
    win = (
        Window.partitionBy("grp", "_b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = b.join(F.broadcast(bpre), ["grp", "_b"]).withColumn(
        "_cw", (F.col("_lo") + F.sum("w").over(win)).cast("bigint")
    )
    return (
        cum.filter(2 * F.col("_cw") >= F.col("_tw"))
        .groupBy("grp")
        .agg(F.min("v").alias("med"))
    )


@declare(
    "stat_mad_outliers",
    sql="""
    WITH base AS (SELECT event_type AS grp, value AS v FROM events),
    cnt AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS w FROM base GROUP BY grp, v),
    cum AS (SELECT grp, v,
                   sum(w) OVER (PARTITION BY grp ORDER BY v) AS cw,
                   sum(w) OVER (PARTITION BY grp) AS tw FROM cnt),
    med AS (SELECT grp, min(v) AS med FROM cum WHERE 2*cw >= tw GROUP BY grp),
    dev AS (SELECT b.grp, abs(b.v - m.med) AS v
            FROM base b JOIN med m USING (grp)),
    dcnt AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS w FROM dev GROUP BY grp, v),
    dcum AS (SELECT grp, v,
                    sum(w) OVER (PARTITION BY grp ORDER BY v) AS cw,
                    sum(w) OVER (PARTITION BY grp) AS tw FROM dcnt),
    mad AS (SELECT grp, min(v) AS mad FROM dcum WHERE 2*cw >= tw GROUP BY grp)
    SELECT b.grp AS event_type, m.med, d.mad,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN abs(b.v - m.med) > 3 * d.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM base b JOIN med m USING (grp) JOIN mad d USING (grp)
    GROUP BY b.grp, m.med, d.mad
    ORDER BY event_type
    """,
    tags=("stats", "robust", "mad", "outliers", "beyond-parity"),
)
def stat_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: median + MAD (median
    absolute deviation) and the count of values beyond 3·MAD — the
    nonparametric complement of ``stat_zscore_outliers`` (mean/std are
    themselves dragged by the outliers they hunt; the median/MAD pair is
    50%-breakdown robust). Both medians are EXACT lower medians (min v
    with 2·cum ≥ n, integer compares over value-grain counts), the
    deviation |v − med| one IEEE op, so the oracle hashes bit-identically.

    Scale: the oracle's per-group cumulative windows sort whole groups;
    the engine runs the factored two-level prefix kernel twice — value
    bands then deviation bands — so no window partition ever holds a
    full group; the med/mad frames are group-cardinality and broadcast.

    Exactly TWO events passes (VERDICT r8 task #9 closed the third): the
    deviation value-grain counts (grp, |v−med|, w) are built once and
    lineage-cut — the MAD pass reads them through
    ``_lower_median_from_counts``, and the closing n_rows/n_outliers
    fold over the SAME tiny frame (Σw and Σw·[v > 3·mad]) instead of
    re-scanning events; the med frame is cut too, or its second consumer
    re-runs the median job as a hidden third pass (measured STANDALONE,
    warm session at sf0.1 best-of-3: 3.9 s with only dcnt cut → 2.37 s
    with both; r8's three-pass form was 3.2-4.0 s standalone. In the
    full bench run the same query reads ~3.3-3.5 s — cold-cache and
    cross-query scheduling overhead; the r8→r9 in-bench delta is ~1.0×,
    the win being the removed third scan). The remaining two passes are
    inherent: the MAD pass cannot start before the median exists."""
    from ..functions.dedup import cut_lineage

    base = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("grp"), F.col("value").alias("v")
    )
    # r12 optimization: ONE events pass total (was two). The value-grain
    # counts (grp, v, w) are built and lineage-cut first — the median
    # kernel reads them, and the deviation counts now DERIVE from them
    # (groupBy |v−med| re-keying the compact value grain, Σw-weighted)
    # instead of re-scanning and re-counting the raw table. Identical
    # deviation multiset, ~5.6× smaller input to the second kernel at
    # sf0.1, and the raw scan count drops to the theoretical minimum.
    vcnt = cut_lineage(
        base.groupBy("grp", "v").agg(
            F.count(F.lit(1)).cast("bigint").alias("w")
        )
    )
    # med is consumed twice (deviation build + final projection) across a
    # lineage cut — cut it too, or the second consumer re-runs the whole
    # median job as a hidden extra pass
    med = cut_lineage(_lower_median_from_counts(vcnt, band_width=25.0))
    dcnt = cut_lineage(
        vcnt.join(F.broadcast(med), "grp")
        .select("grp", F.abs(F.col("v") - F.col("med")).alias("v"), "w")
        .groupBy("grp", "v")
        .agg(F.sum("w").cast("bigint").alias("w"))
    )
    mad = _lower_median_from_counts(dcnt, band_width=25.0).withColumnRenamed(
        "med", "mad"
    )
    return (
        dcnt.join(F.broadcast(mad), "grp")
        .groupBy("grp", "mad")
        .agg(
            F.sum("w").cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("v") > 3 * F.col("mad"), F.col("w")).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .join(F.broadcast(med), "grp")
        .select(
            F.col("grp").alias("event_type"),
            "med",
            "mad",
            "n_rows",
            "n_outliers",
        )
        .orderBy("event_type")
    )


_VOL_Z = """CAST(n * k - sx AS DOUBLE)
             / (k * sqrt(CAST(k * sxx - sx * sx AS DOUBLE)
                         / (k * (k - 1))))"""


@declare(
    "dq_volume_anomaly",
    sql=f"""
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, day),
    w AS (
      SELECT event_type, day, n,
             CAST(count(*) OVER tr AS BIGINT) AS k,
             CAST(sum(n) OVER tr AS BIGINT) AS sx,
             CAST(sum(n * n) OVER tr AS BIGINT) AS sxx
      FROM d
      WINDOW tr AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
    SELECT event_type, day, n, k,
           CASE WHEN k >= 2 AND k * sxx > sx * sx
                THEN {_VOL_Z} END AS z,
           coalesce(k >= 2 AND k * sxx > sx * sx
                    AND abs({_VOL_Z}) > 2.0, FALSE) AS is_anomaly
    FROM w ORDER BY event_type, day
    """,
    tags=("data-quality", "anomaly", "window", "beyond-parity"),
)
def dq_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-volume anomaly monitor: per (event_type, day) the row count
    is z-scored against its OWN trailing 7-day window (mean/std from
    exact BIGINT Σx/Σx² over the frame — the ingest-gate "did yesterday's
    crawl drop 40%?" check, self-calibrating per stream). z is one fixed
    IEEE chain from four integers (n, k, Σx, Σx²), NULL until the window
    holds 2 points with variance; the flag fires at |z| > 2.

    Scale: one shuffle to the (type, day) grain — O(streams × days) rows
    — then per-stream trailing windows over the day grain (bounded
    partitions: one row per day per stream). The whole monitor reads one
    aggregate of the raw table; at 100 TB the day grain is ~10⁴ rows per
    stream regardless of volume."""
    from pyspark.sql import Window

    d = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return volume_scan(d)


def volume_scan(d: DataFrame) -> DataFrame:
    """The volume-anomaly scoring stage over a (event_type, day, n)
    counter table — factored (like auc_scan / ks_scan) so the streaming
    twin ``stream_volume_anomaly`` scores its MAINTAINED day-grain
    counters with the identical plan and shares this oracle."""
    from pyspark.sql import Window

    tr = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    w = d.select(
        "event_type",
        "day",
        "n",
        F.count(F.lit(1)).over(tr).cast("bigint").alias("k"),
        F.sum("n").over(tr).cast("bigint").alias("sx"),
        F.sum(F.col("n") * F.col("n")).over(tr).cast("bigint").alias("sxx"),
    )
    ok = (F.col("k") >= 2) & (F.col("k") * F.col("sxx") > F.col("sx") * F.col("sx"))
    return w.select(
        "event_type",
        "day",
        "n",
        "k",
        F.when(ok, F.expr(_VOL_Z)).alias("z"),
        F.coalesce(ok & (F.abs(F.expr(_VOL_Z)) > 2.0), F.lit(False)).alias(
            "is_anomaly"
        ),
    ).orderBy("event_type", "day")


# Benford first-digit expectation log10(1 + 1/d), precomputed to full
# double precision and embedded as the SAME literals in both engines —
# no runtime log10, so every χ² term is one shared IEEE chain.
_BENFORD_P = {
    1: "0.3010299956639812", 2: "0.17609125905568124",
    3: "0.12493873660829992", 4: "0.09691001300805642",
    5: "0.07918124604762482", 6: "0.06694678963061322",
    7: "0.05799194697768673", 8: "0.05115252244738129",
    9: "0.04575749056067514",
}
_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN CAST({p} AS DOUBLE)" for d, p in _BENFORD_P.items()
) + " END"
# chi-square critical value at dof = 8, alpha = 0.05 (literal, shared)
_BENFORD_CRIT = "15.50731305586545"


@declare(
    "stat_benford",
    sql=f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             CAST(count(*) AS BIGINT) AS n_obs
      FROM orders GROUP BY 1),
    tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM digits),
    terms AS (
      SELECT digit, n_obs, n, {_BENFORD_CASE} AS p,
             CAST(n AS DOUBLE) * ({_BENFORD_CASE}) AS expected_n,
             CAST(CAST((n_obs - CAST(n AS DOUBLE) * ({_BENFORD_CASE}))
                       * (n_obs - CAST(n AS DOUBLE) * ({_BENFORD_CASE}))
                       / (CAST(n AS DOUBLE) * ({_BENFORD_CASE}))
                       AS DECIMAL(28,12)) AS DOUBLE) AS chi2_term
      FROM digits CROSS JOIN tot),
    chi AS (
      SELECT CAST(sum(CAST(chi2_term AS DECIMAL(28,12))) AS DOUBLE) AS chi2
      FROM terms)
    SELECT digit, n_obs, p AS p_benford, expected_n, chi2_term,
           chi2, (chi2 > {_BENFORD_CRIT}) AS reject_benford_05
    FROM terms CROSS JOIN chi
    ORDER BY digit
    """,
    tags=("stats", "dq", "benford", "chi-square", "beyond-parity"),
)
def stat_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit of order totals — the
    classic financial-data-quality test (fabricated or clipped amounts
    break the log-uniform digit law). The digit comes from the BIGINT
    cents string (never from double formatting, which differs across
    engines); expectations log10(1+1/d) and the dof=8 critical value are
    shared literals; each χ² term is one IEEE chain quantized to
    DECIMAL(28,12) before the order-independent sum. NOTE: the fixture's
    uniform-ish totals genuinely FAIL Benford (reject=true) — the test
    reporting a real violation is the point.

    Scale: one hash aggregate to ≤9 digit rows (map-side partials);
    everything after is O(9) frame ops on the persisted digit frame —
    the orders table is scanned once and never shuffled at its volume."""
    o = load_table(spark, sf_dir, "orders")
    digits = (
        o.select(
            F.substring(
                F.round(F.col("o_totalprice") * 100)
                .cast("bigint")
                .cast("string"),
                1,
                1,
            )
            .cast("bigint")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    )
    # r12: the total and the chi² sum attach via GLOBAL windows over the
    # ≤9-row digit frame (two stacked windows, same exact sums) instead
    # of two rounds of persist + aggregate + broadcast crossJoin
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    p = F.expr(_BENFORD_CASE)
    expected = F.col("n").cast("double") * p
    term = (
        (F.col("n_obs") - expected) * (F.col("n_obs") - expected) / expected
    )
    terms = (
        digits.withColumn("n", F.sum("n_obs").over(w_all).cast("bigint"))
        .select(
            "digit",
            "n_obs",
            p.alias("p_benford"),
            expected.alias("expected_n"),
            term.cast("decimal(28,12)").cast("double").alias("chi2_term"),
        )
    )
    return (
        terms.withColumn(
            "chi2",
            F.sum(F.col("chi2_term").cast("decimal(28,12)"))
            .over(w_all)
            .cast("double"),
        )
        .select(
            "digit",
            "n_obs",
            "p_benford",
            "expected_n",
            "chi2_term",
            "chi2",
            (F.col("chi2") > F.lit(float(_BENFORD_CRIT))).alias(
                "reject_benford_05"
            ),
        )
        .orderBy("digit")
    )


def _attach_r2_ranks(
    df: DataFrame, col: str, width: float, out: str
) -> DataFrame:
    """Attach a column's tie-corrected DOUBLED average rank IN-ROW:
    r2 = 2·rows_below + ties + 1 — twice the fractional average rank,
    held as an exact BIGINT (average ranks are half-integers; the factor
    2 cancels in any scale-invariant statistic). rows_below = band_lower
    (grp-partitioned exclusive prefix over the tiny band frame) +
    (rows in band ≤ value via a RANGE frame) − ties; windows partition
    by (grp, band) so no partition exceeds one band's rows, and there is
    no value-grain aggregate or join back to the rows. This is THE
    kernel ``stat_spearman`` executes (the unit test targets it too —
    ADVICE r9 retired a parallel value-grain variant that only the test
    used)."""
    from pyspark.sql import Window

    b = df.withColumn("_b", F.floor(F.col(col) / F.lit(width)))
    bs = b.groupBy("grp", "_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("_bs")
    )
    wb = (
        Window.partitionBy("grp")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bpre = bs.select(
        "grp",
        "_b",
        F.coalesce(F.sum("_bs").over(wb), F.lit(0))
        .cast("bigint")
        .alias("_lo"),
    )
    w_le = (
        Window.partitionBy("grp", "_b")
        .orderBy(col)
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    w_tie = Window.partitionBy("grp", "_b", col)
    return (
        b.join(F.broadcast(bpre), ["grp", "_b"])
        .withColumn("_le", F.count(F.lit(1)).over(w_le))
        .withColumn("_t", F.count(F.lit(1)).over(w_tie))
        .withColumn(
            out,
            (
                2 * (F.col("_lo") + F.col("_le") - F.col("_t"))
                + F.col("_t")
                + 1
            ).cast("bigint"),
        )
        .drop("_b", "_bs", "_lo", "_le", "_t")
    )


@declare(
    "stat_spearman",
    sql="""
    WITH base AS (SELECT l_returnflag AS grp, l_quantity AS x,
                         l_extendedprice AS y FROM lineitem),
    cx AS (SELECT grp, x AS v, CAST(count(*) AS BIGINT) AS w
           FROM base GROUP BY 1, 2),
    rx AS (SELECT grp, v,
                  CAST(2 * (sum(w) OVER (PARTITION BY grp ORDER BY v) - w)
                       + w + 1 AS BIGINT) AS r2 FROM cx),
    cy AS (SELECT grp, y AS v, CAST(count(*) AS BIGINT) AS w
           FROM base GROUP BY 1, 2),
    ry AS (SELECT grp, v,
                  CAST(2 * (sum(w) OVER (PARTITION BY grp ORDER BY v) - w)
                       + w + 1 AS BIGINT) AS r2 FROM cy),
    rr AS (SELECT b.grp, rx.r2 AS ra, ry.r2 AS rb
           FROM base b
           JOIN rx ON rx.grp = b.grp AND rx.v = b.x
           JOIN ry ON ry.grp = b.grp AND ry.v = b.y),
    s AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(ra AS DECIMAL(38,0))) AS sx,
                 sum(CAST(rb AS DECIMAL(38,0))) AS sy,
                 sum(CAST(ra AS DECIMAL(38,0)) * rb) AS sxy,
                 sum(CAST(ra AS DECIMAL(38,0)) * ra) AS sxx,
                 sum(CAST(rb AS DECIMAL(38,0)) * rb) AS syy
          FROM rr GROUP BY grp)
    SELECT grp AS l_returnflag, n,
           CASE WHEN n * sxx > sx * sx AND n * syy > sy * sy
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * syy - sy * sy AS DOUBLE))
           END AS spearman_rho
    FROM s ORDER BY l_returnflag
    """,
    tags=("stats", "correlation", "rank", "spearman", "beyond-parity"),
)
def stat_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Spearman rank correlation between quantity and
    extended price per return flag — the robust (monotone, outlier-proof)
    complement to stat_corr_regression's Pearson r. Average ranks are
    held DOUBLED as exact BIGINTs (r2 = 2·cum_before + ties + 1 — always
    integral; the factor cancels in the scale-invariant ratio), so rho is
    Pearson on exact integers: every co-moment accumulates in
    DECIMAL(38,0) and the final value is one IEEE chain, NULL-guarded for
    degenerate groups. Exact through ties by construction — no sampling,
    no approximate rank. (DECIMAL(38) co-moment bound: fine to ~1e9 rows
    per group; pre-scale or per-partition-merge beyond, cf.
    stat_chi_square's note.)

    Scale: ranks attach IN-ROW via (grp, band)-partitioned windows
    (band-lower exclusive prefix over the tiny band frame + RANGE-frame
    ≤-count + tie count) — no value-grain aggregate, no join back to the
    rows, no partition wider than one band; one closing aggregate.
    The join-back formulation was A/B-measured slower (~4.4 s vs ~2.9 s
    STANDALONE warm at sf0.1; in-bench the query reads ~3.5-4.4 s —
    context per BENCHLOG) and replaced."""

    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )

    # r12 optimization, v2 (replaces the tranche-1 two-kernel + lineage-
    # cut form): x = l_quantity is DOMAIN-bounded (integral 1..50 in any
    # TPC-H-shaped corpus, ~50 distinct per group at ANY scale), so its
    # tie-corrected doubled rank is computed on the (grp, x) VALUE GRAIN
    # — a map-side-partial aggregate to ~150 rows, a grp-partitioned
    # cumulative window over that tiny frame (r2 = 2·cum_before + w + 1,
    # the same exact integers the band kernel produces), and a broadcast
    # attach. Only y = l_extendedprice (unbounded value domain) still
    # needs the band-partitioned in-row kernel. This drops one full-row
    # (grp, band) exchange + two row-grain windows + the checkpoint
    # write/read of the whole x-ranked frame; the broadcast attach joins
    # AFTER y's kernel, so the kernel's two internal branches replay
    # only the slim base scan. Hash-identical (exact integer ranks both
    # ways); A/B in OPTIMIZATION_r12.md tranche 6.
    from pyspark.sql.window import Window as _W

    cum = _W.partitionBy("grp").orderBy("x").rowsBetween(
        _W.unboundedPreceding, 0
    )
    rx = (
        base.groupBy("grp", "x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_w"))
        .select(
            "grp",
            "x",
            (
                2 * F.sum("_w").over(cum) - F.col("_w") + 1
            ).cast("bigint").alias("ra"),
        )
    )
    rr = _attach_r2_ranks(base, "y", 5000.0, "rb").join(
        F.broadcast(rx), ["grp", "x"]
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = rr.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec("ra")).alias("sx"),
        F.sum(dec("rb")).alias("sy"),
        F.sum(dec("ra") * F.col("rb")).alias("sxy"),
        F.sum(dec("ra") * F.col("ra")).alias("sxx"),
        F.sum(dec("rb") * F.col("rb")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    d1 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    d2 = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    rho = F.when(
        (d1 > 0) & (d2 > 0),
        num.cast("double")
        / F.sqrt(d1.cast("double") * d2.cast("double")),
    )
    return s.select(
        F.col("grp").alias("l_returnflag"), "n", rho.alias("spearman_rho")
    ).orderBy("l_returnflag")


@declare(
    "stat_gini",
    sql="""
    WITH rev AS (
      SELECT c.c_nationkey AS nk,
             o.o_custkey AS ck,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2),
    ranked AS (
      SELECT nk, cents,
             row_number() OVER (PARTITION BY nk
                                ORDER BY cents, ck) AS r
      FROM rev),
    s AS (
      SELECT nk, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS tot,
             sum(CAST(r AS DECIMAL(38,0)) * cents) AS rx
      FROM ranked GROUP BY nk)
    SELECT n_name AS nation, n AS n_customers, tot AS total_cents,
           CASE WHEN tot > 0 AND n > 1
                THEN CAST(2 * rx - (n + 1) * CAST(tot AS DECIMAL(38,0))
                          AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE))
           END AS gini
    FROM s JOIN nation ON n_nationkey = nk
    ORDER BY nation
    """,
    tags=("stats", "gini", "concentration", "beyond-parity"),
)
def stat_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer-revenue concentration per nation —
    the inequality/concentration measure behind 'is our revenue
    dangerously top-heavy here?' (0 = uniform, →1 = one whale). Computed
    from the rank form G = (2·Σ rᵢxᵢ − (n+1)·Σx)/(n·Σx) with a TOTAL
    order (cents, custkey — revenue held as exact BIGINT cents), so the
    rank-weighted sum accumulates in DECIMAL(38,0) and the coefficient
    is one NULL-guarded IEEE division.

    Scale: revenue aggregates to customer grain first; ranks attach via
    the in-row two-level structure (stat_spearman's band machinery:
    exclusive band prefix over the tiny (nation, band) frame +
    band-partitioned local row_number) — no per-nation full-customer
    window; the oracle uses the plain per-nation window (single-task
    fine for DuckDB)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        o.groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
        .join(c, F.col("ck") == F.col("c_custkey"))
        .select(F.col("c_nationkey").alias("nk"), "ck", "cents")
    )
    b = rev.withColumn("_b", F.floor(F.col("cents") / F.lit(5000000.0)))
    bs = b.groupBy("nk", "_b").agg(F.count(F.lit(1)).cast("bigint").alias("_bs"))
    wb = (
        Window.partitionBy("nk")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bpre = bs.select(
        "nk",
        "_b",
        F.coalesce(F.sum("_bs").over(wb), F.lit(0)).cast("bigint").alias("_lo"),
    )
    wl = Window.partitionBy("nk", "_b").orderBy("cents", "ck")
    ranked = b.join(F.broadcast(bpre), ["nk", "_b"]).select(
        "nk",
        "cents",
        (F.col("_lo") + F.row_number().over(wl)).cast("bigint").alias("r"),
    )
    s = ranked.groupBy("nk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("tot"),
        F.sum(F.col("r").cast("decimal(38,0)") * F.col("cents")).alias("rx"),
    )
    gini = F.when(
        (F.col("tot") > 0) & (F.col("n") > 1),
        (
            2 * F.col("rx")
            - (F.col("n") + 1) * F.col("tot").cast("decimal(38,0)")
        ).cast("double")
        / (F.col("n").cast("double") * F.col("tot").cast("double")),
    )
    return (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("nk"))
        .select(
            F.col("n_name").alias("nation"),
            F.col("n").alias("n_customers"),
            F.col("tot").alias("total_cents"),
            gini.alias("gini"),
        )
        .orderBy("nation")
    )


@declare(
    "stat_trimmed_mean",
    sql="""
    WITH g AS (
      SELECT o_orderpriority AS grp,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(count(*) AS BIGINT) AS w
      FROM orders GROUP BY 1, 2),
    c AS (
      SELECT grp, cents, w,
             CAST(coalesce(sum(w) OVER (PARTITION BY grp ORDER BY cents
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cum
      FROM g),
    nf AS (SELECT grp, CAST(sum(w) AS BIGINT) AS n FROM g GROUP BY grp),
    t AS (
      SELECT c.grp, c.cents, nf.n,
             CAST(floor(nf.n / 10.0) AS BIGINT) AS lo,
             greatest(0, least(c.cum + c.w, nf.n - CAST(floor(nf.n / 10.0) AS BIGINT))
                         - greatest(c.cum, CAST(floor(nf.n / 10.0) AS BIGINT))) AS k
      FROM c JOIN nf ON c.grp = nf.grp),
    s AS (
      SELECT grp, n, lo,
             CAST(sum(k * cents) AS DECIMAL(38,0)) AS tsum,
             CAST(sum(k) AS BIGINT) AS tn
      FROM t GROUP BY grp, n, lo)
    SELECT grp AS o_orderpriority, n AS n_orders, tn AS n_kept,
           CAST(tsum AS DOUBLE) / tn AS trimmed_mean_cents
    FROM s ORDER BY o_orderpriority
    """,
    tags=("stats", "robust", "beyond-parity"),
)
def stat_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% two-sided TRIMMED mean of order value per priority class —
    the robust location estimate (drop the cheapest and priciest decile
    by COUNT, average the middle 80%) that whale orders cannot drag the
    way they drag AVG. Trimming is rank-exact over value-grain counts:
    with cum = rows strictly below a value, a value row contributes
    k = max(0, min(cum+w, n−lo) − max(cum, lo)) rows to the kept band
    [lo, n−lo) where lo = floor(n/10) — boundary values contribute
    PARTIALLY, exactly as rank-trimming prescribes, and ties are handled
    without any per-row ranking. Sum is exact BIGINT cents → DECIMAL;
    the mean is one IEEE division, so the report hashes bit-identically.

    Scale: the oracle's per-group cumulative window sorts whole groups
    (fine for DuckDB); the engine runs the two-level band prefix
    (value-grain counts → 50k$-band subtotals → grp-partitioned
    exclusive band prefix over the tiny band frame → (grp, band)-local
    prefix) — the stat_weighted_median kernel — so no window partition
    ever holds a full group."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    # r12: examined for the shared-branch replay pattern (three branches
    # re-derive these value-grain counts) and A/B-measured BOTH sharing
    # forms SLOWER here at sf0.1 (no-share 1.28 s vs localCheckpoint
    # 1.58 s vs persist 2.36 s best-of-5): the replayed subtree is one
    # orders scan + partial-aggregated (grp, cents) count — cheap enough
    # that materialization overhead dominates. Left as-is deliberately.
    g = o.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    b = g.withColumn("_b", F.floor(F.col("cents") / F.lit(5_000_000.0)))
    bs = b.groupBy("grp", "_b").agg(F.sum("w").alias("_bs"))
    wb = (
        Window.partitionBy("grp")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # n (per-group total) rides the SAME tiny band frame as the exclusive
    # band prefix (r13): sum(_bs) over the whole grp partition equals
    # nf's sum(w) exactly (same integers, regrouped), so the third
    # orders-scan replay and its separate broadcast join are gone —
    # one band subtree now carries (_lo, n) to the value-grain rows.
    wn = Window.partitionBy("grp")
    bpre = bs.select(
        "grp",
        "_b",
        F.coalesce(F.sum("_bs").over(wb), F.lit(0)).cast("bigint").alias("_lo"),
        F.sum("_bs").over(wn).cast("bigint").alias("n"),
    )
    wl = (
        Window.partitionBy("grp", "_b")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = (
        b.join(F.broadcast(bpre), ["grp", "_b"])
        .withColumn(
            "cum",
            (
                F.col("_lo") + F.coalesce(F.sum("w").over(wl), F.lit(0))
            ).cast("bigint"),
        )
    )
    lo = F.floor(F.col("n") / F.lit(10.0)).cast("bigint")
    t = c.select(
        "grp",
        "cents",
        "n",
        lo.alias("lo"),
        F.greatest(
            F.lit(0),
            F.least(F.col("cum") + F.col("w"), F.col("n") - lo)
            - F.greatest(F.col("cum"), lo),
        ).alias("k"),
    )
    return (
        t.groupBy("grp", "n", "lo")
        .agg(
            F.sum(F.col("k") * F.col("cents"))
            .cast("decimal(38,0)")
            .alias("tsum"),
            F.sum("k").cast("bigint").alias("tn"),
        )
        .select(
            F.col("grp").alias("o_orderpriority"),
            F.col("n").alias("n_orders"),
            F.col("tn").alias("n_kept"),
            (F.col("tsum").cast("double") / F.col("tn")).alias(
                "trimmed_mean_cents"
            ),
        )
        .orderBy("o_orderpriority")
    )


@declare(
    "stat_welch_t",
    sql="""
    WITH lab AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp,
             CAST(value AS DECIMAL(18,6)) AS v
      FROM events WHERE event_type IN ('purchase', 'view')),
    s AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS DECIMAL(38,6)) AS sv,
             CAST(sum(CAST(v * v AS DECIMAL(38,12))) AS DECIMAL(38,12))
               AS svv
      FROM lab GROUP BY grp),
    m AS (
      SELECT grp, n,
             CAST(sv AS DOUBLE) / n AS mean,
             (CAST(svv AS DOUBLE)
              - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / n)
             / (n - 1) AS var
      FROM s),
    w AS (
      SELECT a.n AS n1, b.n AS n2, a.mean AS m1, b.mean AS m2,
             a.var AS v1, b.var AS v2,
             a.var / a.n + b.var / b.n AS se2
      FROM m a JOIN m b ON a.grp = 1 AND b.grp = 0)
    SELECT n1, n2, m1 AS mean_purchase, m2 AS mean_view,
           m1 - m2 AS mean_diff,
           (m1 - m2) / sqrt(se2) AS t_stat,
           se2 * se2 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                        + (v2 / n2) * (v2 / n2) / (n2 - 1)) AS welch_df
    FROM w
    """,
    tags=("stats", "hypothesis-test", "welch-t", "beyond-parity"),
)
def stat_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test: does purchase spend differ from
    view spend in mean? The parametric complement to stat_mann_whitney
    (rank-based) — Welch's form drops Student's equal-variance
    assumption, the robust default (scipy's equal_var=False). The
    per-group moment sums are EXACT: values quantize to DECIMAL(18,6),
    squares to DECIMAL(38,12), both summed as decimals (order-
    independent, map-side partials); mean, sample variance (the
    numerically-stable sum-of-squares-minus-square-of-sum form over
    exact decimal sums, NOT a streaming float recurrence), t, and the
    Welch–Satterthwaite df are one fixed IEEE chain at the end, so the
    oracle hashes bit-identically.

    Scale: one hash aggregate to 2 group rows — no shuffle at row
    grain, no window; the same shape at any SF."""
    e = load_table(spark, sf_dir, "events")
    lab = e.filter(F.col("event_type").isin("purchase", "view")).select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("grp"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    s = lab.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("decimal(38,6)").alias("sv"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,12)"))
        .cast("decimal(38,12)")
        .alias("svv"),
    )
    m = s.select(
        "grp",
        "n",
        (F.col("sv").cast("double") / F.col("n")).alias("mean"),
        (
            (
                F.col("svv").cast("double")
                - F.col("sv").cast("double")
                * F.col("sv").cast("double")
                / F.col("n")
            )
            / (F.col("n") - 1)
        ).alias("var"),
    )
    a = m.filter(F.col("grp") == 1).select(
        F.col("n").alias("n1"), F.col("mean").alias("m1"),
        F.col("var").alias("v1"),
    )
    b = m.filter(F.col("grp") == 0).select(
        F.col("n").alias("n2"), F.col("mean").alias("m2"),
        F.col("var").alias("v2"),
    )
    w = a.crossJoin(F.broadcast(b)).withColumn(
        "se2", F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    )
    return w.select(
        "n1",
        "n2",
        F.col("m1").alias("mean_purchase"),
        F.col("m2").alias("mean_view"),
        (F.col("m1") - F.col("m2")).alias("mean_diff"),
        ((F.col("m1") - F.col("m2")) / F.sqrt(F.col("se2"))).alias("t_stat"),
        (
            F.col("se2")
            * F.col("se2")
            / (
                (F.col("v1") / F.col("n1"))
                * (F.col("v1") / F.col("n1"))
                / (F.col("n1") - 1)
                + (F.col("v2") / F.col("n2"))
                * (F.col("v2") / F.col("n2"))
                / (F.col("n2") - 1)
            )
        ).alias("welch_df"),
    )


# Poisson(1) CDF as 60-bit hex thresholds (15 md5 hex chars): a row's
# bootstrap weight in replicate b = #{k : md5_prefix >= TH[k]} — the
# inverse-CDF draw with the repo's RNG-free md5 uniform, restated as a
# pure STRING comparison (md5 hex is lexicographically ordered by its
# numeric value), so both engines compute the identical weight without
# any hex->int conversion. Truncated at weight 9 (P ~ 1e-7 per draw).
_POIS1_HEX = (
    "5e2d58d8b3bce00", "bc5ab1b16779c00", "eb715e1dc158300",
    "fb23979734a2580", "ff1025f59174e00", "ffd90f3ba405600",
    "fffa8b71fc72c80", "ffff540c0914b00", "ffffed1f4aa8f00",
)
_B_REPS = 32


def _explode_parts(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    fanout: int,
    rows_per_task: int = 250_000,
) -> int:
    """Pre-explode partition count sized to the DATA, not a constant
    (VERDICT r11 #1): the input row estimate comes free from the parquet
    footer (``storage/stats.footer_min_max_count`` — zero data read, no
    Spark job), times the explode fanout, over a per-task exploded-row
    budget. Floor = defaultParallelism (tiny inputs still use the full
    cluster width); cap = 8× (the old static value: correct at 25×
    volume where the GC cliff was measured, but at sf0.1 a fixed
    256-way shuffle of a 20k-row frame was 3× wall in pure scheduling
    overhead). Footer-less storage falls back to the static cap — the
    conservative end, never the under-partitioned one."""
    import os

    from pixels_spark.storage.stats import footer_min_max_count

    dp = spark.sparkContext.defaultParallelism
    try:
        n = footer_min_max_count(
            os.path.join(sf_dir, f"{table}.parquet"), ["event_id"]
        )["event_id"]["count"]
    except Exception:
        return dp * 8
    want = -(-(n * fanout) // rows_per_task)
    return max(dp, min(dp * 8, want))


def _pois_weight_sql(h: str) -> str:
    return " + ".join(f"(CASE WHEN {h} >= '{t}' THEN 1 ELSE 0 END)"
                      for t in _POIS1_HEX)


@declare(
    "stat_bootstrap_ci",
    sql=f"""
    WITH lab AS (
      SELECT event_id, CAST(value AS DECIMAL(18,6)) AS v
      FROM events WHERE event_type = 'purchase'),
    reps AS (
      SELECT lab.v, r.b,
             {_pois_weight_sql("substring(md5(CAST(lab.event_id AS VARCHAR) "
                               "|| ':' || CAST(r.b AS VARCHAR)), 1, 15)")} AS w
      FROM lab CROSS JOIN (SELECT CAST(range AS BIGINT) AS b
                           FROM range({_B_REPS})) r),
    rmeans AS (
      SELECT b, CAST(sum(w * v) AS DOUBLE) / sum(w) AS m
      FROM reps GROUP BY b HAVING sum(w) > 0),
    base AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS DOUBLE) / count(*) AS mean FROM lab)
    SELECT base.n, CAST({_B_REPS} AS BIGINT) AS n_replicates, base.mean,
           quantile_cont(rmeans.m, 0.025) AS ci_lo,
           quantile_cont(rmeans.m, 0.975) AS ci_hi
    FROM rmeans CROSS JOIN base
    GROUP BY base.n, base.mean
    """,
    tags=("stats", "bootstrap", "confidence-interval", "beyond-parity"),
)
def stat_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% CI for mean purchase value — THE bootstrap
    that scales: classical resampling needs n draws per replicate
    coordinated globally, but Poisson(1) weights are drawn per (row,
    replicate) independently (the sum of weights concentrates at n), so
    every replicate is one weighted mean computed map-side in a single
    pass. Weights are RNG-free: the md5(event_id:b) 60-bit prefix is the
    uniform draw, inverted through the Poisson(1) CDF as a string
    comparison against 9 hex thresholds — deterministic, replayable, and
    dialect-shared verbatim. Replicate means (32) feed the percentile
    CI (exact interpolated quantiles, Spark percentile ≡ DuckDB
    quantile_cont at the same (n-1)q definition).

    Scale: rows × 32 replicates expand INSIDE the executor (explode of
    a literal sequence — no shuffle at expanded grain; map-side partial
    aggregation folds each replicate's weighted sum before the 32-group
    exchange). State after the fold is 32 rows. At 100 TB the expansion
    factor is the only knob: B=32 keeps the pass at 32× map work, zero
    extra scans; the weight-column (un-exploded, B aggregates in one
    projection) variant trades plan width for fanout if 32× map volume
    ever binds."""
    e = load_table(spark, sf_dir, "events")
    lab = e.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("value").cast("decimal(18,6)").alias("v")
    )
    # bound per-task explode volume (the stat_permutation_test rule):
    # 32x inflation happens after partitioning, so pre-spread the slim
    # projection before the explode — width adaptive to footer row count
    reps = lab.repartition(
        _explode_parts(spark, sf_dir, "events", _B_REPS)
    ).select(
        "v",
        F.explode(F.sequence(F.lit(0), F.lit(_B_REPS - 1))).alias("b"),
        "event_id",
    ).select(
        "v",
        "b",
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("event_id").cast("string"),
                    F.col("b").cast("string"),
                )
            ),
            1,
            15,
        ).alias("h"),
    )
    w = None
    for t in _POIS1_HEX:
        term = F.when(F.col("h") >= F.lit(t), 1).otherwise(0)
        w = term if w is None else w + term
    rmeans = (
        reps.select("v", "b", w.alias("w"))
        .groupBy("b")
        .agg(
            (F.sum(F.col("w") * F.col("v")).cast("double") / F.sum("w")).alias(
                "m"
            ),
            F.sum("w").alias("_tw"),
        )
        .filter(F.col("_tw") > 0)
        .select("b", "m")
    )
    base = lab.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("mean"),
    )
    return (
        rmeans.crossJoin(F.broadcast(base))
        .groupBy("n", "mean")
        .agg(
            F.lit(_B_REPS).cast("bigint").alias("n_replicates"),
            F.expr("percentile(m, 0.025)").alias("ci_lo"),
            F.expr("percentile(m, 0.975)").alias("ci_hi"),
        )
        .select("n", "n_replicates", "mean", "ci_lo", "ci_hi")
    )


@declare(
    "stat_permutation_test",
    sql=f"""
    WITH lab AS (
      SELECT event_id, CAST(value AS DECIMAL(18,6)) AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE event_type IN ('purchase', 'view')),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(y) AS BIGINT) AS n1,
                   CAST((CAST(sum(y) AS BIGINT) * 4294967296 - 1)
                        // CAST(count(*) AS BIGINT) AS BIGINT) AS thr
            FROM lab),
    obs AS (
      SELECT CAST(sum(v * y) AS DOUBLE) / sum(y)
             - CAST(sum(v * (1 - y)) AS DOUBLE) / sum(1 - y) AS d
      FROM lab),
    reps AS (
      SELECT r.b, lab.v,
             CASE WHEN CAST(concat('0x', substr(md5(
                      CAST(lab.event_id AS VARCHAR) || ':p:'
                      || CAST(r.b AS VARCHAR)), 1, 8)) AS BIGINT)
                  <= tot.thr
             THEN 1 ELSE 0 END AS g
      FROM lab CROSS JOIN tot
           CROSS JOIN (SELECT CAST(range AS BIGINT) AS b
                       FROM range({_B_REPS})) r),
    rdiff AS (
      SELECT b,
             CAST(sum(CASE WHEN g = 1 THEN v END) AS DOUBLE) / sum(g)
             - CAST(sum(CASE WHEN g = 0 THEN v END) AS DOUBLE)
               / sum(1 - g) AS d
      FROM reps GROUP BY b
      HAVING sum(g) > 0 AND sum(1 - g) > 0)
    SELECT tot.n, tot.n1 AS n_purchase, obs.d AS obs_diff,
           CAST(count(*) AS BIGINT) AS n_replicates,
           CAST(sum(CASE WHEN abs(rdiff.d) >= abs(obs.d)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
           CAST(1 + sum(CASE WHEN abs(rdiff.d) >= abs(obs.d)
                             THEN 1 ELSE 0 END) AS DOUBLE)
             / (1 + count(*)) AS p_value
    FROM rdiff CROSS JOIN tot CROSS JOIN obs
    GROUP BY tot.n, tot.n1, obs.d
    """,
    tags=("stats", "hypothesis-test", "permutation", "beyond-parity"),
)
def stat_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization (approximate permutation) test for the purchase-vs-
    view mean-spend difference — the assumption-free complement to
    stat_welch_t (no normality, no variance model: under H0 the labels
    are exchangeable, so the observed diff is compared to the diff
    distribution under 32 random relabelings). Relabelings are RNG-free:
    replicate b assigns a row to the pseudo-purchase group iff its md5
    32-bit prefix <= thr, with thr = ⌊(n1·2^32 − 1)/n⌋ computed ONCE in
    the 1-row tot frame by exact bigint floor division (equivalent to
    val·n < n1·2^32 for every val; valid for n1 < 2^31 positive rows —
    past that, restore the per-row DECIMAL cross-multiply) — the
    group-kfold md5 convention, so both engines draw identical labels
    and the two-sided add-one p-value (1 + #extreme)/(1 + B) replays
    exactly. Replicates that degenerate to one empty group are excluded
    by the HAVING on both engines.

    Scale: rows × 32 expand INSIDE the executor (explode of a literal
    sequence — the stat_bootstrap_ci shape) AFTER a repartition that
    bounds per-task explode volume; the per-row hot path is one md5 +
    one bigint compare (the 25× probe read the original per-row DECIMAL
    multiply + decimal-product sums at 28-60× wall with 3× run-to-run
    swings — integer compare + CASE-gated decimal sums cut the per-row
    constant); map-side partials fold each replicate's decimal sums
    before the 32-group exchange; state after the fold is 32 rows."""
    e = load_table(spark, sf_dir, "events")
    lab = e.filter(F.col("event_type").isin("purchase", "view")).select(
        "event_id",
        F.col("value").cast("decimal(18,6)").alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    tot = lab.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n1"),
    ).withColumn(
        "thr",
        F.expr("(n1 * 4294967296 - 1) div n").cast("bigint"),
    )
    obs = lab.agg(
        (
            F.sum(F.col("v") * F.col("y")).cast("double") / F.sum("y")
            - F.sum(F.col("v") * (1 - F.col("y"))).cast("double")
            / F.sum(1 - F.col("y"))
        ).alias("d")
    )
    val = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("event_id").cast("string"),
                    F.lit("p"),
                    F.col("b").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    # Bound per-task explode volume: the 32× row inflation happens AFTER
    # partitioning, so input partitions sized for normal scans become
    # 32×-oversized exploded stages (GC cliff measured at 25× volume:
    # 59.9× wall; with this repartition the stage is linear again). The
    # slim (event_id, v) projection is what shuffles — cheap at any SF —
    # with width adaptive to the footer row count (VERDICT r11 #1: the
    # static 8×-defaultParallelism was scheduling-bound at sf0.1).
    n_parts = _explode_parts(spark, sf_dir, "events", _B_REPS)
    reps = (
        lab.repartition(n_parts)
        .crossJoin(F.broadcast(tot))
        .select(
            "v",
            "event_id",
            "thr",
            F.explode(F.sequence(F.lit(0), F.lit(_B_REPS - 1))).alias("b"),
        )
        .select(
            "b",
            "v",
            F.when(val <= F.col("thr"), 1).otherwise(0).alias("g"),
        )
    )
    rdiff = (
        reps.groupBy("b")
        .agg(
            (
                F.sum(F.when(F.col("g") == 1, F.col("v"))).cast("double")
                / F.sum("g")
                - F.sum(F.when(F.col("g") == 0, F.col("v"))).cast("double")
                / F.sum(1 - F.col("g"))
            ).alias("d"),
            F.sum("g").alias("_ng"),
            F.sum(1 - F.col("g")).alias("_nn"),
        )
        .filter((F.col("_ng") > 0) & (F.col("_nn") > 0))
        .select("b", "d")
    )
    return (
        rdiff.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(obs.select(F.col("d").alias("_od"))))
        .groupBy("n", "n1", "_od")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_replicates"),
            F.sum(
                F.when(F.abs(F.col("d")) >= F.abs(F.col("_od")), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_extreme"),
        )
        .select(
            "n",
            F.col("n1").alias("n_purchase"),
            F.col("_od").alias("obs_diff"),
            "n_replicates",
            "n_extreme",
            (
                (1 + F.col("n_extreme")).cast("double")
                / (1 + F.col("n_replicates"))
            ).alias("p_value"),
        )
    )


_KW_H = """(((12.0 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)))
   * (CAST(two_r1 AS DOUBLE) * CAST(two_r1 AS DOUBLE)
        / (4.0 * CAST(n1 AS DOUBLE))
      + CAST(two_r2 AS DOUBLE) * CAST(two_r2 AS DOUBLE)
        / (4.0 * CAST(n2 AS DOUBLE))
      + CAST(two_r3 AS DOUBLE) * CAST(two_r3 AS DOUBLE)
        / (4.0 * CAST(n3 AS DOUBLE)))
   - 3.0 * CAST(n + 1 AS DOUBLE))
  / (1.0 - CAST(tie_t AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
              - CAST(n AS DOUBLE))))"""


@declare(
    "stat_kruskal_wallis",
    sql=f"""
    WITH pv AS (
      SELECT value AS v,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c1,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c2,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c3,
             CAST(count(*) AS BIGINT) AS t
      FROM events WHERE event_type IN ('view', 'click', 'purchase')
      GROUP BY value
    ), pre AS (
      SELECT v, c1, c2, c3, t,
             CAST(coalesce(sum(t) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) AS less
      FROM pv
    ), s AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c2) AS BIGINT) AS n2,
             CAST(sum(c3) AS BIGINT) AS n3,
             CAST(sum(c1 * (2 * less + t + 1)) AS BIGINT) AS two_r1,
             CAST(sum(c2 * (2 * less + t + 1)) AS BIGINT) AS two_r2,
             CAST(sum(c3 * (2 * less + t + 1)) AS BIGINT) AS two_r3,
             CAST(sum(t) AS BIGINT) AS n,
             CAST(sum(t * t * t - t) AS BIGINT) AS tie_t
      FROM pre
    )
    SELECT n1, n2, n3, two_r1, two_r2, two_r3, n, tie_t, {_KW_H} AS h
    FROM s
    """,
    tags=("stats", "hypothesis-test", "rank-sum", "k-sample",
          "beyond-parity"),
)
def stat_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test across the view / click / purchase value
    distributions — the k-sample extension of stat_mann_whitney (did ANY
    of k corpus slices drift, one test instead of k² pairwise). The rank
    sums are held exact: average tied rank = less + (t+1)/2, so
    2·R_g = Σ c_g(v)·(2·less(v) + t(v) + 1) stays BIGINT; H with the
    tie-correction divisor 1 − Σ(t³−t)/(n³−n) is one fixed chain of IEEE
    ops from those integers (dialect-shared text), so the oracle matches
    exactly.

    Scale: identical plan shape to stat_mann_whitney — per-value counts
    (ONE events shuffle), then the two-level prefix sum (tiny bucket
    frame broadcast + bucket-partitioned window) instead of the oracle's
    single global window; the closing aggregate is map-side. 2·R_g is
    O(n²) in the worst case — past ~2³¹ rows per group, pre-bucket
    values (the MWU tie_t caveat) before the BIGINT form overflows."""
    from pyspark.sql import Window

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("event_type", F.col("value").alias("v"))
    )
    pv = e.groupBy("v").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("c1"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("c2"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("c3"),
        F.count(F.lit(1)).cast("bigint").alias("t"),
    ).persist()
    b = pv.withColumn("_b", F.floor(F.col("v") / F.lit(25.0)))
    bsum = b.groupBy("_b").agg(F.sum("t").alias("_bs"))
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    bpre = bsum.select(
        "_b",
        F.coalesce(F.sum("_bs").over(wb), F.lit(0)).cast("bigint").alias("_lower"),
    )
    win = (
        Window.partitionBy("_b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = b.join(F.broadcast(bpre), "_b").withColumn(
        "less",
        (F.col("_lower") + F.coalesce(F.sum("t").over(win), F.lit(0))).cast(
            "bigint"
        ),
    )
    rank2 = 2 * F.col("less") + F.col("t") + 1
    s = pre.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum("c3").cast("bigint").alias("n3"),
        F.sum(F.col("c1") * rank2).cast("bigint").alias("two_r1"),
        F.sum(F.col("c2") * rank2).cast("bigint").alias("two_r2"),
        F.sum(F.col("c3") * rank2).cast("bigint").alias("two_r3"),
        F.sum("t").cast("bigint").alias("n"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie_t"),
    )
    return s.select(
        "n1", "n2", "n3", "two_r1", "two_r2", "two_r3", "n", "tie_t",
        F.expr(_KW_H).alias("h"),
    )


# Welch z from decimal sums (the _dsum order-independence pattern):
# var_g = (ss_g - s_g^2/n_g) / (n_g - 1), z = (m1 - m2)/sqrt(v1/n1+v2/n2)
_BH_Z = """((s1 / CAST(cn1 AS DOUBLE) - s2 / CAST(cn2 AS DOUBLE))
  / sqrt(((ss1 - s1 * s1 / CAST(cn1 AS DOUBLE)) / CAST(cn1 - 1 AS DOUBLE))
           / CAST(cn1 AS DOUBLE)
         + ((ss2 - s2 * s2 / CAST(cn2 AS DOUBLE)) / CAST(cn2 - 1 AS DOUBLE))
           / CAST(cn2 AS DOUBLE)))"""
# two-sided normal p = 1 - erf(|z|/sqrt(2)) via Abramowitz-Stegun 7.1.26
# (|err| < 1.5e-7); the SAME expression text runs on both engines, so
# the approximation is bit-identical — the _MWU_Z convention
_BH_T = "(1.0 / (1.0 + 0.3275911 * abs(z) / sqrt(2.0)))"
_BH_P = """((((((1.061405429 * _t - 1.453152027) * _t + 1.421413741) * _t
   - 0.284496736) * _t + 0.254829592) * _t) * exp(-(z * z) / 2.0))"""


@declare(
    "stat_bh_fdr",
    sql=f"""
    WITH day_sums AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
                  AS BIGINT) AS cn1,
             CAST(count(CASE WHEN event_type = 'view' THEN 1 END)
                  AS BIGINT) AS cn2,
             CAST(sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS s1,
             CAST(sum(CASE WHEN event_type = 'view'
                      THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS s2,
             CAST(sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(CAST(value AS DECIMAL(18,6))
                           * CAST(value AS DECIMAL(18,6)) AS DECIMAL(28,12))
                      END) AS DOUBLE) AS ss1,
             CAST(sum(CASE WHEN event_type = 'view'
                      THEN CAST(CAST(value AS DECIMAL(18,6))
                           * CAST(value AS DECIMAL(18,6)) AS DECIMAL(28,12))
                      END) AS DOUBLE) AS ss2
      FROM events WHERE event_type IN ('purchase', 'view')
      GROUP BY CAST(ts AS DATE)
      HAVING count(CASE WHEN event_type = 'purchase' THEN 1 END) >= 2
         AND count(CASE WHEN event_type = 'view' THEN 1 END) >= 2
    ), zs AS (
      SELECT day, cn1, cn2, {_BH_Z} AS z FROM day_sums
    ), ps AS (
      SELECT day, z, {_BH_P} AS p
      FROM (SELECT day, z, {_BH_T} AS _t FROM zs) tt
    ), ranked AS (
      SELECT day, z, p,
             CAST(row_number() OVER (ORDER BY p, day) AS BIGINT) AS rnk,
             CAST(count(*) OVER () AS BIGINT) AS m
      FROM ps
    ), qv AS (
      SELECT day, z, p, rnk, m,
             min(p * CAST(m AS DOUBLE) / CAST(rnk AS DOUBLE)) OVER (
               ORDER BY rnk DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS q_value
      FROM ranked
    ), kstar AS (
      SELECT coalesce(max(CASE WHEN p <= 0.10 * CAST(rnk AS DOUBLE)
                                    / CAST(m AS DOUBLE)
                               THEN rnk END), 0) AS k
      FROM ranked
    )
    SELECT day, z, p, rnk, least(q_value, 1.0) AS q_value,
           rnk <= k AS rejected
    FROM qv CROSS JOIN kstar
    ORDER BY rnk
    """,
    tags=("stats", "hypothesis-test", "fdr", "multiple-testing",
          "beyond-parity"),
)
def stat_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over a FAMILY of tests — per day,
    a Welch z between purchase and view values, then the step-up
    procedure at q = 0.10 plus monotone adjusted q-values. This is the
    multiple-testing layer every drift dashboard needs: 30 daily tests
    at p<0.05 expect 1.5 false alarms; BH caps the expected false
    discovery RATE instead. The per-day sums are order-independent
    DECIMAL (the _dsum pattern); z and the two-sided normal p
    (Abramowitz-Stegun erf, |err|<1.5e-7) are fixed dialect-shared IEEE
    chains, so the oracle replays exactly.

    Scale: the events scan folds to day grain with ONE map-side-partial
    aggregate; every window (rank, suffix-min q-value, k*) runs on the
    bounded family frame (#days rows) — the global windows are
    allowlisted by construction, never data-sized."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    dv = F.col("value").cast("decimal(18,6)")
    is1 = F.col("event_type") == "purchase"
    day_sums = (
        e.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.when(is1, 1)).cast("bigint").alias("cn1"),
            F.count(F.when(~is1, 1)).cast("bigint").alias("cn2"),
            F.sum(F.when(is1, dv)).cast("double").alias("s1"),
            F.sum(F.when(~is1, dv)).cast("double").alias("s2"),
            F.sum(F.when(is1, (dv * dv).cast("decimal(28,12)")))
            .cast("double")
            .alias("ss1"),
            F.sum(F.when(~is1, (dv * dv).cast("decimal(28,12)")))
            .cast("double")
            .alias("ss2"),
        )
        .filter((F.col("cn1") >= 2) & (F.col("cn2") >= 2))
    )
    zs = day_sums.select("day", "cn1", "cn2", F.expr(_BH_Z).alias("z"))
    ps = zs.select("day", "z", F.expr(_BH_T).alias("_t")).select(
        "day", "z", F.expr(_BH_P).alias("p")
    )
    wall = Window.orderBy("p", "day")
    ranked = ps.select(
        "day",
        "z",
        "p",
        F.row_number().over(wall).cast("bigint").alias("rnk"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("bigint")
        .alias("m"),
    ).persist()
    wq = Window.orderBy(F.col("rnk").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    qv = ranked.withColumn(
        "q_value",
        F.min(F.col("p") * F.col("m").cast("double") / F.col("rnk").cast("double")).over(wq),
    )
    kstar = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("p")
                    <= 0.10 * F.col("rnk").cast("double") / F.col("m").cast("double"),
                    F.col("rnk"),
                )
            ),
            F.lit(0).cast("bigint"),
        ).alias("k")
    )
    return (
        qv.crossJoin(F.broadcast(kstar))
        .select(
            "day",
            "z",
            "p",
            "rnk",
            F.least(F.col("q_value"), F.lit(1.0)).alias("q_value"),
            (F.col("rnk") <= F.col("k")).alias("rejected"),
        )
        .orderBy("rnk")
    )


_ANOVA_F = """((ssb / CAST(k - 1 AS DOUBLE)) / (ssw / CAST(n - k AS DOUBLE)))"""


@declare(
    "stat_anova_f",
    sql=f"""
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sg,
             CAST(sum(CAST(CAST(value AS DECIMAL(18,6))
                  * CAST(value AS DECIMAL(18,6)) AS DECIMAL(28,12)))
                  AS DOUBLE) AS ssg
      FROM events WHERE event_type IN ('view', 'click', 'purchase')
      GROUP BY event_type
    ), tot AS (
      SELECT CAST(sum(ng) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
             sum(sg) AS s
      FROM g
    ), parts AS (
      SELECT max(n) AS n, max(k) AS k,
             sum(sg * sg / CAST(ng AS DOUBLE)) - max(s * s) / CAST(max(n) AS DOUBLE) AS ssb,
             sum(ssg) - sum(sg * sg / CAST(ng AS DOUBLE)) AS ssw
      FROM g CROSS JOIN tot
    )
    SELECT n, k, ssb, ssw, {_ANOVA_F} AS f
    FROM parts
    """,
    tags=("stats", "hypothesis-test", "anova", "beyond-parity"),
)
def stat_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F across the view / click / purchase value groups —
    the parametric sibling of stat_kruskal_wallis (mean drift across k
    corpus slices in one test). Between/within sums of squares come from
    per-group order-independent DECIMAL sums only (ssb = Σ s_g²/n_g −
    S²/N, ssw = Σ ss_g − Σ s_g²/n_g — no per-row deviations), so the
    whole statistic is one map-side aggregate to k rows plus a fixed
    dialect-shared IEEE chain; the oracle replays exactly.

    Scale: ONE events scan folding to k=3 group rows with map-side
    partials; everything after is O(k). Nothing shuffles at data volume."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    dv = F.col("value").cast("decimal(18,6)")
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum(dv).cast("double").alias("sg"),
        F.sum((dv * dv).cast("decimal(28,12)")).cast("double").alias("ssg"),
    )
    tot = g.agg(
        F.sum("ng").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("sg").alias("s"),
    )
    parts = g.crossJoin(F.broadcast(tot)).agg(
        F.max("n").alias("n"),
        F.max("k").alias("k"),
        (
            F.sum(F.col("sg") * F.col("sg") / F.col("ng").cast("double"))
            - F.max(F.col("s") * F.col("s")) / F.max("n").cast("double")
        ).alias("ssb"),
        (
            F.sum("ssg")
            - F.sum(F.col("sg") * F.col("sg") / F.col("ng").cast("double"))
        ).alias("ssw"),
    )
    return parts.select("n", "k", "ssb", "ssw", F.expr(_ANOVA_F).alias("f"))


@declare(
    "stat_levene",
    sql=f"""
    WITH med AS (
      SELECT event_type,
             quantile_cont(value, 0.5) AS md
      FROM events WHERE event_type IN ('view', 'click', 'purchase')
      GROUP BY event_type
    ), dev AS (
      SELECT e.event_type,
             CAST(abs(CAST(e.value AS DECIMAL(18,6))
                      - CAST(m.md AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS z
      FROM events e JOIN med m ON e.event_type = m.event_type
      WHERE e.event_type IN ('view', 'click', 'purchase')
    ), g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(z) AS DOUBLE) AS sg,
             CAST(sum(CAST(z * z AS DECIMAL(28,12))) AS DOUBLE) AS ssg
      FROM dev GROUP BY event_type
    ), tot AS (
      SELECT CAST(sum(ng) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
             sum(sg) AS s
      FROM g
    ), parts AS (
      SELECT max(n) AS n, max(k) AS k,
             sum(sg * sg / CAST(ng AS DOUBLE)) - max(s * s) / CAST(max(n) AS DOUBLE) AS ssb,
             sum(ssg) - sum(sg * sg / CAST(ng AS DOUBLE)) AS ssw
      FROM g CROSS JOIN tot
    )
    SELECT n, k, ssb, ssw, {_ANOVA_F} AS w
    FROM parts
    """,
    tags=("stats", "hypothesis-test", "variance", "beyond-parity"),
)
def stat_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe Levene test (variance homogeneity across the
    view / click / purchase groups): one-way ANOVA on the absolute
    deviations from each GROUP MEDIAN — robust to non-normality, the
    form every stats package defaults to. Group medians are exact
    interpolated percentiles (Spark percentile ≡ DuckDB quantile_cont);
    deviations are DECIMAL-quantized before summing so both engines fold
    identical values in any order; the F chain is the shared
    stat_anova_f text.

    Scale: two events scans (median pass, deviation pass) + a broadcast
    of the k=3 median frame; the deviation aggregate is map-side to k
    rows. The median pass is the cost — at extreme scale swap in the
    approx-percentile sketch (cb_approx_quantile machinery) and accept
    the documented tolerance."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("md")
    )
    z = F.abs(
        F.col("value").cast("decimal(18,6)") - F.col("md").cast("decimal(18,6)")
    ).cast("decimal(18,6)")
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", z.alias("z")
    )
    g = dev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum("z").cast("double").alias("sg"),
        F.sum((F.col("z") * F.col("z")).cast("decimal(28,12)"))
        .cast("double")
        .alias("ssg"),
    )
    tot = g.agg(
        F.sum("ng").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("sg").alias("s"),
    )
    parts = g.crossJoin(F.broadcast(tot)).agg(
        F.max("n").alias("n"),
        F.max("k").alias("k"),
        (
            F.sum(F.col("sg") * F.col("sg") / F.col("ng").cast("double"))
            - F.max(F.col("s") * F.col("s")) / F.max("n").cast("double")
        ).alias("ssb"),
        (
            F.sum("ssg")
            - F.sum(F.col("sg") * F.col("sg") / F.col("ng").cast("double"))
        ).alias("ssw"),
    )
    return parts.select("n", "k", "ssb", "ssw", F.expr(_ANOVA_F).alias("w"))


@declare(
    "dq_referential_integrity",
    sql="""
    SELECT fk_edge, n_rows, n_orphans,
           CAST(n_orphans AS DOUBLE) / CAST(n_rows AS DOUBLE) AS orphan_rate
    FROM (
      SELECT 'lineitem.l_orderkey -> orders' AS fk_edge,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_orphans
      FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
      UNION ALL
      SELECT 'lineitem.l_partkey -> part',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM lineitem l LEFT JOIN part p ON p.p_partkey = l.l_partkey
      UNION ALL
      SELECT 'lineitem.l_suppkey -> supplier',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM lineitem l LEFT JOIN supplier s ON s.s_suppkey = l.l_suppkey
      UNION ALL
      SELECT 'orders.o_custkey -> customer',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
      UNION ALL
      SELECT 'customer.c_nationkey -> nation',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
    ) edges
    ORDER BY fk_edge
    """,
    tags=("data-quality", "referential-integrity", "beyond-parity"),
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across every FK edge of the schema —
    row counts and orphan counts per edge (the constraint check a lake
    without enforced FKs runs after every load; completes the dq_ family
    next to skew/volume/profile). Each edge is one left join counted
    map-side into a 1-row frame.

    Scale: the four fact-side edges shuffle on their natural join keys
    exactly once each; the dimension sides (part/supplier/customer/
    nation) broadcast at any realistic scale (AQE picks it; nation is
    25 rows). Nothing re-scans: each edge reads its two tables once."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")

    def edge(name, left, lk, right, rk):
        j = left.join(right, left[lk] == right[rk], "left")
        return j.agg(
            F.lit(name).alias("fk_edge"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.when(right[rk].isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_orphans"),
        )

    edges = (
        edge("lineitem.l_orderkey -> orders", li, "l_orderkey", o, "o_orderkey")
        .unionByName(
            edge("lineitem.l_partkey -> part", li, "l_partkey", p, "p_partkey")
        )
        .unionByName(
            edge(
                "lineitem.l_suppkey -> supplier", li, "l_suppkey", s, "s_suppkey"
            )
        )
        .unionByName(
            edge("orders.o_custkey -> customer", o, "o_custkey", c, "c_custkey")
        )
        .unionByName(
            edge(
                "customer.c_nationkey -> nation", c, "c_nationkey", n,
                "n_nationkey",
            )
        )
    )
    return edges.select(
        "fk_edge",
        "n_rows",
        "n_orphans",
        (
            F.col("n_orphans").cast("double") / F.col("n_rows").cast("double")
        ).alias("orphan_rate"),
    ).orderBy("fk_edge")


@declare(
    "stat_friedman",
    sql="""
    WITH obs AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    kk AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k
           FROM events),
    full_days AS (
      SELECT day FROM obs GROUP BY day
      HAVING count(*) = (SELECT k FROM kk)),
    ranked AS (
      SELECT o.day, o.event_type, o.x,
             rank() OVER (PARTITION BY o.day ORDER BY o.x)
             + (count(*) OVER (PARTITION BY o.day, o.x) - 1) / 2.0 AS r
      FROM obs o JOIN full_days USING (day)),
    nb AS (SELECT CAST(count(DISTINCT day) AS BIGINT) AS n FROM ranked),
    rj AS (SELECT event_type, sum(r) AS rj FROM ranked GROUP BY 1),
    ties AS (
      SELECT coalesce(sum(t * t * t - t), 0) AS tsum
      FROM (SELECT CAST(count(*) AS BIGINT) AS t
            FROM ranked GROUP BY day, x) g),
    q AS (
      SELECT nb.n, kk.k, ties.tsum,
             12.0 / (nb.n * kk.k * (kk.k + 1)) * sum(rj.rj * rj.rj)
             - 3.0 * nb.n * (kk.k + 1) AS q_raw
      FROM rj CROSS JOIN nb CROSS JOIN kk CROSS JOIN ties
      GROUP BY nb.n, kk.k, ties.tsum)
    SELECT n AS n_blocks, k AS n_treatments, k - 1 AS dof, q_raw,
           1.0 - CAST(tsum AS DOUBLE) / (n * k * (k * k - 1)) AS tie_c,
           CASE WHEN 1.0 - CAST(tsum AS DOUBLE) / (n * k * (k * k - 1)) > 0
                THEN q_raw / (1.0 - CAST(tsum AS DOUBLE)
                                    / (n * k * (k * k - 1))) END AS chi2
    FROM q
    """,
    tags=("stats", "hypothesis-test", "nonparametric", "beyond-parity"),
)
def stat_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test — the repeated-measures / blocked complement of
    stat_kruskal_wallis: blocks = calendar days, treatments = event
    types, observation = the day x type event count (INTEGER, so the cut
    is exact in both engines — no float-mean observations whose sum
    order could flip a rank). Only complete blocks (all k types present)
    enter, the standard listwise rule. Within-block average ranks come
    from rank() + (ties-1)/2 (half-integers — exact doubles), the
    statistic is the classic Q = 12/(nk(k+1)) SUM R_j^2 - 3n(k+1), and
    the tie correction C = 1 - SUM(t^3-t)/(nk(k^2-1)) divides it (chi2
    with k-1 dof). Identical formula text runs on both engines, so the
    doubles match bit-for-bit.

    Scale: one hash aggregate to day x type grain; the rank window
    partitions by day (never a global sort); everything downstream runs
    on the tiny per-day frame. At 1000x the events the day x type frame
    grows with days, not rows."""
    e = load_table(spark, sf_dir, "events")
    obs = e.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    k_val = e.select(
        F.countDistinct("event_type").cast("bigint").alias("k")
    )
    full_days = (
        obs.groupBy("day")
        .agg(F.count(F.lit(1)).alias("_c"))
        .join(F.broadcast(k_val), F.col("_c") == F.col("k"))
        .select("day")
    )
    from pyspark.sql import Window as W

    wr = W.partitionBy("day").orderBy("x")
    wt = W.partitionBy("day", "x")
    ranked = (
        obs.join(full_days, "day")
        .select(
            "day",
            "event_type",
            "x",
            (
                F.rank().over(wr)
                + (F.count(F.lit(1)).over(wt) - F.lit(1)) / F.lit(2.0)
            ).alias("r"),
        )
    ).persist()
    nb = ranked.select(
        F.countDistinct("day").cast("bigint").alias("n")
    )
    rj = ranked.groupBy("event_type").agg(F.sum("r").alias("rj"))
    ties = (
        ranked.groupBy("day", "x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .agg(
            F.coalesce(
                F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")),
                F.lit(0),
            ).alias("tsum")
        )
    )
    q = (
        rj.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(k_val))
        .crossJoin(F.broadcast(ties))
        .groupBy("n", "k", "tsum")
        .agg(
            (
                F.lit(12.0)
                / (F.col("n") * F.col("k") * (F.col("k") + 1))
                * F.sum(F.col("rj") * F.col("rj"))
                - F.lit(3.0) * F.col("n") * (F.col("k") + 1)
            ).alias("q_raw")
        )
    )
    n, k, tsum = F.col("n"), F.col("k"), F.col("tsum")
    tie_c = F.lit(1.0) - tsum.cast("double") / (n * k * (k * k - 1))
    return q.select(
        n.alias("n_blocks"),
        k.alias("n_treatments"),
        (k - 1).alias("dof"),
        "q_raw",
        tie_c.alias("tie_c"),
        F.when(tie_c > 0, F.col("q_raw") / tie_c).alias("chi2"),
    ).orderBy("n_blocks")


@declare(
    "stat_jarque_bera",
    sql="""
    WITH h AS (
      SELECT event_type,
             CAST(epoch(date_trunc('hour', ts)) / 3600 AS BIGINT) AS hr,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS s
            FROM h GROUP BY 1),
    c AS (SELECT h.event_type, tot.n,
                 CAST(tot.n * h.x - tot.s AS DECIMAL(38,0)) AS cx
          FROM h JOIN tot USING (event_type)),
    m AS (SELECT event_type, max(n) AS n,
                 sum(cx * cx) AS m2s,
                 sum(cx * cx * cx) AS m3s,
                 sum(cx * cx * cx * cx) AS m4s
          FROM c GROUP BY 1)
    SELECT event_type, n,
           CASE WHEN m2s > 0
                THEN CAST(m3s AS DOUBLE) * sqrt(CAST(n AS DOUBLE))
                     / pow(CAST(m2s AS DOUBLE), 1.5) END AS skewness,
           CASE WHEN m2s > 0
                THEN CAST(m4s AS DOUBLE) * CAST(n AS DOUBLE)
                     / (CAST(m2s AS DOUBLE) * CAST(m2s AS DOUBLE)) END
                AS kurtosis,
           CASE WHEN m2s > 0
                THEN CAST(n AS DOUBLE) / 6.0
                     * (pow(CAST(m3s AS DOUBLE) * sqrt(CAST(n AS DOUBLE))
                            / pow(CAST(m2s AS DOUBLE), 1.5), 2)
                        + pow(CAST(m4s AS DOUBLE) * CAST(n AS DOUBLE)
                              / (CAST(m2s AS DOUBLE) * CAST(m2s AS DOUBLE))
                              - 3.0, 2) / 4.0) END AS jb
    FROM m ORDER BY event_type
    """,
    tags=("stats", "hypothesis-test", "normality", "beyond-parity"),
)
def stat_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test of the hourly per-type event-count
    distribution — the gate in front of every z-score/CI step that
    assumes normal hourly traffic (ts_anomaly, stat_zscore_outliers):
    JB = n/6 (S^2 + (K-3)^2 / 4) with skewness S and kurtosis K from
    EXACT-INTEGER central moments — the ts_acf n-scaling trick extended
    to 3rd/4th powers: cx = n*x - S1 is a bigint, the n-scale cancels in
    both ratios (S = sqrt(n) m3s / m2s^1.5, K = n m4s / m2s^2), and cx^4
    sums stay under DECIMAL(38,0)'s ceiling up to ~1e8 hours x 1e7
    events/hour. Both engines then run the identical double formula on
    identical integers; constant series yield NULL, not NaN.

    Scale: one hash aggregate to hourly grain; the moment aggregate runs
    on the tiny per-type hourly frame. At 1000x events the hourly frame
    grows with the time span, not the row count."""
    e = load_table(spark, sf_dir, "events")
    h = e.groupBy(
        "event_type",
        (F.unix_micros(F.date_trunc("hour", "ts")) / F.lit(3600000000))
        .cast("bigint")
        .alias("hr"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    tot = (
        h.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("s"),
        )
        .withColumnRenamed("event_type", "_et")
    )
    c = h.join(F.broadcast(tot), F.col("event_type") == F.col("_et")).select(
        "event_type",
        "n",
        (F.col("n") * F.col("x") - F.col("s"))
        .cast("decimal(38,0)")
        .alias("cx"),
    )
    cx = F.col("cx")
    m = c.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(cx * cx).alias("m2s"),
        F.sum(cx * cx * cx).alias("m3s"),
        F.sum(cx * cx * cx * cx).alias("m4s"),
    )
    nD = F.col("n").cast("double")
    m2, m3, m4 = (F.col(k).cast("double") for k in ("m2s", "m3s", "m4s"))
    skew = m3 * F.sqrt(nD) / F.pow(m2, F.lit(1.5))
    kurt = m4 * nD / (m2 * m2)
    return m.select(
        "event_type",
        "n",
        F.when(F.col("m2s") > 0, skew).alias("skewness"),
        F.when(F.col("m2s") > 0, kurt).alias("kurtosis"),
        F.when(
            F.col("m2s") > 0,
            nD / F.lit(6.0)
            * (
                F.pow(skew, F.lit(2))
                + F.pow(kurt - F.lit(3.0), F.lit(2)) / F.lit(4.0)
            ),
        ).alias("jb"),
    ).orderBy("event_type")

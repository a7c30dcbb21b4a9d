"""Model-evaluation + feature-preparation queries — the metrics layer a
training-data pipeline runs on scored outputs before shipping a model or
an encoded feature table (beyond-parity per the brief: the reference
engine has no ML-eval surface; these compose its aggregation/window
parity into the standard eval toolkit).

Every statistic is EXACT-INTEGER first (value-grain counts, bigint rank
sums, decimal-quantized mean sums) with doubles only as one fixed IEEE
chain at the end — the repo-wide discipline that makes each query
bit-replayable by the DuckDB oracle.

Scale notes repeat per query; the shared one: anything rank-based uses
the two-level prefix pattern (value-grain counts → band subtotals →
tiny band-frame prefix → band-partitioned local prefix) so no global
window ever touches the full value set (stat_mann_whitney /
stat_ks_test kernel; reference parity anchor: the aggregate/window
operators of pixels-core, TypeDescription.java:218 rollup surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.dedup import cut_lineage
from .registry import declare

# Binary classification fixture shared by the eval family: the model
# score is the event value, the positive class is 'purchase', the
# negative class is 'view' — "does spend separate buyers from browsers".
_LAB_SQL = """
      SELECT value AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE event_type IN ('purchase', 'view')"""


def _labeled(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.filter(F.col("event_type").isin("purchase", "view")).select(
        F.col("value").alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )


@declare(
    "eval_auc",
    sql=f"""
    WITH lab AS ({_LAB_SQL}),
    g AS (SELECT v, CAST(sum(y) AS BIGINT) AS p,
                 CAST(sum(1 - y) AS BIGINT) AS n
          FROM lab GROUP BY v),
    pre AS (
      SELECT p, n,
             CAST(coalesce(sum(n) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS neg_below
      FROM g)
    SELECT CAST(sum(p) AS BIGINT) AS n_pos,
           CAST(sum(n) AS BIGINT) AS n_neg,
           CAST(sum(p * (2 * neg_below + n)) AS BIGINT) AS two_u,
           CASE WHEN sum(p) > 0 AND sum(n) > 0 THEN
             CAST(sum(p * (2 * neg_below + n)) AS DOUBLE)
               / (2.0 * CAST(sum(p) AS DOUBLE) * CAST(sum(n) AS DOUBLE))
           END AS auc
    FROM pre
    """,
    tags=("eval", "auc", "ranking", "beyond-parity"),
)
def eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT tie-corrected ROC AUC of the score (event value) separating
    purchases from views — the first number anyone asks of a binary
    scorer. AUC is the Mann-Whitney statistic normalized: with per-value
    positive/negative counts (p_v, n_v), 2U = Σ p_v·(2·neg_below(v) +
    n_v) counts each (pos, neg) pair twice with ties at half — held as
    one BIGINT, so AUC = 2U / (2·n_pos·n_neg) is a single IEEE division
    and the oracle hashes bit-identically.

    Scale: the oracle ranks with ONE global window (fine for DuckDB, a
    single-task sort at 100 TB); the engine computes neg_below via the
    two-level prefix (value-grain counts → 25-wide band subtotals →
    prefix over the tiny band frame → band-partitioned local prefix) —
    the stat_mann_whitney kernel, which AUC literally is."""
    g = (
        _labeled(spark, sf_dir)
        .groupBy("v")
        .agg(
            F.sum("y").cast("bigint").alias("p"),
            F.sum(1 - F.col("y")).cast("bigint").alias("n"),
        )
    )
    return auc_scan(cut_lineage(g))


def auc_scan(g: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """The AUC scoring stage over a (v, p, n) per-value counter table —
    factored out (like statsq.ks_scan) so the streaming twin
    ``stream_eval_auc`` scores its MAINTAINED counter table with the
    identical plan and shares this oracle bit-for-bit. With
    ``group_cols`` every stage partitions by the groups as well (the
    counter table then carries one (group, v) row per value) and the
    output is one AUC row per group — the ``eval_group_auc`` kernel;
    the default-None path is byte-identical to the original."""
    from pyspark.sql import Window

    gc = list(group_cols or [])
    b = g.withColumn("_b", F.floor(F.col("v") / F.lit(25.0)))
    bsum = b.groupBy(*gc, "_b").agg(F.sum("n").alias("_bs"))
    wb = (
        Window.partitionBy(*gc)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
        if gc
        else Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    )
    bpre = bsum.select(
        *gc,
        "_b",
        F.coalesce(F.sum("_bs").over(wb), F.lit(0)).cast("bigint").alias("_lower"),
    )
    win = (
        Window.partitionBy(*gc, "_b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = b.join(F.broadcast(bpre), gc + ["_b"]).withColumn(
        "neg_below",
        (F.col("_lower") + F.coalesce(F.sum("n").over(win), F.lit(0))).cast(
            "bigint"
        ),
    )
    return pre.groupBy(*gc).agg(
        F.sum("p").cast("bigint").alias("n_pos"),
        F.sum("n").cast("bigint").alias("n_neg"),
        F.sum(F.col("p") * (2 * F.col("neg_below") + F.col("n")))
        .cast("bigint")
        .alias("two_u"),
    ).select(
        *gc,
        "n_pos",
        "n_neg",
        "two_u",
        # Degenerate slice (no positives or no negatives) → AUC is
        # undefined; an unguarded 0/0 yields Spark NULL but DuckDB
        # (ieee_floating_point_ops) NaN/Inf — guard identically in every
        # SQL oracle (ADVICE r9; same hazard as eval_threshold_sweep's
        # r8 fix). Per-cohort slicing makes this reachable in practice.
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.col("two_u").cast("double")
            / (2.0 * F.col("n_pos").cast("double") * F.col("n_neg").cast("double")),
        ).alias("auc"),
    )


@declare(
    "eval_calibration",
    sql=f"""
    WITH lab AS ({_LAB_SQL}),
    binned AS (
      SELECT least(CAST(floor(v / 50.0) AS BIGINT), 9) AS bin, v, y
      FROM lab)
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(y) AS BIGINT) AS n_pos,
           CAST(CAST(sum(CAST(v AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)
             / count(*) AS mean_score,
           CAST(sum(y) AS DOUBLE) / count(*) AS pos_rate
    FROM binned GROUP BY bin ORDER BY bin
    """,
    tags=("eval", "calibration", "beyond-parity"),
)
def eval_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability (calibration) table: scores cut into 10 fixed-width
    bins (50-wide over the value domain, top bin open), per bin the
    exact count, positive count, DECIMAL-exact mean score and positive
    rate — the curve that says whether 'a score of 300 means 80%
    purchase likelihood' before anyone trusts thresholds. One map-side
    binning + one 10-group aggregate; mean_score sums DECIMAL(18,6) so
    the double is one division on both engines."""
    lab = _labeled(spark, sf_dir)
    binned = lab.withColumn(
        "bin",
        F.least(F.floor(F.col("v") / F.lit(50.0)), F.lit(9)).cast("bigint"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("n_pos"),
            (
                F.sum(F.col("v").cast("decimal(18,6)"))
                .cast("decimal(38,6)")
                .cast("double")
                / F.count(F.lit(1))
            ).alias("mean_score"),
            (F.sum("y").cast("double") / F.count(F.lit(1))).alias("pos_rate"),
        )
        .orderBy("bin")
    )


_SWEEP_TAUS = (50.0, 100.0, 150.0, 200.0, 250.0)


def _sweep_sql() -> str:
    rows = "\n      UNION ALL\n".join(
        f"""      SELECT CAST({t} AS DOUBLE) AS threshold,
             CAST(sum(CASE WHEN y = 1 AND v >= {t} THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN y = 0 AND v >= {t} THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN y = 1 AND v < {t} THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(sum(CASE WHEN y = 0 AND v < {t} THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM lab"""
        for t in _SWEEP_TAUS
    )
    return f"""
    WITH lab AS ({_LAB_SQL}),
    m AS (
{rows})
    SELECT threshold, tp, fp, fn, tn,
           CASE WHEN tp + fp > 0
                THEN CAST(tp AS DOUBLE) / (tp + fp) END AS precision,
           CASE WHEN tp + fn > 0
                THEN CAST(tp AS DOUBLE) / (tp + fn) END AS recall,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN 2.0 * tp / (2.0 * tp + fp + fn) END AS f1
    FROM m ORDER BY threshold
    """


@declare(
    "eval_threshold_sweep",
    sql=_sweep_sql(),
    tags=("eval", "confusion", "beyond-parity"),
)
def eval_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion-matrix sweep: TP/FP/FN/TN and precision/recall/F1 at 5
    candidate decision thresholds — the table that picks the operating
    point after eval_auc says the ranking is good. ONE scan: all 20
    counters are map-side CASE sums in a single wide aggregate whose
    1-row result explodes into per-threshold rows (the dq_checks
    pattern); the oracle unions per-threshold aggregates, same counts.
    F1 uses the 2tp/(2tp+fp+fn) form — no intermediate precision/recall
    rounding on either engine. Zero-denominator cells are NULL on BOTH
    engines (CASE-guarded): an extreme threshold with no predicted
    positives must not hash-diverge on Spark-NULL vs DuckDB-inf
    (ADVICE r8)."""
    lab = _labeled(spark, sf_dir)
    aggs = []
    for i, t in enumerate(_SWEEP_TAUS):
        pos = F.col("y") == 1
        hi = F.col("v") >= F.lit(t)
        aggs += [
            F.sum(F.when(pos & hi, 1).otherwise(0)).cast("bigint").alias(f"_tp{i}"),
            F.sum(F.when(~pos & hi, 1).otherwise(0)).cast("bigint").alias(f"_fp{i}"),
            F.sum(F.when(pos & ~hi, 1).otherwise(0)).cast("bigint").alias(f"_fn{i}"),
            F.sum(F.when(~pos & ~hi, 1).otherwise(0)).cast("bigint").alias(f"_tn{i}"),
        ]
    row = lab.agg(*aggs)
    packed = [
        F.struct(
            F.lit(t).alias("threshold"),
            F.col(f"_tp{i}").alias("tp"),
            F.col(f"_fp{i}").alias("fp"),
            F.col(f"_fn{i}").alias("fn"),
            F.col(f"_tn{i}").alias("tn"),
        )
        for i, t in enumerate(_SWEEP_TAUS)
    ]
    m = row.select(F.explode(F.array(*packed)).alias("x")).select("x.*")
    return m.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.col("tp").cast("double") / (F.col("tp") + F.col("fp")),
        ).alias("precision"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            F.col("tp").cast("double") / (F.col("tp") + F.col("fn")),
        ).alias("recall"),
        F.when(
            2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
            2.0
            * F.col("tp")
            / (2.0 * F.col("tp") + F.col("fp") + F.col("fn")),
        ).alias("f1"),
    ).orderBy("threshold")


@declare(
    "feat_target_encode",
    sql="""
    WITH lab AS (
      SELECT source,
             CAST(CAST(concat('0x', substr(md5('te1' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 5 AS BIGINT) AS fold,
             CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS y
      FROM documents),
    per AS (SELECT source, fold, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(y) AS BIGINT) AS pos
            FROM lab GROUP BY source, fold),
    tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS tot_n,
                   CAST(sum(pos) AS BIGINT) AS tot_pos
            FROM per GROUP BY source),
    gtot AS (SELECT CAST(sum(n) AS BIGINT) AS g_n,
                    CAST(sum(pos) AS BIGINT) AS g_pos FROM per)
    SELECT p.source, p.fold, p.n AS n_in_fold,
           CASE WHEN t.tot_n - p.n > 0
                THEN CAST(t.tot_pos - p.pos AS DOUBLE) / (t.tot_n - p.n)
                ELSE CAST(g.g_pos AS DOUBLE) / g.g_n END AS enc
    FROM per p JOIN tot t ON t.source = p.source CROSS JOIN gtot g
    ORDER BY p.source, p.fold
    """,
    tags=("feature", "target-encoding", "kfold", "beyond-parity"),
)
def feat_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe (out-of-fold) target encoding of ``source`` against
    the quality label n_chars ≥ 500: each (category, fold) cell's
    encoded value is the target mean over the category's OTHER folds —
    enc = (tot_pos − fold_pos) / (tot_n − fold_n) — so no row's own
    label leaks into its feature (the standard high-cardinality
    categorical encoder for tabular training). Folds are the md5 hash
    family (engine-independent, reproducible); the ratio is one IEEE
    division of exact BIGINTs; a category entirely inside one fold
    falls back to the global rate.

    Scale: two aggregates on the category grain (per-(cat,fold), then
    per-cat totals rolled up FROM the first — no second corpus scan) +
    one broadcast-able join; the global-rate frame is 1 row. No window,
    no skew risk beyond category cardinality itself."""
    d = load_table(spark, sf_dir, "documents")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("te1"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 5
    )
    lab = d.select(
        "source",
        fold.alias("fold"),
        F.when(F.col("n_chars") >= 500, 1).otherwise(0).alias("y"),
    )
    per = lab.groupBy("source", "fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    per = cut_lineage(per)
    tot = per.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("tot_n"),
        F.sum("pos").cast("bigint").alias("tot_pos"),
    )
    glob = per.agg(
        F.sum("n").cast("bigint").alias("g_n"),
        F.sum("pos").cast("bigint").alias("g_pos"),
    )
    return (
        per.join(F.broadcast(tot), "source")
        .crossJoin(F.broadcast(glob))
        .select(
            "source",
            "fold",
            F.col("n").alias("n_in_fold"),
            F.when(
                (F.col("tot_n") - F.col("n")) > 0,
                (F.col("tot_pos") - F.col("pos")).cast("double")
                / (F.col("tot_n") - F.col("n")),
            )
            .otherwise(F.col("g_pos").cast("double") / F.col("g_n"))
            .alias("enc"),
        )
        .orderBy("source", "fold")
    )


@declare(
    "ts_seasonal_profile",
    sql="""
    WITH h AS (
      SELECT CAST(hour(ts) AS BIGINT) AS hod,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_purchase
      FROM events GROUP BY hod),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM h)
    SELECT hod, n, n_purchase,
           CAST(24 * n AS DOUBLE) / t AS seasonal_index,
           CAST(n_purchase AS DOUBLE) / n AS purchase_rate
    FROM h CROSS JOIN tot ORDER BY hod
    """,
    tags=("timeseries", "seasonality", "beyond-parity"),
)
def ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal profile: per hour slot the exact event count,
    purchase count, seasonal index (24·n / total — 1.0 = flat) and
    purchase rate — the decomposition table behind load forecasting and
    anomaly baselines (is 3am traffic low because it is 3am?). One
    map-side hour() + a 24-group aggregate; the corpus-total divisor is
    a 1-row broadcast frame (the scalar crossJoin pattern); all ratios
    are fixed IEEE chains from exact BIGINTs."""
    e = load_table(spark, sf_dir, "events")
    h = e.groupBy(F.hour("ts").cast("bigint").alias("hod")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("n_purchase"),
    )
    tot = h.agg(F.sum("n").cast("bigint").alias("t"))
    return (
        h.crossJoin(F.broadcast(tot))
        .select(
            "hod",
            "n",
            "n_purchase",
            ((24 * F.col("n")).cast("double") / F.col("t")).alias(
                "seasonal_index"
            ),
            (F.col("n_purchase").cast("double") / F.col("n")).alias(
                "purchase_rate"
            ),
        )
        .orderBy("hod")
    )


@declare(
    "eval_avg_precision",
    sql=f"""
    WITH lab AS ({_LAB_SQL}),
    g AS (SELECT v, CAST(sum(y) AS BIGINT) AS p,
                 CAST(count(*) AS BIGINT) AS c
          FROM lab GROUP BY v),
    tot AS (SELECT CAST(sum(p) AS BIGINT) AS n_pos,
                   CAST(sum(c) AS BIGINT) AS n_tot FROM g),
    pre AS (
      SELECT p, c,
             CAST(coalesce(sum(p) OVER (ORDER BY v DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
                  AS BIGINT) AS pos_geq,
             CAST(coalesce(sum(c) OVER (ORDER BY v DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
                  AS BIGINT) AS tot_geq
      FROM g)
    SELECT t.n_pos,
           CAST(t.n_tot - t.n_pos AS BIGINT) AS n_neg,
           CAST(sum(CAST(
                 (CAST(pre.p AS DOUBLE) * CAST(pre.pos_geq AS DOUBLE))
               / (CAST(t.n_pos AS DOUBLE) * CAST(pre.tot_geq AS DOUBLE))
               AS DECIMAL(28,18))) AS DOUBLE) AS avg_precision
    FROM pre CROSS JOIN tot t
    GROUP BY t.n_pos, t.n_tot
    """,
    tags=("eval", "average-precision", "ranking", "beyond-parity"),
)
def eval_avg_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT average precision (area under the PR curve, sklearn's
    non-interpolated convention): AP = Σ_v ΔR_v · P_v over score grains v
    descending, with ΔR_v = p_v / n_pos and P_v = pos≥v / total≥v — the
    metric that, unlike AUC, punishes false positives proportionally to
    class imbalance. Each grain's term is one fixed IEEE chain from
    exact BIGINT counts, DECIMAL(28,18)-quantized before summing so the
    aggregate is order-independent and the oracle hashes bit-identically.

    Scale: the ≥-side cumulatives come from the same two-level band
    prefix as eval_auc, run DESCENDING (band subtotals → tiny-frame
    exclusive prefix → band-partitioned local prefix); no global window
    touches the value grain."""
    from pyspark.sql import Window

    g = (
        _labeled(spark, sf_dir)
        .groupBy("v")
        .agg(
            F.sum("y").cast("bigint").alias("p"),
            F.count(F.lit(1)).cast("bigint").alias("c"),
        )
    )
    g = cut_lineage(g)
    b = g.withColumn("_b", F.floor(F.col("v") / F.lit(25.0)))
    bsum = b.groupBy("_b").agg(
        F.sum("p").alias("_bp"), F.sum("c").alias("_bc")
    )
    wb = Window.orderBy(F.desc("_b")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    bpre = bsum.select(
        "_b",
        F.coalesce(F.sum("_bp").over(wb), F.lit(0)).cast("bigint").alias("_pp"),
        F.coalesce(F.sum("_bc").over(wb), F.lit(0)).cast("bigint").alias("_pc"),
    )
    win = (
        Window.partitionBy("_b")
        .orderBy(F.desc("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = b.join(F.broadcast(bpre), "_b").select(
        "p",
        "c",
        (F.col("_pp") + F.sum("p").over(win)).cast("bigint").alias("pos_geq"),
        (F.col("_pc") + F.sum("c").over(win)).cast("bigint").alias("tot_geq"),
    )
    tot = g.agg(
        F.sum("p").cast("bigint").alias("n_pos"),
        F.sum("c").cast("bigint").alias("n_tot"),
    )
    term = (
        (F.col("p").cast("double") * F.col("pos_geq").cast("double"))
        / (F.col("n_pos").cast("double") * F.col("tot_geq").cast("double"))
    ).cast("decimal(28,18)")
    return (
        pre.crossJoin(F.broadcast(tot))
        .groupBy("n_pos", "n_tot")
        .agg(F.sum(term).cast("double").alias("avg_precision"))
        .select(
            "n_pos",
            (F.col("n_tot") - F.col("n_pos")).cast("bigint").alias("n_neg"),
            "avg_precision",
        )
    )


@declare(
    "eval_gains_table",
    sql=f"""
    WITH lab AS ({_LAB_SQL}),
    binned AS (
      SELECT least(CAST(floor(v / 50.0) AS BIGINT), 9) AS bin, y FROM lab),
    per AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(y) AS BIGINT) AS n_pos
            FROM binned GROUP BY bin),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
                   CAST(sum(n_pos) AS BIGINT) AS tp FROM per),
    cum AS (
      SELECT bin, n, n_pos,
             CAST(sum(n) OVER (ORDER BY bin DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_n,
             CAST(sum(n_pos) OVER (ORDER BY bin DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_pos
      FROM per)
    SELECT c.bin, c.n, c.n_pos, c.cum_n, c.cum_pos,
           CAST(c.cum_pos AS DOUBLE) / t.tp AS capture_rate,
           (CAST(c.cum_pos AS DOUBLE) * t.tn)
             / (CAST(c.cum_n AS DOUBLE) * t.tp) AS lift
    FROM cum c CROSS JOIN tot t
    ORDER BY bin DESC
    """,
    tags=("eval", "gains", "lift", "beyond-parity"),
)
def eval_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table over descending score bands: target
    the top score bin first, then the top two, … — per prefix the exact
    captured-positive share (gains) and the capture-per-row ratio vs
    random targeting (lift), the "call the top 20% and get 60% of the
    buyers" report. Uses the same fixed 50-wide score bins as
    eval_calibration (band targeting is how campaigns actually cut);
    counts are exact BIGINTs, the cumulative runs over the ≤10-row bin
    frame, and both ratios are fixed IEEE chains — oracle bit-identical.

    Scale: one map-side binning + a 10-group aggregate; everything after
    is arithmetic over the 10-row frame (global window allowlisted with
    that bound)."""
    from pyspark.sql import Window

    lab = _labeled(spark, sf_dir)
    per = (
        lab.withColumn(
            "bin",
            F.least(F.floor(F.col("v") / F.lit(50.0)), F.lit(9)).cast(
                "bigint"
            ),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("n_pos"),
        )
    )
    tot = per.agg(
        F.sum("n").cast("bigint").alias("tn"),
        F.sum("n_pos").cast("bigint").alias("tp"),
    )
    wd = Window.orderBy(F.desc("bin")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per.select(
        "bin",
        "n",
        "n_pos",
        F.sum("n").over(wd).cast("bigint").alias("cum_n"),
        F.sum("n_pos").over(wd).cast("bigint").alias("cum_pos"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n",
            "n_pos",
            "cum_n",
            "cum_pos",
            (F.col("cum_pos").cast("double") / F.col("tp")).alias(
                "capture_rate"
            ),
            (
                (F.col("cum_pos").cast("double") * F.col("tn"))
                / (F.col("cum_n").cast("double") * F.col("tp"))
            ).alias("lift"),
        )
        .orderBy(F.desc("bin"))
    )


@declare(
    "eval_group_auc",
    sql=f"""
    WITH lab AS (
      SELECT user_id % 4 AS cohort, value AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE event_type IN ('purchase', 'view')),
    g AS (SELECT cohort, v, CAST(sum(y) AS BIGINT) AS p,
                 CAST(sum(1 - y) AS BIGINT) AS n
          FROM lab GROUP BY cohort, v),
    pre AS (
      SELECT cohort, p, n,
             CAST(coalesce(sum(n) OVER (PARTITION BY cohort ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS neg_below
      FROM g),
    per AS (
      SELECT CAST(cohort AS BIGINT) AS cohort,
             CAST(sum(p) AS BIGINT) AS n_pos,
             CAST(sum(n) AS BIGINT) AS n_neg,
             CASE WHEN sum(p) > 0 AND sum(n) > 0 THEN
               CAST(sum(p * (2 * neg_below + n)) AS DOUBLE)
                 / (2.0 * CAST(sum(p) AS DOUBLE) * CAST(sum(n) AS DOUBLE))
             END AS auc
      FROM pre GROUP BY cohort),
    gap AS (SELECT max(auc) - min(auc) AS auc_gap FROM per)
    SELECT cohort, n_pos, n_neg, auc, auc_gap
    FROM per CROSS JOIN gap
    ORDER BY cohort
    """,
    tags=("eval", "auc", "fairness", "beyond-parity"),
)
def eval_group_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cohort AUC fairness audit: the purchase-vs-view scorer's exact
    tie-corrected AUC computed independently for each user cohort
    (user_id % 4 — in production: geography, device, demographic slice),
    plus the max−min AUC GAP — the first-order disparate-performance
    check run before shipping any ranking model. Each cohort's AUC is the
    same BIGINT rank-sum kernel as eval_auc (auc_scan with group_cols),
    so the whole report is exactly oracled.

    Scale: identical to eval_auc with every stage keyed by (cohort, …) —
    value-grain counters, cohort-partitioned band prefix, one closing
    aggregate per cohort; the 4-row gap attaches from the persisted
    per-cohort frame (no rescan)."""
    e = load_table(spark, sf_dir, "events")
    lab = e.filter(F.col("event_type").isin("purchase", "view")).select(
        (F.col("user_id") % 4).alias("cohort"),
        F.col("value").alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    g = lab.groupBy("cohort", "v").agg(
        F.sum("y").cast("bigint").alias("p"),
        F.sum(1 - F.col("y")).cast("bigint").alias("n"),
    )
    per = (
        auc_scan(cut_lineage(g), group_cols=["cohort"])
        .withColumn("cohort", F.col("cohort").cast("bigint"))
        .drop("two_u")
    )
    # r12: the gap attaches via a GLOBAL window over the 4-row cohort
    # frame instead of persist + aggregate + broadcast crossJoin
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    return (
        per.withColumn(
            "auc_gap",
            F.max("auc").over(w_all) - F.min("auc").over(w_all),
        )
        .select("cohort", "n_pos", "n_neg", "auc", "auc_gap")
        .orderBy("cohort")
    )


_PSI_SQL = f"""
    WITH lab AS (
      SELECT user_id % 2 AS seg, value AS v
      FROM events WHERE event_type IN ('purchase', 'view')),
    binned AS (
      SELECT seg, least(CAST(floor(v / 50.0) AS BIGINT), 9) AS bin
      FROM lab),
    grid AS (SELECT unnest(range(0, 10)) AS bin),
    cnt AS (
      SELECT g.bin,
             CAST(coalesce(sum(CASE WHEN seg = 0 THEN 1 END), 0)
                  AS BIGINT) AS n_ref,
             CAST(coalesce(sum(CASE WHEN seg = 1 THEN 1 END), 0)
                  AS BIGINT) AS n_cur
      FROM grid g LEFT JOIN binned b ON b.bin = g.bin
      GROUP BY g.bin),
    tot AS (SELECT CAST(sum(n_ref) AS BIGINT) AS tr,
                   CAST(sum(n_cur) AS BIGINT) AS tc FROM cnt),
    terms AS (
      SELECT bin, n_ref, n_cur,
             (n_ref + 0.5) / (tr + 5.0) AS p_ref,
             (n_cur + 0.5) / (tc + 5.0) AS p_cur,
             CAST(CAST(((n_ref + 0.5) / (tr + 5.0)
                        - (n_cur + 0.5) / (tc + 5.0))
                       * ln(((n_ref + 0.5) / (tr + 5.0))
                            / ((n_cur + 0.5) / (tc + 5.0)))
                       AS DECIMAL(18,12)) AS DOUBLE) AS psi_term
      FROM cnt CROSS JOIN tot),
    p AS (SELECT CAST(sum(CAST(psi_term AS DECIMAL(18,12))) AS DOUBLE)
                 AS psi FROM terms)
    SELECT bin, n_ref, n_cur, p_ref, p_cur, psi_term,
           psi, (psi > 0.2) AS drifted_02
    FROM terms CROSS JOIN p
    ORDER BY bin
    """


@declare(
    "eval_psi",
    sql=_PSI_SQL,
    tags=("eval", "drift", "psi", "monitoring", "beyond-parity"),
)
def eval_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index between two score populations (user_id
    parity as the deterministic reference/current split — in production:
    training week vs serving week) over the same 10 fixed bins as
    eval_calibration — THE industry-standard 'did my model's input
    distribution move' monitor (PSI > 0.2 = investigate). Bin masses are
    half-Laplace smoothed ((c + 0.5)/(n + 5) — empty bins stay finite and
    both engines compute the identical half-integer ratios); each term is
    one IEEE chain quantized to DECIMAL(18,12) before the
    order-independent sum; the 0-count grid is restored by a 10-row range
    join so both populations always cover all bins.

    Scale: one map-side binning + one ≤20-group aggregate; everything
    after is O(10) frame ops — the events table is scanned once."""
    e = load_table(spark, sf_dir, "events")
    binned = e.filter(F.col("event_type").isin("purchase", "view")).select(
        (F.col("user_id") % 2).alias("seg"),
        F.least(F.floor(F.col("value") / F.lit(50.0)), F.lit(9))
        .cast("bigint")
        .alias("bin"),
    )
    # aggregate to (seg, bin) FIRST (map-side partials, <=20 rows), THEN
    # restore empty bins against the 10-row grid — grid-joining the raw
    # event volume would shuffle the big side onto 10 hot keys
    seg_cnt = binned.groupBy("seg", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return psi_scan(spark, seg_cnt)


def psi_scan(spark: SparkSession, seg_cnt: DataFrame) -> DataFrame:
    """The PSI scoring stage over a (seg, bin, c) counter frame —
    factored out (the auc_scan convention) so the streaming twin
    ``stream_psi`` scores its MAINTAINED counter table with the identical
    plan and shares ``_PSI_SQL`` bit-for-bit."""
    grid = spark.range(0, 10).select(F.col("id").alias("bin"))
    cnt = (
        grid.join(F.broadcast(seg_cnt), "bin", "left")
        .groupBy("bin")
        .agg(
            F.coalesce(F.sum(F.when(F.col("seg") == 0, F.col("c"))), F.lit(0))
            .cast("bigint")
            .alias("n_ref"),
            F.coalesce(F.sum(F.when(F.col("seg") == 1, F.col("c"))), F.lit(0))
            .cast("bigint")
            .alias("n_cur"),
        )
    )
    # r12: the totals and the PSI sum attach via GLOBAL windows over the
    # 10-row bin frame (two stacked windows) instead of two rounds of
    # persist + aggregate + broadcast crossJoin — one job instead of
    # three, values bit-identical (same exact decimal sums)
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    p_ref = (F.col("n_ref") + 0.5) / (F.col("tr") + 5.0)
    p_cur = (F.col("n_cur") + 0.5) / (F.col("tc") + 5.0)
    terms = (
        cnt.withColumn("tr", F.sum("n_ref").over(w_all).cast("bigint"))
        .withColumn("tc", F.sum("n_cur").over(w_all).cast("bigint"))
        .select(
            "bin",
            "n_ref",
            "n_cur",
            p_ref.alias("p_ref"),
            p_cur.alias("p_cur"),
            ((p_ref - p_cur) * F.log(p_ref / p_cur))
            .cast("decimal(18,12)")
            .cast("double")
            .alias("psi_term"),
        )
    )
    return (
        terms.withColumn(
            "psi",
            F.sum(F.col("psi_term").cast("decimal(18,12)"))
            .over(w_all)
            .cast("double"),
        )
        .select(
            "bin", "n_ref", "n_cur", "p_ref", "p_cur", "psi_term",
            "psi", (F.col("psi") > 0.2).alias("drifted_02"),
        )
        .orderBy("bin")
    )


@declare(
    "eval_brier",
    sql=f"""
    WITH lab AS (
      SELECT least(value / 500.0, 1.0) AS p,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             least(CAST(floor(value / 50.0) AS BIGINT), 9) AS bin
      FROM events WHERE event_type IN ('purchase', 'view')),
    bins AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS nk,
             CAST(sum(y) AS BIGINT) AS pk,
             CAST(sum(CAST(p AS DECIMAL(18,12))) AS DOUBLE) AS sp,
             CAST(sum(CAST((p - y) * (p - y) AS DECIMAL(18,12))) AS DOUBLE)
               AS sq
      FROM lab GROUP BY bin),
    tot AS (SELECT CAST(sum(nk) AS BIGINT) AS n,
                   CAST(sum(pk) AS BIGINT) AS npos FROM bins),
    terms AS (
      SELECT nk, sq,
             CAST(CAST(nk * (sp / nk - CAST(pk AS DOUBLE) / nk)
                       * (sp / nk - CAST(pk AS DOUBLE) / nk)
                       AS DECIMAL(18,12)) AS DOUBLE) AS rel_t,
             CAST(CAST(nk * (CAST(pk AS DOUBLE) / nk
                             - CAST(npos AS DOUBLE) / n)
                       * (CAST(pk AS DOUBLE) / nk
                          - CAST(npos AS DOUBLE) / n)
                       AS DECIMAL(18,12)) AS DOUBLE) AS res_t
      FROM bins CROSS JOIN tot)
    SELECT t.n,
           CAST(sum(CAST(sq AS DECIMAL(18,12))) AS DOUBLE) / t.n AS brier,
           CAST(sum(CAST(rel_t AS DECIMAL(18,12))) AS DOUBLE) / t.n
             AS reliability,
           CAST(sum(CAST(res_t AS DECIMAL(18,12))) AS DOUBLE) / t.n
             AS resolution,
           (CAST(t.npos AS DOUBLE) / t.n)
             * (1.0 - CAST(t.npos AS DOUBLE) / t.n) AS uncertainty
    FROM terms CROSS JOIN tot t GROUP BY t.n, t.npos
    """,
    tags=("eval", "brier", "calibration", "beyond-parity"),
)
def eval_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score of the purchase-probability proxy (score/500, capped)
    with the Murphy decomposition over the 10 calibration bins:
    reliability (calibration error — lower better), resolution
    (discrimination — higher better), uncertainty (the ȳ(1−ȳ) floor).
    The full probabilistic-forecast report card in one row (binned
    decomposition: Brier = REL − RES + UNC up to within-bin score
    variance). ONE event scan: the bin aggregate carries n_k, Σy_k, Σp
    and Σ(p−y)² (each decimal-quantized pre-sum), so every output
    assembles from the 10-row frame with shared IEEE chains.

    Scale: one map-side projection + one 10-group hash aggregate;
    everything after is O(10) frame ops."""
    e = load_table(spark, sf_dir, "events")
    lab = e.filter(F.col("event_type").isin("purchase", "view")).select(
        F.least(F.col("value") / 500.0, F.lit(1.0)).alias("p"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.least(F.floor(F.col("value") / F.lit(50.0)), F.lit(9))
        .cast("bigint")
        .alias("bin"),
    )
    bins = (
        lab.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nk"),
            F.sum("y").cast("bigint").alias("pk"),
            F.sum(F.col("p").cast("decimal(18,12)"))
            .cast("double")
            .alias("sp"),
            F.sum(
                ((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))).cast(
                    "decimal(18,12)"
                )
            )
            .cast("double")
            .alias("sq"),
        )
    )
    # r12: totals attach via a GLOBAL window over the 10-row bin frame
    # instead of persist + aggregate + broadcast crossJoin
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    pbar = F.col("sp") / F.col("nk")
    ybar_k = F.col("pk").cast("double") / F.col("nk")
    ybar = F.col("npos").cast("double") / F.col("n")
    terms = bins.withColumn(
        "n", F.sum("nk").over(w_all).cast("bigint")
    ).withColumn("npos", F.sum("pk").over(w_all).cast("bigint")).select(
        "n",
        "npos",
        "sq",
        (F.col("nk") * (pbar - ybar_k) * (pbar - ybar_k))
        .cast("decimal(18,12)")
        .cast("double")
        .alias("rel_t"),
        (F.col("nk") * (ybar_k - ybar) * (ybar_k - ybar))
        .cast("decimal(18,12)")
        .cast("double")
        .alias("res_t"),
    )
    return terms.groupBy("n", "npos").agg(
        (
            F.sum(F.col("sq").cast("decimal(18,12)")).cast("double")
            / F.col("n")
        ).alias("brier"),
        (
            F.sum(F.col("rel_t").cast("decimal(18,12)")).cast("double")
            / F.col("n")
        ).alias("reliability"),
        (
            F.sum(F.col("res_t").cast("decimal(18,12)")).cast("double")
            / F.col("n")
        ).alias("resolution"),
    ).select(
        "n",
        "brier",
        "reliability",
        "resolution",
        (ybar * (F.lit(1.0) - ybar)).alias("uncertainty"),
    )


@declare(
    "eval_ece",
    sql=f"""
    WITH lab AS ({_LAB_SQL}),
    binned AS (
      SELECT least(CAST(floor(v / 50.0) AS BIGINT), 9) AS bin, v, y
      FROM lab),
    bins AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(sum(CAST(v AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sv
      FROM binned GROUP BY bin),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM bins),
    terms AS (
      SELECT nt,
             CAST(abs(CAST(n_pos AS DOUBLE) / n
                      - CAST(sv AS DOUBLE) / n / 500.0) * n / nt
                  AS DECIMAL(28,18)) AS term
      FROM bins CROSS JOIN tot)
    SELECT CAST(max(nt) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_bins,
           CAST(CAST(sum(term) AS DECIMAL(38,18)) AS DOUBLE) AS ece
    FROM terms
    """,
    tags=("eval", "calibration", "ece", "beyond-parity"),
)
def eval_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Calibration Error — the single number the
    eval_calibration reliability TABLE rolls up to: Σ (n_b/N)·|pos_rate_b
    − p̂_b| over the same 10 fixed-width score bins, with the predicted
    probability p̂ = mean_score/500 (the linear map of the 0..500 score
    domain — stated, not hidden). Per-bin terms are fixed IEEE chains
    off exact counts and DECIMAL score sums, quantized to DECIMAL(28,18)
    before the order-independent sum (the eval_avg_precision
    convention), so the scalar hashes bit-identically.

    Scale: one map-side binning + a 10-row aggregate + a 1-row total —
    nothing is corpus-grain after the first fold."""
    lab = _labeled(spark, sf_dir)
    bins = (
        lab.withColumn(
            "bin",
            F.least(F.floor(F.col("v") / F.lit(50.0)), F.lit(9)).cast(
                "bigint"
            ),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("n_pos"),
            F.sum(F.col("v").cast("decimal(18,6)"))
            .cast("decimal(38,6)")
            .alias("sv"),
        )
    )
    return ece_scan(bins)


def ece_scan(bins: DataFrame) -> DataFrame:
    """The ECE scoring stage over a (bin, n, n_pos, sv) counter table —
    factored (the auc_scan / psi_scan / ks_scan convention) so the
    streaming twin ``stream_eval_ece`` scores its MAINTAINED counter
    table with the identical plan and shares this oracle bit-for-bit
    (bin counters and decimal score sums are LINEAR, so the maintained
    table equals the one-shot batch build exactly)."""
    tot = bins.agg(F.sum("n").cast("bigint").alias("nt"))
    term = (
        F.abs(
            F.col("n_pos").cast("double") / F.col("n")
            - F.col("sv").cast("double") / F.col("n") / F.lit(500.0)
        )
        * F.col("n")
        / F.col("nt")
    ).cast("decimal(28,18)")
    return (
        bins.crossJoin(F.broadcast(tot))
        .select("nt", term.alias("term"))
        .agg(
            F.max("nt").cast("bigint").alias("n_events"),
            F.count(F.lit(1)).cast("bigint").alias("n_bins"),
            F.sum("term").cast("decimal(38,18)").cast("double").alias("ece"),
        )
    )


@declare(
    "eval_cohens_kappa",
    sql=r"""
    WITH f AS (
      SELECT CASE WHEN CAST(len(string_split_regex(trim(text), '\s+'))
                       AS BIGINT) >= 50 THEN 1 ELSE 0 END AS a,
             CASE WHEN 100 * CAST(len(list_filter(
                        string_split_regex(lower(text), '\s+'),
                        t -> list_contains(
                          ['the','a','of','and','to','in','is','that','it','for'],
                          t))) AS BIGINT)
                     >= 6 * CAST(len(string_split_regex(trim(text), '\s+'))
                                 AS BIGINT)
                  THEN 1 ELSE 0 END AS b
      FROM documents),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a) AS BIGINT) AS na,
             CAST(sum(b) AS BIGINT) AS nb,
             CAST(sum(a * b) AS BIGINT) AS n11,
             CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
      FROM f)
    SELECT n, na AS n_rater_a, nb AS n_rater_b, n11 AS n_both,
           n00 AS n_neither,
           CAST(n11 + n00 AS DOUBLE) / n AS p_observed,
           CAST(na * nb + (n - na) * (n - nb) AS DOUBLE)
             / (CAST(n AS DOUBLE) * n) AS p_expected,
           CASE WHEN na * nb + (n - na) * (n - nb) < n * n THEN
             (CAST(n11 + n00 AS DOUBLE) / n
              - CAST(na * nb + (n - na) * (n - nb) AS DOUBLE)
                / (CAST(n AS DOUBLE) * n))
             / (1.0 - CAST(na * nb + (n - na) * (n - nb) AS DOUBLE)
                      / (CAST(n AS DOUBLE) * n))
           END AS kappa
    FROM c
    """,
    tags=("eval", "agreement", "kappa", "text", "beyond-parity"),
)
def eval_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two corpus quality raters — chance-corrected
    agreement, the number that says whether a cheap heuristic actually
    AGREES with another beyond what base rates force. Rater A keeps docs
    with ≥ 50 tokens; rater B keeps docs with stopword ratio ≥ 6%
    (compared as 100·n_stop ≥ 6·n_tokens — an exact integer predicate,
    no float-threshold hazard between engines). κ = (p_o − p_e)/(1 −
    p_e) from exact BIGINT cell counts; NULL when p_e = 1 (degenerate
    marginals).

    Scale: one corpus scan folding to a 1-row contingency summary —
    map-side CASE sums, no shuffle beyond the final fold."""
    from ..functions import text as T

    d = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.lower(F.col("text")))
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(*T.STOPWORDS["en"]))
    ).cast("bigint")
    n_tok = T.token_count(F.col("text"))
    f = d.select(
        F.when(n_tok >= 50, 1).otherwise(0).alias("a"),
        F.when(100 * n_stop >= 6 * n_tok, 1).otherwise(0).alias("b"),
    )
    c = f.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("a").cast("bigint").alias("na"),
        F.sum("b").cast("bigint").alias("nb"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("n11"),
        F.sum((1 - F.col("a")) * (1 - F.col("b")))
        .cast("bigint")
        .alias("n00"),
    )
    pe_num = F.col("na") * F.col("nb") + (F.col("n") - F.col("na")) * (
        F.col("n") - F.col("nb")
    )
    po = (F.col("n11") + F.col("n00")).cast("double") / F.col("n")
    pe = pe_num.cast("double") / (F.col("n").cast("double") * F.col("n"))
    return c.select(
        "n",
        F.col("na").alias("n_rater_a"),
        F.col("nb").alias("n_rater_b"),
        F.col("n11").alias("n_both"),
        F.col("n00").alias("n_neither"),
        po.alias("p_observed"),
        pe.alias("p_expected"),
        F.when(pe_num < F.col("n") * F.col("n"), (po - pe) / (1.0 - pe)).alias(
            "kappa"
        ),
    )


@declare(
    "eval_log_loss",
    sql="""
    WITH lab AS (
      SELECT least(greatest(value / 500.0, 0.000001), 0.999999) AS p,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE event_type IN ('purchase', 'view')),
    g AS (
      SELECT p, CAST(sum(y) AS BIGINT) AS pos,
             CAST(sum(1 - y) AS BIGINT) AS neg
      FROM lab GROUP BY p),
    terms AS (
      SELECT pos, neg,
             CAST(-(pos * ln(p) + neg * ln(1.0 - p)) AS DECIMAL(28,12))
               AS t
      FROM g)
    SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(neg) AS BIGINT) AS n_neg,
           CAST(sum(t) AS DOUBLE) / (sum(pos) + sum(neg)) AS log_loss
    FROM terms
    """,
    tags=("eval", "log-loss", "calibration", "beyond-parity"),
)
def eval_log_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-entropy (log loss) of the purchase-probability proxy
    (score/500, clipped to [1e-6, 1-1e-6] per the sklearn convention so
    a confidently-wrong row costs ln(1e6), not infinity) — the proper
    scoring rule that, unlike Brier, punishes overconfidence
    exponentially. Terms are computed at the VALUE GRAIN (one ln pair
    per distinct score: pos·(-ln p) + neg·(-ln(1-p))), each quantized to
    DECIMAL(28,12) before the order-independent decimal sum — the
    eval_brier discipline, so the oracle hashes bit-identically.

    Scale: one hash aggregate to the score grain (map-side partials),
    then O(#grains) math; the events table is never shuffled at row
    grain."""
    lab = _labeled(spark, sf_dir).select(
        F.least(
            F.greatest(F.col("v") / 500.0, F.lit(0.000001)),
            F.lit(0.999999),
        ).alias("p"),
        "y",
    )
    g = lab.groupBy("p").agg(
        F.sum("y").cast("bigint").alias("pos"),
        F.sum(1 - F.col("y")).cast("bigint").alias("neg"),
    )
    return log_loss_scan(g)


def log_loss_scan(g: DataFrame) -> DataFrame:
    """The log-loss scoring stage over a (p, pos, neg) score-grain
    counter table — factored (the auc/psi/ks/ece _scan convention) so
    the streaming twin ``stream_eval_log_loss`` scores its MAINTAINED
    counter table with the identical plan and shares this oracle
    bit-for-bit (grain counts are LINEAR — they fold by SUM across
    micro-batches — and the ln terms are computed from the folded
    counters at scoring time, so the maintained table equals the
    one-shot batch build exactly)."""
    t = g.select(
        "pos",
        "neg",
        (
            -(
                F.col("pos") * F.log(F.col("p"))
                + F.col("neg") * F.log(1.0 - F.col("p"))
            )
        )
        .cast("decimal(28,12)")
        .alias("t"),
    )
    return t.agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum("neg").cast("bigint").alias("n_neg"),
        (
            F.sum("t").cast("double")
            / (F.sum("pos") + F.sum("neg"))
        ).alias("log_loss"),
    )


@declare(
    "eval_matthews_corr",
    sql="""
    WITH lab AS (
      SELECT CASE WHEN value >= 250.0 THEN 1 ELSE 0 END AS yhat,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE event_type IN ('purchase', 'view')),
    c AS (
      SELECT CAST(sum(y * yhat) AS BIGINT) AS tp,
             CAST(sum((1 - y) * yhat) AS BIGINT) AS fp,
             CAST(sum(y * (1 - yhat)) AS BIGINT) AS fn,
             CAST(sum((1 - y) * (1 - yhat)) AS BIGINT) AS tn
      FROM lab)
    SELECT tp, fp, fn, tn,
           CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn) AS accuracy,
           CASE WHEN (tp+fp) * (tp+fn) * (tn+fp) * (tn+fn) > 0 THEN
             (CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
             / sqrt(CAST((tp+fp) AS DOUBLE) * (tp+fn) * (tn+fp) * (tn+fn))
           END AS mcc
    FROM c
    """,
    tags=("eval", "mcc", "classification", "beyond-parity"),
)
def eval_matthews_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient at the fixed decision threshold
    score >= 250 (mid-scale of the 0-500 proxy) — the single-number
    confusion summary that stays honest under class imbalance where
    accuracy saturates (a 95%-negative corpus scores ~0.95 accuracy on
    the trivial rejector; MCC ~0). Confusion counts are exact BIGINTs
    from one aggregate; MCC is one fixed IEEE chain with the zero-margin
    guard (any empty row/column of the confusion matrix -> NULL, the
    sklearn undefined case).

    Scale: a single map-side-partial aggregate over the label scan —
    no shuffle at row grain, no window."""
    lab = _labeled(spark, sf_dir).select(
        F.when(F.col("v") >= 250.0, 1).otherwise(0).alias("yhat"), "y"
    )
    c = lab.agg(
        F.sum(F.col("y") * F.col("yhat")).cast("bigint").alias("tp"),
        F.sum((1 - F.col("y")) * F.col("yhat")).cast("bigint").alias("fp"),
        F.sum(F.col("y") * (1 - F.col("yhat"))).cast("bigint").alias("fn"),
        F.sum((1 - F.col("y")) * (1 - F.col("yhat")))
        .cast("bigint")
        .alias("tn"),
    )
    prod = (
        (F.col("tp") + F.col("fp"))
        * (F.col("tp") + F.col("fn"))
        * (F.col("tn") + F.col("fp"))
        * (F.col("tn") + F.col("fn"))
    )
    return c.select(
        "tp",
        "fp",
        "fn",
        "tn",
        (
            (F.col("tp") + F.col("tn")).cast("double")
            / (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn"))
        ).alias("accuracy"),
        F.when(
            prod > 0,
            (
                F.col("tp").cast("double") * F.col("tn")
                - F.col("fp").cast("double") * F.col("fn")
            )
            / F.sqrt(
                (F.col("tp") + F.col("fp")).cast("double")
                * (F.col("tp") + F.col("fn"))
                * (F.col("tn") + F.col("fp"))
                * (F.col("tn") + F.col("fn"))
            ),
        ).alias("mcc"),
    )

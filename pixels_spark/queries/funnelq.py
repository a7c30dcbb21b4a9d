"""Behavioral event analytics: funnel progression + retention cohorts.

ClickHouse-school event analytics (windowFunnel / retention) that the
reference's ClickBench workload family implies but has no dedicated
operator for — both are expressible as ordinary joins + aggregates, so
each stays one declarative Catalyst plan.

Scale notes (100 TB of events):
- Both funnels are ONE scan + one user-keyed Exchange: stacked
  running-min/max windows over a strictly-earlier range frame carry
  exactly the per-user chain state a sequential scan would (per-row
  state, no arrays collected), then a conditional aggregate finishes.
  The windows are sort-based streaming aggregates, so a user with a
  billion events costs memory O(1), and the single shuffle replaces the
  three type-pruned scans + five shuffles of the join-chain formulation.
- Retention shuffles (user, day) pairs twice (cohort min + distinct
  activity), both already reduced to per-user-day granularity map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import declare


@declare(
    "funnel_signup_click_purchase",
    sql="""
    WITH su AS (
      SELECT user_id, min(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    cl AS (
      SELECT e.user_id, min(e.ts) AS click_ts
      FROM events e JOIN su ON e.user_id = su.user_id AND e.ts > su.signup_ts
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    pu AS (
      SELECT e.user_id, min(e.ts) AS purchase_ts
      FROM events e JOIN cl ON e.user_id = cl.user_id AND e.ts > cl.click_ts
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT su.user_id,
           CAST(su.signup_ts AS TIMESTAMP) AS signup_ts,
           CAST(cl.click_ts AS TIMESTAMP) AS click_ts,
           CAST(pu.purchase_ts AS TIMESTAMP) AS purchase_ts,
           CAST(1 + CAST(cl.click_ts IS NOT NULL AS INT)
                  + CAST(pu.purchase_ts IS NOT NULL AS INT) AS BIGINT)
               AS stage
    FROM su
    LEFT JOIN cl ON su.user_id = cl.user_id
    LEFT JOIN pu ON su.user_id = pu.user_id
    ORDER BY su.user_id
    """,
    tags=("funnel", "behavioral", "events"),
)
def funnel_signup_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (signup -> first later click -> first later
    purchase) per user, with the stage reached.

    ONE scan, one user-keyed Exchange: two stacked running-min windows
    over a strictly-earlier RANGE frame (µs-long event time, so same-ts
    ties are excluded deterministically — matching the oracle's strict
    ``ts >`` joins) mark each click that has an earlier signup and each
    purchase that has an earlier qualifying click; a final conditional
    aggregate takes the three firsts. Equivalent to the 3-subquery oracle:
    a click qualifies iff an earlier signup exists iff
    click_ts > min(signup_ts), and likewise for purchases over qualifying
    clicks. The previous shape (3 type-pruned scans + 2 join-aggregate
    chains + 2 left joins) read events three times and shuffled five; this
    reads once and shuffles once — the shape that matters when events is
    the 100 TB table."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    tpe = F.col("event_type")
    e = e.withColumn("_tsu", F.unix_micros(F.col("ts")))
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("_tsu")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    e = e.withColumn(
        "_run_su", F.min(F.when(tpe == "signup", F.col("_tsu"))).over(w_prev)
    )
    e = e.withColumn(
        "_run_cl",
        F.min(
            F.when((tpe == "click") & F.col("_run_su").isNotNull(), F.col("_tsu"))
        ).over(w_prev),
    )
    agg = (
        e.groupBy("user_id")
        .agg(
            F.min(F.when(tpe == "signup", F.col("ts"))).alias("signup_ts"),
            F.min(
                F.when((tpe == "click") & F.col("_run_su").isNotNull(), F.col("ts"))
            ).alias("click_ts"),
            F.min(
                F.when(
                    (tpe == "purchase") & F.col("_run_cl").isNotNull(), F.col("ts")
                )
            ).alias("purchase_ts"),
        )
        .filter(F.col("signup_ts").isNotNull())
    )
    stage = (
        F.lit(1)
        + F.col("click_ts").isNotNull().cast("int")
        + F.col("purchase_ts").isNotNull().cast("int")
    ).cast("bigint")
    return agg.select(
        "user_id", "signup_ts", "click_ts", "purchase_ts", stage.alias("stage")
    ).orderBy("user_id")


@declare(
    "retention_cohorts",
    sql="""
    WITH cohort AS (
      SELECT user_id, min(CAST(date_trunc('day', ts) AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    )
    SELECT c.cohort_day,
           CAST(datediff('day', c.cohort_day, a.day) AS BIGINT) AS day_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS active_users
    FROM act a JOIN cohort c ON a.user_id = c.user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("retention", "behavioral", "events"),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: users bucketed by first-seen day (cohort), then
    distinct active users per (cohort, day-offset) cell — the classic
    D0/D1/.../Dn retention matrix."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    )
    cohort = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    act = e.distinct()
    return (
        act.join(cohort, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("bigint").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").cast("bigint").alias("active_users"))
        .orderBy("cohort_day", "day_offset")
    )


@declare(
    "cb_window_funnel",
    sql="""
    WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
               FROM events),
    su AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'signup'),
    l2 AS (SELECT DISTINCT c.user_id
           FROM e c JOIN e s ON s.user_id = c.user_id
           WHERE s.event_type = 'signup' AND c.event_type = 'click'
             AND s.ts < c.ts AND c.ts <= s.ts + INTERVAL 24 HOURS),
    l3 AS (SELECT DISTINCT p.user_id
           FROM e p JOIN e c ON c.user_id = p.user_id
                    JOIN e s ON s.user_id = p.user_id
           WHERE s.event_type = 'signup' AND c.event_type = 'click'
             AND p.event_type = 'purchase'
             AND s.ts < c.ts AND c.ts < p.ts
             AND p.ts <= s.ts + INTERVAL 24 HOURS),
    lv AS (SELECT u.user_id,
                  1 + (CASE WHEN u.user_id IN (SELECT user_id FROM l2)
                            THEN 1 ELSE 0 END)
                    + (CASE WHEN u.user_id IN (SELECT user_id FROM l3)
                            THEN 1 ELSE 0 END) AS funnel_level
           FROM su u)
    SELECT CAST(funnel_level AS BIGINT) AS funnel_level,
           CAST(count(*) AS BIGINT) AS n_users
    FROM lv GROUP BY funnel_level ORDER BY funnel_level
    """,
    tags=("funnel", "behavioral", "window_funnel", "events"),
)
def cb_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel (ClickHouse-style): per user, the deepest
    signup→click→purchase chain whose TOTAL span fits a 24 h window —
    unlike the global funnel, every step must happen within the window of
    the chain's first step.

    One scan, one user-keyed Exchange, like the global funnel: the key
    identity is that a purchase completes a chain iff
    max over earlier clicks of (latest signup before that click)
    >= purchase_ts - W — so two stacked running-max windows carry exactly
    the chain state a per-user sequential scan would, with per-row state
    only. The oracle states the EXISTS-chain semantics via self-joins
    (fine at oracle scale; the windowed form is the one that scales).
    Level monotonicity (a level-3 chain's click is itself a level-2
    witness) makes 1 + l2 + l3 the max level reached."""
    from pyspark.sql.window import Window

    W_US = 24 * 3600 * 1_000_000
    tpe = F.col("event_type")
    e = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts")
        .withColumn("_tsu", F.unix_micros(F.col("ts")))
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("_tsu")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    e = e.withColumn(
        "_lsu", F.max(F.when(tpe == "signup", F.col("_tsu"))).over(w_prev)
    )
    e = e.withColumn(
        "_best", F.max(F.when(tpe == "click", F.col("_lsu"))).over(w_prev)
    )
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.max(F.when(tpe == "signup", 1).otherwise(0)).alias("_has_su"),
            F.max(
                F.when(
                    (tpe == "click") & (F.col("_lsu") >= F.col("_tsu") - W_US), 1
                ).otherwise(0)
            ).alias("_l2"),
            F.max(
                F.when(
                    (tpe == "purchase") & (F.col("_best") >= F.col("_tsu") - W_US), 1
                ).otherwise(0)
            ).alias("_l3"),
        )
        .filter(F.col("_has_su") == 1)
    )
    return (
        per_user.select(
            (F.lit(1) + F.col("_l2") + F.col("_l3"))
            .cast("bigint")
            .alias("funnel_level")
        )
        .groupBy("funnel_level")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("funnel_level")
    )


_TRANSITION_SQL = """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events WHERE user_id IS NOT NULL),
    cnt AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type),
    tot AS (SELECT from_type, SUM(n) AS t FROM cnt GROUP BY from_type)
    SELECT c.from_type, c.to_type, c.n,
           CAST(c.n AS DOUBLE) / t.t AS p
    FROM cnt c JOIN tot t ON c.from_type = t.from_type
    ORDER BY c.from_type, c.to_type
    """


@declare(
    "ev_transition_matrix",
    sql=_TRANSITION_SQL,
    tags=("events", "markov", "window", "behavioral", "beyond-parity"),
)
def ev_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    for every (from_type → to_type) adjacent pair (ordered by ts with
    event_id tiebreak), the count and the row-normalized probability —
    the behavioral model behind next-action prediction, funnel-leak
    triage, and bot detection (improbable chains). Exact: integer counts,
    one double division (n / row_total) identical in both engines;
    dialect-shared oracle.

    Scale: ONE user-keyed shuffle for the lead() window (sort-based
    streaming frame, O(1) memory per user), then a transition-cardinality
    aggregate (≤ |types|² rows) and its row-total self-aggregation —
    everything after the window is tiny."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    cnt = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = cnt.groupBy("from_type").agg(F.sum("n").alias("_t"))
    return (
        cnt.join(tot, "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            (F.col("n").cast("double") / F.col("_t")).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


_TOP_PATHS_SQL = """
    WITH seq AS (
      SELECT user_id, event_type,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events WHERE user_id IS NOT NULL),
    paths AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM seq WHERE rn <= 5 GROUP BY user_id)
    SELECT path, CAST(count(*) AS BIGINT) AS n_users
    FROM paths GROUP BY path
    ORDER BY n_users DESC, path LIMIT 20
    """


@declare(
    "ev_top_paths",
    sql=_TOP_PATHS_SQL,
    tags=("events", "path-analysis", "window", "behavioral", "beyond-parity"),
)
def ev_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: each user's first five events (ordered by ts
    with event_id tiebreak) joined into a '>'-separated path string, then
    the 20 most common paths with their user counts — the Sankey /
    journey-map aggregation product analytics tools ship, generalizing
    ev_transition_matrix from single hops to full prefixes. Exact:
    deterministic ordering (ts, event_id unique), integer counts,
    (n_users DESC, path) total order at the LIMIT boundary.

    Scale: ONE user-keyed Exchange — the row_number window and the
    per-user path assembly group on the SAME key, so Catalyst reuses the
    partitioning (no second shuffle); per-user state is the 5-row prefix
    only (rn filter before collect). The path-frequency aggregate is
    map-side combinable and its cardinality is bounded by |types|^5, and
    top-20 is per-partition heaps + single merge, never a global sort of
    users."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") <= 5)
    paths = seq.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(20)
    )


_WILSON = """(
  (CAST(conv AS DOUBLE) / CAST(base AS DOUBLE)
     + 1.9208 / CAST(base AS DOUBLE)
   {sign} 1.96 * sqrt((CAST(conv AS DOUBLE) / CAST(base AS DOUBLE))
            * (1.0 - CAST(conv AS DOUBLE) / CAST(base AS DOUBLE))
            / CAST(base AS DOUBLE)
            + 0.9604 / (CAST(base AS DOUBLE) * CAST(base AS DOUBLE))))
  / (1.0 + 3.8416 / CAST(base AS DOUBLE)))"""


@declare(
    "funnel_wilson_ci",
    sql=f"""
    WITH s AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
    ), conv_u AS (
      SELECT DISTINCT e.user_id
      FROM events e
      WHERE e.event_type = 'purchase'
        AND EXISTS (SELECT 1 FROM events s2
                    WHERE s2.event_type = 'signup'
                      AND s2.user_id = e.user_id AND s2.ts < e.ts)
    ), c AS (
      SELECT CAST((SELECT count(*) FROM s) AS BIGINT) AS base,
             CAST((SELECT count(*) FROM conv_u) AS BIGINT) AS conv
    )
    SELECT base, conv,
           CAST(conv AS DOUBLE) / CAST(base AS DOUBLE) AS rate,
           {_WILSON.format(sign='-')} AS ci_lo,
           {_WILSON.format(sign='+')} AS ci_hi
    FROM c
    """,
    tags=("funnel", "stats", "confidence-interval", "beyond-parity"),
)
def funnel_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion rate with a 95% WILSON score interval —
    the uncertainty a dashboard should print next to any funnel rate
    (the normal approximation misbehaves at small counts / extreme
    rates; Wilson doesn't). base = distinct signed-up users, conv =
    those with a purchase strictly after a signup; the interval is one
    fixed IEEE chain from the two exact counts (z = 1.96, z² = 3.8416
    and z²/2 = 1.9208 as exact decimal literals), so the oracle matches
    exactly and the text is dialect-shared.

    Scale: ONE scan, one user-keyed aggregate (exists-purchase-after ==
    max purchase ts > min signup ts per user), one closing aggregate;
    the CI math is O(1). Plan-asserted single FileScan."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "purchase")
    )
    # exists-purchase-after-first-signup == max(purchase ts) > min(signup
    # ts): base and conv are ONE per-user aggregate + one closing
    # aggregate — a single scan, no join, no scalar crossJoin
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "_fs"
        ),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "_mp"
        ),
    )
    c = per_user.filter(F.col("_fs").isNotNull()).agg(
        F.count(F.lit(1)).cast("bigint").alias("base"),
        F.sum(F.when(F.col("_mp") > F.col("_fs"), 1).otherwise(0))
        .cast("bigint")
        .alias("conv"),
    )
    return c.select(
        "base",
        "conv",
        F.expr("CAST(conv AS DOUBLE) / CAST(base AS DOUBLE)").alias("rate"),
        F.expr(_WILSON.format(sign="-")).alias("ci_lo"),
        F.expr(_WILSON.format(sign="+")).alias("ci_hi"),
    )

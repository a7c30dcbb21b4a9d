"""Behavioral event analytics: funnel progression + retention cohorts.

ClickHouse-school event analytics (windowFunnel / retention) that the
reference's ClickBench workload family implies but has no dedicated
operator for — both are expressible as ordinary joins + aggregates, so
each stays one declarative Catalyst plan.

Scale notes (100 TB of events):
- The funnel makes three event_type-filtered scans; each pushes its
  type predicate into the parquet scan (row-group stat skipping on a
  type-clustered layout), and every join after the first aggregate is
  per-user-aggregate sized — AQE broadcasts them. The alternative
  single-scan form (collect ts arrays per user) shuffles ALL events by
  user; three pruned scans beat one full shuffle when the funnel's event
  types are a fraction of the stream.
- Retention shuffles (user, day) pairs twice (cohort min + distinct
  activity), both already reduced to per-user-day granularity map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
    purchase) per user, with the stage reached. Three type-pruned scans;
    every post-aggregate join is broadcast-sized."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    su = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    cl = (
        e.filter(F.col("event_type") == "click")
        .join(su, "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    pu = (
        e.filter(F.col("event_type") == "purchase")
        .join(cl, "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    stage = (
        F.lit(1)
        + F.col("click_ts").isNotNull().cast("int")
        + F.col("purchase_ts").isNotNull().cast("int")
    ).cast("bigint")
    return (
        su.join(cl, "user_id", "left")
        .join(pu, "user_id", "left")
        .select(
            "user_id", "signup_ts", "click_ts", "purchase_ts",
            stage.alias("stage"),
        )
        .orderBy("user_id")
    )


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

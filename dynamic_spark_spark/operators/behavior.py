"""Behavioral event analytics — funnel + cohort retention.

The reference's streaming parent (`pom.xml:30`) exists to run exactly this
kind of user-event analysis as pipeline stages ("full access to all Spark
features", ``docs/ScalaSparkCompute-sparkcompute.md:5-6``); these keys prove
the two canonical event-table workloads as single Catalyst plans over the
``events`` fixture.

- ``funnel_click_purchase`` — ordered two-step funnel: for each user, the
  first click and the first purchase strictly after it. The first step is a
  conditional-min aggregate (map-side combinable, one shuffle); the second
  re-joins the changelog once, shuffling on the same user_id key so AQE can
  reuse the partitioning.
- ``cohort_retention`` — weekly cohort × activity matrix: users cohorted by
  first-event week, counted distinct per (cohort_week, active_week). Both
  levels are hash aggregates; the user-grain intermediate is far smaller
  than the event table, so the second shuffle is cheap at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table

_FUNNEL_ORACLE = """
WITH c AS (
  SELECT user_id, MIN(ts) AS first_click
  FROM events WHERE event_type = 'click' GROUP BY user_id
)
SELECT c.user_id, c.first_click, MIN(e.ts) AS first_purchase
FROM c JOIN events e
  ON e.user_id = c.user_id
 AND e.event_type = 'purchase'
 AND e.ts > c.first_click
GROUP BY c.user_id, c.first_click
ORDER BY c.user_id
"""


@query("funnel_click_purchase", _FUNNEL_ORACLE, tag="behavior")
def funnel_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: first click, then first purchase after it, per user.
    Both aggregates are min() — commutative, partially aggregated map-side;
    the theta condition (purchase after click) rides on the user_id equi-join
    rather than forcing a nested-loop."""
    e = load_table(spark, sf_dir, "events")
    clicks = (
        e.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    return (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user")) & (F.col("p_ts") > F.col("first_click")),
        )
        .groupBy("user_id", "first_click")
        .agg(F.min("p_ts").alias("first_purchase"))
        .orderBy("user_id")
    )


_COHORT_ORACLE = """
WITH firsts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         date_trunc('week', e.ts) AS active_week
  FROM events e JOIN firsts f ON f.user_id = e.user_id
)
SELECT cohort_week, active_week, COUNT(*) AS n_users
FROM activity
GROUP BY cohort_week, active_week
ORDER BY cohort_week, active_week
"""


@query("cohort_retention", _COHORT_ORACLE, tag="behavior")
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix. The firsts aggregate compacts the
    event table to user grain before the join, so the broadcast/shuffle
    feeding the distinct is user-sized; the final matrix is tiny."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        e.join(firsts, "user_id")
        .select("user_id", "cohort_week", F.date_trunc("week", "ts").alias("active_week"))
        .distinct()
    )
    return (
        activity.groupBy("cohort_week", "active_week")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "active_week")
    )

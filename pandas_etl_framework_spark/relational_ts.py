"""Time-series analytics over the events table: cohort retention,
gap-filling with last-observation-carried-forward, and hypertable-style
multi-resolution rollups.

Capability-parity surface (the reference exposes full SQL via pandasql,
SURVEY.md §2.6); these are the shapes a product-analytics user of the
reference would write. Each query has a DuckDB oracle twin.

Determinism: day/hour arithmetic is integer on both engines (datediff /
date_trunc), sums use the quantized dsum pattern, and the LOCF window is
fully ordered by (user_id, hour) so IGNORE NULLS last-value agrees.

Scale posture: cohort retention and the rollup are plain hash aggregates
(map-side partial, one shuffle each). Gap-fill explodes one row per
user-hour — bounded by each user's OWN [min, max] activity span, not the
global time range, so a sparse user costs rows proportional to their
lifetime; the LOCF window shuffles once on user_id.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .relational import _sql_dsum, dsum, load_events


# --------------------------------------------------------------------------
# Cohort retention
# --------------------------------------------------------------------------

def q_events_cohort_retention(spark, sf_dir):
    """Classic retention triangle: users grouped by first-activity day
    (cohort), counted distinct on each later active day offset 0..7."""
    ev = load_events(spark, sf_dir)
    first = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    active = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("active_day")
    ).distinct()
    return (
        active.join(first, "user_id")
        .withColumn("day_k", F.datediff("active_day", "cohort_day"))
        .filter(F.col("day_k") <= 7)
        .groupBy("cohort_day", "day_k")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "day_k")
    )


SQL_EVENTS_COHORT_RETENTION = """
WITH first AS (
    -- DuckDB date_trunc('day') yields DATE; cast to TIMESTAMP to match Spark
    SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS cohort_day
    FROM events GROUP BY user_id
),
active AS (
    SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS active_day
    FROM events
)
SELECT cohort_day, datediff('day', cohort_day, active_day) AS day_k,
       COUNT(DISTINCT a.user_id) AS n_users
FROM active a JOIN first f ON a.user_id = f.user_id
WHERE datediff('day', cohort_day, active_day) <= 7
GROUP BY cohort_day, day_k
ORDER BY cohort_day, day_k
"""


# --------------------------------------------------------------------------
# Gap-fill + LOCF
# --------------------------------------------------------------------------

def q_events_gapfill_locf(spark, sf_dir):
    """Dense per-user hourly series over each user's own activity span,
    missing hours filled by carrying the last observed hourly sum forward
    (the time-series 'locf'/'ffill' operator). The hour spine is
    sequence(min_hour, max_hour, 1 hour) exploded per user — span-bounded,
    not global — and the fill is one ordered window per user."""
    ev = load_events(spark, sf_dir)
    hourly = (
        ev.groupBy(
            "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
        )
        .agg(dsum("value", "sum_value"))
    )
    spine = (
        ev.groupBy("user_id")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("lo"),
            F.date_trunc("hour", F.max("ts")).alias("hi"),
        )
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 hour"))
            ).alias("hour"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.col("sum_value").isNotNull().alias("observed"),
            F.last("sum_value", ignorenulls=True).over(w).alias("sum_value_filled"),
        )
    )


SQL_EVENTS_GAPFILL_LOCF = f"""
WITH hourly AS (
    SELECT user_id, date_trunc('hour', ts) AS hour,
           {_sql_dsum('value', 'sum_value')}
    FROM events GROUP BY user_id, date_trunc('hour', ts)
),
spine AS (
    SELECT user_id,
           unnest(generate_series(date_trunc('hour', MIN(ts)),
                                  date_trunc('hour', MAX(ts)),
                                  INTERVAL 1 HOUR)) AS hour
    FROM events GROUP BY user_id
)
SELECT s.user_id, s.hour,
       h.sum_value IS NOT NULL AS observed,
       LAST_VALUE(h.sum_value IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS sum_value_filled
FROM spine s
LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour
"""


# --------------------------------------------------------------------------
# Multi-resolution rollup (hypertable-style continuous aggregates)
# --------------------------------------------------------------------------

def q_events_multires_rollup(spark, sf_dir):
    """Hourly/daily/weekly aggregates in one result with a resolution tag —
    the batch shape of a hypertable's cascaded continuous aggregates. Each
    resolution is an independent hash aggregate; at scale the daily/weekly
    tiers should fold FROM the hourly tier (cascade) rather than rescan,
    which is exactly what reusing the cached hourly DataFrame does."""
    ev = load_events(spark, sf_dir)
    hourly = ev.groupBy(
        F.col("event_type"), F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 10_000).cast("long")).alias("sv_q"),
    )
    # cascade: day/week tiers fold the hourly partials, no second scan
    daily = (
        hourly.groupBy(
            "event_type", F.date_trunc("day", F.col("bucket")).alias("bucket")
        )
        .agg(F.sum("n").alias("n"), F.sum("sv_q").alias("sv_q"))
    )
    weekly = (
        daily.groupBy(
            "event_type", F.date_trunc("week", F.col("bucket")).alias("bucket")
        )
        .agg(F.sum("n").alias("n"), F.sum("sv_q").alias("sv_q"))
    )
    out = None
    for res, df in (("hour", hourly), ("day", daily), ("week", weekly)):
        tier = df.select(
            F.lit(res).alias("resolution"),
            "event_type",
            "bucket",
            "n",
            (F.col("sv_q").cast("double") / 10_000).alias("sum_value"),
        )
        out = tier if out is None else out.unionByName(tier)
    return out


SQL_EVENTS_MULTIRES_ROLLUP = """
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS bucket,
           COUNT(*) AS n,
           SUM(CAST(round(value * 10000) AS BIGINT)) AS sv_q
    FROM events GROUP BY event_type, date_trunc('hour', ts)
),
daily AS (
    SELECT event_type, date_trunc('day', bucket) AS bucket,
           SUM(n) AS n, SUM(sv_q) AS sv_q
    FROM hourly GROUP BY event_type, date_trunc('day', bucket)
),
weekly AS (
    SELECT event_type, date_trunc('week', bucket) AS bucket,
           SUM(n) AS n, SUM(sv_q) AS sv_q
    FROM daily GROUP BY event_type, date_trunc('week', bucket)
)
SELECT 'hour' AS resolution, event_type, bucket, n,
       CAST(sv_q AS DOUBLE) / 10000 AS sum_value FROM hourly
UNION ALL
SELECT 'day', event_type, bucket, n, CAST(sv_q AS DOUBLE) / 10000 FROM daily
UNION ALL
SELECT 'week', event_type, bucket, n, CAST(sv_q AS DOUBLE) / 10000 FROM weekly
"""


QUERIES = {
    "events_cohort_retention": (
        q_events_cohort_retention,
        SQL_EVENTS_COHORT_RETENTION,
    ),
    "events_gapfill_locf": (q_events_gapfill_locf, SQL_EVENTS_GAPFILL_LOCF),
    "events_multires_rollup": (
        q_events_multires_rollup,
        SQL_EVENTS_MULTIRES_ROLLUP,
    ),
}


def register_all() -> None:
    from . import harness

    for name, (fn, sql) in QUERIES.items():
        harness.register(name, fn, sql)

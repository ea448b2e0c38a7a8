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
           CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(sv_q) AS BIGINT) AS sv_q
    FROM hourly GROUP BY event_type, date_trunc('day', bucket)
),
weekly AS (
    SELECT event_type, date_trunc('week', bucket) AS bucket,
           CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(sv_q) AS BIGINT) AS sv_q
    FROM daily GROUP BY event_type, date_trunc('week', bucket)
)
SELECT 'hour' AS resolution, event_type, bucket, n,
       CAST(sv_q AS DOUBLE) / 10000 AS sum_value FROM hourly
UNION ALL
SELECT 'day', event_type, bucket, n, CAST(sv_q AS DOUBLE) / 10000 FROM daily
UNION ALL
SELECT 'week', event_type, bucket, n, CAST(sv_q AS DOUBLE) / 10000 FROM weekly
"""


# --------------------------------------------------------------------------
# Markov transition matrix over event sequences
# --------------------------------------------------------------------------

def q_events_transition_matrix(spark, sf_dir):
    """First-order Markov transition counts and probabilities between
    consecutive event types within each user's timeline (the 'what do users
    do next' analytic).  One window shuffle on user_id produces the bigrams;
    one hash aggregate counts them; the probability is a single IEEE
    division of identical BIGINTs, so it is engine-exact.  Ordering ties on
    ts break on event_id — deterministic bigrams."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wtot = Window.partitionBy("prev_type")
    return pairs.withColumn(
        "p", F.col("n").cast("double") / F.sum("n").over(wtot)
    )


SQL_EVENTS_TRANSITION_MATRIX = """
WITH pairs AS (
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n
    FROM (
        SELECT event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    )
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n,
       CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type) AS p
FROM pairs
"""


# --------------------------------------------------------------------------
# RFM segmentation
# --------------------------------------------------------------------------

def q_events_rfm(spark, sf_dir):
    """Recency / Frequency / Monetary user segmentation: days since last
    activity (vs the corpus max day), event count, quantized value sum, and
    NTILE(4) scores per dimension.  The per-user rollup is one hash
    aggregate; the three score windows order the small per-user relation
    with user_id tie-breaks so bucket assignment is deterministic and
    engine-identical.

    Scale note: an unpartitioned NTILE funnels the per-user relation through
    one reducer.  That is fine while users ≪ events (the relation is already
    three orders of magnitude smaller than the fact table); past that, swap
    the exact quartiles for broadcast approx_percentile thresholds — same
    output columns, no global sort."""
    ev = load_events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.max("ts")).alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        dsum("value", "monetary"),
    )
    gmax = ev.agg(F.date_trunc("day", F.max("ts")).alias("corpus_max_day"))
    rfm = per_user.crossJoin(F.broadcast(gmax)).withColumn(
        "recency_days", F.datediff("corpus_max_day", "last_day")
    )
    r_w = Window.orderBy(F.col("recency_days").asc(), F.col("user_id").asc())
    f_w = Window.orderBy(F.col("frequency").desc(), F.col("user_id").asc())
    m_w = Window.orderBy(F.col("monetary").desc(), F.col("user_id").asc())
    return rfm.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4).over(r_w).alias("r_score"),
        F.ntile(4).over(f_w).alias("f_score"),
        F.ntile(4).over(m_w).alias("m_score"),
    )


SQL_EVENTS_RFM = f"""
WITH per_user AS (
    SELECT user_id,
           CAST(date_trunc('day', MAX(ts)) AS TIMESTAMP) AS last_day,
           COUNT(*) AS frequency,
           {_sql_dsum('value', 'monetary')}
    FROM events GROUP BY user_id
),
g AS (SELECT CAST(date_trunc('day', MAX(ts)) AS TIMESTAMP) AS corpus_max_day
      FROM events)
SELECT user_id,
       datediff('day', last_day, corpus_max_day) AS recency_days,
       frequency, monetary,
       CAST(NTILE(4) OVER (
           ORDER BY datediff('day', last_day, corpus_max_day) ASC, user_id ASC)
           AS INTEGER) AS r_score,
       CAST(NTILE(4) OVER (ORDER BY frequency DESC, user_id ASC) AS INTEGER)
           AS f_score,
       CAST(NTILE(4) OVER (ORDER BY monetary DESC, user_id ASC) AS INTEGER)
           AS m_score
FROM per_user CROSS JOIN g
"""


def q_events_ewma(spark, sf_dir):
    """Per-user exponentially weighted moving average (α = 1/4) over the
    event-time-ordered value series — a sequential recurrence
    (v_k = ⌊(x_k + 3·v_{k-1}) / 4⌋) that NO window frame expresses, folded
    JVM-side: collect each user's bounded series into one sorted array and
    run a single ``aggregate`` lambda over it (one shuffle, no Python, no
    driver loop; per-user series are session-sized by construction). The
    oracle computes the same recurrence with a recursive CTE, so two
    entirely different execution strategies must meet bit-for-bit —
    values quantized to integers, division floored identically."""
    ev = load_events(spark, sf_dir)
    q = F.round(F.col("value") * 10000).cast("long")
    per_user = (
        ev.select(
            "user_id",
            F.struct(F.col("ts"), F.col("event_id"), q.alias("q")).alias("s"),
        )
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("s")).alias("xs"))
    )
    acc0 = F.struct(
        F.lit(False).alias("init"), F.lit(0).cast("long").alias("v")
    )
    fold = F.aggregate(
        F.col("xs"),
        acc0,
        lambda acc, x: F.struct(
            F.lit(True).alias("init"),
            F.when(~acc["init"], x["q"])
            .otherwise(F.floor((x["q"] + 3 * acc["v"]) / 4).cast("long"))
            .alias("v"),
        ),
        lambda acc: acc["v"],
    )
    return per_user.select("user_id", fold.alias("ewma_q"))


SQL_EVENTS_EWMA = """
WITH RECURSIVE seq AS (
    SELECT user_id,
           CAST(round(value * 10000) AS BIGINT) AS q,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS rn
    FROM events
),
r(user_id, rn, v) AS (
    SELECT user_id, CAST(1 AS BIGINT), q FROM seq WHERE rn = 1
    UNION ALL
    SELECT s.user_id, r.rn + 1,
           CAST(floor((s.q + 3 * r.v) / 4.0) AS BIGINT)
    FROM r JOIN seq s ON s.user_id = r.user_id AND s.rn = r.rn + 1
)
SELECT user_id, v AS ewma_q
FROM (
    SELECT user_id, v,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn DESC) AS rk
    FROM r
)
WHERE rk = 1
"""


QUERIES = {
    "events_ewma": (q_events_ewma, SQL_EVENTS_EWMA),
    "events_transition_matrix": (
        q_events_transition_matrix,
        SQL_EVENTS_TRANSITION_MATRIX,
    ),
    "events_rfm": (q_events_rfm, SQL_EVENTS_RFM),
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

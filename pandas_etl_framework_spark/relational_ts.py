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


CUSUM_SLACK_Q = 5_000       # drift allowance (0.5 in value units × 1e4)
CUSUM_THRESH_Q = 20_000     # alarm threshold (2.0 in value units × 1e4)


def q_events_cusum(spark, sf_dir):
    """Per-user one-sided CUSUM changepoint detection over the event-time
    series: c_k = max(0, c_{k-1} + (x_k − μ − slack)), alarm when c_k
    exceeds the threshold — the classic sequential drift detector (Page
    1954), another recurrence no window frame expresses. The per-user
    mean μ = S/n is kept EXACT by scaling the whole recurrence through by
    n: C_k = max(0, C_{k-1} + n·x_k − S − n·slack), alarm at C_k > n·h.
    One aggregation pass builds (sorted series, S, n) per user; one JVM
    array fold runs the detector. Output: (user_id, n_alarms,
    first_alarm_idx 1-based or 0, max_stat_scaled).

    Oracle: the same scaled recurrence as a recursive CTE — fold vs
    recursion, two engines, exact integers."""
    ev = load_events(spark, sf_dir)
    q = F.round(F.col("value") * 10000).cast("long")
    per_user = (
        ev.select(
            "user_id",
            F.struct(F.col("ts"), F.col("event_id"), q.alias("q")).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.sort_array(F.collect_list("s")).alias("xs"),
            F.sum(F.col("s")["q"]).alias("S"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    acc0 = F.struct(
        F.lit(0).cast("long").alias("c"),
        F.lit(0).cast("long").alias("n_alarms"),
        F.lit(0).cast("long").alias("first_idx"),
        F.lit(0).cast("long").alias("i"),
        F.lit(0).cast("long").alias("max_c"),
    )

    def step(acc, x):
        c = F.greatest(
            F.lit(0).cast("long"),
            acc["c"] + F.col("n") * x["q"] - F.col("S")
            - F.col("n") * CUSUM_SLACK_Q,
        )
        alarm = c > F.col("n") * CUSUM_THRESH_Q
        i = acc["i"] + 1
        return F.struct(
            c.alias("c"),
            (acc["n_alarms"] + alarm.cast("long")).alias("n_alarms"),
            F.when(
                alarm & (acc["first_idx"] == 0), i
            ).otherwise(acc["first_idx"]).alias("first_idx"),
            i.alias("i"),
            F.greatest(acc["max_c"], c).alias("max_c"),
        )

    fold = F.aggregate(F.col("xs"), acc0, step)
    return per_user.select(
        "user_id",
        fold["n_alarms"].alias("n_alarms"),
        fold["first_idx"].alias("first_alarm_idx"),
        fold["max_c"].alias("max_stat_scaled"),
    )


SQL_EVENTS_CUSUM = f"""
WITH RECURSIVE seq AS (
    SELECT user_id,
           CAST(round(value * 10000) AS BIGINT) AS q,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS rn,
           CAST(SUM(CAST(round(value * 10000) AS BIGINT))
                OVER (PARTITION BY user_id) AS BIGINT) AS S,
           CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
    FROM events
),
r(user_id, rn, c, n_alarms, first_idx, max_c) AS (
    SELECT user_id, CAST(1 AS BIGINT),
           GREATEST(CAST(0 AS BIGINT),
                    n * q - S - n * {CUSUM_SLACK_Q}),
           CAST(CASE WHEN GREATEST(CAST(0 AS BIGINT),
                         n * q - S - n * {CUSUM_SLACK_Q})
                         > n * {CUSUM_THRESH_Q} THEN 1 ELSE 0 END AS BIGINT),
           CAST(CASE WHEN GREATEST(CAST(0 AS BIGINT),
                         n * q - S - n * {CUSUM_SLACK_Q})
                         > n * {CUSUM_THRESH_Q} THEN 1 ELSE 0 END AS BIGINT),
           GREATEST(CAST(0 AS BIGINT),
                    n * q - S - n * {CUSUM_SLACK_Q})
    FROM seq WHERE rn = 1
    UNION ALL
    SELECT s.user_id, r.rn + 1,
           GREATEST(CAST(0 AS BIGINT),
                    r.c + s.n * s.q - s.S - s.n * {CUSUM_SLACK_Q}),
           r.n_alarms + CASE WHEN GREATEST(CAST(0 AS BIGINT),
                r.c + s.n * s.q - s.S - s.n * {CUSUM_SLACK_Q})
                > s.n * {CUSUM_THRESH_Q} THEN 1 ELSE 0 END,
           CASE WHEN r.first_idx > 0 THEN r.first_idx
                WHEN GREATEST(CAST(0 AS BIGINT),
                     r.c + s.n * s.q - s.S - s.n * {CUSUM_SLACK_Q})
                     > s.n * {CUSUM_THRESH_Q} THEN r.rn + 1
                ELSE CAST(0 AS BIGINT) END,
           GREATEST(r.max_c,
                    GREATEST(CAST(0 AS BIGINT),
                             r.c + s.n * s.q - s.S - s.n * {CUSUM_SLACK_Q}))
    FROM r JOIN seq s ON s.user_id = r.user_id AND s.rn = r.rn + 1
)
SELECT user_id, n_alarms, first_idx AS first_alarm_idx,
       max_c AS max_stat_scaled
FROM (
    SELECT user_id, n_alarms, first_idx, max_c,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn DESC) AS rk
    FROM r
)
WHERE rk = 1
"""


LTTB_NOUT = 8                     # points kept per series (first + 6 + last)
_LTTB_B = LTTB_NOUT - 2           # interior buckets


def lttb_downsample(events: DataFrame, n_out: int = LTTB_NOUT) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013) of
    each user's value series to ``n_out`` points: first and last points
    always kept; each interior bucket contributes the point forming the
    largest triangle with the PREVIOUSLY SELECTED point and the next
    bucket's average — the standard shape-preserving decimation for
    time-series visualization/thinning.

    Sequential cross-bucket dependency (each pick depends on the last) is
    exactly the per-group custom-stateful shape: an Arrow grouped-map
    runs the whole recurrence per user in one pass, integer-exact
    (epoch-relative times, 1e4-quantized values, cross-multiplied
    averages — no float division anywhere, ties to earlier time then
    lower index). Users with fewer than ``n_out`` points are dropped
    (nothing to thin). One shuffle on user_id; per-user series are
    session-sized by construction — and bounded: the oracle's fixed-width
    ordering key assumes idx < 1e6 and t_rel < 1e10 seconds (~317 years)
    per series; ``_sql_lttb`` raises (DuckDB ``error()``) instead of
    silently corrupting the ordering if a series ever exceeds them.

    The oracle is a COMPLETELY DIFFERENT execution: the recurrence
    unrolled as chained arg_max CTEs in DuckDB — two independent
    implementations must agree on every selected point.
    """
    import numpy as np
    import pandas as pd

    B = n_out - 2

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        n = len(pdf)
        if n < n_out:
            return pd.DataFrame(
                columns=["user_id", "step", "idx", "t_rel", "v_q"]
            ).astype("int64")
        t_abs = (pdf["ts"].astype("int64") // 1_000_000_000).to_numpy()
        t = t_abs - t_abs.min()
        v = np.round(pdf["value"].to_numpy() * 10000).astype(np.int64)
        k_of = ((np.arange(1, n - 1) - 1) * B) // (n - 2)  # interior buckets
        sel = [0]
        for k in range(B):
            ii = np.where(k_of == k)[0] + 1  # interior index -> global idx
            if k < B - 1:
                jj = np.where(k_of == k + 1)[0] + 1
                S_t, S_v, C = t[jj].sum(), v[jj].sum(), len(jj)
            else:
                S_t, S_v, C = t[n - 1], v[n - 1], 1
            pt, pv = t[sel[-1]], v[sel[-1]]
            area = np.abs(
                (pt * C - S_t) * (v[ii] - pv) - (pt - t[ii]) * (S_v - C * pv)
            )
            order = np.lexsort((-ii, -t[ii], area))  # max area, min t, min idx
            sel.append(int(ii[order[-1]]))
        sel.append(n - 1)
        uid = int(pdf["user_id"].iloc[0])
        return pd.DataFrame(
            {
                "user_id": uid,
                "step": np.arange(n_out, dtype=np.int64),
                "idx": np.asarray(sel, dtype=np.int64),
                "t_rel": t[sel],
                "v_q": v[sel],
            }
        )

    return events.select("user_id", "ts", "event_id", "value").groupBy(
        "user_id"
    ).applyInPandas(
        per_user,
        "user_id long, step long, idx long, t_rel long, v_q long",
    )


def q_events_lttb(spark, sf_dir):
    return lttb_downsample(load_events(spark, sf_dir))


def _sql_lttb() -> str:
    B = _LTTB_B
    steps = []
    for k in range(B):
        prev = f"s{k}"
        steps.append(f""",
c{k + 1} AS (
    SELECT i.user_id,
           -- composite order encoded as one fixed-width string (DuckDB's
           -- arg_max takes no list-typed ordering key): area desc, then
           -- earlier time, then lower index
           arg_max(
               [i.t_rel, i.v_q, i.idx],
               lpad(CAST(abs((p.pt * nx.C - nx.S_t) * (i.v_q - p.pv)
                    - (p.pt - i.t_rel) * (nx.S_v - nx.C * p.pv))
                    AS VARCHAR), 20, '0')
               || lpad(CAST(CASE WHEN i.t_rel < 10000000000
                            THEN 10000000000 - i.t_rel
                            ELSE CAST(error('lttb oracle: t_rel exceeds fixed-width bound') AS BIGINT)
                            END AS VARCHAR), 11, '0')
               || lpad(CAST(CASE WHEN i.idx < 1000000
                            THEN 1000000 - i.idx
                            ELSE CAST(error('lttb oracle: idx exceeds fixed-width bound') AS BIGINT)
                            END AS VARCHAR), 7, '0')
           ) AS sel
    FROM interior i
    JOIN {prev} p ON p.user_id = i.user_id
    JOIN nxt nx ON nx.user_id = i.user_id AND nx.k = {k}
    WHERE i.k = {k}
    GROUP BY i.user_id
),
s{k + 1} AS (
    SELECT user_id, sel[1] AS pt, sel[2] AS pv, sel[3] AS pidx FROM c{k + 1}
)""")
    picks = "\nUNION ALL\n".join(
        f"SELECT user_id, CAST({k + 1} AS BIGINT) AS step, pidx AS idx,"
        f" pt AS t_rel, pv AS v_q FROM s{k + 1}"
        for k in range(B)
    )
    return f"""
WITH seq AS (
    SELECT user_id, event_id,
           CAST(round(value * 10000) AS BIGINT) AS v_q,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) - 1 AS idx,
           COUNT(*) OVER (PARTITION BY user_id) AS n,
           -- epoch_us // 1e6 floors exactly like the int64-ns // path in
           -- the grouped map; CAST(epoch(ts) AS BIGINT) would ROUND a
           -- fractional second and diverge
           (epoch_us(ts) // 1000000)
             - MIN(epoch_us(ts) // 1000000)
                   OVER (PARTITION BY user_id) AS t_rel
    FROM events
),
big AS (SELECT * FROM seq WHERE n >= {LTTB_NOUT}),
interior AS (
    SELECT *, ((idx - 1) * {B}) // (n - 2) AS k
    FROM big WHERE idx >= 1 AND idx <= n - 2
),
stats AS (
    SELECT user_id, k,
           CAST(SUM(t_rel) AS BIGINT) AS S_t,
           CAST(SUM(v_q) AS BIGINT) AS S_v,
           CAST(COUNT(*) AS BIGINT) AS C
    FROM interior GROUP BY user_id, k
),
lastp AS (SELECT user_id, t_rel, v_q, idx FROM big WHERE idx = n - 1),
firstp AS (SELECT user_id, t_rel, v_q, idx FROM big WHERE idx = 0),
nxt AS (
    SELECT user_id, k - 1 AS k, S_t, S_v, C FROM stats WHERE k >= 1
    UNION ALL
    SELECT user_id, {B - 1} AS k, t_rel AS S_t, v_q AS S_v,
           CAST(1 AS BIGINT) AS C
    FROM lastp
),
s0 AS (SELECT user_id, t_rel AS pt, v_q AS pv, idx AS pidx FROM firstp)
{"".join(steps)}
SELECT user_id, CAST(0 AS BIGINT) AS step, idx, t_rel, v_q FROM firstp
UNION ALL
{picks}
UNION ALL
SELECT user_id, CAST({LTTB_NOUT - 1} AS BIGINT) AS step, idx, t_rel, v_q
FROM lastp
"""


# --------------------------------------------------------------------------
# Robust outlier detection: median absolute deviation
# --------------------------------------------------------------------------

def mad_outliers(
    events: DataFrame, value_col: str = "value", key: str = "user_id"
) -> DataFrame:
    """Per-key robust outlier summary: flag |x − median| > 3·1.4826·MAD
    (the standard robust z-score — unlike mean/stddev both statistics
    have a 50% breakdown point, so the outliers themselves can't mask
    the detector). Output: (key, n, median_value, mad_value, n_outliers).

    EXACT-INTEGER construction so both engines agree bit-for-bit:
    values are quantized ×10⁴ then scaled ×4, which makes every median
    integral (an even-count median averages two middles; multiples of 4
    average to an even integer, and the deviations — even minus even —
    average to an integer), and the flag rule is the pure-integer
    10⁴·|dev| > 3·14826·MAD (1.4826 carried as the rational 14826/10⁴).
    Exact ``percentile`` per key is two key-partitioned shuffles; for
    keys whose series outgrow a partition swap in ``percentile_approx``
    (same call shape, documented accuracy knob).
    """
    v4 = (F.round(F.col(value_col) * 10_000).cast("long") * 4).alias("v4")
    base = events.select(key, v4)
    med = base.groupBy(key).agg(
        F.expr("cast(percentile(v4, 0.5) as long)").alias("med4")
    )
    dev = base.join(med, key).select(
        key, "med4", F.abs(F.col("v4") - F.col("med4")).alias("dev4")
    )
    mad = dev.groupBy(key, "med4").agg(
        F.expr("cast(percentile(dev4, 0.5) as long)").alias("mad4"),
        F.count(F.lit(1)).alias("n"),
    )
    # med4 already rides in dev — grouping on it (like the SQL twin)
    # avoids re-running the exact-percentile aggregation for a second join
    return (
        dev.join(mad.select(key, "mad4", "n"), key)
        .groupBy(key, "n", "med4", "mad4")
        .agg(
            F.sum(
                F.when(
                    10_000 * F.col("dev4") > 3 * 14_826 * F.col("mad4"), 1
                ).otherwise(0)
            ).alias("n_outliers")
        )
        .select(
            key,
            "n",
            (F.col("med4") / 40_000.0).alias("median_value"),
            (F.col("mad4") / 40_000.0).alias("mad_value"),
            "n_outliers",
        )
    )


def q_events_mad_outliers(spark, sf_dir):
    return mad_outliers(load_events(spark, sf_dir))


SQL_EVENTS_MAD_OUTLIERS = """
WITH q AS (
    SELECT user_id, CAST(round(value * 10000) AS BIGINT) * 4 AS v4
    FROM events
),
med AS (
    SELECT user_id, CAST(median(v4) AS BIGINT) AS med4
    FROM q GROUP BY user_id
),
dev AS (
    SELECT q.user_id, med4, abs(v4 - med4) AS dev4
    FROM q JOIN med USING (user_id)
),
mad AS (
    SELECT user_id, med4, CAST(median(dev4) AS BIGINT) AS mad4,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM dev GROUP BY user_id, med4
)
SELECT d.user_id, m.n,
       CAST(m.med4 AS DOUBLE) / 40000.0 AS median_value,
       CAST(m.mad4 AS DOUBLE) / 40000.0 AS mad_value,
       CAST(SUM(CASE WHEN 10000 * d.dev4 > 3 * 14826 * m.mad4
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (user_id)
GROUP BY d.user_id, m.n, m.med4, m.mad4
"""


QUERIES = {
    "events_ewma": (q_events_ewma, SQL_EVENTS_EWMA),
    "events_mad_outliers": (q_events_mad_outliers, SQL_EVENTS_MAD_OUTLIERS),
    "events_lttb": (q_events_lttb, _sql_lttb()),
    "events_cusum": (q_events_cusum, SQL_EVENTS_CUSUM),
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

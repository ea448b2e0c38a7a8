"""Second coverage extension: multiset set-ops, native pivot, range window
frames, ntile/percent_rank, and a Python UDTF (table function) — completing
the §2.4/§2.6 capability matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_intersect_all(spark, sf_dir):
    """Multiset intersect (duplicates preserved)."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    b = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    return a.intersectAll(b)


SQL_INTERSECT_ALL = """
SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
INTERSECT ALL
SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
"""


def q_except_all(spark, sf_dir):
    """Multiset difference (per-occurrence subtraction)."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 40).select("l_suppkey")
    b = li.filter(F.col("l_quantity") > 45).select("l_suppkey")
    return a.exceptAll(b)


SQL_EXCEPT_ALL = """
SELECT l_suppkey FROM lineitem WHERE l_quantity > 40
EXCEPT ALL
SELECT l_suppkey FROM lineitem WHERE l_quantity > 45
"""


def q_pivot_native(spark, sf_dir):
    """Spark's native pivot API (vs the conditional-aggregation form in
    rel_pivot) with an explicit value list so the plan is a single pass."""
    out = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return out.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_F"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_O"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_P"),
    )


SQL_PIVOT_NATIVE = """
SELECT o_orderpriority,
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0)
            AS BIGINT) AS n_F,
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0)
            AS BIGINT) AS n_O,
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0)
            AS BIGINT) AS n_P
FROM orders GROUP BY o_orderpriority
"""


def q_window_range_frame(spark, sf_dir):
    """RANGE frame: count of same-customer orders within ±30 days of each
    order (value-based frame, not row-based)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 30 * 86400)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.count("*").over(w).alias("orders_within_30d"),
    )


SQL_WINDOW_RANGE_FRAME = """
SELECT o_orderkey, o_custkey,
       COUNT(*) OVER (
           PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
           RANGE BETWEEN 2592000 PRECEDING AND 2592000 FOLLOWING
       ) AS orders_within_30d
FROM orders
"""


def q_window_distribution(spark, sf_dir):
    """ntile + percent_rank + cume_dist over a deterministic ordering."""
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


SQL_WINDOW_DISTRIBUTION = """
SELECT o_orderkey,
       NTILE(10) OVER w AS decile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM orders
WINDOW w AS (ORDER BY o_totalprice DESC, o_orderkey)
"""


PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderpriority",
]


def profile_table(df: DataFrame, columns: list[str]) -> DataFrame:
    """Data-quality profile: per column, row count, null count, distinct
    count. ONE aggregation pass computes every column's stats (wide agg),
    then an explode unpivots to (column, n_rows, n_nulls, n_distinct) —
    never one job per column."""
    aggs = [F.count("*").alias("__n")]
    for c in columns:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__dist_{c}"))
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__dist_{c}").alias("n_distinct"),
            )
            for c in columns
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")


def q_profile_orders(spark, sf_dir):
    return profile_table(_t(spark, sf_dir, "orders"), PROFILE_COLS)


SQL_PROFILE_ORDERS = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS column, COUNT(*) AS n_rows, "
    f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS n_nulls, "
    f"COUNT(DISTINCT {c}) AS n_distinct FROM orders"
    for c in PROFILE_COLS
)


def q_events_asof(spark, sf_dir):
    """As-of join: every purchase event matched to the user's latest view
    at or before it (temporal lookup — verified against DuckDB's native
    ASOF JOIN)."""
    from .asof import asof_join
    from .relational import load_events

    events = load_events(spark, sf_dir)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts_src"), F.col("ts").alias("view_ts")
    )
    return asof_join(
        purchases,
        views,
        on=["user_id"],
        left_time="ts",
        right_time="view_ts_src",
        right_value_cols=["view_ts"],
    ).select(
        "user_id", "event_id", "ts", F.col("view_ts_asof").alias("last_view_ts")
    )


SQL_EVENTS_ASOF = """
SELECT p.user_id, p.event_id, p.ts, v.ts AS last_view_ts
FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
"""


def q_events_asof_tolerance(spark, sf_dir):
    """As-of join with a pandas merge_asof-style tolerance: the latest
    preceding view still matches only if it happened within 10 minutes of
    the purchase — stale lookups null out instead of attributing."""
    from .asof import asof_join
    from .relational import load_events

    events = load_events(spark, sf_dir)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts_src"), F.col("ts").alias("view_ts")
    )
    return asof_join(
        purchases,
        views,
        on=["user_id"],
        left_time="ts",
        right_time="view_ts_src",
        right_value_cols=["view_ts"],
        tolerance_seconds=600,
    ).select(
        "user_id", "event_id", "ts", F.col("view_ts_asof").alias("last_view_ts")
    )


def q_events_asof_nearest(spark, sf_dir):
    """Nearest-direction as-of: each purchase takes the view closest in
    time on EITHER side (ties to the earlier view), pandas
    merge_asof(direction='nearest') semantics."""
    from .asof import asof_join_nearest
    from .relational import load_events

    events = load_events(spark, sf_dir)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts_src"), F.col("ts").alias("view_ts")
    )
    return asof_join_nearest(
        purchases,
        views,
        on=["user_id"],
        left_time="ts",
        right_time="view_ts_src",
        right_value_cols=["view_ts"],
    ).select(
        "user_id", "event_id", "ts", F.col("view_ts_asof").alias("nearest_view_ts")
    )


# backward + forward ASOF candidates, then the argmin with backward ties —
# DuckDB's ASOF supports either inequality direction, so both candidates
# are native
SQL_EVENTS_ASOF_NEAREST = """
WITH p AS (
    SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
),
v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
b AS (
    SELECT p.user_id, p.event_id, p.ts, v.ts AS bt
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
),
f AS (
    SELECT p.user_id, p.event_id, p.ts, v.ts AS ft
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts >= p.ts
)
SELECT b.user_id, b.event_id, b.ts,
       CASE WHEN b.bt IS NULL THEN f.ft
            WHEN f.ft IS NULL THEN b.bt
            WHEN (f.ft - b.ts) < (b.ts - b.bt) THEN f.ft
            ELSE b.bt END AS nearest_view_ts
FROM b JOIN f ON b.event_id = f.event_id
"""


# DuckDB's ASOF JOIN has no tolerance clause; the latest preceding row IS
# the closest, so nulling matches older than the window is equivalent.
SQL_EVENTS_ASOF_TOLERANCE = """
SELECT p.user_id, p.event_id, p.ts,
       CASE WHEN v.ts >= p.ts - INTERVAL 600 SECONDS THEN v.ts END
           AS last_view_ts
FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
"""


def q_events_range_join(spark, sf_dir):
    """Range join: assign each error event to the session interval that
    contains it (sessions derived by the batch sessionizer). Bucketized
    equi-join + residual BETWEEN — verified against DuckDB's plain
    inequality join."""
    from .range_join import range_join
    from .relational import load_events, q_events_sessionize

    sessions = q_events_sessionize(spark, sf_dir).select(
        "user_id", "session_seq", "session_start", "session_end"
    )
    errors = load_events(spark, sf_dir).filter(
        F.col("event_type") == "error"
    ).select("event_id", "user_id", "ts")
    return range_join(
        errors,
        sessions,
        on=["user_id"],
        point_col="ts",
        start_col="session_start",
        end_col="session_end",
        bucket_seconds=3600,
    ).select("event_id", "user_id", "ts", "session_seq")


SQL_EVENTS_RANGE_JOIN = """
WITH flagged AS (
    SELECT *,
           CASE WHEN EPOCH(ts) - EPOCH(LAG(ts) OVER w) IS NULL
                  OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > 1800
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
with_id AS (
    SELECT *,
           SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS session_seq
    FROM flagged
),
sessions AS (
    SELECT user_id, session_seq,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM with_id GROUP BY user_id, session_seq
)
SELECT e.event_id, e.user_id, e.ts,
       CAST(s.session_seq AS BIGINT) AS session_seq
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
JOIN sessions s
  ON e.user_id = s.user_id
 AND e.ts >= s.session_start AND e.ts <= s.session_end
"""


def q_limit_offset(spark, sf_dir):
    """Keyset-free pagination: rows 101-200 of a deterministic total order."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .offset(100)
        .limit(100)
    )


SQL_LIMIT_OFFSET = """
SELECT o_orderkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100 OFFSET 100
"""


CHUNK_SIZE = 100


def q_text_chunks_udtf(spark, sf_dir):
    """Python UDTF (table function): split each document into fixed-size
    character chunks — one input row to N output rows through the UDTF
    surface (the reference has no UDTF at all, SURVEY.md §2.6). Chunking is
    the canonical LLM-pipeline pre-embedding step.

    ``useArrow=True`` moves the row transfer onto the Arrow batch path
    (ArrowEvalPythonUDTF) — without it this was the repo's only
    pickle-serialized Python eval in any plan."""
    from pyspark.sql.functions import lit, udtf

    @udtf(
        returnType="doc_id: bigint, chunk_index: int, chunk: string",
        useArrow=True,
    )
    class ChunkDoc:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            for i in range(0, len(text), CHUNK_SIZE):
                yield doc_id, i // CHUNK_SIZE, text[i : i + CHUNK_SIZE]

    docs = _t(spark, sf_dir, "documents")
    # lateral-join the UDTF over the documents table
    docs.createOrReplaceTempView("__docs_for_udtf")
    spark.udtf.register("chunk_doc", ChunkDoc)
    return spark.sql(
        "SELECT c.doc_id, c.chunk_index, c.chunk "
        "FROM __docs_for_udtf d, LATERAL chunk_doc(d.doc_id, d.text) c"
    )


SQL_TEXT_CHUNKS_UDTF = f"""
SELECT doc_id,
       CAST(i AS INTEGER) AS chunk_index,
       substr(text, i * {CHUNK_SIZE} + 1, {CHUNK_SIZE}) AS chunk
FROM documents,
     LATERAL (
        SELECT unnest(generate_series(0, (length(text) - 1) // {CHUNK_SIZE})) AS i
     )
"""


def q_array_agg(spark, sf_dir):
    """Array aggregation: per return flag, the sorted distinct status values
    and priority list sizes (array column output — both engines hand back
    plain lists)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(
            F.array_sort(F.collect_set("l_linestatus")), ","
        ).alias("statuses"),
        F.size(F.array_sort(F.collect_set("l_suppkey"))).alias("n_suppliers"),
    )


SQL_ARRAY_AGG = """
SELECT l_returnflag,
       array_to_string(list_sort(list(DISTINCT l_linestatus)), ',')
           AS statuses,
       CAST(LEN(list_sort(list(DISTINCT l_suppkey))) AS INTEGER) AS n_suppliers
FROM lineitem GROUP BY l_returnflag
"""


def q_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont``: both (1-g)*lo + g*hi over the sorted set)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
            F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
        )
    )


SQL_PERCENTILES = """
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90,
       quantile_cont(o_totalprice, 0.99) AS p99
FROM orders GROUP BY o_orderstatus
"""


def q_null_semantics(spark, sf_dir):
    """Three-valued-logic parity: aggregates and predicates over an
    engineered nullable column (NULL-skipping counts, null-safe equality,
    NULL ordering in min/max)."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "maybe_price",
        F.when(F.col("o_orderkey") % 4 == 0, None).otherwise(
            F.col("o_totalprice")
        ),
    )
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        F.count("maybe_price").alias("n_nonnull"),
        F.min("maybe_price").alias("min_price"),  # NULLs ignored
        F.sum(
            (F.col("maybe_price") > 200000).cast("long")
        ).alias("n_big"),  # NULL > x → NULL → excluded from sum? cast NULL stays NULL, sum skips
        F.sum(
            F.col("maybe_price").eqNullSafe(F.lit(None)).cast("long")
        ).alias("n_null_safe_eq"),
    )


SQL_NULL_SEMANTICS = """
WITH o AS (
    SELECT o_orderstatus,
           CASE WHEN o_orderkey % 4 = 0 THEN NULL ELSE o_totalprice END
               AS maybe_price
    FROM orders
)
SELECT o_orderstatus,
       COUNT(*) AS n_rows,
       COUNT(maybe_price) AS n_nonnull,
       MIN(maybe_price) AS min_price,
       CAST(SUM(CAST(maybe_price > 200000 AS BIGINT)) AS BIGINT) AS n_big,
       CAST(SUM(CAST(maybe_price IS NOT DISTINCT FROM NULL AS BIGINT))
            AS BIGINT) AS n_null_safe_eq
FROM o GROUP BY o_orderstatus
"""


def q_sort_nulls(spark, sf_dir):
    """NULL placement in ORDER BY must be explicit: Spark defaults to nulls
    FIRST ascending, DuckDB to NULLS LAST — silent cross-engine divergence
    unless pinned. Top-50 with engineered nulls sorted NULLS LAST +
    unique tie-break."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "maybe_price",
        F.when(F.col("o_orderkey") % 7 == 0, None).otherwise(
            F.col("o_totalprice")
        ),
    )
    return (
        o.orderBy(
            F.col("maybe_price").asc_nulls_last(), F.col("o_orderkey")
        )
        .select("o_orderkey", "maybe_price")
        .limit(50)
    )


SQL_SORT_NULLS = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END
           AS maybe_price
FROM orders
ORDER BY maybe_price ASC NULLS LAST, o_orderkey
LIMIT 50
"""


def q_window_first_last(spark, sf_dir):
    """first_value / last_value with an explicit full-partition frame
    (last_value over the default frame is a classic wrong-answer trap —
    it returns the CURRENT row's value; the frame must be unbounded both
    ways)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate"), F.col("o_orderkey")
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.first_value(F.col("o_orderkey")).over(w_full).alias("first_order"),
        F.last_value(F.col("o_orderkey")).over(w_full).alias("last_order"),
    )


SQL_WINDOW_FIRST_LAST = """
SELECT o_orderkey, o_custkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_order,
       LAST_VALUE(o_orderkey) OVER w AS last_order
FROM orders
WINDOW w AS (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
)
"""


def q_window_ntile(spark, sf_dir):
    """Quartile bucketing + per-group nth value (ntile / nth_value over a
    fully-deterministic order: unique o_orderkey tie-break)."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.ntile(4).over(w).alias("price_quartile"),
            F.nth_value("o_totalprice", 2).over(wf).alias("second_highest"),
        )
    )


SQL_WINDOW_NTILE = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       NTILE(4) OVER w AS price_quartile,
       NTH_VALUE(o_totalprice, 2) OVER (
           PARTITION BY o_orderpriority
           ORDER BY o_totalprice DESC, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS second_highest
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey)
"""


def q_fuzzy_join(spark, sf_dir):
    """Fuzzy self-match: same-nation customer pairs whose names are within
    edit distance 4 (levenshtein is built-in on both engines). The nation
    key is the blocking key — the quadratic comparison runs only within a
    block (blocking + pairwise verify); the block join itself is a hash
    join.

    SCALE BOUNDARY (r14, measured): blocking bounds the work only while
    BLOCK sizes stay bounded, and the 25-nation key grows its blocks
    with the corpus — the emb_knn_per_label class. Worse, on this
    fixture the threshold is near-vacuous: TPC-H names differ only in
    digit positions, so at scratch/sf1 (150k customers, 6k/nation) the
    row already emits 336,093,100 pairs (~75% of all within-block
    pairs) in a 370s cold pass, and sf10full extrapolates to ~33B
    OUTPUT rows — quadratic work AND quadratic output. GATE-SCALE
    diagnostic only (sf0.01: 1.5k customers). The scale path EXISTS as
    of r15: ``fuzzy.py`` — lossless Ed-Join/PassJoin q-gram prefix
    filtering with a selective threshold, hot-gram capping with
    explicit accounting, and the clusters/keepers output contract
    (rows ``rel_fuzzy_pairs_qgram`` / ``rel_fuzzy_clusters``); use
    that for any real dirty-key join."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    a = cust.select(
        F.col("c_custkey").alias("key_a"),
        F.col("c_name").alias("name_a"),
        F.col("c_nationkey").alias("nk"),
    )
    b = cust.select(
        F.col("c_custkey").alias("key_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nk"),
    )
    return (
        a.join(b, "nk")
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 4)
        .select("key_a", "key_b", "name_a", "name_b", "edit_dist")
    )


SQL_FUZZY_JOIN = """
SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
       a.c_name AS name_a, b.c_name AS name_b,
       levenshtein(a.c_name, b.c_name) AS edit_dist
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 4
"""


def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sample of orders: 10% of URGENT, 1% of the
    rest, by content-stable hash bucket (scale.sample_stratified) — a pure
    filter, reproducible anywhere, fully pushdown-friendly; per-stratum
    counts prove the rates."""
    from .scale import sample_stratified

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    sampled = sample_stratified(
        orders,
        "o_orderpriority",
        {
            "1-URGENT": 0.10,
            "2-HIGH": 0.01,
            "3-MEDIUM": 0.01,
            "4-NOT SPECIFIED": 0.01,
            "5-LOW": 0.01,
        },
        key_column="o_orderkey",
    )
    return (
        sampled.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_sampled"))
        .orderBy("o_orderpriority")
    )


_SQL_HEX6_OKEY = " + ".join(
    f"(instr('0123456789abcdef',"
    f" substr(md5(CAST(o_orderkey AS VARCHAR)), {i + 1}, 1)) - 1)"
    f" * {16 ** (5 - i)}"
    for i in range(6)
)

SQL_STRATIFIED_SAMPLE = f"""
SELECT o_orderpriority, COUNT(*) AS n_sampled
FROM (
    SELECT o_orderpriority,
           ({_SQL_HEX6_OKEY}) % 10000 AS bucket
    FROM orders
)
WHERE bucket < CASE WHEN o_orderpriority = '1-URGENT' THEN 1000 ELSE 100 END
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_corr_quantized(spark, sf_dir):
    """Single-pass Pearson correlation per group from ALGEBRAIC integer sums
    — the scale-correct way to ship statistical aggregates: quantize both
    variables to BIGINT grids, accumulate (n, Σx, Σy, Σxy, Σx², Σy²) with
    map-side partials (exact integers, any partitioning), then evaluate the
    closed form once per group in a fixed expression order.  Engine-exact
    because every input to the float math is an identical integer and IEEE
    *, /, sqrt are correctly rounded — unlike built-in corr(), whose
    running-moment accumulation is partitioning-dependent."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_quantity") * 100).cast("long").alias("xq"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("yq"),
    )
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xq").alias("sx"),
        F.sum("yq").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).alias("sxx"),
        F.sum(F.col("yq") * F.col("yq")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    r = (nd * sxy - sx * sy) / (
        F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy)
    )
    return s.select("l_returnflag", "n", r.alias("corr_qty_discount"))


SQL_CORR_QUANTIZED = """
WITH q AS (
    SELECT l_returnflag,
           CAST(round(l_quantity * 100) AS BIGINT) AS xq,
           CAST(round(l_discount * 10000) AS BIGINT) AS yq
    FROM lineitem
),
s AS (
    SELECT l_returnflag, COUNT(*) AS n,
           SUM(xq) AS sx, SUM(yq) AS sy, SUM(xq * yq) AS sxy,
           SUM(xq * xq) AS sxx, SUM(yq * yq) AS syy
    FROM q GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
           AS corr_qty_discount
FROM s
"""


def q_higher_order_funcs(spark, sf_dir):
    """Array pipeline via higher-order lambdas, entirely inside one
    projection after the per-order collect: sort, filter, fold, slice —
    the JVM-side idiom for nested-data work (no explode round-trip, no
    Python).  Quantities quantized to ints so the fold is engine-exact."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.round(F.col("l_quantity") * 100).cast("long").alias("qq")
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("qq")).alias("arr")
    )
    return per_order.select(
        "l_orderkey",
        F.size("arr").alias("n_items"),
        F.aggregate(
            "arr", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("total_qq"),
        F.size(F.filter("arr", lambda x: x > 2500)).alias("n_big"),
        F.array_join(F.slice("arr", 1, 3).cast("array<string>"), ",").alias(
            "head3"
        ),
    )


SQL_HIGHER_ORDER = """
WITH per_order AS (
    SELECT l_orderkey,
           list_sort(list(CAST(round(l_quantity * 100) AS BIGINT))) AS arr
    FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey,
       LEN(arr) AS n_items,
       CAST(list_sum(arr) AS BIGINT) AS total_qq,
       LEN(list_filter(arr, x -> x > 2500)) AS n_big,
       array_to_string(arr[1:3], ',') AS head3
FROM per_order
"""


QUERIES = {
    "rel_corr_quantized": (q_corr_quantized, SQL_CORR_QUANTIZED),
    "rel_higher_order": (q_higher_order_funcs, SQL_HIGHER_ORDER),
    "rel_window_ntile": (q_window_ntile, SQL_WINDOW_NTILE),
    "rel_stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "rel_fuzzy_join": (q_fuzzy_join, SQL_FUZZY_JOIN),
    "rel_intersect_all": (q_intersect_all, SQL_INTERSECT_ALL),
    "rel_null_semantics": (q_null_semantics, SQL_NULL_SEMANTICS),
    "rel_sort_nulls": (q_sort_nulls, SQL_SORT_NULLS),
    "rel_window_first_last": (q_window_first_last, SQL_WINDOW_FIRST_LAST),
    "rel_array_agg": (q_array_agg, SQL_ARRAY_AGG),
    "rel_percentiles": (q_percentiles, SQL_PERCENTILES),
    "rel_except_all": (q_except_all, SQL_EXCEPT_ALL),
    "rel_pivot_native": (q_pivot_native, SQL_PIVOT_NATIVE),
    "rel_window_range_frame": (q_window_range_frame, SQL_WINDOW_RANGE_FRAME),
    "rel_window_distribution": (q_window_distribution, SQL_WINDOW_DISTRIBUTION),
    "rel_limit_offset": (q_limit_offset, SQL_LIMIT_OFFSET),
    "rel_profile_orders": (q_profile_orders, SQL_PROFILE_ORDERS),
    "events_asof_join": (q_events_asof, SQL_EVENTS_ASOF),
    "events_asof_tolerance": (q_events_asof_tolerance, SQL_EVENTS_ASOF_TOLERANCE),
    "events_asof_nearest": (q_events_asof_nearest, SQL_EVENTS_ASOF_NEAREST),
    "events_range_join": (q_events_range_join, SQL_EVENTS_RANGE_JOIN),
    "text_chunks_udtf": (q_text_chunks_udtf, SQL_TEXT_CHUNKS_UDTF),
}


def register_all() -> None:
    from . import harness

    for name, (fn, sql) in QUERIES.items():
        harness.register(name, fn, sql)

"""Relational parity surface (SURVEY.md §7 phase 2).

The reference exposes the full SQL dialect to users through pandasql
(SURVEY.md §2.6); this module provides the equivalent capability surface as
thin PySpark compositions — filters, all join types, set ops, group-by /
distinct aggregates, windows, sort/limit, rollup, pivot — each declared in
the driver harness with a DuckDB oracle twin.

Determinism conventions (see harness.py docstring): decimal-accumulated
float aggregates, unique tie-breaks on every top-k.

Scale notes per query are in the docstrings; the general posture:
dimension joins (region/nation/supplier) are broadcast, fact-fact joins
shuffle on their keys and rely on AQE for skew; aggregates are partial
(map-side) by construction since all are expressed as built-in hash
aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def normalize_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to plain TIMESTAMP regardless of how
    the parquet physical type drifted between generator/Spark versions:

    - TIMESTAMP(NANOS) read as bigint (legacy nanosAsLong) → micros timestamp
      (floor division — matches DuckDB's nanos→micros truncation)
    - tz-less timestamp[us] read as TIMESTAMP_NTZ (Spark 4.x) → TIMESTAMP.
      Session tz is pinned to UTC (session.py), so the wall-clock instant is
      preserved and epoch arithmetic / watermarks behave identically.
    """
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"div({col}, 1000)")))
    elif dt == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet has carried TIMESTAMP(NANOS) (rejected by Spark's
    reader without nanosAsLong) and, after regeneration, tz-less
    timestamp[us] (TIMESTAMP_NTZ under Spark 4.1, which cannot feed epoch
    casts or watermarks). Normalize once here so every consumer — batch
    queries, streaming schemas derived from this frame, bench — sees a plain
    TIMESTAMP column."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return normalize_event_time(df, "ts")


_FSUM_SCALE = 10_000


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent float sum: round each term to 4 decimals, accumulate
    as BIGINT, divide back. Double addition is non-associative (raw double
    sums differ in the last ulp between engines/partitionings) and
    double→decimal casts round differently across engines; integer
    accumulation of round(x*10^4) is exact and portable. Headroom: |term|
    must stay < 2^63/10^4 ≈ 9.2e14 — fine for any per-row metric.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(F.round(c * _FSUM_SCALE).cast("long")).cast("double") / _FSUM_SCALE
    ).alias(alias)


SQL_DSUM = (
    "CAST(SUM(CAST(round(({expr}) * 10000) AS BIGINT)) AS DOUBLE) / 10000"
    " AS {alias}"
)


def _sql_dsum(expr: str, alias: str) -> str:
    return SQL_DSUM.format(expr=expr, alias=alias)


# --------------------------------------------------------------------------
# Projections / filters
# --------------------------------------------------------------------------

def q_filter_project(spark, sf_dir):
    """Predicate + projection pushed into the parquet scan (P1/P4)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-07-01")
            & (F.col("l_discount") > 0.05)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


SQL_FILTER_PROJECT = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
  AND l_discount > 0.05
"""


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------

def q_join_inner(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        "o_orderkey", "c_name", "c_mktsegment", "o_totalprice"
    )


SQL_JOIN_INNER = """
SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
"""


def q_join_broadcast_dims(spark, sf_dir):
    """Star-join through two dimension tables; both dims broadcast — no
    shuffle of the customer side for the join itself."""
    customer = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            dsum("c_acctbal", "sum_acctbal"),
        )
    )


SQL_JOIN_BROADCAST_DIMS = f"""
SELECT r_name, n_name, COUNT(*) AS n_customers,
       {_sql_dsum('c_acctbal', 'sum_acctbal')}
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_semi_join(spark, sf_dir):
    """Customers having at least one high-value order (left_semi)."""
    customer = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


SQL_SEMI_JOIN = """
SELECT c_custkey, c_name, c_acctbal FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
)
"""


def q_anti_join(spark, sf_dir):
    """Customers with no high-value order (left_anti — complement of the
    semi-join above)."""
    customer = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


SQL_ANTI_JOIN = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
)
"""


def q_outer_join(spark, sf_dir):
    """Left outer join preserving order-less customers (absent from the
    reference — full-outer family completeness)."""
    customer = _t(spark, sf_dir, "customer")
    per_cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    return (
        customer.join(per_cust, customer.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        )
    )


SQL_OUTER_JOIN = """
SELECT c_custkey, c_name, COALESCE(n_orders, 0) AS n_orders
FROM customer c
LEFT JOIN (
    SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
) o ON c.c_custkey = o.o_custkey
"""


def q_theta_join(spark, sf_dir):
    """Equi-core + non-equi residual (J4's shape on TPC-H tables): lineitems
    whose quantity exceeds the part size."""
    lineitem = _t(spark, sf_dir, "lineitem")
    part = F.broadcast(_t(spark, sf_dir, "part"))
    return (
        lineitem.join(
            part,
            (lineitem.l_partkey == part.p_partkey)
            & (lineitem.l_quantity > part.p_size),
        )
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_over"), dsum("l_quantity", "sum_qty"))
    )


SQL_THETA_JOIN = f"""
SELECT p_brand, COUNT(*) AS n_over, {_sql_dsum('l_quantity', 'sum_qty')}
FROM lineitem JOIN part
  ON l_partkey = p_partkey AND l_quantity > p_size
GROUP BY p_brand
"""


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

def q_union(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    a = orders.filter(F.col("o_orderstatus") == "F").select(cols)
    b = orders.filter(F.col("o_totalprice") > 450000).select(cols)
    return a.unionByName(b)


SQL_UNION = """
SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'F'
UNION ALL
SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_totalprice > 450000
"""


def q_intersect(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b)


SQL_INTERSECT = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


def q_except(spark, sf_dir):
    """Customers who placed finished ('F') orders but never open ('O') ones."""
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.subtract(b)


SQL_EXCEPT = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


def q_distinct(spark, sf_dir):
    return _t(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority"
    ).distinct()


SQL_DISTINCT = "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"


# --------------------------------------------------------------------------
# Aggregations
# --------------------------------------------------------------------------

def q_agg_groupby(spark, sf_dir):
    """TPC-H Q1 shape: wide multi-aggregate with map-side partials."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            (dsum("l_quantity", "x") / F.count("*")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


SQL_AGG_GROUPBY = f"""
SELECT l_returnflag, l_linestatus,
       {_sql_dsum('l_quantity', 'sum_qty')},
       {_sql_dsum('l_extendedprice', 'sum_base_price')},
       {_sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
       {_sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       CAST(SUM(CAST(round((l_quantity) * 10000) AS BIGINT)) AS DOUBLE) / 10000
           / COUNT(*) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_groupwise_min(spark, sf_dir):
    """Group-wise minimum (TPC-H Q2's correlated-subquery shape): parts
    priced at their brand's minimum — window min beats a self-join
    (one shuffle on the group key, no second scan)."""
    w = Window.partitionBy("p_brand")
    return (
        _t(spark, sf_dir, "part")
        .withColumn("brand_min", F.min("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("brand_min"))
        .select("p_partkey", "p_brand", "p_retailprice")
    )


SQL_GROUPWISE_MIN = """
SELECT p_partkey, p_brand, p_retailprice
FROM part p
WHERE p_retailprice = (
    SELECT MIN(p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
)
"""


def q_agg_distinct(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("distinct_suppliers"),
            F.countDistinct("l_partkey").alias("distinct_parts"),
        )
    )


SQL_AGG_DISTINCT = """
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS distinct_suppliers,
       COUNT(DISTINCT l_partkey) AS distinct_parts
FROM lineitem GROUP BY l_returnflag
"""


def q_agg_stats(spark, sf_dir):
    """min/max/count aggregates (exact — no float-order issues)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("n"),
        )
    )


SQL_AGG_STATS = """
SELECT o_orderpriority,
       MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
       MIN(o_orderdate) AS first_order, MAX(o_orderdate) AS last_order,
       COUNT(*) AS n
FROM orders GROUP BY o_orderpriority
"""


def q_rollup(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity", "sum_qty"), F.count("*").alias("n"))
    )


SQL_ROLLUP = f"""
SELECT l_returnflag, l_linestatus,
       {_sql_dsum('l_quantity', 'sum_qty')}, COUNT(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_cube(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


SQL_CUBE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_grouping_sets(spark, sf_dir):
    """Arbitrary (non-hierarchical) grouping sets in one pass: the
    (returnflag, linestatus) matrix, the returnflag margin, and an unrelated
    line-number breakdown — a shape neither ROLLUP nor CUBE expresses. Spark
    expands this to a single Expand + one aggregation (one shuffle for all
    three groupings); per-column GROUPING() flags disambiguate grouped-out
    NULLs from data NULLs."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [
            ["l_returnflag", "l_linestatus"],
            ["l_returnflag"],
            ["l_linenumber"],
        ],
        "l_returnflag",
        "l_linestatus",
        "l_linenumber",
    ).agg(
        dsum("l_quantity", "sum_qty"),
        F.count("*").alias("n"),
        F.grouping("l_returnflag").cast("int").alias("g_rf"),
        F.grouping("l_linestatus").cast("int").alias("g_ls"),
        F.grouping("l_linenumber").cast("int").alias("g_sm"),
    )


SQL_GROUPING_SETS = f"""
SELECT l_returnflag, l_linestatus, l_linenumber,
       {_sql_dsum('l_quantity', 'sum_qty')}, COUNT(*) AS n,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
       CAST(GROUPING(l_linenumber) AS INTEGER) AS g_sm
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag),
                        (l_linenumber))
"""


def q_pivot(spark, sf_dir):
    """Pivot expressed as conditional aggregation (ANSI-portable)."""
    li = _t(spark, sf_dir, "lineitem")
    out = li.groupBy("l_linestatus").agg(
        *[
            dsum(
                F.when(F.col("l_returnflag") == flag, F.col("l_quantity")),
                f"qty_{flag}",
            )
            for flag in ("A", "N", "R")
        ]
    )
    return out


SQL_PIVOT = f"""
SELECT l_linestatus,
       {_sql_dsum("CASE WHEN l_returnflag = 'A' THEN l_quantity END", 'qty_A')},
       {_sql_dsum("CASE WHEN l_returnflag = 'N' THEN l_quantity END", 'qty_N')},
       {_sql_dsum("CASE WHEN l_returnflag = 'R' THEN l_quantity END", 'qty_R')}
FROM lineitem GROUP BY l_linestatus
"""


def q_unpivot(spark, sf_dir):
    """Wide→long with Spark's native ``unpivot`` (melt): the inverse of
    rel_pivot, a pure per-row reshape (one scan, no shuffle). Measures are
    quantized to integer cents so the long-form values hash identically
    across engines."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
        F.col("o_custkey").alias("custkey"),
        F.length("o_orderpriority").cast("long").alias("priority_len"),
    )
    return o.unpivot(
        ids=["o_orderkey"],
        values=["price_cents", "custkey", "priority_len"],
        variableColumnName="measure",
        valueColumnName="value",
    )


SQL_UNPIVOT = """
SELECT o_orderkey, measure, value
FROM (
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
           o_custkey AS custkey,
           CAST(length(o_orderpriority) AS BIGINT) AS priority_len
    FROM orders
)
UNPIVOT (value FOR measure IN (price_cents, custkey, priority_len))
"""


# --------------------------------------------------------------------------
# Windows / sort / limit
# --------------------------------------------------------------------------

def q_window_rank(spark, sf_dir):
    """Top-3 orders per customer; unique (price, orderkey) tie-break keeps
    row_number deterministic."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


SQL_WINDOW_RANK = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
           ) AS rn
    FROM orders
) WHERE rn <= 3
"""


def q_window_running(spark, sf_dir):
    """Running per-user event-value sum (ordered prefix aggregation)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_events(spark, sf_dir).select(
        "event_id",
        "user_id",
        (
            F.sum(F.round(F.col("value") * _FSUM_SCALE).cast("long")).over(w)
            .cast("double")
            / _FSUM_SCALE
        ).alias("running_value"),
    )


SQL_WINDOW_RUNNING = """
SELECT event_id, user_id,
       CAST(SUM(CAST(round(value * 10000) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) / 10000 AS running_value
FROM events
"""


def q_window_lag(spark, sf_dir):
    """lag/lead: inter-event gap seconds per user."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_prev = F.lag("ts").over(w)
    return load_events(spark, sf_dir).select(
        "event_id",
        "user_id",
        (F.col("ts").cast("double") - ts_prev.cast("double")).alias("gap_seconds"),
    )


SQL_WINDOW_LAG = """
SELECT event_id, user_id,
       EPOCH(ts) - EPOCH(LAG(ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)) AS gap_seconds
FROM events
"""


def q_sort_limit(spark, sf_dir):
    """Global top-100 (TakeOrderedAndProject — no full sort at scale)."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(100)
    )


SQL_SORT_LIMIT = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


# --------------------------------------------------------------------------
# TPC-H-style analytical queries (bench headliners)
# --------------------------------------------------------------------------

def q_tpch_q3(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-03-15"
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


SQL_TPCH_Q3 = f"""
SELECT l_orderkey, o_orderdate, {_sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def q_tpch_q5(spark, sf_dir):
    """Local-supplier volume: 6-table join, dims broadcast, facts shuffle on
    their join keys once each."""
    region = F.broadcast(
        _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    supplier = F.broadcast(_t(spark, sf_dir, "supplier"))
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            supplier,
            (li.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue"))
    )


SQL_TPCH_Q5 = f"""
SELECT n_name, {_sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def q_tpch_q10(spark, sf_dir):
    """Returned-item reporting: 4-table join, group, top-20 by revenue.
    Customer/nation broadcast; lineitem filter pushed to the scan."""
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


SQL_TPCH_Q10 = f"""
SELECT c_custkey, c_name, c_acctbal, n_name, c_mktsegment,
       {_sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def q_tpch_q18(spark, sf_dir):
    """Large-volume customers: aggregate-subquery semi-join (HAVING over a
    grouped fact feeding a join back to the facts)."""
    li = _t(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", "total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        orders.join(big_orders, orders.o_orderkey == big_orders.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


SQL_TPCH_Q18 = f"""
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM orders
JOIN (
    SELECT l_orderkey, {_sql_dsum('l_quantity', 'total_qty')}
    FROM lineitem GROUP BY l_orderkey HAVING
        CAST(SUM(CAST(round((l_quantity) * 10000) AS BIGINT)) AS DOUBLE) / 10000 > 150
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


def q_tpch_q4(spark, sf_dir):
    """Order-priority checking (EXISTS correlated subquery → left_semi):
    orders in a quarter having at least one late-shipped line."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


SQL_TPCH_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
"""


def q_tpch_q14(spark, sf_dir):
    """Promotion effect: conditional-aggregate share over a fact-dim join
    (single row; both numerator and denominator decimal-exact)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    part = F.broadcast(_t(spark, sf_dir, "part"))
    joined = li.join(part, li.l_partkey == part.p_partkey)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev)
    return joined.agg(
        (
            F.lit(100.0)
            * (
                F.sum(F.round(promo * 10000).cast("long")).cast("double")
                / F.sum(F.round(rev * 10000).cast("long")).cast("double")
            )
        ).alias("promo_revenue_pct")
    )


SQL_TPCH_Q14 = """
SELECT 100.0 * (
    CAST(SUM(CAST(round(CASE WHEN p_type LIKE 'PROMO%'
        THEN l_extendedprice * (1 - l_discount) END * 10000) AS BIGINT)) AS DOUBLE)
    / CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE)
) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
"""


def q_tpch_q6(spark, sf_dir):
    """Forecast-revenue: pure scan + filter + single aggregate; entire
    predicate pushes to parquet."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue")
    )


SQL_TPCH_Q6 = f"""
SELECT {_sql_dsum('l_extendedprice * l_discount', 'revenue')}
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# Events: sessionization + windowed aggregation
# --------------------------------------------------------------------------

SESSION_GAP_SECONDS = 1800


def q_events_sessionize(spark, sf_dir):
    """Gap-based sessionization (the batch form of the streaming operator):
    a new session starts when the user's inter-event gap exceeds 30 min.
    One shuffle on user_id; both windows share the same partitioning."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events = load_events(spark, sf_dir)
    gap = F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")
    with_flag = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > SESSION_GAP_SECONDS), 1).otherwise(0),
    )
    with_id = with_flag.withColumn(
        "session_seq",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_id.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            dsum("value", "session_value"),
        )
    )


SQL_EVENTS_SESSIONIZE = f"""
WITH flagged AS (
    SELECT *,
           CASE WHEN EPOCH(ts) - EPOCH(LAG(ts) OVER w) IS NULL
                  OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > {SESSION_GAP_SECONDS}
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
)
-- DuckDB SUM(int) OVER ... yields HUGEINT; cast so session_seq matches
-- Spark's BIGINT in the hashed compare
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       {_sql_dsum('value', 'session_value')}
FROM with_id
GROUP BY user_id, session_seq
"""


def q_events_funnel(spark, sf_dir):
    """Ordered funnel: users who did view → click → purchase in that
    temporal order. min-timestamp per stage + monotonicity filter — one
    shuffle on user_id, no self-joins (the n-way join formulation shuffles
    the fact table once per stage)."""
    events = load_events(spark, sf_dir)
    stage_min = events.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{s}")
            for s in ("view", "click", "purchase")
        ]
    )
    return (
        stage_min.withColumn(
            "reached",
            F.when(
                F.col("t_view").isNotNull()
                & F.col("t_click").isNotNull()
                & F.col("t_purchase").isNotNull()
                & (F.col("t_view") <= F.col("t_click"))
                & (F.col("t_click") <= F.col("t_purchase")),
                3,
            )
            .when(
                F.col("t_view").isNotNull()
                & F.col("t_click").isNotNull()
                & (F.col("t_view") <= F.col("t_click")),
                2,
            )
            .when(F.col("t_view").isNotNull(), 1)
            .otherwise(0),
        )
        .groupBy("reached")
        .agg(F.count("*").alias("n_users"))
    )


SQL_EVENTS_FUNNEL = """
WITH stage_min AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
           MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
           MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
    FROM events GROUP BY user_id
)
SELECT CASE
         WHEN t_view IS NOT NULL AND t_click IS NOT NULL
              AND t_purchase IS NOT NULL
              AND t_view <= t_click AND t_click <= t_purchase THEN 3
         WHEN t_view IS NOT NULL AND t_click IS NOT NULL
              AND t_view <= t_click THEN 2
         WHEN t_view IS NOT NULL THEN 1
         ELSE 0 END AS reached,
       COUNT(*) AS n_users
FROM stage_min
GROUP BY 1
"""


def q_events_sessionize_native(spark, sf_dir):
    """Gap-based sessions via Spark's built-in ``session_window`` (merges
    events closer than the gap — same 30-min semantics as the
    window-function formulation, and the operator that runs unchanged on a
    stream). Output keyed by (user, first event ts) for oracle comparison."""
    events = load_events(spark, sf_dir)
    return (
        events.groupBy(
            F.col("user_id"),
            F.session_window(F.col("ts"), f"{SESSION_GAP_SECONDS} seconds"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


SQL_EVENTS_SESSIONIZE_NATIVE = f"""
WITH flagged AS (
    SELECT *,
           CASE WHEN EPOCH(ts) - EPOCH(LAG(ts) OVER w) IS NULL
                  OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > {SESSION_GAP_SECONDS}
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
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM with_id
GROUP BY user_id, session_seq
"""


def q_events_hourly(spark, sf_dir):
    """Tumbling-window aggregation (batch form of the streaming windowed agg)."""
    return (
        load_events(spark, sf_dir)
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(F.count("*").alias("n"), dsum("value", "sum_value"))
    )


SQL_EVENTS_HOURLY = f"""
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n, {_sql_dsum('value', 'sum_value')}
FROM events GROUP BY date_trunc('hour', ts), event_type
"""


# --------------------------------------------------------------------------
# Registry hookup
# --------------------------------------------------------------------------

QUERIES = {
    "rel_filter_project": (q_filter_project, SQL_FILTER_PROJECT),
    "rel_join_inner": (q_join_inner, SQL_JOIN_INNER),
    "rel_join_broadcast_dims": (q_join_broadcast_dims, SQL_JOIN_BROADCAST_DIMS),
    "rel_semi_join": (q_semi_join, SQL_SEMI_JOIN),
    "rel_anti_join": (q_anti_join, SQL_ANTI_JOIN),
    "rel_outer_join": (q_outer_join, SQL_OUTER_JOIN),
    "rel_theta_join": (q_theta_join, SQL_THETA_JOIN),
    "rel_union": (q_union, SQL_UNION),
    "rel_intersect": (q_intersect, SQL_INTERSECT),
    "rel_except": (q_except, SQL_EXCEPT),
    "rel_distinct": (q_distinct, SQL_DISTINCT),
    "rel_agg_groupby": (q_agg_groupby, SQL_AGG_GROUPBY),
    "tpch_q1": (q_agg_groupby, SQL_AGG_GROUPBY),
    "rel_groupwise_min": (q_groupwise_min, SQL_GROUPWISE_MIN),
    "rel_agg_distinct": (q_agg_distinct, SQL_AGG_DISTINCT),
    "rel_agg_stats": (q_agg_stats, SQL_AGG_STATS),
    "rel_rollup": (q_rollup, SQL_ROLLUP),
    "rel_grouping_sets": (q_grouping_sets, SQL_GROUPING_SETS),
    "rel_cube": (q_cube, SQL_CUBE),
    "rel_pivot": (q_pivot, SQL_PIVOT),
    "rel_unpivot": (q_unpivot, SQL_UNPIVOT),
    "rel_window_rank": (q_window_rank, SQL_WINDOW_RANK),
    "rel_window_running": (q_window_running, SQL_WINDOW_RUNNING),
    "rel_window_lag": (q_window_lag, SQL_WINDOW_LAG),
    "rel_sort_limit": (q_sort_limit, SQL_SORT_LIMIT),
    "tpch_q3": (q_tpch_q3, SQL_TPCH_Q3),
    "tpch_q5": (q_tpch_q5, SQL_TPCH_Q5),
    "tpch_q6": (q_tpch_q6, SQL_TPCH_Q6),
    "tpch_q4": (q_tpch_q4, SQL_TPCH_Q4),
    "tpch_q10": (q_tpch_q10, SQL_TPCH_Q10),
    "tpch_q14": (q_tpch_q14, SQL_TPCH_Q14),
    "tpch_q18": (q_tpch_q18, SQL_TPCH_Q18),
    "events_sessionize": (q_events_sessionize, SQL_EVENTS_SESSIONIZE),
    "events_sessionize_native": (
        q_events_sessionize_native,
        SQL_EVENTS_SESSIONIZE_NATIVE,
    ),
    "events_hourly": (q_events_hourly, SQL_EVENTS_HOURLY),
    "events_funnel": (q_events_funnel, SQL_EVENTS_FUNNEL),
}


def register_all() -> None:
    from . import harness

    for name, (fn, sql) in QUERIES.items():
        harness.register(name, fn, sql)

"""SQL entry point — capability parity with the reference's pandasql path.

The reference exposes SQL via pandasql (caller's locals → SQLite,
main.py:12,22 / SURVEY.md §3 entry point 2); here the catalog is Spark's
temp-view registry and the dialect is Spark SQL, which strictly supersedes
SQLite's. The harness queries below run ONE shared ANSI SQL string through
BOTH engines (spark.sql and the DuckDB oracle) — the dialect overlap is the
correctness statement itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "embeddings",
]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (the engine's catalog —
    what pandasql's stack-frame inspection becomes on Spark)."""
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Run SQL against the registered catalog (ref: ps.sqldf, main.py:22)."""
    return spark.sql(query)


# one string, two engines — no translation layer
SHARED_SQL_AGG = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders
GROUP BY o_orderstatus, o_orderpriority
"""

SHARED_SQL_JOIN = """
SELECT n_name, COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""

SHARED_SQL_DELTA = """
SELECT a.o_orderkey
FROM orders a LEFT JOIN orders b
  ON a.o_orderkey = b.o_orderkey AND b.o_orderstatus = 'F'
WHERE b.o_orderkey IS NULL
"""


def q_sql_shared_agg(spark, sf_dir):
    register_views(spark, sf_dir)
    return sql(spark, SHARED_SQL_AGG)


def q_sql_shared_join(spark, sf_dir):
    register_views(spark, sf_dir)
    return sql(spark, SHARED_SQL_JOIN)


def q_sql_shared_delta(spark, sf_dir):
    """The reference's exact LEFT JOIN ... IS NULL anti-join shape
    (main.py:12) through spark.sql — Catalyst rewrites it to the same
    anti-join the DataFrame API declares directly."""
    register_views(spark, sf_dir)
    return sql(spark, SHARED_SQL_DELTA)


# LATERAL correlated subquery: per dimension row, a dependent top-k probe
# into the fact table — the SQL shape for "top 2 orders of every high-balance
# customer" that decorrelates to a ranked window join in both engines.
SHARED_SQL_LATERAL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c,
LATERAL (
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE o.o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 2
) t
WHERE c.c_acctbal > 9000
"""


def q_sql_shared_lateral(spark, sf_dir):
    register_views(spark, sf_dir)
    return sql(spark, SHARED_SQL_LATERAL)


# Recursive CTE (Spark 4 WITH RECURSIVE): a clamped running balance per
# customer — carry_k = max(0, carry_{k-1} + price_k − threshold) — is a
# max-plus recurrence that NO window frame can express (each row's value
# depends non-linearly on the previous result), so it exercises genuine
# linear recursion: one distributed (custkey, rn) equi-join per depth
# level, depth bounded by max orders per customer (fixture ~40), path
# count linear in rows. Spark supports only UNION ALL recursion, which
# this linear chain satisfies; prices are quantized to integer cents so
# both engines agree exactly.
SHARED_SQL_RECURSIVE = """
WITH RECURSIVE seq AS (
    SELECT o_custkey, o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS rn
    FROM orders
    WHERE o_custkey % 50 = 0
),
bal(o_custkey, rn, carry) AS (
    SELECT o_custkey, CAST(1 AS BIGINT),
           GREATEST(CAST(0 AS BIGINT), price_cents - 15000000)
    FROM seq WHERE rn = 1
    UNION ALL
    SELECT s.o_custkey, b.rn + 1,
           GREATEST(CAST(0 AS BIGINT), b.carry + s.price_cents - 15000000)
    FROM bal b JOIN seq s ON s.o_custkey = b.o_custkey AND s.rn = b.rn + 1
)
SELECT o_custkey, rn, carry FROM bal
"""


def q_sql_shared_recursive(spark, sf_dir):
    register_views(spark, sf_dir)
    return sql(spark, SHARED_SQL_RECURSIVE)


QUERIES = {
    "sql_shared_lateral": (q_sql_shared_lateral, SHARED_SQL_LATERAL),
    "sql_shared_recursive": (q_sql_shared_recursive, SHARED_SQL_RECURSIVE),
    "sql_shared_agg": (q_sql_shared_agg, SHARED_SQL_AGG),
    "sql_shared_join": (q_sql_shared_join, SHARED_SQL_JOIN),
    "sql_shared_delta": (q_sql_shared_delta, SHARED_SQL_DELTA),
}


def register_all() -> None:
    from . import harness

    for name, (fn, sql_str) in QUERIES.items():
        harness.register(name, fn, sql_str)

"""Data-quality constraint engine: declarative row-level rules with
quarantine routing, referential-integrity checks, and a one-pass rule
summary.

The reference validates nothing (bad rows flow straight into the store;
``SCDHelpers.py:280`` even swallows all read errors with a bare except) —
this module adds the guardrails an ETL framework needs before historization:
route rows that violate constraints into a quarantine with machine-readable
reasons, keep the good rows flowing, and report per-rule violation counts
without a second scan.

Scale shape: rule evaluation is a pure projection (an array of
(name, passed) structs folded per row — no UDFs, no shuffle, fused into the
scan); the split is two filters off one cached/shared plan; the summary is a
single hash aggregate of conditional counts (map-side partials).  The FK
check is the engine's own left-anti join — broadcast when the parent's key
set is dimension-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

VIOLATIONS_COL = "dq_violations"


def check(
    df: DataFrame, constraints: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Evaluate named boolean rules per row; return (good, quarantined).

    Quarantined rows carry ``dq_violations: array<string>`` naming every
    failed rule (a NULL rule result counts as a failure — unknown is not
    a pass).  Good rows keep the original schema.
    """
    if not constraints:
        raise ValueError("constraints must be a non-empty dict of name -> Column")
    flagged = df.withColumn(
        VIOLATIONS_COL,
        F.filter(
            F.array(
                *[
                    F.when(cond, F.lit(None).cast("string")).otherwise(
                        F.lit(name)
                    )
                    for name, cond in constraints.items()
                ]
            ),
            lambda x: x.isNotNull(),
        ),
    )
    good = flagged.filter(F.size(VIOLATIONS_COL) == 0).drop(VIOLATIONS_COL)
    bad = flagged.filter(F.size(VIOLATIONS_COL) > 0)
    return good, bad


def fk_orphans(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Child rows whose key has no match in the parent (referential
    integrity breach) — the reference's own left-anti idiom (main.py:12)
    pointed at FK validation."""
    return child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )


def summary(df: DataFrame, constraints: dict[str, Column]) -> DataFrame:
    """Per-rule violation counts in ONE aggregate pass (no per-rule scans):
    (rule, n_violations, n_rows).  NULL rule results count as violations."""
    if not constraints:
        raise ValueError("constraints must be a non-empty dict of name -> Column")
    agg = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(
                F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
            ).alias(f"__v_{i}")
            for i, cond in enumerate(constraints.values())
        ],
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"__v_{i}").alias("n_violations"),
            )
            for i, name in enumerate(constraints)
        ]
    )
    return (
        agg.select(F.explode(pairs).alias("p"), "n_rows")
        .select("p.rule", "p.n_violations", "n_rows")
    )


def _orders_rules() -> dict[str, Column]:
    return {
        "totalprice_positive": F.col("o_totalprice") > 0,
        "orderdate_not_null": F.col("o_orderdate").isNotNull(),
        "priority_known": F.col("o_orderpriority").isin(
            "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
        ),
        # deliberately breachable ceiling so the violation lane is exercised
        "totalprice_ceiling": F.col("o_totalprice") <= 300000,
    }


def q_rel_dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint summary over orders plus the FK orphan count of
    o_custkey against customer, as one union-compatible report."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    rules = summary(orders, _orders_rules())
    orphans = fk_orphans(orders, F.broadcast(customer), "o_custkey", "c_custkey")
    # total row count joined in as a broadcast singleton — no driver-side
    # .count() action, the whole report stays one lazy plan
    n_orders_df = orders.agg(F.count(F.lit(1)).alias("n_rows"))
    fk_row = (
        orphans.agg(F.count(F.lit(1)).alias("n_violations"))
        .crossJoin(F.broadcast(n_orders_df))
        .select(
            F.lit("fk_custkey_exists").alias("rule"), "n_violations", "n_rows"
        )
    )
    return rules.unionByName(fk_row)


# Every SUM is cast to BIGINT: DuckDB SUM(int) returns HUGEINT, which the
# driver's pandas canonicalizer hashes differently than Spark's BIGINT.
SQL_REL_DQ_CONSTRAINTS = """
SELECT 'totalprice_positive' AS rule,
       CAST(SUM(CASE WHEN COALESCE(o_totalprice > 0, FALSE)
                THEN 0 ELSE 1 END) AS BIGINT) AS n_violations,
       COUNT(*) AS n_rows
FROM orders
UNION ALL
SELECT 'orderdate_not_null',
       CAST(SUM(CASE WHEN o_orderdate IS NOT NULL THEN 0 ELSE 1 END)
            AS BIGINT),
       COUNT(*)
FROM orders
UNION ALL
SELECT 'priority_known',
       CAST(SUM(CASE WHEN COALESCE(o_orderpriority IN ('1-URGENT', '2-HIGH',
           '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW'), FALSE) THEN 0 ELSE 1 END)
            AS BIGINT),
       COUNT(*)
FROM orders
UNION ALL
SELECT 'totalprice_ceiling',
       CAST(SUM(CASE WHEN COALESCE(o_totalprice <= 300000, FALSE)
                THEN 0 ELSE 1 END) AS BIGINT),
       COUNT(*)
FROM orders
UNION ALL
SELECT 'fk_custkey_exists',
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)),
       COUNT(*)
FROM orders
"""


QUERIES = {
    "rel_dq_constraints": (q_rel_dq_constraints, SQL_REL_DQ_CONSTRAINTS),
}


def register_all() -> None:
    from . import harness

    for name, (fn, sql) in QUERIES.items():
        harness.register(name, fn, sql)

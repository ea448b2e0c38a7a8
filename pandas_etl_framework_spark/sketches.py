"""Distributed sketches, engine-portable by construction.

HyperLogLog distinct-count: the classic register sketch (Flajolet et al.),
built so Spark and the DuckDB oracle agree BIT-FOR-BIT — which native
``approx_count_distinct`` implementations never do across engines:

- register index = first 2 hex digits of md5(value)  (m = 256 registers);
- rank = position of the first 1-bit in the next 13 hex digits (a 52-bit
  integer x): ``53 - length(bin(x))``, 53 when x = 0 — no log/pow calls;
- the harmonic sum keeps 2^-rank as the EXACT integer 2^(53-rank), summed
  as BIGINT, so the only float op is one final literal*int division that
  both engines execute identically. (64 - 53 = 11 spare bits: the sum of
  256 * 2^53 maxes at 2^61, no overflow.)

The estimate is the raw HLL formula alpha_m * m^2 / sum (no small/large
range corrections — those need ln(), whose libm rounding differs across
engines; at the scales this gates, raw error ~1.6% is the spec behavior).

Scale: one narrow shuffle of at most m rows per aggregation group. This is
the pattern to extend to any sketch the engine needs (theta, count-min):
integer registers + exact dyadic arithmetic, floats only in the last step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_B = 8  # register-index bits (2 hex digits)
HLL_M = 1 << HLL_B  # 256 registers
# alpha_256 = 0.7213 / (1 + 1.079/256), written out so both engines see the
# same literal
HLL_ALPHA = 0.7182725806451613


def _rank_col(hash_col: F.Column) -> F.Column:
    """Rank (1-based first-1-bit position) of the 52-bit suffix."""
    x = F.conv(F.substring(hash_col, 3, 13), 16, 10).cast("long")
    return F.when(x == 0, F.lit(53)).otherwise(53 - F.length(F.bin(x)))


def hll_distinct(df: DataFrame, col: str, group_by: list[str] | None = None
                 ) -> DataFrame:
    """HLL distinct-count estimate of ``col``, optionally per group.
    Returns group columns + ``hll_estimate`` (double)."""
    h = F.md5(F.col(col).cast("string"))
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("long")
    keys = list(group_by or [])
    regs = (
        df.select(*keys, reg.alias("reg"), _rank_col(h).alias("rank"))
        .groupBy(*keys, "reg")
        .agg(F.max("rank").alias("m_j"))
    )
    # exact dyadic harmonic sum: present registers contribute 2^(53 - M_j),
    # the (m - n_present) empty registers contribute 2^53 each
    est = (
        F.lit(HLL_ALPHA * HLL_M * HLL_M * float(1 << 53))
        / (
            # F.shiftleft needs a literal shift amount; the SQL form takes a
            # column expression
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - m_j AS INT))"))
            + (F.lit(HLL_M) - F.count("*")) * F.lit(1 << 53).cast("long")
        ).cast("double")
    )
    return regs.groupBy(*keys).agg(est.alias("hll_estimate"))


def q_sketch_hll_distinct(spark, sf_dir):
    """HLL estimate vs exact distinct customer count over orders, plus the
    relative error — the accuracy contract in one row."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    est = hll_distinct(orders, "o_custkey")
    exact = orders.agg(F.countDistinct("o_custkey").alias("exact_distinct"))
    return (
        est.crossJoin(exact)
        .select(
            "exact_distinct",
            "hll_estimate",
            (
                F.abs(F.col("hll_estimate") - F.col("exact_distinct"))
                / F.col("exact_distinct")
            ).alias("rel_error"),
        )
    )


def _sql_hex_to_long(col: str, start: int, digits: int) -> str:
    expr = "0"
    for i in range(digits):
        d = f"(instr('0123456789abcdef', substr({col}, {start + i}, 1)) - 1)"
        expr = f"({expr} * 16 + {d})"
    return expr


_H = "md5(CAST(o_custkey AS VARCHAR))"
_X = _sql_hex_to_long(_H, 3, 13)

SQL_SKETCH_HLL_DISTINCT = f"""
WITH regs AS (
    SELECT {_sql_hex_to_long(_H, 1, 2)} AS reg,
           MAX(CASE WHEN {_X} = 0 THEN 53
                    ELSE 53 - LENGTH(bin({_X})) END) AS m_j
    FROM orders
    GROUP BY reg
),
est AS (
    SELECT CAST({HLL_ALPHA * HLL_M * HLL_M * float(1 << 53)!r} AS DOUBLE)
           / CAST(SUM(1::BIGINT << (53 - m_j))
                  + ({HLL_M} - COUNT(*)) * (1::BIGINT << 53) AS DOUBLE)
               AS hll_estimate
    FROM regs
),
exact AS (
    SELECT COUNT(DISTINCT o_custkey) AS exact_distinct FROM orders
)
SELECT exact_distinct, hll_estimate,
       abs(hll_estimate - exact_distinct) / exact_distinct AS rel_error
FROM est, exact
"""


QUERIES = {
    "sketch_hll_distinct": (q_sketch_hll_distinct, SQL_SKETCH_HLL_DISTINCT),
}


def register_all() -> None:
    from . import harness

    for name, (fn, sql) in QUERIES.items():
        harness.register(name, fn, sql)

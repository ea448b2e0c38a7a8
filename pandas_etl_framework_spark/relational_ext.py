"""Extended relational coverage: scalar/date function parity (SURVEY.md
§2.5 F4-F10), remaining join types (cross, full outer), string functions,
and a Pandas-UDF variant proving the Arrow path exact against the oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_scalar_date_funcs(spark, sf_dir):
    """The reference's date-function vocabulary (SURVEY.md §2.5 F4-F10):
    to_date, date_format, date_sub/add, unix epoch, literal stamping —
    as one projection over orders."""
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        F.date_sub(F.to_date("o_orderdate"), 1).alias("day_before"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("due_date"),
        F.year("o_orderdate").alias("order_year"),
        F.unix_timestamp("o_orderdate").alias("epoch_seconds"),
        F.to_date(F.lit("9999-12-31")).alias("upper_bound"),
        F.datediff(
            F.to_date(F.lit("2002-01-01")), F.to_date("o_orderdate")
        ).alias("age_days"),
    )


SQL_SCALAR_DATE_FUNCS = """
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       strftime(o_orderdate, '%Y-%m') AS order_month,
       CAST(o_orderdate AS DATE) - 1 AS day_before,
       CAST(o_orderdate AS DATE) + 30 AS due_date,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_seconds,
       DATE '9999-12-31' AS upper_bound,
       CAST(DATE '2002-01-01' - CAST(o_orderdate AS DATE) AS INTEGER) AS age_days
FROM orders
"""


def q_string_funcs(spark, sf_dir):
    """String-function vocabulary: case, substring, concat_ws, like,
    regexp_replace, length, instr."""
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.col("p_name").like("%green%").alias("is_green"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowels"),
        F.length("p_name").alias("name_len"),
        (F.instr(F.col("p_type"), "BRASS") > 0).alias("has_brass"),
    )


SQL_STRING_FUNCS = """
SELECT p_partkey,
       upper(p_brand) AS brand_upper,
       lower(p_type) AS type_lower,
       substr(p_name, 1, 8) AS name_prefix,
       concat_ws('/', p_brand, p_type) AS brand_type,
       p_name LIKE '%green%' AS is_green,
       regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels,
       LENGTH(p_name) AS name_len,
       instr(p_type, 'BRASS') > 0 AS has_brass
FROM part
"""


def q_case_when(spark, sf_dir):
    """Conditional routing (the SCD2 row-router's scalar form)."""
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 400000, "high")
        .when(F.col("o_totalprice") > 150000, "medium")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("?")).alias(
            "status_or_unknown"
        ),
    )


SQL_CASE_WHEN = """
SELECT o_orderkey,
       CASE WHEN o_totalprice > 400000 THEN 'high'
            WHEN o_totalprice > 150000 THEN 'medium'
            ELSE 'low' END AS price_band,
       COALESCE(NULLIF(o_orderstatus, 'P'), '?') AS status_or_unknown
FROM orders
"""


def q_cross_join(spark, sf_dir):
    """Explicit cartesian product (dims only — never facts)."""
    region = _t(spark, sf_dir, "region").select("r_name")
    status = (
        _t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    )
    return region.crossJoin(status)


SQL_CROSS_JOIN = """
SELECT r_name, o_orderstatus
FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
"""


def q_full_outer_join(spark, sf_dir):
    """Full outer: per-nation customer vs supplier counts, keeping nations
    present on either side only."""
    cust = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
        .filter(F.col("nationkey") % 3 != 0)
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
        .filter(F.col("nationkey") % 3 != 1)
    )
    return cust.join(supp, ["nationkey"], "full_outer").select(
        "nationkey",
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


SQL_FULL_OUTER_JOIN = """
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       COALESCE(n_customers, 0) AS n_customers,
       COALESCE(n_suppliers, 0) AS n_suppliers
FROM (
    SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
    FROM customer GROUP BY c_nationkey HAVING (c_nationkey % 3) <> 0
) c
FULL OUTER JOIN (
    SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
    FROM supplier GROUP BY s_nationkey HAVING (s_nationkey % 3) <> 1
) s ON c.nationkey = s.nationkey
"""


def q_having(spark, sf_dir):
    """Post-aggregation filter (HAVING)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 20)
    )


SQL_HAVING = """
SELECT o_custkey, COUNT(*) AS n_orders
FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 20
"""


# --------------------------------------------------------------------------
# Pandas-UDF variant proved against the oracle
# --------------------------------------------------------------------------

_TOKENS_UDF_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.IntegerType()),
        T.StructField("n_chars", T.IntegerType()),
    ]
)


def q_text_tokens_pandas_udf(spark, sf_dir):
    """Token counting through the Arrow/Pandas-UDF path (mapInPandas) —
    same oracle as the JVM-side variant, demonstrating that results from
    the Python boundary are exact, not approximately equal."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pdf["text"].str.strip().str.split().str.len(),
                    "n_chars": pdf["text"].str.len(),
                }
            )

    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .mapInPandas(per_batch, _TOKENS_UDF_SCHEMA)
    )


SQL_TEXT_TOKENS_PANDAS_UDF = r"""
SELECT doc_id,
       CAST(LEN(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens,
       CAST(LENGTH(text) AS INTEGER) AS n_chars
FROM documents
"""


def q_events_json_extract(spark, sf_dir):
    """Semi-structured access: pull a typed field out of the JSON props
    column and aggregate on it (JVM-side get_json_object — no Python)."""
    from .relational import load_events

    events = load_events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum(F.col("k").cast("long")).alias("sum_k"),
        )
    )


SQL_EVENTS_JSON_EXTRACT = """
SELECT event_type, COUNT(*) AS n,
       MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS min_k,
       MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS max_k,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
           AS sum_k
FROM events GROUP BY event_type
"""


def q_events_udaf_pandas(spark, sf_dir):
    """User-defined aggregate through the Arrow path: a pandas Series
    aggregation per group (integer-exact, so oracle-comparable). The UDAF
    surface the reference lacks entirely (SURVEY.md §2.6)."""
    from pyspark.sql.functions import pandas_udf

    from .relational import load_events

    @pandas_udf("long")
    def quantized_abs_sum(v: pd.Series) -> int:
        return int((v * 10000).round().astype("int64").abs().sum())

    events = load_events(spark, sf_dir)
    return events.groupBy("event_type").agg(
        quantized_abs_sum(F.col("value")).alias("abs_value_q")
    )


SQL_EVENTS_UDAF_PANDAS = """
SELECT event_type,
       CAST(SUM(abs(CAST(round(value * 10000) AS BIGINT))) AS BIGINT)
           AS abs_value_q
FROM events GROUP BY event_type
"""


_ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("z", T.DoubleType()),
    ]
)


def q_events_grouped_map_zscore(spark, sf_dir):
    """Grouped-map operator (applyInPandas): per-event z-score within its
    event_type. All statistics derive from exact integer sums (Python
    arbitrary-precision in the UDF, HUGEINT in the oracle), so the final
    doubles are bit-identical: z = (n*v - sum) / sqrt(n*sumsq - sum²)."""
    import math

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        vq = (pdf["value"] * 10000).round().astype("int64")
        n = len(pdf)
        s = int(vq.sum())
        ss = sum(int(v) * int(v) for v in vq)
        den2 = n * ss - s * s
        den = math.sqrt(float(den2)) if den2 > 0 else float("nan")
        z = [float(int(v) * n - s) / den for v in vq]
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "event_type": pdf["event_type"], "z": z}
        )

    from .relational import load_events

    return (
        load_events(spark, sf_dir)
        .select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(zscore, _ZSCORE_SCHEMA)
    )


SQL_EVENTS_ZSCORE = """
WITH q AS (
    SELECT event_id, event_type, CAST(round(value * 10000) AS BIGINT) AS vq
    FROM events
),
g AS (
    SELECT event_type, COUNT(*) AS n,
           SUM(CAST(vq AS HUGEINT)) AS s,
           SUM(CAST(vq AS HUGEINT) * CAST(vq AS HUGEINT)) AS ss
    FROM q GROUP BY event_type
)
SELECT event_id, q.event_type,
       CAST(CAST(vq AS HUGEINT) * n - s AS DOUBLE)
           / sqrt(CAST(n * ss - s * s AS DOUBLE)) AS z
FROM q JOIN g ON q.event_type = g.event_type
"""


def q_cdc_changed_columns(spark, sf_dir):
    """Column-level change detection: for each updated key, the
    comma-joined (schema-ordered) list of business columns whose value
    changed between the current and new version — the drill-down the
    record-hash comparison can't answer by itself."""
    from .harness import ORDERS_COLS, stamped1, stamped2

    a = stamped1(spark, sf_dir).alias("a")
    b = stamped2(spark, sf_dir).alias("b")
    changed_markers = [
        F.when(
            ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")), F.lit(c)
        )
        for c in ORDERS_COLS
    ]
    return (
        a.join(
            b,
            (F.col("a.KEY_HASH") == F.col("b.KEY_HASH"))
            & (F.col("a.RECORD_HASH") != F.col("b.RECORD_HASH")),
        )
        .select(
            F.col("a.o_orderkey").alias("o_orderkey"),
            F.concat_ws(",", *changed_markers).alias("changed_columns"),
        )
    )


def _sql_changed_columns() -> str:
    from .harness import CDC_PRELUDE, ORDERS_COLS

    markers = ", ".join(
        f"CASE WHEN a.{c} IS DISTINCT FROM b.{c} THEN '{c}' END"
        for c in ORDERS_COLS
    )
    return (
        CDC_PRELUDE
        + f"""
SELECT a.o_orderkey, concat_ws(',', {markers}) AS changed_columns
FROM stamped1 a JOIN stamped2 b
  ON a.KEY_HASH = b.KEY_HASH AND a.RECORD_HASH <> b.RECORD_HASH
"""
    )


QUERIES = {
    "rel_scalar_date_funcs": (q_scalar_date_funcs, SQL_SCALAR_DATE_FUNCS),
    "rel_string_funcs": (q_string_funcs, SQL_STRING_FUNCS),
    "rel_case_when": (q_case_when, SQL_CASE_WHEN),
    "rel_cross_join": (q_cross_join, SQL_CROSS_JOIN),
    "rel_full_outer_join": (q_full_outer_join, SQL_FULL_OUTER_JOIN),
    "rel_having": (q_having, SQL_HAVING),
    "text_tokens_pandas_udf": (q_text_tokens_pandas_udf, SQL_TEXT_TOKENS_PANDAS_UDF),
    "events_json_extract": (q_events_json_extract, SQL_EVENTS_JSON_EXTRACT),
    "events_udaf_pandas": (q_events_udaf_pandas, SQL_EVENTS_UDAF_PANDAS),
    "events_grouped_map_zscore": (q_events_grouped_map_zscore, SQL_EVENTS_ZSCORE),
}


def register_all() -> None:
    from . import harness

    for name, (fn, sql) in QUERIES.items():
        harness.register(name, fn, sql)
    harness.register(
        "cdc_changed_columns", q_cdc_changed_columns, _sql_changed_columns()
    )

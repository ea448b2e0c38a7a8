"""Driver-harness query registry: every operator exposed as a
(spark_callable, duckdb_oracle_sql) pair.

Conventions that keep the Spark result and the DuckDB oracle hash-identical:

- Every computed column is aliased to the same name on both sides.
- Floating-point aggregates go through ``DECIMAL(18,4)`` accumulation and a
  final cast to double: decimal addition is exact/associative, so the result
  is bit-identical regardless of partial-aggregation order on either engine
  (raw double sums differ in the last ulp between engines).
- Hash preimages stringify via the same rules as meta_columns.stringify_for_hash
  (timestamps pinned to 'yyyy-MM-dd HH:mm:ss', NULL → 'nan').
- Top-k queries always carry a unique tie-break column so LIMIT is
  deterministic.

The CDC/SCD family synthesizes deterministic "old/new load" pairs from the
``orders`` table (FIXTURES.md §5): batch1 = orders with o_orderkey % 10 < 8;
batch2 = orders with o_orderkey % 10 >= 5 where rows with o_orderkey % 3 == 0
get o_totalprice + 1.0 (the "changed" records).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import cdc, scd2
from .constants import (
    KEY_HASH,
    RECORD_HASH,
    VALID_FROM_MODE_LOAD_DATE,
    VALID_FROM_MODE_LOWER_BOUND,
)
from .meta_columns import add_meta_columns, create_currents

RUN1_TS = "2024-01-10 08:00:00"
RUN2_TS = "2024-01-11 08:00:00"
RUN1_ID = "20240110080000"
RUN2_ID = "20240111080000"

ORDERS_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# CDC batch builders (Spark side)
# --------------------------------------------------------------------------

def orders_batch1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 < 8)


def orders_batch2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 >= 5)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + F.lit(1.0)
            ).otherwise(F.col("o_totalprice")),
        )
    )


def stamped1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return add_meta_columns(
        orders_batch1(spark, sf_dir), create_currents(RUN1_TS), ["o_orderkey"]
    )


def stamped2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return add_meta_columns(
        orders_batch2(spark, sf_dir), create_currents(RUN2_TS), ["o_orderkey"]
    )


# --------------------------------------------------------------------------
# CDC batch builders (oracle side) — shared SQL CTE prelude
# --------------------------------------------------------------------------

def _sql_stringify(col: str, dtype: str) -> str:
    if dtype == "timestamp":
        return f"coalesce(strftime({col}, '%Y-%m-%d %H:%M:%S'), 'nan')"
    return f"coalesce(cast({col} as varchar), 'nan')"

_ORDERS_TYPES = {
    "o_orderkey": "bigint",
    "o_custkey": "bigint",
    "o_orderstatus": "varchar",
    "o_totalprice": "double",
    "o_orderdate": "timestamp",
    "o_orderpriority": "varchar",
}

_RECORD_PREIMAGE = ", ".join(
    _sql_stringify(c, _ORDERS_TYPES[c]) for c in ORDERS_COLS
)


def _stamp_sql(src: str, run_ts: str, run_id: str) -> str:
    return f"""
    SELECT *,
           md5(coalesce(cast(o_orderkey as varchar), 'nan')) AS KEY_HASH,
           md5(concat_ws('#?', {_RECORD_PREIMAGE})) AS RECORD_HASH,
           TIMESTAMP '{run_ts}' AS INSERT_TS,
           TIMESTAMP '{run_ts}' AS UPDATE_TS,
           '{run_id}' AS INSERT_RUN_ID,
           '{run_id}' AS UPDATE_RUN_ID,
           CAST(NULL AS TIMESTAMP) AS DELETED
    FROM {src}
    """


CDC_PRELUDE = f"""
WITH batch1 AS (
    SELECT * FROM orders WHERE o_orderkey % 10 < 8
),
batch2 AS (
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
                ELSE o_totalprice END AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 10 >= 5
),
stamped1 AS ({_stamp_sql('batch1', RUN1_TS, RUN1_ID)}),
stamped2 AS ({_stamp_sql('batch2', RUN2_TS, RUN2_ID)})
"""

STAMPED_COLS = ORDERS_COLS + [
    "KEY_HASH",
    "RECORD_HASH",
    "INSERT_TS",
    "UPDATE_TS",
    "INSERT_RUN_ID",
    "UPDATE_RUN_ID",
    "DELETED",
]
_S = ", ".join(STAMPED_COLS)


# --------------------------------------------------------------------------
# CDC / SCD2 queries
# --------------------------------------------------------------------------

def q_cdc_add_meta(spark, sf_dir):
    return stamped1(spark, sf_dir).select(*STAMPED_COLS)


SQL_CDC_ADD_META = CDC_PRELUDE + f"SELECT {_S} FROM stamped1"


def q_cdc_source_file_meta(spark, sf_dir):
    """SOURCE_FILE_NAME provenance stamping (VERDICT r06 item 7): stamp
    batch1 with ``source_file=True`` so the real ``F.input_file_name()``
    path is exercised, then project the path's BASENAME — deterministic
    across hosts (the absolute sf_dir differs per environment, the file
    name does not). The oracle pins the literal 'orders.parquet', which
    assumes a SINGLE-FILE fixture — input_file_name() on a multi-part
    directory layout would surface 'part-*.parquet' basenames and turn
    the row into an opaque hash mismatch, so that contract is asserted
    loudly here at query build (ADVICE r07)."""
    import os

    from .constants import SOURCE_FILE_NAME

    fixture = f"{sf_dir}/orders.parquet"
    if os.path.isdir(fixture):
        raise ValueError(
            f"cdc_source_file_meta needs a single-file fixture; {fixture} "
            "is a directory (multi-part layout) — its part-file basenames "
            "would not match the oracle's pinned 'orders.parquet'"
        )
    if not os.path.isfile(fixture):
        # distinct message: a missing path (wrong sf_dir) or a
        # non-local filesystem is not a layout problem
        raise ValueError(
            f"cdc_source_file_meta cannot verify the single-file fixture "
            f"contract: {fixture} is not visible as a local file"
        )

    stamped = add_meta_columns(
        orders_batch1(spark, sf_dir),
        create_currents(RUN1_TS),
        ["o_orderkey"],
        source_file=True,
    )
    return stamped.select(
        "o_orderkey",
        KEY_HASH,
        "INSERT_RUN_ID",
        F.regexp_extract(F.col(SOURCE_FILE_NAME), "[^/]+$", 0).alias(
            "source_file_base"
        ),
    )


SQL_CDC_SOURCE_FILE_META = CDC_PRELUDE + """
SELECT o_orderkey, KEY_HASH, INSERT_RUN_ID,
       'orders.parquet' AS source_file_base
FROM stamped1
"""


def q_cdc_delta(spark, sf_dir):
    return cdc.get_delta(stamped1(spark, sf_dir), stamped2(spark, sf_dir)).select(
        *STAMPED_COLS
    )


SQL_CDC_DELTA = CDC_PRELUDE + f"""
SELECT {_S} FROM stamped2 n
WHERE NOT EXISTS (
    SELECT 1 FROM stamped1 c
    WHERE c.KEY_HASH = n.KEY_HASH AND c.RECORD_HASH = n.RECORD_HASH
)
"""


def q_cdc_inserts(spark, sf_dir):
    return cdc.get_inserts(stamped1(spark, sf_dir), stamped2(spark, sf_dir)).select(
        *STAMPED_COLS
    )


SQL_CDC_INSERTS = CDC_PRELUDE + f"""
SELECT {_S} FROM stamped2 n
WHERE NOT EXISTS (SELECT 1 FROM stamped1 c WHERE c.KEY_HASH = n.KEY_HASH)
"""


def q_cdc_updates(spark, sf_dir):
    return cdc.get_updates(stamped1(spark, sf_dir), stamped2(spark, sf_dir)).select(
        *STAMPED_COLS
    )


SQL_CDC_UPDATES = CDC_PRELUDE + f"""
SELECT {_S} FROM stamped2 n
WHERE EXISTS (
    SELECT 1 FROM stamped1 c
    WHERE c.KEY_HASH = n.KEY_HASH AND c.RECORD_HASH <> n.RECORD_HASH
)
"""


def q_cdc_merge_cdc(spark, sf_dir):
    return cdc.merge_cdc(
        stamped1(spark, sf_dir), stamped2(spark, sf_dir), [KEY_HASH]
    ).select(*STAMPED_COLS)


SQL_CDC_MERGE = CDC_PRELUDE + f"""
SELECT {_S} FROM stamped1 c
WHERE NOT EXISTS (SELECT 1 FROM stamped2 n WHERE n.KEY_HASH = c.KEY_HASH)
UNION ALL
SELECT {_S} FROM stamped2
"""


def q_cdc_deleted_by_full_load(spark, sf_dir):
    return cdc.get_deleted_by_full_load(stamped1(spark, sf_dir), stamped2(spark, sf_dir))


SQL_CDC_DELETED = CDC_PRELUDE + """
SELECT DISTINCT KEY_HASH FROM stamped1 c
WHERE NOT EXISTS (SELECT 1 FROM stamped2 n WHERE n.KEY_HASH = c.KEY_HASH)
"""


def q_cdc_deletes_by_column(spark, sf_dir):
    return cdc.get_deletes_by_column(stamped1(spark, sf_dir), "o_orderstatus", "F")


SQL_CDC_DELETES_BY_COLUMN = CDC_PRELUDE + """
SELECT KEY_HASH FROM stamped1 WHERE o_orderstatus = 'F'
"""


def q_cdc_historize_two_runs(spark, sf_dir):
    """Append-only store content after two runs (LIVE pipeline semantics,
    computed functionally: run1 delta = all of stamped1; run2 delta =
    stamped2 ∖ stamped1 on both hashes)."""
    s1 = stamped1(spark, sf_dir)
    s2 = stamped2(spark, sf_dir)
    return s1.select(*STAMPED_COLS).unionByName(
        cdc.get_delta(s1, s2).select(*STAMPED_COLS)
    )


SQL_CDC_HISTORIZE = CDC_PRELUDE + f"""
SELECT {_S} FROM stamped1
UNION ALL
SELECT {_S} FROM stamped2 n
WHERE NOT EXISTS (
    SELECT 1 FROM stamped1 c
    WHERE c.KEY_HASH = n.KEY_HASH AND c.RECORD_HASH = n.RECORD_HASH
)
"""

SCD2_COLS = STAMPED_COLS + ["VALID_FROM", "VALID_TO"]
_SC = ", ".join(SCD2_COLS)


def q_scd2_merge(spark, sf_dir):
    c1 = create_currents(RUN1_TS)
    c2 = create_currents(RUN2_TS)
    # bootstrap is a join-free stamping projection, so the 3x consumption
    # inside merge_scd2 just re-scans the (pruned) parquet source
    store = scd2.historize_dataset(
        stamped1(spark, sf_dir), None, c1, VALID_FROM_MODE_LOWER_BOUND
    )
    return scd2.merge_scd2(
        store, stamped2(spark, sf_dir), c2, VALID_FROM_MODE_LOAD_DATE
    ).select(*SCD2_COLS)


# Oracle mirrors the reference's 5-way union (SCDHelpers.py:139-216) on the
# bootstrapped store (all batch1 rows open with VALID_FROM = lower bound).
SQL_SCD2_MERGE = CDC_PRELUDE + f""",
store AS (
    SELECT *, DATE '1900-01-01' AS VALID_FROM, DATE '9999-12-31' AS VALID_TO
    FROM stamped1
)
SELECT {_SC} FROM store c                                   -- current_only
WHERE NOT EXISTS (SELECT 1 FROM stamped2 n WHERE n.KEY_HASH = c.KEY_HASH)
   OR c.VALID_TO <> DATE '9999-12-31'
UNION ALL
SELECT {", ".join(STAMPED_COLS)},                            -- new_only
       DATE '{RUN2_TS[:10]}' AS VALID_FROM, DATE '9999-12-31' AS VALID_TO
FROM stamped2 n
WHERE n.KEY_HASH NOT IN (SELECT KEY_HASH FROM store)
UNION ALL
SELECT c.* FROM store c                                      -- unchanged_current
JOIN stamped2 n ON c.KEY_HASH = n.KEY_HASH AND c.RECORD_HASH = n.RECORD_HASH
WHERE c.VALID_TO = DATE '9999-12-31'
UNION ALL
SELECT {", ".join("c." + x for x in ORDERS_COLS)},           -- changed_current
       c.KEY_HASH, c.RECORD_HASH, c.INSERT_TS,
       TIMESTAMP '{RUN2_TS}' AS UPDATE_TS,
       c.INSERT_RUN_ID, '{RUN2_ID}' AS UPDATE_RUN_ID, c.DELETED,
       c.VALID_FROM, DATE '{RUN2_TS[:10]}' - 1 AS VALID_TO
FROM store c
JOIN stamped2 n ON c.KEY_HASH = n.KEY_HASH AND c.RECORD_HASH <> n.RECORD_HASH
WHERE c.VALID_TO = DATE '9999-12-31'
UNION ALL
SELECT {", ".join("n." + x for x in STAMPED_COLS)},          -- changed_new
       DATE '{RUN2_TS[:10]}' AS VALID_FROM, DATE '9999-12-31' AS VALID_TO
FROM stamped2 n
JOIN store c ON c.KEY_HASH = n.KEY_HASH AND c.RECORD_HASH <> n.RECORD_HASH
WHERE c.VALID_TO = DATE '9999-12-31'
"""


def q_scd2_split_active(spark, sf_dir):
    _, active = scd2.split_merged_dataset(q_scd2_merge(spark, sf_dir))
    return active


def _wrap_scd2(predicate: str) -> str:
    return (
        f"SELECT * FROM (\n{SQL_SCD2_MERGE}\n) merged WHERE {predicate}"
    )


SQL_SCD2_SPLIT_ACTIVE = _wrap_scd2("VALID_TO = DATE '9999-12-31'")


def q_scd2_split_hist(spark, sf_dir):
    hist, _ = scd2.split_merged_dataset(q_scd2_merge(spark, sf_dir))
    return hist


SQL_SCD2_SPLIT_HIST = _wrap_scd2("VALID_TO < DATE '9999-12-31'")


def q_cdc_version_history(spark, sf_dir):
    """Per-key version timeline over the append-only store: each version
    numbered in arrival order with its run id — the lineage view of what
    the CDC capture accumulated (ref semantics: SURVEY.md §2.7)."""
    from pyspark.sql import Window

    store = q_cdc_historize_two_runs(spark, sf_dir)
    w = Window.partitionBy(KEY_HASH).orderBy("INSERT_RUN_ID", RECORD_HASH)
    return store.select(
        KEY_HASH,
        RECORD_HASH,
        "INSERT_RUN_ID",
        F.row_number().over(w).alias("version_number"),
        F.count("*").over(Window.partitionBy(KEY_HASH)).alias("n_versions"),
    )


SQL_CDC_VERSION_HISTORY = CDC_PRELUDE + """,
store AS (
    SELECT * FROM stamped1
    UNION ALL
    SELECT * FROM stamped2 n
    WHERE NOT EXISTS (
        SELECT 1 FROM stamped1 c
        WHERE c.KEY_HASH = n.KEY_HASH AND c.RECORD_HASH = n.RECORD_HASH
    )
)
SELECT KEY_HASH, RECORD_HASH, INSERT_RUN_ID,
       ROW_NUMBER() OVER (
           PARTITION BY KEY_HASH ORDER BY INSERT_RUN_ID, RECORD_HASH
       ) AS version_number,
       COUNT(*) OVER (PARTITION BY KEY_HASH) AS n_versions
FROM store
"""


def q_cdc_latest_snapshot(spark, sf_dir):
    """Current-state reconstruction from the append-only store: the latest
    version per key (last run id, record-hash tie-break) — the read-side
    operator the reference's append-only capture implies but never ships
    (its store only ever accumulates, main.py:23-24).  One window shuffle
    on KEY_HASH; on a run-partitioned store at scale, pair with a run-id
    lower-bound filter to prune partitions before the window."""
    from pyspark.sql import Window

    store = q_cdc_historize_two_runs(spark, sf_dir)
    w = Window.partitionBy(KEY_HASH).orderBy(
        F.col("INSERT_RUN_ID").desc(), F.col(RECORD_HASH).desc()
    )
    return (
        store.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(*STAMPED_COLS)
    )


SQL_CDC_LATEST_SNAPSHOT = CDC_PRELUDE + f""",
store AS (
    SELECT * FROM stamped1
    UNION ALL
    SELECT * FROM stamped2 n
    WHERE NOT EXISTS (
        SELECT 1 FROM stamped1 c
        WHERE c.KEY_HASH = n.KEY_HASH AND c.RECORD_HASH = n.RECORD_HASH
    )
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY KEY_HASH
        ORDER BY INSERT_RUN_ID DESC, RECORD_HASH DESC) AS rk
    FROM store
)
SELECT {_S} FROM ranked WHERE rk = 1
"""


def q_cdc_store_diff(spark, sf_dir):
    """Store reconciliation: symmetric diff of two stores by version
    identity — per key-hash class (only_left / only_right / both-changed /
    identical), the row counts. The ops tool for 'do these two replicas
    agree, and how do they differ'."""
    a = stamped1(spark, sf_dir).select(KEY_HASH, RECORD_HASH)
    b = stamped2(spark, sf_dir).select(
        F.col(KEY_HASH).alias("kh_b"), F.col(RECORD_HASH).alias("rh_b")
    )
    joined = a.join(b, a[KEY_HASH] == b["kh_b"], "full_outer")
    klass = (
        F.when(F.col("kh_b").isNull(), "only_left")
        .when(F.col(KEY_HASH).isNull(), "only_right")
        .when(F.col(RECORD_HASH) == F.col("rh_b"), "identical")
        .otherwise("changed")
    )
    return joined.select(klass.alias("diff_class")).groupBy("diff_class").agg(
        F.count("*").alias("n")
    )


SQL_CDC_STORE_DIFF = CDC_PRELUDE + """
SELECT CASE
         WHEN b.KEY_HASH IS NULL THEN 'only_left'
         WHEN a.KEY_HASH IS NULL THEN 'only_right'
         WHEN a.RECORD_HASH = b.RECORD_HASH THEN 'identical'
         ELSE 'changed' END AS diff_class,
       COUNT(*) AS n
FROM stamped1 a FULL OUTER JOIN stamped2 b ON a.KEY_HASH = b.KEY_HASH
GROUP BY 1
"""


def q_scd2_snapshot(spark, sf_dir):
    """Historical state: the two-run SCD2 store as it was on the day of
    run 1 — changed keys must show their ORIGINAL version (new run-2
    versions only become valid the next day)."""
    return scd2.snapshot_at(q_scd2_merge(spark, sf_dir), RUN1_TS[:10]).select(
        *SCD2_COLS
    )


SQL_SCD2_SNAPSHOT = (
    f"SELECT * FROM (\n{SQL_SCD2_MERGE}\n) merged\n"
    f"WHERE VALID_FROM <= DATE '{RUN1_TS[:10]}' AND VALID_TO >= DATE '{RUN1_TS[:10]}'"
)


def q_scd2_pit_join(spark, sf_dir):
    """Point-in-time (as-of) join against the SCD2 store: every fact row
    probes the dimension at its OWN date — ``probe = 2024-01-09 +
    (o_orderkey % 4) days`` spans the day before run 1's visibility, both
    run days, and the day after, so the join must pick the bootstrap
    version, the closed version, or the run-2 version per row (and drop
    probes that predate a key's first version — batch-2-only keys before
    2024-01-11). Plan shape: an equi-join on the key with the BETWEEN as
    a post-join filter — validity intervals partition time, so each fact
    matches at most one version. At warehouse scale this is THE SCD2
    consumption pattern (fact enrichment at transaction time)."""
    merged = q_scd2_merge(spark, sf_dir)
    probes = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("probe_key"),
        F.date_add(
            F.to_date(F.lit("2024-01-09")),
            (F.col("o_orderkey") % 4).cast("int"),
        ).alias("probe_date"),
    )
    return (
        probes.join(merged, probes.probe_key == merged.o_orderkey)
        .filter(
            (F.col("probe_date") >= F.col("VALID_FROM"))
            & (F.col("probe_date") <= F.col("VALID_TO"))
        )
        .select(
            "o_orderkey",
            "probe_date",
            "INSERT_RUN_ID",
            "UPDATE_RUN_ID",
            "RECORD_HASH",
            "VALID_FROM",
            "VALID_TO",
        )
    )


SQL_SCD2_PIT_JOIN = f"""
SELECT m.o_orderkey,
       DATE '2024-01-09' + CAST(p.o_orderkey % 4 AS INTEGER) AS probe_date,
       m.INSERT_RUN_ID, m.UPDATE_RUN_ID, m.RECORD_HASH,
       m.VALID_FROM, m.VALID_TO
FROM orders p
JOIN (\n{SQL_SCD2_MERGE}\n) m ON p.o_orderkey = m.o_orderkey
WHERE DATE '2024-01-09' + CAST(p.o_orderkey % 4 AS INTEGER)
      BETWEEN m.VALID_FROM AND m.VALID_TO
"""


def q_schema_prepare(spark, sf_dir):
    from pyspark.sql import types as T

    from .schema import prepare_schema

    target = T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
            T.StructField("r_comment", T.StringType()),
            T.StructField("r_priority", T.IntegerType()),
        ]
    )
    return prepare_schema(
        table(spark, sf_dir, "region"),
        target,
        default_values={"r_priority": 7},
        remove_columns=True,
    )


SQL_SCHEMA_PREPARE = """
SELECT r_regionkey, r_name,
       CAST(NULL AS VARCHAR) AS r_comment,
       CAST(7 AS INTEGER) AS r_priority
FROM region
"""


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------

# name -> (spark_callable, oracle_sql | None). The oracle slot may also
# hold a zero-arg CALLABLE returning the SQL string, for oracles whose
# generation needs I/O (text_bpe_train's precomputed VALUES) — resolved
# lazily by __spark_entry__.oracle_sql() so harness import stays pure.
REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "cdc_add_meta": (q_cdc_add_meta, SQL_CDC_ADD_META),
    "cdc_source_file_meta": (q_cdc_source_file_meta, SQL_CDC_SOURCE_FILE_META),
    "cdc_delta": (q_cdc_delta, SQL_CDC_DELTA),
    "cdc_inserts": (q_cdc_inserts, SQL_CDC_INSERTS),
    "cdc_updates": (q_cdc_updates, SQL_CDC_UPDATES),
    "cdc_merge_cdc": (q_cdc_merge_cdc, SQL_CDC_MERGE),
    "cdc_deleted_by_full_load": (q_cdc_deleted_by_full_load, SQL_CDC_DELETED),
    "cdc_deletes_by_column": (q_cdc_deletes_by_column, SQL_CDC_DELETES_BY_COLUMN),
    "cdc_historize_two_runs": (q_cdc_historize_two_runs, SQL_CDC_HISTORIZE),
    "cdc_store_diff": (q_cdc_store_diff, SQL_CDC_STORE_DIFF),
    "cdc_version_history": (q_cdc_version_history, SQL_CDC_VERSION_HISTORY),
    "cdc_latest_snapshot": (q_cdc_latest_snapshot, SQL_CDC_LATEST_SNAPSHOT),
    "scd2_merge": (q_scd2_merge, SQL_SCD2_MERGE),
    "scd2_split_active": (q_scd2_split_active, SQL_SCD2_SPLIT_ACTIVE),
    "scd2_split_hist": (q_scd2_split_hist, SQL_SCD2_SPLIT_HIST),
    "scd2_snapshot": (q_scd2_snapshot, SQL_SCD2_SNAPSHOT),
    "scd2_pit_join": (q_scd2_pit_join, SQL_SCD2_PIT_JOIN),
    "schema_prepare": (q_schema_prepare, SQL_SCHEMA_PREPARE),
}


def register(name: str, fn, sql: str | None) -> None:
    if name in REGISTRY:
        # a silent overwrite would hide one of two same-named queries from
        # the driver (and its oracle) with no symptom anywhere
        raise ValueError(f"duplicate registry query name: {name}")
    REGISTRY[name] = (fn, sql)


# extended families registered on import
from . import relational as _relational  # noqa: E402,F401
from . import relational_ext as _relational_ext  # noqa: E402,F401
from . import relational_ext2 as _relational_ext2  # noqa: E402,F401
from . import relational_tpch as _relational_tpch  # noqa: E402,F401
from . import relational_ts as _relational_ts  # noqa: E402,F401
from . import sketches as _sketches  # noqa: E402,F401
from . import graph as _graph  # noqa: E402,F401
from . import scale as _scale  # noqa: E402,F401
from . import sql_entry as _sql_entry  # noqa: E402,F401
from . import dq as _dq  # noqa: E402,F401
from . import fuzzy as _fuzzy  # noqa: E402,F401
from . import io_queries as _io_queries  # noqa: E402,F401
from .llmops import register_all as _llmops_register_all  # noqa: E402
from .streaming import windows as _streaming_windows  # noqa: E402

_relational.register_all()
_relational_ext.register_all()
_relational_ext2.register_all()
_relational_tpch.register_all()
_relational_ts.register_all()
_sketches.register_all()
_graph.register_all()
_scale.register_all()
_sql_entry.register_all()
_dq.register_all()
_fuzzy.register_all()
_io_queries.register_all()
_llmops_register_all()
_streaming_windows.register_all()

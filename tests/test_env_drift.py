"""Environment-drift guard: the testdata parquet files and the installed
Spark version have both silently changed between rounds (TIMESTAMP(NANOS) →
bigint under nanosAsLong, then tz-less timestamp[us] → TIMESTAMP_NTZ under
Spark 4.1), each time turning green queries into analysis errors mid-round.

This test pins the dtype contract every query assumes, so the next drift
fails loudly in seconds instead of crashing the bench.
"""

from __future__ import annotations

import os

import pytest

from pandas_etl_framework_spark.relational import load_events

SF_DIR = "/root/testdata/sf0.01"

# (table, column) → expected normalized dtype, for the columns whose types
# queries depend on arithmetically (not an exhaustive schema snapshot).
EXPECTED = {
    ("orders", "o_orderkey"): "bigint",
    ("orders", "o_totalprice"): "double",
    # date-like columns currently load as timestamp_ntz (Spark 4.1 reading
    # tz-less timestamp[us]); string comparisons coerce correctly, so the
    # queries tolerate any of these — but a move to e.g. bigint would not.
    ("orders", "o_orderdate"): {"date", "string", "timestamp", "timestamp_ntz"},
    ("lineitem", "l_quantity"): "double",
    ("lineitem", "l_extendedprice"): "double",
    ("lineitem", "l_discount"): "double",
    ("lineitem", "l_shipdate"): {"date", "string", "timestamp", "timestamp_ntz"},
    ("customer", "c_custkey"): "bigint",
    ("documents", "doc_id"): "bigint",
    ("documents", "text"): "string",
    ("embeddings", "vec_id"): "bigint",
    ("embeddings", "embedding"): "array<float>",
}


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_events_ts_normalizes_to_timestamp(spark):
    """After load_events, ts must be plain TIMESTAMP (not NTZ, not bigint):
    epoch casts, window gaps, and streaming watermarks all require it."""
    ev = load_events(spark, SF_DIR)
    assert dict(ev.dtypes)["ts"] == "timestamp", (
        "events.ts did not normalize to TIMESTAMP — parquet physical type "
        "or Spark reader behavior drifted again; extend "
        "relational.normalize_event_time"
    )
    # and the epoch arithmetic the queries rely on must analyze
    ev.selectExpr("cast(ts as double) AS epoch_s").limit(1).collect()


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_table_column_dtypes(spark):
    by_table: dict[str, dict[str, str]] = {}
    for (table, col), want in EXPECTED.items():
        if table not in by_table:
            by_table[table] = dict(
                spark.read.parquet(f"{SF_DIR}/{table}.parquet").dtypes
            )
        got = by_table[table].get(col)
        allowed = want if isinstance(want, set) else {want}
        assert got in allowed, (
            f"{table}.{col}: dtype drifted to {got!r} (expected {allowed}) — "
            "audit every query touching this column"
        )

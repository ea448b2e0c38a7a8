"""Guard against driver-comparator hazards in the DuckDB oracle schemas.

The driver canonicalizes both result sets through pandas DataFrames:
DuckDB HUGEINT (the default SUM-over-integers type) lands as float64 and
hashes differently than Spark's BIGINT even for equal values, and
LIST/STRUCT/MAP columns crash pandas' sort (``unhashable type: 'list'``).
Round 3 shipped 13 HUGEINT and 4 array-typed oracles that passed the old
scalar-based local check and failed (or would fail) at the driver —
this test DESCRIBEs every registered oracle and fails on any such output
column, so the class cannot re-enter the registry.
"""

from __future__ import annotations

import os
import re
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

HAZARD = re.compile(r"HUGEINT|\[\]|LIST|STRUCT|MAP\(", re.IGNORECASE)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_no_hazardous_oracle_output_types(oracle_con):
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    assert len(oracles) > 150, "registry unexpectedly small"
    bad: dict[str, list[str]] = {}
    for name, sql in oracles.items():
        rows = oracle_con.execute(f"DESCRIBE {sql}").fetchall()
        hz = [f"{c}:{t}" for c, t, *_ in rows if HAZARD.search(t)]
        if hz:
            bad[name] = hz
    assert not bad, (
        "oracle output columns that break the driver's pandas-based "
        f"comparator (cast SUMs to BIGINT / array_to_string lists): {bad}"
    )

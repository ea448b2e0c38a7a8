"""Lint every DuckDB oracle's output schema for driver-hash hazards.

The driver's comparator canonicalizes through pandas DataFrames, where
DuckDB HUGEINT (the default result type of SUM over integers) and Spark
BIGINT land as different dtypes and hash differently, and LIST/STRUCT
columns crash pandas' sort (`unhashable type: 'list'`).  This tool
DESCRIBEs all registered oracles and reports any output column typed
HUGEINT, UHUGEINT, or any nested LIST/STRUCT/MAP type.

Usage: python tools/lint_oracle_types.py  (exit 1 if any hazard found)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

HAZARD = re.compile(r"HUGEINT|\[\]|LIST|STRUCT|MAP\(", re.IGNORECASE)


def hazards(con: duckdb.DuckDBPyConnection, sql: str) -> list[tuple[str, str]]:
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return [(name, typ) for name, typ, *_ in rows if HAZARD.search(typ)]


def main() -> int:
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    bad = 0
    oracles = entrymod.oracle_sql()
    for name, sql in oracles.items():
        try:
            hz = hazards(con, sql)
        except Exception as e:
            print(f"ERROR {name}: DESCRIBE failed: {e}")
            bad += 1
            continue
        if hz:
            bad += 1
            cols = ", ".join(f"{c}:{t}" for c, t in hz)
            print(f"HAZARD {name}: {cols}")

    print(f"\n{len(oracles)} oracles checked, {bad} with hazards")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

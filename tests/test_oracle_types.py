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


def test_driver_window_composition():
    """Window-slot hygiene (VERDICT r10 item 6): the 50-slot driver window
    is composed of oracle-gated rows ONLY — a rows-only query in the
    window spends a slot that proves nothing beyond rows>0 and is owed to
    the re-verification backlog. Also pins the assembly invariants: every
    DRIVER_PRIORITY name resolves, no duplicates, and the full registry
    (windowed + unwindowed) round-trips through queries()."""
    import __spark_entry__ as entrymod
    from pandas_etl_framework_spark.harness import REGISTRY

    names = entrymod.DRIVER_PRIORITY
    assert len(names) == len(set(names)), "duplicate window slots"
    assert len(names) >= 50, "window must fill all 50 driver slots"
    unknown = [n for n in names if n not in REGISTRY]
    assert not unknown
    rows_only = [n for n in names if REGISTRY[n][1] is None]
    assert not rows_only, f"no-oracle rows in the driver window: {rows_only}"
    qs = entrymod.queries()
    assert list(qs)[: len(names)] == list(names)
    assert set(qs) == set(REGISTRY)


def test_driver_window_rejects_no_oracle_rows(monkeypatch):
    """The keep-out is enforced in code, not by comment: a rotation that
    reintroduces a rows-only row must fail at import/assembly time."""
    import __spark_entry__ as entrymod
    from pandas_etl_framework_spark.harness import REGISTRY

    rows_only = [n for n, (_f, sql) in REGISTRY.items() if sql is None]
    assert rows_only, "expected at least one rows-only registry row"
    monkeypatch.setattr(
        entrymod, "DRIVER_PRIORITY", [rows_only[0]] + list(entrymod.DRIVER_PRIORITY)
    )
    with pytest.raises(ValueError, match="no-oracle"):
        entrymod.queries()

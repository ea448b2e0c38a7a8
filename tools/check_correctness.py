"""Local stand-in for the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark AND its oracle_sql() twin on
DuckDB, compare row count, sorted column names, and an order-insensitive
value hash.

DRIVER-FAITHFUL COMPARE: both sides are fetched as pandas DataFrames
(``DataFrame.toPandas()`` / duckdb ``.df()``) and canonicalized from the
pandas representation, mirroring the driver's comparator.  This is the
path where round-3's two silent bug classes live: DuckDB HUGEINT (the
default SUM-over-integers result type) lands as float64 and hashes
differently than Spark's int64, and LIST/STRUCT columns crash pandas'
sort.  The previous ``fetchall()``-scalar compare degraded HUGEINT to
plain ``int`` and canonicalized lists fine, so all 159 oracles "passed"
locally while 4 failed at the driver (VERDICT r03 §"What's wrong" #3).

Usage: python tools/check_correctness.py [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v) -> str:
    """Canonical string for one pandas cell.

    Deliberately dtype-strict on numerics: an int64 5 renders "5" while a
    float64 5.0 renders "5.0", so a HUGEINT->float64 oracle column fails
    against a Spark BIGINT even when the values are numerically equal —
    exactly the divergence the driver's pandas-based hash sees.
    """
    import datetime
    import decimal
    import math

    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        return repr(f)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        # The driver CRASHES on list-typed columns (pandas sort_values:
        # "unhashable type: 'list'").  Mirror that as a hard failure
        # instead of canonicalizing, so array-typed outputs never look
        # locally green.
        raise TypeError(
            "list-typed result column would crash the driver comparator; "
            "serialize with array_join/array_to_string in the harness "
            "projection"
        )
    return str(v)


def canon_lines(pdf: pd.DataFrame) -> list[str]:
    cols = sorted(pdf.columns)
    rows = (
        "\x01".join(canon_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    return sorted(rows)


def value_hash(lines: list[str]) -> str:
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf8"))
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    import __spark_entry__ as entrymod
    from pandas_etl_framework_spark.session import get_spark

    # accept space- AND comma-separated names, tolerate a `--queries`
    # flag word, and FAIL on unknown names: the old `set(sys.argv[1:])`
    # silently matched nothing when given `--queries a,b` (one comma-
    # joined argv element), so a filtered run could report 'all checks
    # passed' having checked ZERO queries — a vacuous green
    only = {
        n
        for a in sys.argv[1:]
        if a != "--queries"
        for n in a.split(",")
        if n
    }
    # showConsoleProgress is build-time-static; off so the progress bar's
    # \r-terminated stage lines can't interleave with the OK/FAIL records
    # and silently drop rows from anchored greps over captured output
    spark = get_spark(
        app_name="check",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"UNKNOWN QUERY NAMES (nothing checked): {sorted(unknown)}")
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(spdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            # Arrow, not .df(): .df() promotes DATE to midnight Timestamps
            # (false mismatch vs Spark's datetime.date) while Arrow keeps
            # dates as date objects, HUGEINT as Decimal (still != int64),
            # and LIST as ndarray (still crashes canon) — the
            # driver-observed behavior on all three.
            opdf = con.execute(oracles[name]).arrow().to_pandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = []
        if sorted(spdf.columns) != sorted(opdf.columns):
            problems.append(
                f"columns spark={sorted(spdf.columns)} "
                f"oracle={sorted(opdf.columns)}"
            )
        if len(spdf) != len(opdf):
            problems.append(f"rowcount spark={len(spdf)} oracle={len(opdf)}")
        if not problems:
            try:
                ls = canon_lines(spdf)
            except TypeError as e:
                problems.append(f"spark result: {e}")
                ls = None
            try:
                lo = canon_lines(opdf)
            except TypeError as e:
                problems.append(f"oracle result: {e}")
                lo = None
            if ls is not None and lo is not None and value_hash(ls) != value_hash(lo):
                problems.append("value-hash mismatch")
                for a, b in zip(ls, lo):
                    if a != b:
                        print(f"  spark : {a[:300]}")
                        print(f"  oracle: {b[:300]}")
                        break
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"OK   {name}: {len(spdf)} rows ({time.time()-t0:.1f}s)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

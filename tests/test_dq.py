"""Data-quality constraint engine tests: quarantine routing completeness,
violation reasons, FK orphan detection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandas_etl_framework_spark.dq import check, fk_orphans, summary


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "ok"),
            (2, -5.0, "ok"),       # fails positive
            (3, 10.0, None),       # fails status_known (NULL -> violation)
            (4, -1.0, "weird"),    # fails both
        ],
        "id long, amount double, status string",
    )


def _rules():
    return {
        "amount_positive": F.col("amount") > 0,
        "status_known": F.col("status").isin("ok", "closed"),
    }


def test_check_partitions_rows_completely(spark, frame):
    good, bad = check(frame, _rules())
    assert {r["id"] for r in good.collect()} == {1}
    bad_rows = {r["id"]: set(r["dq_violations"]) for r in bad.collect()}
    assert bad_rows == {
        2: {"amount_positive"},
        3: {"status_known"},
        4: {"amount_positive", "status_known"},
    }
    # no row lost, no row duplicated
    assert good.count() + bad.count() == frame.count()
    # good keeps the original schema
    assert good.columns == frame.columns


def test_check_rejects_empty_rules(spark, frame):
    with pytest.raises(ValueError):
        check(frame, {})


def test_summary_counts_match_check(spark, frame):
    rows = {r["rule"]: r for r in summary(frame, _rules()).collect()}
    assert rows["amount_positive"]["n_violations"] == 2
    assert rows["status_known"]["n_violations"] == 2
    assert all(r["n_rows"] == 4 for r in rows.values())


def test_fk_orphans(spark):
    child = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 999)], "id long, pid long"
    )
    parent = spark.createDataFrame([(100,), (200,)], "pid long")
    orphans = fk_orphans(child, parent, "pid", "pid").collect()
    assert [r["id"] for r in orphans] == [3]

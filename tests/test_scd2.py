"""SCD2 merge tests: Scenario D + invariants (FIXTURES.md §3, SURVEY.md §5.3)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from pandas_etl_framework_spark import (
    KEY_HASH,
    RECORD_HASH,
    SCD2_LOWER_BOUND,
    SCD2_UPPER_BOUND,
    UPDATE_RUN_ID,
    VALID_FROM,
    VALID_FROM_MODE_CUSTOM,
    VALID_FROM_MODE_LOAD_DATE,
    VALID_FROM_MODE_LOWER_BOUND,
    VALID_TO,
    add_meta_columns,
    create_currents,
    get_valid_from_date,
    historize_dataset,
    merge_scd2,
    split_merged_dataset,
)
from tests.conftest import KEY_COLUMNS, RUN1_TS, RUN2_TS

UPPER = datetime.date(9999, 12, 31)


def stamped(df, ts):
    return add_meta_columns(df, create_currents(ts), KEY_COLUMNS)


def two_run_scd2(grades_run1, grades_run2_full):
    c1 = create_currents(RUN1_TS)
    c2 = create_currents(RUN2_TS)
    store = historize_dataset(
        stamped(grades_run1, RUN1_TS), None, c1, VALID_FROM_MODE_LOWER_BOUND
    )
    return merge_scd2(
        store, stamped(grades_run2_full, RUN2_TS), c2, VALID_FROM_MODE_LOAD_DATE
    )


def test_get_valid_from_date_modes():
    assert get_valid_from_date(VALID_FROM_MODE_LOWER_BOUND) == SCD2_LOWER_BOUND
    c = create_currents(RUN2_TS)
    assert get_valid_from_date(VALID_FROM_MODE_LOAD_DATE, currents=c) == "2024-01-11"
    assert (
        get_valid_from_date(VALID_FROM_MODE_CUSTOM, valid_from_date="2020-02-02")
        == "2020-02-02"
    )
    with pytest.raises(ValueError):
        get_valid_from_date(VALID_FROM_MODE_LOAD_DATE)
    with pytest.raises(ValueError):
        get_valid_from_date(VALID_FROM_MODE_CUSTOM)
    with pytest.raises(ValueError):
        get_valid_from_date(99)


def test_bootstrap_all_open(grades_run1):
    c1 = create_currents(RUN1_TS)
    store = historize_dataset(
        stamped(grades_run1, RUN1_TS), None, c1, VALID_FROM_MODE_LOWER_BOUND
    )
    rows = store.collect()
    assert len(rows) == 14
    assert all(r[VALID_TO] == UPPER for r in rows)
    assert all(str(r[VALID_FROM]) == SCD2_LOWER_BOUND for r in rows)


def test_scenario_d_invariants(grades_run1, grades_run2_full):
    merged = two_run_scd2(grades_run1, grades_run2_full)
    rows = merged.collect()
    assert len(rows) == 17  # 13 unchanged + 2 new + closed Franklin + new Franklin

    # invariant: exactly one open row per key
    open_per_key = (
        merged.filter(F.col(VALID_TO) == F.lit(UPPER))
        .groupBy(KEY_HASH)
        .count()
        .filter("count != 1")
    )
    assert open_per_key.count() == 0

    franklin = sorted(
        [r for r in rows if r["Lastname"] == "Franklin"], key=lambda r: r["Test1"]
    )
    assert len(franklin) == 2
    old, new = franklin
    # closed row: VALID_TO = run_day - 1, UPDATE stamped with run 2
    assert str(old[VALID_TO]) == "2024-01-10"
    assert old[UPDATE_RUN_ID] == "20240111080000"
    # new row: VALID_FROM = run day, open
    assert str(new[VALID_FROM]) == "2024-01-11"
    assert new[VALID_TO] == UPPER

    # invariant: closed VALID_TO == successor VALID_FROM - 1 day
    assert (new[VALID_FROM] - old[VALID_TO]).days == 1


def test_scd2_unchanged_rows_keep_original_validity(grades_run1, grades_run2_full):
    merged = two_run_scd2(grades_run1, grades_run2_full)
    alfalfa = merged.filter(F.col("Lastname") == "Alfalfa").collect()
    assert len(alfalfa) == 1
    assert str(alfalfa[0][VALID_FROM]) == SCD2_LOWER_BOUND


def test_scd2_idempotent_replay(grades_run1):
    c1 = create_currents(RUN1_TS)
    c2 = create_currents(RUN2_TS)
    store = historize_dataset(
        stamped(grades_run1, RUN1_TS), None, c1, VALID_FROM_MODE_LOWER_BOUND
    )
    merged = merge_scd2(
        store, stamped(grades_run1, RUN2_TS), c2, VALID_FROM_MODE_LOAD_DATE
    )
    assert merged.count() == 14
    assert merged.filter(F.col(VALID_TO) == F.lit(UPPER)).count() == 14


def test_scd2_closed_only_key_not_reinserted(spark, grades_run1):
    """Reference NOT-IN parity: a key existing only as closed rows is not
    re-inserted (SCDHelpers.py:154-156 spans all of current)."""
    c1 = create_currents(RUN1_TS)
    store = historize_dataset(
        stamped(grades_run1, RUN1_TS), None, c1, VALID_FROM_MODE_LOWER_BOUND
    )
    # artificially close Noshow's row
    store = store.withColumn(
        VALID_TO,
        F.when(
            F.col("Lastname") == "Noshow", F.to_date(F.lit("2024-01-05"))
        ).otherwise(F.col(VALID_TO)),
    )
    new = stamped(
        spark.createDataFrame(
            [("Noshow", "Cecil", "345-67-8901", 99.0, 11.0, -1.0, 4.0, 43.0, "A")],
            grades_run1.schema,
        ),
        RUN2_TS,
    )
    merged = merge_scd2(store, new, create_currents(RUN2_TS), VALID_FROM_MODE_LOAD_DATE)
    noshow = merged.filter(F.col("Lastname") == "Noshow").collect()
    assert len(noshow) == 1  # only the closed row survives; new row dropped
    assert str(noshow[0][VALID_TO]) == "2024-01-05"


def test_split_merged_dataset(grades_run1, grades_run2_full):
    merged = two_run_scd2(grades_run1, grades_run2_full)
    hist, active = split_merged_dataset(merged)
    assert hist.count() == 1  # closed Franklin
    assert active.count() == 16


def test_pit_join_selects_at_most_one_version_per_probe(spark):
    """Validity intervals partition time, so the point-in-time join must
    never fan a fact row out to two versions; probes before a key's first
    version must drop."""
    from pandas_etl_framework_spark.harness import q_scd2_pit_join

    out = q_scd2_pit_join(spark, "/root/testdata/sf0.001")
    from pyspark.sql import functions as F

    dup = (
        out.groupBy("o_orderkey", "probe_date")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0
    rows = out.count()
    n_orders = spark.read.parquet(
        "/root/testdata/sf0.001/orders.parquet"
    ).count()
    assert 0 < rows < n_orders  # some probes predate their key's history

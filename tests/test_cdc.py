"""CDC operator + LIVE-pipeline scenario tests (FIXTURES.md §3 A/B/C)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_etl_framework_spark import (
    KEY_HASH,
    RECORD_HASH,
    add_meta_columns,
    create_currents,
    get_delta,
    get_deleted_by_full_load,
    get_deletes_by_column,
    get_inserts,
    get_updates,
    merge_cdc,
    simulate_runs,
)
from tests.conftest import KEY_COLUMNS, RUN1_TS, RUN2_TS


def stamped(df, ts):
    return add_meta_columns(df, create_currents(ts), KEY_COLUMNS)


def test_get_delta_new_and_changed(grades_run1, grades_run2_full):
    cur = stamped(grades_run1, RUN1_TS)
    new = stamped(grades_run2_full, RUN2_TS)
    delta = get_delta(cur, new)
    names = {r["Lastname"] for r in delta.collect()}
    assert names == {"George", "Heffalump", "Franklin"}


def test_get_inserts_only_new_keys(grades_run1, grades_run2_full):
    cur = stamped(grades_run1, RUN1_TS)
    new = stamped(grades_run2_full, RUN2_TS)
    inserts = get_inserts(cur, new)
    assert {r["Lastname"] for r in inserts.collect()} == {"George", "Heffalump"}


def test_get_updates_only_changed(grades_run1, grades_run2_full):
    cur = stamped(grades_run1, RUN1_TS)
    new = stamped(grades_run2_full, RUN2_TS)
    updates = get_updates(cur, new)
    rows = updates.collect()
    assert len(rows) == 1
    assert rows[0]["Lastname"] == "Franklin"
    assert rows[0]["Test1"] == 60.0


def test_get_delta_empty_current(spark, grades_run1):
    cur = stamped(grades_run1, RUN1_TS).limit(0)
    new = stamped(grades_run1, RUN1_TS)
    assert get_delta(cur, new).count() == 14


def test_get_delta_idempotent_rerun(grades_run1):
    cur = stamped(grades_run1, RUN1_TS)
    new = stamped(grades_run1, RUN2_TS)  # same content, later run
    assert get_delta(cur, new).count() == 0


def test_merge_cdc_upsert(grades_run1, grades_run2_full):
    cur = stamped(grades_run1, RUN1_TS)
    new = stamped(grades_run2_full, RUN2_TS)
    merged = merge_cdc(cur, new, [KEY_HASH])
    assert merged.count() == 16  # 14 keys + 2 inserts, updates replaced
    franklin = merged.filter(F.col("Lastname") == "Franklin").collect()
    assert len(franklin) == 1
    assert franklin[0]["Test1"] == 60.0  # new version won


def test_merge_cdc_with_deletes(grades_run1, grades_run2_full):
    cur = stamped(grades_run1, RUN1_TS)
    new = stamped(grades_run2_full, RUN2_TS).filter(
        F.col("Lastname").isin("George", "Heffalump")
    )
    deleted = cur.filter(F.col("Lastname") == "Rubble").select(KEY_HASH)
    merged = merge_cdc(cur, new, [KEY_HASH], deleted_df=deleted)
    assert merged.count() == 15  # 14 - 1 deleted + 2 inserts
    assert merged.filter(F.col("Lastname") == "Rubble").count() == 0


def test_get_deleted_by_full_load(grades_run1, grades_run2_full):
    cur = stamped(grades_run1, RUN1_TS)
    # run2 full load without Rubble → Rubble detected as deleted
    new = stamped(
        grades_run2_full.filter(F.col("Lastname") != "Rubble"), RUN2_TS
    )
    gone = get_deleted_by_full_load(cur, new)
    rubble_hash = cur.filter(F.col("Lastname") == "Rubble").select(KEY_HASH).first()[0]
    assert [r[0] for r in gone.collect()] == [rubble_hash]


def test_get_deletes_by_column(grades_run1):
    cur = stamped(grades_run1, RUN1_TS)
    flagged = cur.withColumn(
        "is_deleted", F.when(F.col("Lastname") == "Noshow", "Y").otherwise("N")
    )
    out = get_deletes_by_column(flagged, "is_deleted", "Y")
    assert out.count() == 1


def test_scenario_a_delta_loads(spark, grades_run1, grades_run2_delta, tmp_path):
    """Scenario A: 14 rows + (2 inserts + 1 changed version) = 17;
    old Franklin version retained (append-only semantics, SURVEY.md §2.7)."""
    store = str(tmp_path / "store")
    final = simulate_runs(
        spark,
        {"r1": grades_run1, "r2": grades_run2_delta},
        store,
        KEY_COLUMNS,
        load_ts_by_run={"r1": RUN1_TS, "r2": RUN2_TS},
    )
    assert final.count() == 17
    franklin = final.filter(F.col("Lastname") == "Franklin")
    assert franklin.count() == 2
    assert {r["Test1"] for r in franklin.collect()} == {50.0, 60.0}


def test_scenario_b_full_loads(spark, grades_run1, grades_run2_full, tmp_path):
    """Scenario B: unchanged rows dedup by (KEY_HASH, RECORD_HASH) → 17 rows."""
    store = str(tmp_path / "store")
    final = simulate_runs(
        spark,
        {"r1": grades_run1, "r2": grades_run2_full},
        store,
        KEY_COLUMNS,
        load_ts_by_run={"r1": RUN1_TS, "r2": RUN2_TS},
    )
    assert final.count() == 17
    # distinct (KEY_HASH, RECORD_HASH) pairs == row count (no dup versions)
    assert final.select(KEY_HASH, RECORD_HASH).distinct().count() == 17


def test_scenario_c_idempotent_replay(spark, grades_run1, tmp_path):
    store = str(tmp_path / "store")
    final = simulate_runs(
        spark,
        {"r1": grades_run1, "r2": grades_run1},
        store,
        KEY_COLUMNS,
        load_ts_by_run={"r1": RUN1_TS, "r2": RUN2_TS},
    )
    assert final.count() == 14

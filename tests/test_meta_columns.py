"""Hash-parity and meta-column stamping tests (SURVEY.md §5 plan items 1-2)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from pandas_etl_framework_spark import (
    DELETED,
    INSERT_RUN_ID,
    INSERT_TS,
    KEY_HASH,
    RECORD_HASH,
    UPDATE_RUN_ID,
    UPDATE_TS,
    add_hash_column,
    add_key_hash,
    add_meta_columns,
    add_record_hash,
    create_currents,
    record_hash_columns,
)
from tests.conftest import KEY_COLUMNS, RUN1_TS


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf8")).hexdigest()


def test_key_hash_golden_vector(grades_run1):
    """KEY_HASH must equal md5('Alfalfa#?Aloysius') — pandas-parity preimage
    (FIXTURES.md §4)."""
    df = add_key_hash(grades_run1, KEY_COLUMNS)
    row = df.filter(F.col("Lastname") == "Alfalfa").select(KEY_HASH).first()
    assert row[0] == md5_hex("Alfalfa#?Aloysius")


def test_record_hash_matches_python_md5(grades_run1):
    df = add_record_hash(add_key_hash(grades_run1, KEY_COLUMNS))
    got = df.filter(F.col("Lastname") == "Alfalfa").first()
    # pandas str() of a float 40.0 is '40.0' — Spark double→string matches
    preimage = "#?".join(
        ["Alfalfa", "Aloysius", "123-45-6789", "40.0", "90.0", "80.0", "70.0", "60.0", "D-"]
    )
    assert got[RECORD_HASH] == md5_hex(preimage)


def test_record_hash_excludes_meta_and_explicit_columns(grades_run1):
    df = add_key_hash(grades_run1, KEY_COLUMNS)
    cols = record_hash_columns(df, exclude_columns=["SSN"])
    assert KEY_HASH not in cols
    assert "SSN" not in cols
    assert "Lastname" in cols


def test_null_values_hash_as_nan_token(spark):
    """NULLs must hash as the literal 'nan' (pandas astype(str) parity), not
    be dropped from the preimage (concat_ws default)."""
    df = spark.createDataFrame(
        [("a", None), (None, None)], "c1 string, c2 string"
    )
    out = add_hash_column(df, ["c1", "c2"], "H").collect()
    by_c1 = {r["c1"]: r["H"] for r in out}
    assert by_c1["a"] == md5_hex("a#?nan")
    assert by_c1[None] == md5_hex("nan#?nan")


def test_add_meta_columns_stamps_all(grades_run1):
    currents = create_currents(RUN1_TS)
    df = add_meta_columns(grades_run1, currents, KEY_COLUMNS)
    for col in (KEY_HASH, RECORD_HASH, INSERT_TS, UPDATE_TS, INSERT_RUN_ID, UPDATE_RUN_ID, DELETED):
        assert col in df.columns
    row = df.first()
    assert row[INSERT_RUN_ID] == "20240110080000"
    assert row[UPDATE_RUN_ID] == row[INSERT_RUN_ID]
    assert str(row[INSERT_TS]) == "2024-01-10 08:00:00"
    assert row[DELETED] is None


def test_create_currents_formats():
    c = create_currents("2024-03-05 13:14:15")
    assert c["CURRENT_RUN_ID"] == "20240305131415"
    assert c["CURRENT_RUN_DAY"] == "2024-03-05"
    assert c["CURRENT_RUN_TS"] == "2024-03-05 13:14:15"


def test_timestamp_column_hash_is_format_stable(spark):
    df = spark.createDataFrame(
        [("k", "2021-06-01 10:20:30")], "k string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = add_hash_column(df, ["k", "ts"], "H").first()
    assert out["H"] == md5_hex("k#?2021-06-01 10:20:30")


def test_source_file_literal_and_record_hash_invariance(grades_run1):
    """source_file=<str> stamps the literal; SOURCE_FILE_NAME is a meta
    column, so two stamps of the same data from different "files" must
    produce identical RECORD_HASHes (re-loading identical data from a
    renamed file stays a no-op delta)."""
    from pandas_etl_framework_spark import SOURCE_FILE_NAME

    currents = create_currents(RUN1_TS)
    a = add_meta_columns(grades_run1, currents, KEY_COLUMNS, source_file="load_a.csv")
    b = add_meta_columns(grades_run1, currents, KEY_COLUMNS, source_file="load_b.csv")
    assert a.first()[SOURCE_FILE_NAME] == "load_a.csv"
    assert b.first()[SOURCE_FILE_NAME] == "load_b.csv"
    ha = {r[KEY_HASH]: r[RECORD_HASH] for r in a.collect()}
    hb = {r[KEY_HASH]: r[RECORD_HASH] for r in b.collect()}
    assert ha == hb


def test_source_file_default_absent_and_scan_provenance(spark, tmp_path):
    """Default keeps the column absent (store compat with pre-r07 data);
    source_file=True on a file-scanned frame records the real path."""
    from pandas_etl_framework_spark import SOURCE_FILE_NAME

    currents = create_currents(RUN1_TS)
    df = spark.createDataFrame([(1, "x")], "k int, v string")
    assert SOURCE_FILE_NAME not in add_meta_columns(df, currents, ["k"]).columns

    p = str(tmp_path / "prov.parquet")
    df.write.parquet(p)
    scanned = spark.read.parquet(p)
    out = add_meta_columns(scanned, currents, ["k"], source_file=True)
    fname = out.first()[SOURCE_FILE_NAME]
    assert "prov.parquet" in fname and fname.endswith(".parquet")

"""prepare_schema / IO helper tests (SURVEY.md §2.1-2.2)."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from pandas_etl_framework_spark import (
    KEY_HASH,
    RECORD_HASH,
    add_meta_columns,
    create_currents,
    create_dataframe_with_schema,
    create_empty_hist_dataframe,
    prepare_schema,
    read_current_hashes,
    read_parquet_df,
    write_store,
)
from tests.conftest import KEY_COLUMNS, RUN1_TS


def test_prepare_schema_adds_missing_with_defaults(spark):
    df = spark.createDataFrame([("a", 1)], "c1 string, c2 int")
    target = T.StructType(
        [
            T.StructField("c1", T.StringType()),
            T.StructField("c2", T.IntegerType()),
            T.StructField("c3", T.DoubleType()),
            T.StructField("c4", T.StringType()),
        ]
    )
    out = prepare_schema(df, target, default_values={"c3": 1.5})
    row = out.first()
    assert row["c3"] == 1.5
    assert row["c4"] is None
    assert dict(out.dtypes)["c3"] == "double"


def test_prepare_schema_removes_extras(spark):
    df = spark.createDataFrame([("a", 1, "x")], "c1 string, c2 int, extra string")
    target = T.StructType(
        [T.StructField("c1", T.StringType()), T.StructField("c2", T.IntegerType())]
    )
    out = prepare_schema(df, target, remove_columns=True)
    assert out.columns == ["c1", "c2"]


def test_create_dataframe_with_schema(spark):
    schema = T.StructType([T.StructField("x", T.LongType())])
    df = create_dataframe_with_schema(spark, schema)
    assert df.count() == 0
    assert df.schema == schema


def test_create_empty_hist_dataframe(spark):
    df = spark.createDataFrame([("a",)], "c1 string")
    out = create_empty_hist_dataframe(df)
    assert out.count() == 0
    assert out.columns == ["c1", "VALID_FROM", "VALID_TO"]
    assert dict(out.dtypes)["VALID_TO"] == "date"


def test_read_parquet_df_missing_path_returns_none(spark, tmp_path):
    assert read_parquet_df(spark, str(tmp_path / "nope")) is None


def test_write_and_read_current_hashes(spark, grades_run1, tmp_path):
    path = str(tmp_path / "store")
    stamped = add_meta_columns(grades_run1, create_currents(RUN1_TS), KEY_COLUMNS)
    write_store(stamped, path)
    hashes = read_current_hashes(spark, path)
    assert hashes.columns == [KEY_HASH, RECORD_HASH]
    assert hashes.count() == 14
    # column-pruned scan: only the two hash columns reach the reader
    plan = hashes._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" not in plan or "KEY_HASH" in plan


def test_write_store_partitions_by_run_id(spark, grades_run1, tmp_path):
    import os

    path = str(tmp_path / "store")
    stamped = add_meta_columns(grades_run1, create_currents(RUN1_TS), KEY_COLUMNS)
    write_store(stamped, path)
    assert any(
        d.startswith("INSERT_RUN_ID=") for d in os.listdir(path) if not d.startswith("_")
    )

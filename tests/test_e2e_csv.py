"""End-to-end port of the reference's executable scenario (main.py:36-55):
CSV load files on disk → read_csv → simulate_runs → partitioned store,
plus delete_store reset and the streaming SCD2 wrapper."""

from __future__ import annotations

import csv

import pytest
from pyspark.sql import functions as F

from pandas_etl_framework_spark import (
    delete_store,
    read_csv,
    read_parquet_df,
    simulate_runs,
)
from pandas_etl_framework_spark.streaming import streaming_scd2_merge
from tests.conftest import (
    BASE_ROWS,
    CHANGED_FRANKLIN,
    GRADES_SCHEMA,
    KEY_COLUMNS,
    NEW_KEY_ROWS,
    RUN1_TS,
    RUN2_TS,
    UNCHANGED_BASE,
)

HEADER = [f.name for f in GRADES_SCHEMA.fields]


def write_csv(path, rows):
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(HEADER)
        w.writerows(rows)


@pytest.fixture()
def csv_files(tmp_path):
    p1 = tmp_path / "grades_delta_old.csv"
    p2 = tmp_path / "grades_delta_new.csv"
    write_csv(p1, BASE_ROWS)
    write_csv(p2, NEW_KEY_ROWS + [CHANGED_FRANKLIN])
    return str(p1), str(p2)


def test_csv_source_with_explicit_schema(spark, csv_files):
    p1, _ = csv_files
    df = read_csv(spark, p1, schema=GRADES_SCHEMA)
    assert df.count() == 14
    assert dict(df.dtypes)["Test1"] == "double"
    assert df.filter(F.col("Lastname") == "Alfalfa").first()["Test1"] == 40.0


def test_csv_source_infers_schema(spark, csv_files):
    p1, _ = csv_files
    df = read_csv(spark, p1)
    assert df.count() == 14
    assert dict(df.dtypes)["Test1"] == "double"


def test_reference_scenario_a_from_csv_files(spark, csv_files, tmp_path):
    """The reference's Scenario A end-to-end, from real CSV files on disk."""
    p1, p2 = csv_files
    store = str(tmp_path / "current")
    final = simulate_runs(
        spark,
        {
            "first_run": read_csv(spark, p1, schema=GRADES_SCHEMA),
            "second_run": read_csv(spark, p2, schema=GRADES_SCHEMA),
        },
        store,
        KEY_COLUMNS,
        load_ts_by_run={"first_run": RUN1_TS, "second_run": RUN2_TS},
    )
    assert final.count() == 17
    franklin = final.filter(F.col("Lastname") == "Franklin")
    assert {r["Test1"] for r in franklin.collect()} == {50.0, 60.0}


def test_delete_store_reset(spark, csv_files, tmp_path):
    p1, _ = csv_files
    store = str(tmp_path / "current")
    simulate_runs(
        spark,
        {"r1": read_csv(spark, p1, schema=GRADES_SCHEMA)},
        store,
        KEY_COLUMNS,
        load_ts_by_run={"r1": RUN1_TS},
    )
    assert read_parquet_df(spark, store) is not None
    assert delete_store(spark, store) is True
    assert read_parquet_df(spark, store) is None
    assert delete_store(spark, store) is False  # already gone


def test_streaming_scd2_merge(spark, tmp_path):
    """Two micro-batches through the streaming SCD2 store: open/closed
    invariants hold at the stream boundary."""
    import time

    src = tmp_path / "in"
    src.mkdir()
    spark.createDataFrame(BASE_ROWS, GRADES_SCHEMA).coalesce(1).write.parquet(
        str(src / "b1")
    )
    stream = spark.readStream.schema(GRADES_SCHEMA).parquet(f"{src}/*")
    q = streaming_scd2_merge(
        spark,
        stream,
        str(tmp_path / "scd2"),
        str(tmp_path / "ckpt"),
        key_columns=KEY_COLUMNS,
    )
    q.processAllAvailable()
    time.sleep(1.1)
    spark.createDataFrame(
        UNCHANGED_BASE + NEW_KEY_ROWS + [CHANGED_FRANKLIN], GRADES_SCHEMA
    ).coalesce(1).write.parquet(str(src / "b2"))
    q.processAllAvailable()
    q.stop()

    from pandas_etl_framework_spark.scd2_store import Scd2Store

    store = Scd2Store(spark, str(tmp_path / "scd2"))
    active = store.read_active()
    assert active.count() == 16
    assert active.groupBy("KEY_HASH").count().filter("count > 1").count() == 0
    assert store.read().count() == 17  # + closed old Franklin

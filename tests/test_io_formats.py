"""Format-breadth IO tests (read_table/write_table) + deterministic dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandas_etl_framework_spark.io import read_table, write_table
from pandas_etl_framework_spark.llmops.dedup import deduplicate


@pytest.fixture()
def sample(spark):
    return spark.read.parquet("/root/testdata/sf0.001/region.parquet")


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip_formats(spark, sample, tmp_path, fmt):
    path = str(tmp_path / f"t_{fmt}")
    opts = {"header": "true"} if fmt == "csv" else {}
    write_table(sample, path, fmt=fmt, **opts)
    back = read_table(spark, path, fmt=fmt, schema=sample.schema, **opts)
    assert back.count() == sample.count()
    assert {r["r_name"] for r in back.collect()} == {
        r["r_name"] for r in sample.collect()
    }


def test_write_table_partitioned(spark, tmp_path):
    import os

    df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    path = str(tmp_path / "part")
    write_table(df, path, partition_by=["n_regionkey"])
    assert any(d.startswith("n_regionkey=") for d in os.listdir(path))
    assert read_table(spark, path).count() == 25


def test_deduplicate_keeps_deterministic_row(spark):
    rows = [
        (1, "same content", "2024-01-01"),
        (2, "same content", "2024-01-02"),
        (3, "other", "2024-01-03"),
    ]
    df = spark.createDataFrame(rows, "id long, text string, dt string")
    first = deduplicate(df, ["text"], "id", keep="first")
    assert {r["id"] for r in first.collect()} == {1, 3}
    last = deduplicate(df, ["text"], "id", keep="last")
    assert {r["id"] for r in last.collect()} == {2, 3}


def test_deduplicate_multi_column_content(spark):
    rows = [(1, "a", "x"), (2, "a", "x"), (3, "a", "y")]
    df = spark.createDataFrame(rows, "id long, c1 string, c2 string")
    out = deduplicate(df, ["c1", "c2"], "id")
    assert {r["id"] for r in out.collect()} == {1, 3}

"""Format-breadth IO tests (read_table/write_table) + deterministic dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandas_etl_framework_spark.io import read_table, write_table
from pandas_etl_framework_spark.llmops.dedup import deduplicate


@pytest.fixture()
def sample(spark):
    return spark.read.parquet("/root/testdata/sf0.001/region.parquet")


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv", "xml"])
def test_roundtrip_formats(spark, sample, tmp_path, fmt):
    path = str(tmp_path / f"t_{fmt}")
    opts = {"header": "true"} if fmt == "csv" else {}
    if fmt == "xml":
        opts = {"rootTag": "regions", "rowTag": "region"}
        # default read TRIMS element text — pin it off for faithfulness
        ropts = {"rowTag": "region", "ignoreSurroundingSpaces": "false"}
    else:
        ropts = opts
    write_table(sample, path, fmt=fmt, **opts)
    back = read_table(spark, path, fmt=fmt, schema=sample.schema, **ropts)
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


def test_io_lifecycle_queries(spark):
    """The oracle-gated IO round-trip rows also run under pytest: the CSV
    round-trip preserves rows exactly, the partitioned sink's read-back
    aggregation matches a direct aggregation, the reset probe reports the
    full lifecycle, and simulate_runs through the disk store equals the
    functional two-run historization."""
    from pandas_etl_framework_spark.harness import q_cdc_historize_two_runs
    from pandas_etl_framework_spark.io_queries import (
        q_cdc_simulate_runs,
        q_io_csv_roundtrip,
        q_io_partitioned_sink,
        q_io_store_reset,
    )

    sf = "/root/testdata/sf0.001"

    src = spark.read.parquet(f"{sf}/region.parquet")
    rt = q_io_csv_roundtrip(spark, sf)
    assert sorted(map(tuple, rt.collect())) == sorted(map(tuple, src.collect()))

    direct = {
        r["o_orderstatus"]: r["n"]
        for r in spark.read.parquet(f"{sf}/orders.parquet")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    sink = {r["o_orderstatus"]: r["n"] for r in q_io_partitioned_sink(spark, sf).collect()}
    assert sink == direct

    probe = q_io_store_reset(spark, sf).collect()[0]
    assert probe["n_before"] == src.count()
    assert probe["deleted"] and probe["reader_returned_none"]
    assert probe["n_bootstrap"] == 0

    via_store = q_cdc_simulate_runs(spark, sf)
    functional = q_cdc_historize_two_runs(spark, sf).select(*via_store.columns)
    assert via_store.exceptAll(functional).count() == 0
    assert functional.exceptAll(via_store).count() == 0


def test_binary_source_roundtrips_bytes_exactly(spark):
    """io_binary_source: the binaryFile read must surface the exact bytes
    written (magic header intact, length = 5 + utf8 text length) for
    every fixture doc."""
    import hashlib

    from pandas_etl_framework_spark.io_queries import (
        _BIN_DOCS,
        _BIN_MAGIC,
        q_io_binary_source,
    )

    sf = "/root/testdata/sf0.001"
    out = {r["fname"]: r for r in q_io_binary_source(spark, sf).collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .filter(f"doc_id < {_BIN_DOCS}")
        .collect()
    }
    assert len(out) == _BIN_DOCS == len(docs)
    for doc_id, text in docs.items():
        row = out[f"blob_{doc_id}.bin"]
        blob = bytes.fromhex(_BIN_MAGIC) + text.encode("utf-8")
        assert row["n_bytes"] == len(blob)
        expect = hashlib.md5(blob.hex().upper().encode()).hexdigest()
        assert row["content_md5"] == expect, doc_id


def test_schema_evolution_merges_epochs_with_nulls(spark):
    from pandas_etl_framework_spark.io_queries import q_io_schema_evolution

    out = q_io_schema_evolution(spark, "/root/testdata/sf0.001")
    assert dict(out.dtypes)["epoch"] == "int"
    e1 = out.filter("epoch = 1")
    e2 = out.filter("epoch = 2")
    # epoch-1 shards predate the column: all NULL; epoch-2 all populated
    assert e1.filter("o_orderstatus IS NOT NULL").count() == 0
    assert e2.filter("o_orderstatus IS NULL").count() == 0
    assert e1.count() > 0 and e2.count() > 0


def test_corrupt_records_quarantine_not_field_nullness(spark):
    """PERMISSIVE JSON read: every injected bad line lands in the corrupt
    column; the partially-coercible line keeps its coercible field, so
    quarantine routing MUST key on the corrupt column."""
    from pandas_etl_framework_spark.io_queries import (
        _BAD_LINES,
        q_io_corrupt_records,
    )

    out = q_io_corrupt_records(spark, "/root/testdata/sf0.001")
    bad = {r["corrupt"]: r for r in out.filter("corrupt IS NOT NULL").collect()}
    assert set(bad) == set(_BAD_LINES)
    partial = bad['{"r_regionkey": "oops", "r_name": 7}']
    assert partial["r_regionkey"] is None and partial["r_name"] == "7"
    # clean rows parse fully and carry no corrupt payload
    clean = out.filter("corrupt IS NULL")
    assert clean.filter("r_regionkey IS NULL").count() == 0
    assert clean.count() == out.count() - len(_BAD_LINES)

"""VersionedStore: atomic visibility, append-without-rewrite, time travel,
vacuum safety."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pandas_etl_framework_spark.versioned_store import VersionedStore


@pytest.fixture()
def store(spark, tmp_path):
    return VersionedStore(spark, str(tmp_path / "vstore"))


def test_empty_store_reads_none(store):
    assert store.read() is None
    assert store.latest_version() is None


def test_append_and_overwrite_versions(spark, store):
    v0 = store.write(spark.range(10), mode="append")
    v1 = store.write(spark.range(10, 15), mode="append")
    assert (v0, v1) == (0, 1)
    assert store.read().count() == 15
    v2 = store.write(spark.range(100, 103), mode="overwrite")
    assert v2 == 2
    assert store.read().count() == 3
    assert {r["id"] for r in store.read().collect()} == {100, 101, 102}


def test_time_travel(spark, store):
    store.write(spark.range(10), mode="append")
    store.write(spark.range(10, 15), mode="append")
    store.write(spark.range(100, 103), mode="overwrite")
    assert store.read(version=0).count() == 10
    assert store.read(version=1).count() == 15
    assert store.read(version=2).count() == 3


def test_uncommitted_data_is_invisible(spark, store):
    """A data directory without a manifest (simulated crash between data
    write and commit) must not appear to readers."""
    store.write(spark.range(10), mode="append")
    orphan = os.path.join(store.path, "data", "v9999999999")
    spark.range(1000, 1500).write.parquet(orphan)
    assert store.read().count() == 10  # orphan invisible
    assert store.latest_version() == 0


def test_append_does_not_rewrite_existing_files(spark, store):
    store.write(spark.range(10), mode="append")
    v0_dir = os.path.join(store.path, "data", f"v{0:010d}")
    before = {f: os.path.getmtime(f"{v0_dir}/{f}") for f in os.listdir(v0_dir)}
    store.write(spark.range(10, 20), mode="append")
    after = {f: os.path.getmtime(f"{v0_dir}/{f}") for f in os.listdir(v0_dir)}
    assert before == after


def test_vacuum_keeps_latest_and_shared_dirs(spark, store):
    store.write(spark.range(10), mode="append")        # v0
    store.write(spark.range(10, 15), mode="append")    # v1 references v0's dir
    store.write(spark.range(50, 52), mode="overwrite")  # v2
    removed = store.vacuum(keep_latest=2)
    assert removed == [0]
    # v1 still readable: its referenced v0 data dir survived (shared)
    assert store.read(version=1).count() == 15
    assert store.read().count() == 2
    removed = store.vacuum(keep_latest=1)
    assert removed == [1]
    assert store.read().count() == 2
    # v0/v1 data dirs now gone
    assert not os.path.isdir(os.path.join(store.path, "data", f"v{0:010d}"))

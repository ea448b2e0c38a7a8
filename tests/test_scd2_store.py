"""Scd2Store tests: partition-overwrite merges match the monolithic
merge_scd2 result across multi-run sequences; closed history is append-only."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pandas_etl_framework_spark import (
    KEY_HASH,
    RECORD_HASH,
    VALID_FROM_MODE_LOAD_DATE,
    VALID_FROM_MODE_LOWER_BOUND,
    VALID_TO,
    add_meta_columns,
    create_currents,
    historize_dataset,
    merge_scd2,
)
from pandas_etl_framework_spark.scd2_store import Scd2Store
from tests.conftest import (
    GRADES_SCHEMA,
    BASE_ROWS,
    CHANGED_FRANKLIN,
    KEY_COLUMNS,
    NEW_KEY_ROWS,
    RUN1_TS,
    RUN2_TS,
    UNCHANGED_BASE,
)

RUN3_TS = "2024-01-12 08:00:00"


def stamped(spark, rows, ts):
    df = spark.createDataFrame(rows, GRADES_SCHEMA)
    return add_meta_columns(df, create_currents(ts), KEY_COLUMNS)


@pytest.fixture()
def three_runs(spark):
    """run1: 14 base; run2: full load with 2 inserts + changed Franklin;
    run3: Franklin changes again."""
    franklin3 = ("Franklin", "Benny", "234-56-2890", 70.0, 1.0, 90.0, 80.0, 90.0, "A-")
    return [
        (BASE_ROWS, RUN1_TS),
        (UNCHANGED_BASE + NEW_KEY_ROWS + [CHANGED_FRANKLIN], RUN2_TS),
        (UNCHANGED_BASE + NEW_KEY_ROWS + [franklin3], RUN3_TS),
    ]


def monolithic_result(spark, three_runs):
    store = None
    for i, (rows, ts) in enumerate(three_runs):
        c = create_currents(ts)
        mode = VALID_FROM_MODE_LOWER_BOUND if i == 0 else VALID_FROM_MODE_LOAD_DATE
        new = stamped(spark, rows, ts)
        if store is None:
            store = historize_dataset(new, None, c, mode)
        else:
            store = merge_scd2(store, new, c, mode).localCheckpoint(eager=False)
    return store


def store_result(spark, three_runs, path):
    s = Scd2Store(spark, path)
    for i, (rows, ts) in enumerate(three_runs):
        c = create_currents(ts)
        mode = VALID_FROM_MODE_LOWER_BOUND if i == 0 else VALID_FROM_MODE_LOAD_DATE
        s.merge(stamped(spark, rows, ts), currents=c, valid_from_mode=mode)
    return s


def _as_key_set(df):
    cols = sorted(df.columns)
    return {tuple(str(r[c]) for c in cols) for r in df.collect()}


def test_store_matches_monolithic_merge(spark, three_runs, tmp_path):
    path = str(tmp_path / "scd2store")
    s = store_result(spark, three_runs, path)
    mono = monolithic_result(spark, three_runs)
    got = s.read()
    assert got.count() == mono.count() == 18  # 16 keys + 2 closed Franklins
    assert _as_key_set(got) == _as_key_set(mono)


def test_store_partitions_on_disk(spark, three_runs, tmp_path):
    path = str(tmp_path / "scd2store")
    store_result(spark, three_runs, path)
    assert os.path.isdir(f"{path}/state=open")
    assert os.path.isdir(f"{path}/state=closed")


def test_store_invariants(spark, three_runs, tmp_path):
    path = str(tmp_path / "scd2store")
    s = store_result(spark, three_runs, path)
    active = s.read_active()
    # one open row per key
    assert active.groupBy(KEY_HASH).count().filter("count > 1").count() == 0
    assert active.count() == 16
    # Franklin: two closed versions + one open
    franklin = s.read().filter(F.col("Lastname") == "Franklin").collect()
    assert len(franklin) == 3
    opens = [r for r in franklin if str(r[VALID_TO]) == "9999-12-31"]
    assert len(opens) == 1
    assert opens[0]["Test1"] == 70.0


def test_closed_partition_is_append_only(spark, three_runs, tmp_path):
    """Files written to state=closed in earlier merges survive later merges
    untouched (the 100 TB property: history is never rewritten)."""
    path = str(tmp_path / "scd2store")
    s = Scd2Store(spark, path)
    for i, (rows, ts) in enumerate(three_runs[:2]):
        c = create_currents(ts)
        mode = VALID_FROM_MODE_LOWER_BOUND if i == 0 else VALID_FROM_MODE_LOAD_DATE
        s.merge(stamped(spark, rows, ts), currents=c, valid_from_mode=mode)
    closed_dir = f"{path}/state=closed"
    files_after_run2 = {
        f: os.path.getmtime(f"{closed_dir}/{f}")
        for f in os.listdir(closed_dir)
        if f.endswith(".parquet")
    }
    rows, ts = three_runs[2]
    s.merge(
        stamped(spark, rows, ts),
        currents=create_currents(ts),
        valid_from_mode=VALID_FROM_MODE_LOAD_DATE,
    )
    for f, mtime in files_after_run2.items():
        assert os.path.exists(f"{closed_dir}/{f}")
        assert os.path.getmtime(f"{closed_dir}/{f}") == mtime


def test_store_compact_closed(spark, three_runs, tmp_path):
    path = str(tmp_path / "scd2store")
    s = store_result(spark, three_runs, path)
    before = s.read().count()
    s.compact_closed(target_files=1)
    closed_dir = f"{path}/state=closed"
    n_files = len([f for f in os.listdir(closed_dir) if f.endswith(".parquet")])
    assert n_files == 1
    assert s.read().count() == before

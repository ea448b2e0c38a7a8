"""Property-based SCD2 invariants (SURVEY.md §5.3): replaying ANY load
sequence must keep —
  1. exactly one open row per key ever present,
  2. VALID_FROM <= VALID_TO on every row,
  3. a closed row's VALID_TO = its successor's VALID_FROM - 1 day,
  4. the open row always carries the latest loaded value for its key.
"""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pandas_etl_framework_spark import (
    KEY_HASH,
    VALID_FROM,
    VALID_FROM_MODE_LOAD_DATE,
    VALID_FROM_MODE_LOWER_BOUND,
    VALID_TO,
    add_meta_columns,
    create_currents,
    historize_dataset,
    merge_scd2,
)

UPPER = datetime.date(9999, 12, 31)
KEYS = ["k0", "k1", "k2", "k3"]

# a load = subset of keys with an integer value per key
load_strategy = st.dictionaries(
    st.sampled_from(KEYS), st.integers(min_value=0, max_value=3), min_size=1
)
sequence_strategy = st.lists(load_strategy, min_size=1, max_size=4)


@pytest.fixture(scope="module")
def sess(spark):
    return spark


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(loads=sequence_strategy)
def test_scd2_invariants_hold_for_any_load_sequence(spark, loads):
    store = None
    run_day = datetime.date(2024, 1, 10)
    latest = {}
    for i, load in enumerate(loads):
        ts = f"2024-01-{10 + i:02d} 08:00:00"
        c = create_currents(ts)
        batch = spark.createDataFrame(
            [(k, v) for k, v in sorted(load.items())], "key string, value int"
        )
        stamped = add_meta_columns(batch, c, ["key"])
        mode = (
            VALID_FROM_MODE_LOWER_BOUND if store is None else VALID_FROM_MODE_LOAD_DATE
        )
        if store is None:
            store = historize_dataset(stamped, None, c, mode)
        else:
            store = merge_scd2(store, stamped, c, mode).localCheckpoint(
                eager=True
            )
        for k, v in load.items():
            latest.setdefault(k, v)
            # reference NOT-IN semantics never close keys without replacing,
            # so every key keeps an open row; latest value wins
            latest[k] = v

    rows = store.collect()

    # 1. exactly one open row per key ever loaded
    open_rows = [r for r in rows if r[VALID_TO] == UPPER]
    assert len(open_rows) == len({r[KEY_HASH] for r in open_rows})
    assert {r["key"] for r in open_rows} == set(latest)

    # 2. interval sanity
    for r in rows:
        assert r[VALID_FROM] <= r[VALID_TO]

    # 3. closed VALID_TO == successor VALID_FROM - 1 (per key, by order)
    by_key: dict[str, list] = {}
    for r in rows:
        by_key.setdefault(r["key"], []).append(r)
    for key, versions in by_key.items():
        versions.sort(key=lambda r: r[VALID_TO])
        for prev, nxt in zip(versions, versions[1:]):
            assert (nxt[VALID_FROM] - prev[VALID_TO]).days == 1

    # 4. open row carries the latest value per key
    for r in open_rows:
        assert r["value"] == latest[r["key"]]

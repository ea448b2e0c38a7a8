"""Round-8 property tests: ADVICE r07 fixes (empty-string provenance,
explicit-salted contradiction, dfreq sigma pad) plus the new scale
hardening (banded-join bucket caps, IVF-PQ persistence/add-batch)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandas_etl_framework_spark import add_meta_columns, create_currents
from pandas_etl_framework_spark.constants import SOURCE_FILE_NAME
from tests.conftest import KEY_COLUMNS, RUN1_TS


def test_source_file_empty_string_stamps_empty_literal(grades_run1):
    """source_file='' must stamp the empty provenance string, not silently
    skip the column (ADVICE r07: the old truthiness gate dropped it)."""
    df = add_meta_columns(
        grades_run1, create_currents(RUN1_TS), KEY_COLUMNS, source_file=""
    )
    assert SOURCE_FILE_NAME in df.columns
    vals = {r[0] for r in df.select(SOURCE_FILE_NAME).distinct().collect()}
    assert vals == {""}


def test_source_file_false_skips_and_bad_type_raises(grades_run1):
    df = add_meta_columns(
        grades_run1, create_currents(RUN1_TS), KEY_COLUMNS, source_file=False
    )
    assert SOURCE_FILE_NAME not in df.columns
    with pytest.raises(TypeError, match="source_file"):
        add_meta_columns(
            grades_run1, create_currents(RUN1_TS), KEY_COLUMNS, source_file=42
        )


def test_auto_join_explicit_salted_with_unsaltable_how_raises(spark):
    """An explicit strategy='salted' with a salt-unsafe join type is a
    caller contradiction — it must raise, not silently downgrade to a
    plain join (ADVICE r07)."""
    from pandas_etl_framework_spark.scale import auto_join

    left = spark.range(10).withColumnRenamed("id", "k")
    right = spark.range(5).withColumnRenamed("id", "k")
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="salted"):
            auto_join(left, right, ["k"], how=how, strategy="salted")
    # explicit salted with a saltable how still works and matches plain
    got = auto_join(left, right, ["k"], how="inner", strategy="salted")
    assert sorted(r["k"] for r in got.collect()) == list(range(5))

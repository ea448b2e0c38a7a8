"""Input-validation behavior: clear errors instead of late Spark analysis
exceptions deep inside a plan."""

from __future__ import annotations

import pytest

from pandas_etl_framework_spark import (
    add_meta_columns,
    create_currents,
    get_delta,
)
from tests.conftest import KEY_COLUMNS, RUN1_TS


def test_add_meta_columns_rejects_missing_key_column(spark, grades_run1):
    with pytest.raises(ValueError, match="key columns \\['Nope'\\]"):
        add_meta_columns(grades_run1, create_currents(RUN1_TS), ["Nope"])


def test_add_meta_columns_rejects_incomplete_currents(spark, grades_run1):
    with pytest.raises(ValueError, match="CURRENT_RUN_TS"):
        add_meta_columns(grades_run1, {}, KEY_COLUMNS)


def test_get_delta_rejects_unstamped_frames(spark, grades_run1):
    with pytest.raises(ValueError, match="add_meta_columns"):
        get_delta(grades_run1, grades_run1)

"""Hash parity against the reference's *actual* pandas semantics.

An in-process pandas implementation of the reference's hashing scheme
(stringify via astype(str), join with '#?', md5 per row —
MetaColumnHelpers.py:91-97) is computed over the same data and compared
value-for-value with the Spark engine's JVM-side hashes. This is the
linchpin check of SURVEY.md §7.1: every join key in the engine derives from
these digests, and a store written by the reference must be join-compatible
with one written here.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from pandas_etl_framework_spark import add_hash_column
from tests.conftest import BASE_ROWS, GRADES_SCHEMA


def pandas_reference_hash(pdf: pd.DataFrame, columns: list[str]) -> pd.Series:
    """The reference's scheme, reimplemented per its documented semantics:
    concat astype(str) values with '#?', md5-hexdigest each row."""
    joined = pdf[columns[0]].astype(str)
    for c in columns[1:]:
        joined = joined + "#?" + pdf[c].astype(str)
    return joined.map(lambda s: hashlib.md5(s.encode("utf8")).hexdigest())


@pytest.fixture()
def grades_pdf():
    return pd.DataFrame(BASE_ROWS, columns=[f.name for f in GRADES_SCHEMA.fields])


def test_key_hash_parity_with_pandas(spark, grades_run1, grades_pdf):
    expected = dict(
        zip(
            grades_pdf["Lastname"],
            pandas_reference_hash(grades_pdf, ["Lastname", "Firstname"]),
        )
    )
    got = {
        r["Lastname"]: r["H"]
        for r in add_hash_column(grades_run1, ["Lastname", "Firstname"], "H").collect()
    }
    assert got == expected


def test_record_hash_parity_with_pandas(spark, grades_run1, grades_pdf):
    cols = list(grades_pdf.columns)  # all 9 source columns incl. doubles
    expected = dict(zip(grades_pdf["Lastname"], pandas_reference_hash(grades_pdf, cols)))
    got = {
        r["Lastname"]: r["H"]
        for r in add_hash_column(grades_run1, cols, "H").collect()
    }
    assert got == expected


def test_float_nan_parity_with_pandas(spark):
    """pandas astype(str) renders float NaN as 'nan' — the engine's
    HASH_NULL_TOKEN must reproduce the same digests."""
    pdf = pd.DataFrame(
        {"k": ["a", "b"], "v": [1.5, float("nan")]}
    )
    expected = dict(zip(pdf["k"], pandas_reference_hash(pdf, ["k", "v"])))
    sdf = spark.createDataFrame([("a", 1.5), ("b", None)], "k string, v double")
    got = {r["k"]: r["H"] for r in add_hash_column(sdf, ["k", "v"], "H").collect()}
    assert got == expected


def test_integer_column_parity_with_pandas(spark):
    pdf = pd.DataFrame({"k": ["x"], "n": [42]})
    expected = pandas_reference_hash(pdf, ["k", "n"]).iloc[0]
    sdf = spark.createDataFrame([("x", 42)], "k string, n long")
    got = add_hash_column(sdf, ["k", "n"], "H").first()["H"]
    assert got == expected


def test_timestamp_parity_with_pandas(spark):
    pdf = pd.DataFrame(
        {"k": ["t"], "ts": [pd.Timestamp("2021-06-01 10:20:30")]}
    )
    expected = pandas_reference_hash(pdf, ["k", "ts"]).iloc[0]
    import datetime

    sdf = spark.createDataFrame(
        [("t", datetime.datetime(2021, 6, 1, 10, 20, 30))], "k string, ts timestamp"
    )
    got = add_hash_column(sdf, ["k", "ts"], "H").first()["H"]
    assert got == expected

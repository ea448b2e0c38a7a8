from __future__ import annotations

import pytest
from pyspark.sql import SparkSession, types as T

GRADES_SCHEMA = T.StructType(
    [
        T.StructField("Lastname", T.StringType()),
        T.StructField("Firstname", T.StringType()),
        T.StructField("SSN", T.StringType()),
        T.StructField("Test1", T.DoubleType()),
        T.StructField("Test2", T.DoubleType()),
        T.StructField("Test3", T.DoubleType()),
        T.StructField("Test4", T.DoubleType()),
        T.StructField("Final", T.DoubleType()),
        T.StructField("Grade", T.StringType()),
    ]
)

# Synthetic grades rows mirroring the reference scenario shapes
# (FIXTURES.md §1/§3): 14 base students, 2 extra keys, 1 changed record.
BASE_ROWS = [
    ("Alfalfa", "Aloysius", "123-45-6789", 40.0, 90.0, 80.0, 70.0, 60.0, "D-"),
    ("Alfred", "University", "123-12-1234", 41.0, 97.0, 96.0, 97.0, 48.0, "D+"),
    ("Gerty", "Gramma", "567-89-0123", 41.0, 80.0, 60.0, 40.0, 44.0, "C"),
    ("Android", "Electric", "087-65-4321", 42.0, 23.0, 36.0, 45.0, 47.0, "B-"),
    ("Bumpkin", "Fred", "456-78-9012", 43.0, 78.0, 88.0, 77.0, 45.0, "A-"),
    ("Rubble", "Betty", "234-56-7890", 44.0, 90.0, 80.0, 90.0, 46.0, "C-"),
    ("Noshow", "Cecil", "345-67-8901", 45.0, 11.0, -1.0, 4.0, 43.0, "F"),
    ("Buff", "Bif", "632-79-9939", 46.0, 20.0, 30.0, 40.0, 50.0, "B+"),
    ("Airpump", "Andrew", "223-45-6789", 49.0, 1.0, 90.0, 100.0, 83.0, "A"),
    ("Backus", "Jim", "143-12-1234", 48.0, 1.0, 97.0, 96.0, 97.0, "A+"),
    ("Carnivore", "Art", "565-89-0123", 44.0, 1.0, 80.0, 60.0, 40.0, "D+"),
    ("Dandy", "Jim", "087-75-4321", 47.0, 1.0, 23.0, 36.0, 45.0, "C+"),
    ("Elephant", "Ima", "456-71-9012", 45.0, 1.0, 78.0, 88.0, 77.0, "B-"),
    ("Franklin", "Benny", "234-56-2890", 50.0, 1.0, 90.0, 80.0, 90.0, "B-"),
]
NEW_KEY_ROWS = [
    ("George", "Boy", "345-67-3901", 40.0, 1.0, 11.0, -1.0, 4.0, "B"),
    ("Heffalump", "Harvey", "632-79-9439", 30.0, 1.0, 20.0, 30.0, 40.0, "C"),
]
CHANGED_FRANKLIN = ("Franklin", "Benny", "234-56-2890", 60.0, 1.0, 90.0, 80.0, 90.0, "B+")

UNCHANGED_BASE = [r for r in BASE_ROWS if r[0] != "Franklin"]

RUN1_TS = "2024-01-10 08:00:00"
RUN2_TS = "2024-01-11 08:00:00"
KEY_COLUMNS = ["Lastname", "Firstname"]


@pytest.fixture(scope="session")
def spark():
    from pandas_etl_framework_spark.session import get_spark

    spark = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture()
def grades_run1(spark):
    return spark.createDataFrame(BASE_ROWS, GRADES_SCHEMA)


@pytest.fixture()
def grades_run2_delta(spark):
    """Delta load: 2 new keys + changed Franklin (FIXTURES.md Scenario A run 2)."""
    return spark.createDataFrame(
        NEW_KEY_ROWS + [CHANGED_FRANKLIN], GRADES_SCHEMA
    )


@pytest.fixture()
def grades_run2_full(spark):
    """Full load: 13 unchanged + 2 new keys + changed Franklin (Scenario B run 2)."""
    return spark.createDataFrame(
        UNCHANGED_BASE + NEW_KEY_ROWS + [CHANGED_FRANKLIN], GRADES_SCHEMA
    )

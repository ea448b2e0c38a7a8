"""range_join unit tests: containment, boundaries, bucket widths, left join."""

from __future__ import annotations

import datetime

import pytest

from pandas_etl_framework_spark.range_join import range_join


def ts(minute):
    return datetime.datetime(2024, 1, 1, 0, minute)


@pytest.fixture()
def frames(spark):
    points = spark.createDataFrame(
        [
            (1, ts(5), "inside_a"),
            (1, ts(10), "boundary_start_b"),   # == b.start (inclusive)
            (1, ts(30), "boundary_end_b"),     # == b.end (inclusive)
            (1, ts(59), "nowhere"),
            (2, ts(5), "other_key"),           # key 2 has interval elsewhere
        ],
        "k long, t timestamp, name string",
    )
    intervals = spark.createDataFrame(
        [
            (1, ts(0), ts(8), "a"),
            (1, ts(10), ts(30), "b"),
            (2, ts(4), ts(6), "c"),
        ],
        "k long, s timestamp, e timestamp, interval_name string",
    )
    return points, intervals


@pytest.mark.parametrize("bucket_seconds", [60, 600, 3600])
def test_range_join_containment_any_bucket_width(spark, frames, bucket_seconds):
    points, intervals = frames
    out = {
        r["name"]: r["interval_name"]
        for r in range_join(
            points, intervals, ["k"], "t", "s", "e", bucket_seconds=bucket_seconds
        ).collect()
    }
    assert out == {
        "inside_a": "a",
        "boundary_start_b": "b",
        "boundary_end_b": "b",
        "other_key": "c",
    }


def test_range_join_left_keeps_unmatched(spark, frames):
    points, intervals = frames
    out = range_join(points, intervals, ["k"], "t", "s", "e", how="left")
    rows = {r["name"]: r["interval_name"] for r in out.collect()}
    assert rows["nowhere"] is None
    assert len(rows) == 5


def test_range_join_overlapping_intervals_multi_match(spark):
    points = spark.createDataFrame([(1, ts(5), "p")], "k long, t timestamp, name string")
    intervals = spark.createDataFrame(
        [(1, ts(0), ts(10), "x"), (1, ts(4), ts(6), "y")],
        "k long, s timestamp, e timestamp, interval_name string",
    )
    out = range_join(points, intervals, ["k"], "t", "s", "e")
    assert {r["interval_name"] for r in out.collect()} == {"x", "y"}

"""asof_join edge cases: no-predecessor nulls, tie inclusion, key isolation."""

from __future__ import annotations

import datetime

import pytest

from pandas_etl_framework_spark.asof import asof_join


def ts(minute):
    return datetime.datetime(2024, 1, 1, 0, minute)


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, ts(10), "p1"),   # after right rows at 5 → matches 5
            (1, ts(20), "p2"),   # matches 15
            (1, ts(3), "p0"),    # before any right row → NULL
            (2, ts(10), "p3"),   # key 2: matches its own right row, not key 1's
            (3, ts(10), "p4"),   # key 3 has no right rows at all → NULL
        ],
        "k long, t timestamp, name string",
    )
    right = spark.createDataFrame(
        [
            (1, ts(5), 50.0),
            (1, ts(15), 150.0),
            (2, ts(10), 999.0),  # tie with left p3's time → inclusive match
        ],
        "k long, rt timestamp, price double",
    )
    return left, right


def test_asof_basic_matching(spark, frames):
    left, right = frames
    out = {
        r["name"]: r["price_asof"]
        for r in asof_join(left, right, ["k"], "t", "rt").collect()
    }
    assert out == {"p1": 50.0, "p2": 150.0, "p0": None, "p3": 999.0, "p4": None}


def test_asof_preserves_left_rowcount(spark, frames):
    left, right = frames
    assert asof_join(left, right, ["k"], "t", "rt").count() == left.count()


def test_asof_rejects_column_collision(spark, frames):
    left, right = frames
    bad_right = right.withColumnRenamed("price", "name")  # collides with left
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, bad_right, ["k"], "t", "rt")


def test_asof_tolerance_nulls_stale_matches(spark):
    """tolerance_seconds mirrors pandas merge_asof: a preceding right row
    older than the window must null out, an in-window one must match."""
    from pandas_etl_framework_spark.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "a"), (1, "2024-01-01 12:00:00", "b")],
        "k long, lts string, tag string",
    ).selectExpr("k", "CAST(lts AS TIMESTAMP) AS lts", "tag")
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:55:00", 7.0)], "k long, rts string, v double"
    ).selectExpr("k", "CAST(rts AS TIMESTAMP) AS rts", "v")

    out = {
        r["tag"]: r["v_asof"]
        for r in asof_join(
            left, right, on=["k"], left_time="lts", right_time="rts",
            tolerance_seconds=600,
        ).collect()
    }
    assert out["a"] == 7.0      # 5 min old: within tolerance
    assert out["b"] is None     # >2 h old: stale, nulled

    # without tolerance both carry the value
    out2 = {
        r["tag"]: r["v_asof"]
        for r in asof_join(
            left, right, on=["k"], left_time="lts", right_time="rts"
        ).collect()
    }
    assert out2 == {"a": 7.0, "b": 7.0}


def test_asof_tolerance_gates_the_value_providing_row(spark):
    """A NEWER null-valued right row must not vouch for an older stale
    value: the tolerance is tested against the timestamp of the row that
    supplied the carried value."""
    from pandas_etl_framework_spark.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 12:00:00")], "k long, lts string"
    ).selectExpr("k", "CAST(lts AS TIMESTAMP) AS lts")
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:55:00", 5.0), (1, "2024-01-01 11:55:00", None)],
        "k long, rts string, v double",
    ).selectExpr("k", "CAST(rts AS TIMESTAMP) AS rts", "v")

    out = asof_join(
        left, right, on=["k"], left_time="lts", right_time="rts",
        tolerance_seconds=600,
    ).collect()[0]
    assert out["v_asof"] is None  # value came from 09:55 — 2h stale

    # without tolerance the last NON-NULL value carries (documented
    # per-column semantics)
    out2 = asof_join(
        left, right, on=["k"], left_time="lts", right_time="rts"
    ).collect()[0]
    assert out2["v_asof"] == 5.0


def test_asof_left_column_ending_in_suffix_survives(spark):
    from pandas_etl_framework_spark.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 9.0)],
        "k long, lts string, price_asof double",
    ).selectExpr("k", "CAST(lts AS TIMESTAMP) AS lts", "price_asof")
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", 1.0)], "k long, rts string, v double"
    ).selectExpr("k", "CAST(rts AS TIMESTAMP) AS rts", "v")
    out = asof_join(
        left, right, on=["k"], left_time="lts", right_time="rts",
        right_value_cols=["v"], tolerance_seconds=7200,
    ).collect()[0]
    assert out["price_asof"] == 9.0 and out["v_asof"] == 1.0


def test_asof_nearest_picks_closest_with_backward_ties(spark):
    from pandas_etl_framework_spark.asof import asof_join_nearest

    left = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", "mid"),     # 09:58 vs 10:05 -> back
            (1, "2024-01-01 10:04:00", "fwd"),     # 10:05 is closer
            (1, "2024-01-01 09:00:00", "before"),  # only forward exists? no: 09:58 after, backward none
            (2, "2024-01-01 12:00:00", "lonely"),  # no right rows at all
        ],
        "k long, lts string, tag string",
    ).selectExpr("k", "CAST(lts AS TIMESTAMP) AS lts", "tag")
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:58:00", 1.0), (1, "2024-01-01 10:05:00", 2.0)],
        "k long, rts string, v double",
    ).selectExpr("k", "CAST(rts AS TIMESTAMP) AS rts", "v")

    out = {
        r["tag"]: r["v_asof"]
        for r in asof_join_nearest(
            left, right, on=["k"], left_time="lts", right_time="rts"
        ).collect()
    }
    assert out["mid"] == 1.0      # 2 min back vs 5 min fwd
    assert out["fwd"] == 2.0      # 1 min fwd vs 6 min back
    assert out["before"] == 1.0   # only forward side has candidates
    assert out["lonely"] is None

    # exact tie -> backward row, like pandas
    tie_left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "k long, lts string"
    ).selectExpr("k", "CAST(lts AS TIMESTAMP) AS lts")
    tie_right = spark.createDataFrame(
        [(1, "2024-01-01 09:59:00", 1.0), (1, "2024-01-01 10:01:00", 2.0)],
        "k long, rts string, v double",
    ).selectExpr("k", "CAST(rts AS TIMESTAMP) AS rts", "v")
    tie = asof_join_nearest(
        tie_left, tie_right, on=["k"], left_time="lts", right_time="rts"
    ).collect()[0]
    assert tie["v_asof"] == 1.0


@pytest.mark.parametrize("seed", [3, 17])
@pytest.mark.parametrize("mode", ["backward", "tolerance", "nearest"])
def test_asof_matches_pandas_merge_asof_random(spark, seed, mode):
    """Differential test against pandas merge_asof — the semantic the
    operators document — on random keyed series with duplicate
    timestamps on the right deduplicated (our window takes the LATEST
    preceding right row; merge_asof does too, but ties inside the right
    frame depend on input order, so make right times unique per key)."""
    import random

    import pandas as pd

    from pandas_etl_framework_spark.asof import asof_join, asof_join_nearest

    rng = random.Random(seed)
    keys = [1, 2, 3]
    left_rows = [
        (k, rng.randint(0, 1000)) for k in keys for _ in range(40)
    ]
    right_times = {k: rng.sample(range(0, 1000), 30) for k in keys}
    right_rows = [
        (k, t, float(k * 10000 + t)) for k in keys for t in right_times[k]
    ]

    lpdf = pd.DataFrame(left_rows, columns=["k", "t"]).assign(
        t=lambda d: pd.to_datetime(d["t"], unit="s")
    )
    rpdf = pd.DataFrame(right_rows, columns=["k", "t", "v"]).assign(
        t=lambda d: pd.to_datetime(d["t"], unit="s")
    )
    kw = {}
    if mode == "tolerance":
        kw["tolerance"] = pd.Timedelta(seconds=50)
    expected = pd.merge_asof(
        lpdf.sort_values("t", kind="stable"),
        rpdf.sort_values("t", kind="stable"),
        on="t",
        by="k",
        direction="nearest" if mode == "nearest" else "backward",
        **kw,
    )
    want = sorted(
        (r.k, r.t.isoformat(), None if pd.isna(r.v) else r.v)
        for r in expected.itertuples()
    )

    ldf = spark.createDataFrame(lpdf)
    rdf = spark.createDataFrame(rpdf)
    if mode == "nearest":
        out = asof_join_nearest(ldf, rdf, ["k"], "t", "t")
    else:
        out = asof_join(
            ldf, rdf, ["k"], "t", "t",
            tolerance_seconds=50 if mode == "tolerance" else None,
        )
    got = sorted(
        (r["k"], r["t"].isoformat(), r["v_asof"])
        for r in out.collect()
    )
    assert got == want

"""Batch ↔ streaming sessionization equivalence on real event data:
every session the stateful streaming operator closes must exist, with
identical bounds and event count, in the batch window-function result —
and the closed set must be exactly 'all non-trailing batch sessions, plus
each trailing session the event-time timeout fires for (last event + gap
strictly before the final watermark, in Spark's floor-to-ms timer math)'."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_etl_framework_spark.relational import load_events, q_events_sessionize
from pandas_etl_framework_spark.streaming import sessionize_stream


def test_streaming_sessions_match_batch(spark, tmp_path):
    events = load_events(spark, "/root/testdata/sf0.001").select("user_id", "ts")
    src = str(tmp_path / "events")
    events.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("parity_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("select * from parity_sessions").collect()
    }

    batch = q_events_sessionize(spark, "/root/testdata/sf0.001")
    batch_rows = batch.collect()
    batch_all = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch_rows
    }
    # each user's final session stays open in the stream UNLESS the final
    # watermark (floor-ms(max ts) - 10 min) strictly passes its
    # last event + gap, in which case the event-time timeout closes it
    import pandas as pd

    from pandas_etl_framework_spark.streaming.windows import (
        SESSION_GAP_SECONDS,
    )

    def ms(dt) -> int:
        return pd.Timestamp(dt).value // 1_000_000

    wm_ms = max(ms(r["session_end"]) for r in batch_rows) - 600_000
    last_per_user = {}
    for r in batch_rows:
        cur = last_per_user.get(r["user_id"])
        if cur is None or r["session_start"] > cur["session_start"]:
            last_per_user[r["user_id"]] = r
    still_open = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in last_per_user.values()
        if ms(r["session_end"]) + SESSION_GAP_SECONDS * 1_000 >= wm_ms
    }
    expected_closed = batch_all - still_open

    assert streamed == expected_closed
    assert len(streamed) > 0

"""Streaming windowed aggregation and stateful sessionization.

Streaming counterparts of the batch ``events_hourly`` / ``events_sessionize``
harness queries (relational.py): tumbling-window counts with a watermark for
late data, and gap-based sessions via ``applyInPandasWithState``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..relational import normalize_event_time

SESSION_GAP_SECONDS = 1800


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window per-type counts with late-data watermark.

    Works on both batch and streaming DataFrames (same plan); on a stream
    the watermark bounds state so dropped-late rows cap memory at any scale.
    """
    # watermark rejects TIMESTAMP_NTZ event time (EVENT_TIME_IS_NOT_ON_
    # TIMESTAMP_TYPE); normalize if the source schema drifted
    events = normalize_event_time(events, "ts")
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration).alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key_columns: list[str],
    left_ts: str,
    right_ts: str,
    max_delay: str = "30 minutes",
    watermark_delay: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: right events within
    ``[left_ts, left_ts + max_delay]`` of a matching-key left event (the
    impression→conversion attribution shape).

    Works identically on batch DataFrames (same plan, watermarks are
    no-ops). On streams, BOTH watermarks plus the bounded time predicate
    are what let the engine evict join state — without the upper bound the
    state grows forever; with it, state is capped at
    watermark_delay + max_delay per key. Timestamp columns must be
    distinct between the two sides (alias before calling)."""
    lw = left.withWatermark(left_ts, watermark_delay)
    rw = right.withWatermark(right_ts, watermark_delay)
    cond = None
    for k in key_columns:
        eq = lw[k] == rw[k]
        cond = eq if cond is None else cond & eq
    cond = (
        cond
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    joined = lw.join(rw, cond, how)
    # drop the duplicate key columns from the right side
    return joined.drop(*[rw[k] for k in key_columns])


SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ts", T.DoubleType()),
        T.StructField("last_ts", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _session_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Custom stateful operator: per-user open-session state; emits a session
    row whenever the inter-event gap exceeds SESSION_GAP_SECONDS or the
    processing-time timeout closes an idle session."""
    import datetime

    (user_id,) = key

    if state.hasTimedOut:
        start_ts, last_ts, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [datetime.datetime.utcfromtimestamp(start_ts)],
                "session_end": [datetime.datetime.utcfromtimestamp(last_ts)],
                "n_events": [n],
            }
        )
        return

    ts_values: list[float] = []
    for pdf in pdfs:
        ts_values.extend(t.timestamp() for t in pdf["ts"])
    ts_values.sort()

    if state.exists:
        start_ts, last_ts, n = state.get
    else:
        start_ts, last_ts, n = None, None, 0

    closed = {"user_id": [], "session_start": [], "session_end": [], "n_events": []}
    for t in ts_values:
        if start_ts is None:
            start_ts, last_ts, n = t, t, 1
        elif t - last_ts > SESSION_GAP_SECONDS:
            closed["user_id"].append(user_id)
            closed["session_start"].append(datetime.datetime.utcfromtimestamp(start_ts))
            closed["session_end"].append(datetime.datetime.utcfromtimestamp(last_ts))
            closed["n_events"].append(n)
            start_ts, last_ts, n = t, t, 1
        else:
            last_ts, n = t, n + 1

    state.update((start_ts, last_ts, n))
    state.setTimeoutDuration(SESSION_GAP_SECONDS * 1000)
    if closed["user_id"]:
        yield pd.DataFrame(closed)


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Gap-based sessionization as a custom stateful streaming operator
    (``applyInPandasWithState``): the streaming twin of the batch
    ``events_sessionize`` harness query. State is one small tuple per user —
    bounded by the active-user cardinality, not the event volume.
    """
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


# --------------------------------------------------------------------------
# Oracle-gated streaming query: the driver correctness surface
# --------------------------------------------------------------------------

def q_streaming_windowed_counts(spark, sf_dir: str) -> DataFrame:
    """Tumbling-window counts THROUGH THE REAL MICRO-BATCH ENGINE, returned
    as a batch DataFrame so the driver can oracle-check it: file-stream
    source over events.parquet, availableNow trigger, watermarked
    event-time windows, memory sink in complete mode (all windows emitted;
    the watermark still bounds per-batch state). The value sum uses the
    repo's quantized-integer idiom so the result is order-independent —
    a raw double sum would hash differently per partitioning. The memory
    sink keeps only the window×type aggregate on the driver (bounded);
    the scan/aggregation runs distributed like any stream.

    Streaming is otherwise driver-unverifiable (no SQL twin can run a
    Structured Streaming query): this entry closes that gap by making the
    streaming engine's OUTPUT the thing the DuckDB oracle checks.

    HARNESS-ONLY BOUNDARY: a complete-mode memory sink is driver-resident
    state and only acceptable here because the aggregate is bounded
    (window x event_type) and the query is a one-shot availableNow run.
    The production paths are the foreachBatch / file sinks in
    streaming/historize.py, whose state lives in the checkpoint and sink,
    not on the driver. The checkpoint dir and sink table are torn down
    before returning — the result is materialized first, so repeated runs
    leak neither disk nor catalog entries."""
    import shutil
    import tempfile
    import uuid

    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    stream = normalize_event_time(stream, "ts")
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(F.round(F.col("value") * 10000).cast("long")).cast(
                    "double"
                )
                / 10000
            ).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    name = f"stream_win_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="q_stream_ckpt_")
    # Size the state store to the STATE, not the input: the stateful
    # shuffle's partition count is pinned by the checkpoint at first
    # micro-batch, and this aggregate's state cardinality is
    # (windows x event_types) — tiny. 32 state partitions cost ~0.5s of
    # per-batch task/state-store overhead here; 8 is right-sized and the
    # same sizing rule (state volume, not data volume) applies on a
    # cluster. Scoped set + restore: the checkpoint is fresh per call, so
    # the pinning never leaks across queries.
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    sink = spark.table(name)
    rows = sink.collect()  # bounded: one row per (window, event_type)
    out = spark.createDataFrame(rows, sink.schema)
    spark.catalog.dropTempView(name)
    shutil.rmtree(ckpt, ignore_errors=True)
    return out


SQL_STREAMING_WINDOWED_COUNTS = """
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(round(value * 10000) AS BIGINT)) AS DOUBLE) / 10000
           AS sum_value
FROM events
GROUP BY 1, 2, 3
"""


def q_streaming_dedup(spark, sf_dir: str) -> DataFrame:
    """Watermarked streaming dedup THROUGH THE REAL MICRO-BATCH ENGINE,
    oracle-checkable: file-stream the events table, run
    ``historize.streaming_dedup`` on (user_id, event_type) with ts as
    event time, availableNow trigger, append-mode memory sink (dedup
    emits rows immediately — no watermark-close wait), then aggregate
    the deduped stream per event_type so the driver compares a bounded
    result. The dedup state is watermark-bounded: keys older than the
    delay are dropped from the state store, which is what makes exact
    ingest-dedup viable on an unbounded 100 TB stream.

    Same HARNESS-ONLY BOUNDARY as q_streaming_windowed_counts: memory
    sink + one-shot availableNow for verifiability; production sinks are
    foreachBatch/file. Checkpoint dir and sink table are torn down after
    materialization."""
    import shutil
    import tempfile
    import uuid

    from .historize import streaming_dedup

    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    deduped = streaming_dedup(
        stream, ["user_id", "event_type"], event_time_col="ts"
    )
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="q_stream_dedup_ckpt_")
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # bounded driver result: per-type count of surviving rows
        rows = (
            spark.table(name)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_unique"))
            .collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
        spark.catalog.dropTempView(name)
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.createDataFrame(
        rows, "event_type string, n_unique bigint"
    )


# availableNow over one parquet file = a single micro-batch, so the
# watermark never advances past any in-flight row and the surviving set
# is exactly the batch-distinct of the dedup key (+ event time).
SQL_STREAMING_DEDUP = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_unique
FROM (SELECT DISTINCT user_id, event_type, ts FROM events)
GROUP BY event_type
"""


def register_all() -> None:
    from .. import harness

    harness.register(
        "streaming_windowed_counts",
        q_streaming_windowed_counts,
        SQL_STREAMING_WINDOWED_COUNTS,
    )
    harness.register(
        "streaming_dedup_counts",
        q_streaming_dedup,
        SQL_STREAMING_DEDUP,
    )

"""Restart/re-delivery idempotency proofs (VERDICT r06 item 2).

Structured Streaming's foreachBatch is at-least-once: a crash after the
sink commit but before the checkpoint's commit marker re-runs the batch
on restart. These tests force that exact window — by deleting the newest
``commits/N`` marker from a real checkpoint — and prove both stateful
sinks absorb the replay:

- ``historize_append``: the delta anti-join on (KEY_HASH, RECORD_HASH)
  makes a re-delivered batch a no-op even though the replay gets a FRESH
  wall-clock run context (RECORD_HASH excludes meta columns);
- ``Scd2Store.merge``: re-merging a batch whose versions are already
  current routes every key to "unchanged", touching neither validity
  interval nor history.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from pandas_etl_framework_spark import io as eio
from pandas_etl_framework_spark.constants import (
    VALID_FROM_MODE_LOAD_DATE,
    VALID_FROM_MODE_LOWER_BOUND,
)
from pandas_etl_framework_spark.meta_columns import (
    add_meta_columns,
    create_currents,
)
from pandas_etl_framework_spark.scd2_store import Scd2Store
from pandas_etl_framework_spark.streaming.historize import (
    streaming_historize_append,
)

SF_DIR = "/root/testdata/sf0.001"


def _store_fingerprint(spark, store_path):
    """Order-insensitive content signature over the deterministic columns."""
    df = eio.read_parquet_df(spark, store_path)
    row = df.agg(
        F.count("*").alias("n"),
        F.count_distinct("KEY_HASH", "RECORD_HASH").alias("n_pairs"),
        F.sum(F.conv(F.substring("RECORD_HASH", 1, 8), 16, 10).cast("long")).alias(
            "rh_sum"
        ),
    ).first()
    return (row["n"], row["n_pairs"], row["rh_sum"])


def _drop_latest_commit(ckpt: str) -> None:
    """Simulate the crash between sink commit and checkpoint commit: the
    offsets WAL for the last batch survives, its commits marker does not —
    on restart the engine re-runs that batch's data."""
    commits = os.path.join(ckpt, "commits")
    markers = [f for f in os.listdir(commits) if f.split(".")[0].isdigit()]
    latest = max(markers, key=lambda f: int(f.split(".")[0]))
    os.remove(os.path.join(commits, latest))
    crc = os.path.join(commits, f".{latest}.crc")
    if os.path.exists(crc):
        os.remove(crc)


def test_historize_stream_replays_lost_commit_as_noop(spark, tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    b1 = orders.filter(F.col("o_orderkey") % 10 < 8)
    b2 = orders.filter(F.col("o_orderkey") % 10 >= 5).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1
    )
    b1.write.parquet(src)
    schema = b1.schema

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = streaming_historize_append(
            spark, stream, store, ckpt, ["o_orderkey"], trigger_once=True
        )
        q.awaitTermination()

    run_once()
    b2.write.mode("append").parquet(src)
    run_once()
    after_clean = _store_fingerprint(spark, store)

    # crash window: batch-2's sink writes landed, its commit marker lost
    _drop_latest_commit(ckpt)
    run_once()  # restart => engine re-delivers batch-2's files
    after_replay = _store_fingerprint(spark, store)

    assert after_replay == after_clean
    # the anti-join really absorbed the duplicates (not "nothing ran"):
    # the store still holds both runs' pair-set
    n, n_pairs, _ = after_replay
    assert n == n_pairs  # invariant: one row per (KEY_HASH, RECORD_HASH)
    assert n > b1.count()  # run 2 did add changed/new rows


def test_historize_stream_checkpoint_rollback_replay_is_noop(spark, tmp_path):
    """Coarser failure: the whole checkpoint rolls back to a pre-run-2
    snapshot (lost volume), so EVERY run-2 file is re-delivered."""
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    snap = str(tmp_path / "snap")
    df = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    b2 = spark.range(100, 300).select(
        F.col("id").alias("k"),
        ((F.col("id") % 7) + F.when(F.col("id") % 2 == 0, 1).otherwise(0)).alias("v"),
    )
    df.write.parquet(src)
    schema = df.schema

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = streaming_historize_append(
            spark, stream, store, ckpt, ["k"], trigger_once=True
        )
        q.awaitTermination()

    run_once()
    shutil.copytree(ckpt, snap)
    b2.write.mode("append").parquet(src)
    run_once()
    after_clean = _store_fingerprint(spark, store)
    shutil.rmtree(ckpt)
    shutil.copytree(snap, ckpt)
    run_once()
    assert _store_fingerprint(spark, store) == after_clean


def test_scd2_store_merge_redelivery_is_idempotent(spark, tmp_path):
    """Replaying an Scd2Store.merge of an already-current batch (pinned
    context, as the streaming harness pins per availableNow run) must
    leave every row — validity intervals included — byte-identical."""
    store_path = str(tmp_path / "scd2")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    b1 = orders.filter(F.col("o_orderkey") % 10 < 8)
    b2 = orders.filter(F.col("o_orderkey") % 10 >= 5).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1
    )
    ctx1 = create_currents("2024-01-10 08:00:00")
    ctx2 = create_currents("2024-01-11 08:00:00")
    store = Scd2Store(spark, store_path)
    store.merge(
        add_meta_columns(b1, ctx1, ["o_orderkey"]),
        currents=ctx1,
        valid_from_mode=VALID_FROM_MODE_LOWER_BOUND,
    )
    stamped2 = add_meta_columns(b2, ctx2, ["o_orderkey"])
    store.merge(
        stamped2, currents=ctx2, valid_from_mode=VALID_FROM_MODE_LOAD_DATE
    )

    def rows():
        return sorted(
            tuple(str(v) for v in r)
            for r in store.read()
            .select(
                "o_orderkey", "o_totalprice", "KEY_HASH", "RECORD_HASH",
                "VALID_FROM", "VALID_TO", "INSERT_RUN_ID", "UPDATE_RUN_ID",
            )
            .collect()
        )

    after_clean = rows()
    # re-delivery: the same stamped batch, same pinned context, again
    store.merge(
        stamped2, currents=ctx2, valid_from_mode=VALID_FROM_MODE_LOAD_DATE
    )
    assert rows() == after_clean


def test_stateful_dedup_file_sink_replays_lost_commit_without_duplicates(
    spark, tmp_path
):
    """State-store path twin (VERDICT r07 item 5): streaming_dedup →
    FILE sink, crash window forced by deleting the newest checkpoint
    commit marker after the sink committed. On restart the engine
    re-executes that batch against the state-store version the
    checkpoint pins, and the file sink's _spark_metadata log (sink-side,
    untouched by the checkpoint surgery) skips the already-committed
    batch id — so the sink holds each surviving row exactly once, equal
    to a clean no-crash twin run."""
    from pandas_etl_framework_spark.streaming.historize import streaming_dedup

    events = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    b1 = events.filter(F.col("event_id") % 3 != 0)
    b2 = events.filter(F.col("event_id") % 3 == 0)

    def run_stream(src: str, sink: str, ckpt: str) -> None:
        stream = spark.readStream.schema(b1.schema).parquet(src)
        deduped = streaming_dedup(stream, ["user_id", "event_type"])
        q = (
            deduped.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def fingerprint(sink: str):
        df = spark.read.parquet(sink)
        return (
            df.count(),
            df.select("user_id", "event_type").distinct().count(),
            df.agg(F.sum("event_id")).first()[0],
        )

    # crash-replay run
    src, sink, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "sink"),
        str(tmp_path / "ckpt"),
    )
    b1.write.parquet(src)
    run_stream(src, sink, ckpt)
    b2.write.mode("append").parquet(src)
    run_stream(src, sink, ckpt)
    _drop_latest_commit(ckpt)          # sink committed, offset commit lost
    run_stream(src, sink, ckpt)        # REDELIVERY of the last batch
    # clean twin
    src2, sink2, ckpt2 = (
        str(tmp_path / "src2"),
        str(tmp_path / "sink2"),
        str(tmp_path / "ckpt2"),
    )
    b1.write.parquet(src2)
    run_stream(src2, sink2, ckpt2)
    b2.write.mode("append").parquet(src2)
    run_stream(src2, sink2, ckpt2)

    got, want = fingerprint(sink), fingerprint(sink2)
    assert got == want
    # the dedup itself did real work: one row per distinct key
    n_rows, n_keys, _ = got
    assert n_rows == n_keys

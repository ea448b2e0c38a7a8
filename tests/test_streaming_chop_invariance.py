"""Micro-batch-chopping invariance of the two incremental streaming
dedup twins (round 10, VERDICT r09 item 2).

The r08-era design resolved keep-first owners / pair legs inside each
foreachBatch and silently assumed every logical load arrives as exactly
ONE micro-batch — under maxFilesPerTrigger chopping, a lower-doc_id
copy landing in a later micro-batch could not evict an already-emitted
duplicate (lines), and a same-run pair straddling two micro-batches was
mislabeled as a corpus pair (minhash). The twins are now merge-on-read:
micro-batches append only chop-invariant artifacts (associative store
partials / canonical pairs), and owners and labels are resolved at read
time against the final fold. These tests force the chopping the old
design could not survive — each source load split across several files,
``maxFilesPerTrigger=1`` so every file is its own micro-batch — and
assert the streamed result is IDENTICAL to the single-batch run and to
the non-streaming batch recompute that the DuckDB oracle gates.
"""

from __future__ import annotations

from pandas_etl_framework_spark.llmops.dedup import (
    q_dedup_lines_incremental,
    q_dedup_minhash_incremental,
    q_dedup_substrings_incremental,
    q_streaming_lines_incremental,
    q_streaming_minhash_incremental,
    q_streaming_substrings_incremental,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_chopped_lines_stream_matches_batch(spark):
    chopped = q_streaming_lines_incremental(
        spark, SF_DIR, max_files_per_trigger=1, src_files=3
    )
    batch = q_dedup_lines_incremental(spark, SF_DIR)
    assert _rows(chopped) == _rows(batch)


def test_chopped_minhash_stream_matches_batch(spark):
    chopped = q_streaming_minhash_incremental(
        spark, SF_DIR, max_files_per_trigger=1, src_files=3
    )
    batch = q_dedup_minhash_incremental(spark, SF_DIR)
    assert _rows(chopped) == _rows(batch)


def test_unchopped_lines_stream_matches_batch(spark):
    # the driver path (no chopping knobs) must agree with the same oracle
    streamed = q_streaming_lines_incremental(spark, SF_DIR)
    batch = q_dedup_lines_incremental(spark, SF_DIR)
    assert _rows(streamed) == _rows(batch)


def test_chopped_substrings_stream_matches_batch(spark):
    # the substring twin is merge-on-read by construction (round 10);
    # this pins the invariance the same way as the other two twins
    chopped = q_streaming_substrings_incremental(
        spark, SF_DIR, max_files_per_trigger=1, src_files=3
    )
    batch = q_dedup_substrings_incremental(spark, SF_DIR)
    assert _rows(chopped) == _rows(batch)


def test_replayed_chopped_streams_match_batch(spark):
    """At-least-once redelivery idempotency (ADVICE r10): every artifact
    write is keyed by batch_id (overwrite-own-partition), so re-invoking
    process_batch with the same (data, batch_id) — the engine's retry
    shape — must leave store partials and staged rows byte-identical
    instead of double-counting. Chopped + replayed runs of all three
    twins must still equal the batch recompute the oracle gates."""
    for streaming_q, batch_q in (
        (q_streaming_lines_incremental, q_dedup_lines_incremental),
        (q_streaming_minhash_incremental, q_dedup_minhash_incremental),
        (q_streaming_substrings_incremental, q_dedup_substrings_incremental),
    ):
        replayed = streaming_q(
            spark,
            SF_DIR,
            max_files_per_trigger=1,
            src_files=2,
            replay_each_batch=True,
        )
        batch = batch_q(spark, SF_DIR)
        assert _rows(replayed) == _rows(batch), streaming_q.__name__


def test_chopped_replayed_hll_stream_matches_direct_build(spark):
    """The r12 streaming HLL twin: register partials appended per
    micro-batch and max-folded at read time must equal the direct
    single-pass grouped build (sketch_hll_merge's own query) — chopped
    one file per micro-batch, AND with every batch delivered twice
    (batch_id-keyed overwrite makes the replay a no-op; a blind append
    could not corrupt max-folded registers, but the discipline is
    uniform across every streaming twin)."""
    from pandas_etl_framework_spark.sketches import (
        q_sketch_hll_merge,
        q_streaming_hll_registers,
    )

    for kwargs in (
        {"max_files_per_trigger": 1, "src_files": 3},
        {"max_files_per_trigger": 1, "src_files": 2,
         "replay_each_batch": True},
    ):
        streamed = q_streaming_hll_registers(spark, SF_DIR, **kwargs)
        direct = q_sketch_hll_merge(spark, SF_DIR)
        assert _rows(streamed) == _rows(direct), kwargs

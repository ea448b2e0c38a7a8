"""Structured Streaming surface: streaming CDC historization
(foreachBatch over the batch core), watermarked windowed aggregation, and
stateful sessionization.

The reference has no streaming at all (SURVEY.md §2.6) — its batch-run loop
(main.py:29-31) is the closest analogue. These operators make the same
semantics continuous: each micro-batch flows through the *identical* batch
operators (hash stamping, delta anti-join), so batch and streaming results
agree by construction.
"""

from .historize import (  # noqa: F401
    streaming_dedup,
    streaming_historize_append,
    streaming_scd2_merge,
    streaming_versioned_append,
)
from .windows import (  # noqa: F401
    interval_join_streams,
    sessionize_stream,
    windowed_event_counts,
)

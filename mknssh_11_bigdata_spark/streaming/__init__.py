"""Structured Streaming extension (SURVEY.md §7.8).

The reference has no streaming surface (SURVEY §2.7); this module adds
event-time windowed aggregation + watermarking + sessionization as
first-class operators. The window builders are batch/stream agnostic —
``F.window``/``F.session_window`` evaluate identically over a static
DataFrame and a stream, so the oracle-checked batch queries certify the
same expressions the streaming jobs run.
"""

from .windows import (  # noqa: F401
    hourly_tumbling_agg,
    session_counts,
    sliding_agg,
    stream_from_parquet_events,
    tumbling_agg,
)

from .incremental import IncrementalDedupCorpusSink  # noqa: F401

"""Structured Streaming surface.

The reference is a daily cron batch (SURVEY.md §2.10 — no streaming);
this package is the engine's incremental superset: the same
transformations, run continuously. Design rule: every aggregation here
is an UNTYPED DataFrame transformation, so one function body serves
batch (oracle-checked in the driver contract) and streaming (wired
through readStream/writeStream with watermarks + checkpoints).
"""

from .dedup import dedup_stream
from .ingest import read_quotes_stream, run_ingest_available_now
from .windows import hopping_counts, tumbling_counts
from .sessions import session_window_agg

__all__ = [
    "read_quotes_stream",
    "run_ingest_available_now",
    "tumbling_counts",
    "hopping_counts",
    "session_window_agg",
    "dedup_stream",
]

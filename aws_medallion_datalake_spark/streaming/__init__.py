"""Structured Streaming ingest: exactly-once appends + watermarked rollup."""

from .consume import consume_changes, last_consumed_snapshot  # noqa: F401
from .ingest import (  # noqa: F401
    default_app_id,
    exactly_once_append,
    last_committed_batch,
    stream_append,
    windowed_event_rollup,
)
from .sessionize import sessionize_batch, sessionize_stream  # noqa: F401

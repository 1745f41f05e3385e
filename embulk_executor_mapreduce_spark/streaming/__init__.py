"""Structured Streaming ingest — a true extension beyond the bounded-batch
reference (SURVEY.md §2.4): the reference's input is always a finite task set;
here the same pipeline shapes run incrementally with watermarks and windows."""

from .ingest import (
    hourly_counts_stream,
    run_stream_to_memory,
    streaming_dedup,
)

__all__ = ["hourly_counts_stream", "run_stream_to_memory", "streaming_dedup"]

"""Sinks: partitioned transactional writes via Spark's file commit protocol."""

from .writer import write_sink

__all__ = ["write_sink"]

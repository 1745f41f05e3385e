"""Sources: file-format readers (Catalyst-visible fast path) + the
plugin-style task source (``mapInPandas`` escape hatch)."""

from .readers import read_source

__all__ = ["read_source"]

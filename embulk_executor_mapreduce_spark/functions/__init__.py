"""Scalar function surface exposed to pipeline specs.

The reference evaluates no scalar expressions itself (SURVEY.md §2.3) — its
filters are opaque plugins. Our spec's ``filter``/``with_column`` slots accept
any Spark SQL expression; this module documents and validates the portable
subset (identical semantics in the DuckDB oracle dialect), which the
``functions_*`` catalog queries gate end-to-end.
"""

from .registry import PORTABLE_SCALARS, is_portable

__all__ = ["PORTABLE_SCALARS", "is_portable"]

"""Plan compilation: pipeline spec → DataFrame plan → execution report."""

from .compiler import compile_pipeline, run_pipeline

__all__ = ["compile_pipeline", "run_pipeline"]

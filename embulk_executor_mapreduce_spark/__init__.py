"""embulk_executor_mapreduce_spark — a PySpark-native bulk-load / analytics engine.

A brand-new engine with the query and data-processing capabilities of
embulk/embulk-executor-mapreduce (the reference, surveyed in /root/repo/SURVEY.md),
re-expressed Spark-first:

- the reference's declarative pipeline (``in:`` → ``filters:`` → ``out:`` +
  ``partitioning:``) becomes a spec compiled onto the DataFrame API
  (:mod:`.spec`, :mod:`.plans.compiler`),
- its one built-in partitioning strategy (timestamp/long hour-day bucketing with
  skew salting; reference ``TimestampPartitioning.java``) becomes Catalyst
  expressions (:mod:`.operators.partitioning`),
- its shuffle + partitioned transactional sink becomes ``repartition`` +
  Spark's file-commit protocol (:mod:`.sinks.writer`),
- and a large-scale analytic operator surface (joins/aggs/windows, dedup,
  similarity search, text analysis, multimodal columns) layers on top
  (:mod:`.operators`), designed for 100 TB scale.

Nothing here copies reference code — the reference is Java-on-Hadoop-MR; this is
idiomatic PySpark. Citations in docstrings point at reference behavior being
matched, not code being translated.
"""

__version__ = "0.1.0"

from .errors import (
    ConfigError,
    PartitionError,
    RemoteTaskFailedError,
    RemoteTaskFailedDataError,
)
from .session import get_spark

__all__ = [
    "ConfigError",
    "PartitionError",
    "RemoteTaskFailedError",
    "RemoteTaskFailedDataError",
    "get_spark",
    "__version__",
]

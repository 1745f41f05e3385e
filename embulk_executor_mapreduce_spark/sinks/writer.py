"""Partitioned transactional sink (SURVEY.md §2.2 O10).

Reference semantics: each reduce task opens ONE output transaction, appends
every record routed to it, then finish/commit (abort on failure) — output task
count = reduce task count (``EmbulkPartitioningMapReduce.java:156-236``).

Spark-first: one write task per DataFrame partition, atomicity via Spark's
FileCommitProtocol (task attempts write to a staging dir; commit renames —
the same all-or-nothing contract the reference builds by hand with HDFS state
files). ``partition_by_bucket`` gives the per-time-bucket directory layout
(`.write.partitionBy`) that the reference approximates with
bucket→reducer routing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import ConfigError
from ..spec import SinkSpec


def _merge_file_sink(df: DataFrame, spec: SinkSpec) -> None:
    """SCD1 upsert into a file sink: latest version per ``merge_key`` wins,
    ordered by ``merge_order``; the incoming batch beats the stored state on
    order ties (re-loading the same batch is idempotent).

    Scale shape: one scan of the stored state + one of the batch, a single
    ``max(struct(order..., generation, payload...))`` aggregate keyed on the
    merge key — map-side combinable, exchange carries one row per key — then
    a full rewrite via staging-directory swap. Payload columns ride in the
    comparator as final deterministic tie-breakers, so they must be
    orderable types (no map columns in merge mode). A table-format sink
    (Delta/Iceberg MERGE) replaces the swap in deployments that need
    row-level commits; the keyed-argmax plan is identical.
    """
    import os
    import shutil

    spark = df.sparkSession
    path = spec.path
    local = path[7:] if path.startswith("file://") else path
    exists = os.path.exists(local)
    keys = list(spec.merge_key)
    order = list(spec.merge_order)

    new = df.withColumn("__gen", F.lit(1))
    if exists:
        old = spark.read.format(spec.type).load(path).withColumn("__gen", F.lit(0))
        both = old.unionByName(new, allowMissingColumns=True)
    else:
        both = new
    payload = [c for c in both.columns if c not in keys and c != "__gen"]
    for c in order:
        if c not in payload:
            raise ConfigError(f"merge_order column {c!r} missing from the data")
    ride = [c for c in payload if c not in order]
    merged = (
        both.groupBy(*keys)
        .agg(
            F.max(
                F.struct(*order, F.col("__gen"), *ride)
            ).alias("m")
        )
        .select(*keys, *[F.col(f"m.{c}").alias(c) for c in payload])
    )
    if not exists:
        merged.write.mode("overwrite").format(spec.type).save(path)
        return
    # the plan reads the files it must replace: materialize into a staging
    # dir first, then swap (directory rename — the file-sink stand-in for a
    # table format's atomic commit)
    staging = local.rstrip("/") + ".__merge_staging__"
    shutil.rmtree(staging, ignore_errors=True)
    merged.write.mode("overwrite").format(spec.type).save(staging)
    old_dir = local.rstrip("/") + ".__merge_old__"
    shutil.rmtree(old_dir, ignore_errors=True)
    os.rename(local, old_dir)
    os.rename(staging, local)
    shutil.rmtree(old_dir, ignore_errors=True)


def write_sink(df: DataFrame, spec: SinkSpec, bucket_col: str | None = None) -> None:
    if spec.type == "null":
        # still execute the plan (reference NullOutputFormat still runs tasks)
        df.write.format("noop").mode("overwrite").save()
        return
    if spec.type == "memory":
        df.createOrReplaceTempView(spec.options.get("view", "pipeline_out"))
        return
    if spec.mode == "merge":
        _merge_file_sink(df, spec)
        return
    opts = dict(spec.options)
    if spec.type == "csv":
        # quote/escape default to the reference formatter's ('"'/'"',
        # embulk_mapred_config.yml:44-50); Spark's writer default escape is
        # backslash, which the engine's own csv SOURCE (also '"'-escape, like
        # the reference parser) could not read back
        opts = {
            "header": True,
            "quote": '"',
            "escape": '"',
            "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
            **opts,
        }
        # reference csv FORMATTER options (embulk_mapred_config.yml:42-50)
        # → spark writer options; symbolic newline (CRLF|LF|CR) becomes the
        # literal separator
        from ..sources.readers import NEWLINE_LITERALS

        for ref_key, spark_key in (
            ("charset", "encoding"),
            ("newline", "lineSep"),
            ("delimiter", "sep"),
            ("null_string", "nullValue"),
        ):
            if ref_key in opts:
                opts[spark_key] = opts.pop(ref_key)
        if "lineSep" in opts:
            opts["lineSep"] = NEWLINE_LITERALS.get(
                str(opts["lineSep"]).upper(), opts["lineSep"]
            )
    if spec.sort_by and spec.type != "table":
        # per-file clustering for data skipping: sorting WITHIN write
        # partitions (no extra exchange) makes each parquet/orc row group's
        # min/max stats selective on the sort keys, so later scans with
        # predicates on those columns prune row groups instead of reading
        # them — the cheap half of Z-ordering, free at write time
        df = df.sortWithinPartitions(*spec.sort_by)
    writer = df.write.mode(spec.mode).options(**opts)
    if spec.partition_overwrite == "dynamic":
        # overwrite replaces ONLY the partitions present in this batch —
        # idempotent re-load of one day rewrites that day's directories and
        # leaves every other bucket untouched (per-write option, not a
        # session-global conf)
        writer = writer.option("partitionOverwriteMode", "dynamic")
    part_cols = list(spec.partition_by)
    if spec.partition_by_bucket:
        if not bucket_col:
            raise ConfigError("partition_by_bucket requires a partitioning block")
        part_cols = [bucket_col, *part_cols]
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    if spec.type == "table":
        # managed (optionally hash-BUCKETED) table: two tables bucketed by the
        # same key and count join with ZERO exchanges — the co-located-join
        # layout for repeated large joins at 100 TB (Spark reads each bucket
        # pair as one task; bucket metadata lives in the catalog)
        if spec.mode == "overwrite":
            # the in-memory catalog forgets tables between sessions but their
            # warehouse locations persist; a stale location fails CREATE with
            # LOCATION_ALREADY_EXISTS — drop both for overwrite semantics
            import shutil
            from urllib.parse import urlparse

            session = df.sparkSession
            session.sql(f"DROP TABLE IF EXISTS {spec.table}")
            wh = urlparse(session.conf.get("spark.sql.warehouse.dir", "")).path
            if wh and "." not in spec.table:
                shutil.rmtree(f"{wh}/{spec.table.lower()}", ignore_errors=True)
        if spec.bucket_by:
            writer = writer.bucketBy(spec.buckets, *spec.bucket_by)
            if spec.sort_by:
                writer = writer.sortBy(*spec.sort_by)
        writer.format(spec.options.get("format", "parquet")).saveAsTable(spec.table)
        return
    if spec.type == "parquet":
        writer.parquet(spec.path)
    elif spec.type == "csv":
        writer.csv(spec.path)
    elif spec.type == "json":
        writer.json(spec.path)
    elif spec.type == "orc":
        writer.orc(spec.path)
    else:
        raise ConfigError(f"unknown sink type {spec.type!r}")

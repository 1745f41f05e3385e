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


#: internal partition column for merge-state bucketing; functionally
#: determined by the merge key, never user data
MERGE_BUCKET_COL = "__mb"


def _recover_merge_backup(local: str, backup: str) -> None:
    """Crash recovery for the merge swap: any bucket directory stranded in
    the backup dir whose live counterpart is MISSING was mid-swap when a
    previous run died — restore it before merging (a leftover whose live dir
    exists was already replaced and is safe to discard). A backup with no
    live dir at all is the legacy whole-directory swap's crash window —
    restore wholesale. Without this, a crash between the two renames left
    the dataset invisible and the next run silently deleted the only copy
    (ADVICE r2)."""
    import os
    import shutil

    if not os.path.exists(backup):
        return
    if not os.path.exists(local):
        os.rename(backup, local)
        return
    for name in os.listdir(backup):
        if name.startswith(f"{MERGE_BUCKET_COL}="):
            live_dir = os.path.join(local, name)
            if not os.path.exists(live_dir):
                os.rename(os.path.join(backup, name), live_dir)
    shutil.rmtree(backup, ignore_errors=True)


def _merge_file_sink(df: DataFrame, spec: SinkSpec) -> None:
    """SCD1 upsert into a file sink: latest version per ``merge_key`` wins,
    ordered by ``merge_order``; the incoming batch beats the stored state on
    order ties (re-loading the same batch is idempotent).

    Scale shape — BUCKET-PRUNED: the state lives in
    ``__mb=pmod(xxhash64(merge_key), merge_buckets)`` partition directories.
    A merge batch (1) computes the distinct bucket ids its keys touch — at
    most ``merge_buckets`` values, corpus-independent, so the driver-side
    collect is bounded by config, not data; (2) reads ONLY those partitions
    of the stored state (Catalyst partition pruning — untouched buckets are
    never opened); (3) applies one ``max(struct(order..., generation,
    payload...))`` aggregate keyed on the merge key — map-side combinable,
    exchange carries one row per key IN THE TOUCHED BUCKETS; (4) writes the
    merged buckets to staging and swaps only those bucket directories.
    Untouched buckets are byte-identical after the merge (e2e-tested), so
    per-batch cost is O(state-in-touched-buckets), not O(total state) — the
    round-2 full-rewrite design was the repo's last O(state)-per-batch
    path. Payload columns ride in the comparator as final deterministic
    tie-breakers, so they must be orderable types (no map columns in merge
    mode). A table-format sink (Delta/Iceberg MERGE) replaces the directory
    swap in deployments that need row-level commits; the keyed-argmax +
    pruned-rewrite plan is identical.

    Pre-bucketed-era state (no ``__mb=`` directories) is migrated in place:
    one full merge-and-rewrite into the bucketed layout, then every later
    batch prunes. A batch that INTRODUCES new columns likewise forces one
    full rewrite (schema evolution = migration) so all state files share a
    fused schema and plain readers need no ``mergeSchema``.
    """
    import os
    import shutil

    spark = df.sparkSession
    path = spec.path
    local = path[7:] if path.startswith("file://") else path
    keys = list(spec.merge_key)
    order = list(spec.merge_order)
    backup = local.rstrip("/") + ".__merge_old__"
    staging = local.rstrip("/") + ".__merge_staging__"
    _recover_merge_backup(local, backup)
    exists = os.path.exists(local)
    bucketed = exists and any(
        n.startswith(f"{MERGE_BUCKET_COL}=") for n in os.listdir(local)
    )

    mb = F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(spec.merge_buckets)).cast(
        "int"
    )
    new = df.withColumn("__gen", F.lit(1))
    touched: list[int] | None = None
    if exists:
        old = spark.read.format(spec.type).load(path)
        # a batch that INTRODUCES columns forces a one-time full rewrite so
        # every state file keeps one fused schema (readers need no
        # mergeSchema); steady-state batches — the 100 TB hot path — prune
        evolves = bool(set(df.columns) - set(old.columns))
        if bucketed and not evolves:
            # ≤ merge_buckets rows — bounded by CONFIG, never by data size
            touched = sorted(
                r.b for r in df.select(mb.alias("b")).distinct().collect()
            )
            old = old.filter(F.col(MERGE_BUCKET_COL).isin(touched))
        old = old.drop(MERGE_BUCKET_COL).withColumn("__gen", F.lit(0))
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
        .withColumn(MERGE_BUCKET_COL, mb)
    )
    if not exists:
        merged.write.mode("overwrite").format(spec.type).partitionBy(
            MERGE_BUCKET_COL
        ).save(path)
        return
    # the plan reads files it must replace: materialize into a staging dir,
    # then swap directories (the file-sink stand-in for a table format's
    # atomic commit)
    shutil.rmtree(staging, ignore_errors=True)
    merged.write.mode("overwrite").format(spec.type).partitionBy(
        MERGE_BUCKET_COL
    ).save(staging)
    if touched is None:
        # legacy unbucketed state: one-time whole-directory migration swap
        os.rename(local, backup)
        os.rename(staging, local)
        shutil.rmtree(backup, ignore_errors=True)
    else:
        # swap ONLY the touched bucket directories; everything else is
        # never renamed, rewritten, or even opened
        os.makedirs(backup, exist_ok=True)
        for b in touched:
            part = f"{MERGE_BUCKET_COL}={b}"
            live_dir = os.path.join(local, part)
            stage_dir = os.path.join(staging, part)
            if os.path.exists(live_dir):
                os.rename(live_dir, os.path.join(backup, part))
            if os.path.exists(stage_dir):
                os.rename(stage_dir, live_dir)
        shutil.rmtree(backup, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)


def dedup_corpus_sink_fn(spec: SinkSpec):
    """Build the per-batch body for a ``dedup_corpus`` sink from its spec —
    shared by the batch path (one ingestion unit, ``options.batch_tag``) and
    the streaming path (real micro-batch ids): corpus appends land in
    batch-scoped idempotent dirs, the dedup state merges bucket-pruned, and
    the claim column makes retries exactly-once (see
    ``streaming/ingest.incremental_dedup_sink`` /
    ``incremental_neardup_sink``). Distinct pipelines feeding ONE corpus
    must use disjoint batch_tag/checkpoint namespaces — claims collide
    otherwise."""
    from ..streaming.ingest import (
        incremental_dedup_sink,
        incremental_neardup_sink,
    )

    o = spec.options
    kwargs = dict(
        text_col=str(o.get("text_column", "text")),
        id_col=str(o.get("id_column", "doc_id")),
        merge_buckets=int(o.get("merge_buckets", 64)),
    )
    if o.get("near"):
        kwargs["min_matches"] = int(o.get("min_matches", 12))
        return incremental_neardup_sink(str(o["state"]), spec.path, **kwargs)
    return incremental_dedup_sink(str(o["state"]), spec.path, **kwargs)


def write_sink(df: DataFrame, spec: SinkSpec, bucket_col: str | None = None) -> None:
    if spec.type == "dedup_corpus":
        dedup_corpus_sink_fn(spec)(df, int(spec.options.get("batch_tag", 0)))
        return
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
            # Spark's csv WRITER trims leading/trailing whitespace by
            # default (Univocity write-side flags) — silent value
            # corruption the reference formatter does not do
            "ignoreLeadingWhiteSpace": False,
            "ignoreTrailingWhiteSpace": False,
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
        # reference csv formatter per-column timestamp OUTPUT formats
        # (column_options: {col: {format: '%Y-%m-%d %H:%M:%S'}},
        # embulk_mapred_config.yml:47-50). Spark's writer has one global
        # timestampFormat, so per-column formats are applied as explicit
        # date_format projections before the write — the exact mirror of the
        # source side's per-column parse (_apply_column_formats).
        col_opts = opts.pop("column_options", None)
        if col_opts:
            from ..sources.readers import _strptime_to_java

            for name, co in dict(col_opts).items():
                fmt = co.get("format") if isinstance(co, dict) else co
                if not fmt:
                    continue
                if name not in df.columns:
                    raise ConfigError(
                        f"column_options names unknown column {name!r}"
                    )
                df = df.withColumn(
                    name, F.date_format(F.col(name), _strptime_to_java(str(fmt)))
                )
    if spec.type == "xml":
        # Spark 4 native XML writer. rowTag/rootTag defaults pair with the
        # engine's xml SOURCE; timestampFormat carries microseconds so a
        # write→read roundtrip is lossless at TimestampType precision.
        opts = {
            "rowTag": "row",
            "rootTag": "rows",
            "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
            **opts,
        }
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
    elif spec.type == "xml":
        writer.format("xml").save(spec.path)
    else:
        raise ConfigError(f"unknown sink type {spec.type!r}")

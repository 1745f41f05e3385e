"""CDC-style change feed between committed merge-sink versions.

The merge sink (``sinks/writer.py``, reference O10 extended: SCD1 upsert
with pointer-committed immutable version trees) already gives time travel —
``read_merge_state(version=N)`` — because every retained manifest is a
complete bucket map. This module adds the warehouse feature built on top of
that contract in public systems (Delta Lake's Change Data Feed, Iceberg's
changelog scan): ``table_changes(from_version, to_version)`` emits the rows
that differ between two committed snapshots, tagged
``insert`` / ``delete`` / ``update_preimage`` / ``update_postimage``
(Delta CDF naming).

Spark-first, scale-first design:

* **Changed-bucket pruning.** A committed manifest reuses the previous
  version's directory for every untouched bucket, so two manifests diff in
  O(buckets) driver-side and only buckets whose directories CHANGED are
  read on either side. An increment that touched 3 of 4096 buckets reads 6
  bucket dirs total, not two full snapshots — the file-listing analog of
  partition pruning, and the property that makes a per-increment CDC feed
  viable on a 100 TB state.
* **One join.** The diff itself is a single full-outer join on the merge
  keys (both sides are bucket-subset reads sharing the sink's
  ``pmod(xxhash64(key), merge_buckets)`` layout) followed by an in-plan
  explode over literal structs — no driver-side row handling, output size
  O(changed rows).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .writer import (
    MERGE_BUCKET_COL,
    _load_manifest,
    _local,
    _manifest_path,
    _pointer_version,
)

CHANGE_TYPE_COL = "_change_type"
COMMIT_VERSION_COL = "_commit_version"


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Row-level diff of two key-unique snapshots: full-outer join on
    ``keys``, then per-row change classification. Rows identical on every
    column produce nothing; a changed row produces BOTH its
    ``update_preimage`` and ``update_postimage``. Output schema = snapshot
    schema + ``_change_type`` string."""
    cols = new.columns
    if old.columns != cols:
        raise ValueError(
            f"snapshot schemas differ: old={old.columns} new={cols} "
            "(the merge sink does not evolve schemas between versions)"
        )
    value_cols = [c for c in cols if c not in keys]
    # Presence is tracked by marker columns, NOT key nullability: the join
    # condition is eqNullSafe, so the merge sink's NULL-keyed rows match
    # across snapshots like any other key — a key-IS-NULL presence test
    # would misread them as absent (spurious inserts / lost deletes).
    in_o_col, in_n_col = "__cdc_in_o", "__cdc_in_n"
    if in_o_col in cols or in_n_col in cols:
        raise ValueError(f"snapshot columns collide with {in_o_col}/{in_n_col}")
    o = old.withColumn(in_o_col, F.lit(True)).alias("o")
    n = new.withColumn(in_n_col, F.lit(True)).alias("n")
    cond = [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in keys]
    joined = o.join(n, cond, "full_outer")

    def side(tag: str, prefix: str) -> F.Column:
        return F.struct(
            *[F.col(f"{prefix}.{c}").alias(c) for c in cols],
            F.lit(tag).alias(CHANGE_TYPE_COL),
        )

    in_old = F.col(f"o.{in_o_col}").isNotNull()
    in_new = F.col(f"n.{in_n_col}").isNotNull()
    differs = F.lit(False)
    for c in value_cols:
        differs = differs | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    # the no-change branch needs an empty array of the same struct type;
    # slicing a one-element literal array to length 0 keeps it in-plan
    changes = (
        F.when(~in_old, F.array(side("insert", "n")))
        .when(~in_new, F.array(side("delete", "o")))
        .when(
            differs,
            F.array(side("update_preimage", "o"), side("update_postimage", "n")),
        )
        .otherwise(F.slice(F.array(side("insert", "n")), 1, 0))
    )
    return joined.select(F.explode(changes).alias("r")).select("r.*")


def _pair_frames(
    spark: SparkSession,
    local: str,
    man_a: dict,
    man_b: dict,
    fmt: str,
    schema=None,
) -> tuple[DataFrame, DataFrame]:
    """(old, new) bucket-subset frames for one manifest pair: only buckets
    whose directories differ are listed or read on either side. ``schema``
    (optional) pins the read schema — required when a per-version feed
    reads schema-on-read formats, so every adjacent pair infers
    identically (see :func:`table_changes`)."""
    ba, bb = man_a["buckets"], man_b["buckets"]
    changed = sorted(b for b in set(ba) | set(bb) if ba.get(b) != bb.get(b))
    old_dirs = [os.path.join(local, ba[b]) for b in changed if b in ba]
    new_dirs = [os.path.join(local, bb[b]) for b in changed if b in bb]

    def _read(dirs):
        r = spark.read.format(fmt)
        return (r.schema(schema) if schema is not None else r).load(dirs)

    old = _read(old_dirs) if old_dirs else None
    new = _read(new_dirs) if new_dirs else None
    if old is None and new is None:
        # zero changed buckets: the feed is empty either way; schema from
        # ONE committed bucket dir (listing every bucket of a 4096-bucket
        # state just to infer a schema would defeat the O(changed buckets)
        # pruning story). An EMPTY committed state (a stream whose first
        # micro-batch had no rows) has manifests with zero buckets — no
        # schema exists anywhere to shape the feed, same contract as
        # read_merge_state.
        probe = bb or ba
        if not probe:
            raise FileNotFoundError(
                "merge state has no committed buckets to take the feed "
                "schema from"
            )
        one = next(iter(probe.values()))
        old = new = _read(os.path.join(local, one)).limit(0)
    elif old is None:
        # empty side built FROM the non-empty side's frame, not a separate
        # read (ADVICE r7): schema-on-read formats (csv/json via fmt) can
        # infer differently from a single-bucket probe than from the
        # multi-dir read, tripping snapshot_diff's schema-equality check or
        # silently changing types; limit(0) guarantees identical schemas
        old = new.limit(0)
    elif new is None:
        new = old.limit(0)
    return old.drop(MERGE_BUCKET_COL), new.drop(MERGE_BUCKET_COL)


def _pinned_schema(spark, local: str, manifests_newest_first, fmt: str, path: str):
    """(schema-or-None, full dir list of the newest manifest with buckets).

    The newest manifest with any committed buckets anchors the feed
    schema. Self-describing formats (parquet/ORC) need no pinned read
    schema (one bucket dir suffices as an empty-frame schema probe);
    schema-on-read formats (csv/json) DO — the diff reads different bucket
    subsets on each side (and, per-version, per pair), and independent
    inference could type the same column differently (all-null in one
    subset, populated or numeric-looking in another), breaking the join or
    the cross-pair union. For those, infer over the FULL snapshot, never
    one bucket dir: a json bucket whose rows are all null in a column
    writes no field for it, so a single-bucket probe would silently DROP
    the column feed-wide. One inference pass over the snapshot is the
    documented cost of running a CDC feed over a schema-less format."""
    for man in manifests_newest_first:
        b = man["buckets"]
        if b:
            dirs = [os.path.join(local, rel) for rel in b.values()]
            if fmt in ("parquet", "orc"):
                return None, dirs
            return spark.read.format(fmt).load(dirs).schema, dirs
    raise FileNotFoundError(
        f"merge state {path} has no committed buckets in the requested "
        "version range to take the feed schema from"
    )


def table_changes(
    spark: SparkSession,
    path: str,
    keys: list[str],
    from_version: int,
    to_version: int | None = None,
    fmt: str = "parquet",
    per_version: bool = False,
) -> DataFrame:
    """Change feed of a merge-sink state between two committed versions
    (both must still be retained — raise with the ``merge_keep_versions``
    hint otherwise, like ``read_merge_state``). ``keys`` are the sink's
    ``merge_key`` columns. Bucket membership is a pure function of the
    merge key, so rows for one key never straddle buckets and the manifest
    directory diff is a safe superset of the changed keys — unchanged
    buckets are never listed, let alone read.

    ``per_version=False`` (default) diffs the two ENDPOINT snapshots — a
    net feed: an update applied in v2 and reverted byte-identically in v3
    produces nothing in a v1→v3 feed, and rows carry no commit
    attribution. ``per_version=True`` emits one adjacent-pair diff per
    commit in ``(from_version, to_version]``, each tagged with the
    commit's version in ``_commit_version`` (Delta CDF's ``table_changes``
    semantics — VERDICT r8 item 3). Every retained manifest is a complete
    bucket map, so each pair still prunes to ITS OWN changed buckets; the
    total work is O(sum of per-commit changed buckets), which is exactly
    the data a per-commit consumer must see anyway. Requires every
    manifest in the range to still be retained."""
    local = _local(path)
    current = _pointer_version(local)
    if current is None:
        raise FileNotFoundError(
            f"{path} is a pre-pointer (legacy) state: no versions to diff"
        )
    to_v = current if to_version is None else to_version
    if from_version > to_v:
        raise ValueError(f"from_version {from_version} > to_version {to_v}")
    need = (
        range(from_version, to_v + 1) if per_version else (from_version, to_v)
    )
    for v in need:
        if not os.path.exists(_manifest_path(local, v)):
            raise FileNotFoundError(
                f"merge state {path} has no version {v} (current={current}; "
                "older snapshots are GC'd per the sink's merge_keep_versions "
                "retention"
                + (
                    "; per_version=True needs every manifest in the range)"
                    if per_version
                    else ")"
                )
            )
    if not per_version:
        man_from = _load_manifest(local, from_version)
        man_to = _load_manifest(local, to_v)
        schema, _ = _pinned_schema(spark, local, [man_to, man_from], fmt, path)
        old, new = _pair_frames(spark, local, man_from, man_to, fmt, schema)
        return snapshot_diff(old, new, list(keys))

    manifests = {
        v: _load_manifest(local, v) for v in range(from_version, to_v + 1)
    }
    schema, probe_dirs = _pinned_schema(
        spark,
        local,
        [manifests[v] for v in range(to_v, from_version - 1, -1)],
        fmt,
        path,
    )
    feeds = []
    for v in range(from_version + 1, to_v + 1):
        old, new = _pair_frames(
            spark, local, manifests[v - 1], manifests[v], fmt, schema
        )
        if COMMIT_VERSION_COL in new.columns:
            raise ValueError(
                f"snapshot columns collide with {COMMIT_VERSION_COL}"
            )
        feeds.append(
            snapshot_diff(old, new, list(keys)).withColumn(
                COMMIT_VERSION_COL, F.lit(v).cast("int")
            )
        )
    if not feeds:
        # from_version == to_version: empty feed with the full output
        # schema (pinned schema for schema-on-read formats; one bucket dir
        # is enough under self-describing formats)
        rdr = spark.read.format(fmt)
        if schema is not None:
            rdr = rdr.schema(schema)
        empty = rdr.load(probe_dirs[0]).limit(0).drop(MERGE_BUCKET_COL)
        if COMMIT_VERSION_COL in empty.columns:
            raise ValueError(
                f"snapshot columns collide with {COMMIT_VERSION_COL}"
            )
        return snapshot_diff(empty, empty, list(keys)).withColumn(
            COMMIT_VERSION_COL, F.lit(to_v).cast("int")
        )
    out = feeds[0]
    for f in feeds[1:]:
        out = out.unionByName(f)
    return out

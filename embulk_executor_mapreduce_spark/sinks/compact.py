"""Corpus compaction: the small-files answer for the streaming append path.

The exactly-once dedup loop (``streaming/ingest.py::incremental_dedup_sink``)
lands each micro-batch in its own ``ingest_batch=<id>`` partition directory —
idempotent under retry, but after 10k micro-batches the corpus is 10k tiny
directories, and at 100 TB the NameNode/listing cost and the
one-task-per-tiny-file scan overhead dominate. Compaction folds a bounded
prefix of batch directories into one generation directory with properly
sized files, without blocking the writer (which only ever appends NEW batch
ids above the compaction watermark).

Layout after n compactions::

    corpus/
      compacted=0/   part-*.parquet   (+ _consumed.json: {"through": 57, ...})
      compacted=1/   part-*.parquet   (+ _consumed.json: {"through": 112, ...})
      ingest_batch=113/  ...live, not yet compacted...

Rows inside a generation keep their original ``ingest_batch`` as a DATA
column (the dir-derived partition value is materialized before the rewrite),
so provenance survives compaction byte-for-byte.

Commit protocol (same staging-swap discipline as the merge sink):

1. read ``ingest_batch<=through`` dirs with the corpus ``basePath`` so the
   partition column materializes;
2. write rows + ``_consumed.json`` to ``.__compact_staging__``;
3. atomic rename staging → ``compacted=<gen>``  ← the commit point;
4. delete the consumed ``ingest_batch=*`` dirs.

A crash before (3) leaves only ignorable staging litter. A crash between
(3) and (4) leaves consumed dirs on disk alongside the generation that
absorbed them — :func:`recover_compaction` (run on entry by both
:func:`compact_corpus` and :func:`read_corpus`) finishes step (4) by
deleting any live dir at-or-below the committed watermark. Readers that go
through :func:`read_corpus` therefore never see a duplicate row in any
interleaving; raw-path readers are safe except inside that one crash
window, which the next read/compact closes.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BATCH_RE = re.compile(r"^ingest_batch=(\d+)$")
_GEN_RE = re.compile(r"^compacted=(\d+)$")
_CONSUMED = "_consumed.json"
_STAGING = ".__compact_staging__"
#: sidecar at the corpus root recording "this deployment writes _SUCCESS
#: markers" the first time one is observed — the decision is per-deployment
#: and must not be re-inferred from whichever batch dirs happen to remain
#: after compaction (ADVICE r5)
_MARKERS_FLAG = "_MARKERS_ENABLED"


def _scan_layout(corpus: str) -> tuple[dict[int, Path], dict[int, Path]]:
    """(live batch dirs by id, generation dirs by gen)."""
    batches: dict[int, Path] = {}
    gens: dict[int, Path] = {}
    for d in Path(corpus).iterdir():
        if not d.is_dir():
            continue
        if m := _BATCH_RE.match(d.name):
            batches[int(m.group(1))] = d
        elif m := _GEN_RE.match(d.name):
            gens[int(m.group(1))] = d
    return batches, gens


def _watermark(gens: dict[int, Path]) -> int:
    """Highest committed consume-through batch id (-1 when no generation)."""
    wm = -1
    for d in gens.values():
        meta = d / _CONSUMED
        if meta.exists():
            wm = max(wm, json.loads(meta.read_text())["through"])
    return wm


def recover_compaction(corpus: str) -> list[int]:
    """Finish an interrupted commit: drop any live batch dir at-or-below the
    committed watermark (its rows already live in a generation), drop any
    generation dir already absorbed by a committed generation-merge (its
    ``merged_gens`` list names the victims — the gen-level analog of the
    watermark rule), and clear staging litter from a pre-commit crash.
    Returns the batch ids removed."""
    root = Path(corpus)
    if not root.is_dir():
        return []
    staging = root / _STAGING
    if staging.exists():
        shutil.rmtree(staging)
    batches, gens = _scan_layout(corpus)
    merged_away: set[int] = set()
    for d in gens.values():
        meta = d / _CONSUMED
        if meta.exists():
            merged_away.update(json.loads(meta.read_text()).get("merged_gens", ()))
    for g in sorted(merged_away):
        if g in gens:
            shutil.rmtree(gens[g])
            del gens[g]
    wm = _watermark(gens)
    removed = sorted(b for b in batches if b <= wm)
    for b in removed:
        shutil.rmtree(batches[b])
    return removed


def compact_corpus(
    spark: SparkSession,
    corpus: str,
    through: int | None = None,
    target_file_bytes: int = 512 * 1024 * 1024,
    max_generations: int | None = None,
) -> int | None:
    """Fold every live ``ingest_batch<=through`` dir (default: all but the
    highest, which a live writer may still be retrying) into one new
    ``compacted=<gen>`` directory. Returns the new generation id, or None if
    there was nothing to compact. When ``max_generations`` is set, runs
    :func:`compact_generations` afterwards so generation count stays bounded
    across many cycles.

    File sizing: output files target ``target_file_bytes`` of INPUT bytes
    (parquet-compressed sizes are close enough across a rewrite of the same
    data) via ``coalesce`` — a narrow, shuffle-free repack. 512 MiB default
    matches a sane HDFS/S3 scan-task size at 100 TB.
    """
    recover_compaction(corpus)
    batches, gens = _scan_layout(corpus)
    if through is None:
        through = max(batches, default=-1) - 1
    todo = {b: d for b, d in batches.items() if b <= through}
    if not todo:
        return None
    in_bytes = sum(
        f.stat().st_size for d in todo.values() for f in d.rglob("*.parquet")
    )
    n_files = max(1, -(-in_bytes // target_file_bytes))
    # basePath keeps ingest_batch as a (now data) column for provenance
    df: DataFrame = (
        spark.read.option("basePath", corpus)
        .parquet(*[str(d) for d in sorted(todo.values())])
        .select("*")  # materialize the partition column into the data
    )
    gen = max(gens, default=-1) + 1
    staging = Path(corpus) / _STAGING
    df.coalesce(n_files).write.mode("overwrite").parquet(str(staging))
    (staging / _CONSUMED).write_text(
        json.dumps({"through": max(todo), "batches": sorted(todo), "gen": gen})
    )
    os.rename(staging, Path(corpus) / f"compacted={gen}")  # commit point
    for d in todo.values():
        shutil.rmtree(d)
    if max_generations is not None:
        compact_generations(spark, corpus, max_generations, target_file_bytes)
    return gen


def compact_generations(
    spark: SparkSession,
    corpus: str,
    max_generations: int = 8,
    target_file_bytes: int = 512 * 1024 * 1024,
) -> int | None:
    """Fold the existing ``compacted=*`` generations into ONE new generation
    once their count exceeds ``max_generations`` — the second-order
    small-dirs problem: :func:`compact_corpus` bounds batch-dir count but
    emits one generation per call, so after many cycles the listing cost
    re-grows linearly in generations. Returns the new generation id, or
    None when at-or-under the threshold.

    Same staging-rename commit protocol as :func:`compact_corpus`; the
    ``_consumed.json`` of the merged generation carries ``merged_gens`` (the
    absorbed generation ids) so a crash between commit and cleanup is healed
    by :func:`recover_compaction` (any live gen named in another gen's
    ``merged_gens`` is a stale duplicate and is dropped). ``through`` is the
    max over the absorbed generations' watermarks, so batch-dir recovery and
    :func:`corpus_snapshot_id` are unaffected; ``ingest_batch`` is already a
    data column inside every generation, so snapshot reads
    (``as_of_batch``) return an identical multiset across the fold
    (e2e-tested). Input generations are read oldest-first so row groups stay
    approximately batch-clustered for the snapshot predicate's min/max
    pruning."""
    recover_compaction(corpus)
    _, gens = _scan_layout(corpus)
    if len(gens) <= max_generations:
        return None
    todo = dict(sorted(gens.items()))
    metas = [
        json.loads((d / _CONSUMED).read_text()) for d in todo.values()
    ]
    in_bytes = sum(
        f.stat().st_size for d in todo.values() for f in d.rglob("*.parquet")
    )
    n_files = max(1, -(-in_bytes // target_file_bytes))
    df: DataFrame = spark.read.parquet(
        *[str(todo[g]) for g in sorted(todo)]
    )
    gen = max(todo) + 1
    staging = Path(corpus) / _STAGING
    df.coalesce(n_files).write.mode("overwrite").parquet(str(staging))
    (staging / _CONSUMED).write_text(
        json.dumps(
            {
                "through": max(m["through"] for m in metas),
                "batches": sorted({b for m in metas for b in m.get("batches", ())}),
                "gen": gen,
                "merged_gens": sorted(todo),
            }
        )
    )
    os.rename(staging, Path(corpus) / f"compacted={gen}")  # commit point
    for d in todo.values():
        shutil.rmtree(d)
    return gen


def corpus_snapshot_id(corpus: str) -> int:
    """The corpus's current snapshot id = the highest ingest batch visible
    (live dir or absorbed into a committed generation). Record this when a
    training run starts; ``read_corpus(..., as_of_batch=id)`` reproduces
    the exact corpus later — the training-reproducibility contract. -1 on
    an empty corpus.

    Only COMMITTED live batch dirs count: the highest ``ingest_batch`` dir
    may be a mode=overwrite rewrite still in flight (or crashed pre-commit,
    awaiting retry replay), and pinning it would let a snapshot reference a
    partially-written directory. Spark's file committer drops ``_SUCCESS``
    exactly at job commit, so its presence is the commit marker.

    Deployments that disable success markers
    (``mapreduce.fileoutputcommitter.marksuccessfuljobs=false`` — common on
    object stores) would make that check exclude EVERY batch (ADVICE r4:
    silently pinning an older corpus than intended). Detection: markers are
    all-or-nothing per deployment, so if NO live batch dir carries
    ``_SUCCESS``, fall back to structural commit evidence — committed data
    files (``part-*``) present at the dir top level with no ``_temporary``
    staging subdir (task files only surface at job commit). When at least
    one dir does carry a marker, markers are enabled and their absence
    still means in-flight/crashed.

    The marker-mode decision is PERSISTED the first time a ``_SUCCESS`` is
    observed (sidecar ``_MARKERS_ENABLED`` at the corpus root), so it
    survives compaction absorbing every marker-bearing batch dir: without
    the sidecar, a scan on a marker-enabled deployment whose only remaining
    live dir is one in-flight batch would flip into the weaker structural
    fallback and could pin a partially-visible batch (ADVICE r5)."""
    root = Path(corpus)
    if not root.is_dir():
        return -1
    # Same crash-recovery entry discipline as read_corpus: the watermark
    # dominating stale consumed dirs must be an enforced invariant here,
    # not an accident of recovery having run elsewhere first.
    recover_compaction(corpus)
    batches, gens = _scan_layout(corpus)
    marker_flag = root / _MARKERS_FLAG
    markers_enabled = marker_flag.exists() or any(
        (d / "_SUCCESS").exists() for d in batches.values()
    )
    if markers_enabled and not marker_flag.exists():
        try:
            marker_flag.touch()
        except OSError:
            pass  # read-only corpus mount: fall back to per-scan inference
    if markers_enabled:
        committed = [b for b, d in batches.items() if (d / "_SUCCESS").exists()]
    else:
        committed = [
            b
            for b, d in batches.items()
            if not (d / "_temporary").exists()
            and any(
                p.name.startswith("part-") and not p.name.endswith(".crc")
                for p in d.iterdir()
            )
        ]
    return max(max(committed, default=-1), _watermark(gens))


def read_corpus(
    spark: SparkSession, corpus: str, as_of_batch: int | None = None
) -> DataFrame:
    """Uniform corpus view across generations and live batch dirs, with the
    ``ingest_batch`` provenance column in both; runs crash recovery first so
    no interleaving can surface a duplicate row.

    ``as_of_batch`` pins a reproducible snapshot: only rows ingested at or
    below that batch id. The corpus is append-only (the dedup loop never
    rewrites a landed row) and compaction is row-preserving with provenance
    intact, so the same ``as_of_batch`` returns the same multiset however
    many batches/compactions happen afterwards. Cost: on live dirs the
    predicate is partition pruning (ingest_batch is the dir key); inside a
    generation it rides parquet row-group min/max stats — compaction reads
    input dirs in batch order, so row groups stay batch-clustered.

    Generations and live dirs are read as two frames and unioned by name
    (one basePath over both would make partition inference see conflicting
    partition columns ``compacted`` vs ``ingest_batch``): in a generation
    ``ingest_batch`` is an ordinary data column; in a live dir it is the
    dir-derived partition value."""
    recover_compaction(corpus)
    batches, gens = _scan_layout(corpus)
    if not batches and not gens:
        raise FileNotFoundError(f"empty corpus: {corpus}")
    frames = []
    if gens:
        frames.append(
            spark.read.parquet(*[str(d) for d in sorted(gens.values())])
        )
    if batches:
        frames.append(
            spark.read.option("basePath", corpus)
            .parquet(*[str(d) for d in sorted(batches.values())])
        )
    df = frames[0]
    for other in frames[1:]:
        df = df.unionByName(other, allowMissingColumns=True)
    if as_of_batch is not None:
        df = df.filter(F.col("ingest_batch") <= as_of_batch)
    return df

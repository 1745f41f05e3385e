"""Benchmark harness: runs the headline catalog queries + the pipeline
shapes (ingest / partitioned load / skew / merge / pagerank / incremental
dedup) at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Queries execute via collect (small results) or a noop write (wide results) so
measured time is plan execution, not driver result shipping. Pipeline shapes
write real parquet to a tempdir (the commit protocol is part of the cost).

Measurement discipline (VERDICT r3: BENCH_r03 was contaminated by concurrent
machine load, entries read 3-5x slower than idle re-runs of unchanged code):

* LOADAVG GATE — before measuring, wait (bounded) for 1-min loadavg/ncpu to
  drop below a threshold; the JSON records loadavg at start/end plus a
  ``load_contaminated`` flag so a number taken on a busy machine can never
  masquerade as a regression signal again.
* BEST-OF-2 WARM — every entry runs twice and reports the min; the first
  run's times are recorded alongside under ``queries_first`` (first runs pay
  one-time Janino codegen compilation, a fixed per-JVM cost that amortizes
  to zero on a long-lived cluster). Rounds ≤3 recorded single runs — the
  ``methodology`` field marks the change for cross-round comparisons.
* TIME BUDGET — second runs are skipped (first run stands) once total bench
  wall-clock exceeds the budget, so the driver's timeout always gets its
  JSON line.
"""

from __future__ import annotations

import gc
import json
import os
import re
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from embulk_executor_mapreduce_spark import catalog  # noqa: E402
from embulk_executor_mapreduce_spark.plans.compiler import run_pipeline  # noqa: E402
from embulk_executor_mapreduce_spark.session import get_spark  # noqa: E402
from embulk_executor_mapreduce_spark.spec import load_spec  # noqa: E402

# headline catalog set: parity core + relational + training-data ops
HEADLINE = [
    "scan_project",
    "filter_chain",
    "bucket_hour",
    "q1_pricing_summary",
    "q3_segment_revenue",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "topk_orders_per_customer",
    "window_running_sum",
    "dedup_exact",
    "minhash_lsh_candidates",
    "minhash_lsh_128x16",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_pq_adc_topk",
    "ann_ivf_kmeans_topk",
    "ann_pq_kmeans_topk",
    "embedding_neardup",
    "text_fingerprint",
    "text_stats",
    "token_count_bpe",
    "asof_last_signup",
    "sessionize_events",
    "outer_join_customer_orders",
    "embedding_centroids",
    "gapfill_hourly",
    "window_frames_gauntlet",
    "multimodal_frames",
    "hash_sample_10pct",
    "line_dedup_c4",
    "pack_sequences",
    "vocab_topk",
    "tfidf_top_terms",
    # round 4 additions
    "semantic_dedup_embeddings",
    "semantic_dedup_two_level",
    "decontaminate_fuzzy",
    "quality_prune_per_source",
    # round 6: real stdlib decode roundtrips (pure-Python entropy decode is
    # the correctness path — these entries price it so a regression shows)
    "multimodal_decode_jpeg",
    "multimodal_decode_wav",
    "dup_span_scrub",
    "bpe_train_merges",
    # round 7 additions: constraint suite, audio analysis, CDC feed, URL
    # canonicalization — pricing the r6/r7 families so regressions show
    "dq_constraint_report",
    "audio_features_wav",
    "merge_table_changes",
    "url_canonical_dedup",
    # round 8 additions: exact-PSL registrable domain, clipping screen
    "url_registrable_psl",
    "audio_quality_screen",
    # round 10 additions: the two YAML front-door rows (the six remaining
    # stage types; the partitioned flagship with sink read-back)
    "spec_prep_pipeline",
    "spec_partitioned_pipeline",
    # round 11 additions: the declarative CDC source and the drift-check
    # pass over the persisted changelog. Both share one memoized 3-version
    # state build (catalog._cdc_three_version_state), so each entry prices
    # its own feature — the first CDC-family entry of the run pays the
    # build (same amortization story as b4d's untimed materialize)
    "spec_cdc_source_pipeline",
    "cdc_drift_report",
    # round 12 additions: the streaming CDC tail (version-tail loop with
    # exactly-once per-version partition overwrite; prices the whole
    # deliver-and-read-back path) and the VariantType json gauntlet
    "stream_cdc_tail",
    "json_variant_gauntlet",
    "spec_merge_state_read",
    # round 12 (cont.): bloom-bitmap runtime prefilter — prices the
    # build-probe-verify composite against the plain anti-join it replaces
    "bloom_prefilter_dedup",
    # round 12 (cont.): positional posting-list build — the corpus-search
    # structure; prices the explode + composite-key aggregate
    "inverted_index_postings",
    # round 12 (cont.): the anti_state YAML stage — prices the declarative
    # delta-vs-landed-state dedup (merge_state read + bitmap + verify join)
    "spec_anti_state_pipeline",
    # round 12 (cont.): positional phrase query (the index USE side)
    "phrase_search_postings",
    # round 12 (cont.): parser-plugin analogs — each prices a full engine
    # write→parse roundtrip (ltsv formatter+parser; text sink + regex parse)
    "ltsv_engine_roundtrip",
    "regex_parse_logs",
    # round 12 (cont.): Space-Saving heavy hitters — prices the two-pass
    # sketch+recount against the distinct-key-proportional groupBy it
    # replaces (vocab_topk is the comparable full-shuffle entry)
    "heavy_hitters_tokens",
    # round 12 (cont.): the FAISS-recipe composite (IVF probe → PQ-ADC →
    # exact re-rank) — prices the full serving path against its halves
    # (ann_ivf_topk / ann_pq_adc_topk are the comparables)
    "ann_ivf_pq_topk",
    # round 12 (cont.): JL sign-projection + projected-space top-k
    "embedding_random_projection",
    # round 12 (cont.): MMR diversity re-rank (greedy tail on tiny frames)
    "mmr_diverse_topk",
    # round 12 (cont.): embulk-guess analog — prices fixture write + the
    # fused try_cast counting aggregate
    "schema_guess_roundtrip",
    # round 12 (cont.): streaming parser ingest e2e (landing-dir tail →
    # codegen ltsv parse → exactly-once parquet sink → readback)
    "stream_parser_ingest",
    # round 13: the IVF-PQ index as persisted standing state — prices the
    # full train-once → two assign-only increments → probe-only search
    # path (ann_ivf_pq_topk is the inline-composite comparable)
    "ann_ivf_pq_incremental_state",
    # round 13: the SERVING path alone — index committed once (memoized;
    # first run pays it, best-of-2 keeps the probe-only second run), the
    # timed work is the literal-pushdown inverted-list read + ADC + rerank.
    # Read against ann_ivf_pq_topk: the gap is what the standing index buys
    "ann_ivf_pq_index_probe",
    # round 13: rational-IDF BM25 ranked retrieval — prices the
    # query-term-filtered tf aggregate + dl scan + TakeOrdered top-k
    "bm25_search_topk",
    # round 14: BM25 served probe-only from the persisted term-bucketed
    # postings (index committed once, memoized — first run pays it,
    # best-of-2 keeps the probe-only second run). Read against
    # bm25_search_topk: the gap is what the standing index buys a repeat
    # query — inverted-list bucket reads vs re-tokenizing the corpus
    "bm25_search_indexed",
    # round 14: keyed DELETE lifecycle — prices three merge commits
    # (seed / tombstone+upsert / re-insert) + the live read over the
    # shared memoized state; cdc_delete_feed prices its per-version
    # classification over the same state
    "merge_delete_state",
    "cdc_delete_feed",
    # round 14: CDC tail × postings index e2e (upstream 4-version build +
    # tail + per-increment postings/stats + probe — the full composition,
    # TIME_INCLUDES_BUILD like its ANN sibling)
    "stream_cdc_postings_ingest",
    # round 14: batch retrieval over the persisted index — 3 query term
    # sets in ONE probe (read against bm25_search_indexed: near-flat cost
    # per extra query is the point; decontamination scores thousands)
    "bm25_batch_search_indexed",
    # round 14: hybrid lexical+semantic RRF fusion (two top-k-bounded
    # inputs + a broadcast-sized fusion tail)
    "hybrid_rrf_search",
    # round 15: perceptual image near-dup — prices two real-PNG encode
    # passes + the Arrow decode/resize/dHash pass + the 4-band
    # self-equi-join + exact Hamming verify (never all-pairs)
    "image_dhash_neardup",
    # round 15: ANN maintenance lifecycle — build+assign+compact happen
    # on run 1 (memoized, TIME_INCLUDES_BUILD); the steady-state run
    # prices probe-only serving over the compacted state (read against
    # ann_ivf_pq_index_probe: compaction must not tax the serve path)
    "ann_index_compact_serve",
    # round 15: tombstone GC lifecycle — two merge commits + the purge
    # rewrite on run 1 (memoized); steady state prices the raw state read
    "merge_purge_tombstones",
    # round 15: hybrid RRF over the PERSISTED indexes — the production
    # serving shape (read against hybrid_rrf_search: the gap is two
    # full-corpus passes vs |terms| bucket reads + an nprobe index probe)
    "hybrid_rrf_search_indexed",
    # round 15: BATCHED hybrid — 3 queries fused in one pass (ONE union
    # postings probe + ONE multi-vector index probe + query-partitioned
    # fusion; read against hybrid_rrf_search_indexed: near-flat cost per
    # extra query is the point)
    "hybrid_rrf_batch_indexed",
    # round 16: pHash-banded near-dup — same fixture as image_dhash_neardup
    # but the DCT hash (read against it: the extra cost is the 32x32
    # resize + 2D DCT per image inside the same single Arrow pass)
    "image_phash_neardup",
    # round 16: incremental image near-dup — two crawl increments through
    # the persisted band index (two merge commits + two hash passes +
    # (band, bkey) state probes; TIME_INCLUDES_BUILD — fn() IS the work)
    "image_neardup_incremental_state",
    # round 16: CDC tail x image composition — upstream 3-version build +
    # tail + per-increment hash/dedup/state merge (the full wiring; read
    # against image_neardup_incremental_state: the gap is the upstream
    # merge commits + change-feed diffs the composition adds)
    "stream_cdc_image_ingest",
    # round 16: Lucene-IDF rank-level retrieval (read against
    # bm25_search_topk: same plan, ln vs rational idf + the k+1 gap guard)
    "bm25_lucene_rank",
]

SMALL_RESULT = {
    "q1_pricing_summary",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "bucket_hour",
    "minhash_lsh_candidates",
    "minhash_lsh_128x16",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_pq_adc_topk",
    "ann_ivf_kmeans_topk",
    "ann_pq_kmeans_topk",
    "embedding_neardup",
    "hash_sample_10pct",
    "semantic_dedup_embeddings",
    "semantic_dedup_two_level",
    "decontaminate_fuzzy",
    "quality_prune_per_source",
    "dq_constraint_report",
    "url_canonical_dedup",
    "url_registrable_psl",
    "audio_quality_screen",
    "json_variant_gauntlet",
    "ltsv_engine_roundtrip",
    "regex_parse_logs",
    "heavy_hitters_tokens",
    "ann_ivf_pq_topk",
    "embedding_random_projection",
    "mmr_diverse_topk",
    "schema_guess_roundtrip",
    "stream_parser_ingest",
    "ann_ivf_pq_incremental_state",
    "ann_ivf_pq_index_probe",
    "bm25_search_topk",
    "bm25_search_indexed",
    "merge_delete_state",
    "cdc_delete_feed",
    "stream_cdc_postings_ingest",
    "bm25_batch_search_indexed",
    "hybrid_rrf_search",
    "image_dhash_neardup",
    "ann_index_compact_serve",
    "merge_purge_tombstones",
    "hybrid_rrf_search_indexed",
    "hybrid_rrf_batch_indexed",
}

# queries whose fn() does EAGER work (k-means localCheckpoint iterations):
# start the clock before fn() so training cost is measured, not hidden in
# the excluded plan-build phase
TIME_INCLUDES_BUILD = {
    "ann_ivf_kmeans_topk",
    "ann_pq_kmeans_topk",
    "semantic_dedup_embeddings",
    "semantic_dedup_two_level",
    "bpe_train_merges",  # merge iterations localCheckpoint during fn()
    "merge_table_changes",  # fn() writes the two sink versions it diffs
    "spec_prep_pipeline",  # minhash_dedup's CC loop + benchmark stage write
    "spec_partitioned_pipeline",  # fn() runs the partitioned write it reads
    "stream_cdc_tail",  # fn() drives the version-tail loop it reads back
    "ltsv_engine_roundtrip",  # fn() writes the ltsv dataset it parses back
    "regex_parse_logs",  # fn() writes the log-line fixture it parses back
    "heavy_hitters_tokens",  # the operator is eager (miss-bound proof)
    "schema_guess_roundtrip",  # fn() writes the csv fixture + eager guess
    "stream_parser_ingest",  # fn() writes the landing dir + drives the stream
    "ann_ivf_pq_incremental_state",  # fn() persists artifacts + two sink merges
    "ann_ivf_pq_index_probe",  # eager probe collect; build memoized (run 1)
    "bm25_search_indexed",  # eager bucket-id resolve; build memoized (run 1)
    "bm25_batch_search_indexed",  # same memoized index + bucket-id resolve
    "merge_delete_state",  # fn() commits the three versions (memoized run 1)
    "cdc_delete_feed",  # per-version diff over the shared memoized state
    "stream_cdc_postings_ingest",  # fn() builds upstream + drives the tail
    "ann_index_compact_serve",  # build+assign+compact memoized on run 1
    "merge_purge_tombstones",  # two commits + purge rewrite memoized run 1
    "hybrid_rrf_search_indexed",  # both indexes memoized; eager probe ids
    "hybrid_rrf_batch_indexed",  # same memoized indexes; eager probe ids
    "image_neardup_incremental_state",  # fn() runs both increments + merges
    "stream_cdc_image_ingest",  # fn() builds upstream + drives the tail
    "bm25_lucene_rank",  # eager top-(k+1) collect for the rank-gap guard
}

# events.ts physical-encoding normalization, probed from the footer
# (the testdata generator has shipped nanos, NTZ-micros, and UTC-micros
# across rounds — catalog.events_ts_normalize_filters handles all three)
def _ts_normalize_filters(sf_dir: str) -> list[dict]:
    return catalog.events_ts_normalize_filters(sf_dir)


class _Recorder:
    """Best-of-2 with a wall-clock budget: every entry runs twice and the min
    is reported (``first`` keeps run 1); once the budget is spent, second
    runs are skipped so the driver's timeout always gets its JSON line.

    THIRD-RUN ESCAPE (r8): transient host stalls (writeback after a heavy
    preceding job, ContextCleaner bursts in a long-lived 60-entry session)
    were observed to cluster across CONSECUTIVE entries, slowing BOTH runs
    of an entry 3-6x — best-of-2 cannot absorb noise that covers the whole
    pair (an idle-host solo re-run of the same commit showed gapfill_hourly
    at 0.5 s where an affected bench pair read 4.1/3.1 s, with a different
    entry set affected on each full bench run). A third run after the
    gc.collect — by then the stall has usually passed — is taken when the
    pair is not trivially cheap AND the pair actually looks stalled: the
    best-of-2 regressed > PRIOR_STALL_RATIO over the same entry in the
    COMMITTED ``bench_detail.json`` (the sealed prior run, read before this
    run overwrites it; only consulted at the same sf), with the prior
    scaled up by ``prior_scale`` — the start drift probe's ratio against
    the pinned reference — so a host that is uniformly slower than the
    seal host does not look like a wall-to-wall stall. Entries with no
    same-sf prior get NO third run (r9, ADVICE r8): the old fallback
    (t2 >= 0.7·t1, "no warm-up improvement") is true for essentially every
    warmed steady-state entry, so every new entry above the cheap floor
    paid a guaranteed triple run on its first sealed appearance — and
    without a reference, steady state and double-stall are genuinely
    indistinguishable, so the extra run bought no signal. A new entry's
    first sealed number is best-of-2; from the next run on, the committed
    prior gates it like everyone else. Min of all runs is reported;
    ``third_run`` in the artifact lists the entries that needed it."""

    THIRD_RUN_MIN_SEC = 0.75
    PRIOR_STALL_RATIO = 1.3
    PROBE_EVERY = 10  # interleaved drift probes: one per this many entries

    def __init__(
        self,
        budget_sec: float = 420.0,
        prior: dict | None = None,
        prior_scale: float = 1.0,
        probe=None,
    ):
        self.t0 = time.time()
        self.budget = budget_sec
        self.prior = prior or {}
        # drift correction for the stall gate (r9 review): the sealed prior
        # was recorded on a possibly-faster host; uniform drift above the
        # stall ratio would otherwise third-run EVERY entry — the budget
        # waste the prior gate exists to prevent. Scaled UP only (never
        # below 1): a faster-than-reference host must not shrink priors and
        # fire the gate on entries that match their prior exactly.
        self.prior_scale = max(1.0, prior_scale)
        self.best: dict[str, float] = {}
        self.first: dict[str, float] = {}
        self.second_skipped: list[str] = []
        self.third_run: list[str] = []
        # interleaved drift probes (VERDICT r9 item 4): min-of-endpoints
        # normalization overcorrects when drift CHANGES mid-run (the r9
        # driver run probed 0.805 → 0.601 s, a 34% swing, and the whole run
        # was normalized by the fast point). ``probe()`` (when provided) is
        # re-run every PROBE_EVERY completed entries; ``probes`` collects
        # (completed-entry count, probe seconds) boundaries — main() seeds
        # the start point and appends the end point — and the total is
        # normalized PER SEGMENT between adjacent probes.
        self._probe = probe
        self.order: list[str] = []
        self.probes: list[tuple[int, float]] = []

    def record(self, name: str, run, rerun=None) -> None:
        if (
            self._probe is not None
            and self.order
            and len(self.order) % self.PROBE_EVERY == 0
            and time.time() - self.t0 < self.budget
        ):
            self.probes.append((len(self.order), self._probe()))
        self.order.append(name)
        t1 = run()
        self.first[name] = t1
        if time.time() - self.t0 >= self.budget:
            self.best[name] = round(t1, 3)
            self.second_skipped.append(name)
            gc.collect()
            return
        t2 = (rerun or run)()
        best = min(t1, t2)
        gc.collect()  # release py4j DF refs so ContextCleaner can drop
        # finished broadcasts/RDDs instead of accumulating across entries
        prior = self.prior.get(name)
        looks_stalled = (
            bool(prior)
            and best > self.PRIOR_STALL_RATIO * prior * self.prior_scale
        )
        if (
            best > self.THIRD_RUN_MIN_SEC
            and looks_stalled
            and time.time() - self.t0 < self.budget
        ):
            best = min(best, (rerun or run)())
            self.third_run.append(name)
            gc.collect()
        self.best[name] = round(best, 3)


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


# Host-drift probe (VERDICT r8 item 5): three same-day runs of identical
# code spanned 61.9-72.5 s at the r8 seal, drowning round-over-round
# signal under ~1.3x. A FIXED pure-CPU workload — whole-stage-codegen
# xxhash64 over spark.range, no I/O, no shuffle, sf-independent, untouched
# by any operator edit — is timed at the start and end of every bench run;
# its ratio against the pinned reference converts raw totals into
# drift-normalized ones. bit_xor (not sum) because the session runs ANSI
# and a 4B-row sum of hashes overflows BIGINT.
DRIFT_PROBE_ROWS = 4_000_000_000
# min-of-3 warm on a loadavg-clean host (0.05/cpu), 2026-08-15 r9 build
DRIFT_PROBE_REF_SEC = 0.70


def _drift_probe(spark) -> float:
    def once() -> float:
        t0 = time.time()
        spark.range(0, DRIFT_PROBE_ROWS, 1, 32).selectExpr(
            "bit_xor(xxhash64(id)) AS s"
        ).collect()
        return time.time() - t0

    return round(min(once() for _ in range(3)), 3)


def _segment_normalized_total(
    best: dict[str, float],
    order: list[str],
    probes: list[tuple[int, float]],
    ref: float = DRIFT_PROBE_REF_SEC,
) -> float:
    """Per-segment drift normalization (VERDICT r9 item 4): each entry's
    time is divided by its OWN segment's drift ratio — the mean of the two
    probe measurements bracketing it, over the pinned reference — instead
    of one min-of-endpoints ratio for the whole run. Intra-run drift (the
    r9 driver probed 0.805 s at start, 0.601 s at end) then normalizes each
    entry against the host speed it actually ran at; under genuinely
    uniform drift every segment has the same ratio and this reduces to the
    old single-ratio division. ``probes`` are (completed-entry count,
    probe seconds) boundaries, start and end included; entry i (1-based
    position in ``order``) belongs to the segment between the last
    boundary at position < i and the first at position >= i."""
    if not probes or not order:
        return round(sum(best.values()), 3)
    pts = sorted(probes)
    total = 0.0
    for i, name in enumerate(order, start=1):
        if name not in best:
            continue
        before = max((p for p in pts if p[0] < i), default=pts[0])
        after = min((p for p in pts if p[0] >= i), default=pts[-1])
        ratio = ((before[1] + after[1]) / 2.0) / ref
        total += best[name] / max(ratio, 0.01)
    return round(total, 3)


def _pipeline_benches(spark, sf_dir: str, tmp: str, rec: _Recorder) -> None:
    # B1 ingest: scan → identity → parquet sink (map-only, zero exchanges)
    def b1():
        return _timed(
            lambda: run_pipeline(
                spark,
                load_spec(
                    {
                        "in": {"type": "parquet", "path": f"{sf_dir}/lineitem.parquet"},
                        "out": {"type": "parquet", "path": f"{tmp}/b1"},
                    }
                ),
            )
        )

    rec.record("pipeline_ingest", b1)

    # B2 partitioned load: hour-bucket repartition → per-bucket layout
    def b2():
        return _timed(
            lambda: run_pipeline(
                spark,
                load_spec(
                    {
                        "in": {"type": "parquet", "path": f"{sf_dir}/events.parquet"},
                        "filters": _ts_normalize_filters(sf_dir),
                        "out": {"type": "parquet", "path": f"{tmp}/b2", "partition_by_bucket": True},
                        "exec": {
                            "reducers": 8,
                            "partitioning": {"column": "ts", "unit": "day"},
                        },
                    }
                ),
            )
        )

    rec.record("pipeline_partitioned", b2)

    # B3 skew: every event forced into ONE hour bucket; split=1 vs split=16
    for split, label in ((1, "pipeline_skew_nosplit"), (16, "pipeline_skew_split16")):

        def b3(split=split):
            return _timed(
                lambda: run_pipeline(
                    spark,
                    load_spec(
                        {
                            "in": {"type": "parquet", "path": f"{sf_dir}/events.parquet"},
                            "filters": _ts_normalize_filters(sf_dir)
                            + [
                                # collapse all timestamps into one hot hour
                                {"type": "with_column", "name": "ts", "expr": "timestamp '2024-01-01 00:00:00'"},
                            ],
                            "out": {"type": "parquet", "path": f"{tmp}/b3_{split}"},
                            "exec": {
                                "reducers": 16,
                                "partitioning": {
                                    "column": "ts",
                                    "unit": "hour",
                                    "map_side_partition_split": split,
                                },
                            },
                        }
                    ),
                )
            )

        rec.record(label, b3)

    # B4 merge sink: seed keyed state from orders, then merge ONE small batch
    # — the timed increment must cost O(touched buckets), not O(state)
    # (bucket-pruned rewrite; sink shapes were un-benched through round 2).
    # The batch carries ~9 keys: hash bucketing prunes when a batch touches
    # FEW keys (trickle upserts); a batch with ≥ merge_buckets distinct keys
    # necessarily touches every bucket — same pruning physics as lakehouse
    # MERGE file-skipping. Re-merging the same batch is idempotent (same
    # keys, same order key), so the second timed run measures the same
    # pruned-rewrite work.
    state = f"{tmp}/b4_state"
    seed_spec = {
        "in": {"type": "parquet", "path": f"{sf_dir}/orders.parquet"},
        "out": {
            "type": "parquet",
            "path": state,
            "mode": "merge",
            "merge_key": ["o_orderkey"],
            "merge_order": ["o_orderdate"],
        },
    }
    run_pipeline(spark, load_spec(seed_spec))  # seed: untimed full first write
    batch_src = f"{tmp}/b4_batch"
    spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        "o_orderkey % 16384 = 0"
    ).coalesce(1).write.mode("overwrite").parquet(batch_src)

    def b4():
        return _timed(
            lambda: run_pipeline(
                spark,
                load_spec({**seed_spec, "in": {"type": "parquet", "path": batch_src}}),
            )
        )

    rec.record("pipeline_merge_increment", b4)

    # B4a declarative corpus front door (r8): the training-data text stages
    # composed as pure YAML over the documents table — fingerprint + exact
    # content dedup, language gate, quality gate, PII scrub, per-source cap.
    # Every append stage is a struct-pack projection (zero exchanges); the
    # whole pipeline should price as ~2 shuffles (dedup + the cap window)
    # plus the parquet write.
    def b4a():
        return _timed(
            lambda: run_pipeline(
                spark,
                load_spec(
                    {
                        "in": {"type": "parquet", "path": f"{sf_dir}/documents.parquet"},
                        "filters": [
                            {"type": "fingerprint"},
                            {
                                "type": "dedup",
                                "columns": ["fingerprint"],
                                "order_by": ["doc_id"],
                            },
                            {"type": "language_id"},
                            {"type": "filter", "predicate": "lang_guess = lang"},
                            {"type": "quality_score"},
                            {"type": "filter", "predicate": "quality >= 0.4"},
                            {"type": "pii_scrub"},
                            {
                                "type": "sample_k_per_group",
                                "group_by": ["source"],
                                "k": 1000,
                                "hash_on": "doc_id",
                            },
                        ],
                        "out": {"type": "parquet", "path": f"{tmp}/b4a"},
                    }
                ),
            )
        )

    rec.record("pipeline_front_door", b4a)

    # B4b CDC feed priced ALONE (VERDICT r7 item 5): the headline
    # merge_table_changes entry builds two sink versions inside its timed
    # run, conflating write cost with read cost. Here a 2-version state is
    # committed UNTIMED — v0 = the full orders seed, v1 = the ~9-key batch
    # with o_totalprice bumped (merge_order ties go to the incoming batch,
    # so the mutation lands) — and the timed run is table_changes only:
    # manifest diff + changed-bucket subset reads + one full-outer join,
    # the steady-state per-increment cost of the feed.
    from pyspark.sql import functions as F

    from embulk_executor_mapreduce_spark.sinks.changes import table_changes

    cdc_state = f"{tmp}/b4b_state"
    cdc_spec = {**seed_spec, "out": {**seed_spec["out"], "path": cdc_state}}
    run_pipeline(spark, load_spec(cdc_spec))  # v0, untimed
    mut_src = f"{tmp}/b4b_batch"
    batch_df = spark.read.parquet(batch_src)
    price_t = dict(batch_df.dtypes)["o_totalprice"]
    batch_df.withColumn(
        "o_totalprice", F.expr(f"CAST(o_totalprice + 1 AS {price_t})")
    ).write.mode("overwrite").parquet(mut_src)
    run_pipeline(
        spark,
        load_spec({**cdc_spec, "in": {"type": "parquet", "path": mut_src}}),
    )  # v1, untimed

    def b4b():
        return _timed(
            lambda: table_changes(
                spark, cdc_state, ["o_orderkey"], from_version=0, to_version=1
            ).collect()
        )

    rec.record("cdc_table_changes_diff", b4b)

    # B4c per-version CDC priced alone (r9): a 3-version state is committed
    # UNTIMED (keep=3 so the whole range is retained), the timed run emits
    # BOTH adjacent-pair diffs tagged _commit_version — two manifest diffs,
    # two changed-bucket subset reads, two joins, one union. Steady-state
    # cost of a per-commit consumer catching up across commits.
    pv_state = f"{tmp}/b4c_state"
    pv_spec = {
        **seed_spec,
        "out": {
            **seed_spec["out"],
            "path": pv_state,
            "merge_keep_versions": 3,
        },
    }
    run_pipeline(spark, load_spec(pv_spec))  # v0, untimed
    mut2_src = f"{tmp}/b4c_batch2"
    batch_df.withColumn(
        "o_totalprice", F.expr(f"CAST(o_totalprice + 2 AS {price_t})")
    ).write.mode("overwrite").parquet(mut2_src)
    run_pipeline(
        spark, load_spec({**pv_spec, "in": {"type": "parquet", "path": mut_src}})
    )  # v1, untimed
    run_pipeline(
        spark, load_spec({**pv_spec, "in": {"type": "parquet", "path": mut2_src}})
    )  # v2, untimed

    def b4c():
        # use_changelog=False BY CONSTRUCTION (ADVICE r10): this entry
        # prices the pair-diff RECOMPUTE; the default (auto) would silently
        # serve the changelog if any ordering change put b4d's materialize
        # before this runs, collapsing the b4c-vs-b4d comparison.
        return _timed(
            lambda: table_changes(
                spark,
                pv_state,
                ["o_orderkey"],
                from_version=0,
                to_version=2,
                per_version=True,
                use_changelog=False,
            ).collect()
        )

    rec.record("cdc_per_version_diff", b4c)

    # B4d the SAME per-version feed served from the persisted changelog
    # (r10): materialize_changes writes both commits' change files UNTIMED
    # (the one-time cost a changelog consumer amortizes over every read),
    # the timed run is the pure pruned parquet scan — zero joins, no
    # manifest-pair recompute. Read alongside cdc_per_version_diff, the gap
    # is exactly what persistence buys a repeat consumer.
    from embulk_executor_mapreduce_spark.sinks.changes import (
        materialize_changes,
    )

    materialize_changes(spark, pv_state, ["o_orderkey"])  # untimed

    def b4d():
        return _timed(
            lambda: table_changes(
                spark,
                pv_state,
                ["o_orderkey"],
                from_version=0,
                to_version=2,
                per_version=True,
                use_changelog=True,
            ).collect()
        )

    rec.record("cdc_persisted_diff", b4d)

    # B5 link-graph centrality: integer PageRank over the event-transition
    # graph (per-user lag window over the full events table feeds a ~100-node
    # edge list; 5 eager iterations). Clock starts BEFORE the call — the
    # localCheckpoint iterations are the work.
    from embulk_executor_mapreduce_spark.catalog import load
    from embulk_executor_mapreduce_spark.operators.graph import (
        event_transition_edges,
        pagerank,
    )

    def b5():
        return _timed(
            lambda: pagerank(
                event_transition_edges(load(spark, sf_dir, "events")), iters=5
            ).collect()
        )

    rec.record("graph_pagerank_events", b5)

    # B5b the same 5 iterations over a PRE-BUCKETED edge table (r5): the
    # timed run INCLUDES the one-time bucketed write — at 5 iterations the
    # per-iteration shuffle-free joins already amortize it, and steady state
    # (many runs over one written table) only improves. Table names are
    # uuid-unique per write (ADVICE r5) — track them for reuse + cleanup.
    from embulk_executor_mapreduce_spark.operators.graph import (
        drop_bucketed_edges,
        write_bucketed_edges,
    )

    pr_tables: list[str] = []

    def b5b():
        def run():
            name = write_bucketed_edges(
                event_transition_edges(load(spark, sf_dir, "events")),
                "bench_pr_edges",
                buckets=8,
            )
            pr_tables.append(name)
            return pagerank(spark.table(name), edges_distinct=True, iters=5).collect()

        return _timed(run)

    rec.record("graph_pagerank_bucketed", b5b)

    # B5c steady state: the table b5b just wrote is REUSED — iterations
    # only, no write (the per-run number for a standing edge table, the
    # analog of the ann_*_assign entries)
    def b5c():
        return _timed(
            lambda: pagerank(
                spark.table(pr_tables[-1]), edges_distinct=True, iters=5
            ).collect()
        )

    rec.record("graph_pagerank_bucketed_reuse", b5c)
    for name in pr_tables:
        drop_bucketed_edges(spark, name)

    # B6 incremental near-dup increment: seed a MinHash band index from the
    # first half of documents (untimed), then time ONE batch of the second
    # half deduping against it through the bucket-pruned merge sink — the
    # steady-state cost of the continuous-crawl loop. The second timed run
    # uses a DIFFERENT 200-doc batch: re-running the same batch would find
    # zero novel docs (its signatures are in the index by then) and
    # under-measure the write half of the increment.
    from embulk_executor_mapreduce_spark.operators.dedup import (
        incremental_minhash_dedup,
    )
    from embulk_executor_mapreduce_spark.sinks.writer import (
        read_merge_state,
        write_sink,
    )
    from embulk_executor_mapreduce_spark.spec import SinkSpec

    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    index = f"{tmp}/b6_index"
    sink = SinkSpec(
        type="parquet",
        path=index,
        mode="merge",
        merge_key=("doc_id", "band"),
        merge_order=("band_key",),
        merge_buckets=16,
    )
    _, seed_delta = incremental_minhash_dedup(
        docs.filter(f"doc_id < {n_docs // 2}"), None, "text", "doc_id"
    )
    write_sink(seed_delta, sink)  # untimed seeding

    def b6(lo_off=0):
        lo = n_docs // 2 + lo_off

        def body():
            batch = docs.filter(f"doc_id >= {lo} AND doc_id < {lo + 200}")
            novel, delta = incremental_minhash_dedup(
                batch, read_merge_state(spark, index), "text", "doc_id"
            )
            novel.write.format("noop").mode("overwrite").save()
            write_sink(delta, sink)

        return _timed(body)

    rec.record("dedup_incremental_minhash", b6, rerun=lambda: b6(lo_off=200))

    # B7/B8 steady-state trained ANN (VERDICT r3 item 6): at 100 TB training
    # is a rare offline job — the number that matters is assignment + probe
    # against a PERSISTED centroid/codebook table. Train once untimed with
    # the same parameters as the ann_*_kmeans_topk entries, save, then time
    # search-only against the saved table (TIME_INCLUDES_BUILD entries keep
    # reporting the train+search total alongside).
    from embulk_executor_mapreduce_spark.operators.similarity import (
        as_double,
        dot,
        ivf_topk,
        kmeans_train,
        pq_adc_topk,
    )
    from pyspark.sql import functions as F

    emb = load(spark, sf_dir, "embeddings")
    base = emb.select(F.col("vec_id"), as_double("embedding").alias("v")).withColumn(
        "nrm", F.sqrt(dot(F.col("v"), F.col("v")))
    )
    cent_path = f"{tmp}/b7_centroids"
    kmeans_train(base, "vec_id", "v", k=64, iters=3).write.parquet(cent_path)

    def b7():
        return _timed(
            lambda: ivf_topk(
                emb, centroids=spark.read.parquet(cent_path)
            ).collect()
        )

    rec.record("ann_ivf_kmeans_topk_assign", b7)

    n_sub, sub_dim = 4, 16
    subs = base.select(
        "vec_id",
        F.explode(F.array(*[F.lit(s) for s in range(n_sub)])).alias("s"),
        "v",
    ).select(
        "vec_id", "s", F.slice(F.col("v"), F.col("s") * sub_dim + 1, sub_dim).alias("sv")
    )
    cb_path = f"{tmp}/b8_codebook"
    kmeans_train(subs, "vec_id", "sv", k=16, iters=3, group_cols=("s",)).select(
        "s", F.col("cid").alias("code"), "cv"
    ).write.parquet(cb_path)

    def b8():
        return _timed(
            lambda: pq_adc_topk(
                emb, codebook=spark.read.parquet(cb_path)
            ).collect()
        )

    rec.record("ann_pq_kmeans_topk_assign", b8)

    # B9 steady-state SEMANTIC dedup: centroids trained once (untimed,
    # persisted) — the timed run is assignment + within-corpus first-wins
    # dedup against the stored table, the per-increment cost of the
    # incremental loop (train-inclusive numbers stay in the headline set)
    from embulk_executor_mapreduce_spark.operators.dedup import (
        incremental_semantic_dedup,
    )

    sem_cents = f"{tmp}/b9_centroids"
    kmeans_train(base, "vec_id", "v", k=16, iters=2).write.parquet(sem_cents)

    def b9():
        def body():
            novel, _delta, _t = incremental_semantic_dedup(
                emb, None, spark.read.parquet(sem_cents)
            )
            novel.write.format("noop").mode("overwrite").save()

        return _timed(body)

    rec.record("semantic_dedup_assign", b9)


#: 1-min loadavg per cpu above which a measurement is considered
#: load-contaminated (an idle bench machine sits near 0; BENCH_r03's bad
#: entries were taken at multiples of this)
LOAD_THRESHOLD = 0.25
#: how long to wait (s) for a busy machine to drain before measuring anyway
LOAD_WAIT_MAX = 120.0


def _load_per_cpu() -> float:
    try:
        return os.getloadavg()[0] / (os.cpu_count() or 1)
    except OSError:  # platform without getloadavg
        return 0.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    # loadavg gate: refuse to measure on a visibly loaded machine for up to
    # LOAD_WAIT_MAX, then proceed but say so in the artifact
    load_wait = 0.0
    while _load_per_cpu() > LOAD_THRESHOLD and load_wait < LOAD_WAIT_MAX:
        time.sleep(10)
        load_wait += 10
    load_start = _load_per_cpu()

    spark = get_spark(app_name="bench")
    entries = catalog.entries()
    # the committed sealed run is the third-run escape's stall reference —
    # read it BEFORE this run overwrites the file, use it only at this sf
    prior_best: dict = {}
    try:
        _prior = json.loads(
            (Path(__file__).resolve().parent / "bench_detail.json").read_text()
        )
        if _prior.get("sf") == sf:
            prior_best = dict(_prior.get("queries") or {})
    except (OSError, ValueError):
        pass

    # the loadavg wait spends real wall-clock from the driver's timeout —
    # shrink the best-of-2 budget by what the gate consumed
    # the start probe runs BEFORE any entry, so the stall gate can judge
    # priors at this host's current speed rather than the seal host's
    probe_start = _drift_probe(spark)
    rec = _Recorder(
        budget_sec=max(180.0, 420.0 - load_wait),
        prior=prior_best,
        prior_scale=probe_start / DRIFT_PROBE_REF_SEC,
        probe=lambda: _drift_probe(spark),
    )
    rec.probes.append((0, probe_start))

    def run_once(name: str, e) -> float:
        if name in TIME_INCLUDES_BUILD:
            # eager-training entries (k-means localCheckpoint iterations):
            # the clock starts BEFORE fn() so training cost is measured, not
            # hidden in the excluded plan-build phase
            t0 = time.time()
            df = e.fn(spark, sf_dir)
        else:
            df = e.fn(spark, sf_dir)  # plan build / analysis excluded
            t0 = time.time()
        if name in SMALL_RESULT:
            df.collect()
        else:
            df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    for name in HEADLINE:
        e = entries.get(name)
        if e is None:
            continue
        rec.record(name, lambda name=name, e=e: run_once(name, e))

    tmp = tempfile.mkdtemp(prefix="bench_pipelines_")
    try:
        _pipeline_benches(spark, sf_dir, tmp, rec)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    load_end = _load_per_cpu()
    probe_end = _drift_probe(spark)
    rec.probes.append((len(rec.order), probe_end))
    # unweighted mean of ALL probes (start + one per ~10 entries + end):
    # the single-number summary of host speed over this run — probes are
    # spaced by entry count, not wall-clock, so slow segments are not
    # overweighted; informational only. The old min-of-endpoints estimate
    # overcorrected under intra-run drift (r9: the driver's own run
    # normalized to 93.6 s where the builder's same-tree run normalized to
    # 73.5 s) — value_normalized is now the PER-SEGMENT sum from
    # _segment_normalized_total instead.
    drift_ratio = round(
        (sum(p[1] for p in rec.probes) / len(rec.probes)) / DRIFT_PROBE_REF_SEC,
        3,
    )
    total = round(sum(rec.best.values()), 3)
    total_normalized = _segment_normalized_total(rec.best, rec.order, rec.probes)
    detail = {
        "metric": "catalog_headline_total",
        "value": total,
        # per-entry times divided by their own probe segment's drift ratio.
        # INFORMATIONAL ONLY since r11 (VERDICT r10 item 5): the pure-CPU
        # probe systematically mis-scales I/O-heavy entries — on the r10
        # seal day two same-tree runs agreed on RAW within 2.1% while
        # normalized disagreed 14%, because the probe read the host 0.93 vs
        # 1.10 while the entries ran at identical speed. The DOCUMENTED
        # regression signal is per-entry raw A/Bs cross-checked against
        # module byte-identity (BASELINE.md "Reading the bench"): a real
        # regression shows as an outlier entry on changed code; uniform
        # ratio shifts on byte-identical code are host drift.
        "value_normalized": total_normalized,
        "value_normalized_informational": True,
        "drift_probe_sec": {
            "start": probe_start,
            "end": probe_end,
            "interleaved": [list(p) for p in rec.probes],
        },
        "drift_probe_ref_sec": DRIFT_PROBE_REF_SEC,
        "drift_ratio": drift_ratio,
        # ADVICE r9: a transient stall during the START probe inflates the
        # stall gate's prior scale for the whole run and silently suppresses
        # stall detection; surface it in the artifact when it looks wrong
        "prior_scale": round(rec.prior_scale, 3),
        "prior_scale_suspect": bool(rec.prior_scale > 2.0),
        "unit": "sec",
        "queries": rec.best,
        "queries_first": rec.first,
        "sf": sf,
        "ncpu": os.cpu_count(),
        # honest core reporting (r17, VERDICT r16 item 2): ncpu above is
        # the HOST's count and masks the effective cap — the driver's
        # 8-cpu run recorded ncpu: 32. These two record what the run
        # actually executed with.
        "spark_graft_cpus": os.environ.get("SPARK_GRAFT_CPUS"),
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "loadavg_per_cpu_start": round(load_start, 3),
        # end loadavg is informational only: it includes the bench's
        # OWN 32-thread load, so it cannot feed the contamination
        # flag (external load arriving mid-run is what best-of-2
        # absorbs)
        "loadavg_per_cpu_end": round(load_end, 3),
        "load_wait_sec": load_wait,
        "load_contaminated": bool(load_start > LOAD_THRESHOLD),
        "second_run_skipped": rec.second_skipped,
        "third_run": rec.third_run,
        "methodology": (
            "best-of-2 warm per entry since r4 (first runs under "
            "queries_first); r8 adds a third run on non-trivial entries "
            "that look stalled — best-of-2 > 1.3x the same entry in the "
            "committed prior bench_detail.json at the same sf, with the "
            "prior scaled up by the start drift probe so uniform host "
            "slowdown does not third-run every entry (r9: entries with no "
            "same-sf prior get NO third run — their first sealed number "
            "is best-of-2); rounds <=3 recorded single runs. r9 adds a "
            "fixed pure-CPU drift probe; r10 interleaves it every ~10 "
            "entries and value_normalized sums each entry divided by its "
            "own probe-segment ratio (min-of-endpoints overcorrected under "
            "intra-run drift); drift_ratio is the probe mean over the "
            "pinned reference, informational. r11 formally demotes "
            "value_normalized to informational too (a CPU-only probe "
            "mis-scales I/O-heavy entries — r10 seal day: raw within 2.1% "
            "across two same-tree runs, normalized apart 14%); the "
            "regression signal is per-entry raw A/Bs against module "
            "byte-identity, per BASELINE.md"
        ),
    }
    # VERDICT r4 finding 1: BENCH_r04.json was driver-unparseable because the
    # single detail line outgrew the driver's 2000-char tail capture (its head
    # was truncated away). Per-query detail now goes to a sidecar file and the
    # LAST stdout line is a compact (<200 char) summary that always fits in
    # the tail, so the headline total is machine-recoverable every round.
    detail_path = Path(__file__).resolve().parent / "bench_detail.json"
    detail_path.write_text(json.dumps(detail, indent=1) + "\n")
    # run-stamped sidecar (r17, VERDICT r16 item 2): bench_detail.json is
    # overwritten by every run, so two rounds' per-query ground truth
    # could never be diffed — each run now ALSO lands a copy keyed by
    # (sf, effective cores, wall-clock stamp) under bench_runs/; the
    # newest two at matching sf/cores are the per-query A/B.
    runs_dir = Path(__file__).resolve().parent / "bench_runs"
    runs_dir.mkdir(exist_ok=True)
    stamp = int(time.time())
    cores = spark.sparkContext.defaultParallelism
    (runs_dir / f"bench_detail_sf{sf}_c{cores}_{stamp}.json").write_text(
        json.dumps(detail, indent=1) + "\n"
    )
    print(json.dumps(detail))  # full record for humans reading the log head
    # chunked per-query lines (r17, VERDICT r16 item 2): the r4 tail
    # contract keeps the FINAL line compact (a >2000-char line outgrew
    # the driver's tail capture and truncated unparseably), so per-query
    # data goes out as self-describing compact lines BEFORE it — each
    # well under the tail limit; a consumer reassembles parts 1..parts.
    pq_items = sorted(rec.best.items())
    pq_chunks: list[dict] = [{}]
    pq_len = 0
    for k, v in pq_items:
        if pq_len > 1200:
            pq_chunks.append({})
            pq_len = 0
        pq_chunks[-1][k] = v
        pq_len += len(k) + 12
    for i, chunk in enumerate(pq_chunks):
        print(
            json.dumps(
                {
                    "metric": "catalog_per_query",
                    "part": i + 1,
                    "parts": len(pq_chunks),
                    "sf": sf,
                    "cpus": cores,
                    "queries": chunk,
                },
                separators=(",", ":"),
            )
        )
    print(
        json.dumps(
            {
                "metric": "catalog_headline_total",
                "value": total,
                "value_normalized": total_normalized,
                "drift_ratio": drift_ratio,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(rec.best),
                "cpus": cores,
                "load_contaminated": bool(load_start > LOAD_THRESHOLD),
                "detail": "bench_detail.json",
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()

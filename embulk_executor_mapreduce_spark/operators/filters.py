"""Filter chain — the reference's ordered FilterPlugin list (SURVEY.md §2.2 O3).

Reference semantics: an ordered list of plugins applied between input and
output; each may transform records *and* schema; the executor only composes
them (``EmbulkPartitioningMapReduce.java:83,126-130``). Spark-first, each
filter type compiles to a declarative DataFrame transformation (Catalyst
optimizes across the chain — filters push down through projections for free);
the ``pandas`` filter is the escape hatch for arbitrary row-level plugins
(``mapInPandas``, Arrow-batched — the slow path, kept out of the built-in
types).

Filter configs:
- ``select``: {columns: [...]}                      — projection (+ order)
- ``drop``: {columns: [...]}
- ``rename``: {mapping: {old: new}}
- ``cast``: {mapping: {col: embulk_type}}
- ``filter``: {predicate: "sql expression"}
- ``with_column``: {name: ..., expr: "sql expression"}
- ``pandas``: {fn: registered name}                 — plugin slot

Relational stages (extension surface — the spec carries full analytic
pipelines):
- ``join``: {source: {in-block}, on: [cols] | condition: "expr",
  how: inner|left|..., broadcast: bool (default true — lookups are small;
  set false for big-big joins so Catalyst/AQE picks the shuffle strategy)}
- ``aggregate``: {group_by: [...], aggs: {alias: "sql agg expr"}}
- ``dedup``: {columns: [...], order_by: [...] (optional — deterministic
  survivor via row_number; without it, dropDuplicates keeps an arbitrary row)}
- ``sort``: {by: ["col", "col desc", ...]}
- ``limit``: {n: int}
- ``sql``: {query: "... FROM __input ..."}          — full SQL escape hatch
- ``pagerank``: {src: col, dst: col, iters: int (default 5),
  redistribute_dangling: bool, edges_distinct: bool} — treats the incoming
  frame as an edge list and replaces it with (node, rank) integer
  centrality scores (operators/graph.py); follow with a ``join`` stage to
  weight documents by the rank of their source node (crawl-quality
  weighting). Batch-only: the fixed-iteration loop is eager.
  ``edges_distinct: true`` is the production-form selector (SCALING.md §3
  decision rule): the caller declares the input ALREADY deduplicated —
  e.g. an ``in: {type: table}`` source over a ``bucketBy(src)`` standing
  graph — so the stage skips the distinct+repartition+persist and every
  iteration reads the storage layout with zero edge-side exchanges.
  Declaring it on a frame with duplicate edges double-counts their
  contributions; leave false unless the upstream layout guarantees it.
- ``url_canonicalize``: {column: url col (default "url")} — appends
  ``canon_url``, ``host``, ``registrable_domain`` (operators/web.py: pure
  JVM regexp/array expressions, map-only, streamable); chain with ``dedup``
  on canon_url and per-domain capping for the web-corpus front door.
- ``sample_k_per_group``: {group_by: [cols], k: int (default 5),
  order_by: [...] | hash_on: unique id col} — keep at most k rows per
  group: ``order_by`` gives top-k, ``hash_on`` gives the deterministic
  hash-ordered sample (per-domain caps, 'k examples per class'). One
  exchange on the group key, rank window only — no global sort. Batch-only
  (row_number needs the whole group).

Training-data text stages (operators/text.py + dedup.py re-exposed at the
config surface — the reference's filter-plugin UX over the LLM-prep
operators, so the whole corpus front door is declarative: url_canonicalize
→ dedup → language_id → filter → quality_score → filter → pii_scrub →
minhash_dedup → out). APPEND-semantics stages reuse the operators verbatim
through a struct-pack: the full input row becomes the operator's ``id``
column, so the computed columns ride a single map-only projection — no
join-back, no shuffle, streamable. Appended names collide-guard against
existing columns (ConfigError, not silent overwrite):

- ``text_stats``: {column: text col (default "text")} — appends
  ``n_tokens``, ``n_chars_computed``, ``avg_token_len``
- ``quality_score``: {column} — appends ``quality`` in [0,1]; chain a
  ``filter`` stage (``quality >= 0.7``) to prune
- ``language_id``: {column} — appends ``lang_guess``, ``marker_hits``
- ``token_count``: {column} — appends ``n_words``, ``n_bpeish_tokens``,
  ``n_unique_tokens``
- ``fingerprint``: {column} — appends order-insensitive content
  ``fingerprint``; chain ``dedup: {columns: [fingerprint]}`` for exact
  content dedup
- ``pii_scrub``: {column, patterns: {name: regex} (optional)} — REPLACES
  the text column with the redacted form and appends per-pattern audit
  counts ``n_<name>``
- ``repetition_stats``: {column, id: unique id col} — appends Gopher-style
  ``top_token_frac``, ``unique_token_frac``, ``rep_keep`` (id + join-back:
  the stats are a per-doc aggregate, so this stage costs one id-keyed
  shuffle; batch-only)
- ``minhash_dedup``: {column, id, num_hashes: 16, bands: 4, shingle_n: 3}
  — removes near-duplicate LOSERS: banded MinHash LSH candidate pairs →
  connected components → keep only each cluster's min-id doc (batch-only:
  the label-propagation loop is eager)
- ``chunk``: {column, window: 64, stride: 48} — fans every document out
  into overlapping fixed-size token windows (the training-example
  materialization step), appending ``chunk_idx``, ``chunk_text``,
  ``chunk_tokens`` while keeping every input column (struct-pack +
  posexplode — rows multiply inside codegen, no shuffle, streamable)
- ``decontaminate``: {benchmark: {in-block}, column, id,
  method: minhash (default) | ngram, …method knobs} — drops corpus docs
  that leak a held-out benchmark/eval set: ``minhash`` catches paraphrased
  leakage via banded signatures + ``min_matches``/``num_hashes``
  agreement, ``ngram`` flags any shared word n-gram (``n``: 5). Corpus
  shuffles once on band/gram keys; the benchmark side is eval-set-sized
  so AQE broadcasts it. Batch-only (corpus-wide signature aggregation).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import ConfigError
from ..spec import FilterSpec
from ..types import EMBULK_TO_SPARK

PandasFilterFn = Callable[[pd.DataFrame], pd.DataFrame]
_FILTER_REGISTRY: dict[str, tuple[PandasFilterFn, str]] = {}


def register_pandas_filter(name: str, fn: PandasFilterFn, out_schema: str) -> None:
    """Register a row-level plugin filter: pandas DataFrame in → out, with the
    (possibly changed) output schema as a DDL string — filters may change
    schema, like reference FilterPlugins."""
    _FILTER_REGISTRY[name] = (fn, out_schema)


def apply_filter(df: DataFrame, spec: FilterSpec) -> DataFrame:
    cfg = spec.config
    if spec.type == "select":
        return df.select(*cfg["columns"])
    if spec.type == "drop":
        return df.drop(*cfg["columns"])
    if spec.type == "rename":
        for old, new in cfg["mapping"].items():
            df = df.withColumnRenamed(old, new)
        return df
    if spec.type == "cast":
        for col, etype in cfg["mapping"].items():
            if etype not in EMBULK_TO_SPARK:
                raise ConfigError(f"cast filter: unknown type {etype!r}")
            df = df.withColumn(col, F.col(col).cast(EMBULK_TO_SPARK[etype]))
        return df
    if spec.type == "filter":
        return df.filter(cfg["predicate"])
    if spec.type == "with_column":
        return df.withColumn(cfg["name"], F.expr(cfg["expr"]))
    if spec.type == "pandas":
        name = cfg.get("fn")
        if name not in _FILTER_REGISTRY:
            raise ConfigError(f"pandas filter {name!r} is not registered")
        fn, out_schema = _FILTER_REGISTRY[name]

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield fn(pdf)

        return df.mapInPandas(run, schema=out_schema)
    if spec.type == "join":
        from ..sources.readers import read_source
        from ..spec import source_from

        if "source" not in cfg:
            raise ConfigError("join filter requires a 'source' block")
        right = read_source(df.sparkSession, source_from(cfg["source"]))
        if cfg.get("broadcast", True):
            right = F.broadcast(right)
        how = cfg.get("how", "inner")
        if "on" in cfg:
            return df.join(right, on=list(cfg["on"]), how=how)
        if "condition" in cfg:
            return df.join(right, on=F.expr(cfg["condition"]), how=how)
        raise ConfigError("join filter requires 'on' columns or a 'condition'")
    if spec.type == "aggregate":
        aggs = cfg.get("aggs")
        if not aggs:
            raise ConfigError("aggregate filter requires an 'aggs' mapping")
        exprs = [F.expr(e).alias(a) for a, e in aggs.items()]
        keys = cfg.get("group_by", [])
        return df.groupBy(*keys).agg(*exprs) if keys else df.agg(*exprs)
    if spec.type == "dedup":
        cols = cfg.get("columns")
        if not cols:
            raise ConfigError("dedup filter requires 'columns'")
        order_by = cfg.get("order_by")
        if not order_by:
            return df.dropDuplicates(list(cols))
        from pyspark.sql import Window as W

        w = W.partitionBy(*[F.col(_bt(c)) for c in cols]).orderBy(
            *[_sort_col(s) for s in order_by]
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    if spec.type == "sort":
        return df.orderBy(*[_sort_col(s) for s in cfg.get("by", [])])
    if spec.type == "limit":
        return df.limit(int(cfg["n"]))
    if spec.type == "sql":
        query = cfg.get("query", "")
        if "__input" not in query:
            raise ConfigError("sql filter query must reference __input")
        df.createOrReplaceTempView("__input")
        return df.sparkSession.sql(query)
    if spec.type == "url_canonicalize":
        from .web import url_canonicalize

        url_col = cfg.get("column", "url")
        if url_col not in df.columns:
            # reference findColumnByName config-time error
            # (TimestampPartitioning.java:152-161)
            raise ConfigError(
                f"url_canonicalize filter column {url_col!r} missing from the data"
            )
        return url_canonicalize(df, url_col=url_col)
    if spec.type == "pagerank":
        from .graph import pagerank

        src, dst = cfg.get("src"), cfg.get("dst")
        if not src or not dst:
            raise ConfigError("pagerank filter requires 'src' and 'dst' columns")
        for c in (src, dst):
            if c not in df.columns:
                # reference findColumnByName config-time error
                # (TimestampPartitioning.java:152-161)
                raise ConfigError(
                    f"pagerank filter column {c!r} missing from the data"
                )
        iters = int(cfg.get("iters", 5))
        if iters < 1:
            raise ConfigError(f"pagerank iters must be >= 1, got {iters}")
        return pagerank(
            df,
            src_col=src,
            dst_col=dst,
            iters=iters,
            redistribute_dangling=bool(cfg.get("redistribute_dangling", False)),
            edges_distinct=bool(cfg.get("edges_distinct", False)),
        )
    if spec.type == "sample_k_per_group":
        from pyspark.sql import Window as W

        group_by = cfg.get("group_by")
        if not group_by:
            raise ConfigError("sample_k_per_group filter requires 'group_by'")
        for c in group_by:
            if c not in df.columns:
                raise ConfigError(
                    f"sample_k_per_group group column {c!r} missing from the data"
                )
        k = int(cfg.get("k", 5))
        if k < 1:
            raise ConfigError(f"sample_k_per_group k must be >= 1, got {k}")
        order_by = cfg.get("order_by")
        if order_by:
            order = [_sort_col(s) for s in order_by]  # top-k per group
        else:
            # deterministic hash-ordered SAMPLE (the per-domain cap / 'k
            # examples per class' pattern): stable across runs and engines,
            # no global sort — one exchange on the group key. hash_on must
            # be a unique id for a uniform, reproducible pick.
            hash_on = cfg.get("hash_on")
            if not hash_on:
                raise ConfigError(
                    "sample_k_per_group filter requires 'order_by' (top-k) "
                    "or 'hash_on' (deterministic sample)"
                )
            if hash_on not in df.columns:
                raise ConfigError(
                    f"sample_k_per_group hash column {hash_on!r} missing from the data"
                )
            order = [
                F.md5(F.col(_bt(hash_on)).cast("string")),
                F.col(_bt(hash_on)),
            ]
        if "__rn" in df.columns:
            raise ConfigError(
                "sample_k_per_group filter uses '__rn' as its scratch rank "
                "column, which already exists in the data — rename or drop "
                "it first"
            )
        # _bt so a dotted top-level group column partitions on the column
        # itself, not a struct-field path (ADVICE r8)
        w = W.partitionBy(*[F.col(_bt(c)) for c in group_by]).orderBy(*order)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )
    if spec.type == "chunk":
        from .text import chunk_token_windows

        text_col = cfg.get("column", "text")
        if text_col not in df.columns:
            raise ConfigError(
                f"chunk filter column {text_col!r} missing from the data"
            )
        window = int(cfg.get("window", 64))
        stride = int(cfg.get("stride", 48))
        if window < 1 or stride < 1:
            raise ConfigError(
                f"chunk window/stride must be >= 1, got {window}/{stride}"
            )
        _guard_new_columns(df, ["chunk_idx", "chunk_text", "chunk_tokens"], "chunk")
        res = chunk_token_windows(
            _pack_rows(df),
            text_col=f"{_ROW}.{_bt(text_col)}",
            id_col=_ROW,
            window=window,
            stride=stride,
        )
        return res.select(f"{_ROW}.*", "chunk_idx", "chunk_text", "chunk_tokens")
    if spec.type == "decontaminate":
        from ..sources.readers import read_source
        from ..spec import source_from

        if "benchmark" not in cfg:
            raise ConfigError("decontaminate filter requires a 'benchmark' block")
        text_col, id_col = _text_and_id(df, cfg, spec.type)
        benchmark = read_source(df.sparkSession, source_from(cfg["benchmark"]))
        if text_col not in benchmark.columns:
            raise ConfigError(
                f"decontaminate benchmark lacks the text column {text_col!r}"
            )
        if id_col not in benchmark.columns:
            # both methods key the benchmark side by id internally, but its
            # ids never surface — synthesize one when the eval set is bare
            benchmark = benchmark.withColumn(id_col, F.monotonically_increasing_id())
        method = cfg.get("method", "minhash")
        if method == "minhash":
            from ..operators.dedup import minhash_decontaminate

            clean, _contaminated = minhash_decontaminate(
                df,
                benchmark,
                text_col,
                id_col,
                num_hashes=int(cfg.get("num_hashes", 16)),
                bands=int(cfg.get("bands", 4)),
                shingle_n=int(cfg.get("shingle_n", 3)),
                min_matches=int(cfg.get("min_matches", 12)),
            )
            return clean
        if method == "ngram":
            from .text import ngram_contamination

            flagged = ngram_contamination(
                df, benchmark, text_col=text_col, id_col=id_col,
                n=int(cfg.get("n", 5)),
            ).select(id_col)
            return df.join(flagged, on=id_col, how="left_anti")
        raise ConfigError(
            f"decontaminate method {method!r} unknown (want minhash or ngram)"
        )
    if spec.type in _TEXT_APPEND_STAGES:
        return _apply_text_append(df, spec.type, cfg)
    if spec.type == "pii_scrub":
        return _apply_pii_scrub(df, cfg)
    if spec.type == "repetition_stats":
        from .text import repetition_quality

        text_col, id_col = _text_and_id(df, cfg, spec.type)
        _guard_new_columns(
            df, ["top_token_frac", "unique_token_frac", "rep_keep"], spec.type
        )
        stats = repetition_quality(df, text_col=text_col, id_col=id_col).select(
            F.col(id_col),
            "top_token_frac",
            "unique_token_frac",
            F.col("keep").alias("rep_keep"),
        )
        # per-doc aggregate → one id-keyed shuffle join-back (the struct-pack
        # trick would shuffle (row × tokens)-sized frames; the id join is the
        # scale shape). ``id`` must be unique or rows fan out.
        return df.join(stats, on=id_col, how="left")
    if spec.type == "minhash_dedup":
        from .dedup import connected_components, minhash_candidates

        text_col, id_col = _text_and_id(df, cfg, spec.type)
        # One evaluation of the upstream pipeline for the whole stage (r16
        # optimization, guide §1.2/§5): the candidate generation and the
        # final loser anti-join BOTH reference `df`, so without a
        # materialization the full upstream chain (in a prep spec: the
        # repetition join-back and the 5-gram decontaminate anti-join) runs
        # twice per action. LAZY localCheckpoint (eager=False, probed:
        # one evaluation shared across the referencing jobs, a fresh RDD
        # per compile — never a cross-run cache the way a persist()'s
        # plan-matched CacheManager entry would be): the checkpoint
        # itself adds no compile-time job, so config errors in LATER
        # stages still fail fast before it materializes (this stage's CC
        # loop below runs eager per-iteration jobs during compile, as it
        # always has — the honest contract pinned in
        # test_minhash_dedup_stage_compile_stays_lazy_and_fails_fast).
        # At scale this trades one MEMORY_AND_DISK write of the STAGE-
        # INPUT rows — all pre-dedup rows, every column including text,
        # pinned in executor-local non-reliable storage for the compiled
        # query's lifetime (an executor loss after materialization fails
        # the query instead of recomputing lineage; acceptable for a
        # batch pipeline, and the documented trade of the repo's
        # checkpoint idiom) — against a second full recompute of the
        # upstream pipeline; connected_components already materializes
        # every iteration the same way.
        df = df.localCheckpoint(eager=False)
        pairs = minhash_candidates(
            df,
            text_col,
            id_col,
            num_hashes=int(cfg.get("num_hashes", 16)),
            bands=int(cfg.get("bands", 4)),
            shingle_n=int(cfg.get("shingle_n", 3)),
        )
        losers = (
            connected_components(pairs)
            .filter(F.col("cluster_id") != F.col("doc_id"))
            .select(F.col("doc_id").alias(id_col))
        )
        return df.join(losers, on=id_col, how="left_anti")
    if spec.type == "anti_state":
        # incremental-ingestion front door: drop rows whose key already
        # exists in a landed state — an EXACT anti-join, routed through the
        # bloom-bitmap runtime prefilter so a mostly-new delta's exchange
        # carries only the probe-positive sliver (operators/runtimefilter.py;
        # prefilter: false degrades to the plain anti-join for tiny states).
        from ..sources.readers import read_source
        from ..spec import source_from
        from .runtimefilter import new_keys_via_bitmap, suggest_m_bits

        if "state" not in cfg:
            raise ConfigError(
                "anti_state filter requires a 'state' source block "
                "(typically {type: merge_state, path: ...})"
            )
        keys = cfg.get("keys")
        if not keys:
            raise ConfigError("anti_state filter requires 'keys'")
        state = read_source(df.sparkSession, source_from(dict(cfg["state"])))
        for c in keys:
            if c not in df.columns:
                # reference findColumnByName config-time error
                # (TimestampPartitioning.java:152-161)
                raise ConfigError(
                    f"anti_state key column {c!r} missing from the data"
                )
            if c not in state.columns:
                raise ConfigError(
                    f"anti_state key column {c!r} missing from the state"
                )
        if not cfg.get("prefilter", True):
            return df.join(
                state.select(*keys).distinct(), on=list(keys), how="left_anti"
            )

        def _int_cfg(key, default):
            raw = cfg.get(key, default)
            try:
                return int(raw)
            except (TypeError, ValueError):
                # a config typo must classify as config, not as an internal
                # ValueError (r12 review)
                raise ConfigError(
                    f"anti_state {key} must be an integer, got {raw!r}"
                ) from None

        num_hashes = _int_cfg("num_hashes", 2)
        if not (1 <= num_hashes <= 8):
            raise ConfigError(
                f"anti_state num_hashes must be in [1, 8], got {num_hashes}"
            )
        bits_per_key = _int_cfg("bits_per_key", 16)
        if not (1 <= bits_per_key <= 64):
            raise ConfigError(
                f"anti_state bits_per_key must be in [1, 64], got {bits_per_key}"
            )
        expected = None
        if cfg.get("expected_keys") is not None:
            expected = _int_cfg("expected_keys", None)
            if expected < 1:
                raise ConfigError(
                    f"anti_state expected_keys must be >= 1, got {expected}"
                )
        # broadcast: true (default) hints the bitmap side of the probe
        # joins; false lets Catalyst/AQE pick for a bitmap past the
        # broadcast threshold (the shuffle-probe path the operator
        # supports — r12 review: the stage must not force an 8 GB+
        # broadcast with no opt-out)
        broadcast = bool(cfg.get("broadcast", True))
        if cfg.get("bitmap_cache", False):
            # steady-state increments probe the bitmap PERSISTED beside the
            # merge state (write_state_bitmap, the materialize_changes-class
            # maintenance step) — no state scan to build the filter. The
            # cache is version-pinned; absent/stale falls through to the
            # inline build below. Only the state's CURRENT version can be
            # covered, so a time-travel read never consults the cache.
            from .runtimefilter import new_keys_with_bitmap, read_state_bitmap

            st = cfg["state"]
            if st.get("type") != "merge_state":
                raise ConfigError(
                    "anti_state bitmap_cache requires a merge_state state "
                    "block (the bitmap is pinned to the state's commit "
                    "version)"
                )
            if dict(st.get("options") or {}).get("version") is not None:
                raise ConfigError(
                    "anti_state bitmap_cache cannot serve a time-travel "
                    "read (options.version) — the persisted bitmap covers "
                    "only the state's current version"
                )
            cached = read_state_bitmap(df.sparkSession, st["path"], list(keys))
            if cached is not None:
                bitmap, meta = cached
                return new_keys_with_bitmap(
                    df,
                    state,
                    list(keys),
                    bitmap,
                    int(meta["m_bits"]),
                    num_hashes=int(meta["num_hashes"]),
                    broadcast=broadcast,
                )
        # filter sizing: declared key count when the spec knows it (table
        # stats / manifest at scale), else one count over the state —
        # an eager probe at compile time, same class as the streaming
        # schema peek. Sizing only tunes wasted verify work, never rows.
        n = expected if expected is not None else state.count()
        m_bits = suggest_m_bits(n, bits_per_key=bits_per_key)
        return new_keys_via_bitmap(
            df, state, list(keys), m_bits, num_hashes=num_hashes,
            broadcast=broadcast,
        )
    if spec.type == "drift_report":
        # Deequ-style "verification as part of the pipeline" over a CDC
        # feed (VERDICT r10 item 8, completing the config surface): the
        # stage REPLACES the frame with the tidy per-commit drift report
        # (constraints.drift_report — one fused groupBy(_commit_version)
        # pass, N checks = one map-side-combinable shuffle). ``gate: true``
        # additionally fails the load IN-PLAN when any check lands out of
        # bounds: the ``passed`` column becomes an assertion, so the error
        # fires lazily when the sink materializes the report — no eager
        # driver-side evaluation inside a lazy compile, and run_pipeline
        # classifies it as a user-data failure (USER_RAISED_EXCEPTION).
        from .constraints import Check, drift_report

        raw_checks = cfg.get("checks")
        if not isinstance(raw_checks, list) or not raw_checks:
            raise ConfigError("drift_report filter requires a 'checks' list")
        checks = []
        for i, c in enumerate(raw_checks):
            if not isinstance(c, dict) or "kind" not in c:
                raise ConfigError(
                    f"drift_report check #{i} must be a mapping with a 'kind'"
                )
            if "lo" not in c or "hi" not in c:
                raise ConfigError(
                    f"drift_report check #{i} needs 'lo' and 'hi' bounds "
                    "on the per-commit metric"
                )
            try:
                checks.append(
                    Check(
                        cid=str(c.get("id", f"drift_{i}")),
                        table=str(c.get("table", "feed")),
                        kind=str(c["kind"]),
                        column=c.get("column"),
                        params=(int(c["lo"]), int(c["hi"])),
                    )
                )
            except (TypeError, ValueError) as exc:
                raise ConfigError(f"drift_report check #{i}: {exc}") from None
        try:
            report = drift_report(df, checks)
        except ValueError as exc:
            # feed-shape / check-shape defects are config-time user errors
            # (e.g. the stage applied to a source that is not a per-version
            # CDC feed), not runtime data failures
            raise ConfigError(f"drift_report filter: {exc}") from None
        if cfg.get("gate", False):
            msg = F.concat(
                F.lit("drift_gate violation: check "),
                F.col("constraint_id"),
                F.lit(" ("),
                F.col("kind"),
                F.lit(") at _commit_version="),
                F.col("_commit_version").cast("string"),
                F.lit(" metric="),
                F.col("metric").cast("string"),
            )
            report = report.withColumn(
                "passed",
                F.when(F.col("passed"), F.lit(True)).otherwise(
                    F.raise_error(msg)
                ),
            )
        return report
    raise ConfigError(f"unknown filter type {spec.type!r}")


#: append-semantics text stages: stage type → (operator name in
#: operators.text, appended output columns). Each operator is a single
#: SELECT projection keyed on its id column, so the struct-pack in
#: _apply_text_append keeps the stage map-only.
_TEXT_APPEND_STAGES = {
    "text_stats": ("text_stats", ["n_tokens", "n_chars_computed", "avg_token_len"]),
    "quality_score": ("quality_score", ["quality"]),
    "language_id": ("language_id", ["lang_guess", "marker_hits"]),
    "token_count": ("token_counts", ["n_words", "n_bpeish_tokens", "n_unique_tokens"]),
    "fingerprint": ("fingerprint", ["fingerprint"]),
}

_ROW = "__row"


def _text_and_id(df: DataFrame, cfg: dict, stage: str) -> tuple[str, str]:
    text_col = cfg.get("column", "text")
    if text_col not in df.columns:
        # reference findColumnByName config-time error
        # (TimestampPartitioning.java:152-161)
        raise ConfigError(f"{stage} filter column {text_col!r} missing from the data")
    id_col = cfg.get("id")
    if not id_col:
        raise ConfigError(f"{stage} filter requires an 'id' column")
    if id_col not in df.columns:
        raise ConfigError(
            f"{stage} filter id column {id_col!r} missing from the data"
        )
    return text_col, id_col


def _guard_new_columns(df: DataFrame, new_cols: list[str], stage: str) -> None:
    clash = [c for c in new_cols if c in df.columns]
    if clash:
        raise ConfigError(
            f"{stage} filter would append column(s) {clash} that already "
            f"exist in the data — rename or drop them first"
        )


def _pack_rows(df: DataFrame) -> DataFrame:
    if _ROW in df.columns:
        raise ConfigError(
            f"column name {_ROW!r} is reserved by append-semantics filters"
        )
    return df.select(F.struct(*[F.col(_bt(c)) for c in df.columns]).alias(_ROW))


def _bt(name: str) -> str:
    """Backtick-quote a column/field name so dotted names survive nested
    struct-field references (``__row.`my.text```)."""
    if "`" in name:
        raise ConfigError(f"column name {name!r} contains a backtick")
    return f"`{name}`"


def _apply_text_append(df: DataFrame, stage: str, cfg: dict) -> DataFrame:
    """Run an operators.text projection with the WHOLE ROW as its id column:
    ``struct(*) → op(text_col=__row.text, id_col=__row) → __row.*, computed``.
    One narrow projection end to end — the appended columns cost zero
    shuffles and zero extra scans (vs. joining the operator's (id, computed)
    frame back, which re-scans and shuffles), and the stage stays
    streamable."""
    from . import text as text_ops

    op_name, out_cols = _TEXT_APPEND_STAGES[stage]
    text_col = cfg.get("column", "text")
    if text_col not in df.columns:
        raise ConfigError(f"{stage} filter column {text_col!r} missing from the data")
    _guard_new_columns(df, out_cols, stage)
    packed = _pack_rows(df)
    res = getattr(text_ops, op_name)(
        packed, text_col=f"{_ROW}.{_bt(text_col)}", id_col=_ROW
    )
    return res.select(f"{_ROW}.*", *out_cols)


def _apply_pii_scrub(df: DataFrame, cfg: dict) -> DataFrame:
    from .text import pii_scrub

    text_col = cfg.get("column", "text")
    if text_col not in df.columns:
        raise ConfigError(f"pii_scrub filter column {text_col!r} missing from the data")
    patterns = cfg.get("patterns")
    res = pii_scrub(
        _pack_rows(df), text_col=f"{_ROW}.{_bt(text_col)}", id_col=_ROW, patterns=patterns
    )
    # audit columns come from the operator's own output schema (lazy — no
    # job runs), so the default pattern set has ONE source of truth in
    # operators/text.py rather than a literal copy here
    audit_cols = [c for c in res.columns if c not in (_ROW, "scrubbed")]
    _guard_new_columns(df, audit_cols, "pii_scrub")
    # original row with the text column REPLACED by its redacted form,
    # audit counts appended — still one map-only projection
    keep = [
        F.col("scrubbed").alias(text_col)
        if c == text_col
        else F.col(f"{_ROW}.{_bt(c)}").alias(c)
        for c in df.columns
    ]
    return res.select(*keep, *audit_cols)


def _sort_col(s: str):
    # backtick via _bt so a dotted top-level name sorts as a column, not a
    # struct-field path (same convention as the text-append stages)
    parts = s.split()
    if len(parts) == 2 and parts[1].lower() == "desc":
        return F.col(_bt(parts[0])).desc()
    if len(parts) == 2 and parts[1].lower() == "asc":
        return F.col(_bt(parts[0])).asc()
    if len(parts) == 1:
        return F.col(_bt(s))
    raise ConfigError(f"bad sort spec {s!r} (want 'col' or 'col desc')")


def apply_filter_chain(df: DataFrame, filters) -> DataFrame:
    for f in filters:
        df = apply_filter(df, f)
    return df

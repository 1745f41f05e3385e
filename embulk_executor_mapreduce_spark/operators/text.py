"""Text analysis operators: token stats, quality scoring, language ID,
fingerprinting. All built-in expressions (JVM-side, codegen) — no UDFs."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exactmath import d_round

# tiny deterministic stopword marker sets per language (heuristic lang-ID);
# chosen from the synthetic corpus vocabulary so the heuristic has signal.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "la", "los", "y"),
    "fr": ("le", "la", "les", "et"),
}


def tokens(text_col: str):
    return F.split(F.col(text_col), " ")


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token count, char count, avg token length — quality-score inputs."""
    toks = tokens(text_col)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.length(text_col).alias("n_chars_computed"),
        d_round(F.length(text_col) * F.lit(1.0) / F.size(toks), 2).alias(
            "avg_token_len"
        ),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality score in [0,1]: length band + stopword presence +
    mean word length band (the classic cheap pre-filter before expensive
    model scoring; runs as one projection)."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    mean_len = F.length(text_col) * F.lit(1.0) / n_tok
    has_stop = F.size(
        F.array_intersect(toks, F.array(*[F.lit(w) for w in LANG_MARKERS["en"]]))
    ) > 0
    score = (
        F.when((n_tok >= 10) & (n_tok <= 100000), 0.4).otherwise(0.0)
        + F.when(has_stop, 0.3).otherwise(0.0)
        + F.when((mean_len >= 3.0) & (mean_len <= 12.0), 0.3).otherwise(0.0)
    )
    return df.select(F.col(id_col), d_round(score, 2).alias("quality"))


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """n-gram/stopword-heuristic language guess: count marker hits per
    language, pick argmax (ties → lexicographic language code). Deterministic
    and expressible in the SQL oracle."""
    toks = F.array_distinct(tokens(text_col))
    scores = [
        F.struct(
            F.size(
                F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
            ).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    # array_max on struct(hits desc, lang) — invert lang ordering via max of
    # (hits, negative?) — simpler: sort_array desc of (hits, lang) takes the
    # largest hits; for equal hits it takes the lexicographically LAST lang,
    # so store lang descending-safe by comparing on (hits, reversed rank).
    ranked = [
        F.struct(
            s["hits"].alias("hits"),
            F.lit(len(LANG_MARKERS) - i).alias("rank"),
            s["lang"].alias("lang"),
        )
        for i, s in enumerate(scores)
    ]
    best = F.array_max(F.array(*ranked))
    return df.select(
        F.col(id_col),
        best["lang"].alias("lang_guess"),
        best["hits"].alias("marker_hits"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-insensitive content fingerprint: md5 over sorted tokens."""
    return df.select(
        F.col(id_col),
        F.md5(F.array_join(F.array_sort(tokens(text_col)), " ")).alias("fingerprint"),
    )


# BPE-ish pre-tokenizer: letter runs, digit runs, single non-space symbols —
# the shape GPT-style tokenizers use as the pre-split. Same regex semantics
# in Java regex (Spark) and RE2 (DuckDB oracle): no backrefs/lookaround.
BPEISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token counting two ways: whitespace words and a BPE-ish regex
    pre-tokenization (letters/digits/symbol runs). All JVM-side regex —
    no Python in the hot path."""
    bpe = F.regexp_extract_all(F.col(text_col), F.lit(BPEISH_PATTERN), 0)
    return df.select(
        F.col(id_col),
        F.size(tokens(text_col)).alias("n_words"),
        F.size(bpe).alias("n_bpeish_tokens"),
        F.size(F.array_distinct(bpe)).alias("n_unique_tokens"),
    )


def repetition_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition filters: fraction of tokens that are the single
    most frequent token, and the unique-token fraction. The scalable shape is
    explode → (doc, token) count → per-doc max — two hash aggregations keyed
    on doc id, no per-doc python, no O(doc_len²).

    A doc FAILS (keep=false) when one token dominates (>20%) or the
    vocabulary is degenerate (<30% unique) — the cheap pre-filter a training
    pipeline runs before model-based quality scoring.
    """
    from ..exactmath import d_round

    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    per_tok = toks.groupBy(id_col, "tok").agg(F.count("*").alias("c"))
    stats = per_tok.groupBy(id_col).agg(
        F.max("c").alias("top_tok_count"),
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_unique"),
    )
    top_frac = d_round(F.col("top_tok_count") / F.col("n_tokens"), 4)
    uniq_frac = d_round(F.col("n_unique") / F.col("n_tokens"), 4)
    return stats.select(
        F.col(id_col),
        F.col("n_tokens"),
        top_frac.alias("top_token_frac"),
        uniq_frac.alias("unique_token_frac"),
        ((top_frac <= 0.2) & (uniq_frac >= 0.3)).alias("keep"),
    )


def chunk_token_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split documents into overlapping fixed-size token windows — the
    training-example materialization step of an LLM data pipeline. One row in,
    ceil(max(n-window,0)/stride)+1 rows out, all via sequence+slice array
    expressions (rows fan out inside codegen, no shuffle, no python).
    """
    toks = tokens(text_col)
    n = F.size(toks)
    # window starts: 0, stride, 2·stride, … up to the FIRST multiple of
    # stride at which the window reaches the end (ceil((n-window)/stride)
    # · stride) — guarantees every token is covered; the final chunk is
    # truncated when the document length is not stride-aligned
    last_start = (
        F.floor(
            (F.greatest(n - window, F.lit(0)) + (stride - 1)) / F.lit(stride)
        ).cast("long")
        * stride
    )
    starts = F.sequence(F.lit(0).cast("long"), last_start, F.lit(stride).cast("long"))
    return (
        df.select(
            F.col(id_col),
            F.posexplode(
                F.transform(
                    starts, lambda s: F.array_join(F.slice(toks, s + 1, window), " ")
                )
            ).alias("chunk_idx", "chunk_text"),
        )
        .withColumn("chunk_tokens", F.size(F.split(F.col("chunk_text"), " ")))
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any word n-gram
    with a held-out benchmark set (the standard pre-training hygiene step).

    Scale shape: explode distinct n-grams on both sides, hash them, equi-join
    on the hash — the corpus side shuffles once on a high-cardinality key;
    the benchmark side is small (eval sets are), so AQE broadcasts it.
    Output: (doc_id, n_overlapping_ngrams) for contaminated docs only.
    """
    # local import: the shingle helper lives with the dedup operators
    from .dedup import word_shingles

    def grams(frame: DataFrame, out: str) -> DataFrame:
        return frame.select(
            F.col(id_col).alias(out),
            F.explode(F.array_distinct(word_shingles(text_col, n))).alias("g"),
        )

    corpus_grams = grams(corpus, "doc_id_c")
    bench_grams = grams(benchmark, "doc_id_b").select("g").distinct()
    return (
        corpus_grams.join(bench_grams, "g")
        .groupBy(F.col("doc_id_c").alias(id_col))
        .agg(F.count("*").alias("n_overlapping_ngrams"))
    )


def pii_scrub(
    df: DataFrame,
    text_col: str,
    id_col: str,
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Regex PII redaction (emails, long digit runs by default) — JVM-side
    regexp_replace chain, one projection, no shuffle. Returns the scrubbed
    text plus per-pattern hit counts so the pipeline can audit redaction
    rates at corpus scale."""
    patterns = patterns or {
        "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "digits": r"[0-9]{3,}",
    }
    out_cols = [F.col(id_col)]
    scrubbed = F.col(text_col)
    for name, pat in patterns.items():
        out_cols.append(
            (
                F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))
            ).alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    out_cols.append(scrubbed.alias("scrubbed"))
    return df.select(*out_cols)


def corpus_chunk_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 10,
) -> DataFrame:
    """C4-style corpus-wide span dedup: split every document into consecutive
    ``chunk_words``-word chunks, and keep only the FIRST occurrence (lowest
    (doc_id, position)) of each distinct chunk across the whole corpus; later
    occurrences are dropped and the document is rebuilt from its surviving
    chunks in order (C4 does this with 3-sentence spans; the principle —
    global first-wins span dedup — is identical).

    Scale shape: posexplode (narrow fan-out in codegen) → groupBy(md5(chunk))
    argmin aggregate — map-side partial combine, the exchange carries one row
    per DISTINCT chunk, never a corpus-wide window — → equi-join survivors
    back (AQE-planned) → groupBy(doc) ordered reassembly. Documents whose
    every chunk is a later duplicate disappear (fully-boilerplate docs).
    Output: (doc_id, clean_text, n_kept, n_dropped).
    """
    from .partitioning import spread_narrow

    # chunking + md5 per chunk is CPU-bound; don't let a one-file scan
    # serialize it onto one core (spread key ≠ the ch/doc group keys, so the
    # dedup exchanges survive and the join side reuses them)
    df = spread_narrow(df, id_col)
    toks = tokens(text_col)
    n_chunks = F.floor((F.size(toks) + (chunk_words - 1)) / F.lit(chunk_words)).cast(
        "long"
    )
    starts = F.sequence(F.lit(0).cast("long"), n_chunks - 1)
    chunks = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                starts,
                lambda i: F.array_join(
                    F.slice(toks, i * chunk_words + 1, chunk_words), " "
                ),
            )
        ).alias("pos", "chunk"),
    ).withColumn("ch", F.md5(F.col("chunk")))
    first = chunks.groupBy("ch").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("f"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    tagged = chunks.join(first, "ch").withColumn(
        "kept",
        (F.col(f"f.{id_col}") == F.col(id_col)) & (F.col("f.pos") == F.col("pos")),
    )
    return (
        tagged.groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("kept"), F.struct(F.col("pos"), F.col("chunk"))
                            )
                        )
                    ),
                    lambda s: s.chunk,
                ),
            ).alias("clean_text"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("kept"), 0).otherwise(1)).alias("n_dropped"),
        )
        .filter(F.col("n_kept") > 0)
    )


def duplicate_span_scrub(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_words: int = 5,
) -> DataFrame:
    """ExactSubstr-style duplicated-span scrubbing (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): every
    OVERLAPPING ``window_words``-token window is hashed corpus-wide; for a
    window text occurring more than once, only the canonical occurrence
    (global min (doc_id, position)) keeps its tokens — every other
    occurrence marks its [pos, pos+k) token range for removal, overlapping
    ranges merge, and each document is rebuilt from its surviving tokens.
    Unlike :func:`corpus_chunk_dedup`'s fixed non-overlapping chunks, the
    sliding windows catch duplicated passages at ARBITRARY alignment —
    the property that makes ExactSubstr the standard strong form.

    Scale shape — all linear, no suffix array needed for fixed k:
    token fan-out ≤ 1 row/token (posexplode), window fan-out ≤ 1
    row/position with the hash computed in codegen (`transform` over a
    `sequence`); the global argmin is a map-side-combinable aggregate on
    the window hash (exchange carries one row per DISTINCT window);
    coverage expansion fans each duplicate occurrence to ≤ k positions
    (explode of a `sequence`), deduped by (doc, pos) before the anti-join;
    reassembly is one groupBy(doc) ordered collect. Documents shorter than
    ``window_words`` pass through untouched; documents whose every token
    is covered by duplicate spans disappear (pure boilerplate).
    Output: (doc_id, clean_text, n_kept, n_dropped) with token counts.
    """
    from .partitioning import spread_narrow

    df = spread_narrow(df, id_col)
    toks = tokens(text_col)
    k = window_words
    base = df.select(F.col(id_col), toks.alias("w"))
    tokpos = base.select(
        F.col(id_col), F.posexplode(F.col("w")).alias("tpos", "tok")
    )
    # one window per start position 0..n-k (none when n < k)
    starts = F.when(
        F.size("w") >= k, F.sequence(F.lit(0), F.size("w") - k)
    ).otherwise(F.array().cast("array<int>"))
    wins = base.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                starts,
                lambda p: F.md5(F.array_join(F.slice(F.col("w"), p + 1, k), " ")),
            )
        ).alias("pos", "wh"),
    )
    first = wins.groupBy("wh").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("f"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    dup_occurrences = (
        wins.join(first, "wh")
        .where(
            (F.col("n_occ") > 1)
            & ~(
                (F.col(f"f.{id_col}") == F.col(id_col))
                & (F.col("f.pos") == F.col("pos"))
            )
        )
        .select(F.col(id_col), F.col("pos"))
    )
    covered = dup_occurrences.select(
        F.col(id_col),
        F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("tpos"),
    ).distinct()
    kept = tokpos.join(covered, [id_col, "tpos"], "left_anti")
    n_total = base.select(
        F.col(id_col), F.size("w").alias("n_total")
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("tpos"), F.col("tok")))
                    ),
                    lambda s: s.tok,
                ),
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("n_kept"),
        )
        .join(n_total, id_col)
        .select(
            id_col,
            "clean_text",
            "n_kept",
            (F.col("n_total") - F.col("n_kept")).alias("n_dropped"),
        )
    )


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    seq_len: int = 512,
) -> DataFrame:
    """GPT-style sequence packing (concat-then-chop): within each group,
    documents are concatenated in deterministic ``id_col`` order and chopped
    into fixed ``seq_len``-token training sequences; each document reports the
    bin its first token lands in and the offset within that bin.

    One partitioned window (cumulative token sum per group) — never a global
    sort; groups (sources/shards) are the unit of parallelism, exactly how a
    100 TB tokenization job shards. Output: (doc_id, group, n_tokens,
    pack_bin, bin_offset, n_bins_spanned).
    """
    from pyspark.sql import Window as W

    n_tok = F.size(tokens(text_col)).cast("long")
    w = (
        W.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).cast("long")
    end = (cum - 1).cast("long")
    return (
        df.select(
            F.col(id_col), F.col(group_col), n_tok.alias("n_tokens")
        )
        .withColumn("pack_bin", F.floor(start / seq_len))
        .withColumn("bin_offset", start % seq_len)
        .withColumn(
            "n_bins_spanned", (F.floor(end / seq_len) - F.floor(start / seq_len) + 1)
        )
    )


def vocab_topk(
    df: DataFrame,
    text_col: str = "text",
    k: int = 200,
) -> DataFrame:
    """Corpus vocabulary: global token frequencies and document frequencies,
    top-``k`` by count (token lexicographic tie-break). The aggregate is
    map-side-combinable and the top-k is a TakeOrdered merge — no global
    sort of the vocabulary. Output: (token, n_occurrences, n_docs)."""
    tok = df.select(
        F.col("doc_id"), F.explode(tokens(text_col)).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("token"))
        .limit(k)
    )


def quality_prune_per_source(
    df: DataFrame,
    keep_ppm: int = 600_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-source quality pruning: keep (about) the top ``keep_ppm``/10⁶
    fraction of each source's docs by quality score — the standard quality-
    pruning pass before pretraining, applied per source so one low-quality
    crawl can't crowd out a small high-quality source.

    Scale shape — deliberately NOT a rank window over docs (a per-source
    ``row_number`` totally orders each source in a single task; a source is
    billions of docs at 100 TB). Instead:

    * quality lives in a COARSE discrete domain (≤ 8 levels), so one
      map-side-combinable count per (source, level) captures the full
      distribution in a sources×8-row frame;
    * the per-source cutoff math runs as windows over THAT bounded frame
      (≤ 8 rows per partition — never data-sized);
    * levels strictly above the cutoff are kept whole; the single boundary
      level keeps a deterministic md5-hash fraction of its docs (the same
      portable hash as ``hash_sample_10pct``), so the decision is a
      broadcast join + filter over one corpus scan.

    The boundary fraction makes the kept COUNT approximate (hash-fraction,
    not exact-k) but the kept SET is deterministic and engine-portable —
    the exact-k alternative is precisely the per-source total order this
    design exists to avoid. Ceil division uses the positive-operand
    ``(a + b - 1) DIV b`` form (Spark DIV truncates, DuckDB // floors;
    they agree only on positive operands).
    """
    from pyspark.sql import Window as W

    q = quality_score(df, text_col, id_col)
    scored = df.select(F.col(id_col), F.col(source_col)).join(q, on=id_col)
    levels = scored.groupBy(source_col, "quality").agg(
        F.count(F.lit(1)).alias("c")
    )
    wdesc = (
        W.partitionBy(source_col)
        .orderBy(F.col("quality").desc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    lv = (
        levels.withColumn(
            "cum_above",
            F.coalesce(F.sum("c").over(wdesc), F.lit(0).cast("long")),
        )
        .withColumn("n", F.sum("c").over(W.partitionBy(source_col)))
        .withColumn(
            "take",
            F.greatest(
                F.lit(0).cast("long"),
                F.least(
                    F.col("c"),
                    F.expr(f"(n * {keep_ppm} + 999999) DIV 1000000")
                    - F.col("cum_above"),
                ),
            ),
        )
        .select(source_col, "quality", "c", "take")
    )
    h = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 1_000_000
    )
    return (
        scored.join(F.broadcast(lv), on=[source_col, "quality"])
        .where(
            (F.col("take") == F.col("c"))
            | (h * F.col("c") < F.col("take") * F.lit(1_000_000))
        )
        .select(id_col, source_col, "quality")
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    end_marker: str = "</w>",
) -> DataFrame:
    """REAL byte-pair-encoding tokenizer training (Sennrich et al. 2016 —
    the standard LLM tokenizer construction) as iterative DataFrame
    aggregates, the fixed-iteration Pregel-style pattern shared with
    k-means and PageRank. Returns the learned merge table
    ``(merge_rank, pair, merged)`` — the artifact a tokenizer ships.

    Scale shape — the textbook scalable decomposition: ONE corpus pass
    builds the word-frequency table (vocabulary-sized, ~1M rows at any
    corpus size), then every merge iteration runs entirely over that
    bounded table: adjacent-symbol pair counts (weighted by word
    frequency, map-side combinable), a 1-row deterministic argmax
    (max count, lexicographically-smallest pair on ties — min over
    struct(-cnt, pair), no window), broadcast back into a literal string
    replace. Per-iteration state is localCheckpoint'ed so the plan stays
    flat across ``n_merges`` iterations.

    Determinism: the re-segmentation DOUBLES inner separators before a
    space-framed literal ``replace`` — a match's consumed trailing space
    then still leaves a boundary space for an immediately following
    occurrence, which reproduces BPE's textbook left-to-right merge pass
    exactly (``a b a b`` → ``ab ab`` in one pass; a plain space-framed
    replace merges only alternate repeats) — and the argmax tie-break
    is binary-collation string order — both bit-portable to DuckDB, so
    the whole training run unrolls into a value-hash oracle
    (:func:`bpe_oracle_sql`). If fewer than ``n_merges`` merges are
    possible (tiny corpora) the remaining ranks emit NULL pairs rather
    than corrupting the segmentation."""
    merge_rows, _seg = _bpe_merge_loop(
        _bpe_words(df, text_col), n_merges, end_marker
    )
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return out


def _bpe_words(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _bpe_merge_loop(words: DataFrame, n_merges: int, end_marker: str):
    """The shared training loop: returns (per-rank merge frames, the final
    segmentation frame ``(w, seg, n)``) — ``bpe_train`` ships the merges,
    ``bpe_segment`` joins the segmentation back onto the corpus."""
    seg = words.select(
        "w",
        F.expr(
            "concat_ws(' ', transform(sequence(1, length(w)), "
            f"i -> substr(w, i, 1)), '{end_marker}')"
        ).alias("seg"),
        "n",
    ).localCheckpoint(eager=True)
    merge_rows = []
    for r in range(n_merges):
        syms = F.split(F.col("seg"), " ")
        # a fully-merged word is ONE symbol; sequence(0, -1) would generate
        # a DESCENDING [0, -1] in Spark, so guard to an empty pair list
        pair_idx = F.when(
            F.size(syms) >= 2, F.sequence(F.lit(0), F.size(syms) - 2)
        ).otherwise(F.array().cast("array<int>"))
        pairs = (
            seg.select(
                F.explode(
                    F.transform(
                        pair_idx,
                        lambda j: F.concat(
                            F.element_at(syms, j + 1),
                            F.lit(" "),
                            F.element_at(syms, j + 2),
                        ),
                    )
                ).alias("pair"),
                "n",
            )
            .groupBy("pair")
            .agg(F.sum("n").alias("cnt"))
        )
        best = pairs.agg(
            F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("pair"))).alias("b")
        ).select(F.col("b.pair").alias("bp"))
        seg = (
            seg.crossJoin(F.broadcast(best))
            .select(
                "w",
                F.when(F.col("bp").isNull(), F.col("seg"))
                .otherwise(
                    # inner separators are DOUBLED before the replace so a
                    # match's consumed trailing space still leaves a boundary
                    # for an immediately following occurrence ('a b a b'
                    # must merge to 'ab ab' in ONE pass, as the textbook
                    # left-to-right scan does — a plain space-framed replace
                    # merges only alternate repeats; caught by the
                    # independent-reference test), then runs collapse back
                    F.expr(
                        "trim(replace(replace("
                        "concat(' ', replace(seg, ' ', '  '), ' '), "
                        "concat(' ', replace(bp, ' ', '  '), ' '), "
                        "concat(' ', replace(bp, ' ', ''), ' ')), "
                        "'  ', ' '))"
                    )
                )
                .alias("seg"),
                "n",
            )
            .localCheckpoint(eager=True)
        )
        merge_rows.append(
            best.select(
                F.lit(r).cast("int").alias("merge_rank"),
                F.col("bp").alias("pair"),
                F.replace(F.col("bp"), F.lit(" "), F.lit("")).alias("merged"),
            )
        )
    return merge_rows, seg


def bpe_segment(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 8,
    end_marker: str = "</w>",
) -> DataFrame:
    """Tokenize the corpus under the learned BPE vocabulary — the APPLY
    half of the tokenizer: train the merges (:func:`bpe_train`'s loop),
    then join the per-word segmentation back onto the corpus and count
    tokens per document. Output ``(doc_id, n_words, n_bpe_tokens)`` —
    the compression the learned vocab achieves per doc, the number a
    data pipeline needs for packing/budgeting under a real tokenizer.

    Scale shape: training is vocabulary-bounded (see :func:`bpe_train`);
    the apply is ONE corpus-token-sized equi-join against the
    vocabulary-sized segmentation table (AQE broadcasts it when small).
    Docs with no non-empty word are absent."""
    words = _bpe_words(df, text_col)
    _, seg = _bpe_merge_loop(words, n_merges, end_marker)
    vocab = seg.select(
        "w", F.size(F.split(F.col("seg"), " ")).alias("w_tokens")
    )
    doc_words = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).filter(F.col("w") != "")
    return (
        doc_words.join(vocab, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("w_tokens").alias("n_bpe_tokens"),
        )
    )


def _bpe_chain_sql(
    table: str, text_col: str, n_merges: int, end_marker: str
) -> str:
    """The shared BPE training CTE chain (w0, s0..s{n}, per-merge p/b).
    Every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and each merge
    references its predecessor ~3x, so an un-materialized chain re-expands
    the corpus scan 3^n times (observed as a too-many-open-files failure
    at n=8)."""
    parts = [
        f"""w0 AS MATERIALIZED (
      SELECT w, count(*) AS n FROM (
        SELECT unnest(string_split({text_col}, ' ')) AS w FROM {table}
      ) WHERE w <> '' GROUP BY w
    ), s0 AS MATERIALIZED (
      SELECT w, array_to_string(
               list_transform(range(1, length(w) + 1), i -> substr(w, i, 1)),
               ' ') || ' {end_marker}' AS seg, n
      FROM w0
    )"""
    ]
    for r in range(n_merges):
        parts.append(f"""p{r} AS MATERIALIZED (
      SELECT pr AS pair, CAST(sum(n) AS BIGINT) AS cnt FROM (
        SELECT unnest(list_transform(
                 range(len(string_split(seg, ' ')) - 1),
                 j -> string_split(seg, ' ')[j + 1] || ' '
                      || string_split(seg, ' ')[j + 2])) AS pr, n
        FROM s{r}
      ) GROUP BY pr
    ), b{r} AS MATERIALIZED (
      SELECT pair FROM p{r} ORDER BY cnt DESC, pair LIMIT 1
    ), s{r + 1} AS MATERIALIZED (
      SELECT w, CASE WHEN (SELECT pair FROM b{r}) IS NULL THEN seg ELSE
        trim(replace(replace(
          ' ' || replace(seg, ' ', '  ') || ' ',
          ' ' || replace((SELECT pair FROM b{r}), ' ', '  ') || ' ',
          ' ' || replace((SELECT pair FROM b{r}), ' ', '') || ' '),
          '  ', ' '))
      END AS seg, n FROM s{r}
    )""")
    return ",\n    ".join(parts)


def bpe_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    n_merges: int = 8,
    end_marker: str = "</w>",
) -> str:
    """DuckDB mirror of :func:`bpe_train`, generated in lockstep: the fixed
    merge count unrolls into the shared chain — per merge, the weighted
    adjacent pair count, the (cnt DESC, pair ASC) argmax, and the identical
    doubled-separator leftmost replace — so the learned merge table matches
    bit-exactly."""
    selects = "\n    UNION ALL\n    ".join(
        f"SELECT CAST({r} AS INT) AS merge_rank, pair, "
        f"replace(pair, ' ', '') AS merged FROM b{r}"
        for r in range(n_merges)
    )
    chain = _bpe_chain_sql(table, text_col, n_merges, end_marker)
    return f"WITH {chain}\n    {selects}"


def bpe_segment_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 8,
    end_marker: str = "</w>",
) -> str:
    """DuckDB mirror of :func:`bpe_segment`: the same MATERIALIZED merge
    chain, then the per-doc word stream joined to the final segmentation."""
    chain = _bpe_chain_sql(table, text_col, n_merges, end_marker)
    return f"""WITH {chain},
    doc_words AS (
      SELECT {id_col}, w FROM (
        SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS w
        FROM {table}
      ) WHERE w <> ''
    )
    SELECT d.{id_col},
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(len(string_split(s.seg, ' '))) AS BIGINT) AS n_bpe_tokens
    FROM doc_words d JOIN s{n_merges} s USING (w)
    GROUP BY d.{id_col}"""


def lm_bigram_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style language-model quality scoring with a corpus-trained
    BIGRAM model: documents whose word transitions are typical of the
    corpus score high, boilerplate/garbled text scores low — the cheap
    statistical stand-in for the KenLM perplexity filter the
    CCNet/RedPajama pipelines run before expensive model scoring.

    Model: Laplace-smoothed MLE, p(w2|w1) = (C(w1 w2) + 1) / (C(w1) + V),
    trained on the corpus being scored (one pass). Score = the arithmetic
    mean transition probability over the doc's bigrams, in EXACT math:
    each probability is floored to micro-units BEFORE summing, so the
    per-doc sum is an order-independent BIGINT and the score reproduces
    bit-exactly in the DuckDB oracle (the log-domain average would hinge
    on libm ulp agreement — a rational mean doesn't). Docs with no
    transition (0- or 1-word) have nothing to score and are absent from
    the output.

    Scale shape: the count tables are vocabulary-sized (V unigrams, ≤V²
    but corpus-bounded bigrams); the doc-bigram stream joins them on token
    keys — two shuffle-friendly equi-joins, partial-agg counts, no window,
    no Python. Output: (doc_id, n_bigrams, lm_score)."""
    toks = tokens(text_col)
    pairs = df.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size(toks) >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - 2),
                    lambda j: F.struct(
                        F.element_at(toks, j + 1).alias("w1"),
                        F.element_at(toks, j + 2).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("bg"),
    ).select(F.col(id_col), F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    c2 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = c1.agg(F.count(F.lit(1)).alias("v"))
    p_micro = F.floor(
        (F.col("c2") + 1) * 1_000_000 / (F.col("c1") + F.col("v")) + F.lit(0.5)
    ).cast("long")
    scored = (
        pairs.join(c2, ["w1", "w2"])
        .join(c1.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(p_micro).alias("sum_micro"),
        )
    )
    return scored.select(
        id_col,
        "n_bigrams",
        d_round(
            F.col("sum_micro") / (F.lit(1_000_000.0) * F.col("n_bigrams")), 6
        ).alias("lm_score"),
    )

"""Driver-local BPE training over the vocabulary-bounded word table.

:func:`operators.text.bpe_train` runs Sennrich-style BPE as ``n_merges``
distributed iterations (pair-count aggregate + 1-row argmax + literal
re-segmentation, one eager ``localCheckpoint`` job each) over the
word-frequency table. That table is VOCABULARY-sized — one row per distinct
word, ~1M rows at any corpus size (the operator's own scale contract) — so
past the single corpus pass that builds it, the whole merge loop is work
over a driver-collectable frame. This module dispatches exactly like the
round's connected-components union-find fast path (``dedup.py``,
``_CC_COLLECT_MAX_PAIRS``): up to ``_BPE_COLLECT_MAX_WORDS`` distinct words
(limit-capped collect, a few MB of strings), the merge loop runs locally as
the textbook in-memory algorithm — which is also how production tokenizer
trainers work (Sennrich et al. 2016 release, SentencePiece, HF tokenizers:
one pass builds word counts, the merge loop is in-memory; a distributed
loop at real merge counts — 30k+ for a production vocab — would be 2 jobs
per merge). Over the cap, the UNCHANGED distributed loop runs on the same
(checkpointed) word table, so the corpus is never re-scanned.

Equivalence to the distributed loop is exact and pinned
(``tests/test_bpe_local.py``): integer pair counts, the same
``(cnt DESC, pair ASC)`` argmax — ties compared on the JOINED pair string,
byte order, exactly as Spark compares the ``pair`` column (UTF-8 byte order
== code-point order == Python ``str`` order) — and a left-to-right
non-overlapping merge pass, the semantics the loop's doubled-separator
``replace`` reproduces (and which the independent-reference test has always
pinned it against). The catalog rows stay on their existing DuckDB oracles.

This module deliberately does NOT edit ``operators.text``: the distributed
implementation there is unchanged (it is this module's over-cap fallback),
and the 16 other catalog rows hashing ``text.py`` keep their recorded
evidence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .text import _bpe_merge_loop, _bpe_words

# One row per DISTINCT word; ~35 bytes/row at English-ish word lengths, so
# the cap bounds the collect at a few MB — the k-means-literal / union-find
# collect class (guide §5: the driver does no DATA work; a vocabulary is an
# artifact, not data). Same cap value as dedup._CC_COLLECT_MAX_PAIRS.
_BPE_COLLECT_MAX_WORDS = 65_536

# Schemas match the distributed paths exactly (nullability included):
# merge_rank is a non-null literal; pair/merged come from a min-aggregate
# that is NULL when a tiny corpus runs out of adjacent pairs.
_MERGE_SCHEMA = StructType(
    [
        StructField("merge_rank", IntegerType(), False),
        StructField("pair", StringType(), True),
        StructField("merged", StringType(), True),
    ]
)
_SEG_SCHEMA = StructType(
    [
        StructField("w", StringType(), True),
        StructField("seg", StringType(), True),
        StructField("n", LongType(), True),
    ]
)


def _collect_words(words: DataFrame) -> tuple[DataFrame, list | None]:
    """Materialize the word-frequency table once (lazy ``localCheckpoint``
    — vocabulary-sized, the same storage the distributed loop's first
    eager checkpoint already pins) and try the capped collect. Returns the
    checkpointed frame (the fallback loop reads it, so the corpus-pass
    aggregation is never recomputed) and the collected ``(w, n)`` rows, or
    ``None`` when the vocabulary exceeds the cap.

    Documented trade: on the FAST path the checkpointed table (≤ cap rows,
    a few MB) stays in executor storage until the ContextCleaner GCs the
    frame — checkpoint storage has no public unpersist handle. The
    alternative (collect first, checkpoint only on fallback) would cost the
    over-cap path a SECOND full corpus aggregation, which is the wrong
    side of the trade at 100 TB; a leaked few-MB block per train call on
    toy corpora is not."""
    ck = words.localCheckpoint(eager=False)
    rows = ck.limit(_BPE_COLLECT_MAX_WORDS + 1).collect()
    if len(rows) > _BPE_COLLECT_MAX_WORDS:
        return ck, None
    return ck, [(r[0], r[1]) for r in rows]


def _local_merge_loop(
    word_freqs: list, n_merges: int, end_marker: str
) -> tuple[list, list]:
    """The textbook merge loop, faithful to the distributed semantics:

    * pair counts are word-frequency-weighted integer sums over adjacent
      symbol pairs;
    * the argmax is (count DESC, pair ASC) with the tie broken on the
      space-JOINED pair string — NOT the (left, right) tuple: for symbols
      containing code points below U+0020 the two orders differ, and Spark
      compares the joined ``pair`` column;
    * a merge round is one left-to-right non-overlapping pass per word
      (``a b a b`` -> ``ab ab`` in one round), exactly what the
      distributed loop's doubled-separator leftmost ``replace`` computes;
    * an exhausted corpus (no adjacent pairs anywhere) emits NULL ranks
      and leaves the segmentation untouched, like the loop's NULL-argmax
      branch.

    Returns ``(merge_rows, seg_rows)``: ``[(rank, pair|None, merged|None)]``
    and ``[(w, seg, n)]`` sorted by ``w`` for determinism."""
    segs: dict[str, list[str]] = {
        w: list(w) + [end_marker] for w, _ in word_freqs
    }
    freqs = {w: int(n) for w, n in word_freqs}
    merge_rows: list[tuple] = []
    for r in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, sym in segs.items():
            n = freqs[w]
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            merge_rows.append((r, None, None))
            continue
        best = min(
            counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )[0]
        merge_rows.append((r, f"{best[0]} {best[1]}", best[0] + best[1]))
        for w, sym in segs.items():
            if len(sym) < 2:
                continue
            new, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    new.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    new.append(sym[i])
                    i += 1
            segs[w] = new
    seg_rows = [
        (w, " ".join(segs[w]), freqs[w]) for w in sorted(segs)
    ]
    return merge_rows, seg_rows


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    end_marker: str = "</w>",
) -> DataFrame:
    """:func:`operators.text.bpe_train` with the driver-local fast path:
    same merge table ``(merge_rank, pair, merged)``, same oracle. One
    corpus pass (the word-frequency aggregate) + one capped collect + a
    local merge loop replaces ``n_merges`` checkpoint jobs and the final
    8-subtree union plan; over the cap, the distributed loop runs
    unchanged on the already-materialized word table."""
    ck, wf = _collect_words(_bpe_words(df, text_col))
    if wf is None:
        merge_rows, _seg = _bpe_merge_loop(ck, n_merges, end_marker)
        out = merge_rows[0]
        for m in merge_rows[1:]:
            out = out.unionByName(m)
        return out
    local_rows, _ = _local_merge_loop(wf, n_merges, end_marker)
    return df.sparkSession.createDataFrame(local_rows, _MERGE_SCHEMA)


def bpe_segment(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 8,
    end_marker: str = "</w>",
) -> DataFrame:
    """:func:`operators.text.bpe_segment` with the driver-local trainer:
    the per-word segmentation comes back as a LOCAL vocabulary frame
    (broadcast-sized by the same cap) and the apply half — one
    corpus-token-sized equi-join against it — is verbatim the distributed
    operator's tail, so the output frame is identical."""
    ck, wf = _collect_words(_bpe_words(df, text_col))
    if wf is None:
        _, seg = _bpe_merge_loop(ck, n_merges, end_marker)
    else:
        _, seg_rows = _local_merge_loop(wf, n_merges, end_marker)
        seg = df.sparkSession.createDataFrame(seg_rows, _SEG_SCHEMA)
    vocab = seg.select(
        "w", F.size(F.split(F.col("seg"), " ")).alias("w_tokens")
    )
    if wf is not None:
        # The local vocabulary frame is a stats-less LogicalRDD (planner
        # default: huge), so without the hint the ESTIMATE-based join
        # build side lands on the corpus. It is cap-bounded (<= 65 536
        # rows) by construction — always broadcast-safe; the over-cap
        # fallback keeps the AQE runtime decision, as the distributed
        # operator always has.
        vocab = F.broadcast(vocab)
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

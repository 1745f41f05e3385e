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

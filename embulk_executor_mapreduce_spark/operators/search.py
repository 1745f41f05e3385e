"""Ranked retrieval over the corpus: BM25 scoring (Robertson et al.,
"Okapi at TREC-3", 1995 — the default lexical ranking function in Lucene/
Elasticsearch) — the USE side of the inverted-index family
(``inverted_index_postings`` builds the structure, ``phrase_search`` does
boolean matching; this ranks).

Why a training-data pipeline wants it at 100 TB: retrieval-based quality
filtering, decontamination-by-retrieval (find near-matches of benchmark
questions), and hard-negative mining all reduce to "score the corpus
against a small query term set" — a job whose cost must scale with the
matching postings, never the corpus vocabulary.

Scale shape (the engine's standard discipline):

* the corpus-sized work is ONE token explode; the tf branch filters to
  the QUERY terms before its aggregate, so its exchange carries only
  matching (doc, term) rows;
* document lengths are a second linear aggregate (in a standing
  deployment ``dl`` is a precomputed column — accept it via ``doc_lens``
  to skip that scan);
* per-term document frequencies and the (N, Σdl) stats are
  candidate-bounded / 1-row frames, broadcast;
* the final top-k is a TakeOrdered — no global sort, no single-partition
  window.

Float discipline (exactmath): the per-(doc, term) contribution is
computed from integer counts through a FIXED parenthesization of IEEE
add/mul/div (deterministic cross-engine), floored to integer micro-units,
and the per-doc score is a BIGINT sum — summation-order-proof, so the
DuckDB oracle replays the value hash exactly. The IDF is the RATIONAL
Robertson–Spärck-Jones core ``(N - df + 0.5) / (df + 0.5)`` without the
usual ``ln`` dampening: ``ln`` is not an IEEE correctly-rounded
operation, so its low bits may differ across engines and no value-hash
oracle could pin it. The rational form is itself a member of the IDF
family (the undamped RSJ odds ratio), but NOT a drop-in ranking
equivalent: rankings agree with log-BM25 for single-term queries and when
the query terms have similar document frequencies; for multi-term queries
over terms of very different rarity the undamped form over-weights the
rare term (its IDF grows linearly rather than logarithmically in N/df),
so a document matching one rare term can outrank one matching several
moderately-rare terms where standard BM25 orders them the other way (r14
advisor finding). Callers who need standard BM25 behavior — e.g.
decontamination or hard-negative mining tuned against Lucene-style
scores — and don't need cross-engine bit-equality should use the ``ln``
dampened variant: swap the rational IDF factor for
``F.log((n - df + 0.5) / (df + 0.5) + 1.0)`` (the Lucene form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    doc_lens: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` documents by rational-IDF BM25 against ``query_terms``
    (k1 = 1.2, b = 0.75 — the standard constants). Returns
    ``(doc_id, bm25)`` with bm25 in exact micro-units / 1e6.

    ``doc_lens``: an optional precomputed ``(id_col, dl)`` table (the
    standing-deployment path — length is a write-time column); omitted,
    one linear aggregate computes it."""
    from .text import tokens

    tok = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    if doc_lens is None:
        dl = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    else:
        dl = doc_lens.select(id_col, "dl")
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sumdl")
    )
    tf = (
        tok.filter(F.col("term").isin(*query_terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # FIXED parenthesization — the DuckDB oracle mirrors it token-for-token
    contrib = (
        (
            (F.col("n") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        )
        * (
            (F.col("tf") * F.lit(2.2))
            / (
                F.col("tf")
                + F.lit(1.2)
                * (
                    F.lit(0.25)
                    + F.lit(0.75)
                    * (F.col("dl") * F.col("n"))
                    / F.col("sumdl")
                )
            )
        )
        * F.lit(1_000_000.0)
        + F.lit(0.5)
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.floor(contrib).cast("long").alias("c"),
        )
        .groupBy(id_col)
        .agg(F.sum("c").alias("smicro"))
    )
    return (
        scored.orderBy(F.col("smicro").desc(), F.col(id_col))
        .limit(k)
        .select(
            id_col, (F.col("smicro") / F.lit(1_000_000.0)).alias("bm25")
        )
    )


def bm25_oracle_sql(
    query_terms: tuple[str, ...],
    table: str = "documents",
    k: int = 10,
) -> str:
    """DuckDB mirror of :func:`bm25_topk` — identical parenthesization,
    identical micro-unit floor, BIGINT summation."""
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM {table}
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id
    ), stats AS (
      SELECT count(*) AS n, sum(dl) AS sumdl FROM dl
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term IN ({terms}) GROUP BY doc_id, term
    ), dfq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), contrib AS (
      SELECT t.doc_id,
             CAST(floor(
               ((s.n - d.df + 0.5) / (d.df + 0.5))
               * ((t.tf * 2.2)
                  / (t.tf + 1.2 * (0.25 + 0.75 * (l.dl * s.n) / s.sumdl)))
               * 1000000.0 + 0.5
             ) AS BIGINT) AS c
      FROM tf t JOIN dfq d USING (term) JOIN dl l USING (doc_id), stats s
    ), sc AS (
      SELECT doc_id, sum(c) AS smicro FROM contrib GROUP BY doc_id
    )
    SELECT doc_id, CAST(smicro AS BIGINT) / 1000000.0 AS bm25 FROM (
      SELECT *, row_number() OVER (ORDER BY smicro DESC, doc_id) AS rn
      FROM sc
    ) WHERE rn <= {k}
    """

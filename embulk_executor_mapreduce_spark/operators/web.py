"""Web-corpus URL operators: canonicalization + registrable-domain
extraction (training-data pipeline front door).

The reference engine has no URL surface (SURVEY §2.3 declare-nothing list);
this is north-star extension work: the first pass of every web-crawl corpus
pipeline (CommonCrawl-style) keys documents by a CANONICAL URL — without it
``http://Example.com:80/a//b/?utm_source=x&id=1#frag`` and
``http://example.com/a/b?id=1`` count as different documents and URL-level
dedup/caps silently undercount.

Spark-first: every step is a built-in JVM-side expression (regexp_extract /
regexp_replace / split / filter / array_sort / concat) — no Python UDF, so
the whole pass stays inside whole-stage codegen and is map-only at any
scale. Canonicalization rules (the common subset of RFC 3986 normalization
+ crawl-pipeline conventions):

* scheme and host lowercase;
* default ports stripped (http:80, https:443), others kept;
* path: duplicate slashes collapsed, trailing slash stripped (root stays
  ``/`` when the path is empty);
* query: tracking params dropped (``utm_*``, ``gclid``, ``fbclid``),
  remaining params sorted for order-insensitive identity;
* fragment dropped.

Registrable domain uses the standard 2-label rule with a ccTLD second-level
heuristic (``co.uk``-style: 3 labels when the TLD is 2 letters and the
second level is a known registry label) — a documented approximation of the
Public Suffix List, which is a data file, not an algorithm.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: second-level registry labels that make a 2-letter ccTLD take 3 labels
CC_SLD = ("ac", "co", "com", "edu", "gov", "net", "org")

#: query params dropped during canonicalization (tracking/session noise)
TRACKING_PARAM_RE = "^(utm_[a-z]+|gclid|fbclid)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def canonical_url_columns(url: Column) -> dict[str, Column]:
    """The canonicalization pipeline as named Column expressions (exposed
    separately so spec-level callers can project a subset)."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    authority = F.regexp_extract(url, _AUTHORITY_RE, 1)
    host = F.lower(F.regexp_extract(authority, r"^([^:]*)", 1))
    port = F.regexp_extract(authority, r":([0-9]+)$", 1)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    canon_port = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_extract(url, _PATH_RE, 1)
    canon_path = F.regexp_replace(path, "/{2,}", "/")
    canon_path = F.regexp_replace(canon_path, "(.)/$", "$1")
    canon_path = F.when(canon_path == "", F.lit("/")).otherwise(canon_path)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
    )
    canon_query = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        canon_port,
        canon_path,
        F.when(canon_query == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), canon_query)
        ),
    )
    labels = F.split(host, r"\.")
    n = F.size(labels)
    cc_3label = (
        (n >= 3)
        & F.element_at(labels, -2).isin(list(CC_SLD))
        & (F.length(F.element_at(labels, -1)) == 2)
    )
    registrable = (
        F.when(n <= 2, host)
        .when(cc_3label, F.concat_ws(".", F.slice(labels, -3, 3)))
        .otherwise(F.concat_ws(".", F.slice(labels, -2, 2)))
    )
    return {
        "canon_url": canon,
        "host": host,
        "registrable_domain": registrable,
    }


def url_canonicalize(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append ``canon_url``, ``host``, ``registrable_domain`` — the key
    columns URL-level dedup (`dedup_exact` on ``canon_url``) and per-domain
    caps (`sample_k_per_group` on ``registrable_domain``) group by."""
    cols = canonical_url_columns(F.col(url_col))
    out = df
    for name, col in cols.items():
        out = out.withColumn(name, col)
    return out

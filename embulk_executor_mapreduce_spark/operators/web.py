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

* scheme and host lowercase; userinfo (``user:pass@``) stripped;
* bracketed IPv6 authorities (``[::1]:8080``) parse host/port correctly;
* default ports stripped (http:80, https:443), others kept;
* path: duplicate slashes collapsed, trailing slash stripped (root stays
  ``/`` when the path is empty);
* query taken from the PRE-FRAGMENT substring only (``/p#a?b=1`` has NO
  query), tracking params dropped (``utm_*``, ``gclid``, ``fbclid`` — with
  or without a ``=value``), remaining params sorted for order-insensitive
  identity;
* fragment dropped.

Scheme-less inputs (no ``scheme://``) are out of contract for this crawl
front door, where URLs are absolute: they canonicalize to a degenerate
``"://"``-prefixed string with an empty host (never raising — the
degenerate-input tests pin that), and their registrable domain is the empty
string. Callers holding relative or scheme-less references should absolutize
them upstream; NULL in propagates NULL out.

Registrable domain uses the standard 2-label rule with a ccTLD second-level
heuristic (``co.uk``-style: 3 labels when the TLD is 2 letters and the
second level is a known registry label) — a documented approximation of the
Public Suffix List; IP-literal hosts (v4 dotted-quad or bracketed v6) are
their own registrable domain. For production-grade PSL semantics, pass the
real list as a table to :func:`registrable_domain_psl` (the PSL is a data
file, not an algorithm — the broadcast join below is the algorithm).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: second-level registry labels that make a 2-letter ccTLD take 3 labels
CC_SLD = ("ac", "co", "com", "edu", "gov", "net", "org")

#: query params dropped during canonicalization (tracking/session noise);
#: matches both `utm_x=v` and bare `gclid` forms
TRACKING_PARAM_RE = "^(utm_[a-z]+|gclid|fbclid)(=|$)"

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"


def canonical_url_columns(url: Column) -> dict[str, Column]:
    """The canonicalization pipeline as named Column expressions (exposed
    separately so spec-level callers can project a subset)."""
    # fragment is dropped FIRST: everything downstream (query especially)
    # must never see `#...` content — `/p#a?b=1` has no query
    pre_frag = F.regexp_extract(url, r"^([^#]*)", 1)
    scheme = F.lower(F.regexp_extract(pre_frag, _SCHEME_RE, 1))
    authority = F.regexp_extract(pre_frag, _AUTHORITY_RE, 1)
    # strip userinfo: host is everything after the last `@`
    hostport = F.element_at(F.split(authority, "@"), -1)
    is_v6 = hostport.startswith("[")
    host = F.lower(
        F.when(
            is_v6, F.regexp_extract(hostport, r"^(\[[^\]]*\])", 1)
        ).otherwise(F.regexp_extract(hostport, r"^([^:]*)", 1))
    )
    port = F.when(
        is_v6, F.regexp_extract(hostport, r"\]:([0-9]+)$", 1)
    ).otherwise(F.regexp_extract(hostport, r"^[^:]*:([0-9]+)$", 1))
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    canon_port = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_extract(pre_frag, _PATH_RE, 1)
    canon_path = F.regexp_replace(path, "/{2,}", "/")
    canon_path = F.regexp_replace(canon_path, "(.)/$", "$1")
    canon_path = F.when(canon_path == "", F.lit("/")).otherwise(canon_path)
    query = F.regexp_extract(pre_frag, r"\?(.*)$", 1)
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
    ip_literal = is_v6 | host.rlike(r"^[0-9]+(\.[0-9]+){3}$")
    registrable = (
        # NULL url propagates as NULL (concat_ws in the branches below
        # would otherwise swallow it into '')
        F.when(host.isNull(), F.lit(None).cast("string"))
        .when(ip_literal | (n <= 2), host)
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


def registrable_domain_psl(
    df: DataFrame,
    psl: DataFrame,
    host_col: str = "host",
    max_labels: int = 6,
) -> DataFrame:
    """Exact Public-Suffix-List registrable domain: replaces the heuristic
    ``registrable_domain`` with the longest-suffix-match rule against a
    user-supplied PSL table (one column ``suffix``, e.g. ``com``,
    ``co.uk``, ``gov.uk`` — wildcard/exception rules pre-expanded by the
    caller, as public PSL tooling does).

    Scale shape: the PSL is ~10k rows → ``broadcast`` join; each host
    contributes its ≤``max_labels`` dot-suffixes via an in-plan
    transform+explode (no Python), and the longest matching suffix wins via
    a max_by aggregation keyed on the host — one broadcast hash join plus
    one partial-aggregatable groupBy at any corpus size."""
    for taken in ("__psl_suffix", "registrable_domain_psl"):
        if taken in df.columns:
            # mirror the snapshot_diff marker-collision guard (ADVICE r7):
            # the helper column joined back onto df would otherwise raise an
            # ambiguous-column AnalysisException or silently overwrite
            raise ValueError(
                f"column {taken!r} already exists in the input frame; "
                "registrable_domain_psl reserves it"
            )
    labels = F.split(F.col(host_col), r"\.")
    n = F.size(labels)
    depth = F.least(n, F.lit(max_labels))
    suffixes = F.transform(
        F.sequence(F.lit(1), depth),
        lambda i: F.concat_ws(".", F.slice(labels, -i, i)),
    )
    exploded = df.select(
        F.col(host_col), F.explode(suffixes).alias("__suffix")
    ).dropDuplicates([host_col, "__suffix"])
    matched = exploded.join(
        F.broadcast(psl.select(F.col("suffix").alias("__suffix"))),
        "__suffix",
    )
    best = matched.groupBy(host_col).agg(
        F.max_by(
            "__suffix", F.size(F.split(F.col("__suffix"), r"\."))
        ).alias("__psl_suffix")
    )
    out = df.join(best, host_col, "left")
    suffix_n = F.size(F.split(F.col("__psl_suffix"), r"\."))
    reg = F.when(
        F.col("__psl_suffix").isNull() | (n <= suffix_n), F.col(host_col)
    ).otherwise(
        F.concat_ws(".", F.slice(labels, -(suffix_n + F.lit(1)), suffix_n + F.lit(1)))
    )
    return out.withColumn("registrable_domain_psl", reg).drop("__psl_suffix")

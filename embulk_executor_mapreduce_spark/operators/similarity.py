"""Similarity search over embedding columns (array<float>).

Scale design: the query side is small (a handful of probe vectors) and gets
broadcast; the candidate side is the 100 TB scan. Brute-force cosine is the
baseline (one pass, no shuffle until top-k); the LSH-bucketed variant prunes
candidates by sign-hash bucket equality before scoring, turning the cross
product into an equi-join Catalyst shuffles on bucket keys.

Float discipline: dot products fold left-to-right over doubles
(``F.aggregate`` — sequential, deterministic) which is bit-identical to
DuckDB's ``list_dot_product`` on ``DOUBLE[]`` (verified empirically), so the
oracle can compare rounded cosine values safely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..exactmath import d_round


def as_double(col) -> Column:
    return F.transform(col if isinstance(col, Column) else F.col(col), lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def brute_force_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids: tuple[int, ...] = (0, 1, 2, 3),
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: broadcast the query vectors against a single scan
    of the candidate set, window top-k per query. No O(n²) — O(n_q × n)."""
    # norms precomputed per ROW: 1 dot per (query, cand) pair instead of 3;
    # sqrt(dot(v,v)) is bit-identical pre- or post-join, so oracle parity holds
    base = df.select(F.col(id_col), as_double(vec_col).alias("v")).withColumn(
        "nrm", F.sqrt(dot(F.col("v"), F.col("v")))
    )
    q = base.filter(F.col(id_col).isin(*query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cand = base.select(
        F.col(id_col).alias("cand_id"), F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    scored = (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            d_round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "cand_id", "cos_sim")
    )


def _hyperplane(dim: int, table: int, plane: int) -> list[float]:
    """Deterministic pseudo-random ±1 hyperplane derived from
    (table, plane, i) via a fixed integer mix — reproducible across runs,
    no RNG state to ship to executors."""
    out = []
    for i in range(dim):
        x = (table * 2_654_435_761 + plane * 1_000_003 + i * 7_919 + 12_345) % 97
        out.append(1.0 if x % 2 == 0 else -1.0)
    return out


def lsh_bucket_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids: tuple[int, ...] = (0, 1, 2, 3),
    k: int = 5,
    n_tables: int = 6,
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane (SimHash) LSH.

    Each of ``n_tables`` hash tables buckets vectors by ``n_planes`` sign
    bits; a candidate is scored iff it shares a (table, bucket) with the
    query — the classic recall/cost dial (more tables → higher recall, more
    candidates). Scale shape: candidates come from an equi-join on the
    (table, bucket) key — one shuffle of the big side on a
    ``n_tables × 2^n_planes``-cardinality key, never a cross join; distinct
    (query, cand) pairs are scored once.
    """
    planes = {
        (t, p): _hyperplane(dim, t, p)
        for t in range(n_tables)
        for p in range(n_planes)
    }
    base = df.select(F.col(id_col), as_double(vec_col).alias("v"))

    def table_buckets(vcol: Column) -> Column:
        """array of per-table bucket structs for one vector."""
        entries = []
        for t in range(n_tables):
            bucket = F.lit(0)
            for p in range(n_planes):
                plane_arr = F.array(*[F.lit(x) for x in planes[(t, p)]])
                bucket = bucket + F.when(dot(vcol, plane_arr) >= 0, 1 << p).otherwise(0)
            entries.append(F.struct(F.lit(t).alias("t"), bucket.alias("b")))
        return F.array(*entries)

    hashed = base.select(
        id_col, "v", F.explode(table_buckets(F.col("v"))).alias("tb")
    ).select(id_col, "v", F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))

    q = hashed.filter(F.col(id_col).isin(*query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"), "t", "b"
    )
    cand_pairs = (
        hashed.select(F.col(id_col).alias("cand_id"), F.col("v").alias("cv"), "t", "b")
        .join(F.broadcast(q), ["t", "b"])
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", "qv", "cv")
        .dropDuplicates(["query_id", "cand_id"])
    )
    scored = cand_pairs.select(
        "query_id",
        "cand_id",
        d_round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "cand_id", "cos_sim")
    )


def lsh_topk_oracle_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids: tuple[int, ...] = (0, 1, 2, 3),
    k: int = 5,
    n_tables: int = 6,
    n_planes: int = 4,
    dim: int = 64,
) -> str:
    """DuckDB mirror of :func:`lsh_bucket_topk`, generated in lockstep: the
    hyperplanes are the SAME deterministic ±1 constants (:func:`_hyperplane`),
    inlined as array literals, so bucket membership — and therefore the exact
    candidate set — is reproducible in ANSI SQL. Sign decisions compare a
    sequential-fold dot (Spark) against ``list_dot_product`` (DuckDB), which
    are bit-identical on doubles (module docstring)."""
    bucket_cols = []
    for t in range(n_tables):
        terms = []
        for p in range(n_planes):
            arr = ", ".join(
                ("1.0" if x > 0 else "-1.0") for x in _hyperplane(dim, t, p)
            )
            terms.append(
                f"(CASE WHEN list_dot_product(v, [{arr}]) >= 0"
                f" THEN {1 << p} ELSE 0 END)"
            )
        bucket_cols.append(" + ".join(terms) + f" AS b{t}")
    structs = ", ".join(
        f"struct_pack(t := {t}, b := b{t})" for t in range(n_tables)
    )
    qids = ", ".join(str(q) for q in query_ids)
    return f"""
    WITH base AS (
      SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {table}
    ), bucketed AS (
      SELECT {id_col}, v, {', '.join(bucket_cols)} FROM base
    ), hashed AS (
      SELECT {id_col}, unnest([{structs}]) AS tb FROM bucketed
    ), h2 AS (
      SELECT {id_col}, tb.t AS t, tb.b AS b FROM hashed
    ), q AS (
      SELECT {id_col} AS query_id, t, b FROM h2 WHERE {id_col} IN ({qids})
    ), pairs AS (
      SELECT DISTINCT q.query_id, c.{id_col} AS cand_id
      FROM h2 c JOIN q ON c.t = q.t AND c.b = q.b
      WHERE c.{id_col} <> q.query_id
    ), scored AS (
      SELECT p.query_id, p.cand_id,
             floor((list_dot_product(qb.v, cb.v)
                   / (sqrt(list_dot_product(qb.v, qb.v))
                      * sqrt(list_dot_product(cb.v, cb.v)))) * 1000000 + 0.5)
               / 1000000.0 AS cos_sim
      FROM pairs p
      JOIN base qb ON qb.{id_col} = p.query_id
      JOIN base cb ON cb.{id_col} = p.cand_id
    )
    SELECT query_id, cand_id, cos_sim FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rn
      FROM scored
    ) WHERE rn <= {k}
    """


def ivf_centroids(
    base: DataFrame, id_col: str, n_centroids: int
) -> DataFrame:
    """Fixed-size centroid table: the ``n_centroids`` lowest-id vectors.

    The table is EXACTLY ``n_centroids`` rows no matter how big the corpus is
    (the round-1 ``id % 50`` sample grew with the corpus — a 2 TB broadcast at
    100 TB). A deterministic id-prefix sample stands in for k-means output —
    a real deployment swaps the k-means table in; every downstream plan shape
    (broadcast assignment, list equi-join) is unchanged.
    """
    return base.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )


def pq_adc_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids: tuple[int, ...] = (0, 1, 2, 3),
    k: int = 5,
    n_sub: int = 4,
    sub_dim: int = 16,
    n_codes: int = 16,
) -> DataFrame:
    """Product-quantization top-k with asymmetric distance computation (ADC).

    Each vector is split into ``n_sub`` subvectors; each subvector is coded
    as its nearest of ``n_codes`` codewords (L2), so a 64-float vector
    compresses to 4 small codes — the memory move that makes billion-scale
    ANN fit. Queries are NOT quantized: per query we build a tiny
    (sub, code) → distance lookup table and the approximate distance is the
    sum of table entries selected by each candidate's codes.

    Scale shape:
      * the codebook is ``n_sub × n_codes`` rows — broadcast, corpus-independent
        (same discipline as :func:`ivf_centroids`);
      * encoding is one corpus scan joined to the broadcast codebook, with the
        argmin done as a ``max(struct(-dsq, -code))`` partial aggregate — the
        exchange carries n·n_sub coded rows, never n·n_sub·n_codes;
      * ADC is an equi-join of the coded corpus against the broadcast
        per-query distance table, then an exact integer sum per candidate —
        no full-vector math touches the corpus after encoding.

    Codewords here are the subvectors of the ``n_codes`` lowest-id vectors —
    a deterministic stand-in for an offline k-means codebook (swap-in leaves
    every plan shape unchanged).

    Float discipline: subspace distances use three sequential-fold dots
    (``dot(a,a) - 2·dot(a,b) + dot(b,b)``) — bit-identical to DuckDB's
    ``list_dot_product`` — then are rounded to integer micro-units BEFORE the
    cross-subspace sum, so the final aggregate is exact BIGINT math (no
    summation-order sensitivity).
    """
    from .partitioning import spread_narrow

    # distance math is CPU-bound; don't serialize it on a one-file scan
    # (spread key ≠ the (vec_id, s) group key, so the encoding exchange
    # survives — measured -18% at sf0.1, no-op on wide scans)
    df = spread_narrow(df, id_col)
    base = df.select(F.col(id_col), as_double(vec_col).alias("v"))
    sub_ix = F.explode(F.array(*[F.lit(s) for s in range(n_sub)])).alias("s")
    subs = base.select(id_col, "v", sub_ix).select(
        id_col,
        "s",
        F.slice(F.col("v"), F.col("s") * sub_dim + 1, sub_dim).alias("sv"),
    )
    codebook = subs.filter(F.col(id_col) < n_codes).select(
        "s", F.col(id_col).alias("code"), F.col("sv").alias("cv")
    )

    def dsq(a: Column, b: Column) -> Column:
        return dot(a, a) - F.lit(2.0) * dot(a, b) + dot(b, b)

    enc = (
        subs.join(F.broadcast(codebook), "s")
        .select(
            id_col,
            "s",
            "code",
            dsq(F.col("sv"), F.col("cv")).alias("d"),
        )
        .groupBy(id_col, "s")
        .agg(F.max(F.struct((-F.col("d")).alias("nd"), (-F.col("code")).alias("nc"), F.col("code"))).alias("m"))
        .select(F.col(id_col).alias("cand_id"), "s", F.col("m.code").alias("code"))
    )
    dtab = (
        subs.filter(F.col(id_col).isin(*query_ids))
        .join(F.broadcast(codebook), "s")
        .select(
            F.col(id_col).alias("query_id"),
            "s",
            "code",
            F.floor(dsq(F.col("sv"), F.col("cv")) * 1_000_000 + F.lit(0.5))
            .cast("long")
            .alias("pdist"),
        )
    )
    adc = (
        enc.join(F.broadcast(dtab), ["s", "code"])
        .filter(F.col("cand_id") != F.col("query_id"))
        .groupBy("query_id", "cand_id")
        .agg(F.sum("pdist").alias("ssum"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("ssum"), F.col("cand_id"))
    return (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "cand_id",
            (F.col("ssum") / F.lit(1_000_000.0)).alias("adc_dist"),
        )
    )


def ivf_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids: tuple[int, ...] = (0, 1, 2, 3),
    k: int = 5,
    n_centroids: int = 64,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize vectors to their nearest
    centroid (inverted lists), probe only the query's ``nprobe`` nearest
    lists.

    Centroids are a FIXED-k deterministic table (:func:`ivf_centroids`) —
    assignment broadcasts k vectors (corpus-independent memory) over one
    corpus scan, cost O(n·k) like real IVF; the probe is an equi-join on the
    centroid id — the corpus shuffles once on list id, never O(n·n_q).

    Assignment is an aggregate, not a window: ``max(struct(csim, -cid, ...))``
    per vector id gets map-side partial aggregation, so the exchange carries
    one row per vector — a ``row_number()`` window over the k-way crossJoin
    output would shuffle k·n rows (64× the volume at k=64). The (csim, -cid)
    prefix reproduces the window's (csim DESC, cid ASC) tie-break exactly;
    the trailing fields ride along un-compared because cid is unique.
    """
    from .partitioning import spread_narrow

    # k dot products per corpus vector is CPU-bound; spread a one-file scan
    # first (spread key ≠ the vec_id group key — assignment exchange
    # survives; measured -30% at sf0.1, no-op on wide scans)
    df = spread_narrow(df, id_col)
    base = df.select(F.col(id_col), as_double(vec_col).alias("v")).withColumn(
        "nrm", F.sqrt(dot(F.col("v"), F.col("v")))
    )
    cents = ivf_centroids(base, id_col, n_centroids)

    def cent_sims(side: DataFrame) -> DataFrame:
        return side.crossJoin(F.broadcast(cents)).select(
            F.col(id_col),
            "v",
            "nrm",
            "cid",
            d_round(
                dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn")), 6
            ).alias("csim"),
        )

    lists = (
        cent_sims(base)
        .groupBy(id_col)
        .agg(
            F.max(
                F.struct(
                    F.col("csim"),
                    (-F.col("cid")).alias("ncid"),
                    F.col("cid"),
                    F.col("v"),
                    F.col("nrm"),
                )
            ).alias("m")
        )
        .select(
            F.col(id_col).alias("cand_id"), F.col("m.v").alias("cv2"),
            F.col("m.nrm").alias("cn2"), F.col("m.cid").alias("cid"),
        )
    )
    w_assign = W.partitionBy(id_col).orderBy(F.col("csim").desc(), F.col("cid"))
    probes = (
        cent_sims(base.filter(F.col(id_col).isin(*query_ids)))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") <= nprobe)
        .select(
            F.col(id_col).alias("query_id"), F.col("v").alias("qv"),
            F.col("nrm").alias("qn"), "cid",
        )
    )
    scored = (
        lists.join(F.broadcast(probes), "cid")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            d_round(
                dot(F.col("qv"), F.col("cv2")) / (F.col("qn") * F.col("cn2")), 6
            ).alias("cos_sim"),
        )
        .dropDuplicates(["query_id", "cand_id"])
    )
    w_top = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= k)
        .select("query_id", "cand_id", "cos_sim")
    )

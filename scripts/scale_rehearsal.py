"""sf1 scale rehearsal (VERDICT r11 item 6): the first empirical point on
the 100x curve the plan docstrings argue for.

Synthesizes an sf1 dataset (10x the sf0.1 row counts) for the tables the
five most expensive bench entries touch — documents, embeddings, orders,
events — then runs each entry at sf0.1 and sf1 and records wall seconds
and total shuffle read/write bytes (Spark UI REST API, per-stage sums).
The scaling exponent alpha = log(m1/m01) / log(10) estimates m ~ n^alpha;
shuffle bytes are the cleaner signal at these sizes (wall time carries
fixed per-job scheduling overheads that deflate alpha at small sf and
inflate it when a stage tips over a task-count threshold).

Synthesis is deterministic (xxhash64-derived, no RNG) and happens OUT of
the measured window. The generated dir lives in /tmp and is never
committed; testdata itself is read-only and untouched.

Run: python scripts/scale_rehearsal.py [--entries a,b,c] [--runs 2]
Writes a JSON summary to stdout; paste the table into SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
import urllib.request
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/scale_rehearsal_sf1"

ENTRIES = [
    "spec_prep_pipeline",
    "semantic_dedup_two_level",
    "merge_table_changes",
    "ann_ivf_kmeans_topk",
    "ann_pq_kmeans_topk",
]


def _cdc_semantic_autok(spark, sf_dir: str):
    """SCALING §11d (VERDICT r13 item 8): the stream_cdc_semantic_ingest
    composition with AUTO-SIZED k (coarse_k/sub_k None → √k×√k from the
    first increment) instead of the catalog row's pinned 3×3 oracle
    fixture — measures the constant-leaf-occupancy claim instead of
    asserting it: with k tracking √n, per-leaf occupancy (and hence the
    within-cell quadratic) should stay ~flat across a 10× corpus."""
    import tempfile

    import pyspark.sql.functions as F

    from embulk_executor_mapreduce_spark.sinks.writer import (
        read_merge_state,
        write_sink,
    )
    from embulk_executor_mapreduce_spark.spec import SinkSpec
    from embulk_executor_mapreduce_spark.streaming.ingest import (
        run_cdc_semantic_ingest,
    )

    root = tempfile.mkdtemp(prefix="rehearse_cdc_sem_autok_")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    up = f"{root}/upstream"
    sink = SinkSpec(
        type="parquet",
        path=up,
        mode="merge",
        merge_key=("vec_id",),
        merge_order=("rev",),
        merge_keep_versions=4,
    )
    write_sink(emb.limit(0).withColumn("rev", F.lit(0)), sink)
    write_sink(
        emb.filter(F.col("vec_id") % 2 == 0).withColumn("rev", F.lit(1)), sink
    )
    write_sink(
        emb.filter(F.col("vec_id") % 2 == 1).withColumn("rev", F.lit(2)), sink
    )
    run_cdc_semantic_ingest(
        spark,
        up,
        ["vec_id"],
        f"{root}/state",
        f"{root}/corpus",
        f"{root}/cents",
        checkpoint=f"{root}/ckpt",
        # coarse_k/sub_k omitted → auto-sized from the first increment
        iters=2,
        threshold_micro=250_000,
    )
    return read_merge_state(spark, f"{root}/state").select(
        "cell", "scid", "vec_id"
    )


#: compositions rehearsed under a non-catalog configuration (the catalog
#: row pins an oracle fixture; the rehearsal measures the production knob)
EXTRA = {"stream_cdc_semantic_ingest_autok": _cdc_semantic_autok}


def synthesize_sf1(spark) -> None:
    """10x documents/embeddings/orders/events derived deterministically
    from the sf0.1 tables: originals kept verbatim, extensions sampled
    from the same vocab/value distributions with fresh ids (NOT replica
    copies — text replicas would manufacture 10-cliques of near-dups and
    skew the LSH pair volume far above a real 10x corpus)."""
    import pyspark.sql.functions as F

    import shutil

    out = Path(SF1)
    if all(
        (out / f"{t}.parquet").is_file()
        for t in ("documents", "embeddings", "orders", "events", "customer")
    ):
        print(f"# sf1 dir already synthesized at {SF1}", file=sys.stderr)
        return
    out.mkdir(parents=True, exist_ok=True)

    def write_single(df, table: str) -> None:
        """catalog.load footer-probes each table as a single FILE (the
        testdata layout), so land one part file and move it into place."""
        tmp = out / f"_{table}.tmp"
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        part = next(tmp.glob("part-*.parquet"))
        shutil.move(str(part), str(out / f"{table}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    vocab = sorted(
        r.w
        for r in docs.select(
            F.explode(F.split("text", " ")).alias("w")
        ).distinct().collect()
    )
    vocab_arr = F.array(*[F.lit(w) for w in vocab])
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    n_src = docs.select("source").distinct().count()
    base_n = docs.count()
    # max+1 span, NOT count-based range: collision-free even if the
    # generator ever emits sparse/non-zero-based ids (r12 review finding 6)
    doc_span = docs.agg(F.max("doc_id")).first()[0] + 1
    new_docs = (
        spark.range(doc_span, doc_span + base_n * 9)
        .select(F.col("id").alias("doc_id"))
        .withColumn(
            "n_words",
            (F.pmod(F.xxhash64("doc_id"), F.lit(91)) + 10).cast("int"),
        )
        .withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.col("n_words")),
                    lambda i: F.element_at(
                        vocab_arr,
                        (
                            F.pmod(
                                F.xxhash64(F.col("doc_id") * 1000 + i),
                                F.lit(len(vocab)),
                            )
                            + 1
                        ).cast("int"),
                    ),
                ),
                " ",
            ),
        )
        .withColumn(
            "lang",
            F.array(*[F.lit(x) for x in sorted(langs)])[
                F.pmod(F.xxhash64(F.col("doc_id") + 17), F.lit(len(langs))).cast(
                    "int"
                )
            ],
        )
        .withColumn(
            "source",
            F.concat(
                F.lit("src"),
                F.pmod(F.xxhash64(F.col("doc_id") + 31), F.lit(n_src)).cast(
                    "string"
                ),
            ),
        )
        .withColumn("n_chars", F.length("text"))
        .select("doc_id", "text", "lang", "source", "n_chars")
    )
    write_single(docs.unionByName(new_docs), "documents")

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    dim = len(emb.select("embedding").first().embedding)
    n_emb = emb.count()
    vec_span = emb.agg(F.max("vec_id")).first()[0] + 1
    new_emb = (
        spark.range(vec_span, vec_span + n_emb * 9)
        .select(F.col("id").alias("vec_id"))
        .withColumn(
            "label", F.pmod(F.xxhash64("vec_id"), F.lit(10)).cast("int")
        )
        .withColumn(
            "embedding",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                # cluster structure: a per-(label, dim) center in [-2, 2]
                # plus per-vector noise in [-0.5, 0.5] — the same "labels
                # are separable" shape the kmeans rows rely on
                lambda j: (
                    (
                        F.pmod(
                            F.xxhash64(F.col("label") * 131 + j), F.lit(4001)
                        )
                        - 2000
                    )
                    / 1000.0
                    + (
                        F.pmod(
                            F.xxhash64(F.col("vec_id") * 67 + j), F.lit(1001)
                        )
                        - 500
                    )
                    / 1000.0
                ).cast("float"),
            ),
        )
        .select("vec_id", "embedding", "label")
    )
    write_single(emb.unionByName(new_emb), "embeddings")

    orders = spark.read.parquet(f"{SF01}/orders.parquet")
    ok_span = orders.agg(F.max("o_orderkey")).first()[0] + 1
    ck_span = orders.agg(F.max("o_custkey")).first()[0] + 1
    reps = spark.range(1, 10).select(F.col("id").alias("rep"))
    new_orders = (
        orders.crossJoin(reps)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("rep") * ok_span)
        .withColumn("o_custkey", F.col("o_custkey") + F.col("rep") * ck_span)
        .drop("rep")
    )
    write_single(orders.unionByName(new_orders), "orders")

    events = spark.read.parquet(f"{SF01}/events.parquet")
    ev_span = events.agg(F.max("event_id")).first()[0] + 1
    u_span = events.agg(F.max("user_id")).first()[0] + 1
    new_events = (
        events.crossJoin(reps)
        .withColumn("event_id", F.col("event_id") + F.col("rep") * ev_span)
        .withColumn("user_id", F.col("user_id") + F.col("rep") * u_span)
        .drop("rep")
    )
    write_single(events.unionByName(new_events), "events")

    # r14: the keyed-DELETE rows key on customer — key-shifted replicas
    # (the orders/events pattern; payload distributions carry over)
    cust = spark.read.parquet(f"{SF01}/customer.parquet")
    ckey_span = cust.agg(F.max("c_custkey")).first()[0] + 1
    new_cust = (
        cust.crossJoin(reps)
        .withColumn("c_custkey", F.col("c_custkey") + F.col("rep") * ckey_span)
        .drop("rep")
    )
    write_single(cust.unionByName(new_cust), "customer")
    print(f"# synthesized sf1 at {SF1}", file=sys.stderr)


def _stage_totals(spark) -> tuple[int, int, int]:
    """(shuffle_read_bytes, shuffle_write_bytes, shuffle_write_records)
    summed over all completed stages so far, via the UI REST API (local
    mode has it on by default). Records are the cleaner scaling signal:
    bytes also move with the data's compressibility (synthesized noise
    compresses worse than the generator's quantized values)."""
    base = spark.sparkContext.uiWebUrl
    apps = json.load(
        urllib.request.urlopen(f"{base}/api/v1/applications", timeout=10)
    )
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=30,
        )
    )
    rd = sum(s.get("shuffleReadBytes", 0) for s in stages)
    wr = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    wrec = sum(s.get("shuffleWriteRecords", 0) for s in stages)
    return rd, wr, wrec


def measure(spark, fn, sf_dir: str, runs: int) -> dict:
    best = None
    for _ in range(runs):
        rd0, wr0, wc0 = _stage_totals(spark)
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        wall = time.time() - t0
        rd1, wr1, wc1 = _stage_totals(spark)
        rec = {
            "wall_sec": round(wall, 3),
            "rows": n,
            "shuffle_read_mb": round((rd1 - rd0) / 1e6, 2),
            "shuffle_write_mb": round((wr1 - wr0) / 1e6, 2),
            "shuffle_write_records": wc1 - wc0,
        }
        if best is None or rec["wall_sec"] < best["wall_sec"]:
            best = rec
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entries", default=",".join(ENTRIES))
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from embulk_executor_mapreduce_spark import catalog
    from embulk_executor_mapreduce_spark.session import get_spark

    # the UI REST API is the shuffle-bytes source; get_spark disables the
    # UI by default (bench hygiene), so opt back in for this script
    # retainedStages must exceed the whole run's stage count: _stage_totals
    # diffs CUMULATIVE completed-stage sums, and the default 1000-stage
    # eviction silently deflates later entries' deltas (r12 review finding 2)
    ui_conf = {
        "spark.ui.enabled": "true",
        "spark.ui.retainedStages": "200000",
        "spark.ui.retainedJobs": "200000",
    }
    spark = get_spark(shuffle_partitions=32, extra_conf=ui_conf)
    if spark.sparkContext.uiWebUrl is None:
        # getOrCreate reused a UI-less session from the same process; this
        # script must own its session
        spark.stop()
        spark = get_spark(shuffle_partitions=32, extra_conf=ui_conf)
    synthesize_sf1(spark)
    reg = catalog.entries()
    out = {}
    for name in args.entries.split(","):
        fn = EXTRA[name] if name in EXTRA else reg[name].fn
        m01 = measure(spark, fn, SF01, args.runs)
        m1 = measure(spark, fn, SF1, args.runs)

        def alpha(k):
            a, b = m01[k], m1[k]
            if a and b and a > 0 and b > 0:
                return round(math.log(b / a) / math.log(10), 2)
            return None

        out[name] = {
            "sf0.1": m01,
            "sf1": m1,
            "alpha_wall": alpha("wall_sec"),
            "alpha_shuffle_write": alpha("shuffle_write_mb"),
            "alpha_shuffle_records": alpha("shuffle_write_records"),
        }
        print(f"# {name}: {json.dumps(out[name])}", file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

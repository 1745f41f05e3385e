"""Generate a deterministic sf1.0 PERFORMANCE dataset by 10x-upsampling
the driver's sf0.1 tables (r17, VERDICT r16 item 3).

Why: at sf0.1 the catalog is driver/protocol-bound — the driver's own
8-cpu run beat its 32-cpu run — so plan-shape wins and regressions no
longer move the headline number. This produces a data-dominated scale
point for the spot bench (scripts/spot_bench.py). It is NOT oracle data:
correctness stays pinned at the driver's sf0.001/0.01; this dataset only
has to be schema-correct and key-consistent so the same entries run
unmodified, 10x heavier.

Construction (seed-free, fully deterministic): each table is the union of
10 replicas of its sf0.1 rows; replica r shifts every key column by
r * (max_key_at_sf0.1 + 1) — per key DOMAIN, so foreign keys stay
consistent (l_orderkey tracks o_orderkey, o_custkey tracks c_custkey,
...). Content columns are perturbed minimally so replicated rows are not
degenerate exact duplicates: document texts gain a replica token,
embeddings a tiny per-replica offset, event timestamps a per-replica
second shift. Dimension tables (region, nation) are NOT replicated; FK
columns into them are left unshifted.

Usage: python scripts/gen_sf1.py [--src DIR] [--out DIR] [--factor N]
Defaults: src=/root/testdata/sf0.1, out=/root/testdata_gen/sf1.0, N=10.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from embulk_executor_mapreduce_spark.session import get_spark  # noqa: E402

#: key domains: table -> {column: domain}; all columns of one domain shift
#: by the same offset so joins keep matching across replicas
DOMAINS = {
    "customer": {"c_custkey": "custkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "part": {"p_partkey": "partkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "events": {"event_id": "eventkey", "user_id": "userkey"},
    "documents": {"doc_id": "dockey"},
    "embeddings": {"vec_id": "veckey"},
}
REPLICATED = list(DOMAINS)
COPIED = ["region", "nation"]


def _domain_spans(spark, src: str) -> dict[str, int]:
    spans: dict[str, int] = {}
    for table, cols in DOMAINS.items():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        for col, dom in cols.items():
            hi = df.agg(F.max(col)).collect()[0][0]
            spans[dom] = max(spans.get(dom, 0), int(hi) + 1)
    return spans


def _replica(df: DataFrame, table: str, r: int, spans: dict[str, int]) -> DataFrame:
    out = df
    for col, dom in DOMAINS[table].items():
        out = out.withColumn(col, (F.col(col) + F.lit(r * spans[dom])).cast(
            dict(df.dtypes)[col]
        ))
    if r == 0:
        return out
    if table == "documents":
        # unique content per replica (exact dedup must not collapse the
        # upsample to sf0.1); keeps token distributions near-identical
        suffix = f" replica{r}"
        out = out.withColumn(
            "text", F.concat(F.col("text"), F.lit(suffix))
        ).withColumn("n_chars", F.col("n_chars") + F.lit(len(suffix)))
    elif table == "embeddings":
        # tiny deterministic offset on the first component: no exact-dup
        # vectors, geometry essentially unchanged
        out = out.withColumn(
            "embedding",
            F.expr(
                "transform(embedding, (x, i) -> "
                f"IF(i = 0, CAST(x + {r} * 0.001d AS FLOAT), x))"
            ),
        )
    elif table == "events":
        out = out.withColumn(
            "ts", F.col("ts") + F.expr(f"INTERVAL {r} SECONDS")
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/testdata_gen/sf1.0")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    spark = get_spark(app_name="gen_sf1")
    spans = _domain_spans(spark, args.src)
    print("key domain spans:", spans)
    Path(args.out).mkdir(parents=True, exist_ok=True)

    def _single_file(df, table: str) -> None:
        # the driver's testdata is ONE parquet FILE per table (footer
        # probes pq.read_schema the exact path), so flatten the Spark
        # output dir to a bare file
        import shutil

        tmp = f"{args.out}/.__gen_{table}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            p for p in Path(tmp).iterdir()
            if p.name.startswith("part-") and p.name.endswith(".parquet")
        )
        dest = Path(f"{args.out}/{table}.parquet")
        if dest.is_dir():
            shutil.rmtree(dest)
        elif dest.exists():
            dest.unlink()
        part.rename(dest)
        shutil.rmtree(tmp)

    for table in COPIED:
        df = spark.read.parquet(f"{args.src}/{table}.parquet")
        _single_file(df, table)
        print(f"{table}: copied {df.count()} rows")
    for table in REPLICATED:
        df = spark.read.parquet(f"{args.src}/{table}.parquet")
        out = _replica(df, table, 0, spans)
        for r in range(1, args.factor):
            out = out.unionByName(_replica(df, table, r, spans))
        _single_file(out, table)
        n = spark.read.parquet(f"{args.out}/{table}.parquet").count()
        print(f"{table}: {n} rows ({args.factor}x)")


if __name__ == "__main__":
    main()

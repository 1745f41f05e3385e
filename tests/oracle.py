"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and an
order-insensitive canonical value multiset. Used by tests (sf0.001) and by
development iteration before declaring a query in the catalog.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        # full-precision repr: the driver's hash is bit-exact, so the local
        # gate must be too (a lossier %.6g let q3's rounding-boundary bug
        # through in round 1 — VERDICT.md "What's wrong" #2)
        return repr(v)
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


# normalized type names so Spark and DuckDB schemas can be compared exactly;
# int32 vs int64 is a REAL mismatch we want to catch (the driver may too)
_SPARK_TYPE_NORM = {
    "tinyint": "i8",
    "smallint": "i16",
    "int": "i32",
    "bigint": "i64",
    "float": "f32",
    "double": "f64",
    "string": "str",
    "boolean": "bool",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
    "date": "date",
    "binary": "bytes",
}
_DUCK_TYPE_NORM = {
    "TINYINT": "i8",
    "SMALLINT": "i16",
    "INTEGER": "i32",
    "BIGINT": "i64",
    "HUGEINT": "i128",
    "FLOAT": "f32",
    "DOUBLE": "f64",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "TIMESTAMP": "ts",
    "TIMESTAMP_NS": "ts",
    "TIMESTAMP WITH TIME ZONE": "ts",
    "DATE": "date",
    "BLOB": "bytes",
}


def _norm_spark_type(t: str) -> str:
    return _SPARK_TYPE_NORM.get(t, t)


def _norm_duck_type(t: str) -> str:
    if t.startswith("DECIMAL"):
        return "decimal"
    return _DUCK_TYPE_NORM.get(t, t)


def compare(spark, sf_dir: str, fn, sql: str, check_types: bool = True) -> tuple[bool, str]:
    sdf = fn(spark, sf_dir)
    spark_rows = sdf.collect()
    spark_cols = sorted(sdf.columns)

    con = duck_connection(sf_dir)
    res = con.execute(sql)
    duck_cols_raw = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    duck_cols = sorted(duck_cols_raw)

    if spark_cols != duck_cols:
        return False, f"column mismatch: spark={spark_cols} duck={duck_cols}"

    if check_types:
        stypes = {c: _norm_spark_type(t) for c, t in sdf.dtypes}
        dtypes_raw = con.execute(f"DESCRIBE {sql}").fetchall()
        dtypes = {r[0]: _norm_duck_type(r[1]) for r in dtypes_raw}
        mismatches = {
            c: (stypes[c], dtypes.get(c))
            for c in stypes
            if not str(stypes[c]).startswith("array")  # list types: names differ benignly
            and stypes[c] != dtypes.get(c)
        }
        if mismatches:
            return False, f"type mismatch: {mismatches}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"

    s_sorted = sorted(
        tuple(_canon(row[c]) for c in spark_cols) for row in spark_rows
    )
    idx = {c: i for i, c in enumerate(duck_cols_raw)}
    d_sorted = sorted(
        tuple(_canon(row[idx[c]]) for c in duck_cols) for row in duck_rows
    )
    if s_sorted != d_sorted:
        diff = next(
            (i, a, b) for i, (a, b) in enumerate(zip(s_sorted, d_sorted)) if a != b
        )
        return False, f"value mismatch at sorted row {diff[0]}: spark={diff[1]} duck={diff[2]}"
    return True, f"ok ({len(spark_rows)} rows)"

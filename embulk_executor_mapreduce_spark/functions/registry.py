"""Portable scalar-function registry: Spark expression ↔ DuckDB oracle.

Functions listed here have been verified value-identical across both engines
by the ``functions_gauntlet_*`` catalog queries (the correctness gate runs
them on real data). Functions with known dialect divergence are listed in
``NON_PORTABLE`` with the reason, so spec authors aren't surprised.
"""

from __future__ import annotations

# spark_expr_name -> duckdb equivalent (same name unless noted)
PORTABLE_SCALARS: dict[str, str] = {
    # string
    "upper": "upper",
    "lower": "lower",
    "length": "length",
    "trim": "trim",
    "ltrim": "ltrim",
    "rtrim": "rtrim",
    "substring": "substr",
    "lpad": "lpad",
    "rpad": "rpad",
    "replace": "replace",
    "concat_ws": "concat_ws",
    "split": "string_split",
    "md5": "md5",
    "reverse": "reverse",
    "instr": "instr",
    "left": "left",
    "right": "right",
    # date/time (UTC session)
    "year": "year",
    "month": "month",
    "dayofmonth": "day",
    "hour": "hour",
    "minute": "minute",
    "second": "second",
    "date_trunc": "date_trunc",
    "unix_micros": "epoch_us",
    # math
    "abs": "abs",
    "ceil": "ceil",
    "floor": "floor",
    "sqrt": "sqrt",
    "ln": "ln",
    "exp": "exp",
    "pow": "pow",
    "sign": "sign",
    "greatest": "greatest",
    "least": "least",
    "round": "round",
    # json
    "get_json_object": "json_extract_string",
}

NON_PORTABLE: dict[str, str] = {
    "dayofweek": "Spark: 1=Sunday; DuckDB dayofweek: 0=Sunday",
    "concat": "Spark propagates NULL; DuckDB concat() skips NULLs (use ||)",
    "regexp_*": (
        "Java regex vs RE2 — character-class/alternation patterns without "
        "backrefs/lookaround are verified portable (token_count_bpe, "
        "pii_scrub_props gauntlets); anything fancier is not"
    ),
    "hash/xxhash64": "engine-specific hash families",
    "approx_count_distinct": "different HLL sketches",
    "round": (
        "portable ONLY for per-row rounding of identical doubles away from "
        "decimal boundaries; final float outputs must use exactmath.d_round "
        "(Spark round() evaluates the shortest decimal repr, DuckDB the raw "
        "binary — they disagree on exact .xx5 shortest-reprs)"
    ),
}


def is_portable(name: str) -> bool:
    return name in PORTABLE_SCALARS

"""Local mirror of the driver's DuckDB-oracle comparison: row count,
column-name set, RESULT-COLUMN TYPES, and order-insensitive exact value
equality.

Type strictness matters: round 2 shipped 6 driver hash failures because
DuckDB ``sum()`` over integers returns HUGEINT (int128) while Spark
returns BIGINT, and the driver's value-hash distinguishes them — but the
old harness collapsed both to Python ``int`` (and rounded floats to 9
digits), so the failures were invisible locally.  ``compare`` now maps
both engines' result types onto a canonical class and fails on any
mismatch (HUGEINT and DECIMAL never match a Spark integer/double), and
values are compared exactly — no rounding.  Registered queries are
expected to quantize floats themselves (``floor(x*1e6+0.5)/1e6``) if
they need cross-engine bit-stability.
"""

from __future__ import annotations

import math
import re

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


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


# Canonical type classes.  int8..int64 collapse to "int" on both engines
# (both hash identically through Arrow's integer widening in practice),
# but HUGEINT/int128 and DECIMAL are their own classes and can never
# match a Spark bigint/double — exactly the class of bug the driver's
# value-hash catches and the old harness did not.
_DUCK_CANON = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "UTINYINT": "int",
    "USMALLINT": "int",
    "UINTEGER": "int",
    "UBIGINT": "int",
    "HUGEINT": "int128",
    "UHUGEINT": "int128",
    "FLOAT": "float32",
    "DOUBLE": "float64",
    "VARCHAR": "string",
    "BOOLEAN": "bool",
    "DATE": "date",
    "BLOB": "binary",
}

_SPARK_CANON = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "float": "float32",
    "double": "float64",
    "string": "string",
    "boolean": "bool",
    "date": "date",
    "binary": "binary",
}


def _canon_duck_type(t: str) -> str:
    t = str(t).upper()
    if t in _DUCK_CANON:
        return _DUCK_CANON[t]
    if t.startswith("DECIMAL"):
        return "decimal"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.endswith("[]") or t.startswith("STRUCT") or t.startswith("LIST"):
        return "array"
    return t.lower()


def _canon_spark_type(t: str) -> str:
    t = str(t).lower()
    if t in _SPARK_CANON:
        return _SPARK_CANON[t]
    if t.startswith("decimal"):
        return "decimal"
    if t.startswith("timestamp"):
        return "timestamp"
    if t.startswith("array") or t.startswith("struct"):
        return "array"
    return t


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v  # exact — queries quantize floats themselves
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def oracle_types(con: duckdb.DuckDBPyConnection, sql: str) -> list[tuple[str, str]]:
    """(column, raw DuckDB type) pairs for an oracle's final SELECT."""
    rel = con.sql(sql)
    return list(zip(rel.columns, (str(t) for t in rel.types)))


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    s_types = dict(spark_df.dtypes)
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_types = {c: str(t) for c, t in zip(rel.columns, rel.types)}
    d_rows = rel.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    type_diffs = [
        (c, s_types[c], d_types[c])
        for c in s_cols
        if _canon_spark_type(s_types[c]) != _canon_duck_type(d_types[c])
    ]
    if type_diffs:
        return False, (
            "result types differ (col, spark, duck): "
            f"{type_diffs} — the driver's value-hash is type-sensitive; "
            "cast the oracle (e.g. CAST(sum(...) AS BIGINT)) or the plan"
        )
    if len(s_rows) != len(d_rows):
        return False, f"row count differs: spark={len(s_rows)} duck={len(d_rows)}"
    sn, dn = _norm_rows(s_cols, s_rows), _norm_rows(d_cols, d_rows)
    if sn != dn:
        diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
        return False, f"values differ; first diffs: {diff}"
    return True, "ok"

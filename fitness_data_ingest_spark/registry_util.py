"""Shared plumbing for the driver-facing query registry."""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import configure_runtime


@dataclass
class QueryDef:
    """One driver-checkable query: a Spark callable plus (usually) an
    ANSI-SQL DuckDB oracle computing the same result with the same
    column names. ``sql=None`` → non-SQL-expressible; the driver records
    a weaker rows-only check."""

    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    sql: str | None
    tags: tuple[str, ...] = field(default=())


# --- IEEE-stable money/rounding helpers -------------------------------
# Engine-native round() differs between Spark (java BigDecimal HALF_UP on
# the binary double) and DuckDB at exact-half edge cases. These helpers
# use only IEEE-754 ops (*, +, floor, /) that both engines evaluate
# bit-identically, so oracle value-hashes can't flip on rounding ties.


def cents(col: F.Column) -> F.Column:
    """double → integer cents, half-up via floor(x*100 + 0.5)."""
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


def round2(col: F.Column) -> F.Column:
    """IEEE-stable 2-decimal round of a per-row double expression."""
    return F.floor(col * 100 + F.lit(0.5)) / 100.0


def money_sum(col: F.Column) -> F.Column:
    """Exact aggregate: sum int64 cents (order-independent), then /100."""
    return F.sum(cents(col)) / 100.0


def money_avg(col: F.Column) -> F.Column:
    return F.sum(cents(col)).cast("double") / F.count(F.lit(1)) / 100.0


def sql_round2(expr: str) -> str:
    return f"floor(({expr}) * 100 + 0.5) / 100.0"


def sql_money_sum(expr: str) -> str:
    return f"sum(CAST(floor(({expr}) * 100 + 0.5) AS BIGINT)) / 100.0"


def sql_money_avg(expr: str) -> str:
    return (
        f"CAST(sum(CAST(floor(({expr}) * 100 + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / count(*) / 100.0"
    )


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; pins runtime confs (UTC tz) first.

    ``events.ts`` has shipped in two physical forms across fixture
    generations: parquet TIMESTAMP(NANOS), which Spark's type system
    lacks ([PARQUET_TYPE_ILLEGAL]) — read as epoch-nanos long
    (``spark.sql.legacy.parquet.nanosAsLong``) and converted with exact
    integer division (truncation to µs, same as DuckDB's ns→µs cast) —
    and plain TIMESTAMP(US) without UTC adjustment, which Spark reads
    as TIMESTAMP_NTZ. Both normalize to session-tz (UTC) TimestampType
    so every downstream operator (window/unix_micros/watermark) sees
    one type, and oracle parity matches DuckDB's naive-UTC reading.
    """
    configure_runtime(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df

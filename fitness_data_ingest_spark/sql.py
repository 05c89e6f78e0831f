"""SQL entry surface: register the fixture tables as temp views so any
query the engine supports can also be driven as plain ``spark.sql``.

The views go through ``registry_util.t`` so runtime confs (UTC session
tz, nanos handling for ``events.ts``) are applied identically to the
DataFrame path — a SQL user and a DataFrame user see the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry_util import t

TABLES: tuple[str, ...] = (
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


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    """Create/replace one temp view per fixture table."""
    for name in tables:
        t(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register the fixture views and run one SQL statement against
    them. Catalyst sees the same parquet relations as the DataFrame
    path, so pushdown/pruning/broadcast behavior is identical."""
    register_tables(spark, sf_dir)
    return spark.sql(query)

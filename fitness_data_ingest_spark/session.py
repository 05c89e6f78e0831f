"""SparkSession factory tuned for this engine.

The reference pipeline is single-threaded pandas writing Spark-flavored
parquet (``flavor="spark"`` at reference services/fitbit/fitbit_utils.py:287,
services/strava/utils.py:375) — i.e. it *produces for* Spark. This module
is where our engine actually *is* Spark. Defaults are chosen for the
local[N] test harness but every knob is the one you would tune on a real
cluster:

- AQE on (runtime coalesce, broadcast demotion, skew-join splitting) —
  at 100 TB this is what keeps post-shuffle partitions near the target
  size regardless of the static ``spark.sql.shuffle.partitions``.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a cluster
  you size it to ~2-3× total cores and let AQE coalesce.
- Arrow enabled: every pandas-interop boundary (createDataFrame,
  toPandas, pandas UDFs) is Arrow-batched, never row-pickled.
- Session timezone pinned UTC so timestamp semantics are stable and
  match the DuckDB oracle reading the same parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "fitness-data-ingest-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Python DataSource pushdown (ingest/datasource.py prunes REST
        # work items from pushed resource/date predicates)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def configure_runtime(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to a session we did not create.

    The driver hands ``entry()``/``queries()`` an existing SparkSession;
    only runtime confs can still be set on it. UTC pinning is required
    for oracle parity (DuckDB reads parquet timestamps UTC-naive).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # Spark has no TIMESTAMP(NANOS) type (events.ts is parquet ns);
    # read as long and convert via exact integer division (io.table).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:  # static-ish on some builds; best effort
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    except Exception:
        pass
    return spark

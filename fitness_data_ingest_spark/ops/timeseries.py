"""Time-series operators: grid resampling with forward fill, and
rolling event-time range windows.

Both are single-shuffle shapes (one window partitioning per user/key)
built from exact integer epoch arithmetic so the DuckDB oracles match
bit-for-bit: grid slots are epoch-aligned (origin-independent), order
keys are epoch microseconds (total order via event_id tie-break), and
rolling averages re-derive from exact int64 cent sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Resample grid width in seconds (6 h — ~120 slots per user over the
# 30-day fixture span; the operator is width-agnostic).
GRID_S = 21_600


def resample_ffill(events: DataFrame, grid_s: int = GRID_S) -> DataFrame:
    """Resample each user's event series onto an epoch-aligned grid,
    carrying the last observed value forward into each slot (NULL until
    the first observation).

    Shape: per-user min/max bounds (one partial-agg shuffle, tiny
    output) explode to grid rows; grid and observations union and a
    single last-value-ignore-nulls window over (user) fills forward.
    Slots-per-partition is bounded by span/grid, not corpus size; at
    100 TB the same plan runs with the user key salted by coarse time
    range if one user's history exceeds a partition.
    """
    obs = events.select(
        "user_id",
        F.unix_micros("ts").alias("ord_us"),
        F.lit(1).alias("is_obs"),
        F.col("value").alias("v"),
        F.col("event_id").alias("eid"),
        F.lit(None).cast("long").alias("gs"),
    )
    bounds = events.groupBy("user_id").agg(
        (F.floor(F.unix_timestamp(F.min("ts")) / grid_s) * grid_s).alias("g0"),
        (F.floor(F.unix_timestamp(F.max("ts")) / grid_s) * grid_s).alias("g1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("g0", "g1", F.lit(grid_s))).alias("gs"),
    ).select(
        "user_id",
        (F.col("gs") * F.lit(1_000_000)).alias("ord_us"),
        F.lit(0).alias("is_obs"),
        F.lit(None).cast("double").alias("v"),
        F.lit(-1).cast("long").alias("eid"),
        "gs",
    )
    unioned = obs.unionByName(grid)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ord_us"), F.col("is_obs").desc(), F.col("eid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("value_ffill", F.last("v", ignorenulls=True).over(w))
    return filled.filter(F.col("is_obs") == 0).select(
        "user_id",
        F.date_format(F.timestamp_seconds("gs"), "yyyy-MM-dd HH:mm:ss").alias("slot"),
        "value_ffill",
    )


def rolling_hour_avg(events: DataFrame, span_s: int = 3600) -> DataFrame:
    """Per-event trailing average over the preceding hour of the same
    user's events — an event-time RANGE frame on exact epoch seconds.
    Sums accumulate int64 cents, so the average is bit-deterministic
    under any partitioning; the frame is value-based, so same-second
    events fall in each other's frames identically in every engine.
    """
    staged = events.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("es"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("es")
        .rangeBetween(-span_s, Window.currentRow)
    )
    out = staged.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum("c").over(w).alias("sc"),
    )
    avg = F.col("sc").cast("double") / F.col("n_1h") / 100.0
    return out.select(
        "event_id",
        "user_id",
        "n_1h",
        (F.floor(avg * 1e4 + F.lit(0.5)) / 1e4).alias("avg_1h4"),
    )

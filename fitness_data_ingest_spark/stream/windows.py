"""Streaming surface (north-star extension; the reference has none —
its "streams" are Strava's name for batch-fetched sample arrays,
SURVEY.md §2.7).

Window operators are defined once and used in BOTH modes:
- batch: ``F.window`` / ``F.session_window`` group-bys on a static
  DataFrame — SQL-expressible, so the DuckDB oracle can check them;
- streaming: the same transforms applied to ``readStream`` with a
  watermark — exercised by tests/test_streaming.py with an
  availableNow/memory-sink run.

Scale notes: tumbling/sliding windows shuffle on (window, key) — state
is bounded by the watermark horizon; at 100 TB you partition the source
by key and keep ``spark.sql.shuffle.partitions`` sized to executor
count, letting AQE coalesce post-watermark output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),  # epoch-nanos (parquet NANOS)
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def _ts_s(col: str | Column) -> Column:
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


def tumbling_counts(ev: DataFrame, width: str = "5 minutes") -> DataFrame:
    """Tumbling-window counts+sums per event_type."""
    win = F.window("ts", width)
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")) / 100.0).alias(
                "sum_value"
            ),
        )
        .select(_ts_s("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def windowed_type_topk(ev: DataFrame, width: str = "15 minutes", k: int = 2) -> DataFrame:
    """Top-k event types per tumbling window — the trending-items
    shape. Batch: windowed aggregate + a rank window PARTITIONED by the
    time bucket (each partition holds |event_types| rows — bounded, so
    no scale cliff). Streaming: the same aggregate runs watermarked and
    the per-window rank applies in foreachBatch on the (tiny) per-batch
    aggregate output — ranking inside the stream would need complete
    mode; see tests/test_streaming.py for the parity run."""
    win = F.window("ts", width)
    agg = ev.groupBy(win.alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    return rank_window_topk(agg, k).select(
        _ts_s("w.start").alias("window_start"), "event_type", "n", "rnk"
    )


def rank_window_topk(agg: DataFrame, k: int) -> DataFrame:
    """Rank rows within each time bucket (n desc, type asc) and keep the
    top k. Split out so the streaming foreachBatch path applies the
    identical ranking to each micro-batch's aggregate output."""
    from pyspark.sql import Window

    w = Window.partitionBy("w").orderBy(F.col("n").desc(), F.col("event_type").asc())
    return (
        agg.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)
    )


def sliding_counts(ev: DataFrame, width: str = "10 minutes", slide: str = "5 minutes") -> DataFrame:
    """Sliding windows: each event lands in width/slide windows."""
    win = F.window("ts", width, slide)
    return (
        ev.groupBy(win.alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(_ts_s("w.start").alias("window_start"), "n")
    )


def session_stats(ev: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows (gap-based). ``session_window`` works in
    batch group-bys too — same operator feeds the streaming query.

    Perf note (round-2 "1.94x regression" post-mortem): the cost moved
    when the events fixture switched physical ts encoding from parquet
    TIMESTAMP(NANOS) (read as long, converted once) to naive
    TIMESTAMP(US), which Spark read as TIMESTAMP_NTZ plus a per-row
    cast Project (~20% of query time at sf0.1). Fixed at the scan:
    ``configure_runtime`` sets ``parquet.inferTimestampNTZ.enabled=
    false`` so naive parquet timestamps come out of the scan as
    session-tz (UTC) TimestampType with no cast step. Measured sf0.1
    local[32] min-of-5: 0.75 s (cast path) -> 0.55 s. A lag/cumsum
    reformulation partitioned by user_id measured 0.48 s — within noise
    of native ``session_window`` and not worth trading away the shared
    batch/streaming operator."""
    win = F.session_window("ts", gap)
    return (
        ev.groupBy(win.alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")) / 100.0).alias(
                "sum_value"
            ),
        )
        .select(
            "user_id",
            _ts_s("w.start").alias("session_start"),
            _ts_s("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def click_attribution(ev: DataFrame, horizon_min: int = 10) -> DataFrame:
    """View→click attribution: join each click to the views of the same
    user in the preceding ``horizon_min`` minutes, then count attributed
    pairs per user.

    Mode-agnostic like the window ops: in batch this is an equi-join on
    user_id with a range predicate (sort-merge join, range applied as a
    post-join filter — never a nested loop); on two watermarked streams
    the identical condition is a Structured Streaming stream-stream
    interval join whose state eviction is bounded by watermark +
    horizon.
    """
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    pairs = views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {horizon_min} MINUTES")),
    )
    # exact distinct counts via collect_set, NOT two countDistinct in
    # one aggregate: Catalyst's RewriteDistinctAggregates orders the
    # Expand projections for multiple distinct groups by expression-id
    # hash, so the physical plan is session-position-dependent (caught
    # by the PLANHASH baseline) and the Expand triples the shuffled
    # rows; one hash aggregate with bounded per-user sets does the same
    # work in a single deterministic pass.
    return pairs.groupBy(F.col("v_user").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.size(F.collect_set("click_id")).alias("n_clicks"),
        F.size(F.collect_set("view_id")).alias("n_views"),
    )


def read_events_stream(spark, events_dir: str) -> DataFrame:
    """File-source streaming read of the events fixture.

    Handles both fixture generations: TIMESTAMP(NANOS) (read as long
    via nanosAsLong, converted by exact integer division) and
    TIMESTAMP(US) (read as TIMESTAMP_NTZ, cast to session-tz UTC
    timestamp). The physical ts form is sniffed from a batch read of
    the same path. At scale the source would be Kafka/queue; the
    transform chain is identical.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ts_type = dict(spark.read.parquet(events_dir).dtypes).get("ts")
    if ts_type == "bigint":
        raw = (
            spark.readStream.schema(EVENTS_RAW_SCHEMA)
            .format("parquet")
            .load(events_dir)
        )
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    schema = T.StructType(
        [
            f if f.name != "ts" else T.StructField("ts", T.TimestampNTZType(), True)
            for f in EVENTS_RAW_SCHEMA.fields
        ]
    )
    raw = spark.readStream.schema(schema).format("parquet").load(events_dir)
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def streaming_tumbling(ev_stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling aggregate — late rows beyond the watermark
    are dropped; append-mode emits only finalized windows."""
    return tumbling_counts(ev_stream.withWatermark("ts", watermark))


def dedup_within_watermark(ev: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Streaming exact dedup with bounded state
    (``dropDuplicatesWithinWatermark``): duplicate events arriving within
    the watermark horizon are dropped; state for a key is evicted once
    the watermark passes it, so state size is O(keys per horizon) — the
    streaming face of the batch exact-dedup operator (ext/dedup.py).

    ``ev`` must already carry ``withWatermark("ts", ...)``.
    """
    return ev.dropDuplicatesWithinWatermark(keys or ["event_id"])

"""Real Structured Streaming runs (not just the batch-mode oracles):
file-source readStream → watermarked windowed agg → memory sink, driven
to completion with processAllAvailable, then checked for batch parity.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fitness_data_ingest_spark.registry_util import t
from fitness_data_ingest_spark.stream import windows as W


@pytest.fixture()
def events_dir(spark, sf_dir, tmp_path):
    """File-source streams need a directory; re-land the fixture events
    as a small parquet dir (with µs timestamps) via the engine itself."""
    out = str(tmp_path / "events_stream")
    t(spark, sf_dir, "events").write.mode("overwrite").parquet(out)
    return out


def test_streaming_tumbling_matches_batch(spark, sf_dir, events_dir):
    stream = (
        spark.readStream.schema(t(spark, sf_dir, "events").schema)
        .format("parquet")
        .load(events_dir)
    )
    agg = W.tumbling_counts(stream.withWatermark("ts", "10 minutes"))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        tuple(r) for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    batch = {tuple(r) for r in W.tumbling_counts(t(spark, sf_dir, "events")).collect()}
    assert streamed == batch
    assert len(batch) > 0


def test_streaming_session_window(spark, sf_dir, events_dir):
    stream = (
        spark.readStream.schema(t(spark, sf_dir, "events").schema)
        .format("parquet")
        .load(events_dir)
    )
    agg = W.session_stats(stream.withWatermark("ts", "1 hour"))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("session_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {tuple(r) for r in spark.sql("SELECT * FROM session_out").collect()}
    batch = {tuple(r) for r in W.session_stats(t(spark, sf_dir, "events")).collect()}
    assert streamed == batch


def test_streaming_append_mode_watermark_finalizes(spark, sf_dir, tmp_path):
    """Append mode emits only watermark-finalized windows; with the full
    fixture ingested in one batch, all but the tail should finalize once
    a later batch arrives — here we just assert the query runs in append
    mode and emits a subset of the batch result."""
    # read_events_stream handles the fixture's raw TIMESTAMP(NANOS)
    # layout (nanosAsLong + exact integer division); the file source
    # needs a directory, so stage the raw file into one.
    import shutil

    raw_dir = tmp_path / "events_raw"
    raw_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", raw_dir / "events.parquet")
    stream = W.read_events_stream(spark, str(raw_dir))
    agg = W.tumbling_counts(stream.withWatermark("ts", "10 minutes"))
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("append_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    appended = {tuple(r) for r in spark.sql("SELECT * FROM append_out").collect()}
    batch = {tuple(r) for r in W.tumbling_counts(t(spark, sf_dir, "events")).collect()}
    assert appended.issubset(batch)

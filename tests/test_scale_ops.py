"""Scale-technique ops: salted joins must be result-identical to plain
joins; bucketed joins must plan with zero exchanges."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from fitness_data_ingest_spark.ops import scale as SK
from fitness_data_ingest_spark.registry_util import t


def test_salted_join_matches_plain_join(spark, sf_dir):
    events = t(spark, sf_dir, "events")
    # a non-broadcastable-pretend dim: per-user totals
    users = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_total"))
    plain = events.join(users, "user_id").select("event_id", "n_total")
    salted = SK.salted_join(events, users, "user_id", "user_id", salt_n=8).select(
        "event_id", "n_total"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer_preserves_unmatched(spark, sf_dir):
    events = t(spark, sf_dir, "events")
    some_users = (
        events.select("user_id").distinct().limit(5).withColumn("flag", F.lit(1))
    )
    plain = events.join(some_users, "user_id", "left").select("event_id", "flag")
    salted = SK.salted_join(
        events, some_users, "user_id", "user_id", salt_n=4, how="left"
    ).select("event_id", "flag")
    assert sorted(map(tuple, plain.collect()), key=repr) == sorted(
        map(tuple, salted.collect()), key=repr
    )


def test_salted_join_spreads_hot_key(spark, sf_dir):
    """The salt column must split one hot key across multiple reducers:
    distinct (key, salt) combos > distinct keys for a skewed input."""
    events = t(spark, sf_dir, "events")
    hot = events.withColumn("k", F.lit(1))  # everything one key
    salted = hot.withColumn("__salt", (F.rand(seed=42) * 8).cast("int"))
    n_salts = salted.select("__salt").distinct().count()
    assert n_salts > 1


@pytest.fixture()
def warehouse_tables(spark, sf_dir, tmp_path_factory):
    """Bucketed orders + lineitem in the session catalog."""
    SK.write_bucketed(
        t(spark, sf_dir, "orders"), "orders_b", "o_orderkey", n_buckets=8
    )
    SK.write_bucketed(
        t(spark, sf_dir, "lineitem"), "lineitem_b", "l_orderkey", n_buckets=8
    )
    yield "orders_b", "lineitem_b"
    for tbl in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_bucketed_join_has_no_exchange(spark, sf_dir, warehouse_tables):
    """The whole point of bucketing: a pure fact-fact join on the bucket
    key plans with ZERO Exchange on either side."""
    orders_b, lineitem_b = warehouse_tables
    joined = spark.table(lineitem_b).join(
        spark.table(orders_b), F.col("l_orderkey") == F.col("o_orderkey")
    )
    # disable broadcast so the join actually exercises the bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must be co-located"
        plain = t(spark, sf_dir, "lineitem").join(
            t(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))

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


def test_ivf_topk_prunes_and_recalls(spark, sf_dir):
    """IVF must (a) score strictly fewer pairs than brute force — the
    entire point of the inverted file — and (b) keep nonzero overlap
    with the exact top-5. Uniform-random synthetic embeddings are IVF's
    worst case (near-orthogonal vectors spread evenly over cells), so
    the floor here is the honest nprobe/cells fraction, not the >0.9
    recall real clustered embeddings give."""
    from fitness_data_ingest_spark.ext import similarity as S

    emb = t(spark, sf_dir, "embeddings")
    q, c = emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10)
    exact = {(r.query_id, r.cand_id) for r in S.cosine_topk(q, c).collect()}
    ivf = {(r.query_id, r.cand_id) for r in S.ivf_topk(q, c).collect()}
    recall = len(exact & ivf) / len(exact)
    assert recall >= S.IVF_NPROBE / (S.IVF_CENTROID_HI - S.IVF_CENTROID_LO) * 0.6

    # pruning: probed cells cover ~nprobe/cells of the inverted file
    cand = S.with_norm(c).select(F.col("vec_id").alias("id"), "vec", "nrm")
    cent = cand.filter(
        (F.col("id") >= S.IVF_CENTROID_LO) & (F.col("id") < S.IVF_CENTROID_HI)
    )
    cells = S.ivf_assign(cand, cent, 1)
    n_cand = cand.count()
    largest_cell = cells.groupBy("cell").count().agg(F.max("count")).collect()[0][0]
    assert largest_cell < n_cand, "assignment must actually partition"

"""Property-style checks (SURVEY.md §5): algebraic invariants that must
hold for ANY input, exercised with hypothesis-generated small frames.

One shared Spark session; examples kept small (≤30 rows) and example
counts low — each property runs a handful of real Spark jobs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fitness_data_ingest_spark.ops import scale as SK
from fitness_data_ingest_spark.ops.relational import (
    exists_semi_join,
    incremental_anti_join,
    union_all,
)

KEYS = st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=30)

PROP_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _kdf(spark, keys, col="k"):
    return spark.createDataFrame([(int(k),) for k in keys], f"{col} long")


@given(work=KEYS, manifest=KEYS)
@PROP_SETTINGS
def test_anti_semi_partition_work_set(spark, work, manifest):
    """anti(W, M) ⊎ semi(W, M) == W, row-for-row (multiplicity kept)."""
    w = _kdf(spark, work)
    m = _kdf(spark, set(manifest)).withColumnRenamed("k", "mk")
    on = F.col("k") == F.col("mk")
    anti = incremental_anti_join(w, m, on)
    semi = exists_semi_join(w, m, on)
    rebuilt = sorted(r["k"] for r in anti.collect()) + sorted(
        r["k"] for r in semi.collect()
    )
    assert sorted(rebuilt) == sorted(work)


@given(parts=st.lists(KEYS, min_size=1, max_size=4))
@PROP_SETTINGS
def test_union_all_counts_add(spark, parts):
    dfs = [_kdf(spark, p) for p in parts]
    assert union_all(dfs).count() == sum(len(p) for p in parts)


@given(big=KEYS, small=st.sets(st.integers(min_value=0, max_value=20), max_size=10))
@PROP_SETTINGS
def test_salted_join_equals_plain_join(spark, big, small):
    b = _kdf(spark, big)
    s = _kdf(spark, small, col="sk").withColumn("tag", F.col("sk") * 10)
    plain = b.join(s, b.k == s.sk).select("k", "tag")
    salted = SK.salted_join(b, s, "k", "sk", salt_n=4).select("k", "tag")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


@given(keys=KEYS)
@PROP_SETTINGS
def test_exact_dedup_group_sizes_sum_to_input(spark, keys):
    from fitness_data_ingest_spark.ext.dedup import exact_dedup_groups

    docs = spark.createDataFrame(
        [(i, f"text-{k}") for i, k in enumerate(keys)], "doc_id long, text string"
    )
    groups = exact_dedup_groups(docs, "doc_id", "text")
    rows = groups.collect()
    assert sum(r["n_copies"] for r in rows) == len(keys)
    assert len(rows) == len({f"text-{k}" for k in keys})


def test_identical_docs_minhash_jaccard_one(spark):
    """Two identical documents must surface as a pair with jaccard 1.0."""
    from fitness_data_ingest_spark.ext.dedup import minhash_near_dups

    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, "completely different words entirely here")],
        "doc_id long, text string",
    )
    pairs = minhash_near_dups(docs, "doc_id", "text", threshold=0.5).collect()
    assert len(pairs) == 1
    assert (pairs[0]["doc_a"], pairs[0]["doc_b"], pairs[0]["jaccard"]) == (1, 2, 1.0)

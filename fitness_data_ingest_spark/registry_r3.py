"""Round-3 operator registry: batch MERGE (CDC apply), higher-order
array functions, true-metric entity resolution (blocked Levenshtein),
and integer-exact PageRank.

Oracle SQL mirrors the Spark expressions exactly (integer-exact
aggregation, IEEE floor-rounding, identical tie-breaks) so value
hashes match bit-for-bit; see registry_ext's header for the
determinism rules.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .ext import dedup as D
from .ext import similarity as S
from .ops import graph as G
from .ops import incremental as INC
from .registry_util import QueryDef, round2, t

# ---------------------------------------------------------------- MERGE


def _merge_upsert(spark, sf_dir):
    """Batch MERGE INTO: apply a deterministic CDC changeset (updates
    keys %7, deletes keys %13, inserts cloned keys %31 shifted +10M) to
    the orders snapshot — one full-outer join on the key, then sample
    keys ending in 3 for a stable driver-sized result."""
    orders = t(spark, sf_dir, "orders")
    upd = (
        orders.filter((F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 13 != 0))
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", round2(F.col("o_totalprice") * 1.1))
        .withColumn("op", F.lit("U"))
    )
    dele = orders.filter(F.col("o_orderkey") % 13 == 0).withColumn("op", F.lit("D"))
    ins = (
        orders.filter(F.col("o_orderkey") % 31 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
        .withColumn("o_orderstatus", F.lit("I"))
        .withColumn("op", F.lit("I"))
    )
    changes = upd.unionByName(dele).unionByName(ins)
    merged = INC.merge_upsert(orders, changes, "o_orderkey")
    return merged.filter(F.col("o_orderkey") % 10 == 3).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        round2(F.col("o_totalprice")).alias("price2"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("od"),
    )


_MERGE_SQL = """
WITH u AS (SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                  floor(o_totalprice * 1.1 * 100 + 0.5) / 100.0 AS o_totalprice,
                  o_orderdate, o_orderpriority, 'U' AS op
           FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 13 <> 0),
d AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate, o_orderpriority, 'D' AS op
      FROM orders WHERE o_orderkey % 13 = 0),
i AS (SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
             'I' AS o_orderstatus, o_totalprice, o_orderdate,
             o_orderpriority, 'I' AS op
      FROM orders WHERE o_orderkey % 31 = 0),
chg AS (SELECT * FROM u UNION ALL SELECT * FROM d UNION ALL SELECT * FROM i),
m AS (SELECT
        CASE WHEN c.op IN ('U','I') THEN c.o_orderkey ELSE s.o_orderkey END AS o_orderkey,
        CASE WHEN c.op IN ('U','I') THEN c.o_custkey ELSE s.o_custkey END AS o_custkey,
        CASE WHEN c.op IN ('U','I') THEN c.o_orderstatus ELSE s.o_orderstatus END AS o_orderstatus,
        CASE WHEN c.op IN ('U','I') THEN c.o_totalprice ELSE s.o_totalprice END AS o_totalprice,
        CASE WHEN c.op IN ('U','I') THEN c.o_orderdate ELSE s.o_orderdate END AS o_orderdate
      FROM orders s FULL OUTER JOIN chg c ON s.o_orderkey = c.o_orderkey
      WHERE c.op IS NULL OR c.op <> 'D')
SELECT o_orderkey, o_custkey, o_orderstatus,
       floor(o_totalprice * 100 + 0.5) / 100.0 AS price2,
       strftime(o_orderdate, '%Y-%m-%d') AS od
FROM m WHERE o_orderkey % 10 = 3
"""

# ------------------------------------------------- ARRAY HIGHER-ORDER


def _array_hof_battery(spark, sf_dir):
    """transform/filter/aggregate/array_max over the embedding column,
    all JVM lambda functions, exact int64 micro-unit statistics."""
    return S.array_profile(t(spark, sf_dir, "embeddings"))


_HOF_SQL = """
SELECT vec_id,
  CAST(len(embedding) AS BIGINT) AS n_dims,
  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
  CAST(list_sum(list_transform(embedding,
        x -> CAST(floor(abs(CAST(x AS DOUBLE)) * 1e6 + 0.5) AS BIGINT))) AS BIGINT) AS l1_micro,
  CAST(list_max(list_transform(embedding,
        x -> CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT))) AS BIGINT) AS max_micro
FROM embeddings
"""

# --------------------------------------------------- EDIT DISTANCE ER


def _er_edit_distance(spark, sf_dir):
    """Blocked Levenshtein similarity join on distinct part names
    (block = last name token), the true-metric ER candidate step."""
    part = t(spark, sf_dir, "part")
    out = D.edit_distance_pairs(
        part, "p_name", F.substring_index(F.col("p_name"), " ", -1), 4
    )
    return out.select("name_a", "name_b", F.col("dist").cast("long").alias("dist"))


_ER_EDIT_SQL = """
WITH names AS (SELECT DISTINCT p_name AS name, str_split(p_name, ' ')[-1] AS blk
               FROM part)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
FROM names a JOIN names b ON a.blk = b.blk AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= 4
"""

# ------------------------------------------------------------ PAGERANK

_PR_ITERS = 6


def _graph_pagerank(spark, sf_dir):
    """Integer-exact PageRank over the part co-occurrence graph
    (parts sharing an order), 6 iterations of the int64 micro-unit
    recurrence — bit-identical to the unrolled SQL oracle under any
    partitioning because every per-node reduction is an integer sum."""
    li = t(spark, sf_dir, "lineitem")
    edges = G.cooccurrence_edges(li, "l_orderkey", "l_partkey").cache()
    return G.pagerank_int(edges, iters=_PR_ITERS)


_PR_EDGES_CTE = """
SELECT DISTINCT a.i AS src, b.i AS dst
FROM (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem) a
JOIN (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem) b
  ON a.g = b.g AND a.i <> b.i
"""

_PR_SQL = G.pagerank_oracle_sql(_PR_EDGES_CTE, iters=_PR_ITERS)


R3_QUERIES: dict[str, QueryDef] = {
    q.name: q
    for q in (
        QueryDef("merge_upsert", _merge_upsert, _MERGE_SQL, ("incremental",)),
        QueryDef("array_hof_battery", _array_hof_battery, _HOF_SQL, ("ext",)),
        QueryDef("er_edit_distance", _er_edit_distance, _ER_EDIT_SQL, ("ext",)),
        QueryDef("graph_pagerank", _graph_pagerank, _PR_SQL, ("graph",)),
    )
}

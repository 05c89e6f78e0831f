"""Spark 4 SQL-surface features, oracle-checked: VariantType JSON
extraction (``parse_json``/``variant_get``), recursive CTEs
(SPARK-24497, new in Spark 4), and correlated LATERAL subqueries with
ORDER BY ... LIMIT. These prove the engine's *SQL* face matches the
DataFrame face — a user of the reference's pandas ETL moving to SQL
gets the same semantics DuckDB computes.

Determinism follows the registry-wide rules (integer aggregation,
floor-rounding, total orders). The recursive reachability is bounded
(depth <= 2) and path counts are exact integers, so the value hash
cannot drift with evaluation order.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry_util import QueryDef, shared_cooccurrence_edges, t

# ----------------------------------------------------------- VARIANT


def _json_variant_extract(spark, sf_dir):
    """Spark 4 VariantType path extraction over the events ``props``
    JSON column — parse once, extract ``$.k`` as long, aggregate per
    k-decade. (The pre-variant twin ``json_extract`` uses
    get_json_object; variant parses to a binary-encoded tree, the
    scale path for repeated multi-path extraction.)"""
    ev = t(spark, sf_dir, "events")
    staged = ev.select(
        F.expr("variant_get(parse_json(props), '$.k', 'long')").alias("k"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    return staged.groupBy((F.col("k") % 10).alias("kmod")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sum_cents"),
    )


_VARIANT_SQL = """
WITH e AS (
  SELECT CAST(props->>'$.k' AS BIGINT) AS k,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events)
SELECT k % 10 AS kmod, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(c) AS BIGINT) AS sum_cents
FROM e GROUP BY 1
"""

# --------------------------------------------------------- RECURSIVE

_REACH_SQL_SPARK = """
WITH RECURSIVE reach(node, d) AS (
  SELECT src, 0 FROM edges_tc_v
  WHERE src = (SELECT min(src) FROM edges_tc_v)
  UNION ALL
  SELECT e.dst, r.d + 1
  FROM reach r JOIN edges_tc_v e ON e.src = r.node
  WHERE r.d < 2
)
SELECT node, CAST(min(d) AS BIGINT) AS min_depth,
       CAST(count(*) AS BIGINT) AS n_paths
FROM reach GROUP BY 1
"""


def _sql_recursive_reach(spark, sf_dir):
    """Bounded transitive reachability via a RECURSIVE CTE (Spark 4):
    from the smallest node of the thresholded part co-occurrence
    graph, every node within 2 hops with its min depth and <=2-hop
    path count. The iterative-DataFrame twin of this shape is
    pagerank/connected-components; this key proves the SQL recursion
    surface gives the same exact integers DuckDB's recursion does."""
    # materialized shared edge stage: the recursive execution references
    # the view once per depth level (and once for the seed subquery) —
    # a parquet scan per reference instead of re-running the
    # collect_set+HOF edge build ~4x (and shared with the whole graph
    # family, one build per process)
    edges = shared_cooccurrence_edges(spark, sf_dir)
    edges.createOrReplaceTempView("edges_tc_v")
    return spark.sql(_REACH_SQL_SPARK)


def _reach_oracle_sql() -> str:
    from .registry_r3 import _PR_EDGES_CTE

    return f"""
WITH RECURSIVE edges_tc_v AS ({_PR_EDGES_CTE}),
reach(node, d) AS (
  SELECT src, 0 FROM edges_tc_v
  WHERE src = (SELECT min(src) FROM edges_tc_v)
  UNION ALL
  SELECT e.dst, r.d + 1
  FROM reach r JOIN edges_tc_v e ON e.src = r.node
  WHERE r.d < 2
)
SELECT node, CAST(min(d) AS BIGINT) AS min_depth,
       CAST(count(*) AS BIGINT) AS n_paths
FROM reach GROUP BY 1
"""


# ----------------------------------------------------------- LATERAL

_LATERAL_SQL_SPARK = """
SELECT o.o_orderkey, t.l_linenumber, t.price2
FROM (SELECT o_orderkey FROM orders_lat_v WHERE o_orderkey % 100 = 7) o,
LATERAL (SELECT l_linenumber,
                floor(l_extendedprice * 100 + 0.5) / 100.0D AS price2
         FROM lineitem_lat_v l WHERE l.l_orderkey = o.o_orderkey
         ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) t
"""
# NB the 100.0D double literal: Spark SQL parses a bare ``100.0`` as
# DECIMAL(4,1), silently making price2 DECIMAL(27,6) where the
# DataFrame API's ``/ 100.0`` gives DOUBLE — exactly the type drift
# the strict harness exists to catch.


def _sql_lateral_topn(spark, sf_dir):
    """Correlated LATERAL subquery with ORDER BY ... LIMIT — per-order
    top-2 line items by price over a deterministic order sample. The
    DataFrame twin is a ranked window; this proves Catalyst's
    decorrelation gives the same rows the oracle's native lateral
    gives."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat_v")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_lat_v")
    return spark.sql(_LATERAL_SQL_SPARK)


_LATERAL_ORACLE_SQL = """
SELECT o.o_orderkey, t.l_linenumber, t.price2
FROM (SELECT o_orderkey FROM orders WHERE o_orderkey % 100 = 7) o,
LATERAL (SELECT l_linenumber,
                floor(l_extendedprice * 100 + 0.5) / 100.0 AS price2
         FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
         ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) t
"""


SQL4_QUERIES: dict[str, QueryDef] = {
    q.name: q
    for q in (
        QueryDef(
            "json_variant_extract", _json_variant_extract, _VARIANT_SQL, ("sql4",)
        ),
        QueryDef(
            "sql_recursive_reach",
            _sql_recursive_reach,
            _reach_oracle_sql(),
            ("sql4",),
        ),
        QueryDef(
            "sql_lateral_topn", _sql_lateral_topn, _LATERAL_ORACLE_SQL, ("sql4",)
        ),
    )
}

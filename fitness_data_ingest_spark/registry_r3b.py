"""Round-3 second-wave registry: batch sessionization, truncated
EWMA, bucketed range join, distributed Pareto ranking, per-domain cap
sampling, exact embedding correlation matrix, snapshot diff.

Determinism rules as registry_ext: integer-exact aggregation (epoch
seconds / scaled-long cents / micro-units), fixed IEEE expression
trees for any final double, (key, id) total orders for every window.
Reference parity: the sessionize/EWMA/range-join family generalizes
the reference's per-day heart-rate series handling
(services/fitbit/fitbit_utils.py — minute-grain series fetched per
day, summarized client-side) to engine-side set operations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .ext import corpus as C2
from .ext import similarity as S
from .ops import incremental as INC
from .ops import relational as R
from .ops import scale as SC
from .ops import timeseries as TS
from .registry_util import QueryDef, t

# ------------------------------------------------------------ SESSIONIZE


def _events_sessionize(spark, sf_dir):
    """Batch sessionization of the events stream (30-min gap rule) —
    the batch twin of the streaming span-merge sessionizer."""
    return TS.sessionize(t(spark, sf_dir, "events"))


_SESSIONIZE_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS es,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events),
l AS (
  SELECT *, lag(es) OVER (PARTITION BY user_id ORDER BY es, event_id) AS pes
  FROM e),
s AS (
  SELECT user_id, es, c,
         CAST(sum(CASE WHEN pes IS NULL OR es - pes > {TS.SESSION_GAP_S}
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY es, event_id
                    ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS sess_id
  FROM l)
SELECT user_id, sess_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(es) - min(es) AS BIGINT) AS dur_s,
       CAST(sum(c) AS BIGINT) AS sum_cents
FROM s GROUP BY 1, 2
"""

# ------------------------------------------------------------------ EWMA


def _ts_ewma(spark, sf_dir):
    """Truncated-EWMA smoothing of each user's value series (depth 16,
    alpha 1/4, integer weights)."""
    return TS.ewma_trunc(t(spark, sf_dir, "events"))


def _ewma_sql() -> str:
    ws = TS.EWMA_WEIGHTS
    lag_cols = ", ".join(
        ["c AS c0"]
        + [f"lag(c, {k}) OVER w AS c{k}" for k in range(1, len(ws))]
    )
    num = " + ".join(
        [f"c0 * {ws[0]}"]
        + [
            f"CASE WHEN c{k} IS NOT NULL THEN c{k} * {ws[k]} ELSE 0 END"
            for k in range(1, len(ws))
        ]
    )
    den = " + ".join(
        [f"{ws[0]}"]
        + [
            f"CASE WHEN c{k} IS NOT NULL THEN {ws[k]} ELSE 0 END"
            for k in range(1, len(ws))
        ]
    )
    n_terms = " + ".join(
        ["1"]
        + [
            f"CASE WHEN c{k} IS NOT NULL THEN 1 ELSE 0 END"
            for k in range(1, len(ws))
        ]
    )
    return f"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) // 1000000 AS es,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events),
l AS (
  SELECT event_id, user_id, {lag_cols}
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id))
SELECT event_id, user_id, CAST({n_terms} AS BIGINT) AS n_terms,
       floor(CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE) / 100.0
             * 10000 + 0.5) / 10000.0 AS ewma4
FROM l
"""


# -------------------------------------------------------- RANGE JOIN

_RANGE_IV_S = 1_800
_RANGE_BUCKET_S = 1_800


def _range_join_events(spark, sf_dir):
    """Every purchase opens a 30-min attribution window; count and sum
    the same user's events landing inside it — via the bucketed
    equi-join range join (never a nested-loop join)."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("unix_micros(ts) div 1000000").alias("es"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    iv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("iv_id"),
        F.col("es").alias("s0"),
        (F.col("es") + _RANGE_IV_S).alias("s1"),
    )
    pts = ev.select("user_id", "es", "c")
    joined = R.range_join_bucketed(iv, pts, "user_id", _RANGE_BUCKET_S)
    return joined.groupBy("iv_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_in"),
        F.sum("c").alias("sum_cents"),
    )


_RANGE_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) // 1000000 AS es,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events),
iv AS (
  SELECT user_id, event_id AS iv_id, es AS s0, es + {_RANGE_IV_S} AS s1
  FROM e WHERE event_type = 'purchase')
SELECT iv.iv_id, iv.user_id, CAST(count(*) AS BIGINT) AS n_in,
       CAST(sum(p.c) AS BIGINT) AS sum_cents
FROM iv JOIN e p
  ON p.user_id = iv.user_id AND p.es >= iv.s0 AND p.es < iv.s1
GROUP BY 1, 2
"""

# ---------------------------------------------------------------- PARETO

_PARETO_BUCKETS = 256


def _orders_pareto(spark, sf_dir):
    """Revenue-concentration deciles (the '20% of customers = 80% of
    revenue' audit): customers ranked by exact cent revenue through
    :func:`distributed_rank` (range-partitioned — no partition-less
    window), bucketed into deciles, per-decile share of total."""
    orders = t(spark, sf_dir, "orders")
    rc = orders.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("rev_c")
    )
    tot = rc.agg(
        F.count(F.lit(1)).alias("n_cust_tot"),
        F.sum("rev_c").alias("tot_c"),
        F.max("rev_c").alias("max_c"),
        F.min("rev_c").alias("min_c"),
    )
    staged = rc.crossJoin(F.broadcast(tot)).withColumn(
        "bkt",
        F.expr(
            f"(max_c - rev_c) div ((max_c - min_c) div {_PARETO_BUCKETS} + 1)"
        ).cast("int"),
    )
    ranked = SC.distributed_rank(
        staged,
        [("rev_c", "desc"), ("o_custkey", "asc")],
        "bkt",
        n_buckets=_PARETO_BUCKETS,
    )
    dec = ranked.withColumn(
        "decile", F.expr("((rnk - 1) * 10) div n_cust_tot").cast("long")
    )
    return dec.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum("rev_c").alias("dec_cents"),
        (
            F.floor(
                F.sum("rev_c").cast("double")
                / F.max("tot_c").cast("double")
                * 10000
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("share4"),
    )


_PARETO_SQL = """
WITH rc AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS rev_c
  FROM orders GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_cust_tot,
               CAST(sum(rev_c) AS BIGINT) AS tot_c FROM rc),
r AS (
  SELECT o_custkey, rev_c,
         row_number() OVER (ORDER BY rev_c DESC, o_custkey) AS rnk
  FROM rc)
SELECT CAST(((rnk - 1) * 10) // n_cust_tot AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(rev_c) AS BIGINT) AS dec_cents,
       floor(CAST(sum(rev_c) AS DOUBLE) / CAST(max(tot_c) AS DOUBLE)
             * 10000 + 0.5) / 10000.0 AS share4
FROM r, tot GROUP BY 1
"""

# ------------------------------------------------------------ DOMAIN CAP


def _corpus_domain_cap(spark, sf_dir):
    """Per-source document cap (anti-domination sampling) via the
    salted two-level grouped top-k; per-source survivor stats."""
    kept = C2.domain_cap(t(spark, sf_dir, "documents"))
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.col("n_chars").cast("long")).alias("sum_chars"),
    )


_DOMAIN_CAP_SQL = f"""
WITH s AS (
  SELECT doc_id, source, n_chars,
         md5(CAST(doc_id AS VARCHAR)) AS pick
  FROM documents),
r AS (
  SELECT *, row_number() OVER (PARTITION BY source ORDER BY pick, doc_id)
         AS rn
  FROM s)
SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM r WHERE rn <= {C2.DOMAIN_CAP_K} GROUP BY 1
"""

# ----------------------------------------------------------- CORR MATRIX

_CORR_DIMS = 8


def _embed_corr_matrix(spark, sf_dir):
    """Exact Pearson correlation over the first 8 embedding dims —
    integer-moment single-pass aggregate."""
    return S.corr_matrix_int(t(spark, sf_dir, "embeddings"), dims=_CORR_DIMS)


_CORR_SQL = f"""
WITH m AS (
  SELECT list_transform(embedding[1:{_CORR_DIMS}],
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))
         AS mm
  FROM embeddings),
p AS (SELECT i.range AS i, j.range AS j
      FROM range({_CORR_DIMS}) i, range({_CORR_DIMS}) j
      WHERE i.range < j.range),
x AS (SELECT p.i, p.j, mm[p.i + 1] AS a, mm[p.j + 1] AS b FROM m, p),
s AS (SELECT i, j, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a) AS BIGINT) AS sx, CAST(sum(b) AS BIGINT) AS sy,
             CAST(sum(a * b) AS BIGINT) AS sxy,
             CAST(sum(a * a) AS BIGINT) AS sxx,
             CAST(sum(b * b) AS BIGINT) AS syy
      FROM x GROUP BY 1, 2)
SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j, n,
       floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             * 10000 + 0.5) / 10000.0 AS corr4
FROM s
"""

# ------------------------------------------------------------ TABLE DIFF


def _table_diff_snapshot(spark, sf_dir):
    """Diff two snapshot versions of orders (the new version derives
    deterministically: %7 keys re-priced ×1.1 + status 'U', %13 keys
    deleted, %31 keys cloned +10M as inserts) and report per-class row
    counts and money movement — one full-outer join, no window."""
    orders = t(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    upd = F.col("o_orderkey") % 7 == 0
    new = base.filter(F.col("o_orderkey") % 13 != 0).select(
        "o_orderkey",
        F.when(upd, F.lit("U")).otherwise(F.col("o_orderstatus")).alias(
            "o_orderstatus"
        ),
        F.when(
            upd,
            F.floor(F.col("o_totalprice") * 1.1 * 100 + F.lit(0.5)) / 100.0,
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    ).unionByName(
        base.filter(F.col("o_orderkey") % 31 == 0).select(
            (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
            F.lit("I").alias("o_orderstatus"),
            F.col("o_totalprice"),
        )
    )
    d = INC.snapshot_diff(
        base, new, "o_orderkey", ["o_orderstatus", "o_totalprice"]
    )
    cents = lambda c: F.floor(F.col(c) * 100 + F.lit(0.5)).cast("long")  # noqa: E731
    return d.groupBy("diff_class").agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(cents("old_o_totalprice")), F.lit(0))
        .cast("long")
        .alias("old_cents"),
        F.coalesce(F.sum(cents("new_o_totalprice")), F.lit(0))
        .cast("long")
        .alias("new_cents"),
    )


_DIFF_SQL = """
WITH newsnap AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN 'U' ELSE o_orderstatus END
           AS o_orderstatus,
         CASE WHEN o_orderkey % 7 = 0
              THEN floor(o_totalprice * 1.1 * 100 + 0.5) / 100.0
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 13 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, 'I', o_totalprice
  FROM orders WHERE o_orderkey % 31 = 0),
d AS (
  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         CASE WHEN o.o_orderkey IS NULL THEN 'A'
              WHEN n.o_orderkey IS NULL THEN 'R'
              WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                OR o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'C'
              ELSE 'U' END AS diff_class,
         o.o_totalprice AS op, n.o_totalprice AS np
  FROM orders o FULL OUTER JOIN newsnap n ON o.o_orderkey = n.o_orderkey)
SELECT diff_class, CAST(count(*) AS BIGINT) AS n,
       CAST(COALESCE(sum(CAST(floor(op * 100 + 0.5) AS BIGINT)), 0) AS BIGINT)
         AS old_cents,
       CAST(COALESCE(sum(CAST(floor(np * 100 + 0.5) AS BIGINT)), 0) AS BIGINT)
         AS new_cents
FROM d GROUP BY 1
"""


R3B_QUERIES: dict[str, QueryDef] = {
    q.name: q
    for q in (
        QueryDef("events_sessionize", _events_sessionize, _SESSIONIZE_SQL, ("ts",)),
        QueryDef("ts_ewma", _ts_ewma, _ewma_sql(), ("ts",)),
        QueryDef("range_join_events", _range_join_events, _RANGE_SQL, ("join",)),
        QueryDef("orders_pareto", _orders_pareto, _PARETO_SQL, ("scale",)),
        QueryDef(
            "corpus_domain_cap", _corpus_domain_cap, _DOMAIN_CAP_SQL, ("corpus",)
        ),
        QueryDef(
            "embed_corr_matrix", _embed_corr_matrix, _CORR_SQL, ("pipeline",)
        ),
        QueryDef("table_diff_snapshot", _table_diff_snapshot, _DIFF_SQL, ("incremental",)),
    )
}

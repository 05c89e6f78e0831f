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
from .registry_util import QueryDef, shared_minhash_cand_stats, t

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


# -------------------------------------------------------- SIMHASH PAIRS


def _dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pair detection (hamming <= 3) — completes the
    simhash path from signatures (dedup_simhash) to detected
    duplicates via pigeonhole banding: 4 bands of 8 bits,
    equi-self-join on the band, bit_count(xor) verify on candidates
    only — never all-pairs. The word-soup fixture clusters signatures
    hard (pair volume grows quadratically with SF), so the registered
    result is the per-distance pair HISTOGRAM plus each distance's
    minimum pair (driver-bounded, 4 rows) over the deterministic
    doc_id %% 5 sub-sample (the dedup_embedding_cosine precedent — the
    word-soup clustering is a fixture artifact, not an operator
    property); the pair-level operator is
    :func:`~fitness_data_ingest_spark.ext.dedup.simhash_near_pairs`."""
    from .ext import dedup as D
    from .ext import text as TX

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    th = TX.token_hashes(F.array_distinct(TX.tokens(F.col("text"))))
    sigs = docs.select("doc_id", D.simhash(th).alias("simhash"))
    pairs = D.simhash_near_pairs(sigs)
    return pairs.groupBy("hamming").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("doc_a").alias("min_doc_a"),
        F.min("doc_b").alias("min_doc_b"),
    )


def _simhash_pairs_sql() -> str:
    from .ext.dedup import SIMHASH_BITS
    from .registry_ext import _sql_simhash

    n_bands, band_bits = 4, SIMHASH_BITS // 4
    mask = (1 << band_bits) - 1
    return f"""
WITH sig0 AS ({_sql_simhash()}),
sig AS (SELECT * FROM sig0 WHERE doc_id % 5 = 0),
b AS (SELECT doc_id, simhash, t.range AS band_idx,
             (simhash >> (t.range * {band_bits})) & {mask} AS band_val
      FROM sig, range({n_bands}) t),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
                a.simhash AS sa, b2.simhash AS sb
         FROM b a JOIN b b2
           ON a.band_idx = b2.band_idx AND a.band_val = b2.band_val
          AND a.doc_id < b2.doc_id)
SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs,
       min(doc_a) AS min_doc_a, min(doc_b) AS min_doc_b
FROM (SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
      FROM cand WHERE bit_count(xor(sa, sb)) <= 3)
GROUP BY 1
"""


# ---------------------------------------------------------- RECALL EVAL


def _ann_recall_eval(spark, sf_dir):
    """ANN quality evaluation: recall@5 of the LSH-bucketed search
    against the brute-force exact top-5, per query — the measurement
    loop any production ANN deployment runs before trading recall for
    candidate-set size. Pure counting over two deterministic top-k
    results; at scale the brute-force side runs on a sampled query
    panel (here the full 10-query set)."""
    emb = t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    c = emb.filter(F.col("vec_id") >= 10)
    from .ext import similarity as S2

    brute = S2.cosine_topk(q, c).select("query_id", "cand_id")
    # NOTE (r12, measured): truncating lineage at the ≤ queries×k truth
    # list (it feeds both the hit join and k_eff) A/B'd 1.07 (5 reps,
    # same sitting) — the eager materialization job costs more than the
    # re-derived 10-query brute pass at this panel size. Left live; the
    # §27 dominance bound decides, not the consumer count.
    lsh = S2.lsh_bucketed_topk(q, c).select("query_id", "cand_id")
    hits = (
        brute.join(lsh, ["query_id", "cand_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    k_eff = brute.groupBy("query_id").agg(F.count(F.lit(1)).alias("k_eff"))
    return k_eff.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        (
            F.floor(
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.col("k_eff").cast("double")
                * 10000
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("recall4"),
    )


def _recall_sql() -> str:
    from .registry_ext import _EMB_D, _sql_lsh_bucket

    return f"""
WITH e AS (SELECT vec_id, {_EMB_D} AS v FROM embeddings),
n AS (SELECT * FROM (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
                            CAST({_sql_lsh_bucket()} AS BIGINT) AS bucket FROM e)
      WHERE nrm > 0),
bs AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
              list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
       FROM (SELECT * FROM n WHERE vec_id < 10) q,
            (SELECT * FROM n WHERE vec_id >= 10) c),
brute AS (SELECT query_id, cand_id FROM (
            SELECT query_id, cand_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, cand_id ASC) AS rnk
            FROM bs) WHERE rnk <= 5),
ls AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
              list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
       FROM (SELECT * FROM n WHERE vec_id < 10) q
       JOIN (SELECT * FROM n WHERE vec_id >= 10) c USING (bucket)),
lsh AS (SELECT query_id, cand_id FROM (
          SELECT query_id, cand_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, cand_id ASC) AS rnk
          FROM ls) WHERE rnk <= 5),
hits AS (SELECT b.query_id, CAST(count(*) AS BIGINT) AS n_hits
         FROM brute b JOIN lsh l
           ON b.query_id = l.query_id AND b.cand_id = l.cand_id
         GROUP BY 1),
k AS (SELECT query_id, CAST(count(*) AS BIGINT) AS k_eff
      FROM brute GROUP BY 1)
SELECT k.query_id, CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits,
       floor(CAST(COALESCE(n_hits, 0) AS DOUBLE) / CAST(k_eff AS DOUBLE)
             * 10000 + 0.5) / 10000.0 AS recall4
FROM k LEFT JOIN hits ON k.query_id = hits.query_id
"""


# ------------------------------------------------------------------ RFM


def _events_rfm_segment(spark, sf_dir):
    """RFM segmentation: per-user recency/frequency/monetary metrics,
    each quintiled by exact rank (distributed_rank — range-partitioned,
    no partition-less window), segment occupancy counts. The reference
    epoch is the corpus max event time, so the query is deterministic
    and re-runnable."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(ts) div 1000000").alias("es"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    u0 = ev.groupBy("user_id").agg(
        F.max("es").alias("last_es"),
        F.count(F.lit(1)).alias("freq"),
        F.sum("c").alias("mon_c"),
    )
    # the user-grain RFM table feeds the reference epoch, the min/max
    # stats row, and THREE chained distributed_rank passes (each
    # referencing its input twice) — without truncation the events scan
    # + user aggregate re-derived 2^3 times (32 parquet scans in one
    # plan, r11). The stored grain is one row per user — the reduced
    # grain a production pipeline would stage before ranking.
    u0 = SC.truncate_lineage(u0)
    ref = u0.agg(F.max("last_es").alias("ref_es"))
    u = u0.crossJoin(F.broadcast(ref)).withColumn(
        "r_days", F.expr("(ref_es - last_es) div 86400")
    )
    stats = u.agg(
        F.min("r_days").alias("r_mn"),
        F.max("r_days").alias("r_mx"),
        F.min("freq").alias("f_mn"),
        F.max("freq").alias("f_mx"),
        F.min("mon_c").alias("m_mn"),
        F.max("mon_c").alias("m_mx"),
        F.count(F.lit(1)).alias("nu"),
    )
    B = 64
    staged = u.crossJoin(F.broadcast(stats))
    for pre, col in (("r", "r_days"), ("f", "freq"), ("m", "mon_c")):
        staged = staged.withColumn(
            f"{pre}_bkt",
            F.expr(
                f"({col} - {pre}_mn) div (({pre}_mx - {pre}_mn) div {B} + 1)"
            ).cast("int"),
        )
    ranked = staged
    for pre, col in (("r", "r_days"), ("f", "freq"), ("m", "mon_c")):
        ranked = SC.distributed_rank(
            ranked,
            [(col, "asc"), ("user_id", "asc")],
            f"{pre}_bkt",
            n_buckets=B,
            rank_name=f"{pre}_rnk",
        )
    seg = ranked.select(
        F.expr("((r_rnk - 1) * 5) div nu").alias("r_seg"),
        F.expr("((f_rnk - 1) * 5) div nu").alias("f_seg"),
        F.expr("((m_rnk - 1) * 5) div nu").alias("m_seg"),
    )
    return seg.groupBy("r_seg", "f_seg", "m_seg").agg(
        F.count(F.lit(1)).alias("n_users")
    )


_RFM_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) // 1000000 AS es,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events),
u0 AS (SELECT user_id, max(es) AS last_es,
              CAST(count(*) AS BIGINT) AS freq,
              CAST(sum(c) AS BIGINT) AS mon_c
       FROM e GROUP BY 1),
ref AS (SELECT max(last_es) AS ref_es FROM u0),
u AS (SELECT user_id, CAST((ref_es - last_es) // 86400 AS BIGINT) AS r_days,
             freq, mon_c
      FROM u0, ref),
n AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM u),
rk AS (SELECT user_id, r_days, freq, mon_c,
              row_number() OVER (ORDER BY r_days ASC, user_id) AS rr,
              row_number() OVER (ORDER BY freq ASC, user_id) AS fr,
              row_number() OVER (ORDER BY mon_c ASC, user_id) AS mr
       FROM u)
SELECT CAST(((rr - 1) * 5) // nu AS BIGINT) AS r_seg,
       CAST(((fr - 1) * 5) // nu AS BIGINT) AS f_seg,
       CAST(((mr - 1) * 5) // nu AS BIGINT) AS m_seg,
       CAST(count(*) AS BIGINT) AS n_users
FROM rk, n GROUP BY 1, 2, 3
"""


for _q in (
    QueryDef(
        "dedup_simhash_pairs", _dedup_simhash_pairs, _simhash_pairs_sql(), ("ext",)
    ),
    QueryDef("ann_recall_eval", _ann_recall_eval, _recall_sql(), ("ext",)),
    QueryDef("events_rfm_segment", _events_rfm_segment, _RFM_SQL, ("pipeline",)),
):
    R3B_QUERIES[_q.name] = _q


# ------------------------------------------------------------------ LIFT


def _affinity_lift_topk(spark, sf_dir):
    """Top-25 part pairs by association LIFT (popularity-corrected
    co-occurrence) over order baskets."""
    return C2.cooccurrence_lift_topk(
        t(spark, sf_dir, "lineitem"), "l_orderkey", "l_partkey"
    )


_LIFT_SQL = """
WITH gi AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
pairs AS (
  SELECT a.i AS item_a, b.i AS item_b, CAST(count(*) AS BIGINT) AS n_ab
  FROM gi a JOIN gi b ON a.g = b.g AND a.i < b.i
  GROUP BY 1, 2 HAVING count(*) >= 2),
sup AS (SELECT i, CAST(count(*) AS BIGINT) AS n_i FROM gi GROUP BY 1),
ng AS (SELECT CAST(count(DISTINCT g) AS BIGINT) AS n_g FROM gi),
scored AS (
  SELECT item_a, item_b, n_ab,
         floor(CAST(n_ab AS DOUBLE) * CAST(n_g AS DOUBLE)
               / (CAST(sa.n_i AS DOUBLE) * CAST(sb.n_i AS DOUBLE))
               * 10000 + 0.5) / 10000.0 AS lift4
  FROM pairs JOIN sup sa ON sa.i = pairs.item_a
             JOIN sup sb ON sb.i = pairs.item_b, ng)
SELECT CAST(row_number() OVER (ORDER BY lift4 DESC, item_a, item_b) AS INT)
         AS rnk,
       item_a, item_b, n_ab, lift4
FROM scored
ORDER BY lift4 DESC, item_a, item_b LIMIT 25
"""

# ------------------------------------------------------ DEDUP BY SOURCE


def _corpus_dedup_rate_by_source(spark, sf_dir):
    """Cross-source near-duplicate contamination matrix: MinHash+LSH
    near-dup pairs rolled up to (source, source) — which sources
    duplicate each other (mirror detection / mixture-weight hygiene).
    Reuses the banded-LSH pair path end-to-end; sources attach by
    doc-grain equi-join and the pair endpoint sources normalize with
    least/greatest so the matrix is upper-triangular."""
    from .ext import dedup as D

    docs = t(spark, sf_dir, "documents")
    pairs = D.near_dups_from_pair_stats(
        shared_minhash_cand_stats(spark, sf_dir), 0.5
    )
    src = docs.select("doc_id", "source")
    j = (
        pairs.join(
            src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")),
            "doc_a",
        )
        .join(
            src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")),
            "doc_b",
        )
    )
    return j.select(
        F.least("sa", "sb").alias("source_a"),
        F.greatest("sa", "sb").alias("source_b"),
    ).groupBy("source_a", "source_b").agg(F.count(F.lit(1)).alias("n_pairs"))


def _dedup_rate_sql() -> str:
    from .registry_ext import _MINHASH_SQL

    return f"""
WITH pairs AS ({_MINHASH_SQL}),
src AS (SELECT doc_id, source FROM documents),
j AS (SELECT least(a.source, b.source) AS source_a,
             greatest(a.source, b.source) AS source_b
      FROM pairs JOIN src a ON a.doc_id = pairs.doc_a
                 JOIN src b ON b.doc_id = pairs.doc_b)
SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
FROM j GROUP BY 1, 2
"""


# --------------------------------------------------------------- STREAKS


def _events_streak_islands(spark, sf_dir):
    """Per-user consecutive-active-day streaks (gaps and islands)."""
    return TS.activity_streaks(t(spark, sf_dir, "events"))


_STREAK_SQL = """
WITH days AS (
  SELECT DISTINCT user_id,
         (epoch_us(ts) // 1000000) // 86400 AS dnum
  FROM events),
isl AS (
  SELECT user_id, dnum,
         dnum - row_number() OVER (PARTITION BY user_id ORDER BY dnum)
           AS island
  FROM days),
islands AS (
  SELECT user_id, island, CAST(count(*) AS BIGINT) AS len,
         min(dnum) AS start_day
  FROM isl GROUP BY 1, 2)
SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(max(len) AS BIGINT) AS best_len,
       CAST(min(CASE WHEN len = ml THEN start_day END) AS BIGINT)
         AS best_start
FROM (SELECT *, max(len) OVER (PARTITION BY user_id) AS ml FROM islands)
GROUP BY 1
"""


for _q in (
    QueryDef("affinity_lift_topk", _affinity_lift_topk, _LIFT_SQL, ("corpus",)),
    QueryDef(
        "corpus_dedup_rate_by_source",
        _corpus_dedup_rate_by_source,
        _dedup_rate_sql(),
        ("corpus",),
    ),
    QueryDef(
        "events_streak_islands", _events_streak_islands, _STREAK_SQL, ("ts",)
    ),
):
    R3B_QUERIES[_q.name] = _q


# -------------------------------------------------------------- JOIN IVM


def _ivm_join_delta(spark, sf_dir):
    """Join-view incremental maintenance: treat %17 orders and %23
    lineitems as today's inserts; compute the materialized
    orders⋈lineitem view's DELTA via the three-term propagation rule
    (never re-joining base⋈base), summarized per order status."""
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_c"),
    )
    old_o = orders.filter(F.col("o_orderkey") % 17 != 0)
    d_o = orders.filter(F.col("o_orderkey") % 17 == 0)
    old_l = li.filter(F.col("o_orderkey") % 23 != 0)
    d_l = li.filter(F.col("o_orderkey") % 23 == 0)
    delta = INC.join_delta(old_o, d_o, old_l, d_l, "o_orderkey")
    return delta.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("price_c").alias("sum_cents"),
    )


_IVM_SQL = """
WITH o AS (SELECT o_orderkey, o_orderstatus FROM orders),
l AS (SELECT l_orderkey AS o_orderkey,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c
      FROM lineitem),
oo AS (SELECT * FROM o WHERE o_orderkey % 17 <> 0),
do_ AS (SELECT * FROM o WHERE o_orderkey % 17 = 0),
ol AS (SELECT * FROM l WHERE o_orderkey % 23 <> 0),
dl AS (SELECT * FROM l WHERE o_orderkey % 23 = 0),
delta AS (
  SELECT do_.o_orderstatus, ol.price_c FROM do_ JOIN ol USING (o_orderkey)
  UNION ALL
  SELECT oo.o_orderstatus, dl.price_c FROM oo JOIN dl USING (o_orderkey)
  UNION ALL
  SELECT do_.o_orderstatus, dl.price_c FROM do_ JOIN dl USING (o_orderkey))
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(price_c) AS BIGINT) AS sum_cents
FROM delta GROUP BY 1
"""

R3B_QUERIES["ivm_join_delta"] = QueryDef(
    "ivm_join_delta", _ivm_join_delta, _IVM_SQL, ("incremental",)
)


# ----------------------------------------------------------- MIXTURE PLAN


def _corpus_mixture_plan(spark, sf_dir):
    """Temperature-scaled (τ=0.5) source mixture plan under a 50%%
    global token budget."""
    return C2.mixture_plan(t(spark, sf_dir, "documents"))


_MIX_PLAN_SQL = """
WITH per AS (
  SELECT source, CAST(sum(n_chars) AS BIGINT) AS avail_chars,
         CAST(floor(sqrt(CAST(sum(n_chars) AS DOUBLE))) AS BIGINT) AS sq_w
  FROM documents GROUP BY 1),
tot AS (
  SELECT CAST(sum(sq_w) AS BIGINT) AS sq_tot,
         CAST(sum(avail_chars) AS BIGINT) AS chars_tot
  FROM per)
SELECT source, avail_chars,
       floor(CAST(sq_w AS DOUBLE) / CAST(sq_tot AS DOUBLE) * 10000 + 0.5)
         / 10000.0 AS share4,
       CAST(floor(CAST(chars_tot * 50 AS DOUBLE) / 100.0
                  * (CAST(sq_w AS DOUBLE) / CAST(sq_tot AS DOUBLE)))
            AS BIGINT) AS target_chars,
       floor(least(1.0,
                   CAST(CAST(floor(CAST(chars_tot * 50 AS DOUBLE) / 100.0
                              * (CAST(sq_w AS DOUBLE) / CAST(sq_tot AS DOUBLE)))
                        AS BIGINT) AS DOUBLE)
                   / CAST(avail_chars AS DOUBLE)) * 10000 + 0.5) / 10000.0
         AS rate4
FROM per, tot
"""

R3B_QUERIES["corpus_mixture_plan"] = QueryDef(
    "corpus_mixture_plan", _corpus_mixture_plan, _MIX_PLAN_SQL, ("corpus",)
)


# ------------------------------------------------------------- CDC CHUNKS


def _corpus_cdc_chunks(spark, sf_dir):
    """Content-defined (Rabin-boundary) chunking + corpus-wide
    duplicate-chunk rate per source."""
    return C2.cdc_chunk_stats(t(spark, sf_dir, "documents"))


_CDC_SQL = f"""
WITH staged0 AS (
  SELECT doc_id, source,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
staged AS (
  SELECT * FROM staged0 WHERE len(toks) > 0),
b AS (
  SELECT doc_id, source, toks,
         list_filter(range(0, len(toks)),
                     j -> j = 0 OR
                          ('0x' || substr(md5(toks[j + 1]), 1, 8))::BIGINT
                          % {C2.CDC_MASK} = 0) AS bp
  FROM staged),
e AS (
  SELECT doc_id, source, toks, bp,
         list_concat(bp[2:], [len(toks)]) AS ends
  FROM b),
ch AS (
  SELECT doc_id, source,
         md5(array_to_string(toks[z[1] + 1 : z[2]], ' '))
           AS chunk_hash,
         CAST(z[2] - z[1] AS BIGINT) AS n_tok
  FROM e, LATERAL unnest(list_zip(bp, ends)) AS u(z)),
hc AS (SELECT chunk_hash, count(*) AS cnt FROM ch GROUP BY 1)
SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_chunks,
       CAST(sum(n_tok) AS BIGINT) AS sum_tok,
       CAST(sum(CASE WHEN cnt > 1 THEN n_tok ELSE 0 END) AS BIGINT)
         AS dup_tok,
       floor(CAST(sum(CASE WHEN cnt > 1 THEN n_tok ELSE 0 END) AS DOUBLE)
             / CAST(sum(n_tok) AS DOUBLE) * 10000 + 0.5) / 10000.0
         AS dup_rate4
FROM ch JOIN hc USING (chunk_hash) GROUP BY 1
"""

R3B_QUERIES["corpus_cdc_chunks"] = QueryDef(
    "corpus_cdc_chunks", _corpus_cdc_chunks, _CDC_SQL, ("corpus",)
)


# ------------------------------------------------------------------ CUSUM


def _events_cusum_alerts(spark, sf_dir):
    """Per-user CUSUM drift alarms via the exact two-window closed form
    of the reset recurrence."""
    return TS.cusum_alerts(t(spark, sf_dir, "events"))


_CUSUM_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS es,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events),
m AS (SELECT user_id, CAST(sum(c) // count(*) AS BIGINT) AS k
      FROM e GROUP BY 1),
p AS (
  SELECT e.user_id, e.event_id, e.es, e.c,
         CAST(sum(e.c - m.k) OVER (PARTITION BY e.user_id
                                   ORDER BY e.es, e.event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS pfx
  FROM e JOIN m ON m.user_id = e.user_id),
s AS (
  SELECT user_id, event_id, es,
         pfx - least(CAST(0 AS BIGINT),
                     min(pfx) OVER (PARTITION BY user_id
                                    ORDER BY es, event_id
                                    ROWS UNBOUNDED PRECEDING)) AS sv
  FROM p),
x AS (
  SELECT user_id, sv,
         lag(sv) OVER (PARTITION BY user_id ORDER BY es, event_id) AS psv
  FROM s)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN sv > {TS.CUSUM_H_CENTS}
                      AND (psv IS NULL OR psv <= {TS.CUSUM_H_CENTS})
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_alerts,
       CAST(max(sv) AS BIGINT) AS max_s
FROM x GROUP BY 1
"""

R3B_QUERIES["events_cusum_alerts"] = QueryDef(
    "events_cusum_alerts", _events_cusum_alerts, _CUSUM_SQL, ("ts",)
)


# ------------------------------------------------------------- AUDIO RMS


def _multimodal_audio_features(spark, sf_dir):
    """Real audio feature extraction (integer RMS + peak) over the
    synthesized-WAV payloads — byte-level decode through mapInPandas.
    Full hash oracle via relational LCG replay (the pixel-stats
    pattern): payload synthesis is arithmetic in (doc_id, length), so
    DuckDB re-derives every 16-bit sample with the pw(k) power table
    and recomputes ssq/peak/rms without ever seeing a byte — the hash
    match proves the encode→parse-RIFF→decode-PCM loop recovers every
    sample exactly. The numpy re-decode parity stays in
    tests/test_multimodal.py."""
    from .ext import multimodal as MM

    docs = t(spark, sf_dir, "documents")
    media = MM.synthesize_media(docs)
    return MM.audio_features(media)


# Relational replay of the synthesize_media WAV-sample LCG (same pw(k)
# = (A^k, sum_{j<k} A^j) mod 2^63 table as _PIXEL_STATS_SQL in
# registry_r4): per even doc_id, m = (len%256+16)*(1+(id//2)%2)
# samples (max 542), sample_k = ((A^k*s0+S_k) >> 33) % 65536 - 32768;
# ssq/peak are exact int64 and rms2 = floor(sqrt(ssq/m)*100+0.5)/100
# is one IEEE sqrt of exact integers, bit-identical across engines.
_AUDIO_FEATURES_SQL = """
WITH RECURSIVE pw(k, ak, sk) AS (
  SELECT 1, CAST(6364136223846793005 AS BIGINT), CAST(1 AS BIGINT)
  UNION ALL
  SELECT k + 1,
         CAST((CAST(6364136223846793005 AS HUGEINT) * ak)
              % 9223372036854775808 AS BIGINT),
         CAST((CAST(6364136223846793005 AS HUGEINT) * sk + 1)
              % 9223372036854775808 AS BIGINT)
  FROM pw WHERE k < 542
),
wavs AS (
  SELECT doc_id AS media_id,
         CAST((length(text) % 256 + 16)
              * (1 + (doc_id // 2) % 2) AS BIGINT) AS m,
         CAST((CAST(doc_id AS HUGEINT) * 6364136223846793005
               + 1442695040888963407) % 9223372036854775808 AS BIGINT) AS s0
  FROM documents WHERE doc_id % 2 = 0
),
smp AS (
  SELECT w.media_id, w.m,
         (CAST((CAST(p.ak AS HUGEINT) * w.s0 + p.sk)
               % 9223372036854775808 AS BIGINT) // 8589934592) % 65536
           - 32768 AS s
  FROM wavs w JOIN pw p ON p.k <= w.m
),
agg AS (
  SELECT media_id, m, CAST(sum(s * s) AS BIGINT) AS ssq,
         CAST(max(abs(s)) AS BIGINT) AS peak
  FROM smp GROUP BY media_id, m
)
SELECT media_id, CAST(m AS BIGINT) AS n_values,
       floor(sqrt(CAST(ssq AS DOUBLE) / m) * 100 + 0.5) / 100.0 AS rms2,
       peak
FROM agg
UNION ALL
SELECT doc_id AS media_id, CAST(NULL AS BIGINT) AS n_values,
       CAST(NULL AS DOUBLE) AS rms2, CAST(NULL AS BIGINT) AS peak
FROM documents WHERE doc_id % 2 = 1
"""

R3B_QUERIES["multimodal_audio_features"] = QueryDef(
    "multimodal_audio_features",
    _multimodal_audio_features,
    _AUDIO_FEATURES_SQL,
    ("multimodal",),
)


# -------------------------------------------------------- CONTAINMENT


def _dedup_containment_pairs(spark, sf_dir):
    """Shingle-containment near-dup pairs (|A∩B| / min(|A|,|B|) >= 0.6)
    — catches small-doc-inside-big-doc inclusions Jaccard under-scores."""
    from .ext import dedup as D

    return D.containment_pairs(t(spark, sf_dir, "documents"), "doc_id", "text")


def _containment_sql() -> str:
    from .ext.dedup import CONTAINMENT_THRESHOLD, NGRAM_MAX_DF
    from .registry_ext import _SQL_DOC_SHINGLES

    return f"""
WITH {_SQL_DOC_SHINGLES},
ex AS (SELECT doc_id, unnest(shd) AS s FROM sh),
hot AS (SELECT s FROM ex GROUP BY s HAVING count(*) > {NGRAM_MAX_DF}),
exf AS (SELECT * FROM ex WHERE s NOT IN (SELECT s FROM hot)),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM exf a JOIN exf b ON a.s = b.s AND a.doc_id < b.doc_id),
pairs AS (
  SELECT doc_a, doc_b,
         len(list_intersect(x.shd, y.shd))::DOUBLE
           / least(len(x.shd), len(y.shd))::DOUBLE AS c
  FROM cand JOIN sh x ON x.doc_id = cand.doc_a
            JOIN sh y ON y.doc_id = cand.doc_b)
SELECT doc_a, doc_b, floor(c * 10000 + 0.5) / 10000.0 AS cont4
FROM pairs WHERE c >= {CONTAINMENT_THRESHOLD}
"""


# ------------------------------------------------------ FORECAST BACKTEST


def _events_forecast_backtest(spark, sf_dir):
    """Seasonal-profile forecast backtest: train on the first 3/4 of
    the time span, predict each test event's value from the user's
    hour-of-day train profile (integer-cents mean; fallbacks: user
    mean, then global mean), report per-user MAE — the evaluation loop
    of any demand/load forecaster, on exact integers."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.hour("ts").alias("hod"),
        F.expr("unix_micros(ts) div 1000000").alias("es"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    bounds = ev.agg(
        F.min("es").alias("mn"), F.max("es").alias("mx")
    ).select(
        (F.col("mn") + F.expr("(mx - mn) * 3 div 4")).alias("cutoff")
    )
    e = ev.crossJoin(F.broadcast(bounds))
    train = e.filter(F.col("es") < F.col("cutoff"))
    test = e.filter(F.col("es") >= F.col("cutoff"))
    prof = train.groupBy("user_id", "hod").agg(
        F.expr("sum(c) div count(*)").alias("p_uh")
    )
    umean = train.groupBy("user_id").agg(
        F.expr("sum(c) div count(*)").alias("p_u")
    )
    gmean = train.agg(F.expr("sum(c) div count(*)").alias("p_g"))
    scored = (
        test.join(prof, ["user_id", "hod"], "left")
        .join(umean, "user_id", "left")
        .crossJoin(F.broadcast(gmean))
        .withColumn(
            "err",
            F.abs(
                F.col("c")
                - F.coalesce(F.col("p_uh"), F.col("p_u"), F.col("p_g"))
            ),
        )
    )
    return scored.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum("err").alias("sum_abs_err"),
        (
            F.floor(
                F.sum("err").cast("double")
                / F.count(F.lit(1)).cast("double")
                + F.lit(0.5)
            ).cast("long")
        ).alias("mae_cents"),
    )


_FORECAST_SQL = """
WITH ev AS (
  SELECT user_id, CAST(hour(ts) AS INT) AS hod,
         epoch_us(ts) // 1000000 AS es,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events),
b AS (SELECT min(es) + ((max(es) - min(es)) * 3) // 4 AS cutoff FROM ev),
train AS (SELECT ev.* FROM ev, b WHERE es < cutoff),
test AS (SELECT ev.* FROM ev, b WHERE es >= cutoff),
prof AS (SELECT user_id, hod, CAST(sum(c) // count(*) AS BIGINT) AS p_uh
         FROM train GROUP BY 1, 2),
um AS (SELECT user_id, CAST(sum(c) // count(*) AS BIGINT) AS p_u
       FROM train GROUP BY 1),
gm AS (SELECT CAST(sum(c) // count(*) AS BIGINT) AS p_g FROM train),
scored AS (
  SELECT t.user_id,
         abs(t.c - COALESCE(p.p_uh, u.p_u, g.p_g)) AS err
  FROM test t
  LEFT JOIN prof p ON p.user_id = t.user_id AND p.hod = t.hod
  LEFT JOIN um u ON u.user_id = t.user_id
  CROSS JOIN gm g)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(err) AS BIGINT) AS sum_abs_err,
       CAST(floor(CAST(sum(err) AS DOUBLE) / CAST(count(*) AS DOUBLE) + 0.5)
            AS BIGINT) AS mae_cents
FROM scored GROUP BY 1
"""

R3B_QUERIES["dedup_containment_pairs"] = QueryDef(
    "dedup_containment_pairs", _dedup_containment_pairs, _containment_sql(), ("ext",)
)
R3B_QUERIES["events_forecast_backtest"] = QueryDef(
    "events_forecast_backtest", _events_forecast_backtest, _FORECAST_SQL, ("ts",)
)


# ---------------------------------------------------------------- A/B TEST


def _events_ab_test(spark, sf_dir):
    """Deterministic A/B experiment readout: users split into variants
    by md5 parity (the engine-portable bucketing every experiment
    platform uses), per-variant event/purchase/conversion stats
    pivoted to ONE row with conversion lift and the two-proportion
    z-score — all from exact integer counts through one fixed IEEE
    expression tree."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    variant = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 2
    )
    staged = ev.withColumn("v", variant).withColumn(
        "is_p", (F.col("event_type") == "purchase").cast("long")
    )
    per = staged.groupBy("v").agg(
        F.countDistinct("user_id").alias("nu"),
        F.count(F.lit(1)).alias("ne"),
        F.sum("is_p").alias("np"),
        F.sum(F.when(F.col("is_p") == 1, F.col("c")).otherwise(0)).alias("pc"),
    )
    one = per.groupBy().agg(
        F.sum(F.when(F.col("v") == 0, F.col("nu"))).alias("users_a"),
        F.sum(F.when(F.col("v") == 1, F.col("nu"))).alias("users_b"),
        F.sum(F.when(F.col("v") == 0, F.col("ne"))).alias("events_a"),
        F.sum(F.when(F.col("v") == 1, F.col("ne"))).alias("events_b"),
        F.sum(F.when(F.col("v") == 0, F.col("np"))).alias("purch_a"),
        F.sum(F.when(F.col("v") == 1, F.col("np"))).alias("purch_b"),
        F.sum(F.when(F.col("v") == 0, F.col("pc"))).alias("cents_a"),
        F.sum(F.when(F.col("v") == 1, F.col("pc"))).alias("cents_b"),
    )
    ra = F.col("purch_a").cast("double") / F.col("events_a").cast("double")
    rb = F.col("purch_b").cast("double") / F.col("events_b").cast("double")
    p = (F.col("purch_a") + F.col("purch_b")).cast("double") / (
        F.col("events_a") + F.col("events_b")
    ).cast("double")
    z = (ra - rb) / F.sqrt(
        p
        * (1 - p)
        * (
            1 / F.col("events_a").cast("double")
            + 1 / F.col("events_b").cast("double")
        )
    )
    r4 = lambda col: F.floor(col * 10000 + F.lit(0.5)) / 10000.0  # noqa: E731
    return one.select(
        "users_a",
        "users_b",
        "purch_a",
        "purch_b",
        "cents_a",
        "cents_b",
        r4(ra).alias("rate_a4"),
        r4(rb).alias("rate_b4"),
        r4(ra / rb).alias("lift4"),
        r4(z).alias("z4"),
    )


_AB_SQL = """
WITH e AS (
  SELECT user_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))::BIGINT % 2 AS v,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
  FROM events),
per AS (
  SELECT v, CAST(count(DISTINCT user_id) AS BIGINT) AS nu,
         CAST(count(*) AS BIGINT) AS ne,
         CAST(sum(is_p) AS BIGINT) AS np,
         CAST(sum(CASE WHEN is_p = 1 THEN c ELSE 0 END) AS BIGINT) AS pc
  FROM e GROUP BY 1),
one AS (
  SELECT CAST(sum(CASE WHEN v = 0 THEN nu END) AS BIGINT) AS users_a,
         CAST(sum(CASE WHEN v = 1 THEN nu END) AS BIGINT) AS users_b,
         CAST(sum(CASE WHEN v = 0 THEN ne END) AS BIGINT) AS events_a,
         CAST(sum(CASE WHEN v = 1 THEN ne END) AS BIGINT) AS events_b,
         CAST(sum(CASE WHEN v = 0 THEN np END) AS BIGINT) AS purch_a,
         CAST(sum(CASE WHEN v = 1 THEN np END) AS BIGINT) AS purch_b,
         CAST(sum(CASE WHEN v = 0 THEN pc END) AS BIGINT) AS cents_a,
         CAST(sum(CASE WHEN v = 1 THEN pc END) AS BIGINT) AS cents_b
  FROM per)
SELECT users_a, users_b, purch_a, purch_b, cents_a, cents_b,
       floor(CAST(purch_a AS DOUBLE) / CAST(events_a AS DOUBLE) * 10000 + 0.5)
         / 10000.0 AS rate_a4,
       floor(CAST(purch_b AS DOUBLE) / CAST(events_b AS DOUBLE) * 10000 + 0.5)
         / 10000.0 AS rate_b4,
       floor(CAST(purch_a AS DOUBLE) / CAST(events_a AS DOUBLE)
             / (CAST(purch_b AS DOUBLE) / CAST(events_b AS DOUBLE))
             * 10000 + 0.5) / 10000.0 AS lift4,
       floor((CAST(purch_a AS DOUBLE) / CAST(events_a AS DOUBLE)
              - CAST(purch_b AS DOUBLE) / CAST(events_b AS DOUBLE))
             / sqrt((CAST(purch_a + purch_b AS DOUBLE)
                     / CAST(events_a + events_b AS DOUBLE))
                    * (1 - CAST(purch_a + purch_b AS DOUBLE)
                           / CAST(events_a + events_b AS DOUBLE))
                    * (1 / CAST(events_a AS DOUBLE)
                       + 1 / CAST(events_b AS DOUBLE)))
             * 10000 + 0.5) / 10000.0 AS z4
FROM one
"""

R3B_QUERIES["events_ab_test"] = QueryDef(
    "events_ab_test", _events_ab_test, _AB_SQL, ("pipeline",)
)


# --------------------------------------------------------------- COHORT LTV


def _orders_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value curves: customers grouped by first-order
    month, cumulative revenue (exact cents) by month-age — the money
    companion of the retention cohort."""
    orders = t(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("m"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    first = orders.groupBy("o_custkey").agg(F.min("m").alias("m0"))
    j = orders.join(first, "o_custkey").withColumn("age_m", F.col("m") - F.col("m0"))
    per = j.groupBy("m0", "age_m").agg(
        F.countDistinct("o_custkey").alias("n_active"),
        F.sum("c").alias("cents"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("m0").orderBy("age_m").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return per.select(
        F.col("m0").alias("cohort_m"),
        "age_m",
        "n_active",
        F.sum("cents").over(w).alias("cum_cents"),
    )


_LTV_SQL = """
WITH o AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS m,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
  FROM orders),
f AS (SELECT o_custkey, min(m) AS m0 FROM o GROUP BY 1),
j AS (SELECT o.o_custkey, f.m0, o.m - f.m0 AS age_m, o.c
      FROM o JOIN f ON f.o_custkey = o.o_custkey),
per AS (SELECT m0, age_m, CAST(count(DISTINCT o_custkey) AS BIGINT)
               AS n_active,
               CAST(sum(c) AS BIGINT) AS cents
        FROM j GROUP BY 1, 2)
SELECT m0 AS cohort_m, age_m, n_active,
       CAST(sum(cents) OVER (PARTITION BY m0 ORDER BY age_m
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_cents
FROM per
"""

R3B_QUERIES["orders_cohort_ltv"] = QueryDef(
    "orders_cohort_ltv", _orders_cohort_ltv, _LTV_SQL, ("pipeline",)
)


# ------------------------------------------------------------- DAU/WAU/MAU


def _events_active_users(spark, sf_dir):
    """Exact DAU / WAU / MAU per day. Sliding COUNT(DISTINCT) windows
    don't decompose (a user active twice in a week must count once),
    so each (user, day) activity row FANS OUT to the 7 / 30 future
    days it keeps the user active for, then a distinct + count per
    target day — bounded fan-out on the DAY-USER grain (~1/1000th of
    event volume), pure equi-shapes, no window over raw events.
    Trailing days beyond the observed span drop via the equi-join back
    to the real day list."""
    days = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("(unix_micros(ts) div 1000000) div 86400").alias("dnum"),
        )
        .distinct()
    )
    day_list = days.select("dnum").distinct()
    dau = days.groupBy("dnum").agg(F.count(F.lit(1)).alias("dau"))

    def rolling(n: int, name: str):
        fan = days.select(
            "user_id",
            F.explode(
                F.sequence(F.col("dnum"), F.col("dnum") + (n - 1))
            ).alias("tgt"),
        ).distinct()
        return (
            fan.join(day_list, fan.tgt == day_list.dnum)
            .groupBy("dnum")
            .agg(F.count(F.lit(1)).alias(name))
        )

    return (
        dau.join(rolling(7, "wau"), "dnum")
        .join(rolling(30, "mau"), "dnum")
        .select("dnum", "dau", "wau", "mau")
    )


_ACTIVE_SQL = """
WITH days AS (
  SELECT DISTINCT user_id,
         (epoch_us(ts) // 1000000) // 86400 AS dnum
  FROM events),
dl AS (SELECT DISTINCT dnum FROM days)
SELECT dl.dnum,
       CAST((SELECT count(*) FROM days d WHERE d.dnum = dl.dnum) AS BIGINT)
         AS dau,
       CAST((SELECT count(DISTINCT d.user_id) FROM days d
             WHERE d.dnum BETWEEN dl.dnum - 6 AND dl.dnum) AS BIGINT)
         AS wau,
       CAST((SELECT count(DISTINCT d.user_id) FROM days d
             WHERE d.dnum BETWEEN dl.dnum - 29 AND dl.dnum) AS BIGINT)
         AS mau
FROM dl
"""

R3B_QUERIES["events_active_users"] = QueryDef(
    "events_active_users", _events_active_users, _ACTIVE_SQL, ("pipeline",)
)


# ------------------------------------------------------------ PATH ANALYSIS


def _events_path_topk(spark, sf_dir):
    """Top-20 3-step event-type paths within sessions (the product-
    analytics 'how do users reach purchase' query): sessionize, fold
    each session's ordered type sequence into an array, expand 3-grams
    IN PLACE with array HOFs (no per-step self-join), count, and rank
    with the window-free limit-then-rank top-k."""
    from pyspark.sql import Window as W

    from .ops.scale import ranked_topk
    from .ops.timeseries import SESSION_GAP_S

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("unix_micros(ts) div 1000000").alias("es"),
    )
    w = W.partitionBy("user_id").orderBy("es", "event_id")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    brk = (
        F.when(
            F.lag("es").over(w).isNull()
            | (F.col("es") - F.lag("es").over(w) > SESSION_GAP_S),
            1,
        )
        .otherwise(0)
    )
    sess = ev.withColumn("sess_id", F.sum(brk).over(run))
    seqs = sess.groupBy("user_id", "sess_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("es", "event_id", "event_type"))
            ),
            lambda s: s.event_type,
        ).alias("types")
    )
    n = F.size("types")
    grams = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(0), n - 3),
            lambda i: F.concat_ws(
                ">",
                F.element_at(F.col("types"), (i + 1).cast("int")),
                F.element_at(F.col("types"), (i + 2).cast("int")),
                F.element_at(F.col("types"), (i + 3).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        seqs.select(F.explode(grams).alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return ranked_topk(counts, [("n", "desc"), ("path", "asc")], 20)


_PATH_SQL = """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) // 1000000 AS es
  FROM events),
l AS (SELECT *, lag(es) OVER (PARTITION BY user_id ORDER BY es, event_id)
             AS pes FROM e),
s AS (SELECT user_id, event_id, event_type, es,
             sum(CASE WHEN pes IS NULL OR es - pes > 1800 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY es, event_id
                     ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM l),
seqs AS (SELECT user_id, sess_id,
                list(event_type ORDER BY es, event_id) AS types
         FROM s GROUP BY 1, 2),
grams AS (
  SELECT unnest(CASE WHEN len(types) >= 3
                     THEN list_transform(range(0, len(types) - 2),
                          i -> types[i + 1] || '>' || types[i + 2]
                               || '>' || types[i + 3])
                     ELSE [] END) AS path
  FROM seqs),
counts AS (SELECT path, CAST(count(*) AS BIGINT) AS n
           FROM grams GROUP BY 1)
SELECT CAST(row_number() OVER (ORDER BY n DESC, path) AS INT) AS rnk,
       path, n
FROM counts ORDER BY n DESC, path LIMIT 20
"""

R3B_QUERIES["events_path_topk"] = QueryDef(
    "events_path_topk", _events_path_topk, _PATH_SQL, ("pipeline",)
)


# ----------------------------------------------------------- MAD ANOMALY

_MAD_K = 4.4478  # 3 sigma-equivalents x 1.4826 (normal-consistency)


def _per_user_median(df, val: str, out: str):
    """Exact per-user interpolated median for HIGH-CARDINALITY groups:
    one window shuffle on user_id (the groups themselves are the
    parallelism — the range-bucketed exact_quantiles exists for the
    opposite regime, few/whale groups, and costs several stages per
    pass). Interpolation expression shape identical to quantile_cont
    (v_lo + (v_hi - v_lo)·frac), so it stays oracle-exact."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(val)
    r = df.withColumn("rn", F.row_number().over(w) - 1).withColumn(
        "nn", F.count(F.lit(1)).over(W.partitionBy("user_id"))
    )
    idx = F.lit(0.5) * (F.col("nn") - 1)
    lo, hi = F.floor(idx), F.ceil(idx)
    picked = r.filter((F.col("rn") == lo) | (F.col("rn") == hi))
    agg = picked.groupBy("user_id").agg(
        F.min(F.when(F.col("rn") == F.floor(F.lit(0.5) * (F.col("nn") - 1)),
                     F.col(val))).alias("_vlo"),
        F.min(F.when(F.col("rn") == F.ceil(F.lit(0.5) * (F.col("nn") - 1)),
                     F.col(val))).alias("_vhi"),
        F.min(F.lit(0.5) * (F.col("nn") - 1) - F.floor(
            F.lit(0.5) * (F.col("nn") - 1))).alias("_fr"),
    )
    return agg.select(
        "user_id",
        (F.col("_vlo") + (F.col("_vhi") - F.col("_vlo")) * F.col("_fr")
         ).alias(out),
    )


def _events_anomaly_mad(spark, sf_dir):
    """Robust per-user anomaly detection: |x - median| > 3σ-equivalent
    of the Median Absolute Deviation — the outlier-resistant twin of
    events_anomaly_zscore (one wild event shifts a mean/std envelope,
    not a median/MAD one). Exact interpolated medians via per-user
    windows (see _per_user_median), everything downstream one fixed
    IEEE expression over exact inputs."""
    staged = t(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
    )
    med = _per_user_median(staged, "c", "med")
    d = staged.join(med, "user_id").withColumn(
        "dv", F.abs(F.col("c").cast("double") - F.col("med"))
    )
    mad = _per_user_median(d.select("user_id", "dv"), "dv", "mad")
    scored = d.join(mad, "user_id")
    anom = (F.col("dv") > F.col("mad") * _MAD_K).cast("long")
    return scored.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(anom).alias("n_anomalies"),
        (F.floor(F.max("med") * 100 + F.lit(0.5)) / 100.0).alias("med2"),
        (F.floor(F.max("mad") * 100 + F.lit(0.5)) / 100.0).alias("mad2"),
    )


_MAD_SQL = f"""
WITH e AS (
  SELECT user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events),
med AS (SELECT user_id, quantile_cont(c, 0.5) AS med FROM e GROUP BY 1),
d AS (SELECT e.user_id, e.c, med.med,
             abs(CAST(e.c AS DOUBLE) - med.med) AS dv
      FROM e JOIN med ON med.user_id = e.user_id),
mad AS (SELECT user_id, quantile_cont(dv, 0.5) AS mad FROM d GROUP BY 1)
SELECT d.user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN dv > mad.mad * {_MAD_K} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_anomalies,
       floor(max(d.med) * 100 + 0.5) / 100.0 AS med2,
       floor(max(mad.mad) * 100 + 0.5) / 100.0 AS mad2
FROM d JOIN mad ON mad.user_id = d.user_id
GROUP BY 1
"""

R3B_QUERIES["events_anomaly_mad"] = QueryDef(
    "events_anomaly_mad", _events_anomaly_mad, _MAD_SQL, ("pipeline",)
)


# ---------------------------------------------------------- ASOF NEAREST


def _join_asof_nearest(spark, sf_dir):
    """Nearest-direction as-of: each purchase matched to the CLOSEST
    click (either direction) of the same user — completing the as-of
    family (backward = join_asof; nearest = two union-merge passes,
    forward realized as backward over negated timestamps)."""
    from .ops.relational import asof_join_nearest

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("unix_micros(ts) div 1000000").alias("es"),
    )
    l = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("es").alias("p_es"), F.col("event_id").alias("p_id")
    )
    r = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("es").alias("c_es"), F.col("event_id").alias("c_id")
    )
    return asof_join_nearest(l, r, "user_id", "p_es", "c_es", "p_id", "c_id")


_ASOF_NEAREST_SQL = """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) // 1000000 AS es
  FROM events),
l AS (SELECT user_id, es AS p_es, event_id AS p_id
      FROM e WHERE event_type = 'purchase'),
r AS (SELECT user_id, es AS c_es, event_id AS c_id
      FROM e WHERE event_type = 'click'),
j AS (SELECT l.user_id, l.p_es, l.p_id, r.c_id, r.c_es
      FROM l LEFT JOIN r ON r.user_id = l.user_id),
rk AS (SELECT *, row_number() OVER (PARTITION BY p_id
                                    ORDER BY abs(c_es - p_es), c_es,
                                             c_id DESC) AS rn
       FROM j)
SELECT user_id, p_es, p_id, c_id AS nearest_rid, c_es AS nearest_ts,
       abs(c_es - p_es) AS dist
FROM rk WHERE rn = 1
"""

R3B_QUERIES["join_asof_nearest"] = QueryDef(
    "join_asof_nearest", _join_asof_nearest, _ASOF_NEAREST_SQL, ("join",)
)


# ----------------------------------------------------------- ASOF FORWARD


def _join_asof_forward(spark, sf_dir):
    """Forward as-of: each purchase matched to the EARLIEST click at or
    after it (same user) — realized as the backward union-merge over
    negated timestamps; completes the backward/forward/nearest as-of
    family."""
    from .ops.relational import asof_join

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("unix_micros(ts) div 1000000").alias("es"),
    )
    l = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        (-F.col("es")).alias("p_neg"),
        F.col("event_id").alias("p_id"),
        F.col("es").alias("p_es"),
    )
    r = ev.filter(F.col("event_type") == "click").select(
        "user_id", (-F.col("es")).alias("c_neg"), F.col("event_id").alias("c_id")
    )
    out = asof_join(l, r, "user_id", "p_neg", "c_neg", "p_id", "c_id")
    return out.select(
        "user_id",
        "p_id",
        "p_es",
        F.col("c_id").alias("next_cid"),
        (-F.col("c_neg")).alias("next_es"),
    )


_ASOF_FWD_SQL = """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) // 1000000 AS es
  FROM events),
l AS (SELECT user_id, es AS p_es, event_id AS p_id
      FROM e WHERE event_type = 'purchase'),
r AS (SELECT user_id, es AS c_es, event_id AS c_id
      FROM e WHERE event_type = 'click'),
j AS (SELECT l.user_id, l.p_id, l.p_es, r.c_id, r.c_es
      FROM l LEFT JOIN r
        ON r.user_id = l.user_id AND r.c_es >= l.p_es),
rk AS (SELECT *, row_number() OVER (PARTITION BY p_id
                                    ORDER BY c_es, c_id DESC) AS rn
       FROM j)
SELECT user_id, p_id, p_es, c_id AS next_cid, c_es AS next_es
FROM rk WHERE rn = 1
"""

R3B_QUERIES["join_asof_forward"] = QueryDef(
    "join_asof_forward", _join_asof_forward, _ASOF_FWD_SQL, ("join",)
)


# ------------------------------------------------------------ VOCAB DRIFT

_DRIFT_VOCAB_K = 50


def _corpus_vocab_drift(spark, sf_dir):
    """Per-source vocabulary drift against the corpus: χ² statistic of
    each source's top-vocab term counts vs the corpus-wide expectation
    — the log-free distribution-shift detector (a KL/perplexity drift
    score needs log(), whose last-ulp differs across libm builds and
    can flip a value hash; χ² is plain arithmetic over exact
    integers)."""
    from .ops.scale import ranked_topk

    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    vocab_counts = tok.groupBy("term").agg(F.count(F.lit(1)).alias("ctf"))
    vocab = ranked_topk(
        vocab_counts, [("ctf", "desc"), ("term", "asc")], _DRIFT_VOCAB_K
    ).select("term", "ctf")
    in_vocab = tok.join(F.broadcast(vocab), "term")
    per = in_vocab.groupBy("source", "term").agg(
        F.count(F.lit(1)).alias("c_st"),
        F.max("ctf").alias("ctf"),
    )
    tot = vocab.agg(F.sum("ctf").alias("ctot"))
    src_tot = per.groupBy("source").agg(F.sum("c_st").alias("ts"))
    j = per.join(src_tot, "source").crossJoin(F.broadcast(tot))
    e = (
        F.col("ts").cast("double")
        * F.col("ctf").cast("double")
        / F.col("ctot").cast("double")
    )
    chi_term = (F.col("c_st").cast("double") - e) * (
        F.col("c_st").cast("double") - e
    ) / e
    # each term's contribution rounds to integer micro-units BEFORE the
    # sum: a raw double sum is partition-order-dependent (the
    # nondeterminism class this repo bans from oracle columns); the
    # per-term expression is one fixed IEEE tree, and integer sums
    # commute
    chi_micro = F.floor(chi_term * 1_000_000 + F.lit(0.5)).cast("long")
    return j.groupBy("source").agg(
        F.max("ts").alias("n_vocab_tokens"),
        (
            F.floor(
                F.sum(chi_micro).cast("double") / 1_000_000 * 100 + F.lit(0.5)
            )
            / 100.0
        ).alias("chi2_2"),
    )


_DRIFT_SQL = f"""
WITH tok AS (
  SELECT source, unnest(list_filter(string_split(text, ' '), x -> x <> ''))
           AS term
  FROM documents),
vc AS (SELECT term, CAST(count(*) AS BIGINT) AS ctf FROM tok GROUP BY 1),
vocab AS (SELECT term, ctf FROM vc
          ORDER BY ctf DESC, term LIMIT {_DRIFT_VOCAB_K}),
iv AS (SELECT t.source, t.term, v.ctf FROM tok t JOIN vocab v USING (term)),
per AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c_st,
               CAST(max(ctf) AS BIGINT) AS ctf
        FROM iv GROUP BY 1, 2),
tot AS (SELECT CAST(sum(ctf) AS BIGINT) AS ctot FROM vocab),
st AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS ts FROM per GROUP BY 1)
SELECT per.source, CAST(max(st.ts) AS BIGINT) AS n_vocab_tokens,
       floor(CAST(sum(CAST(floor(
                 (CAST(c_st AS DOUBLE)
                  - CAST(st.ts AS DOUBLE) * CAST(per.ctf AS DOUBLE)
                    / CAST(tot.ctot AS DOUBLE))
                 * (CAST(c_st AS DOUBLE)
                    - CAST(st.ts AS DOUBLE) * CAST(per.ctf AS DOUBLE)
                      / CAST(tot.ctot AS DOUBLE))
                 / (CAST(st.ts AS DOUBLE) * CAST(per.ctf AS DOUBLE)
                    / CAST(tot.ctot AS DOUBLE))
                 * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1000000 * 100 + 0.5) / 100.0 AS chi2_2
FROM per JOIN st ON st.source = per.source, tot
GROUP BY 1
"""

R3B_QUERIES["corpus_vocab_drift"] = QueryDef(
    "corpus_vocab_drift", _corpus_vocab_drift, _DRIFT_SQL, ("corpus",)
)


# ------------------------------------------------------- THRESHOLD SWEEP


def _dedup_threshold_sweep(spark, sf_dir):
    """Dedup tuning curve: how many near-dup pairs survive each Jaccard
    threshold 0.3..0.9 — ONE exact-pairs pass (shared-shingle
    candidates at the lowest threshold), then a 7-way threshold
    explode + count. The curve a curator reads before committing to a
    cutoff; built on the exact n-gram path because banded LSH loses
    recall below its S-curve knee (~0.59 at b=8, r=4) and would bend
    the curve's low end."""
    from .ext import dedup as D

    pairs = D.ngram_jaccard_pairs(
        t(spark, sf_dir, "documents"), "doc_id", "text", 0.3
    )
    ths = F.array(*[F.lit(x / 10.0) for x in range(3, 10)])
    return (
        pairs.select("jaccard", F.explode(ths).alias("threshold"))
        .filter(F.col("jaccard") >= F.col("threshold"))
        .groupBy("threshold")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def _sweep_sql() -> str:
    from .registry_ext import _SQL_DOC_SHINGLES
    from .ext.dedup import NGRAM_MAX_DF

    return f"""
WITH {_SQL_DOC_SHINGLES},
ex AS (SELECT doc_id, unnest(shd) AS s FROM sh),
hot AS (SELECT s FROM ex GROUP BY s HAVING count(*) > {NGRAM_MAX_DF}),
exf AS (SELECT * FROM ex WHERE s NOT IN (SELECT s FROM hot)),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM exf a JOIN exf b ON a.s = b.s AND a.doc_id < b.doc_id),
pairs AS (
  SELECT doc_a, doc_b,
         len(list_intersect(x.shd, y.shd))::DOUBLE
           / (len(x.shd) + len(y.shd) - len(list_intersect(x.shd, y.shd)))
           AS j
  FROM cand JOIN sh x ON x.doc_id = cand.doc_a
            JOIN sh y ON y.doc_id = cand.doc_b),
p4 AS (SELECT floor(j * 10000 + 0.5) / 10000.0 AS jaccard
       FROM pairs WHERE j >= 0.3),
ths AS (SELECT CAST(unnest([0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS DOUBLE)
          AS threshold)
SELECT threshold, CAST(count(*) AS BIGINT) AS n_pairs
FROM p4 JOIN ths ON p4.jaccard >= ths.threshold
GROUP BY 1
"""


R3B_QUERIES["dedup_threshold_sweep"] = QueryDef(
    "dedup_threshold_sweep", _dedup_threshold_sweep, _sweep_sql(), ("ext",)
)

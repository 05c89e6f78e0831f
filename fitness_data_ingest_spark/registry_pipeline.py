"""Pipeline-operator registry: corpus construction (packing, vocab,
mixture sampling, PII), embedding audits, anomaly flagging, funnel
attribution, and the stream-stream interval join's batch form.

Oracle SQL mirrors the Spark expressions exactly (same integer-exact
aggregation, same floor-rounding, same tie-breaks) so value hashes
match bit-for-bit; see registry_ext's header for the determinism rules.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .ext import corpus as C
from .ext import dedup as D
from .ext import text as TX
from .ops import relational as R
from .ops import scale as SC
from .ops import timeseries as TS
from .registry_util import QueryDef, money_sum, sql_money_sum, t
from .stream import windows as W

_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"


def _corpus_pack_chunks(spark, sf_dir):
    return C.pack_chunks(t(spark, sf_dir, "documents"))


_PACK_SQL = f"""
WITH d AS (SELECT doc_id, source, len({_TOKS}) AS n_tok,
                  CAST(floor(doc_id / {C.PACK_SHARD_DOCS}) AS BIGINT) AS shard
           FROM documents),
s AS (SELECT *, sum(n_tok) OVER (PARTITION BY source, shard ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM d),
c AS (SELECT *, CAST(floor((cum - n_tok) / {C.PACK_BUDGET}) AS BIGINT)
                  AS chunk_id
      FROM s)
SELECT source, shard, chunk_id, count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS chunk_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM c GROUP BY 1, 2, 3
"""


def _corpus_vocab_topk(spark, sf_dir):
    return C.vocab_topk(t(spark, sf_dir, "documents"))


_VOCAB_SQL = f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
agg AS (SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
        FROM tok GROUP BY 1),
top AS (SELECT * FROM agg ORDER BY tf DESC, term LIMIT 50)
SELECT term, tf, df, row_number() OVER (ORDER BY tf DESC, term) AS rnk FROM top
"""


def _corpus_mixture_sample(spark, sf_dir):
    return C.mixture_sample(t(spark, sf_dir, "documents"))


_MIXTURE_SQL = f"""
WITH r AS (
  SELECT source, doc_id,
         CASE WHEN substr(source, length(source), 1)
                   IN ('0','2','4','6','8')
              THEN {C.MIX_HI_RATE} ELSE {C.MIX_LO_RATE} END AS rate
  FROM documents),
k AS (
  SELECT source,
         CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT
                   < CAST(floor(rate * 65536) AS BIGINT)
              THEN 1 ELSE 0 END AS kept
  FROM r)
SELECT source, count(*) AS n_docs, CAST(sum(kept) AS BIGINT) AS n_kept,
       floor((sum(kept)::DOUBLE / count(*)) * 10000 + 0.5) / 10000.0
         AS achieved_rate4
FROM k GROUP BY source
"""


def _text_pii_redact(spark, sf_dir):
    """PII scrub over documents; the fixture corpus carries no PII, so a
    deterministic augmentation plants synthetic emails/phones keyed by
    doc_id first — the redaction (count + strip) then runs on real
    regexp built-ins against varying per-row content."""
    docs = t(spark, sf_dir, "documents")
    email = F.when(
        F.col("doc_id") % 3 != 0,
        F.concat(
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.lit(" call 555-"),
            F.lpad(((F.col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    synth = F.concat(F.col("text"), email, phone)
    n_emails, n_phones, redacted = TX.redact_pii(synth)
    return docs.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


_PII_SQL = f"""
WITH s AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 <> 0
                 THEN ' contact user' || doc_id::VARCHAR || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 2 = 0
                 THEN ' call 555-' || lpad(((doc_id * 7) % 10000)::VARCHAR, 4, '0')
                 ELSE '' END AS synth
  FROM documents)
SELECT doc_id,
       len(regexp_extract_all(synth, '{TX.EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(synth, '{TX.PHONE_RE}')) AS n_phones,
       md5(regexp_replace(regexp_replace(synth, '{TX.EMAIL_RE}', '<EMAIL>', 'g'),
                          '{TX.PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
FROM s
"""


def _embed_dim_stats(spark, sf_dir):
    return C.embedding_dim_stats(t(spark, sf_dir, "embeddings"))


_DIM_STATS_SQL = """
WITH e AS (SELECT unnest(embedding) AS v,
                  unnest(range(0, len(embedding))) AS dim
           FROM embeddings),
m AS (SELECT dim, CAST(floor(CAST(v AS DOUBLE) * 1e6) AS BIGINT) AS micro,
             CAST(v AS DOUBLE) AS vd
      FROM e)
SELECT dim, count(*) AS n_vecs, CAST(sum(micro) AS BIGINT) AS sum_micro,
       min(vd) AS min_v, max(vd) AS max_v,
       floor((CAST(sum(micro) AS DOUBLE) / count(*) / 1e6) * 1e6 + 0.5) / 1e6
         AS mean6
FROM m GROUP BY dim
"""


def _events_anomaly_zscore(spark, sf_dir):
    return C.anomaly_zscore(t(spark, sf_dir, "events"))


_ANOMALY_SQL = """
WITH per AS (SELECT event_type,
                    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
             FROM events),
mom AS (SELECT event_type, count(*) AS n,
               CAST(sum(c) AS BIGINT) AS sc, CAST(sum(c * c) AS BIGINT) AS sq
        FROM per GROUP BY 1),
j AS (SELECT per.event_type, c, n, sc, sq FROM per JOIN mom USING (event_type)),
f AS (SELECT event_type, n, sc, sq,
             CASE WHEN CAST(c * n - sc AS DOUBLE) * CAST(c * n - sc AS DOUBLE)
                       > 9.0 * CAST(n * sq - sc * sc AS DOUBLE)
                  THEN 1 ELSE 0 END AS flag
      FROM j)
SELECT event_type, max(n) AS n, CAST(sum(flag) AS BIGINT) AS n_outliers,
       floor((CAST(max(sc) AS DOUBLE) / max(n) / 100.0) * 1e4 + 0.5) / 1e4
         AS mean4,
       floor((sqrt(CAST(max(n) * max(sq) - max(sc) * max(sc) AS DOUBLE)
                   / CAST(max(n) * max(n) AS DOUBLE)) / 100.0) * 1e4 + 0.5) / 1e4
         AS std4
FROM f GROUP BY event_type
"""


def _events_funnel(spark, sf_dir):
    return C.funnel_counts(t(spark, sf_dir, "events"))


_FUNNEL_SQL = """
WITH a AS (SELECT user_id, event_type, ts,
                  min(CASE WHEN event_type = 'view' THEN ts END)
                      OVER (PARTITION BY user_id) AS t1
           FROM events),
b AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
                    OVER (PARTITION BY user_id) AS t2
      FROM a),
c AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
                    OVER (PARTITION BY user_id) AS t3
      FROM b),
u AS (SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
      FROM c GROUP BY user_id)
SELECT count(t1) AS n_viewed, count(t2) AS n_clicked_after_view,
       count(t3) AS n_purchased_after_click
FROM u
"""


def _stream_interval_join(spark, sf_dir):
    """Batch form of the stream-stream interval join (the same operator
    runs on two watermarked streams — tests/test_streaming.py)."""
    return W.click_attribution(t(spark, sf_dir, "events"))


_INTERVAL_JOIN_SQL = """
WITH v AS (SELECT user_id, ts AS v_ts, event_id AS view_id FROM events
           WHERE event_type = 'view'),
c AS (SELECT user_id, ts AS c_ts, event_id AS click_id FROM events
      WHERE event_type = 'click'),
p AS (SELECT v.user_id, view_id, click_id
      FROM v JOIN c ON v.user_id = c.user_id
                   AND c.c_ts > v.v_ts
                   AND c.c_ts <= v.v_ts + INTERVAL 10 MINUTE)
SELECT user_id, count(*) AS n_pairs,
       count(DISTINCT click_id) AS n_clicks,
       count(DISTINCT view_id) AS n_views
FROM p GROUP BY user_id
"""


def _ts_resample_ffill(spark, sf_dir):
    return TS.resample_ffill(t(spark, sf_dir, "events"))


_RESAMPLE_SQL = f"""
WITH obs AS (SELECT user_id, epoch_us(ts) AS ord_us, 1 AS is_obs, value AS v,
                    event_id AS eid, CAST(NULL AS BIGINT) AS gs FROM events),
b AS (SELECT user_id,
             CAST(floor(epoch(min(ts)) / {TS.GRID_S}) * {TS.GRID_S} AS BIGINT) AS g0,
             CAST(floor(epoch(max(ts)) / {TS.GRID_S}) * {TS.GRID_S} AS BIGINT) AS g1
      FROM events GROUP BY user_id),
grid AS (SELECT user_id, unnest(range(g0, g1 + {TS.GRID_S}, {TS.GRID_S})) AS gs
         FROM b),
g2 AS (SELECT user_id, gs * 1000000 AS ord_us, 0 AS is_obs,
              CAST(NULL AS DOUBLE) AS v, CAST(-1 AS BIGINT) AS eid, gs FROM grid),
u AS (SELECT * FROM obs UNION ALL SELECT * FROM g2),
f AS (SELECT *, last_value(v IGNORE NULLS) OVER (
        PARTITION BY user_id ORDER BY ord_us, is_obs DESC, eid
        ROWS UNBOUNDED PRECEDING) AS value_ffill FROM u)
SELECT user_id,
       strftime(TIMESTAMP '1970-01-01' + gs * INTERVAL 1 SECOND,
                '%Y-%m-%d %H:%M:%S') AS slot,
       value_ffill
FROM f WHERE is_obs = 0
"""


def _ts_rolling_hour_avg(spark, sf_dir):
    return TS.rolling_hour_avg(t(spark, sf_dir, "events"))


_ROLLING_SQL = """
WITH s AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events)
SELECT event_id, user_id,
       count(*) OVER w AS n_1h,
       floor((CAST(sum(c) OVER w AS DOUBLE) / count(*) OVER w / 100.0) * 1e4 + 0.5)
         / 1e4 AS avg_1h4
FROM s
WINDOW w AS (PARTITION BY user_id ORDER BY es
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


def _scd2_merge(spark, sf_dir):
    """SCD2/CDC classification between the customer snapshot and a
    deterministically mutated incoming snapshot (every %10th balance
    bumped, every %13==7 key deleted, a %97==3 clone set inserted) —
    exercises the full-outer MERGE diff on real data without a second
    fixture table."""
    cust = t(spark, sf_dir, "customer")
    cur = cust.select("c_custkey", "c_acctbal")
    upd_mod = cust.filter(F.col("c_custkey") % 13 != 7).select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 10 == 0, F.col("c_acctbal") + 100.0
        )
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    )
    upd_new = cust.filter(F.col("c_custkey") % 97 == 3).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.lit(0.0).alias("c_acctbal"),
    )
    updates = upd_mod.unionByName(upd_new)
    return R.scd2_changes(cur, updates, "c_custkey", "c_acctbal")


_SCD2_SQL = """
WITH cur AS (SELECT c_custkey AS k, c_acctbal AS bal FROM customer),
upd AS (
  SELECT c_custkey AS k,
         CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0
              ELSE c_acctbal END AS bal
  FROM customer WHERE c_custkey % 13 <> 7
  UNION ALL
  SELECT c_custkey + 1000000 AS k, 0.0 AS bal
  FROM customer WHERE c_custkey % 97 = 3),
j AS (SELECT cur.k AS ck, upd.k AS uk, cur.bal AS old_val, upd.bal AS new_val
      FROM cur FULL OUTER JOIN upd ON cur.k = upd.k)
SELECT coalesce(ck, uk) AS c_custkey,
       CASE WHEN uk IS NULL THEN 'close'
            WHEN ck IS NULL THEN 'insert'
            ELSE 'update' END AS action,
       old_val, new_val
FROM j
WHERE uk IS NULL OR ck IS NULL OR old_val <> new_val
"""


def _agg_cube(spark, sf_dir):
    """CUBE over (status, priority) with grouping_id — all four rollup
    combinations in one pass (Expand + single aggregate exchange)."""
    from .registry_util import money_sum

    orders = t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        money_sum(F.col("o_totalprice")).alias("total_price"),
        F.grouping_id().alias("gid"),
    )


_CUBE_SQL = f"""
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       {sql_money_sum('o_totalprice')} AS total_price,
       GROUPING(o_orderstatus, o_orderpriority) AS gid
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def _er_fuzzy_pairs(spark, sf_dir):
    """Entity-resolution pairs over customer names at substitution
    distance <= 1, via masked-position blocking (SymSpell-style) —
    the fuzzy-match face of the dedup family."""
    return D.fuzzy_name_pairs(t(spark, sf_dir, "customer"), "c_custkey", "c_name")


_ER_FUZZY_SQL = """
WITH c AS (SELECT c_custkey AS k, c_name AS nm FROM customer),
v AS (SELECT k, nm, i,
             substr(nm, 1, i - 1) || '_' || substr(nm, i + 1) AS masked
      FROM c, UNNEST(range(1, length(nm) + 1)) AS t(i)),
p AS (SELECT DISTINCT a.k AS key_a, b.k AS key_b,
                      a.nm AS name_a, b.nm AS name_b
      FROM v a JOIN v b
        ON a.i = b.i AND a.masked = b.masked AND a.k < b.k)
SELECT key_a, key_b, name_a, name_b,
       levenshtein(name_a, name_b) AS lev
FROM p
"""


def _corpus_source_composition(spark, sf_dir):
    """Per-source mixture audit; corpus total via 1-row broadcast
    crossJoin (single job, no eager count)."""
    return C.source_composition(t(spark, sf_dir, "documents"))


_SOURCE_COMP_SQL = """
WITH per AS (SELECT source, count(*) AS n_docs,
                    CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                    count(DISTINCT lang) AS n_langs
             FROM documents GROUP BY 1),
tot AS (SELECT count(*) AS total_docs FROM documents)
SELECT source, n_docs, sum_chars, n_langs,
       floor((CAST(n_docs AS DOUBLE) / total_docs) * 1e6 + 0.5) / 1e6
         AS share6,
       floor((CAST(sum_chars AS DOUBLE) / n_docs) * 100 + 0.5) / 100.0
         AS mean_chars2
FROM per, tot
"""


def _events_retention_cohort(spark, sf_dir):
    """Weekly cohort retention matrix: cohort from a min window over the
    user partitioning (one shuffle, no self-join)."""
    return C.retention_cohort(t(spark, sf_dir, "events"))


_RETENTION_SQL = """
WITH w AS (SELECT user_id,
                  CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk
           FROM events),
c AS (SELECT user_id, min(wk) AS cohort_wk FROM w GROUP BY 1),
j AS (SELECT w.user_id, cohort_wk, wk - cohort_wk AS weeks_since
      FROM w JOIN c USING (user_id))
SELECT cohort_wk, weeks_since, count(DISTINCT user_id) AS n_active
FROM j GROUP BY 1, 2
"""


def _text_bigram_topk(spark, sf_dir):
    """Top-40 corpus bigrams via distributed TakeOrderedAndProject."""
    return TX.bigram_topk(t(spark, sf_dir, "documents"))


_BIGRAM_SQL = f"""
WITH t AS (SELECT {_TOKS} AS tk FROM documents),
g AS (SELECT tk[i] || ' ' || tk[i + 1] AS bigram
      FROM t, UNNEST(range(1, len(tk))) AS r(i)
      WHERE len(tk) >= 2),
agg AS (SELECT bigram, count(*) AS tf FROM g GROUP BY 1),
top AS (SELECT * FROM agg ORDER BY tf DESC, bigram LIMIT 40)
SELECT bigram, tf, row_number() OVER (ORDER BY tf DESC, bigram) AS rnk FROM top
"""


def _join_salted_skew(spark, sf_dir):
    """The skew-salting scale op driven through the correctness gate:
    lineitem x supplier on suppkey salted 8 ways (the hot key fans
    across 8 reducers), then revenue per supplier nation — results
    provably identical to the plain join the oracle runs."""
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    joined = SC.salted_join(li, supp, "l_suppkey", "s_suppkey", salt_n=8)
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        money_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("revenue"),
    )


_SALTED_SQL = f"""
SELECT s_nationkey, count(*) AS n_lines,
       {sql_money_sum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
"""


def _corpus_curation_funnel(spark, sf_dir):
    """Four-stage curation funnel (quality -> language -> dedup
    canonical -> mixture keep) in one scan + one window shuffle."""
    return C.curation_funnel(t(spark, sf_dir, "documents"))


_EN_LIST_P = "[" + ", ".join(f"'{w}'" for w in TX.STOPWORDS["en"]) + "]"

_CURATION_SQL = f"""
WITH tok AS (SELECT doc_id, source, lang, text, {_TOKS} AS toks
             FROM documents),
s AS (SELECT doc_id, source, md5(text) AS h,
             (least(len(toks)::DOUBLE / 100.0, 1.0) * 0.4
              + (len(list_filter(toks, x -> list_contains({_EN_LIST_P}, x)))::DOUBLE
                 / len(toks)) * 0.3
              + (length(regexp_replace(text, '[^a-z]', '', 'g'))::DOUBLE
                 / length(text)) * 0.3) >= 0.45 AS pq,
             lang = 'en' AS is_en
      FROM tok),
f AS (SELECT *, pq AND is_en AS pl FROM s),
c AS (SELECT *, min(CASE WHEN pl THEN doc_id END)
                  OVER (PARTITION BY h) AS msur
      FROM f),
k AS (SELECT source, pq, pl, (pl AND doc_id = msur) AS canon,
             (pl AND doc_id = msur
              AND ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT
                  < CAST(floor(CASE WHEN substr(source, length(source), 1)
                                         IN ('0','2','4','6','8')
                                    THEN {C.MIX_HI_RATE}
                                    ELSE {C.MIX_LO_RATE} END * 65536)
                         AS BIGINT)) AS keep
      FROM c)
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN pq THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       CAST(sum(CASE WHEN pl THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
       CAST(sum(CASE WHEN canon THEN 1 ELSE 0 END) AS BIGINT) AS n_canonical,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM k GROUP BY source
"""


def _agg_linear_fit(spark, sf_dir):
    """OLS price-vs-quantity per returnflag from exact integer moments
    (decimal(38,0) sums; DuckDB mirrors with int128)."""
    li = t(spark, sf_dir, "lineitem")
    return C.linear_fit(
        li,
        "l_returnflag",
        F.col("l_quantity").cast("long"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long"),
    )


_LINEAR_FIT_SQL = """
WITH m AS (SELECT l_returnflag,
                  CAST(l_quantity AS HUGEINT) AS x,
                  CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT) AS y
           FROM lineitem),
a AS (SELECT l_returnflag, CAST(count(*) AS HUGEINT) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
      FROM m GROUP BY 1)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0 THEN
         floor(((CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE)) / 100.0) * 1e6 + 0.5) / 1e6
       END AS slope6,
       CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0 THEN
         floor((((CAST(sy AS DOUBLE)
                  - (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE)) / 100.0) * 1e6 + 0.5) / 1e6
       END AS intercept6,
       CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
             AND CAST(n * syy - sy * sy AS DOUBLE) > 0 THEN
         floor((CAST(n * sxy - sx * sy AS DOUBLE)
                / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                   * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))) * 1e6 + 0.5) / 1e6
       END AS corr6
FROM a
"""


def _affinity_part_pairs(spark, sf_dir):
    """Market-basket affinity: top co-occurring part pairs within
    orders; self equi-join bounded by per-order line count."""
    return C.cooccurrence_topk(
        t(spark, sf_dir, "lineitem"), "l_orderkey", "l_partkey"
    )


_AFFINITY_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem),
pr AS (SELECT a.item AS item_a, b.item AS item_b
       FROM d a JOIN d b ON a.g = b.g AND a.item < b.item),
agg AS (SELECT item_a, item_b, count(*) AS n_groups FROM pr GROUP BY 1, 2),
top AS (SELECT * FROM agg ORDER BY n_groups DESC, item_a, item_b LIMIT 25)
SELECT item_a, item_b, n_groups,
       row_number() OVER (ORDER BY n_groups DESC, item_a, item_b) AS rnk
FROM top
"""


def _agg_mode_argmax(spark, sf_dir):
    """Per-user modal event type via min-struct argmax aggregate (no
    window); the oracle proves equivalence with a rank-window form."""
    return C.mode_per_group(t(spark, sf_dir, "events"), "user_id", "event_type")


_MODE_SQL = """
WITH c AS (SELECT user_id, event_type, count(*) AS cnt
           FROM events GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY cnt DESC, event_type) AS rn
      FROM c)
SELECT user_id, event_type AS mode_event_type, cnt AS n FROM r WHERE rn = 1
"""


def _join_bucketed_colocated(spark, sf_dir):
    """Fact-fact join through same-key bucketed catalog tables: both
    sides land bucketed by the order key (amortized once at write time
    on a real pipeline), so the join itself plans with ZERO Exchange —
    the plan gate for that shape is
    tests/test_scale_ops.py::test_bucketed_join_has_no_exchange; this
    registered query proves the co-located result matches the plain
    join the oracle runs. Projections are pruned before the write so
    the bucket files carry only the join/agg columns."""
    SC.write_bucketed(
        t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus"),
        "fdis_orders_b",
        "o_orderkey",
        n_buckets=8,
    )
    SC.write_bucketed(
        t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        "fdis_lineitem_b",
        "l_orderkey",
        n_buckets=8,
    )
    j = spark.table("fdis_lineitem_b").join(
        spark.table("fdis_orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        money_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("revenue"),
    )


_BUCKETED_SQL = f"""
SELECT o_orderstatus, count(*) AS n_lines,
       {sql_money_sum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""


def _agg_string_concat(spark, sf_dir):
    """Per-nation sorted supplier-name roster as one delimited string —
    the listagg/string_agg surface. collect_list is order-nondeterministic
    under parallelism, so the list is array_sort-ed before joining:
    deterministic output for ANY partitioning. Group size is bounded by
    |suppliers per nation|, so the per-group buffer is safe at scale
    (unbounded-group rosters would need the pack-chunks shard pattern)."""
    supp = t(spark, sf_dir, "supplier")
    return supp.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.array_join(
            F.array_sort(F.collect_list("s_name")), ","
        ).alias("roster"),
    )


_STRING_CONCAT_SQL = """
SELECT s_nationkey, count(*) AS n_supp,
       string_agg(s_name, ',' ORDER BY s_name) AS roster
FROM supplier GROUP BY s_nationkey
"""


def _agg_incremental_merge(spark, sf_dir):
    """Incremental aggregate maintenance: last run's materialized
    per-customer state (orders before 1997) merged with the new delta
    partition (1997+) via algebraic state merge (ops/incremental.py) —
    O(|state|+|delta|), never a rescan of history. The oracle
    aggregates the union directly, so the driver hash-checks
    agg(A∪B) == merge(agg(A), agg(B)) end-to-end. Derived measures
    (the 2-decimal average) re-derive from (sum, count) at read time —
    exactly why the state stores sums and counts, not averages."""
    from .ops.incremental import merge_agg_states
    from .registry_util import cents

    orders = t(spark, sf_dir, "orders")
    cut = F.lit("1997-01-01").cast("timestamp")

    def state(df):
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents(F.col("o_totalprice"))).alias("total_c"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )

    merged = merge_agg_states(
        state(orders.filter(F.col("o_orderdate") < cut)),
        state(orders.filter(F.col("o_orderdate") >= cut)),
        keys=["o_custkey"],
        measures={
            "n_orders": "count",
            "total_c": "sum",
            "first_order": "min",
            "last_order": "max",
        },
    )
    return merged.select(
        "o_custkey",
        "n_orders",
        (F.col("total_c") / 100.0).alias("total_price"),
        "first_order",
        "last_order",
        (
            F.floor(
                F.col("total_c").cast("double") / F.col("n_orders") / 100.0 * 100
                + 0.5
            )
            / 100.0
        ).alias("avg_price2"),
    )


_INCR_MERGE_SQL = """
SELECT o_custkey,
       count(*) AS n_orders,
       sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0
         AS total_price,
       min(o_orderdate) AS first_order,
       max(o_orderdate) AS last_order,
       floor(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             / count(*) / 100.0 * 100 + 0.5) / 100.0 AS avg_price2
FROM orders
GROUP BY o_custkey
"""


def _files_compaction_plan(spark, sf_dir):
    """Small-file compaction plan over a REAL partitioned sink: events
    are written Hive-partitioned by day (the reference's
    one-file-per-date convention, fitbit_utils.py:227-228 — the layout
    that breeds small files), the written files are manifest-scanned
    back (input_file_name row counts), and ``io.compaction_plan``
    greedily bins days to ~2000 rows per output file within each month
    (partition dirs never merge across months). The oracle derives the
    identical plan relationally — per-day row counts are invariant to
    the physical write — so the driver hash-checks planner math
    end-to-end. Metadata-grain: the planner windows over |files|, keyed
    by month."""
    import os as _os
    import tempfile as _tempfile

    from .io import compaction_plan, write_partitioned

    ev = t(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    # keyed by (pid, sf): lazy cross-SF runs must not clobber each
    # other's sink (same contract as sink_roundtrip); reap before the
    # first own-pid write so a pid-reuse leftover can't be served
    from .registry_util import _reap_stale_tmp

    _reap_stale_tmp()
    out_dir = _os.path.join(
        _tempfile.gettempdir(),
        f"fdis_compact_plan_{_os.getpid()}_"
        f"{_os.path.basename(_os.path.normpath(sf_dir))}",
    )
    write_partitioned(ev, out_dir, partition_by=["day"])
    # Partition-column type inference turns the Hive `day=...` dir back
    # into DATE; the oracle (and the writer) use a yyyy-MM-dd string —
    # re-cast so both engines emit the same type for the driver's
    # type-sensitive value hash.
    back = spark.read.parquet(out_dir).withColumn(
        "day", F.col("day").cast("string")
    )
    per_file = back.groupBy("day").agg(F.count(F.lit(1)).alias("n_rows"))
    manifest = per_file.withColumn("month", F.substring("day", 1, 7))
    return compaction_plan(
        manifest, group_col="month", order_col="day",
        weight_col="n_rows", target=2000,
    )


_COMPACTION_SQL = """
WITH per AS (SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_rows
             FROM events GROUP BY 1),
m AS (SELECT substr(day, 1, 7) AS month, day, n_rows FROM per)
SELECT month, day, n_rows,
       CAST(floor(CAST(sum(n_rows) OVER (PARTITION BY month ORDER BY day
                                         ROWS UNBOUNDED PRECEDING) - n_rows
                       AS DOUBLE) / 2000) AS INT) AS bin
FROM m
"""


def _zorder_locality(spark, sf_dir):
    """Z-order (Morton) clustering audit: per z-cell bounding boxes
    over (l_partkey, l_suppkey). The z-key bit-interleaves the two
    dimensions (io.zorder_key), so sorting by it gives every cell a
    compact rectangle in BOTH dimensions — the layout
    ``write_zorder_clustered`` materializes for 2-D data skipping. The
    oracle rebuilds the identical interleave with ANSI bit operators,
    hash-checking the layout math end-to-end. Pure codegen'd bit
    arithmetic; one shuffled aggregate on the cell id."""
    from .io import zorder_key

    li = t(spark, sf_dir, "lineitem")
    z = zorder_key(F.col("l_partkey"), F.col("l_suppkey"), bits=8)
    return (
        li.withColumn("zcell", F.shiftright(z, 6))
        .groupBy("zcell")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("part_lo"),
            F.max("l_partkey").alias("part_hi"),
            F.min("l_suppkey").alias("supp_lo"),
            F.max("l_suppkey").alias("supp_hi"),
        )
    )


# the oracle's interleave is generated with the same bit positions as
# io.zorder_key (bit i of x -> 2i, bit i of y -> 2i+1); disjoint bit
# targets make sum equivalent to bitwise-or
_Z_TERMS = " + ".join(
    f"(((l_partkey >> {i}) & 1) << {2 * i}) + "
    f"(((l_suppkey >> {i}) & 1) << {2 * i + 1})"
    for i in range(8)
)
_ZORDER_SQL = f"""
SELECT ({_Z_TERMS}) >> 6 AS zcell,
       count(*) AS n_rows,
       min(l_partkey) AS part_lo, max(l_partkey) AS part_hi,
       min(l_suppkey) AS supp_lo, max(l_suppkey) AS supp_hi
FROM lineitem
GROUP BY 1
"""


def _feature_quantile_bin(spark, sf_dir):
    """Equi-depth feature binning (the discretization step of a
    large-scale feature pipeline): per-group quartile thresholds from
    the scale-safe sort+rank selection (`ops/scale.exact_quantiles` —
    constant memory per task, identical values to quantile_cont), then
    the thresholds broadcast back over the fact scan and every row maps
    to its bin with a codegen'd CASE — one stats pass + one binning
    pass, no per-group buffering anywhere. Output: per-(group, bin)
    volume and exact money sum. At 100 TB the stats pass is the
    standard candidate for sampling/sketching; the binning pass shape
    is unchanged."""
    from .ops.scale import exact_quantiles
    from .registry_util import money_sum

    li = t(spark, sf_dir, "lineitem")
    qres = exact_quantiles(li, "l_returnflag", "l_extendedprice", [0.25, 0.5, 0.75])
    thr = (
        qres.groupBy("l_returnflag")
        .pivot("q", [0.25, 0.5, 0.75])
        .agg(F.first("quantile"))
        .withColumnRenamed("0.25", "t25")
        .withColumnRenamed("0.5", "t50")
        .withColumnRenamed("0.75", "t75")
    )
    x = F.col("l_extendedprice")
    binned = li.join(F.broadcast(thr), "l_returnflag").withColumn(
        "bin",
        F.when(x <= F.col("t25"), 0)
        .when(x <= F.col("t50"), 1)
        .when(x <= F.col("t75"), 2)
        .otherwise(3),
    )
    return binned.groupBy("l_returnflag", "bin").agg(
        F.count(F.lit(1)).alias("n_rows"),
        money_sum(F.col("l_extendedprice")).alias("sum_price"),
    )


_QUANTILE_BIN_SQL = """
WITH thr AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.25) AS t25,
         quantile_cont(l_extendedprice, 0.5)  AS t50,
         quantile_cont(l_extendedprice, 0.75) AS t75
  FROM lineitem GROUP BY 1)
SELECT li.l_returnflag,
       CASE WHEN l_extendedprice <= t25 THEN 0
            WHEN l_extendedprice <= t50 THEN 1
            WHEN l_extendedprice <= t75 THEN 2
            ELSE 3 END AS bin,
       count(*) AS n_rows,
       sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0
         AS sum_price
FROM lineitem li JOIN thr ON li.l_returnflag = thr.l_returnflag
GROUP BY 1, 2
"""


def _events_key_skew(spark, sf_dir):
    """Join-key skew profile (the diagnostic that decides between a
    plain shuffle join, AQE skew split, and `ops/scale.salted_join`):
    per event_type — row volume, distinct keys, the hottest key's row
    count and share, and the mean rows/key. One shuffled aggregate at
    (type, key) grain, then a keyed argmax rollup (max_by struct, no
    window) — the profile is computable at any scale because nothing
    ever buffers a key group."""
    ev = t(spark, sf_dir, "events")
    per_key = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    return per_key.groupBy("event_type").agg(
        F.sum("n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("hot_rows"),
        F.max_by("user_id", F.struct(F.col("n"), (-F.col("user_id")).alias("u"))).alias(
            "hot_key"
        ),
        (
            F.floor(
                F.max("n").cast("double") / F.sum("n") * 1000000 + 0.5
            )
            / 1000000.0
        ).alias("hot_share6"),
        (
            F.floor(F.sum("n").cast("double") / F.count(F.lit(1)) * 100 + 0.5)
            / 100.0
        ).alias("mean_rows_per_key2"),
    )


_KEY_SKEW_SQL = """
WITH per AS (SELECT event_type, user_id, count(*) AS n
             FROM events GROUP BY 1, 2),
agg AS (SELECT event_type,
               CAST(sum(n) AS BIGINT) AS n_rows,
               count(*) AS n_keys,
               max(n) AS hot_rows,
               floor(CAST(max(n) AS DOUBLE) / sum(n) * 1000000 + 0.5)
                 / 1000000.0 AS hot_share6,
               floor(CAST(sum(n) AS DOUBLE) / count(*) * 100 + 0.5) / 100.0
                 AS mean_rows_per_key2
        FROM per GROUP BY event_type),
hot AS (SELECT event_type, user_id AS hot_key
        FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                           ORDER BY n DESC, user_id) AS rn
              FROM per)
        WHERE rn = 1)
SELECT agg.event_type, n_rows, n_keys, hot_rows, hot_key, hot_share6,
       mean_rows_per_key2
FROM agg JOIN hot ON agg.event_type = hot.event_type
"""


def _dq_audit_lineitem(spark, sf_dir):
    """Single-pass data-quality audit (Deequ-style constraint report)
    over the fact table: null counts on join/measure columns, domain
    violations (negative quantity, discount outside [0,1], shipdate
    outside the corpus era), plus referential orphans against orders —
    all constraint counters ride ONE scan as conditional sums, and the
    FK check is a broadcast-eligible left-anti pattern expressed as a
    null-probe left join so it shares the same pass shape. The audit a
    100 TB pipeline runs as a pre-publish gate: cost is one fact scan
    + one key join, independent of how many constraints are stacked."""
    li = t(spark, sf_dir, "lineitem")
    ok = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("fk_ok")
    ).distinct()
    probed = li.join(
        F.broadcast(ok), li.l_orderkey == F.col("fk_ok"), "left"
    )
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return probed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        flag(F.col("l_orderkey").isNull()).alias("null_orderkey"),
        flag(F.col("l_quantity").isNull()).alias("null_quantity"),
        flag(F.col("l_quantity") <= 0).alias("nonpositive_quantity"),
        flag(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
        ).alias("discount_out_of_range"),
        flag(
            (F.col("l_shipdate") < F.lit("1992-01-01").cast("timestamp"))
            | (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
        ).alias("shipdate_out_of_era"),
        flag(F.col("fk_ok").isNull()).alias("orphan_orderkeys"),
    )


_DQ_AUDIT_SQL = """
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_orderkey,
       CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_quantity,
       CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS nonpositive_quantity,
       CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1
                     THEN 1 ELSE 0 END) AS BIGINT)
         AS discount_out_of_range,
       CAST(sum(CASE WHEN l_shipdate < TIMESTAMP '1992-01-01'
                       OR l_shipdate >= TIMESTAMP '1999-01-01'
                     THEN 1 ELSE 0 END) AS BIGINT) AS shipdate_out_of_era,
       CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS orphan_orderkeys
FROM lineitem li
LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
  ON li.l_orderkey = o.o_orderkey
"""


def _agg_dispersion(spark, sf_dir):
    """Per-group dispersion profile (n, mean, sample variance, stddev,
    coefficient of variation) from EXACT decimal(38,0) integer moments
    — the built-in var_samp/stddev_samp float-accumulate in partition
    order and drift in the last ulp between runs/engines. Moments are
    map-side combinable (one shuffle of three numbers per group); the
    combination (n·Σy² − (Σy)²) stays exact and casts to double at
    single mirrored points, so Spark and the DuckDB int128 oracle run
    identical IEEE arithmetic."""
    li = t(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    y = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long").cast(d38)
    agg = (
        li.select(F.col("l_returnflag"), y.alias("y"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast(d38).alias("n"),
            F.sum("y").alias("sy"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    nd = F.col("n").cast("double")
    var_c2 = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    ) / (nd * (nd - 1))
    mean_d = F.col("sy").cast("double") / nd / 100.0
    var_d = var_c2 / 10000.0
    std_d = F.sqrt(var_c2) / 100.0
    return agg.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        (F.floor(mean_d * 100 + 0.5) / 100.0).alias("mean2"),
        (F.floor(var_d * 100 + 0.5) / 100.0).alias("var2"),
        (F.floor(std_d * 10000 + 0.5) / 10000.0).alias("std4"),
        (F.floor(std_d / mean_d * 1000000 + 0.5) / 1000000.0).alias("cv6"),
    )


_DISPERSION_SQL = """
WITH m AS (SELECT l_returnflag,
                  CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                       AS HUGEINT) AS y
           FROM lineitem),
a AS (SELECT l_returnflag, CAST(count(*) AS HUGEINT) AS n,
             sum(y) AS sy, sum(y * y) AS syy
      FROM m GROUP BY 1)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       floor((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 100.0) * 100 + 0.5)
         / 100.0 AS mean2,
       floor((CAST(n * syy - sy * sy AS DOUBLE)
              / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) / 10000.0) * 100
             + 0.5) / 100.0 AS var2,
       floor((sqrt(CAST(n * syy - sy * sy AS DOUBLE)
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) / 100.0)
             * 10000 + 0.5) / 10000.0 AS std4,
       floor(((sqrt(CAST(n * syy - sy * sy AS DOUBLE)
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) / 100.0)
              / (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 100.0)) * 1000000
             + 0.5) / 1000000.0 AS cv6
FROM a
"""


def _events_gap_stats(spark, sf_dir):
    """Inter-arrival gap profile per user (the session-gap calibration
    pass: what gap threshold splits sessions?): per-user event count,
    mean/max gap seconds, and share of gaps above the 30-min session
    cutoff. One keyed window (lag over user partition, total order via
    event_id tiebreak) + one aggregate — gaps are integral seconds so
    every stat is exact until the final mirrored rounding."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer microseconds: unix_timestamp() truncates to seconds
    # while DuckDB's epoch-cast rounds — µs on both sides is drift-free
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts", 1).over(w))
    gapped = ev.select("user_id", gap.alias("gap_us"))
    return gapped.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("gap_us").alias("n_gaps"),
        F.max("gap_us").alias("max_gap_us"),
        (
            F.floor(
                F.sum("gap_us").cast("double") / F.count("gap_us") / 1e6 * 100
                + 0.5
            )
            / 100.0
        ).alias("mean_gap_s2"),
        F.sum(
            F.when(F.col("gap_us") > 1800 * 1000000, 1).otherwise(0)
        ).alias("n_session_breaks"),
    )


_GAP_STATS_SQL = """
WITH g AS (SELECT user_id,
                  epoch_us(ts)
                  - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id)) AS gap_us
           FROM events)
SELECT user_id,
       count(*) AS n_events,
       count(gap_us) AS n_gaps,
       max(gap_us) AS max_gap_us,
       floor(CAST(sum(gap_us) AS DOUBLE) / count(gap_us) / 1e6 * 100 + 0.5)
         / 100.0 AS mean_gap_s2,
       CAST(sum(CASE WHEN gap_us > 1800 * 1000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_session_breaks
FROM g
GROUP BY user_id
"""


def _events_transition_matrix(spark, sf_dir):
    """Event-type transition matrix (the Markov-chain view of user
    behavior): count consecutive (prev_type -> type) pairs per user
    stream, plus each transition's share of its source row. One keyed
    lag window (total order via event_id tiebreak), one aggregate at
    (from, to) grain, then the row totals come from a keyed window SUM
    over the |types|²-row counts table — a join-back would rescan the
    fact (Spark reuses no subplan without an exchange), so the window
    keeps the whole operator at ONE events scan; its partitions hold at
    most |types| rows at any event volume."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type", 1).over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    row_n = F.sum("n").over(Window.partitionBy("from_type"))
    return counts.select(
        "from_type",
        "to_type",
        "n",
        (
            F.floor(F.col("n").cast("double") / row_n * 1000000 + 0.5)
            / 1000000.0
        ).alias("share6"),
    )


_TRANSITION_SQL = """
WITH p AS (SELECT lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS from_type,
                  event_type AS to_type
           FROM events),
c AS (SELECT from_type, to_type, count(*) AS n
      FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2),
r AS (SELECT from_type, sum(n) AS row_n FROM c GROUP BY 1)
SELECT c.from_type, to_type, n,
       floor(CAST(n AS DOUBLE) / row_n * 1000000 + 0.5) / 1000000.0 AS share6
FROM c JOIN r ON c.from_type = r.from_type
"""


def _text_keywords_topk(spark, sf_dir):
    """Per-document keyword extraction: top-3 terms by TF-IDF — the
    document-tagging pass of a corpus pipeline. Reuses the tfidf
    operator (broadcast 1-row corpus count, |vocab|-sized DF table) and
    ranks within each document (keyed window, bounded by per-doc
    vocabulary). Ranking on the ROUNDED tfidf8 keeps the tie-break
    engine-identical; ties resolve by term asc."""
    from pyspark.sql import Window

    scored = TX.tfidf(t(spark, sf_dir, "documents"), "doc_id", "text")
    w = Window.partitionBy("doc").orderBy(
        F.col("tfidf8").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc", "term", "tfidf8", "rnk")
    )


_KEYWORDS_SQL = f"""
WITH tok AS (SELECT doc_id AS doc, unnest({_TOKS}) AS term FROM documents),
tf AS (SELECT doc, term, count(*) AS tf_raw FROM tok GROUP BY doc, term),
dl AS (SELECT doc, sum(tf_raw) AS len FROM tf GROUP BY doc),
dfreq AS (SELECT term, count(DISTINCT doc) AS df FROM tf GROUP BY term
          HAVING count(DISTINCT doc) >= 2),
nd AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.doc, tf.term,
         floor((tf.tf_raw::DOUBLE / dl.len)
               * ln((nd.n::DOUBLE + 1.0) / (dfreq.df::DOUBLE + 1.0)) * 1e8
               + 0.5) / 1e8 AS tfidf8
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc) CROSS JOIN nd),
r AS (SELECT *, row_number() OVER (PARTITION BY doc
                                   ORDER BY tfidf8 DESC, term) AS rnk
      FROM scored)
SELECT doc, term, tfidf8, rnk FROM r WHERE rnk <= 3
"""


def _corpus_split_assign(spark, sf_dir):
    """Deterministic train/val/test split (90/5/5 by md5 of doc_id —
    reproducible across reruns, engines, and cluster sizes; no RNG)
    with the per-(split, source) composition report a dataset card
    needs. The hash bucket in [0, 65536) maps <58982 -> train,
    <62259 -> val, rest -> test; one scan, one aggregate."""
    docs = t(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "long"
    )
    split = (
        F.when(h < F.lit(58982), "train")
        .when(h < F.lit(62259), "val")
        .otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "source", "n_chars")
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


_SPLIT_SQL = """
WITH h AS (SELECT source, n_chars,
                  ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT AS hv
           FROM documents),
s AS (SELECT CASE WHEN hv < 58982 THEN 'train'
                  WHEN hv < 62259 THEN 'val'
                  ELSE 'test' END AS split,
             source, n_chars
      FROM h)
SELECT split, source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM s GROUP BY 1, 2
"""


def _orders_seasonality(spark, sf_dir):
    """Month-grain seasonality with month-over-month delta: exact-cents
    monthly revenue, order counts, and the MoM change — one shuffled
    aggregate at month grain plus a single-column lag over the (tiny,
    |months|-row) aggregate; the lag window partitions by year so no
    partition ever exceeds 12 rows."""
    from pyspark.sql import Window

    orders = t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("rev_c"),
    )
    w = Window.partitionBy("yr").orderBy("mo")
    prev = F.lag("rev_c", 1).over(w)
    return monthly.select(
        "yr",
        "mo",
        "n_orders",
        (F.col("rev_c") / 100.0).alias("revenue"),
        ((F.col("rev_c") - prev) / 100.0).alias("mom_delta"),
    )


_SEASONALITY_SQL = """
WITH m AS (SELECT CAST(year(o_orderdate) AS INT) AS yr,
                  CAST(month(o_orderdate) AS INT) AS mo,
                  count(*) AS n_orders,
                  sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
           FROM orders GROUP BY 1, 2)
SELECT yr, mo, n_orders, rev_c / 100.0 AS revenue,
       (rev_c - lag(rev_c) OVER (PARTITION BY yr ORDER BY mo)) / 100.0
         AS mom_delta
FROM m
"""


def _agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (the general form of ROLLUP/CUBE, both
    already registered): exactly the (status), (priority), and
    grand-total groupings — no lattice blowup, each requested set
    expanded map-side in the same single-shuffle Expand as rollup.
    Null-marker columns disambiguate real NULL keys from subtotal
    rows, mirrored via GROUPING() in the oracle."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping("o_orderstatus").alias("g_status"),
            F.grouping("o_orderpriority").alias("g_priority"),
            money_sum(F.col("o_totalprice")).alias("sum_total"),
        )
    )


_GROUPING_SETS_SQL = f"""
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       {sql_money_sum('o_totalprice')} AS sum_total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def _events_hour_heatmap(spark, sf_dir):
    """Activity heatmap at (day-of-week x hour-of-day) grain — the
    seasonality fingerprint ops dashboards draw. ISO day numbering on
    both engines; one shuffled aggregate over a 7x24-bounded key
    domain (map-side partials collapse almost everything)."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy(
        F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hod")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )


_HOUR_HEATMAP_SQL = """
SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow, CAST(hour(ts) AS INT) AS hod,
       count(*) AS n, count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


def _set_ops_all(spark, sf_dir):
    """Bag-semantics set operators (INTERSECT ALL / EXCEPT ALL over
    per-customer order events in 1995 vs 1996): multiplicity is the
    min / truncated difference of per-side counts, which Spark's
    intersectAll/exceptAll compute with one count-aggregate per side —
    no row-level matching shuffle. The tag column folds both results
    into one hashable output (the distinct-semantics sibling is
    ``set_ops``)."""
    orders = t(spark, sf_dir, "orders")

    def keys(year):
        return orders.filter(F.year("o_orderdate") == year).select(
            "o_custkey", "o_orderpriority"
        )

    both = (
        keys(1995).intersectAll(keys(1996)).withColumn("tag", F.lit("both"))
    )
    only95 = (
        keys(1995).exceptAll(keys(1996)).withColumn("tag", F.lit("only_1995"))
    )
    return both.unionByName(only95)


_SET_OPS_ALL_SQL = """
WITH a AS (SELECT o_custkey, o_orderpriority FROM orders
           WHERE year(o_orderdate) = 1995),
b AS (SELECT o_custkey, o_orderpriority FROM orders
      WHERE year(o_orderdate) = 1996)
SELECT o_custkey, o_orderpriority, 'both' AS tag
FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
UNION ALL
SELECT o_custkey, o_orderpriority, 'only_1995' AS tag
FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
"""


def _window_value_functions(spark, sf_dir):
    """Value-window family over one keyed window: first/last/nth value
    with an EXPLICIT whole-partition frame (the default frame stops at
    CURRENT ROW, which silently changes last_value), plus lead/lag.
    Total order via event_id tiebreak keeps every function
    engine-deterministic. Complements window_rank_functions (the
    ranking family) and window_running_sum (the frame family)."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "user_id",
        "event_id",
        F.first("event_type").over(full).alias("first_type"),
        F.last("event_type").over(full).alias("last_type"),
        F.nth_value("event_type", 2).over(full).alias("second_type"),
        F.lead("event_type", 1).over(w).alias("next_type"),
        F.lag("event_type", 1).over(w).alias("prev_type"),
    )


_WINDOW_VALUE_SQL = """
SELECT user_id, event_id,
       first_value(event_type) OVER wf AS first_type,
       last_value(event_type) OVER wf AS last_type,
       nth_value(event_type, 2) OVER wf AS second_type,
       lead(event_type) OVER w AS next_type,
       lag(event_type) OVER w AS prev_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
       wf AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


PIPELINE_QUERIES: dict[str, QueryDef] = {
    q.name: q
    for q in [
        QueryDef("corpus_pack_chunks", _corpus_pack_chunks, _PACK_SQL),
        QueryDef("corpus_vocab_topk", _corpus_vocab_topk, _VOCAB_SQL),
        QueryDef("corpus_mixture_sample", _corpus_mixture_sample, _MIXTURE_SQL),
        QueryDef("text_pii_redact", _text_pii_redact, _PII_SQL),
        QueryDef("embed_dim_stats", _embed_dim_stats, _DIM_STATS_SQL),
        QueryDef("events_anomaly_zscore", _events_anomaly_zscore, _ANOMALY_SQL),
        QueryDef("events_funnel", _events_funnel, _FUNNEL_SQL),
        QueryDef("stream_interval_join", _stream_interval_join, _INTERVAL_JOIN_SQL),
        QueryDef("ts_resample_ffill", _ts_resample_ffill, _RESAMPLE_SQL),
        QueryDef("ts_rolling_hour_avg", _ts_rolling_hour_avg, _ROLLING_SQL),
        QueryDef("scd2_merge", _scd2_merge, _SCD2_SQL),
        QueryDef("agg_cube", _agg_cube, _CUBE_SQL),
        QueryDef("er_fuzzy_pairs", _er_fuzzy_pairs, _ER_FUZZY_SQL),
        QueryDef(
            "corpus_source_composition",
            _corpus_source_composition,
            _SOURCE_COMP_SQL,
        ),
        QueryDef(
            "events_retention_cohort", _events_retention_cohort, _RETENTION_SQL
        ),
        QueryDef("text_bigram_topk", _text_bigram_topk, _BIGRAM_SQL),
        QueryDef("join_salted_skew", _join_salted_skew, _SALTED_SQL),
        QueryDef(
            "corpus_curation_funnel", _corpus_curation_funnel, _CURATION_SQL
        ),
        QueryDef("agg_linear_fit", _agg_linear_fit, _LINEAR_FIT_SQL),
        QueryDef("affinity_part_pairs", _affinity_part_pairs, _AFFINITY_SQL),
        QueryDef("agg_mode_argmax", _agg_mode_argmax, _MODE_SQL),
        QueryDef(
            "join_bucketed_colocated", _join_bucketed_colocated, _BUCKETED_SQL
        ),
        QueryDef("agg_string_concat", _agg_string_concat, _STRING_CONCAT_SQL),
        QueryDef(
            "agg_incremental_merge", _agg_incremental_merge, _INCR_MERGE_SQL
        ),
        QueryDef(
            "files_compaction_plan", _files_compaction_plan, _COMPACTION_SQL
        ),
        QueryDef("zorder_locality", _zorder_locality, _ZORDER_SQL),
        QueryDef(
            "feature_quantile_bin", _feature_quantile_bin, _QUANTILE_BIN_SQL
        ),
        QueryDef("events_key_skew", _events_key_skew, _KEY_SKEW_SQL),
        QueryDef("dq_audit_lineitem", _dq_audit_lineitem, _DQ_AUDIT_SQL),
        QueryDef("agg_dispersion", _agg_dispersion, _DISPERSION_SQL),
        QueryDef("events_gap_stats", _events_gap_stats, _GAP_STATS_SQL),
        QueryDef(
            "events_transition_matrix", _events_transition_matrix, _TRANSITION_SQL
        ),
        QueryDef("text_keywords_topk", _text_keywords_topk, _KEYWORDS_SQL),
        QueryDef("corpus_split_assign", _corpus_split_assign, _SPLIT_SQL),
        QueryDef("orders_seasonality", _orders_seasonality, _SEASONALITY_SQL),
        QueryDef(
            "agg_grouping_sets", _agg_grouping_sets, _GROUPING_SETS_SQL
        ),
        QueryDef("events_hour_heatmap", _events_hour_heatmap, _HOUR_HEATMAP_SQL),
        QueryDef("set_ops_all", _set_ops_all, _SET_OPS_ALL_SQL),
        QueryDef(
            "window_value_functions", _window_value_functions, _WINDOW_VALUE_SQL
        ),
    ]
}

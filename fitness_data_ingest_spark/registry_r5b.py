"""Round-5 continuation: reproducible-sampling audit, OHLC time-series
bars, a count-min-sketch heavy-hitter audit with EXACT relational
semantics, and scalable cumulative-distinct users (hierarchical prefix
sum). All engine-exact (integer cents / md5 hashing only on the value
path) with full DuckDB hash oracles.

Reference parity note: the reference repo (pandas/requests ETL,
``services/fitbit/fitbit_utils.py`` et al.) has none of these; they
extend SURVEY.md §2's LLM-pipeline / analytics axis the same way the
round-4/5 families do.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry_util import QueryDef, cents, t

# Bernoulli sampling modulus: keep-1-in-8 (12.5%) — large enough that
# every fixture source keeps rows, small enough that the realized-rate
# audit has something to measure.
SAMPLE_MOD = 8

# Count-min sketch geometry: d=4 independent hash rows x w=64 buckets.
# 256 cells total — the sketch is broadcast-trivial at ANY corpus size
# (cell count is geometry, not cardinality), which is the entire point
# of sketching at 100 TB.
CM_ROWS = 4
CM_WIDTH = 64
CM_TOPK = 20


def _h32(col):
    """Engine-portable 32-bit hash (md5 prefix as int64) — the same
    literal definition registry_r5 uses, re-declared per family file so
    each file's SQL oracles pair with the Spark expression beside them."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _tok(col):
    return F.filter(F.split(col, " "), lambda x: x != "")


# ------------------------------------------- HASH-BERNOULLI SAMPLE AUDIT


def hash_sample_audit(docs, mod: int = SAMPLE_MOD):
    """Deterministic Bernoulli sampling by content-free key hash —
    ``md5('smp:' || doc_id) % mod == 0`` — with a per-source audit of
    the realized rate and the token mass the sample carries.

    Why hash-based and not ``df.sample()``: at 100 TB a sample must be
    REPRODUCIBLE across retries, engines, and days (task retries re-roll
    an RNG sample and break exactly-once semantics downstream; a
    hash-split never moves a row between runs). This is the standard
    train/eval holdout mechanism (same family as corpus_split_assign)
    restated as a sampling-QA operator: the audit columns are what a
    pipeline dashboard alarms on when a source's realized rate drifts
    from the nominal 1/mod (it cannot here — that is the point).

    Scale shape: ONE scan; the predicate and token count are per-row
    JVM expressions; the audit is a single map-side-combinable groupBy
    on ``source`` (dozens of groups at any scale). No joins, no
    windows, no second pass."""
    sel = (
        F.pmod(_h32(F.concat(F.lit("smp:"), F.col("doc_id").cast("string"))), F.lit(mod))
        == 0
    )
    n_tok = F.size(_tok(F.col("text")))
    per = docs.select(
        "source", sel.alias("sel"), n_tok.alias("n_tok")
    ).groupBy("source")
    return (
        per.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("sel"), 1).otherwise(0)).alias("n_sampled"),
            F.sum(F.when(F.col("sel"), F.col("n_tok")).otherwise(0)).alias(
                "sampled_tokens"
            ),
        )
        .select(
            "source",
            "n_docs",
            "n_sampled",
            (
                F.floor(
                    F.col("n_sampled").cast("double")
                    / F.col("n_docs")
                    * 10000
                    + F.lit(0.5)
                )
                / 10000.0
            ).alias("rate4"),
            "sampled_tokens",
        )
        .orderBy("source")
    )


def _sample_hash_bernoulli(spark, sf_dir):
    return hash_sample_audit(t(spark, sf_dir, "documents"))


_SAMPLE_SQL = f"""
WITH d AS (
  SELECT source,
         ('0x' || substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % {SAMPLE_MOD} = 0 AS sel,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE sel) AS BIGINT) AS n_sampled,
       floor(CAST(count(*) FILTER (WHERE sel) AS DOUBLE) / count(*)
             * 10000 + 0.5) / 10000.0 AS rate4,
       CAST(COALESCE(sum(n_tok) FILTER (WHERE sel), 0) AS BIGINT)
         AS sampled_tokens
FROM d GROUP BY source ORDER BY source
"""


# ------------------------------------------------------- OHLC BARS


def ohlc_bars(events):
    """Open-high-low-close downsampling of the event value stream into
    per-(event_type, hour) bars — the classic tick→bar compression every
    metrics/market pipeline runs. Open/close are the values at the
    earliest/latest (ts, event_id) in the bar (event_id breaks ts ties
    deterministically); high/low are value extremes; values ride as
    integer cents.

    Scale shape: ONE shuffle on the (type, hour) bar key, and every
    aggregate — including open/close — is partial-aggregable:
    open/close are ``min/max(struct(ts, event_id, cents))``, the
    argmax-as-struct-extremum trick (ops/relational.topk_latest
    family), NOT a per-bar window sort. A window formulation re-sorts
    every bar's rows; the struct extremum combines map-side."""
    ev = events.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bar_hour"),
        "ts",
        "event_id",
        cents(F.col("value")).alias("c"),
    )
    g = ev.groupBy("event_type", "bar_hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.struct("ts", "event_id", "c")).alias("o"),
        F.max(F.struct("ts", "event_id", "c")).alias("z"),
        F.min("c").alias("lo"),
        F.max("c").alias("hi"),
    )
    return g.select(
        "event_type",
        "bar_hour",
        "n_events",
        (F.col("o.c") / 100.0).alias("open2"),
        (F.col("hi") / 100.0).alias("high2"),
        (F.col("lo") / 100.0).alias("low2"),
        (F.col("z.c") / 100.0).alias("close2"),
    ).orderBy("event_type", "bar_hour")


def _ts_ohlc_bars(spark, sf_dir):
    return ohlc_bars(t(spark, sf_dir, "events"))


# Oracle mirrors the semantics, not the plan: DuckDB's arg_min/arg_max
# take no composite ordering key, so open/close come from row_number
# windows (fine at oracle scale; the Spark side must NOT do this).
_OHLC_SQL = """
WITH e AS (
  SELECT event_type, date_trunc('hour', ts) AS bar_hour, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type, bar_hour
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, bar_hour
                            ORDER BY ts DESC, event_id DESC) AS rn_z
  FROM e
)
SELECT event_type, bar_hour,
       CAST(count(*) AS BIGINT) AS n_events,
       max(CASE WHEN rn_a = 1 THEN c END) / 100.0 AS open2,
       max(c) / 100.0 AS high2,
       min(c) / 100.0 AS low2,
       max(CASE WHEN rn_z = 1 THEN c END) / 100.0 AS close2
FROM r GROUP BY event_type, bar_hour
ORDER BY event_type, bar_hour
"""


# ------------------------------------------- COUNT-MIN HEAVY HITTERS


def countmin_heavy(events, topk: int = CM_TOPK):
    """Count-min-sketch heavy-hitter audit over per-user event counts:
    build the d×w sketch, estimate each user's count from it, and report
    the top-``topk`` users by EXACT count with the sketch estimate and
    its overestimate beside them — the error audit a pipeline runs
    before trusting a sketch at production scale. Deterministic md5 row
    hashes make the sketch (and therefore the estimates) engine-exact:
    unlike an approx-distinct sketch, count-min is a pure relational
    computation, so this key gets a full DuckDB hash oracle where
    ``agg_approx_sketch`` by design cannot.

    Scale shape: ONE shuffle reduces events to user grain; the sketch
    is built FROM that reduced table (4 cells per user, weight = the
    user's count) into exactly d·w = 256 cells — geometry-bounded, so
    it broadcasts at any cardinality; estimates are a broadcast
    equi-join of the 4-cell explode against the 256-cell sketch + a
    min() re-aggregate on the user key; top-k is a distributed
    TakeOrderedAndProject. CM guarantee (est >= exact) is asserted in
    the property tests."""
    per_user = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    rb = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.pmod(
                    _h32(
                        F.concat(
                            F.lit(f"cm{r}:"), F.col("user_id").cast("string")
                        )
                    ),
                    F.lit(CM_WIDTH),
                ).alias("b"),
            )
            for r in range(CM_ROWS)
        ]
    )
    cells = (
        per_user.select(F.explode(rb).alias("rb"), "exact_cnt")
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .agg(F.sum("exact_cnt").alias("cell"))
    )
    est = (
        per_user.select("user_id", "exact_cnt", F.explode(rb).alias("rb"))
        .join(F.broadcast(cells), (F.col("rb.r") == F.col("r")) & (F.col("rb.b") == F.col("b")))
        .groupBy("user_id")
        .agg(
            F.first("exact_cnt").alias("exact_cnt"),
            F.min("cell").alias("est_cnt"),
        )
    )
    return (
        est.select(
            "user_id",
            "exact_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("exact_cnt")).alias("overestimate"),
        )
        .orderBy(F.desc("exact_cnt"), F.asc("user_id"))
        .limit(topk)
    )


def _agg_countmin_heavy(spark, sf_dir):
    return countmin_heavy(t(spark, sf_dir, "events"))


_CM_HASHES = " UNION ALL ".join(
    f"SELECT {r} AS r, "
    f"('0x' || substr(md5('cm{r}:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT"
    f" % {CM_WIDTH} AS b, user_id FROM pu"
    for r in range(CM_ROWS)
)

_CM_SQL = f"""
WITH pu AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
  FROM events GROUP BY user_id
),
rb AS ({_CM_HASHES}),
cells AS (
  SELECT rb.r, rb.b, CAST(sum(pu.exact_cnt) AS BIGINT) AS cell
  FROM rb JOIN pu USING (user_id) GROUP BY rb.r, rb.b
),
est AS (
  SELECT pu.user_id, pu.exact_cnt,
         CAST(min(c.cell) AS BIGINT) AS est_cnt
  FROM pu JOIN rb USING (user_id)
  JOIN cells c ON c.r = rb.r AND c.b = rb.b
  GROUP BY pu.user_id, pu.exact_cnt
)
SELECT user_id, exact_cnt, est_cnt,
       est_cnt - exact_cnt AS overestimate
FROM est
ORDER BY exact_cnt DESC, user_id ASC
LIMIT {CM_TOPK}
"""


# ---------------------------------------- CUMULATIVE DISTINCT USERS


def cumulative_distinct_users(events):
    """Distinct users ever seen, by day — the growth-curve query every
    product dashboard runs, restated without the scale cliff. The naive
    form (``count(distinct user) over (order by day)``) re-scans the
    whole history per day through ONE reducer. The scalable identity:
    a user contributes only at their FIRST day, so cumulative distinct
    = running sum of first-seen counts — and the running sum itself is
    a HIERARCHICAL prefix sum: a month-partitioned window (parallel
    across months) plus month-level base offsets, so no partition-less
    window ever appears. The month-offset build joins the month table
    to itself (strictly-earlier months) — months are calendar-bounded
    (12/year at ANY data scale), the sanctioned bounded-build shape.

    Scale shape: one shuffle to user grain (min day per user), one
    tiny shuffle to day grain, windows only within month partitions."""
    first_seen = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("day")
    )
    daily = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    daily = daily.withColumn("month", F.date_trunc("month", F.col("day")))
    w = (
        Window.partitionBy("month")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = daily.withColumn("cum_in_month", F.sum("new_users").over(w))
    month_tot = daily.groupBy("month").agg(
        F.sum("new_users").alias("month_users")
    )
    m_a = month_tot.select(F.col("month").alias("m"))
    m_b = month_tot.select(F.col("month").alias("m2"), "month_users")
    offsets = (
        m_a.join(m_b, m_b.m2 < m_a.m)
        .groupBy("m")
        .agg(F.sum("month_users").alias("offset"))
    )
    return (
        within.join(
            F.broadcast(offsets), within.month == offsets.m, "left"
        )
        .select(
            "day",
            "new_users",
            (F.col("cum_in_month") + F.coalesce(F.col("offset"), F.lit(0))).alias(
                "cum_users"
            ),
        )
        .orderBy("day")
    )


def _events_cumulative_distinct(spark, sf_dir):
    return cumulative_distinct_users(t(spark, sf_dir, "events"))


_CUMDIST_SQL = """
WITH fs AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id
),
d AS (SELECT day, CAST(count(*) AS BIGINT) AS new_users FROM fs GROUP BY day)
SELECT day, new_users,
       CAST(sum(new_users) OVER (ORDER BY day
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
FROM d ORDER BY day
"""


R5B_QUERIES: dict[str, QueryDef] = {
    q.name: q
    for q in (
        QueryDef(
            "sample_hash_bernoulli", _sample_hash_bernoulli, _SAMPLE_SQL, ("corpus",)
        ),
        QueryDef("ts_ohlc_bars", _ts_ohlc_bars, _OHLC_SQL, ("ts",)),
        QueryDef("agg_countmin_heavy", _agg_countmin_heavy, _CM_SQL, ("agg",)),
        QueryDef(
            "events_cumulative_distinct",
            _events_cumulative_distinct,
            _CUMDIST_SQL,
            ("events",),
        ),
    )
}

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

from .ops.scale import truncate_lineage
from .registry_util import (
    QueryDef,
    cents,
    shared_cooccurrence_edges,
    shared_minhash_cand_stats,
    t,
)

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


# ------------------------------------------- ZONE-MAP LAYOUT AUDIT

# Synthetic file count for the layout simulation: enough files that the
# two layouts separate sharply, small enough that the stats table stays
# metadata-sized at fixture scale.
ZM_FILES = 16


def zonemap_overlap(lineitem, n_files: int = ZM_FILES):
    """Zone-map (file-skipping) effectiveness audit: assign every row to
    one of ``n_files`` synthetic files under TWO layouts — ``hash``
    (md5 of the order key: the layout an unsorted ingest produces) and
    ``range`` (contiguous ship-date ranges: the layout sort-on-write /
    Z-order produces) — then measure, per file, how many OTHER files'
    [min, max] ship-date ranges overlap it. Overlap depth is THE
    file-skipping metric (Snowflake's clustering_depth): a date-filtered
    scan must read every overlapping file, so hash-layout depth ≈
    n_files (zone maps useless) while range-layout depth ≈ 0 — the
    quantified argument for the zorder_locality/files_compaction_plan
    keys.

    Scale shape: ONE pass over the data builds per-(layout, file)
    min/max/count — a map-side-combinable groupBy onto 2·n_files rows.
    Everything after runs on that METADATA-sized table: the overlap
    self-join is equi on layout with range predicates over a bounded
    build (file count is a configuration constant, never data-sized).
    The date-span scalar rides in as a broadcast 1-row aggregate (the
    q14/q22 scalar-attach shape)."""
    li = lineitem.select(
        "l_orderkey", F.to_date("l_shipdate").alias("d")
    )
    bounds = li.agg(
        F.min("d").alias("dmin"),
        F.datediff(F.max("d"), F.min("d")).alias("span"),
    )
    hf = F.pmod(_h32(F.col("l_orderkey").cast("string")), F.lit(n_files))
    rf = F.floor(
        F.datediff(F.col("d"), F.col("dmin")) * n_files / (F.col("span") + 1)
    ).cast("int")
    assigned = li.join(F.broadcast(bounds)).select(
        "d",
        F.explode(
            F.array(
                F.struct(F.lit("hash").alias("layout"), hf.cast("int").alias("f")),
                F.struct(F.lit("range").alias("layout"), rf.alias("f")),
            )
        ).alias("lf"),
    )
    stats = assigned.groupBy(
        F.col("lf.layout").alias("layout"), F.col("lf.f").alias("f")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("d").alias("fmin"),
        F.max("d").alias("fmax"),
    )
    a = stats.select("layout", "f", "n_rows", "fmin", "fmax")
    b = stats.select(
        F.col("layout").alias("layout_b"),
        F.col("f").alias("f_b"),
        F.col("fmin").alias("bmin"),
        F.col("fmax").alias("bmax"),
    )
    ov = (
        a.join(
            b,
            (F.col("layout") == F.col("layout_b"))
            & (F.col("f") != F.col("f_b"))
            & (F.col("fmin") <= F.col("bmax"))
            & (F.col("bmin") <= F.col("fmax")),
            "left",
        )
        .groupBy("layout", "f")
        .agg(
            F.first("n_rows").alias("n_rows"),
            F.first("fmin").alias("min_date"),
            F.first("fmax").alias("max_date"),
            F.sum(F.when(F.col("f_b").isNotNull(), 1).otherwise(0)).alias(
                "n_overlaps"
            ),
        )
    )
    return ov.orderBy("layout", "f")


def _layout_zonemap_overlap(spark, sf_dir):
    return zonemap_overlap(t(spark, sf_dir, "lineitem"))


_ZONEMAP_SQL = f"""
WITH li AS (SELECT l_orderkey, CAST(l_shipdate AS DATE) AS d FROM lineitem),
b AS (SELECT min(d) AS dmin,
             date_diff('day', min(d), max(d)) AS span FROM li),
assigned AS (
  SELECT layout, f, d FROM (
    SELECT li.d,
           ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8))::BIGINT
             % {ZM_FILES} AS hf,
           CAST(floor(date_diff('day', b.dmin, li.d) * {ZM_FILES}
                      / (b.span + 1)) AS BIGINT) AS rf
    FROM li, b
  ) s, LATERAL (VALUES ('hash', s.hf), ('range', s.rf)) AS v(layout, f)
),
stats AS (
  SELECT layout, CAST(f AS INT) AS f, CAST(count(*) AS BIGINT) AS n_rows,
         min(d) AS fmin, max(d) AS fmax
  FROM assigned GROUP BY layout, f
)
SELECT a.layout, a.f, a.n_rows,
       a.fmin AS min_date, a.fmax AS max_date,
       CAST(count(b.f) AS BIGINT) AS n_overlaps
FROM stats a LEFT JOIN stats b
  ON a.layout = b.layout AND a.f <> b.f
 AND a.fmin <= b.fmax AND b.fmin <= a.fmax
GROUP BY a.layout, a.f, a.n_rows, a.fmin, a.fmax
ORDER BY a.layout, a.f
"""


# ------------------------------------------- QUALITY THRESHOLD SWEEP

# Quality thresholds on the quality4 x10000 integer scale.
QS_THRESHOLDS = tuple(range(2000, 8001, 1000))


def quality_sweep(docs):
    """Retention curve across quality-filter thresholds: for each
    candidate cutoff, how many documents and tokens survive — the
    what-if sweep a corpus build runs BEFORE committing to a quality
    bar (the threshold is always chosen from this curve, never a
    priori). Quality is the registered heuristic (length + stopword +
    alphabetic ratios, ``ext.text.quality_score``) quantized to the
    x10000 integer grid, so every comparison is integer-exact.

    Scale shape: the per-doc score is ONE pass of JVM expressions; the
    sweep explodes each doc into |thresholds| rows (a 7x in-place
    generate, the dedup_threshold_sweep pattern) and reduces with a
    single map-side-combinable groupBy on the threshold — never one
    job per threshold, never a re-scan of the corpus."""
    from .ext import text as TX

    toks = _tok(F.col("text"))
    q4i = F.floor(
        TX.quality_score(F.col("text"), F.col("toks")) * 10000 + F.lit(0.5)
    ).cast("long")
    per = docs.select("text", toks.alias("toks")).select(
        q4i.alias("q4i"), F.size("toks").alias("n_tok")
    )
    thr = F.explode(F.array(*[F.lit(v) for v in QS_THRESHOLDS])).alias("thr")
    return (
        per.select("q4i", "n_tok", thr)
        .groupBy("thr")
        .agg(
            F.sum(F.when(F.col("q4i") >= F.col("thr"), 1).otherwise(0)).alias(
                "n_docs"
            ),
            F.sum(
                F.when(F.col("q4i") >= F.col("thr"), F.col("n_tok")).otherwise(0)
            ).alias("n_tokens"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .select(
            "thr",
            "n_docs",
            "n_tokens",
            (
                F.floor(
                    F.col("n_docs").cast("double") / F.col("n_total") * 10000
                    + F.lit(0.5)
                )
                / 10000.0
            ).alias("pct_docs4"),
        )
        .orderBy("thr")
    )


def _corpus_quality_sweep(spark, sf_dir):
    return quality_sweep(t(spark, sf_dir, "documents"))


_QS_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"
_QS_THR_LIST = "[" + ", ".join(str(v) for v in QS_THRESHOLDS) + "]"


def _qs_en_list() -> str:
    from .ext import text as TX

    return "[" + ", ".join(f"'{w}'" for w in TX.STOPWORDS["en"]) + "]"


_QSWEEP_SQL = f"""
WITH tok AS (SELECT doc_id, text, {_QS_TOKS} AS toks FROM documents),
per AS (
  SELECT CAST(floor((least(len(toks)::DOUBLE / 100.0, 1.0) * 0.4
              + (len(list_filter(toks, x -> list_contains({_qs_en_list()}, x)))::DOUBLE
                 / len(toks)) * 0.3
              + (length(regexp_replace(text, '[^a-z]', '', 'g'))::DOUBLE
                 / length(text)) * 0.3) * 10000 + 0.5) AS BIGINT) AS q4i,
         len(toks) AS n_tok
  FROM tok
),
sw AS (SELECT per.*, unnest({_QS_THR_LIST}) AS thr FROM per)
SELECT CAST(thr AS INT) AS thr,
       CAST(count(*) FILTER (WHERE q4i >= thr) AS BIGINT) AS n_docs,
       CAST(COALESCE(sum(n_tok) FILTER (WHERE q4i >= thr), 0) AS BIGINT)
         AS n_tokens,
       floor(CAST(count(*) FILTER (WHERE q4i >= thr) AS DOUBLE) / count(*)
             * 10000 + 0.5) / 10000.0 AS pct_docs4
FROM sw GROUP BY thr ORDER BY thr
"""


# ------------------------------------------- COMMON-NEIGHBOR LINK PREDICTION

# Wedge-center degree cap: hubs contribute deg^2 candidate pairs while
# carrying near-zero link-prediction signal (every pair shares the hub)
# — the standard practice is to drop or downweight them. The cap bounds
# per-center fan-out at CAP^2 regardless of degree skew, the same
# blowup-guard discipline as dedup's DF>100 hot-shingle filter.
LP_HUB_CAP = 64
LP_TOPK = 20


def link_predict(edges, topk: int = LP_TOPK, hub_cap: int = LP_HUB_CAP):
    """Common-neighbor link prediction over a symmetric edge list: for
    every NON-adjacent node pair, count shared neighbors and return the
    top-``topk`` strongest candidates — the classic graph-completion /
    recommendation primitive (Liben-Nowell & Kleinberg 2003).

    Scale shape: candidates come from a wedge equi-join through the
    shared neighbor (mid) — never an all-pairs scan; wedge centers with
    degree > ``hub_cap`` are excluded (documented above), so per-center
    fan-out is bounded under power-law skew; existing edges drop via a
    fingerprint-grain anti-join; top-k is a distributed
    TakeOrderedAndProject. Degrees ride back on two broadcast joins of
    the node-grain degree table."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    centers = deg.filter(F.col("deg") <= hub_cap).select("src")
    ce = edges.join(centers, "src")
    e1 = ce.select(F.col("src").alias("mid"), F.col("dst").alias("a"))
    e2 = ce.select(F.col("src").alias("mid"), F.col("dst").alias("b"))
    wedges = (
        e1.join(e2, "mid")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common_neighbors"))
    )
    existing = edges.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    cand = wedges.join(existing, ["a", "b"], "left_anti")
    da = deg.select(F.col("src").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("src").alias("b"), F.col("deg").alias("deg_b"))
    return (
        cand.join(da, "a")
        .join(db, "b")
        .select("a", "b", "common_neighbors", "deg_a", "deg_b")
        .orderBy(F.desc("common_neighbors"), F.asc("a"), F.asc("b"))
        .limit(topk)
    )


def _graph_link_predict(spark, sf_dir):
    from .ops import graph as G

    # materialized shared edge stage (one build per process for the
    # whole graph family). Historical note: with the edges recomputed
    # inline, an explicit cache measured SLOWER here (4.1 s vs 3.1 s —
    # all four consumers sit in one job, so ReusedExchange already
    # shared the build's shuffle); the shared parquet stage beats both
    # by paying the build once per PROCESS, not per key.
    edges = shared_cooccurrence_edges(spark, sf_dir)
    return link_predict(edges)


_LP_EDGES_CTE = """
SELECT a.i AS src, b.i AS dst
FROM (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem) a
JOIN (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem) b
  ON a.g = b.g AND a.i <> b.i
GROUP BY 1, 2 HAVING count(*) >= 2
"""

_LP_SQL = f"""
WITH edges AS ({_LP_EDGES_CTE}),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
ce AS (SELECT e.src, e.dst FROM edges e
       JOIN deg ON deg.src = e.src AND deg.deg <= {LP_HUB_CAP}),
wedges AS (
  SELECT e1.dst AS a, e2.dst AS b, CAST(count(*) AS BIGINT) AS common_neighbors
  FROM ce e1 JOIN ce e2 ON e1.src = e2.src AND e1.dst < e2.dst
  GROUP BY 1, 2
),
cand AS (
  SELECT w.* FROM wedges w
  WHERE NOT EXISTS (SELECT 1 FROM edges x
                    WHERE x.src = w.a AND x.dst = w.b)
)
SELECT c.a, c.b, c.common_neighbors, da.deg AS deg_a, db.deg AS deg_b
FROM cand c JOIN deg da ON da.src = c.a JOIN deg db ON db.src = c.b
ORDER BY c.common_neighbors DESC, c.a ASC, c.b ASC
LIMIT {LP_TOPK}
"""


# ------------------------------------------- PERCEPTUAL IMAGE DEDUP

# Hamming radius for the duplicate verdict (of 64 aHash bits). Random
# images sit near 32; real near-dups and degenerate (low-information)
# images sit near 0 — 12 is the conventional aHash near-dup bar.
AH_HAM_T = 12


def image_dedup(bands):
    """Banded perceptual-hash image dedup over (media_id, b0..b3) aHash
    band rows: candidates are pairs agreeing on ANY 16-bit band (the
    pigeonhole blocking dedup_simhash uses — Hamming <= 3 is guaranteed
    caught, wider radii probabilistically), verified by exact 64-bit
    Hamming distance <= ``AH_HAM_T``. Returns every image's bands plus
    its near-duplicate count — on this corpus the duplicate classes are
    the degenerate tiny images (1x1 collapses all 64 cells to one
    pixel, so every 1x1 image hashes to all-zero bands), which is
    precisely what aHash flags in production: low-information images.

    Scale shape: the band explode is in-place (4 rows per image);
    candidates come from ONE self-equi-join on (band_idx, value) —
    never all-pairs; the Hamming verify joins the bounded candidate
    set back to the band table twice; the per-image count is an
    aggregate. The band table is persisted: it is the output AND feeds
    three joins, and each re-derivation would re-run the Python decode
    over every payload (the minhash-signature persist discipline;
    callers/bench clearCache between queries)."""
    bands = bands.persist()
    ex = bands.select(
        "media_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("i"), F.col(f"b{i}").alias("v"))
                    for i in range(4)
                ]
            )
        ).alias("bv"),
    ).select("media_id", F.col("bv.i").alias("i"), F.col("bv.v").alias("v"))
    a = ex.select(F.col("media_id").alias("ma"), "i", "v")
    b = ex.select(F.col("media_id").alias("mb"), "i", "v")
    cand = (
        a.join(b, ["i", "v"])
        .filter(F.col("ma") < F.col("mb"))
        .select("ma", "mb")
        .distinct()
    )
    ba = bands.select(
        F.col("media_id").alias("ma"),
        *[F.col(f"b{i}").alias(f"a{i}") for i in range(4)],
    )
    bb = bands.select(
        F.col("media_id").alias("mb"),
        *[F.col(f"b{i}").alias(f"c{i}") for i in range(4)],
    )
    ham = sum(
        F.bit_count(F.col(f"a{i}").bitwiseXOR(F.col(f"c{i}"))) for i in range(4)
    )
    dups = (
        cand.join(ba, "ma")
        .join(bb, "mb")
        .filter(ham <= AH_HAM_T)
        .select("ma", "mb")
    )
    touched = dups.select(F.col("ma").alias("media_id")).unionByName(
        dups.select(F.col("mb").alias("media_id"))
    )
    cnt = touched.groupBy("media_id").agg(F.count(F.lit(1)).alias("n_dups"))
    return (
        bands.join(cnt, "media_id", "left")
        .select(
            "media_id",
            "b0",
            "b1",
            "b2",
            "b3",
            F.coalesce(F.col("n_dups"), F.lit(0)).alias("n_dups"),
        )
        .orderBy("media_id")
    )


def _multimodal_image_dedup(spark, sf_dir):
    from .ext import multimodal as MM

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n_chars")
    )
    media = MM.synthesize_media(docs, png_mod4=True)
    bands = MM.image_ahash_bands(media).filter(F.col("b0").isNotNull())
    return image_dedup(bands)


# Relational replay of the synthesize_media pixel LCG (the
# multimodal_pixel_stats oracle pattern): pw(k) carries the
# id-independent (A^k mod 2^63, sum_{j<k} A^j mod 2^63) pair; per image
# seed_k = A^k*s0 + S_k and byte_k = (seed_k >> 33) % 256 (1-based k).
# The 8x8 downsample cell (cy, cx) reads source pixel
# p = (cy*h // 8)*w + (cx*w // 8) (0-based), i.e. bytes 3p+1..3p+3;
# gray = floor(sum/3), mean = floor(sum(gray)/64), bit ck set iff
# gray > mean, band i = bits [16i, 16i+16). PNG rows (id % 4 == 3)
# carry the SAME LCG pixels — the encode/decode loop is pixel-exact —
# so the oracle needs no per-format branch.
_AHASH_SQL = f"""
WITH RECURSIVE pw(k, ak, sk) AS (
  SELECT 1, CAST(6364136223846793005 AS BIGINT), CAST(1 AS BIGINT)
  UNION ALL
  SELECT k + 1,
         CAST((CAST(6364136223846793005 AS HUGEINT) * ak)
              % 9223372036854775808 AS BIGINT),
         CAST((CAST(6364136223846793005 AS HUGEINT) * sk + 1)
              % 9223372036854775808 AS BIGINT)
  FROM pw WHERE k < 1536
),
imgs AS (
  SELECT doc_id AS media_id,
         CAST(length(text) % 32 + 1 AS BIGINT) AS w,
         CAST((doc_id // 2) % 16 + 1 AS BIGINT) AS h,
         CAST((CAST(doc_id AS HUGEINT) * 6364136223846793005
               + 1442695040888963407) % 9223372036854775808 AS BIGINT) AS s0
  FROM documents WHERE doc_id % 2 = 1
),
cells AS (
  SELECT i.media_id, c.ck,
         ((c.ck // 8) * i.h // 8) * i.w + ((c.ck % 8) * i.w // 8) AS p
  FROM imgs i, (SELECT unnest(range(0, 64)) AS ck) c
),
gray AS (
  SELECT cl.media_id, cl.ck,
         CAST(sum((CAST((CAST(p.ak AS HUGEINT) * i.s0 + p.sk)
                   % 9223372036854775808 AS BIGINT) // 8589934592) % 256)
              // 3 AS BIGINT) AS g
  FROM cells cl
  JOIN imgs i ON i.media_id = cl.media_id
  JOIN pw p ON p.k BETWEEN 3 * cl.p + 1 AND 3 * cl.p + 3
  GROUP BY cl.media_id, cl.ck
),
m AS (SELECT media_id, CAST(sum(g) // 64 AS BIGINT) AS mean
      FROM gray GROUP BY media_id),
bits AS (
  SELECT gray.media_id, ck,
         CASE WHEN g > m.mean THEN CAST(1 AS BIGINT) ELSE 0 END AS bit
  FROM gray JOIN m USING (media_id)
),
bands AS (
  SELECT media_id,
         CAST(sum(CASE WHEN ck // 16 = 0 THEN bit << (ck % 16) ELSE 0 END)
              AS BIGINT) AS b0,
         CAST(sum(CASE WHEN ck // 16 = 1 THEN bit << (ck % 16) ELSE 0 END)
              AS BIGINT) AS b1,
         CAST(sum(CASE WHEN ck // 16 = 2 THEN bit << (ck % 16) ELSE 0 END)
              AS BIGINT) AS b2,
         CAST(sum(CASE WHEN ck // 16 = 3 THEN bit << (ck % 16) ELSE 0 END)
              AS BIGINT) AS b3
  FROM bits GROUP BY media_id
),
cand AS (
  SELECT a.media_id AS ma, b.media_id AS mb
  FROM bands a JOIN bands b
    ON a.media_id < b.media_id
   AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
),
dups AS (
  SELECT ma, mb FROM cand
  JOIN bands x ON x.media_id = cand.ma
  JOIN bands y ON y.media_id = cand.mb
  WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
      + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
      <= {AH_HAM_T}
),
cnt AS (
  SELECT media_id, CAST(count(*) AS BIGINT) AS n_dups
  FROM (SELECT ma AS media_id FROM dups
        UNION ALL SELECT mb FROM dups)
  GROUP BY media_id
)
SELECT b.media_id, b.b0, b.b1, b.b2, b.b3,
       CAST(COALESCE(c.n_dups, 0) AS BIGINT) AS n_dups
FROM bands b LEFT JOIN cnt c USING (media_id)
ORDER BY b.media_id
"""


# ------------------------------------------- EMBEDDING DECONTAMINATION

# Cosine bar for the contamination verdict — the SemDeDup tau (the two
# operators answer the same "is this semantically the same item"
# question, one within-corpus, one across the train/eval boundary).
DECON_TAU = 0.55


def cross_split_decontaminate(embeddings, tau: float = DECON_TAU):
    """Train/eval decontamination scan in embedding space: the eval
    split (``vec_id % 10 == 0`` — the corpus_split_assign convention)
    must not appear, up to near-duplication, in the train split. For
    every label: train size, bucketed candidate-pair count, the MAXIMUM
    train-eval cosine found, and how many train vectors breach ``tau``.
    A clean corpus reports zero breaches WITH the observed margin — the
    report a training run archives as evidence eval was not leaked
    (planted-duplicate detection is property-tested).

    Scale shape: candidates are hyperplane-LSH bucket collisions (ONE
    equi-join on the bucket id — never train x eval), the same
    blocking as every registered ANN key; per-label reduction is an
    aggregate; the label-grain report rides on one left join."""
    from .ext import similarity as S

    e = S.with_norm(embeddings)
    n = e.select(
        "vec_id", "label", "vec", "nrm", S.lsh_bucket(F.col("vec")).alias("bucket")
    )
    tr = n.filter(F.pmod(F.col("vec_id"), F.lit(10)) != 0)
    te = n.filter(F.pmod(F.col("vec_id"), F.lit(10)) == 0).select(
        F.col("vec").alias("t_vec"), F.col("nrm").alias("t_nrm"), "bucket"
    )
    pairs = tr.join(te, "bucket").select(
        "vec_id",
        "label",
        S.cosine(
            F.col("vec"), F.col("t_vec"), F.col("nrm"), F.col("t_nrm")
        ).alias("cos"),
    )
    per_label = pairs.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_cand_pairs"),
        (F.floor(F.max("cos") * 10000 + F.lit(0.5)) / 10000.0).alias("max_cos4"),
        F.count_distinct(
            F.when(F.col("cos") >= tau, F.col("vec_id"))
        ).alias("n_contaminated"),
    )
    base = tr.groupBy("label").agg(F.count(F.lit(1)).alias("n_train"))
    return (
        base.join(per_label, "label", "left")
        .select(
            "label",
            "n_train",
            F.coalesce(F.col("n_cand_pairs"), F.lit(0)).alias("n_cand_pairs"),
            F.coalesce(F.col("max_cos4"), F.lit(-1.0)).alias("max_cos4"),
            F.coalesce(F.col("n_contaminated"), F.lit(0)).alias("n_contaminated"),
        )
        .orderBy("label")
    )


def _embed_decontaminate(spark, sf_dir):
    return cross_split_decontaminate(t(spark, sf_dir, "embeddings"))


def _decon_sql() -> str:
    from .registry_ext import _sql_lsh_bucket

    return f"""
WITH e AS (SELECT vec_id, label,
                  list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings),
n AS (SELECT * FROM (
        SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm,
               CAST({_sql_lsh_bucket()} AS BIGINT) AS bucket
        FROM e) WHERE nrm > 0),
tr AS (SELECT * FROM n WHERE vec_id % 10 <> 0),
te AS (SELECT v AS t_vec, nrm AS t_nrm, bucket FROM n WHERE vec_id % 10 = 0),
pairs AS (
  SELECT tr.vec_id, tr.label,
         list_dot_product(tr.v, te.t_vec) / (tr.nrm * te.t_nrm) AS cos
  FROM tr JOIN te USING (bucket)
),
pl AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n_cand_pairs,
         floor(max(cos) * 10000 + 0.5) / 10000.0 AS max_cos4,
         CAST(count(DISTINCT CASE WHEN cos >= {DECON_TAU} THEN vec_id END)
              AS BIGINT) AS n_contaminated
  FROM pairs GROUP BY label
),
base AS (SELECT label, CAST(count(*) AS BIGINT) AS n_train
         FROM tr GROUP BY label)
SELECT base.label, base.n_train,
       CAST(COALESCE(pl.n_cand_pairs, 0) AS BIGINT) AS n_cand_pairs,
       COALESCE(pl.max_cos4, -1.0) AS max_cos4,
       CAST(COALESCE(pl.n_contaminated, 0) AS BIGINT) AS n_contaminated
FROM base LEFT JOIN pl USING (label)
ORDER BY base.label
"""


# ------------------------------------------- BLOOM-FILTER PRUNE AUDIT

# Bloom geometry: 16 synthetic files, m=256 bits per file packed as
# 8 words x 32 bits (shifts stay < 32, so every mask is a positive
# int64 in both engines), k=3 hash functions, 500 synthetic probe keys.
BF_FILES = 16
BF_WORDS = 8
BF_BITS = 256
BF_K = 3
BF_PROBES = 500


def bloom_prune_audit(orders):
    """Bloom-filter data-skipping audit — the third leg of the skipping
    triad (min/max zone maps: layout_zonemap_overlap; clustering:
    zorder_locality; membership: this). Each synthetic file gets an
    m-bit bloom over its order keys (k deterministic md5 hash bits);
    the audit probes ``BF_PROBES`` keys GUARANTEED absent (beyond the
    corpus max) against every file and reports the realized
    false-positive rate per file — the number that decides whether
    shipping blooms into the manifest is worth it for point-lookup
    pruning.

    Scale shape: the bloom build is ONE map-side-combinable ``bit_or``
    shuffle onto (file, word) grain — 128 cells total, geometry-bounded
    like the count-min sketch; the probe set derives from a 1-row max
    aggregate (broadcast scalar attach) and expands in place to
    probes x files x k rows, which then equi-join the 128-cell bloom
    table broadcast. Nothing downstream of the build touches data
    grain."""
    keys = orders.select("o_orderkey").distinct()
    fid = F.pmod(_h32(F.concat(F.lit("bf_file:"), F.col("o_orderkey").cast("string"))), F.lit(BF_FILES))
    bit_j = lambda j, col: F.pmod(
        _h32(F.concat(F.lit(f"bf{j}:"), col.cast("string"))), F.lit(BF_BITS)
    )
    kb = keys.select(
        fid.alias("f"),
        F.explode(
            F.array(*[bit_j(j, F.col("o_orderkey")) for j in range(BF_K)])
        ).alias("bit"),
    )
    blooms = (
        kb.select(
            "f",
            (F.col("bit") / 32).cast("int").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(bit, 32) AS INT))"
            ).alias("mask"),
        )
        .groupBy("f", "word")
        .agg(F.bit_or("mask").alias("w"))
    )
    per_file = keys.select(fid.alias("f")).groupBy("f").agg(
        F.count(F.lit(1)).alias("n_keys")
    )
    mx = orders.agg(F.max("o_orderkey").alias("mx"))
    probes = (
        mx.select(
            F.explode(F.sequence(F.col("mx") + 1, F.col("mx") + BF_PROBES)).alias(
                "pk"
            )
        )
        .select(
            "pk",
            F.explode(F.sequence(F.lit(0), F.lit(BF_FILES - 1))).alias("f"),
        )
        .select(
            "pk",
            "f",
            F.explode(
                F.array(*[bit_j(j, F.col("pk")) for j in range(BF_K)])
            ).alias("bit"),
        )
        .select(
            "pk",
            "f",
            (F.col("bit") / 32).cast("int").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(bit, 32) AS INT))"
            ).alias("mask"),
        )
    )
    hits = (
        probes.join(F.broadcast(blooms), ["f", "word"], "left")
        .groupBy("pk", "f")
        .agg(
            F.min(
                (F.coalesce(F.col("w"), F.lit(0)).bitwiseAND(F.col("mask")) == F.col("mask")).cast("int")
            ).alias("member")
        )
        .filter(F.col("member") == 1)
        .groupBy("f")
        .agg(F.count(F.lit(1)).alias("n_fp"))
    )
    return (
        per_file.join(hits, "f", "left")
        .select(
            "f",
            "n_keys",
            F.coalesce(F.col("n_fp"), F.lit(0)).alias("n_fp"),
            (
                F.floor(
                    F.coalesce(F.col("n_fp"), F.lit(0)).cast("double")
                    / BF_PROBES
                    * 10000
                    + F.lit(0.5)
                )
                / 10000.0
            ).alias("fp_rate4"),
        )
        .orderBy("f")
    )


def _table_bloom_prune_audit(spark, sf_dir):
    return bloom_prune_audit(t(spark, sf_dir, "orders"))


def _bf_bits_sql(j: int, expr: str) -> str:
    return (
        f"('0x' || substr(md5('bf{j}:' || CAST({expr} AS VARCHAR)), 1, 8))::BIGINT"
        f" % {BF_BITS}"
    )


_BF_SQL = f"""
WITH keys AS (SELECT DISTINCT o_orderkey FROM orders),
kb AS (
  SELECT ('0x' || substr(md5('bf_file:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
           % {BF_FILES} AS f,
         unnest([{", ".join(_bf_bits_sql(j, "o_orderkey") for j in range(BF_K))}]) AS bit
  FROM keys
),
blooms AS (
  SELECT f, CAST(bit // 32 AS INT) AS word,
         CAST(bit_or(CAST(1 AS BIGINT) << CAST(bit % 32 AS INT)) AS BIGINT) AS w
  FROM kb GROUP BY f, CAST(bit // 32 AS INT)
),
per_file AS (
  SELECT ('0x' || substr(md5('bf_file:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
           % {BF_FILES} AS f, CAST(count(*) AS BIGINT) AS n_keys
  FROM keys GROUP BY 1
),
probes AS (
  SELECT mx + 1 + p.i AS pk, fl.f, b.j
  FROM (SELECT max(o_orderkey) AS mx FROM orders),
       (SELECT unnest(range(0, {BF_PROBES})) AS i) p,
       (SELECT unnest(range(0, {BF_FILES})) AS f) fl,
       (SELECT unnest(range(0, {BF_K})) AS j) b
),
pb AS (
  SELECT pk, f,
         CASE j {" ".join(f"WHEN {j} THEN {_bf_bits_sql(j, 'pk')}" for j in range(BF_K))} END AS bit
  FROM probes
),
hits AS (
  SELECT pk, f FROM (
    SELECT pb.pk, pb.f,
           min(CASE WHEN COALESCE(bl.w, 0) & (CAST(1 AS BIGINT) << CAST(pb.bit % 32 AS INT))
                         = (CAST(1 AS BIGINT) << CAST(pb.bit % 32 AS INT))
                    THEN 1 ELSE 0 END) AS member
    FROM pb LEFT JOIN blooms bl
      ON bl.f = pb.f AND bl.word = CAST(pb.bit // 32 AS INT)
    GROUP BY pb.pk, pb.f) WHERE member = 1
),
fp AS (SELECT f, CAST(count(*) AS BIGINT) AS n_fp FROM hits GROUP BY f)
SELECT per_file.f, per_file.n_keys,
       CAST(COALESCE(fp.n_fp, 0) AS BIGINT) AS n_fp,
       floor(CAST(COALESCE(fp.n_fp, 0) AS DOUBLE) / {BF_PROBES} * 10000 + 0.5)
         / 10000.0 AS fp_rate4
FROM per_file LEFT JOIN fp USING (f)
ORDER BY per_file.f
"""


# ----------------------------------------------------- K-MEANS (LLOYD)


def _embed_kmeans_lloyd(spark, sf_dir):
    """Deterministic 3-round Lloyd k-means over SQ8 codes — see
    ext.similarity.kmeans_lloyd for the integer-exactness and
    per-round scale argument. The oracle unrolls the three rounds in
    SQL exactly like graph_pagerank's unrolled recurrence."""
    from .ext import similarity as S
    from .registry_util import shared_sq8_codes

    return S.kmeans_lloyd(
        t(spark, sf_dir, "embeddings"),
        codes=shared_sq8_codes(spark, sf_dir),
    )


def _kmeans_sql() -> str:
    from .ext import similarity as S

    k, rounds = S.KM_K, S.KM_ROUNDS
    parts = [
        """WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
idx AS (SELECT vec_id, v, unnest(range(1, len(v)+1)) AS i FROM e),
d AS (SELECT i AS pos, min(v[i]) AS mn, max(v[i]) AS mx FROM idx GROUP BY 1),
b AS (SELECT list(mn ORDER BY pos) AS mn, list(mx ORDER BY pos) AS mx FROM d),
codes AS (SELECT vec_id,
  list_transform(range(1, len(v)+1), i ->
    CASE WHEN b.mx[i] > b.mn[i]
         THEN CAST(floor((v[i] - b.mn[i]) / (b.mx[i] - b.mn[i]) * 255 + 0.5) AS BIGINT)
         ELSE 0 END) AS c
  FROM e CROSS JOIN b),"""
    ]
    parts.append(
        f"st0 AS (SELECT vec_id AS cid, CAST(1 AS BIGINT) AS cnt, c AS s"
        f" FROM codes ORDER BY vec_id LIMIT {k}),"
    )
    for r in range(rounds):
        parts.append(
            f"""a{r} AS (
  SELECT vec_id, c, cid, d2, cnt FROM (
    SELECT codes.vec_id, codes.c, st{r}.cid, st{r}.cnt,
      CAST(list_sum(list_transform(range(1, len(codes.c)+1),
           i -> (st{r}.cnt*codes.c[i] - st{r}.s[i])
              * (st{r}.cnt*codes.c[i] - st{r}.s[i]))) AS BIGINT) AS d2,
      row_number() OVER (PARTITION BY codes.vec_id ORDER BY
        CAST(list_sum(list_transform(range(1, len(codes.c)+1),
           i -> (st{r}.cnt*codes.c[i] - st{r}.s[i])
              * (st{r}.cnt*codes.c[i] - st{r}.s[i]))) AS DOUBLE)
          / (st{r}.cnt * st{r}.cnt), st{r}.cid) AS pr
    FROM codes, st{r}) WHERE pr = 1),"""
        )
        if r < rounds - 1:
            parts.append(
                f"""u{r} AS (
  SELECT cid, i AS pos, CAST(sum(c[i]) AS BIGINT) AS sx,
         CAST(count(*) AS BIGINT) AS n
  FROM (SELECT cid, c, unnest(range(1, len(c)+1)) AS i FROM a{r})
  GROUP BY cid, i),
st{r + 1} AS (SELECT cid, max(n) AS cnt, list(sx ORDER BY pos) AS s
  FROM u{r} GROUP BY cid),"""
            )
    last = rounds - 1
    parts.append(
        f"""final AS (
  SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
         CAST(min(vec_id) AS BIGINT) AS rep_id,
         floor(CAST(sum(d2) AS DOUBLE) / (max(cnt) * max(cnt))
               * 10000 + 0.5) / 10000.0 AS inertia4
  FROM a{last} GROUP BY cid)
SELECT cid, n_members, rep_id, inertia4 FROM final ORDER BY cid"""
    )
    return "\n".join(parts)


# ------------------------------------------- NDV PROFILING (MINCOUNT)

# MinCount geometry: 64 buckets of minimum hash values per column; the
# per-bucket estimate R div (min+1) - 1 uses INTEGER division so the
# 64-term sum is order-independent int64 (a double sum would make the
# result partitioning-dependent and unhashable cross-engine).
NDV_BUCKETS = 64
NDV_R = 1 << 32
NDV_COLS = ("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag")


def ndv_mincount(lineitem):
    """Column-statistics collection at scale: exact NDV next to a
    MinCount sketch estimate (stochastic averaging of per-bucket
    minimum hashes — the KMV/HLL family member that stays EXACTLY
    reproducible, because its state is 64 integer minima of md5 values,
    not probabilistic registers) with the realized relative error.
    This is the ANALYZE TABLE primitive a CBO needs, restated as one
    job over all profiled columns with its own accuracy audit — the
    same exact-next-to-estimate framing as agg_countmin_heavy.

    Scale shape: ONE pass explodes each row into (column, value) pairs;
    ONE shuffle reduces to (column, value) grain — the same shuffle an
    exact count-distinct needs anyway, and min(hash) rides it for free;
    everything after runs on (column, bucket) grain (256 rows). At
    100 TB this replaces |columns| separate ANALYZE scans with one.
    The estimator needs no distinct at all (min over duplicate hashes
    is the min) — the distinct grain here is only for the exact-NDV
    half of the audit."""
    pairs = lineitem.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("cname"),
                        F.col(c).cast("string").alias("val"),
                    )
                    for c in NDV_COLS
                ]
            )
        ).alias("cv")
    ).select(F.col("cv.cname").alias("cname"), F.col("cv.val").alias("val"))
    # hash AFTER the distinct-grain reduction (r8): h is a pure function
    # of val, so min(h) over a (cname, val) group is just h — hashing
    # before the groupBy ran md5 once per OCCURRENCE (|cols| x |rows|),
    # hashing after runs it once per DISTINCT value. Same shuffle (the
    # map-side combine dedups either way), identical values.
    grain = pairs.distinct().withColumn(
        "h", _h32(F.concat(F.lit("ndv:"), F.col("val")))
    )
    grain = grain.select(
        "cname", "val", "h", F.pmod(F.col("h"), F.lit(NDV_BUCKETS)).alias("b")
    )
    exact = grain.groupBy("cname").agg(F.count(F.lit(1)).alias("exact_ndv"))
    mins = grain.groupBy("cname", "b").agg(F.min("h").alias("mn"))
    est = mins.groupBy("cname").agg(
        F.sum(
            F.expr(f"CAST({NDV_R} AS BIGINT) div (mn + 1) - 1")
        ).alias("est_ndv")
    )
    return (
        exact.join(est, "cname")
        .select(
            "cname",
            "exact_ndv",
            "est_ndv",
            (
                F.floor(
                    F.abs(F.col("est_ndv") - F.col("exact_ndv")).cast("double")
                    / F.col("exact_ndv")
                    * 10000
                    + F.lit(0.5)
                )
                / 10000.0
            ).alias("rel_err4"),
        )
        .orderBy("cname")
    )


def _table_ndv_mincount(spark, sf_dir):
    return ndv_mincount(t(spark, sf_dir, "lineitem"))


_NDV_PAIRS = " UNION ALL ".join(
    f"SELECT '{c}' AS cname, CAST({c} AS VARCHAR) AS val FROM lineitem"
    for c in NDV_COLS
)

_NDV_SQL = f"""
WITH pairs AS ({_NDV_PAIRS}),
grain AS (
  SELECT cname, val,
         min(('0x' || substr(md5('ndv:' || val), 1, 8))::BIGINT) AS h
  FROM pairs GROUP BY cname, val
),
g2 AS (SELECT cname, val, h, h % {NDV_BUCKETS} AS b FROM grain),
exact AS (SELECT cname, CAST(count(*) AS BIGINT) AS exact_ndv
          FROM g2 GROUP BY cname),
mins AS (SELECT cname, b, min(h) AS mn FROM g2 GROUP BY cname, b),
est AS (SELECT cname,
               CAST(sum(CAST({NDV_R} AS BIGINT) // (mn + 1) - 1) AS BIGINT)
                 AS est_ndv
        FROM mins GROUP BY cname)
SELECT exact.cname, exact.exact_ndv, est.est_ndv,
       floor(abs(est.est_ndv - exact.exact_ndv)::DOUBLE / exact.exact_ndv
             * 10000 + 0.5) / 10000.0 AS rel_err4
FROM exact JOIN est USING (cname)
ORDER BY exact.cname
"""


# ------------------------------------------- WATERMARK LATENESS SWEEP

# Candidate watermark delays (seconds) for the tuning sweep.
WM_SWEEP = (0, 60, 300, 900, 3600)


def lateness_sweep(events):
    """Watermark tuning report: treating ``event_id`` as the arrival
    order (the ingest sequence), an event is LATE by the amount the
    per-user stream has already advanced past its timestamp when it
    arrives. For each candidate watermark delay W the report counts the
    events a streaming job with ``withWatermark(W)`` would drop — the
    curve that picks W (stream/windows.py consumes the chosen value).
    All lateness arithmetic is exact integer microseconds.

    Scale shape: ONE user-partitioned running-max window in arrival
    order (the sessionize discipline — never a global window), then a
    |sweep|-way in-place explode + one map-side-combinable groupBy on
    the threshold. No joins."""
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    late = events.select(
        "user_id", "event_id", (F.max(us).over(w) - us).alias("late_us")
    )
    thr = F.explode(F.array(*[F.lit(v) for v in WM_SWEEP])).alias("w_seconds")
    return (
        late.select("late_us", thr)
        .groupBy("w_seconds")
        .agg(
            F.sum(
                F.when(
                    F.col("late_us")
                    > F.col("w_seconds").cast("long") * 1_000_000,
                    1,
                ).otherwise(0)
            ).alias("n_dropped"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .select(
            "w_seconds",
            "n_dropped",
            (
                F.floor(
                    F.col("n_dropped").cast("double") / F.col("n_total") * 10000
                    + F.lit(0.5)
                )
                / 10000.0
            ).alias("pct_dropped4"),
        )
        .orderBy("w_seconds")
    )


def _stream_lateness_sweep(spark, sf_dir):
    return lateness_sweep(t(spark, sf_dir, "events"))


_WM_LIST = "[" + ", ".join(str(v) for v in WM_SWEEP) + "]"

_LATENESS_SQL = f"""
WITH l AS (
  SELECT user_id, event_id,
         max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
                                 ROWS UNBOUNDED PRECEDING)
           - epoch_us(ts) AS late_us
  FROM events
),
sw AS (SELECT late_us, unnest({_WM_LIST}) AS w_seconds FROM l)
SELECT CAST(w_seconds AS INT) AS w_seconds,
       CAST(count(*) FILTER (WHERE late_us > CAST(w_seconds AS BIGINT) * 1000000) AS BIGINT)
         AS n_dropped,
       floor(CAST(count(*) FILTER (WHERE late_us > CAST(w_seconds AS BIGINT) * 1000000)
                  AS DOUBLE) / count(*) * 10000 + 0.5) / 10000.0
         AS pct_dropped4
FROM sw GROUP BY w_seconds ORDER BY w_seconds
"""


# ------------------------------------------- LABEL PROPAGATION (LPA)


def _graph_label_propagation(spark, sf_dir):
    """Synchronous label-propagation community detection over the part
    co-occurrence graph (the graph_pagerank/graph_triangles edge set) —
    see ops.graph.label_propagation for the zero-per-round-exchange
    argument and why the SYNC variant is the only reproducible one."""
    from .ops import graph as G

    edges = shared_cooccurrence_edges(spark, sf_dir)
    return G.label_propagation(edges)


def _lpa_sql() -> str:
    from .ops import graph as G

    edges_cte = """
SELECT a.i AS src, b.i AS dst
FROM (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem) a
JOIN (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem) b
  ON a.g = b.g AND a.i <> b.i
GROUP BY 1, 2 HAVING count(*) >= 2
"""
    return G.label_propagation_oracle_sql(edges_cte, rounds=3)


# ------------------------------------------- TOKEN-BUDGET SAMPLING

# Budget as a percent of corpus tokens, and the bucket count for the
# hierarchical prefix sum over the hash axis (top 7 bits of the 32-bit
# hash, so bucket order == hash order).
TB_PCT = 50
TB_BUCKETS = 128
TB_BUCKET_DIV = (1 << 32) // TB_BUCKETS


def token_budget_sample(docs, pct: int = TB_PCT):
    """Deterministic budget-capped corpus selection: walk the corpus in
    key-hash order (a reproducible pseudo-random shuffle — no RNG
    state) and take documents until the token budget (``pct``% of the
    corpus) is spent; a doc is taken iff the tokens BEFORE it in hash
    order fit the budget. This is how a fixed-size training mix is cut
    from a larger pool when the unit of cost is tokens, not documents.
    Reports the per-source composition of the selected sample — the
    number that shows whether budget-capping skewed the mix.

    Scale shape: take-while over a global order is a prefix sum — the
    same cliff as cumulative-distinct, solved the same way,
    HIERARCHICALLY, on the hash axis: bucket = top hash bits (so
    bucket order IS hash order), within-bucket running sums under a
    bucket-partitioned window, bucket base offsets from a
    strictly-earlier self-join over the 128-row bucket table (bounded
    build). The budget scalar rides in as a broadcast 1-row aggregate.
    One corpus shuffle (the window's bucket partition), everything
    else metadata-sized."""
    base = docs.select(
        "doc_id",
        "source",
        F.size(_tok(F.col("text"))).alias("n_tok"),
        _h32(F.concat(F.lit("tb:"), F.col("doc_id").cast("string"))).alias("h"),
    ).withColumn("bucket", F.expr(f"h div {TB_BUCKET_DIV}"))
    budget = base.agg(
        F.expr(f"sum(n_tok) * {pct} div 100").alias("budget")
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = base.withColumn("cum_in_bucket", F.sum("n_tok").over(w))
    btot = base.groupBy("bucket").agg(F.sum("n_tok").alias("btok"))
    b_a = btot.select(F.col("bucket").alias("bk"))
    b_b = btot.select(F.col("bucket").alias("bk2"), "btok")
    offsets = (
        b_a.join(b_b, F.col("bk2") < F.col("bk"))
        .groupBy("bk")
        .agg(F.sum("btok").alias("off"))
    )
    sel = (
        within.join(F.broadcast(offsets), within.bucket == offsets.bk, "left")
        .join(F.broadcast(budget))
        .select(
            "source",
            "n_tok",
            (
                F.coalesce(F.col("off"), F.lit(0))
                + F.col("cum_in_bucket")
                - F.col("n_tok")
            ).alias("cum_before"),
            "budget",
        )
        .filter(F.col("cum_before") < F.col("budget"))
    )
    return (
        sel.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_taken"),
            F.sum("n_tok").alias("tokens_taken"),
        )
        .orderBy("source")
    )


def _corpus_token_budget_sample(spark, sf_dir):
    return token_budget_sample(t(spark, sf_dir, "documents"))


_TB_SQL = f"""
WITH base AS (
  SELECT doc_id, source,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok,
         ('0x' || substr(md5('tb:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           AS h
  FROM documents
),
b AS (SELECT CAST(sum(n_tok) * {TB_PCT} // 100 AS BIGINT) AS budget FROM base),
o AS (
  SELECT source, n_tok,
         sum(n_tok) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING)
           - n_tok AS cum_before
  FROM base
)
SELECT source, CAST(count(*) AS BIGINT) AS n_taken,
       CAST(sum(n_tok) AS BIGINT) AS tokens_taken
FROM o, b WHERE o.cum_before < b.budget
GROUP BY source ORDER BY source
"""


# ------------------------------------------- LSH CANDIDATE RECALL EVAL

# Ground-truth threshold for the eval — the dedup family's tau. The
# b=8, r=4 banding has its S-curve midpoint near (1/8)^(1/4) ~ 0.59,
# so at tau=0.5 candidate recall is genuinely < 1 and the eval
# measures a real trade, not a tautology.
LSH_EVAL_TAU = 0.5


def lsh_recall_eval(docs, sig=None, cand=None):
    """Candidate-generation quality of MinHash-LSH banding, measured
    against exact shingle-Jaccard ground truth — the dedup counterpart
    of ann_recall_eval, and the number that decides the (bands, rows)
    configuration before a corpus-scale dedup run: RECALL is the
    fraction of true near-dup pairs (exact Jaccard >= tau) the band
    collisions recover; candidate PRECISION is the fraction of
    collisions worth verifying (1 - wasted verify work).

    Ground truth comes from the shared-shingle blocking
    (ext.dedup.ngram_jaccard_pairs) — exhaustive for pairs above tau
    except pairs whose every shared shingle exceeds the hot-DF guard
    (documented there; none exist in the fixtures). Scale shape: both
    pipelines are the registered bucketed forms (never all-pairs); the
    three scalar counts combine as 1-row broadcast attaches (q14
    shape)."""
    from .ext import dedup as D

    if cand is None:  # standalone form: derive candidates in-memory
        if sig is None:
            sig = D.with_minhash(docs, "doc_id", "text")
        bands = sig.select("doc", *D.band_keys()).persist()
        cand = D.lsh_candidate_pairs(bands)
    truth = D.ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=LSH_EVAL_TAU
    ).select("doc_a", "doc_b")
    # the truth side feeds BOTH the n_truth count and the hit semi-join;
    # truncate lineage so the exact-pairs pass (candidate equi-join +
    # array-Jaccard verify — the whole cost of this key) executes once,
    # not once per consumer (r11; the stored grain is the ≥tau pair
    # list, strictly smaller than anything upstream)
    truth = truncate_lineage(truth)
    hit = truth.join(cand, ["doc_a", "doc_b"], "left_semi")
    nt = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    nc = cand.agg(F.count(F.lit(1)).alias("n_cand"))
    nh = hit.agg(F.count(F.lit(1)).alias("n_hit"))
    q4 = lambda num, den: F.when(
        F.col(den) > 0,
        F.floor(F.col(num).cast("double") / F.col(den) * 10000 + F.lit(0.5))
        / 10000.0,
    ).otherwise(F.lit(-1.0))
    return (
        nt.join(F.broadcast(nc))
        .join(F.broadcast(nh))
        .select(
            "n_truth",
            "n_cand",
            "n_hit",
            q4("n_hit", "n_cand").alias("cand_precision4"),
            q4("n_hit", "n_truth").alias("recall4"),
        )
    )


def _dedup_lsh_recall_eval(spark, sf_dir):
    # candidates come straight off the materialized candidate-stats
    # stage (r10) — a two-column pruned scan; the exact-Jaccard truth
    # side is this key's own work and stays live
    return lsh_recall_eval(
        t(spark, sf_dir, "documents"),
        cand=shared_minhash_cand_stats(spark, sf_dir).select(
            "doc_a", "doc_b"
        ),
    )


def _lsh_recall_sql() -> str:
    from .ext import dedup as D
    from .registry_ext import (
        _SQL_DOC_SHINGLES,
        _sql_band_rows,
        _sql_sig_cols,
    )

    return f"""
WITH {_SQL_DOC_SHINGLES},
sig AS (SELECT doc_id, {_sql_sig_cols()} FROM sh
        WHERE len(list_filter(shd, h -> h IS NOT NULL)) > 0),
bands AS ({_sql_band_rows()}),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.key = b.key AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
ex AS (SELECT doc_id, unnest(shd) AS s FROM sh),
hot AS (SELECT s FROM ex GROUP BY s HAVING count(*) > {D.NGRAM_MAX_DF}),
ex2 AS (SELECT ex.* FROM ex LEFT JOIN hot USING (s) WHERE hot.s IS NULL),
tc AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ex2 a JOIN ex2 b ON a.s = b.s AND a.doc_id < b.doc_id
),
truth AS (
  SELECT doc_a, doc_b FROM (
    SELECT tc.doc_a, tc.doc_b,
           len(list_intersect(x.shd, y.shd))::DOUBLE
             / (len(x.shd) + len(y.shd) - len(list_intersect(x.shd, y.shd)))
             AS j
    FROM tc JOIN sh x ON x.doc_id = tc.doc_a
            JOIN sh y ON y.doc_id = tc.doc_b)
  WHERE j >= {LSH_EVAL_TAU}
),
hit AS (SELECT truth.* FROM truth
        JOIN cand ON cand.doc_a = truth.doc_a AND cand.doc_b = truth.doc_b),
c AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
             (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_cand,
             (SELECT CAST(count(*) AS BIGINT) FROM hit) AS n_hit)
SELECT n_truth, n_cand, n_hit,
       CASE WHEN n_cand > 0
            THEN floor(n_hit::DOUBLE / n_cand * 10000 + 0.5) / 10000.0
            ELSE -1.0 END AS cand_precision4,
       CASE WHEN n_truth > 0
            THEN floor(n_hit::DOUBLE / n_truth * 10000 + 0.5) / 10000.0
            ELSE -1.0 END AS recall4
FROM c
"""


# ------------------------------------------------- FLAC ROUND-TRIP QA


def _multimodal_flac_roundtrip(spark, sf_dir):
    """Real compressed-audio decode: every document becomes a genuine
    FLAC stream (rice-coded fixed/constant subframes, CRC-8/16, spec
    MD5) via the pure-stdlib codec in ``ext/flac.py``; the features are
    computed from the DECODED samples. The DuckDB oracle never sees a
    byte — it replays the sample LCG relationally — so the hash match
    proves the encode→parse→rice-decode→undo-predictor loop is lossless
    at sample grain, the same arithmetic-oracle pattern as
    ``multimodal_decode``/``multimodal_audio_features``. Scale shape:
    two chained Arrow-batched ``mapInPandas`` over the scan, zero
    shuffle, payload bytes never transit the driver."""
    from .ext import flac as FL

    docs = t(spark, sf_dir, "documents")
    return FL.flac_features(FL.synthesize_flac(docs))


# Relational replay of synthesize_flac: ids ≡ 0 (mod 8) are constant
# streams (closed form, no pw join); the rest replay the shared
# pw(k) = (A^k, sum_{j<k} A^j) mod 2^63 LCG table. rms2 is one IEEE
# sqrt of exact integers (bit-identical across engines); the constant
# branch's rms2 = |v| exactly (v² * m / m, sqrt, and the *100 floor
# quantization are all exact IEEE ops on representable integers).
_FLAC_SQL = """
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
docs0 AS (
  SELECT doc_id,
         CAST(length(text) % 256 + 16 AS BIGINT) AS frames,
         CAST(1 + (doc_id // 2) % 2 AS INTEGER) AS nch,
         CAST(8000 + (doc_id % 4) * 4000 AS INTEGER) AS rate
  FROM documents),
lcg AS (
  SELECT doc_id AS media_id, frames, nch, rate,
         frames * nch AS m,
         CAST((CAST(doc_id AS HUGEINT) * 6364136223846793005
               + 1442695040888963407) % 9223372036854775808 AS BIGINT) AS s0
  FROM docs0 WHERE doc_id % 8 <> 0),
smp AS (
  SELECT l.media_id, l.m, l.frames, l.nch, l.rate, p.k,
         (CAST((CAST(p.ak AS HUGEINT) * l.s0 + p.sk)
               % 9223372036854775808 AS BIGINT) // 8589934592) % 65536
           - 32768 AS s
  FROM lcg l JOIN pw p ON p.k <= l.m),
agg AS (
  SELECT media_id, m, frames, nch, rate,
         CAST(sum(s * s) AS BIGINT) AS ssq,
         CAST(max(abs(s)) AS BIGINT) AS peak,
         CAST(max(CASE WHEN k = 1 THEN s END) AS INTEGER) AS first_s,
         CAST(max(CASE WHEN k = m THEN s END) AS INTEGER) AS last_s
  FROM smp GROUP BY 1, 2, 3, 4, 5),
noise AS (
  SELECT media_id, rate AS sample_rate, nch AS n_channels,
         m AS n_values,
         CAST(CASE WHEN frames > 256 THEN 2 ELSE 1 END AS INTEGER)
           AS n_frames,
         first_s, last_s, peak,
         floor(sqrt(CAST(ssq AS DOUBLE) / m) * 100 + 0.5) / 100.0 AS rms2,
         TRUE AS md5_ok
  FROM agg),
cst AS (
  SELECT doc_id AS media_id, rate AS sample_rate, nch AS n_channels,
         CAST(frames * nch AS BIGINT) AS n_values,
         CAST(CASE WHEN frames > 256 THEN 2 ELSE 1 END AS INTEGER)
           AS n_frames,
         CAST((doc_id * 2654435761) % 65536 - 32768 AS INTEGER) AS first_s,
         CAST((doc_id * 2654435761) % 65536 - 32768 AS INTEGER) AS last_s,
         CAST(abs((doc_id * 2654435761) % 65536 - 32768) AS BIGINT) AS peak,
         CAST(abs((doc_id * 2654435761) % 65536 - 32768) AS DOUBLE) AS rms2,
         TRUE AS md5_ok
  FROM docs0 WHERE doc_id % 8 = 0)
SELECT * FROM noise UNION ALL SELECT * FROM cst
"""


# ------------------------------------------------- JPEG ROUND-TRIP QA


def _multimodal_jpeg_roundtrip(spark, sf_dir):
    """Real compressed-image decode: every document becomes a genuine
    baseline JPEG (DCT + huffman entropy coding + byte stuffing) via
    the numpy/stdlib codec in ``ext/jpeg.py``, using the flat-block /
    all-ones-quantizer configuration under which baseline JPEG is
    bit-exact — so the DuckDB oracle can replay the per-block LCG
    relationally and predict every decoded pixel statistic. The hash
    match proves the DCT→quantize→huffman→unstuff→dequantize→IDCT loop
    is exact at pixel grain; lossy-mode quality is PSNR-asserted in
    pytest. Scale shape: two chained Arrow-batched ``mapInPandas``,
    zero shuffle, payloads never transit the driver."""
    from .ext import jpeg as J

    docs = t(spark, sf_dir, "documents")
    return J.jpeg_features(J.synthesize_jpeg(docs))


# Relational replay of synthesize_jpeg's block LCG (same pw(k) table
# family as the WAV/FLAC oracles, truncated at the 12-block max).
# dc_blocks = block count asserts relationally that every decoded 8x8
# block came back constant — i.e. no AC leakage anywhere in the loop.
_JPEG_SQL = """
WITH RECURSIVE pw(k, ak, sk) AS (
  SELECT 1, CAST(6364136223846793005 AS BIGINT), CAST(1 AS BIGINT)
  UNION ALL
  SELECT k + 1,
         CAST((CAST(6364136223846793005 AS HUGEINT) * ak)
              % 9223372036854775808 AS BIGINT),
         CAST((CAST(6364136223846793005 AS HUGEINT) * sk + 1)
              % 9223372036854775808 AS BIGINT)
  FROM pw WHERE k < 12
),
docs0 AS (
  SELECT doc_id,
         CAST(doc_id % 4 + 1 AS BIGINT) AS bw,
         CAST((doc_id // 4) % 3 + 1 AS BIGINT) AS bh,
         CASE WHEN doc_id % 8 = 0 THEN doc_id + length(text)
              ELSE doc_id END AS sb
  FROM documents),
seeds AS (
  SELECT doc_id, bw, bh, bw * bh AS nb,
         CAST((CAST(sb AS HUGEINT) * 6364136223846793005
               + 1442695040888963407) % 9223372036854775808 AS BIGINT) AS s0
  FROM docs0),
blk AS (
  SELECT d.doc_id, d.bw, d.bh, d.nb,
         (CAST((CAST(p.ak AS HUGEINT) * d.s0 + p.sk)
               % 9223372036854775808 AS BIGINT) // 8589934592) % 256 AS v
  FROM seeds d JOIN pw p ON p.k <= d.nb)
SELECT doc_id AS media_id,
       CAST(bw * 8 AS INTEGER) AS width,
       CAST(bh * 8 AS INTEGER) AS height,
       CAST(bw * bh * 64 AS BIGINT) AS n_px,
       CAST(64 * sum(v) AS BIGINT) AS px_sum,
       CAST(min(v) AS INTEGER) AS px_min,
       CAST(max(v) AS INTEGER) AS px_max,
       CAST(nb AS INTEGER) AS dc_blocks
FROM blk GROUP BY doc_id, bw, bh, nb
"""


# --------------------------------------------- PRODUCT QUANTIZATION

# Query set for the PQ ADC key: one in 40 vectors (13 queries at the
# 500-vector SFs, 50 at sf0.1) — queries may coincide with codebook
# seeds, which is realistic (a stored vector queried against the rest).
PQ_QUERY_MOD = 40


def _embed_pq_adc(spark, sf_dir):
    """PQ-compressed ANN with per-query ADC lookup tables — see
    ext.similarity.pq_adc_topk for the integer-exact training design
    and the fixed-order ADC fold that make an iterative trained
    quantizer hash-verifiable. Completes the ANN compression ladder
    (brute cosine → LSH → IVF → SQ8 → PQ/ADC)."""
    from .ext import similarity as S

    from .registry_util import shared_sq8_codes

    emb = t(spark, sf_dir, "embeddings")
    return S.pq_adc_topk(
        emb,
        F.col("vec_id") % PQ_QUERY_MOD == 0,
        codes=shared_sq8_codes(spark, sf_dir),
    )


def _pq_sql() -> str:
    from .ext import similarity as S

    m, kc, rounds, k = S.PQ_M, S.PQ_K, S.PQ_ROUNDS, S.PQ_TOPK
    dsub = 64 // m  # fixture embeddings are 64-dim (asserted by codes CTE)
    parts = [
        """WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
idx AS (SELECT vec_id, v, unnest(range(1, len(v)+1)) AS i FROM e),
d AS (SELECT i AS pos, min(v[i]) AS mn, max(v[i]) AS mx FROM idx GROUP BY 1),
b AS (SELECT list(mn ORDER BY pos) AS mn, list(mx ORDER BY pos) AS mx FROM d),
codes AS (SELECT vec_id,
  list_transform(range(1, len(v)+1), i ->
    CASE WHEN b.mx[i] > b.mn[i]
         THEN CAST(floor((v[i] - b.mn[i]) / (b.mx[i] - b.mn[i]) * 255 + 0.5) AS BIGINT)
         ELSE 0 END) AS c
  FROM e CROSS JOIN b),"""
    ]
    parts.append(
        f"""subs AS (
  SELECT vec_id, sub,
         list_transform(range(1, {dsub + 1}), i -> c[sub*{dsub} + i]) AS sc
  FROM (SELECT vec_id, c, unnest(range(0, {m})) AS sub FROM codes)),
st0 AS (
  SELECT vec_id AS cid, sub, CAST(1 AS BIGINT) AS cnt, sc AS s
  FROM subs WHERE vec_id IN
    (SELECT vec_id FROM codes ORDER BY vec_id LIMIT {kc})),"""
    )
    for r in range(rounds):
        parts.append(
            f"""a{r} AS (
  SELECT vec_id, sub, cid, sc FROM (
    SELECT subs.vec_id, subs.sub, st{r}.cid, subs.sc,
      row_number() OVER (PARTITION BY subs.vec_id, subs.sub ORDER BY
        CAST(list_sum(list_transform(range(1, {dsub + 1}),
           i -> (st{r}.cnt*subs.sc[i] - st{r}.s[i])
              * (st{r}.cnt*subs.sc[i] - st{r}.s[i]))) AS DOUBLE)
          / (st{r}.cnt * st{r}.cnt), st{r}.cid) AS pr
    FROM subs JOIN st{r} ON st{r}.sub = subs.sub) WHERE pr = 1),"""
        )
        if r < rounds - 1:
            parts.append(
                f"""u{r} AS (
  SELECT sub, cid, i AS pos, CAST(sum(sc[i]) AS BIGINT) AS sx,
         CAST(count(*) AS BIGINT) AS n
  FROM (SELECT sub, cid, sc, unnest(range(1, {dsub + 1})) AS i FROM a{r})
  GROUP BY sub, cid, i),
st{r + 1} AS (SELECT sub, cid, max(n) AS cnt, list(sx ORDER BY pos) AS s
  FROM u{r} GROUP BY sub, cid),"""
            )
    last = rounds - 1
    adc_sum = "((d0 + d1) + d2) + d3" if m == 4 else " + ".join(
        f"d{s}" for s in range(m)
    )
    per_sub_cols = ",\n         ".join(
        f"max(CASE WHEN sub = {s} THEN dq END) AS d{s}" for s in range(m)
    )
    parts.append(
        f"""lut AS (
  SELECT q.vec_id AS query_id, q.sub, st{last}.cid,
         CAST(list_sum(list_transform(range(1, {dsub + 1}),
            i -> (st{last}.cnt*q.sc[i] - st{last}.s[i])
               * (st{last}.cnt*q.sc[i] - st{last}.s[i]))) AS DOUBLE)
           / (st{last}.cnt * st{last}.cnt) AS dq
  FROM (SELECT * FROM subs WHERE vec_id % {PQ_QUERY_MOD} = 0) q
  JOIN st{last} ON st{last}.sub = q.sub),
enc AS (SELECT vec_id AS cand_id, sub, cid FROM a{last}
        WHERE vec_id % {PQ_QUERY_MOD} <> 0),
paired AS (
  SELECT query_id, cand_id,
         {per_sub_cols}
  FROM enc JOIN lut USING (sub, cid)
  GROUP BY query_id, cand_id),
ranked AS (
  SELECT query_id, cand_id, {adc_sum} AS adc,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {adc_sum}, cand_id) AS rnk
  FROM paired)
SELECT query_id, cand_id, CAST(rnk AS BIGINT) AS rnk,
       floor(adc * 10000 + 0.5) / 10000.0 AS adc4
FROM ranked WHERE rnk <= {k}"""
    )
    return "\n".join(parts)


# --------------------------------------------------- K-CORE PEELING

KCORE_K = 2
KCORE_ROUNDS = 3


def _graph_kcore_peel(spark, sf_dir):
    """k-core peeling profile over the part co-occurrence graph (the
    pagerank/triangles/LPA edge set) — see ops.graph.kcore_peel for
    the zero-per-round-exchange argument. k=2 is calibrated to the
    fixtures (real peel dynamics: removals every round, non-empty
    core at every SF: sf0.1 peels 5922 -> 1067 -> 138 -> 22), and the
    per-round removal curve is the graph-cleaning
    number: how much of the graph is shell vs core."""
    from .ops import graph as G

    edges = shared_cooccurrence_edges(spark, sf_dir)
    return G.kcore_peel(edges, k=KCORE_K, rounds=KCORE_ROUNDS)


def _kcore_sql() -> str:
    from .ops import graph as G

    edges_cte = """
SELECT a.i AS src, b.i AS dst
FROM (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem) a
JOIN (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem) b
  ON a.g = b.g AND a.i <> b.i
GROUP BY 1, 2 HAVING count(*) >= 2
"""
    return G.kcore_oracle_sql(edges_cte, k=KCORE_K, rounds=KCORE_ROUNDS)


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
        QueryDef(
            "layout_zonemap_overlap",
            _layout_zonemap_overlap,
            _ZONEMAP_SQL,
            ("warehouse",),
        ),
        QueryDef(
            "corpus_quality_sweep", _corpus_quality_sweep, _QSWEEP_SQL, ("corpus",)
        ),
        QueryDef("graph_link_predict", _graph_link_predict, _LP_SQL, ("graph",)),
        QueryDef(
            "multimodal_image_dedup",
            _multimodal_image_dedup,
            _AHASH_SQL,
            ("multimodal",),
        ),
        QueryDef(
            "embed_decontaminate", _embed_decontaminate, _decon_sql(), ("ext",)
        ),
        QueryDef(
            "table_bloom_prune_audit",
            _table_bloom_prune_audit,
            _BF_SQL,
            ("warehouse",),
        ),
        QueryDef(
            "embed_kmeans_lloyd", _embed_kmeans_lloyd, _kmeans_sql(), ("ext",)
        ),
        QueryDef(
            "table_ndv_mincount", _table_ndv_mincount, _NDV_SQL, ("warehouse",)
        ),
        QueryDef(
            "stream_lateness_sweep",
            _stream_lateness_sweep,
            _LATENESS_SQL,
            ("stream",),
        ),
        QueryDef(
            "graph_label_propagation",
            _graph_label_propagation,
            _lpa_sql(),
            ("graph",),
        ),
        QueryDef(
            "corpus_token_budget_sample",
            _corpus_token_budget_sample,
            _TB_SQL,
            ("corpus",),
        ),
        QueryDef(
            "dedup_lsh_recall_eval",
            _dedup_lsh_recall_eval,
            _lsh_recall_sql(),
            ("ext",),
        ),
        QueryDef(
            "multimodal_flac_roundtrip",
            _multimodal_flac_roundtrip,
            _FLAC_SQL,
            ("multimodal",),
        ),
        QueryDef(
            "multimodal_jpeg_roundtrip",
            _multimodal_jpeg_roundtrip,
            _JPEG_SQL,
            ("multimodal",),
        ),
        QueryDef("embed_pq_adc", _embed_pq_adc, _pq_sql(), ("ext",)),
        QueryDef(
            "graph_kcore_peel", _graph_kcore_peel, _kcore_sql(), ("graph",)
        ),
    )
}

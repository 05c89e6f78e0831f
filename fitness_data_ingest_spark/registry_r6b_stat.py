"""Round-6 continuation (r6b): statistics/experimentation, time-series, sampling and robust-aggregation keys (stat_*, ts_*, sample_*, agg_winsorized_mean).

Mechanically split out of the former single-file registry_r6b.py
(verdict r6 item 5) with ZERO plan movement — every key, callable, SQL
oracle and tag is byte-identical; PLANHASH.json pins prove it. See the
original module docstring (now in registry_r6b.py) for the exactness
discipline and reference-parity notes shared by all r6b families.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry_util import QueryDef, cents, t

R6B_QUERIES: dict[str, QueryDef] = {}


def _h32(col):
    """Engine-portable 32-bit hash (md5 prefix as int64) — same literal
    definition as registry_r5/r5b/r6, re-declared per family file so
    each file's SQL oracles pair with the Spark expression beside
    them."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _tok(col):
    return F.filter(F.split(col, " "), lambda x: x != "")


CP_BUCKET = 64  # coarse hour-bucket width for the hierarchical prefix

def changepoint_sse(events):
    """Single best changepoint by least squares (the binary-segmentation
    primitive, Scott & Knott 1974): over the hourly value series, find
    the split minimizing SSE_left + SSE_right and report both segment
    means — the level-shift detector a pipeline runs on its own volume
    and quality metrics.

    Exactness: hourly totals are int64 dollars; every candidate's cost
    is the identical double expression over exact int64 prefix sums
    (sum, sum-of-squares, count per side), micro-quantized BEFORE the
    argmin, so the argmin compares int64. Scale shape: one shuffle to
    the calendar-bounded hour grain, prefix sums via the coarse-bucket
    hierarchical identity (no partition-less window), candidate
    evaluation is embarrassingly per-row, and the argmin is one
    max(struct) aggregate."""
    from pyspark.sql import Window

    hourly = (
        events.select(
            F.expr("unix_micros(ts) div 3600000000").alias("hidx"),
            cents(F.col("value")).alias("cts"),
        )
        .groupBy("hidx")
        .agg(F.expr("sum(cts) div 100").alias("y"))
    )
    hourly = hourly.withColumn("bkt", F.expr(f"hidx div {CP_BUCKET}"))
    w = (
        Window.partitionBy("bkt")
        .orderBy("hidx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = hourly.select(
        "hidx",
        "y",
        "bkt",
        F.count(F.lit(1)).over(w).alias("c_in"),
        F.sum("y").over(w).alias("sy_in"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy_in"),
    )
    bagg = hourly.groupBy("bkt").agg(
        F.count(F.lit(1)).alias("bc"),
        F.sum("y").alias("bsy"),
        F.sum(F.col("y") * F.col("y")).alias("bsyy"),
    )
    offs = (
        bagg.select(F.col("bkt").alias("k"))
        .join(
            bagg.select(F.col("bkt").alias("k2"), "bc", "bsy", "bsyy"),
            F.col("k2") < F.col("k"),
        )
        .groupBy("k")
        .agg(
            F.sum("bc").alias("oc"),
            F.sum("bsy").alias("osy"),
            F.sum("bsyy").alias("osyy"),
        )
    )
    cum = within.join(F.broadcast(offs), within.bkt == offs.k, "left").select(
        "hidx",
        "y",
        (F.coalesce("oc", F.lit(0)) + F.col("c_in")).alias("cum_n"),
        (F.coalesce("osy", F.lit(0)) + F.col("sy_in")).alias("cum_sy"),
        (F.coalesce("osyy", F.lit(0)) + F.col("syy_in")).alias("cum_syy"),
    )
    g = hourly.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cand = (
        cum.join(F.broadcast(g))
        .select(
            "hidx",
            (F.col("cum_n") - 1).alias("nl"),
            (F.col("cum_sy") - F.col("y")).alias("syl"),
            (F.col("cum_syy") - F.col("y") * F.col("y")).alias("syyl"),
            (F.col("n") - F.col("cum_n") + 1).alias("nr"),
            (F.col("sy") - F.col("cum_sy") + F.col("y")).alias("syr"),
            (
                F.col("syy") - F.col("cum_syy") + F.col("y") * F.col("y")
            ).alias("syyr"),
            "n",
            "sy",
            "syy",
        )
        .where((F.col("nl") >= 1) & (F.col("nr") >= 1))
        .select(
            "*",
            F.floor(
                (
                    F.col("syyl").cast("double")
                    - F.col("syl").cast("double")
                    * F.col("syl").cast("double")
                    / F.col("nl").cast("double")
                    + F.col("syyr").cast("double")
                    - F.col("syr").cast("double")
                    * F.col("syr").cast("double")
                    / F.col("nr").cast("double")
                )
                * 1000000
                + F.lit(0.5)
            ).alias("cost_micro"),
        )
    )
    best = cand.groupBy("n", "sy", "syy").agg(
        F.min(
            F.struct(
                "cost_micro", "hidx", "nl", "nr", "syl", "syr"
            )
        ).alias("m")
    )
    return best.select(
        F.col("n").alias("n_hours"),
        F.col("m.hidx").alias("best_split_hidx"),
        F.col("m.nl").alias("n_left"),
        F.col("m.nr").alias("n_right"),
        F.expr("(1000 * m.syl) div m.nl").alias("mean_left_milli"),
        F.expr("(1000 * m.syr) div m.nr").alias("mean_right_milli"),
        F.col("m.cost_micro").alias("cost_micro"),
        F.floor(
            (
                F.col("syy").cast("double")
                - F.col("sy").cast("double")
                * F.col("sy").cast("double")
                / F.col("n").cast("double")
            )
            * 1000000
            + F.lit(0.5)
        ).alias("sse_total_micro"),
    )

def _ts_changepoint_sse(spark, sf_dir):
    return changepoint_sse(t(spark, sf_dir, "events"))

_CP_SQL = """
WITH hourly AS (
  SELECT epoch_us(ts) // 3600000000 AS hidx,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             // 100 AS y
  FROM events GROUP BY 1
),
cum AS (
  SELECT hidx, y,
         CAST(count(*) OVER (ORDER BY hidx) AS BIGINT) AS cum_n,
         CAST(sum(y) OVER (ORDER BY hidx) AS BIGINT) AS cum_sy,
         CAST(sum(y * y) OVER (ORDER BY hidx) AS BIGINT) AS cum_syy
  FROM hourly
),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM hourly
),
cand AS (
  SELECT hidx,
         cum_n - 1 AS nl, cum_sy - y AS syl, cum_syy - y * y AS syyl,
         n - cum_n + 1 AS nr, sy - cum_sy + y AS syr,
         syy - cum_syy + y * y AS syyr,
         n, sy, syy
  FROM cum, g
  WHERE cum_n - 1 >= 1 AND n - cum_n + 1 >= 1
),
scored AS (
  SELECT *,
         CAST(floor((CAST(syyl AS DOUBLE)
                     - CAST(syl AS DOUBLE) * CAST(syl AS DOUBLE)
                       / CAST(nl AS DOUBLE)
                     + CAST(syyr AS DOUBLE)
                     - CAST(syr AS DOUBLE) * CAST(syr AS DOUBLE)
                       / CAST(nr AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
             AS cost_micro
  FROM cand
)
SELECT n AS n_hours, hidx AS best_split_hidx, nl AS n_left, nr AS n_right,
       (1000 * syl) // nl AS mean_left_milli,
       (1000 * syr) // nr AS mean_right_milli,
       cost_micro,
       CAST(floor((CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                     / CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
           AS sse_total_micro
FROM scored ORDER BY cost_micro ASC, hidx ASC LIMIT 1
"""

KFOLD_K = 5

def kfold_assign(events, k: int = KFOLD_K):
    """Deterministic k-fold cross-validation assignment manifest: fold
    = md5-hash of the row key mod k, reported as per-(fold, class)
    counts with the fold-internal class share — the split audit that
    proves folds are balanced and assignment is reproducible across
    engines and reruns. One scan to the (k x classes)-bounded grain."""
    per = (
        events.select(
            (
                _h32(F.concat(F.lit("kf:"), F.col("event_id").cast("string")))
                % k
            ).alias("fold"),
            "event_type",
        )
        .groupBy("fold", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ftot = per.groupBy("fold").agg(F.sum("n").alias("fold_n"))
    return (
        per.join(F.broadcast(ftot), "fold")
        .select(
            "fold",
            "event_type",
            "n",
            "fold_n",
            F.expr("(1000000 * n) div fold_n").alias("share_micro"),
        )
        .orderBy("fold", "event_type")
    )

def _sample_kfold_assign(spark, sf_dir):
    return kfold_assign(t(spark, sf_dir, "events"))

_KFOLD_SQL = f"""
WITH per AS (
  SELECT ('0x' || substr(md5('kf:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
             % {KFOLD_K} AS fold,
         event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
ftot AS (SELECT fold, CAST(sum(n) AS BIGINT) AS fold_n FROM per GROUP BY 1)
SELECT per.fold, event_type, n, fold_n,
       (1000000 * n) // fold_n AS share_micro
FROM per JOIN ftot ON per.fold = ftot.fold
ORDER BY per.fold, event_type
"""

KT_XMAX = 511  # dollar-bucket clamp (values top out ~330; clamp keeps

KT_YMAX = 23

def kendall_tau(events):
    """Kendall tau-b rank correlation between value (dollar buckets)
    and hour-of-day, tie-corrected — the monotone-association test for
    bounded-domain pairs (is spend higher later in the day?).

    Concordant/discordant pair counts come from 2D PREFIX SUMS over the
    DENSIFIED (x, y) contingency grid: C = sum n_cell * cum2d(x-1, y-1)
    and D = sum n_cell * (colcum(x-1) - cum2d(x-1, y)), all exact
    int64; tau-b is the one quantized division at the end (with its
    sqrt of exact integers — IEEE-correctly-rounded on both engines).

    Scale shape: ONE shuffle collapses the fact table to the bounded
    cell grid (512 x 24 literal domain); densification is a broadcast
    literal-grid left join; the two chained prefix passes are windows
    partitioned by one bounded axis; every pair count is an aggregate —
    no pair ever materializes. Int64 headroom: C, D <= n^2/2, safe to
    n ~ 4e9 rows per audited slice (shard the audit above that)."""
    from pyspark.sql import Window

    spark = events.sparkSession
    cells = (
        events.select(
            F.least(
                F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT) div 100"),
                F.lit(KT_XMAX),
            ).alias("x"),
            F.expr("hour(ts)").cast("long").alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # the BOUNDED cell grid (≤ (XMAX+1)·(YMAX+1) rows at any event
    # volume) fans out to five consumers (dense → prefix passes +
    # both margins, plus the scored join) — truncate so the fact scan
    # + cell aggregate run once, not once per consumer (r12; the plan
    # showed 7 events scans)
    from .ops.scale import truncate_lineage

    cells = truncate_lineage(cells)
    grid = (
        spark.range(0, KT_XMAX + 1)
        .select(F.col("id").alias("x"))
        .crossJoin(
            spark.range(0, KT_YMAX + 1).select(F.col("id").alias("y"))
        )
    )
    dense = grid.join(cells, ["x", "y"], "left").select(
        "x", "y", F.coalesce("n", F.lit(0)).alias("n")
    )
    wx = (
        Window.partitionBy("y")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rowc = dense.select(
        "x", "y", "n", F.sum("n").over(wx).alias("cx_le")
    )
    wy = (
        Window.partitionBy("x")
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum2 = rowc.select(
        "x", "y", "n", "cx_le", F.sum("cx_le").over(wy).alias("c2_le")
    )
    # per-cell dominance counts by shifting the cumulative grid:
    # T(x,y) = c2_le(x-1, y-1); U(x,y) = colcum_lt(x) - c2_le(x-1, y)
    shifted_t = cum2.select(
        (F.col("x") + 1).alias("x"),
        (F.col("y") + 1).alias("y"),
        F.col("c2_le").alias("t_lt"),
    )
    shifted_u = cum2.select(
        (F.col("x") + 1).alias("x"),
        F.col("y").alias("y"),
        F.col("c2_le").alias("u_le"),
    )
    xmarg = dense.groupBy("x").agg(F.sum("n").alias("tx"))
    # the x-margin prefix runs over the 512-row literal domain — use the
    # triangular-join identity to stay window-free even there
    xcum = (
        xmarg.select(F.col("x").alias("xa"), F.col("tx").alias("ta"))
        .join(
            xmarg.select(F.col("x").alias("xb"), F.col("tx").alias("tb")),
            F.col("xb") < F.col("xa"),
            "left",
        )
        .groupBy("xa", "ta")
        .agg(F.coalesce(F.sum("tb"), F.lit(0)).alias("colcum_lt"))
        .select(F.col("xa").alias("x"), "ta", "colcum_lt")
    )
    scored = (
        cells.join(shifted_t, ["x", "y"], "left")
        .join(shifted_u, ["x", "y"], "left")
        .join(F.broadcast(xcum.select("x", "colcum_lt")), "x")
        .select(
            "n",
            "x",
            "y",
            (F.col("n") * F.coalesce("t_lt", F.lit(0))).alias("c_term"),
            (
                F.col("n")
                * (F.col("colcum_lt") - F.coalesce("u_le", F.lit(0)))
            ).alias("d_term"),
        )
    )
    ymarg = dense.groupBy("y").agg(F.sum("n").alias("ty"))
    sums = scored.agg(
        F.sum("n").alias("nn"),
        F.sum("c_term").alias("c_pairs"),
        F.sum("d_term").alias("d_pairs"),
    )
    t1 = xmarg.agg(
        F.expr("sum(tx * (tx - 1)) div 2").alias("n1")
    )
    t2 = ymarg.agg(
        F.expr("sum(ty * (ty - 1)) div 2").alias("n2")
    )
    return (
        sums.join(F.broadcast(t1))
        .join(F.broadcast(t2))
        .select(
            F.col("nn").alias("n_rows"),
            F.col("c_pairs"),
            F.col("d_pairs"),
            "n1",
            "n2",
            F.when(
                (F.expr("nn * (nn - 1) div 2") > F.col("n1"))
                & (F.expr("nn * (nn - 1) div 2") > F.col("n2")),
                F.floor(
                    (F.col("c_pairs") - F.col("d_pairs")).cast("double")
                    / F.sqrt(
                        (
                            F.expr("nn * (nn - 1) div 2") - F.col("n1")
                        ).cast("double")
                        * (
                            F.expr("nn * (nn - 1) div 2") - F.col("n2")
                        ).cast("double")
                    )
                    * 1000000
                    + F.lit(0.5)
                ),
            ).alias("tau_b_micro"),
        )
    )

def _stat_kendall_tau(spark, sf_dir):
    return kendall_tau(t(spark, sf_dir, "events"))

_KT_SQL = f"""
WITH cells AS (
  SELECT least(CAST(floor(value * 100 + 0.5) AS BIGINT) // 100,
               {KT_XMAX}) AS x,
         CAST(hour(ts) AS BIGINT) AS y,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
grid AS (
  SELECT CAST(u1.x AS BIGINT) AS x, CAST(u2.y AS BIGINT) AS y
  FROM unnest(range(0, {KT_XMAX} + 1)) AS u1(x),
       unnest(range(0, {KT_YMAX} + 1)) AS u2(y)
),
dense AS (
  SELECT grid.x, grid.y, COALESCE(n, 0) AS n
  FROM grid LEFT JOIN cells ON grid.x = cells.x AND grid.y = cells.y
),
cum2 AS (
  SELECT x, y, n,
         CAST(sum(sum_x) OVER (PARTITION BY x ORDER BY y) AS BIGINT) AS c2_le
  FROM (SELECT x, y, n,
               CAST(sum(n) OVER (PARTITION BY y ORDER BY x) AS BIGINT)
                   AS sum_x
        FROM dense)
),
xmarg AS (SELECT x, CAST(sum(n) AS BIGINT) AS tx FROM dense GROUP BY 1),
xcum AS (
  SELECT x, tx,
         CAST(sum(tx) OVER (ORDER BY x) - tx AS BIGINT) AS colcum_lt
  FROM xmarg
),
ymarg AS (SELECT y, CAST(sum(n) AS BIGINT) AS ty FROM dense GROUP BY 1),
scored AS (
  SELECT c.n,
         c.n * COALESCE(t.c2_le, 0) AS c_term,
         c.n * (xc.colcum_lt - COALESCE(u.c2_le, 0)) AS d_term
  FROM cells c
  LEFT JOIN cum2 t ON t.x = c.x - 1 AND t.y = c.y - 1
  LEFT JOIN cum2 u ON u.x = c.x - 1 AND u.y = c.y
  JOIN xcum xc ON xc.x = c.x
),
sums AS (
  SELECT CAST(sum(n) AS BIGINT) AS nn,
         CAST(sum(c_term) AS BIGINT) AS c_pairs,
         CAST(sum(d_term) AS BIGINT) AS d_pairs
  FROM scored
),
t1 AS (SELECT CAST(sum(tx * (tx - 1)) // 2 AS BIGINT) AS n1 FROM xmarg),
t2 AS (SELECT CAST(sum(ty * (ty - 1)) // 2 AS BIGINT) AS n2 FROM ymarg)
SELECT nn AS n_rows, c_pairs, d_pairs, n1, n2,
       CASE WHEN nn * (nn - 1) // 2 > n1 AND nn * (nn - 1) // 2 > n2
            THEN CAST(floor(CAST(c_pairs - d_pairs AS DOUBLE)
                       / sqrt(CAST(nn * (nn - 1) // 2 - n1 AS DOUBLE)
                              * CAST(nn * (nn - 1) // 2 - n2 AS DOUBLE))
                       * 1000000 + 0.5) AS BIGINT) END AS tau_b_micro
FROM sums, t1, t2
"""

def brown_forsythe(events):
    """Brown-Forsythe variance-homogeneity test (Levene with group
    MEDIANS, the robust default): F over the absolute deviations
    z = |x - median_g| across the event-type arms — the
    equal-variance gate before pooled t-tests, and a scale-drift alarm
    in its own right.

    Exactness: group medians are exact lower-median order statistics
    at the distinct-cents grain; z and its first moment stay int64;
    each group's SSB/SSW contribution is ONE double expression over
    exact int64 moments, micro-quantized per group before the k-term
    sums (the stat_anova_oneway rule). Scale shape: everything after
    the first shuffle runs at the (group x distinct-value) grain —
    bounded by the value domain — with within-group windows only;
    deviations are re-aggregated AT THAT GRAIN with multiplicities, so
    the fact table is scanned once."""
    from pyspark.sql import Window

    gv = (
        events.select(
            F.col("event_type").alias("g"), cents(F.col("value")).alias("v")
        )
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = gv.select(
        "g", "v", "cnt", F.sum("cnt").over(w).alias("cum")
    )
    ng = gv.groupBy("g").agg(F.sum("cnt").alias("n_g"))
    med = (
        cum.join(F.broadcast(ng), "g")
        .where(2 * F.col("cum") >= F.col("n_g"))
        .groupBy("g")
        .agg(F.min("v").alias("med"))
    )
    z = gv.join(F.broadcast(med), "g").select(
        "g", "cnt", F.abs(F.col("v") - F.col("med")).alias("z")
    )
    grp = z.groupBy("g").agg(
        F.sum("cnt").alias("n_g"),
        F.sum(F.col("cnt") * F.col("z")).alias("sz"),
        F.sum(F.col("cnt") * F.col("z") * F.col("z")).alias("szz"),
    )
    terms = grp.select(
        "g",
        "n_g",
        "sz",
        F.floor(
            F.col("sz").cast("double")
            * F.col("sz").cast("double")
            / F.col("n_g").cast("double")
            * 1000000
            + F.lit(0.5)
        ).alias("q_micro"),
        F.floor(
            (
                F.col("szz").cast("double")
                - F.col("sz").cast("double")
                * F.col("sz").cast("double")
                / F.col("n_g").cast("double")
            )
            * 1000000
            + F.lit(0.5)
        ).alias("ssw_micro"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("nn"),
        F.sum("sz").alias("sz_all"),
        F.sum("q_micro").alias("sq"),
        F.sum("ssw_micro").alias("ssw"),
    )
    return agg.select(
        F.col("k").alias("n_groups"),
        F.col("nn").alias("n_total"),
        (F.col("k") - 1).alias("df1"),
        (F.col("nn") - F.col("k")).alias("df2"),
        F.floor(
            (
                F.col("sq").cast("double")
                - F.col("sz_all").cast("double")
                * F.col("sz_all").cast("double")
                / F.col("nn").cast("double")
                * 1.0e6
            )
            * (F.col("nn") - F.col("k")).cast("double")
            / (
                F.col("ssw").cast("double")
                * (F.col("k") - 1).cast("double")
            )
            * 1000000
            + F.lit(0.5)
        ).alias("bf_f_micro"),
    )

def _stat_brown_forsythe(spark, sf_dir):
    return brown_forsythe(t(spark, sf_dir, "events"))

_BF_LEVENE_SQL = """
WITH gv AS (
  SELECT event_type AS g, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT g, v, cnt,
         CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum
  FROM gv
),
ng AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n_g FROM gv GROUP BY 1),
med AS (
  SELECT cum.g, min(v) AS med
  FROM cum JOIN ng ON cum.g = ng.g
  WHERE 2 * cum >= n_g GROUP BY 1
),
z AS (
  SELECT gv.g, cnt, abs(v - med) AS z
  FROM gv JOIN med ON gv.g = med.g
),
grp AS (
  SELECT g, CAST(sum(cnt) AS BIGINT) AS n_g,
         CAST(sum(cnt * z) AS BIGINT) AS sz,
         CAST(sum(cnt * z * z) AS BIGINT) AS szz
  FROM z GROUP BY 1
),
terms AS (
  SELECT g, n_g, sz,
         CAST(floor(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
                    / CAST(n_g AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
             AS q_micro,
         CAST(floor((CAST(szz AS DOUBLE)
                     - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
                       / CAST(n_g AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
             AS ssw_micro
  FROM grp
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n_g) AS BIGINT) AS nn,
         CAST(sum(sz) AS BIGINT) AS sz_all,
         CAST(sum(q_micro) AS BIGINT) AS sq,
         CAST(sum(ssw_micro) AS BIGINT) AS ssw
  FROM terms
)
SELECT k AS n_groups, nn AS n_total, k - 1 AS df1, nn - k AS df2,
       CAST(floor((CAST(sq AS DOUBLE)
                   - CAST(sz_all AS DOUBLE) * CAST(sz_all AS DOUBLE)
                     / CAST(nn AS DOUBLE) * 1.0e6)
                  * CAST(nn - k AS DOUBLE)
                  / (CAST(ssw AS DOUBLE) * CAST(k - 1 AS DOUBLE))
                  * 1000000 + 0.5) AS BIGINT) AS bf_f_micro
FROM agg
"""

NEYMAN_BUDGET = 10000

def neyman_alloc(events, budget: int = NEYMAN_BUDGET):
    """Neyman-optimal stratified sample allocation (Neyman 1934):
    allocate a fixed budget across strata proportionally to N_h * S_h
    (stratum size times value stddev), with Hamilton largest-remainder
    integer rounding — the survey/eval-set design step that minimizes
    estimator variance for a fixed labeling budget.

    Exactness: N_h and the moment sums are int64; the per-stratum
    weight is a deterministic double expression on exact ints, then
    QUANTIZED to an int64 cent-grain weight BEFORE the cross-strata
    total — summing raw doubles across strata was the engine's one
    order-dependent aggregate (Spark's partial-agg combine order could
    shift wtot by an ulp and flip a floor()/remainder rank at a tie:
    the r10 flake, alloc 1869 vs 1868). Integer weight sums are
    order-independent, and every downstream share/remainder is a
    deterministic double expression on the same ints in both engines.
    The final integer allocation comes from floor + a remainder rank
    computed by a triangular self-join at the bounded stratum grain
    (no window)."""
    grp = (
        events.select(
            F.col("event_type").alias("g"), cents(F.col("value")).alias("v")
        )
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_h"),
            F.sum("v").alias("sv"),
            F.sum(F.col("v") * F.col("v")).alias("svv"),
        )
        .select(
            "g",
            "n_h",
            # cent-grain integer weight: deterministic double math on
            # exact ints, floored half-up to int64 so the cross-strata
            # total below is an ORDER-INDEPENDENT integer sum (a raw
            # double sum could flip a downstream floor on combine
            # order). Relative quantization error <= 0.5/wgt — far
            # below one allocation unit at any realistic budget.
            # n_h == 1 guard: a single-row stratum has undefined sample
            # variance (0/0 -> NaN; Spark's floor+cast nulls it while
            # DuckDB's BIGINT cast errors — divergent failure modes).
            # Zero weight is the total, engine-agreed semantics: no
            # variance information -> no Neyman share.
            F.when(
                F.col("n_h") > 1,
                F.floor(
                    F.col("n_h").cast("double")
                    * F.sqrt(
                        (
                            F.col("n_h").cast("double")
                            * F.col("svv").cast("double")
                            - F.col("sv").cast("double")
                            * F.col("sv").cast("double")
                        )
                        / (
                            F.col("n_h").cast("double")
                            * (F.col("n_h") - 1).cast("double")
                        )
                    )
                    + F.lit(0.5)
                ).cast("long"),
            ).otherwise(F.lit(0).cast("long")).alias("wgt"),
        )
    )
    # greatest(.., 1) guards the all-degenerate corner (every stratum
    # variance rounding to zero weight) from a 0/0 NaN cascade
    tot = grp.agg(
        F.greatest(F.sum("wgt"), F.lit(1).cast("long")).alias("wtot")
    )
    shares = grp.join(F.broadcast(tot)).select(
        "g",
        "n_h",
        F.floor(
            F.lit(budget) * F.col("wgt").cast("double") / F.col("wtot").cast("double")
        ).alias("base"),
        (
            F.lit(budget) * F.col("wgt").cast("double") / F.col("wtot").cast("double")
            - F.floor(
                F.lit(budget)
                * F.col("wgt").cast("double")
                / F.col("wtot").cast("double")
            )
        ).alias("rem"),
        F.floor(
            F.col("wgt").cast("double") / F.col("wtot").cast("double") * 1000000
            + F.lit(0.5)
        ).alias("share_micro"),
    )
    short = shares.agg(
        (F.lit(budget) - F.sum("base")).alias("short")
    )
    ranked = (
        shares.select(F.col("g").alias("ga"), F.col("rem").alias("ra"))
        .join(
            shares.select(F.col("g").alias("gb"), F.col("rem").alias("rb")),
            (F.col("rb") > F.col("ra"))
            | ((F.col("rb") == F.col("ra")) & (F.col("gb") < F.col("ga"))),
            "left",
        )
        .groupBy("ga", "ra")
        .agg(F.count(F.col("gb")).alias("n_ahead"))
        .select(F.col("ga").alias("g"), "n_ahead")
    )
    return (
        shares.join(ranked, "g")
        .join(F.broadcast(short))
        .select(
            "g",
            "n_h",
            "share_micro",
            (
                F.col("base")
                + F.when(F.col("n_ahead") < F.col("short"), 1).otherwise(0)
            ).cast("long").alias("alloc"),
        )
        .orderBy("g")
    )

def _sample_neyman_alloc(spark, sf_dir):
    return neyman_alloc(t(spark, sf_dir, "events"))

_NEYMAN_SQL = f"""
WITH grp AS (
  SELECT event_type AS g, CAST(count(*) AS BIGINT) AS n_h,
         CASE WHEN count(*) > 1 THEN
           CAST(floor(CAST(count(*) AS BIGINT) * sqrt(
             (CAST(count(*) AS BIGINT)
                * CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)
                           * CAST(floor(value * 100 + 0.5) AS BIGINT))
                       AS DOUBLE)
              - CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                * CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE))
             / (CAST(count(*) AS BIGINT)
                * CAST(count(*) - 1 AS DOUBLE))) + 0.5) AS BIGINT)
         ELSE CAST(0 AS BIGINT) END AS wgt
  FROM events GROUP BY 1
),
tot AS (SELECT GREATEST(CAST(sum(wgt) AS BIGINT), 1) AS wtot FROM grp),
shares AS (
  SELECT g, n_h,
         floor({NEYMAN_BUDGET} * CAST(wgt AS DOUBLE) / CAST(wtot AS DOUBLE))
             AS base,
         {NEYMAN_BUDGET} * CAST(wgt AS DOUBLE) / CAST(wtot AS DOUBLE)
             - floor({NEYMAN_BUDGET} * CAST(wgt AS DOUBLE)
                     / CAST(wtot AS DOUBLE)) AS rem,
         CAST(floor(CAST(wgt AS DOUBLE) / CAST(wtot AS DOUBLE) * 1000000
                    + 0.5) AS BIGINT) AS share_micro
  FROM grp, tot
),
short AS (
  SELECT CAST({NEYMAN_BUDGET} - sum(base) AS BIGINT) AS short FROM shares
),
ranked AS (
  SELECT a.g, CAST(count(b.g) AS BIGINT) AS n_ahead
  FROM shares a LEFT JOIN shares b
    ON b.rem > a.rem OR (b.rem = a.rem AND b.g < a.g)
  GROUP BY a.g
)
SELECT shares.g, n_h, share_micro,
       CAST(base + CASE WHEN n_ahead < short THEN 1 ELSE 0 END AS BIGINT)
           AS alloc
FROM shares JOIN ranked ON shares.g = ranked.g, short
ORDER BY shares.g
"""

LB_MAX_LAG = 6

def ljung_box(events, max_lag: int = LB_MAX_LAG):
    """Ljung-Box portmanteau test over the hourly value series:
    calendar-lag autocorrelations r_1..r_h and the Q statistic
    n(n+2) * sum r_k^2/(n-k) — the is-this-white-noise gate run on
    forecast residuals and on the stream's own volume series.

    Exactness: each lag's numerator expands around the exact rational
    mean (sy/n), so it needs only int64 sums (sum y_t*y_{t-k} and the
    overlap head/tail sums); r_k micro-quantizes per lag and Q sums the
    quantized lags. Scale shape: lags are EQUI self-joins on
    (hidx - k) at the calendar-bounded hour grain — no window at all —
    and the k lags expand by the literal max_lag factor before one
    grouped aggregate."""
    hourly = (
        events.select(
            F.expr("unix_micros(ts) div 3600000000").alias("hidx"),
            cents(F.col("value")).alias("cts"),
        )
        .groupBy("hidx")
        .agg(F.expr("sum(cts) div 100").alias("y"))
    )
    g = hourly.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    lags = hourly.select(
        "hidx",
        "y",
        F.explode(
            F.array([F.lit(k) for k in range(1, max_lag + 1)])
        ).alias("k"),
    )
    paired = lags.alias("a").join(
        hourly.alias("b"),
        F.expr("a.hidx - a.k = b.hidx"),
    ).select(
        F.col("a.k").alias("k"),
        F.col("a.y").alias("yt"),
        F.col("b.y").alias("ytk"),
    )
    per_k = paired.groupBy("k").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.col("yt") * F.col("ytk")).alias("ck"),
        F.sum("yt").alias("sh"),
        F.sum("ytk").alias("st"),
    )
    rk = (
        per_k.join(F.broadcast(g))
        .select(
            "k",
            "m",
            F.floor(
                (
                    F.col("ck").cast("double")
                    - F.col("sy").cast("double")
                    / F.col("n").cast("double")
                    * (F.col("sh") + F.col("st")).cast("double")
                    + F.col("m").cast("double")
                    * F.col("sy").cast("double")
                    * F.col("sy").cast("double")
                    / F.col("n").cast("double")
                    / F.col("n").cast("double")
                )
                / (
                    F.col("syy").cast("double")
                    - F.col("sy").cast("double")
                    * F.col("sy").cast("double")
                    / F.col("n").cast("double")
                )
                * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("r_micro"),
            "n",
        )
    )
    q = rk.agg(
        F.floor(
            F.sum(
                F.col("r_micro").cast("double")
                * F.col("r_micro").cast("double")
                / 1.0e6
                / (F.col("n") - F.col("k")).cast("double")
            )
            * F.expr("any_value(n * (n + 2))").cast("double")
            / 1.0e6
            * 1000000
            + F.lit(0.5)
        ).alias("q_lb_micro")
    )
    return (
        rk.join(F.broadcast(q))
        .select("k", "m", "r_micro", "q_lb_micro")
        .orderBy("k")
    )

def _ts_ljung_box(spark, sf_dir):
    return ljung_box(t(spark, sf_dir, "events"))

_LB_SQL = f"""
WITH hourly AS (
  SELECT epoch_us(ts) // 3600000000 AS hidx,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             // 100 AS y
  FROM events GROUP BY 1
),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM hourly
),
paired AS (
  SELECT u.k, a.y AS yt, b.y AS ytk
  FROM hourly a, unnest(range(1, {LB_MAX_LAG} + 1)) AS u(k)
  JOIN hourly b ON a.hidx - u.k = b.hidx
),
per_k AS (
  SELECT k, CAST(count(*) AS BIGINT) AS m,
         CAST(sum(yt * ytk) AS BIGINT) AS ck,
         CAST(sum(yt) AS BIGINT) AS sh, CAST(sum(ytk) AS BIGINT) AS st
  FROM paired GROUP BY 1
),
rk AS (
  SELECT CAST(k AS BIGINT) AS k, m,
         CAST(floor((CAST(ck AS DOUBLE)
                     - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                       * CAST(sh + st AS DOUBLE)
                     + CAST(m AS DOUBLE) * CAST(sy AS DOUBLE)
                       * CAST(sy AS DOUBLE)
                       / CAST(n AS DOUBLE) / CAST(n AS DOUBLE))
                    / (CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                         / CAST(n AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT) AS r_micro,
         n
  FROM per_k, g
),
q AS (
  SELECT CAST(floor(sum(CAST(r_micro AS DOUBLE) * CAST(r_micro AS DOUBLE)
                        / 1.0e6 / CAST(n - k AS DOUBLE))
                    * CAST(any_value(n * (n + 2)) AS DOUBLE) / 1.0e6
                    * 1000000 + 0.5) AS BIGINT) AS q_lb_micro
  FROM rk
)
SELECT k, m, r_micro, q_lb_micro FROM rk, q ORDER BY k
"""

def spearman_corr(events):
    """Spearman rank correlation (tie-averaged ranks) between value
    (dollar buckets) and hour-of-day — the monotone-association
    companion to stat_kendall_tau, sensitive to different alternatives.

    Ranks come from margin prefix sums at the bounded bucket grain
    (average rank of a tie class = cum_lt + (t+1)/2, carried DOUBLED to
    stay int64); each cell's covariance/variance contribution is one
    double expression over exact ints, micro-quantized per cell
    (normalized ranks in [0,1], so terms are O(n_cell) — no n^3 blowup
    at any scale). One shuffle to the cell grid; margins and prefix
    sums are triangular joins at the literal domain grain."""
    cells = (
        events.select(
            F.least(
                F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT) div 100"),
                F.lit(KT_XMAX),
            ).alias("x"),
            F.expr("hour(ts)").cast("long").alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    def marg_ranks(col):
        m = cells.groupBy(col).agg(F.sum("n").alias("t"))
        cum = (
            m.select(F.col(col).alias("a"), F.col("t").alias("ta"))
            .join(
                F.broadcast(
                    m.select(F.col(col).alias("b"), F.col("t").alias("tb"))
                ),
                F.col("b") < F.col("a"),
                "left",
            )
            .groupBy("a", "ta")
            .agg(F.coalesce(F.sum("tb"), F.lit(0)).alias("lt"))
        )
        # doubled average rank: 2*lt + t + 1 (int64)
        return cum.select(
            F.col("a").alias(col),
            (2 * F.col("lt") + F.col("ta") + 1).alias(f"r2_{col}"),
        )

    rx = marg_ranks("x")
    ry = marg_ranks("y")
    tot = cells.agg(F.sum("n").alias("nn"))
    terms = (
        cells.join(F.broadcast(rx), "x")
        .join(F.broadcast(ry), "y")
        .join(F.broadcast(tot))
        .select(
            # normalized centered ranks u = r2/(2n) - (n+1)/(2n)
            F.floor(
                F.col("n").cast("double")
                * (
                    F.col("r2_x").cast("double")
                    - (F.col("nn") + 1).cast("double")
                )
                / (2.0 * F.col("nn").cast("double"))
                * (
                    F.col("r2_y").cast("double")
                    - (F.col("nn") + 1).cast("double")
                )
                / (2.0 * F.col("nn").cast("double"))
                * 1000000
                + F.lit(0.5)
            ).alias("sxy_micro"),
            F.floor(
                F.col("n").cast("double")
                * (
                    (
                        F.col("r2_x").cast("double")
                        - (F.col("nn") + 1).cast("double")
                    )
                    / (2.0 * F.col("nn").cast("double"))
                )
                * (
                    (
                        F.col("r2_x").cast("double")
                        - (F.col("nn") + 1).cast("double")
                    )
                    / (2.0 * F.col("nn").cast("double"))
                )
                * 1000000
                + F.lit(0.5)
            ).alias("sxx_micro"),
            F.floor(
                F.col("n").cast("double")
                * (
                    (
                        F.col("r2_y").cast("double")
                        - (F.col("nn") + 1).cast("double")
                    )
                    / (2.0 * F.col("nn").cast("double"))
                )
                * (
                    (
                        F.col("r2_y").cast("double")
                        - (F.col("nn") + 1).cast("double")
                    )
                    / (2.0 * F.col("nn").cast("double"))
                )
                * 1000000
                + F.lit(0.5)
            ).alias("syy_micro"),
            "nn",
        )
    )
    agg = terms.groupBy("nn").agg(
        F.sum("sxy_micro").alias("sxy"),
        F.sum("sxx_micro").alias("sxx"),
        F.sum("syy_micro").alias("syy"),
    )
    return agg.select(
        F.col("nn").alias("n_rows"),
        "sxy",
        "sxx",
        "syy",
        F.when(
            (F.col("sxx") > 0) & (F.col("syy") > 0),
            F.floor(
                F.col("sxy").cast("double")
                / F.sqrt(
                    F.col("sxx").cast("double") * F.col("syy").cast("double")
                )
                * 1000000
                + F.lit(0.5)
            ),
        ).alias("rho_micro"),
    )

def _stat_spearman_corr(spark, sf_dir):
    return spearman_corr(t(spark, sf_dir, "events"))

_SPEAR_SQL = f"""
WITH cells AS (
  SELECT least(CAST(floor(value * 100 + 0.5) AS BIGINT) // 100,
               {KT_XMAX}) AS x,
         CAST(hour(ts) AS BIGINT) AS y,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
mx AS (SELECT x, CAST(sum(n) AS BIGINT) AS t FROM cells GROUP BY 1),
rx AS (
  SELECT x, CAST(2 * (sum(t) OVER (ORDER BY x) - t) + t + 1 AS BIGINT)
             AS r2_x
  FROM mx
),
my AS (SELECT y, CAST(sum(n) AS BIGINT) AS t FROM cells GROUP BY 1),
ry AS (
  SELECT y, CAST(2 * (sum(t) OVER (ORDER BY y) - t) + t + 1 AS BIGINT)
             AS r2_y
  FROM my
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells),
terms AS (
  SELECT
    CAST(floor(CAST(n AS DOUBLE)
               * (CAST(r2_x AS DOUBLE) - CAST(nn + 1 AS DOUBLE))
                 / (2.0 * CAST(nn AS DOUBLE))
               * (CAST(r2_y AS DOUBLE) - CAST(nn + 1 AS DOUBLE))
                 / (2.0 * CAST(nn AS DOUBLE))
               * 1000000 + 0.5) AS BIGINT) AS sxy_micro,
    CAST(floor(CAST(n AS DOUBLE)
               * ((CAST(r2_x AS DOUBLE) - CAST(nn + 1 AS DOUBLE))
                  / (2.0 * CAST(nn AS DOUBLE)))
               * ((CAST(r2_x AS DOUBLE) - CAST(nn + 1 AS DOUBLE))
                  / (2.0 * CAST(nn AS DOUBLE)))
               * 1000000 + 0.5) AS BIGINT) AS sxx_micro,
    CAST(floor(CAST(n AS DOUBLE)
               * ((CAST(r2_y AS DOUBLE) - CAST(nn + 1 AS DOUBLE))
                  / (2.0 * CAST(nn AS DOUBLE)))
               * ((CAST(r2_y AS DOUBLE) - CAST(nn + 1 AS DOUBLE))
                  / (2.0 * CAST(nn AS DOUBLE)))
               * 1000000 + 0.5) AS BIGINT) AS syy_micro,
    nn
  FROM cells JOIN rx USING (x) JOIN ry USING (y), tot
),
agg AS (
  SELECT nn, CAST(sum(sxy_micro) AS BIGINT) AS sxy,
         CAST(sum(sxx_micro) AS BIGINT) AS sxx,
         CAST(sum(syy_micro) AS BIGINT) AS syy
  FROM terms GROUP BY nn
)
SELECT nn AS n_rows, sxy, sxx, syy,
       CASE WHEN sxx > 0 AND syy > 0
            THEN CAST(floor(CAST(sxy AS DOUBLE)
                            / sqrt(CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE))
                            * 1000000 + 0.5) AS BIGINT) END AS rho_micro
FROM agg
"""

def runs_test(events):
    """Wald-Wolfowitz runs test on the hourly series: signs relative to
    the series' exact lower median, runs counted by calendar-adjacency
    (an equi self-join on hidx-1 — consecutive PRESENT hours), and the
    large-sample z-score from the exact (n_plus, n_minus, n_runs)
    triple — the randomness check behind is-my-metric-oscillating
    alarms.

    Exactness: the median is an exact order statistic, sign/run counts
    are int64, and z is one micro-quantized double expression over
    them. All work at the calendar-bounded hour grain."""
    from pyspark.sql import Window

    hourly = (
        events.select(
            F.expr("unix_micros(ts) div 3600000000").alias("hidx"),
            cents(F.col("value")).alias("cts"),
        )
        .groupBy("hidx")
        .agg(F.sum("cts").alias("y"))
    )
    # exact lower median of y over hours (value-grain cum)
    vg = hourly.groupBy("y").agg(F.count(F.lit(1)).alias("cnt"))
    n1 = vg.agg(F.sum("cnt").alias("n"))
    cumv = (
        vg.select(F.col("y").alias("a"), F.col("cnt").alias("ca"))
        .join(
            F.broadcast(vg.select(F.col("y").alias("b"), F.col("cnt").alias("cb"))),
            F.col("b") <= F.col("a"),
        )
        .groupBy("a")
        .agg(F.sum("cb").alias("cum"))
    )
    med = (
        cumv.join(F.broadcast(n1))
        .where(2 * F.col("cum") >= F.col("n"))
        .agg(F.min("a").alias("med"))
    )
    signed = hourly.join(F.broadcast(med)).select(
        "hidx", (F.col("y") > F.col("med")).alias("up")
    )
    # runs: sign changes across calendar-adjacent present hours
    adj = signed.alias("l").join(
        signed.alias("r"), F.expr("l.hidx + 1 = r.hidx")
    ).select(
        F.col("l.up").alias("u0"), F.col("r.up").alias("u1")
    )
    counts = signed.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("up"), 1).otherwise(0)).alias("n_plus"),
    )
    breaks = adj.agg(
        F.count(F.lit(1)).alias("n_adj"),
        F.sum(F.when(F.col("u0") != F.col("u1"), 1).otherwise(0)).alias(
            "n_changes"
        ),
    )
    # runs = segments over adjacency: n - n_adj components merge... a
    # run ends at every sign change AND at every calendar gap, so
    # n_runs = (n - n_adj) + n_changes  (gaps split runs by definition)
    return (
        counts.join(F.broadcast(breaks))
        .select(
            "n",
            "n_plus",
            (F.col("n") - F.col("n_plus")).alias("n_minus"),
            (F.col("n") - F.col("n_adj") + F.col("n_changes")).alias("n_runs"),
            F.floor(
                (
                    (
                        F.col("n") - F.col("n_adj") + F.col("n_changes")
                    ).cast("double")
                    - (
                        2.0
                        * F.col("n_plus").cast("double")
                        * (F.col("n") - F.col("n_plus")).cast("double")
                        / F.col("n").cast("double")
                        + 1.0
                    )
                )
                / F.sqrt(
                    2.0
                    * F.col("n_plus").cast("double")
                    * (F.col("n") - F.col("n_plus")).cast("double")
                    * (
                        2.0
                        * F.col("n_plus").cast("double")
                        * (F.col("n") - F.col("n_plus")).cast("double")
                        - F.col("n").cast("double")
                    )
                    / (
                        F.col("n").cast("double")
                        * F.col("n").cast("double")
                        * (F.col("n") - 1).cast("double")
                    )
                )
                * 1000000
                + F.lit(0.5)
            ).alias("z_micro"),
        )
    )

def _stat_runs_test(spark, sf_dir):
    return runs_test(t(spark, sf_dir, "events"))

_RUNS_SQL = """
WITH hourly AS (
  SELECT epoch_us(ts) // 3600000000 AS hidx,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1
),
vg AS (SELECT y, CAST(count(*) AS BIGINT) AS cnt FROM hourly GROUP BY 1),
n1 AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vg),
cumv AS (
  SELECT y, CAST(sum(cnt) OVER (ORDER BY y) AS BIGINT) AS cum FROM vg
),
med AS (
  SELECT min(y) AS med FROM cumv, n1 WHERE 2 * cum >= n
),
signed AS (
  SELECT hidx, y > med AS up FROM hourly, med
),
adj AS (
  SELECT l.up AS u0, r.up AS u1
  FROM signed l JOIN signed r ON l.hidx + 1 = r.hidx
),
counts AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN up THEN 1 ELSE 0 END) AS BIGINT) AS n_plus
  FROM signed
),
brk AS (
  SELECT CAST(count(*) AS BIGINT) AS n_adj,
         CAST(sum(CASE WHEN u0 <> u1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changes
  FROM adj
)
SELECT n, n_plus, n - n_plus AS n_minus,
       n - n_adj + n_changes AS n_runs,
       CAST(floor((CAST(n - n_adj + n_changes AS DOUBLE)
                   - (2.0 * CAST(n_plus AS DOUBLE)
                      * CAST(n - n_plus AS DOUBLE) / CAST(n AS DOUBLE)
                      + 1.0))
                  / sqrt(2.0 * CAST(n_plus AS DOUBLE)
                         * CAST(n - n_plus AS DOUBLE)
                         * (2.0 * CAST(n_plus AS DOUBLE)
                            * CAST(n - n_plus AS DOUBLE)
                            - CAST(n AS DOUBLE))
                         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                            * CAST(n - 1 AS DOUBLE)))
                  * 1000000 + 0.5) AS BIGINT) AS z_micro
FROM counts, brk
"""

Z_ALPHA_MICRO = 1959964

Z_POWER_MICRO = 841621

def mde_power(events):
    """Minimum detectable effect for the hash-armed A/B split at
    alpha=0.05 (two-sided), power=0.80: MDE = (z_a + z_b) *
    sqrt(var * (1/n_a + 1/n_b)) over the cents metric — the
    experiment-sizing number every A/B platform prints next to its
    results. Normal quantiles enter as micro literals; variance comes
    from exact int64 moments; one user-grain shuffle and 1-row math."""
    per_user = (
        events.select(
            "user_id", cents(F.col("value")).alias("v")
        )
        .groupBy("user_id")
        .agg(F.sum("v").alias("m"))
        .select(
            "m",
            (
                _h32(F.concat(F.lit("arm:"), F.col("user_id").cast("string")))
                % 2
            ).alias("arm"),
        )
    )
    agg = per_user.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
        F.count(F.lit(1)).alias("n"),
        F.sum("m").alias("s"),
        F.sum(F.col("m") * F.col("m")).alias("ss"),
    )
    var = (
        F.col("n").cast("double") * F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double")
    ) / (
        F.col("n").cast("double") * (F.col("n") - 1).cast("double")
    )
    return agg.select(
        "n_a",
        "n_b",
        F.floor(var + F.lit(0.5)).alias("var_cents2"),
        F.floor(
            (F.lit(Z_ALPHA_MICRO + Z_POWER_MICRO).cast("double") / 1.0e6)
            * F.sqrt(
                var
                * (
                    1.0 / F.col("n_a").cast("double")
                    + 1.0 / F.col("n_b").cast("double")
                )
            )
            * 1000
            + F.lit(0.5)
        ).alias("mde_millicents"),
    )

def _stat_mde_power(spark, sf_dir):
    return mde_power(t(spark, sf_dir, "events"))

_MDE_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS m,
         ('0x' || substr(md5('arm:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
             % 2 AS arm
  FROM events GROUP BY user_id
),
agg AS (
  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(m) AS BIGINT) AS s,
         CAST(sum(m * m) AS BIGINT) AS ss
  FROM per_user
)
SELECT n_a, n_b,
       CAST(floor((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) + 0.5)
            AS BIGINT) AS var_cents2,
       CAST(floor(CAST({Z_ALPHA_MICRO + Z_POWER_MICRO} AS DOUBLE) / 1.0e6
                  * sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                         / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))
                         * (1.0 / CAST(n_a AS DOUBLE)
                            + 1.0 / CAST(n_b AS DOUBLE)))
                  * 1000 + 0.5) AS BIGINT) AS mde_millicents
FROM agg
"""

SRM_CHI2_CRIT_MICRO = 3841459  # chi2_{0.95, df=1}, micro literal

def srm_check(events):
    """Sample-ratio-mismatch guard: chi-square of the hash-armed user
    split against the designed 50/50 — the first thing a trustworthy
    A/B readout checks, because a biased split invalidates everything
    downstream. chi2 = (n_a - n_b)^2 / n exactly; the critical value is
    a micro literal. One user-grain aggregate, 1-row output."""
    arms = (
        events.select("user_id")
        .distinct()
        .select(
            (
                _h32(F.concat(F.lit("arm:"), F.col("user_id").cast("string")))
                % 2
            ).alias("arm")
        )
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
        )
    )
    return arms.select(
        "n_a",
        "n_b",
        F.floor(
            (F.col("n_a") - F.col("n_b")).cast("double")
            * (F.col("n_a") - F.col("n_b")).cast("double")
            / (F.col("n_a") + F.col("n_b")).cast("double")
            * 1000000
            + F.lit(0.5)
        ).alias("chi2_micro"),
        (
            F.floor(
                (F.col("n_a") - F.col("n_b")).cast("double")
                * (F.col("n_a") - F.col("n_b")).cast("double")
                / (F.col("n_a") + F.col("n_b")).cast("double")
                * 1000000
                + F.lit(0.5)
            )
            > SRM_CHI2_CRIT_MICRO
        ).alias("srm_flag"),
    )

def _stat_srm_check(spark, sf_dir):
    return srm_check(t(spark, sf_dir, "events"))

_SRM_SQL = f"""
WITH arms AS (
  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM (SELECT DISTINCT user_id,
               ('0x' || substr(md5('arm:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                   % 2 AS arm
        FROM events)
)
SELECT n_a, n_b,
       CAST(floor(CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE)
                  / CAST(n_a + n_b AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
           AS chi2_micro,
       CAST(floor(CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE)
                  / CAST(n_a + n_b AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
           > {SRM_CHI2_CRIT_MICRO} AS srm_flag
FROM arms
"""

WINSOR_PCT = 5  # clip at p05 / p95

def winsorized_mean(events, pct: int = WINSOR_PCT):
    """Winsorized and trimmed means of the value stream per event type:
    clip (or drop) beyond the EXACT p05/p95 order statistics — the
    robust location estimates a metrics pipeline publishes beside the
    raw mean so a single whale or glitch cannot move the dashboard.

    Exactness: thresholds are exact lower order statistics from the
    per-group distinct-value cumulative (windows partitioned by group
    at the value-domain grain); clipped sums stay int64 cents and the
    means are the only quantized divisions. One shuffle to the
    (group x distinct-value) grain, everything else grain-local."""
    from pyspark.sql import Window

    gv = (
        events.select(
            F.col("event_type").alias("g"), cents(F.col("value")).alias("v")
        )
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = gv.select("g", "v", "cnt", F.sum("cnt").over(w).alias("cum"))
    ng = gv.groupBy("g").agg(F.sum("cnt").alias("n_g"))
    lo = (
        cum.join(F.broadcast(ng), "g")
        .where(100 * F.col("cum") >= pct * F.col("n_g"))
        .groupBy("g")
        .agg(F.min("v").alias("lo"))
    )
    hi = (
        cum.join(F.broadcast(ng), "g")
        .where(100 * F.col("cum") >= (100 - pct) * F.col("n_g"))
        .groupBy("g")
        .agg(F.min("v").alias("hi"))
    )
    clipped = (
        gv.join(F.broadcast(lo), "g")
        .join(F.broadcast(hi), "g")
        .select(
            "g",
            "cnt",
            "lo",
            "hi",
            F.greatest(F.least(F.col("v"), F.col("hi")), F.col("lo")).alias(
                "vw"
            ),
            F.when(
                (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi")),
                F.col("v"),
            ).alias("vt"),
        )
    )
    return (
        clipped.groupBy("g", "lo", "hi")
        .agg(
            F.sum("cnt").alias("n"),
            F.expr("(10 * sum(cnt * vw)) div sum(cnt)").alias(
                "winsor_mean_millicent"
            ),
            F.expr(
                "(10 * sum(CASE WHEN vt IS NOT NULL THEN cnt * vt END))"
                " div sum(CASE WHEN vt IS NOT NULL THEN cnt END)"
            ).alias("trim_mean_millicent"),
        )
        .select(
            F.col("g").alias("event_type"),
            "n",
            F.col("lo").alias("p05_cents"),
            F.col("hi").alias("p95_cents"),
            "winsor_mean_millicent",
            "trim_mean_millicent",
        )
        .orderBy("event_type")
    )

def _agg_winsorized_mean(spark, sf_dir):
    return winsorized_mean(t(spark, sf_dir, "events"))

_WINSOR_SQL = f"""
WITH gv AS (
  SELECT event_type AS g, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT g, v, cnt,
         CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum
  FROM gv
),
ng AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n_g FROM gv GROUP BY 1),
lo AS (
  SELECT cum.g, min(v) AS lo FROM cum JOIN ng ON cum.g = ng.g
  WHERE 100 * cum >= {WINSOR_PCT} * n_g GROUP BY 1
),
hi AS (
  SELECT cum.g, min(v) AS hi FROM cum JOIN ng ON cum.g = ng.g
  WHERE 100 * cum >= {100 - WINSOR_PCT} * n_g GROUP BY 1
),
clipped AS (
  SELECT gv.g, cnt, lo, hi,
         greatest(least(v, hi), lo) AS vw,
         CASE WHEN v >= lo AND v <= hi THEN v END AS vt
  FROM gv JOIN lo ON gv.g = lo.g JOIN hi ON gv.g = hi.g
)
SELECT g AS event_type, CAST(sum(cnt) AS BIGINT) AS n,
       lo AS p05_cents, hi AS p95_cents,
       (10 * CAST(sum(cnt * vw) AS BIGINT)) // CAST(sum(cnt) AS BIGINT)
           AS winsor_mean_millicent,
       (10 * CAST(sum(CASE WHEN vt IS NOT NULL THEN cnt * vt END) AS BIGINT))
           // CAST(sum(CASE WHEN vt IS NOT NULL THEN cnt END) AS BIGINT)
           AS trim_mean_millicent
FROM clipped GROUP BY g, lo, hi ORDER BY event_type
"""

PACF_LAGS = 4

def pacf_levinson(events):
    """Partial autocorrelations phi_kk for lags 1..4 via the
    Durbin-Levinson recursion UNROLLED over the micro-quantized
    calendar-lag autocorrelations of ts_ljung_box — the AR-order
    selection plot, computed without any sequential state: every
    recursion level is a fixed arithmetic DAG on <= 4 scalars, each phi
    micro-quantized before the next level uses it (so both engines
    recurse on identical rationals). Lags with no calendar pair yield
    no row."""
    rk = ljung_box(events, max_lag=PACF_LAGS).select("k", "r_micro")
    wide = rk.groupBy().pivot("k", list(range(1, PACF_LAGS + 1))).agg(
        F.first("r_micro")
    )
    # column names "1".."4" (micro ints); recurse in micro space
    q = "floor(({expr}) * 1000000 + 0.5)"

    def c(name):
        return f"(CAST(`{name}` AS DOUBLE) / 1.0e6)"

    f11 = c("1")
    lvl = wide.selectExpr(
        "*",
        q.format(expr=f11) + " AS f11",
    )
    f22 = (
        f"((({c('2')}) - (f11/1e6) * ({c('1')}))"
        f" / (1.0 - (f11/1e6) * ({c('1')})))"
    )
    lvl = lvl.selectExpr("*", q.format(expr=f22) + " AS f22")
    f21 = "((f11/1e6) - (f22/1e6) * (f11/1e6))"
    lvl = lvl.selectExpr("*", q.format(expr=f21) + " AS f21")
    f33 = (
        f"((({c('3')}) - (f21/1e6) * ({c('2')}) - (f22/1e6) * ({c('1')}))"
        f" / (1.0 - (f21/1e6) * ({c('1')}) - (f22/1e6) * ({c('2')})))"
    )
    lvl = lvl.selectExpr("*", q.format(expr=f33) + " AS f33")
    f31 = "((f21/1e6) - (f33/1e6) * (f22/1e6))"
    f32 = "((f22/1e6) - (f33/1e6) * (f21/1e6))"
    lvl = lvl.selectExpr(
        "*", q.format(expr=f31) + " AS f31", q.format(expr=f32) + " AS f32"
    )
    f44 = (
        f"((({c('4')}) - (f31/1e6) * ({c('3')}) - (f32/1e6) * ({c('2')})"
        f" - (f33/1e6) * ({c('1')}))"
        f" / (1.0 - (f31/1e6) * ({c('1')}) - (f32/1e6) * ({c('2')})"
        f" - (f33/1e6) * ({c('3')})))"
    )
    lvl = lvl.selectExpr("*", q.format(expr=f44) + " AS f44")
    out = lvl.selectExpr(
        "stack(4, 1, CAST(f11 AS BIGINT), 2, CAST(f22 AS BIGINT),"
        " 3, CAST(f33 AS BIGINT), 4, CAST(f44 AS BIGINT))"
        " AS (lag, pacf_micro)"
    )
    return out.select(
        F.col("lag").cast("long").alias("lag"), "pacf_micro"
    ).orderBy("lag")

def _ts_pacf_levinson(spark, sf_dir):
    return pacf_levinson(t(spark, sf_dir, "events"))

def _pacf_sql() -> str:
    # mirror of the unrolled recursion over the ljung_box rk CTEs
    rk_inner = _LB_SQL.replace(
        f"range(1, {LB_MAX_LAG} + 1)", f"range(1, {PACF_LAGS} + 1)"
    )
    # strip the final SELECT of _LB_SQL and rebuild on its rk CTE
    rk_cte = rk_inner[: rk_inner.rindex("SELECT k, m, r_micro")]
    q = "floor(({expr}) * 1000000 + 0.5)"
    r = {
        k: f"((SELECT CAST(r_micro AS DOUBLE) FROM rk WHERE k = {k}) / 1.0e6)"
        for k in range(1, 5)
    }
    f11q = q.format(expr=r[1])
    lines = [f"l1 AS (SELECT CAST({f11q} AS BIGINT) AS f11 FROM q)"]
    f22 = (
        f"(({r[2]} - (f11/1e6) * {r[1]}) / (1.0 - (f11/1e6) * {r[1]}))"
    )
    lines.append(
        f"l2 AS (SELECT f11, CAST({q.format(expr=f22)} AS BIGINT) AS f22"
        f" FROM l1)"
    )
    f21 = "((f11/1e6) - (f22/1e6) * (f11/1e6))"
    lines.append(
        f"l2b AS (SELECT *, CAST({q.format(expr=f21)} AS BIGINT) AS f21"
        f" FROM l2)"
    )
    f33 = (
        f"(({r[3]} - (f21/1e6) * {r[2]} - (f22/1e6) * {r[1]})"
        f" / (1.0 - (f21/1e6) * {r[1]} - (f22/1e6) * {r[2]}))"
    )
    lines.append(
        f"l3 AS (SELECT *, CAST({q.format(expr=f33)} AS BIGINT) AS f33"
        f" FROM l2b)"
    )
    f31 = "((f21/1e6) - (f33/1e6) * (f22/1e6))"
    f32 = "((f22/1e6) - (f33/1e6) * (f21/1e6))"
    lines.append(
        f"l3b AS (SELECT *, CAST({q.format(expr=f31)} AS BIGINT) AS f31,"
        f" CAST({q.format(expr=f32)} AS BIGINT) AS f32 FROM l3)"
    )
    f44 = (
        f"(({r[4]} - (f31/1e6) * {r[3]} - (f32/1e6) * {r[2]}"
        f" - (f33/1e6) * {r[1]})"
        f" / (1.0 - (f31/1e6) * {r[1]} - (f32/1e6) * {r[2]}"
        f" - (f33/1e6) * {r[3]}))"
    )
    lines.append(
        f"l4 AS (SELECT *, CAST({q.format(expr=f44)} AS BIGINT) AS f44"
        f" FROM l3b)"
    )
    return (
        rk_cte.rstrip().rstrip(",")
        + ",\n"
        + ",\n".join(lines)
        + """
SELECT CAST(u.lag AS BIGINT) AS lag,
       CASE u.lag WHEN 1 THEN f11 WHEN 2 THEN f22
                  WHEN 3 THEN f33 ELSE f44 END AS pacf_micro
FROM l4, unnest([1, 2, 3, 4]) AS u(lag)
ORDER BY lag
"""
    )

def logrank_test(events):
    """Two-sample log-rank test (Mantel-Haenszel) between the hash-armed
    user cohorts' lifetime distributions (lifetime = hours between a
    user's first and last event; every subject fails, no censoring —
    the events_survival_km convention): at every distinct failure time
    the observed arm-A failures compare against the hypergeometric
    expectation, and chi2 = (sum(O-E))^2 / sum(V) — the A/B test for
    "did the intervention change retention CURVES", which mean-based
    tests cannot see.

    Exactness: at-risk counts come from the reflected coarse-bucket
    prefix at the bounded duration grain; each time's O-E and variance
    terms are single double expressions over exact int64 counts,
    micro-quantized per time before the sums."""
    from pyspark.sql import Window

    per_user = (
        events.select("user_id", F.expr("unix_micros(ts)").alias("us"))
        .groupBy("user_id")
        .agg(
            F.expr("(max(us) - min(us)) div 3600000000").alias("dur_h")
        )
        .select(
            "dur_h",
            (
                _h32(F.concat(F.lit("arm:"), F.col("user_id").cast("string")))
                % 2
            ).alias("arm"),
        )
    )
    g = per_user.groupBy("dur_h").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("d1"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("d2"),
    )
    tot = g.agg(F.sum("d1").alias("n1"), F.sum("d2").alias("n2"))
    gb = g.withColumn("bkt", F.expr("dur_h div 64"))
    w = (
        Window.partitionBy("bkt")
        .orderBy("dur_h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = gb.select(
        "dur_h", "bkt", "d1", "d2",
        F.sum("d1").over(w).alias("c1_in"),
        F.sum("d2").over(w).alias("c2_in"),
    )
    btot = gb.groupBy("bkt").agg(
        F.sum("d1").alias("b1"), F.sum("d2").alias("b2")
    )
    offs = (
        btot.select(F.col("bkt").alias("k"))
        .join(
            F.broadcast(btot.select(F.col("bkt").alias("k2"), "b1", "b2")),
            F.col("k2") < F.col("k"),
        )
        .groupBy("k")
        .agg(F.sum("b1").alias("o1"), F.sum("b2").alias("o2"))
    )
    # at-risk just BEFORE time t: n_a - cum_lt = n_a - (cum_le - d_a)
    at_risk = (
        within.join(F.broadcast(offs), within.bkt == offs.k, "left")
        .join(F.broadcast(tot))
        .select(
            "dur_h", "d1", "d2",
            (
                F.col("n1")
                - (F.coalesce("o1", F.lit(0)) + F.col("c1_in") - F.col("d1"))
            ).alias("r1"),
            (
                F.col("n2")
                - (F.coalesce("o2", F.lit(0)) + F.col("c2_in") - F.col("d2"))
            ).alias("r2"),
            "n1", "n2",
        )
    )
    terms = at_risk.where(
        (F.col("r1") + F.col("r2") > 1)
    ).select(
        "n1",
        "n2",
        F.floor(
            (
                F.col("d1").cast("double")
                - (F.col("d1") + F.col("d2")).cast("double")
                * F.col("r1").cast("double")
                / (F.col("r1") + F.col("r2")).cast("double")
            )
            * 1000000
            + F.lit(0.5)
        ).alias("oe_micro"),
        F.floor(
            (
                (F.col("d1") + F.col("d2")).cast("double")
                * F.col("r1").cast("double")
                / (F.col("r1") + F.col("r2")).cast("double")
                * F.col("r2").cast("double")
                / (F.col("r1") + F.col("r2")).cast("double")
                * (
                    F.col("r1") + F.col("r2") - F.col("d1") - F.col("d2")
                ).cast("double")
                / (F.col("r1") + F.col("r2") - 1).cast("double")
            )
            * 1000000
            + F.lit(0.5)
        ).alias("v_micro"),
    )
    agg = terms.groupBy("n1", "n2").agg(
        F.count(F.lit(1)).alias("n_times"),
        F.sum("oe_micro").alias("soe"),
        F.sum("v_micro").alias("sv"),
    )
    return agg.select(
        "n1",
        "n2",
        "n_times",
        F.when(
            F.col("sv") > 0,
            F.floor(
                F.col("soe").cast("double")
                * F.col("soe").cast("double")
                / 1.0e6
                / F.col("sv").cast("double")
                * 1000000
                + F.lit(0.5)
            ),
        ).alias("chi2_micro"),
    )

def _stat_logrank_test(spark, sf_dir):
    return logrank_test(t(spark, sf_dir, "events"))

_LOGRANK_SQL = """
WITH per_user AS (
  SELECT (max(epoch_us(ts)) - min(epoch_us(ts))) // 3600000000 AS dur_h,
         ('0x' || substr(md5('arm:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
             % 2 AS arm
  FROM events GROUP BY user_id
),
g AS (
  SELECT dur_h,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d2
  FROM per_user GROUP BY 1
),
tot AS (
  SELECT CAST(sum(d1) AS BIGINT) AS n1, CAST(sum(d2) AS BIGINT) AS n2 FROM g
),
cum AS (
  SELECT dur_h, d1, d2,
         CAST(sum(d1) OVER (ORDER BY dur_h) AS BIGINT) AS c1,
         CAST(sum(d2) OVER (ORDER BY dur_h) AS BIGINT) AS c2
  FROM g
),
at_risk AS (
  SELECT dur_h, d1, d2,
         n1 - (c1 - d1) AS r1, n2 - (c2 - d2) AS r2, n1, n2
  FROM cum, tot
),
terms AS (
  SELECT n1, n2,
         CAST(floor((CAST(d1 AS DOUBLE)
                     - CAST(d1 + d2 AS DOUBLE) * CAST(r1 AS DOUBLE)
                       / CAST(r1 + r2 AS DOUBLE)) * 1000000 + 0.5)
              AS BIGINT) AS oe_micro,
         CAST(floor((CAST(d1 + d2 AS DOUBLE) * CAST(r1 AS DOUBLE)
                     / CAST(r1 + r2 AS DOUBLE)
                     * CAST(r2 AS DOUBLE) / CAST(r1 + r2 AS DOUBLE)
                     * CAST(r1 + r2 - d1 - d2 AS DOUBLE)
                     / CAST(r1 + r2 - 1 AS DOUBLE)) * 1000000 + 0.5)
              AS BIGINT) AS v_micro
  FROM at_risk WHERE r1 + r2 > 1
),
agg AS (
  SELECT n1, n2, CAST(count(*) AS BIGINT) AS n_times,
         CAST(sum(oe_micro) AS BIGINT) AS soe,
         CAST(sum(v_micro) AS BIGINT) AS sv
  FROM terms GROUP BY 1, 2
)
SELECT n1, n2, n_times,
       CASE WHEN sv > 0
            THEN CAST(floor(CAST(soe AS DOUBLE) * CAST(soe AS DOUBLE)
                            / 1.0e6 / CAST(sv AS DOUBLE)
                            * 1000000 + 0.5) AS BIGINT) END AS chi2_micro
FROM agg
"""


for _q in (
    QueryDef(
    "ts_changepoint_sse", _ts_changepoint_sse, _CP_SQL, ("ts",)
),
    QueryDef(
        "sample_kfold_assign", _sample_kfold_assign, _KFOLD_SQL, ("sample",)
    ),
    QueryDef(
    "stat_kendall_tau", _stat_kendall_tau, _KT_SQL, ("stat",)
),
    QueryDef(
    "stat_brown_forsythe", _stat_brown_forsythe, _BF_LEVENE_SQL, ("stat",)
),
    QueryDef(
        "sample_neyman_alloc", _sample_neyman_alloc, _NEYMAN_SQL, ("sample",)
    ),
    QueryDef(
    "ts_ljung_box", _ts_ljung_box, _LB_SQL, ("ts",)
),
    QueryDef(
    "stat_spearman_corr", _stat_spearman_corr, _SPEAR_SQL, ("stat",)
),
    QueryDef(
    "stat_runs_test", _stat_runs_test, _RUNS_SQL, ("stat",)
),
    QueryDef("stat_mde_power", _stat_mde_power, _MDE_SQL, ("stat",)),
    QueryDef("stat_srm_check", _stat_srm_check, _SRM_SQL, ("stat",)),
    QueryDef(
        "agg_winsorized_mean", _agg_winsorized_mean, _WINSOR_SQL, ("agg",)
    ),
    QueryDef(
    "ts_pacf_levinson", _ts_pacf_levinson, _pacf_sql(), ("ts",)
),
    QueryDef(
    "stat_logrank_test", _stat_logrank_test, _LOGRANK_SQL, ("stat",)
),
):
    R6B_QUERIES[_q.name] = _q

"""Round-6 families: distribution-comparison statistics (KS,
Mann-Whitney, chi-square independence, Benjamini-Hochberg FDR,
Poisson-bootstrap CI), feature engineering for model training
(scaling, target encoding, chi-square feature selection, one-hot),
text/corpus quality additions (Gopher rules, n-gram novelty), and
weighted reproducible sampling.

Exactness discipline (house rules, registry_util): every statistic is
either pure int64 arithmetic, or an IEEE-754 expression whose inputs
are exactly-representable int64 casts — both engines evaluate the
identical float expression tree, so value hashes cannot drift — and
every exported float is quantized ``floor(x*10^k + 0.5)/10^k``.

Reference parity note: the reference repo (pandas/requests ETL —
``services/fitbit/fitbit_utils.py``, ``services/strava/utils.py``) has
no statistics/feature layer; these extend SURVEY.md §2's LLM-pipeline
axis (A/B evaluation of data interventions, feature prep, corpus QA)
the same way the round-4/5 families do.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .ops.scale import truncate_lineage
from .registry_util import QueryDef, cents, t

# Two-sample split for the rank statistics: the A/B arms are two event
# types of the same value stream (the canonical "did the intervention
# move the metric distribution" question).
KS_A = "click"
KS_B = "view"

# Coarse-bucket width for the hierarchical prefix sum over the value
# grain: cents-values bucket into ~range/4096 coarse groups, so the
# coarse offset table is bounded by the VALUE DOMAIN (metadata-sized at
# any row count), never by row count.
KS_BUCKET = 4096

# Benjamini-Hochberg level: alpha = 0.05 exactly, expressed as the
# integer pair (1/alpha = 20) so the step-up test is pure int64
# cross-multiplication on nano-quantized p-values.
BH_INV_ALPHA = 20

# Poisson(1) bootstrap: inverse-CDF thresholds on a uniform 0..999999
# md5 draw.  cum P(k) * 1e6, k = 0..7; ties to the literal constants on
# BOTH engines, so replicate membership is bit-stable forever.
POISSON_CUM = (367879, 735759, 919699, 981012, 996340, 999406, 999917, 999990)
N_BOOT = 64

# Target-encoding smoothing pseudo-count (the standard m-estimate).
TE_SMOOTH = 10


def _h32(col):
    """Engine-portable 32-bit hash (md5 prefix as int64) — same literal
    definition as registry_r5/r5b, re-declared per family file so each
    file's SQL oracles pair with the Spark expression beside them."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _tok(col):
    return F.filter(F.split(col, " "), lambda x: x != "")


# ---------------------------------------------------------------------
# Shared machinery: two-sample cumulative counts at the cents-value
# grain, built with the HIERARCHICAL prefix sum (coarse-bucket offsets +
# within-bucket windows) so no partition-less window ever appears —
# the same scalable identity events_cumulative_distinct uses at the
# month grain.
# ---------------------------------------------------------------------


def _two_sample_cum(events):
    """Per distinct cents-value v of the A/B value stream:
    (v, a_cnt, b_cnt, cum_a_le, cum_b_le) with inclusive cumulative
    counts, plus broadcastable totals attached (n_a, n_b).

    Scale shape: one shuffle to the (distinct-value) grain — bounded by
    the value DOMAIN, not the row count — then windows only within
    coarse buckets; the coarse offset build is a self-join on a table
    whose size is domain/KS_BUCKET (metadata-sized)."""
    ab = events.where(F.col("event_type").isin(KS_A, KS_B)).select(
        cents(F.col("value")).alias("v"),
        F.when(F.col("event_type") == KS_A, 1).otherwise(0).alias("a"),
        F.when(F.col("event_type") == KS_B, 1).otherwise(0).alias("b"),
    )
    g = ab.groupBy("v").agg(
        F.sum("a").alias("a_cnt"), F.sum("b").alias("b_cnt")
    )
    g = g.withColumn("bkt", F.floor(F.col("v") / KS_BUCKET))
    w = (
        Window.partitionBy("bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = g.select(
        "v",
        "bkt",
        "a_cnt",
        "b_cnt",
        F.sum("a_cnt").over(w).alias("ca_in"),
        F.sum("b_cnt").over(w).alias("cb_in"),
    )
    btot = g.groupBy("bkt").agg(
        F.sum("a_cnt").alias("ba"), F.sum("b_cnt").alias("bb")
    )
    b_a = btot.select(F.col("bkt").alias("k"))
    b_b = btot.select(F.col("bkt").alias("k2"), "ba", "bb")
    offs = (
        b_a.join(b_b, b_b.k2 < b_a.k)
        .groupBy("k")
        .agg(F.sum("ba").alias("off_a"), F.sum("bb").alias("off_b"))
    )
    cum = (
        within.join(F.broadcast(offs), within.bkt == offs.k, "left")
        .select(
            "v",
            "a_cnt",
            "b_cnt",
            (F.col("ca_in") + F.coalesce("off_a", F.lit(0))).alias("cum_a_le"),
            (F.col("cb_in") + F.coalesce("off_b", F.lit(0))).alias("cum_b_le"),
        )
    )
    tot = cum.agg(
        F.sum("a_cnt").alias("n_a"), F.sum("b_cnt").alias("n_b")
    )
    return cum.join(F.broadcast(tot))


_TWO_SAMPLE_CTE = f"""
ab AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
         CASE WHEN event_type = '{KS_A}' THEN 1 ELSE 0 END AS a,
         CASE WHEN event_type = '{KS_B}' THEN 1 ELSE 0 END AS b
  FROM events WHERE event_type IN ('{KS_A}', '{KS_B}')
),
g AS (
  SELECT v, CAST(sum(a) AS BIGINT) AS a_cnt, CAST(sum(b) AS BIGINT) AS b_cnt
  FROM ab GROUP BY v
),
cum AS (
  SELECT v, a_cnt, b_cnt,
         CAST(sum(a_cnt) OVER (ORDER BY v) AS BIGINT) AS cum_a_le,
         CAST(sum(b_cnt) OVER (ORDER BY v) AS BIGINT) AS cum_b_le
  FROM g
),
tot AS (
  SELECT CAST(sum(a_cnt) AS BIGINT) AS n_a, CAST(sum(b_cnt) AS BIGINT) AS n_b
  FROM g
)
"""


# ----------------------------------------------------- KOLMOGOROV-SMIRNOV


def ks_two_sample(events):
    """Two-sample Kolmogorov-Smirnov D between the A and B value
    distributions, computed EXACTLY in integers: at every distinct
    cents-value v, D's numerator is |cum_a·n_b − cum_b·n_a| (int64),
    maximized with a deterministic argmax (smallest v attaining the
    max).  D itself is the one quantized division at the very end.

    This is the drift/intervention test a data pipeline runs between
    two corpus snapshots or A/B arms.  The naive formulation sorts the
    combined sample through one reducer; here the ECDF merge is the
    hierarchical prefix sum of ``_two_sample_cum`` — every shuffle is
    keyed on the bounded value domain."""
    cum = _two_sample_cum(events)
    d = cum.select(
        "n_a",
        "n_b",
        F.abs(
            F.col("cum_a_le") * F.col("n_b") - F.col("cum_b_le") * F.col("n_a")
        ).alias("d_num"),
        F.col("v"),
    )
    best = d.groupBy("n_a", "n_b").agg(
        F.max(F.struct(F.col("d_num"), (-F.col("v")).alias("nv"))).alias("m")
    )
    return best.select(
        "n_a",
        "n_b",
        F.col("m.d_num").alias("d_num"),
        (-F.col("m.nv")).alias("at_cents"),
        (
            F.floor(
                F.col("m.d_num")
                / (F.col("n_a") * F.col("n_b")).cast("double")
                * 1000000
                + F.lit(0.5)
            )
            / 1000000.0
        ).alias("ks_d6"),
    )


def _stat_ks_test(spark, sf_dir):
    return ks_two_sample(t(spark, sf_dir, "events"))


_KS_SQL = f"""
WITH {_TWO_SAMPLE_CTE},
d AS (
  SELECT cum.v,
         CAST(abs(cum_a_le * tot.n_b - cum_b_le * tot.n_a) AS BIGINT) AS d_num,
         tot.n_a, tot.n_b
  FROM cum, tot
)
SELECT n_a, n_b, d_num, v AS at_cents,
       floor(CAST(d_num AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
             * 1000000 + 0.5) / 1000000.0 AS ks_d6
FROM d ORDER BY d_num DESC, v ASC LIMIT 1
"""


# ------------------------------------------------------- MANN-WHITNEY U


def mannwhitney_u(events):
    """Mann-Whitney U (rank-sum) for the same A/B arms, tie-correct and
    EXACT: with per-distinct-value counts (a_v, b_v) and the strictly-
    below cumulative cum_b_lt, 2·U_A = Σ_v a_v · (2·cum_b_lt + b_v) —
    pure int64 (the ½ tie credit is carried as the doubled statistic).
    AUC = U/(n_a·n_b) is the probability a random A value exceeds a
    random B value — the effect size ML evals report.

    Same scale shape as the KS key: all heavy work at the bounded
    distinct-value grain."""
    cum = _two_sample_cum(events)
    per_v = cum.select(
        "n_a",
        "n_b",
        (
            F.col("a_cnt")
            * (2 * (F.col("cum_b_le") - F.col("b_cnt")) + F.col("b_cnt"))
        ).alias("u2_term"),
    )
    agg = per_v.groupBy("n_a", "n_b").agg(F.sum("u2_term").alias("u2_a"))
    return agg.select(
        "n_a",
        "n_b",
        "u2_a",
        (2 * F.col("n_a") * F.col("n_b") - F.col("u2_a")).alias("u2_b"),
        (
            F.floor(
                F.col("u2_a")
                / (2.0 * F.col("n_a") * F.col("n_b"))
                * 1000000
                + F.lit(0.5)
            )
            / 1000000.0
        ).alias("auc6"),
    )


def _stat_mannwhitney_u(spark, sf_dir):
    return mannwhitney_u(t(spark, sf_dir, "events"))


_MWU_SQL = f"""
WITH {_TWO_SAMPLE_CTE},
u AS (
  SELECT tot.n_a, tot.n_b,
         CAST(sum(a_cnt * (2 * (cum_b_le - b_cnt) + b_cnt)) AS BIGINT) AS u2_a
  FROM cum, tot GROUP BY tot.n_a, tot.n_b
)
SELECT n_a, n_b, u2_a,
       CAST(2 * n_a * n_b - u2_a AS BIGINT) AS u2_b,
       floor(CAST(u2_a AS DOUBLE) / (2.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
             * 1000000 + 0.5) / 1000000.0 AS auc6
FROM u
"""


# ----------------------------------------------- CHI-SQUARE INDEPENDENCE


def chi2_independence(orders):
    """Chi-square independence audit of o_orderpriority × o_orderstatus
    at the CELL grain: observed count, margins, expected count, and the
    cell's chi-square contribution.  Per-cell output deliberately — the
    residual table is what an analyst reads, and it avoids any
    order-dependent float total (the scalar chi² is the oracle-side sum
    of the quantized contributions, which callers can fold exactly).

    Exactness: the contribution is ((obs·T − r·c)² )/(T·r·c) — the
    numerator root obs·T − r·c is exact int64; both engines square and
    divide the identical doubles.  Scale shape: one map-side-combinable
    groupBy to the (priority, status) grain (≤15 cells at any data
    size); margins and the total ride in as broadcast aggregates."""
    cells = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("obs")
    )
    rows = cells.groupBy("o_orderpriority").agg(F.sum("obs").alias("row_tot"))
    cols = cells.groupBy("o_orderstatus").agg(F.sum("obs").alias("col_tot"))
    tot = cells.agg(F.sum("obs").alias("t_tot"))
    j = (
        cells.join(F.broadcast(rows), "o_orderpriority")
        .join(F.broadcast(cols), "o_orderstatus")
        .join(F.broadcast(tot))
    )
    n = F.col("obs") * F.col("t_tot") - F.col("row_tot") * F.col("col_tot")
    denom = (
        F.col("t_tot") * F.col("row_tot") * F.col("col_tot")
    ).cast("double")
    return j.select(
        "o_orderpriority",
        "o_orderstatus",
        "obs",
        "row_tot",
        "col_tot",
        (
            F.floor(
                F.col("row_tot")
                * F.col("col_tot")
                / F.col("t_tot").cast("double")
                * 1000000
                + F.lit(0.5)
            )
            / 1000000.0
        ).alias("exp6"),
        (
            F.floor(
                n.cast("double") * n.cast("double") / denom * 1000000
                + F.lit(0.5)
            )
            / 1000000.0
        ).alias("contrib6"),
    ).orderBy("o_orderpriority", "o_orderstatus")


def _stat_chi2_independence(spark, sf_dir):
    return chi2_independence(t(spark, sf_dir, "orders"))


_CHI2_SQL = """
WITH cells AS (
  SELECT o_orderpriority, o_orderstatus, CAST(count(*) AS BIGINT) AS obs
  FROM orders GROUP BY 1, 2
),
r AS (SELECT o_orderpriority, CAST(sum(obs) AS BIGINT) AS row_tot FROM cells GROUP BY 1),
c AS (SELECT o_orderstatus, CAST(sum(obs) AS BIGINT) AS col_tot FROM cells GROUP BY 1),
tt AS (SELECT CAST(sum(obs) AS BIGINT) AS t_tot FROM cells)
SELECT cells.o_orderpriority, cells.o_orderstatus, obs, row_tot, col_tot,
       floor(CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) / CAST(t_tot AS DOUBLE)
             * 1000000 + 0.5) / 1000000.0 AS exp6,
       floor(CAST(obs * t_tot - row_tot * col_tot AS DOUBLE)
             * CAST(obs * t_tot - row_tot * col_tot AS DOUBLE)
             / CAST(t_tot * row_tot * col_tot AS DOUBLE)
             * 1000000 + 0.5) / 1000000.0 AS contrib6
FROM cells JOIN r USING (o_orderpriority) JOIN c USING (o_orderstatus), tt
ORDER BY o_orderpriority, o_orderstatus
"""


# --------------------------------------------- BENJAMINI-HOCHBERG (FDR)


def benjamini_hochberg(events):
    """Benjamini-Hochberg step-up FDR control over per-group location
    tests (one hypothesis per event_type: "this type's mean value
    differs from the corpus mean").  The per-group p-value is the
    distribution-free Chebyshev bound p = min(1, s²/(n·(mean−μ)²)) —
    chosen precisely because it is RATIONAL in the integer moment sums
    (no erf/exp), so the whole procedure is engine-exact: p is
    nano-quantized to int64 and the step-up test p_(k)·m/α ≤ k is pure
    int64 cross-multiplication.

    Scale shape: one map-side-combinable groupBy to the hypothesis
    grain (m groups — small at any scale); ranking and the step-up scan
    are self-joins on that m-row table (broadcast, bounded build —
    never a partition-less window)."""
    vals = events.select(
        "event_type", cents(F.col("value")).alias("c")
    )
    g = vals.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    tot = g.agg(
        F.sum("n").alias("tn"),
        F.sum("s").alias("ts"),
        F.count(F.lit(1)).alias("m"),
    )
    j = g.join(F.broadcast(tot))
    # all doubles below are casts of exact int64s; identical expression
    # tree on the oracle side
    mu = F.col("ts").cast("double") / F.col("tn").cast("double")
    mean_g = F.col("s").cast("double") / F.col("n").cast("double")
    var_num = (F.col("q") * F.col("n") - F.col("s") * F.col("s")).cast("double")
    dev = mean_g - mu
    denom = F.col("n").cast("double") * dev * dev
    # degenerate hypotheses (single observation, or group mean exactly
    # the corpus mean) are unfalsifiable: p = 1 by definition — branch
    # explicitly (ANSI mode rejects the IEEE inf shortcut)
    p = F.when((F.col("n") < 2) | (denom == 0.0), F.lit(1.0)).otherwise(
        F.least(
            F.lit(1.0),
            var_num
            / (F.col("n").cast("double") * (F.col("n") - 1).cast("double"))
            / denom,
        )
    )
    scored = j.select(
        "event_type",
        "n",
        "m",
        F.floor(p * 1000000000 + F.lit(0.5)).cast("long").alias("p9"),
    )
    a = scored.select(
        F.col("event_type"), F.col("n"), F.col("m"), F.col("p9")
    )
    b = scored.select(
        F.col("event_type").alias("et2"), F.col("p9").alias("p9_2")
    )
    ranked = (
        a.join(
            F.broadcast(b),
            (F.col("p9_2") < F.col("p9"))
            | ((F.col("p9_2") == F.col("p9")) & (F.col("et2") < F.col("event_type"))),
            "left",
        )
        .groupBy("event_type", "n", "m", "p9")
        .agg((F.count("et2") + 1).alias("k"))
    )
    kstar = ranked.agg(
        F.max(
            F.when(
                F.col("p9") * BH_INV_ALPHA * F.col("m")
                <= F.col("k") * F.lit(1000000000),
                F.col("k"),
            ).otherwise(F.lit(0))
        ).alias("k_star")
    )
    return (
        ranked.join(F.broadcast(kstar))
        .select(
            "event_type",
            "n",
            "p9",
            "k",
            (F.col("k") <= F.col("k_star")).alias("rejected"),
        )
        .orderBy("k")
    )


def _stat_benjamini_hochberg(spark, sf_dir):
    return benjamini_hochberg(t(spark, sf_dir, "events"))


_BH_SQL = f"""
WITH vals AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events
),
g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS q
  FROM vals GROUP BY event_type
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(s) AS BIGINT) AS ts,
         CAST(count(*) AS BIGINT) AS m
  FROM g
),
scored AS (
  SELECT event_type, n, m,
         CAST(floor(
           CASE WHEN n < 2 OR CAST(n AS DOUBLE)
                  * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                     - CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE))
                  * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                     - CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE)) = 0.0
                THEN 1.0
                ELSE least(1.0,
                  CAST(q * n - s * s AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))
                  / (CAST(n AS DOUBLE)
                     * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                        - CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE))
                     * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                        - CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE))))
           END * 1000000000 + 0.5) AS BIGINT) AS p9
  FROM g, tot
),
ranked AS (
  SELECT a.event_type, a.n, a.m, a.p9,
         CAST(1 + count(b.event_type) AS BIGINT) AS k
  FROM scored a LEFT JOIN scored b
    ON b.p9 < a.p9 OR (b.p9 = a.p9 AND b.event_type < a.event_type)
  GROUP BY a.event_type, a.n, a.m, a.p9
),
ks AS (
  SELECT max(CASE WHEN p9 * {BH_INV_ALPHA} * m <= k * 1000000000
                  THEN k ELSE 0 END) AS k_star
  FROM ranked
)
SELECT event_type, n, p9, k, k <= k_star AS rejected
FROM ranked, ks ORDER BY k
"""


# ------------------------------------------------ POISSON BOOTSTRAP CI


# the replicate-draw mixer (round-7 verdict item 4): ONE md5 per row
# yields a 32-bit seed; each (row, replicate) draw is then a two-round
# multiply-xor-shift finalizer over (seed, replicate index) — pure int64
# arithmetic both engines evaluate identically, chosen so every
# intermediate stays inside SIGNED int64 under ANSI overflow checks:
#   x0 = s ^ (b*C1)          < 2^32   (b <= 63, C1*63 < 2^32)
#   m1 = x0*A1 % 2^31                 (2^32 * A1 < 2^63, A1 < 2^31)
#   m2 = (m1 ^ m1>>15)*A2 % 2^31      (2^31 * A2 < 2^63)
#   u  = (m2 ^ m2>>13) % 1e6
# The xor rounds break the per-row linearity a bare LCG stride would
# leave across replicates (correlated replicate means shrink the CI).
BOOT_MIX_C1 = 40503043  # per-replicate xor stride
BOOT_MIX_A1 = 1540483477  # MurmurHash2 multiplier, < 2^31
BOOT_MIX_A2 = 889871009  # second-round odd multiplier, < 2^31
BOOT_MIX_MOD = 2147483648  # 2^31


def bootstrap_ci(orders):
    """Deterministic Poisson bootstrap CI for mean(o_totalprice):
    every (row, replicate) pair draws a Poisson(1) count via a
    deterministic uniform (md5 row seed + integer mixer, see
    BOOT_MIX_*) through the inverse CDF (literal integer thresholds on
    both engines), so the resample is REPRODUCIBLE across retries and
    engines — the same argument as sample_hash_bernoulli, extended to
    uncertainty quantification.  CI bounds are exact order statistics
    of the 64 replicate means (ranks 2 and 63 ≈ 2.5%/97.5%).

    Scale shape: the 64× explode is the honest CPU cost of a bootstrap,
    but map-side combine collapses the shuffle to exactly 64 rows
    regardless of input size; ranking the replicates is a 64×64
    broadcast self-join (bounded build).  The point estimate rides in
    as the usual broadcast 1-row aggregate.  CPU shape: md5 runs ONCE
    per row, BEFORE the 64× explode — the exploded hot loop is pure
    int64 whole-stage-codegen (the previous form re-hashed per
    (row, replicate-group) and md5 was 80% of the key's CPU; the
    statistics are unchanged in kind, only the draw stream differs)."""
    base = orders.select(
        cents(F.col("o_totalprice")).alias("c"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("boot:"), F.col("o_orderkey").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("s"),
    )
    u = F.col("u")
    draw = F.lit(len(POISSON_CUM))
    for i in range(len(POISSON_CUM) - 1, -1, -1):
        draw = F.when(u < POISSON_CUM[i], i).otherwise(draw)
    rep = (
        base.select(
            "s", "c", F.explode(F.sequence(F.lit(0), F.lit(N_BOOT - 1))).alias("b")
        )
        .withColumn(
            "m1",
            F.expr(
                f"pmod((s ^ (CAST(b AS BIGINT) * {BOOT_MIX_C1}))"
                f" * {BOOT_MIX_A1}, {BOOT_MIX_MOD})"
            ),
        )
        .withColumn(
            "m2",
            F.expr(
                f"pmod((m1 ^ shiftright(m1, 15)) * {BOOT_MIX_A2}, {BOOT_MIX_MOD})"
            ),
        )
        .withColumn("u", F.expr("pmod(m2 ^ shiftright(m2, 13), 1000000)"))
        .select("b", F.col("c"), draw.cast("long").alias("w"))
        .groupBy("b")
        .agg(F.sum(F.col("w") * F.col("c")).alias("sb"), F.sum("w").alias("nb"))
        # a replicate whose Poisson weights all landed on 0 resamples
        # nothing — undefined mean, dropped (cannot occur beyond toy
        # inputs: P ≈ (1/e)^rows)
        .where(F.col("nb") > 0)
        .select(
            "b",
            F.floor(
                F.col("sb") * 100.0 / F.col("nb").cast("double") + F.lit(0.5)
            )
            .cast("long")
            .alias("mean_c2"),
        )
    )
    ra = rep.select("b", "mean_c2")
    rb = rep.select(F.col("b").alias("b2"), F.col("mean_c2").alias("m2"))
    ranked = (
        ra.join(
            F.broadcast(rb),
            (F.col("m2") < F.col("mean_c2"))
            | ((F.col("m2") == F.col("mean_c2")) & (F.col("b2") < F.col("b"))),
            "left",
        )
        .groupBy("b", "mean_c2")
        .agg(F.count("b2").alias("r0"))
    )
    point = orders.agg(
        F.floor(
            F.sum(cents(F.col("o_totalprice"))) * 100.0
            / F.count(F.lit(1)).cast("double")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("point_c2")
    )
    ci = ranked.agg(
        F.count(F.lit(1)).alias("n_boot"),
        F.max(F.when(F.col("r0") == 1, F.col("mean_c2"))).alias("lo_c2"),
        F.max(F.when(F.col("r0") == N_BOOT - 2, F.col("mean_c2"))).alias("hi_c2"),
    )
    return ci.join(F.broadcast(point)).select(
        "n_boot", "point_c2", "lo_c2", "hi_c2"
    )


def _stat_bootstrap_ci(spark, sf_dir):
    return bootstrap_ci(t(spark, sf_dir, "orders"))


def _poisson_case_sql(u_expr: str) -> str:
    branches = "".join(
        f" WHEN {u_expr} < {thr} THEN {k}"
        for k, thr in enumerate(POISSON_CUM)
    )
    return f"CASE{branches} ELSE {len(POISSON_CUM)} END"


_BOOT_SQL = f"""
WITH base AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
         ('0x' || substr(md5('boot:' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT AS s
  FROM orders
),
mx1 AS (
  SELECT b.b, c,
         (xor(s, CAST(b.b AS BIGINT) * {BOOT_MIX_C1}) * {BOOT_MIX_A1})
             % {BOOT_MIX_MOD} AS m1
  FROM base, (SELECT unnest(range(0, {N_BOOT})) AS b) b
),
mx2 AS (
  SELECT b, c,
         (xor(m1, m1 >> 15) * {BOOT_MIX_A2}) % {BOOT_MIX_MOD} AS m2
  FROM mx1
),
uu AS (SELECT b, c, xor(m2, m2 >> 13) % 1000000 AS u FROM mx2),
rep AS (
  SELECT b,
         CAST(floor(
           CAST(sum(({_poisson_case_sql("u")}) * c) AS DOUBLE)
           * 100.0
           / CAST(sum({_poisson_case_sql("u")}) AS DOUBLE)
           + 0.5) AS BIGINT) AS mean_c2
  FROM uu
  GROUP BY b
  HAVING sum({_poisson_case_sql("u")}) > 0
),
ranked AS (
  SELECT a.b, a.mean_c2, CAST(count(x.b) AS BIGINT) AS r0
  FROM rep a LEFT JOIN rep x
    ON x.mean_c2 < a.mean_c2 OR (x.mean_c2 = a.mean_c2 AND x.b < a.b)
  GROUP BY a.b, a.mean_c2
),
point AS (
  SELECT CAST(floor(
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
           * 100.0 / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS point_c2
  FROM orders
)
SELECT CAST(count(*) AS BIGINT) AS n_boot,
       (SELECT point_c2 FROM point) AS point_c2,
       max(CASE WHEN r0 = 1 THEN mean_c2 END) AS lo_c2,
       max(CASE WHEN r0 = {N_BOOT - 2} THEN mean_c2 END) AS hi_c2
FROM ranked
"""


R6_QUERIES: dict[str, QueryDef] = {
    q.name: q
    for q in (
        QueryDef("stat_ks_test", _stat_ks_test, _KS_SQL, ("stat",)),
        QueryDef("stat_mannwhitney_u", _stat_mannwhitney_u, _MWU_SQL, ("stat",)),
        QueryDef(
            "stat_chi2_independence",
            _stat_chi2_independence,
            _CHI2_SQL,
            ("stat",),
        ),
        QueryDef(
            "stat_benjamini_hochberg",
            _stat_benjamini_hochberg,
            _BH_SQL,
            ("stat",),
        ),
        QueryDef("stat_bootstrap_ci", _stat_bootstrap_ci, _BOOT_SQL, ("stat",)),
    )
}


# =====================================================================
# Feature engineering family: the fit+transform operators a training
# pipeline runs between curation and the trainer.  Same exactness
# discipline: fitted parameters are integer moment sums / exact order
# statistics; every exported float is a quantized IEEE expression over
# exact int64 casts.
# =====================================================================

# deterministic application subsets (content-free key arithmetic, the
# sample_hash_bernoulli argument: retry-stable row membership)
SCALE_MOD = 997
TE_MOD = 13
OH_MOD = 11

# customer market segments are a closed enum of the fixture schema —
# encoding against a DECLARED vocabulary is the production shape (a
# data-derived vocabulary would make the output schema data-dependent,
# which no trainer accepts); unseen values fall through to all-zeros.
MKT_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


def scale_battery(events, mod: int = SCALE_MOD):
    """Fit-and-apply of the three standard scalers — z-score (standard),
    min-max, and robust (median/IQR) — per event_type, applied to a
    deterministic row subset.  Fitted parameters are exact: integer
    moment sums for mean/std (sqrt is IEEE-correctly-rounded, so even
    the std is bit-stable cross-engine), and EXACT order statistics for
    the robust quartiles (smallest v with 4·cum ≥ k·n at the distinct
    cents-value grain — no interpolation, no approximate percentile).

    Scale shape: one shuffle to the (type, distinct-value) grain for
    the quartile scan (bounded by the value domain), windows only
    within type partitions; moments ride the same aggregate; the 5-row
    parameter table broadcasts onto the filtered application subset."""
    vals = events.select(
        "event_id", "event_type", cents(F.col("value")).alias("c")
    )
    grp = vals.groupBy("event_type", "c").agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grp.select(
        "event_type", "c", "cnt", F.sum("cnt").over(w).alias("cum")
    )
    ntot = grp.groupBy("event_type").agg(F.sum("cnt").alias("n"))
    cumn = cum.join(F.broadcast(ntot), "event_type")
    quarts = cumn.groupBy("event_type").agg(
        F.min(F.when(4 * F.col("cum") >= F.col("n"), F.col("c"))).alias("p25"),
        F.min(F.when(2 * F.col("cum") >= F.col("n"), F.col("c"))).alias("p50"),
        F.min(F.when(4 * F.col("cum") >= 3 * F.col("n"), F.col("c"))).alias("p75"),
    )
    moments = vals.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
        F.min("c").alias("cmin"),
        F.max("c").alias("cmax"),
    )
    params = moments.join(quarts, "event_type")
    rows = vals.where(F.pmod(F.col("event_id"), F.lit(mod)) == 0)
    j = rows.join(F.broadcast(params), "event_type")
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    std = F.sqrt(
        (F.col("q") * F.col("n") - F.col("s") * F.col("s")).cast("double")
        / (F.col("n").cast("double") * (F.col("n") - 1).cast("double"))
    )
    dc = F.col("c").cast("double")

    def q6(x):
        return F.floor(x * 1000000 + F.lit(0.5)) / 1000000.0

    z6 = F.when((F.col("n") < 2) | (std == 0.0), F.lit(0.0)).otherwise(
        q6((dc - mean) / std)
    )
    mm6 = F.when(F.col("cmax") == F.col("cmin"), F.lit(0.0)).otherwise(
        q6(
            (F.col("c") - F.col("cmin")).cast("double")
            / (F.col("cmax") - F.col("cmin")).cast("double")
        )
    )
    r6_ = F.when(F.col("p75") == F.col("p25"), F.lit(0.0)).otherwise(
        q6(
            (F.col("c") - F.col("p50")).cast("double")
            / (F.col("p75") - F.col("p25")).cast("double")
        )
    )
    return j.select(
        "event_id",
        "event_type",
        "c",
        z6.alias("z6"),
        mm6.alias("mm6"),
        r6_.alias("robust6"),
    ).orderBy("event_id")


def _feature_scale_battery(spark, sf_dir):
    return scale_battery(t(spark, sf_dir, "events"))


_SCALE_SQL = f"""
WITH vals AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
grp AS (
  SELECT event_type, c, CAST(count(*) AS BIGINT) AS cnt
  FROM vals GROUP BY 1, 2
),
cum AS (
  SELECT event_type, c, cnt,
         CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY c) AS BIGINT) AS cum
  FROM grp
),
ntot AS (
  SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n FROM grp GROUP BY 1
),
quarts AS (
  SELECT cum.event_type,
         min(CASE WHEN 4 * cum >= n THEN c END) AS p25,
         min(CASE WHEN 2 * cum >= n THEN c END) AS p50,
         min(CASE WHEN 4 * cum >= 3 * n THEN c END) AS p75
  FROM cum JOIN ntot ON cum.event_type = ntot.event_type
  GROUP BY cum.event_type
),
moments AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS q,
         min(c) AS cmin, max(c) AS cmax
  FROM vals GROUP BY 1
),
params AS (
  SELECT moments.*, p25, p50, p75
  FROM moments JOIN quarts ON moments.event_type = quarts.event_type
)
SELECT v.event_id, v.event_type, v.c,
       CASE WHEN n < 2 OR sqrt(CAST(q * n - s * s AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) = 0.0
            THEN 0.0
            ELSE floor((CAST(v.c AS DOUBLE)
                        - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                       / sqrt(CAST(q * n - s * s AS DOUBLE)
                              / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
                       * 1000000 + 0.5) / 1000000.0
       END AS z6,
       CASE WHEN cmax = cmin THEN 0.0
            ELSE floor(CAST(v.c - cmin AS DOUBLE)
                       / CAST(cmax - cmin AS DOUBLE) * 1000000 + 0.5) / 1000000.0
       END AS mm6,
       CASE WHEN p75 = p25 THEN 0.0
            ELSE floor(CAST(v.c - p50 AS DOUBLE)
                       / CAST(p75 - p25 AS DOUBLE) * 1000000 + 0.5) / 1000000.0
       END AS robust6
FROM vals v JOIN params ON v.event_type = params.event_type
WHERE v.event_id % {SCALE_MOD} = 0
ORDER BY v.event_id
"""


def target_encode(customer, m: int = TE_SMOOTH, mod: int = TE_MOD):
    """Smoothed (m-estimate) target encoding of c_mktsegment against
    the account-balance target, with the leave-one-out variant on a
    deterministic row subset — LOO is what prevents target leakage in
    training folds, and its per-row form is exactly the group sums
    minus self, so no second pass is needed.

    Exactness: all sums are integer cents; the smoothing prior mu is
    the one shared double; every encoded value is one quantized IEEE
    division of exact components.  Scale shape: one map-side
    aggregate to the segment grain (closed enum), broadcast back onto
    the subset rows."""
    vals = customer.select(
        "c_custkey", "c_mktsegment", cents(F.col("c_acctbal")).alias("c")
    )
    g = vals.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_g"), F.sum("c").alias("s_g")
    )
    tot = vals.agg(F.sum("c").alias("ts"), F.count(F.lit(1)).alias("tn"))
    rows = vals.where(F.pmod(F.col("c_custkey"), F.lit(mod)) == 0)
    j = rows.join(F.broadcast(g), "c_mktsegment").join(F.broadcast(tot))
    mu = F.col("ts").cast("double") / F.col("tn").cast("double")

    def q6(x):
        return F.floor(x * 1000000 + F.lit(0.5)) / 1000000.0

    enc = q6(
        (F.col("s_g").cast("double") + F.lit(float(m)) * mu)
        / (F.col("n_g") + m).cast("double")
        / 100.0
    )
    loo = F.when(F.col("n_g") <= 1, F.lit(None).cast("double")).otherwise(
        q6(
            ((F.col("s_g") - F.col("c")).cast("double") + F.lit(float(m)) * mu)
            / (F.col("n_g") - 1 + m).cast("double")
            / 100.0
        )
    )
    return j.select(
        "c_custkey", "c_mktsegment", enc.alias("enc6"), loo.alias("loo6")
    ).orderBy("c_custkey")


def _feature_target_encode(spark, sf_dir):
    return target_encode(t(spark, sf_dir, "customer"))


_TE_SQL = f"""
WITH vals AS (
  SELECT c_custkey, c_mktsegment,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS c
  FROM customer
),
g AS (
  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_g,
         CAST(sum(c) AS BIGINT) AS s_g
  FROM vals GROUP BY 1
),
tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS ts, CAST(count(*) AS BIGINT) AS tn FROM vals
)
SELECT v.c_custkey, v.c_mktsegment,
       floor((CAST(s_g AS DOUBLE)
              + {TE_SMOOTH}.0 * (CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE)))
             / CAST(n_g + {TE_SMOOTH} AS DOUBLE) / 100.0
             * 1000000 + 0.5) / 1000000.0 AS enc6,
       CASE WHEN n_g <= 1 THEN NULL
            ELSE floor((CAST(s_g - v.c AS DOUBLE)
                        + {TE_SMOOTH}.0 * (CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE)))
                       / CAST(n_g - 1 + {TE_SMOOTH} AS DOUBLE) / 100.0
                       * 1000000 + 0.5) / 1000000.0
       END AS loo6
FROM vals v JOIN g ON v.c_mktsegment = g.c_mktsegment, tot
WHERE v.c_custkey % {TE_MOD} = 0
ORDER BY v.c_custkey
"""


def chi2_feature_select(lineitem):
    """Chi-square feature ranking against the l_returnflag label over
    four candidate categorical features (linestatus, quantity bucket,
    discount bucket, ship month) — the univariate filter step of a
    feature-selection pass, in ONE scan: each row explodes into its
    four (feature, value, label) observations map-side, one shuffle to
    the bounded (feature, value, label) cell grain, and everything
    after runs on that metadata-sized table (margins via tiny
    aggregates, ranking via a 4-row self-join).

    Exactness: the same exact-root chi-square form as
    stat_chi2_independence; per-cell contributions are micro-quantized
    to int64 BEFORE the per-feature sum, so the total never depends on
    float fold order (the repo-wide partitioning-invariance rule)."""
    feats = F.array(
        F.struct(F.lit("linestatus").alias("f"), F.col("l_linestatus").alias("val")),
        F.struct(
            F.lit("qty_bucket").alias("f"),
            F.floor(F.col("l_quantity") / 10).cast("string").alias("val"),
        ),
        F.struct(
            F.lit("disc_bucket").alias("f"),
            F.floor(
                F.floor(F.col("l_discount") * 100 + F.lit(0.5)) / 2
            ).cast("string").alias("val"),
        ),
        F.struct(
            F.lit("ship_month").alias("f"),
            F.month("l_shipdate").cast("string").alias("val"),
        ),
    )
    obs3 = lineitem.select(
        F.col("l_returnflag").alias("label"), F.explode(feats).alias("fv")
    ).select("label", F.col("fv.f").alias("f"), F.col("fv.val").alias("val"))
    cells = obs3.groupBy("f", "val", "label").agg(
        F.count(F.lit(1)).alias("obs")
    )
    # the BOUNDED (feature, value, label) cell grain feeds three margin
    # aggregates plus the contribution join; truncate lineage so the
    # fact scan + 4-way explode runs once, not once per consumer
    # (before r11: 24 parquet scans in one physical plan)
    cells = truncate_lineage(cells)
    rt = cells.groupBy("f", "val").agg(F.sum("obs").alias("row_tot"))
    ct = cells.groupBy("f", "label").agg(F.sum("obs").alias("col_tot"))
    tt = cells.groupBy("f").agg(F.sum("obs").alias("t_tot"))
    j = (
        cells.join(F.broadcast(rt), ["f", "val"])
        .join(F.broadcast(ct), ["f", "label"])
        .join(F.broadcast(tt), "f")
    )
    root = F.col("obs") * F.col("t_tot") - F.col("row_tot") * F.col("col_tot")
    contrib_micro = F.floor(
        root.cast("double")
        * root.cast("double")
        / (F.col("t_tot") * F.col("row_tot") * F.col("col_tot")).cast("double")
        * 1000000
        + F.lit(0.5)
    ).cast("long")
    # level counts come from the margin tables, NOT countDistinct: two
    # distinct aggregates in one groupBy trigger RewriteDistinctAggregates,
    # whose Expand projection order is exprId-dependent (session-order
    # nondeterminism — the same artifact round 5 fixed in
    # click_attribution) and whose 3x row multiplication is pure waste
    # when the margins already exist
    per_f = j.groupBy("f").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(contrib_micro).alias("chi2_micro"),
    )
    nv = rt.groupBy("f").agg(F.count(F.lit(1)).alias("n_vals"))
    nl = ct.groupBy("f").agg(F.count(F.lit(1)).alias("n_labels"))
    per_f = per_f.join(F.broadcast(nv), "f").join(F.broadcast(nl), "f")
    per_f = per_f.select(
        "f",
        "n_cells",
        ((F.col("n_vals") - 1) * (F.col("n_labels") - 1)).alias("dof"),
        (F.col("chi2_micro") / 1000000.0).alias("chi2_6"),
        F.col("chi2_micro").alias("_cm"),
    )
    a = per_f
    b = per_f.select(F.col("f").alias("f2"), F.col("_cm").alias("cm2"))
    ranked = (
        a.join(
            F.broadcast(b),
            (F.col("cm2") > F.col("_cm"))
            | ((F.col("cm2") == F.col("_cm")) & (F.col("f2") < F.col("f"))),
            "left",
        )
        .groupBy("f", "n_cells", "dof", "chi2_6")
        .agg((F.count("f2") + 1).alias("rnk"))
    )
    return ranked.orderBy("rnk")


def _feature_chi2_select(spark, sf_dir):
    return chi2_feature_select(t(spark, sf_dir, "lineitem"))


_CHI2SEL_SQL = """
WITH obs3 AS (
  SELECT l_returnflag AS label, u.f, u.val
  FROM lineitem, LATERAL (
    SELECT * FROM (VALUES
      ('linestatus', l_linestatus),
      ('qty_bucket', CAST(CAST(floor(l_quantity / 10) AS BIGINT) AS VARCHAR)),
      ('disc_bucket', CAST(CAST(floor(floor(l_discount * 100 + 0.5) / 2) AS BIGINT) AS VARCHAR)),
      ('ship_month', CAST(CAST(month(l_shipdate) AS BIGINT) AS VARCHAR))
    ) AS t(f, val)
  ) u
),
cells AS (
  SELECT f, val, label, CAST(count(*) AS BIGINT) AS obs
  FROM obs3 GROUP BY 1, 2, 3
),
rt AS (SELECT f, val, CAST(sum(obs) AS BIGINT) AS row_tot FROM cells GROUP BY 1, 2),
ct AS (SELECT f, label, CAST(sum(obs) AS BIGINT) AS col_tot FROM cells GROUP BY 1, 2),
tt AS (SELECT f, CAST(sum(obs) AS BIGINT) AS t_tot FROM cells GROUP BY 1),
contribs AS (
  SELECT cells.f,
         CAST(floor(
           CAST(obs * t_tot - row_tot * col_tot AS DOUBLE)
           * CAST(obs * t_tot - row_tot * col_tot AS DOUBLE)
           / CAST(t_tot * row_tot * col_tot AS DOUBLE)
           * 1000000 + 0.5) AS BIGINT) AS contrib_micro,
         cells.val, cells.label
  FROM cells
  JOIN rt ON cells.f = rt.f AND cells.val = rt.val
  JOIN ct ON cells.f = ct.f AND cells.label = ct.label
  JOIN tt ON cells.f = tt.f
),
per_f AS (
  SELECT f, CAST(count(*) AS BIGINT) AS n_cells,
         CAST((count(DISTINCT val) - 1) * (count(DISTINCT label) - 1) AS BIGINT) AS dof,
         CAST(sum(contrib_micro) AS BIGINT) AS cm
  FROM contribs GROUP BY f
)
SELECT a.f, a.n_cells, a.dof, a.cm / 1000000.0 AS chi2_6,
       CAST(1 + count(b.f) AS BIGINT) AS rnk
FROM per_f a LEFT JOIN per_f b
  ON b.cm > a.cm OR (b.cm = a.cm AND b.f < a.f)
GROUP BY a.f, a.n_cells, a.dof, a.cm
ORDER BY rnk
"""


def onehot_encode(customer, mod: int = OH_MOD):
    """One-hot encoding of c_mktsegment against the DECLARED segment
    vocabulary plus a negative-balance indicator, on a deterministic
    subset.  Scan-only: fixed output schema, zero shuffles, zero joins
    — the shape a feature-store materialization job has, where the
    vocabulary is a contract, not a discovery (a data-derived vocab
    would make the schema data-dependent mid-pipeline).

    Unseen segment values encode as all-zeros (the standard
    handle-unknown=ignore contract)."""
    cols = [
        F.when(F.col("c_mktsegment") == seg, 1)
        .otherwise(0)
        .cast("int")
        .alias(f"seg_{seg.lower()}")
        for seg in MKT_SEGMENTS
    ]
    return (
        customer.where(F.pmod(F.col("c_custkey"), F.lit(mod)) == 0)
        .select(
            "c_custkey",
            *cols,
            (cents(F.col("c_acctbal")) < 0).cast("int").alias("bal_neg"),
        )
        .orderBy("c_custkey")
    )


def _feature_onehot_encode(spark, sf_dir):
    return onehot_encode(t(spark, sf_dir, "customer"))


_OH_SQL = f"""
SELECT c_custkey,
       {", ".join(f"CAST(CASE WHEN c_mktsegment = '{s}' THEN 1 ELSE 0 END AS INTEGER) AS seg_{s.lower()}" for s in MKT_SEGMENTS)},
       CAST(CASE WHEN CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) < 0
                 THEN 1 ELSE 0 END AS INTEGER) AS bal_neg
FROM customer WHERE c_custkey % {OH_MOD} = 0 ORDER BY c_custkey
"""


for _q in (
    QueryDef(
        "feature_scale_battery", _feature_scale_battery, _SCALE_SQL, ("feature",)
    ),
    QueryDef(
        "feature_target_encode", _feature_target_encode, _TE_SQL, ("feature",)
    ),
    QueryDef(
        "feature_chi2_select", _feature_chi2_select, _CHI2SEL_SQL, ("feature",)
    ),
    QueryDef(
        "feature_onehot_encode", _feature_onehot_encode, _OH_SQL, ("feature",)
    ),
):
    R6_QUERIES[_q.name] = _q


# =====================================================================
# Text-quality additions: Gopher rule filter, first-seen n-gram
# novelty, and CCNet-style perplexity bucketing over the char-trigram
# LM.  All corpus statistics are integer counts; the single
# transcendental (ln, for surprisal) is micro-nat-quantized PER TERM to
# int64 before any aggregation, so no float ever crosses a fold.
# =====================================================================

GOPHER_STOPWORDS = ("a", "the", "and", "of", "to", "in")
GOPHER_WC_LO, GOPHER_WC_HI = 20, 1000
GOPHER_WL_LO, GOPHER_WL_HI = 2, 8  # mean word length bounds
NOVELTY_SPAN = 5  # tokens per span (matches dedup_span_ngrams)
PPL_BUCKET = 65536  # coarse-bucket width for the tertile scan


def gopher_rules(docs):
    """Gopher-style quality rule filter (Rae et al. 2021 §A1.1 adapted
    to the fixture corpus), reported as a per-source rejection audit:
    how many docs pass all rules, and how many fail each — the
    dashboard a curation pipeline alarms on per ingest batch.

    Rules (all integer cross-multiplications, no division anywhere):
    word count in [20, 1000]; mean word length in [2, 8] (as
    lo·n ≤ Σlen ≤ hi·n); most-frequent-token share ≤ 1/4 (4·max ≤ n);
    distinct-token ratio ≥ 3/10 (10·distinct ≥ 3·n); ≥ 2 distinct
    stopwords present.

    Scale shape: ONE shuffle to the (doc, token) grain (the explode is
    map-side), per-doc flags from that aggregate, then a
    map-side-combinable rollup to source grain."""
    toks = _tok(F.col("text"))
    base = docs.select(
        "doc_id",
        "source",
        F.explode(toks).alias("tok"),
    )
    per_tok = base.groupBy("doc_id", "source", "tok").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    per_doc = per_tok.groupBy("doc_id", "source").agg(
        F.sum("cnt").alias("n"),
        F.sum(F.length("tok") * F.col("cnt")).alias("len_sum"),
        F.max("cnt").alias("top_cnt"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(
            F.when(F.col("tok").isin(*GOPHER_STOPWORDS), 1).otherwise(0)
        ).alias("n_stop"),
    )
    f_wc = (F.col("n") < GOPHER_WC_LO) | (F.col("n") > GOPHER_WC_HI)
    f_wl = (F.col("len_sum") < GOPHER_WL_LO * F.col("n")) | (
        F.col("len_sum") > GOPHER_WL_HI * F.col("n")
    )
    f_rep = 4 * F.col("top_cnt") > F.col("n")
    f_dis = 10 * F.col("n_distinct") < 3 * F.col("n")
    f_stop = F.col("n_stop") < 2
    flags = per_doc.select(
        "source",
        f_wc.cast("int").alias("f_wc"),
        f_wl.cast("int").alias("f_wl"),
        f_rep.cast("int").alias("f_rep"),
        f_dis.cast("int").alias("f_dis"),
        f_stop.cast("int").alias("f_stop"),
        (~(f_wc | f_wl | f_rep | f_dis | f_stop)).cast("int").alias("ok"),
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ok").alias("pass_all"),
            F.sum("f_wc").alias("fail_wordcount"),
            F.sum("f_wl").alias("fail_wordlen"),
            F.sum("f_rep").alias("fail_toprep"),
            F.sum("f_dis").alias("fail_distinct"),
            F.sum("f_stop").alias("fail_stopword"),
        )
        .orderBy("source")
    )


def _text_gopher_rules(spark, sf_dir):
    return gopher_rules(t(spark, sf_dir, "documents"))


_GOPHER_SQL = f"""
WITH base AS (
  SELECT doc_id, source, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM documents
),
per_tok AS (
  SELECT doc_id, source, tok, CAST(count(*) AS BIGINT) AS cnt
  FROM base GROUP BY 1, 2, 3
),
per_doc AS (
  SELECT doc_id, source,
         CAST(sum(cnt) AS BIGINT) AS n,
         CAST(sum(length(tok) * cnt) AS BIGINT) AS len_sum,
         CAST(max(cnt) AS BIGINT) AS top_cnt,
         CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(sum(CASE WHEN tok IN {GOPHER_STOPWORDS} THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
  FROM per_tok GROUP BY 1, 2
),
flags AS (
  SELECT source,
         CASE WHEN n < {GOPHER_WC_LO} OR n > {GOPHER_WC_HI} THEN 1 ELSE 0 END AS f_wc,
         CASE WHEN len_sum < {GOPHER_WL_LO} * n OR len_sum > {GOPHER_WL_HI} * n THEN 1 ELSE 0 END AS f_wl,
         CASE WHEN 4 * top_cnt > n THEN 1 ELSE 0 END AS f_rep,
         CASE WHEN 10 * n_distinct < 3 * n THEN 1 ELSE 0 END AS f_dis,
         CASE WHEN n_stop < 2 THEN 1 ELSE 0 END AS f_stop
  FROM per_doc
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN f_wc + f_wl + f_rep + f_dis + f_stop = 0 THEN 1 ELSE 0 END) AS BIGINT) AS pass_all,
       CAST(sum(f_wc) AS BIGINT) AS fail_wordcount,
       CAST(sum(f_wl) AS BIGINT) AS fail_wordlen,
       CAST(sum(f_rep) AS BIGINT) AS fail_toprep,
       CAST(sum(f_dis) AS BIGINT) AS fail_distinct,
       CAST(sum(f_stop) AS BIGINT) AS fail_stopword
FROM flags GROUP BY source ORDER BY source
"""


def ngram_novelty(docs, w: int = NOVELTY_SPAN):
    """First-seen n-gram novelty per source: of each doc's DISTINCT
    w-token spans, how many appear in no earlier doc (global first
    occurrence by doc_id order)?  This is the memorization/freshness
    audit that complements dedup_span_ngrams: span dedup counts
    repeated material, novelty ATTRIBUTES first authorship — sources
    whose novelty collapses are re-crawls or mirrors.

    Scale shape: span generation is a per-row array transform; one
    shuffle to the distinct (span, doc) grain, one map-side-combinable
    aggregate to span grain for the global min doc, one equi-join back
    (span-keyed, no skew: a span's fanout is its true dup count, the
    hot-shingle guard argument of the dedup family), then a rollup to
    source grain."""
    toks = _tok(F.col("text"))
    spans = (
        docs.select("doc_id", "source", toks.alias("toks"))
        .filter(F.size("toks") >= w)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - w),
                    lambda i: F.array_join(
                        F.slice(F.col("toks"), (i + 1).cast("int"), w), " "
                    ),
                )
            ).alias("span"),
        )
        .select("doc_id", "source", _h32(F.col("span")).alias("fp"))
        .distinct()
    )
    # global first occurrence as a span-partitioned window (r11): the
    # old groupBy + join-back referenced ``spans`` twice, re-running
    # the tokenize + span-explode + hash + distinct — the whole cost of
    # the operator — once per reference, and paid an extra fp shuffle
    # for the join. One fp-keyed window gives the same min(doc_id) per
    # span with the span table derived ONCE (partitions are per-span
    # duplicate lists, never the whole set — the hot-shingle fanout
    # argument as before).
    wfp = Window.partitionBy("fp")
    flagged = spans.select(
        "doc_id",
        "source",
        (F.col("doc_id") == F.min("doc_id").over(wfp)).cast("long").alias("novel"),
    )
    per_src = flagged.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("span_types"),
        F.sum("novel").alias("novel_types"),
    )
    return per_src.select(
        "source",
        "n_docs",
        "span_types",
        "novel_types",
        (
            F.floor(
                F.col("novel_types")
                / F.col("span_types").cast("double")
                * 1000000
                + F.lit(0.5)
            )
            / 1000000.0
        ).alias("novelty6"),
    ).orderBy("source")


def _text_ngram_novelty(spark, sf_dir):
    return ngram_novelty(t(spark, sf_dir, "documents"))


_NOVELTY_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents
),
spans AS (
  SELECT DISTINCT doc_id, source,
         ('0x' || substr(md5(array_to_string(tk[i:i+{NOVELTY_SPAN - 1}], ' ')), 1, 8))::BIGINT AS fp
  FROM toks, LATERAL (
    SELECT unnest(range(1, len(tk) - {NOVELTY_SPAN} + 2)) AS i
  ) u
  WHERE len(tk) >= {NOVELTY_SPAN}
),
first AS (SELECT fp, min(doc_id) AS first_doc FROM spans GROUP BY fp),
flagged AS (
  SELECT s.doc_id, s.source,
         CASE WHEN s.doc_id = f.first_doc THEN 1 ELSE 0 END AS novel
  FROM spans s JOIN first f ON s.fp = f.fp
)
SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS span_types,
       CAST(sum(novel) AS BIGINT) AS novel_types,
       floor(CAST(sum(novel) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             * 1000000 + 0.5) / 1000000.0 AS novelty6
FROM flagged GROUP BY source ORDER BY source
"""


def perplexity_bucket(docs=None, dtm=None):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every doc by mean char-trigram surprisal under the corpus's own
    add-1-smoothed trigram unigram model, split the corpus into
    head/middle/tail at the EXACT tertiles, and report the
    source × bucket composition — the table a curation pipeline uses
    to decide which tail fraction to drop.

    Exactness: the single transcendental term −ln((cnt+1)/(N+V)) is
    computed from exact int64 inputs and micro-nat-quantized to int64
    PER TERM before any sum (the repo's fold-order rule); a doc's sum
    over occurrences is the m-weighted sum over its DISTINCT trigrams
    (integer-exact), the per-doc mean is pure integer arithmetic
    ((2s+n) div 2n = half-up), and the tertile thresholds are exact
    order statistics via the same hierarchical coarse-bucket prefix
    sum the KS machinery uses.

    Scale shape (r9 rewrite): everything derives from the per-doc
    trigram-count grain ``dtm`` — pass the materialized shared stage
    (registry path: one explode per PROCESS, column-pruned scans), or
    let it derive from ``docs`` (one explode per QUERY; the old plan
    ran the explode twice — corpus counts AND the per-doc join-back).
    Corpus counts sum the distinct grain; the count table is
    charset-bounded so its join back is a broadcast; one doc-grain
    aggregate; the tertile scan runs at the distinct-score grain."""
    if dtm is None:
        if docs is None:
            raise ValueError("perplexity_bucket needs docs or dtm")
        from .ext.text import doc_char_trigram_counts

        dtm = doc_char_trigram_counts(docs, carry=("source",))
    dtm = dtm.select("doc_id", "source", "tri", "m")
    counts = dtm.groupBy("tri").agg(F.sum("m").alias("cnt"))
    nv = counts.agg(
        F.sum("cnt").alias("nn"), F.count(F.lit(1)).alias("vv")
    )
    terms = dtm.join(F.broadcast(counts), "tri").join(F.broadcast(nv))
    term_micro = F.floor(
        -F.log(
            (F.col("cnt") + 1).cast("double")
            / (F.col("nn") + F.col("vv")).cast("double")
        )
        * 1000000
        + F.lit(0.5)
    ).cast("long")
    per_doc = (
        terms.select(
            "doc_id",
            "source",
            "m",
            term_micro.alias("tm"),
        )
        .groupBy("doc_id", "source")
        .agg(
            F.sum(F.col("m") * F.col("tm")).alias("s"),
            F.sum("m").alias("n"),
        )
        .select(
            "doc_id",
            "source",
            F.expr("div(2 * s + n, 2 * n)").alias("sc"),
        )
    )
    # the doc-grain score table feeds the tertile machinery, the doc
    # count, and the final bucketing join — truncate lineage so the
    # trigram join + surprisal aggregate run once, not once per
    # consumer (before r11: 3 full derivations, 30 stage scans in one
    # plan). Doc grain is the reduced grain a curation pipeline stages.
    per_doc = truncate_lineage(per_doc)
    grp = per_doc.groupBy("sc").agg(F.count(F.lit(1)).alias("cnt"))
    grp = grp.withColumn("bkt", F.floor(F.col("sc") / PPL_BUCKET))
    w = (
        Window.partitionBy("bkt")
        .orderBy("sc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = grp.select(
        "sc", "bkt", "cnt", F.sum("cnt").over(w).alias("cin")
    )
    btot = grp.groupBy("bkt").agg(F.sum("cnt").alias("bc"))
    offs = (
        btot.select(F.col("bkt").alias("k"))
        .join(btot.select(F.col("bkt").alias("k2"), "bc"), F.col("k2") < F.col("k"))
        .groupBy("k")
        .agg(F.sum("bc").alias("off"))
    )
    cum = within.join(F.broadcast(offs), within.bkt == offs.k, "left").select(
        "sc", "cnt", (F.col("cin") + F.coalesce("off", F.lit(0))).alias("cum")
    )
    nd = per_doc.agg(F.count(F.lit(1)).alias("nd"))
    thr = (
        cum.join(F.broadcast(nd))
        .agg(
            F.min(F.when(3 * F.col("cum") >= F.col("nd"), F.col("sc"))).alias("t1"),
            F.min(F.when(3 * F.col("cum") >= 2 * F.col("nd"), F.col("sc"))).alias(
                "t2"
            ),
        )
    )
    bucketed = per_doc.join(F.broadcast(thr)).select(
        "source",
        F.when(F.col("sc") <= F.col("t1"), F.lit("head"))
        .when(F.col("sc") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
    return (
        bucketed.groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source", "bucket")
    )


def _text_perplexity_bucket(spark, sf_dir):
    from .registry_util import shared_char_trigrams

    return perplexity_bucket(dtm=shared_char_trigrams(spark, sf_dir))


_PPL_SQL = f"""
WITH tris AS (
  SELECT doc_id, source, substr(text, i, 3) AS tri
  FROM documents, LATERAL (
    SELECT unnest(range(1, length(text) - 1)) AS i
  ) u
  WHERE length(text) >= 3
),
counts AS (SELECT tri, CAST(count(*) AS BIGINT) AS cnt FROM tris GROUP BY tri),
nv AS (SELECT CAST(sum(cnt) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS vv FROM counts),
terms AS (
  SELECT t.doc_id, t.source,
         CAST(floor(-ln(CAST(c.cnt + 1 AS DOUBLE) / CAST(nv.nn + nv.vv AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT) AS tm
  FROM tris t JOIN counts c ON t.tri = c.tri, nv
),
per_doc AS (
  SELECT doc_id, source,
         (2 * CAST(sum(tm) AS BIGINT) + CAST(count(*) AS BIGINT))
           // (2 * CAST(count(*) AS BIGINT)) AS sc
  FROM terms GROUP BY doc_id, source
),
grp AS (SELECT sc, CAST(count(*) AS BIGINT) AS cnt FROM per_doc GROUP BY sc),
cum AS (
  SELECT sc, CAST(sum(cnt) OVER (ORDER BY sc) AS BIGINT) AS cum FROM grp
),
nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM per_doc),
thr AS (
  SELECT min(CASE WHEN 3 * cum >= nd THEN sc END) AS t1,
         min(CASE WHEN 3 * cum >= 2 * nd THEN sc END) AS t2
  FROM cum, nd
)
SELECT source,
       CASE WHEN sc <= t1 THEN 'head'
            WHEN sc <= t2 THEN 'middle'
            ELSE 'tail' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs
FROM per_doc, thr
GROUP BY 1, 2 ORDER BY 1, 2
"""


for _q in (
    QueryDef("text_gopher_rules", _text_gopher_rules, _GOPHER_SQL, ("text",)),
    QueryDef("text_ngram_novelty", _text_ngram_novelty, _NOVELTY_SQL, ("text",)),
    QueryDef(
        "text_perplexity_bucket", _text_perplexity_bucket, _PPL_SQL, ("text",)
    ),
):
    R6_QUERIES[_q.name] = _q


# =====================================================================
# Round-6 misc: HITS hubs/authorities, seasonal decomposition,
# weighted reproducible sampling, and the batch restatement of
# dropDuplicatesWithinWatermark.
# =====================================================================

HITS_ITERS = 3
HITS_TOPK = 12
SEASONAL_HALF = 12  # centered moving-average half-width (hours)
WRS_TOPK = 50
WRS_WCAP = 8  # weight = 1 + min(n_chars div 64, cap-1)
DEDUP_DELAY_S = 1800  # dropDuplicatesWithinWatermark horizon


def hits_bipartite(edges, iters: int = HITS_ITERS, topk: int = HITS_TOPK):
    """HITS hubs/authorities (Kleinberg 1999) over a directed bipartite
    edge list (``hub``, ``auth``), integer-exact: unnormalized scores
    after k mutual-reinforcement rounds are path COUNTS (hub_k = number
    of alternating paths of length 2k leaving the hub), so the whole
    iteration is int64 with no scaling division at all — the same
    discipline as pagerank_int, minus even the truncating div.

    Top-k per side via TakeOrderedAndProject (limit-then-rank, never a
    global window); ranks from a 2k-row broadcast self-join.

    Scale shape: the edge table persists once; each half-round is one
    broadcast join (rank tables are node-grain) + one
    map-side-combinable aggregate; localCheckpoint truncates the
    per-round lineage exactly as the PageRank loop does.

    Edge contract: the input is treated as a distinct (hub, auth) edge
    SET — duplicate edges are collapsed before iterating, so a
    multigraph edge list does NOT get weighted reinforcement. Callers
    wanting edge weights must pre-aggregate them upstream (both in-repo
    callers pass distinct-safe inputs)."""
    # pre-partition the cached edges by auth ONCE (the pagerank trick):
    # the per-round broadcast join preserves the stream side's
    # partitioning, so all 3 auth-grain aggregates run with ZERO
    # exchange — 6 edge shuffles collapse to 3 (+1 up-front). The edge
    # SET dedup rides the same exchange (r11): hashpartitioning(auth)
    # satisfies the (hub, auth)-clustered distribution the distinct
    # aggregate needs, so dedup-after-repartition is exchange-free —
    # callers pass the raw projection and the old separate
    # distinct-then-repartition double shuffle collapses to one.
    ed = edges.repartition("auth").dropDuplicates(["hub", "auth"]).persist()
    # round 1's auth half-step needs NO join (r12): every hub seeds at
    # hs=1, so sum(hs) per auth is exactly the auth's distinct-edge
    # count — a direct aggregate that rides the auth-keyed partitioning
    # with zero exchange, and the hub-distinct seed table (one exchange
    # + one broadcast build) disappears. Values identical: the seed
    # table contained every hub present in ed.
    hub = None
    auth = None
    for i in range(iters):
        if i == 0:
            auth = ed.groupBy("auth").agg(F.count(F.lit(1)).alias("as_"))
        else:
            auth = (
                ed.join(F.broadcast(hub), "hub")
                .groupBy("auth")
                .agg(F.sum("hs").alias("as_"))
            )
        hub = (
            ed.join(F.broadcast(auth), "auth")
            .groupBy("hub")
            .agg(F.sum("as_").alias("hs"))
        )
        hub = hub.localCheckpoint(eager=False)
        auth = auth.localCheckpoint(eager=False)
    top_h = (
        hub.orderBy(F.col("hs").desc(), F.col("hub"))
        .limit(topk)
        .select(
            F.lit("hub").alias("side"),
            F.col("hub").alias("node"),
            F.col("hs").alias("score"),
        )
    )
    top_a = (
        auth.orderBy(F.col("as_").desc(), F.col("auth"))
        .limit(topk)
        .select(
            F.lit("auth").alias("side"),
            F.col("auth").alias("node"),
            F.col("as_").alias("score"),
        )
    )
    both = top_h.unionByName(top_a)
    b2 = both.select(
        F.col("side").alias("s2"), F.col("node").alias("n2"), F.col("score").alias("sc2")
    )
    return (
        both.join(
            F.broadcast(b2),
            (F.col("s2") == F.col("side"))
            & (
                (F.col("sc2") > F.col("score"))
                | ((F.col("sc2") == F.col("score")) & (F.col("n2") < F.col("node")))
            ),
            "left",
        )
        .groupBy("side", "node", "score")
        .agg((F.count("n2") + 1).alias("rnk"))
        .orderBy("side", "rnk")
    )


def _graph_hits(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    # raw projection: hits_bipartite dedups on its own auth-keyed
    # exchange, so a distinct here would only add a second shuffle
    edges = li.select(
        F.col("l_suppkey").alias("hub"), F.col("l_partkey").alias("auth")
    )
    return hits_bipartite(edges)


def _hits_sql(iters: int = HITS_ITERS, topk: int = HITS_TOPK) -> str:
    parts = [
        "WITH ed AS (SELECT DISTINCT l_suppkey AS hub, l_partkey AS auth"
        " FROM lineitem),",
        "h0 AS (SELECT DISTINCT hub, CAST(1 AS BIGINT) AS hs FROM ed)",
    ]
    for i in range(iters):
        parts.append(
            f", a{i + 1} AS (SELECT ed.auth, CAST(sum(h.hs) AS BIGINT) AS as_"
            f" FROM ed JOIN h{i} h ON ed.hub = h.hub GROUP BY ed.auth)"
        )
        parts.append(
            f", h{i + 1} AS (SELECT ed.hub, CAST(sum(a.as_) AS BIGINT) AS hs"
            f" FROM ed JOIN a{i + 1} a ON ed.auth = a.auth GROUP BY ed.hub)"
        )
    parts.append(
        f""", top_h AS (
  SELECT 'hub' AS side, hub AS node, hs AS score
  FROM h{iters} ORDER BY hs DESC, hub LIMIT {topk}
),
top_a AS (
  SELECT 'auth' AS side, auth AS node, as_ AS score
  FROM a{iters} ORDER BY as_ DESC, auth LIMIT {topk}
),
both_t AS (SELECT * FROM top_h UNION ALL SELECT * FROM top_a)
SELECT a.side, a.node, a.score, CAST(1 + count(b.node) AS BIGINT) AS rnk
FROM both_t a LEFT JOIN both_t b
  ON b.side = a.side
 AND (b.score > a.score OR (b.score = a.score AND b.node < a.node))
GROUP BY a.side, a.node, a.score
ORDER BY a.side, rnk"""
    )
    return "\n".join(parts)


def seasonal_decompose(events, half: int = SEASONAL_HALF):
    """Classical additive seasonal decomposition of the hourly value
    stream: trend = centered (2·half+1)-hour moving average, seasonal =
    per hour-of-day mean residual — restated WITHOUT any window or
    range join: each hour row scatters into the 25 centered windows it
    belongs to (a map-side ±half explode on the CALENDAR-BOUNDED hour
    grain), so the moving average is one aggregate.  Only complete
    windows (all 25 hours present) contribute, the standard edge rule.

    Exactness: residuals stay scaled by the window size
    (resid25 = 25·tot − Σwindow, exact int64) so the per-hour-of-day
    mean is a single quantized division of integer sums.

    Scale shape: everything after the first aggregate runs at the hour
    grain — 8760 rows/year no matter how many events — and the
    hour-of-day rollup is 24 groups."""
    width = 2 * half + 1
    hourly = (
        events.select(
            F.expr("unix_micros(ts) div 3600000000").alias("hidx"),
            cents(F.col("value")).alias("c"),
        )
        .groupBy("hidx")
        .agg(F.sum("c").alias("tot"))
    )
    expand = hourly.select(
        "hidx",
        "tot",
        F.explode(F.sequence(F.lit(-half), F.lit(half))).alias("off"),
    ).select((F.col("hidx") + F.col("off")).alias("tgt"), "tot")
    win = expand.groupBy("tgt").agg(
        F.sum("tot").alias("wsum"), F.count(F.lit(1)).alias("wcnt")
    )
    j = hourly.join(win, hourly.hidx == win.tgt).where(F.col("wcnt") == width)
    resid = j.select(
        F.pmod(F.col("hidx"), F.lit(24)).alias("hour_of_day"),
        (F.lit(width) * F.col("tot") - F.col("wsum")).alias("resid_w"),
    )
    return (
        resid.groupBy("hour_of_day")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum("resid_w").alias("rs"),
        )
        .select(
            "hour_of_day",
            "n_obs",
            F.floor(
                F.col("rs")
                * 100.0
                / (F.lit(width) * F.col("n_obs")).cast("double")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("seasonal_c2"),
        )
        .orderBy("hour_of_day")
    )


def _ts_seasonal_decompose(spark, sf_dir):
    return seasonal_decompose(t(spark, sf_dir, "events"))


_SEASONAL_SQL = f"""
WITH hourly AS (
  SELECT epoch_us(ts) // 3600000000 AS hidx,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS tot
  FROM events GROUP BY 1
),
expand AS (
  SELECT hidx + o.off AS tgt, tot
  FROM hourly, (SELECT unnest(range(-{SEASONAL_HALF}, {SEASONAL_HALF + 1})) AS off) o
),
win AS (
  SELECT tgt, CAST(sum(tot) AS BIGINT) AS wsum, CAST(count(*) AS BIGINT) AS wcnt
  FROM expand GROUP BY tgt
),
resid AS (
  SELECT hidx % 24 AS hour_of_day,
         CAST({2 * SEASONAL_HALF + 1} * tot - wsum AS BIGINT) AS resid_w
  FROM hourly JOIN win ON hourly.hidx = win.tgt
  WHERE wcnt = {2 * SEASONAL_HALF + 1}
)
SELECT hour_of_day, CAST(count(*) AS BIGINT) AS n_obs,
       CAST(floor(CAST(sum(resid_w) AS DOUBLE) * 100.0
                  / CAST({2 * SEASONAL_HALF + 1} * count(*) AS DOUBLE)
                  + 0.5) AS BIGINT) AS seasonal_c2
FROM resid GROUP BY hour_of_day ORDER BY hour_of_day
"""


def weighted_sample(docs, topk: int = WRS_TOPK, wcap: int = WRS_WCAP):
    """Weighted reservoir sampling without replacement (the
    Efraimidis-Spirakis scheme in its EXACT integer form): an item of
    integer weight w races w independent md5 unit-draws and keeps the
    minimum — P(min of w uniforms < t) = 1-(1-t)^w, precisely the
    A-ES inclusion law — and the global sample is the k smallest
    per-item minima.  No logarithm, no float key: selection order is a
    pure int64 hash comparison, so the sample is bit-reproducible
    across engines, retries, and partitionings (the property RNG-based
    weighted sampling cannot give).

    Weights derive from doc length (1 + n_chars div 64, capped): the
    length-proportional sampling a token-budget curator uses.

    Scale shape: the unit explode is bounded by the weight CAP (a
    constant), the per-doc min rides the same map-side combine, and
    the global top-k is TakeOrderedAndProject — no global sort, no
    window."""
    w = (
        docs.select(
            "doc_id",
            (
                F.lit(1)
                + F.least(
                    F.floor(F.col("n_chars") / 64), F.lit(wcap - 1)
                )
            ).cast("long").alias("w"),
        )
    )
    units = w.select(
        "doc_id",
        "w",
        F.explode(F.sequence(F.lit(1), F.col("w"))).alias("j"),
    )
    hmin = (
        units.select(
            "doc_id",
            "w",
            _h32(
                F.concat(
                    F.lit("wrs:"),
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("j").cast("string"),
                )
            ).alias("h"),
        )
        .groupBy("doc_id", "w")
        .agg(F.min("h").alias("hmin"))
    )
    top = hmin.orderBy(F.col("hmin"), F.col("doc_id")).limit(topk)
    t2 = top.select(F.col("hmin").alias("h2"), F.col("doc_id").alias("d2"))
    return (
        top.join(
            F.broadcast(t2),
            (F.col("h2") < F.col("hmin"))
            | ((F.col("h2") == F.col("hmin")) & (F.col("d2") < F.col("doc_id"))),
            "left",
        )
        .groupBy("doc_id", "w", "hmin")
        .agg((F.count("d2") + 1).alias("rnk"))
        .orderBy("rnk")
    )


def _sample_weighted_units(spark, sf_dir):
    return weighted_sample(t(spark, sf_dir, "documents"))


_WRS_SQL = f"""
WITH w AS (
  SELECT doc_id,
         CAST(1 + least(n_chars // 64, {WRS_WCAP - 1}) AS BIGINT) AS w
  FROM documents
),
units AS (
  SELECT doc_id, w, u.j
  FROM w, LATERAL (SELECT unnest(range(1, w + 1)) AS j) u
),
hmin AS (
  SELECT doc_id, w,
         min(('0x' || substr(md5('wrs:' || CAST(doc_id AS VARCHAR) || ':'
              || CAST(j AS VARCHAR)), 1, 8))::BIGINT) AS hmin
  FROM units GROUP BY doc_id, w
),
top AS (SELECT * FROM hmin ORDER BY hmin, doc_id LIMIT {WRS_TOPK})
SELECT a.doc_id, a.w, a.hmin, CAST(1 + count(b.doc_id) AS BIGINT) AS rnk
FROM top a LEFT JOIN top b
  ON b.hmin < a.hmin OR (b.hmin = a.hmin AND b.doc_id < a.doc_id)
GROUP BY a.doc_id, a.w, a.hmin
ORDER BY rnk
"""


def dedup_within_delay(events, delay_s: int = DEDUP_DELAY_S):
    """Batch restatement of ``dropDuplicatesWithinWatermark`` semantics
    (the streaming run is pytest-verified against this): per
    (user_id, event_type) key, an event is KEPT iff it starts a new
    epoch — the first event, or the first more than ``delay_s`` after
    the previously KEPT one.  That recurrence is inherently sequential
    per key, so it folds INSIDE an array HOF over the key's sorted
    event times (state bounded per key, zero extra shuffles) — the
    same in-array discipline as corpus_cdc_chunks.

    Output: per event_type, total events, keys, kept, dropped — the
    dedup-rate audit a streaming pipeline reports per sink table."""
    per_key = (
        events.select(
            "user_id",
            "event_type",
            F.expr("unix_micros(ts) div 1000000").alias("sec"),
        )
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sort_array(F.collect_list("sec")).alias("arr"),
        )
    )
    init = F.struct(
        F.lit(-(2**50)).cast("long").alias("last"),
        F.lit(0).cast("long").alias("cnt"),
    )
    kept = F.aggregate(
        F.col("arr"),
        init,
        lambda acc, x: F.when(
            x > acc.last + delay_s,
            F.struct(x.alias("last"), (acc.cnt + 1).alias("cnt")),
        ).otherwise(acc),
    ).cnt
    flagged = per_key.select(
        "event_type", "n_events", kept.alias("n_kept")
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n_kept").alias("n_kept"),
            (F.sum("n_events") - F.sum("n_kept")).alias("n_dropped"),
        )
        .orderBy("event_type")
    )


def _stream_dedup_late(spark, sf_dir):
    return dedup_within_delay(t(spark, sf_dir, "events"))


# DuckDB's list_reduce takes no init value, so the fold state
# (last_kept_rel, cnt) packs into ONE BIGINT: cnt << 34 | rel_sec,
# with rel = sec - first + delay + 1 > delay so the sentinel 0 always
# keeps the first event.  34 bits of rel covers ~540 years.
_DEDUP_SQL = f"""
WITH per_key AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_events,
         list_sort(list(epoch_us(ts) // 1000000)) AS arr
  FROM events GROUP BY 1, 2
),
folded AS (
  SELECT event_type, n_events,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(arr, x -> x - arr[1] + {DEDUP_DELAY_S} + 1)),
           (acc, x) -> CASE WHEN x > (acc & {(1 << 34) - 1}) + {DEDUP_DELAY_S}
                            THEN (((acc >> 34) + 1) << 34) | x
                            ELSE acc END
         ) >> 34 AS n_kept
  FROM per_key
)
SELECT event_type, CAST(sum(n_events) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(n_kept) AS BIGINT) AS n_kept,
       CAST(sum(n_events) - sum(n_kept) AS BIGINT) AS n_dropped
FROM folded GROUP BY event_type ORDER BY event_type
"""


for _q in (
    QueryDef("graph_hits", _graph_hits, _hits_sql(), ("graph",)),
    QueryDef(
        "ts_seasonal_decompose", _ts_seasonal_decompose, _SEASONAL_SQL, ("ts",)
    ),
    QueryDef(
        "sample_weighted_units", _sample_weighted_units, _WRS_SQL, ("corpus",)
    ),
    QueryDef("stream_dedup_late", _stream_dedup_late, _DEDUP_SQL, ("stream",)),
):
    R6_QUERIES[_q.name] = _q



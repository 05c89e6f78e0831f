"""Round-6 continuation families (r6b): warehouse data-quality audits
(referential integrity, key-uniqueness, Benford first-digit screen),
model-evaluation operators (threshold sweep, decile lift/gains,
calibration bins, naive-Bayes train/apply/confusion), spatial
grid-bucketed joins, vocabulary-law statistics (Zipf, Heaps), embedding
random projection and MMR diversity selection, shard packing, BFS hop
labeling, and changepoint detection.

Exactness discipline (house rules, registry_util): every statistic is
either pure int64 arithmetic, or an IEEE-754 expression whose inputs
are exactly-representable int64 casts — both engines evaluate the
identical float expression tree — and every exported float/ln term is
quantized ``floor(x*10^k + 0.5)/10^k`` per term BEFORE any cross-row
sum (the fold-order rule).

Reference parity note: the reference repo (pandas/requests ETL —
``services/fitbit/fitbit_utils.py``, ``services/strava/utils.py``) has
no DQ/evaluation layer; these extend SURVEY.md §2's LLM-pipeline axis
(pipeline self-auditing, model-based curation QA, spatial/blocking
joins) the same way the round-4/5/6 families do.
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


# =====================================================================
# DQ wave: the audits a warehouse runs over its own star schema.
# =====================================================================

# The fixture schema's four FK edges (child.fk -> parent.pk).
_FK_EDGES = (
    ("orders.o_custkey->customer.c_custkey", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part.p_partkey", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier.s_suppkey", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
)


def referential_integrity(tables: dict):
    """Referential-integrity audit over every FK edge of the star
    schema: orphan child rows (FK with no parent), childless parent
    keys, and key cardinalities — the nightly gate a warehouse runs
    before publishing a snapshot.

    Scale shape: per edge, the child collapses to its FK-key grain with
    ONE partial-aggregated groupBy (the key domain, not the row count),
    the parent to its PK grain, and the audit is a single full-outer
    join of the two key-grain tables. Counts aggregate to one row per
    edge; no row-grain join ever happens. The four edges union into a
    4-row report."""
    outs = []
    for edge, child, fk, parent, pk, in _FK_EDGES:
        ck = (
            tables[child]
            .groupBy(F.col(fk).alias("k"))
            .agg(F.count(F.lit(1)).alias("n_rows"))
        )
        pkeys = tables[parent].select(F.col(pk).alias("k")).distinct()
        j = ck.join(
            pkeys.withColumn("has_parent", F.lit(1)), "k", "full_outer"
        )
        outs.append(
            j.agg(
                F.lit(edge).alias("edge"),
                F.sum(F.coalesce("n_rows", F.lit(0))).alias("n_child_rows"),
                F.count(F.col("n_rows")).alias("n_child_keys"),
                F.sum(
                    F.when(F.col("has_parent").isNull(), F.col("n_rows"))
                    .otherwise(0)
                ).alias("n_orphan_rows"),
                F.count(
                    F.when(
                        F.col("has_parent").isNull() & F.col("n_rows").isNotNull(),
                        1,
                    )
                ).alias("n_orphan_keys"),
                F.count(F.col("has_parent")).alias("n_parent_keys"),
                F.count(
                    F.when(
                        F.col("n_rows").isNull() & F.col("has_parent").isNotNull(),
                        1,
                    )
                ).alias("n_childless_keys"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("edge")


def _dq_referential_integrity(spark, sf_dir):
    tabs = {
        n: t(spark, sf_dir, n)
        for n in ("orders", "customer", "lineitem", "part", "supplier")
    }
    return referential_integrity(tabs)


def _ri_edge_sql(edge, child, fk, parent, pk):
    return f"""
SELECT '{edge}' AS edge,
       CAST(sum(COALESCE(n_rows, 0)) AS BIGINT) AS n_child_rows,
       CAST(count(n_rows) AS BIGINT) AS n_child_keys,
       CAST(sum(CASE WHEN has_parent IS NULL THEN n_rows ELSE 0 END)
            AS BIGINT) AS n_orphan_rows,
       CAST(count(CASE WHEN has_parent IS NULL AND n_rows IS NOT NULL
                  THEN 1 END) AS BIGINT) AS n_orphan_keys,
       CAST(count(has_parent) AS BIGINT) AS n_parent_keys,
       CAST(count(CASE WHEN n_rows IS NULL AND has_parent IS NOT NULL
                  THEN 1 END) AS BIGINT) AS n_childless_keys
FROM (SELECT {fk} AS k, CAST(count(*) AS BIGINT) AS n_rows
      FROM {child} GROUP BY 1) ck
FULL OUTER JOIN (SELECT DISTINCT {pk} AS k, 1 AS has_parent
                 FROM {parent}) pk USING (k)
"""


_RI_SQL = (
    "SELECT * FROM ("
    + " UNION ALL ".join(
        "(" + _ri_edge_sql(*e) + ")" for e in _FK_EDGES
    )
    + ") ORDER BY edge"
)


# Audited candidate keys: (entity label, table, key expr pair).
_UNIQ_KEYS = (
    ("customer.c_custkey", "customer", ("c_custkey",)),
    ("documents.doc_id", "documents", ("doc_id",)),
    ("events.event_id", "events", ("event_id",)),
    ("lineitem.l_orderkey:l_linenumber", "lineitem",
     ("l_orderkey", "l_linenumber")),
    ("orders.o_orderkey", "orders", ("o_orderkey",)),
    ("part.p_partkey", "part", ("p_partkey",)),
    ("supplier.s_suppkey", "supplier", ("s_suppkey",)),
)


def uniqueness_audit(tables: dict):
    """Candidate-key uniqueness audit: for each declared key (including
    lineitem's composite key), row count, null-key rows, distinct keys,
    the worst duplicate multiplicity, and the number of duplicated
    keys — the contract check every MERGE/SCD2 upstream depends on.

    Scale shape: one partial-aggregated groupBy per table AT THE KEY
    GRAIN, then a second aggregate over key groups to one row. Nothing
    ever leaves aggregate space; the 7 audits union into a 7-row
    report. Composite keys concatenate with a null-propagating concat
    so a null component audits as a null key."""
    outs = []
    for entity, table, cols in _UNIQ_KEYS:
        if len(cols) == 1:
            k = F.col(cols[0]).cast("string")
        else:
            k = F.concat(
                F.col(cols[0]).cast("string"),
                F.lit(":"),
                F.col(cols[1]).cast("string"),
            )
        g = (
            tables[table]
            .groupBy(k.alias("k"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        outs.append(
            g.agg(
                F.lit(entity).alias("entity"),
                F.sum("cnt").alias("n_rows"),
                F.sum(
                    F.when(F.col("k").isNull(), F.col("cnt")).otherwise(0)
                ).alias("n_null_rows"),
                F.count(F.col("k")).alias("n_distinct"),
                F.max(
                    F.when(F.col("k").isNotNull(), F.col("cnt"))
                ).alias("max_mult"),
                F.count(
                    F.when(F.col("k").isNotNull() & (F.col("cnt") > 1), 1)
                ).alias("n_dup_keys"),
            ).select(
                "*",
                (
                    (F.col("n_dup_keys") == 0) & (F.col("n_null_rows") == 0)
                ).alias("unique_ok"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("entity")


def _dq_uniqueness_audit(spark, sf_dir):
    tabs = {
        n: t(spark, sf_dir, n)
        for n in (
            "customer", "documents", "events", "lineitem", "orders",
            "part", "supplier",
        )
    }
    return uniqueness_audit(tabs)


def _uniq_one_sql(entity, table, cols):
    if len(cols) == 1:
        kexpr = f"CAST({cols[0]} AS VARCHAR)"
    else:
        kexpr = (
            f"CAST({cols[0]} AS VARCHAR) || ':' || CAST({cols[1]} AS VARCHAR)"
        )
    return f"""
SELECT '{entity}' AS entity,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN k IS NULL THEN cnt ELSE 0 END) AS BIGINT)
           AS n_null_rows,
       CAST(count(k) AS BIGINT) AS n_distinct,
       max(CASE WHEN k IS NOT NULL THEN cnt END) AS max_mult,
       CAST(count(CASE WHEN k IS NOT NULL AND cnt > 1 THEN 1 END)
            AS BIGINT) AS n_dup_keys,
       (count(CASE WHEN k IS NOT NULL AND cnt > 1 THEN 1 END) = 0
        AND sum(CASE WHEN k IS NULL THEN cnt ELSE 0 END) = 0) AS unique_ok
FROM (SELECT {kexpr} AS k, CAST(count(*) AS BIGINT) AS cnt
      FROM {table} GROUP BY 1) g
"""


_UNIQ_SQL = (
    "SELECT * FROM ("
    + " UNION ALL ".join(
        "(" + _uniq_one_sql(*u) + ")" for u in _UNIQ_KEYS
    )
    + ") ORDER BY entity"
)


# Benford expected first-digit proportions, log10(1 + 1/d), nano-
# quantized ONCE here as shared literals — both engines compare against
# the identical integers, so no engine ever evaluates log10.
_BENFORD_NANO = (
    (1, 301029996),
    (2, 176091259),
    (3, 124938737),
    (4, 96910013),
    (5, 79181246),
    (6, 66946790),
    (7, 57991947),
    (8, 51152522),
    (9, 45757491),
)


def benford_digits(orders):
    """Benford first-significant-digit screen over order totals: the
    classic fabricated-data / unit-mix detector a DQ pipeline runs on
    monetary columns. Observed digit counts vs the Benford expectation
    (nano-quantized literal constants, so neither engine evaluates a
    log), with the chi-square contribution per digit micro-quantized
    from exact int64 inputs before the 9-term sum (fold-order rule).

    Scale shape: ONE scan collapsing to the 9-digit grain (first digit
    read from the decimal string of the exact cents value — no float
    log10); the expectation join is a 9x9 broadcast of literals and the
    chi-square total is a broadcast 1-row aggregate."""
    digits = orders.select(
        F.substring(cents(F.col("o_totalprice")).cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    obs = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    exp = F.broadcast(
        orders.sparkSession.createDataFrame(
            list(_BENFORD_NANO), "digit int, p_nano long"
        )
    )
    n_tot = obs.agg(F.sum("n_obs").alias("n_tot"))
    terms = (
        obs.join(exp, "digit")
        .join(F.broadcast(n_tot))
        .select(
            "digit",
            "n_obs",
            (F.col("n_tot") * F.col("p_nano")).alias("exp_nano"),
            F.floor(
                (
                    (F.col("n_obs") * F.lit(1000000000) - F.col("n_tot") * F.col("p_nano"))
                    .cast("double")
                    * (F.col("n_obs") * F.lit(1000000000) - F.col("n_tot") * F.col("p_nano"))
                    .cast("double")
                )
                / (F.col("n_tot") * F.col("p_nano")).cast("double")
                / 1.0e9
                * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("term_micro"),
        )
    )
    chi = terms.agg(F.sum("term_micro").alias("chi2_micro"))
    return (
        terms.join(F.broadcast(chi))
        .select("digit", "n_obs", "exp_nano", "term_micro", "chi2_micro")
        .orderBy("digit")
    )


def _dq_benford_digits(spark, sf_dir):
    return benford_digits(t(spark, sf_dir, "orders"))


_BENFORD_VALUES = ", ".join(f"({d}, {p})" for d, p in _BENFORD_NANO)

_BENFORD_SQL = f"""
WITH obs AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         CAST(count(*) AS BIGINT) AS n_obs
  FROM orders GROUP BY 1
),
exp(digit, p_nano) AS (VALUES {_BENFORD_VALUES}),
tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_tot FROM obs),
terms AS (
  SELECT obs.digit, n_obs,
         CAST(n_tot * p_nano AS BIGINT) AS exp_nano,
         CAST(floor(
           CAST(n_obs * 1000000000 - n_tot * p_nano AS DOUBLE)
           * CAST(n_obs * 1000000000 - n_tot * p_nano AS DOUBLE)
           / CAST(n_tot * p_nano AS DOUBLE) / 1.0e9 * 1000000 + 0.5
         ) AS BIGINT) AS term_micro
  FROM obs JOIN exp ON obs.digit = exp.digit, tot
),
chi AS (SELECT CAST(sum(term_micro) AS BIGINT) AS chi2_micro FROM terms)
SELECT digit, n_obs, exp_nano, term_micro, chi2_micro
FROM terms, chi ORDER BY digit
"""


for _q in (
    QueryDef(
        "dq_referential_integrity",
        _dq_referential_integrity,
        _RI_SQL,
        ("dq",),
    ),
    QueryDef("dq_uniqueness_audit", _dq_uniqueness_audit, _UNIQ_SQL, ("dq",)),
    QueryDef("dq_benford_digits", _dq_benford_digits, _BENFORD_SQL, ("dq",)),
):
    R6B_QUERIES[_q.name] = _q


# =====================================================================
# Model-evaluation wave: the operators that grade a scoring model (or
# a heuristic curation rule) against observed labels. Labels/scores
# reuse the statistics family's A/B convention: positives are 'click'
# events, negatives 'view', the score is the exact cents value.
# =====================================================================

ML_POS = "click"
ML_NEG = "view"

# Literal score thresholds (cents) for the confusion sweep — the grid a
# deployment chooses its operating point from.
ML_THRESHOLDS = (500, 1000, 2000, 4000, 6000, 8000, 12000, 20000)


def _pos_neg_grain(events):
    """Distinct-score-grain counts (v, pos_cnt, neg_cnt) with broadcast
    totals (n_pos, n_neg) attached — the shared input of the evaluation
    family. One shuffle keyed on the bounded score domain."""
    pn = events.where(F.col("event_type").isin(ML_POS, ML_NEG)).select(
        cents(F.col("value")).alias("v"),
        F.when(F.col("event_type") == ML_POS, 1).otherwise(0).alias("p"),
        F.when(F.col("event_type") == ML_NEG, 1).otherwise(0).alias("n"),
    )
    g = pn.groupBy("v").agg(
        F.sum("p").alias("pos_cnt"), F.sum("n").alias("neg_cnt")
    )
    tot = g.agg(
        F.sum("pos_cnt").alias("n_pos"), F.sum("neg_cnt").alias("n_neg")
    )
    return g.join(F.broadcast(tot))


_PN_CTE = f"""
pn AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
         CASE WHEN event_type = '{ML_POS}' THEN 1 ELSE 0 END AS p,
         CASE WHEN event_type = '{ML_NEG}' THEN 1 ELSE 0 END AS n
  FROM events WHERE event_type IN ('{ML_POS}', '{ML_NEG}')
),
g AS (
  SELECT v, CAST(sum(p) AS BIGINT) AS pos_cnt,
         CAST(sum(n) AS BIGINT) AS neg_cnt
  FROM pn GROUP BY v
),
tot AS (
  SELECT CAST(sum(pos_cnt) AS BIGINT) AS n_pos,
         CAST(sum(neg_cnt) AS BIGINT) AS n_neg
  FROM g
)
"""


def threshold_sweep(events, thresholds=ML_THRESHOLDS):
    """Confusion-matrix sweep: TP/FP/FN/TN and micro-quantized
    precision/recall/F1/accuracy at each literal score threshold
    (predict positive when score >= T) — the operating-point table
    behind every curation-rule tuning decision.

    All metrics are PURE integer arithmetic (floor division on int64
    counts); nothing float ever crosses an aggregate. Scale shape: the
    distinct-score grain expands by the fixed |thresholds| factor and
    collapses immediately to one row per threshold — bounded by the
    score domain, never the row count."""
    g = _pos_neg_grain(events)
    thr = F.explode(
        F.array([F.lit(x).cast("long") for x in thresholds])
    ).alias("thr_cents")
    per = g.select("v", "pos_cnt", "neg_cnt", "n_pos", "n_neg", thr)
    agg = per.groupBy("thr_cents", "n_pos", "n_neg").agg(
        F.sum(F.when(F.col("v") >= F.col("thr_cents"), F.col("pos_cnt")).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("v") >= F.col("thr_cents"), F.col("neg_cnt")).otherwise(0)).alias("fp"),
    )
    return agg.select(
        "thr_cents",
        "tp",
        "fp",
        (F.col("n_pos") - F.col("tp")).alias("fn"),
        (F.col("n_neg") - F.col("fp")).alias("tn"),
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.expr("(1000000 * tp) div (tp + fp)"),
        ).alias("precision_micro"),
        F.expr("(1000000 * tp) div n_pos").alias("recall_micro"),
        F.when(
            2 * F.col("tp") + (F.col("n_pos") - F.col("tp")) + F.col("fp") > 0,
            F.expr("(2000000 * tp) div (2 * tp + (n_pos - tp) + fp)"),
        ).alias("f1_micro"),
        F.expr(
            "(1000000 * (tp + (n_neg - fp))) div (n_pos + n_neg)"
        ).alias("accuracy_micro"),
    ).orderBy("thr_cents")


def _ml_threshold_sweep(spark, sf_dir):
    return threshold_sweep(t(spark, sf_dir, "events"))


_THR_LIST = ", ".join(f"CAST({x} AS BIGINT)" for x in ML_THRESHOLDS)

_THR_SQL = f"""
WITH {_PN_CTE},
per AS (
  SELECT g.*, tot.n_pos, tot.n_neg, u.thr_cents
  FROM g, tot, unnest([{_THR_LIST}]) AS u(thr_cents)
),
agg AS (
  SELECT thr_cents, n_pos, n_neg,
         CAST(sum(CASE WHEN v >= thr_cents THEN pos_cnt ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN v >= thr_cents THEN neg_cnt ELSE 0 END) AS BIGINT) AS fp
  FROM per GROUP BY 1, 2, 3
)
SELECT thr_cents, tp, fp,
       n_pos - tp AS fn, n_neg - fp AS tn,
       CASE WHEN tp + fp > 0 THEN (1000000 * tp) // (tp + fp) END
           AS precision_micro,
       (1000000 * tp) // n_pos AS recall_micro,
       CASE WHEN 2 * tp + (n_pos - tp) + fp > 0
            THEN (2000000 * tp) // (2 * tp + (n_pos - tp) + fp) END
           AS f1_micro,
       (1000000 * (tp + (n_neg - fp))) // (n_pos + n_neg) AS accuracy_micro
FROM agg ORDER BY thr_cents
"""


def lift_gains(events):
    """Decile lift/gains table: rank the scored population by score
    descending, split into 10 rank deciles (a tied score group lands
    wholly in the decile of its last member — deterministic on both
    engines), and report per-decile positives, cumulative gains, and
    lift vs the base rate — the campaign-targeting curve.

    Exactness: decile assignment and gains are pure int64; lift is the
    one quantized division, computed double-from-exact-ints so it can
    never overflow at any scale. Scale shape: descending cumulative
    counts come from the ascending distinct-score grain by reflection
    (n_tot - cum + group), the decile collapse is a 10-row aggregate,
    and the cumulative-over-deciles step is a triangular self-join of
    the 10-row table — no partition-less window anywhere."""
    g = _pos_neg_grain(events)
    # ascending cumulative totals at the distinct-score grain via the
    # coarse-bucket hierarchical prefix (value domain-bounded)
    from pyspark.sql import Window

    g = g.withColumn("bkt", F.floor(F.col("v") / 4096))
    w = (
        Window.partitionBy("bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = g.select(
        "v", "bkt", "pos_cnt", "neg_cnt", "n_pos", "n_neg",
        F.sum(F.col("pos_cnt") + F.col("neg_cnt")).over(w).alias("c_in"),
    )
    btot = g.groupBy("bkt").agg(
        F.sum(F.col("pos_cnt") + F.col("neg_cnt")).alias("bn")
    )
    offs = (
        btot.select(F.col("bkt").alias("k"))
        .join(btot.select(F.col("bkt").alias("k2"), "bn"), F.col("k2") < F.col("k"))
        .groupBy("k")
        .agg(F.sum("bn").alias("off"))
    )
    cum = within.join(F.broadcast(offs), within.bkt == offs.k, "left").select(
        "v", "pos_cnt", "neg_cnt", "n_pos", "n_neg",
        (F.col("c_in") + F.coalesce("off", F.lit(0))).alias("cum_le"),
    )
    dec = cum.select(
        "pos_cnt", "neg_cnt", "n_pos", "n_neg",
        F.expr(
            "((n_pos + n_neg - cum_le + pos_cnt + neg_cnt - 1) * 10)"
            " div (n_pos + n_neg)"
        ).alias("decile"),
    )
    per = dec.groupBy("decile", "n_pos", "n_neg").agg(
        F.sum(F.col("pos_cnt") + F.col("neg_cnt")).alias("n"),
        F.sum("pos_cnt").alias("pos"),
    )
    cumd = (
        per.select(F.col("decile").alias("d"), "n_pos", "n_neg", "n", "pos")
        .join(
            F.broadcast(
                per.select(
                    F.col("decile").alias("d2"), F.col("pos").alias("p2")
                )
            ),
            F.col("d2") <= F.col("d"),
        )
        .groupBy("d", "n_pos", "n_neg", "n", "pos")
        .agg(F.sum("p2").alias("cum_pos"))
    )
    return cumd.select(
        F.col("d").alias("decile"),
        "n",
        "pos",
        "cum_pos",
        F.expr("(1000000 * cum_pos) div n_pos").alias("gain_micro"),
        (
            F.floor(
                F.col("pos").cast("double")
                * (F.col("n_pos") + F.col("n_neg")).cast("double")
                / (F.col("n").cast("double") * F.col("n_pos").cast("double"))
                * 1000000
                + F.lit(0.5)
            )
        ).alias("lift_micro"),
    ).orderBy("decile")


def _ml_lift_gains(spark, sf_dir):
    return lift_gains(t(spark, sf_dir, "events"))


_LIFT_SQL = f"""
WITH {_PN_CTE},
cum AS (
  SELECT v, pos_cnt, neg_cnt,
         CAST(sum(pos_cnt + neg_cnt) OVER (ORDER BY v) AS BIGINT) AS cum_le
  FROM g
),
dec AS (
  SELECT pos_cnt, neg_cnt,
         ((n_pos + n_neg - cum_le + pos_cnt + neg_cnt - 1) * 10)
             // (n_pos + n_neg) AS decile,
         n_pos, n_neg
  FROM cum, tot
),
per AS (
  SELECT decile, n_pos, n_neg,
         CAST(sum(pos_cnt + neg_cnt) AS BIGINT) AS n,
         CAST(sum(pos_cnt) AS BIGINT) AS pos
  FROM dec GROUP BY 1, 2, 3
),
cumd AS (
  SELECT a.decile, a.n_pos, a.n_neg, a.n, a.pos,
         CAST(sum(b.pos) AS BIGINT) AS cum_pos
  FROM per a JOIN per b ON b.decile <= a.decile
  GROUP BY 1, 2, 3, 4, 5
)
SELECT decile, n, pos, cum_pos,
       (1000000 * cum_pos) // n_pos AS gain_micro,
       CAST(floor(CAST(pos AS DOUBLE) * CAST(n_pos + n_neg AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n_pos AS DOUBLE))
                  * 1000000 + 0.5) AS BIGINT) AS lift_micro
FROM cumd ORDER BY decile
"""


CALIB_BIN_CENTS = 4000
CALIB_MAX_BIN = 9


def calibration_bins(events, width: int = CALIB_BIN_CENTS):
    """Calibration/reliability table: equal-width score bins (top bin
    open-ended), empirical positive rate per bin vs the global base
    rate, and the signed gap — how far the score is from being a
    calibrated probability proxy per region of its range.

    Pure integer rates (micro floor-division); one scan to the bounded
    bin grain plus a broadcast 1-row base rate."""
    pn = events.where(F.col("event_type").isin(ML_POS, ML_NEG)).select(
        F.least(
            F.floor(cents(F.col("value")) / width), F.lit(CALIB_MAX_BIN)
        ).cast("long").alias("bin"),
        F.when(F.col("event_type") == ML_POS, 1).otherwise(0).alias("p"),
    )
    per = pn.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"), F.sum("p").alias("pos")
    )
    tot = per.agg(
        F.sum("n").alias("n_tot"), F.sum("pos").alias("pos_tot")
    )
    return (
        per.join(F.broadcast(tot))
        .select(
            "bin",
            "n",
            "pos",
            F.expr("(1000000 * pos) div n").alias("rate_micro"),
            F.expr("(1000000 * pos_tot) div n_tot").alias("base_micro"),
            (
                F.expr("(1000000 * pos) div n")
                - F.expr("(1000000 * pos_tot) div n_tot")
            ).alias("gap_micro"),
        )
        .orderBy("bin")
    )


def _ml_calibration_bins(spark, sf_dir):
    return calibration_bins(t(spark, sf_dir, "events"))


_CALIB_SQL = f"""
WITH pn AS (
  SELECT least(CAST(floor(value * 100 + 0.5) AS BIGINT) // {CALIB_BIN_CENTS},
               {CALIB_MAX_BIN}) AS bin,
         CASE WHEN event_type = '{ML_POS}' THEN 1 ELSE 0 END AS p
  FROM events WHERE event_type IN ('{ML_POS}', '{ML_NEG}')
),
per AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(p) AS BIGINT) AS pos
  FROM pn GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_tot, CAST(sum(pos) AS BIGINT) AS pos_tot
  FROM per
)
SELECT bin, n, pos,
       (1000000 * pos) // n AS rate_micro,
       (1000000 * pos_tot) // n_tot AS base_micro,
       (1000000 * pos) // n - (1000000 * pos_tot) // n_tot AS gap_micro
FROM per, tot ORDER BY bin
"""


# --------------------------------------------------------- NAIVE BAYES

NB_SMOOTH = 1  # add-1 Laplace


def naive_bayes_confusion(docs):
    """Multinomial naive Bayes trained on even doc_ids (source as the
    class label, whitespace tokens as features, add-1 smoothing) and
    applied to odd doc_ids; output is the test confusion matrix — the
    model-based source-attribution QA a curation pipeline runs to
    detect label leakage or source drift.

    Exactness: each log-likelihood term ln((cnt+1)/(n_c+V)) is computed
    from exact int64 counts and micro-nat-quantized PER TERM before the
    integer (count-weighted) per-doc sum, and the class prior joins the
    same way — the argmax compares identical int64 scores on both
    engines (ties break to the smallest class index).

    Scale shape: the model is (class x vocab) — charset/vocabulary-
    bounded, hence broadcastable; training is one shuffle to the
    (class, token) grain; scoring fans the (doc, token) grain out by
    the bounded class count through broadcast joins and collapses with
    one doc-grain aggregate. No windows, no row-grain joins."""
    toks = docs.select(
        "doc_id",
        F.substring("source", 4, 8).cast("int").alias("src_idx"),
        F.explode(_tok(F.col("text"))).alias("tok"),
    )
    train = toks.where(F.col("doc_id") % 2 == 0)
    test = toks.where(F.col("doc_id") % 2 == 1)

    tc = train.groupBy("src_idx", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    ct = tc.groupBy("src_idx").agg(F.sum("cnt").alias("n_tok_c"))
    vocab = tc.select("tok").distinct().agg(F.count(F.lit(1)).alias("vv"))
    prior = (
        train.select("doc_id", "src_idx")
        .distinct()
        .groupBy("src_idx")
        .agg(F.count(F.lit(1)).alias("n_docs_c"))
    )
    n_train = prior.agg(F.sum("n_docs_c").alias("n_train"))

    dt = test.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c_t"))
    classes = ct.select("src_idx", "n_tok_c")
    grid = (
        dt.join(F.broadcast(classes.select(F.col("src_idx").alias("cls"), "n_tok_c")))
        .join(
            F.broadcast(tc.select(F.col("src_idx").alias("cls"), "tok", "cnt")),
            ["cls", "tok"],
            "left",
        )
        .join(F.broadcast(vocab))
        .select(
            "doc_id",
            "cls",
            (
                F.col("c_t")
                * F.floor(
                    F.log(
                        (F.coalesce("cnt", F.lit(0)) + NB_SMOOTH).cast("double")
                        / (F.col("n_tok_c") + F.col("vv")).cast("double")
                    )
                    * 1000000
                    + F.lit(0.5)
                ).cast("long")
            ).alias("term_micro"),
        )
    )
    scores = grid.groupBy("doc_id", "cls").agg(
        F.sum("term_micro").alias("ll_micro")
    )
    prior_m = (
        prior.join(F.broadcast(n_train))
        .select(
            F.col("src_idx").alias("cls"),
            F.floor(
                F.log(
                    F.col("n_docs_c").cast("double")
                    / F.col("n_train").cast("double")
                )
                * 1000000
                + F.lit(0.5)
            ).cast("long").alias("prior_micro"),
        )
    )
    total = scores.join(F.broadcast(prior_m), "cls").select(
        "doc_id",
        "cls",
        (F.col("ll_micro") + F.col("prior_micro")).alias("score_micro"),
    )
    pred = total.groupBy("doc_id").agg(
        F.max(
            F.struct(F.col("score_micro"), (-F.col("cls")).alias("nc"))
        ).alias("m")
    ).select("doc_id", (-F.col("m.nc")).alias("pred_idx"))
    truth = docs.where(F.col("doc_id") % 2 == 1).select(
        "doc_id", F.substring("source", 4, 8).cast("int").alias("true_idx")
    )
    return (
        truth.join(pred, "doc_id")
        .groupBy("true_idx", "pred_idx")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.concat(F.lit("src"), F.col("true_idx").cast("string")).alias(
                "true_source"
            ),
            F.concat(F.lit("src"), F.col("pred_idx").cast("string")).alias(
                "pred_source"
            ),
            "n",
        )
        .orderBy("true_source", "pred_source")
    )


def _ml_naive_bayes(spark, sf_dir):
    return naive_bayes_confusion(t(spark, sf_dir, "documents"))


_NB_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         CAST(substr(source, 4, 8) AS INTEGER) AS src_idx,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM documents
),
train AS (SELECT * FROM toks WHERE doc_id % 2 = 0),
test AS (SELECT * FROM toks WHERE doc_id % 2 = 1),
tc AS (
  SELECT src_idx, tok, CAST(count(*) AS BIGINT) AS cnt
  FROM train GROUP BY 1, 2
),
ct AS (
  SELECT src_idx, CAST(sum(cnt) AS BIGINT) AS n_tok_c FROM tc GROUP BY 1
),
vocab AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vv FROM tc),
prior AS (
  SELECT src_idx, CAST(count(*) AS BIGINT) AS n_docs_c
  FROM (SELECT DISTINCT doc_id, src_idx FROM train) GROUP BY 1
),
n_train AS (SELECT CAST(sum(n_docs_c) AS BIGINT) AS n_train FROM prior),
dt AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c_t
  FROM test GROUP BY 1, 2
),
grid AS (
  SELECT dt.doc_id, ct.src_idx AS cls,
         c_t * CAST(floor(
           ln(CAST(COALESCE(tc.cnt, 0) + {NB_SMOOTH} AS DOUBLE)
              / CAST(ct.n_tok_c + vocab.vv AS DOUBLE)) * 1000000 + 0.5
         ) AS BIGINT) AS term_micro
  FROM dt
  CROSS JOIN ct
  LEFT JOIN tc ON tc.src_idx = ct.src_idx AND tc.tok = dt.tok
  CROSS JOIN vocab
),
scores AS (
  SELECT doc_id, cls, CAST(sum(term_micro) AS BIGINT) AS ll_micro
  FROM grid GROUP BY 1, 2
),
prior_m AS (
  SELECT src_idx AS cls,
         CAST(floor(ln(CAST(n_docs_c AS DOUBLE) / CAST(n_train AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT) AS prior_micro
  FROM prior, n_train
),
total AS (
  SELECT doc_id, cls, ll_micro + prior_micro AS score_micro
  FROM scores JOIN prior_m USING (cls)
),
best AS (
  SELECT doc_id, max(score_micro) AS ms FROM total GROUP BY doc_id
),
pred AS (
  SELECT t.doc_id, min(t.cls) AS pred_idx
  FROM total t JOIN best b ON t.doc_id = b.doc_id AND t.score_micro = b.ms
  GROUP BY t.doc_id
),
truth AS (
  SELECT doc_id, CAST(substr(source, 4, 8) AS INTEGER) AS true_idx
  FROM documents WHERE doc_id % 2 = 1
)
SELECT 'src' || CAST(true_idx AS VARCHAR) AS true_source,
       'src' || CAST(pred_idx AS VARCHAR) AS pred_source,
       CAST(count(*) AS BIGINT) AS n
FROM truth JOIN pred USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


for _q in (
    QueryDef("ml_threshold_sweep", _ml_threshold_sweep, _THR_SQL, ("ml",)),
    QueryDef("ml_lift_gains", _ml_lift_gains, _LIFT_SQL, ("ml",)),
    QueryDef(
        "ml_calibration_bins", _ml_calibration_bins, _CALIB_SQL, ("ml",)
    ),
    QueryDef("ml_naive_bayes", _ml_naive_bayes, _NB_SQL, ("ml",)),
):
    R6B_QUERIES[_q.name] = _q


# =====================================================================
# Spatial wave: grid-bucketed spatial joins. Coordinates derive from
# the portable md5 hash; the grid side count is floor(sqrt(n)) cells
# (sqrt is IEEE-correctly-rounded on both engines), so point density
# per cell is ~1 AT ANY SCALE — the 3x3 neighborhood candidate set
# stays O(1) per query from sf0.001 to 100 TB. This is the standard
# uniform-grid spatial index re-expressed as an equi-join.
# =====================================================================

GEO_CELL = 1000          # cell side length in coordinate units
GEO_R2 = 1000 * 1000     # radius^2 (radius = one cell side)
GEO_QUERY_MOD = 20       # every 20th part is a query point


def _geo_points(part):
    """(id, x, y, cell_x, cell_y) for every part, on a coordinate
    domain of floor(sqrt(n)) cells per side (broadcast 1-row n)."""
    base = part.select(F.col("p_partkey").alias("id"))
    n1 = base.agg(F.count(F.lit(1)).alias("npts"))
    return (
        base.join(F.broadcast(n1))
        .select(
            "id",
            F.greatest(
                F.lit(1), F.floor(F.sqrt(F.col("npts").cast("double")))
            ).cast("long").alias("dcells"),
            (_h32(F.concat(F.col("id").cast("string"), F.lit("gx")))).alias("hx"),
            (_h32(F.concat(F.col("id").cast("string"), F.lit("gy")))).alias("hy"),
        )
        .select(
            "id",
            (F.col("hx") % (F.col("dcells") * GEO_CELL)).alias("x"),
            (F.col("hy") % (F.col("dcells") * GEO_CELL)).alias("y"),
        )
        .select(
            "id", "x", "y",
            F.expr(f"x div {GEO_CELL}").alias("cell_x"),
            F.expr(f"y div {GEO_CELL}").alias("cell_y"),
        )
    )


_GEO_PTS_CTE = f"""
npts AS (SELECT CAST(count(*) AS BIGINT) AS npts FROM part),
pts0 AS (
  SELECT p_partkey AS id,
         greatest(1, CAST(floor(sqrt(CAST(npts AS DOUBLE))) AS BIGINT))
             AS dcells,
         ('0x' || substr(md5(CAST(p_partkey AS VARCHAR) || 'gx'), 1, 8))::BIGINT AS hx,
         ('0x' || substr(md5(CAST(p_partkey AS VARCHAR) || 'gy'), 1, 8))::BIGINT AS hy
  FROM part, npts
),
pts AS (
  SELECT id, hx % (dcells * {GEO_CELL}) AS x, hy % (dcells * {GEO_CELL}) AS y,
         (hx % (dcells * {GEO_CELL})) // {GEO_CELL} AS cell_x,
         (hy % (dcells * {GEO_CELL})) // {GEO_CELL} AS cell_y
  FROM pts0
)
"""


def geo_grid_knn(part):
    """Radius-bounded nearest-neighbor spatial join: for every sampled
    query point, the count of points within radius R and the nearest
    one, found by probing only the 3x3 grid neighborhood (R = one cell
    side, so the neighborhood provably covers the ball).

    Scale shape: candidates come from ONE composite-key equi-join on
    (cell_x, cell_y) after a fixed 9-way offset expansion of the query
    side — never a distance cross-join. With floor(sqrt(n)) cells per
    side the expected occupancy is 1 point/cell at every SF, so
    per-query candidate work is O(1); the argmin is a max(struct)
    aggregate, and no-neighbor queries re-attach with one left join at
    the query grain."""
    pts = _geo_points(part)
    q = pts.where(F.col("id") % GEO_QUERY_MOD == 0)
    qx = (
        q.select(
            F.col("id").alias("qid"),
            F.col("x").alias("qx"),
            F.col("y").alias("qy"),
            "cell_x",
            "cell_y",
            F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dx"),
        )
        .select(
            "qid", "qx", "qy", "cell_y",
            (F.col("cell_x") + F.col("dx")).alias("pcx"),
            F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dy"),
        )
        .select(
            "qid", "qx", "qy", "pcx",
            (F.col("cell_y") + F.col("dy")).alias("pcy"),
        )
    )
    cand = (
        qx.join(
            pts,
            (qx.pcx == pts.cell_x) & (qx.pcy == pts.cell_y),
        )
        .where(F.col("id") != F.col("qid"))
        .select(
            "qid",
            "id",
            (
                (F.col("x") - F.col("qx")) * (F.col("x") - F.col("qx"))
                + (F.col("y") - F.col("qy")) * (F.col("y") - F.col("qy"))
            ).alias("d2"),
        )
        .where(F.col("d2") <= GEO_R2)
    )
    agg = cand.groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_within_r"),
        F.max(
            F.struct((-F.col("d2")).alias("nd"), (-F.col("id")).alias("ni"))
        ).alias("m"),
    )
    return (
        q.select(F.col("id").alias("qid"))
        .join(agg, "qid", "left")
        .select(
            F.col("qid").alias("query_id"),
            F.coalesce("n_within_r", F.lit(0)).alias("n_within_r"),
            (-F.col("m.ni")).alias("nn_id"),
            (-F.col("m.nd")).alias("nn_d2"),
        )
        .orderBy("query_id")
    )


def _geo_grid_knn(spark, sf_dir):
    return geo_grid_knn(t(spark, sf_dir, "part"))


_GEO_KNN_SQL = f"""
WITH {_GEO_PTS_CTE},
q AS (SELECT * FROM pts WHERE id % {GEO_QUERY_MOD} = 0),
cand AS (
  SELECT q.id AS qid, p.id AS id,
         (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y) AS d2
  FROM q, unnest([-1, 0, 1]) AS u1(dx), unnest([-1, 0, 1]) AS u2(dy)
  JOIN pts p
    ON p.cell_x = q.cell_x + u1.dx AND p.cell_y = q.cell_y + u2.dy
  WHERE p.id <> q.id
    AND (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y) <= {GEO_R2}
),
agg AS (
  SELECT qid, CAST(count(*) AS BIGINT) AS n_within_r,
         min(d2) AS md2
  FROM cand GROUP BY qid
),
nn AS (
  SELECT c.qid, min(c.id) AS nn_id
  FROM cand c JOIN agg a ON c.qid = a.qid AND c.d2 = a.md2
  GROUP BY c.qid
)
SELECT q.id AS query_id,
       COALESCE(a.n_within_r, 0) AS n_within_r,
       nn.nn_id, a.md2 AS nn_d2
FROM q LEFT JOIN agg a ON q.id = a.qid LEFT JOIN nn ON q.id = nn.qid
ORDER BY query_id
"""


GEO_BOX_MAXHALF = 2000  # max rectangle half-side (covers <= 3 cells/axis)


def geo_bbox_contain(part, supplier):
    """Spatial containment join: deterministic hash-derived rectangles
    (one per supplier) against the part point cloud; per rectangle, the
    number of contained points. The rectangle explodes to the grid
    cells it covers (bounded by the literal max half-side / cell size,
    i.e. <= 5x5 cells), candidates come from the same (cell_x, cell_y)
    equi-join as the kNN key, and exact containment filters after —
    the textbook grid variant of an R-tree probe, in one shuffle."""
    pts = _geo_points(part)
    npts = part.agg(F.count(F.lit(1)).alias("npts"))
    rects = (
        supplier.select(F.col("s_suppkey").alias("rid"))
        .join(F.broadcast(npts))
        .select(
            "rid",
            F.greatest(
                F.lit(1), F.floor(F.sqrt(F.col("npts").cast("double")))
            ).cast("long").alias("dcells"),
            _h32(F.concat(F.col("rid").cast("string"), F.lit("bx"))).alias("hx"),
            _h32(F.concat(F.col("rid").cast("string"), F.lit("by"))).alias("hy"),
            (
                500 + _h32(F.concat(F.col("rid").cast("string"), F.lit("bw")))
                % (GEO_BOX_MAXHALF - 500)
            ).alias("hw"),
            (
                500 + _h32(F.concat(F.col("rid").cast("string"), F.lit("bh")))
                % (GEO_BOX_MAXHALF - 500)
            ).alias("hh"),
        )
        .select(
            "rid", "hw", "hh", "dcells",
            (F.col("hx") % (F.col("dcells") * GEO_CELL)).alias("cx"),
            (F.col("hy") % (F.col("dcells") * GEO_CELL)).alias("cy"),
        )
    )
    cells = rects.select(
        "rid", "cx", "cy", "hw", "hh", "dcells",
        F.explode(
            F.sequence(
                F.greatest(F.lit(0), F.expr(f"(cx - hw) div {GEO_CELL}")),
                F.least(
                    F.col("dcells") - 1, F.expr(f"(cx + hw) div {GEO_CELL}")
                ),
            )
        ).alias("ccx"),
    ).select(
        "rid", "cx", "cy", "hw", "hh", "ccx",
        F.explode(
            F.sequence(
                F.greatest(F.lit(0), F.expr(f"(cy - hh) div {GEO_CELL}")),
                F.least(
                    F.col("dcells") - 1, F.expr(f"(cy + hh) div {GEO_CELL}")
                ),
            )
        ).alias("ccy"),
    )
    hits = (
        cells.join(
            _geo_points(part),
            (cells.ccx == F.col("cell_x")) & (cells.ccy == F.col("cell_y")),
        )
        .where(
            (F.abs(F.col("x") - F.col("cx")) <= F.col("hw"))
            & (F.abs(F.col("y") - F.col("cy")) <= F.col("hh"))
        )
        .groupBy("rid")
        .agg(F.count(F.lit(1)).alias("n_contained"))
    )
    return (
        rects.select("rid", "cx", "cy", "hw", "hh")
        .join(hits, "rid", "left")
        .select(
            F.col("rid").alias("rect_id"),
            "cx", "cy", "hw", "hh",
            F.coalesce("n_contained", F.lit(0)).alias("n_contained"),
        )
        .orderBy("rect_id")
    )


def _geo_bbox_contain(spark, sf_dir):
    return geo_bbox_contain(
        t(spark, sf_dir, "part"), t(spark, sf_dir, "supplier")
    )


_GEO_BBOX_SQL = f"""
WITH {_GEO_PTS_CTE},
rects AS (
  SELECT s_suppkey AS rid,
         greatest(1, CAST(floor(sqrt(CAST(npts AS DOUBLE))) AS BIGINT))
             AS dcells,
         ('0x' || substr(md5(CAST(s_suppkey AS VARCHAR) || 'bx'), 1, 8))::BIGINT
             % (greatest(1, CAST(floor(sqrt(CAST(npts AS DOUBLE))) AS BIGINT))
                * {GEO_CELL}) AS cx,
         ('0x' || substr(md5(CAST(s_suppkey AS VARCHAR) || 'by'), 1, 8))::BIGINT
             % (greatest(1, CAST(floor(sqrt(CAST(npts AS DOUBLE))) AS BIGINT))
                * {GEO_CELL}) AS cy,
         500 + ('0x' || substr(md5(CAST(s_suppkey AS VARCHAR) || 'bw'), 1, 8))::BIGINT
             % ({GEO_BOX_MAXHALF} - 500) AS hw,
         500 + ('0x' || substr(md5(CAST(s_suppkey AS VARCHAR) || 'bh'), 1, 8))::BIGINT
             % ({GEO_BOX_MAXHALF} - 500) AS hh
  FROM supplier, npts
),
cells AS (
  SELECT rid, cx, cy, hw, hh, u1.ccx, u2.ccy
  FROM rects,
       unnest(range(greatest(0, (cx - hw) // {GEO_CELL}),
                    least(dcells - 1, (cx + hw) // {GEO_CELL}) + 1)) AS u1(ccx),
       unnest(range(greatest(0, (cy - hh) // {GEO_CELL}),
                    least(dcells - 1, (cy + hh) // {GEO_CELL}) + 1)) AS u2(ccy)
),
hits AS (
  SELECT rid, CAST(count(*) AS BIGINT) AS n_contained
  FROM cells JOIN pts p ON p.cell_x = cells.ccx AND p.cell_y = cells.ccy
  WHERE abs(p.x - cells.cx) <= cells.hw AND abs(p.y - cells.cy) <= cells.hh
  GROUP BY rid
)
SELECT rects.rid AS rect_id, cx, cy, hw, hh,
       COALESCE(n_contained, 0) AS n_contained
FROM rects LEFT JOIN hits ON rects.rid = hits.rid
ORDER BY rect_id
"""


for _q in (
    QueryDef("geo_grid_knn", _geo_grid_knn, _GEO_KNN_SQL, ("geo",)),
    QueryDef("geo_bbox_contain", _geo_bbox_contain, _GEO_BBOX_SQL, ("geo",)),
):
    R6B_QUERIES[_q.name] = _q


# =====================================================================
# Vocabulary-law wave: the two classic corpus-statistics fits a
# language-data pipeline monitors across snapshots — Zipf's rank-
# frequency law and Heaps' vocabulary-growth law.
# =====================================================================


def zipf_fit(docs):
    """Zipf rank-frequency fit: rank tokens by frequency (ties broken
    lexicographically), regress ln(freq) on ln(rank) by OLS, and report
    the exponent (Zipf predicts slope ~ -1), intercept, and R^2 — the
    drift alarm for tokenizer or source-mix changes.

    Exactness: ln(rank)/ln(freq) are micro-nat-quantized PER TOKEN from
    exact int64 inputs; the five OLS sums are int64 (cross products
    pre-scaled by 1e6 inside the term, the fold-order rule), and the
    final slope/intercept/R^2 are identical double expressions over
    those exact sums, micro-quantized.

    Scale shape: one shuffle to the token grain; ranks come from
    frequency-CLASS offsets (a triangular self-join at the distinct-
    count grain, bounded by the count domain) plus a row_number
    partitioned by frequency class — no global window; the fit is one
    5-sum aggregate."""
    from pyspark.sql import Window

    tc = (
        docs.select(F.explode(_tok(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cls = tc.groupBy("cnt").agg(F.count(F.lit(1)).alias("m"))
    offs = (
        cls.select(F.col("cnt").alias("c"))
        .join(cls.select(F.col("cnt").alias("c2"), "m"), F.col("c2") > F.col("c"))
        .groupBy("c")
        .agg(F.sum("m").alias("off"))
    )
    w = Window.partitionBy("cnt").orderBy("tok")
    ranked = (
        tc.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(offs), tc.cnt == offs.c, "left")
        .select(
            "tok",
            "cnt",
            (F.coalesce("off", F.lit(0)) + F.col("rn")).alias("rank"),
        )
    )
    terms = ranked.select(
        F.floor(F.log(F.col("rank").cast("double")) * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("cnt").cast("double")) * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    sums = terms.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("(x * y) div 1000000")).alias("sxy"),
        F.sum(F.expr("(x * x) div 1000000")).alias("sxx"),
        F.sum(F.expr("(y * y) div 1000000")).alias("syy"),
    )
    num = (
        F.col("n").cast("double") * F.col("sxy").cast("double") * 1.0e6
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    )
    den = (
        F.col("n").cast("double") * F.col("sxx").cast("double") * 1.0e6
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    deny = (
        F.col("n").cast("double") * F.col("syy").cast("double") * 1.0e6
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    )
    return sums.select(
        F.col("n").alias("n_vocab"),
        F.floor(num / den * 1000000 + F.lit(0.5)).alias("slope_micro"),
        F.floor(
            (
                F.col("sy").cast("double") / F.col("n").cast("double")
                - num / den * F.col("sx").cast("double") / F.col("n").cast("double")
            )
            + F.lit(0.5)
        ).alias("intercept_micro"),
        F.floor(num * num / (den * deny) * 1000000 + F.lit(0.5)).alias(
            "r2_micro"
        ),
    )


def _text_zipf_fit(spark, sf_dir):
    return zipf_fit(t(spark, sf_dir, "documents"))


_ZIPF_SQL = """
WITH tc AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
            AS tok
        FROM documents)
  GROUP BY tok
),
ranked AS (
  SELECT tok, cnt,
         CAST(row_number() OVER (ORDER BY cnt DESC, tok ASC) AS BIGINT)
             AS rank
  FROM tc
),
terms AS (
  SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS x,
         CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS y
  FROM ranked
),
sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum((x * y) // 1000000) AS BIGINT) AS sxy,
         CAST(sum((x * x) // 1000000) AS BIGINT) AS sxx,
         CAST(sum((y * y) // 1000000) AS BIGINT) AS syy
  FROM terms
)
SELECT n AS n_vocab,
       CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) * 1.0e6
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) * 1.0e6
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * 1000000 + 0.5) AS BIGINT) AS slope_micro,
       CAST(floor((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                   - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) * 1.0e6
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) * 1.0e6
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                  + 0.5) AS BIGINT) AS intercept_micro,
       CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) * 1.0e6
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) * 1.0e6
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) * 1.0e6
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) * 1.0e6
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                  * 1000000 + 0.5) AS BIGINT) AS r2_micro
FROM sums
"""


HEAPS_CHECKPOINTS = 10


def heaps_law(docs, k: int = HEAPS_CHECKPOINTS):
    """Heaps'-law vocabulary growth curve: stream the corpus in a
    deterministic md5 order and report, at each of k corpus-fraction
    checkpoints, cumulative token count and distinct-vocabulary size —
    the curve that predicts how much new vocabulary the next 10x of
    data buys.

    Scale shape: corpus positions come from a 256-bucket hash-prefix
    hierarchical prefix sum (bucket offsets via a triangular join of a
    256-row table, ranks via windows partitioned by bucket), first
    occurrence per token is a min aggregate, and each checkpoint
    evaluation is a bounded k-way expansion collapsing immediately —
    the same shape as the repo's threshold sweeps."""
    from pyspark.sql import Window

    base = docs.select(
        "doc_id",
        F.size(_tok(F.col("text"))).alias("n_toks"),
        F.md5(F.concat(F.lit("hp:"), F.col("doc_id").cast("string"))).alias(
            "hkey"
        ),
    ).withColumn(
        "bkt", F.conv(F.substring("hkey", 1, 2), 16, 10).cast("long")
    )
    w = Window.partitionBy("bkt").orderBy("hkey")
    within = base.withColumn("rn", F.row_number().over(w))
    bcnt = base.groupBy("bkt").agg(F.count(F.lit(1)).alias("bn"))
    offs = (
        bcnt.select(F.col("bkt").alias("k"))
        .join(bcnt.select(F.col("bkt").alias("k2"), "bn"), F.col("k2") < F.col("k"))
        .groupBy("k")
        .agg(F.sum("bn").alias("off"))
    )
    pos = within.join(F.broadcast(offs), within.bkt == offs.k, "left").select(
        "doc_id",
        "n_toks",
        (F.coalesce("off", F.lit(0)) + F.col("rn")).alias("pos"),
    )
    nd = pos.agg(F.count(F.lit(1)).alias("n_docs"))
    chk = (
        pos.sparkSession.range(1, k + 1)
        .select(F.col("id").cast("long").alias("chk"))
        .join(F.broadcast(nd))
        .select("chk", F.expr(f"(chk * n_docs) div {k}").alias("thr"))
    )
    tok_first = (
        docs.select("doc_id", F.explode(_tok(F.col("text"))).alias("tok"))
        .join(pos.select("doc_id", "pos"), "doc_id")
        .groupBy("tok")
        .agg(F.min("pos").alias("first_pos"))
    )
    vocab_k = (
        tok_first.join(F.broadcast(chk))
        .groupBy("chk", "thr")
        .agg(
            F.sum(
                F.when(F.col("first_pos") <= F.col("thr"), 1).otherwise(0)
            ).alias("vocab_size")
        )
    )
    toks_k = (
        pos.join(F.broadcast(chk))
        .groupBy("chk")
        .agg(
            F.sum(
                F.when(F.col("pos") <= F.col("thr"), F.col("n_toks")).otherwise(0)
            ).alias("n_tokens_cum")
        )
    )
    return (
        vocab_k.join(toks_k, "chk")
        .select(
            F.col("chk").alias("checkpoint"),
            F.col("thr").alias("n_docs_le"),
            "n_tokens_cum",
            "vocab_size",
        )
        .orderBy("checkpoint")
    )


def _text_heaps_law(spark, sf_dir):
    return heaps_law(t(spark, sf_dir, "documents"))


_HEAPS_SQL = f"""
WITH base AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_toks,
         md5('hp:' || CAST(doc_id AS VARCHAR)) AS hkey
  FROM documents
),
pos AS (
  SELECT doc_id, n_toks,
         CAST(row_number() OVER (ORDER BY hkey) AS BIGINT) AS pos
  FROM base
),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM pos),
chk AS (
  SELECT CAST(u.chk AS BIGINT) AS chk,
         (u.chk * n_docs) // {HEAPS_CHECKPOINTS} AS thr
  FROM nd, unnest(range(1, {HEAPS_CHECKPOINTS} + 1)) AS u(chk)
),
tok_first AS (
  SELECT tok, min(pos) AS first_pos
  FROM (SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS tok
        FROM documents) tk
  JOIN pos USING (doc_id)
  GROUP BY tok
),
vocab_k AS (
  SELECT chk, thr,
         CAST(sum(CASE WHEN first_pos <= thr THEN 1 ELSE 0 END) AS BIGINT)
             AS vocab_size
  FROM tok_first, chk GROUP BY 1, 2
),
toks_k AS (
  SELECT chk,
         CAST(sum(CASE WHEN pos <= thr THEN n_toks ELSE 0 END) AS BIGINT)
             AS n_tokens_cum
  FROM pos, chk GROUP BY 1
)
SELECT vocab_k.chk AS checkpoint, thr AS n_docs_le, n_tokens_cum, vocab_size
FROM vocab_k JOIN toks_k ON vocab_k.chk = toks_k.chk
ORDER BY checkpoint
"""


for _q in (
    QueryDef("text_zipf_fit", _text_zipf_fit, _ZIPF_SQL, ("text",)),
    QueryDef("text_heaps_law", _text_heaps_law, _HEAPS_SQL, ("text",)),
):
    R6B_QUERIES[_q.name] = _q


# =====================================================================
# Embedding wave: Johnson-Lindenstrauss random projection with a
# distance-distortion audit, over the SQ8 integer codes (so every
# distance is exact int64 on both engines).
# =====================================================================

RP_OUT_DIMS = 16
RP_IN_DIMS = 64
RP_PAIR_MOD = 10
RP_HIST_BUCKET = 250000  # ratio histogram bucket width (micro units)

# The +-1 sign matrix as a portable md5 expression, shared by both
# engines: sign(j, i) = +1 iff h32('rp:j:i') is even.
_SGN_SPARK = (
    f"transform(sequence(0, {RP_OUT_DIMS - 1}, 1), j -> "
    f"transform(sequence(0, {RP_IN_DIMS - 1}, 1), i -> "
    "CASE WHEN CAST(conv(substring(md5(concat('rp:', CAST(j AS STRING), "
    "':', CAST(i AS STRING))), 1, 8), 16, 10) AS BIGINT) % 2 = 0 "
    "THEN 1L ELSE -1L END))"
)


def random_projection_audit(embeddings):
    """Johnson-Lindenstrauss +-1 random projection (Achlioptas 2003):
    project the 64-dim SQ8 integer codes to 16 dims with a
    hash-derived sign matrix and audit distance preservation on a
    deterministic pair sample — the dimensionality-reduction QA a
    100 TB vector pipeline runs before switching its ANN index to the
    compact representation.

    Exactness: the sign matrix, projections, and both distances are
    pure int64; the distortion ratio d2_proj/(k/d-scaled d2_orig) is
    integer micro floor-division. Scale shape: the 16x64 sign matrix
    builds ONCE as a 1-row broadcast (never per row); projection is a
    per-row array fold; the audit pairs come from an equi-join on
    adjacent sampled ids, and the histogram collapses to the bounded
    bucket grain."""
    from .ext.similarity import sq8_codes

    codes = sq8_codes(embeddings)
    signs = F.broadcast(
        embeddings.sparkSession.range(1).select(
            F.expr(_SGN_SPARK).alias("sgn")
        )
    )
    proj = codes.crossJoin(signs).select(
        "vec_id",
        "c",
        F.expr(
            f"transform(sequence(0, {RP_OUT_DIMS - 1}, 1), j -> "
            "aggregate(zip_with(c, element_at(sgn, j + 1), (x, s) -> x * s), "
            "0L, (acc, v) -> acc + v))"
        ).alias("p"),
    )
    a = proj.where(F.col("vec_id") % RP_PAIR_MOD == 0).select(
        F.col("vec_id").alias("aid"),
        F.col("c").alias("ac"),
        F.col("p").alias("ap"),
    )
    b = proj.select(
        (F.col("vec_id") - 1).alias("aid"),
        F.col("c").alias("bc"),
        F.col("p").alias("bp"),
    )
    d2 = "aggregate(zip_with({x}, {y}, (u, v) -> (u - v) * (u - v)), 0L, (s, e) -> s + e)"
    pairs = (
        a.join(b, "aid")
        .select(
            "aid",
            F.expr(d2.format(x="ac", y="bc")).alias("d2o"),
            F.expr(d2.format(x="ap", y="bp")).alias("d2p"),
        )
        .where(F.col("d2o") > 0)
        .select(
            "aid",
            F.expr(
                f"(1000000 * d2p) div ({RP_OUT_DIMS} * d2o)"
            ).alias("ratio_micro"),
        )
    )
    tot = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("sum(ratio_micro) div count(1)").alias("mean_ratio_micro"),
    )
    return (
        pairs.groupBy(
            F.expr(f"ratio_micro div {RP_HIST_BUCKET}").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(tot))
        .select("bucket", "n", "n_pairs", "mean_ratio_micro")
        .orderBy("bucket")
    )


def _embed_random_projection(spark, sf_dir):
    return random_projection_audit(t(spark, sf_dir, "embeddings"))


_RP_SQL = f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings),
idx AS (SELECT vec_id, v, unnest(range(1, len(v)+1)) AS i FROM e),
d AS (SELECT i AS pos, min(v[i]) AS mn, max(v[i]) AS mx FROM idx GROUP BY 1),
b AS (SELECT list(mn ORDER BY pos) AS mn, list(mx ORDER BY pos) AS mx FROM d),
codes AS (SELECT vec_id,
  list_transform(range(1, len(v)+1), i ->
    CASE WHEN b.mx[i] > b.mn[i]
         THEN CAST(floor((v[i] - b.mn[i]) / (b.mx[i] - b.mn[i]) * 255 + 0.5)
                   AS BIGINT)
         ELSE 0 END) AS c
  FROM e CROSS JOIN b),
sgn AS (SELECT list_transform(range(0, {RP_OUT_DIMS}), j ->
          list_transform(range(0, {RP_IN_DIMS}), i ->
            CASE WHEN ('0x' || substr(md5('rp:' || CAST(j AS VARCHAR) || ':'
                       || CAST(i AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
                 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END)) AS m),
proj AS (SELECT vec_id, c,
  list_transform(range(1, {RP_OUT_DIMS} + 1), j ->
    CAST(list_sum(list_transform(range(1, {RP_IN_DIMS} + 1),
                                 i -> c[i] * sgn.m[j][i])) AS BIGINT)) AS p
  FROM codes CROSS JOIN sgn),
pairs AS (
  SELECT a.vec_id AS aid,
         CAST(list_sum(list_transform(range(1, {RP_IN_DIMS} + 1),
              i -> (a.c[i] - bb.c[i]) * (a.c[i] - bb.c[i]))) AS BIGINT) AS d2o,
         CAST(list_sum(list_transform(range(1, {RP_OUT_DIMS} + 1),
              j -> (a.p[j] - bb.p[j]) * (a.p[j] - bb.p[j]))) AS BIGINT) AS d2p
  FROM proj a JOIN proj bb ON bb.vec_id = a.vec_id + 1
  WHERE a.vec_id % {RP_PAIR_MOD} = 0
),
ratios AS (
  SELECT aid, (1000000 * d2p) // ({RP_OUT_DIMS} * d2o) AS ratio_micro
  FROM pairs WHERE d2o > 0
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(ratio_micro) AS BIGINT) // CAST(count(*) AS BIGINT)
             AS mean_ratio_micro
  FROM ratios
)
SELECT ratio_micro // {RP_HIST_BUCKET} AS bucket,
       CAST(count(*) AS BIGINT) AS n, n_pairs, mean_ratio_micro
FROM ratios, tot
GROUP BY 1, 3, 4 ORDER BY bucket
"""


# =====================================================================
# Shard-packing wave: deterministic byte-budget shard assignment (the
# WebDataset-style layout step that turns a curated corpus into
# fixed-size training shards).
# =====================================================================

SHARD_BUDGET_BYTES = 4096


def shard_pack(docs, budget: int = SHARD_BUDGET_BYTES):
    """Byte-budget shard packing: stream documents in deterministic md5
    order and assign each to shard floor(cum_bytes_before / budget)
    (next-fit by prefix — a doc belongs to the shard where it starts);
    emit the shard manifest (docs, bytes, position range) a training
    loader consumes.

    Scale shape: the running byte offset is the 256-bucket hash-prefix
    hierarchical prefix sum (bucket sums via one 256-row triangular
    join, within-bucket windows) — no global window, no sequential
    scan; the manifest is one aggregate at the shard grain."""
    from pyspark.sql import Window

    base = docs.select(
        "doc_id",
        F.col("n_chars").alias("nb"),
        F.md5(F.concat(F.lit("sh:"), F.col("doc_id").cast("string"))).alias(
            "hkey"
        ),
    ).withColumn(
        "bkt", F.conv(F.substring("hkey", 1, 2), 16, 10).cast("long")
    )
    w = (
        Window.partitionBy("bkt")
        .orderBy("hkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wr = Window.partitionBy("bkt").orderBy("hkey")
    within = base.select(
        "doc_id",
        "nb",
        "bkt",
        F.row_number().over(wr).alias("rn"),
        (F.sum("nb").over(w) - F.col("nb")).alias("cb_in"),
    )
    bagg = base.groupBy("bkt").agg(
        F.sum("nb").alias("bb"), F.count(F.lit(1)).alias("bn")
    )
    offs = (
        bagg.select(F.col("bkt").alias("k"))
        .join(
            bagg.select(F.col("bkt").alias("k2"), "bb", "bn"),
            F.col("k2") < F.col("k"),
        )
        .groupBy("k")
        .agg(F.sum("bb").alias("boff"), F.sum("bn").alias("noff"))
    )
    pos = within.join(F.broadcast(offs), within.bkt == offs.k, "left").select(
        "doc_id",
        "nb",
        (F.coalesce("noff", F.lit(0)) + F.col("rn")).alias("pos"),
        (F.coalesce("boff", F.lit(0)) + F.col("cb_in")).alias("cum_before"),
    )
    return (
        pos.select(
            "doc_id", "nb", "pos",
            F.expr(f"cum_before div {budget}").alias("shard"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nb").alias("n_bytes"),
            F.min("pos").alias("first_pos"),
            F.max("pos").alias("last_pos"),
        )
        .orderBy("shard")
    )


def _corpus_shard_pack(spark, sf_dir):
    return shard_pack(t(spark, sf_dir, "documents"))


_SHARD_SQL = f"""
WITH base AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS nb,
         md5('sh:' || CAST(doc_id AS VARCHAR)) AS hkey
  FROM documents
),
pos AS (
  SELECT doc_id, nb,
         CAST(row_number() OVER (ORDER BY hkey) AS BIGINT) AS pos,
         CAST(sum(nb) OVER (ORDER BY hkey) - nb AS BIGINT) AS cum_before
  FROM base
)
SELECT cum_before // {SHARD_BUDGET_BYTES} AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nb) AS BIGINT) AS n_bytes,
       min(pos) AS first_pos, max(pos) AS last_pos
FROM pos GROUP BY 1 ORDER BY shard
"""


for _q in (
    QueryDef(
        "embed_random_projection",
        _embed_random_projection,
        _RP_SQL,
        ("embed",),
    ),
    QueryDef("corpus_shard_pack", _corpus_shard_pack, _SHARD_SQL, ("corpus",)),
):
    R6B_QUERIES[_q.name] = _q


# ------------------------------------------------- MMR DIVERSITY SELECT

MMR_K = 5
MMR_CAND_MOD = 13
# MMR score (x10 integer weights): score = 3*min_d2(selected) - 7*d2(query)
# == lambda*rel - (1-lambda)*max_sim with lambda=0.7 and sim = -L2^2.
MMR_W_REL = 7
MMR_W_DIV = 3

_D2_EXPR = (
    "aggregate(zip_with({a}, {b}, (u, v) -> (u - v) * (u - v)), "
    "0L, (s, e) -> s + e)"
)


def mmr_select(embeddings, k: int = MMR_K):
    """Maximal Marginal Relevance selection (Carbonell & Goldstein
    1998): greedily pick k items maximizing lambda*relevance -
    (1-lambda)*similarity-to-already-selected — the diversity-aware
    retrieval/curation step that keeps a training batch or RAG context
    from filling with near-duplicates. Query = vector 0; candidates are
    a deterministic id sample; all distances are exact int64 over SQ8
    codes, so the greedy argmax (score, then smallest id) is bit-stable.

    Scale shape: the k rounds unroll statically (the graph_hits
    pattern); every round is candidate-scan x broadcast-selected
    (<= k-1 rows) -> one aggregate argmax. The candidate table is
    lineage-truncated once with localCheckpoint so round r does not
    re-derive rounds 1..r-1. In production the candidate set is the
    ANN top-N, so per-query work is O(k * N)."""
    from .ext.similarity import sq8_codes

    codes = sq8_codes(embeddings)
    q = codes.where(F.col("vec_id") == 0).select(F.col("c").alias("qc"))
    cand = (
        codes.where((F.col("vec_id") % MMR_CAND_MOD == 1))
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "c",
            F.expr(_D2_EXPR.format(a="c", b="qc")).alias("d2q"),
        )
        .localCheckpoint(eager=False)
    )
    pick1 = (
        cand.agg(F.min(F.struct("d2q", "vec_id")).alias("m"))
        .select(
            F.lit(1).alias("rank"),
            F.col("m.vec_id").alias("vec_id"),
            F.col("m.d2q").alias("d2_query"),
            F.lit(None).cast("long").alias("min_d2_selected"),
            (-MMR_W_REL * F.col("m.d2q")).alias("score10"),
        )
        # each pick is 1 row but feeds every LATER round's selected set:
        # without truncation round r re-evaluates picks 1..r-1's
        # aggregates (triangular re-derivation, measured ~2x wall)
        .localCheckpoint(eager=False)
    )
    picks = [pick1]
    for r in range(2, k + 1):
        sel_ids = picks[0].select("vec_id")
        for p in picks[1:]:
            sel_ids = sel_ids.unionAll(p.select("vec_id"))
        selc = cand.join(F.broadcast(sel_ids), "vec_id").select(
            F.col("c").alias("sc")
        )
        rem = cand.join(F.broadcast(sel_ids), "vec_id", "left_anti")
        scored = (
            rem.join(F.broadcast(selc))
            .select(
                "vec_id",
                "d2q",
                F.expr(_D2_EXPR.format(a="c", b="sc")).alias("d2s"),
            )
            .groupBy("vec_id", "d2q")
            .agg(F.min("d2s").alias("mind"))
        )
        picks.append(
            scored.select(
                "vec_id",
                "d2q",
                "mind",
                (
                    MMR_W_DIV * F.col("mind") - MMR_W_REL * F.col("d2q")
                ).alias("s10"),
            )
            .agg(
                F.max(
                    F.struct(
                        F.col("s10"), (-F.col("vec_id")).alias("nid")
                    )
                ).alias("m"),
                F.max(
                    F.struct(
                        F.col("s10"),
                        (-F.col("vec_id")).alias("nid"),
                        F.col("d2q"),
                        F.col("mind"),
                    )
                ).alias("mm"),
            )
            .select(
                F.lit(r).alias("rank"),
                (-F.col("m.nid")).alias("vec_id"),
                F.col("mm.d2q").alias("d2_query"),
                F.col("mm.mind").alias("min_d2_selected"),
                F.col("m.s10").alias("score10"),
            )
            .localCheckpoint(eager=False)
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionAll(p)
    return out.orderBy("rank")


def _embed_mmr_select(spark, sf_dir):
    return mmr_select(t(spark, sf_dir, "embeddings"))


def _mmr_sql(k: int = MMR_K) -> str:
    d2 = (
        "CAST(list_sum(list_transform(range(1, {n} + 1), "
        "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))) AS BIGINT)"
    )
    parts = [
        """
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings),
idx AS (SELECT vec_id, v, unnest(range(1, len(v)+1)) AS i FROM e),
d AS (SELECT i AS pos, min(v[i]) AS mn, max(v[i]) AS mx FROM idx GROUP BY 1),
b AS (SELECT list(mn ORDER BY pos) AS mn, list(mx ORDER BY pos) AS mx FROM d),
codes AS (SELECT vec_id,
  list_transform(range(1, len(v)+1), i ->
    CASE WHEN b.mx[i] > b.mn[i]
         THEN CAST(floor((v[i] - b.mn[i]) / (b.mx[i] - b.mn[i]) * 255 + 0.5)
                   AS BIGINT)
         ELSE 0 END) AS c
  FROM e CROSS JOIN b),
q AS (SELECT c AS qc FROM codes WHERE vec_id = 0),
cand AS (SELECT vec_id, c, """
        + d2.format(n=RP_IN_DIMS, a="c", b="qc")
        + f""" AS d2q
        FROM codes, q WHERE vec_id % {MMR_CAND_MOD} = 1),
sel1 AS (SELECT vec_id, c, d2q FROM cand ORDER BY d2q ASC, vec_id ASC LIMIT 1)"""
    ]
    prev_sel = "sel1"
    all_sels = ["sel1"]
    for r in range(2, k + 1):
        union_sel = " UNION ALL ".join(
            f"SELECT vec_id FROM {s}" for s in all_sels
        )
        pair_d2 = d2.format(n=RP_IN_DIMS, a="r.c", b="s.c")
        parts.append(
            f""",
ids{r} AS ({union_sel}),
selc{r} AS (SELECT c FROM cand WHERE vec_id IN (SELECT vec_id FROM ids{r})),
sc{r} AS (
  SELECT r.vec_id, r.c, r.d2q, min({pair_d2}) AS mind
  FROM (SELECT * FROM cand
        WHERE vec_id NOT IN (SELECT vec_id FROM ids{r})) r,
       selc{r} s
  GROUP BY r.vec_id, r.c, r.d2q
),
sel{r} AS (
  SELECT vec_id, c, d2q, mind
  FROM sc{r}
  ORDER BY {MMR_W_DIV} * mind - {MMR_W_REL} * d2q DESC, vec_id ASC
  LIMIT 1
)"""
        )
        prev_sel = f"sel{r}"
        all_sels.append(prev_sel)
    finals = [
        f"""SELECT 1 AS rank, vec_id, d2q AS d2_query,
       CAST(NULL AS BIGINT) AS min_d2_selected,
       {-MMR_W_REL} * d2q AS score10
FROM sel1"""
    ]
    for r in range(2, k + 1):
        finals.append(
            f"""SELECT {r} AS rank, vec_id, d2q AS d2_query,
       mind AS min_d2_selected,
       {MMR_W_DIV} * mind - {MMR_W_REL} * d2q AS score10
FROM sel{r}"""
        )
    parts.append(
        "\nSELECT * FROM ("
        + " UNION ALL ".join(f"({s})" for s in finals)
        + ") ORDER BY rank"
    )
    return "".join(parts)


R6B_QUERIES["embed_mmr_select"] = QueryDef(
    "embed_mmr_select", _embed_mmr_select, _mmr_sql(), ("embed",)
)


# ------------------------------------------------------ TAR SHARD CODEC


def _multimodal_tar_shards(spark, sf_dir):
    """Real archive-container decode: every document becomes a genuine
    ustar (POSIX tar) archive via the pure-stdlib codec in
    ``ext/tar.py`` — the WebDataset shard format — then parses back to
    per-member metadata and exact payload statistics. tar is lossless
    framing, so the DuckDB oracle replays the per-byte LCG relationally
    and the hash match proves the header/checksum/padding/terminator
    loop is byte-exact everywhere. Parser breadth (stdlib
    interoperability both directions, signed/unsigned checksums,
    corruption + truncation fuzz) is pytest-covered. Scale shape: two
    chained Arrow-batched ``mapInPandas``, zero data shuffle (the one
    exchange moves id control rows at an explicit partition count —
    SCALING.md §14)."""
    from .ext import tar as T

    docs = t(spark, sf_dir, "documents")
    return T.tar_features(T.synthesize_tar(docs))


_TAR_SQL = """
WITH RECURSIVE pw(k, ak, sk) AS (
  SELECT 1, CAST(6364136223846793005 AS BIGINT), CAST(1 AS BIGINT)
  UNION ALL
  SELECT k + 1,
         CAST((CAST(6364136223846793005 AS HUGEINT) * ak)
              % 9223372036854775808 AS BIGINT),
         CAST((CAST(6364136223846793005 AS HUGEINT) * sk + 1)
              % 9223372036854775808 AS BIGINT)
  FROM pw WHERE k < 110
),
mems AS (
  SELECT doc_id,
         CAST(doc_id % 3 + 1 AS INTEGER) AS n_members,
         CAST(u.m AS INTEGER) AS member_idx
  FROM documents, unnest(range(0, 3)) AS u(m)
  WHERE u.m < doc_id % 3 + 1
),
seeds AS (
  SELECT doc_id, n_members, member_idx,
         CAST(10 + (doc_id + 13 * member_idx) % 100 AS BIGINT) AS size,
         CAST((CAST(doc_id * 31 + member_idx AS HUGEINT)
               * 6364136223846793005 + 1442695040888963407)
              % 9223372036854775808 AS BIGINT) AS s0
  FROM mems
),
bytes AS (
  SELECT d.doc_id, d.n_members, d.member_idx, d.size,
         CAST(((CAST((CAST(p.ak AS HUGEINT) * d.s0 + p.sk)
                     % 9223372036854775808 AS BIGINT)) // 8589934592) % 256
              AS BIGINT) AS v
  FROM seeds d JOIN pw p ON p.k <= d.size
)
SELECT doc_id AS media_id, n_members, member_idx,
       CAST(doc_id AS VARCHAR) || '/' || CAST(member_idx AS VARCHAR)
           || '.bin' AS name,
       size,
       CAST(sum(v) AS BIGINT) AS byte_sum,
       CAST(min(v) AS INTEGER) AS byte_min,
       CAST(max(v) AS INTEGER) AS byte_max
FROM bytes GROUP BY doc_id, n_members, member_idx, size
"""


R6B_QUERIES["multimodal_tar_shards"] = QueryDef(
    "multimodal_tar_shards",
    _multimodal_tar_shards,
    _TAR_SQL,
    ("multimodal",),
)


# ----------------------------------------------------------- BFS HOPS

BFS_SEED_MOD = 37
BFS_SEED_REM = 1
BFS_ROUNDS = 4

_BFS_EDGES_CTE = """
SELECT a.i AS src, b.i AS dst
FROM (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem) a
JOIN (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem) b
  ON a.g = b.g AND a.i <> b.i
GROUP BY 1, 2 HAVING count(*) >= 2
"""


def _graph_bfs_hops(spark, sf_dir):
    """Multi-source BFS hop profile over the part co-occurrence graph
    (the pagerank/triangles/kcore edge set) — see ops.graph.bfs_hops
    for the zero-per-round-exchange argument. The per-hop newly-reached
    curve is the blast-radius number: how fast influence (or
    contamination) spreads from the seed set."""
    from .ops import graph as G

    li = t(spark, sf_dir, "lineitem")
    edges = G.cooccurrence_edges(li, "l_orderkey", "l_partkey", min_groups=2)
    return G.bfs_hops(
        edges, seed_mod=BFS_SEED_MOD, seed_rem=BFS_SEED_REM,
        rounds=BFS_ROUNDS,
    )


def _bfs_sql() -> str:
    from .ops import graph as G

    return G.bfs_oracle_sql(
        _BFS_EDGES_CTE, seed_mod=BFS_SEED_MOD, seed_rem=BFS_SEED_REM,
        rounds=BFS_ROUNDS,
    )


R6B_QUERIES["graph_bfs_hops"] = QueryDef(
    "graph_bfs_hops", _graph_bfs_hops, _bfs_sql(), ("graph",)
)


# -------------------------------------------------------- CHANGEPOINT

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


R6B_QUERIES["ts_changepoint_sse"] = QueryDef(
    "ts_changepoint_sse", _ts_changepoint_sse, _CP_SQL, ("ts",)
)


# ------------------------------------------------------------- BM25

BM25_QUERY = ("hash", "join", "spark", "vector")
BM25_TOPK = 15
# k1 = 1.2, b = 0.75 as exact double literals shared by both engines.


def bm25_topk(docs, topk: int = BM25_TOPK):
    """BM25 retrieval scoring (Robertson et al., Okapi / the Lucene
    ln(1+...) idf variant) of a literal token query against the corpus,
    returning the top-k documents — the lexical half of every RAG
    retrieval stack beside the ANN keys.

    Exactness: tf, df, dl, N are exact int64; each (doc, term)
    contribution idf*saturation is ONE double expression over those
    ints, micro-quantized per term before the integer per-doc sum
    (fold-order rule). avgdl enters as exact milli-tokens.

    Scale shape: the per-term df table is query-sized (broadcast); the
    scan touches only rows containing a query token via the exploded
    (doc, term, tf) grain; the top-k is the window-free
    TakeOrdered+rank-by-aggregate of ops.scale.ranked_topk."""
    from .ops.scale import ranked_topk

    qlit = F.array([F.lit(x) for x in BM25_QUERY])
    toks = docs.select(
        "doc_id",
        F.size(_tok(F.col("text"))).alias("dl"),
        F.explode(_tok(F.col("text"))).alias("tok"),
    )
    nd = docs.agg(
        F.count(F.lit(1)).alias("nn"),
        F.sum(F.size(_tok(F.col("text")))).alias("ntok"),
    ).select("nn", F.expr("(1000 * ntok) div nn").alias("avgdl_milli"))
    qt = toks.where(F.array_contains(qlit, F.col("tok")))
    tf = qt.groupBy("doc_id", "dl", "tok").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_t = qt.select("doc_id", "tok").distinct().groupBy("tok").agg(
        F.count(F.lit(1)).alias("df")
    )
    term = (
        tf.join(F.broadcast(df_t), "tok")
        .join(F.broadcast(nd))
        .select(
            "doc_id",
            "dl",
            F.floor(
                F.log(
                    1.0
                    + (F.col("nn").cast("double") - F.col("df").cast("double") + 0.5)
                    / (F.col("df").cast("double") + 0.5)
                )
                * (
                    F.col("tf").cast("double")
                    * 2.2
                    / (
                        F.col("tf").cast("double")
                        + 1.2
                        * (
                            0.25
                            + 0.75
                            * (F.col("dl") * 1000).cast("double")
                            / F.col("avgdl_milli").cast("double")
                        )
                    )
                )
                * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("t_micro"),
        )
    )
    scores = term.groupBy("doc_id", "dl").agg(
        F.sum("t_micro").alias("score_micro")
    )
    return ranked_topk(
        scores.select("doc_id", "dl", "score_micro"),
        [("score_micro", "desc"), ("doc_id", "asc")],
        topk,
        rank_name="rnk",
    ).select("rnk", "doc_id", "dl", "score_micro")


def _text_bm25_topk(spark, sf_dir):
    return bm25_topk(t(spark, sf_dir, "documents"))


_BM25_QLIST = ", ".join(f"'{x}'" for x in BM25_QUERY)

_BM25_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS dl,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM documents
),
nd AS (
  SELECT CAST(count(*) AS BIGINT) AS nn,
         (1000 * CAST(sum(len(list_filter(string_split(text, ' '),
                                          x -> x <> ''))) AS BIGINT))
             // CAST(count(*) AS BIGINT) AS avgdl_milli
  FROM documents
),
qt AS (SELECT * FROM toks WHERE tok IN ({_BM25_QLIST})),
tf AS (
  SELECT doc_id, dl, tok, CAST(count(*) AS BIGINT) AS tf
  FROM qt GROUP BY 1, 2, 3
),
df_t AS (
  SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM qt GROUP BY 1
),
term AS (
  SELECT doc_id, dl,
         CAST(floor(
           ln(1.0 + (CAST(nn AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                    / (CAST(df AS DOUBLE) + 0.5))
           * (CAST(tf AS DOUBLE) * 2.2
              / (CAST(tf AS DOUBLE)
                 + 1.2 * (0.25 + 0.75 * CAST(dl * 1000 AS DOUBLE)
                                 / CAST(avgdl_milli AS DOUBLE))))
           * 1000000 + 0.5) AS BIGINT) AS t_micro
  FROM tf JOIN df_t USING (tok), nd
),
scores AS (
  SELECT doc_id, dl, CAST(sum(t_micro) AS BIGINT) AS score_micro
  FROM term GROUP BY 1, 2
)
SELECT CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id ASC)
            AS BIGINT) AS rnk,
       doc_id, dl, score_micro
FROM scores
ORDER BY score_micro DESC, doc_id ASC LIMIT {BM25_TOPK}
"""


# ------------------------------------------------------ K-FOLD ASSIGN

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


# --------------------------------------------------- PROFILE DRIFT DQ


def profile_drift(events):
    """Snapshot-profile drift audit: split the stream at the integer
    midpoint of its time range (the did_estimator split) and compare,
    per event type, the early vs late halves on volume share, value
    mean, and distinct-user reach — the nightly "did the data change
    shape" report between two ingest windows.

    All drift numbers are exact integer (micro shares, milli-cent
    means); two scans' worth of aggregates at the bounded type grain,
    with the midpoint riding as a broadcast 1-row aggregate."""
    rng = events.agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.max(F.unix_micros("ts")).alias("t1"),
    ).select(F.expr("t0 + (t1 - t0) div 2").alias("mid"))
    lab = events.join(F.broadcast(rng)).select(
        "event_type",
        "user_id",
        cents(F.col("value")).alias("v"),
        (F.unix_micros("ts") < F.col("mid")).alias("early"),
    )
    per = lab.groupBy("event_type", "early").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sv"),
        F.count_distinct("user_id").alias("nu"),
    )
    halves = per.groupBy("early").agg(F.sum("n").alias("half_n"))
    wide = (
        per.join(F.broadcast(halves), "early")
        .select(
            "event_type",
            F.when(F.col("early"), F.col("n")).otherwise(0).alias("n_e"),
            F.when(~F.col("early"), F.col("n")).otherwise(0).alias("n_l"),
            F.when(F.col("early"), F.expr("(1000000 * n) div half_n"))
            .otherwise(0).alias("sh_e"),
            F.when(~F.col("early"), F.expr("(1000000 * n) div half_n"))
            .otherwise(0).alias("sh_l"),
            F.when(F.col("early"), F.expr("(10 * sv) div n"))
            .otherwise(0).alias("m_e"),
            F.when(~F.col("early"), F.expr("(10 * sv) div n"))
            .otherwise(0).alias("m_l"),
            F.when(F.col("early"), F.col("nu")).otherwise(0).alias("u_e"),
            F.when(~F.col("early"), F.col("nu")).otherwise(0).alias("u_l"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("n_e").alias("n_early"),
            F.sum("n_l").alias("n_late"),
            F.sum("sh_e").alias("share_early_micro"),
            F.sum("sh_l").alias("share_late_micro"),
            F.sum("m_e").alias("mean_early_millicent"),
            F.sum("m_l").alias("mean_late_millicent"),
            F.sum("u_e").alias("users_early"),
            F.sum("u_l").alias("users_late"),
        )
    )
    return wide.select(
        "*",
        (
            F.col("share_late_micro") - F.col("share_early_micro")
        ).alias("share_drift_micro"),
    ).orderBy("event_type")


def _dq_profile_drift(spark, sf_dir):
    return profile_drift(t(spark, sf_dir, "events"))


_DRIFT_SQL = """
WITH rng AS (
  SELECT min(epoch_us(ts)) + (max(epoch_us(ts)) - min(epoch_us(ts))) // 2
             AS mid
  FROM events
),
lab AS (
  SELECT event_type, user_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
         epoch_us(ts) < mid AS early
  FROM events, rng
),
per AS (
  SELECT event_type, early, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS BIGINT) AS sv,
         CAST(count(DISTINCT user_id) AS BIGINT) AS nu
  FROM lab GROUP BY 1, 2
),
halves AS (SELECT early, CAST(sum(n) AS BIGINT) AS half_n FROM per GROUP BY 1),
wide AS (
  SELECT event_type,
         CAST(sum(CASE WHEN early THEN n ELSE 0 END) AS BIGINT) AS n_early,
         CAST(sum(CASE WHEN NOT early THEN n ELSE 0 END) AS BIGINT) AS n_late,
         CAST(sum(CASE WHEN early THEN (1000000 * n) // half_n ELSE 0 END)
              AS BIGINT) AS share_early_micro,
         CAST(sum(CASE WHEN NOT early THEN (1000000 * n) // half_n ELSE 0 END)
              AS BIGINT) AS share_late_micro,
         CAST(sum(CASE WHEN early THEN (10 * sv) // n ELSE 0 END)
              AS BIGINT) AS mean_early_millicent,
         CAST(sum(CASE WHEN NOT early THEN (10 * sv) // n ELSE 0 END)
              AS BIGINT) AS mean_late_millicent,
         CAST(sum(CASE WHEN early THEN nu ELSE 0 END) AS BIGINT)
             AS users_early,
         CAST(sum(CASE WHEN NOT early THEN nu ELSE 0 END) AS BIGINT)
             AS users_late
  FROM per JOIN halves USING (early)
  GROUP BY event_type
)
SELECT *, share_late_micro - share_early_micro AS share_drift_micro
FROM wide ORDER BY event_type
"""


for _q in (
    QueryDef("text_bm25_topk", _text_bm25_topk, _BM25_SQL, ("text",)),
    QueryDef(
        "sample_kfold_assign", _sample_kfold_assign, _KFOLD_SQL, ("sample",)
    ),
    QueryDef("dq_profile_drift", _dq_profile_drift, _DRIFT_SQL, ("dq",)),
):
    R6B_QUERIES[_q.name] = _q


# ------------------------------------------------- SEQUENCE PATTERN (CEP)

SEQ_A = "view"
SEQ_B = "purchase"
SEQ_NOT = "error"
SEQ_WINDOW_S = 7 * 86400
SEQ_BUCKET_S = 86400


def seq_pattern(events):
    """Complex-event sequence matcher: per user, occurrences of
    "A then B within W, with NO C strictly between" (view -> purchase
    within 7 days, uninterrupted by an error) at the seconds grain —
    the MATCH_RECOGNIZE-style pattern a funnel with a veto condition
    needs, which plain funnels and last-touch attribution cannot
    express.

    Semantics: for each A event, the EARLIEST qualifying B; the match
    survives iff no C lands in the open interval (tsA, tsB). Output is
    the per-user match profile (count, min/max gap seconds).

    Scale shape: both the A->B candidate step and the C-veto step are
    the repo's bucketed interval equi-join (ops.relational.
    range_join_bucketed — day buckets, <= 8 expansion rows per
    interval, residual filter after an equi match; never a nested-loop
    time join); earliest-B is one aggregate at the A grain and the veto
    is one anti-join on the match key."""
    from .ops.relational import range_join_bucketed

    base = events.select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("unix_micros(ts) div 1000000").alias("ts_s"),
    )
    a = base.where(F.col("event_type") == SEQ_A).select(
        "user_id",
        F.col("event_id").alias("aid"),
        F.col("ts_s").alias("ta"),
        (F.col("ts_s") + 1).alias("s0"),
        (F.col("ts_s") + SEQ_WINDOW_S + 1).alias("s1"),
    )
    b = base.where(F.col("event_type") == SEQ_B).select(
        "user_id", F.col("ts_s").alias("es")
    )
    firstb = (
        range_join_bucketed(a, b, "user_id", SEQ_BUCKET_S)
        .groupBy("user_id", "aid", "ta")
        .agg(F.min("es").alias("tb"))
    )
    veto_iv = firstb.select(
        "user_id",
        "aid",
        (F.col("ta") + 1).alias("s0"),
        F.col("tb").alias("s1"),
    )
    c = base.where(F.col("event_type") == SEQ_NOT).select(
        "user_id", F.col("ts_s").alias("es")
    )
    vetoed = range_join_bucketed(veto_iv, c, "user_id", SEQ_BUCKET_S).select(
        "user_id", "aid"
    ).distinct()
    good = firstb.join(vetoed, ["user_id", "aid"], "left_anti")
    return (
        good.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min(F.col("tb") - F.col("ta")).alias("min_gap_s"),
            F.max(F.col("tb") - F.col("ta")).alias("max_gap_s"),
        )
        .orderBy("user_id")
    )


def _events_seq_pattern(spark, sf_dir):
    return seq_pattern(t(spark, sf_dir, "events"))


_SEQ_SQL = f"""
WITH base AS (
  SELECT user_id, event_id, event_type,
         epoch_us(ts) // 1000000 AS ts_s
  FROM events
),
a AS (SELECT user_id, event_id AS aid, ts_s AS ta FROM base
      WHERE event_type = '{SEQ_A}'),
b AS (SELECT user_id, ts_s AS tb FROM base WHERE event_type = '{SEQ_B}'),
c AS (SELECT user_id, ts_s AS tc FROM base WHERE event_type = '{SEQ_NOT}'),
firstb AS (
  SELECT a.user_id, a.aid, a.ta, min(b.tb) AS tb
  FROM a JOIN b ON b.user_id = a.user_id
   AND b.tb > a.ta AND b.tb <= a.ta + {SEQ_WINDOW_S}
  GROUP BY 1, 2, 3
),
good AS (
  SELECT f.* FROM firstb f
  WHERE NOT EXISTS (
    SELECT 1 FROM c
    WHERE c.user_id = f.user_id AND c.tc > f.ta AND c.tc < f.tb
  )
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_matches,
       min(tb - ta) AS min_gap_s, max(tb - ta) AS max_gap_s
FROM good GROUP BY user_id ORDER BY user_id
"""


R6B_QUERIES["events_seq_pattern"] = QueryDef(
    "events_seq_pattern", _events_seq_pattern, _SEQ_SQL, ("events",)
)


# --------------------------------------------------- KENDALL TAU-B

KT_XMAX = 511  # dollar-bucket clamp (values top out ~330; clamp keeps
#                the dense grid a literal constant on both engines)
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


R6B_QUERIES["stat_kendall_tau"] = QueryDef(
    "stat_kendall_tau", _stat_kendall_tau, _KT_SQL, ("stat",)
)


# ---------------------------------------------- BROWN-FORSYTHE LEVENE


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


R6B_QUERIES["stat_brown_forsythe"] = QueryDef(
    "stat_brown_forsythe", _stat_brown_forsythe, _BF_LEVENE_SQL, ("stat",)
)


# ------------------------------------------------------ CDC LOG REPLAY


def cdc_apply(customer, events):
    """CDC log replay (Debezium full-image semantics): the event stream
    is an ordered change log over the customer dimension — signup/
    purchase rows are UPSERTs carrying a new balance, error rows are
    DELETEs — and only each key's LAST operation (by ts, then event_id)
    matters. Reports the replay digest: inserts vs updates vs deletes
    vs no-ops, final row count, and the final balance checksum.

    This is the ordered-log counterpart of merge_upsert (one unordered
    batch) and scd2_merge (history-keeping): last-op election is ONE
    max(struct) aggregate at the key grain, the apply is ONE full-outer
    key-grain join, and the digest one aggregate row — three shuffles
    total, none at the fact grain after the election."""
    lastop = (
        events.where(
            F.col("event_type").isin("signup", "purchase", "error")
        )
        .select(
            F.col("user_id").alias("k"),
            F.struct(
                F.unix_micros("ts").alias("ts_us"),
                F.col("event_id").alias("eid"),
                F.when(F.col("event_type") == "error", F.lit("D"))
                .otherwise(F.lit("U"))
                .alias("op"),
                cents(F.col("value")).alias("new_bal"),
            ).alias("s"),
        )
        .groupBy("k")
        .agg(F.max("s").alias("m"))
        .select("k", F.col("m.op").alias("op"), F.col("m.new_bal").alias("new_bal"))
    )
    base = customer.select(
        F.col("c_custkey").alias("k"),
        cents(F.col("c_acctbal")).alias("bal"),
    )
    j = base.join(lastop, "k", "full_outer")
    return j.agg(
        F.count(F.col("bal")).alias("n_base"),
        F.count(F.col("op")).alias("n_log_keys"),
        F.count(
            F.when(F.col("bal").isNull() & (F.col("op") == "U"), 1)
        ).alias("n_inserted"),
        F.count(
            F.when(F.col("bal").isNotNull() & (F.col("op") == "U"), 1)
        ).alias("n_updated"),
        F.count(
            F.when(F.col("bal").isNotNull() & (F.col("op") == "D"), 1)
        ).alias("n_deleted"),
        F.count(
            F.when(F.col("bal").isNull() & (F.col("op") == "D"), 1)
        ).alias("n_delete_noop"),
        F.count(
            F.when(F.col("bal").isNotNull() & F.col("op").isNull(), 1)
        ).alias("n_unchanged"),
        F.sum(
            F.when(F.col("op") == "U", F.col("new_bal")).when(
                F.col("op").isNull(), F.col("bal")
            )
        ).alias("final_balance_cents"),
        (
            F.count(F.when(F.col("op") == "U", 1))
            + F.count(F.when(F.col("bal").isNotNull() & F.col("op").isNull(), 1))
        ).alias("final_count"),
    )


def _warehouse_cdc_apply(spark, sf_dir):
    return cdc_apply(t(spark, sf_dir, "customer"), t(spark, sf_dir, "events"))


_CDC_SQL = """
WITH lg AS (
  SELECT user_id AS k,
         epoch_us(ts) AS ts_us, event_id,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS new_bal
  FROM events WHERE event_type IN ('signup', 'purchase', 'error')
),
mx AS (
  SELECT k, max(struct_pack(ts_us := ts_us, event_id := event_id,
                            op := op, new_bal := new_bal)) AS m
  FROM lg GROUP BY k
),
lastop AS (
  SELECT k, m['op'] AS op, m['new_bal'] AS new_bal FROM mx
),
base AS (
  SELECT c_custkey AS k,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal
  FROM customer
),
j AS (
  SELECT base.k AS bk, lastop.k AS lk, bal, op, new_bal
  FROM base FULL OUTER JOIN lastop ON base.k = lastop.k
)
SELECT CAST(count(bal) AS BIGINT) AS n_base,
       CAST(count(op) AS BIGINT) AS n_log_keys,
       CAST(count(CASE WHEN bal IS NULL AND op = 'U' THEN 1 END) AS BIGINT)
           AS n_inserted,
       CAST(count(CASE WHEN bal IS NOT NULL AND op = 'U' THEN 1 END)
            AS BIGINT) AS n_updated,
       CAST(count(CASE WHEN bal IS NOT NULL AND op = 'D' THEN 1 END)
            AS BIGINT) AS n_deleted,
       CAST(count(CASE WHEN bal IS NULL AND op = 'D' THEN 1 END) AS BIGINT)
           AS n_delete_noop,
       CAST(count(CASE WHEN bal IS NOT NULL AND op IS NULL THEN 1 END)
            AS BIGINT) AS n_unchanged,
       CAST(sum(CASE WHEN op = 'U' THEN new_bal
                     WHEN op IS NULL THEN bal END) AS BIGINT)
           AS final_balance_cents,
       CAST(count(CASE WHEN op = 'U' THEN 1 END)
            + count(CASE WHEN bal IS NOT NULL AND op IS NULL THEN 1 END)
            AS BIGINT) AS final_count
FROM j
"""


R6B_QUERIES["warehouse_cdc_apply"] = QueryDef(
    "warehouse_cdc_apply", _warehouse_cdc_apply, _CDC_SQL, ("warehouse",)
)


# ------------------------------------------------- HYBRID RRF FUSION

RRF_C = 60
RRF_LIST_K = 15
RRF_OUT_K = 10


def hybrid_rrf(docs, embeddings):
    """Reciprocal-rank fusion (Cormack et al. 2009) of the two
    retrieval modalities: the lexical BM25 top-k and the dense SQ8-ANN
    top-k (query = vector 0) merge by rrf(id) = sum over lists of
    1e6 div (60 + rank) — the standard hybrid-search combiner of every
    RAG stack, exact in int64 by construction.

    Scale shape: both input lists are k-bounded (each produced by the
    window-free ranked_topk), so the fusion is a k-row full-outer join
    plus one more ranked_topk — everything after the two retrieval
    scans is metadata-sized."""
    from .ext.similarity import sq8_codes
    from .ops.scale import ranked_topk

    bm = bm25_topk(docs, topk=RRF_LIST_K).select(
        F.col("doc_id").alias("id"), F.col("rnk").alias("bm25_rnk")
    )
    codes = sq8_codes(embeddings)
    q = codes.where(F.col("vec_id") == 0).select(F.col("c").alias("qc"))
    dists = (
        codes.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.expr(_D2_EXPR.format(a="c", b="qc")).alias("d2"),
        )
    )
    ann = ranked_topk(
        dists, [("d2", "asc"), ("vec_id", "asc")], RRF_LIST_K
    ).select(F.col("vec_id").alias("id"), F.col("rnk").alias("ann_rnk"))
    fused = bm.join(ann, "id", "full_outer").select(
        "id",
        "bm25_rnk",
        "ann_rnk",
        (
            F.coalesce(
                F.expr(f"1000000 div ({RRF_C} + bm25_rnk)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"1000000 div ({RRF_C} + ann_rnk)"), F.lit(0)
            )
        ).alias("rrf_micro"),
    )
    return ranked_topk(
        fused, [("rrf_micro", "desc"), ("id", "asc")], RRF_OUT_K,
        rank_name="fused_rank",
    ).select("fused_rank", "id", "rrf_micro", "bm25_rnk", "ann_rnk")


def _rag_hybrid_rrf(spark, sf_dir):
    return hybrid_rrf(
        t(spark, sf_dir, "documents"), t(spark, sf_dir, "embeddings")
    )


_RRF_SQL = f"""
WITH bm AS (
  SELECT doc_id AS id, rnk AS bm25_rnk FROM ({_BM25_SQL})
),
e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings),
idx AS (SELECT vec_id, v, unnest(range(1, len(v)+1)) AS i FROM e),
d AS (SELECT i AS pos, min(v[i]) AS mn, max(v[i]) AS mx FROM idx GROUP BY 1),
b AS (SELECT list(mn ORDER BY pos) AS mn, list(mx ORDER BY pos) AS mx FROM d),
codes AS (SELECT vec_id,
  list_transform(range(1, len(v)+1), i ->
    CASE WHEN b.mx[i] > b.mn[i]
         THEN CAST(floor((v[i] - b.mn[i]) / (b.mx[i] - b.mn[i]) * 255 + 0.5)
                   AS BIGINT)
         ELSE 0 END) AS c
  FROM e CROSS JOIN b),
qv AS (SELECT c AS qc FROM codes WHERE vec_id = 0),
dists AS (
  SELECT vec_id,
         CAST(list_sum(list_transform(range(1, {RP_IN_DIMS} + 1),
              i -> (c[i] - qc[i]) * (c[i] - qc[i]))) AS BIGINT) AS d2
  FROM codes, qv WHERE vec_id <> 0
),
ann AS (
  SELECT vec_id AS id,
         CAST(row_number() OVER (ORDER BY d2 ASC, vec_id ASC) AS BIGINT)
             AS ann_rnk
  FROM dists ORDER BY d2 ASC, vec_id ASC LIMIT {RRF_LIST_K}
),
fused AS (
  SELECT COALESCE(bm.id, ann.id) AS id, bm25_rnk, ann_rnk,
         COALESCE(1000000 // ({RRF_C} + bm25_rnk), 0)
         + COALESCE(1000000 // ({RRF_C} + ann_rnk), 0) AS rrf_micro
  FROM bm FULL OUTER JOIN ann ON bm.id = ann.id
)
SELECT CAST(row_number() OVER (ORDER BY rrf_micro DESC, id ASC) AS BIGINT)
           AS fused_rank,
       id, rrf_micro, bm25_rnk, ann_rnk
FROM fused ORDER BY rrf_micro DESC, id ASC LIMIT {RRF_OUT_K}
"""


R6B_QUERIES["rag_hybrid_rrf"] = QueryDef(
    "rag_hybrid_rrf", _rag_hybrid_rrf, _RRF_SQL, ("rag",)
)


# ------------------------------------------- KNESER-NEY CROSS-ENTROPY

# Absolute discount d = 0.75 enters as the literal double 0.75 in one
# shared expression — never a subtraction inside an aggregate.


def kneser_ney_xent(docs):
    """Interpolated Kneser-Ney bigram cross-entropy per source (Kneser
    & Ney 1995; Chen & Goodman 1999 eq. 4.25) — the standard smoothed
    n-gram LM, one rung above the repo's add-1 char-trigram model:
    p(w|v) = max(c(vw)-d, 0)/c(v) + d*N1+(v.)/c(v) * N1+(.w)/N1+(..).
    Per-source cross-entropy under the corpus-wide model is the
    source-quality / domain-shift score CCNet-style pipelines bucket
    on.

    Exactness: every count is int64; -ln p is ONE double expression
    over those ints, micro-nat-quantized PER DISTINCT BIGRAM before the
    count-weighted integer per-source sum (fold-order rule).

    Scale shape: the model lives at the distinct-bigram grain (vocab^2
    bound, far below the token count); source scoring joins the
    (source, bigram) counts to the model and collapses with one
    aggregate. Three shuffles: bigram counts, source-bigram counts, the
    final source rollup."""
    bi = (
        docs.select(
            "source", _tok(F.col("text")).alias("toks")
        )
        .where(F.size("toks") >= 2)
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> struct(element_at(toks, i) AS v, "
                    "element_at(toks, i + 1) AS w))"
                )
            ).alias("b"),
        )
        .select("source", F.col("b.v").alias("v"), F.col("b.w").alias("w"))
    )
    cvw = bi.groupBy("v", "w").agg(F.count(F.lit(1)).alias("c"))
    cv = cvw.groupBy("v").agg(
        F.sum("c").alias("cv"), F.count(F.lit(1)).alias("n1p_v")
    )
    cw = cvw.groupBy("w").agg(F.count(F.lit(1)).alias("n1p_w"))
    n1p_tot = cvw.agg(F.count(F.lit(1)).alias("n1p_tot"))
    model = (
        cvw.join(F.broadcast(cv), "v")
        .join(F.broadcast(cw), "w")
        .join(F.broadcast(n1p_tot))
        .select(
            "v",
            "w",
            F.floor(
                -F.log(
                    (F.col("c").cast("double") - 0.75)
                    / F.col("cv").cast("double")
                    + 0.75
                    * F.col("n1p_v").cast("double")
                    / F.col("cv").cast("double")
                    * F.col("n1p_w").cast("double")
                    / F.col("n1p_tot").cast("double")
                )
                * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("nll_micro"),
        )
    )
    src = bi.groupBy("source", "v", "w").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        src.join(F.broadcast(model), ["v", "w"])
        .groupBy("source")
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.expr("sum(cnt * nll_micro) div sum(cnt)").alias("xent_micro"),
        )
        .orderBy("source")
    )


def _text_kneser_ney_xent(spark, sf_dir):
    return kneser_ney_xent(t(spark, sf_dir, "documents"))


_KN_SQL = """
WITH dt AS (
  SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
bi AS (
  SELECT source, toks[i] AS v, toks[i + 1] AS w
  FROM (SELECT source, toks, unnest(range(1, len(toks))) AS i
        FROM dt WHERE len(toks) >= 2)
),
cvw AS (SELECT v, w, CAST(count(*) AS BIGINT) AS c FROM bi GROUP BY 1, 2),
cv AS (SELECT v, CAST(sum(c) AS BIGINT) AS cv,
              CAST(count(*) AS BIGINT) AS n1p_v
       FROM cvw GROUP BY 1),
cw AS (SELECT w, CAST(count(*) AS BIGINT) AS n1p_w FROM cvw GROUP BY 1),
n1p AS (SELECT CAST(count(*) AS BIGINT) AS n1p_tot FROM cvw),
model AS (
  SELECT cvw.v, cvw.w,
         CAST(floor(-ln((CAST(c AS DOUBLE) - 0.75) / CAST(cv AS DOUBLE)
                        + 0.75 * CAST(n1p_v AS DOUBLE) / CAST(cv AS DOUBLE)
                          * CAST(n1p_w AS DOUBLE) / CAST(n1p_tot AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT) AS nll_micro
  FROM cvw JOIN cv ON cvw.v = cv.v JOIN cw ON cvw.w = cw.w, n1p
),
src AS (
  SELECT source, v, w, CAST(count(*) AS BIGINT) AS cnt
  FROM bi GROUP BY 1, 2, 3
)
SELECT source, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
       CAST(sum(cnt * nll_micro) AS BIGINT) // CAST(sum(cnt) AS BIGINT)
           AS xent_micro
FROM src JOIN model ON src.v = model.v AND src.w = model.w
GROUP BY source ORDER BY source
"""


# --------------------------------------------------------- CUPED A/B


def cuped_adjust(events):
    """CUPED variance-reduced A/B effect (Deng et al. 2013): users hash
    into two arms; the pre-period metric (spend before the stream's
    integer midpoint) is the control covariate for the post-period
    metric; theta = cov(pre,post)/var(pre) pooled, and the adjusted
    effect is mean_A(post - theta*(pre - mean(pre))) minus the same for
    B — the experiment-sensitivity booster every mature A/B platform
    ships.

    Exactness: user-grain pre/post sums are int64 DOLLARS (cents div
    100 keeps the cross-moment sum inside int64 at 1000x the fixture
    scale); theta quantizes to micro before it touches the arm means,
    so both engines adjust with the identical rational theta; outputs
    are milli-quantized doubles over exact sums. Scale shape: one
    shuffle to the user grain, one to the (arm) grain, moments combine
    as broadcast 1-row aggregates."""
    mid = events.agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.max(F.unix_micros("ts")).alias("t1"),
    ).select(F.expr("t0 + (t1 - t0) div 2").alias("mid"))
    per_user = (
        events.join(F.broadcast(mid))
        .select(
            "user_id",
            F.when(
                F.unix_micros("ts") < F.col("mid"),
                F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT) div 100"),
            )
            .otherwise(0)
            .alias("pre_d"),
            F.when(
                F.unix_micros("ts") >= F.col("mid"),
                F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT) div 100"),
            )
            .otherwise(0)
            .alias("post_d"),
        )
        .groupBy("user_id")
        .agg(F.sum("pre_d").alias("pre"), F.sum("post_d").alias("post"))
        .select(
            "user_id",
            "pre",
            "post",
            (
                _h32(F.concat(F.lit("arm:"), F.col("user_id").cast("string")))
                % 2
            ).alias("arm"),
        )
    )
    mom = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pre").alias("sp"),
        F.sum("post").alias("sq"),
        F.sum(F.col("pre") * F.col("pre")).alias("spp"),
        F.sum(F.col("pre") * F.col("post")).alias("spq"),
    ).select(
        "*",
        F.floor(
            (
                F.col("n").cast("double") * F.col("spq").cast("double")
                - F.col("sp").cast("double") * F.col("sq").cast("double")
            )
            / (
                F.col("n").cast("double") * F.col("spp").cast("double")
                - F.col("sp").cast("double") * F.col("sp").cast("double")
            )
            * 1000000
            + F.lit(0.5)
        ).alias("theta_micro"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_a"),
        F.sum("pre").alias("sp_a"),
        F.sum("post").alias("sq_a"),
    )
    wide = (
        arms.join(F.broadcast(mom))
        .select(
            "arm",
            "n_a",
            (
                F.col("sq_a").cast("double") / F.col("n_a").cast("double")
                - F.col("theta_micro").cast("double")
                / 1.0e6
                * (
                    F.col("sp_a").cast("double") / F.col("n_a").cast("double")
                    - F.col("sp").cast("double") / F.col("n").cast("double")
                )
            ).alias("adj_mean"),
            (
                F.col("sq_a").cast("double") / F.col("n_a").cast("double")
            ).alias("raw_mean"),
            "theta_micro",
            "n",
        )
    )
    return (
        wide.groupBy("theta_micro", "n")
        .agg(
            F.sum("n_a").alias("n_users"),
            F.floor(
                F.sum(
                    F.when(F.col("arm") == 0, F.col("raw_mean")).otherwise(
                        -F.col("raw_mean")
                    )
                )
                * 1000
                + F.lit(0.5)
            ).alias("raw_diff_milli"),
            F.floor(
                F.sum(
                    F.when(F.col("arm") == 0, F.col("adj_mean")).otherwise(
                        -F.col("adj_mean")
                    )
                )
                * 1000
                + F.lit(0.5)
            ).alias("cuped_diff_milli"),
        )
        .select(
            "n_users", "theta_micro", "raw_diff_milli", "cuped_diff_milli"
        )
    )


def _events_cuped_adjust(spark, sf_dir):
    return cuped_adjust(t(spark, sf_dir, "events"))


_CUPED_SQL = """
WITH mid AS (
  SELECT min(epoch_us(ts)) + (max(epoch_us(ts)) - min(epoch_us(ts))) // 2
             AS mid
  FROM events
),
per_user AS (
  SELECT user_id,
         CAST(sum(CASE WHEN epoch_us(ts) < mid
                  THEN CAST(floor(value * 100 + 0.5) AS BIGINT) // 100
                  ELSE 0 END) AS BIGINT) AS pre,
         CAST(sum(CASE WHEN epoch_us(ts) >= mid
                  THEN CAST(floor(value * 100 + 0.5) AS BIGINT) // 100
                  ELSE 0 END) AS BIGINT) AS post
  FROM events, mid GROUP BY user_id
),
armed AS (
  SELECT *,
         ('0x' || substr(md5('arm:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
             % 2 AS arm
  FROM per_user
),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(pre) AS BIGINT) AS sp, CAST(sum(post) AS BIGINT) AS sq,
         CAST(sum(pre * pre) AS BIGINT) AS spp,
         CAST(sum(pre * post) AS BIGINT) AS spq
  FROM armed
),
theta AS (
  SELECT *,
         CAST(floor((CAST(n AS DOUBLE) * CAST(spq AS DOUBLE)
                     - CAST(sp AS DOUBLE) * CAST(sq AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                       - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT) AS theta_micro
  FROM mom
),
arms AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n_a,
         CAST(sum(pre) AS BIGINT) AS sp_a, CAST(sum(post) AS BIGINT) AS sq_a
  FROM armed GROUP BY arm
),
wide AS (
  SELECT arm, n_a, theta_micro, n,
         CAST(sq_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS raw_mean,
         CAST(sq_a AS DOUBLE) / CAST(n_a AS DOUBLE)
         - CAST(theta_micro AS DOUBLE) / 1.0e6
           * (CAST(sp_a AS DOUBLE) / CAST(n_a AS DOUBLE)
              - CAST(sp AS DOUBLE) / CAST(n AS DOUBLE)) AS adj_mean
  FROM arms, theta
)
SELECT CAST(sum(n_a) AS BIGINT) AS n_users,
       theta_micro,
       CAST(floor(sum(CASE WHEN arm = 0 THEN raw_mean ELSE -raw_mean END)
                  * 1000 + 0.5) AS BIGINT) AS raw_diff_milli,
       CAST(floor(sum(CASE WHEN arm = 0 THEN adj_mean ELSE -adj_mean END)
                  * 1000 + 0.5) AS BIGINT) AS cuped_diff_milli
FROM wide GROUP BY theta_micro, n
"""


# --------------------------------------------------- NEYMAN ALLOCATION

NEYMAN_BUDGET = 10000


def neyman_alloc(events, budget: int = NEYMAN_BUDGET):
    """Neyman-optimal stratified sample allocation (Neyman 1934):
    allocate a fixed budget across strata proportionally to N_h * S_h
    (stratum size times value stddev), with Hamilton largest-remainder
    integer rounding — the survey/eval-set design step that minimizes
    estimator variance for a fixed labeling budget.

    Exactness: N_h and the moment sums are int64; the weight, shares,
    and remainders are the identical double expressions on both
    engines; the final integer allocation comes from floor + a
    remainder rank computed by a triangular self-join at the bounded
    stratum grain (no window)."""
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
            (
                F.col("n_h").cast("double")
                * F.sqrt(
                    (
                        F.col("n_h").cast("double") * F.col("svv").cast("double")
                        - F.col("sv").cast("double") * F.col("sv").cast("double")
                    )
                    / (
                        F.col("n_h").cast("double")
                        * (F.col("n_h") - 1).cast("double")
                    )
                )
            ).alias("wgt"),
        )
    )
    tot = grp.agg(F.sum("wgt").alias("wtot"))
    shares = grp.join(F.broadcast(tot)).select(
        "g",
        "n_h",
        F.floor(F.lit(budget) * F.col("wgt") / F.col("wtot")).alias("base"),
        (
            F.lit(budget) * F.col("wgt") / F.col("wtot")
            - F.floor(F.lit(budget) * F.col("wgt") / F.col("wtot"))
        ).alias("rem"),
        F.floor(
            F.col("wgt") / F.col("wtot") * 1000000 + F.lit(0.5)
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
         CAST(count(*) AS BIGINT) * sqrt(
           (CAST(count(*) AS BIGINT)
              * CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)
                         * CAST(floor(value * 100 + 0.5) AS BIGINT))
                     AS DOUBLE)
            - CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
              * CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE))
           / (CAST(count(*) AS BIGINT)
              * CAST(count(*) - 1 AS DOUBLE))) AS wgt
  FROM events GROUP BY 1
),
tot AS (SELECT sum(wgt) AS wtot FROM grp),
shares AS (
  SELECT g, n_h,
         floor({NEYMAN_BUDGET} * wgt / wtot) AS base,
         {NEYMAN_BUDGET} * wgt / wtot
             - floor({NEYMAN_BUDGET} * wgt / wtot) AS rem,
         CAST(floor(wgt / wtot * 1000000 + 0.5) AS BIGINT) AS share_micro
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


for _q in (
    QueryDef(
        "text_kneser_ney_xent", _text_kneser_ney_xent, _KN_SQL, ("text",)
    ),
    QueryDef(
        "events_cuped_adjust", _events_cuped_adjust, _CUPED_SQL, ("events",)
    ),
    QueryDef(
        "sample_neyman_alloc", _sample_neyman_alloc, _NEYMAN_SQL, ("sample",)
    ),
):
    R6B_QUERIES[_q.name] = _q


# ------------------------------------------------ DEGREE ASSORTATIVITY


def assortativity(edges):
    """Degree-assortativity coefficient (Newman 2002): the Pearson
    correlation of endpoint degrees across edges — do hubs link to hubs
    (r > 0) or to leaves (r < 0)? The one-number structural fingerprint
    that distinguishes social-style from web-style co-occurrence
    graphs.

    Exactness: all six moment sums are int64 over exact degrees; r is
    one double expression over them, micro-quantized. Scale shape: one
    degree aggregate at the node grain, two node-grain equi-joins to
    tag each edge with (deg_src, deg_dst), one moment aggregate — the
    edge table is scanned once after the degree build."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    tagged = (
        edges.join(deg.select(F.col("src").alias("_s"), F.col("d").alias("dj")),
                   F.col("src") == F.col("_s"))
        .join(deg.select(F.col("src").alias("_t"), F.col("d").alias("dk")),
              F.col("dst") == F.col("_t"))
        .select("dj", "dk")
    )
    mom = tagged.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("dj").alias("sj"),
        F.sum("dk").alias("sk"),
        F.sum(F.col("dj") * F.col("dj")).alias("sjj"),
        F.sum(F.col("dk") * F.col("dk")).alias("skk"),
        F.sum(F.col("dj") * F.col("dk")).alias("sjk"),
    )
    num = (
        F.col("m").cast("double") * F.col("sjk").cast("double")
        - F.col("sj").cast("double") * F.col("sk").cast("double")
    )
    den = F.sqrt(
        (
            F.col("m").cast("double") * F.col("sjj").cast("double")
            - F.col("sj").cast("double") * F.col("sj").cast("double")
        )
        * (
            F.col("m").cast("double") * F.col("skk").cast("double")
            - F.col("sk").cast("double") * F.col("sk").cast("double")
        )
    )
    return mom.select(
        F.col("m").alias("n_edges"),
        "sj",
        "sjk",
        F.when(
            (
                F.col("m") * F.col("sjj") - F.col("sj") * F.col("sj") > 0
            )
            & (F.col("m") * F.col("skk") - F.col("sk") * F.col("sk") > 0),
            F.floor(num / den * 1000000 + F.lit(0.5)),
        ).alias("assort_micro"),
    )


def _graph_assortativity(spark, sf_dir):
    from .ops import graph as G

    li = t(spark, sf_dir, "lineitem")
    edges = G.cooccurrence_edges(li, "l_orderkey", "l_partkey", min_groups=2)
    return assortativity(edges)


_ASSORT_SQL = f"""
WITH edges AS ({_BFS_EDGES_CTE}),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY 1),
tagged AS (
  SELECT a.d AS dj, b.d AS dk
  FROM edges e JOIN deg a ON e.src = a.src JOIN deg b ON e.dst = b.src
),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(dj) AS BIGINT) AS sj, CAST(sum(dk) AS BIGINT) AS sk,
         CAST(sum(dj * dj) AS BIGINT) AS sjj,
         CAST(sum(dk * dk) AS BIGINT) AS skk,
         CAST(sum(dj * dk) AS BIGINT) AS sjk
  FROM tagged
)
SELECT m AS n_edges, sj, sjk,
       CASE WHEN m * sjj - sj * sj > 0 AND m * skk - sk * sk > 0
            THEN CAST(floor((CAST(m AS DOUBLE) * CAST(sjk AS DOUBLE)
                             - CAST(sj AS DOUBLE) * CAST(sk AS DOUBLE))
                            / sqrt((CAST(m AS DOUBLE) * CAST(sjj AS DOUBLE)
                                    - CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE))
                                   * (CAST(m AS DOUBLE) * CAST(skk AS DOUBLE)
                                      - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE)))
                            * 1000000 + 0.5) AS BIGINT) END AS assort_micro
FROM mom
"""


R6B_QUERIES["graph_assortativity"] = QueryDef(
    "graph_assortativity", _graph_assortativity, _ASSORT_SQL, ("graph",)
)


# ------------------------------------------------------- LJUNG-BOX

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


R6B_QUERIES["ts_ljung_box"] = QueryDef(
    "ts_ljung_box", _ts_ljung_box, _LB_SQL, ("ts",)
)


# --------------------------------------------- MATRYOSHKA RECALL EVAL

MRL_PREFIX_DIMS = 16
MRL_QUERY_MOD = 50
MRL_QUERY_REM = 3
MRL_K = 10


def matryoshka_recall(embeddings):
    """Matryoshka-representation evaluation (Kusupati et al. 2022):
    for each sampled query, the top-k neighbor overlap between the full
    64-dim SQ8 distance and the 16-dim PREFIX distance — the number
    that says whether truncated embeddings are good enough to serve
    retrieval at a fraction of the memory.

    Exactness: both distances are int64 over the same SQ8 codes; the
    per-query top-k rank is a window partitioned BY QUERY (queries are
    the parallelism — the embed_knn_graph discipline) with (d2, id)
    tie-breaks; overlap is an integer count. One candidate equi-join
    per representation, bounded by the sampled query count."""
    from pyspark.sql import Window

    from .ext.similarity import sq8_codes

    codes = sq8_codes(embeddings)
    q = codes.where(
        F.col("vec_id") % MRL_QUERY_MOD == MRL_QUERY_REM
    ).select(F.col("vec_id").alias("qid"), F.col("c").alias("qc"))
    cand = codes.select(F.col("vec_id").alias("cid"), F.col("c").alias("cc"))
    pairs = (
        cand.join(F.broadcast(q))
        .where(F.col("cid") != F.col("qid"))
        .select(
            "qid",
            "cid",
            F.expr(_D2_EXPR.format(a="qc", b="cc")).alias("d2_full"),
            F.expr(
                "aggregate(zip_with(slice(qc, 1, {p}), slice(cc, 1, {p}), "
                "(u, v) -> (u - v) * (u - v)), 0L, (s, e) -> s + e)".format(
                    p=MRL_PREFIX_DIMS
                )
            ).alias("d2_pre"),
        )
    )
    wf = Window.partitionBy("qid").orderBy("d2_full", "cid")
    wp = Window.partitionBy("qid").orderBy("d2_pre", "cid")
    ranked = pairs.select(
        "qid",
        "cid",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wp).alias("rp"),
    )
    per_q = ranked.groupBy("qid").agg(
        F.sum(
            F.when((F.col("rf") <= MRL_K) & (F.col("rp") <= MRL_K), 1).otherwise(0)
        ).alias("n_overlap")
    )
    tot = per_q.agg(
        F.expr(f"(1000000 * sum(n_overlap)) div (count(1) * {MRL_K})").alias(
            "recall_micro"
        )
    )
    return (
        per_q.join(F.broadcast(tot))
        .select("qid", "n_overlap", "recall_micro")
        .orderBy("qid")
    )


def _embed_matryoshka_recall(spark, sf_dir):
    return matryoshka_recall(t(spark, sf_dir, "embeddings"))


_MRL_SQL = f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings),
idx AS (SELECT vec_id, v, unnest(range(1, len(v)+1)) AS i FROM e),
d AS (SELECT i AS pos, min(v[i]) AS mn, max(v[i]) AS mx FROM idx GROUP BY 1),
b AS (SELECT list(mn ORDER BY pos) AS mn, list(mx ORDER BY pos) AS mx FROM d),
codes AS (SELECT vec_id,
  list_transform(range(1, len(v)+1), i ->
    CASE WHEN b.mx[i] > b.mn[i]
         THEN CAST(floor((v[i] - b.mn[i]) / (b.mx[i] - b.mn[i]) * 255 + 0.5)
                   AS BIGINT)
         ELSE 0 END) AS c
  FROM e CROSS JOIN b),
pairs AS (
  SELECT q.vec_id AS qid, c2.vec_id AS cid,
         CAST(list_sum(list_transform(range(1, {RP_IN_DIMS} + 1),
              i -> (q.c[i] - c2.c[i]) * (q.c[i] - c2.c[i]))) AS BIGINT)
             AS d2_full,
         CAST(list_sum(list_transform(range(1, {MRL_PREFIX_DIMS} + 1),
              i -> (q.c[i] - c2.c[i]) * (q.c[i] - c2.c[i]))) AS BIGINT)
             AS d2_pre
  FROM (SELECT * FROM codes
        WHERE vec_id % {MRL_QUERY_MOD} = {MRL_QUERY_REM}) q
  JOIN codes c2 ON c2.vec_id <> q.vec_id
),
ranked AS (
  SELECT qid, cid,
         row_number() OVER (PARTITION BY qid ORDER BY d2_full, cid) AS rf,
         row_number() OVER (PARTITION BY qid ORDER BY d2_pre, cid) AS rp
  FROM pairs
),
per_q AS (
  SELECT qid,
         CAST(sum(CASE WHEN rf <= {MRL_K} AND rp <= {MRL_K} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_overlap
  FROM ranked GROUP BY qid
),
tot AS (
  SELECT (1000000 * CAST(sum(n_overlap) AS BIGINT))
             // (CAST(count(*) AS BIGINT) * {MRL_K}) AS recall_micro
  FROM per_q
)
SELECT qid, n_overlap, recall_micro FROM per_q, tot ORDER BY qid
"""


R6B_QUERIES["embed_matryoshka_recall"] = QueryDef(
    "embed_matryoshka_recall",
    _embed_matryoshka_recall,
    _MRL_SQL,
    ("embed",),
)


# ------------------------------------------------------- MODULARITY

MOD_ROUNDS = 3


def modularity(edges, labels):
    """Newman modularity Q of a community assignment over a symmetric
    edge list: Q = sum_c (e_c/m2 - (d_c/m2)^2), with e_c the
    within-community directed-edge count and d_c the community degree
    sum — the number that says whether the detected communities are
    real structure or noise (Q ~ 0).

    Exactness: e_c and d_c are int64; each community's term is ONE
    double expression over them, micro-quantized per community before
    the sum (fold-order rule). Scale shape: two broadcast label joins
    tag every edge, one aggregate per grain — the edge table is
    scanned once, and the label table is node-grain (broadcast like
    LPA's own rounds)."""
    m2 = edges.agg(F.count(F.lit(1)).alias("m2"))
    tagged = (
        edges.join(
            F.broadcast(
                labels.select(F.col("node").alias("_s"), F.col("lbl").alias("ls"))
            ),
            F.col("src") == F.col("_s"),
        )
        .join(
            F.broadcast(
                labels.select(F.col("node").alias("_t"), F.col("lbl").alias("lt"))
            ),
            F.col("dst") == F.col("_t"),
        )
        .select("ls", "lt")
    )
    per_c = tagged.groupBy(F.col("ls").alias("c")).agg(
        F.count(F.lit(1)).alias("d_c"),
        F.sum(F.when(F.col("lt") == F.col("ls"), 1).otherwise(0)).alias("e_c"),
    )
    terms = per_c.join(F.broadcast(m2)).select(
        "c",
        "d_c",
        "e_c",
        F.floor(
            (
                F.col("e_c").cast("double") / F.col("m2").cast("double")
                - F.col("d_c").cast("double")
                / F.col("m2").cast("double")
                * F.col("d_c").cast("double")
                / F.col("m2").cast("double")
            )
            * 1000000
            + F.lit(0.5)
        ).alias("term_micro"),
    )
    return terms.agg(
        F.count(F.lit(1)).alias("n_communities"),
        F.max("d_c").alias("max_degree_sum"),
        F.sum("e_c").alias("intra_edges"),
        F.sum("term_micro").alias("q_micro"),
    )


def _graph_modularity(spark, sf_dir):
    from .ops import graph as G

    li = t(spark, sf_dir, "lineitem")
    edges = G.cooccurrence_edges(li, "l_orderkey", "l_partkey", min_groups=2)
    return modularity(edges, G.lpa_labels(edges, rounds=MOD_ROUNDS))


def _modularity_sql() -> str:
    from .ops import graph as G

    prefix = G.lpa_labels_oracle_cte(_BFS_EDGES_CTE, rounds=MOD_ROUNDS)
    return (
        prefix
        + f"""
m2 AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM edges),
tagged AS (
  SELECT a.lbl AS ls, b.lbl AS lt
  FROM edges e
  JOIN l{MOD_ROUNDS} a ON e.src = a.node
  JOIN l{MOD_ROUNDS} b ON e.dst = b.node
),
per_c AS (
  SELECT ls AS c, CAST(count(*) AS BIGINT) AS d_c,
         CAST(sum(CASE WHEN lt = ls THEN 1 ELSE 0 END) AS BIGINT) AS e_c
  FROM tagged GROUP BY 1
),
terms AS (
  SELECT c, d_c, e_c,
         CAST(floor((CAST(e_c AS DOUBLE) / CAST(m2 AS DOUBLE)
                     - CAST(d_c AS DOUBLE) / CAST(m2 AS DOUBLE)
                       * CAST(d_c AS DOUBLE) / CAST(m2 AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT) AS term_micro
  FROM per_c, m2
)
SELECT CAST(count(*) AS BIGINT) AS n_communities,
       CAST(max(d_c) AS BIGINT) AS max_degree_sum,
       CAST(sum(e_c) AS BIGINT) AS intra_edges,
       CAST(sum(term_micro) AS BIGINT) AS q_micro
FROM terms
"""
    )


R6B_QUERIES["graph_modularity"] = QueryDef(
    "graph_modularity", _graph_modularity, _modularity_sql(), ("graph",)
)


# ------------------------------------------------------ BMP RLE8 CODEC


def _multimodal_bmp_rle(spark, sf_dir):
    """Real run-length decode: every document becomes a genuine
    BI_RLE8-compressed BMP via the pure-stdlib codec in ``ext/bmp.py``
    (run packets, end-of-line/bitmap escapes, bottom-up rows), then
    decodes back to exact palette-index statistics — the fourth real
    compression family beside LZW/DCT/Rice. RLE8 is lossless, so the
    DuckDB oracle replays the per-pixel LCG relationally and the hash
    match proves the encode→escape→decode loop is index-exact
    everywhere. Decoder breadth (absolute-mode packets with word
    padding, delta rejection, corruption + truncation fuzz) is
    pytest-covered. Scale shape: two chained Arrow-batched
    ``mapInPandas``, zero data shuffle."""
    from .ext import bmp as B

    docs = t(spark, sf_dir, "documents")
    return B.bmp_features(B.synthesize_bmp(docs))


_BMP_SQL = """
WITH RECURSIVE pw(k, ak, sk) AS (
  SELECT 1, CAST(6364136223846793005 AS BIGINT), CAST(1 AS BIGINT)
  UNION ALL
  SELECT k + 1,
         CAST((CAST(6364136223846793005 AS HUGEINT) * ak)
              % 9223372036854775808 AS BIGINT),
         CAST((CAST(6364136223846793005 AS HUGEINT) * sk + 1)
              % 9223372036854775808 AS BIGINT)
  FROM pw WHERE k < 35
),
docs0 AS (
  SELECT doc_id,
         CAST(doc_id % 6 + 2 AS BIGINT) AS w,
         CAST((doc_id // 6) % 4 + 2 AS BIGINT) AS h,
         CASE WHEN doc_id % 9 = 0 THEN doc_id + n_chars
              ELSE doc_id END AS sb
  FROM documents),
seeds AS (
  SELECT doc_id, w, h, w * h AS npx,
         CAST((CAST(sb AS HUGEINT) * 6364136223846793005
               + 1442695040888963407) % 9223372036854775808 AS BIGINT) AS s0
  FROM docs0),
px AS (
  SELECT d.doc_id, d.w, d.h, d.npx,
         (CAST((CAST(p.ak AS HUGEINT) * d.s0 + p.sk)
               % 9223372036854775808 AS BIGINT) // 8589934592) % 16 AS v
  FROM seeds d JOIN pw p ON p.k <= d.npx)
SELECT doc_id AS media_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(npx AS BIGINT) AS n_px,
       CAST(16 AS INTEGER) AS n_colors,
       CAST(sum(v) AS BIGINT) AS idx_sum,
       CAST(min(v) AS INTEGER) AS idx_min,
       CAST(max(v) AS INTEGER) AS idx_max
FROM px GROUP BY doc_id, w, h, npx
"""


R6B_QUERIES["multimodal_bmp_rle"] = QueryDef(
    "multimodal_bmp_rle", _multimodal_bmp_rle, _BMP_SQL, ("multimodal",)
)


# ---------------------------------------------------- SPEARMAN RHO


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


R6B_QUERIES["stat_spearman_corr"] = QueryDef(
    "stat_spearman_corr", _stat_spearman_corr, _SPEAR_SQL, ("stat",)
)


# ------------------------------------------- CONVERSION LAG PERCENTILES


def conversion_lag_pct(events):
    """Exact conversion-lag percentiles: the view->purchase gaps of the
    CEP matcher (earliest qualifying B, no veto) pooled across users,
    with p50/p90/p99 as EXACT order statistics over the distinct-gap
    grain — the SLA curve of the funnel, not just its count.

    One extra aggregate ladder over seq_pattern's verified match set:
    gaps collapse to the (distinct gap-second) grain, the percentile
    thresholds come from the standard 2*cum >= k*n lower-order-statistic
    rule (the repo's exact-percentile identity), and everything heavy
    stays on the bounded gap domain."""
    from pyspark.sql import Window

    from .ops.relational import range_join_bucketed

    base = events.select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("unix_micros(ts) div 1000000").alias("ts_s"),
    )
    a = base.where(F.col("event_type") == SEQ_A).select(
        "user_id",
        F.col("event_id").alias("aid"),
        F.col("ts_s").alias("ta"),
        (F.col("ts_s") + 1).alias("s0"),
        (F.col("ts_s") + SEQ_WINDOW_S + 1).alias("s1"),
    )
    b = base.where(F.col("event_type") == SEQ_B).select(
        "user_id", F.col("ts_s").alias("es")
    )
    firstb = (
        range_join_bucketed(a, b, "user_id", SEQ_BUCKET_S)
        .groupBy("user_id", "aid", "ta")
        .agg(F.min("es").alias("tb"))
    )
    veto_iv = firstb.select(
        "user_id", "aid",
        (F.col("ta") + 1).alias("s0"), F.col("tb").alias("s1"),
    )
    c = base.where(F.col("event_type") == SEQ_NOT).select(
        "user_id", F.col("ts_s").alias("es")
    )
    vetoed = range_join_bucketed(
        veto_iv, c, "user_id", SEQ_BUCKET_S
    ).select("user_id", "aid").distinct()
    gaps = (
        firstb.join(vetoed, ["user_id", "aid"], "left_anti")
        .select((F.col("tb") - F.col("ta")).alias("gap_s"))
        .groupBy("gap_s")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    g = gaps.withColumn("bkt", F.expr("gap_s div 86400"))
    w = (
        Window.partitionBy("bkt")
        .orderBy("gap_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = g.select(
        "gap_s", "bkt", "cnt", F.sum("cnt").over(w).alias("c_in")
    )
    btot = g.groupBy("bkt").agg(F.sum("cnt").alias("bn"))
    offs = (
        btot.select(F.col("bkt").alias("k"))
        .join(
            F.broadcast(btot.select(F.col("bkt").alias("k2"), "bn")),
            F.col("k2") < F.col("k"),
        )
        .groupBy("k")
        .agg(F.sum("bn").alias("off"))
    )
    cum = within.join(F.broadcast(offs), within.bkt == offs.k, "left").select(
        "gap_s",
        (F.coalesce("off", F.lit(0)) + F.col("c_in")).alias("cum"),
    )
    tot = gaps.agg(F.sum("cnt").alias("n"))
    pcts = cum.join(F.broadcast(tot)).agg(
        F.max(F.col("n")).alias("n_conversions"),
        F.min(
            F.when(100 * F.col("cum") >= 50 * F.col("n"), F.col("gap_s"))
        ).alias("p50_s"),
        F.min(
            F.when(100 * F.col("cum") >= 90 * F.col("n"), F.col("gap_s"))
        ).alias("p90_s"),
        F.min(
            F.when(100 * F.col("cum") >= 99 * F.col("n"), F.col("gap_s"))
        ).alias("p99_s"),
    )
    return pcts


def _events_conversion_lag(spark, sf_dir):
    return conversion_lag_pct(t(spark, sf_dir, "events"))


_CONVLAG_SQL = f"""
WITH base AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) // 1000000 AS ts_s
  FROM events
),
a AS (SELECT user_id, event_id AS aid, ts_s AS ta FROM base
      WHERE event_type = '{SEQ_A}'),
b AS (SELECT user_id, ts_s AS tb FROM base WHERE event_type = '{SEQ_B}'),
c AS (SELECT user_id, ts_s AS tc FROM base WHERE event_type = '{SEQ_NOT}'),
firstb AS (
  SELECT a.user_id, a.aid, a.ta, min(b.tb) AS tb
  FROM a JOIN b ON b.user_id = a.user_id
   AND b.tb > a.ta AND b.tb <= a.ta + {SEQ_WINDOW_S}
  GROUP BY 1, 2, 3
),
good AS (
  SELECT f.* FROM firstb f
  WHERE NOT EXISTS (
    SELECT 1 FROM c
    WHERE c.user_id = f.user_id AND c.tc > f.ta AND c.tc < f.tb
  )
),
gaps AS (
  SELECT tb - ta AS gap_s, CAST(count(*) AS BIGINT) AS cnt
  FROM good GROUP BY 1
),
cum AS (
  SELECT gap_s, CAST(sum(cnt) OVER (ORDER BY gap_s) AS BIGINT) AS cum
  FROM gaps
),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM gaps)
SELECT max(n) AS n_conversions,
       min(CASE WHEN 100 * cum >= 50 * n THEN gap_s END) AS p50_s,
       min(CASE WHEN 100 * cum >= 90 * n THEN gap_s END) AS p90_s,
       min(CASE WHEN 100 * cum >= 99 * n THEN gap_s END) AS p99_s
FROM cum, tot
"""


R6B_QUERIES["events_conversion_lag"] = QueryDef(
    "events_conversion_lag", _events_conversion_lag, _CONVLAG_SQL, ("events",)
)


# ---------------------------------------------------- CHAR ENTROPY


def char_entropy(docs):
    """Per-source character-unigram Shannon entropy (bits) — the
    cheapest gibberish/encoding-drift detector a text pipeline runs:
    natural language sits in a narrow entropy band, base64 blobs and
    mojibake fall outside it.

    Exactness: char counts are int64 at the (source x charset-bounded
    char) grain; each char's -p*log2(p) term is one double expression
    over exact counts, micro-quantized per char before the per-source
    sum. Two shuffles: the char-grain count and the source rollup."""
    chars = (
        docs.select(
            "source",
            F.explode(F.split(F.col("text"), "")).alias("ch"),
        )
        .where(F.col("ch") != "")
        .groupBy("source", "ch")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = chars.groupBy("source").agg(F.sum("cnt").alias("n_chars"))
    return (
        chars.join(F.broadcast(tot), "source")
        .select(
            "source",
            "n_chars",
            F.floor(
                -(
                    F.col("cnt").cast("double") / F.col("n_chars").cast("double")
                )
                * F.log2(
                    F.col("cnt").cast("double") / F.col("n_chars").cast("double")
                )
                * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("term_micro"),
        )
        .groupBy("source", "n_chars")
        .agg(F.sum("term_micro").alias("entropy_bits_micro"))
        .orderBy("source")
    )


def _text_char_entropy(spark, sf_dir):
    return char_entropy(t(spark, sf_dir, "documents"))


_ENTROPY_SQL = """
WITH chars AS (
  SELECT source, ch, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT source, unnest(string_split_regex(text, '')) AS ch
        FROM documents)
  WHERE ch <> ''
  GROUP BY 1, 2
),
tot AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_chars
        FROM chars GROUP BY 1)
SELECT source, n_chars,
       CAST(sum(CAST(floor(
         -(CAST(cnt AS DOUBLE) / CAST(n_chars AS DOUBLE))
         * log2(CAST(cnt AS DOUBLE) / CAST(n_chars AS DOUBLE))
         * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS entropy_bits_micro
FROM chars JOIN tot USING (source)
GROUP BY source, n_chars ORDER BY source
"""


R6B_QUERIES["text_char_entropy"] = QueryDef(
    "text_char_entropy", _text_char_entropy, _ENTROPY_SQL, ("text",)
)


# ------------------------------------------------- EMBEDDING DRIFT


def embed_drift(embeddings):
    """Embedding-distribution drift between the label-0 and label-1
    halves: per-dimension mean shift (SQ8-code units) and the overall
    centroid L2 distance — the retrain/reindex alarm a vector store
    monitors between snapshots.

    Exactness: per-dim code sums are int64; the per-dim normalized
    shift n0*n1-cross-multiplied stays integer (no division until the
    final micro-quantized distance). Scale shape: one posexplode
    shuffle to the (dim x label) grain — bounded by dims — then a
    dim-grain join and one 1-row rollup."""
    from .ext.similarity import sq8_codes

    lab = embeddings.select("vec_id", (F.col("vec_id") % 2).alias("lab"))
    codes = sq8_codes(embeddings).join(lab, "vec_id")
    dims = codes.select(
        "lab", F.posexplode(F.col("c")).alias("pos", "v")
    )
    per = dims.groupBy("pos", "lab").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    wide = (
        per.groupBy("pos")
        .agg(
            F.sum(F.when(F.col("lab") == 0, F.col("n"))).alias("n0"),
            F.sum(F.when(F.col("lab") == 0, F.col("sv"))).alias("s0"),
            F.sum(F.when(F.col("lab") == 1, F.col("n"))).alias("n1"),
            F.sum(F.when(F.col("lab") == 1, F.col("sv"))).alias("s1"),
        )
        .select(
            "pos",
            # mean shift in milli-code units, integer cross-multiplied
            F.expr(
                "(1000 * (s0 * n1 - s1 * n0)) div (n0 * n1)"
            ).alias("shift_milli"),
        )
    )
    return wide.agg(
        F.count(F.lit(1)).alias("n_dims"),
        F.max(F.abs(F.col("shift_milli"))).alias("max_abs_shift_milli"),
        F.floor(
            F.sqrt(
                F.sum(
                    F.col("shift_milli").cast("double")
                    * F.col("shift_milli").cast("double")
                )
                / 1.0e6
            )
            * 1000
            + F.lit(0.5)
        ).alias("centroid_l2_milli"),
    )


def _embed_drift_centroid(spark, sf_dir):
    return embed_drift(t(spark, sf_dir, "embeddings"))


_DRIFT_EMB_SQL = """
WITH e AS (SELECT vec_id, vec_id % 2 AS lab,
                  list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings),
idx AS (SELECT vec_id, v, unnest(range(1, len(v)+1)) AS i FROM e),
d AS (SELECT i AS pos, min(v[i]) AS mn, max(v[i]) AS mx FROM idx GROUP BY 1),
b AS (SELECT list(mn ORDER BY pos) AS mn, list(mx ORDER BY pos) AS mx FROM d),
codes AS (SELECT vec_id, lab,
  list_transform(range(1, len(v)+1), i ->
    CASE WHEN b.mx[i] > b.mn[i]
         THEN CAST(floor((v[i] - b.mn[i]) / (b.mx[i] - b.mn[i]) * 255 + 0.5)
                   AS BIGINT)
         ELSE 0 END) AS c
  FROM e CROSS JOIN b),
dims AS (
  SELECT lab, u.i - 1 AS pos, c[u.i] AS v
  FROM codes, unnest(range(1, len(c) + 1)) AS u(i)
),
per AS (
  SELECT pos, lab, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sv
  FROM dims GROUP BY 1, 2
),
wide AS (
  SELECT pos,
         (1000 * (sum(CASE WHEN lab = 0 THEN sv END)
                  * sum(CASE WHEN lab = 1 THEN n END)
                  - sum(CASE WHEN lab = 1 THEN sv END)
                    * sum(CASE WHEN lab = 0 THEN n END)))
             // (sum(CASE WHEN lab = 0 THEN n END)
                 * sum(CASE WHEN lab = 1 THEN n END)) AS shift_milli
  FROM per GROUP BY pos
)
SELECT CAST(count(*) AS BIGINT) AS n_dims,
       CAST(max(abs(shift_milli)) AS BIGINT) AS max_abs_shift_milli,
       CAST(floor(sqrt(sum(CAST(shift_milli AS DOUBLE)
                           * CAST(shift_milli AS DOUBLE)) / 1.0e6)
                  * 1000 + 0.5) AS BIGINT) AS centroid_l2_milli
FROM wide
"""


R6B_QUERIES["embed_drift_centroid"] = QueryDef(
    "embed_drift_centroid", _embed_drift_centroid, _DRIFT_EMB_SQL, ("embed",)
)


# ------------------------------------------------- AVERAGE PRECISION


def average_precision(events):
    """Average precision (the exact area under the stepwise PR curve):
    AP = sum over descending distinct scores of
    (tp_gain/n_pos) * precision-at-that-threshold — the
    threshold-free ranking metric that complements ml_threshold_sweep's
    fixed operating points (same click/view arms, same cents score;
    ties enter as one step, the standard tie-aware AP).

    Exactness: cumulative tp/fp come from the reflected hierarchical
    prefix at the distinct-score grain; each step's term is one double
    expression over exact int64 counts, micro-quantized per step before
    the sum. Everything heavy stays on the bounded score domain."""
    cum = _pos_neg_grain(events)
    from pyspark.sql import Window

    g = cum.withColumn("bkt", F.floor(F.col("v") / 4096))
    w = (
        Window.partitionBy("bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = g.select(
        "v", "bkt", "pos_cnt", "neg_cnt", "n_pos", "n_neg",
        F.sum("pos_cnt").over(w).alias("cp_in"),
        F.sum("neg_cnt").over(w).alias("cn_in"),
    )
    btot = g.groupBy("bkt").agg(
        F.sum("pos_cnt").alias("bp"), F.sum("neg_cnt").alias("bn")
    )
    offs = (
        btot.select(F.col("bkt").alias("k"))
        .join(
            F.broadcast(btot.select(F.col("bkt").alias("k2"), "bp", "bn")),
            F.col("k2") < F.col("k"),
        )
        .groupBy("k")
        .agg(F.sum("bp").alias("op"), F.sum("bn").alias("on"))
    )
    steps = within.join(
        F.broadcast(offs), within.bkt == offs.k, "left"
    ).select(
        "pos_cnt",
        "n_pos",
        # descending cumulative INCLUSIVE of this score group
        (
            F.col("n_pos")
            - (F.coalesce("op", F.lit(0)) + F.col("cp_in"))
            + F.col("pos_cnt")
        ).alias("tp"),
        (
            F.col("n_neg")
            - (F.coalesce("on", F.lit(0)) + F.col("cn_in"))
            + F.col("neg_cnt")
        ).alias("fp"),
    )
    terms = steps.where(F.col("pos_cnt") > 0).select(
        "n_pos",
        F.floor(
            F.col("pos_cnt").cast("double")
            / F.col("n_pos").cast("double")
            * F.col("tp").cast("double")
            / (F.col("tp") + F.col("fp")).cast("double")
            * 1000000000
            + F.lit(0.5)
        ).alias("term_nano"),
    )
    return terms.groupBy("n_pos").agg(
        F.expr("CAST(sum(term_nano) div 1000 AS BIGINT)").alias("ap_micro"),
        F.count(F.lit(1)).alias("n_steps"),
    ).select("n_pos", "n_steps", "ap_micro")


def _ml_average_precision(spark, sf_dir):
    return average_precision(t(spark, sf_dir, "events"))


_AP_SQL = f"""
WITH {_PN_CTE},
cums AS (
  SELECT v, pos_cnt, neg_cnt,
         CAST(sum(pos_cnt) OVER (ORDER BY v) AS BIGINT) AS cp,
         CAST(sum(neg_cnt) OVER (ORDER BY v) AS BIGINT) AS cn
  FROM g
),
steps AS (
  SELECT pos_cnt, n_pos,
         n_pos - cp + pos_cnt AS tp,
         n_neg - cn + neg_cnt AS fp
  FROM cums, tot
),
terms AS (
  SELECT n_pos,
         CAST(floor(CAST(pos_cnt AS DOUBLE) / CAST(n_pos AS DOUBLE)
                    * CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
                    * 1000000000 + 0.5) AS BIGINT) AS term_nano
  FROM steps WHERE pos_cnt > 0
)
SELECT n_pos, CAST(count(*) AS BIGINT) AS n_steps,
       CAST(sum(term_nano) // 1000 AS BIGINT) AS ap_micro
FROM terms GROUP BY n_pos
"""


R6B_QUERIES["ml_average_precision"] = QueryDef(
    "ml_average_precision", _ml_average_precision, _AP_SQL, ("ml",)
)


# ------------------------------------------------------- NDCG @ K

NDCG_K = 10
NDCG_QUERY_MOD = 50
NDCG_QUERY_REM = 7
# log2 discounts 1/log2(rank+1) for ranks 1..10, nano-quantized ONCE as
# shared literals — neither engine evaluates a log.
_NDCG_DISC_NANO = (
    (1, 1000000000),
    (2, 630929754),
    (3, 500000000),
    (4, 430676558),
    (5, 386852807),
    (6, 356207187),
    (7, 333333333),
    (8, 315464877),
    (9, 301029996),
    (10, 289064826),
)


def ndcg_ann(embeddings, k: int = NDCG_K):
    """NDCG@k of SQ8-ANN retrieval with label-match relevance: each
    sampled query retrieves its k nearest codes; a hit whose ``label``
    equals the query's counts relevance 1. DCG uses the standard
    1/log2(rank+1) discounts (nano-quantized literal constants — no log
    evaluated anywhere); IDCG is the same table truncated to the
    query's attainable hit count, so NDCG is exact integer division of
    two int64 sums.

    Scale shape: candidates scan once against the broadcast query
    sample, per-query ranks are windows partitioned by query (queries
    are the parallelism), and the discount join is a k-row literal
    broadcast."""
    from pyspark.sql import Window

    from .ext.similarity import sq8_codes

    lab = embeddings.select("vec_id", F.col("label").cast("long").alias("lb"))
    codes = sq8_codes(embeddings).join(lab, "vec_id")
    q = codes.where(
        F.col("vec_id") % NDCG_QUERY_MOD == NDCG_QUERY_REM
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("c").alias("qc"),
        F.col("lb").alias("qlb"),
    )
    pairs = (
        codes.join(F.broadcast(q))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "qlb",
            F.col("vec_id").alias("cid"),
            F.col("lb").alias("clb"),
            F.expr(_D2_EXPR.format(a="qc", b="c")).alias("d2"),
        )
    )
    w = Window.partitionBy("qid").orderBy("d2", "cid")
    topk = pairs.select(
        "qid", "qlb", "clb", F.row_number().over(w).alias("rnk")
    ).where(F.col("rnk") <= k)
    disc = F.broadcast(
        embeddings.sparkSession.createDataFrame(
            list(_NDCG_DISC_NANO), "rnk int, disc_nano long"
        )
    )
    per_q = (
        topk.join(disc, "rnk")
        .groupBy("qid")
        .agg(
            F.sum(
                F.when(F.col("clb") == F.col("qlb"), F.col("disc_nano")).otherwise(0)
            ).alias("dcg_nano"),
            F.sum(
                F.when(F.col("clb") == F.col("qlb"), 1).otherwise(0)
            ).alias("n_hits"),
        )
    )
    # IDCG = sum of the first n_hits discounts (prefix sums of the
    # literal table, joined by hit count)
    idcg_rows = []
    acc = 0
    for r, dn in _NDCG_DISC_NANO:
        acc += dn
        idcg_rows.append((r, acc))
    idcg = F.broadcast(
        embeddings.sparkSession.createDataFrame(
            idcg_rows, "n_hits int, idcg_nano long"
        )
    )
    return (
        per_q.join(idcg, per_q.n_hits == idcg.n_hits, "left")
        .select(
            "qid",
            per_q.n_hits.alias("n_hits"),
            "dcg_nano",
            F.when(
                F.col("idcg_nano").isNotNull(),
                F.expr("(1000000 * dcg_nano) div idcg_nano"),
            )
            .otherwise(F.lit(None).cast("long"))
            .alias("ndcg_micro"),
        )
        .orderBy("qid")
    )


def _ml_ndcg_ann(spark, sf_dir):
    return ndcg_ann(t(spark, sf_dir, "embeddings"))


_NDCG_DISC_VALUES = ", ".join(f"({r}, {d})" for r, d in _NDCG_DISC_NANO)


def _idcg_values() -> str:
    acc, rows = 0, []
    for r, d in _NDCG_DISC_NANO:
        acc += d
        rows.append(f"({r}, {acc})")
    return ", ".join(rows)


_NDCG_IDCG_VALUES = _idcg_values()

_NDCG_SQL = f"""
WITH e AS (SELECT vec_id, label,
                  list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings),
idx AS (SELECT vec_id, v, unnest(range(1, len(v)+1)) AS i FROM e),
d AS (SELECT i AS pos, min(v[i]) AS mn, max(v[i]) AS mx FROM idx GROUP BY 1),
b AS (SELECT list(mn ORDER BY pos) AS mn, list(mx ORDER BY pos) AS mx FROM d),
codes AS (SELECT vec_id, CAST(label AS BIGINT) AS lb,
  list_transform(range(1, len(v)+1), i ->
    CASE WHEN b.mx[i] > b.mn[i]
         THEN CAST(floor((v[i] - b.mn[i]) / (b.mx[i] - b.mn[i]) * 255 + 0.5)
                   AS BIGINT)
         ELSE 0 END) AS c
  FROM e CROSS JOIN b),
q AS (SELECT vec_id AS qid, c AS qc, lb AS qlb FROM codes
      WHERE vec_id % {NDCG_QUERY_MOD} = {NDCG_QUERY_REM}),
pairs AS (
  SELECT q.qid, q.qlb, c2.vec_id AS cid, c2.lb AS clb,
         CAST(list_sum(list_transform(range(1, {RP_IN_DIMS} + 1),
              i -> (q.qc[i] - c2.c[i]) * (q.qc[i] - c2.c[i]))) AS BIGINT)
             AS d2
  FROM q JOIN codes c2 ON c2.vec_id <> q.qid
),
topk AS (
  SELECT qid, qlb, clb,
         row_number() OVER (PARTITION BY qid ORDER BY d2, cid) AS rnk
  FROM pairs QUALIFY rnk <= {NDCG_K}
),
disc(rnk, disc_nano) AS (VALUES {_NDCG_DISC_VALUES}),
per_q AS (
  SELECT qid,
         CAST(sum(CASE WHEN clb = qlb THEN disc_nano ELSE 0 END) AS BIGINT)
             AS dcg_nano,
         CAST(sum(CASE WHEN clb = qlb THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hits
  FROM topk JOIN disc USING (rnk) GROUP BY qid
),
idcg(n_hits, idcg_nano) AS (VALUES {_NDCG_IDCG_VALUES})
SELECT qid, per_q.n_hits AS n_hits, dcg_nano,
       CASE WHEN idcg_nano IS NOT NULL
            THEN (1000000 * dcg_nano) // idcg_nano END AS ndcg_micro
FROM per_q LEFT JOIN idcg ON per_q.n_hits = idcg.n_hits
ORDER BY qid
"""


R6B_QUERIES["ml_ndcg_ann"] = QueryDef(
    "ml_ndcg_ann", _ml_ndcg_ann, _NDCG_SQL, ("ml",)
)


# ------------------------------------------------------ RUNS TEST


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


R6B_QUERIES["stat_runs_test"] = QueryDef(
    "stat_runs_test", _stat_runs_test, _RUNS_SQL, ("stat",)
)


# ------------------------------------------- POSITION-BASED ATTRIBUTION

ATTR_LOOKBACK_S = 7 * 86400
ATTR_BUCKET_S = 86400


def attribution_position(events):
    """U-shaped (position-based) multi-touch attribution: every
    purchase distributes 1000 milli-credits over the view/click touches
    of the preceding 7 days — 40% first touch, 40% last, 20% split
    across the middles (100% / 50-50 for 1- and 2-touch paths; integer
    division drops the sub-milli remainder deterministically). The
    standard marketing-mix complement to last-touch and Markov
    attribution.

    Scale shape: the conversion-window touch match is the bucketed
    interval equi-join; first/last election is ONE max/min(struct) per
    conversion (never a window over touches); credit assignment joins
    that 2-struct summary back and the rollup is channel-grain."""
    from .ops.relational import range_join_bucketed

    base = events.select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("unix_micros(ts) div 1000000").alias("ts_s"),
    )
    conv = base.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("cid"),
        (F.col("ts_s") - ATTR_LOOKBACK_S).alias("s0"),
        F.col("ts_s").alias("s1"),
    )
    touch = base.where(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_id").alias("tid"),
        F.col("event_type").alias("channel"),
        F.col("ts_s").alias("es"),
    )
    matched = range_join_bucketed(conv, touch, "user_id", ATTR_BUCKET_S)
    summ = matched.groupBy("cid").agg(
        F.count(F.lit(1)).alias("k"),
        F.min(F.struct("es", "tid")).alias("first_k"),
        F.max(F.struct("es", "tid")).alias("last_k"),
    )
    credited = matched.join(F.broadcast(summ), "cid").select(
        "channel",
        F.when(F.col("k") == 1, 1000)
        .when(
            (F.col("es") == F.col("first_k.es"))
            & (F.col("tid") == F.col("first_k.tid")),
            F.when(F.col("k") == 2, 500).otherwise(400),
        )
        .when(
            (F.col("es") == F.col("last_k.es"))
            & (F.col("tid") == F.col("last_k.tid")),
            F.when(F.col("k") == 2, 500).otherwise(400),
        )
        .otherwise(F.expr("200 div (k - 2)"))
        .alias("credit_milli"),
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum("credit_milli").alias("credit_milli"),
        )
        .orderBy("channel")
    )


def _events_attribution_position(spark, sf_dir):
    return attribution_position(t(spark, sf_dir, "events"))


_ATTRPOS_SQL = f"""
WITH base AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) // 1000000 AS ts_s
  FROM events
),
conv AS (
  SELECT user_id, event_id AS cid, ts_s - {ATTR_LOOKBACK_S} AS s0,
         ts_s AS s1
  FROM base WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id, event_id AS tid, event_type AS channel, ts_s AS es
  FROM base WHERE event_type IN ('view', 'click')
),
matched AS (
  SELECT c.cid, t.tid, t.channel, t.es
  FROM conv c JOIN touch t
    ON t.user_id = c.user_id AND t.es >= c.s0 AND t.es < c.s1
),
summ AS (
  SELECT cid, CAST(count(*) AS BIGINT) AS k,
         min(struct_pack(es := es, tid := tid)) AS first_k,
         max(struct_pack(es := es, tid := tid)) AS last_k
  FROM matched GROUP BY cid
),
credited AS (
  SELECT m.channel,
         CASE WHEN k = 1 THEN 1000
              WHEN m.es = first_k['es'] AND m.tid = first_k['tid']
                   THEN CASE WHEN k = 2 THEN 500 ELSE 400 END
              WHEN m.es = last_k['es'] AND m.tid = last_k['tid']
                   THEN CASE WHEN k = 2 THEN 500 ELSE 400 END
              ELSE 200 // (k - 2) END AS credit_milli
  FROM matched m JOIN summ USING (cid)
)
SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
       CAST(sum(credit_milli) AS BIGINT) AS credit_milli
FROM credited GROUP BY channel ORDER BY channel
"""


R6B_QUERIES["events_attribution_position"] = QueryDef(
    "events_attribution_position",
    _events_attribution_position,
    _ATTRPOS_SQL,
    ("events",),
)


# ------------------------------------------------------ BOT SCORING

BOT_RATE_MILLI = 2000   # > 2 events per active hour
BOT_NIGHT_MICRO = 400000  # > 40% of activity in hours 0-5
BOT_DUP_TS = 1          # any same-second double-fire


def bot_score(events):
    """Rule-based bot/abuse screen at the user grain: activity rate per
    active hour, same-second double-fires, and night-hour share each
    trip an integer rule flag; the score is their weighted sum and the
    output is the flagged-user audit — the traffic-quality gate run
    before any engagement metric is trusted.

    All features and flags are exact integers (milli rates, micro
    shares) from two user-grain aggregates; the active-hour count
    reuses the (user, hour) grain, and nothing exceeds the user
    domain."""
    base = events.select(
        "user_id",
        F.expr("unix_micros(ts) div 3600000000").alias("hidx"),
        F.expr("unix_micros(ts) div 1000000").alias("ts_s"),
        F.expr("hour(ts)").alias("hod"),
    )
    per_hour = base.groupBy("user_id", "hidx").agg(
        F.count(F.lit(1)).alias("nh")
    )
    hours = per_hour.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_active_hours"),
        F.sum("nh").alias("n_events"),
    )
    dup = (
        base.groupBy("user_id", "ts_s")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("c") > 1, F.col("c") - 1).otherwise(0)).alias(
                "n_dup_ts"
            )
        )
    )
    night = base.groupBy("user_id").agg(
        F.sum(F.when(F.col("hod") <= 5, 1).otherwise(0)).alias("n_night")
    )
    feats = (
        hours.join(dup, "user_id")
        .join(night, "user_id")
        .select(
            "user_id",
            "n_events",
            "n_active_hours",
            F.expr("(1000 * n_events) div n_active_hours").alias("rate_milli"),
            "n_dup_ts",
            F.expr("(1000000 * n_night) div n_events").alias("night_micro"),
        )
    )
    scored = feats.select(
        "*",
        (
            F.when(F.col("rate_milli") > BOT_RATE_MILLI, 2).otherwise(0)
            + F.when(F.col("n_dup_ts") >= BOT_DUP_TS, 3).otherwise(0)
            + F.when(F.col("night_micro") > BOT_NIGHT_MICRO, 1).otherwise(0)
        ).cast("long").alias("bot_score"),
    )
    return scored.where(F.col("bot_score") > 0).orderBy("user_id")


def _events_bot_score(spark, sf_dir):
    return bot_score(t(spark, sf_dir, "events"))


_BOT_SQL = f"""
WITH base AS (
  SELECT user_id,
         epoch_us(ts) // 3600000000 AS hidx,
         epoch_us(ts) // 1000000 AS ts_s,
         hour(ts) AS hod
  FROM events
),
per_hour AS (
  SELECT user_id, hidx, CAST(count(*) AS BIGINT) AS nh
  FROM base GROUP BY 1, 2
),
hours AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_active_hours,
         CAST(sum(nh) AS BIGINT) AS n_events
  FROM per_hour GROUP BY 1
),
dup AS (
  SELECT user_id,
         CAST(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT)
             AS n_dup_ts
  FROM (SELECT user_id, ts_s, CAST(count(*) AS BIGINT) AS c
        FROM base GROUP BY 1, 2)
  GROUP BY 1
),
night AS (
  SELECT user_id,
         CAST(sum(CASE WHEN hod <= 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_night
  FROM base GROUP BY 1
),
feats AS (
  SELECT hours.user_id, n_events, n_active_hours,
         (1000 * n_events) // n_active_hours AS rate_milli,
         n_dup_ts,
         (1000000 * n_night) // n_events AS night_micro
  FROM hours JOIN dup ON hours.user_id = dup.user_id
             JOIN night ON hours.user_id = night.user_id
)
SELECT *,
       CAST(CASE WHEN rate_milli > {BOT_RATE_MILLI} THEN 2 ELSE 0 END
            + CASE WHEN n_dup_ts >= {BOT_DUP_TS} THEN 3 ELSE 0 END
            + CASE WHEN night_micro > {BOT_NIGHT_MICRO} THEN 1 ELSE 0 END
            AS BIGINT) AS bot_score
FROM feats
WHERE CASE WHEN rate_milli > {BOT_RATE_MILLI} THEN 2 ELSE 0 END
      + CASE WHEN n_dup_ts >= {BOT_DUP_TS} THEN 3 ELSE 0 END
      + CASE WHEN night_micro > {BOT_NIGHT_MICRO} THEN 1 ELSE 0 END > 0
ORDER BY user_id
"""


R6B_QUERIES["events_bot_score"] = QueryDef(
    "events_bot_score", _events_bot_score, _BOT_SQL, ("events",)
)


# -------------------------------------------- PARTITION LAYOUT ADVISOR


def partition_advisor(events):
    """Partition-layout advisor: evaluate the candidate partition keys
    a warehouse actually argues about (day, event_type, user-hash
    bucket, day x type) on partition count, max-partition skew, and
    mean rows per partition — the physical-layout decision as a query.

    Each candidate is one partial-aggregated groupBy at its key grain
    collapsed to a 1-row verdict; four candidates union into the
    4-row report. Skew and means are integer micro/floor divisions."""

    def verdict(label, keyed):
        per = keyed.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
        return per.agg(
            F.lit(label).alias("candidate"),
            F.count(F.lit(1)).alias("n_partitions"),
            F.max("n").alias("max_rows"),
            F.sum("n").alias("n_rows"),
        ).select(
            "candidate",
            "n_partitions",
            "max_rows",
            F.expr("n_rows div n_partitions").alias("mean_rows"),
            F.expr("(1000000 * max_rows) div n_rows").alias("skew_micro"),
        )

    day = events.select(F.expr("CAST(ts AS DATE)").cast("string").alias("k"))
    typ = events.select(F.col("event_type").alias("k"))
    ub = events.select((F.col("user_id") % 64).cast("string").alias("k"))
    daytyp = events.select(
        F.concat(
            F.expr("CAST(ts AS DATE)").cast("string"),
            F.lit("|"),
            F.col("event_type"),
        ).alias("k")
    )
    out = (
        verdict("day", day)
        .unionAll(verdict("day_x_type", daytyp))
        .unionAll(verdict("event_type", typ))
        .unionAll(verdict("user_bucket_64", ub))
    )
    return out.orderBy("candidate")


def _layout_partition_advisor(spark, sf_dir):
    return partition_advisor(t(spark, sf_dir, "events"))


def _advisor_one_sql(label, kexpr):
    return f"""
SELECT '{label}' AS candidate,
       CAST(count(*) AS BIGINT) AS n_partitions,
       CAST(max(n) AS BIGINT) AS max_rows,
       CAST(sum(n) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_rows,
       (1000000 * CAST(max(n) AS BIGINT)) // CAST(sum(n) AS BIGINT)
           AS skew_micro
FROM (SELECT {kexpr} AS k, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1)
"""


_ADVISOR_SQL = (
    "SELECT * FROM ("
    + " UNION ALL ".join(
        "(" + _advisor_one_sql(lbl, kx) + ")"
        for lbl, kx in (
            ("day", "CAST(CAST(ts AS DATE) AS VARCHAR)"),
            (
                "day_x_type",
                "CAST(CAST(ts AS DATE) AS VARCHAR) || '|' || event_type",
            ),
            ("event_type", "event_type"),
            ("user_bucket_64", "CAST(user_id % 64 AS VARCHAR)"),
        )
    )
    + ") ORDER BY candidate"
)


# ------------------------------------------------- MDE POWER ANALYSIS

# z_{0.975} and z_{0.80} as micro literals — no quantile function runs.
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


# --------------------------------------------------------- SRM GUARD

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


for _q in (
    QueryDef(
        "layout_partition_advisor",
        _layout_partition_advisor,
        _ADVISOR_SQL,
        ("warehouse",),
    ),
    QueryDef("stat_mde_power", _stat_mde_power, _MDE_SQL, ("stat",)),
    QueryDef("stat_srm_check", _stat_srm_check, _SRM_SQL, ("stat",)),
):
    R6B_QUERIES[_q.name] = _q


# ---------------------------------------------- WINSORIZED/TRIMMED MEAN

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


# ------------------------------------------------- TOKEN BURSTINESS


BURST_TOPK_DF = 100  # analyze tokens present in >= this many docs


def burstiness_vmr(docs, min_df: int = BURST_TOPK_DF):
    """Token burstiness (Church & Gale 1995): the variance-to-mean
    ratio (Fano factor) of per-document counts for every common token —
    VMR ~ 1 is Poisson background vocabulary, VMR >> 1 is bursty
    content-bearing vocabulary; the signal keyword extractors and
    spam/template detectors key on.

    Exactness: per-(token, doc) counts and the corpus doc count are
    int64; zero-docs enter the moments in closed form (only presence
    rows materialize), and VMR is one micro-quantized double over the
    exact sums. Shuffles: (doc, token) counts then the token rollup —
    both bounded by the presence list, never docs x vocab."""
    n_docs = docs.agg(F.count(F.lit(1)).alias("nd"))
    dt = (
        docs.select("doc_id", F.explode(_tok(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_tok = dt.groupBy("tok").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    return (
        per_tok.where(F.col("df") >= min_df)
        .join(F.broadcast(n_docs))
        .select(
            "tok",
            "df",
            "s",
            # mean over ALL docs (absent docs contribute 0)
            F.floor(
                (
                    (
                        F.col("ss").cast("double")
                        - F.col("s").cast("double")
                        * F.col("s").cast("double")
                        / F.col("nd").cast("double")
                    )
                    / (F.col("nd") - 1).cast("double")
                )
                / (F.col("s").cast("double") / F.col("nd").cast("double"))
                * 1000000
                + F.lit(0.5)
            ).alias("vmr_micro"),
        )
        .orderBy("tok")
    )


def _text_burstiness_vmr(spark, sf_dir):
    return burstiness_vmr(t(spark, sf_dir, "documents"))


_BURST_SQL = f"""
WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
dt AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS tok
        FROM documents)
  GROUP BY 1, 2
),
per_tok AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS df, CAST(sum(c) AS BIGINT) AS s,
         CAST(sum(c * c) AS BIGINT) AS ss
  FROM dt GROUP BY 1
)
SELECT tok, df, s,
       CAST(floor(((CAST(ss AS DOUBLE)
                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                      / CAST(nd AS DOUBLE)) / CAST(nd - 1 AS DOUBLE))
                  / (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))
                  * 1000000 + 0.5) AS BIGINT) AS vmr_micro
FROM per_tok, nd
WHERE df >= {BURST_TOPK_DF}
ORDER BY tok
"""


# -------------------------------------------------- POWER-LAW ALPHA


def powerlaw_alpha(edges):
    """Discrete power-law exponent MLE for the degree distribution
    (Clauset, Shalizi & Newman 2009 eq. 3.7 continuous approximation):
    alpha = 1 + n / sum ln(d / (dmin - 1/2)) over nodes with degree >=
    dmin — the one-number tail-heaviness fingerprint that says whether
    a co-occurrence graph has hubs worth special-casing.

    Exactness: degrees are int64; each node's ln term is
    micro-nat-quantized at the DEGREE-VALUE grain (one term per
    distinct degree, weighted by its node count) before the sum. One
    degree aggregate, one degree-histogram aggregate, 1-row math."""
    dmin = 2
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    hist = (
        deg.where(F.col("d") >= dmin)
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    terms = hist.select(
        "m",
        (
            F.col("m")
            * F.floor(
                F.log(
                    F.col("d").cast("double") / (dmin - 0.5)
                )
                * 1000000
                + F.lit(0.5)
            ).cast("long")
        ).alias("lt_micro"),
    )
    agg = terms.agg(
        F.sum("m").alias("n_tail"), F.sum("lt_micro").alias("slog")
    )
    return agg.select(
        "n_tail",
        "slog",
        F.floor(
            (
                1.0
                + F.col("n_tail").cast("double")
                / (F.col("slog").cast("double") / 1.0e6)
            )
            * 1000000
            + F.lit(0.5)
        ).alias("alpha_micro"),
    )


def _graph_powerlaw_alpha(spark, sf_dir):
    from .ops import graph as G

    li = t(spark, sf_dir, "lineitem")
    edges = G.cooccurrence_edges(li, "l_orderkey", "l_partkey", min_groups=2)
    return powerlaw_alpha(edges)


_PLAW_SQL = f"""
WITH edges AS ({_BFS_EDGES_CTE}),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY 1),
hist AS (
  SELECT d, CAST(count(*) AS BIGINT) AS m FROM deg WHERE d >= 2 GROUP BY 1
),
terms AS (
  SELECT m,
         m * CAST(floor(ln(CAST(d AS DOUBLE) / 1.5) * 1000000 + 0.5)
                  AS BIGINT) AS lt_micro
  FROM hist
),
agg AS (
  SELECT CAST(sum(m) AS BIGINT) AS n_tail,
         CAST(sum(lt_micro) AS BIGINT) AS slog
  FROM terms
)
SELECT n_tail, slog,
       CAST(floor((1.0 + CAST(n_tail AS DOUBLE)
                   / (CAST(slog AS DOUBLE) / 1.0e6)) * 1000000 + 0.5)
            AS BIGINT) AS alpha_micro
FROM agg
"""


for _q in (
    QueryDef(
        "agg_winsorized_mean", _agg_winsorized_mean, _WINSOR_SQL, ("agg",)
    ),
    QueryDef(
        "text_burstiness_vmr", _text_burstiness_vmr, _BURST_SQL, ("text",)
    ),
    QueryDef(
        "graph_powerlaw_alpha", _graph_powerlaw_alpha, _PLAW_SQL, ("graph",)
    ),
):
    R6B_QUERIES[_q.name] = _q


# ---------------------------------------------------- TAR SHARD INDEX


def _multimodal_tar_index(spark, sf_dir):
    """WebDataset shard index: byte offsets of every member inside the
    real ustar archives of multimodal_tar_shards — what a training
    loader actually seeks with. The DuckDB oracle re-derives every
    offset from the 512-block framing arithmetic (header block +
    size-padded payload blocks, cumulative over preceding members), so
    the hash match proves the parser's offset bookkeeping byte-for-byte
    against bytes it never saw. Same zero-shuffle two-stage
    mapInPandas shape as the feature key."""
    from .ext import tar as T

    docs = t(spark, sf_dir, "documents")
    return T.tar_index(T.synthesize_tar(docs))


_TAR_INDEX_SQL = """
WITH mems AS (
  SELECT doc_id, CAST(u.m AS INTEGER) AS m,
         CAST(10 + (doc_id + 13 * u.m) % 100 AS BIGINT) AS size
  FROM documents, unnest(range(0, 3)) AS u(m)
  WHERE u.m < doc_id % 3 + 1
),
offs AS (
  SELECT a.doc_id, a.m, a.size,
         CAST(COALESCE(sum(512 + 512 * ((b.size + 511) // 512)), 0)
              AS BIGINT) AS header_offset
  FROM mems a LEFT JOIN mems b ON b.doc_id = a.doc_id AND b.m < a.m
  GROUP BY a.doc_id, a.m, a.size
)
SELECT doc_id AS media_id, m AS member_idx,
       CAST(doc_id AS VARCHAR) || '/' || CAST(m AS VARCHAR) || '.bin' AS name,
       header_offset,
       header_offset + 512 AS payload_offset,
       size
FROM offs
"""


R6B_QUERIES["multimodal_tar_index"] = QueryDef(
    "multimodal_tar_index", _multimodal_tar_index, _TAR_INDEX_SQL,
    ("multimodal",),
)


# ------------------------------------------------ PIT FEATURE ASSEMBLY

PIT_TRAIL_S = 30 * 86400
PIT_BUCKET_S = 7 * 86400


def pit_feature_join(events, orders):
    """Point-in-time-correct feature assembly (the feature-store
    training-set join): for every event of a known customer, attach (a)
    the customer's LAST order total as of the event time — a backward
    as-of join, no leakage from the future — and (b) the trailing
    30-day order count — a bucketed range join. Rolled up to the
    customer grain for the audit.

    Scale shape: the as-of feature is the repo's single-shuffle
    union-merge as-of (zero candidate pairs); the trailing count is the
    bucketed interval equi-join; both verified operators composed, plus
    one key-grain rollup."""
    from .ops.relational import asof_join, range_join_bucketed

    spine = events.select(
        F.col("user_id").alias("custkey"),
        F.col("event_id").alias("eid"),
        F.expr("unix_micros(ts) div 1000000").alias("ets"),
    )
    feat = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("oid"),
        F.expr("unix_micros(o_orderdate) div 1000000").alias("ots"),
        cents(F.col("o_totalprice")).alias("last_total_cents"),
    )
    pit = asof_join(
        spine, feat, key="custkey", left_ts="ets", right_ts="ots",
        left_id="eid", right_id="oid",
    )
    iv = spine.select(
        "custkey",
        "eid",
        (F.col("ets") - PIT_TRAIL_S).alias("s0"),
        F.col("ets").alias("s1"),
    )
    pts = feat.select("custkey", F.col("ots").alias("es"))
    trail = (
        range_join_bucketed(iv, pts, "custkey", PIT_BUCKET_S)
        .groupBy("eid")
        .agg(F.count(F.lit(1)).alias("n_trail"))
    )
    assembled = pit.join(trail, "eid", "left").select(
        "custkey",
        "eid",
        "last_total_cents",
        F.coalesce("n_trail", F.lit(0)).alias("n_trailing_30d"),
    )
    return (
        assembled.groupBy("custkey")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.col("last_total_cents")).alias("n_with_feature"),
            F.sum("last_total_cents").alias("sum_feature_cents"),
            F.sum("n_trailing_30d").alias("sum_trailing_orders"),
        )
        .orderBy("custkey")
    )


def _feature_pit_join(spark, sf_dir):
    return pit_feature_join(
        t(spark, sf_dir, "events"), t(spark, sf_dir, "orders")
    )


_PIT_SQL = f"""
WITH spine AS (
  SELECT user_id AS custkey, event_id AS eid,
         epoch_us(ts) // 1000000 AS ets
  FROM events
),
feat AS (
  SELECT o_custkey AS custkey, o_orderkey AS oid,
         epoch_us(o_orderdate) // 1000000 AS ots,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents
  FROM orders
),
pit AS (
  SELECT s.custkey, s.eid,
         (SELECT f.total_cents FROM feat f
          WHERE f.custkey = s.custkey AND f.ots <= s.ets
          ORDER BY f.ots DESC, f.oid DESC LIMIT 1) AS last_total_cents
  FROM spine s
),
trail AS (
  SELECT s.eid, CAST(count(*) AS BIGINT) AS n_trail
  FROM spine s JOIN feat f
    ON f.custkey = s.custkey
   AND f.ots >= s.ets - {PIT_TRAIL_S} AND f.ots < s.ets
  GROUP BY s.eid
)
SELECT pit.custkey, CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(last_total_cents) AS BIGINT) AS n_with_feature,
       CAST(sum(last_total_cents) AS BIGINT) AS sum_feature_cents,
       CAST(sum(COALESCE(n_trail, 0)) AS BIGINT) AS sum_trailing_orders
FROM pit LEFT JOIN trail ON pit.eid = trail.eid
GROUP BY pit.custkey ORDER BY pit.custkey
"""


R6B_QUERIES["feature_pit_join"] = QueryDef(
    "feature_pit_join", _feature_pit_join, _PIT_SQL, ("feature",)
)


# ---------------------------------------------- PACF (DURBIN-LEVINSON)

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


R6B_QUERIES["ts_pacf_levinson"] = QueryDef(
    "ts_pacf_levinson", _ts_pacf_levinson, _pacf_sql(), ("ts",)
)


# ------------------------------------------------------ LOG-RANK TEST


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


R6B_QUERIES["stat_logrank_test"] = QueryDef(
    "stat_logrank_test", _stat_logrank_test, _LOGRANK_SQL, ("stat",)
)

"""Round-6 continuation (r6b): event-analytics, graph, data-quality, warehouse and feature-assembly keys (events_*, graph_*, dq_*, warehouse/layout, feature_pit_join).

Mechanically split out of the former single-file registry_r6b.py
(verdict r6 item 5) with ZERO plan movement — every key, callable, SQL
oracle and tag is byte-identical; PLANHASH.json pins prove it. See the
original module docstring (now in registry_r6b.py) for the exactness
discipline and reference-parity notes shared by all r6b families.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry_util import QueryDef, cents, shared_cooccurrence_edges, t

R6B_QUERIES: dict[str, QueryDef] = {}


def _h32(col):
    """Engine-portable 32-bit hash (md5 prefix as int64) — same literal
    definition as registry_r5/r5b/r6, re-declared per family file so
    each file's SQL oracles pair with the Spark expression beside
    them."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _tok(col):
    return F.filter(F.split(col, " "), lambda x: x != "")


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

    edges = shared_cooccurrence_edges(spark, sf_dir)
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

    edges = shared_cooccurrence_edges(spark, sf_dir)
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

    edges = shared_cooccurrence_edges(spark, sf_dir)
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
    # the distinct-gap grain is BOUNDED by the CEP window (gap_s <=
    # SEQ_WINDOW_S) and fans out to the prefix ladder + both totals;
    # truncate so the two range joins + anti-join (the whole CEP
    # matcher) execute once, not once per consumer (r12; the plan
    # showed 40 events scans)
    from .ops.scale import truncate_lineage

    gaps = truncate_lineage(gaps)
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

    edges = shared_cooccurrence_edges(spark, sf_dir)
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


for _q in (
    QueryDef(
        "dq_referential_integrity",
        _dq_referential_integrity,
        _RI_SQL,
        ("dq",),
    ),
    QueryDef("dq_uniqueness_audit", _dq_uniqueness_audit, _UNIQ_SQL, ("dq",)),
    QueryDef("dq_benford_digits", _dq_benford_digits, _BENFORD_SQL, ("dq",)),
    QueryDef(
    "graph_bfs_hops", _graph_bfs_hops, _bfs_sql(), ("graph",)
),
    QueryDef("dq_profile_drift", _dq_profile_drift, _DRIFT_SQL, ("dq",)),
    QueryDef(
    "events_seq_pattern", _events_seq_pattern, _SEQ_SQL, ("events",)
),
    QueryDef(
    "warehouse_cdc_apply", _warehouse_cdc_apply, _CDC_SQL, ("warehouse",)
),
    QueryDef(
        "events_cuped_adjust", _events_cuped_adjust, _CUPED_SQL, ("events",)
    ),
    QueryDef(
    "graph_assortativity", _graph_assortativity, _ASSORT_SQL, ("graph",)
),
    QueryDef(
    "graph_modularity", _graph_modularity, _modularity_sql(), ("graph",)
),
    QueryDef(
    "events_conversion_lag", _events_conversion_lag, _CONVLAG_SQL, ("events",)
),
    QueryDef(
    "events_attribution_position",
    _events_attribution_position,
    _ATTRPOS_SQL,
    ("events",),
),
    QueryDef(
    "events_bot_score", _events_bot_score, _BOT_SQL, ("events",)
),
    QueryDef(
        "layout_partition_advisor",
        _layout_partition_advisor,
        _ADVISOR_SQL,
        ("warehouse",),
    ),
    QueryDef(
        "graph_powerlaw_alpha", _graph_powerlaw_alpha, _PLAW_SQL, ("graph",)
    ),
    QueryDef(
    "feature_pit_join", _feature_pit_join, _PIT_SQL, ("feature",)
),
):
    R6B_QUERIES[_q.name] = _q

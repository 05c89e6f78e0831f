"""Round-6 families, waves 2-4: RANGE-frame windows, epoch
scheduling, permutation testing, the GIF codec key, neighborhood
Jaccard, ER blocking recall, histogramming, DiD/regression/ANOVA/
Welch/Theil-Sen estimators, class-balanced sampling, Kaplan-Meier,
and the freshness audit.

Mechanically split out of the former single-file registry_r6.py
(round 7, same procedure as the registry_r6b split — verdict r6 item
5) with ZERO plan movement: every key, callable, SQL oracle and tag is
byte-identical and the PLANHASH pins prove it. Wave-1 families (stat
two-sample machinery, feature engineering, text quality) live in
registry_r6_statfeat.py; the exactness discipline and reference-parity
notes in that module's docstring apply here unchanged.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .ops.scale import truncate_lineage
from .registry_util import QueryDef, cents, shared_cooccurrence_edges, t

# Shared wave-1 machinery: the A/B event-type arms and the
# engine-portable md5 hash/tokenizer helpers are defined once beside
# the two-sample statistics that introduced them.
from .registry_r6_statfeat import KS_A, KS_B, _h32, _tok

R6_QUERIES: dict[str, QueryDef] = {}

# =====================================================================
# Round-6 wave 2: RANGE-frame windows, data-constrained epoch
# scheduling, hash-randomization permutation test.
# =====================================================================

RANGE_FRAME_S = 3600  # trailing window width (seconds)
RANGE_MOD = 17  # output subset (window computed on ALL rows first)
EPOCH_MAX = 4  # per-source epoch cap (data-constrained scaling)
EPOCH_BUDGET_X2 = 3  # token budget = total_tokens * 3 / 2
N_PERM = 128  # hash permutations


def range_frame_trailing(events, width_s: int = RANGE_FRAME_S, mod: int = RANGE_MOD):
    """Per-user trailing-hour aggregate via a true RANGE window frame
    (``RANGE BETWEEN width PRECEDING AND CURRENT ROW`` over integer
    event-seconds) — the value-based frame SQL surface the window
    family hadn't covered (rank/row/value function keys use ROWS
    frames).  Tie semantics are the RANGE peer rule: same-second
    events of one user see each other's values, identically in both
    engines because the ordering key is an exact int64.

    Scale shape: the window partitions by user (natural parallelism —
    no user's history outgrows a partition at any corpus scale since
    per-user event counts are product-bounded); the output subset
    filter applies AFTER the frame so every row's trailing sum is
    over the full history."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-width_s, 0)
    )
    base = events.select(
        "event_id",
        "user_id",
        F.expr("unix_micros(ts) div 1000000").alias("sec"),
        cents(F.col("value")).alias("c"),
    )
    framed = base.select(
        "event_id",
        "user_id",
        F.sum("c").over(w).alias("sum_1h_c"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )
    return framed.where(F.pmod(F.col("event_id"), F.lit(mod)) == 0).orderBy(
        "event_id"
    )


def _window_range_frame(spark, sf_dir):
    return range_frame_trailing(t(spark, sf_dir, "events"))


_RANGE_FRAME_SQL = f"""
WITH base AS (
  SELECT event_id, user_id, epoch_us(ts) // 1000000 AS sec,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
),
framed AS (
  SELECT event_id, user_id,
         CAST(sum(c) OVER (PARTITION BY user_id ORDER BY sec
              RANGE BETWEEN {RANGE_FRAME_S} PRECEDING AND CURRENT ROW)
              AS BIGINT) AS sum_1h_c,
         CAST(count(*) OVER (PARTITION BY user_id ORDER BY sec
              RANGE BETWEEN {RANGE_FRAME_S} PRECEDING AND CURRENT ROW)
              AS BIGINT) AS n_1h
  FROM base
)
SELECT * FROM framed WHERE event_id % {RANGE_MOD} = 0 ORDER BY event_id
"""


def epoch_schedule(docs, max_epochs: int = EPOCH_MAX):
    """Data-constrained epoch schedule (Muennighoff et al. 2023): given
    a token budget of 1.5× the corpus and a per-source repeat cap,
    up-sample small sources toward an equal per-source share — the
    planning table a mixture trainer materializes before packing.
    epochs_s = clamp(target_share div tokens_s, 1, cap); everything is
    integer division of corpus aggregates.

    Scale shape: one token-count scan with map-side combine to the
    source grain; the budget scalar rides in as the usual broadcast
    1-row aggregate; all arithmetic runs on the metadata-sized source
    table."""
    tok = docs.select(
        "source", F.size(_tok(F.col("text"))).alias("n_tok")
    )
    per_src = tok.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("tokens")
    )
    tot = per_src.agg(
        F.sum("tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    j = per_src.join(F.broadcast(tot))
    budget = F.expr(f"total_tokens * {EPOCH_BUDGET_X2} div 2")
    target = F.expr(
        f"(total_tokens * {EPOCH_BUDGET_X2} div 2) div n_sources"
    )
    epochs = F.least(
        F.lit(max_epochs).cast("long"),
        F.greatest(F.lit(1).cast("long"), F.expr(
            f"((total_tokens * {EPOCH_BUDGET_X2} div 2) div n_sources)"
            " div tokens"
        )),
    )
    return j.select(
        "source",
        "n_docs",
        "tokens",
        budget.alias("budget"),
        target.alias("target_share"),
        epochs.alias("epochs"),
        (epochs * F.col("tokens")).alias("allocated_tokens"),
    ).orderBy("source")


def _corpus_epoch_schedule(spark, sf_dir):
    return epoch_schedule(t(spark, sf_dir, "documents"))


_EPOCH_SQL = f"""
WITH tok AS (
  SELECT source,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok
  FROM documents
),
per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS tokens
  FROM tok GROUP BY source
),
tot AS (
  SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens,
         CAST(count(*) AS BIGINT) AS n_sources
  FROM per_src
)
SELECT source, n_docs, tokens,
       total_tokens * {EPOCH_BUDGET_X2} // 2 AS budget,
       (total_tokens * {EPOCH_BUDGET_X2} // 2) // n_sources AS target_share,
       least({EPOCH_MAX}, greatest(1,
         ((total_tokens * {EPOCH_BUDGET_X2} // 2) // n_sources) // tokens))
         AS epochs,
       least({EPOCH_MAX}, greatest(1,
         ((total_tokens * {EPOCH_BUDGET_X2} // 2) // n_sources) // tokens))
         * tokens AS allocated_tokens
FROM per_src, tot ORDER BY source
"""


def permutation_test(events, n_perm: int = N_PERM):
    """Hash-randomization test for the A/B mean difference (the
    permutation-test variant where each row's arm flips by an md5 bit
    per replicate — exchangeable under the null, and REPRODUCIBLE,
    the same argument as the Poisson bootstrap).  The test statistic
    |mean_A − mean_B| is micro-quantized from exact integer sums per
    replicate; the p-value is the add-one rank of the observed
    statistic among the replicates — pure integer comparison.

    Scale shape: the n_perm× explode collapses to 2·n_perm aggregate
    rows via map-side combine; the observed statistic rides in as a
    broadcast 1-row aggregate."""
    base = events.where(F.col("event_type").isin(KS_A, KS_B)).select(
        F.col("event_id").cast("string").alias("k"),
        (F.col("event_type") == KS_A).cast("int").alias("is_a"),
        cents(F.col("value")).alias("c"),
    )

    def t_micro(sa, na, sb, nb):
        # a replicate that flips every row into one arm has no mean
        # difference to measure — NULL, excluded (cannot occur beyond
        # toy inputs: P = 2^-rows per replicate)
        return F.when(
            (na > 0) & (nb > 0),
            F.floor(
                F.abs(
                    sa.cast("double") / na.cast("double")
                    - sb.cast("double") / nb.cast("double")
                )
                * 10000
                + F.lit(0.5)
            ).cast("long"),
        )

    obs = base.agg(
        t_micro(
            F.sum(F.when(F.col("is_a") == 1, F.col("c")).otherwise(0)),
            F.sum("is_a"),
            F.sum(F.when(F.col("is_a") == 0, F.col("c")).otherwise(0)),
            F.sum(1 - F.col("is_a")),
        ).alias("t_obs")
    )
    # one md5 per ROW serves all replicates: the 128-bit digest is four
    # 32-bit segments, and replicate p's flip is bit (p mod 32) of
    # segment (p div 32). The segments are hoisted into a projection
    # BELOW the explode (r8): expressed inside the exploded select, the
    # md5 re-evaluated once per (row, replicate) — 128x per row, this
    # key's entire hot path; computed per INPUT row and carried through
    # Generate as a 4-long array, the exploded loop is pure int64
    # codegen. Bit stream identical, so the oracle is unchanged.
    assert n_perm <= 128
    digest = F.md5(F.concat(F.lit("perm:"), F.col("k")))
    segs = F.array(
        *[
            F.conv(F.substring(digest, 1 + i * 8, 8), 16, 10).cast("long")
            for i in range(4)
        ]
    )
    flip = F.expr("(segs[p div 32] >> (p % 32)) & 1") == 1
    reps = (
        base.select("is_a", "c", segs.alias("segs"))
        .select(
            "is_a", "c", "segs",
            F.explode(F.sequence(F.lit(0), F.lit(n_perm - 1))).alias("p"),
        )
        .select(
            "p",
            "c",
            F.when(flip, 1 - F.col("is_a")).otherwise(F.col("is_a")).alias("arm"),
        )
        .groupBy("p")
        .agg(
            t_micro(
                F.sum(F.when(F.col("arm") == 1, F.col("c")).otherwise(0)),
                F.sum("arm"),
                F.sum(F.when(F.col("arm") == 0, F.col("c")).otherwise(0)),
                F.sum(1 - F.col("arm")),
            ).alias("t_p")
        )
    )
    reps = reps.where(F.col("t_p").isNotNull())
    summary = reps.join(F.broadcast(obs)).agg(
        F.count(F.lit(1)).alias("n_perm"),
        F.max("t_obs").alias("t_obs_micro"),
        F.sum((F.col("t_p") >= F.col("t_obs")).cast("long")).alias("n_ge"),
    )
    return summary.select(
        "n_perm",
        "t_obs_micro",
        "n_ge",
        (
            F.floor(
                (F.col("n_ge") + 1).cast("double")
                / (F.col("n_perm") + 1).cast("double")
                * 1000000000
                + F.lit(0.5)
            ).cast("long")
        ).alias("p9"),
    )


def _stat_permutation_test(spark, sf_dir):
    return permutation_test(t(spark, sf_dir, "events"))


def _perm_flip_sql() -> str:
    return (
        "((('0x' || substr(md5('perm:' || base.k),"
        " 1 + (p.p // 32) * 8, 8))::BIGINT >> (p.p % 32)) & 1) = 1"
    )


_PERM_SQL = f"""
WITH base AS (
  SELECT CAST(event_id AS VARCHAR) AS k,
         CASE WHEN event_type = '{KS_A}' THEN 1 ELSE 0 END AS is_a,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events WHERE event_type IN ('{KS_A}', '{KS_B}')
),
obs AS (
  SELECT CAST(floor(abs(
           CAST(sum(CASE WHEN is_a = 1 THEN c ELSE 0 END) AS DOUBLE)
             / CAST(sum(is_a) AS DOUBLE)
           - CAST(sum(CASE WHEN is_a = 0 THEN c ELSE 0 END) AS DOUBLE)
             / CAST(sum(1 - is_a) AS DOUBLE)
         ) * 10000 + 0.5) AS BIGINT) AS t_obs
  FROM base
),
reps AS (
  SELECT p.p,
         CAST(floor(abs(
           CAST(sum(CASE WHEN (CASE WHEN {_perm_flip_sql()} THEN 1 - is_a ELSE is_a END) = 1 THEN c ELSE 0 END) AS DOUBLE)
             / CAST(sum(CASE WHEN {_perm_flip_sql()} THEN 1 - is_a ELSE is_a END) AS DOUBLE)
           - CAST(sum(CASE WHEN (CASE WHEN {_perm_flip_sql()} THEN 1 - is_a ELSE is_a END) = 0 THEN c ELSE 0 END) AS DOUBLE)
             / CAST(sum(1 - (CASE WHEN {_perm_flip_sql()} THEN 1 - is_a ELSE is_a END)) AS DOUBLE)
         ) * 10000 + 0.5) AS BIGINT) AS t_p
  FROM base, (SELECT unnest(range(0, {N_PERM})) AS p) p
  GROUP BY p.p
  HAVING sum(CASE WHEN {_perm_flip_sql()} THEN 1 - is_a ELSE is_a END) > 0
     AND sum(CASE WHEN {_perm_flip_sql()} THEN 1 - is_a ELSE is_a END) < count(*)
)
SELECT CAST(count(*) AS BIGINT) AS n_perm,
       max(t_obs) AS t_obs_micro,
       CAST(sum(CASE WHEN t_p >= t_obs THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
       CAST(floor(CAST(sum(CASE WHEN t_p >= t_obs THEN 1 ELSE 0 END) + 1 AS DOUBLE)
                  / CAST(count(*) + 1 AS DOUBLE) * 1000000000 + 0.5) AS BIGINT) AS p9
FROM reps, obs
GROUP BY t_obs
"""


for _q in (
    QueryDef(
        "window_range_frame", _window_range_frame, _RANGE_FRAME_SQL, ("window",)
    ),
    QueryDef(
        "corpus_epoch_schedule", _corpus_epoch_schedule, _EPOCH_SQL, ("corpus",)
    ),
    QueryDef(
        "stat_permutation_test", _stat_permutation_test, _PERM_SQL, ("stat",)
    ),
):
    R6_QUERIES[_q.name] = _q


def _multimodal_gif_roundtrip(spark, sf_dir):
    """Real palette-image decode: every document becomes a genuine
    LZW-compressed GIF89a via the pure-stdlib codec in ``ext/gif.py``
    (variable-width codes, clear/EOI, sub-block framing), then decodes
    back to exact palette-index statistics. GIF's LZW is lossless, so
    the DuckDB oracle replays the per-pixel LCG relationally and the
    hash match proves the encode→sub-block→LZW→decode loop is
    index-exact everywhere. Decoder breadth (extensions, local color
    tables, KwKwK, mid-stream clears, corruption fuzz) is
    pytest-covered. Scale shape: two chained Arrow-batched
    ``mapInPandas``, zero data shuffle (the one exchange moves (id,
    len) control rows at an explicit partition count — SCALING.md §14)."""
    from .ext import gif as G

    docs = t(spark, sf_dir, "documents")
    return G.gif_features(G.synthesize_gif(docs))


_GIF_SQL = """
WITH RECURSIVE pw(k, ak, sk) AS (
  SELECT 1, CAST(6364136223846793005 AS BIGINT), CAST(1 AS BIGINT)
  UNION ALL
  SELECT k + 1,
         CAST((CAST(6364136223846793005 AS HUGEINT) * ak)
              % 9223372036854775808 AS BIGINT),
         CAST((CAST(6364136223846793005 AS HUGEINT) * sk + 1)
              % 9223372036854775808 AS BIGINT)
  FROM pw WHERE k < 30
),
docs0 AS (
  SELECT doc_id,
         CAST(doc_id % 5 + 2 AS BIGINT) AS w,
         CAST((doc_id // 5) % 4 + 2 AS BIGINT) AS h,
         CASE WHEN doc_id % 8 = 0 THEN doc_id + n_chars
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
               % 9223372036854775808 AS BIGINT) // 8589934592) % 8 AS v
  FROM seeds d JOIN pw p ON p.k <= d.npx)
SELECT doc_id AS media_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(npx AS BIGINT) AS n_px,
       CAST(8 AS INTEGER) AS n_colors,
       CAST(sum(v) AS BIGINT) AS idx_sum,
       CAST(min(v) AS INTEGER) AS idx_min,
       CAST(max(v) AS INTEGER) AS idx_max
FROM px GROUP BY doc_id, w, h, npx
"""


R6_QUERIES["multimodal_gif_roundtrip"] = QueryDef(
    "multimodal_gif_roundtrip",
    _multimodal_gif_roundtrip,
    _GIF_SQL,
    ("multimodal",),
)


# =====================================================================
# Round-6 wave 3: node-similarity Jaccard and an entity-resolution
# blocking-strategy recall audit.
# =====================================================================

NJ_TOPK = 20
NJ_HUB_CAP = 120


def neighborhood_jaccard(edges, topk: int = NJ_TOPK, hub_cap: int = NJ_HUB_CAP):
    """Top-k node pairs by neighborhood Jaccard |N(a)∩N(b)| / |N(a)∪N(b)|
    — the node-similarity primitive behind role discovery and
    merge-candidate ranking (link_predict's sibling: existing edges
    stay IN, because similarity is not completion).  The intersection
    counts paths through wedge centers of degree ≤ hub_cap (the same
    bounded-fan-out trade graph_link_predict documents); the oracle
    mirrors the cap, so the approximation is pinned, not silent.

    Exactness: jacc_micro = 1e6·common div (deg_a + deg_b − common) is
    pure int64.  Scale shape: wedge equi-join through capped centers,
    degree table broadcast back, top-k via TakeOrderedAndProject."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    centers = deg.filter(F.col("deg") <= hub_cap).select("src")
    ce = edges.join(centers, "src")
    e1 = ce.select(F.col("src").alias("mid"), F.col("dst").alias("a"))
    e2 = ce.select(F.col("src").alias("mid"), F.col("dst").alias("b"))
    pairs = (
        e1.join(e2, "mid")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    da = deg.select(F.col("src").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("src").alias("b"), F.col("deg").alias("deg_b"))
    scored = (
        pairs.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "common",
            "deg_a",
            "deg_b",
            F.expr("1000000 * common div (deg_a + deg_b - common)").alias(
                "jacc_micro"
            ),
        )
    )
    top = scored.orderBy(
        F.desc("jacc_micro"), F.asc("a"), F.asc("b")
    ).limit(topk)
    t2 = top.select(
        F.col("jacc_micro").alias("j2"), F.col("a").alias("a2"), F.col("b").alias("b2")
    )
    return (
        top.join(
            F.broadcast(t2),
            (F.col("j2") > F.col("jacc_micro"))
            | (
                (F.col("j2") == F.col("jacc_micro"))
                & (
                    (F.col("a2") < F.col("a"))
                    | ((F.col("a2") == F.col("a")) & (F.col("b2") < F.col("b")))
                )
            ),
            "left",
        )
        .groupBy("a", "b", "common", "deg_a", "deg_b", "jacc_micro")
        .agg((F.count("a2") + 1).alias("rnk"))
        .orderBy("rnk")
    )


def _graph_neighborhood_jaccard(spark, sf_dir):
    from .ops import graph as G

    edges = shared_cooccurrence_edges(spark, sf_dir, item_col="l_suppkey")
    return neighborhood_jaccard(edges)


_NJ_SQL = f"""
WITH edges AS (
  SELECT a.i AS src, b.i AS dst
  FROM (SELECT DISTINCT l_orderkey AS g, l_suppkey AS i FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey AS g, l_suppkey AS i FROM lineitem) b
    ON a.g = b.g AND a.i <> b.i
  GROUP BY 1, 2 HAVING count(*) >= 2
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
ce AS (SELECT e.* FROM edges e JOIN deg d ON e.src = d.src
       WHERE d.deg <= {NJ_HUB_CAP}),
pairs AS (
  SELECT e1.dst AS a, e2.dst AS b, CAST(count(*) AS BIGINT) AS common
  FROM ce e1 JOIN ce e2 ON e1.src = e2.src AND e1.dst < e2.dst
  GROUP BY 1, 2
),
scored AS (
  SELECT p.a, p.b, p.common, da.deg AS deg_a, db.deg AS deg_b,
         1000000 * p.common // (da.deg + db.deg - p.common) AS jacc_micro
  FROM pairs p JOIN deg da ON p.a = da.src JOIN deg db ON p.b = db.src
),
top AS (
  SELECT * FROM scored ORDER BY jacc_micro DESC, a, b LIMIT {NJ_TOPK}
)
SELECT x.a, x.b, x.common, x.deg_a, x.deg_b, x.jacc_micro,
       CAST(1 + count(y.a) AS BIGINT) AS rnk
FROM top x LEFT JOIN top y
  ON y.jacc_micro > x.jacc_micro
  OR (y.jacc_micro = x.jacc_micro AND (y.a < x.a OR (y.a = x.a AND y.b < x.b)))
GROUP BY x.a, x.b, x.common, x.deg_a, x.deg_b, x.jacc_micro
ORDER BY rnk
"""


def blocking_recall(part):
    """Entity-resolution blocking-strategy audit: plant one corrupted
    duplicate per distinct entity name (hash-picked token loses its
    last character — the deterministic-corruption analog of
    dedup_lsh_recall_eval's planted duplicates), then measure, for
    three standard blocking keys (first token, last token, initials),
    the planted-pair recall AND the candidate-pair cost
    Σ C(block_size, 2) — the recall/cost frontier every ER pipeline
    tunes before running its expensive matcher.

    Truth-pair recall needs NO pair join: duplicates are 1:1 by
    construction, so found = the clean and dirty keys agree ROW-WISE;
    candidate cost comes from block-size aggregates, never
    materialized pairs.  Everything is integer counts at the
    distinct-entity grain."""
    names = part.select(F.col("p_name").alias("name")).distinct()
    toks = F.split(F.col("name"), " ")
    ci = F.pmod(_h32(F.concat(F.lit("erb:"), F.col("name"))), F.size(toks))
    corrupted = F.array_join(
        F.transform(
            toks,
            lambda x, i: F.when(
                i == ci, F.substring(x, 1, F.length(x) - 1)
            ).otherwise(x),
        ),
        " ",
    )
    both = names.select("name", corrupted.alias("dirty"))

    def keys(col):
        tk = F.split(col, " ")
        return F.array(
            F.struct(
                F.lit("first_tok").alias("strategy"),
                F.element_at(tk, 1).alias("k"),
            ),
            F.struct(
                F.lit("last_tok").alias("strategy"),
                F.element_at(tk, -1).alias("k"),
            ),
            F.struct(
                F.lit("initials").alias("strategy"),
                F.array_join(
                    F.transform(tk, lambda x: F.substring(x, 1, 1)), ""
                ).alias("k"),
            ),
        )

    truth = (
        both.select(
            F.explode(F.arrays_zip(keys(F.col("name")), keys(F.col("dirty")))).alias(
                "z"
            )
        )
        .select(
            F.col("z.0.strategy").alias("strategy"),
            (F.col("z.0.k") == F.col("z.1.k")).cast("long").alias("found"),
        )
        .groupBy("strategy")
        .agg(F.count(F.lit(1)).alias("n_truth"), F.sum("found").alias("n_found"))
    )
    union = both.select(F.col("name").alias("n")).unionByName(
        both.select(F.col("dirty").alias("n"))
    )
    blocks = (
        union.select(F.explode(keys(F.col("n"))).alias("s"))
        .select("s.strategy", "s.k")
        .groupBy("strategy", "k")
        .agg(F.count(F.lit(1)).alias("bs"))
        .groupBy("strategy")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum(F.expr("bs * (bs - 1) div 2")).alias("n_candidates"),
        )
    )
    return (
        truth.join(blocks, "strategy")
        .select(
            "strategy",
            "n_truth",
            "n_found",
            (
                F.floor(
                    F.col("n_found") / F.col("n_truth").cast("double") * 1000000
                    + F.lit(0.5)
                )
                / 1000000.0
            ).alias("recall6"),
            "n_blocks",
            "n_candidates",
        )
        .orderBy("strategy")
    )


def _er_blocking_recall(spark, sf_dir):
    return blocking_recall(t(spark, sf_dir, "part"))


_ERB_SQL = """
WITH names AS (SELECT DISTINCT p_name AS name FROM part),
corr AS (
  SELECT name,
         array_to_string(
           list_transform(string_split(name, ' '),
             (x, i) -> CASE WHEN i - 1 =
                 ('0x' || substr(md5('erb:' || name), 1, 8))::BIGINT
                   % len(string_split(name, ' '))
               THEN substr(x, 1, length(x) - 1) ELSE x END),
           ' ') AS dirty
  FROM names
),
strat(s) AS (SELECT unnest(['first_tok', 'last_tok', 'initials'])),
keyed AS (
  SELECT c.name, c.dirty, s.s AS strategy,
         CASE s.s
           WHEN 'first_tok' THEN string_split(c.name, ' ')[1]
           WHEN 'last_tok' THEN string_split(c.name, ' ')[-1]
           ELSE array_to_string(list_transform(string_split(c.name, ' '),
                                x -> substr(x, 1, 1)), '')
         END AS k_clean,
         CASE s.s
           WHEN 'first_tok' THEN string_split(c.dirty, ' ')[1]
           WHEN 'last_tok' THEN string_split(c.dirty, ' ')[-1]
           ELSE array_to_string(list_transform(string_split(c.dirty, ' '),
                                x -> substr(x, 1, 1)), '')
         END AS k_dirty
  FROM corr c, strat s
),
truth AS (
  SELECT strategy, CAST(count(*) AS BIGINT) AS n_truth,
         CAST(sum(CASE WHEN k_clean = k_dirty THEN 1 ELSE 0 END) AS BIGINT)
           AS n_found
  FROM keyed GROUP BY strategy
),
uni AS (
  SELECT name AS n FROM corr UNION ALL SELECT dirty AS n FROM corr
),
ukeyed AS (
  SELECT s.s AS strategy,
         CASE s.s
           WHEN 'first_tok' THEN string_split(u.n, ' ')[1]
           WHEN 'last_tok' THEN string_split(u.n, ' ')[-1]
           ELSE array_to_string(list_transform(string_split(u.n, ' '),
                                x -> substr(x, 1, 1)), '')
         END AS k
  FROM uni u, strat s
),
blocks AS (
  SELECT strategy, CAST(count(*) AS BIGINT) AS n_blocks,
         CAST(sum(bs * (bs - 1) // 2) AS BIGINT) AS n_candidates
  FROM (SELECT strategy, k, CAST(count(*) AS BIGINT) AS bs
        FROM ukeyed GROUP BY 1, 2)
  GROUP BY strategy
)
SELECT t.strategy, t.n_truth, t.n_found,
       floor(CAST(t.n_found AS DOUBLE) / CAST(t.n_truth AS DOUBLE)
             * 1000000 + 0.5) / 1000000.0 AS recall6,
       b.n_blocks, b.n_candidates
FROM truth t JOIN blocks b ON t.strategy = b.strategy
ORDER BY t.strategy
"""


for _q in (
    QueryDef(
        "graph_neighborhood_jaccard",
        _graph_neighborhood_jaccard,
        _NJ_SQL,
        ("graph",),
    ),
    QueryDef("er_blocking_recall", _er_blocking_recall, _ERB_SQL, ("ext",)),
):
    R6_QUERIES[_q.name] = _q


# =====================================================================
# Round-6 wave 4: equi-width histogram, difference-in-differences,
# multiple regression (normal equations), class-balanced sampling,
# Kaplan-Meier survival.
# =====================================================================

HIST_BINS = 20
DID_SPLIT_NUM = 1  # post-period starts at min + (max-min)*1/2
BAL_K = 500  # per-class sample budget
KM_CENSOR_H = 48  # users active within the last 48h are censored
KM_BUCKET = 64  # coarse bucket for the duration-grain prefix sum


def equiwidth_histogram(orders, bins: int = HIST_BINS):
    """Equi-width histogram of o_totalprice (the profiling complement
    of feature_quantile_bin's equi-height bins): bounds ride in as a
    broadcast 1-row aggregate, bin assignment is one integer
    expression, and the histogram is a map-side-combinable groupBy
    onto a constant number of rows.  The max value clamps into the
    last bin (the standard closed-top rule)."""
    c = cents(F.col("o_totalprice"))
    bounds = orders.agg(
        F.min(c).alias("cmin"), F.max(c).alias("cmax")
    )
    j = orders.select(c.alias("c")).join(F.broadcast(bounds))
    bin_ = F.least(
        F.lit(bins - 1),
        F.expr(f"(c - cmin) * {bins} div (cmax - cmin + 1)"),
    ).cast("long")
    h = j.select(bin_.alias("bin")).groupBy("bin").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = h.agg(F.sum("n").alias("tot"))
    return (
        h.join(F.broadcast(tot))
        .select(
            "bin",
            "n",
            (
                F.floor(F.col("n") / F.col("tot").cast("double") * 1000000 + F.lit(0.5))
                / 1000000.0
            ).alias("pct6"),
        )
        .orderBy("bin")
    )


def _agg_equiwidth_histogram(spark, sf_dir):
    return equiwidth_histogram(t(spark, sf_dir, "orders"))


_HIST_SQL = f"""
WITH c AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c FROM orders),
b AS (SELECT min(c) AS cmin, max(c) AS cmax FROM c),
h AS (
  SELECT least({HIST_BINS - 1},
               (c - cmin) * {HIST_BINS} // (cmax - cmin + 1)) AS bin,
         CAST(count(*) AS BIGINT) AS n
  FROM c, b GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM h)
SELECT bin, n,
       floor(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) * 1000000 + 0.5)
         / 1000000.0 AS pct6
FROM h, tot ORDER BY bin
"""


def did_estimator(events):
    """Difference-in-differences over the event value stream: treatment
    = user-id parity (the hash-split a real experiment assigns), post
    = second half of the observation window (boundary from the
    broadcast min/max — pure integer micros arithmetic).  The four
    cell means are quantized IEEE divisions of integer cent sums; the
    DiD estimate is their closed form.  One scan, one 4-row aggregate.
    """
    span = events.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    )
    j = events.select(
        "user_id", "ts", cents(F.col("value")).alias("c")
    ).join(F.broadcast(span))
    cut = F.expr(f"lo + (hi - lo) * {DID_SPLIT_NUM} div 2")
    cells = j.select(
        F.pmod(F.col("user_id"), F.lit(2)).alias("treat"),
        (F.unix_micros("ts") >= cut).cast("int").alias("post"),
        "c",
    ).groupBy("treat", "post").agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("s")
    )
    m = F.col("s").cast("double") / F.col("n").cast("double")
    named = cells.select(
        F.concat(F.lit("m"), F.col("treat"), F.col("post")).alias("cell"),
        m.alias("mean_c"),
        "n",
    )
    wide = named.groupBy().pivot(
        "cell", ["m00", "m01", "m10", "m11"]
    ).agg(F.first("mean_c"))
    q6 = lambda x: F.floor(x * 1000000 + F.lit(0.5)) / 1000000.0  # noqa: E731
    return wide.select(
        q6(F.col("m00")).alias("ctrl_pre6"),
        q6(F.col("m01")).alias("ctrl_post6"),
        q6(F.col("m10")).alias("treat_pre6"),
        q6(F.col("m11")).alias("treat_post6"),
        q6(
            (F.col("m11") - F.col("m10")) - (F.col("m01") - F.col("m00"))
        ).alias("did6"),
    )


def _events_did_estimator(spark, sf_dir):
    return did_estimator(t(spark, sf_dir, "events"))


_DID_SQL = f"""
WITH span AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events),
cells AS (
  SELECT user_id % 2 AS treat,
         CASE WHEN epoch_us(ts) >= lo + (hi - lo) * {DID_SPLIT_NUM} // 2
              THEN 1 ELSE 0 END AS post,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s
  FROM events, span GROUP BY 1, 2
),
m AS (
  SELECT treat, post, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c
  FROM cells
)
SELECT
  floor(max(CASE WHEN treat = 0 AND post = 0 THEN mean_c END) * 1000000 + 0.5) / 1000000.0 AS ctrl_pre6,
  floor(max(CASE WHEN treat = 0 AND post = 1 THEN mean_c END) * 1000000 + 0.5) / 1000000.0 AS ctrl_post6,
  floor(max(CASE WHEN treat = 1 AND post = 0 THEN mean_c END) * 1000000 + 0.5) / 1000000.0 AS treat_pre6,
  floor(max(CASE WHEN treat = 1 AND post = 1 THEN mean_c END) * 1000000 + 0.5) / 1000000.0 AS treat_post6,
  floor(((max(CASE WHEN treat = 1 AND post = 1 THEN mean_c END)
          - max(CASE WHEN treat = 1 AND post = 0 THEN mean_c END))
         - (max(CASE WHEN treat = 0 AND post = 1 THEN mean_c END)
            - max(CASE WHEN treat = 0 AND post = 0 THEN mean_c END)))
        * 1000000 + 0.5) / 1000000.0 AS did6
FROM m
"""


def multiple_regression(orders):
    """Two-predictor OLS (y = order value in cents; x1 = order month,
    x2 = priority rank) solved by Cramer's rule on the normal
    equations — the closed form that needs ONLY the six integer moment
    sums of one map-side-combinable aggregate (the multi-feature
    upgrade of agg_linear_fit).  Determinants are IEEE doubles of
    exact int64 moments (identical expression tree both engines);
    betas quantize at the very end.  One scan, 1-row result."""
    x1 = F.month("o_orderdate").cast("long")
    x2 = F.substring("o_orderpriority", 1, 1).cast("long")
    y = cents(F.col("o_totalprice"))
    m = orders.select(
        x1.alias("x1"), x2.alias("x2"), y.alias("y")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )

    def d(c):
        return F.col(c).cast("double")

    def det3(a, b, c, p, q, r, u, v, w):
        return (
            a * (q * w - r * v) - b * (p * w - r * u) + c * (p * v - q * u)
        )

    dd = det3(d("n"), d("s1"), d("s2"), d("s1"), d("s11"), d("s12"), d("s2"), d("s12"), d("s22"))
    d0 = det3(d("sy"), d("s1"), d("s2"), d("s1y"), d("s11"), d("s12"), d("s2y"), d("s12"), d("s22"))
    d1 = det3(d("n"), d("sy"), d("s2"), d("s1"), d("s1y"), d("s12"), d("s2"), d("s2y"), d("s22"))
    d2 = det3(d("n"), d("s1"), d("sy"), d("s1"), d("s11"), d("s1y"), d("s2"), d("s12"), d("s2y"))
    q6 = lambda x: F.floor(x * 1000000 + F.lit(0.5)) / 1000000.0  # noqa: E731
    return m.select(
        "n",
        q6(d0 / dd).alias("beta0_6"),
        q6(d1 / dd).alias("beta1_6"),
        q6(d2 / dd).alias("beta2_6"),
    )


def _stat_multiple_regression(spark, sf_dir):
    return multiple_regression(t(spark, sf_dir, "orders"))


_MREG_SQL = """
WITH m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
         CAST(sum(x1 * x1) AS BIGINT) AS s11,
         CAST(sum(x1 * x2) AS BIGINT) AS s12,
         CAST(sum(x2 * x2) AS BIGINT) AS s22,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x1 * y) AS BIGINT) AS s1y,
         CAST(sum(x2 * y) AS BIGINT) AS s2y
  FROM (
    SELECT CAST(month(o_orderdate) AS BIGINT) AS x1,
           CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS x2,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y
    FROM orders
  )
)
SELECT n,
  floor((CAST(sy AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))
       - CAST(s1 AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2y AS DOUBLE))
       + CAST(s2 AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s2y AS DOUBLE)))
      / (CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))
       - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))
       + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE)))
      * 1000000 + 0.5) / 1000000.0 AS beta0_6,
  floor((CAST(n AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2y AS DOUBLE))
       - CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))
       + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s1y AS DOUBLE) * CAST(s2 AS DOUBLE)))
      / (CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))
       - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))
       + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE)))
      * 1000000 + 0.5) / 1000000.0 AS beta1_6,
  floor((CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s1y AS DOUBLE) * CAST(s12 AS DOUBLE))
       - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s1y AS DOUBLE) * CAST(s2 AS DOUBLE))
       + CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE)))
      / (CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))
       - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))
       + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE)))
      * 1000000 + 0.5) / 1000000.0 AS beta2_6
FROM m
"""


def class_balance_sample(events, k: int = BAL_K):
    """Class-balanced sampling to a fixed per-class budget: each
    event_type keeps its ``k`` smallest rows by (md5 hash, id) — the
    deterministic, retry-stable analog of per-class random
    downsampling, selected through the SALTED two-level grouped_topk
    (ops/scale.py) so a whale class never funnels through one reducer.
    Classes below budget keep everything (the standard rule).

    Output is the selected (class, id, h) rows themselves — the
    manifest a training job joins against — so the oracle's hash match
    proves the exact selection set, not just its size."""
    from .ops.scale import grouped_topk

    base = events.select(
        "event_type",
        "event_id",
        _h32(
            F.concat(F.lit("bal:"), F.col("event_id").cast("string"))
        ).alias("h"),
    )
    picked = grouped_topk(
        base, "event_type", [("h", "asc"), ("event_id", "asc")], k
    )
    return picked.select("event_type", "event_id", "h").orderBy(
        "event_type", "h", "event_id"
    )


def _sample_class_balance(spark, sf_dir):
    return class_balance_sample(t(spark, sf_dir, "events"))


_BAL_SQL = f"""
WITH base AS (
  SELECT event_type, event_id,
         ('0x' || substr(md5('bal:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM events
),
ranked AS (
  SELECT event_type, event_id, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h, event_id) AS rn
  FROM base
)
SELECT event_type, event_id, h FROM ranked WHERE rn <= {BAL_K}
ORDER BY event_type, h, event_id
"""


def survival_km(events, censor_h: int = KM_CENSOR_H):
    """Kaplan-Meier survival of user lifetime (hours from first to
    last event), with users still active in the final ``censor_h``
    hours of the observation window right-censored — the
    churn/retention curve at its textbook estimator.

    Exactness: at each distinct event duration t, n_at_risk and
    d_events are integers from the duration-grain prefix sum
    (hierarchical, coarse-bucketed — durations are calendar-bounded);
    the product Π(1 − d/n) is carried in EXACT log space — each
    factor's −ln quantizes to nano-nats int64 BEFORE the cumulative
    sum (the per-term rule every ln-using key follows) — and the
    survival probability is the one exp at the very end.

    Scale shape: one shuffle to user grain, one to the bounded
    duration grain; everything after is metadata-sized."""
    per_user = events.groupBy("user_id").agg(
        F.min(F.unix_micros("ts")).alias("first_us"),
        F.max(F.unix_micros("ts")).alias("last_us"),
    )
    horizon = events.agg(F.max(F.unix_micros("ts")).alias("hmax"))
    u = per_user.join(F.broadcast(horizon)).select(
        F.expr("(last_us - first_us) div 3600000000").alias("dur_h"),
        (
            F.col("last_us")
            < F.col("hmax") - censor_h * 3600000000
        ).cast("long").alias("is_event"),
    )
    g = u.groupBy("dur_h").agg(
        F.count(F.lit(1)).alias("n_at"), F.sum("is_event").alias("d")
    )
    # the CALENDAR-BOUNDED duration grain feeds three consumers (total,
    # within-bucket window, bucket totals); truncate lineage so the
    # events scan + user aggregate run once, not once per consumer
    # (before r11: 40 parquet scans in one physical plan)
    g = truncate_lineage(g)
    tot = g.agg(F.sum("n_at").alias("n_users"))
    g = g.withColumn("bkt", F.floor(F.col("dur_h") / KM_BUCKET))
    w = (
        Window.partitionBy("bkt")
        .orderBy("dur_h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = g.select(
        "dur_h", "bkt", "n_at", "d", F.sum("n_at").over(w).alias("cin")
    )
    btot = g.groupBy("bkt").agg(F.sum("n_at").alias("bn"))
    # bucket table is metadata-sized but behind the checkpoint the
    # planner has no size estimate — broadcast explicitly so the
    # inequality join is BNLJ-over-bounded-build, never a cartesian
    offs = (
        btot.select(F.col("bkt").alias("kk"))
        .join(
            F.broadcast(btot.select(F.col("bkt").alias("k2"), "bn")),
            F.col("k2") < F.col("kk"),
        )
        .groupBy("kk")
        .agg(F.sum("bn").alias("off"))
    )
    cum = (
        within.join(F.broadcast(offs), within.bkt == offs.kk, "left")
        .join(F.broadcast(tot))
        .select(
            "dur_h",
            "d",
            (
                F.col("n_users")
                - (F.col("cin") + F.coalesce("off", F.lit(0)))
                + F.col("n_at")
            ).alias("n_risk"),
        )
        .where(F.col("d") > 0)
    )
    # per-factor -ln(1 - d/n) in nano-nats, int64 BEFORE any sum
    term = F.when(F.col("d") >= F.col("n_risk"), F.lit(None)).otherwise(
        F.floor(
            -F.log(
                (F.col("n_risk") - F.col("d")).cast("double")
                / F.col("n_risk").cast("double")
            )
            * 1000000000
            + F.lit(0.5)
        ).cast("long")
    )
    tl = cum.select("dur_h", "d", "n_risk", term.alias("t9"))
    tl = tl.withColumn("bkt", F.floor(F.col("dur_h") / KM_BUCKET))
    # same rule for the factor list (still duration-grain, d>0 rows
    # only): it feeds the second window AND its bucket totals
    tl = truncate_lineage(tl)
    w2 = (
        Window.partitionBy("bkt")
        .orderBy("dur_h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within2 = tl.select(
        "dur_h", "d", "n_risk", "bkt", "t9",
        F.sum("t9").over(w2).alias("cin9"),
    )
    bt2 = tl.groupBy("bkt").agg(F.sum("t9").alias("b9"))
    offs2 = (
        bt2.select(F.col("bkt").alias("kk"))
        .join(
            F.broadcast(bt2.select(F.col("bkt").alias("k2"), "b9")),
            F.col("k2") < F.col("kk"),
        )
        .groupBy("kk")
        .agg(F.sum("b9").alias("off9"))
    )
    # a skip-null flat window carries the previous value across NULL
    # factors; the bucketed form must coalesce each level (NULL only
    # when NO non-null term exists anywhere in the prefix)
    out = within2.join(
        F.broadcast(offs2), within2.bkt == offs2.kk, "left"
    ).select(
        "dur_h",
        "n_risk",
        "d",
        F.when(
            F.col("cin9").isNull() & F.col("off9").isNull(), F.lit(None)
        )
        .otherwise(
            F.coalesce("cin9", F.lit(0)) + F.coalesce("off9", F.lit(0))
        )
        .alias("neglog9"),
    )
    return out.select(
        "dur_h",
        "n_risk",
        "d",
        "neglog9",
        (
            F.floor(
                F.exp(-F.col("neglog9").cast("double") / 1000000000.0)
                * 1000000
                + F.lit(0.5)
            )
            / 1000000.0
        ).alias("s6"),
    ).orderBy("dur_h")


def _events_survival_km(spark, sf_dir):
    return survival_km(t(spark, sf_dir, "events"))


_KM_SQL = f"""
WITH per_user AS (
  SELECT user_id, min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us
  FROM events GROUP BY user_id
),
horizon AS (SELECT max(epoch_us(ts)) AS hmax FROM events),
u AS (
  SELECT (last_us - first_us) // 3600000000 AS dur_h,
         CASE WHEN last_us < hmax - {KM_CENSOR_H} * 3600000000
              THEN 1 ELSE 0 END AS is_event
  FROM per_user, horizon
),
g AS (
  SELECT dur_h, CAST(count(*) AS BIGINT) AS n_at,
         CAST(sum(is_event) AS BIGINT) AS d
  FROM u GROUP BY dur_h
),
tot AS (SELECT CAST(sum(n_at) AS BIGINT) AS n_users FROM g),
cum AS (
  SELECT dur_h, d,
         CAST(n_users - sum(n_at) OVER (ORDER BY dur_h) + n_at AS BIGINT)
           AS n_risk
  FROM g, tot
),
terms AS (
  SELECT dur_h, d, n_risk,
         CASE WHEN d >= n_risk THEN NULL
              ELSE CAST(floor(-ln(CAST(n_risk - d AS DOUBLE)
                                  / CAST(n_risk AS DOUBLE))
                              * 1000000000 + 0.5) AS BIGINT)
         END AS t9
  FROM cum WHERE d > 0
)
SELECT dur_h, n_risk, d,
       CAST(sum(t9) OVER (ORDER BY dur_h) AS BIGINT) AS neglog9,
       floor(exp(-CAST(sum(t9) OVER (ORDER BY dur_h) AS DOUBLE) / 1000000000.0)
             * 1000000 + 0.5) / 1000000.0 AS s6
FROM terms ORDER BY dur_h
"""


for _q in (
    QueryDef(
        "agg_equiwidth_histogram",
        _agg_equiwidth_histogram,
        _HIST_SQL,
        ("agg",),
    ),
    QueryDef(
        "events_did_estimator", _events_did_estimator, _DID_SQL, ("stat",)
    ),
    QueryDef(
        "stat_multiple_regression",
        _stat_multiple_regression,
        _MREG_SQL,
        ("stat",),
    ),
    QueryDef(
        "sample_class_balance", _sample_class_balance, _BAL_SQL, ("corpus",)
    ),
    QueryDef("events_survival_km", _events_survival_km, _KM_SQL, ("stat",)),
):
    R6_QUERIES[_q.name] = _q


# =====================================================================
# Round-6 wave 5: ANOVA, Welch t, Theil-Sen robust slope, freshness.
# =====================================================================

TS_BUCKET2 = 1 << 16  # coarse bucket for the slope/residual medians
FRESH_STALE_MIN = 60


def anova_oneway(events):
    """One-way ANOVA of value by event_type: between/within sums of
    squares from the per-group integer moments, each group's term
    micro-quantized to int64 BEFORE the cross-group sum (the fold-order
    rule), F assembled from the integer totals at the end.  One
    map-side-combinable scan; the grand mean rides as a broadcast
    1-row aggregate."""
    vals = events.select("event_type", cents(F.col("value")).alias("c"))
    g = vals.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    tot = g.agg(
        F.sum("n").alias("tn"), F.sum("s").alias("ts"), F.count(F.lit(1)).alias("k")
    )
    j = g.join(F.broadcast(tot))
    mu = F.col("ts").cast("double") / F.col("tn").cast("double")
    mean_g = F.col("s").cast("double") / F.col("n").cast("double")
    ssb_term = F.col("n").cast("double") * (mean_g - mu) * (mean_g - mu)
    ssw_term = (
        (F.col("q") * F.col("n") - F.col("s") * F.col("s")).cast("double")
        / F.col("n").cast("double")
    )
    per = j.select(
        "tn",
        "k",
        F.floor(ssb_term / 10000.0 + F.lit(0.5)).cast("long").alias("ssb_u"),
        F.floor(ssw_term / 10000.0 + F.lit(0.5)).cast("long").alias("ssw_u"),
    )
    agg = per.groupBy("tn", "k").agg(
        F.sum("ssb_u").alias("ssb"), F.sum("ssw_u").alias("ssw")
    )
    # a zero within-group sum of squares (all groups constant) leaves F
    # undefined — NULL, mirrored in the oracle (ANSI mode rejects the
    # IEEE inf shortcut)
    f6 = F.when(
        (F.col("ssw") == 0) | (F.col("tn") <= F.col("k")), F.lit(None)
    ).otherwise(
        F.floor(
            (F.col("ssb").cast("double") / (F.col("k") - 1).cast("double"))
            / (
                F.col("ssw").cast("double")
                / (F.col("tn") - F.col("k")).cast("double")
            )
            * 1000000
            + F.lit(0.5)
        )
        / 1000000.0
    )
    return agg.select(
        F.col("k").alias("n_groups"),
        F.col("tn").alias("n"),
        F.col("ssb").alias("ssb_cents2_e4"),
        F.col("ssw").alias("ssw_cents2_e4"),
        f6.alias("f6"),
    )


def _stat_anova_oneway(spark, sf_dir):
    return anova_oneway(t(spark, sf_dir, "events"))


_ANOVA_SQL = """
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
         CAST(count(*) AS BIGINT) AS k
  FROM g
),
per AS (
  SELECT tn, k,
         CAST(floor(CAST(n AS DOUBLE)
            * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
               - CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE))
            * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
               - CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE))
            / 10000.0 + 0.5) AS BIGINT) AS ssb_u,
         CAST(floor(CAST(q * n - s * s AS DOUBLE) / CAST(n AS DOUBLE)
            / 10000.0 + 0.5) AS BIGINT) AS ssw_u
  FROM g, tot
),
agg AS (
  SELECT tn, k, CAST(sum(ssb_u) AS BIGINT) AS ssb,
         CAST(sum(ssw_u) AS BIGINT) AS ssw
  FROM per GROUP BY tn, k
)
SELECT k AS n_groups, tn AS n, ssb AS ssb_cents2_e4, ssw AS ssw_cents2_e4,
       CASE WHEN ssw = 0 OR tn <= k THEN NULL
            ELSE floor((CAST(ssb AS DOUBLE) / CAST(k - 1 AS DOUBLE))
                       / (CAST(ssw AS DOUBLE) / CAST(tn - k AS DOUBLE))
                       * 1000000 + 0.5) / 1000000.0
       END AS f6
FROM agg
"""


def welch_ttest(events):
    """Welch's unequal-variance t for the A/B arms (the robust default
    over Student's t): t and the Welch-Satterthwaite df from the two
    groups' integer moments — one fixed expression tree, no cross-group
    float fold at all.  Single scan, 1-row result."""
    vals = events.where(F.col("event_type").isin(KS_A, KS_B)).select(
        (F.col("event_type") == KS_A).cast("int").alias("is_a"),
        cents(F.col("value")).alias("c"),
    )
    m = vals.agg(
        F.sum("is_a").alias("na"),
        F.sum(F.when(F.col("is_a") == 1, F.col("c")).otherwise(0)).alias("sa"),
        F.sum(
            F.when(F.col("is_a") == 1, F.col("c") * F.col("c")).otherwise(0)
        ).alias("qa"),
        F.sum(1 - F.col("is_a")).alias("nb"),
        F.sum(F.when(F.col("is_a") == 0, F.col("c")).otherwise(0)).alias("sb"),
        F.sum(
            F.when(F.col("is_a") == 0, F.col("c") * F.col("c")).otherwise(0)
        ).alias("qb"),
    )

    def d(c):
        return F.col(c).cast("double")

    va = (d("qa") * d("na") - d("sa") * d("sa")) / (
        d("na") * d("na") * (d("na") - 1)
    )
    vb = (d("qb") * d("nb") - d("sb") * d("sb")) / (
        d("nb") * d("nb") * (d("nb") - 1)
    )
    tstat = (d("sa") / d("na") - d("sb") / d("nb")) / F.sqrt(va + vb)
    dfw = (va + vb) * (va + vb) / (
        va * va / (d("na") - 1) + vb * vb / (d("nb") - 1)
    )
    q6 = lambda x: F.floor(x * 1000000 + F.lit(0.5)) / 1000000.0  # noqa: E731
    return m.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        q6(tstat).alias("t6"),
        q6(dfw).alias("df6"),
    )


def _stat_welch_ttest(spark, sf_dir):
    return welch_ttest(t(spark, sf_dir, "events"))


_WELCH_SQL = f"""
WITH vals AS (
  SELECT CASE WHEN event_type = '{KS_A}' THEN 1 ELSE 0 END AS is_a,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events WHERE event_type IN ('{KS_A}', '{KS_B}')
),
m AS (
  SELECT CAST(sum(is_a) AS BIGINT) AS na,
         CAST(sum(CASE WHEN is_a = 1 THEN c ELSE 0 END) AS BIGINT) AS sa,
         CAST(sum(CASE WHEN is_a = 1 THEN c * c ELSE 0 END) AS BIGINT) AS qa,
         CAST(sum(1 - is_a) AS BIGINT) AS nb,
         CAST(sum(CASE WHEN is_a = 0 THEN c ELSE 0 END) AS BIGINT) AS sb,
         CAST(sum(CASE WHEN is_a = 0 THEN c * c ELSE 0 END) AS BIGINT) AS qb
  FROM vals
)
SELECT na AS n_a, nb AS n_b,
  floor((CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
         - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
        / sqrt((CAST(qa * na - sa * sa AS DOUBLE)
                / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE) * CAST(na - 1 AS DOUBLE)))
               + (CAST(qb * nb - sb * sb AS DOUBLE)
                  / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE) * CAST(nb - 1 AS DOUBLE))))
        * 1000000 + 0.5) / 1000000.0 AS t6,
  floor(((CAST(qa * na - sa * sa AS DOUBLE)
          / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE) * CAST(na - 1 AS DOUBLE)))
         + (CAST(qb * nb - sb * sb AS DOUBLE)
            / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE) * CAST(nb - 1 AS DOUBLE))))
        * ((CAST(qa * na - sa * sa AS DOUBLE)
            / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE) * CAST(na - 1 AS DOUBLE)))
           + (CAST(qb * nb - sb * sb AS DOUBLE)
              / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE) * CAST(nb - 1 AS DOUBLE))))
        / ((CAST(qa * na - sa * sa AS DOUBLE)
            / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE) * CAST(na - 1 AS DOUBLE)))
           * (CAST(qa * na - sa * sa AS DOUBLE)
              / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE) * CAST(na - 1 AS DOUBLE)))
           / CAST(na - 1 AS DOUBLE)
           + (CAST(qb * nb - sb * sb AS DOUBLE)
              / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE) * CAST(nb - 1 AS DOUBLE)))
           * (CAST(qb * nb - sb * sb AS DOUBLE)
              / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE) * CAST(nb - 1 AS DOUBLE)))
           / CAST(nb - 1 AS DOUBLE))
        * 1000000 + 0.5) / 1000000.0 AS df6
FROM m
"""


def _median_smallest(df, val_col: str, bucket: int = TS_BUCKET2, n_df=None):
    """Lower median (smallest v with 2·cum ≥ n) of an integer column,
    via the hierarchical coarse-bucket prefix sum — returns a 1-row
    DataFrame with column ``med``.  The grain is the distinct values of
    ``val_col``; the coarse offset build is bounded by
    value-range/bucket.

    ``n_df``: optional precomputed 1-row total-count frame (column
    ``nn``). When the caller can derive the row count arithmetically
    (theil_sen: n_pairs = n·(n−1)/2 from the hour-grain count), passing
    it here avoids a SECOND full execution of ``df`` — for theil_sen's
    pair generator that second run was a whole extra O(n²) nested-loop
    join per median (r11, guide §1.2/§2.4)."""
    g = df.groupBy(val_col).agg(F.count(F.lit(1)).alias("cnt"))
    g = g.withColumn("bkt", F.floor(F.col(val_col) / bucket))
    w = (
        Window.partitionBy("bkt")
        .orderBy(val_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = g.select(
        val_col, "bkt", "cnt", F.sum("cnt").over(w).alias("cin")
    )
    btot = g.groupBy("bkt").agg(F.sum("cnt").alias("bc"))
    # the coarse table is metadata-sized (value-range/bucket rows) but
    # its post-shuffle stats are unknown to the planner — broadcast
    # explicitly so the inequality join is BNLJ-over-bounded-build,
    # never a cartesian
    offs = (
        btot.select(F.col("bkt").alias("kk"))
        .join(
            F.broadcast(btot.select(F.col("bkt").alias("k2"), "bc")),
            F.col("k2") < F.col("kk"),
        )
        .groupBy("kk")
        .agg(F.sum("bc").alias("off"))
    )
    n = df.agg(F.count(F.lit(1)).alias("nn")) if n_df is None else n_df
    cum = (
        within.join(F.broadcast(offs), within.bkt == offs.kk, "left")
        .join(F.broadcast(n))
        .select(
            F.col(val_col).alias("v"),
            (F.col("cin") + F.coalesce("off", F.lit(0))).alias("cum"),
            "nn",
        )
    )
    return cum.agg(
        F.min(F.when(2 * F.col("cum") >= F.col("nn"), F.col("v"))).alias("med")
    )


def theil_sen(events, max_points: int | None = None):
    """Theil-Sen robust trend of the hourly value series: the median of
    all pairwise slopes, then the median residual intercept — the
    estimator that shrugs off the outliers OLS chases.  The pair join
    is a self-join of the CALENDAR-BOUNDED hour grain (8760 rows/year
    regardless of event count — the seasonal_decompose argument), and
    both medians are EXACT order statistics over milli-quantized
    integer slopes via the hierarchical prefix machinery.

    ``max_points`` is the LONG-SPAN escape hatch (round-8 verdict
    item 4): the exact all-pairs form is quadratic in the hour grain —
    fine to roughly a 2-year span (~17.5k hours → ~1.5e8 pairs, still
    one shuffle-light join at cluster scale) but at 10 years it is
    ~3.8e9 pairs. Past that crossover, pass ``max_points`` (e.g. 8192):
    the hour grain is decimated by SYSTEMATIC sampling — every
    ceil(n/max_points)-th hour offset, deterministic and evenly spaced
    in time, which preserves trend geometry better than random pair
    sampling — and the same exact-median machinery runs on the
    subsample (≤ max_points²/2 pairs). Default None = exact; the
    registered key uses the default, so the oracle is unchanged.

    Output: point/pair counts, median slope (milli-cents per hour),
    median intercept (milli-cents at hour 0 of the series)."""
    hourly = (
        events.select(
            F.expr("unix_micros(ts) div 3600000000").alias("hidx"),
            cents(F.col("value")).alias("c"),
        )
        .groupBy("hidx")
        .agg(F.sum("c").alias("tot"))
    )
    h0 = hourly.agg(F.min("hidx").alias("h0"))
    hh = hourly.join(F.broadcast(h0)).select(
        (F.col("hidx") - F.col("h0")).alias("x"), "tot"
    )
    if max_points is not None:
        # stride from a 1-row broadcast count (no eager collect); keep
        # every stride-th point IN RANK ORDER — decimating on the x
        # VALUE (x % stride) silently keeps everything whenever the
        # series has regular gaps the stride divides (e.g. 4-hourly
        # data, stride 2), which is exactly the long-span shape this
        # hatch exists for. The global row_number runs at the
        # calendar-bounded hour grain (≤ 8760·years rows — metadata-
        # sized, same contract as the compaction planner's window).
        from pyspark.sql import Window

        nn = hh.agg(F.count(F.lit(1)).alias("nn"))
        stride = F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.col("nn") / F.lit(max_points)).cast("long"),
        )
        rn = F.row_number().over(Window.orderBy("x")) - 1
        hh = (
            hh.withColumn("rn", rn)
            .join(F.broadcast(nn))
            .filter(F.col("rn") % stride == 0)
            .drop("rn", "nn")
        )
    # Truncate lineage at the CALENDAR-BOUNDED hour grain (8760
    # rows/year at any event volume — the same bounded-intermediate
    # argument as the power-iteration table): hh feeds the pair
    # generator (twice), the residual pass, and the count row, and each
    # of those is itself referenced by the median machinery — without
    # truncation the physical plan re-derived the events scan +
    # aggregate 326 times (4,799-line plan, measured r11).
    hh = truncate_lineage(hh)
    nn = hh.agg(F.count(F.lit(1)).alias("nn"))
    a = hh.select(F.col("x").alias("xa"), F.col("tot").alias("ya"))
    b = hh.select(F.col("x").alias("xb"), F.col("tot").alias("yb"))
    # codegen can evaluate the projection before the nested-loop join's
    # condition filters xa == xb rows — guard the division inside the
    # expression (the CASE arm never survives to the output)
    pairs = a.join(b, F.col("xa") < F.col("xb")).select(
        F.expr(
            "CASE WHEN xb > xa THEN div(1000 * (yb - ya), xb - xa) END"
        ).alias("slope_m")
    )
    # both median totals derive arithmetically from the hour-grain
    # count (n_pairs = n·(n−1)/2) — without n_df the median machinery
    # re-executed its input for the count, i.e. a second full O(n²)
    # pair join for the slope median
    # integer division: nn·(nn−1) is always even, so ``div`` is exact in
    # int64 at ANY grain; the old float-divide-then-cast was exact only
    # while nn² < 2^53 (fine at the hour grain, a silent off-by-one risk
    # if the helper is ever reused on an unbounded grain — ADVICE r11)
    n_pairs_df = nn.select(
        F.expr("(nn * (nn - 1)) div 2").cast("long").alias("nn")
    )
    med_slope = _median_smallest(pairs, "slope_m", n_df=n_pairs_df)
    resid = hh.join(F.broadcast(med_slope)).select(
        (1000 * F.col("tot") - F.col("med") * F.col("x")).alias("r_m")
    )
    med_int = _median_smallest(resid, "r_m", n_df=nn).select(
        F.col("med").alias("intercept_m")
    )
    counts = hh.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.expr("CAST(count(1) * (count(1) - 1) div 2 AS BIGINT)").alias(
            "n_pairs"
        ),
    )
    return (
        counts.join(F.broadcast(med_slope))
        .join(F.broadcast(med_int))
        .select(
            "n_points",
            "n_pairs",
            F.col("med").alias("slope_milli"),
            "intercept_m",
        )
    )


def _ts_theil_sen(spark, sf_dir):
    return theil_sen(t(spark, sf_dir, "events"))


_THEIL_SQL = """
WITH hourly AS (
  SELECT epoch_us(ts) // 3600000000 AS hidx,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS tot
  FROM events GROUP BY 1
),
h0 AS (SELECT min(hidx) AS h0 FROM hourly),
hh AS (SELECT hidx - h0 AS x, tot FROM hourly, h0),
pairs AS (
  SELECT (1000 * (b.tot - a.tot)) // (b.x - a.x) AS slope_m
  FROM hh a JOIN hh b ON a.x < b.x
),
np AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM pairs),
cums AS (
  SELECT slope_m AS v,
         CAST(sum(count(*)) OVER (ORDER BY slope_m) AS BIGINT) AS cum
  FROM pairs GROUP BY slope_m
),
med_s AS (
  SELECT min(CASE WHEN 2 * cum >= n_pairs THEN v END) AS med
  FROM cums, np
),
resid AS (
  SELECT 1000 * tot - med * x AS r_m FROM hh, med_s
),
nr AS (SELECT CAST(count(*) AS BIGINT) AS n_r FROM resid),
cumr AS (
  SELECT r_m AS v, CAST(sum(count(*)) OVER (ORDER BY r_m) AS BIGINT) AS cum
  FROM resid GROUP BY r_m
),
med_i AS (
  SELECT min(CASE WHEN 2 * cum >= n_r THEN v END) AS intercept_m
  FROM cumr, nr
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM hh) AS n_points,
       (SELECT n_pairs FROM np) AS n_pairs,
       med AS slope_milli, intercept_m
FROM med_s, med_i
"""


def freshness_audit(events, stale_min: int = FRESH_STALE_MIN):
    """Per-stream freshness audit: last event time, lag behind the
    freshest stream (minutes), last-24h volume, and the stale flag the
    on-call alarm fires on.  One scan to the stream grain; the global
    horizon rides as a broadcast 1-row aggregate — the operational
    counterpart of stream_lateness_sweep."""
    per = events.groupBy("event_type").agg(
        F.max(F.unix_micros("ts")).alias("last_us"),
        F.count(F.lit(1)).alias("n_total"),
    )
    hor = per.agg(F.max("last_us").alias("hmax"))
    last24 = (
        events.join(F.broadcast(hor))
        .where(F.unix_micros("ts") >= F.col("hmax") - 24 * 3600000000)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_last24h"))
    )
    lag_min = F.expr("(hmax - last_us) div 60000000")
    return (
        per.join(F.broadcast(hor))
        .join(last24, "event_type", "left")
        .select(
            "event_type",
            "n_total",
            F.coalesce("n_last24h", F.lit(0)).alias("n_last24h"),
            lag_min.alias("lag_min"),
            (lag_min > stale_min).alias("stale"),
        )
        .orderBy("event_type")
    )


def _dq_freshness_audit(spark, sf_dir):
    return freshness_audit(t(spark, sf_dir, "events"))


_FRESH_SQL = f"""
WITH per AS (
  SELECT event_type, max(epoch_us(ts)) AS last_us,
         CAST(count(*) AS BIGINT) AS n_total
  FROM events GROUP BY event_type
),
hor AS (SELECT max(last_us) AS hmax FROM per),
l24 AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_last24h
  FROM events, hor
  WHERE epoch_us(ts) >= hmax - 24 * 3600000000
  GROUP BY event_type
)
SELECT per.event_type, n_total,
       COALESCE(n_last24h, 0) AS n_last24h,
       (hmax - last_us) // 60000000 AS lag_min,
       (hmax - last_us) // 60000000 > {FRESH_STALE_MIN} AS stale
FROM per LEFT JOIN l24 ON per.event_type = l24.event_type, hor
ORDER BY per.event_type
"""


for _q in (
    QueryDef("stat_anova_oneway", _stat_anova_oneway, _ANOVA_SQL, ("stat",)),
    QueryDef("stat_welch_ttest", _stat_welch_ttest, _WELCH_SQL, ("stat",)),
    QueryDef("ts_theil_sen", _ts_theil_sen, _THEIL_SQL, ("ts",)),
    QueryDef("dq_freshness_audit", _dq_freshness_audit, _FRESH_SQL, ("dq",)),
):
    R6_QUERIES[_q.name] = _q

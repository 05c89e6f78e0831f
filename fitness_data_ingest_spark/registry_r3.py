"""Round-3 operator registry: batch MERGE (CDC apply), higher-order
array functions, true-metric entity resolution (blocked Levenshtein),
and integer-exact PageRank.

Oracle SQL mirrors the Spark expressions exactly (integer-exact
aggregation, IEEE floor-rounding, identical tie-breaks) so value
hashes match bit-for-bit; see registry_ext's header for the
determinism rules.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .ext import dedup as D
from .ext import corpus as C2
from .ext import multimodal as MM
from .ext import similarity as S
from .ext import text as TX
from .ops import graph as G
from .ops import timeseries as TS
from .ops import incremental as INC
from .registry_util import QueryDef, round2, shared_cooccurrence_edges, t

# ---------------------------------------------------------------- MERGE


def _merge_upsert(spark, sf_dir):
    """Batch MERGE INTO: apply a deterministic CDC changeset (updates
    keys %7, deletes keys %13, inserts cloned keys %31 shifted +10M) to
    the orders snapshot — one full-outer join on the key, then sample
    keys ending in 3 for a stable driver-sized result."""
    orders = t(spark, sf_dir, "orders")
    upd = (
        orders.filter((F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 13 != 0))
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", round2(F.col("o_totalprice") * 1.1))
        .withColumn("op", F.lit("U"))
    )
    dele = orders.filter(F.col("o_orderkey") % 13 == 0).withColumn("op", F.lit("D"))
    ins = (
        orders.filter(F.col("o_orderkey") % 31 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
        .withColumn("o_orderstatus", F.lit("I"))
        .withColumn("op", F.lit("I"))
    )
    changes = upd.unionByName(dele).unionByName(ins)
    merged = INC.merge_upsert(orders, changes, "o_orderkey")
    return merged.filter(F.col("o_orderkey") % 10 == 3).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        round2(F.col("o_totalprice")).alias("price2"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("od"),
    )


_MERGE_SQL = """
WITH u AS (SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                  floor(o_totalprice * 1.1 * 100 + 0.5) / 100.0 AS o_totalprice,
                  o_orderdate, o_orderpriority, 'U' AS op
           FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 13 <> 0),
d AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate, o_orderpriority, 'D' AS op
      FROM orders WHERE o_orderkey % 13 = 0),
i AS (SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
             'I' AS o_orderstatus, o_totalprice, o_orderdate,
             o_orderpriority, 'I' AS op
      FROM orders WHERE o_orderkey % 31 = 0),
chg AS (SELECT * FROM u UNION ALL SELECT * FROM d UNION ALL SELECT * FROM i),
m AS (SELECT
        CASE WHEN c.op IN ('U','I') THEN c.o_orderkey ELSE s.o_orderkey END AS o_orderkey,
        CASE WHEN c.op IN ('U','I') THEN c.o_custkey ELSE s.o_custkey END AS o_custkey,
        CASE WHEN c.op IN ('U','I') THEN c.o_orderstatus ELSE s.o_orderstatus END AS o_orderstatus,
        CASE WHEN c.op IN ('U','I') THEN c.o_totalprice ELSE s.o_totalprice END AS o_totalprice,
        CASE WHEN c.op IN ('U','I') THEN c.o_orderdate ELSE s.o_orderdate END AS o_orderdate
      FROM orders s FULL OUTER JOIN chg c ON s.o_orderkey = c.o_orderkey
      WHERE c.op IS NULL OR c.op <> 'D')
SELECT o_orderkey, o_custkey, o_orderstatus,
       floor(o_totalprice * 100 + 0.5) / 100.0 AS price2,
       strftime(o_orderdate, '%Y-%m-%d') AS od
FROM m WHERE o_orderkey % 10 = 3
"""

# ------------------------------------------------- ARRAY HIGHER-ORDER


def _array_hof_battery(spark, sf_dir):
    """transform/filter/aggregate/array_max over the embedding column,
    all JVM lambda functions, exact int64 micro-unit statistics."""
    return S.array_profile(t(spark, sf_dir, "embeddings"))


_HOF_SQL = """
SELECT vec_id,
  CAST(len(embedding) AS BIGINT) AS n_dims,
  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
  CAST(list_sum(list_transform(embedding,
        x -> CAST(floor(abs(CAST(x AS DOUBLE)) * 1e6 + 0.5) AS BIGINT))) AS BIGINT) AS l1_micro,
  CAST(list_max(list_transform(embedding,
        x -> CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT))) AS BIGINT) AS max_micro
FROM embeddings
"""

# --------------------------------------------------- EDIT DISTANCE ER


def _er_edit_distance(spark, sf_dir):
    """Blocked Levenshtein similarity join on distinct part names
    (block = last name token), the true-metric ER candidate step."""
    part = t(spark, sf_dir, "part")
    out = D.edit_distance_pairs(
        part, "p_name", F.substring_index(F.col("p_name"), " ", -1), 4
    )
    return out.select("name_a", "name_b", F.col("dist").cast("long").alias("dist"))


_ER_EDIT_SQL = """
WITH names AS (SELECT DISTINCT p_name AS name, str_split(p_name, ' ')[-1] AS blk
               FROM part)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
FROM names a JOIN names b ON a.blk = b.blk AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= 4
"""

# ------------------------------------------------------ SQ8 QUANTIZED ANN


def _ann_sq8_topk(spark, sf_dir):
    """ANN over scalar-quantized (SQ8) codes: per-dim corpus bounds ->
    0..255 integer codes -> exact integer quantized-L2 top-5 per query.
    The vector-compression scale path (8-bit scan, integer kernel);
    codes come from the materialized shared SQ8 stage (r9)."""
    from .registry_util import shared_sq8_codes

    emb = t(spark, sf_dir, "embeddings")
    return S.sq8_topk(
        emb, F.col("vec_id") < 10, k=5, codes=shared_sq8_codes(spark, sf_dir)
    )


_SQ8_SQL = """
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
idx AS (SELECT vec_id, v, unnest(range(1, len(v)+1)) AS i FROM e),
d AS (SELECT i AS pos, min(v[i]) AS mn, max(v[i]) AS mx FROM idx GROUP BY 1),
b AS (SELECT list(mn ORDER BY pos) AS mn, list(mx ORDER BY pos) AS mx FROM d),
codes AS (SELECT vec_id,
  list_transform(range(1, len(v)+1), i ->
    CASE WHEN b.mx[i] > b.mn[i]
         THEN CAST(floor((v[i] - b.mn[i]) / (b.mx[i] - b.mn[i]) * 255 + 0.5) AS BIGINT)
         ELSE 0 END) AS c
  FROM e CROSS JOIN b),
s AS (SELECT q.vec_id AS query_id, c2.vec_id AS cand_id,
       CAST(list_sum(list_transform(range(1, len(q.c)+1),
            i -> (q.c[i] - c2.c[i]) * (q.c[i] - c2.c[i]))) AS BIGINT) AS dist2
      FROM (SELECT * FROM codes WHERE vec_id < 10) q,
           (SELECT * FROM codes WHERE vec_id >= 10) c2)
SELECT query_id, cand_id,
       row_number() OVER (PARTITION BY query_id ORDER BY dist2 ASC, cand_id ASC) AS rnk,
       dist2
FROM s QUALIFY rnk <= 5
"""

# ------------------------------------------------- FRAME SAMPLING


def _multimodal_frame_sample(spark, sf_dir):
    """Frame sampling over REAL synthesized payloads: documents become
    deterministic WAV/PPM binaries (ext/multimodal.synthesize_media),
    then ``frame_sample`` slices every 4th 64-byte frame inside an
    Arrow-batched mapInPandas (shuffle-free — payloads never leave
    their partition). The oracle re-derives each payload's byte length
    arithmetically from (doc_id, n_chars) — 44-byte WAV header + PCM
    data, PPM header + RGB plane — and regenerates the sampled frame
    index/length grid relationally, so a slicing bug flips the hash."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n_chars")
    )
    media = MM.synthesize_media(docs)
    fs = MM.frame_sample(media, frame_bytes=64, every_k=4)
    return fs.select(
        "media_id", "frame_idx", F.length("frame").cast("long").alias("frame_len")
    )


_FRAME_SQL = """
WITH d AS (SELECT doc_id AS media_id, len(text) AS n FROM documents),
p AS (SELECT media_id,
   CASE WHEN media_id % 2 = 0
        THEN 44 + 2 * (n % 256 + 16) * (1 + (media_id // 2) % 2)
        ELSE 3 + len(CAST(n % 32 + 1 AS VARCHAR)) + 1
               + len(CAST((media_id // 2) % 16 + 1 AS VARCHAR)) + 1 + 4
               + 3 * (n % 32 + 1) * ((media_id // 2) % 16 + 1)
   END AS plen FROM d),
f AS (SELECT media_id, plen,
             unnest(range(0, (plen + 63) // 64, 4)) AS frame_idx
      FROM p)
SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST(least(64, plen - frame_idx * 64) AS BIGINT) AS frame_len
FROM f
"""

# ---------------------------------------------------- CHUNK OVERLAP


def _corpus_chunk_overlap(spark, sf_dir):
    """Overlapping 64-token windows advancing by 48 per document — the
    RAG/pretraining chunk-prep step, entirely JVM expressions (split ->
    sequence -> explode -> slice -> array_join), zero shuffle."""
    return C2.chunk_overlap(t(spark, sf_dir, "documents"))


_CHUNK_SQL = """
WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
           FROM documents),
c AS (SELECT doc_id, toks,
             unnest(range(0, CASE WHEN len(toks) <= 64 THEN 1
                                  ELSE (len(toks) - 64 + 47) // 48 + 1 END)) AS ci
      FROM d)
SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
       CAST(len(toks[ci*48 + 1 : ci*48 + 64]) AS BIGINT) AS n_tok,
       array_to_string(toks[ci*48 + 1 : ci*48 + 64], ' ') AS chunk_text
FROM c
"""

# ------------------------------------------------------ RARITY SCORE


def _text_rarity_score(spark, sf_dir):
    """Integer IDF-proxy rarity per document: each distinct token adds
    1e6 div df(token); log-free so the value hash is engine-stable."""
    return TX.rarity_score(t(spark, sf_dir, "documents"))


_RARITY_SQL = """
WITH toks AS (SELECT DISTINCT doc_id,
                     unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
              FROM documents),
d AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY 1)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct_tok,
       CAST(sum(1000000 // df) AS BIGINT) AS rarity
FROM toks JOIN d USING (term)
GROUP BY doc_id
"""

# ------------------------------------------------ MAX-AREA DOWNSAMPLE


def _ts_downsample_maxarea(spark, sf_dir):
    """LTTB-family visual decimation: per (user, 6h bucket) keep the
    point subtending the largest triangle vs neighbor-bucket centroids;
    integer cross-products (scaled by n0^2*n2) keep the argmax and the
    value hash engine-exact."""
    return TS.downsample_maxarea(t(spark, sf_dir, "events"))


_DOWNSAMPLE_SQL = """
WITH pts AS (
  SELECT user_id, event_id,
         epoch_us(ts) // 1000000 AS es,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS yc,
         (epoch_us(ts) // 1000000) // 21600 AS b
  FROM events),
agg AS (SELECT user_id, b, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(es - b*21600) AS BIGINT) AS sx,
               CAST(sum(yc) AS BIGINT) AS sy
        FROM pts GROUP BY 1, 2),
cand AS (
  SELECT p.user_id, p.b, p.event_id,
         abs( ( (p.es - (p.b-1)*21600) * a0.n - (a0.sx + a0.n*21600) )
              * ( a2.sy * a0.n - a0.sy * a2.n )
            - ( (a2.sx + a2.n*3*21600) * a0.n - (a0.sx + a0.n*21600) * a2.n )
              * ( p.yc * a0.n - a0.sy ) ) AS area
  FROM pts p
  JOIN agg a0 ON a0.user_id = p.user_id AND a0.b = p.b - 1
  JOIN agg a2 ON a2.user_id = p.user_id AND a2.b = p.b + 1)
SELECT user_id, b, rep_id, area_scaled FROM (
  SELECT user_id, b, event_id AS rep_id, CAST(area AS BIGINT) AS area_scaled,
         row_number() OVER (PARTITION BY user_id, b
                            ORDER BY area DESC, event_id ASC) AS rn
  FROM cand) WHERE rn = 1
"""

# ------------------------------------------------------------ PAGERANK

_PR_ITERS = 6


def _graph_pagerank(spark, sf_dir):
    """Integer-exact PageRank over the part co-occurrence graph
    (parts sharing >= 2 orders — the single-co-occurrence noise tail
    drops), 6 iterations of the int64 micro-unit
    recurrence — bit-identical to the unrolled SQL oracle under any
    partitioning because every per-node reduction is an integer sum.
    Edges come from the materialized shared stage (one build per
    process for the whole graph family — registry_util.
    shared_cooccurrence_edges); the iterative consumer re-persists its
    own degree-joined form as before."""
    edges = shared_cooccurrence_edges(spark, sf_dir)
    return G.pagerank_int(edges, iters=_PR_ITERS, symmetric=True)


_PR_EDGES_CTE = """
SELECT a.i AS src, b.i AS dst
FROM (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem) a
JOIN (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem) b
  ON a.g = b.g AND a.i <> b.i
GROUP BY 1, 2 HAVING count(*) >= 2
"""

_PR_SQL = G.pagerank_oracle_sql(_PR_EDGES_CTE, iters=_PR_ITERS)


def _graph_triangles(spark, sf_dir):
    """Per-node triangle count + local clustering coefficient over the
    thresholded part co-occurrence graph: degree-ordered
    (compact-forward) wedge join — oriented out-degree is O(sqrt(m))
    per node, capping fan-out on skewed degree distributions — each
    triangle credited to its three corners in one union + groupBy. The
    oracle enumerates via the simpler id-canonical form; the triangle
    SET is identical. Edges: the materialized shared stage."""
    edges = shared_cooccurrence_edges(spark, sf_dir)
    return G.triangle_stats(edges)


_TRI_SQL = f"""
WITH edges AS ({_PR_EDGES_CTE}),
ce AS (SELECT src, dst FROM edges WHERE src < dst),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM ce e1 JOIN ce e2 ON e1.dst = e2.src
        JOIN ce e3 ON e3.src = e1.src AND e3.dst = e2.dst),
corners AS (SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri),
tc AS (SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM corners GROUP BY 1)
SELECT d.node, d.deg, CAST(COALESCE(t.n_tri, 0) AS BIGINT) AS n_tri,
       floor(CAST(COALESCE(t.n_tri, 0) AS DOUBLE) * 2.0
             / (CAST(d.deg AS DOUBLE) * CAST(d.deg - 1 AS DOUBLE))
             * 10000 + 0.5) / 10000.0 AS cc4
FROM deg d LEFT JOIN tc t ON d.node = t.node
WHERE d.deg >= 2
"""


R3_QUERIES: dict[str, QueryDef] = {
    q.name: q
    for q in (
        QueryDef("merge_upsert", _merge_upsert, _MERGE_SQL, ("incremental",)),
        QueryDef("array_hof_battery", _array_hof_battery, _HOF_SQL, ("ext",)),
        QueryDef("er_edit_distance", _er_edit_distance, _ER_EDIT_SQL, ("ext",)),
        QueryDef("ann_sq8_topk", _ann_sq8_topk, _SQ8_SQL, ("ext",)),
        QueryDef(
            "corpus_chunk_overlap", _corpus_chunk_overlap, _CHUNK_SQL, ("corpus",)
        ),
        QueryDef(
            "multimodal_frame_sample",
            _multimodal_frame_sample,
            _FRAME_SQL,
            ("multimodal",),
        ),
        QueryDef("graph_pagerank", _graph_pagerank, _PR_SQL, ("graph",)),
        QueryDef("graph_triangles", _graph_triangles, _TRI_SQL, ("graph",)),
        QueryDef("text_rarity_score", _text_rarity_score, _RARITY_SQL, ("ext",)),
        QueryDef(
            "ts_downsample_maxarea", _ts_downsample_maxarea, _DOWNSAMPLE_SQL, ("ts",)
        ),
    )
}

"""Extension query registry: dedup, similarity search, text analysis,
multimodal (north-star operators, BASELINE.json).

The DuckDB oracle SQL for signature-based operators (MinHash, SimHash,
LSH) is *generated from the same constants* as the Spark implementation
(ext/dedup.py, ext/similarity.py), so both engines compute bit-identical
integer signatures — the oracle verifies the whole pipeline exactly, not
just row counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .ext import dedup as D
from .ext import multimodal as MM
from .ext import similarity as S
from .ext import text as TX
from .registry_util import (
    QueryDef,
    shared_minhash_cand_stats,
    shared_minhash_clusters,
    shared_minhash_signatures,
    t,
)

# ------------------------------------------------------------ SQL atoms

_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"
_HASH = "('0x' || substr(md5({s}), 1, 8))::BIGINT"


def _sql_shingles(toks: str = "toks", k: int = D.SHINGLE_K) -> str:
    parts = " || ' ' || ".join(f"{toks}[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN len({toks}) >= {k} THEN "
        f"list_distinct(list_transform(range(1, len({toks}) - {k - 2}), i -> {parts})) "
        f"ELSE [array_to_string({toks}, ' ')] END"
    )


def _sql_sig_cols() -> str:
    cols = []
    for i in range(D.MINHASH_K):
        a, b = D.MINHASH_A[i], D.MINHASH_B[i]
        cols.append(
            f"list_min(list_transform(shd, h -> ({a} * h + {b}) % {D.MERSENNE_P})) AS s{i}"
        )
    return ", ".join(cols)


def _sql_band_rows() -> str:
    rows = []
    for bi in range(D.LSH_BANDS):
        parts = ", ".join(
            f"CAST(s{bi * D.LSH_ROWS + j} AS VARCHAR)" for j in range(D.LSH_ROWS)
        )
        rows.append(
            f"SELECT doc_id, {bi} AS band_idx, md5(concat_ws('-', {parts})) AS key FROM sig"
        )
    return " UNION ALL ".join(rows)


_SQL_DOC_SHINGLES = f"""
tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
shs AS (SELECT doc_id, {_sql_shingles()} AS sh FROM tok),
sh AS (SELECT doc_id,
              list_distinct(list_transform(sh, s -> {_HASH.format(s='s')})) AS shd
       FROM shs)
"""

_SQL_JACCARD_TAIL = """
pairs AS (
  SELECT doc_a, doc_b,
         len(list_intersect(x.shd, y.shd))::DOUBLE
           / (len(x.shd) + len(y.shd) - len(list_intersect(x.shd, y.shd))) AS j
  FROM cand JOIN sh x ON x.doc_id = cand.doc_a
            JOIN sh y ON y.doc_id = cand.doc_b)
SELECT doc_a, doc_b, floor(j * 10000 + 0.5) / 10000.0 AS jaccard
FROM pairs WHERE j >= 0.5
"""

_MINHASH_SQL = f"""
WITH {_SQL_DOC_SHINGLES},
sig AS (SELECT doc_id, {_sql_sig_cols()} FROM sh
        WHERE len(list_filter(shd, h -> h IS NOT NULL)) > 0),
bands AS ({_sql_band_rows()}),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b
           ON a.band_idx = b.band_idx AND a.key = b.key AND a.doc_id < b.doc_id),
{_SQL_JACCARD_TAIL}
"""

_NGRAM_SQL = f"""
WITH {_SQL_DOC_SHINGLES},
ex AS (SELECT doc_id, unnest(shd) AS s FROM sh),
hot AS (SELECT s FROM ex GROUP BY s HAVING count(*) > {D.NGRAM_MAX_DF}),
exf AS (SELECT * FROM ex WHERE s NOT IN (SELECT s FROM hot)),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM exf a JOIN exf b ON a.s = b.s AND a.doc_id < b.doc_id),
{_SQL_JACCARD_TAIL}
"""


def _sql_simhash() -> str:
    bit_terms = []
    for j in range(D.SIMHASH_BITS):
        bit_terms.append(
            f"CASE WHEN list_sum(list_transform(th, h -> "
            f"CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END)) > 0 "
            f"THEN {1 << j} ELSE 0 END"
        )
    total = " + ".join(bit_terms)
    return f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
th AS (SELECT doc_id,
              list_transform(list_distinct(toks), x -> {_HASH.format(s='x')}) AS th
       FROM tok)
SELECT doc_id, CAST({total} AS BIGINT) AS simhash FROM th
"""


_EN_LIST = "[" + ", ".join(f"'{w}'" for w in TX.STOPWORDS["en"]) + "]"


def _sql_lang_scores() -> str:
    return ", ".join(
        f"len(list_filter(toks, x -> list_contains(["
        + ", ".join(f"'{w}'" for w in ws)
        + f"], x))) AS {lang}_hits"
        for lang, ws in TX.STOPWORDS.items()
    )


_LANG_SQL = f"""
WITH tok AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
sc AS (SELECT doc_id, lang, toks, {_sql_lang_scores()} FROM tok)
SELECT doc_id, lang AS labeled_lang,
       CASE WHEN en_hits >= greatest(de_hits, es_hits, fr_hits) THEN 'en'
            WHEN de_hits >= greatest(es_hits, fr_hits) THEN 'de'
            WHEN es_hits >= fr_hits THEN 'es'
            ELSE 'fr' END AS predicted_lang,
       floor((en_hits::DOUBLE / len(toks)) * 10000 + 0.5) / 10000.0 AS en_ratio4
FROM sc
"""

_QUALITY_SQL = f"""
WITH tok AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
SELECT doc_id,
       length(text) AS n_chars_c,
       len(toks) AS n_tokens,
       floor((least(len(toks)::DOUBLE / 100.0, 1.0) * 0.4
              + (len(list_filter(toks, x -> list_contains({_EN_LIST}, x)))::DOUBLE
                 / len(toks)) * 0.3
              + (length(regexp_replace(text, '[^a-z]', '', 'g'))::DOUBLE
                 / length(text)) * 0.3) * 10000 + 0.5) / 10000.0 AS quality4
FROM tok
"""

# --------------------------------------------------- similarity SQL

_EMB_D = "list_transform(embedding, x -> x::DOUBLE)"


def _sql_lsh_bucket(planes: list[list[float]] | None = None) -> str:
    terms = []
    for i, plane in enumerate(planes if planes is not None else S.HYPERPLANES):
        lit = "[" + ", ".join(repr(c) for c in plane) + "]"
        terms.append(f"CASE WHEN list_dot_product(v, {lit}) > 0 THEN {1 << i} ELSE 0 END")
    return " + ".join(terms)


# Bucketed near-dup pairs: candidates only within a shared LSH bucket —
# mirrors cosine_pairs_bucketed (the registered scale path; the brute
# all-pairs form survives only as the pytest cross-check in
# tests/test_scale_ops.py).
_COS_PAIRS_BUCKETED_SQL = f"""
WITH e AS (SELECT vec_id, {_EMB_D} AS v FROM embeddings WHERE vec_id % 5 = 0),
n AS (SELECT * FROM (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
                            CAST({_sql_lsh_bucket()} AS BIGINT) AS bucket FROM e)
      WHERE nrm > 0),
p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
      FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT vec_a, vec_b, floor(cos * 10000 + 0.5) / 10000.0 AS cos4
FROM p WHERE cos >= 0.3
"""

_TOPK_SQL = f"""
WITH e AS (SELECT vec_id, {_EMB_D} AS v FROM embeddings),
n AS (SELECT * FROM (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
      WHERE nrm > 0),
s AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
      FROM (SELECT * FROM n WHERE vec_id < 10) q,
           (SELECT * FROM n WHERE vec_id >= 10) c)
SELECT query_id, cand_id,
       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id ASC) AS rnk,
       floor(cos * 10000 + 0.5) / 10000.0 AS cos4
FROM s
QUALIFY rnk <= 5
"""

_LSH_BUCKET_SQL = f"""
WITH e AS (SELECT vec_id, {_EMB_D} AS v FROM embeddings),
b AS (SELECT vec_id, CAST({_sql_lsh_bucket()} AS BIGINT) AS bucket FROM e)
SELECT bucket, count(*) AS n_vecs FROM b GROUP BY bucket
"""

# ------------------------------------------------------- spark callables


def _dedup_exact(spark, sf_dir):
    """Exact dedup via content-hash groupBy (the O(N) scale path)."""
    return D.exact_dedup_groups(t(spark, sf_dir, "documents"), "doc_id", "text")


def _dedup_minhash(spark, sf_dir):
    """MinHash(32) + LSH(8×4) near-dup pairs, exact-Jaccard verified —
    read from the materialized candidate-stats stage (r10): the band
    self-join + shingle-array verify ran once per process for the whole
    dedup family; this key is a scan + threshold filter."""
    return D.near_dups_from_pair_stats(
        shared_minhash_cand_stats(spark, sf_dir), 0.5
    )


def _dedup_ngram(spark, sf_dir):
    """Exact 3-word-shingle Jaccard pairs (shared-shingle candidates)."""
    return D.ngram_jaccard_pairs(t(spark, sf_dir, "documents"), "doc_id", "text", 0.5)


def _dedup_simhash(spark, sf_dir):
    """32-bit SimHash signature per document."""
    docs = t(spark, sf_dir, "documents")
    th = TX.token_hashes(F.array_distinct(TX.tokens(F.col("text"))))
    return docs.select("doc_id", D.simhash(th).alias("simhash"))


def _dedup_embedding_cosine(spark, sf_dir):
    """Embedding near-dup pairs (cosine ≥ 0.3) on a deterministic
    sub-sample — LSH-bucketed candidate generation (equi-join on the
    bucket id, never all-pairs); exact cosine verify within buckets."""
    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0)
    return S.cosine_pairs_bucketed(emb, threshold=0.3)


def _ann_topk(spark, sf_dir):
    """Brute-force cosine top-5: query set broadcast against candidates."""
    emb = t(spark, sf_dir, "embeddings")
    out = S.cosine_topk(emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10))
    return out.withColumnRenamed("rank", "rnk")


def _ann_lsh(spark, sf_dir):
    """Hyperplane-LSH bucket histogram (the ANN scale path)."""
    b = S.lsh_buckets(t(spark, sf_dir, "embeddings"))
    return b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_vecs"))


# BPE-ish pre-tokenizer: letter runs | digit runs | single punctuation —
# the GPT-2-style split shape, minus byte-level merges. Character classes
# only, so Java and RE2 regex dialects agree exactly.
BPEISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def _text_token_count(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPEISH_PATTERN), 0)).alias(
            "n_subwords"
        ),
        F.length("text").alias("n_chars_c"),
    )


def _ann_lsh_topk(spark, sf_dir):
    """End-to-end LSH-bucketed ANN: score only within shared buckets."""
    emb = t(spark, sf_dir, "embeddings")
    return S.lsh_bucketed_topk(
        emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10)
    )


def _ann_ivf_topk(spark, sf_dir):
    """IVF ANN: inverted-file cells from a deterministic coarse
    quantizer, nprobe=2 probe, exact scoring within probed cells."""
    emb = t(spark, sf_dir, "embeddings")
    return S.ivf_topk(
        emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10)
    )


# Mirrors ivf_topk exactly: same centroid id range, same cos op order
# (list_dot_product is the same sequential fold as zip_with+aggregate),
# same (cos DESC, id ASC) tie-breaks. The Spark side resolves the
# n_nearest=1 argmax as max(struct(cos, -cid)) — equivalent to the
# row_number()=1 form here when cos is NaN-free (nonzero norms).
_IVF_TOPK_SQL = f"""
WITH e AS (SELECT vec_id, {_EMB_D} AS v FROM embeddings),
n AS (SELECT * FROM (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
      WHERE nrm > 0),
cand AS (SELECT * FROM n WHERE vec_id >= 10),
cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn
         FROM cand WHERE vec_id >= {S.IVF_CENTROID_LO} AND vec_id < {S.IVF_CENTROID_HI}),
ca AS (SELECT vec_id, cid,
              list_dot_product(v, cv) / (nrm * cn) AS ccos,
              row_number() OVER (PARTITION BY vec_id
                                 ORDER BY list_dot_product(v, cv) / (nrm * cn) DESC,
                                          cid ASC) AS pr
       FROM cand, cent),
cand_cell AS (SELECT vec_id, cid AS cell FROM ca WHERE pr = 1),
qn AS (SELECT * FROM n WHERE vec_id < 10),
qa AS (SELECT qn.vec_id, cid,
              row_number() OVER (PARTITION BY qn.vec_id
                                 ORDER BY list_dot_product(qn.v, cv) / (qn.nrm * cn) DESC,
                                          cid ASC) AS pr
       FROM qn, cent),
q_cell AS (SELECT vec_id, cid AS cell FROM qa WHERE pr <= {S.IVF_NPROBE}),
s AS (SELECT qc.vec_id AS query_id, c.vec_id AS cand_id,
             list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
      FROM q_cell qc
      JOIN qn q ON qc.vec_id = q.vec_id
      JOIN cand_cell cc ON qc.cell = cc.cell
      JOIN cand c ON cc.vec_id = c.vec_id)
SELECT query_id, cand_id,
       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id ASC) AS rnk,
       floor(cos * 10000 + 0.5) / 10000.0 AS cos4
FROM s
QUALIFY rnk <= 5
"""


_LSH_TOPK_SQL = f"""
WITH e AS (SELECT vec_id, {_EMB_D} AS v FROM embeddings),
n AS (SELECT * FROM (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
                            CAST({_sql_lsh_bucket()} AS BIGINT) AS bucket FROM e)
      WHERE nrm > 0),
s AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
      FROM (SELECT * FROM n WHERE vec_id < 10) q
      JOIN (SELECT * FROM n WHERE vec_id >= 10) c USING (bucket))
SELECT query_id, cand_id,
       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id ASC) AS rnk,
       floor(cos * 10000 + 0.5) / 10000.0 AS cos4
FROM s
QUALIFY rnk <= 5
"""


def _ann_lsh_multitable(spark, sf_dir):
    """Multi-table LSH ANN: candidates collide in ANY of the 3
    hyperplane tables; recall 1-(1-p^r)^L for the same equi-join shape."""
    emb = t(spark, sf_dir, "embeddings")
    return S.lsh_multitable_topk(
        emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10)
    )


def _multitable_sql() -> str:
    buckets = ", ".join(
        f"CAST({_sql_lsh_bucket(p)} AS BIGINT) AS bucket{i}"
        for i, p in enumerate(S.HYPERPLANE_TABLES)
    )
    unions = " UNION ".join(
        f"SELECT q.vec_id AS query_id, c.vec_id AS cand_id "
        f"FROM q JOIN c ON q.bucket{i} = c.bucket{i}"
        for i in range(len(S.HYPERPLANE_TABLES))
    )
    return f"""
WITH e AS (SELECT vec_id, {_EMB_D} AS v FROM embeddings),
n AS (SELECT * FROM (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
                            {buckets} FROM e)
      WHERE nrm > 0),
q AS (SELECT * FROM n WHERE vec_id < 10),
c AS (SELECT * FROM n WHERE vec_id >= 10),
cand AS ({unions}),
s AS (SELECT cand.query_id, cand.cand_id,
             list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
      FROM cand JOIN q ON cand.query_id = q.vec_id
                JOIN c ON cand.cand_id = c.vec_id)
SELECT query_id, cand_id,
       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id ASC) AS rnk,
       floor(cos * 10000 + 0.5) / 10000.0 AS cos4
FROM s
QUALIFY rnk <= 5
"""


def _dedup_clusters(spark, sf_dir):
    """Iterative: near-dup pairs -> connected components (min-label
    propagation) -> dedup clusters, read from the materialized cluster
    stage (r10) — the CC fixpoint runs once per process for the three
    cluster consumers. The oracle walks the same pair graph with a
    recursive CTE."""
    return shared_minhash_clusters(spark, sf_dir)


def _dedup_clusters_sql() -> str:
    # same pair graph as _MINHASH_SQL, then min-reachable-label per node
    return f"""
WITH RECURSIVE pairs AS (SELECT * FROM ({_MINHASH_SQL.strip()})),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION ALL SELECT doc_b AS a, doc_a AS b FROM pairs),
reach(node, label) AS (
    SELECT a, a FROM edges
    UNION
    SELECT e.a, r.label FROM reach r JOIN edges e ON e.b = r.node
)
SELECT node AS doc, min(label) AS cluster FROM reach GROUP BY node
"""


def _text_language_id(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").withColumn("toks", TX.tokens(F.col("text")))
    en_ratio = TX.stopword_hits(F.col("toks"), TX.STOPWORDS["en"]).cast("double") / F.size(
        "toks"
    )
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        TX.predict_language(F.col("toks")).alias("predicted_lang"),
        (F.floor(en_ratio * 10000 + 0.5) / 10000.0).alias("en_ratio4"),
    )


def _text_quality(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").withColumn("toks", TX.tokens(F.col("text")))
    q = TX.quality_score(F.col("text"), F.col("toks"))
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_c"),
        F.size("toks").alias("n_tokens"),
        (F.floor(q * 10000 + 0.5) / 10000.0).alias("quality4"),
    )


def _text_fingerprint(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").withColumn("toks", TX.tokens(F.col("text")))
    return docs.select("doc_id", TX.fingerprint(F.col("toks")).alias("fp"))


def _text_tfidf(spark, sf_dir):
    """Corpus TF-IDF: two aggregations (term-freq, doc-freq), vocab
    broadcast back — the classic feature-extraction pass."""
    return TX.tfidf(t(spark, sf_dir, "documents"), "doc_id", "text", min_df=2)


_TFIDF_SQL = f"""
WITH tok AS (SELECT doc_id AS doc, unnest({_TOKS}) AS term FROM documents),
tf AS (SELECT doc, term, count(*) AS tf_raw FROM tok GROUP BY doc, term),
dl AS (SELECT doc, sum(tf_raw) AS len FROM tf GROUP BY doc),
dfreq AS (SELECT term, count(DISTINCT doc) AS df FROM tf GROUP BY term
          HAVING count(DISTINCT doc) >= 2),
nd AS (SELECT count(*) AS n FROM documents)
SELECT tf.doc, tf.term, tf.tf_raw, dfreq.df,
       floor((tf.tf_raw::DOUBLE / dl.len)
             * ln((nd.n::DOUBLE + 1.0) / (dfreq.df::DOUBLE + 1.0)) * 1e8 + 0.5) / 1e8
         AS tfidf8
FROM tf JOIN dfreq USING (term) JOIN dl USING (doc) CROSS JOIN nd
"""


def _text_repetition(spark, sf_dir):
    """Gopher-style repetition/shape quality stats per document."""
    return TX.repetition_stats(t(spark, sf_dir, "documents"), "doc_id", "text")


_REPETITION_SQL = f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (SELECT doc_id, toks,
             CASE WHEN len(toks) >= 2
                  THEN list_transform(range(1, len(toks)),
                                      i -> toks[i] || ' ' || toks[i + 1])
                  ELSE []::VARCHAR[] END AS grams
      FROM tok)
SELECT doc_id,
       len(grams) AS n_2grams,
       len(list_distinct(grams)) AS n_distinct_2grams,
       floor(CASE WHEN len(grams) > 0
                  THEN (len(grams) - len(list_distinct(grams)))::DOUBLE / len(grams)
                  ELSE 0.0 END * 10000 + 0.5) / 10000.0 AS dup_2gram_frac4,
       list_max(list_transform(toks, x -> length(x))) AS max_word_len,
       floor(CASE WHEN len(toks) > 0
                  THEN list_sum(list_transform(toks, x -> length(x)))::DOUBLE
                       / len(toks)
                  ELSE 0.0 END * 10000 + 0.5) / 10000.0 AS mean_word_len4
FROM g
"""


def _text_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag corpus docs sharing >=1 shingle
    with the benchmark subset (deterministic stand-in: doc_id % 50 == 0);
    benchmark docs themselves are excluded from the corpus side."""
    docs = t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    return TX.benchmark_overlap(corpus, bench, "doc_id", "text")


_DECONTAMINATE_SQL = f"""
WITH {_SQL_DOC_SHINGLES},
bench AS (SELECT DISTINCT unnest(shd) AS s FROM sh WHERE doc_id % 50 = 0),
corpus AS (SELECT doc_id, unnest(shd) AS s FROM sh WHERE doc_id % 50 <> 0)
SELECT doc_id, count(*) AS n_shared_shingles
FROM corpus JOIN bench USING (s)
GROUP BY doc_id
"""


def _sample_stratified(spark, sf_dir):
    """Deterministic stratified sampling by content hash — the
    reproducible way to downsample training data: the keep-decision is a
    pure function of (event_id), so it is stable under repartitioning,
    re-runs, and engine changes (no RNG state). Per-stratum rates:
    clicks 10%, views 20%, everything else 100%."""
    ev = t(spark, sf_dir, "events")
    bucket = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10
                    ).cast("long") % 100
    rate = (
        F.when(F.col("event_type") == "click", 10)
        .when(F.col("event_type") == "view", 20)
        .otherwise(100)
    )
    return (
        ev.filter(bucket < rate)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


_SAMPLE_SQL = """
WITH b AS (SELECT event_type,
                  CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT)
                    % 100 AS bucket
           FROM events)
SELECT event_type, count(*) AS n_kept
FROM b
WHERE bucket < CASE event_type WHEN 'click' THEN 10 WHEN 'view' THEN 20 ELSE 100 END
GROUP BY event_type
"""


def _multimodal_metadata(spark, sf_dir):
    """Binary-payload convention: metadata pass (sizes + checksums) over
    the media table — no decode, pure JVM."""
    media = MM.text_as_media(t(spark, sf_dir, "documents"), "doc_id", "text")
    return MM.media_stats(media)


def _multimodal_decode(spark, sf_dir):
    """REAL byte-level decode loop, hash-verified end to end: documents
    become deterministic binary payloads (even doc_id → PCM WAV,
    doc_id ≡ 1 mod 4 → PPM P6, doc_id ≡ 3 mod 4 → PNG with cycling
    scanline filters; parameters derived from (doc_id, length)), then
    ``decode_media`` recovers every format field by parsing ONLY the
    bytes — RIFF chunk walk, PPM header scan, PNG IHDR parse. The
    oracle computes the same fields arithmetically, so any
    encode/decode bug flips the driver hash. Both mapInPandas stages
    are Arrow-batched and shuffle-free (payloads never leave their
    input partition)."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n_chars")
    )
    return MM.decode_media(MM.synthesize_media(docs, png_mod4=True))


def _ann_knn_classify(spark, sf_dir):
    """k-NN majority-label vote: brute top-5 neighbors, then an
    aggregate argmax over the votes (most votes, smallest label)."""
    emb = t(spark, sf_dir, "embeddings")
    return S.knn_classify(
        emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10)
    )


_KNN_CLASSIFY_SQL = f"""
WITH e AS (SELECT vec_id, label, {_EMB_D} AS v FROM embeddings),
n AS (SELECT * FROM (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm
                     FROM e)
      WHERE nrm > 0),
s AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id, c.label AS lbl,
             list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
      FROM (SELECT * FROM n WHERE vec_id < 10) q,
           (SELECT * FROM n WHERE vec_id >= 10) c),
tk AS (SELECT * FROM (
           SELECT query_id, cand_id, lbl,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, cand_id ASC) AS rnk
           FROM s)
       WHERE rnk <= 5),
v AS (SELECT query_id, lbl, count(*) AS votes FROM tk GROUP BY query_id, lbl)
SELECT query_id, lbl::INT AS predicted_label, votes
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY votes DESC, lbl ASC) AS pr FROM v)
WHERE pr = 1
"""


def _embed_cluster_assign(spark, sf_dir):
    """Deterministic k-means E-step: nearest-seed assignment of every
    vector (seeds = lowest-id vector per label class)."""
    return S.seed_cluster_assign(t(spark, sf_dir, "embeddings"))


_CLUSTER_ASSIGN_SQL = f"""
WITH e AS (SELECT vec_id, label, {_EMB_D} AS v FROM embeddings),
n AS (SELECT * FROM (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm
                     FROM e)
      WHERE nrm > 0),
sid AS (SELECT label AS seed_lbl, min(vec_id) AS s_id FROM n GROUP BY label),
seeds AS (SELECT sid.seed_lbl AS cid, n.v AS cv, n.nrm AS cn
          FROM sid JOIN n ON n.vec_id = sid.s_id),
sc AS (SELECT n.vec_id, seeds.cid,
              list_dot_product(n.v, seeds.cv) / (n.nrm * seeds.cn) AS ccos,
              row_number() OVER (
                  PARTITION BY n.vec_id
                  ORDER BY list_dot_product(n.v, seeds.cv) / (n.nrm * seeds.cn) DESC,
                           seeds.cid ASC) AS pr
       FROM n, seeds)
SELECT vec_id, cid::INT AS cluster, floor(ccos * 10000 + 0.5) / 10000.0 AS cos4
FROM sc WHERE pr = 1
"""


def _text_length_histogram(spark, sf_dir):
    """Log2-bucketed token-length histogram — the length-distribution
    audit every corpus build starts with. Integer-exact bucketing via
    the binary-digit count (length(bin(n)) - 1 == floor(log2 n)) so
    both engines agree without floating-point log."""
    docs = t(spark, sf_dir, "documents")
    n_tokens = F.size(TX.tokens(F.col("text")))
    b = docs.select(n_tokens.alias("n_tokens")).filter(F.col("n_tokens") > 0)
    return (
        b.withColumn(
            "bucket", (F.length(F.bin(F.col("n_tokens").cast("long"))) - 1)
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
    )


_LENGTH_HISTOGRAM_SQL = f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
b AS (SELECT len(toks) AS n_tokens, length(bin(len(toks))) - 1 AS bucket
      FROM tok WHERE len(toks) > 0)
SELECT bucket, count(*) AS n_docs, min(n_tokens) AS min_tokens,
       max(n_tokens) AS max_tokens,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM b GROUP BY bucket
"""


def _text_quality_filter(spark, sf_dir):
    """C4/Gopher-style composite quality GATE (the score variant above
    ranks; this one filters): keep docs with >= 30 tokens, unique-token
    ratio >= 0.25, mean token length in [2, 8], and at least one
    stopword. All predicates are integer-exact or a single IEEE double
    division of exact ints, so both engines make identical keep
    decisions."""
    docs = t(spark, sf_dir, "documents").withColumn("toks", TX.tokens(F.col("text")))
    n_tokens = F.size("toks").cast("long")
    n_distinct = F.size(F.array_distinct("toks")).cast("long")
    n_chars_ns = F.length(F.translate("text", " ", "")).cast("long")
    distinct_ratio = n_distinct.cast("double") / n_tokens
    mean_len = n_chars_ns.cast("double") / n_tokens
    has_stop = F.array_contains("toks", "the") | F.array_contains("toks", "a")
    return (
        docs.filter(n_tokens > 0)
        .filter(
            (n_tokens >= 30)
            & (distinct_ratio >= 0.25)
            & (mean_len >= 2.0)
            & (mean_len <= 8.0)
            & has_stop
        )
        .select(
            "doc_id",
            n_tokens.alias("n_tokens"),
            (F.floor(distinct_ratio * 10000 + 0.5) / 10000.0).alias("distinct_ratio4"),
            (F.floor(mean_len * 10000 + 0.5) / 10000.0).alias("mean_token_len4"),
        )
    )


_QUALITY_FILTER_SQL = f"""
WITH tok AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
m AS (SELECT doc_id,
             len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_distinct,
             length(replace(text, ' ', '')) AS n_chars_ns,
             (list_contains(toks, 'the') OR list_contains(toks, 'a')) AS has_stop
      FROM tok WHERE len(toks) > 0)
SELECT doc_id, n_tokens,
       floor((n_distinct::DOUBLE / n_tokens) * 10000 + 0.5) / 10000.0
         AS distinct_ratio4,
       floor((n_chars_ns::DOUBLE / n_tokens) * 10000 + 0.5) / 10000.0
         AS mean_token_len4
FROM m
WHERE n_tokens >= 30
  AND n_distinct::DOUBLE / n_tokens >= 0.25
  AND n_chars_ns::DOUBLE / n_tokens >= 2.0
  AND n_chars_ns::DOUBLE / n_tokens <= 8.0
  AND has_stop
"""


EXT_QUERIES: dict[str, QueryDef] = {
    q.name: q
    for q in [
        QueryDef(
            "dedup_exact_hash",
            _dedup_exact,
            """SELECT md5(text) AS fingerprint, min(doc_id) AS canonical_id,
                      count(*) AS n_copies
               FROM documents GROUP BY 1""",
        ),
        QueryDef("dedup_minhash_lsh", _dedup_minhash, _MINHASH_SQL),
        QueryDef("dedup_ngram_jaccard", _dedup_ngram, _NGRAM_SQL),
        QueryDef("dedup_simhash", _dedup_simhash, _sql_simhash()),
        QueryDef("dedup_embedding_cosine", _dedup_embedding_cosine, _COS_PAIRS_BUCKETED_SQL),
        QueryDef("dedup_clusters", _dedup_clusters, _dedup_clusters_sql()),
        QueryDef("ann_cosine_topk", _ann_topk, _TOPK_SQL),
        QueryDef("ann_lsh_bucketed", _ann_lsh, _LSH_BUCKET_SQL),
        QueryDef("ann_lsh_topk", _ann_lsh_topk, _LSH_TOPK_SQL),
        QueryDef("ann_ivf_topk", _ann_ivf_topk, _IVF_TOPK_SQL),
        QueryDef("ann_lsh_multitable", _ann_lsh_multitable, _multitable_sql()),
        QueryDef("text_token_count", _text_token_count, None),  # sql set below
        QueryDef("text_tfidf", _text_tfidf, _TFIDF_SQL),
        QueryDef("sample_stratified", _sample_stratified, _SAMPLE_SQL),
        QueryDef("text_language_id", _text_language_id, _LANG_SQL),
        QueryDef("text_quality_score", _text_quality, _QUALITY_SQL),
        QueryDef("text_repetition", _text_repetition, _REPETITION_SQL),
        QueryDef("text_decontaminate", _text_decontaminate, _DECONTAMINATE_SQL),
        QueryDef("ann_knn_classify", _ann_knn_classify, _KNN_CLASSIFY_SQL),
        QueryDef("embed_cluster_assign", _embed_cluster_assign, _CLUSTER_ASSIGN_SQL),
        QueryDef("text_length_histogram", _text_length_histogram, _LENGTH_HISTOGRAM_SQL),
        QueryDef("text_quality_filter", _text_quality_filter, _QUALITY_FILTER_SQL),
        QueryDef(
            "text_fingerprint",
            _text_fingerprint,
            f"""WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
                SELECT doc_id,
                       md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp
                FROM tok""",
        ),
        QueryDef(
            "multimodal_metadata",
            _multimodal_metadata,
            """SELECT doc_id AS media_id, 'text' AS kind,
                      octet_length(encode(text)) AS n_bytes, md5(text) AS checksum
               FROM documents""",
        ),
        QueryDef(
            "multimodal_decode",
            _multimodal_decode,
            """WITH d AS (SELECT doc_id, length(text) AS n FROM documents)
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 2 = 0 THEN 'audio' ELSE 'image' END AS kind,
       CASE WHEN doc_id % 2 = 0 THEN 'audio/wav'
            WHEN doc_id % 4 = 3 THEN 'image/png'
            ELSE 'image/x-portable-pixmap' END AS mime,
       CASE WHEN doc_id % 2 = 0 THEN NULL
            ELSE CAST(n % 32 + 1 AS INTEGER) END AS width,
       CASE WHEN doc_id % 2 = 0 THEN NULL
            ELSE CAST((doc_id // 2) % 16 + 1 AS INTEGER) END AS height,
       CASE WHEN doc_id % 2 = 0 THEN CAST(8000 + (doc_id % 4) * 4000 AS INTEGER)
            ELSE NULL END AS sample_rate,
       CASE WHEN doc_id % 2 = 0 THEN CAST(1 + (doc_id // 2) % 2 AS INTEGER)
            ELSE NULL END AS n_channels,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 16 ELSE 8 END AS INTEGER) AS bits,
       CAST(CASE WHEN doc_id % 2 = 0 THEN n % 256 + 16 ELSE NULL END
            AS BIGINT) AS n_samples
FROM d""",
        ),
    ]
}

EXT_QUERIES["text_token_count"].sql = f"""
WITH tok AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct_tokens,
       len(regexp_extract_all(text, '{BPEISH_PATTERN}')) AS n_subwords,
       length(text) AS n_chars_c
FROM tok
"""

"""Similarity search over embedding columns (north-star extension):
brute-force cosine top-k (baseline) and hyperplane-LSH bucketing (the
scale path).

Scale design:
- top-k: the query set is broadcast; the candidate scan streams once
  through executors with a per-partition partial top-k (window row_number
  after a partial filter) — no N² shuffle, no collect.
- LSH: 8 signed random hyperplanes → 256 buckets; candidates only
  within a bucket. At 100 TB you recall-boost with multiple tables
  and/or multi-probe; parameters are constants here so the oracle can
  reproduce the exact bucket ids.

All dot products run in double precision via JVM builtin
zip_with/aggregate (codegen'd, no UDF).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EMB_DIM = 64
LSH_PLANES = 8
_rng = random.Random(7)
# 3-decimal literals keep the SQL mirror short and exactly representable.
HYPERPLANES: list[list[float]] = [
    [round(_rng.random() * 2 - 1, 3) for _ in range(EMB_DIM)] for _ in range(LSH_PLANES)
]

# Multi-table LSH: L independent hyperplane sets. A near neighbor
# missed by one table's bucketing is recalled by another — recall
# 1-(1-p^r)^L instead of p^r — while candidate generation stays
# equi-join-shaped per table. Table 0 IS the single-table HYPERPLANES
# (seeded stream continues, so adding tables never changes table 0's
# bucket ids or any existing oracle).
LSH_TABLES = 3
HYPERPLANE_TABLES: list[list[list[float]]] = [HYPERPLANES] + [
    [[round(_rng.random() * 2 - 1, 3) for _ in range(EMB_DIM)] for _ in range(LSH_PLANES)]
    for _ in range(LSH_TABLES - 1)
]


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — mirrors the oracle's
    list_dot_product element order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(vec: Column) -> Column:
    return F.sqrt(dot(vec, vec))


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    return dot(a, b) / (norm_a * norm_b)


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Pre-normalize once per row — norms are computed N times, not N².

    Zero-norm vectors are dropped: cos against them is 0/0 = NaN, and
    Spark sorts NaN as the GREATEST double, so one degenerate vector
    would rank first in every desc-ordered top-k. The oracle SQL mirrors
    the same ``nrm > 0`` guard. The guard here is ``exists(x != 0)``
    rather than ``nrm > 0`` so the O(d) dot product runs ONCE per row
    (a filter on the derived ``nrm`` column gets substituted by the
    optimizer and re-evaluates the whole fold); for finite inputs the
    two predicates are identical, and exists short-circuits on the
    first nonzero element."""
    return (
        df.withColumn("vec", as_double(F.col(vec_col)))
        .filter(F.exists(F.col(vec_col), lambda x: x != 0))
        .withColumn("nrm", norm(F.col("vec")))
    )


def cosine_pairs(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", threshold: float = 0.3
) -> DataFrame:
    """All-pairs cosine ≥ threshold (embedding near-dup detection).
    Brute force (nested-loop theta-join) — the CORRECTNESS BASELINE
    only, used by tests to cross-check ``cosine_pairs_bucketed``; never
    register this as the production operator (O(N²) at scale)."""
    e = with_norm(df, vec_col).select(F.col(id_col).alias("id"), "vec", "nrm")
    a = e.select(F.col("id").alias("vec_a"), F.col("vec").alias("va"), F.col("nrm").alias("na"))
    b = e.select(F.col("id").alias("vec_b"), F.col("vec").alias("vb"), F.col("nrm").alias("nb"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    cos = cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
    return (
        pairs.withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", (F.floor(F.col("cos") * 10000 + 0.5) / 10000.0).alias("cos4"))
    )


def cosine_pairs_bucketed(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", threshold: float = 0.3
) -> DataFrame:
    """Embedding near-dup pairs, the scale path: candidates come from an
    EQUI-join on the hyperplane-LSH bucket id and only same-bucket pairs
    pay the exact-cosine verify — work tracks bucket collision counts,
    not N². The join shuffles on a 64-bit bucket key (AQE splits hot
    buckets). Recall: pairs split across buckets are missed; production
    raises it with multiple hyperplane tables / multi-probe — here the
    parameters are fixed constants so the oracle reproduces bucket ids
    exactly. ``cosine_pairs`` (brute force) is the test oracle for the
    within-bucket results."""
    e = with_norm(df, vec_col).select(
        F.col(id_col).alias("id"), "vec", "nrm", lsh_bucket(F.col("vec")).alias("bucket")
    )
    a = e.select(
        F.col("id").alias("vec_a"), F.col("vec").alias("va"),
        F.col("nrm").alias("na"), "bucket",
    )
    b = e.select(
        F.col("id").alias("vec_b"), F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"), "bucket",
    )
    pairs = a.join(b, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    cos = cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
    return (
        pairs.withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", (F.floor(F.col("cos") * 10000 + 0.5) / 10000.0).alias("cos4"))
    )


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: broadcast the (small) query set against
    the candidate scan; rank per query with a deterministic tiebreak."""
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("vec").alias("qv"), F.col("nrm").alias("qn")
    )
    c = with_norm(candidates, vec_col).select(
        F.col(id_col).alias("cand_id"), F.col("vec").alias("cv"), F.col("nrm").alias("cn")
    )
    joined = c.crossJoin(F.broadcast(q))
    cos = cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"))
    scored = joined.withColumn("cos", cos)
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "cand_id",
            "rank",
            (F.floor(F.col("cos") * 10000 + 0.5) / 10000.0).alias("cos4"),
        )
    )


def lsh_bucket(vec: Column, planes: list[list[float]] | None = None) -> Column:
    """Signed-random-projection bucket id: bit i = [dot(v, plane_i) > 0]."""
    acc = F.lit(0).cast("long")
    for i, plane in enumerate(planes if planes is not None else HYPERPLANES):
        p = F.array(*[F.lit(c) for c in plane])
        acc = acc + F.when(dot(vec, p) > 0, F.lit(1 << i).cast("long")).otherwise(0)
    return acc


def lsh_buckets(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    e = df.withColumn("vec", as_double(F.col(vec_col)))
    return e.select(F.col(id_col).alias("id"), lsh_bucket(F.col("vec")).alias("bucket"))


# IVF (inverted-file) ANN: a coarse quantizer partitions candidates into
# cells; a query probes only its nprobe nearest cells. Centroids here are
# a fixed, deterministic subset of the data (the shape a kmeans++ seed or
# offline-trained quantizer would have) so the DuckDB oracle can
# reproduce cell ids exactly — the plumbing (assignment, inverted cells,
# probe join) is the real artifact, not the quantizer training.
IVF_CENTROID_LO = 100
IVF_CENTROID_HI = 108  # 8 cells
IVF_NPROBE = 2


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    n_nearest: int = 1,
    carry_vec: bool = False,
) -> DataFrame:
    """Assign each vector to its ``n_nearest`` highest-cosine centroids.

    Scale: centroids broadcast (C rows); the C-way expansion happens
    map-side inside the broadcast join. For ``n_nearest=1`` the argmax
    is an AGGREGATE ``max(struct(cos, -cid))`` — partial-aggregated
    map-side back to one row per vector before the shuffle — not a
    window (which would shuffle the C-expanded set). Tie-break: highest
    cos, then smallest centroid id (struct max compares fields in
    order; -cid makes smaller ids win).
    ``vectors`` must carry (id, vec, nrm) from ``with_norm``.

    ``carry_vec=True`` (n_nearest=1 only) rides (vec, nrm) through the
    argmax struct — the payload fields sit BEHIND the (ccos, neg_cid)
    key and can never decide a comparison (cid is unique per group) —
    so the caller gets (id, cell, vec, nrm) from the ONE aggregate
    shuffle instead of re-joining the assignment back to the vector
    table (a second full-width shuffle of the candidate set, measured
    ~1.5x the whole-query wall at sf0.1).
    """
    cent = centroids.select(
        F.col("id").alias("cid"), F.col("vec").alias("cv"), F.col("nrm").alias("cn")
    )
    scored = vectors.crossJoin(F.broadcast(cent)).withColumn(
        "ccos", cosine(F.col("vec"), F.col("cv"), F.col("nrm"), F.col("cn"))
    )
    if n_nearest == 1:
        fields = [F.col("ccos"), (-F.col("cid")).alias("neg_cid")]
        if carry_vec:
            fields += [F.col("vec"), F.col("nrm")]
        best = scored.groupBy("id").agg(F.max(F.struct(*fields)).alias("b"))
        out = ["id", (-F.col("b.neg_cid")).alias("cell")]
        if carry_vec:
            out += [F.col("b.vec").alias("vec"), F.col("b.nrm").alias("nrm")]
        return best.select(*out)
    if carry_vec:
        raise ValueError("carry_vec is only supported for n_nearest=1")
    w = Window.partitionBy("id").orderBy(F.col("ccos").desc(), F.col("cid").asc())
    return (
        scored.withColumn("pr", F.row_number().over(w))
        .filter(F.col("pr") <= n_nearest)
        .select("id", F.col("cid").alias("cell"))
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN search: candidates live in their single nearest cell
    (the inverted file); each query probes its ``nprobe`` nearest cells
    and scores exactly within them.

    Scale: scoring work drops from |Q|x|C| to the probed-cell fraction
    (~nprobe/cells of the data per query). The probe join broadcasts
    the (tiny) query-cell list and shuffles nothing on the candidate
    side beyond the one partial-aggregated assignment pass; skewed
    cells split under AQE. Centroids are the IVF_CENTROID_* id range of
    the candidate set itself (deterministic offline-quantizer stand-in).
    """
    cand = with_norm(candidates, vec_col).select(
        F.col(id_col).alias("id"), "vec", "nrm"
    )
    cent = cand.filter(
        (F.col("id") >= IVF_CENTROID_LO) & (F.col("id") < IVF_CENTROID_HI)
    )
    q = with_norm(queries, vec_col).select(F.col(id_col).alias("id"), "vec", "nrm")
    q_cells = ivf_assign(q, cent, nprobe)
    # the inverted file comes straight out of the assignment aggregate
    # (carry_vec rides the vector payload through the argmax struct) —
    # no second shuffle join of the candidate table against its cells
    inv = ivf_assign(cand, cent, 1, carry_vec=True).select(
        F.col("id").alias("cand_id"), F.col("vec").alias("cv"),
        F.col("nrm").alias("cn"), "cell",
    )
    probes = q.join(q_cells, "id").select(
        F.col("id").alias("query_id"), F.col("vec").alias("qv"),
        F.col("nrm").alias("qn"), "cell",
    )
    scored = inv.join(F.broadcast(probes), "cell").withColumn(
        "cos", cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "cand_id",
            "rnk",
            (F.floor(F.col("cos") * 10000 + 0.5) / 10000.0).alias("cos4"),
        )
    )


def lsh_bucketed_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """End-to-end ANN search, the scale path: score only within shared
    LSH buckets. The crossJoin of cosine_topk becomes an equi-join on
    the bucket id — candidate work drops from |Q|×|C| to the bucket
    collision count, and the join shuffles on a 64-bit key. Recall is
    governed by the hyperplane count (more tables / multi-probe at
    production scale); results are exact within each bucket."""
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("vec").alias("qv"),
        F.col("nrm").alias("qn"),
        lsh_bucket(F.col("vec")).alias("bucket"),
    )
    c = with_norm(candidates, vec_col).select(
        F.col(id_col).alias("cand_id"),
        F.col("vec").alias("cv"),
        F.col("nrm").alias("cn"),
        lsh_bucket(F.col("vec")).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").withColumn(
        "cos", cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "cand_id",
            "rnk",
            (F.floor(F.col("cos") * 10000 + 0.5) / 10000.0).alias("cos4"),
        )
    )


def lsh_multitable_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table LSH ANN: candidates collide in ANY of the L hyperplane
    tables (union of per-table equi-joins, deduped before scoring), then
    exact cosine + per-query top-k.

    Scale: per-table work is the same bucket-key equi-join as the
    single-table path; L multiplies candidate-generation cost by ~L
    while lifting recall from p^r to 1-(1-p^r)^L — the standard
    recall/cost dial (the other dial, multi-probe, visits neighboring
    buckets of one table). The pair dedup happens BEFORE the dot
    products, so each surviving pair is scored exactly once.
    """
    # all L bucket ids in ONE projection per side, then posexplode to
    # (table, bucket) rows — the minhash band-table shape. Two tricks
    # keep this fast:
    # 1. a per-table join loop would rescan and re-project each side L
    #    times; here the heavy work runs once per row and the join key
    #    is the compound (table, bucket);
    # 2. the L×r×d plane matrix rides in as BROADCAST DATA (a 1-row
    #    crossJoin), not as literals — inlining 1536 literal
    #    coefficients into the expression tree costs whole seconds of
    #    driver-side analysis/codegen per query (measured: 2.3 s for
    #    the 3-table literal tree on 2k rows, i.e. ~all of it planning
    #    overhead), while the higher-order-function form over an array
    #    column keeps the tree tiny and the math identical.
    spark = queries.sparkSession
    tables_df = spark.createDataFrame(
        [(HYPERPLANE_TABLES,)], "tables array<array<array<double>>>"
    )
    plane_idx = F.sequence(F.lit(0), F.lit(LSH_PLANES - 1))

    def buckets_col(vec: Column) -> Column:
        # bucket(table) = Σ_i [dot(vec, plane_i) > 0] * 2^i — bit order
        # identical to lsh_bucket, so table 0 matches the single-table
        # path and every oracle bucket expression
        return F.transform(
            F.col("tables"),
            lambda tbl: F.aggregate(
                F.zip_with(
                    tbl,
                    plane_idx,
                    lambda p, i: F.when(
                        dot(vec, p) > 0, F.pow(F.lit(2.0), i).cast("long")
                    ).otherwise(F.lit(0).cast("long")),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ),
        )

    def tabled(df, id_alias):
        e = with_norm(df, vec_col).select(
            F.col(id_col).alias(id_alias), "vec", "nrm"
        )
        withb = e.crossJoin(F.broadcast(tables_df)).withColumn(
            "buckets", buckets_col(F.col("vec"))
        )
        return withb.select(
            id_alias, "vec", "nrm",
            F.posexplode("buckets").alias("tbl", "bucket"),
        )

    # NOTE (r12, measured): a guide-§8 restructure — dedup on slim
    # (query_id, cand_id) keys, attach candidate payloads once via an
    # equi-join, broadcast query payloads — A/B'd 1.18 (5 reps, same
    # sitting): at this SF the extra candidate scan + attach join cost
    # more than the ~1 KB/collision-row dedup shuffle they remove.
    # REVERTED; at a vector-store scale where collisions fan out per
    # table the slim form wins — revisit with real collision stats.
    qb = tabled(queries, "query_id").select(
        "query_id", F.col("vec").alias("qv"), F.col("nrm").alias("qn"), "tbl", "bucket"
    )
    cb = tabled(candidates, "cand_id").select(
        "cand_id", F.col("vec").alias("cv"), F.col("nrm").alias("cn"), "tbl", "bucket"
    )
    pairs = cb.join(F.broadcast(qb), ["tbl", "bucket"]).select(
        "query_id", "cand_id", "qv", "qn", "cv", "cn"
    )
    # dedup collisions seen by several tables; payload columns are
    # identical across duplicates so any survivor is the right one
    pairs = pairs.dropDuplicates(["query_id", "cand_id"])
    scored = pairs.withColumn(
        "cos", cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "cand_id",
            "rnk",
            (F.floor(F.col("cos") * 10000 + 0.5) / 10000.0).alias("cos4"),
        )
    )


def knn_classify(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-NN majority-vote label classification over an embedding column
    (the standard label-propagation / weak-annotation step of a
    training-data pipeline).

    Scale: the only heavy stage is the neighbor search itself
    (cosine_topk: broadcast query set, one candidate scan). The vote
    runs on |Q|*k rows: labels attach by broadcasting the tiny top-k
    result against the candidate scan (a broadcast equi-join that
    prunes to k*|Q| rows map-side), and the argmax is an aggregate
    ``max(struct(votes, -label))`` — partial-aggregated, never a
    window. Swap in lsh_bucketed_topk / ivf_topk for the search stage
    at scale without touching the vote.

    Tie-break: most votes, then smallest label id.
    """
    topk = cosine_topk(queries, candidates, k=k, id_col=id_col, vec_col=vec_col)
    labels = candidates.select(
        F.col(id_col).alias("cand_id"), F.col(label_col).alias("lbl")
    )
    votes = (
        labels.join(F.broadcast(topk), "cand_id")
        .groupBy("query_id", "lbl")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    best = votes.groupBy("query_id").agg(
        F.max(F.struct(F.col("votes"), (-F.col("lbl")).alias("neg_lbl"))).alias("b")
    )
    return best.select(
        "query_id",
        (-F.col("b.neg_lbl")).cast("int").alias("predicted_label"),
        F.col("b.votes").alias("votes"),
    )


def seed_cluster_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Deterministic k-means E-step: assign every vector to its
    nearest seed centroid by cosine (semantic clustering for corpus
    curation / stratified curriculum sampling).

    Seeds stand in for an offline-trained quantizer the same way
    IVF_CENTROID_* does: the lowest-id vector of each label class,
    reproducible exactly by the SQL oracle. Scale: seeds are k rows
    (broadcast); assignment is ONE scan of the data with the k-way
    centroid expansion map-side, and the argmax is the aggregate
    ``max(struct(cos, -seed))`` — partial-aggregated back to one row
    per vector before any shuffle, never a window over the expanded
    set (the ivf_assign pattern). Tie-break: highest cos, then
    smallest seed label.
    """
    e = with_norm(df, vec_col)
    seed_ids = e.groupBy(label_col).agg(F.min(id_col).alias("sid"))
    seeds = e.join(
        F.broadcast(seed_ids.select(F.col(label_col).alias("seed_lbl"), "sid")),
        F.col(id_col) == F.col("sid"),
    ).select(
        F.col("seed_lbl").alias("cid"),
        F.col("vec").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    scored = (
        e.select(F.col(id_col).alias("id"), "vec", "nrm")
        .crossJoin(F.broadcast(seeds))
        .withColumn("ccos", cosine(F.col("vec"), F.col("cv"), F.col("nrm"), F.col("cn")))
    )
    best = scored.groupBy("id").agg(
        F.max(F.struct(F.col("ccos"), (-F.col("cid")).alias("neg_cid"))).alias("b")
    )
    return best.select(
        F.col("id").alias("vec_id"),
        (-F.col("b.neg_cid")).cast("int").alias("cluster"),
        (F.floor(F.col("b.ccos") * 10000 + 0.5) / 10000.0).alias("cos4"),
    )


def array_profile(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Per-vector audit via higher-order array functions — the
    transform/filter/aggregate/array_max family exercised end-to-end on
    the embedding column, all JVM-side (zero Python row path).

    Every statistic is exact int64 micro-units (floor(x*1e6 + 0.5) per
    element, integer sums), so results are independent of element
    order and bit-identical across engines: n_dims, positive-element
    count, L1 norm, and max element.
    """
    xd = "CAST(x AS DOUBLE)"
    return df.select(
        F.col(id_col),
        F.size(F.col(vec_col)).cast("long").alias("n_dims"),
        F.expr(f"CAST(size(filter({vec_col}, x -> x > 0)) AS BIGINT)").alias("n_pos"),
        F.expr(
            f"aggregate(transform({vec_col}, x -> CAST(floor(abs({xd})*1e6 + 0.5) AS BIGINT)),"
            " 0L, (a, x) -> a + x)"
        ).alias("l1_micro"),
        F.expr(
            f"array_max(transform({vec_col}, x -> CAST(floor({xd}*1e6 + 0.5) AS BIGINT)))"
        ).alias("max_micro"),
    )


def sq8_codes(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Scalar-quantize each vector to int codes 0..255 per dimension
    (FAISS SQ8): per-dim [min, max] over the corpus maps each element to
    ``floor((x - mn)/(mx - mn) * 255 + 0.5)``; a constant dimension
    codes to 0. Returns (id, c: array<long>).

    The per-dim bounds are ONE posexplode + groupBy over (rows × dims)
    collapsed to a 1-row array pair that broadcasts onto the scan (the
    corpus-N pattern) — no eager action, no driver collect. Codes are
    4-8× smaller than float vectors, and the quantized L2² distance is
    an INTEGER sum — order-independent, so results are bit-stable under
    any partitioning (float distance folds are not).
    """
    vd = as_double(F.col(vec_col))
    dims = df.select(F.posexplode(vd).alias("pos", "x"))
    stats = dims.groupBy("pos").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    bounds = stats.agg(
        F.expr("array_sort(collect_list(struct(pos, mn, mx)))").alias("s")
    ).select(
        F.expr("transform(s, e -> e.mn)").alias("mn"),
        F.expr("transform(s, e -> e.mx)").alias("mx"),
    )
    code_expr = (
        "transform({v}, (x, i) -> CASE WHEN element_at(mx, i+1) > element_at(mn, i+1) "
        "THEN CAST(floor((CAST(x AS DOUBLE) - element_at(mn, i+1)) "
        "/ (element_at(mx, i+1) - element_at(mn, i+1)) * 255 + 0.5) AS BIGINT) "
        "ELSE 0L END)"
    ).format(v=vec_col)
    return df.crossJoin(F.broadcast(bounds)).select(
        F.col(id_col), F.expr(code_expr).alias("c")
    )


def sq8_topk(
    df: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """ANN top-k over scalar-quantized codes: rows matching
    ``query_pred`` are the query set (broadcast), the rest are
    candidates; rank per query by integer quantized-L2² ascending, id
    tiebreak. The compression path of a 100 TB vector store: the
    candidate scan reads 8-bit codes, not floats, and the distance
    kernel is exact integer arithmetic.

    ``codes`` — a precomputed ``(id, c)`` code table (the materialized
    shared stage in the registry path); derived from ``df`` if absent.
    """
    if codes is None:
        codes = sq8_codes(df, id_col, vec_col)
    q = codes.filter(query_pred).select(
        F.col(id_col).alias("query_id"), F.col("c").alias("qc")
    )
    c = codes.filter(~query_pred).select(
        F.col(id_col).alias("cand_id"), F.col("c").alias("cc")
    )
    dist = F.expr(
        "aggregate(zip_with(qc, cc, (a, b) -> (a - b) * (a - b)), 0L, (s, x) -> s + x)"
    )
    scored = c.crossJoin(F.broadcast(q)).withColumn("dist2", dist)
    w = Window.partitionBy("query_id").orderBy(F.col("dist2").asc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", F.col("rnk").cast("long").alias("rnk"), "dist2")
    )


def corr_matrix_int(
    emb: DataFrame, dims: int = 8, vec_col: str = "embedding"
) -> DataFrame:
    """Exact Pearson correlation matrix over the first ``dims``
    embedding dimensions — the feature-audit companion to
    :func:`~fitness_data_ingest_spark.ext.corpus.embedding_dim_stats`
    (redundant / degenerate dimensions show up as |corr| ≈ 1 rows).

    Determinism: components are micro-scaled int64 (floor(x·1e6+0.5))
    so every per-pair moment (n, Σx, Σy, Σxy, Σx², Σy²) is an exact
    integer sum — order-independent under any partitioning — and the
    final Pearson expression runs on doubles CONVERTED from those
    exact integers with one fixed IEEE expression tree, identical in
    DuckDB. Overflow bound: |x|≤2²⁰ micro-units ⇒ Σxy < 2⁴⁰·n — safe
    to n ≈ 2²³ rows per aggregate; beyond that, scale to 1e3 units
    (documented, not needed at fixture SF).

    Shape: per-row pair explosion (dims·(dims-1)/2 structs) feeding ONE
    partial-agg groupBy on (i, j) — map-side combine collapses the
    blowup before the shuffle, which carries just
    ``dims²/2 × n_partitions`` partial rows. No window, no collect.

    Output: i, j (0-based, i<j), n, corr4.
    """
    m = F.transform(
        as_double(F.col(vec_col)),
        lambda x: F.floor(x * 1_000_000 + F.lit(0.5)).cast("long"),
    )
    staged = emb.select(F.slice(m, 1, dims).alias("m"))
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.lit(j).alias("j"),
                F.col("m")[i].alias("a"),
                F.col("m")[j].alias("b"),
            )
            for i in range(dims)
            for j in range(i + 1, dims)
        ]
    )
    x = staged.select(F.explode(pairs).alias("p")).select(
        "p.i", "p.j", "p.a", "p.b"
    )
    s = x.groupBy("i", "j").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("a").alias("sx"),
        F.sum("b").alias("sy"),
        F.sum(F.col("a") * F.col("b")).alias("sxy"),
        F.sum(F.col("a") * F.col("a")).alias("sxx"),
        F.sum(F.col("b") * F.col("b")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    cov = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    vx = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double")
    vy = nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double")
    corr = cov / (F.sqrt(vx) * F.sqrt(vy))
    return s.select(
        "i",
        "j",
        "n",
        (F.floor(corr * 1e4 + F.lit(0.5)) / 1e4).alias("corr4"),
    )


SEMDEDUP_TAU = 0.55


def semdedup_profile(
    df: DataFrame,
    tau: float = SEMDEDUP_TAU,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication") restated as a
    per-cluster calibration profile: assign every vector to its nearest
    seed centroid, compare members pairwise WITHIN each cluster only,
    and report per cluster the member count, the single most-similar
    pair (the statistic you inspect to pick the paper's epsilon), and
    how many members the keep-lowest-id rule would drop at ``tau``
    (a member drops when some smaller-id member of the same cluster has
    cosine >= tau with it).

    The cluster-profile grain (10 rows here, k rows in general) rather
    than a raw drop-list keeps the result non-degenerate on corpora
    with few semantic duplicates — the drop-list itself is recoverable
    by raising the report to pair grain.

    Scale shape — the paper's entire trick, kept intact: the pairwise
    join is an equi-join on cluster id, so candidate pairs are
    sum(c_i^2), NOT N^2; assignment is the broadcast k-way expansion
    with the argmax as a partial-aggregated ``max(struct)`` carrying
    (vec, nrm) through (ivf_assign carry_vec — one shuffle total);
    best-pair-per-cluster is again ``max(struct)``, never a window
    over the expanded pair set. A production run caps cluster sizes at
    the clustering step (the paper uses balanced k-means); skew in
    cluster sizes is the operator's documented scaling limit.
    """
    e = with_norm(df, vec_col)
    seed_ids = e.groupBy(label_col).agg(F.min(id_col).alias("sid"))
    seeds = e.join(
        F.broadcast(seed_ids.select(F.col(label_col).alias("slbl"), "sid")),
        F.col(id_col) == F.col("sid"),
    ).select(F.col("slbl").alias("id"), "vec", "nrm")
    # persisted: referenced by the pair join's BOTH sides and the
    # member count — without it each reference re-scans the corpus and
    # re-runs the k-way expansion (the triangle_stats oe.persist
    # contract: callers/bench clearCache between queries)
    assigned = ivf_assign(
        e.select(F.col(id_col).alias("id"), "vec", "nrm"),
        seeds,
        n_nearest=1,
        carry_vec=True,
    ).persist()
    a = assigned.select(
        F.col("cell").alias("cluster"),
        F.col("id").alias("id_a"),
        F.col("vec").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = assigned.select(
        F.col("cell").alias("cluster"),
        F.col("id").alias("id_b"),
        F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    pairs = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "cluster",
            "id_a",
            "id_b",
            cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")).alias("cos"),
        )
    )
    members = assigned.groupBy(F.col("cell").alias("cluster")).agg(
        F.count(F.lit(1)).alias("n_members")
    )
    # best pair AND the tau drop count in ONE aggregate over the pair
    # stream (r11): two separate groupBys re-ran the cluster-scoped
    # pair join + per-pair cosines — the whole cost of the operator —
    # twice. A sub-tau cluster's n_drop is 0 straight from
    # count_distinct (never NULL), so no NULL guard is needed.
    best = pairs.groupBy("cluster").agg(
        F.max(
            F.struct(
                F.col("cos"),
                (-F.col("id_a")).alias("neg_a"),
                (-F.col("id_b")).alias("neg_b"),
            )
        ).alias("bp"),
        F.count_distinct(
            F.when(F.col("cos") >= tau, F.col("id_b"))
        ).alias("n_drop"),
    )
    return (
        members.join(best, "cluster")
        .select(
            F.col("cluster").cast("int").alias("cluster"),
            "n_members",
            (-F.col("bp.neg_a")).alias("best_a"),
            (-F.col("bp.neg_b")).alias("best_b"),
            (F.floor(F.col("bp.cos") * 10000 + 0.5) / 10000.0).alias("best_cos4"),
            "n_drop",
        )
        .orderBy("cluster")
    )


# ----------------------------------------------------- K-MEANS (LLOYD)

KM_K = 8
KM_ROUNDS = 3


def kmeans_lloyd(
    df: DataFrame,
    k: int = KM_K,
    rounds: int = KM_ROUNDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """Deterministic Lloyd k-means over SQ8-quantized codes: ``rounds``
    assignment passes with a centroid update between consecutive passes,
    seeded by the ``k`` lowest-id vectors. Returns the final
    per-cluster profile (members, representative = lowest member id,
    inertia).

    Exactness design — the whole point of running Lloyd on CODES rather
    than floats: a centroid is kept as the INTEGER pair (count, per-dim
    code sums), never a float mean, so the comparable quantity
    ``dist²·cnt² = Σ(cnt·x_i − s_i)²`` is an exact int64 and the only
    float op is one division by ``cnt²`` per (vector, centroid) — the
    same ints divide to the same doubles in any engine, which is what
    lets a 3-round iterative clustering hash-match DuckDB bit-for-bit.
    Per-cluster inertia is exact for the same reason: every member of a
    cluster shares the divisor, so Σdist² accumulates as int64
    (order-independent) and divides once. int64 headroom: |cnt·x| ≤
    N·255, squared and summed over 64 dims ⇒ safe beyond 10⁶ rows per
    cluster; production scales switch the centroid to a float mean and
    accept fold-order drift (documented, not registered).

    Scale shape per round: the centroid table is k rows (broadcast —
    the embed_cluster_assign expansion, sanctioned bounded build); the
    argmin is a partial-aggregated ``min(struct)`` CARRYING the code
    vector through (the ivf carry_vec trick — no join-back); the update
    is ONE shuffle at (cluster, dim) grain with map-side combine.
    State is ``localCheckpoint``-ed between rounds, killing the
    2^rounds lineage re-derivation (the power-iteration lesson).
    Clusters that lose all members drop out of the state identically
    in both engines (group-by semantics). ``codes`` — a precomputed
    ``(id, c)`` table (the materialized shared stage in the registry
    path); derived from ``df`` if absent."""
    if codes is None:
        # derived in-function: many consumers, truncate the derivation
        codes = sq8_codes(df, id_col, vec_col).localCheckpoint()
    # a caller-provided ``codes`` is the MATERIALIZED shared stage (a
    # parquet read — already truncated lineage); re-checkpointing it
    # only added a copy job (the pq_adc measurement, r12)
    state = (
        codes.orderBy(id_col)
        .limit(k)
        .select(
            F.col(id_col).alias("cid"),
            F.lit(1).cast("long").alias("cnt"),
            F.col("c").alias("s"),
        )
    )
    dist2 = F.expr(
        "aggregate(zip_with(c, s, (x, si) -> (cnt*x - si)*(cnt*x - si)), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    assigned = None
    for r in range(rounds):
        joined = codes.crossJoin(F.broadcast(state))
        sv = F.struct(
            (dist2.cast("double") / (F.col("cnt") * F.col("cnt")).cast("double")).alias(
                "v"
            ),
            F.col("cid").alias("cid"),
            dist2.alias("d2"),
            F.col("cnt").alias("cnt"),
            F.col("c").alias("c"),
        )
        assigned = (
            joined.select(F.col(id_col).alias("vid"), sv.alias("sv"))
            .groupBy("vid")
            .agg(F.min("sv").alias("m"))
            .select(
                "vid",
                F.col("m.cid").alias("cid"),
                F.col("m.d2").alias("d2"),
                F.col("m.cnt").alias("cnt"),
                F.col("m.c").alias("c"),
            )
        )
        if r < rounds - 1:
            sums = (
                assigned.select("cid", F.posexplode("c").alias("pos", "x"))
                .groupBy("cid", "pos")
                .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n"))
            )
            state = (
                sums.groupBy("cid")
                .agg(
                    F.max("n").alias("cnt"),
                    F.expr("array_sort(collect_list(struct(pos, sx)))").alias("ps"),
                )
                .select(
                    "cid", "cnt", F.expr("transform(ps, e -> e.sx)").alias("s")
                )
                # lazy: the next round's broadcast build materializes it
                .localCheckpoint(eager=False)
            )
    return (
        assigned.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("vid").alias("rep_id"),
            (
                F.floor(
                    F.sum("d2").cast("double")
                    / (F.first("cnt") * F.first("cnt")).cast("double")
                    * 10000
                    + F.lit(0.5)
                )
                / 10000.0
            ).alias("inertia4"),
        )
        .orderBy("cid")
    )


# ------------------------------------------------ PRODUCT QUANTIZATION

PQ_M = 4  # subspaces (64-dim fixtures -> 16 dims each)
PQ_K = 8  # centroids per subspace (codebook = PQ_M * PQ_K = 32 rows)
PQ_ROUNDS = 2  # Lloyd passes per subspace (1 update between them)
PQ_TOPK = 5


def pq_adc_topk(
    df: DataFrame,
    query_pred: Column,
    m: int = PQ_M,
    k_cent: int = PQ_K,
    rounds: int = PQ_ROUNDS,
    k: int = PQ_TOPK,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (Jégou et al., "Product Quantization for Nearest Neighbor Search",
    TPAMI 2011) — the canonical memory-compression step beyond SQ8: a
    64-dim vector stores as ``m`` sub-codebook indices (here 4 bytes vs
    64 floats), and queries score candidates through a per-query lookup
    table without touching raw vectors.

    Exactness design (the kmeans_lloyd discipline, per subspace): all
    training runs on SQ8 integer codes; a centroid is the integer pair
    (count, per-dim sums) so assignment compares exact int64
    ``dist²·cnt²`` scaled by one IEEE division; every subspace trains
    in the SAME DataFrame ops with ``sub`` as a group key (the codebook
    is one 32-row table, not m separate jobs). The ADC sum adds the m
    per-subspace doubles in FIXED subspace order ((d0+d1)+d2)+d3 —
    never a shuffle-order float fold — which is what lets an iterative
    trained quantizer hash-match an unrolled SQL oracle bit-for-bit.

    Scale shape: codebook (m·k_cent rows) and the per-query distance
    LUT (n_queries·m·k_cent rows) broadcast; candidates are scored by
    joining their CODES to the LUT — the raw-vector scan ends at
    encode time. One shuffle to (query, cand) grain for the ADC sum,
    then the ranking window partitioned per query (queries are the
    parallelism, the sq8_topk shape)."""
    dsub_expr = f"CAST(size(c) / {m} AS INT)"
    if codes is None:
        # derived in-function: many consumers, truncate the derivation
        codes = sq8_codes(df, id_col, vec_col).localCheckpoint()
    # a caller-provided ``codes`` is the MATERIALIZED shared stage (a
    # parquet read — already truncated lineage); re-checkpointing it
    # only added a copy job (~0.13 s measured, r12)
    subs = codes.select(
        F.col(id_col).alias("vid"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {m - 1}),"
                f" s -> slice(c, s * {dsub_expr} + 1, {dsub_expr}))"
            )
        ).alias("sub", "sc"),
        # lazy truncation (r12): eager checkpoints ran ~55% of this
        # operator as construction-side jobs; eager=False keeps the
        # lineage cut (4 consumers) but folds materialization into the
        # first consuming job
    ).localCheckpoint(eager=False)
    seed_ids = codes.orderBy(id_col).limit(k_cent).select(
        F.col(id_col).alias("vid")
    )
    state = subs.join(F.broadcast(seed_ids), "vid").select(
        F.col("vid").alias("cid"),
        "sub",
        F.lit(1).cast("long").alias("cnt"),
        F.col("sc").alias("s"),
    )
    dist2 = F.expr(
        "aggregate(zip_with(sc, s, (x, si) -> (cnt*x - si)*(cnt*x - si)), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    assigned = None
    for r in range(rounds):
        joined = subs.join(F.broadcast(state), "sub")
        sv = F.struct(
            (
                dist2.cast("double")
                / (F.col("cnt") * F.col("cnt")).cast("double")
            ).alias("v"),
            F.col("cid").alias("cid"),
            F.col("sc").alias("sc"),
        )
        assigned = (
            joined.select("vid", "sub", sv.alias("sv"))
            .groupBy("vid", "sub")
            .agg(F.min("sv").alias("mi"))
            .select(
                "vid", "sub",
                F.col("mi.cid").alias("cid"),
                F.col("mi.sc").alias("sc"),
            )
        )
        if r < rounds - 1:
            sums = (
                assigned.select("sub", "cid", F.posexplode("sc").alias("pos", "x"))
                .groupBy("sub", "cid", "pos")
                .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n"))
            )
            state = (
                sums.groupBy("sub", "cid")
                .agg(
                    F.max("n").alias("cnt"),
                    F.expr("array_sort(collect_list(struct(pos, sx)))").alias("ps"),
                )
                .select(
                    "sub", "cid", "cnt",
                    F.expr("transform(ps, e -> e.sx)").alias("s"),
                )
                # lazy: the next round's broadcast build materializes it
                .localCheckpoint(eager=False)
            )
    # per-query ADC lookup table: distance from each query SUB-code to
    # every centroid of that subspace — n_queries * m * k_cent rows
    ids = codes.select(F.col(id_col), query_pred.alias("is_q"))
    q_subs = subs.join(
        F.broadcast(ids.filter("is_q").select(F.col(id_col).alias("vid"))),
        "vid",
    ).select(F.col("vid").alias("query_id"), "sub", "sc")
    lut = (
        q_subs.join(F.broadcast(state), "sub")
        .select(
            "query_id", "sub", "cid",
            (
                dist2.cast("double")
                / (F.col("cnt") * F.col("cnt")).cast("double")
            ).alias("dq"),
        )
    )
    cand_enc = assigned.join(
        F.broadcast(ids.filter(~F.col("is_q")).select(F.col(id_col).alias("vid"))),
        "vid",
    ).select(F.col("vid").alias("cand_id"), "sub", "cid")
    scored = cand_enc.join(F.broadcast(lut), ["sub", "cid"])
    per_sub = [
        F.max(F.when(F.col("sub") == s, F.col("dq"))).alias(f"d{s}")
        for s in range(m)
    ]
    paired = scored.groupBy("query_id", "cand_id").agg(*per_sub)
    adc = F.col("d0")
    for s in range(1, m):
        adc = adc + F.col(f"d{s}")
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("cand_id").asc()
    )
    return (
        paired.withColumn("adc", adc)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id", "cand_id",
            F.col("rnk").cast("long").alias("rnk"),
            (F.floor(F.col("adc") * 10000 + F.lit(0.5)) / 10000.0).alias("adc4"),
        )
    )

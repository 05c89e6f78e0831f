"""Physical-plan quality gates: the plans we'd want at 100 TB, asserted
via explain() — pushdown reaches the scan, dims broadcast, no
accidental cartesian products, codegen in the hot path."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from fitness_data_ingest_spark.registry import all_queries

QUERIES = all_queries()


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    df = QUERIES["filter_pushdown_partition"].spark(spark, sf_dir)
    plan = plan_of(df)
    assert "PushedFilters" in plan
    # the shipdate range must be in the pushed filters, not a post-scan-only filter
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln][0]
    assert "l_shipdate" in pushed and ("GreaterThan" in pushed or "LessThan" in pushed)


def test_projection_prunes_scan_schema(spark, sf_dir):
    df = QUERIES["project_columns"].spark(spark, sf_dir)
    plan = plan_of(df)
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in read and "l_quantity" in read
    # pruned: untouched wide columns must not be read
    assert "l_comment" not in read and "l_extendedprice" not in read


def final_plan_of(df) -> str:
    """Executed (AQE-final) physical plan. Static non-CBO join-size
    estimates are products of child sizes, so small-side joins can plan
    as SMJ statically and only demote to broadcast at runtime — the
    runtime plan is the one that matters."""
    df.collect()
    plan = plan_of(df, "simple")
    # explain() prints "== Final Plan ==" then "== Initial Plan ==";
    # only the final (post-AQE) section matters.
    return plan.split("== Initial Plan ==")[0]


def test_dim_joins_broadcast(spark, sf_dir):
    for name in ["join_broadcast", "flagship_pipeline", "tpch_q5_region"]:
        plan = final_plan_of(QUERIES[name].spark(spark, sf_dir))
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, f"{name}: dim join fell back to SMJ"


def test_anti_semi_joins_broadcast(spark, sf_dir):
    for name in ["join_left_anti", "join_left_semi"]:
        plan = final_plan_of(QUERIES[name].spark(spark, sf_dir))
        assert "BroadcastHashJoin" in plan, name


def test_range_join_is_hash_on_equi_key(spark, sf_dir):
    """The interval join must plan as an equi-join on user_id with the
    range as post-join filter — NEVER a cartesian/nested-loop over the
    full fact table."""
    plan = plan_of(QUERIES["join_range_interval"].spark(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "user_id" in plan


def test_whole_stage_codegen_in_hot_paths(spark, sf_dir):
    for name in ["tpch_q1", "text_quality_score"]:
        df = QUERIES[name].spark(spark, sf_dir)
        # AQE hides codegen spans until the final plan exists; run the
        # query (cheap at sf0.001) so explain() shows the executed plan.
        df.collect()
        plan = plan_of(df, "simple")
        # codegen stages render as "*(n) Op" in simple mode
        assert "*(1)" in plan or "WholeStageCodegen" in plan, name



# Keys sanctioned to carry an Arrow-batched Python kernel
# (ArrowEvalPython) — each needs an exactness argument at the site:
# the kernel's arithmetic must be order-independent (integer sums) so
# batching cannot move a value. Row-at-a-time BatchEvalPython stays
# banned everywhere. (VERDICT r11 item 3: the SQ8/PQ ANN paths compare
# INTEGER codes — integer distance sums commute, so a vectorized NumPy
# kernel is bit-identical to the JVM HOF fold it replaces.)
ARROW_KERNEL_KEYS = frozenset({"embed_matryoshka_recall", "ml_ndcg_ann"})


@pytest.fixture(scope="module")
def registry_plan_artifacts(spark, sf_dir):
    """(fingerprint, simple-mode plan) per registry key, computed ONCE
    per module — shared by the whole-registry plan gates (the
    python-boundary gate and the fingerprint gate each spent ~80-90 s
    rebuilding all 324 plans; construction, not assertion, is the cost
    — eager staging executes during it). Protocol matches the
    fingerprint baseline's recording exactly: one clearCache, then
    construct + fingerprint inline in sorted order (a later key's
    persist registration must not be visible to an earlier key's
    fingerprint, and no earlier test's cache may hide a subtree)."""
    from fitness_data_ingest_spark.plans import plan_fingerprint

    spark.catalog.clearCache()
    out = {}
    for name in sorted(QUERIES):
        df = QUERIES[name].spark(spark, sf_dir)
        # the second explain reuses the QueryExecution's cached
        # physical plan, so the formatted copy is nearly free
        out[name] = (
            plan_fingerprint(df),
            plan_of(df, "simple"),
            plan_of(df, "formatted"),
        )
    return out


def test_no_python_udfs_anywhere_in_registry(registry_plan_artifacts):
    """Every registered query must stay JVM-side (BatchEvalPython /
    ArrowEvalPython in a plan = a row/batch Python boundary), except
    the named integer-exact Arrow kernels in ARROW_KERNEL_KEYS and the
    sanctioned mapInPandas boundaries (multimodal codecs, isotonic's
    partition kernel), which are Arrow-batched and value-exact."""
    for name, (_fp, plan, _fmt) in registry_plan_artifacts.items():
        assert "BatchEvalPython" not in plan, name
        if name not in ARROW_KERNEL_KEYS:
            assert "ArrowEvalPython" not in plan, name
        else:
            # the sanction list must not rot: a listed key really
            # carries the Arrow kernel it is sanctioned for
            assert "ArrowEvalPython" in plan, (
                f"{name}: sanctioned but no kernel"
            )


def test_minhash_signature_stage_is_parallel(spark, sf_dir):
    from fitness_data_ingest_spark.ext import dedup as D
    from fitness_data_ingest_spark.registry_util import t

    sig = D.with_minhash(t(spark, sf_dir, "documents"), "doc_id", "text")
    assert sig.rdd.getNumPartitions() > 1


def test_cluster_conf_profile_is_consistent(spark):
    """The documented 100TB profile must stay consistent with the local
    factory (same semantics knobs) and internally sane."""
    from fitness_data_ingest_spark.session import cluster_conf

    conf = cluster_conf(executors=1000, cores_per_executor=4)
    assert int(conf["spark.sql.shuffle.partitions"]) == 10000
    # semantic knobs must match what correctness was verified under
    for k in [
        "spark.sql.session.timeZone",
        "spark.sql.adaptive.enabled",
        "spark.sql.python.filterPushdown.enabled",
    ]:
        assert conf[k] == spark.conf.get(k), k
    # every value must be settable (string-typed, parseable)
    assert all(isinstance(v, str) for v in conf.values())


def test_approx_sketches_within_error_bounds(spark, sf_dir):
    """HLL++ distinct and GK median must track exact values (<2% rel
    err at rsd=0.01 / accuracy=10000) — the sketch path is only useful
    if its error budget actually holds."""
    from fitness_data_ingest_spark.registry_util import t
    from pyspark.sql import functions as F

    approx = {
        r["l_returnflag"]: r
        for r in QUERIES["agg_approx_sketch"].spark(spark, sf_dir).collect()
    }
    li = t(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("median"),
        )
        .collect()
    }
    for flag, e in exact.items():
        a = approx[flag]
        assert abs(a["approx_parts"] - e["parts"]) / e["parts"] < 0.02, flag
        assert abs(a["approx_median"] - e["median"]) / e["median"] < 0.02, flag


# Plan-shape gates for the subquery-shaped TPC-H set run at sf0.01:
# at sf0.001 several results are legitimately empty and AQE collapses
# whole branches to EmptyRelation, hiding the scan/exchange structure
# these tests exist to pin down.
_PLAN_SF = "/root/testdata/sf0.01"


def test_tpch2_single_fact_scan(spark):
    """q11/q15/q17 contain a 'scalar vs aggregate' self-reference that
    naively plans TWO scans of the fact table. Our formulations (window
    over the aggregate / ReusedExchange) must keep it to ONE lineitem
    scan — at 100 TB the second scan is the single biggest waste."""
    for name in ["tpch_q11_important", "tpch_q15_topsupp", "tpch_q17_smallqty"]:
        df = QUERIES[name].spark(spark, _PLAN_SF)
        plan = final_plan_of(df)
        n_scans = sum(
            1 for ln in plan.splitlines()
            if "Scan parquet" in ln and "lineitem" in ln
        )
        assert n_scans == 1, f"{name}: {n_scans} lineitem scans"


def test_tpch2_q21_single_fact_shuffle(spark):
    """q21's per-(order,supplier) aggregate + per-order windows must ride
    ONE hashpartitioning(o_orderkey) exchange of the fact (subset-key
    clustering), not one per operator."""
    plan = final_plan_of(QUERIES["tpch_q21_waiting"].spark(spark, _PLAN_SF))
    fact_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning(o_orderkey" in ln
    ]
    assert len(fact_exchanges) == 1, plan[:800]


def test_tpch2_no_cartesian_or_nested_loop(spark):
    """None of the subquery-shaped TPC-H adaptations may degrade to a
    cartesian/nested-loop join over facts. Exception: q11's scalar total
    joins as a 1-row broadcast cross join (BNLJ with a single-row build
    is a map-side constant append — the scale-correct plan; the window
    alternative would single-partition-sort every part). Same for q22's
    scalar average."""
    from fitness_data_ingest_spark.registry_tpch2 import TPCH2_QUERIES

    scalar_bcast_ok = {"tpch_q11_important", "tpch_q22_dormant"}
    for name, q in TPCH2_QUERIES.items():
        plan = plan_of(q.spark(spark, _PLAN_SF), "simple")
        assert "CartesianProduct" not in plan, name
        if name not in scalar_bcast_ok:
            assert "BroadcastNestedLoopJoin" not in plan, name


def test_ext_no_cartesian_or_nested_loop(spark, sf_dir):
    """No LLM-pipeline operator may degrade to a cartesian/nested-loop
    join. Sanctioned exceptions, all bounded-build-side by construction:
    ann_cosine_topk (the brute-force BASELINE: a deliberate broadcast of
    the small query set), text_tfidf (corpus size N joins in as a 1-row
    broadcast scalar, the q11/q22 pattern), ann_ivf_topk (the
    quantizer's C-way centroid expansion broadcasts the constant-size
    centroid set — C=8 rows at any data scale), and ann_lsh_multitable
    (the L*r*d hyperplane matrix rides in as a 1-row broadcast so the
    coefficients stay out of the expression tree)."""
    from fitness_data_ingest_spark.registry_ext import EXT_QUERIES

    bounded_bcast_ok = {
        "ann_cosine_topk", "text_tfidf", "ann_ivf_topk", "ann_lsh_multitable",
        # knn vote reuses cosine_topk's broadcast query set; the k-means
        # E-step broadcasts the k seed centroids (k rows at any scale)
        "ann_knn_classify", "embed_cluster_assign",
        # r12: the shared-count prefilter attaches the 1-row |hot|
        # scalar as a conditionless broadcast (the tfidf/q11 pattern)
        "dedup_ngram_jaccard",
    }
    for name, q in EXT_QUERIES.items():
        plan = plan_of(q.spark(spark, sf_dir), "simple")
        assert "CartesianProduct" not in plan, name
        if name not in bounded_bcast_ok:
            assert "BroadcastNestedLoopJoin" not in plan, name


def test_pipeline_no_cartesian_or_nested_loop(spark, sf_dir):
    """Pipeline-family operators (packing/vocab/mixture/PII/audits/
    funnel/interval-join) must all execute as hash/sort-merge joins on
    equi keys — range predicates ride as post-join filters, never a
    nested loop. Sanctioned exceptions: corpus_source_composition and
    text_keywords_topk (via tfidf) join the corpus total in as a 1-row
    broadcast scalar (the tfidf/q11/q22 pattern) — bounded build side
    at any data scale."""
    from fitness_data_ingest_spark.registry_pipeline import PIPELINE_QUERIES

    bounded_bcast_ok = {"corpus_source_composition", "text_keywords_topk"}
    for name, q in PIPELINE_QUERIES.items():
        plan = plan_of(q.spark(spark, sf_dir), "simple")
        assert "CartesianProduct" not in plan, name
        if name not in bounded_bcast_ok:
            assert "BroadcastNestedLoopJoin" not in plan, name


def test_bigram_topk_is_limit_then_rank(spark, sf_dir):
    """The corpus bigram top-k must bound with TakeOrderedAndProject
    and derive its rank window-free (same invariant as vocab_topk)."""
    plan = plan_of(QUERIES["text_bigram_topk"].spark(spark, sf_dir), "simple")
    assert "TakeOrderedAndProject" in plan, plan[:800]
    assert "Window" not in plan, f"unexpected Window\n{plan[:800]}"


def test_curation_funnel_single_scan(spark, sf_dir):
    """The four-stage curation funnel must cost ONE scan of documents —
    the stage flags cascade inside the row, they never re-read or
    self-join the table."""
    plan = plan_of(QUERIES["corpus_curation_funnel"].spark(spark, sf_dir), "simple")
    assert plan.count("documents.parquet") == 1, plan[:1200]


def test_mode_argmax_is_aggregate_not_window(spark, sf_dir):
    """The per-group mode must reduce through min-struct partial
    aggregates — the rank-window form (which the DuckDB oracle runs)
    would sort every count row inside each group's partition."""
    plan = plan_of(QUERIES["agg_mode_argmax"].spark(spark, sf_dir), "simple")
    assert "Window" not in plan, plan[:800]
    assert "Join" not in plan, plan[:800]


def test_linear_fit_is_partial_aggregate(spark, sf_dir):
    """The OLS moment aggregation must be a plain two-phase hash
    aggregate (map-side partial combine) — no window, no join, one
    exchange on the group key."""
    plan = plan_of(QUERIES["agg_linear_fit"].spark(spark, sf_dir), "simple")
    assert "Window" not in plan, plan[:800]
    assert "Join" not in plan, plan[:800]
    assert plan.count("Exchange") <= 2, plan[:1200]


def test_vocab_topk_is_limit_then_rank(spark, sf_dir):
    """Global vocabulary top-k must bound with a distributed
    TakeOrderedAndProject and derive its rank window-free (same
    invariant as q3/q10)."""
    plan = plan_of(QUERIES["corpus_vocab_topk"].spark(spark, sf_dir), "simple")
    assert "TakeOrderedAndProject" in plan, plan[:800]
    assert "Window" not in plan, f"unexpected Window\n{plan[:800]}"


def test_topk_is_limit_then_rank_not_global_window(spark, sf_dir):
    """q3/q10/q15/topk_latest rank unbounded-cardinality input (per-order /
    per-customer / per-supplier aggregates, raw events). The plan must
    bound the set with a distributed TakeOrderedAndProject, and since the
    output rank now derives from the <=N survivors via ``ranked_topk``
    (array_sort + posexplode), NO WindowExec — partitioned or global —
    may appear anywhere. A Sort feeding a Window directly (the round-1
    shape) would single-partition-sort the full input at SF1000."""
    for name in ["tpch_q3_top10", "tpch_q10_returns", "tpch_q15_topsupp", "topk_latest"]:
        plan = plan_of(QUERIES[name].spark(spark, sf_dir), "simple")
        assert "TakeOrderedAndProject" in plan, f"{name}:\n{plan[:800]}"
        assert "Window" not in plan, f"{name}: unexpected Window\n{plan[:800]}"


def test_partitioned_sink_prunes_on_read(spark, sf_dir, tmp_path):
    """write_partitioned layout must yield PartitionFilters (directory
    pruning) for a filter on the partition column — the entire point of
    replacing the reference's path convention with Hive partitioning."""
    from fitness_data_ingest_spark.io import write_partitioned
    from fitness_data_ingest_spark.registry_util import t
    from pyspark.sql import functions as F

    out = str(tmp_path / "part_sink")
    ev = t(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    write_partitioned(ev, out, ["event_type"])
    back = spark.read.parquet(out).filter(F.col("event_type") == "error")
    plan = plan_of(back)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "event_type" in pf[0], plan[:500]
    assert back.count() == ev.filter(F.col("event_type") == "error").count()


def test_ivf_assignment_is_aggregate_not_window(spark, sf_dir):
    """The candidate-side IVF cell assignment (n_nearest=1) must plan as
    a hash aggregate with a map-side partial (the C-way centroid
    expansion collapses back to one row per vector BEFORE the shuffle)
    and must contain no Window operator — the window form would shuffle
    the full C-expanded set. See SCALING.md §5."""
    from fitness_data_ingest_spark.ext import similarity as S
    from fitness_data_ingest_spark.registry_util import t
    from pyspark.sql import functions as F

    cand = S.with_norm(
        t(spark, sf_dir, "embeddings").filter(F.col("vec_id") >= 10)
    ).select(F.col("vec_id").alias("id"), "vec", "nrm")
    cent = cand.filter(
        (F.col("id") >= S.IVF_CENTROID_LO) & (F.col("id") < S.IVF_CENTROID_HI)
    )
    plan = plan_of(S.ivf_assign(cand, cent, 1), "simple")
    assert "Window" not in plan
    # struct-typed max is sort-based (SortAggregate), not hashable — the
    # property that matters is the partial_max BEFORE the exchange.
    assert "partial_max" in plan
    partial_line = next(i for i, ln in enumerate(plan.splitlines()) if "partial_max" in ln)
    exchange_line = next(i for i, ln in enumerate(plan.splitlines()) if "Exchange hashpartitioning" in ln)
    assert exchange_line < partial_line, "partial agg must be below (before) the exchange"


def test_new_audit_ops_plan_shapes(spark, sf_dir):
    """Plan gates for the late-round operator batch: the incremental
    merge full-outer-joins two AGGREGATED (key-grain) inputs; the DQ
    audit costs one fact scan + one broadcast key probe; the skew
    profile and dispersion stats are pure aggregates (no window, one
    scan); the transition matrix costs ONE events scan with only keyed
    windows."""
    checks = {
        "agg_incremental_merge": dict(fullouter=True, max_windows=0),
        "dq_audit_lineitem": dict(max_scans=2, bhj=True, max_windows=0),
        "events_key_skew": dict(max_scans=1, max_windows=0),
        "agg_dispersion": dict(max_scans=1, max_windows=0),
        "events_transition_matrix": dict(max_scans=1),
    }
    for name, want in checks.items():
        plan = plan_of(QUERIES[name].spark(spark, sf_dir), "simple")
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        if "fullouter" in want:
            assert "FullOuter" in plan, name
        if "bhj" in want:
            assert "BroadcastHashJoin" in plan, name
        if "max_scans" in want:
            assert plan.count(".parquet") <= want["max_scans"], (
                f"{name}: too many scans\n{plan[:900]}"
            )
        if "max_windows" in want:
            n_win = sum("Window" in ln for ln in plan.splitlines())
            assert n_win <= want["max_windows"], (
                f"{name}: unexpected window\n{plan[:900]}"
            )


def test_r3_no_cartesian_or_nested_loop(spark, sf_dir):
    """Round-3 family: no operator may degrade to a cartesian product.
    Sanctioned bounded-build broadcasts: ann_sq8_topk (the 1-row
    per-dim bounds pair and the small query-code set both ride in as
    broadcasts — constant/bounded build side at any data scale)."""
    from fitness_data_ingest_spark.registry_r3 import R3_QUERIES

    bounded_bcast_ok = {"ann_sq8_topk"}
    for name, q in R3_QUERIES.items():
        plan = plan_of(q.spark(spark, sf_dir), "simple")
        assert "CartesianProduct" not in plan, name
        if name not in bounded_bcast_ok:
            assert "BroadcastNestedLoopJoin" not in plan, name


def test_asof_join_is_single_shuffle_no_join(spark, sf_dir):
    """The union-merge as-of join must plan as ONE hash-partition
    exchange + one window — zero Join nodes, zero pair
    materialization (the rejected formulation planned an equi-join
    whose candidate set is O(n²) per key on long histories)."""
    plan = plan_of(QUERIES["join_asof"].spark(spark, sf_dir), "simple")
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" in plan


def test_chunk_overlap_is_shuffle_free(spark, sf_dir):
    """Chunking is a generate inside the scan projection — the plan
    must contain no Exchange at all."""
    plan = plan_of(QUERIES["corpus_chunk_overlap"].spark(spark, sf_dir), "simple")
    assert "Exchange" not in plan, plan
    assert "Generate" in plan


def test_r3b_no_cartesian_or_nested_loop(spark, sf_dir):
    """Round-3b family: no cartesian products; the only sanctioned
    nested-loops are 1-row/bounded broadcasts (the tfidf/q11 pattern —
    constant build side at any data scale): orders_pareto and
    events_rfm_segment cross-join single-row stats tables;
    ann_recall_eval's brute-force arm broadcasts the 10-query panel
    (the deliberate exact baseline it measures LSH against);
    affinity_lift_topk joins the 1-row basket-count scalar."""
    from fitness_data_ingest_spark.registry_r3b import R3B_QUERIES

    bounded_bcast_ok = {
        "orders_pareto", "events_rfm_segment", "ann_recall_eval",
        "affinity_lift_topk", "corpus_mixture_plan",
        # 1-row time-cutoff + global-mean scalars ride in as broadcasts
        "events_forecast_backtest",
        # 1-row vocab-total scalar
        "corpus_vocab_drift",
        # r12: the shared-count prefilter attaches the 1-row |hot|
        # scalar as a conditionless broadcast (the tfidf/q11 pattern)
        "dedup_threshold_sweep", "dedup_containment_pairs",
    }
    for name, q in R3B_QUERIES.items():
        plan = plan_of(q.spark(spark, sf_dir), "simple")
        assert "CartesianProduct" not in plan, name
        if name not in bounded_bcast_ok:
            assert "BroadcastNestedLoopJoin" not in plan, name


def test_range_join_is_bucketed_equi_join(spark, sf_dir):
    """The interval×point range join must plan as an EQUI join (hash or
    sort-merge on (key, bucket)) with the range residual as a post-join
    filter — never the BroadcastNestedLoopJoin Spark gives a bare
    BETWEEN predicate."""
    plan = plan_of(QUERIES["range_join_events"].spark(spark, sf_dir), "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    ), plan[:800]


def test_pareto_rank_windows_are_bucket_partitioned(spark, sf_dir):
    """distributed_rank must never emit a partition-less window (the
    single-reducer global sort cliff): every window spec in the pareto
    plan partitions by the range bucket."""
    plan = plan_of(QUERIES["orders_pareto"].spark(spark, sf_dir), "formatted")
    specs = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert specs, "expected a per-bucket ranking window"
    for ln in specs:
        assert "bkt" in ln, f"window not partitioned by bucket: {ln}"


def test_domain_cap_windows_are_salted_then_grouped(spark, sf_dir):
    """grouped_topk's two-level shape: stage-1 windows partition by
    (source, salt) — the whale-domain guard — and only the bounded
    survivor pass partitions by source alone."""
    plan = plan_of(QUERIES["corpus_domain_cap"].spark(spark, sf_dir), "formatted")
    specs = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert len(specs) == 2, "\n".join(specs)
    # stage 1 partitions by (source, salt-projection) — two partition
    # keys; stage 2 by source alone. The salt itself is a pmod(hash(...))
    # computed in the upstream Project.
    assert "[source" in specs[0] and "_w0" in specs[0], specs[0]
    assert "_w0" not in specs[1], specs[1]
    assert "pmod" in plan and "hash" in plan, "salt projection missing"


def test_pagerank_round_is_exchange_free(spark, sf_dir):
    """Symmetric-mode PageRank pays its dst-hash shuffle ONCE up front:
    the cached edge table is pre-partitioned by dst, the per-round
    broadcast join preserves that partitioning, and no zeros-union
    erases it — so the final round's plan (everything after the last
    lineage checkpoint) must contain NO Exchange at all."""
    plan = plan_of(QUERIES["graph_pagerank"].spark(spark, sf_dir), "simple")
    assert "Exchange" not in plan, plan[:800]


def test_pagerank_cache_loss_reshuffles_once_then_recovers(spark, sf_dir):
    """SCALING.md §10 first bullet, simulated locally (verdict r4 item
    6): the zero-exchange PageRank round depends on the CACHED edge
    table's dst-partitioning. If an executor loss drops the cached
    blocks (simulated here by unpersist), the round's plan must fall
    back to re-deriving the partitioning through the lineage's
    repartition Exchange — pay the shuffle again — and return to
    exchange-free once the cache is rebuilt. This is the one §10 claim
    local mode can assert: the partitioning contract lives in the
    LINEAGE, not only in the cache, so cache loss degrades to a
    recompute, never to a wrong-partitioning aggregate."""
    from fitness_data_ingest_spark.ops.graph import RANK_UNIT

    edges = spark.createDataFrame(
        [(a, b) for a in range(1, 6) for b in range(1, 6) if a != b],
        "src long, dst long",
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = edges.join(deg, "src").repartition("dst").persist()
    ed.count()  # materialize the cache

    ranks = deg.select(
        F.col("src").alias("node"),
        F.lit(RANK_UNIT).cast("long").alias("rank_micro"),
    ).localCheckpoint()

    def round_df():
        contrib = ed.join(F.broadcast(ranks), ed.src == ranks.node).select(
            F.col("dst"), F.expr("rank_micro div outdeg").alias("c")
        )
        return contrib.groupBy("dst").agg(F.sum("c").alias("s"))

    def live(plan: str) -> str:
        # explain() prints the InMemoryRelation's STORED child plan
        # (including the Exchange that built the cache) below the
        # cache boundary; only the section above it executes on scan
        return plan.split("InMemoryRelation")[0]

    try:
        # cached: the round satisfies groupBy(dst) from the cached
        # partitioning — no Exchange in the executed section
        cached = plan_of(round_df(), "simple")
        assert "InMemoryTableScan" in cached, cached[:800]
        assert "Exchange" not in live(cached), live(cached)

        # simulate executor loss: cached blocks gone
        ed.unpersist(blocking=True)
        lost = plan_of(round_df(), "simple")
        # the round re-plans through the raw lineage: the dst
        # repartition Exchange is back (plus the degree-agg shuffle the
        # cache also absorbed), and the values still come out right
        assert "InMemoryTableScan" not in lost
        assert "Exchange hashpartitioning(dst" in lost, lost[:1200]
        got = {r["dst"]: r["s"] for r in round_df().collect()}
        assert got == {n: 4 * (RANK_UNIT // 4) for n in range(1, 6)}

        # cache rebuilt -> exchange-free rounds again
        ed.persist()
        ed.count()
        back = plan_of(round_df(), "simple")
        assert "InMemoryTableScan" in back
        assert "Exchange" not in live(back), live(back)
    finally:
        ed.unpersist()


# -------------------------------------------------------- plan linter API


def test_lint_flags_global_window(spark, sf_dir):
    from pyspark.sql import Window
    from fitness_data_ingest_spark.plans import lint_plan
    from fitness_data_ingest_spark.registry_util import t

    ev = t(spark, sf_dir, "events")
    bad = ev.withColumn(
        "rn", F.row_number().over(Window.orderBy("event_id"))
    )
    rules = {f["rule"] for f in lint_plan(bad)}
    assert "global-window" in rules
    good = ev.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("user_id").orderBy("event_id")),
    )
    assert "global-window" not in {f["rule"] for f in lint_plan(good)}


def test_lint_flags_nested_loop_and_allows_sanctioned(spark, sf_dir):
    from fitness_data_ingest_spark.plans import lint_plan
    from fitness_data_ingest_spark.registry_util import t

    ev = t(spark, sf_dir, "events").limit(10)
    cross = ev.crossJoin(ev.select(F.col("event_id").alias("e2")))
    rules = {f["rule"] for f in lint_plan(cross)}
    assert "nested-loop-join" in rules
    assert "nested-loop-join" not in {
        f["rule"] for f in lint_plan(cross, allow_nested_loop=True)
    }


def test_lint_flags_python_udf(spark, sf_dir):
    from pyspark.sql.functions import udf
    from fitness_data_ingest_spark.plans import lint_plan
    from fitness_data_ingest_spark.registry_util import t

    slow = udf(lambda x: x + 1, "long")
    df = t(spark, sf_dir, "events").select(slow(F.col("user_id")))
    assert any(
        f["rule"] == "python-row-boundary" and f["severity"] == "high"
        for f in lint_plan(df)
    )


def test_flagship_and_new_family_lint_clean(spark, sf_dir):
    from fitness_data_ingest_spark.plans import assert_plan_clean
    from fitness_data_ingest_spark.registry_r3b import R3B_QUERIES

    sanctioned = {
        "orders_pareto", "events_rfm_segment", "ann_recall_eval",
        "affinity_lift_topk", "corpus_mixture_plan",
        "events_forecast_backtest", "corpus_vocab_drift",
        # r12: 1-row |hot| scalar broadcast in the prefilter
        "dedup_threshold_sweep", "dedup_containment_pairs",
    }
    assert_plan_clean(QUERIES["flagship_pipeline"].spark(spark, sf_dir))
    for name, q in R3B_QUERIES.items():
        assert_plan_clean(
            q.spark(spark, sf_dir), allow_nested_loop=name in sanctioned
        )


def test_sql4_family_plans(spark, sf_dir):
    """Spark-4 SQL-surface keys: the LATERAL top-n must decorrelate to
    an equi-join + per-key window (never a per-row nested loop); the
    variant extraction stays a single-scan aggregate."""
    from fitness_data_ingest_spark.registry_sql4 import SQL4_QUERIES

    lat = plan_of(SQL4_QUERIES["sql_lateral_topn"].spark(spark, sf_dir), "simple")
    assert "BroadcastNestedLoopJoin" not in lat and "CartesianProduct" not in lat
    assert ("BroadcastHashJoin" in lat) or ("SortMergeJoin" in lat), lat[:600]
    assert "Window" in lat
    var = plan_of(
        SQL4_QUERIES["json_variant_extract"].spark(spark, sf_dir), "simple"
    )
    assert "Join" not in var
    assert var.count("events.parquet") == 1


def test_lint_window_spec_parse_is_paren_aware():
    """ADVICE r3: a flat regex truncated windowspecdefinition at the
    first ')' and misread expression partition keys (coalesce(a, b))
    as order columns, yielding a false global-window finding."""
    from fitness_data_ingest_spark.plans import _split_top_level, _window_specs

    fake = (
        "Window [sum(x) windowspecdefinition(coalesce(a#1, b#2), "
        "c#3 ASC NULLS FIRST, specifiedwindowframe(RangeFrame, "
        "unboundedpreceding$(), currentrow$()))]"
    )
    (spec,) = _window_specs(fake)
    parts = _split_top_level(spec)
    assert parts[0] == "coalesce(a#1, b#2)"   # whole expression, one token
    assert " ASC" in parts[1]
    # a genuinely global spec still classifies as one
    (g,) = _window_specs("windowspecdefinition(c#3 ASC NULLS FIRST, specifiedwindowframe(RowFrame, a$(), b$()))")
    assert " ASC" in _split_top_level(g)[0]


def test_r4_family_plans(spark, sf_dir):
    """Round-4 family: no cartesian or nested-loop joins, no
    partition-less windows anywhere (the interpolation windows are
    user-partitioned; the pipe aggregate is a plain hash aggregate;
    the sketch audit joins are all banded equi-joins). The one
    sanctioned nested-loop is embed_power_iteration's 1-row max
    broadcast per renormalization step (the q14/q22 scalar-attach
    shape — constant build side at any data scale)."""
    from fitness_data_ingest_spark.plans import lint_plan
    from fitness_data_ingest_spark.registry_r4 import R4_QUERIES

    # 1-row scalar broadcasts (the q14/q22 shape): power iteration's
    # per-step max, BPE's top pair, the outlier score's packed
    # 64-dim stats row — all constant build sides at any data scale
    bounded_bcast_ok = {
        "embed_power_iteration",
        "corpus_bpe_merges",
        "embed_outlier_score",
        # 1-row mutual-count scalar attached to the 1-row graph stats
        "embed_knn_graph",
        # 1-row covered-token scalar attached to the 1-row totals
        "corpus_ngram_coverage",
    }
    for name, q in R4_QUERIES.items():
        findings = [
            f
            for f in lint_plan(
                q.spark(spark, sf_dir),
                allow_nested_loop=name in bounded_bcast_ok,
            )
            if f["severity"] == "high"
        ]
        assert findings == [], (name, findings)


def test_r5_family_plans(spark, sf_dir):
    """Round-5 family: no cartesian/nested-loop joins, no
    partition-less windows, no Python UDFs. DSIR's weight table joins
    broadcast (64 rows at any corpus size); span dedup's candidate set
    is fingerprint-bucketed equi-join, never all-pairs. Sanctioned
    bounded broadcast: embed_semdedup's k-way seed-centroid expansion
    (k rows at any scale — the embed_cluster_assign pattern); its
    PAIR join must still be the cluster equi-join, asserted below."""
    from fitness_data_ingest_spark.plans import lint_plan
    from fitness_data_ingest_spark.registry_r5 import R5_QUERIES

    bounded_bcast_ok = {"embed_semdedup"}
    for name, q in R5_QUERIES.items():
        findings = [
            f
            for f in lint_plan(
                q.spark(spark, sf_dir),
                allow_nested_loop=name in bounded_bcast_ok,
            )
            if f["severity"] == "high"
        ]
        assert findings == [], (name, findings)
    # the within-cluster pair join is hash-shuffled on the cluster key;
    # the sanctioned nested loop is ONLY the k-seed expansion (inside
    # the persisted assignment — computed once, though each
    # InMemoryTableScan re-prints it, so no textual count is asserted).
    # Judge from COLD statistics: if an earlier test in the shared
    # session already materialized a matching assignment subtree, the
    # cached actual sizes flip the cluster joins to broadcast and the
    # shuffled-join assertion below would flake on suite order (seen
    # r11 after the best+drops aggregates merged from 3 joins to 2).
    spark.catalog.clearCache()
    plan = plan_of(R5_QUERIES["embed_semdedup"].spark(spark, sf_dir), "simple")
    spark.catalog.clearCache()
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan


def test_r5b_family_plans(spark, sf_dir):
    """Round-5b family: no cartesian/nested-loop joins, no
    partition-less windows, no Python UDFs. The cumulative-distinct
    running sum is the HIERARCHICAL prefix sum — month-partitioned
    windows plus month-base offsets — whose offset build joins the
    month table to itself (strictly-earlier months): calendar-bounded
    build side at any data scale, the sanctioned bounded-broadcast
    shape. The count-min sketch join must broadcast (256 cells by
    geometry) and OHLC must contain no Window at all (struct extrema,
    not per-bar sorts)."""
    from fitness_data_ingest_spark.plans import lint_plan
    from fitness_data_ingest_spark.registry_r5b import R5B_QUERIES

    bounded_bcast_ok = {
        "events_cumulative_distinct",
        # 1-row date-bounds scalar attach (q14/q22 shape) + the file-grain
        # overlap self-join over a configuration-constant build side
        "layout_zonemap_overlap",
        # SQ8's 1-row bounds attach + the k-row centroid expansion per
        # Lloyd round (the embed_cluster_assign sanctioned shape)
        "embed_kmeans_lloyd",
        # 1-row budget scalar attach + the 128-row bucket-offset
        # self-join (the hierarchical-prefix-sum bounded build)
        "corpus_token_budget_sample",
        # three 1-row count scalars combined (q14 scalar-attach shape)
        "dedup_lsh_recall_eval",
        # per-round (n_nodes, n_edges, kept) 1-row count scalars
        # combined (q14 scalar-attach shape, three per peel round)
        "graph_kcore_peel",
    }
    for name, q in R5B_QUERIES.items():
        findings = [
            f
            for f in lint_plan(
                q.spark(spark, sf_dir),
                allow_nested_loop=name in bounded_bcast_ok,
            )
            if f["severity"] == "high"
        ]
        assert findings == [], (name, findings)
    plan = plan_of(R5B_QUERIES["ts_ohlc_bars"].spark(spark, sf_dir), "simple")
    assert "Window" not in plan, plan[:800]
    plan = plan_of(
        R5B_QUERIES["agg_countmin_heavy"].spark(spark, sf_dir), "simple"
    )
    assert "BroadcastHashJoin" in plan, plan[:800]


# ---------------------------------------------- plan-fingerprint baseline


def test_plan_fingerprints_match_baseline(
    registry_plan_artifacts, sf_dir
):
    """Every registry key's normalized physical-plan hash must equal the
    committed PLANHASH.json baseline (verdict r4 item 5, made
    structural): a driver-green key whose plan moves without a
    _FORCE_REVERIFY entry would keep a STALE green correctness row —
    the exact failure mode this repo hand-audited in rounds 3-4.

    On an intentional rewrite: add/refresh the key in
    registry._FORCE_REVERIFY (so the driver re-verifies the new plan)
    and regenerate the baseline with
    ``SPARK_GRAFT_PLANHASH_REGEN=1 python -m pytest
    tests/test_plans.py -k fingerprints``.

    Runs only at the default sf0.001 fixture (plan shapes — e.g. AQE
    partition specs — may differ at other SFs). Fingerprints come from
    the shared ``registry_plan_artifacts`` fixture, whose construction
    protocol (one clearCache, sorted order, fingerprint inline) is
    byte-identical to how the baseline is recorded."""
    import json
    import os

    from fitness_data_ingest_spark.registry import _FORCE_REVERIFY

    if not sf_dir.rstrip("/").endswith("sf0.001"):
        pytest.skip("baseline is recorded against sf0.001 plans")

    baseline_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLANHASH.json",
    )
    current = {
        name: fp
        for name, (fp, _plan, _fmt) in registry_plan_artifacts.items()
    }

    if os.environ.get("SPARK_GRAFT_PLANHASH_REGEN"):
        with open(baseline_path, "w") as f:
            json.dump(current, f, indent=1, sort_keys=True)
        return

    assert os.path.exists(baseline_path), (
        "PLANHASH.json missing — regenerate with "
        "SPARK_GRAFT_PLANHASH_REGEN=1"
    )
    with open(baseline_path) as f:
        baseline = json.load(f)

    new_keys = sorted(set(current) - set(baseline))
    assert not new_keys, (
        f"keys missing from PLANHASH.json (regenerate at registration): "
        f"{new_keys}"
    )
    stale = sorted(set(baseline) - set(current))
    assert not stale, f"PLANHASH.json has removed keys (regenerate): {stale}"
    moved = sorted(n for n in current if current[n] != baseline[n])
    assert not moved, (
        f"physical plan changed for {moved} — if intentional, add these "
        f"keys to registry._FORCE_REVERIFY and regenerate PLANHASH.json "
        f"(SPARK_GRAFT_PLANHASH_REGEN=1); current _FORCE_REVERIFY: "
        f"{sorted(_FORCE_REVERIFY)}"
    )


def test_r6_stat_family_plan_shapes(spark, sf_dir):
    """Round-6 statistics keys: no cartesian products anywhere; every
    BroadcastNestedLoopJoin is a sanctioned bounded-build attach —
    the 1-row totals scalar (KS/MWU/chi2/BH/bootstrap point estimate),
    the m-hypothesis rank self-join (m = #groups, data-scale-free), or
    the 64-replicate bootstrap rank self-join (B is a constant).
    Additionally the two-sample machinery must never plan a
    partition-less window: its windows are coarse-bucket-partitioned by
    construction."""
    from fitness_data_ingest_spark.registry_r6 import R6_QUERIES

    for name, q in R6_QUERIES.items():
        if not name.startswith("stat_"):
            continue
        plan = plan_of(q.spark(spark, sf_dir), "simple")
        assert "CartesianProduct" not in plan, name

    for name in ("stat_ks_test", "stat_mannwhitney_u"):
        plan = plan_of(R6_QUERIES[name].spark(spark, sf_dir), "simple")
        # every Window must carry a partition spec (hierarchical prefix)
        import re

        for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
            assert m.group(1).strip(), f"{name}: partition-less window\n{plan[:600]}"


def test_survival_km_no_unbounded_cartesian(spark, sf_dir):
    """VERDICT r11 item 8: events_survival_km's two bucket-offset
    inequality self-joins sit behind eager checkpoints (no size
    estimates), so the explicit F.broadcast hints are what keep them
    BNLJ-over-bounded-build. The r11 committed after-plan showed them
    as CartesianProduct — a capture-state artifact that no longer
    reproduces — and the key sat outside every no-cartesian gate. Gate
    it: no CartesianProduct; BNLJ is sanctioned ONLY because both build
    sides are bucket-grain (dur_h div KM_BUCKET — a handful of rows at
    ANY event volume, the bounded-side allowance)."""
    from fitness_data_ingest_spark.registry import all_queries

    spark.catalog.clearCache()
    plan = plan_of(
        all_queries()["events_survival_km"].spark(spark, sf_dir), "simple"
    )
    assert "CartesianProduct" not in plan, plan[:800]
    assert "BroadcastNestedLoopJoin" in plan  # the sanctioned shape


def test_r6_feature_family_plan_shapes(spark, sf_dir):
    """Feature keys: no cartesian products; BNLJ only as sanctioned
    bounded attaches (1-row totals, closed-enum parameter tables, the
    4-feature rank self-join). feature_onehot_encode must stay
    scan-only: no join, no aggregate anywhere in its plan (the final
    sort is presentation order, not computation)."""
    from fitness_data_ingest_spark.registry_r6 import R6_QUERIES

    for name, q in R6_QUERIES.items():
        if not name.startswith("feature_"):
            continue
        plan = plan_of(q.spark(spark, sf_dir), "simple")
        assert "CartesianProduct" not in plan, name

    oh = plan_of(R6_QUERIES["feature_onehot_encode"].spark(spark, sf_dir), "simple")
    assert "Join" not in oh and "Aggregate" not in oh, oh[:600]


def test_r6_text_family_plan_shapes(spark, sf_dir):
    """Round-6 text keys: no cartesian products; BNLJ only as the
    sanctioned 1-row scalar attaches (trigram N+V, tertile thresholds,
    doc total). The trigram-count join in perplexity_bucket must
    broadcast (vocabulary is charset-bounded) and no text key may plan
    a partition-less window."""
    import re

    from fitness_data_ingest_spark.registry_r6 import R6_QUERIES

    for name in ("text_gopher_rules", "text_ngram_novelty", "text_perplexity_bucket"):
        plan = plan_of(R6_QUERIES[name].spark(spark, sf_dir), "simple")
        assert "CartesianProduct" not in plan, name
        for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
            assert m.group(1).strip(), f"{name}: partition-less window"

    ppl = plan_of(R6_QUERIES["text_perplexity_bucket"].spark(spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in ppl, ppl[:600]


def test_r6_misc_family_plan_shapes(spark, sf_dir):
    """Round-6 misc keys: HITS iterates via broadcast joins (rank
    tables are node-grain) over a persisted edge list; the weighted
    sample's global top-k is TakeOrderedAndProject (never a global
    sort/window); seasonal decompose and the dedup fold plan no
    nested-loop join at all (their only BNLJ-shaped candidates were
    designed out: the moving average is a scatter aggregate, the fold
    is in-array)."""
    from fitness_data_ingest_spark.registry_r6 import R6_QUERIES

    hits = plan_of(R6_QUERIES["graph_hits"].spark(spark, sf_dir), "simple")
    spark.catalog.clearCache()
    assert "CartesianProduct" not in hits
    assert "BroadcastHashJoin" in hits

    wrs = plan_of(R6_QUERIES["sample_weighted_units"].spark(spark, sf_dir), "simple")
    assert "TakeOrderedAndProject" in wrs, wrs[:600]
    assert "CartesianProduct" not in wrs

    for name in ("ts_seasonal_decompose", "stream_dedup_late"):
        plan = plan_of(R6_QUERIES[name].spark(spark, sf_dir), "simple")
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "Window" not in plan, name


def test_r6_wave2_plan_shapes(spark, sf_dir):
    """Wave-2 keys: window_range_frame's only Window partitions by
    user (never partition-less); the permutation/epoch keys carry no
    cartesian product and only bounded-build BNLJ (1-row obs/total
    scalars); the GIF key plans exactly one exchange of control rows
    (explicit partition count, SCALING.md §14) and zero joins."""
    import re

    from fitness_data_ingest_spark.registry_r6 import R6_QUERIES

    wrf = plan_of(R6_QUERIES["window_range_frame"].spark(spark, sf_dir), "simple")
    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", wrf):
        assert m.group(1).strip(), "partition-less window in range frame"

    for name in ("corpus_epoch_schedule", "stat_permutation_test"):
        plan = plan_of(R6_QUERIES[name].spark(spark, sf_dir), "simple")
        assert "CartesianProduct" not in plan, name

    gif = plan_of(
        R6_QUERIES["multimodal_gif_roundtrip"].spark(spark, sf_dir), "simple"
    )
    assert "Join" not in gif, gif[:600]


def test_r6_wave3_plan_shapes(spark, sf_dir):
    """Wave-3 keys: the Jaccard wedge join is equi on the capped
    center (no cartesian; BNLJ only in the bounded top-k rank
    self-join); blocking_recall runs at the distinct-entity grain with
    no join wider than the 3-strategy explode."""
    from fitness_data_ingest_spark.registry_r6 import R6_QUERIES

    for name in ("graph_neighborhood_jaccard", "er_blocking_recall"):
        plan = plan_of(R6_QUERIES[name].spark(spark, sf_dir), "simple")
        assert "CartesianProduct" not in plan, name


def test_r6_wave4_plan_shapes(spark, sf_dir):
    """Wave-4 keys: histogram/DiD/regression are single-scan
    aggregates with only 1-row broadcast attaches; class balance must
    plan the SALTED two-level top-k (no single global window over the
    fact); survival KM's windows are all coarse-bucket-partitioned."""
    import re

    from fitness_data_ingest_spark.registry_r6 import R6_QUERIES

    for name in (
        "agg_equiwidth_histogram",
        "events_did_estimator",
        "stat_multiple_regression",
        "sample_class_balance",
        "events_survival_km",
    ):
        plan = plan_of(R6_QUERIES[name].spark(spark, sf_dir), "simple")
        assert "CartesianProduct" not in plan, name

    km = plan_of(R6_QUERIES["events_survival_km"].spark(spark, sf_dir), "simple")
    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", km):
        assert m.group(1).strip(), "partition-less window in KM"


def test_r6_wave5_plan_shapes(spark, sf_dir):
    """Wave-5 keys: ANOVA/Welch/freshness are single-scan aggregates
    with 1-row broadcast attaches; Theil-Sen's pair join is the
    sanctioned calendar-bounded self-join of the HOUR-grain aggregate
    (never the raw events), and its median machinery plans only
    bucket-partitioned windows."""
    import re

    from fitness_data_ingest_spark.registry_r6 import R6_QUERIES

    for name in (
        "stat_anova_oneway",
        "stat_welch_ttest",
        "dq_freshness_audit",
        "ts_theil_sen",
    ):
        plan = plan_of(R6_QUERIES[name].spark(spark, sf_dir), "simple")
        assert "CartesianProduct" not in plan, name

    ts = plan_of(R6_QUERIES["ts_theil_sen"].spark(spark, sf_dir), "simple")
    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", ts):
        assert m.group(1).strip(), "partition-less window in theil_sen"


def test_r6b_family_plan_shapes(registry_plan_artifacts):
    """Round-6b (r6b) keys: no cartesian products; every
    BroadcastNestedLoopJoin is a sanctioned bounded-build attach (1-row
    totals/midpoint/signs scalars, the <=256-row bucket-offset
    triangular joins, the stratum/decile-grain rank self-joins, the
    <=k-row MMR selected set); no row-at-a-time Python UDFs (the tar
    codec's mapInPandas is Arrow-batched ArrowEvalPython, which is the
    allowed node); and no partition-less windows anywhere except the
    none-existent — every window in the family is coarse-bucket- or
    group-partitioned by construction."""
    import re

    from fitness_data_ingest_spark.registry_r6b import R6B_QUERIES

    for name in R6B_QUERIES:
        _fp, plan, formatted = registry_plan_artifacts[name]
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", formatted):
            first = m.group(1).split(",")[0].strip()
            assert not (
                first.endswith(" ASC") or first.endswith(" DESC")
            ), f"{name}: partition-less window: {m.group(0)[:160]}"


def test_r7_family_plan_shapes(spark, sf_dir):
    """Round-7 keys: the two stat keys are one fact scan to the user
    grain + a 1-row global aggregate — no join, no window, no cartesian
    anywhere; the three roundtrip keys scan their sink-format files
    back with an explicit schema (no inference pass) and aggregate with
    a plain partial-aggregated groupBy — no join, no window. The QTE
    key may join — but only broadcasts (bucket offsets, arm totals)
    plus the sanctioned 4-row percentile-grid BNLJ — and its windows
    must all carry the (arm, bucket) partition spec. Python never
    appears in any plan."""
    import re

    from fitness_data_ingest_spark.registry_r7 import R7_QUERIES

    for name, q in R7_QUERIES.items():
        plan = plan_of(q.spark(spark, sf_dir), "simple")
        assert "CartesianProduct" not in plan, name
        assert "Python" not in plan and "BatchEvalPython" not in plan, name
        assert "HashAggregate" in plan or "SortAggregate" in plan, name
        if name == "events_quantile_treatment_effect":
            # joins allowed, but every hash join must broadcast and
            # every window must carry a partition spec
            assert "SortMergeJoin" not in plan, plan[:800]
            assert "ShuffledHashJoin" not in plan, plan[:800]
            for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
                assert m.group(1).strip(), f"{name}: partition-less window"
        else:
            assert "BroadcastNestedLoopJoin" not in plan, name
            assert "Window" not in plan, name
            assert "Join" not in plan, name

#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes fully via the no-op sink (forces the whole plan —
``count()`` would let Catalyst prune payload columns).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fitness_data_ingest_spark.registry import all_queries  # noqa: E402
from fitness_data_ingest_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "tpch_q1",
    "tpch_q3_top10",
    "tpch_q4_semi",
    "tpch_q5_region",
    "tpch_q6_filter_agg",
    "tpch_q7_binations",
    "tpch_q10_returns",
    "tpch_q14_promo",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive",
    "tpch_q2_mincost",
    "tpch_q8_mktshare",
    "tpch_q9_profit",
    "tpch_q11_important",
    "tpch_q12_latemode",
    "tpch_q13_distribution",
    "tpch_q15_topsupp",
    "tpch_q16_partsupp",
    "tpch_q17_smallqty",
    "tpch_q20_excess",
    "tpch_q21_waiting",
    "tpch_q22_dormant",
    "flagship_pipeline",
    "join_broadcast",
    "join_range_interval",
    "pivot_key_value",
    "window_row_number",
    "window_tumbling",
    "window_session",
    "join_asof",
    "agg_percentiles",
    "dedup_exact_hash",
    "dedup_clusters",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "text_quality_score",
    "text_tfidf",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_lsh_multitable",
    "ann_knn_classify",
    "embed_cluster_assign",
    "text_quality_filter",
    "text_length_histogram",
    "corpus_pack_chunks",
    "corpus_vocab_topk",
    "corpus_mixture_sample",
    "text_pii_redact",
    "embed_dim_stats",
    "events_anomaly_zscore",
    "events_funnel",
    "stream_interval_join",
    "ts_resample_ffill",
    "ts_rolling_hour_avg",
    "scd2_merge",
    "agg_cube",
    "er_fuzzy_pairs",
    "events_retention_cohort",
    "join_salted_skew",
    "corpus_curation_funnel",
    "affinity_part_pairs",
    "agg_incremental_merge",
    "files_compaction_plan",
    "zorder_locality",
    "feature_quantile_bin",
    "events_key_skew",
    "dq_audit_lineitem",
    "window_topk",
    "agg_dispersion",
    "events_gap_stats",
    "events_transition_matrix",
    "text_keywords_topk",
    "corpus_split_assign",
    "orders_seasonality",
    "agg_grouping_sets",
    "events_hour_heatmap",
]


def _prev_bench() -> dict | None:
    """Latest recorded BENCH_r{N}.json — the regression baseline."""
    here = os.path.dirname(os.path.abspath(__file__))
    best: tuple[int, str] | None = None
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), p)
    if best is None:
        return None
    try:
        with open(best[1]) as f:
            data = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    # the driver records {"n":..,"rc":..,"parsed": <our JSON line>}
    return data.get("parsed", data) if isinstance(data, dict) else None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(
        app_name="fdis-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    registry = all_queries()

    # JVM + whole-stage-codegen warmup: run every headline plan once at
    # the smallest SF so timings measure data processing, not Janino
    # compilation (which is identical plan-shape work either way).
    warm_dir = "/root/testdata/sf0.001"
    for name in HEADLINE:
        try:
            registry[name].spark(spark, warm_dir).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception:
            pass

    # min of 2 measured runs per query (3 for multi-second queries, whose
    # many-job pipelines are the most GC/scheduler-noise-sensitive): JVM
    # JIT/GC pauses and page-cache state add multi-x noise to single runs
    # locally; min-of-N is the standard estimator for the plan's actual
    # cost.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        runs = 0
        while runs < 2 or (runs < 3 and best > 1.5):
            # drop persisted intermediates: Spark's cache manager matches
            # canonicalized plans, so a repeat run would otherwise reuse
            # run 1's persist() data and under-report the real cost
            spark.catalog.clearCache()
            # construction is inside the timer: iterative operators
            # (connected components) execute during construction
            start = time.perf_counter()
            df = registry[name].spark(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - start)
            runs += 1
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # regression tracking vs the last recorded round (fail-soft: flagged
    # in the output + stderr, never a nonzero exit — the driver needs
    # the JSON line either way)
    prev = _prev_bench()
    if prev and isinstance(prev.get("queries"), dict) and prev.get("sf") == out["sf"]:
        vs_prev = {
            name: round(timings[name] / prev["queries"][name], 2)
            for name in timings
            if isinstance(prev["queries"].get(name), (int, float))
            and prev["queries"][name] > 0
        }
        out["vs_prev"] = vs_prev
        regressions = sorted(n for n, r in vs_prev.items() if r > 1.5)
        out["regressions"] = regressions
        if regressions:
            print(f"WARN: >1.5x regressions vs previous round: {regressions}",
                  file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

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
    "multimodal_decode",
    "merge_upsert",
    "unpivot_melt",
    "array_hof_battery",
    "er_edit_distance",
    "graph_pagerank",
    "ann_sq8_topk",
    "corpus_chunk_overlap",
    "multimodal_frame_sample",
    "graph_triangles",
    "text_rarity_score",
    "ts_downsample_maxarea",
    "events_sessionize",
    "ts_ewma",
    "range_join_events",
    "orders_pareto",
    "corpus_domain_cap",
    "embed_corr_matrix",
    "table_diff_snapshot",
    "dedup_simhash_pairs",
    "ann_recall_eval",
    "events_rfm_segment",
    "affinity_lift_topk",
    "corpus_dedup_rate_by_source",
    "events_streak_islands",
    "ivm_join_delta",
    "corpus_mixture_plan",
    "json_variant_extract",
    "sql_recursive_reach",
    "sql_lateral_topn",
    "corpus_cdc_chunks",
    "events_cusum_alerts",
    "multimodal_audio_features",
    "dedup_containment_pairs",
    "events_forecast_backtest",
    "events_ab_test",
    "orders_cohort_ltv",
    "events_active_users",
    "events_path_topk",
    "events_anomaly_mad",
    "join_asof_nearest",
    "join_asof_forward",
    "corpus_vocab_drift",
    "dedup_threshold_sweep",
]


def _prev_full_record() -> dict | None:
    """The FULL bench record (``BENCH_LATEST.json``) as committed at
    the previous round's bench commit — the same ref the A/B archives.
    The compact driver line truncates ``queries`` under its ~1900-char
    budget (the r10 line kept 4 of 324 once ab_ratio/ab_ref joined it),
    which would silently collapse the cross-round regression gate's
    coverage to those few keys; the committed full record carries all
    of them plus the isolated tail. None if unresolvable — the parsed
    driver lines below are the fallback."""
    import importlib.util
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        spec = importlib.util.spec_from_file_location(
            "bench_ab", os.path.join(here, "tools", "bench_ab.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        ref = mod.prev_round_ref(here)
        if not ref:
            return None
        out = subprocess.run(
            ["git", "show", f"{ref}:BENCH_LATEST.json"],
            cwd=here,
            capture_output=True,
            text=True,
            timeout=60,
            check=True,
        ).stdout
        data = json.loads(out)
    except Exception:
        return None
    if (
        isinstance(data, dict)
        and isinstance(data.get("queries"), dict)
        and data["queries"]
    ):
        return data
    return None


def _prev_bench() -> dict | None:
    """Latest recorded bench with a usable record — the regression
    baseline. Preference order: the FULL record at the previous bench
    commit (every key, not the compact line's truncated few), then the
    newest parsed BENCH_r{N}.json driver line. A round whose driver
    capture overflowed ("parsed": null, round 2's fate) is skipped in
    favor of the newest earlier round that parsed."""
    full = _prev_full_record()
    if full is not None:
        return full
    here = os.path.dirname(os.path.abspath(__file__))
    rounds: list[tuple[int, str]] = []
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            rounds.append((int(m.group(1)), p))
    for _, path in sorted(rounds, reverse=True):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(data, dict):
            continue
        # the driver records {"n":..,"rc":..,"parsed": <our JSON line>}
        parsed = data.get("parsed", data)
        if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
            return parsed
    return None


def adjudicate_regressions(
    vs_prev: dict[str, float],
    prev_queries: dict[str, float],
    threshold: float,
    isolated: dict[str, float],
    measure_isolated,
    prev_isolated: dict[str, float] | None = None,
    flag_floor: float = 1.25,
) -> tuple[list[str], dict[str, dict[str, float]]]:
    """VERDICT r6 item 4: adjudicate every in-sweep regression flag by
    an isolated min-of-3 re-run BEFORE recording it. Both r6 flags
    (table_bloom_prune_audit 1.37x in-sweep / 0.91x isolated;
    ann_lsh_multitable 1.22x / 0.66x) were in-sweep noise that an
    isolated re-run after a GC settle dissolves — so the recorded
    ``regressions`` list contains only isolation-surviving entries and
    the raw evidence for each flag lands in ``regression_adjudication``.

    Two r7-verdict refinements:

    - LIKE-FOR-LIKE baseline (ADVICE r7): isolated runs measure only
      0.66-0.91x of the same key's in-sweep time, so dividing a current
      ISOLATED number by the previous round's IN-SWEEP number can
      adjudicate a genuine ~1.5-2x plan regression away as noise purely
      from the measurement-mode gap. When the key has an isolated
      measurement in the previous record (``prev_isolated``), the
      isolated ratio is computed against THAT; the fallback to prev
      in-sweep is recorded in the evidence as ``baseline``.
    - ALWAYS-ON evidence (VERDICT r7 item 6): every in-sweep flag at or
      above ``flag_floor`` (not only super-threshold candidates) gets an
      isolated measurement recorded, so cross-round drift clusters like
      r7's 1.3x graph/embed block stay attributable to box weather vs
      plans without re-running anything by hand. Only super-threshold
      LIKE-FOR-LIKE survivors land in ``regressions``.

    ``isolated`` is the already-measured isolated-tail cache; names not
    in it are measured via ``measure_isolated`` and written back so the
    record's ``isolated_tail`` carries every adjudication measurement.

    ADVICE r8: the clamped threshold (1.5 x clamped median) drops below
    ``flag_floor`` whenever the round's median ratio is < 0.833 —
    exactly the shape of an optimization round — so iterating only
    ``>= flag_floor`` would silently skip super-threshold sub-floor
    flags that the regression gate exists to catch. The adjudication
    cut is therefore ``min(flag_floor, threshold)``.
    """
    prev_isolated = prev_isolated or {}
    adjudication: dict[str, dict[str, float]] = {}
    regressions: list[str] = []
    cut = min(flag_floor, threshold)
    for name in sorted(n for n, r in vs_prev.items() if r >= cut):
        iso = isolated.get(name)
        if iso is None:
            iso = measure_isolated(name)
            isolated[name] = iso
        prev_iso = prev_isolated.get(name)
        if isinstance(prev_iso, (int, float)) and prev_iso > 0:
            base, base_kind = float(prev_iso), "prev_isolated"
        else:
            base, base_kind = prev_queries[name], "prev_in_sweep"
        iso_ratio = round(iso / base, 2)
        adjudication[name] = {
            "in_sweep_ratio": vs_prev[name],
            "isolated_sec": iso,
            "isolated_ratio": iso_ratio,
            "baseline": base_kind,
        }
        # VERDICT r9 item 2: the isolated like-for-like ratio IS the
        # evidence — it alone decides. The old AND-condition (in-sweep
        # ratio must ALSO exceed threshold) made a key with a quiet
        # in-sweep ratio but a bad isolated ratio structurally unable
        # to land in ``regressions`` (r9: dedup_lsh_recall_eval at
        # isolated 2.41 / in-sweep 1.45 could never flag) — exactly the
        # shape caching interactions produce. In-sweep is only the
        # trigger to measure.
        if iso_ratio > threshold:
            regressions.append(name)
    return regressions, adjudication


# Keys under a standing same-session A/B watch: the list holds ONLY
# keys pending a clean like-for-like ab_ratio — add a key when a flag
# appears on an unchanged plan, remove it the round its ab_ratio comes
# back clean (else the list stops meaning anything; VERDICT r10 item 2).
# r9's two entries (events_markov_stationary, ts_theil_sen) measured
# clean 1.05/1.07 against the r9 bench commit — retired, recorded in
# BENCH_r10.json. Keys batch-dissolved as weather WITHOUT their own
# A/B measurement additionally queue here automatically via the
# previous record's ``ab_watch_next`` (VERDICT r11 item 9) — see
# ``watch_from_prev``.
AB_WATCH: tuple[str, ...] = ()

# Fixed sentinel key set for the isolated tail (VERDICT r11 item 5):
# ALWAYS isolated-measured regardless of in-sweep cost or core count,
# so the c8 and c32 compact lines share keys and the driver can compute
# cross-core scaling ratios (they previously shared none — the tail's
# membership was run-dependent). Chosen = the current top cost centers.
SENTINEL_TAIL: tuple[str, ...] = (
    "affinity_lift_topk",
    "ann_lsh_multitable",
    "corpus_cdc_chunks",
    "dedup_lsh_recall_eval",
    "dedup_ngram_jaccard",
    "dedup_threshold_sweep",
    "embed_matryoshka_recall",
    "embed_pq_adc",
    "graph_hits",
    "multimodal_image_dedup",
    "ts_isotonic_fit",
    "ts_theil_sen",
)


def watch_from_prev(prev: dict | None) -> tuple[str, ...]:
    """The effective A/B watch list: the static AB_WATCH plus every key
    the PREVIOUS record batch-dissolved without its own measurement
    (``ab_watch_next``) — dissolved keys must earn a clean ab_ratio the
    following round instead of vanishing (VERDICT r11 item 9; the
    list's own contract)."""
    carried = prev.get("ab_watch_next") if isinstance(prev, dict) else None
    if not isinstance(carried, list):
        carried = []
    seen = list(AB_WATCH)
    for k in carried:
        if isinstance(k, str) and k not in seen:
            seen.append(k)
    return tuple(seen)


def ab_keys_to_measure(
    regressions: list[str],
    adjudication: dict[str, dict],
    registry_keys,
    watch: tuple[str, ...] = AB_WATCH,
    cap: int = 6,
) -> list[str]:
    """Which keys get the same-session old-vs-new A/B: the standing
    watch list first, then isolated-confirmed regression flags worst
    ratio first, capped so a bad-weather round cannot turn the bench
    into an hour of A/Bs."""
    keys = [k for k in watch if k in registry_keys]
    flagged = sorted(
        (k for k in regressions if k not in keys),
        key=lambda n: -adjudication.get(n, {}).get("isolated_ratio", 0.0),
    )
    keys += flagged
    return keys[:cap]


def run_ab_subprocess(keys: list[str], sf_dir: str, timeout_sec: int = 900) -> dict:
    """Run tools/bench_ab.py --json in its own PROCESS GROUP so a hang
    (a stuck Spark worker) is killable as a tree — bench must emit its
    JSON line no matter what the A/B does. Returns the parsed dict, or
    {"_err": ...} on any failure (fail-soft, like the regression gate)."""
    import signal
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    cmd = [
        sys.executable,
        os.path.join(here, "tools", "bench_ab.py"),
        "--json",
        "--sf-dir",
        sf_dir,
        *keys,
    ]
    proc = subprocess.Popen(
        cmd,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,
    )
    try:
        out, _ = proc.communicate(timeout=timeout_sec)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
        except Exception:
            pass
        return {"_err": f"ab_timeout_{timeout_sec}s"}
    if proc.returncode != 0:
        return {"_err": f"ab_exit_{proc.returncode}"}
    try:
        return json.loads(out.strip().splitlines()[-1])
    except Exception:
        return {"_err": "ab_unparseable_output"}


def apply_ab_results(
    ab: dict,
    adjudication: dict[str, dict],
    regressions: list[str],
    threshold: float,
) -> list[str]:
    """Fold A/B measurements into the adjudication evidence and return
    the FINAL regressions list: where an ``ab_ratio`` exists it is the
    decision-grade signal (same-sitting, same-weather) and overrides
    the isolated cross-round ratio in both directions; keys without A/B
    data keep their isolated-based verdict. Never drops evidence —
    every A/B row lands in the adjudication record.

    The A/B sample also adjudicates THE BATCH (r11): a hot sitting can
    inflate a dozen keys' isolated ratios at once, while the A/B cap
    measures only the worst few — observed live when 18 flags appeared
    on a 1.12x-median round and all 6 A/B'd worst offenders came back
    clean (0.77-1.30). ``ab_keys_to_measure`` sends flags worst-first
    by isolated_ratio, so when EVERY A/B-measured flag dissolves as
    weather, any remaining flag with a milder isolated ratio than the
    measured floor is weather by dominance — removed from the list,
    tagged ``weather_dissolved`` in its adjudication row (the evidence
    stays). If even ONE measured flag confirms, nothing is dissolved:
    the sample proved the sitting can carry real regressions."""
    final = list(regressions)
    measured_flags: dict[str, float] = {}
    for key, row in ab.items():
        if key.startswith("_") or not isinstance(row, dict):
            continue
        adjudication.setdefault(key, {}).update(row)
        ratio = row.get("ab_ratio")
        if isinstance(ratio, (int, float)):
            if key in regressions:
                measured_flags[key] = ratio
            if ratio > threshold and key not in final:
                final.append(key)
            elif ratio <= threshold and key in final:
                final.remove(key)
    if measured_flags and all(
        r <= threshold for r in measured_flags.values()
    ):
        floor = min(
            adjudication.get(k, {}).get("isolated_ratio", float("inf"))
            for k in measured_flags
        )
        for key in list(final):
            row = adjudication.get(key, {})
            iso = row.get("isolated_ratio")
            if (
                "ab_ratio" not in row
                and isinstance(iso, (int, float))
                and iso <= floor
            ):
                final.remove(key)
                row["weather_dissolved"] = True
    return final


def compact_line(out: dict, budget: int = 1900) -> str:
    """ONE stdout JSON line that fits the driver's 2000-char tail
    capture (round 2's record was "parsed": null because the line
    overflowed it). If the full queries dict doesn't fit, keep the
    slowest entries and point at BENCH_LATEST.json for the rest."""
    timings = out["queries"]
    line_out = {k: out[k] for k in ("metric", "value", "unit", "queries", "sf")}
    # the isolated tail is small (10 keys) and is the half of the
    # record that makes round-over-round deltas interpretable — it must
    # reach the driver's capture, so it rides ahead of the full
    # queries dict in the truncation order
    if isinstance(out.get("isolated_tail"), dict):
        line_out["isolated_tail"] = out["isolated_tail"]
    # one-time shared-stage builds (2 entries) — the honesty note for
    # every per-key timing that reads the materialized edge stage
    if isinstance(out.get("shared_stages_sec"), dict):
        line_out["shared_stages_sec"] = out["shared_stages_sec"]
    # same-session A/B ratios are the round's decision-grade regression
    # evidence (VERDICT r10 item 1) — tiny, and they must reach the
    # driver's capture even when the queries dict is truncated
    if isinstance(out.get("regression_adjudication"), dict):
        ab = {
            k: v["ab_ratio"]
            for k, v in out["regression_adjudication"].items()
            if isinstance(v, dict) and isinstance(v.get("ab_ratio"), (int, float))
        }
        if ab:
            line_out["ab_ratio"] = ab
    if out.get("ab_ref"):
        line_out["ab_ref"] = out["ab_ref"]
    if out.get("ab_err"):
        line_out["ab_err"] = out["ab_err"]
    line = json.dumps(line_out, separators=(",", ":"))
    if len(line) <= budget:
        return line
    line_out["n_queries"] = len(timings)
    line_out["full_record"] = "BENCH_LATEST.json"
    # an adjudication-heavy round can push the isolated tail to 40+
    # entries, which would squeeze the in-sweep queries dict to ZERO
    # before the tail truncation below even runs — cap the tail first
    # (sentinels survive, then slowest) so the driver line always
    # carries both halves of the record
    iso_full = line_out.get("isolated_tail")
    if isinstance(iso_full, dict) and len(iso_full) > 24:
        keep_iso = sorted(
            iso_full, key=lambda n: (n not in SENTINEL_TAIL, -iso_full[n])
        )[:24]
        line_out["isolated_tail"] = {
            n: iso_full[n] for n in sorted(keep_iso)
        }
    by_cost = sorted(timings, key=timings.get, reverse=True)
    keep = len(by_cost)
    while keep > 0:
        line_out["queries"] = {n: timings[n] for n in sorted(by_cost[:keep])}
        line = json.dumps(line_out, separators=(",", ":"))
        if len(line) <= budget:
            return line
        keep -= 1
    line_out["queries"] = {}
    # still over budget (the isolated tail now covers every >2 s key,
    # VERDICT r10 item 5, so it can be ~30 entries): shed the shared-
    # stage note, then truncate the isolated tail slowest-first — the
    # full record keeps everything either way
    line_out.pop("shared_stages_sec", None)
    iso = line_out.get("isolated_tail")
    if isinstance(iso, dict) and iso:
        # sentinel keys survive truncation first (they are the driver's
        # cross-core scaling anchors), then slowest-first
        iso_by_cost = sorted(
            iso, key=lambda n: (n not in SENTINEL_TAIL, -iso[n])
        )
        keep = len(iso_by_cost)
        while keep >= 0:
            line_out["isolated_tail"] = {
                n: iso[n] for n in sorted(iso_by_cost[:keep])
            }
            line = json.dumps(line_out, separators=(",", ":"))
            if len(line) <= budget:
                return line
            keep -= 1
    return json.dumps(line_out, separators=(",", ":"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(
        app_name="fdis-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    registry = all_queries()

    # The curated HEADLINE list orders the interesting plans first; every
    # remaining registry key is appended so the bench record covers the
    # WHOLE registry (a key added to the registry is benchmarked the same
    # round it first appears — nothing can drift out of coverage).
    headline = list(HEADLINE) + sorted(k for k in registry if k not in HEADLINE)

    # JVM + whole-stage-codegen warmup: run every headline plan once at
    # the smallest SF so timings measure data processing, not Janino
    # compilation (which is identical plan-shape work either way).
    warm_dir = "/root/testdata/sf0.001"
    for name in headline:
        try:
            registry[name].spark(spark, warm_dir).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception:
            pass

    # Adaptive min-of-N per query: JVM JIT keeps improving sub-second
    # queries through run 4-5 (measured: tpch_q1 0.95→0.61 over 5 runs),
    # so a fixed min-of-2 records warmup, not the plan's cost — the
    # round-2/3 phantom "regressions" were exactly this. Run until the
    # best stops improving by >5% (minimum 3 runs), capped at 5 (3 for
    # multi-second queries, where one extra run costs more than the
    # noise it removes).
    timings: dict[str, float] = {}
    for name in headline:
        best = float("inf")
        runs = 0
        # settle the JVM between queries: a full-registry session
        # accumulates GC debt from the heavy pair-generating queries,
        # and without this the NEXT query's min-of-N absorbs the pause
        # (measured: events_funnel 2.4 s mid-bench vs 0.67 s isolated)
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        while True:
            # drop persisted intermediates: Spark's cache manager matches
            # canonicalized plans, so a repeat run would otherwise reuse
            # run 1's persist() data and under-report the real cost
            spark.catalog.clearCache()
            # construction is inside the timer: iterative operators
            # (connected components) execute during construction
            start = time.perf_counter()
            df = registry[name].spark(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            took = time.perf_counter() - start
            improved = took < best * 0.95
            best = min(best, took)
            runs += 1
            cap = 3 if best > 1.5 else 5
            if runs >= cap or (runs >= 3 and not improved):
                break
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)

    # Isolated re-measurement of the slow tail (verdict r4 item 8):
    # the sweep's numbers carry whatever GC/JIT state the previous 200
    # queries left behind, which is exactly where round-over-round
    # comparisons drowned in box weather. Re-run min-of-3 after a GC
    # settle each, so the record separates environment from plan cost
    # BY CONSTRUCTION: a key slow in-sweep but fast isolated is session
    # debt, not a plan regression. Coverage (VERDICT r10 item 5): EVERY
    # key whose in-sweep cost exceeds 2 s — r9's corpus_cdc_chunks flag
    # had to adjudicate against the wrong measurement mode because only
    # the 10 slowest carried an isolated baseline — plus the 10 slowest
    # as a floor so quiet rounds still record a comparable tail.
    by_cost = sorted(timings, key=timings.get, reverse=True)
    tail = [
        n
        for i, n in enumerate(by_cost)
        if i < 10 or timings[n] > 2.0 or n in SENTINEL_TAIL
    ]
    isolated: dict[str, float] = {}
    for name in tail:
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        best = float("inf")
        for _ in range(3):
            spark.catalog.clearCache()
            start = time.perf_counter()
            registry[name].spark(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            best = min(best, time.perf_counter() - start)
        isolated[name] = round(best, 3)

    out = {
        "metric": "headline_queries_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "isolated_tail": isolated,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # shared materialized stages (e.g. the graph family's co-occurrence
    # edge table) are built once per process; their one-time cost is
    # recorded here so per-key timings stay honest about what they
    # exclude (the build lands in some key's discarded first run)
    from fitness_data_ingest_spark.registry_util import SHARED_STAGE_BUILD_SEC

    if SHARED_STAGE_BUILD_SEC:
        out["shared_stages_sec"] = dict(SHARED_STAGE_BUILD_SEC)
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
        # Box-weather normalization: records come from different
        # sessions on a shared box, and the WHOLE distribution drifts
        # 0.7-1.6x between recordings (measured round over round). A
        # plan regression is a query slower than the round's own drift,
        # so flag ratio > 1.5 x the median ratio; the raw ratios stay
        # in vs_prev for inspection either way.
        ratios = sorted(vs_prev.values())
        med = ratios[len(ratios) // 2] if ratios else 1.0
        out["vs_prev_median"] = med
        # ADVICE r4: the normalizer is clamped from ABOVE too — with an
        # unbounded median, a round where every query genuinely slows
        # ~2x would normalize itself invisible. Box weather measured
        # 0.7-1.6x; drift beyond 1.25x median is treated as real.
        threshold = 1.5 * min(max(med, 0.667), 1.25)

        def _measure_isolated(name: str) -> float:
            try:
                spark._jvm.System.gc()
            except Exception:
                pass
            iso = float("inf")
            for _ in range(3):
                spark.catalog.clearCache()
                start = time.perf_counter()
                registry[name].spark(spark, sf_dir).write.mode(
                    "overwrite"
                ).format("noop").save()
                iso = min(iso, time.perf_counter() - start)
            return round(iso, 3)

        prev_iso = prev.get("isolated_tail")
        regressions, adjudication = adjudicate_regressions(
            vs_prev,
            prev["queries"],
            threshold,
            isolated,
            _measure_isolated,
            prev_isolated=prev_iso if isinstance(prev_iso, dict) else None,
        )
        # Same-session old-vs-new A/B (VERDICT r10 item 1): for the
        # standing watch list and every isolated-confirmed flag, measure
        # old and new code ALTERNATING in one sitting — the only
        # like-for-like protocol on a box whose weather drifts 0.7-1.6x
        # between recording sessions. The sweep's session stops first:
        # the A/B runs two fresh JVMs and must not contend with ours.
        ab_keys = ab_keys_to_measure(
            regressions, adjudication, timings, watch=watch_from_prev(prev)
        )
        if ab_keys and os.environ.get("SPARK_GRAFT_AB", "1") != "0":
            spark.stop()
            ab = run_ab_subprocess(ab_keys, sf_dir)
            if "_err" in ab:
                out["ab_err"] = ab["_err"]
            if ab.get("_ref"):
                out["ab_ref"] = ab["_ref"][:12]
            regressions = apply_ab_results(
                ab, adjudication, regressions, threshold
            )
        if adjudication:
            out["regression_adjudication"] = adjudication
        out["regressions"] = regressions
        # batch-dissolved keys (dominance, no own A/B) queue for a
        # mandatory A/B next round — watch_from_prev picks this up
        dissolved = sorted(
            k
            for k, row in adjudication.items()
            if isinstance(row, dict) and row.get("weather_dissolved")
        )
        if dissolved:
            out["ab_watch_next"] = dissolved
        if med > 1.6:
            print(
                f"WARN: median ratio vs previous round is {med} — the whole "
                f"sweep slowed beyond box-weather range; treat per-query "
                f"ratios as raw",
                file=sys.stderr,
            )
        if regressions:
            print(
                f"WARN: regressions beyond 1.5x the clamped median drift "
                f"({med}): {regressions}",
                file=sys.stderr,
            )

    # Full record (incl. vs_prev/regressions) goes to BENCH_LATEST.json;
    # stdout gets the compact line.
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_LATEST.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(compact_line(out))
    try:
        spark.stop()  # no-op if the A/B step already stopped it
    except Exception:
        pass


if __name__ == "__main__":
    main()

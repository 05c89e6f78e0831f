"""The driver imports __spark_entry__ and hands it ITS OWN SparkSession —
not our tuned factory. Everything must work on a vanilla session:
configure_runtime (called inside registry_util.t) must set every conf the
queries depend on (UTC, nanosAsLong, python filter pushdown) at runtime.
"""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

# vanilla session: none of the engine's builder confs
spark = (
    SparkSession.builder.master("local[4]")
    .appName("vanilla-driver-sim")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import importlib
mod = importlib.import_module("__spark_entry__")

rows = mod.entry(spark).collect()
assert len(rows) > 0, "entry() empty on vanilla session"

qs = mod.queries()
oracles = mod.oracle_sql()
assert set(oracles) <= set(qs), "oracle keys must be a subset of query keys"

# the confs-sensitive queries: events (nanos ts), timestamps, python DS
for name in ["window_tumbling", "ts_concat_parse", "topk_latest", "tpch_q1"]:
    out = qs[name](spark, "/root/testdata/sf0.001")
    assert out.count() >= 0, name
print("VANILLA_OK", len(qs))
"""


def test_driver_contract_on_vanilla_session():
    r = subprocess.run(
        [sys.executable, "-c", SCRIPT], capture_output=True, text=True, timeout=300
    )
    assert "VANILLA_OK" in r.stdout, f"stdout={r.stdout[-2000:]}\nstderr={r.stderr[-2000:]}"


def test_registry_priority_window_is_sound():
    """The verification driver gives correctness verdicts to the first
    ~50 registry entries in dict order. Pin the invariants the round-2
    ordering relies on: the priority prefix exists, has no duplicates,
    is exactly the window size, and front-loads every key that lacked a
    round-1 verdict (all ext/stream/tpch2/pipeline keys + the scalar
    battery) plus the queries whose plans changed this round."""
    from fitness_data_ingest_spark import registry
    from fitness_data_ingest_spark.registry_ext import EXT_QUERIES
    from fitness_data_ingest_spark.registry_pipeline import PIPELINE_QUERIES
    from fitness_data_ingest_spark.registry_stream import STREAM_QUERIES
    from fitness_data_ingest_spark.registry_tpch2 import TPCH2_QUERIES

    prio = registry._PRIORITY
    assert len(prio) == 50
    assert len(set(prio)) == len(prio), "duplicate keys in priority list"
    ordered = list(registry.all_queries())
    assert ordered[: len(prio)] == list(prio)
    window = set(prio) | set(registry._NEXT_ROTATION)
    for family in (EXT_QUERIES, STREAM_QUERIES, TPCH2_QUERIES, PIPELINE_QUERIES):
        missing = set(family) - window
        assert not missing, f"driver window misses: {sorted(missing)}"
    assert not set(registry._NEXT_ROTATION) & set(prio), "rotation overlaps window"
    # scalar_battery's single verdict covers the trailing F4-F11 keys
    assert "scalar_battery" in window
    for key in ["tpch_q3_top10", "tpch_q10_returns", "topk_latest"]:
        assert key in window, f"rewritten query {key} needs a re-verdict"

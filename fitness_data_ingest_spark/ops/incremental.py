"""Incremental aggregate maintenance: merge a materialized aggregate
state with a delta-only aggregate instead of rescanning history.

The 100 TB shape this models: a nightly pipeline holds a materialized
per-key aggregate over years of facts (the *base state*). New data
arrives as a small delta partition. Recomputing the aggregate from
scratch rescans the full history — O(|history|) every night; merging
aggregate STATES costs O(|base keys| + |delta|): aggregate the delta
alone, then combine per key with the algebraic merge of each measure
(sum+sum, count+count, min/min, max/max). Averages and other derived
measures are never stored — they re-derive from (sum, count) at read
time, which is exactly why the state carries sums and counts instead.

This is the same partial/final aggregate split Spark itself performs
inside one job (partial_sum map-side, final merge after the exchange),
lifted across pipeline RUNS: the base state is last night's "partial".

Merge correctness is the algebraic-aggregate property
``agg(A ∪ B) == merge(agg(A), agg(B))`` — the registered query's
DuckDB oracle aggregates the union directly, so the driver hash-checks
that property end-to-end.

At scale:
- the merge is a full-outer equi-join on the state key — one shuffle
  of two *aggregated* (key-grain, not fact-grain) inputs; with the
  base state bucketed by key on disk (``write_bucketed``) even that
  shuffle disappears on the base side;
- the delta aggregate partial-aggregates map-side like any groupBy;
- no measure requires re-reading base facts: every kept measure is
  algebraic (sum/count/min/max); non-algebraic measures (exact
  distinct) must keep their own state (e.g. a key set / sketch) and
  are deliberately excluded here.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (merge function, fill value for keys absent from one side) per measure
# kind. Sums/counts merge by +; min/max merge by least/greatest with
# null-safe semantics (F.least/F.greatest ignore nulls).
_MERGES = {
    "sum": lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
    "count": lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
    "min": F.least,
    "max": F.greatest,
}


def merge_agg_states(
    base: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    measures: dict[str, str],
) -> DataFrame:
    """Combine two aggregate states keyed by ``keys``.

    ``measures`` maps column name -> kind ('sum' | 'count' | 'min' |
    'max'). Both inputs must carry exactly keys + measure columns. Keys
    present in only one state pass through with the other side's
    measures treated as the merge identity (0 for sum/count, identity
    for min/max via null-ignoring least/greatest).
    """
    unknown = {k for k in measures.values()} - set(_MERGES)
    if unknown:
        raise ValueError(f"unknown measure kinds: {sorted(unknown)}")
    b = base.select(
        *[F.col(k).alias(f"_bk_{k}") for k in keys],
        *[F.col(m).alias(f"_b_{m}") for m in measures],
    )
    d = delta.select(
        *[F.col(k).alias(f"_dk_{k}") for k in keys],
        *[F.col(m).alias(f"_d_{m}") for m in measures],
    )
    cond = None
    for k in keys:
        c = F.col(f"_bk_{k}") == F.col(f"_dk_{k}")
        cond = c if cond is None else cond & c
    j = b.join(d, cond, "full_outer")
    out_keys = [
        F.coalesce(F.col(f"_bk_{k}"), F.col(f"_dk_{k}")).alias(k) for k in keys
    ]
    out_measures = [
        _MERGES[kind](F.col(f"_b_{m}"), F.col(f"_d_{m}")).alias(m)
        for m, kind in measures.items()
    ]
    return j.select(*out_keys, *out_measures)


def merge_upsert(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC changeset to a snapshot — the batch MERGE INTO:
    ``I`` rows insert, ``U`` rows replace the matched row's non-key
    columns, ``D`` rows delete; unmatched snapshot rows pass through.
    ``changes`` carries the same schema as ``snapshot`` plus ``op_col``
    (payload columns of ``D`` rows are ignored). One change row per key.

    This is the apply step downstream of :func:`~fitness_data_ingest_spark.ops.relational.scd2_changes`
    (which *classifies*); together they are the reference's idempotent
    re-ingest loop (services/fitbit/fitbit_utils.py:230-232) promoted to
    row-level upsert semantics.

    Shape: ONE full-outer equi-join on the key — the same single
    shuffle a Delta/Iceberg MERGE plans for the touched partition set.
    The changeset is change-grain (small); at scale it broadcasts, and
    a bucketed snapshot makes the join entirely co-located. No window,
    no second pass.
    """
    cols = snapshot.columns
    snap = snapshot.select([F.col(c).alias(f"s_{c}") for c in cols])
    chg = changes.select(
        [F.col(c).alias(f"c_{c}") for c in cols] + [F.col(op_col).alias("_op")]
    )
    j = snap.join(chg, snap[f"s_{key}"] == chg[f"c_{key}"], "full_outer")
    merged = j.filter(
        # D removes the key; a U/I with no payload change still lands
        (F.col("_op").isNull()) | (F.col("_op") != F.lit("D"))
    )
    picked = [
        F.when(F.col("_op").isin("U", "I"), F.col(f"c_{c}"))
        .otherwise(F.col(f"s_{c}"))
        .alias(c)
        for c in cols
    ]
    return merged.select(*picked)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: "list[str]",
) -> DataFrame:
    """Row-level diff of two snapshot versions of the same table: one
    FULL OUTER equi-join on the key, classifying each key as

    - ``A`` added   (key only in ``new``),
    - ``R`` removed (key only in ``old``),
    - ``C`` changed (present in both, any ``compare_cols`` differs —
      null-safe comparison via ``<=>``),
    - ``U`` unchanged.

    The reconciliation primitive behind table regression checks and
    CDC backfills (the inverse of :func:`merge_upsert` — diff two
    states to recover the changeset). Shape: a single key shuffle; at
    scale both snapshots bucketed by the key make it exchange-free,
    and AQE handles whale keys. Output: key, diff_class, plus
    ``old_<c>`` / ``new_<c>`` for each compared column.
    """
    o = old.select(
        F.col(key).alias("_ok"), *[F.col(c).alias(f"old_{c}") for c in compare_cols]
    )
    n = new.select(
        F.col(key).alias("_nk"), *[F.col(c).alias(f"new_{c}") for c in compare_cols]
    )
    j = o.join(n, F.col("_ok") == F.col("_nk"), "full_outer")
    changed = None
    for c in compare_cols:
        ne = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        changed = ne if changed is None else (changed | ne)
    cls = (
        F.when(F.col("_ok").isNull(), "A")
        .when(F.col("_nk").isNull(), "R")
        .when(changed, "C")
        .otherwise("U")
    )
    return j.select(
        F.coalesce(F.col("_ok"), F.col("_nk")).alias(key),
        cls.alias("diff_class"),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )


def join_delta(
    old_a: DataFrame,
    delta_a: DataFrame,
    old_b: DataFrame,
    delta_b: DataFrame,
    key: str,
) -> DataFrame:
    """Incremental view maintenance for an inner equi-join under
    insert-only deltas: the new join state is exactly

        J' = J  ∪  ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB

    so the maintenance work is the three delta terms — each joins a
    (small) delta against a base or another delta, never base ⋈ base.
    At 100 TB this is THE point of IVM: a day's increment joins
    against bucketed base tables (delta side shuffles, base side
    doesn't move), instead of re-running the full fact-fact join. The
    companion to :func:`merge_agg_states` (aggregate IVM) — together
    they maintain a joined-and-aggregated materialized view
    incrementally.

    Returns the delta rows of the view (multiset-equal to
    ``new_join EXCEPT ALL old_join`` — property-tested).
    """
    d1 = delta_a.join(old_b, key)
    d2 = old_a.join(delta_b, key)
    d3 = delta_a.join(delta_b, key)
    return d1.unionByName(d2).unionByName(d3)

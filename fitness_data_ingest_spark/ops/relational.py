"""Relational operator family (SURVEY.md §2.2-§2.4): projection, filters,
joins, dedup, union, ordering, aggregation.

Each function is a thin, composable, *lazy* DataFrame transform — the
semantics come from the reference (citations inline), the physical
strategy is Catalyst's. Nothing here collects to the driver.

Scale notes (100 TB):
- equi-joins: dimension sides go through ``F.broadcast`` (no shuffle of
  the fact side); fact-fact joins shuffle on the join key and rely on
  AQE skew splitting.
- anti/semi joins against a manifest: the manifest is tiny relative to
  the work set → broadcast anti-join, zero shuffle of the big side.
- latest-per-group: window row_number over (key, order) — one shuffle on
  the partition key; prefer it over global ``orderBy().limit()`` which
  funnels to a single reducer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def project(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """P1 — column projection.

    Reference: ``activities[["sport_type","id","start_date_local","name"]]``
    (services/strava/get_stream_data.py:83). Column pruning reaches the
    parquet scan (check ReadSchema in explain).
    """
    return df.select(*cols)


def filter_date_range(
    df: DataFrame, ts_col: str, start: str, end: str
) -> DataFrame:
    """P2 — typed date-range filter on a timestamp column.

    Reference: ``.query("start_date_local.dt.date >= @start_date")`` /
    ``<= end_date`` (get_stream_data.py:68-75). Expressed on the raw
    timestamp so the predicate pushes to parquet row-group stats.
    """
    return df.filter(
        (F.col(ts_col) >= F.lit(start).cast("timestamp"))
        & (F.col(ts_col) < F.lit(end).cast("timestamp"))
    )


def conditional_project(df: DataFrame, flag: Column, col: Column, alias: str) -> DataFrame:
    """P6 — null-unless-flag projection.

    Reference: heart-rate fields nulled unless ``has_heartrate``
    (services/strava/utils.py:157-159,210-212).
    """
    return df.withColumn(alias, F.when(flag, col).otherwise(F.lit(None)))


def join_facts_to_dim(
    facts: DataFrame, dim: DataFrame, on, how: str = "inner", broadcast_dim: bool = True
) -> DataFrame:
    """J1 — equi-join of a big fact table to a small dimension.

    Reference intent (commented out): ``pd.merge(stream_df,
    activities[cols], left_on="activity_id", right_on="id")``
    (get_stream_data.py:81-86). The dim side is broadcast so the fact
    side never shuffles — at 100 TB this is the difference between a
    map-side join and a petabyte shuffle.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return facts.join(d, on=on, how=how)


def incremental_anti_join(work: DataFrame, manifest: DataFrame, on) -> DataFrame:
    """J2 — idempotent-ingest anti-join: keep work items whose output key
    is NOT already in the manifest.

    Reference: ``if key_path in all_files_dict[resource]: continue``
    (services/fitbit/fitbit_utils.py:230-232; manifest built at 213-223).
    Exact key equality — the reference's stream variant used substring
    matching which false-positives (id 123 matches 1234,
    services/strava/utils.py:412; SURVEY §2.6.4).
    """
    return work.join(F.broadcast(manifest), on=on, how="left_anti")


def exists_semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """J3 — existence check as a semi-join.

    Reference: ``any(matching_key)`` short-circuit
    (services/strava/utils.py:412-418).
    """
    return left.join(F.broadcast(right), on=on, how="left_semi")


def distinct_keys(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """A2 — distinct. Reference: ``activities["id"].drop_duplicates()``
    (get_stream_data.py:76). Map-side partial dedup + one shuffle."""
    return df.select(*cols).distinct()


def union_all(dfs: Sequence[DataFrame], allow_missing: bool = False) -> DataFrame:
    """A3 — union-all by name.

    Reference: ``pd.concat(pd_list).reset_index(drop=True)``
    (services/strava/utils.py:425). ``unionByName`` (not positional
    ``union``) mirrors pandas' name-aligned concat; with
    ``allow_missing`` it also covers the reference's missing-column
    backfill (R3, utils.py:362-370).
    """
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=allow_missing)
    return out


def latest_snapshot(df: DataFrame, order_col: str, tiebreak: str) -> DataFrame:
    """A1 — argmax/latest-row selection, global.

    Reference: parse dates from filenames, ``np.argmax(file_dates)``
    (get_stream_data.py:56-62). pandas relies on positional argmax;
    Spark has no implicit order, so the order is explicit and a
    tiebreak column makes it total (SURVEY §7.3).

    Scale: ``orderBy().limit(1)`` plans as TakeOrderedAndProject — each
    partition keeps its own top-1 and only those survivors reach the
    driver-side merge. The previous row_number-over-global-window form
    sorted the ENTIRE input in one partition to pick one row.
    """
    return df.orderBy(F.col(order_col).desc(), F.col(tiebreak).asc()).limit(1)


def latest_per_group(
    df: DataFrame, keys: Sequence[str], order_col: str, tiebreak: str
) -> DataFrame:
    """A1 (grouped) — latest row per key via window row_number.

    One shuffle on the group key; scales to any number of groups
    (vs. global sort + limit which single-threads the tail).
    """
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc(), F.col(tiebreak).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def min_max(df: DataFrame, col: str, alias_prefix: str) -> DataFrame:
    """A4 — min/max bounds. Reference: ``min(years)``/``max(years)``
    bounding the fetch window (services/strava/utils.py:56-57)."""
    return df.agg(
        F.min(col).alias(f"{alias_prefix}_min"), F.max(col).alias(f"{alias_prefix}_max")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    left_id: str,
    right_id: str,
) -> DataFrame:
    """Backward as-of join: for each left row (identified by ``left_id``),
    the single right row with the greatest ``right_ts`` <= ``left_ts``
    for the same key — ties broken by ``right_id`` desc, so the match is
    a total function. Unmatched left rows are kept with nulls (left
    as-of). Column names must be disjoint apart from ``key``.

    Shape: a union-merge, NOT a range-predicate join. The equi-join +
    window-argmax formulation materializes every (left row × earlier
    right row of the same key) candidate pair — O(n²) per key, a
    scale-killer on long histories. Here both sides union on the key and
    ONE last-value-ignore-nulls window over (key, ts) carries the most
    recent right row forward onto each left row: one shuffle on the key,
    one partition-local sort, zero pair materialization — the same merge
    a sorted-bucketed ``mapPartitions`` would do, kept declarative.

    Sort order within a key: (ts, is_right desc, right_id): at equal
    timestamps the right row sorts BEFORE the left row (<= semantics),
    and among equal-ts right rows the largest ``right_id`` sorts last so
    ``last()`` picks it — ties broken by ``right_id`` desc, exactly the
    old argmax contract.
    """
    rcols = [c for c in right.columns if c != key]
    r_side = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_r"),
        F.col(right_id).alias("__rid"),
        F.struct(*[F.col(c) for c in rcols]).alias("__r"),
    )
    l_side = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_r"),
        F.lit(None).cast(r_side.schema["__rid"].dataType).alias("__rid"),
        F.lit(None).cast(r_side.schema["__r"].dataType).alias("__r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    unioned = r_side.withColumn(
        "__l", F.lit(None).cast(l_side.schema["__l"].dataType)
    ).unionByName(l_side)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts"), F.col("__is_r").desc(), F.col("__rid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__is_r") == 0)
        .select(
            *[F.col(f"__l.{c}").alias(c) for c in left.columns],
            *[F.col(f"__m.{c}").alias(c) for c in rcols],
        )
    )


def scd2_changes(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    compare: str,
) -> DataFrame:
    """Change-data-capture diff between a current dimension snapshot and
    an incoming one — the classification step of an SCD-type-2 MERGE:
    ``insert`` (key only in updates), ``close`` (key only in current),
    ``update`` (both sides, compared value changed). Unchanged keys are
    dropped (a production MERGE leaves them untouched).

    Shape: one full-outer equi-join on the key — a single shuffle, the
    same plan a Delta/Iceberg MERGE's find-touched-files phase executes.
    The output feeds the writer that closes old versions and appends new
    ones; at 100 TB the join benefits from both snapshots sharing a
    bucketed layout on the key.
    """
    cur = current.select(
        F.col(key).alias("__k"), F.col(compare).alias("old_val")
    )
    upd = updates.select(F.col(key).alias("__ku"), F.col(compare).alias("new_val"))
    j = cur.join(upd, F.col("__k") == F.col("__ku"), "full_outer")
    action = (
        F.when(F.col("__ku").isNull(), F.lit("close"))
        .when(F.col("__k").isNull(), F.lit("insert"))
        .when(F.col("old_val") != F.col("new_val"), F.lit("update"))
        .otherwise(F.lit("keep"))
    )
    return (
        j.withColumn("action", action)
        .filter(F.col("action") != "keep")
        .select(
            F.coalesce(F.col("__k"), F.col("__ku")).alias(key),
            "action",
            "old_val",
            "new_val",
        )
    )


def range_join_bucketed(
    intervals: DataFrame,
    points: DataFrame,
    key: str,
    bucket_s: int,
    start_col: str = "s0",
    end_col: str = "s1",
    point_ts_col: str = "es",
) -> DataFrame:
    """Interval × point range join as PURE EQUI-JOIN: match every point
    row to every interval of the same ``key`` with
    ``start <= point_ts < end`` (end-exclusive).

    A naive ``ON p.ts BETWEEN iv.s0 AND iv.s1`` has no equi-key, so
    Spark plans a BroadcastNestedLoopJoin — the classic 100 TB
    scale-killer. The bucketed form is the standard fix: each interval
    explodes to the ``bucket_s``-grain buckets it covers (an interval
    of width w emits ceil(w/bucket_s)+1 <= small rows when bucket_s is
    chosen near the typical width), each point owns exactly ONE bucket,
    and the join is equi on (key, bucket) + a residual range filter.
    No candidate dedup is needed — a (interval, point) pair meets in
    precisely the point's own bucket. Plan-gated: hash/sort-merge join
    only.

    ``intervals``: key, start_col, end_col (int64 epoch seconds) +
    payload. ``points``: key, point_ts_col (int64) + payload.
    Output: every intervals column + every points column (caller
    disambiguates names beforehand).
    """
    # degenerate guard: an empty interval (end <= start) covers no
    # points under end-exclusive semantics — and must be dropped BEFORE
    # the sequence(), which would otherwise auto-step DOWNWARD for
    # start_bucket > end_bucket and fabricate wrong buckets
    intervals = intervals.filter(F.col(end_col) > F.col(start_col))
    # rename the interval-side key: intervals and points routinely share
    # lineage (both derived from one events scan), and a same-attribute
    # join condition would resolve trivially-true on a self-join
    iv = intervals.withColumnRenamed(key, "_ivkey").withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {bucket_s}"),
                F.expr(f"({end_col} - 1) div {bucket_s}"),
            )
        ),
    )
    pt = points.withColumn("_pbkt", F.expr(f"{point_ts_col} div {bucket_s}"))
    joined = iv.join(
        pt,
        (F.col("_ivkey") == pt[key]) & (F.col("_bkt") == F.col("_pbkt")),
    ).drop("_ivkey")
    return (
        joined.filter(
            (F.col(point_ts_col) >= F.col(start_col))
            & (F.col(point_ts_col) < F.col(end_col))
        )
        .drop("_bkt", "_pbkt")
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    left_id: str,
    right_id: str,
) -> DataFrame:
    """Nearest-direction as-of join (pandas ``merge_asof
    direction='nearest'``): for each left row, the right row of the
    same key minimizing |right_ts - left_ts|; exact ties prefer the
    BACKWARD (earlier) match, and equal-timestamp right rows break by
    ``right_id`` desc — the same contract as :func:`asof_join`.

    Composition, not a new algorithm: one backward union-merge pass
    plus one backward pass over NEGATED timestamps (which is exactly a
    forward as-of), then a per-left-row pick. The scale shape stays
    two single-shuffle merges — candidate pairs are never
    materialized. Output: every left column + nearest_rid,
    nearest_ts, dist (absolute gap, left-ts units; nulls when the key
    has no right rows at all).
    """
    r2 = right.select(key, right_ts, right_id)
    b = asof_join(
        left.select(key, left_ts, left_id), r2, key, left_ts, right_ts,
        left_id, right_id,
    ).select(
        left_id,
        F.col(right_id).alias("_b_rid"),
        F.col(right_ts).alias("_b_ts"),
    )
    lneg = left.select(key, (-F.col(left_ts)).alias(left_ts), left_id)
    rneg = right.select(key, (-F.col(right_ts)).alias(right_ts), right_id)
    f = asof_join(
        lneg, rneg, key, left_ts, right_ts, left_id, right_id
    ).select(
        left_id,
        F.col(right_id).alias("_f_rid"),
        (-F.col(right_ts)).alias("_f_ts"),
    )
    out = left.join(b, left_id, "left").join(f, left_id, "left")
    db = F.col(left_ts) - F.col("_b_ts")
    df_ = F.col("_f_ts") - F.col(left_ts)
    prefer_b = F.col("_b_rid").isNotNull() & (
        F.col("_f_rid").isNull() | (db <= df_)
    )
    return out.select(
        *left.columns,
        F.when(prefer_b, F.col("_b_rid")).otherwise(F.col("_f_rid")).alias(
            "nearest_rid"
        ),
        F.when(prefer_b, F.col("_b_ts")).otherwise(F.col("_f_ts")).alias(
            "nearest_ts"
        ),
        F.when(prefer_b, db).otherwise(df_).alias("dist"),
    )

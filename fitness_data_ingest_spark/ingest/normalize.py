"""Normalization: heterogeneous, partially-missing records in → one
fixed, typed, nullable schema out (the reference's single most
load-bearing semantic, SURVEY.md §1.4).

Mirrors ``normalize_activity``/``normalize_activities`` (reference
services/strava/utils.py:146-246) as pure projections: coalesce
defaults, null-unless-flag heart-rate fields, nested struct assembly,
then a final cast/align to the declared schema. Zero shuffles — this is
map-side-only work at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ops.reshape import align_to_schema, normalize_defaults
from ..ops.scalar import ts_from_date_and_time
from .schemas import ACTIVITY_DEFAULTS, FITBIT_INTRADAY, STRAVA_ACTIVITIES

HEARTRATE_FIELDS = ("average_heartrate", "max_heartrate")


def normalize_activities(raw: DataFrame) -> DataFrame:
    """Raw activity records (any subset of fields present) → the declared
    50-field schema.

    - missing columns → typed nulls (align_to_schema)
    - defaulted fields → coalesce with the reference's defaults
      (utils.py:202,225 etc.)
    - heart-rate fields nulled unless has_heartrate (utils.py:157-159)
    """
    aligned = align_to_schema(raw, STRAVA_ACTIVITIES)
    filled = normalize_defaults(aligned, ACTIVITY_DEFAULTS)
    filled = filled.withColumn("has_heartrate", F.coalesce("has_heartrate", F.lit(False)))
    for c in HEARTRATE_FIELDS:
        filled = filled.withColumn(
            c, F.when(F.col("has_heartrate"), F.col(c)).otherwise(F.lit(None))
        )
    return filled


def normalize_intraday(raw: DataFrame, resource: str, date: str) -> DataFrame:
    """Fitbit intraday dataset rows ({time, value}) → FITBIT_INTRADAY,
    with the derived datetime/date columns (fitbit_utils.py:381-387)."""
    out = raw.select(
        F.lit(resource).alias("resource"),
        F.lit(date).alias("date"),
        F.col("time").cast("string").alias("time"),
        F.col("value").cast("double").alias("value"),
    ).withColumn("datetime", ts_from_date_and_time(F.lit(date), F.col("time")))
    return align_to_schema(out, FITBIT_INTRADAY)

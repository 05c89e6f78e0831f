"""Schema registry: the reference's four logical tables as declared
StructTypes (SURVEY.md §1.1, FIXTURES.md family B).

The reference mixes three schema regimes — inferred JSON frames,
application-enforced TypedDict (``SummaryActivity``, reference
services/strava/utils.py:93-143), and engine-enforced Arrow schema
(``STREAM_SCHEMA``, services/strava/globals.py:8-25). Here every table
has exactly one declared StructType; ingestion normalizes into it
(normalize.py) and sinks cast to it (ops/reshape.align_to_schema).
"""

from __future__ import annotations

from pyspark.sql import types as T

INTRADAY_RESOURCES = (
    # reference services/fitbit/globals.py:5-14
    "calories",
    "distance",
    "elevation",
    "floors",
    "steps",
    "swimming-strokes",
    "heart",
    "active-zone-minutes",
)

# one row per (resource, date, time-of-day sample);
# reference services/fitbit/fitbit_utils.py:374-387
FITBIT_INTRADAY = T.StructType(
    [
        T.StructField("resource", T.StringType(), False),
        T.StructField("date", T.StringType(), False),  # "YYYY-MM-DD" (:387)
        T.StructField("time", T.StringType(), False),  # "HH:MM:SS" (:375-379)
        T.StructField("value", T.DoubleType(), True),
        T.StructField("datetime", T.TimestampType(), True),  # (:382-386)
    ]
)

_ATHLETE = T.StructType(
    # reference services/strava/utils.py:82-84,164-167
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("resource_state", T.LongType(), True),
    ]
)

_MAP = T.StructType(
    # reference services/strava/utils.py:87-90,192-196
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("summary_polyline", T.StringType(), True),
        T.StructField("resource_state", T.LongType(), True),
    ]
)


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


_L, _D, _S, _B = T.LongType(), T.DoubleType(), T.StringType(), T.BooleanType()
_AD = T.ArrayType(T.DoubleType())

# 50-field activity record; reference services/strava/utils.py:93-143
STRAVA_ACTIVITIES = T.StructType(
    [
        _f("id", _L, False),
        _f("athlete", _ATHLETE),
        _f("name", _S),
        _f("distance", _D),
        _f("moving_time", _L),
        _f("elapsed_time", _L),
        _f("total_elevation_gain", _D),
        _f("type", _S),
        _f("sport_type", _S),
        _f("workout_type", _L),
        _f("start_date", _S),
        _f("start_date_local", _S),
        _f("timezone", _S),
        _f("utc_offset", _D),
        _f("map", _MAP),
        _f("average_speed", _D),
        _f("max_speed", _D),
        _f("average_cadence", _D),
        _f("average_watts", _D),
        _f("weighted_average_watts", _L),
        _f("kilojoules", _D),
        _f("device_watts", _B),
        _f("has_heartrate", _B),
        _f("average_heartrate", _D),  # null unless has_heartrate (:157-159)
        _f("max_heartrate", _D),
        _f("elev_high", _D),
        _f("elev_low", _D),
        _f("start_latlng", _AD),
        _f("end_latlng", _AD),
        _f("achievement_count", _L),
        _f("kudos_count", _L),
        _f("comment_count", _L),
        _f("athlete_count", _L),
        _f("photo_count", _L),
        _f("total_photo_count", _L),
        _f("pr_count", _L),  # default 0 (:225)
        _f("trainer", _B),
        _f("commute", _B),
        _f("manual", _B),
        _f("private", _B),
        _f("flagged", _B),
        _f("visibility", _S),  # default "everyone" (:202)
        _f("heartrate_opt_out", _B),
        _f("display_hide_heartrate_option", _B),
        _f("from_accepted_tag", _B),
        _f("has_kudoed", _B),
        _f("location_city", _S),
        _f("location_state", _S),
        _f("location_country", _S),
        _f("gear_id", _S),
        _f("upload_id", _L),
        _f("upload_id_str", _S),
        _f("external_id", _S),
        _f("suffer_score", _D),
        _f("resource_state", _L),
    ]
)

# per-second sample rows; reference services/strava/globals.py:8-25
# (note ``moving`` is bool in flight, int64 at rest — the Arrow schema
# coerces it, utils.py:372-374)
STRAVA_STREAMS = T.StructType(
    [
        _f("time", _L),
        _f("distance", _D),
        _f("latlng", _AD),
        _f("latitude", _D),
        _f("longitude", _D),
        _f("altitude", _D),
        _f("velocity_smooth", _D),
        _f("grade_smooth", _D),
        _f("heartrate", _L),
        _f("cadence", _D),
        _f("watts", _D),
        _f("temp", _D),
        _f("moving", _L),
        _f("activity_id", _L, False),
    ]
)

# file-catalog rows; reference services/fitbit/fitbit_utils.py:74-83
INGEST_MANIFEST = T.StructType(
    [
        _f("Key", _S, False),
        _f("Size", _L),
        _f("LastModified", T.TimestampType()),
        _f("StorageClass", _S),
    ]
)

ACTIVITY_DEFAULTS: dict[str, object] = {
    # reference normalize_activity defaults (utils.py:146-233)
    "visibility": "everyone",  # :202
    "pr_count": 0,  # :225
    "achievement_count": 0,
    "kudos_count": 0,
    "comment_count": 0,
    "athlete_count": 0,
    "photo_count": 0,
    "total_photo_count": 0,
    "trainer": False,
    "commute": False,
    "manual": False,
    "private": False,
    "flagged": False,
    "has_kudoed": False,
    "from_accepted_tag": False,
    "heartrate_opt_out": False,
    "display_hide_heartrate_option": False,
    "resource_state": 2,
}

"""Live-transport policies (ingest/rest.py), network-free: retry with
exponential backoff, rate-limit header backpressure, pagination stop,
and 404 → empty-result mapping — the reference's HTTP semantics
(fitbit_utils.py:38-43,309-329; strava utils.py:60-77,337-347) driven
through canned responses."""

from __future__ import annotations

import pytest

from fitness_data_ingest_spark.ingest.rest import (
    CannedTransport,
    FakeResponse,
    HttpRestSource,
    PaginatedSource,
    RetriesExhausted,
    RetryPolicy,
    fitbit_backpressure,
    get_with_retry,
    strava_backpressure,
)


def _sleeper(log):
    return lambda s: log.append(s)


def _intraday(resource, rows):
    return FakeResponse(body={f"{resource}-intraday": {"dataset": rows}})


def test_retry_backs_off_then_succeeds():
    tp = CannedTransport([FakeResponse(503), FakeResponse(502), FakeResponse(200, body=[1])])
    sleeps = []
    resp = get_with_retry(tp, "http://x", sleeper=_sleeper(sleeps))
    assert resp.status_code == 200
    # urllib3 shape: backoff_factor * 2**(retry-1) between attempts
    assert sleeps == [1.0, 2.0]
    assert len(tp.calls) == 3


def test_retry_exhaustion_raises():
    tp = CannedTransport([FakeResponse(500)] * 5)
    sleeps = []
    with pytest.raises(RetriesExhausted, match="5 attempts"):
        get_with_retry(tp, "http://x", sleeper=_sleeper(sleeps))
    assert len(tp.calls) == 5
    assert sleeps == [1.0, 2.0, 4.0, 8.0]  # no sleep after the last try


def test_retry_does_not_retry_client_errors():
    tp = CannedTransport([FakeResponse(404, reason="Not Found")])
    resp = get_with_retry(tp, "http://x", sleeper=_sleeper([]))
    assert resp.status_code == 404
    assert len(tp.calls) == 1


def test_fitbit_backpressure_sleeps_reset_window():
    sleeps = []
    slept = fitbit_backpressure(
        FakeResponse(headers={"fitbit-rate-limit-remaining": "5",
                              "fitbit-rate-limit-reset": "120"}),
        sleeper=_sleeper(sleeps),
    )
    assert slept == 120.0 and sleeps == [120]
    # above the floor, or reset unknown: no sleep (the reference checks
    # BOTH values before sleeping)
    assert fitbit_backpressure(
        FakeResponse(headers={"fitbit-rate-limit-remaining": "50",
                              "fitbit-rate-limit-reset": "120"}),
        sleeper=_sleeper([]),
    ) == 0.0
    assert fitbit_backpressure(
        FakeResponse(headers={"fitbit-rate-limit-remaining": "5"}),
        sleeper=_sleeper([]),
    ) == 0.0


def test_strava_backpressure_uses_15min_window():
    sleeps = []
    slept = strava_backpressure(
        FakeResponse(headers={"x-readratelimit-limit": "600,30000",
                              "x-readratelimit-usage": "596,100"}),
        sleeper=_sleeper(sleeps),
    )
    assert slept == 900.0 and sleeps == [900]
    assert strava_backpressure(
        FakeResponse(headers={"x-readratelimit-limit": "600,30000",
                              "x-readratelimit-usage": "100,29999"}),
        sleeper=_sleeper([]),
    ) == 0.0
    assert strava_backpressure(FakeResponse(), sleeper=_sleeper([])) == 0.0


def test_http_rest_source_fetch_and_empty_guard():
    rows = [{"time": "00:00:00", "value": 1.5}]
    tp = CannedTransport([
        _intraday("heart", rows),
        FakeResponse(404, reason="Not Found"),
        FakeResponse(200, body={}),
    ])
    src = HttpRestSource("http://api/1/user/-/activities", tp, sleeper=_sleeper([]))
    assert src.fetch("heart", "2024-01-01") == rows
    assert src.fetch("heart", "2024-01-02") == []  # 404 -> empty, no raise
    assert src.fetch("heart", "2024-01-03") == []  # empty body guard
    assert tp.calls[0][0].endswith("/heart/date/2024-01-01/1d.json")


def test_http_rest_source_retries_through_5xx():
    rows = [{"time": "00:00:00", "value": 2.0}]
    tp = CannedTransport([FakeResponse(503), _intraday("steps", rows)])
    sleeps = []
    src = HttpRestSource("http://api", tp, sleeper=_sleeper(sleeps))
    assert src.fetch("steps", "2024-01-01") == rows
    assert sleeps == [1.0]


def test_paginated_source_stops_on_empty_page():
    page1 = [{"id": i} for i in range(200)]
    page2 = [{"id": 200}]
    tp = CannedTransport([
        FakeResponse(200, body=page1),
        FakeResponse(200, body=page2),
        FakeResponse(200, body=[]),
    ])
    src = PaginatedSource("http://api/athlete/activities", tp, sleeper=_sleeper([]))
    out = src.fetch_all({"after": 0, "before": 1})
    assert len(out) == 201
    assert [c[1]["page"] for c in tp.calls] == [1, 2, 3]
    assert all(c[1]["per_page"] == 200 for c in tp.calls)
    assert all(c[1]["after"] == 0 for c in tp.calls)


def test_paginated_source_backpressure_between_pages():
    tp = CannedTransport([
        FakeResponse(200, body=[{"id": 1}],
                     headers={"x-readratelimit-limit": "600,30000",
                              "x-readratelimit-usage": "598,100"}),
        FakeResponse(200, body=[]),
    ])
    sleeps = []
    src = PaginatedSource("http://api", tp, sleeper=_sleeper(sleeps))
    assert len(src.fetch_all()) == 1
    assert sleeps == [900]


def test_http_source_feeds_ingest_batch(spark):
    """End-to-end control-plane handoff: live-shaped source -> work-item
    loop -> typed DataFrame, identical to the FixtureSource path."""
    from pyspark.sql import types as T

    from fitness_data_ingest_spark.ingest.sources import fetch_items, ingest_batch

    tp = CannedTransport([
        _intraday("heart", [{"time": "00:05:00", "value": 61.0}]),
        _intraday("heart", [{"time": "00:06:00", "value": 62.0}]),
    ])
    src = HttpRestSource("http://api", tp, sleeper=_sleeper([]))
    rows = fetch_items(src, [("heart", "2024-01-01"), ("heart", "2024-01-02")])
    schema = T.StructType(
        [
            T.StructField("resource", T.StringType()),
            T.StructField("date", T.StringType()),
            T.StructField("time", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    df = ingest_batch(spark, rows, schema)
    assert df.count() == 2
    assert df.schema == schema

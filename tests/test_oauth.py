"""OAuth flow (ingest/oauth.py) and named endpoint configs
(ingest/endpoints.py) — browser-free, external-network-free: the token
exchange runs against canned responses, the callback server is hit over
loopback, and the 30-day planner runs on Spark."""

from __future__ import annotations

import datetime as dt
import urllib.request

import pytest

from fitness_data_ingest_spark.ingest.endpoints import (
    THIRTY_DAY_RESOURCES,
    intraday_endpoint,
    thirty_day_endpoint,
    thirty_day_windows,
    thirty_day_work_items,
)
from fitness_data_ingest_spark.ingest.oauth import (
    CallbackServer,
    OAuthClient,
    OAuthError,
    Token,
    authorization_url,
)
from fitness_data_ingest_spark.ingest.rest import CannedTransport, FakeResponse


def test_authorization_url_carries_grant_params():
    url = authorization_url(
        "https://provider/oauth2/authorize", "cid", "http://localhost:1410",
        scope=("activity", "heartrate"), state="xyz",
    )
    assert url.startswith("https://provider/oauth2/authorize?")
    assert "client_id=cid" in url
    assert "response_type=code" in url
    assert "scope=activity+heartrate" in url
    assert "state=xyz" in url


def _client(responses, now=1000.0):
    tp = CannedTransport(responses)
    return OAuthClient("http://provider/token", "cid", "sec", tp, clock=lambda: now), tp


def test_exchange_code_stamps_absolute_expiry():
    client, tp = _client([
        FakeResponse(200, body={"access_token": "at1", "refresh_token": "rt1",
                                "expires_in": 3600, "scope": "activity"})
    ])
    tok = client.exchange_code("the-code", "http://localhost:1410")
    assert tok.access_token == "at1" and tok.refresh_token == "rt1"
    assert tok.expires_at == 1000.0 + 3600
    sent = tp.calls[0][1]
    assert sent["grant_type"] == "authorization_code"
    assert sent["code"] == "the-code"
    assert sent["client_secret"] == "sec"
    assert tok.auth_header() == {"Authorization": "Bearer at1"}


def test_ensure_fresh_refreshes_only_inside_skew():
    live = Token("at", refresh_token="rt", expires_at=1000.0 + 3600)
    client, tp = _client([
        FakeResponse(200, body={"access_token": "at2", "expires_in": 3600})
    ])
    assert client.ensure_fresh(live) is live  # far from expiry: no call
    assert tp.calls == []

    near = Token("at", refresh_token="rt", expires_at=1000.0 + 30)  # inside skew
    fresh = client.ensure_fresh(near)
    assert fresh.access_token == "at2"
    # rotation fallback: provider sent no new refresh token -> keep old
    assert fresh.refresh_token == "rt"
    assert tp.calls[0][1]["grant_type"] == "refresh_token"


def test_refresh_without_refresh_token_raises():
    client, _ = _client([])
    with pytest.raises(OAuthError, match="re-authorize"):
        client.refresh(Token("at"))


def test_token_roundtrips_through_file(tmp_path):
    tok = Token("at", refresh_token="rt", expires_at=123.0, scope="activity")
    p = tmp_path / "token.json"
    tok.save(p)
    assert Token.load(p) == tok


def test_callback_server_captures_code():
    server = CallbackServer()
    try:
        with urllib.request.urlopen(f"{server.url}/?code=abc123&state=xyz") as resp:
            assert resp.status == 200
        assert server.wait_for_code(timeout_seconds=5) == "abc123"
    finally:
        server.close()


def test_intraday_endpoint_detail_levels():
    heart = intraday_endpoint("http://api", "heart", dt.date(2024, 1, 2))
    steps = intraday_endpoint("http://api", "steps", "2024-01-02")
    assert heart.endswith("/heart/date/2024-01-02/1d/1sec/time/00:00/23:59.json")
    assert steps.endswith("/steps/date/2024-01-02/1d/1min/time/00:00/23:59.json")


def test_thirty_day_endpoint_shapes_and_window():
    url, end = thirty_day_endpoint("http://api", "br", dt.date(2024, 1, 1))
    assert url == "http://api/1/user/-/br/date/2024-01-01/2024-01-30/all.json"
    assert end == dt.date(2024, 1, 30)
    url, _ = thirty_day_endpoint("http://api", "sleep", dt.date(2024, 1, 1))
    assert "/1.2/user/-/sleep/" in url and not url.endswith("all.json")
    url, _ = thirty_day_endpoint("http://api", "weight", dt.date(2024, 1, 1))
    assert "/body/log/weight/" in url
    with pytest.raises(KeyError, match="not a 30-day resource"):
        thirty_day_endpoint("http://api", "steps", dt.date(2024, 1, 1))


def test_thirty_day_windows_tile_and_clip():
    ws = thirty_day_windows("2024-01-01", "2024-03-05")
    assert ws == [
        ("2024-01-01", "2024-01-30"),
        ("2024-01-31", "2024-02-29"),  # leap year
        ("2024-03-01", "2024-03-05"),  # clipped to end
    ]


def test_thirty_day_work_items_matches_python_tiling(spark):
    df = thirty_day_work_items(spark, "2024-01-01", "2024-03-05")
    rows = df.collect()
    expect_windows = thirty_day_windows("2024-01-01", "2024-03-05")
    assert len(rows) == len(expect_windows) * len(THIRTY_DAY_RESOURCES)
    got_windows = sorted({(r.window_start, r.window_end) for r in rows})
    assert got_windows == sorted(expect_windows)
    sample = next(r for r in rows
                  if r.resource == "br" and r.window_start == "2024-01-01")
    assert sample.key == "thirty_day/br/br_2024-01-01_2024-01-30.parquet"
    # newest-first ordering, like the per-day planner
    assert rows[0].window_start == "2024-03-01"

"""Live REST transport for the ingest control plane (SURVEY.md §3.3).

Re-expresses the reference's HTTP behaviors behind the ``RestSource``
protocol from ``sources.py``, with the transport injected so every
policy is testable without a network:

- retry: 5 total attempts, exponential backoff (factor 1) on HTTP
  500/502/503/504 — the reference's urllib3 ``Retry(total=5,
  backoff_factor=1, status_forcelist=[500, 502, 503, 504])``
  (reference services/fitbit/fitbit_utils.py:38-43);
- rate-limit backpressure, header-driven:
  - Fitbit style: sleep ``fitbit-rate-limit-reset`` seconds when
    ``fitbit-rate-limit-remaining`` < 10 (fitbit_utils.py:309-329);
  - Strava style: sleep 15 min when the 15-minute window in
    ``x-readratelimit-limit`` / ``x-readratelimit-usage`` has < 5
    calls left (services/strava/utils.py:337-347);
- pagination: ``per_page=200``, increment ``page`` until an empty
  body (services/strava/utils.py:60-77);
- a 404 yields an EMPTY result, not an exception — the reference logs
  ``response.reason`` and moves on (utils.py:349-352).

The real ``requests``-backed transport is import-gated; everything else
runs against any callable transport (tests use canned responses).
None of this participates in a Spark query plan — it produces the row
batches that ``sources.ingest_batch`` / the Python DataSource turn into
DataFrames.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass, field
from typing import Any, Protocol


class Response(Protocol):
    """The response surface the policies need (duck-typed so both
    ``requests.Response`` and test fakes satisfy it)."""

    status_code: int
    headers: Mapping[str, str]

    def json(self) -> Any: ...


@dataclass
class FakeResponse:
    """Canned response for network-free tests."""

    status_code: int = 200
    headers: dict[str, str] = field(default_factory=dict)
    body: Any = None
    reason: str = ""

    def json(self) -> Any:
        return self.body


class Transport(Protocol):
    """HTTP GET/POST. Implementations: RequestsTransport (live),
    CannedTransport (tests)."""

    def get(self, url: str, params: Mapping[str, Any] | None = None,
            headers: Mapping[str, str] | None = None) -> Response: ...

    def post(self, url: str, data: Mapping[str, Any] | None = None,
             headers: Mapping[str, str] | None = None) -> Response: ...


class RequestsTransport:
    """Live transport. Import-gated: constructing it without the
    ``requests`` package raises ImportError with a clear message."""

    def __init__(self, timeout_seconds: float = 30.0) -> None:
        try:
            import requests  # noqa: PLC0415 (gated optional dependency)
        except ImportError as e:  # pragma: no cover - env without requests
            raise ImportError(
                "RequestsTransport needs the 'requests' package; use a "
                "canned Transport (tests) or install requests"
            ) from e
        self._session = requests.Session()
        self._timeout = timeout_seconds

    def get(self, url, params=None, headers=None):  # pragma: no cover - live
        return self._session.get(url, params=params, headers=headers,
                                 timeout=self._timeout)

    def post(self, url, data=None, headers=None):  # pragma: no cover - live
        return self._session.post(url, data=data, headers=headers,
                                  timeout=self._timeout)


@dataclass
class CannedTransport:
    """Replays a scripted response sequence; records every request."""

    responses: list[FakeResponse]
    calls: list[tuple[str, dict | None]] = field(default_factory=list)

    def get(self, url, params=None, headers=None) -> FakeResponse:
        self.calls.append((url, dict(params) if params else None))
        if not self.responses:
            raise AssertionError("CannedTransport exhausted")
        return self.responses.pop(0)

    def post(self, url, data=None, headers=None) -> FakeResponse:
        return self.get(url, params=data, headers=headers)


@dataclass
class RetryPolicy:
    """The reference's urllib3 retry strategy (fitbit_utils.py:38-43):
    ``total`` attempts, sleep ``backoff_factor * 2**(attempt-1)``
    between retries, retry only on ``statuses``."""

    total: int = 5
    backoff_factor: float = 1.0
    statuses: frozenset[int] = frozenset({500, 502, 503, 504})

    def backoff(self, retry_number: int) -> float:
        return self.backoff_factor * (2 ** (retry_number - 1))


class RetriesExhausted(RuntimeError):
    pass


def get_with_retry(
    transport: Transport,
    url: str,
    params: Mapping[str, Any] | None = None,
    headers: Mapping[str, str] | None = None,
    policy: RetryPolicy = RetryPolicy(),
    sleeper: Callable[[float], None] = time.sleep,
) -> Response:
    """GET with the reference's retry/backoff semantics. Non-retryable
    statuses (incl. 404) return the response for the caller to map."""
    last: Response | None = None
    for attempt in range(1, policy.total + 1):
        resp = transport.get(url, params=params, headers=headers)
        if resp.status_code not in policy.statuses:
            return resp
        last = resp
        if attempt < policy.total:
            sleeper(policy.backoff(attempt))
    raise RetriesExhausted(
        f"GET {url} failed after {policy.total} attempts "
        f"(last status {last.status_code if last else '?'})"
    )


def fitbit_backpressure(
    resp: Response, floor: int = 10, sleeper: Callable[[float], None] = time.sleep
) -> float:
    """Fitbit rate-limit handling (fitbit_utils.py:309-329): when
    ``fitbit-rate-limit-remaining`` < floor and reset > 0, sleep the
    advertised reset window. Returns seconds slept (0 if none)."""
    remaining = int(resp.headers.get("fitbit-rate-limit-remaining", 0))
    reset_s = int(resp.headers.get("fitbit-rate-limit-reset", 0))
    if remaining < floor and reset_s > 0:
        sleeper(reset_s)
        return float(reset_s)
    return 0.0


def strava_backpressure(
    resp: Response, floor: int = 5, sleeper: Callable[[float], None] = time.sleep
) -> float:
    """Strava read-rate-limit handling (utils.py:337-347): headers carry
    '15min,daily' pairs; when the 15-minute window has < floor calls
    left, sleep out the window (15 min). Returns seconds slept."""
    limits = resp.headers.get("x-readratelimit-limit")
    usage = resp.headers.get("x-readratelimit-usage")
    if not limits or not usage:
        return 0.0
    limit_15 = int(limits.split(",")[0])
    usage_15 = int(usage.split(",")[0])
    if limit_15 - usage_15 < floor:
        sleeper(15 * 60)
        return float(15 * 60)
    return 0.0


@dataclass
class HttpRestSource:
    """Live ``RestSource`` (sources.RestSource protocol): one intraday
    fetch per (resource, date) work item against a Fitbit-shaped
    endpoint (fitbit_utils.py:259-279), with retry + header
    backpressure. 404 / empty body → empty row list (the reference's
    empty-result guard, fitbit_utils.py:270-277)."""

    base_url: str
    transport: Transport
    headers: dict[str, str] = field(default_factory=dict)
    policy: RetryPolicy = field(default_factory=RetryPolicy)
    sleeper: Callable[[float], None] = time.sleep

    def fetch(self, resource: str, date: str) -> list[dict]:
        url = f"{self.base_url}/{resource}/date/{date}/1d.json"
        resp = get_with_retry(
            self.transport, url, headers=self.headers,
            policy=self.policy, sleeper=self.sleeper,
        )
        fitbit_backpressure(resp, sleeper=self.sleeper)
        if resp.status_code == 404:
            return []
        body = resp.json() or {}
        # intraday payload: {"<resource>-intraday": {"dataset": [...]}}
        intraday = body.get(f"{resource}-intraday", {})
        return list(intraday.get("dataset", []))


@dataclass
class PaginatedSource:
    """Strava-activities-style pagination (utils.py:60-77): per_page
    items per call, page increments until an empty body; Strava
    rate-limit headers respected between pages."""

    url: str
    transport: Transport
    headers: dict[str, str] = field(default_factory=dict)
    per_page: int = 200
    policy: RetryPolicy = field(default_factory=RetryPolicy)
    sleeper: Callable[[float], None] = time.sleep

    def fetch_all(self, params: Mapping[str, Any] | None = None) -> list[dict]:
        out: list[dict] = []
        page = 1
        while True:
            q = dict(params or {})
            q.update({"per_page": self.per_page, "page": page})
            resp = get_with_retry(
                self.transport, self.url, params=q, headers=self.headers,
                policy=self.policy, sleeper=self.sleeper,
            )
            strava_backpressure(resp, sleeper=self.sleeper)
            if resp.status_code == 404:
                return out
            items: Sequence[dict] = resp.json() or []
            if not items:
                return out
            out.extend(items)
            page += 1

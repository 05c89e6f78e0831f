"""OAuth 2.0 authorization-code flow for the ingest control plane.

Re-expresses the reference's token dance (reference
services/fitbit/fitbit_utils.py:116-182 and
services/strava/utils.py:428-488) with the transport and clock injected
so everything is testable without a browser or external network:

- ``authorization_url`` builds the provider consent URL (the reference
  opens it in a webbrowser);
- ``CallbackServer`` is the localhost redirect catcher — stdlib
  HTTPServer on a daemon thread capturing the ``code`` query param
  (fitbit_utils.py:157-182 uses BaseHTTPRequestHandler on :1410, the
  strava flow a Flask route on :8000 — same shape);
- ``OAuthClient.exchange_code`` POSTs the grant exactly like
  utils.py:478-487 (client_id/client_secret/code/grant_type);
- ``OAuthClient.refresh`` / ``ensure_fresh`` add the refresh-token
  rotation the reference *needs* but never implemented — its token
  simply expires mid-backfill (documented gap, not behavior parity);
- ``Token.save``/``Token.load`` persist the grant as JSON so re-runs
  skip the browser dance entirely.

No Spark here: tokens feed ``rest.HttpRestSource`` headers.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.parse
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, HTTPServer
from pathlib import Path
from typing import Callable

from .rest import Response, Transport

# refresh this many seconds before the advertised expiry: in-flight
# requests must not straddle the expiry instant
EXPIRY_SKEW_SECONDS = 60


def authorization_url(
    authorize_base: str,
    client_id: str,
    redirect_uri: str,
    scope: tuple[str, ...] | list[str],
    state: str | None = None,
) -> str:
    """The provider consent URL (utils.py:462-470's urlencode dance)."""
    params = {
        "client_id": client_id,
        "redirect_uri": redirect_uri,
        "response_type": "code",
        "scope": " ".join(scope),
    }
    if state is not None:
        params["state"] = state
    return f"{authorize_base}?{urllib.parse.urlencode(params)}"


@dataclass
class Token:
    """One OAuth grant. ``expires_at`` is an absolute epoch second —
    providers answer with relative ``expires_in``; the client stamps it
    against its own clock at receipt."""

    access_token: str
    refresh_token: str | None = None
    expires_at: float | None = None
    token_type: str = "Bearer"
    scope: str = ""

    def is_expired(self, now: float, skew: float = EXPIRY_SKEW_SECONDS) -> bool:
        if self.expires_at is None:
            return False
        return now >= self.expires_at - skew

    def auth_header(self) -> dict[str, str]:
        return {"Authorization": f"{self.token_type} {self.access_token}"}

    def to_dict(self) -> dict:
        return {
            "access_token": self.access_token,
            "refresh_token": self.refresh_token,
            "expires_at": self.expires_at,
            "token_type": self.token_type,
            "scope": self.scope,
        }

    def save(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.to_dict()))

    @classmethod
    def load(cls, path: str | Path) -> "Token":
        return cls(**json.loads(Path(path).read_text()))


class OAuthError(RuntimeError):
    pass


@dataclass
class OAuthClient:
    """Code→token exchange and refresh against one provider."""

    token_url: str
    client_id: str
    client_secret: str
    transport: Transport
    clock: Callable[[], float] = time.time

    def _grant(self, data: dict) -> Token:
        resp: Response = self.transport.post(self.token_url, data=data)
        if resp.status_code != 200:
            raise OAuthError(f"token endpoint returned {resp.status_code}")
        body = resp.json()
        if "access_token" not in body:
            raise OAuthError(f"token response missing access_token: {sorted(body)}")
        expires_at = None
        if body.get("expires_in") is not None:
            expires_at = self.clock() + float(body["expires_in"])
        return Token(
            access_token=body["access_token"],
            refresh_token=body.get("refresh_token"),
            expires_at=expires_at,
            token_type=body.get("token_type", "Bearer"),
            scope=body.get("scope", ""),
        )

    def exchange_code(self, code: str, redirect_uri: str) -> Token:
        """Authorization-code grant (utils.py:478-487)."""
        return self._grant(
            {
                "client_id": self.client_id,
                "client_secret": self.client_secret,
                "code": code,
                "grant_type": "authorization_code",
                "redirect_uri": redirect_uri,
            }
        )

    def refresh(self, token: Token) -> Token:
        """Refresh-token grant — rotation: the provider may answer with
        a NEW refresh token; keep the old one only as a fallback."""
        if not token.refresh_token:
            raise OAuthError("no refresh_token on grant; re-authorize")
        fresh = self._grant(
            {
                "client_id": self.client_id,
                "client_secret": self.client_secret,
                "refresh_token": token.refresh_token,
                "grant_type": "refresh_token",
            }
        )
        if fresh.refresh_token is None:
            fresh.refresh_token = token.refresh_token
        return fresh

    def ensure_fresh(self, token: Token) -> Token:
        """The call sites' single entry point: hand back the same token
        while it is live, transparently refresh once it is inside the
        expiry skew — the gap that stalls the reference mid-backfill."""
        if token.is_expired(self.clock()):
            return self.refresh(token)
        return token


class _CallbackHandler(BaseHTTPRequestHandler):
    def do_GET(self) -> None:  # noqa: N802 (stdlib API name)
        q = urllib.parse.urlparse(self.path).query
        code = urllib.parse.parse_qs(q).get("code", [None])[0]
        self.server.oauth_code = code  # type: ignore[attr-defined]
        self.server.callback_path = self.path  # type: ignore[attr-defined]
        self.send_response(200)
        self.send_header("Content-type", "text/html")
        self.end_headers()
        self.wfile.write(
            b"<html><body><h1>Authorization received. "
            b"You can close this tab now.</h1></body></html>"
        )

    def log_message(self, *args) -> None:  # silence per-request stderr
        pass


@dataclass
class CallbackServer:
    """Localhost redirect catcher (fitbit_utils.py:157-182). Port 0
    picks a free ephemeral port — the redirect_uri must be registered
    accordingly; the reference pins :1410 / :8000."""

    port: int = 0
    _httpd: HTTPServer = field(init=False, repr=False)

    def __post_init__(self) -> None:
        self._httpd = HTTPServer(("127.0.0.1", self.port), _CallbackHandler)
        self._httpd.oauth_code = None  # type: ignore[attr-defined]
        thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        thread.start()

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def wait_for_code(
        self, timeout_seconds: float = 120.0, poll: float = 0.05
    ) -> str:
        """Block until the provider redirects with ?code=... (the
        reference's while-not-hasattr poll loop, fitbit_utils.py:144-147)."""
        deadline = time.monotonic() + timeout_seconds
        while time.monotonic() < deadline:
            code = getattr(self._httpd, "oauth_code", None)
            if code:
                return code
            time.sleep(poll)
        raise TimeoutError("no OAuth callback received")

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

"""Webhook subsystem feature tests — the `tests/Feature/WebhookTest.php` role
of the reference's @web Laravel suite, driven through the WSGI app like the
other nu_scaler_web tests. Covers CRUD + ownership, validation rules
(StoreWebhookRequest.php:15-24), delivery with HMAC signature + headers
(WebhookService.php:52-150), the fail-count deactivation ladder
(Webhook.php:68-116), retry/test endpoints, and event dispatch from the
feedback handlers (ProcessWebhooks.php:44-103).
"""

from __future__ import annotations

import hashlib
import hmac
import json

import pytest

from nu_scaler_web import webhooks as wh
from nu_scaler_web.app import WebApp
from nu_scaler_web.store import Store
from tests.test_webservice import Client


class FakeTransport:
    """Captures deliveries; scriptable status per call."""

    def __init__(self):
        self.calls = []
        self.status = 200
        self.raise_error = None

    def __call__(self, url, body, headers, timeout):
        self.calls.append({
            "url": url,
            "body": json.loads(body),
            "headers": dict(headers),
            "timeout": timeout,
        })
        if self.raise_error is not None:
            raise self.raise_error
        return self.status, "ok"


@pytest.fixture()
def transport():
    return FakeTransport()


@pytest.fixture()
def client(transport):
    # sync dispatch + private destinations allowed: deterministic delivery
    # assertions against the fake transport (async mode + the SSRF guard
    # have their own tests below)
    return Client(WebApp(Store(":memory:"), webhook_transport=transport,
                         webhook_async=False, webhook_allow_private=True))


@pytest.fixture()
def user_token(client):
    st, d = client.post("/api/v1/auth/register", {
        "name": "Hook Owner", "email": "hooks@example.com",
        "password": "secret123",
    })
    assert st == 201
    client.token = d["token"]
    return d["token"]


def _create(client, **over):
    body = {
        "name": "CI hook",
        "url": "https://ci.example.com/hook",
        "events": ["feedback.review.created"],
    }
    body.update(over)
    return client.post("/api/v1/webhooks", body)


# -- CRUD + ownership ---------------------------------------------------------


def test_crud_flow_and_secret_hidden(client, user_token):
    st, d = _create(client, description="notify CI",
                    headers={"X-Extra": "1"})
    assert st == 201
    hook = d["data"]
    assert hook["name"] == "CI hook" and hook["is_active"] is True
    assert hook["events"] == ["feedback.review.created"]
    # the secret is $hidden on the model (Webhook.php:48-50)
    assert "secret" not in hook

    st, d = client.get("/api/v1/webhooks")
    assert st == 200 and len(d["data"]) == 1

    st, d = client.get(f"/api/v1/webhooks/{hook['id']}")
    assert st == 200 and d["data"]["id"] == hook["id"]

    st, d = client.request("PUT", f"/api/v1/webhooks/{hook['id']}",
                           {"name": "Renamed", "is_active": False})
    assert st == 200
    assert d["data"]["name"] == "Renamed" and d["data"]["is_active"] is False
    # untouched fields survive a partial update ('sometimes' rules)
    assert d["data"]["url"] == "https://ci.example.com/hook"

    st, d = client.request("DELETE", f"/api/v1/webhooks/{hook['id']}")
    assert st == 200
    st, d = client.get("/api/v1/webhooks")
    assert d["data"] == []


def test_requires_auth_and_ownership(client, user_token):
    st, d = _create(client)
    wid = d["data"]["id"]

    st, _ = client.get("/api/v1/webhooks", token="")
    assert st == 401

    # another user can't see/modify/test it (WebhookController ownership)
    st, d2 = client.post("/api/v1/auth/register", {
        "name": "Other", "email": "other@example.com", "password": "secret123",
    })
    other = d2["token"]
    assert client.get(f"/api/v1/webhooks/{wid}", token=other)[0] == 403
    assert client.request("DELETE", f"/api/v1/webhooks/{wid}", token=other)[0] == 403
    assert client.post(f"/api/v1/webhooks/{wid}/test", {}, token=other)[0] == 403
    # and their index doesn't list it (findByUser scoping)
    assert client.get("/api/v1/webhooks", token=other)[1]["data"] == []

    assert client.get("/api/v1/webhooks/9999")[0] == 404


def test_validation_rules(client, user_token):
    # StoreWebhookRequest.php:17-23
    assert _create(client, name=None)[0] == 422
    assert _create(client, url="not-a-url")[0] == 422
    assert _create(client, events=[])[0] == 422
    assert _create(client, events=["nonsense.event"])[0] == 422
    st, d = _create(client, events=list(wh.EVENTS))
    assert st == 201


# -- delivery -----------------------------------------------------------------


def test_delivery_headers_signature_and_log(client, user_token, transport):
    st, d = _create(client, headers={"X-Team": "render"})
    wid = d["data"]["id"]
    # secret is only obtainable via regenerate (WebhookController:147-165)
    st, d = client.post(f"/api/v1/webhooks/{wid}/regenerate-secret", {})
    assert st == 200
    secret = d["data"]["secret"]
    assert len(secret) == 40  # Str::random(40) parity

    st, d = client.post("/api/v1/feedback/reviews",
                        {"rating": 5, "comment": "fast!"})
    assert st == 201
    assert len(transport.calls) == 1
    call = transport.calls[0]
    assert call["url"] == "https://ci.example.com/hook"
    assert call["body"]["event"] == "feedback.review.created"
    assert call["body"]["payload"]["rating"] == 5
    h = call["headers"]
    assert h["User-Agent"] == "Nu-Scaler-Webhook/1.0"
    assert h["X-Nu-Scaler-Event"] == "feedback.review.created"
    assert h["X-Team"] == "render"
    expect = hmac.new(secret.encode(),
                      json.dumps(call["body"]["payload"]).encode(),
                      hashlib.sha256).hexdigest()
    assert h["X-Nu-Scaler-Signature"] == expect

    st, d = client.get(f"/api/v1/webhooks/{wid}/logs")
    assert st == 200 and len(d["data"]) == 1
    log = d["data"][0]
    assert log["success"] is True and log["status_code"] == 200
    assert log["event_type"] == "feedback.review.created"
    assert str(log["id"]) == h["X-Nu-Scaler-Delivery"]

    # success stamps last_triggered_at and resets fails (markAsTriggered)
    st, d = client.get(f"/api/v1/webhooks/{wid}")
    assert d["data"]["last_triggered_at"] is not None
    assert d["data"]["fails_count"] == 0


def test_event_subscription_filtering(client, user_token, transport):
    _create(client, events=["feedback.bug.created"])
    client.post("/api/v1/feedback/reviews", {"rating": 4, "comment": "x"})
    assert transport.calls == []  # not subscribed to review events
    client.post("/api/v1/feedback/bug-reports", {
        "description": "crash on resize", "category": "crash",
        "severity": "high",
        "system_info": {"os": "linux", "app_version": "0.3.0"},
    })
    assert len(transport.calls) == 1
    assert transport.calls[0]["body"]["payload"]["severity"] == "high"


def test_fail_count_deactivates_after_ten(client, user_token, transport):
    st, d = _create(client)
    wid = d["data"]["id"]
    transport.status = 500
    for i in range(wh.MAX_FAILS):
        client.post("/api/v1/feedback/reviews", {"rating": 1, "comment": "y"})
    assert len(transport.calls) == wh.MAX_FAILS
    st, d = client.get(f"/api/v1/webhooks/{wid}")
    # 10th failure flips is_active off (Webhook.php:108-116)
    assert d["data"]["fails_count"] == wh.MAX_FAILS
    assert d["data"]["is_active"] is False
    # and no further deliveries happen
    client.post("/api/v1/feedback/reviews", {"rating": 1, "comment": "z"})
    assert len(transport.calls) == wh.MAX_FAILS


def test_transport_error_logged_and_counted(client, user_token, transport):
    st, d = _create(client)
    wid = d["data"]["id"]
    transport.raise_error = OSError("connection refused")
    client.post("/api/v1/feedback/reviews", {"rating": 2, "comment": "meh"})
    st, d = client.get(f"/api/v1/webhooks/{wid}/logs")
    log = d["data"][0]
    assert log["success"] is False and "connection refused" in log["error"]
    st, d = client.get(f"/api/v1/webhooks/{wid}")
    assert d["data"]["fails_count"] == 1


def test_ping_and_retry(client, user_token, transport):
    st, d = _create(client)
    wid = d["data"]["id"]

    st, d = client.post(f"/api/v1/webhooks/{wid}/test", {})
    assert st == 200 and d["success"] is True
    assert transport.calls[-1]["body"]["event"] == "ping"

    # a failed delivery can be retried once the endpoint recovers
    transport.status = 500
    client.post("/api/v1/feedback/reviews", {"rating": 3, "comment": "ok"})
    st, d = client.get(f"/api/v1/webhooks/{wid}/logs")
    failed = next(l for l in d["data"] if not l["success"])
    transport.status = 200
    st, d = client.post(f"/api/v1/webhooks/logs/{failed['id']}/retry", {})
    assert st == 200 and d["success"] is True
    # the retry created a fresh log entry for the same event
    st, d = client.get(f"/api/v1/webhooks/{wid}/logs")
    assert [l for l in d["data"]
            if l["event_type"] == "feedback.review.created" and l["success"]]

    # retry on an inactive hook is refused (WebhookService.php:160-166)
    client.request("PUT", f"/api/v1/webhooks/{wid}", {"is_active": False})
    st, d = client.post(f"/api/v1/webhooks/logs/{failed['id']}/retry", {})
    assert st == 200 and d["success"] is False


def test_user_registered_never_dispatches(client, user_token, transport):
    """The event name is subscribable (StoreWebhookRequest.php:21 parity) but
    registration never fires it: the reference's ProcessWebhooks listener is
    disabled (EventServiceProvider.php:32) and has no user.registered payload
    builder — and delivering a new registrant's email to other users' hooks
    would leak PII (advisor r3, high)."""
    st, _ = _create(client, events=["user.registered"])
    assert st == 201
    st, d = client.post("/api/v1/auth/register", {
        "name": "New", "email": "new@example.com", "password": "secret123",
    })
    assert st == 201
    assert transport.calls == []


def test_reserved_delivery_headers_rejected(client, user_token):
    for k in ("Host", "User-Agent", "X-Nu-Scaler-Event", "content-length"):
        st, d = _create(client, headers={k: "evil"})
        assert st == 422, k
        assert "reserved" in d["errors"]["headers"][0]


def test_headers_cleared_by_explicit_null(client, user_token):
    st, d = _create(client, headers={"X-Team": "render"})
    wid = d["data"]["id"]
    assert d["data"]["headers"] == {"X-Team": "render"}
    # 'nullable|array' — null clears the stored headers (advisor r3, low)
    st, d = client.request("PUT", f"/api/v1/webhooks/{wid}", {"headers": None})
    assert st == 200 and d["data"]["headers"] is None


def test_private_destinations_blocked_by_default(transport):
    """SSRF guard (advisor r3): with the default allow_private=False, a hook
    pointing at loopback/RFC1918/metadata addresses is never delivered — the
    attempt is logged as a blocked failure and counts toward deactivation."""
    c = Client(WebApp(Store(":memory:"), webhook_transport=transport,
                      webhook_async=False))
    st, d = c.post("/api/v1/auth/register", {
        "name": "U", "email": "u@example.com", "password": "secret123",
    })
    c.token = d["token"]
    for url in ("http://127.0.0.1:9/x", "http://10.0.0.5/x",
                "http://169.254.169.254/latest/meta-data"):
        st, d = c.post("/api/v1/webhooks", {
            "name": "h", "url": url, "events": ["feedback.review.created"],
        })
        assert st == 201
    c.post("/api/v1/feedback/reviews", {"rating": 5, "comment": "x"})
    assert transport.calls == []  # nothing reached the transport
    st, d = c.get("/api/v1/webhooks")
    for hook in d["data"]:
        assert hook["fails_count"] == 1
        st2, logs = c.get(f"/api/v1/webhooks/{hook['id']}/logs")
        assert "delivery blocked" in logs["data"][0]["error"]


def test_async_dispatch_does_not_block_the_request(transport):
    """Inline fan-out is queued on the worker (advisor r3, medium): a slow
    hook endpoint must not stall an unauthenticated feedback POST."""
    import threading as _t
    import time as _time

    release = _t.Event()
    calls = []

    def slow_transport(url, body, headers, timeout):
        calls.append(url)
        release.wait(5.0)
        return 200, "ok"

    c = Client(WebApp(Store(":memory:"), webhook_transport=slow_transport,
                      webhook_allow_private=True))  # async (default)
    st, d = c.post("/api/v1/auth/register", {
        "name": "U", "email": "u2@example.com", "password": "secret123",
    })
    c.token = d["token"]
    _create(c)
    t0 = _time.perf_counter()
    st, _ = c.post("/api/v1/feedback/reviews", {"rating": 4, "comment": "y"})
    took = _time.perf_counter() - t0
    assert st == 201 and took < 1.0  # returned while delivery is in flight
    release.set()
    c.app.webhooks.flush()
    assert calls == ["https://ci.example.com/hook"]


# -- live round trip ----------------------------------------------------------


def test_live_delivery_round_trip(client, user_token):
    """Real urllib delivery to a local HTTP server — the default transport
    path (WebhookService.php's Http::post role)."""
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    received = {}

    class Receiver(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            received["body"] = json.loads(self.rfile.read(n))
            received["event"] = self.headers.get("X-Nu-Scaler-Event")
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"ok")

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Receiver)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        # swap in the real transport for this app instance
        client.app.webhooks.transport = wh.urllib_transport
        st, d = _create(
            client, url=f"http://127.0.0.1:{srv.server_port}/hook")
        wid = d["data"]["id"]
        st, d = client.post(f"/api/v1/webhooks/{wid}/test", {})
        assert st == 200 and d["success"] is True
        assert received["event"] == "ping"
        assert received["body"]["payload"]["message"].startswith("This is a test ping")
    finally:
        srv.shutdown()
        srv.server_close()

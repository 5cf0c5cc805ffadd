"""Webhook delivery — the Webhook/WebhookLog/WebhookService subsystem of the
reference's @web API, rebuilt on the stdlib.

Reference semantics (file:line under /root/reference/@web/server/laravel_app):

* ``app/Models/Webhook.php:57-121`` — 40-char secret generation, event
  matching (``'*'`` wildcard or exact name), auto-deactivation once
  ``fails_count`` reaches 10, and fail-count reset + ``last_triggered_at``
  stamp on a successful delivery.
* ``app/Services/WebhookService.php:29-191`` — fan-out of an event to every
  active subscribed hook, per-delivery log row created up front and updated
  with status/response/error, delivery headers
  (``X-Nu-Scaler-{Event,Delivery,Signature}``, ``User-Agent``), HMAC-SHA256
  payload signature, 30 s timeout, retry of a logged delivery (refused when
  the hook is gone or inactive), and ``create()`` defaulting
  ``secret``/``is_active``.
* ``app/Listeners/ProcessWebhooks.php:44-103`` — the feedback event names and
  payload shapes. NOTE: the reference left this listener commented out of
  ``EventServiceProvider.php:32`` (registered code, disabled wiring); here
  dispatch IS wired into the app's feedback/register handlers — with zero
  registered hooks it is a no-op, and with hooks it does what the reference's
  dormant listener describes.

The reference queues deliveries on a redis ``webhooks`` queue
(``ProcessWebhooks.php:17-24``); this rebuild queues event fan-out on a
single daemon worker thread (``dispatch_event``) so a slow hook endpoint
never stalls a public request handler, while the explicit ``/test`` and
``/retry`` endpoints stay synchronous (they report success inline, like the
reference's controller actions). The ``transport`` callable (urllib by
default) is injectable so tests can capture deliveries or run a real
localhost HTTP round trip; ``async_dispatch=False`` makes ``dispatch_event``
synchronous for deterministic tests.

Delivery destinations are SSRF-guarded: every resolved address of the hook
URL's host must be globally routable (no loopback/RFC1918/link-local/
metadata targets) unless ``allow_private`` is set — the reference's
validation is scheme+netloc only, but its delivery path was dormant; here it
is live, so the server's network position needs protecting.
"""

from __future__ import annotations

import hashlib
import hmac
import ipaddress
import json
import queue
import secrets
import socket
import threading
import urllib.error
import urllib.parse
import urllib.request
from typing import Callable, Optional

# StoreWebhookRequest.php:21 — the subscribable event names ('*' additionally
# accepted by Webhook::shouldTriggerFor, model-side only in the reference).
EVENTS = (
    "feedback.review.created",
    "feedback.bug.created",
    "feedback.hardware.created",
    "user.registered",
)

MAX_FAILS = 10          # Webhook.php:78,113 — deactivate at the 10th failure
TIMEOUT_S = 30.0        # WebhookService.php:83

# (url, body_bytes, headers, timeout_s) -> (status_code, response_text);
# raises on transport-level failure (connection refused, timeout, DNS).
Transport = Callable[[str, bytes, dict, float], tuple]


def generate_secret() -> str:
    """``Webhook::generateSecret`` — ``Str::random(40)`` (Webhook.php:57-60)."""
    return secrets.token_hex(20)


def sign(secret: str, payload_json: str) -> str:
    """``hash_hmac('sha256', payload, secret)`` (WebhookService.php:147-150)."""
    return hmac.new(secret.encode(), payload_json.encode(), hashlib.sha256).hexdigest()


def blocked_destination(url: str) -> Optional[str]:
    """Return a reason string when `url` must not be delivered to (loopback,
    private, link-local, or otherwise non-global address — including every
    resolved A/AAAA record, so a public name pointing at 169.254.169.254 is
    caught), or None when it is deliverable."""
    host = urllib.parse.urlparse(url).hostname
    if not host:
        return "no host"
    try:
        addrs = {info[4][0] for info in socket.getaddrinfo(host, None)}
    except OSError as e:
        return f"unresolvable host: {e}"
    for a in addrs:
        try:
            ip = ipaddress.ip_address(a.split("%")[0])
        except ValueError:
            return f"unparseable address {a!r}"
        if not ip.is_global:
            return f"non-global address {a}"
    return None


def urllib_transport(url: str, body: bytes, headers: dict, timeout: float):
    req = urllib.request.Request(url, data=body, headers=headers, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, resp.read().decode("utf-8", "replace")
    except urllib.error.HTTPError as e:
        # A non-2xx response is a completed delivery, not a transport error
        # (Laravel's Http client also returns, not throws, on 4xx/5xx here).
        return e.code, e.read().decode("utf-8", "replace")


def should_trigger_for(store, webhook: dict, event: str) -> bool:
    """``Webhook::shouldTriggerFor`` (Webhook.php:68-89), including its
    side effect of deactivating an over-failed hook on the way out."""
    if not webhook["is_active"]:
        return False
    if webhook["fails_count"] >= MAX_FAILS:
        store.update_webhook(webhook["id"], {"is_active": 0})
        return False
    events = webhook["events"]
    return "*" in events or event in events


class WebhookService:
    """``App\\Services\\WebhookService`` (synchronous; see module docstring)."""

    def __init__(self, store, transport: Optional[Transport] = None,
                 timeout: float = TIMEOUT_S, async_dispatch: bool = True,
                 allow_private: bool = False):
        self.store = store
        self.transport = transport or urllib_transport
        self.timeout = timeout
        self.async_dispatch = async_dispatch
        self.allow_private = allow_private
        self._queue: "queue.Queue[tuple]" = queue.Queue()
        self._worker: Optional[threading.Thread] = None
        self._worker_lock = threading.Lock()

    # -- delivery (WebhookService.php:52-144) --------------------------------

    def send(self, webhook: dict, event: str, payload: dict) -> bool:
        log = self.store.add_webhook_log(webhook["id"], event, payload)
        if not self.allow_private:
            reason = blocked_destination(webhook["url"])
            if reason is not None:
                self.store.update_webhook_log(
                    log["id"],
                    {"error": f"delivery blocked: {reason}", "success": 0},
                )
                self.store.increment_webhook_fail(webhook["id"])
                return False
        headers = {
            "Content-Type": "application/json",
            "User-Agent": "Nu-Scaler-Webhook/1.0",
            "X-Nu-Scaler-Event": event,
            "X-Nu-Scaler-Delivery": str(log["id"]),
        }
        headers.update(webhook.get("headers") or {})
        if webhook.get("secret"):
            headers["X-Nu-Scaler-Signature"] = sign(
                webhook["secret"], json.dumps(payload)
            )
        body = json.dumps({"event": event, "payload": payload}).encode()
        try:
            status, text = self.transport(webhook["url"], body, headers, self.timeout)
        except Exception as e:  # transport failure (WebhookService.php:104-138)
            self.store.update_webhook_log(log["id"], {"error": str(e), "success": 0})
            self.store.increment_webhook_fail(webhook["id"])
            return False
        ok = 200 <= status < 300
        self.store.update_webhook_log(
            log["id"],
            {"status_code": status, "response": text, "success": int(ok)},
        )
        if ok:
            self.store.mark_webhook_triggered(webhook["id"])
        else:
            self.store.increment_webhook_fail(webhook["id"])
        return ok

    def _dispatch_now(self, event: str, payload: dict) -> int:
        return sum(
            self.send(w, event, payload)
            for w in self.store.active_webhooks()
            if should_trigger_for(self.store, w, event)
        )

    def _drain(self) -> None:
        while True:
            event, payload = self._queue.get()
            try:
                self._dispatch_now(event, payload)
            except Exception:  # noqa: BLE001 — a bad hook must not kill the worker
                pass
            finally:
                self._queue.task_done()

    def dispatch_event(self, event: str, payload: dict) -> int:
        """Fan an event out to every active subscribed hook
        (WebhookService.php:29-42). Asynchronous by default — deliveries are
        queued on one daemon worker (the redis ``webhooks`` queue role,
        ProcessWebhooks.php:17-24) so public request handlers never block on
        a hook endpoint; returns the number queued. With
        ``async_dispatch=False`` delivers inline and returns successes."""
        if not self.async_dispatch:
            return self._dispatch_now(event, payload)
        with self._worker_lock:
            if self._worker is None or not self._worker.is_alive():
                self._worker = threading.Thread(
                    target=self._drain, name="webhook-dispatch", daemon=True
                )
                self._worker.start()
        self._queue.put((event, payload))
        return 1

    def flush(self) -> None:
        """Block until every queued dispatch has been delivered (tests)."""
        self._queue.join()

    def retry(self, log: dict) -> bool:
        """Re-send a logged delivery (WebhookService.php:157-172)."""
        webhook = self.store.webhook_by_id(log["webhook_id"])
        if webhook is None or not webhook["is_active"]:
            return False
        return self.send(webhook, log["event_type"], log["payload"])

    # -- event payloads (ProcessWebhooks.php:66-103) --------------------------

    @staticmethod
    def feedback_payload(row: dict, kind: str) -> dict:
        base = {"id": row["id"], "type": kind, "created_at": row["created_at"]}
        if kind == "review":
            base.update(rating=row["rating"], comment=row["comment"])
        elif kind == "bug-report":
            base.update(
                description=row["description"], category=row["category"],
                severity=row["severity"], system_info=row["system_info"],
            )
        elif kind == "hardware-survey":
            base.update(
                cpu_model=row["cpu_model"], gpu_model=row["gpu_model"],
                ram_size=row["ram_size"], os=row["os"],
                resolution=row["resolution"],
            )
        return base

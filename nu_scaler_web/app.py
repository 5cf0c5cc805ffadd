"""WSGI application — the Laravel router/controller role of the reference's
@web API (`@web/server/laravel_app/routes/api.php`). Endpoints are the
engine-relevant subset, with Laravel-style response shapes (201 + message,
422 validation errors keyed by field). Dependency-free: serve with wsgiref
(`python -m nu_scaler_web`) or mount under any WSGI server.

Route map (reference file:line in handlers):
  POST /api/v1/auth/register            AuthController.register
  POST /api/v1/login                    AuthController.login
  POST /api/v1/logout            [auth] AuthController.logout
  GET  /api/v1/user              [auth]
  GET  /api/v1/download          [auth] DownloadController.getDownloadLink
  GET  /api/v1/download/public          DownloadController.getPublicDownloadLink
  GET  /api/v1/download/file/{platform} DownloadController.downloadFile
  GET  /api/v1/feedback/stats           FeedbackController.publicStats
  POST /api/v1/feedback/reviews         FeedbackController.storeReview
  POST /api/v1/feedback/bug-reports     FeedbackController.storeBugReport
  POST /api/v1/feedback/hardware-surveys FeedbackController.storeHardwareSurvey
  POST /api/v1/benchmarks               (engine tie-in: bench.py JSON line)
  GET/POST /api/v1/webhooks      [auth] WebhookController.index/store
  GET/PUT/DELETE /api/v1/webhooks/{id} [auth] WebhookController.show/update/destroy
  GET  /api/v1/webhooks/{id}/logs [auth] WebhookController.logs
  POST /api/v1/webhooks/{id}/regenerate-secret [auth]
  POST /api/v1/webhooks/{id}/test [auth] WebhookController.test (ping event)
  POST /api/v1/webhooks/logs/{id}/retry [auth] WebhookController.retry
  GET  /api/v1/download/direct          DownloadController.downloadDirectFile
  GET  /api/admin/session/check         AdminSessionController.check
  GET  /api/admin/metrics/dashboard [admin] AdminMetricsController.dashboard
  GET  /api/admin/metrics/{reviews,bug-reports,hardware-surveys} [admin]
                                        AdminMetricsController.*Metrics
  GET  /api/admin/metrics/reviews-distribution [admin] (bare-list response)
  GET  /api/admin/metrics/{user-growth,feedback-trends}?period=&type= [admin]
  GET  /api/admin/metrics/export [admin] AdminMetricsController.exportAllMetrics
  GET  /api/admin/{reviews,bug-reports,hardware-surveys} [admin]
       (filtered + unified-paginated), /{id} show, /export CSV
  GET  /api/admin/benchmarks     [admin] (engine tie-in)
  GET  /api/admin/logs{,/stats,/search,/type/{t},/file/{f}} [admin]
  DELETE /api/admin/logs/file/{f} [admin] LogDashboardController.*
  GET  /api/admin/users          [admin] UserManagementController.index
  PATCH /api/admin/users/{id}/role [admin] UserManagementController.updateRole
  PATCH /api/admin/users/{id}/status [admin] UserManagementController.updateStatus
"""

from __future__ import annotations

import base64
import csv
import io
import json
import os
import re
import time
from typing import Callable, Optional
from urllib.parse import parse_qs

from nu_scaler_web import webhooks as wh
from nu_scaler_web.store import Store

VERSION = "0.3.0"
PLATFORMS = ("windows", "linux", "macos")

_STATUS = {
    200: "200 OK", 201: "201 Created", 204: "204 No Content",
    400: "400 Bad Request", 401: "401 Unauthorized", 403: "403 Forbidden",
    404: "404 Not Found", 405: "405 Method Not Allowed",
    422: "422 Unprocessable Entity",
}


class _Http(Exception):
    def __init__(self, status: int, body: dict):
        self.status, self.body = status, body


class _Raw:
    """Non-JSON handler payload (CSV exports, the direct-download artifact —
    Laravel's Response::stream / response()->download role)."""

    def __init__(self, data: bytes, content_type: str, headers: Optional[dict] = None):
        self.data, self.content_type = data, content_type
        self.headers = headers or {}


def _require(d: dict, field: str, typ, *, max_len: int = 0, choices=None,
             lo=None, hi=None, required: bool = True):
    """Laravel-rule style validation (app/Http/Requests/*.php); raises 422
    with {errors: {field: [msg]}} on the first violation, like their
    FormRequest failedValidation hook."""
    v = d.get(field)
    if v is None:
        if required:
            raise _Http(422, {"message": "Validation failed",
                              "errors": {field: [f"The {field} field is required."]}})
        return None
    if typ is int and isinstance(v, bool):
        v = int(v)
    if not isinstance(v, typ):
        if typ is int and isinstance(v, str) and v.lstrip("-").isdigit():
            v = int(v)
        else:
            tname = getattr(typ, "__name__", "a number")
            raise _Http(422, {"message": "Validation failed",
                              "errors": {field: [f"The {field} field must be {tname}."]}})
    if max_len and isinstance(v, str) and len(v) > max_len:
        raise _Http(422, {"message": "Validation failed",
                          "errors": {field: [f"The {field} may not be greater than {max_len} characters."]}})
    if choices is not None and v not in choices:
        raise _Http(422, {"message": "Validation failed",
                          "errors": {field: [f"The selected {field} is invalid."]}})
    if lo is not None and v < lo or hi is not None and v > hi:
        raise _Http(422, {"message": "Validation failed",
                          "errors": {field: [f"The {field} must be between {lo} and {hi}."]}})
    return v


class WebApp:
    """The WSGI callable. One instance per Store."""

    def __init__(self, store: Optional[Store] = None, wheel_dir: str = "dist",
                 webhook_transport=None, webhook_async: bool = True,
                 webhook_allow_private: bool = False,
                 log_dir: Optional[str] = None):
        self.store = store or Store()
        self.wheel_dir = wheel_dir
        self._log_dir = log_dir  # None → nu_scaler.logger.data_dir() lazily
        self.webhooks = wh.WebhookService(
            self.store, transport=webhook_transport,
            async_dispatch=webhook_async, allow_private=webhook_allow_private,
        )
        # method, compiled path regex, handler, auth: None|'user'|'admin'
        self.routes: list[tuple[str, re.Pattern, Callable, Optional[str]]] = [
            ("POST", r"/api/v1/auth/register", self.register, None),
            ("POST", r"/api/v1/login", self.login, None),
            ("POST", r"/api/v1/logout", self.logout, "user"),
            ("GET", r"/api/v1/user", self.user_info, "user"),
            ("GET", r"/api/v1/download", self.download_link, "user"),
            ("GET", r"/api/v1/download/public", self.download_public, None),
            ("GET", r"/api/v1/download/file/(?P<platform>[a-z0-9]+)", self.download_file, None),
            ("GET", r"/api/v1/feedback/stats", self.public_stats, None),
            ("POST", r"/api/v1/feedback/reviews", self.store_review, None),
            ("POST", r"/api/v1/feedback/bug-reports", self.store_bug_report, None),
            ("POST", r"/api/v1/feedback/hardware-surveys", self.store_hardware_survey, None),
            ("POST", r"/api/v1/benchmarks", self.store_benchmark, None),
            ("GET", r"/api/v1/webhooks", self.webhooks_index, "user"),
            ("POST", r"/api/v1/webhooks", self.webhooks_store, "user"),
            ("POST", r"/api/v1/webhooks/logs/(?P<lid>\d+)/retry", self.webhook_retry, "user"),
            ("GET", r"/api/v1/webhooks/(?P<wid>\d+)", self.webhooks_show, "user"),
            ("PUT", r"/api/v1/webhooks/(?P<wid>\d+)", self.webhooks_update, "user"),
            ("DELETE", r"/api/v1/webhooks/(?P<wid>\d+)", self.webhooks_destroy, "user"),
            ("GET", r"/api/v1/webhooks/(?P<wid>\d+)/logs", self.webhook_logs, "user"),
            ("POST", r"/api/v1/webhooks/(?P<wid>\d+)/regenerate-secret",
             self.webhook_regenerate_secret, "user"),
            ("POST", r"/api/v1/webhooks/(?P<wid>\d+)/test", self.webhook_test, "user"),
            ("GET", r"/api/v1/download/direct", self.download_direct, None),
            ("GET", r"/api/admin/session/check", self.admin_session_check, None),
            ("GET", r"/api/admin/metrics/dashboard", self.admin_dashboard, "admin"),
            ("GET", r"/api/admin/metrics/reviews", self.admin_review_metrics, "admin"),
            ("GET", r"/api/admin/metrics/reviews-distribution",
             self.admin_reviews_distribution, "admin"),
            ("GET", r"/api/admin/metrics/bug-reports", self.admin_bug_metrics, "admin"),
            ("GET", r"/api/admin/metrics/hardware-surveys",
             self.admin_hardware_metrics, "admin"),
            ("GET", r"/api/admin/metrics/user-growth", self.admin_user_growth, "admin"),
            ("GET", r"/api/admin/metrics/feedback-trends",
             self.admin_feedback_trends, "admin"),
            ("GET", r"/api/admin/metrics/export", self.admin_metrics_export, "admin"),
            ("GET", r"/api/admin/reviews", self.admin_reviews, "admin"),
            ("GET", r"/api/admin/reviews/export",
             lambda req, **kw: self._admin_export(req, "reviews"), "admin"),
            ("GET", r"/api/admin/reviews/(?P<rid>\d+)",
             lambda req, rid="", **kw: self._admin_show("reviews", rid), "admin"),
            ("GET", r"/api/admin/bug-reports", self.admin_bug_reports, "admin"),
            ("GET", r"/api/admin/bug-reports/export",
             lambda req, **kw: self._admin_export(req, "bug_reports"), "admin"),
            ("GET", r"/api/admin/bug-reports/(?P<rid>\d+)",
             lambda req, rid="", **kw: self._admin_show("bug_reports", rid), "admin"),
            ("GET", r"/api/admin/hardware-surveys", self.admin_hardware_surveys, "admin"),
            ("GET", r"/api/admin/hardware-surveys/export",
             lambda req, **kw: self._admin_export(req, "hardware_surveys"), "admin"),
            ("GET", r"/api/admin/hardware-surveys/(?P<rid>\d+)",
             lambda req, rid="", **kw: self._admin_show("hardware_surveys", rid), "admin"),
            ("GET", r"/api/admin/benchmarks", lambda req, **kw: self._admin_list("benchmark_reports"), "admin"),
            ("GET", r"/api/admin/logs", self.admin_logs_index, "admin"),
            ("GET", r"/api/admin/logs/stats", self.admin_logs_stats, "admin"),
            ("GET", r"/api/admin/logs/search", self.admin_logs_search, "admin"),
            ("GET", r"/api/admin/logs/type/(?P<ltype>[a-z_]+)", self.admin_logs_list, "admin"),
            ("GET", r"/api/admin/logs/file/(?P<filename>[^/]+)", self.admin_logs_show, "admin"),
            ("DELETE", r"/api/admin/logs/file/(?P<filename>[^/]+)", self.admin_logs_delete, "admin"),
            ("GET", r"/api/admin/users", self.admin_users, "admin"),
            ("PATCH", r"/api/admin/users/(?P<uid>\d+)/role", self.admin_set_role, "admin"),
            ("PATCH", r"/api/admin/users/(?P<uid>\d+)/status", self.admin_set_status, "admin"),
        ]
        self._compiled = [
            (m, re.compile(f"^{p}$"), h, a) for (m, p, h, a) in self.routes
        ]

    # -- WSGI ---------------------------------------------------------------

    def __call__(self, environ, start_response):
        method = environ.get("REQUEST_METHOD", "GET")
        path = environ.get("PATH_INFO", "/")
        if method == "GET" and not path.startswith("/api"):
            # HTML frontend (the React SPA role — nu_scaler_web/frontend.py);
            # page shells are public like the SPA bundle, data loads client-
            # side from the JSON API below.
            from nu_scaler_web import frontend

            stats = None
            if path == "/":
                stats = self.public_stats({"body": {}, "user": None})[1]["data"]
            html = frontend.render(path, stats)
            if html is not None:
                data = html.encode()
                start_response(
                    _STATUS[200],
                    [("Content-Type", "text/html; charset=utf-8"),
                     ("Content-Length", str(len(data)))],
                )
                return [data]
        try:
            body = self._read_json(environ)
            req = {
                "body": body,
                "user": self._auth_user(environ),
                "environ": environ,
                "query": {
                    k: v[-1]
                    for k, v in parse_qs(
                        environ.get("QUERY_STRING", ""), keep_blank_values=True
                    ).items()
                },
            }
            matched_path = False
            for m, pat, handler, auth in self._compiled:
                mt = pat.match(path)
                if not mt:
                    continue
                matched_path = True
                if m != method:
                    continue
                if auth is not None:
                    if req["user"] is None:
                        raise _Http(401, {"message": "Unauthenticated."})
                    if auth == "admin" and req["user"]["role"] != "admin":
                        raise _Http(403, {"message": "Forbidden."})
                status, payload = handler(req, **mt.groupdict())
                if isinstance(payload, _Raw):
                    start_response(
                        _STATUS[status],
                        [("Content-Type", payload.content_type),
                         ("Content-Length", str(len(payload.data))),
                         *payload.headers.items()],
                    )
                    return [payload.data]
                return self._respond(start_response, status, payload)
            if matched_path:
                raise _Http(405, {"message": "Method Not Allowed"})
            raise _Http(404, {"message": "Not Found"})
        except _Http as e:
            return self._respond(start_response, e.status, e.body)

    @staticmethod
    def _read_json(environ) -> dict:
        try:
            n = int(environ.get("CONTENT_LENGTH") or 0)
        except ValueError:
            n = 0
        if n == 0:
            return {}
        raw = environ["wsgi.input"].read(n)
        try:
            d = json.loads(raw)
        except (ValueError, UnicodeDecodeError):
            raise _Http(400, {"message": "Malformed JSON body"})
        if not isinstance(d, dict):
            raise _Http(400, {"message": "JSON body must be an object"})
        return d

    def _auth_user(self, environ) -> Optional[dict]:
        hdr = environ.get("HTTP_AUTHORIZATION", "")
        if hdr.startswith("Bearer "):
            return self.store.user_for_token(hdr[7:].strip())
        return None

    @staticmethod
    def _respond(start_response, status: int, payload: dict):
        data = json.dumps(payload).encode()
        start_response(
            _STATUS[status],
            [("Content-Type", "application/json"),
             ("Content-Length", str(len(data)))],
        )
        return [data]

    @staticmethod
    def _public_user(u: dict) -> dict:
        return {"id": u["id"], "name": u["name"], "email": u["email"],
                "role": u["role"], "is_active": bool(u.get("is_active", 1))}

    # -- auth (AuthController.php) ------------------------------------------

    def register(self, req, **kw):
        d = req["body"]
        name = _require(d, "name", str, max_len=255)
        email = _require(d, "email", str, max_len=255)
        if "@" not in email:
            raise _Http(422, {"message": "Validation failed",
                              "errors": {"email": ["The email must be a valid email address."]}})
        password = _require(d, "password", str)
        if len(password) < 8:
            raise _Http(422, {"message": "Validation failed",
                              "errors": {"password": ["The password must be at least 8 characters."]}})
        user = self.store.create_user(name, email, password)
        if user is None:
            raise _Http(422, {"message": "Validation failed",
                              "errors": {"email": ["The email has already been taken."]}})
        token = self.store.issue_token(user["id"])
        # NO webhook dispatch here, deliberately: the reference never delivers
        # a user.registered event (ProcessWebhooks is commented out of
        # EventServiceProvider.php:32 and has no user.registered payload
        # builder), and fanning a new registrant's name/email out to other
        # users' hooks would leak PII. The event name stays subscribable for
        # StoreWebhookRequest.php:21 parity; it just never fires.
        return 201, {"message": "Registration successful",
                     "user": self._public_user(user), "token": token}

    def login(self, req, **kw):
        d = req["body"]
        email = _require(d, "email", str)
        password = _require(d, "password", str)
        user = self.store.verify_login(email, password)
        if user is None:
            raise _Http(401, {"message": "Invalid credentials"})
        return 200, {"message": "Login successful",
                     "user": self._public_user(user),
                     "token": self.store.issue_token(user["id"])}

    def logout(self, req, **kw):
        hdr = req["environ"].get("HTTP_AUTHORIZATION", "")
        self.store.revoke_token(hdr[7:].strip())
        return 200, {"message": "Logged out"}

    def user_info(self, req, **kw):
        return 200, {"data": self._public_user(req["user"])}

    # -- download (DownloadController.php) ----------------------------------

    def _link(self, platform: str) -> dict:
        return {
            "version": VERSION,
            "platform": platform,
            "url": f"/api/v1/download/file/{platform}",
            "filename": f"nu_scaler_tpu-{VERSION}-{platform}.whl",
        }

    def download_link(self, req, **kw):
        return 200, {"data": self._link("linux")}

    def download_public(self, req, **kw):
        return 200, {"data": [self._link(p) for p in PLATFORMS]}

    def download_direct(self, req, **kw):
        """Unauthenticated direct artifact download
        (DownloadController.downloadDirectFile, routes/api.php:54): streams
        the built distribution from `wheel_dir` (the reference serves
        NuScaler.exe from its @releases directory), logging an anonymous
        download; 404 when no artifact has been built."""
        candidates = []
        if os.path.isdir(self.wheel_dir):
            for name in os.listdir(self.wheel_dir):
                p = os.path.join(self.wheel_dir, name)
                if os.path.isfile(p) and name.endswith((".whl", ".tar.gz", ".exe")):
                    candidates.append(p)
        if not candidates:
            raise _Http(404, {"message": "File not found"})
        path = max(candidates, key=os.path.getmtime)
        with open(path, "rb") as f:
            data = f.read()
        self.store.log_download("direct", None)
        fname = os.path.basename(path)
        return 200, _Raw(
            data, "application/octet-stream",
            {"Content-Disposition": f'attachment; filename="{fname}"'},
        )

    def download_file(self, req, platform: str = "", **kw):
        if platform not in PLATFORMS:
            raise _Http(404, {"message": f"Unknown platform {platform!r}"})
        uid = req["user"]["id"] if req["user"] else None
        self.store.log_download(platform, uid)
        # metadata response (the artifact itself ships from the wheel build —
        # tools/build_executable.py / pip wheel; this logs + points at it)
        return 200, {"message": "Download recorded", "data": self._link(platform)}

    # -- feedback (FeedbackController.php; rules from Http/Requests) --------

    def store_review(self, req, **kw):
        d = req["body"]
        out = {
            "rating": _require(d, "rating", int, lo=1, hi=5),
            "comment": _require(d, "comment", str, max_len=1000),
            "name": _require(d, "name", str, max_len=255, required=False),
            "email": _require(d, "email", str, max_len=255, required=False),
        }
        row = self.store.add_review(out, req["user"]["id"] if req["user"] else None)
        self.webhooks.dispatch_event(
            "feedback.review.created", wh.WebhookService.feedback_payload(row, "review"))
        return 201, {"message": "Review submitted successfully", "data": row}

    def store_bug_report(self, req, **kw):
        d = req["body"]
        out = {
            "description": _require(d, "description", str, max_len=2000),
            "category": _require(d, "category", str,
                                 choices=("ui", "performance", "feature", "crash", "other")),
            "severity": _require(d, "severity", str,
                                 choices=("low", "medium", "high", "critical")),
            "steps_to_reproduce": _require(d, "steps_to_reproduce", str,
                                           max_len=2000, required=False),
            "system_info": _require(d, "system_info", dict),
        }
        _require(out["system_info"], "os", str, max_len=255)
        _require(out["system_info"], "app_version", str, max_len=50)
        row = self.store.add_bug_report(out, req["user"]["id"] if req["user"] else None)
        self.webhooks.dispatch_event(
            "feedback.bug.created", wh.WebhookService.feedback_payload(row, "bug-report"))
        return 201, {"message": "Bug report submitted successfully", "data": row}

    def store_hardware_survey(self, req, **kw):
        d = req["body"]
        out = {
            "cpu_model": _require(d, "cpu_model", str, max_len=255),
            "gpu_model": _require(d, "gpu_model", str, max_len=255),
            "ram_size": _require(d, "ram_size", int, lo=1, hi=10**6),
            "os": _require(d, "os", str, max_len=255),
            "resolution": _require(d, "resolution", str, max_len=50),
            "monitor_refresh_rate": _require(d, "monitor_refresh_rate", int,
                                             lo=1, hi=360, required=False),
            "additional_info": _require(d, "additional_info", str,
                                        max_len=1000, required=False),
        }
        row = self.store.add_hardware_survey(out, req["user"]["id"] if req["user"] else None)
        self.webhooks.dispatch_event(
            "feedback.hardware.created",
            wh.WebhookService.feedback_payload(row, "hardware-survey"))
        return 201, {"message": "Hardware survey submitted successfully", "data": row}

    def store_benchmark(self, req, **kw):
        """Engine tie-in: ingest the one-line JSON object bench.py prints
        (metric/value/unit/vs_baseline + extras)."""
        d = req["body"]
        out = dict(d)
        out["metric"] = _require(d, "metric", str, max_len=255)
        out["value"] = float(_require(d, "value", (int, float)))
        out["unit"] = _require(d, "unit", str, max_len=50)
        row = self.store.add_benchmark_report(out, req["user"]["id"] if req["user"] else None)
        return 201, {"message": "Benchmark report submitted successfully", "data": row}

    # -- webhooks (WebhookController.php; rules StoreWebhookRequest.php) -----

    @staticmethod
    def _public_webhook(w: dict) -> dict:
        # the secret is $hidden on the model (Webhook.php:48-50) — only
        # regenerate-secret ever returns it
        return {k: v for k, v in w.items() if k != "secret"}

    def _validate_webhook(self, d: dict, *, partial: bool) -> dict:
        """Store/UpdateWebhookRequest rules; `partial` = the update form's
        'sometimes' modifier (validate only the provided fields)."""
        out = {}
        if not partial or "name" in d:
            out["name"] = _require(d, "name", str, max_len=255)
        if not partial or "url" in d:
            url = _require(d, "url", str, max_len=1000)
            from urllib.parse import urlparse
            p = urlparse(url)
            if p.scheme not in ("http", "https") or not p.netloc:
                raise _Http(422, {"message": "Validation failed",
                                  "errors": {"url": ["The url must be a valid URL."]}})
            out["url"] = url
        if "description" in d:
            out["description"] = _require(d, "description", str,
                                           max_len=1000, required=False)
        if not partial or "events" in d:
            events = _require(d, "events", list)
            if not events:
                raise _Http(422, {"message": "Validation failed",
                                  "errors": {"events": ["The events field is required."]}})
            for e in events:
                if not isinstance(e, str) or e not in wh.EVENTS:
                    raise _Http(422, {"message": "Validation failed",
                                      "errors": {"events": ["The selected events is invalid."]}})
            out["events"] = events
        if "headers" in d:
            if d["headers"] is None:
                # 'nullable|array' — explicit null clears the stored headers
                out["headers"] = None
            else:
                headers = _require(d, "headers", dict)
                for k, v in headers.items():
                    if not isinstance(v, str):
                        raise _Http(422, {"message": "Validation failed",
                                          "errors": {"headers": ["The headers values must be strings."]}})
                    if k.lower() in ("host", "content-length", "user-agent") or \
                            k.lower().startswith("x-nu-scaler-"):
                        # delivery-identity headers are not user-overridable
                        raise _Http(422, {"message": "Validation failed",
                                          "errors": {"headers": [f"The header {k} is reserved."]}})
                out["headers"] = headers
        if partial and "is_active" in d:
            out["is_active"] = bool(_require(d, "is_active", (bool, int)))
        return out

    def _own_webhook(self, req, wid: str) -> dict:
        """404 on unknown id, 403 on another user's hook
        (WebhookController.php:79-81 ownership checks)."""
        w = self.store.webhook_by_id(int(wid))
        if w is None:
            raise _Http(404, {"message": "Webhook not found"})
        if w["user_id"] != req["user"]["id"]:
            raise _Http(403, {"message": "Forbidden"})
        return w

    def webhooks_index(self, req, **kw):
        rows = self.store.webhooks_for_user(req["user"]["id"])
        return 200, {"message": "Webhooks fetched successfully",
                     "data": [self._public_webhook(w) for w in rows]}

    def webhooks_store(self, req, **kw):
        d = self._validate_webhook(req["body"], partial=False)
        d["secret"] = wh.generate_secret()  # WebhookService::create default
        row = self.store.add_webhook(d, req["user"]["id"])
        return 201, {"message": "Webhook created successfully",
                     "data": self._public_webhook(row)}

    def webhooks_show(self, req, wid: str = "", **kw):
        return 200, {"message": "Webhook fetched successfully",
                     "data": self._public_webhook(self._own_webhook(req, wid))}

    def webhooks_update(self, req, wid: str = "", **kw):
        w = self._own_webhook(req, wid)
        fields = self._validate_webhook(req["body"], partial=True)
        row = self.store.update_webhook(w["id"], fields)
        return 200, {"message": "Webhook updated successfully",
                     "data": self._public_webhook(row)}

    def webhooks_destroy(self, req, wid: str = "", **kw):
        w = self._own_webhook(req, wid)
        self.store.delete_webhook(w["id"])
        return 200, {"message": "Webhook deleted successfully"}

    def webhook_logs(self, req, wid: str = "", **kw):
        w = self._own_webhook(req, wid)
        return 200, {"data": self.store.webhook_logs(w["id"])}

    def webhook_regenerate_secret(self, req, wid: str = "", **kw):
        w = self._own_webhook(req, wid)
        secret = wh.generate_secret()
        self.store.update_webhook(w["id"], {"secret": secret})
        return 200, {"message": "Webhook secret regenerated successfully",
                     "data": {"secret": secret}}

    def webhook_test(self, req, wid: str = "", **kw):
        w = self._own_webhook(req, wid)
        ok = self.webhooks.send(w, "ping", {
            "message": "This is a test ping from Nu Scaler",
            "timestamp": time.time(),
        })
        return 200, {"message": "Webhook test sent successfully" if ok
                     else "Webhook test failed", "success": ok}

    def webhook_retry(self, req, lid: str = "", **kw):
        log = self.store.webhook_log_by_id(int(lid))
        if log is None:
            raise _Http(404, {"message": "Webhook log not found"})
        w = self.store.webhook_by_id(log["webhook_id"])
        if w is None or w["user_id"] != req["user"]["id"]:
            raise _Http(403, {"message": "Forbidden"})
        ok = self.webhooks.retry(log)
        return 200, {"message": "Webhook delivery retried successfully" if ok
                     else "Webhook retry failed", "success": ok}

    # -- stats / admin (AdminMetricsController.php:41-70) -------------------

    def public_stats(self, req, **kw):
        s = self.store
        n = s.count("reviews")
        return 200, {"data": {
            "reviews": n,
            "average_rating": round(s.scalar("SELECT AVG(rating) FROM reviews") or 0.0, 2),
            "downloads": s.count("download_logs"),
        }}

    def admin_dashboard(self, req, **kw):
        s = self.store
        fps = [
            r["value"] for r in s.rows("benchmark_reports", limit=1000)
            if r["unit"] == "fps"
        ]
        fps.sort()
        mid = len(fps) // 2
        return 200, {"data": {
            "users": {"total": s.count("users")},
            "reviews": {
                "total": s.count("reviews"),
                "average_rating": round(s.scalar("SELECT AVG(rating) FROM reviews") or 0.0, 2),
            },
            "bug_reports": {
                "total": s.count("bug_reports"),
                "by_severity": s.grouped("bug_reports", "severity"),
            },
            "hardware_surveys": {"total": s.count("hardware_surveys")},
            "downloads": {
                "total": s.count("download_logs"),
                "by_platform": s.grouped("download_logs", "platform"),
            },
            "benchmarks": {
                "total": s.count("benchmark_reports"),
                "median_fps": fps[mid] if fps else None,
                "best_fps": fps[-1] if fps else None,
            },
        }}

    def _admin_list(self, table: str):
        rows = self.store.rows(table)
        for r in rows:
            for k in ("system_info", "payload"):
                if isinstance(r.get(k), str):
                    r[k] = json.loads(r[k])
        return 200, {"data": rows}

    def admin_users(self, req, **kw):
        return 200, {"data": [self._public_user(u) for u in self.store.rows("users")]}

    def admin_set_role(self, req, uid: str = "", **kw):
        role = _require(req["body"], "role", str, choices=("user", "admin"))
        user = self.store.user_by_id(int(uid))
        if user is None:
            raise _Http(404, {"message": "User not found"})
        if user["id"] == req["user"]["id"]:
            # self-demotion guard (UserManagementController.php:38-40)
            raise _Http(403, {"message": "You cannot change your own admin status."})
        self.store.set_role(int(uid), role)
        return 200, {"message": "Role updated",
                     "data": self._public_user(self.store.user_by_id(int(uid)))}

    def admin_set_status(self, req, uid: str = "", **kw):
        """Activate/deactivate an account
        (UserManagementController.updateStatus, routes/api.php:131).
        Deactivation takes effect immediately: the user's tokens stop
        resolving and login is refused (store.user_for_token/verify_login)."""
        active = _require(req["body"], "is_active", (bool, int))
        user = self.store.user_by_id(int(uid))
        if user is None:
            raise _Http(404, {"message": "User not found"})
        if user["id"] == req["user"]["id"]:
            # self-deactivation guard (UserManagementController.php:52-54)
            raise _Http(403, {"message": "You cannot change your own active status."})
        self.store.set_status(int(uid), bool(active))
        return 200, {"message": "User status updated.",
                     "data": self._public_user(self.store.user_by_id(int(uid)))}

    def admin_session_check(self, req, **kw):
        """AdminSessionController.check (routes/api.php:87): body-shaped
        401/403 rather than the generic middleware rejections, so admin SPA
        shells can distinguish 'not logged in' from 'not an admin'."""
        u = req["user"]
        if u is None:
            raise _Http(401, {"authenticated": False, "is_admin": False,
                              "message": "User not authenticated"})
        if u["role"] != "admin":
            raise _Http(403, {"authenticated": True, "is_admin": False,
                              "message": "User is not an admin"})
        return 200, {
            "authenticated": True,
            "is_admin": True,
            "user": {"id": u["id"], "name": u["name"], "email": u["email"]},
            "message": "Admin session valid",
        }

    # -- admin feedback lists/exports (AdminFeedbackController.php) ---------

    @staticmethod
    def _date_filters(q: dict, where: list, params: list) -> None:
        # whereDate('created_at', >=/<=) on Y-m-d strings
        if q.get("from_date"):
            where.append("strftime('%Y-%m-%d', created_at, 'unixepoch') >= ?")
            params.append(q["from_date"])
        if q.get("to_date"):
            where.append("strftime('%Y-%m-%d', created_at, 'unixepoch') <= ?")
            params.append(q["to_date"])

    def _paginated(self, req, table: str, where: list, params: list):
        """unifiedPaginatedResponse (AdminFeedbackController.php:283-317):
        root-level pagination fields + links + the same data under meta."""
        q = req["query"]
        try:
            per_page = max(1, min(int(q.get("per_page", 15)), 100))
            page = max(1, int(q.get("page", 1)))
        except ValueError:
            per_page, page = 15, 1
        rows, total = self.store.filtered_page(table, where, params, page, per_page)
        for r in rows:
            for k in ("system_info", "payload"):
                if isinstance(r.get(k), str):
                    r[k] = json.loads(r[k])
        last_page = max(1, -(-total // per_page))
        first = (page - 1) * per_page + 1 if rows else None
        meta = {
            "current_page": page,
            "from": first,
            "last_page": last_page,
            "path": f"/api/admin/{table.replace('_', '-')}",
            "per_page": per_page,
            "to": first + len(rows) - 1 if rows else None,
            "total": total,
        }
        return 200, {
            "data": rows,
            **meta,
            "links": {
                "first": f"{meta['path']}?page=1",
                "last": f"{meta['path']}?page={last_page}",
                "prev": f"{meta['path']}?page={page - 1}" if page > 1 else None,
                "next": f"{meta['path']}?page={page + 1}" if page < last_page else None,
            },
            "meta": meta,
        }

    def admin_reviews(self, req, **kw):
        q, where, params = req["query"], [], []
        if q.get("rating"):
            where.append("rating = ?")
            params.append(q["rating"])
        if q.get("search"):
            where.append("comment LIKE ?")
            params.append(f"%{q['search']}%")
        self._date_filters(q, where, params)
        return self._paginated(req, "reviews", where, params)

    def admin_bug_reports(self, req, **kw):
        q, where, params = req["query"], [], []
        for col in ("severity", "category"):
            if q.get(col):
                where.append(f"{col} = ?")
                params.append(q[col])
        if q.get("search"):
            where.append("description LIKE ?")
            params.append(f"%{q['search']}%")
        self._date_filters(q, where, params)
        return self._paginated(req, "bug_reports", where, params)

    def admin_hardware_surveys(self, req, **kw):
        q, where, params = req["query"], [], []
        for col in ("os", "gpu_model", "cpu_model"):
            if q.get(col):
                where.append(f"{col} LIKE ?")
                params.append(f"%{q[col]}%")
        if q.get("min_ram"):
            where.append("ram_size >= ?")
            params.append(q["min_ram"])
        self._date_filters(q, where, params)
        return self._paginated(req, "hardware_surveys", where, params)

    def _admin_show(self, table: str, rid: str):
        """show/showBugReport/showHardwareSurvey — {data: row}, 404 on miss
        (Laravel implicit model binding)."""
        try:
            row = self.store.row(table, int(rid))
        except Exception:  # noqa: BLE001 — no such id
            raise _Http(404, {"message": "Not Found"})
        for k in ("system_info", "payload"):
            if isinstance(row.get(k), str):
                row[k] = json.loads(row[k])
        return 200, {"data": row}

    def _admin_export(self, req, table: str):
        """CSV export (AdminFeedbackController.exportReviews/-BugReports/
        -HardwareSurveys, routes/api.php:99-106): text/csv attachment with
        header row = column names; format=xlsx is rejected with the
        reference's exact message."""
        if req["query"].get("format", "csv") == "xlsx":
            raise _Http(400, {"message": "Excel export is currently unavailable. "
                                         "Please use CSV format instead."})
        rows = self.store.rows(table, limit=100000)
        buf = io.StringIO()
        w = csv.writer(buf)
        if rows:
            cols = list(rows[0].keys())
            w.writerow(cols)
            for r in rows:
                w.writerow([r[c] for c in cols])
        stamp = time.strftime("%Y%m%d_%H%M%S")
        return 200, _Raw(
            buf.getvalue().encode(), "text/csv",
            {"Content-Disposition": f"attachment; filename={table}_{stamp}.csv"},
        )

    # -- admin metrics (AdminMetricsController.php + AnalyticsService.php) --

    def _review_metrics(self) -> dict:
        s = self.store
        return {
            "average_rating": round(s.scalar("SELECT AVG(rating) FROM reviews") or 0.0, 2),
            "total_reviews": s.count("reviews"),
            "ratings_distribution": s.grouped("reviews", "rating"),
            # the reference reads never-written cache counters (defaults 0,
            # AnalyticsService.php:253-256); computing real sentiment from
            # the ratings keeps the keys and makes them true
            "sentiment": {
                "positive": s.scalar("SELECT COUNT(*) FROM reviews WHERE rating >= 4") or 0,
                "negative": s.scalar("SELECT COUNT(*) FROM reviews WHERE rating <= 2") or 0,
            },
        }

    def _bug_metrics(self) -> dict:
        s = self.store
        return {
            "total_bugs": s.count("bug_reports"),
            "categories_distribution": s.grouped("bug_reports", "category"),
            "severity_distribution": s.grouped("bug_reports", "severity"),
        }

    def _hardware_metrics(self) -> dict:
        s = self.store
        return {
            "total_surveys": s.count("hardware_surveys"),
            "gpu_distribution": s.grouped("hardware_surveys", "gpu_model",
                                          limit=10, by_count=True),
            "cpu_distribution": s.grouped("hardware_surveys", "cpu_model",
                                          limit=10, by_count=True),
            "os_distribution": s.grouped("hardware_surveys", "os", by_count=True),
            "average_memory": s.scalar("SELECT AVG(ram_size) FROM hardware_surveys"),
        }

    def admin_review_metrics(self, req, **kw):
        return 200, {"data": self._review_metrics()}

    def admin_bug_metrics(self, req, **kw):
        return 200, {"data": self._bug_metrics()}

    def admin_hardware_metrics(self, req, **kw):
        return 200, {"data": self._hardware_metrics()}

    def admin_reviews_distribution(self, req, **kw):
        """reviewsDistribution (AdminMetricsController.php:219-227) — note
        the reference returns the bare list, NOT wrapped in {data}."""
        dist = self.store.grouped("reviews", "rating")
        return 200, [{"rating": k, "count": v} for k, v in sorted(dist.items())]

    def admin_user_growth(self, req, **kw):
        period = req["query"].get("period", "monthly")
        return 200, {"data": self.store.period_counts("users", period)}

    def admin_feedback_trends(self, req, **kw):
        period = req["query"].get("period", "monthly")
        ftype = req["query"].get("type", "all")
        data = {}
        if ftype in ("all", "reviews"):
            data["reviews"] = self.store.period_counts("reviews", period)
        if ftype in ("all", "bug_reports"):
            data["bug_reports"] = self.store.period_counts("bug_reports", period)
        if ftype in ("all", "hardware_surveys"):
            data["hardware_surveys"] = self.store.period_counts("hardware_surveys", period)
        return 200, {"data": data}

    def admin_metrics_export(self, req, **kw):
        """exportAllMetrics (AdminMetricsController.php:203-212)."""
        return 200, {
            "data": {
                "reviews": self._review_metrics(),
                "bug_reports": self._bug_metrics(),
                "hardware_surveys": self._hardware_metrics(),
            },
            "generated_at": time.strftime("%Y-%m-%dT%H:%M:%S%z") or time.strftime("%Y-%m-%dT%H:%M:%S"),
            "version": "1.0",
        }

    # -- admin log dashboard (LogDashboardController.php; files from the
    #    real nu_scaler/logger.py data dir) ---------------------------------

    LOG_TYPES = {
        # LogDashboardController.php:18-26 — 'laravel' (System Logs) becomes
        # 'nu_scaler', the prefix nu_scaler/logger.py actually writes
        "api": "API Logs",
        "feedback": "Feedback Logs",
        "webhooks": "Webhook Logs",
        "auth": "Authentication Logs",
        "admin": "Admin Action Logs",
        "performance": "Performance Logs",
        "nu_scaler": "System Logs",
    }

    def log_dir(self) -> str:
        if self._log_dir is None:
            from nu_scaler.logger import data_dir

            self._log_dir = data_dir()
        return self._log_dir

    def _log_files(self):
        d = self.log_dir()
        out = []
        if os.path.isdir(d):
            for name in sorted(os.listdir(d)):
                p = os.path.join(d, name)
                if os.path.isfile(p) and name.endswith(".log"):
                    st = os.stat(p)
                    out.append((name, p, st.st_size, st.st_mtime))
        return out

    @classmethod
    def _log_type_of(cls, filename: str) -> str:
        for t in cls.LOG_TYPES:
            marker = "nu_scaler" if t == "nu_scaler" else f"{t}-"
            if marker in filename:
                return t
        return "other"

    def _safe_log_path(self, filename: str) -> str:
        # route regex already excludes '/'; belt-and-braces against traversal
        if "/" in filename or "\\" in filename or ".." in filename:
            raise _Http(404, {"message": "Log file not found"})
        path = os.path.join(self.log_dir(), filename)
        if not os.path.isfile(path):
            raise _Http(404, {"message": "Log file not found"})
        return path

    def admin_logs_index(self, req, **kw):
        return 200, {"data": self.LOG_TYPES}

    def admin_logs_list(self, req, ltype: str = "", **kw):
        if ltype not in self.LOG_TYPES:
            raise _Http(400, {"message": "Invalid log type"})
        files = [
            {"name": n, "size": sz,
             "modified": time.strftime("%Y-%m-%d %H:%M:%S", time.localtime(mt))}
            for (n, _p, sz, mt) in self._log_files()
            if self._log_type_of(n) == ltype
        ]
        files.sort(key=lambda f: f["modified"], reverse=True)
        return 200, {"data": files}

    def admin_logs_show(self, req, filename: str = "", **kw):
        path = self._safe_log_path(filename)
        filesize = os.path.getsize(path)
        max_size = 1024 * 1024
        start = max(filesize - max_size, 0)
        q = req["query"]
        try:
            if "start" in q:
                start = int(q["start"])
            length = min(max_size, filesize - start)
            if "length" in q:
                length = min(int(q["length"]), max_size)
        except ValueError:
            raise _Http(400, {"message": "start/length must be integers"})
        with open(path, "rb") as f:
            f.seek(max(start, 0))
            contents = f.read(max(length, 0))
        return 200, {"data": {
            "filename": filename,
            "filesize": filesize,
            "start": start,
            "length": len(contents),
            "hasMore": (start + len(contents)) < filesize,
            "contents": base64.b64encode(contents).decode(),
        }}

    def admin_logs_delete(self, req, filename: str = "", **kw):
        os.remove(self._safe_log_path(filename))
        return 200, {"message": "Log file deleted successfully"}

    def admin_logs_stats(self, req, **kw):
        files = self._log_files()
        by_type: dict = {}
        oldest = newest = None
        for (n, _p, sz, mt) in files:
            t = self._log_type_of(n)
            b = by_type.setdefault(t, {"count": 0, "size": 0})
            b["count"] += 1
            b["size"] += sz
            entry = {"name": n, "time": mt,
                     "date": time.strftime("%Y-%m-%d %H:%M:%S", time.localtime(mt))}
            if oldest is None or mt < oldest["time"]:
                oldest = entry
            if newest is None or mt > newest["time"]:
                newest = entry
        return 200, {"data": {
            "totalFiles": len(files),
            "totalSize": sum(sz for (_n, _p, sz, _m) in files),
            "oldestFile": oldest,
            "newestFile": newest,
            "logsByType": by_type,
        }}

    def admin_logs_search(self, req, **kw):
        q = req["query"]
        term = q.get("term", "")
        if len(term) < 3:
            raise _Http(422, {"message": "Validation failed",
                              "errors": {"term": ["The term must be at least 3 characters."]}})
        ltype = q.get("type")
        if ltype and ltype not in self.LOG_TYPES:
            raise _Http(422, {"message": "Validation failed",
                              "errors": {"type": ["The selected type is invalid."]}})
        files = self._log_files()
        if ltype:
            files = [f for f in files if self._log_type_of(f[0]) == ltype]
        date_from, date_to = q.get("date_from"), q.get("date_to")
        if date_from or date_to:
            def _in_range(mt):
                d = time.strftime("%Y-%m-%d", time.localtime(mt))
                return not (date_from and d < date_from) and not (date_to and d > date_to)

            files = [f for f in files if _in_range(f[3])]
        max_files = 20
        results = []
        for (n, p, sz, mt) in files[:max_files]:
            # line scan in-process (the reference shells out to grep —
            # LogDashboardController.php:299; no subprocess needed here)
            matches = []
            count = 0
            with open(p, "r", errors="replace") as f:
                for i, line in enumerate(f, 1):
                    if term in line:
                        count += 1
                        if len(matches) < 50:
                            matches.append(f"{i}:{line.rstrip()}")
            if count:
                results.append({
                    "filename": n,
                    "matches": matches,
                    "match_count": count,
                    "size": sz,
                    "modified": time.strftime("%Y-%m-%d %H:%M:%S", time.localtime(mt)),
                })
        return 200, {
            "data": results,
            "meta": {
                "total_files_searched": len(files),
                "max_files_searched": max_files,
                "total_results": len(results),
            },
        }

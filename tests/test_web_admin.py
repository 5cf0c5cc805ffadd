"""Admin-tail feature tests — route-for-route parity with the reference's
`@web/server/laravel_app/routes/api.php:54,87,98-133`: CSV exports, granular
metric endpoints, the log dashboard (over the real nu_scaler/logger.py file
layout), user status PATCH, admin session check, and /download/direct.
"""

from __future__ import annotations

import base64
import io
import json
import os
import time

import pytest

from nu_scaler_web.app import WebApp
from nu_scaler_web.store import Store


class Client:
    """WSGI test client with query-string + raw-body support."""

    def __init__(self, app):
        self.app = app

    def request(self, method, path, body=None, token=None, raw=False):
        q = ""
        if "?" in path:
            path, q = path.split("?", 1)
        data = json.dumps(body).encode() if body is not None else b""
        environ = {
            "REQUEST_METHOD": method,
            "PATH_INFO": path,
            "QUERY_STRING": q,
            "CONTENT_LENGTH": str(len(data)),
            "wsgi.input": io.BytesIO(data),
        }
        if token:
            environ["HTTP_AUTHORIZATION"] = f"Bearer {token}"
        captured = {}

        def start_response(status, headers):
            captured["status"] = int(status.split()[0])
            captured["headers"] = dict(headers)

        out = b"".join(self.app(environ, start_response))
        if raw:
            return captured["status"], captured["headers"], out
        return captured["status"], (json.loads(out) if out else {})

    def get(self, path, **kw):
        return self.request("GET", path, **kw)

    def post(self, path, body=None, **kw):
        return self.request("POST", path, body, **kw)

    def patch(self, path, body=None, **kw):
        return self.request("PATCH", path, body, **kw)

    def delete(self, path, **kw):
        return self.request("DELETE", path, **kw)


@pytest.fixture()
def logdir(tmp_path):
    d = tmp_path / "logs"
    d.mkdir()
    return str(d)


@pytest.fixture()
def app(tmp_path, logdir):
    wheel_dir = tmp_path / "dist"
    wheel_dir.mkdir()
    return WebApp(Store(":memory:"), wheel_dir=str(wheel_dir), log_dir=logdir)


@pytest.fixture()
def client(app):
    return Client(app)


@pytest.fixture()
def admin(client):
    st, d = client.post("/api/v1/auth/register", {
        "name": "Admin", "email": "admin@example.com", "password": "secret123"})
    assert st == 201
    return d["token"]


@pytest.fixture()
def user(client):
    st, d = client.post("/api/v1/auth/register", {
        "name": "User", "email": "user@example.com", "password": "secret123"})
    assert st == 201
    return d


def _seed_feedback(client, n=3):
    for i in range(n):
        st, _ = client.post("/api/v1/feedback/reviews",
                            {"rating": (i % 5) + 1, "comment": f"review number {i}"})
        assert st == 201
    st, _ = client.post("/api/v1/feedback/bug-reports", {
        "description": "crash on start", "category": "crash", "severity": "high",
        "system_info": {"os": "linux", "app_version": "1.0"}})
    assert st == 201
    st, _ = client.post("/api/v1/feedback/hardware-surveys", {
        "cpu_model": "Ryzen 9", "gpu_model": "RTX 4090", "ram_size": 64,
        "os": "linux", "resolution": "3840x2160"})
    assert st == 201


# -- session check (api.php:87) ---------------------------------------------

def test_session_check_three_states(client, admin, user):
    st, d = client.get("/api/admin/session/check")
    assert st == 401 and d == {"authenticated": False, "is_admin": False,
                               "message": "User not authenticated"}
    st, d = client.get("/api/admin/session/check", token=user["token"])
    assert st == 403 and d["authenticated"] is True and d["is_admin"] is False
    st, d = client.get("/api/admin/session/check", token=admin)
    assert st == 200 and d["is_admin"] is True
    assert d["user"]["email"] == "admin@example.com"
    assert d["message"] == "Admin session valid"


# -- user status PATCH (api.php:131) -----------------------------------------

def test_user_status_deactivate_and_reactivate(client, admin, user):
    uid = user["user"]["id"]
    st, d = client.patch(f"/api/admin/users/{uid}/status",
                         {"is_active": False}, token=admin)
    assert st == 200 and d["data"]["is_active"] is False
    # deactivated: existing token dead, login refused
    st, _ = client.get("/api/v1/user", token=user["token"])
    assert st == 401
    st, _ = client.post("/api/v1/login", {"email": "user@example.com",
                                          "password": "secret123"})
    assert st == 401
    st, d = client.patch(f"/api/admin/users/{uid}/status",
                         {"is_active": True}, token=admin)
    assert st == 200 and d["data"]["is_active"] is True
    st, _ = client.post("/api/v1/login", {"email": "user@example.com",
                                          "password": "secret123"})
    assert st == 200


def test_self_guards(client, admin):
    st, d = client.get("/api/admin/users", token=admin)
    me = next(u for u in d["data"] if u["email"] == "admin@example.com")
    st, d = client.patch(f"/api/admin/users/{me['id']}/status",
                         {"is_active": False}, token=admin)
    assert st == 403 and "own active status" in d["message"]
    st, d = client.patch(f"/api/admin/users/{me['id']}/role",
                         {"role": "user"}, token=admin)
    assert st == 403 and "own admin status" in d["message"]


# -- feedback lists: filters + unified pagination + show ---------------------

def test_paginated_reviews_with_filters(client, admin):
    _seed_feedback(client, n=7)
    st, d = client.get("/api/admin/reviews?per_page=3&page=2", token=admin)
    assert st == 200
    assert len(d["data"]) == 3 and d["total"] == 7 and d["last_page"] == 3
    assert d["meta"]["total"] == 7 and d["links"]["next"].endswith("page=3")
    st, d = client.get("/api/admin/reviews?rating=1", token=admin)
    assert all(r["rating"] == 1 for r in d["data"]) and d["total"] >= 1
    st, d = client.get("/api/admin/reviews?search=number+2", token=admin)
    assert d["total"] == 1 and "number 2" in d["data"][0]["comment"]


def test_bug_and_hardware_filters_and_show(client, admin):
    _seed_feedback(client)
    st, d = client.get("/api/admin/bug-reports?severity=high", token=admin)
    assert st == 200 and d["total"] == 1
    rid = d["data"][0]["id"]
    assert d["data"][0]["system_info"]["os"] == "linux"  # JSON decoded
    st, d = client.get(f"/api/admin/bug-reports/{rid}", token=admin)
    assert st == 200 and d["data"]["id"] == rid
    st, _ = client.get("/api/admin/bug-reports/9999", token=admin)
    assert st == 404
    st, d = client.get("/api/admin/hardware-surveys?gpu_model=4090", token=admin)
    assert d["total"] == 1
    st, d = client.get("/api/admin/hardware-surveys?min_ram=128", token=admin)
    assert d["total"] == 0
    st, d = client.get("/api/admin/reviews/1", token=admin)
    assert st == 200 and "comment" in d["data"]


# -- CSV exports (api.php:99-106) --------------------------------------------

def test_csv_exports(client, admin):
    _seed_feedback(client)
    for path, col in (("/api/admin/reviews/export", "rating"),
                      ("/api/admin/bug-reports/export", "severity"),
                      ("/api/admin/hardware-surveys/export", "gpu_model")):
        st, headers, body = client.get(path, token=admin, raw=True)
        assert st == 200
        assert headers["Content-Type"] == "text/csv"
        assert "attachment; filename=" in headers["Content-Disposition"]
        lines = body.decode().strip().splitlines()
        assert col in lines[0].split(",")  # header row
        assert len(lines) >= 2  # at least one data row
    st, d = client.get("/api/admin/reviews/export?format=xlsx", token=admin)
    assert st == 400 and "Excel export is currently unavailable" in d["message"]


# -- granular metrics (api.php:107-116) ---------------------------------------

def test_metric_endpoints(client, admin):
    _seed_feedback(client, n=5)
    st, d = client.get("/api/admin/metrics/reviews", token=admin)
    assert st == 200
    m = d["data"]
    assert m["total_reviews"] == 5 and set(m["sentiment"]) == {"positive", "negative"}
    assert sum(m["ratings_distribution"].values()) == 5

    st, d = client.get("/api/admin/metrics/bug-reports", token=admin)
    assert d["data"]["total_bugs"] == 1
    assert d["data"]["severity_distribution"] == {"high": 1}

    st, d = client.get("/api/admin/metrics/hardware-surveys", token=admin)
    assert d["data"]["total_surveys"] == 1
    assert d["data"]["average_memory"] == 64
    assert d["data"]["gpu_distribution"] == {"RTX 4090": 1}

    # bare-list response (AdminMetricsController.php:219-227)
    st, d = client.get("/api/admin/metrics/reviews-distribution", token=admin)
    assert st == 200 and isinstance(d, list)
    assert sum(e["count"] for e in d) == 5

    st, d = client.get("/api/admin/metrics/user-growth?period=daily", token=admin)
    assert st == 200 and sum(e["count"] for e in d["data"]) == 1  # the admin

    st, d = client.get("/api/admin/metrics/feedback-trends?type=reviews", token=admin)
    assert list(d["data"].keys()) == ["reviews"]
    st, d = client.get("/api/admin/metrics/feedback-trends", token=admin)
    assert set(d["data"]) == {"reviews", "bug_reports", "hardware_surveys"}

    st, d = client.get("/api/admin/metrics/export", token=admin)
    assert st == 200 and d["version"] == "1.0" and "generated_at" in d
    assert set(d["data"]) == {"reviews", "bug_reports", "hardware_surveys"}


# -- log dashboard (api.php:119-126) ------------------------------------------

def _write_log(logdir, name, text):
    with open(os.path.join(logdir, name), "w") as f:
        f.write(text)


def test_log_dashboard_crud(client, admin, logdir):
    _write_log(logdir, "api-2026-08-19.log", "GET /x ok\nerror: boom\n")
    _write_log(logdir, "nu_scaler_20260819.log", "engine started\n")

    st, d = client.get("/api/admin/logs", token=admin)
    assert st == 200 and d["data"]["nu_scaler"] == "System Logs"

    st, d = client.get("/api/admin/logs/type/api", token=admin)
    assert st == 200 and [f["name"] for f in d["data"]] == ["api-2026-08-19.log"]
    st, d = client.get("/api/admin/logs/type/nope", token=admin)
    assert st == 400 and d["message"] == "Invalid log type"

    st, d = client.get("/api/admin/logs/file/api-2026-08-19.log", token=admin)
    assert st == 200
    body = d["data"]
    assert base64.b64decode(body["contents"]).decode() == "GET /x ok\nerror: boom\n"
    assert body["hasMore"] is False and body["filesize"] == body["length"]

    # windowed read
    st, d = client.get("/api/admin/logs/file/api-2026-08-19.log?start=0&length=3",
                       token=admin)
    assert base64.b64decode(d["data"]["contents"]) == b"GET"
    assert d["data"]["hasMore"] is True

    st, d = client.get("/api/admin/logs/stats", token=admin)
    s = d["data"]
    assert s["totalFiles"] == 2 and s["logsByType"]["api"]["count"] == 1
    assert s["oldestFile"] is not None and s["newestFile"] is not None

    st, d = client.delete("/api/admin/logs/file/api-2026-08-19.log", token=admin)
    assert st == 200 and "deleted" in d["message"]
    st, _ = client.get("/api/admin/logs/file/api-2026-08-19.log", token=admin)
    assert st == 404


def test_log_search(client, admin, logdir):
    _write_log(logdir, "api-2026-08-19.log", "ok line\nerror: kaboom\nerror: again\n")
    _write_log(logdir, "webhooks-2026-08-19.log", "delivered\n")
    st, d = client.get("/api/admin/logs/search?term=error", token=admin)
    assert st == 200 and d["meta"]["total_results"] == 1
    r = d["data"][0]
    assert r["filename"] == "api-2026-08-19.log" and r["match_count"] == 2
    assert r["matches"][0].startswith("2:")
    st, d = client.get("/api/admin/logs/search?term=er", token=admin)
    assert st == 422  # min 3 chars
    st, d = client.get("/api/admin/logs/search?term=error&type=bogus", token=admin)
    assert st == 422
    st, d = client.get("/api/admin/logs/search?term=error&type=webhooks", token=admin)
    assert d["meta"]["total_results"] == 0


def test_log_path_traversal_rejected(client, admin, logdir, tmp_path):
    secret = tmp_path / "secret.log"
    secret.write_text("do not read")
    st, _ = client.get("/api/admin/logs/file/..%2Fsecret.log", token=admin)
    assert st in (404, 422)
    st, _ = client.delete("/api/admin/logs/file/..", token=admin)
    assert st == 404
    assert secret.exists()


# -- direct download (api.php:54) ---------------------------------------------

def test_download_direct(client, app):
    st, d = client.get("/api/v1/download/direct")
    assert st == 404 and d["message"] == "File not found"
    wheel = os.path.join(app.wheel_dir, "nu_scaler_tpu-0.3.0-py3-none-any.whl")
    with open(wheel, "wb") as f:
        f.write(b"PK\x03\x04fakewheel")
    st, headers, body = client.get("/api/v1/download/direct", raw=True)
    assert st == 200 and body.startswith(b"PK")
    assert headers["Content-Type"] == "application/octet-stream"
    assert "nu_scaler_tpu-0.3.0" in headers["Content-Disposition"]
    # anonymous download logged
    st, d = client.get("/api/v1/feedback/stats")
    assert d["data"]["downloads"] == 1


# -- admin routes stay admin-protected ----------------------------------------

def test_new_admin_routes_are_protected(client, admin, user):
    paths = [
        "/api/admin/metrics/reviews", "/api/admin/metrics/export",
        "/api/admin/reviews/export", "/api/admin/logs",
        "/api/admin/logs/stats",
    ]
    for p in paths:
        st, _ = client.get(p)
        assert st == 401, p
        st, _ = client.get(p, token=user["token"])
        assert st == 403, p

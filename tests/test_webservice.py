"""nu_scaler_web feature tests — the PHPUnit-feature-suite role of the
reference's `@web/server/laravel_app/tests/Feature/` (14 files, SQLite
in-memory). Each test drives the WSGI app directly, like Laravel's
`$this->postJson(...)` test client.
"""

from __future__ import annotations

import io
import json

import pytest

from nu_scaler_web.app import WebApp
from nu_scaler_web.store import Store


class Client:
    """Minimal WSGI test client (the TestCase::postJson role)."""

    def __init__(self, app):
        self.app = app
        self.token = None

    def request(self, method, path, body=None, token=None):
        raw = json.dumps(body).encode() if body is not None else b""
        environ = {
            "REQUEST_METHOD": method,
            "PATH_INFO": path,
            "CONTENT_LENGTH": str(len(raw)),
            "wsgi.input": io.BytesIO(raw),
        }
        tok = token if token is not None else self.token
        if tok:
            environ["HTTP_AUTHORIZATION"] = f"Bearer {tok}"
        captured = {}

        def start_response(status, headers):
            captured["status"] = int(status.split()[0])
            captured["headers"] = dict(headers)

        chunks = self.app(environ, start_response)
        data = b"".join(chunks)
        return captured["status"], (json.loads(data) if data else {})

    def get(self, path, **kw):
        return self.request("GET", path, **kw)

    def post(self, path, body=None, **kw):
        return self.request("POST", path, body, **kw)

    def patch(self, path, body=None, **kw):
        return self.request("PATCH", path, body, **kw)


@pytest.fixture()
def client():
    return Client(WebApp(Store(":memory:")))


@pytest.fixture()
def admin(client):
    """First registration is the admin (seeded-admin role)."""
    st, d = client.post("/api/v1/auth/register", {
        "name": "Admin", "email": "admin@example.com", "password": "secret123",
    })
    assert st == 201
    return d["token"]


# -- auth (AuthTest.php role) ----------------------------------------------


def test_register_login_logout_flow(client):
    st, d = client.post("/api/v1/auth/register", {
        "name": "A", "email": "a@example.com", "password": "password1",
    })
    assert st == 201 and d["token"]
    assert d["user"]["role"] == "admin"  # first account

    st, d2 = client.post("/api/v1/auth/register", {
        "name": "B", "email": "b@example.com", "password": "password2",
    })
    assert d2["user"]["role"] == "user"

    st, d3 = client.post("/api/v1/login", {"email": "b@example.com", "password": "password2"})
    assert st == 200
    client.token = d3["token"]
    st, me = client.get("/api/v1/user")
    assert st == 200 and me["data"]["email"] == "b@example.com"

    st, _ = client.post("/api/v1/logout")
    assert st == 200
    st, _ = client.get("/api/v1/user")
    assert st == 401  # token revoked


def test_register_validation(client):
    st, d = client.post("/api/v1/auth/register", {"name": "X", "email": "not-an-email", "password": "longenough"})
    assert st == 422 and "email" in d["errors"]
    st, d = client.post("/api/v1/auth/register", {"name": "X", "email": "x@example.com", "password": "short"})
    assert st == 422 and "password" in d["errors"]
    client.post("/api/v1/auth/register", {"name": "X", "email": "x@example.com", "password": "longenough"})
    st, d = client.post("/api/v1/auth/register", {"name": "X2", "email": "x@example.com", "password": "longenough"})
    assert st == 422 and "taken" in d["errors"]["email"][0]


def test_bad_login(client):
    st, _ = client.post("/api/v1/login", {"email": "no@example.com", "password": "whatever1"})
    assert st == 401


# -- download (DownloadTest.php role) --------------------------------------


def test_download_requires_auth_and_logs(client, admin):
    st, _ = client.get("/api/v1/download")
    assert st == 401
    st, d = client.get("/api/v1/download", token=admin)
    assert st == 200 and d["data"]["url"].startswith("/api/v1/download/file/")

    st, d = client.get("/api/v1/download/public")
    assert st == 200 and len(d["data"]) == 3

    st, d = client.get("/api/v1/download/file/linux")
    assert st == 200
    st, _ = client.get("/api/v1/download/file/beos")
    assert st == 404

    st, d = client.get("/api/admin/metrics/dashboard", token=admin)
    assert d["data"]["downloads"]["total"] == 1
    assert d["data"]["downloads"]["by_platform"] == {"linux": 1}


# -- feedback (FeedbackTest.php role) --------------------------------------


def test_review_validation_and_store(client):
    st, d = client.post("/api/v1/feedback/reviews", {"rating": 6, "comment": "x"})
    assert st == 422 and "rating" in d["errors"]
    st, d = client.post("/api/v1/feedback/reviews", {"rating": 5})
    assert st == 422 and "comment" in d["errors"]
    st, d = client.post("/api/v1/feedback/reviews", {"rating": 5, "comment": "great upscaler"})
    assert st == 201 and d["data"]["rating"] == 5
    st, d = client.get("/api/v1/feedback/stats")
    assert d["data"]["reviews"] == 1 and d["data"]["average_rating"] == 5.0


def test_bug_report_rules(client):
    base = {
        "description": "crash on start", "category": "crash", "severity": "high",
        "system_info": {"os": "linux", "app_version": "0.3.0"},
    }
    st, d = client.post("/api/v1/feedback/bug-reports", base)
    assert st == 201 and d["data"]["system_info"]["os"] == "linux"

    bad = dict(base, category="nonsense")
    st, d = client.post("/api/v1/feedback/bug-reports", bad)
    assert st == 422 and "category" in d["errors"]

    bad = dict(base, system_info={"os": "linux"})  # missing app_version
    st, d = client.post("/api/v1/feedback/bug-reports", bad)
    assert st == 422 and "app_version" in d["errors"]


def test_hardware_survey_rules(client):
    base = {
        "cpu_model": "EPYC", "gpu_model": "TPU v5e", "ram_size": 64,
        "os": "linux", "resolution": "3840x2160", "monitor_refresh_rate": 144,
    }
    st, d = client.post("/api/v1/feedback/hardware-surveys", base)
    assert st == 201 and d["data"]["ram_size"] == 64
    st, d = client.post("/api/v1/feedback/hardware-surveys", dict(base, monitor_refresh_rate=999))
    assert st == 422 and "monitor_refresh_rate" in d["errors"]


# -- benchmarks (engine tie-in) --------------------------------------------


def test_benchmark_ingestion_accepts_bench_py_line(client, admin):
    # the exact shape bench.py prints on stdout
    line = {
        "metric": "1080p→4K lanczos3 + 2x interp, output frames/sec/chip",
        "value": 1323.4, "unit": "fps", "vs_baseline": 5.514,
        "step_ms": 1.511, "platform": "tpu",
    }
    st, d = client.post("/api/v1/benchmarks", line)
    assert st == 201 and d["data"]["payload"]["vs_baseline"] == 5.514
    client.post("/api/v1/benchmarks", dict(line, value=900.0))

    st, d = client.get("/api/admin/metrics/dashboard", token=admin)
    b = d["data"]["benchmarks"]
    assert b["total"] == 2 and b["best_fps"] == 1323.4 and b["median_fps"] == 1323.4

    st, d = client.get("/api/admin/benchmarks", token=admin)
    assert len(d["data"]) == 2

    st, d = client.post("/api/v1/benchmarks", {"metric": "x", "unit": "fps"})
    assert st == 422 and "value" in d["errors"]


# -- admin (AdminMetricsTest / UserManagementTest roles) -------------------


def test_admin_routes_are_protected(client, admin):
    for path in ("/api/admin/metrics/dashboard", "/api/admin/reviews", "/api/admin/users"):
        st, _ = client.get(path)
        assert st == 401
    # a plain user is forbidden
    st, d = client.post("/api/v1/auth/register", {
        "name": "U", "email": "u@example.com", "password": "password9",
    })
    st, _ = client.get("/api/admin/reviews", token=d["token"])
    assert st == 403
    st, _ = client.get("/api/admin/reviews", token=admin)
    assert st == 200


def test_admin_dashboard_counts(client, admin):
    client.post("/api/v1/feedback/reviews", {"rating": 4, "comment": "nice"})
    client.post("/api/v1/feedback/reviews", {"rating": 2, "comment": "meh"})
    client.post("/api/v1/feedback/bug-reports", {
        "description": "slow", "category": "performance", "severity": "low",
        "system_info": {"os": "linux", "app_version": "0.3.0"},
    })
    st, d = client.get("/api/admin/metrics/dashboard", token=admin)
    m = d["data"]
    assert m["reviews"]["total"] == 2 and m["reviews"]["average_rating"] == 3.0
    assert m["bug_reports"]["by_severity"] == {"low": 1}
    assert m["users"]["total"] == 1


def test_role_management(client, admin):
    st, d = client.post("/api/v1/auth/register", {
        "name": "U", "email": "u2@example.com", "password": "password9",
    })
    uid = d["user"]["id"]
    st, d = client.patch(f"/api/admin/users/{uid}/role", {"role": "admin"}, token=admin)
    assert st == 200 and d["data"]["role"] == "admin"
    st, d = client.patch(f"/api/admin/users/{uid}/role", {"role": "emperor"}, token=admin)
    assert st == 422
    st, _ = client.patch("/api/admin/users/9999/role", {"role": "user"}, token=admin)
    assert st == 404


# -- protocol edges --------------------------------------------------------


def test_malformed_json_and_unknown_route(client):
    environ = {
        "REQUEST_METHOD": "POST", "PATH_INFO": "/api/v1/feedback/reviews",
        "CONTENT_LENGTH": "7", "wsgi.input": io.BytesIO(b"not json"),
    }
    captured = {}
    client.app(environ, lambda s, h: captured.update(status=s))
    assert captured["status"].startswith("400")

    st, _ = client.get("/api/v1/nope")
    assert st == 404
    st, _ = client.get("/api/v1/login")  # wrong method
    assert st == 405


def test_live_server_round_trip():
    """End-to-end over a real socket (wsgiref), like a deployed instance."""
    import threading
    import urllib.request
    from wsgiref.simple_server import WSGIRequestHandler, make_server

    class Quiet(WSGIRequestHandler):
        def log_message(self, *a):
            pass

    app = WebApp(Store(":memory:"))
    srv = make_server("127.0.0.1", 0, app, handler_class=Quiet)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/feedback/reviews",
            data=json.dumps({"rating": 5, "comment": "ship it"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 201
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/api/v1/feedback/stats") as resp:
            stats = json.loads(resp.read())
            assert stats["data"]["reviews"] == 1
    finally:
        srv.shutdown()
        t.join(timeout=5)


# -- HTML frontend (the React SPA role — frontend.py) ----------------------


def _get_html(client, path):
    environ = {
        "REQUEST_METHOD": "GET", "PATH_INFO": path,
        "CONTENT_LENGTH": "0", "wsgi.input": io.BytesIO(b""),
    }
    captured = {}

    def start_response(status, headers):
        captured["status"] = int(status.split()[0])
        captured["headers"] = dict(headers)

    data = b"".join(client.app(environ, start_response))
    return captured["status"], captured["headers"], data.decode()


def test_frontend_pages_render(client):
    """Every SPA route (`router/routes.jsx`) has a server-rendered shell."""
    for path, marker in [
        ("/", "NU Scaler: real-time AI upscaling"),
        ("/login", "Welcome back"),
        ("/register", "Create an account"),
        ("/download", "Download NU Scaler"),
        ("/admin", "Admin dashboard"),
        ("/admin/users", "Users"),
    ]:
        st, headers, html = _get_html(client, path)
        assert st == 200, path
        assert headers["Content-Type"].startswith("text/html"), path
        assert marker in html, path
        assert "<nav>" in html  # Navbar.jsx role on every page


def test_landing_inlines_live_public_stats(client):
    client.post("/api/v1/feedback/reviews", {"rating": 4, "comment": "nice"})
    client.get("/api/v1/download/file/linux")
    st, _, html = _get_html(client, "/")
    assert st == 200
    # server-side render of /api/v1/feedback/stats (LandingPage stat cards)
    assert ">4.0</div>" in html or ">4</div>" in html  # average rating
    assert ">1</div>" in html  # downloads / reviews count


def test_frontend_unknown_page_is_404_and_api_untouched(client):
    st, _ = client.get("/nope")
    assert st == 404
    st, d = client.get("/api/v1/feedback/stats")
    assert st == 200 and "data" in d


def test_frontend_admin_pages_reference_admin_api(client):
    """The dashboard shell drives the same admin endpoints the Redux slices
    used (`features/admin/*Slice.js`)."""
    _, _, html = _get_html(client, "/admin")
    assert "/api/admin/metrics/dashboard" in html
    assert "/api/admin/benchmarks" in html
    _, _, html = _get_html(client, "/admin/users")
    assert "/api/admin/users" in html

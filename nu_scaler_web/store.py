"""sqlite3 storage for nu_scaler_web — the Eloquent-model role of the
reference's Laravel app (User/Review/BugReport/HardwareSurvey models +
download logs; `@web/server/laravel_app/app/Models/`). Their test suite runs
on in-memory SQLite (SURVEY §2.5) — same engine here, same default.
"""

from __future__ import annotations

import hashlib
import json
import secrets
import sqlite3
import threading
import time
from typing import Any, Optional

_SCHEMA = """
CREATE TABLE IF NOT EXISTS users (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    name TEXT NOT NULL,
    email TEXT NOT NULL UNIQUE,
    password_hash TEXT NOT NULL,
    salt TEXT NOT NULL,
    role TEXT NOT NULL DEFAULT 'user',
    is_active INTEGER NOT NULL DEFAULT 1,
    created_at REAL NOT NULL
);
CREATE TABLE IF NOT EXISTS tokens (
    token TEXT PRIMARY KEY,
    user_id INTEGER NOT NULL REFERENCES users(id),
    created_at REAL NOT NULL,
    revoked INTEGER NOT NULL DEFAULT 0
);
CREATE TABLE IF NOT EXISTS reviews (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    rating INTEGER NOT NULL,
    comment TEXT NOT NULL,
    name TEXT,
    email TEXT,
    user_id INTEGER,
    created_at REAL NOT NULL
);
CREATE TABLE IF NOT EXISTS bug_reports (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    description TEXT NOT NULL,
    category TEXT NOT NULL,
    severity TEXT NOT NULL,
    steps_to_reproduce TEXT,
    system_info TEXT NOT NULL,   -- JSON blob
    user_id INTEGER,
    created_at REAL NOT NULL
);
CREATE TABLE IF NOT EXISTS hardware_surveys (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    cpu_model TEXT NOT NULL,
    gpu_model TEXT NOT NULL,
    ram_size INTEGER NOT NULL,
    os TEXT NOT NULL,
    resolution TEXT NOT NULL,
    monitor_refresh_rate INTEGER,
    additional_info TEXT,
    user_id INTEGER,
    created_at REAL NOT NULL
);
CREATE TABLE IF NOT EXISTS download_logs (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    platform TEXT NOT NULL,
    user_id INTEGER,
    created_at REAL NOT NULL
);
CREATE TABLE IF NOT EXISTS benchmark_reports (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    metric TEXT NOT NULL,
    value REAL NOT NULL,
    unit TEXT NOT NULL,
    vs_baseline REAL,
    platform TEXT,
    payload TEXT NOT NULL,       -- the full bench.py JSON line
    user_id INTEGER,
    created_at REAL NOT NULL
);
CREATE TABLE IF NOT EXISTS webhooks (
    -- migrations/2023_07_15_000000_create_webhooks_table.php
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    name TEXT NOT NULL,
    url TEXT NOT NULL,
    description TEXT,
    is_active INTEGER NOT NULL DEFAULT 1,
    events TEXT NOT NULL,        -- JSON array of event names
    secret TEXT NOT NULL,
    headers TEXT,                -- JSON object of extra delivery headers
    last_triggered_at REAL,
    fails_count INTEGER NOT NULL DEFAULT 0,
    user_id INTEGER NOT NULL REFERENCES users(id),
    created_at REAL NOT NULL
);
CREATE TABLE IF NOT EXISTS webhook_logs (
    -- migrations/2023_07_15_000001_create_webhook_logs_table.php
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    webhook_id INTEGER NOT NULL REFERENCES webhooks(id),
    event_type TEXT NOT NULL,
    payload TEXT NOT NULL,       -- JSON
    status_code INTEGER,
    response TEXT,
    error TEXT,
    success INTEGER NOT NULL DEFAULT 0,
    created_at REAL NOT NULL
);
"""


def _hash_password(password: str, salt: str) -> str:
    return hashlib.pbkdf2_hmac("sha256", password.encode(), salt.encode(), 100_000).hex()


class Store:
    """Thread-safe sqlite3 wrapper (WSGI servers may be threaded)."""

    def __init__(self, path: str = ":memory:"):
        self._conn = sqlite3.connect(path, check_same_thread=False)
        self._conn.row_factory = sqlite3.Row
        self._lock = threading.Lock()
        with self._lock:
            self._conn.executescript(_SCHEMA)
            # pre-is_active databases on disk: additive migration
            cols = {r[1] for r in self._conn.execute("PRAGMA table_info(users)")}
            if "is_active" not in cols:
                self._conn.execute(
                    "ALTER TABLE users ADD COLUMN is_active INTEGER NOT NULL DEFAULT 1"
                )
            self._conn.commit()

    def _exec(self, sql: str, params: tuple = ()) -> sqlite3.Cursor:
        with self._lock:
            cur = self._conn.execute(sql, params)
            self._conn.commit()
            return cur

    # -- users / auth -------------------------------------------------------

    def create_user(self, name: str, email: str, password: str) -> Optional[dict]:
        salt = secrets.token_hex(8)
        # first registered account is the admin (the seeded-admin role in the
        # reference's DatabaseSeeder)
        role = "admin" if self.count("users") == 0 else "user"
        try:
            cur = self._exec(
                "INSERT INTO users (name, email, password_hash, salt, role, created_at)"
                " VALUES (?,?,?,?,?,?)",
                (name, email, _hash_password(password, salt), salt, role, time.time()),
            )
        except sqlite3.IntegrityError:
            return None
        return self.user_by_id(cur.lastrowid)

    def user_by_id(self, uid: int) -> Optional[dict]:
        row = self._exec("SELECT * FROM users WHERE id=?", (uid,)).fetchone()
        return dict(row) if row else None

    def verify_login(self, email: str, password: str) -> Optional[dict]:
        row = self._exec("SELECT * FROM users WHERE email=?", (email,)).fetchone()
        if (
            row
            and row["is_active"]
            and _hash_password(password, row["salt"]) == row["password_hash"]
        ):
            return dict(row)
        return None

    def issue_token(self, user_id: int) -> str:
        token = secrets.token_hex(20)
        self._exec(
            "INSERT INTO tokens (token, user_id, created_at) VALUES (?,?,?)",
            (token, user_id, time.time()),
        )
        return token

    def revoke_token(self, token: str) -> None:
        self._exec("UPDATE tokens SET revoked=1 WHERE token=?", (token,))

    def user_for_token(self, token: str) -> Optional[dict]:
        # deactivated accounts lose API access immediately (their existing
        # tokens stop resolving), matching the is_active gate the reference's
        # UserManagementController.updateStatus exists to enforce
        row = self._exec(
            "SELECT u.* FROM tokens t JOIN users u ON u.id=t.user_id"
            " WHERE t.token=? AND t.revoked=0 AND u.is_active=1",
            (token,),
        ).fetchone()
        return dict(row) if row else None

    def set_role(self, user_id: int, role: str) -> None:
        self._exec("UPDATE users SET role=? WHERE id=?", (role, user_id))

    def set_status(self, user_id: int, active: bool) -> None:
        self._exec(
            "UPDATE users SET is_active=? WHERE id=?", (1 if active else 0, user_id)
        )

    # -- feedback -----------------------------------------------------------

    def add_review(self, d: dict, user_id: Optional[int]) -> dict:
        cur = self._exec(
            "INSERT INTO reviews (rating, comment, name, email, user_id, created_at)"
            " VALUES (?,?,?,?,?,?)",
            (d["rating"], d["comment"], d.get("name"), d.get("email"), user_id, time.time()),
        )
        return self.row("reviews", cur.lastrowid)

    def add_bug_report(self, d: dict, user_id: Optional[int]) -> dict:
        cur = self._exec(
            "INSERT INTO bug_reports (description, category, severity,"
            " steps_to_reproduce, system_info, user_id, created_at)"
            " VALUES (?,?,?,?,?,?,?)",
            (
                d["description"], d["category"], d["severity"],
                d.get("steps_to_reproduce"), json.dumps(d["system_info"]),
                user_id, time.time(),
            ),
        )
        out = self.row("bug_reports", cur.lastrowid)
        out["system_info"] = json.loads(out["system_info"])
        return out

    def add_hardware_survey(self, d: dict, user_id: Optional[int]) -> dict:
        cur = self._exec(
            "INSERT INTO hardware_surveys (cpu_model, gpu_model, ram_size, os,"
            " resolution, monitor_refresh_rate, additional_info, user_id, created_at)"
            " VALUES (?,?,?,?,?,?,?,?,?)",
            (
                d["cpu_model"], d["gpu_model"], d["ram_size"], d["os"],
                d["resolution"], d.get("monitor_refresh_rate"),
                d.get("additional_info"), user_id, time.time(),
            ),
        )
        return self.row("hardware_surveys", cur.lastrowid)

    def add_benchmark_report(self, d: dict, user_id: Optional[int]) -> dict:
        cur = self._exec(
            "INSERT INTO benchmark_reports (metric, value, unit, vs_baseline,"
            " platform, payload, user_id, created_at) VALUES (?,?,?,?,?,?,?,?)",
            (
                d["metric"], d["value"], d["unit"], d.get("vs_baseline"),
                d.get("platform"), json.dumps(d), user_id, time.time(),
            ),
        )
        out = self.row("benchmark_reports", cur.lastrowid)
        out["payload"] = json.loads(out["payload"])
        return out

    def log_download(self, platform: str, user_id: Optional[int]) -> None:
        self._exec(
            "INSERT INTO download_logs (platform, user_id, created_at) VALUES (?,?,?)",
            (platform, user_id, time.time()),
        )

    # -- webhooks (Models/Webhook.php, Models/WebhookLog.php) ----------------

    @staticmethod
    def _webhook_out(row) -> dict:
        out = dict(row)
        out["events"] = json.loads(out["events"])
        out["headers"] = json.loads(out["headers"]) if out["headers"] else None
        out["is_active"] = bool(out["is_active"])
        return out

    def add_webhook(self, d: dict, user_id: int) -> dict:
        cur = self._exec(
            "INSERT INTO webhooks (name, url, description, is_active, events,"
            " secret, headers, fails_count, user_id, created_at)"
            " VALUES (?,?,?,?,?,?,?,0,?,?)",
            (
                d["name"], d["url"], d.get("description"),
                int(d.get("is_active", True)), json.dumps(d["events"]),
                d["secret"],
                json.dumps(d["headers"]) if d.get("headers") else None,
                user_id, time.time(),
            ),
        )
        return self.webhook_by_id(cur.lastrowid)

    def webhook_by_id(self, wid: int) -> Optional[dict]:
        row = self._exec("SELECT * FROM webhooks WHERE id=?", (wid,)).fetchone()
        return self._webhook_out(row) if row else None

    def webhooks_for_user(self, user_id: int) -> list[dict]:
        rs = self._exec(
            "SELECT * FROM webhooks WHERE user_id=? ORDER BY id DESC", (user_id,)
        ).fetchall()
        return [self._webhook_out(r) for r in rs]

    def active_webhooks(self) -> list[dict]:
        rs = self._exec(
            "SELECT * FROM webhooks WHERE is_active=1 ORDER BY id"
        ).fetchall()
        return [self._webhook_out(r) for r in rs]

    def update_webhook(self, wid: int, fields: dict) -> Optional[dict]:
        allowed = {
            "name", "url", "description", "is_active", "events", "secret",
            "headers", "last_triggered_at", "fails_count",
        }
        sets, vals = [], []
        for k, v in fields.items():
            assert k in allowed, k
            if k in ("events", "headers") and v is not None:
                v = json.dumps(v)
            if k == "is_active":
                v = int(v)
            sets.append(f"{k}=?")
            vals.append(v)
        if sets:
            self._exec(
                f"UPDATE webhooks SET {', '.join(sets)} WHERE id=?",
                (*vals, wid),
            )
        return self.webhook_by_id(wid)

    def delete_webhook(self, wid: int) -> None:
        # the reference migration cascades logs with their webhook
        self._exec("DELETE FROM webhook_logs WHERE webhook_id=?", (wid,))
        self._exec("DELETE FROM webhooks WHERE id=?", (wid,))

    def mark_webhook_triggered(self, wid: int) -> None:
        """Webhook::markAsTriggered (Webhook.php:96-102)."""
        self._exec(
            "UPDATE webhooks SET last_triggered_at=?, fails_count=0 WHERE id=?",
            (time.time(), wid),
        )

    def increment_webhook_fail(self, wid: int) -> None:
        """Webhook::incrementFailCount (Webhook.php:108-116): deactivate at 10."""
        self._exec(
            "UPDATE webhooks SET fails_count=fails_count+1,"
            " is_active=CASE WHEN fails_count+1>=10 THEN 0 ELSE is_active END"
            " WHERE id=?",
            (wid,),
        )

    @staticmethod
    def _webhook_log_out(row) -> dict:
        out = dict(row)
        out["payload"] = json.loads(out["payload"])
        out["success"] = bool(out["success"])
        return out

    def add_webhook_log(self, webhook_id: int, event_type: str, payload: dict) -> dict:
        cur = self._exec(
            "INSERT INTO webhook_logs (webhook_id, event_type, payload,"
            " success, created_at) VALUES (?,?,?,0,?)",
            (webhook_id, event_type, json.dumps(payload), time.time()),
        )
        return self.webhook_log_by_id(cur.lastrowid)

    def webhook_log_by_id(self, lid: int) -> Optional[dict]:
        row = self._exec("SELECT * FROM webhook_logs WHERE id=?", (lid,)).fetchone()
        return self._webhook_log_out(row) if row else None

    def webhook_logs(self, webhook_id: int, limit: int = 100) -> list[dict]:
        rs = self._exec(
            "SELECT * FROM webhook_logs WHERE webhook_id=?"
            " ORDER BY id DESC LIMIT ?",
            (webhook_id, limit),
        ).fetchall()
        return [self._webhook_log_out(r) for r in rs]

    def update_webhook_log(self, lid: int, fields: dict) -> None:
        allowed = {"status_code", "response", "error", "success"}
        sets, vals = [], []
        for k, v in fields.items():
            assert k in allowed, k
            sets.append(f"{k}=?")
            vals.append(v)
        self._exec(
            f"UPDATE webhook_logs SET {', '.join(sets)} WHERE id=?",
            (*vals, lid),
        )

    # -- queries ------------------------------------------------------------

    def row(self, table: str, rid: int) -> dict:
        assert table in _TABLES
        r = self._exec(f"SELECT * FROM {table} WHERE id=?", (rid,)).fetchone()
        return dict(r)

    def rows(self, table: str, limit: int = 100) -> list[dict]:
        assert table in _TABLES
        rs = self._exec(
            f"SELECT * FROM {table} ORDER BY id DESC LIMIT ?", (limit,)
        ).fetchall()
        return [dict(r) for r in rs]

    def count(self, table: str) -> int:
        assert table in _TABLES
        return self._exec(f"SELECT COUNT(*) c FROM {table}").fetchone()["c"]

    def scalar(self, sql: str, params: tuple = ()) -> Any:
        row = self._exec(sql, params).fetchone()
        return row[0] if row else None

    def grouped(self, table: str, column: str, limit: int = 0,
                by_count: bool = False) -> dict:
        """COUNT(*) per distinct value. `by_count` orders descending by count
        with an optional top-`limit` (the AnalyticsService gpu/cpu top-10);
        default orders by the value itself (ratings/severity distributions).
        """
        assert table in _TABLES
        order = "c DESC" if by_count else "k"
        sql = f"SELECT {column} k, COUNT(*) c FROM {table} GROUP BY {column} ORDER BY {order}"
        if limit:
            sql += f" LIMIT {int(limit)}"
        rs = self._exec(sql).fetchall()
        return {r["k"]: r["c"] for r in rs}

    _PERIOD_FMT = {
        # AdminMetricsController.php:115-122 DATE_FORMAT equivalents
        "daily": "%Y-%m-%d",
        "weekly": "%Y-%W",
        "monthly": "%Y-%m",
        "yearly": "%Y",
    }

    def period_counts(self, table: str, period: str = "monthly") -> list[dict]:
        """[{date, count}] per period bucket over the trailing year — the
        user-growth / feedback-trends query shape
        (AdminMetricsController.php:111-196)."""
        assert table in _TABLES
        fmt = self._PERIOD_FMT.get(period, self._PERIOD_FMT["monthly"])
        since = time.time() - 365 * 86400.0
        rs = self._exec(
            f"SELECT strftime('{fmt}', created_at, 'unixepoch') d, COUNT(*) c"
            f" FROM {table} WHERE created_at >= ? GROUP BY d ORDER BY d",
            (since,),
        ).fetchall()
        return [{"date": r["d"], "count": r["c"]} for r in rs]

    def filtered_page(self, table: str, where: list, params: list,
                      page: int = 1, per_page: int = 15) -> tuple[list[dict], int]:
        """Filtered + paginated listing (the admin index endpoints' Eloquent
        ->when(...)->latest()->paginate(...) shape). Returns (rows, total)."""
        assert table in _TABLES
        cond = (" WHERE " + " AND ".join(where)) if where else ""
        total = self._exec(
            f"SELECT COUNT(*) c FROM {table}{cond}", tuple(params)
        ).fetchone()["c"]
        rs = self._exec(
            f"SELECT * FROM {table}{cond} ORDER BY created_at DESC, id DESC"
            " LIMIT ? OFFSET ?",
            (*params, per_page, (page - 1) * per_page),
        ).fetchall()
        return [dict(r) for r in rs], total


_TABLES = {
    "users", "tokens", "reviews", "bug_reports", "hardware_surveys",
    "download_logs", "benchmark_reports", "webhooks", "webhook_logs",
}

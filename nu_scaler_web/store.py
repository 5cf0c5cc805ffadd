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
        if row and _hash_password(password, row["salt"]) == row["password_hash"]:
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
        row = self._exec(
            "SELECT u.* FROM tokens t JOIN users u ON u.id=t.user_id"
            " WHERE t.token=? AND t.revoked=0",
            (token,),
        ).fetchone()
        return dict(row) if row else None

    def set_role(self, user_id: int, role: str) -> None:
        self._exec("UPDATE users SET role=? WHERE id=?", (role, user_id))

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

    def grouped(self, table: str, column: str) -> dict:
        assert table in _TABLES
        rs = self._exec(
            f"SELECT {column} k, COUNT(*) c FROM {table} GROUP BY {column}"
        ).fetchall()
        return {r["k"]: r["c"] for r in rs}


_TABLES = {
    "users", "tokens", "reviews", "bug_reports", "hardware_surveys",
    "download_logs", "benchmark_reports",
}

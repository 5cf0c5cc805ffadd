"""Serve nu_scaler_web with the stdlib WSGI server:

    python -m nu_scaler_web --port 8000 --db nu_scaler_web.sqlite3
"""

from __future__ import annotations

import argparse
from wsgiref.simple_server import make_server

from nu_scaler_web.app import WebApp
from nu_scaler_web.store import Store


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--db", default=":memory:", help="sqlite3 path (default in-memory)")
    args = ap.parse_args()

    app = WebApp(Store(args.db))
    with make_server(args.host, args.port, app) as srv:
        print(f"nu_scaler_web serving on http://{args.host}:{args.port}/api/v1/...")
        srv.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

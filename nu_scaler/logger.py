"""Timestamped file logger — role of the legacy logger
(`Nu_scale/src/logger.rs:12-208`): per-run `nu_scaler_<ts>.log` under the
user data dir, per-module level filters, and a capture-event helper."""

from __future__ import annotations

import logging
import os
import time
from typing import Optional

_LOGGER: Optional[logging.Logger] = None


def data_dir() -> str:
    base = os.environ.get("XDG_DATA_HOME", os.path.expanduser("~/.local/share"))
    d = os.path.join(base, "nu_scaler", "logs")
    os.makedirs(d, exist_ok=True)
    return d


def init_logger(
    level: int = logging.INFO,
    module_levels: Optional[dict[str, int]] = None,
    to_file: bool = True,
) -> logging.Logger:
    """Idempotent logger setup; returns the root 'nu_scaler' logger."""
    global _LOGGER
    if _LOGGER is not None:
        return _LOGGER
    log = logging.getLogger("nu_scaler")
    log.setLevel(logging.DEBUG)
    fmt = logging.Formatter(
        "%(asctime)s.%(msecs)03d [%(levelname)s] %(name)s: %(message)s",
        datefmt="%H:%M:%S",
    )
    sh = logging.StreamHandler()
    sh.setLevel(level)
    sh.setFormatter(fmt)
    log.addHandler(sh)
    if to_file:
        ts = time.strftime("%Y%m%d_%H%M%S")
        fh = logging.FileHandler(os.path.join(data_dir(), f"nu_scaler_{ts}.log"))
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(fmt)
        log.addHandler(fh)
    for mod, lvl in (module_levels or {}).items():
        logging.getLogger(f"nu_scaler.{mod}").setLevel(lvl)
    _LOGGER = log
    return log


def log_capture_event(event: str, **fields) -> None:
    """Structured capture-path event (logger.rs `log_capture_event` role)."""
    log = init_logger()
    extra = " ".join(f"{k}={v}" for k, v in fields.items())
    log.info("[capture] %s %s", event, extra)

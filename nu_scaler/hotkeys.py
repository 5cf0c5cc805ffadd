"""Global hotkeys — role of the reference `HotkeyManager`
(`/root/reference/Nu_scale/src/ui/hotkeys.rs:10-231`): the actions
ToggleCapture / CaptureFrame / ToggleOverlay / Quit, registered from
"mod+mod+key" strings (split on '+', last part is the key, case-insensitive,
:95-121) and dispatched through a queue the UI loop drains (:90).

TPU-environment mapping: the reference's `global_hotkey` OS listener becomes
pluggable backends — `pynput` when a display server + package exist, and a
`synthetic` injector that tests (and headless scripting) drive directly. The
queue-drain consumption model is preserved (`poll()`), plus direct callbacks.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from enum import Enum
from typing import Callable, Dict, Optional


class HotkeyAction(Enum):
    """hotkeys.rs:10-24."""

    TOGGLE_CAPTURE = "toggle_capture"
    CAPTURE_FRAME = "capture_frame"
    TOGGLE_OVERLAY = "toggle_overlay"
    QUIT = "quit"


DEFAULT_BINDINGS: Dict[HotkeyAction, str] = {
    HotkeyAction.TOGGLE_CAPTURE: "ctrl+alt+c",
    HotkeyAction.CAPTURE_FRAME: "ctrl+alt+s",
    HotkeyAction.TOGGLE_OVERLAY: "ctrl+alt+o",
    HotkeyAction.QUIT: "ctrl+alt+q",
}

_MOD_ALIASES = {
    "ctrl": "ctrl",
    "control": "ctrl",
    "alt": "alt",
    "option": "alt",
    "shift": "shift",
    "super": "super",
    "cmd": "super",
    "meta": "super",
    "win": "super",
}

_KEY_ALIASES = {"esc": "escape", "return": "enter"}


@dataclass(frozen=True)
class Hotkey:
    """Normalized combo: frozenset of modifiers + key name."""

    modifiers: frozenset
    key: str

    def __str__(self) -> str:
        mods = "+".join(sorted(self.modifiers))
        return f"{mods}+{self.key}" if mods else self.key


def parse_hotkey(hotkey_str: str) -> Hotkey:
    """"ctrl+alt+c" → Hotkey (hotkeys.rs:95-121 semantics: last part is the
    key, the rest are modifiers, all case-insensitive)."""
    parts = [p.strip().lower() for p in str(hotkey_str).split("+") if p.strip()]
    if not parts:
        raise ValueError("Invalid hotkey format")
    key = _KEY_ALIASES.get(parts[-1], parts[-1])
    mods = set()
    for m in parts[:-1]:
        if m not in _MOD_ALIASES:
            raise ValueError(f"Unknown modifier: {m}")
        mods.add(_MOD_ALIASES[m])
    if len(key) != 1 and key not in (
        "escape", "space", "tab", "enter",
        *(f"f{i}" for i in range(1, 13)),
        "up", "down", "left", "right", "home", "end", "pageup", "pagedown",
    ):
        raise ValueError(f"Unknown key: {key}")
    return Hotkey(frozenset(mods), key)


class HotkeyManager:
    """Register action bindings; events arrive from a backend (or `inject`)
    and are delivered both to registered callbacks and a pollable queue."""

    def __init__(self, backend: str = "auto"):
        self._bindings: Dict[Hotkey, HotkeyAction] = {}
        self._callbacks: Dict[HotkeyAction, Callable[[], None]] = {}
        self._queue: "queue.Queue[HotkeyAction]" = queue.Queue()
        self._lock = threading.Lock()
        self._listener = None
        self.backend = self._pick_backend(backend)

    @staticmethod
    def _pick_backend(backend: str) -> str:
        if backend != "auto":
            return backend
        try:
            import pynput  # noqa: F401

            import os

            if os.environ.get("DISPLAY") or os.environ.get("WAYLAND_DISPLAY"):
                return "pynput"
        except Exception:  # noqa: BLE001
            pass
        return "synthetic"

    # -- registration ------------------------------------------------------

    def register(
        self,
        hotkey_str: str,
        action: HotkeyAction,
        callback: Optional[Callable[[], None]] = None,
    ) -> Hotkey:
        hk = parse_hotkey(hotkey_str)
        with self._lock:
            self._bindings[hk] = action
            if callback is not None:
                self._callbacks[action] = callback
        return hk

    def register_defaults(self) -> None:
        for action, combo in DEFAULT_BINDINGS.items():
            self.register(combo, action)

    def unregister(self, hotkey_str: str) -> bool:
        hk = parse_hotkey(hotkey_str)
        with self._lock:
            return self._bindings.pop(hk, None) is not None

    def bindings(self) -> Dict[str, str]:
        with self._lock:
            return {str(hk): act.value for hk, act in self._bindings.items()}

    def on(self, action: HotkeyAction, callback: Callable[[], None]) -> None:
        with self._lock:
            self._callbacks[action] = callback

    # -- event delivery ------------------------------------------------------

    def inject(self, hotkey_str: str) -> Optional[HotkeyAction]:
        """Feed one combo (the synthetic backend's event source; also what
        the OS backends call after normalizing their events)."""
        hk = parse_hotkey(hotkey_str)
        with self._lock:
            action = self._bindings.get(hk)
            cb = self._callbacks.get(action) if action else None
        if action is None:
            return None
        self._queue.put(action)
        if cb is not None:
            cb()
        return action

    def poll(self) -> Optional[HotkeyAction]:
        """Non-blocking drain — the reference's channel receiver role
        (hotkeys.rs:90)."""
        try:
            return self._queue.get_nowait()
        except queue.Empty:
            return None

    # -- OS listener (optional) ---------------------------------------------

    def start(self) -> "HotkeyManager":
        if self.backend == "pynput" and self._listener is None:
            from pynput import keyboard

            combos = {}
            with self._lock:
                for hk in self._bindings:
                    parts = []
                    for m in sorted(hk.modifiers):
                        parts.append(f"<{m}>")
                    key = hk.key
                    parts.append(key if len(key) == 1 else f"<{key}>")
                    combos["+".join(parts)] = (
                        lambda hk=hk: self.inject(str(hk))
                    )
            self._listener = keyboard.GlobalHotKeys(combos)
            self._listener.start()
        return self

    def stop(self) -> None:
        if self._listener is not None:
            self._listener.stop()
            self._listener = None

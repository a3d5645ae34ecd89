"""Logger abstraction mirroring the reference's ``ui.Logger`` interface
(/root/reference/ui/logger.go:8-13): four levels (info/success/error/warn)
with three implementations —

- :class:`NoopLogger`   — silently drops everything (logger.go:17-32; the
  reference uses it under the TUI; here, under machine-readable output),
- :class:`PlainLogger`  — unstyled lines via the stdlib logger
  (logger.go:35-62),
- :class:`StyledLogger` — ANSI-colored level labels with a lock against
  interleaved writes (ui/styled.go:28-70), used only when stderr is a TTY.

``pick_logger()`` mirrors the reference's mode selection: styled for
interactive terminals, plain otherwise, noop on request.
"""

from __future__ import annotations

import sys
import threading
import time


class NoopLogger:
    def info(self, fmt: str, *args) -> None: ...
    def success(self, fmt: str, *args) -> None: ...
    def error(self, fmt: str, *args) -> None: ...
    def warn(self, fmt: str, *args) -> None: ...


class PlainLogger:
    def __init__(self, stream=None):
        self.stream = stream or sys.stderr

    def _emit(self, level: str, fmt: str, args: tuple) -> None:
        msg = (fmt % args) if args else fmt
        ts = time.strftime("%Y/%m/%d %H:%M:%S")
        print(f"{ts} {msg}", file=self.stream, flush=True)

    def info(self, fmt: str, *args) -> None:
        self._emit("INFO", fmt, args)

    def success(self, fmt: str, *args) -> None:
        self._emit("OK", fmt, args)

    def error(self, fmt: str, *args) -> None:
        self._emit("ERROR", fmt, args)

    def warn(self, fmt: str, *args) -> None:
        self._emit("WARN", fmt, args)


# 256-color codes as in ui/styled.go:13-24 (12=blue, 10=green, 9=red, 11=yellow)
_LEVEL_COLORS = {"INFO": 12, "OK": 10, "ERROR": 9, "WARN": 11}


class StyledLogger:
    """ANSI-colored output with a lock so concurrent writers never
    interleave (styled.go:30-33 mutex semantics)."""

    def __init__(self, stream=None):
        self.stream = stream or sys.stderr
        self._mu = threading.Lock()

    def _emit(self, level: str, fmt: str, args: tuple) -> None:
        msg = (fmt % args) if args else fmt
        ts = time.strftime("%H:%M:%S")
        color = _LEVEL_COLORS[level]
        line = (
            f"\x1b[38;5;245m{ts}\x1b[0m "
            f"\x1b[1;38;5;{color}m{level:<5}\x1b[0m "
            f"\x1b[38;5;{color if level != 'INFO' else 252}m{msg}\x1b[0m"
        )
        with self._mu:
            print(line, file=self.stream, flush=True)

    def info(self, fmt: str, *args) -> None:
        self._emit("INFO", fmt, args)

    def success(self, fmt: str, *args) -> None:
        self._emit("OK", fmt, args)

    def error(self, fmt: str, *args) -> None:
        self._emit("ERROR", fmt, args)

    def warn(self, fmt: str, *args) -> None:
        self._emit("WARN", fmt, args)


def pick_logger(mode: str = "auto", stream=None):
    """'noop' | 'plain' | 'styled' | 'auto' (styled iff the stream is a
    TTY, plain otherwise — main.go's CLI/TUI split analog)."""
    if mode == "noop":
        return NoopLogger()
    if mode == "plain":
        return PlainLogger(stream)
    if mode == "styled":
        return StyledLogger(stream)
    if mode == "auto":
        s = stream or sys.stderr
        return StyledLogger(stream) if getattr(s, "isatty", lambda: False)() else PlainLogger(stream)
    raise ValueError(f"unknown logger mode {mode!r}")

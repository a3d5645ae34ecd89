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


class LiveStatus:
    """Live multi-line status surface — the reference's Bubble-Tea TUI fold
    (/root/reference/ui/live.go:44-189) rebuilt as a plain-ANSI refreshing
    block, no TUI framework: global counters on top, one worker-status row
    per frontier shard (accepted/dups/taken/pending — the engine's 'worker'
    unit), and a rolling recent-event tail. Each ``update(progress_dict)``
    rewrites the block in place with cursor-up + erase-line codes.

    Feed it the per-round dicts from ``run_crawl(progress=...)``; call
    ``finish(msg)`` to drop below the block and leave it on screen.

    Known limit: other PROCESSES (e.g. raylet warnings) writing to the same
    fd between updates shift the cursor and smear one repaint — there is no
    Python-level hook to detect that. The block re-homes (fresh print, no
    cursor-up) every ``rehome_every`` updates so any smear self-heals."""

    def __init__(self, stream=None, max_shard_rows: int = 8, tail: int = 5,
                 rehome_every: int = 20, pages_total: int = 0):
        import collections

        self.stream = stream or sys.stderr
        self.max_shard_rows = max_shard_rows
        self._tail = collections.deque(maxlen=tail)
        self._last_lines = 0
        self._n_updates = 0
        self.rehome_every = max(1, rehome_every)
        self._t0 = time.monotonic()
        self._mu = threading.Lock()
        # progress bars (ui/live.go:77-79 pageBar/downloadBar): index pages
        # against the known total, media saved against media dispatched.
        # Cumulative per-kind counts fold from each round's "by_kind" dict.
        self.pages_total = pages_total
        self._kind_cum: dict[str, int] = {}
        self._media_ok = 0

    @staticmethod
    def _bar(done: int, total: int, width: int = 30) -> str:
        """ASCII fill bar (progress.Model analog, live.go:77 width 40)."""
        if total <= 0:
            return ""
        done = min(done, total)  # clamp, like progress.Model's percent
        fill = int(done / total * width)
        return f"[{'█' * fill}{'░' * (width - fill)}] {done}/{total}"

    def log(self, msg: str) -> None:
        """Append to the rolling tail (live.go's 12-entry rolling log)."""
        with self._mu:
            self._tail.append(f"{time.strftime('%H:%M:%S')} {msg}")

    def _render(self, p: dict) -> list[str]:
        el = time.monotonic() - self._t0
        rate = p["total_dispatched"] / el if el > 0 else 0.0
        dim, bold, rst = "\x1b[38;5;245m", "\x1b[1m", "\x1b[0m"
        err_c = "\x1b[38;5;9m" if p.get("fetch_errors") else "\x1b[38;5;10m"
        lines = [
            f"{bold}── crawl live ── round {p['round']} ── "
            f"{el:6.1f}s ── {rate:7.1f} urls/s ──{rst}",
            f" dispatched {bold}{p['dispatched']:>6}{rst} this round "
            f"({p['total_dispatched']:,} total)   pending {p['pending']:,}",
            f" docs {bold}{p['docs']:,}{rst}   media {bold}{p['media']:,}{rst}   "
            f"errors {err_c}{p['fetch_errors']}{rst}   "
            f"dup_rate {p['dup_rate']}   cuckoo FP {p['cuckoo_false_positives']}",
        ]
        # live.go:191-240 progress bars — pages vs the known index total,
        # media rows saved vs media URLs dispatched so far
        for k, n in p.get("by_kind", {}).items():
            self._kind_cum[k] = self._kind_cum.get(k, 0) + n
        self._media_ok += p.get("media", 0)
        pages_bar = self._bar(self._kind_cum.get("index", 0), self.pages_total)
        if pages_bar:
            lines.append(f" pages {pages_bar}")
        media_bar = self._bar(self._media_ok, self._kind_cum.get("media", 0))
        if media_bar:
            lines.append(f" media {media_bar}")
        shards = p.get("shards", [])
        for s in shards[: self.max_shard_rows]:
            lines.append(
                f" {dim}shard {s['id']:>2}{rst}  acc {s['accepted']:>7,}  "
                f"dup {s['duplicates']:>6,}  taken {s['taken']:>7,}  "
                f"pend {s['pending']:>7,}"
            )
        if len(shards) > self.max_shard_rows:
            rest = shards[self.max_shard_rows:]
            lines.append(
                f" {dim}… +{len(rest)} shards  acc {sum(s['accepted'] for s in rest):,}  "
                f"pend {sum(s['pending'] for s in rest):,}{rst}"
            )
        for entry in self._tail:
            lines.append(f" {dim}{entry}{rst}")
        return lines

    def update(self, p: dict) -> None:
        with self._mu:
            lines = self._render(p)
            self._n_updates += 1
            if self._n_updates % self.rehome_every == 0:
                # periodic re-home: abandon the old block (cursor math may
                # have been desynced by external writers) and print fresh
                self._last_lines = 0
            out = []
            if self._last_lines:
                # cursor to the start of the previous block, then rewrite
                out.append(f"\x1b[{self._last_lines}F")
            out.extend("\x1b[K" + ln + "\n" for ln in lines)
            # a shrinking block must blank the leftover rows
            extra = self._last_lines - len(lines)
            if extra > 0:
                out.extend("\x1b[K\n" for _ in range(extra))
                out.append(f"\x1b[{extra}F")
            self.stream.write("".join(out))
            self.stream.flush()
            self._last_lines = len(lines)

    def finish(self, msg: str = "") -> None:
        with self._mu:
            if msg:
                self.stream.write(msg + "\n")
                self.stream.flush()
            self._last_lines = 0


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

"""Interactive startup form — the reference's TUI form fold.

The reference runs a two-step huh/Bubble-Tea form before the crawl
(/root/reference/ui/tui.go:17-180): a mode select (board vs file), then a
per-mode input group with validators, where every field falls back to its
default when left empty. This port keeps the same steps, the same three
validators, and the same defaults-on-empty semantics
(``applyBoardDefaults``/``applyFileDefaults``, tui.go:109-146) over plain
terminal prompts — stdlib only, so it runs on any TTY and is driven by a
scripted ``input_fn`` in tests. Invalid input re-prompts, mirroring huh's
block-submission-until-valid behavior (tui.go:148-180 validators).

Wired behind ``--tui`` in ``__main__`` exactly like main.go:31-45: form
results override the CLI flags, then the crawl runs with the live status
surface (ui/live.go analog — :class:`~.logging_ui.LiveStatus`).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass

MODE_BOARD = "board"   # tui.go:12 modeBoard
MODE_FILE = "file"     # tui.go:13 modeFile


@dataclass
class StartupConfig:
    """tui.go:17-23 StartupConfig parity (FileURL empty in board mode)."""

    board: str = ""
    pages: int = 0
    push_rate: int = 0
    file_url: str = ""


# -- validators (tui.go:148-180) — return an error message or None ----------

def validate_non_empty(s: str) -> str | None:
    if s == "":
        return "此欄位不可為空"
    return None


def validate_positive_int(s: str) -> str | None:
    if s == "":
        return None  # empty → default applies later
    try:
        n = int(s)
    except ValueError:
        return "請輸入有效數字"
    if n <= 0:
        return "數字必須大於 0"
    return None


def validate_non_negative_int(s: str) -> str | None:
    if s == "":
        return None
    try:
        n = int(s)
    except ValueError:
        return "請輸入有效數字"
    if n < 0:
        return "數字不可為負數"
    return None


def _ask(prompt: str, validate, input_fn, out) -> str:
    """One input field: prompt, validate, re-prompt until valid (huh keeps
    the field focused until its validator passes)."""
    while True:
        out.write(prompt)
        out.flush()
        try:
            raw = input_fn()
        except EOFError:
            # a closed stream submits the field empty (defaults apply);
            # required fields surface their error once, then give up
            raw = ""
            if validate is not None and validate(raw) is not None:
                raise
        val = raw.strip()
        if validate is None:
            return val
        err = validate(val)
        if err is None:
            return val
        out.write(f"  ✗ {err}\n")


def _ask_mode(input_fn, out) -> str:
    """Step 1: mode select (tui.go:29-48). Arrow-key select becomes a
    numbered choice; Enter on the empty prompt keeps the first (default)
    option, like huh's pre-selected first entry."""
    out.write(
        "選擇爬取模式\n"
        "  1) 看板模式 — 依看板名稱爬取\n"
        "  2) 檔案模式 — 從檔案讀取 URL\n"
    )
    while True:
        out.write("> [1] ")
        out.flush()
        try:
            raw = input_fn()
        except EOFError:
            raw = ""
        choice = raw.strip().lower()
        if choice in ("", "1", MODE_BOARD):
            return MODE_BOARD
        if choice in ("2", MODE_FILE):
            return MODE_FILE
        out.write("  ✗ 請輸入 1 或 2\n")


def run_startup_form(
    default_board: str = "beauty",
    default_pages: int = 3,
    default_push_rate: int = 10,
    *,
    input_fn=None,
    out=None,
) -> StartupConfig:
    """tui.go:26-49 RunStartupForm: mode select, then the per-mode form.

    Reference defaults come from constants.go:19-24 (beauty / 3 / 10);
    ``__main__`` passes its own flag values so ``--tui`` refines rather
    than resets an explicit CLI selection (main.go:32-36 passes the
    constants because flags and TUI are exclusive there — here flags seed
    the placeholders, a strict superset).
    """
    if input_fn is None:
        input_fn = input
    out = out or sys.stderr

    if _ask_mode(input_fn, out) == MODE_FILE:
        return _run_file_form(default_board, input_fn, out)
    return _run_board_form(default_board, default_pages, default_push_rate,
                           input_fn, out)


def _run_board_form(default_board, default_pages, default_push_rate,
                    input_fn, out) -> StartupConfig:
    """tui.go:52-81 runBoardForm + applyBoardDefaults (109-136)."""
    board = _ask(f"看板名稱 [{default_board}]: ", None, input_fn, out)
    pages = _ask(f"爬取頁數 [{default_pages}]: ", validate_positive_int,
                 input_fn, out)
    push = _ask(f"推文數門檻 [{default_push_rate}]: ",
                validate_non_negative_int, input_fn, out)
    return StartupConfig(
        board=board or default_board,
        pages=int(pages) if pages else default_pages,
        push_rate=int(push) if push else default_push_rate,
    )


def _run_file_form(default_board, input_fn, out) -> StartupConfig:
    """tui.go:83-106 runFileForm + applyFileDefaults (139-146): file path
    is required (validateNonEmpty), board defaults for the save dir."""
    file_url = _ask("文章 URL 檔案路徑 (urls.txt): ", validate_non_empty,
                    input_fn, out)
    board = _ask(f"看板名稱 (用於存檔目錄) [{default_board}]: ", None,
                 input_fn, out)
    return StartupConfig(board=board or default_board, file_url=file_url)

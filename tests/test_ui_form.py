"""Startup-form tests (ui/tui.go:17-180 parity) + the --tui CLI wiring.

The reference's huh form is driven by key events; this port is driven by a
scripted ``input_fn``, so every path — defaults-on-empty, validator
re-prompt, file-mode required field — is exercised without a TTY.
"""

import io
import json

import pytest

from ptt_spider_go_ray.ui_form import (
    StartupConfig,
    run_startup_form,
    validate_non_empty,
    validate_non_negative_int,
    validate_positive_int,
)


def scripted(*lines):
    it = iter(lines)

    def input_fn():
        try:
            return next(it)
        except StopIteration:
            raise EOFError

    return input_fn


# -- validators (tui.go:148-180): same accept/reject matrix ------------------

def test_validators_match_reference_matrix():
    assert validate_non_empty("") is not None
    assert validate_non_empty("x") is None
    # empty is valid for the int fields (default applies later)
    assert validate_positive_int("") is None
    assert validate_positive_int("3") is None
    assert validate_positive_int("0") is not None     # must be > 0
    assert validate_positive_int("-1") is not None
    assert validate_positive_int("abc") is not None
    assert validate_non_negative_int("") is None
    assert validate_non_negative_int("0") is None      # 0 allowed for push
    assert validate_non_negative_int("-2") is not None
    assert validate_non_negative_int("x") is not None


# -- board mode (tui.go:52-81 + applyBoardDefaults 109-136) ------------------

def test_board_mode_all_defaults():
    out = io.StringIO()
    cfg = run_startup_form("beauty", 3, 10,
                           input_fn=scripted("", "", "", ""), out=out)
    assert cfg == StartupConfig(board="beauty", pages=3, push_rate=10,
                                file_url="")
    assert "選擇爬取模式" in out.getvalue()


def test_board_mode_explicit_values():
    cfg = run_startup_form("beauty", 3, 10,
                           input_fn=scripted("1", "Gossiping", "7", "25"),
                           out=io.StringIO())
    assert cfg == StartupConfig(board="Gossiping", pages=7, push_rate=25,
                                file_url="")


def test_invalid_int_reprompts_until_valid():
    out = io.StringIO()
    # pages: "abc" (not a number) then "0" (not positive) then "4";
    # push: "-1" (negative) then "" (default)
    cfg = run_startup_form("beauty", 3, 10,
                           input_fn=scripted("", "b", "abc", "0", "4", "-1", ""),
                           out=out)
    assert cfg.pages == 4 and cfg.push_rate == 10 and cfg.board == "b"
    text = out.getvalue()
    assert "請輸入有效數字" in text and "數字必須大於 0" in text
    assert "數字不可為負數" in text


# -- mode select (tui.go:29-48) ----------------------------------------------

def test_mode_select_rejects_garbage_then_accepts():
    out = io.StringIO()
    cfg = run_startup_form("beauty", 3, 10,
                           input_fn=scripted("9", "board", "x", "2", "1"),
                           out=out)
    assert cfg.board == "x" and cfg.pages == 2 and cfg.push_rate == 1
    assert "請輸入 1 或 2" in out.getvalue()


def test_eof_everywhere_yields_pure_defaults():
    cfg = run_startup_form("beauty", 3, 10, input_fn=scripted(),
                           out=io.StringIO())
    assert cfg == StartupConfig(board="beauty", pages=3, push_rate=10,
                                file_url="")


# -- file mode (tui.go:83-106 + applyFileDefaults 139-146) -------------------

def test_file_mode_requires_path_and_defaults_board():
    out = io.StringIO()
    cfg = run_startup_form("beauty", 3, 10,
                           input_fn=scripted("2", "", "urls.txt", ""),
                           out=out)
    assert cfg == StartupConfig(board="beauty", pages=0, push_rate=0,
                                file_url="urls.txt")
    assert "此欄位不可為空" in out.getvalue()


def test_file_mode_eof_on_required_field_raises():
    with pytest.raises(EOFError):
        run_startup_form("beauty", 3, 10, input_fn=scripted("2"),
                         out=io.StringIO())


# -- --tui CLI wiring (main.go:31-45,58-62) ----------------------------------

def test_cli_tui_board_mode_e2e(ray_session, tmp_path, monkeypatch, capsys):
    """--tui: scripted form picks the board crawl; the live status surface
    renders (forced regardless of TTY) and the crawl completes on the
    synthetic site — main.go's runWithTUI path end to end."""
    import ptt_spider_go_ray.__main__ as M

    answers = scripted("1", "Beauty", "2", "0")
    monkeypatch.setattr("builtins.input", lambda: answers())
    rc = M.main([
        "--tui", "--mock", "--no-media",
        "--out", str(tmp_path / "out"),
        "--config", str(tmp_path / "nonexistent.yaml"),  # defaults-on-missing
    ])
    assert rc == 0
    captured = capsys.readouterr()
    summary = json.loads(captured.out.strip().splitlines()[-1])
    assert summary["finished"] and summary["docs"] > 0
    # the live block drew: pages progress bar over the 2 requested index
    # pages, in-place rewrite codes present
    assert "pages [" in captured.err and "2/2" in captured.err
    assert "\x1b[K" in captured.err


def test_cli_tui_file_mode_e2e(ray_session, tmp_path, monkeypatch, capsys):
    """--tui file mode: the form's file branch feeds --file, seeds stream
    from the file, titles resolve from article content (P8)."""
    import ptt_spider_go_ray.__main__ as M
    from ptt_spider_go_ray.sources.synthetic import SiteSpec, SyntheticSite

    site = SyntheticSite(SiteSpec(boards={"Beauty": 10, "Joke": 5}))
    seeds = tmp_path / "seeds.txt"
    seeds.write_text(
        site.article_url("Beauty", 2, 1) + "\n# skip\n"
        + site.article_url("Beauty", 3, 2) + "\n"
    )
    answers = scripted("2", str(seeds), "beauty")
    monkeypatch.setattr("builtins.input", lambda: answers())
    rc = M.main([
        "--tui", "--mock", "--no-media",
        "--out", str(tmp_path / "out"),
        "--config", str(tmp_path / "none.yaml"),
    ])
    assert rc == 0
    captured = capsys.readouterr()
    summary = json.loads(captured.out.strip().splitlines()[-1])
    assert summary["finished"] and summary["docs"] == 2
    # file mode has no known pages total — the pages bar must be absent
    assert "pages [" not in captured.err

"""Logger interface tests (ui/logger.go + ui/styled.go parity)."""

import io

import pytest

from ptt_spider_go_ray.logging_ui import (
    NoopLogger,
    PlainLogger,
    StyledLogger,
    pick_logger,
)


def test_noop_swallows_everything():
    n = NoopLogger()
    n.info("x %d", 1)
    n.success("y")
    n.error("z")
    n.warn("w")


def test_plain_logger_formats_args():
    buf = io.StringIO()
    lg = PlainLogger(buf)
    lg.info("hello %s %d", "world", 7)
    lg.error("boom")
    out = buf.getvalue().splitlines()
    assert len(out) == 2
    assert out[0].endswith("hello world 7")
    assert out[1].endswith("boom")


def test_styled_logger_colors_levels():
    buf = io.StringIO()
    lg = StyledLogger(buf)
    lg.info("i")
    lg.success("s")
    lg.error("e")
    lg.warn("w")
    lines = buf.getvalue().splitlines()
    assert len(lines) == 4
    # level labels carry the ui/styled.go 256-color codes 12/10/9/11
    for line, color in zip(lines, (12, 10, 9, 11)):
        assert f"\x1b[1;38;5;{color}m" in line


def test_pick_logger_modes():
    assert isinstance(pick_logger("noop"), NoopLogger)
    assert isinstance(pick_logger("plain"), PlainLogger)
    assert isinstance(pick_logger("styled"), StyledLogger)
    # auto: non-tty stream → plain
    assert isinstance(pick_logger("auto", io.StringIO()), PlainLogger)
    class Tty(io.StringIO):
        def isatty(self):
            return True
    assert isinstance(pick_logger("auto", Tty()), StyledLogger)
    with pytest.raises(ValueError):
        pick_logger("nope")

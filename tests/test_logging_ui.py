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


def _progress(round_no, shards=3, errors=0):
    return {
        "round": round_no,
        "dispatched": 128,
        "total_dispatched": 128 * round_no,
        "docs": 40 * round_no,
        "media": 90 * round_no,
        "fetch_errors": errors,
        "pending": 1000 - 100 * round_no,
        "dup_rate": 0.01,
        "cuckoo_false_positives": 0,
        "shards": [
            {"id": i, "accepted": 50 * round_no + i, "duplicates": i,
             "taken": 40 * round_no, "pending": 10 * i}
            for i in range(shards)
        ],
    }


def test_live_status_block_renders_and_rewrites():
    from ptt_spider_go_ray.logging_ui import LiveStatus

    buf = io.StringIO()
    live = LiveStatus(buf, max_shard_rows=2, tail=3)
    live.update(_progress(1))
    first = buf.getvalue()
    # first draw: no cursor-up; counters + per-shard rows + overflow summary
    assert "\x1b[1F" not in first and "\x1b[2F" not in first
    assert "round 1" in first and "shard  0" in first and "shard  1" in first
    assert "+1 shards" in first  # 3 shards, 2 rows shown
    n_lines = first.count("\n")

    live.log("round 2: 3 fetch errors")
    live.update(_progress(2, errors=3))
    second = buf.getvalue()[len(first):]
    # rewrite-in-place: cursor jumps up over the previous block, every line
    # cleared before redraw; the tail entry appears
    assert f"\x1b[{n_lines}F" in second
    assert second.count("\x1b[K") >= n_lines
    assert "round 2" in second and "fetch errors" in second

    live.finish("done")
    assert buf.getvalue().endswith("done\n")


def test_live_status_progress_bars_accumulate():
    """ui/live.go pageBar/downloadBar analog: the pages bar fills against
    the known index total, the media bar tracks saved vs dispatched, and
    both accumulate across rounds from per-round by_kind deltas."""
    from ptt_spider_go_ray.logging_ui import LiveStatus

    buf = io.StringIO()
    live = LiveStatus(buf, max_shard_rows=2, tail=2, pages_total=4)
    p1 = _progress(1)
    p1["by_kind"] = {"index": 2, "article": 100, "media": 120}
    live.update(p1)
    first = buf.getvalue()
    assert "pages [" in first and "2/4" in first
    assert "media [" in first and "90/120" in first

    p2 = _progress(2)
    p2["by_kind"] = {"index": 2, "media": 60}
    live.update(p2)
    second = buf.getvalue()[len(first):]
    assert "4/4" in second            # pages bar full
    assert "270/180" not in second    # media saved caps at dispatched...
    assert "media [" in second


def test_live_status_no_bars_without_totals():
    from ptt_spider_go_ray.logging_ui import LiveStatus

    buf = io.StringIO()
    live = LiveStatus(buf, pages_total=0)
    live.update(_progress(1))        # no by_kind key at all
    assert "pages [" not in buf.getvalue()
    assert "media [" not in buf.getvalue()

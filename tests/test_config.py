"""Config tests mirroring config/config_test.go: defaults, missing file,
invalid YAML, duration parsing, validate-and-fix clamps."""

import pytest

from ptt_spider_go_ray.config import Config, load, parse_duration


def test_missing_file_gives_defaults(tmp_path):
    cfg = load(str(tmp_path / "nope.yaml"))
    assert cfg.crawler.workers == 10
    assert cfg.crawler.parser_count == 10
    assert cfg.crawler.delays.min_ms == 500
    assert cfg.crawler.delays.max_ms == 2000
    assert cfg.crawler.http.timeout == 30.0


def test_valid_yaml(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        "crawler:\n  workers: 4\n  parserCount: 6\n"
        "  delays:\n    minMs: 100\n    maxMs: 300\n"
        "  http:\n    timeout: 10s\n    maxIdleConns: 50\n"
    )
    cfg = load(str(p))
    assert cfg.crawler.workers == 4
    assert cfg.crawler.parser_count == 6
    assert cfg.crawler.delays.min_ms == 100
    assert cfg.crawler.http.timeout == 10.0
    assert cfg.crawler.http.max_idle_conns == 50


def test_invalid_yaml_raises(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("crawler: [unclosed")
    with pytest.raises(Exception):
        load(str(p))


def test_validate_and_fix_clamps(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("crawler:\n  workers: 0\n  parserCount: -3\n")
    cfg = load(str(p))
    # below-minimum values revert to defaults (config.go validateAndFix)
    assert cfg.crawler.workers == 10
    assert cfg.crawler.parser_count == 10


@pytest.mark.parametrize(
    "s,want",
    [
        ("30s", 30.0),
        ("500ms", 0.5),
        ("1m30s", 90.0),
        ("2h", 7200.0),
        ("garbage", 99.0),  # default fallback
        ("", 99.0),
    ],
)
def test_parse_duration(s, want):
    assert parse_duration(s, 99.0) == want


def test_engine_extensions_loaded(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("crawler:\n  frontier_shards: 16\n  robots: false\n")
    cfg = load(str(p))
    assert cfg.crawler.frontier_shards == 16
    assert cfg.crawler.robots is False

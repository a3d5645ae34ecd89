"""Typed error taxonomy tests (errors.go:10-183 parity): kind strings,
message/cause rendering, context copies, kind checks through cause chains,
and the fetch-stage error_kind column classification."""

import pytest

from ptt_spider_go_ray.errors import (
    ConfigError,
    CrawlerError,
    FileError,
    NetworkError,
    ParseError,
    ValidationError,
    classify_fetch,
    error_kind,
)


def test_kind_strings_match_reference():
    # ErrorType.String(), errors.go:27-42
    assert NetworkError("x").kind == "NetworkError"
    assert ParseError("x").kind == "ParseError"
    assert FileError("x").kind == "FileError"
    assert ConfigError("x").kind == "ConfigError"
    assert ValidationError("x").kind == "ValidationError"


def test_error_rendering_with_and_without_cause():
    # CrawlerError.Error(), errors.go:50-56
    assert str(NetworkError("fetch failed")) == "[NetworkError] fetch failed"
    cause = ValueError("conn reset")
    assert (
        str(NetworkError("fetch failed", cause))
        == "[NetworkError] fetch failed: conn reset"
    )


def test_with_context_returns_copy():
    # WithContext, errors.go:64-78: new instance, original untouched
    e = ParseError("bad page", url="u1")
    e2 = e.with_context("attempt", 2)
    assert e2.get_context("attempt") == 2 and e2.get_context("url") == "u1"
    assert e.get_context("attempt") is None


def test_error_kind_walks_cause_chain():
    # errors.As-style unwrapping (errors.go:139-146)
    inner = NetworkError("timeout")
    try:
        try:
            raise inner
        except NetworkError as ne:
            raise RuntimeError("wrapped") from ne
    except RuntimeError as outer:
        assert error_kind(outer) == "NetworkError"
    assert error_kind(ValueError("plain")) == ""


def test_taxonomy_subclasses_stdlib_bases():
    # ParseError/ConfigError/ValidationError stay catchable as ValueError
    # (pre-taxonomy API), FileError as OSError
    with pytest.raises(ValueError):
        raise ParseError("x")
    with pytest.raises(OSError):
        raise FileError("x")
    assert isinstance(ConfigError("x"), CrawlerError)


def test_classify_fetch_column_values():
    assert classify_fetch(200, "") == ""
    assert classify_fetch(-1, "connection refused") == "NetworkError"
    assert classify_fetch(429, "still 429 after 3 attempts") == "NetworkError"
    assert classify_fetch(404, "http 404") == "NetworkError"
    assert classify_fetch(-2, "robots disallowed") == "ValidationError"
    assert classify_fetch(200, "oversize") == "FileError"

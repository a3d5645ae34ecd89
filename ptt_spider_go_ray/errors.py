"""Structured error taxonomy mirroring the reference's typed error system
(/root/reference/errors/errors.go:10-137): five error kinds with message +
cause wrapping and key/value context, plus ``errors.Is``-style kind checks.

In the dataflow, failures are COLUMNS, not exceptions (skip-and-continue,
crawler/crawler.go:384-404): fetch stages emit an ``error_kind`` column via
:func:`classify_fetch` so failure-class analytics survive the pipeline —
the Python exceptions below are for driver-side/config/validation paths and
for tests.
"""

from __future__ import annotations

# error_kind column values (ErrorType.String(), errors.go:27-42)
NETWORK_ERROR = "NetworkError"
PARSE_ERROR = "ParseError"
FILE_ERROR = "FileError"
CONFIG_ERROR = "ConfigError"
VALIDATION_ERROR = "ValidationError"


class CrawlerError(Exception):
    """Typed error with message, optional cause, and context (errors.go
    CrawlerError). ``str()`` renders '[Kind] message: cause' exactly like
    CrawlerError.Error() (errors.go:50-56)."""

    kind = "UnknownError"

    def __init__(self, message: str, cause: BaseException | None = None,
                 **context):
        super().__init__(message)
        self.message = message
        self.cause = cause
        self.context = dict(context)
        if cause is not None:
            self.__cause__ = cause

    def __str__(self) -> str:
        if self.cause is not None:
            return f"[{self.kind}] {self.message}: {self.cause}"
        return f"[{self.kind}] {self.message}"

    def with_context(self, key: str, value) -> "CrawlerError":
        """Copy with one more context entry (errors.go:64-78 WithContext —
        returns a new instance, never mutates)."""
        e = type(self)(self.message, self.cause, **{**self.context, key: value})
        return e

    def get_context(self, key: str):
        return self.context.get(key)


class NetworkError(CrawlerError):
    kind = NETWORK_ERROR


class ParseError(CrawlerError, ValueError):
    kind = PARSE_ERROR


class FileError(CrawlerError, OSError):
    kind = FILE_ERROR


class ConfigError(CrawlerError, ValueError):
    kind = CONFIG_ERROR


class ValidationError(CrawlerError, ValueError):
    kind = VALIDATION_ERROR


def error_kind(err: BaseException | None) -> str:
    """Kind of an exception, walking the cause chain like errors.As
    (errors.go:139-146 IsNetworkError et al.)."""
    seen = set()
    while err is not None and id(err) not in seen:
        seen.add(id(err))
        if isinstance(err, CrawlerError):
            return err.kind
        err = err.__cause__
    return ""


def classify_fetch(status: int, error: str) -> str:
    """error_kind column value for a fetch-stage result row.

    - transport failure (status -1) / HTTP-level failure (429 exhausted,
      non-200) → NetworkError
    - robots denial (status -2) → ValidationError (request rejected by
      policy before any network I/O)
    - oversize body → FileError (the reference's size cap deletes the
      partial FILE, crawler/crawler.go:718-726)
    - success → '' (no error)
    """
    if not error and 200 <= status < 300:
        return ""
    if error == "oversize":
        return FILE_ERROR
    if status == -2:
        return VALIDATION_ERROR
    return NETWORK_ERROR

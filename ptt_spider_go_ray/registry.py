"""Registry of non-SQL-expressible pipelines (driver records rows-only
checks for these; exact semantics are verified by pytest instead)."""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def _flagship_spans(sf_dir: str):
    from .pipelines.flagship import flagship

    return flagship(sf_dir).select_columns(
        ["doc_id", "n_spans", "n_media", "n_text", "n_text_chars"]
    )


def _explode_media(sf_dir: str):
    from .sources.spans_source import read_span_documents
    from .stages.spans import explode_media_batch, normalize_spans_batch

    ds = read_span_documents(sf_dir)
    ds = ds.map_batches(normalize_spans_batch, batch_format="pyarrow")
    return ds.map_batches(explode_media_batch, batch_format="pyarrow")


EXTRA_QUERIES: dict[str, Callable[[str], Any]] = {
    "flagship_spans": _flagship_spans,
    "explode_media": _explode_media,
}

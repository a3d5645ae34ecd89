"""Flagship pipeline: the reference's article-processing path re-expressed
over the input_hint span table (SURVEY §7.1 minimum slice, widened).

read documents.parquet → synthesize interleaved spans (deterministic source)
→ normalize (per-doc stable media dedup D1 + offset reassignment O3)
→ span stats (A2) → markdown render (S5). Streaming end-to-end; every stage
is an Arrow ``map_batches`` task stage.
"""

from __future__ import annotations

from ..sources.spans_source import read_span_documents
from ..stages.spans import normalize_spans_batch, render_markdown_batch, span_stats_batch


def flagship(sf_dir: str, render: bool = True):
    ds = read_span_documents(sf_dir)
    ds = ds.map_batches(normalize_spans_batch, batch_format="pyarrow")
    ds = ds.map_batches(span_stats_batch, batch_format="pyarrow")
    if render:
        ds = ds.map_batches(render_markdown_batch, batch_format="pyarrow")
    return ds

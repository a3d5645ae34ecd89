"""Deterministic synthesis of the input_hint table — interleaved text+media
documents ``(doc_id:string, spans:array<struct<kind,text,media_ref,offset>>)``
— from the driver's ``documents.parquet`` (doc_id:int64, text, lang, source,
n_chars). Seed-free: every span is a pure function of (doc_id, text), so any
process at any scale regenerates the identical table (FIXTURES.md F1).

Coverage of reference cases baked into the rule:
- docs with zero media spans (doc_id % 7 == 0) — reference skips task
  dispatch for these (crawler/crawler.go:471-473);
- docs whose media list contains duplicates (dedup case D1,
  crawler/crawler.go:458-460): when (doc_id + j) % 11 == 0 the first media
  ref of the doc is repeated.
"""

from __future__ import annotations

import pyarrow as pa

from ..schemas import SPAN_STRUCT

CHUNK_TOKENS = 8


def spans_for_doc(doc_id: int, text: str) -> list[dict]:
    """Pure deterministic rule: text chunked into 8-token text spans; after
    chunk j a media span appears when (doc_id*31 + j) % 5 == 0 (unless
    doc_id % 7 == 0 → text-only doc); some media spans duplicate the doc's
    first ref."""
    toks = text.split()
    spans: list[dict] = []
    first_ref: str | None = None
    media_free = doc_id % 7 == 0
    j = 0
    for start in range(0, max(len(toks), 1), CHUNK_TOKENS):
        chunk = " ".join(toks[start : start + CHUNK_TOKENS])
        if chunk:
            spans.append({"kind": "text", "text": chunk, "media_ref": ""})
        if not media_free and (doc_id * 31 + j) % 5 == 0:
            if first_ref is not None and (doc_id + j) % 11 == 0:
                ref = first_ref  # planted duplicate (D1)
            else:
                ref = f"https://i.imgur.com/d{doc_id}x{j}.jpg"
                if first_ref is None:
                    first_ref = ref
            spans.append({"kind": "media", "text": "", "media_ref": ref})
        j += 1
    for i, s in enumerate(spans):
        s["offset"] = i
    return spans


def synthesize_spans_batch(batch: pa.Table) -> pa.Table:
    """map_batches fn: documents rows → input_hint rows. Synthesis is test
    input generation, not an engine hot path; engine stages downstream are
    vectorized."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    out_ids = [f"doc{d}" for d in doc_ids]
    out_spans = [spans_for_doc(d, t or "") for d, t in zip(doc_ids, texts)]
    return pa.table(
        {
            "doc_id": pa.array(out_ids, pa.string()),
            "spans": pa.array(out_spans, pa.list_(SPAN_STRUCT)),
        }
    )


def read_span_documents(sf_dir: str, **read_kwargs):
    """sf documents.parquet → Dataset of input_hint rows (streaming; the
    synthesis is a plain map_batches task stage)."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"], **read_kwargs
    )
    return ds.map_batches(synthesize_spans_batch, batch_format="pyarrow")

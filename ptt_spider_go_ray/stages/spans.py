"""Vectorized batch stages over the interleaved-span document table
(input_hint shape). All functions are Arrow-in/Arrow-out ``map_batches``
fns operating on the flattened list<struct> child arrays with numpy/pandas —
no per-row Python in the hot path.

Reference parity:
- ``normalize_spans_batch``  — per-article stable media dedup (D1,
  crawler/crawler.go:458-460,644-656) generalized to spans; offsets
  recomputed to stay strictly increasing (O3, ptt/parser_impl.go:91-110).
- ``explode_media_batch``    — task fan-out (P9, crawler/crawler.go:544-560)
  with collision-suffixed filenames (D3, internal/fileutil/filename.go:31-49).
- ``span_stats_batch``       — per-article media count (A2,
  crawler/crawler.go:464-469).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.parse import image_file_names
from ..schemas import SPAN_STRUCT


def _flatten_spans(tbl: pa.Table):
    """Return (list_array, parent_idx ndarray, struct fields dict)."""
    col = tbl["spans"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.LargeListArray) or isinstance(col, pa.ListArray):
        arr = col
    else:  # pragma: no cover
        arr = col
    offsets = np.asarray(arr.offsets)
    lengths = np.diff(offsets)
    parent = np.repeat(np.arange(len(arr)), lengths)
    child = arr.flatten()
    fields = {
        "kind": child.field("kind"),
        "text": child.field("text"),
        "media_ref": child.field("media_ref"),
        "offset": child.field("offset"),
    }
    return arr, offsets, parent, fields


def normalize_spans_batch(tbl: pa.Table) -> pa.Table:
    """Stable per-doc dedup of media spans (keep first occurrence of each
    media_ref within a doc; text spans untouched), then offsets reassigned
    0..n-1. Fully vectorized via pandas duplicated + cumcount."""
    arr, offsets, parent, f = _flatten_spans(tbl)
    n_child = len(parent)
    if n_child == 0:
        return tbl
    kind = f["kind"].to_numpy(zero_copy_only=False)
    ref = f["media_ref"].to_numpy(zero_copy_only=False)
    df = pd.DataFrame({"parent": parent, "kind": kind, "ref": ref})
    is_media = df["kind"].to_numpy() == "media"
    dup = df.duplicated(subset=["parent", "ref"]).to_numpy() & is_media
    keep = ~dup
    kept_parent = parent[keep]
    new_offset = pd.Series(kept_parent).groupby(kept_parent).cumcount().to_numpy()
    keep_idx = np.nonzero(keep)[0]
    new_child = pa.StructArray.from_arrays(
        [
            f["kind"].take(pa.array(keep_idx)),
            f["text"].take(pa.array(keep_idx)),
            f["media_ref"].take(pa.array(keep_idx)),
            pa.array(new_offset, pa.int32()),
        ],
        fields=list(SPAN_STRUCT),
    )
    new_lengths = np.bincount(kept_parent, minlength=len(arr))
    new_offsets = np.concatenate([[0], np.cumsum(new_lengths)]).astype(np.int32)
    new_list = pa.ListArray.from_arrays(pa.array(new_offsets, pa.int32()), new_child)
    i = tbl.schema.get_field_index("spans")
    return tbl.set_column(i, pa.field("spans", new_list.type), new_list)


def span_stats_batch(tbl: pa.Table) -> pa.Table:
    """Append n_spans / n_media / n_text / n_text_chars columns (A2)."""
    arr, offsets, parent, f = _flatten_spans(tbl)
    n = len(arr)
    n_spans = np.diff(offsets)
    kind = f["kind"].to_numpy(zero_copy_only=False)
    is_media = (kind == "media").astype(np.int64)
    n_media = np.bincount(parent, weights=is_media, minlength=n).astype(np.int64)
    n_text = n_spans - n_media
    text_lens = pc.utf8_length(f["text"]).to_numpy(zero_copy_only=False).astype(np.int64)
    n_text_chars = np.bincount(parent, weights=text_lens, minlength=n).astype(np.int64)
    out = tbl
    for name, vals, typ in (
        ("n_spans", n_spans, pa.int32()),
        ("n_media", n_media, pa.int32()),
        ("n_text", n_text, pa.int32()),
        ("n_text_chars", n_text_chars, pa.int64()),
    ):
        out = out.append_column(name, pa.array(vals, typ))
    return out


def explode_media_batch(tbl: pa.Table) -> pa.Table:
    """Doc rows → one row per media span: (doc_id, span_idx, media_ref,
    file_name). Emits nothing for media-free docs (crawler.go:471-473).
    Filename collision suffixes are per-doc (D3), computed on the small
    exploded frame."""
    arr, offsets, parent, f = _flatten_spans(tbl)
    kind = f["kind"].to_numpy(zero_copy_only=False)
    media_idx = np.nonzero(kind == "media")[0]
    doc_ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    m_parent = parent[media_idx]
    m_ref = f["media_ref"].take(pa.array(media_idx))
    m_off = f["offset"].take(pa.array(media_idx))
    refs = m_ref.to_pylist()
    # per-doc collision-suffixed filenames, contiguous by construction
    names: list[str] = []
    start = 0
    for p, grp_len in zip(*np.unique(m_parent, return_counts=True)):
        names.extend(image_file_names(refs[start : start + grp_len]))
        start += grp_len
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[m_parent], pa.string()),
            "span_idx": m_off.cast(pa.int32()),
            "media_ref": m_ref,
            "file_name": pa.array(names, pa.string()),
        }
    )


def render_markdown_batch(tbl: pa.Table) -> pa.Table:
    """Append a ``markdown:string`` column rendered per document (S5).
    Rendering is string assembly per row — cheap relative to I/O; the ordered
    image list comes from the media spans."""
    from ..functions.render import render_markdown

    arr, offsets, parent, f = _flatten_spans(tbl)
    kind = f["kind"].to_numpy(zero_copy_only=False)
    refs = f["media_ref"].to_numpy(zero_copy_only=False)
    n = len(arr)
    doc_imgs: list[list[str]] = [[] for _ in range(n)]
    for i in np.nonzero(kind == "media")[0]:
        doc_imgs[parent[i]].append(refs[i])
    titles = (
        tbl["title"].to_numpy(zero_copy_only=False)
        if "title" in tbl.schema.names
        else tbl["doc_id"].to_numpy(zero_copy_only=False)
    )
    urls = (
        tbl["url"].to_numpy(zero_copy_only=False)
        if "url" in tbl.schema.names
        else np.array([f"https://www.ptt.cc/bbs/{d}" for d in tbl["doc_id"].to_pylist()])
    )
    pushes = (
        tbl["push_count"].to_numpy(zero_copy_only=False)
        if "push_count" in tbl.schema.names
        else np.zeros(n, dtype=np.int64)
    )
    md = [
        render_markdown(str(t), str(u), int(p), imgs)
        for t, u, p, imgs in zip(titles, urls, pushes, doc_imgs)
    ]
    return tbl.append_column("markdown", pa.array(md, pa.string()))

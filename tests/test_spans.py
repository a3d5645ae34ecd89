"""Span-stage tests: per-row span-sequence equality (kind, text, media_ref,
order) against a plain-Python oracle of the same semantics (BASELINE.md
correctness gate), plus the flagship pipeline end-to-end on sf0.001."""

import numpy as np
import pyarrow as pa

from ptt_spider_go_ray.functions.parse import image_file_names, unique_stable
from ptt_spider_go_ray.schemas import SPAN_STRUCT
from ptt_spider_go_ray.sources.spans_source import spans_for_doc, synthesize_spans_batch
from ptt_spider_go_ray.stages.spans import (
    explode_media_batch,
    normalize_spans_batch,
    render_markdown_batch,
    span_stats_batch,
)

SF = "/root/testdata/sf0.001"


def oracle_normalize(spans):
    """Plain-Python reference semantics: stable dedup of media refs within a
    doc (crawler.go:644-656 applied to the media subsequence), offsets 0..n-1."""
    seen = set()
    out = []
    for s in spans:
        if s["kind"] == "media":
            if s["media_ref"] in seen:
                continue
            seen.add(s["media_ref"])
        out.append(dict(s))
    for i, s in enumerate(out):
        s["offset"] = i
    return out


def make_table(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "spans": pa.array([r[1] for r in rows], pa.list_(SPAN_STRUCT)),
        }
    )


def sample_docs(n=200):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return t.slice(0, n)


def test_synthesize_deterministic_and_cases_covered():
    t = sample_docs(300)
    b1 = synthesize_spans_batch(t)
    b2 = synthesize_spans_batch(t)
    assert b1.equals(b2)
    rows = b1.to_pylist()
    zero_media = [r for r in rows if all(s["kind"] != "media" for s in r["spans"])]
    has_dup = []
    for r in rows:
        refs = [s["media_ref"] for s in r["spans"] if s["kind"] == "media"]
        if len(refs) != len(set(refs)):
            has_dup.append(r)
    assert zero_media, "must include docs with no media spans"
    assert has_dup, "must include docs with duplicate media refs (D1)"
    for r in rows:
        assert [s["offset"] for s in r["spans"]] == list(range(len(r["spans"])))


def test_normalize_matches_oracle_per_row():
    t = sample_docs(300)
    src = synthesize_spans_batch(t)
    out = normalize_spans_batch(src).to_pylist()
    for row_in, row_out in zip(src.to_pylist(), out):
        want = oracle_normalize(row_in["spans"])
        got = row_out["spans"]
        # span-sequence equality: kind, text, media_ref, order
        assert [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got] == [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in want
        ], row_in["doc_id"]


def test_normalize_empty_and_edge_batches():
    empty = make_table([])
    assert normalize_spans_batch(empty).num_rows == 0
    t = make_table(
        [
            ("a", []),
            (
                "b",
                [
                    {"kind": "media", "text": "", "media_ref": "u1", "offset": 0},
                    {"kind": "media", "text": "", "media_ref": "u1", "offset": 1},
                ],
            ),
        ]
    )
    out = normalize_spans_batch(t).to_pylist()
    assert out[0]["spans"] == []
    assert len(out[1]["spans"]) == 1


def test_span_stats():
    t = make_table(
        [
            (
                "a",
                [
                    {"kind": "text", "text": "hello", "media_ref": "", "offset": 0},
                    {"kind": "media", "text": "", "media_ref": "u", "offset": 1},
                ],
            ),
            ("b", []),
        ]
    )
    out = span_stats_batch(t).to_pylist()
    assert out[0]["n_spans"] == 2 and out[0]["n_media"] == 1
    assert out[0]["n_text"] == 1 and out[0]["n_text_chars"] == 5
    assert out[1]["n_spans"] == 0 and out[1]["n_media"] == 0


def test_explode_media_matches_reference_fanout():
    t = sample_docs(200)
    docs = normalize_spans_batch(synthesize_spans_batch(t))
    media = explode_media_batch(docs).to_pylist()
    by_doc = {}
    for m in media:
        by_doc.setdefault(m["doc_id"], []).append(m)
    for row in docs.to_pylist():
        refs = [s["media_ref"] for s in row["spans"] if s["kind"] == "media"]
        got = by_doc.get(row["doc_id"], [])
        # crawler.go:471-473: no rows for media-free docs
        assert [m["media_ref"] for m in got] == refs
        assert [m["file_name"] for m in got] == image_file_names(refs)
        offs = [s["offset"] for s in row["spans"] if s["kind"] == "media"]
        assert [m["span_idx"] for m in got] == offs


def test_render_markdown_batch():
    t = make_table(
        [
            (
                "d1",
                [
                    {"kind": "text", "text": "hi", "media_ref": "", "offset": 0},
                    {
                        "kind": "media",
                        "text": "",
                        "media_ref": "https://i.imgur.com/a.jpg",
                        "offset": 1,
                    },
                ],
            )
        ]
    )
    out = render_markdown_batch(t).to_pylist()[0]["markdown"]
    assert out.startswith("# d1\n\n")
    assert "## 圖片列表" in out
    assert "![a.jpg](./a.jpg)" in out


def test_flagship_pipeline_e2e(ray_session):
    from ptt_spider_go_ray.pipelines.flagship import flagship

    ds = flagship(SF)
    rows = ds.take_all()
    assert len(rows) == 500
    schema_names = set(ds.schema().names)
    assert {"doc_id", "spans", "n_spans", "n_media", "markdown"} <= schema_names
    # media dedup happened: no doc has duplicate media refs
    for r in rows[:100]:
        refs = [s["media_ref"] for s in r["spans"] if s["kind"] == "media"]
        assert refs == unique_stable(refs)

"""Contract test for the Lance branch of sources/storage.py — the north
rule targets Lance tables, but no ``lance`` wheel exists in this sandbox,
so the branch had never executed. A fake ``lance`` module implementing the
two entry points the storage layer uses (``write_dataset(table, uri,
mode)`` and ``dataset(uri).to_table()``) is injected via monkeypatch; the
test then drives write_partition/read_table through the Lance code path
and checks the roundtrip, the .lance file layout, and the call contract
(mode="overwrite" for resumable re-runs). No Ray needed."""

from __future__ import annotations

import os
import types

import pyarrow as pa
import pyarrow.feather as feather

from ptt_spider_go_ray.sources import storage


class _FakeLanceDataset:
    def __init__(self, uri: str):
        self._uri = uri

    def to_table(self) -> pa.Table:
        return feather.read_table(os.path.join(self._uri, "data.arrow"))


def _fake_lance_module(calls: list) -> types.ModuleType:
    mod = types.ModuleType("lance")

    def write_dataset(table: pa.Table, uri: str, mode: str = "create"):
        calls.append({"uri": uri, "mode": mode, "rows": table.num_rows})
        # a Lance dataset is a directory; persist via Arrow IPC underneath
        os.makedirs(uri, exist_ok=True)
        feather.write_feather(table, os.path.join(uri, "data.arrow"))

    mod.write_dataset = write_dataset
    mod.dataset = _FakeLanceDataset
    return mod


def _spans_table(ids) -> pa.Table:
    """Rows in the north-rule interleaved shape: doc_id + list<struct> spans."""
    span_t = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    return pa.table(
        {
            "doc_id": pa.array([f"doc{i}" for i in ids], pa.string()),
            "spans": pa.array(
                [
                    [
                        {"kind": "text", "text": f"t{i}", "media_ref": "", "offset": 0},
                        {"kind": "media", "text": "", "media_ref": f"m{i}", "offset": 1},
                    ]
                    for i in ids
                ],
                pa.list_(span_t),
            ),
        }
    )


def test_lance_branch_write_read_roundtrip(monkeypatch, tmp_path):
    calls: list = []
    monkeypatch.setattr(storage, "lance", _fake_lance_module(calls))
    monkeypatch.setattr(storage, "HAVE_LANCE", True)

    t1 = _spans_table([0, 1, 2])
    t2 = _spans_table([3, 4])
    d = storage.write_partition(t1, str(tmp_path), "docs", "round=0", part=0)
    storage.write_partition(t2, str(tmp_path), "docs", "round=1", part=0)

    # layout contract: one dir per partition, .lance datasets inside
    assert d == str(tmp_path / "docs" / "round=0")
    assert os.path.isdir(tmp_path / "docs" / "round=0" / "part-0.lance")
    # call contract: overwrite mode so a restarted round replaces only
    # its own partition
    assert [c["mode"] for c in calls] == ["overwrite", "overwrite"]
    assert [c["rows"] for c in calls] == [3, 2]

    got = storage.read_table(str(tmp_path), "docs")
    assert got.num_rows == 5
    # interleaved span structs survive the roundtrip intact
    assert got.schema.field("spans").type == t1.schema.field("spans").type
    assert sorted(got["doc_id"].to_pylist()) == [f"doc{i}" for i in range(5)]
    row = got.to_pylist()[0]
    assert [s["kind"] for s in row["spans"]] == ["text", "media"]


def test_lance_branch_sort_by_applies_before_write(monkeypatch, tmp_path):
    calls: list = []
    fake = _fake_lance_module(calls)
    monkeypatch.setattr(storage, "lance", fake)
    monkeypatch.setattr(storage, "HAVE_LANCE", True)

    t = pa.table({"k": pa.array([3, 1, 2], pa.int64())})
    storage.write_partition(t, str(tmp_path), "tbl", "round=0", sort_by=["k"])
    back = storage.read_table(str(tmp_path), "tbl")
    assert back["k"].to_pylist() == [1, 2, 3]


def test_lance_absent_falls_back_to_parquet(tmp_path):
    """With HAVE_LANCE False (the sandbox default) the same calls produce
    parquet part files — the documented drop-in symmetry."""
    assert storage.HAVE_LANCE is False
    storage.write_partition(_spans_table([7]), str(tmp_path), "docs", "round=0")
    assert os.path.isfile(tmp_path / "docs" / "round=0" / "part-0.parquet")
    assert storage.read_table(str(tmp_path), "docs").num_rows == 1

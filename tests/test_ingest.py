"""Source-format ingest tests (sources/ingest.py): the harmonize cast
contract and the documented JSONL precision caveat. The full round-trip
equality (JSONL documents, CSV events vs the original parquet) runs in the
oracle suite — ingest_jsonl_roundtrip / ingest_csv_roundtrip are oracled
queries."""

import pandas as pd
import pyarrow as pa
import pytest


def test_harmonize_reorders_casts_and_drops_extras(ray_session):
    import ray.data

    from ptt_spider_go_ray.sources.ingest import harmonize

    schema = pa.schema([("a", pa.int64()), ("b", pa.string())])
    # reversed column order, narrower int, plus an extra column to drop
    src = pa.table(
        {"extra": [9, 9], "b": ["x", "y"], "a": pa.array([1, 2], pa.int32())}
    )
    out = pa.concat_tables(
        harmonize(ray.data.from_arrow(src), schema).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    assert out.schema == schema
    assert out["a"].to_pylist() == [1, 2] and out["b"].to_pylist() == ["x", "y"]


def test_harmonize_epoch_seconds_to_timestamp(ray_session):
    import ray.data

    from ptt_spider_go_ray.sources.ingest import harmonize

    schema = pa.schema([("ts", pa.timestamp("us"))])
    src = pa.table({"ts": pa.array([1704067798], pa.int64())})
    out = pa.concat_tables(
        harmonize(ray.data.from_arrow(src), schema).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    assert out["ts"].to_pylist() == [pd.Timestamp("2024-01-01 00:09:58")]


def test_harmonize_missing_column_raises(ray_session):
    import ray.data

    from ptt_spider_go_ray.sources.ingest import harmonize

    schema = pa.schema([("a", pa.int64()), ("missing", pa.string())])
    ds = harmonize(ray.data.from_arrow(pa.table({"a": [1]})), schema)
    with pytest.raises(Exception):  # schema contract: absent column is an error
        ds.materialize()


def test_jsonl_timestamp_precision_caveat(ray_session, tmp_path):
    """Why the timestamped table round-trips through CSV: the JSONL writer
    emits epoch-seconds, so sub-second precision dies. This pins the
    documented caveat (a future lossless writer flips this test)."""
    import ray.data

    from ptt_spider_go_ray.sources.ingest import (
        canonical_schema,
        export_jsonl,
        ingest_jsonl,
    )

    sf = "/root/testdata/sf0.001"
    src = ray.data.read_parquet(f"{sf}/events.parquet")
    out = str(tmp_path / "events_jsonl")
    export_jsonl(src, out)
    back = ingest_jsonl(out, canonical_schema(sf, "events")).to_pandas()
    orig = pd.read_parquet(f"{sf}/events.parquet")
    back = back.sort_values("event_id").reset_index(drop=True)
    orig = orig.sort_values("event_id").reset_index(drop=True)
    assert (back["ts"] == orig["ts"].dt.floor("s")).all()
    assert (orig["ts"].dt.microsecond != 0).any()  # precision genuinely lost
    # every non-timestamp column survives exactly
    for col in ("event_id", "user_id", "event_type", "value", "props"):
        pd.testing.assert_series_equal(back[col], orig[col], check_names=False)


def test_export_partitioned_resume_skips_completed(ray_session, tmp_path):
    """Partition-level resume: a second export is a no-op (no file churn),
    a partition whose _SUCCESS marker is missing — a crashed write — is
    rebuilt alone, and the read-back equals the source either way."""
    import os

    import ray.data

    from ptt_spider_go_ray.sources.ingest import (
        canonical_schema,
        export_partitioned,
        ingest_partitioned,
    )

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "docs_part")
    ds = ray.data.read_parquet(f"{sf}/documents.parquet")

    first = export_partitioned(ds, out, "source")
    assert first  # every partition written on the initial run
    dirs = sorted(d for d in os.listdir(out) if d.startswith("source="))
    assert [d.split("=", 1)[1] for d in dirs] == first

    def snapshot():
        return {
            os.path.join(r, f): os.stat(os.path.join(r, f)).st_mtime_ns
            for r, _, fs in os.walk(out)
            for f in fs
        }

    before = snapshot()
    assert export_partitioned(ds, out, "source") == []  # full skip
    assert snapshot() == before  # zero churn: resume never rewrites

    # simulate a crash in one partition: marker gone → that one rebuilds
    victim = dirs[0]
    os.remove(os.path.join(out, victim, "_SUCCESS"))
    redone = export_partitioned(ds, out, "source")
    assert redone == [victim.split("=", 1)[1]]
    after = snapshot()
    untouched = {k: v for k, v in before.items() if not k.startswith(os.path.join(out, victim))}
    assert {k: after[k] for k in untouched} == untouched

    back = ingest_partitioned(
        out, canonical_schema(sf, "documents"), partition_key="source"
    ).to_pandas()
    orig = ray.data.read_parquet(f"{sf}/documents.parquet").to_pandas()
    back = back.sort_values("doc_id").reset_index(drop=True)
    orig = orig.sort_values("doc_id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(back[orig.columns.tolist()], orig)


def test_export_partitioned_integer_key_roundtrip(ray_session, tmp_path):
    """Hive layout stringifies partition values in dir names; an INTEGER
    partition key must come back as its canonical integer dtype after
    harmonize, and resume must recognize the stringified done-set."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data

    from ptt_spider_go_ray.sources.ingest import (
        export_partitioned,
        harmonize,
        ingest_partitioned,
    )

    schema = pa.schema([("k", pa.int64()), ("v", pa.string())])
    src = pa.table(
        {"k": pa.array([0, 1, 2, 0, 1, 2, 3], pa.int64()),
         "v": pa.array(list("abcdefg"), pa.string())}
    )
    srcp = str(tmp_path / "src.parquet")
    pq.write_table(src, srcp)
    out = str(tmp_path / "by_k")

    ds = ray.data.read_parquet(srcp)
    first = export_partitioned(ds, out, "k")
    assert first == ["0", "1", "2", "3"]
    assert export_partitioned(ds, out, "k") == []  # stringified done-set hits

    back = ingest_partitioned(out, schema, partition_key="k").to_pandas()
    back = back.sort_values(["k", "v"]).reset_index(drop=True)
    orig = src.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    import pandas as pd

    assert back["k"].dtype == orig["k"].dtype == "int64"
    pd.testing.assert_frame_equal(back, orig)


def test_export_partitioned_special_char_values(ray_session, tmp_path):
    """Partition values the hive writer percent-encodes (space, '/', '=',
    '%', unicode) must (a) round-trip back as the ORIGINAL strings and
    (b) hit the done-set on resume — the encoded-dir-vs-raw-value mismatch
    previously made a resumed export double-write those partitions."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data

    from ptt_spider_go_ray.sources.ingest import (
        export_partitioned,
        ingest_partitioned,
    )

    vals = ["a b", "a/b", "a=b", "a%20b", "中文", "plain"]
    schema = pa.schema([("k", pa.string()), ("v", pa.int64())])
    src = pa.table(
        {"k": pa.array(vals * 2, pa.string()),
         "v": pa.array(range(len(vals) * 2), pa.int64())}
    )
    srcp = str(tmp_path / "src.parquet")
    pq.write_table(src, srcp)
    out = str(tmp_path / "by_k")

    ds = ray.data.read_parquet(srcp)
    first = export_partitioned(ds, out, "k")
    assert first == sorted(vals)  # decoded values, not dir suffixes

    # full skip on resume: encoded dirs must match the quoted done-set
    assert export_partitioned(ds, out, "k") == []

    # crash one encoded partition → only that one rebuilds, by decoded name
    victim_dir = next(d for d in os.listdir(out) if d == "k=a%20b")
    os.remove(os.path.join(out, victim_dir, "_SUCCESS"))
    assert export_partitioned(ds, out, "k") == ["a b"]

    back = ingest_partitioned(out, schema, partition_key="k").to_pandas()
    back = back.sort_values("v").reset_index(drop=True)
    orig = src.to_pandas().sort_values("v").reset_index(drop=True)
    pd.testing.assert_frame_equal(back[["k", "v"]], orig)  # 12 rows, not 19


def test_orc_roundtrip_dtype_invisible(ray_session, tmp_path):
    """documents-shaped table through the ORC boundary: values, dtypes and
    column order all survive; multi-block export produces multiple files."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from ptt_spider_go_ray.sources.ingest import export_orc, ingest_orc

    schema = pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()), ("n", pa.int32())]
    )
    src = pa.table(
        {
            "doc_id": pa.array(range(100), pa.int64()),
            "text": pa.array([f"doc {i} 中文" for i in range(100)], pa.string()),
            "n": pa.array(range(100), pa.int32()),
        }
    )
    srcp = str(tmp_path / "src.parquet")
    pq.write_table(src, srcp)
    out = str(tmp_path / "orc_out")

    export_orc(ray.data.read_parquet(srcp, override_num_blocks=4), out)
    assert len(os.listdir(out)) >= 2  # sharded, not one giant file

    back = ingest_orc(out, schema).to_pandas()
    back = back.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, src.to_pandas())

    # idempotent re-export: the dir is cleaned, not appended to
    export_orc(ray.data.read_parquet(srcp, override_num_blocks=2), out)
    back2 = ingest_orc(out, schema).to_pandas()
    assert len(back2) == 100


def test_feather_roundtrip_bit_exact_floats(ray_session, tmp_path):
    """Nested list<float32> through the Feather/IPC boundary must be
    BIT-exact (IPC is lossless) — checked via raw byte comparison."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from ptt_spider_go_ray.sources.ingest import export_feather, ingest_feather

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(50, 8)).astype(np.float32)
    schema = pa.schema(
        [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
    )
    src = pa.table(
        {
            "vec_id": pa.array(range(50), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        }
    )
    srcp = str(tmp_path / "src.parquet")
    pq.write_table(src, srcp)
    out = str(tmp_path / "feather_out")

    export_feather(ray.data.read_parquet(srcp), out)
    back = ingest_feather(out, schema).to_pandas()
    back = back.sort_values("vec_id").reset_index(drop=True)
    got = np.stack(back["embedding"].to_numpy()).astype(np.float32)
    assert got.tobytes() == vecs.tobytes()


def test_wds_roundtrip_unicode_and_empty(ray_session, tmp_path):
    """WebDataset tar boundary: CJK text, empty text, and JSON-null lang
    survive; members are emitted key-adjacent (sample files side by side,
    the property sequential WebDataset readers rely on)."""
    import io
    import tarfile

    import pyarrow.parquet as pq
    import ray.data

    from ptt_spider_go_ray.sources.ingest import export_wds, ingest_wds

    schema = pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()),
         ("lang", pa.string()), ("source", pa.string()),
         ("n_chars", pa.int64())]
    )
    texts = ["中文內容 with mixed ascii", "", "plain"]
    src = pa.table(
        {
            "doc_id": pa.array([3, 7, 11], pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["zh", None, "en"], pa.string()),
            "source": pa.array(["web"] * 3, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    srcp = str(tmp_path / "src.parquet")
    pq.write_table(src, srcp)
    out = str(tmp_path / "wds")

    export_wds(ray.data.read_parquet(srcp), out)
    import glob

    shards = glob.glob(f"{out}/*.tar")
    assert shards
    names = []
    for s in shards:
        with tarfile.open(s) as tar:
            names.extend(m.name for m in tar.getmembers())
    # per-sample adjacency: each key's .json immediately follows its .txt
    for i in range(0, len(names), 2):
        assert names[i].split(".")[0] == names[i + 1].split(".")[0]

    back = ingest_wds(out, schema).to_pandas().sort_values("doc_id")
    orig = src.to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(
        back.reset_index(drop=True), orig.reset_index(drop=True)
    )

"""The `query` CLI subcommand: list mode, run mode (JSON summary line,
parquet out), and the unknown-name suggestion path. Runs inside the pytest
Ray session (the CLI's owns_ray guard must NOT shut down an embedding
session's Ray)."""

import json

import pyarrow.parquet as pq
import ray

from ptt_spider_go_ray.__main__ import main


def test_query_list_marks_oracled(capsys, ray_session):
    assert main(["query", "--list"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert len(out) >= 270
    assert "★ group_counts" in out
    # the KLL sketches are the known rows-only entries
    assert "  approx_quantiles_sketch" in out


def test_query_run_and_parquet_out(capsys, ray_session, tmp_path):
    out_path = str(tmp_path / "res.parquet")
    rc = main([
        "query", "group_counts", "--sf", "/root/testdata/sf0.001",
        "--out", out_path, "--head", "0",
    ])
    assert rc == 0
    assert ray.is_initialized()  # owns_ray guard must not kill our session
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["query"] == "group_counts" and line["oracled"] is True
    assert line["rows"] > 0
    written = pq.read_table(out_path)
    assert written.num_rows == line["rows"]


def test_query_pandas_result_out(capsys, ray_session, tmp_path):
    """A query returning a pandas DataFrame (not a Dataset) also writes."""
    out_path = str(tmp_path / "pca.parquet")
    rc = main([
        "query", "pca_power_topk", "--sf", "/root/testdata/sf0.001",
        "--out", out_path, "--head", "0",
    ])
    assert rc == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["rows"] == 10
    assert pq.read_table(out_path).num_rows == 10


def test_query_unknown_suggests(capsys, ray_session):
    assert main(["query", "group_countz"]) == 2
    err = capsys.readouterr().err
    assert "group_counts" in err

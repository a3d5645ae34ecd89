"""Thin storage layer (SURVEY §7.1): the engine targets Lance tables of
interleaved documents (north rule), but the sandbox has no ``lance`` wheel —
so every sink goes through this interface with a Parquet backend, and a Lance
backend drops in via ``pip install pylance`` with no caller changes.

Layout contract (resumable output): one directory per partition
(``<root>/<table>/round=<epoch>/part-*.parquet``) so a restarted run
overwrites only its own partition — never one giant file.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - lance absent in this sandbox
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False


def write_partition(table: pa.Table, root: str, name: str, partition: str,
                    part: int = 0) -> str:
    """Write one part file of a logical table partition; returns the
    partition dir. ``part`` distinguishes concurrent per-block writers
    within one partition (worker-side sinks write part-<i> in parallel)."""
    d = os.path.join(root, name, partition)
    os.makedirs(d, exist_ok=True)
    if HAVE_LANCE:  # pragma: no cover
        lance.write_dataset(table, os.path.join(d, f"part-{part}.lance"), mode="overwrite")
    else:
        pq.write_table(table, os.path.join(d, f"part-{part}.parquet"))
    return d


def read_table(root: str, name: str) -> pa.Table | None:
    """Read all partitions of a logical table back into one Arrow table."""
    base = os.path.join(root, name)
    if not os.path.isdir(base):
        return None
    tables = []
    for part in sorted(os.listdir(base)):
        d = os.path.join(base, part)
        for f in sorted(os.listdir(d)):
            if HAVE_LANCE and f.endswith(".lance"):  # pragma: no cover
                tables.append(lance.dataset(os.path.join(d, f)).to_table())
            elif f.endswith(".parquet"):
                tables.append(pq.read_table(os.path.join(d, f)))
    return pa.concat_tables(tables) if tables else None


def read_dataset(root: str, name: str):
    """Streaming read of a logical table as a Ray Dataset."""
    import ray.data

    return ray.data.read_parquet(os.path.join(root, name))

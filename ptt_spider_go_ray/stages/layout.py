"""Output layout: directory naming with cross-article collision suffixing
(T4/D4, crawler/crawler.go:545,562-585) re-expressed as a keyed groupby.

The reference resolves collisions through a mutex-protected map in arrival
order (racy across workers); here the key is ``(board, clean_title_push)``
and suffixes are assigned in crawl-sequence (`seq`) order — deterministic,
and equal to the reference's per-key FIFO intent. Same URL re-processed ⇒
same dir (idempotent), different article with a taken name ⇒ ``_2``, ``_3``….

This is one of the engine's few shuffles; it moves only
(dir_key, doc_id, url, seq) rows.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions.parse import clean_file_name, unique_dir_names


def add_dir_key_batch(tbl: pa.Table) -> pa.Table:
    """Append the collision key column: ``clean(title)_push`` (crawler.go:545)."""
    titles = tbl["title"].to_pylist()
    pushes = tbl["push_rate"].to_pylist()
    keys = [f"{clean_file_name(t or '')}_{p}" for t, p in zip(titles, pushes)]
    return tbl.append_column("dir_key", pa.array(keys, pa.string()))


def assign_dirs_group(g: pd.DataFrame) -> pd.DataFrame:
    """Per (board, dir_key) group: ordered suffix assignment by seq."""
    g = g.sort_values("seq").reset_index(drop=True)
    names = unique_dir_names(list(zip(g["dir_key"], g["url"])))
    g["save_dir"] = [f"{b}/{n}" for b, n in zip(g["board"], names)]
    return g


def assign_layout(docs_ds):
    """Dataset of document rows → same rows + ``save_dir`` column.

    ``docs_ds`` must carry title, push_rate, board, url, seq columns.
    """
    ds = docs_ds.map_batches(add_dir_key_batch, batch_format="pyarrow")
    return ds.groupby(["board", "dir_key"]).map_groups(
        assign_dirs_group, batch_format="pandas"
    )

"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship interleaved-span pipeline on sf0.001;
``queries()`` exposes every implemented operator/pipeline from SURVEY.md §2
(plus the training-data extensions); ``oracle_sql()`` gives the DuckDB
equivalent where the op is SQL-expressible. Ray is initialised by the driver
before import — nothing here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents → interleaved
    spans → normalize (per-doc media dedup) → span stats → markdown render."""
    from ptt_spider_go_ray.pipelines.flagship import flagship

    ds = flagship("/root/testdata/sf0.001")
    # spans is a list<struct> column; project to a stable flat schema for the
    # driver's smoke check while keeping the full pipeline exercised.
    return ds.select_columns(
        ["doc_id", "n_spans", "n_media", "n_text", "n_text_chars", "markdown"]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from ptt_spider_go_ray.queries import SQL_QUERIES
    from ptt_spider_go_ray.registry import EXTRA_QUERIES

    out: dict[str, Callable[[str], Any]] = {
        name: fn for name, (fn, _sql) in SQL_QUERIES.items()
    }
    out.update(EXTRA_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    from ptt_spider_go_ray.queries import SQL_QUERIES
    from ptt_spider_go_ray.registry import EXTRA_ORACLES

    out = {name: sql for name, (_fn, sql) in SQL_QUERIES.items()}
    # derived oracles (VALUES literals built by a plain-Python computation)
    # are registered as callables — resolve them here
    out.update({n: s() if callable(s) else s for n, s in EXTRA_ORACLES.items()})
    return out

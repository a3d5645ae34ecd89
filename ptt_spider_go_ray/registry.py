"""Registry of non-SQL-expressible pipelines (driver records rows-only
checks for these; exact semantics are verified by pytest instead — see
tests/test_crawl_e2e.py and tests/test_extensions.py)."""

from __future__ import annotations

import functools
from collections.abc import Callable
from typing import Any


def _flagship_spans(sf_dir: str):
    from .pipelines.flagship import flagship

    return flagship(sf_dir).select_columns(
        ["doc_id", "n_spans", "n_media", "n_text", "n_text_chars"]
    )


def _explode_media(sf_dir: str):
    from .sources.spans_source import read_span_documents
    from .stages.spans import explode_media_batch, normalize_spans_batch

    ds = read_span_documents(sf_dir)
    ds = ds.map_batches(normalize_spans_batch, batch_format="pyarrow")
    return ds.map_batches(explode_media_batch, batch_format="pyarrow")


def _crawl_board(sf_dir: str):
    """Full crawl loop on the deterministic synthetic site (sf_dir unused —
    the site is its own deterministic input). Returns the document table."""
    from .config import Config
    from .pipelines.crawl import run_crawl
    from .sources.synthetic import SiteSpec, mock_transport_factory

    spec = SiteSpec(boards={"Beauty": 4}, articles_per_page=6)
    cfg = Config()
    cfg.crawler.frontier_shards = 4
    cfg.crawler.batch_urls = 4096
    cfg.crawler.parser_count = 4
    cfg.crawler.robots = False
    res = run_crawl(
        cfg,
        transport_factory=functools.partial(mock_transport_factory, spec),
        board="Beauty",
        pages=3,
        push_threshold=10,
        fetch_via="tasks",
    )
    return res.docs


def _crawl_media_decode(sf_dir: str):
    """Crawl media bytes → multimodal decode stage (stubbed backend)."""
    import ray.data

    from .config import Config
    from .pipelines.crawl import run_crawl
    from .sources.synthetic import SiteSpec, mock_transport_factory
    from .stages.multimodal import ImageDecoder

    spec = SiteSpec(boards={"Beauty": 3}, articles_per_page=5)
    cfg = Config()
    cfg.crawler.frontier_shards = 4
    cfg.crawler.batch_urls = 4096
    cfg.crawler.parser_count = 4
    cfg.crawler.robots = False
    res = run_crawl(
        cfg,
        transport_factory=functools.partial(mock_transport_factory, spec),
        board="Beauty",
        pages=2,
        push_threshold=0,
        fetch_via="tasks",
    )
    media = ray.data.from_arrow(res.media.rename_columns(
        [c if c != "url" else "media_ref" for c in res.media.column_names]
    ))
    return media.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"backend": "fake"},
        concurrency=(1, 2),
        batch_size=32,
        batch_format="pyarrow",
    )


def _crawl_layout(sf_dir: str):
    """Crawl docs → dir-collision layout assignment (T4/D4 groupby)."""
    import ray.data

    from .stages.layout import assign_layout

    docs = _crawl_board(sf_dir).drop_columns(["spans"])
    return assign_layout(ray.data.from_arrow(docs))


def _dedup_minhash(sf_dir: str):
    from .pipelines.dedup import minhash_lsh_candidates

    return minhash_lsh_candidates(sf_dir)


def _dedup_simhash(sf_dir: str):
    from .pipelines.dedup import simhash_near_dups

    return simhash_near_dups(sf_dir)


def _dedup_ngram(sf_dir: str):
    from .pipelines.dedup import ngram_jaccard_dups

    return ngram_jaccard_dups(sf_dir, threshold=0.9)


def _dedup_embedding(sf_dir: str):
    from .pipelines.dedup import embedding_cosine_dups

    return embedding_cosine_dups(sf_dir, threshold=0.3)


def _ann_ivf(sf_dir: str):
    from .pipelines.similarity import ivf_topk

    return ivf_topk(sf_dir, n_queries=5, k=10)


def _lang_id(sf_dir: str):
    from .pipelines.textanalysis import lang_id

    return lang_id(sf_dir)


def _quality_scores(sf_dir: str):
    from .pipelines.textanalysis import quality_scores

    return quality_scores(sf_dir)


def _token_counts(sf_dir: str):
    from .pipelines.textanalysis import token_counts_bpe

    return token_counts_bpe(sf_dir)


def _fingerprints(sf_dir: str):
    from .pipelines.textanalysis import fingerprints

    return fingerprints(sf_dir)


def _approx_distinct_users(sf_dir: str):
    """HLL sketch COUNT(DISTINCT) — approximate, so rows-only (pytest asserts
    <10% error vs exact)."""
    import pandas as pd
    import ray.data

    from .stages.sketch import approx_distinct

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    est = approx_distinct(ds, "user_id", p=12)
    return pd.DataFrame({"n_users_approx": [int(round(est))]})


def _render_markdown(sf_dir: str):
    from .pipelines.flagship import flagship

    return flagship(sf_dir, render=True).select_columns(["doc_id", "markdown"])


EXTRA_QUERIES: dict[str, Callable[[str], Any]] = {
    "flagship_spans": _flagship_spans,
    "explode_media": _explode_media,
    "crawl_board": _crawl_board,
    "crawl_media_decode": _crawl_media_decode,
    "crawl_layout": _crawl_layout,
    "dedup_minhash_lsh": _dedup_minhash,
    "dedup_simhash": _dedup_simhash,
    "dedup_ngram_jaccard": _dedup_ngram,
    "dedup_embedding_cosine": _dedup_embedding,
    "ann_ivf_topk": _ann_ivf,
    "lang_id": _lang_id,
    "quality_scores": _quality_scores,
    "token_counts_bpe": _token_counts,
    "fingerprints": _fingerprints,
    "approx_distinct_users": _approx_distinct_users,
    "render_markdown": _render_markdown,
}


def _crawl_file_mode(sf_dir: str):
    """File-mode crawl (S2): deterministic seed lines from the synthetic
    site; titles resolved from article content (P8)."""
    from .config import Config
    from .pipelines.crawl import run_crawl
    from .sources.synthetic import SiteSpec, SyntheticSite, mock_transport_factory

    spec = SiteSpec(boards={"Beauty": 4, "Joke": 3}, articles_per_page=6)
    site = SyntheticSite(spec)
    lines = [
        site.article_url("Beauty", 2, 1),
        "# comment line",
        site.article_url("Joke", 1, 2),
        site.article_url("Beauty", 3, 4),
        "https://other.host/bbs/Beauty/x.html",
    ]
    cfg = Config()
    cfg.crawler.frontier_shards = 4
    cfg.crawler.batch_urls = 4096
    cfg.crawler.robots = False
    res = run_crawl(
        cfg,
        transport_factory=functools.partial(mock_transport_factory, spec),
        file_lines=lines,
        board="beauty",
        fetch_via="tasks",
        fetch_media=False,
    )
    return res.docs


EXTRA_QUERIES["crawl_file_mode"] = _crawl_file_mode

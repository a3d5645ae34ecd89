"""Text-analysis pipelines: language-ID, quality scoring, BPE-ish token
counting, rolling-hash fingerprinting — streaming map_batches over
``documents`` (training-data extensions; scalar fns in functions/text.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.text import (
    bpe_token_count,
    detect_lang,
    quality_score,
    rolling_fingerprint,
)


def _docs(sf_dir: str, columns):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def lang_id(sf_dir: str):
    """Heuristic language ID + agreement flag vs the table's labeled lang."""
    ds = _docs(sf_dir, ["doc_id", "text", "lang"])

    def detect(df: pd.DataFrame) -> pd.DataFrame:
        pred = [detect_lang(t or "") for t in df["text"]]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "lang": df["lang"],
                "pred_lang": pred,
                "agree": np.array(
                    [p == l for p, l in zip(pred, df["lang"])], dtype=bool
                ),
            }
        )

    return ds.map_batches(detect, batch_format="pandas")


def quality_scores(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        rows = [quality_score(t or "") for t in df["text"]]
        out = pd.DataFrame(rows)
        out.insert(0, "doc_id", df["doc_id"].to_numpy())
        return out

    return ds.map_batches(score, batch_format="pandas")


def token_counts_bpe(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text"])

    def count(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_ws_tokens": df["text"].fillna("").str.split().str.len().astype("int64"),
                "n_bpe_tokens": np.array(
                    [bpe_token_count(t or "") for t in df["text"]], dtype=np.int64
                ),
            }
        )

    return ds.map_batches(count, batch_format="pandas")


def fingerprints(sf_dir: str):
    ds = _docs(sf_dir, ["doc_id", "text"])

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "rolling_fp": np.array(
                    [rolling_fingerprint(t or "") for t in df["text"]], dtype=np.uint64
                ),
            }
        )

    return ds.map_batches(fp, batch_format="pandas")

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


def compression_ratio(sf_dir: str):
    """zlib compressibility per document — the Gopher/RefinedWeb quality
    proxy (near-1 ratio → high-entropy or already-compressed junk; near-0 →
    templated/repetitive boilerplate). Streaming map_batches, CPU-bound per
    batch, no shuffle; zlib level 6 fixed so results are deterministic.
    DuckDB has no zlib, so the oracle is the pytest plain-Python replay
    (driver sees rows-only) — the ratio itself is ONE int64/int64 division
    for bit-stable comparison."""
    import zlib

    ds = _docs(sf_dir, ["doc_id", "text"])

    def ratio(df: pd.DataFrame) -> pd.DataFrame:
        raw = [(t or "").encode("utf-8") for t in df["text"]]
        n_raw = np.array([len(b) for b in raw], dtype=np.int64)
        n_comp = np.array(
            [len(zlib.compress(b, 6)) for b in raw], dtype=np.int64
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_raw_bytes": n_raw,
                "n_comp_bytes": n_comp,
                "compression_ratio": np.where(
                    n_raw > 0, n_comp / np.maximum(n_raw, 1), 1.0
                ),
            }
        )

    return ds.map_batches(ratio, batch_format="pandas")


def compression_ensemble(sf_dir: str):
    """Per-document compressed sizes under three stdlib codecs (zlib-6,
    bz2-9, lzma preset 1) — the multi-estimator upper bound on entropy that
    single-codec ratios misjudge (LZ77 vs BWT vs LZMA window effects).
    Streaming map_batches, no shuffle; all outputs exact ints."""
    import bz2
    import lzma
    import zlib

    ds = _docs(sf_dir, ["doc_id", "text"])

    def sizes(df: pd.DataFrame) -> pd.DataFrame:
        raw = [(t or "").encode("utf-8") for t in df["text"]]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_raw_bytes": np.array([len(b) for b in raw], np.int64),
                "n_zlib": np.array(
                    [len(zlib.compress(b, 6)) for b in raw], np.int64
                ),
                "n_bz2": np.array(
                    [len(bz2.compress(b, 9)) for b in raw], np.int64
                ),
                "n_lzma": np.array(
                    [len(lzma.compress(b, preset=1)) for b in raw], np.int64
                ),
            }
        )

    return ds.map_batches(sizes, batch_format="pandas")


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


# ---------------------------------------------------------------------------
# BPE tokenizer training (Sennrich et al. 2016, "Neural Machine Translation
# of Rare Words with Subword Units") — the Ray-native decomposition:
#
#   pass 1 (corpus-sized, distributed): word-frequency count — per-batch
#     exact-int partials → groupby sum. The ONLY stage that touches every
#     document; everything after runs over the UNIQUE-word table, which
#     Heaps' law keeps sublinear in corpus size (~O(corpus^0.5)).
#   merge loop (unique-word-sized, distributed, K rounds): each round is
#     [vectorized pair-count partials per block → tiny take_all + driver
#     argmax (the collision-rank pattern: the PAIR space is bounded by the
#     growing vocab, not by rows) → broadcast (a,b)→new_id merge rule →
#     vectorized greedy-leftmost apply → materialize]. Symbols are int32
#     ids in Arrow list columns, flattened zero-copy for both kernels — no
#     per-word Python anywhere in the loop.
#
# Greedy leftmost non-overlapping application (the "aaaa" + (a,a) → [A,A]
# case) is resolved vectorized by run-parity: consecutive match positions
# can only occur when a == b, and within each run of consecutive matches
# exactly the even offsets survive. Pytest oracle: plain-Python BPE over
# the same word-frequency dict (tests/test_extensions.py).
# ---------------------------------------------------------------------------

_BPE_NEW_BASE = 0x110000  # first merged-symbol id (above any codepoint)


def _bpe_word_syms(sf_dir: str):
    """Distributed (freq, syms) table: unique [a-z]+ words as int32
    codepoint lists with their corpus frequencies."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["text"])

    def wc_partial(df: pd.DataFrame) -> pa.Table:
        toks = df["text"].fillna("").str.lower().str.findall(r"[a-z]+")
        flat = [w for lst in toks for w in lst]
        if not flat:
            return pa.table({"word": pa.array([], pa.string()),
                             "f": pa.array([], pa.int64())})
        words, counts = np.unique(np.array(flat, dtype=object), return_counts=True)
        return pa.table({"word": pa.array(words.astype(str)),
                         "f": pa.array(counts.astype(np.int64))})

    wf = (
        ds.map_batches(wc_partial, batch_format="pandas", batch_size=65536)
        .groupby("word")
        .aggregate(Sum("f", alias_name="f"))
    )

    def to_syms(t: pa.Table) -> pa.Table:
        words = t["word"].to_pylist()
        if not words:
            return pa.table(
                {"f": pa.array([], pa.int64()),
                 "syms": pa.array([], pa.list_(pa.int32()))}
            )
        joined = "\x00".join(words)
        cp = np.frombuffer(joined.encode("utf-32-le"), np.uint32).astype(np.int32)
        lens = np.fromiter((len(w) for w in words), np.int64, count=len(words))
        mask = np.ones(len(cp), bool)
        if len(words) > 1:
            mask[np.cumsum(lens + 1)[:-1] - 1] = False
        vals = cp[mask]
        offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        syms = pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                        pa.array(vals, pa.int32()))
        return pa.table({"f": t["f"].combine_chunks().cast(pa.int64()),
                         "syms": syms})

    return wf.map_batches(to_syms, batch_format="pyarrow")


def _flatten_syms(t: pa.Table):
    """Zero-copy flatten of the syms list column → (values, offsets, freqs,
    word-index-per-value)."""
    la = t["syms"].combine_chunks()
    vals = la.values.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offs)
    f = t["f"].to_numpy(zero_copy_only=False)
    widx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    return vals, lens, f, widx


def _pair_partial(t: pa.Table) -> pa.Table:
    vals, lens, f, widx = _flatten_syms(t)
    if len(vals) < 2:
        return pa.table({"k": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    ok = widx[:-1] == widx[1:]
    keys = (vals[:-1] << 32) | vals[1:]
    w = np.repeat(f, lens)[:-1]
    uk, inv = np.unique(keys[ok], return_inverse=True)
    cnt = np.bincount(inv, weights=w[ok]).astype(np.int64)
    return pa.table({"k": pa.array(uk), "n": pa.array(cnt)})


def _make_apply(a: int, b: int, new_id: int):
    def apply(t: pa.Table) -> pa.Table:
        vals, lens, f, widx = _flatten_syms(t)
        if len(vals) < 2:
            return t
        m = (vals[:-1] == a) & (vals[1:] == b) & (widx[:-1] == widx[1:])
        idx = np.flatnonzero(m)
        if len(idx):
            # greedy leftmost: within each run of CONSECUTIVE match
            # positions (only possible when a == b) keep even offsets
            run_start = np.ones(len(idx), bool)
            run_start[1:] = np.diff(idx) > 1
            starts = idx[np.flatnonzero(run_start)][
                np.cumsum(run_start) - 1
            ]
            kept = idx[((idx - starts) % 2) == 0]
        else:
            kept = idx
        out = vals.copy()
        out[kept] = new_id
        keep_mask = np.ones(len(vals), bool)
        keep_mask[kept + 1] = False
        new_vals = out[keep_mask].astype(np.int32)
        dec = np.bincount(widx[kept], minlength=len(lens)) if len(kept) else \
            np.zeros(len(lens), np.int64)
        new_lens = lens - dec
        new_offs = np.concatenate([[0], np.cumsum(new_lens)]).astype(np.int32)
        syms = pa.ListArray.from_arrays(pa.array(new_offs, pa.int32()),
                                        pa.array(new_vals, pa.int32()))
        return pa.table({"f": t["f"], "syms": syms})

    return apply


def bpe_merges(sf_dir: str, n_merges: int = 6) -> pa.Table:
    """Run K BPE merge rounds; returns (step:int64, token:string,
    pair_n:int64) — the learned merge rules with their corpus pair counts.
    Deterministic: argmax tie-break is (count desc, pair key asc)."""
    ds = _bpe_word_syms(sf_dir).materialize()
    tok: dict[int, str] = {}

    def tok_str(sym: int) -> str:
        return tok[sym] if sym >= _BPE_NEW_BASE else chr(sym)

    steps, tokens, counts = [], [], []
    for step in range(n_merges):
        parts = ds.map_batches(
            _pair_partial, batch_format="pyarrow", batch_size=65536
        ).to_pandas()
        if not len(parts):
            break
        tot = parts.groupby("k")["n"].sum()
        best_n = int(tot.max())
        if best_n < 2:
            break
        cand = tot[tot == best_n].index.to_numpy()
        key = int(cand.min())
        a, b = key >> 32, key & 0xFFFFFFFF
        new_id = _BPE_NEW_BASE + step
        tok[new_id] = tok_str(a) + tok_str(b)
        steps.append(step)
        tokens.append(tok[new_id])
        counts.append(best_n)
        ds = ds.map_batches(
            _make_apply(a, b, new_id), batch_format="pyarrow"
        ).materialize()
    return pa.table(
        {
            "step": pa.array(steps, pa.int64()),
            "token": pa.array(tokens, pa.string()),
            "pair_n": pa.array(counts, pa.int64()),
        }
    )

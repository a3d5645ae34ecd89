"""Ray Data dedup pipelines over the ``documents`` table (training-data
extensions). Each returns a Dataset; the ``queries()`` registry exposes them,
with DuckDB oracles where exact semantics are SQL-expressible.

Scale shape: signature pass = streaming map_batches (stateful actor pool for
the MinHasher); the only shuffle is the groupby on band/bucket keys carrying
(key, doc_id [, signature]) — documents never move.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.dedup import (
    MinHasher,
    minhash_jaccard,
    ngram_jaccard,
    simhash_batch,
    simhash_block_keys,
)


def _docs(sf_dir: str, columns=("doc_id", "text")):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


def minhash_lsh_candidates(sf_dir: str, n_perm: int = 64, n_bands: int = 16):
    """documents → minhash signatures (actor pool) → band explode →
    groupby(band_key) → candidate pairs with signature-estimated Jaccard.
    Returns one row per candidate pair (a < b) with est_jaccard."""
    ds = _docs(sf_dir)
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"n_perm": n_perm},
        concurrency=(1, 4),
        batch_format="pyarrow",
    )
    banded = sigs.map_batches(
        lambda t: _band_with_sig(t, n_bands), batch_format="pyarrow"
    )

    # Shuffle on a COARSE bucket (hash(band_key) % 256) instead of the raw
    # band_key: band keys are mostly singletons, and map_groups pays ~1 ms of
    # Python per group — 80k tiny groups would dominate wall time. Within a
    # bucket, pandas' C-level groupby walks the per-key runs.
    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, grp in g.groupby("band_key", sort=False):
            if len(grp) < 2:
                continue
            grp = grp.sort_values("doc_id")
            ids = grp["doc_id"].tolist()
            sig_list = [np.array(s, dtype=np.uint64) for s in grp["minhash"].tolist()]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    rows.append((ids[i], ids[j], minhash_jaccard(sig_list[i], sig_list[j])))
        if not rows:
            return pd.DataFrame(
                {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"),
                 "est_jaccard": pd.Series(dtype="float64")}
            )
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "est_jaccard"])

    cand = banded.groupby("bucket").map_groups(pairs_in_bucket, batch_format="pandas")

    # same pair can surface from multiple bands → exact dedup (tiny result)
    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["doc_a", "doc_b"])

    return cand.repartition(1).map_batches(dedup_pairs, batch_format="pandas")


def _band_with_sig(t: pa.Table, n_bands: int) -> pa.Table:
    """Band explode keeping the signature on each row (needed for in-group
    estimation without a second join)."""
    from ..stages.dedup import lsh_band_keys

    doc_ids, keys, sigs = [], [], []
    for doc_id, sig in zip(t["doc_id"].to_pylist(), t["minhash"].to_pylist()):
        arr = np.array(sig, dtype=np.uint64)
        for key in lsh_band_keys(arr, n_bands):
            doc_ids.append(doc_id)
            keys.append(key)
            sigs.append(sig)
    keys_arr = np.asarray(keys, dtype=object)
    buckets = (pd.util.hash_array(keys_arr) % 256).astype(np.int64)
    return pa.table(
        {
            "bucket": pa.array(buckets),
            "band_key": pa.array(keys, pa.string()),
            "doc_id": pa.array(doc_ids),
            "minhash": pa.array(sigs, pa.list_(pa.uint64())),
        }
    )


def simhash_near_dups(sf_dir: str, max_hamming: int = 3):
    """documents → simhash → block-key explode → groupby(block) → verified
    pairs with exact Hamming distance ≤ max_hamming."""
    from ..stages.dedup import hamming64

    ds = _docs(sf_dir)
    sh = ds.map_batches(simhash_batch, batch_format="pyarrow")

    def explode(t: pa.Table) -> pa.Table:
        doc_ids, keys, hashes = [], [], []
        for doc_id, h in zip(t["doc_id"].to_pylist(), t["simhash"].to_pylist()):
            for key in simhash_block_keys(int(h), n_blocks=4):
                doc_ids.append(doc_id)
                keys.append(key)
                hashes.append(h)
        buckets = (pd.util.hash_array(np.asarray(keys, dtype=object)) % 256).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(buckets),
                "block_key": pa.array(keys, pa.string()),
                "doc_id": pa.array(doc_ids),
                "simhash": pa.array(hashes, pa.uint64()),
            }
        )

    # coarse-bucket shuffle + in-bucket pandas groupby (see minhash pipeline)
    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, grp in g.groupby("block_key", sort=False):
            if len(grp) < 2:
                continue
            grp = grp.sort_values("doc_id")
            ids = grp["doc_id"].tolist()
            hs = [int(h) for h in grp["simhash"].tolist()]
            rows.extend(
                (ids[i], ids[j], hamming64(hs[i], hs[j]))
                for i in range(len(ids))
                for j in range(i + 1, len(ids))
                if hamming64(hs[i], hs[j]) <= max_hamming
            )
        if not rows:
            return pd.DataFrame(
                {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"),
                 "hamming": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])

    cand = sh.map_batches(explode, batch_format="pyarrow").groupby("bucket").map_groups(
        pairs_in_bucket, batch_format="pandas"
    )

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["doc_a", "doc_b"])

    return cand.repartition(1).map_batches(dedup_pairs, batch_format="pandas")


def ngram_jaccard_dups(sf_dir: str, threshold: float = 0.8, k: int = 3,
                       bucket_w: int = 16):
    """Exact n-gram-Jaccard near-dup detection: bucket by token-count range,
    verify exactly within buckets. Each doc lands in TWO half-shifted buckets
    (n//W and (n+W//2)//W offset lane) so pairs straddling a bucket boundary
    still meet when their token counts differ by ≤ W/2; pairs with a larger
    length gap can be missed (at jaccard ≥ 0.8 and W=16 the token-count gap
    of a reported pair is ≤ ~11% of length, so W/2=8 covers docs ≲ 70
    tokens exactly and longer docs heuristically — widen W for longer docs).
    Duplicate pair reports from the two lanes are deduped at the end."""
    ds = _docs(sf_dir)

    def keyed(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        nt = [len((x or "").split()) for x in texts]
        keys, doc_ids, out_texts = [], [], []
        for n, doc_id, text in zip(nt, t["doc_id"].to_pylist(), texts):
            keys.append(f"a{n // bucket_w}")
            doc_ids.append(doc_id)
            out_texts.append(text)
            keys.append(f"b{(n + bucket_w // 2) // bucket_w}")
            doc_ids.append(doc_id)
            out_texts.append(text)
        return pa.table(
            {
                "len_key": pa.array(keys, pa.string()),
                "doc_id": pa.array(doc_ids),
                "text": pa.array(out_texts),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"), "jaccard": pd.Series(dtype="float64")})
        g = g.sort_values("doc_id")
        ids, texts = g["doc_id"].tolist(), g["text"].tolist()
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                jac = ngram_jaccard(texts[i] or "", texts[j] or "", k)
                if jac >= threshold:
                    rows.append((ids[i], ids[j], jac))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])

    cand = ds.map_batches(keyed, batch_format="pyarrow").groupby("len_key").map_groups(
        pairs, batch_format="pandas"
    )

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["doc_a", "doc_b"])

    return cand.repartition(1).map_batches(dedup_pairs, batch_format="pandas")


def embedding_cosine_dups(sf_dir: str, threshold: float = 0.95, n_lsh_bits: int = 8):
    """Embedding near-dup via random-hyperplane LSH bucketing + exact cosine
    verification within buckets (the scale path: buckets shuffle only
    (bucket, id, vector))."""
    import ray
    import ray.data

    rng = np.random.default_rng(11)
    planes_ref = None  # set after reading dim

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    first = ds.take(1)
    dim = len(first[0]["embedding"])
    planes = rng.standard_normal((dim, n_lsh_bits))
    planes_ref = ray.put(planes)

    def bucket(t: pa.Table, pref=planes_ref) -> pa.Table:
        p = ray.get(pref) if isinstance(pref, ray.ObjectRef) else pref
        mat = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
        bits = (mat @ p) > 0
        keys = (bits * (1 << np.arange(n_lsh_bits))).sum(axis=1)
        return pa.table(
            {
                "bucket": pa.array(keys.astype(np.int64)),
                "vec_id": t["vec_id"],
                "embedding": t["embedding"],
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"vec_a": pd.Series(dtype="int64"), "vec_b": pd.Series(dtype="int64"), "cos": pd.Series(dtype="float64")})
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        mat = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        from ..stages.dedup import cosine_dup_pairs

        rows = cosine_dup_pairs(ids, mat, threshold)
        return pd.DataFrame(rows, columns=["vec_a", "vec_b", "cos"])

    return ds.map_batches(bucket, batch_format="pyarrow").groupby("bucket").map_groups(
        pairs, batch_format="pandas"
    )

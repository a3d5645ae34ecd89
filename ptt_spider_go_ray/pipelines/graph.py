"""Distributed PageRank over a doc-link graph (training-data extension).

The graph is derived deterministically from the ``documents`` table: within
each lang, consecutive doc_ids (sorted) form a directed chain edge — the same
derived-graph discipline as ``q_cc_label_clusters`` (no synthetic inputs).

Execution shape — the third iterative pattern in the repo, distinct from both
k-means (broadcast centroids, per-batch matmul) and CC label propagation
(per-round bucketed joins): the EDGE SET stays distributed and static
(materialized once); every power-iteration round broadcasts the rank vector
(``ray.put``), each edge block emits per-batch PARTIAL contribution sums via
one ``np.add.at``, and the driver reduces O(blocks) partials into the next
vector. Per-round driver state is O(nodes) floats — the same documented
broadcast bound as CC's label map (``pipelines/dedup.py``); past that bound
the CC-style bucketed-join propagation is the scale path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def chain_edges(sf_dir: str):
    """Dataset[(src, dst)] of per-lang consecutive-doc_id chain edges,
    built without a per-group materialization: distributed sort by
    (lang, doc_id) → per-block within-block pairs (vectorized) + O(blocks)
    driver-stitched boundary pairs."""
    import ray
    import ray.data

    ds = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
        .sort(["lang", "doc_id"])
        .materialize()
    )
    refs = [br for b in ds.iter_internal_ref_bundles() for br in b.block_refs]

    @ray.remote
    def block_pairs(t: pa.Table):
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lang = np.asarray(t["lang"].to_pylist(), dtype=object)
        same = lang[:-1] == lang[1:]
        tbl = pa.table(
            {"src": pa.array(ids[:-1][same]), "dst": pa.array(ids[1:][same])}
        )
        ends = (str(lang[0]), int(ids[0]), str(lang[-1]), int(ids[-1])) if len(ids) else None
        return tbl, ends

    out = [ray.get(block_pairs.remote(r)) for r in refs]
    tables = [t for t, _ in out]
    ends = [e for _, e in out if e is not None]
    # boundary edges between consecutive non-empty blocks (sorted order)
    b_src, b_dst = [], []
    for (_l0, _i0, last_lang, last_id), (first_lang, first_id, _l1, _i1) in zip(
        ends, ends[1:]
    ):
        if last_lang == first_lang:
            b_src.append(last_id)
            b_dst.append(first_id)
    if b_src:
        tables.append(
            pa.table({"src": pa.array(b_src, pa.int64()), "dst": pa.array(b_dst, pa.int64())})
        )
    return ray.data.from_arrow(tables)


_PR_BROADCAST_MAX = 50_000_000  # nodes; past this use CC-style bucketed joins


def pagerank(sf_dir: str, damping: float = 0.85, iters: int = 10):
    """Dataset[(doc_id, rank)] — power iteration with uniform dangling-mass
    redistribution. Deterministic; a pytest replays the identical rounds in
    dense numpy and asserts elementwise equality."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    node_ids = np.sort(
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])["doc_id"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    n = len(node_ids)
    assert n <= _PR_BROADCAST_MAX, "past the broadcast bound: use bucketed joins"
    edges = chain_edges(sf_dir).materialize()
    erefs = [br for b in edges.iter_internal_ref_bundles() for br in b.block_refs]

    # out-degree: one pass over edge blocks (tiny partials)
    outdeg = np.zeros(n, dtype=np.int64)

    @ray.remote
    def block_outdeg(t: pa.Table, ids):
        idx = np.searchsorted(ids, t["src"].to_numpy(zero_copy_only=False))
        d = np.zeros(len(ids), dtype=np.int64)
        np.add.at(d, idx, 1)
        return d

    ids_ref = ray.put(node_ids)
    for d in ray.get([block_outdeg.remote(r, ids_ref) for r in erefs]):
        outdeg += d

    rank = np.full(n, 1.0 / n)
    for _ in range(iters):
        share = np.zeros(n)
        nz = outdeg > 0
        share[nz] = rank[nz] / outdeg[nz]
        sref = ray.put(share)

        @ray.remote
        def block_contrib(t: pa.Table, ids, sref_inner):
            s = sref_inner
            src = np.searchsorted(ids, t["src"].to_numpy(zero_copy_only=False))
            dst = np.searchsorted(ids, t["dst"].to_numpy(zero_copy_only=False))
            c = np.zeros(len(ids))
            np.add.at(c, dst, s[src])
            return c

        contrib = np.zeros(n)
        for c in ray.get([block_contrib.remote(r, ids_ref, sref) for r in erefs]):
            contrib += c
        dangling = float(rank[~nz].sum())
        rank = (1.0 - damping) / n + damping * (contrib + dangling / n)

    out = pa.table({"doc_id": pa.array(node_ids), "rank": pa.array(rank)})
    return ray.data.from_arrow(out)


# ---------------------------------------------------------------------------
# K-hop BFS neighborhood (the GNN-sampling / graph-exploration shape): min
# hop distance (capped at K) from a seed set over a derived arithmetic doc
# graph — i -> i+1 chain edges plus i -> 2i doubling shortcuts, so distances
# are non-trivial (not rank arithmetic). The FIRST oracled iterative
# operator: DuckDB verifies it with a WITH RECURSIVE CTE.
# ---------------------------------------------------------------------------

_BFS_K = 6
_BFS_SEED_MOD = 97


def arith_edges(sf_dir: str):
    """Dataset[(src, dst)] of the derived arithmetic doc graph: doc_id ->
    doc_id+1 and doc_id -> 2*doc_id (doc_id > 0), both bounded by the max
    doc_id. Same derived-graph discipline as chain_edges; built by one
    streaming vectorized map_batches (no shuffle). Assumes the synthetic
    dense doc_id space (0..max), which the testdata tables guarantee."""
    import pyarrow.parquet as pq
    import ray.data

    m = int(
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])["doc_id"]
        .to_numpy(zero_copy_only=False)
        .max()
    )
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def edges_of(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        chain = ids[ids + 1 <= m]
        dbl = ids[(ids > 0) & (ids * 2 <= m)]
        return pa.table(
            {
                "src": pa.array(np.concatenate([chain, dbl])),
                "dst": pa.array(np.concatenate([chain + 1, dbl * 2])),
            }
        )

    return ds.map_batches(edges_of, batch_format="pyarrow")


def bfs_hops(sf_dir: str, k: int = _BFS_K):
    """pa.Table[(doc_id, hops)] — min hop distance (<= k) from the seed set
    (doc_id % 97 == 0); nodes unreached within k rounds are excluded.

    Execution shape: the edge set stays distributed and static (materialized
    once); each of the <= k rounds broadcasts the frontier mask via ray.put,
    every edge block returns the unique newly-reachable dst ids (tiny
    partials), and the driver unions them into an O(nodes) distance vector —
    the same documented broadcast bound as pagerank/CC; past it, the CC
    bucketed-join propagation is the scale path."""
    import pyarrow.parquet as pq
    import ray

    node_ids = np.sort(
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])["doc_id"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    n = len(node_ids)
    assert n <= _PR_BROADCAST_MAX, "past the broadcast bound: use bucketed joins"
    edges = arith_edges(sf_dir).materialize()
    erefs = [br for b in edges.iter_internal_ref_bundles() for br in b.block_refs]
    ids_ref = ray.put(node_ids)

    dist = np.full(n, -1, dtype=np.int64)
    frontier = node_ids % _BFS_SEED_MOD == 0
    dist[frontier] = 0

    @ray.remote
    def step(t: pa.Table, ids, fr):
        src = np.searchsorted(ids, t["src"].to_numpy(zero_copy_only=False))
        reached = t["dst"].to_numpy(zero_copy_only=False)[fr[src]]
        return np.unique(reached)

    for d in range(1, k + 1):
        if not frontier.any():
            break
        fref = ray.put(frontier)
        parts = [p for p in ray.get([step.remote(r, ids_ref, fref) for r in erefs]) if len(p)]
        frontier = np.zeros(n, dtype=bool)
        if parts:
            reached = np.unique(np.concatenate(parts))
            pos = np.searchsorted(node_ids, reached)
            ok = (pos < n) & (node_ids[np.minimum(pos, n - 1)] == reached)
            pos = pos[ok]
            new = pos[dist[pos] < 0]
            dist[new] = d
            frontier[new] = True

    mreach = dist >= 0
    return pa.table(
        {"doc_id": pa.array(node_ids[mreach]), "hops": pa.array(dist[mreach])}
    )

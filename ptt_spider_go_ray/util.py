"""Small shared helpers for working with Ray Dataset blocks."""

from __future__ import annotations

import pyarrow as pa


def pull_arrow_blocks(ds) -> list[pa.Table]:
    """Fetch a Dataset's blocks as Arrow tables, zero-copy when possible.

    Uses ``iter_internal_ref_bundles`` (NOT ``to_arrow_refs``, whose schema
    probe re-executes the plan with limit=1 on this Ray version). Tolerates
    the executor's empty-block pass-through: Ray skips map_batches UDFs on
    0-row blocks, so an empty PANDAS block can survive an Arrow-normalizing
    map stage — those are dropped here (they carry no rows by definition).
    """
    import ray

    blocks = ray.get(
        [br for b in ds.iter_internal_ref_bundles() for br in b.block_refs]
    )
    out = []
    for b in blocks:
        if len(b) == 0:
            continue
        out.append(b if isinstance(b, pa.Table) else pa.Table.from_pandas(b, preserve_index=False))
    return out

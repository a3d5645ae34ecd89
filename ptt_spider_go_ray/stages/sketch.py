"""HyperLogLog approximate distinct count (Flajolet et al. 2007, with the
standard small-range linear-counting correction) as a Ray Data partial
aggregate: each batch contributes a register-array sketch (vectorized numpy),
sketches merge by elementwise max — the shuffle moves only 2^p-byte arrays,
never values. The scale pattern for COUNT(DISTINCT) at 100 TB."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _floor_log2_u64(v: np.ndarray) -> np.ndarray:
    """Vectorized floor(log2(v)) for nonzero uint64, in pure integer space.
    (float64 log2 rounds values whose top bits are all ones up to 2^64,
    yielding k=64 → rank 0 → a silently skipped register update — a small
    systematic bias in the estimator.)"""
    k = np.zeros(v.shape, dtype=np.int64)
    v = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = v >= (np.uint64(1) << np.uint64(shift))
        k[mask] += shift
        v[mask] >>= np.uint64(shift)
    return k


class HLL:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @staticmethod
    def _hash(values) -> np.ndarray:
        return pd.util.hash_array(np.asarray(values, dtype=object))

    def add_many(self, values) -> None:
        h = self._hash(values)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        # rank = leading zeros of the left-aligned suffix + 1, capped: the
        # |1 sentinel makes an all-zero suffix hit exactly the cap
        rest = (h << np.uint64(self.p)) | np.uint64(1)
        k = _floor_log2_u64(rest)  # 0..63, exact integer arithmetic
        rank = np.minimum(64 - k, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HLL") -> "HLL":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-self.registers.astype(np.float64)))
        zeros = int(np.count_nonzero(self.registers == 0))
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting
        return float(est)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "HLL":
        h = cls(p=data[0])
        h.registers = np.frombuffer(data[1:], dtype=np.uint8).copy()
        return h


def approx_distinct(ds, column: str, p: int = 12) -> float:
    """COUNT(DISTINCT column) ≈ via per-batch partial sketches merged on the
    driver (each partial is 2^p bytes — no value shuffle)."""

    def sketch_batch(t: pa.Table) -> pa.Table:
        h = HLL(p)
        h.add_many(t[column].to_pylist())
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.large_binary())})

    parts = ds.map_batches(sketch_batch, batch_format="pyarrow").take_all()
    acc = HLL(p)
    for row in parts:
        acc.merge(HLL.from_bytes(row["sketch"]))
    return acc.estimate()

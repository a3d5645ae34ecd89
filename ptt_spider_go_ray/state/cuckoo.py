"""Cuckoo filter for the URL-seen set (north rule), implemented on numpy —
no external deps. One filter instance lives inside each frontier shard actor
(the reference's implicit exact seen-set, SURVEY §2.7 D2, generalized to
10^10-frontier scale where an exact set no longer fits in memory).

Standard design from the public literature (Fan et al., "Cuckoo Filter:
Practically Better Than Bloom", CoNEXT 2014): buckets of 4 fingerprint slots,
two candidate buckets per item (partial-cuckoo hashing: i2 = i1 XOR
hash(fingerprint)), bounded eviction kicks. 16-bit fingerprints → ~0.001%
false-positive rate at 95% load.

Serialization is a plain bytes dump of the table + a few ints, so shard
checkpoints are cheap and deterministic.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_KICKS = 500


def hash64(data: str | bytes) -> int:
    """Stable 64-bit hash (blake2b-8); used for both url_hash and filter keys."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


class CuckooFilter:
    def __init__(self, capacity: int = 1 << 16, seed: int = 0) -> None:
        # capacity = number of slots; buckets of 4
        n_buckets = max(1, int(capacity) // 4)
        # round up to power of two so i2 = i1 ^ h(fp) stays in range
        self.n_buckets = 1 << (n_buckets - 1).bit_length()
        self.table = np.zeros((self.n_buckets, 4), dtype=np.uint16)
        self.count = 0
        self.seed = seed
        self._mask = self.n_buckets - 1

    # -- hashing ------------------------------------------------------------

    def _fp_and_index(self, h: int) -> tuple[int, int]:
        fp = (h & 0xFFFF) or 1  # fingerprint 0 means empty slot
        i1 = (h >> 16) & self._mask
        return fp, i1

    def _alt_index(self, i: int, fp: int) -> int:
        # partial-key cuckoo: XOR with a hash of the fingerprint
        return (i ^ (fp * 0x5BD1E995)) & self._mask

    # -- ops ----------------------------------------------------------------

    def contains_hash(self, h: int) -> bool:
        fp, i1 = self._fp_and_index(h)
        if (self.table[i1] == fp).any():
            return True
        i2 = self._alt_index(i1, fp)
        return bool((self.table[i2] == fp).any())

    def add_hash(self, h: int) -> bool:
        """Insert; returns False only when the filter is saturated."""
        fp, i1 = self._fp_and_index(h)
        for i in (i1, self._alt_index(i1, fp)):
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        # evict: bounded random-walk kicks, deterministic RNG from (seed, h)
        rng = np.random.default_rng((self.seed * 0x9E3779B97F4A7C15 + h) & 0xFFFFFFFFFFFFFFFF)
        i = i1 if rng.integers(2) else self._alt_index(i1, fp)
        for _ in range(_KICKS):
            slot = int(rng.integers(4))
            fp, self.table[i][slot] = int(self.table[i][slot]), fp
            i = self._alt_index(i, fp)
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        return False

    def add_new_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Batch offer: returns boolean mask of hashes that were NOT already
        present (and are now inserted). Duplicates within the batch are
        resolved first-wins, matching exact-dedup-first semantics (D2)."""
        out = np.zeros(len(hashes), dtype=bool)
        seen_in_batch: set[int] = set()
        for k, h in enumerate(hashes):
            h = int(h)
            if h in seen_in_batch or self.contains_hash(h):
                continue
            seen_in_batch.add(h)
            if not self.add_hash(h):
                raise RuntimeError("cuckoo filter saturated; raise seen_capacity")
            out[k] = True
        return out

    # -- checkpoint ---------------------------------------------------------

    def to_bytes(self) -> bytes:
        header = struct.pack("<QQQ", self.n_buckets, self.count, self.seed)
        return header + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        n_buckets, count, seed = struct.unpack("<QQQ", data[:24])
        f = cls.__new__(cls)
        f.n_buckets = n_buckets
        f.count = count
        f.seed = seed
        f._mask = n_buckets - 1
        f.table = np.frombuffer(data[24:], dtype=np.uint16).reshape(n_buckets, 4).copy()
        return f

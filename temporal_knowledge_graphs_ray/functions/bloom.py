"""Vectorized Bloom filter over int64 keys.

The broadcast-semi-join pattern (`pc.is_in(col, value_set=ids)`) ships the
FULL id set to every task; at web scale a candidate set of 10^8 ids is
gigabytes per broadcast. A Bloom filter is a fixed-size stand-in for the
membership test wherever false positives are harmless (e.g. pre-filtering
rows for a join whose later stages drop non-matches anyway): ~10 bits/key
for ~1% FP at k=7.

All operations are numpy-vectorized; hashing is splitmix64 finalizer
mixes of the key with k fixed odd multipliers (bijective on u64, no
Python-level per-key work). Deterministic across processes/machines.
"""

from __future__ import annotations

import numpy as np

# fixed odd multipliers (any odd constant is bijective mod 2^64); k <= 8
_MULTS = np.array(
    [0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB,
     0xD6E8FEB86659FD93, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
     0x27D4EB2F165667C5, 0x85EBCA6B27D4EB4F],
    dtype=np.uint64,
)


def _mix(keys: np.ndarray, mult: np.uint64) -> np.ndarray:
    """splitmix64-style finalizer of key * mult (vectorized, uint64)."""
    x = keys * mult
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


class BloomFilter:
    """Bit array + k hash mixes; build once, test membership vectorized.

    ``num_bits`` is rounded up to a power of two so the index reduction is
    a mask, not a modulo. Serializable via its ``words`` array (uint64) —
    small enough to ``ray.put`` once and read zero-copy in every task.
    """

    def __init__(self, expected_items: int, bits_per_item: int = 10,
                 num_hashes: int = 7):
        if not 1 <= num_hashes <= len(_MULTS):
            raise ValueError(f"num_hashes must be 1..{len(_MULTS)}")
        n_bits = 1 << max(6, int(np.ceil(np.log2(
            max(64, expected_items * bits_per_item)))))
        self._mask = np.uint64(n_bits - 1)
        self._k = num_hashes
        self.words = np.zeros(n_bits >> 6, dtype=np.uint64)

    @property
    def num_bits(self) -> int:
        return len(self.words) << 6

    def add_many(self, keys: np.ndarray) -> None:
        ks = np.ascontiguousarray(keys, dtype=np.int64).view(np.uint64)
        for h in range(self._k):
            idx = _mix(ks, _MULTS[h]) & self._mask
            np.bitwise_or.at(self.words, (idx >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (idx & np.uint64(63)))

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Boolean mask; True for every added key (False positives ~
        (1 - e^(-k*n/m))^k, no false negatives)."""
        ks = np.ascontiguousarray(keys, dtype=np.int64).view(np.uint64)
        out = np.ones(len(ks), dtype=bool)
        for h in range(self._k):
            idx = _mix(ks, _MULTS[h]) & self._mask
            bit = (self.words[(idx >> np.uint64(6)).astype(np.int64)]
                   >> (idx & np.uint64(63))) & np.uint64(1)
            out &= bit.astype(bool)
            if not out.any():
                break
        return out


def bloom_from_int64(keys: np.ndarray, bits_per_item: int = 10,
                     num_hashes: int = 7) -> BloomFilter:
    bf = BloomFilter(max(1, len(keys)), bits_per_item, num_hashes)
    if len(keys):
        bf.add_many(np.asarray(keys, dtype=np.int64))
    return bf

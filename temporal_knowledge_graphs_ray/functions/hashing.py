"""Stable hashing kernels: content hashes, MinHash, SimHash, shingles.

All hashes are derived from MD5 so they are stable across processes,
machines and Python versions (Python's builtin ``hash`` is salted per
process — never use it in a distributed pipeline). MD5 also has an exact
DuckDB equivalent (``md5(...)``) so exact-dedup keys have SQL oracles.

MinHash/SimHash here are this engine's scale additions for training-data
dedup (no equivalent exists in the reference; see SURVEY.md §2.6 note) —
standard constructions per Broder (1997) and Charikar (2002).
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np

_WORD_RE = re.compile(r"[a-z0-9]+")


def md5_hex(text: str) -> str:
    """Hex MD5 of UTF-8 text — matches DuckDB ``md5(text)``."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def stable_hash64(text: str, seed: int = 0) -> int:
    """Unsigned 63-bit stable hash (fits int64)."""
    h = hashlib.md5(f"{seed}|{text}".encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big") >> 1


def url_parts_vec(urls, num_partitions: int) -> np.ndarray:
    """Vectorized stable partition assignment for a url array.

    SipHash via ``pandas.util.hash_array`` with its fixed default key —
    stable across processes and machines (unlike builtin ``hash``), and
    ~100x faster than a per-row MD5 loop on the phase-A hot path. Every
    site deriving the ``part`` layout column from urls (writer, resume
    filter, supersede purge) MUST go through this function so the layout
    stays consistent within and across runs.
    """
    import pandas as pd

    arr = np.asarray(list(urls), dtype=object)
    if arr.size == 0:
        return np.empty(0, dtype=np.int32)
    return (pd.util.hash_array(arr, categorize=False)
            % num_partitions).astype(np.int32)


def fast_hash64(text: str, seed: int = 0) -> int:
    """Fast stable 63-bit hash (two salted CRC32s) for high-volume sketch
    inputs (shingles, simhash tokens). Stable across processes/machines —
    unlike Python's salted ``hash`` — and ~20x faster than MD5. Not used
    for identities/fingerprints (those stay MD5)."""
    b = text.encode("utf-8")
    hi = zlib.crc32(b, seed & 0xFFFFFFFF)
    lo = zlib.crc32(b, (seed ^ 0x9E3779B9) & 0xFFFFFFFF)
    x = (hi << 32) | lo
    # splitmix64 finalizer: CRC is GF(2)-linear, so low bits of related
    # inputs correlate; the multiply-xor cascade decorrelates them
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
    x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
    return (x ^ (x >> 31)) >> 1


def hash64_vec(values, seed: int = 0) -> np.ndarray:
    """Vectorized stable uint64 hashes of a string sequence (SipHash via
    ``pandas.util.hash_array``, categorize=False so equal values hash
    equal independent of batch composition — same rationale as
    ``url_parts_vec``). Used by bulk bucketing/sampling kernels
    (sequence packing, bottom-k row samples) where a per-row Python hash
    loop would dominate; ~100x faster. ``seed`` decorrelates independent
    uses via a splitmix64 finalizer over the xored seed hash."""
    import pandas as pd

    arr = np.asarray(list(values), dtype=object)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    h = pd.util.hash_array(arr, categorize=False)
    if seed:
        h = h ^ np.uint64(stable_hash64(str(seed)))
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = h ^ (h >> np.uint64(31))
    return h


def word_shingles(text: str, k: int = 3) -> list[str]:
    """Lower-cased word k-shingles (space-joined)."""
    words = _WORD_RE.findall(text.lower())
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]


def char_ngrams(text: str, n: int = 3) -> list[str]:
    t = text.lower()
    if len(t) < n:
        return [t] if t else []
    return [t[i:i + n] for i in range(len(t) - n + 1)]


def minhash_signature(shingles: list[str], num_perm: int = 64) -> np.ndarray:
    """MinHash signature via num_perm seeded hash functions.

    Vectorized: one MD5 per shingle, then num_perm cheap xor-shift mixes of
    that 64-bit value (a standard "one hash + k mixers" construction).
    Returns uint64[num_perm]; empty input -> all UINT64_MAX.
    """
    sig = np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    if not shingles:
        return sig
    base = np.fromiter(
        (fast_hash64(s) for s in set(shingles)), dtype=np.uint64,
    )
    seeds = _PERM_SEEDS[:num_perm]
    if len(seeds) < num_perm:
        raise ValueError(f"num_perm > {len(_PERM_SEEDS)} unsupported")
    # h_i(x) = rotate/mix with odd multiplier + xor seed (bijective on u64)
    mixed = (base[None, :] * seeds[:, None]) ^ (base[None, :] >> np.uint64(29))
    return mixed.min(axis=1)


# 128 fixed odd multipliers derived from MD5 of the permutation index
_PERM_SEEDS = np.array(
    [stable_hash64(f"perm-{i}") | 1 for i in range(128)], dtype=np.uint64
)


def minhash_bands(sig: np.ndarray, num_bands: int = 16) -> list[int]:
    """Split a signature into bands; returns a stable hash per band.

    Docs sharing any band hash are LSH candidates. Band hashing is a
    vectorized FNV-style polynomial over the band's rows (no string ops).
    """
    rows = len(sig) // num_bands
    bands = sig[: rows * num_bands].reshape(num_bands, rows)
    acc = np.full(num_bands, 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    for r in range(rows):
        acc = (acc ^ bands[:, r]) * prime
    # fold in the band index so identical bands in different positions differ
    acc = (acc ^ np.arange(num_bands, dtype=np.uint64)) * prime
    return [int(x >> np.uint64(1)) for x in acc]


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token hashes (Charikar 2002)."""
    if not tokens:
        return 0
    hashes = np.fromiter((fast_hash64(t) for t in tokens), dtype=np.uint64)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
    votes = bits.sum(axis=0).astype(np.int64) * 2 - len(hashes)  # +1 / -1 votes
    return int((votes > 0).astype(np.uint64) @ (np.uint64(1) << np.arange(64, dtype=np.uint64)))


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# popcount of each byte value 0..255 (numpy 1.x has no bitwise_count)
_POPCNT8 = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1).astype(np.uint8)


def hamming64_vec(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit Hamming distance (byte-LUT popcount).

    Accepts int64 or uint64 arrays (int64 is reinterpreted bitwise).
    Returns int64[n]; equals ``hamming64`` element-wise.
    """
    av = np.ascontiguousarray(a, dtype=np.int64).view(np.uint64)
    bv = np.ascontiguousarray(b, dtype=np.int64).view(np.uint64)
    x = av ^ bv
    return _POPCNT8[x.view(np.uint8).reshape(len(x), 8)].sum(
        axis=1).astype(np.int64)


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)

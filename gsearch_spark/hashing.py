"""Deterministic, vectorized 64-bit hashing (pure numpy).

The reference relies on seeded hash families for its sketches (FxHasher /
murmur via the probminhash crate, selected at gsearch
``src/dna/dnasketch.rs:499-643``).  We need the same property — a fixed,
seeded, platform-independent 64-bit hash — but vectorized over numpy
arrays so signature UDFs never touch per-row Python.  ``splitmix64`` is the
public-domain finalizer from Vigna's xoroshiro work; the polynomial rolling
hash over byte windows is the standard Rabin-Karp construction.

All arithmetic is uint64 with wraparound (numpy overflow semantics), which
is deterministic on every platform.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
GOLDEN = _U64(0x9E3779B97F4A7C15)
_MIX1 = _U64(0xBF58476D1CE4E5B9)
_MIX2 = _U64(0x94D049BB133111EB)
_POLY_MULT = _U64(0x100000001B3)  # FNV prime, used as the rolling base


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: uint64 array -> uint64 array."""
    x = np.asarray(x, dtype=_U64)
    with np.errstate(over="ignore"):
        z = x + GOLDEN
        z = (z ^ (z >> _U64(30))) * _MIX1
        z = (z ^ (z >> _U64(27))) * _MIX2
        return z ^ (z >> _U64(31))


def hash_u64(x: np.ndarray, seed: int = 0) -> np.ndarray:
    """Seeded 64-bit hash of a uint64 array."""
    x = np.asarray(x, dtype=_U64)
    with np.errstate(over="ignore"):
        return splitmix64(x ^ splitmix64(np.full_like(x, _U64(seed))))


def hash_pair_u64(a: np.ndarray, b: np.ndarray, seed: int = 0) -> np.ndarray:
    """Seeded 64-bit hash combining two uint64 arrays (order-sensitive)."""
    a = np.asarray(a, dtype=_U64)
    b = np.asarray(b, dtype=_U64)
    with np.errstate(over="ignore"):
        return splitmix64(splitmix64(a ^ _U64(seed)) * GOLDEN ^ splitmix64(b))


def hash_bytes_windows(buf: np.ndarray, starts: np.ndarray, k: int,
                       seed: int = 0) -> np.ndarray:
    """Hash every k-byte window of ``buf`` beginning at ``starts``.

    Fully vectorized Rabin-Karp: H(w) = sum_j buf[s+j] * m^(k-1-j) (mod 2^64),
    finalized with splitmix64.  ``starts`` may be any int array of window
    start offsets; windows must fit inside ``buf``.
    """
    if len(starts) == 0:
        return np.empty(0, dtype=_U64)
    buf = np.asarray(buf, dtype=_U64)
    starts = np.asarray(starts, dtype=np.int64)
    with np.errstate(over="ignore"):
        powers = np.empty(k, dtype=_U64)
        powers[k - 1] = _U64(1)
        for j in range(k - 2, -1, -1):
            powers[j] = powers[j + 1] * _POLY_MULT
        # gather windows: shape (n_windows, k)
        idx = starts[:, None] + np.arange(k, dtype=np.int64)[None, :]
        acc = (buf[idx] * powers[None, :]).sum(axis=1, dtype=_U64)
        return hash_u64(acc, seed=seed)


def concat_with_offsets(strings: "list[bytes]") -> "tuple[np.ndarray, np.ndarray]":
    """Concatenate byte strings into one uint8 buffer + start offsets.

    Returns (buf, offsets) where offsets has len(strings)+1 entries; string
    i occupies buf[offsets[i]:offsets[i+1]].  Used to shingle a whole Arrow
    batch of captions with a single vectorized pass instead of per-row loops.
    """
    lens = np.fromiter((len(s) for s in strings), dtype=np.int64,
                       count=len(strings))
    offsets = np.zeros(len(strings) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    buf = np.frombuffer(b"".join(strings), dtype=np.uint8)
    return buf, offsets


def kgram_hashes_batch(strings: "list[bytes]", k: int, seed: int = 0
                       ) -> "tuple[np.ndarray, np.ndarray]":
    """k-gram window hashes for a batch of byte strings, one pass.

    Returns (hashes, row_ids): for every string i with len >= k, one hash
    per character k-gram, tagged with its row index.  Strings shorter than
    k contribute a single whole-string hash (so short captions still get a
    signature — mirrors the reference hashing whole short sequences).
    """
    buf, offsets = concat_with_offsets(strings)
    n = len(strings)
    lens = offsets[1:] - offsets[:-1]
    # windows fully inside each string: starts offsets[i] .. offsets[i+1]-k
    counts = np.maximum(lens - k + 1, 0)
    row_ids = np.repeat(np.arange(n, dtype=np.int64), counts)
    # start offset of each window
    base = np.repeat(offsets[:-1], counts)
    within = np.arange(len(base), dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
    starts = base + within
    hashes = hash_bytes_windows(buf, starts, k, seed=seed)
    # short strings (0 < len < k): hash the whole string, padded conceptually
    short = np.nonzero((lens > 0) & (lens < k))[0]
    if len(short) > 0:
        short_hashes = np.empty(len(short), dtype=_U64)
        for j, i in enumerate(short):  # rare path; bounded by batch size
            s = buf[offsets[i]:offsets[i + 1]].astype(_U64)
            with np.errstate(over="ignore"):
                acc = _U64(0)
                for b in s:
                    acc = acc * _POLY_MULT + b
            short_hashes[j] = hash_u64(np.array([acc]), seed=seed)[0]
        hashes = np.concatenate([hashes, short_hashes])
        row_ids = np.concatenate([row_ids, short.astype(np.int64)])
    return hashes, row_ids

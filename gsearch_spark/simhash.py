"""64-bit SimHash over pixel-feature shingles (vectorized numpy).

SimHash is not in the reference (it uses Hamming distance over MinHash
slots instead); BASELINE.json's north_star mandates it for Hamming
neighborhoods over decoded-pixel features (SURVEY §2.4 A9).  Standard
Charikar construction: every shingle hash contributes +-1 to each of 64
bit-counters (sign taken from the shingle hash's own bits); the final bit
is the counter's sign.

Pixel feature shingles: the decoded image is grayscaled, mean-pooled to a
fixed 16x16 grid, each ``block x block`` tile is quantized coarsely, and
the (tile position, quantized tile) pair is hashed — small pixel
perturbations leave most tiles' quantized values unchanged, so
near-duplicate pixels land within a small Hamming ball.
"""

from __future__ import annotations

import numpy as np

from gsearch_spark.codec import to_gray
from gsearch_spark.hashing import hash_pair_u64
from gsearch_spark.phash import _pool_to

_U64 = np.uint64
_GRID = 16
_QUANT = 16.0  # gray-level quantization step for tile features


def pooled_shingles(pooled: np.ndarray, seed: int = 42) -> np.ndarray:
    """(16,16) pooled luma grid -> uint64 feature-shingle hashes."""
    q = np.floor(pooled / _QUANT).astype(np.int64).ravel()
    pos = np.arange(_GRID * _GRID, dtype=np.int64)
    return hash_pair_u64(q.view(_U64), pos.astype(_U64), seed=seed)


def pixel_shingles(pixels: np.ndarray, seed: int = 42) -> np.ndarray:
    """Decoded image -> uint64 feature-shingle hashes (one per grid tile).

    In-memory variant (tests / already-decoded arrays).  The PIPELINE path
    is :func:`pixel_shingles_stream`, which never materializes the full
    image; the two can differ in the last float ulp of the pooled means
    (summation order), so a single run must not mix them — the pipeline,
    oracle and bench job all use the stream variant.
    """
    return pooled_shingles(_pool_to(to_gray(pixels), _GRID), seed=seed)


def pixel_shingles_stream(data: bytes, seed: int = 42) -> np.ndarray:
    """Encoded image bytes -> shingle hashes via the STREAMING pooled
    decode (L2-resident working set; see codec.decode_pooled_gray)."""
    from gsearch_spark.codec import decode_pooled_gray
    return pooled_shingles(decode_pooled_gray(data, _GRID), seed=seed)


def simhash64(shingle_hashes: np.ndarray) -> int:
    """Charikar SimHash of one shingle-hash set -> signed int64."""
    sig = simhash64_batch(shingle_hashes[None, :].astype(_U64))
    return int(sig[0])


def simhash64_batch(shingles_2d: np.ndarray) -> np.ndarray:
    """SimHash for a batch: (n_items, n_shingles) uint64 -> (n_items,) int64.

    Vectorized via ``np.unpackbits`` (C-speed bit expansion, uint8 memory
    traffic): bit j of the signature is set iff more than half of the
    shingle hashes have bit j set — equivalent to the ±1-sum sign rule.
    """
    h = np.ascontiguousarray(np.asarray(shingles_2d, dtype=_U64))
    n, s = h.shape
    # little-endian bytes + bitorder='little' => column k is bit k of h
    bits = np.unpackbits(h.view(np.uint8).reshape(n, s, 8),
                         axis=2, bitorder="little")  # (n, s, 64) in {0,1}
    counts = bits.sum(axis=1, dtype=np.int32)        # (n, 64)
    out_bits = (2 * counts > s).astype(np.uint8)     # sign of ±1 sum
    sig = np.packbits(out_bits, axis=1, bitorder="little")  # (n, 8) bytes
    return np.ascontiguousarray(sig).view(np.uint64).ravel().view(np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of XOR between two int64 arrays."""
    x = (np.asarray(a).view(_U64) ^ np.asarray(b).view(_U64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(8):
        cnt += _POPCOUNT_TABLE[(x & _U64(0xFF)).astype(np.int64)]
        x = x >> _U64(8)
    return cnt


_POPCOUNT_TABLE = np.array([bin(i).count("1") for i in range(256)],
                           dtype=np.int64)

"""DCT-based 64-bit perceptual hash (pure numpy).

The generator computes ``phash`` for every image and the pipeline derives
MinHash shingles from its bit n-grams (SURVEY §2.3 T1).  The algorithm is
the classic pHash recipe: grayscale -> mean-pool to 32x32 -> 2D DCT-II ->
keep the top-left 8x8 low-frequency block (minus DC) -> threshold at the
median -> 64-bit.  Shared verbatim between the fixture generator, the
oracle, and the pipeline so signatures are bit-identical everywhere
(the recall>=0.99 contract from BASELINE.json).
"""

from __future__ import annotations

import numpy as np

from gsearch_spark.codec import to_gray

_DCT_N = 32
_LOW = 8


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (n x n), float64."""
    k = np.arange(n, dtype=np.float64)
    m = np.cos(np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n))
    m *= np.sqrt(2.0 / n)
    m[0, :] = np.sqrt(1.0 / n)
    return m


_DCT_M = _dct_matrix(_DCT_N)


def _pool_to(gray: np.ndarray, n: int) -> np.ndarray:
    """Deterministic area mean-pool of (h, w) to (n, n) via bin averaging."""
    h, w = gray.shape
    # integer bin edges (floor), deterministic across platforms
    ys = (np.arange(n + 1, dtype=np.int64) * h) // n
    xs = (np.arange(n + 1, dtype=np.int64) * w) // n
    # cumulative-sum trick for O(1) box sums
    c = np.zeros((h + 1, w + 1), dtype=np.float64)
    np.cumsum(np.cumsum(gray, axis=0), axis=1, out=c[1:, 1:])
    box = (c[ys[1:], :][:, xs[1:]] - c[ys[:-1], :][:, xs[1:]]
           - c[ys[1:], :][:, xs[:-1]] + c[ys[:-1], :][:, xs[:-1]])
    area = (ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]
    area = np.maximum(area, 1)
    return box / area


def phash64_from_pooled(small: np.ndarray) -> int:
    """pHash tail from an already-pooled (32, 32) luma grid.

    Split out so the band-streaming fixture generator can accumulate the
    pooled grid incrementally (codec.PooledGrayAccumulator) and never
    materialize the full image; the DCT/median/threshold tail is shared
    with :func:`phash64`.
    """
    freq = _DCT_M @ small @ _DCT_M.T
    block = freq[:_LOW, :_LOW].copy().ravel()
    block[0] = 0.0  # drop DC
    med = np.median(block[1:])
    bits = (block > med).astype(np.uint64)
    h = np.uint64(0)
    with np.errstate(over="ignore"):
        for i in range(64):
            h |= bits[i] << np.uint64(i)
    return int(h.astype(np.int64))


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash of an (h, w, 3) uint8 image, as signed int64.

    Signed so it round-trips through Spark/parquet BIGINT unchanged.
    """
    return phash64_from_pooled(_pool_to(to_gray(pixels), _DCT_N))


def phash_bit_shingles(phash: np.ndarray, width: int, seed: int = 0
                       ) -> np.ndarray:
    """Sliding bit-window shingles of a batch of 64-bit phashes.

    For each phash, every ``width``-bit window (64 - width + 1 of them,
    cyclic not needed) becomes one shingle hash tagged with its position so
    identical windows at different offsets stay distinct — the analog of
    k-mer positions feeding the sketch (SURVEY T1).

    Input: int64 array (n,).  Output: uint64 array (n, 64 - width + 1).
    """
    from gsearch_spark.hashing import hash_pair_u64

    h = phash.astype(np.int64).view(np.uint64)
    n_win = 64 - width + 1
    shifts = np.arange(n_win, dtype=np.uint64)
    mask = np.uint64((1 << width) - 1)
    with np.errstate(over="ignore"):
        windows = (h[:, None] >> shifts[None, :]) & mask
        pos = np.broadcast_to(shifts[None, :], windows.shape)
        return hash_pair_u64(windows, pos, seed=seed)

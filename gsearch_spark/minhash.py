"""One-permutation MinHash with optimal densification (vectorized numpy).

This is our primary signature — the analog of the reference's recommended
``--algo optdens`` sketcher (one-permutation MinHash + optimal
densification, gsearch ``src/dna/dnasketch.rs:600-620``; ``revoptdens``
variant at ``:622-642``; README recommends it as fastest at
``README.md:679-680``).  Semantics follow the published algorithms
(Li et al. NeurIPS 2012 one-permutation hashing; Shrivastava ICML 2017
optimal densification); the exact bit-level rules below are this engine's
contract, mirrored verbatim by the brute-force oracle in
``gsearch_spark/oracle.py`` so dup-pair recall is measured under the SAME
shingle/signature config (BASELINE.json north_rule).

Slot rule:   bin(h)  = h mod S,  value(h) = h   (uint64, splitmix-mixed)
Sketch slot: m[b]    = min{ value(h) : bin(h) = b }
optdens:     empty bin b copies m[j] from the first non-empty donor
             j = hash2(b, attempt) mod S, attempt = 1, 2, ...
revoptdens:  same walk, but the copied value is re-mixed with the target
             bin (hash2(m[j], b)) to decorrelate runs of empty bins.
Empty set:   slot b = hash2(b, seed') — deterministic, item-independent
             collisions are astronomically unlikely.

Estimator (for tests / diagnostics): Jaccard(A, B) ~= fraction of equal
slots — exactly the reference's Hamming-over-sketch-slots distance
(``d = 1 - J``, gsearch ``src/bin/bindash.rs:93-97``).

``prob`` algo: the weighted-multiset sketch covering the reference's
DEFAULT ``--algo prob`` (ProbMinHash, gsearch
``src/dna/dnasketch.rs:499-519``, parse at ``src/bin/gsearch.rs:181-196``).
ProbMinHash sketches a weighted multiset so repeated shingles count;
we get the same query capability with the classic explicit-replication
construction (each of an element's ``w`` occurrences becomes a distinct
token hash(h, occurrence_index); standard MinHash over the expanded set
estimates the weighted Jaccard J_w = sum min(w_A, w_B) / sum max(w_A,
w_B) for integer weights — the replication trick referenced by Ioffe,
ICDM 2010, §1).  Chosen over a literal ProbMinHash3a port because it is
exactly vectorizable over Arrow batches and bit-reproducible in the
numpy oracle; shingle multiplicities here are always integers.
"""

from __future__ import annotations

import numpy as np

from gsearch_spark.hashing import hash_pair_u64, hash_u64

_U64 = np.uint64
_EMPTY = np.iinfo(np.uint64).max  # sentinel: bin never hit
_MAX_DENSIFY_ROUNDS = 256


def weighted_tokens(hashes: np.ndarray, row_ids: np.ndarray,
                    seed: int = 42) -> "tuple[np.ndarray, np.ndarray]":
    """Expand a per-row hash MULTISET into distinct weighted tokens.

    The j-th occurrence of hash h within a row becomes hash_pair(h, j):
    two rows sharing an element with weights w_a, w_b share exactly
    min(w_a, w_b) tokens, so plain MinHash over the tokens estimates the
    integer-weighted Jaccard (the ``prob`` algo's contract).
    Vectorized: one lexsort + run-length occurrence numbering.
    """
    hashes = np.asarray(hashes, dtype=_U64)
    row_ids = np.asarray(row_ids, dtype=np.int64)
    if len(hashes) == 0:
        return hashes, row_ids
    order = np.lexsort((hashes, row_ids))
    h_s, r_s = hashes[order], row_ids[order]
    new_run = np.empty(len(h_s), dtype=bool)
    new_run[0] = True
    new_run[1:] = (h_s[1:] != h_s[:-1]) | (r_s[1:] != r_s[:-1])
    run_id = np.cumsum(new_run) - 1
    run_start = np.flatnonzero(new_run)
    occ = (np.arange(len(h_s), dtype=np.int64)
           - run_start[run_id]).astype(_U64)
    return hash_pair_u64(h_s, occ, seed=seed ^ 0x9B0B), r_s


def superminhash_batch(hashes: np.ndarray, row_ids: np.ndarray,
                       n_rows: int, sketch_size: int, seed: int = 42,
                       rehash: bool = False,
                       chunk: int = 4096) -> np.ndarray:
    """SuperMinHash (Ertl 2017) — the reference's ``--algo super`` /
    ``super2`` sketchers (``SuperHashSketch`` / ``SuperHash2Sketch``,
    gsearch ``src/aa/aasketch.rs:470-475``, request twins at
    ``src/aa/aarequest.rs:435-452,564-583``).

    Per element d and slot j: u_j(d) ~ U(0,1) and a uniform permutation
    π(d) of {0..S-1} (realized as the rank of a second hash row — the
    rank of iid uniforms IS a uniform permutation); the slot candidate is
    a_j(d) = π_j(d) + u_j(d) and slot j keeps the minimum over elements.
    The permutation couples the slots, which is the algorithm's point: it
    lowers the estimator variance vs independent slot draws for small
    sets, and NO slot is ever empty for a non-empty set, so there is no
    densification walk at all.

    Signature encoding (schema keeps array<bigint>): ``super`` stores the
    IEEE-754 bit pattern of the winning float64 (values are positive and
    finite, so bit equality == value equality; the reference stores the
    f32 value itself and compares slots by equality, DistHamming).
    ``rehash=True`` (= ``super2``) splitmix-rehashes that bit pattern
    with the slot id into a uniform u64 — the ``SuperHash2Sketch`` shape,
    whose integer signature is a hash determined by the winning element;
    two rows agree on a slot iff the same element won it, identical
    equality semantics to ``super`` up to 2^-64 hash collisions.

    Estimator: J ≈ fraction of equal slots, like every other algo here.
    Cost: O(|shingles| * S log S) — heavier than optdens (which is why
    the reference's README recommends optdens and we default to it), and
    chunked so the working set stays bounded.
    """
    S = sketch_size
    slots = np.arange(S, dtype=_U64)
    out = np.full((n_rows, S), np.inf, dtype=np.float64)
    if len(hashes) > 0:
        hashes = np.asarray(hashes, dtype=_U64)
        row_ids = np.asarray(row_ids, dtype=np.int64)
        order = np.argsort(row_ids, kind="stable")
        hashes, row_ids = hashes[order], row_ids[order]
        for i in range(0, len(hashes), chunk):
            h = hashes[i:i + chunk]
            r = row_ids[i:i + chunk]
            c = len(h)
            grid_h = np.broadcast_to(h[:, None], (c, S))
            grid_s = np.broadcast_to(slots[None, :], (c, S))
            with np.errstate(over="ignore"):
                u = (hash_pair_u64(grid_h, grid_s, seed=seed ^ 0x50BA)
                     .astype(np.float64) / float(2 ** 64))
                keys = hash_pair_u64(grid_h, grid_s, seed=seed ^ 0x9A17)
            pi = np.argsort(np.argsort(keys, axis=1), axis=1)
            val = pi.astype(np.float64) + u
            np.minimum.at(out, (np.broadcast_to(r[:, None], (c, S)),
                                np.broadcast_to(np.arange(S)[None, :],
                                                (c, S))), val)
    sketch = np.ascontiguousarray(out).view(_U64).copy()
    # rows with zero shingles -> the shared deterministic empty signature
    empty_rows = np.all(np.isinf(out), axis=1)
    if empty_rows.any():
        fill = hash_u64(slots, seed=seed ^ 0xE3B0)
        sketch[empty_rows] = fill[None, :]
    if rehash:
        live = ~empty_rows
        if live.any():
            with np.errstate(over="ignore"):
                sketch[live] = hash_pair_u64(
                    sketch[live],
                    np.broadcast_to(slots[None, :], sketch[live].shape),
                    seed=seed ^ 0x5E42)
    return sketch


def minhash_batch(hashes: np.ndarray, row_ids: np.ndarray, n_rows: int,
                  sketch_size: int, algo: str = "optdens",
                  seed: int = 42) -> np.ndarray:
    """Compute (n_rows, sketch_size) uint64 sketches for a batch of items.

    ``hashes``: uint64 shingle hashes, ``row_ids``: which item each hash
    belongs to.  Items with no shingles get the deterministic empty-set
    signature.  Fully vectorized; the densification loop iterates over
    attempts (a handful in practice), never over rows.

    ``algo='prob'`` treats the hash stream as a MULTISET (weighted
    Jaccard, the reference's default sketcher family); the set algos
    (optdens/revoptdens) are multiplicity-insensitive by construction
    (min over equal values).
    """
    S = sketch_size
    if algo in ("super", "super2"):
        return superminhash_batch(hashes, row_ids, n_rows, S, seed=seed,
                                  rehash=(algo == "super2"))
    if algo == "prob" and len(hashes) > 0:
        hashes, row_ids = weighted_tokens(hashes, row_ids, seed=seed)
    sketch = np.full((n_rows, S), _EMPTY, dtype=_U64)
    if len(hashes) > 0:
        hashes = np.asarray(hashes, dtype=_U64)
        row_ids = np.asarray(row_ids, dtype=np.int64)
        bins = (hashes % _U64(S)).astype(np.int64)
        np.minimum.at(sketch, (row_ids, bins), hashes)

    # rows with zero shingles -> deterministic empty signature
    empty_rows = np.all(sketch == _EMPTY, axis=1)
    if empty_rows.any():
        slot_ids = np.arange(S, dtype=_U64)
        fill = hash_u64(slot_ids, seed=seed ^ 0xE3B0)
        # keep it distinct from any real value by construction (mixing)
        sketch[empty_rows] = fill[None, :]

    # optimal densification for remaining empty bins
    need = sketch == _EMPTY
    if need.any():
        rows, cols = np.nonzero(need)
        pending = np.ones(len(rows), dtype=bool)
        out = np.zeros(len(rows), dtype=_U64)
        for attempt in range(1, _MAX_DENSIFY_ROUNDS + 1):
            if not pending.any():
                break
            idx = np.nonzero(pending)[0]
            donor = (hash_pair_u64(cols[idx].astype(_U64),
                                   np.full(len(idx), attempt, dtype=_U64),
                                   seed=seed ^ 0xD15C) % _U64(S)
                     ).astype(np.int64)
            vals = sketch[rows[idx], donor]
            ok = vals != _EMPTY
            hit = idx[ok]
            if algo == "revoptdens":
                out[hit] = hash_pair_u64(vals[ok], cols[hit].astype(_U64),
                                         seed=seed ^ 0x7EF5)
            else:
                out[hit] = vals[ok]
            pending[hit] = False
        if pending.any():
            # pathological: almost-all-empty sketch; fall back to slot fill
            idx = np.nonzero(pending)[0]
            out[idx] = hash_pair_u64(cols[idx].astype(_U64),
                                     rows[idx].astype(_U64),
                                     seed=seed ^ 0xFA11)
        sketch[rows, cols] = out
    return sketch


def sketch_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Estimated Jaccard = fraction of equal slots (reference C1 semantics,
    gsearch ``src/bin/bindash.rs:93-97``)."""
    a = np.asarray(a, dtype=_U64)
    b = np.asarray(b, dtype=_U64)
    return float(np.mean(a == b))

"""Brute-force numpy oracle — the ground-truth the pipeline is graded on.

The analog of the reference's all-pairs comparison tools used as accuracy
baselines (exhaustive query x ref pairs in bindash, gsearch
``src/bin/bindash.rs:120-157``).  Computes, with NO Spark and NO LSH
shortcuts:

  * exact signatures under the SAME shingle/signature config (shared code
    paths — the signature modules ARE the contract),
  * exact duplicate pairs by full verification of all candidate pairs
    (O(n^2) within pixel-shape groups at test scale),
  * exact clusters via union-find over verified pairs.

Dup-pair recall >= 0.99 (BASELINE.json) is measured against THESE pairs.
"""

from __future__ import annotations

import numpy as np

from gsearch_spark.codec import decode_image, psnr
from gsearch_spark.config import PipelineConfig
from gsearch_spark.minhash import minhash_batch
from gsearch_spark.phash import phash_bit_shingles
from gsearch_spark.shingles import caption_shingles_batch, normalize_caption
from gsearch_spark.simhash import pixel_shingles, simhash64_batch

# seeds for the two shingle modalities (shared with operators/signatures.py)
SEED_CAPTION = 0x0C41
SEED_PHASH = 0x0411A
SEED_PIXEL = 0x5171


def combined_shingles(phash: np.ndarray, captions: "list[str]",
                      cfg: PipelineConfig) -> "tuple[np.ndarray, np.ndarray]":
    """MinHash shingle multiset = phash bit n-grams ∪ caption k-grams.

    Returns (hashes uint64, row_ids int64) for a batch.
    """
    ph = phash_bit_shingles(np.asarray(phash, dtype=np.int64),
                            cfg.phash_shingle_bits,
                            seed=cfg.seed ^ SEED_PHASH)
    n, m = ph.shape
    ph_rows = np.repeat(np.arange(n, dtype=np.int64), m)
    cap_h, cap_rows = caption_shingles_batch(captions, cfg.caption_kgram,
                                             seed=cfg.seed ^ SEED_CAPTION)
    return (np.concatenate([ph.ravel(), cap_h]),
            np.concatenate([ph_rows, cap_rows]))


def oracle_minhash(phash: np.ndarray, captions: "list[str]",
                   cfg: PipelineConfig) -> np.ndarray:
    """(n, sketch_size) uint64 MinHash sketches — the signature contract."""
    h, r = combined_shingles(phash, captions, cfg)
    return minhash_batch(h, r, len(captions), cfg.sketch_size,
                         algo=cfg.algo, seed=cfg.seed)


def oracle_simhash(images: "list[bytes]", cfg: PipelineConfig) -> np.ndarray:
    """(n,) int64 SimHash over decoded-pixel feature shingles.

    Shares pixel_shingles_stream with the pipeline UDF — the streaming
    pooled decode's summation order differs from the in-memory variant in
    the last ulp, so oracle and pipeline MUST use the same one."""
    from gsearch_spark.simhash import pixel_shingles_stream
    sh = np.stack([pixel_shingles_stream(b, seed=cfg.seed ^ SEED_PIXEL)
                   for b in images])
    return simhash64_batch(sh)


def verify_pair_np(bytes_a: bytes, bytes_b: bytes, cap_a: str, cap_b: str,
                   fmt_a: str, fmt_b: str, cfg: PipelineConfig
                   ) -> "tuple[bool, float, bool]":
    """The per-pair verification invariant (BASELINE.json input_hint).

    pixel_ok:   decoded pixels identical (allclose) for lossless pairs, or
                PSNR >= cfg.psnr_min_db when either side is lossy / pixels
                differ (re-encodes, near-dup perturbations).
    caption_ok: normalized equality, or strict substring either way
                (the suffix-array pass's acceptance rule).
    Returns (is_dup, psnr_db, caption_ok).
    """
    pa_ = decode_image(bytes_a)
    pb = decode_image(bytes_b)
    if pa_.shape != pb.shape:
        p = float("-inf")
    elif np.array_equal(pa_, pb):
        p = float("inf")
    else:
        p = psnr(pa_, pb)
    pixel_ok = p >= cfg.psnr_min_db
    na, nb = normalize_caption(cap_a), normalize_caption(cap_b)
    caption_ok = (na == nb) or (na != nb and (na in nb or nb in na)
                                and min(len(na), len(nb)) > 0)
    return pixel_ok and caption_ok, p, caption_ok


def oracle_pairs_bruteforce(rows: "list[dict]", cfg: PipelineConfig
                            ) -> "set[tuple[str, str]]":
    """ALL verified dup pairs by exhaustive comparison (test scale).

    Vectorized per pixel-shape group: stacked uint8 arrays, pairwise MSE via
    batched subtraction.  Caption rule applied on top.
    """
    decoded = [decode_image(r["bytes"]) for r in rows]
    norm = [normalize_caption(r["caption"]) for r in rows]
    by_shape: "dict[tuple, list[int]]" = {}
    for i, d in enumerate(decoded):
        by_shape.setdefault(d.shape, []).append(i)
    out: "set[tuple[str, str]]" = set()
    thr_mse = (255.0 ** 2) / (10.0 ** (cfg.psnr_min_db / 10.0))
    for shape, idxs in by_shape.items():
        if len(idxs) < 2:
            continue
        stack = np.stack([decoded[i] for i in idxs]).astype(np.float32)
        flat = stack.reshape(len(idxs), -1)
        for ai in range(len(idxs)):
            d = flat[ai + 1:] - flat[ai]
            mse = np.mean(d * d, axis=1)
            close = np.nonzero(mse <= thr_mse)[0]
            for off in close:
                bi = ai + 1 + off
                i, j = idxs[ai], idxs[bi]
                na, nb = norm[i], norm[j]
                cap_ok = (na == nb) or ((na in nb or nb in na)
                                        and min(len(na), len(nb)) > 0)
                if cap_ok:
                    a, b = rows[i]["image_id"], rows[j]["image_id"]
                    out.add((a, b) if a < b else (b, a))
    return out


class UnionFind:
    def __init__(self):
        self.parent: "dict[str, str]" = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        while p != self.parent[p]:
            self.parent[p] = self.parent[self.parent[p]]
            p = self.parent[p]
        self.parent[x] = p
        return p

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-id wins: cluster_id = lexicographically smallest member
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra


def oracle_clusters(ids: "list[str]", pairs: "set[tuple[str, str]]"
                    ) -> "dict[str, str]":
    """Reference cluster assignments: union-find, id = min member."""
    uf = UnionFind()
    for i in ids:
        uf.find(i)
    for a, b in pairs:
        uf.union(a, b)
    # path-compress fully then map every member to its root
    return {i: uf.find(i) for i in ids}


def pair_recall(found: "set[tuple[str, str]]",
                truth: "set[tuple[str, str]]") -> float:
    """Dup-pair recall measured on the transitive closure is what matters
    for cluster parity; here we report plain pair recall (stricter)."""
    if not truth:
        return 1.0
    return len(found & truth) / len(truth)


def cluster_pair_recall(assign: "dict[str, str]",
                        truth_pairs: "set[tuple[str, str]]") -> float:
    """Fraction of truth dup pairs that ended up in the same cluster —
    the recall definition from BASELINE.json (cluster assignments)."""
    if not truth_pairs:
        return 1.0
    ok = sum(1 for a, b in truth_pairs
             if assign.get(a) is not None and assign.get(a) == assign.get(b))
    return ok / len(truth_pairs)

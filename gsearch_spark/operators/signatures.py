"""Stage 1: images -> signatures (the sketch aggregate, per row).

The analog of the reference's sketch stage (one signature per item,
``sketch_compressedkmer`` at gsearch ``src/dna/dnasketch.rs:327-365`` —
note the aggregate is per item, never global, so in Spark it is a **narrow
Arrow-batched map**, not a groupBy).

Output schema (FIXTURES.md §4):
    signatures(image_id string, minhash array<bigint>, simhash bigint,
               part_id int)

All math is vectorized numpy over whole Arrow batches (no per-row Python
in the MinHash path; SimHash decodes per image inside the batch, the
unavoidable codec step, cf. SURVEY §2.1 S4).  At 100 TB this stage is
embarrassingly parallel and bounded by scan + decode throughput; we keep
``bytes`` out of every later stage except verify so Parquet column pruning
drops it from all other scans.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from gsearch_spark.config import PipelineConfig
from gsearch_spark.hashing import hash_u64
from gsearch_spark.minhash import minhash_batch
from gsearch_spark.oracle import SEED_PIXEL, combined_shingles
from gsearch_spark.shingles import normalize_caption
from gsearch_spark.simhash import pixel_shingles_stream, simhash64_batch

SEED_CAPHASH = 0xCA9


def caption_hash_batch(captions: "list[str]") -> np.ndarray:
    """64-bit identity hash of the NORMALIZED caption (int64); the
    constant for empty captions is exported as EMPTY_CAPTION_HASH.

    Fully vectorized over the batch (cfg.sig_version 2; v1 was a per-row
    Python byte loop): a Rabin-Karp polynomial over the whole normalized
    byte string — H_i = sum_j buf[j] * P^(end_i-1-j) (mod 2^64), one
    segmented sum over the concatenated buffer — finalized with the
    length via hash_pair.  Order- and length-sensitive; collisions are
    2^-64-grade, which is all an identity band key needs.
    """
    from gsearch_spark.hashing import (_POLY_MULT, concat_with_offsets,
                                       hash_pair_u64)
    n = len(captions)
    normed = [normalize_caption(c).encode("utf-8") for c in captions]
    buf, offsets = concat_with_offsets(normed)
    lens = (offsets[1:] - offsets[:-1]).astype(np.uint64)
    acc = np.zeros(n, dtype=np.uint64)
    if len(buf) > 0:
        with np.errstate(over="ignore"):
            max_len = int(lens.max())
            pows = np.empty(max_len, dtype=np.uint64)
            pows[0] = np.uint64(1)
            if max_len > 1:
                np.multiply.accumulate(
                    np.full(max_len - 1, _POLY_MULT, dtype=np.uint64),
                    out=pows[1:])
            end_per_elem = np.repeat(offsets[1:], lens.astype(np.int64))
            expo = end_per_elem - 1 - np.arange(len(buf), dtype=np.int64)
            terms = buf.astype(np.uint64) * pows[expo]
            nonzero = lens > 0
            acc[nonzero] = np.add.reduceat(
                terms, offsets[:-1][nonzero.nonzero()[0]])
    return hash_pair_u64(acc, lens, seed=SEED_CAPHASH).view(np.int64)


EMPTY_CAPTION_HASH = int(caption_hash_batch([""])[0])

SIGNATURES_SCHEMA = ("image_id string, minhash array<bigint>, "
                     "simhash bigint, phash bigint, cap_hash bigint, "
                     "part_id int")


def compute_signatures(images: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """images -> signatures; narrow map, column-pruned to 4 input columns."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            phash = pdf["phash"].to_numpy(dtype=np.int64)
            captions = pdf["caption"].fillna("").tolist()
            h, r = combined_shingles(phash, captions, cfg)
            mh = minhash_batch(h, r, n, cfg.sketch_size, algo=cfg.algo,
                               seed=cfg.seed).view(np.int64)
            # STREAMING pooled decode: the full image never materializes
            # (L2-resident working set — the measured 8->32-core scaling
            # lever, see codec.decode_pooled_gray)
            shingles = np.stack([
                pixel_shingles_stream(b, seed=cfg.seed ^ SEED_PIXEL)
                for b in pdf["bytes"]])
            sh = simhash64_batch(shingles)
            cap_hash = caption_hash_batch(captions)
            yield pd.DataFrame({
                "image_id": pdf["image_id"].to_numpy(),
                "minhash": list(mh),
                "simhash": sh,
                "phash": phash,  # passthrough: phash banding + prefilter
                "cap_hash": cap_hash,  # normalized-caption identity band
                "part_id": np.full(n, pid, dtype=np.int32),
            })

    cols = images.select("image_id", "bytes", "caption", "phash")
    return cols.mapInPandas(gen, schema=SIGNATURES_SCHEMA)

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

from gsearch_spark.codec import decode_image
from gsearch_spark.config import PipelineConfig
from gsearch_spark.minhash import minhash_batch
from gsearch_spark.oracle import SEED_PIXEL, combined_shingles
from gsearch_spark.simhash import pixel_shingles, simhash64_batch

SIGNATURES_SCHEMA = ("image_id string, minhash array<bigint>, "
                     "simhash bigint, part_id int")


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
            shingles = np.stack([
                pixel_shingles(decode_image(b), seed=cfg.seed ^ SEED_PIXEL)
                for b in pdf["bytes"]])
            sh = simhash64_batch(shingles)
            yield pd.DataFrame({
                "image_id": pdf["image_id"].to_numpy(),
                "minhash": list(mh),
                "simhash": sh,
                "part_id": np.full(n, pid, dtype=np.int32),
            })

    cols = images.select("image_id", "bytes", "caption", "phash")
    return cols.mapInPandas(gen, schema=SIGNATURES_SCHEMA)

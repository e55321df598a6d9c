"""Pseudo-caption prediction from raw pixels — the FragGeneScanRs
analog (reference: DNA -> amino-acid gene prediction so the AA pathway
can sketch sequences that arrive without annotation,
``binaux/src/bin/FragGeneScanRs.rs:26-120``, ``README.md:346-351``).

Domain swap: a web-scale image corpus arrives with many caption-less
rows, and for those the caption-shingle half of the signature (and the
caption-equality verify band) is dead weight.  This operator "predicts
the genes": it decodes the payload and emits a deterministic
visual-word token string — a 4x4 grid of per-cell mean RGB, each
channel quantized to 2 bits, one token per cell (``v<cell><r><g><b>``)
— that feeds the EXISTING caption machinery (normalization, k-gram
shingles, MinHash, caption-identity band) unchanged.  Like the
reference it is a standalone preprocessing step run BEFORE the build
(``python -m gsearch_spark predict-captions``), not a pipeline stage:
the build consumes its output table exactly as it would consume real
captions.

Robustness contract: the lossy codec's quantization shifts channel
means by at most ±step/2 (±2.5 at q90), so a 2-bit channel code
(bin width 64) flips only when a cell mean sits within ±2.5 of a bin
edge — near-dup re-encodes share almost all 16 tokens and the caption
k-gram MinHash still bands them together (tested).

Scale shape: one ``mapInPandas`` projection, Arrow-batched, bytes
stay in-task, no shuffle; caption-less rows only (captioned rows pass
through untouched with ``caption_predicted = false``).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from gsearch_spark.codec import decode_image

GRID = 4          # 4x4 cells -> 16 tokens per image
CHANNEL_BITS = 2  # 2 bits per channel -> 64 visual-word colors


def pseudo_caption(pixels: np.ndarray) -> str:
    """Deterministic visual-word string for an (h, w, 3) uint8 array."""
    h, w = pixels.shape[:2]
    # integer bin edges, area division — the same grid-pooling rule as
    # phash._pool_to, so cells cover the image exactly
    re = (np.arange(GRID + 1) * h) // GRID
    ce = (np.arange(GRID + 1) * w) // GRID
    step = 256 >> CHANNEL_BITS
    toks = []
    for i in range(GRID):
        for j in range(GRID):
            cell = pixels[re[i]:re[i + 1], ce[j]:ce[j + 1]]
            r, g, b = (int(x) // step for x in cell.reshape(-1, 3)
                       .mean(axis=0))
            toks.append(f"v{i * GRID + j:02d}{r}{g}{b}")
    return " ".join(toks)


def extract_pseudo_captions(images: DataFrame) -> DataFrame:
    """Fill empty/null captions with predicted visual-word strings.

    Returns the input schema plus ``caption_predicted`` boolean; rows
    that already carry a caption pass through byte-identical.
    """
    from pyspark.sql.types import BooleanType, StructField, StructType
    schema = StructType(list(images.schema.fields)
                        + [StructField("caption_predicted", BooleanType())])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cap = pdf["caption"].fillna("")
            need = cap.str.strip() == ""
            if need.any():
                pdf = pdf.copy()
                pdf.loc[need, "caption"] = [
                    pseudo_caption(decode_image(b))
                    for b in pdf.loc[need, "bytes"]]
            pdf["caption_predicted"] = need.to_numpy()
            yield pdf

    return images.mapInPandas(gen, schema)


def q_caption_extract_tokens(spark, sf_dir: str) -> DataFrame:
    """Driver query (rows-only; pixel-bound, pytest-oracled): blank the
    caption of an md5-derived ~1/8 subset of the fixture and predict
    pseudo-captions for exactly those rows."""
    images = spark.read.parquet(f"{sf_dir}/images.parquet")
    blanked = images.withColumn(
        "caption",
        F.when(F.conv(F.substring(F.md5("image_id"), 1, 2), 16, 10)
               .cast("int") % 8 == 0, F.lit(None))
        .otherwise(F.col("caption")))
    return (extract_pseudo_captions(blanked)
            .filter("caption_predicted")
            .select("image_id", F.col("caption").alias("pseudo_caption")))

"""Pseudo-caption prediction (FragGeneScanRs analog): numpy parity,
captioned-row passthrough, lossy re-encode token stability, and the
predict-captions CLI end-to-end feeding the caption pathway.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
from pyspark.sql import Row

from gsearch_spark.codec import decode_image, encode_image
from gsearch_spark.operators.captionextract import (GRID,
                                                    extract_pseudo_captions,
                                                    pseudo_caption)

ROOT = "/tmp/gsearch_spark_captionextract_test"


def _img(seed: int, w: int = 48, h: int = 32) -> np.ndarray:
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h, w, 3))
    return base.astype(np.uint8)


def _rows():
    return [
        Row(image_id="a", bytes=encode_image(_img(1), "png"), w=48, h=32,
            fmt="png", caption=None, phash=0),
        Row(image_id="b", bytes=encode_image(_img(2), "png"), w=48, h=32,
            fmt="png", caption="   ", phash=0),
        Row(image_id="c", bytes=encode_image(_img(3), "png"), w=48, h=32,
            fmt="png", caption="a real caption", phash=0),
    ]


def test_numpy_parity_and_passthrough(spark):
    out = {r.image_id: r for r in
           extract_pseudo_captions(spark.createDataFrame(_rows()))
           .collect()}
    # caption-less rows: Spark output == direct numpy computation
    for iid, seed in (("a", 1), ("b", 2)):
        assert out[iid].caption == pseudo_caption(_img(seed))
        assert out[iid].caption_predicted
        assert len(out[iid].caption.split()) == GRID * GRID
    # captioned row passes through byte-identical, flagged false
    assert out["c"].caption == "a real caption"
    assert not out["c"].caption_predicted


def test_tokens_stable_under_lossy_reencode():
    """A q92 re-encode shifts cell means by <= step/2 = 2, so almost all
    16 visual words survive — the property that lets the caption MinHash
    band a caption-less near-dup pair."""
    pix = _img(7, 64, 64)
    lossy = decode_image(encode_image(pix, "jpeg", quality=92))
    t0 = pseudo_caption(pix).split()
    t1 = pseudo_caption(lossy).split()
    assert sum(a == b for a, b in zip(t0, t1)) >= 14


def test_exact_dup_gets_identical_pseudo_caption(spark):
    """Two caption-less rows with the same payload bytes predict the
    SAME caption => identical cap_hash => the caption-identity verify
    band still collapses them."""
    b = encode_image(_img(9), "png")
    df = spark.createDataFrame(
        [("x", b, 48, 32, "png", None, 0),
         ("y", b, 48, 32, "png", None, 0)],
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash bigint")
    caps = [r.caption for r in extract_pseudo_captions(df).collect()]
    assert caps[0] == caps[1]


def test_cli_predict_captions_e2e(spark, capsys):
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(ROOT)
    from gsearch_spark.__main__ import main as cli_main
    spark.createDataFrame(_rows()).write.parquet(f"{ROOT}/images.parquet")
    rc = cli_main(["predict-captions", "-d", f"{ROOT}/images.parquet",
                   "-o", f"{ROOT}/out.parquet"])
    assert rc == 0
    assert "2 captions predicted" in capsys.readouterr().out
    out = spark.read.parquet(f"{ROOT}/out.parquet")
    assert out.count() == 3
    assert out.filter("caption is null or trim(caption) = ''").count() == 0
    shutil.rmtree(ROOT, ignore_errors=True)

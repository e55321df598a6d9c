"""Deterministic synthetic ``images`` fixture generator (FIXTURES.md §1).

Produces the Iceberg-shaped input table from BASELINE.json's input_hint:

    images(image_id string, bytes binary, w int, h int, fmt string,
           caption string, phash bigint)

plus ground-truth tables ``truth_clusters``, ``truth_pairs`` and
``truth_negatives``.  Mirrors the reference's published-test-data approach
(gsearch ``README.md:607-660``): a known input with known expected
neighbor structure.

Key design point: **every output row is a pure function of (seed, row
ordinal)** — duplicate rows regenerate their source's pixels from the
source ordinal instead of copying bytes across rows.  That makes
generation embarrassingly parallel (the Spark path fans out over an id
range with ``mapInPandas``) and bit-identical regardless of partitioning.

Duplicate structure per FIXTURES.md (fractions of n_base):
  exact 5% | re-encoded 5% | near-dup pixels 5% | caption-substring 3%
  | hard negative 5% | skew bomb 2% (bench 10%) | rest singleton
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from gsearch_spark.codec import (LOSSY_FMTS, PooledGrayAccumulator,
                                 StreamEncoder, _quant_step, encode_image)
from gsearch_spark.hashing import hash_pair_u64
from gsearch_spark.phash import phash64, phash64_from_pooled

SIZES = np.array([32, 48, 64], dtype=np.int32)
FMTS = ("png", "jpeg")
VOCAB_SIZE = 500

KIND_BASE = 0
KIND_EXACT = 1
KIND_REENC = 2
KIND_NEARDUP = 3
KIND_SUBDUP = 4
KIND_HARDNEG = 5
KIND_SKEW = 6

KIND_NAMES = {KIND_EXACT: "exact", KIND_REENC: "reencoded",
              KIND_NEARDUP: "neardup", KIND_SUBDUP: "suffix",
              KIND_HARDNEG: "hard_negative", KIND_SKEW: "skew"}


def _vocab(seed: int) -> "list[str]":
    rng = np.random.default_rng(seed ^ 0x50CAB)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = []
    for _ in range(VOCAB_SIZE):
        n = int(rng.integers(3, 9))
        words.append("".join(letters[rng.integers(0, 26, n)]))
    return words


@dataclass(frozen=True)
class FixturePlan:
    """The full row layout, derived from (n_base, seed, skew_fraction) only.

    Arrays are indexed by output ordinal:
      kind[i]  - row kind
      src[i]   - source BASE ordinal for dup/negative rows (else i itself)
    """
    n_base: int
    seed: int
    kind: np.ndarray
    src: np.ndarray

    @property
    def n_total(self) -> int:
        return len(self.kind)


@functools.lru_cache(maxsize=8)
def make_plan(n_base: int, seed: int = 42,
              skew_fraction: float = 0.02) -> FixturePlan:
    """Cached: the plan costs ~15 us/row to derive (the per-index rng in
    _caption_is_empty dominates) and Spark tasks re-derive it; worker
    reuse makes the cache hit for every task after a worker's first.
    Callers must treat the returned arrays as immutable (they do)."""
    rng = np.random.default_rng(seed ^ 0x9A7)
    perm = rng.permutation(n_base)
    n_exact = int(n_base * 0.05)
    n_reenc = int(n_base * 0.05)
    n_near = int(n_base * 0.05)
    n_sub = int(n_base * 0.03)
    n_hneg = int(n_base * 0.05)
    n_skew = max(2, int(n_base * skew_fraction))
    pos = 0
    groups = {}
    for name, n in (("exact", n_exact), ("reenc", n_reenc), ("near", n_near),
                    ("sub", n_sub), ("hneg", n_hneg)):
        groups[name] = perm[pos:pos + n]
        pos += n

    # empty-caption bases can't source a strict-substring dup; swap them
    # with unused bases from the tail of the permutation
    empty_mask = _caption_is_empty(np.arange(n_base), seed)
    sub_src = groups["sub"]
    bad = empty_mask[sub_src]
    if bad.any():
        spare = perm[pos:][~empty_mask[perm[pos:]]]
        sub_src = sub_src.copy()
        sub_src[bad] = spare[:int(bad.sum())]
        groups["sub"] = sub_src

    kinds = [np.zeros(n_base, dtype=np.int8)]
    srcs = [np.arange(n_base, dtype=np.int64)]
    for name, code in (("exact", KIND_EXACT), ("reenc", KIND_REENC),
                       ("near", KIND_NEARDUP), ("sub", KIND_SUBDUP),
                       ("hneg", KIND_HARDNEG)):
        kinds.append(np.full(len(groups[name]), code, dtype=np.int8))
        srcs.append(groups[name].astype(np.int64))
    kinds.append(np.full(n_skew, KIND_SKEW, dtype=np.int8))
    srcs.append(np.full(n_skew, -1, dtype=np.int64))
    return FixturePlan(n_base=n_base, seed=seed,
                       kind=np.concatenate(kinds), src=np.concatenate(srcs))


# ---------------------------------------------------------------- pixels

_BAND_ROWS = 16  # synthesis band height: keeps the live set L2-resident


def _synth_params(base_idx: int, seed: int,
                  size_scale: int = 1) -> "tuple[int, int, list]":
    """Pattern parameters for one base image (pure function of inputs)."""
    rng = np.random.default_rng((seed << 20) ^ base_idx)
    w = int(SIZES[rng.integers(0, len(SIZES))]) * size_scale
    h = int(SIZES[rng.integers(0, len(SIZES))]) * size_scale
    chans = []
    for _ in range(3):
        ax, ay = rng.uniform(-3, 3, 2)
        phase = rng.uniform(0, 2 * np.pi)
        freq = rng.uniform(0.05, 0.4)
        chans.append((ax, ay, phase, freq))
    return w, h, chans


def _synth_band(base_idx: int, seed: int, w: int, chans: "list",
                r0: int, r1: int) -> np.ndarray:
    """Rows [r0, r1) of one base pattern -> (r1-r0, w, 3) uint8.

    Noise comes from a per-(image, band, channel) SeedSequence stream so
    ANY horizontal band is synthesizable independently — the property the
    streaming composer needs (round 2 drew one (h, w) normal per channel,
    which forced materializing the full float64 image, the dominant >L2
    memory traffic in the scaling bench).  Band boundaries are fixed at
    ``_BAND_ROWS`` so the pixels are a pure function of (seed, ordinal)
    regardless of how callers batch rows.
    """
    x = np.arange(w, dtype=np.float64)[None, :]
    y = np.arange(r0, r1, dtype=np.float64)[:, None]
    out = np.empty((r1 - r0, w, 3), dtype=np.float64)
    for c, (ax, ay, phase, freq) in enumerate(chans):
        nrng = np.random.default_rng([seed, base_idx, r0, c])
        out[..., c] = (128.0 + ax * x + ay * y
                       + 60.0 * np.sin(freq * (x + y) + phase)
                       + nrng.normal(0, 12, (r1 - r0, w)))
    return np.clip(out, 0, 255).astype(np.uint8)


def _base_pixels(base_idx: int, seed: int, size_scale: int = 1) -> np.ndarray:
    """Full deterministic RGB pattern (tests / small images); identical
    values to the band-streamed path by construction."""
    w, h, chans = _synth_params(base_idx, seed, size_scale)
    return np.concatenate(
        [_synth_band(base_idx, seed, w, chans, r0, min(r0 + _BAND_ROWS, h))
         for r0 in range(0, h, _BAND_ROWS)], axis=0)


def _neardup_perturbation(ordinal: int, seed: int, n_flat: int
                          ) -> "tuple[np.ndarray, np.ndarray]":
    """(positions, ±1 signs) for the near-dup kind: ~2% of flat pixel
    values get ±1.  Hash-derived (vectorized, band-filterable) instead of
    rng.choice, which needs an O(n_flat) permutation buffer."""
    n_perturb = max(1, int(n_flat * 0.02))
    hs = hash_pair_u64(np.arange(n_perturb, dtype=np.uint64),
                       np.full(n_perturb, ordinal, dtype=np.uint64),
                       seed=(seed << 23) & 0xFFFFFFFF)
    pos = (hs % np.uint64(n_flat)).astype(np.int64)
    sign = np.where((hs >> np.uint64(63)).astype(bool), 1, -1) \
        .astype(np.int16)
    return pos, sign


def _perturb_band(band: np.ndarray, pos: np.ndarray, sign: np.ndarray,
                  w: int, r0: int) -> np.ndarray:
    lo = r0 * w * 3
    hi = lo + band.size
    m = (pos >= lo) & (pos < hi)
    if not m.any():
        return band
    flat = band.astype(np.int16).reshape(-1)
    np.add.at(flat, pos[m] - lo, sign[m])
    return np.clip(flat, 0, 255).astype(np.uint8).reshape(band.shape)


def _base_fmt(base_idx: int, seed: int) -> str:
    rng = np.random.default_rng((seed << 21) ^ base_idx)
    return FMTS[int(rng.integers(0, 2))]


def _caption_words(base_idx: int, seed: int, vocab: "list[str]") -> "list[str]":
    rng = np.random.default_rng((seed << 22) ^ base_idx)
    if rng.uniform() < 0.05:  # ~5% empty captions (adversarial)
        return []
    n = int(rng.integers(3, 21))
    return [vocab[i] for i in rng.integers(0, VOCAB_SIZE, n)]


def _caption_is_empty(base_idx: np.ndarray, seed: int) -> np.ndarray:
    out = np.zeros(len(base_idx), dtype=bool)
    for j, i in enumerate(base_idx):
        rng = np.random.default_rng((seed << 22) ^ int(i))
        out[j] = rng.uniform() < 0.05
    return out


def _skew_pixels() -> np.ndarray:
    return np.zeros((64, 64, 3), dtype=np.uint8)


def generate_row(ordinal: int, plan_kind: int, src: int, seed: int,
                 vocab: "list[str]", size_scale: int = 1) -> "dict":
    """One output row (pure function of its inputs), composed in
    ``_BAND_ROWS``-row streaming bands: synthesize -> (quantize chain /
    perturb) -> encode + phash-pool, so the full image never
    materializes (the fixture generator stands in for source decode in
    the scaling bench; its full-image float64 working set was the
    dominant >L2 memory traffic there).

    Per-kind pixel semantics (FIXTURES.md):
      BASE/EXACT/SUBDUP  encode the pattern at q92 in its source format;
      REENC    re-encode the DECODED source as JPEG (q90 if the source
               was JPEG, else q92) — since the lossy codec's decode is a
               per-pixel quantization, decode(encode(px)) is applied as
               a per-band quantize chain, no round-trip needed;
      NEARDUP  ±1 on ~2% of decoded values, stored lossless;
      HARDNEG  fresh pattern keyed by ordinal, same caption as src;
      SKEW     the constant black 64x64 PNG.
    """
    image_id = f"img_{ordinal:08d}"
    if plan_kind == KIND_SKEW:
        px = _skew_pixels()
        data = encode_image(px, "png")
        return {"image_id": image_id, "bytes": data,
                "w": px.shape[1], "h": px.shape[0], "fmt": "png",
                "caption": "", "phash": phash64(px)}

    base_key = src
    words = _caption_words(src, seed, vocab)
    caption = " ".join(words)
    src_fmt = _base_fmt(src, seed)
    out_fmt, final_fmt, final_q = src_fmt, src_fmt, 92
    pre_steps: "list[int]" = []   # decode(encode(...)) quantize chain
    perturb = None
    if plan_kind in (KIND_BASE, KIND_EXACT):
        pass
    elif plan_kind == KIND_REENC:
        if src_fmt in LOSSY_FMTS:
            pre_steps = [_quant_step(92)]
        out_fmt = final_fmt = "jpeg"
        final_q = 90 if src_fmt == "jpeg" else 92
    elif plan_kind == KIND_NEARDUP:
        if src_fmt in LOSSY_FMTS:
            pre_steps = [_quant_step(92)]
        out_fmt = final_fmt = "png"
        perturb = True
    elif plan_kind == KIND_SUBDUP:
        # identical bytes; caption becomes a strict superstring
        rng = np.random.default_rng((seed << 24) ^ ordinal)
        extra = [vocab[i] for i in rng.integers(0, VOCAB_SIZE, 3)]
        caption = " ".join(words + extra)
    elif plan_kind == KIND_HARDNEG:
        base_key = ordinal + 10_000_019
        out_fmt = final_fmt = "png"
    else:
        raise ValueError(plan_kind)

    w, h, chans = _synth_params(base_key, seed, size_scale)
    if perturb:
        pos, sign = _neardup_perturbation(ordinal, seed, h * w * 3)
    enc = StreamEncoder(w, h, final_fmt, quality=final_q)
    pool = PooledGrayAccumulator(w, h, grid=32)
    for r0 in range(0, h, _BAND_ROWS):
        band = _synth_band(base_key, seed, w, chans, r0,
                           min(r0 + _BAND_ROWS, h))
        for step in pre_steps:
            band = np.clip((band.astype(np.int32) // step) * step
                           + step // 2, 0, 255).astype(np.uint8)
        if perturb:
            band = _perturb_band(band, pos, sign, w, r0)
        band_q = enc.quantize(band)   # == decode_image(bytes) values
        enc.feed_quantized(band_q)
        pool.feed(r0, band_q)
    return {
        "image_id": image_id,
        "bytes": enc.finish(),
        "w": w,
        "h": h,
        "fmt": out_fmt,
        "caption": caption,
        "phash": phash64_from_pooled(pool.result()),
    }


IMAGES_SCHEMA = pa.schema([
    ("image_id", pa.string()), ("bytes", pa.binary()),
    ("w", pa.int32()), ("h", pa.int32()), ("fmt", pa.string()),
    ("caption", pa.string()), ("phash", pa.int64()),
])


def generate_rows_arrow(ordinals: np.ndarray, plan: FixturePlan,
                        vocab: "list[str]", size_scale: int = 1) -> pa.Table:
    rows = [generate_row(int(i), int(plan.kind[i]), int(plan.src[i]),
                         plan.seed, vocab, size_scale) for i in ordinals]
    cols = {name: [r[name] for r in rows] for name in IMAGES_SCHEMA.names}
    return pa.table(cols, schema=IMAGES_SCHEMA)


# ---------------------------------------------------------------- truth

def truth_tables(plan: FixturePlan) -> "tuple[pa.Table, pa.Table, pa.Table]":
    """(truth_clusters, truth_pairs, truth_negatives) from the plan alone."""
    ids = np.array([f"img_{i:08d}" for i in range(plan.n_total)])
    base_id = np.array([f"img_{i:08d}" for i in range(plan.n_base)])
    cluster = ids.copy()          # default: own singleton cluster
    pairs_a, pairs_b, pairs_k = [], [], []
    neg_a, neg_b = [], []
    skew_seed = None
    for i in range(plan.n_base, plan.n_total):
        k = int(plan.kind[i])
        if k == KIND_SKEW:
            if skew_seed is None:
                skew_seed = ids[i]
            else:
                cluster[i] = skew_seed
                pairs_a.append(skew_seed); pairs_b.append(ids[i])
                pairs_k.append("skew")
        elif k == KIND_HARDNEG:
            s = int(plan.src[i])
            neg_a.append(base_id[s]); neg_b.append(ids[i])
        else:
            s = int(plan.src[i])
            cluster[i] = base_id[s]
            pairs_a.append(base_id[s]); pairs_b.append(ids[i])
            pairs_k.append(KIND_NAMES[k])
    clusters = pa.table({"image_id": ids, "cluster_id": cluster})
    pairs = pa.table({"a": pairs_a, "b": pairs_b, "kind": pairs_k})
    negatives = pa.table({"a": neg_a, "b": neg_b})
    return clusters, pairs, negatives


# ---------------------------------------------------------------- writers

def write_fixture_local(out_dir: str, n_base: int, seed: int = 42,
                        skew_fraction: float = 0.02) -> str:
    """Single-process generation (tests / small scales)."""
    os.makedirs(out_dir, exist_ok=True)
    plan = make_plan(n_base, seed, skew_fraction)
    vocab = _vocab(seed)
    tbl = generate_rows_arrow(np.arange(plan.n_total), plan, vocab)
    pq.write_table(tbl, os.path.join(out_dir, "images.parquet"))
    clusters, pairs, negatives = truth_tables(plan)
    pq.write_table(clusters, os.path.join(out_dir, "truth_clusters.parquet"))
    pq.write_table(pairs, os.path.join(out_dir, "truth_pairs.parquet"))
    pq.write_table(negatives, os.path.join(out_dir, "truth_negatives.parquet"))
    return out_dir


def write_fixture_spark(spark, out_dir: str, n_base: int, seed: int = 42,
                        skew_fraction: float = 0.02,
                        partitions: int = 32, size_scale: int = 1) -> str:
    """Distributed generation: fan the ordinal range out over executors.

    Each task regenerates the (cheap) plan and materializes only its slice
    — deterministic output irrespective of partitioning, the property the
    reference loses with arrival-order rank assignment (gsearch
    ``src/dna/dnasketch.rs:427-433``) and we deliberately keep.
    """
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    plan = make_plan(n_base, seed, skew_fraction)
    n_total = plan.n_total

    def gen(batches):
        p = make_plan(n_base, seed, skew_fraction)
        vocab = _vocab(seed)
        for pdf in batches:
            ords = pdf["id"].to_numpy()
            tbl = generate_rows_arrow(ords, p, vocab, size_scale)
            yield tbl.to_pandas()

    schema = ("image_id string, bytes binary, w int, h int, "
              "fmt string, caption string, phash bigint")
    df = (spark.range(0, n_total, 1, partitions)
          .mapInPandas(gen, schema=schema))
    df.write.mode("overwrite").parquet(os.path.join(out_dir, "images.parquet"))
    clusters, pairs, negatives = truth_tables(plan)
    pq.write_table(clusters, os.path.join(out_dir, "truth_clusters.parquet"))
    pq.write_table(pairs, os.path.join(out_dir, "truth_pairs.parquet"))
    pq.write_table(negatives, os.path.join(out_dir, "truth_negatives.parquet"))
    return out_dir

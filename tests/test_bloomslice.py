"""A10 bitsliced Bloom containment screen (BIGSI/COBS analog,
reference binaux/src/bin/bigsig.rs:193-317): oracle invariants on the
sf0.01 documents fixture.  Value-level parity vs DuckDB is gated by
tests/test_entry_parity.py (bloom_bitslice_screen)."""

from __future__ import annotations

import duckdb

from gsearch_spark.operators.bloomslice import (MIN_CONTAINMENT, TARGET_MOD,
                                                q_bloom_bitslice_screen)
from gsearch_spark.operators.textdedup import (DUP_OFFSET, N_DUP_DOCS,
                                               NEAR_DROP_WORDS)

SF_DIR = "/root/testdata/sf0.01"


def _shingle_sets() -> "dict[int, frozenset[str]]":
    """Ground truth: the same word-3-gram shingle sets the SQL builds
    (incl. the planted exact/near copies), computed in plain python."""
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')").fetchall()
    texts = dict(rows)
    for d in list(texts):
        if d < N_DUP_DOCS:
            texts[d + DUP_OFFSET] = texts[d]
            toks = texts[d].strip().split()
            if len(toks) > NEAR_DROP_WORDS + 3:
                texts[d + 2 * DUP_OFFSET] = " ".join(
                    toks[:len(toks) - NEAR_DROP_WORDS])
    out = {}
    for d, t in texts.items():
        toks = t.strip().lower().split()
        out[d] = frozenset(" ".join(toks[i:i + 3])
                           for i in range(len(toks) - 2))
    return out


def test_bloom_screen_bounds_true_containment(spark):
    rows = q_bloom_bitslice_screen(spark, SF_DIR).collect()
    got = {(r["query_id"], r["target_id"]): r["containment"] for r in rows}
    assert got
    sets = _shingle_sets()

    targets = sorted({t for _, t in got})
    assert targets and all(t % TARGET_MOD == 0 for t in targets)
    # no false negatives: indexed targets self-screen at exactly 1.0,
    # and near-dup copies (strict shingle subsets) of indexed originals
    # score exactly 1.0
    for t in targets:
        assert got.get((t, t)) == 1.0
    for q in {q for q, _ in got if q >= 2 * DUP_OFFSET}:
        orig = q - 2 * DUP_OFFSET
        if orig % TARGET_MOD == 0:
            assert got.get((q, orig)) == 1.0

    # Bloom containment must UPPER-BOUND true containment (false
    # positives only inflate), and the inflation stays under the
    # deterministic FP floor of the M=8192 h=2 configuration
    for (q, t), v in got.items():
        qs, ts = sets[q], sets[t]
        true = len(qs & ts) / len(qs)
        assert v >= true - 5e-7, (q, t, v, true)  # 6-dec rounding
        assert v - true <= 0.15, (q, t, v, true)
        if true == 1.0:
            assert v == 1.0
    assert all(v >= MIN_CONTAINMENT for v in got.values())


def test_bloom_significance_matches_formula(spark):
    """C7: neg_ln_p equals the Chernoff/KL bound recomputed in python
    from the integer inputs (contained, n, bits_set) — and subset
    matches (c == 1) are overwhelmingly significant while the FP floor
    stays near zero."""
    import math

    from gsearch_spark.operators.bloomslice import (
        N_HASHES, q_bloom_screen_significance)

    rows = q_bloom_screen_significance(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        n = r["n_shingles"]
        c = r["contained"] / n
        p2 = r["fill"] ** N_HASHES      # fill rounded to 6 decimals
        if c >= 1.0:
            want = n * math.log(1.0 / p2)
        elif c <= p2:
            want = 0.0
        else:
            want = n * (c * math.log(c / p2)
                        + (1.0 - c) * math.log((1.0 - c) / (1.0 - p2)))
        # tolerance covers the 6-decimal rounding of fill feeding p2
        assert abs(r["neg_ln_p"] - want) < max(0.05, n * 1e-3),             (r["query_id"], r["target_id"], r["neg_ln_p"], want)
        assert r["neg_ln_p"] >= 0.0
    part = [r["neg_ln_p"] for r in rows if r["containment"] < 1.0]
    full = [r["neg_ln_p"] for r in rows if r["containment"] == 1.0]
    assert full and min(full) > 50   # subset matches: overwhelming
    assert part and min(part) < 20   # FP floor: not "significant"

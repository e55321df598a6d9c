"""Stage 3b: suffix-array caption-substring pass (north_rule J7).

Not present in the reference (its only join predicate is metric
proximity, SURVEY §2.5); mandated by BASELINE.json: exact
caption-substring duplicates — same pixels, one caption a strict
substring of the other — must be caught even when shingle Jaccard falls
below the LSH threshold.

Scale design: substring pairs require co-location, and FIXTURES.md plants
them with identical pixels, so the **phash is the co-location key**
(identical pixels => identical phash).  ``applyInPandas`` groups captions
by phash; within each group a *generalized suffix array* over the
concatenated normalized captions (prefix-doubling construction, O(n log^2
n), fully numpy) locates every caption that occurs inside another.  Exact
caption *equality* across different pixels is the MinHash/exact path's
job, not this pass's.

COVERAGE CONTRACT: this pass catches substring-caption dups with
IDENTICAL pixels (same phash).  A pair that is BOTH lossy-re-encoded
(phash flips bits) AND caption-truncated lands in different phash
groups and is NOT this pass's job — it is caught by the phash
chunk-COMBO band net (exact Hamming <= phash_chunks - phash_combo over
ALL rows: 2 by default, 4 with the wide-radius config — see
banding.explode_phash_bands), and verify's substring rule then accepts
the pair.  tests/test_suffix_array.py::
test_reencode_plus_truncation_caught_by_phash_net proves BOTH radii
end-to-end with an adversarial fixture.

Within a group, images sharing the same caption value are represented by
their minimum image_id — identical (pixels, caption) rows are already
connected by the exact/minhash path, so representative edges keep the
component connected without emitting cliques.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from gsearch_spark.shingles import normalize_caption

PAIRS_SCHEMA = "a string, b string, src string"
_SEP = "\x01"
_GROUP_CAPTION_CAP = 10_000  # guard: distinct captions per phash group


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array by prefix doubling (numpy, O(n log^2 n))."""
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    sa = np.argsort(s, kind="stable").astype(np.int64)
    rank = np.empty(n, dtype=np.int64)
    sorted_s = s[sa]
    rank[sa] = np.cumsum(
        np.concatenate([[0], (sorted_s[1:] != sorted_s[:-1]).astype(np.int64)]))
    k = 1
    while k < n:
        r2 = np.full(n, -1, dtype=np.int64)
        r2[:n - k] = rank[k:]
        order = np.lexsort((r2, rank))
        ra, rb = rank[order], r2[order]
        changed = np.concatenate(
            [[0], ((ra[1:] != ra[:-1]) | (rb[1:] != rb[:-1])).astype(np.int64)])
        new_rank = np.cumsum(changed)
        rank = np.empty(n, dtype=np.int64)
        rank[order] = new_rank
        sa = order.astype(np.int64)
        if new_rank[-1] == n - 1:
            break
        k *= 2
    return sa


def _suffix_ge(text: np.ndarray, pos: int, pat: np.ndarray) -> bool:
    """True if suffix text[pos:] >= pat (lexicographic, numpy compare)."""
    seg = text[pos:pos + len(pat)]
    m = min(len(seg), len(pat))
    neq = np.nonzero(seg[:m] != pat[:m])[0]
    if len(neq):
        return seg[neq[0]] > pat[neq[0]]
    return len(seg) >= len(pat)  # equal prefix: longer-or-equal suffix wins


def _suffix_startswith(text: np.ndarray, pos: int, pat: np.ndarray) -> bool:
    seg = text[pos:pos + len(pat)]
    return len(seg) == len(pat) and bool(np.all(seg == pat))


def find_pattern_range(text: np.ndarray, sa: np.ndarray, pat: np.ndarray
                       ) -> "tuple[int, int]":
    """Binary-search the SA for the interval of suffixes starting with pat."""
    lo, hi = 0, len(sa)
    while lo < hi:  # first suffix >= pat
        mid = (lo + hi) // 2
        if _suffix_ge(text, int(sa[mid]), pat):
            hi = mid
        else:
            lo = mid + 1
    start = lo
    hi = len(sa)
    while lo < hi:  # first suffix NOT starting with pat
        mid = (lo + hi) // 2
        if _suffix_startswith(text, int(sa[mid]), pat):
            lo = mid + 1
        else:
            hi = mid
    return start, lo


def containment_pairs_in_group(captions: "list[str]",
                               owners: "list[str]") -> "list[tuple[str, str]]":
    """Pairs (rep_a, rep_b) where caption of one strictly contains the
    other's.  ``captions`` are normalized and deduplicated; ``owners`` are
    the representative image_ids.  Matches cannot cross caption
    boundaries: the separator never occurs inside a pattern.
    """
    concat = _SEP.join(captions) + _SEP
    text = np.frombuffer(concat.encode("utf-8", "surrogatepass"),
                         dtype=np.uint8)
    # recompute byte offsets of each caption in the utf-8 buffer
    starts = np.zeros(len(captions) + 1, dtype=np.int64)
    acc = 0
    for i, c in enumerate(captions):
        starts[i] = acc
        acc += len(c.encode("utf-8", "surrogatepass")) + 1
    starts[-1] = acc
    sa = suffix_array(text)
    out = []
    for i, c in enumerate(captions):
        pat = np.frombuffer(c.encode("utf-8", "surrogatepass"), dtype=np.uint8)
        if len(pat) == 0:
            continue
        lo, hi = find_pattern_range(text, sa, pat)
        if hi - lo <= 0:
            continue
        pos = np.sort(sa[lo:hi])
        owner_idx = np.searchsorted(starts, pos, side="right") - 1
        for oi in np.unique(owner_idx):
            if oi != i:  # occurs inside a DIFFERENT caption => containment
                a, b = owners[i], owners[int(oi)]
                out.append((a, b) if a < b else (b, a))
    return out


def group_containment_pairs(pdf: pd.DataFrame,
                            cap: int = _GROUP_CAPTION_CAP) -> pd.DataFrame:
    """One phash group -> suffix candidate pairs (a, b, src).

    Groups with more than ``cap`` distinct captions run the suffix array
    over the ``cap`` smallest; the TAIL IS NOT DROPPED — every tail
    owner gets star candidate edges to the 2 smallest in-budget owners
    (2 per row, never O(n^2)).  Verify applies the real containment
    rule, so the extra candidates cost one check each and lose nothing;
    the truncation is logged, never silent.
    """
    normed = pdf["caption"].fillna("").map(normalize_caption)
    mask = normed.str.len() > 0
    empty = pd.DataFrame({"a": [], "b": [], "src": []})
    if mask.sum() < 2:
        return empty
    sub = pd.DataFrame({"caption": normed[mask].to_numpy(),
                        "image_id": pdf.loc[mask, "image_id"].to_numpy()})
    reps = sub.groupby("caption", sort=True)["image_id"].min()
    if len(reps) < 2:
        return empty
    captions = list(reps.index[:cap])
    owners = list(reps.to_numpy()[:cap])
    pairs = containment_pairs_in_group(captions, owners)
    if len(reps) > cap:
        import logging
        logging.getLogger(__name__).warning(
            "suffix pass: phash group with %d distinct captions exceeds "
            "cap %d; emitting star edges for the tail", len(reps), cap)
        hubs = sorted(owners)[:2]
        for t in reps.to_numpy()[cap:]:
            for h in hubs:
                pairs.append((h, t) if h < t else (t, h))
    if not pairs:
        return empty
    a, b = zip(*sorted(set(pairs)))
    return pd.DataFrame({"a": list(a), "b": list(b), "src": "suffix"})


def suffix_candidate_pairs(images: DataFrame) -> DataFrame:
    """images -> suffix-source candidate pairs, grouped by phash.

    Scale shape: a JVM-side prefilter keeps only phash groups with >= 2
    DISTINCT (JVM-normalized) non-empty captions — on real data the vast
    majority of groups are singletons or same-caption dup stacks, so the
    Python suffix-array pass only ever sees the tiny eligible remainder.
    The JVM normalization (``\\s`` is ASCII-only) collapses no more than
    the Python one (Unicode ``\\s+``), so the prefilter can only
    over-keep, never drop an eligible group.
    """

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        return group_containment_pairs(pdf, cap=_GROUP_CAPTION_CAP)

    ncap = F.lower(F.regexp_replace(F.trim(F.col("caption")), r"\s+", " "))
    docs = (images.select("phash", "image_id", "caption")
            .withColumn("ncap", ncap)
            .filter(F.length("ncap") > 0))
    eligible = (docs.groupBy("phash")
                .agg(F.count_distinct("ncap").alias("nc"))
                .filter(F.col("nc") >= 2)
                .select("phash"))
    return (docs.join(eligible, "phash")
            .select("phash", "image_id", "caption")
            .groupBy("phash")
            .applyInPandas(per_group, schema=PAIRS_SCHEMA)
            .dropDuplicates(["a", "b"]))

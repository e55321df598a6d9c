"""Stage 2: signatures -> salted LSH band keys (the "index build").

Replaces the reference's HNSW graph construction
(``hnsw.parallel_insert``, gsearch ``src/dna/dnasketch.rs:421-448``) with
the scalable Spark-native equivalent: every signature explodes into
``bands`` keys; items sharing a (band_id, band_hash) bucket are candidate
neighbors.  The (bands x rows_per_band) split is the LSH analog of the
reference's ef/nbng quality-vs-cost knobs (``README.md:680-689``).

Band hashes are computed **JVM-side** with ``xxhash64`` over the band's
minhash slots — whole-stage-codegen'd, no Python in this stage.

Skew (north_rule: "partitioning / shuffle / skew handled explicitly"):
hot buckets — e.g. thousands of identical all-black thumbnails — would
turn the bucket self-join into O(n^2).  We:
  1. count bucket sizes (``groupBy(band_id, band_hash).count()``),
  2. broadcast the (tiny) hot-bucket list back,
  3. split hot buckets into ``ceil(size / hot_band_threshold)`` (capped at
     ``band_salts``) sub-buckets, salt = hash(image_id, band_id) so each
     band partitions the same items DIFFERENTLY — across ``bands``
     independent band sets two co-bucketed items still meet w.p.
     1 - (1 - 1/S)^bands, and connected-components only needs a spanning
     set of edges, not all of them.

SimHash banding: the 64-bit simhash splits into ``simhash_bands`` chunks
(16 bits each by default); two signatures within Hamming distance
(simhash_bands - 1) share at least one intact chunk (pigeonhole), giving
exact coverage of small Hamming balls — the Hamming-neighborhood search
the reference does over sketch slots (``src/bin/bindash.rs:93-97``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BANDS_SCHEMA = "band_id int, band_hash bigint, salt int, image_id string"
SIMHASH_BAND_ID_OFFSET = 1000
PHASH_BAND_ID_OFFSET = 2000
CAPTION_BAND_ID = 3000


def explode_minhash_bands(signatures: DataFrame, bands: int,
                          rows_per_band: int) -> DataFrame:
    """signatures -> (band_id, band_hash, image_id); JVM-side hashing."""
    band_hashes = []
    for b in range(bands):
        slots = [F.element_at("minhash", b * rows_per_band + j + 1)
                 for j in range(rows_per_band)]
        band_hashes.append(F.xxhash64(F.lit(b), *slots))
    return (signatures
            .select("image_id",
                    F.posexplode(F.array(*band_hashes))
                    .alias("band_id", "band_hash")))


def explode_simhash_bands(signatures: DataFrame, simhash_bands: int,
                          band_id_offset: int = 1000) -> DataFrame:
    """simhash -> (band_id, band_hash, image_id) by chunk-PAIR equality.

    The 64-bit simhash splits into ``simhash_bands`` chunks; the band key
    is each unordered PAIR of chunks (C(k,2) bands of 2x16=32 bits for
    k=4).  Pigeonhole: a pair within Hamming distance <= (k-2) damages at
    most k-2 chunks, leaving >= 2 intact, so SOME pair-band matches —
    exact coverage of the Hamming<=2 ball, probabilistic above.  Single
    16-bit chunks are NOT usable as keys at scale: with n >> 2^16 rows,
    random chunk collisions alone generate O(n^2 / 2^16) candidate pairs
    per band (observed: 1.8M junk pairs at 188k rows); 32-bit pair keys
    push random collisions to O(n^2 / 2^32), i.e. noise.

    band_id is offset so simhash buckets never collide with minhash
    buckets in the unioned bands table.
    """
    width = 64 // simhash_bands
    mask = (1 << width) - 1
    chunk = [F.shiftright(F.col("simhash"), b * width).bitwiseAND(
        F.lit(mask)) for b in range(simhash_bands)]
    combos = []
    for i in range(simhash_bands):
        for j in range(i + 1, simhash_bands):
            combos.append(F.xxhash64(F.lit(band_id_offset + len(combos)),
                                     chunk[i], chunk[j]))
    return (signatures
            .select("image_id",
                    F.posexplode(F.array(*combos))
                    .alias("band_pos", "band_hash"))
            .select((F.col("band_pos") + F.lit(band_id_offset))
                    .alias("band_id"), "band_hash", "image_id"))


def explode_phash_bands(signatures: DataFrame, phash_chunks: int = 4,
                        phash_combo: int = 2,
                        band_id_offset: int = 2000) -> DataFrame:
    """phash -> (band_id, band_hash, image_id) by chunk-COMBO equality
    (default: C(4,2)=6 bands keyed on 2x16=32-bit chunk pairs).

    Covers the regime MinHash is weakest in: the lossy re-encode.  The
    guarantee is pigeonhole: k flipped bits damage at most k of the
    ``phash_chunks`` chunks, so any pair within Hamming distance
    (phash_chunks - phash_combo) keeps >= phash_combo intact chunks and
    matches the combo band made of them — EXACT Hamming<=2 coverage by
    default; cfg (phash_chunks=8, phash_combo=4) widens it to EXACT
    Hamming<=4, the codec's whole PSNR>=40 envelope (q85 flips up to 4
    bits), at C(8,4)=70 bands and ~3x candidate volume.  The radius is a
    deliberate config knob, not a hardcode: guaranteeing Hamming<=4 from
    64 bits REQUIRES either >=5 near-disjoint (hence <=12-bit, junk-
    flooded) keys or combinatorially many strong keys — pigeonhole bit
    budget — so the wide radius is priced for when a corpus needs it,
    and the default stays cheap on the 10^12-row hot path where
    probabilistic coverage above Hamming 2 suffices for recall>=0.99.

    Single 16-bit chunks are NOT usable as keys at scale: phash bits are
    DCT-sign-structured and correlated across images (~1.7M junk pairs
    at 188k rows in round 1); 32-bit combo keys push random collisions
    to O(n^2/2^32), and the structured remainder is absorbed by salting,
    the star policy and the tighter phash-src prefilter.
    """
    width = 64 // phash_chunks
    mask = (1 << width) - 1
    chunk = [F.shiftright(F.col("phash"), b * width).bitwiseAND(
        F.lit(mask)) for b in range(phash_chunks)]
    from itertools import combinations
    combos = []
    for sel in combinations(range(phash_chunks), phash_combo):
        combos.append(F.xxhash64(F.lit(band_id_offset + len(combos)),
                                 *[chunk[i] for i in sel]))
    return (signatures
            .select("image_id",
                    F.posexplode(F.array(*combos))
                    .alias("band_pos", "band_hash"))
            .select((F.col("band_pos") + F.lit(band_id_offset))
                    .alias("band_id"), "band_hash", "image_id"))


def salt_hot_buckets(bands_df: DataFrame, hot_threshold: int,
                     max_salts: int,
                     max_hot_buckets: int = 100_000,
                     stats_source: "DataFrame | None" = None,
                     sample_mod: int = 1) -> DataFrame:
    """Assign per-row salts; only buckets above hot_threshold are split.

    The hot-bucket list is tiny by construction (duplicate blow-ups, not
    the norm) and is broadcast — no shuffle of the big side beyond the
    bucket count aggregation (map-side partial agg keeps that cheap).
    The stats pass is collected eagerly: ``F.broadcast`` pulls it to the
    driver anyway, and an eager local relation avoids recomputing (or
    having to persist) the exploded band table — persisting it here once
    poisoned a later incremental-add run through Spark's plan-keyed
    cache reuse.

    The collect is BOUNDED: only the ``max_hot_buckets`` hottest buckets
    are salted (deterministic order: size desc, then key), so the
    driver-side list is O(max_hot_buckets) no matter the input size.
    Buckets past the cap stay unsalted — still CORRECT (candidate
    emission's star policy caps their pairs at 2m-3) just less balanced;
    the truncation is logged, never silent.

    SAMPLED stats (``stats_source``/``sample_mod``): hot-bucket detection
    does not need exact counts — a bucket at k x threshold sampled 1/k
    still lands far above threshold/k, and the failure mode of a miss is
    merely an unsalted bucket whose pair count the star policy already
    bounds.  Passing a deterministic 1/sample_mod id-hash sample as
    ``stats_source`` cuts the stats shuffle (the measured scaling
    residual's largest share) by sample_mod while keeping salting exact
    on everything clearly hot.  Counts scale back up by sample_mod; the
    sampled threshold is hot_threshold/sample_mod.
    """
    import logging

    src = stats_source if stats_source is not None else bands_df
    eff_threshold = max(1, hot_threshold // sample_mod)
    spark = bands_df.sparkSession
    hot_rows = (src.groupBy("band_id", "band_hash")
                .agg(F.count(F.lit(1)).alias("sampled_n"))
                .filter(F.col("sampled_n") > eff_threshold)
                .withColumn("bucket_n", F.col("sampled_n") * sample_mod)
                .withColumn(
                    "n_salt",
                    F.least(F.lit(max_salts),
                            F.ceil(F.col("bucket_n") / hot_threshold)
                            .cast("int")))
                .orderBy(F.desc("bucket_n"), "band_id", "band_hash")
                .limit(max_hot_buckets + 1)
                .select("band_id", "band_hash", "n_salt")
                .collect())
    if len(hot_rows) > max_hot_buckets:
        hot_rows = hot_rows[:max_hot_buckets]
        logging.getLogger(__name__).warning(
            "salt_hot_buckets: more than %d hot buckets; salting only the "
            "%d hottest (tail stays unsalted, star policy bounds its pairs)",
            max_hot_buckets, max_hot_buckets)
    stats = spark.createDataFrame(
        hot_rows, schema="band_id int, band_hash bigint, n_salt int")
    return (bands_df
            .join(F.broadcast(stats), ["band_id", "band_hash"], "left")
            .withColumn("n_salt", F.coalesce(F.col("n_salt"), F.lit(1)))
            .withColumn(
                "salt",
                F.when(F.col("n_salt") <= 1, F.lit(0)).otherwise(
                    F.pmod(F.xxhash64("image_id", "band_id"),
                           F.col("n_salt")).cast("int")))
            .select("band_id", "band_hash", "salt", "image_id"))


def _chunk_combo_hashes(col: str, n_chunks: int, r: int,
                        offset: int) -> "list":
    """All C(n_chunks, r) chunk-combination band hashes of a 64-bit col."""
    from itertools import combinations
    width = 64 // n_chunks
    mask = (1 << width) - 1
    chunk = [F.shiftright(F.col(col), b * width).bitwiseAND(F.lit(mask))
             for b in range(n_chunks)]
    combos = []
    for sel in combinations(range(n_chunks), r):
        combos.append(F.xxhash64(F.lit(offset + len(combos)),
                                 *[chunk[i] for i in sel]))
    return combos


def _chunk_pair_hashes(col: str, n_chunks: int, offset: int) -> "list":
    return _chunk_combo_hashes(col, n_chunks, 2, offset)


def explode_all_bands(signatures: DataFrame, cfg) -> DataFrame:
    """signatures -> UNSALTED (band_id, band_hash, image_id) across every
    band family, via ONE fused explode.

    Shared by the build path (which salts the result) and the probe path
    of :func:`gsearch_spark.operators.request.request` (which joins it
    against a stored salted table on (band_id, band_hash) — salting only
    matters for the self-join's skew, not for probing).

    Band families (row values identical to the per-family functions):
      * minhash bands (LSH quality knob),
      * simhash chunk-PAIR bands (pixel-feature Hamming<=2 net),
      * caption-identity band (skipped for empty captions): every
        verifiable near-dup class except caption-substring shares its
        normalized caption — junk is just same-caption hard negatives,
        killed by the phash prefilter before any decode,
      * phash chunk-COMBO bands over ALL rows (default C(4,2) pairs,
        32-bit keys): the only net with GUARANTEED coverage of the
        re-encode regime — exact Hamming <= (phash_chunks - phash_combo)
        (a lossy re-encode flips a few phash bits but 40-60
        pixel-simhash bits, and a simultaneously TRUNCATED caption kills
        the caption band and halves minhash J — the adversarial case in
        tests/test_suffix_array.py; cfg 8/4 widens the radius to 4 at
        ~3x candidate cost).  Junk cost is bounded by 32-bit combo keys,
        salting, the star policy, and the src-aware prefilter.

    ONE explode instead of a 4-way union: the union form scans the
    signatures input once PER FAMILY per pass (8 scans across the stats
    and salt passes — measured as 4x-partition-count task storms that
    anti-scale in the shared-JVM scheduler and re-run the signature UDF
    when the input is an unmaterialized persist).  The fused form scans
    once per pass and keeps one task per input partition.
    """
    from gsearch_spark.operators.signatures import EMPTY_CAPTION_HASH

    entries = []
    for b in range(cfg.bands):
        slots = [F.element_at("minhash", b * cfg.rows_per_band + j + 1)
                 for j in range(cfg.rows_per_band)]
        entries.append(F.struct(
            F.lit(b).alias("band_id"),
            F.xxhash64(F.lit(b), *slots).alias("band_hash")))
    for i, h in enumerate(_chunk_pair_hashes("simhash", cfg.simhash_bands,
                                             SIMHASH_BAND_ID_OFFSET)):
        entries.append(F.struct(
            F.lit(SIMHASH_BAND_ID_OFFSET + i).alias("band_id"),
            h.alias("band_hash")))
    for i, h in enumerate(_chunk_combo_hashes("phash", cfg.phash_chunks,
                                              cfg.phash_combo,
                                              PHASH_BAND_ID_OFFSET)):
        entries.append(F.struct(
            F.lit(PHASH_BAND_ID_OFFSET + i).alias("band_id"),
            h.alias("band_hash")))
    # caption band last; emitted as NULL hash for empty captions and
    # filtered out post-explode (keeps the array shape static)
    entries.append(F.struct(
        F.lit(CAPTION_BAND_ID).alias("band_id"),
        F.when(F.col("cap_hash") != F.lit(EMPTY_CAPTION_HASH),
               F.col("cap_hash")).alias("band_hash")))
    return (signatures
            .select("image_id", F.explode(F.array(*entries)).alias("e"))
            .filter(F.col("e.band_hash").isNotNull())
            .select(F.col("e.band_id").alias("band_id"),
                    F.col("e.band_hash").alias("band_hash"), "image_id"))


def build_bands(signatures: DataFrame, cfg) -> DataFrame:
    """Full banding stage: minhash ∪ simhash ∪ caption ∪ phash bands, salted.

    The exploded band table feeds two passes (bucket stats, then the salt
    join); the stats side is collected eagerly inside salt_hot_buckets
    (it is broadcast-sized by construction), so no persist is needed and
    no cached plan can leak into later runs over the same checkpoint.

    Hot-bucket stats run over a deterministic 1/hot_stats_sample_mod
    id-hash sample of the SIGNATURES (exploded separately — a narrow op
    over sample_mod-times fewer rows), so the stats shuffle shrinks by
    sample_mod.  Sampling by image_id keeps the result independent of
    input partitioning (determinism contract).
    """
    k = cfg.hot_stats_sample_mod
    exploded = explode_all_bands(signatures, cfg)
    stats_src = None
    if k > 1:
        sample = signatures.filter(
            F.pmod(F.xxhash64("image_id"), F.lit(k)) == 0)
        stats_src = explode_all_bands(sample, cfg)
    return salt_hot_buckets(exploded,
                            cfg.hot_band_threshold, cfg.band_salts,
                            max_hot_buckets=cfg.max_hot_buckets,
                            stats_source=stats_src, sample_mod=k)
